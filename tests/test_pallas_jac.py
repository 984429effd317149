"""Cross-validation of the fused Pallas marker-Jacobian kernel against the
XLA analytic path (ops/lbs_jacobian.py), itself validated against jacfwd.

Runs in Pallas interpret mode so it works on the CPU test mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.models import make_synthetic_model
from moshpp_tpu.ops.lbs_jacobian import (lbs_verts_and_jacobian,
                                         markers_and_jacobian)
from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                             select_frame_indices)
from moshpp_tpu.ops.pallas_marker_jac import build_marker_jacobian_fn
from moshpp_tpu.ops.surface import vertex_normals

# solver-compile-heavy: excluded from the fast pre-commit gate
# (pytest -m 'not slow'); the full suite remains the CI bar
pytestmark = pytest.mark.slow


def _problem(model_type, rng, num_markers=7, dof_per_hand=6):
    model = make_synthetic_model(model_type, num_verts=300, seed=4,
                                 dof_per_hand=dof_per_hand)
    nb = min(10, model.num_shape_dirs)
    betas = (rng.normal(size=nb) * 0.3).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :nb], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    vids = rng.choice(can_v.shape[0], num_markers, replace=False)
    latents = (can_v[vids] + vn[vids] * 0.0095).astype(np.float32)
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
    return model, betas, idx, coeffs


def _reference(model, betas, idx, coeffs, x):
    def one(xi):
        P = model.pose_dof
        r = lbs_verts_and_jacobian(model, xi[3:3 + P],
                                   jnp.asarray(betas), xi[:3])
        return markers_and_jacobian(r.verts, r.jac, idx, coeffs)
    return jax.vmap(one)(x)


@pytest.mark.parametrize("model_type", ["smplh", "smpl", "mano", "smplx", "animal_horse"])
def test_matches_analytic_xla(rng, model_type):
    model, betas, idx, coeffs = _problem(model_type, rng)
    F = 5
    x = jnp.asarray(
        rng.normal(size=(F, 3 + model.pose_dof)).astype(np.float32) * 0.4)

    fn = build_marker_jacobian_fn(model, idx, coeffs, betas,
                                  interpret=True)
    sim_p, jm_p = fn(x)
    sim_r, jm_r = _reference(model, betas, idx, coeffs, x)

    np.testing.assert_allclose(np.asarray(sim_p), np.asarray(sim_r),
                               atol=2e-5)
    scale = np.abs(np.asarray(jm_r)).max()
    np.testing.assert_allclose(np.asarray(jm_p), np.asarray(jm_r),
                               atol=3e-4 * max(scale, 1.0))


def test_matches_at_zero_pose(rng):
    model, betas, idx, coeffs = _problem("smplh", rng)
    x = jnp.zeros((2, 3 + model.pose_dof), jnp.float32)
    fn = build_marker_jacobian_fn(model, idx, coeffs, betas,
                                  interpret=True)
    sim_p, jm_p = fn(x)
    sim_r, jm_r = _reference(model, betas, idx, coeffs, x)
    np.testing.assert_allclose(np.asarray(sim_p), np.asarray(sim_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jm_p), np.asarray(jm_r), atol=3e-4)


def test_uneven_marker_count_padding(rng):
    """M not a multiple of the marker chunk exercises the padded tail."""
    model, betas, idx, coeffs = _problem("smpl", rng, num_markers=5)
    x = jnp.asarray(
        rng.normal(size=(3, 3 + model.pose_dof)).astype(np.float32) * 0.3)
    fn = build_marker_jacobian_fn(model, idx, coeffs, betas,
                                  interpret=True)
    sim_p, jm_p = fn(x)
    sim_r, jm_r = _reference(model, betas, idx, coeffs, x)
    assert sim_p.shape == (3, 5, 3)
    np.testing.assert_allclose(np.asarray(sim_p), np.asarray(sim_r), atol=2e-5)
    scale = np.abs(np.asarray(jm_r)).max()
    np.testing.assert_allclose(np.asarray(jm_p), np.asarray(jm_r),
                               atol=3e-4 * max(scale, 1.0))


def test_sim_only_matches_full(rng):
    from moshpp_tpu.ops.pallas_marker_jac import (marker_sim,
                                                  prepare_marker_jac_tables,
                                                  marker_sim_and_jacobian)
    model, betas, idx, coeffs = _problem("smplh", rng)
    tables = prepare_marker_jac_tables(model, idx, coeffs, betas)
    x = jnp.asarray(
        rng.normal(size=(4, 3 + model.pose_dof)).astype(np.float32) * 0.3)
    sim_light = marker_sim(model, tables, x, interpret=True)
    sim_full, _ = marker_sim_and_jacobian(model, tables, x, interpret=True)
    np.testing.assert_allclose(np.asarray(sim_light), np.asarray(sim_full),
                               atol=1e-6)


def test_weighted_variant_matches(rng):
    from moshpp_tpu.ops.pallas_marker_jac import (marker_resid_and_wjac,
                                                  marker_sim_and_jacobian,
                                                  prepare_marker_jac_tables)
    model, betas, idx, coeffs = _problem("smplh", rng)
    tables = prepare_marker_jac_tables(model, idx, coeffs, betas)
    F, M = 4, 7
    x = jnp.asarray(
        rng.normal(size=(F, 3 + model.pose_dof)).astype(np.float32) * 0.3)
    obs = jnp.asarray(rng.normal(size=(F, M, 3)).astype(np.float32))
    wrow = jnp.asarray(rng.uniform(0.5, 3.0, size=(F, M)).astype(np.float32))
    wrow = wrow.at[1, 2].set(0.0)                 # a missing marker

    rw, jw = marker_resid_and_wjac(model, tables, x, obs, wrow,
                                   interpret=True)
    sim, jm = marker_sim_and_jacobian(model, tables, x, interpret=True)
    rw_ref = (np.asarray(sim) - np.asarray(obs)) * np.asarray(wrow)[..., None]
    jw_ref = np.asarray(jm) * np.asarray(wrow)[..., None, None]
    np.testing.assert_allclose(np.asarray(rw), rw_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jw), jw_ref, atol=1e-5)


@pytest.mark.parametrize("mode", ["dmpl", "expr"])
def test_extra_dims_match_jacfwd(rng, mode):
    """E>0 (dmpl/expression) kernel columns vs a jacfwd reference.

    Extras ride shapedirs columns (chmosh.py:507-514 dmpl splice, 694-699
    expressions), shifting vertices AND rest joints per frame; the kernel
    emits the E extra Jacobian columns in the same program.
    """
    from moshpp_tpu.models import make_synthetic_model
    from moshpp_tpu.models.body_model import lbs_forward
    from moshpp_tpu.ops.marker_transform import reconstruct_markers
    from moshpp_tpu.ops.pallas_marker_jac import (marker_sim,
                                                  marker_sim_and_jacobian,
                                                  marker_resid_and_wjac,
                                                  prepare_marker_jac_tables)

    E = 4
    nb = 6
    model = make_synthetic_model("smplh", num_verts=300, seed=4,
                                 dof_per_hand=6, num_shape_dirs=16)
    betas = (rng.normal(size=nb) * 0.3).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :nb], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    vids = rng.choice(can_v.shape[0], 7, replace=False)
    latents = (can_v[vids] + vn[vids] * 0.0095).astype(np.float32)
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)

    if mode == "dmpl":
        cols = list(range(nb, nb + E))

        def bet(extra):
            return jnp.concatenate([jnp.asarray(betas), extra])
    else:
        es = nb + 2   # a gap of zeroed columns, as smplx expressions have
        cols = list(range(es, es + E))

        def bet(extra):
            out = jnp.zeros(es + E, jnp.float32).at[:nb].set(
                jnp.asarray(betas))
            return out.at[es:es + E].set(extra)

    tables = prepare_marker_jac_tables(model, idx, coeffs,
                                       jnp.asarray(betas), extra_cols=cols)
    assert tables.n_extra == E
    P = model.pose_dof
    F = 3
    x = jnp.asarray(np.concatenate([
        rng.normal(size=(F, 3 + P)).astype(np.float32) * 0.3,
        rng.normal(size=(F, E)).astype(np.float32) * 0.5], axis=1))

    def sim_one(xi):
        verts = lbs_forward(model, xi[3:3 + P], bet(xi[3 + P:]), xi[:3])
        return reconstruct_markers(verts, idx, coeffs)

    sim_r = jax.vmap(sim_one)(x)
    jm_r = jax.vmap(jax.jacfwd(sim_one))(x)           # (F, M, 3, 3+P+E)

    sim_p, jm_p = marker_sim_and_jacobian(model, tables, x, interpret=True)
    np.testing.assert_allclose(np.asarray(sim_p), np.asarray(sim_r),
                               atol=3e-5)
    scale = np.abs(np.asarray(jm_r)).max()
    np.testing.assert_allclose(np.asarray(jm_p), np.asarray(jm_r),
                               atol=3e-4 * max(scale, 1.0))

    # sim-only (cost path) agrees with the full kernel's primal
    sim_light = marker_sim(model, tables, x, interpret=True)
    np.testing.assert_allclose(np.asarray(sim_light), np.asarray(sim_p),
                               atol=1e-6)

    # weighted variant folds the same extras
    M = 7
    obs = jnp.asarray(rng.normal(size=(F, M, 3)).astype(np.float32))
    wrow = jnp.asarray(rng.uniform(0.5, 3.0, size=(F, M)).astype(np.float32))
    rw, jw = marker_resid_and_wjac(model, tables, x, obs, wrow,
                                   interpret=True)
    rw_ref = (np.asarray(sim_p) - np.asarray(obs)) * np.asarray(wrow)[..., None]
    jw_ref = np.asarray(jm_p) * np.asarray(wrow)[..., None, None]
    np.testing.assert_allclose(np.asarray(rw), rw_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jw), jw_ref, atol=1e-5)


def test_tiled_extras_match_jacfwd(rng):
    """E > INLINE_MAX_EXTRAS routes to the tiled streaming path
    (`_sim_and_jac_tiled`) — validate the production-width config class
    (the reference defaults to num_expressions=80,
    support_data/conf/moshpp_conf.yaml:30) against jacfwd.

    E=20 exercises both the tiled dispatch and the EXTRA_CHUNK zero-padding
    (20 = 2*8 + 4)."""
    from moshpp_tpu.models.body_model import lbs_forward
    from moshpp_tpu.ops.marker_transform import reconstruct_markers
    from moshpp_tpu.ops import pallas_marker_jac as pmj

    assert pmj.INLINE_MAX_EXTRAS == 16 and pmj.EXTRA_CHUNK == 8
    E = 20
    nb = 6
    es = nb + 2                      # zeroed gap, as smplx expressions have
    model = make_synthetic_model("smplh", num_verts=300, seed=4,
                                 dof_per_hand=6, num_shape_dirs=es + E)
    betas = (rng.normal(size=nb) * 0.3).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :nb], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    vids = rng.choice(can_v.shape[0], 7, replace=False)
    latents = (can_v[vids] + vn[vids] * 0.0095).astype(np.float32)
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
    cols = list(range(es, es + E))
    tables = pmj.prepare_marker_jac_tables(model, idx, coeffs,
                                           jnp.asarray(betas),
                                           extra_cols=cols)
    assert tables.n_extra == E
    P = model.pose_dof
    F = 3
    x = jnp.asarray(np.concatenate([
        rng.normal(size=(F, 3 + P)).astype(np.float32) * 0.3,
        rng.normal(size=(F, E)).astype(np.float32) * 0.5], axis=1))

    def bet(extra):
        out = jnp.zeros(es + E, jnp.float32).at[:nb].set(jnp.asarray(betas))
        return out.at[es:es + E].set(extra)

    def sim_one(xi):
        verts = lbs_forward(model, xi[3:3 + P], bet(xi[3 + P:]), xi[:3])
        return reconstruct_markers(verts, idx, coeffs)

    sim_r = jax.vmap(sim_one)(x)
    jm_r = jax.vmap(jax.jacfwd(sim_one))(x)           # (F, M, 3, 3+P+E)

    sim_p, jm_p = pmj.marker_sim_and_jacobian(model, tables, x,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(sim_p), np.asarray(sim_r),
                               atol=3e-5)
    scale = np.abs(np.asarray(jm_r)).max()
    np.testing.assert_allclose(np.asarray(jm_p), np.asarray(jm_r),
                               atol=3e-4 * max(scale, 1.0))

    # sim-only (cost path) rides the tiled smalls/marker kernels too
    sim_light = pmj.marker_sim(model, tables, x, interpret=True)
    np.testing.assert_allclose(np.asarray(sim_light), np.asarray(sim_p),
                               atol=1e-6)

    # weighted variant: folded weights propagate into the tiled extra cols
    M = 7
    obs = jnp.asarray(rng.normal(size=(F, M, 3)).astype(np.float32))
    wrow = jnp.asarray(rng.uniform(0.5, 3.0, size=(F, M)).astype(np.float32))
    wrow = wrow.at[1, 2].set(0.0)                 # a missing marker
    rw, jw = pmj.marker_resid_and_wjac(model, tables, x, obs, wrow,
                                       interpret=True)
    rw_ref = (np.asarray(sim_p) - np.asarray(obs)) * np.asarray(wrow)[..., None]
    jw_ref = np.asarray(jm_p) * np.asarray(wrow)[..., None, None]
    np.testing.assert_allclose(np.asarray(rw), rw_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jw), jw_ref, atol=1e-5)


def test_fused_extra_reduce_matches(rng):
    """FUSED_EXTRA_REDUCE=1 (one (3E, J, BF) sublane reduce per vertex) is
    numerically identical to the per-(e, b) reduction it replaces."""
    from moshpp_tpu.models.body_model import lbs_forward  # noqa: F401
    from moshpp_tpu.ops import pallas_marker_jac as pmj

    E = 4
    nb = 6
    model = make_synthetic_model("smplh", num_verts=300, seed=4,
                                 dof_per_hand=6, num_shape_dirs=16)
    betas = (rng.normal(size=nb) * 0.3).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :nb], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    vids = rng.choice(can_v.shape[0], 7, replace=False)
    latents = (can_v[vids] + vn[vids] * 0.0095).astype(np.float32)
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
    tables = pmj.prepare_marker_jac_tables(
        model, idx, coeffs, jnp.asarray(betas),
        extra_cols=list(range(nb, nb + E)))
    P = model.pose_dof
    F = 3
    x = jnp.asarray(np.concatenate([
        rng.normal(size=(F, 3 + P)).astype(np.float32) * 0.3,
        rng.normal(size=(F, E)).astype(np.float32) * 0.5], axis=1))

    saved = pmj.FUSED_EXTRA_REDUCE
    try:
        pmj.FUSED_EXTRA_REDUCE = False
        sim0, jm0 = pmj.marker_sim_and_jacobian(model, tables, x,
                                                interpret=True)
        pmj.FUSED_EXTRA_REDUCE = True
        sim1, jm1 = pmj.marker_sim_and_jacobian(model, tables, x,
                                                interpret=True)
    finally:
        pmj.FUSED_EXTRA_REDUCE = saved
    np.testing.assert_array_equal(np.asarray(sim0), np.asarray(sim1))
    np.testing.assert_allclose(np.asarray(jm0), np.asarray(jm1),
                               rtol=0, atol=1e-6)
