"""Fast hot-path smoke: TRACE every kernel and solver program without
compiling or executing it.

`jax.eval_shape` runs the Python bodies of the Pallas kernels and the dogleg
loop under abstract tracing — which is exactly the level at which the
round-2 HEAD breakage lived (an undefined name inside a kernel body raised
at trace time). These tests give the fast pre-commit gate
(`pytest -m "not slow"`, see STATUS.md) structural coverage of the entire
TPU path in seconds; the numeric cross-validation lives in the slow suite
(test_pallas_jac / test_stageii_system / test_solver / test_parity).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.models import make_synthetic_model
from moshpp_tpu.ops.surface import vertex_normals
from moshpp_tpu.pipeline.stageii import (StageIIOptions, make_stageii_system,
                                         prepare_stageii_problem)
from moshpp_tpu.priors import make_gmm_prior


def _tiny(opts=None, markers=6, **mk):
    rng = np.random.default_rng(5)
    model = make_synthetic_model("smplh", num_verts=120, seed=5,
                                 dof_per_hand=6, **mk)
    opts = opts or StageIIOptions(jac_backend="pallas")
    betas = (rng.normal(size=16) * 0.3).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    vids = rng.choice(can_v.shape[0], markers, replace=False)
    latents = can_v[vids] + vn[vids] * 0.0095
    prob = prepare_stageii_problem(model, betas, latents, opts=opts)
    return model, prob, opts


@pytest.mark.parametrize("extras", [0, 4])
def test_marker_kernels_trace(extras):
    """All three kernel entry points build their jaxprs (E=0 and E>0)."""
    from moshpp_tpu.ops.pallas_marker_jac import (marker_resid_and_wjac,
                                                  marker_sim,
                                                  marker_sim_and_jacobian)

    if extras:
        opts = StageIIOptions(jac_backend="pallas", optimize_dynamics=True,
                              num_dmpls=extras)
        model, prob, opts = _tiny(opts, num_shape_dirs=16 + extras)
    else:
        model, prob, opts = _tiny()
    tables = prob.pallas_tables
    assert tables is not None and tables.n_extra == extras
    F, M = 8, tables.cf.shape[0] // 8
    D = 3 + prob.sub_model.pose_dof + extras
    x = jax.ShapeDtypeStruct((F, D), jnp.float32)
    obs = jax.ShapeDtypeStruct((F, M, 3), jnp.float32)
    wrow = jax.ShapeDtypeStruct((F, M), jnp.float32)

    sm = jax.eval_shape(
        lambda xx: marker_sim(prob.sub_model, tables, xx, interpret=True), x)
    assert sm.shape == (F, M, 3)
    sim, jm = jax.eval_shape(
        lambda xx: marker_sim_and_jacobian(prob.sub_model, tables, xx,
                                           interpret=True), x)
    assert sim.shape == (F, M, 3) and jm.shape == (F, M, 3, D)
    rw, jw = jax.eval_shape(
        lambda xx, oo, ww: marker_resid_and_wjac(prob.sub_model, tables, xx,
                                                 oo, ww, interpret=True),
        x, obs, wrow)
    assert rw.shape == (F, M, 3) and jw.shape == (F, M, 3, D)


def test_wide_extras_ride_tiled_kernels():
    """E beyond INLINE_MAX_EXTRAS (production smplx expressions = 80,
    reference support_data/conf/moshpp_conf.yaml:30) streams through the
    tiled kernel path — no silent XLA fallback — and the jaxprs build."""
    from moshpp_tpu.ops.pallas_marker_jac import (INLINE_MAX_EXTRAS,
                                                  marker_resid_and_wjac,
                                                  marker_sim,
                                                  marker_sim_and_jacobian)

    E = 20
    assert E > INLINE_MAX_EXTRAS
    opts = StageIIOptions(jac_backend="pallas", optimize_face=True,
                          num_expressions=E, expr_start=16)
    model, prob, opts = _tiny(opts, num_shape_dirs=16 + E)
    tables = prob.pallas_tables
    assert tables is not None and tables.n_extra == E
    system = make_stageii_system(prob, opts, None, "smplh")
    assert system.system_fn_batched is not None  # kernel path engaged

    F, M = 8, tables.cf.shape[0] // 8
    D = 3 + prob.sub_model.pose_dof + E
    x = jax.ShapeDtypeStruct((F, D), jnp.float32)
    obs = jax.ShapeDtypeStruct((F, M, 3), jnp.float32)
    wrow = jax.ShapeDtypeStruct((F, M), jnp.float32)
    sm = jax.eval_shape(
        lambda xx: marker_sim(prob.sub_model, tables, xx, interpret=True), x)
    assert sm.shape == (F, M, 3)
    sim, jm = jax.eval_shape(
        lambda xx: marker_sim_and_jacobian(prob.sub_model, tables, xx,
                                           interpret=True), x)
    assert sim.shape == (F, M, 3) and jm.shape == (F, M, 3, D)
    rw, jw = jax.eval_shape(
        lambda xx, oo, ww: marker_resid_and_wjac(prob.sub_model, tables, xx,
                                                 oo, ww, interpret=True),
        x, obs, wrow)
    assert rw.shape == (F, M, 3) and jw.shape == (F, M, 3, D)


def test_stageii_batched_system_traces():
    """The fused batched GN assembly (kernel path) traces end to end."""
    model, prob, opts = _tiny()
    prior = make_gmm_prior(dim=63, num_components=2, seed=1, scale=0.3)
    system = make_stageii_system(prob, opts, prior, "smplh")
    assert system.system_fn_batched is not None
    F, M = 8, 6
    P = prob.sub_model.pose_dof
    x = jax.ShapeDtypeStruct((F, 3 + P), jnp.float32)
    aux = {
        "markers": jax.ShapeDtypeStruct((F, M, 3), jnp.float32),
        "mask": jax.ShapeDtypeStruct((F, M), jnp.float32),
        "wt_data": jax.ShapeDtypeStruct((F,), jnp.float32),
        "anneal": jax.ShapeDtypeStruct((F,), jnp.float32),
        "wt_pose_scale": jax.ShapeDtypeStruct((F,), jnp.float32),
        "velo_anchor": jax.ShapeDtypeStruct((F, P), jnp.float32),
        "velo_on": jax.ShapeDtypeStruct((F,), jnp.float32),
        "extra_anchor": jax.ShapeDtypeStruct((F, 0), jnp.float32),
        "extra_on": jax.ShapeDtypeStruct((F,), jnp.float32),
    }
    f, g, B = jax.eval_shape(system.system_fn_batched, x, aux)
    assert f.shape == (F,) and g.shape == (F, 3 + P)
    # frame-minor B: (D, D, N) — the fused direction kernel's native layout
    assert system.b_frame_minor
    assert B.shape == (3 + P, 3 + P, F)
    fc = jax.eval_shape(system.cost_fn_batched, x, aux)
    assert fc.shape == (F,)


def test_dogleg_solver_traces():
    """The compacted batched dogleg (with the fused direction kernels)
    traces: while_loop bodies, compaction gathers, both linear solvers."""
    from moshpp_tpu.solver.gauss_newton import (DoglegOptions, GNSystem,
                                                batched_system_solve)

    N, D = 64, 12

    def system_fn(x, aux):
        r = x - aux["t"]
        return r @ r, 2 * r, 2.0 * jnp.eye(D, dtype=x.dtype)

    def cost_fn(x, aux):
        r = x - aux["t"]
        return r @ r

    sysm = GNSystem(system_fn, cost_fn, None, None)
    x0 = jax.ShapeDtypeStruct((N, D), jnp.float32)
    aux = {"t": jax.ShapeDtypeStruct((N, D), jnp.float32)}
    for solver in ("cholesky", "pcg"):
        res = jax.eval_shape(
            lambda xx, aa: batched_system_solve(
                sysm, xx, aa, DoglegOptions(maxiter=3, linear_solver=solver),
                compact_buckets=(2, 8)), x0, aux)
        assert res.x.shape == (N, D)

    # the traced debug variant (profile_stageii --trace) shares the body;
    # pin its scan plumbing and trace-record shapes
    from moshpp_tpu.solver.gauss_newton import batched_system_solve_traced
    res, trace = jax.eval_shape(
        lambda xx, aa: batched_system_solve_traced(
            sysm, xx, aa, DoglegOptions(maxiter=3), record_x=True), x0, aux)
    assert res.x.shape == (N, D)
    assert trace["f"].shape == (3, N) and trace["x"].shape == (3, N, D)
    assert trace["accepted"].dtype == jnp.bool_


def test_direction_kernels_trace():
    from moshpp_tpu.solver.pallas_pcg import (dogleg_direction_batched,
                                              pcg_direction_batched)

    N, D = 32, 117
    g = jax.ShapeDtypeStruct((N, D), jnp.float32)
    B = jax.ShapeDtypeStruct((N, D, D), jnp.float32)
    v = jax.ShapeDtypeStruct((N, D), jnp.float32)
    d = jax.ShapeDtypeStruct((N,), jnp.float32)
    p, pgn, pred = jax.eval_shape(
        lambda *a: dogleg_direction_batched(*a, iters=4, damping=1e-4,
                                            interpret=True), g, B, v, v, d)
    assert p.shape == (N, D) and pred.shape == (N,)
    p2, ok = jax.eval_shape(
        lambda *a: pcg_direction_batched(*a, iters=4, interpret=True),
        g, B, v)
    assert p2.shape == (N, D) and ok.shape == (N,)


def test_direction_kernels_trace_extras_width():
    """D=125 (8 extra dims) — the width that exceeded the default scoped
    VMEM limit before _vmem_params raised it."""
    from moshpp_tpu.solver.pallas_pcg import (_vmem_params,
                                              dogleg_direction_batched)

    assert _vmem_params(96) is None           # two B buffers fit the default
    assert _vmem_params(117) is not None      # vector streams push D=117 over
    assert _vmem_params(125) is not None
    # the budget must cover the 102 KB-over-estimate class caught at D=206
    # (smplx E=80): B buffers + vector streams + slack
    need_206 = _vmem_params(206).vmem_limit_bytes
    assert need_206 > 2 * 206 * 206 * 128 * 4
    N, D = 16, 125
    g = jax.ShapeDtypeStruct((N, D), jnp.float32)
    B = jax.ShapeDtypeStruct((N, D, D), jnp.float32)
    v = jax.ShapeDtypeStruct((N, D), jnp.float32)
    d = jax.ShapeDtypeStruct((N,), jnp.float32)
    p, _, _ = jax.eval_shape(
        lambda *a: dogleg_direction_batched(*a, iters=2, damping=1e-4,
                                            interpret=True), g, B, v, v, d)
    assert p.shape == (N, D)


def test_stagei_step_traces():
    """One frozen stage-i annealing step assembles and its packed residual
    traces with the expected row count."""
    from moshpp_tpu.pipeline.stagei import (StageIOptions, build_stagei_step,
                                            prepare_stagei_context)

    rng = np.random.default_rng(3)
    model = make_synthetic_model("smplh", num_verts=120, seed=3,
                                 dof_per_hand=6)
    M, F = 6, 2
    obs = rng.normal(size=(F, M, 3)).astype(np.float32) * 0.2
    opts = StageIOptions(maxiter=5, num_betas=16)
    prior = make_gmm_prior(dim=63, num_components=2, seed=2, scale=0.3)
    ctx, (betas, latents, poses, trans, _) = prepare_stagei_context(
        model, obs, np.ones((F, M), bool),
        rng.choice(120, M, replace=False),
        np.full(M, 0.0095, np.float32), {"body": np.ones(M, bool)},
        opts=opts, prior=prior)
    residual, pmask = build_stagei_step(ctx, betas, latents, anneal=1.0,
                                        detailed=True)
    x0 = ctx.lay.pack(betas, latents, poses, trans, None)
    assert pmask.shape == (ctx.lay.dim,)
    r = jax.eval_shape(residual, jax.ShapeDtypeStruct(x0.shape, jnp.float32))
    assert r.ndim == 1 and r.shape[0] > F * M * 3


def test_no_shadowing_duplicate_definitions():
    """Python's last-definition-wins silently shadows an earlier def: a
    half-finished edit committed as a duplicate function broke the whole
    TPU path at round-2 HEAD (pallas_marker_jac NameError at trace time).
    Guard every module against the pattern structurally."""
    import ast
    import pathlib

    import moshpp_tpu

    pkg = pathlib.Path(moshpp_tpu.__file__).parent
    files = sorted(pkg.rglob("*.py"))
    files += [pkg.parent / f for f in ("bench.py", "__graft_entry__.py")
              if (pkg.parent / f).exists()]
    dups = []
    for p in files:
        seen = {}
        for node in ast.parse(p.read_text()).body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                if node.name in seen:
                    dups.append(f"{p}:{node.lineno} re-defines {node.name} "
                                f"(first at :{seen[node.name]})")
                seen[node.name] = node.lineno
    assert not dups, "\n".join(dups)


@pytest.mark.parametrize("extras", [0, 4, 20])
def test_marker_kernels_tpu_lower(extras):
    """AOT-lower the REAL (non-interpret) kernels for the TPU target on the
    CPU host (`lowering_platforms=("tpu",)`). Mosaic's structural rules —
    block last-two-dims (8, 128)-divisible or full, static lane slicing —
    are enforced at this stage and are invisible to interpret-mode tests:
    the tiled-extras chunk tables shipped with a (J, 3*EC) block that every
    CPU test passed and the first real-TPU run rejected. This pins all
    three kernel entry points per extras regime (inline and tiled)."""
    from moshpp_tpu.ops.pallas_marker_jac import (marker_resid_and_wjac,
                                                  marker_sim,
                                                  marker_sim_and_jacobian)

    if extras:
        opts = StageIIOptions(jac_backend="pallas", optimize_dynamics=True,
                              num_dmpls=extras)
        model, prob, opts = _tiny(opts, num_shape_dirs=16 + extras)
    else:
        model, prob, opts = _tiny()
    tables = prob.pallas_tables
    assert tables is not None and tables.n_extra == extras
    F, M = 8, tables.cf.shape[0] // 8
    D = 3 + prob.sub_model.pose_dof + extras
    x = jax.ShapeDtypeStruct((F, D), jnp.float32)
    obs = jax.ShapeDtypeStruct((F, M, 3), jnp.float32)
    wrow = jax.ShapeDtypeStruct((F, M), jnp.float32)

    def lower(fn, *args):
        jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))

    lower(lambda xx: marker_sim(prob.sub_model, tables, xx), x)
    lower(lambda xx: marker_sim_and_jacobian(prob.sub_model, tables, xx), x)
    lower(lambda xx, oo, ww: marker_resid_and_wjac(
        prob.sub_model, tables, xx, oo, ww), x, obs, wrow)


def test_direction_kernels_tpu_lower():
    """Same TPU-target AOT lowering pin for the fused direction kernels."""
    from moshpp_tpu.solver.pallas_pcg import (dogleg_direction_batched,
                                              pcg_direction_batched)

    N, D = 8, 117
    g = jax.ShapeDtypeStruct((N, D), jnp.float32)
    B = jax.ShapeDtypeStruct((N, D, D), jnp.float32)
    v = jax.ShapeDtypeStruct((N, D), jnp.float32)
    d = jax.ShapeDtypeStruct((N,), jnp.float32)
    jax.jit(lambda *a: dogleg_direction_batched(
        *a, iters=4, damping=1e-4)).trace(
        g, B, v, v, d).lower(lowering_platforms=("tpu",))
    jax.jit(lambda *a: pcg_direction_batched(*a, iters=4)).trace(
        g, B, v).lower(lowering_platforms=("tpu",))
