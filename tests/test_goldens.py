"""Recorded-fixture parity pack: every model family's objective assembly and
solve outcome pinned against committed goldens (tests/goldens/*.npz).

The probe-residual check catches any unintended change to weight tables,
prior whitening, robustifier semantics, or Jacobian/system assembly at fp
precision; the (slow) solve check catches solver-trajectory regressions.
Regenerate via `python tools/make_goldens.py` ONLY for intentional semantic
changes.
"""

import os

import numpy as np
import pytest

from golden_common import (FAMILIES, golden_probe, golden_solve,
                           golden_stagei_probe, golden_stagei_solve)

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(family):
    fname = os.path.join(_GOLDEN_DIR, f"stageii_{family}.npz")
    if not os.path.exists(fname):
        pytest.fail(f"missing golden {fname}; run tools/make_goldens.py")
    return np.load(fname)


@pytest.mark.parametrize("family", FAMILIES)
def test_probe_residual_matches_golden(family):
    g = _load(family)
    r = golden_probe(family)
    ref = g["probe"]
    assert r.shape == ref.shape, (
        f"{family}: residual layout changed {r.shape} vs {ref.shape}")
    scale = np.abs(ref).max()
    np.testing.assert_allclose(r, ref, atol=2e-4 * max(scale, 1.0),
                               err_msg=f"{family}: assembly drifted")


def test_stagei_probe_residual_matches_golden():
    fname = os.path.join(_GOLDEN_DIR, "stagei_smplh.npz")
    if not os.path.exists(fname):
        pytest.fail(f"missing golden {fname}; run tools/make_goldens.py")
    g = np.load(fname)
    r = golden_stagei_probe()
    ref = g["probe"]
    assert r.shape == ref.shape, "stage-i residual layout changed"
    scale = np.abs(ref).max()
    np.testing.assert_allclose(r, ref, atol=2e-4 * max(scale, 1.0),
                               err_msg="stage-i assembly drifted")


@pytest.mark.slow
def test_stagei_solve_outcome_matches_golden():
    g = np.load(os.path.join(_GOLDEN_DIR, "stagei_smplh.npz"))
    s = golden_stagei_solve()
    d_mm = abs(s["data_mean_m"] - g["data_mean_m"]) * 1e3
    assert d_mm < 0.1, f"stage-i mean data err moved {d_mm:.4f} mm"
    d_lat = np.abs(s["markers_latent"] - g["markers_latent"]).max() * 1e3
    assert d_lat < 0.5, f"stage-i latents moved {d_lat:.4f} mm"


@pytest.mark.slow
@pytest.mark.parametrize("family", FAMILIES)
def test_solve_outcome_matches_golden(family):
    g = _load(family)
    s = golden_solve(family)
    # outcome-level tolerances: solver iterates are chaotic at fp noise, the
    # fitted surface is not
    err_mm = s["data_err"].mean() * 1e3
    ref_mm = g["data_err"].mean() * 1e3
    assert abs(err_mm - ref_mm) < 0.1, (
        f"{family}: mean data err {err_mm:.4f} mm vs golden {ref_mm:.4f} mm")
    d_sim = np.abs(s["markers_sim"] - g["markers_sim"]).max() * 1e3
    assert d_sim < 0.3, f"{family}: fitted markers moved {d_sim:.4f} mm"
    d_tr = np.abs(s["trans"] - g["trans"]).max() * 1e3
    assert d_tr < 2.0, f"{family}: trans moved {d_tr:.4f} mm"
