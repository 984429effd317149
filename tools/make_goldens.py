#!/usr/bin/env python
"""Regenerate the committed golden fixtures in tests/goldens/.

Run on CPU (deterministic reruns; the goldens' tolerances absorb cross-
backend fp noise). Only regenerate after an INTENTIONAL change to weight
tables, priors, or system assembly — and say why in the commit message.
"""

import os
import sys

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from moshpp_tpu.utils.cache import setup_jax_cache
    setup_jax_cache()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    from golden_common import (FAMILIES, golden_probe, golden_solve,
                               golden_stagei_probe, golden_stagei_solve)

    out_dir = os.path.join(repo, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for fam in FAMILIES:
        probe = golden_probe(fam)
        solve = golden_solve(fam)
        fname = os.path.join(out_dir, f"stageii_{fam}.npz")
        np.savez_compressed(fname, probe=probe, **solve)
        print(f"{fam}: probe {probe.shape} |r|^2={float(probe @ probe):.4f} "
              f"mean_err={solve['data_err'].mean() * 1e3:.4f} mm -> {fname}")

    probe = golden_stagei_probe()
    solve = golden_stagei_solve()
    fname = os.path.join(out_dir, "stagei_smplh.npz")
    np.savez_compressed(fname, probe=probe, **solve)
    print(f"stagei: probe {probe.shape} |r|^2={float(probe @ probe):.4f} "
          f"mean_err={solve['data_mean_m'] * 1e3:.4f} mm -> {fname}")


if __name__ == "__main__":
    main()
