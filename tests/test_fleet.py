"""Fleet runner tests: filtering, failure isolation, CLI wiring.

Heavy solves are stubbed — the end-to-end pipeline path is covered by the
slow tests in test_head.py; here the contract is the orchestration loop
(reference model: run_tools.py:45-67 + one run_moshpp_once per process).
"""

import numpy as np

from moshpp_tpu import cli
from moshpp_tpu.io.mocap import write_mocap_c3d
from moshpp_tpu.pipeline import fleet


def _world(tmp_path, n_seqs=3):
    sess = tmp_path / "DS" / "S1"
    sess.mkdir(parents=True)
    (sess / "settings.json").write_text('{"gender": "neutral"}')
    rng = np.random.default_rng(0)
    fnames = []
    for i in range(n_seqs):
        markers = rng.normal(size=(4, 3, 3)).astype(np.float32)
        f = str(sess / f"seq{i}.c3d")
        write_mocap_c3d(markers, ["A", "B", "C"], f, frame_rate=60)
        fnames.append(f)
    return fnames


def _base(tmp_path):
    return {
        "dirs.work_base_dir": str(tmp_path / "work"),
        "dirs.support_base_dir": str(tmp_path / "support"),
        "surface_model.type": "smplh",
    }


def test_fleet_runs_and_isolates_failures(tmp_path, monkeypatch):
    fnames = _world(tmp_path)
    calls = []

    class _FakeMoSh:
        stageii_fname = "/w/out_stageii.pkl"

    def fake_run(cfg):
        calls.append(cfg["mocap.fname"])
        if "seq1" in cfg["mocap.fname"]:
            raise RuntimeError("boom")
        return _FakeMoSh()

    import moshpp_tpu.pipeline.head as head
    monkeypatch.setattr(head, "run_moshpp_once", fake_run)

    jobs = [{**_base(tmp_path), "mocap.fname": f} for f in fnames]
    rep = fleet.run_moshpp_fleet(jobs)
    # dedup: all 3 share a subject key -> pass 1 runs only the stage-i
    # claimant; the deferred siblings run on later passes (the stub writes
    # no stage files, so every job eventually gets attempted)
    assert len(calls) == 3
    assert rep.num_ok == 2 and rep.num_failed == 1

    jobs = [{**_base(tmp_path), "mocap.fname": f,
             "moshpp.perseq_mosh_stagei": True} for f in fnames]
    calls.clear()
    rep = fleet.run_moshpp_fleet(jobs)
    assert len(calls) == 3
    assert rep.num_ok == 2
    assert rep.num_failed == 1
    failed = [r for r in rep.results if r.status == "failed"]
    assert "boom" in failed[0].error
    assert "ok" in rep.summary()


def test_fleet_stop_on_error(tmp_path, monkeypatch):
    fnames = _world(tmp_path)

    def fake_run(cfg):
        raise RuntimeError("always")

    import moshpp_tpu.pipeline.head as head
    monkeypatch.setattr(head, "run_moshpp_once", fake_run)
    jobs = [{**_base(tmp_path), "mocap.fname": f,
             "moshpp.perseq_mosh_stagei": True} for f in fnames]
    rep = fleet.run_moshpp_fleet(jobs, stop_on_error=True)
    assert rep.num_failed == 1      # stopped after the first failure
    assert rep.num_pending == 2     # unattempted jobs stay visible
    assert "not attempted" in rep.summary()


def test_fleet_skips_completed(tmp_path, monkeypatch):
    fnames = _world(tmp_path, n_seqs=2)
    from moshpp_tpu.config.config import prepare_cfg
    import os

    # mark seq0 complete on disk
    cfg0 = prepare_cfg(**{**_base(tmp_path), "mocap.fname": fnames[0]})
    os.makedirs(os.path.dirname(cfg0["dirs.stageii_fname"]), exist_ok=True)
    open(cfg0["dirs.stageii_fname"], "wb").close()
    open(cfg0["dirs.stagei_fname"], "wb").close()

    calls = []

    class _FakeMoSh:
        stageii_fname = None

    def fake_run(cfg):
        calls.append(cfg["mocap.fname"])
        return _FakeMoSh()

    import moshpp_tpu.pipeline.head as head
    monkeypatch.setattr(head, "run_moshpp_once", fake_run)
    jobs = [{**_base(tmp_path), "mocap.fname": f,
             "moshpp.perseq_mosh_stagei": True} for f in fnames]
    rep = fleet.run_moshpp_fleet(jobs)
    assert calls == [fnames[1]]
    assert rep.num_filtered == 1 and rep.num_ok == 1


def test_cli_run_many(tmp_path, monkeypatch, capsys):
    fnames = _world(tmp_path)

    class _FakeMoSh:
        stageii_fname = None

    def fake_run(cfg):
        return _FakeMoSh()

    import moshpp_tpu.pipeline.head as head
    monkeypatch.setattr(head, "run_moshpp_once", fake_run)
    rc = cli.main([
        "run-many", str(tmp_path / "DS" / "S1" / "*.c3d"),
        "--work-dir", str(tmp_path / "work"),
        "--support-dir", str(tmp_path / "support"),
        "--model-type", "smplh", "--per-seq-shape",
        "-o", "opt_settings.maxiter=5",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "3 ok, 0 failed" in out


def test_fleet_multipass_unblocks_deferred_siblings(tmp_path, monkeypatch):
    """The realistic cache path: pass 1 runs only the stage-i claimant
    (which writes the shared stage-i + its stage-ii); the re-filter then
    releases the deferred siblings, which reuse the cached stage-i."""
    import os
    from moshpp_tpu.config.config import prepare_cfg

    fnames = _world(tmp_path)
    calls = []

    class _FakeMoSh:
        stageii_fname = None

    def fake_run(cfg_dict):
        calls.append(cfg_dict["mocap.fname"])
        cfg = prepare_cfg(**cfg_dict)
        for k in ("dirs.stagei_fname", "dirs.stageii_fname"):
            os.makedirs(os.path.dirname(cfg[k]), exist_ok=True)
            open(cfg[k], "wb").close()
        return _FakeMoSh()

    import moshpp_tpu.pipeline.head as head
    monkeypatch.setattr(head, "run_moshpp_once", fake_run)
    jobs = [{**_base(tmp_path), "mocap.fname": f} for f in fnames]
    rep = fleet.run_moshpp_fleet(jobs)
    assert len(calls) == 3          # every sequence actually solved
    assert rep.num_ok == 3 and rep.num_failed == 0
    # rerun: everything cached -> all filtered, nothing run
    calls.clear()
    rep2 = fleet.run_moshpp_fleet(jobs)
    assert calls == []
    assert rep2.num_filtered == 3
