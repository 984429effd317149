"""I/O tests: C3D codec roundtrips, MocapSession cleanup semantics, PLY."""

import numpy as np
import pytest

from moshpp_tpu.io.c3d import read_c3d, write_c3d
from moshpp_tpu.io.mocap import MocapSession, read_mocap, write_mocap_c3d
from moshpp_tpu.io.ply import read_ply, write_ply
from moshpp_tpu.models.synthetic import icosphere


@pytest.fixture
def sample_markers(rng):
    F, M = 50, 12
    pts = rng.normal(size=(F, M, 3)) * 500.0 + 1000.0  # mm scale
    labels = [f"MRK{i}" for i in range(M)]
    return pts, labels


class TestC3DCodec:
    def test_roundtrip(self, tmp_path, sample_markers):
        pts, labels = sample_markers
        path = str(tmp_path / "t.c3d")
        write_c3d(path, pts, labels, frame_rate=120.0)
        c3 = read_c3d(path)
        assert c3.labels == labels
        assert c3.frame_rate == 120.0
        assert c3.num_frames == pts.shape[0]
        np.testing.assert_allclose(c3.points, pts, rtol=1e-5)

    def test_roundtrip_with_missing(self, tmp_path, sample_markers):
        pts, labels = sample_markers
        pts = pts.copy()
        pts[3, 2] = np.nan
        pts[10, :] = np.nan
        path = str(tmp_path / "t.c3d")
        write_c3d(path, pts, labels)
        c3 = read_c3d(path)
        assert np.all(np.isnan(c3.points[3, 2]))
        assert np.all(np.isnan(c3.points[10]))
        valid = ~np.isnan(pts).any(-1)
        np.testing.assert_allclose(c3.points[valid], pts[valid], rtol=1e-5)

    def test_property_roundtrip_fuzz(self, tmp_path):
        """Property fuzz over shapes, magnitudes, NaN patterns, frame rates,
        and label contents — the codec must survive anything a vendor file
        can contain."""
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            nf=st.integers(1, 80),
            npts=st.integers(1, 40),
            scale=st.sampled_from([1.0, 25.4, 1000.0]),
            rate=st.sampled_from([60.0, 100.0, 119.88, 240.0]),
            nan_frac=st.floats(0.0, 0.5),
            seed=st.integers(0, 2**31 - 1),
        )
        def run(nf, npts, scale, rate, nan_frac, seed):
            rng = np.random.default_rng(seed)
            pts = (rng.normal(size=(nf, npts, 3)) * scale).astype(np.float64)
            drop = rng.uniform(size=(nf, npts)) < nan_frac
            pts[drop] = np.nan
            labels = [f"S1:{chr(65 + i % 26)}{i}" for i in range(npts)]
            path = str(tmp_path / f"f{seed % 7}.c3d")
            write_c3d(path, pts, labels, frame_rate=rate)
            c3 = read_c3d(path)
            assert c3.labels == labels
            assert c3.num_frames == nf
            assert abs(c3.frame_rate - rate) < 1e-3
            got_nan = np.isnan(c3.points).any(-1)
            np.testing.assert_array_equal(got_nan, drop)
            valid = ~drop
            if valid.any():
                np.testing.assert_allclose(c3.points[valid], pts[valid],
                                           rtol=1e-5, atol=1e-4 * scale)

        run()

    def test_long_sequences_beyond_int16(self, tmp_path, rng):
        # >32767 frames must survive (POINT:FRAMES saturates; data len rules)
        F = 40000
        pts = rng.normal(size=(F, 2, 3)).astype(np.float32)
        path = str(tmp_path / "long.c3d")
        write_c3d(path, pts, ["A", "B"], frame_rate=60.0)
        c3 = read_c3d(path)
        assert c3.num_frames == F
        np.testing.assert_allclose(c3.points[-1], pts[-1], rtol=1e-5)

    def test_parameter_groups_present(self, tmp_path, sample_markers):
        pts, labels = sample_markers
        path = str(tmp_path / "t.c3d")
        write_c3d(path, pts, labels, frame_rate=100.0)
        c3 = read_c3d(path)
        assert "POINT" in c3.groups
        assert float(np.ravel(c3.groups["POINT"].get("RATE"))[0]) == 100.0
        assert int(np.ravel(c3.groups["POINT"].get("USED"))[0]) == len(labels)


class TestMocapSession:
    def _write_session(self, tmp_path, rng, labels, F=30):
        pts = rng.normal(size=(F, len(labels), 3)) * 500.0 + 800.0
        path = str(tmp_path / "seq.c3d")
        write_c3d(path, pts, labels, frame_rate=120.0)
        return path, pts

    def test_unit_scaling(self, tmp_path, rng):
        path, pts = self._write_session(tmp_path, rng, ["A", "B", "C"])
        s = MocapSession(path, mocap_unit="mm")
        np.testing.assert_allclose(s.markers, pts / 1000.0, rtol=1e-5)

    def test_star_label_filtering(self, tmp_path, rng):
        path, _ = self._write_session(tmp_path, rng, ["A", "*1", "B"])
        s = MocapSession(path, mocap_unit="mm")
        assert s.labels == ["A", "B"]
        s2 = MocapSession(path, mocap_unit="mm", ignore_stared_labels=False)
        assert s2.labels == ["A", "*1", "B"]

    def test_subject_prefix_and_selection(self, tmp_path, rng):
        labels = ["S1:HEAD", "S1:FOOT", "S2:HEAD", "S2:FOOT"]
        path, pts = self._write_session(tmp_path, rng, labels)
        s = MocapSession(path, mocap_unit="mm", only_subjects=["S2"])
        assert s.labels == ["HEAD", "FOOT"]
        np.testing.assert_allclose(s.markers, pts[:, 2:] / 1000.0, rtol=1e-5)

    def test_labels_map_and_exclude(self, tmp_path, rng):
        path, _ = self._write_session(tmp_path, rng, ["HEAD_TOP", "LANK", "JUNK"])
        s = MocapSession(path, mocap_unit="mm",
                         labels_map={"HEAD_TOP": "ARIEL"},
                         exclude_markers=["JUNK"])
        assert s.labels == ["ARIEL", "LANK"]

    def test_markers_for_labels_static_gather(self, tmp_path, rng):
        path, pts = self._write_session(tmp_path, rng, ["A", "B"])
        s = MocapSession(path, mocap_unit="mm")
        out, mask = s.markers_for_labels(["B", "MISSING", "A"])
        assert out.shape == (30, 3, 3)
        assert mask[:, 0].all() and mask[:, 2].all() and not mask[:, 1].any()
        np.testing.assert_allclose(out[:, 0], pts[:, 1] / 1000.0, rtol=1e-5)

    def test_markers_asdict_skips_missing(self, tmp_path, rng):
        pts = rng.normal(size=(5, 2, 3)) * 100 + 500
        pts[2, 1] = np.nan
        path = str(tmp_path / "m.c3d")
        write_c3d(path, pts, ["A", "B"])
        s = MocapSession(path, mocap_unit="mm")
        d = s.markers_asdict()
        assert set(d[0]) == {"A", "B"}
        assert set(d[2]) == {"A"}

    def test_npz_roundtrip(self, tmp_path, rng):
        path, pts = self._write_session(tmp_path, rng, ["A", "B"])
        s = MocapSession(path, mocap_unit="mm")
        npz = str(tmp_path / "seq.npz")
        s.write_as_npz(npz)
        d = read_mocap(npz)
        np.testing.assert_allclose(d["markers"], s.markers, rtol=1e-6)
        assert d["labels"] == ["A", "B"]

    def test_c3d_rewrite_roundtrip(self, tmp_path, rng):
        path, _ = self._write_session(tmp_path, rng, ["A", "B"])
        s = MocapSession(path, mocap_unit="mm")
        out = str(tmp_path / "rewrite.c3d")
        s.write_as_c3d(out)
        s2 = MocapSession(out, mocap_unit="mm")
        np.testing.assert_allclose(s2.markers, s.markers, rtol=1e-4)

    def test_pkl_format(self, tmp_path, rng):
        import pickle
        pts = rng.normal(size=(8, 3, 3))
        with open(tmp_path / "m.pkl", "wb") as f:
            pickle.dump({"markers": pts, "labels": ["X", "Y", "Z"],
                         "frame_rate": 60.0}, f)
        s = MocapSession(str(tmp_path / "m.pkl"), mocap_unit="m")
        assert s.frame_rate == 60.0
        np.testing.assert_allclose(s.markers, np.nan_to_num(pts), atol=1e-12)


class TestPly:
    def test_roundtrip(self, tmp_path):
        v, f = icosphere(1)
        path = str(tmp_path / "m.ply")
        write_ply(path, v, f)
        v2, f2 = read_ply(path)
        np.testing.assert_allclose(v2, v, atol=1e-6)
        np.testing.assert_array_equal(f2, f)

    def test_ascii(self, tmp_path):
        path = str(tmp_path / "a.ply")
        with open(path, "w") as fh:
            fh.write("ply\nformat ascii 1.0\nelement vertex 3\n"
                     "property float x\nproperty float y\nproperty float z\n"
                     "element face 1\nproperty list uchar int vertex_indices\n"
                     "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
        v, f = read_ply(path)
        assert v.shape == (3, 3) and f.shape == (1, 3)


class TestMocapReaderFuzz:
    """Property fuzz over the non-C3D mocap formats (.npz/.pkl/.mat) and the
    MocapSession semantics layered on top (units, Subject:Label masks,
    NaN->0, label padding). read_mocap must return identical semantics for
    the same logical content regardless of container."""

    def test_property_formats_agree(self, tmp_path):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=20, deadline=None)
        @given(
            nf=st.integers(1, 40),
            npts=st.integers(1, 20),
            nan_frac=st.floats(0.0, 0.5),
            rate=st.sampled_from([60.0, 120.0, 250.0]),
            multi_subject=st.booleans(),
            short_labels=st.booleans(),
            seed=st.integers(0, 2**31 - 1),
        )
        def run(nf, npts, nan_frac, rate, multi_subject, short_labels, seed):
            import pickle
            import scipy.io

            rng = np.random.default_rng(seed)
            pts = (rng.normal(size=(nf, npts, 3)) * 500.0).astype(np.float64)
            pts[rng.uniform(size=(nf, npts)) < nan_frac] = np.nan
            if multi_subject:
                labels = [f"S{i % 2}:M{i}" for i in range(npts)]
            else:
                labels = [f"M{i}" for i in range(npts)]
            # vendor files sometimes carry fewer labels than points
            stored_labels = labels[:-1] if (short_labels and npts > 1) else labels

            d = tmp_path / f"fuzz{seed % 5}"
            d.mkdir(exist_ok=True)
            npz = str(d / "m.npz")
            np.savez(npz, markers=pts, labels=stored_labels, frame_rate=rate)
            pkl = str(d / "m.pkl")
            with open(pkl, "wb") as f:
                pickle.dump({"markers": pts, "labels": stored_labels,
                             "frame_rate": rate}, f)
            mat = str(d / "m.mat")
            scipy.io.savemat(mat, {"Markers": pts,
                                   "Labels": np.array([stored_labels],
                                                      dtype=object)}
                             if stored_labels else {"Markers": pts})

            ref = read_mocap(npz)
            assert ref["markers"].shape == (nf, npts, 3)
            assert len(ref["labels"]) == npts          # padded with *N
            if short_labels and npts > 1:
                assert ref["labels"][-1].startswith("*")
            if multi_subject and npts > 1:
                assert set(ref["subject_mask"]) >= {"S0"}
                # subject masks partition the markers
                total = np.zeros(npts, bool)
                for m in ref["subject_mask"].values():
                    assert not (total & m).any()
                    total |= m
                assert total.all()

            for other in (pkl, mat):
                got = read_mocap(other)
                np.testing.assert_allclose(
                    np.nan_to_num(got["markers"]),
                    np.nan_to_num(ref["markers"]), rtol=1e-6, atol=1e-9)
                np.testing.assert_array_equal(
                    np.isnan(got["markers"]), np.isnan(ref["markers"]))
                assert got["labels"] == ref["labels"]

            # session semantics: star-label filter + mm scaling + NaN->0
            s = MocapSession(npz, mocap_unit="mm")
            keep = [i for i, l in enumerate(ref["labels"])
                    if not l.startswith("*")]
            # session strips Subject: prefixes (colon-split semantics)
            assert s.labels == [ref["labels"][i].split(":")[-1]
                                for i in keep]
            kept = ref["markers"][:, keep]
            assert np.isfinite(s.markers).all()
            avail = s.availability_mask()
            np.testing.assert_array_equal(
                avail, ~np.isnan(kept).any(-1) & ~(kept == 0).all(-1))
            if avail.any():
                np.testing.assert_allclose(
                    s.markers[avail], kept[avail] / 1000.0, rtol=1e-6)

        run()
