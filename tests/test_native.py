"""Native C++ C3D codec parity vs the pure-numpy path."""

import numpy as np
import pytest

from moshpp_tpu import native
from moshpp_tpu.io.c3d import read_c3d, write_c3d

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library not built")


class TestNativeCodec:
    def test_encode_decode_roundtrip(self, rng):
        F, P = 200, 17
        pts = rng.normal(size=(F, P, 3)).astype(np.float32) * 800
        pts[5, 3] = np.nan
        res = np.where(np.isnan(pts).any(-1), -1.0, 0.0).astype(np.float32)

        raw = native.encode_points(pts, res)
        assert raw is not None and len(raw) == F * P * 16
        dec = native.decode_points(raw, F, P, P * 4, True, 1.0, 84)
        assert dec is not None
        pts2, res2 = dec
        valid = ~np.isnan(pts).any(-1)
        np.testing.assert_allclose(pts2[valid], pts[valid], rtol=1e-6)
        assert np.all(np.isnan(pts2[5, 3]))
        np.testing.assert_array_equal(res2 < 0, ~valid)

    def test_matches_numpy_reader(self, tmp_path, rng):
        # write a file, read through the full reader (native path), then force
        # the numpy path by monkeypatching availability
        import moshpp_tpu.native as nat
        F, P = 60, 9
        pts = rng.normal(size=(F, P, 3)) * 500 + 900
        pts[10, 2] = np.nan
        path = str(tmp_path / "x.c3d")
        write_c3d(path, pts, [f"L{i}" for i in range(P)])

        c_native = read_c3d(path)
        orig = nat._lib
        try:
            nat._lib = None
            nat._load_attempted = True
            c_numpy = read_c3d(path)
        finally:
            nat._lib = orig
        valid = ~np.isnan(c_native.points)
        np.testing.assert_allclose(c_native.points[valid],
                                   c_numpy.points[valid], rtol=1e-6)
        np.testing.assert_array_equal(np.isnan(c_native.points),
                                      np.isnan(c_numpy.points))
        np.testing.assert_allclose(c_native.residuals, c_numpy.residuals)

    def test_int16_decode(self, rng):
        F, P = 10, 4
        scale = 0.05
        vals = (rng.normal(size=(F, P, 4)) * 100).astype(np.int16)
        vals[..., 3] = 0
        vals[2, 1, 3] = -1
        raw = vals.astype("<i2").tobytes()
        dec = native.decode_points(raw, F, P, P * 4, False, scale, 84)
        pts, res = dec
        assert np.all(np.isnan(pts[2, 1]))
        np.testing.assert_allclose(pts[0, 0], vals[0, 0, :3] * scale, rtol=1e-5)
