"""Cross-oracle validation of the C3D codec against an INDEPENDENT
implementation: the reference's vendored pure-Python codec, loaded by path
from the read-only reference mount when present.

Self-roundtrip + property fuzz (tests/test_io.py) cannot catch a SYMMETRIC
encode/decode bug (e.g. both sides agreeing on a wrong byte order or a
wrong residual convention); decoding our files with a foreign reader and
foreign files with our reader can. Oracle: the codec the reference's
mocap_interface.py falls back to (reference tools/c3d.py:1118 Reader,
:1396 Writer). Skips cleanly when the mount is absent.

Two quirks of the oracle found while wiring this up (worked around here,
documented so the workarounds don't read as arbitrary):
  * numpy>=2 rejects `int32_array & 0x80008000` (reference c3d.py:1333)
    with OverflowError — patched to an int64 cast at load time.
  * the oracle's int16 WRITER is broken per spec: `array.array('i')`
    (reference c3d.py:1502 point_format) emits 4-byte words where the spec
    says 2-byte. Int16 coverage therefore uses a file hand-encoded from the
    public spec in this test, which BOTH readers must agree on.

Residual convention note: in float files the oracle packs
float((cams<<8)|residual_units) (c3d.py:1332-1355) while we store the
plain float residual (the ezc3d/Vicon convention). The interop contract —
validity mask (word < 0 == invalid) and coordinates — is identical and is
what these tests pin; residual VALUES are compared on integer-valued
residuals where the conventions coincide.
"""

import pathlib
import struct
import types

import numpy as np
import pytest

from moshpp_tpu.io.c3d import read_c3d, write_c3d

REF_C3D = pathlib.Path("/root/reference/src/moshpp/tools/c3d.py")
# The oracle is exec()'d with full interpreter privileges; pin its content so
# a modified mount cannot gain code execution in dev/CI runs. On mismatch the
# module skips loudly instead of running foreign code.
REF_C3D_SHA256 = \
    "e38857dac905c4135dbf7e44379b3edb318579f593c5b51e9693d19df335593b"

pytestmark = pytest.mark.skipif(not REF_C3D.exists(),
                                reason="reference mount not available")


@pytest.fixture(scope="module")
def ref():
    import hashlib
    raw = REF_C3D.read_bytes()
    digest = hashlib.sha256(raw).hexdigest()
    if digest != REF_C3D_SHA256:
        pytest.skip(f"SECURITY: oracle {REF_C3D} sha256 {digest} != pinned "
                    f"{REF_C3D_SHA256}; refusing to exec modified content")
    src = raw.decode()
    # numpy-2 fix (see module docstring); semantics preserved exactly
    src = src.replace("last_word & 0x80008000",
                      "(last_word.astype(np.int64) & 0x80008000)")
    mod = types.ModuleType("_ref_c3d")
    exec(compile(src, str(REF_C3D), "exec"), mod.__dict__)
    return mod


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _sample(rng, F=25, P=6, nan_rows=((3, 1), (7, 4), (20, 0))):
    pts = (rng.normal(size=(F, P, 3)) * 500.0 + 1000.0).astype(np.float32)
    for f, p in nan_rows:
        pts[f, p] = np.nan
    labels = [f"Subj:M{i:02d}" for i in range(P)]
    return pts, labels


class TestOursDecodedByReference:
    def test_float_file(self, tmp_path, rng, ref):
        pts, labels = _sample(rng)
        F, P = pts.shape[:2]
        path = str(tmp_path / "ours.c3d")
        write_c3d(path, pts, labels, frame_rate=120.0)

        with open(path, "rb") as h:
            r = ref.Reader(h)
            assert int(r.point_used) == P
            assert float(r.point_rate) == pytest.approx(120.0)
            ref_labels = [s.strip() for s in r.point_labels]
            assert ref_labels == labels
            frames = [(fi, p.copy()) for fi, p, _ in r.read_frames()]
        assert len(frames) == F
        got = np.stack([p[:, :3] for _, p in frames])
        resid = np.stack([p[:, 3] for _, p in frames])
        nan_mask = np.isnan(pts).any(-1)
        # the reference flags invalid points with residual == -1
        assert np.array_equal(resid < 0, nan_mask)
        np.testing.assert_allclose(got[~nan_mask], pts[~nan_mask],
                                   rtol=1e-6, atol=1e-4)

    def test_integer_residual_values_survive(self, tmp_path, rng, ref):
        # integer-valued residuals < 256: the plain-float convention (ours)
        # and the oracle's packed-word read coincide exactly
        pts, labels = _sample(rng, nan_rows=())
        res = rng.integers(0, 100, size=pts.shape[:2]).astype(np.float32)
        path = str(tmp_path / "resid.c3d")
        write_c3d(path, pts, labels, residuals=res)
        with open(path, "rb") as h:
            r = ref.Reader(h)
            got = np.stack([p[:, 3].copy() for _, p, _ in r.read_frames()])
        np.testing.assert_array_equal(got, res)


class TestReferenceDecodedByOurs:
    def test_intel_float_file(self, tmp_path, rng, ref):
        pts, labels = _sample(rng)
        path = str(tmp_path / "ref_float.c3d")
        F, P = pts.shape[:2]
        w = ref.Writer(point_rate=100.0, point_scale=-1.0)
        frames = []
        for f in range(F):
            p5 = np.zeros((P, 5), np.float32)
            p5[:, :3] = np.nan_to_num(pts[f])
            invalid = np.isnan(pts[f]).any(-1)
            p5[:, 3] = np.where(invalid, -1.0, 0.0)
            frames.append((p5, np.zeros(0, np.float32)))
        w.add_frames(frames)
        with open(path, "wb") as h:
            w.write(h, labels)

        f = read_c3d(path)
        assert f.num_frames == F
        assert [s.strip() for s in f.labels] == labels
        assert f.frame_rate == pytest.approx(100.0)
        nan_mask = np.isnan(pts).any(-1)
        assert np.array_equal(np.isnan(f.points).any(-1), nan_mask)
        np.testing.assert_allclose(f.points[~nan_mask], pts[~nan_mask],
                                   rtol=1e-6, atol=1e-4)


def _write_spec_int16(path, ints, scale, labels, rate, invalid_mask):
    """Hand-encode an int16-format C3D from the public spec (c3d.org) —
    independent of both codecs under test. `ints` (F, P, 3) int16 raw
    coordinate words; stored value = word * scale."""
    F, P = ints.shape[:2]

    def prec(name, gid, bpe, dims, data, last=False):
        name_b = name.encode()
        body = (struct.pack("b", bpe) + struct.pack("B", len(dims))
                + bytes(dims) + data + b"\x00")       # 0-length description
        off = 0 if last else 2 + len(body)
        return (struct.pack("bb", len(name_b), gid) + name_b
                + struct.pack("<H", off) + body)

    def grec(name, gid):
        name_b = name.encode()
        return (struct.pack("bb", len(name_b), -gid) + name_b
                + struct.pack("<H", 3) + b"\x00")

    lab_w = max(len(l) for l in labels)
    params = grec("POINT", 1)
    params += prec("USED", 1, 2, [], struct.pack("<h", P))
    params += prec("FRAMES", 1, 2, [], struct.pack("<h", F))
    params += prec("SCALE", 1, 4, [], struct.pack("<f", scale))
    params += prec("RATE", 1, 4, [], struct.pack("<f", rate))
    params += prec("DATA_START", 1, 2, [], struct.pack("<h", 3))
    params += prec("LABELS", 1, -1, [lab_w, P],
                   "".join(l.ljust(lab_w) for l in labels).encode())
    params += prec("UNITS", 1, -1, [2], b"mm")
    params += grec("ANALOG", 2)
    params += prec("USED", 2, 2, [], struct.pack("<h", 0), last=True)
    assert 4 + len(params) <= 512, "single param block assumed"

    header = np.zeros(256, "<u2")
    header[0] = 2 | (0x50 << 8)
    header[1] = P
    header[2] = 0
    header[3] = 1
    header[4] = F
    header[6:8] = np.frombuffer(struct.pack("<f", scale), "<u2")
    header[8] = 3                                   # data start block
    header[10:12] = np.frombuffer(struct.pack("<f", rate), "<u2")

    data = np.zeros((F, P, 4), "<i2")
    data[..., :3] = ints
    data[..., 3] = np.where(invalid_mask, -1, 0)

    with open(path, "wb") as f:
        f.write(header.tobytes())
        pblk = bytearray(512)
        pblk[0] = 2
        pblk[1] = 0x50
        pblk[2] = 1                                 # one param block
        pblk[3] = 84                                # Intel processor
        pblk[4:4 + len(params)] = params
        f.write(bytes(pblk))
        raw = data.tobytes()
        pad = -len(raw) % 512
        f.write(raw + b"\x00" * pad)


class TestInt16SpecFile:
    def test_both_readers_agree(self, tmp_path, rng, ref):
        F, P, scale = 19, 5, 0.25
        ints = rng.integers(-2000, 2000, size=(F, P, 3)).astype(np.int16)
        invalid = np.zeros((F, P), bool)
        invalid[2, 1] = invalid[11, 4] = True
        labels = [f"M{i:02d}" for i in range(P)]
        path = str(tmp_path / "spec_int16.c3d")
        _write_spec_int16(path, ints, scale, labels, 60.0, invalid)
        truth = ints.astype(np.float32) * scale

        f = read_c3d(path)
        assert [s.strip() for s in f.labels] == labels
        assert f.frame_rate == pytest.approx(60.0)
        assert np.array_equal(np.isnan(f.points).any(-1), invalid)
        np.testing.assert_allclose(f.points[~invalid], truth[~invalid],
                                   rtol=0, atol=1e-4)

        with open(path, "rb") as h:
            r = ref.Reader(h)
            assert abs(float(r.point_scale)) == pytest.approx(scale)
            frames = [p.copy() for _, p, _ in r.read_frames()]
        got = np.stack([p[:, :3] for p in frames])
        resid = np.stack([p[:, 3] for p in frames])
        assert np.array_equal(resid < 0, invalid)
        np.testing.assert_allclose(got[~invalid], truth[~invalid],
                                   rtol=0, atol=1e-4)


class TestRoundRobin:
    def test_ours_ref_ours(self, tmp_path, rng, ref):
        """our writer -> reference Reader -> reference Writer -> our reader:
        the full cross-product closes without drift."""
        pts, labels = _sample(rng)
        p1 = str(tmp_path / "a.c3d")
        p2 = str(tmp_path / "b.c3d")
        write_c3d(p1, pts, labels, frame_rate=60.0)
        with open(p1, "rb") as h:
            r = ref.Reader(h)
            frames = [(np.concatenate([p[:, :4], np.zeros((p.shape[0], 1),
                                                          np.float32)], 1),
                       np.zeros(0, np.float32))
                      for _, p, _ in r.read_frames()]
            rlabels = [s.strip() for s in r.point_labels]
        w = ref.Writer(point_rate=60.0, point_scale=-1.0)
        w.add_frames(frames)
        with open(p2, "wb") as h:
            w.write(h, rlabels)
        f = read_c3d(p2)
        nan_mask = np.isnan(pts).any(-1)
        assert np.array_equal(np.isnan(f.points).any(-1), nan_mask)
        np.testing.assert_allclose(f.points[~nan_mask], pts[~nan_mask],
                                   rtol=1e-6, atol=1e-4)
