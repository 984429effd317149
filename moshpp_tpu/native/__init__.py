"""ctypes bindings to the native (C++) runtime components.

`libmoshpp_c3d.so` (built by `native/Makefile`) provides the bulk C3D
point-record decode/encode with OpenMP frame parallelism. All consumers must
degrade gracefully to the pure-numpy paths when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile
from typing import Optional

import numpy as np

# prebuilt .so shipped inside an installed wheel (must be built WITHOUT
# -march=native to stay portable); on-demand builds go to the host-keyed
# cache dir below instead, so a .so compiled with -march=native on one CPU
# can never SIGILL a different host sharing the same package directory
# (shared/NFS installs, container images moved across machine types).
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "libmoshpp_c3d.so")
# source lives in the repo checkout (<repo>/native/c3d_native.cc); absent in
# an installed wheel, where only a prebuilt .so can provide the fast path
_SRC_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, os.pardir, "native", "c3d_native.cc")
_lib = None
_load_attempted = False


def _host_lib_path() -> str:
    """Per-host build location keyed on the CPU (cpuinfo model + flags)."""
    import hashlib
    model = flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if not flags and ln.startswith("flags"):
                    flags = ln.strip()
                if not model and ln.startswith("model name"):
                    model = ln.strip()
                if flags and model:
                    break
    except OSError:
        pass
    key = hashlib.sha1(f"{model}|{flags}".encode()).hexdigest()[:10]
    d = os.environ.get("MOSHPP_NATIVE_CACHE",
                       os.path.join(tempfile.gettempdir(),
                                    f"moshpp_tpu_native_{key}"))
    return os.path.join(d, "libmoshpp_c3d.so")


def _try_build(dst: str) -> bool:
    """Best-effort on-demand compile of the native codec (sub-second with
    g++) into the host-keyed cache. Writes via a temp file + atomic rename so
    concurrent test workers can't observe a half-written .so. Opt out with
    MOSHPP_NO_NATIVE_BUILD=1."""
    if os.environ.get("MOSHPP_NO_NATIVE_BUILD") == "1":
        return False
    src = os.path.abspath(_SRC_PATH)
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("c++")
    if not os.path.exists(src) or cxx is None:
        return False
    try:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(dst))
        os.close(fd)
    except OSError:
        return False
    try:
        rc = subprocess.run(
            [cxx, "-O3", "-march=native", "-fPIC", "-fopenmp", "-std=c++17",
             "-shared", "-o", tmp, src],
            capture_output=True, timeout=120).returncode
        if rc != 0:
            return False
        os.replace(tmp, dst)
        return True
    except (OSError, subprocess.SubprocessError):
        return False
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    host_so = _host_lib_path()
    path = None
    if os.path.exists(host_so) or _try_build(host_so):
        path = host_so
    elif os.path.exists(_LIB_PATH):   # portable prebuilt from a wheel
        path = _LIB_PATH
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.moshpp_c3d_decode_points.restype = ctypes.c_int
        lib.moshpp_c3d_decode_points.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.moshpp_c3d_encode_points.restype = ctypes.c_int
        lib.moshpp_c3d_encode_points.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_char_p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_points(data: bytes, n_frames: int, n_points: int, frame_words: int,
                  is_float: bool, scale: float, proc: int):
    """Returns (points (F, P, 3) f32 with NaN for missing, residuals (F, P))
    or None when the native library is unavailable/fails."""
    lib = _load()
    if lib is None:
        return None
    pts = np.empty((n_frames, n_points, 3), np.float32)
    res = np.empty((n_frames, n_points), np.float32)
    rc = lib.moshpp_c3d_decode_points(
        data, len(data), n_frames, n_points, frame_words,
        1 if is_float else 0, float(scale), proc,
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        res.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return pts, res


def encode_points(points: np.ndarray, residuals: Optional[np.ndarray] = None):
    """Returns Intel-float XYZW record bytes or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    F, P = pts.shape[0], pts.shape[1]
    out = ctypes.create_string_buffer(F * P * 16)
    res_ptr = None
    if residuals is not None:
        residuals = np.ascontiguousarray(residuals, np.float32)
        res_ptr = residuals.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.moshpp_c3d_encode_points(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), res_ptr, F, P, out)
    if rc != 0:
        return None
    return out.raw
