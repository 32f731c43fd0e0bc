"""Native (C++) runtime ops for the host side of the data pipeline.

The TPU compute path is jax/XLA/pallas; the HOST side (scan binning for
the slot-aligned projection routes, batch assembly) is single-thread
numpy at best and GIL-bound at worst — the reference hides the same cost
in DataLoader worker processes (SURVEY.md §3.1). Here the hot host op is
C++ (g++ -Ofast, libmvec-vectorized trig, OpenMP across scans in the
batch entry), called via ctypes so the GIL is released for the duration:
loader threads scale across cores on multi-core hosts.

Build model: compiled on first use into a cache directory keyed by the
source hash (no pip/pybind11 — ctypes over a plain shared object).
``lib()`` returns the loaded CDLL or None when no toolchain is available
or DEEPLIO_NATIVE=0 — callers MUST fall back to the numpy path (the
semantics oracle, data/synthetic.py::slot_bin_scan_np).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent
_SOURCES = ("slot_bin_trig.cpp", "slot_bin_core.cpp")
# per-TU flags: trig gets fast-math for libmvec vectorization (ulp-level
# transcendental drift, measured zero pixel flips); core stays exact.
_FLAGS = {
    "slot_bin_trig.cpp": ["-Ofast", "-march=native", "-fopenmp"],
    "slot_bin_core.cpp": ["-O3", "-march=native", "-fopenmp",
                          "-ffp-contract=off"],
}
_COMMON = ["-std=c++17", "-fPIC", "-shared"]

_lib: Optional[ctypes.CDLL] = None
_tried = False
_build_error: Optional[str] = None


def _cache_dir() -> Path:
    d = os.environ.get("DEEPLIO_NATIVE_CACHE")
    if d:
        return Path(d)
    return Path(os.environ.get("XDG_CACHE_HOME",
                               Path.home() / ".cache")) / "deeplio_tpu"


def _source_tag() -> str:
    h = hashlib.sha256()
    for s in _SOURCES:
        h.update((_SRC_DIR / s).read_bytes())
        h.update(" ".join(_FLAGS[s]).encode())
    return h.hexdigest()[:16]


def _build(so_path: Path) -> None:
    objs = []
    with tempfile.TemporaryDirectory() as td:
        for s in _SOURCES:
            obj = Path(td) / (s + ".o")
            cmd = (["g++", "-c", str(_SRC_DIR / s), "-o", str(obj)]
                   + _COMMON[:1] + ["-fPIC"] + _FLAGS[s])
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            objs.append(str(obj))
        tmp_so = Path(td) / "lib.so"
        subprocess.run(["g++", "-shared", "-fopenmp", "-o", str(tmp_so)]
                       + objs + ["-lm"],
                       check=True, capture_output=True, text=True)
        so_path.parent.mkdir(parents=True, exist_ok=True)
        # atomic publish (concurrent builders race benignly)
        tmp_final = so_path.with_suffix(f".{os.getpid()}.tmp")
        tmp_final.write_bytes(tmp_so.read_bytes())
        os.replace(tmp_final, so_path)


def _bind(cdll: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    f32p, u8p, i32p = (c.POINTER(c.c_float), c.POINTER(c.c_uint8),
                       c.POINTER(c.c_int32))
    cdll.dlt_slot_bin_scan.argtypes = [
        f32p, u8p, c.c_int64, c.c_int32, c.c_int32, c.c_int32, c.c_float,
        c.c_float, c.c_float, c.c_int32, c.c_int32, f32p, u8p]
    cdll.dlt_slot_bin_scan.restype = None
    cdll.dlt_slot_bin_batch.argtypes = [
        f32p, u8p, c.c_int64, c.c_int64, c.c_int32, c.c_int32, c.c_int32,
        c.c_float, c.c_float, c.c_float, c.c_int32, c.c_int32, f32p, u8p]
    cdll.dlt_slot_bin_batch.restype = None
    cdll.dlt_slot_bin_from_keys.argtypes = [
        i32p, i32p, u8p, c.c_int64, c.c_int32, c.c_int32, c.c_int32, i32p]
    cdll.dlt_slot_bin_from_keys.restype = None
    cdll.dlt_yaw_pitch.argtypes = [f32p, f32p, f32p, c.c_int64, f32p, f32p]
    cdll.dlt_yaw_pitch.restype = None
    return cdll


def lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable
    (no g++, build failure, or DEEPLIO_NATIVE=0)."""
    global _lib, _tried, _build_error
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("DEEPLIO_NATIVE", "1") == "0":
        return None
    so_path = _cache_dir() / f"slot_bin_{_source_tag()}.so"
    try:
        if not so_path.exists():
            _build(so_path)
        _lib = _bind(ctypes.CDLL(str(so_path)))
    except (OSError, subprocess.CalledProcessError) as e:
        _build_error = (getattr(e, "stderr", None) or str(e))[:2000]
        _lib = None
    return _lib


def build_error() -> Optional[str]:
    return _build_error
