"""ctypes bindings for the native dump toolchain (native/vpic_dump.cpp).

The native library accelerates host-side dump post-processing (bulk
particle reads, joining per-rank banded bricks into a global volume) — the
role the reference fills with C++ consumers (decks/trecon-reader,
interfaces/c).  Falls back transparently to the pure-Python readers in
io/dump.py / io/banded.py when the library is absent; ``build()`` compiles
it with make/g++ on demand.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libvpicdump.so"
_lib = None


class V0Header(ctypes.Structure):
    _fields_ = [
        ("version", ctypes.c_int32), ("dump_type", ctypes.c_int32),
        ("step", ctypes.c_int32), ("nx", ctypes.c_int32),
        ("ny", ctypes.c_int32), ("nz", ctypes.c_int32),
        ("dt", ctypes.c_float), ("dx", ctypes.c_float),
        ("dy", ctypes.c_float), ("dz", ctypes.c_float),
        ("x0", ctypes.c_float), ("y0", ctypes.c_float),
        ("z0", ctypes.c_float),
        ("cvac", ctypes.c_float), ("eps0", ctypes.c_float),
        ("damp", ctypes.c_float),
        ("rank", ctypes.c_int32), ("nproc", ctypes.c_int32),
        ("sp_id", ctypes.c_int32), ("q_m", ctypes.c_float),
        ("elem_size", ctypes.c_int32), ("ndim", ctypes.c_int32),
        ("dims", ctypes.c_int32 * 4), ("data_offset", ctypes.c_int64),
    ]


def build(force: bool = False) -> bool:
    """Compile the native library (idempotent).  Returns availability."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR), "all"],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        return False
    return _LIB_PATH.exists()


def load():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.vpic_read_v0_header.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(V0Header)]
    lib.vpic_read_v0_header.restype = ctypes.c_int
    lib.vpic_read_particles.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_long]
    lib.vpic_read_particles.restype = ctypes.c_long
    lib.vpic_join_banded.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_char_p]
    lib.vpic_join_banded.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def read_header(path) -> dict:
    lib = load()
    assert lib is not None, "native library unavailable"
    h = V0Header()
    rc = lib.vpic_read_v0_header(str(path).encode(), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"vpic_read_v0_header({path}) -> {rc}")
    return {k: getattr(h, k) for k, _ in V0Header._fields_ if k != "dims"} \
        | {"dims": tuple(h.dims[:h.ndim])}


def read_particles(path) -> np.ndarray:
    """(n, 8) float32 particle records [dx,dy,dz,i(bits),ux,uy,uz,q]."""
    lib = load()
    assert lib is not None, "native library unavailable"
    hdr = read_header(path)
    n = hdr["dims"][0]
    out = np.zeros((max(n, 1), 8), np.float32)
    got = lib.vpic_read_particles(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got < 0:
        raise IOError(f"vpic_read_particles({path}) -> {got}")
    return out[:got]


def join_banded(paths, gpx, gpy, gpz, out_path) -> int:
    """Join per-rank BAND dumps into one global brick file; returns the
    variable count."""
    lib = load()
    assert lib is not None, "native library unavailable"
    arr = (ctypes.c_char_p * len(paths))(
        *[str(p).encode() for p in paths])
    rc = lib.vpic_join_banded(arr, len(paths), gpx, gpy, gpz,
                              str(out_path).encode())
    if rc < 0:
        raise IOError(f"vpic_join_banded -> {rc}")
    return rc
