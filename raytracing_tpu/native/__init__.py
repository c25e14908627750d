"""Native (C++) components: host-side runtime pieces of the framework.

The reference reaches compiled code only through scipy's FITPACK (Fortran)
splines (SURVEY.md 2.9).  Here the medium build pipeline — derivative grids
and not-a-knot bicubic coefficient construction — is a small C++ library
(spline_builder.cpp) compiled on demand with g++ and bound via ctypes: no
scipy in the production path, ~an order of magnitude faster table builds on
the reference-sized interface grid, and one fewer Fortran dependency.

scipy remains a *test-time* oracle: tests/test_native.py checks the C++
builder against RectBivariateSpline to ~1e-10.
"""
from __future__ import annotations

import ctypes
import os
import stat
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "spline_builder.cpp")
_LIB_CACHE: list = []


def _cache_dir() -> str:
    """Per-user 0700 cache dir — never a shared world-writable location.

    Loading code from a predictable path under /tmp lets another local user
    pre-plant a matching .so; cache under XDG_CACHE_HOME/~/.cache instead
    and verify ownership+permissions before any CDLL.
    """
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    d = os.path.join(base, "raytracing_tpu", "native")
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.stat(d)
    if st.st_uid != os.getuid() or (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
        raise RuntimeError(
            f"refusing native cache dir {d}: not owned by uid {os.getuid()} "
            f"or group/world writable (mode {oct(st.st_mode)})")
    return d


def _build_library() -> str:
    """Compile spline_builder.cpp to a shared object (cached per source mtime)."""
    tag = int(os.path.getmtime(_SRC))
    so = os.path.join(_cache_dir(), f"spline_builder_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, so)
    st = os.stat(so)
    if st.st_uid != os.getuid() or (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
        raise RuntimeError(
            f"refusing native library {so}: not owned by uid {os.getuid()} "
            f"or group/world writable (mode {oct(st.st_mode)})")
    return so


def _lib():
    if not _LIB_CACHE:
        lib = ctypes.CDLL(_build_library())
        lib.rt_bicubic_cells.restype = ctypes.c_int
        lib.rt_bicubic_cells.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double)]
        lib.rt_gradient2.restype = ctypes.c_int
        lib.rt_gradient2.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double)]
        _LIB_CACHE.append(lib)
    return _LIB_CACHE[0]


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def bicubic_cells(grid: np.ndarray) -> np.ndarray:
    """Per-cell not-a-knot bicubic coefficients of a uniform (ny, nx) grid.

    Returns (ny-1, nx-1, 4, 4) with S = sum C[a,b] uy^a ux^b over normalized
    cell offsets — the same layout media/spline.py builds via scipy, and
    mathematically the same spline (FITPACK's s=0 knot vector IS not-a-knot).
    """
    grid = np.ascontiguousarray(grid, dtype=np.float64)
    ny, nx = grid.shape
    out = np.empty((ny - 1, nx - 1, 4, 4), dtype=np.float64)
    rc = _lib().rt_bicubic_cells(_dptr(grid), ny, nx, _dptr(out))
    if rc != 0:
        raise ValueError(f"rt_bicubic_cells failed (grid {ny}x{nx})")
    return out


def gradient2(grid: np.ndarray, h: float):
    """(d/dx, d/dy) grids, np.gradient(edge_order=2) semantics
    (RT_bench.py:450)."""
    grid = np.ascontiguousarray(grid, dtype=np.float64)
    ny, nx = grid.shape
    ddx = np.empty_like(grid)
    ddy = np.empty_like(grid)
    rc = _lib().rt_gradient2(_dptr(grid), ny, nx, float(h), _dptr(ddx), _dptr(ddy))
    if rc != 0:
        raise ValueError(f"rt_gradient2 failed (grid {ny}x{nx})")
    return ddx, ddy


def available() -> bool:
    """True when the native library can be built/loaded on this host."""
    try:
        _lib()
        return True
    except Exception:
        return False
