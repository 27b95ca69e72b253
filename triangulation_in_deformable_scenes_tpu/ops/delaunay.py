"""Host-side 2D Delaunay triangulation of the landmark cloud.

The reference lifts the landmarks' (x, y) world coordinates into Qhull's 2D
Delaunay ("d Qbb Qt") and keeps the 3D points as mesh vertices
(``Modules/Utils/Geometry.cc:317-368``). Triangulation is inherently
data-dependent host work -- it runs once per outer refinement iteration, never
inside ``jit`` (the device consumes only the padded neighbor arrays built in
``mesh.py``).

Two interchangeable backends:

- native C++ Bowyer-Watson (``native/delaunay.cc``, loaded via ctypes) -- the
  production runtime path, no Python in the loop;
- ``scipy.spatial.Delaunay`` (Qhull, same engine as the reference) -- fallback
  and cross-validation oracle in tests.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _load_native():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libtids_native.so"),
        os.path.join(os.path.dirname(__file__), "libtids_native.so"),
    ):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.tids_delaunay2d.restype = ctypes.c_int
            lib.tids_delaunay2d.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _NATIVE = lib
            break
    return _NATIVE


def delaunay_triangles(xy: np.ndarray, backend: str = "auto") -> np.ndarray:
    """Triangulate 2D points; returns int32 triangle indices [T, 3].

    backend: "auto" (native if built, else scipy), "native", or "scipy".
    """
    xy = np.ascontiguousarray(xy, dtype=np.float64)
    n = len(xy)
    if n < 3:
        raise ValueError("Not enough points to create a triangular mesh.")

    if backend in ("auto", "native"):
        lib = _load_native()
        if lib is not None:
            cap = 2 * n + 16
            tri = np.empty((cap, 3), dtype=np.int32)
            ntri = ctypes.c_int(0)
            rc = lib.tids_delaunay2d(
                xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                n,
                tri.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                ctypes.byref(ntri),
            )
            if rc == 0:
                return np.ascontiguousarray(tri[: ntri.value])
            if backend == "native":
                raise RuntimeError(f"native delaunay failed with rc={rc}")
        elif backend == "native":
            raise RuntimeError("native delaunay library not built")

    from scipy.spatial import Delaunay

    # Qhull options mirror the reference's "d Qbb Qt" (Geometry.cc:339).
    return Delaunay(xy, qhull_options="Qbb Qt").simplices.astype(np.int32)
