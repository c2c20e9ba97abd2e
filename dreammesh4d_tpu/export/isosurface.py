"""Host-side isosurface extraction (the ``mc-cpu`` path).

Replaces the PyMCubes + MarchingCubeCPUHelper stack
(threestudio/models/isosurface.py:19-67): a native C++ marching-tetrahedra
extractor (native/mc/marching_tets.cpp) loaded through ctypes, plus the
surrounding behavior of the reference helper — grid-coordinate normalization
to the bbox, auto thresholding and outlier removal live in the geometry layer
(models/geometry/base-like helpers below).

The shared library is compiled on first use with g++ (cached under
native/build/); a pure-numpy fallback exists for environments without a
compiler (slow, test-sized grids only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from .mesh_io import MeshData

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "mc", "marching_tets.cpp")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_SO = os.path.join(_BUILD_DIR, "libmarching_tets.so")

_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
        )
    lib = ctypes.CDLL(_SO)
    lib.mt_extract.restype = ctypes.c_int
    lib.mt_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mt_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def marching_cubes(grid: np.ndarray, iso: float) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a dense (nx, ny, nz) scalar grid.

    Returns (verts (V,3) float32 in GRID coordinates, faces (F,3) int32) with
    outward orientation for density-above-iso regions — same contract as
    ``mcubes.marching_cubes`` in the reference (isosurface.py:19-25)."""
    grid = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = grid.shape
    lib = _load_library()
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nf = ctypes.c_int()
    ret = lib.mt_extract(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
        ctypes.c_float(iso),
        ctypes.byref(verts_p), ctypes.byref(nv), ctypes.byref(faces_p), ctypes.byref(nf),
    )
    if ret != 0:
        raise RuntimeError(f"mt_extract failed with code {ret}")
    try:
        verts = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy()
        faces = np.ctypeslib.as_array(faces_p, shape=(nf.value, 3)).copy()
    finally:
        lib.mt_free(verts_p)
        lib.mt_free(faces_p)
    return verts.astype(np.float32), faces.astype(np.int32)


def extract_isosurface(
    density: np.ndarray,
    threshold: Optional[float] = None,
    bbox_min=(-1.0, -1.0, -1.0),
    bbox_max=(1.0, 1.0, 1.0),
    remove_outliers: bool = True,
    outlier_ratio: float = 0.1,
) -> MeshData:
    """Reference ``BaseImplicitGeometry.isosurface`` behavior
    (threestudio/models/geometry/base.py:119-180): auto threshold =
    mean(density[density > eps]) when not given, grid->world coordinate
    mapping to the bbox, small-component removal."""
    if threshold is None:
        eps = 1e-5
        sel = density > eps
        threshold = float(density[sel].mean()) if sel.any() else 0.0
    verts, faces = marching_cubes(density, threshold)
    if len(verts) == 0:
        return MeshData(v_pos=np.zeros((0, 3), np.float32), t_pos_idx=np.zeros((0, 3), np.int32))
    res = np.asarray(density.shape, np.float32)
    lo = np.asarray(bbox_min, np.float32)
    hi = np.asarray(bbox_max, np.float32)
    v_world = lo + verts / (res - 1.0) * (hi - lo)
    mesh = MeshData(v_pos=v_world.astype(np.float32), t_pos_idx=faces)
    if remove_outliers and len(faces):
        mesh = remove_small_components(mesh, outlier_ratio)
    return mesh


def remove_small_components(mesh: MeshData, min_ratio: float = 0.1) -> MeshData:
    """Drop connected components with < min_ratio x largest component's faces
    (reference mesh outlier removal, threestudio/models/mesh.py:113-140)."""
    import collections

    faces = mesh.t_pos_idx
    n_verts = mesh.n_verts
    parent = np.arange(n_verts)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (a, b, c) in faces:
        ra, rb, rc = find(a), find(b), find(c)
        parent[rb] = ra
        parent[rc] = ra
    roots = np.asarray([find(v) for v in faces[:, 0]])
    sizes = collections.Counter(roots.tolist())
    max_size = max(sizes.values())
    keep_roots = {r for r, s in sizes.items() if s >= min_ratio * max_size}
    keep = np.asarray([r in keep_roots for r in roots])
    new_faces = faces[keep]
    used = np.unique(new_faces)
    remap = -np.ones(n_verts, np.int64)
    remap[used] = np.arange(len(used))
    return MeshData(
        v_pos=mesh.v_pos[used],
        t_pos_idx=remap[new_faces].astype(np.int32),
        v_rgb=mesh.v_rgb[used] if mesh.v_rgb is not None else None,
    )
