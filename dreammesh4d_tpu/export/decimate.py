"""Quadric edge-collapse mesh decimation (native C++, ctypes-loaded).

TPU-framework replacement for the pymeshlab
``meshing_decimation_quadric_edge_collapse`` filter the reference pipeline
relies on when preparing the coarse mesh for SuGaR binding (the reference
simplifies the extracted mesh to a target face budget before binding
gaussians per-face; see custom/threestudio-dreammesh4d README stage 2 and
scripts/mesh_simplification.py:6-38 for the companion clustering script).

Garland-Heckbert QEM with area-weighted plane quadrics, boundary constraint
quadrics, optimal-placement collapses and normal-flip rejection — implemented
in native/mc/qem_decimate.cpp, compiled on first use with g++ (cached in
native/build/).  Vertex attributes (colors) are carried by averaging the
original vertices that collapse into each output vertex.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .mesh_io import MeshData

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "mc", "qem_decimate.cpp")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_SO = os.path.join(_BUILD_DIR, "libqem_decimate.so")

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
    lib.qem_decimate.restype = ctypes.c_int
    lib.qem_decimate.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
    ]
    lib.qem_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def quadric_decimate(
    mesh: MeshData,
    target_faces: Optional[int] = None,
    ratio: Optional[float] = None,
) -> MeshData:
    """Decimate ``mesh`` to ``target_faces`` (or ``ratio`` of current faces).

    Equivalent surface to pymeshlab's quadric edge collapse with
    ``preservetopology``-style normal-flip guards.  Vertex colors (if any)
    are averaged across each output vertex's collapsed source set.
    """
    if target_faces is None:
        if ratio is None:
            raise ValueError("pass target_faces or ratio")
        target_faces = max(4, int(round(mesh.n_faces * float(ratio))))
    target_faces = max(0, int(target_faces))

    verts = np.ascontiguousarray(mesh.v_pos, np.float32)
    faces = np.ascontiguousarray(mesh.t_pos_idx, np.int32)
    nv, nf = len(verts), len(faces)
    lib = _load_library()

    overts = ctypes.POINTER(ctypes.c_float)()
    ofaces = ctypes.POINTER(ctypes.c_int)()
    omap = ctypes.POINTER(ctypes.c_int)()
    onv = ctypes.c_int()
    onf = ctypes.c_int()
    ret = lib.qem_decimate(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nv,
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), nf,
        target_faces,
        ctypes.byref(overts), ctypes.byref(onv),
        ctypes.byref(ofaces), ctypes.byref(onf),
        ctypes.byref(omap),
    )
    if ret != 0:
        raise RuntimeError(f"qem_decimate failed with code {ret}")
    try:
        new_v = np.ctypeslib.as_array(overts, shape=(onv.value, 3)).copy()
        new_f = np.ctypeslib.as_array(ofaces, shape=(onf.value, 3)).copy()
        vmap = np.ctypeslib.as_array(omap, shape=(nv,)).copy()
    finally:
        lib.qem_free(overts)
        lib.qem_free(ofaces)
        lib.qem_free(omap)

    new_rgb = None
    if mesh.v_rgb is not None and onv.value > 0:
        src = np.asarray(mesh.v_rgb, np.float64)
        valid = vmap >= 0
        counts = np.bincount(vmap[valid], minlength=onv.value).astype(np.float64)
        counts = np.maximum(counts, 1.0)
        new_rgb = np.zeros((onv.value, 3))
        for d in range(3):
            new_rgb[:, d] = np.bincount(
                vmap[valid], weights=src[valid, d], minlength=onv.value
            )
        new_rgb = (new_rgb / counts[:, None]).astype(np.float32)

    return MeshData(
        v_pos=new_v.astype(np.float32),
        t_pos_idx=new_f.astype(np.int32),
        v_rgb=new_rgb,
    )
