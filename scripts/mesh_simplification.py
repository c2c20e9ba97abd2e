"""Mesh simplification by vertex clustering (command-compatible with the
reference custom/threestudio-dreammesh4d/scripts/mesh_simplification.py:6-38,
sans open3d): voxel size = bbox_diagonal / scale, vertices averaged per
voxel, output written as ``{name}_{scale}_{nverts}.ply`` next to the input.

Usage: python scripts/mesh_simplification.py --mesh_path coarse.obj --scale 30
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dreammesh4d_tpu.export.mesh_io import MeshData, load_mesh, save_ply_mesh


def simplify_vertex_clustering(mesh: MeshData, voxel_size: float) -> MeshData:
    v = np.asarray(mesh.v_pos, np.float64)
    lo = v.min(0)
    keys = np.floor((v - lo) / voxel_size).astype(np.int64)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    n_clusters = len(uniq)

    # average position (and color) per cluster
    new_v = np.zeros((n_clusters, 3))
    counts = np.bincount(inverse, minlength=n_clusters).astype(np.float64)
    for d in range(3):
        new_v[:, d] = np.bincount(inverse, weights=v[:, d], minlength=n_clusters)
    new_v /= counts[:, None]
    new_rgb = None
    if mesh.v_rgb is not None:
        new_rgb = np.zeros((n_clusters, 3))
        for d in range(3):
            new_rgb[:, d] = np.bincount(
                inverse, weights=np.asarray(mesh.v_rgb, np.float64)[:, d],
                minlength=n_clusters,
            )
        new_rgb /= counts[:, None]

    faces = inverse[mesh.t_pos_idx]
    nondegenerate = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[nondegenerate]
    # dedupe faces regardless of rotation
    key = np.sort(faces, axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    faces = faces[np.sort(first)]
    return MeshData(
        v_pos=new_v.astype(np.float32),
        t_pos_idx=faces.astype(np.int32),
        v_rgb=new_rgb.astype(np.float32) if new_rgb is not None else None,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh_path", required=True)
    parser.add_argument("--scale", type=float, default=30.0,
                        help="bbox diagonal / scale = clustering voxel size")
    parser.add_argument("--method", choices=["cluster", "quadric"], default="cluster",
                        help="cluster = vertex clustering (reference script parity); "
                             "quadric = QEM edge collapse (pymeshlab-filter parity)")
    parser.add_argument("--target_faces", type=int, default=None,
                        help="quadric method: face budget (default n_faces/4)")
    args = parser.parse_args()

    mesh = load_mesh(args.mesh_path)
    if args.method == "quadric":
        from dreammesh4d_tpu.export.decimate import quadric_decimate
        target = args.target_faces or max(4, mesh.n_faces // 4)
        out = quadric_decimate(mesh, target_faces=target)
    else:
        diag = float(np.linalg.norm(mesh.v_pos.max(0) - mesh.v_pos.min(0)))
        voxel = diag / args.scale
        out = simplify_vertex_clustering(mesh, voxel)
    base = os.path.splitext(args.mesh_path)[0]
    suffix = f"qem{out.n_faces}" if args.method == "quadric" else f"{int(args.scale)}"
    out_path = f"{base}_{suffix}_{out.n_verts}.ply"
    save_ply_mesh(out_path, out)
    print(f"{mesh.n_verts} verts -> {out.n_verts} verts; saved {out_path}")


if __name__ == "__main__":
    main()
