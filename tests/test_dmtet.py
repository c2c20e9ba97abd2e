"""Differentiable marching tets + tetrahedra-sdf-grid (models/geometry/dmtet.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.models.geometry.dmtet import (
    TetSDFGridConfig,
    build_tet_grid,
    export_mesh,
    forward_features,
    init_tet_sdf_grid,
    isosurface,
    marching_tets,
    tet_grid_positions,
)


def test_tet_grid_topology():
    g = build_tet_grid(4)
    assert g.verts.shape == (125, 3)
    assert g.tets.shape == (4 * 4 * 4 * 6, 4)
    # all tets have positive volume (consistent orientation after decomposition)
    v = g.verts[g.tets]
    vol = np.einsum(
        "ij,ij->i",
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]),
        v[:, 3] - v[:, 0],
    )
    assert np.all(vol != 0)
    # every tet edge maps to a unique-edge row containing the same vertices
    e = g.edges[g.tet_edges]  # (T, 6, 2)
    lo = np.minimum(g.tets[:, [0, 0, 0, 1, 1, 2]], g.tets[:, [1, 2, 3, 2, 3, 3]])
    hi = np.maximum(g.tets[:, [0, 0, 0, 1, 1, 2]], g.tets[:, [1, 2, 3, 2, 3, 3]])
    assert np.array_equal(e[..., 0], lo) and np.array_equal(e[..., 1], hi)


def test_sphere_surface_accuracy():
    g = build_tet_grid(24)
    pos = jnp.asarray(g.verts) * 2.0 - 1.0
    sdf = jnp.linalg.norm(pos, axis=-1) - 0.6
    out = jax.jit(lambda s, p: marching_tets(s, p, g))(sdf, pos)
    fm = np.asarray(out.face_mask)
    assert fm.sum() > 100
    used = np.unique(np.asarray(out.faces)[fm].reshape(-1))
    r = np.linalg.norm(np.asarray(out.verts)[used], axis=-1)
    assert float(np.abs(r - 0.6).max()) < 0.01  # verts sit on the sphere
    # surface area close to 4*pi*r^2
    v = np.asarray(out.verts)
    f = np.asarray(out.faces)[fm]
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
    assert abs(area / (4 * np.pi * 0.36) - 1.0) < 0.05
    # consistent orientation: all face normals point the same way radially
    n = np.cross(b - a, c - a)
    center = (a + b + c) / 3
    dots = np.einsum("ij,ij->i", n, center)
    assert (dots > 0).all() or (dots < 0).all()


def test_gradients_flow_to_sdf_and_positions():
    g = build_tet_grid(8)
    pos = jnp.asarray(g.verts) * 2.0 - 1.0
    sdf0 = jnp.linalg.norm(pos, axis=-1) - 0.5

    def surf_loss(sdf, p):
        out = marching_tets(sdf, p, g)
        # mean squared radius of crossing vertices (only where real)
        r2 = (out.verts**2).sum(-1)
        w = out.vert_mask.astype(jnp.float32)
        return (r2 * w).sum() / w.sum()

    gs, gp = jax.grad(surf_loss, argnums=(0, 1))(sdf0, pos)
    assert np.isfinite(np.asarray(gs)).all() and float(jnp.abs(gs).sum()) > 0
    assert np.isfinite(np.asarray(gp)).all() and float(jnp.abs(gp).sum()) > 0
    # a uniform positive sdf offset moves the level set {r = 0.5 - c}
    # inward, so mean r^2 falls: directional derivative must be negative
    d = float((gs * jnp.ones_like(sdf0)).sum())
    assert d < 0


def test_tet_sdf_grid_geometry_roundtrip():
    cfg = TetSDFGridConfig(isosurface_resolution=16, init_shape_radius=0.5)
    params = init_tet_sdf_grid(cfg, jax.random.PRNGKey(0))
    out = isosurface(params, cfg)
    assert int(out.face_mask.sum()) > 50
    verts, faces = export_mesh(params, cfg)
    r = np.linalg.norm(verts, axis=-1)
    assert abs(float(r.mean()) - 0.5) < 0.05
    assert faces.min() >= 0 and faces.max() < len(verts)
    feats = forward_features(params, cfg, jnp.asarray(verts))
    assert feats.shape == (len(verts), 3)
    assert np.isfinite(np.asarray(feats)).all()


def test_deformable_grid_moves_vertices():
    cfg = TetSDFGridConfig(isosurface_resolution=8)
    params = init_tet_sdf_grid(cfg, jax.random.PRNGKey(0))
    p0 = tet_grid_positions(params, cfg)
    params2 = dict(params, deform=jnp.ones_like(params["deform"]))
    p1 = tet_grid_positions(params2, cfg)
    half_cell = cfg.radius * 2.0 / cfg.isosurface_resolution / 2.0
    delta = np.asarray(p1 - p0)
    assert np.allclose(delta, np.tanh(1.0) * half_cell, atol=1e-6)
    # deformation is bounded by half a cell: grid stays untangled
    assert np.abs(delta).max() <= half_cell + 1e-6
