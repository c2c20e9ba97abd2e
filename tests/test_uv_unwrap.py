"""Chart-based UV unwrap (export/uv_unwrap.py — the xatlas equivalent,
reference threestudio/models/mesh.py:207-250): charts cover every face,
UVs land in [0,1]², triangles keep positive area, and no two charts overlap
in texture space."""

import numpy as np

from dreammesh4d_tpu.export.uv_unwrap import grow_charts, unwrap_uv
from dreammesh4d_tpu.utils.procedural import make_icosphere


def _tri_area2(uv, tri):
    a, b, c = uv[tri[:, 0]], uv[tri[:, 1]], uv[tri[:, 2]]
    return (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])


def test_unwrap_covers_and_fits():
    mesh = make_icosphere(2, radius=1.0)
    v, f = np.asarray(mesh.v_pos), np.asarray(mesh.t_pos_idx)
    v_tex, t_tex = unwrap_uv(v, f)
    assert t_tex.shape == f.shape
    assert v_tex.min() >= 0.0 and v_tex.max() <= 1.0
    # every face mapped, UV triangles non-degenerate and consistently wound
    areas = _tri_area2(v_tex, t_tex)
    assert np.all(np.abs(areas) > 1e-10)
    assert np.all(areas > 0) or np.all(areas < 0)


def test_charts_are_normal_bounded():
    mesh = make_icosphere(2, radius=1.0)
    v, f = np.asarray(mesh.v_pos), np.asarray(mesh.t_pos_idx)
    chart = grow_charts(v, f, max_angle_deg=45.0)
    assert chart.min() >= 0 and len(chart) == len(f)
    # a sphere at 45 deg must split into multiple charts (it can't unwrap flat)
    assert chart.max() >= 3


def test_charts_do_not_overlap():
    """Rasterize the UV layout at low res: no texel is claimed by faces of
    two different charts (margin keeps charts apart)."""
    mesh = make_icosphere(2, radius=1.0)
    v, f = np.asarray(mesh.v_pos), np.asarray(mesh.t_pos_idx)
    chart = grow_charts(v, f)
    v_tex, t_tex = unwrap_uv(v, f)
    S = 256
    owner = np.full((S, S), -1, np.int32)
    clash = 0
    for i, tri in enumerate(t_tex):
        uv = v_tex[tri] * S
        x0, y0 = np.floor(uv.min(0)).astype(int)
        x1, y1 = np.ceil(uv.max(0)).astype(int)
        for y in range(max(y0, 0), min(y1, S)):
            for x in range(max(x0, 0), min(x1, S)):
                p = np.array([x + 0.5, y + 0.5])
                a, b, c = uv
                d = (b[0]-a[0])*(c[1]-a[1]) - (b[1]-a[1])*(c[0]-a[0])
                if abs(d) < 1e-12:
                    continue
                w1 = ((c[1]-a[1])*(p[0]-a[0]) - (c[0]-a[0])*(p[1]-a[1])) / d
                w2 = (-(b[1]-a[1])*(p[0]-a[0]) + (b[0]-a[0])*(p[1]-a[1])) / d
                if w1 >= 0 and w2 >= 0 and w1 + w2 <= 1:
                    cid = chart[i]
                    if owner[y, x] >= 0 and owner[y, x] != cid:
                        clash += 1
                    owner[y, x] = cid
    assert clash == 0, f"{clash} texels claimed by two charts"


def test_wide_chart_does_not_overflow():
    """A single elongated planar chart (aspect >> 1.6, e.g. a flat ground
    plane) must be rescaled to fit the unit square, not clipped onto the
    border (advisor finding r3: shelf packing only normalized by total
    area, so w*scale could exceed 1)."""
    # flat strip in the xy-plane: 20 x 1 quad grid, one chart
    nx, nz = 21, 2
    xs = np.linspace(0.0, 20.0, nx)
    zs = np.linspace(0.0, 1.0, nz)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    v = np.stack([gx, np.zeros_like(gx), gz], -1).reshape(-1, 3)
    f = []
    for i in range(nx - 1):
        for j in range(nz - 1):
            a = i * nz + j
            b = (i + 1) * nz + j
            f.append([a, b, a + 1])
            f.append([b, b + 1, a + 1])
    f = np.asarray(f, np.int64)
    v_tex, t_tex = unwrap_uv(v, f)  # raises on packing overflow
    assert v_tex.min() >= 0.0 and v_tex.max() <= 1.0
    # the strip must keep its aspect (one chart, uniformly scaled): the UV
    # bbox spans ~20x more in u than in v
    span = v_tex.max(0) - v_tex.min(0)
    assert max(span) / min(span) > 10.0
    areas = _tri_area2(v_tex, t_tex)
    assert np.all(np.abs(areas) > 1e-12)


def test_relative_scale_preserved():
    """Texel density is uniform: UV area ratio between two faces matches
    their 3D area ratio (planar projection distorts < ~40% at 60 deg)."""
    mesh = make_icosphere(2, radius=1.0)
    v, f = np.asarray(mesh.v_pos), np.asarray(mesh.t_pos_idx)
    v_tex, t_tex = unwrap_uv(v, f)
    uv_areas = np.abs(_tri_area2(v_tex, t_tex))
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    areas3d = np.linalg.norm(np.cross(e1, e2), axis=-1)
    ratio = uv_areas / areas3d
    assert ratio.max() / ratio.min() < 2.5, (ratio.min(), ratio.max())
