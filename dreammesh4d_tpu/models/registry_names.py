"""Registry factories: reference component names -> constructable factories.

The reference registry contract is ``threestudio.find(name)(cfg) -> component``
(threestudio/__init__.py:18-32; systems/base.py:249-303 instantiates geometry/
material/background/renderer exactly that way).  The functional core of this
framework lives in ops/ + models/ + export/; each binding here is a factory
that takes a plain config mapping (the YAML sub-block a reference config would
pass) and returns a **constructed, usable component** — config resolved to the
framework dataclass, parameters initialized, forward functions bound.  No name
resolves to a bare module.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import numpy as np

import dreammesh4d_tpu as ds


class Component:
    """A constructed component: config + state + bound callables.

    ``state`` holds initialized parameters / immutable topology; additional
    keyword arguments become attributes (bound forward functions).  When
    ``call`` is given the handle itself is callable (exporter/loss surfaces).
    """

    def __init__(self, cfg=None, state=None, call=None, **fns):
        self.cfg = cfg
        self.state = state
        self._call = call
        for k, v in fns.items():
            setattr(self, k, v)

    def __call__(self, *a, **k):
        if self._call is None:
            raise TypeError("component is not callable; use its bound methods")
        return self._call(*a, **k)


def _dc(cls, cfg: Optional[Dict[str, Any]]):
    """Dataclass from a config dict, ignoring unknown keys and recursing into
    nested dataclass fields (mirrors the YAML compatibility surface)."""
    cfg = dict(cfg or {})
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in cfg:
            continue
        v = cfg[f.name]
        if isinstance(v, dict):
            ft = f.type if dataclasses.is_dataclass(f.type) else None
            if ft is None and f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
                proto = f.default_factory()  # type: ignore[misc]
                ft = type(proto) if dataclasses.is_dataclass(proto) else None
            if ft is not None:
                v = _dc(ft, v)
        kwargs[f.name] = v
    return cls(**kwargs)


def _rng(cfg: Optional[Dict[str, Any]]):
    return jax.random.PRNGKey(int((cfg or {}).get("seed", 0)))


def _bind(name: str, target):
    if name not in ds.__modules__:
        ds.__modules__[name] = target
    return target


def _load_bind_mesh(cfg: Dict[str, Any]):
    """Mesh for sugar binding: explicit arrays (``mesh=``) or the reference
    key ``surface_mesh_to_bind_path`` (sugar.py:119-161 loads via open3d)."""
    from ..export.mesh_io import MeshData, load_mesh

    if "mesh" in cfg:
        m = cfg["mesh"]
        if isinstance(m, MeshData):
            return m
        return MeshData(
            v_pos=np.asarray(m["v_pos"], np.float32),
            t_pos_idx=np.asarray(m["t_pos_idx"], np.int32),
            v_rgb=(np.asarray(m["v_rgb"], np.float32) if m.get("v_rgb") is not None else None),
        )
    path = cfg.get("surface_mesh_to_bind_path")
    if not path:
        raise ValueError("sugar geometry needs 'surface_mesh_to_bind_path' or 'mesh'")
    return load_mesh(str(path))


# ---------------------------------------------------------------------------
# Geometry factories
# ---------------------------------------------------------------------------


def make_implicit_volume(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import implicit_volume as m

    c = _dc(m.ImplicitVolumeConfig, cfg)
    params = m.init_implicit_volume(c, _rng(cfg))
    return Component(
        cfg=c, state=params,
        forward_density=partial(m.forward_density, params, c),
        forward_field=partial(m.forward_field, params, c) if hasattr(m, "forward_field") else None,
    )


def make_implicit_sdf(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import implicit_sdf as m

    c = _dc(m.ImplicitSDFConfig, cfg)
    params = m.init_implicit_sdf(c, _rng(cfg))
    return Component(
        cfg=c, state=params,
        forward_sdf=partial(m.forward_sdf, params, c),
        sdf_normal=partial(m.sdf_normal, params, c),
    )


def make_volume_grid(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import volume_grid as m

    c = _dc(m.VolumeGridConfig, cfg)
    params = m.init_volume_grid(c, _rng(cfg))
    return Component(
        cfg=c, state=params,
        forward_density=partial(m.forward_density, params, c),
        forward_field=partial(m.forward_field, params, c),
    )


def make_tet_sdf_grid(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import dmtet as m

    c = _dc(m.TetSDFGridConfig, cfg)
    params = m.init_tet_sdf_grid(c, _rng(cfg))
    return Component(
        cfg=c, state=params,
        isosurface=partial(m.isosurface, params, c),
    )


def make_custom_mesh(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import custom_mesh as m

    c = _dc(m.CustomMeshConfig, cfg)
    params = m.init_custom_mesh(c, _rng(cfg))
    return Component(
        cfg=c, state=params,
        forward_features=partial(m.forward_features, params, c),
    )


def make_gaussian_splatting(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import gaussian as m

    c = _dc(m.GaussianConfig, cfg)
    state = m.init_random_sphere(c, _rng(cfg))
    return Component(cfg=c, state=state, renderable=partial(m.renderable, state))


def make_sugar(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import sugar as m

    cfg = dict(cfg or {})
    c = _dc(m.SuGaRConfig, cfg)
    mesh = _load_bind_mesh(cfg)
    params, static = m.create_sugar(c, mesh)
    return Component(
        cfg=c, state=(params, static),
        gaussian_attributes=partial(m.gaussian_attributes, params, static),
    )


def make_dynamic_sugar(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import dynamic_sugar as dm
    from ..models.geometry import deformation as dfm
    from ..models.geometry import sugar as sm

    cfg = dict(cfg or {})
    sc = _dc(sm.SuGaRConfig, cfg)
    mesh = _load_bind_mesh(cfg)
    params, sugar_static = sm.create_sugar(sc, mesh)
    c = _dc(dm.DynamicSuGaRConfig, cfg)
    static = dm.build_dynamic_static(c, sugar_static, np.asarray(params.points),
                                     seed=int(cfg.get("seed", 0)))
    if c.dynamic_mode == "discrete":
        n_pts = static.node_xyz.shape[0] if c.use_deform_graph else params.points.shape[0]
        deform_params = dm.init_discrete_params(c, n_pts)
    else:
        deform_params = dfm.init_deformation(c.deformation, _rng(cfg))
    return Component(
        cfg=c, state=(params, deform_params, static),
        timed_all=partial(dm.timed_all, params, deform_params, c.deformation, static),
    )


# ---------------------------------------------------------------------------
# Renderer factories
# ---------------------------------------------------------------------------


def _make_sugar_rasterizer(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..ops.gs.rasterize import RasterizerConfig
    from ..models.renderers import sugar_rasterizer as m

    cfg = dict(cfg or {})
    import math

    fovy = math.radians(float(cfg.pop("fovy_deg", 49.1)))
    width = int(cfg.pop("width", 512))
    height = int(cfg.pop("height", 512))
    tan = math.tan(fovy / 2)
    fields = set(RasterizerConfig._fields) - {"width", "height", "tan_fovx", "tan_fovy"}
    rc = RasterizerConfig(width=width, height=height, tan_fovx=tan * width / height,
                          tan_fovy=tan,
                          **{k: v for k, v in cfg.items() if k in fields})
    return Component(
        cfg=rc,
        render_view=partial(m.render_view, cfg=rc),
        render_batch=partial(m.render_batch, cfg=rc),
        depth_to_normal=m.depth_to_normal,
    )


def make_nerf_volume_renderer(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import implicit_volume as gm
    from ..models.renderers import nerf_volume_renderer as m

    cfg = dict(cfg or {})
    rc = _dc(m.NeRFRendererConfig, cfg)
    occ = m.init_occgrid(rc) if rc.estimator == "occgrid" else None
    geo_cfg = _dc(gm.ImplicitVolumeConfig, cfg.get("geometry"))

    def render(geo_params, rays_o, rays_d, light_positions, bg_color, **kw):
        return m.render_rays(geo_params, geo_cfg, rc, rays_o, rays_d,
                             light_positions, bg_color,
                             occ_state=kw.pop("occ_state", occ), **kw)

    return Component(cfg=rc, state=occ, render_rays=render)


def make_neus_volume_renderer(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..models.geometry import implicit_sdf as gm
    from ..models.renderers import neus_volume_renderer as m

    cfg = dict(cfg or {})
    c = _dc(m.NeuSRendererConfig, cfg)
    geo_cfg = _dc(gm.ImplicitSDFConfig, cfg.get("geometry"))
    variance = m.init_neus_variance(c)

    def render(geo_params, rays_o, rays_d, bg_color, var_params=None, **kw):
        return m.render_rays_neus(geo_params, var_params if var_params is not None else variance,
                                  geo_cfg, c, rays_o, rays_d, bg_color, **kw)

    return Component(cfg=c, state=variance, render_rays=render, neus_alphas=m.neus_alphas)


# ---------------------------------------------------------------------------
# Exporter / IO / loss factories
# ---------------------------------------------------------------------------


def make_mesh_exporter(cfg: Optional[Dict[str, Any]] = None) -> Component:
    """Reference mesh-exporter contract: callable -> mesh from a density grid
    (threestudio/models/exporters/mesh_exporter.py:17-175; isosurface params
    from the geometry config)."""
    from ..export import isosurface as m

    cfg = dict(cfg or {})
    kw = dict(
        threshold=cfg.get("isosurface_threshold"),
        remove_outliers=bool(cfg.get("isosurface_remove_outliers", True)),
        outlier_ratio=float(cfg.get("isosurface_outlier_ratio", 0.1)),
    )
    if cfg.get("isosurface_threshold") in ("auto", None):
        kw["threshold"] = None

    def export(density, bbox_min=(-1.0, -1.0, -1.0), bbox_max=(1.0, 1.0, 1.0)):
        return m.extract_isosurface(np.asarray(density), bbox_min=bbox_min,
                                    bbox_max=bbox_max, **kw)

    return Component(cfg=cfg, call=export, marching_cubes=m.marching_cubes)


def make_gaussian_mesh_exporter(cfg: Optional[Dict[str, Any]] = None) -> Component:
    """Reference gaussian-mesh-exporter (custom/.../geometry/exporter.py:16-44):
    callable -> textured/vertex-colored OBJ from a bound SuGaR mesh."""
    from ..export import texture_bake as m

    cfg = dict(cfg or {})

    def export(path, verts, faces, v_rgb=None, **kw):
        if kw.get("texture") is not None:
            return m.export_textured_mesh(str(path), np.asarray(verts),
                                          np.asarray(faces), **kw)
        from ..export.mesh_io import MeshData, save_obj

        save_obj(str(path), MeshData(
            v_pos=np.asarray(verts, np.float32),
            t_pos_idx=np.asarray(faces, np.int32),
            v_rgb=None if v_rgb is None else np.asarray(v_rgb, np.float32)))

    return Component(cfg=cfg, call=export,
                     build_square_atlas=m.build_square_atlas,
                     bake_texture=m.bake_texture)


def make_gaussian_io(cfg: Optional[Dict[str, Any]] = None) -> Component:
    from ..export import gaussian_io as m

    return Component(cfg=dict(cfg or {}),
                     save_ply=m.save_gaussians_ply,
                     load_ply=m.load_gaussians_ply)


def make_perceptual_loss(cfg: Optional[Dict[str, Any]] = None) -> Component:
    """Reference PerceptualLoss module contract: loss = p(x, y)
    (threestudio/utils/perceptual/perceptual.py)."""
    from ..utils import perceptual as m

    params = m.init_perceptual(_rng(cfg))
    return Component(cfg=dict(cfg or {}), state=params,
                     call=partial(m.perceptual_loss, params))


def register_reference_names() -> None:
    # geometries (reference custom/.../geometry + threestudio/models/geometry)
    _bind("sugar", make_sugar)
    _bind("dynamic-sugar", make_dynamic_sugar)
    _bind("gaussian-splatting", make_gaussian_splatting)
    _bind("implicit-volume", make_implicit_volume)
    _bind("implicit-sdf", make_implicit_sdf)
    _bind("custom-mesh", make_custom_mesh)
    _bind("tetrahedra-sdf-grid", make_tet_sdf_grid)
    _bind("volume-grid", make_volume_grid)

    # renderers (custom/.../renderer + threestudio/models/renderers)
    _bind("diff-sugar-rasterizer-normal", _make_sugar_rasterizer)
    _bind("diff-sugar-rasterizer-temporal", _make_sugar_rasterizer)
    _bind("diff-sugar-rasterizer-shading", _make_sugar_rasterizer)
    _bind("nerf-volume-renderer", make_nerf_volume_renderer)
    _bind("neus-volume-renderer", make_neus_volume_renderer)

    # exporters / IO / losses
    _bind("mesh-exporter", make_mesh_exporter)
    _bind("gaussian-mesh-exporter", make_gaussian_mesh_exporter)
    _bind("gaussian-splatting-io", make_gaussian_io)
    _bind("perceptual-loss", make_perceptual_loss)
    # dummy-exporter (threestudio/models/exporters/base.py:55-64): no-op
    _bind("dummy-exporter", lambda *a, **k: Component(cfg={}, call=lambda: []))


register_reference_names()
