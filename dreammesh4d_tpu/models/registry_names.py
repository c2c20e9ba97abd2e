"""Registry shims: reference component names -> framework implementations.

The reference resolves every component through the registry
(threestudio.find(name)); these bindings keep that lookup surface intact so
configs/tools written against the reference names find the equivalent
implementation here.  Each entry points at the module/callable that carries
the actual logic (the functional core lives in ops/ + models/ + systems/).
"""

from __future__ import annotations

import dreammesh4d_tpu as ds


def _bind(name: str, target):
    if name not in ds.__modules__:
        ds.__modules__[name] = target
    return target


def register_reference_names() -> None:
    from ..models.geometry import dynamic_sugar as _dyn
    from ..models.geometry import gaussian as _gaussian
    from ..models.geometry import implicit_volume as _iv
    from ..models.geometry import sugar as _sugar
    from ..models.renderers import nerf_volume_renderer as _nvr
    from ..models.renderers import sugar_rasterizer as _sr
    from ..export import isosurface as _iso
    from ..export import texture_bake as _tb

    from ..models.geometry import implicit_sdf as _isdf
    from ..models.renderers import neus_volume_renderer as _neus

    # geometries (reference custom/.../geometry + threestudio/models/geometry)
    _bind("sugar", _sugar)
    _bind("implicit-sdf", _isdf)
    _bind("neus-volume-renderer", _neus)
    _bind("dynamic-sugar", _dyn)
    _bind("gaussian-splatting", _gaussian)
    _bind("implicit-volume", _iv)

    # renderers (custom/.../renderer + threestudio/models/renderers)
    _bind("diff-sugar-rasterizer-normal", _sr)
    _bind("diff-sugar-rasterizer-temporal", _sr)
    _bind("diff-sugar-rasterizer-shading", _sr)
    _bind("nerf-volume-renderer", _nvr)

    from ..models.geometry import custom_mesh as _cmesh
    from ..models.geometry import dmtet as _dmtet
    from ..models.geometry import volume_grid as _vgrid
    from ..export import gaussian_io as _gio
    from ..utils import perceptual as _perc

    _bind("custom-mesh", _cmesh)
    _bind("tetrahedra-sdf-grid", _dmtet)
    _bind("volume-grid", _vgrid)
    _bind("gaussian-splatting-io", _gio)
    _bind("perceptual-loss", _perc)

    # exporters (threestudio/models/exporters + custom/.../geometry/exporter)
    _bind("mesh-exporter", _iso)
    _bind("gaussian-mesh-exporter", _tb)
    # dummy-exporter (threestudio/models/exporters/base.py:55-64): no-op
    _bind("dummy-exporter", lambda *a, **k: [])


register_reference_names()
