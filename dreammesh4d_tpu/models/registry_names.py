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

    # exporters (threestudio/models/exporters + custom/.../geometry/exporter)
    _bind("mesh-exporter", _iso)
    _bind("gaussian-mesh-exporter", _tb)


register_reference_names()
