"""Pallas blend kernel vs the pure-XLA reference blend (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.ops.cameras import (
    camera_position_from_spherical,
    get_cam_info_gaussian,
    look_at_c2w,
)
from dreammesh4d_tpu.ops.gs import RasterizerConfig, rasterize
from dreammesh4d_tpu.ops.quaternion import quat_normalize

FOV = 0.8


def make_scene(N=200, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    p = jax.random.normal(ks[0], (N, 3)) * 0.4
    quats = quat_normalize(jax.random.normal(ks[1], (N, 4)))
    scales = jnp.exp(jnp.log(0.05) + 0.3 * jax.random.normal(ks[2], (N, 3)))
    colors = jax.random.uniform(ks[3], (N, 3))
    opac = jax.random.uniform(ks[4], (N,), minval=0.3, maxval=0.95)
    pos = camera_position_from_spherical(jnp.asarray(15.0), jnp.asarray(30.0), jnp.asarray(2.5))
    cam = get_cam_info_gaussian(look_at_c2w(pos), FOV, FOV, 0.01, 100.0)
    return p, quats, scales, colors, opac, cam


def cfgs(W=64):
    t = float(np.tan(FOV / 2))
    base = dict(width=W, height=W, tan_fovx=t, tan_fovy=t, tile_capacity=256, chunk=32)
    return (
        RasterizerConfig(**base, backend="xla"),
        RasterizerConfig(**base, backend="pallas", interpret=True),
    )


def render(cfg, p, quats, scales, colors, opac, cam, bg):
    return rasterize(p, opac, cam, cfg, bg, colors=colors, scales=scales, quats=quats)


def test_forward_matches_xla():
    scene = make_scene()
    cfg_xla, cfg_pl = cfgs()
    bg = jnp.asarray([0.3, 0.2, 0.1])
    out_x = render(cfg_xla, *scene, bg)
    out_p = render(cfg_pl, *scene, bg)
    np.testing.assert_allclose(np.asarray(out_p.rgb), np.asarray(out_x.rgb), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_p.alpha), np.asarray(out_x.alpha), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_p.depth), np.asarray(out_x.depth), atol=5e-3)


def test_gradients_match_xla():
    scene = make_scene(N=60, seed=1)
    p, quats, scales, colors, opac, cam = scene
    cfg_xla, cfg_pl = cfgs(W=32)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    target = jnp.zeros((32, 32, 3))

    def loss(cfg, params):
        out = rasterize(
            params["p"], jax.nn.sigmoid(params["ol"]), cam, cfg, bg,
            colors=jax.nn.sigmoid(params["c"]), scales=jnp.exp(params["ls"]),
            quats=params["q"],
        )
        return ((out.rgb - target) ** 2).mean() + 0.1 * out.depth.mean() + 0.05 * out.alpha.mean()

    params = {
        "p": p, "q": quats, "ls": jnp.log(scales),
        "c": jnp.log(colors / (1 - colors + 1e-6)), "ol": jnp.full((60,), 0.5),
    }
    gx = jax.grad(lambda pr: loss(cfg_xla, pr))(params)
    gp = jax.grad(lambda pr: loss(cfg_pl, pr))(params)
    for k in params:
        a, b = np.asarray(gx[k]), np.asarray(gp[k])
        assert np.isfinite(b).all(), k
        denom = np.abs(a).max() + 1e-8
        # 3e-3: the kernels run the transmittance cumsums as one-pass bf16
        # MXU matmuls (~0.4% rounding, pallas_blend._matmul_bf16) — matches
        # the resident-backend tolerance below
        np.testing.assert_allclose(b / denom, a / denom, atol=3e-3, err_msg=k)


def test_early_termination_correct():
    """A wall of fully opaque gaussians in front: kernel must early-exit and
    still produce the same image as XLA."""
    N = 100
    p = jnp.concatenate(
        [jnp.zeros((50, 3)) + jnp.asarray([0.5, 0, 0]), jnp.zeros((50, 3))], 0
    ) + 1e-3 * jax.random.normal(jax.random.PRNGKey(0), (N, 3))
    quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (N, 1))
    scales = jnp.full((N, 3), 0.3)
    colors = jnp.concatenate([jnp.ones((50, 3)) * jnp.asarray([1.0, 0, 0]),
                              jnp.ones((50, 3)) * jnp.asarray([0.0, 0, 1.0])], 0)
    opac = jnp.full((N,), 0.99)
    pos = camera_position_from_spherical(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(2.5))
    cam = get_cam_info_gaussian(look_at_c2w(pos), FOV, FOV, 0.01, 100.0)
    cfg_xla, cfg_pl = cfgs(W=32)
    bg = jnp.zeros(3)
    out_x = render(cfg_xla, p, quats, scales, colors, opac, cam, bg)
    out_p = render(cfg_pl, p, quats, scales, colors, opac, cam, bg)
    np.testing.assert_allclose(np.asarray(out_p.rgb), np.asarray(out_x.rgb), atol=3e-3)
    # the front wall is red
    assert np.asarray(out_p.rgb)[16, 16, 0] > 0.9


def test_pallas_in_render_view():
    """Fused 6-channel (rgb+normal) + depth path through the Pallas kernel."""
    from dreammesh4d_tpu.models.geometry.sugar import SuGaRConfig, create_sugar, gaussian_attributes
    from dreammesh4d_tpu.models.renderers.sugar_rasterizer import render_view
    from dreammesh4d_tpu.ops.meshops import face_normals
    from dreammesh4d_tpu.utils.procedural import make_icosphere

    mesh = make_icosphere(1, radius=0.8)
    params, static = create_sugar(SuGaRConfig(n_gaussians_per_surface_triangle=3), mesh)
    attrs = gaussian_attributes(params, static)
    fn = face_normals(params.points, static.faces)
    gs_n = jnp.repeat(fn, 3, axis=0)
    pos = camera_position_from_spherical(jnp.asarray(10.0), jnp.asarray(20.0), jnp.asarray(2.5))
    cam = get_cam_info_gaussian(look_at_c2w(pos), FOV, FOV, 0.01, 100.0)
    cfg_xla, cfg_pl = cfgs(W=64)
    o1 = render_view(attrs.means3d, attrs.quats, attrs.scales, attrs.opacities,
                     attrs.sh, static.sh_degree, gs_n, cam, jnp.ones(3), cfg_xla)
    o2 = render_view(attrs.means3d, attrs.quats, attrs.scales, attrs.opacities,
                     attrs.sh, static.sh_degree, gs_n, cam, jnp.ones(3), cfg_pl)
    np.testing.assert_allclose(np.asarray(o2["comp_rgb"]), np.asarray(o1["comp_rgb"]), atol=3e-3)
    np.testing.assert_allclose(np.asarray(o2["comp_mask"]), np.asarray(o1["comp_mask"]), atol=3e-3)
    np.testing.assert_allclose(np.asarray(o2["comp_normal"]), np.asarray(o1["comp_normal"]), atol=5e-3)


def test_resident_forward_matches_xla():
    scene = make_scene()
    t = float(np.tan(FOV / 2))
    base = dict(width=64, height=64, tan_fovx=t, tan_fovy=t, tile_capacity=256, chunk=32)
    cfg_xla = RasterizerConfig(**base, backend="xla")
    cfg_res = RasterizerConfig(**base, backend="pallas_resident", interpret=True)
    bg = jnp.asarray([0.3, 0.2, 0.1])
    out_x = render(cfg_xla, *scene, bg)
    out_r = render(cfg_res, *scene, bg)
    np.testing.assert_allclose(np.asarray(out_r.rgb), np.asarray(out_x.rgb), atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_r.alpha), np.asarray(out_x.alpha), atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_r.depth), np.asarray(out_x.depth), atol=6e-3)


@pytest.mark.quick
def test_resident_gradients_match_xla():
    scene = make_scene(N=60, seed=1)
    p, quats, scales, colors, opac, cam = scene
    t = float(np.tan(FOV / 2))
    base = dict(width=32, height=32, tan_fovx=t, tan_fovy=t, tile_capacity=256, chunk=32)
    cfg_xla = RasterizerConfig(**base, backend="xla")
    cfg_res = RasterizerConfig(**base, backend="pallas_resident", interpret=True)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    target = jnp.zeros((32, 32, 3))

    def loss(cfg, params):
        out = rasterize(
            params["p"], jax.nn.sigmoid(params["ol"]), cam, cfg, bg,
            colors=jax.nn.sigmoid(params["c"]), scales=jnp.exp(params["ls"]),
            quats=params["q"],
        )
        return ((out.rgb - target) ** 2).mean() + 0.1 * out.depth.mean() + 0.05 * out.alpha.mean()

    params = {
        "p": p, "q": quats, "ls": jnp.log(scales),
        "c": jnp.log(colors / (1 - colors + 1e-6)), "ol": jnp.full((60,), 0.5),
    }
    gx = jax.grad(lambda pr: loss(cfg_xla, pr))(params)
    gr = jax.grad(lambda pr: loss(cfg_res, pr))(params)
    for k in params:
        a, b = np.asarray(gx[k]), np.asarray(gr[k])
        assert np.isfinite(b).all(), k
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=3e-3, err_msg=k)


@pytest.mark.quick
def test_resident_bwd_accum_matches_reduction():
    """The in-kernel per-gaussian accumulator backward must produce the same
    gradients as the sort+gather reduction (both interpret-mode)."""
    scene = make_scene(N=60, seed=3)
    p, quats, scales, colors, opac, cam = scene
    t = float(np.tan(FOV / 2))
    base = dict(width=32, height=32, tan_fovx=t, tan_fovy=t, tile_capacity=256,
                chunk=32, backend="pallas_resident", interpret=True)
    cfg_a = RasterizerConfig(**base, bwd_accum=True)
    cfg_b = RasterizerConfig(**base, bwd_accum=False)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    target = jnp.full((32, 32, 3), 0.25)

    def loss(cfg, params):
        out = rasterize(
            params["p"], jax.nn.sigmoid(params["ol"]), cam, cfg, bg,
            colors=jax.nn.sigmoid(params["c"]), scales=jnp.exp(params["ls"]),
            quats=params["q"],
        )
        return ((out.rgb - target) ** 2).mean() + 0.1 * out.depth.mean()

    params = {
        "p": p, "q": quats, "ls": jnp.log(scales),
        "c": jnp.log(colors / (1 - colors + 1e-6)), "ol": jnp.full((60,), 0.5),
    }
    ga = jax.grad(lambda pr: loss(cfg_a, pr))(params)
    gb = jax.grad(lambda pr: loss(cfg_b, pr))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                   atol=1e-5, err_msg=k)


def test_resident_stream_rows_matches_table_reads():
    """stream_rows (forward dumps gathered rows, backward streams them) must
    be numerically IDENTICAL to the table-read backward — same rows, same
    math, only the data path differs."""
    scene = make_scene(N=60, seed=7)
    p, quats, scales, colors, opac, cam = scene
    t = float(np.tan(FOV / 2))
    base = dict(width=32, height=32, tan_fovx=t, tan_fovy=t, tile_capacity=256,
                chunk=32, backend="pallas_resident", interpret=True)
    cfg_s = RasterizerConfig(**base, stream_rows=True)
    cfg_t = RasterizerConfig(**base, stream_rows=False)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    target = jnp.full((32, 32, 3), 0.25)

    def loss(cfg, params):
        out = rasterize(
            params["p"], jax.nn.sigmoid(params["ol"]), cam, cfg, bg,
            colors=jax.nn.sigmoid(params["c"]), scales=jnp.exp(params["ls"]),
            quats=params["q"],
        )
        return ((out.rgb - target) ** 2).mean() + 0.1 * out.depth.mean()

    params = {
        "p": p, "q": quats, "ls": jnp.log(scales),
        "c": jnp.log(colors / (1 - colors + 1e-6)), "ol": jnp.full((60,), 0.5),
    }
    ls, gs = jax.value_and_grad(lambda pr: loss(cfg_s, pr))(params)
    lt, gt = jax.value_and_grad(lambda pr: loss(cfg_t, pr))(params)
    assert float(ls) == float(lt)
    for k in params:
        # identical math modulo the single-divide d_alpha refactor → tiny ulp
        np.testing.assert_allclose(np.asarray(gs[k]), np.asarray(gt[k]),
                                   atol=1e-6, rtol=1e-5, err_msg=k)


@pytest.mark.quick
def test_resident_tile32_matches_tile16():
    """tile_px=32 (quarter the pairs, 1024-px programs) must render and
    differentiate the same as the 16-px tiling up to the T_EPS early-exit
    truncation: binning granularity never changes WHICH contributions are
    composited (the per-pixel 3σ cutoff + 1/255 live mask subsume every pair
    the AABB/exact culls drop), but the saturation early exit
    (``max(trans) > T_EPS`` per tile) truncates the occluded tail at tile
    granularity — contributions bounded by T_EPS=1e-4 per pixel, the same
    approximation the CUDA rasterizer makes per-pixel.  Measured spread is
    ~3e-4 between tilings (~7e-4 vs the no-early-exit XLA backend)."""
    scene = make_scene(N=60, seed=11)
    p, quats, scales, colors, opac, cam = scene
    t = float(np.tan(FOV / 2))
    base = dict(width=64, height=48, tan_fovx=t, tan_fovy=t,
                chunk=32, backend="pallas_resident", interpret=True)
    cfg16 = RasterizerConfig(**base, tile_capacity=256, tile_px=16)
    cfg32 = RasterizerConfig(**base, tile_capacity=512, tile_px=32)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    target = jnp.full((48, 64, 3), 0.25)

    def loss(cfg, params):
        out = rasterize(
            params["p"], jax.nn.sigmoid(params["ol"]), cam, cfg, bg,
            colors=jax.nn.sigmoid(params["c"]), scales=jnp.exp(params["ls"]),
            quats=params["q"],
        )
        return ((out.rgb - target) ** 2).mean() + 0.1 * out.depth.mean(), out

    params = {
        "p": p, "q": quats, "ls": jnp.log(scales),
        "c": jnp.log(colors / (1 - colors + 1e-6)), "ol": jnp.full((60,), 0.5),
    }
    (l16, out16), g16 = jax.value_and_grad(
        lambda pr: loss(cfg16, pr), has_aux=True)(params)
    (l32, out32), g32 = jax.value_and_grad(
        lambda pr: loss(cfg32, pr), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(out32.rgb), np.asarray(out16.rgb),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out32.alpha), np.asarray(out16.alpha),
                               atol=1e-3)
    np.testing.assert_allclose(float(l32), float(l16), rtol=1e-4)
    for k in params:
        np.testing.assert_allclose(np.asarray(g32[k]), np.asarray(g16[k]),
                                   atol=2e-3, rtol=5e-3, err_msg=k)


def test_resident_bf16_matmuls_close_to_f32():
    """bf16_matmuls (bf16-input color/cotangent matmuls, f32 accumulation)
    must track the exact-f32 kernel within bf16 rounding: forward within
    ~1e-2 absolute on [0,1] colors, gradients within ~2% of the grad scale."""
    scene = make_scene(N=80, seed=5)
    p, quats, scales, colors, opac, cam = scene
    t = float(np.tan(FOV / 2))
    base = dict(width=32, height=32, tan_fovx=t, tan_fovy=t, tile_capacity=256,
                chunk=32, backend="pallas_resident", interpret=True)
    cfg_f32 = RasterizerConfig(**base, bf16_matmuls=False)
    cfg_bf16 = RasterizerConfig(**base, bf16_matmuls=True)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    out_a = render(cfg_f32, *scene, bg)
    out_b = render(cfg_bf16, *scene, bg)
    np.testing.assert_allclose(np.asarray(out_b.rgb), np.asarray(out_a.rgb), atol=1.5e-2)

    target = jnp.full((32, 32, 3), 0.25)

    def loss(cfg, params):
        out = rasterize(
            params["p"], jax.nn.sigmoid(params["ol"]), cam, cfg, bg,
            colors=jax.nn.sigmoid(params["c"]), scales=jnp.exp(params["ls"]),
            quats=params["q"],
        )
        return ((out.rgb - target) ** 2).mean()

    params = {
        "p": p, "q": quats, "ls": jnp.log(scales),
        "c": jnp.log(colors / (1 - colors + 1e-6)), "ol": jnp.full((80,), 0.5),
    }
    ga = jax.grad(lambda pr: loss(cfg_f32, pr))(params)
    gb = jax.grad(lambda pr: loss(cfg_bf16, pr))(params)
    for k in params:
        a, b = np.asarray(ga[k]), np.asarray(gb[k])
        assert np.isfinite(b).all(), k
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=2e-2, err_msg=k)


def test_resident_rank_binning_matches_pairs():
    """binning="rank" (single-operand depth-rank sort + depth-ordered table)
    must reproduce the "pairs" path exactly: same forward, same gradients."""
    scene = make_scene(N=70, seed=7)
    p, quats, scales, colors, opac, cam = scene
    t = float(np.tan(FOV / 2))
    base = dict(width=32, height=32, tan_fovx=t, tan_fovy=t, tile_capacity=256,
                chunk=32, backend="pallas_resident", interpret=True)
    cfg_pairs = RasterizerConfig(**base, binning="pairs")
    cfg_rank = RasterizerConfig(**base, binning="rank")
    bg = jnp.asarray([0.1, 0.1, 0.1])
    out_a = render(cfg_pairs, *scene, bg)
    out_b = render(cfg_rank, *scene, bg)
    np.testing.assert_allclose(np.asarray(out_b.rgb), np.asarray(out_a.rgb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b.alpha), np.asarray(out_a.alpha), atol=1e-5)

    target = jnp.full((32, 32, 3), 0.3)

    def loss(cfg, params):
        out = rasterize(
            params["p"], jax.nn.sigmoid(params["ol"]), cam, cfg, bg,
            colors=jax.nn.sigmoid(params["c"]), scales=jnp.exp(params["ls"]),
            quats=params["q"],
        )
        return ((out.rgb - target) ** 2).mean() + 0.1 * out.depth.mean()

    params = {
        "p": p, "q": quats, "ls": jnp.log(scales),
        "c": jnp.log(colors / (1 - colors + 1e-6)), "ol": jnp.full((70,), 0.5),
    }
    ga = jax.grad(lambda pr: loss(cfg_pairs, pr))(params)
    gb = jax.grad(lambda pr: loss(cfg_rank, pr))(params)
    for k in params:
        a, b = np.asarray(ga[k]), np.asarray(gb[k])
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=1e-4, err_msg=k)
