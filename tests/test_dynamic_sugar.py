import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.models.geometry.deformation import (
    DeformationConfig,
    forward_dynamic_delta,
    hexplane_features,
    init_deformation,
    plane_tv_loss,
    strain_tensor_to_matrix,
)
from dreammesh4d_tpu.models.geometry.deformation_graph import (
    build_deformation_graph,
    heat_geodesic_distances,
    sample_points_on_mesh,
)
from dreammesh4d_tpu.models.geometry.dynamic_sugar import (
    DynamicSuGaRConfig,
    NodeAttrs,
    build_dynamic_static,
    skin_vertices,
    timed_all,
    timed_node_attrs,
)
from dreammesh4d_tpu.models.geometry.sugar import SuGaRConfig, create_sugar
from dreammesh4d_tpu.ops.quaternion import quat_apply, quat_exp
from dreammesh4d_tpu.utils.procedural import make_icosphere

pytestmark = pytest.mark.quick  # core <5-min CPU tier

CFG_SMALL = DeformationConfig(base_resolution=(16, 16, 16, 8), multires=(1, 2))


def test_deformation_zero_init():
    """Residual zero-init: all deltas are exactly zero at t=0 params."""
    params = init_deformation(CFG_SMALL, jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (5, 7, 3)) * 0.5
    ts = jnp.linspace(-1, 1, 5)[:, None].repeat(7, 1)
    d = forward_dynamic_delta(params, CFG_SMALL, pts, ts)
    np.testing.assert_allclose(np.asarray(d.dx), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d.drot), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d.dstrain), 0.0, atol=1e-7)


def test_hexplane_features_shape_and_time_dependence():
    params = init_deformation(CFG_SMALL, jax.random.PRNGKey(0))
    pts = jnp.asarray([[0.1, -0.2, 0.3]])
    f1 = hexplane_features(params, pts, jnp.asarray([-0.5]), 1.0)
    f2 = hexplane_features(params, pts, jnp.asarray([0.5]), 1.0)
    assert f1.shape == (1, 32 * 2)
    # time planes init to 1 -> features initially time-invariant
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
    # perturb a time plane along its time axis (rows of the (t, x, C) grid
    # for comb (0,3)) -> features become time-dependent
    params["grids"][0][2] = params["grids"][0][2].at[:3, :, :].set(2.0)
    f1b = hexplane_features(params, pts, jnp.asarray([-0.9]), 1.0)
    f2b = hexplane_features(params, pts, jnp.asarray([0.9]), 1.0)
    assert float(jnp.abs(f1b - f2b).max()) > 1e-4


def test_strain_matrix():
    s = jnp.asarray([0.1, 0.2, 0.3, 0.01, 0.02, 0.03])
    m = np.asarray(strain_tensor_to_matrix(s))
    expected = np.eye(3) + np.asarray(
        [[0.1, 0.01, 0.02], [0.01, 0.2, 0.03], [0.02, 0.03, 0.3]]
    )
    np.testing.assert_allclose(m, expected, atol=1e-6)
    np.testing.assert_allclose(m, m.T, atol=1e-7)


def test_plane_tv():
    params = init_deformation(CFG_SMALL, jax.random.PRNGKey(0))
    assert float(plane_tv_loss(params)) > 0  # spatial planes are random


def test_surface_sampling():
    m = make_icosphere(2)
    pts = sample_points_on_mesh(m.v_pos, m.t_pos_idx, 500, seed=0)
    r = np.linalg.norm(pts, axis=-1)
    assert pts.shape == (500, 3)
    assert (r > 0.9).all() and (r <= 1.001).all()  # on the sphere surface


def test_heat_geodesics_sphere():
    """Geodesic distance on the unit sphere ~ arc length (great circle)."""
    m = make_icosphere(3)
    v = np.asarray(m.v_pos, np.float64)
    # source at north pole (closest vertex)
    src = int(np.argmax(v[:, 2]))
    d = heat_geodesic_distances(v, m.t_pos_idx, np.asarray([src]))[0]
    angles = np.arccos(np.clip((v @ v[src]), -1, 1))
    # heat method is approximate; compare up to scale on mid-range points
    sel = (angles > 0.5) & (angles < 2.5)
    ratio = d[sel] / angles[sel]
    assert np.abs(ratio.mean() - 1.0) < 0.1
    assert ratio.std() < 0.1
    # euclidean chord distance would NOT match: at angle pi, chord=2 < arc=pi
    far = angles > 2.8
    if far.any():
        assert d[far].mean() > 2.6  # geodesic, not chord (2.0)


def test_build_graph_weights_normalized():
    m = make_icosphere(2)
    g = build_deformation_graph(m.v_pos, m.t_pos_idx, n_nodes=50, nodes_connectivity=4, mode="geodisc")
    np.testing.assert_allclose(g.neighbor_weights.sum(-1), 1.0, atol=1e-5)
    assert g.neighbor_idx.shape == (len(m.v_pos), 4)
    assert (g.neighbor_idx >= 0).all() and (g.neighbor_idx < 50).all()
    g2 = build_deformation_graph(m.v_pos, m.t_pos_idx, n_nodes=50, nodes_connectivity=4, mode="eucdisc")
    np.testing.assert_allclose(g2.neighbor_weights.sum(-1), 1.0, atol=1e-5)


def _setup_dynamic(skinning="hybrid"):
    mesh = make_icosphere(1, radius=0.8)
    params, sugar_static = create_sugar(SuGaRConfig(n_gaussians_per_surface_triangle=1), mesh)
    cfg = DynamicSuGaRConfig(
        n_dg_nodes=20, dg_node_connectivity=4, skinning_method=skinning,
        deformation=CFG_SMALL, dist_mode="eucdisc",
    )
    static = build_dynamic_static(cfg, sugar_static, np.asarray(params.points))
    dparams = init_deformation(CFG_SMALL, jax.random.PRNGKey(0))
    return params, static, cfg, dparams


@pytest.mark.parametrize("skinning", ["lbs", "dqs", "hybrid"])
def test_identity_deformation_at_init(skinning):
    """Zero-init deformation net -> identity node transforms. DQS/hybrid
    reproduce the rest pose exactly; LBS too (R=I, S=I, t=0 -> x' = x)."""
    params, static, cfg, dparams = _setup_dynamic(skinning)
    ts = jnp.asarray([0.0, 0.5, 1.0])
    gs, vert = timed_all(params, dparams, cfg.deformation, static, ts)
    for t in range(3):
        np.testing.assert_allclose(np.asarray(vert.xyz[t]), np.asarray(params.points), atol=1e-5)
    # gaussian attrs match the static derivation
    from dreammesh4d_tpu.models.geometry.sugar import gaussian_attributes

    attrs0 = gaussian_attributes(params, static.sugar)
    np.testing.assert_allclose(np.asarray(gs.means3d[0]), np.asarray(attrs0.means3d), atol=1e-5)
    dot = np.abs((np.asarray(gs.quats[0]) * np.asarray(attrs0.quats)).sum(-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)
    # hybrid at init: blendw = sigmoid(0) = 0.5, vert_lbs_w = clamp(0.5+0.4)
    # = 0.9 -> strain = 0.5*I + (1-0.9)*I = 0.6*I (same in the reference,
    # dynamic_sugar.py:600-612); lbs/dqs give exactly I.
    factor = 0.6 if skinning == "hybrid" else 1.0
    np.testing.assert_allclose(
        np.asarray(gs.scales[0]), factor * np.asarray(attrs0.scales), atol=1e-5
    )


@pytest.mark.parametrize("skinning", ["lbs", "dqs", "hybrid"])
def test_rigid_node_motion_moves_vertices(skinning):
    """All nodes sharing one rigid transform -> vertices follow it exactly
    (for LBS with node-global transforms and for DQS)."""
    params, static, cfg, dparams = _setup_dynamic(skinning)
    M = static.node_xyz.shape[0]
    q = quat_exp(jnp.asarray([0.0, 0.0, np.pi / 4]))
    t_vec = jnp.asarray([0.2, -0.1, 0.3])
    node = NodeAttrs(
        trans=jnp.broadcast_to(quat_apply(q, static.node_xyz) * 0 + t_vec, (M, 3)) + quat_apply(q, static.node_xyz) * 0,
        rots=jnp.broadcast_to(q, (M, 4)),
        strain=jnp.broadcast_to(jnp.eye(3), (M, 3, 3)),
        blendw=jnp.full((M, 1), 5.0 * 0 + 0.99),
    )
    vert = skin_vertices(static, params.points, node)
    expected = quat_apply(jnp.broadcast_to(q, (params.points.shape[0], 4)), params.points) + t_vec
    np.testing.assert_allclose(np.asarray(vert.xyz), np.asarray(expected), atol=1e-4)
    # fused vertex rotations = q
    dot = np.abs((np.asarray(vert.rots) * np.asarray(q)).sum(-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def _setup_mode(dynamic_mode="deformation", use_deform_graph=True, skinning="hybrid",
                num_frames=4):
    from dreammesh4d_tpu.models.geometry.dynamic_sugar import init_discrete_params

    mesh = make_icosphere(1, radius=0.8)
    params, sugar_static = create_sugar(SuGaRConfig(n_gaussians_per_surface_triangle=1), mesh)
    cfg = DynamicSuGaRConfig(
        num_frames=num_frames, dynamic_mode=dynamic_mode,
        use_deform_graph=use_deform_graph, n_dg_nodes=20, dg_node_connectivity=4,
        skinning_method=skinning, deformation=CFG_SMALL, dist_mode="eucdisc",
    )
    static = build_dynamic_static(cfg, sugar_static, np.asarray(params.points))
    if dynamic_mode == "discrete":
        dparams = init_discrete_params(cfg, len(params.points))
    else:
        dparams = init_deformation(CFG_SMALL, jax.random.PRNGKey(0))
    return params, static, cfg, dparams


@pytest.mark.parametrize("use_graph", [True, False])
def test_discrete_identity_at_init(use_graph):
    """dynamic_mode=discrete: zero tables -> rest pose at every frame
    (reference dynamic_sugar.py:102-139 table init + :413-418 lookup)."""
    params, static, cfg, dparams = _setup_mode("discrete", use_graph)
    fi = jnp.asarray([0, 2, 3], jnp.int32)
    ts = fi.astype(jnp.float32) / (cfg.num_frames - 1)
    gs, vert = timed_all(params, dparams, cfg.deformation, static, ts, frame_indices=fi)
    for t in range(3):
        np.testing.assert_allclose(np.asarray(vert.xyz[t]), np.asarray(params.points), atol=1e-5)
    from dreammesh4d_tpu.models.geometry.sugar import gaussian_attributes

    attrs0 = gaussian_attributes(params, static.sugar)
    np.testing.assert_allclose(np.asarray(gs.means3d[0]), np.asarray(attrs0.means3d), atol=1e-5)
    dot = np.abs((np.asarray(gs.quats[0]) * np.asarray(attrs0.quats)).sum(-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)
    # frame_indices derived from timestamps when absent (nearest frame)
    gs2, vert2 = timed_all(params, dparams, cfg.deformation, static, ts)
    np.testing.assert_allclose(np.asarray(vert2.xyz), np.asarray(vert.xyz), atol=1e-6)


def test_discrete_rigid_motion_per_frame():
    """One frame's node table holds a shared rigid transform -> that frame's
    vertices follow it exactly; other frames stay at rest."""
    params, static, cfg, dparams = _setup_mode("discrete", True, skinning="hybrid")
    q = quat_exp(jnp.asarray([0.0, 0.0, np.pi / 4]))
    t_vec = jnp.asarray([0.2, -0.1, 0.3])
    M = static.node_xyz.shape[0]
    dparams["trans"] = dparams["trans"].at[1].set(t_vec)
    dparams["rots"] = dparams["rots"].at[1].set(jnp.broadcast_to(q, (M, 4)))
    dparams["blendw"] = dparams["blendw"].at[1].set(20.0)  # sigmoid -> ~1 (pure LBS)
    fi = jnp.asarray([0, 1], jnp.int32)
    _, vert = timed_all(params, dparams, cfg.deformation, static,
                        fi.astype(jnp.float32) / (cfg.num_frames - 1), frame_indices=fi)
    np.testing.assert_allclose(np.asarray(vert.xyz[0]), np.asarray(params.points), atol=1e-5)
    expected = quat_apply(jnp.broadcast_to(q, (params.points.shape[0], 4)), params.points) + t_vec
    np.testing.assert_allclose(np.asarray(vert.xyz[1]), np.asarray(expected), atol=1e-4)


def test_no_graph_deformation_identity_and_grads():
    """use_deform_graph=False + HexPlane: direct vertex deformation
    (reference dynamic_sugar.py:617-655) — rest pose at zero-init, gradients
    reach the deformation params."""
    params, static, cfg, dparams = _setup_mode("deformation", False)
    ts = jnp.asarray([0.0, 0.7])
    gs, vert = timed_all(params, dparams, cfg.deformation, static, ts)
    for t in range(2):
        np.testing.assert_allclose(np.asarray(vert.xyz[t]), np.asarray(params.points), atol=1e-5)

    def loss(dp):
        gs, vert = timed_all(params, dp, cfg.deformation, static, ts)
        return (gs.means3d**2).mean() + (vert.xyz**2).mean()

    g = jax.tree.leaves(jax.grad(loss)(dparams))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert sum(float(jnp.abs(x).sum()) for x in g) > 0


def test_discrete_no_graph_translation():
    """discrete + no graph: per-vertex per-frame translation tables move the
    vertices directly (sane reading of dynamic_sugar.py:625-631 — the
    reference feeds the raw zero-init table into the barycentric chain as
    absolute positions, collapsing the mesh; we keep x' = x + t)."""
    params, static, cfg, dparams = _setup_mode("discrete", False)
    t_vec = jnp.asarray([0.05, -0.02, 0.1])
    dparams["trans"] = dparams["trans"].at[2].add(t_vec)
    fi = jnp.asarray([0, 2], jnp.int32)
    _, vert = timed_all(params, dparams, cfg.deformation, static,
                        fi.astype(jnp.float32) / (cfg.num_frames - 1), frame_indices=fi)
    np.testing.assert_allclose(np.asarray(vert.xyz[0]), np.asarray(params.points), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vert.xyz[1]), np.asarray(params.points + t_vec), atol=1e-6
    )
    # gradients reach the tables
    def loss(dp):
        _, v = timed_all(params, dp, cfg.deformation, static,
                         fi.astype(jnp.float32) / (cfg.num_frames - 1), frame_indices=fi)
        return (v.xyz**2).mean()

    g = jax.grad(loss)(dparams)
    assert float(jnp.abs(g["trans"]).sum()) > 0


def test_discrete_true_frame_indices_not_aliased():
    """With the temporal datamodule's timestamp convention (i+1)/(L+1),
    nearest-frame rounding ALIASES neighbouring frames onto one table row —
    explicit frame_indices (threaded by the train step) must hit the true
    per-frame rows instead."""
    from dreammesh4d_tpu.data.temporal_image import frame_timestamps

    params, static, cfg, dparams = _setup_mode("discrete", True, num_frames=8)
    ts_all = jnp.asarray(frame_timestamps(8))
    t_vec = jnp.asarray([0.1, 0.0, 0.0])
    dparams["trans"] = dparams["trans"].at[1].set(t_vec)  # only frame 1 moves
    fi = jnp.arange(8, dtype=jnp.int32)
    _, vert = timed_all(params, dparams, cfg.deformation, static, ts_all,
                        frame_indices=fi)
    moved = np.abs(np.asarray(vert.xyz) - np.asarray(params.points)).max(axis=(1, 2))
    assert moved[1] > 0.05, moved
    assert (moved[[0, 2, 3, 4, 5, 6, 7]] < 1e-5).all(), moved


def test_gradients_flow_through_time_chain():
    params, static, cfg, dparams = _setup_dynamic("hybrid")
    ts = jnp.asarray([0.25, 0.75])

    def loss(dp):
        gs, vert = timed_all(params, dp, cfg.deformation, static, ts)
        return (gs.means3d**2).mean() + (vert.xyz**2).mean() + (gs.scales**2).mean()

    g = jax.grad(loss)(dparams)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    total = sum(float(jnp.abs(x).sum()) for x in flat)
    assert total > 0
