"""Cell-packed hash encoding: XLA twin vs Pallas kernel parity (VERDICT r5:
the stage-1 NeRF gather bottleneck).

The cell layout (ops/hashgrid.py cell section) stores all 8 corner feature
vectors of a cell in one 16-float row; ops/hashgrid_pallas.py is the
VMEM-resident TPU kernel.  These tests pin:
- XLA cell encode == Pallas kernel (interpret mode) for feats AND dfeats,
- the kernel's custom-VJP table gradients == jax.grad through the XLA twin,
- dfeats == autodiff d feats/dx of the XLA twin (the analytic-normal path),
- level_mask and dense-vs-hashed level indexing behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode_cell,
    init_hashgrid_cell,
)
from dreammesh4d_tpu.ops.hashgrid_pallas import encode_cell_with_grad

pytestmark = pytest.mark.quick

CFG = HashGridConfig(n_levels=4, n_features_per_level=2, log2_hashmap_size=8,
                     base_resolution=4, per_level_scale=2.0, layout="cell")


@pytest.fixture(scope="module")
def setup():
    params = init_hashgrid_cell(CFG, jax.random.PRNGKey(0))
    # scale features up so numeric comparisons are meaningful
    params = {"tables": params["tables"] * 1e3}
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3), minval=0.01,
                           maxval=0.99)
    return params, x


def test_xla_twin_matches_pallas_interpret(setup):
    params, x = setup
    feats_x, dfeats_x = hashgrid_encode_cell(params, CFG, x, with_grad=True)
    feats_p, dfeats_p = encode_cell_with_grad(params, CFG, x, interpret=True)
    np.testing.assert_allclose(np.asarray(feats_p), np.asarray(feats_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfeats_p), np.asarray(dfeats_x),
                               rtol=1e-5, atol=1e-4)


def test_dfeats_matches_autodiff(setup):
    """dfeats must equal d feats / d x of the XLA twin (autodiff ground
    truth) — this is the contract the analytic-normal path relies on."""
    params, x = setup
    _, dfeats = hashgrid_encode_cell(params, CFG, x, with_grad=True)

    def f(pt):
        return hashgrid_encode_cell(params, CFG, pt[None])[0]

    J = jax.vmap(jax.jacfwd(f))(x)  # (N, LF, 3)
    np.testing.assert_allclose(np.asarray(dfeats), np.asarray(J),
                               rtol=1e-4, atol=1e-3)


def test_pallas_table_grads_match_xla(setup):
    params, x = setup
    cot_f = jax.random.normal(jax.random.PRNGKey(2), (300, CFG.out_dim))
    cot_d = jax.random.normal(jax.random.PRNGKey(3), (300, CFG.out_dim, 3))

    def loss_xla(tables):
        f, d = hashgrid_encode_cell({"tables": tables}, CFG, x, with_grad=True)
        return (f * cot_f).sum() + (d * cot_d).sum()

    def loss_pallas(tables):
        f, d = encode_cell_with_grad({"tables": tables}, CFG, x,
                                     interpret=True)
        return (f * cot_f).sum() + (d * cot_d).sum()

    g_x = jax.grad(loss_xla)(params["tables"])
    g_p = jax.grad(loss_pallas)(params["tables"])
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-4, atol=1e-2)


def test_level_mask(setup):
    params, x = setup
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    f_m, d_m = encode_cell_with_grad(params, CFG, x, level_mask=mask,
                                     interpret=True)
    assert np.abs(np.asarray(f_m[:, 4:])).max() == 0.0
    assert np.abs(np.asarray(d_m[:, 4:, :])).max() == 0.0
    f_x = hashgrid_encode_cell(params, CFG, x, level_mask=mask)
    np.testing.assert_allclose(np.asarray(f_m), np.asarray(f_x), rtol=1e-5,
                               atol=1e-5)


def test_duplicate_cell_gradient_accumulation():
    """Many points in the SAME cell must accumulate gradients (the serial
    in-kernel RMW is exactly for this; a phase-split would lose adds)."""
    params = {"tables": init_hashgrid_cell(CFG, jax.random.PRNGKey(0))["tables"]}
    x = jnp.tile(jnp.asarray([[0.31, 0.52, 0.73]]), (257, 1))  # one cell

    def loss(tables):
        f, _ = encode_cell_with_grad({"tables": tables}, CFG, x,
                                     interpret=True)
        return f.sum()

    g = jax.grad(loss)(params["tables"])

    def loss_xla(tables):
        return hashgrid_encode_cell({"tables": tables}, CFG, x).sum()

    g_x = jax.grad(loss_xla)(params["tables"])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_x), rtol=1e-4,
                               atol=1e-4)
    # sanity: the magnitude reflects 257 accumulated contributions
    assert float(jnp.abs(g).max()) > 100.0 * float(
        jnp.abs(jax.grad(lambda t: hashgrid_encode_cell(
            {"tables": t}, CFG, x[:1]).sum())(params["tables"])).max()) * 0.9


def test_dense_levels_use_dense_indexing():
    """Coarse levels with res^3 <= T index densely (no collisions): two
    points in different cells of a dense level must touch different rows."""
    cfg = HashGridConfig(n_levels=1, n_features_per_level=2,
                         log2_hashmap_size=9, base_resolution=4, layout="cell")
    params = init_hashgrid_cell(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]])

    def loss(tables):
        return hashgrid_encode_cell({"tables": tables}, cfg, x).sum()

    g = jax.grad(loss)(params["tables"])
    touched = np.unique(np.nonzero(np.asarray(g))[1])
    assert len(touched) == 2  # one row per cell, distinct


def test_implicit_volume_cell_normals_match_autodiff():
    """forward_with_normal's fused cell path (feats+dfeats chain rule) must
    equal the autodiff normal of the SAME cell-layout density field."""
    import dataclasses

    from dreammesh4d_tpu.models.geometry.implicit_volume import (
        ImplicitVolumeConfig,
        forward_density,
        forward_with_normal,
        init_implicit_volume,
    )
    from dreammesh4d_tpu.ops.safe_math import safe_normalize

    cfg = ImplicitVolumeConfig(
        radius=1.0, hashgrid=dataclasses.replace(CFG))
    params = init_implicit_volume(cfg, jax.random.PRNGKey(0))
    params["encoding"]["tables"] = params["encoding"]["tables"] * 1e3
    pts = jax.random.uniform(jax.random.PRNGKey(5), (64, 3), minval=-0.9,
                             maxval=0.9)
    density, feats, normal = forward_with_normal(params, cfg, pts)

    g = jax.grad(lambda p: forward_density(params, cfg, p).sum())(pts)
    normal_ref = -safe_normalize(g)
    np.testing.assert_allclose(np.asarray(normal), np.asarray(normal_ref),
                               rtol=1e-4, atol=1e-4)
    d_ref = forward_density(params, cfg, pts)
    np.testing.assert_allclose(np.asarray(density), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)


def test_implicit_volume_cell_trains():
    """One optimization step on the cell layout decreases a toy loss and
    produces finite table gradients through the normal path too."""
    import dataclasses

    import optax

    from dreammesh4d_tpu.models.geometry.implicit_volume import (
        ImplicitVolumeConfig,
        forward_with_normal,
        init_implicit_volume,
    )

    cfg = ImplicitVolumeConfig(radius=1.0, hashgrid=dataclasses.replace(CFG))
    params = init_implicit_volume(cfg, jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(6), (256, 3), minval=-0.9,
                             maxval=0.9)
    target = jnp.ones((256, 1)) * 3.0

    def loss(p):
        d, f, n = forward_with_normal(p, cfg, pts)
        return ((d - target) ** 2).mean() + (n ** 2).mean() * 0.1

    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0 = None
    for _ in range(20):
        l, g = jax.value_and_grad(loss)(params)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        up, state = opt.update(g, state, params)
        params = optax.apply_updates(params, up)
        l0 = l0 or float(l)
    assert float(l) < l0 * 0.9, (l0, float(l))
