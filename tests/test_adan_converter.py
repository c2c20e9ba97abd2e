import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dreammesh4d_tpu.systems.adan import adan


def test_adan_minimizes_quadratic():
    opt = adan(learning_rate=0.1)
    params = {"x": jnp.asarray([3.0, -2.0])}
    state = opt.init(params)

    def loss(p):
        return ((p["x"] - 1.0) ** 2).sum()

    for _ in range(150):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    # converges to the optimum with an lr-scale oscillation band
    np.testing.assert_allclose(np.asarray(params["x"]), 1.0, atol=0.06)


def _fake_torch_ldm_state_dict():
    """Synthetic torch state dict with the exact key layout of the Zero123
    LDM checkpoint — validates the converter name mapping + transposes
    without the 8GB file."""
    import torch

    sd = {}

    def conv(key, cout, cin, k=3):
        sd[f"{key}.weight"] = torch.randn(cout, cin, k, k)
        sd[f"{key}.bias"] = torch.randn(cout)

    def dense(key, cout, cin):
        sd[f"{key}.weight"] = torch.randn(cout, cin)
        sd[f"{key}.bias"] = torch.randn(cout)

    def norm(key, c):
        sd[f"{key}.weight"] = torch.randn(c)
        sd[f"{key}.bias"] = torch.randn(c)

    mc = 8  # tiny model_channels
    ctx = 16
    pre = "model.diffusion_model"
    dense(f"{pre}.time_embed.0", mc * 4, mc)
    dense(f"{pre}.time_embed.2", mc * 4, mc * 4)
    conv(f"{pre}.input_blocks.0.0", mc, 8)

    def res_block(p, cin, cout):
        norm(f"{p}.in_layers.0", cin)
        conv(f"{p}.in_layers.2", cout, cin)
        dense(f"{p}.emb_layers.1", cout, mc * 4)
        norm(f"{p}.out_layers.0", cout)
        conv(f"{p}.out_layers.3", cout, cout)
        if cin != cout:
            conv(f"{p}.skip_connection", cout, cin, k=1)

    def attn_block(p, c):
        norm(f"{p}.norm", c)
        conv(f"{p}.proj_in", c, c, k=1)
        tb = f"{p}.transformer_blocks.0"
        for ln in ("norm1", "norm2", "norm3"):
            norm(f"{tb}.{ln}", c)
        for a in ("attn1", "attn2"):
            kdim = c if a == "attn1" else ctx
            sd[f"{tb}.{a}.to_q.weight"] = __import__("torch").randn(c, c)
            sd[f"{tb}.{a}.to_k.weight"] = __import__("torch").randn(c, kdim)
            sd[f"{tb}.{a}.to_v.weight"] = __import__("torch").randn(c, kdim)
            dense(f"{tb}.{a}.to_out.0", c, c)
        dense(f"{tb}.ff.net.0.proj", c * 8, c)
        dense(f"{tb}.ff.net.2", c, c * 4)
        conv(f"{p}.proj_out", c, c, k=1)

    # channel_mult (1, 2), num_res_blocks 1, attn at ds 1 and 2
    ch = mc
    idx = 1
    # level 0
    res_block(f"{pre}.input_blocks.{idx}.0", ch, mc)
    attn_block(f"{pre}.input_blocks.{idx}.1", mc)
    idx += 1
    conv(f"{pre}.input_blocks.{idx}.0.op", mc, mc)  # downsample
    idx += 1
    # level 1
    res_block(f"{pre}.input_blocks.{idx}.0", mc, mc * 2)
    attn_block(f"{pre}.input_blocks.{idx}.1", mc * 2)

    res_block(f"{pre}.middle_block.0", mc * 2, mc * 2)
    attn_block(f"{pre}.middle_block.1", mc * 2)
    res_block(f"{pre}.middle_block.2", mc * 2, mc * 2)

    # output blocks with skip-concat input widths; hs stack after the down
    # path is [conv_in(8), down_0_0(8), ds(8), down_1_0(16)]
    idx = 0
    res_block(f"{pre}.output_blocks.{idx}.0", mc * 2 + mc * 2, mc * 2)  # 16+16
    attn_block(f"{pre}.output_blocks.{idx}.1", mc * 2)
    idx += 1
    res_block(f"{pre}.output_blocks.{idx}.0", mc * 2 + mc, mc * 2)  # 16+8 (ds skip)
    attn_block(f"{pre}.output_blocks.{idx}.1", mc * 2)
    conv(f"{pre}.output_blocks.{idx}.2.conv", mc * 2, mc * 2)
    idx += 1
    res_block(f"{pre}.output_blocks.{idx}.0", mc * 2 + mc, mc)  # 16+8
    attn_block(f"{pre}.output_blocks.{idx}.1", mc)
    idx += 1
    res_block(f"{pre}.output_blocks.{idx}.0", mc + mc, mc)  # 8+8
    attn_block(f"{pre}.output_blocks.{idx}.1", mc)

    norm(f"{pre}.out.0", mc)
    conv(f"{pre}.out.2", 4, mc)

    dense("cc_projection", ctx + 4, ctx)
    sd["cc_projection.weight"] = __import__("torch").randn(ctx, ctx + 4)
    sd["cc_projection.bias"] = __import__("torch").randn(ctx)
    return sd


def test_unet_converter_mapping():
    torch = pytest.importorskip("torch")
    from dreammesh4d_tpu.models.guidance.zero123.convert import convert_unet

    sd = _fake_torch_ldm_state_dict()
    unet_sd = {k[len("model.diffusion_model."):]: v.numpy()
               for k, v in sd.items() if k.startswith("model.diffusion_model.")}
    params = convert_unet(unet_sd, channel_mult=(1, 2), num_res_blocks=1,
                          attention_resolutions=(1, 2))
    # spot-check shapes/transposes
    assert params["conv_in"]["kernel"].shape == (3, 3, 8, 8)  # HWIO
    assert params["time_embed_0"]["kernel"].shape == (8, 32)  # (in, out)
    assert params["down_0_0_attn"]["block_0"]["attn2"]["to_k"]["kernel"].shape == (16, 8)
    assert "skip" in params["up_1_0_res"]  # channel-change resblock
    assert params["up_1_us"]["conv"]["kernel"].shape == (3, 3, 16, 16)
    # structural compatibility with the flax UNet: apply with these params
    from dreammesh4d_tpu.models.guidance.zero123.unet import UNetModel

    unet = UNetModel(in_channels=8, out_channels=4, model_channels=8,
                     channel_mult=(1, 2), num_res_blocks=1, num_heads=4,
                     attention_resolutions=(1, 2))
    x = jnp.zeros((1, 8, 8, 8))
    t = jnp.zeros((1,))
    ctx_in = jnp.zeros((1, 1, 16))
    out = unet.apply({"params": params}, x, t, ctx_in)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
