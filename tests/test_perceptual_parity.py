"""LPIPS weight onboarding + CLIP-similarity metric (round-3 VERDICT item 4).

The torch oracle is a hand-built VGG16 ``features`` Sequential with the exact
torchvision layer indices (torchvision itself is not installed here) plus the
reference LPIPS forward math
(threestudio/utils/perceptual/perceptual.py:36-115: scaling layer, taps at
relu{1_2,2_2,3_3,4_3,5_3}, unit-normalize, nonneg 1x1 lin heads, spatial
mean, summed) — proving ``load_torch_weights`` maps the layout correctly and
the JAX forward matches torch numerics.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

pytestmark = pytest.mark.quick

# torchvision vgg16().features layout: (layer_index, in_ch, out_ch) convs,
# ReLU after each, MaxPool2d(2) at indices 4, 9, 16, 23, 30
_CONVS = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
          (10, 128, 256), (12, 256, 256), (14, 256, 256),
          (17, 256, 512), (19, 512, 512), (21, 512, 512),
          (24, 512, 512), (26, 512, 512), (28, 512, 512)]
_POOLS = {4, 9, 16, 23, 30}
_TAPS = [3, 8, 15, 22, 29]  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def make_torch_vgg(seed=0):
    """nn.Sequential with torchvision vgg16().features indices/shapes."""
    torch.manual_seed(seed)
    layers = []
    conv_at = {i: (cin, cout) for i, cin, cout in _CONVS}
    for i in range(31):
        if i in conv_at:
            cin, cout = conv_at[i]
            layers.append(torch.nn.Conv2d(cin, cout, 3, padding=1))
        elif i in _POOLS:
            layers.append(torch.nn.MaxPool2d(2))
        else:
            layers.append(torch.nn.ReLU())
    return torch.nn.Sequential(*layers).eval()


def torch_lpips(net, lins, x, y):
    """Reference LPIPS forward (perceptual.py:99-115) on [0,1] NCHW inputs."""
    def feats(img):
        h = ((img * 2 - 1) - _SHIFT) / _SCALE
        out = []
        for i, layer in enumerate(net):
            h = layer(h)
            if i in _TAPS:
                out.append(h)
        return out

    def unit(f):
        return f / torch.sqrt((f * f).sum(1, keepdim=True) + 1e-10)

    total = 0.0
    for lin, a, b in zip(lins, feats(x), feats(y)):
        d = (unit(a) - unit(b)) ** 2
        total = total + (d * lin.view(1, -1, 1, 1).relu()).sum(1).mean((1, 2))
    return total


@pytest.fixture(scope="module")
def converted():
    """(torch net, torch lins, jax params) with nonneg LPIPS lin heads."""
    from dreammesh4d_tpu.utils.perceptual import load_torch_weights

    net = make_torch_vgg()
    torch.manual_seed(1)
    lins = [torch.rand(c) * 0.1 for c in (64, 128, 256, 512, 512)]
    vgg_sd = {k: v.detach() for k, v in net.state_dict().items()}
    lpips_sd = {f"lin{i}.model.1.weight": lin.view(1, -1, 1, 1)
                for i, lin in enumerate(lins)}
    params = load_torch_weights(vgg_sd, lpips_sd)
    return net, lins, params


def test_lpips_conversion_parity(converted):
    """Converted VGG16+lins match the torch oracle at 1e-4."""
    import jax.numpy as jnp

    from dreammesh4d_tpu.utils.perceptual import perceptual_loss

    net, lins, params = converted
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    with torch.no_grad():
        ref = torch_lpips(net, lins,
                          torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(perceptual_loss(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_lpips_full_model_prefix(converted):
    """vgg16().state_dict()-style keys (features. prefix) also convert."""
    from dreammesh4d_tpu.utils.perceptual import load_torch_weights

    net, _, params = converted
    prefixed = {f"features.{k}": v for k, v in net.state_dict().items()}
    prefixed["classifier.0.weight"] = torch.zeros(2, 2)  # ignored
    p2 = load_torch_weights(prefixed)
    np.testing.assert_array_equal(np.asarray(p2["stages"][0][0]["w"]),
                                  np.asarray(params["stages"][0][0]["w"]))


def test_cli_roundtrip(converted, tmp_path):
    """convert_perceptual_ckpt.py cache restores identically, torch-free,
    and feeds LPIPSMetric."""
    net, lins, params = converted
    vgg_path = str(tmp_path / "vgg.pth")
    lpips_path = str(tmp_path / "lpips.pth")
    torch.save(net.state_dict(), vgg_path)
    torch.save({f"lin{i}.model.1.weight": lin.view(1, -1, 1, 1)
                for i, lin in enumerate(lins)}, lpips_path)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from convert_perceptual_ckpt import main

    out = main([vgg_path, "--lpips", lpips_path, "--out", str(tmp_path / "cache")])
    assert os.path.exists(os.path.join(out, "manifest.json"))

    from dreammesh4d_tpu.utils.metrics import LPIPSMetric

    metric = LPIPSMetric(weights_path=out)
    assert metric.converted
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + 0.1, 0, 1)
    with torch.no_grad():
        ref = torch_lpips(net, lins,
                          torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(metric(x, y)), ref, atol=1e-4, rtol=1e-3)
    # identical render -> zero distance; ordering sanity vs a worse render
    assert float(metric(x, x)[0]) < 1e-6
    assert float(metric(x, y)[0]) > float(metric(x, x)[0])


def test_clip_similarity_metric():
    """CLIPSimilarityMetric on a converted tiny tower: sim(x,x)=1, ordering
    holds, and the zero123-cache loader path errors cleanly without a clip
    subtree."""
    import jax.numpy as jnp
    from transformers import CLIPVisionConfig

    from dreammesh4d_tpu.utils.metrics import CLIPSimilarityMetric

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=8, projection_dim=16)
    metric = CLIPSimilarityMetric(config=cfg, seed=0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    s_same = float(metric(x, x)[0])
    s_diff = float(metric(x, y)[0])
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    assert s_diff < s_same


def test_clip_similarity_from_zero123_cache(tmp_path):
    """The cache loader restores a converted clip subtree (tiny tower,
    convert_clip_vision layout) and reproduces the direct-params metric."""
    import jax
    import orbax.checkpoint as ocp
    from transformers import CLIPVisionConfig

    from dreammesh4d_tpu.models.guidance.zero123.clip import CLIPImageEncoder
    from dreammesh4d_tpu.utils.metrics import CLIPSimilarityMetric

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=8, projection_dim=16)
    enc = CLIPImageEncoder(config=cfg, proj_dim=16)
    clip_params = enc.init(jax.random.PRNGKey(7))

    cache = tmp_path / "z123_cache"
    cache.mkdir()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(str(cache / "params")), {"clip": clip_params},
               force=True)
    ckptr.wait_until_finished()
    (cache / "manifest.json").write_text("{}")

    m_cache = CLIPSimilarityMetric(zero123_cache_path=str(cache), config=cfg)
    m_direct = CLIPSimilarityMetric(params=clip_params, config=cfg)
    assert m_cache.converted
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(m_cache(x, y)),
                               np.asarray(m_direct(x, y)), atol=1e-6)

    # missing clip subtree -> clean KeyError
    bad = tmp_path / "no_clip"
    bad.mkdir()
    ckptr.save(os.path.abspath(str(bad / "params")), {"unet": {"w": np.zeros(2)}},
               force=True)
    ckptr.wait_until_finished()
    with pytest.raises(KeyError, match="clip"):
        CLIPSimilarityMetric(zero123_cache_path=str(bad), config=cfg)
