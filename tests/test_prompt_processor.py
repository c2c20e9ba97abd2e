"""SD prompt processor: real CLIP text-encoder path with the reference's
per-(model, prompt) disk cache (prompt_processors/base.py:345-420)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def tiny_clip_dir(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPTextConfig, CLIPTokenizer, FlaxCLIPTextModel

    d = tmp_path_factory.mktemp("tiny_clip")
    vocab = {
        "<|startoftext|>": 0, "<|endoftext|>": 1,
        "a</w>": 2, "photo</w>": 3, "of</w>": 4, "dog</w>": 5,
        "front</w>": 6, "side</w>": 7, "back</w>": 8, "view</w>": 9,
        ",</w>": 10, "overhead</w>": 11, "high</w>": 12, "quality</w>": 13,
    }
    vf = d / "vocab.json"
    mf = d / "merges.txt"
    vf.write_text(json.dumps(vocab))
    mf.write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(vf), str(mf))
    tok.save_pretrained(str(d))

    cfg = CLIPTextConfig(
        vocab_size=len(vocab), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77,
    )
    model = FlaxCLIPTextModel(cfg)
    model.save_pretrained(str(d))
    return str(d)


def test_clip_embeddings_cached_and_reused(tiny_clip_dir, tmp_path):
    from dreammesh4d_tpu.models.guidance.stable_diffusion import (
        PromptProcessorConfig,
        StableDiffusionPromptProcessor,
        hash_prompt,
    )

    cache = str(tmp_path / "cache")
    cfg = PromptProcessorConfig(
        prompt="a photo of dog", negative_prompt="",
        pretrained_model_name_or_path=tiny_clip_dir,
        context_dim=32, cache_dir=cache,
    )
    proc = StableDiffusionPromptProcessor(cfg)
    out = proc()
    assert out.cond.shape == (5, 77, 32)
    assert out.uncond.shape == (77, 32)
    # real encoder output, not the hash fallback: 6 cache files on disk
    files = [f for f in os.listdir(cache) if f.endswith(".npy")]
    assert len(files) == 6, files
    base = np.load(os.path.join(cache, f"{hash_prompt(tiny_clip_dir, cfg.prompt)}.npy"))
    np.testing.assert_allclose(np.asarray(out.cond[0]), base, atol=1e-6)
    # view prompts give DIFFERENT embeddings (real tokenizer tokens)
    assert np.abs(np.asarray(out.cond[1]) - np.asarray(out.cond[0])).max() > 1e-4

    # cache HIT: mutate a cached file; the next call must return the mutation
    mut = base + 1.0
    np.save(os.path.join(cache, f"{hash_prompt(tiny_clip_dir, cfg.prompt)}.npy"), mut)
    out2 = StableDiffusionPromptProcessor(cfg)()
    np.testing.assert_allclose(np.asarray(out2.cond[0]), mut, atol=1e-6)


def test_hash_fallback_without_encoder(tmp_path):
    from dreammesh4d_tpu.models.guidance.stable_diffusion import (
        PromptProcessorConfig,
        StableDiffusionPromptProcessor,
    )

    cfg = PromptProcessorConfig(prompt="x", pretrained_model_name_or_path="",
                                cache_dir=str(tmp_path / "c"))
    out = StableDiffusionPromptProcessor(cfg)()
    assert out.cond.shape == (5, 77, 768)
    assert np.isfinite(np.asarray(out.cond)).all()
