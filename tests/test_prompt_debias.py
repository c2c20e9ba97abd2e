"""Prompt debiasing parity (VERDICT r4 #8).

Reference: threestudio/models/prompt_processors/base.py:448-506 — BERT
masked-LM scores the view distribution of a probe sentence with and without
each prompt word; a view whose PMI ``full / lerp(part, full, 0.5)`` falls
below 0.95 drops that word from its view prompt.  The tests drive the repo's
``get_debiased_prompt`` with injected synthetic scorers so the removal logic
is checked exactly (no BERT weights exist in the zero-egress image; the
offline hash fallback is exercised separately for determinism).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from dreammesh4d_tpu.models.guidance.stable_diffusion import (
    PromptProcessorConfig,
    StableDiffusionPromptProcessor,
)


def make_proc(**kw):
    return StableDiffusionPromptProcessor(
        PromptProcessorConfig(use_prompt_debiasing=True, **kw))


def test_neutral_scorer_removes_nothing():
    proc = make_proc()
    uniform = lambda prompt: np.full(4, 0.25)
    out = proc.get_debiased_prompt("a red fox", modulate=uniform)
    assert out == ["a red fox"] * 4


def test_biasing_word_removed_from_affected_view_only():
    """Removing 'front-facing' flattens view 1's probability -> PMI for the
    FULL prompt on view 1 exceeds 1, while the other direction (word ABSENT
    raises a view's prob) pulls PMI below 0.95 and triggers removal."""
    prompt = "a front-facing statue"
    words = prompt.split(" ")

    def modulate(p):
        # without 'front-facing', the 'back' view (index 2) becomes much more
        # likely: pmi_back = full/mean(part, full) < 0.95 -> drop word for back
        probs = np.full(4, 0.25)
        if "front-facing" not in p:
            probs = np.array([0.15, 0.15, 0.55, 0.15])
        return probs / probs.sum()

    out = make_proc().get_debiased_prompt(prompt, modulate=modulate)
    side, front, back, overhead = out
    assert back == "a statue"  # word dropped for the biased view
    assert side == prompt and front == prompt and overhead == prompt
    assert words[1] == "front-facing"


def test_mask_ids_restrict_candidates():
    """prompt_debiasing_mask_ids limits which words may be removed
    (reference base.py:481-487)."""
    prompt = "shiny blue car"

    def always_drop(p):
        # part-probes always look 'very different' -> every candidate word
        # would be removed from every view if allowed
        return (np.full(4, 0.25) if p == prompt
                else np.array([0.7, 0.1, 0.1, 0.1]))

    out_all = make_proc().get_debiased_prompt(prompt, modulate=always_drop)
    # view 0 PMI = .25/mean(.7,.25) ~ 0.53 < .95 -> dropped for view 0 (side)
    assert out_all[0] == ""
    # views 1-3 PMI = .25/mean(.1,.25) ~ 1.43 -> kept
    assert out_all[1] == prompt

    out_restricted = make_proc(
        prompt_debiasing_mask_ids=(1,)).get_debiased_prompt(
            prompt, modulate=always_drop)
    assert out_restricted[0] == "shiny car"  # only word 1 removable


def test_offline_fallback_is_deterministic_and_wired():
    """Without a local BERT dir the hash-probe fallback drives the same
    machinery; __call__ builds per-view embeddings from debiased prompts."""
    proc = make_proc()
    a = proc.get_debiased_prompt("a cat wearing a hat")
    b = proc.get_debiased_prompt("a cat wearing a hat")
    assert a == b and len(a) == 4

    emb = proc()
    assert emb.cond.shape[0] == 5  # [base, front, side, back, overhead]

    # debiasing changes which texts get embedded iff a word was dropped
    plain = StableDiffusionPromptProcessor(
        PromptProcessorConfig(use_prompt_debiasing=False,
                              prompt="a cat wearing a hat"))()
    assert plain.cond.shape == emb.cond.shape
