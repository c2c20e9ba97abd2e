"""Prompt processors.

Zero123 is image-conditioned — the reference runs a ``dummy-prompt-processor``
(threestudio/models/prompt_processors, wired in sugar_static_refine.yaml:79-82).
The real text-prompt processors (CLIP text encoder, per-(model,prompt) disk
cache, optional subprocess compute — reference base.py:345-420) live in
``models/guidance/stable_diffusion.py`` (StableDiffusionPromptProcessor,
registered as ``stable-diffusion-prompt-processor``); this module only hosts
the dummy processor used by the image-conditioned stages.
"""

from __future__ import annotations

from dataclasses import dataclass

import dreammesh4d_tpu as ds


@dataclass
class PromptProcessorOutput:
    text_embeddings: object = None
    prompt: str = ""


@ds.register("dummy-prompt-processor")
@dataclass
class DummyPromptProcessor:
    pretrained_model_name_or_path: str = ""
    prompt: str = ""

    def __call__(self) -> PromptProcessorOutput:
        return PromptProcessorOutput(prompt=self.prompt)
