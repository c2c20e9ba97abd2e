"""Prompt processors.

Zero123 is image-conditioned — the reference runs a ``dummy-prompt-processor``
(threestudio/models/prompt_processors, wired in sugar_static_refine.yaml:79-82).
Text-prompt processors (stable-diffusion / deep-floyd) are part of the
framework surface and will attach to the flax text encoders when those land.
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
