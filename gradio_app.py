"""Gradio web UI: shells out to launch.py and tails progress.

Parity with the reference gradio_app.py:183-257,460-510 — a thin subprocess
wrapper: the UI launches ``python launch.py --train --gradio`` runs, polls the
trial dir for status/metrics, and previews validation renders.  Gated on
gradio being importable (it is not baked into the TPU image; the module then
prints instructions instead of crashing).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ExperimentStatus:
    """Polled run state (reference ExperimentStatus, gradio_app.py:54-101)."""

    pid: Optional[int] = None
    trial_dir: str = ""
    step: int = 0
    max_steps: int = 0
    latest_loss: float = float("nan")
    preview_images: list = field(default_factory=list)

    def poll(self) -> "ExperimentStatus":
        metrics = os.path.join(self.trial_dir, "metrics.csv")
        if os.path.exists(metrics):
            try:
                with open(metrics) as f:
                    lines = f.read().strip().splitlines()
                if len(lines) > 1:
                    header = lines[0].split(",")
                    last = lines[-1].split(",")
                    row = dict(zip(header, last))
                    self.step = int(float(row.get("step", 0)))
                    self.latest_loss = float(row.get("loss_total", "nan"))
            except Exception:  # noqa: BLE001
                pass
        self.preview_images = sorted(
            glob.glob(os.path.join(self.trial_dir, "save", "*.png"))
        )[-4:]
        return self


def run_training(config: str, overrides: list[str], trial_tag: str = "gradio") -> subprocess.Popen:
    cmd = [sys.executable, "launch.py", "--config", config, "--train",
           f"tag={trial_tag}", "use_timestamp=false"] + overrides
    return subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def build_ui():
    import gradio as gr

    state = {"proc": None, "status": None}

    def launch(config, image_path):
        overrides = []
        if image_path:
            overrides.append(f"data.image_path={image_path}")
        state["proc"] = run_training(config, overrides)
        return "training started"

    def watch():
        st = state.get("status")
        if st is None:
            exp_root = "outputs"
            trials = sorted(glob.glob(os.path.join(exp_root, "*", "gradio")))
            if not trials:
                return "no active trial", []
            st = ExperimentStatus(trial_dir=trials[-1])
            state["status"] = st
        st.poll()
        return f"step {st.step}: loss={st.latest_loss:.4f}", st.preview_images

    def stop():
        if state["proc"] is not None:
            state["proc"].terminate()
            return "stopped"
        return "nothing running"

    with gr.Blocks(title="dreammesh4d_tpu") as demo:
        gr.Markdown("# dreammesh4d_tpu — video-to-4D generation")
        config = gr.Dropdown(
            ["configs/stable-zero123.yaml", "configs/sugar_static_refine.yaml",
             "configs/sugar_dynamic_dg.yaml"],
            value="configs/stable-zero123.yaml", label="stage config",
        )
        image = gr.Textbox(label="reference image path (rgba png)")
        with gr.Row():
            start_btn = gr.Button("Train")
            stop_btn = gr.Button("Stop")
            poll_btn = gr.Button("Refresh status")
        status = gr.Textbox(label="status")
        gallery = gr.Gallery(label="validation renders")
        start_btn.click(launch, [config, image], [status])
        stop_btn.click(stop, [], [status])
        poll_btn.click(watch, [], [status, gallery])
    return demo


if __name__ == "__main__":
    try:
        import gradio  # noqa: F401
    except ImportError:
        print("gradio is not installed in this image; the UI requires it.\n"
              "The CLI pipeline is fully available via launch.py.")
        sys.exit(0)
    build_ui().launch()
