"""Gradio web UI: config-driven launcher with run lifecycle + live progress.

Parity with the reference gradio_app.py (launch form building dotlist
overrides from the YAML, run/stop lifecycle with a PID-tracked subprocess,
progress polled from the trial dir, latest validation image / test video /
export preview, and a `watch` subcommand that kills orphaned runs when the
UI stops polling — reference gradio_app.py:54-121,183-257,460-510).

The poller (`ExperimentRun.status`) is a plain-python class, unit-tested
without gradio (tests/test_gradio_status.py); the UI layer is gated on
gradio being importable (not baked into the TPU image).

Usage:
    python gradio_app.py launch [--port 7860] [--listen]
    python gradio_app.py watch --pid P --trial-dir D [--alive-timeout 30]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import signal
import subprocess
import sys
import time
from dataclasses import dataclass, field
from datetime import datetime
from typing import Optional

REPO = os.path.dirname(os.path.abspath(__file__))

# stage configs offered in the form: (label, path, needs_image, needs_video)
STAGE_CONFIGS = [
    ("Stage 1: static NeRF (stable-zero123)", "configs/stable-zero123.yaml", True, False),
    ("Stage 2: SuGaR static refine", "configs/sugar_static_refine.yaml", True, False),
    ("Stage 3: dynamic 4D (deformation graph)", "configs/sugar_dynamic_dg.yaml", False, True),
    ("Zoo: DreamFusion (SD)", "configs/zoo/dreamfusion-sd.yaml", False, False),
    ("Zoo: ProlificDreamer (VSD)", "configs/zoo/prolificdreamer.yaml", False, False),
]


@dataclass
class ExperimentStatus:
    """One poll snapshot (reference ExperimentStatus, gradio_app.py:54-71)."""

    pid: Optional[int] = None
    step: int = 0
    max_steps: int = 0
    latest_loss: float = float("nan")
    progress_text: str = "Setting up everything ..."
    log_tail: str = ""
    output_image: Optional[str] = None
    output_video: Optional[str] = None
    output_mesh: Optional[str] = None
    preview_images: list = field(default_factory=list)

    @property
    def fraction(self) -> float:
        return self.step / self.max_steps if self.max_steps else 0.0


def _latest_by_it(paths, pattern):
    """Pick the path with the highest it<NUM> prefix (reference
    get_current_status, gradio_app.py:145-176)."""
    best, best_it = None, -1
    for p in paths:
        m = re.match(pattern, os.path.basename(p))
        if m and int(m.group(1)) > best_it:
            best, best_it = p, int(m.group(1))
    return best


class ExperimentRun:
    """Lifecycle of one training run: launch -> poll -> stop/resume.

    Plain python (no gradio import) so the whole lifecycle is unit-testable;
    the UI is a thin layer over this class."""

    def __init__(self, config: str, overrides: list[str], exp_root: str = "outputs-gradio",
                 tag: Optional[str] = None, python: str = sys.executable):
        self.config = config
        self.overrides = list(overrides)
        self.exp_root = exp_root
        self.tag = tag or datetime.now().strftime("%Y%m%d-%H%M%S")
        self.python = python
        self.proc: Optional[subprocess.Popen] = None
        from dreammesh4d_tpu.config import load_config

        cfg = load_config(os.path.join(REPO, config), cli_args=[
            "tag=dummy", f"exp_root_dir={exp_root}", "use_timestamp=false",
            *[ov for ov in overrides if not ov.startswith(("resume=",))],
        ])
        self.name = str(cfg.name)
        self.trial_dir = os.path.join(exp_root, self.name, self.tag)

    # ---- lifecycle -------------------------------------------------------

    def command(self, resume: bool = False) -> list[str]:
        cmd = [self.python, os.path.join(REPO, "launch.py"),
               "--config", os.path.join(REPO, self.config), "--train",
               f"tag={self.tag}", f"exp_root_dir={self.exp_root}",
               "use_timestamp=false", *self.overrides]
        if resume:
            cmd.append("resume=LAST")
        return cmd

    def launch(self, resume: bool = False, log_to_file: bool = True) -> int:
        if self.proc is not None and self.proc.poll() is None:
            raise RuntimeError(f"run already active (pid {self.proc.pid})")
        os.makedirs(self.trial_dir, exist_ok=True)
        stdout = subprocess.DEVNULL
        if log_to_file:
            stdout = open(os.path.join(self.trial_dir, "logs"), "ab")
        self.proc = subprocess.Popen(self.command(resume=resume),
                                     stdout=stdout, stderr=subprocess.STDOUT)
        return self.proc.pid

    def stop(self, timeout: float = 10.0) -> bool:
        """SIGTERM (orbax finishes in-flight saves), escalate to SIGKILL."""
        if self.proc is None or self.proc.poll() is not None:
            return False
        self.proc.terminate()
        try:
            self.proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            self.proc.kill()
            self.proc.wait()
        return True

    def resume(self) -> int:
        """Relaunch from the trial's LAST checkpoint (launch.py resume=LAST)."""
        return self.launch(resume=True)

    @property
    def running(self) -> bool:
        return self.proc is not None and self.proc.poll() is None

    # ---- polling ---------------------------------------------------------

    def status(self) -> ExperimentStatus:
        """Poll the trial dir. Tolerates files that do not exist YET and a
        metrics row that is mid-write (incomplete final line); any other
        malformed content raises — a corrupt trial must not look healthy."""
        st = ExperimentStatus(pid=self.proc.pid if self.proc else None)

        progress = os.path.join(self.trial_dir, "progress")
        if os.path.exists(progress):
            st.progress_text = open(progress).read().strip()
            m = re.match(r"(\d+)/(\d+)", st.progress_text)
            if m:
                st.step, st.max_steps = int(m.group(1)), int(m.group(2))

        metrics = os.path.join(self.trial_dir, "metrics.csv")
        if os.path.exists(metrics):
            lines = open(metrics).read().strip().splitlines()
            if len(lines) > 1:
                header = lines[0].split(",")
                for raw in reversed(lines[1:]):
                    cells = raw.split(",")
                    if len(cells) == len(header):  # skip a mid-write tail row
                        row = dict(zip(header, cells))
                        st.step = max(st.step, int(float(row["step"])))
                        if "loss_total" in row:
                            st.latest_loss = float(row["loss_total"])
                        break

        logs = os.path.join(self.trial_dir, "logs")
        if os.path.exists(logs):
            with open(logs, "rb") as f:
                f.seek(max(0, os.path.getsize(logs) - 4096))
                st.log_tail = "\n".join(
                    f.read().decode("utf-8", "replace").splitlines()[-10:])

        save = os.path.join(self.trial_dir, "save")
        if os.path.isdir(save):
            pngs = glob.glob(os.path.join(save, "*.png"))
            st.output_image = _latest_by_it(pngs, r"it(\d+)-\d+\.png")
            st.preview_images = sorted(pngs, key=os.path.getmtime)[-4:]
            st.output_video = _latest_by_it(
                glob.glob(os.path.join(save, "*.mp4")), r"it(\d+)-test\.mp4")
            objs = (glob.glob(os.path.join(save, "*export*", "*.obj"))
                    + glob.glob(os.path.join(save, "4d_export", "*.obj")))
            if objs:
                st.output_mesh = sorted(objs)[-1]
        return st

    def touch_alive(self) -> None:
        """UI heartbeat for the watcher (reference alive-file protocol,
        gradio_app.py:118-126: the POLLER writes it; `watch` kills the run
        when it goes stale — i.e. the browser tab went away)."""
        with open(os.path.join(self.trial_dir, "alive"), "w") as f:
            f.write(str(time.time()))


def watch(pid: int, trial_dir: str, alive_timeout: int = 30,
          wait_timeout: int = 60, check_interval: int = 1) -> None:
    """Kill `pid` when the UI stops heartbeating (reference watch,
    gradio_app.py:460-510; /proc instead of psutil)."""
    alive_path = os.path.join(trial_dir, "alive")
    deadline = time.time() + wait_timeout
    while not os.path.exists(alive_path):
        if time.time() > deadline:
            return
        time.sleep(check_interval)
    while True:
        if not os.path.exists(f"/proc/{pid}"):
            return
        try:
            stamp = float(open(alive_path).read())
        except ValueError:
            time.sleep(check_interval)
            continue
        if time.time() - stamp > alive_timeout:
            try:
                os.kill(pid, signal.SIGTERM)
                time.sleep(5)
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            return
        time.sleep(check_interval)


# --------------------------------------------------------------------------
# UI layer (requires gradio)
# --------------------------------------------------------------------------


def build_ui():
    import gradio as gr

    state: dict = {"run": None}
    by_label = {label: (path, img, vid) for label, path, img, vid in STAGE_CONFIGS}

    def show_yaml(label):
        path, _, _ = by_label[label]
        return open(os.path.join(REPO, path)).read()

    def start(label, image_path, video_dir, prompt, seed, max_steps, extra):
        path, needs_img, needs_vid = by_label[label]
        overrides = [f"seed={int(seed)}", f"trainer.max_steps={int(max_steps)}"]
        if needs_img and image_path:
            overrides.append(f"data.image_path={image_path}")
        if needs_vid and video_dir:
            overrides.append(f"data.video_frames_dir={video_dir}")
        if prompt:
            overrides.append(f"system.prompt_processor.prompt={prompt}")
        overrides += [ov for ov in (extra or "").split() if "=" in ov]
        run = ExperimentRun(path, overrides)
        pid = run.launch()
        state["run"] = run
        subprocess.Popen([sys.executable, os.path.abspath(__file__), "watch",
                          "--pid", str(pid), "--trial-dir", run.trial_dir])
        return f"started pid {pid} -> {run.trial_dir}"

    def poll():
        run = state.get("run")
        if run is None:
            return "no active run", 0.0, "", None, []
        run.touch_alive()
        st = run.status()
        running = "running" if run.running else "finished/stopped"
        head = (f"[{running}] step {st.step}/{st.max_steps or '?'} "
                f"loss={st.latest_loss:.4f}")
        return head, st.fraction, st.log_tail, st.output_image, st.preview_images

    def stop():
        run = state.get("run")
        return "stopped" if run is not None and run.stop() else "nothing running"

    def resume():
        run = state.get("run")
        if run is None:
            return "no previous run to resume"
        return f"resumed pid {run.resume()}"

    with gr.Blocks(title="dreammesh4d_tpu") as demo:
        gr.Markdown("# dreammesh4d_tpu — video-to-4D generation")
        stage = gr.Dropdown([s[0] for s in STAGE_CONFIGS], value=STAGE_CONFIGS[0][0],
                            label="stage / recipe")
        yaml_box = gr.Code(show_yaml(STAGE_CONFIGS[0][0]), language="yaml",
                           label="config", interactive=False)
        stage.change(show_yaml, [stage], [yaml_box])
        with gr.Row():
            image = gr.Textbox(label="reference image (rgba png)")
            video = gr.Textbox(label="video frames dir (dynamic stage)")
        with gr.Row():
            prompt = gr.Textbox(label="prompt (zoo systems)")
            seed = gr.Number(value=0, label="seed")
            max_steps = gr.Number(value=600, label="max steps")
        extra = gr.Textbox(label="extra dotlist overrides (space-separated)")
        with gr.Row():
            start_btn = gr.Button("Run", variant="primary")
            stop_btn = gr.Button("Stop", variant="stop")
            resume_btn = gr.Button("Resume LAST")
            poll_btn = gr.Button("Refresh")
        status = gr.Textbox(label="status")
        bar = gr.Slider(0.0, 1.0, value=0.0, label="progress", interactive=False)
        log_box = gr.Textbox(label="log tail", lines=10)
        latest = gr.Image(label="latest validation render")
        gallery = gr.Gallery(label="recent renders")
        start_btn.click(start, [stage, image, video, prompt, seed, max_steps, extra],
                        [status])
        stop_btn.click(stop, [], [status])
        resume_btn.click(resume, [], [status])
        poll_btn.click(poll, [], [status, bar, log_box, latest, gallery])
        timer = gr.Timer(2.0)
        timer.tick(poll, [], [status, bar, log_box, latest, gallery])
    return demo


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("operation", nargs="?", default="launch",
                        choices=["launch", "watch"])
    args, extra = parser.parse_known_args()
    if args.operation == "watch":
        parser.add_argument("--pid", type=int, required=True)
        parser.add_argument("--trial-dir", type=str, required=True)
        parser.add_argument("--alive-timeout", type=int, default=30)
        parser.add_argument("--wait-timeout", type=int, default=60)
        args = parser.parse_args()
        watch(args.pid, args.trial_dir, args.alive_timeout, args.wait_timeout)
        return
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--listen", action="store_true")
    args = parser.parse_args()
    try:
        import gradio  # noqa: F401
    except ImportError:
        print("gradio is not installed in this image; the UI requires it.\n"
              "The CLI pipeline is fully available via launch.py.")
        sys.exit(0)
    build_ui().launch(server_port=args.port,
                      server_name="0.0.0.0" if args.listen else "127.0.0.1")


if __name__ == "__main__":
    main()
