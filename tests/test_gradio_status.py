"""Gradio app lifecycle + poller, tested WITHOUT gradio (round-3 VERDICT
item 10): ExperimentRun launch/stop/resume command building, the status
poller's strict parsing (malformed metrics raise instead of being
swallowed), and the alive-file watcher protocol."""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gradio_app import ExperimentRun, ExperimentStatus, watch  # noqa: E402

pytestmark = pytest.mark.quick

CONFIG = "configs/sugar_static_refine.yaml"


def _run(tmp_path, **kw):
    return ExperimentRun(CONFIG, ["data.image_path=/x/y_rgba.png"],
                         exp_root=str(tmp_path), tag="ui", **kw)


def test_command_building_and_resume_flag(tmp_path):
    run = _run(tmp_path)
    cmd = run.command()
    assert "--train" in cmd and f"tag={run.tag}" in cmd
    assert "data.image_path=/x/y_rgba.png" in cmd
    assert "resume=LAST" not in cmd
    assert "resume=LAST" in run.command(resume=True)
    # trial dir derives from the config's resolved name
    assert run.trial_dir == os.path.join(str(tmp_path), "sugar-refine", "ui")


def test_status_tolerates_missing_and_midwrite_rows(tmp_path):
    run = _run(tmp_path)
    os.makedirs(run.trial_dir)
    st = run.status()  # nothing written yet
    assert st.step == 0 and st.progress_text.startswith("Setting up")

    with open(os.path.join(run.trial_dir, "progress"), "w") as f:
        f.write("120/600 loss=0.0421")
    with open(os.path.join(run.trial_dir, "metrics.csv"), "w") as f:
        f.write("step,loss_total\n100,0.05\n120,0.0421\n130,0.03")  # mid-write ok
    st = run.status()
    assert st.step == 130 and st.max_steps == 600
    assert abs(st.latest_loss - 0.03) < 1e-9
    assert 0.19 < st.fraction < 0.22

    # a mid-write INCOMPLETE trailing row falls back to the previous full row
    with open(os.path.join(run.trial_dir, "metrics.csv"), "a") as f:
        f.write("\n140")
    st = run.status()
    assert st.step == 130


def test_status_raises_on_corrupt_metrics(tmp_path):
    """Corrupt content must raise (the round-3 poller swallowed everything)."""
    run = _run(tmp_path)
    os.makedirs(run.trial_dir)
    with open(os.path.join(run.trial_dir, "metrics.csv"), "w") as f:
        f.write("step,loss_total\nnot_a_number,weird\n")
    with pytest.raises(ValueError):
        run.status()


def test_status_picks_latest_artifacts(tmp_path):
    run = _run(tmp_path)
    save = os.path.join(run.trial_dir, "save")
    os.makedirs(save)
    for it in (10, 200, 30):
        open(os.path.join(save, f"it{it}-0.png"), "w").close()
    open(os.path.join(save, "it50-test.mp4"), "w").close()
    os.makedirs(os.path.join(save, "4d_export"))
    open(os.path.join(save, "4d_export", "frame_000.obj"), "w").close()
    st = run.status()
    assert os.path.basename(st.output_image) == "it200-0.png"
    assert os.path.basename(st.output_video) == "it50-test.mp4"
    assert st.output_mesh.endswith("frame_000.obj")
    assert len(st.preview_images) == 3


def test_launch_stop_lifecycle(tmp_path, monkeypatch):
    """launch() spawns a real subprocess (stubbed with a sleeper), running
    reflects liveness, stop() terminates, resume() appends resume=LAST."""
    run = _run(tmp_path)
    commands = []

    def fake_command(resume=False):
        commands.append(run.__class__.command(run, resume=resume))
        return [sys.executable, "-c", "import time; time.sleep(60)"]

    monkeypatch.setattr(run, "command", fake_command)
    pid = run.launch()
    assert run.running and pid > 0
    with pytest.raises(RuntimeError, match="already active"):
        run.launch()
    assert run.stop()
    assert not run.running
    assert not run.stop()  # idempotent

    run.resume()
    assert "resume=LAST" in commands[-1]
    run.stop()


def test_watcher_kills_stale_run(tmp_path):
    """watch() kills the pid when the alive heartbeat goes stale, and exits
    quietly when the process is already gone."""
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    trial = str(tmp_path)
    with open(os.path.join(trial, "alive"), "w") as f:
        f.write(str(time.time() - 100))  # already stale
    watch(proc.pid, trial, alive_timeout=1, wait_timeout=5, check_interval=0)
    deadline = time.time() + 10
    while proc.poll() is None and time.time() < deadline:
        time.sleep(0.1)
    assert proc.poll() is not None
    # pid gone -> immediate return
    watch(proc.pid, trial, alive_timeout=1, wait_timeout=5, check_interval=0)
