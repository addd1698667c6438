"""Preemption safety: SIGTERM to a live training process must produce a
usable checkpoint at a step boundary (SURVEY §5 failure-detection goal; the
flag-based handler avoids checkpointing donated buffers)."""

import os
import signal
import subprocess
import sys
import time

import pytest
import yaml

from optispeech_tpu.config import to_dict

from test_train_step import tiny_experiment


@pytest.mark.slow
def test_sigterm_checkpoints_at_step_boundary(tmp_path):
    base = to_dict(tiny_experiment(pretraining_steps=0))
    base["run_name"] = "preempt-tiny"
    base["log_every_n_steps"] = 1
    base["ckpt_every_n_steps"] = 10_000  # periodic save never fires
    base["data"]["batch_size"] = 8
    cfg_path = tmp_path / "tiny.yaml"
    yaml.safe_dump(base, open(cfg_path, "w"))

    out_dir = tmp_path / "run"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "optispeech_tpu.cli.train",
         "--config", str(cfg_path), "--out-dir", str(out_dir),
         "--synthetic", "--max-steps", "5000", "--no-print-config"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait until training is actually stepping (metrics.csv grows)
        metrics = out_dir / "metrics.csv"
        deadline = time.time() + 900
        while time.time() < deadline:
            if metrics.exists() and "total_loss/generator" in metrics.read_text():
                break
            if proc.poll() is not None:
                pytest.fail(f"train exited early:\n{proc.stdout.read()[-2000:]}")
            time.sleep(2)
        else:
            pytest.fail("training never reached the first logged step")

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()

    assert proc.returncode == 0, out[-2000:]
    assert "preemption" in out
    assert "saving checkpoint before exit" in out.lower() or "Interrupted" in out

    # the checkpoint is restorable and carries the iterator state
    ckpts = out_dir / "checkpoints"
    steps = [int(p) for p in os.listdir(ckpts) if p.isdigit()]
    assert steps, f"no checkpoint written; dir: {os.listdir(out_dir)}"
    # per-step loader state is retained for every kept checkpoint
    assert any(p.startswith("loader_state-") for p in os.listdir(ckpts))
