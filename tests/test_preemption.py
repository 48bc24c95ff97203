"""Failure recovery under preemption (SURVEY §5): SIGKILL a training run
mid-flight, then resume from its last checkpoint with --resume and finish —
the recovery story a production deployment needs (the reference restarts
from scratch: its checkpoints hold no optimizer/epoch state, train.py:156-177)."""

import os
import signal
import subprocess
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_sigkill_then_resume(tmp_path):
    synth = str(tmp_path / "data")
    subprocess.run([sys.executable, os.path.join(ROOT, "scripts",
                                                 "make_synth_data.py"),
                    synth, "--n-dialogs", "8", "--ft-dim", "32"],
                   check=True, cwd=ROOT)
    model = str(tmp_path / "exp" / "mtn")

    def train_cmd(resume=""):
        cmd = [sys.executable, os.path.join(ROOT, "train.py"),
               "--fea-type", "resnext_st",
               "--train-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
               "--train-set", os.path.join(synth, "train_test.json"),
               "--valid-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
               "--valid-set", os.path.join(synth, "valid_test.json"),
               "--model", model, "--num-epochs", "3", "--batch-size", "8",
               "--nb-blocks", "1", "--nb-venc-blocks", "1",
               "--nb-cenc-blocks", "1", "--d-model", "32", "--att-h", "4",
               "--include-caption", "summary", "--warmup-steps", "20",
               "--report-interval", "1", "--device", "cpu"]
        if resume:
            cmd += ["--resume", resume]
        return cmd

    # start training, SIGKILL once the first epoch's checkpoint exists.
    # The pipe MUST be drained concurrently: the child logs more than the
    # 64 KB OS pipe buffer (orbax's async writer alone emits ~40 INFO lines
    # per save), and an undrained PIPE blocks it mid-save — the checkpoint
    # then never finalizes and this test times out.
    import threading

    proc = subprocess.Popen(train_cmd(), cwd=ROOT,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    out_lines = []
    drainer = threading.Thread(
        target=lambda: out_lines.extend(
            ln.decode(errors="replace") for ln in proc.stdout),
        daemon=True)
    drainer.start()
    ckpt = model + "_best"
    deadline = time.time() + 600
    while time.time() < deadline:
        if os.path.isdir(ckpt) and os.listdir(ckpt):
            break
        if proc.poll() is not None:
            pytest.fail("training exited before checkpointing:\n"
                        + "".join(out_lines[-40:]))
        time.sleep(1.0)
    else:
        proc.kill()
        pytest.fail("no checkpoint appeared within the deadline:\n"
                    + "".join(out_lines[-40:]))
    time.sleep(1.0)          # let any in-flight orbax write settle
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    # resume via the production restart mode: --resume auto must find the
    # surviving complete checkpoint itself (find_latest_checkpoint) and run
    # to completion
    r = subprocess.run(train_cmd(resume="auto"), cwd=ROOT, timeout=900,
                       capture_output=True, text=True)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "resumed from" in (r.stdout + r.stderr)
    assert os.path.isdir(ckpt) and os.listdir(ckpt)
