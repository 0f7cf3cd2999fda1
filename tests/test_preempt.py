"""Graceful preemption: SIGTERM mid-training checkpoints and exits cleanly.

Beyond-reference (SURVEY §5: the reference has crash-resume only): TPU
VMs are preempted with a SIGTERM grace window. tools/train.py installs a
handler that stops at the next step boundary, writes the regular resume
checkpoint tagged with the interrupted epoch, and exits 0 — so
TRAIN.RESUME picks the run back up with no manual repair.
"""

import os
import re
import signal
import subprocess
import sys
import time

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def workspace(tmp_path, rng):
    os.makedirs(tmp_path / "data/cityscapes/img")
    os.makedirs(tmp_path / "data/cityscapes/gt")
    os.makedirs(tmp_path / "data/list/cityscapes")
    lines = []
    for i in range(4):
        cv2.imwrite(
            str(tmp_path / f"data/cityscapes/img/{i}.png"),
            rng.integers(0, 255, (128, 128, 3)).astype(np.uint8),
        )
        cv2.imwrite(
            str(tmp_path / f"data/cityscapes/gt/{i}.png"),
            rng.integers(0, 34, (128, 128)).astype(np.uint8),
        )
        lines.append(f"img/{i}.png\tgt/{i}.png")
    for name in ("train.lst", "val.lst"):
        with open(tmp_path / "data/list/cityscapes" / name, "w") as f:
            f.write("\n".join(lines))
    cfg = """
DATASET:
  DATASET: cityscapes
  ROOT: data/
  TRAIN_SET: 'list/cityscapes/train.lst'
  TEST_SET: 'list/cityscapes/val.lst'
  NUM_CLASSES: 19
MODEL:
  NAME: pidnet_s
  PRETRAINED: ''
LOSS:
  OHEMKEEP: 500
TRAIN:
  IMAGE_SIZE: [64, 64]
  BASE_SIZE: 128
  BATCH_SIZE_PER_GPU: 2
  END_EPOCH: 5000
  IGNORE_LABEL: 255
TEST:
  IMAGE_SIZE: [128, 128]
  BASE_SIZE: 128
DEVICES: 1
WORKERS: 1
PRINT_FREQ: 1
"""
    with open(tmp_path / "tiny.yaml", "w") as f:
        f.write(cfg)
    return tmp_path


def test_sigterm_checkpoints_and_exits(workspace):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        re.sub(
            r"--xla_force_host_platform_device_count=\d+", "",
            env.get("XLA_FLAGS", ""),
        )
        + " --xla_force_host_platform_device_count=1"
    ).strip()

    out_dir = workspace / "output/cityscapes/tiny"
    # the ambient axon sitecustomize overrides JAX_PLATFORMS at interpreter
    # start (see tests/conftest.py), so the subprocess must ALSO pin the
    # platform via jax.config before any backend initializes
    stub = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from pidnet_tpu.tools.train import main; main()"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", stub, "--cfg", "tiny.yaml"],
        env=env, cwd=workspace,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait until at least one epoch checkpoint exists (training is
        # past compile and stepping), then preempt
        deadline = time.time() + 420
        while time.time() < deadline:
            if (out_dir / "checkpoint.msgpack").exists():
                break
            if proc.poll() is not None:
                pytest.fail(f"train exited early:\n{proc.stdout.read()}")
            time.sleep(1.0)
        else:
            pytest.fail("no checkpoint within the deadline")

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    assert proc.returncode == 0, out
    assert "exiting on SIGTERM" in out, out
    # END_EPOCH 5000 can't have finished: the preemption path, not the
    # normal completion path, produced the exit
    assert not (out_dir / "final_state.msgpack").exists()
    assert (out_dir / "checkpoint.msgpack").exists()

    # the checkpoint resumes: epoch is an int within range and the params
    # load into the model
    sys.path.insert(0, REPO)
    from pidnet_tpu.train import checkpoint as ckpt

    payload = ckpt.load_train_checkpoint(str(out_dir))
    assert payload is not None
    assert 0 <= payload["epoch"] < 5000
    # iteration-exact resume: the preemption checkpoint records how far
    # into the epoch the run got (0 <= iter < epoch_iters; 2 steps/epoch
    # here) so resume skips the already-applied steps
    assert 0 <= payload["iter"] < 2
    assert "conv1.0.weight" in payload["params"]
