"""End-to-end CLI smoke: train 1 epoch on a synthetic dataset, resume,
eval the checkpoint, run custom-image inference. Runs on the CPU mesh."""

import os

import cv2
import numpy as np
import pytest


@pytest.fixture
def workspace(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("data/cityscapes/img")
    os.makedirs("data/cityscapes/gt")
    os.makedirs("data/list/cityscapes")
    train, val = [], []
    for i in range(6):
        cv2.imwrite(f"data/cityscapes/img/{i}.png", rng.integers(0, 255, (128, 128, 3)).astype(np.uint8))
        cv2.imwrite(f"data/cityscapes/gt/{i}.png", rng.integers(0, 34, (128, 128)).astype(np.uint8))
        (train if i < 4 else val).append(f"img/{i}.png\tgt/{i}.png")
    with open("data/list/cityscapes/train.lst", "w") as f:
        f.write("\n".join(train))
    with open("data/list/cityscapes/val.lst", "w") as f:
        f.write("\n".join(val))
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
  END_EPOCH: 1
  IGNORE_LABEL: 255
TEST:
  IMAGE_SIZE: [128, 128]
  BASE_SIZE: 128
DEVICES: 2
WORKERS: 1
PRINT_FREQ: 1
"""
    with open("tiny.yaml", "w") as f:
        f.write(cfg)
    return tmp_path


def test_train_eval_custom_cli(workspace):
    from pidnet_tpu.tools import custom, eval as eval_tool, train

    train.main(["--cfg", "tiny.yaml"])
    out = "output/cityscapes/tiny"
    assert os.path.isfile(f"{out}/checkpoint.msgpack")
    assert os.path.isfile(f"{out}/final_state.msgpack")
    assert os.path.isfile(f"{out}/best.msgpack")

    # resume for one more epoch from the checkpoint
    train.main(["--cfg", "tiny.yaml", "TRAIN.RESUME", "true", "TRAIN.END_EPOCH", "2"])

    eval_tool.main(
        ["--cfg", "tiny.yaml", "TEST.MODEL_FILE", f"{out}/best.msgpack"]
    )
    assert any(f.endswith("_test.log") for f in os.listdir(out))

    # TTA path: multi-scale + flip evaluation (TEST.MULTI_SCALE /
    # TEST.FLIP_TEST — functional here, dead flags in the reference)
    eval_tool.main(
        ["--cfg", "tiny.yaml", "TEST.MODEL_FILE", f"{out}/best.msgpack",
         "TEST.MULTI_SCALE", "true", "TEST.FLIP_TEST", "true",
         "TEST.SCALE_LIST", "[0.5,1.0]"]
    )

    # spatial partitioning path: same eval with the image H dim sharded
    # over 8 devices of the virtual CPU mesh (GSPMD halo exchange)
    eval_tool.main(
        ["--cfg", "tiny.yaml", "--spatial", "8",
         "TEST.MODEL_FILE", f"{out}/best.msgpack"]
    )

    # gradient-accumulation path: one epoch with 2 sequential virtual
    # DP shards on 1 device (global batch 2x1x2 = 4, TRAIN.ACCUM_STEPS)
    os.remove(f"{out}/final_state.msgpack")
    train.main(["--cfg", "tiny.yaml", "DEVICES", "1", "TRAIN.ACCUM_STEPS", "2"])
    assert os.path.isfile(f"{out}/final_state.msgpack")

    # spatial TRAINING path: one epoch on a (1 data, 2 spatial) mesh
    # (global-batch sync-BN/OHEM semantics, parallel/spatial.py); remove
    # the artifact first so the assertion checks THIS run's checkpoint
    os.remove(f"{out}/final_state.msgpack")
    train.main(["--cfg", "tiny.yaml", "--spatial", "2"])
    assert os.path.isfile(f"{out}/final_state.msgpack")

    os.makedirs("samples", exist_ok=True)
    img = np.zeros((128, 128, 3), np.uint8)
    cv2.imwrite("samples/a.png", img)
    custom.main(["--a", "pidnet-s", "--p", f"{out}/best.msgpack", "--r", "samples/"])
    assert os.path.isfile("samples/outputs/a.png")
    seg = cv2.imread("samples/outputs/a.png")
    assert seg.shape == (128, 128, 3)
