import pytest

from pidnet_tpu.config import load_config


def test_loads_reference_schema_yaml(tmp_path):
    # A verbatim reference-style YAML (configs/cityscapes/*.yaml schema).
    y = tmp_path / "exp.yaml"
    y.write_text(
        """
CUDNN:
  BENCHMARK: true
GPUS: (0,1)
OUTPUT_DIR: 'output'
LOG_DIR: 'log'
WORKERS: 6
PRINT_FREQ: 10
DATASET:
  DATASET: cityscapes
  ROOT: data/
  NUM_CLASSES: 19
MODEL:
  NAME: pidnet_small
  NUM_OUTPUTS: 2
LOSS:
  USE_OHEM: true
  OHEMKEEP: 131072
  BALANCE_WEIGHTS: [0.4, 1.0]
  SB_WEIGHTS: 1.0
TRAIN:
  IMAGE_SIZE:
  - 1024
  - 1024
  BATCH_SIZE_PER_GPU: 6
  LR: 0.01
  WD: 0.0005
  IGNORE_LABEL: 255
TEST:
  IMAGE_SIZE:
  - 2048
  - 1024
  OUTPUT_INDEX: 1
"""
    )
    cfg = load_config(str(y), ["TRAIN.LR", "0.02", "MODEL.NAME", "pidnet_l"])
    assert cfg.MODEL.NAME == "pidnet_l"
    assert cfg.TRAIN.LR == 0.02
    assert cfg.TRAIN.IGNORE_LABEL == 255
    assert cfg.LOSS.BALANCE_WEIGHTS == [0.4, 1.0]
    assert cfg.TEST.OUTPUT_INDEX == 1
    assert cfg.TRAIN.END_EPOCH == 484  # default preserved
    with pytest.raises(AttributeError):
        cfg.TRAIN.LR = 1.0  # frozen


def test_repo_configs_load():
    import glob

    paths = glob.glob("configs/**/*.yaml", recursive=True)
    assert len(paths) >= 8
    for p in paths:
        cfg = load_config(p)
        assert cfg.DATASET.NUM_CLASSES in (11, 19)


def test_unknown_key_rejected(tmp_path):
    y = tmp_path / "bad.yaml"
    y.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        load_config(str(y))
