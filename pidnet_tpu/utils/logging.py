"""Run logging: timestamped file+console logger, running meters, TensorBoard.

Same artifact layout as the reference (utils/utils.py:95-127):
output/<dataset>/<cfg_name>/<cfg_name>_<time>_<phase>.log and TensorBoard
events under log/<dataset>/<model>/<cfg_name>_<time>. TensorBoard is
optional (falls back to a no-op writer if unavailable).
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.count = 0
        self.val = 0.0

    def update(self, val: float, weight: float = 1.0) -> None:
        self.val = val
        self.sum += val * weight
        self.count += weight

    def average(self) -> float:
        return self.sum / self.count if self.count else 0.0


class TBWriter:
    """Thin wrapper over torch.utils.tensorboard (optional dependency)."""

    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir)
        except Exception:  # tensorboard not installed — no-op
            self._w = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._w is not None:
            self._w.add_scalar(tag, value, step)

    def close(self) -> None:
        if self._w is not None:
            self._w.close()


def create_logger(cfg, cfg_path: str, phase: str = "train"):
    """Returns (logger, final_output_dir, tb_log_dir)."""
    root = Path(cfg.OUTPUT_DIR or "output")
    dataset = cfg.DATASET.DATASET
    model = cfg.MODEL.NAME
    cfg_name = os.path.basename(cfg_path).split(".")[0]

    final_output_dir = root / dataset / cfg_name
    final_output_dir.mkdir(parents=True, exist_ok=True)

    time_str = time.strftime("%Y-%m-%d-%H-%M")
    log_file = final_output_dir / f"{cfg_name}_{time_str}_{phase}.log"

    logger = logging.getLogger("pidnet_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)-15s %(message)s")
    fh = logging.FileHandler(str(log_file))
    fh.setFormatter(fmt)
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(ch)

    tb_log_dir = Path(cfg.LOG_DIR or "log") / dataset / model / f"{cfg_name}_{time_str}"
    tb_log_dir.mkdir(parents=True, exist_ok=True)

    return logger, str(final_output_dir), str(tb_log_dir)
