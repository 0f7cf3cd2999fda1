"""Poly learning-rate schedule (reference utils/utils.py:154-160):
lr = base_lr * (1 - cur_iter/max_iters) ** power, applied per iteration."""


def poly_lr(base_lr: float, max_iters: int, cur_iter: int, power: float = 0.9) -> float:
    return base_lr * ((1.0 - float(cur_iter) / max_iters) ** power)
