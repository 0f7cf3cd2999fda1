from pidnet_tpu.losses.criterion import (  # noqa: F401
    FullLoss,
    boundary_loss,
    cross_entropy,
    ohem_cross_entropy,
    weighted_bce,
)
