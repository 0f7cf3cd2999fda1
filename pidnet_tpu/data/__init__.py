from pidnet_tpu.data.base import SegDataset  # noqa: F401
from pidnet_tpu.data.cityscapes import Cityscapes  # noqa: F401
from pidnet_tpu.data.camvid import CamVid  # noqa: F401
from pidnet_tpu.data.loader import Loader  # noqa: F401

DATASETS = {"cityscapes": Cityscapes, "camvid": CamVid}


def build_dataset(name: str, **kwargs):
    """Instantiate a dataset by config name (replaces the reference's
    `eval('datasets.'+name)` at tools/train.py:85)."""
    try:
        cls = DATASETS[name]
    except KeyError:
        raise ValueError(f"Unknown dataset {name!r}; known: {sorted(DATASETS)}")
    return cls(**kwargs)
