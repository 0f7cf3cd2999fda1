from pidnet_tpu.convert.torch_weights import (  # noqa: F401
    convert_state_dict,
    export_state_dict,
    load_torch_checkpoint,
)
from pidnet_tpu.convert.fold import fold_params  # noqa: F401
