from pidnet_tpu.models import ddrnet, pidnet  # noqa: F401
