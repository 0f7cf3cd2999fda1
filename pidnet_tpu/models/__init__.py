from pidnet_tpu.models import bisenet, ddrnet, pidnet  # noqa: F401
