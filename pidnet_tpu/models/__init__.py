from pidnet_tpu.models import pidnet  # noqa: F401
