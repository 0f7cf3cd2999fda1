from pidnet_tpu.ops.resize import resize_bilinear  # noqa: F401
