from pidnet_tpu.nn import functional  # noqa: F401
