from pidnet_tpu.utils.logging import AverageMeter, TBWriter, create_logger  # noqa: F401
