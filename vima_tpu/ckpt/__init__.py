from vima_tpu.ckpt import convert  # noqa: F401
