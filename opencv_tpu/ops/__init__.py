from opencv_tpu.ops import fast  # noqa: F401
