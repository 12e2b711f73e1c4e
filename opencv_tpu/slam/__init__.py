from opencv_tpu.slam import vo  # noqa: F401
