from opencv_tpu.utils import evaluate  # noqa: F401
