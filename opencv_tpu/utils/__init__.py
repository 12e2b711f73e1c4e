from opencv_tpu.utils import evaluate, viz  # noqa: F401
