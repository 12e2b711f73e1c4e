from opencv_tpu.utils import evaluate, guard, viz  # noqa: F401
