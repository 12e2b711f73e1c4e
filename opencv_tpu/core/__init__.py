from opencv_tpu.core import config, imgproc, pyramid, types  # noqa: F401
