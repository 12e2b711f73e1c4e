from opencv_tpu.io import image, kitti  # noqa: F401
