from opencv_tpu.stitching import blend, stitcher, warpers  # noqa: F401
