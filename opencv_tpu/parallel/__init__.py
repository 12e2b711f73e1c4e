from opencv_tpu.parallel import dist_ba, dist_match, mesh, multihost  # noqa: F401
