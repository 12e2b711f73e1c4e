from opencv_tpu.optim import ba, levmarq, pose_graph  # noqa: F401
