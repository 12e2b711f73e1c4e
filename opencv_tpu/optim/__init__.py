from opencv_tpu.optim import ba, levmarq, minimize, pose_graph  # noqa: F401
