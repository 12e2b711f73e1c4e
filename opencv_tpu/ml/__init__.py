from opencv_tpu.ml import classifiers, clustering  # noqa: F401
