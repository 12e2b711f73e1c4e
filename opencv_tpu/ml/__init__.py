from opencv_tpu.ml import classifiers, clustering, trees  # noqa: F401
