from opencv_tpu.ops.pallas import knn  # noqa: F401
