from opencv_tpu.dnn import layers, net  # noqa: F401
from opencv_tpu.dnn.net import Net  # noqa: F401
