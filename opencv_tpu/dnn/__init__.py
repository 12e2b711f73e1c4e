from opencv_tpu.dnn import (  # noqa: F401
    caffe_importer,
    layers,
    net,
    onnx_importer,
    proto,
)
from opencv_tpu.dnn.caffe_importer import load_caffe  # noqa: F401
from opencv_tpu.dnn.net import Net  # noqa: F401
from opencv_tpu.dnn.onnx_importer import load_onnx  # noqa: F401
