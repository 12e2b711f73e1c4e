from opencv_tpu.dnn import (  # noqa: F401
    caffe_importer,
    darknet_importer,
    layers,
    net,
    onnx_importer,
    proto,
    tf_importer,
)
from opencv_tpu.dnn.caffe_importer import load_caffe  # noqa: F401
from opencv_tpu.dnn.net import Net  # noqa: F401
from opencv_tpu.dnn.onnx_importer import load_onnx  # noqa: F401
from opencv_tpu.dnn.darknet_importer import load_darknet  # noqa: F401
from opencv_tpu.dnn.tf_importer import load_tf  # noqa: F401
