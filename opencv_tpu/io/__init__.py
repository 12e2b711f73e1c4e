from opencv_tpu.io import image, kitti, video  # noqa: F401
from opencv_tpu.io.video import VideoCapture, VideoWriter  # noqa: F401
