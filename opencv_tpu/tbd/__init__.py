from opencv_tpu.tbd import assignment, detection_based, tracker  # noqa: F401
from opencv_tpu.tbd.detection_based import DetectionBasedTracker  # noqa: F401
from opencv_tpu.tbd.tracker import MotMetrics, TbdConfig, Track, Tracker  # noqa: F401
