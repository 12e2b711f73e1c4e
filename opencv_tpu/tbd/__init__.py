from opencv_tpu.tbd import assignment, tracker  # noqa: F401
from opencv_tpu.tbd.tracker import MotMetrics, TbdConfig, Track, Tracker  # noqa: F401
