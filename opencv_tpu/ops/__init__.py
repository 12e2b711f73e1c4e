from opencv_tpu.ops import (  # noqa: F401
    edges,
    fast,
    gftt,
    hough,
    kalman,
    lk,
    matching,
    orb,
)
