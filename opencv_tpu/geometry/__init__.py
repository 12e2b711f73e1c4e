from opencv_tpu.geometry import (  # noqa: F401
    epipolar,
    homography,
    pnp,
    ransac,
    rotation,
)
