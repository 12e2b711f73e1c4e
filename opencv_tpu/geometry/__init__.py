from opencv_tpu.geometry import (  # noqa: F401
    epipolar,
    homography,
    ippe,
    pnp,
    ransac,
    rotation,
)
