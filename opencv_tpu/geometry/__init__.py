from opencv_tpu.geometry import (  # noqa: F401
    affine2d,
    calibration,
    epipolar,
    homography,
    ippe,
    pnp,
    ransac,
    rotation,
)
