"""Image-in -> K-out calibration: chessboard detection + calibrate_camera,
plus the fisheye model. Mirrors the reference's artificial-board tests
(calib3d/test/test_cameracalibration_artificial.cpp and
test_chessboardgenerator.cpp): boards rendered at known poses with a
known camera, detection must recover the corner grid, calibration must
recover K. VERDICT.md round-1 item 8.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_tpu.core import imgproc
from opencv_tpu.geometry import calibration
from opencv_tpu.geometry.rotation import rodrigues
from opencv_tpu.ops.chessboard import find_chessboard_corners

COLS, ROWS = 7, 5  # inner corners
SQ = 40  # board square px
H, W = 480, 640
F = 520.0
K_GT = np.array([[F, 0, W / 2 + 6], [0, F * 1.01, H / 2 - 4], [0, 0, 1]])
SQUARE_WORLD = 0.1  # world units per square


def _board_image():
    bw, bh = (COLS + 1) * SQ, (ROWS + 1) * SQ
    board = np.full((bh + 2 * SQ, bw + 2 * SQ), 210.0, np.float32)
    for i in range(ROWS + 1):
        for j in range(COLS + 1):
            if (i + j) % 2 == 0:
                board[
                    SQ * (i + 1) : SQ * (i + 2), SQ * (j + 1) : SQ * (j + 2)
                ] = 30.0
    return board, bw, bh


def _render_view(board, bw, bh, rvec, tvec):
    """Render the board at pose (rvec, tvec); returns (img, H board->img,
    gt inner corners [ROWS*COLS, 2])."""
    R = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)), np.float64)
    s = SQUARE_WORLD / SQ
    T = np.array(
        [[s, 0, -(bw / 2 + SQ) * s], [0, s, -(bh / 2 + SQ) * s], [0, 0, 1]]
    )
    Hom = K_GT @ np.column_stack([R[:, 0], R[:, 1], tvec]) @ T
    img = np.asarray(
        imgproc.warp_perspective(
            jnp.asarray(board), jnp.asarray(np.linalg.inv(Hom), jnp.float32),
            H, W,
        )
    )
    gt = []
    for i in range(ROWS):
        for j in range(COLS):
            p = Hom @ np.array([SQ * (j + 2), SQ * (i + 2), 1.0])
            gt.append(p[:2] / p[2])
    return img, Hom, np.asarray(gt)


VIEWS = [
    (np.array([0.25, -0.30, 0.10], np.float32), np.array([-0.20, -0.10, 2.6])),
    (np.array([-0.30, 0.25, -0.05], np.float32), np.array([0.15, 0.05, 2.4])),
    (np.array([0.10, 0.40, 0.20], np.float32), np.array([0.00, 0.15, 2.8])),
    (np.array([-0.15, -0.35, -0.15], np.float32), np.array([-0.1, 0.12, 2.2])),
    (np.array([0.35, 0.10, -0.25], np.float32), np.array([0.18, -0.1, 2.5])),
]


@pytest.fixture(scope="module")
def detections():
    board, bw, bh = _board_image()
    out = []
    for rvec, tvec in VIEWS:
        img, _, gt = _render_view(board, bw, bh, rvec, tvec)
        corners = find_chessboard_corners(img, (COLS, ROWS))
        out.append((corners, gt))
    return out


def test_detection_accuracy(detections):
    """Every rendered view must yield the full grid, subpixel-accurate
    under the best lattice symmetry (plain boards are 180-ambiguous)."""
    for corners, gt in detections:
        assert corners is not None
        g = corners.reshape(ROWS, COLS, 2)
        flips = [g, g[::-1], g[:, ::-1], g[::-1, ::-1]]
        err = min(
            np.linalg.norm(f.reshape(-1, 2) - gt, axis=1).mean()
            for f in flips
        )
        assert err < 0.7, f"mean corner error {err:.3f}px"


def test_calibration_end_to_end(detections):
    """images -> detected grids -> calibrate_camera recovers K."""
    obj = np.zeros((ROWS * COLS, 3), np.float32)
    jj, ii = np.meshgrid(np.arange(COLS), np.arange(ROWS))
    obj[:, 0] = (jj.reshape(-1)) * SQUARE_WORLD
    obj[:, 1] = (ii.reshape(-1)) * SQUARE_WORLD
    img_pts = np.stack([c for c, _ in detections])
    obj_pts = np.stack([obj] * len(detections))
    res = calibration.calibrate_camera(obj_pts, img_pts)
    assert res.rms < 0.6, f"rms {res.rms:.3f}px"
    assert abs(res.K[0, 0] - K_GT[0, 0]) < 0.02 * K_GT[0, 0]
    assert abs(res.K[1, 1] - K_GT[1, 1]) < 0.02 * K_GT[1, 1]
    assert abs(res.K[0, 2] - K_GT[0, 2]) < 8.0
    assert abs(res.K[1, 2] - K_GT[1, 2]) < 8.0


def test_fisheye_roundtrip():
    k = jnp.asarray([-0.02, 0.004, -0.002, 0.001])
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-0.8, 0.8, size=(500, 2)).astype(np.float32))
    xd = calibration.fisheye_distort(xy, k)
    back = calibration.fisheye_undistort(xd, k)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=2e-4)


def test_fisheye_calibration():
    """Synthesized fisheye observations -> calibrate_fisheye recovers
    K and the theta-polynomial (fisheye.cpp calibrate semantics)."""
    rng = np.random.default_rng(1)
    K4 = jnp.asarray([420.0, 425.0, 330.0, 245.0])
    k_gt = jnp.asarray([-0.05, 0.01, -0.004, 0.001])
    obj = np.zeros((ROWS * COLS, 3), np.float32)
    jj, ii = np.meshgrid(np.arange(COLS), np.arange(ROWS))
    obj[:, 0] = jj.reshape(-1) * SQUARE_WORLD
    obj[:, 1] = ii.reshape(-1) * SQUARE_WORLD
    obj_v, img_v = [], []
    for rvec, tvec in VIEWS:
        proj = calibration.fisheye_project_points(
            jnp.asarray(rvec), jnp.asarray(tvec + np.array([0.3, 0.2, 0.0])),
            K4, k_gt, jnp.asarray(obj),
        )
        noise = rng.normal(0, 0.05, size=proj.shape).astype(np.float32)
        obj_v.append(obj)
        img_v.append(np.asarray(proj) + noise)
    res = calibration.calibrate_fisheye(np.stack(obj_v), np.stack(img_v))
    assert res.rms < 0.15, f"rms {res.rms:.3f}px"
    assert abs(res.K[0, 0] - 420.0) < 5.0
    assert abs(res.K[1, 1] - 425.0) < 5.0
    # the individual theta-polynomial coefficients are unidentifiable
    # over a narrow field of view (same conditioning as the reference's
    # fisheye::calibrate); what must match is the distortion CURVE
    # theta_d(theta) over the observed angle range
    th = np.linspace(0.01, 0.45, 50)

    def theta_d(k, t):
        return t * (1 + k[0] * t**2 + k[1] * t**4 + k[2] * t**6 + k[3] * t**8)

    curve_err = np.abs(theta_d(np.asarray(res.dist), th) - theta_d(np.asarray(k_gt), th))
    assert curve_err.max() < 1.5e-3, f"curve err {curve_err.max():.2e} rad"  # ~0.6px at f=420
