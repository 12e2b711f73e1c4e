"""LBP cascade tests against the fork's SHIPPED model
(data/lbpcascades/lbpcascade_frontalface.xml) on the lena image."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.ops import cascade

REF_LBP = "/root/reference/data/lbpcascades/lbpcascade_frontalface.xml"
REF_LENA = "/root/reference/samples/data/lena.jpg"


def test_lbp_loader_shapes():
    m = cascade.load_opencv_lbp_cascade(REF_LBP)
    assert m.window == (24, 24)
    assert len(m.stage_thresholds) == 20
    assert m.subsets.shape[1] == 8
    assert m.subsets.dtype == np.uint32
    assert (m.stage_offsets[1:] > m.stage_offsets[:-1]).all()


def test_real_lbp_cascade_detects_lena_face():
    from PIL import Image

    m = cascade.load_opencv_lbp_cascade(REF_LBP)
    img = np.asarray(
        Image.open(REF_LENA).convert("L").resize((256, 256)), np.float32
    )
    boxes, counts = cascade.detect_multi_scale_lbp(
        jnp.asarray(img), m, scale0=1.2, group_threshold=2
    )
    assert len(boxes) >= 1, "no face found"
    gt = np.array([108.5, 101.5, 86.5, 86.5])  # scaled OpenCV result
    best = 0.0
    for x, y, w, h in boxes[:5]:
        ix1 = max(x, gt[0]); iy1 = max(y, gt[1])
        ix2 = min(x + w, gt[0] + gt[2]); iy2 = min(y + h, gt[1] + gt[3])
        inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
        best = max(best, inter / (w * h + gt[2] * gt[3] - inter))
    assert best > 0.45, (boxes[:5], best)
