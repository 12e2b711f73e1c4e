"""Detection heads: region/yolo decode, NMS, PriorBox + DetectionOutput,
and a yolov2-tiny-style Darknet net running image -> NMS'd boxes,
verified against an independent torch reimplementation (VERDICT r2 #5).

Reference slots: dnn/src/layers/{region_layer,detection_output_layer,
prior_box_layer}.cpp, dnn/src/nms.cpp, modules/dnn/src/darknet/.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from opencv_tpu.dnn import layers
from opencv_tpu.dnn.darknet_importer import load_darknet

torch = pytest.importorskip("torch")


# --------------------------------------------------------------- region head


def torch_region_decode(x, anchors, classes, use_softmax, thresh, wh_norm):
    """Independent torch reimplementation of the reference decode
    (region_layer.cpp:269-292)."""
    n, c, h, w = x.shape
    a = anchors.shape[0]
    cell = 5 + classes
    t = x.reshape(n, a, cell, h, w)
    sig = torch.sigmoid
    gx = torch.arange(w, dtype=torch.float32).view(1, 1, 1, w)
    gy = torch.arange(h, dtype=torch.float32).view(1, 1, h, 1)
    bx = (gx + sig(t[:, :, 0])) / w
    by = (gy + sig(t[:, :, 1])) / h
    bw = torch.exp(t[:, :, 2]) * anchors[None, :, 0, None, None] / wh_norm[0]
    bh = torch.exp(t[:, :, 3]) * anchors[None, :, 1, None, None] / wh_norm[1]
    obj = sig(t[:, :, 4])
    p = (torch.softmax(t[:, :, 5:], dim=2) if use_softmax
         else sig(t[:, :, 5:]))
    conf = obj[:, :, None] * p
    conf = torch.where(conf > thresh, conf, torch.zeros(()))
    out = torch.cat(
        [bx[:, :, None], by[:, :, None], bw[:, :, None], bh[:, :, None],
         obj[:, :, None], conf], dim=2,
    )
    return out.permute(0, 3, 4, 1, 2).reshape(n, h * w * a, cell)


@pytest.mark.parametrize("use_softmax", [True, False])
def test_region_decode_matches_torch(use_softmax):
    rng = np.random.default_rng(0)
    classes, a, h, w = 4, 3, 5, 7
    x = rng.normal(0, 1.5, (2, a * (5 + classes), h, w)).astype(np.float32)
    anchors = rng.uniform(0.5, 3.0, (a, 2)).astype(np.float32)
    ours = np.asarray(layers.region_decode(
        jnp.asarray(x), jnp.asarray(anchors), classes,
        use_softmax=use_softmax, thresh=0.2,
    ))
    gold = torch_region_decode(
        torch.from_numpy(x), torch.from_numpy(anchors), classes,
        use_softmax, 0.2, (float(w), float(h)),
    ).numpy()
    np.testing.assert_allclose(ours, gold, rtol=2e-5, atol=2e-6)


def test_nms_boxes_greedy_semantics():
    # three clusters: NMS must keep the max of each overlapping pair
    boxes = np.array(
        [
            [0.30, 0.30, 0.20, 0.20],   # cluster A best
            [0.31, 0.31, 0.20, 0.20],   # overlaps A, lower score
            [0.70, 0.70, 0.10, 0.10],   # cluster B
            [0.72, 0.70, 0.10, 0.10],   # overlaps B, higher score
            [0.10, 0.80, 0.05, 0.05],   # isolated
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.5, 0.6, 0.3], np.float32)
    idx, keep = layers.nms_boxes(
        jnp.asarray(boxes), jnp.asarray(scores),
        iou_threshold=0.4, score_threshold=0.1, max_out=5,
    )
    kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
    assert kept == {0, 3, 4}


def test_nms_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    m = 60
    cxcy = rng.uniform(0.2, 0.8, (m, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.3, (m, 2)).astype(np.float32)
    boxes = np.concatenate([cxcy, wh], 1)
    scores = rng.uniform(0, 1, m).astype(np.float32)
    idx, keep = layers.nms_boxes(
        jnp.asarray(boxes), jnp.asarray(scores),
        iou_threshold=0.45, score_threshold=0.2, max_out=m,
    )
    ours = np.asarray(idx)[np.asarray(keep)]
    xywh = np.concatenate([cxcy - wh / 2, wh], 1)
    gold = cv2.dnn.NMSBoxes(
        xywh.tolist(), scores.tolist(), 0.2, 0.45
    )
    gold = np.asarray(gold).reshape(-1)
    assert set(ours.tolist()) == set(gold.tolist())


# ------------------------------------------------------------- SSD pieces


def test_prior_box_grid_properties():
    pri, var = layers.prior_box(4, 6, 300, 300, min_size=60.0,
                                max_size=120.0, aspect_ratios=(2.0,))
    pri = np.asarray(pri)
    n_boxes = 4  # min, sqrt(min*max), ar=2, ar=1/2
    assert pri.shape == (4 * 6 * n_boxes, 4)
    # centers lie on the feature-map grid
    cx = (pri[:, 0] + pri[:, 2]) / 2 * 300
    assert np.allclose(sorted(set(np.round(cx, 3))),
                       [(x + 0.5) * 50 for x in range(6)])
    # the min-size box is square with the right edge
    w0 = (pri[0, 2] - pri[0, 0]) * 300
    h0 = (pri[0, 3] - pri[0, 1]) * 300
    assert w0 == pytest.approx(60, abs=1e-3)
    assert h0 == pytest.approx(60, abs=1e-3)
    assert np.asarray(var).shape == pri.shape


def test_detection_output_decodes_and_nms():
    # one prior exactly on the object, loc deltas = 0 -> box == prior
    pri, var = layers.prior_box(2, 2, 100, 100, min_size=40.0)
    k = pri.shape[0]
    num_classes = 3
    loc = np.zeros((1, k * 4), np.float32)
    conf = np.full((1, k, num_classes), 0.01, np.float32)
    conf[0, 1, 2] = 0.95  # one strong detection of class 2
    out = np.asarray(layers.detection_output(
        jnp.asarray(loc), jnp.asarray(conf.reshape(1, -1)),
        pri, var, num_classes, conf_threshold=0.5, top_k=4,
    ))
    det = out[out[:, 0] >= 0]
    assert det.shape[0] == 1
    assert det[0, 1] == 2.0
    assert det[0, 2] == pytest.approx(0.95, abs=1e-6)
    np.testing.assert_allclose(det[0, 3:], np.asarray(pri)[1], atol=1e-6)


# ------------------------------------------- end-to-end darknet detection net


TINY_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=27
size=1
stride=1
pad=1
activation=linear

[region]
anchors = 1.0,1.5, 2.0,2.0, 3.5,2.5
classes=4
num=3
softmax=1
thresh=0.2
"""


def _torch_forward_tiny(x, params):
    """Independent torch forward of TINY_CFG's backbone."""
    import torch.nn.functional as F

    t = torch.from_numpy(x)
    (k1, b1, s1, m1, v1), (k2, b2, s2, m2, v2), (k3, b3) = params
    t = F.conv2d(t, torch.from_numpy(k1), padding=1)
    t = F.batch_norm(t, torch.from_numpy(m1), torch.from_numpy(v1),
                     torch.from_numpy(s1), torch.from_numpy(b1), eps=1e-5)
    t = F.leaky_relu(t, 0.1)
    t = F.max_pool2d(t, 2, 2)
    t = F.conv2d(t, torch.from_numpy(k2), padding=1)
    t = F.batch_norm(t, torch.from_numpy(m2), torch.from_numpy(v2),
                     torch.from_numpy(s2), torch.from_numpy(b2), eps=1e-5)
    t = F.leaky_relu(t, 0.1)
    t = F.max_pool2d(t, 2, 2)
    # darknet pad semantics: pad = size//2 = 0 for the 1x1 head conv
    t = F.conv2d(t, torch.from_numpy(k3), torch.from_numpy(b3), padding=0)
    return t


def _weights_blob(params):
    """Serialize params into darknet .weights order."""
    import struct

    chunks = [struct.pack("<3i", 0, 2, 0), struct.pack("<q", 0)]
    (k1, b1, s1, m1, v1), (k2, b2, s2, m2, v2), (k3, b3) = params
    for arr in (b1, s1, m1, v1, k1, b2, s2, m2, v2, k2, b3, k3):
        chunks.append(np.ascontiguousarray(arr, np.float32).tobytes())
    return b"".join(chunks)


def test_darknet_region_net_image_to_boxes_matches_torch():
    rng = np.random.default_rng(7)

    def conv_params(cout, cin, k, bn):
        kern = rng.normal(0, 0.3, (cout, cin, k, k)).astype(np.float32)
        bias = rng.normal(0, 0.1, cout).astype(np.float32)
        if not bn:
            return kern, bias
        scale = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        mean = rng.normal(0, 0.1, cout).astype(np.float32)
        var = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        return kern, bias, scale, mean, var

    k1, b1, s1, m1, v1 = conv_params(8, 3, 3, True)
    k2, b2, s2, m2, v2 = conv_params(16, 8, 3, True)
    k3, b3 = conv_params(27, 16, 1, False)
    # note: darknet pad for size-1 conv with pad=1 is size//2 = 0
    params = ((k1, b1, s1, m1, v1), (k2, b2, s2, m2, v2), (k3, b3))

    net = load_darknet(TINY_CFG, _weights_blob(params))
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    net.set_input(img)
    ours = np.asarray(net.forward())  # [1, 16*16*3, 9]

    feat = _torch_forward_tiny(img, params)
    anchors = torch.tensor([[1.0, 1.5], [2.0, 2.0], [3.5, 2.5]])
    gold = torch_region_decode(feat, anchors, 4, True, 0.2,
                               (16.0, 16.0)).numpy()
    np.testing.assert_allclose(ours, gold, rtol=3e-4, atol=3e-5)

    # ...and the full pipeline to boxes: NMS on the decoded grid
    dets = ours[0]
    cls_conf = dets[:, 5:].max(axis=1)
    idx, keep = layers.nms_boxes(
        jnp.asarray(dets[:, :4]), jnp.asarray(cls_conf),
        iou_threshold=0.4, score_threshold=0.2, max_out=16,
    )
    # boxes exist and are inside the image
    kept = np.asarray(idx)[np.asarray(keep)]
    assert kept.size >= 1
    bb = dets[kept]
    assert (bb[:, 0] > 0).all() and (bb[:, 0] < 1).all()


def test_lstm_matches_torch():
    """LSTM layer (recurrent_layers.cpp slot) vs torch.nn.LSTM."""
    rng = np.random.default_rng(3)
    t_len, n, d, h = 6, 2, 5, 4
    x = rng.normal(0, 1, (t_len, n, d)).astype(np.float32)
    w_ih = rng.normal(0, 0.4, (4 * h, d)).astype(np.float32)
    w_hh = rng.normal(0, 0.4, (4 * h, h)).astype(np.float32)
    bias = rng.normal(0, 0.1, (4 * h,)).astype(np.float32)

    ys, (hT, cT) = layers.lstm(
        jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh), jnp.asarray(bias)
    )

    m = torch.nn.LSTM(d, h, bias=True)
    # ours uses gate order (i,f,o,g) like the reference; torch uses
    # (i,f,g,o) -> reorder the row blocks when loading torch
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.from_numpy(reorder_inv(w_ih)))
        m.weight_hh_l0.copy_(torch.from_numpy(reorder_inv(w_hh)))
        m.bias_ih_l0.copy_(torch.from_numpy(reorder_inv(bias)))
        m.bias_hh_l0.zero_()
    gold, (hg, cg) = m(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ys), gold.detach().numpy(),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(hT), hg[0].detach().numpy(),
                               rtol=2e-5, atol=2e-6)


def reorder_inv(w):
    """(i,f,o,g) row blocks -> torch's (i,f,g,o)."""
    i, f, o, g = np.split(w, 4, axis=0)
    return np.concatenate([i, f, g, o], axis=0)
