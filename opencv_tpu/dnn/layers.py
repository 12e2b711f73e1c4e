"""DNN layer kernels (reference `dnn` module analogs: the 3.4-era layer
zoo of modules/dnn/src/layers/*). Data layout NCHW like the reference.

On TPU each layer is just the XLA op — the reference's hand-written
OpenCL/Halide kernels (dnn/src/opencl/*.cl) have no reason to exist
here; the value of this module is the Net container + importer surface
(dnn/net.py), not the arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def convolution(x, weights, bias=None, stride=1, pad="SAME", groups=1):
    """x [N,C,H,W], weights [O, C/groups, kh, kw]."""
    dn = lax.conv_dimension_numbers(x.shape, weights.shape, ("NCHW", "OIHW", "NCHW"))
    s = (stride, stride) if isinstance(stride, int) else stride
    out = lax.conv_general_dilated(
        x, weights, s, pad, dimension_numbers=dn, feature_group_count=groups
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out


def fully_connected(x, weights, bias=None):
    """x [N, D] (flattened on entry), weights [O, D]."""
    x = x.reshape(x.shape[0], -1)
    out = jnp.dot(x, weights.T, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


def relu(x):
    return jnp.maximum(x, 0.0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def softmax(x, axis=1):
    return jax.nn.softmax(x, axis=axis)


def max_pool(x, ksize=2, stride=None):
    stride = stride or ksize
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 1, ksize, ksize),
        window_strides=(1, 1, stride, stride),
        padding="VALID",
    )


def avg_pool(x, ksize=2, stride=None):
    stride = stride or ksize
    s = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, 1, ksize, ksize),
        window_strides=(1, 1, stride, stride),
        padding="VALID",
    )
    return s / (ksize * ksize)


def batch_norm(x, mean, var, gamma, beta, eps=1e-5):
    shape = (1, -1, 1, 1) if x.ndim == 4 else (1, -1)
    return (
        (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
    ) * gamma.reshape(shape) + beta.reshape(shape)


def concat(xs, axis=1):
    return jnp.concatenate(xs, axis=axis)


def flatten(x):
    return x.reshape(x.shape[0], -1)


# --------------------------------------------------------------------------
# Detection heads (reference: dnn/src/layers/region_layer.cpp,
# detection_output_layer.cpp, prior_box_layer.cpp) — round 3
# --------------------------------------------------------------------------


def region_decode(
    x: jnp.ndarray,
    anchors: jnp.ndarray,
    classes: int,
    use_softmax: bool = True,
    thresh: float = 0.2,
    wh_norm: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """YOLO v2 [region] / v3 [yolo] head (region_layer.cpp:234-292).

    x: conv output [N, A*(5+classes), H, W] (darknet layout).
    anchors: [A, 2] (w, h) biases. wh_norm: divisor for exp(wh)*anchor —
    (cols, rows) for v2 [region] (anchors in grid units), (netw, neth)
    for v3 [yolo] (anchors in pixels). Default = grid size (v2).

    Returns [N, H*W*A, 5+classes]: (cx, cy, w, h, objectness, probs...)
    in image-normalized coords; class probs are objectness * p(class),
    zeroed below `thresh` — exactly the reference's output contract.
    """
    n, c, h, w = x.shape
    a = anchors.shape[0]
    cell = 5 + classes
    assert c == a * cell, (c, a, cell)
    wn, hn = wh_norm if wh_norm is not None else (float(w), float(h))

    t = x.reshape(n, a, cell, h, w)
    tx, ty, tw, th, tobj = t[:, :, 0], t[:, :, 1], t[:, :, 2], t[:, :, 3], t[:, :, 4]
    probs = t[:, :, 5:]  # [N,A,classes,H,W]

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    bx = (gx + jax.nn.sigmoid(tx)) / w
    by = (gy + jax.nn.sigmoid(ty)) / h
    bw = jnp.exp(tw) * anchors[None, :, 0, None, None] / wn
    bh = jnp.exp(th) * anchors[None, :, 1, None, None] / hn
    obj = jax.nn.sigmoid(tobj)
    if use_softmax:
        p = jax.nn.softmax(probs, axis=2)
    else:  # v3 independent logistic classes
        p = jax.nn.sigmoid(probs)
    conf = obj[:, :, None] * p
    conf = jnp.where(conf > thresh, conf, 0.0)

    out = jnp.concatenate(
        [bx[:, :, None], by[:, :, None], bw[:, :, None], bh[:, :, None],
         obj[:, :, None], conf],
        axis=2,
    )  # [N, A, cell, H, W]
    # reference row order: index = (y*cols + x)*anchors + a
    out = jnp.transpose(out, (0, 3, 4, 1, 2)).reshape(n, h * w * a, cell)
    return out


def nms_boxes(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.4,
    score_threshold: float = 0.0,
    max_out: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy IoU NMS (cv::dnn::NMSBoxes, nms.cpp; do_nms_sort in
    region_layer.cpp:301). boxes [M,4] as (cx, cy, w, h).

    TPU-native: fixed max_out iterations of select-max + suppress —
    static shapes, no sorting, masked output. Returns (idx [max_out],
    keep [max_out] bool).
    """
    x1 = boxes[:, 0] - boxes[:, 2] / 2
    y1 = boxes[:, 1] - boxes[:, 3] / 2
    x2 = boxes[:, 0] + boxes[:, 2] / 2
    y2 = boxes[:, 1] + boxes[:, 3] / 2
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)

    def iou_with(i):
        xx1 = jnp.maximum(x1, x1[i])
        yy1 = jnp.maximum(y1, y1[i])
        xx2 = jnp.minimum(x2, x2[i])
        yy2 = jnp.minimum(y2, y2[i])
        inter = jnp.maximum(xx2 - xx1, 0) * jnp.maximum(yy2 - yy1, 0)
        return inter / jnp.maximum(area + area[i] - inter, 1e-9)

    def body(k, state):
        live, idx, keep = state
        i = jnp.argmax(jnp.where(live, scores, -jnp.inf))
        ok = live[i] & (scores[i] > score_threshold)
        idx = idx.at[k].set(jnp.where(ok, i, -1))
        keep = keep.at[k].set(ok)
        sup = iou_with(i) > iou_threshold
        live = live & ~(sup & ok)
        live = live.at[i].set(False)
        return live, idx, keep

    live0 = scores > score_threshold
    idx0 = jnp.full((max_out,), -1, jnp.int32)
    keep0 = jnp.zeros((max_out,), bool)
    _, idx, keep = lax.fori_loop(0, max_out, body, (live0, idx0, keep0))
    return idx, keep


def prior_box(
    feat_h: int,
    feat_w: int,
    img_h: int,
    img_w: int,
    min_size: float,
    max_size: float | None = None,
    aspect_ratios: tuple[float, ...] = (2.0,),
    flip: bool = True,
    clip: bool = False,
    variances: tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SSD PriorBox (prior_box_layer.cpp): anchor grid for one feature
    map. Returns (priors [K,4] as (x1,y1,x2,y2) normalized, variances
    [K,4]) with K = feat_h*feat_w*n_boxes — the reference's 2-channel
    blob split into its two halves.
    """
    import numpy as np

    sizes = [(min_size, min_size)]
    if max_size is not None:
        sizes.append(((min_size * max_size) ** 0.5,) * 2)
    ars = list(aspect_ratios)
    if flip:
        ars = ars + [1.0 / a for a in aspect_ratios]
    for ar in ars:
        sizes.append((min_size * ar ** 0.5, min_size / ar ** 0.5))

    step_x = img_w / feat_w
    step_y = img_h / feat_h
    out = []
    for y in range(feat_h):
        for x in range(feat_w):
            cx = (x + 0.5) * step_x
            cy = (y + 0.5) * step_y
            for bw, bh in sizes:
                out.append(
                    [(cx - bw / 2) / img_w, (cy - bh / 2) / img_h,
                     (cx + bw / 2) / img_w, (cy + bh / 2) / img_h]
                )
    pri = jnp.asarray(np.asarray(out, np.float32))
    if clip:
        pri = jnp.clip(pri, 0.0, 1.0)
    var = jnp.tile(jnp.asarray(variances, jnp.float32), (pri.shape[0], 1))
    return pri, var


def detection_output(
    loc: jnp.ndarray,
    conf: jnp.ndarray,
    priors: jnp.ndarray,
    variances: jnp.ndarray,
    num_classes: int,
    background_id: int = 0,
    conf_threshold: float = 0.01,
    nms_threshold: float = 0.45,
    top_k: int = 100,
) -> jnp.ndarray:
    """SSD DetectionOutput (detection_output_layer.cpp): decode CENTER_SIZE
    loc deltas against priors, per-class NMS, emit the reference's
    [k, 7] rows (img_id, label, conf, x1, y1, x2, y2) padded with -1 ids.

    loc [N, K*4], conf [N, K*num_classes], priors/variances [K,4].
    """
    n = loc.shape[0]
    k = priors.shape[0]
    loc = loc.reshape(n, k, 4)
    conf = conf.reshape(n, k, num_classes)

    pcx = (priors[:, 0] + priors[:, 2]) / 2
    pcy = (priors[:, 1] + priors[:, 3]) / 2
    pw = priors[:, 2] - priors[:, 0]
    ph = priors[:, 3] - priors[:, 1]

    cx = variances[:, 0] * loc[..., 0] * pw + pcx
    cy = variances[:, 1] * loc[..., 1] * ph + pcy
    bw = jnp.exp(variances[:, 2] * loc[..., 2]) * pw
    bh = jnp.exp(variances[:, 3] * loc[..., 3]) * ph
    boxes = jnp.stack([cx, cy, bw, bh], axis=-1)  # [N,K,4] cxcywh

    rows = []
    for b in range(n):
        for cls in range(num_classes):
            if cls == background_id:
                continue
            idx, keep = nms_boxes(
                boxes[b], conf[b, :, cls],
                iou_threshold=nms_threshold,
                score_threshold=conf_threshold,
                max_out=top_k,
            )
            sel = jnp.maximum(idx, 0)
            bb = boxes[b][sel]
            row = jnp.stack(
                [
                    jnp.where(keep, float(b), -1.0),
                    jnp.where(keep, float(cls), -1.0),
                    jnp.where(keep, conf[b, :, cls][sel], 0.0),
                    bb[:, 0] - bb[:, 2] / 2,
                    bb[:, 1] - bb[:, 3] / 2,
                    bb[:, 0] + bb[:, 2] / 2,
                    bb[:, 1] + bb[:, 3] / 2,
                ],
                axis=-1,
            )
            rows.append(row)
    return jnp.concatenate(rows, axis=0)


def lstm(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    h0: jnp.ndarray | None = None,
    c0: jnp.ndarray | None = None,
):
    """LSTM over a sequence (reference dnn/src/layers/recurrent_layers.cpp
    LSTMLayer). x [T, N, D]; w_ih [4H, D], w_hh [4H, H], bias [4H] with
    gate order (i, f, o, g) like the reference's produceCellOutput
    weights. Returns (outputs [T, N, H], (h_T, c_T)).

    lax.scan over time — the only sequential axis; each step is fused
    MXU work.
    """
    t, n, d = x.shape
    hdim = w_hh.shape[1]
    if h0 is None:
        h0 = jnp.zeros((n, hdim), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((n, hdim), x.dtype)
    b = 0.0 if bias is None else bias

    def step(carry, xt):
        h, c = carry
        z = xt @ w_ih.T + h @ w_hh.T + b  # [N, 4H]
        i, f, o, g = jnp.split(z, 4, axis=1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        o = jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (h_t, c_t), ys = lax.scan(step, (h0, c0), x)
    return ys, (h_t, c_t)


def gru(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    bias_ih: jnp.ndarray | None = None,
    bias_hh: jnp.ndarray | None = None,
    h0: jnp.ndarray | None = None,
    linear_before_reset: bool = True,
):
    """GRU over a sequence (reference dnn/src/layers/recurrent_layers.cpp
    GRULayer slot; ONNX GRU operator semantics). x [T, N, D]; w_ih
    [3H, D], w_hh [3H, H] in ONNX gate order (z, r, h); separate input /
    recurrence biases [3H] because linear_before_reset=1 (the torch
    export) applies the recurrence bias INSIDE the reset gate product.
    Returns (outputs [T, N, H], h_T). lax.scan over the one sequential
    axis; each step is fused MXU work."""
    t, n, d = x.shape
    hdim = w_hh.shape[1]
    if h0 is None:
        h0 = jnp.zeros((n, hdim), x.dtype)
    bi = jnp.zeros((3 * hdim,), x.dtype) if bias_ih is None else bias_ih
    bh = jnp.zeros((3 * hdim,), x.dtype) if bias_hh is None else bias_hh
    bi_z, bi_r, bi_h = jnp.split(bi, 3)
    bh_z, bh_r, bh_h = jnp.split(bh, 3)
    w_z, w_r, w_h = jnp.split(w_ih, 3, axis=0)
    r_z, r_r, r_h = jnp.split(w_hh, 3, axis=0)

    def step(h, xt):
        z = jax.nn.sigmoid(xt @ w_z.T + h @ r_z.T + bi_z + bh_z)
        r = jax.nn.sigmoid(xt @ w_r.T + h @ r_r.T + bi_r + bh_r)
        if linear_before_reset:
            hh = jnp.tanh(xt @ w_h.T + bi_h + r * (h @ r_h.T + bh_h))
        else:
            hh = jnp.tanh(xt @ w_h.T + bi_h + (r * h) @ r_h.T + bh_h)
        h = (1.0 - z) * hh + z * h
        return h, h

    h_t, ys = lax.scan(step, h0, x)
    return ys, h_t
