"""Marker-based watershed segmentation.

Reference: modules/imgproc/src/segmentation.cpp:1 (cv::watershed) —
Meyer's flooding from user markers ordered by a pixel priority queue
over color gradients.

TPU-first design: the priority-queue flood is inherently sequential, so
this implements the equivalent *topographic-distance* watershed: every
pixel takes the label of the marker reachable with the smallest minimax
edge cost (the maximum gradient step along the path — flooding order
and minimax paths give the same catchment basins for distinct basin
depths). That is a Bellman-Ford fixed point of

    dist[p] = min over neighbours q of max(dist[q], cost(q, p))

computed as masked whole-image relaxation sweeps inside one
`lax.while_loop` — each sweep is 4 shifted min/max ops, no queue, no
dynamic shapes. Ties break toward the smaller label (deterministic).
Output matches cv2.watershed coding: labels, with -1 on the boundary
pixels between catchment basins (and the image border untouched, as in
the reference which never writes the outer frame)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from opencv_tpu.ops.graphcut import _DIRS, _shift

_INF = jnp.float32(3.4e38)


def watershed(img, markers, max_sweeps: int = 4096):
    """img: [H,W] (gray) or [H,W,3] f32; markers: [H,W] int32, >0 =
    seed labels, 0 = unknown. Returns int32 labels with -1 boundaries."""
    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 3:
        chw = jnp.transpose(img, (2, 0, 1))
    else:
        chw = img[None]
    markers = jnp.asarray(markers, jnp.int32)
    h, w = markers.shape

    # edge cost into a pixel = color distance to the neighbour (the
    # reference's flooding priority is the max channel difference)
    def edge_cost(dy, dx):
        nb = _shift(chw, dy, dx, _INF)
        return jnp.max(jnp.abs(chw - nb), axis=0)  # [H,W]

    costs = [edge_cost(dy, dx) for dy, dx in _DIRS]

    seeded = markers > 0
    dist0 = jnp.where(seeded, 0.0, _INF)
    lab0 = jnp.where(seeded, markers, jnp.int32(0))

    def body(state):
        dist, lab, _ = state
        nd, nl = dist, lab
        for k, (dy, dx) in enumerate(_DIRS):
            q_dist = _shift(dist, dy, dx, _INF)
            q_lab = _shift(lab, dy, dx, 0)
            cand = jnp.maximum(q_dist, costs[k])
            better = (cand < nd) | ((cand == nd) & (q_lab > 0)
                                    & ((nl == 0) | (q_lab < nl)))
            nd = jnp.where(better, cand, nd)
            nl = jnp.where(better, q_lab, nl)
        # seeds never change
        nd = jnp.where(seeded, 0.0, nd)
        nl = jnp.where(seeded, markers, nl)
        changed = jnp.any(nl != lab) | jnp.any(nd != dist)
        return nd, nl, changed

    # max_sweeps caps the relaxation (each sweep propagates labels one
    # pixel along every direction, so any H x W image has converged by
    # H + W sweeps; the cap guards adversarial float ties)
    _, dist, lab, _ = lax.while_loop(
        lambda s: s[3] & (s[0] < max_sweeps),
        lambda s: (s[0] + 1, *body(s[1:])),
        (jnp.int32(0), dist0, lab0, jnp.bool_(True)),
    )

    # watershed lines: a pixel is a dam if some 4-neighbour belongs to a
    # different basin AND was flooded no later (the reference marks the
    # pixel popped from the queue when two labels meet, i.e. the later
    # side). Border pixels are left as the reference leaves them.
    dam = jnp.zeros((h, w), bool)
    for k, (dy, dx) in enumerate(_DIRS):
        q_lab = _shift(lab, dy, dx, 0)
        q_dist = _shift(dist, dy, dx, _INF)
        dam |= (q_lab > 0) & (lab > 0) & (q_lab != lab) & (q_dist <= dist)
    dam &= ~seeded
    out = jnp.where(dam, jnp.int32(-1), lab)
    return out
