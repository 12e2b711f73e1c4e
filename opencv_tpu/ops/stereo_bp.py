"""Stereo belief propagation (BP) and constant-space BP (CSBP), TPU-native.

Reference: cudastereo/src/stereobp.cpp + cuda/stereobp.cu implement
hierarchical loopy BP (Felzenszwalb-Huttenlocher): truncated-linear data
cost, truncated-linear smoothness, min-sum message passing on a
checkerboard schedule over a coarse-to-fine cost pyramid.
cudastereo/src/stereocsbp.cpp (ConstantSpaceBP) bounds memory by keeping
only `nr_plane` candidate disparity planes per pixel at fine levels.

TPU-native design:
- messages live as one [4, H, W, D] tensor (up/down/left/right); one
  message sweep = elementwise adds + the truncated-linear distance
  transform over the D axis, computed with a log-depth shift-min tree
  (no per-pixel DP loop — the O(D) forward/backward passes become
  O(log D) fused vector ops since min(m(d'), |d-d'|*jump) is a min-plus
  convolution with a concave kernel).
- the checkerboard schedule is two masked updates per iteration, exactly
  the red-black halves of stereobp.cu but as whole-image selects.
- hierarchy: costs are 2x2 sum-pooled upward; messages upsample by
  nearest-neighbour repetition (stereobp.cu level_up_messages).
- CSBP: plane selection is a top-k over the data cost; messages become
  [4, H, W, P] aligned per-pixel to selected disparities, and the
  smoothness term is evaluated pairwise [P, P] against each neighbour's
  plane set — constant space, fully vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


def _data_cost(
    left: jnp.ndarray, right: jnp.ndarray, num_disparities: int,
    max_data_term: float, data_weight: float,
) -> jnp.ndarray:
    """Truncated linear data cost [H, W, D] (stereobp.cu data_cost)."""
    costs = []
    for d in range(num_disparities):
        shifted = imgproc.shift2d(right, 0, -d, fill=0.0)
        c = jnp.minimum(jnp.abs(left - shifted), max_data_term)
        xx = lax.broadcasted_iota(jnp.int32, left.shape, 1)
        c = jnp.where(xx >= d, c, max_data_term)
        costs.append(data_weight * c)
    return jnp.stack(costs, axis=-1)


def _truncated_linear_dt(m: jnp.ndarray, jump: float, max_disc: float) -> jnp.ndarray:
    """min-plus convolution out(d) = min_d' m(d') + min(|d-d'|*jump, max_disc)
    over the last axis, via a log-depth doubling tree."""
    d = m.shape[-1]
    out = m
    step = 1
    big = jnp.float32(1e9)
    while step < d:
        lo = jnp.concatenate(
            [jnp.full_like(out[..., :step], big), out[..., :-step]], axis=-1
        )
        hi = jnp.concatenate(
            [out[..., step:], jnp.full_like(out[..., :step], big)], axis=-1
        )
        out = jnp.minimum(out, jnp.minimum(lo, hi) + step * jump)
        step *= 2
    cap = jnp.min(m, axis=-1, keepdims=True) + max_disc
    return jnp.minimum(out, cap)


def _message_pass(
    msgs: jnp.ndarray, cost: jnp.ndarray, mask: jnp.ndarray,
    jump: float, max_disc: float,
) -> jnp.ndarray:
    """One masked (checkerboard half) message update.

    msgs [4, H, W, D] — messages INCOMING to each pixel from its
    (up, down, left, right) neighbour. The outgoing message from p to its
    neighbour q in direction k is DT(cost_p + sum of p's incoming except
    the one from q); it lands in q's incoming slot for the opposite
    direction, shifted accordingly.
    """
    total = cost + jnp.sum(msgs, axis=0)  # [H, W, D]
    # outgoing toward each direction: subtract the incoming from there
    out_up = _truncated_linear_dt(total - msgs[1], jump, max_disc)  # to y-1
    out_dn = _truncated_linear_dt(total - msgs[0], jump, max_disc)  # to y+1
    out_lf = _truncated_linear_dt(total - msgs[3], jump, max_disc)  # to x-1
    out_rt = _truncated_linear_dt(total - msgs[2], jump, max_disc)  # to x+1
    # normalize (min-sum messages are shift-invariant; keeps f32 bounded)
    def norm(m):
        return m - jnp.mean(m, axis=-1, keepdims=True)

    def sh(m, dy, dx):
        return imgproc.shift2d(
            m.transpose(2, 0, 1), dy, dx, fill=0.0
        ).transpose(1, 2, 0)

    new = jnp.stack(
        [
            sh(norm(out_dn), 1, 0),   # incoming from up = up-neighbour's "down" msg
            sh(norm(out_up), -1, 0),  # incoming from down
            sh(norm(out_rt), 0, 1),   # incoming from left
            sh(norm(out_lf), 0, -1),  # incoming from right
        ],
        axis=0,
    )
    return jnp.where(mask[None, :, :, None], new, msgs)


def _checkerboard(h: int, w: int) -> jnp.ndarray:
    yy = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ((yy + xx) % 2) == 0


def stereo_bp(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disparities: int = 64,
    n_iters: int = 5,
    n_levels: int = 4,
    max_data_term: float = 10.0,
    data_weight: float = 0.07,
    max_disc_term: float = 1.7,
    disc_single_jump: float = 1.0,
) -> jnp.ndarray:
    """Hierarchical loopy BP disparity (cuda::StereoBeliefPropagation
    analog; defaults mirror StereoBP::estimateRecommendedParams scaled to
    unit-range costs). Returns f32 [H, W] disparities.
    """
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    h, w = left.shape
    cost0 = _data_cost(left, right, num_disparities, max_data_term, data_weight)

    # cost pyramid by 2x2 sum-pooling (stereobp.cu data_cost_reduce)
    costs = [cost0]
    for _ in range(1, n_levels):
        c = costs[-1]
        ch, cw = c.shape[0], c.shape[1]
        ch2, cw2 = (ch // 2) * 2, (cw // 2) * 2
        c = c[:ch2, :cw2]
        c = c.reshape(ch2 // 2, 2, cw2 // 2, 2, -1).sum(axis=(1, 3))
        costs.append(c)

    msgs = jnp.zeros(costs[-1].shape[:2] + (num_disparities,), jnp.float32)
    msgs = jnp.stack([msgs] * 4, axis=0)

    for lvl in range(n_levels - 1, -1, -1):
        cost = costs[lvl]
        lh, lw = cost.shape[:2]
        cb = _checkerboard(lh, lw)

        def body(_, m, cost=cost, cb=cb):
            m = _message_pass(m, cost, cb, disc_single_jump, max_disc_term)
            m = _message_pass(m, cost, ~cb, disc_single_jump, max_disc_term)
            return m

        msgs = lax.fori_loop(0, n_iters, body, msgs)
        if lvl > 0:
            # upsample messages to the finer level (nearest repetition)
            nh, nw = costs[lvl - 1].shape[:2]
            msgs = jnp.repeat(jnp.repeat(msgs, 2, axis=1), 2, axis=2)
            msgs = msgs[:, :nh, :nw]
            pad_h, pad_w = nh - msgs.shape[1], nw - msgs.shape[2]
            if pad_h > 0 or pad_w > 0:
                msgs = jnp.pad(
                    msgs, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge"
                )

    belief = cost0 + jnp.sum(msgs, axis=0)
    return jnp.argmin(belief, axis=-1).astype(jnp.float32)


def stereo_csbp(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disparities: int = 64,
    nr_plane: int = 8,
    n_iters: int = 6,
    max_data_term: float = 10.0,
    data_weight: float = 0.07,
    max_disc_term: float = 1.7,
    disc_single_jump: float = 1.0,
) -> jnp.ndarray:
    """Constant-space BP (cuda::StereoConstantSpaceBP analog): keep only
    the `nr_plane` lowest-data-cost disparity candidates per pixel and run
    BP over those planes; the smoothness term is evaluated [P, P] against
    each neighbour's plane set (stereocsbp.cu compute_message semantics).
    Memory is O(H W P) instead of O(H W D). Returns f32 [H, W]."""
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    h, w = left.shape
    cost = _data_cost(left, right, num_disparities, max_data_term, data_weight)

    neg_c, planes = lax.top_k(-cost, nr_plane)  # [H, W, P]
    sel_cost = -neg_c
    planes_f = planes.astype(jnp.float32)
    msgs = jnp.zeros((4, h, w, nr_plane), jnp.float32)
    cb = _checkerboard(h, w)

    def pass_dir(total, msgs_from, planes_f, dy, dx):
        """Outgoing message toward (dy,dx) neighbour, evaluated on the
        NEIGHBOUR's plane set, then shifted into its incoming slot."""
        src = total - msgs_from  # [H, W, P] on our planes
        # neighbour plane values, brought to our pixel grid
        npl = imgproc.shift2d(
            planes_f.transpose(2, 0, 1), -dy, -dx, fill=0.0
        ).transpose(1, 2, 0)  # [H, W, P'] (planes of the pixel at +dy,+dx)
        vdiff = jnp.abs(npl[..., None, :] - planes_f[..., :, None])  # [H,W,P,P']
        smooth = jnp.minimum(vdiff * disc_single_jump, max_disc_term)
        m = jnp.min(src[..., :, None] + smooth, axis=-2)  # [H, W, P']
        m = m - jnp.mean(m, axis=-1, keepdims=True)
        return imgproc.shift2d(m.transpose(2, 0, 1), dy, dx, fill=0.0).transpose(
            1, 2, 0
        )

    def half(msgs, mask):
        total = sel_cost + jnp.sum(msgs, axis=0)
        new = jnp.stack(
            [
                pass_dir(total, msgs[1], planes_f, 1, 0),
                pass_dir(total, msgs[0], planes_f, -1, 0),
                pass_dir(total, msgs[2], planes_f, 0, 1),
                pass_dir(total, msgs[3], planes_f, 0, -1),
            ],
            axis=0,
        )
        return jnp.where(mask[None, :, :, None], new, msgs)

    def body(_, m):
        m = half(m, cb)
        m = half(m, ~cb)
        return m

    msgs = lax.fori_loop(0, n_iters, body, msgs)
    belief = sel_cost + jnp.sum(msgs, axis=0)
    best = jnp.argmin(belief, axis=-1)
    return jnp.take_along_axis(planes_f, best[..., None], axis=-1)[..., 0]
