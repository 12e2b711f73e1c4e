"""Grid graph cuts via parallel push-relabel — min-cut binary labeling.

Reference: cudalegacy/src/graphcuts.cpp (cuda::graphcut over NPP) and
the stitching module's GraphCutSeamFinder (stitching/src/seam_finders.cpp)
— both solve s-t min-cut on a 4-connected image grid.

TPU-native design: push-relabel is the PARALLEL max-flow algorithm —
every active node can push/relabel simultaneously — so the whole solver
is masked whole-image updates inside one `lax.while_loop`:
  * push: for each of 4 directions, send min(excess, residual) downhill
    (height difference exactly 1), implemented as shifted adds;
  * relabel: nodes with excess and no admissible edge raise their height
    to 1 + min admissible neighbour height;
  * termination: no active node below height n (the standard first-phase
    stop — the min-cut is determined once no excess can reach the sink).
Source/sink capacities fold into the initial excess (positive = source
surplus, negative = sink appetite), the grid-textbook formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIRS = ((-1, 0), (1, 0), (0, -1), (0, 1))
# 8-connected extension (grabcut's diagonal N-links); opposite pairs
# stay adjacent so opp[k] = k ^ 1
_DIRS8 = _DIRS + ((-1, -1), (1, 1), (-1, 1), (1, -1))


def _shift(x, dy, dx, fill):
    from opencv_tpu.core import imgproc

    return imgproc.shift2d(x, dy, dx, fill=fill)


def min_cut_grid(
    source_cap: jnp.ndarray,
    sink_cap: jnp.ndarray,
    edge_caps: jnp.ndarray,
    max_sweeps: int = 4096,
) -> jnp.ndarray:
    """Binary min-cut labels (True = source side).

    source_cap/sink_cap: [H, W] >= 0 terminal capacities (unary terms);
    edge_caps: [K, H, W] with K=4 (up, down, left, right) or K=8
    (+ the _DIRS8 diagonals) capacity toward each neighbour (pairwise
    terms; symmetric input expected).
    """
    h, w = source_cap.shape
    n = h * w + 2
    inf = jnp.float32(1e18)

    k_dirs = edge_caps.shape[0]
    assert k_dirs in (4, 8), k_dirs
    dirs = _DIRS8[:k_dirs]

    # residuals toward each direction; reverse residual lives in the
    # neighbour's opposite slot
    res = edge_caps.astype(jnp.float32)
    # t-link preflow: saturate both terminals; excess = s - t, a node
    # with negative excess still "absorbs" that much flow into the sink
    excess = source_cap.astype(jnp.float32) - sink_cap.astype(jnp.float32)
    height = jnp.zeros((h, w), jnp.int32)

    opp = [k ^ 1 for k in range(k_dirs)]

    def active(excess, height):
        return (excess > 0) & (height < n)

    def body(state):
        excess, height, res, _ = state
        # --- push phase (4 directions, sequential within a sweep so
        # flow conservation holds; each is a fused whole-image op)
        for k, (dy, dx) in enumerate(dirs):
            # shift2d(x, dy, dx)[p] == x[p + (dy, dx)]: the neighbour in
            # direction (dy, dx) reads with a POSITIVE shift
            nb_h = _shift(height, dy, dx, n)
            can = active(excess, height) & (height == nb_h + 1) & (res[k] > 0)
            amt = jnp.where(can, jnp.minimum(excess, res[k]), 0.0)
            excess = excess - amt
            res = res.at[k].add(-amt)
            # flow pushed by p lands at p + (dy, dx): negative shift
            arrived = _shift(amt, -dy, -dx, 0.0)
            excess = excess + arrived
            res = res.at[opp[k]].add(arrived)

        # --- relabel phase: nodes with excess but no admissible edge
        min_h = jnp.full((h, w), n, jnp.int32)
        for k, (dy, dx) in enumerate(dirs):
            nb_h = _shift(height, dy, dx, n)
            min_h = jnp.where(res[k] > 0, jnp.minimum(min_h, nb_h + 1), min_h)
        need = active(excess, height)
        new_height = jnp.where(need, jnp.maximum(height, min_h), height)
        progressed = jnp.any(new_height != height) | jnp.any(excess > 0)
        # a sweep with no relabel and no remaining pushable excess is done
        done = ~jnp.any(active(excess, new_height))
        return excess, new_height, res, done

    def cond(state):
        *_, done = state
        return ~done

    state = (excess, height, res, jnp.bool_(False))
    # bounded while loop: push-relabel terminates in O(V^2 E) sweeps in
    # theory, a few hundred in practice; cap as a safety net
    def bounded_body(carry):
        i, st = carry
        st = body(st)
        return i + 1, st

    def bounded_cond(carry):
        i, st = carry
        return (i < max_sweeps) & cond(st)

    _, (excess, height, res, _) = lax.while_loop(
        bounded_cond, bounded_body, (jnp.int32(0), state)
    )

    # source side = nodes that cannot reach the sink = height >= n is the
    # usual certificate; after convergence, reachability from the sink in
    # the residual graph is the robust label — compute it by BFS-style
    # propagation: sink-reachable nodes absorb via edges with residual
    # toward them
    reach = excess < 0  # nodes still wanting sink flow touch the sink
    def reach_body(state):
        reach, changed = state
        new = reach
        for k, (dy, dx) in enumerate(dirs):
            # node p reaches the sink if residual from p toward a
            # reachable neighbour exists
            nb_reach = _shift(reach, dy, dx, False)
            new = new | (nb_reach & (res[k] > 0))
        return new, jnp.any(new != reach)

    reach, _ = lax.while_loop(
        lambda s: s[1],
        lambda s: reach_body(s),
        (reach, jnp.bool_(True)),
    )
    return ~reach


def seam_find_graphcut(
    img0: jnp.ndarray, m0: jnp.ndarray, img1: jnp.ndarray, m1: jnp.ndarray,
    smooth_weight: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Graph-cut seam between two overlapping warped images
    (GraphCutSeamFinder COST_COLOR analog): pixels exclusive to one
    image are hard-assigned; in the overlap the pairwise cost is the
    color difference across the cut."""
    overlap = m0 & m1
    big = jnp.float32(1e6)
    src = jnp.where(m0 & ~m1, big, 0.0)
    snk = jnp.where(m1 & ~m0, big, 0.0)
    diff = jnp.abs(img0 - img1)
    edges = []
    for dy, dx in _DIRS:
        nb = _shift(diff, dy, dx, 0.0)
        cap = smooth_weight * 0.5 * (diff + nb) + 1e-3
        both = overlap & _shift(overlap, dy, dx, False)
        edges.append(jnp.where(both, cap, big))
    labels = min_cut_grid(src, snk, jnp.stack(edges))
    new0 = m0 & (labels | ~m1)
    new1 = m1 & (~labels | ~m0)
    return new0, new1
