"""Map-sharded descriptor matching: match queries against a landmark map
larger than one device's appetite.

SURVEY.md §5 ("long-context" note): matching a frame against a large map
is the engine's ring-attention analog — the train (map) descriptors are
sharded over the model axis, each device computes its local Hamming
block + local top-2, and a lightweight all-gather of the per-shard top-2
candidates (k*D values per query, NOT the full distance row) is reduced
to the global 2-NN. Equivalent to the reference's multi-image
DescriptorCollection matching (features2d/src/matchers.cpp:420-527) but
with the collection spread across chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from opencv_tpu.core.config import MatchConfig
from opencv_tpu.core.types import Matches
from opencv_tpu.ops import matching
from opencv_tpu.parallel.mesh import MODEL_AXIS


def sharded_knn_match(
    query: jnp.ndarray,
    train: jnp.ndarray,
    mesh: Mesh,
    query_valid: jnp.ndarray | None = None,
    train_valid: jnp.ndarray | None = None,
    config: MatchConfig = MatchConfig(),
) -> Matches:
    """2-NN + ratio test with `train` sharded over MODEL_AXIS.

    train length must divide by the model-axis size. Cross-check is
    applied against the *global* best (each train shard knows its local
    argmin over queries, which is exact for the winning shard).
    """
    nq = query.shape[0]
    nt = train.shape[0]
    n_dev = mesh.shape[MODEL_AXIS]
    assert nt % n_dev == 0, f"pad train ({nt}) to a multiple of {n_dev}"
    if query_valid is None:
        query_valid = jnp.ones((nq,), bool)
    if train_valid is None:
        train_valid = jnp.ones((nt,), bool)
    shard_len = nt // n_dev

    def local(query, qv, train_shard, tv_shard):
        dist = matching.hamming_matrix(query, train_shard, qv, tv_shard)
        neg2, idx2 = jax.lax.top_k(-dist, 2)  # [Nq,2] local 2-NN
        # offset local indices into global train space
        shard_id = jax.lax.axis_index(MODEL_AXIS)
        gidx = idx2 + shard_id * shard_len
        # local best query per train row (for cross-check)
        best_q = jnp.argmin(dist, axis=0)  # [shard_len]
        # gather candidates from all shards: [D, Nq, 2]
        all_d = jax.lax.all_gather(-neg2, MODEL_AXIS)
        all_i = jax.lax.all_gather(gidx, MODEL_AXIS)
        best_q_all = jax.lax.all_gather(best_q, MODEL_AXIS)  # [D, shard_len]
        return all_d, all_i, best_q_all

    all_d, all_i, best_q_all = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(MODEL_AXIS), P(MODEL_AXIS)),
        out_specs=(P(), P(), P()),
        # outputs are replicated by the all_gathers; the static VMA
        # checker can't see that through lax.all_gather
        check_vma=False,
    )(query, query_valid, train, train_valid)

    # merge: global 2-NN over D*2 candidates per query
    cand_d = jnp.moveaxis(all_d, 0, 1).reshape(nq, -1)  # [Nq, 2D]
    cand_i = jnp.moveaxis(all_i, 0, 1).reshape(nq, -1)
    neg2, pos = jax.lax.top_k(-cand_d, 2)
    d1, d2 = -neg2[:, 0], -neg2[:, 1]
    best = jnp.take_along_axis(cand_i, pos[:, :1], axis=1)[:, 0]

    ok = (d1 <= config.max_distance) & (d1 < config.ratio * d2) & query_valid
    if config.cross_check:
        best_q_flat = best_q_all.reshape(-1)  # [Nt] global (shard-major)
        ok &= best_q_flat[best] == jnp.arange(nq)
    return Matches(
        query_idx=jnp.arange(nq, dtype=jnp.int32),
        train_idx=best.astype(jnp.int32),
        distance=d1,
        valid=ok,
    )
