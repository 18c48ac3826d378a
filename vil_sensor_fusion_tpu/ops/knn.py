"""K-nearest-neighbor search kernels for ICP correspondence.

The LOAM fork does this with per-submap KD-trees on CPU; on TPU the right
shape is brute force on the MXU: ‖q−t‖² = ‖q‖² − 2·q·tᵀ + ‖t‖² makes the
distance computation a matmul, and K=5 selection is a handful of vectorized
min-extractions — no tree, no pointer chasing, fully batched.

Two implementations with identical semantics:

- :func:`knn_xla` — pure XLA: scan over target chunks with a running
  sorted-merge of per-chunk minima. Never materializes more than a
  (QB, CB) distance tile, so memory stays flat regardless of map size.
- :func:`knn_pallas` — the same algorithm as a single Pallas kernel: the
  query block and the whole target set live in VMEM, the distance tile is
  produced and consumed in registers/VMEM without an HBM round-trip, and the
  K-selection is fused behind the matmul.

Both return (idx (Q,K) int32, dist² (Q,K)) sorted ascending, with masked
targets at +inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_DEFAULT = 5
QUERY_BLOCK = 128
TARGET_BLOCK = 512


def _extract_k_minima(d: jnp.ndarray, col_offset, k: int):
    """K smallest per row of (B, C) + their (global) column indices.
    Argmin emulated with a masked index-min so it lowers everywhere
    (Pallas included)."""
    B, C = d.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    big_i = jnp.asarray(2**30, jnp.int32)
    mins, idxs = [], []
    for _ in range(k):
        mn = jnp.min(d, axis=1)
        is_min = d == mn[:, None]
        am = jnp.min(jnp.where(is_min, cols, big_i), axis=1)
        mins.append(mn)
        idxs.append((am + col_offset).astype(jnp.int32))
        d = jnp.where(cols == am[:, None], jnp.inf, d)
    return jnp.stack(mins, axis=1), jnp.stack(idxs, axis=1)   # (B, k)


def _merge_sorted(best_d, best_i, new_d, new_i, k: int):
    """Merge two (B, k) ascending lists → best (B, k)."""
    d = jnp.concatenate([best_d, new_d], axis=1)              # (B, 2k)
    i = jnp.concatenate([best_i, new_i], axis=1)
    B = d.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * k), 1)
    big_i = jnp.asarray(2**30, jnp.int32)
    out_d, out_i = [], []
    for _ in range(k):
        mn = jnp.min(d, axis=1)
        is_min = d == mn[:, None]
        am = jnp.min(jnp.where(is_min, cols, big_i), axis=1)
        val_i = jnp.sum(jnp.where(cols == am[:, None], i, 0),
                        axis=1).astype(jnp.int32)
        out_d.append(mn)
        out_i.append(val_i)
        d = jnp.where(cols == am[:, None], jnp.inf, d)
    return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1)


def _dist_tile(q, t_chunk, t_sq_chunk, t_mask_chunk):
    d = (jnp.sum(q * q, axis=1)[:, None]
         - 2.0 * jnp.dot(q, t_chunk.T, preferred_element_type=jnp.float32)
         + t_sq_chunk[None, :])
    return jnp.where(t_mask_chunk[None, :] > 0, d, jnp.inf)


def knn_xla(
    queries: jnp.ndarray,
    targets: jnp.ndarray,
    t_mask: jnp.ndarray,
    k: int = K_DEFAULT,
    target_block: int = TARGET_BLOCK,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    Q = queries.shape[0]
    M = targets.shape[0]
    padM = (-M) % target_block
    t = jnp.pad(targets, ((0, padM), (0, 0)))
    tm = jnp.pad(t_mask, (0, padM))
    t_sq = jnp.sum(t * t, axis=-1)
    n_chunks = t.shape[0] // target_block

    tc = t.reshape(n_chunks, target_block, 3)
    tsqc = t_sq.reshape(n_chunks, target_block)
    tmc = tm.reshape(n_chunks, target_block)

    def body(carry, x):
        best_d, best_i = carry
        t_chunk, tsq_chunk, tm_chunk, off = x
        d = _dist_tile(queries, t_chunk, tsq_chunk, tm_chunk)
        nd, ni = _extract_k_minima(d, off, k)
        return _merge_sorted(best_d, best_i, nd, ni, k), None

    init = (jnp.full((Q, k), jnp.inf, queries.dtype),
            jnp.zeros((Q, k), jnp.int32))
    offs = jnp.arange(n_chunks, dtype=jnp.int32) * target_block
    (best_d, best_i), _ = jax.lax.scan(body, init, (tc, tsqc, tmc, offs))
    return best_i, best_d


def _knn_kernel(q_ref, t_ref, tsq_ref, idx_ref, dist_ref, *, k: int,
                select_bf16: bool):
    """Per-query-block kernel, full-row formulation:

    - ``q_ref``   (QB, 8): queries, coordinate dim zero-padded 3→8 so the
      matmul maps onto a full sublane tile.
    - ``t_ref``   (8, M): ALL targets transposed — one (QB, 8) @ (8, M)
      MXU matmul produces the entire (QB, M) distance tile in VMEM.
    - ``tsq_ref`` (1, M): ‖t‖² row, +inf at masked targets.

    K-selection is k wide VPU passes over the full row (min, masked
    index-min, mask-out) — a handful of big vector reductions instead of
    the per-chunk merge cascade of the old kernel (which was ~10 small
    reductions × 32 chunks, pure latency).

    ``select_bf16``: run the selection passes on a bfloat16 copy of the
    distance tile (halves the bandwidth of the dominant part; ranking
    perturbed only between near-equal neighbors). NOTE: as of this
    libtpu/Mosaic version the bf16 compare-broadcast pattern fails to
    lower on real TPUs ("Invalid relayout … vector<…xi1>"; bf16 argmin is
    likewise unsupported), so the option is OFF by default and exercised
    only in interpreter mode — kept as the switch to flip when Mosaic
    gains bf16 mask layouts."""
    q = q_ref[:]                           # (QB, 8)
    QB = q.shape[0]
    M = t_ref.shape[1]
    q_sq = jnp.sum(q * q, axis=1)[:, None]
    d = (q_sq
         - 2.0 * jnp.dot(q, t_ref[:], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
         + tsq_ref[:])                     # (QB, M); masked cols -> +inf
    # (explicit precision: Mosaic rejects the global 'high' 3-pass setting;
    # the 8-deep contraction is cheap at full f32 anyway)
    if select_bf16:
        d = d.astype(jnp.bfloat16)
    cols = jax.lax.broadcasted_iota(jnp.int32, (QB, M), 1)
    big_i = jnp.asarray(2**30, jnp.int32)
    inf = jnp.asarray(jnp.inf, d.dtype)
    for j in range(k):
        mn = jnp.min(d, axis=1)                            # (QB,)
        is_min = d == mn[:, None]
        am = jnp.min(jnp.where(is_min, cols, big_i), axis=1)
        idx_ref[:, j] = am
        dist_ref[:, j] = mn.astype(jnp.float32)
        d = jnp.where(cols == am[:, None], inf, d)


def knn_pallas(
    queries: jnp.ndarray,
    targets: jnp.ndarray,
    t_mask: jnp.ndarray,
    k: int = K_DEFAULT,
    query_block: int = 64,
    interpret: bool = False,
    select_bf16: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact fused KNN: the (QB, M) distance tile lives entirely in VMEM —
    produced by one MXU matmul and consumed by k wide selection passes, no
    HBM round-trip for the tile. ``query_block`` bounds VMEM at
    QB·M·4 bytes (64×16384 = 4 MB). ``select_bf16`` currently only lowers
    in interpreter mode (see kernel docstring)."""
    Q = queries.shape[0]
    M = targets.shape[0]
    padQ = (-Q) % query_block
    padM = (-M) % 512
    q = jnp.pad(queries.astype(jnp.float32), ((0, padQ), (0, 5)))
    t = jnp.pad(targets.astype(jnp.float32), ((0, padM), (0, 5)))
    tm = jnp.pad(t_mask.astype(jnp.float32), (0, padM))
    # Fold the target mask into the ‖t‖² row: masked columns become +inf
    # before the kernel ever sees them (one fewer VMEM operand + one fewer
    # vector op per row).
    t_sq = jnp.where(tm > 0, jnp.sum(t * t, axis=-1), jnp.inf)
    n_q_blocks = q.shape[0] // query_block
    Mp = t.shape[0]

    kernel = functools.partial(_knn_kernel, k=k, select_bf16=select_bf16)
    idx, dist = pl.pallas_call(
        kernel,
        grid=(n_q_blocks,),
        in_specs=[
            pl.BlockSpec((query_block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((query_block, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_block, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], k), jnp.int32),
            jax.ShapeDtypeStruct((q.shape[0], k), jnp.float32),
        ],
        interpret=interpret,
    )(q, t.T, t_sq[None, :])
    return idx[:Q], dist[:Q].astype(queries.dtype)


def knn_topk(
    queries: jnp.ndarray,
    targets: jnp.ndarray,
    t_mask: jnp.ndarray,
    k: int = K_DEFAULT,
    query_chunk: int = QUERY_BLOCK,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Simple variant: full distance rows + lax.top_k per query chunk.
    Fastest on CPU (XLA's sort-based top_k beats the extraction loop there);
    materializes (chunk, M) tiles, so memory grows with the map size."""
    t_sq = jnp.sum(targets * targets, axis=-1)
    inf = jnp.asarray(jnp.inf, queries.dtype)
    Q = queries.shape[0]
    pad = (-Q) % query_chunk
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    chunks = q.reshape(-1, query_chunk, 3)

    def one(qc):
        d = (jnp.sum(qc * qc, axis=-1)[:, None]
             - 2.0 * qc @ targets.T + t_sq[None, :])
        d = jnp.where(t_mask[None, :] > 0, d, inf)
        neg, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32), -neg

    idx, d2 = jax.lax.map(one, chunks)
    return (idx.reshape(-1, k)[:Q], d2.reshape(-1, k)[:Q])


def knn_approx(
    queries: jnp.ndarray,
    targets: jnp.ndarray,
    t_mask: jnp.ndarray,
    k: int = K_DEFAULT,
    query_chunk: int = 2048,
    recall_target: float = 0.95,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """TPU-optimized approximate KNN: full distance rows reduced with
    ``jax.lax.approx_max_k`` (the hardware PartialReduce top-k). Measured
    (dispatch-free) 6× faster than the exact Pallas kernel at ICP map
    shapes (88 µs vs 526 µs at 3984×8192, v5e; query_chunk=2048 is the
    sweet spot — 110 µs vs 214 µs at 1024) with ≥0.95 neighbor recall —
    and a missed 5th neighbor only perturbs a 5-point line/plane fit that
    the eligibility gates re-validate anyway."""
    t_sq = jnp.sum(targets * targets, axis=-1)
    inf = jnp.asarray(jnp.inf, queries.dtype)
    Q = queries.shape[0]
    # Never pad a small query set up to a full chunk (a 192-query
    # odometry-stage search would otherwise run a 2048-row tile — 10x
    # wasted VPU work); 128 rows is the lane-tile floor.
    query_chunk = min(query_chunk, max(-(-Q // 128) * 128, 128))
    pad = (-Q) % query_chunk
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    chunks = q.reshape(-1, query_chunk, 3)

    def one(qc):
        d = (jnp.sum(qc * qc, axis=-1)[:, None]
             - 2.0 * qc @ targets.T + t_sq[None, :])
        d = jnp.where(t_mask[None, :] > 0, d, inf)
        neg, idx = jax.lax.approx_max_k(-d, k,
                                        recall_target=recall_target)
        return idx.astype(jnp.int32), -neg

    idx, d2 = jax.lax.map(one, chunks)
    return (idx.reshape(-1, k)[:Q], d2.reshape(-1, k)[:Q])


PALLAS_MAX_TARGETS = 16384   # (QB=64, M) distance tile + iota ≤ 8 MB VMEM


def knn(
    queries: jnp.ndarray,
    targets: jnp.ndarray,
    t_mask: jnp.ndarray,
    k: int = K_DEFAULT,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch: hardware approx-top-k on TPU — dispatch-free (rep-count
    differenced) v5e measurements at the registration shapes put it well
    ahead of the exact kernels (3984×8192: approx 88 µs vs Pallas 526 µs
    vs XLA ~2 ms; 1920×4096: ~45 µs vs 141 µs): the PartialReduce unit
    collapses each distance row in ~one pass where the Pallas kernel pays
    k explicit min/argmin/mask passes over the VMEM tile. Its ≥0.95
    per-neighbor recall only perturbs 5-point line/plane fits that the
    eligibility gates re-validate. ``VIL_KNN=pallas|xla|approx`` forces a
    path (the exact Pallas kernel remains the parity reference on TPU);
    sort-based top_k on CPU, chunked-scan XLA elsewhere."""
    import os

    platform = jax.devices()[0].platform
    force = os.environ.get("VIL_KNN", "")
    if platform == "tpu":
        if force == "pallas" and targets.shape[0] <= PALLAS_MAX_TARGETS:
            return knn_pallas(queries, targets, t_mask, k)
        if force == "xla":
            return knn_xla(queries, targets, t_mask, k)
        return knn_approx(queries, targets, t_mask, k)
    if platform == "cpu":
        return knn_topk(queries, targets, t_mask, k)
    return knn_xla(queries, targets, t_mask, k)
