"""Pallas fused flat-scan top-k — the speed-of-light exact-engine kernel.

The XLA path (ops/scan.py) materializes the [B, N] score matrix in HBM
between the matmul and the top-k custom call — at B=1024, N=1M that is 8 GB
of round-trip traffic, 25x the corpus itself. This kernel streams the corpus
through VMEM tile by tile and keeps the running top-k on-chip, so HBM traffic
collapses to reading each vector exactly once (the TPU-KNN recipe,
PAPERS.md):

  per grid step (one corpus tile):
    MXU:  s = q @ v_tile^T                         [B, T] in VMEM
    VPU:  score = s * vscale + vshift, masked       (metric-generic affine)
    VPU:  128-lane segment max + arg                [B, T/128]
    VPU:  merge segment winners into running top-k  [B, R] scratch-persistent

Segment-max is the controlled approximation (same mechanism as XLA's
ApproxTopK): a true top-k item is lost only when two of them share one
128-lane segment of the same tile — probability ~ (k-1)*128/(2N) per item,
i.e. recall > 0.999 for k=10 at N >= 256k. The per-row constant part of each
distance (q-norms) cancels in ranking and is reconstructed outside.

The reference's equivalent is a scalar Go loop + sort (pkg/hybrid/
exact.go:92-133); see /opt/skills/guides/pallas_guide.md for the kernel
idioms used.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quiver_tpu.ops.distance import inv_norms, norms_sq
from quiver_tpu.ops.scan import MASKED_DIST
from quiver_tpu.types import DistanceType

LANES = 128
NEG_BIG = -3.0e38  # plain float: jnp scalars would be captured consts in Pallas


def _scan_kernel(q_ref, v_ref, vscale_ref, vshift_ref, mask_ref,
                 out_d_ref, out_i_ref, *, b, tile, r, compute_dtype):
    i = pl.program_id(0)
    segs = tile // LANES

    @pl.when(i == 0)
    def _():
        out_d_ref[:] = jnp.full((b, r), NEG_BIG, jnp.float32)
        out_i_ref[:] = jnp.full((b, r), -1, jnp.int32)

    # MXU: [B, d] x [T, d]^T -> [B, T] (f32 accumulation)
    s = jax.lax.dot_general(
        q_ref[:].astype(compute_dtype),
        v_ref[:].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # metric-generic affine score (larger is better) + mask fuse
    score = s * vscale_ref[:] + vshift_ref[:]
    score = jnp.where(mask_ref[:] > 0, score, NEG_BIG)

    # 128-lane segment max + argmax (iota trick; >=2D iota required on TPU)
    s3 = score.reshape(b, segs, LANES)
    smax = jnp.max(s3, axis=2)  # [B, S]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, segs, LANES), 2)
    scol = jnp.max(
        jnp.where(s3 >= smax[:, :, None], lane, -1), axis=2
    )  # [B, S]
    seg = jax.lax.broadcasted_iota(jnp.int32, (b, segs), 1)
    gidx = i * tile + seg * LANES + scol  # [B, S] global row ids
    gidx = jnp.where(smax > NEG_BIG, gidx, -1)

    # merge running top-R with this tile's segment winners
    ext_d = jnp.concatenate([out_d_ref[:], smax], axis=1)  # [B, R+S]
    ext_i = jnp.concatenate([out_i_ref[:], gidx], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, ext_d.shape, 1)
    new_d = []
    new_i = []
    cur = ext_d
    for _ in range(r):
        m = jnp.max(cur, axis=1)  # [B]
        sel_col = jnp.max(jnp.where(cur >= m[:, None], cols, -1), axis=1)
        hit = cols == sel_col[:, None]
        picked_i = jnp.max(jnp.where(hit, ext_i, -1), axis=1)
        new_d.append(m)
        new_i.append(jnp.where(m > NEG_BIG, picked_i, -1))
        cur = jnp.where(hit, NEG_BIG, cur)
    out_d_ref[:] = jnp.stack(new_d, axis=1)
    out_i_ref[:] = jnp.stack(new_i, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "tile", "compute_dtype", "interpret"),
)
def pallas_scan_topk(
    q: jax.Array,  # f32[B, d]
    vectors: jax.Array,  # [cap, d] f32 or bf16
    valid: jax.Array,  # bool[cap]
    mask: jax.Array | None,  # bool[cap] or None
    v_norms_sq: jax.Array,  # f32[cap]
    v_inv_norms: jax.Array,  # f32[cap]
    *,
    metric: str,
    k: int,
    tile: int = 2048,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused streaming scan. Returns (dist f32[B, k], idx i32[B, k]) sorted
    ascending; empty slots idx -1. Manhattan is not expressible as one
    matmul — callers route it to the XLA path."""
    metric = DistanceType.parse(metric)
    if metric == DistanceType.MANHATTAN:
        raise ValueError("manhattan is served by the XLA scan path")
    B, d = q.shape
    cap = vectors.shape[0]
    # auto-shrink the tile so the [B, tile] f32 score block + double-buffered
    # v tile fit the ~16 MB VMEM budget at any batch size
    B_pad8 = -(-B // 8) * 8
    score_budget = 6 * 1024 * 1024
    while tile > LANES and B_pad8 * tile * 4 > score_budget:
        tile //= 2
    if cap % tile != 0 or tile % LANES != 0:
        raise ValueError(f"capacity {cap} must tile by {tile} (x{LANES})")
    n_tiles = cap // tile
    segs = tile // LANES
    r = min(max(k, 8), segs * n_tiles)

    # pad B to the f32 sublane multiple
    B_pad = -(-B // 8) * 8
    qp = jnp.pad(q.astype(jnp.float32), ((0, B_pad - B), (0, 0)))

    # metric-generic affine row vectors: score = (q.v) * vscale + vshift
    if metric == DistanceType.COSINE:
        vscale, vshift = v_inv_norms, jnp.zeros_like(v_norms_sq)
    elif metric == DistanceType.DOT_PRODUCT:
        vscale = jnp.ones_like(v_norms_sq)
        vshift = jnp.zeros_like(v_norms_sq)
    else:  # euclidean / squared euclidean: score = 2 q.v - ||v||^2
        vscale = jnp.full_like(v_norms_sq, 2.0)
        vshift = -v_norms_sq
    keep = valid if mask is None else (valid & mask)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B_pad, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_pad, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(
        _scan_kernel, b=B_pad, tile=tile, r=r, compute_dtype=compute_dtype
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, r), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, r), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * cap * d,
            bytes_accessed=cap * d * vectors.dtype.itemsize + B_pad * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        qp,
        vectors,
        vscale.reshape(1, cap),
        vshift.reshape(1, cap),
        keep.astype(jnp.float32).reshape(1, cap),
        )

    out_d = out_d[:B]
    out_i = out_i[:B]
    # exact f32 rescoring of the R survivors (TPU-KNN style): the bf16 scores
    # only decide WHO survives; reported distances and final order are exact
    from quiver_tpu.ops.distance import distance_pairs

    surv = vectors[jnp.maximum(out_i, 0)].astype(jnp.float32)  # [B, R, d]
    qb = jnp.broadcast_to(q[:, None, :], surv.shape).reshape(-1, d)
    dist = distance_pairs(qb, surv.reshape(-1, d), metric).reshape(B, r)
    dist = jnp.where(out_i >= 0, dist, MASKED_DIST)
    # final exact ordering of the R survivors, truncated to k
    neg_top, sel = jax.lax.top_k(-dist, min(k, r))
    out = (-neg_top, jnp.take_along_axis(out_i, sel, axis=1))
    if k > r:  # degenerate tiny-capacity case
        pad = k - r
        out = (
            jnp.pad(out[0], ((0, 0), (0, pad)), constant_values=MASKED_DIST),
            jnp.pad(out[1], ((0, 0), (0, pad)), constant_values=-1),
        )
    return out
