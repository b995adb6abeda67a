"""Fused IVF candidate kernel (Pallas TPU).

One kernel replaces the einsum -> scores-in-HBM -> regroup-gather ->
windowed-reduce chain of ``ivf_kernels._einsum_candidates``: for every
(query, probe) pair it scores the pair's cluster block on the MXU,
reduces each score row to its top-2 per ``W``-lane window on the VPU
while the scores still live in VMEM, packs (quantized score | block
position) into one int32 key, and scatters the packed winner row straight
into a query-major accumulator. The [*, Cmax] score tensor never reaches
HBM, and the cluster-major -> query-major crossing happens as VMEM row
stores instead of an XLA gather (~110 ns per gathered row on v5e — the
single most expensive stage of the XLA formulation).

Layout contract (built by the caller, ivf_kernels._fused_candidates):

* queries are processed in ``nchunks`` chunks of ``Bc`` queries; within a
  chunk, the Bc*P (query, probe) pairs are sorted by cluster;
* ``starts[c*(K+1) + k]`` — first sorted-pair index of cluster k's group
  in chunk c (classic CSR offsets, scalar-prefetched to SMEM);
* ``pair_pos[c*BPcp + i]`` — the ORIGINAL pair index (within the chunk)
  of sorted pair i: the scatter target, so the accumulator comes out in
  original (query-major) pair order and ``reshape(B, P, LANES)`` needs
  no further permutation;
* score keys: f32 score -> total-order int32 (``b ^ ((b>>31) &
  0x7FFFFFFF)``, an involution), low 11 bits replaced by the lane
  position inside the block (Cmax <= 2048). Quantizing the score to 21
  bits costs ~2^-12 relative — far below the bf16 noise already in the
  dot products.

Empty accumulator lanes stay INT32_MIN (the caller masks on it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # winners per pair, padded to one VREG row
WIN = 128  # window width: one VREG of lanes (static slice granularity)
R_WIN = 4  # winners kept per window
POS_BITS = 11
POS_MASK = (1 << POS_BITS) - 1
KEY_MIN = np.int32(np.iinfo(np.int32).min)


def _kernel(starts_ref, counts_ref, pos_ref, qp_ref, blocks_ref, bias_ref,
            acc_ref, win_ref, *, K, BPcp, BPout, Cmax, TQ, scale):
    S = Cmax // WIN  # 128-lane windows (static slices — Mosaic cannot
    # split the lane dim, so sub-128 windows are not expressible)
    c = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[0, :, :] = jnp.full((BPout, LANES), KEY_MIN, jnp.int32)

    base = c * (K + 1)
    # group starts are 8-aligned by the caller (pad rows between groups);
    # Mosaic requires provably-aligned dynamic sublane offsets
    start = pl.multiple_of(starts_ref[base + k], 8)
    count = counts_ref[base + k]
    bias = bias_ref[0, 0, :]  # f32[Cmax]

    def tile_body(t, _):
        off = pl.multiple_of(start + t * TQ, 8)
        qtile = qp_ref[0, pl.ds(off, TQ), :]  # bf16[TQ, d]
        dots = jnp.dot(
            qtile, blocks_ref[0, :, :], preferred_element_type=jnp.float32
        )  # f32[TQ, Cmax]
        s = scale * dots + bias[None, :]
        b = jax.lax.bitcast_convert_type(s, jnp.int32)
        key = b ^ jnp.right_shift(b, 31).astype(jnp.int32) & jnp.int32(
            0x7FFFFFFF
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, Cmax), 1)
        keyp = (key & jnp.int32(~POS_MASK)) | (lane & jnp.int32(POS_MASK))
        # top-R_WIN per 128-lane window: R_WIN masked max passes, each a
        # full-lane reduce over a static 128-aligned slice (supported ops
        # only). Window capacity R_WIN*S covers k by the caller's guard.
        # Winners assemble into one [TQ, LANES] vreg by masked lane
        # writes (concatenating 1-lane vectors would relayout per lane).
        lane_out = jax.lax.broadcasted_iota(jnp.int32, (TQ, LANES), 1)
        win = jnp.full((TQ, LANES), KEY_MIN, jnp.int32)
        for w in range(S):
            sub = keyp[:, w * WIN:(w + 1) * WIN]
            for r_i in range(R_WIN):
                m = jnp.max(sub, axis=1, keepdims=True)  # [TQ, 1]
                win = jnp.where(
                    lane_out == (w * R_WIN + r_i), m, win)
                sub = jnp.where(sub == m, KEY_MIN, sub)
        win_ref[:, :] = win  # staged so rows can be read dynamically

        def row_body(r, _):
            @pl.when(t * TQ + r < count)
            def _():
                po = pos_ref[c * BPcp + off + r]
                acc_ref[0, pl.ds(po, 1), :] = win_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, TQ, row_body, 0)
        return 0

    nt = pl.cdiv(count, TQ)
    jax.lax.fori_loop(0, nt, tile_body, 0)


@partial(
    jax.jit,
    static_argnames=("K", "Cmax", "BPout", "TQ", "scale", "interpret"),
)
def fused_block_topw(
    starts: jax.Array,  # i32[nchunks*(K+1)] 8-aligned CSR group offsets
    counts: jax.Array,  # i32[nchunks*(K+1)] REAL group sizes (pad excl.)
    pair_pos: jax.Array,  # i32[nchunks*BPcp] scatter targets (orig order)
    qp: jax.Array,  # bf16[nchunks, BPcp, d] chunk-sorted query residuals
    blocks_t: jax.Array,  # bf16[K, d, Cmax]
    bias: jax.Array,  # f32[K, Cmax]  (keep ? -|v-c|^2 : -BIG)
    *,
    K: int,
    Cmax: int,
    BPout: int,
    TQ: int = 32,
    scale: float = 2.0,
    interpret: bool = False,
):
    """Packed int32 winner keys [nchunks, BPout, 128] in original pair
    order (see module docstring); BPout = real pairs + 8 dump rows."""
    nchunks, BPcp, d = qp.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks, K),
        in_specs=[
            pl.BlockSpec((1, BPcp, d), lambda c, k, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, Cmax), lambda c, k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cmax), lambda c, k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BPout, LANES), lambda c, k, *_: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TQ, LANES), jnp.int32)],
    )
    return pl.pallas_call(
        partial(_kernel, K=K, BPcp=BPcp, BPout=BPout, Cmax=Cmax, TQ=TQ,
                scale=scale),
        out_shape=jax.ShapeDtypeStruct((nchunks, BPout, LANES), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, counts, pair_pos, qp, blocks_t, bias[:, None, :])


def unpack_keys(acc: jax.Array):
    """(score f32, pos i32) from packed keys; KEY_MIN lanes -> -inf."""
    keym = acc & jnp.int32(~POS_MASK)
    b = keym ^ jnp.right_shift(keym, 31).astype(jnp.int32) & jnp.int32(
        0x7FFFFFFF
    )
    score = jax.lax.bitcast_convert_type(b, jnp.float32)
    pos = acc & jnp.int32(POS_MASK)
    valid = acc != KEY_MIN
    return jnp.where(valid, score, -jnp.inf), pos, valid
