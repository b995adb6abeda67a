"""Feasibility probes for the fused IVF Pallas kernel:
1. large scalar-prefetch array (SMEM capacity)
2. dynamic-sublane scatter stores into a grid-revisited accumulator
3. packed-key windowed top-2 in-kernel
Runs on TPU (or CPU interpret with JAX_PLATFORMS=cpu PALLAS_INTERPRET=1).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERPRET = bool(os.environ.get("PALLAS_INTERPRET"))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("devices:", jax.devices(), flush=True)

    # --- probe 1+2: grid (nchunks, K); per (c, k) group, scatter rows of a
    # VMEM input into dynamic rows of a revisited accumulator.
    nchunks, K, BPc, LANES = 2, 64, 1024, 128
    if INTERPRET:
        nchunks, K, BPc = 2, 8, 128
    rng = np.random.default_rng(0)
    # groups: pair i of chunk c belongs to cluster i % K (sorted: i//gs)
    gs = BPc // K
    starts = np.arange(K + 1, dtype=np.int32) * gs
    starts_all = np.tile(starts, (nchunks, 1)).reshape(-1)
    perm = np.stack([rng.permutation(BPc) for _ in range(nchunks)])
    pair_pos = perm.astype(np.int32).reshape(-1)  # scatter targets
    vals = rng.normal(size=(nchunks, BPc, LANES)).astype(np.float32)

    TQ = 32

    def kernel(starts_ref, pos_ref, vals_ref, acc_ref):
        c = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[0, :, :] = jnp.full(
                (BPc, LANES), -1.0, acc_ref.dtype)

        base = c * (K + 1)
        start = starts_ref[base + k]
        count = starts_ref[base + k + 1] - start

        def tile_body(t, _):
            off = start + t * TQ

            def row_body(r, _):
                @pl.when(t * TQ + r < count)
                def _():
                    po = pos_ref[c * BPc + off + r]
                    acc_ref[0, pl.ds(po, 1), :] = (
                        vals_ref[0, pl.ds(off + r, 1), :] * 2.0
                    )
                return 0

            jax.lax.fori_loop(0, TQ, row_body, 0)
            return 0

        nt = pl.cdiv(count, TQ)
        jax.lax.fori_loop(0, nt, tile_body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks, K),
        in_specs=[
            pl.BlockSpec((1, BPc, LANES), lambda c, k, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BPc, LANES), lambda c, k, *_: (c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nchunks, BPc, LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(jnp.asarray(starts_all), jnp.asarray(pair_pos), jnp.asarray(vals))
    out = np.asarray(out)
    want = np.empty_like(vals)
    for c in range(nchunks):
        want[c, perm[c]] = vals[c] * 2.0
    ok = np.allclose(out, want)
    print("probe scatter:", "OK" if ok else "MISMATCH", flush=True)
    assert ok

    # --- probe 3: big scalar-prefetch (256 KB) compiles?
    bigN = 65536
    big = np.arange(bigN, dtype=np.int32)

    def kernel2(big_ref, x_ref, o_ref):
        i = pl.program_id(0)
        o_ref[0, 0] = x_ref[0, 0] + big_ref[i * 1000].astype(jnp.float32)

    out2 = pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(4,),
            in_specs=[pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
        ),
        interpret=INTERPRET,
    )(jnp.asarray(big), jnp.zeros((1, 1), jnp.float32))
    print("probe big-smem:", float(np.asarray(out2)[0, 0]),
          "(expect 3000.0)", flush=True)


if __name__ == "__main__":
    main()
