"""Device cost of lax.ragged_dot (grouped matmul) at IVF shapes — the
MoE-style formulation: queries sorted by probed cluster = tokens sorted by
expert, cluster blocks = expert weights. Plus the downstream per-pair
approx reduce and the qp gather."""

import sys
import os
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L_FIX, DEPTH = 8, 3


def wall(fn, depth=DEPTH):
    outs = [fn() for _ in range(2)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(depth)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    return (time.perf_counter() - t0) / depth


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    K, Cmax, D, P = 4939, 384, 128, 8

    def measure(step, args, name):
        @partial(jax.jit, static_argnames=("L",))
        def loop(c, *arrays, L):
            def body(c, _):
                return step(c, *arrays), None
            c, _ = jax.lax.scan(body, c, None, length=L)
            return c
        per = wall(lambda: loop(jnp.float32(0), *args, L=L_FIX)) * 1e3 / L_FIX
        print(f"{name:52s} ~device {per:8.3f} ms", flush=True)

    for B in (2048, 16384):
        BP = B * P
        # balanced-ish group sizes summing to BP
        gs = np.random.default_rng(1).multinomial(BP, np.ones(K) / K)
        group_sizes = jnp.asarray(gs.astype(np.int32))
        qp = jnp.asarray(rng.normal(size=(BP, D)).astype(np.float32),
                         dtype=jnp.bfloat16)
        blocks_t = jnp.asarray(
            rng.normal(size=(K, D, Cmax)).astype(np.float32),
            dtype=jnp.bfloat16)

        def rd(c, qp, blocks_t, group_sizes):
            out = jax.lax.ragged_dot(
                qp + c.astype(jnp.bfloat16), blocks_t, group_sizes,
                preferred_element_type=jnp.float32)
            return c + jnp.sum(out) * 1e-30
        measure(rd, (qp, blocks_t, group_sizes), f"B={B} ragged_dot [BP={BP},{D}]x[{K},{D},{Cmax}]")

        def rd_bf16out(c, qp, blocks_t, group_sizes):
            out = jax.lax.ragged_dot(
                qp + c.astype(jnp.bfloat16), blocks_t, group_sizes,
                preferred_element_type=jnp.bfloat16)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-30
        measure(rd_bf16out, (qp, blocks_t, group_sizes), f"B={B} ragged_dot bf16 out")

        def rd_reduce(c, qp, blocks_t, group_sizes):
            out = jax.lax.ragged_dot(
                qp + c.astype(jnp.bfloat16), blocks_t, group_sizes,
                preferred_element_type=jnp.float32)
            s, i = jax.lax.approx_max_k(out, 16, recall_target=0.98)
            return c + (jnp.sum(s) + jnp.sum(i.astype(jnp.float32))) * 1e-30
        measure(rd_reduce, (qp, blocks_t, group_sizes),
                f"B={B} ragged_dot + approx16 [BP,{Cmax}]")

        # qp gather: pair-sorted rows of q (bf16)
        q16 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32),
                          dtype=jnp.bfloat16)
        b_of = jnp.asarray(rng.integers(0, B, BP).astype(np.int32))

        def qgather(c, q16, b_of):
            qp2 = q16[b_of] + c.astype(jnp.bfloat16)
            return c + jnp.sum(qp2.astype(jnp.float32)) * 1e-30
        measure(qgather, (q16, b_of), f"B={B} qp gather [BP,{D}] bf16")


if __name__ == "__main__":
    main()
