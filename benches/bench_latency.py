"""Latency axis for the bench matrix (VERDICT r3 next #2).

Every recorded repo number was throughput; the reference's headline is a
latency (6,705 ns/op single search — /root/reference/final_bench.txt:19).
This bench records, on the 1M x 128-d corpus:

* device-side per-batch latency at B in {1, 128, 2048, 65536} for the IVF
  serving engine and the exact scan — chained-scan methodology (L query
  dispatches inside ONE jitted lax.scan; latency = (wall(L2) - wall(L1)) /
  (L2 - L1)), the only per-batch number the axon tunnel's RTT can't touch;
* host-path per-call p50/p95/p99 through the Collection serving wrapper
  (validate -> filter -> traversal -> assemble), read back from the
  observability percentile rings (observability/metrics.py) after a
  serving round. NOTE: over the tunnel each call pays a ~3-60 ms RTT a
  real TPU host doesn't; the device rows are the hardware truth, the host
  rows bound the Python wrapper + link.

Shares bench.py's corpus/build caches.
"""

import time
from functools import partial

import numpy as np

from bench import BUILD_CACHE, N, D, K, clustered
from benches.common import emit, env_int

BATCHES = (1, 128, 2048, 65536)
L_LO, L_HI = 1, 5
ROUNDS = env_int("QUIVER_BENCH_LAT_ROUNDS", 3)
HOST_CALLS = env_int("QUIVER_BENCH_LAT_HOST_CALLS", 200)


def make_chained(step_fn):
    """Build the jitted L-chained runner. The big arrays arrive as
    ARGUMENTS, never closure constants — the tunnel's remote-compile
    endpoint rejects programs with large embedded constants (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    # Unrolled rather than lax.scan: the v5e AOT compiler hits a
    # post-optimization bitcast bug on the scan-wrapped IVF program at
    # small B (s32 layout mismatch); the unrolled chain compiles clean
    # and is the same measurement (L data-dependent dispatches, one
    # program).
    @partial(jax.jit, static_argnames=("n",))
    def run(ops, n):
        c = jnp.float32(0)
        for _ in range(n):
            c = c + step_fn(c, ops) * 1e-30
        return c

    return run


def device_latency(step_fn, ops):
    """Per-batch device latency via the L-difference, best-of-ROUNDS,
    retrying with more samples when tunnel jitter makes it non-positive."""
    run = make_chained(step_fn)

    def wall(L):
        t0 = time.perf_counter()
        _ = np.asarray(run(ops, n=L))
        return time.perf_counter() - t0

    walls_lo = [wall(L_LO)]  # also warms both programs
    walls_hi = [wall(L_HI)]
    for extra in range(4):
        walls_lo += [wall(L_LO) for _ in range(ROUNDS)]
        walls_hi += [wall(L_HI) for _ in range(ROUNDS)]
        per = (min(walls_hi) - min(walls_lo)) / (L_HI - L_LO)
        if per > 0:
            return per
    return float("nan")


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.ops.ivf_kernels import ivf_query
    from quiver_tpu.ops.scan import flat_scan_topk

    vecs = clustered(N)
    rng = np.random.default_rng(3)

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=1024, n_probe=3, q_cap_factor=2, kmeans_iters=8,
        build_threshold=1024, rescore=False))
    import os
    if os.path.exists(BUILD_CACHE):
        z = np.load(BUILD_CACHE)
        eng.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
             "assign": z["assign"], "cmax": np.int64(z["cmax"])},
            np.arange(store.capacity))
    else:
        eng.build()
    exact = ExactIndex(store)
    dev = store.device_view()
    cent_j, c_ns = eng._cent_dev
    keep = eng._keep_dev()

    def ivf_step(c, ops):
        (qj, cj, cns, bt, bs, bns, bi, bk, sv) = ops
        d, _ = ivf_query(
            qj + c, cj, cns, bt, bs, bns, bi, bk, sv,
            metric="euclidean", k=K, n_probe=eng.config.n_probe,
            q_cap=8, formulation="pairs",
            oversample=eng.config.oversample,
            probe_approx=eng.config.probe_approx,
            probe_sel_approx=eng.config.probe_sel_approx,
            seg_width=eng.config.seg_width, rescore=False)
        return d[0, 0]

    def exact_step(c, ops):
        (qj, vectors, valid, norms_sq, inv_norms) = ops
        d, _ = flat_scan_topk(
            qj + c, vectors, valid, None, norms_sq,
            inv_norms, metric="euclidean", k=K, tile=8192,
            compute_dtype=jnp.float32, approx_recall=None)
        return d[0, 0]

    for B in BATCHES:
        # The serving engine pads batches to pow2 with floor 8
        # (ivf.py search_slots); true-B=1 programs also trip a v5e AOT
        # bitcast bug, so the padded program is BOTH what production
        # serves and the only thing that compiles. us_per_query divides
        # by the REQUESTED B — the padded rows are real serving cost.
        Bp = max(B, 8)
        q = (vecs[rng.integers(0, N, Bp)]
             + 0.1 * rng.normal(size=(Bp, D))).astype(np.float32)
        qj = jnp.asarray(q)
        pad = f", engine-padded to {Bp}" if Bp != B else ""

        per = device_latency(ivf_step, (
            qj, cent_j, c_ns, eng._blocks_t, eng._block_slot,
            eng._block_ns, eng._block_inv, keep, dev.vectors))
        emit(f"ivf device latency, B={B} (1M x {D}-d, n_probe=3{pad})",
             per * 1e3, "ms/batch",
             us_per_query=round(per * 1e6 / B, 3),
             device_qps=round(B / per, 1))

        per = device_latency(exact_step, (
            qj, dev.vectors, dev.valid, dev.norms_sq, dev.inv_norms))
        emit(f"exact device latency, B={B} (1M x {D}-d, f32{pad})",
             per * 1e3, "ms/batch",
             us_per_query=round(per * 1e6 / B, 3),
             device_qps=round(B / per, 1))

    # ---- host path: Collection serving wrapper -> observability rings
    from quiver_tpu.core.collection import Collection
    from quiver_tpu.observability.metrics import global_metrics
    from quiver_tpu.types import SearchRequest

    metrics = global_metrics()
    metrics.enable()
    coll = Collection(
        "latbench", dim=D, metric="euclidean",
        engine_factory=lambda s: IVFIndex(s, config=IVFConfig(
            n_clusters=1024, n_probe=3, q_cap_factor=2, kmeans_iters=8,
            build_threshold=1024, rescore=False)),
        auto_facet_fields=False)
    coll.add_batch([f"v{i}" for i in range(N)], vecs)
    if os.path.exists(BUILD_CACHE):
        z = np.load(BUILD_CACHE)
        assign = np.full(coll.store.capacity, -1, np.int64)
        assign[: len(z["assign"])] = z["assign"]
        coll.engine.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
             "assign": assign, "cmax": np.int64(z["cmax"])},
            np.arange(coll.store.capacity))
    else:
        coll.engine.build()
    coll.engine.warmup(query_batches=(1, 128), write_batches=())

    for B in (1, 128):
        qs = (vecs[rng.integers(0, N, HOST_CALLS * B)]
              + 0.1 * rng.normal(size=(HOST_CALLS * B, D))
              ).astype(np.float32)
        # drain ring state so percentiles cover exactly this round
        metrics._rings.clear()
        t0 = time.perf_counter()
        for i in range(HOST_CALLS):
            reqs = [SearchRequest(vector=qs[i * B + j], top_k=K)
                    for j in range(B)]
            if B == 1:
                coll.search(reqs[0])
            else:
                coll.search_batch(reqs)
        wall = time.perf_counter() - t0
        st = metrics.latency_stats("latbench", "search")
        emit(f"host-path serving latency, B={B} (Collection wrapper"
             " + tunnel RTT; rings record per-request share)",
             st.get("p50_ms", float("nan")), "ms p50",
             p95_ms=round(st.get("p95_ms", float("nan")), 3),
             p99_ms=round(st.get("p99_ms", float("nan")), 3),
             avg_ms=round(st.get("avg_ms", float("nan")), 3),
             calls=HOST_CALLS,
             wall_qps=round(HOST_CALLS * B / wall, 1))


if __name__ == "__main__":
    main()
