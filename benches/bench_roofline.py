"""Roofline / utilization axis for the serving paths (VERDICT r4 #4).

Every perf row so far compares against the Go-on-M4 baseline; this bench
answers "what fraction of the CHIP does each path use" — analytic FLOPs
and bytes-moved derived from the engine's real tensor shapes, divided by
the measured pipelined per-batch wall, against the v5e's public peaks.
The per-op cost discipline of /root/reference/final_bench.txt:18-19
(B/op next to every ns/op), applied to the units that matter on a TPU.

Model (IVF "pairs" formulation, ops/ivf_kernels.ivf_query):
  probe stage   : q[B,d] f32 x centroids[K,d]      2*B*K*d FLOPs
  pairs matmul  : [B*P,d] bf16 x blocks[K,d,Cmax]  2*B*P*d*Cmax FLOPs
  bytes         : block tensor (bf16, read once per batch — the grouped
                  matmul streams each cluster block once), pair scores
                  ([B*P,Cmax] f32 write + read by the windowed reduce),
                  probe scores ([B,K] f32 write+read), queries.
Flat scans: FLOPs 2*B*N*d; bytes = corpus read (+ queries); the [B,N]
score block never materializes (XLA fuses matmul -> approx_max_k).

Also runs the one experiment the measurement points at: the seg_width
A/B at the headline shape (the candidate-reduce knob — if the path is
reduce-bound, wider windows shrink the winner set it sorts).
"""

import os
import time

import numpy as np

from bench import BUILD_CACHE, N, D, clustered
from benches.common import emit, env_int

# TPU v5e (v5 lite) public peaks
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0

B = env_int("QUIVER_BENCH_B", 65536)
K_TOP = 10
DEPTH = env_int("QUIVER_BENCH_DEPTH", 32)


def pipelined_batch_s(call, depth=DEPTH, rounds=3):
    call()
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [call() for _ in range(depth)]
        _ = np.asarray(outs[-1][0][0, 0] if isinstance(outs[-1], tuple)
                       else outs[-1][0, 0])
        best = min(best, (time.perf_counter() - t0) / depth)
    return best


def roofline_row(name, wall_s, flops, bytes_moved, **extra):
    tf = flops / wall_s / 1e12
    gbs = bytes_moved / wall_s / 1e9
    emit(
        name, B / wall_s, "qps",
        batch_ms=round(wall_s * 1e3, 2),
        gflop_per_batch=round(flops / 1e9, 1),
        achieved_tflops=round(tf, 2),
        pct_bf16_peak=round(100 * tf / PEAK_BF16_TFLOPS, 2),
        gb_per_batch=round(bytes_moved / 1e9, 2),
        achieved_gbs=round(gbs, 1),
        pct_hbm_bw=round(100 * gbs / PEAK_HBM_GBS, 1),
        **extra,
    )


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    vecs = clustered(N)
    rng = np.random.default_rng(2)
    qb = (vecs[rng.integers(0, N, B)]
          + 0.1 * rng.normal(size=(B, D))).astype(np.float32)

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=1024, n_probe=2, q_cap_factor=2, kmeans_iters=8,
        build_threshold=1024, rescore=False))
    if os.path.exists(BUILD_CACHE):
        z = np.load(BUILD_CACHE)
        eng.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
             "assign": z["assign"], "cmax": np.int64(z["cmax"])},
            np.arange(store.capacity))
    else:
        eng.build()

    qj = jnp.asarray(qb)
    K = int(eng._blocks_t.shape[0])
    Cmax = int(eng._blocks_t.shape[2])
    P = int(eng.config.n_probe)
    seg0 = eng.config.seg_width

    # ---- IVF serving path at the headline shape, seg_width sweep
    def ivf_analytic():
        flops = 2.0 * B * K * D + 2.0 * B * P * D * Cmax
        nwin = (Cmax + (seg := eng.config.seg_width or Cmax) - 1) // seg
        bytes_moved = (
            K * D * Cmax * 2            # block tensor, bf16, streamed once
            + B * P * Cmax * 4 * 2      # pair scores write + reduce read
            + B * K * 4 * 2             # probe scores write + select read
            + B * D * 4                 # queries
            + B * P * nwin * 2 * 8      # window winners (score+key)
        )
        return flops, bytes_moved

    for seg in (seg0, 64, 128):
        eng.config.seg_width = seg
        wall = pipelined_batch_s(
            lambda: eng.search_slots_device(qj, K_TOP))
        flops, bts = ivf_analytic()
        roofline_row(
            f"ivf pairs B={B} n_probe={P} seg_width={seg}",
            wall, flops, bts,
            K=K, Cmax=Cmax,
        )
    eng.config.seg_width = seg0

    # ---- flat scans: exact f32 and the bf16+approx serving scan,
    # dispatched at the kernel layer (flat_scan_topk) so the measurement
    # is the device program, not the host wrapper
    import jax

    from quiver_tpu.ops.scan import flat_scan_topk

    view = store.device_view()
    corpus16 = jnp.asarray(np.asarray(view.vectors), jnp.bfloat16)
    flops_scan = 2.0 * B * N * D
    for name, corpus, cdtype, approx, prec, corpus_bytes, depth in (
        ("exact flat scan f32 (default prec: 1 bf16 MXU pass)",
         view.vectors, jnp.float32, None, None, N * D * 4, 4),
        ("exact flat scan f32 (highest prec: the exact contract)",
         view.vectors, jnp.float32, None, "highest", N * D * 4, 4),
        ("flat scan bf16+approx", corpus16, jnp.bfloat16, 0.95, None,
         N * D * 2, 8),
    ):
        def call(corpus=corpus, cdtype=cdtype, approx=approx, prec=prec):
            return flat_scan_topk(
                qj, corpus, view.valid, None, view.norms_sq,
                view.inv_norms, metric="euclidean", k=K_TOP,
                tile=min(32768, N), compute_dtype=cdtype,
                approx_recall=approx, precision=prec,
            )
        try:
            wall = pipelined_batch_s(call, depth=depth)
        except Exception as e:  # noqa: BLE001 — shape/HBM ceiling
            emit(f"{name} B={B}", -1, "skipped", reason=repr(e)[:120])
            continue
        roofline_row(
            f"{name} B={B}", wall, flops_scan,
            corpus_bytes + B * D * 4,
        )
    del corpus16
    _ = jax


if __name__ == "__main__":
    main()
