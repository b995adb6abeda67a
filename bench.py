"""Headline benchmark: batched QPS/chip at recall@10 >= 0.95 on a 1M x
128-d L2 corpus (the BASELINE.json metric; SIFT-1M stand-in is synthetic
CLUSTERED data — zero-egress environment, same shape/dtype/metric and the
same local-neighborhood structure recall depends on).

Engine under test: the IVF-Flat pruned search (k-means blocks, residual
bf16 probe matmul on the MXU, windowed top-2 reduce, score-derived
distances — quiver_tpu/index/ivf.py), the serving configuration for
corpora past the flat-scan crossover. Recall is tie-aware against an
exact f64 oracle on a 2048-query sample (benches/truth.py): a returned
row counts when its true distance <= the true k-th distance.

Timing is pipelined (dispatch PIPELINE_DEPTH batches, fetch the last) —
the only methodology that survives the axon tunnel's per-dispatch RTT;
on a real TPU host the dispatch gap vanishes and per-batch wall-clock
approaches device time.

Baseline: the reference's best-ever published per-core search throughput
— 149,254 QPS (6,705 ns/op HNSW single search on a 10,000-vector x 3-d
corpus, final_bench.txt:19; its realistic SIFT-1M-scale numbers are far
lower, so this is the most generous comparison available — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time
from functools import partial

import numpy as np

REFERENCE_BATCHED_QPS_PER_CORE = 149_254.0

N, D, K = 1_000_000, 128, 10
N_CENTERS = 1000
# B=65536 amortizes the per-dispatch fixed cost best: 13.08x wall vs
# 10.3x at 16384 and 12.3x at 131072 (swept 2026-08-18, two runs each
# within 0.3%); recall is B-independent (measured on the oracle sample)
B = int(os.environ.get("QUIVER_BENCH_B", 65536))
# n_probe: auto-tuned by the engine to RECALL_TARGET (IVFConfig.
# recall_target — smallest probe count whose measured recall@10 on a
# held-out jittered sample meets target), so the headline knob is engine
# behavior that transfers to any corpus, not a hand-swept constant
# (VERDICT r3 next #5). Env override pins it for sweeps.
N_PROBE = int(os.environ.get("QUIVER_BENCH_NPROBE", 0))  # 0 = auto-tune
RECALL_TARGET = float(os.environ.get("QUIVER_BENCH_RECALL_TARGET", 0.96))
B_ORACLE = 2048
PIPELINE_DEPTH = int(os.environ.get("QUIVER_BENCH_DEPTH", 32))
ROUNDS = 3
# v2: cluster ids permuted at build (index/ivf.py) — stale v1 caches would
# re-import the unpermuted layout and its windowed-probe recall pathology
BUILD_CACHE = "/tmp/quiver_bench_ivf_build_v2.npz"
TRUTH_CACHE = "/tmp/quiver_bench_truth_d10.npy"


def clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32)


def main() -> None:
    import jax.numpy as jnp

    from benches.truth import exact_truth_f64, recall_with_ties
    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    vecs = clustered(N)
    rng = np.random.default_rng(1)
    queries = (vecs[:B_ORACLE] + 0.1 * rng.normal(size=(B_ORACLE, D))
               ).astype(np.float32)

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=1024, n_probe=N_PROBE or 3, q_cap_factor=2,
        kmeans_iters=8, build_threshold=1024, rescore=False,
        recall_target=None if N_PROBE else RECALL_TARGET))
    if os.path.exists(BUILD_CACHE):
        z = np.load(BUILD_CACHE)
        eng.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
             "assign": z["assign"], "cmax": np.int64(z["cmax"])},
            np.arange(store.capacity))
        if not N_PROBE:
            eng.tune_n_probe()  # cached-build path skips build()'s tuner
    else:
        t0 = time.perf_counter()
        eng.build()
        build_s = time.perf_counter() - t0
        print(f"# build {build_s:.1f}s K'={eng.n_clusters}", flush=True)
        assign = np.full(store.capacity, -1, np.int64)
        live = eng._slot_pos[:, 0] >= 0
        assign[live] = eng._slot_pos[live, 0]
        np.savez(BUILD_CACHE, centroids=eng._centroids, assign=assign,
                 cmax=eng._block_slot.shape[1])
    if not N_PROBE:
        print(f"# tuned n_probe={eng.config.n_probe} "
              f"(sample recall {eng._tuned_recall})", flush=True)

    # recall: tie-aware vs exact f64 oracle on the query sample
    if os.path.exists(TRUTH_CACHE):
        d10 = np.load(TRUTH_CACHE)
    else:
        d10 = exact_truth_f64(queries, vecs, K)[1][:, K - 1]
        np.save(TRUTH_CACHE, d10)
    _, i_got = eng.search_slots(queries, K)
    recall = recall_with_ties(np.asarray(i_got), queries, vecs, d10, K)

    # throughput: pipelined device-path batches, fetch-last. The batch is
    # B UNIQUE queries (random corpus rows + the oracle sample's 0.1-sigma
    # jitter model) — not the oracle sample tiled (VERDICT r3 weak #6)
    rngq = np.random.default_rng(2)
    qb = (vecs[rngq.integers(0, N, B)]
          + 0.1 * rngq.normal(size=(B, D))).astype(np.float32)
    qb[:B_ORACLE] = queries  # oracle sample rides along: recall spot-check
    qj = jnp.asarray(qb)

    def timed_round():
        t0 = time.perf_counter()
        outs = [eng.search_slots_device(qj, K) for _ in range(PIPELINE_DEPTH)]
        # fetch ONE scalar of the last batch (slices on device): syncs the
        # whole pipeline without dragging the [B, k] result through the
        # tunnel's ~5-14 MB/s host link, which a real TPU host doesn't pay
        _ = np.asarray(outs[-1][0][0, 0])
        return (time.perf_counter() - t0) / PIPELINE_DEPTH

    timed_round()  # warm
    walls = sorted(timed_round() for _ in range(ROUNDS))
    per_batch = walls[0]
    # run-to-run spread across the timed rounds, so the single headline
    # figure carries an error bar (ADVICE r3 #3)
    spread_pct = 100.0 * (walls[-1] - walls[0]) / walls[0]
    qps = B / per_batch

    # device-side QPS: L query dispatches chained inside ONE jitted scan
    # (no per-dispatch overhead at all) — the pure-device-time ceiling the
    # wall number converges to as the pipeline deepens (VERDICT r2 #2:
    # report both so link overhead is visible, not guessed)
    import jax

    from quiver_tpu.ops.ivf_kernels import ivf_query

    cent_j, c_ns = eng._cent_dev
    big = (cent_j, c_ns, eng._blocks_t, eng._block_slot, eng._block_ns,
           eng._block_inv, eng._keep_dev(), store.device_view().vectors)

    @partial(jax.jit, static_argnames=("L",))
    def chained(q, cj, cns, bt, bs, bns, bi, bk, sv, L):
        # big arrays arrive as ARGUMENTS (the tunnel rejects programs with
        # large embedded constants)
        def step(c, _):
            d, _s = ivf_query(
                q + c, cj, cns, bt, bs, bns, bi, bk, sv,
                metric="euclidean", k=K, n_probe=eng.config.n_probe,
                q_cap=8, formulation="pairs",
                oversample=eng.config.oversample,
                probe_approx=eng.config.probe_approx,
                probe_sel_approx=eng.config.probe_sel_approx,
                seg_width=eng.config.seg_width, rescore=False,
            )
            return c + d[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=L)
        return c

    def wall_L(L):
        t0 = time.perf_counter()
        _ = np.asarray(chained(qj, *big, L=L))
        return time.perf_counter() - t0

    wall_L(1), wall_L(5)  # warm both programs
    # difference of two minima: tunnel RTT jitter can make it non-positive
    # on unlucky rounds — retry with more samples, and omit the device
    # fields rather than emit a negative/absurd number
    dev_per_batch = 0.0
    for extra in range(3):
        rounds = ROUNDS + 2 * extra
        dev_per_batch = (min(wall_L(5) for _ in range(rounds))
                         - min(wall_L(1) for _ in range(rounds))) / 4
        if dev_per_batch > 0:
            break

    # provenance: the artifact self-identifies (ADVICE r3 #2)
    try:
        import subprocess

        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or None
    except Exception:
        commit = None

    result = {
        "metric": (f"batched QPS/chip, IVF 1M x {D}-d L2, "
                   f"recall@10={recall:.3f} (tie-aware exact oracle)"),
        "commit": commit,
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / REFERENCE_BATCHED_QPS_PER_CORE, 3),
        "pipeline_depth": PIPELINE_DEPTH,
        "n_probe": eng.config.n_probe,
        "batch": B,
        "batch_latency_ms": round(per_batch * 1e3, 3),
        "run_spread_pct": round(spread_pct, 2),
    }
    # tuner honesty: holdout recall next to realized so sampling optimism
    # is visible in the artifact, not discovered later (VERDICT r4 #11)
    if eng._tuned_recall is not None:
        result["tuner_holdout_recall"] = round(eng._tuned_recall, 4)
        result["tuner_holdout_gap"] = round(eng._tuned_recall - recall, 4)
        result["tuner_sample"] = eng.config.recall_sample
    if dev_per_batch > 0:
        dev_qps = B / dev_per_batch
        result["device_qps"] = round(dev_qps, 1)
        result["device_vs_baseline"] = round(
            dev_qps / REFERENCE_BATCHED_QPS_PER_CORE, 3
        )
        result["device_batch_latency_ms"] = round(dev_per_batch * 1e3, 3)
    assert recall >= 0.95, f"recall {recall} below target"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
