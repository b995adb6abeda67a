"""Sharded-IVF probe-skew behavior (VERDICT r3 next #7).

The sharded engine bounds each shard's (query, probe) pair list at
``local_pair_factor`` x the mean load B*P/n and silently drops the
lowest-rank pairs past it (parallel/sharded_ivf.py:142-163). This bench
quantifies what that costs, on the 8-virtual-CPU mesh:

* adversarial skew — every query targets clusters owned by ONE shard, so
  that shard sees ~n x its mean pair load: recall@10 vs
  local_pair_factor in {1, 2, 4} (and the uniform-query control);
* the score-derived vs rescore recall delta on the same corpus
  single-chip (sharded serving is score-derived only; the delta is the
  other unrecorded approximation).

Run: python benches/bench_skew.py (forces the CPU mesh itself).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from benches.common import emit, env_int, recall_at_k  # noqa: E402

N = env_int("QUIVER_BENCH_SKEW_N", 200_000)
D, K_TOP, B = 64, 10, 512
N_CLUSTERS = 128
N_PROBE = 3


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.parallel.sharded_ivf import ShardedIVFIndex

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(N_CLUSTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CLUSTERS, N)
    vecs = (centers[which]
            + 0.25 * rng.normal(size=(N, D))).astype(np.float32)

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    exact = ExactIndex(store)

    def queries_near(rows):
        base = vecs[rng.choice(rows, size=B)]
        return (base + 0.1 * rng.normal(size=(B, D))).astype(np.float32)

    q_uniform = queries_near(np.arange(N))

    results = {}
    for factor in (1.0, 2.0, 4.0):
        eng = ShardedIVFIndex(
            store,
            config=IVFConfig(
                n_clusters=N_CLUSTERS, n_probe=N_PROBE, q_cap_factor=2,
                kmeans_iters=6, build_threshold=1024, rescore=False),
            local_pair_factor=factor)
        eng.build()
        # adversarial query set: rows whose cluster shard 0 owns — every
        # probe then lands on shard 0 (~n x its mean pair load)
        kl = eng._k_local
        own0 = np.flatnonzero(
            (eng._slot_pos[:, 0] >= 0) & (eng._slot_pos[:, 0] < kl)
        )
        q_skew = queries_near(own0)
        for label, q in (("skew", q_skew), ("uniform", q_uniform)):
            _, got = eng.search_slots(q, K_TOP)
            _, truth = exact.search_slots(q, K_TOP)
            r = recall_at_k(np.asarray(got), np.asarray(truth), K_TOP)
            results[(factor, label)] = r
            emit(
                f"sharded-ivf recall@10, local_pair_factor={factor},"
                f" {label} queries (8-mesh, {N} x {D}-d, n_probe={N_PROBE})",
                r, "recall")

    # single-chip score-derived vs rescore delta, same corpus/queries
    for rescore in (False, True):
        eng1 = IVFIndex(store, config=IVFConfig(
            n_clusters=N_CLUSTERS, n_probe=N_PROBE, q_cap_factor=2,
            kmeans_iters=6, build_threshold=1024, rescore=rescore))
        eng1.build()
        _, got = eng1.search_slots(q_uniform, K_TOP)
        _, truth = exact.search_slots(q_uniform, K_TOP)
        emit(
            f"single-chip ivf recall@10, rescore={rescore}"
            f" ({N} x {D}-d, n_probe={N_PROBE})",
            recall_at_k(np.asarray(got), np.asarray(truth), K_TOP),
            "recall")


if __name__ == "__main__":
    main()
