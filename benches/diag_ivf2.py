"""Full-scale IVF forensics: with ALL approximations off, compare ivf_query
to the probed-restricted exact truth; dump why each missing slot was lost.
Caches the k-means build in /tmp to make iteration cheap."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, B, K_TOP = 1_000_000, 128, 2048, 10
N_CENTERS = 1000
ORACLE_CACHE = "/tmp/ivf_oracle_1m.npy"
BUILD_CACHE = "/tmp/ivf_build_1m.npz"


def clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32), centers, which


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.ops.ivf_kernels import ivf_query

    vecs, centers, which = clustered(N)
    rng = np.random.default_rng(1)
    queries = (vecs[:B] + 0.1 * rng.normal(size=(B, D))).astype(np.float32)
    oracle = np.load(ORACLE_CACHE)
    qd = jnp.asarray(queries)

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    dev = store.device_view()

    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=4096, n_probe=8, kmeans_iters=8, build_threshold=1024))
    if os.path.exists(BUILD_CACHE):
        z = np.load(BUILD_CACHE)
        eng.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
             "assign": z["assign"], "cmax": z["cmax"]},
            np.arange(store.capacity),
        )
        print("build loaded from cache", flush=True)
    else:
        t0 = time.perf_counter()
        eng.build()
        topo = eng.export_topology()
        np.savez(BUILD_CACHE, centroids=topo["centroids"],
                 assign=topo["assign"], cmax=topo["cmax"])
        print(f"build {time.perf_counter()-t0:.1f}s (cached)", flush=True)
    K = eng.n_clusters
    Cmax = eng._block_slot.shape[1]
    print(f"K'={K} Cmax={Cmax}", flush=True)

    P = 8
    cent = eng._centroids
    c_aff = 2.0 * (queries @ cent.T) - np.sum(cent * cent, axis=1)[None, :]
    probe_order = np.argsort(-c_aff, axis=1)[:, :P]
    slot_cluster = eng._slot_pos[:, 0]

    # restricted truth: among rows in probed clusters, exact top-k by f32
    # distance — computed via the probed blocks themselves (cheap on host)
    bs_np = np.asarray(eng._block_slot)
    expected = np.full((B, K_TOP), -1, np.int64)
    vns = np.sum(vecs.astype(np.float64) ** 2, axis=1)
    for b in range(B):
        rows = bs_np[probe_order[b]].reshape(-1)
        rows = rows[rows >= 0]
        dd = vns[rows] - 2.0 * (vecs[rows] @ queries[b].astype(np.float64))
        expected[b] = rows[np.argsort(dd)[:K_TOP]]
    print("restricted truth ready", flush=True)

    d, i = ivf_query(
        qd, *eng._cent_dev, eng._blocks, eng._block_slot,
        eng._block_ns, eng._block_inv, eng._keep_dev(), dev.vectors,
        metric="euclidean", k=K_TOP, n_probe=P, q_cap=64,
        compute_dtype=jnp.float32, oversample=16,
        probe_approx=None, probe_sel_approx=None)
    i = np.asarray(i)

    vs_restricted = np.mean([
        len(set(i[b].tolist()) & set(expected[b].tolist())) / K_TOP
        for b in range(B)
    ])
    vs_oracle = np.mean([
        len(set(i[b].tolist()) & set(oracle[b].tolist())) / K_TOP
        for b in range(B)
    ])
    ceiling = np.mean([
        np.isin(slot_cluster[oracle[b]], probe_order[b]).mean()
        for b in range(B)
    ])
    print(f"kernel vs restricted truth: {vs_restricted:.4f}", flush=True)
    print(f"kernel vs full oracle:      {vs_oracle:.4f}", flush=True)
    print(f"structural ceiling:         {ceiling:.4f}", flush=True)

    bad = [b for b in range(B)
           if set(i[b].tolist()) != set(expected[b].tolist())]
    print("mismatching queries:", len(bad), flush=True)
    for b in bad[:3]:
        missing = sorted(set(expected[b].tolist()) - set(i[b].tolist()))
        print(f"query {b}: missing {missing}")
        for s in missing:
            r, p_ = eng._slot_pos[s]
            pr = (np.flatnonzero(probe_order[b] == r)[0]
                  if r in probe_order[b] else -1)
            print(f"  slot {s}: cluster {r} pos {p_} probe-rank {pr} "
                  f"keep {np.asarray(eng._block_keep)[r, p_]} "
                  f"block_slot {bs_np[r, p_]}")


if __name__ == "__main__":
    main()
