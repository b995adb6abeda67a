"""Dispatch-rate diagnostic: how fast can the host ISSUE calls through
the tunnel (no fetch), engine path vs flat scan vs raw jit?"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.ivf_lab import clustered, get_build

N, D, K_TOP, B = 1_000_000, 128, 10, 16384


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.ops.scan import flat_scan_topk

    print("devices:", jax.devices(), flush=True)
    vecs, _, _ = clustered(N)
    cents, assign, cmax = get_build(vecs, 1024)
    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    eng = IVFIndex(store, config=IVFConfig(
        n_probe=4, q_cap_factor=2, rescore=False, build_threshold=1024))
    eng.import_topology(
        {"kind": np.bytes_(b"ivf"), "centroids": cents,
         "assign": assign, "cmax": np.int64(cmax)},
        np.arange(store.capacity))
    rng = np.random.default_rng(1)
    qj = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    view = store.device_view()
    corpus16 = view.vectors.astype(jnp.bfloat16)
    q2 = qj[:2048]

    def flat():
        return flat_scan_topk(
            q2, corpus16, view.valid, None, view.norms_sq, view.inv_norms,
            metric="euclidean", k=K_TOP, tile=view.capacity,
            compute_dtype=jnp.bfloat16, approx_recall=0.95)

    def ivf():
        return eng.search_slots_device(qj, K_TOP)

    for name, fn in (("flat b2048", flat), ("ivf b16384", ivf)):
        out = fn()
        _ = np.asarray(out[0]).ravel()[:1]  # warm compile + drain
        # dispatch-only rate (no fetch)
        t0 = time.perf_counter()
        n = 20
        outs = [fn() for _ in range(n)]
        t_disp = (time.perf_counter() - t0) / n
        # now fetch the last -> total pipelined rate
        _ = np.asarray(outs[-1][0]).ravel()[:1]
        t_tot = (time.perf_counter() - t0) / n
        print(f"{name:12s} dispatch {t_disp*1e3:8.2f} ms/call   "
              f"pipelined-total {t_tot*1e3:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
