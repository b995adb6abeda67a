"""Worker process for the DCN (multi-host) smoke test.

Launched twice by tests/test_dcn.py with a shared coordinator address. Each
process owns 4 virtual CPU devices; together they form one 8-device global
mesh spanning two processes — the DCN tier promised in
quiver_tpu/parallel/sharded.py:14-15 ("multi-host = the same program under
``jax.distributed.initialize``"). The corpus shards across ALL 8 devices, so
the all_gather top-k merge inside sharded_scan_topk rides the cross-process
collective path (gloo on CPU, DCN on real pods).

Exit code 0 = this process validated the globally-merged top-k against a
local f32 oracle.
"""

import os
import sys

# 4 local virtual CPU devices per process; must be set before backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])
    num_processes = int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from quiver_tpu.parallel.sharded import DATA_AXIS, sharded_scan_topk

    devs = jax.devices()
    n_local = len(jax.local_devices())
    assert len(devs) == num_processes * n_local, (
        f"global device count {len(devs)} != {num_processes} x {n_local}"
    )
    mesh = Mesh(np.array(devs), (DATA_AXIS,))

    cap, d, B, k = 1024, 32, 16, 10
    rng = np.random.default_rng(7)  # same data in every process (SPMD)
    vecs = rng.normal(size=(cap, d)).astype(np.float32)
    ns = np.sum(vecs.astype(np.float64) ** 2, axis=1).astype(np.float32)
    inv = (1.0 / np.sqrt(np.maximum(ns, 1e-30))).astype(np.float32)
    valid = np.ones(cap, bool)
    queries = (
        vecs[:B] + 0.01 * rng.normal(size=(B, d)).astype(np.float32)
    )

    def put(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh, lambda i: arr[i])

    vd = put(vecs, P(DATA_AXIS, None))
    vad = put(valid, P(DATA_AXIS))
    nsd = put(ns, P(DATA_AXIS))
    invd = put(inv, P(DATA_AXIS))
    qd = put(queries, P())

    dist, idx = sharded_scan_topk(
        qd, vd, vad, None, nsd, invd,
        mesh=mesh, metric="euclidean", k=k, tile=cap // len(devs),
    )
    # outputs are fully replicated -> every process can fetch them whole
    dist = np.asarray(dist)
    idx = np.asarray(idx)

    # f32 oracle on host
    true_d = np.linalg.norm(
        queries[:, None, :] - vecs[None, :, :], axis=2
    )
    oracle = np.argsort(true_d, axis=1)[:, :k]
    hits = sum(
        len(set(idx[b].tolist()) & set(oracle[b].tolist())) for b in range(B)
    )
    recall = hits / (B * k)
    seeded_ok = bool((idx[:, 0] == np.arange(B)).all())
    sorted_ok = bool((np.diff(dist, axis=1) >= -1e-5).all())
    print(
        f"[proc {process_id}] recall={recall:.3f} seeded_ok={seeded_ok} "
        f"sorted_ok={sorted_ok}",
        flush=True,
    )
    return 0 if (recall >= 0.99 and seeded_ok and sorted_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
