"""HTTP serving-path load test (VERDICT r3 next #4).

The reference's serving surface is its REST API
(/root/reference/pkg/api/server.go:152-184); until now the repo's only
wall numbers that include the host path were the RTT-bound hybrid rows.
This bench starts the real aiohttp server in-process on loopback over the
1M x 128-d IVF collection and drives it with C concurrent clients issuing
single-search POSTs, sweeping the search-coalescing window — so the API
host tax over the engine-direct number is a measured ratio, and the
coalesce default is justified by a recorded sweep.

Emits one row per (coalesce_window_ms, concurrency): QPS, p50/p95/p99.
Shares bench.py's corpus/build caches.
"""

import asyncio
import os
import time

import numpy as np

from bench import BUILD_CACHE, D, K, N, clustered
from benches.common import emit, env_int

PORT = env_int("QUIVER_BENCH_API_PORT", 18742)
REQUESTS = env_int("QUIVER_BENCH_API_REQUESTS", 2000)
WINDOWS_MS = (0.0, 1.0, 2.0, 5.0)
CONCURRENCY = (16, 64, 256)


async def load_round(url, payloads, concurrency, n_requests):
    """Drive n_requests single-search POSTs from `concurrency` well-behaved
    clients. A 429 (load shed, VERDICT r4 #8) is honored: the client sleeps
    the server's Retry-After (capped at 1 s for bench wall sanity) and
    retries the same request — so `qps` counts completed searches and the
    latency percentiles are the ADMITTED requests' service times, with the
    shed rate reported alongside."""
    import aiohttp

    lat = []
    idx = {"i": 0}
    shed = {"n": 0}

    async def worker(session):
        while True:
            i = idx["i"]
            if i >= n_requests:
                return
            idx["i"] = i + 1
            payload = payloads[i % len(payloads)]
            while True:
                t0 = time.perf_counter()
                async with session.post(url, json=payload) as r:
                    if r.status == 429:
                        shed["n"] += 1
                        retry = float(r.headers.get("Retry-After", "1"))
                        await r.read()
                        await asyncio.sleep(min(retry, 1.0))
                        continue
                    assert r.status == 200, await r.text()
                    await r.json()
                lat.append((time.perf_counter() - t0) * 1e3)
                break

    conn = aiohttp.TCPConnector(limit=concurrency)
    async with aiohttp.ClientSession(connector=conn) as session:
        t0 = time.perf_counter()
        await asyncio.gather(*(worker(session) for _ in range(concurrency)))
        wall = time.perf_counter() - t0
    lat.sort()
    n = len(lat)
    return {
        "qps": n / wall,
        "p50_ms": lat[n // 2],
        "p95_ms": lat[min(n - 1, int(0.95 * n))],
        "p99_ms": lat[min(n - 1, int(0.99 * n))],
        "shed": shed["n"],
    }


def build_db():
    from quiver_tpu.core.db import DB, DBOptions

    db = DB(DBOptions(
        storage_path="", enable_persistence=False, default_engine="ivf",
        engine_config={
            "n_clusters": 1024, "n_probe": 3, "q_cap_factor": 2,
            "kmeans_iters": 8, "build_threshold": 1024, "rescore": False,
        },
    ))
    coll = db.create_collection("api", dim=D, metric="euclidean")
    vecs = clustered(N)
    print("# ingesting 1M rows", flush=True)
    bs = 65536
    for s in range(0, N, bs):
        coll.add_batch(
            [f"v{i}" for i in range(s, min(N, s + bs))],
            vecs[s: min(N, s + bs)],
        )
    eng = coll.engine
    if os.path.exists(BUILD_CACHE):
        z = np.load(BUILD_CACHE)
        assign = np.full(coll.store.capacity, -1, np.int64)
        assign[: len(z["assign"])] = z["assign"]
        eng.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
             "assign": assign, "cmax": np.int64(z["cmax"])},
            np.arange(coll.store.capacity))
    else:
        eng.build()
    print("# warmup (serving compile ladder)", flush=True)
    eng.warmup(query_batches=(1, 8, 64, 256), write_batches=())
    return db, vecs


async def main_async():
    from quiver_tpu.api.server import Server, ServerConfig

    db, vecs = build_db()
    rng = np.random.default_rng(7)
    queries = (vecs[rng.integers(0, N, 512)]
               + 0.1 * rng.normal(size=(512, D))).astype(np.float32)
    payloads = [{"vector": q.tolist(), "top_k": K} for q in queries]
    url = f"http://127.0.0.1:{PORT}/api/v1/collections/api/search"

    for win in WINDOWS_MS:
        server = Server(db, ServerConfig(
            host="127.0.0.1", port=PORT, enable_metrics_server=False,
            coalesce_window_ms=win))
        await server.start_async()
        try:
            await load_round(url, payloads, 16, 200)  # warm the window path
            st = await load_round(url, payloads, 64, REQUESTS)
            emit(
                f"api loopback search, coalesce={win}ms, 64 clients"
                f" (1M IVF n_probe=3)",
                st["qps"], "qps",
                p50_ms=round(st["p50_ms"], 2), p95_ms=round(st["p95_ms"], 2),
                p99_ms=round(st["p99_ms"], 2))
        finally:
            # runner-only teardown: the DB outlives this server instance
            await server._runner.cleanup()

    # concurrency sweep at the default window
    server = Server(db, ServerConfig(
        host="127.0.0.1", port=PORT, enable_metrics_server=False))
    await server.start_async()
    try:
        for c in CONCURRENCY:
            st = await load_round(url, payloads, c, REQUESTS)
            emit(
                f"api loopback search, coalesce="
                f"{server.config.coalesce_window_ms}ms, {c} clients"
                f" (1M IVF n_probe=3)",
                st["qps"], "qps",
                p50_ms=round(st["p50_ms"], 2), p95_ms=round(st["p95_ms"], 2),
                p99_ms=round(st["p99_ms"], 2))
    finally:
        await server._runner.cleanup()

    # load-shed axis (VERDICT r4 #8): past the ~64-client knee the
    # measured failure mode was unbounded queueing (256-client p95 blew
    # to 1.2-2.9 s of pure backlog). search_backlog bounds queued +
    # in-flight per collection; since each client holds at most one
    # outstanding request, depth <= clients — a 128 backlog actually
    # triggers at 256 clients, while backlog=0 reproduces the old
    # unbounded behavior as the control.
    for backlog in (0, 128):
        server = Server(db, ServerConfig(
            host="127.0.0.1", port=PORT, enable_metrics_server=False,
            search_backlog=backlog))
        await server.start_async()
        try:
            await load_round(url, payloads, 16, 200)  # warm
            st = await load_round(url, payloads, 256, REQUESTS)
            emit(
                f"api loopback search, 256 clients, backlog="
                f"{backlog or 'off'} (1M IVF n_probe=3)",
                st["qps"], "qps",
                p50_ms=round(st["p50_ms"], 2), p95_ms=round(st["p95_ms"], 2),
                p99_ms=round(st["p99_ms"], 2), shed_429=st["shed"],
                shed_rate=round(st["shed"] / (st["shed"] + REQUESTS), 3))
        finally:
            await server._runner.cleanup()
    db.close()


def main():
    asyncio.run(main_async())


if __name__ == "__main__":
    main()
