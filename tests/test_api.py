"""REST API end-to-end tests: real aiohttp server on a local port, driven
with blocking HTTP from the test (reference: pkg/api had NO tests at all —
SURVEY.md §4; this suite covers the full route table)."""

import asyncio
import threading
import time

import numpy as np
import pytest
import requests

from quiver_tpu.api.auth import RateLimiter, jwt_decode, jwt_encode, parse_bearer
from quiver_tpu.api.server import Server, ServerConfig
from quiver_tpu.core.db import DB, DBOptions

D = 8


class ServerThread:
    def __init__(self, db, config):
        self.server = Server(db, config)
        self.loop = asyncio.new_event_loop()
        self._stopped = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.loop.run_until_complete(self.server.start_async())
        self.loop.run_forever()
        self._stopped.set()

    def start(self):
        self.thread.start()
        deadline = time.time() + 10
        url = f"http://127.0.0.1:{self.server.config.port}/health"
        while time.time() < deadline:
            try:
                if requests.get(url, timeout=0.5).status_code == 200:
                    return self
            except requests.ConnectionError:
                time.sleep(0.05)
        raise RuntimeError("server did not start")

    def stop(self):
        async def _shutdown():
            await self.server.stop_async()
            self.loop.stop()

        asyncio.run_coroutine_threadsafe(_shutdown(), self.loop)
        self.thread.join(timeout=10)


@pytest.fixture(scope="module")
def api(tmp_path_factory):
    db = DB(DBOptions(
        storage_path=str(tmp_path_factory.mktemp("api-data")),
        default_engine="exact", flush_interval_s=0,
    ))
    st = ServerThread(db, ServerConfig(
        host="127.0.0.1", port=18080, enable_metrics_server=True,
        metrics_port=19090,
    )).start()
    base = "http://127.0.0.1:18080"
    yield base
    st.stop()


def test_health(api):
    r = requests.get(f"{api}/health")
    assert r.status_code == 200 and r.json()["status"] == "ok"


def test_collection_lifecycle_and_vectors(api):
    r = requests.post(f"{api}/api/v1/collections", json={
        "name": "c1", "dimension": D, "distance_function": "euclidean",
    })
    assert r.status_code == 201, r.text
    # duplicate -> 400
    r = requests.post(f"{api}/api/v1/collections", json={"name": "c1", "dimension": D})
    assert r.status_code == 400
    # bad body -> 400
    r = requests.post(f"{api}/api/v1/collections", json={"name": "x"})
    assert r.status_code == 400

    assert "c1" in requests.get(f"{api}/api/v1/collections").json()["collections"]

    # add vectors
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(20, D)).astype(np.float32)
    r = requests.post(f"{api}/api/v1/collections/c1/vectors", json={
        "id": "v0", "vector": vecs[0].tolist(), "metadata": {"cat": "a"},
    })
    assert r.status_code == 201
    r = requests.post(f"{api}/api/v1/collections/c1/vectors/batch", json={
        "vectors": [
            {"id": f"v{i}", "vector": vecs[i].tolist(),
             "metadata": {"cat": "a" if i % 2 else "b"}}
            for i in range(1, 20)
        ],
    })
    assert r.status_code == 201 and r.json()["inserted"] == 19

    # get / update / delete
    r = requests.get(f"{api}/api/v1/collections/c1/vectors/v3")
    assert r.status_code == 200
    assert np.allclose(r.json()["vector"], vecs[3], atol=1e-6)
    r = requests.put(f"{api}/api/v1/collections/c1/vectors/v3", json={
        "metadata": {"cat": "z"},
    })
    assert r.status_code == 200
    assert requests.get(
        f"{api}/api/v1/collections/c1/vectors/v3"
    ).json()["metadata"] == {"cat": "z"}
    r = requests.get(f"{api}/api/v1/collections/c1/vectors/missing")
    assert r.status_code == 404

    # search (top_k defaults to 10)
    r = requests.post(f"{api}/api/v1/collections/c1/search", json={
        "vector": vecs[5].tolist(),
        "options": {"include_metadata": True},
    })
    body = r.json()
    assert r.status_code == 200
    assert body["results"][0]["id"] == "v5"
    assert len(body["results"]) == 10
    assert body["metadata"]["index_size"] == 20

    # dimension mismatch -> 400 (handlers.go:523-567)
    r = requests.post(f"{api}/api/v1/collections/c1/search", json={"vector": [1, 2]})
    assert r.status_code == 400

    # filtered search
    r = requests.post(f"{api}/api/v1/collections/c1/search", json={
        "vector": vecs[5].tolist(), "top_k": 20,
        "filters": [{"field": "cat", "operator": "=", "value": "b"}],
        "options": {"include_metadata": True},
    })
    assert all(x["metadata"]["cat"] == "b" for x in r.json()["results"])

    # batch search
    r = requests.post(f"{api}/api/v1/collections/c1/search/batch", json={
        "requests": [
            {"vector": vecs[1].tolist(), "top_k": 2},
            {"vector": vecs[2].tolist(), "top_k": 2},
        ],
    })
    rs = r.json()["responses"]
    assert rs[0]["results"][0]["id"] == "v1"
    assert rs[1]["results"][0]["id"] == "v2"

    # facet search
    r = requests.post(f"{api}/api/v1/collections/c1/search/facets", json={
        "vector": vecs[5].tolist(), "top_k": 20,
        "filters": [{"type": "equality", "field": "cat", "value": "a"}],
    })
    assert r.status_code == 200 and len(r.json()["results"]) > 0

    # negative example
    r = requests.post(f"{api}/api/v1/collections/c1/search", json={
        "vector": vecs[5].tolist(),
        "negative_example": vecs[6].tolist(),
        "negative_weight": 1.0,
    })
    assert r.status_code == 200

    # delete vector + batch delete
    assert requests.delete(f"{api}/api/v1/collections/c1/vectors/v9").status_code == 200
    assert requests.delete(f"{api}/api/v1/collections/c1/vectors/v9").status_code == 404
    r = requests.post(f"{api}/api/v1/collections/c1/vectors/batch/delete", json={
        "ids": ["v10", "v11", "nope"],
    })
    assert r.json()["deleted"] == 2

    # stats
    r = requests.get(f"{api}/api/v1/collections/c1/stats")
    assert r.json()["vector_count"] == 17

    # unknown collection -> 404
    assert requests.get(f"{api}/api/v1/collections/nope").status_code == 404


def test_metrics_endpoints(api):
    r = requests.get(f"{api}/api/v1/metrics")
    assert r.status_code == 200 and "qps" in r.json()
    r = requests.get("http://127.0.0.1:19090/metrics")
    assert r.status_code == 200
    assert b"quiver_search" in r.content


def test_backup_restore_roundtrip(api, tmp_path):
    dest = str(tmp_path / "api-backup")
    r = requests.post(f"{api}/api/v1/backup", json={"path": dest})
    assert r.status_code == 200
    requests.delete(f"{api}/api/v1/collections/c1")
    assert "c1" not in requests.get(f"{api}/api/v1/collections").json()["collections"]
    r = requests.post(f"{api}/api/v1/restore", json={"path": dest})
    assert r.status_code == 200
    assert "c1" in requests.get(f"{api}/api/v1/collections").json()["collections"]


def test_cors_headers(api):
    r = requests.options(f"{api}/api/v1/collections")
    assert r.headers.get("Access-Control-Allow-Origin")


# ------------------------------------------------------------ auth unit

def test_jwt_roundtrip():
    tok = jwt_encode({"sub": "x", "exp": time.time() + 60}, "s3cret")
    assert jwt_decode(tok, "s3cret")["sub"] == "x"
    with pytest.raises(ValueError, match="signature"):
        jwt_decode(tok, "wrong")
    expired = jwt_encode({"exp": time.time() - 1}, "s3cret")
    with pytest.raises(ValueError, match="expired"):
        jwt_decode(expired, "s3cret")
    with pytest.raises(ValueError, match="malformed"):
        jwt_decode("nope", "s3cret")


def test_parse_bearer():
    assert parse_bearer("Bearer abc") == "abc"
    with pytest.raises(ValueError):
        parse_bearer(None)
    with pytest.raises(ValueError):
        parse_bearer("Basic abc")


def test_rate_limiter():
    rl = RateLimiter(rate=0.0001, capacity=2)
    assert rl.allow("a") and rl.allow("a")
    assert not rl.allow("a")  # bucket drained
    assert rl.allow("b")  # independent client


def test_auth_enforced(tmp_path):
    db = DB(DBOptions(enable_persistence=False, default_engine="exact"))
    st = ServerThread(db, ServerConfig(
        host="127.0.0.1", port=18081, enable_metrics_server=False,
        enable_auth=True, jwt_secret="topsecret",
    )).start()
    base = "http://127.0.0.1:18081"
    try:
        # health open, API closed
        assert requests.get(f"{base}/health").status_code == 200
        assert requests.get(f"{base}/api/v1/collections").status_code == 401
        tok = jwt_encode({"sub": "t", "exp": time.time() + 60}, "topsecret")
        r = requests.get(f"{base}/api/v1/collections",
                         headers={"Authorization": f"Bearer {tok}"})
        assert r.status_code == 200
        bad = requests.get(f"{base}/api/v1/collections",
                           headers={"Authorization": "Bearer bogus"})
        assert bad.status_code == 401
    finally:
        st.stop()


def test_rate_limit_enforced():
    db = DB(DBOptions(enable_persistence=False, default_engine="exact"))
    st = ServerThread(db, ServerConfig(
        host="127.0.0.1", port=18082, enable_metrics_server=False,
        rate_limit=0.0001,
    )).start()
    base = "http://127.0.0.1:18082"
    try:
        codes = [requests.get(f"{base}/health").status_code for _ in range(5)]
        assert 429 in codes
    finally:
        st.stop()


def test_concurrent_searches_coalesce(tmp_path):
    """Concurrent single-search requests micro-batch into ONE batched
    engine call (queries as a batch dimension — the TPU-native answer to
    the reference's goroutine fan-out), and every caller still gets ITS
    OWN result."""
    from concurrent.futures import ThreadPoolExecutor

    db = DB(DBOptions(
        storage_path=str(tmp_path / "co-data"),
        default_engine="exact", flush_interval_s=0,
    ))
    st = ServerThread(db, ServerConfig(
        host="127.0.0.1", port=18085, enable_metrics_server=False,
        coalesce_window_ms=50.0,  # wide window: one flush for the burst
    )).start()
    base = "http://127.0.0.1:18085"
    try:
        requests.post(f"{base}/api/v1/collections", json={
            "name": "co", "dimension": D, "distance_function": "euclidean",
        })
        rng = np.random.default_rng(1)
        vecs = rng.normal(size=(32, D)).astype(np.float32) * 10
        requests.post(f"{base}/api/v1/collections/co/vectors/batch", json={
            "vectors": [
                {"id": f"v{i}", "vector": vecs[i].tolist()} for i in range(32)
            ],
        })
        coll = db.get_collection("co")
        calls = []
        orig = coll.search_batch
        coll.search_batch = lambda reqs: (calls.append(len(reqs)), orig(reqs))[1]

        def one(i):
            r = requests.post(f"{base}/api/v1/collections/co/search", json={
                "vector": vecs[i].tolist(), "top_k": 1,
            })
            assert r.status_code == 200, r.text
            return r.json()["results"][0]["id"]

        with ThreadPoolExecutor(max_workers=12) as ex:
            got = list(ex.map(one, range(12)))
        assert got == [f"v{i}" for i in range(12)]  # per-caller results
        assert sum(calls) == 12
        assert len(calls) <= 3, calls  # burst coalesced into few dispatches
    finally:
        st.stop()


def test_search_backlog_shed(tmp_path):
    """Past the configured backlog, searches get an immediate 429 with a
    Retry-After header instead of queueing unboundedly (VERDICT r4 #8 —
    at 256 clients p95 was seconds of pure backlog; the per-IP limiter,
    like the reference's middleware.go:79-139, can't see aggregate load)."""
    from concurrent.futures import ThreadPoolExecutor

    db = DB(DBOptions(
        storage_path=str(tmp_path / "shed-data"),
        default_engine="exact", flush_interval_s=0,
    ))
    st = ServerThread(db, ServerConfig(
        host="127.0.0.1", port=18086, enable_metrics_server=False,
        coalesce_window_ms=50.0, coalesce_max_batch=4,
        search_backlog=4,  # tiny: the 16-client burst must shed
    )).start()
    base = "http://127.0.0.1:18086"
    try:
        requests.post(f"{base}/api/v1/collections", json={
            "name": "sh", "dimension": D, "distance_function": "euclidean",
        })
        rng = np.random.default_rng(2)
        vecs = rng.normal(size=(16, D)).astype(np.float32)
        requests.post(f"{base}/api/v1/collections/sh/vectors/batch", json={
            "vectors": [
                {"id": f"v{i}", "vector": vecs[i].tolist()} for i in range(16)
            ],
        })
        coll = db.get_collection("sh")
        orig = coll.search_batch

        def slow_batch(reqs):
            time.sleep(0.3)  # hold the backlog full across the burst
            return orig(reqs)

        coll.search_batch = slow_batch

        def one(i):
            return requests.post(
                f"{base}/api/v1/collections/sh/search",
                json={"vector": vecs[i].tolist(), "top_k": 1},
            )

        with ThreadPoolExecutor(max_workers=16) as ex:
            rs = list(ex.map(one, range(16)))
        codes = [r.status_code for r in rs]
        assert codes.count(200) >= 4  # admitted work completes
        shed = [r for r in rs if r.status_code == 429]
        assert shed, codes  # the burst past backlog=4 was refused
        for r in shed:
            assert int(r.headers["Retry-After"]) >= 1
            assert "retry" in r.json()["error"]
    finally:
        st.stop()


def test_engine_config_create_and_validation(api):
    # per-collection JSON engine knobs reach the engine (ivf flat knobs)
    r = requests.post(f"{api}/api/v1/collections", json={
        "name": "ec1", "dimension": D, "distance_function": "euclidean",
        "engine": "ivf",
        "engine_config": {"n_probe": 4, "build_threshold": 64},
    })
    assert r.status_code == 201, r.text
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(96, D)).astype(np.float32)
    r = requests.post(f"{api}/api/v1/collections/ec1/vectors/batch", json={
        "vectors": [{"id": f"e{i}", "vector": vecs[i].tolist()}
                    for i in range(96)],
    })
    assert r.status_code == 201
    r = requests.post(f"{api}/api/v1/collections/ec1/search", json={
        "vector": vecs[7].tolist(), "top_k": 3,
    })
    assert r.status_code == 200
    assert r.json()["results"][0]["id"] == "e7"
    # unknown knob -> 400, not 500 (dataclass TypeError is translated)
    r = requests.post(f"{api}/api/v1/collections", json={
        "name": "ec2", "dimension": D, "engine": "ivf",
        "engine_config": {"no_such_knob": 1},
    })
    assert r.status_code == 400, r.text
    # non-object engine_config -> 400
    r = requests.post(f"{api}/api/v1/collections", json={
        "name": "ec3", "dimension": D, "engine_config": 5,
    })
    assert r.status_code == 400
    # hybrid requires namespaced blocks
    r = requests.post(f"{api}/api/v1/collections", json={
        "name": "ec4", "dimension": D, "engine": "hybrid",
        "engine_config": {"recall_target": 0.9},
    })
    assert r.status_code == 400
    r = requests.post(f"{api}/api/v1/collections", json={
        "name": "ec5", "dimension": D, "engine": "hybrid",
        "engine_config": {"ivf": {"n_probe": 2, "build_threshold": 64},
                          "adaptive": {"exploration_factor": 0.0}},
    })
    assert r.status_code == 201, r.text
