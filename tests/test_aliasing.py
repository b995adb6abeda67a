"""Stored-data aliasing/immutability and concurrent API-level stress.

Mirrors the reference test classes the round-3 verdict flagged as
unmirrored (VERDICT r3 next #10):

* stored-vector / stored-metadata immutability in both directions
  (reference: pkg/persistence/collection_test.go:613-682 — there the
  JSON round-trip guarantees copies; here the store must copy
  explicitly);
* concurrent API-level write + flush + search stress (reference:
  pkg/persistence/stress_test.go:226, pkg/hybrid/hybrid_stress_test.go:14
  — repo stress tests previously stopped at the engine layer).
"""

import threading

import numpy as np
import pytest

from quiver_tpu.core.collection import Collection
from quiver_tpu.core.db import DB, DBOptions
from quiver_tpu.core.store import VectorStore
from quiver_tpu.types import SearchOptions, SearchRequest

D = 16


def mk_store(n=8):
    rng = np.random.default_rng(0)
    s = VectorStore(dim=D, metric="euclidean")
    vecs = rng.normal(size=(n, D)).astype(np.float32)
    mds = [{"tag": f"t{i}", "nums": [i, i + 1]} for i in range(n)]
    s.add_batch([f"v{i}" for i in range(n)], vecs, mds)
    return s, vecs, mds


def test_input_vector_mutation_does_not_affect_store():
    s, vecs, _ = mk_store()
    orig = vecs[3].copy()
    vecs[3][:] = 999.0  # caller scribbles on its own buffer after Add
    np.testing.assert_array_equal(s.get("v3").values, orig)


def test_input_metadata_mutation_does_not_affect_store():
    s, _, mds = mk_store()
    mds[2]["tag"] = "mutated"
    mds[2]["nums"].append(777)  # nested mutation too
    got = s.get("v2").metadata
    assert got == {"tag": "t2", "nums": [2, 3]}


def test_returned_vector_mutation_does_not_affect_store():
    s, vecs, _ = mk_store()
    rec = s.get("v1")
    rec.values[:] = -5.0
    np.testing.assert_array_equal(s.get("v1").values, vecs[1])


def test_returned_metadata_mutation_does_not_affect_store():
    s, _, _ = mk_store()
    rec = s.get("v4")
    rec.metadata["tag"] = "evil"
    rec.metadata["nums"].append(-1)
    assert s.get("v4").metadata == {"tag": "t4", "nums": [4, 5]}


def test_update_metadata_does_not_alias_caller():
    s, _, _ = mk_store()
    md = {"k": ["a"]}
    s.update_batch(["v0"], metadata=[md])
    md["k"].append("b")
    assert s.get("v0").metadata == {"k": ["a"]}


def test_search_result_metadata_mutation_does_not_affect_store():
    rng = np.random.default_rng(1)
    c = Collection("alias", dim=D, metric="euclidean")
    vecs = rng.normal(size=(6, D)).astype(np.float32)
    c.add_batch([f"r{i}" for i in range(6)], vecs,
                [{"m": {"deep": [i]}} for i in range(6)])
    resp = c.search(SearchRequest(
        vector=vecs[2], top_k=1,
        options=SearchOptions(include_metadata=True, include_vectors=True)))
    item = resp.results[0]
    assert item.id == "r2"
    item.metadata["m"]["deep"].append(99)
    item.vector[:] = 0.0
    again = c.search(SearchRequest(
        vector=vecs[2], top_k=1,
        options=SearchOptions(include_metadata=True)))
    assert again.results[0].metadata == {"m": {"deep": [2]}}
    np.testing.assert_array_equal(c.store.get("r2").values, vecs[2])


@pytest.mark.slow
def test_concurrent_api_write_flush_search_stress(tmp_path):
    """DB-level: writer, deleter, searcher, and flusher threads race for a
    few hundred ops; no exceptions, durability intact after reload
    (reference stress_test.go:226 shape)."""
    rng = np.random.default_rng(7)
    db = DB(DBOptions(storage_path=str(tmp_path), flush_interval_s=0,
                      default_engine="exact"))
    coll = db.create_collection("s", dim=D, metric="euclidean")
    base = rng.normal(size=(64, D)).astype(np.float32)
    coll.add_batch([f"b{i}" for i in range(64)], base,
                   [{"i": i} for i in range(64)])

    stop = threading.Event()
    errors: list[BaseException] = []
    written: list[str] = []

    def guard(fn):
        def run():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — surface in main
                errors.append(e)
                stop.set()
        return run

    def writer():
        i = 0
        while not stop.is_set() and i < 40:
            ids = [f"w{i}_{j}" for j in range(8)]
            coll.add_batch(ids, rng.normal(size=(8, D)).astype(np.float32),
                           [{"w": i}] * 8)
            written.extend(ids)
            i += 1

    def deleter():
        i = 0
        while not stop.is_set() and i < 30:
            coll.delete(f"b{i % 64}")  # idempotent-ish churn
            i += 1

    def searcher():
        for _ in range(60):
            if stop.is_set():
                return
            q = rng.normal(size=(D,)).astype(np.float32)
            resp = coll.search(SearchRequest(vector=q, top_k=5))
            assert len(resp.results) <= 5

    def flusher():
        for _ in range(10):
            if stop.is_set():
                return
            db.persistence.flush_collection(coll)

    threads = [threading.Thread(target=guard(f))
               for f in (writer, deleter, searcher, flusher)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    db.persistence.flush_collection(coll)
    db.close()

    db2 = DB(DBOptions(storage_path=str(tmp_path), flush_interval_s=0,
                       default_engine="exact"))
    c2 = db2.get_collection("s")
    for vid in written:  # every write that returned must be durable
        assert c2.store.get(vid) is not None
    db2.close()
