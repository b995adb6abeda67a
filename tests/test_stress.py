"""Randomized-op, concurrency, determinism, and edge-case batteries.

Mirrors the reference's test taxonomy (SURVEY.md §4.3-4.6): fuzz-style random
op sequences checked against a dict-model oracle, concurrent mixed ops on one
collection (the stand-in for Go's -race stress tests — host mutation is
writer-locked, device state is functional), determinism assertions, and the
edge battery (empty index, k=0, duplicates, delete-all, huge k, nil
metadata)."""

import threading

import numpy as np
import pytest

from quiver_tpu.core.collection import Collection
from quiver_tpu.core.db import DB, DBOptions
from quiver_tpu.types import SearchOptions, SearchRequest

D = 8


# ------------------------------------------------------------ fuzz vs model

def test_random_ops_match_model():
    rng = np.random.default_rng(12)
    c = Collection("fuzz", D, "euclidean")
    model: dict[str, np.ndarray] = {}
    next_id = 0
    for step in range(300):
        op = rng.random()
        if op < 0.5 or not model:
            vid = f"f{next_id}"
            next_id += 1
            vec = rng.normal(size=D).astype(np.float32)
            c.add(vid, vec, {"step": step})
            model[vid] = vec
        elif op < 0.7:
            vid = str(rng.choice(list(model.keys())))
            c.delete(vid)
            del model[vid]
        elif op < 0.8 and model:
            vid = str(rng.choice(list(model.keys())))
            vec = rng.normal(size=D).astype(np.float32)
            c.update(vid, vector=vec)
            model[vid] = vec
        else:
            q = rng.normal(size=D).astype(np.float32)
            k = int(rng.integers(1, 8))
            got = c.search(SearchRequest(vector=q, top_k=k)).results
            # model oracle: exact k nearest
            ids = list(model.keys())
            dists = [float(np.linalg.norm(q - model[i])) for i in ids]
            want = [i for _, i in sorted(zip(dists, ids))[:k]]
            assert [r.id for r in got] == want, f"step {step}"
    assert c.size == len(model)


# ------------------------------------------------------------- concurrency

def test_concurrent_mixed_ops():
    c = Collection("conc", D, "euclidean")
    rng = np.random.default_rng(0)
    base = rng.normal(size=(100, D)).astype(np.float32)
    c.add_batch([f"base{i}" for i in range(100)], base)
    errors: list[Exception] = []

    def worker(tid: int):
        try:
            trng = np.random.default_rng(tid)
            for i in range(30):
                r = trng.random()
                if r < 0.4:
                    c.add(f"t{tid}-{i}", trng.normal(size=D).astype(np.float32))
                elif r < 0.6:
                    try:
                        c.delete(f"t{tid}-{i - 1}")
                    except KeyError:
                        pass
                else:
                    resp = c.search(SearchRequest(
                        vector=trng.normal(size=D).astype(np.float32), top_k=5
                    ))
                    assert len(resp.results) <= 5
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    # store is consistent: every live id resolves round-trip
    for vid in c.store.ids():
        assert c.store.id_of(c.store.slot_of(vid)) == vid


def test_concurrent_flush_and_writes(tmp_path):
    db = DB(DBOptions(storage_path=str(tmp_path / "d"), default_engine="exact",
                      flush_interval_s=0))
    c = db.create_collection("cf", D, "euclidean")
    rng = np.random.default_rng(1)
    errors = []

    def writer():
        try:
            for i in range(40):
                c.add(f"w{i}", rng.normal(size=D).astype(np.float32))
        except Exception as e:
            errors.append(e)

    def flusher():
        try:
            for _ in range(10):
                db.persistence.flush_collection(c)
        except Exception as e:
            errors.append(e)

    ts = [threading.Thread(target=writer), threading.Thread(target=flusher)]
    for t in ts:
        t.start()
    for t in ts:
        # generous: fsync-heavy writers crawl when the whole suite hammers
        # the same disk; a silent timeout here would truncate the test
        t.join(timeout=600)
        assert not t.is_alive(), "worker did not finish; raise the timeout"
    assert not errors, errors
    db.persistence.flush_collection(c)
    db.close()
    db2 = DB(DBOptions(storage_path=str(tmp_path / "d"), default_engine="exact",
                       flush_interval_s=0))
    assert db2.get_collection("cf").size == 40
    db2.close()


# ------------------------------------------------------------ determinism

def test_exact_search_deterministic():
    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(200, D)).astype(np.float32)
    q = rng.normal(size=(4, D)).astype(np.float32)
    results = []
    for _ in range(2):
        c = Collection("det", D, "euclidean")
        c.add_batch([f"v{i}" for i in range(200)], vecs)
        rs = c.search_batch([SearchRequest(vector=q[b], top_k=7) for b in range(4)])
        results.append([[r.id for r in resp.results] for resp in rs])
    assert results[0] == results[1]


# ------------------------------------------------------------ edge battery

def test_edge_cases():
    c = Collection("edge", D, "euclidean")
    q = np.ones(D, np.float32)

    # empty index
    assert c.search(SearchRequest(vector=q, top_k=3)).results == []
    # k = 0 rejected
    with pytest.raises(ValueError):
        c.search(SearchRequest(vector=q, top_k=0))
    # nil metadata fine
    c.add("a", q, None)
    # duplicate rejected
    with pytest.raises(ValueError):
        c.add("a", q)
    # huge k capped at size
    assert len(c.search(SearchRequest(vector=q, top_k=10_000)).results) == 1
    # delete-all then search
    c.delete("a")
    assert c.search(SearchRequest(vector=q, top_k=3)).results == []
    # zero vector with cosine: distance 1 by the zero-guard
    cz = Collection("edgez", D, "cosine")
    cz.add("z", np.zeros(D, np.float32))
    r = cz.search(SearchRequest(vector=q, top_k=1)).results[0]
    assert r.distance == pytest.approx(1.0)
    # include_vectors copies, not aliases (reference immutability tests,
    # pkg/persistence/collection_test.go:613-682)
    cz.add("one", q)
    resp = cz.search(SearchRequest(
        vector=q, top_k=1, options=SearchOptions(include_vectors=True)))
    resp.results[0].vector[:] = 999.0
    assert cz.get("one").values[0] == pytest.approx(1.0)


def test_one_dimensional_collection():
    c = Collection("one", 1, "euclidean")
    c.add_batch([f"v{i}" for i in range(5)], np.arange(5, dtype=np.float32)[:, None])
    r = c.search(SearchRequest(vector=np.asarray([2.2], np.float32), top_k=2))
    assert [x.id for x in r.results] == ["v2", "v3"]
