"""Topology sidecar tests: HNSW graph survives a flush/load cycle without a
rebuild (improvement over the reference, which always rebuilds —
SURVEY.md §5.4), including WAL mutations between flush and reload."""

import numpy as np
import pytest

from quiver_tpu.core.db import DB, DBOptions
from quiver_tpu.types import SearchRequest

D = 16
N = 400


def opts(tmp_path, **kw):
    kw.setdefault("storage_path", str(tmp_path / "data"))
    kw.setdefault("default_engine", "hnsw")
    kw.setdefault("flush_interval_s", 0)
    kw.setdefault("engine_config", {"build_batch": 128})
    return DBOptions(**kw)


def seed(db, n=N):
    rng = np.random.default_rng(0)
    c = db.create_collection("g", D, "euclidean")
    vecs = rng.normal(size=(n, D)).astype(np.float32)
    c.add_batch([f"v{i}" for i in range(n)], vecs)
    return c, vecs


def test_topology_roundtrip_identical_graph(tmp_path):
    db = DB(opts(tmp_path))
    c, vecs = seed(db)
    adj_before = c.engine.layer0.adj.copy()
    nodes_before = c.engine.layer0.nodes.copy()
    ep_id = c.store.id_of(c.engine.entry_point)
    db.close()

    assert (tmp_path / "data" / "g" / "topology.npz").exists()
    db2 = DB(opts(tmp_path))
    c2 = db2.get_collection("g")
    eng = c2.engine
    # graph restored: same node count, same entry id, edges map to same ids
    assert len(eng.layer0.nodes) == len(nodes_before)
    assert c2.store.id_of(eng.entry_point) == ep_id
    # edge sets equal under id mapping
    id_of_old = {int(s): f"v{i}" for i, s in enumerate(range(N))}
    for row in range(0, N, 37):
        old_ids = {id_of_old[int(x)] for x in adj_before[row] if x >= 0}
        new_row = eng.layer0.pos[c2.store.slot_of(id_of_old[int(nodes_before[row])])]
        new_ids = {
            c2.store.id_of(int(x))
            for x in eng.layer0.adj[new_row]
            if x >= 0
        }
        assert old_ids == new_ids
    # and queries work without any rebuild
    _, slots = eng.search_slots(vecs[:4], k=5)
    assert all(c2.store.id_of(int(slots[b, 0])) == f"v{b}" for b in range(4))
    db2.close()


def test_topology_with_wal_mutations(tmp_path):
    db = DB(opts(tmp_path))
    c, vecs = seed(db)
    db.persistence.flush_collection(c)  # sidecar written here
    # post-flush WAL-only mutations: delete two, add two
    c.delete_batch(["v0", "v5"])
    extra = np.random.default_rng(9).normal(size=(2, D)).astype(np.float32)
    c.add_batch(["w0", "w1"], extra)
    del db  # crash: no close/flush — WAL must carry the delta

    db2 = DB(opts(tmp_path))
    c2 = db2.get_collection("g")
    assert c2.size == N
    assert "v0" not in c2.store and "w0" in c2.store
    resp = c2.search(SearchRequest(vector=extra[0], top_k=3))
    assert resp.results[0].id == "w0"
    resp = c2.search(SearchRequest(vector=vecs[0], top_k=N))
    assert "v0" not in [r.id for r in resp.results]
    db2.close()


def test_exact_engine_writes_no_sidecar(tmp_path):
    db = DB(opts(tmp_path, default_engine="exact", engine_config={}))
    c, _ = seed(db, n=50)
    db.close()
    assert not (tmp_path / "data" / "g" / "topology.npz").exists()


def test_corrupt_sidecar_falls_back_to_rebuild(tmp_path):
    db = DB(opts(tmp_path))
    c, vecs = seed(db)
    db.close()
    topo = tmp_path / "data" / "g" / "topology.npz"
    topo.write_bytes(b"garbage")
    db2 = DB(opts(tmp_path))
    c2 = db2.get_collection("g")
    _, slots = c2.engine.search_slots(vecs[:2], k=3)
    assert all(c2.store.id_of(int(slots[b, 0])) == f"v{b}" for b in range(2))
    db2.close()


def test_hybrid_engine_sidecar(tmp_path):
    db = DB(opts(tmp_path, default_engine="hybrid",
                 engine_config={"build_batch": 128}))
    rng = np.random.default_rng(1)
    c = db.create_collection("h", D, "euclidean")
    vecs = rng.normal(size=(600, D)).astype(np.float32)
    c.add_batch([f"v{i}" for i in range(600)], vecs)  # above build threshold
    assert c.engine._graph_built
    db.close()
    db2 = DB(opts(tmp_path, default_engine="hybrid",
                  engine_config={"build_batch": 128}))
    c2 = db2.get_collection("h")
    assert c2.engine._graph_built  # restored from sidecar, not rebuilt
    _, slots = c2.engine.search_slots(vecs[:2], k=3, strategy="hnsw")
    assert all(c2.store.id_of(int(slots[b, 0])) == f"v{b}" for b in range(2))
    db2.close()


def test_engine_config_persists_across_reload(tmp_path):
    """Per-collection JSON engine knobs (create_collection engine_config)
    are persisted in config.json and reapplied on load — a collection
    tuned with {"ivf": {"recall_target": ...}} must not silently reload
    at the DB-wide defaults."""
    db = DB(opts(tmp_path, default_engine="exact", engine_config={}))
    c = db.create_collection(
        "t", D, "euclidean", engine="ivf",
        engine_config={"ivf": {"n_probe": 4, "build_threshold": 64}},
    )
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(128, D)).astype(np.float32)
    c.add_batch([f"v{i}" for i in range(128)], vecs)
    assert c.engine.config.n_probe == 4
    assert c.engine.config.build_threshold == 64
    db.close()

    db2 = DB(opts(tmp_path, default_engine="exact", engine_config={}))
    c2 = db2.get_collection("t")
    assert c2.engine_kind == "ivf"
    assert c2.engine.config.n_probe == 4
    assert c2.engine.config.build_threshold == 64
    assert c2.engine_config_json == {"ivf": {"n_probe": 4, "build_threshold": 64}}
    res = c2.search(SearchRequest(vector=vecs[5], top_k=1))
    assert res.results[0].id == "v5"
    db2.close()
