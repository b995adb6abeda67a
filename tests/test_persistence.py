"""Persistence + DB tests: Parquet round-trip, JSON fallback, WAL replay
(incl. deletes), atomic writes, backup/restore, startup load, flush cycle.

Mirrors the reference's pkg/persistence durability battery
(durability_test.go: atomic rename, simulated crash .tmp files, WAL logging
and replay, Parquet read integrity, JSON fallback, WAL truncation)."""

import json
import os

import numpy as np
import pytest

from quiver_tpu.core.db import DB, DBOptions
from quiver_tpu.persistence.manager import (
    CollectionConfig,
    PersistenceManager,
    read_wal,
    read_wal_any,
)
from quiver_tpu.persistence.parquet_io import (
    read_vectors_json,
    read_vectors_parquet,
    safe_write_file,
    write_vectors_json,
    write_vectors_parquet,
)
from quiver_tpu.types import SearchRequest

D = 6


def opts(tmp_path, **kw):
    kw.setdefault("storage_path", str(tmp_path / "data"))
    kw.setdefault("default_engine", "exact")
    kw.setdefault("flush_interval_s", 0)  # no background thread in tests
    return DBOptions(**kw)


def seed(db, n=20, name="c1"):
    rng = np.random.default_rng(1)
    c = db.create_collection(name, D, "euclidean")
    vecs = rng.normal(size=(n, D)).astype(np.float32)
    c.add_batch(
        [f"v{i}" for i in range(n)], vecs,
        [{"i": i, "tag": "a" if i % 2 else "b"} for i in range(n)],
    )
    return c, vecs


# ------------------------------------------------------------------ parquet

def test_parquet_roundtrip(tmp_path):
    p = str(tmp_path / "v.parquet")
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(2500, D)).astype(np.float32)  # > one read batch
    ids = [f"id{i}" for i in range(2500)]
    mds = [{"x": i} if i % 3 else None for i in range(2500)]
    write_vectors_parquet(p, ids, vecs, mds)
    rids, rvecs, rmds = read_vectors_parquet(p)
    assert rids == ids
    np.testing.assert_array_equal(rvecs, vecs)
    assert rmds == mds
    assert not os.path.exists(p + ".tmp")  # atomic rename cleaned up


def test_parquet_empty(tmp_path):
    p = str(tmp_path / "e.parquet")
    write_vectors_parquet(p, [], np.zeros((0, D), np.float32), [])
    ids, vecs, mds = read_vectors_parquet(p)
    assert ids == [] and len(vecs) == 0


def test_json_fallback_roundtrip(tmp_path):
    p = str(tmp_path / "v.json")
    vecs = np.ones((3, D), np.float32)
    write_vectors_json(p, ["a", "b", "c"], vecs, [None, {"k": 1}, None])
    ids, rvecs, mds = read_vectors_json(p)
    assert ids == ["a", "b", "c"]
    np.testing.assert_array_equal(rvecs, vecs)
    assert mds[1] == {"k": 1}


def test_safe_write_atomic(tmp_path):
    p = str(tmp_path / "f.bin")
    safe_write_file(p, b"hello")
    assert open(p, "rb").read() == b"hello"
    safe_write_file(p, b"world")  # overwrite is atomic too
    assert open(p, "rb").read() == b"world"
    assert not os.path.exists(p + ".tmp")


# ---------------------------------------------------------------------- wal

def test_wal_replay_add_and_delete(tmp_path):
    mgr = PersistenceManager(str(tmp_path / "data"), flush_interval_s=0)
    os.makedirs(mgr.collection_dir("c"), exist_ok=True)
    w = mgr.wal("c")
    w.append("add", "a", vector=np.ones(D, np.float32), metadata={"k": 1})
    w.append("add", "b", vector=np.zeros(D, np.float32))
    w.append("delete", "a")
    ids, vecs, mds = mgr.load_collection_data("c")
    # deletes ARE replayed (improvement over the reference, which would
    # resurrect "a" — manager.go:442-455)
    assert ids == ["b"]
    np.testing.assert_array_equal(vecs[0], np.zeros(D))


def test_wal_torn_tail_tolerated(tmp_path):
    mgr = PersistenceManager(str(tmp_path / "data"), flush_interval_s=0)
    os.makedirs(mgr.collection_dir("c"), exist_ok=True)
    w = mgr.wal("c")
    w.append("add", "a", vector=np.ones(D, np.float32))
    with open(mgr._wal_path("c"), "a") as f:
        f.write('{"type": "add", "vector_id": "torn...')  # simulated crash
    entries = read_wal_any(mgr._wal_path("c"))
    assert len(entries) == 1 and entries[0]["vector_id"] == "a"


def test_wal_truncated_after_flush(tmp_path):
    db = DB(opts(tmp_path))
    c, _ = seed(db)
    wal_path = db.persistence._wal_path("c1")
    assert os.path.exists(wal_path) and os.path.getsize(wal_path) > 0
    db.persistence.flush_collection(c)
    # truncated after snapshot: removed (python writer) or emptied in place
    # (native writer truncates without destroying the shared handle)
    assert (not os.path.exists(wal_path)) or os.path.getsize(wal_path) == 0
    db.close()


def test_write_during_flush_survives_crash(tmp_path, monkeypatch):
    """A write acknowledged while the flush's disk phase runs must survive a
    crash: the flush seals the WAL under the collection lock BEFORE
    snapshotting, so the mid-flush write goes to the fresh live segment,
    which is never deleted. (The reference loses this write: snapshot →
    truncate window, manager.go:267-351 vs :488-507.)"""
    import quiver_tpu.persistence.manager as mgr_mod

    db = DB(opts(tmp_path))
    c, _ = seed(db, n=4)
    real_write = mgr_mod.write_vectors_parquet
    state = {"fired": False}

    def write_and_mutate(path, ids, vecs, mds):
        real_write(path, ids, vecs, mds)
        if not state["fired"]:
            state["fired"] = True
            # a client write lands while the snapshot is being persisted
            c.add("mid_flush", np.full(D, 7, np.float32), {"late": True})

    monkeypatch.setattr(mgr_mod, "write_vectors_parquet", write_and_mutate)
    db.persistence.flush_collection(c)
    assert state["fired"]
    # simulate crash: reload from disk without close()/flush
    del db, c
    db2 = DB(opts(tmp_path))
    c2 = db2.get_collection("c1")
    assert c2.size == 5 and "mid_flush" in c2.store
    db2.close()


def test_failed_flush_keeps_sealed_segment(tmp_path, monkeypatch):
    """If both parquet AND json snapshot writes fail, the sealed WAL segment
    must remain on disk and replay on load — no acknowledged write is lost."""
    import quiver_tpu.persistence.manager as mgr_mod

    db = DB(opts(tmp_path))
    c, vecs = seed(db, n=3)
    boom = lambda *a, **k: (_ for _ in ()).throw(OSError("disk full"))
    monkeypatch.setattr(mgr_mod, "write_vectors_parquet", boom)
    monkeypatch.setattr(mgr_mod, "write_vectors_json", boom)
    with pytest.raises(OSError):
        db.persistence.flush_collection(c)
    # the sealed segment survived the failed flush
    assert db.persistence._wal_segments("c1")
    # a later write goes to the new live segment; both replay in order
    c.add("post_fail", np.ones(D, np.float32))
    monkeypatch.undo()
    del db, c
    db2 = DB(opts(tmp_path))
    c2 = db2.get_collection("c1")
    assert c2.size == 4 and "post_fail" in c2.store and "v0" in c2.store
    db2.close()


def test_wal_segments_replay_in_order(tmp_path):
    """Sealed segments + live WAL replay oldest-first so add/delete/re-add
    sequences resolve correctly across segment boundaries."""
    mgr = PersistenceManager(str(tmp_path / "data"), flush_interval_s=0)
    os.makedirs(mgr.collection_dir("c"), exist_ok=True)
    mgr.wal("c").append("add", "a", vector=np.ones(D, np.float32))
    mgr.rotate_wal("c")
    mgr.wal("c").append("delete", "a")
    mgr.wal("c").append("add", "b", vector=np.zeros(D, np.float32))
    mgr.rotate_wal("c")
    mgr.wal("c").append("add", "a", vector=np.full(D, 2, np.float32))
    ids, vecs, _ = mgr.load_collection_data("c")
    assert sorted(ids) == ["a", "b"]
    np.testing.assert_array_equal(vecs[ids.index("a")], np.full(D, 2))


def test_engine_kind_survives_reload(tmp_path):
    """A collection created with an explicit engine must reload with the
    same engine even under a different DB default (reference reconstructs
    the right index from persisted config — db.go:150-206, 380-397)."""
    from quiver_tpu.index.hnsw import HNSWIndex

    db = DB(opts(tmp_path, default_engine="exact"))
    c = db.create_collection("g", D, "euclidean", engine="hnsw")
    rng = np.random.default_rng(2)
    c.add_batch([f"v{i}" for i in range(8)],
                rng.normal(size=(8, D)).astype(np.float32))
    db.close()

    db2 = DB(opts(tmp_path, default_engine="exact"))
    c2 = db2.get_collection("g")
    assert c2.engine_kind == "hnsw"
    assert isinstance(c2.engine, HNSWIndex)
    db2.close()

    # pre-engine-field configs (engine missing) fall back to the DB default
    cfg_path = os.path.join(str(tmp_path / "data"), "g", "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg.pop("engine")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    db3 = DB(opts(tmp_path, default_engine="exact"))
    assert db3.get_collection("g").engine_kind == "exact"
    db3.close()


# ----------------------------------------------------------------- manager

def test_flush_then_load_roundtrip(tmp_path):
    db = DB(opts(tmp_path))
    c, vecs = seed(db)
    c.delete("v0")
    db.close()  # flushes

    db2 = DB(opts(tmp_path))
    assert db2.list_collections() == ["c1"]
    c2 = db2.get_collection("c1")
    assert c2.size == 19
    assert c2.metric.value == "euclidean"  # metric enum survived (bug fixed)
    r = c2.search(SearchRequest(vector=vecs[3], top_k=1))
    assert r.results[0].id == "v3"
    # metadata survived; facet filters still work
    from quiver_tpu.facets.filters import EqualityFilter
    items = c2.search_with_facets(vecs[0], 30, [EqualityFilter("tag", "a")])
    assert all(int(i.id[1:]) % 2 == 1 for i in items)
    db2.close()


def test_unflushed_writes_survive_via_wal(tmp_path):
    db = DB(opts(tmp_path))
    c, vecs = seed(db, n=5)
    # no flush, simulate crash: just drop the DB object without close()
    del db
    db2 = DB(opts(tmp_path))
    c2 = db2.get_collection("c1")
    assert c2.size == 5
    r = c2.search(SearchRequest(vector=vecs[2], top_k=1))
    assert r.results[0].id == "v2"
    db2.close()


def test_parquet_corruption_falls_back_to_json(tmp_path):
    db = DB(opts(tmp_path))
    c, vecs = seed(db, n=4)
    db.persistence.flush_collection(c)
    cdir = db.persistence.collection_dir("c1")
    # write a JSON fallback, corrupt the parquet
    write_vectors_json(os.path.join(cdir, "vectors.json"),
                       ["j1"], np.ones((1, D), np.float32), [None])
    with open(os.path.join(cdir, "vectors.parquet"), "wb") as f:
        f.write(b"not parquet")
    db.close = lambda: None  # avoid reflush clobbering our corruption
    db2 = DB(opts(tmp_path))
    assert db2.get_collection("c1").size == 1  # loaded from JSON fallback
    db2.close()


def test_config_roundtrip(tmp_path):
    cfg = CollectionConfig(name="x", dimension=4, distance_func="manhattan",
                           facet_fields=["a", "b"])
    data = cfg.to_json()
    back = CollectionConfig.from_json(data)
    assert back == cfg


# ---------------------------------------------------------------- backup/db

def test_backup_restore_roundtrip(tmp_path):
    db = DB(opts(tmp_path))
    c, vecs = seed(db)
    backup_dir = str(tmp_path / "backup")
    db.backup(backup_dir)
    # destructive changes after backup
    c.delete_batch([f"v{i}" for i in range(10)])
    db.create_collection("c2", D)
    assert c.size == 10
    db.restore(backup_dir)
    assert db.list_collections() == ["c1"]
    c1 = db.get_collection("c1")
    assert c1.size == 20
    r = c1.search(SearchRequest(vector=vecs[3], top_k=1))
    assert r.results[0].id == "v3"
    db.close()


def test_backup_skips_wal(tmp_path):
    db = DB(opts(tmp_path))
    seed(db)
    backup_dir = str(tmp_path / "b2")
    db.backup(backup_dir)
    for dirpath, _, files in os.walk(backup_dir):
        assert not any(f.endswith(".wal") for f in files)
    db.close()


def test_db_collection_lifecycle(tmp_path):
    db = DB(opts(tmp_path))
    db.create_collection("a", D)
    with pytest.raises(ValueError, match="already exists"):
        db.create_collection("a", D)
    with pytest.raises(KeyError):
        db.get_collection("nope")
    db.delete_collection("a")
    assert db.list_collections() == []
    assert not os.path.isdir(db.persistence.collection_dir("a"))
    db.close()


def test_db_without_persistence():
    db = DB(DBOptions(enable_persistence=False, default_engine="exact"))
    c = db.create_collection("mem", D)
    c.add("x", np.ones(D, np.float32))
    assert c.search(SearchRequest(vector=np.ones(D, np.float32), top_k=1)).results[0].id == "x"
    db.close()


def test_db_options_validation():
    with pytest.raises(ValueError):
        DBOptions(default_engine="bogus").validate()
    with pytest.raises(ValueError):
        DBOptions(flush_interval_s=-1).validate()
    with pytest.raises(ValueError):
        DBOptions(storage_path="", enable_persistence=True).validate()


# ------------------------------------------------------------- native WAL

def test_native_wal_roundtrip(tmp_path):
    native = pytest.importorskip("quiver_tpu.native")
    if not native.available():
        pytest.skip("libquiver_wal.so not built")
    p = str(tmp_path / "n.wal")
    w = native.NativeWalWriter(p)
    w.append("add", "a", vector=np.ones(D, np.float32), metadata={"k": 1})
    w.append_many([("add", "b", np.zeros(D, np.float32), None),
                   ("delete", "a", None, None)])
    w.close()
    entries = native.read_native_wal(p)
    assert [e["type"] for e in entries] == ["add", "add", "delete"]
    assert entries[0]["metadata"] == {"k": 1}


def test_native_wal_torn_tail_cut_exactly(tmp_path):
    native = pytest.importorskip("quiver_tpu.native")
    if not native.available():
        pytest.skip("libquiver_wal.so not built")
    p = str(tmp_path / "t.wal")
    w = native.NativeWalWriter(p)
    w.append("add", "a", vector=np.ones(D, np.float32))
    w.close()
    with open(p, "ab") as f:
        f.write(b"\x50\x00\x00\x00garbage-partial-frame")  # torn write
    entries = native.read_native_wal(p)
    assert len(entries) == 1 and entries[0]["vector_id"] == "a"


def test_db_uses_native_wal_and_recovers(tmp_path):
    from quiver_tpu import native
    if not native.available():
        pytest.skip("libquiver_wal.so not built")
    db = DB(opts(tmp_path))
    c, vecs = seed(db, n=6)
    # the collection holds a stable handle; the manager's live writer is native
    assert isinstance(db.persistence.wal("c1"), native.NativeWalWriter)
    del db  # crash without flush
    db2 = DB(opts(tmp_path))
    assert db2.get_collection("c1").size == 6
    r = db2.get_collection("c1").search(SearchRequest(vector=vecs[2], top_k=1))
    assert r.results[0].id == "v2"
    db2.close()
