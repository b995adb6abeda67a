"""Collection-layer tests: search pipeline, filters (device + host fallback),
fluent API, facet search, batched search, metrics hooks.

Mirrors the reference's pkg/core/collection_test.go + collection_facets_test.go
batteries, including the regression that facet search scans past the initial
window (TestSearchWithFacetsScansPastInitialWindow)."""

import numpy as np
import pytest

from quiver_tpu.core.collection import Collection
from quiver_tpu.facets.filters import EqualityFilter, RangeFilter, SetFilter
from quiver_tpu.types import Filter, SearchOptions, SearchRequest

D = 8


def make_collection(n=40, metric="euclidean", **kw):
    rng = np.random.default_rng(0)
    c = Collection("test", D, metric, **kw)
    vecs = rng.normal(size=(n, D)).astype(np.float32)
    mds = [
        {"category": "even" if i % 2 == 0 else "odd", "value": i,
         "tags": ["low" if i < n // 2 else "high"]}
        for i in range(n)
    ]
    c.add_batch([f"v{i}" for i in range(n)], vecs, mds)
    return c, vecs


def test_basic_search_pipeline():
    c, vecs = make_collection()
    resp = c.search(SearchRequest(vector=vecs[5], top_k=3))
    assert resp.results[0].id == "v5"
    assert resp.results[0].score == pytest.approx(1.0 - resp.results[0].distance)
    assert resp.metadata.index_size == 40
    assert resp.metadata.total_count == 3
    assert resp.metadata.search_time_ms > 0


def test_search_include_vectors_metadata():
    c, vecs = make_collection()
    req = SearchRequest(
        vector=vecs[3], top_k=1,
        options=SearchOptions(include_vectors=True, include_metadata=True),
    )
    r = c.search(req).results[0]
    np.testing.assert_allclose(r.vector, vecs[3], rtol=1e-6)
    assert r.metadata["category"] == "odd"


def test_search_device_compiled_filter():
    c, vecs = make_collection()
    req = SearchRequest(
        vector=vecs[0], top_k=5,
        filters=[Filter("category", "=", "even")],
        options=SearchOptions(include_metadata=True),
    )
    resp = c.search(req)
    assert len(resp.results) == 5
    for r in resp.results:
        assert r.metadata["category"] == "even"
    # filtered top-k is the TRUE top-k among matching rows
    all_resp = c.search(SearchRequest(vector=vecs[0], top_k=40,
                                      options=SearchOptions(include_metadata=True)))
    want = [r.id for r in all_resp.results if r.metadata["category"] == "even"][:5]
    assert [r.id for r in resp.results] == want


def test_search_host_fallback_filter_equals_device():
    # lexicographic range op can't compile -> host fallback; results must
    # equal what host-filter semantics dictate
    c, vecs = make_collection()
    req = SearchRequest(vector=vecs[0], top_k=40,
                        filters=[Filter("category", ">", "e")])
    resp = c.search(req)
    # "odd" > "e" and "even" > "e" lexicographically -> every row matches
    assert len(resp.results) == 40
    # and a bound that excludes "even" (< "f") keeps only odd rows
    resp = c.search(SearchRequest(vector=vecs[0], top_k=40,
                                  filters=[Filter("category", ">", "f")]))
    assert len(resp.results) == 20
    assert all(int(r.id[1:]) % 2 == 1 for r in resp.results)


def test_numeric_range_filters():
    c, vecs = make_collection()
    resp = c.search(SearchRequest(
        vector=vecs[0], top_k=40,
        filters=[Filter("value", ">=", 10), Filter("value", "<", 20)],
    ))
    got = sorted(int(r.id[1:]) for r in resp.results)
    assert got == list(range(10, 20))


def test_filter_no_matches():
    c, vecs = make_collection()
    resp = c.search(SearchRequest(vector=vecs[0], top_k=5,
                                  filters=[Filter("category", "=", "nope")]))
    assert resp.results == []


def test_search_with_facets():
    c, vecs = make_collection()
    items = c.search_with_facets(vecs[0], 5, [EqualityFilter("category", "EVEN")])
    assert len(items) == 5
    assert all(int(i.id[1:]) % 2 == 0 for i in items)
    items = c.search_with_facets(vecs[0], 3, [SetFilter("tags", ["high"])])
    assert all(int(i.id[1:]) >= 20 for i in items)
    items = c.search_with_facets(vecs[0], 50, [RangeFilter("value", min=35)])
    assert sorted(int(i.id[1:]) for i in items) == list(range(35, 40))


def test_facets_scan_past_initial_window():
    # All matching vectors are FAR from the query: the filtered top-k must
    # still find them (regression: collection_facets_test.go:522).
    c = Collection("far", D, "euclidean")
    near = np.zeros((30, D), np.float32) + np.arange(30, dtype=np.float32)[:, None] * 0.01
    far = np.full((5, D), 100.0, np.float32) + np.arange(5, dtype=np.float32)[:, None]
    c.add_batch([f"near{i}" for i in range(30)], near, [{"kind": "a"}] * 30)
    c.add_batch([f"far{i}" for i in range(5)], far, [{"kind": "b"}] * 5)
    items = c.search_with_facets(np.zeros(D, np.float32), 5, [EqualityFilter("kind", "b")])
    assert sorted(i.id for i in items) == [f"far{i}" for i in range(5)]


def test_fluent_search():
    c, vecs = make_collection()
    resp = (
        c.fluent_search(vecs[0])
        .with_k(5)
        .filter("category", "even")
        .include_metadata()
        .execute()
    )
    assert len(resp.results) == 5
    assert all(r.metadata["category"] == "even" for r in resp.results)


def test_fluent_fail_fast():
    c, _ = make_collection()
    with pytest.raises(ValueError, match="dimension"):
        c.fluent_search(np.ones(3, np.float32)).execute()
    with pytest.raises(ValueError, match="positive"):
        c.fluent_search(np.ones(D, np.float32)).with_k(0).execute()
    with pytest.raises(ValueError, match="field"):
        c.fluent_search(np.ones(D, np.float32)).filter("", 1).execute()


def test_fluent_filter_chain():
    c, vecs = make_collection()
    resp = (
        c.fluent_search(vecs[0])
        .with_k(40)
        .filter_greater_than("value", 5)
        .filter_less_than("value", 10)
        .execute()
    )
    assert sorted(int(r.id[1:]) for r in resp.results) == [6, 7, 8, 9]
    resp = (
        c.fluent_search(vecs[0]).with_k(40)
        .filter_in("value", [3, 5, 7]).execute()
    )
    assert sorted(int(r.id[1:]) for r in resp.results) == [3, 5, 7]
    resp = (
        c.fluent_search(vecs[0]).with_k(40)
        .filter_not_equals("category", "even").execute()
    )
    assert all(int(r.id[1:]) % 2 == 1 for r in resp.results)


def test_fluent_negative_example():
    c, vecs = make_collection()
    resp = (
        c.fluent_search(vecs[0])
        .with_k(5)
        .with_negative_example(vecs[1])
        .with_negative_weight(1.5)
        .execute()
    )
    assert len(resp.results) == 5


def test_batched_search_mixed_groups():
    c, vecs = make_collection()
    reqs = [
        SearchRequest(vector=vecs[0], top_k=3),
        SearchRequest(vector=vecs[1], top_k=3),
        SearchRequest(vector=vecs[2], top_k=7,
                      filters=[Filter("category", "=", "even")]),
        SearchRequest(vector=vecs[3], top_k=3),
    ]
    resps = c.search_batch(reqs)
    assert [len(r.results) for r in resps] == [3, 3, 7, 3]
    assert resps[0].results[0].id == "v0"
    assert resps[1].results[0].id == "v1"
    assert resps[3].results[0].id == "v3"
    # group-of-3 responses identical to individual search
    solo = c.search(reqs[2])
    assert [r.id for r in resps[2].results] == [r.id for r in solo.results]


def test_update_and_delete_through_collection():
    c, vecs = make_collection()
    c.update("v5", vector=np.full(D, 50.0, np.float32), metadata={"category": "updated"})
    resp = c.search(SearchRequest(vector=np.full(D, 50.0, np.float32), top_k=1,
                                  options=SearchOptions(include_metadata=True)))
    assert resp.results[0].id == "v5"
    assert resp.results[0].metadata["category"] == "updated"
    # facet columns updated too
    items = c.search_with_facets(vecs[0], 40, [EqualityFilter("category", "updated")])
    assert [i.id for i in items] == ["v5"]
    assert c.delete("v5")
    assert c.size == 39
    resp = c.search(SearchRequest(vector=np.full(D, 50.0, np.float32), top_k=40))
    assert "v5" not in [r.id for r in resp.results]


def test_empty_collection_search():
    c = Collection("empty", D)
    resp = c.search(SearchRequest(vector=np.ones(D, np.float32), top_k=5))
    assert resp.results == [] and resp.metadata.index_size == 0


def test_dimension_validation():
    c, _ = make_collection()
    with pytest.raises(ValueError, match="dimension"):
        c.search(SearchRequest(vector=np.ones(3, np.float32), top_k=5))
    with pytest.raises(ValueError):
        c.add("bad", np.ones(3, np.float32))


def test_invalid_k():
    c, vecs = make_collection()
    with pytest.raises(ValueError, match="positive"):
        c.search(SearchRequest(vector=vecs[0], top_k=0))


def test_metadata_must_be_dict():
    c, _ = make_collection()
    with pytest.raises(ValueError, match="JSON object"):
        c.add("x", np.ones(D, np.float32), metadata="not-a-dict")


def test_auto_facet_backfill():
    # a field that appears only in later writes still filters earlier rows out
    c = Collection("bf", D, "euclidean")
    c.add("a", np.zeros(D, np.float32), {"old": 1})
    c.add("b", np.ones(D, np.float32), {"old": 2, "new_field": "x"})
    resp = c.search(SearchRequest(vector=np.zeros(D, np.float32), top_k=5,
                                  filters=[Filter("new_field", "=", "x")]))
    assert [r.id for r in resp.results] == ["b"]


def test_stats():
    c, _ = make_collection()
    s = c.stats()
    assert s.vector_count == 40 and s.dimension == D and s.name == "test"
    assert "category" in s.facet_fields
