"""Facet filter tests: the four filter types, nested extraction, request-level
operator semantics, and host<->device (columns) equivalence.

Mirrors the reference's pkg/facets/facets_test.go battery (all four filter
types, nested extraction) and pkg/core collection filter semantics.
"""

import numpy as np
import pytest

from quiver_tpu.facets.columns import FacetColumns
from quiver_tpu.facets.filters import (
    EqualityFilter,
    ExistsFilter,
    RangeFilter,
    SetFilter,
    extract_facets,
    extract_path,
    filter_from_dict,
    matches_all,
    matches_request_filters,
    values_equal,
)
from quiver_tpu.types import Filter

MD = [
    {"category": "Electronics", "price": 99.5, "tags": ["new", "sale"], "stock": 5},
    {"category": "electronics", "price": 150, "tags": ["used"], "brand": ""},
    {"category": "books", "price": 15, "tags": [], "nested": {"a": {"b": 7}}},
    {"price": "not-a-number", "tags": ["sale", "rare"]},
    None,
]


# ------------------------------------------------------------------- host

def test_equality_case_insensitive():
    f = EqualityFilter("category", "ELECTRONICS")
    assert f.match("Electronics")
    assert f.match("electronics")
    assert not f.match("books")


def test_equality_numeric_coercion():
    f = EqualityFilter("price", 150)
    assert f.match(150.0)
    assert f.match(150)
    assert not f.match(151)
    assert not f.match(True)  # bools are not numbers


def test_range_filter():
    f = RangeFilter("price", min=15, max=100, min_inclusive=True, max_inclusive=False)
    assert f.match(15)
    assert f.match(99.5)
    assert not f.match(100)
    assert not f.match(14.99)
    assert not f.match("99")  # non-numeric -> no match


def test_range_open_ended():
    assert RangeFilter("p", min=10).match(1e9)
    assert RangeFilter("p", max=10).match(-1e9)
    assert not RangeFilter("p", min=10, min_inclusive=False).match(10)


def test_set_filter_any_element():
    f = SetFilter("tags", ["sale", "clearance"])
    assert f.match(["new", "sale"])  # array value: any element matches
    assert f.match("SALE")  # scalar, case-insensitive
    assert not f.match(["used"])
    assert not f.match([])


def test_exists_filter_empty_is_absent():
    f = ExistsFilter("brand")
    assert f.match("acme")
    assert f.match(0)
    assert not f.match("")
    assert not f.match([])
    assert not f.match({})
    assert not f.match(None)


def test_extract_nested_dot_notation():
    assert extract_path(MD[2], "nested.a.b") == 7
    assert extract_path(MD[2], "nested.a.missing") is None
    assert extract_path(None, "x") is None
    fvs = extract_facets(MD[0], ["category", "missing", "price"])
    assert [(f.field, f.value) for f in fvs] == [
        ("category", "Electronics"),
        ("price", 99.5),
    ]


def test_matches_all_and_semantics():
    filters = [EqualityFilter("category", "electronics"), RangeFilter("price", max=100)]
    assert matches_all(filters, MD[0])
    assert not matches_all(filters, MD[1])  # price 150 > 100
    assert not matches_all(filters, MD[2])  # category books
    assert not matches_all(filters, None)


def test_filter_from_dict_roundtrip():
    f = filter_from_dict({"type": "range", "field": "p", "min": 1, "max": 2})
    assert isinstance(f, RangeFilter)
    with pytest.raises(ValueError):
        filter_from_dict({"type": "bogus"})


# ---------------------------------------------------- request-level operators

def test_request_equals_case_sensitive():
    assert matches_request_filters(MD[0], [Filter("category", "=", "Electronics")])
    assert not matches_request_filters(MD[0], [Filter("category", "=", "electronics")])
    assert matches_request_filters(MD[1], [Filter("category", "=", "electronics")])


def test_request_numeric_tolerance_and_compare():
    assert values_equal(5, 5.0 + 1e-12)
    assert matches_request_filters(MD[0], [Filter("price", ">", 50)])
    assert matches_request_filters(MD[0], [Filter("price", "<=", 99.5)])
    assert not matches_request_filters(MD[0], [Filter("price", "<", 99.5)])


def test_request_absent_field_never_matches():
    assert not matches_request_filters(MD[0], [Filter("missing", "!=", "x")])


def test_request_in_not_in():
    assert matches_request_filters(MD[0], [Filter("stock", "in", [5, 6])])
    assert not matches_request_filters(MD[0], [Filter("stock", "not_in", [5])])
    assert matches_request_filters(MD[0], [Filter("stock", "not_in", [7])])
    # non-list value: in -> False, not_in -> True (collection.go:552-570)
    assert not matches_request_filters(MD[0], [Filter("stock", "in", 5)])
    assert matches_request_filters(MD[0], [Filter("stock", "not_in", 5)])


def test_request_dotted_field_resolves_nested():
    """Dotted field names resolve through nested metadata on the host path,
    matching the compiled facet-column path (which indexes via extract_path)
    — results must not depend on whether the field is facet-tracked."""
    md = {"a": {"b": 5, "s": "X"}, "top": 1}
    assert matches_request_filters(md, [Filter("a.b", "=", 5)])
    assert matches_request_filters(md, [Filter("a.b", ">", 4)])
    assert not matches_request_filters(md, [Filter("a.b", "=", 6)])
    assert matches_request_filters(md, [Filter("a.s", "in", ["X", "Y"])])
    assert not matches_request_filters(md, [Filter("a.missing", "!=", 1)])


def test_request_dotted_field_host_device_equivalence():
    """End-to-end: the same dotted-field request filter returns the same
    rows whether the field is facet-tracked (device-compiled mask) or not
    (host fallback)."""
    import numpy as np

    from quiver_tpu.core.collection import Collection
    from quiver_tpu.types import SearchRequest

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(16, 4)).astype(np.float32)
    mds = [{"a": {"b": i % 4}, "i": i} for i in range(16)]
    ids = [f"v{i}" for i in range(16)]
    req = SearchRequest(
        vector=vecs[0], top_k=16, filters=[Filter("a.b", "=", 2)]
    )

    tracked = Collection("t", 4, "euclidean", facet_fields=["a.b"])
    tracked.add_batch(ids, vecs, mds)
    untracked = Collection("u", 4, "euclidean")
    untracked.add_batch(ids, vecs, mds)

    got_t = sorted(r.id for r in tracked.search(req).results)
    got_u = sorted(r.id for r in untracked.search(req).results)
    expect = sorted(f"v{i}" for i in range(16) if i % 4 == 2)
    assert got_t == expect
    assert got_u == expect


# ------------------------------------------------- device columns equivalence

FIELDS = ["category", "price", "tags", "brand", "stock", "nested.a.b"]


def build_columns():
    cols = FacetColumns(capacity=8, fields=FIELDS)
    cols.index_rows(range(len(MD)), MD)
    return cols


FACET_CASES = [
    [EqualityFilter("category", "ELECTRONICS")],
    [EqualityFilter("price", 150)],
    [RangeFilter("price", min=15, max=100, max_inclusive=False)],
    [RangeFilter("price", min=15)],
    [SetFilter("tags", ["sale"])],
    [SetFilter("tags", ["rare", "used"])],
    [ExistsFilter("brand")],
    [ExistsFilter("nested.a.b")],
    [EqualityFilter("category", "electronics"), RangeFilter("price", max=120)],
    [EqualityFilter("nested.a.b", 7)],
]


@pytest.mark.parametrize("filters", FACET_CASES, ids=[str([str(f) for f in c]) for c in FACET_CASES])
def test_columns_match_host_facets(filters):
    cols = build_columns()
    mask = cols.compile_facet_filters(filters)
    assert mask is not None
    for i, md in enumerate(MD):
        # host facet semantics use dot-notation extraction
        want = matches_all(filters, md)
        assert bool(mask[i]) == want, (filters, i, md)
    # untouched slots never match
    assert not mask[len(MD):].any()


REQUEST_CASES = [
    [Filter("category", "=", "Electronics")],
    [Filter("category", "=", "electronics")],
    [Filter("category", "!=", "books")],
    [Filter("price", ">", 50)],
    [Filter("price", ">=", 99.5)],
    [Filter("price", "<", 100)],
    [Filter("price", "<=", 15)],
    [Filter("stock", "in", [5, 9])],
    [Filter("stock", "not_in", [5])],
    [Filter("category", "=", "Electronics"), Filter("price", "<", 100)],
]


@pytest.mark.parametrize("filters", REQUEST_CASES, ids=str)
def test_columns_match_host_request_filters(filters):
    cols = build_columns()
    mask = cols.compile_request_filters(filters)
    if mask is None:
        # legitimate host fallback (e.g. range over a column holding
        # non-numeric rows, which Go compares lexicographically) — the
        # collection layer covers this path; nothing to compare here.
        assert any(f.operator in (">", ">=", "<", "<=") for f in filters)
        return
    for i, md in enumerate(MD):
        want = matches_request_filters(md, filters)
        assert bool(mask[i]) == want, (filters, i, md)


def test_untracked_field_returns_none():
    cols = build_columns()
    assert cols.compile_facet_filters([EqualityFilter("unknown", 1)]) is None
    assert cols.compile_request_filters([Filter("unknown", "=", 1)]) is None


def test_lexicographic_range_falls_back():
    cols = build_columns()
    # string comparison ops can't compile -> host fallback
    assert cols.compile_request_filters([Filter("category", ">", "a")]) is None


def test_set_fields_reindex_and_grow():
    cols = FacetColumns(capacity=4, fields=["a"])
    cols.index_rows([0, 1], [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    new = cols.set_fields(["a", "b"])
    assert new == ["b"]
    cols.index_rows([0, 1], [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    m = cols.compile_facet_filters([EqualityFilter("b", "x")])
    assert m is not None and m[0] and not m[1]
    cols.grow(16)
    m = cols.compile_facet_filters([EqualityFilter("b", "x")])
    assert m.shape[0] == 16 and m[0]


def test_large_vocab_crosses_word_boundary():
    cols = FacetColumns(capacity=128, fields=["t"])
    mds = [{"t": f"tag{i}"} for i in range(100)]
    cols.index_rows(range(100), mds)
    m = cols.compile_facet_filters([SetFilter("t", ["tag37", "tag99"])])
    assert m is not None
    assert m[37] and m[99] and not m[0] and m.sum() == 2


def test_clear_rows():
    cols = build_columns()
    cols.clear_rows([0])
    m = cols.compile_facet_filters([EqualityFilter("category", "electronics")])
    assert not m[0] and m[1]


def test_request_filter_device_host_parity_grid():
    """Compiled request-filter masks agree with the host oracle cell by
    cell across mixed types, numeric-looking strings, bools, nulls and
    absent fields — a tracked field must never change results (the old
    case-sensitive column missed Sprintf cross-type matches and let
    '!='/'not_in' match stored nulls)."""
    from quiver_tpu.facets.filters import matches_request_filter

    rows = [
        {"v": "5"}, {"v": 5}, {"v": 5.0}, {"v": 7}, {"v": "hello"},
        {"v": "Hello"}, {"v": None}, {"v": True}, {"v": ""}, {},
    ]
    cols = FacetColumns(16, ["v"])
    cols.index_rows(np.arange(len(rows)), rows)
    cases = [
        ("=", 5), ("=", "5"), ("=", 5.0), ("=", "hello"), ("=", "Hello"),
        ("=", True), ("=", ""), ("!=", 5), ("!=", "hello"), ("!=", True),
        ("in", [5, "hello"]), ("in", ["5"]), ("not_in", [5]),
        ("not_in", ["hello", 7]), ("not_in", "notalist"),
    ]
    for op, val in cases:
        flt = Filter("v", op, val)
        mask = cols.compile_request_filters([flt])
        assert mask is not None, (op, val)
        want = [matches_request_filter(md, flt) for md in rows]
        got = mask[: len(rows)].tolist()
        assert got == want, (op, val, got, want)
    # a list-valued row forces the host fallback for the whole column
    cols2 = FacetColumns(8, ["v"])
    cols2.index_rows(np.arange(2), [{"v": [1, 2]}, {"v": 3}])
    assert cols2.compile_request_filters([Filter("v", "=", 3)]) is None


def test_set_membership_scalar_numeric_string_and_array():
    """SetFilter semantics across the three storage forms after the
    arr_vocab split (scalars match via columns, arrays via the bitset)."""
    cols = FacetColumns(capacity=16, fields=["v"])
    cols.index_rows(
        range(6),
        [
            {"v": 5},            # scalar int
            {"v": 5.0},          # scalar float, unified with 5
            {"v": "SALE"},       # scalar string, case-folded
            {"v": [5, 9]},       # array containing a match
            {"v": ["sale"]},     # array string element
            {"v": 7},            # no match
        ],
    )
    m = cols.compile_facet_filters([SetFilter("v", [5, "sale"])])
    assert m is not None
    assert m[:5].all() and not m[5]
    # numeric-only filter: string rows don't match, arrays do
    m2 = cols.compile_facet_filters([SetFilter("v", [9])])
    assert not m2[2] and m2[3] and m2.sum() == 1


def test_high_cardinality_numeric_field_stays_bounded():
    """A float field with all-distinct values must not grow per-value
    bitsets (the former layout allocated O(cap x distinct/32) words and
    re-copied them per new value — minutes and GBs at 100k rows)."""
    import time

    n = 20_000
    cols = FacetColumns(capacity=n, fields=["price"])
    mds = [{"price": float(i) + 0.5} for i in range(n)]
    t0 = time.perf_counter()
    cols.index_rows(range(n), mds)
    dt = time.perf_counter() - t0
    col = cols.fields["price"]
    assert col.set_words.shape[1] == 1  # no array elements -> no bitset
    assert dt < 10.0  # linear indexing (was ~60 s at this size)
    m = cols.compile_facet_filters([SetFilter("price", [17.5, 19999.5])])
    assert m[17] and m[n - 1] and m.sum() == 2
