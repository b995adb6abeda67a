"""quiver-tpu — a TPU-native vector index-and-query engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
TFMV/quiver Go vector database (see SURVEY.md for the full map): exact and
HNSW similarity search with an adaptive hybrid selector, five distance
metrics, metadata/facet filtering compiled to device bitmasks, negative-
example reranking, batched multi-query search, fluent query API,
Parquet/Arrow persistence with WAL and backup/restore, multi-chip corpus
sharding with collective top-k merge, Prometheus observability, REST API,
and a CLI.

Quick start::

    from quiver_tpu import DB, DBOptions, SearchRequest

    db = DB(DBOptions(storage_path="./data"))
    c = db.create_collection("docs", dim=128, metric="cosine")
    c.add_batch(ids, vectors, metadatas)
    resp = (
        c.fluent_search(query)
        .with_k(10)
        .filter("category", "electronics")
        .include_metadata()
        .execute()
    )
"""

import os as _os

if _os.environ.get("QUIVER_XLA_CACHE", "1") != "0":
    # persistent XLA compilation cache: kernel shapes are stable (pow2-padded
    # everywhere), so across restarts every compile is a cache hit — critical
    # when compilation is remote/slow. TPU-only: XLA:CPU caches AOT results
    # keyed loosely enough that an entry compiled under different detected
    # host features loads anyway ("machine type ... doesn't match", then
    # SIGILL/SIGSEGV mid-suite) — and CPU compiles are fast enough that the
    # cache buys nothing there.
    import jax as _jax

    _plats = str(
        _jax.config.jax_platforms or _os.environ.get("JAX_PLATFORMS", "")
    )
    # primary platform only: under the axon plugin the list reads
    # "axon,cpu" — a substring test silently disabled the cache on the
    # REAL TPU environment (the one place it matters; the 30-120 s
    # cold-process compile cliff in round 3's streaming bench was this)
    _primary = _plats.split(",")[0].strip()
    if _primary != "cpu":
        _cache_dir = _os.environ.get(
            "QUIVER_XLA_CACHE_DIR",
            _os.path.expanduser("~/.cache/quiver_tpu_xla"),
        )
        try:
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
        except Exception:
            pass

from quiver_tpu.core.collection import Collection, FluentSearch
from quiver_tpu.core.db import DB, DBOptions
from quiver_tpu.core.store import VectorStore
from quiver_tpu.facets.filters import (
    EqualityFilter,
    ExistsFilter,
    RangeFilter,
    SetFilter,
)
from quiver_tpu.index.exact import ExactIndex
from quiver_tpu.ops import vector_utils
from quiver_tpu.index.hnsw import HNSWConfig, HNSWIndex
from quiver_tpu.index.hybrid import AdaptiveConfig, HybridIndex
from quiver_tpu.types import (
    DistanceType,
    Filter,
    SearchOptions,
    SearchRequest,
    SearchResponse,
    SearchResultItem,
    VectorRecord,
)

__version__ = "0.1.0"

__all__ = [
    "AdaptiveConfig",
    "Collection",
    "DB",
    "DBOptions",
    "DistanceType",
    "EqualityFilter",
    "ExactIndex",
    "ExistsFilter",
    "Filter",
    "FluentSearch",
    "HNSWConfig",
    "HNSWIndex",
    "HybridIndex",
    "RangeFilter",
    "SearchOptions",
    "SearchRequest",
    "SearchResponse",
    "SearchResultItem",
    "SetFilter",
    "VectorRecord",
    "VectorStore",
    "vector_utils",
]
