"""Index engines.

Engine protocol (duck-typed, the TPU analogue of the reference's core.Index
interface, pkg/core/collection.go:78-87):

  search_slots(queries f32[B,d], k, *, mask=None, negative=None,
               negative_weight=0.5, exact=False) -> (dist f32[B,k], slots i32[B,k])
  size -> int
  name -> str
  on_insert(slots, vectors) / on_update(slots, vectors) / on_delete(slots)
      (optional write hooks for engines that maintain derived state)
"""

from __future__ import annotations

from quiver_tpu.index.exact import ExactIndex

_ENGINES = {"exact": ExactIndex}


def register_engine(name: str, factory) -> None:
    _ENGINES[name] = factory


#: namespaces a JSON engine_config may use (REST/persisted per-collection
#: config); each maps to the corresponding typed config dataclass
_CONFIG_NAMESPACES = ("ivf", "hnsw", "adaptive")


def resolve_engine_config(kind: str, jcfg: dict | None) -> dict:
    """Translate a JSON-safe per-collection engine config into constructor
    kwargs for ``make_engine``.

    Accepted shape: ``{"ivf": {...IVFConfig fields...}, "hnsw":
    {...HNSWConfig fields...}, "adaptive": {...AdaptiveConfig fields...},
    <flat knob>: <scalar>, ...}`` — namespaced blocks configure the matching
    engine side (required for hybrid, whose ctor routes them to
    ivf_config / hnsw_config / adaptive_config); flat keys pass straight to
    the engine constructor (exact/ivf/hnsw config-override kwargs). Raises
    ValueError on unknown fields so the REST layer maps them to 400, not a
    500 from a dataclass TypeError. (The reference persists only the
    distance name, db.go:380-397 — per-collection engine config is part of
    the rebuild's tuner surface, e.g. ``{"ivf": {"recall_target": 0.95}}``.)
    """
    jcfg = dict(jcfg or {})
    ns = {
        k: jcfg.pop(k)
        for k in _CONFIG_NAMESPACES
        if isinstance(jcfg.get(k), dict)
    }
    base = kind.removeprefix("sharded_")
    out: dict = {}
    try:
        if base == "hybrid":
            if jcfg:
                raise ValueError(
                    f"hybrid engine_config keys must be namespaced "
                    f"({'/'.join(_CONFIG_NAMESPACES)}); got {sorted(jcfg)}"
                )
            if "ivf" in ns:
                from quiver_tpu.index.ivf import IVFConfig

                out["ivf_config"] = IVFConfig(**ns["ivf"])
            if "hnsw" in ns:
                from quiver_tpu.index.hnsw import HNSWConfig

                out["hnsw_config"] = HNSWConfig(**ns["hnsw"])
                out["ann_backend"] = "hnsw"
            if "adaptive" in ns:
                from quiver_tpu.index.hybrid import AdaptiveConfig

                out["adaptive_config"] = AdaptiveConfig(**ns["adaptive"])
        else:
            stray = [k for k in ns if k != base]
            if stray:
                raise ValueError(
                    f"engine_config namespaces {stray} do not apply to "
                    f"engine {kind!r}"
                )
            out.update(ns.get(base, {}))
            out.update(jcfg)
            if base == "ivf":
                from quiver_tpu.index.ivf import IVFConfig

                out = {"config": IVFConfig(**out)} if out else {}
            elif base == "hnsw":
                from quiver_tpu.index.hnsw import HNSWConfig

                out = {"config": HNSWConfig(**out)} if out else {}
    except TypeError as e:  # unknown dataclass field
        raise ValueError(f"invalid engine_config for {kind!r}: {e}") from e
    return out


def make_engine(kind: str, store, **cfg):
    """Build an engine over a VectorStore. kinds: exact | hnsw | hybrid."""
    if kind in _ENGINES:
        return _ENGINES[kind](store, **cfg)
    if kind == "hnsw":
        from quiver_tpu.index.hnsw import HNSWIndex

        return HNSWIndex(store, **cfg)
    if kind == "hybrid":
        from quiver_tpu.index.hybrid import HybridIndex

        return HybridIndex(store, **cfg)
    if kind == "ivf":
        from quiver_tpu.index.ivf import IVFIndex

        return IVFIndex(store, **cfg)
    if kind == "sharded_exact":
        from quiver_tpu.parallel.sharded import ShardedExactIndex

        return ShardedExactIndex(store, **cfg)
    if kind == "sharded_hnsw":
        from quiver_tpu.parallel.sharded_graph import ShardedHNSWIndex

        return ShardedHNSWIndex(store, **cfg)
    if kind == "sharded_ivf":
        from quiver_tpu.parallel.sharded_ivf import ShardedIVFIndex

        return ShardedIVFIndex(store, **cfg)
    if kind == "sharded_hybrid":
        from quiver_tpu.index.hybrid import HybridIndex
        from quiver_tpu.parallel.sharded import ShardedExactIndex, make_mesh

        mesh = cfg.pop("mesh", None) or make_mesh()
        compute_dtype = cfg.get("compute_dtype")
        dtype_kw = {"compute_dtype": compute_dtype} if compute_dtype is not None else {}
        backend = cfg.pop("ann_backend", "auto")
        ivf_config = cfg.pop("ivf_config", None)
        if backend == "auto":
            # same resolution rule as the single-chip HybridIndex: explicit
            # graph kwargs mean the caller wants the graph; otherwise the
            # TPU-first IVF engine serves the ANN side
            hnsw_keys = {
                "m", "m0", "ef_construction", "ef_search", "max_level",
                "level_prob", "build_batch", "visited", "build_approx",
                "query_dtype",
            }
            backend = "hnsw" if (hnsw_keys & set(cfg)) else "ivf"
        if backend == "ivf":
            from quiver_tpu.parallel.sharded_ivf import ShardedIVFIndex

            ivf_kw = dict(dtype_kw)
            if ivf_config is not None:
                ivf_kw["config"] = ivf_config
            # remaining engine kwargs are IVFConfig overrides — silently
            # dropping a tuning knob (n_probe=...) would be a misconfig
            # nobody notices; unknown names fail loudly in IVFConfig
            ivf_kw.update({
                k: v for k, v in cfg.items()
                if k not in ("compute_dtype", "adaptive_config")
            })
            ann_factory = lambda s: ShardedIVFIndex(s, mesh, **ivf_kw)
        else:
            from quiver_tpu.parallel.sharded_graph import ShardedHNSWIndex

            hnsw_cfg = dict(cfg)
            hnsw_cfg.pop("adaptive_config", None)
            ann_factory = lambda s: ShardedHNSWIndex(s, mesh, **hnsw_cfg)
        return HybridIndex(
            store,
            adaptive_config=cfg.get("adaptive_config"),
            exact_factory=lambda s: ShardedExactIndex(s, mesh, **dtype_kw),
            ann_factory=ann_factory,
        )
    raise ValueError(f"unknown index engine: {kind!r}")
