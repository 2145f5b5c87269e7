"""The YAGO build: shape-driven fact extraction and the 9 output tables.

Re-expresses the reference's 8-thread build plan (plan.rs:103-202) as
Ray Data pipelines over the predicate-partitioned statement store:

- ONE combined pass over the p:/ps:/psv: statement families covers every
  property shape at once (the reference loops shapes and rescans,
  plan.rs:1069-1199); per-shape dispatch is vectorized inside batches.
- The statement-subject × statement-object join is a hash-partitioned
  `Dataset.join` keyed on statement id (J1).
- Broadcast state (URI mapping, instance sets, clean-value maps,
  best-rank ids) is shipped once per worker process; with
  `state.distributed=True` (auto above ~50M mapped items, or
  YAGO4_RAY_DISTRIBUTED_STATE=1) every such call site flips to
  `hash_join`s against the state Datasets (build_dist module).
- maxCount drops the whole (shape, subject) group — never truncates
  (A2, plan.rs:1141-1158).

Outputs (same logical tables as plan.rs:105-196):
  class, simple-types, full-types, labels, facts, annotated-facts,
  sameAs, schema, shapes — each a Dataset of
  (subject, predicate, object[, annotation_predicate, annotation_object]).
"""

from __future__ import annotations

import json
import os
import warnings
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data import Dataset

from . import cleaners as C
from . import terms as T
from .joins import (
    copartition_join,
    distinct_rows,
    get_broadcast,
    partitions_for_nbytes,
)
from .schema import PropertyShape, Schema
from .sources import scan_predicate
from .state import BuildState, Stats, build_state

LABEL_PATHS = [T.RDFS_LABEL, T.RDFS_COMMENT, T.SCHEMA_ALTERNATE_NAME]

_TIMING_T0: dict[str, float] = {}


def _mark_timing(scope: str, phase: str) -> None:
    """YAGO4_RAY_TIMINGS=1 → per-phase wall prints (perf work on a
    noisy host needs phase-level numbers, not end-to-end walls)."""
    import os
    import time

    if not os.environ.get("YAGO4_RAY_TIMINGS"):
        return
    now = time.perf_counter()
    t0 = _TIMING_T0.get(scope)
    if t0 is not None:
        print(f"[{scope}] {phase}: {now - t0:.1f}s", flush=True)
    _TIMING_T0[scope] = now

_TIME_DTS = frozenset(
    {T.XSD_DATE, T.XSD_DATE_TIME, T.XSD_G_YEAR, T.XSD_G_YEAR_MONTH}
)


def _spo_arrow(subject, predicate, obj) -> "object":
    """(subject, predicate, object) as an Arrow string block. Pandas
    object-dtype outputs make Ray's block-size estimator fall back to
    np.vectorize (which errors on empty frames and mis-sizes strings)
    and get pickled through shuffles; Arrow string columns size exactly
    and ship zero-copy."""
    import pyarrow as pa

    n = len(subject)

    def col(v):
        if isinstance(v, str):
            return pa.array([v] * n, pa.string())
        if isinstance(v, pd.Series):
            v = v.to_numpy()
        return pa.array(v, pa.string(), from_pandas=True)

    return pa.table(
        {"subject": col(subject), "predicate": col(predicate), "object": col(obj)}
    )


def _empty_triples() -> Dataset:
    return ray.data.from_arrow(_spo_arrow([], "", []))


def _triples_ds(rows: list[tuple[str, str, str]]) -> Dataset:
    if not rows:
        return _empty_triples()
    return ray.data.from_arrow(
        _spo_arrow(
            [r[0] for r in rows],
            [r[1] for r in rows],
            [r[2] for r in rows],
        )
    )


# ---------------------------------------------------------------------------
# Property-shape dispatch configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PropConfig:
    cfg_id: str
    path: str
    parent_class: str | None
    pids: tuple[str, ...]
    mode: str  # anyuri|time|duration|integer|datatype|geo|quantity|image|range|skip
    datatypes: frozenset[str]
    range_classes: tuple[str, ...]
    pattern: str | None
    max_count: int | None

    @property
    def complex_value(self) -> bool:
        return self.mode in ("time", "duration", "integer", "geo", "quantity")


def derive_config(shape: PropertyShape, schema: Schema, cfg_id: str) -> PropConfig:
    """Value-dispatch rules of map_wikidata_property_value
    (plan.rs:1224-1385)."""
    datatypes = frozenset(shape.datatypes)
    nodes = shape.nodes
    mode = "skip"
    range_classes: tuple[str, ...] = ()
    if datatypes and nodes:
        mode = "skip"  # contradictory shape, ignored with a warning
    elif datatypes:
        if datatypes == {T.XSD_ANY_URI}:
            mode = "anyuri"
        elif datatypes == _TIME_DTS:
            mode = "time"
        elif datatypes == {T.XSD_DURATION}:
            mode = "duration"
        elif datatypes == {T.XSD_INTEGER}:
            mode = "integer"
        else:
            mode = "datatype"
    elif nodes:
        range_classes = tuple(
            schema.node_shape(n).target_class for n in nodes
        )
        if range_classes == (T.SCHEMA_GEO_COORDINATES,):
            mode = "geo"
        elif range_classes == (T.SCHEMA_QUANTITATIVE_VALUE,):
            mode = "quantity"
        elif range_classes == (T.SCHEMA_IMAGE_OBJECT,):
            mode = "image"
        else:
            mode = "range"
    pids = tuple(
        pid for p in shape.from_properties if (pid := T.pid_of(p)) is not None
    )
    parent_class = None
    if shape.parent_shape is not None:
        parent_class = schema.node_shape(shape.parent_shape).target_class
    return PropConfig(
        cfg_id=cfg_id,
        path=shape.path,
        parent_class=parent_class,
        pids=pids,
        mode=mode,
        datatypes=datatypes,
        range_classes=range_classes,
        pattern=shape.pattern,
        max_count=shape.max_count,
    )


# ---------------------------------------------------------------------------
# Shared broadcastable fact-pipeline state
# ---------------------------------------------------------------------------

def build_clean_values_ds(root: str, state: BuildState) -> Dataset:
    """(family, value_node, object, extras) Dataset (ST4) from ONE scan +
    ONE partitioned groupby (reference: five point-lookup chains in five
    threads, plan.rs:908-1032). In distributed mode the only broadcast
    is the unit→YAGO mapping restricted to units that actually occur —
    Wikidata has ~10k units, class-graph scale, never instance scale."""
    if state.distributed:
        units = (
            scan_predicate(root, T.WIKIBASE_QUANTITY_UNIT)
            .map_batches(
                lambda b: b[["object"]].drop_duplicates(), batch_format="pandas"
            )
            .to_pandas()["object"]
            .unique()
        )
        unit_map = {
            u: v for u in units if (v := state.uri_mapping.get(u)) is not None
        }
        uri_ref = ray.put(unit_map)
    else:
        uri_ref = state.packed_ref("uri_mapping")
    return C.build_value_maps(root, scan_predicate, uri_ref)


def build_clean_maps(root: str, state: BuildState, stats: Stats) -> dict:
    """Driver-dict form of build_clean_values_ds for the broadcast path."""
    df = build_clean_values_ds(root, state).to_pandas()
    maps: dict[str, dict[str, tuple[str, str]]] = {
        k: {} for k in ("time", "coordinates", "duration", "integer", "quantity")
    }
    for family, node, obj, extras in zip(
        df["family"], df["value_node"], df["object"], df["extras"]
    ):
        maps[family][node] = (obj, extras)
    for name, m in maps.items():
        stats.set_local("Cleaned complex type", name, len(m))
    return maps


def build_clean_hmms(root: str, state: BuildState, stats: Stats) -> dict:
    """HashedMultiMaps per clean family (broadcast-path form of ST4)."""
    return _clean_hmms_from_ds(build_clean_values_ds(root, state), stats)


def build_clean_hmms_from_ref(root: str, uri_ref, stats: Stats) -> dict:
    """Like build_clean_hmms but fed a packed URI-mapping ObjectRef
    directly — lets state.build_state start this wide scan as soon as
    the URI merge resolves (overlapping shape-instance resolution),
    without a BuildState existing yet."""
    return _clean_hmms_from_ds(
        C.build_value_maps(root, scan_predicate, uri_ref), stats
    )


@ray.remote(num_returns=2)
def _pack_clean_hmms(*blocks):
    """Worker-side form of _clean_hmms_from_ds: concat the hashed Arrow
    blocks and build the per-family HashedMultiMaps OFF the driver, so
    the broadcast object goes worker → object store with no driver
    concat, build, or ray.put serialize (measured 3.7 s of idle-cluster
    driver wait at 22 M statements). Returns (hmm_dict, counts)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .broadcast import HashedMultiMap

    tbl = pa.concat_tables(
        list(blocks), promote_options="permissive"
    ).combine_chunks()
    out: dict[str, "HashedMultiMap"] = {}
    counts: dict[str, int] = {}
    for name in ("time", "coordinates", "duration", "integer", "quantity"):
        fam = tbl.filter(pc.equal(tbl["family"], name))
        out[name] = HashedMultiMap.from_arrow(
            fam["value_node"], fam["object"], fam["extras"], hashes=fam["h"]
        )
        counts[name] = len(out[name])
    return out, counts


def clean_hmm_refs(root: str, uri_ref) -> tuple:
    """Run the clean-value scan, then hand its Arrow block refs to a
    remote packing task. Returns (hmm_ref, counts_ref) the moment the
    scan resolves — the pack itself overlaps whatever Dataset job runs
    next (the facts join), and build_facts can assemble its broadcast
    refs without waiting for (or ever holding) the multimaps."""
    from .broadcast import _hash_series

    hashed = C.build_value_maps(root, scan_predicate, uri_ref).map_batches(
        lambda b: b.assign(h=_hash_series(b["value_node"])),
        batch_format="pandas",
    )
    return _pack_clean_hmms.remote(*hashed.to_arrow_refs())


def _clean_hmms_from_ds(ds: Dataset, stats: Stats) -> dict:
    """HashedMultiMaps per clean family, built from Arrow blocks with
    worker-computed key hashes — the value-node/object/extras strings
    never materialize as Python objects on the driver (the pandas
    dict/object round trips this replaces each cost seconds per million
    value nodes)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .broadcast import HashedMultiMap, _hash_series

    hashed = ds.map_batches(
        lambda b: b.assign(h=_hash_series(b["value_node"])),
        batch_format="pandas",
    )
    tbl = pa.concat_tables(
        ray.get(hashed.to_arrow_refs()), promote_options="permissive"
    ).combine_chunks()
    out: dict[str, "HashedMultiMap"] = {}
    for name in ("time", "coordinates", "duration", "integer", "quantity"):
        fam = tbl.filter(pc.equal(tbl["family"], name))
        out[name] = HashedMultiMap.from_arrow(
            fam["value_node"], fam["object"], fam["extras"], hashes=fam["h"]
        )
        stats.set_local("Cleaned complex type", name, len(out[name]))
    return out


def best_rank_statements(root: str) -> pd.Series:
    """Statement ids typed wikibase:BestRank (M16/J6) — broadcast-path
    form, returned as a Series (HashedSet consumes it without a Python
    set pass; statement ids are store-unique). The distributed path
    joins against build_dist.best_rank_ds instead."""
    ds = scan_predicate(root, T.RDF_TYPE)
    df = ds.map_batches(
        lambda b: b[b["object"] == T.WIKIBASE_BEST_RANK][["subject"]],
        batch_format="pandas",
    ).to_pandas()
    return df["subject"]


def best_rank_hashed_set(root: str):
    """BestRank membership as a HashedSet whose 64-bit key hashes are
    computed IN the scan tasks — the driver collects 8-byte hashes
    (~26 MB at full Wikidata's ~3 G statements per 100 M BestRank ids),
    never the id strings. Store key-uniqueness makes the ids distinct,
    so the collision check needs only the row count; the (never yet
    observed) collision falls back to the string path."""
    from .broadcast import HashedSet, _hash_series

    ds = scan_predicate(root, T.RDF_TYPE)

    def h(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b["object"] == T.WIKIBASE_BEST_RANK]["subject"]
        return pd.DataFrame({"h": _hash_series(sel)})

    hashes = ds.map_batches(h, batch_format="pandas").to_pandas()["h"]
    try:
        return HashedSet.from_prehashed(hashes.to_numpy(), len(hashes))
    except ValueError:
        return HashedSet(best_rank_statements(root))


# ---------------------------------------------------------------------------
# The combined facts pipeline
# ---------------------------------------------------------------------------

_SEP = "\x00"


def datatype_series(obj: pd.Series) -> pd.Series:
    """Vectorized YagoTerm::datatype over canonical term strings
    (model.rs:141-155): None for IRIs/blank nodes."""
    out = pd.Series([None] * len(obj), index=obj.index, dtype=object)
    if len(obj) == 0:
        return out
    is_lit = obj.str.startswith('"')
    out[is_lit & obj.str.endswith('"')] = T.XSD_STRING
    lang = is_lit & obj.str.contains(r'"@[A-Za-z0-9-]+$', regex=True)
    out[lang] = T.RDF_LANG_STRING
    dt = obj.str.extract(r"\^\^<([^>]+)>$", expand=False)
    typed = is_lit & dt.notna()
    out[typed] = dt[typed]
    return out


def _literal_values(obj: pd.Series) -> pd.Series:
    """Vectorized plain-string literal values (no unescaping; sh:pattern
    targets — identifiers without escapes)."""
    return obj.str.extract(r'^"(.*)"$', expand=False)


_EMPTY_SUBJECT = {"cfg": [], "statement": [], "subject": []}
_EMPTY_OBJECT = {"cfg": [], "statement": [], "object": [], "extras": []}
_EMPTY_SUBJECT_TBL = pa.table(
    {c: pa.array([], pa.string()) for c in _EMPTY_SUBJECT}
)
_OBJECT_SCHEMA = pa.schema([(c, pa.string()) for c in _EMPTY_OBJECT])


def _subject_side(
    root: str,
    configs: list[PropConfig],
    refs: dict,
) -> Dataset:
    """(cfg, statement, subject): p:Pid scan → per-config fan-out →
    best-rank filter → URI-map subject → domain filter
    (plan.rs:1073-1102). Fully vectorized: packed zero-copy broadcasts,
    numpy membership, one pandas pass per (pid, cfg)."""
    pid_to_cfgs: dict[str, list[PropConfig]] = {}
    for cfg in configs:
        if cfg.parent_class is None:
            raise ValueError(f"No parent shape for {cfg.path}")
        for pid in cfg.pids:
            pid_to_cfgs.setdefault(pid, []).append(cfg)
    preds = {T.iri(f"{T.P_PREFIX}{pid}"): pid for pid in pid_to_cfgs}
    ds = scan_predicate(root, list(preds))

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        uri_map = get_broadcast(refs["uri_mapping"])
        best = get_broadcast(refs["best_rank"])
        instances = get_broadcast(refs["shape_instances"])
        subjects = uri_map.lookup(batch["subject"])
        keep = subjects.notna().to_numpy() & best.contains(batch["object"])
        base = pd.DataFrame(
            {
                "pid": batch["predicate"].map(preds),
                "statement": batch["object"],
                "subject": subjects,
            }
        )[keep]
        cfgs_a, stmts, subs = [], [], []
        for pid, group in base.groupby("pid", sort=False):
            for cfg in pid_to_cfgs.get(pid, ()):
                inst = instances.get(cfg.parent_class)
                if inst is None:
                    continue
                sel = group[inst.contains(group["subject"])]
                if len(sel):
                    cfgs_a.append(np.full(len(sel), cfg.cfg_id, dtype=object))
                    stmts.append(sel["statement"].to_numpy())
                    subs.append(sel["subject"].to_numpy())
        # Arrow out: these rows feed the facts-join exchange — Arrow
        # string blocks ship zero-copy where pandas blocks pickle
        if not cfgs_a:
            return _EMPTY_SUBJECT_TBL
        return pa.table(
            {
                "cfg": pa.array(
                    np.concatenate(cfgs_a), pa.string(), from_pandas=True
                ),
                "statement": pa.array(
                    np.concatenate(stmts), pa.string(), from_pandas=True
                ),
                "subject": pa.array(
                    np.concatenate(subs), pa.string(), from_pandas=True
                ),
            }
        )

    return ds.map_batches(stage, batch_format="pandas")


_CLEAN_FAMILY = {
    "time": "time", "duration": "duration", "integer": "integer",
    "geo": "coordinates", "quantity": "quantity",
}


def _object_side(
    root: str,
    configs: list[PropConfig],
    refs: dict | None,
    simple_prefix: str,
    complex_prefix: str,
) -> Dataset:
    """(cfg, statement, object, extras): ps:/psv: scan → per-mode value
    dispatch → pattern filter (plan.rs:1209-1399). Vectorized per
    (predicate, cfg) group; scalar converters only run on candidate
    rows of their own mode. refs=None restricts to stateless modes
    (anyuri/image/datatype — the build_dist stateless leg)."""
    pred_to_cfgs: dict[str, list[PropConfig]] = {}
    for cfg in configs:
        if cfg.mode == "skip":
            continue
        prefix = complex_prefix if cfg.complex_value else simple_prefix
        for pid in cfg.pids:
            pred_to_cfgs.setdefault(T.iri(f"{prefix}{pid}"), []).append(cfg)
    ds = scan_predicate(root, list(pred_to_cfgs))

    def dispatch(cfg: PropConfig, rows: pd.DataFrame, refs_local) -> pd.DataFrame | None:
        """rows: (statement, object) for one cfg; returns
        (statement, object, extras) or None."""
        objs = rows["object"]
        mode = cfg.mode
        extras = None
        if mode == "anyuri":
            mapped = objs.map(C.validate_any_uri)
            keep = mapped.notna()
            values = mapped[keep]
        elif mode == "image":
            keep = objs.str.startswith("<" + C.COMMONS_PREFIX)
            values = objs[keep]
        elif mode == "datatype":
            keep = datatype_series(objs).isin(cfg.datatypes)
            values = objs[keep]
        elif mode == "range":
            mapped = refs_local["uri_mapping"].lookup(objs)
            keep = mapped.notna().to_numpy()
            import numpy as np

            in_range = np.zeros(len(rows), dtype=bool)
            instances = refs_local["shape_instances"]
            for cls in cfg.range_classes:
                inst = instances.get(cls)
                if inst is not None:
                    in_range |= keep & inst.contains(mapped.fillna(""))
            keep = in_range
            values = mapped[keep]
        else:  # complex value families
            clean = refs_local["clean_maps"][_CLEAN_FAMILY[mode]]
            mapped, mapped_extras = clean.lookup(objs)
            keep = mapped.notna()
            values = mapped[keep]
            extras = mapped_extras[keep].fillna("")
        if keep is None or not keep.any():
            return None
        out = pd.DataFrame(
            {
                "cfg": cfg.cfg_id,
                "statement": rows["statement"][keep],
                "object": values,
                "extras": extras if extras is not None else "",
            }
        )
        if cfg.pattern is not None:
            # only plain strings can pass a sh:pattern (plan.rs:1388-1397)
            lit = _literal_values(out["object"])
            with warnings.catch_warnings():
                # SHACL patterns carry capture groups; contains() only
                # tests for a match, so pandas' groups warning is noise
                warnings.simplefilter("ignore", UserWarning)
                has_pat = lit.str.contains(cfg.pattern, regex=True, na=False)
            ok = (
                (datatype_series(out["object"]) == T.XSD_STRING)
                & lit.notna()
                & has_pat
            )
            out = out[ok]
        return out if len(out) else None

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        refs_local = (
            {
                "uri_mapping": get_broadcast(refs["uri_mapping"]),
                "shape_instances": get_broadcast(refs["shape_instances"]),
                "clean_maps": get_broadcast(refs["clean_maps"]),
            }
            if refs is not None
            else None
        )
        outs = []
        for pred, group in batch.groupby("predicate", sort=False):
            rows = pd.DataFrame(
                {"statement": group["subject"], "object": group["object"]}
            )
            for cfg in pred_to_cfgs.get(pred, ()):
                res = dispatch(cfg, rows, refs_local)
                if res is not None:
                    outs.append(res)
        # Arrow out with a pinned all-string schema (downstream
        # `fillna("")` treats the NaN→null promotion as empty extras)
        if not outs:
            return _OBJECT_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True),
            schema=_OBJECT_SCHEMA,
            preserve_index=False,
        )

    return ds.map_batches(stage, batch_format="pandas")


def _apply_max_count_exchange(
    joined: Dataset, max_counts: dict[str, int]
) -> Dataset:
    """Full-exchange maxCount path: hash-partition the limited rows by
    (cfg, subject) and drop oversize groups per part. Correct at any
    offender volume — the fallback when the offender set is too big to
    broadcast (pytest-gated identical to the broadcast path)."""
    limits_ref = ray.put(max_counts)
    limited_cfgs = set(max_counts)

    def keep_small(pdf: pd.DataFrame) -> pd.DataFrame:
        limits = get_broadcast(limits_ref)
        sizes = pdf.groupby(["cfg", "subject"])["statement"].transform("size")
        limit = pdf["cfg"].map(limits)
        return pdf[sizes <= limit]

    from .joins import partitioned_group_apply

    without_limit = joined.map_batches(
        lambda b: b[~b["cfg"].isin(limited_cfgs)], batch_format="pandas"
    )
    filtered = partitioned_group_apply(
        joined.map_batches(
            lambda b: b[b["cfg"].isin(limited_cfgs)], batch_format="pandas"
        ),
        ["cfg", "subject"],
        keep_small,
    )
    return without_limit.union(filtered)


def _apply_max_count(
    joined: Dataset, configs: list[PropConfig], num_partitions: int = 32
) -> Dataset:
    """Whole-group drop for shapes with sh:maxCount (plan.rs:1141-1158).

    `joined` must be MATERIALIZED. The previous implementation
    re-exchanged the entire limited payload right after the join
    exchange (a second full sort barrier at every session width —
    measured 143 MB / 0.5 M rows at 22 M statements). Group sizes are
    decomposable, so instead: per-batch (cfg, subject) count partials →
    one SMALL partitioned sum (count rows, not payload rows) → the rare
    offending groups come back to the driver and are dropped by a
    broadcast anti-filter map over the materialized blocks. The
    HashedSet probe verifies hits exactly, so a hash collision cannot
    silently drop a valid group. Above
    YAGO4_RAY_MAXCOUNT_BROADCAST_CAP offender bytes the full-exchange
    path stands (both paths pytest-gated identical).

    Returns a LAZY map over `joined`'s blocks (or `joined` unchanged
    when nothing violates); callers must not re-materialize it."""
    max_counts = {c.cfg_id: c.max_count for c in configs if c.max_count is not None}
    if not max_counts:
        return joined
    limited_cfgs = set(max_counts)
    limits_ref = ray.put(max_counts)

    _EMPTY_COUNTS = {
        "cfg": pd.Series([], dtype=object),
        "subject": pd.Series([], dtype=object),
        "n": pd.Series([], dtype="int64"),
    }

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        sub = b[b["cfg"].isin(limited_cfgs)]
        if sub.empty:
            return pd.DataFrame(_EMPTY_COUNTS)
        return (
            sub.groupby(["cfg", "subject"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    def sum_offenders(pdf: pd.DataFrame) -> pd.DataFrame:
        limits = get_broadcast(limits_ref)
        tot = pdf.groupby(["cfg", "subject"], as_index=False)["n"].sum()
        lim = tot["cfg"].map(limits)
        return tot.loc[tot["n"] > lim, ["cfg", "subject"]]

    from .joins import partitioned_group_apply

    counts = joined.map_batches(partial_counts, batch_format="pandas")
    offenders = partitioned_group_apply(
        counts,
        ["cfg", "subject"],
        sum_offenders,
        num_parts=max(4, num_partitions // 4),
    ).materialize()
    cap = int(
        os.environ.get("YAGO4_RAY_MAXCOUNT_BROADCAST_CAP", str(64 << 20))
    )
    if (offenders.size_bytes() or 0) > cap:
        # materialized: the exchange output feeds 3+ consumers and must
        # not re-shuffle per consumption (the broadcast path below stays
        # lazy because its filter is a cheap hash-probe map)
        return _apply_max_count_exchange(joined, max_counts).materialize()
    off = offenders.to_pandas()
    if len(off) == 0:
        return joined
    from .broadcast import HashedSet

    # "\x00" cannot occur in a cfg id (c{i}_{name}), so the joined key
    # is injective
    off_ref = ray.put(HashedSet(off["cfg"] + "\x00" + off["subject"]))

    def drop_offenders(b: pd.DataFrame) -> pd.DataFrame:
        m = b["cfg"].isin(limited_cfgs)
        if not m.any():
            return b
        offenders_set = get_broadcast(off_ref)
        keys = b.loc[m, "cfg"] + "\x00" + b.loc[m, "subject"]
        bad = pd.Series(False, index=b.index)
        bad.loc[m] = offenders_set.contains(keys)
        return b[~bad]

    return joined.map_batches(drop_offenders, batch_format="pandas")


def _dict_cols(cols: list[str]) -> list[str] | None:
    """Low-cardinality columns to dictionary-encode through a dedup
    exchange. OFF by default: measured at 22 M / 8 CPUs the per-row
    encode+decode passes cost as much as the plasma bytes they save on
    a single node (PERF_NOTES #38); on a network cluster bytes win —
    YAGO4_RAY_DEDUP_DICT=1 enables."""
    return cols if os.environ.get("YAGO4_RAY_DEDUP_DICT") == "1" else None


def build_facts(
    root: str,
    state: BuildState,
    exclude_paths: list[str] | None = None,
    num_partitions: int | None = None,
    dedup: bool = True,
) -> tuple[Dataset, Dataset]:
    """The core: (facts, annotated-facts) Datasets
    (plan.rs:896-1202). See module docstring for the dataflow."""
    import time as _time

    _TIMING_T0["build_facts"] = _time.perf_counter()
    schema = state.schema
    if num_partitions is None:
        # size the statement⨝statement exchanges by DATA volume, not
        # CPU count: a fixed count means per-partition size grows
        # without bound as the store grows (the 100-TB killer)
        from .sources import store_nbytes

        num_partitions = partitions_for_nbytes(store_nbytes(root))
    exclude = set(exclude_paths or LABEL_PATHS)
    configs: list[PropConfig] = []
    seen_ids: set[str] = set()
    for i, shape in enumerate(schema.property_shapes()):
        if shape.path in exclude:
            continue
        cfg_id = f"c{i}_{T.string_name([shape.path])}"
        assert cfg_id not in seen_ids
        seen_ids.add(cfg_id)
        cfg = derive_config(shape, schema, cfg_id)
        if cfg.mode == "skip" or not cfg.pids:
            continue
        configs.append(cfg)

    ann_configs: list[PropConfig] = []
    for i, shape in enumerate(schema.annotation_property_shapes()):
        cfg = derive_config(shape, schema, f"a{i}_{T.string_name([shape.path])}")
        if cfg.mode == "skip" or not cfg.pids:
            continue
        ann_configs.append(cfg)

    clean_counts_ref = None
    if state.distributed:
        # the 10^12-doc path: every broadcast below becomes a hash join
        # against the state Datasets (build_dist module docstring)
        import concurrent.futures as _icf

        from .build_dist import object_side_dist, si_by_item, subject_side_dist

        refs = None
        # clean-value scan and the si_by_item state pre-join are
        # independent — materialize them concurrently, both OFF the
        # facts chain's critical path (PERF_NOTES #39: every barrier
        # removed from the chain is a fixed all-to-all latency saved)
        with _icf.ThreadPoolExecutor(max_workers=2) as _sp:
            f_clean = _sp.submit(
                lambda: build_clean_values_ds(root, state).materialize()
            )
            f_si = _sp.submit(lambda: si_by_item(state).materialize())
            clean_ds = f_clean.result()
            si_item_ds = f_si.result()
        subjects = subject_side_dist(
            root, configs, state, num_partitions, si_item=si_item_ds
        )
        objects = object_side_dist(
            root, configs, state, clean_ds, T.PS_PREFIX, T.PSV_PREFIX,
            num_partitions, si_item=si_item_ds,
        )
    else:
        # the four broadcast-state builds are independent: the two
        # cluster-bound ones (clean values, best-rank hashes) normally
        # start inside build_state the moment the URI merge resolves
        # (state.prewarmed futures) — here we only fall back for states
        # constructed without that hook, and overlap the driver-bound
        # packings in threads either way
        import concurrent.futures as _cf

        pre = state.prewarmed or {}
        with _cf.ThreadPoolExecutor(max_workers=4) as _pool:
            if "clean_maps_ref" in pre:
                # remote-packed: (hmm_ref, counts_ref) resolve as soon
                # as the scan does; the pack overlaps the facts join
                f_clean = None
            else:
                f_clean = pre.get("clean_maps") or _pool.submit(
                    build_clean_hmms, root, state, state.stats
                )
            if "best_rank_ref" in pre:
                f_rank = None  # remote-packed by the fused state scan
            else:
                f_rank = pre.get("best_rank") or _pool.submit(
                    best_rank_hashed_set, root
                )
            f_uri = _pool.submit(state.packed_ref, "uri_mapping")
            f_si = _pool.submit(state.packed_ref, "shape_instances")
            refs = {"uri_mapping": f_uri.result()}
            refs["shape_instances"] = f_si.result()
            if f_rank is None:
                set_ref, ok_ref = pre["best_rank_ref"]
                if ray.get(ok_ref):  # tiny bool; the pack resolved long ago
                    refs["best_rank"] = set_ref
                else:  # 64-bit collision: rebuild from the id strings
                    refs["best_rank"] = ray.put(best_rank_hashed_set(root))
            else:
                refs["best_rank"] = ray.put(f_rank.result())
            if f_clean is not None:
                refs["clean_maps"] = ray.put(f_clean.result())
            else:
                hmm_ref, clean_counts_ref = pre["clean_maps_ref"].result()
                refs["clean_maps"] = hmm_ref
        _mark_timing("build_facts", "broadcast-state (clean+rank+uri+si)")

        subjects = _subject_side(root, configs, refs)
        objects = _object_side(root, configs, refs, T.PS_PREFIX, T.PSV_PREFIX)

    # task-based co-partitioned join: ONE Arrow exchange fed directly by
    # the (lazy) subject/object scan stages — the native Dataset.join
    # here spawned num_partitions CPU-reserving aggregator actors (~1 s
    # startup each) and shuffled both sides separately
    # bundle the tag stages to ~32 MB blocks: the exchange width (and
    # its reduce count) follow INPUT block count, and the read floor
    # scales with session CPUs — without this a 32-CPU session pays a
    # 64×64 exchange where an 8-CPU one pays 16×16 on the same data
    # (the join phase is latency-bound, not compute-bound)
    from .sources import store_nbytes as _snb, store_num_rows as _snr

    _rows = _snr(root)
    _row_bytes = max(1, _snb(root) // max(1, _rows))
    tag_bs = max(8192, (32 << 20) // _row_bytes)
    # YAGO4_RAY_JOIN_HASHKEYS=1: the object side stops shipping its
    # ~65 B/row cfg+statement strings through the exchange (the join
    # rides a 128-bit digest; the subject side still carries the
    # strings the downstream passes need). OFF by default: at 22 M / 8
    # CPUs on single-node plasma the string exchange measured ~1 s
    # FASTER per join (3-pair interleaved A/B, PERF_NOTES #38) — short
    # keys + shared-memory exchange beat the extra hash passes. On a
    # network cluster bytes dominate and this gate is the lever; the
    # distributed-state path (build_dist) uses digests unconditionally
    # because its semi-join sides drop their payload entirely.
    hashk = os.environ.get("YAGO4_RAY_JOIN_HASHKEYS", "0") == "1"
    joined = copartition_join(
        subjects,
        objects,
        on=("cfg", "statement"),
        left_cols=["cfg", "statement", "subject"],
        right_cols=(
            ["object", "extras"]
            if hashk
            else ["cfg", "statement", "object", "extras"]
        ),
        num_parts=num_partitions,
        tag_batch_size=tag_bs,
        hash_keys=hashk,
        dict_columns=(
            ["cfg"] if os.environ.get("YAGO4_RAY_JOIN_DICT") == "1" else None
        ),
    )

    # materialize once: consumed by the facts file, the annotation join
    # and the stats — avoids recomputing the whole pipeline 3×.
    # maxCount runs AFTER the materialize as a counts pass + broadcast
    # anti-filter (a lazy cheap map over the materialized blocks), not
    # as a second full exchange before it.
    joined_raw = joined.materialize()
    _mark_timing("build_facts", "facts-join-materialize")
    if os.environ.get("YAGO4_RAY_DS_STATS"):
        print(joined_raw.stats(), flush=True)
    joined = _apply_max_count(joined_raw, configs, num_partitions)
    _mark_timing("build_facts", "max-count")
    if refs is not None and clean_counts_ref is not None:
        # the remote pack finished long before the join it overlapped;
        # fold its per-family sizes into stats with zero added wait
        for name, n in ray.get(clean_counts_ref).items():
            state.stats.set_local("Cleaned complex type", name, n)

    cfg_path = {c.cfg_id: c.path for c in configs}
    path_ref = ray.put(cfg_path)

    def to_triples(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized: the base triple is a column projection; only the
        # (rare) complex-value rows with JSON extras take the Python loop
        paths = get_broadcast(path_ref)
        base = pd.DataFrame(
            {
                "subject": batch["subject"].to_numpy(),
                "predicate": batch["cfg"].map(paths).to_numpy(),
                "object": batch["object"].to_numpy(),
            }
        )
        extras_col = batch["extras"].fillna("").to_numpy()
        ex_mask = extras_col != ""
        if not ex_mask.any():
            return base
        subjects_out, predicates_out, objects_out = [], [], []
        for extras in extras_col[ex_mask]:
            for s, p, o in json.loads(extras):
                subjects_out.append(s)
                predicates_out.append(p)
                objects_out.append(o)
        extra = pd.DataFrame(
            {"subject": subjects_out, "predicate": predicates_out, "object": objects_out}
        )
        return pd.concat([base, extra], ignore_index=True)

    facts = joined.map_batches(to_triples, batch_format="pandas")
    if dedup:
        facts = distinct_rows(
            facts, ["subject", "predicate", "object"],
            dict_columns=_dict_cols(["predicate"]),
        )
    # advisory size/rows for downstream shuffle sizing (the facts rows
    # skip parquet staging and union straight into the combined dedup,
    # so its partition count must account for them — and its BLOCK
    # count must be re-bounded: the materialized join carries one block
    # per join/max-count part, and a sort shuffle's exchange is
    # (input blocks × output partitions) objects sized to the input
    # block count, so an unbounded union leg makes the dedup quadratic
    # in part count again — PERF_NOTES #20/#23)
    # advisory sizes come from the RAW materialized join (free) — an
    # upper bound on the max-count-filtered rows, which is all shuffle
    # sizing needs
    facts.join_size_bytes = joined_raw.size_bytes()
    facts.join_rows = joined_raw.count()

    # ---- annotations (plan.rs:1034-1064, 1165-1192) ----
    if ann_configs:
        if state.distributed:
            from .build_dist import object_side_dist

            ann_objects = object_side_dist(
                root, ann_configs, state, clean_ds, T.PQ_PREFIX, T.PQV_PREFIX,
                num_partitions,
            )
        else:
            ann_objects = _object_side(
                root, ann_configs, refs, T.PQ_PREFIX, T.PQV_PREFIX
            )
        ann_paths = ray.put({c.cfg_id: c.path for c in ann_configs})

        def ann_rows(batch: pd.DataFrame) -> pd.DataFrame:
            paths = get_broadcast(ann_paths)
            batch = batch.copy()
            batch["ann_pred"] = batch["cfg"].map(paths)
            return batch.rename(
                columns={"object": "ann_obj", "extras": "ann_extras"}
            )[["statement", "ann_pred", "ann_obj", "ann_extras"]]

        annotations = ann_objects.map_batches(ann_rows, batch_format="pandas")

        # Volume-gated stitch (same discipline as the minhash verify):
        # annotations are a small fraction of the statements (qualifier
        # predicates), yet the join path must shuffle the ENTIRE
        # materialized facts join to meet them — measured as a second
        # wide job running as long as the combined dedup it competes
        # with. Under the cap (uncompressed pq:/pqv: partition footer
        # bytes, an upper bound on the cleaned annotation rows), collect
        # the annotations ONCE, broadcast, and stitch inside a narrow
        # map over `joined` — zero extra exchanges. Above the cap (or in
        # distributed mode, where state never transits the driver), the
        # co-partitioned join stands.
        from .broadcast import HashedSet
        from .sources import store_nbytes

        ann_preds = []
        for cfg in ann_configs:
            prefix = T.PQV_PREFIX if cfg.complex_value else T.PQ_PREFIX
            for pid in cfg.pids:
                ann_preds.append(T.iri(f"{prefix}{pid}"))
        ann_cap = int(
            os.environ.get("YAGO4_RAY_ANN_BROADCAST_CAP", str(64 << 20))
        )
        ann_src_bytes = store_nbytes(root, ann_preds)
        if not state.distributed and ann_src_bytes <= ann_cap:
            ann_df = annotations.to_pandas()  # bounded by the gate
            ann_ref = ray.put((HashedSet(ann_df["statement"]), ann_df))

            def stitch(batch: pd.DataFrame) -> pd.DataFrame:
                stmt_set, ann_local = get_broadcast(ann_ref)
                # hashed membership pre-filter (false positives are
                # resolved by the exact merge below)
                keep = stmt_set.contains(batch["statement"])
                cols = ["statement", "cfg", "subject", "object"]
                if not keep.any():
                    empty = {
                        c: pd.Series([], dtype=object)
                        for c in cols
                        + ["ann_pred", "ann_obj", "ann_extras"]
                    }
                    return pd.DataFrame(empty)
                return batch.loc[keep, cols].merge(
                    ann_local, on="statement", how="inner"
                )

            ann_joined = joined.map_batches(stitch, batch_format="pandas")
        else:
            kept = joined.map_batches(
                lambda b: b[["statement", "cfg", "subject", "object"]],
                batch_format="pandas",
            )
            # to_annotated never reads `statement` — under hash_keys
            # neither side ships the ~53 B statement string at all
            # (same gate + default as the facts join above)
            hashk = os.environ.get("YAGO4_RAY_JOIN_HASHKEYS", "0") == "1"
            ann_joined = copartition_join(
                kept,
                annotations,
                on="statement",
                left_cols=(
                    ["cfg", "subject", "object"]
                    if hashk
                    else ["statement", "cfg", "subject", "object"]
                ),
                right_cols=(
                    ["ann_pred", "ann_obj", "ann_extras"]
                    if hashk
                    else ["statement", "ann_pred", "ann_obj", "ann_extras"]
                ),
                num_parts=num_partitions,
                hash_keys=hashk,
            )

        def to_annotated(batch: pd.DataFrame) -> pd.DataFrame:
            # vectorized like to_triples: base rows project straight from
            # columns; only rows with JSON ann_extras loop
            paths = get_broadcast(path_ref)
            base = pd.DataFrame(
                {
                    "subject": batch["subject"].to_numpy(),
                    "predicate": batch["cfg"].map(paths).to_numpy(),
                    "object": batch["object"].to_numpy(),
                    "annotation_predicate": batch["ann_pred"].to_numpy(),
                    "annotation_object": batch["ann_obj"].to_numpy(),
                }
            )
            extras_col = batch["ann_extras"].fillna("").to_numpy()
            ex_mask = extras_col != ""
            if not ex_mask.any():
                return base
            out = {
                "subject": [], "predicate": [], "object": [],
                "annotation_predicate": [], "annotation_object": [],
            }
            for ann_extras in extras_col[ex_mask]:
                for s, p, o in json.loads(ann_extras):
                    out["subject"].append(s)
                    out["predicate"].append(p)
                    out["object"].append(o)
                    out["annotation_predicate"].append("")
                    out["annotation_object"].append("")
            return pd.concat([base, pd.DataFrame(out)], ignore_index=True)

        annotated = ann_joined.map_batches(to_annotated, batch_format="pandas")
        if dedup:
            annotated = distinct_rows(
                annotated,
                ["subject", "predicate", "object",
                 "annotation_predicate", "annotation_object"],
                dict_columns=_dict_cols(["predicate", "annotation_predicate"]),
            )
    else:
        annotated = ray.data.from_pandas(
            pd.DataFrame(
                {c: []
                 for c in ("subject", "predicate", "object",
                           "annotation_predicate", "annotation_object")}
            ).astype(str)
        )
    return facts, annotated


# ---------------------------------------------------------------------------
# Shared per-predicate-group kernels: used by BOTH the individual output
# builders (the queries() API) and generate_yago's fused output scan, so
# the two paths cannot drift.
# ---------------------------------------------------------------------------

def _label_shape_groups(group: pd.DataFrame, pred_shapes, uri_map, instances):
    """(path, subjects, objects) per label shape matching this predicate
    group (datatype filter + shape-instance membership, plan.rs:845-880)."""
    subjects = uri_map.lookup(group["subject"])
    dtypes = datatype_series(group["object"])
    mapped = subjects.notna()
    for path, dts, parent in pred_shapes:
        inst = instances.get(parent)
        if inst is None:
            continue
        keep = (
            dtypes.isin(dts)
            & mapped
            & pd.Series(inst.contains(subjects.fillna("")), index=group.index)
        )
        if keep.any():
            yield path, subjects[keep].to_numpy(), group["object"][keep].to_numpy()


def _class_label_group(group: pd.DataFrame, uri_map, classes):
    """Subjects/objects of class label/comment rows (plan.rs:1741-1781)."""
    subjects = uri_map.lookup(group["subject"])
    keep = subjects.notna().to_numpy() & classes.contains(subjects.fillna(""))
    return subjects[keep].to_numpy(), group["object"][keep].to_numpy()


def _full_types_group(group: pd.DataFrame, uri_map, things, class_map):
    """P31 rows → (instance, yago class) pairs via the class mapping
    fan-out (plan.rs:744-770)."""
    instances = uri_map.lookup(group["subject"])
    keep = instances.notna().to_numpy() & things.contains(instances.fillna(""))
    base = pd.DataFrame(
        {"instance": instances, "wd_class": group["object"]}
    )[keep]
    subs, objs = [], []
    for wd_class, g in base.groupby("wd_class", sort=False):
        for yago_class in class_map.get(wd_class, ()):
            subs.append(g["instance"].to_numpy())
            objs.append(np.full(len(g), yago_class, dtype=object))
    if not subs:
        e = np.empty(0, dtype=object)
        return e, e
    return np.concatenate(subs), np.concatenate(objs)


def _freebase_group(group: pd.DataFrame, uri_map, things):
    """P646 rows → owl:sameAs freebase ids (plan.rs:1730-1739)."""
    yago = uri_map.lookup(group["subject"])
    keep = yago.notna().to_numpy() & things.contains(yago.fillna(""))
    fb = group["object"][keep].map(C.convert_freebase_id)
    keep2 = fb.notna()
    return yago[keep][keep2].to_numpy(), fb[keep2].to_numpy()


def _wikipedia_group(group: pd.DataFrame, uri_map, things):
    """schema:about rows with wikipedia subjects → schema:sameAs URL
    literals (plan.rs:1711-1728)."""
    is_wp = group["subject"].str.startswith("<") & group["subject"].str.contains(
        ".wikipedia.org/wiki/", regex=False
    )
    yago = uri_map.lookup(group["object"])
    keep = (
        is_wp.to_numpy()
        & yago.notna().to_numpy()
        & things.contains(yago.fillna(""))
    )
    urls = group["subject"][keep].str.slice(1, -1)
    return (
        yago[keep].to_numpy(),
        ('"' + urls + f'"^^<{T.XSD_ANY_URI}>').to_numpy(),
    )


def _label_pred_to_shapes(
    state: BuildState, paths: list[str]
) -> dict[str, list]:
    """predicate → [(path, datatypes, parent target class)] for the
    simple label shapes (plan.rs:818-892 dispatch table)."""
    schema = state.schema
    pred_to_shapes: dict[str, list] = {}
    for shape in (s for s in schema.property_shapes() if s.path in paths):
        if not shape.datatypes:
            raise NotImplementedError("label path without datatypes")
        if shape.nodes:
            continue
        if shape.max_count is not None or shape.pattern is not None:
            raise NotImplementedError(
                "maxCount/pattern on the simple label path (plan.rs:864-881)"
            )
        parent = schema.node_shape(shape.parent_shape).target_class
        for pred in shape.from_properties:
            pred_to_shapes.setdefault(pred, []).append(
                (shape.path, frozenset(shape.datatypes), parent)
            )
    return pred_to_shapes


# ---------------------------------------------------------------------------
# Labels (build_simple_properties_from_schema, plan.rs:818-892)
# ---------------------------------------------------------------------------

def build_labels(root: str, state: BuildState, paths: list[str] | None = None, dedup: bool = True) -> Dataset:
    """Label/comment/alternateName triples in ONE fused scan over every
    label predicate (per-shape dispatch vectorized inside batches); the
    reference scans per shape (plan.rs:818-892)."""
    paths = paths or LABEL_PATHS
    schema = state.schema
    shapes_meta: list[tuple[str, frozenset, str, tuple[str, ...]]] = []
    for shape in (s for s in schema.property_shapes() if s.path in paths):
        if not shape.datatypes:
            raise NotImplementedError("label path without datatypes")
        if shape.nodes:
            continue
        if shape.max_count is not None or shape.pattern is not None:
            raise NotImplementedError(
                "maxCount/pattern on the simple label path (plan.rs:864-881)"
            )
        parent = schema.node_shape(shape.parent_shape).target_class
        shapes_meta.append(
            (shape.path, frozenset(shape.datatypes), parent,
             tuple(shape.from_properties))
        )
    if not shapes_meta:
        return _empty_triples()

    if state.distributed:
        from .build_dist import labels_dist

        ds = labels_dist(root, state, shapes_meta)
    else:
        pred_to_shapes: dict[str, list] = {}
        for path, dts, parent, preds in shapes_meta:
            for pred in preds:
                pred_to_shapes.setdefault(pred, []).append((path, dts, parent))
        refs = {
            "uri_mapping": state.packed_ref("uri_mapping"),
            "shape_instances": state.packed_ref("shape_instances"),
        }

        def stage(batch: pd.DataFrame):
            uri_map = get_broadcast(refs["uri_mapping"])
            instances = get_broadcast(refs["shape_instances"])
            subs, preds, objs = [], [], []
            for pred, group in batch.groupby("predicate", sort=False):
                for path, s, o in _label_shape_groups(
                    group, pred_to_shapes.get(pred, ()), uri_map, instances
                ):
                    subs.append(s)
                    preds.append(np.full(len(s), path, dtype=object))
                    objs.append(o)
            if not subs:
                return _spo_arrow([], "", [])
            return _spo_arrow(
                np.concatenate(subs),
                np.concatenate(preds),
                np.concatenate(objs),
            )

        ds = scan_predicate(root, list(pred_to_shapes)).map_batches(
            stage, batch_format="pandas"
        )
    if dedup:
        ds = distinct_rows(ds, ["subject", "predicate", "object"])
    return ds


# ---------------------------------------------------------------------------
# Types / classes (plan.rs:734-814)
# ---------------------------------------------------------------------------

def build_simple_types(state: BuildState) -> Dataset:
    """rdf:type triples straight from the shape-instances Dataset (ST3)
    — no driver-side row materialization at any scale."""
    inst = state.datasets.get("shape_instances")
    if inst is None:
        # instance strings never transit the driver (shape_instances
        # holds packed hash sets); the Dataset is the only string source
        raise ValueError(
            "BuildState.datasets['shape_instances'] required for "
            "simple-types (state built by build_state always carries it)"
        )
    return inst.map_batches(
        lambda b: _spo_arrow(b["instance"], T.RDF_TYPE, b["shape"]),
        batch_format="pandas",
    )


def build_full_types(root: str, state: BuildState, dedup: bool = True) -> Dataset:
    if state.distributed:
        from .build_dist import full_types_dist

        out = full_types_dist(root, state)
        if dedup:
            out = distinct_rows(out, ["subject", "predicate", "object"])
        return out
    refs = {
        "uri_mapping": state.packed_ref("uri_mapping"),
        "things": state.packed_ref("things"),
        # class mapping is class-graph scale — a plain dict is fine
        "class_mapping": ray.put(state.wd_to_yago_class_mapping),
    }
    p31 = scan_predicate(root, f"<{T.WDT}P31>")

    def stage(batch: pd.DataFrame):
        s, o = _full_types_group(
            batch,
            get_broadcast(refs["uri_mapping"]),
            get_broadcast(refs["things"]),
            get_broadcast(refs["class_mapping"]),
        )
        return _spo_arrow(s, T.RDF_TYPE, o)

    out = p31.map_batches(stage, batch_format="pandas")
    if dedup:
        out = distinct_rows(out, ["subject", "predicate", "object"])
    return out


def _classes_static_rows(state: BuildState) -> list:
    """The driver-derived class rows (owl:Class types + subclass edges)
    — the store-scan label/comment rows live in the shared kernels."""
    rows = [(c, T.RDF_TYPE, T.OWL_CLASS) for c in state.yago_classes]
    rows += [
        (sub, T.RDFS_SUB_CLASS_OF, sup)
        for sup, subs in state.yago_super_class_of.items()
        for sub in subs
    ]
    return rows


def _classes_static_ds(state: BuildState) -> Dataset:
    return _triples_ds(_classes_static_rows(state))


def build_classes_description(root: str, state: BuildState, dedup: bool = True) -> Dataset:
    static = _classes_static_ds(state)
    from .broadcast import HashedSet

    refs = {
        "uri_mapping": state.packed_ref("uri_mapping"),
        "classes": ray.put(HashedSet(state.yago_classes)),
    }

    def class_labels(batch: pd.DataFrame, predicate: str):
        s, o = _class_label_group(
            batch,
            get_broadcast(refs["uri_mapping"]),
            get_broadcast(refs["classes"]),
        )
        return _spo_arrow(s, predicate, o)

    labels = scan_predicate(root, T.SKOS_PREF_LABEL).map_batches(
        lambda b: class_labels(b, T.RDFS_LABEL), batch_format="pandas"
    )
    comments = scan_predicate(root, T.SCHEMA_DESCRIPTION).map_batches(
        lambda b: class_labels(b, T.RDFS_COMMENT), batch_format="pandas"
    )
    out = static.union(labels, comments)
    if dedup:
        out = distinct_rows(out, ["subject", "predicate", "object"])
    return out


# ---------------------------------------------------------------------------
# sameAs (plan.rs:1690-1780)
# ---------------------------------------------------------------------------

def _same_as_static(state: BuildState, refs: dict | None = None) -> Dataset:
    """wd identity + dbpedia links from the state DATASETS (no store
    scan, no driver-side row loop); the things membership is a broadcast."""
    if refs is None:
        refs = {
            "uri_mapping": state.packed_ref("uri_mapping"),
            "things": state.packed_ref("things"),
        }

    def wd_links(batch: pd.DataFrame):
        things_b = get_broadcast(refs["things"])
        keep = things_b.contains(batch["uri"])
        sel = batch[keep]
        return _spo_arrow(sel["uri"], T.OWL_SAME_AS, sel["item"])

    def dbpedia_links(batch: pd.DataFrame):
        uri_map = get_broadcast(refs["uri_mapping"])
        things_b = get_broadcast(refs["things"])
        yago = uri_map.lookup(batch["item"])
        keep = yago.notna().to_numpy() & things_b.contains(yago.fillna(""))
        sel = batch[keep]
        return _spo_arrow(
            yago[keep],
            T.OWL_SAME_AS,
            "<" + sel["url"].map(C.enwiki_to_dbpedia) + ">",
        )

    return state.datasets["uri_mapping"].map_batches(
        wd_links, batch_format="pandas"
    ).union(
        state.datasets["enwiki"].map_batches(dbpedia_links, batch_format="pandas")
    )


def build_same_as(root: str, state: BuildState, dedup: bool = True) -> Dataset:
    if state.distributed:
        from .build_dist import same_as_dist

        out = same_as_dist(root, state)
        if dedup:
            out = distinct_rows(out, ["subject", "predicate", "object"])
        return out

    refs = {
        "uri_mapping": state.packed_ref("uri_mapping"),
        "things": state.packed_ref("things"),
    }
    static = _same_as_static(state, refs)

    def freebase(batch: pd.DataFrame):
        s, o = _freebase_group(
            batch,
            get_broadcast(refs["uri_mapping"]),
            get_broadcast(refs["things"]),
        )
        return _spo_arrow(s, T.OWL_SAME_AS, o)

    freebase_ds = scan_predicate(root, f"<{T.WDT}P646>").map_batches(
        freebase, batch_format="pandas"
    )

    def wikipedia(batch: pd.DataFrame):
        s, o = _wikipedia_group(
            batch,
            get_broadcast(refs["uri_mapping"]),
            get_broadcast(refs["things"]),
        )
        return _spo_arrow(s, T.SCHEMA_SAME_AS, o)

    wikipedia_ds = scan_predicate(root, T.SCHEMA_ABOUT).map_batches(
        wikipedia, batch_format="pandas"
    )
    out = static.union(freebase_ds, wikipedia_ds)
    if dedup:
        out = distinct_rows(out, ["subject", "predicate", "object"])
    return out


# ---------------------------------------------------------------------------
# Fused output scan (generate_yago's staging path)
# ---------------------------------------------------------------------------

def build_scan_outputs(root: str, state: BuildState) -> Dataset:
    """Every STORE-SCAN output row (labels, class label/comment,
    full-types, sameAs freebase/wikipedia) in ONE tagged pass over the
    union of their predicate partitions, emitting (file, subject,
    predicate, object). Four separate pipelines re-read overlapping
    partitions (skos:prefLabel twice) and pay four executor startups;
    at 100 TB one scan is strictly less I/O and exchange. Broadcast-
    state mode only — the distributed path joins per pipeline
    (build_dist) — and uses the SAME per-group kernels as the
    individual builders, so the fused and per-pipeline paths cannot
    drift. The static/dataset-driven parts (ontology rows, wd/dbpedia
    links, simple-types) stay separate tiny jobs in generate_yago."""
    from .broadcast import HashedSet

    pred_to_shapes = _label_pred_to_shapes(state, LABEL_PATHS)
    refs = {
        "uri_mapping": state.packed_ref("uri_mapping"),
        "shape_instances": state.packed_ref("shape_instances"),
        "things": state.packed_ref("things"),
        "classes": ray.put(HashedSet(state.yago_classes)),
        "class_mapping": ray.put(state.wd_to_yago_class_mapping),
    }
    p31_pred = f"<{T.WDT}P31>"
    p646_pred = f"<{T.WDT}P646>"
    preds = set(pred_to_shapes) | {
        T.SKOS_PREF_LABEL, T.SCHEMA_DESCRIPTION, p31_pred, p646_pred,
        T.SCHEMA_ABOUT,
    }

    def route(batch: pd.DataFrame) -> pa.Table:
        uri_map = get_broadcast(refs["uri_mapping"])
        instances = get_broadcast(refs["shape_instances"])
        things = get_broadcast(refs["things"])
        classes = get_broadcast(refs["classes"])
        class_map = get_broadcast(refs["class_mapping"])
        files, subs, prs, objs = [], [], [], []

        def emit(file: str, s, p, o):
            n = len(s)
            if n == 0:
                return
            files.append(np.full(n, file, dtype=object))
            subs.append(np.asarray(s, dtype=object))
            prs.append(
                np.full(n, p, dtype=object)
                if isinstance(p, str)
                else np.asarray(p, dtype=object)
            )
            objs.append(np.asarray(o, dtype=object))

        for pred, group in batch.groupby("predicate", sort=False):
            shapes = pred_to_shapes.get(pred)
            if shapes:
                for path, s, o in _label_shape_groups(
                    group, shapes, uri_map, instances
                ):
                    emit("labels", s, path, o)
            if pred == T.SKOS_PREF_LABEL:
                s, o = _class_label_group(group, uri_map, classes)
                emit("class", s, T.RDFS_LABEL, o)
            elif pred == T.SCHEMA_DESCRIPTION:
                s, o = _class_label_group(group, uri_map, classes)
                emit("class", s, T.RDFS_COMMENT, o)
            elif pred == p31_pred:
                s, o = _full_types_group(group, uri_map, things, class_map)
                emit("full-types", s, T.RDF_TYPE, o)
            elif pred == p646_pred:
                s, o = _freebase_group(group, uri_map, things)
                emit("sameAs", s, T.OWL_SAME_AS, o)
            elif pred == T.SCHEMA_ABOUT:
                s, o = _wikipedia_group(group, uri_map, things)
                emit("sameAs", s, T.SCHEMA_SAME_AS, o)
        if not files:
            return pa.table(
                {
                    c: pa.array([], pa.string())
                    for c in ("file", "subject", "predicate", "object")
                }
            )
        return pa.table(
            {
                "file": pa.array(
                    np.concatenate(files), pa.string(), from_pandas=True
                ),
                "subject": pa.array(
                    np.concatenate(subs), pa.string(), from_pandas=True
                ),
                "predicate": pa.array(
                    np.concatenate(prs), pa.string(), from_pandas=True
                ),
                "object": pa.array(
                    np.concatenate(objs), pa.string(), from_pandas=True
                ),
            }
        )

    return scan_predicate(root, sorted(preds)).map_batches(
        route, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Ontology + shape emission (driver-side, plan.rs:1783-2202)
# ---------------------------------------------------------------------------

def _add_list_object(
    rows: list, subject: str, predicate: str, objects: list[str]
) -> None:
    """subject predicate (o1 ... on) as rdf:first/rest (plan.rs:2000-2029)."""
    name = f"list-{T.string_name(objects)}-"
    current = T.RDF_NIL
    items = list(objects)
    while items:
        nxt = items.pop()
        node = T.blank_node(f"{name}{len(items) + 1}")
        rows.append((node, T.RDF_REST, current))
        rows.append((node, T.RDF_FIRST, nxt))
        current = node
    rows.append((subject, predicate, current))


def _add_union_of(
    rows: list, subject: str, predicate: str, objects: list[str], cls: str
) -> None:
    objects = sorted(set(objects))
    if len(objects) == 1:
        rows.append((subject, predicate, objects[0]))
        return
    union = T.blank_node(
        f"{T.string_name([subject])}-{T.string_name([predicate])}-owl-unionOf-"
        f"{T.string_name(objects)}"
    )
    rows.append((subject, predicate, union))
    rows.append((union, T.RDF_TYPE, cls))
    _add_list_object(rows, union, T.OWL_UNION_OF, objects)


def build_yago_schema(schema: Schema) -> Dataset:
    return _triples_ds(_yago_schema_rows(schema))


def _yago_schema_rows(schema: Schema) -> list:
    rows: list[tuple[str, str, str]] = []
    domains: dict[str, set[str]] = {}
    object_ranges: dict[str, set[str]] = {}
    datatype_ranges: dict[str, set[str]] = {}

    for shape in schema.node_shapes():
        cls = schema.rdfs_class(shape.target_class)
        if cls is None:
            continue
        rows.append((cls.id, T.RDF_TYPE, T.OWL_CLASS))
        if cls.label:
            rows.append((cls.id, T.RDFS_LABEL, T.term_camel_case_to_regular(cls.label)))
        if cls.comment:
            rows.append((cls.id, T.RDFS_COMMENT, cls.comment))
        for super_class in cls.super_classes:
            if super_class in (T.SCHEMA_INTANGIBLE, T.SCHEMA_ENUMERATION):
                rows.append((cls.id, T.RDFS_SUB_CLASS_OF, T.SCHEMA_THING))
            elif super_class in (T.SCHEMA_MEDICAL_INTANGIBLE, T.SCHEMA_MEDICAL_ENUMERATION):
                rows.append((cls.id, T.RDFS_SUB_CLASS_OF, T.SCHEMA_MEDICAL_ENTITY))
            elif super_class in (T.SCHEMA_STRUCTURED_VALUE, T.SCHEMA_SERIES):
                pass
            else:
                rows.append((cls.id, T.RDFS_SUB_CLASS_OF, super_class))
        for disjoint in cls.disjoint_classes:
            rows.append((cls.id, T.OWL_DISJOINT_WITH, disjoint))

    for shape in schema.property_shapes():
        prop = schema.rdf_property(shape.path)
        if prop is None:
            continue
        if shape.nodes and not shape.datatypes:
            kind = T.OWL_OBJECT_PROPERTY
        elif shape.datatypes and not shape.nodes:
            kind = T.OWL_DATATYPE_PROPERTY
        else:
            kind = T.RDF_PROPERTY
        rows.append((prop.id, T.RDF_TYPE, kind))
        if prop.label:
            rows.append((prop.id, T.RDFS_LABEL, T.term_camel_case_to_regular(prop.label)))
        if prop.comment:
            rows.append((prop.id, T.RDFS_COMMENT, prop.comment))
        for sp in prop.super_properties:
            rows.append((prop.id, T.RDFS_SUB_PROPERTY_OF, sp))
        for inv in prop.inverse:
            rows.append((prop.id, T.OWL_INVERSE_OF, inv))
        if shape.max_count == 1:
            rows.append((prop.id, T.RDF_TYPE, T.OWL_FUNCTIONAL_PROPERTY))
        if shape.parent_shape is not None:
            domains.setdefault(shape.path, set()).add(
                schema.node_shape(shape.parent_shape).target_class
            )
        for node in shape.nodes:
            object_ranges.setdefault(shape.path, set()).add(
                schema.node_shape(node).target_class
            )
        for dt in shape.datatypes:
            datatype_ranges.setdefault(shape.path, set()).add(
                T.iri(T.RDF_PLAIN_LITERAL) if dt == T.RDF_LANG_STRING else T.iri(dt)
            )

    for prop, classes in sorted(domains.items()):
        _add_union_of(rows, prop, T.RDFS_DOMAIN, sorted(classes), T.OWL_CLASS)
    for prop, classes in sorted(object_ranges.items()):
        _add_union_of(rows, prop, T.RDFS_RANGE, sorted(classes), T.OWL_CLASS)
    for prop, dts in sorted(datatype_ranges.items()):
        _add_union_of(rows, prop, T.RDFS_RANGE, sorted(dts), T.RDFS_DATATYPE)

    return sorted(set(rows))


def build_yago_shapes(schema: Schema) -> Dataset:
    return _triples_ds(_yago_shapes_rows(schema))


def _yago_shapes_rows(schema: Schema) -> list:
    rows: list[tuple[str, str, str]] = []
    for node_shape in schema.node_shapes():
        if not node_shape.properties:
            continue
        target = node_shape.target_class
        rows.append((target, T.RDF_TYPE, T.SH_NODE_SHAPE))
        rows.append((target, T.SH_TARGET_CLASS, target))
        for ps in node_shape.properties:
            sid = T.iri(
                f"{T.YAGO_VALUE_PREFIX}shape-prop-"
                f"{T.string_name([target, ps.path])}"
            )
            rows.append((target, T.SH_PROPERTY, sid))
            rows.append((sid, T.RDF_TYPE, T.SH_PROPERTY_SHAPE))
            rows.append((sid, T.SH_PATH, ps.path))
            dts = [T.iri(d) for d in ps.datatypes]
            if len(dts) == 1:
                rows.append((sid, T.SH_DATATYPE, dts[0]))
            elif len(dts) > 1:
                members = []
                for dt in dts:
                    member = T.iri(
                        f"{T.YAGO_VALUE_PREFIX}sh-datatype-{T.string_name([dt])}"
                    )
                    rows.append((member, T.SH_DATATYPE, dt))
                    members.append(member)
                _add_list_object(rows, sid, T.SH_OR, members)
            if len(ps.nodes) == 1:
                rows.append((sid, T.SH_NODE, ps.nodes[0]))
            elif len(ps.nodes) > 1:
                members = []
                for node in ps.nodes:
                    member = T.iri(
                        f"{T.YAGO_VALUE_PREFIX}sh-node-{T.string_name([node])}"
                    )
                    rows.append((member, T.SH_NODE, node))
                    members.append(member)
                _add_list_object(rows, sid, T.SH_OR, members)
            if ps.is_unique_lang:
                rows.append(
                    (sid, T.SH_UNIQUE_LANG, T.typed_literal("true", T.XSD_BOOLEAN))
                )
            if ps.max_count is not None:
                rows.append((sid, T.SH_MAX_COUNT, T.integer_literal(ps.max_count)))
            if ps.pattern is not None:
                rows.append((sid, T.SH_PATTERN, T.string_literal(ps.pattern)))
    return sorted(set(rows))


# ---------------------------------------------------------------------------
# Top-level orchestration (generate_yago, plan.rs:64-203)
# ---------------------------------------------------------------------------

def build_outputs_raw(
    statements_root: str, state: BuildState
) -> tuple[dict[str, Dataset], Dataset]:
    """All 8 triple outputs (un-deduplicated) + the RDF* output."""
    facts, annotated = build_facts(statements_root, state, dedup=False)
    outputs = {
        "class": build_classes_description(statements_root, state, dedup=False),
        "simple-types": build_simple_types(state),
        "full-types": build_full_types(statements_root, state, dedup=False),
        "labels": build_labels(statements_root, state, dedup=False),
        "facts": facts,
        "sameAs": build_same_as(statements_root, state, dedup=False),
        "schema": build_yago_schema(state.schema),
        "shapes": build_yago_shapes(state.schema),
    }
    return outputs, annotated


def build_combined(statements_root: str, state: BuildState) -> tuple[Dataset, Dataset]:
    """The whole build as ONE streaming DAG: every output tagged with a
    `file` column, unioned, deduplicated in a single full-key shuffle
    (instead of one shuffle per output) — the scale-efficient
    materialization path. Returns (combined triples, annotated)."""
    outputs, annotated = build_outputs_raw(statements_root, state)

    def tag(name):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["file"] = name
            return batch

        return fn

    tagged = [
        ds.map_batches(tag(name), batch_format="pandas")
        for name, ds in outputs.items()
    ]
    from .sources import store_nbytes

    # dedup partition count follows data volume (output triples scale
    # with the store); 32 stays the small-input floor
    n_parts = max(32, partitions_for_nbytes(store_nbytes(statements_root)))
    combined = tagged[0].union(*tagged[1:])
    combined = distinct_rows(
        combined, ["file", "subject", "predicate", "object"], num_parts=n_parts,
        dict_columns=_dict_cols(["file", "predicate"]),
    )
    annotated = distinct_rows(
        annotated,
        ["subject", "predicate", "object", "annotation_predicate", "annotation_object"],
        num_parts=n_parts,
        dict_columns=_dict_cols(["predicate", "annotation_predicate"]),
    )
    return combined, annotated

def output_lineage(statements_root: str, state: BuildState) -> str:
    import hashlib

    from .checkpoint import compute_lineage

    shapes_hash = hashlib.blake2b(
        "".join(
            f"{s.id}{s.target_class}{s.from_classes}{[p for p in s.properties]}"
            for s in state.schema.node_shapes()
        ).encode(),
        digest_size=8,
    ).hexdigest()
    return compute_lineage(statements_root, [shapes_hash, "yago4_ray-0.1"])


OUTPUT_FILE_NAMES = {
    "class": "yago-wd-class",
    "simple-types": "yago-wd-simple-types",
    "full-types": "yago-wd-full-types",
    "labels": "yago-wd-labels",
    "facts": "yago-wd-facts",
    "annotated-facts": "yago-wd-annotated-facts",
    "sameAs": "yago-wd-sameAs",
    "schema": "yago-wd-schema",
    "shapes": "yago-wd-shapes",
}


def generate_yago(
    statements_root: str,
    out_dir: str | None = None,
    size: str = "full",
    schema: Schema | None = None,
    state: BuildState | None = None,
    write: bool = True,
    distributed: bool | None = None,
) -> dict[str, Dataset]:
    """Run the full build (plan.rs:64-203).

    write=False → returns the 9 output Datasets (each independently
    deduplicated) for inspection / per-output consumption.
    write=True  → runs the single-DAG combined path: one union + one
    full-key dedup shuffle + one global sort + one partitioned write
    producing all sorted .nt.gz output dirs, each with a checkpoint
    manifest; completed outputs (same lineage) are skipped on rerun.
    """
    if state is None:
        state = build_state(
            statements_root, schema=schema, size=size, distributed=distributed
        )

    if not (write and out_dir is not None):
        facts, annotated = build_facts(statements_root, state)
        return {
            "class": build_classes_description(statements_root, state),
            "simple-types": build_simple_types(state),
            "full-types": build_full_types(statements_root, state),
            "labels": build_labels(statements_root, state),
            "facts": facts,
            "annotated-facts": annotated,
            "sameAs": build_same_as(statements_root, state),
            "schema": build_yago_schema(state.schema),
            "shapes": build_yago_shapes(state.schema),
        }


    from .checkpoint import is_complete
    from .sources import MultiNTriplesGzDatasink

    os.makedirs(out_dir, exist_ok=True)
    lineage = output_lineage(statements_root, state)
    # partial resume: only outputs without a valid manifest are rewritten
    # (the sink ignores rows of files not in its name map). The
    # annotated-facts (RDF*) output rides the SAME staged dedup+write job
    # as the 8 triple outputs — its rows carry the two annotation columns
    # (empty on plain triples) and the sink formats/extensions per tag.
    triple_names = {
        k: v
        for k, v in OUTPUT_FILE_NAMES.items()
        if not is_complete(os.path.join(out_dir, v), lineage)
    }
    if not triple_names:
        return {}  # resume: everything already written from this input

    # Staged materialization: the 9 raw output pipelines run as
    # CONCURRENT small jobs (thread-submitted) into a parquet staging
    # dir, then ONE linear job does the full-key dedup shuffle and the
    # partitioned gz write. A single union-of-9-pipelines DAG is
    # scheduler-bound and anti-scales (measured 47.6 s vs 28.0 s at 32
    # CPUs on 2.2 M statements); the staged split keeps every job's
    # operator count small. No global sort: hash partitioning is
    # deterministic and the sink sorts within each part file, so reruns
    # are byte-identical.
    import concurrent.futures as _cf
    import glob
    import shutil
    import time as _time

    # YAGO4_RAY_TIMINGS=1 → print per-phase wall times (perf work on a
    # noisy host needs phase-level numbers, not end-to-end walls)
    _t0 = _time.perf_counter()

    def _mark(phase: str):
        nonlocal _t0
        if os.environ.get("YAGO4_RAY_TIMINGS"):
            now = _time.perf_counter()
            print(f"[generate_yago] {phase}: {now - _t0:.1f}s", flush=True)
            _t0 = now

    stage_dir = os.path.join(out_dir, ".stage")
    shutil.rmtree(stage_dir, ignore_errors=True)

    # one staging schema for all outputs (fixed column order so the
    # combined read's schema unification is trivial); plain triples
    # carry empty annotation columns — constant strings RLE-compress to
    # ~nothing in the staged parquet
    _STAGE_COLS = [
        "file", "subject", "predicate", "object",
        "annotation_predicate", "annotation_object",
    ]

    def tag(name):
        # Arrow out: tagged rows feed either the staged parquet write or
        # the combined dedup exchange directly — never pandas pickles
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            names = set(batch.column_names)

            def col(c):
                if c == "file":
                    return pa.array(
                        np.full(n, name, dtype=object), pa.string(),
                        from_pandas=True,
                    )
                if c in names:
                    a = batch.column(c)
                    return a.cast(pa.string()) if pa.types.is_null(a.type) else a
                return pa.array([""] * n, pa.string())

            return pa.table({c: col(c) for c in _STAGE_COLS})

        return fn

    def stage_one(name, ds):
        # zstd staging: staged bytes are written once and read once by
        # the dedup job; on this host's ~100 MB/s disk the snappy files
        # made that job I/O-bound (flat 8→32 CPUs). zstd ~halves the
        # bytes for a decode cost that parallelizes.
        ds.map_batches(tag(name), batch_format="pyarrow").write_parquet(
            os.path.join(stage_dir, name), compression="zstd"
        )

    # staging concurrency follows DATA SIZE: at small inputs each job is
    # sub-second of work behind ~1.5 s of executor startup, so 8 threads
    # overlap the floors; at large inputs each job saturates the cluster
    # alone and 8 concurrent streaming executors just divide the CPUs
    # and multiply scheduler overhead (measured 30.3 s concurrent vs
    # ~12 s sequential at 22 M statements / 32 CPUs; the opposite holds
    # at 2.2 M). The annotated gz write overlaps in both regimes, and
    # the FACTS JOIN overlaps the non-facts staging at wide inputs (the
    # raw pipelines are independent of the join — the only facts
    # consumer is its own staging job, which waits for the join).
    from .sources import store_nbytes

    _store_bytes = store_nbytes(statements_root)
    # threshold on UNCOMPRESSED data bytes (store_nbytes' metric): the
    # 22 M-statement store is ~1.2 GB uncompressed, sf0.1's 2.2 M is
    # ~120 MB — the gate separates the two regimes with margin
    wide_input = _store_bytes > 512 * 1024 * 1024
    stage_workers = 1 if wide_input else 8
    with _cf.ThreadPoolExecutor(max_workers=max(stage_workers, 1) + 2) as pool:
        # the facts pipeline (broadcast-state + statement join) runs in
        # a thread; non-facts staging proceeds underneath it
        f_facts = pool.submit(build_facts, statements_root, state, dedup=False)
        # DRIVER-backed outputs (schema/shapes, and the class static rows
        # in broadcast mode) are plain Python lists: staging each through
        # a Ray job paid ~0.5-1.5s of executor startup per output at
        # EVERY CPU count — pure flat time. They are written as staged
        # parquet directly on the driver (a few thousand rows each).
        static_rows = {
            "schema": _yago_schema_rows(state.schema),
            "shapes": _yago_shapes_rows(state.schema),
        }
        if state.distributed:
            # the distributed path joins per pipeline (build_dist);
            # each builder routes there internally
            others = {
                "class": build_classes_description(statements_root, state, dedup=False),
                "simple-types": build_simple_types(state),
                "full-types": build_full_types(statements_root, state, dedup=False),
                "labels": build_labels(statements_root, state, dedup=False),
                "sameAs": build_same_as(statements_root, state, dedup=False),
            }
            scan_ds = None
        else:
            # ONE fused scan covers the four store-scan pipelines
            # (labels, class label/comment, full-types, sameAs
            # freebase/wikipedia); only the static/dataset-driven rows
            # stay as separate tiny jobs
            static_rows["class"] = _classes_static_rows(state)
            others = {
                "simple-types": build_simple_types(state),
                "sameAs": _same_as_static(state),
            }
            scan_ds = build_scan_outputs(statements_root, state)

        def stage_static(name, rows):
            import pyarrow.parquet as _pq

            n = len(rows)
            tbl = pa.table(
                {
                    "file": pa.array([name] * n, pa.string()),
                    "subject": pa.array([r[0] for r in rows], pa.string()),
                    "predicate": pa.array([r[1] for r in rows], pa.string()),
                    "object": pa.array([r[2] for r in rows], pa.string()),
                    "annotation_predicate": pa.array([""] * n, pa.string()),
                    "annotation_object": pa.array([""] * n, pa.string()),
                }
            )
            os.makedirs(os.path.join(stage_dir, name), exist_ok=True)
            _pq.write_table(
                tbl,
                os.path.join(stage_dir, name, "part-0.parquet"),
                compression="zstd",
            )

        def _tag_scan_cols(batch: pa.Table) -> pa.Table:
            # rows already carry their output-file tag
            empty = pa.array([""] * batch.num_rows, pa.string())
            return (
                batch.append_column("annotation_predicate", empty)
                .append_column("annotation_object", empty)
                .select(_STAGE_COLS)
            )

        def stage_tagged(name, ds):
            ds.map_batches(_tag_scan_cols, batch_format="pyarrow").write_parquet(
                os.path.join(stage_dir, name), compression="zstd"
            )

        # scan-outputs skip the zstd-parquet round trip (write + re-read
        # through a ~100 MB/s disk) and union straight into the combined
        # dedup, like the facts leg. Blocks are bundled to ~32 MB BEFORE
        # the materialize so the dedup exchange width stays
        # volume-bounded at any session width (PERF_NOTES #33).
        # YAGO4_RAY_STAGE_SCAN=1 restores parquet staging (A/B lever).
        stage_scan = os.environ.get("YAGO4_RAY_STAGE_SCAN") == "1"

        def collect_tagged(ds):
            from .sources import store_num_rows

            rows = store_num_rows(statements_root)
            row_bytes = max(1, _store_bytes // max(1, rows))
            bs = max(8192, (32 << 20) // row_bytes)
            return ds.map_batches(
                _tag_scan_cols, batch_format="pyarrow", batch_size=bs
            ).materialize()

        scan_mem = None
        _mark("raw-plans")
        for name, rows in static_rows.items():
            stage_static(name, rows)
        if stage_workers == 1:
            # wide regime: the fused scan collect dominates this phase;
            # the 1-2 small state-dataset jobs (simple-types, sameAs
            # static) ride the pool UNDER it — 3-4 bounded concurrent
            # consumers, not the 8-way executor thrash the sequential
            # gate was measured against (30.3 s vs 12 s was EIGHT
            # concurrent staging executors). Measured at 22 M / 32
            # CPUs: stage-others 5.4 → ~4.4 s with the join unchanged.
            small_futs = [
                pool.submit(stage_one, name, ds)
                for name, ds in others.items()
            ]
            if scan_ds is not None:
                if stage_scan:
                    stage_tagged("scan-outputs", scan_ds)
                else:
                    scan_mem = collect_tagged(scan_ds)
            for f in small_futs:
                f.result()
            _mark("stage-others (overlapping facts join)")
            facts, annotated = f_facts.result()
            _mark("facts-join")
        else:
            # the non-facts outputs don't depend on the join — their
            # staging jobs run UNDER it
            futures = [
                pool.submit(stage_one, name, ds) for name, ds in others.items()
            ]
            f_scan = None
            if scan_ds is not None:
                if stage_scan:
                    futures.append(
                        pool.submit(stage_tagged, "scan-outputs", scan_ds)
                    )
                else:
                    f_scan = pool.submit(collect_tagged, scan_ds)
            facts, annotated = f_facts.result()
            _mark("facts-join (overlapping other staging)")
            for f in futures:
                f.result()
            if f_scan is not None:
                scan_mem = f_scan.result()
            _mark("stage-others")

        # facts rows skip the parquet round trip (the join output is
        # materialized with a bounded block count) and union straight
        # into the combined dedup exchange. The ANNOTATED pipeline is
        # different: it contains its own copartition_join exchange +
        # pq:/pqv: scan — nesting that sub-DAG inside the (already
        # all-to-all) dedup job serializes two shuffles in one job. It
        # used to stage through parquet and ride the combined dedup:
        # ~5.7 s of SERIAL wall at EVERY CPU count (floor-bound, not CPU
        # bound). It shares nothing with the main dedup beyond the
        # already-materialized join, so it runs as its own dedup+sink
        # job in a thread, fully overlapped with the main dedup+write.
        # YAGO4_RAY_STAGE_FACTS=1 restores parquet staging for facts
        # (A/B lever).
        stage_facts = os.environ.get("YAGO4_RAY_STAGE_FACTS") == "1"
        if stage_facts:
            stage_one("facts", facts)

        ann_name = "annotated-facts"
        facts_bytes = (
            0 if stage_facts else getattr(facts, "join_size_bytes", 0) or 0
        )

        def ann_job():
            ann_in = annotated.map_batches(
                tag(ann_name), batch_format="pyarrow"
            )
            ann_out = distinct_rows(
                ann_in,
                _STAGE_COLS,
                dict_columns=_dict_cols(
                    ["file", "predicate", "annotation_predicate"]
                ),
                # annotations are a small fraction of the facts join
                num_parts=max(8, partitions_for_nbytes(facts_bytes) // 4),
                keep_part_column=True,
            )
            ann_out.write_datasink(
                MultiNTriplesGzDatasink(
                    out_dir, {ann_name: triple_names[ann_name]},
                    lineage=lineage, extensions={ann_name: ".ntx.gz"},
                )
            )
            return ann_out

        f_ann = pool.submit(ann_job) if ann_name in triple_names else None
        main_names = {k: v for k, v in triple_names.items() if k != ann_name}

        combined = None
        if main_names:
            staged_files = sorted(
                glob.glob(os.path.join(stage_dir, "*", "*.parquet"))
            )
            # dedup partition count sized to the actual data volume (a
            # fixed count means unbounded per-partition frames as
            # outputs grow); codec-invariant footer bytes, not disk
            from .sources import parquet_data_nbytes

            staged_bytes = parquet_data_nbytes(staged_files)
            # bound the read's block count too: the dedup shuffle's
            # exchange is (input blocks × output partitions) objects, and
            # one-block-per-staged-file makes it quadratic in file count
            # (measured 723×723, 85 s at 8 CPUs vs 25 s bounded —
            # sources.read_blocks_for_nbytes)
            from .sources import read_blocks_for_nbytes

            # ALWAYS override: None lets Ray's avail_cpus×2 parallelism
            # floor split small staged files into ~2×CPU kilobyte blocks
            # through this very shuffle (PERF_NOTES #29)
            n_read_blocks = read_blocks_for_nbytes(staged_bytes)
            staged_read = ray.data.read_parquet(
                staged_files, override_num_blocks=n_read_blocks
            )
            scan_bytes = 0
            if scan_mem is not None:
                # the in-memory scan-outputs leg: already tagged, already
                # block-bounded by collect_tagged
                scan_bytes = scan_mem.size_bytes() or 0
                staged_read = staged_read.union(scan_mem)
            if stage_facts:
                combined_in = staged_read
            else:
                # coalesce the facts leg to the same volume-bounded
                # block count as the staged read: the materialized join
                # arrives as one block per join/max-count part (128 at
                # 22 M), and the dedup's sort shuffle sizes BOTH its
                # exchange width and its output partition count to the
                # input block count — measured 161 input blocks → a
                # 161×161 exchange and a flat ~10 s dedup at every CPU
                # count. batch_size bundles adjacent blocks per map
                # task (no extra exchange).
                facts_rows = getattr(facts, "join_rows", 0) or 0
                n_facts_blocks = read_blocks_for_nbytes(facts_bytes)
                coalesce_bs = (
                    max(8192, -(-facts_rows // n_facts_blocks))
                    if facts_rows
                    else None
                )
                combined_in = staged_read.union(
                    facts.map_batches(
                        tag("facts"),
                        batch_format="pyarrow",
                        batch_size=coalesce_bs,
                    )
                )
            combined = distinct_rows(
                combined_in,
                _STAGE_COLS,  # full key incl. annotation columns ("")
                dict_columns=_dict_cols(["file", "predicate"]),
                num_parts=max(
                    32,
                    partitions_for_nbytes(
                        staged_bytes + facts_bytes + scan_bytes
                    ),
                ),
                keep_part_column=True,  # deterministic part-file naming
            )
            combined.write_datasink(
                MultiNTriplesGzDatasink(
                    out_dir, main_names, lineage=lineage,
                )
            )
            if os.environ.get("YAGO4_RAY_DS_STATS"):
                print(combined.stats(), flush=True)
            _mark("main dedup+gz-write")
        if f_ann is not None:
            ann_written = f_ann.result()
            combined = combined if combined is not None else ann_written
        _mark("annotated-job wait")
    shutil.rmtree(stage_dir, ignore_errors=True)
    state.stats.write(os.path.join(out_dir, "stats.tsv"))
    return {"combined": combined, "annotated-facts": annotated}
