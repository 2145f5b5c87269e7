"""The YAGO build: shape-driven fact extraction and the 9 output tables.

Re-expresses the reference's 8-thread build plan (plan.rs:103-202) as
Ray Data pipelines over the predicate-partitioned statement store:

- ONE combined pass over the p:/ps:/psv: statement families covers every
  property shape at once (the reference loops shapes and rescans,
  plan.rs:1069-1199); per-shape dispatch is vectorized inside batches.
- The statement-subject × statement-object join is a hash-partitioned
  `Dataset.join` keyed on statement id (J1).
- Broadcast state (URI mapping, instance sets, clean-value maps,
  best-rank ids) is shipped once per worker process; at 10^12-doc scale
  these flip to `hash_join`s against the state Datasets (see state.py).
- maxCount drops the whole (shape, subject) group — never truncates
  (A2, plan.rs:1141-1158).

Outputs (same logical tables as plan.rs:105-196):
  class, simple-types, full-types, labels, facts, annotated-facts,
  sameAs, schema, shapes — each a Dataset of
  (subject, predicate, object[, annotation_predicate, annotation_object]).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data import Dataset

from . import cleaners as C
from . import graph as G
from . import terms as T
from .joins import distinct_rows, get_broadcast, hash_join
from .schema import PropertyShape, Schema
from .sources import scan_predicate
from .state import BuildState, Stats, build_state

LABEL_PATHS = [T.RDFS_LABEL, T.RDFS_COMMENT, T.SCHEMA_ALTERNATE_NAME]

_TIME_DTS = frozenset(
    {T.XSD_DATE, T.XSD_DATE_TIME, T.XSD_G_YEAR, T.XSD_G_YEAR_MONTH}
)


def _empty_triples() -> Dataset:
    # pandas-blocked so unions with map_batches(pandas) stages stay
    # homogeneous (Ray sorts can't mix Arrow and pandas blocks)
    return ray.data.from_pandas(
        pd.DataFrame({"subject": [], "predicate": [], "object": []}).astype(str)
    )


def _triples_ds(rows: list[tuple[str, str, str]]) -> Dataset:
    if not rows:
        return _empty_triples()
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "subject": [r[0] for r in rows],
                "predicate": [r[1] for r in rows],
                "object": [r[2] for r in rows],
            }
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

def _collect_value_map(ds: Dataset) -> dict[str, tuple[str, str]]:
    df = ds.to_pandas()
    return {
        node: (obj, extras)
        for node, obj, extras in zip(df["value_node"], df["object"], df["extras"])
    }


def build_clean_maps(root: str, uri_mapping: dict[str, str], stats: Stats) -> dict:
    """The five cleaned-value maps (ST4), built concurrently as Dataset
    reductions (reference: 5 cleaner threads, plan.rs:908-1032)."""
    maps = {
        "time": _collect_value_map(C.build_clean_times(root, scan_predicate)),
        "coordinates": _collect_value_map(
            C.build_clean_coordinates(root, scan_predicate)
        ),
        "duration": _collect_value_map(C.build_clean_durations(root, scan_predicate)),
        "integer": _collect_value_map(C.build_clean_integers(root, scan_predicate)),
        "quantity": _collect_value_map(
            C.build_clean_quantities(root, scan_predicate, uri_mapping)
        ),
    }
    for name, m in maps.items():
        stats.set_local("Cleaned complex type", name, len(m))
    return maps


def best_rank_statements(root: str) -> set[str]:
    """Statement ids typed wikibase:BestRank (M16/J6). Broadcast set at
    test scale; at 100 TB this becomes a semi-join against the rdf:type
    partition (same call site, joins.semi_join vs joins.hash_join)."""
    ds = scan_predicate(root, T.RDF_TYPE)
    df = ds.map_batches(
        lambda b: b[b["object"] == T.WIKIBASE_BEST_RANK][["subject"]],
        batch_format="pandas",
    ).to_pandas()
    return set(df["subject"])


# ---------------------------------------------------------------------------
# The combined facts pipeline
# ---------------------------------------------------------------------------

_SEP = "\x00"


def _subject_side(
    root: str,
    configs: list[PropConfig],
    refs: dict,
) -> Dataset:
    """(cfg, statement, subject): p:Pid scan → per-config fan-out →
    best-rank filter → URI-map subject → domain filter
    (plan.rs:1073-1102)."""
    pid_to_cfgs: dict[str, list[str]] = {}
    for cfg in configs:
        for pid in cfg.pids:
            pid_to_cfgs.setdefault(pid, []).append(cfg.cfg_id)
    preds = [T.iri(f"{T.P_PREFIX}{pid}") for pid in pid_to_cfgs]
    ds = scan_predicate(root, preds)

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        uri_map = get_broadcast(refs["uri_mapping"])
        best = get_broadcast(refs["best_rank"])
        instances = get_broadcast(refs["shape_instances"])
        cfg_parent = get_broadcast(refs["cfg_parent"])
        out = {"cfg": [], "statement": [], "subject": []}
        pids = batch["predicate"].map(lambda p: T.pid_of(p))
        subjects = batch["subject"].map(uri_map)
        for pid, subject, statement in zip(pids, subjects, batch["object"]):
            if subject is None or pd.isna(subject) or statement not in best:
                continue
            for cfg_id in pid_to_cfgs.get(pid, ()):
                parent = cfg_parent[cfg_id]
                if parent is None:
                    raise ValueError(f"No parent shape for {cfg_id}")
                if subject not in instances.get(parent, ()):
                    continue
                out["cfg"].append(cfg_id)
                out["statement"].append(statement)
                out["subject"].append(subject)
        return pd.DataFrame(out)

    return ds.map_batches(stage, batch_format="pandas")


def _object_side(
    root: str,
    configs: list[PropConfig],
    refs: dict,
    simple_prefix: str,
    complex_prefix: str,
) -> Dataset:
    """(cfg, statement, object, extras): ps:/psv: scan → per-mode value
    dispatch → pattern filter (plan.rs:1209-1399)."""
    pred_to_cfgs: dict[str, list[PropConfig]] = {}
    for cfg in configs:
        if cfg.mode == "skip":
            continue
        prefix = complex_prefix if cfg.complex_value else simple_prefix
        for pid in cfg.pids:
            pred_to_cfgs.setdefault(T.iri(f"{prefix}{pid}"), []).append(cfg)
    ds = scan_predicate(root, list(pred_to_cfgs))
    cfg_by_id = {c.cfg_id: c for c in configs}
    patterns = {
        c.cfg_id: c.pattern for c in configs if c.pattern is not None
    }

    def dispatch_one(cfg: PropConfig, obj: str, refs_local) -> tuple[str, str] | None:
        mode = cfg.mode
        if mode == "anyuri":
            out = C.validate_any_uri(obj)
            return (out, "") if out else None
        if mode == "image":
            out = C.filter_image(obj)
            return (out, "") if out else None
        if mode == "datatype":
            dt = T.datatype(obj)
            return (obj, "") if dt in cfg.datatypes else None
        if mode == "range":
            uri_map = refs_local["uri_mapping"]
            instances = refs_local["shape_instances"]
            mapped = uri_map.get(obj)
            if mapped is None:
                return None
            for cls in cfg.range_classes:
                if mapped in instances.get(cls, ()):
                    return (mapped, "")
            return None
        # complex modes: clean-map lookup
        clean = refs_local["clean_maps"][
            {"time": "time", "duration": "duration", "integer": "integer",
             "geo": "coordinates", "quantity": "quantity"}[mode]
        ]
        hit = clean.get(obj)
        return hit if hit is not None else None

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        refs_local = {
            "uri_mapping": get_broadcast(refs["uri_mapping"]),
            "shape_instances": get_broadcast(refs["shape_instances"]),
            "clean_maps": get_broadcast(refs["clean_maps"]),
        }
        out = {"cfg": [], "statement": [], "object": [], "extras": []}
        for pred, statement, obj in zip(
            batch["predicate"], batch["subject"], batch["object"]
        ):
            for cfg in pred_to_cfgs.get(pred, ()):
                res = dispatch_one(cfg, obj, refs_local)
                if res is None:
                    continue
                value, extras = res
                pattern = patterns.get(cfg.cfg_id)
                if pattern is not None:
                    # only plain strings can pass a sh:pattern
                    # (plan.rs:1388-1397)
                    if T.datatype(value) != T.XSD_STRING or not re.search(
                        pattern, T.literal_value(value)
                    ):
                        continue
                out["cfg"].append(cfg.cfg_id)
                out["statement"].append(statement)
                out["object"].append(value)
                out["extras"].append(extras)
        return pd.DataFrame(out)

    _ = cfg_by_id
    return ds.map_batches(stage, batch_format="pandas")


def _apply_max_count(joined: Dataset, configs: list[PropConfig]) -> Dataset:
    """Whole-group drop for shapes with sh:maxCount (plan.rs:1141-1158)."""
    max_counts = {c.cfg_id: c.max_count for c in configs if c.max_count is not None}
    if not max_counts:
        return joined
    limits_ref = ray.put(max_counts)

    limited_cfgs = set(max_counts)

    def split_key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["cfg"].isin(limited_cfgs)].copy()
        batch["__grp"] = batch["cfg"] + _SEP + batch["subject"]
        return batch

    def keep_group(group: pd.DataFrame) -> pd.DataFrame:
        limits = get_broadcast(limits_ref)
        limit = limits.get(group["cfg"].iloc[0])
        if limit is not None and len(group) > limit:
            return group.iloc[0:0]
        return group

    without_limit = joined.map_batches(
        lambda b: b[~b["cfg"].isin(limited_cfgs)], batch_format="pandas"
    )
    filtered = (
        joined.map_batches(split_key, batch_format="pandas")
        .groupby("__grp")
        .map_groups(keep_group, batch_format="pandas")
        .drop_columns(["__grp"])
    )
    return without_limit.union(filtered)


def build_facts(
    root: str,
    state: BuildState,
    exclude_paths: list[str] | None = None,
    num_partitions: int | None = None,
) -> tuple[Dataset, Dataset]:
    """The core: (facts, annotated-facts) Datasets
    (plan.rs:896-1202). See module docstring for the dataflow."""
    schema = state.schema
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

    clean_maps = build_clean_maps(root, state.uri_mapping, state.stats)
    refs = {
        "uri_mapping": state.ref("uri_mapping"),
        "shape_instances": state.ref("shape_instances"),
        "best_rank": ray.put(best_rank_statements(root)),
        "clean_maps": ray.put(clean_maps),
        "cfg_parent": ray.put({c.cfg_id: c.parent_class for c in configs}),
    }

    subjects = _subject_side(root, configs, refs)
    objects = _object_side(root, configs, refs, T.PS_PREFIX, T.PSV_PREFIX)

    joined = hash_join(
        subjects,
        objects,
        on=("cfg", "statement"),
        num_partitions=num_partitions,
    )
    joined = _apply_max_count(joined, configs)

    # materialize once: consumed by the facts file, the annotation join
    # and the stats — avoids recomputing the whole pipeline 3×
    joined = joined.materialize()

    cfg_path = {c.cfg_id: c.path for c in configs}
    path_ref = ray.put(cfg_path)

    def to_triples(batch: pd.DataFrame) -> pd.DataFrame:
        paths = get_broadcast(path_ref)
        subjects_out, predicates_out, objects_out = [], [], []
        for cfg, subject, obj, extras in zip(
            batch["cfg"], batch["subject"], batch["object"], batch["extras"]
        ):
            subjects_out.append(subject)
            predicates_out.append(paths[cfg])
            objects_out.append(obj)
            if extras:
                for s, p, o in json.loads(extras):
                    subjects_out.append(s)
                    predicates_out.append(p)
                    objects_out.append(o)
        return pd.DataFrame(
            {"subject": subjects_out, "predicate": predicates_out, "object": objects_out}
        )

    facts = joined.map_batches(to_triples, batch_format="pandas")
    facts = distinct_rows(facts, ["subject", "predicate", "object"])

    # ---- annotations (plan.rs:1034-1064, 1165-1192) ----
    if ann_configs:
        ann_objects = _object_side(root, ann_configs, refs, T.PQ_PREFIX, T.PQV_PREFIX)
        ann_paths = ray.put({c.cfg_id: c.path for c in ann_configs})

        def ann_rows(batch: pd.DataFrame) -> pd.DataFrame:
            paths = get_broadcast(ann_paths)
            batch = batch.copy()
            batch["ann_pred"] = batch["cfg"].map(paths)
            return batch.rename(
                columns={"object": "ann_obj", "extras": "ann_extras"}
            )[["statement", "ann_pred", "ann_obj", "ann_extras"]]

        annotations = ann_objects.map_batches(ann_rows, batch_format="pandas")
        kept = joined.map_batches(
            lambda b: b[["statement", "cfg", "subject", "object"]],
            batch_format="pandas",
        )
        ann_joined = hash_join(
            kept, annotations, on="statement", num_partitions=num_partitions
        )

        def to_annotated(batch: pd.DataFrame) -> pd.DataFrame:
            paths = get_broadcast(path_ref)
            out = {
                "subject": [], "predicate": [], "object": [],
                "annotation_predicate": [], "annotation_object": [],
            }
            for cfg, subject, obj, ann_pred, ann_obj, ann_extras in zip(
                batch["cfg"], batch["subject"], batch["object"],
                batch["ann_pred"], batch["ann_obj"], batch["ann_extras"],
            ):
                out["subject"].append(subject)
                out["predicate"].append(paths[cfg])
                out["object"].append(obj)
                out["annotation_predicate"].append(ann_pred)
                out["annotation_object"].append(ann_obj)
                if ann_extras:
                    for s, p, o in json.loads(ann_extras):
                        out["subject"].append(s)
                        out["predicate"].append(p)
                        out["object"].append(o)
                        out["annotation_predicate"].append("")
                        out["annotation_object"].append("")
            return pd.DataFrame(out)

        annotated = ann_joined.map_batches(to_annotated, batch_format="pandas")
        annotated = distinct_rows(
            annotated,
            ["subject", "predicate", "object", "annotation_predicate", "annotation_object"],
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
# Labels (build_simple_properties_from_schema, plan.rs:818-892)
# ---------------------------------------------------------------------------

def build_labels(root: str, state: BuildState, paths: list[str] | None = None) -> Dataset:
    paths = paths or LABEL_PATHS
    schema = state.schema
    shapes = [s for s in schema.property_shapes() if s.path in paths]
    parts = []
    for shape in shapes:
        if not shape.datatypes:
            raise NotImplementedError("label path without datatypes")
        if shape.nodes:
            continue
        if shape.max_count is not None or shape.pattern is not None:
            raise NotImplementedError(
                "maxCount/pattern on the simple label path (plan.rs:864-881)"
            )
        dts = frozenset(shape.datatypes)
        parent = schema.node_shape(shape.parent_shape).target_class
        ds = scan_predicate(root, list(shape.from_properties))
        refs = {
            "uri_mapping": state.ref("uri_mapping"),
            "shape_instances": state.ref("shape_instances"),
        }
        out_path = shape.path

        def stage(batch: pd.DataFrame, dts=dts, parent=parent, out_path=out_path) -> pd.DataFrame:
            uri_map = get_broadcast(refs["uri_mapping"])
            instances = get_broadcast(refs["shape_instances"]).get(parent, set())
            out = {"subject": [], "predicate": [], "object": []}
            for subject_wd, obj in zip(batch["subject"], batch["object"]):
                if T.datatype(obj) not in dts:
                    continue
                subject = uri_map.get(subject_wd)
                if subject is None or subject not in instances:
                    continue
                out["subject"].append(subject)
                out["predicate"].append(out_path)
                out["object"].append(obj)
            return pd.DataFrame(out)

        parts.append(ds.map_batches(stage, batch_format="pandas"))
    if not parts:
        return _empty_triples()
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    return distinct_rows(ds, ["subject", "predicate", "object"])


# ---------------------------------------------------------------------------
# Types / classes (plan.rs:734-814)
# ---------------------------------------------------------------------------

def build_simple_types(state: BuildState) -> Dataset:
    rows = [
        (instance, T.RDF_TYPE, cls)
        for cls, instances in state.shape_instances.items()
        for instance in instances
    ]
    return _triples_ds(rows)


def build_full_types(root: str, state: BuildState) -> Dataset:
    refs = {
        "uri_mapping": state.ref("uri_mapping"),
        "things": ray.put(state.things()),
        "class_mapping": ray.put(state.wd_to_yago_class_mapping),
    }
    p31 = scan_predicate(root, f"<{T.WDT}P31>")

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        uri_map = get_broadcast(refs["uri_mapping"])
        things = get_broadcast(refs["things"])
        class_map = get_broadcast(refs["class_mapping"])
        out = {"subject": [], "predicate": [], "object": []}
        for wd_instance, wd_class in zip(batch["subject"], batch["object"]):
            instance = uri_map.get(wd_instance)
            if instance is None or instance not in things:
                continue
            for yago_class in class_map.get(wd_class, ()):
                out["subject"].append(instance)
                out["predicate"].append(T.RDF_TYPE)
                out["object"].append(yago_class)
        return pd.DataFrame(out)

    return distinct_rows(
        p31.map_batches(stage, batch_format="pandas"),
        ["subject", "predicate", "object"],
    )


def build_classes_description(root: str, state: BuildState) -> Dataset:
    rows = [(c, T.RDF_TYPE, T.OWL_CLASS) for c in state.yago_classes]
    rows += [
        (sub, T.RDFS_SUB_CLASS_OF, sup)
        for sup, subs in state.yago_super_class_of.items()
        for sub in subs
    ]
    static = _triples_ds(rows)
    refs = {
        "uri_mapping": state.ref("uri_mapping"),
        "classes": ray.put(state.yago_classes),
    }

    def class_labels(batch: pd.DataFrame, predicate: str) -> pd.DataFrame:
        uri_map = get_broadcast(refs["uri_mapping"])
        classes = get_broadcast(refs["classes"])
        out = {"subject": [], "predicate": [], "object": []}
        for subject_wd, obj in zip(batch["subject"], batch["object"]):
            subject = uri_map.get(subject_wd)
            if subject is None or subject not in classes:
                continue
            out["subject"].append(subject)
            out["predicate"].append(predicate)
            out["object"].append(obj)
        return pd.DataFrame(out)

    labels = scan_predicate(root, T.SKOS_PREF_LABEL).map_batches(
        lambda b: class_labels(b, T.RDFS_LABEL), batch_format="pandas"
    )
    comments = scan_predicate(root, T.SCHEMA_DESCRIPTION).map_batches(
        lambda b: class_labels(b, T.RDFS_COMMENT), batch_format="pandas"
    )
    return distinct_rows(
        static.union(labels, comments), ["subject", "predicate", "object"]
    )


# ---------------------------------------------------------------------------
# sameAs (plan.rs:1690-1780)
# ---------------------------------------------------------------------------

def build_same_as(root: str, state: BuildState) -> Dataset:
    things = state.things()
    rows = [
        (yago, T.OWL_SAME_AS, wd)
        for wd, yago in state.uri_mapping.items()
        if yago in things
    ]
    rows += [
        (yago, T.OWL_SAME_AS, T.iri(C.enwiki_to_dbpedia(url)))
        for wd, url in state.enwiki_mapping.items()
        if (yago := state.uri_mapping.get(wd)) is not None and yago in things
    ]
    static = _triples_ds(rows)

    refs = {
        "uri_mapping": state.ref("uri_mapping"),
        "things": ray.put(things),
    }

    def freebase(batch: pd.DataFrame) -> pd.DataFrame:
        uri_map = get_broadcast(refs["uri_mapping"])
        things_b = get_broadcast(refs["things"])
        out = {"subject": [], "predicate": [], "object": []}
        for subject_wd, obj in zip(batch["subject"], batch["object"]):
            yago = uri_map.get(subject_wd)
            if yago is None or yago not in things_b:
                continue
            fb = C.convert_freebase_id(obj)
            if fb is None:
                continue
            out["subject"].append(yago)
            out["predicate"].append(T.OWL_SAME_AS)
            out["object"].append(fb)
        return pd.DataFrame(out)

    freebase_ds = scan_predicate(root, f"<{T.WDT}P646>").map_batches(
        freebase, batch_format="pandas"
    )

    def wikipedia(batch: pd.DataFrame) -> pd.DataFrame:
        uri_map = get_broadcast(refs["uri_mapping"])
        things_b = get_broadcast(refs["things"])
        out = {"subject": [], "predicate": [], "object": []}
        for wp, wd in zip(batch["subject"], batch["object"]):
            if not T.is_iri(wp):
                continue
            url = T.iri_value(wp)
            if ".wikipedia.org/wiki/" not in url:
                continue
            yago = uri_map.get(wd)
            if yago is None or yago not in things_b:
                continue
            out["subject"].append(yago)
            out["predicate"].append(T.SCHEMA_SAME_AS)
            out["object"].append(f'"{url}"^^<{T.XSD_ANY_URI}>')
        return pd.DataFrame(out)

    wikipedia_ds = scan_predicate(root, T.SCHEMA_ABOUT).map_batches(
        wikipedia, batch_format="pandas"
    )
    return distinct_rows(
        static.union(freebase_ds, wikipedia_ds), ["subject", "predicate", "object"]
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

    return _triples_ds(sorted(set(rows)))


def build_yago_shapes(schema: Schema) -> Dataset:
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
    return _triples_ds(sorted(set(rows)))


# ---------------------------------------------------------------------------
# Top-level orchestration (generate_yago, plan.rs:64-203)
# ---------------------------------------------------------------------------

def generate_yago(
    statements_root: str,
    out_dir: str | None = None,
    size: str = "full",
    schema: Schema | None = None,
    state: BuildState | None = None,
    write: bool = True,
) -> dict[str, Dataset]:
    """Run the full build; returns the 9 output Datasets and optionally
    writes deterministic sorted N-Triples partitions + stats.tsv."""
    from .sources import write_ntriples

    if state is None:
        state = build_state(statements_root, schema=schema, size=size)
    facts, annotated = build_facts(statements_root, state)
    outputs = {
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
    if write and out_dir is not None:
        import os

        os.makedirs(out_dir, exist_ok=True)
        names = {
            "class": "yago-wd-class.nt.gz",
            "simple-types": "yago-wd-simple-types.nt.gz",
            "full-types": "yago-wd-full-types.nt.gz",
            "labels": "yago-wd-labels.nt.gz",
            "facts": "yago-wd-facts.nt.gz",
            "annotated-facts": "yago-wd-annotated-facts.ntx.gz",
            "sameAs": "yago-wd-sameAs.nt.gz",
            "schema": "yago-wd-schema.nt.gz",
            "shapes": "yago-wd-shapes.nt.gz",
        }
        for key, ds in outputs.items():
            write_ntriples(ds, os.path.join(out_dir, names[key].replace(".nt.gz", "").replace(".ntx.gz", "")))
        state.stats.write(os.path.join(out_dir, "stats.tsv"))
    return outputs
