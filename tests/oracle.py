"""Straight-line pure-Python oracle for the YAGO build semantics.

An independent dict/set implementation of the reference plan
(plan.rs:64-203 and callees), written directly from SURVEY.md §3.2 —
NOT via the Ray pipeline under test. The e2e golden test runs the Ray
build and this oracle on the same synthetic statement table and
compares emitted triple sets per output file (FIXTURES.md F4).

Shares only the leaf scalar kernels with the engine (terms, graph
closures, cleaners' scalar converters) — each of those has its own
hand-written unit vectors; the *dataflow* here is fully independent.
"""

from __future__ import annotations

import re
from collections import defaultdict
from urllib.parse import unquote

from yago4_ray import cleaners as C
from yago4_ray import graph as G
from yago4_ray import terms as T
from yago4_ray.schema import Schema

ENWIKI = "https://en.wikipedia.org/wiki/"
LABEL_PATHS = [T.RDFS_LABEL, T.RDFS_COMMENT, T.SCHEMA_ALTERNATE_NAME]
TIME_DTS = sorted([T.XSD_DATE, T.XSD_DATE_TIME, T.XSD_G_YEAR, T.XSD_G_YEAR_MONTH])


class Store:
    """Predicate-indexed view of the statement list (the oracle's
    'RocksDB')."""

    def __init__(self, triples):
        self.by_pred: dict[str, list[tuple[str, str]]] = defaultdict(list)
        self.spo: dict[tuple[str, str], list[str]] = defaultdict(list)
        self.all = set()
        for s, p, o in triples:
            if (s, p, o) in self.all:
                continue
            self.all.add((s, p, o))
            self.by_pred[p].append((s, o))
            self.spo[(s, p)].append(o)

    def pairs(self, pred: str) -> list[tuple[str, str]]:
        return self.by_pred.get(pred, [])

    def objects(self, s: str, p: str) -> list[str]:
        return self.spo.get((s, p), [])

    def object(self, s: str, p: str) -> str | None:
        objs = self.objects(s, p)
        return objs[0] if objs else None

    def contains(self, s: str, p: str, o: str) -> bool:
        return (s, p, o) in self.all


def oracle_build(triples, schema: Schema | None = None, size: str = "full"):
    schema = schema or Schema.open()
    store = Store(triples)
    out: dict[str, set] = {k: set() for k in (
        "class", "simple-types", "full-types", "labels", "facts",
        "annotated-facts", "sameAs")}

    # ---- enwiki mapping ----
    enwiki = {}
    for wp, wd in store.pairs(T.SCHEMA_ABOUT):
        if T.is_iri(wp) and T.iri_value(wp).startswith(ENWIKI):
            enwiki[wd] = T.iri_value(wp)

    # ---- items to keep ----
    items = {s for s, o in store.pairs(T.RDF_TYPE) if o == T.WIKIBASE_ITEM}
    if size == "all-wikipedias":
        items = {
            wd for wp, wd in store.pairs(T.SCHEMA_ABOUT)
            if T.is_iri(wp) and ".wikipedia.org/wiki/" in T.iri_value(wp)
        }
    elif size == "en-wikipedia":
        items = set(enwiki)
    items |= set(T.MANDATORY_WD_ITEMS)

    # ---- URI mapping: 4-source priority merge ----
    from_schema = {}
    for shape in schema.node_shapes():
        for fc in shape.from_classes:
            from_schema[fc] = shape.target_class
    from_wikipedia = {}
    for wd, url in enwiki.items():
        if wd in items and wd not in from_schema:
            title = unquote(url[len(ENWIKI):])
            from_wikipedia[wd] = T.iri(
                T.YAGO_RESOURCE_PREFIX + T.encode_iri_path(title)
            )
    from_label = {}
    for s, o in store.pairs(T.SKOS_PREF_LABEL):
        value, lang, _ = (
            T.parse_literal(o) if o.startswith('"') else (None, None, None)
        )
        if lang != "en":
            continue
        if s not in items or s in from_schema or s in from_wikipedia:
            continue
        qid = T.qid_of(s)
        if qid is None:
            continue
        from_label.setdefault(
            s, T.iri(f"{T.YAGO_RESOURCE_PREFIX}{T.encode_iri_path(value)}_{qid}")
        )
    fallback = {}
    for s in items:
        if s in from_schema or s in from_wikipedia or s in from_label:
            continue
        qid = T.qid_of(s)
        if qid is not None:
            fallback[s] = T.iri(f"{T.YAGO_RESOURCE_PREFIX}_{qid}")
    uri_mapping = {**from_schema, **from_wikipedia, **from_label, **fallback}

    # ---- class machinery ----
    from_classes = [fc for s in schema.node_shapes() for fc in s.from_classes]
    sub_class_of = G.edge_map(
        (s, o) for s, o in store.pairs(f"<{T.WDT}P279>") if s not in from_classes
    )
    super_class_of = G.invert(sub_class_of)
    instances_by_class = G.edge_map(
        (o, s) for s, o in store.pairs(f"<{T.WDT}P31>")
    )
    bad = G.transitive_closure(T.WD_BAD_CLASSES, super_class_of)
    mapped_sub = G.transitive_closure(from_classes, super_class_of)
    disjoint_sub: set[str] = set()
    for cls in schema.classes():
        s1 = schema.node_shape(cls.id)
        for other in cls.disjoint_classes:
            s2 = schema.node_shape(other)
            for w1 in s1.from_classes:
                for w2 in s2.from_classes:
                    disjoint_sub |= G.transitive_closure(
                        [w1], super_class_of
                    ) & G.transitive_closure([w2], super_class_of)
    min10 = {
        c for c, inst in instances_by_class.items()
        if len(set(inst)) >= T.MIN_NUMBER_OF_INSTANCES
    }
    keep = {
        c for c in mapped_sub & min10 if c not in bad and c not in disjoint_sub
    } | set(from_classes)
    keep_yago = {c for c in keep if c in enwiki} | set(from_classes)

    closure_pairs = G.transitive_closure_pairs(
        ((s, o) for s, vs in sub_class_of.items() if s in keep_yago for o in vs),
        sub_class_of,
    )
    yago_sub_pairs = [
        (uri_mapping[k], uri_mapping[v])
        for k, vs in closure_pairs.items()
        for v in vs
        if v in from_classes and k in uri_mapping and v in uri_mapping
    ]
    for shape in schema.node_shapes():
        cls = schema.rdfs_class(shape.target_class)
        if cls is None:
            continue
        for sc in cls.super_classes:
            if sc in (T.SCHEMA_INTANGIBLE, T.SCHEMA_MEDICAL_INTANGIBLE):
                yago_sub_pairs.append((cls.id, T.SCHEMA_THING))
            elif sc in (T.SCHEMA_STRUCTURED_VALUE, T.SCHEMA_SERIES):
                pass
            else:
                yago_sub_pairs.append((cls.id, sc))
    yago_sub = G.edge_map(yago_sub_pairs)
    yago_super = G.filter_redundant_parents(G.invert(yago_sub), yago_sub)

    lifted = G.transitive_closure_pairs(
        ((c, c) for c in keep - keep_yago), sub_class_of
    )
    mapping_pairs = [(c, c) for c in keep_yago] + [
        (k, v) for k, vs in lifted.items() for v in vs if v in from_classes
    ]
    class_mapping = G.filter_redundant_parents(
        G.edge_map(
            (k, uri_mapping[v]) for k, v in mapping_pairs if v in uri_mapping
        ),
        yago_super,
    )
    yago_classes = {uri_mapping[c] for c in keep_yago if c in uri_mapping}

    # ---- shape instances ----
    inst_for_yago_class = defaultdict(set)
    for s, o in store.pairs(f"<{T.WDT}P31>"):
        for yc in class_mapping.get(o, ()):
            inst_for_yago_class[yc].add(s)
    shape_instances: dict[str, set[str]] = {}
    for shape in schema.node_shapes():
        classes = G.transitive_closure([shape.target_class], yago_super)
        wd_instances = set()
        for yc in classes:
            wd_instances |= inst_for_yago_class.get(yc, set())
        shape_instances[shape.target_class] = {
            uri_mapping[w]
            for w in wd_instances
            if w in uri_mapping and uri_mapping[w] not in yago_classes
        }
    in_disjoint = set()
    for cls in schema.classes():
        for other in cls.disjoint_classes:
            in_disjoint |= shape_instances.get(cls.id, set()) & shape_instances.get(
                other, set()
            )
    for target in shape_instances:
        shape_instances[target] -= in_disjoint
    things = shape_instances.get(T.SCHEMA_THING, set())

    # ---- clean maps ----
    clean_times = {}
    for node, value in store.pairs(T.WIKIBASE_TIME_VALUE):
        precision = store.object(node, T.WIKIBASE_TIME_PRECISION)
        calendar = store.object(node, T.WIKIBASE_TIME_CALENDAR_MODEL)
        if precision is None or calendar is None:
            continue
        cleaned = C.convert_time(value, precision, calendar)
        if cleaned is not None:
            clean_times[node] = (cleaned, [])
    clean_coords = {}
    for node, lat in store.pairs(T.WIKIBASE_GEO_LATITUDE):
        lon = store.object(node, T.WIKIBASE_GEO_LONGITUDE)
        prec = store.object(node, T.WIKIBASE_GEO_PRECISION)
        globe = store.object(node, T.WIKIBASE_GEO_GLOBE)
        if None in (lon, prec, globe):
            continue
        res = C.convert_globe_coordinates(lat, lon, prec, globe)
        if res is not None:
            clean_coords[node] = res
    clean_durations = {}
    clean_integers = {}
    clean_quantities = {}
    for node, amount in store.pairs(T.WIKIBASE_QUANTITY_AMOUNT):
        unit = store.object(node, T.WIKIBASE_QUANTITY_UNIT)
        if unit is None:
            continue
        dur = C.convert_duration_quantity(amount, unit)
        if dur is not None:
            clean_durations[node] = (dur, [])
        integer = C.convert_integer_quantity(amount, unit)
        if integer is not None:
            clean_integers[node] = (integer, [])
        lower = store.object(node, T.WIKIBASE_QUANTITY_LOWER_BOUND)
        upper = store.object(node, T.WIKIBASE_QUANTITY_UPPER_BOUND)
        unit_yago = uri_mapping.get(unit)
        if lower is not None and upper is not None and unit_yago is not None:
            res = C.convert_quantity(node, unit_yago, amount, lower, upper)
            if res is not None:
                clean_quantities[node] = res

    # ---- per-shape fact extraction ----
    def value_rows(shape, simple_prefix, complex_prefix):
        """(statement, object, extras) for one property shape."""
        dts = sorted(shape.datatypes)
        rows = []
        pids = [T.pid_of(p) for p in shape.from_properties]
        pids = [p for p in pids if p]

        def scan(prefix):
            for pid in pids:
                yield from store.pairs(T.iri(f"{prefix}{pid}"))

        if shape.datatypes and shape.nodes:
            return []
        if dts == [T.XSD_ANY_URI]:
            for st, obj in scan(simple_prefix):
                v = C.validate_any_uri(obj)
                if v is not None:
                    rows.append((st, v, []))
        elif dts == TIME_DTS:
            for st, obj in scan(complex_prefix):
                if obj in clean_times:
                    rows.append((st, *clean_times[obj]))
        elif dts == [T.XSD_DURATION]:
            for st, obj in scan(complex_prefix):
                if obj in clean_durations:
                    rows.append((st, *clean_durations[obj]))
        elif dts == [T.XSD_INTEGER]:
            for st, obj in scan(complex_prefix):
                if obj in clean_integers:
                    rows.append((st, *clean_integers[obj]))
        elif dts:
            for st, obj in scan(simple_prefix):
                if T.datatype(obj) in shape.datatypes:
                    rows.append((st, obj, []))
        elif shape.nodes:
            expected = [schema.node_shape(n).target_class for n in shape.nodes]
            if expected == [T.SCHEMA_GEO_COORDINATES]:
                for st, obj in scan(complex_prefix):
                    if obj in clean_coords:
                        rows.append((st, *clean_coords[obj]))
            elif expected == [T.SCHEMA_QUANTITATIVE_VALUE]:
                for st, obj in scan(complex_prefix):
                    if obj in clean_quantities:
                        rows.append((st, *clean_quantities[obj]))
            elif expected == [T.SCHEMA_IMAGE_OBJECT]:
                for st, obj in scan(simple_prefix):
                    if C.filter_image(obj) is not None:
                        rows.append((st, obj, []))
            else:
                for st, obj in scan(simple_prefix):
                    mapped = uri_mapping.get(obj)
                    if mapped is None:
                        continue
                    if any(
                        mapped in shape_instances.get(c, set()) for c in expected
                    ):
                        rows.append((st, mapped, []))
        else:
            return []
        if shape.pattern is not None:
            rx = re.compile(shape.pattern)
            rows = [
                r for r in rows
                if T.datatype(r[1]) == T.XSD_STRING
                and rx.search(T.literal_value(r[1]))
            ]
        return rows

    # annotations over all statements
    annotations_by_statement = defaultdict(list)
    for ann in schema.annotation_property_shapes():
        for st, obj, extras in value_rows(ann, T.PQ_PREFIX, T.PQV_PREFIX):
            annotations_by_statement[st].append((ann.path, obj, extras))

    for shape in schema.property_shapes():
        if shape.path in LABEL_PATHS:
            continue
        pids = [p for p in (T.pid_of(fp) for fp in shape.from_properties) if p]
        if not pids:
            continue
        # subject side
        subject_statement = []
        for pid in pids:
            for wd_subj, st in store.pairs(T.iri(f"{T.P_PREFIX}{pid}")):
                if wd_subj not in uri_mapping:
                    continue
                if not store.contains(st, T.RDF_TYPE, T.WIKIBASE_BEST_RANK):
                    continue
                subject_statement.append((uri_mapping[wd_subj], st))
        parent = shape.parent_shape
        if parent is None:
            raise AssertionError(f"no parent shape for {shape.path}")
        allowed = shape_instances[schema.node_shape(parent).target_class]
        statement_subject = {
            st: subj for subj, st in subject_statement if subj in allowed
        }
        # object side + join
        kept = []  # (statement, triples)
        for st, obj, extras in value_rows(shape, T.PS_PREFIX, T.PSV_PREFIX):
            subj = statement_subject.get(st)
            if subj is None:
                continue
            kept.append((st, list(extras) + [(subj, shape.path, obj)]))
        # maxCount: drop whole subject groups over the limit
        if shape.max_count is not None:
            by_subject = defaultdict(list)
            for st, trips in kept:
                by_subject[trips[-1][0]].append((st, trips))
            kept = [
                item
                for group in by_subject.values()
                if len(group) <= shape.max_count
                for item in group
            ]
        for st, trips in kept:
            for tr in trips:
                out["facts"].add(tr)
            main = trips[-1]
            for ann_pred, ann_obj, ann_extras in annotations_by_statement.get(
                st, ()
            ):
                out["annotated-facts"].add((*main, ann_pred, ann_obj))
                for s, p, o in ann_extras:
                    out["annotated-facts"].add((s, p, o, "", ""))

    # ---- labels ----
    for shape in schema.property_shapes():
        if shape.path not in LABEL_PATHS:
            continue
        if not shape.datatypes or shape.nodes:
            continue
        allowed = shape_instances[
            schema.node_shape(shape.parent_shape).target_class
        ]
        for fp in shape.from_properties:
            for wd_subj, obj in store.pairs(fp):
                if T.datatype(obj) not in shape.datatypes:
                    continue
                subj = uri_mapping.get(wd_subj)
                if subj is None or subj not in allowed:
                    continue
                out["labels"].add((subj, shape.path, obj))

    # ---- types ----
    for target, instances in shape_instances.items():
        for inst in instances:
            out["simple-types"].add((inst, T.RDF_TYPE, target))
    for wd_inst, wd_class in store.pairs(f"<{T.WDT}P31>"):
        inst = uri_mapping.get(wd_inst)
        if inst is None or inst not in things:
            continue
        for yc in class_mapping.get(wd_class, ()):
            out["full-types"].add((inst, T.RDF_TYPE, yc))

    # ---- class descriptions ----
    for c in yago_classes:
        out["class"].add((c, T.RDF_TYPE, T.OWL_CLASS))
    for sup, subs in yago_super.items():
        for sub in subs:
            out["class"].add((sub, T.RDFS_SUB_CLASS_OF, sup))
    for s, o in store.pairs(T.SKOS_PREF_LABEL):
        c = uri_mapping.get(s)
        if c in yago_classes:
            out["class"].add((c, T.RDFS_LABEL, o))
    for s, o in store.pairs(T.SCHEMA_DESCRIPTION):
        c = uri_mapping.get(s)
        if c in yago_classes:
            out["class"].add((c, T.RDFS_COMMENT, o))

    # ---- sameAs ----
    for wd, yago in uri_mapping.items():
        if yago in things:
            out["sameAs"].add((yago, T.OWL_SAME_AS, wd))
    for wd, url in enwiki.items():
        yago = uri_mapping.get(wd)
        if yago is not None and yago in things:
            out["sameAs"].add(
                (yago, T.OWL_SAME_AS,
                 T.iri(url.replace(ENWIKI, "http://dbpedia.org/resource/")))
            )
    for s, o in store.pairs(f"<{T.WDT}P646>"):
        yago = uri_mapping.get(s)
        if yago is None or yago not in things:
            continue
        fb = C.convert_freebase_id(o)
        if fb is not None:
            out["sameAs"].add((yago, T.OWL_SAME_AS, fb))
    for wp, wd in store.pairs(T.SCHEMA_ABOUT):
        if not T.is_iri(wp):
            continue
        url = T.iri_value(wp)
        if ".wikipedia.org/wiki/" not in url:
            continue
        yago = uri_mapping.get(wd)
        if yago is not None and yago in things:
            out["sameAs"].add(
                (yago, T.SCHEMA_SAME_AS, f'"{url}"^^<{T.XSD_ANY_URI}>')
            )

    return out
