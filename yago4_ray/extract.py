"""Triple extraction from interleaved text+media documents (ST6).

The north-star ingest stage the reference does not have: a stateful
actor-pool `map_batches` over the documents Dataset that
- detects entity mentions in text spans,
- links them against the surface-form → QID dictionary (loaded ONCE per
  actor in __init__, never per batch),
- parses property assertions into canonical (subject, predicate, object)
  statement rows,
- turns media spans into image-candidate rows (decode/feature stages
  live in dataops.multimodal),
while passing the `spans` column through untouched (zero-copy Arrow;
the per-row (kind, text, media_ref, order) sequence is the invariant
every stage must preserve — BASELINE.json input_hint).

Span text micro-format produced by yago4_ray.corpus:
    "<subject surface> | <P-id> | <object surface or literal>"
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from . import terms as T
from .schema import Schema

# P-id → literal kind for object parsing; derived from the shape rule
# set on the driver (wdt: truthy objects follow the Wikidata dump
# conventions: times are xsd:dateTime, quantities xsd:decimal).
def pid_value_kinds(schema: Schema) -> dict[str, str]:
    # node shapes that are Wikidata *value* nodes, not entities: their
    # truthy (wdt:) objects are literals in the dump conventions
    value_node_kinds = {
        T.SCHEMA_QUANTITATIVE_VALUE: "decimal",
        T.SCHEMA_GEO_COORDINATES: "string",
    }
    kinds: dict[str, str] = {}
    for shape in schema.property_shapes():
        pids = [p for p in (T.pid_of(fp) for fp in shape.from_properties) if p]
        dts = set(shape.datatypes)
        if shape.nodes and not dts:
            targets = {schema.node_shape(n).target_class for n in shape.nodes}
            if len(targets) == 1 and next(iter(targets)) in value_node_kinds:
                kind = value_node_kinds[next(iter(targets))]
            else:
                kind = "entity"
        elif T.XSD_DATE_TIME in dts:
            kind = "datetime"
        elif T.XSD_ANY_URI in dts:
            kind = "anyuri"
        elif dts & {T.XSD_INTEGER, T.XSD_DURATION}:
            kind = "decimal"
        else:
            kind = "string"
        for pid in pids:
            kinds[pid] = kind
    return kinds


class MentionExtractor:
    """Actor-pool stage: __init__ once per actor (dictionary build),
    __call__ per Arrow batch (vectorized span scan + linking)."""

    def __init__(self, dictionary: pa.Table, value_kinds: dict[str, str]):
        # surface form → qid, first (= highest-priority) registration wins
        self.linker: dict[str, str] = {}
        rows = sorted(
            zip(
                dictionary["surface_form"].to_pylist(),
                dictionary["qid"].to_pylist(),
                dictionary["priority"].to_pylist(),
            ),
            key=lambda r: r[2],
        )
        for surface, qid, _ in rows:
            self.linker.setdefault(surface, qid)
        self.value_kinds = value_kinds

    def _object_term(self, pid: str, text: str) -> str | None:
        kind = self.value_kinds.get(pid, "string")
        if kind == "entity":
            qid = self.linker.get(text)
            return T.wd(qid) if qid else None
        if kind == "datetime":
            try:
                return T.datetime_literal(text)
            except ValueError:
                return None
        if kind == "anyuri":
            return T.typed_literal(text, T.XSD_ANY_URI)
        if kind == "decimal":
            return T.decimal_literal(text)
        return T.string_literal(text)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = {"doc_id": [], "subject": [], "predicate": [], "object": []}
        media = {"doc_id": [], "media_ref": []}
        for doc_id, spans in zip(doc_ids, spans_col):
            for span in spans or ():
                if span["kind"] == "media" and span["media_ref"]:
                    media["doc_id"].append(doc_id)
                    media["media_ref"].append(span["media_ref"])
                    continue
                text = span["text"]
                if "|" not in text:
                    continue
                parts = [p.strip() for p in text.split("|")]
                if len(parts) != 3:
                    continue
                surface, pid, value = parts
                subject_qid = self.linker.get(surface)
                if subject_qid is None:
                    continue
                obj = self._object_term(pid, value)
                if obj is None:
                    continue
                out["doc_id"].append(doc_id)
                out["subject"].append(T.wd(subject_qid))
                out["predicate"].append(T.iri(f"{T.WDT}{pid}"))
                out["object"].append(obj)
        # media candidates ride along in the same output table with an
        # empty predicate marker; split downstream with a cheap filter
        n_media = len(media["doc_id"])
        out["doc_id"].extend(media["doc_id"])
        out["subject"].extend([""] * n_media)
        out["predicate"].extend([""] * n_media)
        out["object"].extend(media["media_ref"])
        return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})


def extract_statements(
    documents: Dataset,
    dictionary: pa.Table,
    schema: Schema | None = None,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 1024,
) -> tuple[Dataset, Dataset]:
    """documents → (statement rows, media-candidate rows).

    The extractor is an actor pool (`concurrency=N`): the dictionary is
    built once per actor. Returns two Datasets sharing one upstream pass.
    """
    schema = schema or Schema.open()
    kinds = pid_value_kinds(schema)
    extracted = documents.map_batches(
        MentionExtractor,
        fn_constructor_args=(dictionary, kinds),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    statements = extracted.map_batches(
        lambda t: t.filter(pc.not_equal(t["predicate"], "")).select(
            ["doc_id", "subject", "predicate", "object"]
        ),
        batch_format="pyarrow",
    )
    media = extracted.map_batches(
        lambda t: t.filter(pc.equal(t["predicate"], "")).select(
            ["doc_id", "object"]
        ).rename_columns(["doc_id", "media_ref"]),
        batch_format="pyarrow",
    )
    return statements, media


def check_span_invariant(before: Dataset, after: Dataset) -> bool:
    """Verify per-doc span-sequence equality (kind, text, media_ref,
    order) across a stage boundary, via stable per-row signatures."""
    from .sources import span_signature_batch

    sig_a = before.map_batches(span_signature_batch, batch_format="pyarrow").to_pandas()
    sig_b = after.map_batches(span_signature_batch, batch_format="pyarrow").to_pandas()
    a = dict(zip(sig_a["doc_id"], sig_a["span_sig"]))
    b = dict(zip(sig_b["doc_id"], sig_b["span_sig"]))
    return a == b
