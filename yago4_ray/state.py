"""Build-state construction: the shared read-only state of a build.

Mirrors the reference's driver prep (plan.rs:64-101): the
Wikidata→enwiki mapping (ST5), the Wikidata→YAGO URI mapping (ST2, the
4-source priority merge of plan.rs:227-382), the class machinery
(plan.rs:401-638) and the per-shape instance sets (plan.rs:641-731).

Ray-native split of labor:
- *Instance-scale* relations (rdf:type items, sitelinks, labels, P31)
  are scanned and reduced with Dataset ops — the URI-mapping priority
  merge is ONE `groupby(qid)` instead of three anti-joins (SURVEY J7),
  and shape-instance construction + disjoint-instance removal is ONE
  `groupby(instance)` (SURVEY G5).
- *Class-graph-scale* data (P279 edges, per-class instance counts) is
  collected to the driver and closed with plain Python (SURVEY G1-G4):
  even full Wikidata's class graph is a few M edges.

The resulting state is small relative to the fact volume and is
broadcast to fact-pipeline workers (`ray.put` once, cached per worker
process). At 10^12-doc scale the uri_mapping/instance sets outgrow a
single broadcast object; the same call sites then switch to
`joins.hash_join` against the Datasets kept in `self.datasets` —
both representations are produced here.
"""

from __future__ import annotations

import sys
import threading
import types
from collections import defaultdict
from dataclasses import dataclass, field
from urllib.parse import unquote

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

# fsspec's http module needs aiohttp (absent here). Ray re-imports it on
# every path resolution and catches the ModuleNotFoundError — but when
# several Dataset executions start from threads, the CONCURRENT first
# import surfaces as a partially-initialized-module ImportError instead
# and escapes Ray's except clause. Pre-installing a minimal stub makes
# the import race-free (there is no network in this sandbox anyway).
try:  # pragma: no cover - depends on environment
    import fsspec.implementations.http  # noqa: F401
except ImportError:
    _http_stub = types.ModuleType("fsspec.implementations.http")
    _http_stub.HTTPFileSystem = type("HTTPFileSystem", (), {})
    sys.modules.setdefault("fsspec.implementations.http", _http_stub)

from . import graph as G
from . import terms as T
from .broadcast import _hash_series
from .joins import get_broadcast
from .schema import Schema
from .sources import scan_predicate

ENWIKI_PREFIX = "https://en.wikipedia.org/wiki/"


class Stats:
    """Build counters, written as stats.tsv (plan.rs:2361-2409)."""

    def __init__(self):
        self._data: dict[str, dict[str, int]] = defaultdict(dict)
        # key → zero-arg callable returning {entry: value}, resolved at
        # write() — lets counters produced by still-running remote tasks
        # (shape-instance pack) register without blocking the build
        self._lazy: dict[str, object] = {}

    def set_global(self, key: str, value: int):
        self.set_local(key, "*", value)

    def set_local(self, key: str, entry: str, value: int):
        self._data[key].setdefault(str(entry), int(value))

    def set_lazy(self, key: str, fn):
        self._lazy[key] = fn

    def add_local(self, key: str, entry: str, value: int):
        entry = str(entry)
        self._data[key][entry] = self._data[key].get(entry, 0) + int(value)

    def write(self, path: str):
        for key, fn in list(self._lazy.items()):
            try:
                for entry, value in fn().items():
                    self.set_local(key, entry, value)
            except Exception as exc:  # a lost/failed remote counter task
                # must not discard stats.tsv and every EAGER counter at
                # the very last step of an otherwise-successful build
                print(
                    f"[stats] lazy counter {key!r} failed: {exc}",
                    flush=True,
                )
        self._lazy.clear()
        with open(path, "w") as f:
            for key in sorted(self._data):
                values = self._data[key]
                if len(values) > 1 and "*" not in values:
                    f.write(f"{key}\t*\t{sum(values.values())}\n")
                for entry in sorted(values):
                    f.write(f"{key}\t{entry}\t{values[entry]}\n")


# module-level (not a BuildState field): a Lock can't be pickled, and
# the contention is a handful of cache fills per build
_REFS_LOCK = threading.Lock()


@dataclass
class BuildState:
    schema: Schema
    stats: Stats
    # wd term → enwiki URL: dict or HashedMap (same get/in/len protocol)
    enwiki_mapping: "dict[str, str] | object"
    # wd term → yago term: a dict, or a broadcast-ready HashedMap built
    # straight from the Arrow merge output (same get/in/[]/len protocol)
    uri_mapping: "dict[str, str] | object"
    yago_classes: set[str]
    wd_to_yago_class_mapping: dict[str, list[str]]
    yago_super_class_of: dict[str, list[str]]
    # target class term → packed instance membership (HashedSet —
    # 64-bit hashes collected from the cluster; instance strings never
    # transit the driver, see build_shape_instances)
    shape_instances: dict
    # distributed=True → the fact pipelines consume `datasets` via hash
    # joins (build_dist) instead of the packed broadcasts below; chosen
    # by build_state from state size / YAGO4_RAY_DISTRIBUTED_STATE=1
    distributed: bool = False
    datasets: dict[str, Dataset] = field(default_factory=dict)
    # futures for broadcast-state built EARLY (kicked off by build_state
    # the moment the URI merge resolves, overlapping shape-instance
    # resolution): {"clean_maps": Future[dict], "best_rank": Future[HashedSet]}
    prewarmed: dict = field(default_factory=dict)

    # broadcast refs, created lazily
    _refs: dict[str, "ray.ObjectRef"] = field(default_factory=dict)

    def ref(self, name: str) -> "ray.ObjectRef":
        with _REFS_LOCK:
            if name not in self._refs:
                obj = getattr(self, name)
                self._refs[name] = ray.put(obj)
            return self._refs[name]

    def packed_ref(self, name: str) -> "ray.ObjectRef":
        """Zero-copy broadcast forms (yago4_ray.broadcast): numpy/Arrow
        buffers instead of pickled dicts — workers pay ~nothing to
        ray.get them, which is what makes wide fan-out scale.

        Cache fills are locked: build.py threads stage pipelines
        concurrently, and an unguarded double-fill would ray.put a
        duplicate copy of the largest broadcast object (the URI map)."""
        key = f"packed:{name}"
        with _REFS_LOCK:
            if key not in self._refs:
                from .broadcast import HashedMap, HashedSet

                if name == "uri_mapping":
                    obj = (
                        self.uri_mapping
                        if isinstance(self.uri_mapping, HashedMap)
                        else HashedMap(self.uri_mapping)
                    )
                elif name == "shape_instances":
                    if isinstance(self.shape_instances, LazyShapePacks):
                        # packed remotely: the task's own output ref IS
                        # the broadcast — no driver fetch or re-put
                        self._refs[key] = self.shape_instances.packs_ref
                        return self._refs[key]
                    obj = self.shape_instances  # already packed HashedSets
                elif name == "things":
                    if isinstance(self.shape_instances, LazyShapePacks):
                        self._refs[key] = _extract_pack.remote(
                            self.shape_instances.packs_ref, T.SCHEMA_THING
                        )
                        return self._refs[key]
                    obj = self.things()
                else:
                    raise KeyError(name)
                self._refs[key] = ray.put(obj)
            return self._refs[key]

    def things(self):
        from .broadcast import HashedSet

        return self.shape_instances.get(
            T.SCHEMA_THING, HashedSet([])
        )


# ---------------------------------------------------------------------------
# ST5: Wikidata → English Wikipedia
# ---------------------------------------------------------------------------

def _enwiki_pairs(batch: pd.DataFrame) -> pd.DataFrame:
    """(item, url, h) rows for en.wikipedia sitelinks in a schema:about
    batch (the shared kernel of build_enwiki_mapping and the fused
    single-scan reduction)."""
    urls = batch["subject"].str.slice(1, -1)
    mask = urls.str.startswith(ENWIKI_PREFIX) & batch["subject"].str.startswith("<")
    out = batch[mask]
    return pd.DataFrame(
        {
            "item": out["object"],
            "url": urls[mask],
            "h": _hash_series(out["object"]),
        }
    )


def build_enwiki_mapping(root: str) -> tuple["HashedMap", Dataset]:
    """schema:about sitelinks restricted to en.wikipedia (plan.rs:206-223).
    Returns (driver HashedMap, (item, url) Dataset) — the Dataset is the
    distributed-state join side. The driver map is built from Arrow
    blocks + worker-computed key hashes (get/in/len protocol); its only
    driver consumers are class-scale membership probes, so the 2.4 M
    item/url strings never materialize as Python objects."""
    from .broadcast import HashedMap

    ds = scan_predicate(root, T.SCHEMA_ABOUT)

    pairs_ds = ds.map_batches(_enwiki_pairs, batch_format="pandas").materialize()
    tbl = pa.concat_tables(
        ray.get(pairs_ds.to_arrow_refs()), promote_options="permissive"
    )
    mapping = HashedMap.from_arrow(tbl["item"], tbl["url"], hashes=tbl["h"])
    return mapping, pairs_ds.select_columns(["item", "url"])


# ---------------------------------------------------------------------------
# ST2: Wikidata → YAGO URI mapping (priority merge as ONE groupby)
# ---------------------------------------------------------------------------

def _wiki_candidates(batch: pd.DataFrame) -> pd.DataFrame:
    """Priority-1 URI candidates from a schema:about batch: the enwiki
    title becomes the YAGO IRI (plan.rs:300-320). Vectorized fast path:
    titles that are pure ipchar with no percent-escapes skip the
    decode/encode round trip entirely."""
    urls = batch["subject"].str.slice(1, -1)
    mask = urls.str.startswith(ENWIKI_PREFIX)
    items_col = batch.loc[mask, "object"]
    titles = urls[mask].str.slice(len(ENWIKI_PREFIX))
    simple = (~titles.str.contains("%", regex=False)) & titles.str.match(
        T.IPCHAR_OR_SPACE_RE
    )
    fast = "<" + T.YAGO_RESOURCE_PREFIX + titles.str.replace(" ", "_") + ">"
    uris = fast.where(
        simple,
        titles.map(
            lambda t: T.iri(
                T.YAGO_RESOURCE_PREFIX + T.encode_iri_path(unquote(t))
            )
        ),
    )
    return pd.DataFrame(
        {
            "item": items_col,
            "priority": 1,
            "uri": uris,
            "h": _hash_series(items_col),
        }
    )


def _label_candidates(batch: pd.DataFrame) -> pd.DataFrame:
    """Priority-2 URI candidates from a skos:prefLabel batch: English
    label + _Q{id} (plan.rs:322-341); vectorized qid extract + encode
    fast path."""
    mask = batch["object"].str.endswith('"@en')
    sub = batch[mask]
    qids = sub["subject"].str.extract(
        r"^<http://www\.wikidata\.org/entity/(Q[0-9]+)>$", expand=False
    )
    keep = qids.notna()
    sub = sub[keep]
    qids = qids[keep]
    values = sub["object"].str.slice(1, -4)  # strip quotes + @en
    simple = (~values.str.contains("\\", regex=False)) & values.str.match(
        T.IPCHAR_OR_SPACE_RE
    )
    encoded = values.str.replace(" ", "_").where(
        simple,
        values.map(
            lambda v: T.encode_iri_path(T.literal_value(f'"{v}"'))
        ),
    )
    uris = "<" + T.YAGO_RESOURCE_PREFIX + encoded + "_" + qids + ">"
    return pd.DataFrame(
        {
            "item": sub["subject"],
            "priority": 2,
            "uri": uris,
            "h": _hash_series(sub["subject"]),
        }
    )


def _slow_encode_scatter(values, simple_mask, fast, encode_one):
    """Combine the vectorized fast-path results with the per-row slow
    path: rows failing `simple_mask` (rare — labels/titles with
    percent-escapes or non-ipchar bytes) run `encode_one` in Python and
    scatter into the fast array. Returns a numpy object array."""
    out = np.asarray(fast, dtype=object)
    idx = np.nonzero(~np.asarray(simple_mask, dtype=bool))[0]
    if len(idx):
        vals = np.asarray(values, dtype=object)[idx]
        out[idx] = [encode_one(v) for v in vals]
    return out


def _wiki_candidates_arrow(tbl: "pa.Table") -> pd.DataFrame:
    """Arrow/RE2 form of `_wiki_candidates` (byte-identical output,
    parity-gated by tests/test_properties): ONE extract_regex pass
    replaces the slice/startswith/slice pandas chain — the pandas
    kernel's 7 object-array passes were 2/3 of the fused state scan's
    wall (PERF_NOTES #49)."""
    import re as _re

    import pyarrow.compute as pc

    ex = pc.extract_regex(
        tbl.column("subject"),
        f"^<{_re.escape(ENWIKI_PREFIX)}(?P<t>(?s:.*))>$",
    )
    keep = pc.is_valid(ex)
    sel = tbl.filter(keep)
    titles = pc.struct_field(ex.filter(keep), "t")
    simple = pc.and_(
        pc.invert(pc.match_substring(titles, "%")),
        pc.match_substring_regex(titles, T.IPCHAR_OR_SPACE_RE.pattern),
    )
    fast = pc.binary_join_element_wise(
        pa.scalar("<" + T.YAGO_RESOURCE_PREFIX),
        pc.replace_substring(titles, " ", "_"),
        pa.scalar(">"),
        "",
    )
    uris = _slow_encode_scatter(
        titles.to_pandas().to_numpy(),
        simple.to_numpy(zero_copy_only=False),
        fast.to_pandas().to_numpy(),
        lambda t: T.iri(T.YAGO_RESOURCE_PREFIX + T.encode_iri_path(unquote(t))),
    )
    items = sel.column("object").to_pandas()
    return pd.DataFrame(
        {"item": items, "priority": 1, "uri": uris, "h": _hash_series(items)}
    )


def _enwiki_pairs_arrow(tbl: "pa.Table") -> pd.DataFrame:
    """Arrow/RE2 form of `_enwiki_pairs` (byte-identical, parity-gated)."""
    import re as _re

    import pyarrow.compute as pc

    ex = pc.extract_regex(
        tbl.column("subject"),
        f"^<(?P<u>{_re.escape(ENWIKI_PREFIX)}(?s:.*))>$",
    )
    keep = pc.is_valid(ex)
    items = tbl.filter(keep).column("object").to_pandas()
    urls = pc.struct_field(ex.filter(keep), "u").to_pandas()
    return pd.DataFrame({"item": items, "url": urls, "h": _hash_series(items)})


def _label_candidates_arrow(tbl: "pa.Table") -> pd.DataFrame:
    """Arrow/RE2 form of `_label_candidates` (byte-identical,
    parity-gated): two extract_regex passes replace the pandas
    endswith/extract/slice/contains/match/replace chain."""
    import pyarrow.compute as pc

    qx = pc.extract_regex(
        tbl.column("subject"),
        r"^<http://www\.wikidata\.org/entity/(?P<q>Q[0-9]+)>$",
    )
    vx = pc.extract_regex(tbl.column("object"), '(?s)^"(?P<v>.*)"@en$')
    keep = pc.and_(pc.is_valid(qx), pc.is_valid(vx))
    sub = tbl.filter(keep)
    qids = pc.struct_field(qx.filter(keep), "q")
    values = pc.struct_field(vx.filter(keep), "v")
    simple = pc.and_(
        pc.invert(pc.match_substring(values, "\\")),
        pc.match_substring_regex(values, T.IPCHAR_OR_SPACE_RE.pattern),
    )
    fast = pc.replace_substring(values, " ", "_")
    encoded = _slow_encode_scatter(
        values.to_pandas().to_numpy(),
        simple.to_numpy(zero_copy_only=False),
        fast.to_pandas().to_numpy(),
        lambda v: T.encode_iri_path(T.literal_value(f'"{v}"')),
    )
    items = sub.column("subject").to_pandas()
    uris = pc.binary_join_element_wise(
        pa.scalar("<" + T.YAGO_RESOURCE_PREFIX),
        pa.array(encoded, pa.string(), from_pandas=True),
        pa.scalar("_"),
        qids,
        pa.scalar(">"),
        "",
    ).to_pandas()
    return pd.DataFrame(
        {"item": items, "priority": 2, "uri": uris, "h": _hash_series(items)}
    )


def merge_uri_candidates_arrow(tbl: "pa.Table") -> "pa.Table":
    """Vectorized priority merge over complete item groups: per
    priority LEVEL ascending, uncovered items take their min uri.

    Arrow-native: items are DICTIONARY-ENCODED once in C++ (exact
    integer codes — unlike 64-bit hashing there is no collision risk)
    so every membership test is a numpy boolean-array index instead of
    an object-string hashtable probe; item/uri strings stay in Arrow
    buffers end to end (`take` slices them in C++), and the
    min-uri-per-item dedup sorts only the items that actually have >1
    candidate at a level (almost none: one @en label per item is the
    norm). The pandas object-string form this replaces paid 5 s in
    pd.factorize alone at 6.2 M candidate rows; this form runs the
    whole merge in ~1.5 s with identical output content."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # candidate rows carry "h" = _hash_series(item) computed in the scan
    # tasks; it rides through the merge so the HashedMap broadcast needs
    # no driver-side rehash of 2.4 M key strings
    has_h = "h" in tbl.schema.names
    fields = [
        ("item", pa.large_string()),
        ("priority", pa.int64()),
        ("uri", pa.large_string()),
    ] + ([("h", pa.uint64())] if has_h else [])
    tbl = tbl.select([f[0] for f in fields]).cast(pa.schema(fields)).combine_chunks()
    if tbl.num_rows == 0:
        return tbl.drop_columns(["priority"])
    item = tbl.column("item").chunk(0)
    uri = tbl.column("uri").chunk(0)
    pr = tbl.column("priority").to_numpy()
    h_row = tbl.column("h").to_numpy() if has_h else None

    enc = pc.dictionary_encode(item)
    codes = enc.indices.to_numpy().astype(np.int64, copy=False)
    uniq = enc.dictionary
    n_codes = len(uniq)

    def take(arr, idx):
        return arr.take(pa.array(idx, type=pa.int64()))

    p0_idx = np.flatnonzero(pr == 0)
    if len(p0_idx):
        _, first = np.unique(codes[p0_idx], return_index=True)
        p0_idx = p0_idx[np.sort(first)]  # keep-first, input order
    covered = np.zeros(n_codes, dtype=bool)
    covered[codes[p0_idx]] = True
    marked = np.zeros(n_codes, dtype=bool)
    marked[codes[pr == 99]] = True

    sel_rows = [p0_idx]
    cand_mask = (pr > 0) & (pr < 99) & marked[codes]
    for level in np.unique(pr[cand_mask]):
        idx = np.flatnonzero(cand_mask & (pr == level) & ~covered[codes])
        if not len(idx):
            continue
        lvl_codes = codes[idx]
        counts = np.bincount(lvl_codes, minlength=n_codes)
        multi = counts[lvl_codes] > 1
        sel = idx[~multi]
        if multi.any():  # min uri per item, only where it's contested
            sub_idx = idx[multi]
            order = pc.sort_indices(take(uri, sub_idx)).to_numpy()
            sorted_idx = sub_idx[order]
            _, first = np.unique(codes[sorted_idx], return_index=True)
            sel = np.concatenate([sel, sorted_idx[first]])
        sel_rows.append(sel)
        covered[lvl_codes] = True
    all_sel = np.concatenate(sel_rows) if sel_rows else np.empty(0, np.int64)
    out_items = [take(item, all_sel)]
    out_uris = [take(uri, all_sel)]
    rest_codes = np.flatnonzero(marked & ~covered)
    # fallback _Q{id} for still-uncovered kept items, matching
    # ^<http://www.wikidata.org/entity/(Q[0-9]+)>$ (RE2 on the Arrow
    # dictionary — unique items only, not candidate rows)
    rest = take(uniq, rest_codes)
    qid = pc.extract_regex(
        rest, r"^<http://www\.wikidata\.org/entity/(?P<qid>Q[0-9]+)>$"
    )
    ok = pc.is_valid(qid)
    fb_item = pc.filter(rest, ok)
    fb_qid = pc.struct_field(pc.filter(qid, ok), "qid")
    fb_uri = pc.binary_join_element_wise(
        pa.scalar("<" + T.YAGO_RESOURCE_PREFIX + "_"),
        fb_qid.cast(pa.string()),
        pa.scalar(">"),
        "",
    ).cast(pa.large_string())
    out_items.append(fb_item.cast(pa.large_string()))
    out_uris.append(fb_uri)
    cols = {
        "item": pa.chunked_array(out_items).combine_chunks(),
        "uri": pa.chunked_array(out_uris).combine_chunks(),
    }
    if has_h:
        # item hash per dictionary code (any row of the code works: the
        # hash is a function of the item string)
        h_code = np.zeros(n_codes, dtype=np.uint64)
        h_code[codes] = h_row
        ok_np = ok.to_numpy(zero_copy_only=False)
        fb_h = h_code[rest_codes][ok_np] if len(rest_codes) else h_code[:0]
        cols["h"] = pa.array(
            np.concatenate([h_row[all_sel], fb_h]), type=pa.uint64()
        )
    return pa.table(cols)


def merge_uri_candidates_sharded(
    cand: "pa.Table", min_rows: int = 1_000_000, shards: int = 8
) -> "pa.Table":
    """`merge_uri_candidates_arrow` sharded by item hash: every
    candidate row of an item carries the same worker-computed `h`, so
    `h % shards` co-locates complete item groups and the per-shard
    merges are independent — they run in a thread pool (the kernels are
    Arrow/numpy C code that releases the GIL, so threads scale on the
    driver without serializing the strings). `filter` preserves row
    order within a shard, so each item sees its candidates in the same
    order as the unsharded merge — identical output content. Below
    `min_rows` the single-shot merge wins (sharding pays one
    filter+concat pass)."""
    import pyarrow as pa

    if cand.num_rows < min_rows or "h" not in cand.schema.names:
        return merge_uri_candidates_arrow(cand)
    import concurrent.futures as cf

    sel = cand.column("h").to_numpy() % np.uint64(shards)
    parts = [cand.filter(pa.array(sel == s)) for s in range(shards)]
    with cf.ThreadPoolExecutor(max_workers=shards) as pool:
        outs = list(pool.map(merge_uri_candidates_arrow, parts))
    return pa.concat_tables(outs).combine_chunks()


# hash-range shard count for the remote URI merge: 2**_UM_BITS tasks,
# each owning h >> (64 - _UM_BITS) == shard — complete item groups stay
# together (every candidate row of an item carries the same h), and the
# shards' hash-SORTED outputs concatenate in shard order into one
# globally sorted array, so the final HashedMap pack is a zero-sort
# concat (HashedMap.from_arrow presorted=True)
_UM_BITS = 3


@ray.remote(num_cpus=1)
def _merge_uri_shard(schema_tbl, mandatory_tbl, shard: int, *blocks):
    """One hash-range shard of the URI priority merge. Independent
    1-CPU tasks ride the scheduler better than one N-thread task under
    this host's CPU-steal weather (the 8-thread num_cpus=4 form this
    replaces measured 2.3 s clean but 11+ s in loaded windows), and the
    range filter (top `_UM_BITS` bits of the worker-computed item hash)
    runs BEFORE the kind routing so each task touches ~1/shards of the
    candidate rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    shift = np.uint64(64 - _UM_BITS)

    def rng(t: pa.Table) -> pa.Table:
        h = t.column("h")
        if t.num_rows == 0:
            return t
        sel = pc.equal(
            pc.shift_right(h, pa.scalar(int(shift), pa.uint64())),
            pa.scalar(shard, pa.uint64()),
        )
        return t.filter(sel)

    # range-filter each block BEFORE concatenation: concatenating the
    # full candidate set first paid shards× concat memory per task.
    # (Blocks still ship whole to each shard task — zero-copy here; the
    # full multi-node fix is pre-splitting into ranges in the scan
    # tasks, worth it only once the exchange is cross-node.)
    tbl = pa.concat_tables(
        [rng(b) for b in blocks], promote_options="permissive"
    )
    kind_col = tbl.column("kind")

    def part_p(k: int, p: int) -> pa.Table:
        t = tbl.filter(pc.equal(kind_col, k))
        return pa.table(
            {
                "item": t["item"],
                "priority": pa.array(
                    np.full(t.num_rows, p, dtype=np.int64), pa.int64()
                ),
                "uri": t["uri"],
                "h": t["h"],
            }
        )

    cand = pa.concat_tables(
        [
            rng(schema_tbl),
            part_p(_K_WIKI, 1),
            part_p(_K_LABEL, 2),
            part_p(_K_MARKER, 99),
            rng(mandatory_tbl),
        ],
        promote_options="permissive",
    )
    return merge_uri_candidates_arrow(cand).sort_by([("h", "ascending")])


@ray.remote(num_cpus=1)
def _pack_best_rank(*blocks):
    """Pack the BestRank statement-id hashes into a broadcastable
    HashedSet OFF the driver (same discipline as `_assemble_uri`): the
    unified-scan blocks carry the 8-byte hashes (kind=_K_BESTRANK), so
    the ~n/3-row sort + dedup runs in one task and build_facts consumes
    the ObjectRef straight from the object store. Returns
    (HashedSet | None, collision_free) — callers ray.get only the tiny
    flag; on the (never-observed) 64-bit collision they rebuild from
    the statement strings (best_rank_hashed_set)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .broadcast import HashedSet

    hs = []
    for b in blocks:
        if not isinstance(b, pa.Table):  # defensive: blocks ride AS STORED
            b = pa.Table.from_pandas(b, preserve_index=False)
        sel = b.filter(pc.equal(b.column("kind"), _K_BESTRANK))
        hs.append(sel.column("h").to_numpy(zero_copy_only=False))
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    try:
        return HashedSet.from_prehashed(h, len(h)), True
    except ValueError:  # distinct statement ids sharing a 64-bit hash
        return None, False


@ray.remote(num_returns=2)
def _assemble_uri(*shard_tbls):
    """Concat the hash-range merge shards (globally h-sorted by
    construction) and pack the HashedMap broadcast without re-sorting.
    Returning (HashedMap, (item, uri) table) straight from a task means
    the broadcast ObjectRef EXISTS the moment the shard tasks are
    submitted — the clean-value scan (whose tasks only ray.get the ref
    lazily) is planned and launched while the merge still runs, and the
    packed map goes worker → object store with no driver serialize."""
    import pyarrow as pa

    from .broadcast import HashedMap

    tbl = pa.concat_tables(list(shard_tbls)).combine_chunks()
    mapping = HashedMap.from_arrow(
        tbl["item"], tbl["uri"], hashes=tbl["h"], presorted=True
    )
    return mapping, tbl.select(["item", "uri"])


def merge_uri_candidates(pdf: pd.DataFrame) -> pd.DataFrame:
    """pandas adapter over merge_uri_candidates_arrow (used by the
    distributed groupby(item) strategy, whose parts arrive as pandas)."""
    import pyarrow as pa

    out = merge_uri_candidates_arrow(pa.Table.from_pandas(pdf, preserve_index=False))
    return out.to_pandas()


def build_uri_mapping(
    root: str,
    schema: Schema,
    stats: Stats,
    size: str = "full",
    strategy: str = "driver",
) -> tuple[dict[str, str], Dataset]:
    """4-source priority merge (plan.rs:227-382) as a single
    `groupby(item)`:

    priority 0: shape ys:fromClass → schema.org class IRI
    priority 1: English-Wikipedia title IRI
    priority 2: English label + _Q{id}
    priority 3 (computed in-group): _Q{id} fallback

    Wikipedia/label/fallback candidates only count for *kept* items
    (marker rows); shape-class entries always win unconditionally.
    Returns (driver dict, Dataset) — the Dataset is the scale path.
    """
    # marker rows: which items exist / are kept under the flavor
    if size == "full":
        items = scan_predicate(root, T.RDF_TYPE)
        items = items.map_batches(
            lambda b: b[b["object"] == T.WIKIBASE_ITEM][["subject"]],
            batch_format="pandas",
        )
    else:
        sitelinks = scan_predicate(root, T.SCHEMA_ABOUT)
        needle = (
            ENWIKI_PREFIX if size == "en-wikipedia" else ".wikipedia.org/wiki/"
        )

        def from_links(batch: pd.DataFrame) -> pd.DataFrame:
            mask = batch["subject"].str.contains(needle, regex=False)
            return pd.DataFrame({"subject": batch[mask]["object"]})

        items = sitelinks.map_batches(from_links, batch_format="pandas")

    mandatory = ray.data.from_pandas(
        pd.DataFrame({"subject": list(T.MANDATORY_WD_ITEMS)})
    )
    markers = items.union(mandatory).map_batches(
        lambda b: pd.DataFrame(
            {
                "item": b["subject"],
                "priority": 99,
                "uri": "",
                "h": _hash_series(b["subject"]),
            }
        ),
        batch_format="pandas",
    )

    # priority 0: from schema shapes (driver-side, tiny)
    from_schema = {}
    for shape in schema.node_shapes():
        for from_class in shape.from_classes:
            from_schema[from_class] = shape.target_class
    schema_rows = ray.data.from_pandas(
        pd.DataFrame(
            {
                "item": list(from_schema),
                "priority": [0] * len(from_schema),
                "uri": list(from_schema.values()),
                "h": _hash_series(list(from_schema)),
            }
        )
    )

    # priority 1: enwiki titles — vectorized fast path: titles that are
    # pure ipchar with no percent-escapes skip decode/encode entirely
    sitelinks = scan_predicate(root, T.SCHEMA_ABOUT)
    wiki_rows = sitelinks.map_batches(_wiki_candidates, batch_format="pandas")

    # priority 2: english labels — vectorized qid extract + encode fast path
    labels = scan_predicate(root, T.SKOS_PREF_LABEL)
    label_rows = labels.map_batches(_label_candidates, batch_format="pandas")

    from .joins import partitioned_group_apply

    candidates = schema_rows.union(wiki_rows, label_rows, markers)
    if strategy == "distributed":
        # the 100 TB path: ONE groupby(item) over all candidate rows
        merged = partitioned_group_apply(candidates, ["item"], merge_uri_candidates).materialize()
        out_tbl = pa.concat_tables(
            ray.get(merged.to_arrow_refs()), promote_options="permissive"
        )
    else:
        # driver merge (the reference's own architecture, plan.rs:284-379):
        # candidate generation stays distributed, the priority merge runs
        # once over the collected ARROW table — blocks transfer zero-copy
        # (no object-dtype conversion of 6 M strings on the driver) and
        # the merge itself is Arrow/numpy; ~3× faster than the shuffle at
        # driver-feasible scale, bit-identical result
        # (merge_uri_candidates_arrow is the same kernel either way)
        import os as _os
        import time as _time

        _t = _time.perf_counter()
        cand_tbl = pa.concat_tables(
            ray.get(candidates.to_arrow_refs()), promote_options="permissive"
        )
        if _os.environ.get("YAGO4_RAY_TIMINGS"):
            print(
                f"[uri_mapping] candidate-scan+collect: "
                f"{_time.perf_counter() - _t:.1f}s ({cand_tbl.num_rows} rows)",
                flush=True,
            )
            _t = _time.perf_counter()
        out_tbl = merge_uri_candidates_sharded(cand_tbl)
        if _os.environ.get("YAGO4_RAY_TIMINGS"):
            print(
                f"[uri_mapping] driver-merge-kernel: "
                f"{_time.perf_counter() - _t:.1f}s ({out_tbl.num_rows} rows)",
                flush=True,
            )
        merged = ray.data.from_arrow(out_tbl)
    from .broadcast import HashedMap

    # the driver-side mapping is a HashedMap built straight from the
    # Arrow columns (get/in/[] protocol) with the worker-computed key
    # hashes — 2.4 M key/value strings are never materialized as Python
    # objects on the happy path
    mapping = HashedMap.from_arrow(
        out_tbl["item"], out_tbl["uri"], hashes=out_tbl["h"]
    )
    merged = merged.select_columns(["item", "uri"])
    stats.set_global("Total URI mapping size", len(mapping))
    return mapping, merged


# ---------------------------------------------------------------------------
# Class machinery (driver-side closures over the class graph)
# ---------------------------------------------------------------------------

def _mapping_subset(mapping, keys) -> dict:
    """Plain-dict projection of `mapping` over `keys` — ONE vectorized
    lookup when the mapping is a HashedMap, identity for dicts."""
    from .broadcast import HashedMap

    if not isinstance(mapping, HashedMap):
        return {k: mapping[k] for k in keys if k in mapping}
    ks = pd.Series(sorted(keys), dtype=object)
    vals = mapping.lookup(ks)
    # pd.notna, not `is not None`: lookup's collision-fallback path maps
    # through a dict and yields NaN (not None) for misses — admitting
    # those would carry NaN URIs into classes_to_keep_for_yago
    return {k: v for k, v in zip(ks, vals) if pd.notna(v)}

def subclass_of_from_yago_schema(schema: Schema) -> list[tuple[str, str]]:
    """Schema-side subclass edges with the Intangible/StructuredValue
    rewrites (plan.rs:2225-2248)."""
    edges = []
    for shape in schema.node_shapes():
        cls = schema.rdfs_class(shape.target_class)
        if cls is None:
            continue
        for super_class in cls.super_classes:
            if super_class in (T.SCHEMA_INTANGIBLE, T.SCHEMA_MEDICAL_INTANGIBLE):
                edges.append((cls.id, T.SCHEMA_THING))
            elif super_class in (T.SCHEMA_STRUCTURED_VALUE, T.SCHEMA_SERIES):
                continue
            else:
                edges.append((cls.id, super_class))
    return edges


def collect_p279_edges(root: str) -> list[tuple[str, str]]:
    """P279 edge list (class-graph scale → driver)."""
    p279 = scan_predicate(root, f"<{T.WDT}P279>").to_pandas()
    return list(zip(p279["subject"], p279["object"]))


def collect_instance_counts(root: str) -> dict[str, int]:
    """Distinct-instance count per class: per-batch combiner (store rows
    are globally distinct, so batch-level nunique partials sum exactly),
    then a partitioned reduce — hub classes like Q5 cannot skew it."""
    from .joins import partitioned_group_apply

    p31 = scan_predicate(root, f"<{T.WDT}P31>")
    counts_df = partitioned_group_apply(
        p31.map_batches(
            lambda b: b.groupby("object", as_index=False)
            .agg(n=("subject", "nunique")),
            batch_format="pandas",
        ),
        ["object"],
        lambda pdf: pdf.groupby("object", as_index=False).agg(n=("n", "sum")),
    ).to_pandas()
    return dict(zip(counts_df["object"], counts_df["n"]))


# fused-reduction row kinds (routing column of the single-scan job)
(
    _K_MARKER, _K_WIKI, _K_LABEL, _K_ENWIKI, _K_P279, _K_COUNT,
    _K_BESTRANK,
) = range(7)


def collect_input_reductions(
    root: str,
    schema: Schema,
    stats: Stats,
    size: str = "full",
    on_uri_ref=None,
    pack_best_rank: bool = True,
):
    """Every driver-scale input reduction in ONE store scan: URI-mapping
    candidates (markers + wiki + label), enwiki sitelink pairs, P279
    edges and per-class P31 instance counts, routed by predicate inside
    one map_batches and split by a `kind` column on the driver.

    Replaces four CONCURRENT Ray jobs (build_enwiki_mapping,
    build_uri_mapping, collect_p279_edges, collect_instance_counts) that
    contended for the same CPUs — the URI candidate scan alone measured
    7.9 s solo but 15.0 s under the 4-way overlap at 22 M statements /
    32 CPUs — scans the schema:about partition once instead of twice,
    and turns the P31 count reduce into per-batch partials summed on the
    driver (class-graph scale) instead of a shuffle.

    Returns (uri_mapping, uri_ds, enwiki_mapping, enwiki_ds, p279_edges,
    instance_counts, best_rank) with content identical to the separate
    builders (the merge kernel and candidate kernels are shared).
    """
    import pyarrow.compute as pc

    from .broadcast import HashedMap

    p279_pred = f"<{T.WDT}P279>"
    p31_pred = f"<{T.WDT}P31>"
    # rdf:type is ALWAYS scanned: it carries the wikibase:Item markers
    # (full size only) AND the BestRank statement ids — folding the
    # best-rank reduction in here removes a second full pass over the
    # store's biggest partition (best_rank_hashed_set's own scan)
    preds = [
        T.SCHEMA_ABOUT, T.SKOS_PREF_LABEL, p279_pred, p31_pred, T.RDF_TYPE,
    ]
    needle = ENWIKI_PREFIX if size == "en-wikipedia" else ".wikipedia.org/wiki/"

    _zero_h = np.zeros(0, dtype=np.uint64)

    def _unified(kind: int, item, uri=None, n=None, h=None) -> pa.Table:
        # Arrow out: the routed rows feed a shuffle-free to_arrow_refs
        # collect; pandas object frames mis-size in Ray's estimator
        # (np.vectorize errors on empty frames) and pickle every string
        items = np.asarray(item, dtype=object)
        m = len(items)
        return pa.table(
            {
                "kind": pa.array(np.full(m, kind, dtype=np.int8)),
                "item": pa.array(items, pa.string(), from_pandas=True),
                "uri": pa.array(
                    np.asarray(uri, dtype=object)
                    if uri is not None
                    else np.full(m, "", dtype=object),
                    pa.string(),
                    from_pandas=True,
                ),
                "n": pa.array(
                    np.asarray(n, dtype=np.int64)
                    if n is not None
                    else np.zeros(m, dtype=np.int64)
                ),
                "h": pa.array(
                    np.asarray(h, dtype=np.uint64)
                    if h is not None
                    else np.zeros(m, dtype=np.uint64)
                ),
            }
        )

    def route(batch: pa.Table) -> pa.Table:
        # Arrow in, Arrow routing: the equality filters over rdf:type —
        # the store's biggest partition — and the P31 count partials run
        # as Arrow kernels; ONLY the subsets that feed the pandas
        # siphash / URL-encode kernels convert to pandas (converting the
        # whole 8 M-row frame cost ~2/3 of the scan wall at 32 CPUs —
        # the read alone is 0.57 s, scan+pandas-route was 1.8 s)
        outs: list[pa.Table] = []
        predc = batch.column("predicate")
        t = batch.filter(pc.equal(predc, T.RDF_TYPE))
        if t.num_rows:
            if size == "full":
                items = (
                    t.filter(pc.equal(t.column("object"), T.WIKIBASE_ITEM))
                    .column("subject")
                    .to_pandas()
                )
                outs.append(_unified(_K_MARKER, items, h=_hash_series(items)))
            # BestRank membership travels as 8-byte hashes only
            # (statement ids never reach the driver as strings)
            br = (
                t.filter(pc.equal(t.column("object"), T.WIKIBASE_BEST_RANK))
                .column("subject")
                .to_pandas()
            )
            outs.append(
                _unified(
                    _K_BESTRANK,
                    np.full(len(br), "", dtype=object),
                    h=_hash_series(br),
                )
            )
        ab = batch.filter(pc.equal(predc, T.SCHEMA_ABOUT))
        if ab.num_rows:
            wiki = _wiki_candidates_arrow(ab)
            outs.append(
                _unified(_K_WIKI, wiki["item"], uri=wiki["uri"], h=wiki["h"])
            )
            pairs = _enwiki_pairs_arrow(ab)
            outs.append(
                _unified(
                    _K_ENWIKI, pairs["item"], uri=pairs["url"], h=pairs["h"]
                )
            )
            if size != "full":
                items = ab.filter(
                    pc.match_substring(ab.column("subject"), needle)
                ).column("object").to_pandas()
                outs.append(_unified(_K_MARKER, items, h=_hash_series(items)))
        lb = batch.filter(pc.equal(predc, T.SKOS_PREF_LABEL))
        if lb.num_rows:
            lab = _label_candidates_arrow(lb)
            outs.append(
                _unified(_K_LABEL, lab["item"], uri=lab["uri"], h=lab["h"])
            )
        p279 = batch.filter(pc.equal(predc, p279_pred))
        if p279.num_rows:
            outs.append(
                _unified(
                    _K_P279,
                    p279.column("subject").to_pandas(),
                    uri=p279.column("object").to_pandas(),
                )
            )
        p31 = batch.filter(pc.equal(predc, p31_pred))
        if p31.num_rows:
            # per-batch combiner partials: store rows are globally
            # distinct, so batch-level distinct-count partials sum
            # exactly (collect_instance_counts' own argument). Arrow
            # count_distinct is exact-byte (strictly better than pandas
            # nunique's C-string NUL collapse — see broadcast._n_distinct)
            agg = pa.TableGroupBy(
                p31.select(["object", "subject"]), "object", use_threads=False
            ).aggregate([("subject", "count_distinct")])
            outs.append(
                _unified(
                    _K_COUNT,
                    agg.column("object").to_pandas(),
                    n=agg.column("subject_count_distinct").to_numpy(),
                )
            )
        if not outs:
            return _unified(_K_MARKER, [])
        return pa.concat_tables(outs)

    import time as _time

    _t0 = _time.perf_counter()

    def _mark(phase: str):
        nonlocal _t0
        import os as _os

        if _os.environ.get("YAGO4_RAY_TIMINGS"):
            now = _time.perf_counter()
            print(f"[input-reductions] {phase}: {now - _t0:.1f}s", flush=True)
            _t0 = now

    # wide=True: this scan feeds to_arrow_refs + the per-range merge
    # tasks (no sort shuffle), so block count should track the SESSION
    # width, not the shuffle-exchange bound
    rows = scan_predicate(root, preds, wide=True).map_batches(
        route, batch_format="pyarrow"
    )
    block_refs = rows.to_arrow_refs()
    _mark("scan (to_arrow_refs)")

    # URI candidate prep the remote merge can't derive from the blocks
    # (driver-side, tiny)
    from_schema: dict[str, str] = {}
    for shape in schema.node_shapes():
        for from_class in shape.from_classes:
            from_schema[from_class] = shape.target_class
    schema_tbl = pa.table(
        {
            "item": pa.array(list(from_schema), pa.string()),
            "priority": pa.array([0] * len(from_schema), pa.int64()),
            "uri": pa.array(list(from_schema.values()), pa.string()),
            "h": pa.array(
                _hash_series(list(from_schema)) if from_schema else _zero_h,
                pa.uint64(),
            ),
        }
    )
    mandatory = sorted(T.MANDATORY_WD_ITEMS)
    mandatory_tbl = pa.table(
        {
            "item": pa.array(mandatory, pa.string()),
            "priority": pa.array([99] * len(mandatory), pa.int64()),
            "uri": pa.array([""] * len(mandatory), pa.string()),
            "h": pa.array(_hash_series(mandatory), pa.uint64()),
        }
    )
    # the merge + HashedMap pack runs in a TASK over the scan blocks:
    # uri_packed exists NOW, so the caller can launch the clean-value
    # scan (its tasks get the ref lazily) while the merge still runs
    shard_refs = [
        _merge_uri_shard.remote(schema_tbl, mandatory_tbl, s, *block_refs)
        for s in range(1 << _UM_BITS)
    ]
    uri_packed, uri_tbl_ref = _assemble_uri.remote(*shard_refs)
    if on_uri_ref is not None:
        on_uri_ref(uri_packed)
    # best-rank membership packs REMOTELY too (same discipline as the
    # URI merge): ~n/3 statement-id hashes never sort on the driver and
    # the packed set is consumed by build_facts straight from the object
    # store (the driver used to sort, hold AND re-ray.put them — a flat
    # ~0.5 s at every CPU width). The distributed-state path joins
    # against best_rank_ds instead and skips the pack.
    rank_set_ref = rank_ok_ref = None
    if pack_best_rank:
        rank_set_ref, rank_ok_ref = _pack_best_rank.options(
            num_returns=2
        ).remote(*block_refs)

    tbl = pa.concat_tables(ray.get(block_refs), promote_options="permissive")
    _mark("collect (ray.get+concat)")
    kind_col = tbl.column("kind")

    def part(k: int) -> pa.Table:
        return tbl.filter(pc.equal(kind_col, k))

    # the per-kind reductions below are independent Arrow/numpy work
    # over the immutable collected table — run them in threads (the
    # kernels release the GIL) while the MAIN thread does the URI
    # candidate prep + priority merge, the serial critical path
    import concurrent.futures as _icf

    def _enwiki():
        etbl = part(_K_ENWIKI)
        mapping = HashedMap.from_arrow(
            etbl["item"], etbl["uri"], hashes=etbl["h"]
        )
        ds_ = ray.data.from_arrow(
            etbl.select(["item", "uri"]).rename_columns(["item", "url"])
        )
        return mapping, ds_

    def _p279():
        ptbl = part(_K_P279)
        return list(zip(ptbl["item"].to_pylist(), ptbl["uri"].to_pylist()))

    def _counts():
        ctbl = part(_K_COUNT)
        csum = pa.TableGroupBy(ctbl.select(["item", "n"]), "item").aggregate(
            [("n", "sum")]
        )
        return dict(zip(csum["item"].to_pylist(), csum["n_sum"].to_pylist()))

    _side_pool = _icf.ThreadPoolExecutor(max_workers=4)
    f_enwiki = _side_pool.submit(_enwiki)
    f_p279 = _side_pool.submit(_p279)
    f_counts = _side_pool.submit(_counts)

    # --- URI mapping: the 4-source priority merge (plan.rs:227-382)
    # runs remotely (hash-range _merge_uri_shard tasks + _assemble_uri,
    # submitted before the collect); here the driver only fetches the
    # packed map for class machinery
    uri_mapping = ray.get(uri_packed)
    _mark("uri-merge (remote) wait")
    uri_ds = ray.data.from_arrow_refs([uri_tbl_ref])
    enwiki_mapping, enwiki_ds = f_enwiki.result()
    p279_edges = f_p279.result()
    instance_counts = f_counts.result()
    _side_pool.shutdown(wait=False)
    _mark("side-reductions")
    stats.set_global("Total URI mapping size", len(uri_mapping))
    return (
        uri_mapping,
        uri_ds,
        enwiki_mapping,
        enwiki_ds,
        p279_edges,
        instance_counts,
        (rank_set_ref, rank_ok_ref),
        uri_packed,
    )


def build_class_machinery(
    root: str,
    schema: Schema,
    stats: Stats,
    uri_mapping: dict[str, str],
    enwiki_mapping: dict[str, str],
    all_sub_class_of: list[tuple[str, str]] | None = None,
    instance_counts: dict[str, int] | None = None,
) -> tuple[set[str], dict[str, list[str]], dict[str, list[str]]]:
    """The 7-step class algorithm of plan.rs:384-614. P279 edges and
    per-class instance counts come from two Dataset reductions; the
    closures run on the driver."""
    from_classes = [
        fc for shape in schema.node_shapes() for fc in shape.from_classes
    ]

    if all_sub_class_of is None:
        all_sub_class_of = collect_p279_edges(root)
    stats.set_global("Wikidata sub class of", len(all_sub_class_of))

    # mapped classes keep only schema-side superclasses (plan.rs:433-436)
    sub_class_of = G.edge_map(
        (s, o) for s, o in all_sub_class_of if s not in from_classes
    )
    super_class_of = G.invert(sub_class_of)

    if instance_counts is None:
        instance_counts = collect_instance_counts(root)

    bad_classes = G.transitive_closure(T.WD_BAD_CLASSES, super_class_of)
    stats.set_global("bad classes", len(bad_classes))

    mapped_subclasses = G.transitive_closure(from_classes, super_class_of)
    stats.set_global(
        "Wikidata classes subclass of a mapped class", len(mapped_subclasses)
    )

    # classes below two disjoint mapped trees (plan.rs:478-497)
    subclasses_of_disjoint: set[str] = set()
    for cls in schema.classes():
        shape1 = schema.node_shape(cls.id)
        for other in cls.disjoint_classes:
            shape2 = schema.node_shape(other)
            for wd1 in shape1.from_classes:
                for wd2 in shape2.from_classes:
                    c1 = G.transitive_closure([wd1], super_class_of)
                    c2 = G.transitive_closure([wd2], super_class_of)
                    subclasses_of_disjoint |= c1 & c2
    stats.set_global("Not disjoint classes", len(subclasses_of_disjoint))

    with_min_instances = {
        c
        for c, n in instance_counts.items()
        if n >= T.MIN_NUMBER_OF_INSTANCES
    }
    stats.set_global("classes with at least 10 instances", len(with_min_instances))

    classes_to_keep = {
        c
        for c in mapped_subclasses & with_min_instances
        if c not in bad_classes and c not in subclasses_of_disjoint
    } | set(from_classes)
    stats.set_global(
        "Wikidata classes used for the instance of extraction", len(classes_to_keep)
    )

    classes_to_keep_for_yago = set(
        _mapping_subset(enwiki_mapping, classes_to_keep)
    ) | set(from_classes)
    stats.set_global(
        "Wikidata classes kept for Yago", len(classes_to_keep_for_yago)
    )

    # project the (possibly HashedMap) URI mapping onto the class keys
    # once, vectorized — the loops below probe it O(class-graph) times
    # and a per-probe hash would dominate at real-Wikidata class counts
    uri_mapping = _mapping_subset(
        uri_mapping, classes_to_keep | set(from_classes)
    )

    # YAGO subclass graph: closure up to mapped classes, then URI-mapped
    closure_pairs = G.transitive_closure_pairs(
        (
            (s, o)
            for s, vs in sub_class_of.items()
            if s in classes_to_keep_for_yago
            for o in vs
        ),
        sub_class_of,
    )
    yago_sub_class_of_pairs = [
        (uri_mapping[k], uri_mapping[v])
        for k, vs in closure_pairs.items()
        for v in vs
        if v in from_classes and k in uri_mapping and v in uri_mapping
    ]
    yago_sub_class_of_pairs.extend(subclass_of_from_yago_schema(schema))
    yago_sub_class_of = G.edge_map(yago_sub_class_of_pairs)
    yago_super_class_of_raw = G.invert(yago_sub_class_of)
    yago_super_class_of = G.filter_redundant_parents(
        yago_super_class_of_raw, yago_sub_class_of
    )
    stats.set_global(
        "sub class of relations in Yago",
        sum(len(v) for v in yago_super_class_of.values()),
    )

    # Wikidata class → YAGO class mapping (plan.rs:578-601)
    identity = [(c, c) for c in classes_to_keep_for_yago]
    lifted = G.transitive_closure_pairs(
        ((c, c) for c in classes_to_keep - classes_to_keep_for_yago),
        sub_class_of,
    )
    lifted_pairs = [
        (k, v) for k, vs in lifted.items() for v in vs if v in from_classes
    ]
    mapping_pairs = [
        (k, uri_mapping[v])
        for k, v in identity + lifted_pairs
        if v in uri_mapping
    ]
    wd_to_yago_class_mapping = G.filter_redundant_parents(
        G.edge_map(mapping_pairs), yago_super_class_of
    )

    yago_classes = {
        uri_mapping[c] for c in classes_to_keep_for_yago if c in uri_mapping
    }
    return yago_classes, wd_to_yago_class_mapping, yago_super_class_of


# ---------------------------------------------------------------------------
# ST3: shape instances (one shuffle incl. disjoint-instance removal)
# ---------------------------------------------------------------------------

@ray.remote(num_returns=2)
def _pack_shape_instances(shape_targets, *blocks):
    """Worker-side HashedSet pack of the resolved (shape, instance)
    table: the driver receives only (packs ref, tiny per-shape count
    dict) — instance strings and their hashes never transit the driver,
    and the pack overlaps the facts-plan construction that previously
    waited on the driver-side groupby. The 64-bit-collision fallback
    rebuilds exact string sets IN the task (it already holds the
    strings)."""
    import pyarrow as pa

    from .broadcast import HashedSet, _hash_series

    def as_arrow(b):
        return (
            b
            if isinstance(b, pa.Table)
            else pa.Table.from_pandas(b, preserve_index=False)
        )

    # empty shuffle partitions surface as zero-column blocks (an empty
    # pandas frame converts to a schema-less table) — first seen at
    # 44 M / 32 CPUs where the part count outruns the group count
    parts = [
        t.select(["shape", "instance"])
        for t in map(as_arrow, blocks)
        if t.num_rows and "shape" in t.column_names
    ]
    tbl = (
        pa.concat_tables(parts, promote_options="permissive")
        if parts
        else pa.table(
            {
                "shape": pa.array([], pa.string()),
                "instance": pa.array([], pa.string()),
            }
        )
    )
    packs = {
        t: HashedSet.from_prehashed(np.empty(0, np.uint64), 0)
        for t in shape_targets
    }
    if tbl.num_rows:
        df = tbl.to_pandas()
        df["h"] = _hash_series(df["instance"])
        try:
            for shape, grp in df.groupby("shape")["h"]:
                packs[shape] = HashedSet.from_prehashed(
                    grp.to_numpy(), len(grp)
                )
        except ValueError:  # 64-bit collision: exact rebuild from strings
            packs = {t: HashedSet([]) for t in shape_targets}
            for shape, grp in df.groupby("shape")["instance"]:
                packs[shape] = HashedSet(grp)
    return packs, {t: len(p) for t, p in packs.items()}


@ray.remote
def _extract_pack(packs, target):
    """One shape's HashedSet out of a remote packs dict — chained on
    the packs ref so the driver never fetches the full dict just to
    broadcast a single member (packed_ref('things'))."""
    from .broadcast import HashedSet

    return packs.get(target) or HashedSet([])


class LazyShapePacks:
    """Driver handle for remotely packed shape instances: `.packs_ref`
    feeds broadcasts with zero driver fetch; any driver-side dict access
    materializes once (tests, small flavors)."""

    def __init__(self, packs_ref, counts_ref):
        self.packs_ref = packs_ref
        self.counts_ref = counts_ref
        self._val = None

    def _value(self) -> dict:
        if self._val is None:
            self._val = ray.get(self.packs_ref)
        return self._val

    def counts(self) -> dict:
        return ray.get(self.counts_ref)

    def get(self, key, default=None):
        return self._value().get(key, default)

    def __getitem__(self, key):
        return self._value()[key]

    def __contains__(self, key):
        return key in self._value()

    def items(self):
        return self._value().items()

    def keys(self):
        return self._value().keys()

    def __iter__(self):
        # without this, `for shape in packs:` would fall back to the
        # legacy sequence protocol and raise KeyError(0)
        return iter(self._value())

    def __len__(self):
        return len(self._value())


def build_shape_instances(
    root: str,
    schema: Schema,
    stats: Stats,
    wd_to_yago_class_mapping: dict[str, list[str]],
    yago_super_class_of: dict[str, list[str]],
    yago_classes: set[str],
    uri_mapping: dict[str, str],
) -> tuple[dict[str, set[str]], Dataset]:
    """plan.rs:641-731 as: P31 scan → class-map flat join (broadcast the
    class mapping: class-graph scale) → shape fan-out → ONE
    groupby(instance) doing dedup + disjoint-instance removal."""
    # yago class → shapes whose closure contains it (driver, tiny)
    shape_targets = [s.target_class for s in schema.node_shapes()]
    class_to_shapes: dict[str, list[str]] = defaultdict(list)
    for target in shape_targets:
        for cls in G.transitive_closure([target], yago_super_class_of):
            class_to_shapes[cls].append(target)

    # wd class → shape list via the yago class mapping
    wd_class_to_shapes: dict[str, list[str]] = {}
    for wd_class, yago_cls_list in wd_to_yago_class_mapping.items():
        shapes = []
        for yc in yago_cls_list:
            shapes.extend(class_to_shapes.get(yc, ()))
        if shapes:
            wd_class_to_shapes[wd_class] = sorted(set(shapes))

    # disjoint target-class pairs (both directions)
    disjoint_pairs: set[tuple[str, str]] = set()
    for cls in schema.classes():
        for other in cls.disjoint_classes:
            disjoint_pairs.add((cls.id, other))
            disjoint_pairs.add((other, cls.id))

    from .broadcast import HashedMap, HashedSet

    refs = {
        "wd_class_to_shapes": ray.put(wd_class_to_shapes),  # class-scale
        "uri_mapping": ray.put(
            uri_mapping
            if isinstance(uri_mapping, HashedMap)
            else HashedMap(uri_mapping)
        ),  # zero-copy
        "yago_classes": ray.put(HashedSet(yago_classes)),
        "disjoint_pairs": ray.put(disjoint_pairs),
    }

    p31 = scan_predicate(root, f"<{T.WDT}P31>")

    def fan_out(batch: pd.DataFrame) -> pa.Table:
        class_map = get_broadcast(refs["wd_class_to_shapes"])
        uris = get_broadcast(refs["uri_mapping"])
        classes = get_broadcast(refs["yago_classes"])
        instances = uris.lookup(batch["subject"])
        # "we do not want classes" (plan.rs:686)
        keep = instances.notna().to_numpy() & ~classes.contains(
            instances.fillna("")
        )
        base = pd.DataFrame(
            {"wd_class": batch["object"], "instance": instances}
        )[keep]
        shs, insts = [], []
        for wd_class, group in base.groupby("wd_class", sort=False):
            for shape in class_map.get(wd_class, ()):
                shs.append(np.full(len(group), shape, dtype=object))
                insts.append(group["instance"].to_numpy())
        # Arrow out with explicit string types: empty pandas object
        # frames null-type in the exchange and mis-size in the estimator
        if not shs:
            return pa.table(
                {
                    "shape": pa.array([], pa.string()),
                    "instance": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                "shape": pa.array(
                    np.concatenate(shs), pa.string(), from_pandas=True
                ),
                "instance": pa.array(
                    np.concatenate(insts), pa.string(), from_pandas=True
                ),
            }
        )

    fanned = p31.map_batches(fan_out, batch_format="pandas")

    def resolve_part(pdf: pd.DataFrame) -> pd.DataFrame:
        """Dedup (shape, instance); drop instances that belong to two
        disjoint shapes (plan.rs:692-730). Vectorized set algebra over
        complete instance groups."""
        pairs = get_broadcast(refs["disjoint_pairs"])
        pdf = pdf.drop_duplicates(["shape", "instance"])
        bad: set = set()
        members = {
            shape: set(pdf.loc[pdf["shape"] == shape, "instance"])
            for shape in {a for a, _ in pairs} | {b for _, b in pairs}
        }
        for a, b in pairs:
            bad |= members.get(a, set()) & members.get(b, set())
        if bad:
            pdf = pdf[~pdf["instance"].isin(bad)]
        return pdf

    import os as _os
    import time as _time

    _t0 = _time.perf_counter()

    def _mk(phase: str):
        nonlocal _t0
        if _os.environ.get("YAGO4_RAY_TIMINGS"):
            now = _time.perf_counter()
            print(f"[shape_instances] {phase}: {now - _t0:.1f}s", flush=True)
            _t0 = now

    from .joins import partitioned_group_apply

    resolved = partitioned_group_apply(
        fanned,
        ["instance"],
        resolve_part,
        combine=lambda pdf: pdf.drop_duplicates(["shape", "instance"]),
    ).materialize()  # consumed by simple-types + every distributed join
    _mk("fanout+resolve (materialize)")

    # pack the HashedSets in a REMOTE task over the materialized blocks
    # (resolve_part dedups (shape, instance) globally, so per-shape row
    # counts are distinct-key counts and from_prehashed's collision
    # check holds). The driver gets back only the refs: downstream
    # broadcast consumers chain on packs_ref, stats resolve the count
    # dict lazily (Stats.set_lazy), and the pack overlaps the facts-plan
    # construction instead of serializing build_state.
    packs_ref, counts_ref = _pack_shape_instances.remote(
        shape_targets, *resolved.to_arrow_refs()
    )
    _mk("pack-submit")
    lazy = LazyShapePacks(packs_ref, counts_ref)
    stats.set_lazy(
        "Instances of a shape", lazy.counts
    )
    return lazy, resolved


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

# above this many URI-mapping entries the packed broadcasts stop being
# "small state" and every fact-pipeline call site flips to hash joins
# against the state Datasets (build_dist) — a worker-heap bound, not a
# correctness one (both paths are verified identical)
DISTRIBUTED_STATE_THRESHOLD = 50_000_000


def build_state(
    statements_root: str,
    schema: Schema | None = None,
    size: str = "full",
    distributed: bool | None = None,
) -> BuildState:
    import concurrent.futures as _cf
    import os as _os
    import time as _time

    _t0 = _time.perf_counter()

    def _mark(phase: str):
        nonlocal _t0
        if _os.environ.get("YAGO4_RAY_TIMINGS"):
            now = _time.perf_counter()
            print(f"[build_state] {phase}: {now - _t0:.1f}s", flush=True)
            _t0 = now

    schema = schema or Schema.open()
    stats = Stats()
    if distributed is None:
        # decide BEFORE building any state: with the decision taken
        # after the URI merge, auto mode would driver-collect the very
        # candidate table it then deems too big. The estimate is the
        # rdf:type partition's footer row count — an upper bound on the
        # kept-item count (markers are its wikibase:Item subset), read
        # from parquet metadata only, which errs toward flipping to
        # the join path early (the safe direction at scale).
        from .sources import store_num_rows

        distributed = (
            store_num_rows(statements_root, [T.RDF_TYPE])
            >= DISTRIBUTED_STATE_THRESHOLD
            or _os.environ.get("YAGO4_RAY_DISTRIBUTED_STATE") == "1"
        )
    prewarmed: dict = {}
    uri_packed: "ray.ObjectRef | None" = None
    if not distributed:
        # ONE fused scan job over the union of the state-input predicate
        # partitions — four concurrent jobs contended for the same CPUs
        # (see collect_input_reductions)
        from . import build as B  # deferred: build imports state

        # the clean-value scan needs ONLY the URI broadcast REF, which
        # the remote merge task provides the moment the fused scan
        # resolves — submit the scan from the callback so it overlaps
        # the merge itself, class machinery AND shape-instance
        # resolution instead of serializing behind them in build_facts
        _pre_pool = _cf.ThreadPoolExecutor(max_workers=1)
        _pre: dict = {}

        def _launch_clean(uri_ref) -> None:
            _pre["clean_maps_ref"] = _pre_pool.submit(
                B.clean_hmm_refs, statements_root, uri_ref
            )

        (
            uri_mapping,
            uri_ds,
            enwiki_mapping,
            enwiki_ds,
            p279_edges,
            instance_counts,
            best_rank_refs,
            uri_packed,
        ) = collect_input_reductions(
            statements_root, schema, stats, size, on_uri_ref=_launch_clean
        )
        prewarmed = {
            "clean_maps_ref": _pre["clean_maps_ref"],
            # BestRank packed REMOTELY out of the same fused scan:
            # (HashedSet ref, collision-free-flag ref) — build_facts
            # broadcasts the set ref directly, no driver materialization
            "best_rank_ref": best_rank_refs,
        }
        _pre_pool.shutdown(wait=False)
    else:
        # distributed state shares the SAME fused input scan (measured
        # 14.8 s as four concurrent scan jobs vs ~4 s fused at 44 M /
        # 32 CPUs — the scans contend for the same partitions). What
        # stays different at scale is the statement-path JOINS
        # (build_dist joins against uri_ds / shape-instance Datasets
        # instead of broadcasts); the input reductions themselves
        # (class graph, enwiki map, URI merge shards) are class-graph /
        # hash-range-sharded either way. No clean-scan hook (build_dist
        # consumes the clean VALUES Dataset, not the packed maps) and
        # no best-rank pack (it joins best_rank_ds).
        (
            uri_mapping,
            uri_ds,
            enwiki_mapping,
            enwiki_ds,
            p279_edges,
            instance_counts,
            _rank_unused,
            uri_packed_dist,
        ) = collect_input_reductions(
            statements_root, schema, stats, size, pack_best_rank=False
        )
        uri_packed = None  # build_facts' broadcast refs are unused here
        del uri_packed_dist
    _mark("input-reductions (enwiki+uri+p279+counts)")
    stats.set_global(
        "Wikidata items mapped to English Wikipedia articles", len(enwiki_mapping)
    )
    yago_classes, wd_to_yago_class_mapping, yago_super_class_of = (
        build_class_machinery(
            statements_root, schema, stats, uri_mapping, enwiki_mapping,
            all_sub_class_of=p279_edges, instance_counts=instance_counts,
        )
    )
    _mark("class-machinery")
    shape_instances, inst_ds = build_shape_instances(
        statements_root,
        schema,
        stats,
        wd_to_yago_class_mapping,
        yago_super_class_of,
        yago_classes,
        uri_mapping,
    )
    _mark("shape-instances")
    state = BuildState(
        schema=schema,
        stats=stats,
        enwiki_mapping=enwiki_mapping,
        uri_mapping=uri_mapping,
        yago_classes=yago_classes,
        wd_to_yago_class_mapping=wd_to_yago_class_mapping,
        yago_super_class_of=yago_super_class_of,
        shape_instances=shape_instances,
        distributed=bool(distributed),
        prewarmed=prewarmed,
    )
    if uri_packed is not None:
        state._refs["packed:uri_mapping"] = uri_packed
    state.datasets["uri_mapping"] = uri_ds
    state.datasets["shape_instances"] = inst_ds
    state.datasets["enwiki"] = enwiki_ds
    return state
