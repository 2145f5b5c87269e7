"""lancelite — a from-scratch implementation of the Lance DATASET MODEL.

The input_hint names Lance tables as the corpus format, but the `lance`
package does not exist in this environment (no network, no vendoring).
This module implements the publicly documented *dataset layout* of
Lance (lancedb/lance docs, "Lance format spec": a dataset directory of
immutable columnar data fragments under `data/`, plus a versioned
manifest per snapshot under `_versions/` with a `_latest.manifest`
pointer) so the engine's Lance-facing surfaces — dataset discovery,
fragment-parallel distributed scans, column pruning, versioned
append/overwrite with ATOMIC manifest commit, two-phase distributed
writes (workers write fragments, the driver commits one manifest) —
are real and tested.

Honest limit, stated once: fragment payloads are encoded as Arrow IPC
files (optionally zstd-compressed) rather than Lance's v2 mini-block
encoding, and manifests are JSON rather than protobuf — so files
interoperate with real Lance at the LAYOUT level, not the byte level.
`read_documents` prefers the real package whenever it is importable;
this module is the executable stand-in that keeps every Lance code
path exercised in this container.

Layout written/read here::

    corpus.lance/
      data/frag-<version>-<index>-<rows>.lanceipc
      _versions/<version>.manifest.json
      _latest.manifest            # text: latest version number

Manifest fields: version, schema (base64 Arrow IPC schema), fragments
[{file, rows, bytes}] — enough for planning distributed reads without
opening a single fragment.
"""

from __future__ import annotations

import base64
import json
import os
import uuid

import pyarrow as pa
import pyarrow.ipc as ipc

_FRAG_DIR = "data"
_VERSIONS_DIR = "_versions"
_LATEST = "_latest.manifest"
_FRAG_EXT = ".lanceipc"


def is_lancelite(path: str) -> bool:
    """True when `path` is a lancelite dataset directory (JSON
    manifests distinguish it from a real-Lance protobuf dataset)."""
    latest = os.path.join(path, _LATEST)
    if not os.path.isfile(latest):
        return False
    with open(latest) as f:
        v = f.read().strip()
    return os.path.isfile(
        os.path.join(path, _VERSIONS_DIR, f"{v}.manifest.json")
    )


def _write_manifest(path: str, manifest: dict) -> None:
    """Atomic commit: a manifest becomes visible only via os.replace —
    a crashed write leaves orphan fragment files but never a torn or
    half-registered snapshot (the resumability contract)."""
    vdir = os.path.join(path, _VERSIONS_DIR)
    os.makedirs(vdir, exist_ok=True)
    target = os.path.join(vdir, f"{manifest['version']}.manifest.json")
    tmp = target + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, target)
    ltmp = os.path.join(path, _LATEST + f".tmp-{uuid.uuid4().hex}")
    with open(ltmp, "w") as f:
        f.write(str(manifest["version"]))
    os.replace(ltmp, os.path.join(path, _LATEST))


def _read_manifest(path: str, version: int | None = None) -> dict:
    if version is None:
        with open(os.path.join(path, _LATEST)) as f:
            version = int(f.read().strip())
    with open(
        os.path.join(path, _VERSIONS_DIR, f"{version}.manifest.json")
    ) as f:
        return json.load(f)


def _schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _schema_from_b64(data: str) -> pa.Schema:
    return ipc.read_schema(pa.BufferReader(base64.b64decode(data)))


def write_fragment(
    table: pa.Table, path: str, name: str, compression: str | None = "zstd"
) -> dict:
    """Write ONE immutable fragment file and return its manifest entry.
    Safe to call concurrently from Ray tasks/actors: fragments are
    invisible until a manifest naming them is committed."""
    os.makedirs(os.path.join(path, _FRAG_DIR), exist_ok=True)
    fname = f"{name}{_FRAG_EXT}"
    full = os.path.join(path, _FRAG_DIR, fname)
    opts = ipc.IpcWriteOptions(compression=compression)
    with ipc.new_file(full, table.schema, options=opts) as w:
        w.write_table(table)
    return {
        "file": fname,
        "rows": table.num_rows,
        "bytes": os.path.getsize(full),
    }


def commit(
    path: str,
    schema: pa.Schema,
    new_fragments: list[dict],
    mode: str = "create",
) -> int:
    """Commit fragments as the next dataset version (two-phase write:
    callers produced the fragments — possibly in parallel Ray tasks —
    and this single driver-side rename makes them visible). Returns
    the committed version number."""
    if mode not in ("create", "overwrite", "append"):
        raise ValueError(f"unknown mode {mode!r}")
    prev: dict | None = None
    if is_lancelite(path):
        prev = _read_manifest(path)
    elif mode == "append":
        raise FileNotFoundError(f"append to non-existent dataset {path}")
    if prev is not None and mode == "create":
        raise FileExistsError(
            f"{path} exists (version {prev['version']}); use mode="
            "'append' or 'overwrite'"
        )
    fragments = list(new_fragments)
    if mode == "append" and prev is not None:
        base_schema = _schema_from_b64(prev["schema"])
        if not base_schema.equals(schema):
            raise ValueError("appended schema differs from dataset schema")
        fragments = prev["fragments"] + fragments
    version = (prev["version"] + 1) if prev is not None else 1
    _write_manifest(
        path,
        {
            "format": "lancelite",
            "version": version,
            "schema": _schema_to_b64(schema),
            "fragments": fragments,
        },
    )
    return version


def write_dataset(
    data,
    path: str,
    mode: str = "create",
    max_rows_per_file: int = 1 << 20,
    compression: str | None = "zstd",
) -> int:
    """Driver-side writer (pa.Table / pandas DataFrame / record-batch
    iterable). Splits into ≤max_rows_per_file fragments and commits one
    manifest. Returns the committed version."""
    if hasattr(data, "to_arrow"):  # duck-typed (e.g. polars)
        data = data.to_arrow()
    elif not isinstance(data, pa.Table):
        data = pa.Table.from_pandas(data, preserve_index=False)
    frags = []
    i = 0
    for off in range(0, max(data.num_rows, 1), max_rows_per_file):
        chunk = data.slice(off, max_rows_per_file)
        tag = uuid.uuid4().hex[:8]
        frags.append(
            write_fragment(
                chunk, path, f"frag-{tag}-{i:05d}-{chunk.num_rows}",
                compression,
            )
        )
        i += 1
    return commit(path, data.schema, frags, mode=mode)


def write_dataset_ray(
    ds,
    path: str,
    mode: str = "create",
    compression: str | None = "zstd",
) -> int:
    """Distributed two-phase write of a Ray Dataset: every BLOCK is
    written as one fragment in the task that holds it (no driver
    funnel); the driver receives only the tiny manifest entries and
    commits once. A failed run leaves orphan fragments and no manifest
    — rerunnable without cleanup."""
    tag = uuid.uuid4().hex[:8]

    def frag_writer(batch: pa.Table) -> pa.Table:
        name = f"frag-{tag}-{uuid.uuid4().hex[:12]}-{batch.num_rows}"
        entry = write_fragment(batch, path, name, compression)
        return pa.table(
            {
                "file": pa.array([entry["file"]], pa.string()),
                "rows": pa.array([entry["rows"]], pa.int64()),
                "bytes": pa.array([entry["bytes"]], pa.int64()),
            }
        )

    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    if not isinstance(base, pa.Schema):
        base = pa.Schema.from_pandas(
            __import__("pandas").DataFrame(
                {n: pa.array([], pa.string()) for n in base.names}
            )
        )
    entries = ds.map_batches(frag_writer, batch_format="pyarrow").take_all()
    frags = [
        {"file": e["file"], "rows": int(e["rows"]), "bytes": int(e["bytes"])}
        for e in entries
    ]
    return commit(path, base, frags, mode=mode)


class LanceliteDataset:
    """Read-side handle: schema/fragments from the manifest only — no
    fragment file is opened for planning."""

    def __init__(self, path: str, version: int | None = None):
        self.path = path
        self.manifest = _read_manifest(path, version)
        self.schema = _schema_from_b64(self.manifest["schema"])
        self.version = self.manifest["version"]

    @property
    def fragments(self) -> list[dict]:
        return self.manifest["fragments"]

    def versions(self) -> list[int]:
        vdir = os.path.join(self.path, _VERSIONS_DIR)
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(vdir)
            if f.endswith(".manifest.json")
        )

    def count_rows(self) -> int:
        return sum(f["rows"] for f in self.fragments)

    def fragment_path(self, frag: dict) -> str:
        return os.path.join(self.path, _FRAG_DIR, frag["file"])

    def read_fragment(
        self, frag: dict, columns: list[str] | None = None
    ) -> pa.Table:
        with ipc.open_file(self.fragment_path(frag)) as r:
            t = r.read_all()
        return t.select(columns) if columns else t

    def to_table(self, columns: list[str] | None = None) -> pa.Table:
        tabs = [self.read_fragment(f, columns) for f in self.fragments]
        if not tabs:
            s = self.schema
            if columns:
                s = pa.schema([s.field(c) for c in columns])
            return s.empty_table()
        return pa.concat_tables(tabs)


def dataset(path: str, version: int | None = None) -> LanceliteDataset:
    return LanceliteDataset(path, version)


def read_lancelite(path: str, columns: list[str] | None = None):
    """Distributed Ray Data scan: one read task per fragment, planned
    from the manifest alone (rows/bytes metadata feed the optimizer;
    `columns` prunes at the read). The fragment list shards naturally
    across a cluster — the same access pattern ray.data.read_lance
    would use."""
    import ray.data
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    dset = LanceliteDataset(path)
    schema = dset.schema
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])

    class _LanceliteDatasource(Datasource):
        def estimate_inmemory_data_size(self):
            return sum(f["bytes"] for f in dset.fragments)

        def get_read_tasks(self, parallelism: int):
            tasks = []
            for frag in dset.fragments:
                meta = BlockMetadata(
                    num_rows=frag["rows"],
                    size_bytes=frag["bytes"],
                    exec_stats=None,
                    input_files=[dset.fragment_path(frag)],
                )
                tasks.append(
                    ReadTask(
                        lambda f=frag: [dset.read_fragment(f, columns)],
                        meta,
                        schema=schema,
                    )
                )
            return tasks

    return ray.data.read_datasource(_LanceliteDatasource())
