"""Distributed join / lookup / dedup building blocks.

Two regimes, chosen explicitly per call site (SURVEY §2.4, ray_guide):

- **Broadcast**: the small side (URI mapping, instance sets, clean-value
  maps — reference state ST2-ST5) is `ray.put` once on the driver and
  resolved at most once per worker *process* via a module-level cache,
  then used as a vectorized pandas dict/set lookup per batch. No shuffle.
  At 100 TB these same call sites switch to the dataset path below by
  flipping `broadcast_threshold`.
- **Dataset hash join**: both sides large → `Dataset.join` (Ray's
  hash-partitioned join) with an explicit partition count.

Exact dedup of triples hash-partitions on the *full* (s,p,o) key, so hub
subjects (Q5-class entities) spread across partitions by construction —
no salting needed there. Group-bys keyed on subject alone (maxCount)
use `salted_group_filter` when a hot-key pre-pass finds skew.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

# Per-worker-process cache: a broadcast object is deserialized at most
# once per process regardless of how many tasks/batches touch it.
_BROADCAST_CACHE: dict[str, Any] = {}


def broadcast(obj: Any) -> "ray.ObjectRef":
    return ray.put(obj)


def get_broadcast(ref: "ray.ObjectRef") -> Any:
    key = ref.hex()
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


# ---------------------------------------------------------------------------
# Broadcast-side operations (vectorized per batch)
# ---------------------------------------------------------------------------

def map_column(
    ds: Dataset,
    column: str,
    mapping_ref: "ray.ObjectRef",
    drop_unmatched: bool = True,
) -> Dataset:
    """Dictionary semi-join + projection: rewrite `column` through a
    broadcast dict; rows without a mapping are dropped (the load-bearing
    filter semantics of map_key_to_yago / map_value_to_yago,
    plan.rs:2204-2223)."""

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        mapping = get_broadcast(mapping_ref)
        mapped = batch[column].map(mapping)
        if drop_unmatched:
            batch = batch[mapped.notna()]
            batch[column] = mapped[mapped.notna()]
        else:
            batch[column] = mapped.fillna(batch[column])
        return batch

    return ds.map_batches(apply, batch_format="pandas")


def semi_join(
    ds: Dataset,
    column: str,
    keys_ref: "ray.ObjectRef",
    anti: bool = False,
) -> Dataset:
    """Keep rows whose `column` is (not, for anti) in a broadcast key set
    (domain/range/best-rank filters, plan.rs:1074-1495)."""

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        keys = get_broadcast(keys_ref)
        mask = batch[column].isin(keys)
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(apply, batch_format="pandas")


# ---------------------------------------------------------------------------
# Dataset ⨝ Dataset
# ---------------------------------------------------------------------------

def default_join_partitions(cap: int | None = None) -> int:
    """Join partition count sized to the cluster: Ray's hash join spawns
    one aggregator actor per partition (each reserving CPU), so more
    partitions than cores STALLS a small session and wastes scheduling
    at any size. ~1 partition per 2 cores, clamped."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    n = max(2, cpus // 2)
    return min(n, cap) if cap else n


def hash_join(
    left: Dataset,
    right: Dataset,
    on: str | tuple[str, ...],
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> Dataset:
    """Hash-partitioned join of two Datasets on equal column names."""
    keys = (on,) if isinstance(on, str) else tuple(on)
    if num_partitions is None:
        num_partitions = default_join_partitions()
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=keys,
    )


# ---------------------------------------------------------------------------
# Dedup / grouped filters
# ---------------------------------------------------------------------------

_SEP = "\x00"


def distinct_rows(ds: Dataset, columns: list[str]) -> Dataset:
    """Exact distinct on `columns` via hash partition + per-group first
    (G6; SURVEY §2.7). The grouping key is the concatenation of all
    columns, so skewed single-column values don't skew partitions."""

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch[columns[0]].astype(str)
        for c in columns[1:]:
            key = key + _SEP + batch[c].astype(str)
        batch = batch.copy()
        batch["__key"] = key
        # per-batch pre-dedup shrinks the shuffle (combiner-style)
        return batch.drop_duplicates("__key")

    def first_per_group(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return (
        ds.map_batches(add_key, batch_format="pandas")
        .groupby("__key")
        .map_groups(first_per_group, batch_format="pandas")
        .drop_columns(["__key"])
    )


def group_filter_by_count(
    ds: Dataset,
    key_columns: list[str],
    max_count: int,
) -> Dataset:
    """Drop every row of any group with more than `max_count` rows —
    sh:maxCount enforcement discards the WHOLE group, it does not
    truncate (plan.rs:1141-1158)."""

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch[key_columns[0]].astype(str)
        for c in key_columns[1:]:
            key = key + _SEP + batch[c].astype(str)
        batch = batch.copy()
        batch["__key"] = key
        return batch

    def keep_small(group: pd.DataFrame) -> pd.DataFrame:
        return group if len(group) <= max_count else group.iloc[0:0]

    return (
        ds.map_batches(add_key, batch_format="pandas")
        .groupby("__key")
        .map_groups(keep_small, batch_format="pandas")
        .drop_columns(["__key"])
    )


def top_hot_keys(ds: Dataset, column: str, threshold: int) -> list[str]:
    """Pre-pass hot-key detector: values of `column` whose row count
    exceeds `threshold` (drives salting decisions)."""
    counts = ds.groupby(column).count()
    hot = counts.filter(lambda row: row["count()"] > threshold)
    return [row[column] for row in hot.take_all()]


def to_pandas(obj) -> pd.DataFrame:
    """Small-result materializer accepting Dataset / Table / DataFrame."""
    if isinstance(obj, Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj
