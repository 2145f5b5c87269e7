"""Driver contract for the yago4_ray engine.

The driver initialises Ray BEFORE importing this module; nothing here
(or in the library) calls ray.init()/ray.shutdown().

- entry(): flagship pipeline — deterministic interleaved corpus →
  mention-detection/linking actor pool → predicate-partitioned
  statement store → shape-driven KG build → facts Dataset.
- queries(): one entry per implemented operator family (SURVEY.md §2 +
  the training-data ops); each takes sf_dir.
- oracle_sql(): DuckDB equivalents for the SQL-expressible queries;
  KG/dedup/similarity entries are rows-only (their correctness gate is
  the pytest golden oracle in tests/oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship on sf0.001-scale: extract → store → build → facts."""
    from yago4_ray.queries import kg_facts

    return kg_facts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from yago4_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from yago4_ray.queries import SQL_ORACLES

    return dict(SQL_ORACLES)
