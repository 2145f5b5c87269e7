"""Driver-side graph algebra over small key→values edge maps.

The class taxonomy (P279 edges, shape graphs) is orders of magnitude
smaller than the instance data — even at full Wikidata scale it is a
few-hundred-k-edge graph that fits on the driver. Following the
reference (plan.rs:2250-2299) and SURVEY §2.7, closures and pruning run
as plain Python on the driver; only instance-scale relations stay
distributed.

An "edge map" here is `dict[str, list[str]]` (the reference's Multimap,
multimap.rs:6-8).
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterable


def edge_map(pairs: Iterable[tuple[str, str]]) -> dict[str, list[str]]:
    """Group (k, v) pairs into k → [v...] preserving duplicates
    (Multimap::from_iter semantics)."""
    out: dict[str, list[str]] = defaultdict(list)
    for k, v in pairs:
        out[k].append(v)
    return dict(out)


def invert(edges: dict[str, list[str]]) -> dict[str, list[str]]:
    return edge_map((v, k) for k, vs in edges.items() for v in vs)


def transitive_closure(
    seeds: Iterable[str], edges: dict[str, list[str]]
) -> set[str]:
    """All nodes reachable from `seeds` following `edges`; includes the
    seeds (plan.rs:2252-2268)."""
    closure = set(seeds)
    todo = list(closure)
    while todo:
        node = todo.pop()
        for nxt in edges.get(node, ()):
            if nxt not in closure:
                closure.add(nxt)
                todo.append(nxt)
    return closure


def transitive_closure_pairs(
    pairs: Iterable[tuple[str, str]], edges: dict[str, list[str]]
) -> dict[str, list[str]]:
    """Fixpoint of (k, v) ⨝ edges — every key keeps *all* reachable values
    (plan.rs:2272-2299)."""
    closure: dict[str, list[str]] = defaultdict(list)
    todo: list[tuple[str, str]] = []
    for k, v in pairs:
        if v not in closure[k]:
            closure[k].append(v)
            todo.append((k, v))
    while todo:
        key, value = todo.pop()
        values = closure[key]
        for nxt in edges.get(value, ()):
            if nxt not in values:
                values.append(nxt)
                todo.append((key, nxt))
    return dict(closure)


def filter_redundant_parents(
    child_to_parents: dict[str, list[str]],
    parent_to_children: dict[str, list[str]],
) -> dict[str, list[str]]:
    """Keep only minimal (child, parent) edges: drop a parent when one of
    its children is also one of the child's parents — the reference's
    'hacky filter' (plan.rs:617-638), replicated exactly, quirks
    included."""
    out: dict[str, list[str]] = {}
    for child, parents in child_to_parents.items():
        parent_set = set(parents)
        kept = [
            parent
            for parent in parents
            if not any(
                pc in parent_set for pc in parent_to_children.get(parent, ())
            )
        ]
        if kept:
            out[child] = kept
    return out


def join_pairs(
    left: Iterable[tuple[str, str]], right: dict[str, list[str]]
) -> Iterable[tuple[str, str, str]]:
    """Inner hash join (k, v1) ⨝ k→[v2] → (k, v1, v2) (plan.rs:2302-2311)."""
    for k, v1 in left:
        for v2 in right.get(k, ()):
            yield (k, v1, v2)
