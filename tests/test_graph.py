"""Driver-side graph algebra tests (closures, redundant-edge pruning)."""

from yago4_ray import graph as G


def test_transitive_closure():
    edges = G.edge_map([("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])
    assert G.transitive_closure(["a"], edges) == {"a", "b", "c", "d"}
    assert G.transitive_closure(["x"], edges) == {"x", "y"}
    assert G.transitive_closure([], edges) == set()
    # cycles terminate
    cyc = G.edge_map([("a", "b"), ("b", "a")])
    assert G.transitive_closure(["a"], cyc) == {"a", "b"}


def test_transitive_closure_pairs():
    edges = G.edge_map([("b", "c"), ("c", "d")])
    out = G.transitive_closure_pairs([("k", "b")], edges)
    assert sorted(out["k"]) == ["b", "c", "d"]


def test_filter_redundant_parents():
    # child → parents: z has both direct parent 'mid' and grandparent 'top'
    child_to_parents = G.edge_map([("z", "mid"), ("z", "top"), ("mid", "top")])
    parent_to_children = G.invert(child_to_parents)
    out = G.filter_redundant_parents(child_to_parents, parent_to_children)
    # 'top' is dropped for z because mid (a child of top) is also z's parent
    assert out["z"] == ["mid"]
    assert out["mid"] == ["top"]


def test_join_pairs():
    right = G.edge_map([("k1", "x"), ("k1", "y")])
    out = list(G.join_pairs([("k1", "v"), ("k2", "v2")], right))
    assert ("k1", "v", "x") in out and ("k1", "v", "y") in out
    assert len(out) == 2
