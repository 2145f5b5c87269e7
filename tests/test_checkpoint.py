"""Checkpoint manifest + resume semantics."""

import json
import os

import ray.data

from yago4_ray import checkpoint as cp
from yago4_ray.sources import write_ntriples


def _triples_ds():
    import pandas as pd

    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "subject": ["<http://e/b>", "<http://e/a>"],
                "predicate": ["<http://e/p>", "<http://e/p>"],
                "object": ['"1"', '"2"'],
            }
        )
    )


def test_manifest_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "out")
    write_ntriples(_triples_ds(), out, lineage="abc123")
    manifest = cp.read_manifest(out)
    assert manifest is not None
    assert manifest["lineage"] == "abc123"
    assert manifest["num_rows"] == 2
    assert manifest["num_parts"] >= 1
    assert cp.is_complete(out, "abc123")
    # different lineage invalidates
    assert not cp.is_complete(out, "other")
    # missing part invalidates
    part = os.path.join(out, manifest["parts"][0])
    os.rename(part, part + ".gone")
    assert not cp.is_complete(out, "abc123")
    os.rename(part + ".gone", part)
    assert cp.is_complete(out, "abc123")


def test_lineage_sensitivity(tmp_path):
    root = tmp_path / "store" / "pred_key=x"
    root.mkdir(parents=True)
    (root / "f1.parquet").write_bytes(b"aaaa")
    l1 = cp.compute_lineage(str(tmp_path / "store"), ["v1"])
    (root / "f1.parquet").write_bytes(b"aaaabb")  # size change
    l2 = cp.compute_lineage(str(tmp_path / "store"), ["v1"])
    l3 = cp.compute_lineage(str(tmp_path / "store"), ["v2"])  # token change
    assert l1 != l2 and l2 != l3


def test_sorted_deterministic_output(ray_session, tmp_path):
    import glob
    import gzip

    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    write_ntriples(_triples_ds(), out1)
    write_ntriples(_triples_ds(), out2)

    def lines(d):
        return [
            line
            for f in sorted(glob.glob(d + "/*.nt.gz"))
            for line in gzip.open(f, "rt")
        ]

    a, b = lines(out1), lines(out2)
    assert a == b
    assert a == sorted(a)  # subject-sorted


def test_rewrite_clears_stale_parts(ray_session, tmp_path):
    """A rewrite that produces fewer parts than a previous run must not
    leave stale part files behind (they would corrupt the output)."""
    import glob

    out = str(tmp_path / "stale")
    write_ntriples(_triples_ds(), out, lineage="L1")
    # plant a fake stale part from an imaginary earlier, wider run
    stale = os.path.join(out, "part-99999.nt.gz")
    import gzip

    with gzip.open(stale, "wt") as f:
        f.write("<http://stale> <http://stale> <http://stale> .\n")
    write_ntriples(_triples_ds(), out, lineage="L2")
    parts = sorted(os.path.basename(p) for p in glob.glob(out + "/*.nt.gz"))
    assert "part-99999.nt.gz" not in parts
    manifest = cp.read_manifest(out)
    assert manifest["lineage"] == "L2"
    assert set(manifest["parts"]) == set(parts)
