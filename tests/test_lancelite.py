"""lancelite: the from-scratch Lance dataset layout — versioned
manifests, immutable fragments, atomic commit, distributed two-phase
writes, fragment-parallel Ray reads with column pruning."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from yago4_ray import lancelite


def _table(n=100, offset=0):
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(offset, offset + n)]),
            "x": pa.array(list(range(offset, offset + n)), pa.int64()),
        }
    )


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.lance")
    v = lancelite.write_dataset(_table(250), path, max_rows_per_file=100)
    assert v == 1
    ds = lancelite.dataset(path)
    assert ds.count_rows() == 250
    assert len(ds.fragments) == 3  # 100+100+50
    got = ds.to_table()
    assert got.equals(_table(250))
    # column pruning
    only_x = ds.to_table(columns=["x"])
    assert only_x.column_names == ["x"] and only_x.num_rows == 250


def test_versioned_append_and_overwrite(tmp_path):
    path = str(tmp_path / "t.lance")
    lancelite.write_dataset(_table(10), path)
    lancelite.write_dataset(_table(5, offset=10), path, mode="append")
    ds = lancelite.dataset(path)
    assert ds.version == 2 and ds.count_rows() == 15
    # time travel: version 1 still readable
    v1 = lancelite.dataset(path, version=1)
    assert v1.count_rows() == 10
    assert ds.versions() == [1, 2]
    # create over existing refuses; overwrite replaces
    with pytest.raises(FileExistsError):
        lancelite.write_dataset(_table(1), path)
    lancelite.write_dataset(_table(3), path, mode="overwrite")
    assert lancelite.dataset(path).count_rows() == 3
    # schema mismatch on append refuses
    with pytest.raises(ValueError):
        lancelite.commit(
            path, pa.schema([("y", pa.float64())]), [], mode="append"
        )


def test_ray_distributed_write_and_read(ray_session, tmp_path):
    path = str(tmp_path / "big.lance")
    src = ray.data.from_pandas(
        [
            pd.DataFrame({"doc_id": [f"d{i}", f"e{i}"], "x": [i, -i]})
            for i in range(6)
        ]
    )
    lancelite.write_dataset_ray(src, path)
    ds = lancelite.dataset(path)
    assert ds.count_rows() == 12
    assert len(ds.fragments) >= 1
    out = lancelite.read_lancelite(path).to_pandas()
    assert sorted(out["doc_id"]) == sorted(
        [f"d{i}" for i in range(6)] + [f"e{i}" for i in range(6)]
    )
    pruned = lancelite.read_lancelite(path, columns=["x"])
    assert pruned.to_pandas().columns.tolist() == ["x"]


def test_is_lancelite_detection(tmp_path):
    path = str(tmp_path / "t.lance")
    assert not lancelite.is_lancelite(path)
    lancelite.write_dataset(_table(1), path)
    assert lancelite.is_lancelite(path)
    # a bare directory with random files is not a dataset
    other = tmp_path / "not.lance"
    other.mkdir()
    (other / "junk").write_text("x")
    assert not lancelite.is_lancelite(str(other))


def test_empty_table_roundtrip(tmp_path):
    path = str(tmp_path / "empty.lance")
    lancelite.write_dataset(_table(0), path)
    ds = lancelite.dataset(path)
    assert ds.count_rows() == 0
    assert ds.to_table().schema.equals(_table(0).schema)


def test_interleaved_spans_schema(tmp_path):
    """The input_hint schema — doc_id + spans list<struct> with binary
    media refs — roundtrips bit-exactly through fragments."""
    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "spans": pa.array(
                [
                    [
                        {"kind": "text", "text": "hi", "media_ref": "",
                         "offset": 0},
                        {"kind": "media", "text": "",
                         "media_ref": "img://1", "offset": 1},
                    ],
                    [],
                ],
                span_type,
            ),
            "payload": pa.array([b"\x00\x01", None], pa.binary()),
        }
    )
    path = str(tmp_path / "spans.lance")
    lancelite.write_dataset(t, path)
    assert lancelite.dataset(path).to_table().equals(t)


def test_atomic_commit_invisible_fragments(tmp_path):
    """Fragments without a committed manifest are invisible — the
    resumability contract (a crashed write never corrupts a dataset)."""
    path = str(tmp_path / "t.lance")
    lancelite.write_dataset(_table(10), path)
    # simulate a crashed writer: orphan fragment, no commit
    lancelite.write_fragment(_table(99), path, "frag-orphan-0-99")
    ds = lancelite.dataset(path)
    assert ds.count_rows() == 10
    assert ds.to_table().equals(_table(10))


def test_ray_append_and_time_travel(ray_session, tmp_path):
    """Distributed two-phase append: a second write_dataset_ray with
    mode="append" commits a new version whose manifest unions the old
    fragments with the new — and version N-1 stays readable with its
    original row count (time travel)."""
    path = str(tmp_path / "tt.lance")
    first = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [f"d{i}" for i in range(8)], "x": list(range(8))})
    )
    lancelite.write_dataset_ray(first, path)
    ds1 = lancelite.dataset(path)
    assert ds1.version == 1 and ds1.count_rows() == 8

    extra = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [f"e{i}" for i in range(3)], "x": [10, 11, 12]})
    )
    v = lancelite.write_dataset_ray(extra, path, mode="append")
    assert v == 2
    ds2 = lancelite.dataset(path)
    assert ds2.version == 2 and ds2.count_rows() == 11
    # N-1 still readable with the ORIGINAL row count
    old = lancelite.dataset(path, version=1)
    assert old.count_rows() == 8
    assert sorted(old.to_table()["doc_id"].to_pylist()) == sorted(
        f"d{i}" for i in range(8)
    )
    # the Ray read path sees the latest version
    got = lancelite.read_lancelite(path).to_pandas()
    assert len(got) == 11 and got["x"].sum() == sum(range(8)) + 33
