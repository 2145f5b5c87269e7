"""copartition_join / distinct_rows exchange-format levers: the
hash-keyed (128-bit digest) and dictionary-encoded forms must be
row-set-identical to the plain string-keyed exchange on every shape
that occurs at the call sites (PERF_NOTES #38)."""

import numpy as np
import pandas as pd
import pytest


def _ray_ds(df):
    import ray.data

    return ray.data.from_pandas(df)


@pytest.fixture(scope="module")
def join_inputs(ray_session):
    rng = np.random.default_rng(7)
    n = 5_000
    cfgs = [f"c{i}_P{i}" for i in range(40)]
    left = pd.DataFrame(
        {
            "cfg": rng.choice(cfgs, n),
            "statement": [
                f"<http://www.wikidata.org/entity/statement/Q{i % 1800}-{i % 7}>"
                for i in range(n)
            ],
            "subject": [f"<http://ex.org/s{i % 900}>" for i in range(n)],
        }
    ).drop_duplicates(["cfg", "statement"])
    # right covers ~60% of left keys plus keys absent from left
    right = left.sample(frac=0.6, random_state=3)[["cfg", "statement"]].copy()
    right["object"] = [f"<http://ex.org/o{i}>" for i in range(len(right))]
    right["extras"] = ""
    extra = pd.DataFrame(
        {
            "cfg": ["c1_P1"] * 50,
            "statement": [f"<http://ex.org/missing{i}>" for i in range(50)],
            "object": "x",
            "extras": "",
        }
    )
    right = pd.concat([right, extra], ignore_index=True)
    return left, right


def _canon(df, cols):
    return set(map(tuple, df[cols].itertuples(index=False)))


def test_hash_keyed_join_matches_plain(join_inputs):
    from yago4_ray.joins import copartition_join

    left, right = join_inputs
    plain = copartition_join(
        _ray_ds(left),
        _ray_ds(right),
        on=("cfg", "statement"),
        left_cols=["cfg", "statement", "subject"],
        right_cols=["cfg", "statement", "object", "extras"],
        num_parts=8,
    ).to_pandas()
    hashed = copartition_join(
        _ray_ds(left),
        _ray_ds(right),
        on=("cfg", "statement"),
        left_cols=["cfg", "statement", "subject"],
        right_cols=["object", "extras"],
        num_parts=8,
        hash_keys=True,
        dict_columns=["cfg"],
    ).to_pandas()
    cols = ["cfg", "statement", "subject", "object", "extras"]
    assert _canon(hashed, cols) == _canon(plain, cols)
    assert len(hashed) == len(plain)


def test_hash_keyed_semi_join(join_inputs):
    """right_cols=[] — the build_dist semi-join form: output rows are
    exactly the left rows whose key exists on the (unique-keyed) right."""
    from yago4_ray.joins import copartition_join

    left, right = join_inputs
    members = right.drop_duplicates(["cfg", "statement"])
    got = copartition_join(
        _ray_ds(left),
        _ray_ds(members),
        on=("cfg", "statement"),
        left_cols=["cfg", "statement", "subject"],
        right_cols=[],
        num_parts=8,
        hash_keys=True,
    ).to_pandas()
    keys = set(map(tuple, members[["cfg", "statement"]].itertuples(index=False)))
    want = left[
        [t in keys for t in map(tuple, left[["cfg", "statement"]].itertuples(index=False))]
    ]
    cols = ["cfg", "statement", "subject"]
    assert _canon(got, cols) == _canon(want, cols)
    assert len(got) == len(want)


def test_hash_keys_rejects_shared_columns(join_inputs):
    from yago4_ray.joins import copartition_join

    left, right = join_inputs
    with pytest.raises(AssertionError, match="both sides"):
        copartition_join(
            _ray_ds(left),
            _ray_ds(right),
            on=("cfg", "statement"),
            left_cols=["cfg", "statement", "subject"],
            right_cols=["cfg", "statement", "object", "extras"],
            hash_keys=True,
        )


def test_distinct_rows_dict_columns(ray_session):
    from yago4_ray.joins import distinct_rows

    rng = np.random.default_rng(11)
    n = 20_000
    df = pd.DataFrame(
        {
            "subject": [f"<http://ex.org/s{i % 500}>" for i in range(n)],
            "predicate": rng.choice(
                [f"<http://schema.org/p{i}>" for i in range(12)], n
            ),
            "object": [f"v{i % 700}" for i in range(n)],
        }
    )
    plain = distinct_rows(
        _ray_ds(df), ["subject", "predicate", "object"], num_parts=6
    ).to_pandas()
    dicted = distinct_rows(
        _ray_ds(df),
        ["subject", "predicate", "object"],
        num_parts=6,
        dict_columns=["predicate"],
    ).to_pandas()
    cols = ["subject", "predicate", "object"]
    assert _canon(dicted, cols) == _canon(plain, cols)
    assert len(dicted) == len(plain)
    # the dictionary must not leak: output is plain string typed
    assert dicted["predicate"].dtype == object
