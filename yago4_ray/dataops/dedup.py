"""Deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shuffle discipline (ray_guide / SURVEY §7.3):
- exact dedup hash-partitions on the *content hash* — uniform by
  construction, hub keys can't skew it;
- MinHash/SimHash explode to (band_id, band_hash) rows and group on the
  band key — band hashes are uniform; candidate verification happens
  inside the band group, clusters close with min-label propagation;
- embedding near-dup buckets by seeded random-hyperplane LSH, pairwise
  cosine only within buckets.

All hashes are process-independent (crc32/blake2, never Python hash()).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
from ray.data import Dataset

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def content_hash(text: str) -> str:
    return hashlib.blake2b(text.encode("utf-8"), digest_size=16).hexdigest()


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: Dataset, text_col: str, id_col: str
) -> Dataset:
    """One representative row (min id) per distinct text.
    Returns (id_col, n_dupes). Combiner per batch, then one groupby on
    the 128-bit content hash."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "__h": batch[text_col].map(content_hash),
                id_col: batch[id_col],
            }
        )
        # per-batch partial: keep min id + count per hash (combiner)
        return out.groupby("__h", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_dupes": (id_col, "size")}
        )

    def reduce_part(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.groupby("__h", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_dupes": ("n_dupes", "sum")}
        )[[id_col, "n_dupes"]]

    from ..joins import partitioned_group_apply

    return partitioned_group_apply(
        ds.map_batches(add_hash, batch_format="pandas"), ["__h"], reduce_part
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def shingles(text: str, k: int = 5) -> np.ndarray:
    """crc32 hashes of character k-shingles of the lowercased text."""
    t = " ".join(text.lower().split())
    if len(t) < k:
        t = t.ljust(k)
    vals = {zlib.crc32(t[i:i + k].encode("utf-8")) for i in range(len(t) - k + 1)}
    return np.fromiter(vals, dtype=np.int64, count=len(vals))


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 5) -> np.ndarray:
    sh = shingles(text, k)
    # (num_perm, n_shingles) universal hashing, min over shingles
    h = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
    return h.min(axis=1)


class MinHasher:
    """Actor-pool stage: hash params built once per actor."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int,
                 shingle_k: int, seed: int):
        self.text_col = text_col
        self.id_col = id_col
        self.a, self.b = _minhash_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"band": [], "doc": []}
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            sig = minhash_signature(str(text), self.a, self.b, self.shingle_k)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                band_hash = hashlib.blake2b(
                    chunk.tobytes() + band.to_bytes(2, "little"), digest_size=8
                ).hexdigest()
                out["band"].append(band_hash)
                out["doc"].append(doc_id)
        return pd.DataFrame(out)


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    concurrency: int | tuple[int, int] = 4,
) -> Dataset:
    """Candidate near-duplicate pairs (a, b) with a < b, deduplicated.
    shingle→minhash→band rows→groupby(band)→within-band pairs."""
    banded = ds.map_batches(
        MinHasher,
        fn_constructor_args=(text_col, id_col, num_perm, bands, shingle_k, seed),
        batch_format="pandas",
        concurrency=concurrency,
    )

    def pairs_in_part(pdf: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, docs in pdf.groupby("band")["doc"]:
            uniq = sorted(set(docs))
            if len(uniq) < 2 or len(uniq) > 1000:  # degenerate band guard
                continue
            for i in range(len(uniq)):
                for j in range(i + 1, len(uniq)):
                    out_a.append(uniq[i])
                    out_b.append(uniq[j])
        return pd.DataFrame({"a": out_a, "b": out_b}).drop_duplicates()

    from ..joins import distinct_rows, partitioned_group_apply

    pairs = partitioned_group_apply(banded, ["band"], pairs_in_part)
    # dedupe pairs found in multiple bands
    return distinct_rows(pairs, ["a", "b"])


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """ Verification kernel for candidate pairs."""
    sa = set(shingles(text_a, k).tolist())
    sb = set(shingles(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup(
    ds: Dataset,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    **kwargs,
) -> Dataset:
    """Full near-dup pipeline → (id, cluster) rows for docs in clusters.
    Candidates are verified with true n-gram Jaccard (broadcast text
    lookup — the text side must fit; at scale verify via a join instead),
    then clustered with iterative min-label propagation."""
    import ray

    pairs = minhash_lsh_pairs(ds, text_col, id_col, **kwargs)
    texts_ref = ray.put(
        dict(zip(*[ds.to_pandas()[c] for c in (id_col, text_col)]))
    )
    from ..joins import get_broadcast

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        texts = get_broadcast(texts_ref)
        keep_a, keep_b = [], []
        for a, b in zip(batch["a"], batch["b"]):
            if ngram_jaccard(str(texts.get(a, "")), str(texts.get(b, ""))) >= threshold:
                keep_a.append(a)
                keep_b.append(b)
        return pd.DataFrame({"a": keep_a, "b": keep_b})

    verified = pairs.map_batches(verify, batch_format="pandas").to_pandas()
    # min-label propagation on the driver: candidate graph is tiny
    # relative to the corpus (near-dup edges only)
    label: dict = {}
    for a, b in zip(verified["a"], verified["b"]):
        label.setdefault(a, a)
        label.setdefault(b, b)

    def find(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x

    for a, b in zip(verified["a"], verified["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted([ra, rb])
            label[hi] = lo
    rows = sorted((doc, find(doc)) for doc in label)
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame({id_col: [r[0] for r in rows], "cluster": [r[1] for r in rows]})
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over crc32 token hashes."""
    acc = np.zeros(64, dtype=np.int64)
    for token in _TOKEN_RE.findall(text.lower()):
        h = zlib.crc32(token.encode("utf-8"))
        h = (h << 32) | zlib.crc32(token[::-1].encode("utf-8"))
        bits = np.unpackbits(
            np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = np.uint64(0)
    for i, v in enumerate(acc):
        if v > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_dedup_pairs(
    ds: Dataset, text_col: str, id_col: str, max_hamming: int = 3
) -> Dataset:
    """Near-dup pairs by SimHash: 4×16-bit bands (any pair within
    hamming ≤ 3 shares at least one exact band), verify hamming in-band."""

    def add_bands(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"band": [], "doc": [], "sim": []}
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            sh = simhash64(str(text))
            for band in range(4):
                part = (sh >> (16 * band)) & 0xFFFF
                out["band"].append(f"{band}:{part:04x}")
                out["doc"].append(doc_id)
                out["sim"].append(sh)
        return pd.DataFrame(out)

    def pairs_in_part(pdf: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in pdf.groupby("band"):
            rows = sorted(set(zip(grp["doc"], grp["sim"])))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    if bin(rows[i][1] ^ rows[j][1]).count("1") <= max_hamming:
                        out_a.append(rows[i][0])
                        out_b.append(rows[j][0])
        return pd.DataFrame({"a": out_a, "b": out_b}).drop_duplicates()

    from ..joins import distinct_rows, partitioned_group_apply

    return distinct_rows(
        partitioned_group_apply(
            ds.map_batches(add_bands, batch_format="pandas"),
            ["band"],
            pairs_in_part,
        ),
        ["a", "b"],
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup_pairs(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
) -> Dataset:
    """Near-dup pairs by cosine ≥ threshold. Seeded hyperplane-LSH
    buckets, exact cosine inside buckets (numpy matmul per group)."""
    import ray

    # probe dim from one row
    first = ds.take(1)[0][vec_col]
    dim = len(first)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes)).astype(np.float32)
    planes_ref = ray.put(planes)
    from ..joins import get_broadcast

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        pl = get_broadcast(planes_ref)
        mat = np.stack(batch[vec_col].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        bits = (mat @ pl) > 0
        keys = [
            "".join("1" if b else "0" for b in row) for row in bits
        ]
        return pd.DataFrame(
            {"bucket": keys, "id": batch[id_col],
             "vec": [v.tobytes() for v in mat]}
        )

    def pairs_in_part(pdf: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        for _, group in pdf.groupby("bucket"):
            if len(group) < 2 or len(group) > 2000:
                continue
            ids = group["id"].to_numpy()
            mat = np.stack(
                [np.frombuffer(v, dtype=np.float32) for v in group["vec"]]
            )
            sims = mat @ mat.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            for i, j in zip(ii, jj):
                if ids[i] != ids[j]:
                    a, b = sorted([ids[i], ids[j]])
                    out_a.append(a)
                    out_b.append(b)
                    out_c.append(float(sims[i, j]))
        return pd.DataFrame({"a": out_a, "b": out_b, "cosine": out_c})

    from ..joins import distinct_rows, partitioned_group_apply

    return distinct_rows(
        partitioned_group_apply(
            ds.map_batches(bucket, batch_format="pandas"),
            ["bucket"],
            pairs_in_part,
        ),
        ["a", "b"],
    )
