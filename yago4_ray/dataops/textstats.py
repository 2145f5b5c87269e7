"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting.

Two faces of the same semantics:

- per-row reference kernels (`token_count` … `fingerprint64`) — the
  readable contract, used by the parity tests as the oracle;
- the batch kernel `stats_frame` the `TextStats` stage actually runs —
  Arrow compute (RE2 count/replace/split kernels, dictionary-encoded
  token hashing) + numpy segment reductions over the flattened token
  stream. One regex pass per column per BATCH instead of five Python
  regex calls per row (cf. PERF_NOTES #14: Arrow kernels beat both the
  row loop and pandas `.str` on this shape of data).

RE2 (`pyarrow.compute`) and Python `re` agree on every pattern used
here except the whitespace class: Python's `\\s` is Unicode-aware,
RE2's is ASCII. Token splits therefore go through Arrow's
`utf8_split_whitespace` (Unicode, identical to Python `\\S+` runs);
the BPE/punct classes keep RE2 semantics and the parity test pins
them against the Python kernels over the full synthetic corpus."""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_WORD_RE = re.compile(r"[a-zA-ZÀ-ÿ]+")
_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^\w\s]")
# BPE-ish subword split: words, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-zÀ-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÿ0-9]")

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "was", "that", "for",
           "it", "with", "as", "his", "on", "be", "at", "by", "an"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit",
           "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "du",
           "dans", "est", "que", "qui", "pour", "sur", "au", "pas", "plus"},
    "es": {"el", "la", "los", "las", "de", "y", "en", "un", "una", "del",
           "que", "es", "por", "con", "para", "su", "al", "se", "no"},
}


def token_count(text: str) -> int:
    return len(_TOKEN_RE.findall(text))


def bpe_ish_token_count(text: str) -> int:
    return len(_BPE_RE.findall(text))


def detect_language(text: str) -> str:
    """N-gram-free stopword-voting heuristic; 'und' for undetermined."""
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und"
    scores = {
        lang: sum(w in sw for w in words) for lang, sw in STOPWORDS.items()
    }
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0 else "und"


def quality_score(text: str) -> float:
    """[0, 1] heuristic: length, punctuation ratio, stopword ratio, mean
    word length — the classic cheap pre-filters for web text."""
    n_chars = len(text)
    if n_chars == 0:
        return 0.0
    words = [w.lower() for w in _WORD_RE.findall(text)]
    n_words = len(words)
    if n_words == 0:
        return 0.0
    punct_ratio = len(_PUNCT_RE.findall(text)) / n_chars
    all_stop = set().union(*STOPWORDS.values())
    stop_ratio = sum(w in all_stop for w in words) / n_words
    mean_len = sum(len(w) for w in words) / n_words
    score = 1.0
    score *= min(1.0, n_words / 20.0)           # too short
    score *= 1.0 - min(1.0, max(0.0, punct_ratio - 0.12) * 4)  # punct soup
    score *= min(1.0, 0.15 + stop_ratio * 3)    # no stopwords = not prose
    score *= 1.0 - min(1.0, max(0.0, mean_len - 9) / 6)        # gibberish words
    return round(float(score), 6)


def fingerprint64(text: str, window: int = 8) -> int:
    """Rolling-hash document fingerprint: min crc32 over token windows
    (winnowing-style), combined into 64 bits."""
    tokens = _TOKEN_RE.findall(text.lower())
    if not tokens:
        return 0
    hashes = [zlib.crc32(t.encode("utf-8")) for t in tokens]
    if len(hashes) <= window:
        lo = min(hashes)
        hi = max(hashes)
        return (hi << 32) | lo
    mins = []
    for i in range(len(hashes) - window + 1):
        mins.append(min(hashes[i:i + window]))
    return (min(mins) << 32) | (zlib.crc32(np.asarray(mins, dtype="<u4").tobytes()) & 0xFFFFFFFF)


# RE2 forms of the Python class patterns above (see module docstring).
# Python's \s is Unicode-aware; RE2's is ASCII — negated classes add
# \p{Z} + NEL + the \x1c-\x1f separators so Unicode spaces don't leak
# into the symbol/punct branches.
_PY_WS_EXTRA = "\\p{Z}\x85\x1c-\x1f"
_RE2_BPE = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^\s" + _PY_WS_EXTRA + r"A-Za-zÀ-ÿ0-9]"
# Python `\w` on str is Unicode letters/digits/underscore → \p{L}\p{N}_
_RE2_PUNCT = r"[^\p{L}\p{N}_\s" + _PY_WS_EXTRA + "]"
_RE2_NONWORD_RUN = r"[^a-zA-ZÀ-ÿ]+"

_LANGS = sorted(STOPWORDS)
_LANG_SETS = [pa.array(sorted(STOPWORDS[l])) for l in _LANGS]
_ALL_STOP = pa.array(sorted(set().union(*STOPWORDS.values())))


def _segment_sum(values: np.ndarray, parents: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(parents, weights=values, minlength=n)


def _word_lists(arr: pa.Array) -> pa.Array:
    """Per-doc lowercase word lists, identical to
    `[w.lower() for w in _WORD_RE.findall(text)]` (word runs survive
    the replace; lowercase AFTER the class match, as the kernels do)."""
    spaced = pc.replace_substring_regex(arr, _RE2_NONWORD_RUN, " ")
    return pc.utf8_split_whitespace(pc.utf8_trim_whitespace(pc.utf8_lower(spaced)))


def _flatten(list_arr: pa.Array, n: int):
    """(per-doc counts, flat tokens, parent doc index per token) with
    the `['']` artifact a whitespace-only doc leaves after trim+split
    removed."""
    flat = pc.list_flatten(list_arr)
    parents = pc.list_parent_indices(list_arr).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not mask.all():
        flat = flat.filter(pa.array(mask))
        parents = parents[mask]
    counts = (
        np.bincount(parents, minlength=n)
        if len(parents)
        else np.zeros(n, dtype=np.int64)
    )
    return counts.astype(np.int64), flat, parents


def _fingerprints(
    lengths: np.ndarray,
    flat: pa.Array,
    parents: np.ndarray,
    n: int,
    window: int = 8,
) -> np.ndarray:
    """Vectorized fingerprint64 over per-doc token lists: crc32 once per
    DISTINCT token (dictionary encoding), ONE sliding-window-min pass
    over the whole flattened hash stream (windows crossing a doc
    boundary are simply never read — each doc slices its own range),
    per-doc min/max via segment reductions. The only per-doc Python
    work left is one crc32 digest call for docs longer than `window`."""
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = enc.dictionary.to_pylist()
    crc_uniq = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in uniq),
        dtype=np.uint32,
        count=len(uniq),
    )
    idx = enc.indices.to_numpy(zero_copy_only=False)
    hashes = crc_uniq[idx] if len(idx) else np.zeros(0, dtype=np.uint32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    docmin = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    docmax = np.zeros(n, dtype=np.uint32)
    if len(hashes):
        np.minimum.at(docmin, parents, hashes)
        np.maximum.at(docmax, parents, hashes)
    flatmins = (
        np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
        if len(hashes) >= window
        else np.zeros(0, dtype=np.uint32)
    )

    out = np.zeros(n, dtype=np.uint64)
    short = (lengths > 0) & (lengths <= window)
    out[short] = (docmax[short].astype(np.uint64) << np.uint64(32)) | docmin[
        short
    ].astype(np.uint64)
    for i in np.nonzero(lengths > window)[0]:
        mins = flatmins[offsets[i]:offsets[i + 1] - window + 1]
        digest = zlib.crc32(mins.astype("<u4").tobytes()) & 0xFFFFFFFF
        out[i] = (np.uint64(mins.min()) << np.uint64(32)) | np.uint64(digest)
    return out


def stats_frame(texts: pd.Series) -> dict[str, np.ndarray]:
    """All five stats for a batch of texts, column-at-a-time."""
    arr = pa.array(texts, type=pa.string())
    n = len(arr)

    # token counts: Unicode-whitespace splits == Python \S+ runs
    lower = pc.utf8_lower(arr)
    tok_lists = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(lower))
    n_tokens, tok_flat, tok_parents = _flatten(tok_lists, n)
    n_bpe = pc.count_substring_regex(arr, _RE2_BPE).to_numpy(zero_copy_only=False)

    # word stream (lang-ID + quality share it)
    words = _word_lists(arr)
    n_words, flat, parents = _flatten(words, n)

    # language vote: per-language stopword hits per doc; first max in
    # sorted-language order wins (== max(sorted(scores), key=scores.get))
    scores = np.zeros((len(_LANGS), n), dtype=np.int64)
    for row, value_set in enumerate(_LANG_SETS):
        hits = pc.is_in(flat, value_set=value_set).to_numpy(zero_copy_only=False)
        if hits.any():
            scores[row] = np.bincount(parents[hits], minlength=n)
    best = np.argmax(scores, axis=0)
    best_score = scores[best, np.arange(n)]
    lang_pred = np.where(
        (best_score > 0) & (n_words > 0), np.array(_LANGS)[best], "und"
    )

    # quality score (vectorized form of quality_score above)
    n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = pc.count_substring_regex(arr, _RE2_PUNCT).to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    stop_hits = pc.is_in(flat, value_set=_ALL_STOP).to_numpy(zero_copy_only=False)
    n_stop = (
        np.bincount(parents[stop_hits], minlength=n)
        if stop_hits.any()
        else np.zeros(n)
    )
    word_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    len_sum = _segment_sum(word_lens, parents, n)
    with np.errstate(divide="ignore", invalid="ignore"):
        punct_ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
        stop_ratio = np.where(n_words > 0, n_stop / n_words, 0.0)
        mean_len = np.where(n_words > 0, len_sum / n_words, 0.0)
    score = (
        np.minimum(1.0, n_words / 20.0)
        * (1.0 - np.minimum(1.0, np.maximum(0.0, punct_ratio - 0.12) * 4))
        * np.minimum(1.0, 0.15 + stop_ratio * 3)
        * (1.0 - np.minimum(1.0, np.maximum(0.0, mean_len - 9) / 6))
    )
    score = np.where((n_chars > 0) & (n_words > 0), np.round(score, 6), 0.0)

    return {
        "n_tokens": n_tokens.astype(np.int64),
        "n_bpe_tokens": n_bpe.astype(np.int64),
        "lang_pred": lang_pred,
        "quality": score,
        "fingerprint": _fingerprints(n_tokens, tok_flat, tok_parents, n),
    }


class TextStats:
    """Actor-pool stage computing all stats in one Arrow/numpy pass per
    batch (see `stats_frame`; per-row kernels above are the oracle)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].astype(str)
        batch = batch.copy()
        for col, values in stats_frame(texts).items():
            batch[col] = values
        batch["fingerprint"] = batch["fingerprint"].astype("uint64")
        return batch


def text_stats(ds: Dataset, text_col: str = "text",
               concurrency: int | tuple[int, int] | None = None) -> Dataset:
    # plain tasks: TextStats carries no per-actor state (the regexes
    # are module-level compiled once per worker process) — the actor
    # pool paid ~1.5 s startup to front sub-second vectorized kernels
    # at bench scale (same finding as the minhasher, PERF_NOTES #41).
    # An int `concurrency` still caps concurrent tasks; the old
    # autoscaling tuple maps to "no cap".
    return ds.map_batches(
        TextStats(text_col),
        batch_format="pandas",
        concurrency=None if isinstance(concurrency, tuple) else concurrency,
    )
