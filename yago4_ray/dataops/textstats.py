"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting — all vectorized / compiled-regex map_batches
stages (regexes + stopword sets built once per actor)."""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
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


class TextStats:
    """Actor-pool stage computing all stats in one pass over a batch."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].astype(str)
        batch = batch.copy()
        batch["n_tokens"] = texts.map(token_count)
        batch["n_bpe_tokens"] = texts.map(bpe_ish_token_count)
        batch["lang_pred"] = texts.map(detect_language)
        batch["quality"] = texts.map(quality_score)
        batch["fingerprint"] = texts.map(fingerprint64).astype("uint64")
        return batch


def text_stats(ds: Dataset, text_col: str = "text",
               concurrency: int | tuple[int, int] = 4) -> Dataset:
    return ds.map_batches(
        TextStats,
        fn_constructor_args=(text_col,),
        batch_format="pandas",
        concurrency=concurrency,
    )
