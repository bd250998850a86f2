"""Text-analysis kernels for the large-scale training-data pipeline ops.

These extend the crawler with the document-pipeline operators a 100 TB
training-data job needs (dedup inputs, quality filtering, language routing).
They have no reference analog (the Go crawler treats bodies as opaque strings,
/root/reference/pkg/infrastructure/http/fetcher.go:95); they are first-class
additions per the driver brief.

Every kernel is Series-vectorized and intentionally SQL-mirrorable so the
DuckDB oracle in ``__spark_entry__.py`` can verify it exactly:

* token_count   — whitespace tokenization, ``size(split(trim(s), '\\s+'))``.
* quality_score — stopword-ratio & length heuristics, rounded to 4 dp.
* lang_id       — argmax of per-language stopword hits, deterministic
  tie-break by language code.
* fingerprint64 — polynomial rolling hash over UTF-8 bytes mod 2^61-1
  (Rabin-Karp style); exact integer arithmetic, reproducible anywhere.
* shingles / minhash / simhash helpers for the dedup operators in
  ``operators/dedup.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# deterministic tiny stopword sets; ORDER of _LANGS is the tie-break order
_LANGS: tuple[str, ...] = ("de", "en", "es", "fr")
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "for", "on", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr": ("le", "la", "les", "de", "et", "un", "est", "pour", "dans", "que"),
}

_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1  # Mersenne prime 2^61-1


def tokens(texts: pd.Series) -> pd.Series:
    """Whitespace tokens; empty/whitespace-only string → [''] (matches
    split-on-regex semantics in both Spark and DuckDB for hash parity)."""
    return texts.fillna("").str.strip().str.split(r"\s+", regex=True)


def token_count(texts: pd.Series) -> pd.Series:
    return tokens(texts).str.len().astype("int64")


def stopword_hits(texts: pd.Series, lang: str) -> pd.Series:
    sw = set(STOPWORDS[lang])
    return tokens(texts).map(lambda ts: sum(1 for t in ts if t in sw)).astype("int64")


def quality_score(texts: pd.Series) -> pd.Series:
    """round(en-stopword-ratio, 4) capped into [0,1] — a deliberately simple,
    SQL-mirrorable quality proxy (stopword density correlates with real prose).
    """
    n = token_count(texts)
    hits = stopword_hits(texts, "en")
    return (hits / n.clip(lower=1)).round(4)


def lang_id(texts: pd.Series) -> pd.Series:
    """argmax of stopword hits across languages; ties broken by language-code
    order ('de' < 'en' < 'es' < 'fr'); zero hits everywhere → 'und'."""
    hits = {lang: stopword_hits(texts, lang) for lang in _LANGS}
    df = pd.DataFrame(hits)
    best = df.max(axis=1)
    # idxmax takes the first column in _LANGS order — our documented tie-break
    out = df.idxmax(axis=1)
    out[best <= 0] = "und"
    return out


def fingerprint64_one(text: str) -> int:
    h = 0
    for b in text.encode("utf-8"):
        h = (h * _FP_BASE + b) % _FP_MOD
    return h


def fingerprint64(texts: pd.Series) -> pd.Series:
    """Rabin-Karp rolling hash, vectorized with numpy per string.

    h = Σ byte_i · B^(n-1-i) mod 2^61-1, B = 1000003. Computed with exact
    object-int accumulation chunk-wise to stay vectorized without overflow.
    """
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("").to_numpy()):
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        h = 0
        # Horner in chunks: fold 8 bytes at a time with precomputed powers
        powers = [pow(_FP_BASE, k, _FP_MOD) for k in range(8)]
        b8 = pow(_FP_BASE, 8, _FP_MOD)
        n8 = (len(data) // 8) * 8
        chunks = data[:n8].reshape(-1, 8).astype(object)
        for row in chunks:
            h = (h * b8 + sum(int(row[j]) * powers[7 - j] for j in range(8))) % _FP_MOD
        for b in data[n8:]:
            h = (h * _FP_BASE + int(b)) % _FP_MOD
        out[i] = h
    return pd.Series(out, index=texts.index)


# ---------------------------------------------------------------------------
# shingling / sketch primitives (consumed by operators/dedup.py)
# ---------------------------------------------------------------------------


def char_shingles_one(text: str, k: int = 5) -> list[str]:
    t = " ".join(text.split())  # collapse whitespace
    if len(t) < k:
        return [t] if t else []
    return [t[i : i + k] for i in range(len(t) - k + 1)]


def word_ngrams_one(text: str, n: int = 3) -> list[str]:
    ts = text.split()
    if len(ts) < n:
        return [" ".join(ts)] if ts else []
    return [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]


def _hash64_numpy(vals: list[str]) -> np.ndarray:
    """Deterministic 64-bit FNV-1a per string (numpy uint64, no Python hash —
    PYTHONHASHSEED-independent)."""
    out = np.empty(len(vals), dtype=np.uint64)
    mask = (1 << 64) - 1
    for i, v in enumerate(vals):
        h = 0xCBF29CE484222325
        for b in v.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & mask  # uint64 wraparound
        out[i] = h
    return out


# MinHash: h_i(x) = (a_i * x + b_i) mod p over crc32 shingle hashes.
# p = 2^31-1 (Mersenne) keeps a_i * x < 2^62 → exact in uint64, fully
# numpy-vectorized: the (num_hashes × n_shingles) grid is one broadcast op.
_MINHASH_P = (1 << 31) - 1


def _minhash_coeffs(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MINHASH_P, size=num_hashes, dtype=np.uint64)
    b = rng.randint(0, _MINHASH_P, size=num_hashes, dtype=np.uint64)
    return a, b


def _crc32_hashes(vals: list[str]) -> np.ndarray:
    import zlib

    return np.fromiter((zlib.crc32(v.encode("utf-8")) for v in vals),
                       dtype=np.uint64, count=len(vals))


def minhash_signature_one(shingles: list[str], num_hashes: int = 64, seed: int = 42) -> list[int]:
    if not shingles:
        return [int(_MINHASH_P)] * num_hashes
    a, b = _minhash_coeffs(num_hashes, seed)
    x = _crc32_hashes(shingles) % np.uint64(_MINHASH_P)
    grid = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MINHASH_P)
    return [int(v) for v in grid.min(axis=1)]


def _splitmix64(h: np.ndarray) -> np.ndarray:
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    h = (h + np.uint64(0x9E3779B97F4A7C15)) & mask
    h = ((h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & mask
    h = ((h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & mask
    return h ^ (h >> np.uint64(31))


def simhash64_one(toks: list[str]) -> int:
    """Classic 64-bit SimHash over token hashes (unweighted); token hash =
    splitmix64(crc32) — C-speed and deterministic."""
    if not toks:
        return 0
    with np.errstate(over="ignore"):
        hs = _splitmix64(_crc32_hashes(toks))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    counts = bits.sum(axis=0)
    vec = (counts * 2 - len(toks)) > 0
    val = np.uint64(0)
    for i in range(64):
        if vec[i]:
            val |= np.uint64(1) << np.uint64(i)
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
