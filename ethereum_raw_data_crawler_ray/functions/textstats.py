"""Text-analysis primitives for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting, SimHash, MinHash.

These extend the engine beyond the reference's own operator set (the
reference has no text analytics) with the operations a large-scale
training-data pipeline needs; each is exposed as a ``queries()`` entry.
All functions are per-batch (arrays in / arrays out) with patterns
compiled at module import — once per Ray worker process.
"""

from __future__ import annotations

import re

import numpy as np

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish pre-tokenizer: word pieces OR single non-space symbols
_BPE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]")

# tiny stopword profiles per language (n-gram-free heuristic language ID)
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "vi": {"và", "là", "của", "có", "không", "người", "trong", "một", "được", "cho"},
    "ja": {"の", "に", "は", "を", "た", "が", "で", "て", "と", "し"},
}


def token_count_simple(text: str) -> int:
    """Whitespace-split token count — ORACLE-MATCHED: must stay equal to
    DuckDB ``len(string_split(text, ' '))`` (split on single space)."""
    return text.count(" ") + 1 if text else 1


def token_count_bpe(text: str) -> int:
    return len(_BPE_RE.findall(text))


def lang_id(text: str) -> str:
    """Stopword-profile language guess; 'und' when nothing matches."""
    words = set(_WORD_RE.findall(text.lower())[:200])
    best, best_n = "und", 0
    for lang, sw in _STOPWORDS.items():
        n = len(words & sw)
        if n > best_n:
            best, best_n = lang, n
    return best


def quality_stats(text: str) -> tuple[int, int, int, int]:
    """(n_chars, n_tokens_ws, n_punct, n_stop_en) — the integer raw stats
    behind quality scoring; kept integer so the DuckDB oracle can
    reproduce them exactly."""
    n_chars = len(text)
    n_tokens = token_count_simple(text)
    n_punct = len(_PUNCT_RE.findall(text))
    words = _WORD_RE.findall(text.lower())
    n_stop = sum(1 for w in words if w in _STOPWORDS["en"])
    return n_chars, n_tokens, n_punct, n_stop


_FP_BASE = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def fingerprint64(text: str) -> int:
    """FNV-1a 64-bit document fingerprint (public-domain algorithm) —
    the analog of the reference's content hash identity (block.go:13)."""
    h = _FP_OFF
    with np.errstate(over="ignore"):
        for b in text.encode("utf-8"):
            h = ((h ^ np.uint64(b)) * _FP_BASE) & _M64
    return int(h)


def _token_hashes(text: str) -> np.ndarray:
    import pandas as pd

    toks = _WORD_RE.findall(text.lower())
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(toks, dtype=object), categorize=False)


def simhash64(text: str) -> int:
    """Charikar SimHash over word-level hashes (public algorithm)."""
    h = _token_hashes(text)
    if h.size == 0:
        return 0
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    with np.errstate(over="ignore"):
        for j in range(64):
            if v[j] > 0:
                out |= np.uint64(1) << np.uint64(j)
    return int(out)


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes — ~5-10× fewer shingles than character
    grams; the cheap path for in-flight MinHash."""
    import pandas as pd

    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        return _token_hashes(text)
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return pd.util.hash_array(np.asarray(grams, dtype=object), categorize=False)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """k-gram character shingle hashes."""
    import pandas as pd

    t = text.lower()
    if len(t) < k:
        return _token_hashes(t)
    grams = [t[i : i + k] for i in range(len(t) - k + 1)]
    return pd.util.hash_array(np.asarray(grams, dtype=object), categorize=False)


_MH_PRIME = np.uint64(0xFFFFFFFFFFFFFFC5)  # largest 64-bit prime


def minhash_signature(shingle_hashes: np.ndarray, n_perm: int = 64, seed: int = 7) -> np.ndarray:
    """n_perm MinHash values via universal hashing h_i(x) = a_i*x + b_i
    (Broder's MinHash, public algorithm). Empty docs → all-max sentinel."""
    if shingle_hashes.size == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=n_perm, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = a[None, :] * shingle_hashes[:, None] + b[None, :]
    return vals.min(axis=0)


def lsh_band_keys(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """Split the signature into bands; one 64-bit key per band (band id
    mixed in). Docs sharing any band key are near-dup candidates."""
    import pandas as pd

    rows = len(sig) // n_bands
    keys = []
    for b in range(n_bands):
        chunk = sig[b * rows : (b + 1) * rows]
        k = pd.util.hash_array(
            np.asarray([bytes(chunk.tobytes()) + bytes([b])], dtype=object),
            categorize=False,
        )[0]
        keys.append(int(k))
    return keys


def jaccard_ngrams(a: str, b: str, k: int = 3) -> float:
    """Word n-gram Jaccard similarity (verification step after LSH)."""
    aw = _WORD_RE.findall(a.lower())
    bw = _WORD_RE.findall(b.lower())
    sa = {tuple(aw[i : i + k]) for i in range(max(1, len(aw) - k + 1))}
    sb = {tuple(bw[i : i + k]) for i in range(max(1, len(bw) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
