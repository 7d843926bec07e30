"""Deterministic similarity primitives: feature-hash embedding + trigram Jaccard.

Replaces the reference's OpenAI text-embedding-3-small vectors
(/root/reference/src/services/embedding.service.js:55-168) with a seed-free,
platform-independent vectorizer (md5 feature hashing of character 3-grams,
L2-normalized), and pg_trgm `similarity()`
(/root/reference/src/services/matching.service.js:42,147) with character
3-gram Jaccard.

These are the shared numeric core used by BOTH the Spark pandas UDFs and the
pure-Python golden matcher — the distributed-vs-oracle tests exercise the
pipeline around them (top-k, joins, pick-best), not the scalar arithmetic.
"""

from __future__ import annotations

import functools
import hashlib
import re
import unicodedata

import numpy as np

from .. import config

_WS = re.compile(r"\s+")


def normalize_text(s: str | None) -> str:
    """lower + accent fold + collapse whitespace (schema_matching.sql:418-428)."""
    if s is None:
        return ""
    s = s.lower()
    s = "".join(
        c for c in unicodedata.normalize("NFD", s) if unicodedata.category(c) != "Mn"
    )
    return _WS.sub(" ", s).strip()


def char_trigrams(s: str) -> set[str]:
    t = normalize_text(s)
    if len(t) < 3:
        return {t} if t else set()
    return {t[i : i + 3] for i in range(len(t) - 2)}


def trigram_similarity(a: str | None, b: str | None) -> float:
    """Jaccard over character 3-gram sets (pg_trgm analogue)."""
    sa, sb = char_trigrams(a or ""), char_trigrams(b or "")
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


@functools.lru_cache(maxsize=1 << 17)
def _gram_index_sign(gram: str, dim: int = config.EMBEDDING_DIM) -> tuple[int, float]:
    # memoized: pure function of (gram, dim) — md5 is deterministic and the
    # gram vocabulary of a corpus is tiny relative to the call count. dim is
    # part of the cache key: hardcoding it made embed_text(dim=1536)
    # silently bucket mod 64 (caught by the 1536-d generalization test).
    h = int.from_bytes(hashlib.md5(gram.encode("utf-8")).digest()[:8], "big")
    idx = h % dim
    sign = 1.0 if (h >> 32) & 1 else -1.0
    return idx, sign


def embed_text(s: str | None, dim: int = config.EMBEDDING_DIM) -> list[float]:
    """Deterministic feature-hash embedding of character 3-grams, L2-normalized.

    Pure function of the normalized text — no seeds, no state; identical
    across executors, runs, and cluster sizes (the N vs 4N bit-equality
    requirement)."""
    t = normalize_text(s)
    v = np.zeros(dim, dtype=np.float64)
    if not t:
        return v.tolist()
    grams = [t[i : i + 3] for i in range(max(1, len(t) - 2))]
    for g in grams:
        idx, sign = _gram_index_sign(g, dim)
        v[idx] += sign
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    return [float(x) for x in v]


def embed_matrix(texts: list[str | None], dim: int = config.EMBEDDING_DIM) -> np.ndarray:
    return np.array([embed_text(t, dim) for t in texts], dtype=np.float64)


def round_half_up(x: float | None, nd: int) -> float | None:
    """Match Spark's F.round on doubles (HALF_UP over the shortest decimal
    repr; java BigDecimal.valueOf == Python repr for doubles). Python's
    built-in round is banker's rounding — NOT equivalent."""
    from decimal import ROUND_HALF_UP, Decimal

    if x is None:
        return None
    return float(Decimal(repr(float(x))).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))


def cosine(a: list[float], b: list[float]) -> float:
    va, vb = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    na, nb = float(np.linalg.norm(va)), float(np.linalg.norm(vb))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(va @ vb / (na * nb))
