"""K-gram generation helpers (pure Python, UDF-safe).

Mirrors the reference k-gram index semantics (reference ``kgram.py``):
grams of length 1..k over ``"$" + word + "$"`` (``kgram.py:18-25``),
wildcard queries split on ``*`` with long grams decomposed into sliding
max-length grams (``kgram.py:49-54``, ``query.py:125-134``).
"""

from __future__ import annotations

DEFAULT_K = 3  # reference: KGramIndex(3, VOCAB), memoryindex.py:55


def kgrams(word: str, k: int = DEFAULT_K) -> set[str]:
    """All grams of length 1..k of ``$word$`` (reference ``kgram.py:56-64``)."""
    gram_word = "$" + word + "$"
    out: set[str] = set()
    for n in range(1, k + 1):
        for i in range(len(gram_word) - n + 1):
            out.add(gram_word[i : i + n])
    return out


def split_gram(gram: str, k: int = DEFAULT_K) -> list[str]:
    """Decompose an over-long gram into its sliding k-grams (``kgram.py:49-54``)."""
    if len(gram) <= k:
        return [gram]
    return [gram[i : i + k] for i in range(0, len(gram) - k + 1)]


def wildcard_grams(query: str, k: int = DEFAULT_K) -> set[str]:
    """Grams a wildcard query must all hit (reference ``query.py:125-134``).

    NOTE (parity): the reference does NOT post-filter the expanded words
    against the wildcard pattern — ``*cu*en*`` matches any vocab word
    containing grams ``cu`` and ``en`` anywhere. We preserve that.
    """
    if not query.startswith("*"):
        query = "$" + query
    if not query.endswith("*"):
        query = query + "$"
    parts = [p for p in query.split("*") if p]
    grams: set[str] = set()
    for part in parts:
        grams.update(split_gram(part, k))
    return grams
