"""Tokenization + normalization with exact reference parity.

Reproduces the reference pipeline (reference ``normalize.py:6-42``,
``diskindex.py:159-186``):

* whitespace tokenization (``str.split``), one *position* per whitespace word
* ``remove_special_characters``: strip leading/trailing non-word chars,
  drop all apostrophes, lowercase (``normalize.py:19-24``); may yield ``''``
  for a symbol-only token — which the reference indexes, so we do too
* ``dehyphenate``: ``a-b`` -> {a, b, a-b} (``normalize.py:27-35``); all
  sub-terms of one whitespace word share one position
* Porter2 stem each sub-term (``normalize.py:6-12``)
* query-side normalization skips dehyphenation (``normalize.py:37-42``)

Pure Python, importable inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re
from functools import lru_cache

from search_engine_spark.text.porter2 import stem

_STRIP_RE = re.compile(r"^\W+|\W+$")


def remove_special_characters(word: str) -> str:
    word = _STRIP_RE.sub("", word)
    word = word.replace("'", "")
    return word.lower()


def dehyphenate(word: str) -> set[str]:
    if "-" not in word:
        return {word}
    parts = word.split("-")
    parts.append(word)
    return set(parts)


def normalize(word: str) -> list[str]:
    """Index-side normalization of an already specials-stripped word.

    Returns the stemmed sub-terms (sorted for determinism; the reference
    iterates a Python set, and all sub-terms share one position so order
    never affects the index).
    """
    return [stem(token) for token in sorted(dehyphenate(word))]


def query_normalize(word: str) -> str:
    """Query-side normalization: strip + stem, no dehyphenation."""
    return stem(remove_special_characters(word))


@lru_cache(maxsize=1 << 20)
def _analyze_token(raw: str) -> tuple[str, tuple[str, ...]]:
    """Memoized per-whitespace-token normalization.

    Token frequencies are Zipf-distributed, so virtually every token a
    worker sees repeats; caching the (strip, dehyphenate, stem) chain
    per distinct token turns the analyzer's hot loop into dict lookups
    (~10-50x on real corpora). Worker-lifetime cache, bounded at 2^20
    entries per Python worker.
    """
    word = remove_special_characters(raw)
    return word, tuple(normalize(word))


def analyze(text: str) -> list[tuple[str, int, str]]:
    """Tokenize + normalize one document body.

    Returns ``[(term, position, raw_word)]`` where ``position`` is the
    whitespace-word counter (shared by all sub-terms of a hyphenated word,
    reference ``diskindex.py:165-185``) and ``raw_word`` is the
    specials-stripped, unstemmed word — the k-gram vocabulary unit
    (reference ``memoryindex.py:32-33``: ``VOCAB.add(word)`` *before*
    stemming). Raw sub-words of a hyphenated word are deduplicated (set
    semantics) but their *stems* are not — if two distinct sub-words stem
    to the same term the reference counts it twice (``memoryindex.py:36-37``
    iterates the stemmed list), and so do we.
    """
    out: list[tuple[str, int, str]] = []
    for position, raw in enumerate(text.split()):
        word, terms = _analyze_token(raw)
        for term in terms:
            out.append((term, position, word))
    return out
