"""Unit tests for the text layer: Porter2, normalization, k-grams.

Golden values come from the reference test suite
(``test/test_normalize.py``, ``test/test_kgram.py``,
``test/test_memoryindex.py:24-47``) — no Spark session needed here.
"""

from search_engine_spark.text.kgrams import kgrams, split_gram, wildcard_grams
from search_engine_spark.text.normalize import (
    analyze,
    dehyphenate,
    normalize,
    query_normalize,
    remove_special_characters,
)
from search_engine_spark.text.porter2 import stem


# ---- Porter2 --------------------------------------------------------------

def test_stem_conspicuous():
    # reference test/test_normalize.py:4-7
    assert stem("ConSPIcuous") == "conspicu"


def test_stem_golden_corpus_terms():
    # the 5-doc golden corpus maps onto exactly these stems
    # (reference test/test_memoryindex.py:24-47)
    pairs = {
        "This": "this",
        "is": "is",
        "a": "a",
        "test": "test",
        "document": "document",
        "Another": "anoth",
        "testing": "test",
        "here": "here",
        "Here": "here",
        "we": "we",
        "go": "go",
        "third": "third",
        "one": "one",
        "goes": "goe",
        "documents": "document",
        "documented": "document",
        "tested": "test",
        "tests": "test",
        "running": "run",
        "runs": "run",
        "ran": "ran",
    }
    for word, expected in pairs.items():
        assert stem(word) == expected, word


def test_stem_snowball_samples():
    # spot checks from the published Snowball English sample vocabulary
    pairs = {
        "caresses": "caress",
        "ponies": "poni",
        "ties": "tie",
        "cries": "cri",
        "agreed": "agre",
        "feed": "feed",
        "plastered": "plaster",
        "motoring": "motor",
        "sing": "sing",
        "hoping": "hope",
        "hopping": "hop",
        "happy": "happi",
        "relational": "relat",
        "conditional": "condit",
        "rational": "ration",
        "valenci": "valenc",
        "digitizer": "digit",
        "operator": "oper",
        "feudalism": "feudal",
        "decisiveness": "decis",
        "hopefulness": "hope",
        "callousness": "callous",
        "formaliti": "formal",
        "sensitiviti": "sensit",
        "triplicate": "triplic",
        "formative": "format",  # step-3 'ative' fails R2; step-4 'ive' in R2 fires
        "formalize": "formal",
        "electriciti": "electr",
        "electrical": "electr",
        "hopeful": "hope",
        "goodness": "good",
        "revival": "reviv",
        "allowance": "allow",
        "inference": "infer",
        "airliner": "airlin",
        "adjustable": "adjust",
        "defensible": "defens",
        "irritant": "irrit",
        "replacement": "replac",
        "adjustment": "adjust",
        "dependent": "depend",
        "adoption": "adopt",
        "communism": "communism",
        "activate": "activ",
        "angulariti": "angular",
        "homologous": "homolog",
        "effective": "effect",
        "bowdlerize": "bowdler",
        "probate": "probat",
        "rate": "rate",
        "cease": "ceas",
        "controll": "control",
        "roll": "roll",
        "skis": "ski",
        "dying": "die",
        "news": "news",
    }
    for word, expected in pairs.items():
        assert stem(word) == expected, word


def test_stem_short_and_empty():
    assert stem("") == ""
    assert stem("a") == "a"
    assert stem("we") == "we"
    assert stem("go") == "go"


# ---- normalization --------------------------------------------------------

def test_remove_special_characters_removes_beg_end():
    # reference test/test_normalize.py:9-12
    assert remove_special_characters("$!@'test%^") == "test"


def test_remove_does_not_remove_middle():
    # reference test/test_normalize.py:14-17
    assert remove_special_characters("te@#!st") == "te@#!st"


def test_remove_removes_apostrophes():
    # reference test/test_normalize.py:19-22
    assert remove_special_characters("'te's't'") == "test"


def test_remove_symbol_only_token_yields_empty():
    # '' IS an indexable term in the reference (normalize.py:19-24)
    assert remove_special_characters("--") == ""


def test_dehyphenate_single_word():
    # reference test/test_normalize.py:24-27
    assert dehyphenate("test") == {"test"}


def test_dehyphenate_splits():
    # reference test/test_normalize.py:29-33
    assert dehyphenate("test-test-check") == {"test-test-check", "test", "check"}


def test_query_normalize_keeps_hyphens():
    # reference test/test_normalize.py:35-39
    assert query_normalize("TesT-HOUsE!!!") == "test-hous"


def test_normalize_dehyphenates_and_stems():
    assert set(normalize("search-engine")) == {"search", "engin", "search-engin"}


def test_analyze_positions_per_whitespace_word():
    toks = analyze("Test test! Test test test.")
    assert [(t, p) for t, p, _ in toks] == [
        ("test", 0),
        ("test", 1),
        ("test", 2),
        ("test", 3),
        ("test", 4),
    ]


def test_analyze_hyphen_shares_position():
    toks = analyze("a search-engine works")
    by_pos = {}
    for term, pos, _raw in toks:
        by_pos.setdefault(pos, set()).add(term)
    assert by_pos[1] == {"search", "engin", "search-engin"}
    assert by_pos[0] == {"a"}


def test_analyze_duplicate_stems_counted_twice():
    # reference memoryindex.py:36-37: stems of distinct sub-words that
    # collide are each counted
    toks = analyze("test-tests")
    terms = [t for t, _, _ in toks]
    assert terms.count("test") == 2
    assert terms.count("test-test") == 1


def test_analyze_raw_word_is_unstemmed():
    toks = analyze("Testing goes!")
    raws = {raw for _, _, raw in toks}
    assert raws == {"testing", "goes"}


# ---- k-grams ---------------------------------------------------------------

def test_kgrams_of_word():
    # reference test/test_kgram.py:53-58
    assert kgrams("word") == {
        "$", "w", "o", "r", "d",
        "$w", "wo", "or", "rd", "d$",
        "$wo", "wor", "ord", "rd$",
    }


def test_kgrams_of_test():
    # reference test/test_kgram.py:12-20 (keys of the golden dict)
    assert kgrams("test") == {
        "$te", "$t", "$", "tes", "te", "t",
        "est", "es", "e", "st$", "st", "s", "t$",
    }


def test_split_gram():
    assert split_gram("abc") == ["abc"]
    assert split_gram("abcd") == ["abc", "bcd"]


def test_wildcard_grams():
    assert wildcard_grams("thi*") == {"$th", "thi"}
    assert wildcard_grams("*e") == {"e$"}
    assert wildcard_grams("*cu*en*") == {"cu", "en"}
    assert wildcard_grams("docu*") == {"$do", "doc", "ocu"}
