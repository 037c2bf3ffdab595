"""End-to-end HTTP tests for the stdlib web UI (webui.py) — the
reference's four Flask routes + SPA (searchengine.py:109-124,
index.js:1-235) exercised over a real socket."""

import json
import threading
import urllib.request
from urllib.parse import urlencode

import pytest

from search_engine_spark.api import SearchService
from search_engine_spark.fixtures import golden_transcripts
from search_engine_spark.webui import make_server


@pytest.fixture(scope="module")
def ui(spark, tmp_path_factory):
    """(base_url, corpus_path): a live server over a built golden index."""
    corpus = str(tmp_path_factory.mktemp("webui") / "corpus.parquet")
    golden_transcripts(spark).write.parquet(corpus)
    index_dir = str(tmp_path_factory.mktemp("webui") / "index")
    service = SearchService(spark)
    service.buildindex(spark.read.parquet(corpus), index_dir)
    server = make_server(service, index_dir, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", corpus
    server.shutdown()


def post(base, path, data):
    req = urllib.request.Request(
        base + path,
        data=urlencode(data).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_index_page_served(ui):
    base, _ = ui
    with urllib.request.urlopen(base + "/", timeout=30) as resp:
        html = resp.read().decode()
    assert resp.headers["Content-Type"].startswith("text/html")
    # the page is self-contained: no external script/style origins
    assert "http" not in html.split("<script>")[0].split("<style>")[1]
    for widget in ("buildindex_button", "showterms_button", "ranked",
                   "spell_correction", "relevant_list"):
        assert widget in html


def test_buildindex_route(ui):
    base, corpus = ui
    out = post(base, "/buildindex", {"corpus_dir": corpus, "build": "false"})
    assert out["doc_count"] == 5
    assert out["term_count"] > 0 and "test" in out["terms"]


def test_query_boolean_route(ui):
    base, _ = ui
    out = post(base, "/query",
               {"query": '"third one"', "rankedRetrieval": "false"})
    assert len(out["files"]) == 1
    (f,) = out["files"]
    assert out["contents"][f]["body"] == "Here we go, a third one."
    assert "#" in f  # conv_id#turn_idx title
    assert out["scores"] == [] and out["ranked"] is False


def test_query_ranked_route(ui):
    base, _ = ui
    out = post(base, "/query", {"query": "test", "rankedRetrieval": "true"})
    assert out["ranked"] is True
    assert len(out["scores"]) == len(out["files"]) > 0
    assert out["scores"] == sorted(out["scores"], reverse=True)


def test_query_spell_route(ui):
    base, _ = ui
    out = post(base, "/query", {"query": "tesst", "rankedRetrieval": "true"})
    assert out["spell_corrected"] == "test"


def test_showterms_route(ui):
    base, _ = ui
    out = post(base, "/showterms", {})
    assert "test" in out["vocab"]["t"]


def test_stem_route(ui):
    base, _ = ui
    out = post(base, "/stem", {"term": "Testing"})
    assert out == {"term": "Testing", "stemmed_term": "test"}


def test_unknown_route_404(ui):
    base, _ = ui
    with pytest.raises(urllib.error.HTTPError) as exc:
        post(base, "/nope", {})
    assert exc.value.code == 404


def test_error_surfaces_as_json_500(ui):
    base, _ = ui
    with pytest.raises(urllib.error.HTTPError) as exc:
        post(base, "/buildindex",
             {"corpus_dir": "/nonexistent/path", "build": "true"})
    assert exc.value.code == 500
    assert "error" in json.loads(exc.value.read())


def test_search_endpoint_snippets(ui):
    base, _ = ui
    res = post(base, "/search", {"query": "test", "k": 2, "window": 1})
    hits = res["hits"]
    assert [h["doc_id"] for h in hits] == [3, 4]
    assert hits[0]["snippet"] == "Test test! Test"
    assert all(isinstance(h["score"], float) for h in hits)


def test_facets_endpoint(ui):
    base, _ = ui
    res = post(base, "/facets", {"query": "test", "facet_col": "role"})
    assert res["facets"] == {"user": 2, "assistant": 2}


def test_facets_rejects_unknown_column(ui):
    base, _ = ui
    import urllib.error

    req = urllib.request.Request(
        base + "/facets",
        data=urlencode({"query": "test", "facet_col": "nope;drop"}).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 500
    assert "unknown facet column" in json.loads(e.value.read())["error"]


def test_suggest_endpoint(ui):
    base, _ = ui
    res = post(base, "/suggest", {"prefix": "t", "k": 2})
    assert res["suggestions"] == ["test", "third"]


def test_conversations_endpoint(ui):
    base, _ = ui
    res = post(base, "/conversations", {"query": "test", "k": 2})
    convs = res["conversations"]
    assert len(convs) == 2
    assert {"conv_id", "score", "n_hits", "best_doc"} <= set(convs[0])
    assert convs[0]["score"] >= convs[1]["score"]


def test_similar_endpoint(ui):
    base, _ = ui
    res = post(base, "/similar", {"doc_id": 0, "k": 3})
    docs = [h["doc_id"] for h in res["similar"]]
    assert docs and 0 not in docs


def test_stats_endpoint(ui):
    base, _ = ui
    res = post(base, "/stats", {})
    s = res["stats"]
    assert s["num_docs"] == 5 and s["num_live"] == 5
    assert s["num_deleted"] == 0
    assert s["total_tokens"] > 0 and s["vocab_size"] > 0
    assert s["block_span"] >= 1 and s["term_buckets"] >= 1
