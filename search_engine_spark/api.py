"""Service facade mirroring the reference HTTP API (``searchengine.py``).

The four endpoints are plain dict-in/dict-out methods on
:class:`SearchService` so they are testable without HTTP;
:func:`make_flask_app` wires them to the same routes when Flask is
available (import-gated — Flask is not in this sandbox image).

Reference bugs intentionally NOT replicated (SURVEY.md §7): the
undefined ``IndexWriter`` on build=true (``searchengine.py:40``), the
``/stem`` route shadowing the imported ``stem`` (``:111-115``), and
``num_docs`` taken from the last walked subdir (``:43``).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.engine import TranscriptSearchEngine
from search_engine_spark.text.porter2 import stem


class SearchService:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.engine: TranscriptSearchEngine | None = None
        self.vocab: list[str] = []

    # ---- POST /buildindex {corpus, build} ---------------------------------
    def buildindex(
        self, transcripts: DataFrame, index_dir: str, build: bool = True
    ) -> dict:
        """Build (or re-open) the index over a transcript table; returns
        the corpus/vocab summary (``searchengine.py:16-57``)."""
        if build:
            self.engine = TranscriptSearchEngine.build(
                self.spark, transcripts, index_dir
            )
        else:
            self.engine = TranscriptSearchEngine(self.spark, index_dir)
        self.vocab = self.engine.vocab()
        return {
            "doc_count": self.engine.num_docs,
            "terms": self.vocab,
            "term_count": len(self.vocab),
        }

    # ---- POST /query {query, rankedRetrieval} -----------------------------
    def query(self, query: str, ranked: bool = False) -> dict:
        """Dispatch ranked vs boolean; returns doc ids, per-doc turn
        metadata, scores, and the spelling suggestion
        (``searchengine.py:72-108``)."""
        assert self.engine is not None, "call buildindex first"
        results = self.engine.query(query, ranked_flag=ranked)
        doc_ids = [r[0] for r in results] if ranked else list(results)
        scores = [r[1] for r in results] if ranked else []
        meta = {}
        if doc_ids:
            rows = (
                self.engine.docs.where(self.engine.docs.doc_id.isin(doc_ids))
                .select("doc_id", "conv_id", "turn_idx", "text")
                .collect()
            )
            meta = {
                r["doc_id"]: {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "text": r["text"],
                }
                for r in rows
            }
        return {
            "doc_ids": results if ranked else doc_ids,
            "contents": meta,
            "ranked": ranked,
            "scores": scores,
            "spell_corrected": self.engine.check_spelling(
                query, set(self.vocab), ranked
            ),
        }

    # ---- POST /showterms --------------------------------------------------
    def showterms(self) -> dict:
        """Vocab grouped by first letter, empty term dropped
        (``searchengine.py:59-70``)."""
        alphabet: dict[str, list[str]] = defaultdict(list)
        for term in self.vocab:
            if term != "":
                alphabet[term[0]].append(term)
        return {"vocab": dict(alphabet)}

    # ---- POST /stem {term} ------------------------------------------------
    def stem_term(self, term: str) -> dict:
        return {"term": term, "stemmed_term": stem(term.lower())}


def make_flask_app(service: SearchService):  # pragma: no cover - needs flask
    """Wire the service to the reference's routes (Flask import-gated)."""
    try:
        from flask import Flask, request
    except ImportError as exc:
        raise NotImplementedError(
            "flask is not installed in this environment; use SearchService directly"
        ) from exc

    import json

    app = Flask(__name__)

    @app.route("/query", methods=["POST"])
    def query_route():
        return json.dumps(
            service.query(
                request.form["query"], request.form["rankedRetrieval"] == "true"
            )
        )

    @app.route("/showterms", methods=["POST"])
    def showterms_route():
        return json.dumps(service.showterms())

    @app.route("/stem", methods=["POST"])
    def stem_route():
        return json.dumps(service.stem_term(request.form["term"]))

    return app
