"""Browser UI + HTTP server for the search service — stdlib only.

Mirrors the reference's jQuery SPA and Flask routes (``index.html``,
``index.js:1-235``, ``searchengine.py:109-124``) without external
dependencies: :class:`http.server.ThreadingHTTPServer` serves the four
reference POST endpoints (``/buildindex`` ``/query`` ``/showterms``
``/stem``) plus scale-minded extensions — ``/conversations``
(conversation-level ranked results), ``/similar`` (more-like-this),
``/search`` (top-k
with corpus-side snippets, bounded at k×window words instead of whole
documents), ``/facets`` (result distribution over a docs metadata
column), and ``/suggest`` (prefix autocomplete from a pushdown-pruned
dictionary scan) —
plus ``GET /`` returning a self-contained vanilla-JS page with the same
widgets and flows — corpus input with a Build toggle (``index.js:15-34``),
term accordion (``index.js:185-215``), boolean/ranked tabs
(``index.js:93-100``), Enter-to-query with the ``:stem`` escape
(``index.js:46-76``), the clickable spell-correction suggestion
(``index.js:79-90``), and click-to-read result documents
(``index.js:117-122``).

Request/response shapes follow the reference: form-encoded bodies in
(``rankedRetrieval=true|false``), JSON out with ``files`` +
``contents[file].title/.body`` + ``scores`` + ``spell_corrected``
(``index.js:133-182``). A "file" here is the transcript turn's stable
identity ``conv_id#turn_idx`` — the engine's analog of the reference's
document filename.

The server is a thin driver-side veneer: every endpoint delegates to
:class:`search_engine_spark.api.SearchService`, whose responses are
built from pruned, CAPPED scans (``MAX_TERMS_INLINE`` vocab page,
``MAX_CONTENTS_INLINE`` metadata page over an isin-pushed lookup).
Every text/metadata collect is bounded; the one deliberately
result-sized payload is the ``doc_ids`` list itself, which stays
complete because the reference's response contract returns the full
match list (``app.py``/``index.js`` render it) — a caller fronting a
10^12-turn index with stopword queries should paginate that list, and
gets everything else at O(page) driver cost.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs

from search_engine_spark.api import SearchService

INDEX_HTML = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>Search Engine (Spark)</title>
<style>
 body{font-family:sans-serif;margin:2em auto;max-width:960px;color:#222}
 h1{border-bottom:2px solid #ddd;padding-bottom:.3em}
 .row{display:flex;gap:.6em;margin:.8em 0;align-items:center}
 input[type=text]{flex:1;padding:.5em;font-size:1em}
 button{padding:.5em 1.2em;font-size:1em;cursor:pointer}
 button:disabled{opacity:.4;cursor:default}
 .counts{display:flex;gap:2em;margin:1em 0}
 .counts div{flex:1;border:1px solid #ddd;padding:.6em;text-align:center}
 .tabs a{padding:.4em 1.4em;border:1px solid #bbb;cursor:pointer}
 .tabs a.active{background:#1b6ac9;color:#fff}
 #spell_correction{display:none}
 #results{display:flex;gap:1em;height:420px}
 #relevant_list,#doc_pane{flex:1;border:1px solid #ddd;overflow:auto;padding:.6em}
 .hit{margin:.4em 0}
 .hit a{color:#1b6ac9;cursor:pointer;font-weight:bold}
 .hit .snippet{color:#666;font-size:.9em}
 details p{margin:.15em 0 .15em 1.2em}
</style>
</head>
<body>
<h1>Transcript Search Engine</h1>
<div class="row">
 <input id="dir_input" type="text" placeholder="Transcript table path...">
 <label><input id="build_checkbox" type="checkbox"> Build</label>
 <button id="buildindex_button" disabled>Use Index</button>
 <button id="showterms_button" disabled>Show Terms</button>
</div>
<div class="counts">
 <div>Document Count<h2 id="document_count">0</h2></div>
 <div>Terms Extracted<h2 id="term_count">0</h2></div>
</div>
<div class="tabs row">
 <a id="boolean" class="active">Boolean</a><a id="ranked">Ranked</a>
</div>
<div class="row">
 <input id="query" type="text"
        placeholder="Query documents... (&quot;term :stem&quot; stems)">
</div>
<h4 id="spell_correction">Search for
 <a href="#" id="correct_query_anchor"><u id="corrected_query"></u></a></h4>
<div id="results">
 <div id="relevant_list"></div>
 <div id="doc_pane"><h4 id="selected_document_title"></h4>
  <p id="selected_document_body"></p></div>
</div>
<div class="counts">
 <div>Last query<p id="last_query"></p></div>
 <div>Documents found<p id="documents_found"></p></div>
</div>
<script>
const $ = id => document.getElementById(id);
const post = (url, data, cb) => fetch(url, {
  method: "POST",
  headers: {"Content-Type": "application/x-www-form-urlencoded"},
  body: new URLSearchParams(data),
}).then(r => r.json()).then(cb);
let documentBodies = {};

$("dir_input").addEventListener("input", () => {
  $("buildindex_button").disabled = $("dir_input").value === "";
});
$("build_checkbox").addEventListener("change", () => {
  $("buildindex_button").textContent =
    $("build_checkbox").checked ? "Build Index" : "Use Index";
});
$("buildindex_button").addEventListener("click", () => {
  post("/buildindex",
       {corpus_dir: $("dir_input").value,
        build: $("build_checkbox").checked},
       res => {
    $("document_count").textContent = res.doc_count;
    $("term_count").textContent = res.term_count;
  });
  $("dir_input").value = "";
  $("buildindex_button").disabled = true;
  $("showterms_button").disabled = false;
});
$("showterms_button").addEventListener("click", () => post(
  "/showterms", {}, res => {
    const list = $("relevant_list");
    list.innerHTML = "";
    for (const [letter, terms] of Object.entries(res.vocab)) {
      const d = document.createElement("details");
      d.innerHTML = "<summary>" + letter + "</summary>" +
        terms.map(t => "<p>" + t + "</p>").join("");
      list.appendChild(d);
    }
  }));
for (const mode of ["boolean", "ranked"])
  $(mode).addEventListener("click", () => {
    $("boolean").classList.toggle("active", mode === "boolean");
    $("ranked").classList.toggle("active", mode === "ranked");
  });

function runQuery(q) {
  $("spell_correction").style.display = "none";
  const ranked = $("ranked").classList.contains("active");
  if (q.includes(":stem")) {
    post("/stem", {term: q.replace(":stem", "").trim()}, res => {
      $("selected_document_body").textContent =
        'The stem of "' + res.term + '" is "' + res.stemmed_term + '"';
    });
  } else {
    post("/query", {query: q, rankedRetrieval: String(ranked)}, res => {
      const list = $("relevant_list");
      list.innerHTML = "";
      documentBodies = {};
      if (!res.files.length)
        $("selected_document_body").textContent = "No documents found.";
      for (const f of res.files) {
        const {title, body} = res.contents[f];
        documentBodies[title] = body;
        const div = document.createElement("div");
        div.className = "hit";
        const a = document.createElement("a");
        a.textContent = title;
        a.addEventListener("click", () => {
          $("selected_document_title").textContent = title;
          $("selected_document_body").textContent = documentBodies[title];
        });
        const snip = document.createElement("div");
        snip.className = "snippet";
        snip.textContent =
          body.length > 75 ? body.slice(0, 75) + "..." : body;
        div.append(a, snip);
        list.appendChild(div);
      }
      $("documents_found").textContent = res.files.length;
      if (res.ranked) {
        $("selected_document_title").textContent = "Document Scores";
        $("selected_document_body").innerHTML =
          res.scores.map(s => s.toFixed(6)).join("<br>");
      }
      if (res.spell_corrected != null) {
        $("corrected_query").textContent = res.spell_corrected;
        $("spell_correction").style.display = "block";
      }
    });
  }
  $("last_query").textContent = q;
  $("query").value = "";
  $("selected_document_title").textContent = "";
  $("selected_document_body").textContent = "";
}
$("query").addEventListener("keypress", e => {
  if (e.key === "Enter") runQuery($("query").value);
});
$("correct_query_anchor").addEventListener("click", e => {
  e.preventDefault();
  runQuery($("corrected_query").textContent);
});
</script>
</body>
</html>
"""


def _query_response(service: SearchService, query: str, ranked: bool) -> dict:
    """Adapt :meth:`SearchService.query` to the reference's response
    contract (``index.js:133-182``): ``files`` + per-file
    ``contents[f] = {title, body}``, scores parallel to ``files``."""
    res = service.query(query, ranked=ranked)
    doc_ids = (
        [d for d, _ in res["doc_ids"]] if ranked else list(res["doc_ids"])
    )
    files, contents = [], {}
    for doc_id in doc_ids:
        meta = res["contents"].get(doc_id)
        if meta is None:  # doc pruned from the metadata page
            continue
        title = f"{meta['conv_id']}#{meta['turn_idx']}"
        files.append(title)
        contents[title] = {"title": title, "body": meta["text"]}
    return {
        "files": files,
        "contents": contents,
        "ranked": res["ranked"],
        "scores": res["scores"],
        "spell_corrected": res["spell_corrected"],
    }


class _Handler(BaseHTTPRequestHandler):
    service: SearchService  # set by make_server
    index_dir: str

    def _send(self, payload, content_type="application/json", status=200):
        body = (
            payload.encode()
            if isinstance(payload, str)
            else json.dumps(payload).encode()
        )
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        # no CORS header: the page is served same-origin by this
        # server, and a permissive header would let any web page
        # drive POST /buildindex (arbitrary parquet path -> Spark
        # jobs) cross-origin against localhost
        self.end_headers()
        self.wfile.write(body)

    def _form(self) -> dict[str, str]:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n).decode() if n else ""
        ctype = self.headers.get("Content-Type", "")
        if ctype.startswith("application/json"):
            return json.loads(raw) if raw else {}
        return {k: v[-1] for k, v in parse_qs(raw).items()}

    def do_GET(self):  # noqa: N802 - http.server API
        if self.path in ("/", "/index.html"):
            self._send(INDEX_HTML, content_type="text/html; charset=utf-8")
        else:
            self._send({"error": "not found"}, status=404)

    def do_POST(self):  # noqa: N802 - http.server API
        form = self._form()
        svc = self.service
        try:
            if self.path == "/buildindex":
                build = str(form.get("build", "false")).lower() == "true"
                transcripts = svc.spark.read.parquet(form["corpus_dir"])
                out = svc.buildindex(transcripts, self.index_dir, build=build)
            elif self.path == "/query":
                ranked = (
                    str(form.get("rankedRetrieval", "false")).lower() == "true"
                )
                out = _query_response(svc, form["query"], ranked)
            elif self.path == "/showterms":
                out = svc.showterms()
            elif self.path == "/stem":
                out = svc.stem_term(form["term"])
            elif self.path == "/search":
                out = svc.search(
                    form["query"],
                    k=int(form.get("k", 10)),
                    window=int(form.get("window", 3)),
                )
            elif self.path == "/facets":
                out = svc.facets(form["query"], form.get("facet_col", "role"))
            elif self.path == "/suggest":
                out = svc.suggest(form["prefix"], k=int(form.get("k", 10)))
            elif self.path == "/conversations":
                out = svc.conversations(form["query"], k=int(form.get("k", 10)))
            elif self.path == "/similar":
                out = svc.similar(int(form["doc_id"]), k=int(form.get("k", 10)))
            elif self.path == "/stats":
                out = svc.stats()
            else:
                self._send({"error": "not found"}, status=404)
                return
        except Exception as exc:  # surface as JSON, keep the server up
            self._send({"error": str(exc)}, status=500)
            return
        self._send(out)

    def log_message(self, fmt, *args):  # quiet by default
        pass


def make_server(
    service: SearchService, index_dir: str, host: str = "127.0.0.1",
    port: int = 0,
) -> ThreadingHTTPServer:
    """HTTP server bound to ``host:port`` (0 picks a free port). The
    caller owns the lifecycle: ``serve_forever()`` / ``shutdown()``."""
    handler = type(
        "BoundHandler", (_Handler,),
        {"service": service, "index_dir": index_dir},
    )
    return ThreadingHTTPServer((host, port), handler)


def main(argv: list[str] | None = None) -> None:
    """``python -m search_engine_spark.webui --index-dir /path`` —
    serve an existing index (reference: ``searchengine.py:125``)."""
    import argparse

    from search_engine_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument(
        "--transcripts",
        help="build the index from this parquet table before serving",
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name="search-webui")
    service = SearchService(spark)
    if args.transcripts:
        service.buildindex(
            spark.read.parquet(args.transcripts), args.index_dir, build=True
        )
    else:
        service.buildindex(None, args.index_dir, build=False)
    server = make_server(service, args.index_dir, args.host, args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]}/")
    server.serve_forever()


if __name__ == "__main__":
    main()
