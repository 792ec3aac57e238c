"""Q5 REST surface (navi_spark/api.py) — protocol parity with the
reference's Spring controller (queryengine/QueryEngine.java:28-31,
68-74,298-358): /home, the stateful POST /search → GET /results
two-step, /suggestions contains-match, CORS * on every response."""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from navi_spark.api import QueryEngineServer, ServedIndex
from navi_spark.catalog import SnapshotTable
from navi_spark.operators import indexer
from navi_spark.operators.search import search

DOCS = [
    ("u0", "spark engines", "spark shuffles move the big tables quickly"),
    ("u1", "slow rivers", "rivers flow and flow slowly along the banks"),
    ("u2", "tables everywhere", "the big tables hold rows and spark joy"),
    ("u3", "quiet corner", "nothing interesting lives here at all"),
    ("u4", "filler page", "completely unrelated filler words only"),
]
FIELDS = {"h1": "h1", "other": "other"}


# generous client timeout: the first POST/GET pays cold-JVM Spark work
# (suggestion-table create + first ranking jobs) inside the handler
# thread; 30s was measured too tight in a slow host window and the
# abandoned handler thread then races session teardown
_HTTP_TIMEOUT = 300


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=_HTTP_TIMEOUT) as r:
        return r, r.read()


def _post(url, path):
    req = urllib.request.Request(url + path, data=b"", method="POST")
    with urllib.request.urlopen(req, timeout=_HTTP_TIMEOUT) as r:
        return r, r.read()


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    pages = spark.createDataFrame(
        [(u, h1, other, 1.0 if u != "u2" else 5.0) for u, h1, other in DOCS],
        "url string, h1 string, other string, rank double",
    ).cache()
    postings = indexer.build_postings(pages, "url", FIELDS, stem=True).cache()
    lengths = indexer.field_lengths(pages, "url", FIELDS, stem=True).cache()
    sugg = SnapshotTable(
        spark, str(tmp_path_factory.mktemp("api") / "suggestions")
    )
    idx = ServedIndex(
        pages=pages, postings=postings, lengths=lengths,
        field_cols=FIELDS, n_docs=len(DOCS), suggestions=sugg,
    )
    # materialize the cached index OUTSIDE the HTTP path so the first
    # request doesn't also pay the cache-build jobs under a client timeout
    for df in (pages, postings, lengths):
        df.count()
    srv = QueryEngineServer(idx)
    srv.start()
    yield srv.url, idx
    srv.stop()


def test_home_and_cors(served):
    url, _ = served
    r, body = _get(url, "/home")
    assert body == b"Query Engine is running!"  # :70
    assert r.headers["Access-Control-Allow-Origin"] == "*"  # :28


def test_search_then_results_matches_direct_search(served):
    url, idx = served
    r, body = _post(url, "/search?query=rivers%20banks")
    # POST returns the parsed (stemmed) tokens (:73-166)
    assert json.loads(body) == ["river", "bank"]
    r, body = _get(url, "/results")
    out = json.loads(body)
    assert isinstance(out["total_time"], int)
    direct = search("rivers banks", idx.pages, idx.postings, idx.lengths,
                    FIELDS, n_docs=idx.n_docs, k=idx.k)
    assert [h["url"] for h in out["results"]] == [d.doc_id for d in direct]
    assert [h["score"] for h in out["results"]] == [d.score for d in direct]
    assert all("snippets" in h for h in out["results"])
    assert r.headers["Access-Control-Allow-Origin"] == "*"


def test_stateful_overwrite_and_phrase_tokens(served):
    url, idx = served
    # second POST overwrites the stored query (controller-field parity)
    _, body = _post(url, "/search?query=%22big%20tables%22%20OR%20%22rivers%22")
    assert json.loads(body) == ["big tables", "OR", "rivers"]
    _, body = _get(url, "/results")
    urls = {h["url"] for h in json.loads(body)["results"]}
    assert urls == {"u0", "u1", "u2"}


def test_invalid_and_empty_queries(served):
    url, _ = served
    _, body = _post(url, "/search?query=")
    assert json.loads(body) == []
    _, body = _post(url, '/search?query=%22unclosed')
    assert json.loads(body) == []  # unmatched quote → invalid → []
    # invalid POST cleared the stored query → /results ranks nothing
    _, body = _get(url, "/results")
    assert json.loads(body)["results"] == []


def test_suggestions_contains_limit5(served):
    url, idx = served
    for q in ("rivers banks", "river rafting", "big rivers", "tables"):
        _post(url, "/search?query=" + urllib.parse.quote(q))
    _, body = _get(url, "/suggestions?query=RIVER")
    got = json.loads(body)
    # case-insensitive contains (DBManager.java:717), every hit has it
    assert got and all("river" in s.lower() for s in got) and len(got) <= 5
    _, body = _get(url, "/suggestions?query=")
    assert json.loads(body) == []  # :709-712


def test_unknown_path_404(served):
    url, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(url, "/nope")
    assert e.value.code == 404
