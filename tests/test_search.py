"""End-to-end search() over the golden query shapes — the reference's
commented suite at queryengine/QueryEngine.java:360-375: bare terms, a
quoted phrase, `X OR Y`, `X AND Y NOT Z`."""

from __future__ import annotations

import pytest

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


@pytest.fixture(scope="module")
def corpus(spark):
    pages = spark.createDataFrame(
        [(u, h1, other, 1.0 if u != "u2" else 5.0) for u, h1, other in DOCS],
        "url string, h1 string, other string, rank double",
    ).cache()
    # reference stems BOTH index (I4) and query terms (Q2)
    postings = indexer.build_postings(pages, "url", FIELDS, stem=True).cache()
    lengths = indexer.field_lengths(pages, "url", FIELDS, stem=True).cache()
    return pages, postings, lengths


def _run(corpus, q, **kw):
    pages, postings, lengths = corpus
    return search(q, pages, postings, lengths, FIELDS, n_docs=len(DOCS),
                  snippet_field="other", **kw)


def test_bare_terms(corpus):
    res = _run(corpus, "rivers banks")
    assert res and res[0].doc_id == "u1"
    assert "<b>rivers</b>" in res[0].snippet


def test_quoted_phrase(corpus):
    res = _run(corpus, '"big tables"')
    ids = [r.doc_id for r in res]
    assert set(ids) == {"u0", "u2"}
    # u2 carries the 5.0 PageRank boost → first
    assert ids[0] == "u2"


def test_boolean_or(corpus):
    res = _run(corpus, '"rivers" OR "tables"')
    assert {r.doc_id for r in res} == {"u0", "u1", "u2"}


def test_boolean_and_not(corpus):
    res = _run(corpus, '"spark" AND "tables" NOT "joy"')
    # u0 and u2 contain both; u2 also contains 'joy' → excluded
    assert {r.doc_id for r in res} == {"u0"}


def test_invalid_query(corpus):
    assert _run(corpus, '"unclosed') == []
    assert _run(corpus, '"a" OR "b" AND "c" NOT "d"') == []  # >2 operators
