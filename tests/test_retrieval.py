"""BM25 inverted-index retrieval tests (operators/retrieval.py)."""

from __future__ import annotations

import math

from pyveb_spark.operators.retrieval import bm25_search, build_inverted_index


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_postings_and_docstats_shapes(spark):
    docs = _mkdocs(spark, [(1, "a b a"), (2, "b c"), (3, "c c c")])
    postings, docstats = build_inverted_index(docs)
    p = {(r.token, r.doc_id): (r.tf, r.df) for r in postings.collect()}
    assert p[("a", 1)] == (2, 1)  # tf 2, appears in 1 doc
    assert p[("b", 1)] == (1, 2) and p[("b", 2)] == (1, 2)
    assert p[("c", 3)] == (3, 2)
    s = {r.doc_id: (r.dl, r.n_docs, r.avgdl) for r in docstats.collect()}
    assert s[1] == (3, 3, 8 / 3) and s[3][0] == 3


def test_bm25_ranks_dedicated_doc_first(spark):
    docs = _mkdocs(
        spark,
        [
            (1, "spark shuffle join spark shuffle"),
            (2, "spark banana apple pear plum"),
            (3, "banana apple pear plum grape"),
        ],
    )
    postings, docstats = build_inverted_index(docs)
    out = bm25_search(postings, docstats, ["spark", "shuffle"], k=3).collect()
    assert [r.doc_id for r in out] == [1, 2]  # doc 3 matches nothing
    assert out[0].n_matched == 2 and out[1].n_matched == 1
    assert out[0].bm25 > out[1].bm25 > 0


def test_bm25_matches_reference_formula(spark):
    docs = _mkdocs(spark, [(1, "x y"), (2, "x x z w")])
    postings, docstats = build_inverted_index(docs)
    out = {r.doc_id: r.bm25 for r in bm25_search(postings, docstats, ["x"], k=5).collect()}
    n, avgdl = 2, 3.0
    df = 2
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def score(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert abs(out[1] - round(score(1, 2), 6)) < 1e-9
    assert abs(out[2] - round(score(2, 4), 6)) < 1e-9


def test_bm25_query_token_dedup(spark):
    docs = _mkdocs(spark, [(1, "q r"), (2, "r s")])
    postings, docstats = build_inverted_index(docs)
    once = bm25_search(postings, docstats, ["q"], k=2).collect()
    twice = bm25_search(postings, docstats, ["q", "q"], k=2).collect()
    assert [(r.doc_id, r.bm25) for r in once] == [
        (r.doc_id, r.bm25) for r in twice
    ]
