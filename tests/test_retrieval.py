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


def test_tfidf_search_matches_numpy(spark):
    """tfidf_doc_norms + tfidf_search replicate a numpy TF-IDF cosine on a
    tiny corpus (smooth idf ln((1+N)/(1+df))+1, uniform query weights)."""
    import math

    from pyveb_spark.operators.retrieval import (
        build_inverted_index,
        tfidf_doc_norms,
        tfidf_search,
    )

    docs = [
        (1, "a b a c"),
        (2, "b c d"),
        (3, "d d e"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    postings, docstats = build_inverted_index(df, "doc_id", "text")
    norms = tfidf_doc_norms(postings, docstats)

    def idf(dfreq, n=3):
        return math.log((1.0 + n) / (1.0 + dfreq)) + 1.0

    # doc 1 vector: a:2*idf(1), b:1*idf(2), c:1*idf(2)
    w1 = {"a": 2 * idf(1), "b": idf(2), "c": idf(2)}
    n1 = math.sqrt(sum(v * v for v in w1.values()))
    expect1 = round((w1["a"] + w1["b"]) / n1, 6)

    out = {r.doc_id: (r.score, r.n_matched)
           for r in tfidf_search(postings, docstats, norms, ["a", "b"], k=3)
           .collect()}
    assert out[1] == (expect1, 2)
    assert 3 not in out  # doc 3 has no query token
    # ranking: doc 1 (two matches incl. the rare 'a') above doc 2
    assert out[1][0] > out[2][0]


def test_tfidf_q116_rounding_boundary_margins(spark, sf_dir):
    """Every per-doc score sits ≥ 1e-5 (in 1e-6-scaled units) from a
    round-half boundary, so the cross-engine double divergence (~5e-9
    scaled) cannot flip round(score, 6) — the q44/q103 margin treatment."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    scores = con.execute("""
        WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
                      FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1,2),
        dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        stats AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
        w AS (SELECT t.doc_id, t.token,
                     t.tf * (ln((1.0+s.n_docs)/(1.0+d.df)) + 1.0) AS w
              FROM tf t JOIN dfq d USING (token) CROSS JOIN stats s),
        norms AS (SELECT doc_id, sqrt(SUM(w*w)) AS norm FROM w GROUP BY 1),
        num AS (SELECT doc_id, SUM(w) AS num FROM w
                WHERE token IN ('hash','merge','scan','window') GROUP BY 1)
        SELECT n.num / m.norm FROM num n JOIN norms m USING (doc_id)
    """).fetchall()
    assert scores
    for (s,) in scores:
        frac = abs((s * 1e6) % 1.0 - 0.5)
        assert frac > 1e-5, f"score {s} too close to a rounding boundary"
