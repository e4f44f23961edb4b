"""Unit tests for the round-8 operator heads (q187+)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_margin_mine_demotes_hubs(spark):
    """The ratio margin must rank a tight MUTUAL pair above a hub pair
    with nearly the same raw cosine — the whole point of the criterion."""
    from pyveb_spark.operators.similarity import margin_bitext_mine

    rows = [
        ("s1", "t1", 0.90),
        ("s1", "thub", 0.85),
        ("s2", "thub", 0.85),
        ("s3", "thub", 0.85),
        ("s2", "t1", 0.10),
        ("s3", "t1", 0.10),
    ]
    pairs = spark.createDataFrame(
        rows, "src_id string, tgt_id string, cosine_sim double"
    )
    out = {
        (r.src_id, r.tgt_id): r.margin
        for r in margin_bitext_mine(pairs, k=2).collect()
    }
    # avg_2(s1)=.875 avg_2(t1)=.5 avg_2(thub)=.85
    assert abs(out[("s1", "t1")] - round(0.90 / 0.6875, 6)) < 1e-9
    assert abs(out[("s1", "thub")] - round(0.85 / 0.8625, 6)) < 1e-9
    assert out[("s1", "t1")] > out[("s1", "thub")]


def test_margin_mine_candidate_set_is_topk_union(spark):
    """Only pairs where an endpoint ranks the other in its top-k
    survive; everything else is dropped before margin scoring."""
    from pyveb_spark.operators.similarity import margin_bitext_mine

    rows = [
        ("s%d" % i, "t%d" % j, 0.5 + 0.01 * i - 0.001 * j)
        for i in range(3)
        for j in range(5)
    ]
    pairs = spark.createDataFrame(
        rows, "src_id string, tgt_id string, cosine_sim double"
    )
    out = margin_bitext_mine(pairs, k=1)
    kept = {(r.src_id, r.tgt_id) for r in out.collect()}
    # each src keeps its single best tgt (t0 — highest score), and each
    # tgt keeps its single best src (s2)
    assert kept == {
        ("s0", "t0"), ("s1", "t0"), ("s2", "t0"),
        ("s2", "t1"), ("s2", "t2"), ("s2", "t3"), ("s2", "t4"),
    }


def test_tombstone_cascade_flags_follow_fk_chain(spark):
    from pyveb_spark.operators.cleaning import tombstone_cascade

    cust = spark.createDataFrame([(1,), (2,), (3,)], "ck bigint")
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], "ok bigint, ck bigint"
    )
    items = spark.createDataFrame(
        [(10, "a"), (10, "b"), (12, "c"), (13, "d")], "ok bigint, sku string"
    )
    tomb = spark.createDataFrame([(1,), (2,)], "ck bigint")
    out = dict(
        tombstone_cascade(
            tomb,
            [
                ("customer", cust, "ck", "ck"),
                ("orders", orders, "ck", "ok"),
                ("items", items, "ok", None),
            ],
        )
    )
    del_c = {r.ck for r in out["customer"].where("__deleted").collect()}
    del_o = {r.ok for r in out["orders"].where("__deleted").collect()}
    del_i = {
        (r.ok, r.sku) for r in out["items"].where("__deleted").collect()
    }
    assert del_c == {1, 2}
    assert del_o == {10, 11, 12}
    assert del_i == {(10, "a"), (10, "b"), (12, "c")}
    # retained rows keep full fidelity
    assert out["items"].where("NOT __deleted").count() == 1
    # row counts are preserved (flagging never duplicates or drops)
    assert out["orders"].count() == 4


def test_compaction_plan_packs_within_partitions(spark):
    from pyveb_spark.operators.layout import compaction_plan

    rows = [
        # partition p1: files of 300 bytes each, target 1000 -> groups
        # of 3,3,... (0..299,300..599,600..899 | 900.. -> grp 0 thrice,
        # then 900//1000=0? no: before=900 -> grp 0; 4th file before=900
        # is still grp 0 -> pack overflows by one file max, by design)
        ("p1", 0, 300), ("p1", 1, 300), ("p1", 2, 300), ("p1", 3, 300),
        ("p1", 4, 300),
        # a jumbo file larger than target sits alone
        ("p2", 0, 5000), ("p2", 1, 100),
    ]
    df = spark.createDataFrame(rows, "part string, seq int, bytes long")
    out = {
        (r.part, r.seq): r.compaction_group
        for r in compaction_plan(
            df, ["part"], ["seq"], "bytes", 1000
        ).collect()
    }
    # p1: before = 0,300,600,900,1200 -> groups 0,0,0,0,1
    assert [out[("p1", i)] for i in range(5)] == [0, 0, 0, 0, 1]
    # p2: jumbo at before=0 -> grp 0; next file before=5000 -> grp 5
    assert out[("p2", 0)] == 0 and out[("p2", 1)] == 5
    # never crosses partitions: groups restart per partition


def test_embedding_drift_detects_flipped_region(spark):
    from pyveb_spark.operators.profile import embedding_drift

    rows = []
    # label 0: identical distribution in both snapshots -> cos ~ 1
    for i in range(20):
        rows.append((0, "ref", [1.0 + 0.01 * i, 2.0, 0.5]))
        rows.append((0, "cur", [1.0 + 0.01 * i, 2.0, 0.5]))
    # label 1: current snapshot flipped -> cos = -1
    for i in range(20):
        v = [0.5, -1.0, 3.0 + 0.01 * i]
        rows.append((1, "ref", v))
        rows.append((1, "cur", [-x for x in v]))
    df = spark.createDataFrame(
        rows, "label int, snap string, embedding array<double>"
    )
    out = {r.label: r for r in embedding_drift(df, "snap").collect()}
    assert out[0].centroid_cos == 1.0
    assert out[1].centroid_cos == -1.0
    assert out[0].n_ref == 20 and out[0].n_cur == 20
    assert abs(out[0].share_ref - 0.5) < 1e-9


def test_mahalanobis_flags_planted_outlier(spark):
    from pyveb_spark.operators.similarity import mahalanobis_outliers

    import math
    rows = [(i, [math.sin(i * 0.7), math.cos(i * 1.3), 1.0 + 0.01 * i])
            for i in range(50)]
    rows.append((99, [50.0, -50.0, 50.0]))  # planted OOD
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    top = (
        mahalanobis_outliers(df)
        .orderBy("maha_sq", ascending=False)
        .first()
    )
    assert top.vec_id == 99

    # frozen-stats mode: scoring a batch against EXTERNAL stats
    scored = mahalanobis_outliers(
        df, stats=[(0.0, 1.0), (0.0, 1.0), (0.0, 0.0)]  # dim 3 zero-var
    ).collect()
    by_id = {r.vec_id: r.maha_sq for r in scored}
    # zero-variance dim contributes 0; others are plain squared values
    assert abs(by_id[99] - (50.0 ** 2 + 50.0 ** 2)) < 1e-9


def test_q199_group_lcp_is_exact(spark, monkeypatch, tmp_path):
    """The distributed group-LCP must equal the true longest common
    token prefix — including the all-shared cap and a member that is a
    strict prefix of the others."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyveb_spark.queries import QUERIES

    docs = [
        # group 'a b c d': LCP 5 ('a b c d e'), one doc diverges at pos 5
        (1, "a b c d e f g"),
        (2, "a b c d e f g"),
        (3, "a b c d e x y"),
        # group 'k l m n': one member IS the 4-token prefix -> LCP 4
        (4, "k l m n"),
        (5, "k l m n o p"),
        # singleton group: excluded
        (6, "q r s t u"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs]),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["s"] * len(docs)),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {
        r.prefix_key: (r.n_docs, r.lcp_tokens, r.cached_tokens_saved)
        for r in QUERIES["q199_prefix_cache_grouping"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["a b c d"] == (3, 5, 10)
    assert out["k l m n"] == (2, 4, 4)
    assert "q r s t" not in out


def test_lsh_tier_bitext_recall_vs_exact(spark, sf_dir):
    """q200 (LSH candidate tier) vs q189 (exact O(n²) kernel, its recall
    yardstick): every pair the LSH tier mines must exist in the exact
    tier's candidate universe with the IDENTICAL rounded cosine — the LSH
    tier can only lose candidates (single-probe recall curve), never
    invent or re-score them."""
    from pyveb_spark.queries.similarity import (
        q189_bitext_margin_mining,
        q200_bitext_lsh_mining,
    )
    from pyveb_spark.operators.similarity import cosine_pairs
    from pyveb_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    lsh_pairs = {
        (r.src_id, r.tgt_id): r.cosine_sim
        for r in q200_bitext_lsh_mining(spark, sf_dir).collect()
    }
    assert lsh_pairs, "LSH tier mined nothing on the fixture"

    e = read_table(spark, sf_dir, "embeddings")
    n = e.count()
    exact = cosine_pairs(
        e, threshold=0.3, id_col="vec_id", vec_col="embedding",
        n_blocks=max(8, -(-n // 3000)),
    ).collect()
    exact_sims = {}
    for r in exact:
        exact_sims[(r.vec_id_a, r.vec_id_b)] = r.cosine_sim
        exact_sims[(r.vec_id_b, r.vec_id_a)] = r.cosine_sim
    for (s, t), sim in lsh_pairs.items():
        assert s % 2 == 0 and t % 2 == 1  # directed bitext sides
        assert (s, t) in exact_sims, f"LSH invented pair {(s, t)}"
        assert exact_sims[(s, t)] == sim, f"re-scored pair {(s, t)}"
