"""Unit tests: Z-order layout, k-means, runtime Bloom-filter join pruning."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyveb_spark.operators.layout import (
    morton_interleave,
    zorder_layout,
)
from pyveb_spark.operators.similarity import kmeans_assign, kmeans_fit
from pyveb_spark.sources.readers import read_table


def _morton_ref(xs: list[int], bits: int) -> int:
    out = 0
    for b in range(bits):
        for i, x in enumerate(xs):
            out |= ((x >> b) & 1) << (b * len(xs) + i)
    return out


def test_morton_matches_reference(spark):
    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(64)]
    df = spark.createDataFrame(rows, "id int, x int, y int")
    got = df.select(
        "x", "y", morton_interleave([F.col("x"), F.col("y")], 8).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton_ref([r.x, r.y], 8)


def test_morton_locality_is_monotone_per_dimension(spark):
    # fixing one coordinate, the key is strictly increasing in the other
    df = spark.createDataFrame([(i,) for i in range(128)], "x int")
    rows = (
        df.select(
            "x",
            morton_interleave([F.col("x"), F.lit(5)], 8).alias("z"),
        )
        .orderBy("x")
        .collect()
    )
    zs = [r.z for r in rows]
    assert zs == sorted(zs) and len(set(zs)) == len(zs)


def test_morton_rejects_overflow(spark):
    with pytest.raises(ValueError):
        morton_interleave([F.lit(1)] * 4, 16)


def test_zorder_rank_key_is_equidepth_and_deterministic(spark):
    from pyveb_spark.operators.layout import zorder_rank_key

    # skewed y: equi-width bucketing would collapse most rows into a few
    # cells; rank bucketing must spread them evenly by construction
    rows = [(i, i % 7, float(2 ** (i % 16))) for i in range(256)]
    df = spark.createDataFrame(rows, "id int, x int, y double")
    keyed = zorder_rank_key(df, ["x", "y"], bits=4, tiebreak="id")
    got = keyed.select("id", F.col("zkey").alias("z")).collect()
    # deterministic under ties: a second evaluation yields identical keys
    again = {
        r.id: r.z
        for r in zorder_rank_key(df, ["x", "y"], bits=4, tiebreak="id")
        .select("id", F.col("zkey").alias("z"))
        .collect()
    }
    assert {r.id: r.z for r in got} == again
    # equi-depth: de-interleave each dim's bucket; every bucket holds
    # exactly rows/2**bits rows
    def unpick(z, i, bits=4):
        return sum(((z >> (b * 2 + i)) & 1) << b for b in range(bits))

    from collections import Counter

    for dim in (0, 1):
        counts = Counter(unpick(r.z, dim) for r in got)
        assert set(counts) == set(range(16))
        assert set(counts.values()) == {16}


def test_q187_zorder_beats_linear_at_sf001(spark):
    from pyveb_spark.queries import QUERIES

    rows = {
        r["layout"]: r
        for r in QUERIES["q187_zorder_pruning_audit"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert rows["linear"]["rows_matching"] == rows["zorder"]["rows_matching"]
    assert rows["zorder"]["files_scanned"] < rows["linear"]["files_scanned"]
    assert rows["zorder"]["rows_scanned"] < rows["linear"]["rows_scanned"]


def _file_spans(spark, path: str, col: str) -> list[float]:
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    rows = (
        df.groupBy("__f")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .collect()
    )
    return [float(r.span) for r in rows]


def test_zorder_tightens_minmax_on_both_dims(spark, sf_dir):
    """The point of the layout: per-file min/max ranges shrink on BOTH
    clustered columns vs the natural (insertion-ordered) layout, so
    Parquet stats prune scans filtered on either."""
    e = read_table(spark, sf_dir, "events").select("user_id", "value")
    tmp = tempfile.mkdtemp(prefix="zorder_")
    try:
        n_files = 16
        e.repartition(n_files).write.parquet(os.path.join(tmp, "plain"))
        zorder_layout(e, ["user_id", "value"], n_files).write.parquet(
            os.path.join(tmp, "z")
        )
        for col in ("user_id", "value"):
            plain = _file_spans(spark, os.path.join(tmp, "plain"), col)
            z = _file_spans(spark, os.path.join(tmp, "z"), col)
            # average per-file span at least halves on every dimension
            assert sum(z) / len(z) < 0.5 * (sum(plain) / len(plain)), col
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _kmeans_ref(vecs: np.ndarray, init: np.ndarray, iters: int):
    cent = init.copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for i in range(len(cent)):
            m = assign == i
            if m.any():
                cent[i] = vecs[m].mean(axis=0)
    d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return cent, d.argmin(axis=1)


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(e, k=5, max_iter=4, tol=0.0)
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assign(e, centroids).select(
            "vec_id", "cluster"
        ).collect()
    }

    rows = e.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    vecs = np.array([[float(x) for x in r.embedding] for r in rows])
    ids = [r.vec_id for r in rows]
    # replicate the deterministic init: smallest md5-48 of 'ivf|<id>'
    # (similarity.py::_seed_centroids portable ordering)
    import hashlib

    seed_ids = sorted(
        ids,
        key=lambda i: (
            int(hashlib.md5(f"ivf|{i}".encode()).hexdigest()[:12], 16),
            i,
        ),
    )[:5]
    init = np.array([vecs[ids.index(i)] for i in seed_ids])
    _, ref_assign = _kmeans_ref(vecs, init, iters=4)
    mismatch = sum(
        1 for vid, ref in zip(ids, ref_assign) if got[vid] != ref
    )
    # float-accumulation-order differences may flip only boundary points
    assert mismatch <= len(ids) * 0.01


def test_kmeans_inertia_decreases(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    from pyveb_spark.operators.similarity import nearest_centroid

    def inertia(cents):
        return (
            e.select(
                nearest_centroid(F.col("embedding"), cents)["dist"].alias(
                    "d"
                )
            )
            .agg(F.sum("d"))
            .first()[0]
        )

    c1 = kmeans_fit(e, k=8, max_iter=1, tol=0.0)
    c5 = kmeans_fit(e, k=8, max_iter=5, tol=0.0)
    assert inertia(c5) <= inertia(c1) * (1 + 1e-9)
    assert math.isfinite(inertia(c5))


def test_random_projection_preserves_cosine(spark, sf_dir):
    from pyveb_spark.operators.similarity import (
        cosine_sim_expr,
        random_projection,
    )

    e = read_table(spark, sf_dir, "embeddings").limit(50)
    q = [float(x) for x in e.where(F.col("vec_id") == 0).first().embedding]
    proj = random_projection(e, dim_in=64, dim_out=32)
    # project the query through the SAME seeded planes via a 1-row df
    qp_row = random_projection(
        e.where(F.col("vec_id") == 0), dim_in=64, dim_out=32
    ).first()
    qp = [float(x) for x in qp_row.proj]
    rows = proj.select(
        "vec_id",
        cosine_sim_expr(F.col("embedding"), q).alias("orig"),
        cosine_sim_expr(F.col("proj"), qp).alias("reduced"),
    ).collect()
    # JL: per-pair distortion is ~N(0, 1/√dim_out) — assert the band
    # statistically (mean abs error) plus a generous per-pair ceiling
    errs = [abs(r.orig - r.reduced) for r in rows]
    assert sum(errs) / len(errs) < 0.2, sum(errs) / len(errs)
    assert max(errs) < 0.6, max(errs)
    # and the projection is deterministic across invocations
    again = random_projection(e, dim_in=64, dim_out=32).select(
        "vec_id", "proj"
    )
    diff = (
        proj.select("vec_id", F.col("proj").alias("p1"))
        .join(again.withColumnRenamed("proj", "p2"), "vec_id")
        .where(F.to_json(F.col("p1")) != F.to_json(F.col("p2")))
    )
    assert diff.count() == 0


def test_l2_normalize_and_mean_pool(spark):
    from pyveb_spark.operators.similarity import l2_normalize, mean_pool

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (1, [1.0, 0.0]), (2, [0.0, 0.0])],
        "k int, embedding array<double>",
    )
    normed = df.select("k", l2_normalize(F.col("embedding")).alias("n"))
    rows = normed.collect()
    for r in rows:
        norm = sum(x * x for x in r.n) ** 0.5
        assert norm == pytest.approx(1.0) or norm == 0.0  # zero-vec safe
    pooled = {
        r.k: r.embedding for r in mean_pool(df, ["k"]).collect()
    }
    assert pooled[1] == [pytest.approx(2.0), pytest.approx(2.0)]
    assert pooled[2] == [0.0, 0.0]


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, sf_dir):
    """Scale feature: with a selective build side, Spark 3.5+/4.x injects a
    bloom_filter probe into the large-table scan of a shuffle join —
    reducing shuffled rows before the exchange. Verified here with the
    size thresholds lowered to fixture scale; production defaults engage
    at real sizes (session profile keeps the feature enabled)."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        l = read_table(spark, sf_dir, "lineitem")
        o = read_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower(), plan
        assert joined.count() >= 1
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# --------------------------------------------------------------------------
# Product quantization (q87 operators)
# --------------------------------------------------------------------------


def test_pq_encode_matches_numpy_and_compresses(spark, sf_dir):
    """Codes equal the numpy per-subspace argmin against the trained
    codebooks, and the encoded representation is m small ints."""
    from pyveb_spark.operators.similarity import pq_encode, pq_train

    e = read_table(spark, sf_dir, "embeddings")
    cbs = pq_train(e, m=4, k=16, iters=2)
    assert len(cbs) == 4 and all(len(cb) == 16 for cb in cbs)
    got = {
        r.vec_id: list(r.pq_codes)
        for r in pq_encode(e, cbs).select("vec_id", "pq_codes").collect()
    }
    pdf = e.select("vec_id", "embedding").toPandas()
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    dsub = X.shape[1] // 4
    for j, cb in enumerate(cbs):
        C = np.asarray([c for _, c in cb])
        S = X[:, j * dsub : (j + 1) * dsub]
        want = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
        for i, vid in enumerate(ids):
            assert got[vid][j] == want[i], (vid, j)
    assert all(0 <= c < 16 for codes in got.values() for c in codes)


def test_pq_adc_shortlist_recall(spark, sf_dir):
    """The two-stage PQ contract: a 4-byte-code ADC shortlist of 50 must
    recall most of the exact squared-L2 top-10 (measured 7/10 on this
    fixture) — the property that makes shortlist+exact-re-rank serve
    accurate top-k while the coarse pass never touches a float vector."""
    from pyveb_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    e = read_table(spark, sf_dir, "embeddings")
    pdf = e.select("vec_id", "embedding").toPandas()
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    qi = ids.tolist().index(0)
    exact = ((X - X[qi]) ** 2).sum(1)
    exact_top = set(ids[np.argsort(exact)][1:11])

    cbs = pq_train(e, m=4, k=16, iters=2)
    enc = pq_encode(e, cbs)
    short = [
        r.vec_id
        for r in pq_adc_topk(
            enc, cbs, [float(x) for x in X[qi]], k=50, exclude_ids=[0]
        ).collect()
    ]
    assert len(short) == 50
    assert len(set(short) & exact_top) >= 5, (short, sorted(exact_top))
    # ADC ordering matches the numpy reference on the shortlist
    dsub = X.shape[1] // 4
    codes = {r.vec_id: list(r.pq_codes) for r in enc.collect()}
    luts = []
    for j, cb in enumerate(cbs):
        C = np.asarray([c for _, c in cb])
        luts.append(((C - X[qi][j * dsub : (j + 1) * dsub]) ** 2).sum(1))
    adc = {
        vid: sum(luts[j][codes[vid][j]] for j in range(4))
        for vid in ids if vid != 0
    }
    want = sorted(adc, key=lambda vid: (adc[vid], vid))[:50]
    assert short == want


def test_pq_train_validates_divisibility(spark, sf_dir):
    from pyveb_spark.operators.similarity import pq_train

    e = read_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(e, m=7)


# --------------------------------------------------------------------------
# Small-files compaction
# --------------------------------------------------------------------------


def test_compact_files_reduces_file_count_preserving_data(spark, tmp_path):
    from pyveb_spark.operators.layout import compact_files

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 tiny files
    before = [p for p in os.listdir(path) if p.endswith(".parquet")]
    assert len(before) == 64

    n = compact_files(spark, path, target_mb=256)
    after = [p for p in os.listdir(path) if p.endswith(".parquet")]
    assert n == 1 and len(after) == 1  # 10k rows ≪ 256 MB → one file
    got = spark.read.parquet(path)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).first()[0] == 2 * sum(range(10_000))
    assert not os.path.exists(path + ".__compact__")


def test_compact_files_partitioned_mode(spark, tmp_path):
    from pyveb_spark.operators.layout import compact_files

    path = str(tmp_path / "bydate")
    df = spark.range(1000).withColumn("day", (F.col("id") % 3).cast("int"))
    df.repartition(16).write.partitionBy("day").parquet(path)
    per_part_before = len(os.listdir(os.path.join(path, "day=0")))
    assert per_part_before > 1

    compact_files(spark, path, partition_cols=["day"])
    for d in range(3):
        files = [
            p
            for p in os.listdir(os.path.join(path, f"day={d}"))
            if p.endswith(".parquet")
        ]
        assert len(files) == 1, f"day={d} not compacted"
    got = spark.read.parquet(path)
    assert got.count() == 1000
    assert got.select("day").distinct().count() == 3


def test_ivfpq_matches_pq_restricted_to_probed_lists(spark, sf_dir):
    """ivfpq_search must equal pq_adc_topk run over only the vectors the
    coarse probe admits — the composition contract."""
    from pyveb_spark.operators.similarity import (
        ivf_index,
        ivfpq_search,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    e = read_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in e.where(F.col("vec_id") == 0).first().embedding]
    indexed, cents = ivf_index(e, n_lists=16)
    cbs = pq_train(e, m=4, k=16, iters=1)
    enc = pq_encode(indexed, cbs)

    got = [
        (r.vec_id, r.adc_dist)
        for r in ivfpq_search(
            enc, cents, cbs, q, nprobe=4, shortlist=20, exclude_ids=[0]
        ).collect()
    ]
    by_dist = sorted(
        cents, key=lambda c: sum((a - b) ** 2 for a, b in zip(q, c[1]))
    )
    probe = [i for i, _ in by_dist[:4]]
    want = [
        (r.vec_id, r.adc_dist)
        for r in pq_adc_topk(
            enc.where(F.col("ivf_list").isin(probe)),
            cbs, q, k=20, exclude_ids=[0],
        ).collect()
    ]
    assert got == want and 0 < len(got) <= 20
    # nprobe = n_lists degrades to plain PQ over the full corpus
    all_probe = [
        r.vec_id
        for r in ivfpq_search(
            enc, cents, cbs, q, nprobe=16, shortlist=20, exclude_ids=[0]
        ).collect()
    ]
    full = [
        r.vec_id
        for r in pq_adc_topk(enc, cbs, q, k=20, exclude_ids=[0]).collect()
    ]
    assert all_probe == full
