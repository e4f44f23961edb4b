"""Tests: REST fan-out (fake transport), multimodal plumbing (fake kernels),
dedup/similarity/text operators, DDL bridges (FIXTURES.md fixture 8)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, LongType, StringType, TimestampType

from pyveb_spark.operators.dedup import (
    exact_dedup,
    keep_first,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from pyveb_spark.operators.multimodal import (
    decode_images,
    extract_features,
    media_table,
)
from pyveb_spark.operators.similarity import cosine_topk, cosine_topk_lsh, knn_join
from pyveb_spark.operators.text import doc_fingerprint, language_id, quality_score
from pyveb_spark.plans.ddl import (
    schema_from_pandas,
    schema_from_sqlserver_ddl,
    warehouse_create_table,
)
from pyveb_spark.sources.readers import read_table
from pyveb_spark.sources.rest import RetryPolicy, rest_fanout, with_api_params


# --- REST fan-out -----------------------------------------------------------

def test_rest_fanout_fake_transport(spark):
    params = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, v string"
    )
    prepared = with_api_params(params, id_col="k")

    def fake_fetch(url, query):
        if query.get("v") == "y":
            return 500, "boom"
        return 200, json.dumps({"echo": query.get("v"), "n": 1})

    out = rest_fanout(
        prepared, "http://fake", fetcher=fake_fetch,
        retry=RetryPolicy(attempts=2, base_delay=0.0, max_delay=0.0),
    ).cache()
    rows = {r.api_id: r for r in out.collect()}
    assert rows[1].status == 200 and json.loads(rows[1].body)["echo"] == "x"
    assert rows[2].status == 500 and rows[2].error == "boom" and rows[2].attempts == 2
    assert rows[3].status == 200
    # param echo survives for linking (api_client.py:256-305 parity)
    assert json.loads(rows[2].api_params)["v"] == "y"


def test_rest_fanout_fk_params_not_sent(spark):
    params = spark.createDataFrame([(1, "a", "ref9")], "k long, v string, fk_ref string")
    prepared = with_api_params(params, id_col="k")
    seen = {}

    def fake_fetch(url, query):
        return 200, json.dumps(query)

    row = rest_fanout(prepared, "http://fake", fetcher=fake_fetch).first()
    sent = json.loads(row.body)
    assert "fk_ref" not in sent and sent["v"] == "a"
    assert json.loads(row.api_params)["fk_ref"] == "ref9"  # kept in echo


def test_retry_policy_backoff_accounting():
    calls = []

    def flaky():
        calls.append(1)
        return (503, "unavailable") if len(calls) < 3 else (200, "ok")

    status, body, attempts = RetryPolicy(
        attempts=4, base_delay=0.0, max_delay=0.0
    ).call(flaky)
    assert (status, body, attempts) == (200, "ok", 3)


# --- multimodal -------------------------------------------------------------

def test_media_pipeline_fake_kernels(spark):
    df = spark.createDataFrame(
        [("m1", bytearray(b"payload-one"), "png"), ("m2", bytearray(b"payload-two"), "jpg")],
        "id string, blob binary, fmt string",
    )
    media = media_table(df, "id", "blob", fmt_col="fmt")
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    m = {r.media_id: r.meta for r in media.collect()}
    assert m["m1"]["n_bytes"] == 11 and m["m1"]["format"] == "png"

    decoded = decode_images(media, fake=True)
    d = {r.media_id: r.meta for r in decoded.collect()}
    assert d["m1"]["width"] is not None and 16 <= d["m1"]["width"] < 80
    # deterministic fake: same payload → same dims on re-run
    d2 = {r.media_id: r.meta for r in decode_images(media, fake=True).collect()}
    assert d == d2

    featured = extract_features(decoded, dim=8, fake=True)
    r = featured.first()
    assert len(r.embedding) == 8
    norm = sum(x * x for x in r.embedding) ** 0.5
    assert abs(norm - 1.0) < 1e-5

    # non-BMP payload without a codec → guided error from the kernel
    with pytest.raises(Exception, match="neither BMP nor PGM"):
        decode_images(media).collect()


def test_real_bmp_and_wav_kernels(spark):
    """The REAL pure-numpy decoders: Spark-native synth_bmp/synth_wav
    payloads round-trip bit-exactly through decode_images/decode_audio —
    no fake kernel, no injected decoder, actual header bytes parsed."""
    from pyspark.sql import functions as F

    from pyveb_spark.operators.multimodal import (
        decode_audio,
        decode_bmp,
        decode_wav,
        synth_bmp,
        synth_wav,
    )

    imgs = spark.range(4).select(
        F.col("id").cast("string").alias("media_id"),
        synth_bmp(
            (F.lit(17) + F.col("id")).cast("int"),
            (F.lit(33) + F.col("id") * 2).cast("int"),
        ).alias("payload"),
    )
    media = media_table(imgs, "media_id", "payload")
    dims = {
        int(r.media_id): (r.meta["width"], r.meta["height"])
        for r in decode_images(media).collect()  # default = real BMP kernel
    }
    assert dims == {i: (17 + i, 33 + 2 * i) for i in range(4)}

    wavs = spark.range(3).select(
        F.col("id").alias("media_id"),
        synth_wav(
            (F.lit(1) + F.col("id") % 2).cast("int"),
            (F.lit(8000) * (F.lit(1) + F.col("id") % 3)).cast("int"),
            (F.lit(50) + F.col("id") * 11).cast("int"),
        ).alias("payload"),
    )
    got = {
        r.media_id: (r.channels, r.sample_rate, r.n_samples)
        for r in decode_audio(wavs).collect()
    }
    assert got == {
        0: (1, 8000, 50),
        1: (2, 16000, 61),
        2: (1, 24000, 72),
    }

    # local kernel edge cases: bad magic fails loudly, not silently
    with pytest.raises(ValueError):
        decode_bmp(b"PNG rubbish")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAIFF")
    # top-down BMP (negative height) normalizes
    import struct

    hdr = b"BM" + b"\x00" * 12 + struct.pack("<i", 40) + struct.pack(
        "<ii", 64, -48
    )
    assert decode_bmp(hdr) == (64, 48)


def test_safe_decode_images_routes_corruption(spark):
    """safe_decode_images quarantines malformed payloads into the stable
    status vocabulary instead of failing the job (the 100 TB contract:
    decode errors are data), and still decodes good BMP/PGM rows to
    exact dimensions through the same per-row magic routing."""
    import struct

    from pyveb_spark.operators.multimodal import safe_decode_images

    good_bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<i", 40)
        + struct.pack("<ii", 64, -48)
    )
    rows = [
        ("good_bmp", bytearray(good_bmp)),
        ("good_pgm", bytearray(b"P5\n4 3\n255\n" + b"\x07" * 12)),
        ("trunc_bmp", bytearray(b"BM" + b"\x00" * 10)),
        ("bad_magic", bytearray(b"ZZ not a known container")),
        ("bad_maxval", bytearray(b"P5\n2 2\n999\n" + b"\x00" * 4)),
        ("short_raster", bytearray(b"P5\n4 4\n255\n" + b"\x01" * 3)),
        ("null_payload", None),
    ]
    df = spark.createDataFrame(rows, "name string, payload binary")
    got = {
        r.name: (r.width, r.height, r.decode_status)
        for r in safe_decode_images(df).collect()
    }
    assert got == {
        "good_bmp": (64, 48, None),
        "good_pgm": (4, 3, None),
        "trunc_bmp": (None, None, "truncated"),
        "bad_magic": (None, None, "bad_magic"),
        "bad_maxval": (None, None, "bad_header"),
        "short_raster": (None, None, "truncated"),
        "null_payload": (None, None, "null_payload"),
    }


# --- dedup / similarity / text ---------------------------------------------

def test_exact_dedup_and_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "b")], "k int, g string"
    )
    assert exact_dedup(df).count() == 3
    firsts = {r.g: r.k for r in keep_first(df, keys=["g"], order_by=["k"]).collect()}
    assert firsts == {"a": 1, "b": 3}


def test_minhash_recall_on_near_dups(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_id_a, r.doc_id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    lsh = {
        (r.doc_id_a, r.doc_id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.8
        ).collect()
    }
    assert lsh <= exact  # precision 1.0 (exact verify stage)
    # banded LSH at (32,8) must catch nearly everything at j>=0.8
    assert len(lsh) >= 0.9 * len(exact)


def test_simhash_near_dups_close_in_hamming(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.9).limit(3)
    sh = simhash(docs, "doc_id", "text")
    joined = (
        pairs.join(sh.withColumnsRenamed({"doc_id": "doc_id_a", "simhash": "sh_a"}), "doc_id_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_id_b", "simhash": "sh_b"}), "doc_id_b")
        .select(F.expr("bit_count(sh_a ^ sh_b)").alias("hamming"))
    )
    for r in joined.collect():
        assert r.hamming <= 16  # near-dups land close in simhash space


def test_incremental_lsh_lookup_matches_batch(spark, sf_dir):
    """Checking a new batch against a prebuilt index must find exactly the
    batch↔corpus pairs the all-pairs algorithm finds (same hash pipeline,
    same verify) — the incremental-ingest dedup contract."""
    from pyveb_spark.operators.dedup import (
        minhash_lsh_index,
        minhash_lsh_lookup,
    )

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") >= 100)
    batch = docs.where(F.col("doc_id") < 100)
    index = minhash_lsh_index(corpus, "doc_id", "text")
    got = {
        (r.doc_id_new, r.doc_id_corpus)
        for r in minhash_lsh_lookup(
            batch, index, "doc_id", "text", threshold=0.8
        ).collect()
    }
    full = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    expected = set()
    for r in full.collect():
        if r.doc_id_a < 100 and r.doc_id_b >= 100:
            expected.add((r.doc_id_a, r.doc_id_b))
        elif r.doc_id_b < 100 and r.doc_id_a >= 100:
            expected.add((r.doc_id_b, r.doc_id_a))
    assert got == expected and len(got) > 0


def test_simhash_order_invariant_and_identical_pairs(spark):
    from pyveb_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "d c b a"), (3, "p q r s t u v w x y z")],
        "doc_id bigint, text string",
    )
    fps = {r.doc_id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    # SimHash sums per-bit signs over the token multiset → order-invariant
    assert fps[1] == fps[2] and fps[1] != fps[3]
    got = {
        (r.doc_id_a, r.doc_id_b, r.hamming)
        for r in simhash_pairs(df, "doc_id", "text").collect()
    }
    assert (1, 2, 0) in got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(df, "doc_id", "text", max_hamming=4, bands=4)


def test_simhash_pairs_pigeonhole_lossless(spark, sf_dir):
    """Banding must find EVERY pair within max_hamming (pigeonhole) —
    verified against a brute-force driver-side scan of the fingerprints."""
    from pyveb_spark.operators.dedup import simhash_pairs

    docs = read_table(spark, sf_dir, "documents").limit(150)
    fps = [(r.doc_id, r.simhash) for r in simhash(docs, "doc_id", "text").collect()]
    brute = set()
    for i, (ida, fa) in enumerate(fps):
        for idb, fb in fps[i + 1 :]:
            h = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                brute.add((min(ida, idb), max(ida, idb), h))
    got = {
        (r.doc_id_a, r.doc_id_b, r.hamming)
        for r in simhash_pairs(
            docs, "doc_id", "text", max_hamming=3, bands=4
        ).collect()
    }
    assert got == brute


def test_knn_join_and_lsh_topk(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").limit(100)
    knn = knn_join(emb, emb, k=3)
    counts = knn.groupBy("vec_id").count().collect()
    assert all(r["count"] == 3 for r in counts)
    top = knn.where(F.col("vec_id") == 1).orderBy("rank").collect()
    assert top[0].cosine_sim >= top[1].cosine_sim >= top[2].cosine_sim

    q = [float(x) for x in emb.where(F.col("vec_id") == 1).first().embedding]
    exact_top = cosine_topk(emb, q, k=5, exclude_ids=[1]).collect()
    lsh_top = cosine_topk_lsh(emb, q, k=5, n_planes=4, exclude_ids=[1]).collect()
    # LSH returns a subset of the bucket; scores must never exceed exact best
    if lsh_top:
        assert lsh_top[0].cosine_sim <= exact_top[0].cosine_sim + 1e-9


def test_multi_probe_lsh_recall_is_monotone(spark, sf_dir):
    """Multi-probe LSH: each extra probe widens the candidate set, so the
    result converges monotonically toward exact top-k; at n_probes =
    n_planes+1 every single-bit neighborhood of the query bucket is
    scanned and recall must beat the single-probe baseline on this
    fixture's dispersed vectors."""
    import pytest as _pytest

    emb = read_table(spark, sf_dir, "embeddings").limit(200)
    q = [float(x) for x in emb.where(F.col("vec_id") == 1).first().embedding]
    exact_ids = [
        r.vec_id for r in cosine_topk(emb, q, k=5, exclude_ids=[1]).collect()
    ]
    sizes, hits = [], []
    for p in (1, 3, 5):
        got = cosine_topk_lsh(
            emb, q, k=5, n_planes=4, exclude_ids=[1], n_probes=p
        ).collect()
        sizes.append(len(got))
        hits.append(len({r.vec_id for r in got} & set(exact_ids)))
    assert sizes == sorted(sizes)  # candidate pool only grows
    assert hits == sorted(hits)  # recall never drops with more probes
    assert hits[-1] >= max(hits[0], 1)
    with _pytest.raises(ValueError, match="n_probes"):
        cosine_topk_lsh(emb, q, n_planes=4, n_probes=6)


def test_text_quality_and_lang_and_fingerprint(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    q = quality_score(docs, "text")
    for r in q.select("quality_score").collect():
        assert 0.0 <= r.quality_score <= 1.0
    lang = language_id(docs, "text")
    assert set(lang.select("lang_pred").distinct().toPandas()["lang_pred"]) <= {
        "en", "es", "de", "fr", "zh", "und"
    }
    fp = doc_fingerprint(docs, "text")
    assert fp.select("fingerprint").distinct().count() == 50  # no collisions here


# --- DDL bridges (fixture 8) ------------------------------------------------

def test_sqlserver_schema_bridge():
    schema = schema_from_sqlserver_ddl(
        [
            ("Id", "bigint"),
            ("Amount (EUR)", "decimal(12,2)"),
            ("Created", "datetime2"),
            ("RowVer", "timestamp"),
            ("Guid", "uniqueidentifier"),
        ]
    )
    by_name = {f.name: f.dataType for f in schema.fields}
    assert by_name["Id"] == LongType()
    assert by_name["Amount_EUR"] == DecimalType(12, 2)  # name sanitized, p/s kept
    assert by_name["Created"] == TimestampType()
    assert by_name["RowVer"] == StringType()  # deliberate (parser.py:27)
    assert by_name["Guid"] == StringType()


def test_pandas_schema_bridge_and_ddl():
    import pandas as pd

    pdf = pd.DataFrame(
        {"a": [1], "b": [1.5], "c": ["x"], "d": [pd.Timestamp("2024-01-01")]}
    )
    schema = schema_from_pandas(pdf)
    ddl = warehouse_create_table(schema, "sch.tbl", sort_keys=["a"])
    assert '"a" BIGINT' in ddl and '"b" DOUBLE PRECISION' in ddl
    assert '"c" VARCHAR(MAX)' in ddl and '"d" TIMESTAMP' in ddl
    assert "meta_loading_date_utc" in ddl  # parser.py:6,14 parity
    assert "DISTSTYLE AUTO" in ddl and 'COMPOUND SORTKEY("a")' in ddl


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """nprobe == n_lists degrades IVF to the exact scan: same top-k."""
    from pyveb_spark.operators.similarity import ivf_index, ivf_search

    from pyveb_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where(F.col("vec_id") == 1).first()["embedding"]]
    exact = [
        r["vec_id"]
        for r in cosine_topk(e, qv, k=5, exclude_ids=[1]).collect()
    ]
    indexed, cents = ivf_index(e, n_lists=8)
    full = [
        r["vec_id"]
        for r in ivf_search(
            indexed, cents, qv, k=5, nprobe=8, exclude_ids=[1]
        ).collect()
    ]
    assert full == exact
    # partial probe returns a subset of the probed lists, still k rows
    part = ivf_search(indexed, cents, qv, k=5, nprobe=2, exclude_ids=[1])
    assert part.count() <= 5


def test_cosine_pairs_matches_expr_scoring(spark, sf_dir):
    """The numpy block-matmul path agrees with the Catalyst HOF expression
    scoring (round-4) on every emitted pair."""
    from pyveb_spark.operators.similarity import cosine_pairs, cosine_sim_expr

    from pyveb_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "embeddings").limit(200)
    pairs = cosine_pairs(e, threshold=0.3, extra_cols=["label"])
    rows = pairs.collect()
    assert len(rows) > 0
    sample = rows[:5]
    for r in sample:
        qv = [
            float(x)
            for x in e.where(F.col("vec_id") == r["vec_id_a"]).first()["embedding"]
        ]
        got = (
            e.where(F.col("vec_id") == r["vec_id_b"])
            .select(F.round(cosine_sim_expr(F.col("embedding"), qv), 4).alias("s"))
            .first()["s"]
        )
        assert abs(got - r["cosine_sim"]) <= 1e-4


def test_shingles_short_docs_dont_crash(spark):
    """Docs with < n tokens must produce empty shingle sets, not a
    slice(…, 0, n) crash (code-review regression)."""
    docs = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two words"), (4, "three word doc"),
         (5, "three word doc")],
        "doc_id int, text string",
    )
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.5)
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs.collect()}
    assert got == {(4, 5)}  # only the real dup pair; shorts contribute nothing
    sigs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    assert {(r["doc_id_a"], r["doc_id_b"]) for r in sigs.collect()} <= {(4, 5)}


def test_minhash_hot_bucket_cap(spark, sf_dir):
    """max_bucket_size drops only pairs whose sole collision was a hot
    bucket: with the cap far above any bucket size the output is identical
    to the uncapped run; with cap=1 no bucket survives, so zero pairs."""
    docs = read_table(spark, sf_dir, "documents")
    base = {
        (r.doc_id_a, r.doc_id_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    capped_loose = {
        (r.doc_id_a, r.doc_id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8, max_bucket_size=10**6
        ).collect()
    }
    assert capped_loose == base and len(base) > 0
    capped_hard = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.8, max_bucket_size=1
    ).count()
    assert capped_hard == 0


def test_minhash_cap_drops_hot_band_keeps_normal_pairs(spark):
    """The production skew scenario: a boilerplate bucket (12 identical
    docs — every band collides) is dropped by the cap while an ordinary
    near-dup pair, whose buckets stay small, survives unchanged."""
    boiler = [(i, "cookie banner accept all terms and conditions apply now")
              for i in range(12)]
    near = [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    docs = spark.createDataFrame(boiler + near, "doc_id int, text string")
    capped = {
        (r.doc_id_a, r.doc_id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, max_bucket_size=10
        ).collect()
    }
    # every boilerplate band bucket has 12 members > cap → dropped; the
    # (100, 101) buckets have ≤ 2 members → kept
    assert (100, 101) in capped
    assert all(a >= 100 for a, _ in capped), capped
    uncapped = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, max_bucket_size=None
    ).count()
    assert uncapped > len(capped)  # the 66 boilerplate pairs were real


def test_minhash_lookup_cap_drops_hot_corpus_bucket(spark):
    """Lookup-side cap: a probe doc matching a hot corpus bucket gets no
    candidates from it, but still matches through small buckets."""
    from pyveb_spark.operators.dedup import (
        minhash_lsh_index,
        minhash_lsh_lookup,
    )

    corpus = spark.createDataFrame(
        [(100 + i, "cookie banner accept all terms and conditions apply now")
         for i in range(12)]
        + [(200, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id int, text string",
    )
    batch = spark.createDataFrame(
        [(1, "cookie banner accept all terms and conditions apply now"),
         (2, "the quick brown fox jumps over the lazy dog today")],
        "doc_id int, text string",
    )
    index = minhash_lsh_index(corpus, "doc_id", "text")
    got = {
        (r.doc_id_new, r.doc_id_corpus)
        for r in minhash_lsh_lookup(
            batch, index, "doc_id", "text", threshold=0.5, max_bucket_size=10
        ).collect()
    }
    assert got == {(2, 200)}  # boilerplate matches capped away, real one kept


def test_exact_substring_pairs_and_cap(spark):
    from pyveb_spark.operators.dedup import (
        exact_substring_pairs,
        substring_duplication,
    )

    run = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, run + " tail one here"),
            (2, "lead in tokens " + run),
            (3, run + " other suffix words"),
            (4, "completely different token stream with no overlap at all"),
            (5, "short doc only"),  # < window tokens -> no windows
        ],
        ["doc_id", "text"],
    )

    pairs = exact_substring_pairs(docs, "doc_id", "text", window=8).collect()
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs}
    # all three docs containing the run pair up; 4 and 5 pair with nobody
    assert got == {(1, 2), (1, 3), (2, 3)}
    assert all(r.n_shared_windows >= 1 for r in pairs)

    # cap: the shared window has df=3; cap at 2 drops it entirely
    capped = exact_substring_pairs(
        docs, "doc_id", "text", window=8, max_window_df=2
    ).collect()
    assert capped == []

    cov = {
        r.doc_id: r
        for r in substring_duplication(docs, "doc_id", "text", window=8).collect()
    }
    assert 5 not in cov  # no windows for a 3-token doc
    assert cov[4].dup_frac == 0.0
    # doc 1: 11 tokens -> 4 windows, exactly one (the leading run) duplicated
    assert cov[1].n_windows == 4 and abs(cov[1].dup_frac - 0.25) < 1e-12


def test_semdedup_flags_higher_id_of_near_identical(spark):
    from pyveb_spark.operators.similarity import semdedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0, 0.0]),   # near-identical to 1 -> dup
        (3, [0.0, 1.0, 0.0, 0.0]),       # orthogonal -> kept
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r.is_dup for r in semdedup(df, k=1, tau=0.9).collect()}
    assert out == {1: 0, 2: 1, 3: 0}


def test_decode_images_null_payload_yields_null_dims(spark):
    """A NULL payload must decode to NULL dims — not abort the partition,
    and not depend on whether the NULL sorts first (review fix r4)."""
    from pyspark.sql import functions as F

    from pyveb_spark.operators.multimodal import decode_images, synth_bmp

    imgs = spark.range(3).select(
        F.col("id").cast("string").alias("media_id"),
        F.when(
            F.col("id") == 0, F.lit(None).cast("binary")
        ).otherwise(synth_bmp(F.lit(20), F.lit(30))).alias("payload"),
    ).coalesce(1)  # force the NULL to lead its partition
    media = media_table(imgs, "media_id", "payload")
    d = {r.media_id: (r.meta["width"], r.meta["height"])
         for r in decode_images(media).collect()}
    assert d["0"] == (None, None)
    assert d["1"] == (20, 30) and d["2"] == (20, 30)


def test_explicit_hot_buckets_blacklist_always_applies(spark):
    """An explicitly passed blacklist supersedes max_bucket_size=None —
    the caller built it to protect the job (review fix r4)."""
    from pyveb_spark.operators.dedup import (
        minhash_hot_buckets,
        minhash_lsh_index,
        minhash_lsh_lookup,
    )

    corpus = spark.createDataFrame(
        [(100 + i, "cookie banner accept all terms and conditions apply now")
         for i in range(12)]
        + [(200, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id int, text string",
    )
    batch = spark.createDataFrame(
        [(1, "cookie banner accept all terms and conditions apply now"),
         (2, "the quick brown fox jumps over the lazy dog today")],
        "doc_id int, text string",
    )
    index = minhash_lsh_index(corpus, "doc_id", "text")
    bl = minhash_hot_buckets(index, max_bucket_size=10)
    got = {
        (r.doc_id_new, r.doc_id_corpus)
        for r in minhash_lsh_lookup(
            batch, index, "doc_id", "text", threshold=0.5,
            max_bucket_size=None, hot_buckets=bl,
        ).collect()
    }
    assert got == {(2, 200)}  # boilerplate capped by the explicit blacklist


def test_real_pgm_kernel_roundtrip(spark):
    """Second REAL image codec through the injectable-kernel seam (r4 item
    7): Spark-native synth_pgm payloads round-trip through decode_pgm and
    the decode_images magic sniffer picks the PGM kernel automatically."""
    from pyspark.sql import functions as F

    from pyveb_spark.operators.multimodal import (
        decode_images,
        decode_pgm,
        media_table,
        synth_pgm,
    )

    df = spark.range(3).select(
        F.col("id").alias("doc_id"),
        synth_pgm(F.col("id"), 6, 4).alias("payload"),
    )
    payloads = {r.doc_id: bytes(r.payload) for r in df.collect()}
    # direct kernel: header parses, dims match, raster is w*h bytes
    for seed, b in payloads.items():
        assert decode_pgm(b) == (6, 4)
        header_end = b.index(b"255\n") + 4
        raster = b[header_end:]
        assert len(raster) == 24
        # deterministic pixel formula replayable outside Spark
        assert raster[0] == ((seed + 1) * 7 * 31) % 256
    # comment-tolerant header per the Netpbm spec
    assert decode_pgm(b"P5\n# synthetic\n6 4\n255\n" + bytes(24)) == (6, 4)
    with pytest.raises(ValueError, match="magic"):
        decode_pgm(b"BM rubbish")
    with pytest.raises(ValueError, match="raster"):
        decode_pgm(b"P5\n6 4\n255\n" + bytes(10))
    # sniffer routes P5 payloads without an explicit decoder
    media = media_table(df, "doc_id", "payload")
    decoded = decode_images(media)
    dims = {(r.meta.width, r.meta.height) for r in decoded.collect()}
    assert dims == {(6, 4)}
