"""Multimodal: BMP/WAV kernels, image dHash, audio fingerprints, frame features.

Split from the round-4 queries.py monolith; float determinism contract
in ``pyveb_spark.queries.__doc__``. Registry/gate-window order lives in
``pyveb_spark/queries/__init__.py`` only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyveb_spark.operators.cleaning import clean_old_dates
from pyveb_spark.operators.joins import asof_join
from pyveb_spark.queries._helpers import _dec, _query_vec
from pyveb_spark.sources.readers import read_table



# ---------------------------------------------------------------------------
# LLM ops: multimodal decode plumbing (mapInPandas over binary payloads,
# deterministic fake kernel — oracle replays the sha256-derived dimensions)
# ---------------------------------------------------------------------------

def q38_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → REAL synthetic BMP payloads (54-byte header built
    natively in Spark by ``synth_bmp``, text bytes appended as pixel
    data) → media convention → Arrow-batched REAL header decode
    (``decode_bmp``, pure numpy — no fake kernel) → per-source stats.
    The mapInPandas path parses actual bytes; the oracle re-derives the
    dimensions from the generator formula (width = 16 + len(text) % 64,
    height = 16 + doc_id % 64), so a decoder that misread a single
    header byte would hash-mismatch."""
    from pyveb_spark.operators.multimodal import (
        decode_images,
        media_table,
        synth_bmp,
    )

    d = read_table(spark, sf_dir, "documents")
    w = (F.lit(16) + F.length("text") % 64).cast("int")
    h = (F.lit(16) + F.col("doc_id") % 64).cast("int")
    payload = F.concat(synth_bmp(w, h), F.encode("text", "UTF-8"))
    media = media_table(
        d.withColumn("payload", payload),
        id_col="doc_id",
        payload_col="payload",
    )
    decoded = decode_images(media).select(
        F.col("media_id").cast("bigint").alias("doc_id"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    src = d.select("doc_id", "source")
    return (
        decoded.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.avg("width").alias("avg_width"),
            F.avg("height").alias("avg_height"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("source")
    )


# The oracle replays the BMP GENERATOR formula, not the parse: the Spark
# side must recover exactly these numbers from the real header bytes.
# n_bytes = 54-byte header + the text payload appended as pixel data.
_Q38_SQL = """
WITH dims AS (SELECT source,
                     54 + octet_length(encode(text)) AS n_bytes,
                     16 + (length(text) % 64) AS width,
                     16 + (doc_id % 64) AS height
              FROM documents)
SELECT source, COUNT(*) AS n_media,
       AVG(width) AS avg_width, AVG(height) AS avg_height,
       SUM(n_bytes)::BIGINT AS total_bytes
FROM dims GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# LLM ops: multimodal frames → features (rows-only: stand-in kernels)
# ---------------------------------------------------------------------------

def q67_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped multimodal path: media rows fan out to frames
    (explode-after-decode), every frame re-enters the Arrow feature
    kernel, and the result rolls back up to one row per media item —
    the (sample → featurize → aggregate) shape a video corpus pipeline
    runs, with the byte-slicing stand-ins marked in multimodal.py.
    Oracle-checked: the deterministic frame grid is pure byte-length
    arithmetic (least(max_frames-1, ⌊bytes/64⌋) frames per media row),
    which the DuckDB oracle re-derives — so the whole mapInPandas
    explode→featurize→rollup plumbing sits under the value-hash gate."""
    from pyveb_spark.operators.multimodal import (
        extract_features,
        media_table,
        sample_frames,
    )

    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = media_table(
        d.withColumn("payload", F.encode("text", "UTF-8")),
        id_col="doc_id",
        payload_col="payload",
    )
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    per_frame = frames.select(
        "media_id",
        F.col("frame.frame_no").alias("frame_no"),
        F.encode(F.col("frame.frame_sig"), "UTF-8").alias("payload"),
    )
    feat = extract_features(per_frame, dim=8)  # real byte-histogram kernel
    return (
        feat.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.min("frame_no").alias("first_frame"),
            F.max("frame_no").alias("last_frame"),
            F.size(F.first("embedding")).alias("embedding_dim"),
        )
        .orderBy("media_id")
    )


# media_id is the STRING cast of doc_id (multimodal media convention);
# frame count = least(3, bytes//64) + 1 per sample_frames' sequence bound.
_Q67_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       least(3, octet_length(encode(text)) // 64) + 1 AS n_frames,
       0 AS first_frame,
       least(3, octet_length(encode(text)) // 64) AS last_frame,
       8 AS embedding_dim
FROM documents
WHERE doc_id < 200
ORDER BY media_id
"""


# ---------------------------------------------------------------------------
# LLM ops: temperature source rebalancing (exact-k quota sampling)
# ---------------------------------------------------------------------------

def q66_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ=0.5 temperature rebalancing of the corpus source mix: each
    source's keep-quota is √(nᵢ·n_min) — the smallest source keeps
    everything and every larger source is downsampled to the geometric
    mean of its size and the smallest's, so keep-RATES follow nᵢ^(τ-1)
    = nᵢ^(-1/2), the multilingual-corpus rebalancing recipe. (The
    geometric mean against n_max would be ≥ nᵢ — a no-op.) Selection is
    exact-k by content-hash rank (``ranked_quota_sample``), so the
    keep-set is reproducible on any cluster; √ is correctly-rounded IEEE
    in every engine, which is what lets the oracle re-derive identical
    integer quotas. Output: per-source totals plus the kept-id checksum
    pinning the exact selection."""
    from pyveb_spark.operators.sampling import ranked_quota_sample

    d = read_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("__n"))
    min_n = counts.agg(F.min("__n").alias("__mn"))
    quotas = counts.crossJoin(F.broadcast(min_n)).select(
        "source",
        "__n",
        F.floor(
            F.sqrt((F.col("__n") * F.col("__mn")).cast("double"))
        ).alias("quota"),
    )
    kept = ranked_quota_sample(
        d, "source", ["doc_id"], quotas.select("source", "quota"),
        seed="temp",
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("kept_id_sum"),
        )
        .join(quotas, "source")
        .select(
            "source",
            F.col("__n").alias("n_docs"),
            "quota",
            "n_kept",
            "kept_id_sum",
        )
        .orderBy("source")
    )


_Q66_SQL = """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
q AS (SELECT source, n,
             CAST(FLOOR(SQRT(CAST(n AS DOUBLE)
                             * (SELECT MIN(n) FROM c))) AS BIGINT) AS quota
      FROM c),
r AS (SELECT doc_id, source,
             ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY substr(md5(concat_ws('|', 'temp', doc_id)), 1, 12),
                          doc_id) AS rk
      FROM documents)
SELECT r.source,
       MAX(q.n) AS n_docs,
       MAX(q.quota) AS quota,
       COUNT(*) AS n_kept,
       CAST(SUM(r.doc_id) AS BIGINT) AS kept_id_sum
FROM r JOIN q ON r.source = q.source
WHERE r.rk <= q.quota
GROUP BY r.source
ORDER BY r.source
"""


def q97_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio half of the multimodal decode path: documents → REAL 16-bit
    PCM WAV payloads (44-byte RIFF header + filler frames, built natively
    in Spark by ``synth_wav``) → Arrow-batched REAL header parse
    (``decode_wav``, pure numpy) → per-format stats. The oracle replays
    the generator formulas (channels = 1 + doc_id % 2, rate = 8000 ×
    (1 + doc_id % 3), samples = len(text)), so a decoder misreading any
    RIFF field would hash-mismatch. Duration is held exact as total
    samples; divide by rate at the edge if you need seconds."""
    from pyveb_spark.operators.multimodal import decode_audio, synth_wav

    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    ch = (F.lit(1) + F.col("doc_id") % 2).cast("int")
    sr = (F.lit(8000) * (F.lit(1) + F.col("doc_id") % 3)).cast("int")
    ns = F.length("text").cast("int")
    media = d.select(
        F.col("doc_id"), synth_wav(ch, sr, ns).alias("payload")
    )
    return (
        decode_audio(media)
        .groupBy("channels", "sample_rate")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.col("n_samples").cast("bigint")).alias("total_samples"),
        )
        .orderBy("channels", "sample_rate")
    )


# Oracle = the WAV GENERATOR formulas; the Spark side must recover them
# from the real RIFF header bytes it just built and parsed.
_Q97_SQL = """
SELECT 1 + (doc_id % 2) AS channels,
       8000 * (1 + (doc_id % 3)) AS sample_rate,
       COUNT(*) AS n_clips,
       SUM(length(text))::BIGINT AS total_samples
FROM documents
WHERE doc_id < 300
GROUP BY 1, 2
ORDER BY channels, sample_rate
"""


def q135_image_dhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE detection end-to-end: synthesize REAL 9×8
    24-bpp BMPs (pixel bytes generated in codegen from a per-doc seed,
    ``multimodal.synth_bmp_pixels``), perceptual-hash them by PARSING the
    actual bytes (``dhash_images`` — offsets, bottom-up rows, stride),
    and pair within Hamming ≤ 2 via the generalized pigeonhole banding
    (``dedup.hamming_pairs`` — the SimHash machinery, reused for vision).
    The oracle replays the generator arithmetic straight to the hash (the
    q38 contract: a single misread byte anywhere in the kernel
    hash-mismatches); docs sharing ``doc_id % 37`` carry identical
    images, so the pair set is the duplicate-class structure."""
    from pyveb_spark.operators.dedup import hamming_pairs
    from pyveb_spark.operators.multimodal import (
        dhash_images,
        synth_bmp_pixels,
    )

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 37).cast("int").alias("seed")
    )
    bmp = d.select(
        "doc_id", synth_bmp_pixels(F.col("seed")).alias("payload")
    )
    fp = dhash_images(bmp, "doc_id", "payload")
    return hamming_pairs(
        fp, "doc_id", "dhash", max_hamming=2, bands=4, bits=60
    ).orderBy("doc_id_a", "doc_id_b")


def _q135_sql() -> str:
    terms = []
    for y in range(8):
        for x in range(8):
            bit = y * 8 + x
            if bit >= 60:
                continue
            c0 = (x + 3) * (y + 5) * 17
            c1 = (x + 4) * (y + 5) * 17
            terms.append(
                f"CASE WHEN ((seed+1)*{c1})%256 > ((seed+1)*{c0})%256 "
                f"THEN {1 << bit} ELSE 0 END"
            )
    hash_expr = "\n       + ".join(terms)
    return f"""
WITH s AS (SELECT doc_id, doc_id % 37 AS seed FROM documents),
fp AS (SELECT doc_id, CAST({hash_expr} AS BIGINT) AS dhash FROM s)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.dhash, b.dhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 2
ORDER BY doc_id_a, doc_id_b
"""


def q153_audio_fingerprint_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-duplicate AUDIO detection end-to-end — the acoustic twin of
    q135: synthesize REAL mono 16-bit PCM WAVs (every byte a codegen
    expression from a per-doc seed, ``multimodal.synth_wav_samples``),
    fingerprint them by PARSING the actual RIFF bytes
    (``fingerprint_audio`` — the frame-energy-delta trick at the core of
    the Chromaprint family), and pair within Hamming ≤ 2 via the same
    generalized pigeonhole banding (``dedup.hamming_pairs``). The oracle
    replays the generator arithmetic straight to the fingerprint (the
    q38/q135 contract: one misparsed byte anywhere hash-mismatches);
    docs sharing ``doc_id % 41`` carry identical audio, so the pair set
    is the duplicate-class structure."""
    from pyveb_spark.operators.dedup import hamming_pairs
    from pyveb_spark.operators.multimodal import (
        AFP_BITS,
        fingerprint_audio,
        synth_wav_samples,
    )

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 41).cast("int").alias("seed")
    )
    wav = d.select(
        "doc_id", synth_wav_samples(F.col("seed")).alias("payload")
    )
    fp = fingerprint_audio(wav, "doc_id", "payload")
    return hamming_pairs(
        fp, "doc_id", "afp", max_hamming=2, bands=3, bits=AFP_BITS
    ).orderBy("doc_id_a", "doc_id_b")


def q167_corrupt_payload_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corruption-profile audit over a deliberately damaged media corpus —
    the decode-FAILURE path, oracle-checked: 1/5 of the payloads are
    truncated mid-header, 1/5 carry a foreign magic, 1/5 declare an
    unsupported PGM maxval, and ``safe_decode_images`` must ROUTE every
    one of them to the right quarantine class (and still decode the good
    BMP/PGM rows to exact dimensions) instead of failing the job. The
    oracle predicts the full (status × count × dimension-sum) table from
    the corpus CONSTRUCTION arithmetic (``doc_id % 5``), so a kernel that
    raised on bad bytes would fail the query outright and one that
    misclassified (e.g. truncated-BMP → bad_magic, the pre-r6 kernel
    ordering bug) would hash-mismatch.

    At 100 TB of scraped media this IS the normal path: malformed bytes
    are the norm, so decode errors must be data, not exceptions. The plan
    is one Arrow-batched ``mapInPandas`` scan → project away the payload
    → single groupBy on the narrow status column."""
    from pyveb_spark.operators.multimodal import (
        safe_decode_images,
        synth_bmp_pixels,
        synth_pgm,
    )

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 5).alias("mode"),
        (F.col("doc_id") % 37).cast("int").alias("seed"),
    )
    bmp = synth_bmp_pixels(F.col("seed"))
    pgm = synth_pgm(F.col("seed"), 6, 5)
    # every BMP-derived branch references the one materialized __bmp
    # column (added below) — the 224-byte pixel expression renders once
    # per row, not once per branch
    payload = (
        F.when(F.col("mode") == 0, F.col("__bmp"))
        .when(F.col("mode") == 1, pgm)
        # mid-header truncation: 'BM' magic intact, DIB fields gone
        .when(F.col("mode") == 2, F.expr("substring(__bmp, 1, 20)"))
        # foreign container: magic bytes replaced, body intact
        .when(
            F.col("mode") == 3,
            F.concat(
                F.encode(F.lit("XX"), "ISO-8859-1"),
                F.expr("substring(__bmp, 3, 2000)"),
            ),
        )
        # parseable PGM header declaring a >8-bit maxval the kernel
        # doesn't support — header-level rejection, not truncation
        .otherwise(
            F.concat(
                F.encode(F.lit("P5\n6 5\n999\n"), "ISO-8859-1"),
                F.to_binary(F.lit("00" * 30), F.lit("hex")),
            )
        )
    )
    media = d.withColumn("__bmp", bmp).select(
        "doc_id", payload.alias("payload")
    )
    decoded = safe_decode_images(media).select(
        F.coalesce("decode_status", F.lit("ok")).alias("decode_status"),
        "width",
        "height",
    )
    return (
        decoded.groupBy("decode_status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.coalesce("width", F.lit(0)))
            .cast("bigint")
            .alias("sum_width"),
            F.sum(F.coalesce("height", F.lit(0)))
            .cast("bigint")
            .alias("sum_height"),
        )
        .orderBy("decode_status")
    )


# The oracle replays the corpus CONSTRUCTION (doc_id % 5 → corruption
# mode) straight to the expected routing table; the Spark side must
# recover the same classes by really parsing the damaged bytes.
_Q167_SQL = """
WITH m AS (SELECT doc_id, doc_id % 5 AS mode FROM documents)
SELECT CASE WHEN mode IN (0, 1) THEN 'ok'
            WHEN mode = 2 THEN 'truncated'
            WHEN mode = 3 THEN 'bad_magic'
            ELSE 'bad_header' END AS decode_status,
       COUNT(*)::BIGINT AS n_rows,
       SUM(CASE WHEN mode = 0 THEN 9 WHEN mode = 1 THEN 6
                ELSE 0 END)::BIGINT AS sum_width,
       SUM(CASE WHEN mode = 0 THEN 8 WHEN mode = 1 THEN 5
                ELSE 0 END)::BIGINT AS sum_height
FROM m GROUP BY 1 ORDER BY decode_status
"""


def _q153_sql() -> str:
    from pyveb_spark.operators.multimodal import AFP_BITS, AFP_FRAMES

    frame_len = 128 // AFP_FRAMES

    def amp(k: int) -> str:
        lo = f"(((seed+2)*{k + 3}*17)%256)"
        hi = f"(((seed+3)*{k + 5}*13)%256)"
        v = f"({lo} + 256*{hi})"
        return (
            f"ABS(CASE WHEN {v} >= 32768 THEN {v} - 65536 ELSE {v} END)"
        )

    e_cols = ",\n       ".join(
        "("
        + " + ".join(amp(f * frame_len + j) for j in range(frame_len))
        + f") AS e{f}"
        for f in range(AFP_FRAMES)
    )
    hash_expr = "\n       + ".join(
        f"CASE WHEN e{f + 1} > e{f} THEN {1 << f} ELSE 0 END"
        for f in range(AFP_BITS)
    )
    return f"""
WITH s AS (SELECT doc_id, doc_id % 41 AS seed FROM documents),
e AS (SELECT doc_id,
       {e_cols}
      FROM s),
fp AS (SELECT doc_id, CAST({hash_expr} AS BIGINT) AS afp FROM e)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.afp, b.afp)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.afp, b.afp)) <= 2
ORDER BY doc_id_a, doc_id_b
"""
