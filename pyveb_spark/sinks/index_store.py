"""Durable ANN / dedup index persistence (round-9 tranche).

The warm-index property (q45/q165/q180: admission cost scales with the
BATCH because the corpus-side index is already built) previously lived
only as a session cache. These helpers make it durable: each index type
is saved as plain parquet (or a bucketed catalog table) laid out so the
lookup's pruning column IS the physical layout key, and reloaded with
that layout intact — a warm index that survives sessions, the missing
piece between "build the index once" and "run admission forever".

- **IVF** (``similarity.ivf_index``): postings PARTITIONED BY
  ``ivf_list`` → an ``ivf_search`` probe over the reloaded frame is
  partition pruning at the scan (``PartitionFilters``, plan-gated) —
  reading ~nprobe/n_lists of the corpus bytes, exactly the docstring
  promise the in-session form could only simulate. Centroids are a
  k×dim side table, re-collected to the driver on load (the coarse
  quantizer is driver-resident by design in every IVF implementation).
- **sign-LSH** (``similarity.lsh_bucket``): (id, vector, bucket) rows
  partitioned by the bucket id (≤ 2**n_planes directories); a reloaded
  index passes straight into ``lsh_cosine_lookup(index=...)``.
- **MinHash** (``dedup.minhash_lsh_index``): postings saved as a
  BUCKETED catalog table on ``(__band, __h)``
  (``writers.write_bucketed_table`` — the zero-index-side-shuffle join
  path its docstring names), with the ``minhash_hot_buckets`` skew
  blacklist persisted NEXT TO it so admission never recomputes it
  (the q45 production shape, now durable).

Reference parity: the reference stages corpus artifacts to files between
pipeline phases (``src/pyveb/s3_client.py:188-231`` upload/download
staging);
this is the Spark-first equivalent for index artifacts — the LAYOUT is
the index, and reading it back costs a metadata listing, not a rebuild.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "save_ivf_index",
    "load_ivf_index",
    "append_ivf_postings",
    "compact_ivf_postings",
    "maybe_compact_ivf_postings",
    "rebuild_ivf_index",
    "save_lsh_index",
    "load_lsh_index",
    "save_minhash_index",
    "load_minhash_index",
    "append_minhash_index",
    "compact_bucketed_index",
    "compact_minhash_index",
    "save_simhash_index",
    "load_simhash_index",
    "append_simhash_index",
    "save_id_bloom",
    "load_id_bloom",
    "update_id_bloom",
    "bloom_words_frame",
    "save_bm25_index",
    "load_bm25_index",
    "append_bm25_index",
    "refresh_bm25_stats",
    "save_ngram_index",
    "load_ngram_index",
    "append_ngram_index",
    "save_pq_codebooks",
    "load_pq_codebooks",
    "save_sq8_stats",
    "load_sq8_stats",
    "check_index_meta",
]

_IVF_POSTINGS = "postings"
_IVF_CENTROIDS = "centroids"
_IVF_MANIFEST = "manifest"
_MH_HOT = "hot_buckets"
# catalog-property namespace for the MinHash table's build manifest
_MH_PROP = "pyveb.index."


# ---------------------------------------------------------------------------
# Build manifests — the round-10 sign-LSH pattern, generalized (round 11).
#
# Every index artifact is only usable with the EXACT build parameters it
# was constructed with: a MinHash lookup with mismatched n/num_hashes/
# bands hashes probes into unrelated buckets, an IVF probe against the
# wrong dim or list count scores garbage, PQ/SQ8 codes decode against the
# wrong geometry. The parameters therefore belong to the ARTIFACT, not to
# whoever happens to remember them next session: savers persist a typed
# one-row manifest next to the data, loaders return it, and the search/
# lookup helpers validate against it (mismatch = loud error, the exact
# failure mode the LSH manifest docstring names).
# ---------------------------------------------------------------------------


def _meta_type(v) -> str:
    if isinstance(v, bool):
        raise TypeError("manifest values must be int/float/str, not bool")
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    raise TypeError(f"unsupported manifest value type: {type(v).__name__}")


def _write_manifest(spark: SparkSession, path: str, meta: dict) -> None:
    """One-row typed parquet manifest (int → bigint, float → double,
    str → string) — values round-trip exactly."""
    from pyveb_spark.session import local_df

    keys = sorted(meta)
    local_df(
        spark,
        [tuple(meta[k] for k in keys)],
        ", ".join(f"{k} {_meta_type(meta[k])}" for k in keys),
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _read_manifest(spark: SparkSession, path: str) -> dict:
    """Manifest dict, ``{}`` when the path is ABSENT (a pre-manifest
    artifact). A path that exists but fails to read propagates — see
    ``load_lsh_index``."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return {}
    row = spark.read.parquet(path).first()
    return {} if row is None else dict(row.asDict())


def check_index_meta(meta: dict, **expected) -> None:
    """Raise when a persisted build manifest disagrees with the
    parameters a caller is about to search/encode with — the loud-error
    half of the manifest contract. Keys absent from ``meta`` are not
    checked (pre-manifest artifacts validate vacuously)."""
    bad = {
        k: (meta[k], v)
        for k, v in expected.items()
        if k in meta and meta[k] != v
    }
    if bad:
        detail = ", ".join(
            f"{k}: artifact was built with {a!r}, caller uses {b!r}"
            for k, (a, b) in sorted(bad.items())
        )
        raise ValueError(
            f"index build-manifest mismatch — {detail}. Searching an "
            "index with parameters other than its build parameters "
            "returns silent garbage; reload the manifest "
            "(load_*(..., with_meta=True)) and pass its values."
        )


def save_ivf_index(
    indexed: DataFrame,
    centroids: list[tuple[int, list[float]]],
    path: str,
    list_col: str = "ivf_list",
    meta: dict | None = None,
) -> None:
    """Persist an ``ivf_index`` result: postings partitioned by the list
    id (probe = partition pruning), centroids as a k×dim parquet table,
    plus a build manifest (``n_lists``/``dim`` derived from the
    centroids, merged with caller extras like ``metric`` or the PQ
    geometry of encoded postings). Overwrites — an index rebuild
    replaces the artifact atomically per partition (dynamic overwrite is
    unnecessary: rebuilds re-cluster, so the whole artifact changes)."""
    from pyveb_spark.session import local_df

    # Align the write to the partition column (guide §8: decide with
    # small rows, move narrow bytes once): the upstream encode runs at
    # scan parallelism, then only the NARROW encoded rows (id + m code
    # bytes + list) shuffle into one task per list — one right-sized
    # file per partition instead of (input partitions × lists) small
    # files, and the probe's pruned scan opens nprobe files.
    indexed.repartition(F.col(list_col)).write.mode(
        "overwrite"
    ).partitionBy(list_col).parquet(os.path.join(path, _IVF_POSTINGS))
    spark = indexed.sparkSession
    local_df(
        spark,
        [(int(i), [float(x) for x in c]) for i, c in centroids],
        "list_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, _IVF_CENTROIDS)
    )
    manifest = {"n_lists": len(centroids)}
    if centroids:
        manifest["dim"] = len(centroids[0][1])
    manifest.update(meta or {})
    _write_manifest(spark, os.path.join(path, _IVF_MANIFEST), manifest)


def _raise_if_crashed_rebuild(spark: SparkSession, path: str) -> None:
    """Detect an IVF rebuild that died inside its directory swap: the
    index path has no postings, but the rebuild's stage (complete new
    artifact) or aside copy (complete previous artifact) exists."""
    HPath = spark._jvm.org.apache.hadoop.fs.Path
    fs = HPath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(HPath(os.path.join(path, _IVF_POSTINGS))):
        return
    stage = path.rstrip("/") + "__rebuild_stage"
    aside = path.rstrip("/") + "__rebuild_old"
    has_stage, has_aside = fs.exists(HPath(stage)), fs.exists(HPath(aside))
    if has_stage or has_aside:
        raise RuntimeError(
            f"IVF index {path!r} has no postings but a rebuild artifact "
            f"exists ({'stage' if has_stage else ''}"
            f"{'+' if has_stage and has_aside else ''}"
            f"{'aside' if has_aside else ''}) — a rebuild_ivf_index "
            "crashed inside the directory swap. Both datasets are "
            "complete: recover the NEW artifact by renaming "
            f"{stage!r} to {path!r}, or the previous one by renaming "
            f"{aside!r} to {path!r}."
        )


def load_ivf_index(
    spark: SparkSession,
    path: str,
    list_col: str = "ivf_list",
    with_meta: bool = False,
):
    """Reload a persisted IVF index: (postings frame with the partition
    column restored to its build-time int type, driver-side centroid
    list sorted by list id). The centroid collect is k×dim — model-sized
    by construction. ``with_meta=True`` also returns the build manifest
    (``{}`` for a pre-manifest artifact) — pass it to
    ``ivf_search(meta=...)`` so a dim/list-count drift fails loudly."""
    _raise_if_crashed_rebuild(spark, path)
    postings = spark.read.parquet(os.path.join(path, _IVF_POSTINGS))
    postings = postings.withColumn(
        list_col, F.col(list_col).cast("int")
    )
    cents = sorted(
        spark.read.parquet(os.path.join(path, _IVF_CENTROIDS)).collect(),
        key=lambda r: r["list_id"],
    )
    centroids = [
        (int(r["list_id"]), [float(x) for x in r["centroid"]])
        for r in cents
    ]
    if not with_meta:
        return postings, centroids
    return postings, centroids, _read_manifest(
        spark, os.path.join(path, _IVF_MANIFEST)
    )


def append_ivf_postings(
    assigned: DataFrame, path: str, list_col: str = "ivf_list"
) -> None:
    """Incremental IVF admission: append newly-assigned vectors (rows
    already carrying ``list_col`` from ``nearest_centroid`` against the
    EXISTING centroids) into the persisted postings — each batch lands
    in its list's partition directories, searchable immediately, no
    rebuild. The coarse quantizer stays frozen between rebuilds (the
    standard IVF serving contract; re-clustering is the rebuild path,
    ``save_ivf_index``)."""
    assigned.write.mode("append").partitionBy(list_col).parquet(
        os.path.join(path, _IVF_POSTINGS)
    )


def compact_ivf_postings(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    list_col: str = "ivf_list",
) -> None:
    """Index-lifecycle compaction for the IVF postings (the step
    ``append_ivf_postings`` defers): every append lands new small files
    in the grown lists' partition directories, and after N batches a
    probe pays N file opens per pruned list. This rewrites the postings
    layout via ``layout.compact_files`` with ``partition_cols`` set to
    the list id — one right-sized file per list partition, directory
    swapped atomically — so the ``PartitionFilters`` pruning property is
    untouched (pinned by test: search identical, file count drops).
    Centroids are k×dim and never fragment; they are left alone."""
    from pyveb_spark.operators.layout import compact_files

    compact_files(
        spark,
        os.path.join(path, _IVF_POSTINGS),
        target_mb=target_mb,
        partition_cols=[list_col],
    )


def maybe_compact_ivf_postings(
    spark: SparkSession,
    path: str,
    max_files_per_list: int = 8,
    target_mb: int = 256,
    list_col: str = "ivf_list",
) -> bool:
    """Threshold-triggered lifecycle compaction — the policy half of
    ``compact_ivf_postings``, for callers that append continuously (the
    streaming admission loop, q218): FS-list the postings directory,
    count data files per list partition, and compact only when some
    list exceeds ``max_files_per_list``. The check is a metadata
    listing (no data scan); returns whether a compaction ran.

    100 TB note: the trigger runs off the ingest path's critical
    section — appends land first, the rewrite happens after the batch
    commits — and the rewrite itself is per-partition with an atomic
    directory swap (``compact_ivf_postings``), so probes never see a
    half-compacted list."""
    from pyveb_spark.operators.layout import _local_fs_path

    root = os.path.join(path, _IVF_POSTINGS)
    counts: dict[str, int] = {}
    local_root = _local_fs_path(root)
    if local_root is not None:
        # local-FS fast path (r12): the Py4J listing below costs ~4 JVM
        # roundtrips PER FILE (~0.5-1 s per check on a few dozen files)
        # while the check itself runs once per micro-batch; os.walk is
        # sub-millisecond. Production object-store/HDFS paths take the
        # Hadoop listing branch unchanged.
        if not os.path.isdir(local_root):
            raise ValueError(
                f"IVF postings directory {root!r} does not exist — "
                "nothing to compact; seed the index with save_ivf_index "
                "(or check the index path) before running the "
                "compaction trigger"
            )
        for dirpath, _dirs, files in os.walk(local_root):
            n = sum(1 for f in files if f.endswith(".parquet"))
            if n:
                part = os.path.basename(dirpath)
                counts[part] = counts.get(part, 0) + n
    else:
        HPath = spark._jvm.org.apache.hadoop.fs.Path
        fs = HPath(root).getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(HPath(root)):
            # a raw Py4J FileNotFoundException here is the module's one
            # non-actionable failure mode — name the missing path instead
            raise ValueError(
                f"IVF postings directory {root!r} does not exist — "
                "nothing to compact; seed the index with save_ivf_index "
                "(or check the index path) before running the "
                "compaction trigger"
            )
        it = fs.listFiles(HPath(root), True)
        while it.hasNext():
            f = it.next()
            if not f.getPath().getName().endswith(".parquet"):
                continue
            part = f.getPath().getParent().getName()
            counts[part] = counts.get(part, 0) + 1
    if not counts or max(counts.values()) <= int(max_files_per_list):
        return False
    compact_ivf_postings(
        spark, path, target_mb=target_mb, list_col=list_col
    )
    return True


def rebuild_ivf_index(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    n_lists: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
    kmeans_iters: int = 0,
    tol: float = 0.0,
    meta: dict | None = None,
) -> dict:
    """The RE-CLUSTER lifecycle step the frozen-quantizer serving
    contract defers to (``append_ivf_postings``: "re-clustering is the
    rebuild path") and q211's health audit exists to trigger: as
    batches append under centroids trained on the original corpus, hot
    regions of the drifted distribution pile into a few lists and probe
    cost per pruned list grows unevenly. This retrains the coarse
    quantizer on the GROWN population, re-assigns every posting, and
    swaps the artifact version atomically — the acting half of the
    audit.

    ``source`` is the full current population ``(id, vector)`` — for a
    flat index the postings themselves work; for an encoded index
    (PQ/SQ8 codes, no raw vectors in the postings) pass the vector
    corpus. Retraining uses Lloyd's k-means (``kmeans_iters`` > 0 —
    the balance-restoring path, pinned by test) or the deterministic
    md5 seed-sample (``kmeans_iters=0`` — oracle-replayable verbatim);
    both are engine-portable, so a rebuilt index stays under the full
    value-hash oracle (q222). Postings keep every non-list column
    untouched (codes are NOT re-encoded — this implementation encodes
    raw vectors, not residuals, so codes are list-independent): the new
    assignment joins onto the old rows by id, and a source that fails
    to cover the postings ids aborts loudly before any swap (silent
    row loss is the failure mode).

    Swap discipline (the shared rename-aside contract): the complete
    new artifact — postings partitioned by the new assignment,
    centroids, manifest (old extras preserved, geometry keys
    refreshed), plus COPIES of any sidecar artifacts living in the
    index dir (e.g. the q218 admission Bloom — id-set-dependent, and
    the id set is preserved) — is staged at ``<path>__rebuild_stage``
    while the original serves; then original → ``<path>__rebuild_old``,
    stage → ``<path>``, aside deleted last. Both datasets exist in
    full through every crash window; ``load_ivf_index`` detects the
    mid-swap state and names the recovery.

    Returns the balance report: per-list max/mean ratio (empty lists
    count as zero) before and after — the number q211 monitors, so the
    operator can log the improvement the rebuild bought.

    100 TB note: cost is one k-means fit over the population (or one
    hash-sample scan), one assignment scan, one partitioned rewrite —
    the same order as the initial build, run at the cadence the health
    audit indicates (weeks, not batches), entirely off the ingest and
    query paths."""
    from pyveb_spark.operators.similarity import (
        _seed_centroids,
        kmeans_fit,
        nearest_centroid,
    )

    postings_dir = os.path.join(path, _IVF_POSTINGS)
    HPath = spark._jvm.org.apache.hadoop.fs.Path
    conf = spark._jsc.hadoopConfiguration()
    fs = HPath(path).getFileSystem(conf)
    if not fs.exists(HPath(postings_dir)):
        _raise_if_crashed_rebuild(spark, path)
        raise ValueError(
            f"IVF postings directory {postings_dir!r} does not exist — "
            "seed the index with save_ivf_index before rebuilding"
        )
    stage = path.rstrip("/") + "__rebuild_stage"
    aside = path.rstrip("/") + "__rebuild_old"
    # leftovers: a stage from a run that failed before its swap (the
    # live original is authoritative — redo), an aside from a completed
    # swap that crashed before final cleanup (stale — drop)
    fs.delete(HPath(stage), True)
    fs.delete(HPath(aside), True)

    old_postings, _, old_meta = load_ivf_index(
        spark, path, list_col=list_col, with_meta=True
    )
    before = {
        int(r[list_col]): int(r["n"])
        for r in old_postings.groupBy(list_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if n_lists is None:
        n_lists = int(old_meta.get("n_lists", len(before)))

    vecs = source.select(id_col, vec_col)
    if kmeans_iters > 0:
        new_cents = kmeans_fit(
            vecs, k=n_lists, max_iter=kmeans_iters, tol=tol,
            id_col=id_col, vec_col=vec_col,
        )
    else:
        new_cents = _seed_centroids(vecs, n_lists, id_col, vec_col)
    assigned = vecs.select(
        F.col(id_col),
        nearest_centroid(F.col(vec_col), new_cents)["list_id"].alias(
            list_col
        ),
    )
    new_postings = old_postings.drop(list_col).join(assigned, id_col)
    new_meta = {
        k: v for k, v in old_meta.items() if k not in ("n_lists", "dim")
    }
    new_meta.update(meta or {})
    save_ivf_index(
        new_postings, new_cents, stage, list_col=list_col, meta=new_meta
    )

    after = {
        int(r[list_col]): int(r["n"])
        for r in spark.read.parquet(os.path.join(stage, _IVF_POSTINGS))
        .groupBy(list_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_before, n_after = sum(before.values()), sum(after.values())
    if n_before != n_after:
        fs.delete(HPath(stage), True)
        raise ValueError(
            f"rebuild source does not cover the postings ids: "
            f"{n_before} postings rows but {n_after} survived the "
            "re-assignment join — the original artifact is untouched; "
            "pass a source containing every indexed id"
        )
    # sidecar artifacts (anything that is not the three core dirs)
    # travel as COPIES so the live artifact keeps its own until the swap
    FileUtil = spark._jvm.org.apache.hadoop.fs.FileUtil
    core = {_IVF_POSTINGS, _IVF_CENTROIDS, _IVF_MANIFEST}
    for st in fs.listStatus(HPath(path)):
        name = st.getPath().getName()
        if name in core:
            continue
        FileUtil.copy(
            fs, st.getPath(), fs,
            HPath(os.path.join(stage, name)), False, conf,
        )
    # rename-aside swap: both datasets exist through every window
    fs.rename(HPath(path), HPath(aside))
    fs.rename(HPath(stage), HPath(path))
    fs.delete(HPath(aside), True)

    def _imbalance(counts: dict[int, int]) -> float:
        total = sum(counts.values())
        mean = total / float(n_lists) if n_lists else 0.0
        return round(max(counts.values()) / mean, 4) if mean else 0.0

    return {
        "n_rows": n_after,
        "n_lists": int(n_lists),
        "before_max": max(before.values()),
        "before_imbalance": _imbalance(before),
        "after_max": max(after.values()),
        "after_imbalance": _imbalance(after),
    }


def save_lsh_index(
    index: DataFrame,
    path: str,
    bucket_col: str = "__b",
    meta: dict[str, int] | None = None,
) -> None:
    """Persist a sign-LSH bucketed corpus (``lsh_bucket`` output)
    partitioned by the bucket id: a lookup against the reloaded index
    prunes to the probe's buckets at the scan.

    ``meta`` (recommended: ``{"n_planes": ..., "seed": ..., "dim":
    ...}``) is written as a one-row manifest NEXT TO the index. A sign-
    LSH index is only usable with the EXACT plane construction it was
    built with — a probe hashed under different planes lands in
    unrelated buckets and silently returns garbage — so the build
    parameters belong to the artifact, not to whoever happens to
    remember them next session. ``load_lsh_index(..., with_meta=True)``
    returns them for the lookup call (this is how ``n_planes="auto"``
    composes with persistence: resolve the count at BUILD time —
    ``suggest_lsh_planes`` — save it in the manifest, reload it at
    admission time)."""
    index.write.mode("overwrite").partitionBy(bucket_col).parquet(path)
    if meta:
        from pyveb_spark.session import local_df

        keys = sorted(meta)
        local_df(
            index.sparkSession,
            [tuple(int(meta[k]) for k in keys)],
            ", ".join(f"{k} int" for k in keys),
        ).coalesce(1).write.mode("overwrite").parquet(path + "_meta")


def load_lsh_index(
    spark: SparkSession,
    path: str,
    bucket_col: str = "__b",
    with_meta: bool = False,
) -> DataFrame | tuple[DataFrame, dict[str, int]]:
    """Reload a persisted LSH index with the bucket column restored to
    the build-time long type (partition-dir inference narrows it).
    ``with_meta=True`` also returns the build manifest saved by
    ``save_lsh_index(meta=...)`` (``{}`` when the index predates it) —
    pass its ``n_planes``/``seed`` straight into
    ``lsh_cosine_lookup``."""
    df = spark.read.parquet(path).withColumn(
        bucket_col, F.col(bucket_col).cast("long")
    )
    if not with_meta:
        return df
    # _read_manifest distinguishes "pre-manifest artifact" (meta dir
    # absent → {}) from a genuinely failed/corrupt manifest read
    # (propagates): swallowing IO errors here would be indistinguishable
    # from no-manifest and let a caller silently hash with the wrong
    # plane constants.
    meta = {k: int(v) for k, v in _read_manifest(spark, path + "_meta").items()}
    return df, meta


def _set_table_meta(spark: SparkSession, table: str, meta: dict) -> None:
    """Stamp a build manifest into the table's catalog properties under
    the ``pyveb.index.`` namespace — the manifest travels with the table
    identity (rename, compaction swap), no side file to drift. Each
    value carries a type tag (``bigint:4`` / ``double:0.8`` /
    ``string:007``) matching ``_write_manifest``'s typed-parquet
    discipline: TBLPROPERTIES are strings, and blind int/float
    re-parsing on read would round-trip a string value that happens to
    parse numerically (a version tag ``'007'``, ``'1e3'``) as a number
    — making ``check_index_meta`` raise a spurious mismatch against the
    original string."""
    props = ", ".join(
        f"'{_MH_PROP}{k}'='{_meta_type(meta[k])}:{meta[k]}'"
        for k in sorted(meta)
    )
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({props})")


def _get_table_meta(spark: SparkSession, table: str) -> dict:
    """Read the ``pyveb.index.`` manifest back out of the catalog
    properties. Tagged values (``_set_table_meta``) re-type exactly;
    untagged values from pre-round-12 artifacts fall back to the legacy
    heuristic (int, then float, else str)."""
    meta: dict = {}
    for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect():
        if not r["key"].startswith(_MH_PROP):
            continue
        k, v = r["key"][len(_MH_PROP):], r["value"]
        tag, _, rest = v.partition(":")
        if tag == "bigint":
            meta[k] = int(rest)
        elif tag == "double":
            meta[k] = float(rest)
        elif tag == "string":
            meta[k] = rest
        else:
            try:
                meta[k] = int(v)
            except ValueError:
                try:
                    meta[k] = float(v)
                except ValueError:
                    meta[k] = v
    return meta


def _raise_if_crashed_swap(spark: SparkSession, table: str, kind: str) -> None:
    """Shared crashed-compaction detection for every bucketed catalog
    index tier (MinHash / SimHash / BM25 / n-gram): the table is missing
    but its committed compaction stage exists — a compaction died inside
    the metadata swap. Refuse to proceed with the full recovery steps
    (including the external-table SET LOCATION case, where a plain
    RENAME would re-attach the stage to a now-moved path)."""
    stage = f"{table}__compact_stage"
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(
        stage
    ):
        raise RuntimeError(
            f"{kind} index table {table!r} is missing but its "
            f"compaction stage {stage!r} exists — a compaction crashed "
            "inside the metadata swap; the compacted data is complete. "
            f"Recover with: ALTER TABLE {stage} RENAME TO {table}. "
            "External tables: first check which location actually holds "
            "the data — if the crash happened after the directory swap, "
            "the stage table points at a now-moved path and needs "
            f"ALTER TABLE {stage} SET LOCATION '<index location>' "
            "BEFORE the rename (re-attaching it unchanged would serve "
            "an empty/nonexistent directory)."
        )


def save_minhash_index(
    index: DataFrame,
    table: str,
    hot_path: str,
    max_bucket_size: int | None = None,
    num_buckets: int = 8,
    path: str | None = None,
    meta: dict | None = None,
) -> None:
    """Persist a ``minhash_lsh_index`` as a catalog table bucketed on
    ``(__band, __h)`` — the zero-index-side-shuffle lookup join — and
    write the ``minhash_hot_buckets`` skew blacklist next to it (tiny by
    definition; refresh at compaction time, staleness after appends only
    loosens the skew guard, never correctness).

    ``meta`` (recommended: the ``minhash_lsh_index`` build parameters
    ``{"n": ..., "num_hashes": ..., "bands": ...}``) is stamped into the
    table's catalog properties: a lookup that hashes probes with
    DIFFERENT parameters joins into unrelated buckets and silently
    returns garbage, so the parameters belong to the artifact.
    ``load_minhash_index(..., with_meta=True)`` returns them for
    ``minhash_lsh_lookup(meta=...)``; they survive appends and the
    compaction swap (pinned by test)."""
    from pyveb_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET_SIZE,
        minhash_hot_buckets,
    )
    from pyveb_spark.sinks.writers import write_bucketed_table

    write_bucketed_table(
        index, table, ["__band", "__h"], num_buckets=num_buckets,
        path=path,
    )
    spark = index.sparkSession
    if meta:
        _set_table_meta(spark, table, meta)
    cap = DEFAULT_MAX_BUCKET_SIZE if max_bucket_size is None else int(
        max_bucket_size
    )
    persisted = spark.table(table)
    minhash_hot_buckets(persisted, cap).coalesce(1).write.mode(
        "overwrite"
    ).parquet(hot_path)


def load_minhash_index(
    spark: SparkSession,
    table: str,
    hot_path: str,
    with_meta: bool = False,
):
    """Reload the bucketed MinHash postings table and its persisted
    hot-bucket blacklist — pass both straight into
    ``minhash_lsh_lookup(index=..., hot_buckets=...)`` (the q45
    production shape with zero per-batch index work). ``with_meta=True``
    also returns the build manifest stamped by
    ``save_minhash_index(meta=...)`` (``{}`` for a pre-manifest table) —
    pass it as ``minhash_lsh_lookup(meta=...)`` so the probe hashes
    with the index's OWN n/num_hashes/bands."""
    _raise_if_crashed_swap(spark, table, "MinHash")
    idx, hot = spark.table(table), spark.read.parquet(hot_path)
    if not with_meta:
        return idx, hot
    return idx, hot, _get_table_meta(spark, table)


def append_minhash_index(
    postings: DataFrame,
    table: str,
    hot_path: str | None = None,
    max_bucket_size: int | None = None,
    num_buckets: int = 8,
) -> None:
    """Append an admitted batch's postings into the persisted bucketed
    index (same bucket spec — Spark keeps the table's zero-shuffle join
    property across appends, pinned by test). Pass ``hot_path`` to also
    REFRESH the skew blacklist from the grown table (the compaction-time
    step); omit it to defer — staleness only loosens the skew guard,
    never correctness (the ``minhash_lsh_index`` contract)."""
    from pyveb_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET_SIZE,
        minhash_hot_buckets,
    )

    postings.write.format("parquet").mode("append").bucketBy(
        num_buckets, "__band", "__h"
    ).saveAsTable(table)
    if hot_path is not None:
        cap = (
            DEFAULT_MAX_BUCKET_SIZE
            if max_bucket_size is None
            else int(max_bucket_size)
        )
        spark = postings.sparkSession
        minhash_hot_buckets(spark.table(table), cap).coalesce(
            1
        ).write.mode("overwrite").parquet(hot_path)


def _table_meta(spark: SparkSession, table: str) -> dict[str, str]:
    """DESCRIBE FORMATTED as a dict (bucket count, location, type)."""
    return {
        r.col_name.strip(): (r.data_type or "").strip()
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        if r.col_name and r.col_name.strip()
    }


def compact_bucketed_index(spark: SparkSession, table: str) -> None:
    """Crash-safe lifecycle compaction for ANY bucketed catalog index
    table — MinHash/SimHash banded postings, BM25 token postings, n-gram
    phrase postings all share it. Each append's ``saveAsTable`` lands
    one file per (task × bucket); after N ingest waves a lookup opens
    ~N files per bucket. This rewrites the rows
    ``repartition(num_buckets, *bucket_cols)``-aligned to the bucket
    hash (Spark's bucket id and HashPartitioning share the same
    pmod-Murmur3, so every task holds exactly one bucket → ONE file per
    bucket), with the bucket spec — count AND columns — read from the
    table's own catalog metadata, so the zero-index-side-shuffle join
    property survives by construction (pinned by test) and nothing in
    the rewrite is tier-specific.

    Crash-safety (the ``compact_files`` commit-then-swap discipline):
    the replacement is FULLY written as a bucketed staging table
    ``{table}__compact_stage`` while the original stays live and
    untouched — a failure anywhere in the expensive write leaves the
    original index serving and the partial stage dropped. Only after
    the stage commits does the metadata-only swap run: managed tables
    DROP + ``ALTER TABLE ... RENAME``; external tables a RENAME-ASIDE
    directory swap at the original location (original →
    ``<loc>__compact_old``, stage → ``<loc>``, ``SET LOCATION`` +
    RENAME, then delete the aside copy — the table's path is part of
    its identity, so the replacement is a drop-in, pinned by test).
    If the process dies inside that metadata window BOTH datasets
    still exist in full — the compacted data under the stage
    name/location, the original under the aside dir — and the next
    compaction call (or any tier's loader) fails loudly with the
    recovery steps (rename the stage back; external tables may need
    ``SET LOCATION`` first) instead of silently rebuilding. The
    directory renames are metadata-only on HDFS/local filesystems;
    object stores copy on rename — use managed tables there."""
    from pyveb_spark.sinks.writers import write_bucketed_table

    stage = f"{table}__compact_stage"
    if not spark.catalog.tableExists(table):
        _raise_if_crashed_swap(spark, table, "bucketed")
        raise ValueError(f"index table {table!r} does not exist")
    # a stage alongside a live original is leftover from a run that
    # failed BEFORE the swap — the original is authoritative; redo.
    spark.sql(f"DROP TABLE IF EXISTS {stage}")

    meta = _table_meta(spark, table)
    if "Num Buckets" not in meta:
        # the bucket count is load-bearing: defaulting here would
        # silently rebucket the table and break the zero-shuffle
        # co-located-join property against its existing bucket spec.
        raise ValueError(
            f"table {table!r} has no 'Num Buckets' in its catalog "
            "metadata — not a bucketed index table (or the DESCRIBE "
            "FORMATTED layout changed); refusing to guess a count"
        )
    num_buckets = int(meta["Num Buckets"])
    bucket_cols = re.findall(r"`([^`]+)`", meta.get("Bucket Columns", ""))
    if not bucket_cols:
        raise ValueError(
            f"table {table!r} has no parseable 'Bucket Columns' in its "
            "catalog metadata — refusing to guess the bucket key "
            f"(got: {meta.get('Bucket Columns')!r})"
        )
    loc = meta.get("Location") or None
    is_external = meta.get("Type", "").upper() == "EXTERNAL"
    stage_loc = (loc.rstrip("/") + "__compact_stage") if is_external else None
    build_meta = _get_table_meta(spark, table)

    # 1) expensive part: write the complete replacement as a bucketed
    #    stage table while the original keeps serving. Failure here
    #    loses nothing — drop the partial stage and re-raise.
    try:
        write_bucketed_table(
            spark.table(table).repartition(num_buckets, *bucket_cols),
            stage,
            bucket_cols,
            num_buckets=num_buckets,
            path=stage_loc,
        )
    except Exception:
        spark.sql(f"DROP TABLE IF EXISTS {stage}")
        raise
    # the build manifest travels with the replacement (stamped BEFORE
    # the swap so a crash inside the window loses no metadata either)
    if build_meta:
        _set_table_meta(spark, stage, build_meta)
    # 2) metadata-only swap; the compacted data is durable from here on.
    #    External tables swap by RENAME-ASIDE, never delete-then-rename:
    #    the original moves to <loc>__compact_old, the stage moves into
    #    <loc>, and only after the catalog swap completes is the aside
    #    copy deleted — so the pre-compaction data survives EVERY crash
    #    window (a delete-first swap destroys it before the replacement
    #    is in place). Renames are metadata-only on HDFS/local
    #    filesystems; on object stores a "rename" is a long copy —
    #    prefer managed tables (catalog RENAME, no directory moves)
    #    there.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    old_loc = None
    if is_external:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        HPath = jvm.org.apache.hadoop.fs.Path
        fs = HPath(loc).getFileSystem(conf)
        old_loc = loc.rstrip("/") + "__compact_old"
        # leftover aside dir from a prior swap that crashed before its
        # final cleanup — the live table has served from loc since, so
        # the aside copy is stale and safe to drop
        fs.delete(HPath(old_loc), True)
        fs.rename(HPath(loc), HPath(old_loc))
        fs.rename(HPath(stage_loc), HPath(loc))
        spark.sql(f"ALTER TABLE {stage} SET LOCATION '{loc}'")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
    if old_loc is not None:
        fs.delete(HPath(old_loc), True)


def compact_minhash_index(
    spark: SparkSession,
    table: str,
    hot_path: str | None = None,
    max_bucket_size: int | None = None,
) -> None:
    """MinHash/SimHash entry point for :func:`compact_bucketed_index`
    (the shared crash-safe rewrite — see its docstring for the staged
    swap contract), plus the one banded-tier-specific step: when
    ``hot_path`` is given, the ``minhash_hot_buckets`` skew blacklist
    is refreshed from the compacted table in the same pass (the
    compaction-time refresh ``append_minhash_index`` defers to)."""
    from pyveb_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET_SIZE,
        minhash_hot_buckets,
    )

    compact_bucketed_index(spark, table)
    if hot_path is not None:
        cap = (
            DEFAULT_MAX_BUCKET_SIZE
            if max_bucket_size is None
            else int(max_bucket_size)
        )
        minhash_hot_buckets(spark.table(table), cap).coalesce(
            1
        ).write.mode("overwrite").parquet(hot_path)


def save_simhash_index(
    index: DataFrame,
    table: str,
    num_buckets: int = 8,
    path: str | None = None,
    meta: dict | None = None,
) -> None:
    """Persist a ``simhash_index`` as a catalog table bucketed on
    ``(__band, __h)`` — the same zero-index-side-shuffle lookup layout
    (and the same column convention, deliberately) as the MinHash
    index, so the whole bucketed-table lifecycle applies verbatim:
    append with ``append_simhash_index``, compact with
    ``compact_minhash_index`` (band-hash-aligned rewrite, crash-safe
    swap — nothing in it is MinHash-specific; pass ``hot_path=None``,
    SimHash carries no skew blacklist because its blocking is lossless
    and its verify is O(1) per candidate).

    ``meta`` (recommended: ``{"bands": ..., "bits": ...}``) is stamped
    as ``pyveb.index.*`` TBLPROPERTIES — a probe banding at a different
    chunk width joins into unrelated buckets and silently returns
    nothing, so the band geometry belongs to the artifact."""
    from pyveb_spark.sinks.writers import write_bucketed_table

    write_bucketed_table(
        index, table, ["__band", "__h"], num_buckets=num_buckets,
        path=path,
    )
    if meta:
        _set_table_meta(index.sparkSession, table, meta)


def load_simhash_index(
    spark: SparkSession, table: str, with_meta: bool = False
):
    """Reload the bucketed SimHash postings table; ``with_meta=True``
    also returns the build manifest (``{}`` for a pre-manifest table) —
    pass it as ``simhash_lookup(meta=...)``. Detects the crashed-
    compaction state the same way ``load_minhash_index`` does."""
    _raise_if_crashed_swap(spark, table, "SimHash")
    idx = spark.table(table)
    if not with_meta:
        return idx
    return idx, _get_table_meta(spark, table)


def append_simhash_index(
    postings: DataFrame, table: str, num_buckets: int = 8
) -> None:
    """Append an admitted batch's banded postings into the persisted
    SimHash index (same bucket spec — the zero-shuffle join property
    survives appends, as with the MinHash table)."""
    postings.write.format("parquet").mode("append").bucketBy(
        num_buckets, "__band", "__h"
    ).saveAsTable(table)


# ---------------------------------------------------------------------------
# Persisted membership Bloom filter (round 12): the admission-screen
# sidecar for streaming ingest against a durable index — replaces the
# per-batch corpus-id scan the q218 lifecycle was flagged for.
# ---------------------------------------------------------------------------


def save_id_bloom(
    ids: DataFrame,
    path: str,
    key_col: str = "vec_id",
    num_bits: int | None = None,
    num_hashes: int = 7,
    bits_per_key: int = 32,
    with_state: bool = False,
):
    """Build and persist a Bloom filter over an index's id column — the
    fixed-size membership sidecar that makes streaming admission's
    idempotence check O(batch) instead of O(corpus ids) per micro-batch
    (``sketches.bloom_gated_anti_join``).

    SIZING IS THE WHOLE GAME for the admission use-case: the screen
    only skips the corpus-id scan when the ENTIRE batch reports zero
    possible hits, so the per-batch false-positive budget is
    ``batch_size × FP`` and must sit well under 1 — a "1% FP" filter
    (the classic join-pruning sizing) false-hits on virtually every
    1000-row batch and degenerates to exact-plus-overhead. The
    defaults — 32 bits/key, 7 hashes → FP ≈ 9·10⁻⁶,
    ``(1-e^{-k·n/m})^k`` — keep batches up to ~10⁴ rows hit-free >90%
    of the time at 4 bytes/member of filter (100 M ids ≈ 400 MB: about
    the ceiling for the broadcast form; beyond that the streaming
    checkpoint state store is the right tool).

    ``with_state=True`` returns ``(probe_frame, meta, words)`` — the
    exact triple ``load_id_bloom(..., with_rows=True)`` would return —
    by collecting the (model-sized, ≤ num_bits/63 rows) word table once
    and writing it back through the Arrow LocalRelation path, so a
    build-then-serve caller (the q218 seed and its compaction-time
    refresh) skips the save→load round trip: no manifest re-read, no
    word-table re-read — the state it just wrote IS the state it
    serves (r12).

    ``num_bits=None`` auto-sizes to ``bits_per_key`` per member from a
    count of the ids frame — one narrow scan, paid once at
    build/refresh time. The geometry is persisted as a typed manifest
    next to the word table: a probe hashed with different bits/hashes
    tests garbage positions, so the parameters belong to the artifact
    (the ``check_index_meta`` contract). Refresh by calling this again
    on the index's id column — the compaction-time step that also
    sheds any conservative over-approximation accumulated by
    ``update_id_bloom``'s merge-before-append ordering."""
    from pyveb_spark.operators.sketches import bloom_build

    if num_bits is None:
        n = ids.count()
        num_bits = max(2048, int(bits_per_key) * int(n))
    bloom = bloom_build(ids, key_col, num_bits, num_hashes)
    meta = {
        "num_bits": int(num_bits),
        "num_hashes": int(num_hashes),
        "key_col": key_col,
    }
    spark = ids.sparkSession
    if with_state:
        words = sorted(
            (int(r["word_idx"]), int(r["word"])) for r in bloom.collect()
        )
        frame = bloom_words_frame(spark, words)
        frame.coalesce(1).write.mode("overwrite").parquet(path)
        _write_manifest(spark, path + "_meta", meta)
        return frame, meta, words
    bloom.coalesce(1).write.mode("overwrite").parquet(path)
    _write_manifest(spark, path + "_meta", meta)
    return None


def load_id_bloom(
    spark: SparkSession,
    path: str,
    localize: bool = True,
    with_rows: bool = False,
):
    """(word-table frame, geometry manifest) — pass both straight into
    ``bloom_probe``/``bloom_gated_anti_join``. The word table is
    ≤ num_bits/63 rows — broadcast-sized by construction.

    ``localize=True`` (default) collects the words and returns them as
    an Arrow LocalRelation: probe plans then embed the filter state and
    are IMMUNE to a concurrent ``update_id_bloom`` overwriting the
    parquet (the per-batch admission loop needs no defensive
    checkpoint), and the broadcast ships from driver memory with exact
    size stats. Pass ``localize=False`` for filters sized beyond
    comfortable driver memory (≳10⁹ members) — then re-load after any
    update before building new probe plans.

    ``with_rows=True`` (implies localize) additionally returns the raw
    ``(word_idx, word)`` list as a third element — the driver-side
    state a per-batch admission loop threads into
    ``update_id_bloom(words=...)`` and ``bloom_words_frame`` so later
    batches never re-read the filter from parquet (r12)."""
    meta = _read_manifest(spark, path + "_meta")
    words = spark.read.parquet(path)
    if localize or with_rows:
        rows = [
            (int(r["word_idx"]), int(r["word"])) for r in words.collect()
        ]
        words = bloom_words_frame(spark, rows)
        if with_rows:
            return words, meta, rows
    return words, meta


def bloom_words_frame(
    spark: SparkSession, rows: list[tuple[int, int]]
) -> DataFrame:
    """Driver-held Bloom words → the Arrow LocalRelation probe frame
    (job-free; the form every probe path consumes)."""
    from pyveb_spark.session import local_df

    return local_df(spark, rows, "word_idx bigint, word bigint")


def update_id_bloom(
    batch_ids: DataFrame,
    path: str,
    words: list[tuple[int, int]] | None = None,
    meta: dict | None = None,
) -> list[tuple[int, int]]:
    """OR an admitted batch's keys into the persisted filter. Bloom
    words merge exactly (bit_or is the union), so the incremental
    filter equals a from-scratch rebuild over the grown corpus — no
    false-negative drift, ever. The batch's delta words come from one
    batch-sized aggregation; the merge happens driver-side over the
    (model-sized) word dict and rewrites through the Arrow
    LocalRelation path, so the overwrite never reads its own input.

    Returns the merged ``(word_idx, word)`` list — exactly what the
    parquet now holds. A per-batch caller (the q218 admission loop)
    passes it back as ``words`` on the next call, together with the
    load-time manifest as ``meta``: the update then costs ONE
    batch-sized aggregation job plus the overwrite, instead of
    re-reading the manifest and the word table from parquet every
    micro-batch (r12: two driver-roundtrip jobs per batch removed; the
    driver-side state is a pure cache of what this function itself
    wrote, so a restarted loop that reloads from disk sees identical
    state). With ``words=None`` the current parquet is read as before.

    Ordering contract for crash-safe idempotent admission: update the
    filter BEFORE appending the batch to the index. A crash between
    the two leaves the filter OVER-approximating (keys marked present
    that never landed) — those keys just take the exact-anti-join path
    on replay and are admitted correctly. The reverse order would
    under-approximate — a replayed batch would skip the exact check
    and double-admit. Over-approximation is healed at compaction time
    by re-running ``save_id_bloom`` on the index's id column."""
    from pyveb_spark.operators.sketches import bloom_build
    from pyveb_spark.session import local_df

    spark = batch_ids.sparkSession
    if meta is None:
        meta = _read_manifest(spark, path + "_meta")
    if not meta:
        raise ValueError(
            f"no Bloom manifest at {path + '_meta'!r} — build the "
            "filter with save_id_bloom before updating it"
        )
    delta = bloom_build(
        batch_ids,
        meta["key_col"],
        int(meta["num_bits"]),
        int(meta["num_hashes"]),
    )
    merged: dict[int, int] = (
        dict(words)
        if words is not None
        else {
            int(r["word_idx"]): int(r["word"])
            for r in spark.read.parquet(path).collect()
        }
    )
    for r in delta.collect():
        i = int(r["word_idx"])
        merged[i] = merged.get(i, 0) | int(r["word"])
    out = sorted(merged.items())
    if not merged:
        return out  # empty batch over an empty filter — nothing to write
    local_df(
        spark,
        out,
        "word_idx bigint, word bigint",
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return out


# ---------------------------------------------------------------------------
# Durable LEXICAL retrieval tier (round 12): BM25 inverted index + n-gram
# phrase index — the last index family without persistence joins the
# shared bucketed-catalog lifecycle convention. Reference analogue: the
# staged-artifact pattern of ``src/pyveb/s3_client.py:188-231`` (persist
# once, serve many); design follows the standard Lucene/ES split of
# per-posting data vs collection statistics.
# ---------------------------------------------------------------------------


def save_bm25_index(
    df: DataFrame,
    table: str,
    doclen_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8,
    path: str | None = None,
    meta: dict | None = None,
) -> None:
    """Persist a corpus's inverted index for BM25/phrase-era lexical
    serving: token postings ``(token, <id>, tf)`` as a catalog table
    BUCKETED on ``token`` — a query's IN-filter bucket-prunes the scan,
    the same serving shape as the banded dedup tiers — plus the per-doc
    length table at ``doclen_path`` and the collection statistics
    (``n_docs``, ``sum_dl``) stamped as ``pyveb.index.*``
    TBLPROPERTIES, surviving appends and the compaction swap.

    The layout deliberately carries NO corpus-global columns per
    posting (contrast ``build_inverted_index``'s df-annotated form):
    document frequency is derived exactly from the matched postings at
    search time and the collection constants live in the manifest — so
    ``append_bm25_index`` is purely additive (batch-sized writes + a
    two-integer manifest bump), never a corpus-scale stats rewrite.
    That is the property that makes a 100 TB lexical index operable:
    admission cost scales with the batch, compaction
    (``compact_bucketed_index`` + ``refresh_bm25_stats``) amortizes off
    the ingest path, and the artifact serves across sessions with zero
    rebuild."""
    from pyveb_spark.operators.retrieval import build_bm25_postings
    from pyveb_spark.sinks.writers import write_bucketed_table

    postings, doclens = build_bm25_postings(df, id_col, text_col)
    write_bucketed_table(
        postings, table, ["token"], num_buckets=num_buckets, path=path
    )
    doclens.write.mode("overwrite").parquet(doclen_path)
    spark = df.sparkSession
    row = (
        spark.read.parquet(doclen_path)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("s"),
        )
        .first()
    )
    manifest = {
        "n_docs": int(row["n"]),
        "sum_dl": int(row["s"] or 0),
        "tokenizer": "whitespace",
    }
    manifest.update(meta or {})
    _set_table_meta(spark, table, manifest)


def load_bm25_index(
    spark: SparkSession,
    table: str,
    doclen_path: str,
    with_meta: bool = False,
):
    """Reload the persisted BM25 tier: (token-bucketed postings frame,
    doclens frame[, manifest]). Pass the manifest's ``n_docs``/
    ``sum_dl`` straight into ``bm25_search_indexed`` — the search needs
    no other session state and no corpus scan. Detects the
    crashed-compaction state like every bucketed tier."""
    _raise_if_crashed_swap(spark, table, "BM25")
    postings = spark.table(table)
    doclens = spark.read.parquet(doclen_path)
    if not with_meta:
        return postings, doclens
    return postings, doclens, _get_table_meta(spark, table)


def append_bm25_index(
    batch_df: DataFrame,
    table: str,
    doclen_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8,
) -> None:
    """Admit a NEW-document wave into the persisted BM25 tier: the
    batch's postings append into the token-bucketed table (same bucket
    spec — the pruning property survives), its doclens append at
    ``doclen_path``, and the manifest's collection statistics bump
    incrementally (one batch-sized aggregation — n_docs += |batch|,
    sum_dl += Σ batch dl; the corpus is never rescanned). Documents
    must be new ids (admission dedup is the caller's anti-join, as in
    every other tier); re-appending an id would double-count its tf
    rows. A crash between the data append and the manifest bump leaves
    the stats slightly stale — which only perturbs the avgdl length
    normalization, never membership — and ``refresh_bm25_stats``
    (run at compaction time) recomputes them exactly from the doclens
    table, so the tier is self-healing."""
    from pyveb_spark.operators.retrieval import build_bm25_postings

    postings, doclens = build_bm25_postings(batch_df, id_col, text_col)
    postings.write.format("parquet").mode("append").bucketBy(
        num_buckets, "token"
    ).saveAsTable(table)
    doclens.write.mode("append").parquet(doclen_path)
    spark = batch_df.sparkSession
    row = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    meta = _get_table_meta(spark, table)
    if "n_docs" in meta and "sum_dl" in meta:
        _set_table_meta(
            spark,
            table,
            {
                "n_docs": int(meta["n_docs"]) + int(row["n"]),
                "sum_dl": int(meta["sum_dl"]) + int(row["s"] or 0),
            },
        )


def refresh_bm25_stats(
    spark: SparkSession, table: str, doclen_path: str
) -> dict:
    """Recompute the manifest's collection statistics exactly from the
    persisted doclens table and re-stamp them — the compaction-time
    self-heal for any drift the incremental bumps accumulated (a crash
    between an append's data and manifest writes). One narrow two-column
    scan; returns the fresh ``{"n_docs", "sum_dl"}``."""
    row = (
        spark.read.parquet(doclen_path)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
        .first()
    )
    fresh = {"n_docs": int(row["n"]), "sum_dl": int(row["s"] or 0)}
    _set_table_meta(spark, table, fresh)
    return fresh


def save_ngram_index(
    df: DataFrame,
    table: str,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8,
    path: str | None = None,
    meta: dict | None = None,
) -> None:
    """Persist a positional n-gram (phrase) index
    (``retrieval.build_ngram_index``) as a catalog table bucketed on
    the window hash ``__h`` — a phrase probe is one literal equality,
    bucket-pruned at the scan. The window width ``n`` is stamped into
    the manifest: a probe phrase of any other token count hashes to a
    key that cannot exist and silently returns nothing, so
    ``phrase_search(meta=...)`` validates it loudly instead."""
    from pyveb_spark.operators.retrieval import build_ngram_index
    from pyveb_spark.sinks.writers import write_bucketed_table

    from pyveb_spark.operators.layout import widen_scan

    write_bucketed_table(
        build_ngram_index(widen_scan(df), n, id_col, text_col),
        table,
        ["__h"],
        num_buckets=num_buckets,
        path=path,
    )
    manifest = {"n": int(n)}
    manifest.update(meta or {})
    _set_table_meta(df.sparkSession, table, manifest)


def load_ngram_index(
    spark: SparkSession, table: str, with_meta: bool = False
):
    """Reload the bucketed n-gram phrase index; ``with_meta=True`` also
    returns the build manifest — pass it as ``phrase_search(meta=...)``
    so a phrase/window-width mismatch raises. Detects the
    crashed-compaction state like every bucketed tier."""
    _raise_if_crashed_swap(spark, table, "n-gram")
    idx = spark.table(table)
    if not with_meta:
        return idx
    return idx, _get_table_meta(spark, table)


def append_ngram_index(
    batch_df: DataFrame,
    table: str,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8,
) -> None:
    """Append a new-document wave's n-gram postings (same bucket spec;
    documents must be new ids — a re-appended doc would split its
    per-window occurrence counts across rows). Validate ``n`` against
    the manifest first when loading via ``with_meta``."""
    from pyveb_spark.operators.retrieval import build_ngram_index

    build_ngram_index(batch_df, n, id_col, text_col).write.format(
        "parquet"
    ).mode("append").bucketBy(num_buckets, "__h").saveAsTable(table)


# ---------------------------------------------------------------------------
# PQ / SQ8 quantizer models — the remaining ANN tiers' durable artifacts
# ---------------------------------------------------------------------------


def save_pq_codebooks(
    spark: SparkSession,
    codebooks: list[list[tuple[int, list[float]]]],
    path: str,
    meta: dict | None = None,
) -> None:
    """Persist trained PQ codebooks (``similarity.pq_train`` output) as
    one tiny parquet table ``(subspace, code, centroid)`` — m×k rows of
    dim/m doubles, the whole model. Doubles round-trip parquet exactly,
    so a reloaded codebook encodes and scores BIT-IDENTICALLY to the
    fresh one (pinned by test). With this + ``save_ivf_index`` over a
    ``pq_encode``d postings frame, the IVF-PQ serving composition (q88)
    is fully durable: coarse lists prune partitions, codes stream from
    the pruned scan, and the only session state is two model-sized
    reloads."""
    from pyveb_spark.session import local_df

    rows = [
        (j, int(code), [float(x) for x in cent])
        for j, cb in enumerate(codebooks)
        for code, cent in cb
    ]
    local_df(
        spark, rows, "subspace int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    manifest = {"m": len(codebooks)}
    if codebooks and codebooks[0]:
        manifest["k"] = len(codebooks[0])
        manifest["dim"] = len(codebooks) * len(codebooks[0][0][1])
    manifest.update(meta or {})
    _write_manifest(spark, path + "_meta", manifest)


def load_pq_codebooks(
    spark: SparkSession, path: str, with_meta: bool = False
):
    """Reload persisted PQ codebooks in ``pq_train``'s return shape
    (``codebooks[j] = [(code, sub_centroid), ...]`` sorted by code).
    The collect is m×k rows — model-sized by construction.
    ``with_meta=True`` also returns the build manifest (m/k/dim +
    caller extras; ``{}`` for a pre-manifest artifact) — pass it to
    ``pq_adc_topk(meta=...)`` / ``pq_encode(meta=...)``."""
    by: dict[int, dict[int, list[float]]] = {}
    for r in spark.read.parquet(path).collect():
        by.setdefault(int(r["subspace"]), {})[int(r["code"])] = [
            float(x) for x in r["centroid"]
        ]
    codebooks = [
        [(code, by[j][code]) for code in sorted(by[j])]
        for j in sorted(by)
    ]
    if not with_meta:
        return codebooks
    return codebooks, _read_manifest(spark, path + "_meta")


def save_sq8_stats(
    spark: SparkSession,
    stats: list[tuple[float, float]],
    path: str,
    meta: dict | None = None,
) -> None:
    """Persist the scalar-quantizer per-dimension (lo, hi) stats
    (``similarity.sq8_stats`` output) as a dim-row parquet table — the
    SQ8 "codebook" — plus a build manifest (``dim`` derived, merged
    with caller extras like the source ``vec_col``). Exact double round
    trip: the reloaded stats encode and dequantize bit-identically
    (pinned by test)."""
    from pyveb_spark.session import local_df

    local_df(
        spark,
        [
            (i, float(lo), float(hi))
            for i, (lo, hi) in enumerate(stats)
        ],
        "dim int, lo double, hi double",
    ).coalesce(1).write.mode("overwrite").parquet(path)
    manifest = {"dim": len(stats)}
    manifest.update(meta or {})
    _write_manifest(spark, path + "_meta", manifest)


def load_sq8_stats(
    spark: SparkSession, path: str, with_meta: bool = False
):
    """Reload persisted SQ8 stats in ``sq8_stats``'s return shape
    (``[(lo_0, hi_0), ...]`` ordered by dimension). ``with_meta=True``
    also returns the build manifest (``{}`` for a pre-manifest
    artifact) — validate with ``check_index_meta(meta, dim=...)``
    before encoding a batch against reloaded stats."""
    rows = sorted(
        spark.read.parquet(path).collect(), key=lambda r: r["dim"]
    )
    stats = [(float(r["lo"]), float(r["hi"])) for r in rows]
    if not with_meta:
        return stats
    return stats, _read_manifest(spark, path + "_meta")
