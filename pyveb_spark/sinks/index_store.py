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
pipeline phases (``src/pyveb/aws_client.py`` upload/download staging);
this is the Spark-first equivalent for index artifacts — the LAYOUT is
the index, and reading it back costs a metadata listing, not a rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "save_ivf_index",
    "load_ivf_index",
    "append_ivf_postings",
    "save_lsh_index",
    "load_lsh_index",
    "save_minhash_index",
    "load_minhash_index",
    "append_minhash_index",
]

_IVF_POSTINGS = "postings"
_IVF_CENTROIDS = "centroids"
_MH_HOT = "hot_buckets"


def save_ivf_index(
    indexed: DataFrame,
    centroids: list[tuple[int, list[float]]],
    path: str,
    list_col: str = "ivf_list",
) -> None:
    """Persist an ``ivf_index`` result: postings partitioned by the list
    id (probe = partition pruning), centroids as a k×dim parquet table.
    Overwrites — an index rebuild replaces the artifact atomically per
    partition (dynamic overwrite is unnecessary: rebuilds re-cluster, so
    the whole artifact changes)."""
    indexed.write.mode("overwrite").partitionBy(list_col).parquet(
        os.path.join(path, _IVF_POSTINGS)
    )
    spark = indexed.sparkSession
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in centroids],
        "list_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, _IVF_CENTROIDS)
    )


def load_ivf_index(
    spark: SparkSession, path: str, list_col: str = "ivf_list"
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Reload a persisted IVF index: (postings frame with the partition
    column restored to its build-time int type, driver-side centroid
    list sorted by list id). The centroid collect is k×dim — model-sized
    by construction."""
    postings = spark.read.parquet(os.path.join(path, _IVF_POSTINGS))
    postings = postings.withColumn(
        list_col, F.col(list_col).cast("int")
    )
    cents = sorted(
        spark.read.parquet(os.path.join(path, _IVF_CENTROIDS)).collect(),
        key=lambda r: r["list_id"],
    )
    return postings, [
        (int(r["list_id"]), [float(x) for x in r["centroid"]])
        for r in cents
    ]


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


def save_lsh_index(
    index: DataFrame, path: str, bucket_col: str = "__b"
) -> None:
    """Persist a sign-LSH bucketed corpus (``lsh_bucket`` output)
    partitioned by the bucket id: a lookup against the reloaded index
    prunes to the probe's buckets at the scan."""
    index.write.mode("overwrite").partitionBy(bucket_col).parquet(path)


def load_lsh_index(
    spark: SparkSession, path: str, bucket_col: str = "__b"
) -> DataFrame:
    """Reload a persisted LSH index with the bucket column restored to
    the build-time long type (partition-dir inference narrows it)."""
    return spark.read.parquet(path).withColumn(
        bucket_col, F.col(bucket_col).cast("long")
    )


def save_minhash_index(
    index: DataFrame,
    table: str,
    hot_path: str,
    max_bucket_size: int | None = None,
    num_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist a ``minhash_lsh_index`` as a catalog table bucketed on
    ``(__band, __h)`` — the zero-index-side-shuffle lookup join — and
    write the ``minhash_hot_buckets`` skew blacklist next to it (tiny by
    definition; refresh at compaction time, staleness after appends only
    loosens the skew guard, never correctness)."""
    from pyveb_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET_SIZE,
        minhash_hot_buckets,
    )
    from pyveb_spark.sinks.writers import write_bucketed_table

    write_bucketed_table(
        index, table, ["__band", "__h"], num_buckets=num_buckets,
        path=path,
    )
    cap = DEFAULT_MAX_BUCKET_SIZE if max_bucket_size is None else int(
        max_bucket_size
    )
    persisted = index.sparkSession.table(table)
    minhash_hot_buckets(persisted, cap).coalesce(1).write.mode(
        "overwrite"
    ).parquet(hot_path)


def load_minhash_index(
    spark: SparkSession, table: str, hot_path: str
) -> tuple[DataFrame, DataFrame]:
    """Reload the bucketed MinHash postings table and its persisted
    hot-bucket blacklist — pass both straight into
    ``minhash_lsh_lookup(index=..., hot_buckets=...)`` (the q45
    production shape with zero per-batch index work)."""
    return spark.table(table), spark.read.parquet(hot_path)


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
