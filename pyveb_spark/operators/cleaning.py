"""Data-cleaning operators — native replacements for the reference's UDFs.

Reference parity (SURVEY.md §2.3): every one of the reference's five Python
UDF repairs (``spark_client.py:269-328``) blocks predicate pushdown and
whole-stage codegen around it; each is re-expressed here as a Catalyst
expression with the same observable semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, StringType

__all__ = [
    "nan_to_null",
    "clean_old_dates",
    "add_metadata",
    "ascii_sanitize",
    "parse_timestamp",
    "redact_pii",
    "tombstone_cascade",
]

# PII patterns shared by redact_pii and its oracle SQL. Deliberately
# restricted to syntax with identical semantics in Java regex (Spark) and
# RE2 (DuckDB/Trino oracles): ASCII classes, bounded quantifiers, \b word
# boundaries; no lookaround, no backreferences. Order matters: emails are
# redacted before phones so the digits inside a local-part don't get
# double-matched by the phone pattern.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # leading '+' must be an alternative to \b, not follow it: a word
    # boundary can't precede a non-word '+' at a match start, so '\b\+?'
    # could never actually consume the international prefix
    "phone": r"(?:\+|\b)[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
}

# Tokens the reference treats as NULL after trim+lower
# (spark_client.py:463-481; tf_client.py:99-114 adds 'nat').
_NULL_TOKENS = ("nan", "null", "", "nat", "none")


def nan_to_null(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """String sentinels ``'nan'/'null'/''/'NaT'/'None'`` (trimmed,
    case-insensitive — the reference trims *before* matching,
    ``spark_client.py:477``) → NULL; float NaN → NULL via ``nanvl``
    (↔ ``tf_client.py:107``)."""
    targets = set(cols) if cols is not None else None
    out = df
    for field in df.schema.fields:
        if targets is not None and field.name not in targets:
            continue
        c = F.col(field.name)
        if isinstance(field.dataType, StringType):
            out = out.withColumn(
                field.name,
                F.when(F.lower(F.trim(c)).isin(*_NULL_TOKENS), F.lit(None)).otherwise(c),
            )
        elif isinstance(field.dataType, (DoubleType, FloatType)):
            out = out.withColumn(
                field.name, F.when(F.isnan(c), F.lit(None)).otherwise(c)
            )
    return out


def clean_old_dates(
    df: DataFrame, cols: Sequence[str], floor: str = "1900-01-01"
) -> DataFrame:
    """Clamp timestamps below ``floor`` to ``floor``
    ↔ ``clean_old_dates`` (``spark_client.py:445-461``, the Spark-3
    proleptic-calendar workaround documented at ``:447-452``)."""
    out = df
    lit_floor = F.lit(floor).cast("timestamp")
    for c in cols:
        ts = F.col(c).cast("timestamp")
        out = out.withColumn(c, F.when(ts < lit_floor, lit_floor).otherwise(ts))
    return out


def add_metadata(df: DataFrame, partition_date: str | None = None) -> DataFrame:
    """META_file_name / META_partition_date / META_processing_date_utc
    ↔ ``add_metadata`` (``spark_client.py:399-416``, ``parser.py:8-12``)."""
    part = (
        F.lit(partition_date).cast("date") if partition_date else F.current_date()
    )
    return (
        df.withColumn("META_file_name", F.input_file_name())
        .withColumn("META_partition_date", part)
        .withColumn("META_processing_date_utc", F.current_timestamp())
    )


def ascii_sanitize(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Drop non-ASCII characters ↔ ``udf_convert_version``
    (``spark_client.py:309-319``: ``x.encode('ascii','ignore')``)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.regexp_replace(F.col(c), r"[^\x00-\x7F]", ""))
    return out


def parse_timestamp(
    df: DataFrame, cols: Sequence[str], fmt: str = "yyyy-MM-dd HH:mm:ss"
) -> DataFrame:
    """String → timestamp, stripping fractional seconds first
    ↔ ``udf_string_to_timestamp`` (``spark_client.py:294-307``: strips
    subseconds then ``strptime('%Y-%m-%d %H:%M:%S')``; invalid → NULL)."""
    out = df
    for c in cols:
        stripped = F.regexp_replace(F.col(c), r"\.\d+$", "")
        out = out.withColumn(c, F.to_timestamp(stripped, fmt))
    return out


def redact_pii(
    df: DataFrame,
    cols: Sequence[str],
    kinds: Sequence[str] = ("email", "ipv4", "phone"),
    token: str = "[PII]",
    count: bool = True,
) -> DataFrame:
    """Redact PII-shaped substrings (emails, IPv4 addresses, phone
    numbers) from string columns — the scrubbing step every public
    training-corpus pipeline runs before dedup/filtering (C4, Dolma).
    Chained ``regexp_replace`` keeps the whole scrub inside whole-stage
    codegen: a 100 TB scan redacts at scan throughput with zero shuffle
    and full column pruning. With ``count=True`` each column also gains a
    ``<col>_pii_count`` with the number of redacted spans (the audit
    metric). Counts are taken *sequentially* on the progressively-redacted
    value — the count equals the number of spans actually replaced, so a
    substring matching two patterns (a phone-shaped email local-part) is
    counted once by the pattern that consumed it, never twice.

    Patterns (``PII_PATTERNS``) are deliberately conservative and
    dialect-portable; real deployments layer stricter locale patterns on
    top. Unknown ``kinds`` raise rather than silently not-redact.
    """
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = df
    for c in cols:
        red = F.col(c)
        n = F.lit(0)
        for k in kinds:
            n = n + F.size(
                F.regexp_extract_all(red, F.lit(PII_PATTERNS[k]), 0)
            )
            red = F.regexp_replace(red, PII_PATTERNS[k], token)
        if count:
            out = out.withColumn(f"{c}_pii_count", n)
        out = out.withColumn(c, red)
    return out


def tombstone_cascade(
    tombstones: DataFrame,
    tables: Sequence[tuple[str, DataFrame, str, str | None]],
    flag_col: str = "__deleted",
) -> list[tuple[str, DataFrame]]:
    """Right-to-be-forgotten cascade (GDPR Art. 17): propagate a
    tombstone key set down a foreign-key chain, flagging every affected
    row in every derived table — the erasure step a lakehouse runs
    before rewriting partitions, and the audit a DPO signs off on.

    ``tombstones``: one-column DataFrame of root keys to erase.
    ``tables``: ordered ``(name, df, fk_col, out_key_col)`` — each
    table's ``fk_col`` is matched against the PREVIOUS level's deleted
    keys; its ``out_key_col`` (may be None for leaves) becomes the key
    set for the next level. Returns ``(name, df + flag_col)`` per table;
    callers write retained rows (anti) and count deleted (semi) from the
    same flag.

    Scale: one left join per level against the running deleted-key set —
    a hash semi-join shape AQE sizes freely (no forced broadcast: a bulk
    erasure batch can be millions of keys). Flags are computed once and
    shared by the audit and the rewrite, so the cascade costs one pass
    per table. Deterministic — no sampling, no state."""
    keys = tombstones.select(
        F.col(tombstones.columns[0]).alias("__k")
    ).distinct()
    out: list[tuple[str, DataFrame]] = []
    for name, df, fk, out_key in tables:
        marked = keys.select(
            F.col("__k").alias(fk), F.lit(1).alias("__m")
        )
        flagged = (
            df.join(marked, fk, "left")
            .withColumn(flag_col, (F.col("__m") == 1).alias(flag_col))
            .withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False)))
            .drop("__m")
        )
        out.append((name, flagged))
        if out_key is not None:
            keys = (
                flagged.where(F.col(flag_col))
                .select(F.col(out_key).alias("__k"))
                .distinct()
            )
    return out
