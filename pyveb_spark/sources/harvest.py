"""Typed metadata-harvest records (dbt Cloud / Tableau parity).

The reference parses REST payloads into dataclasses with hand-picked,
renamed fields (``dbt_client.py:334-442``: ``id``→``job_id``, nested
``schedule.cron``→``schedule``...), gives each record a content hash over
an identity subset of fields (``dbt_client.py:45-58,90-103``), detects
duplicates by that hash before loading (``check_duplicates``,
``dbt_client.py:649-658``), and flattens to pandas
(``dataclass_list_to_df``, ``dbt_client.py:660-672``). Tableau mirrors it
with namedtuples (``tableau_client.py:11-15``) fed by pageSize/pageNumber
pagination (``tableau_client.py:68-96``).

Spark-first mapping: a ``RecordSpec`` replaces the dataclass — declared
output schema + JSON paths + identity keys — and everything downstream is
native DataFrame code:

- parse = one ``select`` of ``get_json_object``/nested-column extractions
  with ``try_cast`` (invalid → NULL, the engine's lenient-cast contract);
- content hash = a ``sha2`` column over the identity fields, rendered
  ``key:value`` exactly like the reference's ``__hash__`` so identity
  semantics are preserved (NULL renders as ``None`` to match Python);
- duplicate check / dedup = one aggregation / ``dropDuplicates`` on that
  column — map-side partial dedup, the 100 TB-safe version of the
  reference's driver-side ``set()``.

Known reference bugs NOT ported (SURVEY §7): ``dbtEnvironment.__hash__``
reads a nonexistent ``created_at`` and ``dbtModel.__hash__`` nonexistent
fields — their specs here hash existing fields instead.
"""

from __future__ import annotations

import json
from collections.abc import Iterable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "RecordSpec",
    "parse_records",
    "parse_staged",
    "content_hash",
    "check_duplicates",
    "dedup_records",
    "DBT_JOB",
    "DBT_RUN",
    "DBT_ENVIRONMENT",
    "DBT_REPOSITORY",
    "DBT_CONNECTION",
    "DBT_PROJECT",
    "DBT_MODEL",
    "TABLEAU_USER",
    "TABLEAU_WORKBOOK",
]


@dataclass(frozen=True)
class RecordSpec:
    """Declarative replacement for a reference harvest dataclass:
    ``fields`` = (output column, JSON path, Spark type) triples in output
    order; ``hash_keys`` = the identity subset the content hash covers."""

    name: str
    fields: tuple[tuple[str, str, str], ...]
    hash_keys: tuple[str, ...]

    def out_columns(self) -> list[str]:
        return [c for c, _, _ in self.fields]


def _extract(value_col: Column, path: str, typ: str) -> Column:
    return F.get_json_object(value_col, path).try_cast(typ)


def parse_records(
    spark: SparkSession, records: Iterable[dict], spec: RecordSpec
) -> DataFrame:
    """Driver-collected API records (the pagination loop's output, which is
    inherently driver-side — SURVEY §3.3) → typed DataFrame. Each record is
    carried as one JSON string and parsed with native ``get_json_object``
    extractions, so nested paths (``$.schedule.cron``) and lenient casts
    work without any Python row loop ↔ ``parse_dbt_*`` +
    ``dataclass_list_to_df`` (``dbt_client.py:334-442,660-672``)."""
    raw = spark.createDataFrame(
        [(json.dumps(r),) for r in records], "value string"
    )
    return raw.select(
        *[_extract(F.col("value"), p, t).alias(c) for c, p, t in spec.fields]
    )


def parse_staged(spark: SparkSession, path: str, spec: RecordSpec) -> DataFrame:
    """Staged page files (one JSON array per page — the connector layer's
    output convention, readable by ``PagedJsonDataSource`` too) → typed
    DataFrame. ``multiLine`` JSON scan, then the same path extractions as
    ``parse_records`` against each re-serialized row: executors parse
    pages in parallel, so harvest volume scales with the cluster."""
    raw = spark.read.option("multiLine", "true").json(path)
    value = F.to_json(F.struct(*[F.col(c) for c in raw.columns]))
    return raw.select(
        *[_extract(value, p, t).alias(c) for c, p, t in spec.fields]
    )


def content_hash(spec: RecordSpec, out_col: str = "record_hash") -> Column:
    """sha256 identity hash over the spec's ``hash_keys``, fed
    ``key:value`` per field in order — byte-identical to the reference's
    ``__hash__`` update loop (``dbt_client.py:45-58``), with NULL rendered
    ``None`` the way Python f-strings do."""
    parts = [
        F.concat(
            F.lit(f"{k}:"),
            F.coalesce(F.col(k).cast("string"), F.lit("None")),
        )
        for k in spec.hash_keys
    ]
    return F.sha2(F.concat(*parts).cast("binary"), 256).alias(out_col)


def check_duplicates(df: DataFrame, spec: RecordSpec) -> bool:
    """True iff any two rows share a content hash ↔ ``check_duplicates``
    (``dbt_client.py:649-658``) — one aggregation, no driver set."""
    row = df.select(content_hash(spec)).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("record_hash").alias("nd"),
    ).first()
    return bool(row["n"] != row["nd"])


def dedup_records(df: DataFrame, spec: RecordSpec) -> DataFrame:
    """Keep one row per content hash (deterministic keep-min over the
    non-key columns is unnecessary: rows sharing an identity hash are the
    same logical record by the reference's definition)."""
    return (
        df.withColumn("__h", content_hash(spec))
        .dropDuplicates(["__h"])
        .drop("__h")
    )


# --------------------------------------------------------------------------
# dbt Cloud specs ↔ dbt_client.py:22-300 (dataclasses) / :334-442 (parsers)
# --------------------------------------------------------------------------

DBT_JOB = RecordSpec(
    "dbt_job",
    (
        ("job_id", "$.id", "string"),
        ("job_name", "$.name", "string"),
        ("job_description", "$.description", "string"),
        ("project_id", "$.project_id", "string"),
        ("environment_id", "$.environment_id", "string"),
        ("created_at", "$.created_at", "string"),
        ("updated_at", "$.updated_at", "string"),
        ("state", "$.state", "string"),
        ("deactivated", "$.deactivated", "string"),
        ("schedule", "$.schedule.cron", "string"),
        ("cron_humanized", "$.cron_humanized", "string"),
    ),
    ("job_id", "state", "created_at"),
)

DBT_RUN = RecordSpec(
    "dbt_run",
    (
        ("run_id", "$.id", "bigint"),
        ("job_id", "$.job_id", "bigint"),
        ("environment_id", "$.environment_id", "bigint"),
        ("project_id", "$.project_id", "bigint"),
        ("status", "$.status", "string"),
        ("created_at", "$.created_at", "string"),
        ("started_at", "$.started_at", "string"),
        ("finished_at", "$.finished_at", "string"),
        ("in_progress", "$.in_progress", "boolean"),
        ("is_complete", "$.is_complete", "boolean"),
        ("is_success", "$.is_success", "boolean"),
        ("is_error", "$.is_error", "boolean"),
        ("is_cancelled", "$.is_cancelled", "boolean"),
        ("duration", "$.duration", "string"),
        ("queued_duration", "$.queued_duration", "string"),
        ("run_duration", "$.run_duration", "string"),
        ("can_retry", "$.can_retry", "boolean"),
        ("is_running", "$.is_running", "boolean"),
    ),
    ("run_id", "created_at", "status"),
)

DBT_ENVIRONMENT = RecordSpec(
    "dbt_environment",
    (
        ("environment_id", "$.id", "string"),
        ("project_id", "$.project_id", "string"),
        ("connection_id", "$.connection_id", "string"),
        ("repository_id", "$.repository_id", "string"),
        ("name", "$.name", "string"),
        ("custom_branch", "$.custom_branch", "string"),
        ("updated_at", "$.updated_at", "string"),
        ("state", "$.state", "string"),
    ),
    # reference __hash__ reads nonexistent created_at (dbt_client.py:131)
    # — hash existing identity fields instead
    ("environment_id", "updated_at", "state"),
)

DBT_REPOSITORY = RecordSpec(
    "dbt_repository",
    (
        ("repository_id", "$.id", "string"),
        ("project_id", "$.project_id", "string"),
        ("project_name", "$.name", "string"),
        ("project_full_name", "$.full_name", "string"),
        ("remote_url", "$.remote_url", "string"),
        ("state", "$.state", "string"),
        ("created_at", "$.created_at", "string"),
        ("updated_at", "$.updated_at", "string"),
    ),
    ("repository_id", "created_at", "state"),
)

DBT_CONNECTION = RecordSpec(
    "dbt_connection",
    (
        ("connection_id", "$.id", "string"),
        ("project_id", "$.project_id", "string"),
        ("project_name", "$.project_name", "string"),
        ("conn_name", "$.name", "string"),
        ("conn_type", "$.type", "string"),
        ("state", "$.state", "string"),
    ),
    ("connection_id", "state"),
)

DBT_PROJECT = RecordSpec(
    "dbt_project",
    (
        ("project_id", "$.id", "string"),
        ("project_name", "$.name", "string"),
        ("connection_id", "$.connection_id", "string"),
        ("repository_id", "$.repository_id", "string"),
        ("created_at", "$.created_at", "string"),
        ("updated_at", "$.updated_at", "string"),
        ("state", "$.state", "string"),
    ),
    ("project_id", "created_at", "state"),
)

DBT_MODEL = RecordSpec(
    "dbt_model",
    (
        ("database", "$.database", "string"),
        ("schema", "$.schema", "string"),
        ("model_name", "$.name", "string"),
    ),
    # reference __hash__ reads nonexistent fields (dbt_client.py:247-253)
    ("database", "schema", "model_name"),
)


# --------------------------------------------------------------------------
# Tableau specs ↔ tableau_client.py:11-15 (namedtuples) / :98-136 (users)
# --------------------------------------------------------------------------

TABLEAU_USER = RecordSpec(
    "tableau_user",
    (
        ("user_id", "$.id", "string"),
        ("name", "$.fullName", "string"),
        ("site_role", "$.siteRole", "string"),
    ),
    ("user_id",),
)

TABLEAU_WORKBOOK = RecordSpec(
    "tableau_workbook",
    (
        ("site", "$.site", "string"),
        ("name", "$.name", "string"),
        ("project_name", "$.projectName", "string"),
        ("workbook_id", "$.id", "string"),
        ("luid", "$.luid", "string"),
        ("owner_id", "$.owner.id", "string"),
        ("created_at", "$.createdAt", "string"),
        ("updated_at", "$.updatedAt", "string"),
    ),
    ("workbook_id", "updated_at"),
)
