"""Type-system bridges + DDL generation.

Reference parity (SURVEY.md §1.2, §2.2): ``parser.py`` bridges four type
systems with mapping dicts — SQL-Server→warehouse (``parser.py:16-31``),
pandas→warehouse (``:33-37``), PySpark→warehouse (``:39-45``),
pandas→PySpark (``:47-53``), SQL-Server→PySpark (``:55-70`` incl. decimal
precision carry-through ``:106``) — and emits Flyway-style ``CREATE TABLE``
DDL (``:120-227``). Here ``StructType`` is the single source of truth;
every bridge maps in/out of it, and DDL generation is ``schema.toDDL()``
plus warehouse-dialect typing.

Deliberately-kept reference semantics: SQL-Server ``timestamp`` (rowversion)
and ``uniqueidentifier`` map to VARCHAR(256) (``parser.py:27-30``); every
table gets a ``META_loading_date_utc`` default-now column (``parser.py:6,14``).
"""

from __future__ import annotations

import re

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "sqlserver_to_spark_type",
    "pandas_to_spark_type",
    "spark_to_warehouse_type",
    "schema_from_sqlserver_ddl",
    "schema_from_pandas",
    "warehouse_create_table",
    "warehouse_copy_csv",
    "write_migration",
    "sanitize_name",
]

# SQL Server → Spark (parser.py:55-70)
_SQLSERVER_TO_SPARK: dict[str, DataType] = {
    "smallint": IntegerType(),
    "int": IntegerType(),
    "bigint": LongType(),
    "bit": BooleanType(),
    "date": DateType(),
    "datetime": TimestampType(),
    "datetime2": TimestampType(),
    "smalldatetime": TimestampType(),
    "float": DoubleType(),
    "real": FloatType(),
    "money": DecimalType(19, 4),
    "char": StringType(),
    "nchar": StringType(),
    "varchar": StringType(),
    "nvarchar": StringType(),
    "text": StringType(),
    "ntext": StringType(),
    # deliberate reference semantics (parser.py:27-30)
    "timestamp": StringType(),
    "uniqueidentifier": StringType(),
}

# pandas dtype name → Spark (parser.py:47-53)
_PANDAS_TO_SPARK: dict[str, DataType] = {
    "int64": LongType(),
    "int32": IntegerType(),
    "Int64": LongType(),
    "float64": DoubleType(),
    "float32": FloatType(),
    "object": StringType(),
    "string": StringType(),
    "bool": BooleanType(),
    "boolean": BooleanType(),
    "datetime64[ns]": TimestampType(),
    "datetime64[us]": TimestampType(),
}

# Spark → warehouse DDL type (parser.py:39-45, Redshift-flavored ANSI)
_SPARK_TO_WAREHOUSE: dict[str, str] = {
    "byte": "SMALLINT",
    "short": "SMALLINT",
    "integer": "BIGINT",  # reference widens int→BIGINT (parser.py:40)
    "long": "BIGINT",
    "float": "REAL",
    "double": "DOUBLE PRECISION",
    "string": "VARCHAR(MAX)",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "binary": "VARBYTE",
}


def sqlserver_to_spark_type(name: str) -> DataType:
    """'decimal(12,2)' / 'nvarchar(50)' / 'bigint' → Spark type, with
    decimal precision/scale carried through (parser.py:106)."""
    m = re.match(
        r"^\s*\[?\s*(\w+)\s*\]?\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\))?",
        name.lower(),
    )
    if m is None:
        raise ValueError(f"unmapped SQL Server type: {name!r}")
    base, p, s = m.group(1), m.group(2), m.group(3)
    if base in ("decimal", "numeric"):
        return DecimalType(int(p or 38), int(s or 0))
    if base not in _SQLSERVER_TO_SPARK:
        raise ValueError(f"unmapped SQL Server type: {name!r}")
    return _SQLSERVER_TO_SPARK[base]


def pandas_to_spark_type(dtype_name: str) -> DataType:
    if dtype_name not in _PANDAS_TO_SPARK:
        raise ValueError(f"unmapped pandas dtype: {dtype_name!r}")
    return _PANDAS_TO_SPARK[dtype_name]


def spark_to_warehouse_type(dt: DataType) -> str:
    if isinstance(dt, DecimalType):
        return f"NUMERIC({dt.precision},{dt.scale})"
    name = dt.typeName()
    if name not in _SPARK_TO_WAREHOUSE:
        raise ValueError(f"unmapped Spark type for warehouse DDL: {name}")
    return _SPARK_TO_WAREHOUSE[name]


_NAME_STRIP = re.compile(r"[()/,;{}\n\t=]")


def sanitize_name(name: str) -> str:
    """Column-name sanitization ↔ ``parser.py:78,103`` (strip
    ``()/,;{}\\n\\t=``, spaces → ``_``)."""
    return _NAME_STRIP.sub("", name).strip().replace(" ", "_")


def schema_from_sqlserver_ddl(columns: list[tuple[str, str]]) -> StructType:
    """[(name, sqlserver_type)] → StructType ↔ ``sql_ddl_to_pyspark``
    (``parser.py:88-118``; the reference parses DDL text with
    simple-ddl-parser — we take the parsed (name, type) pairs, keeping the
    engine free of a DDL-text dependency)."""
    return StructType(
        [
            StructField(sanitize_name(n), sqlserver_to_spark_type(t), True)
            for n, t in columns
        ]
    )


def schema_from_pandas(pdf) -> StructType:
    """pandas DataFrame → StructType ↔ ``df_to_pyveb``/``parser.py:72-86``."""
    return StructType(
        [
            StructField(sanitize_name(str(c)), pandas_to_spark_type(str(d)), True)
            for c, d in pdf.dtypes.items()
        ]
    )


def warehouse_create_table(
    schema: StructType,
    table: str,
    sort_keys: list[str] | None = None,
    add_loading_date: bool = True,
    if_not_exists: bool = True,
) -> str:
    """StructType → warehouse ``CREATE TABLE`` DDL ↔
    ``pyspark_to_flyway_ddl`` (``parser.py:120-141``: DISTSTYLE AUTO,
    optional compound sort key, ``meta_loading_date_utc`` default-now
    column appended per ``parser.py:6,14``)."""
    cols = [
        f'    "{sanitize_name(f.name)}" {spark_to_warehouse_type(f.dataType)}'
        for f in schema.fields
    ]
    if add_loading_date:
        cols.append('    "meta_loading_date_utc" TIMESTAMP DEFAULT sysdate')
    exists = "IF NOT EXISTS " if if_not_exists else ""
    ddl = f"CREATE TABLE {exists}{table} (\n" + ",\n".join(cols) + "\n)"
    ddl += "\nDISTSTYLE AUTO"
    if sort_keys:
        quoted = ", ".join(f'"{sanitize_name(k)}"' for k in sort_keys)
        ddl += f"\nCOMPOUND SORTKEY({quoted})"
    return ddl + ";"


def write_migration(
    ddl: str,
    migrations_dir: str,
    description: str,
    version: int | None = None,
) -> str:
    """Write a Flyway-style versioned migration file
    ``V{n}__{description}.sql`` ↔ ``write_flyway_ddl_to_file``
    (``parser.py:215-227``: scans the directory, sorts existing versions,
    next = max + 1). Returns the written path."""
    import os
    import re

    os.makedirs(migrations_dir, exist_ok=True)
    if version is None:
        existing = [
            int(m.group(1))
            for f in os.listdir(migrations_dir)
            if (m := re.match(r"V(\d+)__", f))
        ]
        version = (max(existing) + 1) if existing else 1
    safe = re.sub(r"[^A-Za-z0-9]+", "_", description).strip("_")
    path = os.path.join(migrations_dir, f"V{version}__{safe}.sql")
    with open(path, "w") as fh:
        fh.write(ddl if ddl.endswith("\n") else ddl + "\n")
    return path


def warehouse_copy_csv(
    table: str,
    columns: list[str],
    source_uri: str,
    iam_role: str,
    delimiter: str = ";",
    time_format: str = "YYYY-MM-DD HH:MI:SS",
) -> str:
    """Warehouse ``COPY ... CSV`` load statement ↔ ``load_copy_csv``
    (``rs_client.py:390-428`` — which carries a ``CVS`` typo and an UNTESTED
    marker; semantics reproduced, typo not)."""
    collist = ", ".join(f'"{sanitize_name(c)}"' for c in columns)
    return (
        f"COPY {table} ({collist})\n"
        f"FROM '{source_uri}'\n"
        f"IAM_ROLE '{iam_role}'\n"
        f"CSV DELIMITER '{delimiter}' IGNOREHEADER 1 EMPTYASNULL\n"
        f"TIMEFORMAT '{time_format}';"
    )


def schema_evolution_sql(
    old: StructType,
    new: StructType,
    table: str,
    allow_drops: bool = False,
) -> list[str]:
    """Diff two Spark schemas into warehouse ``ALTER TABLE`` statements —
    the migration half of schema drift (the read side already absorbs
    drift via ``mergeSchema``/``enforce_schema``; this emits the DDL that
    brings the WAREHOUSE target up to date, Flyway-ready via
    ``write_migration``).

    Emitted, in apply-safe order: ``ADD COLUMN`` for new fields (always
    nullable — historical rows have no value), type-change statements for
    fields whose Spark type maps to a different warehouse type, and —
    only with ``allow_drops=True`` — ``DROP COLUMN`` for removed fields
    (destructive, so opt-in; default leaves removed columns in place,
    matching the additive-only evolution every long-lived warehouse table
    actually practices). Name matching is case-insensitive on the
    sanitized name, mirroring ``sanitize_name`` everywhere else in this
    module. Returns [] when the schemas already agree.
    """
    def keyed(schema: StructType) -> dict[str, StructField]:
        return {sanitize_name(f.name).lower(): f for f in schema.fields}

    old_map, new_map = keyed(old), keyed(new)
    stmts: list[str] = []
    for key, f in new_map.items():
        wtype = spark_to_warehouse_type(f.dataType)
        if key not in old_map:
            stmts.append(
                f'ALTER TABLE {table} ADD COLUMN "{sanitize_name(f.name)}" '
                f"{wtype};"
            )
        elif spark_to_warehouse_type(old_map[key].dataType) != wtype:
            stmts.append(
                f'ALTER TABLE {table} ALTER COLUMN '
                f'"{sanitize_name(f.name)}" TYPE {wtype};'
            )
    if allow_drops:
        for key, f in old_map.items():
            if key not in new_map:
                stmts.append(
                    f'ALTER TABLE {table} DROP COLUMN '
                    f'"{sanitize_name(f.name)}";'
                )
    return stmts
