"""Golden tests: every oracle-backed query must match DuckDB *exactly*.

This mirrors the driver's CORRECTNESS gate (row count + schema + value hash,
column-name-sorted, order-insensitive) but stricter: values are compared
for exact equality (floats bit-for-bit), so any pass here implies a pass
under any reasonable hashing scheme.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pyveb_spark.queries import ORACLE_SQL, QUERIES
from pyveb_spark.sources.readers import TESTDATA_TABLES


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    return value


def _rows_to_comparable(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(columns), sorted(out, key=lambda t: tuple(map(repr, t)))


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    sdf = QUERIES[name](spark, sf_dir)

    # DRIVER-CANON CONTRACT: the certification harness canonicalizes
    # result rows with pandas hashing, which cannot hash list/dict
    # cells — a registered query whose output schema carries an
    # array/map/struct column errors in the DRIVER's canonicalizer even
    # when its values are oracle-identical (q117's round-7 red). Scalar
    # columns only; join arrays into strings (array_join / DuckDB
    # array_to_string) before returning.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name} emits non-scalar output columns {complex_cols}; the "
        "driver's pandas canonicalizer cannot hash them — array_join to "
        "a scalar string in BOTH the Spark query and the oracle SQL"
    )

    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # NON-VACUITY INVARIANT (enforcement of the repo's zero-rows-only
    # claim): every oracled query must return >=1 row at sf0.01. A query
    # that hash-matches its oracle on an EMPTY result proves nothing —
    # both round-2 vacuity bugs (q34/q75 empty Q9, q53 empty at sf0.01)
    # would have been caught here.
    assert len(spark_rows) >= 1, (
        f"{name} returned 0 rows at {sf_dir} — vacuous oracle match; "
        "adjust the query's predicates so the fixture exercises it"
    )

    cur = oracle.execute(ORACLE_SQL[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    s_cols, s_rows = _rows_to_comparable(spark_cols, spark_rows)
    d_cols, d_rows = _rows_to_comparable(duck_cols, duck_rows)

    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


def test_all_queries_have_callables():
    for name in ORACLE_SQL:
        assert name in QUERIES
