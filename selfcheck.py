"""Self-check harness mirroring the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on a PLAIN
SparkSession (no ``get_spark`` confs — exactly what the driver does), runs
the matching ``oracle_sql()`` in DuckDB over the same parquet tables, and
compares row count, sorted column names, and values (columns sorted by
name, rows sorted, floats compared to 1e-9 relative tolerance and also
hashed after rounding to 6 decimals to approximate the driver's
value-hash).

Usage::

    python selfcheck.py [--sf-dir /root/testdata/sf0.01] [--only q07,q43]

Exit code 0 iff every checked query is green (no_oracle entries report
rows-only and do not fail the run unless the query itself errors).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def canon(v):
        if v is None:
            return None
        if isinstance(v, float):
            if np.isnan(v):
                return None
            return round(v, 6)
        if isinstance(v, (np.floating,)):
            f = float(v)
            return None if np.isnan(f) else round(f, 6)
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.bool_,)):
            return bool(v)
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        if isinstance(v, (list, np.ndarray)):
            return tuple(canon(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, canon(x)) for k, x in v.items()))
        return v

    out = pdf.map(canon)
    if len(out):
        out = out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(drop=True)
    return out


def value_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in pdf.itertuples(index=False, name=None):
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    res = {
        "rows_match": len(spark_pdf) == len(oracle_pdf),
        "schema_match": sorted(map(str.lower, spark_pdf.columns))
        == sorted(map(str.lower, oracle_pdf.columns)),
        "hash_match": None,
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
        "err": None,
    }
    if not (res["rows_match"] and res["schema_match"]):
        res["hash_match"] = False
        return res
    s = normalize(spark_pdf.rename(columns=str.lower))
    o = normalize(oracle_pdf.rename(columns=str.lower))
    res["hash_match"] = value_hash(s) == value_hash(o)
    if not res["hash_match"]:
        # find first differing cell for debugging
        for i in range(min(len(s), 20000)):
            for c in s.columns:
                a, b = s.at[i, c], o.at[i, c]
                if a != b and not (
                    isinstance(a, float) and isinstance(b, float)
                    and np.isclose(a, b, rtol=1e-6, atol=1e-9)
                ):
                    res["err"] = f"first diff row {i} col {c}: spark={a!r} oracle={b!r}"
                    return res
        res["err"] = "hash mismatch but no cell diff found at 1e-6 (rounding edge)"
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated name prefixes")
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # plain session, like the driver's — only master/shuffle width set
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    selected = list(qs)
    if args.only:
        prefixes = args.only.split(",")
        selected = [n for n in selected if any(n.startswith(p) for p in prefixes)]

    results, n_green, n_red, n_noracle = {}, 0, 0, 0
    for name in selected:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            # driver-canon contract: the DRIVER's pandas canonicalizer
            # cannot hash list/dict cells (q117's round-7 red), so a
            # complex output column is a hard red here even though the
            # tuple-canon below could tolerate it
            from pyspark.sql.types import ArrayType, MapType, StructType

            bad = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if bad:
                results[name] = {
                    "err": f"non-scalar output columns {bad} violate the "
                    "driver canon contract (array_join to a string)"
                }
                n_red += 1
                print(f"RED   {name}: non-scalar columns {bad}")
                continue
            spark_pdf = sdf.toPandas()
        except Exception:
            results[name] = {"err": traceback.format_exc(limit=5)}
            n_red += 1
            print(f"RED   {name}: SPARK ERROR")
            continue
        if name not in oracles:
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(spark_pdf), "oracle_rows": None, "err": "no_oracle",
            }
            n_noracle += 1
            print(f"NOOR  {name}: rows={len(spark_pdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            results[name] = {"err": "ORACLE ERROR: " + traceback.format_exc(limit=3)}
            n_red += 1
            print(f"RED   {name}: ORACLE ERROR")
            continue
        res = compare(spark_pdf, oracle_pdf)
        results[name] = res
        ok = res["rows_match"] and res["schema_match"] and res["hash_match"]
        if ok:
            n_green += 1
            print(f"green {name}: rows={res['spark_rows']} ({time.time()-t0:.1f}s)")
        else:
            n_red += 1
            print(f"RED   {name}: {json.dumps({k: v for k, v in res.items() if k != 'err'})}")
            if res.get("err"):
                print(f"      {res['err'][:500]}")

    print(f"\n== {n_green} green / {n_red} red / {n_noracle} no_oracle "
          f"of {len(selected)} checked ==")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, default=str)
    return 0 if n_red == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
