#!/usr/bin/env python
"""Deterministic synthetic-fixture generator for SCALE experiments.

Reproduces the driver fixtures' schema and statistical shape (vocabulary
random-word documents with a planted near-dup fraction, 64-dim clustered
embeddings, TPC-H-ish star tables) at an arbitrary multiple of sf0.1 so
iterative/quadratic-risk operators can be measured beyond the committed
test data. Writes parquet to --out (default /tmp/sf1). NOT the driver's
generator and never oracle-checked — perf measurement only; the repo's
correctness data under /root/testdata is untouched.

Usage: python tools/gen_scale.py [--mult 10] [--out /tmp/sf1]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark line column order part batch small sort fast value scan hash "
    "slow query agg table key group the a stream filter big merge join "
    "vector customer".split()
)
LANGS = ["en"] * 6 + ["fr", "de", "zh", "nl"]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    texts: list[str] = []
    for i in range(n):
        if i >= 20 and rng.random() < 0.025:
            # planted near-duplicate: mutate 1-2 tokens of a recent doc —
            # constant per-doc dup probability keeps the dup-pair count
            # LINEAR in corpus size (clusters stay tiny), matching the
            # committed fixtures' shape
            src = texts[int(rng.integers(max(0, i - 50), i))].split()
            for _ in range(int(rng.integers(1, 3))):
                src[int(rng.integers(0, len(src)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))
                ]
            texts.append(" ".join(src))
        else:
            k = int(rng.integers(15, 61))
            texts.append(
                " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), k))
            )
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": texts,
            "lang": [LANGS[int(x)] for x in rng.integers(0, len(LANGS), n)],
            "source": [f"src{int(x)}" for x in rng.integers(0, 20, n)],
            "n_chars": pa.array([len(t) for t in texts], pa.int32()),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator, dim: int = 64) -> pa.Table:
    centers = rng.normal(0, 1, (10, dim)).astype(np.float32)
    labels = rng.integers(0, 10, n)
    vecs = centers[labels] + rng.normal(0, 0.35, (n, dim)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )


def gen_star(mult: float, rng: np.random.Generator, out: str) -> None:
    n_li = int(600_000 * mult)
    n_ord = int(150_000 * mult)
    n_cust = int(15_000 * mult)
    n_supp = int(1_000 * mult)
    n_part = int(20_000 * mult)
    statuses = np.array(["O", "F", "P"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    base = np.datetime64("2022-01-01")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": statuses[rng.integers(0, 3, n_ord)],
                "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
                "o_orderdate": pa.array(
                    base + rng.integers(0, 1095, n_ord).astype("timedelta64[D]")
                ),
                "o_orderpriority": prios[rng.integers(0, 5, n_ord)],
            }
        ),
        f"{out}/orders.parquet",
    )
    rf = np.array(["N", "R", "A"])
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
                "l_quantity": np.round(rng.uniform(1, 50, n_li), 2),
                "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
                "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
                "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
                "l_returnflag": rf[rng.integers(0, 3, n_li)],
                "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
                "l_shipdate": pa.array(
                    base + rng.integers(0, 1095, n_li).astype("timedelta64[D]")
                ),
            }
        ),
        f"{out}/lineitem.parquet",
    )
    segs = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": segs[rng.integers(0, 5, n_cust)],
            }
        ),
        f"{out}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            }
        ),
        f"{out}/supplier.parquet",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, default=10.0, help="multiple of sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(
        gen_documents(int(5000 * args.mult), rng), f"{args.out}/documents.parquet"
    )
    pq.write_table(
        gen_embeddings(int(2000 * args.mult), rng), f"{args.out}/embeddings.parquet"
    )
    gen_star(args.mult, rng, args.out)
    print(f"wrote {args.out} at {args.mult}x sf0.1")


if __name__ == "__main__":
    main()
