#!/usr/bin/env python
"""Seed-varied sf0.01 TWIN generator for oracle-robustness runs.

The committed fixtures certify Spark ≡ DuckDB on ONE seed; a query whose
constant is accidentally tuned to that seed's geometry (an LSH plane
count, an admission threshold, a banding width) would stay green forever
while sharing a misconception with its oracle. This tool writes a
schema-complete twin of `/root/testdata/sf0.01` — all ten tables, same
column types and value ranges, DIFFERENT rng seed and (optionally)
near-dup planting rate — so `python selfcheck.py --sf-dir <twin>` replays
the entire oracle suite against a data shape nobody tuned against.

Usage::

    python tools/gen_twin.py --seed 7 --dup-rate 0.06 --out /tmp/twin7
    python selfcheck.py --sf-dir /tmp/twin7

Distributions mirror the fixture profile measured in round 6 (see
VERDICT r5 'What's wrong' #2): 31-word vocabulary (superset kept so the
BM25/TF-IDF literal query tokens exist), 5 languages / 20 sources,
integer-valued l_quantity (q75's binary-exact percentile contract),
orders/lineitem dates in 1995-2001, events over one month of 2024 with
`{"k": n}` props. NOT the driver's generator — the committed testdata is
untouched; this is the robustness harness only.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window".split()
)
LANGS = ["en"] * 4 + ["fr", "de", "zh", "es"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ADJS = "blue cold hot large new old red small".split()
NOUNS = "anvil bolt gear gizmo plate ring rod widget".split()
TYPES = "ECONOMY LARGE MEDIUM PROMO SMALL STANDARD".split()
SEGS = "BUILDING AUTOMOBILE MACHINERY HOUSEHOLD FURNITURE".split()
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = "click error purchase signup view".split()


def gen_documents(n: int, rng: np.random.Generator, dup_rate: float) -> pa.Table:
    texts: list[str] = []
    for i in range(n):
        if i >= 20 and rng.random() < dup_rate:
            # planted near-duplicate: mutate 1-2 tokens of a recent doc
            src = texts[int(rng.integers(max(0, i - 50), i))].split()
            for _ in range(int(rng.integers(1, 3))):
                src[int(rng.integers(0, len(src)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))
                ]
            texts.append(" ".join(src))
        else:
            k = int(rng.integers(15, 75))
            texts.append(
                " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), k))
            )
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": texts,
            "lang": [LANGS[int(x)] for x in rng.integers(0, len(LANGS), n)],
            "source": [f"src{int(x)}" for x in rng.integers(0, 20, n)],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
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
                [v for v in vecs.astype(np.float32)], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )


def _us(days_base: str, day_offsets, us_offsets=None) -> pa.Array:
    base = np.datetime64(days_base, "us")
    out = base + day_offsets.astype("timedelta64[D]").astype("timedelta64[us]")
    if us_offsets is not None:
        out = out + us_offsets.astype("timedelta64[us]")
    return pa.array(out, pa.timestamp("us"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument(
        "--dup-rate", type=float, default=0.06,
        help="near-dup planting probability (fixture ~0.025-0.05)",
    )
    ap.add_argument("--out", default="/tmp/twin")
    ap.add_argument(
        "--mult", type=float, default=1.0, help="multiple of sf0.01 sizes"
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    m = args.mult

    n_docs, n_emb = int(500 * m), int(500 * m)
    n_ord, n_li = int(15_000 * m), int(60_000 * m)
    n_cust, n_supp, n_part, n_ev = (
        int(1_500 * m), int(100 * m), int(2_000 * m), int(10_000 * m)
    )

    pq.write_table(
        gen_documents(n_docs, rng, args.dup_rate),
        f"{args.out}/documents.parquet",
    )
    pq.write_table(gen_embeddings(n_emb, rng), f"{args.out}/embeddings.parquet")

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
        f"{args.out}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        f"{args.out}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": [
                    f"{ADJS[int(a)]} {NOUNS[int(b)]}"
                    for a, b in zip(
                        rng.integers(0, len(ADJS), n_part),
                        rng.integers(0, len(NOUNS), n_part),
                    )
                ],
                "p_brand": [
                    f"Brand#{int(x)}" for x in rng.integers(0, 25, n_part)
                ],
                "p_type": [TYPES[int(x)] for x in rng.integers(0, 6, n_part)],
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
            }
        ),
        f"{args.out}/part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": [
                    SEGS[int(x)] for x in rng.integers(0, 5, n_cust)
                ],
            }
        ),
        f"{args.out}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            }
        ),
        f"{args.out}/supplier.parquet",
    )
    order_day = rng.integers(0, 2404, n_ord)  # 1995-01-01 .. 2001-08
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": [
                    "OFP"[int(x)] for x in rng.integers(0, 3, n_ord)
                ],
                "o_totalprice": np.round(
                    rng.uniform(1000, 500000, n_ord), 2
                ),
                "o_orderdate": _us("1995-01-01", order_day),
                "o_orderpriority": [
                    PRIOS[int(x)] for x in rng.integers(0, 5, n_ord)
                ],
            }
        ),
        f"{args.out}/orders.parquet",
    )
    li_order = rng.integers(0, n_ord, n_li)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(li_order, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_li), pa.int32()
                ),
                # integer-valued by contract (q75's binary-exact percentiles)
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(
                    rng.uniform(900, 105000, n_li), 2
                ),
                "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
                "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
                "l_returnflag": [
                    "NRA"[int(x)] for x in rng.integers(0, 3, n_li)
                ],
                "l_linestatus": [
                    "OF"[int(x)] for x in rng.integers(0, 2, n_li)
                ],
                # ship 1..120 days after the order date
                "l_shipdate": _us(
                    "1995-01-01",
                    order_day[li_order] + rng.integers(1, 121, n_li),
                ),
            }
        ),
        f"{args.out}/lineitem.parquet",
    )
    ev_us = np.sort(
        rng.integers(0, 30 * 24 * 3600 * 1_000_000, n_ev, dtype=np.int64)
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": _us("2024-01-01", np.zeros(n_ev, dtype=np.int64), ev_us),
                "user_id": pa.array(rng.integers(0, 150, n_ev), pa.int64()),
                "event_type": [
                    EVENT_TYPES[int(x)] for x in rng.integers(0, 5, n_ev)
                ],
                "value": np.round(rng.uniform(0.01, 490, n_ev), 2),
                "props": [
                    '{"k": %d}' % int(x) for x in rng.integers(0, 100, n_ev)
                ],
            }
        ),
        f"{args.out}/events.parquet",
    )
    print(
        f"wrote twin to {args.out} (seed={args.seed}, "
        f"dup_rate={args.dup_rate}, mult={args.mult})"
    )


if __name__ == "__main__":
    main()
