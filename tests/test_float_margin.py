"""Float-tie margin guards for the ANN/k-means oracles (ADVICE r2).

q30/q37/q57 compare order-sensitive decisions on *unrounded* doubles
across two engines: argmin centroid assignment, nprobe centroid ranking,
LSH sign bits, and top-k cut lines all use values DuckDB computes with
``list_distance`` (sqrt) / its own summation order while Spark folds
squared-L2 left-to-right. Cross-engine disagreement on one near-tie would
flip a row and fail the value-hash gate even though both engines are
correct. These tests assert every such decision on the CURRENT fixture
has a margin ≥ ~1e-9 (five orders of magnitude above the ~1e-14 relative
error cross-engine double arithmetic can produce), so a future fixture /
parameter change that lands on a knife-edge surfaces HERE as a clear
failure instead of as a confusing oracle mismatch.

Pure numpy on the parquet fixture — no Spark session; the md5-derived
constants are recomputed from their documented formulas
(`similarity.py::_seed_centroids` / `_rademacher_planes` docstrings).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# minimum acceptable decision margin: ~1e5 × the worst cross-engine
# double-rounding divergence at dim=64
REL_MARGIN = 1e-9


@pytest.fixture(scope="module")
def emb():
    pdf = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return pdf["vec_id"].to_numpy(), X


def _md5_48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _seed_order(vec_ids):
    """md5('ivf|<id>') rank — the documented _seed_centroids ordering."""
    return sorted(range(len(vec_ids)), key=lambda i: (_md5_48(f"ivf|{vec_ids[i]}"), vec_ids[i]))


def _assign_margins(X, C):
    """Per-point (best, second-best) squared-L2 gap over centroids C."""
    D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
    S = np.sort(D, axis=1)
    scale = np.maximum(S[:, 1], 1e-30)
    return (S[:, 1] - S[:, 0]) / scale


def test_kmeans_assignment_margins_every_iteration(emb):
    """q57: six Lloyd iterations, k=10 — every point's nearest-centroid
    decision must be clear at every iteration (assignment at iter t uses
    the centroids produced by iter t-1)."""
    vec_ids, X = emb
    order = _seed_order(vec_ids)
    C = X[order[:10]].copy()
    for it in range(6):
        m = _assign_margins(X, C)
        assert m.min() > REL_MARGIN, (
            f"k-means iter {it}: knife-edge assignment margin {m.min():.3e}"
        )
        lab = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
        for c in range(10):
            mask = lab == c
            if mask.any():
                C[c] = X[mask].mean(axis=0)


def test_ivf_assignment_probe_and_topk_margins(emb):
    """q37: 16 seed centroids, nprobe=4, k=10."""
    vec_ids, X = emb
    order = _seed_order(vec_ids)
    C = X[order[:16]]
    # (1) every vector's list assignment is clear
    m = _assign_margins(X, C)
    assert m.min() > REL_MARGIN, f"IVF assignment margin {m.min():.3e}"
    # (2) the probe set is clear: query→centroid distance, 4th vs 5th
    q = X[vec_ids.tolist().index(0)]
    dq = np.sort(((C - q) ** 2).sum(axis=1))
    probe_gap = (dq[4] - dq[3]) / max(dq[4], 1e-30)
    assert probe_gap > REL_MARGIN, f"nprobe cut margin {probe_gap:.3e}"
    # (3) the top-10 cut inside the probed lists is clear
    lab = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    probed = set(np.argsort(((C - q) ** 2).sum(axis=1))[:4])
    cand = [i for i in range(len(X)) if lab[i] in probed and vec_ids[i] != 0]
    sims = np.sort([_cos(X[i], q) for i in cand])[::-1]
    if len(sims) > 10:
        cut_gap = sims[9] - sims[10]
        assert cut_gap > REL_MARGIN, f"IVF top-k cut margin {cut_gap:.3e}"


def _cos(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_lsh_sign_bits_and_topk_margins(emb):
    """q30: 6 Rademacher planes, seed 42 — no vector may sit on a
    hyperplane (a sign flip moves it to another bucket), and the top-10
    cut inside the query's bucket must be clear."""
    vec_ids, X = emb
    planes = np.asarray(
        [
            [
                1.0 if _md5_48(f"plane|42|{j}|{d}") % 2 == 1 else -1.0
                for d in range(X.shape[1])
            ]
            for j in range(6)
        ]
    )
    dots = X @ planes.T  # n × 6
    # relative to the vector scale so tiny-norm vectors don't mask a tie
    norms = np.linalg.norm(X, axis=1, keepdims=True) * np.linalg.norm(planes, axis=1)
    rel = np.abs(dots) / np.maximum(norms, 1e-30)
    assert rel.min() > REL_MARGIN, f"LSH sign-bit margin {rel.min():.3e}"
    buckets = (dots >= 0) @ (1 << np.arange(6))
    qi = vec_ids.tolist().index(0)
    q = X[qi]
    in_bucket = [
        i for i in range(len(X)) if buckets[i] == buckets[qi] and vec_ids[i] != 0
    ]
    sims = np.sort([_cos(X[i], q) for i in in_bucket])[::-1]
    if len(sims) > 10:
        cut_gap = sims[9] - sims[10]
        assert cut_gap > REL_MARGIN, f"LSH top-k cut margin {cut_gap:.3e}"


def test_pq_training_encode_and_adc_margins(emb):
    """q87: per-subspace Lloyd over the md5-ordered training sample
    (m=4, k=16, 2 iters, sample 4096), full-corpus encode argmin, and the
    ADC shortlist / re-rank cuts must all be clear of cross-engine float
    ties. Training-assignment margins only matter for SAMPLED vectors —
    the centroid update never sees the rest."""
    vec_ids, X = emb
    order = _seed_order(vec_ids)
    train = order[: min(4096, len(X))]
    m, k, iters, dsub = 4, 16, 2, X.shape[1] // 4
    qi = vec_ids.tolist().index(0)
    codes = np.empty((len(X), m), dtype=int)
    luts = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        T = S[train]
        C = T[:k].copy()
        for it in range(iters):
            mgn = _assign_margins(T, C)
            assert mgn.min() > REL_MARGIN, (
                f"PQ subspace {j} iter {it}: margin {mgn.min():.3e}"
            )
            lab = ((T[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            for c in range(k):
                msk = lab == c
                if msk.any():
                    C[c] = T[msk].mean(axis=0)
        mgn = _assign_margins(S, C)  # encode against the final codebook
        assert mgn.min() > REL_MARGIN, (
            f"PQ subspace {j} encode: margin {mgn.min():.3e}"
        )
        codes[:, j] = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
        luts.append(((C - S[qi]) ** 2).sum(axis=1))
    adc = np.array(
        [sum(luts[j][codes[i, j]] for j in range(m)) for i in range(len(X))]
    )
    mask = np.arange(len(X)) != qi
    adc_sorted = np.sort(adc[mask])
    cut = (adc_sorted[50] - adc_sorted[49]) / max(adc_sorted[50], 1e-30)
    assert cut > REL_MARGIN, f"PQ ADC shortlist cut margin {cut:.3e}"
    # exact re-rank cut inside the shortlist-50
    short = np.where(mask)[0][np.argsort(adc[mask])][:50]
    ex = np.sort(((X[short] - X[qi]) ** 2).sum(1))
    rcut = (ex[10] - ex[9]) / max(ex[10], 1e-30)
    assert rcut > REL_MARGIN, f"PQ re-rank cut margin {rcut:.3e}"


def test_ivfpq_shortlist_and_rerank_margins(emb):
    """q88: the ADC shortlist cut *within the 4 probed IVF lists* and the
    exact re-rank cut inside that shortlist (coarse assignment and probe
    margins are already covered by the IVF test — same 16 seed
    centroids)."""
    vec_ids, X = emb
    order = _seed_order(vec_ids)
    qi = vec_ids.tolist().index(0)
    C = X[order[:16]]
    lab = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    probed = set(np.argsort(((C - X[qi]) ** 2).sum(axis=1))[:4])

    train = order[: min(4096, len(X))]
    m, k, iters, dsub = 4, 16, 2, X.shape[1] // 4
    codes = np.empty((len(X), m), dtype=int)
    luts = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        T = S[train]
        B = T[:k].copy()
        for _ in range(iters):
            lb = ((T[:, None, :] - B[None, :, :]) ** 2).sum(-1).argmin(1)
            for c in range(k):
                msk = lb == c
                if msk.any():
                    B[c] = T[msk].mean(axis=0)
        codes[:, j] = ((S[:, None, :] - B[None, :, :]) ** 2).sum(-1).argmin(1)
        luts.append(((B - S[qi]) ** 2).sum(axis=1))
    cand = [
        i for i in range(len(X)) if lab[i] in probed and vec_ids[i] != 0
    ]
    adc = np.sort(
        np.array([sum(luts[j][codes[i, j]] for j in range(m)) for i in cand])
    )
    if len(adc) > 50:
        cut = (adc[50] - adc[49]) / max(adc[50], 1e-30)
        assert cut > REL_MARGIN, f"IVF-PQ shortlist cut margin {cut:.3e}"
    short = sorted(cand, key=lambda i: (
        sum(luts[j][codes[i, j]] for j in range(m)), vec_ids[i]))[:50]
    ex = np.sort(((X[short] - X[qi]) ** 2).sum(1))
    if len(ex) > 10:
        rcut = (ex[10] - ex[9]) / max(ex[10], 1e-30)
        assert rcut > REL_MARGIN, f"IVF-PQ re-rank cut margin {rcut:.3e}"


def test_q123_weighted_sample_boundary_margins():
    """A-ES membership only flips if the rank-10/11 key gap per language
    is inside cross-engine libm noise; probe the fixture's boundary gaps
    ≥ 1e-9 relative (five orders above ~1e-15 ln divergence)."""
    import duckdb

    con = duckdb.connect()
    gaps = con.execute(f"""
        WITH keyed AS (
            SELECT lang,
                   ln(CAST((('0x' || substr(md5('ws|' || doc_id), 1, 12))
                            ::BIGINT + 1) AS DOUBLE) / 281474976710656.0)
                     / CAST(n_chars AS DOUBLE) AS es
            FROM '{SF_DIR}/documents.parquet'
            WHERE n_chars IS NOT NULL AND n_chars > 0),
        ranked AS (
            SELECT lang, es,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY es DESC)
                     AS rk
            FROM keyed)
        SELECT lang,
               MAX(CASE WHEN rk = 10 THEN es END) AS k10,
               MAX(CASE WHEN rk = 11 THEN es END) AS k11
        FROM ranked GROUP BY lang
    """).fetchall()
    assert gaps
    for lang, k10, k11 in gaps:
        if k11 is None:  # group smaller than k: no boundary to flip
            continue
        rel = abs(k10 - k11) / max(abs(k10), abs(k11))
        assert rel > REL_MARGIN, f"{lang}: boundary gap {rel}"
