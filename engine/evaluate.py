"""Retrieval-quality metrics (SURVEY.md §2.5 A9).

Re-implements the reference's ranking-metric harness
(/root/reference/compare_embeddings.py:95-371: P@1, Hit@k, MRR@k, nDCG@k,
ERR@k, Q-measure@k over graded qrels) for our engine's results tables.

qrels are graded like the reference (:453-457): exact match = 1.0, same-group
partial match = 0.5, else 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _dcg(gains: np.ndarray) -> float:
    if gains.size == 0:
        return 0.0
    discounts = 1.0 / np.log2(np.arange(2, gains.size + 2))
    return float((gains * discounts).sum())


def evaluate_ranking(
    results: pd.DataFrame,
    qrels: pd.DataFrame,
    k: int = 10,
    max_grade: float = 1.0,
) -> pd.DataFrame:
    """Per-query + mean metrics.

    results: (query_id, rank, doc_id) — rank 1-based, best first.
    qrels:   (query_id, doc_id, grade) — graded relevance, grade > 0.
    Returns one row per query plus a query_id = -1 mean row with columns
    (query_id, p_at_1, hit_at_k, mrr_at_k, ndcg_at_k, err_at_k).
    """
    rows = []
    rel_of = {
        (q, d): g
        for q, d, g in zip(qrels["query_id"], qrels["doc_id"], qrels["grade"])
    }
    for qid, grp in results.groupby("query_id", sort=True):
        ranked = grp.sort_values("rank")["doc_id"].tolist()[:k]
        gains = np.array([rel_of.get((qid, d), 0.0) for d in ranked])
        ideal = np.sort(
            np.array([g for (q, _), g in rel_of.items() if q == qid])
        )[::-1][:k]
        p1 = float(gains[0] > 0) if gains.size else 0.0
        hit = float((gains > 0).any())
        first = np.nonzero(gains > 0)[0]
        mrr = 1.0 / (first[0] + 1) if first.size else 0.0
        idcg = _dcg(ideal)
        ndcg = _dcg(gains) / idcg if idcg > 0 else 0.0
        # ERR (Chapelle et al., CIKM 2009): cascade with stop prob from grade
        stop = (np.power(2.0, gains) - 1.0) / (2.0**max_grade)
        err, p_continue = 0.0, 1.0
        for i, s in enumerate(stop, start=1):
            err += p_continue * s / i
            p_continue *= 1.0 - s
        # Q-measure@k (Sakai 2004, beta = 1; the reference's blended-ratio
        # metric, compare_embeddings.py:300-371): at each relevant rank r,
        # blend count-precision with graded cumulative gain against the
        # ideal ranking, averaged over ALL relevant docs (R), so missing a
        # relevant doc below k is penalized
        all_grades = np.sort(
            np.array([g for (q, _), g in rel_of.items() if q == qid])
        )[::-1]
        R = int((all_grades > 0).sum())
        if R:
            cig = np.cumsum(
                np.pad(all_grades[:k], (0, max(0, k - all_grades.size)))
            )
            cg = np.cumsum(gains)
            crel = np.cumsum(gains > 0)
            ranks = np.arange(1, gains.size + 1)
            bq = (crel + cg) / (ranks + cig[: gains.size])
            qm = float(bq[gains > 0].sum() / R)
        else:
            qm = 0.0
        rows.append((qid, p1, hit, mrr, ndcg, err, qm))
    df = pd.DataFrame(
        rows,
        columns=[
            "query_id", "p_at_1", "hit_at_k", "mrr_at_k", "ndcg_at_k",
            "err_at_k", "q_at_k",
        ],
    )
    mean = df.drop(columns=["query_id"]).mean()
    df.loc[len(df)] = [-1, *mean.tolist()]
    return df.round(6)


def qrels_from_expected(expected_topk: pd.DataFrame, top_n: int = 3) -> pd.DataFrame:
    """Build graded qrels from a golden expected_topk table: the top result
    per query gets grade 1.0, the next (top_n - 1) get 0.5 (the reference's
    exact/partial grading shape, compare_embeddings.py:453-457)."""
    rows = []
    for qid, grp in expected_topk.groupby("query_id", sort=True):
        ranked = grp.sort_values("rank")["doc_id"].tolist()
        for i, d in enumerate(ranked[:top_n]):
            rows.append((qid, d, 1.0 if i == 0 else 0.5))
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "grade"])
