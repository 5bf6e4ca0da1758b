"""Approximate/exact nearest-neighbor search over an embedding column.

Baseline (exact): brute-force cosine top-k — the query matrix is
broadcast once (ray.put), each Arrow batch does one numpy matmul, and
only batch-local top-k candidate rows move to the final per-query
merge (global top-k ⊆ union of batch-local top-ks, so the merge is
exact). The scale path swaps the batch scorer for an LSH/IVF-bucketed
variant with the same output contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from spapy_ray.util import default_pool


def _stack_embeddings(col) -> np.ndarray:
    """list<float> column → [n, d] float64 matrix (flat values reshape)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float64)
    offsets = np.asarray(col.offsets)
    widths = np.diff(offsets)
    d = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == d).all():
        raise ValueError("ragged embedding column")
    return values.reshape(-1, d)


class CosineTopKScorer:
    """map_batches actor: emit batch-local top-k (qid, vec_id, sim)."""

    def __init__(self, queries_ref=None, queries: tuple | None = None, k: int = 5):
        if queries is None:
            import ray
            queries = ray.get(queries_ref)
        self.qids, qmat = queries
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        self.qn = qn
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _stack_embeddings(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy()
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = en @ self.qn.T                        # [B, Q]
        # mask self-matches
        self_m = vec_ids[:, None] == self.qids[None, :]
        sims[self_m] = -np.inf
        k = min(self.k, sims.shape[0])
        out_q, out_v, out_s = [], [], []
        for j in range(sims.shape[1]):
            idx = np.argpartition(-sims[:, j], k - 1)[:k] if k < len(sims) \
                else np.arange(len(sims))
            out_q.append(np.full(len(idx), self.qids[j], dtype=np.int64))
            out_v.append(vec_ids[idx])
            out_s.append(sims[idx, j])
        return pa.table({
            "qid": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })


def cosine_topk(ds, query_ids: np.ndarray, query_matrix: np.ndarray,
                k: int = 5, concurrency=None, batch_size: int = 4096):
    """Exact cosine top-k of each query over the dataset's embeddings.

    Returns a small Dataset (qid, vec_id, rank), rank 1..k ordered by
    (sim desc, vec_id) — the SQL-oracle tie-break.
    """
    import ray

    from spapy_ray.util import cached_state

    qref = ray.put((np.asarray(query_ids, dtype=np.int64),
                    np.asarray(query_matrix, dtype=np.float64)))
    box = (qref,)

    def _task(batch: pa.Table) -> pa.Table:
        scorer = cached_state(box, lambda q: CosineTopKScorer(queries=q, k=k))
        return scorer(batch)

    cands = ds.map_batches(_task, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.drop(columns=["sim"])
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cands.groupby("qid").map_groups(final, batch_format="pandas")
