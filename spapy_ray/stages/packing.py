"""Sequence packing — the concat-and-chunk step of an LLM training
pipeline: lay every document's tokens end-to-end in ``id_col`` order
and cut the stream into fixed-size chunks ("sequences"). The classic
question it answers per chunk: how many documents feed it, how many
begin in it (attention-mask resets), and a position-weighted checksum
that pins the exact layout byte-for-byte against a SQL twin.

The hard part at 10^12 documents is the ORDERED GLOBAL PREFIX SUM of
token counts (chunk assignment is a pure function of each document's
exclusive running total). Distributed shape — no sort, no driver
materialization of the corpus:

1. one pass over the narrow (id, weight) projection tags each row
   with a fixed-width id window ``w = id // window`` (ONE shuffle
   key), and the per-window weight sums fold to the driver —
   O(#windows) rows, the only driver state;
2. the driver's exclusive cumsum over window sums gives each window
   its global starting offset (broadcast once via ray.put);
3. each window independently sorts its own ids (bounded, window-
   local), restores the running total from its offset, and emits
   per-(window, chunk) partials — a document spanning k chunks emits
   k rows via a vectorized peel loop (k <= weight/chunk + 1 rounds,
   each round whole-array numpy);
4. a final small groupby(chunk_id) sums partials across window
   boundaries (only boundary chunks have >1 partial).

The per-id weights never leave their window; the exchange volume is
#windows + #chunks rows. The reference has nothing comparable (it is
not a corpus engine); the op follows the public concat-and-chunk
convention (GPT-2/T5-style packing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_chunks(ds, *, id_col: str, weight_col: str, chunk_size: int,
                window: int = 1 << 20):
    """Pack rows (id, weight) into fixed-``chunk_size`` bins in id
    order. Returns Dataset(chunk_id, n_tokens, n_docs, n_starts, ck)
    where ck = sum(id * tokens_contributed) — all int64 exact.

    ``id_col`` values must be unique non-negative ints; ``weight_col``
    positive ints.
    """
    import ray
    from ray.data.aggregate import Sum

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        wt = t.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"id": pa.array(ids), "wt": pa.array(wt),
                         "w": pa.array(ids // window)})

    narrow = ds.map_batches(tag, batch_format="pyarrow").materialize()

    sums = narrow.groupby("w").aggregate(Sum("wt", alias_name="s")) \
        .to_pandas().sort_values("w")
    ws = sums["w"].to_numpy().astype(np.int64)
    tot = sums["s"].to_numpy().astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(tot)[:-1]])
    offsets_ref = ray.put((ws, offs))

    C = chunk_size

    def per_window(g: pd.DataFrame) -> pd.DataFrame:
        w_sorted, w_offs = ray.get(offsets_ref)
        w0 = int(g["w"].iloc[0])
        base = int(w_offs[np.searchsorted(w_sorted, w0)])
        order = np.argsort(g["id"].to_numpy(), kind="stable")
        ids = g["id"].to_numpy()[order].astype(np.int64)
        wt = g["wt"].to_numpy()[order].astype(np.int64)
        cur = base + np.cumsum(wt) - wt     # exclusive running total
        remaining = wt.copy()
        ks, takes, starts, docids = [], [], [], []
        first = True
        while True:
            m = remaining > 0
            if not m.any():
                break
            cm, rm = cur[m], remaining[m]
            take = np.minimum(rm, C - (cm % C))
            ks.append(cm // C)
            takes.append(take)
            starts.append(np.ones(len(take), np.int64) if first
                          else np.zeros(len(take), np.int64))
            docids.append(ids[m])
            cur[m] = cm + take
            remaining[m] = rm - take
            first = False
        k = np.concatenate(ks)
        tk = np.concatenate(takes)
        st = np.concatenate(starts)
        di = np.concatenate(docids)
        f = pd.DataFrame({"chunk_id": k, "tk": tk, "st": st,
                          "ckp": di * tk})
        p = f.groupby("chunk_id", sort=False).agg(
            n_tokens=("tk", "sum"), n_docs=("tk", "size"),
            n_starts=("st", "sum"), ck=("ckp", "sum")).reset_index()
        return p.astype(np.int64)

    parts = narrow.groupby("w").map_groups(per_window,
                                           batch_format="pandas")
    out = parts.groupby("chunk_id").aggregate(
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_starts", alias_name="n_starts"),
        Sum("ck", alias_name="ck"))

    def typed(t: pa.Table) -> pa.Table:
        return pa.table({c: pa.compute.cast(t.column(c), pa.int64())
                         for c in t.column_names})

    return out.map_batches(typed, batch_format="pyarrow")
