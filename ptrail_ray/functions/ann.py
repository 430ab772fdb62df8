"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one float64 GEMM
  against it and emits only its local top-k per query; a tiny final
  reduce merges the per-batch partials. No full-dataset materialization,
  no shuffle of the embeddings.
* ``lsh_topk`` — scale path: random-hyperplane LSH bucketing; each
  embedding lands in one bucket per table, queries probe matching
  buckets only. Approximate; recall measured in tests against the
  brute-force baseline.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _stack(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix."""
    if isinstance(col, pd.Series):
        return np.stack(col.to_numpy()).astype(np.float64)
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _PartialTopK:
    """map_batches stage: local top-k per query against one batch."""

    def __init__(self, q_ref, k: int):
        q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
        self.q = _normalize(q)  # (nq, d)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize(_stack(batch["embedding"]))
        sims = self.q @ emb.T  # (nq, nb)
        ids = batch["vec_id"].to_numpy()
        k = min(self.k, sims.shape[1])
        # top-k per query within this batch (argpartition = O(nb))
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = []
        for qi in range(sims.shape[0]):
            for j in part[qi]:
                rows.append((qi, int(ids[j]), float(sims[qi, j])))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "sim"])


def brute_force_topk(ds, queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k. Returns (query_id, vec_id, sim, rank), rank
    1..k, ties broken by vec_id ascending (deterministic)."""
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        _PartialTopK,
        fn_constructor_kwargs={"q_ref": q_ref, "k": k},
        batch_format="pandas", batch_size=None,
        concurrency=(1, 2),
    ).to_pandas()
    out = []
    for qi, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1)
        out.append(top)
    return pd.concat(out, ignore_index=True)


class _LshBucketer:
    """Random-hyperplane signature per embedding (one bucket per table)."""

    def __init__(self, planes_ref):
        self.planes = ray.get(planes_ref)  # (tables, bits, d)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize(_stack(batch["embedding"]))
        rows = []
        for t in range(self.planes.shape[0]):
            sig = (emb @ self.planes[t].T > 0).astype(np.uint64)
            code = (sig << np.arange(sig.shape[1], dtype=np.uint64)).sum(axis=1)
            for vid, c, e in zip(batch["vec_id"], code, batch["embedding"]):
                rows.append((t, int(c), int(vid), e))
        return pd.DataFrame(rows, columns=["table", "code", "vec_id", "embedding"])


def lsh_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    *,
    tables: int = 8,
    bits: int = 10,
    seed: int = 13,
) -> pd.DataFrame:
    """Approximate cosine top-k via multi-table hyperplane LSH.

    Embeddings are bucketed once (tables × one signature each); each
    query probes only its own buckets. Returns the same shape as
    ``brute_force_topk``; recall is tested against it.
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    d = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(tables, bits, d))
    planes_ref = ray.put(planes)

    bucketed = ds.map_batches(
        _LshBucketer,
        fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pandas", batch_size=None,
        concurrency=(1, 2),
    )

    # query signatures → the (table, code) cells to probe
    want = set()
    for t in range(tables):
        sig = (q @ planes[t].T > 0).astype(np.uint64)
        code = (sig << np.arange(bits, dtype=np.uint64)).sum(axis=1)
        for c in code:
            want.add((t, int(c)))
    want_df = sorted(want)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        key = list(zip(batch["table"], batch["code"]))
        mask = [kk in want for kk in key]
        return batch[mask]

    cand = bucketed.map_batches(probe, batch_format="pandas", batch_size=None).to_pandas()
    cand = cand.drop_duplicates(subset=["vec_id"])
    if len(cand) == 0:
        return pd.DataFrame(columns=["query_id", "vec_id", "sim", "rank"])
    emb = _normalize(_stack(cand["embedding"]))
    sims = q @ emb.T
    ids = cand["vec_id"].to_numpy()
    out = []
    for qi in range(q.shape[0]):
        order = heapq.nsmallest(
            min(k, sims.shape[1]),
            range(sims.shape[1]),
            key=lambda j: (-sims[qi, j], ids[j]),
        )
        for r, j in enumerate(order, 1):
            out.append((qi, int(ids[j]), float(sims[qi, j]), r))
    return pd.DataFrame(out, columns=["query_id", "vec_id", "sim", "rank"])


def cosine_pairs(
    ds, *, threshold: float = 0.35, max_id: int | None = None
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (exact).

    The candidate id-range (``vec_id < max_id`` when given) is broadcast
    as a normalized matrix; each batch computes one GEMM against it and
    emits only pairs with ``sim >= threshold`` and ``a < b`` — so the
    full n x n similarity matrix never materializes. At 100 TB the
    broadcast side becomes the LSH-bucketed index (``lsh_topk``) and this
    exact kernel runs per bucket; this function is the exact baseline the
    approximate path is tested against.
    """
    sub = ds
    if max_id is not None:
        sub = sub.filter(expr=f"vec_id < {max_id}")
    ref_pdf = sub.select_columns(["vec_id", "embedding"]).to_pandas()
    ref_ids = ref_pdf["vec_id"].to_numpy()
    ref_m = _normalize(_stack(ref_pdf["embedding"]))
    ref_obj = ray.put((ref_ids, ref_m))

    class PairFinder:
        def __init__(self):
            self.ids, self.m = ray.get(ref_obj)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if max_id is not None:
                batch = batch[batch["vec_id"] < max_id]
            if len(batch) == 0:
                return pd.DataFrame({"a": [], "b": [], "sim": []})
            emb = _normalize(_stack(batch["embedding"]))
            sims = emb @ self.m.T  # (nb, nref)
            bids = batch["vec_id"].to_numpy()
            rows_i, rows_j = np.nonzero(sims >= threshold)
            a = bids[rows_i]
            b = self.ids[rows_j]
            keep = a < b
            return pd.DataFrame(
                {"a": a[keep], "b": b[keep], "sim": sims[rows_i, rows_j][keep]}
            )

    return ds.map_batches(
        PairFinder, batch_format="pandas", batch_size=None, concurrency=(1, 4)
    ).to_pandas()
