"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one float64 GEMM
  against it and emits only its local top-k per query (keeping ALL
  candidates tied at the k-th similarity so the deterministic
  (sim DESC, vec_id ASC) tie-break is applied before truncation); a
  tiny final reduce merges the per-batch partials. No full-dataset
  materialization, no shuffle of the embeddings.
* ``lsh_topk`` — scale path: random-hyperplane LSH signatures; a
  narrow vectorized filter keeps only rows whose signature matches a
  query bucket in ANY table, then the same partial-top-k pool runs on
  the surviving candidates. Approximate; recall measured in tests
  against the brute-force baseline. No explode, no driver-side
  candidate collection.
* ``cosine_pairs`` — exact all-pairs cosine ≥ threshold via
  block-pair GEMM: the normalized dataset is pinned in the object
  store (``to_arrow_refs``), and a Dataset of (i, j) block-index pairs
  fans out one GEMM task per block pair (i ≤ j). The driver holds only
  object refs; each task fetches exactly two blocks. O(n²/B²) tasks —
  the inherent cost of *exact* all-pairs — scheduled and backpressured
  by Ray Data. Recast of the reference's all-pairs vs small-side scan
  (``ptrail/features/helper_functions.py:487-532``) without its
  driver-side frame.
"""

from __future__ import annotations

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


def _topk_rows(
    sims: np.ndarray, ids: np.ndarray, k: int
) -> tuple[list[tuple[int, int, float]], None]:
    """Per-query local top-k with tie-exact truncation: keep every
    candidate whose similarity ties the k-th value, then order by
    (-sim, vec_id) and cut at k — so the global merge's deterministic
    tie-break can never lose a smaller-id tied candidate to an
    arbitrary argpartition split (ADVICE r01)."""
    nq, nb = sims.shape
    k_eff = min(k, nb)
    rows: list[tuple[int, int, float]] = []
    if k_eff == nb:
        thr = np.full(nq, -np.inf)
    else:
        thr = -np.partition(-sims, k_eff - 1, axis=1)[:, k_eff - 1]
    for qi in range(nq):
        cand = np.flatnonzero(sims[qi] >= thr[qi])
        order = cand[np.lexsort((ids[cand], -sims[qi, cand]))][:k_eff]
        for j in order:
            rows.append((qi, int(ids[j]), float(sims[qi, j])))
    return rows, None


def _partial_topk_batch(batch: pd.DataFrame, q_ref, k: int) -> pd.DataFrame:
    """map_batches stage: local top-k per query against one batch.

    A stateless TASK, not an actor pool: the only per-call state is one
    plasma read of the broadcast query matrix (node-local after the
    first task) and a trivial normalize — while a pinned actor pool
    pays its spawn cost up front, which dominated small inputs
    (q_ann_cosine: 16 actors for 2 batches). Tasks scale elastically
    with the input at 100 TB as well."""
    if len(batch) == 0:
        return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
    q = _normalize(ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref)
    emb = _normalize(_stack(batch["embedding"]))
    sims = q @ emb.T  # (nq, nb)
    ids = batch["vec_id"].to_numpy()
    rows, _ = _topk_rows(sims, ids, k)
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "sim"])


def _merge_partials(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Tiny driver-side reduce of the bounded per-batch partials."""
    if len(partials) == 0:
        return pd.DataFrame(columns=["query_id", "vec_id", "sim", "rank"])
    out = []
    for qi, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1)
        out.append(top)
    return pd.concat(out, ignore_index=True)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k. Returns (query_id, vec_id, sim, rank), rank
    1..k, ties broken by vec_id ascending (deterministic)."""
    import functools

    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        functools.partial(_partial_topk_batch, q_ref=q_ref, k=k),
        batch_format="pandas", batch_size=4096,
    ).to_pandas()
    return _merge_partials(partials, k)


def _lsh_probe_filter(
    batch: pd.DataFrame, planes_ref, want_codes: list[np.ndarray]
) -> pd.DataFrame:
    """Narrow vectorized candidate filter: keep rows whose hyperplane
    signature matches a query bucket in ANY of the LSH tables. One
    (nb × bits) GEMM per table per batch, membership via np.isin
    against the wanted codes — no per-row Python, no explode, no
    embedding payload duplication. Runs as an elastic task pool
    (stateless; the planes ref resolves from local plasma per call)."""
    if len(batch) == 0:
        return batch
    planes = ray.get(planes_ref)  # (tables, bits, d)
    emb = _normalize(_stack(batch["embedding"]))
    keep = np.zeros(len(batch), dtype=bool)
    weights = np.uint64(1) << np.arange(planes.shape[1], dtype=np.uint64)
    for t in range(planes.shape[0]):
        sig = (emb @ planes[t].T > 0).astype(np.uint64)
        code = (sig * weights).sum(axis=1)
        keep |= np.isin(code, want_codes[t])
        if keep.all():
            break
    return batch[keep]


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

    The probe runs as a distributed filter (signatures recomputed per
    batch — cheaper than shuffling an exploded index) followed by the
    same partial-top-k pool as the exact path; only bounded per-batch
    top-k partials ever reach the driver. Returns the same shape as
    ``brute_force_topk``; recall is tested against it.
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    d = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(tables, bits, d))
    planes_ref = ray.put(planes)

    # query signatures → the codes to probe, per table
    want_codes = []
    for t in range(tables):
        sig = (q @ planes[t].T > 0).astype(np.uint64)
        code = (sig * (np.uint64(1) << np.arange(bits, dtype=np.uint64))).sum(axis=1)
        want_codes.append(np.unique(code))

    import functools

    q_ref = ray.put(q)
    partials = (
        ds.map_batches(
            functools.partial(
                _lsh_probe_filter, planes_ref=planes_ref, want_codes=want_codes
            ),
            batch_format="pandas", batch_size=4096,
        )
        .map_batches(
            functools.partial(_partial_topk_batch, q_ref=q_ref, k=k),
            batch_format="pandas", batch_size=4096,
        )
        .to_pandas()
    )
    return _merge_partials(partials, k)


def _duckdb_cosine_matrix(mi: np.ndarray, mj: np.ndarray) -> np.ndarray:
    """(n,d) × (m,d) → (n,m) cosine sims BIT-EQUAL to DuckDB
    ``list_cosine_similarity``: dot and norms accumulate in ascending-k
    order (scalar loop order — NOT numpy's pairwise summation, NOT a
    BLAS GEMM whose tiling varies with matrix shape), result
    ``dot / (sqrt(na) * sqrt(nb))``. Shape-independent arithmetic is
    what makes threshold membership DETERMINISTIC across Ray's runtime
    block boundaries — a BLAS path flaked a pair sitting within 1 ulp
    of the 0.35 threshold (270 vs 271 rows, run-dependent)."""
    n, d = mi.shape
    m = mj.shape[0]
    dot = np.zeros((n, m))
    na = np.zeros(n)
    nb = np.zeros(m)
    for k in range(d):
        dot += mi[:, k][:, None] * mj[:, k][None, :]
        na += mi[:, k] * mi[:, k]
        nb += mj[:, k] * mj[:, k]
    with np.errstate(invalid="ignore", divide="ignore"):
        return dot / (np.sqrt(na)[:, None] * np.sqrt(nb)[None, :])


def _cosine_matrix_blas(mi: np.ndarray, mj: np.ndarray) -> np.ndarray:
    """(n,d) × (m,d) → (n,m) cosine sims via one BLAS GEMM + einsum
    norms — the production kernel (~d× less memory traffic than the
    scalar-order replica below). BLAS tiling varies with matrix shape,
    so a similarity within 1 ulp of the threshold can flip membership
    across runs with different block layouts; callers that need
    run-stable output at a knife-edge threshold (the DuckDB oracle
    gate) pass ``deterministic=True`` to get the scalar-order kernel."""
    dot = mi @ mj.T
    na = np.sqrt(np.einsum("ij,ij->i", mi, mi))
    nb = np.sqrt(np.einsum("ij,ij->i", mj, mj))
    with np.errstate(invalid="ignore", divide="ignore"):
        return dot / (na[:, None] * nb[None, :])


def cosine_pairs(
    ds,
    *,
    threshold: float = 0.35,
    max_id: int | None = None,
    deterministic: bool = False,
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (exact).

    Block-pair GEMM: the (filtered) dataset is pinned in the object
    store as Arrow blocks; a Dataset of (i, j) block-index pairs with
    i ≤ j fans out one GEMM per block pair, each task fetching exactly
    two blocks by ref. Every unordered vector pair is examined in
    exactly one task (cross pairs once per (i, j), within-block pairs
    under a < b), so the emitted pair set is exact and duplicate-free
    without any driver-side matrix.

    ``deterministic=False`` (default, production): BLAS GEMM kernel.
    ``deterministic=True`` (oracle mode): scalar ascending-k kernel
    bit-equal to DuckDB ``list_cosine_similarity`` — shape-independent
    arithmetic, so threshold membership never varies with Ray's runtime
    block boundaries."""
    sub = ds
    if max_id is not None:
        sub = sub.filter(expr=f"vec_id < {max_id}")
    mat = sub.select_columns(["vec_id", "embedding"]).materialize()
    refs = mat.to_arrow_refs()
    nb = len(refs)
    if nb == 0:
        return pd.DataFrame({"a": [], "b": [], "sim": []})
    kernel = _duckdb_cosine_matrix if deterministic else _cosine_matrix_blas

    def gemm_block_pair(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for i, j in zip(batch["i"], batch["j"]):
            ti: pa.Table = ray.get(refs[int(i)])
            tj = ti if i == j else ray.get(refs[int(j)])
            if ti.num_rows == 0 or tj.num_rows == 0:
                continue
            ids_i = ti["vec_id"].to_numpy(zero_copy_only=False)
            ids_j = tj["vec_id"].to_numpy(zero_copy_only=False)
            mi = _stack(ti["embedding"])
            mj = mi if i == j else _stack(tj["embedding"])
            sims = kernel(mi, mj)
            ri, rj = np.nonzero(sims >= threshold)
            a, b = ids_i[ri], ids_j[rj]
            if i == j:
                # within-block: every unordered pair appears twice
                # (plus the diagonal) — a < b dedups it
                keep = a < b
                a, b, sv = a[keep], b[keep], sims[ri, rj][keep]
            else:
                # cross-block: every unordered pair appears EXACTLY
                # once, but object-store block order does NOT follow id
                # order (observed: block 9 holding ids 96-127 after
                # block 8's 314-344), so normalize by swapping — an
                # a < b FILTER here silently drops pairs whose smaller
                # id lives in the later block
                sv = sims[ri, rj]
                a, b = np.minimum(a, b), np.maximum(a, b)
            outs.append(pd.DataFrame({"a": a, "b": b, "sim": sv}))
        if not outs:
            return pd.DataFrame({"a": [], "b": [], "sim": []})
        return pd.concat(outs, ignore_index=True)

    ij = ray.data.from_items(
        [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]
    )
    out = ij.map_batches(
        gemm_block_pair, batch_format="pandas", batch_size=1
    ).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": [], "b": [], "sim": []})
    return out


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate top-k — the second scale path
# ---------------------------------------------------------------------------


def _kmeans(x: np.ndarray, n_lists: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic Lloyd k-means on the (bounded) training sample.
    Seeded random init; empty clusters re-seeded from the farthest
    points, so the centroid count is always exactly n_lists."""
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    if len(cent) < n_lists:  # tiny dataset: duplicate rows to fill
        cent = np.resize(cent, (n_lists, x.shape[1]))
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                cent[c] = v / n if n > 0 else cent[c]
            else:
                cent[c] = x[np.argmin(np.max(sims, axis=1))]
    return cent


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    *,
    n_lists: int = 16,
    nprobe: int = 4,
    train_size: int = 512,
    iters: int = 10,
    seed: int = 5,
) -> pd.DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index — the
    classic coarse-quantizer scale path alongside ``lsh_topk``.

    1. TRAIN: a bounded deterministic sample (every n/train_size-th
       vec_id) is collected once and clustered with seeded Lloyd
       k-means — the only driver-side data, capped at ``train_size``
       rows regardless of dataset size.
    2. PROBE: each query selects its ``nprobe`` nearest centroids; a
       narrow vectorized filter keeps vectors whose nearest centroid is
       probed by ANY query (one GEMM vs the broadcast centroid matrix
       per batch — no index materialization, no shuffle).
    3. The same partial-top-k pool + tiny merge as the exact path.

    Returns the ``brute_force_topk`` shape; recall is self-checked by
    ``q_ann_ivf``.
    """
    import functools

    n = ds.count()
    stride = max(1, n // train_size)

    def take_stride(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["vec_id"].to_numpy() % stride == 0]

    sample = (
        ds.map_batches(take_stride, batch_format="pandas", batch_size=4096)
        .limit(train_size)
        .to_pandas()
    )
    x = _normalize(_stack(sample["embedding"]))
    cent = _kmeans(x, n_lists, iters, seed)
    cent_ref = ray.put(cent)

    q = _normalize(np.asarray(queries, dtype=np.float64))
    probed = np.unique(
        np.argsort(-(q @ cent.T), axis=1, kind="stable")[:, :nprobe].ravel()
    )

    def probe_filter(batch: pd.DataFrame, cent_ref=cent_ref, probed=probed):
        if len(batch) == 0:
            return batch
        c = ray.get(cent_ref)
        emb = _normalize(_stack(batch["embedding"]))
        nearest = np.argmax(emb @ c.T, axis=1)
        return batch[np.isin(nearest, probed)]

    q_ref = ray.put(q)
    partials = (
        ds.map_batches(probe_filter, batch_format="pandas", batch_size=4096)
        .map_batches(
            functools.partial(_partial_topk_batch, q_ref=q_ref, k=k),
            batch_format="pandas", batch_size=4096,
        )
        .to_pandas()
    )
    return _merge_partials(partials, k)


# ---------------------------------------------------------------------------
# Serial ground-truth replicas (VERDICT r04 #7)
#
# Single-process numpy replays of the SAME documented contracts the
# distributed paths implement (identical plane/centroid seeding,
# identical candidate rules, identical (-sim, vec_id) tie-break). They
# exist so the approximate-ANN queries get a persisted parquet anchor
# the driver's hash gate can compare against — the distributed
# filter/partial-topk/merge machinery is what the comparison exercises;
# the replicas never touch Ray.
# ---------------------------------------------------------------------------


def topk_serial(emb: np.ndarray, ids: np.ndarray, q: np.ndarray, k: int) -> pd.DataFrame:
    """Exact top-k over pre-normalized rows: (sim DESC, vec_id ASC).

    ``q`` is re-normalized here to mirror ``_partial_topk_batch``
    exactly (the distributed path normalizes the already-unit query
    matrix a second time inside the stage; the ~1-ulp component shift
    must match or a near-tie could order differently between the
    engine and this ground truth — code-review r05)."""
    rows = []
    sims = _normalize(q) @ emb.T
    for qi in range(q.shape[0]):
        order = np.lexsort((ids, -sims[qi]))[: min(k, len(ids))]
        for r, j in enumerate(order, 1):
            rows.append((qi, int(ids[j]), float(sims[qi, j]), r))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "sim", "rank"])


def lsh_candidates_serial(
    emb: np.ndarray, q: np.ndarray, *, tables: int, bits: int, seed: int
) -> np.ndarray:
    """Boolean mask of rows matching any query bucket in any table —
    the serial replay of ``_lsh_probe_filter`` (same rng stream, same
    uint64 code packing)."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(tables, bits, q.shape[1]))
    weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)
    keep = np.zeros(len(emb), dtype=bool)
    for t in range(tables):
        code_e = ((emb @ planes[t].T > 0).astype(np.uint64) * weights).sum(axis=1)
        code_q = np.unique(
            ((q @ planes[t].T > 0).astype(np.uint64) * weights).sum(axis=1)
        )
        keep |= np.isin(code_e, code_q)
    return keep


def lsh_topk_serial(
    emb: np.ndarray,
    ids: np.ndarray,
    q: np.ndarray,
    k: int,
    *,
    tables: int,
    bits: int,
    seed: int = 13,
) -> pd.DataFrame:
    keep = lsh_candidates_serial(emb, q, tables=tables, bits=bits, seed=seed)
    return topk_serial(emb[keep], ids[keep], q, k)


def ivf_topk_serial(
    emb: np.ndarray,
    ids: np.ndarray,
    q: np.ndarray,
    k: int,
    *,
    n_lists: int = 16,
    nprobe: int = 4,
    train_size: int = 512,
    iters: int = 10,
    seed: int = 5,
) -> pd.DataFrame:
    """Serial replay of ``ivf_topk``: same stride sample (first
    ``train_size`` stride-selected rows in dataset order), same seeded
    Lloyd centroids, same any-query probe rule."""
    n = len(ids)
    stride = max(1, n // train_size)
    m = np.flatnonzero(ids % stride == 0)[:train_size]
    cent = _kmeans(emb[m], n_lists, iters, seed)
    probed = np.unique(
        np.argsort(-(q @ cent.T), axis=1, kind="stable")[:, :nprobe].ravel()
    )
    nearest = np.argmax(emb @ cent.T, axis=1)
    keep = np.isin(nearest, probed)
    return topk_serial(emb[keep], ids[keep], q, k)
