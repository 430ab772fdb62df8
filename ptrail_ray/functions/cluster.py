"""Nearest-centroid assignment over an embedding column.

The semantic-sharding primitive a training-data pipeline uses to
partition a corpus by embedding region (cluster-balanced sampling,
per-topic dedup domains, curriculum buckets) — and the E-step of
distributed k-means. The reference has no embedding ops at all; the
nearest neighbor it does compute (`ptrail/features/helper_functions.py`
distance helpers) is scalar geo math.

Design for 100 TB: centroids are SMALL (k × d floats) and the data is
not — so the centroid matrix is broadcast once (`ray.put`, one object
fetched by every task, never re-shipped per batch) and assignment is a
stateless `map_batches` over the embedding table: one (batch × k)
similarity kernel + argmax per batch. No shuffle anywhere; output is
narrow (id, centroid_id, sim).

Kernel choice mirrors `functions/ann.py`: BLAS GEMM by default,
``deterministic=True`` swaps in the scalar ascending-k kernel that is
bit-equal to DuckDB ``list_cosine_similarity`` (shape-independent
arithmetic ⇒ run-stable argmax on knife-edge ties; see
`_duckdb_cosine_matrix`). Ties at equal similarity break to the LOWEST
centroid index on both paths (np.argmax takes the first maximum;
centroid rows are ordered by ascending centroid id).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ptrail_ray.functions.ann import _cosine_matrix_blas, _duckdb_cosine_matrix


def _vec_matrix(col) -> np.ndarray:
    """Arrow list<float> column → (n, d) float64 matrix, zero-copy on
    the flat values buffer when the layout allows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        n = len(col)
        if n == 0:
            return flat.reshape(0, 0)
        return flat.reshape(n, len(flat) // n)
    return np.stack([np.asarray(v, np.float64) for v in col.to_pylist()])


def _assign_batch(
    t: pa.Table,
    *,
    cent_ref,
    id_col: str,
    vec_col: str,
    deterministic: bool,
) -> pa.Table:
    cids, cmat = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
    kernel = _duckdb_cosine_matrix if deterministic else _cosine_matrix_blas
    m = _vec_matrix(t[vec_col])
    if m.shape[0] == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "centroid_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    sims = kernel(m, cmat)  # (n, k)
    best = np.argmax(sims, axis=1)  # first max ⇒ lowest centroid index
    return pa.table(
        {
            id_col: t[id_col].cast(pa.int64()),
            "centroid_id": pa.array(cids[best], pa.int64()),
            "sim": pa.array(sims[np.arange(len(best)), best], pa.float64()),
        }
    )


def assign_centroids(
    ds,
    centroid_ids: np.ndarray,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deterministic: bool = False,
    batch_size: int = 4096,
):
    """Assign every vector to its max-cosine centroid.

    ``centroid_ids``/``centroids``: (k,) int64 ids + (k, d) matrix,
    rows sorted by ascending id (the tie-break order). Returns a
    Dataset of (id_col, centroid_id, sim).
    """
    order = np.argsort(centroid_ids, kind="stable")
    cids = np.asarray(centroid_ids, np.int64)[order]
    cmat = np.asarray(centroids, np.float64)[order]
    cent_ref = ray.put((cids, cmat))
    return ds.map_batches(
        functools.partial(
            _assign_batch,
            cent_ref=cent_ref,
            id_col=id_col,
            vec_col=vec_col,
            deterministic=deterministic,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


QUANT_SCALE = 1_000_000_000.0  # 1e-9 component quantization for exact sums


def _quant_int64(x: np.ndarray, scale: float = QUANT_SCALE) -> np.ndarray:
    """Replica of DuckDB ``CAST(round(x*scale) AS BIGINT)`` (half away
    from zero) — quantize doubles to int64 so partial sums are EXACT
    and accumulation-order-independent (same trick as
    `stages/stats.GRANULAR_SCALE`; a float sum's order is
    nondeterministic on both engines). Headroom: |x|≲1 embeddings at
    1e9 scale leave int64 room for ~9e9 assigned rows per centroid."""
    y = x * scale
    f = np.floor(y)
    d = y - f
    r = np.where(d > 0.5, f + 1.0, f)
    r = np.where(d == 0.5, np.where(y >= 0, f + 1.0, f), r)
    return r.astype(np.int64)


def _mstep_partial(
    t: pa.Table,
    *,
    cent_ref,
    vec_col: str,
    deterministic: bool,
) -> pa.Table:
    """Per-batch Lloyd M-step partial: assign each vector, then emit
    EXACT int64 per-(centroid, dim) component sums + counts — k×d rows
    per batch regardless of batch size (the combiner pattern: rows
    shrink before any exchange)."""
    cids, cmat = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
    k, d = cmat.shape
    m = _vec_matrix(t[vec_col])
    empty = pa.table(
        {
            "centroid_id": pa.array([], pa.int64()),
            "dim": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
        }
    )
    if m.shape[0] == 0:
        return empty
    kernel = _duckdb_cosine_matrix if deterministic else _cosine_matrix_blas
    best = np.argmax(kernel(m, cmat), axis=1)
    sums = np.zeros((k, d), np.int64)
    np.add.at(sums, best, _quant_int64(m))
    counts = np.bincount(best, minlength=k).astype(np.int64)
    return pa.table(
        {
            "centroid_id": pa.array(np.repeat(cids, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k), pa.int64()),
            "n": pa.array(np.repeat(counts, d), pa.int64()),
            "s": pa.array(sums.reshape(-1), pa.int64()),
        }
    )


def kmeans_mstep(
    ds,
    centroid_ids: np.ndarray,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    deterministic: bool = False,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """One distributed Lloyd iteration M-step: mean embedding of the
    vectors assigned to each centroid, as long-format
    (centroid_id, dim, n_assigned, val) with empty centroids dropped.

    Scale path: batch partials are k×d int64 rows (exact sums — see
    `_quant_int64`), an intermediate vectorized combine collapses ~128
    partials per task, and the driver merges only the surviving k×d ×
    few rows. Integer addition is associative, so the result is
    bit-identical under any batch split or merge order — safe for the
    exact value-hash gate. Repeated application = full k-means fit;
    ``assign_centroids`` is the E-step.
    """
    order = np.argsort(centroid_ids, kind="stable")
    cids = np.asarray(centroid_ids, np.int64)[order]
    cmat = np.asarray(centroids, np.float64)[order]
    cent_ref = ray.put((cids, cmat))
    parts = ds.map_batches(
        functools.partial(
            _mstep_partial,
            cent_ref=cent_ref,
            vec_col=vec_col,
            deterministic=deterministic,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["centroid_id", "dim"], as_index=False, sort=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    combined = parts.map_batches(combine, batch_format="pyarrow", batch_size=1 << 20)
    g = combined.to_pandas().groupby(["centroid_id", "dim"], as_index=False, sort=False).sum()
    g = g[g["n"] > 0].reset_index(drop=True)
    # DuckDB expression order: (sum / 1e9) / count
    g["val"] = (g["s"].to_numpy(np.float64) / QUANT_SCALE) / g["n"].to_numpy(np.float64)
    return g.rename(columns={"n": "n_assigned"})[
        ["centroid_id", "dim", "n_assigned", "val"]
    ]


def kmeans_fit(
    ds,
    k: int,
    *,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deterministic: bool = False,
    batch_size: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Full distributed Lloyd fit: ``lowest_id_centroids`` init, then
    ``n_iter`` alternations of E-step (``assign_centroids`` math inside
    the M-step pass) and exact-sum M-step. Cosine assignment is
    magnitude-invariant, so raw means need no re-normalization — the
    objective (mean best-cosine) is the spherical k-means one. Empty
    centroids keep their previous position (standard Lloyd handling).
    Per iteration: one streaming pass over the data, k×d-bounded
    driver state — nothing else materializes.
    """
    cids, cmat = lowest_id_centroids(ds, k, id_col=id_col, vec_col=vec_col)
    for _ in range(n_iter):
        m = kmeans_mstep(
            ds, cids, cmat, vec_col=vec_col,
            deterministic=deterministic, batch_size=batch_size,
        )
        piv = m.pivot(index="centroid_id", columns="dim", values="val")
        pos = np.searchsorted(cids, piv.index.to_numpy(np.int64))
        cmat[pos] = piv.to_numpy(np.float64)
    return cids, cmat


def semantic_neardup_pairs(
    ds,
    centroid_ids: np.ndarray,
    centroids: np.ndarray,
    *,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deterministic: bool = False,
    num_buckets: int = 8,
    batch_size: int = 4096,
    max_shard: int = 30_000,
):
    """SemDeDup-style semantic near-dup pairs: shard by nearest
    centroid, exact cosine pairs WITHIN each shard only.

    This is the scale path for embedding near-dup (Abbas et al. 2023,
    SemDeDup): all-pairs is O(n²) globally but O(Σ nᵢ²) after
    sharding — pick k so shards fit a task. The documented trade-off
    is identical to the paper's: a near-dup pair straddling a centroid
    boundary is NOT emitted (the oracle replays the same semantics, so
    the gate checks the sharded definition exactly).

    One assignment pass attaches centroid ids to (id, vector) rows,
    ONE exchange co-locates each shard, and a per-shard vectorized
    kernel emits (a, b, centroid_id, sim) with a < b. ``deterministic``
    selects the DuckDB-bit-equal scalar kernel (oracle mode).
    """
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    order = np.argsort(centroid_ids, kind="stable")
    cids = np.asarray(centroid_ids, np.int64)[order]
    cmat = np.asarray(centroids, np.float64)[order]
    cent_ref = ray.put((cids, cmat))
    kernel = _duckdb_cosine_matrix if deterministic else _cosine_matrix_blas

    def attach(t: pa.Table) -> pa.Table:
        cs, cm = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        m = _vec_matrix(t[vec_col])
        if m.shape[0] == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "centroid_id": pa.array([], pa.int64()),
                    vec_col: t[vec_col],
                }
            )
        best = np.argmax(kernel(m, cm), axis=1)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "centroid_id": pa.array(cs[best], pa.int64()),
                vec_col: t[vec_col],
            }
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cid, g in df.groupby("centroid_id", sort=False):
            if len(g) > max_shard:
                raise ValueError(
                    f"shard for centroid {cid} has {len(g)} vectors > "
                    f"max_shard={max_shard}: the within-shard sims matrix "
                    "would not fit a task — raise k (more, smaller shards) "
                    "or max_shard explicitly; no silent truncation"
                )
            m = np.stack([np.asarray(v, np.float64) for v in g[vec_col]])
            ids_g = g[id_col].to_numpy(np.int64)
            o = np.argsort(ids_g, kind="stable")
            ids_g, m = ids_g[o], m[o]
            sims = kernel(m, m)
            ai, bi = np.triu_indices(len(ids_g), k=1)
            hit = sims[ai, bi] >= threshold
            out.append(
                pd.DataFrame(
                    {
                        "a": ids_g[ai[hit]],
                        "b": ids_g[bi[hit]],
                        "centroid_id": np.full(int(hit.sum()), cid, np.int64),
                        "sim": sims[ai[hit], bi[hit]],
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {
                    "a": np.array([], np.int64),
                    "b": np.array([], np.int64),
                    "centroid_id": np.array([], np.int64),
                    "sim": np.array([], np.float64),
                }
            )
        )

    attached = ds.map_batches(attach, batch_format="pyarrow", batch_size=batch_size)
    return grouped_agg_by_bucket(
        attached, "centroid_id", pairs, num_buckets=num_buckets, partial_batch=None
    )


def lowest_id_centroids(
    ds, k: int, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """The k lowest-id vectors as (ids, matrix) — a deterministic,
    SQL-replayable centroid pick for oracle-checked assignment.

    Distributed partial min-k: each batch keeps its k lowest ids
    (bounded), the driver merges k-sized partials — never the table.
    """

    def partial_mink(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, id_col)[[id_col, vec_col]]

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        partial_mink, batch_format="pandas", batch_size=8192
    ).to_pandas()
    top = parts.nsmallest(k, id_col)
    ids = top[id_col].to_numpy(np.int64)
    mat = np.stack([np.asarray(v, np.float64) for v in top[vec_col]])
    return ids, mat


def _silhouette_batch(
    t: pa.Table, *, cent_ref, id_col: str, vec_col: str, deterministic: bool
) -> pa.Table:
    cids, cmat = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
    kernel = _duckdb_cosine_matrix if deterministic else _cosine_matrix_blas
    m = _vec_matrix(t[vec_col])
    if m.shape[0] == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "centroid_id": pa.array([], pa.int64()),
                "silhouette": pa.array([], pa.float64()),
            }
        )
    sims = kernel(m, cmat)  # (n, k)
    # SQL row_number ORDER BY sim DESC, centroid_id ASC — stable argsort
    # of -sim keeps ascending centroid index among ties
    idx = np.argsort(-sims, axis=1, kind="stable")
    rows = np.arange(m.shape[0])
    sim1 = sims[rows, idx[:, 0]]
    sim2 = sims[rows, idx[:, 1]]
    a = 1.0 - sim1  # cosine distance to own centroid
    b = 1.0 - sim2  # to the runner-up
    den = np.maximum(a, b)
    with np.errstate(invalid="ignore", divide="ignore"):
        s = (b - a) / den
    return pa.table(
        {
            id_col: t[id_col].cast(pa.int64()),
            "centroid_id": pa.array(cids[idx[:, 0]], pa.int64()),
            "silhouette": pa.array(s, pa.float64(), mask=den == 0.0),
        }
    )


def silhouette_centroid(
    ds,
    centroid_ids: np.ndarray,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deterministic: bool = False,
    batch_size: int = 4096,
):
    """Simplified (centroid-based) silhouette per vector: with cosine
    distance a to the assigned (max-sim) centroid and b to the
    runner-up, s = (b − a)/max(a, b) ∈ [−1, 1] — the cluster-quality
    score of Hartigan-style simplified silhouette (no O(n²) pairwise
    pass; the full silhouette's within-cluster mean is replaced by the
    centroid distance, the standard large-scale approximation).
    Broadcast centroid matrix, stateless batches, no shuffle."""
    if len(centroid_ids) < 2:
        raise ValueError("silhouette_centroid needs at least 2 centroids")
    order = np.argsort(centroid_ids, kind="stable")
    cids = np.asarray(centroid_ids, np.int64)[order]
    cmat = np.asarray(centroids, np.float64)[order]
    cent_ref = ray.put((cids, cmat))
    return ds.map_batches(
        functools.partial(
            _silhouette_batch,
            cent_ref=cent_ref,
            id_col=id_col,
            vec_col=vec_col,
            deterministic=deterministic,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
