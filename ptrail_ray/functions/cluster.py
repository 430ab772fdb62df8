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
