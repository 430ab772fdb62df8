"""Distributed dense linear algebra over an embedding column.

The PCA / whitening building block a training-data pipeline needs for
embedding-space analysis (dimensionality reduction before clustering,
covariance-based outlier gates, feature decorrelation). The reference
has no embedding ops at all — its numeric aggregates are per-trajectory
scalar stats (`ptrail/features/kinematic_features.py`); this module is
a beyond-reference operator in the same spirit as `functions/cluster.py`.

Design for 100 TB: the covariance of a (N, d) embedding table factors
into per-batch partial sums — Σ xᵢxⱼ over the upper triangle plus the
per-dim sums and a row count. Each batch emits a FIXED d(d+1)/2-row
partial regardless of batch size (the combiner pattern — rows shrink
before anything moves), an intermediate vectorized combine collapses
~hundreds of partials per task, and the driver merges only the
surviving d(d+1)/2 × few rows. Nothing shuffles; the data is touched
in one streaming pass.

Exactness: per-row products are quantized to int64 (DuckDB
``CAST(round(x*1e9) AS BIGINT)`` replica — `_quant_int64`), so partial
sums are integer adds: associative, order-independent, bit-identical
under any batch split — safe for the driver's exact value-hash gate.
Headroom: |x|≲1 ⇒ |x·y|·1e9 ≤ 1e9 per row ⇒ ~9.2e9 rows before int64
overflow; the merge asserts loudly instead of wrapping.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

from ptrail_ray.functions.cluster import QUANT_SCALE, _quant_int64, _vec_matrix

# Rows a single int64 partial can absorb before |Σ round(x·y·1e9)| could
# exceed int64 for |x|,|y| ≤ 1. Enforced at merge time (see
# embedding_covariance) — a silent wraparound would poison every pair.
_MAX_EXACT_ROWS = int((1 << 62) / QUANT_SCALE)


def _cov_partial(t: pa.Table, *, vec_col: str, row_chunk: int) -> pa.Table:
    """Per-batch covariance partial: EXACT int64 sums of quantized
    pairwise products over the upper triangle, plus per-dim sums and
    the row count — d(d+1)/2 rows per batch regardless of batch size."""
    m = _vec_matrix(t[vec_col])
    n, d = m.shape if m.ndim == 2 else (0, 0)
    if n == 0:
        return pa.table(
            {
                "dim_i": pa.array([], pa.int64()),
                "dim_j": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "spq": pa.array([], pa.int64()),
                "si": pa.array([], pa.int64()),
                "sj": pa.array([], pa.int64()),
            }
        )
    iu, ju = np.triu_indices(d)
    spq = np.zeros(len(iu), np.int64)
    # Chunk the (rows × pairs) product block so peak scratch stays
    # ~row_chunk · d²/2 · 8 B (≈8.5 MB at d=64, row_chunk=512) even for
    # large batch_size.
    for lo in range(0, n, row_chunk):
        blk = m[lo : lo + row_chunk]
        spq += _quant_int64(blk[:, iu] * blk[:, ju]).sum(axis=0)
    sdim = _quant_int64(m).sum(axis=0)
    return pa.table(
        {
            "dim_i": pa.array(iu.astype(np.int64), pa.int64()),
            "dim_j": pa.array(ju.astype(np.int64), pa.int64()),
            "n": pa.array(np.full(len(iu), n, np.int64), pa.int64()),
            "spq": pa.array(spq, pa.int64()),
            "si": pa.array(sdim[iu], pa.int64()),
            "sj": pa.array(sdim[ju], pa.int64()),
        }
    )


def embedding_covariance(
    ds,
    *,
    vec_col: str = "embedding",
    batch_size: int = 4096,
    row_chunk: int = 512,
) -> pd.DataFrame:
    """Population covariance matrix of an embedding column, upper
    triangle in long format: (dim_i, dim_j, n, cov) with
    cov = E[xᵢxⱼ] − E[xᵢ]E[xⱼ].

    One streaming pass, no shuffle: fixed-size int64 partials per batch
    (`_cov_partial`), a vectorized intermediate combine, and a
    d(d+1)/2-bounded driver merge. Float division happens ONCE at the
    end, in DuckDB expression order ``(s/1e9)/n`` — the result is
    bit-equal to the SQL replica in `entry_queries.q_embed_covariance`.
    """
    parts = ds.map_batches(
        functools.partial(_cov_partial, vec_col=vec_col, row_chunk=row_chunk),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["dim_i", "dim_j"], as_index=False, sort=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    g = (
        parts.map_batches(combine, batch_format="pyarrow", batch_size=1 << 20)
        .to_pandas()
        .groupby(["dim_i", "dim_j"], as_index=False, sort=False)
        .sum()
    )
    if len(g) and int(g["n"].max()) > _MAX_EXACT_ROWS:
        raise ValueError(
            f"embedding_covariance: {int(g['n'].max())} rows exceeds the "
            f"exact-int64 budget ({_MAX_EXACT_ROWS}); shard the input and "
            "merge covariances via the pooled formula instead"
        )
    n = g["n"].to_numpy(np.float64)
    epq = (g["spq"].to_numpy(np.float64) / QUANT_SCALE) / n
    ei = (g["si"].to_numpy(np.float64) / QUANT_SCALE) / n
    ej = (g["sj"].to_numpy(np.float64) / QUANT_SCALE) / n
    out = g[["dim_i", "dim_j", "n"]].copy()
    out["cov"] = epq - ei * ej
    return out.sort_values(["dim_i", "dim_j"], kind="stable").reset_index(drop=True)


def covariance_matrix(cov_long: pd.DataFrame) -> np.ndarray:
    """Long-format upper triangle (`embedding_covariance`) → dense
    symmetric (d, d) float64 matrix."""
    d = int(cov_long["dim_j"].max()) + 1 if len(cov_long) else 0
    m = np.zeros((d, d))
    i = cov_long["dim_i"].to_numpy(np.int64)
    j = cov_long["dim_j"].to_numpy(np.int64)
    c = cov_long["cov"].to_numpy(np.float64)
    m[i, j] = c
    m[j, i] = c
    return m


def power_iteration(
    cov: np.ndarray, *, n_iter: int = 6000, tol: float = 1e-15
) -> tuple[float, np.ndarray]:
    """Top eigenpair of a small symmetric PSD matrix (driver-side —
    cov is d×d, never data-sized). Deterministic start (uniform
    vector), sign fixed so the largest-|component| coordinate is
    positive. Raises loudly if the residual hasn't converged — a
    near-degenerate top eigengap should be visible, not silent.

    ``n_iter`` default sized for slim eigengaps: convergence is
    |λ₂/λ₁|^k, and the synthetic embeddings' gap ratio is ~0.987
    (needs ~1.5k iterations for 1e-8); a d×d matvec is microseconds,
    so the budget is generous rather than clever."""
    d = cov.shape[0]
    v = np.full(d, 1.0 / np.sqrt(d))
    lam = 0.0
    for _ in range(n_iter):
        w = cov @ v
        nrm = np.linalg.norm(w)
        if nrm == 0.0:
            return 0.0, v
        v_new = w / nrm
        lam = float(v_new @ (cov @ v_new))
        if np.linalg.norm(v_new - v) < tol or np.linalg.norm(v_new + v) < tol:
            v = v_new
            break
        v = v_new
    resid = float(np.max(np.abs(cov @ v - lam * v)))
    if resid > 1e-6 * max(abs(lam), 1.0):
        raise ValueError(
            f"power_iteration: residual {resid:.3e} after {n_iter} iterations "
            f"(eigengap too small?) — raise n_iter or use full eigh"
        )
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    return lam, v


def pca_project(ds, v: np.ndarray, *, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Project every embedding onto a fixed direction (the top
    principal component): one stateless map_batches GEMV, the direction
    broadcast in the task closure (d floats — never re-shipped per
    row). Returns (id_col, pc1)."""
    v64 = np.asarray(v, np.float64)

    def fn(t: pa.Table) -> pa.Table:
        m = _vec_matrix(t[vec_col])
        proj = m @ v64 if m.size else np.empty(0)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "pc1": pa.array(proj, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def linear_score(
    ds,
    weights,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
):
    """Broadcast linear-model inference over an embedding column — the
    quality-probe / classifier-gate shape (score = w·x, label = score
    > 0). The model ships to each task once by closure capture (it is a
    d-float vector; a real fastText/probe weight matrix would ride
    ``ray.put`` exactly like ``assign_centroids``' centroids) and each
    batch is ONE vectorized GEMV — no shuffle, no per-row Python.

    Exactness for the hash gate: per-term products are int64-quantized
    (`_quant_int64`, the DuckDB round-replica) and summed per row, so
    the score is an exact integer ÷ 1e9 — accumulation-order-free and
    bit-identical to the SQL replica. Returns a Dataset
    (id, score:float64, label:bool)."""
    w = np.asarray(weights, np.float64)

    def fn(t: pa.Table) -> pa.Table:
        m = _vec_matrix(t[vec_col])
        n = m.shape[0]
        if n and m.shape[1] != len(w):
            raise ValueError(
                f"linear_score: embedding dim {m.shape[1]} != weight dim {len(w)}"
            )
        si = _quant_int64(m * w[None, :]).sum(axis=1) if n else np.zeros(0, np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "score": pa.array(si.astype(np.float64) / QUANT_SCALE, pa.float64()),
                "label": pa.array(si > 0, pa.bool_()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def label_centroid_dist(
    ds,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    batch_size: int = 4096,
    max_labels: int = 10_000,
):
    """Per-group embedding outlier score: squared L2 distance of every
    vector to its OWN group's mean embedding — the intra-cluster
    outlier gate (drop samples far from their class centroid) a curated
    training set runs after labeling.

    Two narrow passes, no shuffle: (1) per-batch exact int64-quantized
    (label, dim) sum partials — L×d-bounded rows per batch — merged on
    the driver (loud ``max_labels`` guard); (2) the (L, d) mean matrix
    broadcasts into a stateless stage computing per-row
    ``Σ_j round((x_j − μ_j)² · 1e9)`` — an exact integer, so the
    score is order-free and bit-identical to the SQL replica.

    Returns a Dataset (id, label, dist2:float64)."""

    def partial(t: pa.Table) -> pa.Table:
        m = _vec_matrix(t[vec_col])
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if m.shape[0] == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sv": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        keys, inv = np.unique(lab, return_inverse=True)
        L, d = len(keys), m.shape[1]
        sums = np.zeros((L, d), np.int64)
        np.add.at(sums, inv, _quant_int64(m))
        counts = np.bincount(inv, minlength=L).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(keys, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), L), pa.int64()),
                "sv": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    agg = parts.groupby(["label", "dim"], as_index=False)[["sv", "n"]].sum()
    labels = np.sort(agg["label"].unique())
    if len(labels) > max_labels:
        raise RuntimeError(
            f"label_centroid_dist: {len(labels)} labels exceeds "
            f"max_labels={max_labels} — use a bucketed exchange instead"
        )
    d = int(agg["dim"].max()) + 1
    lab_pos = {int(l): i for i, l in enumerate(labels)}
    mu = np.zeros((len(labels), d), np.float64)
    for row in agg.itertuples():
        mu[lab_pos[int(row.label)], int(row.dim)] = float(row.sv) / (
            float(row.n) * QUANT_SCALE
        )

    def dist(t: pa.Table) -> pa.Table:
        m = _vec_matrix(t[vec_col])
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if m.shape[0] == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    label_col: t[label_col],
                    "dist2": pa.array([], pa.float64()),
                }
            )
        pos = np.array([lab_pos[int(x)] for x in lab], np.int64)
        diff = m - mu[pos]
        di = _quant_int64(diff * diff).sum(axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                label_col: t[label_col],
                "dist2": pa.array(di.astype(np.float64) / QUANT_SCALE, pa.float64()),
            }
        )

    return ds.map_batches(dist, batch_format="pyarrow", batch_size=batch_size)
