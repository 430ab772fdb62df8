"""Deterministic sampling for training-data pipelines.

``ray.data.Dataset.random_sample`` is seed-per-run and block-layout
dependent — useless when a 100 TB pipeline must reproduce the same
subset across retries, resumes, and engine versions. These operators
key every decision on a content hash of a stable id column instead:

* ``sample_by_hash`` — keep a row iff md5(id) (first 60 bits, the
  same ``_md5_u60`` construction as the dedup fingerprints) falls
  under ``rate`` × 2⁶⁰. Exactly reproducible anywhere, embarrassingly
  parallel (narrow stateless stage, no shuffle, no driver state), and
  consistent across datasets: the same id draws the same verdict in
  every table it appears in (the property train/eval splits need).
* ``split_by_hash`` — the complementary split: routes each row to one
  of ``k`` named folds by hash bucket; folds are disjoint and exhaust
  the input.

SQL replica (oracle-checkable):
    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::UBIGINT
matches ``_md5_u60(str(id))`` exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.functions.dedup import _md5_u60

_SCALE = 1 << 60


def _hash_col(t: pa.Table, id_col: str) -> np.ndarray:
    ids = t[id_col]
    if not pa.types.is_string(ids.type):
        ids = pc.cast(ids, pa.string())
    return np.fromiter(
        (_md5_u60(v) for v in ids.to_pylist()), dtype=np.uint64, count=t.num_rows
    )


def sample_by_hash(ds, *, id_col: str, rate: float):
    """Keep rows whose md5-derived id hash < ``rate`` (0 ≤ rate ≤ 1).
    Deterministic, stateless, reproducible across runs and engines."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate!r}")
    cut = np.uint64(int(rate * _SCALE))

    def mask(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_hash_col(t, id_col) < cut))

    return ds.map_batches(mask, batch_format="pyarrow", batch_size=None)


def split_by_hash(ds, *, id_col: str, fold: int, k: int):
    """Keep rows routed to ``fold`` of ``k`` disjoint hash folds
    (fold = hash mod k). Folds partition the input exactly."""
    if not 0 <= fold < k:
        raise ValueError(f"fold must be in [0, {k}), got {fold}")

    def mask(t: pa.Table) -> pa.Table:
        h = _hash_col(t, id_col)
        return t.filter(pa.array(h % np.uint64(k) == np.uint64(fold)))

    return ds.map_batches(mask, batch_format="pyarrow", batch_size=None)


def stratified_sample_by_hash(
    ds, *, key_col: str, id_col: str, n_per_key: int, num_buckets: int = 64
):
    """Deterministic quota sample: the ``n_per_key`` rows of each
    stratum with the smallest md5(id) hashes (ties impossible modulo
    md5 collisions). The per-key quota is what balanced training mixes
    need — a global rate over-samples hot strata. One hash-bucket
    exchange on the stratum key; the per-bucket kernel is a vectorized
    groupby-rank. SQL replica: row_number() OVER (PARTITION BY key
    ORDER BY md5-hash, id) <= n."""
    if n_per_key < 1:
        raise ValueError(f"n_per_key must be >= 1, got {n_per_key}")
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def add_h(t: pa.Table) -> pa.Table:
        # int64-safe: top 60 bits only (see _md5_u60)
        return t.append_column(
            "_h", pa.array(_hash_col(t, id_col).astype(np.int64), pa.int64())
        )

    def take_quota(df):
        df = df.sort_values(["_h", id_col], kind="stable")
        r = df.groupby(key_col, sort=False).cumcount()
        return df[r < n_per_key].drop(columns=["_h"])

    return grouped_agg_by_bucket(
        ds.map_batches(add_h, batch_format="pyarrow", batch_size=None),
        key_col,
        take_quota,
        num_buckets=num_buckets,
    )
