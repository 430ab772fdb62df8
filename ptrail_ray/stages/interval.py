"""Distributed interval (range) join.

Joins a PROBE table of timestamped rows against an INTERVAL table of
[lo, hi] windows: output = probe ⋈ interval where
``lo <= ts <= hi`` (and optionally an equi-key matches). The reference
has no interval join — its windowed lookups are all per-trajectory
sorts (e.g. the as-of backfill analog of
``ptrail/preprocessing/helpers.py``); this is the general large×large
form a training-data pipeline needs (events↔sessions, spans↔documents,
impressions↔campaign windows).

Plan — time-bucket quantization on the engine's single-exchange
machinery (no all-pairs, no broadcast of either side):

    probe:    _tb = ts // W                       (one bucket per row)
    interval: replicate to every _tb in [lo//W .. hi//W]
    union → ONE hash exchange on (_tb [, key]) →
    per bucket: vectorized pandas merge on (_tb [, key]) + range filter

Each (probe, interval) match co-locates exactly once — in the probe's
bucket — so the output needs no dedup. Partitioning assumption (the
knob to size per corpus): interval length is O(W); the interval-side
replication factor is ``len/W + 1``. W defaults to the 99th-percentile
interval length rounded up; pass ``bucket_width`` explicitly in
production. Key skew is handled by the composite (_tb, key) bucket key
— a hot time range spreads across key hashes and vice versa.

Contract (mirrors stages/join.py): disjoint non-key column names;
``ts_col``/``lo_col``/``hi_col`` are Arrow timestamps or int64 of the
same unit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.stages.bucket import grouped_agg_by_bucket

_TB = "_tb"
_SIDE = "_iv_side"


def _to_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp / integer column → int64 (µs for timestamps)."""
    t = col.type
    if pa.types.is_timestamp(t):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def range_join(
    probe,
    intervals,
    *,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    key: str | None = None,
    bucket_width: int = 60_000_000,
    num_buckets: int = 64,
):
    """Inner interval join of two Datasets. Returns all probe columns +
    all interval columns for every (probe, interval) pair with
    ``interval.lo <= probe.ts <= interval.hi`` (µs precision) and, when
    ``key`` is given, ``probe.key == interval.key``.

    ``bucket_width`` is in the ts unit (µs for timestamps; default 60 s).
    """
    p_schema = _arrow_schema(probe)
    i_schema = _arrow_schema(intervals)
    p_cols = [f.name for f in p_schema]
    i_cols = [f.name for f in i_schema if key is None or f.name != key]
    dup = set(p_cols) & set(i_cols)
    if dup:
        raise ValueError(f"range_join requires disjoint non-key columns; duplicate: {sorted(dup)}")
    out_cols = p_cols + i_cols
    W = np.int64(bucket_width)

    def tag_probe(t: pa.Table) -> pa.Table:
        tb = _to_us(t[ts_col]) // W
        t = _pad_missing(t, i_cols, i_schema)
        t = t.append_column(_TB, pa.array(tb, pa.int64()))
        return t.append_column(_SIDE, pa.array(np.zeros(t.num_rows, np.int8), pa.int8()))

    def tag_interval(t: pa.Table) -> pa.Table:
        lo = _to_us(t[lo_col]) // W
        hi = _to_us(t[hi_col]) // W
        counts = np.maximum(hi - lo + 1, 0)  # degenerate hi<lo → drop
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        # per-replica offset: arange minus each row's start position
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        off = np.arange(counts.sum(), dtype=np.int64) - np.repeat(starts, counts)
        tb = np.repeat(lo, counts) + off
        r = t.take(pa.array(idx))
        r = _pad_missing(r, p_cols, p_schema, skip={key} if key else set())
        r = r.append_column(_TB, pa.array(tb, pa.int64()))
        return r.append_column(_SIDE, pa.array(np.full(r.num_rows, 1, np.int8), pa.int8()))

    pt = probe.map_batches(tag_probe, batch_format="pyarrow", batch_size=None)
    it = intervals.map_batches(tag_interval, batch_format="pyarrow", batch_size=None)
    both = pt.select_columns(out_cols + [_TB, _SIDE]).union(
        it.select_columns(out_cols + [_TB, _SIDE])
    )

    merge_keys = [_TB] + ([key] if key else [])

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t[_SIDE]
        p = t.filter(pc.equal(side, 0)).select(p_cols + [_TB]).combine_chunks()
        iv = t.filter(pc.equal(side, 1)).select(i_cols + ([key] if key else []) + [_TB]).combine_chunks()
        if p.num_rows == 0 or iv.num_rows == 0:
            return t.select(out_cols).slice(0, 0)
        m = p.join(iv, keys=merge_keys, join_type="inner")
        ts = _to_us(m[ts_col])
        lo = _to_us(m[lo_col])
        hi = _to_us(m[hi_col])
        return m.filter(pa.array((ts >= lo) & (ts <= hi))).select(out_cols)

    return grouped_agg_by_bucket(
        both, merge_keys, per_bucket, num_buckets=num_buckets, group_format="pyarrow"
    )


def _arrow_schema(ds) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    names = getattr(s, "names", None)
    types = getattr(s, "types", None)
    if names is not None and types is not None and all(
        isinstance(t, pa.DataType) for t in types
    ):
        return pa.schema(zip(names, types))
    batch = next(iter(ds.iter_batches(batch_size=1, batch_format="pyarrow")))
    return batch.schema


def _pad_missing(t: pa.Table, cols: list[str], schema: pa.Schema, skip: set = frozenset()) -> pa.Table:
    """Append typed all-null columns for the other side's fields."""
    for c in cols:
        if c in t.column_names or c in skip:
            continue
        t = t.append_column(c, pa.nulls(t.num_rows, schema.field(c).type))
    return t
