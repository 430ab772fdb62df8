"""Skew handling: salted bucket assignment for hot conversations.

The reference's partitioner chunks by *ID count*, not row count, and its
ascending ``value_counts`` ordering clusters the biggest trajectories
into the same chunk (``ptrail/features/helper_functions.py:536-605``,
SURVEY.md §4.1) — one hot entity ⇒ one straggler worker. This engine
handles skew explicitly (north_rule):

1. **Detect** — a cheap pre-pass: per-block partial conversation counts
   (vectorized ``value_counts``) → a tiny ``groupby(conv_id).sum``
   over the partials (rows ≈ #distinct convs per block, not #turns) →
   conversations above ``hot_threshold`` rows.
2. **Salt** — bucket assignment becomes
   ``hash(conv_id) % B`` for cold conversations and a **dedicated
   partition** ``B + hot_index`` per hot conversation, so no two hot
   conversations share a bucket and no cold bucket inherits a whale.
   Whole-conversation contiguity (what the window kernels need) is
   preserved — a conversation is never split.

A conversation larger than one worker's memory goes through sub-range
splitting with K-row boundary overlap plus injected per-range prefix
state — implemented in stages/split.py (``featurize_with_split`` routes
giant conversations automatically).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.schema import CONV_ID
from ptrail_ray.stages.bucket import BUCKET_COL, sort_bucket, stable_hash

DEFAULT_HOT_THRESHOLD = 100_000


def detect_hot_convs(
    ds, threshold: int = DEFAULT_HOT_THRESHOLD, *, floor: int | None = None
) -> list[str]:
    """Conversations with more than ``threshold`` turns.

    Partial-aggregate pattern: combine inside map_batches (one row per
    conv per block), then a small groupby over the partials — the wide
    input is never shuffled for this.

    ``floor`` prunes per-block partials below that row count. The
    default (threshold/256) assumes a hot conversation's rows span at
    most ~256 batches — fine for SALTING, where a miss only costs skew
    headroom. Pass ``floor=1`` (exhaustive, still bounded by distinct
    convs per block) when the result gates a CORRECTNESS-adjacent path
    such as giant-conversation splitting, where a thinly-spread giant
    slipping through would defeat the split path's memory contract
    (ADVICE r01)."""
    if floor is None:
        floor = max(1, threshold // 256)

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[CONV_ID])
        out = pa.table(
            {CONV_ID: vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )
        return out.filter(pc.greater_equal(out["n"], pa.scalar(floor)))

    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def merge(df):
        tot = df.groupby(CONV_ID, sort=False)["n"].sum()
        tot = tot[tot > threshold]
        return tot.reset_index()

    parts = ds.select_columns([CONV_ID]).map_batches(
        partial_counts, batch_format="pyarrow", batch_size=1 << 20
    )
    hot = grouped_agg_by_bucket(parts, CONV_ID, merge, num_buckets=16)
    return sorted(r[CONV_ID] for r in hot.take_all())


def map_conv_buckets_salted(
    ds,
    fn,
    *,
    num_buckets: int = 32,
    hot_threshold: int = DEFAULT_HOT_THRESHOLD,
    hot_convs: list[str] | None = None,
    **map_groups_kwargs,
):
    """``map_conv_buckets`` with hot-key salting: each hot conversation
    gets its own dedicated partition id ≥ num_buckets."""
    if hot_convs is None:
        hot_convs = detect_hot_convs(ds, hot_threshold)
    hot_arr = pa.array(hot_convs, type=pa.string())

    def add_salted_bucket(batch: pa.Table) -> pa.Table:
        h = stable_hash(batch[CONV_ID])
        bucket = (h % np.uint64(num_buckets)).astype(np.int32)
        if len(hot_arr):
            hot_idx = pc.index_in(batch[CONV_ID], value_set=hot_arr)
            hot_np = pc.fill_null(hot_idx, -1).to_numpy(zero_copy_only=False)
            bucket = np.where(hot_np >= 0, num_buckets + hot_np, bucket).astype(
                np.int32
            )
        return batch.append_column(BUCKET_COL, pa.array(bucket, pa.int32()))

    def wrapped(table: pa.Table) -> pa.Table:
        if BUCKET_COL in table.column_names:
            table = table.drop_columns([BUCKET_COL])
        return fn(sort_bucket(table))

    return (
        ds.map_batches(add_salted_bucket, batch_format="pyarrow", batch_size=262144)
        .groupby(BUCKET_COL)
        .map_groups(wrapped, batch_format="pyarrow", **map_groups_kwargs)
    )


def featurize_salted(
    ds,
    features: list[str] | None = None,
    *,
    num_buckets: int = 32,
    hot_threshold: int = DEFAULT_HOT_THRESHOLD,
    gap_seconds: float = 120.0,
    segment_seconds: float = 3600.0,
):
    """Skew-aware variant of ``kernels.featurize`` — identical output."""
    from ptrail_ray.stages.kernels import compute_features

    return map_conv_buckets_salted(
        ds,
        lambda t: compute_features(
            t, features, gap_seconds=gap_seconds, segment_seconds=segment_seconds
        ),
        num_buckets=num_buckets,
        hot_threshold=hot_threshold,
    )
