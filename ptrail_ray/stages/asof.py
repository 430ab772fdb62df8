"""Point-in-time (as-of) backfill join against a slowly-changing dimension.

The north_rule's extension of the reference's contextual joins
(``ptrail/features/contextual_features.py:33-184`` broadcast a small side
table and scan it per point): for each turn, attach the side-table row
with the greatest ``effective_ts <= ts`` for the turn's join key —
inclusive boundary, never a future version (zero temporal leakage,
SURVEY.md §2.5).

Ray design: the side table is small (a dimension) → ``ray.put`` ONCE on
the driver, then an **actor pool** (``map_batches(AsofJoiner,
concurrency=N)``) reads it from the object store in ``__init__`` (once
per actor), builds a sorted composite index, and probes each batch with
ONE vectorized ``np.searchsorted`` — no shuffle, no per-batch sort, no
pandas merge. Payload columns (text, features) stay zero-copy Arrow.

Composite index: side rows sorted by (key, effective_ts) are encoded as
``key_id << TS_BITS | (ts - ts_min)`` in uint64; a probe row's
``searchsorted(side, key_id<<TS_BITS | rel_ts, 'right') - 1`` lands on
its as-of match iff the hit shares the key_id. Ranges are asserted at
build time (key cardinality × time span must fit 64 bits — true for any
realistic dimension; a >2^20-key side table should be a shuffle join
instead, see ray_guide joins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ptrail_ray.schema import TS

SIDE_COLS = ["key", "effective_ts", "attr_num", "attr_cat"]


def put_side_table(side: "pa.Table | pd.DataFrame"):
    """Broadcast the dimension once; returns the object ref handed to
    every AsofJoiner actor."""
    if isinstance(side, pa.Table):
        side = side.to_pandas()
    side = side.sort_values(["key", "effective_ts"], kind="stable").reset_index(
        drop=True
    )
    return ray.put(side)


class AsofJoiner:
    """Actor-pool stage: per-batch vectorized point-in-time join."""

    def __init__(self, side_ref, key_col: str = "conv_id", ts_col: str = TS):
        side = ray.get(side_ref) if not isinstance(side_ref, pd.DataFrame) else side_ref
        side = side.sort_values(["key", "effective_ts"], kind="stable").reset_index(
            drop=True
        )
        self.key_col = key_col
        self.ts_col = ts_col
        self.attr_cols = [c for c in side.columns if c not in ("key", "effective_ts")]
        self.attrs = {c: pa.Array.from_pandas(side[c]) for c in self.attr_cols}

        self.keys = pd.Index(pd.unique(side["key"]))
        self.keys_arr = pa.array(self.keys, type=pa.string())
        key_id = self.keys.get_indexer(side["key"]).astype(np.uint64)
        ts = side["effective_ts"].astype("datetime64[us]").to_numpy().view("int64")
        self.ts_min = int(ts.min()) if len(ts) else 0
        rel = (ts - self.ts_min).astype(np.int64)
        assert (rel >= 0).all()
        span_bits = max(int(rel.max()).bit_length() + 1, 1) if len(rel) else 1
        key_bits = max(int(len(self.keys)).bit_length() + 1, 1)
        assert span_bits + key_bits <= 64, "side table too large for composite asof"
        self.ts_bits = np.uint64(span_bits)
        self.side_comp = (key_id << self.ts_bits) | rel.astype(np.uint64)
        self.side_key_id = key_id.astype(np.int64)
        self.ts_max_rel = np.uint64((1 << span_bits) - 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(self.side_comp) == 0:  # empty dimension → all-null backfill
            for c in self.attr_cols:
                batch = batch.append_column(
                    c, pa.nulls(batch.num_rows, self.attrs[c].type)
                )
            return batch

        ts_col = batch[self.ts_col]
        if pa.types.is_timestamp(ts_col.type) and ts_col.type.unit != "us":
            ts_col = pc.cast(ts_col, pa.timestamp("us"))
        ts = ts_col.to_numpy(zero_copy_only=False).view("int64")
        # Arrow-native key lookup — no Python-object string conversion
        kid_arr = pc.index_in(batch[self.key_col], value_set=self.keys_arr)
        kid = pc.fill_null(kid_arr, -1).to_numpy(zero_copy_only=False).astype(np.int64)

        rel = ts - self.ts_min
        # clamp: probes before ts_min can't match; after span end clamp to max
        neg = rel < 0
        rel_u = np.clip(rel, 0, int(self.ts_max_rel)).astype(np.uint64)
        comp = (np.maximum(kid, 0).astype(np.uint64) << self.ts_bits) | rel_u
        idx = np.searchsorted(self.side_comp, comp, side="right") - 1
        valid = (
            (idx >= 0)
            & (kid >= 0)
            & ~neg
            & (self.side_key_id[np.maximum(idx, 0)] == kid)
        )
        idx_arr = pa.array(np.where(valid, idx, 0), mask=~valid)
        for c in self.attr_cols:
            batch = batch.append_column(c, pc.take(self.attrs[c], idx_arr))
        return batch


def asof_join(
    ds,
    side: "pa.Table | pd.DataFrame",
    *,
    key_col: str = "conv_id",
    concurrency: "int | tuple" = (1, 8),
    batch_size: "int | None" = 65536,
    num_cpus: float = 0.5,
):
    """Dataset-level as-of backfill: broadcast ``side`` and join in an
    actor pool. Appends ``attr_num`` (float64) and ``attr_cat`` (string);
    turns with no version at or before ``ts`` get nulls.

    ``concurrency``: an int pins the pool size (all actors spawn at
    execution start — use for throughput runs); a (min, max) tuple
    autoscales (use when CPU budget is tight).

    ``num_cpus=0.5`` is load-bearing, not a tuning nicety: with the
    default (1.0) Ray's planner FUSES the upstream task-based stage
    into this actor pool, so an expensive window-kernel stage ends up
    running on ``concurrency`` actors while every other CPU idles
    (measured r04: the fused plan ran the whole kernel+asof phase on
    NUM_CPUS/4 actors — 40-55 s vs 36-39 s unfused at 4 CPUs on the
    29M-turn bench corpus). A distinct resource spec blocks that
    fusion AND halves the pool's CPU reservation, leaving the kernels
    to a full-width task pool; the probe itself is one vectorized
    searchsorted per batch and nowhere near a core's worth of work."""
    side_ref = put_side_table(side)
    return ds.map_batches(
        AsofJoiner,
        fn_constructor_kwargs={"side_ref": side_ref, "key_col": key_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


class NearestAsofJoiner(AsofJoiner):
    """Actor-pool NEAREST-neighbor temporal join: instead of the
    backward-only point-in-time match, each probe takes whichever of
    its key's (last version ≤ ts, first version > ts) is closer in
    absolute time, ties going to the EARLIER version. Same broadcast
    composite-key index as AsofJoiner; the forward candidate is just
    idx_back + 1 under the (key, ts) sort, so the probe stays one
    searchsorted per batch. Appends the side attrs plus
    ``asof_dist_s`` (integer seconds to the matched version).
    Extends the reference's as-of lookup family
    (ptrail/features/contextual_features.py:304-379 analog)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(self.side_comp) == 0:
            for c in self.attr_cols:
                batch = batch.append_column(
                    c, pa.nulls(batch.num_rows, self.attrs[c].type)
                )
            return batch.append_column(
                "asof_dist_s", pa.nulls(batch.num_rows, pa.int64())
            )

        ts_col = batch[self.ts_col]
        if pa.types.is_timestamp(ts_col.type) and ts_col.type.unit != "us":
            ts_col = pc.cast(ts_col, pa.timestamp("us"))
        ts = ts_col.to_numpy(zero_copy_only=False).view("int64")
        kid_arr = pc.index_in(batch[self.key_col], value_set=self.keys_arr)
        kid = (
            pc.fill_null(kid_arr, -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        rel = ts - self.ts_min
        rel_u = np.clip(rel, 0, int(self.ts_max_rel)).astype(np.uint64)
        comp = (np.maximum(kid, 0).astype(np.uint64) << self.ts_bits) | rel_u
        back = np.searchsorted(self.side_comp, comp, side="right") - 1
        fwd = back + 1
        n_side = len(self.side_comp)
        side_ts = (
            self.side_comp & self.ts_max_rel
        ).astype(np.int64) + self.ts_min
        bvalid = (
            (back >= 0)
            & (kid >= 0)
            & (self.side_key_id[np.maximum(back, 0)] == kid)
        )
        fvalid = (
            (fwd < n_side)
            & (kid >= 0)
            & (self.side_key_id[np.minimum(fwd, n_side - 1)] == kid)
        )
        bdist = np.where(
            bvalid, np.abs(ts - side_ts[np.maximum(back, 0)]), np.int64(2**62)
        )
        fdist = np.where(
            fvalid,
            np.abs(side_ts[np.minimum(fwd, n_side - 1)] - ts),
            np.int64(2**62),
        )
        # nearer wins; exact ties go to the earlier (backward) version
        use_fwd = fdist < bdist
        idx = np.where(use_fwd, fwd, back)
        valid = bvalid | fvalid
        dist = np.where(use_fwd, fdist, bdist) // 1_000_000
        idx_arr = pa.array(
            np.where(valid, idx, 0).astype(np.int64), mask=~valid
        )
        for c in self.attr_cols:
            batch = batch.append_column(c, pc.take(self.attrs[c], idx_arr))
        return batch.append_column(
            "asof_dist_s",
            pa.array(np.where(valid, dist, 0), pa.int64(), mask=~valid),
        )


def nearest_asof_join(
    ds,
    side: "pa.Table | pd.DataFrame",
    *,
    key_col: str = "conv_id",
    concurrency: "int | tuple" = (1, 8),
    batch_size: "int | None" = 65536,
    num_cpus: float = 0.5,
):
    """Dataset-level nearest-version temporal join (see
    NearestAsofJoiner). Same broadcast/actor-pool/no-fusion plan as
    asof_join."""
    side_ref = put_side_table(side)
    return ds.map_batches(
        NearestAsofJoiner,
        fn_constructor_kwargs={"side_ref": side_ref, "key_col": key_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
