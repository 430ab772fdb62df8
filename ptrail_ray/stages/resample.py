"""Per-conversation time-grid resampling (downsample to one turn per
fixed wall-clock bucket).

PTRAIL's cleaning family reduces over-dense trajectories by dropping
points (dedup / outlier filters, ``ptrail/preprocessing/filters.py``);
this stage is the grid-aligned variant a transcript pipeline needs:
keep, per conversation, the LAST turn (max ``turn_idx``, ties broken by
``ts``) inside each epoch-aligned window of ``width_s`` seconds. "Last"
preserves the conversation's most recent state per window, the usual
choice for downsampled feature snapshots.

Scale shape: rides the engine's single conv-bucket exchange
(``stages/bucket.py``); the per-bucket kernel is one ``np.lexsort`` +
one adjacent-compare — no per-row Python. Text passes through untouched
(byte-equal, SURVEY.md §1.3-7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.schema import CONV_ID, TS, TURN_IDX
from ptrail_ray.stages.bucket import conv_runs, map_conv_buckets

DEFAULT_WIDTH_S = 60.0


def resample_last_kernel(table: pa.Table, *, width_s: float = DEFAULT_WIDTH_S) -> pa.Table:
    """Keep the last turn per (conv, window) in one sorted bucket.

    Robust to non-monotone ``ts`` within a conversation: rows are
    re-keyed by (run, window, turn_idx, ts) with ``np.lexsort`` before
    the adjacent-compare, so a window revisited out of order still
    yields exactly one row.
    """
    n = table.num_rows
    if n == 0:
        return table.append_column(
            "window_ts", pa.array([], type=pa.timestamp("us"))
        )
    ts = table[TS]
    if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
        ts = pc.cast(ts, pa.timestamp("us"))
    ts_us = ts.to_numpy(zero_copy_only=False).view("int64")
    width_us = np.int64(round(width_s * 1e6))
    win = ts_us - (ts_us % width_us)  # epoch-aligned floor (ts >= 0)

    starts, lengths = conv_runs(table[CONV_ID])
    run_id = np.repeat(np.arange(len(starts), dtype=np.int64), lengths)
    turn = table[TURN_IDX].to_numpy(zero_copy_only=False).astype(np.int64)

    order = np.lexsort((ts_us, turn, win, run_id))
    rid_o, win_o = run_id[order], win[order]
    last = np.empty(n, dtype=bool)
    last[-1] = True
    last[:-1] = (rid_o[1:] != rid_o[:-1]) | (win_o[1:] != win_o[:-1])

    keep = order[last]
    out = table.take(pa.array(keep, type=pa.int64()))
    return out.append_column(
        "window_ts", pa.array(win[keep], type=pa.timestamp("us"))
    )


def resample_last(ds, *, width_s: float = DEFAULT_WIDTH_S, num_buckets: int = 32, **kwargs):
    """Dataset-level grid resample (one conv-bucket exchange)."""

    def fn(t: pa.Table) -> pa.Table:
        return resample_last_kernel(t, width_s=width_s)

    return map_conv_buckets(ds, fn, num_buckets=num_buckets, **kwargs)
