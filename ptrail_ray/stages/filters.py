"""Filters / predicates (reference: ``ptrail/preprocessing/filters.py``).

Recast dictionary (SURVEY.md §7.0): speed→len_rate, consecutive
distance→delta_len (and delta_t), trajectory→conversation. Parity-critical
semantics carried over exactly (SURVEY.md §1.3-6):

* ``filter_by_max_len_rate``: NaN rows are filled with ``max+1`` before
  ``<=`` — i.e. boundary-NaN rows are DROPPED (``filters.py:340-341``);
* ``filter_by_min_len_rate``: NaN → ``min-1`` before ``>=`` — dropped
  (``filters.py:380-381``); same for the consecutive-delta filters
  (``filters.py:418,457``);
* combined min filters do NO fillna — NaN comparisons are False, rows
  dropped (``filters.py:546-548``);
* IQR outlier filters use STRICT interior ``(lower, higher)`` with
  Q1/Q3 ± 1.5·IQR computed over the whole column GLOBALLY
  (``filters.py:581-600,626-640``) — a 2-pass exact-quantile aggregate
  here (stages/quantiles.py), broadcast into a stateless mask stage;
* ``remove_convs_with_less_turns``: keep conversations with ≥ n turns
  (default 3; ``filters.py:643-669``);
* ``remove_duplicates``: drop exact dups on (conv_id, turn_idx, ts, text)
  keep-first (``filters.py:32-51``) — runs inside conv-contiguous buckets,
  so no extra shuffle (key ⊇ conv_id);
* ``hampel``: per-conversation rolling-median outlier drop
  (``filters.py:672-759``; window ±size, 3σ via MAD·1.4826).

All filters are row-subsets of their input (the reference's own test
invariant, ``filters_test.py:30,50,57``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.schema import CONV_ID, TEXT, TS, TURN_IDX
from ptrail_ray.stages.bucket import conv_runs, map_conv_buckets
from ptrail_ray.stages.quantiles import exact_quantiles


def _mask_batches(ds, fn):
    return ds.map_batches(
        lambda t: t.filter(fn(t)), batch_format="pyarrow", batch_size=None
    )


# --- threshold filters (stateless masks over feature columns) ---------------


def filter_by_max(ds, col: str, max_value: float):
    """NaN-sentinel max filter: NaN → max+1 → dropped (filters.py:340-341)."""

    def mask(t: pa.Table) -> pa.Array:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.where(np.isnan(v), max_value + 1, v)
        return pa.array(v <= max_value)

    return _mask_batches(ds, mask)


def filter_by_min(ds, col: str, min_value: float):
    """NaN-sentinel min filter: NaN → min-1 → dropped (filters.py:380-381)."""

    def mask(t: pa.Table) -> pa.Array:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.where(np.isnan(v), min_value - 1, v)
        return pa.array(v >= min_value)

    return _mask_batches(ds, mask)


def filter_by_min_both(ds, col_a: str, min_a: float, col_b: str, min_b: float):
    """Conjunctive min filter, NO fillna — NaN comparisons are False
    (filters.py:546-548)."""

    def mask(t: pa.Table) -> pa.Array:
        a = t[col_a].to_numpy(zero_copy_only=False).astype(np.float64)
        b = t[col_b].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            return pa.array((a >= min_a) & (b >= min_b))

    return _mask_batches(ds, mask)


def filter_by_max_both(ds, col_a: str, max_a: float, col_b: str, max_b: float):
    """Conjunctive max filter WITH NaN sentinels: NaN → max+1 → the row
    drops (``filter_by_max_distance_and_speed``,
    ptrail/preprocessing/filters.py:467-509 — the reference fillna's
    each column with its max+1 before the conjunction)."""

    def mask(t: pa.Table) -> pa.Array:
        a = t[col_a].to_numpy(zero_copy_only=False).astype(np.float64)
        b = t[col_b].to_numpy(zero_copy_only=False).astype(np.float64)
        a = np.where(np.isnan(a), max_a + 1, a)
        b = np.where(np.isnan(b), max_b + 1, b)
        return pa.array((a <= max_a) & (b <= max_b))

    return _mask_batches(ds, mask)


def filter_by_range(ds, col: str, lo, hi, inside: bool = True):
    """Inclusive range filter (bbox / date-window analog,
    filters.py:128-155, 158-311). Raises if hi < lo."""
    if hi < lo:
        raise ValueError(f"invalid range: {hi!r} < {lo!r}")

    def mask(t: pa.Table) -> pa.Array:
        m = pc.and_(
            pc.greater_equal(t[col], pa.scalar(lo)),
            pc.less_equal(t[col], pa.scalar(hi)),
        )
        m = pc.fill_null(m, False)
        return m if inside else pc.invert(m)

    return _mask_batches(ds, mask)


def filter_by_conv_id(ds, conv_id: str):
    """Equality filter on conv_id (filter_by_traj_id, filters.py:54-83)."""
    return _mask_batches(
        ds, lambda t: pc.fill_null(pc.equal(t[CONV_ID], pa.scalar(conv_id)), False)
    )


# --- global-aggregate IQR filters (2-pass) ----------------------------------


def filter_outliers_by_iqr(ds, col: str, *, k: float = 1.5):
    """Drop rows outside the STRICT interval (Q1-k·IQR, Q3+k·IQR); Q1/Q3
    exact global quantiles (filters.py:557-600). NaN rows drop (NaN
    compares False). Two streaming passes: quantile aggregate → mask."""
    q1, q3 = exact_quantiles(ds, col, [0.25, 0.75])
    cut = (q3 - q1) * k
    lower, higher = q1 - cut, q3 + cut

    def mask(t: pa.Table) -> pa.Array:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            return pa.array((v > lower) & (v < higher))

    return _mask_batches(ds, mask)


# --- per-conversation filters (bucket kernels, no extra shuffle) ------------


def remove_convs_with_less_turns(ds, min_turns: int = 3, *, num_buckets: int = 32):
    """Keep conversations with at least ``min_turns`` turns
    (remove_trajectories_with_less_points, filters.py:643-669)."""

    def kern(table: pa.Table) -> pa.Table:
        starts, lengths = conv_runs(table[CONV_ID])
        keep = np.repeat(lengths >= min_turns, lengths)
        return table.filter(pa.array(keep))

    return map_conv_buckets(ds, kern, num_buckets=num_buckets)


def remove_duplicates(ds, *, num_buckets: int = 32):
    """Exact-duplicate row removal on (conv_id, turn_idx, ts, text),
    keep-first in stable order (filters.py:32-51). Bucket-local: the
    dedup key contains conv_id, so conv-contiguity already co-locates
    duplicates — no extra shuffle."""

    def kern(table: pa.Table) -> pa.Table:
        n = table.num_rows
        if n == 0:
            return table
        # re-sort including text so equal rows are adjacent even when
        # (conv_id, turn_idx, ts) ties carry different texts
        idx = pc.sort_indices(
            table,
            sort_keys=[(k, "ascending") for k in (CONV_ID, TURN_IDX, TS, TEXT)],
        )
        table = table.take(idx)
        same = np.ones(n, dtype=bool)
        same[0] = False
        for colname in (CONV_ID, TEXT):
            c = table[colname].combine_chunks() if isinstance(
                table[colname], pa.ChunkedArray
            ) else table[colname]
            eq = pc.equal(c.slice(1), c.slice(0, n - 1))
            eq = pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
            # treat null==null as equal for dedup purposes
            nulls = pc.is_null(c).to_numpy(zero_copy_only=False)
            eq = eq | (nulls[1:] & nulls[:-1])
            same[1:] &= eq
        for colname in (TURN_IDX, TS):
            v = table[colname].to_numpy(zero_copy_only=False)
            same[1:] &= v[1:] == v[:-1]
        return table.filter(pa.array(~same))

    return map_conv_buckets(ds, kern, num_buckets=num_buckets)


def hampel_filter(
    ds, col: str, *, window: int = 7, n_sigmas: float = 3.0, num_buckets: int = 32
):
    """Per-conversation Hampel outlier DROP on ``col``: centered rolling
    median window of ``2*window+1``; points further than
    ``n_sigmas * 1.4826 * MAD`` from the local median are removed
    (filters.py:672-759 via the hampel pkg). Fully vectorized across all
    conversations in a bucket: runs are laid out into one array with
    ``window`` NaN cells between them (a centered window can reach at
    most ``window`` cells past a run edge, so padding isolates runs) and
    the rolling median is one ``np.nanmedian`` over a zero-copy
    ``sliding_window_view`` — no per-conversation Python calls."""
    from numpy.lib.stride_tricks import sliding_window_view

    w = window

    def _run_rolling_median(
        v: np.ndarray, starts: np.ndarray, lengths: np.ndarray
    ) -> np.ndarray:
        n_runs = len(starts)
        padded_len = len(v) + (n_runs + 1) * w
        P = np.full(padded_len, np.nan)
        # each run r occupies [pad_start[r], pad_start[r] + lengths[r])
        pad_start = starts + (np.arange(n_runs) + 1) * w
        pos = np.repeat(pad_start, lengths) + (
            np.arange(len(v)) - np.repeat(starts, lengths)
        )
        P[pos] = v
        win = sliding_window_view(P, 2 * w + 1)  # rows: centers w..padded_len-w-1

        # fast path: windows with no NaN (run interiors — the vast
        # majority) take a single np.partition; only boundary windows /
        # windows containing NaN values pay np.nanmedian
        cs = np.concatenate(([0], np.cumsum(np.isnan(P).astype(np.int64))))
        nan_cnt = cs[pos + w + 1] - cs[pos - w]
        med = np.empty(len(v))
        fast = nan_cnt == 0
        if fast.any():
            med[fast] = np.partition(win[pos[fast] - w], w, axis=1)[:, w]
        if (~fast).any():
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                med[~fast] = np.nanmedian(win[pos[~fast] - w], axis=1)
        return med

    def kern(table: pa.Table) -> pa.Table:
        starts, lengths = conv_runs(table[CONV_ID])
        v = table[col].to_numpy(zero_copy_only=False).astype(np.float64)
        med = _run_rolling_median(v, starts, lengths)
        with np.errstate(invalid="ignore"):
            dev = np.abs(v - med)
            mad = _run_rolling_median(dev, starts, lengths)
            out = (dev > n_sigmas * 1.4826 * mad) & ~np.isnan(v)
        return table.filter(pa.array(~out))

    return map_conv_buckets(ds, kern, num_buckets=num_buckets)
