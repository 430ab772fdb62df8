"""Per-conversation aggregate features.

Reference counterparts (SURVEY.md §2.7):

* ``conv_stats``: per-conversation describe() over the feature columns →
  ONE wide row per conversation with a fixed column order — the
  ``generate_kinematic_stats`` + ``pivot_stats_df`` chain
  (``ptrail/preprocessing/statistics.py:65-202``; column order pattern
  ``ptrail/utilities/constants.py:34-43``). Percentiles are
  numpy/pandas 'linear' interpolation like ``describe(percentiles=...)``.
* ``conv_facts``: start/end ts, duration, turn count, distinct tools —
  ``get_start_time/get_end_time/get_traj_duration/get_number_of_locations``
  (``temporal_features.py:247-348``, ``kinematic_features.py:805-850``).

Both run inside already-conv-contiguous buckets (stages/bucket.py), so
they add NO shuffle beyond the engine's single exchange; the reference
re-fans-out a multiprocessing pool per call. ``groupby().map_groups`` per
conversation would pay a Python call per conv; here one vectorized numpy
kernel handles every conversation in the bucket at once via reduceat /
sorted-run percentile slicing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ptrail_ray.schema import (
    CONV_ID,
    STATS_FEATURES,
    STATS_PERCENTILES,
    TEXT,
    TOOL,
    TS,
    TURN_IDX,
)
from ptrail_ray.stages.bucket import conv_runs, map_conv_buckets


# Features whose values are exact multiples of 1/scale: their per-conv
# MEANS are computed from exact integer sums (order-independent) because
# a float sum's accumulation order — DuckDB's parallel aggregation
# included — is nondeterministic, and granular quantities land exactly
# on 6-dp rounding half-boundaries often enough to flake the value hash
# (observed: mean_delta_t off by 1e-6 in ~1 of 10 runs).
GRANULAR_SCALE = {
    "delta_t": 1e6,
    "elapsed_s": 1e6,
    "delta_len": 1.0,
    "cum_len": 1.0,
    "tok_delta": 1.0,
}


def _describe_runs(
    v: np.ndarray, starts: np.ndarray, lengths: np.ndarray, scale: float | None = None
) -> dict[str, np.ndarray]:
    """Per-run describe of one feature column (NaN-skipping), fully
    vectorized across ALL runs at once: one lexsort + index arithmetic —
    no per-conversation Python loop (640k conversations per bucket would
    otherwise mean 640k ``np.percentile`` calls).

    Percentiles interpolate with DuckDB ``quantile_cont``'s operand
    order ``lo*(1-frac) + hi*frac``; std is sample std (ddof=1) via a
    two-pass mean-subtracted sum — the one-pass sums-of-squares formula
    suffers catastrophic cancellation that can flip the 6th decimal vs
    DuckDB ``stddev_samp`` under the driver's round-to-6dp value hash.
    """
    n_runs = len(starts)
    grp = np.repeat(np.arange(n_runs), lengths)
    nan = np.isnan(v)

    # per-run non-NaN counts and sums
    cnt = (lengths - np.bincount(grp, weights=nan, minlength=n_runs)).astype(np.int64)
    vz = np.where(nan, 0.0, v)
    s1 = np.bincount(grp, weights=vz, minlength=n_runs)

    out: dict[str, np.ndarray] = {}
    with np.errstate(invalid="ignore", divide="ignore"):
        if scale is not None:
            # exact integer sum at the feature's granularity
            vi = np.where(nan, 0.0, np.rint(v * scale))
            s1i = np.bincount(grp, weights=vi, minlength=n_runs)
            mean = np.where(cnt > 0, (s1i / scale) / np.maximum(cnt, 1), np.nan)
        else:
            mean = np.where(cnt > 0, s1 / np.maximum(cnt, 1), np.nan)
        # second pass: numerically stable centered sum of squares
        dev = np.where(nan | ~np.isfinite(mean[grp]), 0.0, v - mean[grp])
        css = np.bincount(grp, weights=dev * dev, minlength=n_runs)
        std = np.sqrt(css / np.maximum(cnt - 1, 1))
        std = np.where(cnt > 1, std, np.nan)
    out["mean"] = mean
    out["std"] = std

    # group-sorted values (NaNs sort to each group's tail under lexsort)
    order = np.lexsort((v, grp))
    vs = v[order]

    def at(rank: np.ndarray) -> np.ndarray:
        idx = starts + np.clip(rank, 0, np.maximum(lengths - 1, 0))
        res = vs[np.minimum(idx, len(vs) - 1)] if len(vs) else np.full(n_runs, np.nan)
        return np.where(cnt > 0, res, np.nan)

    out["min"] = at(np.zeros(n_runs, dtype=np.int64))
    out["max"] = at(cnt - 1)
    for q, name in zip(STATS_PERCENTILES, ("p10", "p25", "p50", "p75", "p90")):
        k = q * (cnt - 1)
        lo = np.floor(k).astype(np.int64)
        hi = np.ceil(k).astype(np.int64)
        frac = k - lo
        vlo, vhi = at(lo), at(hi)
        # DuckDB CastInterpolation::Interpolate operand order
        out[name] = vlo * (1.0 - frac) + vhi * frac
    return out


def conv_stats_kernel(
    table: pa.Table, features: list[str] | None = None
) -> pa.Table:
    """Bucket kernel: one wide stats row per conversation, fixed column
    order ``{stat}_{feature}`` (ORDERED_COLS pattern)."""
    features = features or [f for f in STATS_FEATURES if f in table.column_names]
    starts, lengths = conv_runs(table[CONV_ID])
    conv_ids = table[CONV_ID].take(pa.array(starts))
    cols: dict[str, pa.Array] = {CONV_ID: conv_ids}
    for f in features:
        v = table[f].to_numpy(zero_copy_only=False).astype(np.float64)
        d = _describe_runs(v, starts, lengths, scale=GRANULAR_SCALE.get(f))
        for stat in ("p10", "p25", "p50", "p75", "p90", "min", "max", "mean", "std"):
            cols[f"{stat}_{f}"] = pa.array(d[stat], type=pa.float64())
    return pa.table(cols)


def conv_stats(ds, features: list[str] | None = None, *, num_buckets: int = 32):
    """Dataset-level per-conversation stats vectors (wide)."""
    return map_conv_buckets(
        ds, lambda t: conv_stats_kernel(t, features), num_buckets=num_buckets
    )


def conv_facts_kernel(table: pa.Table) -> pa.Table:
    """Bucket kernel: per-conversation scalar facts."""
    starts, lengths = conv_runs(table[CONV_ID])
    ends = starts + lengths - 1
    conv_ids = table[CONV_ID].take(pa.array(starts))
    ts = table[TS].to_numpy(zero_copy_only=False)
    start_ts, end_ts = ts[starts], ts[ends]
    dur = (end_ts - start_ts) / np.timedelta64(1, "s")

    tool = table[TOOL].to_numpy(zero_copy_only=False)
    grp = np.repeat(np.arange(len(starts)), lengths)
    distinct_tools = (
        pd.DataFrame({"g": grp, "t": tool}).groupby("g")["t"].nunique().to_numpy()
    )

    return pa.table(
        {
            CONV_ID: conv_ids,
            "n_turns": pa.array(lengths, pa.int64()),
            "start_ts": pa.array(start_ts, pa.timestamp("us")),
            "end_ts": pa.array(end_ts, pa.timestamp("us")),
            "duration_s": pa.array(dur, pa.float64()),
            "n_distinct_tools": pa.array(distinct_tools, pa.int64()),
        }
    )


def conv_facts(ds, *, num_buckets: int = 32):
    """Per-conversation facts: n_turns, start/end ts, duration, distinct
    tools."""
    return map_conv_buckets(ds, conv_facts_kernel, num_buckets=num_buckets)


def dataset_facts(ds) -> dict:
    """Global dataset facts (the reference's __str__ aggregate,
    TrajectoryDF.py:333-341): turn count, conversation count, time range.

    The distinct-conversation count is a partial aggregate (per-block
    distinct → per-bucket nunique → tiny sum), NOT ``ds.unique()`` —
    unique() ships the full distinct value list to the driver, which at
    100 TB scale is billions of ids."""
    from ray.data.aggregate import Count, Max, Min

    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    row = ds.aggregate(Count(), Min(TS), Max(TS))

    def block_distinct(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({CONV_ID: pc.unique(t[CONV_ID])})

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [df[CONV_ID].nunique()]})

    partial = ds.select_columns([CONV_ID]).map_batches(
        block_distinct, batch_format="pyarrow", batch_size=1 << 20
    )
    counts = grouped_agg_by_bucket(partial, CONV_ID, bucket_count, num_buckets=16)
    n_convs = int(sum(r["n"] for r in counts.take_all()))
    return {
        "n_turns": row["count()"],
        "min_ts": row[f"min({TS})"],
        "max_ts": row[f"max({TS})"],
        "n_convs": n_convs,
    }


def conv_sums_kernel(table: pa.Table) -> pa.Table:
    """Bucket kernel: per-conversation path-length sums
    (get_distance_travelled_by_traj_id analog, nansum semantics —
    ptrail/features/kinematic_features.py:763-802): total absolute
    text-length change, total inter-turn seconds, total characters."""
    from ptrail_ray.stages.kernels import KernelContext

    ctx = KernelContext(table)
    starts, lengths = ctx.starts, ctx.lengths
    conv_ids = table[CONV_ID].take(pa.array(starts))
    grp = np.repeat(np.arange(len(starts)), lengths)

    dl = np.abs(ctx.get("delta_len"))
    dt = ctx.get("delta_t")
    m1 = np.asarray(
        ctx.get("m1").to_numpy(zero_copy_only=False)
        if hasattr(ctx.get("m1"), "to_numpy")
        else ctx.get("m1"),
        dtype=np.float64,
    )
    out = {
        CONV_ID: conv_ids,
        "path_len": pa.array(
            np.bincount(grp, weights=np.nan_to_num(dl), minlength=len(starts))
        ),
        "active_s": pa.array(
            # exact µs-integer sum (order-independent — see GRANULAR_SCALE)
            np.bincount(
                grp,
                weights=np.where(np.isnan(dt), 0.0, np.rint(dt * 1e6)),
                minlength=len(starts),
            )
            / 1e6
        ),
        "total_chars": pa.array(
            np.bincount(grp, weights=m1, minlength=len(starts)).astype(np.int64)
        ),
    }
    return pa.table(out)


def conv_sums(ds, *, num_buckets: int = 32):
    """Per-conversation nansum aggregates over the lag-1 deltas."""
    return map_conv_buckets(ds, conv_sums_kernel, num_buckets=num_buckets)


def hopping_agg_kernel(
    table: pa.Table, *, width_s: float, hop_s: float
) -> pa.Table:
    """Hopping (sliding) event-time windows: window length ``width_s``,
    advancing every ``hop_s`` (width must be an integer multiple of
    hop). Every turn lands in width/hop windows; aggregation happens
    INSIDE the existing conv-bucket exchange — the explode is local to
    the bucket task, so the sliding windows add NO extra shuffle (the
    streaming-window custom operator from the build brief, alongside
    the tumbling q_tumbling and rolling q_rolling variants).

    Emits one row per (conv_id, window_start): n_turns, mean_m1."""
    r = int(round(width_s / hop_s))
    if abs(r * hop_s - width_s) > 1e-9 or r < 1:
        raise ValueError("width_s must be a positive integer multiple of hop_s")
    hop_us = np.int64(int(hop_s * 1e6))

    ts_us = table[TS]
    if pa.types.is_timestamp(ts_us.type) and ts_us.type.unit != "us":
        import pyarrow.compute as pc

        ts_us = pc.cast(ts_us, pa.timestamp("us"))
    t = ts_us.to_numpy(zero_copy_only=False).view("int64")
    import pyarrow.compute as pc

    m1 = (
        pc.coalesce(
            pc.cast(pc.utf8_length(table[TEXT]), pa.int64()),
            pa.scalar(0, pa.int64()),
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    conv = table[CONV_ID].to_numpy(zero_copy_only=False)

    base = (t // hop_us) * hop_us  # aligned window containing each turn
    n = len(t)
    j = np.repeat(np.arange(r, dtype=np.int64), n)
    ws = np.tile(base, r) - j * hop_us
    df = pd.DataFrame(
        {CONV_ID: np.tile(conv, r), "window_start_us": ws, "m1": np.tile(m1, r)}
    )
    g = df.groupby([CONV_ID, "window_start_us"], sort=False, observed=True)["m1"]
    out = g.agg(["size", "mean"]).reset_index()
    return pa.table(
        {
            CONV_ID: pa.array(out[CONV_ID], pa.string()),
            "window_start_us": pa.array(out["window_start_us"], pa.int64()),
            "n_turns": pa.array(out["size"].to_numpy().astype(np.int64)),
            "mean_m1": pa.array(out["mean"], pa.float64()),
        }
    )


def hopping_agg(ds, *, width_s: float, hop_s: float, num_buckets: int = 32):
    """Dataset-level hopping-window aggregates (one exchange)."""
    return map_conv_buckets(
        ds,
        lambda t: hopping_agg_kernel(t, width_s=width_s, hop_s=hop_s),
        num_buckets=num_buckets,
    )


def _date_str(d) -> str:
    return str(d)[:10]


def path_sum_by_date_and_conv(ds, conv_id: str, date: str | None = None):
    """Total path length of ONE conversation on ONE calendar date —
    ``distance_travelled_by_date_and_traj_id`` analog
    (ptrail/features/kinematic_features.py:276-326). The reference
    filters FIRST and then recomputes consecutive distances inside the
    filtered frame (so a turn whose predecessor fell on another date
    contributes 0, matching its ``distances[0] = 0``); this composition
    does the same: filter_by_conv_id ∘ date filter → per-run |Δm1| sum.

    ``date`` defaults to the conversation's first active date. The
    filtered slice of one conversation is small by construction, so the
    delta computation runs in a single final task."""
    from ptrail_ray.stages.filters import filter_by_conv_id

    sub = filter_by_conv_id(ds, conv_id)

    def day_of(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = pc.cast(pc.floor_temporal(t[TS], unit="day"), pa.date32())
        return t.append_column("_date", d)

    sub = sub.map_batches(day_of, batch_format="pyarrow", batch_size=None)
    if date is None:
        from ray.data.aggregate import Min

        date = sub.aggregate(Min("_date"))["min(_date)"]

    from ptrail_ray.stages.bucket import sort_bucket

    def path_sum(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = sort_bucket(t)
        if "m1" in t.column_names:
            m1 = t["m1"].to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            m1 = (
                pc.cast(
                    pc.coalesce(pc.utf8_length(t["text"]), pa.scalar(0, pa.int32())),
                    pa.int64(),
                )
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
        dl = np.abs(np.diff(m1)) if len(m1) > 1 else np.array([], np.float64)
        return pa.table(
            {
                CONV_ID: pa.array([conv_id], pa.string()),
                "date_str": pa.array([_date_str(date)], pa.string()),
                "path_len": pa.array([float(dl.sum())], pa.float64()),
            }
        )

    # one conversation × one date is small by construction — collapse to
    # a single block so the delta chain sees the whole slice
    import datetime as _dt

    target = (
        date
        if isinstance(date, _dt.date)
        else _dt.date.fromisoformat(str(date))
    )

    def day_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.fill_null(pc.equal(t["_date"], pa.scalar(target, pa.date32())), False)
        )

    day = sub.map_batches(
        day_filter, batch_format="pyarrow", batch_size=None
    ).repartition(1)
    return day.map_batches(path_sum, batch_size=None, batch_format="pyarrow")


def topk_per_conv(ds, *, col: str, k: int = 3, num_buckets: int = 32):
    """Per-conversation top-k rows by ``col`` (desc, ties by turn_idx
    asc) with a row-number rank (ties broken by turn_idx asc) — grouped
    top-k without a global sort: one
    conv-bucket exchange, then a vectorized lexsort + position-in-run
    rank per bucket (no per-group Python)."""
    from ptrail_ray.stages.bucket import conv_runs, map_conv_buckets

    def kern(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("rank", pa.array([], pa.int64()))
        starts, lengths = conv_runs(t[CONV_ID])
        run_id = np.repeat(np.arange(len(starts), dtype=np.int64), lengths)
        v = t[col].to_numpy(zero_copy_only=False)
        turn = t[TURN_IDX].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((turn, -v, run_id))
        rid_o = run_id[order]
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = rid_o[1:] != rid_o[:-1]
        run_start_pos = np.flatnonzero(first)
        grp = np.cumsum(first) - 1
        rank = np.arange(n, dtype=np.int64) - run_start_pos[grp] + 1
        keep = rank <= k
        out = t.take(pa.array(order[keep], type=pa.int64()))
        return out.append_column("rank", pa.array(rank[keep], type=pa.int64()))

    return map_conv_buckets(ds, kern, num_buckets=num_buckets)


def group_zscore_kernel(
    table: pa.Table, *, value_col: str, out_col: str
) -> pa.Table:
    """Per-conversation z-score normalization of an integer measure:
    z = (x − mean) / std_pop over the conversation, NULL when the
    conversation is constant (std 0).

    The classic feature-normalization transform (the reference has no
    normalizer; its closest analog is the per-trajectory stats pivot,
    ``ptrail/preprocessing/statistics.py:65-202``, which aggregates but
    never maps back to rows). Group sums use EXACT int64 arithmetic
    (m1 is an integer measure), so mean/var are order-independent and
    the single float expression below is bit-equal to the DuckDB
    replica in `entry_queries.q_group_zscore` — no quantization needed.
    Runs inside conv-contiguous buckets: one reduceat per bucket, no
    extra shuffle, rows map back via np.repeat (vectorized broadcast).
    """
    starts, lengths = conv_runs(table[CONV_ID])
    v = table[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(v) == 0:
        return table.append_column(out_col, pa.array([], pa.float64()))
    s = np.add.reduceat(v, starts)
    s2 = np.add.reduceat(v * v, starts)
    n = lengths.astype(np.float64)
    # DuckDB expression order: CAST(s AS DOUBLE)/n, then s2/n - mean*mean
    mean = s.astype(np.float64) / n
    var = s2.astype(np.float64) / n - mean * mean
    mean_row = np.repeat(mean, lengths)
    var_row = np.repeat(var, lengths)
    with np.errstate(invalid="ignore", divide="ignore"):
        z = np.where(
            var_row > 0.0,
            (v.astype(np.float64) - mean_row) / np.sqrt(var_row),
            np.nan,
        )
    return table.append_column(out_col, pa.array(z, pa.float64()))


def group_zscore(
    ds, *, value_col: str = "m1", out_col: str = "z_m1", num_buckets: int = 32
):
    """Distributed per-group z-score over the engine's single conv
    exchange (see `group_zscore_kernel`)."""
    import functools

    return map_conv_buckets(
        ds,
        functools.partial(group_zscore_kernel, value_col=value_col, out_col=out_col),
        num_buckets=num_buckets,
    )


def robust_scale_kernel(
    table: pa.Table, *, value_col: str, out_col: str
) -> pa.Table:
    """Per-conversation robust scaling: (x − median) / IQR, NULL when
    the IQR is 0 — the outlier-insensitive sibling of `group_zscore`
    (median/quantiles instead of mean/std; the reference's Hampel
    filter, ptrail/preprocessing/filters.py:196-230, is built on the
    same median-centering idea but never maps a normalized value back).

    Quantiles interpolate with DuckDB ``quantile_cont``'s operand order
    (``lo*(1-frac) + hi*frac`` — same contract as `_describe_runs`), so
    the single float expression is bit-equal to the SQL replica in
    `entry_queries.q_robust_scale`. Vectorized across all runs: one
    lexsort + index arithmetic, rows map back via np.repeat.
    """
    starts, lengths = conv_runs(table[CONV_ID])
    v = table[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    if len(v) == 0:
        return table.append_column(out_col, pa.array([], pa.float64()))
    n_runs = len(starts)
    grp = np.repeat(np.arange(n_runs), lengths)
    order = np.lexsort((v, grp))
    vs = v[order]

    def quantile(q: float) -> np.ndarray:
        k = q * (lengths - 1)
        lo = np.floor(k).astype(np.int64)
        hi = np.ceil(k).astype(np.int64)
        frac = k - lo
        vlo = vs[starts + lo]
        vhi = vs[starts + hi]
        # DuckDB CastInterpolation::Interpolate operand order
        return vlo * (1.0 - frac) + vhi * frac

    med, q25, q75 = quantile(0.5), quantile(0.25), quantile(0.75)
    iqr = q75 - q25
    med_row = np.repeat(med, lengths)
    iqr_row = np.repeat(iqr, lengths)
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.where(iqr_row > 0.0, (v - med_row) / iqr_row, np.nan)
    return table.append_column(out_col, pa.array(r, pa.float64()))


def robust_scale(
    ds, *, value_col: str = "m1", out_col: str = "robust_m1", num_buckets: int = 32
):
    """Distributed per-group robust scaling over the engine's single
    conv exchange (see `robust_scale_kernel`)."""
    import functools

    return map_conv_buckets(
        ds,
        functools.partial(robust_scale_kernel, value_col=value_col, out_col=out_col),
        num_buckets=num_buckets,
    )


def rate_spikes(
    ds,
    *,
    ts_col: str,
    group_col: str,
    window_us: int = 3_600_000_000,
    z_threshold: float = 2.0,
    max_cells: int = 1_000_000,
):
    """Event-rate spike detection: tumbling-window counts per group,
    flagged where the count's z-score vs the group's own window
    history exceeds ``z_threshold`` (the ops/monitoring shape of a
    streaming pipeline, run batch).

    Scale shape: per-batch partial counts over (group, window) —
    bounded by the batch's distinct cells — then a driver merge that
    is bounded by the (group × time-window) CATALOG, which grows with
    span and group count, not data volume (LOUD ``max_cells`` guard).
    The z-score is computed from integer sums in arbitrary-precision
    Python ints (S=Σn, Q=Σn², C=#windows), so
    z = (n·C − S) / sqrt(Q·C − S²) is one int→double conversion and
    one IEEE sqrt/divide — bit-identical to the HUGEINT SQL replica,
    overflow-free at any scale.

    Returns a driver-side pandas DataFrame
    (group, win, n, z, is_spike) — catalog-sized by construction.
    """
    import math

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        win = ts.astype(np.int64) // np.int64(window_us)
        if len(win) and (win.min() < 0 or win.max() >= (1 << 40)):
            raise ValueError(
                f"rate_spikes: window index out of the packed-key domain "
                f"[0, 2^40) — min={win.min()} max={win.max()}; pre-1970 or "
                f"absurd-future timestamps need a different composite key"
            )
        # Arrow dictionary_encode is C-speed vs np.unique over a
        # python-object string array (measured 6.9 s → sub-second per
        # 10M-event batch set at stress scale)
        enc = t[group_col].combine_chunks().dictionary_encode()
        g_keys = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        g_inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        comp = (g_inv << 40) | win
        keys, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        return pa.table(
            {
                "group": pa.array(g_keys[keys >> 40], pa.string()),
                "win": pa.array(keys & ((1 << 40) - 1), pa.int64()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=1 << 20
    ).to_pandas()
    cells = parts.groupby(["group", "win"], as_index=False)["n"].sum()
    if len(cells) > max_cells:
        raise RuntimeError(
            f"rate_spikes: {len(cells)} (group, window) cells exceeds "
            f"max_cells={max_cells} — widen window_us or aggregate by bucket"
        )
    out_rows = []
    for g, sub in cells.groupby("group", sort=False):
        ns = [int(x) for x in sub["n"]]
        C = len(ns)
        S = sum(ns)
        Q = sum(x * x for x in ns)
        den2 = Q * C - S * S  # exact (Python int)
        den = math.sqrt(float(den2)) if den2 > 0 else 0.0
        for w, n in zip(sub["win"], ns):
            if den > 0.0:
                z = float(n * C - S) / den
                out_rows.append((g, int(w), n, z, z > z_threshold))
            else:
                out_rows.append((g, int(w), n, np.nan, False))
    return pd.DataFrame(out_rows, columns=["group", "win", "n", "z", "is_spike"])


def cohort_retention(
    ds,
    *,
    ts_col: str,
    user_col: str,
    period_us: int = 604_800_000_000,
    num_buckets: int = 64,
):
    """Cohort retention matrix: users grouped by first-seen period
    (cohort), counted once per (cohort, age) cell they were active in
    — the product-analytics shape of a training-telemetry pipeline.

    ONE user-keyed exchange (`grouped_agg_by_bucket`): every user's
    rows land in one bucket, where a vectorized kernel takes the
    user's min period (cohort), dedups their (user, period) pairs,
    and emits per-cell partial counts. The driver merge is bounded by
    the (cohort × age) CATALOG — weeks², independent of user count or
    data volume. Returns a Ray Dataset of
    (cohort_period, age_periods, active_users)."""
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        wk = (
            df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
            // np.int64(period_us)
        )
        sub = pd.DataFrame({"u": df[user_col].to_numpy(), "wk": wk})
        cw = sub.groupby("u", sort=False)["wk"].transform("min")
        sub["cohort"] = cw
        sub["age"] = sub["wk"] - cw
        cells = sub.drop_duplicates(["u", "wk"]).groupby(
            ["cohort", "age"], as_index=False, sort=False
        )["u"].size()
        return pd.DataFrame(
            {
                "cohort_period": cells["cohort"].to_numpy(np.int64),
                "age_periods": cells["age"].to_numpy(np.int64),
                "active_users": cells["size"].to_numpy(np.int64),
            }
        )

    parts = grouped_agg_by_bucket(
        ds, user_col, per_bucket, num_buckets=num_buckets
    ).to_pandas()
    out = parts.groupby(["cohort_period", "age_periods"], as_index=False)[
        "active_users"
    ].sum()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def max_streaks(
    ds,
    *,
    ts_col: str,
    user_col: str,
    period_us: int = 86_400_000_000,
    num_buckets: int = 64,
):
    """Longest consecutive-period activity streak per user (the
    gaps-and-islands shape): dedup (user, period), then the longest
    run of consecutive periods. ONE user-keyed exchange; per bucket a
    single lexsort + run-boundary scan handles every user at once —
    no per-user Python. Returns a Ray Dataset
    (user_id, max_streak)."""
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], t.schema.field(user_col).type),
                    "max_streak": pa.array([], pa.int64()),
                }
            )
        d = (
            t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64) // np.int64(period_us)
        u = t[user_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        us, dsrt = u[order], d[order]
        # distinct (user, period) rows in sorted order
        first = np.r_[True, (us[1:] != us[:-1]) | (dsrt[1:] != dsrt[:-1])]
        us, dsrt = us[first], dsrt[first]
        # island start = new user OR non-consecutive period
        new_user = np.r_[True, us[1:] != us[:-1]]
        isl_start = new_user | np.r_[True, dsrt[1:] != dsrt[:-1] + 1]
        isl_id = np.cumsum(isl_start) - 1
        isl_len = np.bincount(isl_id)
        # max island length per user: maximum.reduceat over the user's islands
        isl_user_idx = np.flatnonzero(isl_start)  # first row of each island
        user_starts_isl = np.flatnonzero(new_user[isl_user_idx])
        mx = np.maximum.reduceat(isl_len, user_starts_isl)
        return pa.table(
            {
                "user_id": pa.array(us[np.flatnonzero(new_user)]),
                "max_streak": pa.array(mx.astype(np.int64), pa.int64()),
            }
        )

    return grouped_agg_by_bucket(
        ds, user_col, per_bucket, num_buckets=num_buckets, group_format="pyarrow"
    )


def rollup_agg(
    ds,
    keys: "list[str]",
    sum_col: str,
    *,
    count_name: str = "n_rows",
    sum_name: str = "total",
):
    """SQL ``GROUP BY ROLLUP(keys...)`` — every prefix level of the key
    hierarchy plus the grand total, rolled-up columns emitted as NULL
    (DuckDB ROLLUP semantics; the multi-level OLAP summary the
    reference's per-trajectory/whole-dataset stat split approximates,
    ``statistics.py:65-202`` + ``kinematic_features.py:805-850``).

    Scale shape: ONE narrow pass of bounded per-batch partials (pandas
    groupby inside map_batches — partial size ≤ key-domain product,
    not rows), then a driver merge over those bounded partials; the
    coarser levels are derived from the finest level without touching
    the data again. Nothing about it is row-cardinality-bound, so it
    holds at 100 TB provided the key domain stays small (the same
    loud assumption every bounded-partial stage in this engine makes).

    Exact integer sums only (int64) — no float partial-order issues.
    """
    ks = list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    **{k: pd.Series([], dtype=object) for k in ks},
                    count_name: pd.Series([], dtype="int64"),
                    sum_name: pd.Series([], dtype="int64"),
                }
            )
        g = df.groupby(ks, as_index=False, sort=False, dropna=False).agg(
            **{
                count_name: (sum_col, "size"),
                sum_name: (sum_col, "sum"),
            }
        )
        g[count_name] = g[count_name].astype("int64")
        g[sum_name] = g[sum_name].astype("int64")
        return g

    parts = ds.map_batches(
        partial, batch_format="pandas", batch_size=1 << 20
    ).to_pandas()  # bounded by key-domain cardinality × partial count
    fine = parts.groupby(ks, as_index=False, dropna=False)[
        [count_name, sum_name]
    ].sum()

    frames = [fine]
    for lvl in range(len(ks) - 1, -1, -1):
        if lvl == 0:
            g = pd.DataFrame(
                {
                    count_name: [fine[count_name].sum()],
                    sum_name: [fine[sum_name].sum()],
                }
            )
        else:
            g = fine.groupby(ks[:lvl], as_index=False, dropna=False)[
                [count_name, sum_name]
            ].sum()
        for rolled in ks[lvl:]:
            g[rolled] = None
        frames.append(g[ks + [count_name, sum_name]])
    out = pd.concat(frames, ignore_index=True)
    schema = pa.schema(
        [(k, pa.string()) for k in ks]
        + [(count_name, pa.int64()), (sum_name, pa.int64())]
    )
    return pa.Table.from_pandas(out, schema=schema, preserve_index=False)


def rolling_active_users(
    ds,
    *,
    ts_col: str,
    user_col: str,
    window_days: int = 7,
    num_buckets: int = 64,
):
    """Rolling W-day distinct active users per calendar day (the
    DAU/WAU telemetry shape): for each day present in the data, the
    count of distinct users active in [day−W+1, day].

    Windowed COUNT(DISTINCT) does not decompose into per-window
    partials, but it DOES decompose over users: a user contributes +1
    to window-end d iff any of their active days lies in [d−W+1, d].
    So: per-batch distinct-(user, day) partials (narrow ints — raw
    events never shuffle), ONE user-keyed exchange, and per bucket a
    vectorized kernel that dedups the user's days globally, expands
    each day to its ≤W covering window-ends, dedups (user, window-end)
    and emits per-window-end partial counts — bounded by
    (#days + W) rows per bucket. Day-present markers ride along so the
    driver (merge bounded by the day catalog) can drop window-ends
    that fall on days with no activity, matching the SQL contract.

    Packed-key domain: day must fit 20 bits (< year 4840) and user_id
    43 bits — both guarded loudly. Returns a driver-side pandas
    DataFrame (day:str 'YYYY-MM-DD', n_active:int64)."""
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    W = int(window_days)
    DAY_US = np.int64(86_400_000_000)

    def _pack_check(user: np.ndarray, day: np.ndarray) -> np.ndarray:
        # headroom includes +W: the expanded window-ends day..day+W−1
        # must also fit the 20-bit field or they'd bleed into user bits
        if len(day) and (day.min() < 0 or day.max() + W >= (1 << 20)):
            raise ValueError(
                f"rolling_active_users: epoch-day (+window {W}) outside "
                f"[0, 2^20) — min={day.min()} max={day.max()}"
            )
        if len(user) and (user.min() < 0 or user.max() >= (1 << 43)):
            raise ValueError(
                f"rolling_active_users: user_id outside [0, 2^43) — "
                f"packed (user<<20|day) key would corrupt"
            )
        return (user << np.int64(20)) | day

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        day = ts.astype(np.int64) // DAY_US
        user = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.unique(_pack_check(user, day))
        return pa.table(
            {
                "user_id": pa.array(keys >> np.int64(20), pa.int64()),
                "day": pa.array(keys & np.int64((1 << 20) - 1), pa.int64()),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "wend": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "is_day_marker": pa.array([], pa.bool_()),
                }
            )
        user = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        keys = np.unique(_pack_check(user, day))  # global (user, day) dedup
        u = keys >> np.int64(20)
        d = keys & np.int64((1 << 20) - 1)
        days_present = np.unique(d)
        # expand each active day to its W covering window-ends, then
        # dedup (user, wend): a user with several active days inside
        # one window still counts once
        wend = (d[:, None] + np.arange(W, dtype=np.int64)[None, :]).ravel()
        uu = np.repeat(u, W)
        uw = np.unique((uu << np.int64(20)) | wend)
        wends, cnt = np.unique(uw & np.int64((1 << 20) - 1), return_counts=True)
        return pa.table(
            {
                "wend": pa.array(
                    np.concatenate([wends, days_present]), pa.int64()
                ),
                "n": pa.array(
                    np.concatenate(
                        [cnt.astype(np.int64), np.zeros(len(days_present), np.int64)]
                    ),
                    pa.int64(),
                ),
                "is_day_marker": pa.array(
                    np.r_[
                        np.zeros(len(wends), bool), np.ones(len(days_present), bool)
                    ],
                    pa.bool_(),
                ),
            }
        )

    parts = grouped_agg_by_bucket(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=1 << 20),
        "user_id",
        per_bucket,
        num_buckets=num_buckets,
        partial_batch=None,  # input is already many small partial blocks
        group_format="pyarrow",
    ).to_pandas()
    days = np.unique(parts.loc[parts["is_day_marker"], "wend"].to_numpy())
    counts = (
        parts.loc[~parts["is_day_marker"]]
        .groupby("wend", as_index=False)["n"]
        .sum()
    )
    out = counts[counts["wend"].isin(days)].sort_values("wend")
    return pd.DataFrame(
        {
            "day": pd.to_datetime(
                out["wend"].to_numpy(np.int64) * 86400, unit="s"
            ).strftime("%Y-%m-%d"),
            "n_active": out["n"].to_numpy(np.int64),
        }
    )


def first_touch(
    ds,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 64,
):
    """First-touch attribution: for every (user, event_type), the
    user's FIRST such event (min ts, ties by event id) with its value —
    the marketing/telemetry attribution shape, and an argmin-per-group
    that decomposes perfectly: argmin(batch argmins) = global argmin.

    Per-batch partials shrink each batch to ≤ |users×types in batch|
    rows BEFORE the exchange (raw events never shuffle), then one
    user-keyed exchange re-runs the same vectorized sort+first kernel
    per bucket. Returns a Dataset
    (user_id, event_type, first_ts, first_event_id, first_value)."""
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    cols = [user_col, type_col, ts_col, id_col, value_col]

    def firsts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(
            [user_col, type_col, ts_col, id_col], kind="stable"
        ).drop_duplicates([user_col, type_col], keep="first")
        return out[cols]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return firsts(df)

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=1 << 20)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = firsts(df)
        return out.rename(
            columns={
                ts_col: "first_ts",
                id_col: "first_event_id",
                value_col: "first_value",
            }
        )

    return grouped_agg_by_bucket(
        parts, user_col, per_bucket, num_buckets=num_buckets, partial_batch=None
    )


def max_concurrency(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    duration_us: int = 300_000_000,
    num_buckets: int = 64,
):
    """Max simultaneously-open intervals per user (interval stabbing /
    sweep line): each event opens [ts, ts + duration); the answer is
    the peak of the +1/−1 delta prefix sum — the concurrent-sessions /
    overlapping-spans shape. Closers sort BEFORE openers at equal time
    (half-open intervals: an interval ending exactly when another
    starts does not overlap it).

    Concurrency is a global property of a user's whole timeline, so
    the (narrow: two int64 columns) points take ONE user-keyed
    exchange; per bucket a single lexsort + cumsum + per-run peak
    handles every user at once. Returns a Dataset
    (user_id, max_concurrent)."""
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def points(t: pa.Table) -> pa.Table:
        ts = (
            t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64)
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                user_col: pa.array(np.concatenate([u, u]), pa.int64()),
                "_t": pa.array(
                    np.concatenate([ts, ts + np.int64(duration_us)]), pa.int64()
                ),
                "_d": pa.array(
                    np.concatenate(
                        [np.ones(len(u), np.int64), -np.ones(len(u), np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "max_concurrent": pa.array([], pa.int64()),
                }
            )
        u = t[user_col].to_numpy(zero_copy_only=False)
        tt = t["_t"].to_numpy(zero_copy_only=False)
        d = t["_d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, tt, u))  # closers (−1) before openers at ties
        us, ds_, = u[order], d[order]
        cs = np.cumsum(ds_)
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        lengths = np.diff(np.r_[starts, len(us)])
        # rebase each run to the prefix sum just before it (0 for the
        # first; in fact every base is 0 here — each user's ±1 deltas
        # cancel — but the general form costs nothing)
        base_vals = np.r_[np.int64(0), cs[starts[1:] - 1]]
        reb = cs - np.repeat(base_vals, lengths)
        mx = np.maximum.reduceat(reb, starts)
        return pa.table(
            {
                user_col: pa.array(us[starts], pa.int64()),
                "max_concurrent": pa.array(mx.astype(np.int64), pa.int64()),
            }
        )

    pts = ds.map_batches(points, batch_format="pyarrow", batch_size=1 << 20)
    return grouped_agg_by_bucket(
        pts, user_col, per_bucket, num_buckets=num_buckets,
        partial_batch=None, group_format="pyarrow",
    )


def pairwise_trend_kernel(
    table: pa.Table, *, value_col: str, max_run: int = 4096
) -> pa.Table:
    """Per-conversation pairwise order statistics of ``value_col`` taken
    in bucket (time) order — the robust-trend family the reference's
    per-trajectory rate-of-change summaries approximate with finite
    differences (ptrail/features/kinematic_features.py), computed
    exactly over ALL ordered pairs (i < j):

    - ``mk_s``     Mann–Kendall S = Σ sign(y_j − y_i)  (pure int64)
    - ``n_pairs``  n(n−1)/2, ``n_ties`` = tied pairs   (pure int64)
    - ``tau``      tau-b vs time = S / sqrt(n0 · (n0 − T)) — the time
                   axis has no ties, so T_x = 0; ONE sqrt + ONE division
    - ``ts_slope`` Theil–Sen slope = quantile_cont-median of the n0
                   pairwise slopes (y_j − y_i)/(j − i), DuckDB operand
                   order (lo·(1−frac) + hi·frac)

    Vectorized across runs GROUPED BY RUN LENGTH: all conversations of
    length L in the bucket are stacked into an (R, L) matrix and their
    n0 = L(L−1)/2 pairwise diffs computed in one fancy-indexed subtract
    (chunked so R·n0 stays ≤ ~4M cells). No per-conversation Python
    loop — the loop is over DISTINCT lengths.

    O(L²) work per conversation is inherent to the exact statistics;
    the loud ``max_run`` guard (default 4096 → ≤ 8.4M pairs) bounds it
    — split pathological conversations upstream (stages/split.py)
    rather than silently truncating.
    """
    starts, lengths = conv_runs(table[CONV_ID])
    n_runs = len(starts)
    if n_runs == 0:
        return pa.table(
            {
                CONV_ID: pa.array([], pa.string()),
                "mk_s": pa.array([], pa.int64()),
                "n_pairs": pa.array([], pa.int64()),
                "n_ties": pa.array([], pa.int64()),
                "tau": pa.array([], pa.float64()),
                "ts_slope": pa.array([], pa.float64()),
            }
        )
    if int(lengths.max()) > max_run:
        raise ValueError(
            f"pairwise_trend_kernel: run of {int(lengths.max())} rows "
            f"exceeds max_run={max_run} (O(L²) pairwise stage); split "
            "giant conversations upstream (stages/split.py)"
        )
    y = table[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    starts = starts.astype(np.int64)
    lengths = lengths.astype(np.int64)

    mk_s = np.zeros(n_runs, dtype=np.int64)
    ties = np.zeros(n_runs, dtype=np.int64)
    slope = np.full(n_runs, np.nan, dtype=np.float64)
    for L in np.unique(lengths):
        L = int(L)
        if L < 2:
            continue
        which = np.flatnonzero(lengths == L)
        iu, ju = np.triu_indices(L, 1)
        n0 = L * (L - 1) // 2
        dx = (ju - iu).astype(np.float64)
        k = 0.5 * (n0 - 1)
        lo = int(np.floor(k))
        hi = int(np.ceil(k))
        frac = k - lo
        step = max(1, (4 << 20) // n0)
        for c0 in range(0, len(which), step):
            w = which[c0 : c0 + step]
            seg = y[starts[w][:, None] + np.arange(L)[None, :]]
            d = seg[:, ju] - seg[:, iu]
            mk_s[w] = np.sign(d).sum(axis=1)
            ties[w] = (d == 0).sum(axis=1)
            sl = d.astype(np.float64) / dx[None, :]
            sl.sort(axis=1)
            # DuckDB CastInterpolation operand order (see robust_scale)
            slope[w] = sl[:, lo] * (1.0 - frac) + sl[:, hi] * frac

    n_pairs = lengths * (lengths - 1) // 2
    den = n_pairs * (n_pairs - ties)
    with np.errstate(invalid="ignore", divide="ignore"):
        tau = np.where(
            den > 0,
            mk_s.astype(np.float64)
            / np.sqrt(n_pairs.astype(np.float64) * (n_pairs - ties).astype(np.float64)),
            np.nan,
        )
    conv = table[CONV_ID]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    conv = conv.take(pa.array(starts, pa.int64()))
    return pa.table(
        {
            CONV_ID: conv,
            "mk_s": pa.array(mk_s, pa.int64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
            "n_ties": pa.array(ties, pa.int64()),
            "tau": pa.array(tau, pa.float64(), mask=~(den > 0)),
            "ts_slope": pa.array(slope, pa.float64(), mask=lengths < 2),
        }
    )


def pairwise_trend(ds, *, value_col: str = "m1", num_buckets: int = 16):
    """Distributed Mann–Kendall / Theil–Sen over the engine's single
    conversation exchange (see `pairwise_trend_kernel`)."""
    import functools

    return map_conv_buckets(
        ds,
        functools.partial(pairwise_trend_kernel, value_col=value_col),
        num_buckets=num_buckets,
    )


def spearman_kernel(
    table: pa.Table, *, max_run: int = 2048
) -> pa.Table:
    """Per-conversation Spearman rank correlation between message
    length (m1) and elapsed time since the conversation start — the
    rank-based drift diagnostic (do messages get longer as the
    conversation ages, monotonically, regardless of scale).

    Exactness: tie-averaged ranks are rationals with denominator 2, so
    both axes use r2 = 2·avg_rank = 2·tie_group_start + tie_len − 1
    (pure int64); the five correlation moments are exact int64 sums
    and rho is ONE division of a float product/sqrt in the same
    operand order as the SQL replica. ``max_run`` 2048 keeps
    n·Σr² < 2⁵³ so the HUGEINT→DOUBLE casts on the SQL side are
    exact too. Ties in BOTH variables are handled; zero-variance
    series (all-tied) → NULL."""
    starts, lengths = conv_runs(table[CONV_ID])
    n_runs = len(starts)
    empty = pa.table(
        {
            CONV_ID: pa.array([], pa.string()),
            "spearman": pa.array([], pa.float64()),
        }
    )
    if n_runs == 0:
        return empty
    if int(lengths.max()) > max_run:
        raise ValueError(
            f"spearman_kernel: run of {int(lengths.max())} rows exceeds "
            f"max_run={max_run} (exact-int headroom bound); split giant "
            "conversations upstream (stages/split.py)"
        )
    starts = starts.astype(np.int64)
    lengths = lengths.astype(np.int64)
    n = table.num_rows
    grp = np.repeat(np.arange(n_runs, dtype=np.int64), lengths)
    run_start_row = np.repeat(starts, lengths)

    m1 = table["m1"].to_numpy(zero_copy_only=False).astype(np.int64)
    col = table[TS]
    if pa.types.is_timestamp(col.type) and col.type.unit != "us":
        import pyarrow.compute as _pc

        col = _pc.cast(col, pa.timestamp("us"))
    ts = col.to_numpy(zero_copy_only=False).view("int64")
    elapsed = ts - ts[run_start_row]

    def rank2(v: np.ndarray) -> np.ndarray:
        order = np.lexsort((v, grp))
        gs, vs = grp[order], v[order]
        pos = np.arange(n, dtype=np.int64) - run_start_row[order] + 1
        new_tie = np.r_[True, (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])]
        tie_id = np.cumsum(new_tie) - 1
        tie_start = pos[new_tie][tie_id]
        tie_len = np.bincount(tie_id).astype(np.int64)[tie_id]
        r2 = np.empty(n, dtype=np.int64)
        r2[order] = 2 * tie_start + tie_len - 1
        return r2

    x, y = rank2(m1), rank2(elapsed)
    L = lengths
    sx = np.add.reduceat(x, starts)
    sy = np.add.reduceat(y, starts)
    sxy = np.add.reduceat(x * y, starts)
    sxx = np.add.reduceat(x * x, starts)
    syy = np.add.reduceat(y * y, starts)
    d1 = L * sxx - sx * sx
    d2 = L * syy - sy * sy
    num = L * sxy - sx * sy
    bad = (d1 == 0) | (d2 == 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        rho = num.astype(np.float64) / np.sqrt(
            d1.astype(np.float64) * d2.astype(np.float64)
        )
    conv = table[CONV_ID]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    return pa.table(
        {
            CONV_ID: conv.take(pa.array(starts, pa.int64())),
            "spearman": pa.array(rho, pa.float64(), mask=bad),
        }
    )


def spearman(ds, *, num_buckets: int = 16):
    """Distributed per-conversation Spearman over the single conv
    exchange (see `spearman_kernel`)."""
    return map_conv_buckets(ds, spearman_kernel, num_buckets=num_buckets)
