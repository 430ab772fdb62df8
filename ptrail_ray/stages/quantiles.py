"""Exact distributed quantiles without materializing the column.

The reference's IQR outlier filters need Q1/Q3 of a feature over the
WHOLE dataset (``ptrail/preprocessing/filters.py:581-596,626-636`` —
pandas ``quantile`` = linear interpolation between order statistics).
Pulling the column to the driver is wrong at 10^12 rows, and sketches
(t-digest) are approximate — parity needs exact values.

Algorithm (sample → bracket → refine; 1 sample pass + 1 streaming
count/collect pass, both narrow):

1. sample ~``sample_size`` values uniformly per block → estimate a value
   bracket [lo, hi] around each requested quantile, widened by the
   sampling error bound;
2. one ``map_batches`` pass emits, per block: the count of non-NaN values
   below each bracket's lo, and the (few) values inside the bracket;
3. the exact order statistics k = (n-1)q land inside the bracket with
   overwhelming probability (checked; on miss the bracket is widened and
   the pass re-run) → exact linear-interpolated quantile from the
   collected values.

Collected in-bracket values are O(n/sqrt(sample_size)) — for 10^12 rows
and a 1M sample that's ~1e9/… still bounded by widening policy; at test
scale it is a few thousand floats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _linear_interp(sorted_vals: np.ndarray, k_float: float, offset: int) -> float:
    """pandas/numpy 'linear' quantile from values covering ranks
    [offset, offset+len)."""
    lo_rank = int(np.floor(k_float))
    hi_rank = int(np.ceil(k_float))
    frac = k_float - lo_rank
    lo_v = sorted_vals[lo_rank - offset]
    hi_v = sorted_vals[hi_rank - offset]
    return lo_v + (hi_v - lo_v) * frac


def exact_quantiles(
    ds, col: str, qs: list[float], *, sample_size: int = 65536, max_widen: int = 4
) -> list[float]:
    """Exact (linear-interpolation) quantiles of ``ds[col]``, NaN-skipped,
    computed in two streaming passes. Matches ``pandas.Series.quantile``.
    """
    proj = ds.select_columns([col])

    # pass 0: total non-NaN count + a uniform-ish sample (per-block head
    # after hash-free systematic stride — deterministic)
    def sample_block(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        stride = max(1, len(v) * 64 // max(1, sample_size))
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "sample": pa.array([v[::stride]], pa.list_(pa.float64())),
            }
        )

    parts = proj.map_batches(sample_block, batch_format="pyarrow", batch_size=None).take_all()
    n_total = int(sum(p["n"] for p in parts))
    if n_total == 0:
        return [float("nan")] * len(qs)
    sample = np.sort(np.concatenate([np.asarray(p["sample"]) for p in parts]))

    for attempt in range(max_widen + 1):
        # bracket each quantile using sample order statistics ± slack
        slack = max(3, int(len(sample) * 0.02 * (2**attempt)))
        brackets = []
        for q in qs:
            j = int(q * (len(sample) - 1))
            lo = sample[max(0, j - slack)]
            hi = sample[min(len(sample) - 1, j + slack)]
            if attempt == max_widen:
                lo, hi = -np.inf, np.inf
            brackets.append((lo, hi))
        lo_arr = np.array([b[0] for b in brackets])
        hi_arr = np.array([b[1] for b in brackets])

        def count_collect(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            below = [int((v < lo).sum()) for lo in lo_arr]
            inside = [v[(v >= lo) & (v <= hi)] for lo, hi in zip(lo_arr, hi_arr)]
            return pa.table(
                {
                    "below": pa.array([below], pa.list_(pa.int64())),
                    "inside": pa.array(
                        [[x.tolist() for x in inside]], pa.list_(pa.list_(pa.float64()))
                    ),
                }
            )

        rows = proj.map_batches(count_collect, batch_format="pyarrow", batch_size=None).take_all()
        below_tot = np.sum([r["below"] for r in rows], axis=0)
        out, ok = [], True
        for i, q in enumerate(qs):
            vals = np.sort(
                np.concatenate(
                    [np.asarray(r["inside"][i], dtype=np.float64) for r in rows]
                )
            )
            k = q * (n_total - 1)
            lo_rank, hi_rank = int(np.floor(k)), int(np.ceil(k))
            offset = int(below_tot[i])
            if lo_rank < offset or hi_rank >= offset + len(vals):
                ok = False
                break
            out.append(_linear_interp(vals, k, offset))
        if ok:
            return out
    raise RuntimeError("exact_quantiles failed to bracket")  # pragma: no cover


def grouped_exact_quantiles(
    ds,
    key_col: str,
    val_col: str,
    qs: list[float],
    *,
    num_buckets: int = 32,
    out_names: list[str] | None = None,
):
    """EXACT linear-interpolation quantiles per group, distributed.

    One key-hash exchange co-locates each group, then ONE vectorized
    kernel per bucket computes every group's quantiles simultaneously:
    lexsort by (group, value), per-run rank gather at floor/ceil of
    k = (n−1)·q, linear interp — no per-group Python. Matches
    ``quantile_cont`` / ``pandas.Series.quantile`` semantics.
    NaN values are excluded per group (groups that are all-NaN emit
    NULL quantiles).
    """
    import pyarrow.compute as pc

    from ptrail_ray.stages.bucket import conv_runs, map_conv_buckets

    names = out_names or [f"q{int(q * 100)}" for q in qs]

    def kern(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = {key_col: pa.array([], t.schema.field(key_col).type)}
        empty.update({nm: pa.array([], pa.float64()) for nm in names})
        if n == 0:
            return pa.table(empty)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # one row per group key: group runs on the bucket sorted by key
        kcol = t[key_col]
        starts, lengths = conv_runs(kcol)
        run_id = np.repeat(np.arange(len(starts), dtype=np.int64), lengths)
        nanmask = np.isnan(v)
        order = np.lexsort((nanmask, v, run_id))  # NaNs sort last per run
        v_sorted = v[order]
        valid = np.bincount(run_id[order], weights=~nanmask[order]).astype(np.int64)
        keys = pc.take(kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol,
                       pa.array(starts, pa.int64()))
        cols = {key_col: keys}
        for q, nm in zip(qs, names):
            out = np.full(len(starts), np.nan)
            has = valid > 0
            k = (valid[has] - 1) * q
            lo = np.floor(k).astype(np.int64)
            hi = np.ceil(k).astype(np.int64)
            base = starts[has]
            lo_v = v_sorted[base + lo]
            hi_v = v_sorted[base + hi]
            out[has] = lo_v + (hi_v - lo_v) * (k - lo)
            cols[nm] = pa.array(out, pa.float64())
        return pa.table(cols)

    return map_conv_buckets(
        ds,
        kern,
        num_buckets=num_buckets,
        key_col=key_col,
        sort_keys=(key_col,),
    )


def global_percent_rank(
    ds,
    *,
    value_col: str,
    out_col: str = "pct_rank",
    max_distinct: int = 5_000_000,
):
    """Global percent-rank transform (distributed ECDF): each row gets
    ``(#rows with strictly smaller value) / (N − 1)`` — SQL
    ``percent_rank() OVER (ORDER BY value)`` — without any global
    sort. The score-normalization step of a quality-filter pipeline.

    Two narrow passes, zero exchanges of row data:
      1. per-batch distinct-value count partials (np.unique) → driver
         merge, bounded by the value DOMAIN (loud ``max_distinct``
         guard — int-like feature domains, not row counts);
      2. a stateless broadcast map: searchsorted into the cumulative
         histogram. The division is one exact-int → float64 op,
         bit-identical to the SQL window function.

    ``value_col`` must be integer-typed (quantize floats upstream —
    the same contract as the exact-quantile refine pass)."""

    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        ftype = base.field(value_col).type
        if not pa.types.is_integer(ftype):
            raise TypeError(
                f"global_percent_rank: {value_col} must be integer-typed, "
                f"got {ftype} — quantize upstream"
            )

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        if not np.issubdtype(v.dtype, np.integer):  # backstop for pandas blocks
            raise TypeError(
                f"global_percent_rank: {value_col} must be integer-typed, "
                f"got {v.dtype} — quantize upstream"
            )
        keys, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "val": pa.array(keys.astype(np.int64), pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=1 << 20)
        .to_pandas()
        .groupby("val", sort=True, as_index=False)["cnt"]
        .sum()
    )
    if len(parts) > max_distinct:
        raise RuntimeError(
            f"global_percent_rank: {len(parts)} distinct values exceeds "
            f"max_distinct={max_distinct} — the broadcast histogram assumes "
            f"a bounded value domain"
        )
    vals = parts["val"].to_numpy(np.int64)
    cnts = parts["cnt"].to_numpy(np.int64)
    cum_less = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    n = int(cnts.sum())
    denom = float(n - 1) if n > 1 else 1.0

    def apply(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(vals, v)
        pct = cum_less[idx].astype(np.float64) / denom
        return t.append_column(out_col, pa.array(pct, pa.float64()))

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None)


def grouped_topk(
    ds,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int,
    max_groups: int = 100_000,
):
    """Top-k rows per group by value — SHUFFLE-FREE: each batch emits
    at most k candidate rows per batch-local group (argpartition), and
    the driver merge is bounded by k × groups × batches candidates,
    final output k × groups (loud ``max_groups`` guard). The "best
    exemplars per source/domain" selection of a curation pipeline —
    at any scale the full rows never move, only candidates.

    Ties break by ``id_col`` ascending (deterministic; matches
    ``row_number() OVER (ORDER BY value DESC, id)``). Returns a
    driver-side pandas DataFrame (group, id, value, rank)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([group_col, id_col, value_col])
        g = np.asarray(t[group_col].to_numpy(zero_copy_only=False), dtype=str)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        i = t[id_col].to_numpy(zero_copy_only=False)
        # one lexsort: (group asc, value desc, id asc); rank-within-run
        order = np.lexsort((i, -v, g))
        gs = g[order]
        starts = np.r_[0, np.flatnonzero(gs[1:] != gs[:-1]) + 1]
        lengths = np.diff(np.r_[starts, len(gs)])
        pos = np.arange(len(gs)) - np.repeat(starts, lengths)
        return t.take(pa.array(order[pos < k])).select(
            [group_col, id_col, value_col]
        )

    cand = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=1 << 20
    ).to_pandas()
    if cand[group_col].nunique() > max_groups:
        raise RuntimeError(
            f"grouped_topk: more than max_groups={max_groups} groups — the "
            f"driver merge assumes a bounded group catalog"
        )
    cand = cand.sort_values(
        [group_col, value_col, id_col], ascending=[True, False, True], kind="stable"
    )
    out = cand.groupby(group_col, sort=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby(group_col, sort=False).cumcount() + 1
    return out


def weighted_median(
    ds,
    *,
    value_col: str,
    weight_col: str,
    max_distinct: int = 5_000_000,
):
    """Exact lower weighted median: the smallest value v with
    cumulative weight(≤v) ≥ total/2 (integer compare ``2·cum ≥ tot``,
    no float). Token-weighted corpus medians are the data-curation
    use. Same scale shape as :func:`global_percent_rank`: per-batch
    (value → weight-sum) partials, domain-bounded driver merge (loud
    cap), no sort of row data. Returns ``(wmedian, total_w)`` as
    Python ints."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"weighted_median: {value_col} must be integer-typed"
            )
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(v, return_inverse=True)
        sums = np.zeros(len(keys), np.int64)
        np.add.at(sums, inv, w)
        return pa.table(
            {
                "val": pa.array(keys.astype(np.int64), pa.int64()),
                "w": pa.array(sums, pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=1 << 20)
        .to_pandas()
        .groupby("val", sort=True, as_index=False)["w"]
        .sum()
    )
    if len(parts) > max_distinct:
        raise RuntimeError(
            f"weighted_median: {len(parts)} distinct values exceeds "
            f"max_distinct={max_distinct}"
        )
    w = parts["w"].to_numpy(np.int64)
    tot = int(w.sum())
    cum = np.cumsum(w)
    idx = int(np.searchsorted(2 * cum, tot))  # first 2*cum >= tot
    return int(parts["val"].iloc[idx]), tot


def global_mad(ds, col: str):
    """Global robust scale: (median, MAD) of ``ds[col]`` — median
    absolute deviation needs TWO dependent exact-quantile passes (the
    second's input depends on the first's output), composed from
    :func:`exact_quantiles` with the median broadcast as a plain float
    into a narrow |x − med| projection. Four streaming passes total,
    nothing wide. Returns (median, mad) floats."""
    med = exact_quantiles(ds, col, [0.5])[0]

    def dev(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"_dev": pa.array(np.abs(v - med), pa.float64())})

    devs = ds.map_batches(dev, batch_format="pyarrow", batch_size=None)
    mad = exact_quantiles(devs, "_dev", [0.5])[0]
    return med, mad
