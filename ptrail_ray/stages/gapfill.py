"""Gap-fill: insert synthetic turns where inter-turn time exceeds a rate.

Analog of the reference's interpolation suite
(``ptrail/preprocessing/interpolation.py:31-375`` + kernels in
``preprocessing/helpers.py:44-348``): where ``delta_t > sampling_rate``,
insert ONE synthetic point per gap at ``ts_prev + sampling_rate`` whose
measures are interpolated from the surrounding turns — the same gap
predicate (strict ``>``, ``helpers.py:89-95``) and insertion time
(``helpers.py:74-95``: ``new_time[j-1] = t[j-1] + rate``) as the
reference's linear kernel.

Kernels (choose with ``method=``):

* ``linear`` — np.interp on (ts → measure), reference ``linear_help``
  (``helpers.py:44-102``);
* ``cubic`` — natural cubic spline (own numpy implementation; the
  reference uses scipy.interpolate.CubicSpline, ``helpers.py:105-168``);
* ``kinematic`` — position+velocity-consistent quadratic using the local
  rate, analog of the 2×2 kinematic solve (``helpers.py:277-348``);
* ``random_walk`` — draw from N(μ,σ) of the conversation's deltas
  (``helpers.py:171-274``); seeded per conversation for determinism
  (reference parity is structural only — row count/schema — matching the
  reference's own test, ``interpolation_tests.py:31-37``).

Output contract mirrors ``interpolation.py:43-48`` (only the mandatory
columns survive): synthetic rows carry ``role='gap'``, ``text=''``,
``tool=null``, ``turn_idx=-1``, plus interpolated ``m1_ip`` (the measure
channel) and ``is_synthetic`` marker; real rows pass through byte-equal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ptrail_ray.schema import CONV_ID, ROLE, TEXT, TOOL, TS, TURN_IDX
from ptrail_ray.stages.bucket import conv_runs, map_conv_buckets, sort_bucket, stable_hash


def _natural_cubic_eval(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Natural cubic spline through (x, y) evaluated at xq (numpy only).

    Standard tridiagonal solve for second derivatives with natural
    boundary conditions (M0 = Mn = 0).
    """
    n = len(x)
    if n < 3:
        return np.interp(xq, x, y)
    h = np.diff(x)
    h = np.where(h == 0, 1e-12, h)
    rhs = 6 * np.diff(np.diff(y) / h)
    diag = 2 * (h[:-1] + h[1:])
    m = np.zeros(n)
    # Thomas algorithm (tridiagonal, O(n)) — sub/super diagonals are h[1:-1]
    k = n - 2
    cp = np.zeros(k)
    dp = np.zeros(k)
    cp[0] = h[1] / diag[0] if k > 1 else 0.0
    dp[0] = rhs[0] / diag[0]
    for i in range(1, k):
        denom = diag[i] - h[i] * cp[i - 1]
        cp[i] = h[i + 1] / denom if i < k - 1 else 0.0
        dp[i] = (rhs[i] - h[i] * dp[i - 1]) / denom
    sol = np.zeros(k)
    sol[-1] = dp[-1]
    for i in range(k - 2, -1, -1):
        sol[i] = dp[i] - cp[i] * sol[i + 1]
    m[1:-1] = sol
    j = np.clip(np.searchsorted(x, xq, side="right") - 1, 0, n - 2)
    d = xq - x[j]
    hj = h[j]
    a = (m[j + 1] - m[j]) / (6 * hj)
    b = m[j] / 2
    c = (y[j + 1] - y[j]) / hj - hj * (2 * m[j] + m[j + 1]) / 6
    return y[j] + d * (c + d * (b + d * a))


def _interp_gap_values(
    method: str,
    t_run: np.ndarray,
    y_run: np.ndarray,
    t_new: np.ndarray,
    rng: np.random.Generator,
) -> np.ndarray:
    if method == "linear":
        return np.interp(t_new, t_run, y_run)
    if method == "cubic":
        return _natural_cubic_eval(t_run, y_run, t_new)
    if method == "kinematic":
        # quadratic consistent with local velocity: y(t) = y0 + v0·dt + ½a·dt²
        # where v0 is the incoming rate and a closes the gap to y1 at t1.
        j = np.clip(np.searchsorted(t_run, t_new, side="right") - 1, 0, len(t_run) - 2)
        t0, t1 = t_run[j], t_run[j + 1]
        y0, y1 = y_run[j], y_run[j + 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            v0 = np.where(
                j > 0, (y_run[j] - y_run[np.maximum(j - 1, 0)])
                / np.maximum(t_run[j] - t_run[np.maximum(j - 1, 0)], 1e-12),
                0.0,
            )
            T = np.maximum(t1 - t0, 1e-12)
            a = 2 * (y1 - y0 - v0 * T) / (T * T)
            dt = t_new - t0
        return y0 + v0 * dt + 0.5 * a * dt * dt
    if method == "random_walk":
        j = np.clip(np.searchsorted(t_run, t_new, side="right") - 1, 0, len(t_run) - 2)
        deltas = np.diff(y_run)
        mu = float(np.mean(deltas)) if len(deltas) else 0.0
        sd = float(np.std(deltas)) if len(deltas) else 0.0
        return y_run[j] + rng.normal(mu, sd if sd > 0 else 1e-9, size=len(t_new))
    raise ValueError(f"unknown gap-fill method: {method}")


def gapfill_kernel(
    table: pa.Table, *, sampling_rate: float, method: str = "linear"
) -> pa.Table:
    """Bucket kernel: emit original rows + one synthetic row per gap."""
    starts, lengths = conv_runs(table[CONV_ID])
    ts_us = table[TS]
    if pa.types.is_timestamp(ts_us.type) and ts_us.type.unit != "us":
        import pyarrow.compute as pc

        ts_us = pc.cast(ts_us, pa.timestamp("us"))
    t = ts_us.to_numpy(zero_copy_only=False).view("int64") / 1e6
    import pyarrow.compute as pc

    m1 = (
        pc.coalesce(pc.cast(pc.utf8_length(table[TEXT]), pa.int64()), pa.scalar(0, pa.int64()))
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )

    dt = np.empty(len(t))
    dt[0] = np.nan
    dt[1:] = t[1:] - t[:-1]
    dt[starts] = np.nan
    gap_prev = np.flatnonzero(dt > sampling_rate) - 1  # index of the turn BEFORE the gap

    orig = table.append_column("is_synthetic", pa.array(np.zeros(table.num_rows, bool)))
    orig = orig.append_column("m1_ip", pa.array(m1, pa.float64()))
    if len(gap_prev) == 0:
        return orig

    run_of = np.repeat(np.arange(len(starts)), lengths)
    conv_np = table[CONV_ID].to_numpy(zero_copy_only=False)
    new_t = t[gap_prev] + sampling_rate
    new_vals = np.empty(len(gap_prev))
    for r in np.unique(run_of[gap_prev]):
        sel = run_of[gap_prev] == r
        lo, ln = starts[r], lengths[r]
        seed = int(stable_hash(np.array([conv_np[lo]]))[0] % (2**32))
        rng = np.random.default_rng(seed)
        new_vals[sel] = _interp_gap_values(
            method, t[lo : lo + ln], m1[lo : lo + ln], new_t[sel], rng
        )

    k = len(gap_prev)
    synth_cols = {
        CONV_ID: pa.array(conv_np[gap_prev], pa.string()),
        TURN_IDX: pa.array(np.full(k, -1, np.int32)),
        ROLE: pa.array(np.repeat("gap", k), pa.string()),
        TEXT: pa.array(np.repeat("", k), pa.string()),
        TOOL: pa.array([None] * k, pa.string()),
        TS: pa.array((new_t * 1e6).astype("int64").view("datetime64[us]")),
        "is_synthetic": pa.array(np.ones(k, bool)),
        "m1_ip": pa.array(new_vals, pa.float64()),
    }
    # match the original schema exactly (passthrough columns → null)
    arrays = []
    for f in orig.schema:
        if f.name in synth_cols and not pa.types.is_null(f.type):
            a = synth_cols[f.name]
            arrays.append(a if a.type == f.type else a.cast(f.type))
        else:
            arrays.append(pa.nulls(k, f.type))
    synth = pa.Table.from_arrays(arrays, schema=orig.schema)
    out = pa.concat_tables([orig, synth])
    return sort_bucket(out, (CONV_ID, TS, TURN_IDX))


def gapfill(ds, sampling_rate: float, method: str = "linear", *, num_buckets: int = 32):
    """Dataset-level gap-fill: per-conversation synthetic-turn insertion."""
    return map_conv_buckets(
        ds,
        lambda tbl: gapfill_kernel(tbl, sampling_rate=sampling_rate, method=method),
        num_buckets=num_buckets,
    )
