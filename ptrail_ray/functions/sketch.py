"""Distributed cardinality sketch: HyperLogLog distinct counting.

At 10^12 rows an exact `count(DISTINCT x)` is a full all-to-all
exchange on x; an HLL sketch is one narrow streaming pass — each task
emits a 2^p-register partial (16 KB at p=14), partials merge by
element-wise max (commutative/associative/idempotent, so block order,
retries and splits cannot change the answer), and the driver folds a
bounded `num_tasks × 2^p` table. Standard estimator (Flajolet et al.
2007): alpha_m · m² / Σ 2^{-M_j}, with the small-range linear-counting
correction; typical error 1.04/√m ≈ 0.8% at p=14.

Hashing is `pandas.util.hash_array` (SipHash-1-3, fixed key) — the
engine's stable cross-process hash (stages/bucket.py) — so sketches are
reproducible across runs, block layouts, and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 14
HLL_M = 1 << HLL_P


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_partial(values: np.ndarray | pa.Array | pa.ChunkedArray, p: int = HLL_P) -> np.ndarray:
    """Registers (uint8[2^p]) for one batch of values."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(values), categorize=True)  # uint64
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # left-align the remaining 64-p bits, padding freed low bits with 1s
    # so rest > 0 always and the all-zero tail yields rank (64-p)+1
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    # vectorized clz via the float64 exponent: frexp(x)[1] = floor(log2 x)+1
    # for exact x, so rank = clz+1 = 65-exp. uint64→float64 rounds past 53
    # bits and can bump exp by +1 at a 2^k boundary (prob ~2^-53/value) —
    # clamp keeps rank in [1, 64-p+1]; sub-ULP bias is far below HLL error.
    exp = np.frexp(rest.astype(np.float64))[1]
    rank = np.clip(65 - exp, 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate from merged registers."""
    m = len(regs)
    inv = np.ldexp(1.0, -regs.astype(np.int64))  # 2^-M_j exactly
    raw = _alpha(m) * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)  # linear counting
    return raw


def hll_distinct(ds, col: str, *, p: int = HLL_P, batch_size: int = 1 << 18) -> float:
    """Approximate distinct count of ``ds[col]`` in ONE streaming pass."""

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_partial(t[col], p=p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    parts = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .take_all()
    )
    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in parts:
        np.maximum(merged, np.asarray(row["regs"], dtype=np.uint8), out=merged)
    return hll_estimate(merged)
