"""range_join (stages/interval.py) vs a brute-force pandas oracle:
boundary inclusivity, intervals spanning many time buckets, keyed vs
keyless mode, degenerate hi<lo intervals, and empty sides."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ptrail_ray.stages.interval import range_join


def _brute(probe: pd.DataFrame, iv: pd.DataFrame, key=None) -> pd.DataFrame:
    rows = []
    for _, p in probe.iterrows():
        for _, w in iv.iterrows():
            if key is not None and p[key] != w[key]:
                continue
            if w["lo"] <= p["ts"] <= w["hi"]:
                r = dict(p)
                r.update({c: w[c] for c in iv.columns if c != key})
                rows.append(r)
    return pd.DataFrame(rows)


def _sorted(df: pd.DataFrame, cols) -> pd.DataFrame:
    return (
        df.sort_values(cols).reset_index(drop=True)[sorted(df.columns)]
        if len(df)
        else df
    )


@pytest.mark.parametrize("key", [None, "user_id"])
def test_range_join_matches_brute_force(ray_session, key):
    rng = np.random.default_rng(7)
    n_p, n_w = 400, 60
    probe = pd.DataFrame(
        {
            "pid": np.arange(n_p, dtype=np.int64),
            "ts": rng.integers(0, 10_000, n_p).astype(np.int64),
            "user_id": rng.integers(0, 5, n_p).astype(np.int64),
        }
    )
    lo = rng.integers(0, 10_000, n_w).astype(np.int64)
    # lengths from 0 to ~30 bucket widths (W=100) incl. degenerate hi<lo
    length = rng.integers(-50, 3_000, n_w).astype(np.int64)
    iv = pd.DataFrame(
        {
            "wid": np.arange(n_w, dtype=np.int64),
            "lo": lo,
            "hi": lo + length,
            "user_id": rng.integers(0, 5, n_w).astype(np.int64),
        }
    )
    if key is None:
        iv = iv.drop(columns=["user_id"])
    got = range_join(
        rd.from_pandas(probe),
        rd.from_pandas(iv),
        ts_col="ts",
        lo_col="lo",
        hi_col="hi",
        key=key,
        bucket_width=100,
        num_buckets=8,
    ).to_pandas()
    want = _brute(probe, iv, key=key)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        _sorted(got, ["pid", "wid"]),
        _sorted(want, ["pid", "wid"]).astype(got.dtypes.to_dict()),
    )
    # boundary rows exist in the fixture by volume; spot-assert inclusivity
    m = got.merge(iv, on="wid", suffixes=("", "_w"))
    assert ((m["ts"] >= m["lo_w"] if "lo_w" in m else m["lo"]) ).all()


def test_range_join_timestamp_columns_and_boundaries(ray_session):
    base = pd.Timestamp("2025-01-01 00:00:00")
    probe = pd.DataFrame(
        {
            "pid": np.arange(4, dtype=np.int64),
            # exactly lo, inside, exactly hi, one µs past hi
            "ts": [
                base,
                base + pd.Timedelta(seconds=30),
                base + pd.Timedelta(seconds=60),
                base + pd.Timedelta(seconds=60, microseconds=1),
            ],
        }
    )
    iv = pd.DataFrame(
        {"wid": np.array([0], np.int64), "lo": [base], "hi": [base + pd.Timedelta(seconds=60)]}
    )
    got = range_join(
        rd.from_pandas(probe),
        rd.from_pandas(iv),
        ts_col="ts",
        lo_col="lo",
        hi_col="hi",
        bucket_width=7_000_000,  # W not aligned to the interval
        num_buckets=4,
    ).to_pandas()
    assert sorted(got["pid"]) == [0, 1, 2]


def test_range_join_empty_interval_side(ray_session):
    probe = pd.DataFrame({"pid": np.array([1], np.int64), "ts": np.array([5], np.int64)})
    iv = pd.DataFrame(
        {
            "wid": pa.array([], pa.int64()).to_pandas(),
            "lo": pa.array([], pa.int64()).to_pandas(),
            "hi": pa.array([], pa.int64()).to_pandas(),
        }
    )
    out = range_join(
        rd.from_pandas(probe),
        rd.from_pandas(iv),
        ts_col="ts",
        lo_col="lo",
        hi_col="hi",
        bucket_width=10,
        num_buckets=2,
    ).to_pandas()
    assert len(out) == 0


def test_range_join_rejects_duplicate_columns(ray_session):
    df = pd.DataFrame({"ts": np.array([1], np.int64), "x": np.array([1], np.int64)})
    iv = pd.DataFrame(
        {"lo": np.array([0], np.int64), "hi": np.array([2], np.int64), "x": np.array([9], np.int64)}
    )
    with pytest.raises(ValueError, match="disjoint"):
        range_join(
            rd.from_pandas(df),
            rd.from_pandas(iv),
            ts_col="ts",
            lo_col="lo",
            hi_col="hi",
        )
