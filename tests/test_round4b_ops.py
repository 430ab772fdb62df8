"""Round-4 continuation ops: full-outer join, rolling distinct users,
grouped heavy hitters, broadcast linear scoring, snapshot CDC diff,
PMI pair association, first-touch attribution."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def test_full_outer_join_matches_pandas(ray_session):
    from ptrail_ray.stages.join import hash_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 200),
            "lv": rng.normal(size=200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(25, 75, 150),  # overlap [25,50); right-only [50,75)
            "rv": rng.normal(size=150),
        }
    )
    out = (
        hash_join(
            rd.from_pandas(left, override_num_blocks=4),
            rd.from_pandas(right, override_num_blocks=3),
            "k",
            how="full",
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, on="k", how="outer")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    assert np.array_equal(
        out["k"].to_numpy(dtype=float), exp["k"].to_numpy(dtype=float)
    )
    for c in ("lv", "rv"):
        a = out[c].to_numpy(dtype=float)
        b = exp[c].to_numpy(dtype=float)
        assert np.array_equal(a, b, equal_nan=True)


def test_full_outer_join_rejects_hot_keys(ray_session):
    import pytest

    from ptrail_ray.stages.join import hash_join

    df = pd.DataFrame({"k": [1], "v": [1.0]})
    with pytest.raises(ValueError):
        hash_join(
            rd.from_pandas(df), rd.from_pandas(df.rename(columns={"v": "w"})),
            "k", how="full", hot_keys=[1],
        )
