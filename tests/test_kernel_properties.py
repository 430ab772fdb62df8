"""Property-based tests (hypothesis): the fused bucket kernel must agree
with the pandas oracle on arbitrary conversation shapes."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ptrail_ray.oracle import oracle_features
from ptrail_ray.stages.bucket import sort_bucket
from ptrail_ray.stages.kernels import DERIVATIVE_FEATURES, compute_features


@st.composite
def transcript_frames(draw):
    n_convs = draw(st.integers(1, 6))
    rows = []
    for c in range(n_convs):
        m = draw(st.integers(1, 12))
        t = draw(st.integers(0, 10**6))
        for i in range(m):
            # deltas include 0 (dup ts) and large gaps
            t += draw(st.sampled_from([0, 1, 5, 200, 10_000])) if i else 0
            rows.append(
                {
                    "conv_id": f"c{c:03d}",
                    "turn_idx": np.int32(i),
                    "role": draw(st.sampled_from(["user", "assistant", "tool"])),
                    "text": draw(st.sampled_from(["", "a", "ab int", "δok", "xyz " * 5])),
                    "tool": None,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t),
                }
            )
    return pd.DataFrame(rows)


@settings(max_examples=25, deadline=None)
@given(transcript_frames())
def test_kernel_matches_oracle(pdf):
    table = sort_bucket(pa.Table.from_pandas(pdf, preserve_index=False))
    got = compute_features(table).to_pandas()
    exp = oracle_features(pdf.copy())
    for col in DERIVATIVE_FEATURES + ["m1", "m2"]:
        a = got[col].to_numpy(dtype=float)
        b = exp[col].to_numpy(dtype=float)
        assert np.array_equal(np.isnan(a), np.isnan(b)), col
        assert np.allclose(a, b, equal_nan=True), col
    assert (got["session_id"].to_numpy() == exp["session_id"].to_numpy()).all()


@settings(max_examples=25, deadline=None)
@given(transcript_frames())
def test_hopping_kernel_matches_pandas(pdf):
    """Hopping-window kernel == brute-force pandas reimplementation on
    arbitrary conversation shapes (dup ts, 1-turn convs, big gaps)."""
    from ptrail_ray.stages.stats import hopping_agg_kernel

    width, hop = 400.0, 200.0
    table = sort_bucket(pa.Table.from_pandas(pdf, preserve_index=False))
    got = (
        hopping_agg_kernel(table, width_s=width, hop_s=hop)
        .to_pandas()
        .sort_values(["conv_id", "window_start_us"])
        .reset_index(drop=True)
    )

    sdf = table.to_pandas()
    sdf["m1"] = sdf["text"].fillna("").str.len().astype(float)
    t_us = sdf["ts"].astype("datetime64[us]").astype("int64")
    hop_us = int(hop * 1e6)
    r = int(width / hop)
    frames = []
    for j in range(r):
        f = sdf[["conv_id", "m1"]].copy()
        f["window_start_us"] = (t_us // hop_us) * hop_us - j * hop_us
        frames.append(f)
    exp = (
        pd.concat(frames)
        .groupby(["conv_id", "window_start_us"])["m1"]
        .agg(n_turns="size", mean_m1="mean")
        .reset_index()
        .sort_values(["conv_id", "window_start_us"])
        .reset_index(drop=True)
    )
    exp["n_turns"] = exp["n_turns"].astype("int64")
    pd.testing.assert_frame_equal(got, exp, check_like=True)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(0, 8), min_size=0, max_size=20),
    st.lists(st.integers(0, 8), min_size=0, max_size=20),
)
def test_hash_join_matches_pandas(lkeys, rkeys):
    import ray.data as rd

    from ptrail_ray.stages.join import hash_join

    l = pd.DataFrame({"k": lkeys, "lv": np.arange(len(lkeys))})
    r = pd.DataFrame({"k": rkeys, "rv": np.arange(len(rkeys)) * 10.0})
    if len(l) == 0 or len(r) == 0:
        return  # empty Ray datasets lose their schema; join contract needs one
    got = hash_join(rd.from_pandas(l), rd.from_pandas(r), "k").to_pandas()
    exp = (
        l.merge(r, on="k")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    if len(exp) == 0:
        assert len(got) == 0  # empty Ray result loses its schema
        return
    got = got.sort_values(["k", "lv", "rv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    pd.testing.assert_frame_equal(got, exp)


@settings(max_examples=25, deadline=None)
@given(transcript_frames())
def test_rank_and_rollmax_match_pandas_properties(pdf):
    table = sort_bucket(pa.Table.from_pandas(pdf, preserve_index=False))
    got = compute_features(table, ["m1", "rank_m1", "roll5_max_m1"]).to_pandas()
    ref = got[["conv_id"]].copy()
    ref["m1"] = got["m1"]
    exp_rank = ref.groupby("conv_id")["m1"].rank(method="min")
    assert (got["rank_m1"].to_numpy() == exp_rank.to_numpy()).all()
    exp_max = (
        ref.groupby("conv_id")["m1"]
        .rolling(5)
        .max()
        .reset_index(level=0, drop=True)
        .to_numpy(dtype=float)
    )
    a = got["roll5_max_m1"].to_numpy(dtype=float)
    assert np.array_equal(np.isnan(a), np.isnan(exp_max))
    assert np.allclose(a, exp_max, equal_nan=True)


@settings(max_examples=25, deadline=None)
@given(transcript_frames())
def test_group_normalizers_match_pandas_properties(pdf):
    from ptrail_ray.stages.stats import group_zscore_kernel, robust_scale_kernel

    table = sort_bucket(pa.Table.from_pandas(pdf, preserve_index=False))
    table = compute_features(table, ["m1"])
    z = group_zscore_kernel(table, value_col="m1", out_col="z").to_pandas()
    r = robust_scale_kernel(table, value_col="m1", out_col="rs").to_pandas()
    g = z.groupby("conv_id")["m1"]
    std = g.transform(lambda x: x.std(ddof=0))
    exp_z = ((z["m1"] - g.transform("mean")) / std.where(std > 0)).to_numpy(dtype=float)
    a = z["z"].to_numpy(dtype=float)
    assert np.array_equal(np.isnan(a), np.isnan(exp_z))
    assert np.allclose(a, exp_z, equal_nan=True, atol=1e-9)
    gg = r.groupby("conv_id")["m1"]
    med = gg.transform("median")
    iqr = gg.transform(lambda x: x.quantile(0.75) - x.quantile(0.25))
    exp_r = ((r["m1"] - med) / iqr.where(iqr > 0)).to_numpy(dtype=float)
    b = r["rs"].to_numpy(dtype=float)
    assert np.array_equal(np.isnan(b), np.isnan(exp_r))
    assert np.allclose(b, exp_r, equal_nan=True, atol=1e-9)
