"""Gap-fill tests (interpolation_tests.py contract: len(out) >= len(in),
schema fixed; plus value checks for the deterministic kernels)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ptrail_ray.stages.gapfill import gapfill

RATE = 120.0


def _ordered(pdf):
    return pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)


@pytest.mark.parametrize("method", ["linear", "cubic", "kinematic", "random_walk"])
def test_gapfill_structural(synth_ds, synth_pdf, method):
    out = gapfill(synth_ds, RATE, method).to_pandas()
    # row conservation + one synthetic row per gap (helpers.py:89-95 predicate)
    ref = _ordered(synth_pdf.copy())
    dt = ref.groupby("conv_id", sort=False)["ts"].diff().dt.total_seconds()
    n_gaps = int((dt > RATE).sum())
    assert len(out) == len(synth_pdf) + n_gaps
    assert int(out["is_synthetic"].sum()) == n_gaps
    # original rows pass through byte-equal
    orig = out[~out["is_synthetic"]]
    assert sorted(orig["text"].fillna("")) == sorted(synth_pdf["text"].fillna(""))


def test_gapfill_linear_values(ray_session):
    """Synthetic point lands at ts_prev + rate with np.interp value
    (helpers.py:74-95)."""
    pdf = pd.DataFrame(
        {
            "conv_id": "c0",
            "turn_idx": np.arange(3, dtype=np.int32),
            "role": "user",
            "text": ["ab", "abcd" * 25, "abcdef"],  # m1: 2, 100, 6
            "tool": None,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 00:10:30"]
            ),
        }
    )
    out = gapfill(rd.from_pandas(pdf), RATE, "linear").to_pandas()
    out = _ordered(out)
    assert len(out) == 4
    s = out[out["is_synthetic"]]
    assert len(s) == 1
    assert s["ts"].iloc[0] == pd.Timestamp("2024-01-01 00:02:00")
    # np.interp at 120s between (0s, 2) and (600s, 100)
    expected = np.interp(120.0, [0.0, 600.0, 630.0], [2.0, 100.0, 6.0])
    assert np.isclose(s["m1_ip"].iloc[0], expected)
    assert s["role"].iloc[0] == "gap"


def test_gapfill_deterministic_random_walk(synth_ds):
    a = gapfill(synth_ds, RATE, "random_walk").to_pandas()
    b = gapfill(synth_ds, RATE, "random_walk").to_pandas()
    a, b = _ordered(a), _ordered(b)
    assert np.allclose(a["m1_ip"].to_numpy(), b["m1_ip"].to_numpy(), equal_nan=True)
