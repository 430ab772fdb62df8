"""Robustness edge cases: empty inputs, empty side tables, single rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ptrail_ray.schema import TRANSCRIPT_SCHEMA
from ptrail_ray.stages.asof import asof_join
from ptrail_ray.stages.filters import filter_by_max, remove_duplicates
from ptrail_ray.stages.kernels import compute_features, featurize
from ptrail_ray.stages.bucket import sort_bucket
from ptrail_ray.stages.stats import conv_stats


def _empty_ds():
    return rd.from_arrow(TRANSCRIPT_SCHEMA.empty_table())


def test_empty_through_everything(ray_session):
    e = _empty_ds()
    assert featurize(e, num_buckets=2).count() == 0
    assert remove_duplicates(e, num_buckets=2).count() == 0
    assert conv_stats(featurize(e, num_buckets=2)).count() == 0


def test_empty_side_table(synth_ds, ray_session):
    side = pd.DataFrame(
        {
            "key": pd.Series([], dtype=str),
            "effective_ts": pd.Series([], dtype="datetime64[us]"),
            "attr_num": pd.Series([], dtype=float),
            "attr_cat": pd.Series([], dtype=str),
        }
    )
    out = asof_join(synth_ds, side, concurrency=1).to_pandas()
    assert out["attr_num"].isna().all()
    assert out["attr_cat"].isna().all()


def test_single_row_table(ray_session):
    t = pa.table(
        {
            "conv_id": ["only"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["hi"],
            "tool": [None],
            "ts": pa.array([pd.Timestamp("2024-01-01")], pa.timestamp("us")),
        }
    )
    out = compute_features(sort_bucket(t)).to_pandas()
    assert len(out) == 1
    assert np.isnan(out["delta_t"].iloc[0])
    assert out["session_id"].iloc[0] == 0


def test_lag_k_features(synth_ds, synth_pdf):
    out = (
        featurize(synth_ds, ["lag2_role", "lag3_role"], num_buckets=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "ts"])
        .reset_index(drop=True)
    )
    ref = synth_pdf.sort_values(["conv_id", "turn_idx", "ts"], kind="stable").reset_index(drop=True)
    for k in (2, 3):
        exp = ref.groupby("conv_id", sort=False)["role"].shift(k)
        assert (out[f"lag{k}_role"].fillna("∅") == exp.fillna("∅")).all()
