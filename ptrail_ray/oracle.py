"""Self-contained pandas oracle for the test suite.

A small, direct implementation of the reference semantics from SURVEY.md
§1.3 (written from the survey, not from the engine code) used by pytest to
check the Ray engine's feature vectors ``np.allclose``-equal at each
(conv_id, turn_idx). Mirrors the reference's own implementation style —
per-entity ``shift(1)`` / global ``.diff()`` masked at boundaries
(``ptrail/features/kinematic_features.py:451-455`` etc.) — so it is an
*independent* derivation of the same math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _inf_to_nan(s: pd.Series) -> pd.Series:
    return s.replace([np.inf, -np.inf], np.nan)


def oracle_features(
    df: pd.DataFrame,
    gap_seconds: float = 120.0,
    segment_seconds: float = 3600.0,
) -> pd.DataFrame:
    """Compute all engine features the pandas way.

    Input: canonical transcript frame. Output: sorted by
    (conv_id, turn_idx, ts) with all feature columns appended.
    """
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="stable").reset_index(
        drop=True
    )
    g = df.groupby("conv_id", sort=False)

    df["m1"] = df["text"].fillna("").str.len().astype("int64")
    df["m2"] = (
        df["text"].fillna("").map(lambda s: len(s.encode("utf-8"))).astype("int64")
    )

    ts = df["ts"]
    df["delta_t"] = g["ts"].diff().dt.total_seconds()
    df["delta_len"] = g["m1"].diff().astype(float)

    first_ts = g["ts"].transform("first")
    first_m1 = g["m1"].transform("first")
    is_first = g.cumcount() == 0
    df["elapsed_s"] = (ts - first_ts).dt.total_seconds().where(~is_first)
    df["cum_len"] = (df["m1"] - first_m1).astype(float).where(~is_first)

    df["len_rate"] = _inf_to_nan(df["delta_len"] / df["delta_t"])
    df["len_accel"] = _inf_to_nan(
        df.groupby("conv_id", sort=False)["len_rate"].diff() / df["delta_t"]
    )
    df["len_jerk"] = _inf_to_nan(
        df.groupby("conv_id", sort=False)["len_accel"].diff() / df["delta_t"]
    )

    df["tok_delta"] = g["m2"].diff().astype(float)
    df["tok_rate"] = _inf_to_nan(
        df.groupby("conv_id", sort=False)["tok_delta"].diff() / df["delta_t"]
    )
    df["tok_accel"] = _inf_to_nan(
        df.groupby("conv_id", sort=False)["tok_rate"].diff() / df["delta_t"]
    )

    gap = (df["delta_t"] > gap_seconds) & df["delta_t"].notna()
    df["session_id"] = gap.astype("int64").groupby(df["conv_id"], sort=False).cumsum()

    rel = (ts - first_ts).dt.total_seconds()
    df["seg_id"] = np.floor_divide(rel, segment_seconds).astype("int64")

    for col in ("role", "tool", "ts"):
        df[f"lag1_{col}"] = df.groupby("conv_id", sort=False)[col].shift(1)
        df[f"lead1_{col}"] = df.groupby("conv_id", sort=False)[col].shift(-1)
    return df


def oracle_asof(
    turns: pd.DataFrame, side: pd.DataFrame, *, key_col: str = "conv_id"
) -> pd.DataFrame:
    """Point-in-time join oracle: latest side row with
    ``effective_ts <= ts`` per key (inclusive — zero leakage)."""
    out_rows = []
    side = side.sort_values(["key", "effective_ts"], kind="stable")
    for _, row in turns.iterrows():
        sv = side[(side["key"] == row[key_col]) & (side["effective_ts"] <= row["ts"])]
        if len(sv):
            last = sv.iloc[-1]
            out_rows.append((last["attr_num"], last["attr_cat"]))
        else:
            out_rows.append((np.nan, None))
    res = turns.copy()
    res["attr_num"] = [r[0] for r in out_rows]
    res["attr_cat"] = [r[1] for r in out_rows]
    return res
