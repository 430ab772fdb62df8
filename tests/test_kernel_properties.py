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
