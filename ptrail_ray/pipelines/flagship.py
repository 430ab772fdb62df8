"""Flagship end-to-end pipeline (the reference's "real workload",
SURVEY.md §3.3: clean → gap-detect → featurize → side-join → stats).

    read/derive transcripts
      → [single conv-bucket shuffle]
         fused window kernels (derivative chains, sessionize, lag/lead)
      → temporal extractors (stateless)
      → as-of backfill join (broadcast side, actor pool)
      → optional resumable partitioned write with manifests

Everything downstream of the one shuffle is narrow and order-preserving.
"""

from __future__ import annotations

import pyarrow as pa

from ptrail_ray.stages.asof import asof_join
from ptrail_ray.stages.kernels import ALL_FEATURES, compute_features
from ptrail_ray.stages.bucket import map_conv_buckets
from ptrail_ray.stages.temporal import add_temporal_columns


def flagship(
    ds,
    side: "pa.Table | None" = None,
    *,
    num_buckets: int = 32,
    gap_seconds: float = 120.0,
    features: list[str] | None = None,
    asof_concurrency: int = 4,
):
    """Full featurization pipeline over a canonical transcript Dataset."""

    def kern(table: pa.Table) -> pa.Table:
        table = compute_features(
            table, features or ALL_FEATURES, gap_seconds=gap_seconds
        )
        return add_temporal_columns(table)

    out = map_conv_buckets(ds, kern, num_buckets=num_buckets)
    if side is not None:
        out = asof_join(out, side, concurrency=asof_concurrency)
    return out
