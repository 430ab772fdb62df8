"""Flagship end-to-end pipeline (the reference's "real workload",
SURVEY.md §3.3: clean → gap-detect → featurize → side-join → stats).

    read/derive transcripts
      → [project_early] compute measure channels (m1/m2) and DROP text
      → [single conv-bucket shuffle]
         fused window kernels (derivative chains, sessionize, lag/lead)
      → temporal extractors (stateless)
      → as-of backfill join (broadcast side, actor pool)

Everything downstream of the one shuffle is narrow and order-preserving.

``project_early`` (default True) is the 100 TB configuration: the
derivative kernels consume only the scalar measure channels, so the text
column — which dominates row width ~5x — is reduced to (m1, m2) BEFORE
the all-to-all exchange ("prune at the read"); the emitted feature table
is keyed by (conv_id, turn_idx) and joins back to the source text
lazily. ``project_early=False`` carries text through end-to-end
(byte-equal passthrough), which the parity queries use at small scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.schema import TEXT, M1, M2
from ptrail_ray.stages.asof import asof_join
from ptrail_ray.stages.kernels import ALL_FEATURES, compute_features
from ptrail_ray.stages.bucket import map_conv_buckets
from ptrail_ray.stages.temporal import add_temporal_columns


def project_measures(batch: pa.Table) -> pa.Table:
    """Stateless pre-shuffle projection: text → (m1, m2), drop text."""
    m1 = pc.coalesce(
        pc.cast(pc.utf8_length(batch[TEXT]), pa.int64()), pa.scalar(0, pa.int64())
    )
    m2 = pc.coalesce(
        pc.cast(pc.binary_length(batch[TEXT]), pa.int64()), pa.scalar(0, pa.int64())
    )
    out = batch.drop_columns([TEXT])
    return out.append_column(M1, m1).append_column(M2, m2)


def flagship(
    ds,
    side: "pa.Table | None" = None,
    *,
    num_buckets: int = 32,
    gap_seconds: float = 120.0,
    features: list[str] | None = None,
    asof_concurrency: "int | tuple" = 8,
    project_early: bool = True,
    hot_threshold: int | None = None,
):
    """Full featurization pipeline over a canonical transcript Dataset.

    ``hot_threshold``: when set, a cheap partial-count pre-pass detects
    conversations above the threshold and salts the exchange so each
    gets a dedicated partition (stages/salt.py); ``None`` skips the
    pre-pass (inputs known to be skew-bounded)."""
    hot_convs = None
    if hot_threshold is not None:
        # detect on the RAW input so conv_id column pruning pushes down
        # into the parquet read (before any UDF blocks pushdown)
        from ptrail_ray.stages.salt import detect_hot_convs

        hot_convs = detect_hot_convs(ds, hot_threshold)

    if project_early:
        ds = ds.map_batches(project_measures, batch_format="pyarrow", batch_size=262144)

    def kern(table: pa.Table) -> pa.Table:
        table = compute_features(
            table, features or ALL_FEATURES, gap_seconds=gap_seconds
        )
        return add_temporal_columns(table)

    if hot_convs is not None:
        from ptrail_ray.stages.salt import map_conv_buckets_salted

        out = map_conv_buckets_salted(
            ds, kern, num_buckets=num_buckets, hot_convs=hot_convs
        )
    else:
        out = map_conv_buckets(ds, kern, num_buckets=num_buckets)
    if side is not None:
        out = asof_join(out, side, concurrency=asof_concurrency)
    return out


def flagship_prepartitioned(
    path: str,
    side: "pa.Table | None" = None,
    *,
    gap_seconds: float = 120.0,
    features: list[str] | None = None,
    asof_concurrency: "int | tuple" = 8,
    files: "list[str] | None" = None,
):
    """Shuffle-free flagship over a conversation-PARTITIONED Parquet
    layout: each file holds only complete conversations (disjoint
    conv-id sets per file — the layout the engine's own resumable sink
    writes, and the bucketed-table contract warehouses use to elide
    exchanges). When the partitioning already lives in the STORAGE,
    re-deriving it is pure waste: one task per file does
    read → stable (conv, turn, ts) sort → project → fused kernels, and
    the conv-bucket exchange — the pipeline's single all-to-all and the
    dominant fixed span of the scaling curve — vanishes. Output is
    value-identical to :func:`flagship` (tests/test_round4b_ops.py).

    The caller owns the layout contract; a file that splits a
    conversation across files would silently produce per-file windows
    (exactly the bucketed-table rule every engine has). The as-of
    backfill is unchanged — the broadcast actor pool never needed the
    exchange."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ptrail_ray.schema import TRANSCRIPT_COLUMNS
    from ptrail_ray.stages.bucket import sort_bucket

    if files is None:
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")

    def kern(table: pa.Table) -> pa.Table:
        table = project_measures(sort_bucket(table))
        table = compute_features(
            table, features or ALL_FEATURES, gap_seconds=gap_seconds
        )
        return add_temporal_columns(table)

    def process_file(batch) -> pa.Table:
        out = []
        for f in batch["item"]:
            out.append(kern(pq.read_table(f, columns=TRANSCRIPT_COLUMNS)))
        return pa.concat_tables(out)

    out = rd.from_items(files).map_batches(
        process_file, batch_size=1, num_cpus=1
    )
    if side is not None:
        out = asof_join(out, side, concurrency=asof_concurrency)
    return out


def flagship_auto(
    path: str,
    side: "pa.Table | None" = None,
    *,
    num_buckets: int = 32,
    gap_seconds: float = 120.0,
    features: list[str] | None = None,
    asof_concurrency: "int | tuple" = 8,
    hot_threshold: int | None = None,
    read_blocks: int | None = None,
):
    """Flagship over a parquet dir, picking the execution plan from the
    STORAGE layout (VERDICT r04 #3: the layout, not an env var, decides).

    If ``path`` carries a layout manifest declaring a complete
    conversation-partitioned raw-transcript layout
    (`state.manifest.conv_partitioned_files` — written by the sink's
    partition-only mode and the synthetic-corpus writer), the
    conv-bucket exchange — the pipeline's single all-to-all — is elided
    and one task per file does read → sort → kernels
    (:func:`flagship_prepartitioned`). Otherwise the general exchange
    path (:func:`flagship`) runs. Both paths are value-identical
    (tests/test_flagship_auto.py)."""
    from ptrail_ray.sources.transcripts import read_transcripts
    from ptrail_ray.state.manifest import conv_partitioned_files

    files = conv_partitioned_files(path)
    if files is not None:
        return flagship_prepartitioned(
            path,
            side,
            gap_seconds=gap_seconds,
            features=features,
            asof_concurrency=asof_concurrency,
            files=files,
        )
    ds = read_transcripts(
        path,
        **({"override_num_blocks": read_blocks} if read_blocks else {}),
    )
    return flagship(
        ds,
        side,
        num_buckets=num_buckets,
        gap_seconds=gap_seconds,
        features=features,
        asof_concurrency=asof_concurrency,
        hot_threshold=hot_threshold,
    )
