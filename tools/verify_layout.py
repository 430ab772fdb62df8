"""Verify a declared conversation-partitioned layout.

`_manifest/layout.json` is a TRUST declaration: `flagship_auto` and the
job's prepartitioned plan elide the conv exchange because the producer
promised every conversation lives whole in one file. A producer bug that
splits a conversation across files would silently produce per-file
windows. This tool PROVES or REFUTES the declaration:

    python tools/verify_layout.py DIR [--num-cpus N]

Scale shape: one task per file reads ONLY the conv-id column and emits
its distinct (conv_id, file_idx) pairs; one narrow exchange groups by
conv_id and counts distinct files — a conversation appearing in >1 file
is a violation. Text never moves; the exchange carries two small columns
of per-file-distinct rows. Exit code 0 iff the layout holds (and the
manifest exists); violations are listed (capped) on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def verify_layout(path: str, *, num_buckets: int = 32, max_report: int = 20):
    """Returns (ok, n_files, n_convs, violations[:max_report])."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ptrail_ray.stages.bucket import grouped_agg_by_bucket
    from ptrail_ray.state.manifest import conv_partitioned_files

    files = conv_partitioned_files(path)
    if files is None:
        return None  # nothing declared — nothing to verify

    def distinct_convs(batch) -> "pa.Table":
        out_c, out_f = [], []
        for i, f in zip(batch["idx"], batch["path"]):
            col = pq.read_table(f, columns=["conv_id"])["conv_id"]
            uniq = col.unique()
            out_c.append(uniq)
            out_f.append(
                pa.array(np.full(len(uniq), int(i), np.int64), pa.int64())
            )
        return pa.table(
            {
                "conv_id": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in out_c]
                ),
                "file_idx": pa.concat_arrays(out_f),
            }
        )

    pairs = rd.from_items(
        [{"idx": i, "path": f} for i, f in enumerate(files)]
    ).map_batches(distinct_convs, batch_size=1, num_cpus=1, batch_format="pandas")

    def count_files(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("conv_id", as_index=False, sort=False)["file_idx"].nunique()
        g.columns = ["conv_id", "n_files"]
        return g

    per_conv = grouped_agg_by_bucket(
        pairs, "conv_id", count_files, num_buckets=num_buckets,
        partial_batch=None,
    )

    def bad_only(df: "pd.DataFrame") -> "pd.DataFrame":
        return df[df["n_files"] > 1]

    bad = per_conv.map_batches(
        bad_only, batch_format="pandas", batch_size=None
    ).to_pandas()
    n_convs = per_conv.count()
    return (
        len(bad) == 0,
        len(files),
        int(n_convs),
        bad.head(max_report).to_dict("records"),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs.update(num_cpus=args.num_cpus, address="local")
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    res = verify_layout(args.path)
    if res is None:
        print(json.dumps({"status": "no-layout-manifest", "path": args.path}))
        rc = 2
    else:
        ok, n_files, n_convs, bad = res
        print(
            json.dumps(
                {
                    "status": "ok" if ok else "VIOLATED",
                    "n_files": n_files,
                    "n_convs": n_convs,
                    "violations": bad,
                }
            )
        )
        rc = 0 if ok else 1
    if owns:
        ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
