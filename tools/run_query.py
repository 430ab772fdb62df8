"""Run any registered operator/pipeline as a production job.

    python tools/run_query.py --query q_dedup_exact_docs \
        --sf /root/testdata/sf0.1 --output /tmp/out [--num-cpus 32]

Every entry in ``__ray_entry__.queries()`` becomes invokable from the
CLI (and via ``ray job submit --working-dir /root/repo``): the result
is written as Parquet — a Ray ``Dataset`` streams through
``write_parquet`` (never materialized on the driver); a driver-side
``DataFrame``/``Table`` result (the catalog-bounded reports) is written
as a single file. ``--list`` prints the registry.

This is the "a reference user could run every pipeline they run today"
surface: tools/job.py is the tuned flagship featurization job; this is
the long tail of operators.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", help="registry name (see --list)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="input table dir")
    ap.add_argument("--output", help="output dir (parquet)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--list", action="store_true", help="print the registry and exit")
    args = ap.parse_args(argv)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.list:
        oracles = entrymod.oracle_sql()
        for name in qs:
            print(f"{name}\t{'oracle' if name in oracles else 'self-check'}")
        return 0
    if not args.query or args.query not in qs:
        ap.error(f"--query must be one of the {len(qs)} registered names (see --list)")
    if not args.output:
        ap.error("--output is required")

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    result = qs[args.query](args.sf)

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(args.output, exist_ok=True)
    if isinstance(result, pd.DataFrame):
        result = pa.Table.from_pandas(result, preserve_index=False)
    if isinstance(result, pa.Table):
        pq.write_table(result, os.path.join(args.output, "part-0.parquet"))
        n = result.num_rows
    else:
        result.write_parquet(args.output)
        n = sum(
            pq.read_metadata(os.path.join(args.output, f)).num_rows
            for f in os.listdir(args.output)
            if f.endswith(".parquet")
        )
    wall = time.perf_counter() - t0
    print(f'{{"query": "{args.query}", "rows": {n}, "sec": {wall:.3f}}}')
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
