"""Stress-bench the continuation-session operators at scale.

Docs side: the stress_neardup 100k-doc replica corpus. Events side: a
deterministic 10M-event synthetic table (150k users x 5 event types
over 60 days, seed 7). 32 CPUs; one wall + row count per op. Usage:

    python tools/stress_session_ops.py [op ...]   # default: all
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stress_neardup import build_corpus, build_embeddings  # noqa: E402

DOC_OPS = {"mix", "pct_rank", "grouped_topk", "weighted_median", "chi2"}
EVENT_OPS = {"rate_spikes", "cohort", "max_streak"}
EMB_OPS = {"ann_filtered", "knn"}


def build_events(n: int = 10_000_000, users: int = 150_000) -> pd.DataFrame:
    rng = np.random.default_rng(7)
    ts = pd.Timestamp("2024-01-01").value // 1000 + rng.integers(
        0, 60 * 86_400_000_000, n
    )
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": pd.array(
                np.char.add("e", rng.integers(0, 5, n).astype(str))
            ),
            "ts": ts.astype("datetime64[us]"),
        }
    )


def main() -> int:
    ops = set(sys.argv[1:]) or DOC_OPS | EVENT_OPS | EMB_OPS

    import ray
    import ray.data as rd

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    results = {}

    if ops & DOC_OPS:
        corpus = build_corpus()
        # the replica corpus is (doc_id, text); derive the catalog columns
        corpus["source"] = "src" + (corpus["doc_id"] % 20).astype(str)
        corpus["lang"] = np.array(["en", "de", "fr"], dtype=object)[
            (corpus["doc_id"] % 3).to_numpy()
        ]
        corpus["n_chars"] = corpus["text"].fillna("").str.len().astype(np.int64)
        print(f"corpus: {len(corpus)} docs", flush=True)
        ds = rd.from_pandas(corpus, override_num_blocks=64).materialize()

        if "mix" in ops:
            from ptrail_ray.functions.sample import (
                group_weights,
                mix_rates,
                mix_to_target,
            )

            t0 = time.perf_counter()
            w = group_weights(ds, group_col="source", weight_col="n_chars")
            rates = mix_rates(w, {g: float(int(g[3:]) + 1) for g in w})
            n = mix_to_target(
                ds, id_col="doc_id", group_col="source", rates=rates
            ).count()
            results["mix_to_target"] = (time.perf_counter() - t0, n)
        if "pct_rank" in ops:
            from ptrail_ray.stages.quantiles import global_percent_rank

            t0 = time.perf_counter()
            n = global_percent_rank(
                ds.select_columns(["doc_id", "n_chars"]), value_col="n_chars"
            ).count()
            results["pct_rank"] = (time.perf_counter() - t0, n)
        if "grouped_topk" in ops:
            from ptrail_ray.stages.quantiles import grouped_topk

            t0 = time.perf_counter()
            out = grouped_topk(
                ds.select_columns(["doc_id", "source", "n_chars"]),
                group_col="source",
                value_col="n_chars",
                id_col="doc_id",
                k=10,
            )
            results["grouped_topk"] = (time.perf_counter() - t0, len(out))
        if "weighted_median" in ops:
            from ptrail_ray.stages.quantiles import weighted_median

            t0 = time.perf_counter()
            med, tot = weighted_median(
                ds.select_columns(["n_chars"]).map_batches(
                    lambda t: t.append_column(
                        "w", t["n_chars"]
                    ),  # self-weighted: chars-weighted char median
                    batch_format="pyarrow",
                    batch_size=None,
                ),
                value_col="n_chars",
                weight_col="w",
            )
            results["weighted_median"] = (time.perf_counter() - t0, 1)
        if "chi2" in ops:
            from ptrail_ray.functions.textstats import chi2_independence

            t0 = time.perf_counter()
            out = chi2_independence(
                ds.select_columns(["lang", "source"]), col_a="lang", col_b="source"
            )
            results["chi2"] = (time.perf_counter() - t0, len(out))

    if ops & EVENT_OPS:
        # cache as parquet and read through ray — the production path;
        # from_pandas would bill a one-off 10M-row block conversion to
        # whichever op runs first
        cache = "/tmp/ptrail_ray_stress_events.parquet"
        if not os.path.exists(cache):
            build_events().to_parquet(cache, index=False)
        eds = rd.read_parquet(cache, override_num_blocks=64).materialize()
        print(f"events: {eds.count()} rows", flush=True)

        if "rate_spikes" in ops:
            from ptrail_ray.stages.stats import rate_spikes

            # one untimed pilot — the first map_batches of a session
            # pays worker imports + first-touch (bench.py convention)
            rate_spikes(eds, ts_col="ts", group_col="event_type")
            t0 = time.perf_counter()
            out = rate_spikes(eds, ts_col="ts", group_col="event_type")
            results["rate_spikes"] = (time.perf_counter() - t0, len(out))
        if "cohort" in ops:
            from ptrail_ray.stages.stats import cohort_retention

            t0 = time.perf_counter()
            out = cohort_retention(eds, ts_col="ts", user_col="user_id")
            results["cohort_retention"] = (time.perf_counter() - t0, len(out))
        if "max_streak" in ops:
            from ptrail_ray.stages.stats import max_streaks

            t0 = time.perf_counter()
            n = max_streaks(eds, ts_col="ts", user_col="user_id").count()
            results["max_streak"] = (time.perf_counter() - t0, n)

    for k, (w, n) in results.items():
        print(f"{k}: {w:.1f} s, {n} rows", flush=True)
    results = {}

    if ops & EMB_OPS:
        from ptrail_ray.functions.ann import _stack, brute_force_topk

        emb = build_embeddings()
        print(f"embeddings: {len(emb)} vecs", flush=True)
        eds = rd.from_pandas(emb, override_num_blocks=64).materialize()
        qdf = emb.head(20)
        queries = _stack(qdf["embedding"])

        if "ann_filtered" in ops:
            t0 = time.perf_counter()
            # pandas format: the replica embeddings column is a python
            # list column, which Arrow batch conversion rejects
            cand = eds.map_batches(
                lambda df: df[df["vec_id"] % 2 == 0],
                batch_format="pandas",
                batch_size=None,
            )
            out = brute_force_topk(cand, queries, k=10)
            results["ann_filtered"] = (time.perf_counter() - t0, len(out))
        if "knn" in ops:
            t0 = time.perf_counter()
            topk = brute_force_topk(eds, queries, k=10)
            results["knn_topk"] = (time.perf_counter() - t0, len(topk))

    for k, (w, n) in results.items():
        print(f"{k}: {w:.1f} s, {n} rows", flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
