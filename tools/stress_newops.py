"""Stress-bench the late-r04 operators at 100k docs / 40k vectors.

Same deterministic replica corpus as `tools/stress_neardup.py` (20
replicas of the sf0.1 documents/embeddings tables), 32 CPUs; one wall +
row count per op. Usage:

    python tools/stress_newops.py [op ...]   # default: all
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stress_neardup import build_corpus, build_embeddings  # noqa: E402


def main() -> int:
    ops = sys.argv[1:] or [
        "postings", "bm25", "norm_dedup", "zip_index", "bloom", "covariance",
    ]

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
    if set(ops) & {"postings", "bm25", "norm_dedup", "zip_index", "bloom"}:
        corpus = build_corpus()
        print(f"corpus: {len(corpus)} docs", flush=True)
        ds = rd.from_pandas(corpus, override_num_blocks=64).materialize()

        if "postings" in ops:
            from ptrail_ray.functions.textstats import postings

            t0 = time.perf_counter()
            n = postings(ds, batch_size=None).count()
            results["postings"] = (time.perf_counter() - t0, n)
        if "bm25" in ops:
            from ptrail_ray.functions.retrieval import bm25_scores

            t0 = time.perf_counter()
            n = bm25_scores(
                ds, ["join", "window", "dup", "spark"], batch_size=None
            ).count()
            results["bm25"] = (time.perf_counter() - t0, n)
        if "norm_dedup" in ops:
            from ptrail_ray.functions.dedup import exact_dedup
            from ptrail_ray.functions.textstats import add_normalize_text

            t0 = time.perf_counter()
            n = exact_dedup(add_normalize_text(ds), text_col="text_norm").count()
            results["norm_dedup"] = (time.perf_counter() - t0, n)
        if "zip_index" in ops:
            from ptrail_ray.functions.sample import zip_with_index

            t0 = time.perf_counter()
            n = zip_with_index(ds.select_columns(["doc_id"]), id_col="doc_id").count()
            results["zip_index"] = (time.perf_counter() - t0, n)
        if "bloom" in ops:
            import pyarrow as pa

            from ptrail_ray.functions.decontam import bloom_overlap_flags

            def keep_bench(t: pa.Table) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array(ids % 97 == 0))

            bench = ds.map_batches(keep_bench, batch_format="pyarrow")
            t0 = time.perf_counter()
            n = bloom_overlap_flags(ds, bench, n=3).count()
            results["bloom_decontam"] = (time.perf_counter() - t0, n)

    if "covariance" in ops:
        from ptrail_ray.functions.linalg import embedding_covariance

        emb = build_embeddings()
        print(f"embeddings: {len(emb)} vecs", flush=True)
        eds = rd.from_pandas(emb, override_num_blocks=64).materialize()
        t0 = time.perf_counter()
        out = embedding_covariance(eds, batch_size=None)
        results["embedding_covariance"] = (time.perf_counter() - t0, len(out))

    for k, (w, n) in results.items():
        print(f"{k}: {w:.1f} s, {n} rows", flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
