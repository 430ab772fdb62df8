"""Benchmark decontamination: n-gram overlap flags against a held-out set.

The GPT-3-style test-set decontamination op (Brown et al. 2020, App. C;
also The Pile / Dolma cleanup): flag every training document that
shares at least one word n-gram with any benchmark document, so
evaluation data can be excised from the corpus before training. The
reference has nothing comparable (numeric trajectory filters only);
this is a beyond-reference training-data operator, sharing the
whitespace token model of `textstats` / `dedup.winnow_batch` so the
DuckDB oracle replays identical gram construction.

Design for 100 TB: the BENCHMARK side is small by nature (eval suites
are thousands of documents, not the corpus), so its distinct n-gram
set is collected once (loud ``max_bench_grams`` guard — no silent
caps) and broadcast via `ray.put`; the corpus side is a stateless
`map_batches`: gram strings built once per batch, de-duplicated with
`np.unique`, membership via one C-speed ``np.isin`` against the
sorted benchmark array, per-doc overlap counts via ``np.bincount``.
No shuffle on the corpus side; corpus text never leaves its task.

Documents shorter than ``n`` tokens have no n-grams and can never be
flagged (same rule as the SQL ``CASE WHEN len(toks) < n``).
"""

from __future__ import annotations

import functools
import itertools as _it

import numpy as np
import pyarrow as pa

import ray

TEXT_BATCH = 16_384


def _gram_lists(texts: list, n: int) -> list[list[str]]:
    out = []
    for s in texts:
        toks = (s or "").split()
        if len(toks) < n:
            out.append([])
        else:
            out.append([" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)])
    return out


def _bench_partial(t: pa.Table, *, text_col: str, n: int) -> pa.Table:
    grams = list(_it.chain.from_iterable(_gram_lists(t[text_col].to_pylist(), n)))
    uniq = np.unique(np.array(grams, dtype=object)) if grams else np.array([], object)
    return pa.table({"gram": pa.array(uniq, pa.string())})


def _flag_batch(
    t: pa.Table, *, bench_ref, n: int, id_col: str, text_col: str,
    keep_cols: bool = False,
) -> pa.Table:
    bench: np.ndarray = (
        ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
    )
    ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    gl = _gram_lists(t[text_col].to_pylist(), n)
    lens = np.fromiter((len(g) for g in gl), np.int64, count=len(gl))
    flat = np.array(list(_it.chain.from_iterable(gl)), dtype=object)
    n_overlap = np.zeros(len(ids), np.int64)
    if len(flat) and len(bench):
        uniq, inv = np.unique(flat, return_inverse=True)
        # membership via searchsorted against the ALREADY-sorted bench
        # array (np.isin would re-sort the benchmark side every batch)
        pos = np.searchsorted(bench, uniq).clip(max=len(bench) - 1)
        hit = (bench[pos] == uniq)[inv]
        doc_of = np.repeat(np.arange(len(ids)), lens)
        n_overlap = np.bincount(doc_of[hit], minlength=len(ids)).astype(np.int64)
    if keep_cols:
        return t.append_column(
            "n_overlap", pa.array(n_overlap, pa.int64())
        ).append_column("contaminated", pa.array(n_overlap > 0, pa.bool_()))
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "n_overlap": pa.array(n_overlap, pa.int64()),
            "contaminated": pa.array(n_overlap > 0, pa.bool_()),
        }
    )


def bench_ngrams(
    ds,
    *,
    n: int = 5,
    text_col: str = "text",
    max_bench_grams: int = 1 << 26,
    batch_size: int = TEXT_BATCH,
) -> np.ndarray:
    """Distinct word n-grams of the benchmark set, sorted — per-batch
    unique partials, bounded driver union, loud guard."""
    parts = ds.map_batches(
        functools.partial(_bench_partial, text_col=text_col, n=n),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).to_pandas()
    grams = np.unique(parts["gram"].to_numpy(dtype=object))
    if len(grams) > max_bench_grams:
        raise ValueError(
            f"benchmark n-gram set {len(grams)} exceeds max_bench_grams="
            f"{max_bench_grams}; the benchmark side must stay broadcastable "
            "— decontam does not silently truncate"
        )
    return grams


def ngram_overlap_flags(
    corpus_ds,
    bench_ds,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bench_grams: int = 1 << 26,
    batch_size: int = TEXT_BATCH,
    keep_cols: bool = False,
):
    """Per-corpus-doc (id, n_overlap, contaminated) — module docstring.

    ``n_overlap`` counts overlapping gram POSITIONS (a gram repeated in
    the doc counts each occurrence), matching the SQL join count.
    ``keep_cols=True`` appends the two flag columns to the input rows
    instead (for in-pipeline filtering without a join).
    """
    bench_ref = ray.put(bench_ngrams(
        bench_ds, n=n, text_col=text_col,
        max_bench_grams=max_bench_grams, batch_size=batch_size,
    ))
    return corpus_ds.map_batches(
        functools.partial(
            _flag_batch, bench_ref=bench_ref, n=n, id_col=id_col,
            text_col=text_col, keep_cols=keep_cols,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
