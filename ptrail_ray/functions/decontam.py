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
identity set is collected once (loud ``max_bench_grams`` guard — no
silent caps) and broadcast via `ray.put`; the corpus side is a
stateless `map_batches` with NO shuffle — corpus text never leaves
its task.

Gram identity is a pair of two independent 64-bit hashes (stable
SipHash of each UNIQUE token via ``pd.util.hash_array``, combined over
the window by a wrapping polynomial) — effectively 128 bits, the same
collision budget as `dedup.content_rep_map` (<1e-18 at 10⁹ grams), so
gram STRINGS are never materialized: tokenization is the Arrow
kernel chain (`tokenize.encoded_tokens`), token hashes are computed
once per batch-unique token, and window combination is pure wrapping
uint64 arithmetic over the flat token array (winnow-style boundary
masking). Membership is a binary search against the sorted broadcast
pair set. The DuckDB oracle compares gram strings — agreement is
exact up to 128-bit hash collisions.

Documents shorter than ``n`` tokens have no n-grams and can never be
flagged (same rule as the SQL ``CASE WHEN len(toks) < n``).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ptrail_ray.functions.tokenize import encoded_tokens

TEXT_BATCH = 16_384

_HASH_KEY2 = "fedcba9876543210"  # second independent SipHash key
_P1 = np.uint64(1099511628211)  # FNV-1a prime (odd → bijective step)
_P2 = np.uint64(0x9E3779B97F4A7C15)  # 2^64/φ, odd


def _gram_hashes(col, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h1, h2, doc_index) for every word n-gram fully inside one doc —
    no gram strings, no per-window Python: token hashes once per
    batch-unique token, then n wrapping multiply-adds over the flat
    stream."""
    codes, vocab, idx = encoded_tokens(col)
    m = len(codes) - n + 1
    e = np.array([], np.uint64)
    if len(codes) == 0 or m <= 0:
        return e, e, np.array([], np.int64)
    vs = np.asarray(vocab.to_pylist(), dtype=object)
    th1 = pd.util.hash_array(vs, categorize=False).astype(np.uint64)
    th2 = pd.util.hash_array(vs, hash_key=_HASH_KEY2, categorize=False).astype(np.uint64)
    f1, f2 = th1[codes], th2[codes]
    # window [j, j+n-1] lies in one doc iff its endpoints agree (idx is
    # non-decreasing) — the winnow-kernel boundary rule
    valid = idx[:m] == idx[n - 1 :]
    g1 = np.zeros(m, np.uint64)
    g2 = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            g1 = g1 * _P1 + f1[j : j + m]
            g2 = g2 * _P2 + f2[j : j + m]
    return g1[valid], g2[valid], idx[:m][valid]


def _bench_partial(t: pa.Table, *, text_col: str, n: int) -> pa.Table:
    g1, g2, _ = _gram_hashes(t[text_col], n)
    if len(g1):
        u = np.unique(np.stack([g1, g2], axis=1), axis=0)
        g1, g2 = u[:, 0], u[:, 1]
    return pa.table({"g1": pa.array(g1, pa.uint64()), "g2": pa.array(g2, pa.uint64())})


def _flag_batch(
    t: pa.Table, *, bench_ref, n: int, id_col: str, text_col: str,
    keep_cols: bool = False,
) -> pa.Table:
    b1, b2 = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
    ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    g1, g2, doc_of = _gram_hashes(t[text_col], n)
    n_overlap = np.zeros(len(ids), np.int64)
    if len(g1) and len(b1):
        # b1 sorted (lexsort by (g1, g2) upstream); distinct grams share
        # an h1 with probability ~m²/2⁶⁵, so a single probe suffices
        pos = np.searchsorted(b1, g1).clip(max=len(b1) - 1)
        hit = (b1[pos] == g1) & (b2[pos] == g2)
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
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct n-gram identities (two sorted uint64 hash arrays,
    lexsorted by (h1, h2)) of the benchmark set — per-batch unique
    partials, bounded driver union, loud guard."""
    parts = ds.map_batches(
        functools.partial(_bench_partial, text_col=text_col, n=n),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).to_pandas()
    pairs = np.stack(
        [parts["g1"].to_numpy(np.uint64), parts["g2"].to_numpy(np.uint64)], axis=1
    )
    u = np.unique(pairs, axis=0) if len(pairs) else pairs.reshape(0, 2)
    if len(u) > max_bench_grams:
        raise ValueError(
            f"benchmark n-gram set {len(u)} exceeds max_bench_grams="
            f"{max_bench_grams}; the benchmark side must stay broadcastable "
            "— decontam does not silently truncate"
        )
    return np.ascontiguousarray(u[:, 0]), np.ascontiguousarray(u[:, 1])


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
