"""Exact substring-duplication signal (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" — the ExactSubstr signal,
re-expressed over word n-grams instead of a suffix array).

For every document: how many of its n-gram positions carry a gram that
also occurs in at least one OTHER document, corpus-wide. The per-doc
``dup_frac`` is the standard filter/weighting signal for removing
memorization-prone boilerplate from training corpora. The reference
has nothing comparable (row-exact drop_duplicates only,
ptrail/preprocessing/filters.py:38-64); this is a beyond-reference
training-data operator.

Distributed shape (NO driver-side gram set, unlike decontam whose
benchmark side is small by nature — here the dup-gram set is corpus-
sized and must never be collected):

    1. per-batch partial: 128-bit polynomial gram hashes over the flat
       token stream (``decontam._gram_hashes`` — no gram strings, token
       hashes once per batch-unique token), collapsed to one row per
       (gram, doc) with its occurrence count. Docs never span batches,
       so (gram, doc) rows are globally unique and partials merge by
       concatenation.
    2. ONE exchange keyed on the gram hash
       (``stages.bucket.grouped_agg_by_bucket``): every row of a gram
       lands in one bucket, where rows-per-gram IS its distinct-doc
       count; rows of grams with ≥2 docs are folded straight to
       per-doc duplicated-position partials (doc_id, n_dup) INSIDE the
       bucket — the dup-gram set itself is never materialized anywhere.
    3. a second, narrow exchange keyed on doc_id merges those partials
       with the per-doc total gram counts (computed batch-locally from
       token counts, zero extra hashing) into
       (doc_id, n_grams, n_dup, dup_frac).

Scale notes: the (gram, doc, occ) stream is O(token positions) rows of
28 bytes — the inherent exchange cost of exact substring-dup detection
without a global suffix array; within-doc gram repeats are pre-folded
by the batch partial. The doc_id exchange moves 3 ints per doc.
Agreement with the string-gram SQL oracle is exact up to 128-bit hash
collisions (<1e-18 at 1e9 grams, same budget as decontam/content maps).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

from ptrail_ray.functions.decontam import _gram_hashes
from ptrail_ray.functions.tokenize import arrow_tokens
from ptrail_ray.stages.bucket import grouped_agg_by_bucket

TEXT_BATCH = 16_384


def _gram_doc_partial(
    t: pa.Table, *, id_col: str, text_col: str, n: int
) -> pa.Table:
    """One row per (gram, doc) present in this batch: (g1, g2, doc_id,
    occ) — occ counts the gram's positions within the doc."""
    ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    g1, g2, doc_of = _gram_hashes(t[text_col], n)
    if len(g1) == 0:
        e64 = pa.array([], pa.uint64())
        return pa.table(
            {
                "g1": e64,
                "g2": e64,
                "doc_id": pa.array([], pa.int64()),
                "occ": pa.array([], pa.int64()),
            }
        )
    order = np.lexsort((g2, g1, doc_of))
    G1, G2, D = g1[order], g2[order], doc_of[order]
    new = np.empty(len(G1), dtype=bool)
    new[0] = True
    new[1:] = (D[1:] != D[:-1]) | (G1[1:] != G1[:-1]) | (G2[1:] != G2[:-1])
    starts = np.flatnonzero(new)
    occ = np.diff(np.append(starts, len(G1))).astype(np.int64)
    return pa.table(
        {
            "g1": pa.array(G1[starts], pa.uint64()),
            "g2": pa.array(G2[starts], pa.uint64()),
            "doc_id": pa.array(ids[D[starts]], pa.int64()),
            "occ": pa.array(occ, pa.int64()),
        }
    )


def _dup_fold(tb: pa.Table) -> pa.Table:
    """Per gram-hash bucket: rows-per-gram = distinct-doc count (rows
    are globally unique per (gram, doc)); fold rows of ≥2-doc grams to
    per-doc duplicated-position sums."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_grams": pa.array([], pa.int64()),
            "n_dup": pa.array([], pa.int64()),
        }
    )
    m = tb.num_rows
    if m == 0:
        return empty
    g1 = tb["g1"].to_numpy(zero_copy_only=False)
    g2 = tb["g2"].to_numpy(zero_copy_only=False)
    doc = tb["doc_id"].to_numpy(zero_copy_only=False)
    occ = tb["occ"].to_numpy(zero_copy_only=False)
    order = np.lexsort((g2, g1))
    G1, G2 = g1[order], g2[order]
    new = np.empty(m, dtype=bool)
    new[0] = True
    new[1:] = (G1[1:] != G1[:-1]) | (G2[1:] != G2[:-1])
    run_id = np.cumsum(new) - 1
    run_len = np.bincount(run_id)
    dup_rows = order[run_len[run_id] >= 2]
    if len(dup_rows) == 0:
        return empty
    d = doc[dup_rows]
    codes, uniq = pd.factorize(d, sort=False)
    n_dup = np.bincount(codes, weights=occ[dup_rows]).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(uniq, pa.int64()),
            "n_grams": pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
            "n_dup": pa.array(n_dup, pa.int64()),
        }
    )


def _totals_partial(
    t: pa.Table, *, id_col: str, text_col: str, n: int
) -> pa.Table:
    """(doc_id, n_grams, n_dup=0) per input row — max(len(toks)−n+1, 0)
    from the same whitespace token model, no hashing."""
    ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    _, idx = arrow_tokens(t[text_col])
    cnt = np.bincount(idx, minlength=len(ids)).astype(np.int64)
    n_grams = np.maximum(cnt - (n - 1), 0)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_dup": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
        }
    )


def dup_ngram_stats(
    ds,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    batch_size: int = TEXT_BATCH,
):
    """Per-doc exact substring-duplication stats — module docstring.

    Returns a Dataset of (doc_id, n_grams, n_dup, dup_frac): total
    n-gram positions, positions whose gram occurs in ≥2 distinct docs,
    and their ratio (NULL when the doc has no n-grams).
    """
    pairs = ds.map_batches(
        functools.partial(
            _gram_doc_partial, id_col=id_col, text_col=text_col, n=n
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    dups = grouped_agg_by_bucket(
        pairs,
        ["g1", "g2"],
        _dup_fold,
        num_buckets=num_buckets,
        group_format="pyarrow",
    )
    totals = ds.map_batches(
        functools.partial(
            _totals_partial, id_col=id_col, text_col=text_col, n=n
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def merge(tb: pa.Table) -> pa.Table:
        doc = tb["doc_id"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(doc, sort=False)
        ng = np.bincount(
            codes, weights=tb["n_grams"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        nd = np.bincount(
            codes, weights=tb["n_dup"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(ng > 0, nd / np.maximum(ng, 1), np.nan)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "n_grams": pa.array(ng, pa.int64()),
                "n_dup": pa.array(nd, pa.int64()),
                "dup_frac": pa.array(frac, pa.float64()),
            }
        )

    return grouped_agg_by_bucket(
        totals.union(dups),
        "doc_id",
        merge,
        num_buckets=num_buckets,
        group_format="pyarrow",
    )
