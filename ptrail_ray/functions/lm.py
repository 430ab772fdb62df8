"""Corpus unigram language-model scoring (CCNet-style quality signal).

CCNet / RedPajama rank documents by language-model perplexity to
select "natural" text; the in-container analog (no KenLM binaries
here) is the corpus's own unigram model: every document scored by the
mean log-probability of its tokens under global term frequencies.
Low scorers are boilerplate/rare-token noise, high scorers are
stop-word soup — both ends are what quality gates trim. Shares the
whitespace token model of `textstats`/`tfidf` so one SQL token model
replays every text query. Beyond-reference (the reference has no text
ops).

Design for 100 TB, two passes (same shape as `tfidf`):

1. global term counts — per-batch dictionary-encode partials, ONE bucket
   exchange, vocabulary collect bounded by Heaps' law and guarded by
   ``max_vocab`` (loud, never truncating);
2. scoring — the (term → count) map broadcast ONCE via `ray.put`,
   then a stateless `map_batches`: vectorized count lookup, per-token
   log-prob, per-doc mean. No shuffle; each doc lives in one batch.

Exactness: a float sum's accumulation order is nondeterministic on
both engines, so per-token log-probs are quantized to int64 at 1e-9
(`round(lp * 1e9)` half away from zero — the same GRANULAR_SCALE
trick as `stages/stats`) and summed exactly; the mean divides the
exact sum. Bit-identical under any batch split, and replayed verbatim
by the DuckDB oracle.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ptrail_ray.functions.cluster import _quant_int64
from ptrail_ray.functions.tfidf import TEXT_BATCH
from ptrail_ray.functions.tokenize import encoded_tokens


def term_counts(
    ds,
    *,
    text_col: str = "text",
    num_buckets: int = 32,
    max_vocab: int = 1 << 22,
    batch_size: int = TEXT_BATCH,
) -> pd.DataFrame:
    """Global (term, n) occurrence counts — one exchange, vocab-bounded."""
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def partial(t: pa.Table) -> pa.Table:
        codes, vocab, _ = encoded_tokens(t[text_col])
        if len(codes) == 0:
            return pa.table({"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        counts = np.bincount(codes, minlength=len(vocab))
        return pa.table(
            {"term": vocab.cast(pa.string()), "n": pa.array(counts.astype(np.int64), pa.int64())}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", as_index=False, sort=False)["n"].sum()

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    vocab = grouped_agg_by_bucket(parts, "term", combine, num_buckets=num_buckets).to_pandas()
    if len(vocab) > max_vocab:
        raise ValueError(
            f"vocabulary {len(vocab)} exceeds max_vocab={max_vocab}; "
            "raise the cap or pre-filter — lm does not silently truncate"
        )
    return vocab


def _score_batch(
    t: pa.Table, *, cnt_ref, total: int, id_col: str, text_col: str
) -> pa.Table:
    cnt_map: pd.Series = ray.get(cnt_ref) if isinstance(cnt_ref, ray.ObjectRef) else cnt_ref
    codes, vocab, idx = encoded_tokens(t[text_col])
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "mean_logprob": pa.array([], pa.float64()),
        }
    )
    if len(codes) == 0:
        return empty
    ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    # one lookup + one log per UNIQUE term, scattered by code (tokens
    # repeat heavily — Zipf — so this is ~vocab work, not ~token work)
    c = cnt_map.reindex(vocab.to_pylist()).to_numpy(np.float64)
    # DuckDB order: ln(CAST(c AS DOUBLE) / total), quantized to int64
    q = _quant_int64(np.log(c / float(total)))[codes]
    sums = np.bincount(idx, weights=None, minlength=len(ids))  # token counts
    qs = np.zeros(len(ids), np.int64)
    np.add.at(qs, idx, q)
    n_tok = sums.astype(np.int64)
    keep = n_tok > 0  # tokenless docs emit no score (SQL GROUP BY drops them)
    mean_lp = (qs[keep].astype(np.float64) / 1_000_000_000.0) / n_tok[keep].astype(
        np.float64
    )
    return pa.table(
        {
            id_col: pa.array(ids[keep], pa.int64()),
            "n_tokens": pa.array(n_tok[keep], pa.int64()),
            "mean_logprob": pa.array(mean_lp, pa.float64()),
        }
    )


def unigram_logprob(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    max_vocab: int = 1 << 22,
    batch_size: int = TEXT_BATCH,
):
    """Per-doc mean unigram log-probability (module docstring).

    Returns a Dataset of (id_col, n_tokens, mean_logprob); docs with
    no tokens emit no row.
    """
    vocab = term_counts(
        ds, text_col=text_col, num_buckets=num_buckets,
        max_vocab=max_vocab, batch_size=batch_size,
    )
    total = int(vocab["n"].sum())
    cnt_map = pd.Series(
        vocab["n"].to_numpy(np.int64), index=vocab["term"].to_numpy(dtype=object)
    )
    cnt_ref = ray.put(cnt_map)
    return ds.map_batches(
        functools.partial(
            _score_batch, cnt_ref=cnt_ref, total=total, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


# --- bigram LM (one Markov order up from the unigram model) -----------------


def bigram_counts(
    ds,
    *,
    text_col: str = "text",
    num_buckets: int = 32,
    max_bigrams: int = 1 << 24,
    batch_size: int = TEXT_BATCH,
) -> pd.DataFrame:
    """Global (w1, w2, n) bigram counts — per-batch int-coded partials
    (pairs never cross a doc: adjacent flat tokens with equal row idx),
    ONE composite-key exchange, loud ``max_bigrams`` guard."""
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        codes, vocab, idx = encoded_tokens(t[text_col])
        if len(codes) < 2:
            return empty
        same = idx[:-1] == idx[1:]
        if not same.any():
            return empty
        a, b = codes[:-1][same], codes[1:][same]
        key = a * len(vocab) + b
        uk, counts = np.unique(key, return_counts=True)
        ia = pa.array(uk // len(vocab), pa.int64())
        ib = pa.array(uk % len(vocab), pa.int64())
        return pa.table(
            {
                "w1": vocab.take(ia).cast(pa.string()),
                "w2": vocab.take(ib).cast(pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["w1", "w2"], as_index=False, sort=False)["n"].sum()

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    bg = grouped_agg_by_bucket(
        parts, ["w1", "w2"], combine, num_buckets=num_buckets
    ).to_pandas()
    if len(bg) > max_bigrams:
        raise ValueError(
            f"bigram vocabulary {len(bg)} exceeds max_bigrams={max_bigrams}; "
            "raise the cap or pre-filter — lm does not silently truncate"
        )
    return bg


def _bigram_score_batch(
    t: pa.Table, *, model_ref, id_col: str, text_col: str
) -> pa.Table:
    terms, hist, pair_keys, pair_counts, V = (
        ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "mean_logprob": pa.array([], pa.float64()),
        }
    )
    codes, vocab, idx = encoded_tokens(t[text_col])
    if len(codes) < 2:
        return empty
    ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    # map batch-local codes to GLOBAL term ids (every corpus token is in
    # the global vocab by construction)
    local_terms = np.asarray(vocab.to_pylist(), dtype=object)
    gid_of_local = np.searchsorted(terms, local_terms)
    g = gid_of_local[codes]
    same = idx[:-1] == idx[1:]
    if not same.any():
        return empty
    a, b = g[:-1][same], g[1:][same]
    row = idx[:-1][same]
    key = a * np.int64(V) + b
    pos = np.searchsorted(pair_keys, key).clip(max=max(len(pair_keys) - 1, 0))
    c12 = np.where(
        (len(pair_keys) > 0) & (pair_keys[pos] == key), pair_counts[pos], 0
    ).astype(np.float64)
    h = hist[a].astype(np.float64)
    # DuckDB order: ln((c12 + 1.0) / (hist + V)), quantized to int64
    q = _quant_int64(np.log((c12 + 1.0) / (h + float(V))))
    n_rows = len(ids)
    qs = np.zeros(n_rows, np.int64)
    np.add.at(qs, row, q)
    nb = np.bincount(row, minlength=n_rows).astype(np.int64)
    keep = nb > 0
    mean_lp = (qs[keep].astype(np.float64) / 1_000_000_000.0) / nb[keep].astype(
        np.float64
    )
    return pa.table(
        {
            id_col: pa.array(ids[keep], pa.int64()),
            "n_bigrams": pa.array(nb[keep], pa.int64()),
            "mean_logprob": pa.array(mean_lp, pa.float64()),
        }
    )


def bigram_logprob(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    max_vocab: int = 1 << 22,
    max_bigrams: int = 1 << 24,
    batch_size: int = TEXT_BATCH,
):
    """Per-doc mean Laplace-smoothed bigram conditional log-probability:
    mean over positions i≥1 of ln((c(w_{i−1}w_i) + 1) / (h(w_{i−1}) + V))
    with h = bigram-history count (occurrences with a successor) and
    V = distinct corpus terms — one Markov order above `unigram_logprob`
    (the CCNet-perplexity analog this container can own without KenLM).

    Two bounded passes + broadcast (same 100 TB shape as the unigram
    model); per-position log-probs int64-quantized so per-doc sums are
    order-independent and the DuckDB replica in
    `entry_queries.q_bigram_lp` is exact. Docs with <2 tokens emit no
    row (no bigram positions — SQL GROUP BY drops them identically).
    """
    vocab = term_counts(
        ds, text_col=text_col, num_buckets=num_buckets,
        max_vocab=max_vocab, batch_size=batch_size,
    )
    terms = np.sort(vocab["term"].to_numpy(dtype=object))
    V = len(terms)
    bg = bigram_counts(
        ds, text_col=text_col, num_buckets=num_buckets,
        max_bigrams=max_bigrams, batch_size=batch_size,
    )
    a = np.searchsorted(terms, bg["w1"].to_numpy(dtype=object))
    b = np.searchsorted(terms, bg["w2"].to_numpy(dtype=object))
    key = a * np.int64(V) + b
    order = np.argsort(key, kind="stable")
    pair_keys = key[order]
    pair_counts = bg["n"].to_numpy(np.int64)[order]
    hist = np.zeros(V, np.int64)
    np.add.at(hist, a, bg["n"].to_numpy(np.int64))
    model_ref = ray.put((terms, hist, pair_keys, pair_counts, V))
    return ds.map_batches(
        functools.partial(
            _bigram_score_batch, model_ref=model_ref, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
