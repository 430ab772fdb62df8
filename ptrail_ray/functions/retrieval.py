"""BM25 retrieval scoring over a document corpus.

The search-side consumer of the inverted-index primitive
(`functions/textstats.postings`): score every document against a small
query-term set with Okapi BM25. The reference has no text retrieval at
all — this is a beyond-reference training-data operator (lexical
nearest neighbor, the workhorse of dedup-by-retrieval and RAG-corpus
curation).

Design for 100 TB — two streaming passes, nothing wide:

1. **Corpus-stats pass**: per-batch partials carrying (#docs, Σdl) on
   one stats row plus per-query-term document frequencies — ≤ |Q|+1
   rows per batch (the combiner pattern), merged on the driver into
   scalars. |Q| is small (a query), so the merge is bounded by
   construction.
2. **Scoring pass**: stats broadcast in the task closure (a few
   floats); per batch, tokenize → dictionary-encode → keep query
   terms → per-(doc, term) tf via one packed-key ``np.unique`` → BM25
   contribution per term → per-doc sum. A document lives whole in one
   row, so its score is FINAL within its batch: no exchange anywhere.

Exactness for the value-hash gate: per-(doc, term) contributions are
quantized to int64 (`_quant_int64`, the DuckDB
``CAST(round(x*1e9) AS BIGINT)`` replica) so the per-doc sum is integer
— order-independent — and every float subexpression (idf, tf scaling)
is written in the exact operand order of the SQL replica in
`entry_queries.q_bm25`. ``ln`` resolves to the same libm on both
engines (same container), the precedent set by the exact-gated
``log2`` in `q_char_entropy`.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.functions.cluster import QUANT_SCALE, _quant_int64
from ptrail_ray.functions.tokenize import arrow_tokens

_STATS_ROW = ""  # term value of the once-per-batch corpus-scalar row


def _doclens(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """(flat tokens, token→row index, per-row token count) — dl counts
    tokens AFTER the empty filter, matching SQL ``len(list_filter(…))``
    (whitespace splitting never yields an empty token anyway)."""
    flat, idx = arrow_tokens(col)
    dl = np.bincount(idx, minlength=len(col)).astype(np.int64)
    return flat, idx, dl


def _stats_partial(t: pa.Table, *, text_col: str, terms: tuple) -> pa.Table:
    """One stats row (term='', df=0, n_docs, Σdl) per batch + one df
    row per query term present in the batch (scalars zeroed there)."""
    flat, idx, dl = _doclens(t[text_col])
    rows_term, rows_df = [_STATS_ROW], [0]
    if len(flat):
        tok = flat.to_numpy(zero_copy_only=False)
        for q in terms:
            df = len(np.unique(idx[tok == q]))  # distinct docs containing q
            if df:
                rows_term.append(q)
                rows_df.append(df)
    k = len(rows_term)
    n_docs = np.zeros(k, np.int64)
    sumdl = np.zeros(k, np.int64)
    n_docs[0], sumdl[0] = len(t), int(dl.sum())
    return pa.table(
        {
            "term": pa.array(rows_term, pa.string()),
            "df": pa.array(np.asarray(rows_df, np.int64), pa.int64()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "sumdl": pa.array(sumdl, pa.int64()),
        }
    )


def _score_batch(
    t: pa.Table,
    *,
    text_col: str,
    id_col: str,
    dfs: dict,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
) -> pa.Table:
    empty = pa.table(
        {id_col: pa.array([], pa.int64()), "bm25": pa.array([], pa.float64())}
    )
    flat, idx, dl = _doclens(t[text_col])
    if len(flat) == 0:
        return empty
    de = pc.dictionary_encode(flat)
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    vocab = de.dictionary.to_pylist()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # idf per vocab slot for query terms, NaN elsewhere (Zipf: the loop
    # is per UNIQUE batch term, never per token)
    idf_slot = np.full(len(vocab), np.nan)
    for ci, w in enumerate(vocab):
        df = dfs.get(w)
        if df:
            # SQL operand order: ln((n_docs - df + 0.5)/(df + 0.5) + 1.0)
            idf_slot[ci] = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    keep = ~np.isnan(idf_slot[codes])
    if not keep.any():
        return empty
    codes_k, idx_k = codes[keep], idx[keep]
    key = idx_k * len(vocab) + codes_k
    uk, tf = np.unique(key, return_counts=True)
    rows, cods = uk // len(vocab), uk % len(vocab)
    tf = tf.astype(np.float64)
    dlr = dl[rows].astype(np.float64)
    # SQL operand order: (tf*(k1+1.0)) / (tf + k1*((1.0-b) + (b*dl)/avgdl))
    tfc = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * dlr) / avgdl))
    contrib = _quant_int64(idf_slot[cods] * tfc)
    sums = np.zeros(len(t), np.int64)
    np.add.at(sums, rows, contrib)
    hit = np.zeros(len(t), bool)
    hit[rows] = True
    doc = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[hit]
    score = sums[hit].astype(np.float64) / QUANT_SCALE
    return pa.table(
        {id_col: pa.array(doc, pa.int64()), "bm25": pa.array(score, pa.float64())}
    )


def bm25_scores(
    ds,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    batch_size: int | None = 1 << 18,
):
    """BM25 score of every document containing ≥1 query term.

    Returns a Dataset of (id_col, bm25). See module docstring for the
    two-pass scale design and the exactness contract.
    """
    terms = tuple(dict.fromkeys(query_terms))
    parts = ds.map_batches(
        functools.partial(_stats_partial, text_col=text_col, terms=terms),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).to_pandas()
    stats = parts[parts["term"] == _STATS_ROW]
    n_docs = int(stats["n_docs"].sum())
    sumdl = int(stats["sumdl"].sum())
    if n_docs == 0:
        raise ValueError("bm25_scores: empty corpus")
    g = parts[parts["term"] != _STATS_ROW].groupby("term")["df"].sum()
    dfs = {w: int(c) for w, c in g.items() if c > 0}
    # SQL operand order: CAST(sumdl AS DOUBLE) / n_docs
    avgdl = float(sumdl) / float(n_docs)
    return ds.map_batches(
        functools.partial(
            _score_batch,
            text_col=text_col,
            id_col=id_col,
            dfs=dfs,
            n_docs=n_docs,
            avgdl=avgdl,
            k1=k1,
            b=b,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
