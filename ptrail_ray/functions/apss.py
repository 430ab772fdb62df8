"""All-pairs similarity search (APSS) over sparse TF-weighted vectors.

The inverted-index cosine join (Bayardo et al., WWW'07 "Scaling Up
All Pairs Similarity Search" — public): every document pair sharing a
non-stop term gets its EXACT cosine over ratio-idf TF vectors, pairs
below the threshold dropped. The sparse complement of
`functions/ann.cosine_pairs` (dense embeddings): here similarity comes
from the TEXT itself, the candidate structure is the inverted index,
and the candidate volume is bounded by the MOSS-style stop-term rule
(terms with document frequency > max_df are excluded from vectors and
norms — the same contract as `dedup.containment_pairs`, replayed
exactly by the SQL oracle). ``ngram=2`` (word bigrams) is the default
term space: the synthetic corpus's ~31-word unigram vocabulary puts
every unigram's df at ~0.8·N (all stop or all kept — the containment
k=3 degenerate regime); bigrams restore Zipf-ish discrimination.

Scale shape — text never shuffles, three narrow exchanges:
1. df pass: per-batch distinct-(doc, term) partials → one term
   exchange → Heaps-bounded driver vocab with a LOUD ``max_vocab``
   guard; the kept (term → df) map broadcasts once via ``ray.put``.
2. Per-batch weight pass (stateless): a doc lives whole in its row, so
   tf, the filtered weight w = tf·N/df, the exact-int norm
   ``Σ round(w²·1e9)``, and the unit weights x = w/‖w‖ are all final
   inside the batch. Only (term, doc, x) postings leave.
3. Pair exchange on term: per bucket a vectorized self-merge per term
   emits int64-quantized contribution partials round(x_a·x_b·1e9),
   pre-aggregated by pair before anything moves — volume
   Σ_t C(df_t, 2), df ≤ max_df by the stop rule.
4. Pair-keyed exchange sums the exact ints; cosine = Σ/1e9, one float
   division — bit-identical to the SQL replica, order-free under any
   batch split.

Exactness: N·tf is exact int; /df is ONE IEEE division; x products are
rounded to 1e-9 before summation on both engines. sqrt is IEEE
correctly-rounded, so norms agree bitwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.functions.cluster import QUANT_SCALE, _quant_int64

_EMPTY_POSTS = {
    "term": pa.array([], pa.string()),
    "doc": pa.array([], pa.int64()),
    "x": pa.array([], pa.float64()),
}


def _term_codes(col, ngram: int):
    """(codes, vocab, row idx) for the chosen term space: unigrams via
    the shared tokenizer, word bigrams via one shifted Arrow join +
    dictionary encode — C-speed, no Python per token."""
    from ptrail_ray.functions.tokenize import arrow_tokens, encoded_tokens

    if ngram == 1:
        return encoded_tokens(col)
    if ngram != 2:
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    flat, idx = arrow_tokens(col)
    n = len(flat)
    if n < 2:
        return np.zeros(0, np.int64), pa.array([], pa.string()), np.zeros(0, np.int64)
    same = idx[1:] == idx[:-1]
    bg = pc.binary_join_element_wise(
        flat.slice(0, n - 1).cast(pa.string()), flat.slice(1).cast(pa.string()), " "
    )
    bg = bg.filter(pa.array(same))
    de = pc.dictionary_encode(bg)
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    return (
        de.indices.to_numpy(zero_copy_only=False).astype(np.int64),
        de.dictionary,
        idx[:-1][same],
    )


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "s": pd.Series([], dtype="int64"),
        }
    )


def sparse_cosine_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int = 1000,
    ngram: int = 2,
    num_buckets: int = 32,
    max_vocab: int = 1 << 22,
    batch_size: int | None = 1 << 18,
):
    """Exact cosine ≥ ``threshold`` pairs over stop-filtered TF·(N/df)
    n-gram vectors. Returns a Dataset (doc_a, doc_b, cosine) with
    doc_a < doc_b."""
    import ray

    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    # the (id, text) projection is consumed three times (count, df pass,
    # weight pass) — pin it once; callers that pre-materialized get a
    # no-op. The pair exchanges below move Σ_t C(df_t, 2) rows — far
    # more than the postings — so they run at 4× the bucket count
    # (measured at sf0.1: 9.0 s @16 → 6.3 s @64 pair buckets).
    ds = ds.materialize()
    pair_buckets = num_buckets * 4
    n_docs = ds.count()

    # global id range decides the pair-key representation for the
    # amplified exchanges: ids fitting 31 bits pack (doc_a, doc_b) into
    # ONE int64 column — a third less exchange payload and a single-
    # column bucket hash instead of the two-column mix. One cheap
    # min/max pass over the pinned projection.
    def _id_minmax(t: pa.Table) -> pa.Table:
        v = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0:
            return pa.table(
                {"mn": pa.array([], pa.int64()), "mx": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "mn": pa.array([int(v.min())], pa.int64()),
                "mx": pa.array([int(v.max())], pa.int64()),
            }
        )

    _mm = ds.map_batches(
        _id_minmax, batch_format="pyarrow", batch_size=1 << 20
    ).to_pandas()
    packed = (
        len(_mm) > 0
        and int(_mm["mn"].min()) >= 0
        and int(_mm["mx"].max()) < (1 << 31)
    )

    # ---- pass 1: document frequency over the term space -------------
    def df_partial(t: pa.Table) -> pa.Table:
        codes, vocab, idx = _term_codes(t[text_col], ngram)
        if len(codes) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        V = len(vocab)
        dt = np.unique(idx * V + codes)
        tcode, cnt = np.unique(dt % V, return_counts=True)
        return pa.table(
            {
                "term": vocab.take(pa.array(tcode)).cast(pa.string()),
                "df": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def df_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", as_index=False, sort=False)["df"].sum()

    vocab_df = grouped_agg_by_bucket(
        ds.map_batches(df_partial, batch_format="pyarrow", batch_size=batch_size),
        "term",
        df_combine,
        num_buckets=num_buckets,
        partial_batch=None,
    ).to_pandas()
    if len(vocab_df) > max_vocab:
        raise ValueError(
            f"sparse_cosine_pairs: vocabulary {len(vocab_df)} exceeds "
            f"max_vocab={max_vocab} — loud failure, never truncation"
        )
    keep = vocab_df[vocab_df["df"] <= max_df]
    df_ref = ray.put(dict(zip(keep["term"], keep["df"].astype(np.int64))))

    # ---- pass 2: per-batch unit weights (doc-local, stateless) ------
    def weights(t: pa.Table) -> pa.Table:
        codes, vocab, idx = _term_codes(t[text_col], ngram)
        if len(codes) == 0:
            return pa.table(_EMPTY_POSTS)
        df_map = ray.get(df_ref)
        V = len(vocab)
        vdf = np.array(
            [df_map.get(w, 0) for w in vocab.to_pylist()], np.int64
        )  # 0 = stop/absent
        doc = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = idx.astype(np.int64) * V + codes
        uk, tf = np.unique(key, return_counts=True)
        row, code = uk // V, uk % V
        ok = vdf[code] > 0
        row, code, tf = row[ok], code[ok], tf[ok].astype(np.int64)
        if len(row) == 0:
            return pa.table(_EMPTY_POSTS)
        w = (tf * np.int64(n_docs)).astype(np.float64) / vdf[code].astype(np.float64)
        norm2 = np.zeros(t.num_rows, np.int64)
        np.add.at(norm2, row, _quant_int64(w * w))
        nr = np.sqrt(norm2.astype(np.float64) / QUANT_SCALE)
        x = w / nr[row]
        return pa.table(
            {
                "term": vocab.take(pa.array(code)).cast(pa.string()),
                "doc": pa.array(doc[row], pa.int64()),
                "x": pa.array(x, pa.float64()),
            }
        )

    posts = ds.map_batches(weights, batch_format="pyarrow", batch_size=batch_size)

    # ---- pass 3: per-term pair contributions, pre-aggregated --------
    # fully vectorized: the per-term all-pairs expansion is the same
    # repeat/arange trick as graph.triangle_count's wedge generation
    # (no pandas self-merge — that allocates Σ_t df_t² rows through a
    # hash join and was 15 s of the sf0.1 wall); aggregation is
    # sort + add.reduceat on int64 (exact, no float accumulation)
    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_pairs()
        tc, _ = pd.factorize(df["term"], sort=False)
        doc = df["doc"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.float64)
        order = np.argsort(tc, kind="stable")
        tc, doc, x = tc[order], doc[order], x[order]
        starts = np.flatnonzero(np.r_[True, tc[1:] != tc[:-1]])
        lengths = np.diff(np.r_[starts, len(tc)])
        pos = np.arange(len(tc), dtype=np.int64) - np.repeat(starts, lengths)
        cnt = np.repeat(lengths, lengths) - 1 - pos
        total = int(cnt.sum())
        if total == 0:
            return _empty_pairs()
        i_flat = np.repeat(np.arange(len(tc), dtype=np.int64), cnt)
        coff = np.concatenate([[0], np.cumsum(cnt)])
        j_flat = i_flat + (np.arange(total, dtype=np.int64) - coff[i_flat]) + 1
        da, db = doc[i_flat], doc[j_flat]
        lo = np.minimum(da, db)
        hi = np.maximum(da, db)
        contrib = _quant_int64(x[i_flat] * x[j_flat])
        if packed:
            pk = (lo << np.int64(32)) | hi
            o2 = np.argsort(pk, kind="stable")
            pk, contrib = pk[o2], contrib[o2]
            b = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
            return pd.DataFrame(
                {"pk": pk[b], "s": np.add.reduceat(contrib, b)}
            )
        o2 = np.lexsort((hi, lo))
        lo, hi, contrib = lo[o2], hi[o2], contrib[o2]
        b = np.flatnonzero(np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
        return pd.DataFrame(
            {
                "doc_a": lo[b],
                "doc_b": hi[b],
                "s": np.add.reduceat(contrib, b),
            }
        )

    parts = grouped_agg_by_bucket(
        posts, "term", pair_partials, num_buckets=pair_buckets, partial_batch=None
    )

    thr = float(threshold)

    # ---- pass 4: exact pair sums → cosine, threshold ----------------
    def _empty_out() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )

    def finalize_pairs_pk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_out()
        pk = df["pk"].to_numpy(np.int64)
        s = df["s"].to_numpy(np.int64)
        o = np.argsort(pk, kind="stable")
        pk, s = pk[o], s[o]
        b = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        sums = np.add.reduceat(s, b)
        cos = sums.astype(np.float64) / QUANT_SCALE
        keep = cos >= thr
        upk = pk[b][keep]
        return pd.DataFrame(
            {
                "doc_a": upk >> np.int64(32),
                "doc_b": upk & np.int64(0xFFFFFFFF),
                "cosine": cos[keep],
            }
        )

    def finalize_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_out()
        lo = df["doc_a"].to_numpy(np.int64)
        hi = df["doc_b"].to_numpy(np.int64)
        s = df["s"].to_numpy(np.int64)
        o = np.lexsort((hi, lo))
        lo, hi, s = lo[o], hi[o], s[o]
        b = np.flatnonzero(np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
        sums = np.add.reduceat(s, b)
        cos = sums.astype(np.float64) / QUANT_SCALE
        keep = cos >= thr
        return pd.DataFrame(
            {
                "doc_a": lo[b][keep],
                "doc_b": hi[b][keep],
                "cosine": cos[keep],
            }
        )

    if packed:
        return grouped_agg_by_bucket(
            parts, "pk", finalize_pairs_pk,
            num_buckets=pair_buckets, partial_batch=None,
        )
    return grouped_agg_by_bucket(
        parts,
        ["doc_a", "doc_b"],
        finalize_pairs,
        num_buckets=pair_buckets,
        partial_batch=None,
    )
