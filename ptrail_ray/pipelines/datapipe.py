"""Training-data corpus cleaning pipeline — the documents-table
flagship, composing the training-data operators the way a pretraining
data pipeline would run them at 100 TB:

    read documents
      → exact dedup          (content-hash shuffle, keep min doc_id)
      → text stats           (Arrow regex kernels, narrow)
      → language ID          (stopword profile, narrow)
      → quality + language gate (stateless mask)
      → [optionally] near-dup pass / partitioned write

Every stage is a narrow vectorized transform except the dedup
exchanges; the whole chain streams. ``near_dup=True`` inserts the full
MinHash-LSH → verified pairs → connected-components → canonical-doc
drop between the exact dedup and the stats stages — and BOTH variants
are oracle-checked end-to-end (`q_clean_corpus`,
`q_clean_corpus_neardup`).
"""

from __future__ import annotations


def clean_corpus(
    docs,
    *,
    min_quality: int = 2,
    lang: str = "en",
    near_dup: bool = False,
    jaccard_threshold: float = 0.5,
    scrub_patterns=None,
    decontam_bench=None,
    decontam_n: int = 2,
):
    """documents Dataset → deduped, quality- and language-gated corpus
    with token counts. Returns (doc_id, n_tokens, quality, lang_pred)
    plus the surviving text.

    ``scrub_patterns``: (name, regex, replacement) triples — masks the
    text FIRST (functions/pii.py), so dedup keys, stats, language ID
    and gating all see the scrubbed text (the order a production prep
    pipeline runs: PII never reaches any downstream artifact).
    ``decontam_bench``: a benchmark Dataset — after the quality gate,
    docs sharing any ``decontam_n``-gram with it are DROPPED
    (functions/decontam.py; gram set broadcast once, no corpus
    shuffle). Both stages compose streaming; the full chain is
    oracle-replayed end-to-end by ``q_clean_corpus_full``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ptrail_ray.functions.dedup import exact_dedup
    from ptrail_ray.functions.textstats import add_lang_id, add_text_stats

    if scrub_patterns:
        from ptrail_ray.functions.pii import add_scrub

        def swap_text(t: pa.Table) -> pa.Table:
            t = t.set_column(
                t.schema.get_field_index("text"), "text", t["scrubbed"]
            )
            drop = ["scrubbed"] + [f"n_{n}" for n, _, _ in scrub_patterns]
            return t.drop_columns(drop)

        docs = add_scrub(docs, patterns=scrub_patterns).map_batches(
            swap_text, batch_format="pyarrow", batch_size=65536
        )

    d = exact_dedup(docs)
    if near_dup:
        from ptrail_ray.functions.dedup import dedup_by_cluster, minhash_lsh_pairs

        # the exact-deduped set feeds two consumers (signatures + the
        # verify text side) — checkpoint it once instead of recomputing
        # the dedup exchange per consumer (at 100 TB this is the natural
        # stage-boundary checkpoint; the object store spills as needed)
        d = d.materialize()
        pairs = minhash_lsh_pairs(d, jaccard_threshold=jaccard_threshold)
        d = dedup_by_cluster(d, pairs)
    d = add_text_stats(d)
    d = add_lang_id(d)

    def gate(t):
        m = pc.and_(
            pc.greater_equal(t["quality"], pa.scalar(min_quality)),
            pc.equal(t["lang_pred"], pa.scalar(lang)),
        )
        return t.filter(pc.fill_null(m, False))

    d = d.map_batches(gate, batch_format="pyarrow", batch_size=65536)
    if decontam_bench is not None:
        from ptrail_ray.functions.decontam import ngram_overlap_flags

        flagged = ngram_overlap_flags(
            d, decontam_bench, n=decontam_n, keep_cols=True
        )

        def drop_contaminated(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["contaminated"], False))
            return t.drop_columns(["n_overlap", "contaminated"])

        d = flagged.map_batches(
            drop_contaminated, batch_format="pyarrow", batch_size=65536
        )
    return d
