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
):
    """documents Dataset → deduped, quality- and language-gated corpus
    with token counts. Returns (doc_id, n_tokens, quality, lang_pred)
    plus the surviving text."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ptrail_ray.functions.dedup import exact_dedup
    from ptrail_ray.functions.textstats import add_lang_id, add_text_stats

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

    return d.map_batches(gate, batch_format="pyarrow", batch_size=65536)
