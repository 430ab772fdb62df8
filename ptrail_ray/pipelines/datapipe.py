"""Training-data corpus cleaning pipeline — the documents-table
flagship, composing the training-data operators the way a pretraining
data pipeline would run them at 100 TB:

    read documents
      → exact dedup          (content-hash shuffle, keep min doc_id)
      → text stats           (Arrow regex kernels, narrow)
      → language ID          (stopword profile, narrow)
      → quality + language gate (stateless mask)
      → [optionally] near-dup pass / partitioned write

Every stage is a narrow vectorized transform except the single
dedup exchange; the whole chain streams. The near-dup stage
(minhash_lsh_pairs) is kept OUT of the oracle-checked default path —
its pair table feeds a separate drop step — so the driver query stays
fully SQL-verifiable.
"""

from __future__ import annotations


def clean_corpus(docs, *, min_quality: int = 2, lang: str = "en"):
    """documents Dataset → deduped, quality- and language-gated corpus
    with token counts. Returns (doc_id, n_tokens, quality, lang_pred)
    plus the surviving text."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ptrail_ray.functions.dedup import exact_dedup
    from ptrail_ray.functions.textstats import add_lang_id, add_text_stats

    d = exact_dedup(docs)
    d = add_text_stats(d)
    d = add_lang_id(d)

    def gate(t):
        m = pc.and_(
            pc.greater_equal(t["quality"], pa.scalar(min_quality)),
            pc.equal(t["lang_pred"], pa.scalar(lang)),
        )
        return t.filter(pc.fill_null(m, False))

    return d.map_batches(gate, batch_format="pyarrow", batch_size=65536)
