"""Exact substring-dup signal: the hash-bucketed pipeline must equal a
brute-force string-gram count of positions whose gram occurs in ≥2
distinct docs, including the zero-gram (short doc) edge."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ptrail_ray.functions.substrdup import dup_ngram_stats


def _brute(docs, n):
    grams = {}
    per_doc = []
    for doc_id, text in docs:
        toks = text.split()
        gs = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        per_doc.append((doc_id, gs))
        for g in set(gs):
            grams.setdefault(g, set()).add(doc_id)
    out = {}
    for doc_id, gs in per_doc:
        n_dup = sum(1 for g in gs if len(grams[g]) >= 2)
        out[doc_id] = (len(gs), n_dup)
    return out


def test_dup_ngram_stats_matches_brute(ray_session):
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(12)]
    boiler = "the same boilerplate tail repeated verbatim everywhere"
    docs = []
    for i in range(40):
        body = " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        text = body + (" " + boiler if i % 3 == 0 else "")
        docs.append((i, text.strip()))
    docs.append((100, "short doc"))  # < n tokens → n_grams = 0
    n = 4
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs]),
            }
        )
    )
    got = (
        dup_ngram_stats(ds, n=n, num_buckets=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    ref = _brute(docs, n)
    assert set(got.index) == set(ref)
    for doc_id, (n_grams, n_dup) in ref.items():
        row = got.loc[doc_id]
        assert row["n_grams"] == n_grams, doc_id
        assert row["n_dup"] == n_dup, doc_id
        if n_grams == 0:
            assert np.isnan(row["dup_frac"])
        else:
            assert row["dup_frac"] == n_dup / n_grams
    # the boilerplate family must actually register duplication
    assert got["n_dup"].sum() > 0
