"""Deduplication operators for web-scale corpora.

* exact_dedup          — md5 content hash → hash-partitioned keep-min-id
* minhash_lsh_pairs    — MinHash signatures → banded LSH buckets →
                         candidate pairs → exact Jaccard verification
* simhash64            — 64-bit SimHash per doc + Hamming-near pairs
* word_jaccard         — exact word-set Jaccard for given pairs

Scale notes (the 100 TB story):
- exact dedup is ONE shuffle keyed on the content hash; the per-group
  kernel keeps the min doc_id. Pre-hashing happens in a narrow stage so
  only (hash, id) + payload move.
- MinHash: signatures are computed per batch (vectorized numpy over a
  token×perm matrix); each doc explodes to ``bands`` rows keyed by
  (band_id, band_hash); the groupby co-locates collision buckets; pairs
  are emitted per bucket and verified with exact Jaccard. Bucket sizes
  are bounded by LSH design (r rows/band); a hot bucket (e.g. empty
  docs) is truncated at ``max_bucket`` with a logged count — a salted
  re-bucket is the escape hatch.
- SimHash is embarrassingly parallel; near-pair search groups by the
  four 16-bit sub-blocks (pigeonhole: Hamming distance ≤3 ⇒ at least
  one identical sub-block).

Hashes are all derived from md5 (stable across processes/nodes, no
Python hash()).
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _tokens(s: str) -> list[str]:
    return s.split()


def _shingles(s: str, k: int) -> set[int]:
    toks = _tokens(s)
    if len(toks) < k:
        return {_md5_u64(" ".join(toks))} if toks else set()
    return {_md5_u64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Drop exact-content duplicates, keeping the smallest id per
    content hash. One shuffle on the hash key."""
    from ptrail_ray.functions.textstats import fingerprint_batch

    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the bucket: sort once, first row per hash
        return df.sort_values(["fingerprint", id_col], kind="stable").drop_duplicates(
            "fingerprint", keep="first"
        )

    fp = ds.map_batches(fingerprint_batch, batch_format="pandas", batch_size=None)
    return grouped_agg_by_bucket(fp, "fingerprint", keep_min, num_buckets=32)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature (numpy-vectorized).

    Universal hashing h_i(x) = (a_i·x + b_i) mod p over md5-derived
    shingle ids; parameters seeded once per actor in ``__init__``.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        # (num_perm, n_shingles) universal hash, min over shingles
        hv = (
            (self.a[:, None] * (x[None, :] % _MERSENNE)) + self.b[:, None]
        ) % _MERSENNE
        return hv.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t or "") for t in batch["text"].fillna("")]
        batch["minhash"] = [s.tolist() for s in sigs]
        return batch


def _band_rows(batch: pd.DataFrame, bands: int, rows_per_band: int) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, doc_id) rows."""
    out_band, out_hash, out_id = [], [], []
    for did, sig in zip(batch["doc_id"], batch["minhash"]):
        s = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = s[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.md5(chunk.tobytes() + bytes([b])).hexdigest()[:16]
            out_band.append(b)
            out_hash.append(h)
            out_id.append(did)
    return pd.DataFrame({"band_id": out_band, "band_hash": out_hash, "doc_id": out_id})


def minhash_lsh_pairs(
    ds,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 200,
    verify_concurrency: int = 4,
):
    """Near-duplicate candidate pairs via MinHash-LSH, verified with
    exact shingle Jaccard. Returns a Dataset of
    (doc_id_a, doc_id_b, jaccard) with doc_id_a < doc_id_b.

    Pipeline: signature (actor pool) → band explode → groupby
    (band_id, band_hash) → pairs per bucket → dedup pairs → exact-verify
    against broadcast texts (small side at test scale; at 100 TB the
    verify stage re-joins text by id with a bucket join instead).
    """
    import ray
    import ray.data as rd

    rows_per_band = num_perm // bands
    sigged = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pandas", batch_size=None,
        concurrency=(1, 2),
    )
    band = sigged.map_batches(
        lambda b: _band_rows(b, bands, rows_per_band), batch_format="pandas", batch_size=None
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ids = ids[:max_bucket]  # bounded; hot buckets (e.g. empty docs) truncate
        pairs = list(itertools.combinations(ids, 2))
        return pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})

    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    cand = band.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def add_pair_key(df: pd.DataFrame) -> pd.DataFrame:
        df["pair_key"] = (
            df["a"].astype("int64") * np.int64(1 << 32) + df["b"].astype("int64")
        )
        return df

    pairs = grouped_agg_by_bucket(
        cand.map_batches(add_pair_key, batch_format="pandas", batch_size=None),
        "pair_key",
        lambda df: df.drop_duplicates("pair_key").drop(columns=["pair_key"]),
        num_buckets=16,
    )

    texts_ref = ray.put(
        dict(zip(*(lambda p: (p["doc_id"].tolist(), p["text"].tolist()))(
            ds.select_columns(["doc_id", "text"]).to_pandas()
        )))
    )

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)
            self.k = shingle_k

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            jac = []
            for a, b in zip(batch["a"], batch["b"]):
                sa, sb = _shingles(self.texts[a] or "", self.k), _shingles(
                    self.texts[b] or "", self.k
                )
                denom = len(sa | sb)
                jac.append(len(sa & sb) / denom if denom else 0.0)
            batch["jaccard"] = jac
            return batch[batch["jaccard"] >= jaccard_threshold]

    return pairs.map_batches(
        Verify, batch_format="pandas", batch_size=None, concurrency=(1, verify_concurrency)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash over word tokens (md5-derived token hashes)."""
    out = []
    for t in batch["text"].fillna(""):
        toks = _tokens(t)
        if not toks:
            out.append(0)
            continue
        hv = np.array([_md5_u64(w) for w in toks], dtype=np.uint64)
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        sh = np.uint64(0)
        for i in range(64):
            if v[i] > 0:
                sh |= np.uint64(1) << np.uint64(i)
        out.append(int(sh))
    batch["simhash"] = np.array(out, dtype=np.uint64).astype("int64")  # 2's-complement
    return batch


def add_simhash(ds):
    return ds.map_batches(simhash_batch, batch_format="pandas", batch_size=None)


def simhash_near_pairs(ds, *, max_hamming: int = 3):
    """Near-pairs by SimHash: group by each of four 16-bit sub-blocks
    (pigeonhole guarantee for distance ≤ 3), verify Hamming distance."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, sh in zip(batch["doc_id"], batch["simhash"]):
            u = np.uint64(sh % (1 << 64))
            for blk in range(4):
                sub = int((u >> np.uint64(16 * blk)) & np.uint64(0xFFFF))
                rows.append((blk, sub, did, int(sh)))
        return pd.DataFrame(rows, columns=["blk", "sub", "doc_id", "simhash"])

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        recs = group[["doc_id", "simhash"]].drop_duplicates().values.tolist()
        out = []
        for (a, ha), (b, hb) in itertools.combinations(sorted(recs), 2):
            d = bin((int(ha) ^ int(hb)) % (1 << 64)).count("1")
            if d <= max_hamming:
                out.append((a, b, d))
        return pd.DataFrame(out, columns=["a", "b", "hamming"])

    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    cand = (
        add_simhash(ds)
        .map_batches(explode, batch_format="pandas", batch_size=None)
        .groupby(["blk", "sub"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def add_pair_key(df: pd.DataFrame) -> pd.DataFrame:
        df["pair_key"] = (
            df["a"].astype("int64") * np.int64(1 << 32) + df["b"].astype("int64")
        )
        return df

    return grouped_agg_by_bucket(
        cand.map_batches(add_pair_key, batch_format="pandas", batch_size=None),
        "pair_key",
        lambda df: df.drop_duplicates("pair_key").drop(columns=["pair_key"]),
        num_buckets=16,
    )
