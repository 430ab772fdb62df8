"""Deterministic sampling for training-data pipelines.

``ray.data.Dataset.random_sample`` is seed-per-run and block-layout
dependent — useless when a 100 TB pipeline must reproduce the same
subset across retries, resumes, and engine versions. These operators
key every decision on a content hash of a stable id column instead:

* ``sample_by_hash`` — keep a row iff md5(id) (first 60 bits, the
  same ``_md5_u60`` construction as the dedup fingerprints) falls
  under ``rate`` × 2⁶⁰. Exactly reproducible anywhere, embarrassingly
  parallel (narrow stateless stage, no shuffle, no driver state), and
  consistent across datasets: the same id draws the same verdict in
  every table it appears in (the property train/eval splits need).
* ``split_by_hash`` — the complementary split: routes each row to one
  of ``k`` named folds by hash bucket; folds are disjoint and exhaust
  the input.

SQL replica (oracle-checkable):
    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::UBIGINT
matches ``_md5_u60(str(id))`` exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.functions.dedup import _md5_u60

_SCALE = 1 << 60


def _hash_col(t: pa.Table, id_col: str) -> np.ndarray:
    ids = t[id_col]
    if not pa.types.is_string(ids.type):
        ids = pc.cast(ids, pa.string())
    return np.fromiter(
        (_md5_u60(v) for v in ids.to_pylist()), dtype=np.uint64, count=t.num_rows
    )


def sample_by_hash(ds, *, id_col: str, rate: float):
    """Keep rows whose md5-derived id hash < ``rate`` (0 ≤ rate ≤ 1).
    Deterministic, stateless, reproducible across runs and engines."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate!r}")
    cut = np.uint64(int(rate * _SCALE))

    def mask(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_hash_col(t, id_col) < cut))

    return ds.map_batches(mask, batch_format="pyarrow", batch_size=None)


def split_by_hash(ds, *, id_col: str, fold: int, k: int):
    """Keep rows routed to ``fold`` of ``k`` disjoint hash folds
    (fold = hash mod k). Folds partition the input exactly."""
    if not 0 <= fold < k:
        raise ValueError(f"fold must be in [0, {k}), got {fold}")

    def mask(t: pa.Table) -> pa.Table:
        h = _hash_col(t, id_col)
        return t.filter(pa.array(h % np.uint64(k) == np.uint64(fold)))

    return ds.map_batches(mask, batch_format="pyarrow", batch_size=None)


def stratified_sample_by_hash(
    ds, *, key_col: str, id_col: str, n_per_key: int, num_buckets: int = 64
):
    """Deterministic quota sample: the ``n_per_key`` rows of each
    stratum with the smallest md5(id) hashes (ties impossible modulo
    md5 collisions). The per-key quota is what balanced training mixes
    need — a global rate over-samples hot strata. One hash-bucket
    exchange on the stratum key; the per-bucket kernel is a vectorized
    groupby-rank. SQL replica: row_number() OVER (PARTITION BY key
    ORDER BY md5-hash, id) <= n."""
    if n_per_key < 1:
        raise ValueError(f"n_per_key must be >= 1, got {n_per_key}")
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def add_h(t: pa.Table) -> pa.Table:
        # int64-safe: top 60 bits only (see _md5_u60)
        return t.append_column(
            "_h", pa.array(_hash_col(t, id_col).astype(np.int64), pa.int64())
        )

    def take_quota(df):
        df = df.sort_values(["_h", id_col], kind="stable")
        r = df.groupby(key_col, sort=False).cumcount()
        return df[r < n_per_key].drop(columns=["_h"])

    return grouped_agg_by_bucket(
        ds.map_batches(add_h, batch_format="pyarrow", batch_size=None),
        key_col,
        take_quota,
        num_buckets=num_buckets,
    )


def weighted_sample_by_hash(ds, *, id_col: str, weight_col: str):
    """Weighted Bernoulli sample: keep a row iff
    ``hash(id)/2⁶⁰ < weight`` (weight pre-clamped by the caller to
    [0, 1]). The per-row acceptance probability IS the weight — the
    mix-balancing primitive (downweight over-long docs, upweight rare
    sources) with `sample_by_hash`'s reproducibility: same id + same
    weight ⇒ same verdict on any engine, any layout, any retry.
    Stateless, no shuffle. SQL replica: CAST(h AS DOUBLE) /
    1152921504606846976.0 < weight (identical float compare)."""

    def mask(t: pa.Table) -> pa.Table:
        h = _hash_col(t, id_col).astype(np.float64) / float(_SCALE)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.filter(pa.array(h < w))

    return ds.map_batches(mask, batch_format="pyarrow", batch_size=None)


def zip_with_index(ds, *, id_col: str, num_buckets: int = 64, out_col: str = "pos"):
    """Deterministic global training order: assign every row its
    row_number (0-based) under the md5-shuffled total order
    ``(hash(id), id)`` — the distributed zipWithIndex primitive a
    training exporter needs (reproducible epoch order without a
    driver-side sort).

    Two narrow passes + ONE exchange, all bounded:
    1. per-batch partials count rows per RANGE bucket
       (``bucket = h >> (60 − log₂ B)`` — top hash bits, so buckets
       tile the hash order); driver merges B counts into an exclusive
       prefix sum (B ≪ data, e.g. 2¹⁰ rows).
    2. one bucket-keyed exchange; within each bucket a vectorized sort
       by (h, id) + ``offset[bucket] + arange`` yields the global
       position. No global sort, no driver materialization.
    """
    if num_buckets & (num_buckets - 1):
        raise ValueError(f"num_buckets must be a power of two, got {num_buckets}")
    shift = np.uint64(60 - int(np.log2(num_buckets)))

    def add_h(t: pa.Table) -> pa.Table:
        h = _hash_col(t, id_col)
        t = t.append_column("_h", pa.array(h.astype(np.int64), pa.int64()))
        return t.append_column(
            "_zbucket", pa.array((h >> shift).astype(np.int32), pa.int32())
        )

    hashed = ds.map_batches(add_h, batch_format="pyarrow", batch_size=None)

    def count_partial(t: pa.Table) -> pa.Table:
        b = t["_zbucket"].to_numpy(zero_copy_only=False)
        c = np.bincount(b, minlength=num_buckets).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(np.arange(num_buckets, dtype=np.int64), pa.int64()),
                "c": pa.array(c, pa.int64()),
            }
        )

    counts = (
        hashed.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .groupby("b")["c"]
        .sum()
        .reindex(range(num_buckets), fill_value=0)
        .to_numpy()
    )
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)

    def number_bucket(t: pa.Table) -> pa.Table:
        b = int(t["_zbucket"][0].as_py())
        h = t["_h"].to_numpy(zero_copy_only=False)
        ids = t[id_col]
        if not pa.types.is_string(ids.type):
            ids = pc.cast(ids, pa.string())
        order = np.lexsort((np.asarray(ids.to_pylist(), dtype=object), h))
        pos = np.empty(len(h), np.int64)
        pos[order] = offsets[b] + np.arange(len(h), dtype=np.int64)
        return t.drop_columns(["_h", "_zbucket"]).append_column(
            out_col, pa.array(pos, pa.int64())
        )

    return hashed.groupby("_zbucket").map_groups(number_bucket, batch_format="pyarrow")


def uniform_k_sample(ds, *, id_col: str, k: int):
    """Exact-size uniform sample without replacement: the k rows with
    the SMALLEST md5(id) hashes — the deterministic replacement for
    reservoir sampling (same marginal distribution, but reproducible
    across runs/layouts/engines and embarrassingly parallel).

    Scale shape: per-batch partial top-k (k rows leave each task, never
    the batch), bounded driver merge of ≤ k × #batches candidate rows —
    the `functions/ann` partial-top-k pattern. One narrow pass, no
    shuffle. Ties (60-bit md5 collisions) break by id string, so the
    SQL replica ``ORDER BY hash, id LIMIT k`` agrees exactly."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partial(t: pa.Table) -> pa.Table:
        h = _hash_col(t, id_col).astype(np.int64)  # < 2^60, int64-safe
        t = t.append_column("_h", pa.array(h, pa.int64()))
        if t.num_rows <= k:
            return t
        keep = np.argpartition(h, k)[:k]
        return t.take(keep)

    cand = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    ids = cand[id_col].astype(str)
    cand = cand.loc[np.lexsort((ids.to_numpy(dtype=object), cand["_h"].to_numpy()))]
    return cand.head(k).drop(columns=["_h"]).reset_index(drop=True)


def group_weights(ds, *, group_col: str, weight_col: str, max_groups: int = 100_000):
    """Total ``weight_col`` per ``group_col`` value as a driver-side
    dict — the bounded small-side input to :func:`mix_rates`. Per-batch
    partial sums (one row per batch-distinct group) stream back and
    merge on the driver; the collect is bounded by the group catalog,
    guarded by a LOUD ``max_groups`` (sources/domains are catalog-sized
    by contract — if yours aren't, aggregate with
    ``stages.bucket.grouped_agg_by_bucket`` instead)."""

    def partial(t: pa.Table) -> pa.Table:
        g = np.asarray(t[group_col].to_numpy(zero_copy_only=False), dtype=str)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(g, return_inverse=True)
        sums = np.zeros(len(keys), np.int64)
        np.add.at(sums, inv, w)
        return pa.table(
            {
                "group": pa.array(keys, pa.string()),
                "w": pa.array(sums, pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=1 << 20
    ).to_arrow_refs()
    import ray

    out: dict = {}
    for ref in parts:
        t = ray.get(ref)
        for k, v in zip(t["group"].to_pylist(), t["w"].to_pylist()):
            out[k] = out.get(k, 0) + int(v)
        if len(out) > max_groups:
            raise RuntimeError(
                f"group_weights: {len(out)} groups exceeds max_groups="
                f"{max_groups} — the driver-side merge assumes a bounded "
                f"group catalog"
            )
    return out


def mix_rates(weights: dict, targets: dict) -> dict:
    """Per-group keep rates that resample a corpus to target mixture
    proportions (the data-mixing step of a training pipeline): kept
    weight K_g = c·target_g with the largest feasible c
    (c = min_g weight_g/target_g), so proportions are exact in
    expectation, at least one group is kept whole, and no group needs
    upsampling. Float64 op order matches the SQL replica
    (``least(1.0, c * tgt / wg)``) bit-for-bit."""
    missing = set(weights) - set(targets)
    if missing:
        raise ValueError(f"mix_rates: no target share for groups {sorted(missing)}")
    gs = sorted(weights)
    wg = np.array([float(weights[g]) for g in gs], np.float64)
    tgt = np.array([float(targets[g]) for g in gs], np.float64)
    if np.any(tgt <= 0):
        raise ValueError("mix_rates: target shares must be > 0")
    c = np.min(wg / tgt)
    rate = np.minimum(1.0, c * tgt / wg)
    return dict(zip(gs, rate.tolist()))


def mix_to_target(ds, *, id_col: str, group_col: str, rates: dict):
    """Deterministic mixture resampling: keep a row iff
    ``md5hash(id)/2⁶⁰ < rates[group]`` — `weighted_sample_by_hash`
    with the weight looked up from a broadcast per-group rate table
    (catalog-sized, shipped in the task closure). Stateless, no
    shuffle, reproducible across runs/layouts/engines; groups absent
    from ``rates`` are dropped (rate 0)."""

    def mask(t: pa.Table) -> pa.Table:
        h = _hash_col(t, id_col).astype(np.float64) / float(_SCALE)
        g = np.asarray(t[group_col].to_numpy(zero_copy_only=False), dtype=str)
        keys, inv = np.unique(g, return_inverse=True)
        kr = np.array([rates.get(k, 0.0) for k in keys], np.float64)
        return t.filter(pa.array(h < kr[inv]))

    return ds.map_batches(mask, batch_format="pyarrow", batch_size=None)


def curriculum_tier_mix(
    ds,
    *,
    value_col: str,
    id_col: str,
    tier_rates: "list[float]",
    materialized=None,
):
    """Curriculum mixing: tier rows by EXACT global quantiles of
    ``value_col`` (len(tier_rates) equal-probability tiers), then keep
    each row with its tier's deterministic md5 rate — the
    "short-docs-first / downsample-the-tail" composition a training mix
    runs (quality- or length-tiered keep rates).

    Composition of two existing primitives, nothing new moves: exact
    distributed quantiles (two narrow passes) broadcast as plain floats
    into ONE stateless filter stage (tier = #thresholds strictly below,
    keep iff md5(id) < rate[tier]·2⁶⁰). No shuffle, no driver loop.

    ``materialized``: pass a pre-materialized Dataset to avoid
    re-reading the source for the quantile passes."""
    from ptrail_ray.stages.quantiles import exact_quantiles

    k = len(tier_rates)
    if k < 2:
        raise ValueError("need >= 2 tiers")
    src = materialized if materialized is not None else ds
    qs = [i / k for i in range(1, k)]
    ths = np.asarray(exact_quantiles(src, value_col, qs), dtype=np.float64)
    cuts = np.array([np.uint64(int(r * _SCALE)) for r in tier_rates], np.uint64)

    def fn(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tier = (v[:, None] > ths[None, :]).sum(axis=1).astype(np.int64)
        keep = _hash_col(t, id_col) < cuts[tier]
        return t.append_column("tier", pa.array(tier, pa.int64())).filter(
            pa.array(keep)
        )

    return src.map_batches(fn, batch_format="pyarrow", batch_size=None)
