"""Sorted-neighborhood edit-distance near-duplicate detection.

The character-level rung of the dedup ladder (below it: byte-exact and
normalized-exact in ``functions/dedup.py``; above it: MinHash/SimHash
token-set similarity). Finds pairs of documents whose full-text
Levenshtein distance is ≤ ``max_dist``, using sorted-neighborhood
blocking (Hernández & Stolfo's merge/purge method, public literature):

    1. narrow projection: (id, text, blk = first ``prefix_len`` chars)
    2. ONE hash exchange on ``blk`` (``stages/bucket.map_conv_buckets``
       with ``key_col="_blk"``) — each bucket holds whole blocks,
       sorted by (blk, text, id)
    3. per-bucket vectorized kernel: candidate pairs are the ADJACENT
       rows within each block run; each candidate gets an exact
       banded Levenshtein verdict

Scale notes (the partitioning assumption, per the engine's doc rule):
the number of candidate pairs is ≤ rows − #blocks (adjacent-only, not
all-pairs), the exchange moves each row once keyed on a small prefix,
and the DP cost per pair is bounded by ``cap`` chars per side with
intermediate cells clamped to ``max_dist + 1`` (clamping is sound:
DP cell values are non-decreasing along any recurrence path, so a
clamped cell can only ever produce final distances that are also
> max_dist). Pairs whose post-affix-strip length difference exceeds
``max_dist`` are rejected without running the DP (|len(a) − len(b)|
is a lower bound on edit distance).

The DP itself is vectorized ACROSS pairs, not per pair: one numpy row
update per source character position, over a (pairs × target_len)
int32 matrix, using the running-min identity
``new[j] = j + cummin(t[j] − j)`` to resolve the in-row insertion
recurrence without a Python scan. Texts are compared as Unicode
codepoints — identical to DuckDB ``levenshtein()`` on ASCII/BMP text,
which the oracle relies on.

Reference precedent: the reference's duplicate handling is row-exact
``drop_duplicates`` (ptrail/preprocessing/filters.py:38-64); the fuzzy
character-level rung is a beyond-reference training-data operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ptrail_ray.stages.bucket import conv_runs, map_conv_buckets

BLK_COL = "_blk"


def _strip_affixes(a: str, b: str) -> tuple[str, str]:
    """Drop the common prefix and suffix (edit distance is invariant)."""
    la, lb = len(a), len(b)
    p = 0
    m = min(la, lb)
    while p < m and a[p] == b[p]:
        p += 1
    s = 0
    while s < m - p and a[la - 1 - s] == b[lb - 1 - s]:
        s += 1
    return a[p: la - s], b[p: lb - s]


def levenshtein_batch(
    pairs: "list[tuple[str, str]]", max_dist: int
) -> np.ndarray:
    """Exact Levenshtein distance per pair, clamped to ``max_dist + 1``.

    Vectorized across the pair axis: each outer iteration advances one
    source-character position for EVERY pair simultaneously. Pairs are
    pre-stripped/pre-filtered by the caller; empty sides short-circuit.
    """
    npairs = len(pairs)
    out = np.full(npairs, max_dist + 1, dtype=np.int64)
    if npairs == 0:
        return out
    clamp = np.int32(max_dist + 1)

    # Encode to int32 codepoints; pad target matrix with -1 (never a
    # real codepoint, so pad positions always cost a substitution —
    # irrelevant because each pair reads its answer at its own length).
    a_codes = [np.frombuffer(a.encode("utf-32-le"), dtype=np.int32) for a, _ in pairs]
    b_codes = [np.frombuffer(b.encode("utf-32-le"), dtype=np.int32) for _, b in pairs]
    la = np.array([len(x) for x in a_codes], dtype=np.int64)
    lb = np.array([len(x) for x in b_codes], dtype=np.int64)

    trivial = la == 0
    out[trivial] = np.minimum(lb[trivial], max_dist + 1)
    live = np.flatnonzero(~trivial)
    if len(live) == 0:
        return out

    n_max = int(lb[live].max()) if len(live) else 0
    m_max = int(la[live].max())
    B = np.full((len(live), n_max), -1, dtype=np.int32)
    for r, p in enumerate(live):
        B[r, : lb[p]] = b_codes[p]
    A = np.full((len(live), m_max), -2, dtype=np.int32)
    for r, p in enumerate(live):
        A[r, : la[p]] = a_codes[p]
    la_l = la[live]

    j_idx = np.arange(n_max + 1, dtype=np.int32)
    prev = np.broadcast_to(j_idx, (len(live), n_max + 1)).copy()
    np.minimum(prev, clamp, out=prev)
    t = np.empty_like(prev)
    for i in range(1, m_max + 1):
        cost = (A[:, i - 1 : i] != B).astype(np.int32)
        t[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=t[:, 1:])
        # new[j] = min(t[j], new[j-1] + 1)  ≡  j + cummin(t[j] − j)
        new = np.minimum.accumulate(t - j_idx, axis=1) + j_idx
        np.minimum(new, clamp, out=new)
        active = (i <= la_l)[:, None]
        prev = np.where(active, new, prev)
    out[live] = np.minimum(prev[np.arange(len(live)), lb[live]], max_dist + 1)
    return out


def edit_near_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 16,
    max_dist: int = 32,
    cap: int = 1024,
    num_buckets: int = 32,
):
    """Adjacent-pair edit-distance verdicts under prefix blocking.

    Returns a Dataset of ``(doc_a, doc_b, dist)`` — doc_a is the
    predecessor of doc_b in (blk, text, id) order within the same
    block, dist ≤ ``max_dist`` exact Levenshtein over the first
    ``cap`` characters of each side (``cap`` bounds worst-case DP cost
    at scale; the oracle applies the same substr).
    """

    def add_blk(t: pa.Table) -> pa.Table:
        blk = pc.utf8_slice_codeunits(t[text_col], 0, prefix_len)
        return pa.table(
            {id_col: t[id_col], text_col: t[text_col], BLK_COL: blk}
        )

    def kern(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
        n = t.num_rows
        if n < 2:
            return empty
        starts, _ = conv_runs(t[BLK_COL])
        keep = np.ones(n, dtype=bool)
        keep[starts] = False
        rhs = np.flatnonzero(keep)  # pair = (rhs-1, rhs), same block
        if len(rhs) == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        cand: list[tuple[str, str]] = []
        cand_rows: list[int] = []
        for r in rhs:
            a, b = texts[r - 1][:cap], texts[r][:cap]
            ra, rb = _strip_affixes(a, b)
            if abs(len(ra) - len(rb)) > max_dist:
                continue  # |Δlen| lower-bounds the distance
            cand.append((ra, rb))
            cand_rows.append(r)
        if not cand:
            return empty
        # Short-remainder pairs dominate near-dup workloads; sorting by
        # remainder length keeps each DP batch's m_max tight.
        order = sorted(range(len(cand)), key=lambda k: len(cand[k][0]))
        dists = np.empty(len(cand), dtype=np.int64)
        BATCH = 512
        for s in range(0, len(order), BATCH):
            sel = order[s : s + BATCH]
            dists[sel] = levenshtein_batch([cand[k] for k in sel], max_dist)
        ok = np.flatnonzero(dists <= max_dist)
        rows = np.array(cand_rows, dtype=np.int64)[ok]
        return pa.table(
            {
                "doc_a": pa.array(ids[rows - 1], pa.int64()),
                "doc_b": pa.array(ids[rows], pa.int64()),
                "dist": pa.array(dists[ok], pa.int64()),
            }
        )

    ds = ds.map_batches(add_blk, batch_format="pyarrow", batch_size=1 << 20)
    return map_conv_buckets(
        ds,
        kern,
        key_col=BLK_COL,
        sort_keys=(BLK_COL, text_col, id_col),
        num_buckets=num_buckets,
    )
