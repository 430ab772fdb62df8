"""Edit-distance near-dup: the batched banded DP must equal the
textbook Levenshtein recurrence (and hence DuckDB's levenshtein())
everywhere at or below the clamp, and the pipeline must find exactly
the adjacent-pair verdicts the SQL window formulation defines."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ptrail_ray.functions.editdist import (
    _strip_affixes,
    edit_near_pairs,
    levenshtein_batch,
)


def _ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_batch_matches_reference():
    rng = np.random.default_rng(7)
    alpha = list("abcde ")
    pairs = []
    for _ in range(120):
        n1, n2 = rng.integers(0, 24, size=2)
        a = "".join(rng.choice(alpha, size=n1))
        b = "".join(rng.choice(alpha, size=n2))
        pairs.append((a, b))
    # classic fixed cases, including empties and unicode
    pairs += [
        ("kitten", "sitting"),
        ("", ""),
        ("", "abc"),
        ("abc", ""),
        ("same", "same"),
        ("héllo wörld", "hello world"),
    ]
    T = 8
    got = levenshtein_batch(pairs, T)
    for (a, b), d in zip(pairs, got):
        ref = _ref_lev(a, b)
        assert d == min(ref, T + 1), (a, b, d, ref)


def test_strip_affixes_preserves_distance():
    rng = np.random.default_rng(11)
    alpha = list("xyz")
    for _ in range(60):
        core_a = "".join(rng.choice(alpha, size=rng.integers(0, 8)))
        core_b = "".join(rng.choice(alpha, size=rng.integers(0, 8)))
        pre = "P" * int(rng.integers(0, 5))
        suf = "S" * int(rng.integers(0, 5))
        a, b = pre + core_a + suf, pre + core_b + suf
        ra, rb = _strip_affixes(a, b)
        assert _ref_lev(ra, rb) == _ref_lev(a, b)


def test_edit_near_pairs_pipeline(ray_session):
    # two exact near-dup families sharing 16-char prefixes, one loner
    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = [
        (1, base),
        (2, base[:-4] + "cat "),          # few edits from base
        (3, base + "extra tail"),          # suffix insertion
        (4, "completely different text with its own prefix"),
        (5, "the quick brown fox is a wholly different continuation "
            "that exceeds the edit budget by a very large margin "
            "padding padding padding padding padding padding padding"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs]),
            }
        )
    )
    out = (
        edit_near_pairs(ds, prefix_len=16, max_dist=12, cap=1024, num_buckets=4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # brute-force the same definition: sort by (blk, text, id), adjacent
    rows = sorted(docs, key=lambda d: (d[1][:16], d[1], d[0]))
    expect = []
    for (ia, ta), (ib, tb) in zip(rows, rows[1:]):
        if ta[:16] != tb[:16]:
            continue
        d = _ref_lev(ta[:1024], tb[:1024])
        if d <= 12:
            expect.append((ia, ib, d))
    got = list(out.itertuples(index=False, name=None))
    assert sorted(got) == sorted(expect)
    assert len(expect) >= 2  # the two families actually produce pairs
