"""Round-4 continuation-3 ops: per-conversation OLS trend, lag-1
autocorrelation, leave-one-out target encoding."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _transcripts_pdf():
    from ptrail_ray.sources.transcripts import derive_from_events

    df = derive_from_events(SF).to_pandas()
    return df.sort_values(["conv_id", "turn_idx", "ts"]).reset_index(drop=True)


def test_conv_trend_matches_polyfit(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_conv_trend"](SF).to_pandas().set_index("conv_id")
    ref = _transcripts_pdf()
    ref["m1"] = ref["text"].fillna("").str.len()
    for conv, g in ref.groupby("conv_id", sort=False):
        y = g["m1"].to_numpy(np.float64)
        x = np.arange(1, len(y) + 1, dtype=np.float64)
        row = out.loc[conv]
        if len(y) == 1:
            assert np.isnan(row["trend_slope"]) and np.isnan(row["trend_intercept"])
            continue
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(row["trend_slope"] - slope) < 1e-5, conv
        assert abs(row["trend_intercept"] - intercept) < 1e-5, conv


def test_autocorr_matches_definition(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_autocorr"](SF).to_pandas().set_index("conv_id")
    ref = _transcripts_pdf()
    ref["m1"] = ref["text"].fillna("").str.len()
    for conv, g in ref.groupby("conv_id", sort=False):
        y = g["m1"].to_numpy(np.float64)
        got = out.loc[conv, "acf1"]
        c = y - y.mean()
        den = float((c * c).sum())
        if len(y) < 2 or den == 0.0:
            assert np.isnan(got), conv
            continue
        r1 = float((c[:-1] * c[1:]).sum()) / den
        assert abs(got - r1) < 1e-5, conv


def test_autocorr_edge_series(ray_session):
    # constant, single-turn, and alternating conversations, built as a
    # raw transcripts frame run through the same bucket kernel shape
    from ptrail_ray.entry_queries import QUERIES

    # craft an events table whose derived transcripts are irrelevant —
    # instead exercise the registered query end-to-end over a tempdir
    # copy of sf0.001 events (the registered path), then the numeric
    # edge cases directly against the exact-int formula:
    for y in ([5], [7, 7, 7, 7], [0, 10, 0, 10, 0, 10], [1, 2, 3, 4, 5]):
        y = np.asarray(y, np.int64)
        n = len(y)
        sy, q = int(y.sum()), int((y * y).sum())
        a = int((y[:-1] * y[1:]).sum()) if n > 1 else 0
        num = n * n * a - n * sy * (2 * sy - int(y[0]) - int(y[-1])) + (n - 1) * sy * sy
        den = n * n * q - n * sy * sy
        if den == 0:
            continue
        c = y.astype(np.float64) - y.mean()
        r1 = float((c[:-1] * c[1:]).sum()) / float((c * c).sum())
        assert abs(num / den - r1) < 1e-12


def test_target_encode_loo_hand_values(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"], pa.string()),
            "lang": pa.array(["en", "en", "en", "fr"], pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([10, 20, 60, 5], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = QUERIES["q_target_encode_loo"](d).to_pandas().set_index("doc_id")
    # en: total 90 → LOO means (90-10)/2=40, (90-20)/2=35, (90-60)/2=15
    assert out.loc[1, "te_loo"] == 40.0
    assert out.loc[2, "te_loo"] == 35.0
    assert out.loc[3, "te_loo"] == 15.0
    # fr is a single-member group → NULL (no self-leakage fallback)
    assert np.isnan(out.loc[4, "te_loo"])


def test_response_latency_matches_pandas(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = (
        QUERIES["q_response_latency"](SF)
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    ref = _transcripts_pdf()
    exp = {}
    for conv, g in ref.groupby("conv_id", sort=False):
        role = g["role"].to_numpy(object)
        ts = g["ts"].to_numpy("datetime64[us]").view("int64")
        ok = (role[:-1] == "user") & (role[1:] == "assistant")
        if not ok.any():
            continue
        lat = (ts[1:] - ts[:-1])[ok]
        exp[conv] = (len(lat), float(np.median(lat)))
    assert set(out.index) == set(exp)
    for conv, (n, med) in exp.items():
        assert out.loc[conv, "n_responses"] == n
        assert abs(out.loc[conv, "median_latency_us"] - med) < 1e-6, conv


def test_burstiness_matches_definition(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_burstiness"](SF).to_pandas().set_index("conv_id")
    ref = _transcripts_pdf()
    for conv, g in ref.groupby("conv_id", sort=False):
        ts = g["ts"].to_numpy("datetime64[us]").view("int64")
        if len(ts) < 2:
            assert conv not in out.index
            continue
        d = np.diff(ts).astype(np.float64)
        mu = d.mean()
        got = out.loc[conv, "cv2"]
        if mu == 0:
            assert np.isnan(got)
            continue
        # population variance / mean^2 (the n_d-scaled exact form)
        cv2 = d.var() / (mu * mu)
        assert abs(got - cv2) < 1e-6, conv


def test_rrf_fusion_hand_values(ray_session):
    from ptrail_ray.entry_queries import QUERIES, RRF_K

    # bm25 ranking: docs containing the query terms, by score; quality
    # ranking: by n_chars desc. Both lists tiny and disjointly known.
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["join join window", "join", "nothing relevant here"],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([5, 50, 500], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = (
            QUERIES["q_rrf_fusion"](d).to_pandas().set_index("doc_id")["rrf_micro"]
        )
    r = lambda pos: 10**9 // (RRF_K + pos)
    # bm25: doc1 (2x join + window) > doc2 (join); doc3 scores nothing.
    # n_chars: doc3 > doc2 > doc1.
    assert out[1] == r(1) + r(3)
    assert out[2] == r(2) + r(2)
    assert out[3] == r(1)


def test_kappa_hand_values(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    # stopword ratio > 0.05 → pred 'en', else 'unk'
    en_text = "the of and in to"
    unk_text = "zzz qqq www yyy xxx"
    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(
                [en_text, en_text, unk_text, en_text, unk_text, unk_text],
                pa.string(),
            ),
            "lang": pa.array(["en", "en", "en", "unk", "unk", "unk"], pa.string()),
            "source": pa.array(["s"] * 6, pa.string()),
            "n_chars": pa.array([10] * 6, pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = QUERIES["q_kappa"](d).to_pandas()
    # confusion: en→en 2, en→unk 1, unk→en 1, unk→unk 2 → agree 4 of 6
    # rows en=3, unk=3; cols en=3, unk=3; cross = 9+9=18
    # kappa = (6*4 − 18)/(36 − 18) = 6/18 = 1/3
    assert out.loc[0, "n_docs"] == 6 and out.loc[0, "agree"] == 4
    assert abs(out.loc[0, "kappa"] - 1 / 3) < 1e-6


def test_render_sft_and_loss_mask_consistent(ray_session):
    """The loss-mask spans must slice exactly the assistant text out of
    the rendered string — the property a trainer depends on."""
    from ptrail_ray.entry_queries import QUERIES

    rendered = QUERIES["q_render_sft"](SF).to_pandas().set_index("conv_id")
    spans = QUERIES["q_loss_mask"](SF).to_pandas()
    ref = _transcripts_pdf()
    asst = ref[ref["role"] == "assistant"]
    assert len(spans) == len(asst)
    by_turn = {
        (r.conv_id, r.turn_idx): (r.span_start, r.span_end)
        for r in spans.itertuples()
    }
    for r in asst.itertuples():
        s, e = by_turn[(r.conv_id, int(r.turn_idx))]
        text = rendered.loc[r.conv_id, "sft_text"]
        assert text[s:e] == (r.text or ""), (r.conv_id, r.turn_idx)
    # rendered text matches a direct per-conv join
    for conv, g in ref.groupby("conv_id", sort=False):
        exp = "\n".join(
            f"{role}: {t if t is not None else ''}"
            for role, t in zip(g["role"], g["text"])
        )
        assert rendered.loc[conv, "sft_text"] == exp
        assert rendered.loc[conv, "sft_chars"] == len(exp)


def test_conv_dedup_collapses_identical_rendering(ray_session):
    """Two users with byte-identical event streams render identically
    and must collapse to the lexicographically smaller conv_id."""
    from ptrail_ray.entry_queries import QUERIES

    rows = [(1, "chat", 0), (1, "chat", 10_000_000), (2, "chat", 0),
            (2, "chat", 10_000_000), (3, "chat", 5_000_000)]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["x"] * len(rows), pa.string()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = QUERIES["q_conv_dedup"](d).to_pandas()
        rendered = QUERIES["q_render_sft"](d).to_pandas()
    ident = rendered.set_index("conv_id")["sft_text"]
    # if conv-1 and conv-2 rendered identically, only conv-1 survives
    if ident["conv-1"] == ident["conv-2"]:
        assert set(out["conv_id"]) == {"conv-1", "conv-3"}
    else:
        assert len(out) == 3


def test_asof_staleness_bands_sum_to_turn_count(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    from ptrail_ray.sources.transcripts import derive_from_events

    out = QUERIES["q_asof_staleness"](SF).to_pandas()
    n_turns = derive_from_events(SF).count()
    assert int(out["n_turns"].sum()) == n_turns
    assert set(out["band"]) <= {"never", "lt_1h", "lt_1d", "lt_7d", "ge_7d"}


def test_pref_pairs_hand_values(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["x"] * 5, pa.string()),
            "lang": pa.array(["en", "en", "en", "fr", "fr"], pa.string()),
            "source": pa.array(["s"] * 5, pa.string()),
            # en: 30 > 10 → pair (3 chosen, 1 rejected); fr: tie → dropped
            "n_chars": pa.array([10, 20, 30, 7, 7], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = QUERIES["q_pref_pairs"](d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["lang"], r["chosen_id"], r["rejected_id"], r["margin"]) == (
        "en", 3, 1, 20,
    )


def test_speaker_balance_matches_pandas(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_speaker_balance"](SF).to_pandas().set_index("conv_id")
    ref = _transcripts_pdf()
    ref["m1"] = ref["text"].fillna("").str.len()
    for conv, g in ref.groupby("conv_id", sort=False):
        a = int(g.loc[g["role"] == "assistant", "m1"].sum())
        u = int(g.loc[g["role"] == "user", "m1"].sum())
        row = out.loc[conv]
        assert row["assistant_chars"] == a and row["user_chars"] == u
        if a + u == 0:
            assert np.isnan(row["assistant_share"])
        else:
            assert abs(row["assistant_share"] - a / (a + u)) < 1e-6


def test_ttr_hand_values(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b a b a", "x y z", ""], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([9, 5, 0], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = QUERIES["q_ttr"](d).to_pandas().set_index("doc_id")
    assert (out.loc[1, "n_tokens"], out.loc[1, "n_types"]) == (5, 2)
    assert abs(out.loc[1, "ttr"] - 0.4) < 1e-9
    assert abs(out.loc[2, "ttr"] - 1.0) < 1e-9
    assert out.loc[3, "n_tokens"] == 0 and np.isnan(out.loc[3, "ttr"])


def test_auc_matches_sklearn_style_reference(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    rng = np.random.default_rng(11)
    n = 400
    lang = np.where(rng.random(n) < 0.4, "en", "fr")
    # scores correlated with the label, WITH heavy ties
    score = rng.integers(0, 25, n) + np.where(lang == "en", 6, 0)
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(lang.astype(object), pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array(score.astype(np.int64), pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = QUERIES["q_auc"](d).to_pandas()
    # reference: pairwise P(score_pos > score_neg) + 0.5 P(tie)
    pos = score[lang == "en"].astype(np.float64)
    neg = score[lang != "en"].astype(np.float64)
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    ref = (gt + 0.5 * eq) / (len(pos) * len(neg))
    assert out.loc[0, "n_pos"] == len(pos) and out.loc[0, "n_neg"] == len(neg)
    assert abs(out.loc[0, "auc"] - ref) < 1e-6
    assert out.loc[0, "auc"] > 0.5  # the signal direction


def test_auc_degenerate_single_class(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["x", "y"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "n_chars": pa.array([1, 2], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = QUERIES["q_auc"](d).to_pandas()
    assert np.isnan(out.loc[0, "auc"])


def test_tool_latency_matches_pandas(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tool_latency"](SF).to_pandas().set_index("conv_id")
    ref = _transcripts_pdf()
    for conv, g in ref.groupby("conv_id", sort=False):
        role = g["role"].to_numpy(object)
        ts = g["ts"].to_numpy("datetime64[us]").view("int64")
        ok = (role[:-1] == "assistant") & (role[1:] == "tool")
        if not ok.any():
            assert conv not in out.index
            continue
        lat = (ts[1:] - ts[:-1])[ok]
        assert out.loc[conv, "n_responses"] == len(lat)
        assert abs(out.loc[conv, "median_latency_us"] - float(np.median(lat))) < 1e-6


def test_gini_lengths_matches_definition(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gini_lengths"](SF).to_pandas().set_index("source")
    import pyarrow.parquet as _pq

    docs = _pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["source", "n_chars"]
    ).to_pandas()
    for source, g in docs.groupby("source"):
        x = g["n_chars"].to_numpy(np.float64)
        n = len(x)
        mu = x.mean()
        ref = 0.0 if mu == 0 else float(
            np.abs(x[:, None] - x[None, :]).sum()
        ) / (2 * n * n * mu)
        got = out.loc[source, "gini_len"]
        if mu == 0:
            assert np.isnan(got)
        else:
            assert abs(got - ref) < 1e-6, source
        assert out.loc[source, "n_docs"] == n


def test_prf1_hand_values(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    en_text = "the of and in to"
    unk_text = "zzz qqq www yyy xxx"
    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(
                [en_text, en_text, unk_text, en_text, unk_text, unk_text],
                pa.string(),
            ),
            "lang": pa.array(["en", "en", "en", "unk", "unk", "unk"], pa.string()),
            "source": pa.array(["s"] * 6, pa.string()),
            "n_chars": pa.array([10] * 6, pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = QUERIES["q_prf1"](d).to_pandas().set_index("class")
    # en: tp=2 fp=1 fn=1 → p=2/3 r=2/3 f1=2/3; unk symmetric
    for k in ("en", "unk"):
        assert (out.loc[k, "tp"], out.loc[k, "fp"], out.loc[k, "fn"]) == (2, 1, 1)
        for m in ("precision", "recall", "f1"):
            assert abs(out.loc[k, m] - 2 / 3) < 1e-6


def test_source_overlap_hand_values(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", "b c d", "x y"], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s1", "s2", "s3"], pa.string()),
            "n_chars": pa.array([5, 5, 3], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = QUERIES["q_source_overlap"](d).to_pandas()
    got = {(r.src_a, r.src_b): (r.inter, r.jaccard) for r in out.itertuples()}
    # s1={a,b,c}, s2={b,c,d}: inter 2, union 4 → 0.5; s3 disjoint (no rows)
    assert got == {("s1", "s2"): (2, 0.5)}


def test_mann_kendall_matches_bruteforce(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mann_kendall"](SF).to_pandas().set_index("conv_id")
    ref = _transcripts_pdf()
    ref["m1"] = ref["text"].fillna("").str.len()
    for conv, g in ref.groupby("conv_id", sort=False):
        y = g["m1"].to_numpy(np.int64)
        n = len(y)
        iu, ju = np.triu_indices(n, 1)
        d = y[ju] - y[iu]
        s, t, n0 = int(np.sign(d).sum()), int((d == 0).sum()), n * (n - 1) // 2
        row = out.loc[conv]
        assert row["mk_s"] == s and row["n_pairs"] == n0 and row["n_ties"] == t, conv
        if n0 == 0 or n0 - t == 0:
            assert np.isnan(row["tau"]), conv
        else:
            assert abs(row["tau"] - s / np.sqrt(n0 * (n0 - t))) < 1e-5, conv


def test_theil_sen_matches_bruteforce(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_theil_sen"](SF).to_pandas().set_index("conv_id")
    ref = _transcripts_pdf()
    ref["m1"] = ref["text"].fillna("").str.len()
    for conv, g in ref.groupby("conv_id", sort=False):
        y = g["m1"].to_numpy(np.float64)
        n = len(y)
        got = out.loc[conv, "ts_slope"]
        if n < 2:
            assert np.isnan(got), conv
            continue
        iu, ju = np.triu_indices(n, 1)
        slopes = np.sort((y[ju] - y[iu]) / (ju - iu))
        k = 0.5 * (len(slopes) - 1)
        lo, hi = int(np.floor(k)), int(np.ceil(k))
        frac = k - lo
        med = slopes[lo] * (1.0 - frac) + slopes[hi] * frac
        assert abs(got - med) < 1e-5, conv


def test_pairwise_trend_kernel_edges():
    import pyarrow as pa

    from ptrail_ray.stages.stats import pairwise_trend_kernel

    conv = ["a", "b", "b", "b", "c", "c", "c", "c", "d", "d"]
    y = [5, 7, 7, 7, 1, 2, 3, 4, 9, 3]
    t = pa.table({"conv_id": pa.array(conv), "m1": pa.array(y, pa.int64())})
    out = pairwise_trend_kernel(t, value_col="m1").to_pandas().set_index("conv_id")
    # single turn: no pairs, NULL tau/slope
    assert out.loc["a", "n_pairs"] == 0 and np.isnan(out.loc["a", "tau"])
    assert np.isnan(out.loc["a", "ts_slope"])
    # constant: all pairs tied -> S=0, tau NULL, slope 0
    assert out.loc["b", "mk_s"] == 0 and out.loc["b", "n_ties"] == 3
    assert np.isnan(out.loc["b", "tau"]) and out.loc["b", "ts_slope"] == 0.0
    # strictly increasing: S = n0, tau = 1, slope 1
    assert out.loc["c", "mk_s"] == 6 and out.loc["c", "tau"] == 1.0
    assert out.loc["c", "ts_slope"] == 1.0
    # strictly decreasing pair: S = -1, tau = -1, slope -6
    assert out.loc["d", "mk_s"] == -1 and out.loc["d", "tau"] == -1.0
    assert out.loc["d", "ts_slope"] == -6.0


def test_pairwise_trend_kernel_max_run_guard():
    import pyarrow as pa
    import pytest

    from ptrail_ray.stages.stats import pairwise_trend_kernel

    t = pa.table(
        {
            "conv_id": pa.array(["x"] * 10),
            "m1": pa.array(np.arange(10, dtype=np.int64)),
        }
    )
    with pytest.raises(ValueError, match="max_run"):
        pairwise_trend_kernel(t, value_col="m1", max_run=5)


def test_mutual_info_matches_definition(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mutual_info"](SF).to_pandas()
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    ct = docs.groupby(["lang", "source"]).size()
    T = int(ct.sum())
    mi = 0.0
    for (a, b), o in ct.items():
        rn, cn = int(ct[a].sum()), int(ct.xs(b, level="source").sum())
        mi += (o / T) * np.log(o * T / (rn * cn))
    assert abs(float(out.loc[0, "mi"]) - mi) < 1e-6
    assert int(out.loc[0, "n_cells"]) == len(ct)
    assert int(out.loc[0, "n"]) == T
    # MI is nonnegative up to quantization
    assert float(out.loc[0, "mi"]) >= -1e-9


def test_benford_counts_and_shares(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_benford"](SF).to_pandas().set_index("digit")
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    v = docs.loc[docs["n_chars"] > 0, "n_chars"].astype(str).str[0].astype(int)
    ref = v.value_counts()
    assert int(out["n"].sum()) == len(v)
    for d, n in ref.items():
        assert int(out.loc[d, "n"]) == int(n)
    assert abs(out["p"].sum() - 1.0) < 1e-5
    # Benford expectation column is the analytic log10(1 + 1/d)
    for d in out.index:
        assert abs(out.loc[d, "benford_p"] - np.log10(1 + 1 / d)) < 1e-6


def test_anon_k_flags_small_groups(ray_session):
    from ptrail_ray.entry_queries import ANON_K, QUERIES

    out = QUERIES["q_anon_k"](SF).to_pandas()
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    ref = (
        docs.groupby(["lang", "source", "n_chars"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    ref = ref[ref["n"] < ANON_K]
    assert len(out) == len(ref)
    assert (out["n"] < ANON_K).all()
    key = ["lang", "source", "n_chars"]
    m = out.merge(ref, on=key, suffixes=("_got", "_ref"))
    assert len(m) == len(ref) and (m["n_got"] == m["n_ref"]).all()


def test_cross_source_dup_clusters(ray_session):
    import hashlib
    import re

    from ptrail_ray.entry_queries import HEADFP_K, QUERIES

    out = QUERIES["q_cross_source_dup"](SF).to_pandas()
    # typed schema survives even when a scale has zero clusters
    assert list(out.columns) == ["fingerprint", "n_docs", "n_sources"]
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    head = (
        docs["text"]
        .fillna("")
        .map(lambda s: " ".join(re.findall(r"\S+", s)[:HEADFP_K]))
    )
    docs = docs.assign(fp=head.map(lambda s: hashlib.md5(s.encode()).hexdigest()))
    ref = docs.groupby("fp").agg(
        n_docs=("source", "size"), n_sources=("source", "nunique")
    )
    ref = ref[(ref["n_docs"] > 1) & (ref["n_sources"] > 1)]
    got = out.set_index("fingerprint").sort_index()
    assert len(got) == len(ref)
    if len(ref):
        ref = ref.sort_index()
        assert (got["n_docs"].to_numpy() == ref["n_docs"].to_numpy()).all()
        assert (got["n_sources"].to_numpy() == ref["n_sources"].to_numpy()).all()


def test_ngram_novelty_definition(ray_session):
    import re

    from ptrail_ray.entry_queries import NOVELTY_N, QUERIES

    out = QUERIES["q_ngram_novelty"](SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    grams: dict[int, set] = {}
    for r in docs.itertuples():
        toks = re.findall(r"\S+", r.text or "")
        gs = {
            " ".join(toks[i : i + NOVELTY_N])
            for i in range(len(toks) - NOVELTY_N + 1)
        }
        if gs:
            grams[int(r.doc_id)] = gs
    first: dict[str, int] = {}
    for d in sorted(grams):
        for g in grams[d]:
            first.setdefault(g, d)
    assert set(out.index) == set(grams)
    for d, gs in grams.items():
        novel = sum(1 for g in gs if first[g] == d)
        assert int(out.loc[d, "n_grams"]) == len(gs)
        assert int(out.loc[d, "n_novel"]) == novel
        assert abs(out.loc[d, "novelty"] - novel / len(gs)) < 1e-6
    # at least one doc should be non-novel at this scale (near-dups)
    assert (out["novelty"] < 1.0).any()


def test_triangle_count_hand_graph(ray_session):
    import ray.data as rd

    from ptrail_ray.functions.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles) + pendant edge (4,5) + disjoint
    # edge (6,7): expect 4 triangles
    edges = pa.table(
        {
            "doc_a": pa.array([1, 1, 1, 2, 2, 3, 4, 6], pa.int64()),
            "doc_b": pa.array([2, 3, 4, 3, 4, 4, 5, 7], pa.int64()),
        }
    )
    out = triangle_count(rd.from_arrow(edges), num_buckets=4).to_pandas()
    assert int(out.loc[0, "n_triangles"]) == 4
    assert int(out.loc[0, "n_edges"]) == 8
    # degree-oriented wedges (tail = lower (deg, id)): out-deg 1->3,
    # 2->2, 3->1, 5->1, 6->1 => C(3,2)+C(2,2-ish)=3+1 = 4
    assert int(out.loc[0, "n_wedges"]) == 4


def test_triangle_count_planted_hub(ray_session):
    """A hub of degree 5000 (>> the old 4096 max_out_degree hard-raise)
    now completes: degree orientation points every hub edge INTO the
    hub, so the hub emits zero wedges and wedge work stays O(m^1.5)."""
    import ray.data as rd

    from ptrail_ray.functions.graph import triangle_count

    n_leaves = 5000
    hub_a = [0] * n_leaves
    hub_b = list(range(1, n_leaves + 1))
    # one closing edge (1,2) => exactly one triangle {0,1,2}
    star = pa.table(
        {
            "doc_a": pa.array(hub_a + [1], pa.int64()),
            "doc_b": pa.array(hub_b + [2], pa.int64()),
        }
    )
    out = triangle_count(rd.from_arrow(star), num_buckets=4).to_pandas()
    assert int(out.loc[0, "n_edges"]) == n_leaves + 1
    assert int(out.loc[0, "n_triangles"]) == 1
    # only node 1 (out-neighbors {0, 2}) emits a wedge
    assert int(out.loc[0, "n_wedges"]) == 1


def test_triangle_count_join_fallback_matches_broadcast(ray_session):
    """broadcast_max_nodes=0 forces the two-hash-join degree-attach
    path; answers must be identical to the broadcast path."""
    import ray.data as rd

    from ptrail_ray.functions.graph import triangle_count

    edges = pa.table(
        {
            "doc_a": pa.array([1, 1, 1, 2, 2, 3, 4, 6], pa.int64()),
            "doc_b": pa.array([2, 3, 4, 3, 4, 4, 5, 7], pa.int64()),
        }
    )
    out = triangle_count(
        rd.from_arrow(edges), num_buckets=4, broadcast_max_nodes=0
    ).to_pandas()
    assert int(out.loc[0, "n_triangles"]) == 4
    assert int(out.loc[0, "n_wedges"]) == 4
    assert int(out.loc[0, "n_edges"]) == 8


def test_spearman_matches_scipy_free_definition(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_spearman"](SF).to_pandas().set_index("conv_id")
    ref = _transcripts_pdf()
    ref["m1"] = ref["text"].fillna("").str.len()
    for conv, g in ref.groupby("conv_id", sort=False):
        y1 = g["m1"].to_numpy(np.float64)
        ts = g["ts"].to_numpy("datetime64[us]").view("int64")
        y2 = (ts - ts[0]).astype(np.float64)
        got = out.loc[conv, "spearman"]
        r1 = pd.Series(y1).rank().to_numpy()
        r2 = pd.Series(y2).rank().to_numpy()
        if len(y1) < 2 or r1.std() == 0 or r2.std() == 0:
            assert np.isnan(got), conv
            continue
        rho = np.corrcoef(r1, r2)[0, 1]
        assert abs(got - rho) < 1e-5, conv


def test_spearman_kernel_edges():
    from ptrail_ray.stages.stats import spearman_kernel

    ts = pa.array(
        np.arange(10, dtype="int64").view("datetime64[us]"),
        pa.timestamp("us"),
    )
    t = pa.table(
        {
            "conv_id": pa.array(["a"] * 4 + ["b"] * 4 + ["c", "d"]),
            "m1": pa.array([1, 2, 3, 4, 5, 5, 5, 5, 7, 3], pa.int64()),
            "ts": ts,
        }
    )
    out = spearman_kernel(t).to_pandas().set_index("conv_id")
    assert out.loc["a", "spearman"] == 1.0  # strictly increasing
    assert np.isnan(out.loc["b", "spearman"])  # constant m1 -> NULL
    assert np.isnan(out.loc["c", "spearman"])  # single row
    assert np.isnan(out.loc["d", "spearman"])


def test_ks_drift_matches_scipy_style(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ks_drift"](SF).to_pandas().set_index("source")
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    allv = np.sort(docs["n_chars"].to_numpy(np.int64))
    ng = len(allv)
    for src, g in docs.groupby("source"):
        sv = np.sort(g["n_chars"].to_numpy(np.int64))
        ns = len(sv)
        pts = np.unique(allv)
        fg = np.searchsorted(allv, pts, side="right") / ng
        fs = np.searchsorted(sv, pts, side="right") / ns
        d = float(np.abs(fg - fs).max())
        row = out.loc[src]
        assert int(row["n_src"]) == ns and int(row["n_all"]) == ng
        assert abs(row["ks_d"] - d) < 1e-6, src
        assert int(row["ks_num"]) == round(d * ns * ng) or abs(
            row["ks_d"] - int(row["ks_num"]) / (ns * ng)
        ) < 1e-9


def test_tpch_q4_q12_duckdb_parity(ray_session):
    # oracle parity is the gate; here assert structural invariants on
    # the real sf0.001 tables so regressions fail fast without duckdb
    from ptrail_ray.entry_queries import QUERIES, TPCH_Q12_HIGH

    q4 = QUERIES["q_tpch_q4"](SF).to_pandas()
    assert set(q4.columns) == {"o_orderpriority", "order_count"}
    assert (q4["order_count"] > 0).all()
    ords = pd.read_parquet(os.path.join(SF, "orders.parquet"))
    line = pd.read_parquet(os.path.join(SF, "lineitem.parquet"))
    rk = set(line.loc[line["l_returnflag"] == "R", "l_orderkey"])
    win = ords[
        (ords["o_orderdate"] >= "1996-01-01") & (ords["o_orderdate"] < "1997-01-01")
    ]
    ref = win[win["o_orderkey"].isin(rk)].groupby("o_orderpriority").size()
    got = q4.set_index("o_orderpriority")["order_count"]
    assert got.to_dict() == ref.to_dict()

    q12 = QUERIES["q_tpch_q12"](SF).to_pandas().set_index("l_returnflag")
    li = line[
        (line["l_shipdate"] >= "1997-01-01")
        & (line["l_shipdate"] < "1998-01-01")
        & (line["l_returnflag"].isin(["A", "R"]))
    ]
    hi = li["l_orderkey"].map(
        ords.set_index("o_orderkey")["o_orderpriority"].isin(TPCH_Q12_HIGH)
    )
    ref12 = pd.DataFrame({"flag": li["l_returnflag"].to_numpy(), "hi": hi.to_numpy()})
    for f, g in ref12.groupby("flag"):
        assert int(q12.loc[f, "high_count"]) == int(g["hi"].sum())
        assert int(q12.loc[f, "low_count"]) == int((~g["hi"]).sum())


def test_ntile_cume_kernels(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    nt = QUERIES["q_ntile"](SF).to_pandas()
    cm = QUERIES["q_cume_dist"](SF).to_pandas()
    ref = _transcripts_pdf()
    ref["m1"] = ref["text"].fillna("").str.len()
    nt = nt.set_index(["conv_id", "turn_idx"])
    cm = cm.set_index(["conv_id", "turn_idx"])
    for conv, g in ref.groupby("conv_id", sort=False):
        v = g["m1"].to_numpy(np.int64)
        n = len(v)
        order = np.argsort(v, kind="stable")
        # ntile sizing: first n%4 tiles take ceil(n/4)
        big, size_b, size_s = n % 4, n // 4 + 1, max(n // 4, 1)
        tiles = np.empty(n, np.int64)
        for p in range(1, n + 1):
            tiles[order[p - 1]] = (
                (p - 1) // size_b + 1
                if p <= big * size_b
                else big + (p - big * size_b - 1) // size_s + 1
            )
        cume = np.array([(v <= x).sum() / n for x in v])
        for i, ti in enumerate(g["turn_idx"].to_numpy()):
            assert nt.loc[(conv, ti), "ntile4_m1"] == tiles[i], (conv, ti)
            assert abs(cm.loc[(conv, ti), "cume_m1"] - cume[i]) < 1e-6, (conv, ti)


def test_silhouette_definition(ray_session):
    from ptrail_ray.entry_queries import N_CENTROIDS, QUERIES

    out = QUERIES["q_silhouette"](SF).to_pandas().set_index("vec_id")
    emb = pd.read_parquet(os.path.join(SF, "embeddings.parquet"))
    m = np.stack(emb["embedding"].to_numpy())
    ids = emb["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids)
    cmat = m[order[:N_CENTROIDS]].astype(np.float64)
    cids = ids[order[:N_CENTROIDS]]

    def cos(a, b):
        return (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    for i in range(min(50, len(ids))):
        sims = np.array([cos(m[i], c) for c in cmat])
        idx = np.argsort(-sims, kind="stable")
        a, b = 1 - sims[idx[0]], 1 - sims[idx[1]]
        row = out.loc[ids[i]]
        assert row["centroid_id"] == cids[idx[0]], ids[i]
        if max(a, b) == 0:
            assert np.isnan(row["silhouette"])
        else:
            assert abs(row["silhouette"] - (b - a) / max(a, b)) < 1e-5, ids[i]
    assert out["silhouette"].between(-1 - 1e-9, 1 + 1e-9).all()


def test_js_divergence_properties(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_js_divergence"](SF).to_pandas().set_index("source")
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    # nonneg, bounded by ln 2, and matches a scipy-free reference
    assert (out["js"] >= -1e-9).all() and (out["js"] <= np.log(2) + 1e-9).all()
    for src, g in docs.groupby("source"):
        rest = docs[docs["source"] != src]
        xs = np.unique(docs["n_chars"])
        p = (
            g["n_chars"].value_counts().reindex(xs, fill_value=0).to_numpy()
            / len(g)
        )
        q = (
            rest["n_chars"].value_counts().reindex(xs, fill_value=0).to_numpy()
            / len(rest)
        )
        m = (p + q) / 2
        with np.errstate(invalid="ignore", divide="ignore"):
            js = 0.5 * np.nansum(
                np.where(p > 0, p * np.log(p / m), 0)
            ) + 0.5 * np.nansum(np.where(q > 0, q * np.log(q / m), 0))
        assert abs(out.loc[src, "js"] - js) < 1e-6, src
        assert int(out.loc[src, "n_src"]) == len(g)
        assert int(out.loc[src, "n_rest"]) == len(rest)


def test_tpch_q6_q10_structure(ray_session):
    from ptrail_ray.entry_queries import QUERIES, TPCH_Q10_K

    q6 = QUERIES["q_tpch_q6"](SF).to_pandas()
    line = pd.read_parquet(os.path.join(SF, "lineitem.parquet"))
    li = line[
        (line["l_shipdate"] >= "1997-01-01")
        & (line["l_shipdate"] < "1998-01-01")
        & (line["l_discount"] >= 0.04)
        & (line["l_discount"] <= 0.06)
        & (line["l_quantity"] < 24.0)
    ]
    ref = float((li["l_extendedprice"] * li["l_discount"]).sum())
    assert abs(float(q6.loc[0, "revenue"]) - ref) < 1.0  # quantized at 1e-4

    q10 = QUERIES["q_tpch_q10"](SF).to_pandas()
    assert len(q10) <= TPCH_Q10_K
    assert list(q10.columns) == ["c_custkey", "c_name", "n_name", "revenue"]
    # descending revenue with custkey tiebreak
    rv = q10["revenue"].to_numpy()
    assert (np.diff(rv) <= 1e-9).all()
    assert (q10["revenue"] > 0).all()


def test_entropy_mix_and_tool_cond_entropy(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    em = QUERIES["q_entropy_mix"](SF).to_pandas().set_index("dim")
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    for dim in ("source", "lang"):
        p = docs[dim].value_counts(normalize=True).to_numpy()
        h = float(-(p * np.log(p)).sum())
        assert abs(em.loc[dim, "entropy"] - h) < 1e-6
        assert int(em.loc[dim, "n_cats"]) == docs[dim].nunique()
        # entropy bounded by ln(n_cats)
        assert em.loc[dim, "entropy"] <= np.log(em.loc[dim, "n_cats"]) + 1e-9

    ce = QUERIES["q_tool_cond_entropy"](SF).to_pandas().set_index("from_tool")
    tr = QUERIES["q_tool_transitions"](SF).to_pandas()
    for ft, g in tr.groupby("from_tool"):
        p = g["n"].to_numpy(np.float64)
        p = p / p.sum()
        h = float(-(p * np.log(p)).sum())
        assert abs(ce.loc[ft, "h_next"] - h) < 1e-6, ft
        assert int(ce.loc[ft, "n_next"]) == len(g)


def test_first_tool_latency_and_repeat_rate(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    ftl = QUERIES["q_first_tool_latency"](SF).to_pandas().set_index("conv_id")
    rr = QUERIES["q_repeat_user_rate"](SF).to_pandas().set_index("conv_id")
    ref = _transcripts_pdf()
    for conv, g in ref.groupby("conv_id", sort=False):
        tools = g[g["tool"].notna()]
        if tools.empty:
            assert np.isnan(ftl.loc[conv, "first_tool_turn"])
        else:
            ft = int(tools["turn_idx"].min())
            assert int(ftl.loc[conv, "first_tool_turn"]) == ft
            t0 = g["ts"].min()
            fts = g.loc[g["turn_idx"] == ft, "ts"].iloc[0]
            assert int(ftl.loc[conv, "first_tool_us"]) == int(
                (fts - t0).total_seconds() * 1e6
            )
        u = g[g["role"] == "user"]
        if u.empty:
            assert np.isnan(rr.loc[conv, "repeat_rate"])
        else:
            nd = u["text"].fillna("").nunique()
            assert int(rr.loc[conv, "n_user"]) == len(u)
            assert int(rr.loc[conv, "n_distinct"]) == nd
            assert abs(rr.loc[conv, "repeat_rate"] - (1 - nd / len(u))) < 1e-6
