"""Round-4 continuation-4 ops: TPC-H Q15/Q19/Q22 plan shapes, corpus
vocabulary ops, conversation-behavior ops — each checked against an
independent pandas/duckdb recomputation at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _tbl(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_tpch_q15_top_supplier(ray_session):
    from ptrail_ray.entry_queries import TPCH_Q15_FROM, TPCH_Q15_TO, QUERIES

    out = QUERIES["q_tpch_q15"](SF).to_pandas()
    li = _tbl("lineitem")
    lo, hi = pd.Timestamp(TPCH_Q15_FROM), pd.Timestamp(TPCH_Q15_TO)
    w = li[(li["l_shipdate"] >= lo) & (li["l_shipdate"] < hi)].copy()
    w["q"] = np.round(
        w["l_extendedprice"] * (1.0 - w["l_discount"]) * 10000.0
    ).astype(np.int64)
    rev = w.groupby("l_suppkey")["q"].sum()
    top = rev[rev == rev.max()]
    assert sorted(out["s_suppkey"]) == sorted(top.index.tolist())
    sup = _tbl("supplier").set_index("s_suppkey")
    for _, r in out.iterrows():
        assert r["s_name"] == sup.loc[r["s_suppkey"], "s_name"]
        assert abs(r["total_revenue"] - top[r["s_suppkey"]] / 1e4) < 1e-5


def test_tpch_q19_disjunctive_revenue(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tpch_q19"](SF).to_pandas()
    li = _tbl("lineitem").merge(
        _tbl("part"), left_on="l_partkey", right_on="p_partkey"
    )
    q, b, s = li["l_quantity"], li["p_brand"], li["p_size"]
    keep = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1.0, 15.0))
        | ((b == "Brand#2") & s.between(1, 25) & q.between(10.0, 25.0))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20.0, 35.0))
    )
    w = li[keep]
    exp = (
        np.round(w["l_extendedprice"] * (1.0 - w["l_discount"]) * 1e4)
        .astype(np.int64)
        .sum()
        / 1e4
    )
    assert len(out) == 1 and keep.sum() > 0
    assert abs(out["revenue"].iloc[0] - exp) < 1e-5


def test_tpch_q22_dormant_customers(ray_session):
    from ptrail_ray.entry_queries import TPCH_Q22_CUTOFF, QUERIES

    out = QUERIES["q_tpch_q22"](SF).to_pandas()
    cust, orders = _tbl("customer"), _tbl("orders")
    pos = cust[cust["c_acctbal"] > 0.0]
    thr = (
        np.round(pos["c_acctbal"] * 1e4).astype(np.int64).sum()
        / (10000.0 * len(pos))
    )
    active = set(
        orders.loc[
            orders["o_orderdate"] >= pd.Timestamp(TPCH_Q22_CUTOFF), "o_custkey"
        ]
    )
    elig = cust[(cust["c_acctbal"] > thr) & ~cust["c_custkey"].isin(active)]
    assert len(elig) > 0
    exp = elig.groupby("c_nationkey").agg(
        numcust=("c_custkey", "size"), bal=("c_acctbal", "sum")
    )
    got = out.set_index("c_nationkey")
    assert sorted(got.index) == sorted(exp.index.tolist())
    for nk, r in exp.iterrows():
        assert int(got.loc[nk, "numcust"]) == int(r["numcust"])
        assert abs(got.loc[nk, "totacctbal"] - r["bal"]) < 1e-3


def _docs_pdf():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _bigram_counts(df):
    rows = []
    for _, r in df.iterrows():
        toks = [w for w in str(r["text"] or "").split() if w]
        rows += [(r["source"], f"{a} {b}") for a, b in zip(toks, toks[1:])]
    return pd.DataFrame(rows, columns=["source", "bigram"])


def test_hapax_bigrams_matches_pandas(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hapax_bigrams"](SF).to_pandas().set_index("source")
    b = _bigram_counts(_docs_pdf())
    tc = b.groupby(["source", "bigram"]).size().rename("n").reset_index()
    for src, g in tc.groupby("source"):
        nd, nh = len(g), int((g["n"] == 1).sum())
        assert int(out.loc[src, "n_distinct"]) == nd
        assert int(out.loc[src, "n_hapax"]) == nh
        assert abs(out.loc[src, "hapax_ratio"] - nh / nd) < 1e-6


def test_oov_rate_matches_pandas(ray_session):
    from ptrail_ray.entry_queries import OOV_K, QUERIES

    out = QUERIES["q_oov_rate"](SF).to_pandas().set_index("source")
    b = _bigram_counts(_docs_pdf())
    cnt = b.groupby("bigram").size().rename("n").reset_index()
    cnt = cnt.sort_values(["n", "bigram"], ascending=[False, True])
    vocab = set(cnt.head(OOV_K)["bigram"])
    for src, g in b.groupby("source"):
        total = len(g)
        inv = int(g["bigram"].isin(vocab).sum())
        assert int(out.loc[src, "total"]) == total
        assert int(out.loc[src, "in_vocab"]) == inv
        assert abs(out.loc[src, "oov_rate"] - (1 - inv / total)) < 1e-6


def test_bigram_entropy_matches_pandas(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bigram_entropy"](SF).to_pandas().set_index("source")
    b = _bigram_counts(_docs_pdf())
    tc = b.groupby(["source", "bigram"]).size().rename("n").reset_index()
    for src, g in tc.groupby("source"):
        p = g["n"].to_numpy(np.float64) / g["n"].sum()
        h = float(-(p * np.log(p)).sum())
        assert int(out.loc[src, "n_cells"]) == len(g)
        assert int(out.loc[src, "n"]) == int(g["n"].sum())
        assert abs(out.loc[src, "entropy"] - h) < 1e-6
        assert out.loc[src, "entropy"] <= np.log(len(g)) + 1e-9


def _transcripts_pdf():
    from ptrail_ray.sources.transcripts import derive_from_events

    df = derive_from_events(SF).to_pandas()
    return df.sort_values(["conv_id", "turn_idx", "ts"]).reset_index(drop=True)


def test_abandoned_convs(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_abandoned_convs"](SF).to_pandas().set_index("conv_id")
    for conv, g in _transcripts_pdf().groupby("conv_id", sort=False):
        last = g.iloc[-1]
        assert int(out.loc[conv, "n_turns"]) == len(g)
        assert out.loc[conv, "last_role"] == last["role"]
        assert bool(out.loc[conv, "abandoned"]) == (last["role"] == "user")


def test_runs_test_matches_definition(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_runs_test"](SF).to_pandas().set_index("conv_id")
    for conv, g in _transcripts_pdf().groupby("conv_id", sort=False):
        u = (g["role"] == "user").to_numpy()
        n1, n2 = int(u.sum()), int((~u).sum())
        runs = 1 + int((u[1:] != u[:-1]).sum())
        assert int(out.loc[conv, "n1"]) == n1
        assert int(out.loc[conv, "n2"]) == n2
        assert int(out.loc[conv, "runs"]) == runs
        exp = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
        assert abs(out.loc[conv, "expected_runs"] - exp) < 1e-6


def test_tool_trigrams(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tool_trigrams"](SF).to_pandas()
    exp = {}
    for conv, g in _transcripts_pdf().groupby("conv_id", sort=False):
        seq = g.loc[g["tool"].notna(), "tool"].tolist()
        for tri in zip(seq, seq[1:], seq[2:]):
            exp[tri] = exp.get(tri, 0) + 1
    got = {
        (r["t1"], r["t2"], r["t3"]): int(r["n"]) for _, r in out.iterrows()
    }
    assert got == exp and sum(exp.values()) > 0


def test_length_anomaly_matches_float_sigma(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_length_anomaly"](SF).to_pandas().set_index("source")
    docs = _docs_pdf()
    for src, g in docs.groupby("source"):
        x = g["n_chars"].to_numpy(np.float64)
        mu, sd = x.mean(), x.std()  # population
        hi = int((x - mu > 1.5 * sd).sum())
        lo = int((mu - x > 1.5 * sd).sum())
        assert int(out.loc[src, "n_docs"]) == len(g)
        assert int(out.loc[src, "n_hi"]) == hi, src
        assert int(out.loc[src, "n_lo"]) == lo, src


def test_vowel_ratio(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_vowel_ratio"](SF).to_pandas().set_index("source")
    docs = _docs_pdf()
    for src, g in docs.groupby("source"):
        txt = g["text"].fillna("")
        nc = int(txt.str.len().sum())
        nv = int(txt.str.count(r"[aeiou]").sum())
        assert int(out.loc[src, "n_chars"]) == nc
        assert int(out.loc[src, "n_vowels"]) == nv
        assert abs(out.loc[src, "vowel_ratio"] - nv / nc) < 1e-6


def test_mean_word_len(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = (
        QUERIES["q_mean_word_len"](SF)
        .to_pandas()
        .set_index(["source", "lang"])
    )
    docs = _docs_pdf()
    for (src, lang), g in docs.groupby(["source", "lang"]):
        toks = [w for t in g["text"].fillna("") for w in t.split() if w]
        assert int(out.loc[(src, lang), "n_tokens"]) == len(toks)
        nch = sum(len(w) for w in toks)
        assert int(out.loc[(src, lang), "n_chars"]) == nch
        assert abs(out.loc[(src, lang), "mean_word_len"] - nch / len(toks)) < 1e-6


def test_zipf_fit_matches_polyfit(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_zipf_fit"](SF).to_pandas().set_index("lang")
    docs = _docs_pdf()
    for lang, g in docs.groupby("lang"):
        toks = pd.Series([w for t in g["text"].fillna("") for w in t.split() if w])
        tc = toks.value_counts()
        r = np.arange(1, len(tc) + 1, dtype=np.float64)
        slope = np.polyfit(np.log(r), np.log(tc.to_numpy(np.float64)), 1)[0]
        assert int(out.loc[lang, "n_terms"]) == len(tc)
        assert abs(out.loc[lang, "zipf_slope"] - slope) < 1e-4, lang


def test_mcnemar_matches_counts(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    from ptrail_ray.functions.textstats import LANG_TAU, STOPWORDS

    out = QUERIES["q_mcnemar"](SF).to_pandas()
    docs = _docs_pdf()

    def pred(t):
        toks = [w for w in str(t or "").split() if w]
        if not toks:
            return "unk"
        r = sum(w in STOPWORDS for w in toks) / len(toks)
        return "en" if r > LANG_TAU else "unk"

    docs["pred"] = docs["text"].map(pred)
    mj = (
        docs.groupby(["source", "lang"]).size().rename("n").reset_index()
        .sort_values(["n", "lang"], ascending=[False, True], kind="stable")
        .drop_duplicates("source").set_index("source")["lang"]
    )
    docs["ml"] = docs["source"].map(mj)
    hc = docs["pred"] == docs["lang"]
    bc = docs["ml"] == docs["lang"]
    b, c = int((hc & ~bc).sum()), int((~hc & bc).sum())
    assert int(out["b"].iloc[0]) == b and int(out["c"].iloc[0]) == c
    if b + c:
        assert abs(out["mcnemar_stat"].iloc[0] - (b - c) ** 2 / (b + c)) < 1e-6


def test_role_length_ratio(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_role_length_ratio"](SF).to_pandas().set_index("conv_id")
    for conv, g in _transcripts_pdf().groupby("conv_id", sort=False):
        m1 = g["text"].fillna("").str.len()
        a = int(m1[g["role"] == "assistant"].sum())
        u = int(m1[g["role"] == "user"].sum())
        assert int(out.loc[conv, "a_chars"]) == a
        assert int(out.loc[conv, "u_chars"]) == u
        if u == 0:
            assert np.isnan(out.loc[conv, "au_ratio"])
        else:
            assert abs(out.loc[conv, "au_ratio"] - a / u) < 1e-6


def test_tpch_q7_cross_border(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tpch_q7"](SF).to_pandas()
    li = (
        _tbl("lineitem")
        .merge(_tbl("supplier"), left_on="l_suppkey", right_on="s_suppkey")
        .merge(_tbl("orders"), left_on="l_orderkey", right_on="o_orderkey")
        .merge(_tbl("customer"), left_on="o_custkey", right_on="c_custkey")
    )
    nat = _tbl("nation").set_index("n_nationkey")["n_name"]
    li["sn"] = li["s_nationkey"].map(nat)
    li["cn"] = li["c_nationkey"].map(nat)
    li = li[li["sn"] != li["cn"]]
    li["y"] = li["l_shipdate"].dt.year
    li["q"] = np.round(
        li["l_extendedprice"] * (1.0 - li["l_discount"]) * 1e4
    ).astype(np.int64)
    exp = li.groupby(["sn", "cn", "y"])["q"].sum()
    assert len(out) == len(exp)
    got = out.set_index(["supp_nation", "cust_nation", "l_year"])["revenue"]
    for k, v in exp.items():
        assert abs(got.loc[k] - v / 1e4) < 1e-5, k


def test_norm_bands(ray_session):
    from ptrail_ray.entry_queries import NORM_BAND_Q, QUERIES

    out = QUERIES["q_norm_bands"](SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.round(1e9 * (mat * mat)).astype(np.int64).sum(axis=1)
    band = q // int(NORM_BAND_Q * 1e9)
    exp = (
        pd.DataFrame({"label": emb["label"].astype(np.int64), "band": band})
        .groupby(["label", "band"])
        .size()
    )
    got = out.set_index(["label", "band"])["n"]
    assert len(got) == len(exp)
    for k, v in exp.items():
        assert int(got.loc[k]) == int(v)


def test_event_type_dow(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_event_type_dow"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["isodow"] = ev["ts"].dt.dayofweek + 1
    exp = ev.groupby(["event_type", "isodow"]).size()
    got = out.set_index(["event_type", "isodow"])
    assert len(got) == len(exp)
    for k, v in exp.items():
        assert int(got.loc[k, "n"]) == int(v)
        tot = exp.loc[k[0]].sum()
        assert abs(got.loc[k, "share"] - v / tot) < 1e-6


def test_poisson_dispersion(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_poisson_dispersion"](SF).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    for et, g in ev.groupby("event_type"):
        c = g.groupby("user_id").size().to_numpy(np.float64)
        assert int(out.loc[et, "n_users"]) == len(c)
        assert int(out.loc[et, "sum_c"]) == int(c.sum())
        if len(c) >= 2 and c.sum() > 0:
            d = c.var(ddof=1) / c.mean()
            assert abs(out.loc[et, "dispersion"] - d) < 1e-6, et


def test_role_entropy(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_role_entropy"](SF).to_pandas().set_index("conv_id")
    for conv, g in _transcripts_pdf().groupby("conv_id", sort=False):
        c = g["role"].fillna("").value_counts().to_numpy(np.float64)
        p = c / c.sum()
        h = float(-(p * np.log(p)).sum())
        assert int(out.loc[conv, "n_roles"]) == len(c)
        assert int(out.loc[conv, "n_turns"]) == len(g)
        assert abs(out.loc[conv, "role_entropy"] - h) < 1e-6, conv


def test_peak_hour(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_peak_hour"](SF).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["h"] = ev["ts"].dt.hour
    for et, g in ev.groupby("event_type"):
        counts = g.groupby("h").size().rename("n").reset_index()
        counts = counts.sort_values(["n", "h"], ascending=[False, True])
        top = counts.iloc[0]
        assert int(out.loc[et, "peak_hour"]) == int(top["h"])
        assert int(out.loc[et, "peak_n"]) == int(top["n"])
        assert int(out.loc[et, "total_n"]) == len(g)
        assert abs(out.loc[et, "peak_share"] - top["n"] / len(g)) < 1e-6


def test_tpch_q8_market_share(ray_session):
    from ptrail_ray.entry_queries import (
        TPCH_Q8_NATION,
        TPCH_Q8_REGION,
        TPCH_Q8_TYPE,
        QUERIES,
    )

    out = QUERIES["q_tpch_q8"](SF).to_pandas()
    nat = _tbl("nation")
    reg = _tbl("region")
    rk = int(reg.loc[reg["r_name"] == TPCH_Q8_REGION, "r_regionkey"].iloc[0])
    li = (
        _tbl("lineitem")
        .merge(_tbl("part"), left_on="l_partkey", right_on="p_partkey")
        .merge(_tbl("supplier"), left_on="l_suppkey", right_on="s_suppkey")
        .merge(_tbl("orders"), left_on="l_orderkey", right_on="o_orderkey")
        .merge(_tbl("customer"), left_on="o_custkey", right_on="c_custkey")
    )
    nmap = nat.set_index("n_nationkey")
    li = li[li["p_type"] == TPCH_Q8_TYPE]
    li = li[li["c_nationkey"].map(nmap["n_regionkey"]) == rk]
    li["q"] = np.round(
        li["l_extendedprice"] * (1.0 - li["l_discount"]) * 1e4
    ).astype(np.int64)
    li["isn"] = li["s_nationkey"].map(nmap["n_name"]) == TPCH_Q8_NATION
    li["y"] = li["o_orderdate"].dt.year
    exp = li.groupby("y").apply(
        lambda g: g.loc[g["isn"], "q"].sum() / g["q"].sum()
        if g["q"].sum()
        else None,
        include_groups=False,
    )
    exp = exp.dropna()
    got = out.set_index("o_year")["mkt_share"]
    assert len(got) == len(exp)
    for y, v in exp.items():
        assert abs(got.loc[y] - v) < 1e-6, y


def test_gap_histogram(ray_session):
    from ptrail_ray.entry_queries import GAP_BANDS_US, QUERIES

    out = QUERIES["q_gap_histogram"](SF).to_pandas().set_index("band")["n"]
    edges = np.array(GAP_BANDS_US, np.int64)
    exp = {}
    for conv, g in _transcripts_pdf().groupby("conv_id", sort=False):
        us = g["ts"].astype("int64").to_numpy()
        for d in np.diff(us):
            b = int(np.searchsorted(edges, d, side="left"))
            exp[b] = exp.get(b, 0) + 1
    assert out.to_dict() == exp


def test_priority_mix(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_priority_mix"](SF).to_pandas()
    od = _tbl("orders")
    od["q"] = np.round(od["o_totalprice"] * 1e4).astype(np.int64)
    exp = od.groupby(["o_orderstatus", "o_orderpriority"]).agg(
        n=("q", "size"), qp=("q", "sum")
    )
    tot = exp["qp"].sum()
    got = out.set_index(["o_orderstatus", "o_orderpriority"])
    assert len(got) == len(exp)
    for k, r in exp.iterrows():
        assert int(got.loc[k, "n_orders"]) == int(r["n"])
        assert abs(got.loc[k, "total_price"] - r["qp"] / 1e4) < 1e-5
        assert abs(got.loc[k, "price_share"] - r["qp"] / tot) < 1e-6


def test_tpch_q17_small_qty_revenue(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tpch_q17"](SF).to_pandas()
    li = _tbl("lineitem")
    avg = li.groupby("l_partkey")["l_quantity"].transform(
        lambda s: 0.2 * (s.sum() / len(s))
    )
    keep = li["l_quantity"].to_numpy(np.float64) < avg.to_numpy(np.float64)
    q = np.round(li["l_extendedprice"].to_numpy(np.float64) * 1e4).astype(
        np.int64
    )
    exp = (int(q[keep].sum()) / 1e4) / 7.0
    assert abs(out["avg_yearly"].iloc[0] - exp) < 1e-6


def test_price_quantiles(ray_session):
    from ptrail_ray.entry_queries import PRICE_QS, QUERIES

    out = QUERIES["q_price_quantiles"](SF).to_pandas().set_index(
        "o_orderstatus"
    )
    od = _tbl("orders")
    for st, g in od.groupby("o_orderstatus"):
        v = np.sort(g["o_totalprice"].to_numpy(np.float64))
        for q in PRICE_QS:
            exp = np.quantile(v, q, method="linear")
            assert abs(out.loc[st, f"q{int(q * 100)}"] - exp) < 1e-5, (st, q)


def test_user_type_diversity(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_user_type_diversity"](SF).to_pandas()
    ev = _tbl("events")
    nt = ev.groupby("user_id")["event_type"].nunique()
    exp = nt.value_counts().sort_index()
    got = out.set_index("n_types")["n_users"]
    assert got.to_dict() == {int(k): int(v) for k, v in exp.items()}


def test_tpch_q21_late_supplier(ray_session):
    from ptrail_ray.entry_queries import TPCH_Q21_LATE_DAYS, QUERIES

    out = QUERIES["q_tpch_q21"](SF).to_pandas()
    li = _tbl("lineitem")
    od = _tbl("orders")
    m = li.merge(
        od[["o_orderkey", "o_orderdate", "o_orderstatus"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    m = m[m["o_orderstatus"] == "F"].copy()
    m["late"] = (
        m["l_shipdate"].astype("int64")
        > m["o_orderdate"].astype("int64")
        + TPCH_Q21_LATE_DAYS * 86_400_000_000
    )
    nsupp = m.drop_duplicates(["l_orderkey", "l_suppkey"]).groupby(
        "l_orderkey"
    ).size()
    lp = m[m["late"]].drop_duplicates(["l_orderkey", "l_suppkey"])
    nlate = lp.groupby("l_orderkey").size()
    ok = nsupp.index[(nsupp >= 2) & (nlate.reindex(nsupp.index).fillna(0) == 1)]
    exp = lp[lp["l_orderkey"].isin(set(ok))].groupby("l_suppkey").size()
    sup = _tbl("supplier").set_index("s_suppkey")["s_name"]
    got = out.set_index("s_name")["numwait"]
    assert len(got) == len(exp)
    for sk, n in exp.items():
        assert int(got[sup[sk]]) == int(n)


def test_tpch_q9_profit(ray_session):
    from ptrail_ray.entry_queries import TPCH_Q9_TOKEN, QUERIES

    out = QUERIES["q_tpch_q9"](SF).to_pandas()
    li = _tbl("lineitem")
    p = _tbl("part")
    keys = set(p.loc[p["p_name"].str.contains(TPCH_Q9_TOKEN), "p_partkey"])
    m = li[li["l_partkey"].isin(keys)].merge(
        _tbl("orders")[["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey", right_on="o_orderkey",
    ).merge(
        _tbl("supplier")[["s_suppkey", "s_nationkey"]],
        left_on="l_suppkey", right_on="s_suppkey",
    )
    nmap = _tbl("nation").set_index("n_nationkey")["n_name"]
    m["nation"] = m["s_nationkey"].map(nmap)
    m["y"] = m["o_orderdate"].dt.year
    m["q"] = np.round(
        m["l_extendedprice"] * (1.0 - m["l_discount"]) * 1e4
    ).astype(np.int64)
    exp = m.groupby(["nation", "y"])["q"].sum()
    got = out.set_index(["nation", "o_year"])["profit"]
    assert len(got) == len(exp)
    for k, v in exp.items():
        assert abs(got[k] - v / 1e4) < 1e-5, k


def test_tpch_q16_supplier_cnt(ray_session):
    from ptrail_ray.entry_queries import (
        TPCH_Q16_BAL, TPCH_Q16_SIZES, QUERIES,
    )

    out = QUERIES["q_tpch_q16"](SF).to_pandas()
    p = _tbl("part")
    pf = p[
        (p["p_brand"] != "Brand#1")
        & (p["p_type"] != "PROMO")
        & p["p_size"].isin(TPCH_Q16_SIZES)
    ]
    s = _tbl("supplier")
    excl = set(s.loc[s["s_acctbal"] < TPCH_Q16_BAL, "s_suppkey"])
    li = _tbl("lineitem")
    m = li[li["l_partkey"].isin(set(pf["p_partkey"])) & ~li["l_suppkey"].isin(excl)]
    m = m.merge(pf, left_on="l_partkey", right_on="p_partkey")
    exp = m.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"].nunique()
    got = out.set_index(["p_brand", "p_type", "p_size"])["supplier_cnt"]
    assert len(got) == len(exp)
    for k, v in exp.items():
        assert int(got[k]) == int(v), k


def test_cusum(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cusum"](SF).to_pandas().set_index("event_type")
    ev = _tbl("events")
    d = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy(np.int64)
    dmin, dmax = int(d.min()), int(d.max())
    n = dmax - dmin + 1
    for et, g in ev.assign(d=d).groupby("event_type"):
        x = np.zeros(n, np.int64)
        cnt = g.groupby("d").size()
        x[cnt.index.to_numpy(np.int64) - dmin] = cnt.to_numpy(np.int64)
        p = np.cumsum(n * x - int(x.sum()))
        s = p - np.minimum(np.minimum.accumulate(p), 0)
        assert int(out.loc[et, "cusum"]) == int(s.max())
        assert int(out.loc[et, "break_day"]) == dmin + int(np.argmax(s))


def test_mode_event(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mode_event"](SF).to_pandas().set_index("user_id")
    ev = _tbl("events")
    c = ev.groupby(["user_id", "event_type"]).size().reset_index(name="n")
    c = c.sort_values(
        ["user_id", "n", "event_type"], ascending=[True, False, True]
    ).drop_duplicates("user_id").set_index("user_id")
    assert len(out) == len(c)
    for u in c.index:
        assert out.loc[u, "mode_type"] == c.loc[u, "event_type"]
        assert int(out.loc[u, "n"]) == int(c.loc[u, "n"])


def test_ndcg(ray_session):
    from ptrail_ray.entry_queries import NDCG_GAINS, NDCG_K, NDCG_QW, QUERIES

    out = QUERIES["q_ndcg"](SF).to_pandas().set_index("user_id")["ndcg"]
    ev = _tbl("events")
    qw = np.array(NDCG_QW, np.int64)
    for u, g in ev.groupby("user_id"):
        g = g.sort_values(["value", "event_id"], ascending=[False, True])
        gains = g["event_type"].map(NDCG_GAINS).fillna(0).to_numpy(np.int64)[
            :NDCG_K
        ]
        dcg = int((gains * qw[: len(gains)]).sum())
        ideal = np.sort(gains)[::-1]
        idcg = int((ideal * qw[: len(ideal)]).sum())
        if idcg == 0:
            assert u not in out.index
        else:
            assert abs(out[u] - dcg / idcg) < 1e-6



def test_kendall_tau(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kendall_tau"](SF)
    out = (out.to_pandas() if hasattr(out, "to_pandas") else out)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out.set_index("conv_id")
    tr = _transcripts_pdf()
    for conv, g in tr.groupby("conv_id"):
        x = g["text"].fillna("").str.len().to_numpy(np.int64)
        y = g["ts"].astype("int64").to_numpy(np.int64)
        n = len(g)
        iu, ju = np.triu_indices(n, 1)
        prod = np.sign(x[ju] - x[iu]) * np.sign(y[ju] - y[iu])
        c, d = int((prod > 0).sum()), int((prod < 0).sum())
        n0 = n * (n - 1) // 2
        n1 = int(sum(k * (k - 1) // 2 for k in np.unique(x, return_counts=True)[1]))
        n2 = int(sum(k * (k - 1) // 2 for k in np.unique(y, return_counts=True)[1]))
        assert int(out.loc[conv, "n"]) == n
        if n0 - n1 > 0 and n0 - n2 > 0:
            exp = (c - d) / np.sqrt(float((n0 - n1) * (n0 - n2)))
            assert abs(out.loc[conv, "tau"] - exp) < 1e-6, conv
        else:
            assert pd.isna(out.loc[conv, "tau"])


def test_cramers_v(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cramers_v"](SF).to_pandas()
    ev = _tbl("events")
    dow = ((ev["ts"].astype("int64") // 86_400_000_000 + 3) % 7) + 1
    ct = pd.crosstab(ev["event_type"], dow)
    o = ct.to_numpy(np.float64)
    rn = o.sum(axis=1, keepdims=True)
    cn = o.sum(axis=0, keepdims=True)
    t = o.sum()
    e = rn * cn / t
    chi2 = ((o - e) ** 2 / e).sum()
    m = min(ct.shape[0] - 1, ct.shape[1] - 1)
    assert abs(out["chi2"].iloc[0] - chi2) < 1e-4
    assert int(out["n"].iloc[0]) == int(t)
    assert abs(out["cramers_v"].iloc[0] - np.sqrt(chi2 / (t * m))) < 1e-6


def test_prop_ztest(ray_session):
    from ptrail_ray.entry_queries import ZTEST_SUCCESS, QUERIES

    out = QUERIES["q_prop_ztest"](SF).to_pandas().iloc[0]
    ev = _tbl("events")
    g0 = ev[ev["user_id"] % 2 == 0]
    g1 = ev[ev["user_id"] % 2 == 1]
    x1, n1 = int((g0["event_type"] == ZTEST_SUCCESS).sum()), len(g0)
    x2, n2 = int((g1["event_type"] == ZTEST_SUCCESS).sum()), len(g1)
    assert (int(out["x1"]), int(out["n1"])) == (x1, n1)
    assert (int(out["x2"]), int(out["n2"])) == (x2, n2)
    p1, p2, p = x1 / n1, x2 / n2, (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / np.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    assert abs(out["z"] - z) < 1e-6


def test_cube_orders(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cube_orders"](SF).to_pandas()
    od = _tbl("orders")
    od["q"] = np.round(od["o_totalprice"] * 1e4).astype(np.int64)
    assert len(out) == (
        od.groupby(["o_orderstatus", "o_orderpriority"]).ngroups
        + od["o_orderstatus"].nunique()
        + od["o_orderpriority"].nunique()
        + 1
    )
    total = out[
        out["o_orderstatus"].isna() & out["o_orderpriority"].isna()
    ].iloc[0]
    assert int(total["n_orders"]) == len(od)
    assert abs(total["total_price"] - od["q"].sum() / 1e4) < 1e-5
    bys = out[out["o_orderpriority"].isna() & out["o_orderstatus"].notna()]
    exp = od.groupby("o_orderstatus")["q"].sum()
    for _, r in bys.iterrows():
        assert abs(r["total_price"] - exp[r["o_orderstatus"]] / 1e4) < 1e-5


def test_turn_edit_dist(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_turn_edit_dist"](SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    out = out.set_index("conv_id")

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    tr = _transcripts_pdf()
    for conv, g in tr.groupby("conv_id"):
        txt = g["text"].fillna("").tolist()
        if len(txt) < 2:
            assert conv not in out.index
            continue
        ds = [lev(a, b) for a, b in zip(txt, txt[1:])]
        assert int(out.loc[conv, "n_pairs"]) == len(ds)
        assert abs(out.loc[conv, "mean_edit"] - np.mean(ds)) < 1e-6, conv


def test_above_avg_orders(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_above_avg_orders"](SF)
    out = (out.to_pandas() if not isinstance(out, pd.DataFrame) else out)
    out = out.set_index("c_custkey")
    od = _tbl("orders")
    od["p"] = np.round(od["o_totalprice"] * 1e4).astype(np.int64)
    for ck, g in od.groupby("o_custkey"):
        above = int((g["p"] * len(g) > g["p"].sum()).sum())
        assert int(out.loc[ck, "n_orders"]) == len(g)
        assert int(out.loc[ck, "n_above"]) == above


def test_min_unit_price(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_min_unit_price"](SF)
    out = (out.to_pandas() if not isinstance(out, pd.DataFrame) else out)
    li = _tbl("lineitem")
    li["u"] = np.round(li["l_extendedprice"] * 1e4).astype(np.int64).astype(
        np.float64
    ) / li["l_quantity"].astype(np.int64).astype(np.float64)
    mn = li.groupby("l_partkey")["u"].transform("min")
    exp = li[li["u"] == mn].drop_duplicates(["l_partkey", "l_suppkey"])
    got = out.set_index(["p_partkey", "s_suppkey"])["min_unit_price"]
    assert len(got) == len(exp)
    for _, r in exp.iterrows():
        assert abs(got[(r["l_partkey"], r["l_suppkey"])] - r["u"]) < 1e-6


def test_interarrival(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_interarrival"](SF)
    out = (out.to_pandas() if not isinstance(out, pd.DataFrame) else out)
    out = out.set_index("event_type")
    ev = _tbl("events")
    for et, g in ev.groupby("event_type"):
        us = g["ts"].astype("int64")
        assert int(out.loc[et, "n"]) == len(g)
        exp = (us.max() - us.min()) / (len(g) - 1)
        assert abs(out.loc[et, "mean_gap_us"] - exp) < 1e-4


def test_odds_ratio(ray_session):
    from ptrail_ray.entry_queries import ZTEST_SUCCESS, QUERIES

    out = QUERIES["q_odds_ratio"](SF).to_pandas().iloc[0]
    ev = _tbl("events")
    g0 = ev[ev["user_id"] % 2 == 0]
    g1 = ev[ev["user_id"] % 2 == 1]
    a = int((g0["event_type"] == ZTEST_SUCCESS).sum())
    b = len(g0) - a
    c = int((g1["event_type"] == ZTEST_SUCCESS).sum())
    d = len(g1) - c
    assert (int(out["a"]), int(out["b"]), int(out["c"]), int(out["d"])) == (
        a, b, c, d,
    )
    assert abs(out["odds_ratio"] - (a * d) / (c * b)) < 1e-6
    assert abs(
        out["log_or_se"] - np.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    ) < 1e-6


def test_unpivot(ray_session):
    import pyarrow as pa

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_unpivot"](SF)
    out = (out.to_pandas() if not isinstance(out, pd.DataFrame) else out)
    docs = _tbl("documents")
    g = docs.groupby("source")["n_chars"].agg(["size", "sum", "max"])
    got = out.set_index(["source", "metric"])["value"]
    assert len(out) == 3 * len(g)
    for src, r in g.iterrows():
        assert got[(src, "n_docs")] == r["size"]
        assert got[(src, "chars")] == r["sum"]
        assert got[(src, "max_chars")] == r["max"]
    # Dataset-level melt: per-block streaming, row conservation
    import ray.data as rd

    from ptrail_ray.stages.project import melt

    wide = pa.table(
        {
            "k": pa.array(["a", "b", "c"]),
            "v1": pa.array([1, 2, 3], pa.int64()),
            "v2": pa.array([10, 20, 30], pa.int64()),
        }
    )
    long = melt(rd.from_arrow(wide), ["k"], ["v1", "v2"]).to_pandas()
    assert len(long) == 6
    assert set(zip(long["k"], long["metric"], long["value"])) == {
        ("a", "v1", 1), ("a", "v2", 10), ("b", "v1", 2),
        ("b", "v2", 20), ("c", "v1", 3), ("c", "v2", 30),
    }


def test_hhi(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hhi"](SF)
    out = (out.to_pandas() if not isinstance(out, pd.DataFrame) else out)
    out = out.set_index("lang")
    docs = _tbl("documents")
    for lang, g in docs.groupby("lang"):
        c = g.groupby("source").size()
        exp = float((c**2).sum()) / float(len(g)) ** 2
        assert int(out.loc[lang, "n_docs"]) == len(g)
        assert abs(out.loc[lang, "hhi"] - exp) < 1e-6


def test_mase(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mase"](SF)
    out = (out.to_pandas() if not isinstance(out, pd.DataFrame) else out)
    out = out.set_index("event_type")
    ev = _tbl("events")
    d = ev["ts"].astype("int64") // 86_400_000_000
    dmin, dmax = int(d.min()), int(d.max())
    n = dmax - dmin + 1
    for et, g in ev.groupby("event_type"):
        y = np.zeros(n, np.int64)
        vc = (g["ts"].astype("int64") // 86_400_000_000 - dmin).value_counts()
        y[vc.index.to_numpy()] = vc.to_numpy()
        num = int(np.abs(y[7:] - y[:-7]).sum())
        den = int(np.abs(y[1:] - y[:-1]).sum())
        assert int(out.loc[et, "sum_abs_e7"]) == num
        assert int(out.loc[et, "sum_abs_e1"]) == den
        exp = (num / (n - 7)) / (den / (n - 1))
        assert abs(out.loc[et, "mase"] - exp) < 1e-6


def test_char_jaccard(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_char_jaccard"](SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    out = out.set_index("conv_id")

    def jac(a, b):
        sa, sb = set(a.encode("utf-8")), set(b.encode("utf-8"))
        return len(sa & sb) / len(sa | sb)

    tr = _transcripts_pdf()
    for conv, g in tr.groupby("conv_id"):
        txt = g["text"].fillna("").tolist()
        pairs = [
            (a, b) for a, b in zip(txt, txt[1:]) if len(a) and len(b)
        ]
        if not pairs:
            assert conv not in out.index
            continue
        micro = [int(np.floor(jac(a, b) * 1e6 + 0.5)) for a, b in pairs]
        assert int(out.loc[conv, "n_pairs"]) == len(pairs)
        assert int(out.loc[conv, "sum_j_micro"]) == sum(micro)
        assert abs(
            out.loc[conv, "mean_jaccard"] - sum(micro) / len(micro) / 1e6
        ) < 1e-6


def test_anova_f(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_anova_f"](SF).to_pandas().iloc[0]
    docs = _tbl("documents")
    g = docs.groupby("source")["n_chars"]
    k, n = len(g), len(docs)
    grand = docs["n_chars"].mean()
    ssb = sum(len(gg) * (gg.mean() - grand) ** 2 for _, gg in g)
    ssw = sum(((gg - gg.mean()) ** 2).sum() for _, gg in g)
    f_exp = (ssb / (k - 1)) / (ssw / (n - k))
    assert int(out["k"]) == k and int(out["n"]) == n
    assert abs(out["ssb_micro"] / 1e6 - ssb) < 1e-3 * max(1.0, ssb)
    assert abs(out["ssw_micro"] / 1e6 - ssw) < 1e-3 * max(1.0, ssw)
    assert abs(out["f_stat"] - f_exp) < 1e-4 * max(1.0, f_exp)


def test_percentile_disc(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_percentile_disc"](SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    out = out.set_index("source")
    docs = _tbl("documents")
    for src, g in docs.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(v)
        assert int(out.loc[src, "n"]) == n
        for col, q in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75)):
            idx = int(np.ceil(q * n)) - 1
            assert int(out.loc[src, col]) == int(v[idx])


def test_mannwhitney(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mannwhitney"](SF).to_pandas().iloc[0]
    docs = _tbl("documents")
    v = docs["n_chars"].to_numpy(np.int64)
    en = (docs["lang"] == "en").to_numpy()
    order = np.argsort(v, kind="mergesort")
    sv = v[order]
    ranks = np.empty(len(v), np.float64)
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n1, n = int(en.sum()), len(v)
    r1 = ranks[en].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert int(out["n1"]) == n1 and int(out["n2"]) == n - n1
    assert int(out["u1_double"]) == int(round(2 * u1))
    _, cts = np.unique(v, return_counts=True)
    assert int(out["tie_sum"]) == int((cts.astype(object) ** 3 - cts).sum())
    var = (n1 * (n - n1) / 12.0) * (
        (n + 1) - float((cts**3 - cts).sum()) / (n * (n - 1))
    )
    z_exp = (u1 - n1 * (n - n1) / 2.0) / np.sqrt(var)
    assert abs(out["z"] - z_exp) < 1e-5


def test_holt(ray_session):
    from ptrail_ray.entry_queries import HOLT_ALPHA, HOLT_BETA, QUERIES

    out = QUERIES["q_holt"](SF).to_pandas().set_index("event_type")
    ev = _tbl("events")
    d = (ev["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000)
    dmin, dmax = int(d.min()), int(d.max())
    n = dmax - dmin + 1
    for et, g in ev.groupby("event_type"):
        y = np.zeros(n, np.int64)
        dd = (g["ts"].astype("datetime64[us]").astype(np.int64)
              // 86_400_000_000).to_numpy() - dmin
        np.add.at(y, dd, 1)
        lvl, b = float(y[0]), 0.0
        for t in range(1, n):
            l_new = HOLT_ALPHA * float(y[t]) + (1 - HOLT_ALPHA) * (lvl + b)
            b = HOLT_BETA * (l_new - lvl) + (1 - HOLT_BETA) * b
            lvl = l_new
        assert abs(out.loc[et, "level"] - lvl) < 1e-5 * max(1.0, abs(lvl))
        assert abs(out.loc[et, "trend"] - b) < 1e-5 * max(1.0, abs(b))


def test_tpch_q11(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tpch_q11"](SF).to_pandas()
    li = _tbl("lineitem")
    q = np.round(
        li["l_extendedprice"] * (1.0 - li["l_discount"]) * 10000.0
    ).astype(np.int64)
    per = pd.DataFrame({"p": li["l_partkey"], "v": q}).groupby("p")["v"].sum()
    tot = int(per.sum())
    keep = per[per.astype(object) * 10000 > tot].sort_index()
    assert out["p_partkey"].tolist() == keep.index.tolist()
    assert out["value_q"].tolist() == keep.tolist()


def test_kruskal(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kruskal"](SF).to_pandas().iloc[0]
    docs = _tbl("documents")
    v = docs["n_chars"].to_numpy(np.int64)
    order = np.argsort(v, kind="mergesort")
    sv = v[order]
    ranks = np.empty(len(v), np.float64)
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n = len(v)
    grp = pd.DataFrame({"s": docs["source"], "r": ranks}).groupby("s")["r"]
    h = 12.0 / (n * (n + 1)) * sum(
        g.sum() ** 2 / len(g) for _, g in grp
    ) - 3 * (n + 1)
    _, cts = np.unique(v, return_counts=True)
    h /= 1.0 - float((cts.astype(object) ** 3 - cts).sum()) / (n**3 - n)
    assert int(out["k"]) == docs["source"].nunique()
    assert int(out["n"]) == n
    assert abs(out["h"] - h) < 1e-4 * max(1.0, abs(h))


def test_tpch_q20(ray_session):
    from ptrail_ray.entry_queries import TPCH_Q20_FROM, TPCH_Q20_TO, QUERIES

    out = QUERIES["q_tpch_q20"](SF).to_pandas()
    li = _tbl("lineitem")
    w = li[
        (li["l_shipdate"] >= pd.Timestamp(TPCH_Q20_FROM))
        & (li["l_shipdate"] < pd.Timestamp(TPCH_Q20_TO))
    ].copy()
    w["q"] = np.rint(w["l_quantity"]).astype(np.int64)
    ps = w.groupby(["l_partkey", "l_suppkey"], as_index=False)["q"].sum()
    tot = ps.groupby("l_partkey")["q"].transform("sum")
    dom = ps[2 * ps["q"] > tot]
    exp = dom.groupby("l_suppkey").size().sort_index()
    assert out["s_suppkey"].tolist() == exp.index.tolist()
    assert out["n_parts_dominant"].tolist() == exp.tolist()
    sup = _tbl("supplier").set_index("s_suppkey")
    assert (
        out["s_name"].tolist()
        == sup.loc[out["s_suppkey"], "s_name"].tolist()
    )


def test_top_decile_share(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_top_decile_share"](SF).to_pandas().iloc[0]
    ev = _tbl("events")
    sz = ev.groupby("user_id").size().sort_values(ascending=False)
    n = len(sz)
    k = (n + 9) // 10
    top = int(sz.iloc[:k].sum())
    assert int(out["n_convs"]) == n and int(out["k_top"]) == k
    assert int(out["turns_top"]) == top
    assert int(out["turns_total"]) == int(sz.sum())
    assert abs(out["share"] - top / sz.sum()) < 1e-6


def test_entropy_rate(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_entropy_rate"](SF).to_pandas().iloc[0]
    tr = _transcripts_pdf()
    pairs = []
    for _, g in tr.groupby("conv_id", sort=False):
        r = g["role"].tolist()
        pairs += list(zip(r, r[1:]))
    ct = pd.Series(pairs).value_counts()
    t = int(ct.sum())
    rsum = {}
    for (a, _), n in ct.items():
        rsum[a] = rsum.get(a, 0) + n
    h = sum(-(n / t) * np.log(n / rsum[a]) for (a, _), n in ct.items())
    assert int(out["n_pairs"]) == t
    assert int(out["n_cells"]) == len(ct)
    assert abs(out["entropy_rate"] - h) < 1e-9


def test_seasonal_idx(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_seasonal_idx"](SF).to_pandas()
    ev = _tbl("events")
    d = (ev["ts"].astype("datetime64[us]").astype(np.int64)
         // 86_400_000_000).to_numpy()
    dmin, dmax = int(d.min()), int(d.max())
    n = dmax - dmin + 1
    for et, g in ev.groupby("event_type"):
        y = np.zeros(n, np.int64)
        dd = (g["ts"].astype("datetime64[us]").astype(np.int64)
              // 86_400_000_000).to_numpy() - dmin
        np.add.at(y, dd, 1)
        s7 = np.convolve(y, np.ones(7, np.int64), mode="valid")
        d7 = 7 * y[3:n - 3] - s7
        dow = ((np.arange(3, n - 3) + dmin) % 7 + 3) % 7 + 1
        exp = pd.DataFrame({"dw": dow, "d7": d7}).groupby("dw")["d7"]
        sub = out[out["event_type"] == et].set_index("isodow")
        for dw, gg in exp:
            assert int(sub.loc[dw, "sum_d7"]) == int(gg.sum())
            assert int(sub.loc[dw, "n_days"]) == len(gg)
            assert abs(
                sub.loc[dw, "seasonal_idx"] - gg.sum() / (7.0 * len(gg))
            ) < 1e-6


def test_logrank(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_logrank"](SF).to_pandas().iloc[0]
    tr = _transcripts_pdf()
    recs = []
    for _, g in tr.groupby("conv_id", sort=False):
        t0 = g["ts"].min()
        tool = g[g["tool"].notna()]
        ev = len(tool) > 0
        tt = tool["ts"].min() if ev else g["ts"].max()
        dur = int(
            (tt.value // 1000 - t0.value // 1000) // 1_000_000
        )  # pandas ns → us → s
        coh = 1 if g["role"].iloc[0] == "user" else 0
        recs.append((dur, coh, int(ev)))
    df = pd.DataFrame(recs, columns=["dur", "coh", "ev"])
    assert int(out["n1_total"]) == int((df["coh"] == 1).sum())
    assert int(out["n2_total"]) == int((df["coh"] == 0).sum())
    times = sorted(df.loc[df["ev"] == 1, "dur"].unique())
    assert int(out["n_event_times"]) == len(times)
    o1 = e1 = v = 0.0
    for t in times:
        at = df[df["dur"] >= t]
        nn, n1 = len(at), int((at["coh"] == 1).sum())
        dth = at[(at["dur"] == t) & (at["ev"] == 1)]
        dd, dd1 = len(dth), int((dth["coh"] == 1).sum())
        o1 += dd1
        e1 += dd * n1 / nn
        if nn > 1:
            v += dd * (n1 / nn) * ((nn - n1) / nn) * (nn - dd) / (nn - 1)
    assert int(out["o1"]) == int(o1)
    assert abs(out["e1"] - e1) < 1e-6
    assert abs(out["v"] - v) < 1e-6
    assert abs(out["z"] - (o1 - e1) / np.sqrt(v)) < 1e-5
