"""Round-4 continuation-5 ops: paired nonparametric tests, survival
curves, recursive graph closure — each checked against an independent
pandas recomputation at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _transcripts_pdf():
    from ptrail_ray.sources.transcripts import derive_from_events

    df = derive_from_events(SF).to_pandas()
    return df.sort_values(["conv_id", "turn_idx", "ts"]).reset_index(drop=True)


def test_wilcoxon_signed_rank(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_wilcoxon"](SF).to_pandas()
    tr = _transcripts_pdf()
    tr["m1"] = tr["text"].fillna("").str.len()
    per = tr.groupby("conv_id").apply(
        lambda g: int(g.loc[g["role"] == "user", "m1"].sum())
        - int(g.loc[g["role"] == "assistant", "m1"].sum()),
        include_groups=False,
    )
    d = per[per != 0].to_numpy()
    ranks = pd.Series(np.abs(d)).rank(method="average").to_numpy()
    w_plus = float(ranks[d > 0].sum())
    n = len(d)
    assert out["n_pairs"].iloc[0] == n
    assert out["w_plus_double"].iloc[0] == int(round(2 * w_plus))
    _, t_counts = np.unique(np.abs(d), return_counts=True)
    tsum = int((t_counts.astype(np.int64) ** 3 - t_counts).sum())
    assert out["tie_sum"].iloc[0] == tsum
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tsum / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / np.sqrt(var)
    assert abs(out["z"].iloc[0] - z) < 1e-6


def test_kaplan_meier_curve(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kaplan_meier"](SF).to_pandas()
    tr = _transcripts_pdf()
    rows = []
    for _, g in tr.groupby("conv_id", sort=False):
        t0, t1 = g["ts"].min(), g["ts"].max()
        tool_ts = g.loc[g["tool"].notna(), "ts"]
        ev = len(tool_ts) > 0
        tt = tool_ts.min() if ev else t1
        rows.append((int((tt - t0).value // 1_000_000_000), ev))
    per = pd.DataFrame(rows, columns=["dur", "ev"])
    surv = 1.0
    exp = {}
    for t in sorted(per.loc[per["ev"], "dur"].unique()):
        nn = int((per["dur"] >= t).sum())
        d = int(((per["dur"] == t) & per["ev"]).sum())
        surv *= (nn - d) / nn
        exp[t] = (nn, d, surv)
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        nn, d, s = exp[int(r["dur_s"])]
        assert r["n_risk"] == nn and r["n_event"] == d
        assert abs(r["km"] - s) < 1e-6
    # KM is non-increasing in t
    assert (np.diff(out.sort_values("dur_s")["km"].to_numpy()) <= 1e-12).all()


def test_reach_hops_bfs(ray_session):
    from ptrail_ray.entry_queries import QUERIES, REACH_SEED

    out = QUERIES["q_reach_hops"](SF).to_pandas()
    tr = _transcripts_pdf()
    edges = set()
    for _, g in tr.groupby("conv_id", sort=False):
        tools = g.loc[g["tool"].notna(), "tool"].tolist()
        for a, b in zip(tools, tools[1:]):
            if a != b:
                edges.add((a, b))
    dist = {REACH_SEED: 0}
    frontier = [REACH_SEED]
    while frontier:
        nxt = []
        for u in frontier:
            for a, b in edges:
                if a == u and b not in dist:
                    dist[b] = dist[u] + 1
                    nxt.append(b)
        frontier = nxt
    got = dict(zip(out["tool"], out["hops"]))
    assert got == dist
    assert got[REACH_SEED] == 0


def _events_pdf():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_friedman_weekday_blocks(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_friedman"](SF).to_pandas()
    ev = _events_pdf()
    d = (ev["ts"].astype("datetime64[ns]").astype("int64")
         // (86_400 * 10**9)).to_numpy()
    dmin, dmax = d.min(), d.max()
    days = np.arange(dmin, dmax + 1)
    y = np.zeros(len(days), np.int64)
    u, c = np.unique(d, return_counts=True)
    y[u - dmin] = c
    wk = (days + 3) // 7
    keep = (wk * 7 - 3 >= dmin) & (wk * 7 + 3 <= dmax)
    wk, y = wk[keep], y[keep]
    df = pd.DataFrame({"wk": wk, "y": y})
    df["r"] = df.groupby("wk")["y"].rank(method="average")
    df["dow"] = ((days[keep] % 7) + 3) % 7 + 1
    b = df["wk"].nunique()
    k = 7
    rj = df.groupby("dow")["r"].sum().to_numpy()
    a = float((df["r"] ** 2).sum())
    cc = b * k * (k + 1) ** 2 / 4.0
    q = (k - 1) * float(((rj - b * (k + 1) / 2.0) ** 2).sum()) / (a - cc)
    assert out["n_blocks"].iloc[0] == b
    assert abs(out["q_stat"].iloc[0] - q) < 1e-6


def test_levene_brown_forsythe(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_levene"](SF).to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    zs = []
    for _, g in docs.groupby("source"):
        x = np.sort(g["n_chars"].to_numpy(np.int64))
        med = x[int(np.ceil(0.5 * len(x))) - 1]
        zs.append(np.abs(g["n_chars"].to_numpy(np.int64) - med))
    k = len(zs)
    nn = sum(len(z) for z in zs)
    allz = np.concatenate(zs)
    gm = allz.mean()
    ssb = sum(len(z) * (z.mean() - gm) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    assert out["k"].iloc[0] == k and out["n"].iloc[0] == nn
    assert abs(out["f_stat"].iloc[0] - f) < 1e-4


def test_durbin_watson_daily(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_durbin_watson"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    dmin, dmax = ev["d"].min(), ev["d"].max()
    n = dmax - dmin + 1
    for et, g in ev.groupby("event_type"):
        y = np.zeros(n, np.float64)
        u, c = np.unique(g["d"].to_numpy(), return_counts=True)
        y[u - dmin] = c
        e = y - y.mean()
        dw = float((np.diff(e) ** 2).sum() / (e**2).sum())
        assert out.loc[et, "n_days"] == n
        assert abs(out.loc[et, "dw"] - dw) < 1e-6
        assert 0.0 <= out.loc[et, "dw"] <= 4.0


def test_jarque_bera_per_source(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_jarque_bera"](SF).to_pandas().set_index("source")
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for src, g in docs.groupby("source"):
        x = g["n_chars"].to_numpy(np.float64)
        n = len(x)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        skew = m3 / m2**1.5
        exk = m4 / m2**2 - 3.0
        jb = n / 6.0 * (skew**2 + exk**2 / 4.0)
        assert out.loc[src, "n"] == n
        assert abs(out.loc[src, "skew"] - skew) < 1e-5
        assert abs(out.loc[src, "ex_kurt"] - exk) < 1e-5
        assert abs(out.loc[src, "jb"] - jb) < max(1e-4, abs(jb) * 1e-6)


def test_cohens_d_en_vs_rest(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cohens_d"](SF).to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = docs.loc[docs["lang"] == "en", "n_chars"].to_numpy(np.float64)
    b = docs.loc[docs["lang"] != "en", "n_chars"].to_numpy(np.float64)
    sp = np.sqrt(
        ((len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1))
        / (len(a) + len(b) - 2)
    )
    d = (a.mean() - b.mean()) / sp
    assert out["n1"].iloc[0] == len(a) and out["n2"].iloc[0] == len(b)
    assert abs(out["cohens_d"].iloc[0] - d) < 1e-6


def test_mrr_first_assistant(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mrr"](SF).to_pandas()
    tr = _transcripts_pdf()
    rrs = []
    for _, g in tr.groupby("conv_id", sort=False):
        pos = np.flatnonzero((g["role"] == "assistant").to_numpy())
        rrs.append(1.0 / (pos[0] + 1) if len(pos) else 0.0)
    assert out["n_convs"].iloc[0] == len(rrs)
    assert out["n_hit"].iloc[0] == sum(1 for r in rrs if r > 0)
    assert abs(out["mrr"].iloc[0] - np.mean(rrs)) < 1e-6


def test_grubbs_per_source(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_grubbs"](SF).to_pandas().set_index("source")
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for src, g in docs.groupby("source"):
        x = g["n_chars"].to_numpy(np.float64)
        gstat = np.abs(x - x.mean()).max() / x.std(ddof=1)
        assert out.loc[src, "n"] == len(x)
        assert out.loc[src, "vmin"] == x.min() and out.loc[src, "vmax"] == x.max()
        assert abs(out.loc[src, "g_stat"] - gstat) < 1e-6


def test_ece_calibration_bins(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ece"](SF).to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    m = docs["n_chars"].max()
    p = docs["n_chars"].to_numpy(np.float64) / m
    y = (docs["lang"] == "en").to_numpy(np.float64)
    binid = np.minimum((10 * docs["n_chars"].to_numpy(np.int64)) // m, 9)
    ece = 0.0
    for b in np.unique(binid):
        sel = binid == b
        row = out[out["bin"] == b].iloc[0]
        assert row["n"] == sel.sum()
        assert abs(row["acc"] - y[sel].mean()) < 1e-6
        assert abs(row["conf"] - p[sel].mean()) < 1e-6
        ece += sel.sum() / len(p) * abs(y[sel].mean() - p[sel].mean())
    assert abs(out["ece"].iloc[0] - ece) < 1e-6
    assert (out["ece"] == out["ece"].iloc[0]).all()


def test_goertzel_weekly_amplitude(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_goertzel"](SF).to_pandas()
    ev = _events_pdf()
    d = (ev["ts"].astype("datetime64[ns]").astype("int64")
         // (86_400 * 10**9)).to_numpy()
    dmin, dmax = d.min(), d.max()
    n = dmax - dmin + 1
    y = np.zeros(n, np.float64)
    u, c = np.unique(d, return_counts=True)
    y[u - dmin] = c
    t = np.arange(n)
    cx = (y * np.cos(2 * np.pi * t / 7)).sum()
    sx = (y * np.sin(2 * np.pi * t / 7)).sum()
    amp = np.sqrt(cx**2 + sx**2) / n
    assert out["n_days"].iloc[0] == n
    assert abs(out["weekly_amp"].iloc[0] - amp) < max(1e-3, amp * 1e-3)


def test_hamming_prefix_pairs(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hamming_prefix"](SF).to_pandas().set_index("conv_id")
    tr = _transcripts_pdf()
    for conv, g in tr.groupby("conv_id", sort=False):
        texts = g["text"].fillna("").tolist()
        hams = []
        for a, b in zip(texts, texts[1:]):
            L = min(len(a), len(b))
            if L == 0:
                continue
            hams.append(sum(1 for i in range(L) if a[i] != b[i]))
        if not hams:
            assert conv not in out.index
            continue
        assert out.loc[conv, "n_pairs"] == len(hams)
        assert out.loc[conv, "sum_ham"] == sum(hams)
        assert abs(out.loc[conv, "mean_ham"] - np.mean(hams)) < 1e-6


def test_tool_assortativity(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tool_assortativity"](SF).to_pandas()
    tr = _transcripts_pdf()
    ecnt: dict = {}
    for _, g in tr.groupby("conv_id", sort=False):
        tools = g.loc[g["tool"].notna(), "tool"].tolist()
        for a, b in zip(tools, tools[1:]):
            if a != b:
                ecnt[(a, b)] = ecnt.get((a, b), 0) + 1
    od, idg = {}, {}
    for (a, b), w in ecnt.items():
        od[a] = od.get(a, 0) + w
        idg[b] = idg.get(b, 0) + w
    # expand to per-instance samples, then plain Pearson
    x = np.concatenate(
        [np.full(w, od[a], np.float64) for (a, b), w in ecnt.items()]
    )
    y = np.concatenate(
        [np.full(w, idg[b], np.float64) for (a, b), w in ecnt.items()]
    )
    assert out["n_transitions"].iloc[0] == len(x)
    assert out["n_edges"].iloc[0] == len(ecnt)
    r = np.corrcoef(x, y)[0, 1]
    assert abs(out["assortativity"].iloc[0] - r) < 1e-6


def test_rfm_segments(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_rfm"](SF).to_pandas()
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    day = orders["o_orderdate"].astype("datetime64[ns]").astype(
        np.int64
    ) // 86_400_000_000_000
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    df = pd.DataFrame(
        {"c": orders["o_custkey"], "day": day, "cents": cents}
    )
    md = day.max()
    cust = df.groupby("c").agg(
        last=("day", "max"), f=("day", "size"), m=("cents", "sum")
    )
    cust["r"] = md - cust["last"]

    def scores(v):
        x = np.sort(v.to_numpy(np.int64))
        n = len(x)
        bs = [x[int(np.ceil(k * n / 5)) - 1] for k in (1, 2, 3, 4)]
        s = np.ones(n, np.int64)
        raw = v.to_numpy(np.int64)
        s = 1 + sum((raw > b).astype(np.int64) for b in bs)
        return s

    cust["rs"] = scores(cust["r"])
    cust["fs"] = scores(cust["f"])
    cust["ms"] = scores(cust["m"])
    exp = cust.groupby(["rs", "fs", "ms"]).agg(
        n=("m", "size"), sm=("m", "sum")
    )
    assert len(out) == len(exp)
    assert out["n_customers"].sum() == len(cust)
    for _, row in out.iterrows():
        e = exp.loc[(row["r_score"], row["f_score"], row["m_score"])]
        assert row["n_customers"] == e["n"] and row["sum_m_cents"] == e["sm"]


def test_partial_corr_per_conv(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_partial_corr"](SF).to_pandas().set_index("conv_id")
    tr = _transcripts_pdf()
    checked = 0
    for conv, g in tr.groupby("conv_id", sort=False):
        if len(g) < 3:
            assert conv not in out.index
            continue
        x = g["text"].fillna("").str.len().to_numpy(np.float64)
        ts = g["ts"].astype("datetime64[ns]").astype(np.int64)
        y = ((ts - ts.iloc[0]) // 10**9).to_numpy(np.float64)
        z = np.arange(len(g), dtype=np.float64)
        if x.std() == 0 or y.std() == 0:
            continue
        rxy = np.corrcoef(x, y)[0, 1]
        rxz = np.corrcoef(x, z)[0, 1]
        rzy = np.corrcoef(z, y)[0, 1]
        if abs(rxz) >= 1 - 1e-12 or abs(rzy) >= 1 - 1e-12:
            continue
        part = (rxy - rxz * rzy) / np.sqrt((1 - rxz**2) * (1 - rzy**2))
        assert conv in out.index
        assert abs(out.loc[conv, "r_xy"] - rxy) < 1e-5
        assert abs(out.loc[conv, "partial_r"] - part) < 1e-5
        checked += 1
    assert checked > 0


def test_cochran_q_tools(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cochran_q"](SF).to_pandas()
    tr = _transcripts_pdf()
    rows = []
    for _, g in tr.groupby("conv_id", sort=False):
        tools = set(g["tool"].dropna())
        rows.append([int(f"tool-{j}" in tools) for j in range(4)])
    x = np.array(rows, np.int64)
    cj = x.sum(axis=0)
    ri = x.sum(axis=1)
    k = 4
    denom = k * ri.sum() - (ri**2).sum()
    assert out["n_convs"].iloc[0] == len(rows)
    for j in range(4):
        assert out[f"c_tool{j}"].iloc[0] == cj[j]
    if denom == 0:
        assert np.isnan(out["q_stat"].iloc[0])
    else:
        q = (k - 1) * (k * (cj**2).sum() - ri.sum() ** 2) / denom
        assert abs(out["q_stat"].iloc[0] - q) < 1e-6


def test_gains_table_deciles(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gains_table"](SF).to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    v = docs["n_chars"].to_numpy(np.int64)
    y = (docs["lang"] == "en").to_numpy(np.int64)
    xs = np.sort(v)
    n = len(xs)
    bounds = [xs[int(np.ceil(k * n / 10)) - 1] for k in range(1, 10)]
    dec = 1 + sum((v > b).astype(np.int64) for b in bounds)
    assert out["n"].sum() == n
    assert out["n_pos"].sum() == y.sum()
    exp = pd.DataFrame({"d": dec, "y": y}).groupby("d").agg(
        n=("y", "size"), p=("y", "sum")
    )
    cum = 0
    for _, r in out.sort_values("decile", ascending=False).iterrows():
        e = exp.loc[r["decile"]]
        assert r["n"] == e["n"] and r["n_pos"] == e["p"]
        cum += e["p"]
        assert abs(r["cum_capture"] - cum / y.sum()) < 1e-6


def test_role_signature_strings(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_role_signature"](SF).to_pandas().set_index("conv_id")
    tr = _transcripts_pdf()
    for conv, g in tr.groupby("conv_id", sort=False):
        sig = "".join(r[0] for r in g["role"])
        assert out.loc[conv, "sig"] == sig
        assert out.loc[conv, "n_turns"] == len(g)
        assert out.loc[conv, "n_roles"] == g["role"].nunique()


def test_nth_value_gathers(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_nth_value"](SF).to_pandas().set_index("conv_id")
    tr = _transcripts_pdf()
    for conv, g in tr.groupby("conv_id", sort=False):
        m1 = g["text"].fillna("").str.len().tolist()
        r = out.loc[conv]
        assert r["m1_first"] == m1[0] and r["m1_last"] == m1[-1]
        if len(m1) >= 2:
            assert r["m1_second"] == m1[1] and r["m1_penult"] == m1[-2]
        else:
            assert pd.isna(r["m1_second"]) and pd.isna(r["m1_penult"])


def test_theil_u2_naive_forecast(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_theil_u"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    dmin, dmax = ev["d"].min(), ev["d"].max()
    n = dmax - dmin + 1
    for et, g in ev.groupby("event_type"):
        y = np.zeros(n, np.float64)
        u, c = np.unique(g["d"].to_numpy(), return_counts=True)
        y[u - dmin] = c
        u2 = np.sqrt((np.diff(y) ** 2).sum() / (y[:-1] ** 2).sum())
        assert abs(out.loc[et, "u2"] - u2) < 1e-6


def test_seq_match_patterns(ray_session):
    import re

    from ptrail_ray.entry_queries import QUERIES, SEQ_PATTERNS

    out = QUERIES["q_seq_match"](SF).to_pandas().set_index("pattern")
    tr = _transcripts_pdf()
    sigs = [
        "".join(r[0] for r in g["role"])
        for _, g in tr.groupby("conv_id", sort=False)
    ]
    for name, pat in SEQ_PATTERNS:
        exp = sum(1 for s in sigs if re.search(pat, s))
        assert out.loc[name, "n"] == exp
        assert out.loc[name, "n_convs"] == len(sigs)


def test_time_to_k_tools(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_time_to_k_tools"](SF).to_pandas().set_index("conv_id")
    tr = _transcripts_pdf()
    for conv, g in tr.groupby("conv_id", sort=False):
        t0 = g["ts"].iloc[0]
        seen, kth = [], None
        for _, row in g.iterrows():
            if pd.notna(row["tool"]) and row["tool"] not in seen:
                seen.append(row["tool"])
                if len(seen) == 3:
                    kth = row
                    break
        if kth is None:
            assert conv not in out.index
        else:
            assert out.loc[conv, "k_tool"] == kth["tool"]
            lat = int((kth["ts"] - t0).value // 10**9)
            assert out.loc[conv, "latency_s"] == lat


def test_tool_gap_stats(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tool_gap_stats"](SF).to_pandas().set_index("tool")
    tr = _transcripts_pdf()
    gaps: dict = {}
    for _, g in tr.groupby("conv_id", sort=False):
        tg = g[g["tool"].notna()]
        for (_, a), (_, b) in zip(tg.iterrows(), tg.iloc[1:].iterrows()):
            gaps.setdefault(b["tool"], []).append(
                int((b["ts"] - a["ts"]).value // 10**9)
            )
    for tool, gs in gaps.items():
        gs = sorted(gs)
        r = out.loc[tool]
        assert r["n"] == len(gs)
        assert r["gap_min"] == gs[0] and r["gap_max"] == gs[-1]
        assert r["gap_med"] == gs[int(np.ceil(len(gs) / 2)) - 1]
    assert set(out.index) == set(gaps)


def test_poisson_bootstrap_deterministic(ray_session):
    from ptrail_ray.entry_queries import (
        _POIS_CDF,
        BOOT_B,
        QUERIES,
    )
    from ptrail_ray.functions.dedup import _md5_u60
    import pyarrow.parquet as pq

    out = QUERIES["q_poisson_bootstrap"](SF).to_pandas()
    out2 = QUERIES["q_poisson_bootstrap"](SF).to_pandas()
    assert out.equals(out2)  # byte-deterministic across runs
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    x = docs["n_chars"].to_numpy(np.float64)
    means = []
    for b in range(1, BOOT_B + 1):
        u = np.array(
            [_md5_u60(f"{i}|{b}") / float(1 << 60) for i in docs["doc_id"]]
        )
        w = np.searchsorted(np.array(_POIS_CDF), u, side="right")
        means.append((w * x).sum() / w.sum())
    means = np.array(means)
    assert abs(out["boot_mean"].iloc[0] - means.mean()) < 1e-5
    assert abs(out["boot_se"].iloc[0] - means.std(ddof=1)) < 1e-5
    # sanity: SE of the mean should be near s/sqrt(n)
    approx = x.std(ddof=1) / np.sqrt(len(x))
    assert 0.2 * approx < out["boot_se"].iloc[0] < 5 * approx


def test_late_events_watermark(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_late_events"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf().sort_values(["user_id", "event_id"])
    late_by_type: dict = {}
    n_by_type: dict = {}
    for _, g in ev.groupby("user_id"):
        mx = None
        for _, r in g.iterrows():
            n_by_type[r["event_type"]] = n_by_type.get(r["event_type"], 0) + 1
            if mx is not None and r["ts"] < mx:
                late_by_type[r["event_type"]] = (
                    late_by_type.get(r["event_type"], 0) + 1
                )
            mx = r["ts"] if mx is None else max(mx, r["ts"])
    for et in n_by_type:
        assert out.loc[et, "n"] == n_by_type[et]
        assert out.loc[et, "n_late"] == late_by_type.get(et, 0)


def test_dow_hour_heatmap(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_dow_hour_heatmap"](SF).to_pandas()
    ev = _events_pdf()
    dow = ev["ts"].dt.dayofweek + 1  # pandas Monday=0 → ISO Monday=1
    hour = ev["ts"].dt.hour
    exp = pd.DataFrame({"d": dow, "h": hour}).groupby(["d", "h"]).size()
    assert out["n"].sum() == len(ev)
    assert abs(out["share"].sum() - 1.0) < 1e-4
    for _, r in out.iterrows():
        assert exp.loc[(r["isodow"], r["hour"])] == r["n"]


def test_avg_precision_per_conv(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_avg_precision"](SF).to_pandas().set_index("conv_id")
    tr = _transcripts_pdf()
    for conv, g in tr.groupby("conv_id", sort=False):
        hits = (g["role"] == "assistant").to_numpy()
        if not hits.any():
            assert conv not in out.index
            continue
        cum = np.cumsum(hits)
        terms = cum[hits] / (np.flatnonzero(hits) + 1)
        ap = terms.mean()
        assert out.loc[conv, "n_hits"] == hits.sum()
        assert abs(out.loc[conv, "ap"] - ap) < 1e-6
        assert 0.0 < out.loc[conv, "ap"] <= 1.0


def test_mad_by_source_all_int(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mad_by_source"](SF).to_pandas().set_index("source")
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for src, g in docs.groupby("source"):
        x = np.sort(g["n_chars"].to_numpy(np.int64))
        med = x[int(np.ceil(len(x) / 2)) - 1]
        z = np.sort(np.abs(g["n_chars"].to_numpy(np.int64) - med))
        mad = z[int(np.ceil(len(z) / 2)) - 1]
        assert out.loc[src, "med"] == med and out.loc[src, "mad"] == mad


def test_locf_forward_fill(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_locf"](SF).to_pandas()
    tr = _transcripts_pdf()
    exp = tr.groupby("conv_id", sort=False)["tool"].ffill()
    merged = tr[["conv_id", "turn_idx"]].assign(exp=exp.to_numpy()).merge(
        out, on=["conv_id", "turn_idx"]
    )
    assert len(merged) == len(tr)
    a = merged["exp"].fillna("<null>")
    b = merged["tool_filled"].fillna("<null>")
    assert (a == b).all()


def test_audience_overlap_jaccard(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_audience_overlap"](SF).to_pandas()
    ev = _events_pdf()
    sets = {
        t: set(ev.loc[ev["event_type"] == t, "user_id"])
        for t in ev["event_type"].unique()
    }
    assert len(out) == 10
    for _, r in out.iterrows():
        a, b = sets[r["type_a"]], sets[r["type_b"]]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["n_both"] == len(a & b)
        assert abs(r["jaccard"] - len(a & b) / len(a | b)) < 1e-6


def test_acf_table_lags(ray_session):
    from ptrail_ray.entry_queries import ACF_MAX_LAG, QUERIES

    out = QUERIES["q_acf_table"](SF).to_pandas().set_index("lag")
    ev = _events_pdf()
    d = (ev["ts"].astype("datetime64[ns]").astype("int64")
         // (86_400 * 10**9)).to_numpy()
    dmin, dmax = d.min(), d.max()
    y = np.zeros(dmax - dmin + 1, np.float64)
    u, c = np.unique(d, return_counts=True)
    y[u - dmin] = c
    e = y - y.mean()
    den = (e**2).sum()
    for k in range(1, ACF_MAX_LAG + 1):
        r = (e[:-k] * e[k:]).sum() / den
        assert abs(out.loc[k, "r"] - r) < 1e-6


def test_monthly_pivot_wide(ray_session):
    from ptrail_ray.entry_queries import EVENT_TYPES, QUERIES

    out = QUERIES["q_monthly_pivot"](SF).to_pandas()
    ev = _events_pdf()
    exp = ev.groupby(
        [ev["ts"].dt.year, ev["ts"].dt.month, "event_type"]
    ).size()
    assert out["n_total"].sum() == len(ev)
    for _, r in out.iterrows():
        tot = 0
        for t in EVENT_TYPES:
            n = exp.get((r["year"], r["month"], t), 0)
            assert r[f"n_{t}"] == n
            tot += n
        assert r["n_total"] == tot


def test_seasonal_strength_eta_sq(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_seasonal_strength"](SF).to_pandas()
    ev = _events_pdf()
    d = (ev["ts"].astype("datetime64[ns]").astype("int64")
         // (86_400 * 10**9)).to_numpy()
    dmin, dmax = d.min(), d.max()
    n = dmax - dmin + 1
    y = np.zeros(n, np.float64)
    u, c = np.unique(d, return_counts=True)
    y[u - dmin] = c
    s7 = np.convolve(y, np.ones(7), mode="valid")
    d7 = 7 * y[3 : n - 3] - s7
    dow = ((np.arange(3, n - 3) + dmin) % 7 + 3) % 7 + 1
    df = pd.DataFrame({"dow": dow, "d7": d7})
    sst = ((d7 - d7.mean()) ** 2).sum()
    ssw = sum(
        ((g - g.mean()) ** 2).sum() for _, g in df.groupby("dow")["d7"]
    )
    eta = (sst - ssw) / sst
    assert out["n_days"].iloc[0] == len(d7)
    assert abs(out["strength"].iloc[0] - eta) < 1e-5
    assert 0.0 <= out["strength"].iloc[0] <= 1.0


def test_ks_matrix_pairs(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ks_matrix"](SF).to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    groups = {s: np.sort(g["n_chars"].to_numpy()) for s, g in docs.groupby("source")}
    assert len(out) == len(groups) * (len(groups) - 1) // 2
    allv = np.sort(docs["n_chars"].unique())
    for _, r in out.iterrows():
        a, b = groups[r["source_a"]], groups[r["source_b"]]
        fa = np.searchsorted(a, allv, side="right") / len(a)
        fb = np.searchsorted(b, allv, side="right") / len(b)
        d = np.abs(fa - fb).max()
        assert abs(r["d"] - d) < 1e-6


def test_lang_purity_majority(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_lang_purity"](SF).to_pandas().set_index("source")
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for src, g in docs.groupby("source"):
        counts = g["lang"].value_counts()
        best = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        assert out.loc[src, "major_lang"] == best[0]
        assert out.loc[src, "n_major"] == best[1]
        assert out.loc[src, "n_total"] == len(g)
        assert abs(out.loc[src, "purity"] - best[1] / len(g)) < 1e-6


def test_char_classes_profile(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_char_classes"](SF).to_pandas().set_index("lang")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for lang, g in docs.groupby("lang"):
        text = "".join(g["text"].fillna(""))
        alpha = sum(c.isascii() and c.isalpha() for c in text)
        digit = sum(c.isdigit() for c in text)
        space = sum(c in " \t\n\r\x0b\x0c" for c in text)
        punct = len(text) - alpha - digit - space
        assert out.loc[lang, "alpha"] == alpha
        assert out.loc[lang, "digit"] == digit
        assert out.loc[lang, "punct"] == punct
        assert out.loc[lang, "space"] == space
        assert abs(out.loc[lang, "alpha_share"] - alpha / len(text)) < 1e-6


def test_gen_means_pythagorean(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_gen_means"](SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for src, g in docs.groupby("source"):
        x = g["n_chars"].to_numpy(np.float64)
        am, gm = x.mean(), np.exp(np.log(x).mean())
        hm = len(x) / (1.0 / x).sum()
        assert abs(out.loc[src, "am"] - am) < 1e-5
        assert abs(out.loc[src, "gm"] - gm) < 1e-4
        assert abs(out.loc[src, "hm"] - hm) < 1e-4
        # AM >= GM >= HM (strict unless degenerate)
        r = out.loc[src]
        assert r["am"] >= r["gm"] - 1e-9 >= r["hm"] - 2e-9


def test_active_days_histogram(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_active_days_hist"](SF).to_pandas()
    ev = _events_pdf()
    per = ev.groupby("user_id").apply(
        lambda g: g["ts"].dt.date.nunique(), include_groups=False
    )
    exp = per.value_counts().sort_index()
    assert out["n_users"].sum() == per.size
    for _, r in out.iterrows():
        assert exp.loc[r["days"]] == r["n_users"]


def test_top_signatures(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_top_signatures"](SF).to_pandas()
    tr = _transcripts_pdf()
    sigs = pd.Series(
        [
            "".join(r[0] for r in g["role"])
            for _, g in tr.groupby("conv_id", sort=False)
        ]
    ).value_counts()
    exp = sorted(sigs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(out["sig"]) == [s for s, _ in exp]
    assert list(out["n"]) == [n for _, n in exp]


def test_user_count_tail(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_user_count_tail"](SF).to_pandas()
    ev = _events_pdf()
    cnt = np.sort(ev.groupby("user_id").size().to_numpy(np.int64))
    n = len(cnt)

    def pick(q):
        return cnt[int(np.ceil(q * n)) - 1]

    assert out["n_users"].iloc[0] == n
    assert out["p50"].iloc[0] == pick(0.5)
    assert out["p90"].iloc[0] == pick(0.9)
    assert out["p99"].iloc[0] == pick(0.99)
    assert out["vmax"].iloc[0] == cnt[-1]


def test_new_vs_returning_dau(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_new_vs_returning"](SF).to_pandas().set_index("day")
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    ud = ev[["user_id", "d"]].drop_duplicates()
    first = ud.groupby("user_id")["d"].min()
    for d, g in ud.groupby("d"):
        new = int((first.loc[g["user_id"]] == d).sum())
        assert out.loc[d, "dau"] == len(g)
        assert out.loc[d, "new_users"] == new
    # every user is new exactly once
    assert out["new_users"].sum() == ev["user_id"].nunique()


def test_asof_nearest_semantics(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    from ptrail_ray.sources.transcripts import side_scd_from_events

    out = (
        QUERIES["q_asof_nearest"](SF)
        .to_pandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
    )
    tr = _transcripts_pdf()
    side = side_scd_from_events(SF)
    if not isinstance(side, pd.DataFrame):
        side = side.to_pandas()
    byk = {k: g.sort_values("effective_ts") for k, g in side.groupby("key")}
    checked = 0
    for _, r in tr.iterrows():
        row = out.loc[(r["conv_id"], r["turn_idx"])]
        g = byk.get(r["conv_id"])
        if g is None or len(g) == 0:
            assert pd.isna(row["attr_num"]) or row["attr_num"] is None
            continue
        d = (g["effective_ts"] - r["ts"]).abs()
        best = g.loc[
            d.eq(d.min()).to_numpy()
        ].sort_values("effective_ts").iloc[0]
        assert row["attr_cat"] == best["attr_cat"]
        assert abs(row["attr_num"] - best["attr_num"]) < 1e-9
        assert row["asof_dist_s"] == int(
            abs((best["effective_ts"] - r["ts"]).value) // 10**9
        )
        checked += 1
    assert checked > 0


def test_order_integrity_scorecard(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_order_integrity"](SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    li["cents"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * (1 + li["l_tax"]) * 100
        + 0.5
    ).astype(np.int64)
    ls = li.groupby("l_orderkey")["cents"].sum()
    oc = np.round(orders["o_totalprice"] * 100).astype(np.int64)
    has = orders["o_orderkey"].isin(ls.index)
    assert out["n_orders"].iloc[0] == len(orders)
    assert out["n_missing"].iloc[0] == int((~has).sum())
    matched = orders.loc[has]
    diffs = np.abs(
        np.round(matched["o_totalprice"] * 100).astype(np.int64).to_numpy()
        - ls.loc[matched["o_orderkey"]].to_numpy()
    )
    assert out["n_exact"].iloc[0] == int((diffs == 0).sum())
    assert out["max_diff_cents"].iloc[0] == int(diffs.max()) if len(diffs) else 0


def test_ship_delay_quantiles(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_ship_delay"](SF).to_pandas().set_index("prio")
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["delay"] = (
        j["l_shipdate"].dt.normalize() - j["o_orderdate"].dt.normalize()
    ).dt.days
    for prio, g in j.groupby("o_orderpriority"):
        d = np.sort(g["delay"].to_numpy(np.int64))
        r = out.loc[prio]
        assert r["n"] == len(d)
        assert r["dmin"] == d[0] and r["dmax"] == d[-1]
        assert r["dmed"] == d[int(np.ceil(len(d) / 2)) - 1]
        assert r["dp90"] == d[int(np.ceil(0.9 * len(d))) - 1]


def test_dedup_prefix_survivors(ray_session):
    from ptrail_ray.entry_queries import PREFIX_DEDUP_K, QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_dedup_prefix"](SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    docs["pfx"] = docs["text"].fillna("").str[:PREFIX_DEDUP_K]
    kept = docs.sort_values("doc_id").drop_duplicates("pfx", keep="first")
    exp = kept.groupby("source").size()
    assert out["n_kept"].sum() == len(kept)
    for src, n in exp.items():
        assert out.loc[src, "n_kept"] == n


def test_log2_hist_bins(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_log2_hist"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    v = docs["n_chars"].to_numpy(np.int64)
    assert out["n"].sum() == len(v)
    for _, r in out.iterrows():
        assert r["lo"] == 2 ** r["bin"] and r["hi"] == 2 ** (r["bin"] + 1) - 1
        assert r["n"] == int(((v >= r["lo"]) & (v <= r["hi"])).sum())


def test_sax_quartile_symbols(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_sax_quartile"](SF).to_pandas()
    ev = _events_pdf()
    d = (ev["ts"].astype("datetime64[ns]").astype("int64")
         // (86_400 * 10**9)).to_numpy()
    dmin, dmax = d.min(), d.max()
    n = dmax - dmin + 1
    y = np.zeros(n, np.int64)
    u, c = np.unique(d, return_counts=True)
    y[u - dmin] = c
    xs = np.sort(y)
    bounds = [xs[int(np.ceil(k * n / 4)) - 1] for k in (1, 2, 3)]
    letters = "".join(
        "abcd"[int(sum(v > b for b in bounds))] for v in y
    )
    assert out["sax"].iloc[0] == letters
    assert out["n_days"].iloc[0] == n
    assert (
        out[["n_a", "n_b", "n_c", "n_d"]].iloc[0].sum() == n
    )


def test_ols_daily_regression(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ols_daily"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    dmin, dmax = ev["d"].min(), ev["d"].max()
    n = dmax - dmin + 1
    x = np.arange(n, dtype=np.float64)
    for et, g in ev.groupby("event_type"):
        y = np.zeros(n, np.float64)
        u, c = np.unique(g["d"].to_numpy(), return_counts=True)
        y[u - dmin] = c
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        assert abs(out.loc[et, "slope"] - slope) < 1e-6
        assert abs(out.loc[et, "intercept"] - intercept) < 1e-5
        assert abs(out.loc[et, "r2"] - r2) < 1e-6


def test_winsorized_mean(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_winsorized_mean"](SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for src, g in docs.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(v)
        blo = v[int(np.ceil(0.05 * n)) - 1]
        bhi = v[int(np.ceil(0.95 * n)) - 1]
        wm = np.clip(g["n_chars"].to_numpy(np.int64), blo, bhi).mean()
        assert out.loc[src, "b_lo"] == blo and out.loc[src, "b_hi"] == bhi
        assert abs(out.loc[src, "wins_mean"] - wm) < 1e-6
        # winsorized mean sits inside the clamp bounds
        assert blo <= out.loc[src, "wins_mean"] <= bhi


def test_dormancy_gaps(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_dormancy"](SF).to_pandas()
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    gaps = []
    for _, g in ev[["user_id", "d"]].drop_duplicates().groupby("user_id"):
        d = np.sort(g["d"].to_numpy(np.int64))
        gaps.append(int(np.diff(d).max()) if len(d) > 1 else 0)
    gaps = np.sort(np.array(gaps, np.int64))
    n = len(gaps)
    assert out["n_users"].iloc[0] == n
    assert out["gap_p50"].iloc[0] == gaps[int(np.ceil(0.5 * n)) - 1]
    assert out["gap_p90"].iloc[0] == gaps[int(np.ceil(0.9 * n)) - 1]
    assert out["gap_max"].iloc[0] == gaps[-1]
    assert abs(out["share_gap7"].iloc[0] - (gaps >= 7).mean()) < 1e-6


def test_role_lift_independence(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_role_lift"](SF).to_pandas()
    tr = _transcripts_pdf()
    pairs: dict = {}
    for _, g in tr.groupby("conv_id", sort=False):
        roles = g["role"].tolist()
        for a, b in zip(roles, roles[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    t = sum(pairs.values())
    ra: dict = {}
    cb: dict = {}
    for (a, b), n in pairs.items():
        ra[a] = ra.get(a, 0) + n
        cb[b] = cb.get(b, 0) + n
    assert out["n"].sum() == t
    for _, r in out.iterrows():
        key = (r["a"], r["b"])
        assert r["n"] == pairs[key]
        exp = r["n"] * t / (ra[r["a"]] * cb[r["b"]])
        assert abs(r["lift"] - exp) < 1e-6


def test_robust_outliers_zero_float(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_robust_outliers"](SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for src, g in docs.groupby("source"):
        x = g["n_chars"].to_numpy(np.int64)
        xs = np.sort(x)
        med = xs[int(np.ceil(len(xs) / 2)) - 1]
        z = np.sort(np.abs(x - med))
        mad = z[int(np.ceil(len(z) / 2)) - 1]
        n_out = int((2 * np.abs(x - med) > 7 * mad).sum())
        assert out.loc[src, "mad"] == mad
        assert out.loc[src, "n_out"] == n_out


def test_tool_effect_welch(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tool_effect"](SF).to_pandas()
    tr = _transcripts_pdf()
    g1, g2 = [], []
    for _, g in tr.groupby("conv_id", sort=False):
        ts = g["ts"].astype("datetime64[ns]").astype(np.int64).to_numpy()
        gaps = (ts[1:] - ts[:-1]) // 10**9
        tool = g["tool"].notna().to_numpy()[:-1]
        g1.extend(gaps[tool])
        g2.extend(gaps[~tool])
    g1, g2 = np.array(g1, np.float64), np.array(g2, np.float64)
    z = (g1.mean() - g2.mean()) / np.sqrt(
        g1.var(ddof=1) / len(g1) + g2.var(ddof=1) / len(g2)
    )
    assert out["n_after_tool"].iloc[0] == len(g1)
    assert out["n_after_other"].iloc[0] == len(g2)
    assert abs(out["mean_gap_tool"].iloc[0] - g1.mean()) < 1e-5
    assert abs(out["welch_z"].iloc[0] - z) < 1e-5


def test_user_temporal_entropy(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = (
        QUERIES["q_user_temporal_entropy"](SF)
        .to_pandas()
        .set_index("user_id")
    )
    ev = _events_pdf()
    ev["h"] = ev["ts"].dt.hour
    for u, g in ev.groupby("user_id"):
        p = g["h"].value_counts(normalize=True).to_numpy()
        ent = float(-(p * np.log(p)).sum())
        assert out.loc[u, "n"] == len(g)
        assert abs(out.loc[u, "entropy"] - ent) < 1e-6
        assert -1e-9 <= out.loc[u, "entropy"] <= np.log(24) + 1e-9


def test_stopword_kl(ray_session):
    import re

    from ptrail_ray.entry_queries import QUERIES, STOPWORDS
    import pyarrow.parquet as pq

    out = QUERIES["q_stopword_kl"](SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    cnt: dict = {}
    for src, g in docs.groupby("source"):
        text = " | ".join(g["text"].fillna(""))
        cnt[src] = np.array(
            [len(re.findall(rf"\b{w}\b", text)) for w in STOPWORDS],
            np.float64,
        )
    corpus = sum(cnt.values())
    pcorp = corpus / corpus.sum()
    for src, cs in cnt.items():
        ps = cs / cs.sum()
        mask = ps > 0
        kl = float((ps[mask] * np.log(ps[mask] / pcorp[mask])).sum())
        assert out.loc[src, "n_hits"] == int(cs.sum())
        assert abs(out.loc[src, "kl"] - kl) < 1e-6
        assert out.loc[src, "kl"] >= -1e-9  # KL is non-negative


def test_minmax_norm_rows(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_minmax_norm"](SF).to_pandas()
    tr = _transcripts_pdf()
    merged = tr.merge(out, on=["conv_id", "turn_idx"])
    assert len(merged) == len(tr)
    for _, g in merged.groupby("conv_id", sort=False):
        m1 = g["text"].fillna("").str.len().to_numpy(np.float64)
        if m1.max() == m1.min():
            assert g["mm"].isna().all()
        else:
            exp = (m1 - m1.min()) / (m1.max() - m1.min())
            assert np.allclose(g["mm"].to_numpy(), exp, atol=1e-6)


def test_skyline_pareto(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_skyline"](SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cents = np.round(orders["o_totalprice"] * 100).astype(np.int64).to_numpy()
    day = (
        orders["o_orderdate"].astype("datetime64[ns]").astype(np.int64)
        // (86_400 * 10**9)
    ).to_numpy()
    keys = orders["o_orderkey"].to_numpy()
    exp = []
    for i in range(len(keys)):
        dom = (
            (cents >= cents[i])
            & (day <= day[i])
            & ((cents > cents[i]) | (day < day[i]))
        )
        if not dom.any():
            exp.append(keys[i])
    assert sorted(out["o_orderkey"]) == sorted(exp)
    # on a (max cents, min day) frontier, richer points must be
    # strictly later — otherwise they would dominate the poorer ones
    f = out.sort_values("cents")
    dd = f.drop_duplicates("cents", keep="first")["day"].to_numpy()
    assert (np.diff(dd) > 0).all()


def test_cum_revenue_running(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_cum_revenue"](SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    orders["cents"] = np.round(orders["o_totalprice"] * 100).astype(np.int64)
    orders["ym"] = (
        orders["o_orderdate"].dt.year * 100 + orders["o_orderdate"].dt.month
    )
    for status, g in out.groupby("status"):
        g = g.sort_values(["year", "month"])
        o = orders[orders["o_orderstatus"] == status]
        run = 0
        for _, r in g.iterrows():
            ym = r["year"] * 100 + r["month"]
            month_cents = int(o.loc[o["ym"] == ym, "cents"].sum())
            assert r["rev_cents"] == month_cents
            run += month_cents
            assert abs(r["cum_rev"] - run / 100.0) < 1e-6


def test_bounce_rate(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bounce_rate"](SF).to_pandas().set_index("day")
    tr = _transcripts_pdf()
    per = tr.groupby("conv_id").agg(
        start=("ts", "min"), n=("ts", "size")
    )
    per["day"] = per["start"].astype("datetime64[ns]").astype(np.int64) // (
        86_400 * 10**9
    )
    for d, g in per.groupby("day"):
        assert out.loc[d, "n_convs"] == len(g)
        assert out.loc[d, "n_single"] == int((g["n"] == 1).sum())


def test_psi_halves(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_psi"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    v = docs["n_chars"].to_numpy(np.int64)
    par = (docs["doc_id"] % 2).to_numpy(np.int64)
    xs = np.sort(v)
    n = len(xs)
    bounds = [xs[int(np.ceil(k * n / 10)) - 1] for k in range(1, 10)]
    binid = 1 + sum((v > b).astype(np.int64) for b in bounds)
    psi = 0.0
    na, nb = int((par == 0).sum()), int((par == 1).sum())
    for b in np.unique(binid):
        ca = int(((binid == b) & (par == 0)).sum())
        cb = int(((binid == b) & (par == 1)).sum())
        if ca and cb:
            pa_, pb_ = ca / na, cb / nb
            psi += (pa_ - pb_) * np.log(pa_ / pb_)
    assert out["n_even"].iloc[0] == na and out["n_odd"].iloc[0] == nb
    assert abs(out["psi"].iloc[0] - psi) < 1e-6
    assert out["psi"].iloc[0] >= -1e-9  # PSI is non-negative


def test_tool_centrality_harmonic(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tool_centrality"](SF).to_pandas().set_index("tool")
    tr = _transcripts_pdf()
    edges = set()
    for _, g in tr.groupby("conv_id", sort=False):
        tools = g.loc[g["tool"].notna(), "tool"].tolist()
        for a, b in zip(tools, tools[1:]):
            if a != b:
                edges.add((a, b))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    for u in nodes:
        dist = {u: 0}
        frontier = [u]
        while frontier:
            nxt = []
            for a in frontier:
                for x, y in edges:
                    if x == a and y not in dist:
                        dist[y] = dist[a] + 1
                        nxt.append(y)
            frontier = nxt
        cent = sum(1.0 / d for v_, d in dist.items() if v_ != u)
        assert out.loc[u, "n_reach"] == len(dist) - 1
        assert abs(out.loc[u, "centrality"] - cent) < 1e-6


def test_dod_overlap_jaccard(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_dod_overlap"](SF).to_pandas().set_index("day")
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    bysets = {
        d: set(g["user_id"]) for d, g in ev[["user_id", "d"]].groupby("d")
    }
    days = sorted(bysets)
    for d in days:
        if d + 1 not in bysets:
            assert d not in out.index
            continue
        a, b = bysets[d], bysets[d + 1]
        assert out.loc[d, "dau"] == len(a)
        assert out.loc[d, "dau_next"] == len(b)
        assert out.loc[d, "inter"] == len(a & b)
        assert abs(out.loc[d, "jaccard"] - len(a & b) / len(a | b)) < 1e-6


def test_chisq_uniform(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_chisq_uniform"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    dmin, dmax = ev["d"].min(), ev["d"].max()
    n = dmax - dmin + 1
    for et, g in ev.groupby("event_type"):
        y = np.zeros(n, np.float64)
        u, c = np.unique(g["d"].to_numpy(), return_counts=True)
        y[u - dmin] = c
        e = y.sum() / n
        chi = float(((y - e) ** 2 / e).sum())
        assert out.loc[et, "n_days"] == n
        assert abs(out.loc[et, "chi2"] - chi) < 1e-5


def test_weekend_effect(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_weekend_effect"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    dmin, dmax = ev["d"].min(), ev["d"].max()
    days = np.arange(dmin, dmax + 1)
    we = (((days % 7) + 3) % 7 + 1) >= 6
    for et, g in ev.groupby("event_type"):
        y = np.zeros(len(days), np.float64)
        u, c = np.unique(g["d"].to_numpy(), return_counts=True)
        y[u - dmin] = c
        lift = (y[we].mean()) / (y[~we].mean())
        assert out.loc[et, "weekend_n"] == int(y[we].sum())
        assert abs(out.loc[et, "lift"] - lift) < 1e-6


def test_hour_profile_cosine(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hour_profile_cosine"](SF).to_pandas()
    ev = _events_pdf()
    ev["h"] = ev["ts"].dt.hour
    prof = {
        et: np.bincount(g["h"].to_numpy(), minlength=24).astype(np.float64)
        for et, g in ev.groupby("event_type")
    }
    assert len(out) == len(prof) * (len(prof) - 1) // 2
    for _, r in out.iterrows():
        a, b = prof[r["type_a"]], prof[r["type_b"]]
        cos = (a @ b) / np.sqrt((a @ a) * (b @ b))
        assert abs(r["cosine"] - cos) < 1e-6
        assert 0.0 <= r["cosine"] <= 1.0 + 1e-9


def test_holt_winters_additive(ray_session):
    from ptrail_ray.entry_queries import (
        HW_A,
        HW_B,
        HW_G,
        HW_M,
        QUERIES,
    )

    out = QUERIES["q_holt_winters"](SF).to_pandas()
    ev = _events_pdf()
    d = (ev["ts"].astype("datetime64[ns]").astype("int64")
         // (86_400 * 10**9)).to_numpy()
    dmin, dmax = d.min(), d.max()
    n = dmax - dmin + 1
    y = np.zeros(n, np.float64)
    u, c = np.unique(d, return_counts=True)
    y[u - dmin] = c
    mean0 = y[:HW_M].mean()
    lvl, b = mean0, 0.0
    s = list(y[:HW_M] - mean0)
    for t in range(HW_M, n):
        l_new = HW_A * (y[t] - s[0]) + (1 - HW_A) * (lvl + b)
        b = HW_B * (l_new - lvl) + (1 - HW_B) * b
        s = s[1:] + [HW_G * (y[t] - l_new) + (1 - HW_G) * s[0]]
        lvl = l_new
    assert out["n_days"].iloc[0] == n
    assert abs(out["level"].iloc[0] - lvl) < 1e-5
    assert abs(out["trend"].iloc[0] - b) < 1e-5
    assert abs(out["forecast"].iloc[0] - (lvl + b + s[0])) < 1e-5


def test_gap_autocorr_pooled(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gap_autocorr"](SF).to_pandas()
    tr = _transcripts_pdf()
    xs, ys = [], []
    for _, g in tr.groupby("conv_id", sort=False):
        ts = g["ts"].astype("datetime64[ns]").astype(np.int64).to_numpy()
        gaps = (ts[1:] - ts[:-1]) // 10**9
        xs.extend(gaps[:-1])
        ys.extend(gaps[1:])
    x, yv = np.array(xs, np.float64), np.array(ys, np.float64)
    r = np.corrcoef(x, yv)[0, 1]
    assert out["n_pairs"].iloc[0] == len(x)
    assert abs(out["r"].iloc[0] - r) < 1e-6


def test_duration_by_dow(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_duration_by_dow"](SF).to_pandas().set_index("dow")
    tr = _transcripts_pdf()
    per = tr.groupby("conv_id").agg(start=("ts", "min"), end=("ts", "max"))
    per["dow"] = per["start"].dt.dayofweek + 1
    per["dur"] = (
        per["end"].astype("datetime64[ns]").astype(np.int64)
        - per["start"].astype("datetime64[ns]").astype(np.int64)
    ) // 10**9
    for dow, g in per.groupby("dow"):
        d = np.sort(g["dur"].to_numpy(np.int64))
        assert out.loc[dow, "n_convs"] == len(d)
        assert out.loc[dow, "dur_med"] == d[int(np.ceil(len(d) / 2)) - 1]
        assert out.loc[dow, "dur_p90"] == d[int(np.ceil(0.9 * len(d))) - 1]


def test_purchase_penetration(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_purchase_penetration"](SF).to_pandas().set_index("k")
    ev = _events_pdf()
    per = (
        ev.assign(p=(ev["event_type"] == "purchase").astype(int))
        .groupby("user_id")["p"]
        .sum()
    )
    for k in range(1, 6):
        nk = int((per >= k).sum())
        assert out.loc[k, "n_users"] == nk
        assert abs(out.loc[k, "share"] - nk / len(per)) < 1e-6
    # penetration is non-increasing in k
    assert (np.diff(out.sort_index()["n_users"].to_numpy()) <= 0).all()


def test_role_latency_matrix(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_role_latency_matrix"](SF).to_pandas()
    tr = _transcripts_pdf()
    cells: dict = {}
    for _, g in tr.groupby("conv_id", sort=False):
        ts = g["ts"].astype("datetime64[ns]").astype(np.int64).to_numpy()
        roles = g["role"].tolist()
        for i in range(1, len(roles)):
            key = (roles[i - 1], roles[i])
            gp = int((ts[i] - ts[i - 1]) // 10**9)
            n, s = cells.get(key, (0, 0))
            cells[key] = (n + 1, s + gp)
    assert len(out) == len(cells)
    for _, r in out.iterrows():
        n, s = cells[(r["a"], r["b"])]
        assert r["n"] == n
        assert abs(r["mean_gap"] - s / n) < 1e-6


def test_len_quantiles_by_role(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_len_quantiles_by_role"](SF).to_pandas().set_index("role")
    tr = _transcripts_pdf()
    tr["m1"] = tr["text"].fillna("").str.len()
    for role, g in tr.groupby("role"):
        v = np.sort(g["m1"].to_numpy(np.int64))
        n = len(v)

        def pick(q):
            return v[int(np.ceil(q * n)) - 1]

        assert out.loc[role, "n"] == n
        assert out.loc[role, "p25"] == pick(0.25)
        assert out.loc[role, "p50"] == pick(0.5)
        assert out.loc[role, "p75"] == pick(0.75)
        assert out.loc[role, "p95"] == pick(0.95)


def test_role_entropy_by_pos(ray_session):
    from ptrail_ray.entry_queries import ENTROPY_POS_K, QUERIES

    out = QUERIES["q_role_entropy_by_pos"](SF).to_pandas().set_index("pos")
    tr = _transcripts_pdf()
    tr = tr[tr["turn_idx"] < ENTROPY_POS_K]
    for pos, g in tr.groupby("turn_idx"):
        p = g["role"].value_counts(normalize=True).to_numpy()
        ent = float(-(p * np.log(p)).sum())
        assert out.loc[pos, "n"] == len(g)
        assert out.loc[pos, "n_roles"] == g["role"].nunique()
        assert abs(out.loc[pos, "entropy"] - ent) < 1e-6


def test_size_tool_chi2(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_size_tool_chi2"](SF).to_pandas()
    tr = _transcripts_pdf()
    per = tr.groupby("conv_id").agg(
        sz=("turn_idx", "size"), has=("tool", lambda s: int(s.notna().any()))
    )
    v = np.sort(per["sz"].to_numpy(np.int64))
    n = len(v)
    bounds = [v[int(np.ceil(k * n / 4)) - 1] for k in (1, 2, 3)]
    per["q"] = 1 + sum(
        (per["sz"].to_numpy(np.int64) > b).astype(int) for b in bounds
    )
    obs = per.groupby(["q", "has"]).size()
    rt = per.groupby("q").size()
    ct = per.groupby("has").size()
    chi = 0.0
    for (qq, hh), o in obs.items():
        e = rt.loc[qq] * ct.loc[hh] / n
        chi += (o - e) ** 2 / e
    assert out["n_convs"].iloc[0] == n
    assert abs(out["chi2"].iloc[0] - chi) < 1e-4


def test_customers_no_orders(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_customers_no_orders"](SF).to_pandas().set_index("nation")
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    active = set(orders["o_custkey"])
    cust["dormant"] = (~cust["c_custkey"].isin(active)).astype(int)
    for nat, g in cust.groupby("c_nationkey"):
        assert out.loc[nat, "n_customers"] == len(g)
        assert out.loc[nat, "n_dormant"] == g["dormant"].sum()
    assert out["n_customers"].sum() == len(cust)


def test_d7_retention(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_d7_retention"](SF).to_pandas().set_index("day")
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    ud = ev[["user_id", "d"]].drop_duplicates()
    bysets = {d: set(g["user_id"]) for d, g in ud.groupby("d")}
    for d in sorted(bysets):
        future = set()
        for k in range(1, 8):
            future |= bysets.get(d + k, set())
        ret = len(bysets[d] & future)
        assert out.loc[d, "dau"] == len(bysets[d])
        assert out.loc[d, "retained"] == ret
        assert abs(out.loc[d, "d7_rate"] - ret / len(bysets[d])) < 1e-6


def test_conversion_lag(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_conversion_lag"](SF).to_pandas()
    ev = _events_pdf()
    lags = []
    n_click = 0
    for _, g in ev.groupby("user_id"):
        clicks = g.loc[g["event_type"] == "click", "ts"]
        if clicks.empty:
            continue
        n_click += 1
        fc = clicks.min()
        pur = g.loc[(g["event_type"] == "purchase") & (g["ts"] >= fc), "ts"]
        if pur.empty:
            continue
        lags.append(int((pur.min() - fc).value // 10**9))
    lags = np.sort(np.array(lags, np.int64))
    assert out["n_clickers"].iloc[0] == n_click
    assert out["n_converted"].iloc[0] == len(lags)
    assert abs(out["conv_rate"].iloc[0] - len(lags) / n_click) < 1e-6
    assert out["lag_p50"].iloc[0] == lags[int(np.ceil(0.5 * len(lags))) - 1]
    assert out["lag_p90"].iloc[0] == lags[int(np.ceil(0.9 * len(lags))) - 1]


def test_tool_retry_rate(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tool_retry"](SF).to_pandas().set_index("tool")
    tr = _transcripts_pdf()
    cells: dict = {}
    for _, g in tr.groupby("conv_id", sort=False):
        tools = g.loc[g["tool"].notna(), "tool"].tolist()
        for a, b in zip(tools, tools[1:]):
            n, r = cells.get(a, (0, 0))
            cells[a] = (n + 1, r + (a == b))
    for tool, (n, r) in cells.items():
        assert out.loc[tool, "n"] == n
        assert out.loc[tool, "n_retry"] == r
        assert abs(out.loc[tool, "retry_rate"] - r / n) < 1e-6


def test_conv_day_span(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_conv_day_span"](SF).to_pandas().set_index("span_days")
    tr = _transcripts_pdf()
    per = tr.groupby("conv_id")["ts"].agg(["min", "max"])
    span = (
        per["max"].dt.normalize() - per["min"].dt.normalize()
    ).dt.days + 1
    exp = span.value_counts().sort_index()
    assert out["n_convs"].sum() == len(per)
    for s, n in exp.items():
        assert out.loc[s, "n_convs"] == n


def test_discount_profile(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = (
        QUERIES["q_discount_profile"](SF)
        .to_pandas()
        .set_index("discount_pct")
    )
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    li["pct"] = np.floor(li["l_discount"] * 100 + 0.5).astype(np.int64)
    for pct, g in li.groupby("pct"):
        assert out.loc[pct, "n"] == len(g)
        assert abs(out.loc[pct, "mean_qty"] - g["l_quantity"].mean()) < 1e-6
        rev = (g["l_extendedprice"] * (1 - g["l_discount"])).mean()
        assert abs(out.loc[pct, "mean_revenue"] - rev) < 1e-2


def test_word_len_hist(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_word_len_hist"](SF).to_pandas().set_index("wlen")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    cnt: dict = {}
    total = 0
    for text in docs["text"].fillna(""):
        for w in text.split(" "):
            cnt[len(w)] = cnt.get(len(w), 0) + 1
            total += 1
    assert out["n"].sum() == total
    for L, n in cnt.items():
        assert out.loc[L, "n"] == n


def test_part_size_price_corr(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_part_size_price_corr"](SF).to_pandas()
    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    x = part["p_size"].to_numpy(np.float64)
    y = np.floor(part["p_retailprice"].to_numpy() * 100 + 0.5)
    r = np.corrcoef(x, y)[0, 1]
    assert out["n_parts"].iloc[0] == len(part)
    assert abs(out["r"].iloc[0] - r) < 1e-6


def test_supplier_balance(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_supplier_balance"](SF).to_pandas().set_index("nation")
    sup = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    raw = sup["s_acctbal"].to_numpy() * 100
    sup["c"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    for nat, g in sup.groupby("s_nationkey"):
        c = g["c"].to_numpy(np.float64)
        assert out.loc[nat, "n"] == len(c)
        assert abs(out.loc[nat, "mean_bal"] - c.mean() / 100) < 1e-6
        if len(c) > 1:
            assert abs(out.loc[nat, "sd_bal"] - c.std(ddof=1) / 100) < 1e-4
        assert out.loc[nat, "min_cents"] == int(c.min())
        assert out.loc[nat, "max_cents"] == int(c.max())


def test_customers_per_region(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_customers_per_region"](SF).to_pandas().set_index("region")
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    region = pq.read_table(f"{SF}/region.parquet").to_pandas()
    m = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    ).set_index("n_nationkey")["r_name"]
    exp = cust["c_nationkey"].map(m).value_counts()
    assert out["n_customers"].sum() == len(cust)
    for reg, n in exp.items():
        assert out.loc[reg, "n_customers"] == n


def test_embed_norms(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_embed_norms"](SF).to_pandas().set_index("vec_id")
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    for _, r in emb.iterrows():
        v = np.asarray(r["embedding"], np.float64)
        assert abs(out.loc[r["vec_id"], "norm"] - np.linalg.norm(v)) < 1e-5


def test_first_tool_share(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_first_tool_share"](SF).to_pandas().set_index("tool")
    tr = _transcripts_pdf()
    firsts: dict = {}
    for _, g in tr.groupby("conv_id", sort=False):
        tools = g.loc[g["tool"].notna(), "tool"]
        if len(tools):
            firsts[tools.iloc[0]] = firsts.get(tools.iloc[0], 0) + 1
    total = sum(firsts.values())
    for tool, n in firsts.items():
        assert out.loc[tool, "n_convs"] == n
        assert abs(out.loc[tool, "share"] - n / total) < 1e-6
    assert out["n_convs"].sum() == total


def test_role_run_hist(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = (
        QUERIES["q_role_run_hist"](SF)
        .to_pandas()
        .set_index(["role", "run_len"])
    )
    tr = _transcripts_pdf()
    runs: dict = {}
    for _, g in tr.groupby("conv_id", sort=False):
        roles = g["role"].tolist()
        cur, ln = roles[0], 1
        for r in roles[1:]:
            if r == cur:
                ln += 1
            else:
                runs[(cur, ln)] = runs.get((cur, ln), 0) + 1
                cur, ln = r, 1
        runs[(cur, ln)] = runs.get((cur, ln), 0) + 1
    assert len(out) == len(runs)
    for key, n in runs.items():
        assert out.loc[key, "n"] == n


def test_norms_by_label(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_norms_by_label"](SF).to_pandas().set_index("label")
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    emb["norm"] = emb["embedding"].apply(
        lambda v: np.linalg.norm(np.asarray(v, np.float64))
    )
    for label, g in emb.groupby("label"):
        v = np.sort(g["norm"].to_numpy())
        n = len(v)
        assert out.loc[label, "n"] == n
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            exp = v[int(np.ceil(q * n)) - 1]
            assert abs(out.loc[label, col] - exp) < 1e-5


def test_purchase_by_hour(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_purchase_by_hour"](SF).to_pandas().set_index("hour")
    ev = _events_pdf()
    ev["h"] = ev["ts"].dt.hour
    for h, g in ev.groupby("h"):
        npur = int((g["event_type"] == "purchase").sum())
        assert out.loc[h, "n_events"] == len(g)
        assert out.loc[h, "n_purchases"] == npur
        assert abs(out.loc[h, "purchase_share"] - npur / len(g)) < 1e-6


def test_bootstrap_diff_ci(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_bootstrap_diff"](SF).to_pandas()
    # deterministic across runs
    out2 = QUERIES["q_bootstrap_diff"](SF).to_pandas()
    assert out.equals(out2)
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = docs.loc[docs["lang"] == "en", "n_chars"].mean()
    b = docs.loc[docs["lang"] != "en", "n_chars"].mean()
    point = a - b
    r = out.iloc[0]
    assert r["ci_lo"] <= r["diff_mean"] <= r["ci_hi"]
    # bootstrap mean should bracket the point estimate within ~4 SE
    assert abs(r["diff_mean"] - point) < 4 * max(r["diff_se"], 1.0)


def test_priority_region_crosstab(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = (
        QUERIES["q_priority_region_crosstab"](SF)
        .to_pandas()
        .set_index(["prio", "region"])
    )
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    region = pq.read_table(f"{SF}/region.parquet").to_pandas()
    j = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    exp = j.groupby(["o_orderpriority", "r_name"]).size()
    assert out["n_orders"].sum() == len(orders)
    for (p, r), n in exp.items():
        assert out.loc[(p, r), "n_orders"] == n


def test_repeat_interval(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_repeat_interval"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["d"] = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        86_400 * 10**9
    )
    gaps: dict = {}
    for (_, t), g in ev.groupby(["user_id", "event_type"]):
        d = np.sort(g["d"].to_numpy(np.int64))
        if len(d) > 1:
            gaps.setdefault(t, []).extend(np.diff(d).tolist())
    for t, gs in gaps.items():
        gs = np.sort(np.array(gs, np.int64))
        assert out.loc[t, "n_gaps"] == len(gs)
        assert out.loc[t, "gap_med"] == gs[int(np.ceil(0.5 * len(gs))) - 1]
        assert out.loc[t, "gap_p90"] == gs[int(np.ceil(0.9 * len(gs))) - 1]


def test_pointbiserial(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_pointbiserial"](SF).to_pandas()
    tr = _transcripts_pdf()
    per = tr.groupby("conv_id").agg(
        x=("tool", lambda s: float((s == "tool-0").any())),
        y=("turn_idx", "size"),
    )
    r = np.corrcoef(per["x"], per["y"])[0, 1]
    assert out["n_convs"].iloc[0] == len(per)
    assert out["n_with_tool"].iloc[0] == int(per["x"].sum())
    assert abs(out["r_pb"].iloc[0] - r) < 1e-6


def test_value_quantiles_by_type(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = (
        QUERIES["q_value_quantiles_by_type"](SF)
        .to_pandas()
        .set_index("event_type")
    )
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    ev["c"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    for t, g in ev.groupby("event_type"):
        v = np.sort(g["c"].to_numpy(np.int64))
        n = len(v)
        assert out.loc[t, "n"] == n
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")):
            exp = v[int(np.ceil(q * n)) - 1] / 100.0
            assert abs(out.loc[t, col] - exp) < 1e-6


def test_value_top_decile(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_value_top_decile"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    ev["c"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    for t, g in ev.groupby("event_type"):
        v = np.sort(g["c"].to_numpy(np.int64))[::-1]
        k = (len(v) + 9) // 10
        share = v[:k].sum() / v.sum()
        assert out.loc[t, "k_top"] == k
        assert abs(out.loc[t, "top_decile_share"] - share) < 1e-6
        assert out.loc[t, "top_decile_share"] >= 0.1 - 1e-9


def test_embed_dim_stats(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_embed_dim_stats"](SF).to_pandas().set_index("dim")
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    m = np.stack(
        [np.asarray(v, np.float64) for v in emb["embedding"]]
    )
    assert len(out) == m.shape[1]
    for d in range(m.shape[1]):
        col = m[:, d]
        assert out.loc[d + 1, "n"] == len(col)
        assert abs(out.loc[d + 1, "mean"] - col.mean()) < 1e-6
        assert abs(out.loc[d + 1, "min_q"] / 1e9 - col.min()) < 1e-8
        assert abs(out.loc[d + 1, "max_q"] / 1e9 - col.max()) < 1e-8


def test_cliffs_delta(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_cliffs_delta"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = docs.loc[docs["lang"] == "en", "n_chars"].to_numpy(np.int64)
    b = docs.loc[docs["lang"] != "en", "n_chars"].to_numpy(np.int64)
    gt = int((a[:, None] > b[None, :]).sum())
    lt = int((a[:, None] < b[None, :]).sum())
    assert out["n_en"].iloc[0] == len(a)
    assert out["n_rest"].iloc[0] == len(b)
    assert out["gt_pairs"].iloc[0] == gt
    assert out["lt_pairs"].iloc[0] == lt
    exp = (gt - lt) / (len(a) * len(b))
    assert abs(out["cliffs_delta"].iloc[0] - exp) < 1e-6
    assert -1.0 <= out["cliffs_delta"].iloc[0] <= 1.0


def test_theil_user(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_theil_user"](SF).to_pandas()
    ev = _events_pdf()
    x = ev.groupby("user_id").size().to_numpy(np.float64)
    mu = x.mean()
    exp = float(np.mean((x / mu) * np.log(x / mu)))
    assert out["n_users"].iloc[0] == len(x)
    assert out["total_events"].iloc[0] == int(x.sum())
    assert abs(out["theil_t"].iloc[0] - exp) < 1e-5
    assert abs(out["theil_norm"].iloc[0] - exp / np.log(len(x))) < 1e-5
    assert 0.0 <= out["theil_t"].iloc[0] <= np.log(len(x))


def test_bowley_value(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bowley_value"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    ev["c"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    for t, g in ev.groupby("event_type"):
        v = np.sort(g["c"].to_numpy(np.int64))
        n = len(v)
        q1, q2, q3 = (v[int(np.ceil(q * n)) - 1] for q in (0.25, 0.5, 0.75))
        assert out.loc[t, "q1"] == q1
        assert out.loc[t, "q2"] == q2
        assert out.loc[t, "q3"] == q3
        if q3 > q1:
            assert abs(out.loc[t, "bowley"] - (q3 + q1 - 2 * q2) / (q3 - q1)) < 1e-6
        if q3 + q1 != 0:
            assert abs(out.loc[t, "qcd"] - (q3 - q1) / (q3 + q1)) < 1e-6


def test_drawdown(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_drawdown"](SF).to_pandas()
    ev = _events_pdf()
    day = ev["ts"].values.astype("datetime64[D]")
    raw = ev["value"].to_numpy() * 100
    cents = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    daily = pd.DataFrame({"d": day, "s": cents}).groupby("d")["s"].sum()
    cum = daily.cumsum().to_numpy(np.int64)
    dd = np.maximum.accumulate(cum) - cum
    assert out["n_days"].iloc[0] == len(daily)
    assert out["peak_cum"].iloc[0] == cum.max()
    assert out["final_cum"].iloc[0] == cum[-1]
    assert out["max_drawdown"].iloc[0] == dd.max()
    exp_day = daily.index.to_numpy()[int(np.argmax(dd))]
    assert out["dd_day"].iloc[0] == exp_day.astype("datetime64[D]").astype(int)


def test_record_days(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_record_days"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]")
    for t, g in ev.groupby("event_type"):
        daily = g.groupby("d").size()
        c = daily.to_numpy(np.int64)
        rec = np.r_[True, c[1:] > np.maximum.accumulate(c)[:-1]]
        assert out.loc[t, "n_days"] == len(c)
        assert out.loc[t, "n_records"] == rec.sum()
        last = daily.index.to_numpy()[np.where(rec)[0][-1]]
        assert (
            out.loc[t, "last_record_day"]
            == last.astype("datetime64[D]").astype(int)
        )


def test_moving_range(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_moving_range"](SF).to_pandas()
    ev = _events_pdf()
    daily = ev.groupby(ev["ts"].values.astype("datetime64[D]")).size()
    c = daily.to_numpy(np.float64)
    xbar = c.mean()
    mrbar = np.abs(np.diff(c)).mean()
    assert out["n_days"].iloc[0] == len(c)
    assert abs(out["xbar"].iloc[0] - xbar) < 1e-6
    assert abs(out["mrbar"].iloc[0] - mrbar) < 1e-6
    assert abs(out["ucl"].iloc[0] - (xbar + 2.66 * mrbar)) < 1e-5
    assert abs(out["lcl"].iloc[0] - (xbar - 2.66 * mrbar)) < 1e-5
    exp_ooc = ((c > xbar + 2.66 * mrbar) | (c < xbar - 2.66 * mrbar)).sum()
    assert out["n_ooc"].iloc[0] == exp_ooc


def test_circular_hours(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_circular_hours"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["h"] = ev["ts"].dt.hour
    for t, g in ev.groupby("event_type"):
        th = 2 * np.pi * g["h"].to_numpy(np.float64) / 24.0
        s, c = np.sin(th).sum(), np.cos(th).sum()
        n = len(g)
        rbar = np.hypot(s, c) / n
        mh = np.arctan2(s, c) * 12 / np.pi % 24
        assert out.loc[t, "n"] == n
        assert abs(out.loc[t, "rbar"] - rbar) < 1e-6
        assert abs(out.loc[t, "mean_hour"] - mh) < 1e-5
        assert 0.0 <= out.loc[t, "rbar"] <= 1.0
        assert 0.0 <= out.loc[t, "mean_hour"] < 24.0


def test_perm_entropy(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_perm_entropy"](SF).to_pandas()
    ev = _events_pdf()
    c = ev.groupby(ev["ts"].values.astype("datetime64[D]")).size().to_numpy(
        np.int64
    )
    a, b, cc = c[:-2], c[1:-1], c[2:]
    pat = 4 * (a < b).astype(int) + 2 * (b < cc) + (a < cc)
    _, k = np.unique(pat, return_counts=True)
    p = k / k.sum()
    h = float(-(p * np.log(p)).sum())
    assert out["n_triples"].iloc[0] == len(pat)
    assert out["n_patterns"].iloc[0] == len(k)
    assert abs(out["h_perm"].iloc[0] - h) < 1e-6
    assert abs(out["h_norm"].iloc[0] - h / np.log(6)) < 1e-6


def test_xi_corr(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_xi_corr"](SF).to_pandas()
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]")
    daily = ev.groupby("d").agg(
        c=("event_id", "size"),
        p=("event_type", lambda s: int((s == "purchase").sum())),
    ).reset_index()
    n = len(daily)
    p = daily["p"].to_numpy(np.int64)
    rk = np.searchsorted(np.sort(p), p, side="right")
    order = np.lexsort((daily["d"].to_numpy(), daily["c"].to_numpy()))
    t = int(np.abs(np.diff(rk[order])).sum())
    xi = 1 - 3 * t / (n * n - 1)
    assert out["n_days"].iloc[0] == n
    assert out["sum_absdiff"].iloc[0] == t
    assert abs(out["xi"].iloc[0] - xi) < 1e-6


def test_basket_lift(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_basket_lift"](SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    pt = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    ob = li.merge(pt, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    nn = ob["l_orderkey"].nunique()
    singles = ob.groupby("p_brand").size()
    m = ob.merge(ob, on="l_orderkey")
    m = m[m["p_brand_x"] < m["p_brand_y"]]
    pairs = m.groupby(["p_brand_x", "p_brand_y"]).size()
    assert len(out) == len(pairs)
    for _, r in out.head(20).iterrows():
        exp = pairs.loc[(r["brand_a"], r["brand_b"])]
        assert r["n_pair"] == exp
        assert r["n_a"] == singles.loc[r["brand_a"]]
        assert r["n_b"] == singles.loc[r["brand_b"]]
        assert abs(r["lift"] - nn * exp / (r["n_a"] * r["n_b"])) < 1e-6


def test_tail_dependence(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tail_dependence"](SF).to_pandas()
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    ev["cent"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    daily = ev.groupby(ev["ts"].values.astype("datetime64[D]")).agg(
        c=("event_id", "size"), s=("cent", "sum")
    )
    n = len(daily)
    xq = np.sort(daily["c"].to_numpy())[int(np.ceil(0.9 * n)) - 1]
    yq = np.sort(daily["s"].to_numpy())[int(np.ceil(0.9 * n)) - 1]
    cond = daily["s"] >= yq
    joint = (daily["c"] >= xq) & cond
    assert out["n_days"].iloc[0] == n
    assert out["x_q90"].iloc[0] == xq
    assert out["y_q90"].iloc[0] == yq
    assert out["n_joint"].iloc[0] == joint.sum()
    assert out["n_cond"].iloc[0] == cond.sum()
    assert abs(out["lambda_u"].iloc[0] - joint.sum() / cond.sum()) < 1e-6


def test_simpson_check(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_simpson_check"](SF).to_pandas().set_index("scope")
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_discount", "l_quantity"],
    ).to_pandas()
    li["x"] = np.round(li["l_discount"] * 100).astype(np.int64)
    li["y"] = li["l_quantity"].astype(np.int64)
    groups = {f: g for f, g in li.groupby("l_returnflag")}
    groups["ALL"] = li
    assert len(out) == len(groups)
    for scope, g in groups.items():
        x, y = g["x"].to_numpy(np.float64), g["y"].to_numpy(np.float64)
        slope = np.polyfit(x, y, 1)[0]
        assert out.loc[scope, "n"] == len(g)
        assert abs(out.loc[scope, "slope"] - slope) < 1e-4
        cov = np.cov(x, y)[0, 1]
        assert out.loc[scope, "cov_sign"] == np.sign(cov)


def test_ljung_box(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ljung_box"](SF).to_pandas().set_index("lag")
    ev = _events_pdf()
    c = ev.groupby(ev["ts"].values.astype("datetime64[D]")).size().to_numpy(
        np.float64
    )
    n = len(c)
    z = c - c.mean()
    d0 = (z * z).sum()
    qacc = 0.0
    for lag in range(1, 8):
        rho = (z[:-lag] * z[lag:]).sum() / d0
        qacc += rho * rho / (n - lag)
        assert abs(out.loc[lag, "rho"] - rho) < 1e-6
        assert abs(out.loc[lag, "q_lb"] - n * (n + 2) * qacc) < 1e-4


def test_mcc_gate(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mcc_gate"](SF).to_pandas()
    tp, fp, fn, tn = (int(out[k].iloc[0]) for k in ("tp", "fp", "fn", "tn"))
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert tp + fp + fn + tn == n_docs
    mcc = (tp * tn - fp * fn) / np.sqrt(
        float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    )
    tpr, tnr = tp / (tp + fn), tn / (tn + fp)
    assert abs(out["mcc"].iloc[0] - mcc) < 1e-6
    assert abs(out["bal_acc"].iloc[0] - (tpr + tnr) / 2) < 1e-6
    assert abs(out["youden_j"].iloc[0] - (tpr + tnr - 1)) < 1e-6
    assert -1.0 <= out["mcc"].iloc[0] <= 1.0


def test_heaps_law(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq
    import re

    out = QUERIES["q_heaps_law"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    pts = []
    for txt in docs["text"].fillna(""):
        toks = re.findall(r"\S+", txt)
        if toks:
            pts.append((len(toks), len(set(toks))))
    x = np.log([p[0] for p in pts])
    y = np.log([p[1] for p in pts])
    beta, logk = np.polyfit(x, y, 1)
    assert out["n_docs"].iloc[0] == len(pts)
    assert abs(out["beta"].iloc[0] - beta) < 1e-4
    assert abs(out["log_k"].iloc[0] - logk) < 1e-4
    assert 0.0 < out["beta"].iloc[0] <= 1.0 + 1e-9


def test_kendall_w(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kendall_w"](SF).to_pandas()
    ev = _events_pdf()
    ev["h"] = ev["ts"].dt.hour
    types = sorted(ev["event_type"].unique())
    m, n = len(types), 24
    rsum = np.zeros(n, np.int64)
    for t in types:
        counts = np.array(
            [((ev["event_type"] == t) & (ev["h"] == h)).sum() for h in range(n)],
            np.int64,
        )
        order = np.lexsort((np.arange(n), counts))
        ranks = np.empty(n, np.int64)
        ranks[order] = np.arange(1, n + 1)
        rsum += ranks
    s = ((rsum - rsum.mean()) ** 2).sum()
    w = 12 * s / (m * m * (n**3 - n))
    assert out["n_items"].iloc[0] == n
    assert out["m_rankers"].iloc[0] == m
    assert out["sum_r2"].iloc[0] == (rsum * rsum).sum()
    assert abs(out["kendall_w"].iloc[0] - w) < 1e-6
    assert 0.0 <= out["kendall_w"].iloc[0] <= 1.0


def test_cohort_ltv(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cohort_ltv"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    raw = ev["value"].to_numpy() * 100
    ev["c"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    first = ev.groupby("user_id")["w"].min().rename("cw")
    ev = ev.join(first, on="user_id")
    ev["age"] = ev["w"] - ev["cw"]
    sizes = first.value_counts()
    cells = ev.groupby(["cw", "age"])["c"].sum().sort_index()
    exp_rows = []
    for cw in sorted(sizes.index):
        cum = 0
        for age in sorted(cells.loc[cw].index):
            cum += cells.loc[(cw, age)]
            exp_rows.append((cw, age, sizes.loc[cw], cum))
    assert len(out) == len(exp_rows)
    for (cw, age, nu, cum), (_, r) in zip(exp_rows, out.iterrows()):
        assert (r["cohort_week"], r["age_week"]) == (cw, age)
        assert r["n_users"] == nu
        assert r["cum_cents"] == cum
        assert abs(r["ltv_cents"] - cum / nu) < 1e-6
    # LTV curve is cumulative within each cohort
    for _, g in out.groupby("cohort_week"):
        assert g["cum_cents"].is_monotonic_increasing or (
            g["cum_cents"].diff().dropna().abs().ge(0).all()
        )


def test_post_stratified(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_post_stratified"](SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    nl = docs.groupby("lang").size()
    for s, g in docs.groupby("source"):
        raw = g["n_chars"].mean()
        cells = g.groupby("lang")["n_chars"].mean()
        w = nl.loc[cells.index]
        post = (w * cells).sum() / w.sum()
        assert out.loc[s, "n"] == len(g)
        assert abs(out.loc[s, "raw_mean"] - raw) < 1e-6
        assert abs(out.loc[s, "post_mean"] - post) < 1e-4


def test_growth_accounting(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_growth_accounting"](SF).to_pandas().set_index("week")
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    uw = ev[["user_id", "w"]].drop_duplicates()
    weeks = {u: set(g["w"]) for u, g in uw.groupby("user_id")}
    gmax = uw["w"].max()
    from collections import Counter

    exp = {}
    for u, ws in weeks.items():
        first = min(ws)
        for w in ws:
            if w == first:
                st = "n_new"
            elif w - 1 in ws:
                st = "n_retained"
            else:
                st = "n_resurrected"
            exp.setdefault(w, Counter())[st] += 1
            if w + 1 <= gmax and w + 1 not in ws:
                exp.setdefault(w + 1, Counter())["n_churned"] += 1
    assert set(out.index) == set(exp)
    for w, cnt in exp.items():
        for col in ("n_new", "n_retained", "n_resurrected", "n_churned"):
            assert out.loc[w, col] == cnt.get(col, 0), (w, col)
        if cnt.get("n_churned", 0) > 0:
            qr = (cnt.get("n_new", 0) + cnt.get("n_resurrected", 0)) / cnt[
                "n_churned"
            ]
            assert abs(out.loc[w, "quick_ratio"] - qr) < 1e-6


def test_cindex(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cindex"](SF).to_pandas()
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    per = []
    for u, g in ev.groupby("user_id"):
        fd, ld = g["d"].min(), g["d"].max()
        per.append(((g["d"] == fd).sum(), ld - fd))
    conc = tie = usable = 0
    for i in range(len(per)):
        for j in range(len(per)):
            if per[i][1] < per[j][1]:
                usable += 1
                if per[i][0] < per[j][0]:
                    conc += 1
                elif per[i][0] == per[j][0]:
                    tie += 1
    assert out["n_users"].iloc[0] == len(per)
    assert out["conc"].iloc[0] == conc
    assert out["tie"].iloc[0] == tie
    assert out["usable"].iloc[0] == usable
    assert abs(out["c_index"].iloc[0] - (2 * conc + tie) / (2 * usable)) < 1e-6


def test_apdex(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_apdex"](SF).to_pandas()
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    lats = []
    for _, g in tr.groupby("conv_id"):
        roles = g["role"].to_numpy()
        ts = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        for i in range(len(g) - 1):
            if roles[i] == "user" and roles[i + 1] == "assistant":
                lats.append(ts[i + 1] - ts[i])
    lats = np.array(lats, np.int64)
    T, T4 = 21_600_000_000, 86_400_000_000
    sat = int((lats <= T).sum())
    tol = int(((lats > T) & (lats <= T4)).sum())
    assert out["n"].iloc[0] == len(lats)
    assert out["n_sat"].iloc[0] == sat
    assert out["n_tol"].iloc[0] == tol
    assert out["n_frustrated"].iloc[0] == len(lats) - sat - tol
    assert abs(out["apdex"].iloc[0] - (2 * sat + tol) / (2 * len(lats))) < 1e-6


def test_atkinson(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_atkinson"](SF).to_pandas()
    ev = _events_pdf()
    x = ev.groupby("user_id").size().to_numpy(np.float64)
    am = x.mean()
    a1 = 1 - np.exp(np.log(x).mean()) / am
    a2 = 1 - (len(x) / (1 / x).sum()) / am
    assert out["n_users"].iloc[0] == len(x)
    assert abs(out["atkinson_1"].iloc[0] - a1) < 1e-6
    assert abs(out["atkinson_2"].iloc[0] - a2) < 1e-6
    assert 0 <= out["atkinson_1"].iloc[0] <= out["atkinson_2"].iloc[0] <= 1


def test_lorenz_curve(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_lorenz_curve"](SF).to_pandas()
    ev = _events_pdf()
    cnt = np.sort(ev.groupby("user_id").size().to_numpy(np.int64))
    n = len(cnt)
    base, rem = n // 10, n % 10
    i = 0
    for d in range(1, 11):
        size = base + (1 if d <= rem else 0)
        seg = cnt[i : i + size]
        i += size
        r = out[out["decile"] == d].iloc[0]
        assert r["n_users"] == size
        assert r["n_events"] == seg.sum()
        assert abs(r["share"] - seg.sum() / cnt.sum()) < 1e-6
    assert out["n_users"].sum() == n
    assert out["n_events"].sum() == cnt.sum()
    assert abs(out["cum_share"].iloc[-1] - 1.0) < 1e-6
    # per-USER mean share is monotone (raw share isn't: ntile gives the
    # first n%10 deciles one extra user)
    per_user = out["n_events"] / out["n_users"]
    assert per_user.is_monotonic_increasing


def test_emd_lengths(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_emd_lengths"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = np.sort(docs.loc[docs["lang"] == "en", "n_chars"].to_numpy(np.float64))
    b = np.sort(docs.loc[docs["lang"] != "en", "n_chars"].to_numpy(np.float64))
    # scipy-free W1: integrate |F_A - F_B| over the union support
    v = np.unique(np.r_[a, b])
    fa = np.searchsorted(a, v, side="right") / len(a)
    fb = np.searchsorted(b, v, side="right") / len(b)
    w1 = float((np.abs(fa - fb)[:-1] * np.diff(v)).sum())
    assert out["n_en"].iloc[0] == len(a)
    assert out["n_rest"].iloc[0] == len(b)
    assert abs(out["w1"].iloc[0] - w1) < 1e-6


def test_markov_stationary(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _MK_STATES

    out = QUERIES["q_markov_stationary"](SF).to_pandas()
    assert list(out["state"]) == sorted(_MK_STATES)
    assert abs(out["pi"].sum() - 1.0) < 1e-5
    assert (out["pi"] >= 0).all()
    # float power iteration on the same transition matrix converges to
    # nearly the same distribution (fixed-point error << 1e-6)
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    sid = {s: i for i, s in enumerate(_MK_STATES)}
    m = len(_MK_STATES)
    mat = np.zeros((m, m))
    for _, g in tr.groupby("conv_id"):
        tools = g["tool"].fillna("").to_numpy()
        for a, b in zip(tools[:-1], tools[1:]):
            mat[sid[a], sid[b]] += 1
    P = mat / np.where(mat.sum(1, keepdims=True) == 0, 1, mat.sum(1, keepdims=True))
    for i in range(m):
        if mat[i].sum() == 0:
            P[i, i] = 1.0
    pi = np.full(m, 1 / m)
    for _ in range(200):
        pi = pi @ P
    exp = pd.Series(pi, index=_MK_STATES).sort_index()
    assert np.allclose(out.set_index("state")["pi"], exp, atol=1e-4)


def test_tool_by_position(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tool_by_position"](SF).to_pandas()
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    rows = []
    for _, g in tr.groupby("conv_id"):
        L = len(g)
        for pos, tool in enumerate(g["tool"].fillna("")):
            rows.append((4 * pos // L, tool))
    exp = pd.DataFrame(rows, columns=["quartile", "tool"]).groupby(
        ["quartile", "tool"]
    ).size()
    assert len(out) == len(exp)
    tot = exp.groupby(level=0).sum()
    for _, r in out.iterrows():
        assert r["n"] == exp.loc[(r["quartile"], r["tool"])]
        assert abs(
            r["share"] - exp.loc[(r["quartile"], r["tool"])] / tot[r["quartile"]]
        ) < 1e-6
    assert set(out["quartile"]) == {0, 1, 2, 3}


def test_toolchain_funnel(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_toolchain_funnel"](SF).to_pandas().set_index("k")
    tr = _transcripts_pdf()
    dist = tr.groupby("conv_id")["tool"].nunique()
    nc = len(dist)
    for k in range(1, 8):
        ge = int((dist >= k).sum())
        assert out.loc[k, "n_convs_ge_k"] == ge
        assert abs(out.loc[k, "share"] - ge / nc) < 1e-6
    assert out["n_convs_ge_k"].is_monotonic_decreasing


def test_cvm_lengths(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_cvm_lengths"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = np.sort(docs.loc[docs["lang"] == "en", "n_chars"].to_numpy(np.float64))
    b = np.sort(docs.loc[docs["lang"] != "en", "n_chars"].to_numpy(np.float64))
    na, nb = len(a), len(b)
    z = np.r_[a, b]
    fa = np.searchsorted(a, z, side="right") / na
    fb = np.searchsorted(b, z, side="right") / nb
    t = na * nb / (na + nb) ** 2 * ((fa - fb) ** 2).sum()
    assert out["n_en"].iloc[0] == na
    assert out["n_rest"].iloc[0] == nb
    assert abs(out["cvm_t"].iloc[0] - t) < 1e-6


def test_energy_distance(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_energy_distance"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = docs.loc[docs["lang"] == "en", "n_chars"].to_numpy(np.float64)
    b = docs.loc[docs["lang"] != "en", "n_chars"].to_numpy(np.float64)
    exy = np.abs(a[:, None] - b[None, :]).mean()
    exx = np.abs(a[:, None] - a[None, :]).mean()
    eyy = np.abs(b[:, None] - b[None, :]).mean()
    ed2 = 2 * exy - exx - eyy
    assert out["n_en"].iloc[0] == len(a)
    assert out["n_rest"].iloc[0] == len(b)
    assert out["e_xy"].iloc[0] == int(np.abs(a[:, None] - b[None, :]).sum())
    assert abs(out["ed2"].iloc[0] - ed2) < 1e-6
    assert out["ed2"].iloc[0] >= 0


def test_changepoint(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_changepoint"](SF).to_pandas()
    ev = _events_pdf()
    daily = ev.groupby(ev["ts"].values.astype("datetime64[D]")).size()
    x = daily.to_numpy(np.int64)
    n = len(x)
    z = n * x - x.sum()
    cus = np.cumsum(z)[:-1]
    k = int(np.argmax(np.abs(cus)))
    assert out["n_days"].iloc[0] == n
    assert (
        out["cp_day"].iloc[0]
        == daily.index.to_numpy()[k].astype("datetime64[D]").astype(int)
    )
    assert out["cusum_max"].iloc[0] == abs(cus[k])
    mb, ma = x[: k + 1].mean(), x[k + 1 :].mean()
    assert abs(out["mean_before"].iloc[0] - mb) < 1e-6
    assert abs(out["mean_after"].iloc[0] - ma) < 1e-6
    assert abs(out["shift"].iloc[0] - (ma - mb)) < 1e-6


def test_pacf(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_pacf"](SF).to_pandas().set_index("lag")
    ev = _events_pdf()
    c = ev.groupby(ev["ts"].values.astype("datetime64[D]")).size().to_numpy(
        np.float64
    )
    z = c - c.mean()
    d0 = (z * z).sum()
    rho = np.r_[1.0, [(z[:-k] * z[k:]).sum() / d0 for k in (1, 2, 3, 4)]]
    # Durbin-Levinson reference
    phi = {}
    phi[(1, 1)] = rho[1]
    for k in range(2, 5):
        num = rho[k] - sum(phi[(k - 1, j)] * rho[k - j] for j in range(1, k))
        den = 1 - sum(phi[(k - 1, j)] * rho[j] for j in range(1, k))
        phi[(k, k)] = num / den
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
    for k in range(1, 5):
        assert abs(out.loc[k, "rho"] - rho[k]) < 1e-6
        assert abs(out.loc[k, "pacf"] - phi[(k, k)]) < 1e-5
    assert abs(out.loc[1, "pacf"] - out.loc[1, "rho"]) < 1e-9


def test_region_trend(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_region_trend"](SF).to_pandas().set_index("region")
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cu = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    na = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    re = pq.read_table(f"{SF}/region.parquet").to_pandas()
    j = (
        li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
        .merge(re, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["week"] = (
        j["o_orderdate"].values.astype("datetime64[D]").astype(np.int64) // 7
    )
    j["rev"] = np.round(
        j["l_extendedprice"] * (1 - j["l_discount"]) * 10000
    ).astype(np.int64)
    for rname, g in j.groupby("r_name"):
        cell = g.groupby("week")["rev"].sum()
        slope = np.polyfit(
            cell.index.to_numpy(np.float64), cell.to_numpy(np.float64), 1
        )[0]
        assert out.loc[rname, "n_weeks"] == len(cell)
        assert out.loc[rname, "rev_q"] == cell.sum()
        assert abs(out.loc[rname, "slope_per_week"] - slope / 1e4) < 2e-4


def test_hill_tail(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hill_tail"](SF).to_pandas()
    ev = _events_pdf()
    cnt = np.sort(ev.groupby("user_id").size().to_numpy(np.float64))[::-1]
    n = len(cnt)
    k = int(np.ceil(n / 10))
    xk1 = cnt[k]
    alpha = k / (np.log(cnt[:k]).sum() - k * np.log(xk1))
    assert out["n_users"].iloc[0] == n
    assert out["k"].iloc[0] == k
    assert out["x_kplus1"].iloc[0] == xk1
    assert abs(out["hill_alpha"].iloc[0] - alpha) < 1e-5
    assert out["hill_alpha"].iloc[0] > 0


def test_attribution_compare(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = (
        QUERIES["q_attribution_compare"](SF).to_pandas().set_index("event_type")
    )
    ev = _events_pdf().sort_values(["user_id", "ts", "event_id"])
    from collections import Counter

    nf, nl = Counter(), Counter()
    for _, g in ev.groupby("user_id"):
        tys = g["event_type"].tolist()
        for i, t in enumerate(tys):
            if t == "purchase" and i > 0:
                nf[tys[0]] += 1
                nl[tys[i - 1]] += 1
    assert set(out.index) == set(nf) | set(nl)
    for t in out.index:
        assert out.loc[t, "n_first_touch"] == nf.get(t, 0)
        assert out.loc[t, "n_last_touch"] == nl.get(t, 0)
        if nf.get(t, 0) > 0:
            assert abs(
                out.loc[t, "last_over_first"] - nl.get(t, 0) / nf[t]
            ) < 1e-6


def test_elasticity(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_elasticity"](SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    ).to_pandas()
    pt = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_retailprice"]
    ).to_pandas()
    per = li.groupby("l_partkey")["l_quantity"].sum().rename("q").reset_index()
    per = per.merge(pt, left_on="l_partkey", right_on="p_partkey")
    x = np.log(np.round(per["p_retailprice"] * 100).to_numpy(np.float64))
    y = np.log(per["q"].to_numpy(np.float64))
    slope = np.polyfit(x, y, 1)[0]
    assert out["n_parts"].iloc[0] == len(per)
    assert abs(out["elasticity"].iloc[0] - slope) < 1e-3


def test_mus_sample(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_mus_sample"](SF).to_pandas()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas().sort_values("o_orderkey")
    c = np.round(od["o_totalprice"].to_numpy() * 100).astype(np.int64)
    tot = c.sum()
    step = tot // 100
    cum = np.cumsum(c)
    sel = (cum // step) > ((cum - c) // step)
    assert out["n_orders"].iloc[0] == len(c)
    assert out["step_cents"].iloc[0] == step
    assert out["n_selected"].iloc[0] == sel.sum()
    assert out["selected_cents"].iloc[0] == c[sel].sum()
    assert abs(out["coverage"].iloc[0] - c[sel].sum() / tot) < 1e-6
    # systematic PPS: ~100 picks, every big order (> step) must be selected
    assert (c[~sel] <= step).all()


def test_ordinal_assoc(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_ordinal_assoc"](SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_discount", "l_quantity"]
    ).to_pandas()
    x = np.round(li["l_discount"] * 100).to_numpy(np.int64)
    y = li["l_quantity"].to_numpy(np.int64)
    # brute-force pair counts on a subsample-free exact basis via cells
    cells = pd.DataFrame({"x": x, "y": y}).groupby(["x", "y"]).size()
    conc = disc = tx = ty = 0
    items = [(a, b, int(c)) for (a, b), c in cells.items()]
    for xa, ya, ca in items:
        for xb, yb, cb in items:
            if xa < xb and ya < yb:
                conc += ca * cb
            elif xa < xb and ya > yb:
                disc += ca * cb
    for _, g in cells.groupby(level=0):
        s = int(g.sum())
        tx += (s * s - int((g**2).sum())) // 2
    for _, g in cells.groupby(level=1):
        s = int(g.sum())
        ty += (s * s - int((g**2).sum())) // 2
    assert out["conc"].iloc[0] == conc
    assert out["disc"].iloc[0] == disc
    assert out["ties_x"].iloc[0] == tx
    assert out["ties_y"].iloc[0] == ty
    assert abs(out["gamma"].iloc[0] - (conc - disc) / (conc + disc)) < 1e-6
    assert abs(
        out["tau_b"].iloc[0]
        - (conc - disc) / np.sqrt((conc + disc + tx) * (conc + disc + ty))
    ) < 1e-6


def test_stickiness(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_stickiness"](SF).to_pandas().set_index("week")
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    ud = ev[["user_id", "d"]].drop_duplicates()
    ud["w"] = ud["d"] // 7
    for w, g in ud.groupby("w"):
        wau = g["user_id"].nunique()
        userdays = len(g)
        assert out.loc[w, "wau"] == wau
        assert out.loc[w, "user_days"] == userdays
        assert abs(out.loc[w, "stickiness"] - userdays / 7 / wau) < 1e-6
        assert out.loc[w, "stickiness"] <= 1.0 + 1e-9


def test_lmoments(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_lmoments"](SF).to_pandas()
    ev = _events_pdf()
    x = np.sort(
        ev.groupby(ev["ts"].values.astype("datetime64[D]")).size().to_numpy(
            np.float64
        )
    )
    n = len(x)
    i = np.arange(1, n + 1)
    b0 = x.mean()
    b1 = ((i - 1) * x).sum() / (n * (n - 1))
    b2 = ((i - 1) * (i - 2) / 2 * x).sum() / (n * (n - 1) * (n - 2) / 2)
    b3 = ((i - 1) * (i - 2) * (i - 3) / 6 * x).sum() / (
        n * (n - 1) * (n - 2) * (n - 3) / 6
    )
    l1, l2 = b0, 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    assert out["n_days"].iloc[0] == n
    assert abs(out["l1"].iloc[0] - l1) < 1e-6
    assert abs(out["l2"].iloc[0] - l2) < 1e-6
    assert abs(out["t3"].iloc[0] - l3 / l2) < 1e-6
    assert abs(out["t4"].iloc[0] - l4 / l2) < 1e-6
    assert -1 <= out["t3"].iloc[0] <= 1


def test_cooccur_pmi(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _PMI_TOPK, _PMI_MIN_AB
    import pyarrow.parquet as pq
    import re
    from collections import Counter

    out = QUERIES["q_cooccur_pmi"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    doc_words = [set(re.findall(r"\S+", t or "")) for t in docs["text"]]
    df = Counter(w for ws in doc_words for w in ws)
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:_PMI_TOPK]
    topset = {w for w, _ in top}
    nd = len(docs)
    single = Counter()
    pair = Counter()
    for ws in doc_words:
        tw = sorted(ws & topset)
        single.update(tw)
        for i in range(len(tw)):
            for j in range(i + 1, len(tw)):
                pair[(tw[i], tw[j])] += 1
    exp = {k: v for k, v in pair.items() if v >= _PMI_MIN_AB}
    assert len(out) == len(exp)
    for _, r in out.head(30).iterrows():
        key = (r["w_a"], r["w_b"])
        assert key in exp
        assert r["n_ab"] == exp[key]
        assert r["n_a"] == single[r["w_a"]]
        assert r["n_b"] == single[r["w_b"]]
        pmi = np.log(nd * exp[key] / (single[r["w_a"]] * single[r["w_b"]]))
        assert abs(r["pmi"] - pmi) < 1e-6


def test_haar_energy(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_haar_energy"](SF).to_pandas().set_index("level")
    ev = _events_pdf()
    x = ev.groupby(ev["ts"].values.astype("datetime64[D]")).size().to_numpy(
        np.float64
    )
    n2 = 1
    while n2 * 2 <= len(x):
        n2 *= 2
    s = x[:n2].copy()
    nums = []
    for lev in (1, 2, 3):
        d = s[0::2] - s[1::2]
        s = s[0::2] + s[1::2]
        e = (d * d).sum()
        nums.append(e * 2 ** (3 - lev))
        assert out.loc[lev, "n_coeffs"] == len(d)
        assert abs(out.loc[lev, "energy"] - e / 2**lev) < 1e-6
    for lev in (1, 2, 3):
        assert abs(out.loc[lev, "share"] - nums[lev - 1] / sum(nums)) < 1e-6
    assert abs(out["share"].sum() - 1.0) < 1e-5


def test_gumbel_max(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gumbel_max"](SF).to_pandas()
    ev = _events_pdf()
    daily = ev.groupby(ev["ts"].values.astype("datetime64[D]")).size()
    wk = daily.groupby(
        daily.index.to_numpy().astype("datetime64[D]").astype(np.int64) // 7
    ).max()
    m = wk.to_numpy(np.float64)
    mean, sd = m.mean(), m.std(ddof=1)
    scale = sd * np.sqrt(6) / np.pi
    loc = mean - 0.5772156649015329 * scale
    z = (1.2 * m.max() - loc) / scale
    p = 1 - np.exp(-np.exp(-z))
    assert out["n_weeks"].iloc[0] == len(m)
    assert out["max_week"].iloc[0] == m.max()
    assert abs(out["gumbel_loc"].iloc[0] - loc) < 1e-5
    assert abs(out["gumbel_scale"].iloc[0] - scale) < 1e-5
    assert abs(out["p_exceed_1_2x"].iloc[0] - p) < 1e-6
    assert 0.0 <= out["p_exceed_1_2x"].iloc[0] <= 1.0


def test_nbinom_fit(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_nbinom_fit"](SF).to_pandas()
    ev = _events_pdf()
    x = ev.groupby("user_id").size().to_numpy(np.float64)
    mu, var = x.mean(), x.var(ddof=1)
    assert out["n_users"].iloc[0] == len(x)
    assert abs(out["mean"].iloc[0] - mu) < 1e-6
    assert abs(out["dispersion"].iloc[0] - var / mu) < 1e-6
    if var > mu:
        assert abs(out["nb_r"].iloc[0] - mu * mu / (var - mu)) < 1e-5
        assert abs(out["nb_p"].iloc[0] - mu / var) < 1e-6
    else:
        assert pd.isna(out["nb_r"].iloc[0])


def test_inspection_paradox(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_inspection_paradox"](SF).to_pandas()
    ev = _events_pdf().sort_values(["user_id", "ts", "event_id"])
    gaps = []
    for _, g in ev.groupby("user_id"):
        ts = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        gaps.extend(((ts[1:] - ts[:-1]) // 1_000_000).tolist())
    gaps = np.array(gaps, np.float64)
    factor = len(gaps) * (gaps**2).sum() / gaps.sum() ** 2
    assert out["n_gaps"].iloc[0] == len(gaps)
    assert abs(out["mean_gap_s"].iloc[0] - gaps.mean()) < 1e-6
    assert abs(
        out["length_biased_s"].iloc[0] - (gaps**2).sum() / gaps.sum()
    ) < 1e-5
    assert abs(out["inspection_factor"].iloc[0] - factor) < 1e-6
    assert out["inspection_factor"].iloc[0] >= 1.0  # Cauchy-Schwarz


def test_abc_parts(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_abc_parts"](SF).to_pandas().set_index("abc_class")
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).to_pandas()
    li["rev"] = np.round(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 10000
    ).astype(np.int64)
    per = li.groupby("l_partkey")["rev"].sum().reset_index()
    per = per.sort_values(["rev", "l_partkey"], ascending=[False, True])
    rev = per["rev"].to_numpy(np.int64)
    tot = rev.sum()
    prev = np.cumsum(rev) - rev
    cls = np.where(
        5 * prev < 4 * tot, "A", np.where(20 * prev < 19 * tot, "B", "C")
    )
    for k in ("A", "B", "C"):
        m = cls == k
        assert out.loc[k, "n_parts"] == m.sum()
        assert out.loc[k, "revenue_q"] == rev[m].sum()
        assert abs(out.loc[k, "rev_share"] - rev[m].sum() / tot) < 1e-6
    assert out.loc["A", "rev_share"] >= 0.79
    assert out["n_parts"].sum() == len(per)


def test_weibull_fit(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_weibull_fit"](SF).to_pandas()
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    span = ev.groupby("user_id")["d"].agg(lambda s: s.max() - s.min())
    t = np.sort(span[span > 0].to_numpy(np.float64))
    n = len(t)
    i = np.arange(1, n + 1)
    x = np.log(t)
    y = np.log(-np.log(1 - (i - 0.3) / (n + 0.4)))
    k, b = np.polyfit(x, y, 1)
    lam = np.exp(-b / k)
    assert out["n_users"].iloc[0] == n
    assert abs(out["shape_k"].iloc[0] - k) < 1e-4
    assert abs(out["scale_days"].iloc[0] - lam) < 1e-3
    assert out["shape_k"].iloc[0] > 0


def test_price_index(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_price_index"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pandas()
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["half"] = (j["o_orderdate"].dt.day > 15).astype(int)
    j["e"] = np.round(j["l_extendedprice"] * 100).astype(np.int64)
    per = j.groupby(["l_partkey", "half"]).agg(
        q=("l_quantity", "sum"), e=("e", "sum")
    ).unstack(fill_value=0)
    both = (per[("q", 0)] > 0) & (per[("q", 1)] > 0)
    p = per[both]
    q0, q1 = p[("q", 0)].to_numpy(), p[("q", 1)].to_numpy()
    e0, e1 = p[("e", 0)].to_numpy(), p[("e", 1)].to_numpy()
    lasp = (e1 * q0 / q1).sum() / e0.sum()
    paas = e1.sum() / (e0 * q1 / q0).sum()
    assert out["n_parts"].iloc[0] == both.sum()
    assert abs(out["laspeyres"].iloc[0] - lasp) < 1e-4
    assert abs(out["paasche"].iloc[0] - paas) < 1e-4
    assert abs(out["fisher"].iloc[0] - np.sqrt(lasp * paas)) < 1e-4


def test_taylor_law(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_taylor_law"](SF).to_pandas()
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    ev["h"] = ev["ts"].dt.hour
    nd = ev["d"].nunique()
    pts = []
    for (_, _), g in ev.groupby(["event_type", "h"]):
        counts = g.groupby("d").size().reindex(
            ev["d"].unique(), fill_value=0
        ).to_numpy(np.float64)
        m, v = counts.mean(), counts.var(ddof=1)
        if m > 0 and v > 0:
            pts.append((np.log(m), np.log(v)))
    b, loga = np.polyfit([p[0] for p in pts], [p[1] for p in pts], 1)
    assert out["n_cells"].iloc[0] == len(pts)
    assert out["n_days"].iloc[0] == nd
    assert abs(out["taylor_b"].iloc[0] - b) < 1e-4
    assert abs(out["log_a"].iloc[0] - loga) < 1e-4


def test_rank_stability(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_rank_stability"](SF).to_pandas()
    ev = _events_pdf()
    ev["h"] = ev["ts"].dt.hour
    ev["half"] = (ev["ts"].dt.day > 15).astype(int)
    types = sorted(ev["event_type"].unique())
    hours = sorted(ev["h"].unique())
    keys = [(t, h) for t in types for h in hours]
    cnt = ev.groupby(["event_type", "h", "half"]).size()

    def ranks(half):
        vals = [
            (int(cnt.get((t, h, half), 0)), t, h) for (t, h) in keys
        ]
        order = sorted(range(len(keys)), key=lambda i: vals[i])
        r = [0] * len(keys)
        for pos, i in enumerate(order, 1):
            r[i] = pos
        return np.array(r)

    r0, r1 = ranks(0), ranks(1)
    n = len(keys)
    d2 = ((r0 - r1) ** 2).sum()
    assert out["n_cells"].iloc[0] == n
    assert out["sum_d2"].iloc[0] == d2
    assert out["footrule"].iloc[0] == np.abs(r0 - r1).sum()
    assert abs(
        out["spearman_rho"].iloc[0] - (1 - 6 * d2 / (n * (n * n - 1)))
    ) < 1e-6


def test_word_burstiness(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq
    import re
    from collections import Counter

    out = QUERIES["q_word_burstiness"](SF).to_pandas().set_index("w")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    tf, df, df2 = Counter(), Counter(), Counter()
    for t in docs["text"].fillna(""):
        c = Counter(re.findall(r"\S+", t))
        for w, k in c.items():
            tf[w] += k
            df[w] += 1
            if k >= 2:
                df2[w] += 1
    assert set(out.index) == set(tf)
    for w in out.index:
        assert out.loc[w, "tf"] == tf[w]
        assert out.loc[w, "df"] == df[w]
        assert out.loc[w, "df2"] == df2.get(w, 0)
        assert abs(out.loc[w, "adaptation"] - df2.get(w, 0) / df[w]) < 1e-6
        assert abs(out.loc[w, "rate"] - tf[w] / df[w]) < 1e-6


def test_renyi_spectrum(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq
    import re
    from collections import Counter

    out = QUERIES["q_renyi_spectrum"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    c = Counter(
        w for t in docs["text"].fillna("") for w in re.findall(r"\S+", t)
    )
    f = np.array(list(c.values()), np.float64)
    p = f / f.sum()
    assert out["vocab"].iloc[0] == len(f)
    assert out["tokens"].iloc[0] == f.sum()
    assert abs(out["renyi_0"].iloc[0] - np.log(len(f))) < 1e-6
    assert abs(out["renyi_1"].iloc[0] - -(p * np.log(p)).sum()) < 1e-6
    assert abs(out["renyi_2"].iloc[0] - -np.log((p**2).sum())) < 1e-6
    assert abs(out["renyi_inf"].iloc[0] - -np.log(p.max())) < 1e-6
    # monotone: R0 >= R1 >= R2 >= Rinf
    assert (
        out["renyi_0"].iloc[0]
        >= out["renyi_1"].iloc[0]
        >= out["renyi_2"].iloc[0]
        >= out["renyi_inf"].iloc[0]
    )


def test_transition_residuals(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _MK_STATES

    out = QUERIES["q_transition_residuals"](SF).to_pandas()
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    sid = {s: i for i, s in enumerate(_MK_STATES)}
    m = len(_MK_STATES)
    mat = np.zeros((m, m))
    for _, g in tr.groupby("conv_id"):
        tools = g["tool"].fillna("").to_numpy()
        for a, b in zip(tools[:-1], tools[1:]):
            mat[sid[a], sid[b]] += 1
    r, c, nn = mat.sum(1), mat.sum(0), mat.sum()
    for _, row in out.iterrows():
        i, j = sid[row["from_tool"]], sid[row["to_tool"]]
        e = r[i] * c[j] / nn
        assert row["n"] == mat[i, j]
        assert abs(row["expected"] - e) < 1e-5
        res = (mat[i, j] - e) / np.sqrt(
            e * (1 - r[i] / nn) * (1 - c[j] / nn)
        )
        assert abs(row["residual"] - res) < 1e-4
    # residuals of a contingency table roughly sum to 0 across cells
    assert abs((out["n"] - out["expected"]).sum()) < 1e-3


def test_ab_power(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ab_power"](SF).to_pandas()
    ev = _events_pdf()
    p = (ev["event_type"] == "purchase").mean()
    delta = 0.1 * p
    npa = 2 * (1.959963984540054 + 0.8416212335729143) ** 2 * p * (1 - p) / delta**2
    assert out["n_events"].iloc[0] == len(ev)
    assert abs(out["p_hat"].iloc[0] - p) < 1e-6
    assert abs(out["delta"].iloc[0] - delta) < 1e-6
    assert out["n_per_arm"].iloc[0] == int(np.ceil(npa))


def test_label_centroid_cosine(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_label_centroid_cosine"](SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    m = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    labels = sorted(emb["label"].unique())
    cents = {
        lb: m[emb["label"].to_numpy() == lb].sum(axis=0) for lb in labels
    }
    assert len(out) == len(labels) * (len(labels) - 1) // 2
    for _, r in out.iterrows():
        a, b = cents[r["label_a"]], cents[r["label_b"]]
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert abs(r["cosine"] - cos) < 1e-5
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9


def test_median_ci(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_median_ci"](SF).to_pandas()
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    c = np.sort(
        np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)).astype(
            np.int64
        )
    )
    n = len(c)
    z = 1.959963984540054
    lo = max(1, int(np.floor((n - z * np.sqrt(n)) / 2)))
    hi = min(n, int(np.ceil(1 + (n + z * np.sqrt(n)) / 2)))
    assert out["n"].iloc[0] == n
    assert out["median_cents"].iloc[0] == c[(n + 1) // 2 - 1]
    assert out["lo_cents"].iloc[0] == c[lo - 1]
    assert out["hi_cents"].iloc[0] == c[hi - 1]
    assert (
        out["lo_cents"].iloc[0]
        <= out["median_cents"].iloc[0]
        <= out["hi_cents"].iloc[0]
    )


def test_sprt(ray_session):
    from ptrail_ray.entry_queries import (
        QUERIES, _SPRT_QA, _SPRT_QB, _SPRT_UP, _SPRT_DN,
    )

    out = QUERIES["q_sprt"](SF).to_pandas()
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    daily = ev.groupby("d").agg(
        n=("event_id", "size"),
        k=("event_type", lambda s: int((s == "purchase").sum())),
    ).sort_index()
    llr, dec, cross = 0, "continue", None
    for d, r in daily.iterrows():
        llr += int(r["k"]) * _SPRT_QA + int(r["n"] - r["k"]) * _SPRT_QB
        if dec == "continue":
            if llr >= _SPRT_UP:
                dec, cross = "H1", d
            elif llr <= _SPRT_DN:
                dec, cross = "H0", d
    assert out["n_days"].iloc[0] == len(daily)
    assert out["decision"].iloc[0] == dec
    if cross is None:
        assert pd.isna(out["cross_day"].iloc[0])
    else:
        assert out["cross_day"].iloc[0] == cross
    assert out["final_llr_q"].iloc[0] == llr


def test_trimmed_mean(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_trimmed_mean"](SF).to_pandas()
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    c = np.sort(
        np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)).astype(
            np.float64
        )
    )
    n = len(c)
    g = 0.1 * n
    k, f = int(g), g - int(g)
    w = np.ones(n)
    w[: k + 1] = 0
    w[n - k - 1 :] = 0
    w[k] = 1 - f
    w[n - k - 1] = 1 - f
    exp = (w * c).sum() / w.sum()
    assert out["n"].iloc[0] == n
    assert abs(out["trimmed_mean_cents"].iloc[0] - exp) < 1e-6


def test_benford2(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_benford2"](SF).to_pandas().set_index("digit")
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_totalprice"]
    ).to_pandas()
    cents = np.round(od["o_totalprice"].to_numpy() * 100).astype(np.int64)
    cents = cents[cents >= 10]
    d2 = np.array([int(str(v)[1]) for v in cents])
    n = len(d2)
    for d in range(10):
        p = sum(np.log10(1 + 1 / (10 * d1 + d)) for d1 in range(1, 10))
        o = int((d2 == d).sum())
        assert out.loc[d, "observed"] == o
        assert abs(out.loc[d, "expected"] - n * p) < 1e-4
        assert abs(out.loc[d, "contrib"] - (o - n * p) ** 2 / (n * p)) < 1e-3
    assert out["observed"].sum() == n


def test_price_endings(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_price_endings"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    ev["frac"] = (
        np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)).astype(
            np.int64
        )
        % 100
    )
    for t, g in ev.groupby("event_type"):
        nr = int((g["frac"] == 0).sum())
        nc = int((g["frac"] == 99).sum())
        assert out.loc[t, "n"] == len(g)
        assert out.loc[t, "n_round"] == nr
        assert out.loc[t, "n_charm"] == nc
        assert abs(out.loc[t, "share_round"] - nr / len(g)) < 1e-6
        assert abs(out.loc[t, "share_charm"] - nc / len(g)) < 1e-6


def test_capture_recapture(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_capture_recapture"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    w0 = ev["w"].min()
    s1 = set(ev.loc[ev["w"] == w0, "user_id"])
    s2 = set(ev.loc[ev["w"] == w0 + 1, "user_id"])
    n1, n2, m = len(s1), len(s2), len(s1 & s2)
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    se = np.sqrt(
        (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) / ((m + 1) ** 2 * (m + 2))
    )
    assert out["n_week1"].iloc[0] == n1
    assert out["n_week2"].iloc[0] == n2
    assert out["overlap"].iloc[0] == m
    assert abs(out["chapman_n"].iloc[0] - nhat) < 1e-6
    assert abs(out["se"].iloc[0] - se) < 1e-6
    # estimate is at least the union size seen
    assert out["chapman_n"].iloc[0] >= len(s1 | s2) - 1


def test_mean_crossings(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mean_crossings"](SF).to_pandas()
    ev = _events_pdf()
    x = ev.groupby(ev["ts"].values.astype("datetime64[D]")).size().to_numpy(
        np.float64
    )
    s = (x > x.mean()).astype(int)
    crossings = int((np.diff(s) != 0).sum())
    runs = np.r_[0, np.where(np.diff(s) != 0)[0] + 1, len(s)]
    lens = np.diff(runs)
    kinds = s[runs[:-1]]
    assert out["n_days"].iloc[0] == len(x)
    assert out["crossings"].iloc[0] == crossings
    la = lens[kinds == 1].max() if (kinds == 1).any() else 0
    lb = lens[kinds == 0].max() if (kinds == 0).any() else 0
    assert out["longest_above"].iloc[0] == la
    assert out["longest_below"].iloc[0] == lb


def test_peaks(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_peaks"](SF).to_pandas()
    ev = _events_pdf()
    daily = ev.groupby(ev["ts"].values.astype("datetime64[D]")).size()
    c = daily.to_numpy(np.int64)
    d = daily.index.to_numpy().astype("datetime64[D]").astype(np.int64)
    peaks = []
    for i in range(3, len(c) - 3):
        win = c[i - 3 : i + 4]
        if (c[i] > np.r_[win[:3], win[4:]]).all() and 10 * c[i] >= 11 * int(
            np.sort(win)[3]
        ):
            peaks.append((d[i], c[i]))
    assert out["n_days"].iloc[0] == len(c)
    assert out["n_peaks"].iloc[0] == len(peaks)
    if peaks:
        mx = max(p[1] for p in peaks)
        assert out["peak_count"].iloc[0] == mx
        assert out["peak_day"].iloc[0] == min(
            p[0] for p in peaks if p[1] == mx
        )
    else:
        assert pd.isna(out["peak_day"].iloc[0])


def test_icc_design(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_icc_design"](SF).to_pandas()
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    ev["x"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    groups = [g["x"].to_numpy(np.float64) for _, g in ev.groupby("user_id")]
    n = sum(len(g) for g in groups)
    gcnt = len(groups)
    grand = np.concatenate(groups)
    ssb = sum(len(g) * (g.mean() - grand.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    msb, msw = ssb / (gcnt - 1), ssw / (n - gcnt)
    k0 = (n - sum(len(g) ** 2 for g in groups) / n) / (gcnt - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    deff = 1 + (n / gcnt - 1) * icc
    assert out["n_users"].iloc[0] == gcnt
    assert out["n_events"].iloc[0] == n
    assert abs(out["icc"].iloc[0] - icc) < 1e-4
    assert abs(out["design_effect"].iloc[0] - deff) < 1e-3


def _word_freqs():
    import pyarrow.parquet as pq
    import re
    from collections import Counter

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    return Counter(
        w for t in docs["text"].fillna("") for w in re.findall(r"\S+", t)
    )


def test_chao1(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_chao1"](SF).to_pandas()
    c = _word_freqs()
    f = np.array(list(c.values()))
    v, t = len(f), f.sum()
    f1, f2 = int((f == 1).sum()), int((f == 2).sum())
    assert out["vocab"].iloc[0] == v
    assert out["tokens"].iloc[0] == t
    assert out["f1"].iloc[0] == f1
    assert out["f2"].iloc[0] == f2
    assert abs(out["chao1"].iloc[0] - (v + f1 * (f1 - 1) / (2 * (f2 + 1)))) < 1e-6
    assert abs(out["gt_unseen_mass"].iloc[0] - f1 / t) < 1e-6
    assert out["chao1"].iloc[0] >= v


def test_rarefaction(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _RARE_M

    out = QUERIES["q_rarefaction"](SF).to_pandas()
    c = _word_freqs()
    f = np.array(list(c.values()), np.float64)
    t = f.sum()
    m = _RARE_M
    # exact hypergeometric via log-gamma-free product
    ev = 0.0
    for fi in f:
        if fi > t - m:
            ev += 1.0
        else:
            i = np.arange(m)
            ev += 1.0 - np.exp(np.log((t - fi - i) / (t - i)).sum())
    assert out["vocab"].iloc[0] == len(f)
    assert out["tokens"].iloc[0] == t
    assert out["m"].iloc[0] == m
    assert abs(out["expected_vocab"].iloc[0] - ev) < 1e-3
    assert 0 < out["expected_vocab"].iloc[0] <= len(f)


def test_g_test(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_g_test"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    tab = pd.crosstab(docs["lang"], docs["source"])
    n = tab.values.sum()
    e = np.outer(tab.sum(1), tab.sum(0)) / n
    o = tab.values.astype(float)
    mask = o > 0
    g = 2 * (o[mask] * np.log(o[mask] / e[mask])).sum()
    assert out["n"].iloc[0] == n
    assert out["df"].iloc[0] == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    assert abs(out["g_stat"].iloc[0] - g) < 1e-3
    assert out["g_stat"].iloc[0] >= 0


def test_lorenz_asymmetry(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_lorenz_asymmetry"](SF).to_pandas()
    ev = _events_pdf()
    cnt = ev.groupby("user_id").size().to_numpy(np.int64)
    below = cnt < cnt.mean()
    asym = below.sum() / len(cnt) + cnt[below].sum() / cnt.sum()
    assert out["n_users"].iloc[0] == len(cnt)
    assert out["below_users"].iloc[0] == below.sum()
    assert out["below_events"].iloc[0] == cnt[below].sum()
    assert abs(out["asymmetry"].iloc[0] - asym) < 1e-6
    assert 0 <= out["asymmetry"].iloc[0] <= 2


def test_irreversibility(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _MK_STATES

    out = QUERIES["q_irreversibility"](SF).to_pandas()
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    sid = {s: i for i, s in enumerate(_MK_STATES)}
    m = len(_MK_STATES)
    mat = np.zeros((m, m), np.int64)
    for _, g in tr.groupby("conv_id"):
        tools = g["tool"].fillna("").to_numpy()
        for a, b in zip(tools[:-1], tools[1:]):
            mat[sid[a], sid[b]] += 1
    tot, n_pairs, best = 0.0, 0, (-1, None, None)
    for i in range(m):
        for j in range(i + 1, m):
            a, b = int(mat[i, j]), int(mat[j, i])
            if a + b == 0:
                continue
            n_pairs += 1
            term = (a - b) ** 2 / (a + b)
            tot += term
            if round(term * 1e6) > best[0]:
                best = (round(term * 1e6), _MK_STATES[i], _MK_STATES[j])
    assert out["n_pairs"].iloc[0] == n_pairs
    assert abs(out["irreversibility"].iloc[0] - tot) < 1e-4
    assert (out["top_a"].iloc[0], out["top_b"].iloc[0]) == (best[1], best[2])


def test_word_position_bias(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq
    import re
    from collections import defaultdict

    out = QUERIES["q_word_position_bias"](SF).to_pandas().set_index("w")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    acc = defaultdict(list)
    for t in docs["text"].fillna(""):
        toks = re.findall(r"\S+", t)
        if len(toks) < 2:
            continue
        for i, w in enumerate(toks):
            acc[w].append(i / (len(toks) - 1))
    assert set(out.index) == set(acc)
    for w in out.index:
        assert out.loc[w, "n"] == len(acc[w])
        assert abs(out.loc[w, "mean_relpos"] - np.mean(acc[w])) < 1e-5
        assert 0.0 <= out.loc[w, "mean_relpos"] <= 1.0


def test_decayed_engagement(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = (
        QUERIES["q_decayed_engagement"](SF).to_pandas().set_index("event_type")
    )
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    gmax = ev["d"].max()
    ev["w"] = 2.0 ** (-(gmax - ev["d"]) / 7.0)
    tot_n, tot_s = len(ev), ev["w"].sum()
    for t, g in ev.groupby("event_type"):
        assert out.loc[t, "n"] == len(g)
        assert abs(out.loc[t, "share_plain"] - len(g) / tot_n) < 1e-6
        assert abs(
            out.loc[t, "share_decayed"] - g["w"].sum() / tot_s
        ) < 1e-5
    assert abs(out["share_decayed"].sum() - 1.0) < 1e-5


def test_crest_factor(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_crest_factor"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    nd = ev["d"].nunique()
    for t, g in ev.groupby("event_type"):
        daily = g.groupby("d").size()
        assert out.loc[t, "n_days"] == nd
        assert out.loc[t, "total"] == len(g)
        assert out.loc[t, "peak_day_count"] == daily.max()
        assert abs(
            out.loc[t, "crest_factor"] - daily.max() * nd / len(g)
        ) < 1e-6
        assert out.loc[t, "crest_factor"] >= 1.0


def test_cagr_weekly(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cagr_weekly"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    for t, g in ev.groupby("event_type"):
        wk = g.groupby("w").size().sort_index()
        k = wk.index[-1] - wk.index[0]
        assert out.loc[t, "n_weeks"] == len(wk)
        assert out.loc[t, "first_week_n"] == wk.iloc[0]
        assert out.loc[t, "last_week_n"] == wk.iloc[-1]
        if k > 0:
            exp = np.exp(np.log(wk.iloc[-1] / wk.iloc[0]) / k)
            assert abs(out.loc[t, "weekly_growth"] - exp) < 1e-6


def test_vocab_coverage(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_vocab_coverage"](SF).to_pandas().set_index("k")
    c = _word_freqs()
    freqs = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    t = sum(c.values())
    for k in (5, 10, 20):
        cov = sum(f for _, f in freqs[:k])
        assert out.loc[k, "covered"] == cov
        assert abs(out.loc[k, "coverage"] - cov / t) < 1e-6
    assert out["coverage"].is_monotonic_increasing


def test_js_matrix_sources(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq
    import re
    from collections import Counter

    out = QUERIES["q_js_matrix_sources"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    dists = {}
    for s, g in docs.groupby("source"):
        c = Counter(
            w for t in g["text"].fillna("") for w in re.findall(r"\S+", t)
        )
        n = sum(c.values())
        dists[s] = {w: k / n for w, k in c.items()}
    srcs = sorted(dists)
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    for _, r in out.head(15).iterrows():
        pa_, pb = dists[r["source_a"]], dists[r["source_b"]]
        words = set(pa_) | set(pb)
        jsd = 0.0
        for w in words:
            p, q = pa_.get(w, 0.0), pb.get(w, 0.0)
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * np.log(p / m)
            if q > 0:
                jsd += 0.5 * q * np.log(q / m)
        assert abs(r["jsd"] - jsd) < 1e-5
        assert 0 <= r["jsd"] <= np.log(2) + 1e-9


def test_burrows_delta(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _BD_TOPK
    import pyarrow.parquet as pq
    import re
    from collections import Counter

    out = QUERIES["q_burrows_delta"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    per = {}
    corpus = Counter()
    for s, g in docs.groupby("source"):
        c = Counter(
            w for t in g["text"].fillna("") for w in re.findall(r"\S+", t)
        )
        per[s] = c
        corpus.update(c)
    top = [
        w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_BD_TOPK]
    srcs = sorted(per)
    f = np.array(
        [
            [per[s].get(w, 0) / sum(per[s].values()) for w in top]
            for s in srcs
        ]
    )
    z = (f - f.mean(0)) / f.std(0, ddof=1)
    idx = {s: i for i, s in enumerate(srcs)}
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    for _, r in out.head(15).iterrows():
        exp = np.abs(
            z[idx[r["source_a"]]] - z[idx[r["source_b"]]]
        ).mean()
        assert abs(r["delta"] - exp) < 1e-4
        assert r["delta"] >= 0


def _daily_counts():
    ev = _events_pdf()
    return ev.groupby(ev["ts"].values.astype("datetime64[D]")).size()


def test_semivariogram(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_semivariogram"](SF).to_pandas().set_index("lag")
    x = _daily_counts().to_numpy(np.float64)
    for h in range(1, 8):
        g = ((x[h:] - x[:-h]) ** 2).sum() / (2 * (len(x) - h))
        assert out.loc[h, "n_pairs"] == len(x) - h
        assert abs(out.loc[h, "gamma"] - g) < 1e-6


def test_exceedance_intervals(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_exceedance_intervals"](SF).to_pandas()
    daily = _daily_counts()
    c = daily.to_numpy(np.int64)
    n = len(c)
    thr = np.sort(c)[int(np.ceil(0.9 * n)) - 1]
    d = daily.index.to_numpy().astype("datetime64[D]").astype(np.int64)
    ex = d[c >= thr]
    gaps = np.diff(ex)
    assert out["threshold"].iloc[0] == thr
    assert out["n_exceed"].iloc[0] == len(ex)
    if len(ex) > 1:
        assert out["min_interval"].iloc[0] == gaps.min()
        assert out["max_interval"].iloc[0] == gaps.max()
        assert abs(
            out["mean_interval"].iloc[0] - (ex[-1] - ex[0]) / (len(ex) - 1)
        ) < 1e-6


def test_allan_variance(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_allan_variance"](SF).to_pandas().set_index("tau")
    x = _daily_counts().to_numpy(np.float64)
    for tau in (1, 2, 4):
        k = len(x) // tau
        m = x[: k * tau].reshape(k, tau).mean(axis=1)
        avar = (np.diff(m) ** 2).sum() / (2 * (k - 1))
        assert out.loc[tau, "n_blocks"] == k
        assert abs(out.loc[tau, "avar"] - avar) < 1e-6


def test_order_size_fit(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_order_size_fit"](SF).to_pandas().set_index("k")
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey"]).to_pandas()
    sizes = li.groupby("l_orderkey").size()
    n, tot = len(sizes), sizes.sum()
    p = n / tot
    for k in range(1, 8):
        o = int((sizes >= 7).sum()) if k == 7 else int((sizes == k).sum())
        e = n * (1 - p) ** 6 if k == 7 else n * (1 - p) ** (k - 1) * p
        assert out.loc[k, "observed"] == o
        assert abs(out.loc[k, "expected"] - e) < 1e-4
        assert abs(out.loc[k, "contrib"] - (o - e) ** 2 / e) < 1e-3
    assert out["observed"].sum() == n
    assert abs(out["expected"].sum() - n) < 0.5


def test_quant_error(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_quant_error"](SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    m = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    q = np.round(1e9 * m)
    amax = np.abs(q).max(axis=0)
    code = np.round(127 * q / amax)
    resid = (127 * q - code * amax) / (127 * 1e9)
    mse = (resid**2).mean()
    assert out["n_values"].iloc[0] == m.size
    assert abs(out["mse"].iloc[0] - mse * 1e9) < 1e-4
    assert abs(out["max_abs_err"].iloc[0] - np.abs(resid).max() * 1e6) < 1e-3
    # int8 symmetric quantization: max error is half a grid step
    assert np.abs(resid).max() <= (amax.max() / 1e9) / 127 / 2 + 1e-12


def test_concurrency_profile(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_concurrency_profile"](SF).to_pandas()
    tr = _transcripts_pdf()
    spans = tr.groupby("conv_id")["ts"].agg(["min", "max"])
    s = spans["min"].values.astype("datetime64[us]").astype(np.int64)
    e = spans["max"].values.astype("datetime64[us]").astype(np.int64) + 1
    times = np.r_[s, e]
    deltas = np.r_[np.ones(len(s), int), -np.ones(len(e), int)]
    order = np.lexsort((-deltas, times))
    t, lvl = times[order], np.cumsum(deltas[order])
    dur = np.r_[np.diff(t), 0]
    keep = dur > 0
    df = pd.DataFrame({"l": lvl[keep], "d": dur[keep]})
    wd = df.groupby("l")["d"].sum().sort_index()
    tot = wd.sum()
    cum = wd.cumsum()

    def wq(q):
        thr = int(np.ceil(q * tot))
        return wd.index[np.searchsorted(cum.to_numpy(), thr)]

    assert out["n_convs"].iloc[0] == len(spans)
    assert out["span_us"].iloc[0] == tot
    assert out["p50"].iloc[0] == wq(0.5)
    assert out["p90"].iloc[0] == wq(0.9)
    assert out["peak"].iloc[0] == lvl.max()


def test_mix_entropy_trend(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mix_entropy_trend"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    hs = []
    for w, g in ev.groupby("w"):
        p = g["event_type"].value_counts(normalize=True).to_numpy()
        hs.append((w, -(p * np.log(p)).sum()))
    ws = np.array([h[0] for h in hs], np.float64)
    ys = np.array([h[1] for h in hs])
    slope = np.polyfit(ws, ys, 1)[0]
    assert out["n_weeks"].iloc[0] == len(hs)
    assert abs(out["h_mean"].iloc[0] - ys.mean()) < 1e-6
    assert abs(out["slope_per_week"].iloc[0] - slope) < 1e-5


def test_gini_parts(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_gini_parts"](SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).to_pandas()
    li["rev"] = np.round(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 10000
    ).astype(np.int64)
    x = np.sort(li.groupby("l_partkey")["rev"].sum().to_numpy(np.float64))
    n = len(x)
    i = np.arange(1, n + 1)
    gini = ((2 * i - n - 1) * x).sum() / (n * x.sum())
    assert out["n_parts"].iloc[0] == n
    assert out["total_rev_q"].iloc[0] == x.sum()
    assert abs(out["gini"].iloc[0] - gini) < 1e-6
    assert 0 <= out["gini"].iloc[0] < 1


def test_hazard_table(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hazard_table"](SF).to_pandas().set_index("t_days")
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    spans = ev.groupby("user_id")["d"].agg(lambda s: s.max() - s.min())
    cat = spans.value_counts().sort_index()
    at_risk = cat[::-1].cumsum()[::-1]
    assert list(out.index) == list(cat.index)
    for t in cat.index:
        assert out.loc[t, "deaths"] == cat.loc[t]
        assert out.loc[t, "at_risk"] == at_risk.loc[t]
        assert abs(out.loc[t, "hazard"] - cat.loc[t] / at_risk.loc[t]) < 1e-6
    assert out["hazard"].iloc[-1] == 1.0  # everyone at max tenure exits


def test_assoc_rules(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _AR_MIN_AB
    import pyarrow.parquet as pq

    out = QUERIES["q_assoc_rules"](SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    pt = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    ob = li.merge(pt, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    nn = ob["l_orderkey"].nunique()
    singles = ob.groupby("p_brand").size()
    m = ob.merge(ob, on="l_orderkey")
    m = m[m["p_brand_x"] < m["p_brand_y"]]
    pairs = m.groupby(["p_brand_x", "p_brand_y"]).size()
    pairs = pairs[pairs >= _AR_MIN_AB]
    assert len(out) == 2 * len(pairs)
    for _, r in out.head(20).iterrows():
        a, b = r["antecedent"], r["consequent"]
        nab = pairs.loc[(min(a, b), max(a, b))]
        na, nb = singles.loc[a], singles.loc[b]
        assert r["n_ab"] == nab
        assert abs(r["confidence"] - nab / na) < 1e-6
        assert abs(r["lift"] - nn * nab / (na * nb)) < 1e-6
        if na > nab:
            assert abs(
                r["conviction"] - (1 - nb / nn) / (1 - nab / na)
            ) < 1e-4


def test_quadratic_hour(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_quadratic_hour"](SF).to_pandas()
    ev = _events_pdf()
    ev["h"] = ev["ts"].dt.hour
    g = ev.groupby("h").agg(
        n=("event_id", "size"),
        k=("event_type", lambda s: int((s == "purchase").sum())),
    )
    x = g.index.to_numpy(np.float64)
    y = (g["k"] / g["n"]).to_numpy(np.float64)
    c2, c1, _c0 = np.polyfit(x, y, 2)
    assert out["n_hours"].iloc[0] == len(x)
    assert abs(out["curvature"].iloc[0] - c2) < 1e-5
    assert abs(out["slope"].iloc[0] - c1) < 1e-4
    assert out["curv_sign"].iloc[0] == np.sign(out["curvature"].iloc[0])
    assert abs(out["vertex_hour"].iloc[0] - (-c1 / (2 * c2))) < 1e-2


def test_hash_uniformity(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    from hashlib import md5

    out = QUERIES["q_hash_uniformity"](SF).to_pandas()
    ev = _events_pdf()
    users = ev["user_id"].unique()
    hb = [int(md5(str(int(u)).encode()).hexdigest()[:2], 16) for u in users]
    from collections import Counter

    c = Counter(hb)
    n = len(users)
    obs2 = sum(v * (v - 1) for v in c.values())
    assert out["n_users"].iloc[0] == n
    assert out["n_buckets_hit"].iloc[0] == len(c)
    assert out["max_bucket"].iloc[0] == max(c.values())
    assert abs(
        out["collision_ratio"].iloc[0] - obs2 * 256 / (n * (n - 1))
    ) < 1e-6


def test_markov_order_test(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _MK_STATES

    out = QUERIES["q_markov_order_test"](SF).to_pandas()
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    sid = {s: i for i, s in enumerate(_MK_STATES)}
    m = len(_MK_STATES)
    mat = np.zeros((m, m))
    for _, g in tr.groupby("conv_id"):
        tools = g["tool"].fillna("").to_numpy()
        for a, b in zip(tools[:-1], tools[1:]):
            mat[sid[a], sid[b]] += 1
    r, c, nn = mat.sum(1), mat.sum(0), mat.sum()
    mask = mat > 0
    g_ = 2 * (
        mat[mask] * np.log(nn * mat[mask] / np.outer(r, c)[mask])
    ).sum()
    assert out["n_transitions"].iloc[0] == nn
    assert out["df"].iloc[0] == ((r > 0).sum() - 1) * ((c > 0).sum() - 1)
    assert abs(out["g_stat"].iloc[0] - g_) < 1e-4
    assert out["g_stat"].iloc[0] >= 0


def test_info_gain_hour(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_info_gain_hour"](SF).to_pandas()
    ev = _events_pdf()
    ev["h"] = ev["ts"].dt.hour

    def H(labels):
        p = labels.value_counts(normalize=True).to_numpy()
        return -(p * np.log(p)).sum()

    ht, hh = H(ev["event_type"]), H(ev["h"])
    hj = H(ev["event_type"].astype(str) + "|" + ev["h"].astype(str))
    ig = ht + hh - hj
    assert out["n"].iloc[0] == len(ev)
    assert abs(out["h_type"].iloc[0] - ht) < 1e-6
    assert abs(out["h_hour"].iloc[0] - hh) < 1e-6
    assert abs(out["h_joint"].iloc[0] - hj) < 1e-6
    assert abs(out["info_gain"].iloc[0] - ig) < 1e-5
    assert 0 <= out["uncertainty_coeff"].iloc[0] <= 1


def test_balance_activity_corr(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_balance_activity_corr"](SF).to_pandas()
    cu = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey"]
    ).to_pandas()
    cnt = od.groupby("o_custkey").size()
    x = np.round(cu["c_acctbal"] * 100).to_numpy(np.float64)
    y = cu["c_custkey"].map(cnt).fillna(0).to_numpy(np.float64)
    r = np.corrcoef(x, y)[0, 1]
    assert out["n_customers"].iloc[0] == len(cu)
    assert out["n_with_orders"].iloc[0] == len(cnt)
    assert abs(out["pearson_r"].iloc[0] - r) < 1e-6


def test_err_metric(ray_session):
    from ptrail_ray.entry_queries import QUERIES, NDCG_GAINS, NDCG_K

    out = QUERIES["q_err_metric"](SF).to_pandas().set_index("user_id")
    ev = _events_pdf()
    ev["gain"] = ev["event_type"].map(NDCG_GAINS).fillna(0).astype(int)
    for u, g in ev.groupby("user_id"):
        top = g.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(NDCG_K)
        err, stay = 0.0, 1.0
        for r, gn in enumerate(top["gain"], 1):
            R = (2**gn - 1) / 8
            err += stay * R / r
            stay *= 1 - R
        assert abs(out.loc[u, "err"] - err) < 1e-5
        assert 0 <= out.loc[u, "err"] <= 1


def test_concentration_index(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_concentration_index"](SF).to_pandas()
    cu = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    rev = od.groupby("o_custkey")["cents"].sum()
    cu["bal"] = np.round(cu["c_acctbal"] * 100).astype(np.int64)
    cu = cu.sort_values(["bal", "c_custkey"]).reset_index(drop=True)
    x = cu["c_custkey"].map(rev).fillna(0).to_numpy(np.float64)
    n = len(x)
    i = np.arange(1, n + 1)
    ci = 2 * (x * i).sum() / (n * x.sum()) - (n + 1) / n
    assert out["n_customers"].iloc[0] == n
    assert out["total_cents"].iloc[0] == x.sum()
    assert abs(out["conc_index"].iloc[0] - ci) < 1e-6
    assert -1 <= out["conc_index"].iloc[0] <= 1


def test_activity_persistence(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_activity_persistence"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    w0 = ev["w"].min()
    c1 = ev[ev["w"] == w0].groupby("user_id").size()
    c2 = ev[ev["w"] == w0 + 1].groupby("user_id").size()
    x = c1.to_numpy(np.float64)
    y = c1.index.map(c2).fillna(0).to_numpy(np.float64)
    slope = np.polyfit(x, y, 1)[0]
    r = np.corrcoef(x, y)[0, 1]
    assert out["n_users"].iloc[0] == len(x)
    assert abs(out["slope"].iloc[0] - slope) < 1e-5
    assert abs(out["pearson_r"].iloc[0] - r) < 1e-6


def test_hitting_time(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _MK_STATES

    out = QUERIES["q_hitting_time"](SF).to_pandas().set_index("state")
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    sid = {s: i for i, s in enumerate(_MK_STATES)}
    m = len(_MK_STATES)
    mat = np.zeros((m, m))
    for _, g in tr.groupby("conv_id"):
        tools = g["tool"].fillna("").to_numpy()
        for a, b in zip(tools[:-1], tools[1:]):
            mat[sid[a], sid[b]] += 1
    r = mat.sum(1)
    P = mat / np.where(r[:, None] == 0, 1, r[:, None])
    # float reference: solve h = 1 + P[:,1:] @ h over non-target states
    A = np.eye(m - 1) - P[1:, 1:]
    h = np.linalg.solve(A, np.ones(m - 1))
    for i, s in enumerate(_MK_STATES[1:]):
        if r[i + 1] > 0:
            # fixed-point 60-iter integer value approximates the solve
            assert abs(out.loc[s, "hitting_time"] - h[i]) < 1e-3
    assert (out["hitting_time"].dropna() >= 1.0).all()


def test_var_cvar(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_var_cvar"](SF).to_pandas()
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    ev["c"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    s = np.sort(ev.groupby(ev["ts"].values.astype("datetime64[D]"))["c"].sum())
    n = len(s)
    k = int(np.ceil(0.05 * n))
    assert out["n_days"].iloc[0] == n
    assert out["k_worst"].iloc[0] == k
    assert out["var95_cents"].iloc[0] == s[k - 1]
    assert abs(out["cvar95_cents"].iloc[0] - s[:k].mean()) < 1e-6
    assert out["cvar95_cents"].iloc[0] <= out["var95_cents"].iloc[0]


def test_page_trend(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_page_trend"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    weeks = sorted(ev["w"].unique())
    types = sorted(ev["event_type"].unique())
    k, b = len(weeks), len(types)
    cnt = ev.groupby(["event_type", "w"]).size()
    rsum = {w: 0 for w in weeks}
    for t in types:
        vals = sorted(weeks, key=lambda w: (cnt.get((t, w), 0), w))
        for pos, w in enumerate(vals, 1):
            rsum[w] += pos
    L = sum((j + 1) * rsum[w] for j, w in enumerate(weeks))
    e_l = b * k * (k + 1) ** 2 / 4
    z = (L - e_l) / np.sqrt(b * k**2 * (k + 1) * (k**2 - 1) / 144)
    assert out["n_blocks"].iloc[0] == b
    assert out["n_weeks"].iloc[0] == k
    assert out["page_l"].iloc[0] == L
    assert out["e_l"].iloc[0] == e_l
    assert abs(out["z"].iloc[0] - z) < 1e-6


def test_state_occupancy(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_state_occupancy"](SF).to_pandas().set_index("state")
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    from collections import Counter

    acc = Counter()
    for _, g in tr.groupby("conv_id"):
        ts = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        tools = g["tool"].fillna("").to_numpy()
        for i in range(len(g) - 1):
            acc[tools[i]] += int(ts[i + 1] - ts[i])
    tot = sum(acc.values())
    assert set(out.index) == set(acc)
    for s in out.index:
        assert out.loc[s, "total_us"] == acc[s]
        assert abs(out.loc[s, "share"] - acc[s] / tot) < 1e-6
    assert abs(out["share"].sum() - 1.0) < 1e-5


def test_priority_transitions(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_priority_transitions"](SF).to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas().sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    )
    from collections import Counter

    cnt = Counter()
    for _, g in od.groupby("o_custkey"):
        p = g["o_orderpriority"].tolist()
        for a, b in zip(p[:-1], p[1:]):
            cnt[(a, b)] += 1
    assert len(out) == len(cnt)
    rowtot = Counter()
    for (a, _b), c in cnt.items():
        rowtot[a] += c
    for _, r in out.iterrows():
        key = (r["from_priority"], r["to_priority"])
        assert r["n"] == cnt[key]
        assert abs(r["share"] - cnt[key] / rowtot[key[0]]) < 1e-6


def test_msttr(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _MSTTR_W
    import pyarrow.parquet as pq
    import re

    out = QUERIES["q_msttr"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    k, s = 0, 0
    for t in docs["text"].fillna(""):
        toks = re.findall(r"\S+", t)
        for i in range(len(toks) // _MSTTR_W):
            chunk = toks[i * _MSTTR_W : (i + 1) * _MSTTR_W]
            k += 1
            s += len(set(chunk))
    assert out["n_windows"].iloc[0] == k
    assert out["sum_types"].iloc[0] == s
    assert abs(out["msttr"].iloc[0] - s / (_MSTTR_W * k)) < 1e-6
    assert 0 < out["msttr"].iloc[0] <= 1


def test_xcorr_types(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_xcorr_types"](SF).to_pandas().set_index("lag")
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]")
    daily = ev.groupby("d").agg(
        p=("event_type", lambda s: int((s == "purchase").sum())),
        e=("event_type", lambda s: int((s == "error").sum())),
    )
    zp = daily["p"].to_numpy(np.float64) - daily["p"].mean()
    ze = daily["e"].to_numpy(np.float64) - daily["e"].mean()
    den = np.sqrt((zp**2).sum() * (ze**2).sum())
    n = len(zp)
    for lag in (-2, -1, 0, 1, 2):
        if lag >= 0:
            num = (zp[: n - lag] * ze[lag:]).sum()
        else:
            num = (zp[-lag:] * ze[: n + lag]).sum()
        assert abs(out.loc[lag, "xcorr"] - num / den) < 1e-6
        assert -1 <= out.loc[lag, "xcorr"] <= 1


def test_cochran_armitage(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cochran_armitage"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    g = ev.groupby("w").agg(
        n=("event_id", "size"),
        k=("event_type", lambda s: int((s == "purchase").sum())),
    ).sort_index()
    w = np.arange(1, len(g) + 1, dtype=np.float64)
    n_, k_ = g["n"].to_numpy(np.float64), g["k"].to_numpy(np.float64)
    N, K = n_.sum(), k_.sum()
    pbar = K / N
    num = (w * k_).sum() - pbar * (w * n_).sum()
    var = pbar * (1 - pbar) * ((n_ * w * w).sum() - (n_ * w).sum() ** 2 / N)
    z = num / np.sqrt(var)
    assert out["n_weeks"].iloc[0] == len(g)
    assert out["n"].iloc[0] == N
    assert out["k"].iloc[0] == K
    assert abs(out["z"].iloc[0] - z) < 1e-5


def test_hodges_lehmann(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_hodges_lehmann"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = docs.loc[docs["lang"] == "en", "n_chars"].to_numpy(np.int64)
    b = docs.loc[docs["lang"] != "en", "n_chars"].to_numpy(np.int64)
    diffs = np.sort((a[:, None] - b[None, :]).ravel())
    n = len(diffs)
    hl = diffs[int(np.ceil(n / 2)) - 1]  # lower weighted median
    assert out["n_pairs"].iloc[0] == n
    assert out["hl_shift"].iloc[0] == hl


def test_bimodality(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bimodality"](SF).to_pandas()
    x = _daily_counts().to_numpy(np.float64)
    z = x - x.mean()
    m2, m3, m4 = (z**2).mean(), (z**3).mean(), (z**4).mean()
    g1, g2 = m3 / m2**1.5, m4 / m2**2
    assert out["n_days"].iloc[0] == len(x)
    assert abs(out["skewness"].iloc[0] - g1) < 1e-5
    assert abs(out["kurtosis"].iloc[0] - g2) < 1e-5
    assert abs(out["bimodality"].iloc[0] - (g1**2 + 1) / g2) < 1e-5


def test_ks_uniform_hour(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ks_uniform_hour"](SF).to_pandas()
    ev = _events_pdf()
    c = ev["ts"].dt.hour.value_counts().reindex(range(24), fill_value=0)
    n = c.sum()
    cum = c.sort_index().cumsum().to_numpy(np.float64)
    dev = np.abs(cum / n - np.arange(1, 25) / 24)
    assert out["n"].iloc[0] == n
    assert out["worst_hour"].iloc[0] == int(np.argmax(dev))
    assert abs(out["d_stat"].iloc[0] - dev.max()) < 1e-6
    assert 0 <= out["d_stat"].iloc[0] <= 1


def test_stoch_dominance(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_stoch_dominance"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = np.sort(docs.loc[docs["lang"] == "en", "n_chars"].to_numpy())
    b = np.sort(docs.loc[docs["lang"] != "en", "n_chars"].to_numpy())
    v = np.unique(np.r_[a, b])
    fa = np.searchsorted(a, v, side="right") / len(a)
    fb = np.searchsorted(b, v, side="right") / len(b)
    holds = int((fa <= fb).sum())
    assert out["n_support"].iloc[0] == len(v)
    assert out["n_holds"].iloc[0] == holds
    assert out["dominates"].iloc[0] == (holds == len(v))
    assert abs(out["worst_violation"].iloc[0] - max((fa - fb).max(), 0)) < 1e-6


def test_shift_share(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_shift_share"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    w0 = ev["w"].min()
    a = ev[ev["w"] == w0].groupby("event_type").size()
    b = ev[ev["w"] == w0 + 1].groupby("event_type").size()
    n0, n1 = a.sum(), b.sum()
    for t in out.index:
        c0, c1 = a.get(t, 0), b.get(t, 0)
        assert out.loc[t, "n_week1"] == c0
        assert out.loc[t, "n_week2"] == c1
        assert abs(out.loc[t, "expected"] - c0 * n1 / n0) < 1e-5
        assert abs(out.loc[t, "mix_effect"] - (c1 - c0 * n1 / n0)) < 1e-5
    assert abs(out["mix_effect"].sum()) < 1e-3  # residuals net to zero


def test_growth_drivers(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_growth_drivers"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    w0 = ev["w"].min()
    g0 = ev[ev["w"] == w0]
    g1 = ev[ev["w"] == w0 + 1]
    n0, n1 = len(g0), len(g1)
    u0, u1 = g0["user_id"].nunique(), g1["user_id"].nunique()
    assert (out["n_week1"].iloc[0], out["n_week2"].iloc[0]) == (n0, n1)
    assert (out["u_week1"].iloc[0], out["u_week2"].iloc[0]) == (u0, u1)
    assert abs(out["g_total"].iloc[0] - np.log(n1 / n0)) < 1e-6
    assert abs(out["g_users"].iloc[0] - np.log(u1 / u0)) < 1e-6
    assert abs(
        out["g_total"].iloc[0]
        - out["g_users"].iloc[0]
        - out["g_intensity"].iloc[0]
    ) < 1e-5  # the decomposition identity


def test_post_purchase_error(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_post_purchase_error"](SF).to_pandas()
    ev = _events_pdf().sort_values(["user_id", "ts", "event_id"])
    na = nea = 0
    for _, g in ev.groupby("user_id"):
        ty = g["event_type"].tolist()
        for a, b in zip(ty[:-1], ty[1:]):
            if a == "purchase":
                na += 1
                if b == "error":
                    nea += 1
    ne = len(ev)
    nr = int((ev["event_type"] == "error").sum())
    assert out["n_events"].iloc[0] == ne
    assert out["n_after_purchase"].iloc[0] == na
    assert out["n_err_after"].iloc[0] == nea
    assert abs(out["err_rate_after"].iloc[0] - nea / na) < 1e-6
    assert abs(out["lift"].iloc[0] - (nea / na) / (nr / ne)) < 1e-5


def test_mean_residual_life(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mean_residual_life"](SF).to_pandas().set_index("t_days")
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    spans = ev.groupby("user_id")["d"].agg(lambda s: s.max() - s.min())
    for t in out.index:
        surv = spans[spans >= t]
        mrl = (surv - t).mean()
        assert out.loc[t, "at_risk"] == len(surv)
        assert abs(out.loc[t, "mrl_days"] - mrl) < 1e-6
    assert out["mrl_days"].iloc[-1] == 0.0


def test_handoff_entropy(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _MK_STATES

    out = QUERIES["q_handoff_entropy"](SF).to_pandas().set_index("state")
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    from collections import Counter

    rows = {s: Counter() for s in _MK_STATES}
    for _, g in tr.groupby("conv_id"):
        tools = g["tool"].fillna("").to_numpy()
        for a, b in zip(tools[:-1], tools[1:]):
            rows[a][b] += 1
    for s in out.index:
        c = np.array(list(rows[s].values()), np.float64)
        p = c / c.sum()
        h = -(p * np.log(p)).sum()
        assert out.loc[s, "n_out"] == c.sum()
        assert out.loc[s, "out_degree"] == len(c)
        assert abs(out.loc[s, "entropy"] - h) < 1e-6
        assert abs(out.loc[s, "perplexity"] - np.exp(h)) < 1e-5
        assert out.loc[s, "perplexity"] <= out.loc[s, "out_degree"] + 1e-9


def test_gap_gini(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gap_gini"](SF).to_pandas()
    ev = _events_pdf().sort_values(["user_id", "ts", "event_id"])
    gaps = []
    for _, g in ev.groupby("user_id"):
        ts = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        gaps.extend(((ts[1:] - ts[:-1]) // 1_000_000).tolist())
    x = np.sort(np.array(gaps, np.float64))
    n = len(x)
    i = np.arange(1, n + 1)
    gini = ((2 * i - n - 1) * x).sum() / (n * x.sum())
    assert out["n_gaps"].iloc[0] == n
    assert abs(out["gini"].iloc[0] - gini) < 1e-6
    assert 0 <= out["gini"].iloc[0] < 1


def test_coverage_by_source(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq
    import re
    from collections import Counter

    out = QUERIES["q_coverage_by_source"](SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for s, g in docs.groupby("source"):
        c = Counter(
            w for t in g["text"].fillna("") for w in re.findall(r"\S+", t)
        )
        tot = sum(c.values())
        f1 = sum(1 for v in c.values() if v == 1)
        assert out.loc[s, "vocab"] == len(c)
        assert out.loc[s, "tokens"] == tot
        assert out.loc[s, "f1"] == f1
        assert abs(out.loc[s, "coverage"] - (1 - f1 / tot)) < 1e-6


def test_revisit_curve(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_revisit_curve"](SF).to_pandas().set_index("k_days")
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    ud = ev[["user_id", "d"]].drop_duplicates()
    sets = {u: set(g["d"]) for u, g in ud.groupby("user_id")}
    gmax = ud["d"].max()
    for k in range(1, 8):
        num = sum(
            1 for u, ds_ in sets.items() for d in ds_ if d + k in ds_
        )
        den = sum(
            1 for u, ds_ in sets.items() for d in ds_ if d + k <= gmax
        )
        assert out.loc[k, "revisits"] == num
        assert out.loc[k, "at_risk"] == den
        assert abs(out.loc[k, "p_revisit"] - num / den) < 1e-6


def test_type_switch_rate(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_type_switch_rate"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf().sort_values(["user_id", "ts", "event_id"])
    from collections import Counter

    n, s = Counter(), Counter()
    for _, g in ev.groupby("user_id"):
        ty = g["event_type"].tolist()
        for a, b in zip(ty[:-1], ty[1:]):
            n[a] += 1
            if a != b:
                s[a] += 1
    for t in out.index:
        assert out.loc[t, "n_pairs"] == n[t]
        assert out.loc[t, "n_switched"] == s.get(t, 0)
        assert abs(out.loc[t, "switch_rate"] - s.get(t, 0) / n[t]) < 1e-6


def test_graph_distances(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _MK_STATES

    out = QUERIES["q_graph_distances"](SF).to_pandas().set_index("state")
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    sid = {s: i for i, s in enumerate(_MK_STATES)}
    m = len(_MK_STATES)
    adj = np.zeros((m, m), bool)
    for _, g in tr.groupby("conv_id"):
        tools = g["tool"].fillna("").to_numpy()
        for a, b in zip(tools[:-1], tools[1:]):
            if a != b:
                adj[sid[a], sid[b]] = True
    for s in out.index:
        u = sid[s]
        # BFS reference
        dist = {u: 0}
        frontier = [u]
        while frontier:
            nxt = []
            for x in frontier:
                for y in range(m):
                    if adj[x, y] and y not in dist:
                        dist[y] = dist[x] + 1
                        nxt.append(y)
            frontier = nxt
        ds_ = [d for v, d in dist.items() if v != u]
        assert out.loc[s, "n_reachable"] == len(ds_)
        assert out.loc[s, "eccentricity"] == (max(ds_) if ds_ else 0)
        assert out.loc[s, "harmonic_420"] == sum(420 // d for d in ds_)


def test_reciprocity(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _MK_STATES

    out = QUERIES["q_reciprocity"](SF).to_pandas()
    tr = _transcripts_pdf().sort_values(["conv_id", "turn_idx", "ts"])
    sid = {s: i for i, s in enumerate(_MK_STATES)}
    m = len(_MK_STATES)
    mat = np.zeros((m, m), np.int64)
    for _, g in tr.groupby("conv_id"):
        tools = g["tool"].fillna("").to_numpy()
        for a, b in zip(tools[:-1], tools[1:]):
            mat[sid[a], sid[b]] += 1
    np.fill_diagonal(mat, 0)
    tot = mat.sum()
    rec = np.minimum(mat, mat.T).sum()
    edges = int((mat > 0).sum())
    mutual = int(((mat > 0) & (mat.T > 0)).sum())
    assert out["n_edges"].iloc[0] == edges
    assert out["n_mutual"].iloc[0] == mutual
    assert abs(out["weighted_reciprocity"].iloc[0] - rec / tot) < 1e-6
    assert abs(out["edge_reciprocity"].iloc[0] - mutual / edges) < 1e-6


def test_ace_richness(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ace_richness"](SF).to_pandas()
    c = _word_freqs()
    f = np.array(list(c.values()))
    s_abund = int((f > 10).sum())
    rare = f[f <= 10]
    assert out["s_abund"].iloc[0] == s_abund
    assert out["s_rare"].iloc[0] == len(rare)
    assert out["n_rare"].iloc[0] == rare.sum()
    if len(rare) == 0:
        # degenerate: every type is abundant → ACE reduces to S_abund
        assert pd.isna(out["gamma2"].iloc[0])
        assert out["ace"].iloc[0] == s_abund
    else:
        assert out["ace"].iloc[0] >= s_abund + len(rare) - 1e-6


def test_vocab_growth(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq
    import re

    out = QUERIES["q_vocab_growth"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas().sort_values(
        "doc_id"
    )
    n = len(docs)
    seen = set()
    curve = {}
    checkpoints = {n // 4, n // 2, 3 * n // 4, n}
    for i, (_, row) in enumerate(docs.iterrows(), 1):
        seen.update(re.findall(r"\S+", row["text"] or ""))
        if i in checkpoints:
            curve[i] = len(seen)
    for _, r in out.iterrows():
        assert r["types_seen"] == curve[r["n_docs"]]
    assert out["types_seen"].is_monotonic_increasing


def test_circular_emd(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_circular_emd"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    ev["h"] = ev["ts"].dt.hour
    w0 = ev["w"].min()
    a = ev[ev["w"] == w0]["h"].value_counts().reindex(
        range(24), fill_value=0
    ).to_numpy(np.float64)
    b = ev[ev["w"] == w0 + 1]["h"].value_counts().reindex(
        range(24), fill_value=0
    ).to_numpy(np.float64)
    pa_, pb = a / a.sum(), b / b.sum()
    diff = np.cumsum(pa_ - pb)
    # min over K of mean |diff - K| is attained at the median
    emd = np.abs(diff - np.median(diff)).mean()
    assert out["n_week1"].iloc[0] == a.sum()
    assert out["n_week2"].iloc[0] == b.sum()
    # lower-median convention can differ from np.median by an amount
    # that does NOT change the optimum (flat between the two medians)
    assert abs(out["emd_circular"].iloc[0] - emd) < 1e-6


def test_tail_ratio(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tail_ratio"](SF).to_pandas().set_index("event_type")
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    ev["c"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    for t, g in ev.groupby("event_type"):
        v = np.sort(g["c"].to_numpy(np.int64))
        n = len(v)
        p50 = v[int(np.ceil(0.5 * n)) - 1]
        p99 = v[int(np.ceil(0.99 * n)) - 1]
        p999 = v[int(np.ceil(0.999 * n)) - 1]
        assert out.loc[t, "p50_cents"] == p50
        assert out.loc[t, "p99_cents"] == p99
        assert out.loc[t, "p999_cents"] == p999
        if p50 != 0:
            assert abs(out.loc[t, "tail_ratio_99_50"] - p99 / p50) < 1e-6


def test_spectral_slope(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_spectral_slope"](SF).to_pandas()
    x = _daily_counts().to_numpy(np.float64)
    n2 = 1
    while n2 * 2 <= len(x):
        n2 *= 2
    s = x[:n2].copy()
    es = []
    for lev in (1, 2, 3):
        d = s[0::2] - s[1::2]
        s = s[0::2] + s[1::2]
        es.append(np.log((d * d).sum() / 2**lev))
    slope = np.polyfit([1, 2, 3], es, 1)[0]
    assert out["n_levels"].iloc[0] == 3
    assert abs(out["slope_ln_e"].iloc[0] - slope) < 1e-5


def test_ovl_coefficient(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq
    from collections import Counter

    out = QUERIES["q_ovl_coefficient"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = Counter(docs.loc[docs["lang"] == "en", "n_chars"])
    b = Counter(docs.loc[docs["lang"] != "en", "n_chars"])
    na, nb = sum(a.values()), sum(b.values())
    ovl = sum(
        min(a.get(v, 0) / na, b.get(v, 0) / nb)
        for v in set(a) | set(b)
    )
    assert out["n_en"].iloc[0] == na
    assert out["n_rest"].iloc[0] == nb
    assert abs(out["ovl"].iloc[0] - ovl) < 1e-6
    assert 0 <= out["ovl"].iloc[0] <= 1


def test_eta_squared(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_eta_squared"](SF).to_pandas()
    ev = _events_pdf()
    raw = ev["value"].to_numpy() * 100
    ev["x"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.float64)
    grand = ev["x"].mean()
    ssb = sum(
        len(g) * (g["x"].mean() - grand) ** 2
        for _, g in ev.groupby("event_type")
    )
    sst = ((ev["x"] - grand) ** 2).sum()
    assert out["n"].iloc[0] == len(ev)
    assert out["k_groups"].iloc[0] == ev["event_type"].nunique()
    assert abs(out["eta_squared"].iloc[0] - ssb / sst) < 1e-5
    assert 0 <= out["eta_squared"].iloc[0] <= 1


def test_lexical_density(ray_session):
    from ptrail_ray.entry_queries import QUERIES, STOPWORDS
    import pyarrow.parquet as pq
    import re

    out = QUERIES["q_lexical_density"](SF).to_pandas().set_index("lang")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    stop = set(STOPWORDS)
    for l, g in docs.groupby("lang"):
        toks = [
            w for t in g["text"].fillna("") for w in re.findall(r"\S+", t)
        ]
        s = sum(1 for w in toks if w in stop)
        assert out.loc[l, "n_tokens"] == len(toks)
        assert out.loc[l, "n_stopwords"] == s
        assert abs(
            out.loc[l, "lexical_density"] - (len(toks) - s) / len(toks)
        ) < 1e-6


def test_churn_wilson(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_churn_wilson"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    w0 = ev["w"].min()
    cohort = set(ev.loc[ev["w"] == w0, "user_id"])
    nxt = set(ev.loc[ev["w"] == w0 + 1, "user_id"])
    n = len(cohort)
    k = len(cohort - nxt)
    p = k / n
    z = 1.959963984540054
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert out["cohort"].iloc[0] == n
    assert out["churned"].iloc[0] == k
    assert abs(out["churn_rate"].iloc[0] - p) < 1e-6
    assert abs(out["wilson_lo"].iloc[0] - (center - half)) < 1e-6
    assert abs(out["wilson_hi"].iloc[0] - (center + half)) < 1e-6
    assert (
        out["wilson_lo"].iloc[0]
        <= out["churn_rate"].iloc[0] + 1e-9
    )


def test_vocab_jaccard(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq
    import re

    out = QUERIES["q_vocab_jaccard"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = set(
        w
        for t in docs.loc[docs["lang"] == "en", "text"].fillna("")
        for w in re.findall(r"\S+", t)
    )
    b = set(
        w
        for t in docs.loc[docs["lang"] != "en", "text"].fillna("")
        for w in re.findall(r"\S+", t)
    )
    assert out["vocab_en"].iloc[0] == len(a)
    assert out["vocab_rest"].iloc[0] == len(b)
    assert out["intersection"].iloc[0] == len(a & b)
    assert abs(out["jaccard"].iloc[0] - len(a & b) / len(a | b)) < 1e-6


def test_mood_median(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_mood_median"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    x = np.sort(docs["n_chars"].to_numpy(np.int64))
    med = x[int(np.ceil(0.5 * len(x))) - 1]
    en = docs["lang"] == "en"
    a = int(((docs["n_chars"] > med) & en).sum())
    b = int(((docs["n_chars"] <= med) & en).sum())
    c = int(((docs["n_chars"] > med) & ~en).sum())
    d = int(((docs["n_chars"] <= med) & ~en).sum())
    n = a + b + c + d
    chi2 = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert out["grand_median"].iloc[0] == med
    assert (out["en_above"].iloc[0], out["en_below_eq"].iloc[0]) == (a, b)
    assert (out["rest_above"].iloc[0], out["rest_below_eq"].iloc[0]) == (c, d)
    assert abs(out["chi2"].iloc[0] - chi2) < 1e-5


def test_turning_points(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_turning_points"](SF).to_pandas()
    x = _daily_counts().to_numpy(np.int64)
    a, b, c = x[:-2], x[1:-1], x[2:]
    tp = int((((b > a) & (b > c)) | ((b < a) & (b < c))).sum())
    n = len(x)
    z = (tp - 2 * (n - 2) / 3) / np.sqrt((16 * n - 29) / 90)
    assert out["n_days"].iloc[0] == n
    assert out["turning_points"].iloc[0] == tp
    assert abs(out["expected"].iloc[0] - 2 * (n - 2) / 3) < 1e-6
    assert abs(out["z"].iloc[0] - z) < 1e-6


def test_sign_test(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    from math import comb

    out = QUERIES["q_sign_test"](SF).to_pandas()
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    ev["h"] = ev["ts"].dt.hour
    w0 = ev["w"].min()
    a = ev[ev["w"] == w0]["h"].value_counts().reindex(
        range(24), fill_value=0
    )
    b = ev[ev["w"] == w0 + 1]["h"].value_counts().reindex(
        range(24), fill_value=0
    )
    pos = int((b > a).sum())
    neg = int((b < a).sum())
    n, s = pos + neg, max(pos, neg)
    p = min(1.0, 2 * sum(comb(n, k) for k in range(s, n + 1)) / 2**n)
    assert out["n_pairs"].iloc[0] == n
    assert out["n_up"].iloc[0] == pos
    assert out["n_down"].iloc[0] == neg
    assert abs(out["p_two_sided"].iloc[0] - p) < 1e-6
    assert 0 < out["p_two_sided"].iloc[0] <= 1


def test_gk_lambda(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gk_lambda"](SF).to_pandas()
    ev = _events_pdf()
    ev["h"] = ev["ts"].dt.hour
    tab = pd.crosstab(ev["event_type"], ev["h"])
    n = tab.values.sum()
    mg = tab.sum(axis=1).max()
    mh = tab.max(axis=0).sum()
    assert out["n"].iloc[0] == n
    assert out["modal_global"].iloc[0] == mg
    assert out["sum_modal_by_hour"].iloc[0] == mh
    lam = (mh - mg) / (n - mg)
    assert abs(out["gk_lambda"].iloc[0] - lam) < 1e-6
    assert 0 <= out["gk_lambda"].iloc[0] <= 1


def test_cohens_h(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cohens_h"](SF).to_pandas()
    ev = _events_pdf()
    we = ev["ts"].dt.dayofweek >= 5
    isp = ev["event_type"] == "purchase"
    p0 = isp[~we].mean()
    p1 = isp[we].mean()
    h = 2 * np.arcsin(np.sqrt(p1)) - 2 * np.arcsin(np.sqrt(p0))
    assert out["n_weekday"].iloc[0] == (~we).sum()
    assert out["n_weekend"].iloc[0] == we.sum()
    assert abs(out["p_weekday"].iloc[0] - p0) < 1e-6
    assert abs(out["p_weekend"].iloc[0] - p1) < 1e-6
    assert abs(out["cohens_h"].iloc[0] - h) < 1e-6


def test_zero_inflation(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_zero_inflation"](SF).to_pandas()
    ev = _events_pdf()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    ev["h"] = ev["ts"].dt.hour
    cells = ev.groupby(["event_type", "h", "d"]).size()
    total = ev["event_type"].nunique() * 24 * ev["d"].nunique()
    zeros = total - len(cells)
    lam = len(ev) / total
    zi = 1 + np.log(zeros / total) / lam
    assert out["n_cells"].iloc[0] == total
    assert out["n_zero"].iloc[0] == zeros
    assert abs(out["lambda_hat"].iloc[0] - lam) < 1e-6
    assert abs(out["zero_inflation"].iloc[0] - zi) < 1e-5


def test_kuiper(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kuiper"](SF).to_pandas()
    ev = _events_pdf()
    c = ev["ts"].dt.hour.value_counts().reindex(range(24), fill_value=0)
    n = c.sum()
    cum = c.sort_index().cumsum().to_numpy(np.float64) / n
    u = np.arange(1, 25) / 24
    dp = max((cum - u).max(), 0)
    dm = max((u - cum).max(), 0)
    assert out["n"].iloc[0] == n
    assert abs(out["kuiper_v"].iloc[0] - (dp + dm)) < 1e-6
    # Kuiper V dominates the one-sided KS D
    assert out["kuiper_v"].iloc[0] >= max(dp, dm) - 1e-9


def test_geometric_median(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _GM_D, _GM_K
    import pyarrow.parquet as pq

    out = QUERIES["q_geometric_median"](SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    x = np.stack(
        [np.asarray(v, np.float64)[:_GM_D] for v in emb["embedding"]]
    )
    m = np.zeros(_GM_D)
    for _ in range(_GM_K):
        d = np.sqrt(((x - m) ** 2).sum(axis=1))
        w = 1 / d
        m = (w[:, None] * x).sum(0) / w.sum()
    assert out["n_points"].iloc[0] == len(x)
    for k in range(_GM_D):
        assert abs(out[f"gm_{k}"].iloc[0] - m[k]) < 1e-4
    # robust center stays inside the data's bounding box
    for k in range(_GM_D):
        assert x[:, k].min() <= out[f"gm_{k}"].iloc[0] <= x[:, k].max()


def test_letter_values(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    import pyarrow.parquet as pq

    out = QUERIES["q_letter_values"](SF).to_pandas().set_index("lang")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for l, g in docs.groupby("lang"):
        v = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(v)

        def pick(q):
            return v[int(np.ceil(q * n)) - 1]

        assert out.loc[l, "n"] == n
        assert out.loc[l, "median"] == pick(0.5)
        assert out.loc[l, "f_lower"] == pick(0.25)
        assert out.loc[l, "f_upper"] == pick(0.75)
        assert out.loc[l, "e_lower"] == pick(0.125)
        assert out.loc[l, "e_upper"] == pick(0.875)
        assert out.loc[l, "f_spread"] == pick(0.75) - pick(0.25)
        assert out.loc[l, "e_spread"] == pick(0.875) - pick(0.125)


def test_seasonal_mk(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_seasonal_mk"](SF).to_pandas()
    daily = _daily_counts()
    d = daily.index.to_numpy().astype("datetime64[D]").astype(np.int64)
    c = daily.to_numpy(np.int64)
    dow = (d + 3) % 7
    s_tot, var_tot = 0, 0
    for k in range(7):
        x = c[dow == k]
        n = len(x)
        if n < 2:
            continue
        for i in range(n - 1):
            s_tot += int(np.sign(x[i + 1 :] - x[i]).sum())
        var_tot += n * (n - 1) * (2 * n + 5) // 18
    z = (
        (s_tot - np.sign(s_tot)) / np.sqrt(var_tot) if s_tot != 0 else 0.0
    )
    assert out["s"].iloc[0] == s_tot
    assert out["var_s"].iloc[0] == var_tot
    assert abs(out["z"].iloc[0] - z) < 1e-6


def test_conversion_by_decile(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_conversion_by_decile"](SF).to_pandas()
    ev = _events_pdf()
    per = ev.groupby("user_id").agg(
        n=("event_type", "size"),
        k=("event_type", lambda s: int((s == "purchase").sum())),
    ).sort_values(["n", "k"]).reset_index(drop=True)
    n_users = len(per)
    base, rem = n_users // 10, n_users % 10
    i = 0
    for d in range(1, 11):
        size = base + (1 if d <= rem else 0)
        seg = per.iloc[i : i + size]
        i += size
        r = out[out["decile"] == d].iloc[0]
        assert r["n_users"] == size
        assert r["n_events"] == seg["n"].sum()
        assert r["n_purchases"] == seg["k"].sum()
        assert abs(r["conversion"] - seg["k"].sum() / seg["n"].sum()) < 1e-6
    assert out["n_users"].sum() == n_users


def test_spend_ramp(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_spend_ramp"](SF).to_pandas().set_index("age_week")
    ev = _events_pdf()
    ev["w"] = ev["ts"].values.astype("datetime64[D]").astype(np.int64) // 7
    raw = ev["value"].to_numpy() * 100
    ev["c"] = np.where(
        raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)
    ).astype(np.int64)
    first = ev.groupby("user_id")["w"].min().rename("fw")
    ev = ev.join(first, on="user_id")
    ev["age"] = ev["w"] - ev["fw"]
    for age, g in ev.groupby("age"):
        assert out.loc[age, "n_events"] == len(g)
        assert out.loc[age, "net_cents"] == g["c"].sum()
        assert abs(out.loc[age, "mean_cents"] - g["c"].mean()) < 1e-6
