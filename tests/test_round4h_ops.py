"""Round-4 continuation-8 ops: CUPED variance reduction, Pettitt
changepoint, Bartlett variance homogeneity — each checked against an
independent pandas/numpy recomputation at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _events_pdf(cols):
    return pq.read_table(f"{SF}/events.parquet", columns=cols).to_pandas()


def test_cuped(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cuped"](SF).to_pandas()
    df = _events_pdf(["user_id", "ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    bnd = (int(day.min()) + int(day.max()) + 1) // 2
    per = pd.DataFrame({"u": df["user_id"], "pre": (day < bnd).astype(int)})
    g = per.groupby("u")["pre"].agg(x="sum", n="size")
    x = g["x"].to_numpy(float)
    y = (g["n"] - g["x"]).to_numpy(float)
    arm = (g.index.to_numpy(np.int64) % 2).astype(int)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    rho = np.corrcoef(x, y)[0, 1]
    raw = y[arm == 1].mean() - y[arm == 0].mean()
    adj = raw - theta * (x[arm == 1].mean() - x[arm == 0].mean())
    assert out["n_users"].iloc[0] == len(g)
    assert abs(out["theta"].iloc[0] - theta) < 1e-5
    assert abs(out["diff_raw"].iloc[0] - raw) < 1e-5
    assert abs(out["diff_cuped"].iloc[0] - adj) < 1e-5
    assert abs(out["var_reduction"].iloc[0] - rho * rho) < 1e-5


def test_pettitt(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_pettitt"](SF).to_pandas()
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    c = pd.Series(day).value_counts().sort_index()
    x = c.to_numpy(float)
    n = len(x)
    # O(n^2) literal double-sum definition of U_t
    sgn = np.sign(x[:, None] - x[None, :])  # sgn(x_i - x_j), Pettitt 1979
    u = np.array(
        [sgn[: t + 1, t + 1 :].sum() for t in range(n - 1)]
    )
    k = int(np.abs(u).max())
    tstar = int(np.argmax(np.abs(u) == k))
    assert out["n_days"].iloc[0] == n
    assert out["k_stat"].iloc[0] == k
    assert out["u_at_cp"].iloc[0] == int(u[tstar])
    assert out["cp_day"].iloc[0] == int(c.index[tstar])
    p = min(1.0, 2.0 * np.exp(-6.0 * k * k / (n**3 + n**2)))
    assert abs(out["p_approx"].iloc[0] - p) < 1e-6


def test_bartlett(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bartlett_var"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "n_chars"]
    ).to_pandas()
    g = df.groupby("source")["n_chars"]
    ni = g.size().to_numpy(float)
    s2 = g.var(ddof=1).to_numpy(float)
    k, bign = len(ni), ni.sum()
    s2p = ((ni - 1) * s2).sum() / (bign - k)
    cfac = 1.0 + ((1.0 / (ni - 1)).sum() - 1.0 / (bign - k)) / (3 * (k - 1))
    t = ((bign - k) * np.log(s2p) - ((ni - 1) * np.log(s2)).sum()) / cfac
    assert out["k_groups"].iloc[0] == k
    assert out["n_total"].iloc[0] == int(bign)
    assert abs(out["s2_pooled"].iloc[0] - s2p) < 1e-3 * max(1.0, abs(s2p))
    assert abs(out["bartlett_t"].iloc[0] - t) < 1e-4 * max(1.0, abs(t))


def _votes_pdf():
    from ptrail_ray.functions.textstats import STOPWORDS

    df = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    out = []
    for s in df["text"].fillna(""):
        toks = s.split()
        nt = len(toks)
        if nt == 0:
            out.append(0)
            continue
        a = sum(1 for x in toks if x in STOPWORDS) / nt > 0.05
        b = len(s.encode()) == len(s)
        c = (sum(len(x) for x in toks) / nt) < 6
        out.append(int(a) + int(b) + int(c))
    return np.array(out)


def test_fleiss_kappa(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_fleiss_kappa"](SF).to_pandas()
    v = _votes_pdf()
    n, m = len(v), 3
    nij = np.stack([3 - v, v], axis=1)
    p_i = ((nij**2).sum(axis=1) - m) / (m * (m - 1))
    p_bar = p_i.mean()
    p_j = nij.sum(axis=0) / (n * m)
    p_e = (p_j**2).sum()
    kappa = (p_bar - p_e) / (1 - p_e)
    assert out["n_docs"].iloc[0] == n
    assert out["votes_en"].iloc[0] == int(v.sum())
    assert abs(out["p_bar"].iloc[0] - p_bar) < 1e-6
    assert abs(out["fleiss_kappa"].iloc[0] - kappa) < 1e-6


def test_krippendorff(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_krippendorff"](SF).to_pandas()
    v = _votes_pdf()
    n = 3 * len(v)
    u = int((v * (3 - v)).sum())
    c1 = int(v.sum())
    alpha = 1 - (n - 1) * u / (2 * c1 * (n - c1))
    assert out["n_values"].iloc[0] == n
    assert out["u_disagree"].iloc[0] == u
    assert abs(out["alpha"].iloc[0] - alpha) < 1e-6


def test_lin_ccc(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_lin_ccc"](SF).to_pandas()
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    ).to_pandas()
    li["y"] = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(np.int64)
    ls = li.groupby("l_orderkey", as_index=False)["y"].sum()
    j = o.merge(ls, left_on="o_orderkey", right_on="l_orderkey")
    x = np.round(j["o_totalprice"].to_numpy(float) * 100)
    y = j["y"].to_numpy(float)
    sxy = np.cov(x, y, bias=True)[0, 1]
    ccc = 2 * sxy / (x.var() + y.var() + (x.mean() - y.mean()) ** 2)
    r = np.corrcoef(x, y)[0, 1]
    assert out["n_orders"].iloc[0] == len(j)
    assert abs(out["ccc"].iloc[0] - ccc) < 1e-6
    assert abs(out["pearson_r"].iloc[0] - r) < 1e-6
    assert abs(out["c_b"].iloc[0] - ccc / r) < 1e-6


def _daily_counts():
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    return pd.Series(day).value_counts().sort_index().to_numpy(np.int64)


def test_garch_filter(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_garch_filter"](SF).to_pandas()
    y = _daily_counts()
    r = (y[1:] - y[:-1]).astype(float)
    m = len(r)
    h = (r**2).mean()
    hs = [h]
    for t in range(1, m):
        h = 2.0 + 0.05 * r[t - 1] ** 2 + 0.90 * h
        hs.append(h)
    assert out["n_obs"].iloc[0] == m
    assert abs(out["h_last"].iloc[0] - hs[-1]) < 1e-4 * max(1, abs(hs[-1]))
    assert abs(out["h_mean"].iloc[0] - np.mean(hs)) < 1e-4 * max(1, abs(np.mean(hs)))
    assert abs(out["z_last"].iloc[0] - r[-1] / np.sqrt(hs[-1])) < 1e-5


def test_riskmetrics_ewma(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_riskmetrics_ewma"](SF).to_pandas()
    y = _daily_counts()
    r = (y[1:] - y[:-1]).astype(float)
    s2 = r[0] ** 2
    br = 0
    for t in range(1, len(r)):
        if r[t] ** 2 > 4 * s2:
            br += 1
        s2 = 0.94 * s2 + 0.06 * r[t] ** 2
    assert out["n_obs"].iloc[0] == len(r)
    assert abs(out["vol_last"].iloc[0] - np.sqrt(s2)) < 1e-5 * max(1, np.sqrt(s2))
    assert out["breaches_2sigma"].iloc[0] == br


def test_kpss(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kpss"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    e = y - y.mean()
    s = np.cumsum(e)
    l = int(np.floor(4 * (n / 100.0) ** 0.25))
    lam = (e * e).sum()
    for j in range(1, l + 1):
        lam += 2 * (1 - j / (l + 1)) * (e[:-j] * e[j:]).sum()
    eta = (s**2).sum() / (n**2 * (lam / n))
    assert out["n_days"].iloc[0] == n
    assert out["lag_l"].iloc[0] == l
    assert abs(out["kpss_eta"].iloc[0] - eta) < 1e-5 * max(1, abs(eta))


def test_erlang_b(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_erlang_b"](SF).to_pandas()
    a = out["offered_a"].iloc[0]
    b = 1.0
    for k in range(1, 9):
        b = a * b / (k + a * b)
    assert abs(out["erlang_b"].iloc[0] - b) < 1e-5
    c = 8.0
    assert abs(out["erlang_c"].iloc[0] - c * b / (c - a * (1 - b))) < 1e-5
    assert a > 0 and 0 <= out["erlang_b"].iloc[0] <= 1


def test_crow_amsaa(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_crow_amsaa"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    us = df.loc[df["event_type"] == "error", "ts"].astype(
        "datetime64[us]"
    ).astype(np.int64)
    t0 = int(us.min()) - 3_600_000_000
    t_s = (int(us.max()) - t0) / 1e6
    ti = (us.to_numpy(np.int64) - t0) / 1e6
    n = len(ti)
    beta = n / np.log(t_s / ti).sum()
    assert out["n_failures"].iloc[0] == n
    assert abs(out["beta"].iloc[0] - beta) < 1e-4
    assert abs(out["mtbf_inst_s"].iloc[0] - t_s / (n * beta)) < 1e-2 * max(
        1, t_s / (n * beta)
    )


def test_mtbf_mttr(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mtbf_mttr"](SF).to_pandas()
    df = _events_pdf(["user_id", "ts", "event_id", "event_type"]).sort_values(
        ["user_id", "ts", "event_id"]
    )
    us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    gaps, recs = [], []
    n_err = 0
    for _, g in df.assign(us=us).groupby("user_id"):
        t = g["us"].to_numpy()
        err = (g["event_type"] == "error").to_numpy()
        n_err += int(err.sum())
        et = t[err]
        gaps.extend((et[1:] - et[:-1]).tolist())
        for i in np.where(err)[0]:
            after = np.where(~err[i + 1 :])[0]
            if len(after):
                recs.append(t[i + 1 + after[0]] - t[i])
    assert out["n_errors"].iloc[0] == n_err
    assert out["n_gaps"].iloc[0] == len(gaps)
    assert abs(out["mtbf_s"].iloc[0] - np.mean(gaps) / 1e6) < 1e-3
    assert out["n_recovered"].iloc[0] == len(recs)
    assert abs(out["mttr_s"].iloc[0] - np.mean(recs) / 1e6) < 1e-3


def test_risk_panel(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_risk_panel"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    we = ((day + 3) % 7 >= 5).to_numpy()
    pur = (df["event_type"] == "purchase").to_numpy()
    a, n1 = int((we & pur).sum()), int(we.sum())
    c, n0 = int((~we & pur).sum()), int((~we).sum())
    p1, p0 = a / n1, c / n0
    rr = p1 / p0
    se = np.sqrt(1 / a - 1 / n1 + 1 / c - 1 / n0)
    assert out["exp_purchases"].iloc[0] == a
    assert abs(out["risk_ratio"].iloc[0] - rr) < 1e-6
    assert abs(out["rr_lo95"].iloc[0] - np.exp(np.log(rr) - 1.96 * se)) < 1e-6
    assert abs(out["rr_hi95"].iloc[0] - np.exp(np.log(rr) + 1.96 * se)) < 1e-6
    assert abs(out["arf_exposed"].iloc[0] - (rr - 1) / rr) < 1e-6
    pbar = (a + c) / (n1 + n0)
    assert abs(out["paf"].iloc[0] - (pbar - p0) / pbar) < 1e-6
    assert abs(out["nnt"].iloc[0] - 1 / (p1 - p0)) < 1e-4 * abs(1 / (p1 - p0))


def test_snht(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_snht"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    s = y.std()  # population
    tks = []
    for k in range(1, n):
        z1 = (y[:k].mean() - y.mean()) / s
        z2 = (y[k:].mean() - y.mean()) / s
        tks.append(k * z1 * z1 + (n - k) * z2 * z2)
    tks = np.array(tks)
    assert out["n_days"].iloc[0] == n
    assert abs(out["t_max"].iloc[0] - tks.max()) < 1e-5 * max(1, tks.max())
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    days = np.sort(pd.Series(day).unique())
    assert out["split_day"].iloc[0] == days[int(tks.argmax())]


def test_buishand(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_buishand"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    sk = np.cumsum(y - y.mean())
    s = y.std()
    rn = (sk.max() - sk.min()) / (s * np.sqrt(n))
    qn = np.abs(sk).max() / (s * np.sqrt(n))
    assert abs(out["r_sqrt_n"].iloc[0] - rn) < 1e-5 * max(1, rn)
    assert abs(out["q_sqrt_n"].iloc[0] - qn) < 1e-5 * max(1, qn)


def test_keyness_dunning(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_keyness_dunning"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    focus = df["source"].min()
    from collections import Counter

    ca, cb = Counter(), Counter()
    for s, t in zip(df["source"], df["text"].fillna("")):
        (ca if s == focus else cb).update(t.split())
    c1, c2 = sum(ca.values()), sum(cb.values())
    rows = []
    for tok in set(ca) | set(cb):
        a, b = ca[tok], cb[tok]
        t = a + b
        g2 = 2 * (
            (a * np.log(a / (c1 * t / (c1 + c2))) if a else 0)
            + (b * np.log(b / (c2 * t / (c1 + c2))) if b else 0)
        )
        rows.append((round(g2 * 1e6), tok, a, b))
    rows.sort(key=lambda r: (-r[0], r[1]))
    top = rows[:15]
    assert len(out) == 15
    for i, (q, tok, a, b) in enumerate(top):
        assert out["token"].iloc[i] == tok
        assert out["cnt_focus"].iloc[i] == a
        assert out["cnt_rest"].iloc[i] == b
        assert abs(out["g2"].iloc[i] - q / 1e6) < 2e-6
        assert out["overused_in_focus"].iloc[i] == (a * c2 > b * c1)


def test_dagostino_k2(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_dagostino_k2"](SF).to_pandas()
    y = _daily_counts().astype(float)
    try:
        from scipy import stats as st  # noqa

        z1 = st.skewtest(y).statistic
        z2 = st.kurtosistest(y).statistic
        k2 = st.normaltest(y).statistic
        assert abs(out["z_skew"].iloc[0] - z1) < 1e-4
        assert abs(out["z_kurt"].iloc[0] - z2) < 1e-4
        assert abs(out["k2_omnibus"].iloc[0] - k2) < 1e-4
    except ImportError:
        n = len(y)
        m2 = ((y - y.mean()) ** 2).mean()
        m3 = ((y - y.mean()) ** 3).mean()
        g1 = m3 / m2**1.5
        yv = g1 * np.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
        b2 = (
            3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
            / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
        )
        w2 = -1 + np.sqrt(2 * (b2 - 1))
        z1 = (1 / np.sqrt(np.log(np.sqrt(w2)))) * np.log(
            yv / np.sqrt(2 / (w2 - 1))
            + np.sqrt((yv / np.sqrt(2 / (w2 - 1))) ** 2 + 1)
        )
        assert abs(out["z_skew"].iloc[0] - z1) < 1e-4
        assert abs(
            out["k2_omnibus"].iloc[0]
            - (out["z_skew"].iloc[0] ** 2 + out["z_kurt"].iloc[0] ** 2)
        ) < 1e-4


def test_kneser_ney(ray_session):
    from collections import Counter, defaultdict

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kneser_ney"](SF).to_pandas()
    df = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    cab = Counter()
    for t in df["text"].fillna(""):
        toks = t.split()
        cab.update(zip(toks[:-1], toks[1:]))
    c1 = defaultdict(int)
    n1f = defaultdict(int)
    n1b = defaultdict(int)
    for (a, b), c in cab.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    bt = len(cab)
    tt = sum(cab.values())
    d = 0.75
    h = 0.0
    for (a, b), c in cab.items():
        p = (c - d) / c1[a] + (d * n1f[a] / c1[a]) * (n1b[b] / bt)
        h -= c * np.log(p)
    h /= tt
    assert out["n_bigram_tokens"].iloc[0] == tt
    assert out["n_bigram_types"].iloc[0] == bt
    assert abs(out["cross_entropy_nats"].iloc[0] - h) < 1e-5
    assert abs(out["perplexity"].iloc[0] - np.exp(h)) < 1e-3 * np.exp(h)


def test_fisher_exact(ray_session):
    import math

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_fisher_exact"](SF).to_pandas()
    a, n1 = int(out["a_cell"].iloc[0]), int(out["n_exposed"].iloc[0])
    c, n0 = int(out["c_cell"].iloc[0]), int(out["n_unexposed"].iloc[0])
    n, c1 = n1 + n0, a + c

    def pmf(k):
        return math.exp(
            math.lgamma(n1 + 1) + math.lgamma(n0 + 1) + math.lgamma(c1 + 1)
            + math.lgamma(n - c1 + 1) - math.lgamma(n + 1)
            - math.lgamma(k + 1) - math.lgamma(n1 - k + 1)
            - math.lgamma(c1 - k + 1) - math.lgamma(n0 - c1 + k + 1)
        )

    klo, khi = max(0, c1 - n0), min(n1, c1)
    pa_ = pmf(a)
    two = sum(pmf(k) for k in range(klo, khi + 1) if pmf(k) <= pa_ * (1 + 1e-9))
    left = sum(pmf(k) for k in range(klo, a + 1))
    right = sum(pmf(k) for k in range(a, khi + 1))
    assert abs(out["p_two_sided"].iloc[0] - min(1, two)) < 1e-4
    assert abs(out["p_left"].iloc[0] - min(1, left)) < 1e-5
    assert abs(out["p_right"].iloc[0] - min(1, right)) < 1e-5


def test_bland_altman(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bland_altman"](SF).to_pandas()
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    ).to_pandas()
    li["y"] = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(np.int64)
    ls = li.groupby("l_orderkey", as_index=False)["y"].sum()
    j = o.merge(ls, left_on="o_orderkey", right_on="l_orderkey")
    d = np.round(j["o_totalprice"].to_numpy(float) * 100) - j["y"].to_numpy(float)
    lo = d.mean() - 1.96 * d.std(ddof=1)
    hi = d.mean() + 1.96 * d.std(ddof=1)
    assert out["n_orders"].iloc[0] == len(j)
    assert abs(out["mean_diff_cents"].iloc[0] - d.mean()) < 1e-3
    assert abs(out["loa_lo"].iloc[0] - lo) < 1e-2
    assert abs(out["loa_hi"].iloc[0] - hi) < 1e-2
    assert out["n_inside"].iloc[0] == int(((d >= lo) & (d <= hi)).sum())


def test_dixon_q(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_dixon_q"](SF).to_pandas()
    x = np.sort(_daily_counts())
    rng = x[-1] - x[0]
    assert out["x_min"].iloc[0] == x[0] and out["x_max"].iloc[0] == x[-1]
    assert abs(out["q_max"].iloc[0] - (x[-1] - x[-2]) / rng) < 1e-6
    assert abs(out["q_min"].iloc[0] - (x[1] - x[0]) / rng) < 1e-6


def test_gwet_ac1(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gwet_ac1"](SF).to_pandas()
    v = _votes_pdf()
    n, m = len(v), 3
    nij = np.stack([3 - v, v], axis=1)
    p_bar = (((nij**2).sum(axis=1) - m) / (m * (m - 1))).mean()
    pi = v.sum() / (3 * n)
    p_e = 2 * pi * (1 - pi)
    assert abs(out["p_bar"].iloc[0] - p_bar) < 1e-6
    assert abs(out["gwet_ac1"].iloc[0] - (p_bar - p_e) / (1 - p_e)) < 1e-6


def test_dickey_fuller(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_dickey_fuller"](SF).to_pandas()
    y = _daily_counts().astype(float)
    x = y[:-1]
    d = np.diff(y)
    m = len(x)
    X = np.column_stack([np.ones(m), x])
    beta, res, *_ = np.linalg.lstsq(X, d, rcond=None)
    alpha, rho = beta
    ssr = ((d - X @ beta) ** 2).sum()
    s2 = ssr / (m - 2)
    se = np.sqrt(s2 * m / (m * (x**2).sum() - x.sum() ** 2))
    assert out["n_pairs"].iloc[0] == m
    assert abs(out["rho"].iloc[0] - rho) < 1e-5
    assert abs(out["alpha"].iloc[0] - alpha) < 1e-3 * max(1, abs(alpha))
    assert abs(out["df_t"].iloc[0] - rho / se) < 1e-4


def test_page_hinkley(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_page_hinkley"](SF).to_pandas()
    y = _daily_counts().astype(float)
    xb, m, mmin, ph = y[0], 0.0, 0.0, 0.0
    for t in range(1, len(y)):
        xb = xb + (y[t] - xb) / (t + 1)
        m = m + (y[t] - xb)
        mmin = min(mmin, m)
        ph = max(ph, m - mmin)
    assert out["n_days"].iloc[0] == len(y)
    assert abs(out["ph_stat"].iloc[0] - ph) < 1e-5 * max(1, ph)


def _embed_xy():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    x = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    lab = t["label"].to_numpy().astype(np.int64)
    return x, lab


def test_mahalanobis_diag(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mahalanobis_diag"](SF).to_pandas()
    x, _ = _embed_xy()
    q = np.round(x * 1e9)
    mu = q.mean(axis=0)
    var = q.var(axis=0)
    d2 = (((q - mu) ** 2) / var).sum(axis=1)
    dim = x.shape[1]
    assert out["n_vecs"].iloc[0] == len(x)
    assert out["n_dims"].iloc[0] == dim
    assert abs(out["mean_d2"].iloc[0] - d2.mean()) < 1e-3 * d2.mean()
    assert abs(out["max_d2"].iloc[0] - d2.max()) < 1e-3 * d2.max()
    assert out["n_outliers"].iloc[0] == int((d2 > 2 * dim).sum())


def test_silhouette_centroid(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_silhouette_centroid"](SF).to_pandas()
    x, lab = _embed_xy()
    labels = np.unique(lab)
    mu = {lb: np.round(x[lab == lb] * 1e9).sum(axis=0) / 1e9 / (lab == lb).sum() for lb in labels}
    svals = []
    for i in range(len(x)):
        d = {lb: np.sqrt(((x[i] - mu[lb]) ** 2).sum()) for lb in labels}
        a = d[lab[i]]
        b = min(v for lb, v in d.items() if lb != lab[i])
        svals.append((b - a) / max(a, b))
    svals = np.array(svals)
    assert out["n_vecs"].iloc[0] == len(x)
    assert abs(out["mean_silhouette"].iloc[0] - svals.mean()) < 1e-4
    assert out["n_positive"].iloc[0] == int((np.round(svals * 1e9)) .__gt__(0).sum())


def test_breslow_day(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_breslow_day"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    hr = df["ts"].astype("datetime64[ns]").astype(np.int64) // 3_600_000_000_000
    hod = (hr % 24).to_numpy()
    we = ((hr // 24 + 3) % 7 >= 5).to_numpy()
    pur = (df["event_type"] == "purchase").to_numpy()
    num = den = 0.0
    strata = []
    for h in range(24):
        m = hod == h
        a = int((m & we & pur).sum())
        n1 = int((m & we).sum())
        c = int((m & ~we & pur).sum())
        n0 = int((m & ~we).sum())
        nt = n1 + n0
        num += a * (n0 - c) / nt
        den += (n1 - a) * c / nt
        strata.append((a, n1, c, n0))
    psi = num / den
    chi2 = 0.0
    for a, n1, c, n0 in strata:
        m1 = a + c
        A, B, C = 1 - psi, (n0 - m1) + psi * (n1 + m1), -psi * n1 * m1
        sq = np.sqrt(B * B - 4 * A * C)
        x1, x2 = (-B + sq) / (2 * A), (-B - sq) / (2 * A)
        x = x1 if (0 < x1 < min(n1, m1) and n0 - m1 + x1 > 0) else x2
        v = 1 / x + 1 / (n1 - x) + 1 / (m1 - x) + 1 / (n0 - m1 + x)
        chi2 += (a - x) ** 2 * v
    assert out["n_strata"].iloc[0] == 24
    assert abs(out["or_mh"].iloc[0] - psi) < 1e-4
    assert abs(out["bd_chi2"].iloc[0] - chi2) < 1e-3 * max(1, chi2)


def test_poisson_ratio(ray_session):
    import math

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_poisson_ratio_test"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    obs = np.sort(pd.Series(day).unique())
    t1 = int(((obs + 3) % 7 >= 5).sum())
    t0 = len(obs) - t1
    pd_ = day[(df["event_type"] == "purchase").to_numpy()]
    k1 = int((((pd_ + 3) % 7) >= 5).sum())
    k0 = len(pd_) - k1
    k = k1 + k0
    p0 = t1 / (t1 + t0)

    def logpmf(j):
        return (
            math.lgamma(k + 1) - math.lgamma(j + 1) - math.lgamma(k - j + 1)
            + j * math.log(p0) + (k - j) * math.log(1 - p0)
        )

    la = logpmf(k1)
    two = sum(
        math.exp(logpmf(j)) for j in range(k + 1) if logpmf(j) <= la + 1e-9
    )
    assert out["k_weekend"].iloc[0] == k1
    assert out["t_weekend_days"].iloc[0] == t1
    assert abs(out["rate_ratio"].iloc[0] - (k1 / t1) / (k0 / t0)) < 1e-5
    assert abs(out["p_two_sided"].iloc[0] - min(1, two)) < 1e-4


def test_bh_fdr(ray_session):
    import math

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bh_fdr"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    hr = df["ts"].astype("datetime64[ns]").astype(np.int64) // 3_600_000_000_000
    hod = (hr % 24).to_numpy()
    pur = (df["event_type"] == "purchase").to_numpy()
    bign = len(df)
    bigk = int(pur.sum())
    ps = []
    for h in range(24):
        nh = int((hod == h).sum())
        kh = int((pur & (hod == h)).sum())
        ph = nh / bign
        lg = [
            math.lgamma(bigk + 1) - math.lgamma(j + 1)
            - math.lgamma(bigk - j + 1) + j * math.log(ph)
            + (bigk - j) * math.log(1 - ph)
            for j in range(bigk + 1)
        ]
        la = lg[kh]
        p = min(1.0, sum(math.exp(v) for v in lg if v <= la + 1e-9))
        ps.append(p)
    ps.sort()
    n_rej = 0
    for i, p in enumerate(ps, start=1):
        if p <= i * 0.05 / 24:
            n_rej = i
    assert out["m_tests"].iloc[0] == 24
    assert out["n_rejected"].iloc[0] == n_rej
    assert abs(out["min_p"].iloc[0] - ps[0]) < 1e-4
    assert abs(out["median_p"].iloc[0] - (ps[11] + ps[12]) / 2) < 1e-4


def _fl_matrix_pdf():
    df = _events_pdf(["user_id", "ts", "event_id", "event_type"]).sort_values(
        ["user_id", "ts", "event_id"]
    )
    cat = np.where(
        df["event_type"].isin(["click", "view"]),
        0,
        np.where(df["event_type"].isin(["purchase", "signup"]), 1, 2),
    )
    g = df.assign(c=cat).groupby("user_id")["c"]
    m = np.zeros((3, 3), np.int64)
    for f, l in zip(g.first(), g.last()):
        m[f, l] += 1
    return m


def test_stuart_maxwell(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_stuart_maxwell"](SF).to_pandas()
    m = _fl_matrix_pdf()
    r, c = m.sum(1), m.sum(0)
    d = (r - c)[:2].astype(float)
    V = np.array(
        [
            [r[0] + c[0] - 2 * m[0, 0], -(m[0, 1] + m[1, 0])],
            [-(m[0, 1] + m[1, 0]), r[1] + c[1] - 2 * m[1, 1]],
        ],
        float,
    )
    chi2 = d @ np.linalg.inv(V) @ d
    assert out["n_users"].iloc[0] == m.sum()
    assert out["d_browse"].iloc[0] == r[0] - c[0]
    assert abs(out["sm_chi2"].iloc[0] - chi2) < 1e-5 * max(1, chi2)


def test_bowker(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bowker"](SF).to_pandas()
    m = _fl_matrix_pdf()
    chi2 = sum(
        (m[i, j] - m[j, i]) ** 2 / (m[i, j] + m[j, i])
        for i in range(3)
        for j in range(i + 1, 3)
        if m[i, j] + m[j, i] > 0
    )
    assert abs(out["bowker_chi2"].iloc[0] - chi2) < 1e-5 * max(1, chi2)


def test_cohen_kappa_fl(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cohen_kappa_fl"](SF).to_pandas()
    m = _fl_matrix_pdf()
    n = m.sum()
    po = np.trace(m) / n
    pe = (m.sum(1) * m.sum(0)).sum() / n**2
    assert abs(out["cohen_kappa"].iloc[0] - (po - pe) / (1 - pe)) < 1e-6


def test_cronbach_alpha(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cronbach_alpha"](SF).to_pandas()
    import ray

    from ptrail_ray.sources.transcripts import derive_from_events

    df = derive_from_events(SF).to_pandas()
    per = df.groupby("conv_id")["role"].agg(
        x0=lambda s: (s == "user").sum(),
        x1=lambda s: (s == "assistant").sum(),
        x2=lambda s: (s == "tool").sum(),
    )
    items = per.to_numpy(float)
    k = 3
    svar = items.var(axis=0, ddof=1).sum()
    tvar = items.sum(axis=1).var(ddof=1)
    alpha = k / (k - 1) * (1 - svar / tvar)
    assert out["n_convs"].iloc[0] == len(per)
    assert abs(out["cronbach_alpha"].iloc[0] - alpha) < 1e-6


def test_ksample_ad(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ksample_ad"](SF).to_pandas()
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    cnt = pd.Series(day).value_counts().sort_index()
    z = cnt.to_numpy(float)
    we = ((cnt.index.to_numpy(np.int64) + 3) % 7 >= 5)
    try:
        from scipy.stats import anderson_ksamp

        res = anderson_ksamp([z[we], z[~we]], midrank=True)
        assert abs(out["ad_k2"].iloc[0] - res.statistic * 1.0) < 10  # stat is standardized in scipy
    except ImportError:
        pass
    # literal Scholz-Stephens A2akN recomputation
    samples = [z[we], z[~we]]
    N = len(z)
    zs = np.sort(np.unique(z))
    lj = np.array([(z == v).sum() for v in zs], float)
    Bj = np.cumsum(lj) - lj / 2
    a2 = 0.0
    for xs in samples:
        ni = len(xs)
        fij = np.array([(xs == v).sum() for v in zs], float)
        Mij = np.cumsum(fij) - fij / 2
        den = Bj * (N - Bj) - N * lj / 4
        ok = den != 0
        inner = (lj[ok] / N) * (N * Mij[ok] - ni * Bj[ok]) ** 2 / den[ok]
        a2 += inner.sum() / ni
    a2 *= (N - 1) / N
    assert out["n_days"].iloc[0] == N
    assert abs(out["ad_k2"].iloc[0] - a2) < 1e-4 * max(1, a2)


def test_gopher_census(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gopher_census"](SF).to_pandas()
    df = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    req = {"the", "be", "to", "of", "and", "that", "have", "with"}
    fails = np.zeros(7, int)
    npass = 0
    for s in df["text"].fillna(""):
        toks = s.split()
        nw = len(toks)
        tokchars = sum(len(x) for x in toks)
        nalpha = sum(1 for x in toks if any(c.isascii() and c.isalpha() for c in x))
        nreq = len(req & set(toks))
        nsym = s.count("#") + s.count("...")
        lines = s.split("\n")
        nbul = sum(1 for l in lines if l.startswith("-") or l.startswith("•"))
        nell = sum(1 for l in lines if l.endswith("..."))
        r = [
            nw < 50 or nw > 100_000,
            not (3 * nw <= tokchars <= 10 * nw),
            10 * nsym > nw,
            10 * nbul > 9 * len(lines),
            10 * nell > 3 * len(lines),
            5 * nalpha < 4 * nw,
            nreq < 2,
        ]
        fails += np.array(r, int)
        npass += not any(r)
    assert out["n_docs"].iloc[0] == len(df)
    for i in range(7):
        assert out[f"fail_r{i + 1}"].iloc[0] == fails[i], f"rule {i + 1}"
    assert out["n_pass_all"].iloc[0] == npass


def test_c4_census(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_c4_census"](SF).to_pandas()
    df = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    nb = nl = n3 = nlines = nkept = nclean = 0
    for s in df["text"].fillna(""):
        brace = "{" in s
        lorem = "lorem ipsum" in s.lower()
        nsent = s.count(".") + s.count("!") + s.count("?")
        nb += brace
        nl += lorem
        n3 += nsent < 3
        nclean += not brace and not lorem and nsent >= 3
        for line in s.split("\n"):
            nlines += 1
            if line.endswith((".", "!", "?", '"')) and len(line.split()) >= 5:
                nkept += 1
    assert out["n_brace"].iloc[0] == nb
    assert out["n_lorem"].iloc[0] == nl
    assert out["n_lt3_sent"].iloc[0] == n3
    assert out["n_lines"].iloc[0] == nlines
    assert out["n_lines_kept"].iloc[0] == nkept
    assert out["n_docs_clean"].iloc[0] == nclean


def test_dsir_select(ray_session):
    import hashlib
    from collections import Counter, defaultdict

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_dsir_select"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pandas()
    focus = df["source"].min()
    B = 1024

    def buckets(s):
        toks = s.split()
        return [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16) % B
            for a, b in zip(toks[:-1], toks[1:])
        ]

    tc, rc = Counter(), Counter()
    per_doc = {}
    for did, src, txt in zip(df["doc_id"], df["source"], df["text"].fillna("")):
        bs = buckets(txt)
        per_doc[did] = (src == focus, bs)
        (tc if src == focus else rc).update(bs)
    tt, rr = sum(tc.values()), sum(rc.values())
    dq = {
        b: round(
            1e6
            * (
                np.log((tc[b] + 1) / (tt + B))
                - np.log((rc[b] + 1) / (rr + B))
            )
        )
        for b in range(B)
    }
    scores = [
        (sum(dq[b] for b in bs), did)
        for did, (ist, bs) in per_doc.items()
        if not ist and bs
    ]
    scores.sort(key=lambda x: (-x[0], x[1]))
    top = scores[:10]
    assert list(out["doc_id"]) == [d for _, d in top]
    for (q, _), w in zip(top, out["dsir_logw"]):
        assert abs(w - q / 1e6) < 2e-6


def test_mw_effect_sizes(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mw_effect_sizes"](SF).to_pandas()
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    cnt = pd.Series(day).value_counts().sort_index()
    v = cnt.to_numpy(float)
    we = (cnt.index.to_numpy(np.int64) + 3) % 7 >= 5
    ranks = pd.Series(v).rank(method="average").to_numpy()
    n1, n0 = int(we.sum()), int((~we).sum())
    r1 = ranks[we].sum()
    u1 = r1 - n1 * (n1 + 1) / 2
    assert out["n_weekend"].iloc[0] == n1
    assert out["u2"].iloc[0] == int(round(2 * u1))
    assert abs(out["rank_biserial"].iloc[0] - (1 - 2 * u1 / (n1 * n0))) < 1e-6
    assert abs(out["common_language"].iloc[0] - u1 / (n1 * n0)) < 1e-6


def test_kw_dow_effects(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kw_dow_effects"](SF).to_pandas()
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    cnt = pd.Series(day).value_counts().sort_index()
    v = cnt.to_numpy(float)
    g = (cnt.index.to_numpy(np.int64) + 3) % 7
    ranks = pd.Series(v).rank(method="average").to_numpy()
    n = len(v)
    k = len(np.unique(g))
    s = sum(ranks[g == j].sum() ** 2 / (g == j).sum() for j in np.unique(g))
    _, t = np.unique(v, return_counts=True)
    cfac = 1 - (t**3 - t).sum() / (n**3 - n)
    h = ((12 / (n * (n + 1))) * s - 3 * (n + 1)) / cfac
    assert out["n_days"].iloc[0] == n
    assert out["k_groups"].iloc[0] == k
    assert abs(out["kw_h"].iloc[0] - h) < 1e-4
    assert abs(out["eta2_h"].iloc[0] - (h - k + 1) / (n - k)) < 1e-5
    assert abs(out["epsilon2"].iloc[0] - h * (n + 1) / (n**2 - 1)) < 1e-5


def test_hits(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _tool_transition_matrix

    out = QUERIES["q_hits"](SF).to_pandas().sort_values("state")
    A = _tool_transition_matrix(SF).astype(float)
    h = np.ones(A.shape[0])
    for _ in range(200):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    # fixed-point integer iteration should land within rounding noise
    got_a = out["authority"].to_numpy()
    got_h = out["hub"].to_numpy()
    states = out["state"].tolist()
    names = [""] + [f"tool-{i}" for i in range(7)]
    idx = [names.index(s) for s in states]
    assert np.allclose(got_a, a[idx], atol=5e-3)
    assert np.allclose(got_h, h[idx], atol=5e-3)
    assert abs(got_a.sum() - 1.0) < 1e-3 and abs(got_h.sum() - 1.0) < 1e-3


def test_brunner_munzel(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_brunner_munzel"](SF).to_pandas()
    y_all = _daily_counts().astype(float)
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    days = np.sort(pd.Series(day).unique())
    we = (days + 3) % 7 >= 5
    x, y = y_all[~we], y_all[we]
    try:
        from scipy.stats import brunnermunzel

        res = brunnermunzel(x, y)
        assert abs(out["w_bm"].iloc[0] - res.statistic) < 1e-4
    except ImportError:
        pass
    # literal recomputation (Brunner & Munzel 2000)
    nx, ny = len(x), len(y)
    pooled = np.concatenate([x, y])
    rc = pd.Series(pooled).rank(method="average").to_numpy()
    rcx, rcy = rc[:nx], rc[nx:]
    rix = pd.Series(x).rank(method="average").to_numpy()
    riy = pd.Series(y).rank(method="average").to_numpy()
    sx2 = ((rcx - rix - rcx.mean() + (nx + 1) / 2) ** 2).sum() / (nx - 1)
    sy2 = ((rcy - riy - rcy.mean() + (ny + 1) / 2) ** 2).sum() / (ny - 1)
    w = nx * ny * (rcy.mean() - rcx.mean()) / (
        (nx + ny) * np.sqrt(nx * sx2 + ny * sy2)
    )
    p_hat = (rcy.mean() - (ny + 1) / 2) / nx
    assert out["n_weekday"].iloc[0] == nx
    assert abs(out["p_hat"].iloc[0] - p_hat) < 1e-6
    assert abs(out["w_bm"].iloc[0] - w) < 1e-5


def test_welch_anova(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_welch_anova"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "n_chars"]
    ).to_pandas()
    g = df.groupby("source")["n_chars"]
    n = g.size().to_numpy(float)
    m = g.mean().to_numpy(float)
    s2 = g.var(ddof=1).to_numpy(float)
    w = n / s2
    W = w.sum()
    xw = (w * m).sum() / W
    k = len(n)
    num = (w * (m - xw) ** 2).sum() / (k - 1)
    den = 1 + 2 * (k - 2) / (k**2 - 1) * ((1 - w / W) ** 2 / (n - 1)).sum()
    assert out["k_groups"].iloc[0] == k
    assert abs(out["welch_f"].iloc[0] - num / den) < 1e-4 * max(1, num / den)


def test_dunn_and_conover(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    dz = QUERIES["q_dunn_posthoc"](SF).to_pandas()
    ct = QUERIES["q_conover_iman"](SF).to_pandas()
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    cnt = pd.Series(day).value_counts().sort_index()
    v = cnt.to_numpy(float)
    g = ((cnt.index.to_numpy(np.int64) + 3) % 7).astype(int)
    r = pd.Series(v).rank(method="average").to_numpy()
    n = len(v)
    k = 7
    _, t = np.unique(v, return_counts=True)
    tie = float((t.astype(float) ** 3 - t).sum())
    sig = n * (n + 1) / 12 - tie / (12 * (n - 1))
    s = sum(r[g == j].sum() ** 2 / (g == j).sum() for j in range(k))
    cfac = 1 - tie / (n**3 - n)
    h = ((12 / (n * (n + 1))) * s - 3 * (n + 1)) / cfac
    s2 = ((r**2).sum() - n * (n + 1) ** 2 / 4) / (n - 1)
    factor = s2 * (n - 1 - h) / (n - k)
    row = 0
    for i in range(k):
        for j in range(i + 1, k):
            ni, nj_ = (g == i).sum(), (g == j).sum()
            rd = r[g == i].mean() - r[g == j].mean()
            z = rd / np.sqrt(sig * (1 / ni + 1 / nj_))
            t_ = rd / np.sqrt(factor * (1 / ni + 1 / nj_))
            assert dz["dow_a"].iloc[row] == i and dz["dow_b"].iloc[row] == j
            assert abs(dz["dunn_z"].iloc[row] - z) < 1e-5
            assert abs(ct["ci_t"].iloc[row] - t_) < 1e-4
            row += 1


def test_smape_naive(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_smape_naive"](SF).to_pandas()
    y = _daily_counts().astype(float)
    a, f = y[7:], y[:-7]
    e = np.abs(a - f)
    assert out["n_fc"].iloc[0] == len(a)
    assert abs(out["smape"].iloc[0] - (2 * e / (a + f)).mean()) < 1e-6
    assert abs(out["mape"].iloc[0] - (e / a).mean()) < 1e-6
    ape = np.sort(e / a)
    assert abs(out["mdape"].iloc[0] - ape[(len(a) - 1) // 2]) < 1e-6


def test_pinball_loss(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_pinball_loss"](SF).to_pandas()
    y = _daily_counts()
    h = len(y) // 2
    train = np.sort(y[:h])
    test = y[h:].astype(float)
    for tau, name in ((0.1, "q10"), (0.5, "q50"), (0.9, "q90")):
        q = train[min(int(tau * 10) * h // 10, h - 1)]
        assert out[f"{name}_value"].iloc[0] == q
        loss = np.maximum(tau * (test - q), (tau - 1) * (test - q)).mean()
        assert abs(out[f"{name}_loss"].iloc[0] - loss) < 1e-6


def test_tracking_signal(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tracking_signal"](SF).to_pandas()
    y = _daily_counts().astype(float)
    e = y[7:] - y[:-7]
    assert out["cum_error"].iloc[0] == int(e.sum())
    assert abs(out["mad"].iloc[0] - np.abs(e).mean()) < 1e-6
    assert abs(
        out["tracking_signal"].iloc[0] - e.sum() / np.abs(e).mean()
    ) < 1e-5


def test_abc_xyz(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_abc_xyz"](SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_shipdate"],
    ).to_pandas()
    wk = li["l_shipdate"].astype("datetime64[us]").astype(np.int64) // (
        7 * 86_400_000_000
    )
    qty = np.round(li["l_quantity"]).astype(np.int64)
    g = (
        pd.DataFrame({"p": li["l_partkey"], "w": wk, "q": qty})
        .groupby(["p", "w"], as_index=False)["q"]
        .sum()
    )
    per = g.groupby("p")["q"].agg(
        s="sum", qsq=lambda x: int((x.astype(object) ** 2).sum()), k="size"
    )
    s, qsq, k = (
        per["s"].to_numpy(np.int64),
        per["qsq"].to_numpy(np.int64),
        per["k"].to_numpy(np.int64),
    )
    varn = k * qsq - s * s
    cls = np.where(4 * varn < s * s, "X", np.where(varn < s * s, "Y", "Z"))
    exp = (
        pd.DataFrame({"c": cls, "s": s})
        .groupby("c")
        .agg(n=("s", "size"), q=("s", "sum"))
    )
    got = out.set_index("xyz_class")
    for c in exp.index:
        assert got.loc[c, "n_parts"] == exp.loc[c, "n"]
        assert got.loc[c, "total_qty"] == exp.loc[c, "q"]
    assert len(got) == len(exp)


def test_tornqvist_walsh(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tornqvist_walsh"](SF).to_pandas()
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    o["half"] = (o["o_orderdate"].dt.day > 15).astype(int)
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["e"] = np.round(j["l_extendedprice"] * 100).astype(np.int64)
    j["q"] = j["l_quantity"].astype(np.int64)
    per = j.groupby(["l_partkey", "half"], as_index=False)[["q", "e"]].sum()
    piv = per.pivot_table(
        index="l_partkey", columns="half", values=["q", "e"], fill_value=0
    )
    both = piv[("q", 0)].gt(0) & piv[("q", 1)].gt(0)
    q0 = piv.loc[both, ("q", 0)].to_numpy(float)
    q1 = piv.loc[both, ("q", 1)].to_numpy(float)
    e0 = piv.loc[both, ("e", 0)].to_numpy(float)
    e1 = piv.loc[both, ("e", 1)].to_numpy(float)
    w = (e0 / e0.sum() + e1 / e1.sum()) / 2
    torn = np.exp((w * np.log((e1 / q1) / (e0 / q0))).sum())
    walsh = ((e1 / q1) * np.sqrt(q0 * q1)).sum() / (
        (e0 / q0) * np.sqrt(q0 * q1)
    ).sum()
    assert out["n_parts"].iloc[0] == int(both.sum())
    assert abs(out["tornqvist"].iloc[0] - torn) < 1e-5
    assert abs(out["walsh"].iloc[0] - walsh) < 1e-5


def test_event_study(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_event_study"](SF).to_pandas()
    df = _events_pdf(["user_id", "ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    d = pd.DataFrame(
        {"u": df["user_id"], "day": day, "pur": df["event_type"] == "purchase"}
    )
    t0 = d[d["pur"]].groupby("u")["day"].min()
    dj = d.join(t0.rename("t0"), on="u", how="inner")
    r = (dj["day"] - dj["t0"]).to_numpy()
    assert out["n_users"].iloc[0] == len(t0)
    for i, rel in enumerate(range(-7, 8)):
        n = int((r == rel).sum())
        assert out["rel_day"].iloc[i] == rel
        assert out["n_events"].iloc[i] == n
        assert abs(out["mean_per_user"].iloc[i] - n / len(t0)) < 1e-6


def test_did(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_did"](SF).to_pandas()
    df = _events_pdf(["user_id", "ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    bnd = (int(day.min()) + int(day.max()) + 1) // 2
    treat = (df["user_id"] % 2 == 1).to_numpy()
    pre = (day < bnd).to_numpy()
    nt = df.loc[treat, "user_id"].nunique()
    nc = df.loc[~treat, "user_id"].nunique()
    tp = (treat & pre).sum() / nt
    tq = (treat & ~pre).sum() / nt
    cp = (~treat & pre).sum() / nc
    cq = (~treat & ~pre).sum() / nc
    assert out["n_treat_users"].iloc[0] == nt
    assert out["n_ctrl_users"].iloc[0] == nc
    assert abs(out["did_estimate"].iloc[0] - ((tq - tp) - (cq - cp))) < 1e-5
    assert abs(out["pre_period_gap"].iloc[0] - (tp - cp)) < 1e-5


def _hod_cells():
    df = _events_pdf(["ts", "event_type"])
    hr = df["ts"].astype("datetime64[ns]").astype(np.int64) // 3_600_000_000_000
    hod = (hr % 24).to_numpy()
    we = ((hr // 24 + 3) % 7 >= 5).to_numpy()
    pur = (df["event_type"] == "purchase").to_numpy()
    cells = []
    for h in range(24):
        m = hod == h
        cells.append(
            (
                int((m & we & pur).sum()),
                int((m & we).sum()),
                int((m & ~we & pur).sum()),
                int((m & ~we).sum()),
            )
        )
    return cells


def test_cmh_test(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cmh_test"](SF).to_pandas()
    s = v = 0.0
    for a, n1, c, n0 in _hod_cells():
        nn, m1 = n1 + n0, a + c
        m0 = nn - m1
        s += a - n1 * m1 / nn
        v += n1 * n0 * m1 * m0 / (nn * nn * (nn - 1))
    chi2 = (abs(s) - 0.5) ** 2 / v
    assert abs(out["sum_a_minus_e"].iloc[0] - s) < 1e-4
    assert abs(out["cmh_chi2"].iloc[0] - chi2) < 1e-3 * max(1, chi2)


def test_oaxaca_threefold(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_oaxaca_threefold"](SF).to_pandas()
    cells = _hod_cells()
    nw = sum(c[1] for c in cells)
    nd = sum(c[3] for c in cells)
    e = c_ = i = 0.0
    for a, n1, c0, n0 in cells:
        w1, w0 = n1 / nw, n0 / nd
        r1, r0 = a / n1, c0 / n0
        e += (w1 - w0) * r0
        c_ += w0 * (r1 - r0)
        i += (w1 - w0) * (r1 - r0)
    delta = sum(c[0] for c in cells) / nw - sum(c[2] for c in cells) / nd
    assert abs(out["delta"].iloc[0] - delta) < 1e-6
    assert abs(out["endowment"].iloc[0] - e) < 1e-6
    assert abs(out["coefficients"].iloc[0] - c_) < 1e-6
    assert abs(out["interaction"].iloc[0] - i) < 1e-6
    total = (
        out["endowment"].iloc[0]
        + out["coefficients"].iloc[0]
        + out["interaction"].iloc[0]
    )
    assert abs(total - out["delta"].iloc[0]) < 5e-6


def test_spectral_entropy(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_spectral_entropy"](SF).to_pandas()
    df = _events_pdf(["ts"])
    hr = df["ts"].astype("datetime64[ns]").astype(np.int64) // 3_600_000_000_000
    x = pd.Series(hr).value_counts().sort_index().to_numpy(float)
    n = len(x)
    fft = np.fft.rfft(x)
    p = (np.abs(fft[1:13]) ** 2) / n
    pk = p / p.sum()
    h = -(pk * np.log(pk)).sum() / np.log(12)
    assert out["n_hours"].iloc[0] == n
    assert abs(out["spectral_entropy"].iloc[0] - h) < 1e-4


def test_lid_estimate(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_lid_estimate"](SF).to_pandas()
    x, _ = _embed_xy()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])
    vid = t["vec_id"].to_numpy()
    k = 16
    for _, row in out.iterrows():
        a = int(row["anchor_id"])
        ai = int(np.where(vid == a)[0][0])
        d = np.sqrt(((x - x[ai]) ** 2).sum(axis=1))
        d = np.delete(d, ai)
        d.sort()
        r = d[:k]
        lid = -1.0 / (np.log(r / r[-1]).mean())
        assert abs(row["lid"] - lid) < 1e-3 * max(1, abs(lid))


def test_kneedle(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kneedle"](SF).to_pandas()
    y = _daily_counts().astype(np.int64)
    cum = np.cumsum(y)
    n = len(y)
    k = np.arange(1, n + 1)
    dk = (cum[-1] - cum[0]) * (k - 1) - (n - 1) * (cum - cum[0])
    kk = int(np.argmax(dk)) + 1
    assert out["knee_k"].iloc[0] == kk
    assert abs(out["cum_share"].iloc[0] - cum[kk - 1] / cum[-1]) < 1e-6


def test_bradford_zones(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bradford_zones"](SF).to_pandas()
    df = pq.read_table(f"{SF}/documents.parquet", columns=["source"]).to_pandas()
    g = df.groupby("source").size().sort_values(ascending=False)
    g = g.reset_index().sort_values([0, "source"], ascending=[False, True])
    n = g[0].to_numpy(np.int64)
    total = n.sum()
    cum = np.cumsum(n)
    zone = np.minimum(2, 3 * (cum - 1) // total)
    assert out["n_docs"].sum() == total
    for z in range(3):
        assert out["n_sources"].iloc[z] == int((zone == z).sum())
        assert out["n_docs"].iloc[z] == int(n[zone == z].sum())


def test_hhi_nation_rev(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hhi_nation_rev"](SF).to_pandas()
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    c = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    n = pq.read_table(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.round(j["o_totalprice"] * 100).astype(np.int64)
    per = j.groupby("c_nationkey")["cents"].sum()
    sh = per / per.sum()
    hhi = (sh**2).sum()
    assert out["n_nations"].iloc[0] == len(per)
    assert abs(out["hhi"].iloc[0] - hhi) < 1e-6
    assert abs(out["effective_nations"].iloc[0] - 1 / hhi) < 1e-4
    topk = per.sort_values(ascending=False).index[0]
    assert out["top_nation"].iloc[0] == n.set_index("n_nationkey").loc[topk, "n_name"]


def test_modularity_split(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _tool_transition_matrix

    out = QUERIES["q_modularity_split"](SF).to_pandas()
    A = _tool_transition_matrix(SF).astype(float)
    comm = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    w = A.sum()
    q = 0.0
    for c in (0, 1):
        sel = comm == c
        q += A[np.ix_(sel, sel)].sum() / w - (
            A[sel, :].sum() / w
        ) * (A[:, sel].sum() / w)
    assert out["total_weight"].iloc[0] == int(w)
    assert abs(out["modularity"].iloc[0] - q) < 1e-6


def test_leading_indicator(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_leading_indicator"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    piv = (
        pd.DataFrame({"d": day, "t": df["event_type"]})
        .groupby(["d", "t"])
        .size()
        .unstack(fill_value=0)
        .sort_index()
    )
    pur = piv["purchase"].to_numpy(float)
    row = 0
    for typ in sorted(c for c in piv.columns if c != "purchase"):
        xf = piv[typ].to_numpy(float)
        for lag in (1, 2, 3):
            r = np.corrcoef(xf[:-lag], pur[lag:])[0, 1]
            assert out["event_type"].iloc[row] == typ
            assert out["lead_days"].iloc[row] == lag
            assert abs(out["pearson_r"].iloc[row] - r) < 1e-6
            row += 1


def test_match_att(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_match_att"](SF).to_pandas()
    df = _events_pdf(["user_id", "ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    bnd = (int(day.min()) + int(day.max()) + 1) // 2
    g = (
        pd.DataFrame({"u": df["user_id"], "pre": (day < bnd).astype(int)})
        .groupby("u")["pre"]
        .agg(x="sum", n="size")
    )
    g["y"] = g["n"] - g["x"]
    g = g.reset_index()
    tr = g[g["u"] % 2 == 1]
    ct = g[g["u"] % 2 == 0]
    diffs, dists = [], []
    for _, t in tr.iterrows():
        cand = ct.assign(d=(ct["x"] - t["x"]).abs()).sort_values(["d", "u"])
        best = cand.iloc[0]
        diffs.append(t["y"] - best["y"])
        dists.append(best["d"])
    assert out["n_treated"].iloc[0] == len(tr)
    assert out["n_controls"].iloc[0] == len(ct)
    assert abs(out["att"].iloc[0] - np.mean(diffs)) < 1e-6
    assert abs(out["mean_match_dist"].iloc[0] - np.mean(dists)) < 1e-6


def test_binary_segmentation(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_binary_segmentation"](SF).to_pandas()
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    cnt = pd.Series(day).value_counts().sort_index()
    y = cnt.to_numpy(float)
    days = cnt.index.to_numpy(np.int64)
    n = len(y)

    def sse(seg):
        return ((seg - seg.mean()) ** 2).sum() if len(seg) else 0.0

    def best(lo, hi):  # 0-based slice [lo, hi)
        base = sse(y[lo:hi])
        bb = None
        for k in range(lo + 1, hi):
            red = base - sse(y[lo:k]) - sse(y[k:hi])
            if bb is None or red > bb[0] + 1e-9:
                bb = (red, k)
        return bb

    r1, k1 = best(0, n)
    cand = []
    b = best(0, k1)
    if b:
        cand.append(b)
    b = best(k1, n)
    if b:
        cand.append(b)
    k2 = max(cand, key=lambda t: t[0])[1]
    ka, kb = sorted((k1, k2))
    assert out["cp1_day"].iloc[0] == days[ka - 1]
    assert out["cp2_day"].iloc[0] == days[kb - 1]
    assert abs(out["seg1_mean"].iloc[0] - y[:ka].mean()) < 1e-5
    assert abs(out["seg2_mean"].iloc[0] - y[ka:kb].mean()) < 1e-5
    assert abs(out["seg3_mean"].iloc[0] - y[kb:].mean()) < 1e-5


def test_ingest_ipc_roundtrip(ray_session, tmp_path):
    import pyarrow as pa

    from ptrail_ray.sources.transcripts import (
        read_arrow_ipc,
        write_arrow_ipc_shards,
    )

    out = str(tmp_path / "ipc")
    write_arrow_ipc_shards(f"{SF}/events.parquet", out, shards=3)
    ds = read_arrow_ipc(out, columns=["event_id", "user_id"])
    got = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = (
        pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id"])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got.equals(exp)
    # idempotent: second write is a no-op (DONE marker)
    write_arrow_ipc_shards(f"{SF}/events.parquet", out, shards=3)
    assert len(read_arrow_ipc(out).to_pandas()) == len(exp)


def test_write_arrow_ipc_sink(ray_session, tmp_path):
    import ray.data as rd

    from ptrail_ray.sources.transcripts import read_arrow_ipc, write_arrow_ipc

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])
    out = str(tmp_path / "sink")
    paths = write_arrow_ipc(ds, out)
    assert paths and all(p.endswith(".arrow") for p in paths)
    back = read_arrow_ipc(out).to_pandas().sort_values("event_id")
    exp = (
        pq.read_table(f"{SF}/events.parquet", columns=["event_id", "value"])
        .to_pandas()
        .sort_values("event_id")
    )
    assert back["event_id"].tolist() == exp["event_id"].tolist()
    assert np.allclose(back["value"].to_numpy(), exp["value"].to_numpy(), equal_nan=True)


def test_rank_turbulence(ray_session):
    from collections import Counter

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_rank_turbulence"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    bnd = (int(df["doc_id"].min()) + int(df["doc_id"].max()) + 1) // 2
    c1, c2 = Counter(), Counter()
    for did, t in zip(df["doc_id"], df["text"].fillna("")):
        (c2 if did >= bnd else c1).update(t.split())

    def ranks(c):
        toks = sorted(c, key=lambda t: (-c[t], t))
        return {t: i + 1 for i, t in enumerate(toks)}

    r1, r2 = ranks(c1), ranks(c2)
    contrib = {}
    for t in set(c1) | set(c2):
        i1 = 1 / r1[t] if t in r1 else 0.0
        i2 = 1 / r2[t] if t in r2 else 0.0
        contrib[t] = abs(i1 - i2)
    total = sum(round(v * 1e12) for v in contrib.values()) / 1e12
    top = sorted(contrib, key=lambda t: (-round(contrib[t] * 1e12), t))[:5]
    assert list(out["token"]) == top
    assert abs(out["rtd_total"].iloc[0] - total) < 1e-5
    for i, t in enumerate(top):
        assert out["rank_first"].iloc[i] == r1.get(t, 0)
        assert out["rank_second"].iloc[i] == r2.get(t, 0)


def test_matrix_profile(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_matrix_profile"](SF).to_pandas()
    y = _daily_counts().astype(np.int64)
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    days = np.sort(pd.Series(day).unique())
    n = len(y)
    w = 7
    m = n - w + 1
    best = None
    mp = {}
    for i in range(m):
        for j in range(i + w, m):
            d2 = int(((y[i : i + w] - y[j : j + w]) ** 2).sum())
            if best is None or (d2, i, j) < best:
                best = (d2, i, j)
            mp[i] = min(mp.get(i, 1 << 62), d2)
            mp[j] = min(mp.get(j, 1 << 62), d2)
    disc = max(mp.items(), key=lambda kv: (kv[1], -kv[0]))
    assert out["motif_day_a"].iloc[0] == days[best[1]]
    assert out["motif_day_b"].iloc[0] == days[best[2]]
    assert out["motif_dist2"].iloc[0] == best[0]
    assert out["discord_day"].iloc[0] == days[disc[0]]
    assert out["discord_dist2"].iloc[0] == disc[1]


def test_variance_ratio(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_variance_ratio"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    X = np.concatenate([[0.0], np.cumsum(y)])
    mu = (X[-1] - X[0]) / n
    q = 5
    s2a = ((y - mu) ** 2).sum() / (n - 1)
    m = q * (n - q + 1) * (1 - q / n)
    diffs = X[q:] - X[:-q]
    s2b = ((diffs - q * mu) ** 2).sum() / m
    vr = s2b / s2a
    z = (vr - 1) / np.sqrt(2 * (2 * q - 1) * (q - 1) / (3 * q * n))
    assert out["n_days"].iloc[0] == n
    assert abs(out["variance_ratio"].iloc[0] - vr) < 1e-5
    assert abs(out["z_stat"].iloc[0] - z) < 1e-4


def test_dfa(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_dfa"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    prof = np.cumsum(y - y.mean())
    fs = []
    for s in (4, 8, 16):
        k = n // s
        sses = []
        for b in range(k):
            seg = prof[b * s : (b + 1) * s]
            x = np.arange(1, s + 1)
            A = np.column_stack([np.ones(s), x])
            beta, *_ = np.linalg.lstsq(A, seg, rcond=None)
            sses.append(((seg - A @ beta) ** 2).sum())
        fs.append(np.sqrt(np.mean(sses)))
    slope = np.polyfit(np.log([4, 8, 16]), np.log(fs), 1)[0]
    assert out["n_days"].iloc[0] == n
    for col, f in zip(("f4", "f8", "f16"), fs):
        assert abs(out[col].iloc[0] - f) < 1e-3 * max(1, f)
    assert abs(out["dfa_alpha"].iloc[0] - slope) < 1e-4


def test_visibility_graphs(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    nv = QUERIES["q_visibility_graph"](SF).to_pandas()
    hv = QUERIES["q_horizontal_visibility"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    e_nat = e_hor = 0
    deg = np.zeros(n, int)
    for i in range(n):
        for j in range(i + 1, n):
            ks = np.arange(i + 1, j)
            if len(ks) == 0 or np.all(
                y[ks] < y[i] + (y[j] - y[i]) * (ks - i) / (j - i)
            ):
                e_nat += 1
                deg[i] += 1
                deg[j] += 1
            if len(ks) == 0 or np.all(y[ks] < min(y[i], y[j])):
                e_hor += 1
    assert nv["n_edges"].iloc[0] == e_nat
    assert hv["n_edges"].iloc[0] == e_hor
    assert nv["hub_degree"].iloc[0] == deg.max()
    # HVG is a subgraph of NVG
    assert e_hor <= e_nat


def test_poisson_mixture_em(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_poisson_mixture_em"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    ys = np.sort(y)
    l1, l2, pi = ys[(n - 1) // 4], ys[3 * (n - 1) // 4], 0.5
    for _ in range(10):
        lo = np.log((1 - pi) / pi) + (l1 - l2) + y * np.log(l2 / l1)
        r = 1 / (1 + np.exp(lo))
        l1 = (r * y).sum() / r.sum()
        l2 = ((1 - r) * y).sum() / (1 - r).sum()
        pi = r.mean()
    assert out["n_days"].iloc[0] == n
    assert abs(out["lambda_low"].iloc[0] - l1) < 1e-4 * max(1, l1)
    assert abs(out["lambda_high"].iloc[0] - l2) < 1e-4 * max(1, l2)
    assert abs(out["pi_low"].iloc[0] - pi) < 1e-5
    assert out["lambda_low"].iloc[0] <= out["lambda_high"].iloc[0]
    assert out["loglik"].iloc[0] < 0


def test_experiment_health(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_experiment_health"](SF).to_pandas()
    df = _events_pdf(["user_id"])
    per = df.groupby("user_id").size()
    u = per.index.to_numpy(np.int64)
    n1 = int((u % 2 == 1).sum())
    n0 = int((u % 2 == 0).sum())
    assert out["n_treat"].iloc[0] == n1
    assert out["n_ctrl"].iloc[0] == n0
    assert abs(out["srm_chi2"].iloc[0] - (n1 - n0) ** 2 / (n1 + n0)) < 1e-6
    a = per[u % 4 == 0].to_numpy(float)
    b = per[u % 4 == 2].to_numpy(float)
    z = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    assert abs(out["aa_z"].iloc[0] - z) < 1e-5


def test_benford_first(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_benford_first"](SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"]).to_pandas()
    cents = np.round(o["o_totalprice"] * 100).astype(np.int64)
    first = cents.astype(str).str[0].astype(int)
    n = len(first)
    chi2 = mad = 0.0
    for d in range(1, 10):
        p = np.log10(1 + 1 / d)
        obs = int((first == d).sum())
        chi2 += (obs - n * p) ** 2 / (n * p)
        mad += abs(obs / n - p)
    assert out["n_orders"].iloc[0] == n
    assert abs(out["chi2"].iloc[0] - chi2) < 1e-4 * max(1, chi2)
    assert abs(out["nigrini_mad"].iloc[0] - mad / 9) < 1e-6


def test_interrupted_ts_and_chow(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    its = QUERIES["q_interrupted_ts"](SF).to_pandas()
    chow = QUERIES["q_chow_test"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    h = n // 2
    t = np.arange(1, n + 1)

    def fit(lo, hi):
        A = np.column_stack([np.ones(hi - lo), t[lo:hi]])
        beta, *_ = np.linalg.lstsq(A, y[lo:hi], rcond=None)
        sse = ((y[lo:hi] - A @ beta) ** 2).sum()
        return beta[0], beta[1], sse

    a1, b1, s1 = fit(0, h)
    a2, b2, s2 = fit(h, n)
    _, _, sp = fit(0, n)
    assert abs(its["pre_slope"].iloc[0] - b1) < 1e-4
    assert abs(its["post_slope"].iloc[0] - b2) < 1e-4
    assert abs(its["slope_change"].iloc[0] - (b2 - b1)) < 1e-4
    assert abs(
        its["level_change"].iloc[0] - ((a2 + b2 * h) - (a1 + b1 * h))
    ) < 1e-3
    f = ((sp - s1 - s2) / 2) / ((s1 + s2) / (n - 4))
    assert abs(chow["chow_f"].iloc[0] - f) < 1e-3 * max(1, abs(f))


def test_transfer_entropy(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_transfer_entropy"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    sub = pd.DataFrame({"d": day, "t": df["event_type"]})
    sub = sub[sub["t"].isin(["purchase", "error"])]
    piv = sub.groupby(["d", "t"]).size().unstack(fill_value=0).sort_index()
    pur = piv["purchase"].to_numpy(np.int64)
    err = piv["error"].to_numpy(np.int64)

    def binarize(v):
        return (v > np.sort(v)[(len(v) - 1) // 2]).astype(int)

    by, bx = binarize(pur), binarize(err)
    yp, yc, xc = by[1:], by[:-1], bx[:-1]
    n = len(yp)
    te = 0.0
    import itertools

    for a, b, c in itertools.product((0, 1), repeat=3):
        m = (yp == a) & (yc == b) & (xc == c)
        cc = int(m.sum())
        if cc == 0:
            continue
        c_yx = int(((yc == b) & (xc == c)).sum())
        c_yy = int(((yp == a) & (yc == b)).sum())
        c_y = int((yc == b).sum())
        te += cc / n * np.log(cc * c_y / (c_yx * c_yy))
    assert out["n_transitions"].iloc[0] == n
    assert abs(out["te_nats"].iloc[0] - te) < 1e-6
    assert out["te_nats"].iloc[0] >= -1e-9  # TE is non-negative


def test_logistic_fit(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_logistic_fit"](SF).to_pandas()
    df = _events_pdf(["user_id", "event_type"])
    g = df.groupby("user_id")["event_type"].agg(
        n="size", pc=lambda s: int((s == "purchase").sum())
    )
    med = np.sort(g["pc"].to_numpy())[(len(g) - 1) // 2]
    y = (g["pc"] > med).astype(float).to_numpy()
    x = g["n"].astype(float).to_numpy()
    # unquantized Newton reference
    a = np.log(y.mean() / (1 - y.mean()))
    b = 0.0
    for _ in range(50):
        p = 1 / (1 + np.exp(-(a + b * x)))
        g1, g2 = (y - p).sum(), (x * (y - p)).sum()
        w = p * (1 - p)
        h11, h12, h22 = w.sum(), (x * w).sum(), (x * x * w).sum()
        det = h11 * h22 - h12 * h12
        a += (h22 * g1 - h12 * g2) / det
        b += (h11 * g2 - h12 * g1) / det
    assert out["n_users"].iloc[0] == len(g)
    assert abs(out["intercept"].iloc[0] - a) < 5e-3 * max(1, abs(a))
    assert abs(out["slope"].iloc[0] - b) < 5e-3 * max(1e-3, abs(b))
    assert out["deviance"].iloc[0] >= 0


def test_cooks_distance(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cooks_distance"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    t = np.arange(1, n + 1, dtype=float)
    A = np.column_stack([np.ones(n), t])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    e = y - A @ beta
    s2 = (e**2).sum() / (n - 2)
    h = 1 / n + (t - t.mean()) ** 2 / ((t - t.mean()) ** 2).sum()
    D = e**2 * h / (2 * s2 * (1 - h) ** 2)
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    days = np.sort(pd.Series(day).unique())
    assert out["top_day"].iloc[0] == days[int(np.argmax(D))]
    assert abs(out["top_cooks_d"].iloc[0] - D.max()) < 1e-5 * max(1, D.max())
    assert out["n_influential"].iloc[0] == int((D > 4 / n).sum())


def test_jackknife_slope(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_jackknife_slope"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    t = np.arange(1, n + 1, dtype=float)
    betas = []
    for i in range(n):
        mask = np.ones(n, bool)
        mask[i] = False
        b = np.polyfit(t[mask], y[mask], 1)[0]
        betas.append(b)
    betas = np.array(betas)
    se = np.sqrt((n - 1) / n * ((betas - betas.mean()) ** 2).sum())
    full = np.polyfit(t, y, 1)[0]
    assert out["n_days"].iloc[0] == n
    assert abs(out["slope"].iloc[0] - full) < 1e-4
    assert abs(out["jackknife_se"].iloc[0] - se) < 1e-3 * max(1e-3, se)


def test_copeland_sources(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_copeland_sources"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "n_chars"]
    ).to_pandas()
    sources = sorted(df["source"].unique())
    score = {s: 0 for s in sources}
    for i, a in enumerate(sources):
        va = df.loc[df["source"] == a, "n_chars"].to_numpy(float)
        for b in sources[i + 1 :]:
            vb = df.loc[df["source"] == b, "n_chars"].to_numpy(float)
            pooled = np.concatenate([va, vb])
            r = pd.Series(pooled).rank(method="average").to_numpy()
            u = r[: len(va)].sum() - len(va) * (len(va) + 1) / 2
            p = u / (len(va) * len(vb))
            if p > 0.5:
                score[a] += 1
                score[b] -= 1
            elif p < 0.5:
                score[a] -= 1
                score[b] += 1
    exp = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(out["source"]) == [s for s, _ in exp]
    assert list(out["copeland"]) == [c for _, c in exp]


def test_shapley_growth(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_shapley_growth"](SF).to_pandas()
    total = (
        out["shapley_users"].iloc[0]
        + out["shapley_intensity"].iloc[0]
        + out["shapley_yield"].iloc[0]
    )
    # Shapley contributions telescope to the total change
    assert abs(total - out["delta_value"].iloc[0]) < 1e-3 * max(
        1, abs(out["delta_value"].iloc[0])
    )
    df = _events_pdf(["user_id", "ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    bnd = (int(day.min()) + int(day.max()) + 1) // 2
    u0 = df.loc[(day < bnd).to_numpy(), "user_id"].nunique()
    u1 = df.loc[(day >= bnd).to_numpy(), "user_id"].nunique()
    assert u0 > 0 and u1 > 0


def test_gompertz_3point(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gompertz_3point"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = (
        df.loc[df["event_type"] == "signup", "ts"]
        .astype("datetime64[ns]")
        .astype(np.int64)
        // 86_400_000_000_000
    ).to_numpy()
    dmin, dmax = int(day.min()), int(day.max())
    span = dmax - dmin + 1
    t1, t2, t3 = dmin + span // 3 - 1, dmin + 2 * span // 3 - 1, dmax
    s1, s2, s3 = [int((day <= t).sum()) for t in (t1, t2, t3)]
    y = np.log([s1, s2, s3])
    ct = (y[2] - y[1]) / (y[1] - y[0])
    a = np.exp(y[0] - (y[1] - y[0]) / (ct - 1))
    assert out["s1"].iloc[0] == s1 and out["s3"].iloc[0] == s3
    assert abs(out["c_ratio"].iloc[0] - ct) < 1e-5
    assert abs(out["asymptote"].iloc[0] - a) < 1e-3 * max(1, a)
    assert abs(out["saturation"].iloc[0] - s3 / a) < 1e-5


def test_erlang_staffing(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_erlang_staffing"](SF).to_pandas()
    a = out["offered_a"].iloc[0]
    c = int(out["staff_c"].iloc[0])
    # verify c is the minimal stable agent count with C(c,a) <= 0.2
    def erlang_c(cc, a):
        b = 1.0
        for k in range(1, cc + 1):
            b = a * b / (k + a * b)
        return cc * b / (cc - a * (1 - b))

    assert c > a
    assert erlang_c(c, a) <= 0.2 + 1e-9
    if c - 1 > a:
        assert erlang_c(c - 1, a) > 0.2 - 1e-6
    assert abs(out["wait_prob"].iloc[0] - erlang_c(c, a)) < 1e-5


def test_embed_hubness(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_embed_hubness"](SF).to_pandas()
    x, _ = _embed_xy()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])
    vid = t["vec_id"].to_numpy()
    sel = vid < 500
    xs, vs = x[sel], vid[sel]
    order = np.argsort(vs)
    xs, vs = xs[order], vs[order]
    n = len(vs)
    indeg = np.zeros(n, int)
    for i in range(n):
        d = ((xs - xs[i]) ** 2).sum(axis=1)
        d[i] = np.inf
        nn = np.argsort(d, kind="stable")[:5]
        indeg[nn] += 1
    assert out["n_vecs"].iloc[0] == n
    assert out["max_indegree"].iloc[0] == indeg.max()
    m2 = ((indeg - indeg.mean()) ** 2).mean()
    m3 = ((indeg - indeg.mean()) ** 3).mean()
    g1 = m3 / m2**1.5
    assert abs(out["indegree_skew"].iloc[0] - g1) < 1e-4


def test_tool_response_lift(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    from ptrail_ray.sources.transcripts import derive_from_events

    out = QUERIES["q_tool_response_lift"](SF).to_pandas()
    df = derive_from_events(SF).to_pandas().sort_values(["conv_id", "turn_idx"])
    df["m1"] = df["text"].fillna("").str.len()
    base = df.loc[df["role"] == "assistant", "m1"].mean()
    rows = {}
    for _, conv in df.groupby("conv_id"):
        m1 = conv["m1"].to_numpy()
        role = conv["role"].to_numpy()
        tool = conv["tool"].fillna("").to_numpy()
        for i in range(len(conv)):
            if tool[i] == "":
                continue
            after = np.where(role[i + 1 :] == "assistant")[0]
            if len(after) == 0:
                continue
            v = m1[i + 1 + after[0]]
            n, s = rows.get(tool[i], (0, 0))
            rows[tool[i]] = (n + 1, s + v)
    for _, r in out.iterrows():
        n, s = rows[r["tool"]]
        assert r["n_followups"] == n
        assert abs(r["mean_next_len"] - s / n) < 1e-6
        assert abs(r["lift"] - (s / n) / base) < 1e-6


def test_conv_tempo(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    from ptrail_ray.sources.transcripts import derive_from_events

    out = QUERIES["q_conv_tempo"](SF).to_pandas()
    df = derive_from_events(SF).to_pandas().sort_values(["conv_id", "turn_idx"])
    us = df["ts"].astype("datetime64[us]").astype(np.int64)
    slopes = []
    for _, g in df.assign(us=us).groupby("conv_id"):
        t = g["us"].to_numpy()
        if len(t) < 4:
            continue
        y = (t[1:] - t[:-1]) // 1_000_000
        x = g["turn_idx"].to_numpy()[1:].astype(float)
        b = np.polyfit(x, y.astype(float), 1)[0]
        slopes.append(round(b * 1e6) / 1e6)
    assert out["n_convs"].iloc[0] == len(slopes)
    assert abs(out["mean_slope_s"].iloc[0] - np.mean(slopes)) < 1e-3
    assert abs(
        out["share_accelerating"].iloc[0]
        - np.mean([s < 0 for s in slopes])
    ) < 1e-6


def test_question_rate(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    from ptrail_ray.sources.transcripts import derive_from_events

    out = QUERIES["q_question_rate"](SF).to_pandas()
    df = derive_from_events(SF).to_pandas()
    txt = df["text"].fillna("")
    g = pd.DataFrame(
        {
            "role": df["role"],
            "e": txt.str.endswith("?").astype(int),
            "q": txt.str.count(r"\?"),
        }
    ).groupby("role")
    for _, r in out.iterrows():
        sub = g.get_group(r["role"])
        assert r["n_turns"] == len(sub)
        assert abs(r["ends_q_rate"] - sub["e"].mean()) < 1e-6
        assert abs(r["marks_per_turn"] - sub["q"].mean()) < 1e-6


def test_discount_response(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_discount_response"](SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_discount", "l_quantity"]
    ).to_pandas()
    x = np.round(li["l_discount"] * 100).to_numpy(float)
    y = np.round(li["l_quantity"]).to_numpy(float)
    beta = np.cov(x, y, bias=True)[0, 1] / x.var()
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert out["n_lines"].iloc[0] == len(x)
    assert abs(out["slope_qty_per_pct"].iloc[0] - beta) < 1e-5
    assert abs(out["r2"].iloc[0] - r2) < 1e-6
    assert abs(
        out["elasticity_at_mean"].iloc[0] - beta * x.mean() / y.mean()
    ) < 1e-5


def test_soundex_parts(ray_session):
    import re

    from ptrail_ray.entry_queries import QUERIES, _soundex_sql_recipe

    out = QUERIES["q_soundex_parts"](SF).to_pandas()
    p = pq.read_table(f"{SF}/part.parquet", columns=["p_name"]).to_pandas()
    toks = sorted({n.split(" ")[0] for n in p["p_name"].fillna("") if n})
    codes = {}
    for t in toks:
        c = _soundex_sql_recipe(t)
        codes.setdefault(c, []).append(t)
    assert out["n_distinct_tokens"].iloc[0] == len(toks)
    assert out["n_codes"].iloc[0] == len(codes)
    top = sorted(codes.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:5]
    for i, (c, ts) in enumerate(top):
        assert out["code"].iloc[i] == c
        assert out["n_tokens"].iloc[i] == len(ts)
        assert out["example"].iloc[i] == min(ts)
    # spot-check the recipe itself on a known word
    assert re.match(r"^[A-Z][0-9]{3}$", _soundex_sql_recipe("robert"))


def test_extremal_index(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_extremal_index"](SF).to_pandas()
    y = _daily_counts()
    n = len(y)
    u = int(np.sort(y)[(9 * n) // 10 - 1])
    exc = np.where(y > u)[0]
    clusters = 1 + int((np.diff(exc) > 2).sum()) if len(exc) else 0
    assert out["threshold"].iloc[0] == u
    assert out["n_exceedances"].iloc[0] == len(exc)
    assert out["n_clusters"].iloc[0] == clusters
    assert abs(out["extremal_index"].iloc[0] - clusters / len(exc)) < 1e-6


def test_mean_excess(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mean_excess"](SF).to_pandas()
    y = _daily_counts()
    n = len(y)
    ys = np.sort(y)
    for i, pct in enumerate((75, 90, 95)):
        u = int(ys[(pct * n) // 100 - 1])
        exc = y[y > u] - u
        assert out["threshold"].iloc[i] == u
        assert out["n_exceed"].iloc[i] == len(exc)
        me = exc.mean() if len(exc) else 0.0
        assert abs(out["mean_excess"].iloc[i] - me) < 1e-6


def test_gpd_moments(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gpd_moments"](SF).to_pandas()
    y = _daily_counts()
    n = len(y)
    u = int(np.sort(y)[(9 * n) // 10 - 1])
    exc = (y[y > u] - u).astype(float)
    m, s2 = exc.mean(), exc.var(ddof=1)
    xi = 0.5 * (1 - m * m / s2)
    sigma = 0.5 * m * (m * m / s2 + 1)
    assert out["threshold"].iloc[0] == u
    assert abs(out["gpd_shape"].iloc[0] - xi) < 1e-5
    assert abs(out["gpd_scale"].iloc[0] - sigma) < 1e-4 * max(1, sigma)


def test_return_level(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_return_level"](SF).to_pandas()
    df = _events_pdf(["ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    cnt = pd.Series(day).value_counts().sort_index()
    wk = cnt.index.to_numpy(np.int64) // 7
    mx = pd.Series(cnt.to_numpy(), index=wk).groupby(level=0).max().to_numpy(float)
    m, s = mx.mean(), mx.std(ddof=1)
    beta = s * np.sqrt(6) / np.pi
    mu = m - 0.5772156649015329 * beta
    rl = mu - beta * np.log(-np.log(1 - 1 / 30))
    assert out["n_weeks"].iloc[0] == len(mx)
    assert abs(out["gumbel_mu"].iloc[0] - mu) < 1e-3 * max(1, abs(mu))
    assert abs(out["return_level_30"].iloc[0] - rl) < 1e-3 * max(1, abs(rl))


def test_partial_kendall(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_partial_kendall"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    g = pd.DataFrame({"d": day, "t": df["event_type"]})
    v = g.groupby("d").size()
    p = g[g["t"] == "purchase"].groupby("d").size().reindex(v.index, fill_value=0)
    e = g[g["t"] == "error"].groupby("d").size().reindex(v.index, fill_value=0)

    def taub(a, b):
        a, b = a.to_numpy(float), b.to_numpy(float)
        n = len(a)
        c = d = ta = tb = 0
        for i in range(n):
            for j in range(i + 1, n):
                da, db = a[i] - a[j], b[i] - b[j]
                if da == 0:
                    ta += 1
                if db == 0:
                    tb += 1
                if da != 0 and db != 0:
                    if (da > 0) == (db > 0):
                        c += 1
                    else:
                        d += 1
        n0 = n * (n - 1) // 2
        return (c - d) / np.sqrt((n0 - ta) * (n0 - tb))

    txy, txz, tyz = taub(v, p), taub(v, e), taub(p, e)
    pt = (txy - txz * tyz) / np.sqrt((1 - txz**2) * (1 - tyz**2))
    assert abs(out["tau_vol_pur"].iloc[0] - txy) < 1e-6
    assert abs(out["partial_tau"].iloc[0] - pt) < 1e-5


def test_single_source_risk(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_single_source_risk"](SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    ).to_pandas()
    li["q"] = np.round(li["l_quantity"]).astype(np.int64)
    per = li.groupby("l_partkey").agg(
        ns=("l_suppkey", "nunique"), qty=("q", "sum")
    )
    hist = per.groupby("ns").agg(n=("qty", "size"), q=("qty", "sum"))
    assert list(out["n_suppliers"]) == list(hist.index)
    assert list(out["n_parts"]) == list(hist["n"])
    assert list(out["total_qty"]) == list(hist["q"])
    share = hist["q"].get(1, 0) / hist["q"].sum()
    assert abs(out["single_source_share"].iloc[0] - share) < 1e-6


def test_cosupply_jaccard(ray_session):
    from itertools import combinations

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cosupply_jaccard"](SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).to_pandas().drop_duplicates()
    parts_of = li.groupby("l_suppkey")["l_partkey"].apply(set)
    co = {}
    for _, g in li.groupby("l_partkey"):
        for a, b in combinations(sorted(g["l_suppkey"].unique()), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    rows = []
    for (a, b), c in co.items():
        un = len(parts_of[a]) + len(parts_of[b]) - c
        rows.append((round(c / un * 1e9), a, b, c, un))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    for i, (qj, a, b, c, un) in enumerate(rows[:5]):
        assert out["supp_a"].iloc[i] == a and out["supp_b"].iloc[i] == b
        assert out["shared_parts"].iloc[i] == c
        assert out["union_parts"].iloc[i] == un
        assert abs(out["jaccard"].iloc[i] - qj / 1e9) < 2e-6


def test_lift_at_decile(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_lift_at_decile"](SF).to_pandas()
    df = _events_pdf(["user_id", "event_type"])
    g = df.groupby("user_id")["event_type"].agg(
        n="size", pc=lambda s: int((s == "purchase").sum())
    )
    med = np.sort(g["pc"].to_numpy())[(len(g) - 1) // 2]
    heavy = (g["pc"] > med).to_numpy()
    thr = int(np.sort(g["n"].to_numpy())[(9 * len(g)) // 10 - 1])
    top = (g["n"] >= thr).to_numpy()
    rate_top = heavy[top].mean()
    rate_all = heavy.mean()
    assert out["threshold_events"].iloc[0] == thr
    assert out["n_top"].iloc[0] == int(top.sum())
    assert abs(out["rate_top"].iloc[0] - rate_top) < 1e-6
    assert abs(out["lift"].iloc[0] - rate_top / rate_all) < 1e-5


def test_hotelling_t2(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hotelling_t2"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    g = pd.DataFrame({"d": day, "t": df["event_type"]})
    days = np.sort(g["d"].unique())
    p = g[g["t"] == "purchase"].groupby("d").size().reindex(days, fill_value=0).to_numpy(float)
    e = g[g["t"] == "error"].groupby("d").size().reindex(days, fill_value=0).to_numpy(float)
    X = np.column_stack([p, e])
    mu = X.mean(axis=0)
    S = np.cov(X.T, ddof=1)
    Sinv = np.linalg.inv(S)
    t2 = np.einsum("ij,jk,ik->i", X - mu, Sinv, X - mu)
    assert out["n_days"].iloc[0] == len(days)
    assert out["max_t2_day"].iloc[0] == days[int(np.argmax(t2))]
    assert abs(out["max_t2"].iloc[0] - t2.max()) < 1e-4
    assert out["n_beyond_10"].iloc[0] == int((t2 > 10).sum())


def test_canonical_corr(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_canonical_corr"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    g = pd.DataFrame({"d": day, "t": df["event_type"]})
    days = np.sort(g["d"].unique())
    M = {}
    for name, val in (("p", "purchase"), ("e", "error"), ("c", "click"), ("v", "view")):
        M[name] = (
            g[g["t"] == val].groupby("d").size().reindex(days, fill_value=0).to_numpy(float)
        )
    X = np.column_stack([M["p"], M["e"]])
    Y = np.column_stack([M["c"], M["v"]])
    Xc = X - X.mean(0)
    Yc = Y - Y.mean(0)
    Sxx = Xc.T @ Xc
    Syy = Yc.T @ Yc
    Sxy = Xc.T @ Yc
    Mm = np.linalg.inv(Sxx) @ Sxy @ np.linalg.inv(Syy) @ Sxy.T
    lams = np.sort(np.linalg.eigvals(Mm).real)[::-1]
    assert abs(out["rho1"].iloc[0] - np.sqrt(lams[0])) < 1e-5
    assert abs(out["rho2"].iloc[0] - np.sqrt(max(lams[1], 0))) < 1e-5
    assert abs(
        out["wilks_lambda"].iloc[0] - (1 - lams[0]) * (1 - lams[1])
    ) < 1e-5


def test_fisher_lda(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_fisher_lda"](SF).to_pandas()
    df = _events_pdf(["user_id", "event_type"])
    g = df.groupby("user_id")["event_type"].agg(
        n="size",
        err=lambda s: int((s == "error").sum()),
        pc=lambda s: int((s == "purchase").sum()),
    )
    med = np.sort(g["pc"].to_numpy())[(len(g) - 1) // 2]
    cls = (g["pc"] > med).to_numpy()
    X = g[["n", "err"]].to_numpy(float)
    x0, x1 = X[~cls], X[cls]
    Sw = np.zeros((2, 2))
    for xs in (x0, x1):
        z = xs - xs.mean(0)
        Sw += z.T @ z
    d = x1.mean(0) - x0.mean(0)
    w = np.linalg.solve(Sw, d)
    j = w @ d
    assert out["n_heavy"].iloc[0] == int(cls.sum())
    assert abs(out["w_events"].iloc[0] - w[0]) < 1e-5 * max(1e-3, abs(w[0]))
    assert abs(out["w_errors"].iloc[0] - w[1]) < 1e-5 * max(1e-3, abs(w[1]))
    assert abs(out["fisher_j"].iloc[0] - j) < 1e-5 * max(1e-3, abs(j))


def test_pca_2d(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_pca_2d"](SF).to_pandas()
    df = _events_pdf(["user_id", "event_type"])
    g = df.groupby("user_id")["event_type"].agg(
        n="size", err=lambda s: int((s == "error").sum())
    )
    X = g[["n", "err"]].to_numpy(float)
    S = np.cov(X.T, ddof=1)
    lams = np.sort(np.linalg.eigvalsh(S))[::-1]
    assert out["n_users"].iloc[0] == len(g)
    assert abs(out["lambda1"].iloc[0] - lams[0]) < 1e-3 * max(1, lams[0])
    assert abs(out["lambda2"].iloc[0] - lams[1]) < 1e-3 * max(1, lams[1])
    assert abs(
        out["explained_share"].iloc[0] - lams[0] / lams.sum()
    ) < 1e-5


def test_deming(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_deming"](SF).to_pandas()
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    ).to_pandas()
    li["y"] = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(np.int64)
    ls = li.groupby("l_orderkey", as_index=False)["y"].sum()
    j = o.merge(ls, left_on="o_orderkey", right_on="l_orderkey")
    x = np.round(j["o_totalprice"].to_numpy(float) * 100)
    y = j["y"].to_numpy(float)
    cxx, cyy = x.var(), y.var()
    cxy = np.cov(x, y, bias=True)[0, 1]
    beta = (cyy - cxx + np.sqrt((cyy - cxx) ** 2 + 4 * cxy**2)) / (2 * cxy)
    alpha = (y.mean() - beta * x.mean()) / 100
    assert out["n_orders"].iloc[0] == len(j)
    assert abs(out["deming_slope"].iloc[0] - beta) < 1e-5
    assert abs(out["deming_intercept_usd"].iloc[0] - alpha) < 1e-2


def test_hoeffding_d(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hoeffding_d"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    g = pd.DataFrame({"d": day, "t": df["event_type"]})
    v = g.groupby("d").size().sort_index().to_numpy(float)
    p = (
        g[g["t"] == "purchase"].groupby("d").size()
        .reindex(np.sort(g["d"].unique()), fill_value=0)
        .to_numpy(float)
    )
    n = len(v)
    # classical midrank formulation (Hollander & Wolfe)
    R = pd.Series(v).rank(method="average").to_numpy()
    S = pd.Series(p).rank(method="average").to_numpy()
    phi = lambda t: 1.0 if t > 0 else (0.5 if t == 0 else 0.0)
    Q = np.array(
        [
            1
            + sum(
                phi(v[i] - v[j]) * phi(p[i] - p[j])
                for j in range(n)
                if j != i
            )
            for i in range(n)
        ]
    )
    D1 = ((Q - 1) * (Q - 2)).sum()
    D2 = ((R - 1) * (R - 2) * (S - 1) * (S - 2)).sum()
    D3 = ((R - 2) * (S - 2) * (Q - 1)).sum()
    D = (
        30
        * ((n - 2) * (n - 3) * D1 + D2 - 2 * (n - 2) * D3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    assert out["n_days"].iloc[0] == n
    assert abs(out["hoeffding_d"].iloc[0] - D) < 1e-6


def test_blomqvist_gini_corr(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_blomqvist_gini_corr"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    g = pd.DataFrame({"d": day, "t": df["event_type"]})
    days = np.sort(g["d"].unique())
    x = g.groupby("d").size().sort_index().to_numpy(float)
    y = (
        g[g["t"] == "purchase"].groupby("d").size()
        .reindex(days, fill_value=0).to_numpy(float)
    )
    n = len(x)
    mx = np.sort(x)[(n - 1) // 2]
    my = np.sort(y)[(n - 1) // 2]
    keep = (x != mx) & (y != my)
    conc = int((((x > mx) == (y > my)) & keep).sum())
    disc = int(keep.sum()) - conc
    assert abs(out["blomqvist_beta"].iloc[0] - (conc - disc) / (conc + disc)) < 1e-6
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    gxy = np.cov(x, ry, bias=True)[0, 1] / np.cov(x, rx, bias=True)[0, 1]
    gyx = np.cov(y, rx, bias=True)[0, 1] / np.cov(y, ry, bias=True)[0, 1]
    assert abs(out["gini_corr_xy"].iloc[0] - gxy) < 1e-6
    assert abs(out["gini_corr_yx"].iloc[0] - gyx) < 1e-6


def test_dtw_weekly(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_dtw_weekly"](SF).to_pandas()
    df = _events_pdf(["ts"])
    us = df["ts"].astype("datetime64[us]").astype(np.int64)
    day = us // 86_400_000_000
    hod = (us // 3_600_000_000) % 24
    wk = day // 7
    g = pd.DataFrame({"w": wk, "h": hod}).groupby(["w", "h"]).size()
    w0, w1 = int(wk.min()), int(wk.max())
    a = np.array([g.get((w0, h), 0) for h in range(24)], float)
    b = np.array([g.get((w1, h), 0) for h in range(24)], float)
    D = np.full((24, 24), np.inf)
    for i in range(24):
        for j in range(24):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                D[i, j] = c
            elif i == 0:
                D[i, j] = D[i, j - 1] + c
            elif j == 0:
                D[i, j] = D[i - 1, j] + c
            else:
                D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    assert out["week_first"].iloc[0] == w0
    assert out["week_last"].iloc[0] == w1
    assert out["dtw_dist"].iloc[0] == int(D[23, 23])


def test_topsis_sources(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_topsis_sources"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "n_chars"]
    ).to_pandas()
    g = df.groupby("source")["n_chars"].agg(
        n="size", s="sum", sh=lambda v: int((v < 100).sum())
    )
    C = np.column_stack(
        [
            g["n"].to_numpy(float),
            (g["s"] / g["n"]).to_numpy(float),
            (g["sh"] / g["n"]).to_numpy(float),
        ]
    )
    k = len(g)
    norm = C / np.sqrt((C**2).sum(0))
    p = C / C.sum(0)
    with np.errstate(divide="ignore", invalid="ignore"):
        plogp = np.where(p > 0, p * np.log(p), 0.0)
    e = -plogp.sum(0) / np.log(k)
    w = (1 - e) / (1 - e).sum()
    V = w * norm
    ideal = np.array([V[:, 0].max(), V[:, 1].max(), V[:, 2].min()])
    anti = np.array([V[:, 0].min(), V[:, 1].min(), V[:, 2].max()])
    dp = np.sqrt(((V - ideal) ** 2).sum(1))
    dm = np.sqrt(((V - anti) ** 2).sum(1))
    cc = dm / (dp + dm)
    order = sorted(zip(-cc, g.index))[:5]
    assert list(out["source"]) == [s for _, s in order]
    for i, (_, s) in enumerate(order):
        idx = list(g.index).index(s)
        assert abs(out["closeness"].iloc[i] - cc[idx]) < 1e-4
    assert np.allclose(
        out[["w_volume", "w_length", "w_short"]].iloc[0].to_numpy(), w,
        atol=1e-4,
    )


def test_burt_constraint(ray_session):
    from ptrail_ray.entry_queries import QUERIES, _tool_transition_matrix

    out = QUERIES["q_burt_constraint"](SF).to_pandas()
    A = _tool_transition_matrix(SF).astype(float)
    W = A + A.T
    np.fill_diagonal(W, 0)
    m = W.shape[0]
    P = W / W.sum(1, keepdims=True)
    names = [""] + [f"tool-{i}" for i in range(7)]
    for _, r in out.iterrows():
        i = names.index(r["state"])
        c = 0.0
        for j in range(m):
            if j == i:
                continue
            ind = sum(
                P[i, q] * P[q, j]
                for q in range(m)
                if q != i and q != j and W[q].sum() > 0
            )
            c += (P[i, j] + ind) ** 2
        assert abs(r["burt_constraint"] - c) < 1e-5


def test_colley_sources(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_colley_sources"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "n_chars"]
    ).to_pandas()
    sources = sorted(df["source"].unique())
    k = len(sources)
    wins = {s: 0.0 for s in sources}
    for i, a in enumerate(sources):
        va = df.loc[df["source"] == a, "n_chars"].to_numpy(float)
        for b in sources[i + 1 :]:
            vb = df.loc[df["source"] == b, "n_chars"].to_numpy(float)
            pooled = np.concatenate([va, vb])
            r = pd.Series(pooled).rank(method="average").to_numpy()
            u = r[: len(va)].sum() - len(va) * (len(va) + 1) / 2
            p = u / (len(va) * len(vb))
            if p > 0.5:
                wins[a] += 1
            elif p < 0.5:
                wins[b] += 1
            else:
                wins[a] += 0.5
                wins[b] += 0.5
    # exact Colley solve for reference
    C = np.full((k, k), -1.0) + np.eye(k)
    np.fill_diagonal(C, 2 + (k - 1))
    bv = np.array([1 + (wins[s] - (k - 1 - wins[s])) / 2 for s in sources])
    r = np.linalg.solve(C, bv)
    order = sorted(zip(-r, sources))[:5]
    assert list(out["source"]) == [s for _, s in order]
    for i, (nr, s) in enumerate(order):
        assert abs(out["colley_rating"].iloc[i] - (-nr)) < 1e-3


def test_bradley_terry(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bradley_terry"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "n_chars"]
    ).to_pandas()
    sources = sorted(df["source"].unique())
    k = len(sources)
    wins = {s: 0.0 for s in sources}
    for i, a in enumerate(sources):
        va = df.loc[df["source"] == a, "n_chars"].to_numpy(float)
        for b in sources[i + 1 :]:
            vb = df.loc[df["source"] == b, "n_chars"].to_numpy(float)
            pooled = np.concatenate([va, vb])
            r = pd.Series(pooled).rank(method="average").to_numpy()
            u = r[: len(va)].sum() - len(va) * (len(va) + 1) / 2
            p = u / (len(va) * len(vb))
            if p > 0.5:
                wins[a] += 1
            elif p < 0.5:
                wins[b] += 1
            else:
                wins[a] += 0.5
                wins[b] += 0.5
    w = np.array([wins[s] for s in sources])
    # replicate the documented 15 quantized MM half-step pairs (the MLE
    # is degenerate when one source beats every other, so the operator
    # reports the fixed-iteration estimate)
    pi = np.ones(k)
    for _ in range(15):
        den = np.array(
            [
                sum(1 / (pi[i] + pi[j]) for j in range(k) if j != i)
                for i in range(k)
            ]
        )
        pi = np.round(w / den * 1e9) / 1e9
        pi = np.round(pi * k / pi.sum() * 1e9) / 1e9
    order = sorted(zip(-pi, sources))[:5]
    assert list(out["source"]) == [s for _, s in order]
    for i, (np_, s) in enumerate(order):
        assert abs(out["bt_strength"].iloc[i] - (-np_)) < 1e-4 * max(
            0.1, -np_
        )


def test_condorcet_and_iqv(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    cw = QUERIES["q_condorcet_winner"](SF).to_pandas()
    # cross-check against Copeland: if a Condorcet winner exists it must
    # be the Copeland top (the criterion), and beats == k-1
    cope = QUERIES["q_copeland_sources"](SF).to_pandas()
    if cw["condorcet_winner"].iloc[0]:
        assert cw["condorcet_winner"].iloc[0] == cope["source"].iloc[0]
        assert bool(cw["consistent"].iloc[0])
    iqv = QUERIES["q_iqv"](SF).to_pandas()
    df = _events_pdf(["event_type"])
    p = df["event_type"].value_counts(normalize=True).to_numpy()
    k = len(p)
    exp = k / (k - 1) * (1 - (p**2).sum())
    assert iqv["k_types"].iloc[0] == k
    assert abs(iqv["iqv"].iloc[0] - exp) < 1e-6


def test_burrows_zeta(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_burrows_zeta"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    focus = df["source"].min()
    n_a = int((df["source"] == focus).sum())
    n_b = len(df) - n_a
    dfa, dfb = {}, {}
    for s, t in zip(df["source"], df["text"].fillna("")):
        for w in set(t.split()):
            if s == focus:
                dfa[w] = dfa.get(w, 0) + 1
            else:
                dfb[w] = dfb.get(w, 0) + 1
    rows = []
    for w in set(dfa) | set(dfb):
        z = dfa.get(w, 0) / n_a - dfb.get(w, 0) / n_b
        rows.append((round(z * 1e9), w))
    rows.sort(key=lambda r: (-r[0], r[1]))
    assert list(out["token"]) == [w for _, w in rows[:5]]
    for i, (qz, w) in enumerate(rows[:5]):
        assert out["df_focus"].iloc[i] == dfa.get(w, 0)
        assert out["df_rest"].iloc[i] == dfb.get(w, 0)
        assert abs(out["zeta"].iloc[i] - qz / 1e9) < 2e-6


def test_tolerance_interval(ray_session):
    import math

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_tolerance_interval"](SF).to_pandas()
    y = np.sort(_daily_counts())
    n = len(y)

    def conf(r):
        return sum(
            math.comb(n, k) * 0.75**k * 0.25 ** (n - k)
            for k in range(0, n - 2 * r + 1)
        )

    best = 0
    for r in range(1, n // 2 + 1):
        if conf(r) >= 0.95 - 1e-9:
            best = r
        else:
            break
    assert out["n_days"].iloc[0] == n
    assert out["trim_r"].iloc[0] == best
    if best > 0:
        assert out["tol_lo"].iloc[0] == y[best]
        assert out["tol_hi"].iloc[0] == y[n - best - 1]
        assert abs(out["confidence"].iloc[0] - conf(best)) < 1e-4


def test_process_capability(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_process_capability"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    a, b = y[: n // 2], y[n // 2 :]
    usl = a.mean() + 3 * a.std(ddof=1)
    lsl = a.mean() - 3 * a.std(ddof=1)
    cp = (usl - lsl) / (6 * b.std(ddof=1))
    cpk = min(usl - b.mean(), b.mean() - lsl) / (3 * b.std(ddof=1))
    assert out["n_eval_days"].iloc[0] == len(b)
    assert abs(out["cp"].iloc[0] - cp) < 1e-5
    assert abs(out["cpk"].iloc[0] - cpk) < 1e-5
    assert out["n_out_of_spec"].iloc[0] == int(((b > usl) | (b < lsl)).sum())


def test_community_similarity(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_community_similarity"](SF).to_pandas()
    df = _events_pdf(["ts", "event_type"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    we = ((day + 3) % 7 >= 5).to_numpy()
    types = sorted(df["event_type"].unique())
    a = np.array([int(((df["event_type"] == t).to_numpy() & we).sum()) for t in types], float)
    b = np.array([int(((df["event_type"] == t).to_numpy() & ~we).sum()) for t in types], float)
    bc = np.abs(a - b).sum() / (a + b).sum()
    da = (a**2).sum() / a.sum() ** 2
    db = (b**2).sum() / b.sum() ** 2
    mh = 2 * (a * b).sum() / ((da + db) * a.sum() * b.sum())
    assert out["k_types"].iloc[0] == len(types)
    assert abs(out["bray_curtis"].iloc[0] - bc) < 1e-6
    assert abs(out["morisita_horn"].iloc[0] - mh) < 1e-6


def test_beta_diversity(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_beta_diversity"](SF).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    pres = {}
    for s, t in zip(df["source"], df["text"].fillna("")):
        for w in set(t.split()):
            pres.setdefault(w, set()).add(s)
    gamma = len(pres)
    k = df["source"].nunique()
    presence = sum(len(v) for v in pres.values())
    endemic = sum(1 for v in pres.values() if len(v) == 1)
    alpha = presence / k
    assert out["gamma_tokens"].iloc[0] == gamma
    assert out["n_sources"].iloc[0] == k
    assert abs(out["alpha_mean"].iloc[0] - alpha) < 1e-5
    assert abs(out["whittaker_beta"].iloc[0] - (gamma / alpha - 1)) < 1e-5
    assert out["endemic_tokens"].iloc[0] == endemic


def test_session_sensitivity(ray_session):
    from ptrail_ray.entry_queries import QUERIES
    from ptrail_ray.sources.transcripts import derive_from_events

    out = QUERIES["q_session_sensitivity"](SF).to_pandas()
    df = derive_from_events(SF).to_pandas().sort_values(["conv_id", "turn_idx"])
    us = df["ts"].astype("datetime64[us]").astype(np.int64)
    nc = df["conv_id"].nunique()
    for i, tau in enumerate((900, 3600, 14400)):
        breaks = 0
        for _, g in df.assign(us=us).groupby("conv_id"):
            t = g["us"].to_numpy()
            breaks += int((np.diff(t) > tau * 1_000_000).sum())
        assert out["gap_s"].iloc[i] == tau
        assert out["n_sessions"].iloc[i] == nc + breaks
        assert abs(
            out["sessions_per_conv"].iloc[i] - (nc + breaks) / nc
        ) < 1e-6


def test_causal_impact(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_causal_impact"](SF).to_pandas()
    y = _daily_counts().astype(float)
    n = len(y)
    h = n // 2
    t = np.arange(1, n + 1, dtype=float)
    beta, alpha = np.polyfit(t[:h], y[:h], 1)
    pred = (alpha + beta * t[h:]).sum()
    actual = y[h:].sum()
    assert out["post_days"].iloc[0] == n - h
    assert out["actual_total"].iloc[0] == int(actual)
    assert abs(out["counterfactual_total"].iloc[0] - pred) < 1e-2
    assert abs(out["abs_effect"].iloc[0] - (actual - pred)) < 1e-2
    assert abs(out["rel_effect"].iloc[0] - (actual - pred) / pred) < 1e-5


def test_quantile_treatment_effect(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_quantile_treatment_effect"](SF).to_pandas()
    df = _events_pdf(["user_id", "ts"])
    day = df["ts"].astype("datetime64[ns]").astype(np.int64) // 86_400_000_000_000
    bnd = (int(day.min()) + int(day.max()) + 1) // 2
    g = (
        pd.DataFrame({"u": df["user_id"], "p": (day >= bnd).astype(int)})
        .groupby("u")["p"]
        .sum()
    )
    for i, pct in enumerate((25, 50, 75)):
        for arm, col in ((1, "q_treat"), (0, "q_ctrl")):
            vals = np.sort(g[g.index % 2 == arm].to_numpy())
            rank = min(pct * len(vals) // 100, len(vals) - 1)
            assert out[col].iloc[i] == vals[rank]
        assert out["qte"].iloc[i] == out["q_treat"].iloc[i] - out["q_ctrl"].iloc[i]
