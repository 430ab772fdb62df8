"""Round-4 continuation-7 ops: clustering-agreement suite (ARI /
Fowlkes–Mallows / V-measure over the lang-ID contingency) and
tool-graph link prediction — each checked against an independent
pandas/numpy recomputation at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _lang_pred_pdf():
    """Independent recomputation of the stopword-ratio lang gate."""
    import pyarrow.parquet as pq

    from ptrail_ray.functions.textstats import STOPWORDS

    df = pq.read_table(f"{SF}/documents.parquet", columns=["text", "lang"]).to_pandas()
    preds = []
    for t in df["text"].fillna(""):
        toks = t.split()
        r = sum(1 for x in toks if x in STOPWORDS) / len(toks) if toks else 0.0
        preds.append("en" if toks and r > 0.05 else "unk")
    df["pred"] = preds
    return df


def test_adjusted_rand_and_fm(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_adjusted_rand"](SF).to_pandas()
    df = _lang_pred_pdf()
    cont = df.groupby(["lang", "pred"]).size()
    tp = int(sum(n * (n - 1) // 2 for n in cont))
    rp = int(sum(n * (n - 1) // 2 for n in df.groupby("lang").size()))
    cp = int(sum(n * (n - 1) // 2 for n in df.groupby("pred").size()))
    nt = len(df)
    ap = nt * (nt - 1) // 2
    assert out["tp_pairs"].iloc[0] == tp
    assert out["row_pairs"].iloc[0] == rp
    assert out["col_pairs"].iloc[0] == cp
    assert out["all_pairs"].iloc[0] == ap
    e = rp * cp / ap
    assert abs(out["ari"].iloc[0] - (tp - e) / ((rp + cp) / 2 - e)) < 1e-6
    assert abs(out["fm"].iloc[0] - tp / np.sqrt(rp * cp)) < 1e-6


def test_v_measure(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_v_measure"](SF).to_pandas()
    df = _lang_pred_pdf()
    n = len(df)
    cont = df.groupby(["lang", "pred"]).size()
    a = df.groupby("lang").size()
    b = df.groupby("pred").size()
    h_ck = -sum(
        (nij / n) * np.log(nij / b[k]) for (_, k), nij in cont.items()
    )
    h_kc = -sum(
        (nij / n) * np.log(nij / a[c]) for (c, _), nij in cont.items()
    )
    h_c = -sum((x / n) * np.log(x / n) for x in a)
    h_k = -sum((x / n) * np.log(x / n) for x in b)
    assert abs(out["h_ck"].iloc[0] - h_ck) < 1e-4
    assert abs(out["h_kc"].iloc[0] - h_kc) < 1e-4
    assert abs(out["h_c"].iloc[0] - h_c) < 1e-4
    assert abs(out["h_k"].iloc[0] - h_k) < 1e-4
    hom = 1 - h_ck / h_c if h_c else 1.0
    com = 1 - h_kc / h_k if h_k else 1.0
    assert abs(out["homogeneity"].iloc[0] - hom) < 1e-4
    assert abs(out["completeness"].iloc[0] - com) < 1e-4
    assert abs(out["v_measure"].iloc[0] - 2 * hom * com / (hom + com)) < 1e-4


def _tool_graph_pdf():
    from ptrail_ray.sources.transcripts import derive_from_events

    tr = (
        derive_from_events(SF)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "ts"])
    )
    und = set()
    for _, g in tr.groupby("conv_id"):
        tools = g["tool"].dropna().tolist()
        for x, y in zip(tools, tools[1:]):
            if x != y:
                und.add((min(x, y), max(x, y)))
    nbr: dict[str, set] = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    return und, nbr


def test_adamic_adar(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_adamic_adar"](SF).to_pandas()
    und, nbr = _tool_graph_pdf()
    nodes = sorted(nbr)
    expected = {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            common = nbr[u] & nbr[v]
            if not common:
                continue
            aa = sum(1.0 / np.log(len(nbr[w])) for w in common)
            ra = sum(1.0 / len(nbr[w]) for w in common)
            expected[(u, v)] = ((u, v) in und, len(common), aa, ra)
    assert len(out) == len(expected)
    for _, r in out.iterrows():
        adj, cn, aa, ra = expected[(r["u"], r["v"])]
        assert r["adjacent"] == int(adj)
        assert r["cn"] == cn
        assert abs(r["aa"] - aa) < 1e-4
        assert abs(r["ra"] - ra) < 1e-4


def _hourly_counts_pdf():
    import duckdb

    return duckdb.sql(
        f"""SELECT date_diff('hour', TIMESTAMP '1970-01-01', ts) AS h,
            count(*) AS c FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()["c"].to_numpy(np.int64)


def test_sample_entropy(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_sample_entropy"](SF).to_pandas()
    x = _hourly_counts_pdf()
    n = len(x)
    assert out["n_hours"].iloc[0] == n
    r = round(0.2 * x.std())  # population std
    assert out["r_tol"].iloc[0] == r
    b1 = a1 = a2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            if abs(x[i] - x[j]) <= r:
                b1 += 1
                if i + 1 < n and j + 1 < n and abs(x[i + 1] - x[j + 1]) <= r:
                    a1 += 1
                    if (
                        i + 2 < n
                        and j + 2 < n
                        and abs(x[i + 2] - x[j + 2]) <= r
                    ):
                        a2 += 1
    assert out["b1"].iloc[0] == b1
    assert out["a1"].iloc[0] == a1
    assert out["a2"].iloc[0] == a2
    assert abs(out["sampen1"].iloc[0] - np.log(b1 / a1)) < 1e-6
    assert abs(out["sampen2"].iloc[0] - np.log(a1 / a2)) < 1e-6


def test_higuchi_fd(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_higuchi_fd"](SF).to_pandas()
    x = _hourly_counts_pdf().astype(np.float64)
    n = len(x)
    lks = []
    for k in range(1, 6):
        lms = []
        for m in range(1, k + 1):
            idx = np.arange(m - 1, n, k)
            d = np.abs(np.diff(x[idx])).sum()
            lms.append(d * (n - 1) / ((len(idx) - 1) * k * k))
        lks.append(np.mean(lms))
        assert abs(out[f"lk{k}"].iloc[0] - lks[-1]) < 1e-3
    slope = np.polyfit(np.log(np.arange(1, 6)), np.log(lks), 1)[0]
    assert abs(out["fd"].iloc[0] - (-slope)) < 1e-4


def test_hurst_rs(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hurst_rs"](SF).to_pandas()
    x = _hourly_counts_pdf().astype(np.float64)
    n = len(x)
    rs_means = []
    for w in (16, 32, 64):
        vals = []
        for j in range(n // w):
            blk = x[j * w : (j + 1) * w]
            if blk.std() == 0:
                continue
            z = np.cumsum(blk - blk.mean())
            vals.append((z.max() - z.min()) / blk.std())
        rs_means.append(np.mean(vals))
        assert abs(out[f"rs{w}"].iloc[0] - rs_means[-1]) < 1e-3
    slope = np.polyfit(np.log([16.0, 32.0, 64.0]), np.log(rs_means), 1)[0]
    assert abs(out["hurst"].iloc[0] - slope) < 1e-4
    assert 0.0 < out["hurst"].iloc[0] < 1.5


def _docs_pv():
    import pyarrow.parquet as pq

    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["n_chars", "lang"]
    ).to_pandas()
    m = int(df["n_chars"].max())
    v = df["n_chars"].to_numpy(np.int64)
    return v, v / m, (df["lang"] == "en").to_numpy(np.float64), m


def test_brier_decomp(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_brier_decomp"](SF).to_pandas()
    v, p, y, m = _docs_pv()
    n = len(p)
    assert out["n"].iloc[0] == n
    assert out["m"].iloc[0] == m
    bs = ((p - y) ** 2).mean()
    assert abs(out["bs"].iloc[0] - bs) < 1e-6
    binid = np.minimum(10 * v // m, 9)
    rel = res = 0.0
    ybar = y.mean()
    for b in np.unique(binid):
        mask = binid == b
        nb = mask.sum()
        acc = y[mask].mean()
        conf = p[mask].mean()
        rel += nb * (conf - acc) ** 2
        res += nb * (acc - ybar) ** 2
    assert abs(out["reliability"].iloc[0] - rel / n) < 1e-5
    assert abs(out["resolution"].iloc[0] - res / n) < 1e-5
    assert abs(out["uncertainty"].iloc[0] - ybar * (1 - ybar)) < 1e-6


def test_log_loss(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_log_loss"](SF).to_pandas()
    v, p, y, m = _docs_pv()
    pc_ = np.clip(p, 1e-6, 1 - 1e-6)
    ll = -(y * np.log(pc_) + (1 - y) * np.log(1 - pc_)).mean()
    assert abs(out["log_loss"].iloc[0] - ll) < 1e-5
    assert abs(out["base_rate"].iloc[0] - y.mean()) < 1e-6
    assert abs(out["mean_conf"].iloc[0] - p.mean()) < 1e-6


def test_granger(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_granger"](SF).to_pandas()
    d = duckdb.sql(
        f"""SELECT date_diff('hour', TIMESTAMP '1970-01-01', ts) AS h,
            sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS p,
            sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS e
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    pv = d["p"].to_numpy(np.float64)
    ev = d["e"].to_numpy(np.float64)
    y, x1, x2 = pv[1:], pv[:-1], ev[:-1]
    t = len(y)
    assert out["t_obs"].iloc[0] == t
    Xf = np.column_stack([np.ones(t), x1, x2])
    bf, *_ = np.linalg.lstsq(Xf, y, rcond=None)
    rss_f = ((y - Xf @ bf) ** 2).sum()
    Xr = np.column_stack([np.ones(t), x1])
    br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
    rss_r = ((y - Xr @ br) ** 2).sum()
    assert abs(out["rss_f"].iloc[0] - rss_f) < max(1e-3, 1e-6 * rss_f)
    assert abs(out["rss_r"].iloc[0] - rss_r) < max(1e-3, 1e-6 * rss_r)
    assert abs(out["beta_err"].iloc[0] - bf[2]) < 1e-4
    f = (rss_r - rss_f) / (rss_f / (t - 3))
    assert abs(out["f_stat"].iloc[0] - f) < 1e-3


def _avg_ranks(vals):
    order = np.argsort(vals, kind="stable")
    n = len(vals)
    ranks = np.empty(n, np.float64)
    sv = np.asarray(vals)[order]
    i = 0
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    return ranks


def test_cucconi(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cucconi"](SF).to_pandas()
    x = _hourly_counts_pdf()
    h = np.arange(len(x))  # only used via the query's own weekend defn
    import duckdb

    d = duckdb.sql(
        f"""SELECT date_diff('hour', TIMESTAMP '1970-01-01', ts) AS h,
            count(*) AS c FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    hv = d["h"].to_numpy(np.int64)
    c = d["c"].to_numpy(np.int64)
    we = (hv // 24 + 3) % 7 >= 5
    nt, n, m = len(c), int(we.sum()), int((~we).sum())
    assert out["n_weekend"].iloc[0] == n
    assert out["n_weekday"].iloc[0] == m
    r = _avg_ranks(c)
    su = (r[we] ** 2).sum()
    sv = ((nt + 1 - r[we]) ** 2).sum()
    den = np.sqrt(n * m * (nt + 1) * (2 * nt + 1) * (8 * nt + 11) / 5.0)
    u = (6 * su - n * (nt + 1) * (2 * nt + 1)) / den
    v = (6 * sv - n * (nt + 1) * (2 * nt + 1)) / den
    rho = 2 * (nt**2 - 4) / ((2 * nt + 3) * (8 * nt + 11)) - 1
    assert abs(out["u_stat"].iloc[0] - u) < 1e-4
    assert abs(out["v_stat"].iloc[0] - v) < 1e-4
    assert abs(out["rho"].iloc[0] - rho) < 1e-6
    cstat = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert abs(out["cucconi_c"].iloc[0] - cstat) < 1e-3


def test_conover_squared_ranks(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_conover_squared_ranks"](SF).to_pandas()
    d = duckdb.sql(
        f"""SELECT date_diff('hour', TIMESTAMP '1970-01-01', ts) AS h,
            count(*) AS c FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    hv = d["h"].to_numpy(np.int64)
    c = d["c"].to_numpy(np.float64)
    we = (hv // 24 + 3) % 7 >= 5
    z = np.where(we, np.abs(c - c[we].mean()), np.abs(c - c[~we].mean()))
    r = _avg_ranks(z)
    a = r**2
    nt, n, m = len(c), int(we.sum()), int((~we).sum())
    t_stat = a[we].sum()
    e = n * a.mean()
    var = n * m * (nt * (a**2).sum() - a.sum() ** 2) / (nt**2 * (nt - 1))
    zs = (t_stat - e) / np.sqrt(var)
    assert out["n_weekend"].iloc[0] == n
    assert abs(out["t4"].iloc[0] / 4.0 - t_stat) < 1e-6
    assert abs(out["z_sqrank"].iloc[0] - zs) < 1e-4


def test_quade(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_quade"](SF).to_pandas()
    d = duckdb.sql(
        f"""SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
            event_type AS et, count(*) AS c
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).df()
    grid = (
        d.pivot(index="d", columns="et", values="c").fillna(0).sort_index()
    )
    x = grid.to_numpy(np.float64)
    b, k = x.shape
    assert out["b_blocks"].iloc[0] == b
    assert out["k_treat"].iloc[0] == k
    r = np.vstack([_avg_ranks(row) for row in x])
    q = _avg_ranks(x.max(axis=1) - x.min(axis=1))
    s = q[:, None] * (r - (k + 1) / 2.0)
    a_stat = (s**2).sum()
    sj = s.sum(axis=0)
    b_stat = (sj**2).sum() / b
    f = (b - 1) * b_stat / (a_stat - b_stat)
    assert abs(out["a16"].iloc[0] / 16.0 - a_stat) < 1e-6
    assert abs(out["sb2"].iloc[0] / 16.0 - (sj**2).sum()) < 1e-6
    assert abs(out["quade_f"].iloc[0] - f) < 1e-4


def _hod_we_pdf():
    import duckdb

    d = duckdb.sql(
        f"""SELECT date_diff('hour', TIMESTAMP '1970-01-01', ts) AS h
            FROM '{SF}/events.parquet'"""
    ).df()["h"].to_numpy(np.int64)
    hod = d % 24
    we = (d // 24 + 3) % 7 >= 5
    a = np.bincount(hod[we], minlength=24).astype(np.float64)
    b = np.bincount(hod[~we], minlength=24).astype(np.float64)
    return a, b


def test_hellinger(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_hellinger"](SF).to_pandas()
    a, b = _hod_we_pdf()
    p, q = a / a.sum(), b / b.sum()
    bc = np.sqrt(p * q).sum()
    assert out["n_weekend"].iloc[0] == a.sum()
    assert out["n_weekday"].iloc[0] == b.sum()
    assert abs(out["bc"].iloc[0] - bc) < 1e-6
    assert abs(out["hellinger"].iloc[0] - np.sqrt(1 - bc)) < 1e-5


def test_total_variation(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_total_variation"](SF).to_pandas()
    a, b = _hod_we_pdf()
    p, q = a / a.sum(), b / b.sum()
    assert abs(out["tv"].iloc[0] - 0.5 * np.abs(p - q).sum()) < 1e-6
    assert abs(out["linf"].iloc[0] - np.abs(p - q).max()) < 1e-6
    assert 0.0 <= out["tv"].iloc[0] <= 1.0


def test_cressie_read(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cressie_read"](SF).to_pandas()
    a, b = _hod_we_pdf()
    o = a + b
    n = o.sum()
    e = n / 24.0
    assert out["n"].iloc[0] == n
    lam = 2.0 / 3.0
    cr = 2.0 / (lam * (lam + 1)) * (o * ((o / e) ** lam - 1)).sum()
    assert abs(out["cr_lambda23"].iloc[0] - cr) < 1e-4
    ft = 2.0 / (-0.5 * 0.5) * (o * ((o / e) ** -0.5 - 1)).sum()
    # identity: CR(-1/2) equals 4*sum((sqrt(O)-sqrt(E))^2) up to O-E total
    ft_classic = 4.0 * ((np.sqrt(o) - np.sqrt(e)) ** 2).sum()
    assert abs(out["cr_freeman_tukey"].iloc[0] - ft) < 1e-4
    assert abs(ft - ft_classic) < 1e-6


def test_yule_k(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_yule_k"](SF).to_pandas()
    toks = duckdb.sql(
        f"""SELECT unnest(list_filter(regexp_split_to_array(
              coalesce(text,''), '\\s+'), x -> x <> '')) AS w
            FROM '{SF}/documents.parquet'"""
    ).df()["w"]
    freqs = toks.value_counts().to_numpy(np.float64)
    n, vt = freqs.sum(), len(freqs)
    assert out["n_tokens"].iloc[0] == n
    assert out["n_types"].iloc[0] == vt
    assert out["v1"].iloc[0] == (freqs == 1).sum()
    assert out["v2"].iloc[0] == (freqs == 2).sum()
    k = 1e4 * ((freqs**2).sum() - n) / n**2
    assert abs(out["yule_k"].iloc[0] - k) < 1e-4
    d = ((freqs * (freqs - 1)).sum()) / (n * (n - 1))
    assert abs(out["simpson_d"].iloc[0] - d) < 1e-6
    assert abs(out["herdan_c"].iloc[0] - np.log(vt) / np.log(n)) < 1e-6
    assert abs(out["brunet_w"].iloc[0] - n ** (vt**-0.165)) < 1e-3


def test_ar2_yw(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_ar2_yw"](SF).to_pandas()
    x = _hourly_counts_pdf().astype(np.float64)
    z = x - x.mean()
    c0 = (z * z).sum()
    r1 = (z[:-1] * z[1:]).sum() / c0
    r2 = (z[:-2] * z[2:]).sum() / c0
    assert abs(out["r1"].iloc[0] - r1) < 1e-6
    assert abs(out["r2"].iloc[0] - r2) < 1e-6
    phi1 = r1 * (1 - r2) / (1 - r1**2)
    phi2 = (r2 - r1**2) / (1 - r1**2)
    assert abs(out["phi1"].iloc[0] - phi1) < 1e-6
    assert abs(out["phi2"].iloc[0] - phi2) < 1e-6
    assert abs(out["innov_ratio"].iloc[0] - (1 - phi1 * r1 - phi2 * r2)) < 1e-6


def test_anderson_darling(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_anderson_darling"](SF).to_pandas()
    sec = duckdb.sql(
        f"""SELECT date_diff('second', TIMESTAMP '1970-01-01', ts) % 86400
              AS s
            FROM '{SF}/events.parquet'"""
    ).df()["s"].to_numpy(np.int64)
    u = np.sort((sec + 0.5) / 86400.0)
    n = len(u)
    assert out["n"].iloc[0] == n
    i = np.arange(1, n + 1)
    a2 = -n - ((2 * i - 1) * (np.log(u) + np.log(1 - u[::-1]))).sum() / n
    assert abs(out["a2"].iloc[0] - a2) < 1e-3


def test_lz76(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_lz76"](SF).to_pandas()
    x = _hourly_counts_pdf()
    s = "".join(
        "u" if b > a else ("d" if b < a else "f") for a, b in zip(x, x[1:])
    )
    i, cnt = 0, 0
    while i < len(s):
        k = 0
        while i + k < len(s) and s[i : i + k + 1] in s[: i + k]:
            k += 1
        i += k + 1
        cnt += 1
    assert out["seq_len"].iloc[0] == len(s)
    assert out["lz76_c"].iloc[0] == cnt
    assert abs(out["c_norm"].iloc[0] - cnt * np.log(len(s)) / len(s)) < 1e-6


def test_rqa(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_rqa"](SF).to_pandas()
    x = _hourly_counts_pdf()
    n = len(x)
    r = round(0.2 * x.std())
    assert out["r_tol"].iloc[0] == r
    rec = detp = 0
    d = np.abs(x[:, None] - x[None, :]) <= r
    for i in range(n):
        for j in range(i + 1, n):
            if d[i, j]:
                rec += 1
                prev_ok = i >= 1 and j >= 1 and d[i - 1, j - 1]
                next_ok = i + 1 < n and j + 1 < n and d[i + 1, j + 1]
                if prev_ok or next_ok:
                    detp += 1
    assert out["rec_pairs"].iloc[0] == rec
    assert out["det_pairs"].iloc[0] == detp
    assert abs(out["rr"].iloc[0] - rec / (n * (n - 1) / 2)) < 1e-6
    assert abs(out["det"].iloc[0] - detp / rec) < 1e-6


def test_spectral_flatness(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_spectral_flatness"](SF).to_pandas()
    x = _hourly_counts_pdf().astype(np.float64)
    n = len(x)
    f = np.fft.rfft(x)
    ps = (np.abs(f[1:13]) ** 2) / n
    flat = np.exp(np.mean(np.log(ps))) / np.mean(ps)
    assert out["n_hours"].iloc[0] == n
    assert out["dominant_k"].iloc[0] == int(np.argmax(ps)) + 1
    assert abs(out["peak_power"].iloc[0] - ps.max()) < max(
        1e-3, 1e-6 * ps.max()
    )
    assert abs(out["flatness"].iloc[0] - flat) < 1e-4
    assert 0.0 < out["flatness"].iloc[0] <= 1.0


def test_isotonic(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_isotonic"](SF).to_pandas()
    ne = out["n_events"].to_numpy(np.float64)
    npu = out["n_purchases"].to_numpy(np.float64)
    rate = npu / ne
    # independent PAVA
    vals = list(rate)
    wts = list(ne)
    blocks = [[v, w] for v, w in zip(vals, wts)]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] > blocks[i + 1][0] + 1e-15:
            v = (
                blocks[i][0] * blocks[i][1]
                + blocks[i + 1][0] * blocks[i + 1][1]
            ) / (blocks[i][1] + blocks[i + 1][1])
            blocks[i] = [v, blocks[i][1] + blocks[i + 1][1]]
            del blocks[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    fit = []
    bi = 0
    acc = blocks[0][1]
    for w in ne:
        fit.append(blocks[bi][0])
        acc -= w
        if acc <= 1e-9 and bi + 1 < len(blocks):
            bi += 1
            acc = blocks[bi][1]
    iso = out["iso_rate"].to_numpy(np.float64)
    assert np.all(np.diff(iso) >= -1e-9)  # monotone
    assert np.allclose(iso, fit, atol=1e-5)


def test_croston(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_croston"](SF).to_pandas()
    d = duckdb.sql(
        f"""SELECT date_diff('hour', TIMESTAMP '1970-01-01', ts) AS h,
            sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS p
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    h = d["h"].to_numpy(np.int64)
    p = d["p"].to_numpy(np.int64)
    pos = h - h[0] + 1
    nz = p > 0
    dem, tpos = p[nz], pos[nz]
    gaps = np.concatenate(([tpos[0]], np.diff(tpos)))
    z, pp = float(dem[0]), float(gaps[0])
    for dd, gg in zip(dem[1:], gaps[1:]):
        z = 0.9 * z + 0.1 * dd
        pp = 0.9 * pp + 0.1 * gg
    assert out["k_demands"].iloc[0] == nz.sum()
    assert abs(out["z_size"].iloc[0] - z) < 1e-6
    assert abs(out["p_interval"].iloc[0] - pp) < 1e-6
    assert abs(out["forecast"].iloc[0] - z / pp) < 1e-6


def test_watson_u2(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_watson_u2"](SF).to_pandas()
    sec = duckdb.sql(
        f"""SELECT date_diff('second', TIMESTAMP '1970-01-01', ts) % 86400
              AS s FROM '{SF}/events.parquet'"""
    ).df()["s"].to_numpy(np.int64)
    u = np.sort((sec + 0.5) / 86400.0)
    n = len(u)
    i = np.arange(1, n + 1)
    w2 = 1.0 / (12 * n) + ((u - (2 * i - 1) / (2 * n)) ** 2).sum()
    u2 = w2 - n * (u.mean() - 0.5) ** 2
    assert out["n"].iloc[0] == n
    assert abs(out["w2"].iloc[0] - w2) < 1e-4
    assert abs(out["ubar"].iloc[0] - u.mean()) < 1e-6
    assert abs(out["u2"].iloc[0] - u2) < 1e-4


def _hourly_pe_pdf():
    import duckdb

    d = duckdb.sql(
        f"""SELECT date_diff('hour', TIMESTAMP '1970-01-01', ts) AS h,
            sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS p,
            sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS e
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    return d["p"].to_numpy(np.float64), d["e"].to_numpy(np.float64)


def test_distance_corr(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_distance_corr"](SF).to_pandas()
    p, e = _hourly_pe_pdf()
    n = len(p)

    def centered(x):
        a = np.abs(x[:, None] - x[None, :])
        return a - a.mean(0)[None, :] - a.mean(1)[:, None] + a.mean()

    A, B = centered(p), centered(e)
    dcov2 = (A * B).mean()
    dcor2 = dcov2 / np.sqrt((A * A).mean() * (B * B).mean())
    assert out["n_hours"].iloc[0] == n
    assert abs(out["dcor2"].iloc[0] - dcor2) < 1e-5
    assert abs(out["dcor"].iloc[0] - np.sqrt(dcor2)) < 1e-5
    assert 0.0 <= out["dcor"].iloc[0] <= 1.0


def test_theil_decomp(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_theil_decomp"](SF).to_pandas()
    d = duckdb.sql(
        f"""SELECT p.p_brand AS brand,
              sum(round(l.l_extendedprice*(1.0-l.l_discount)*10000.0)) AS x
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
            GROUP BY l.l_partkey, p.p_brand"""
    ).df()
    x = d["x"].to_numpy(np.float64)
    n, xt = len(x), x.sum()
    t_total = ((x / xt) * np.log((x / xt) / (1.0 / n))).sum()
    tb = 0.0
    tw = 0.0
    for _, g in d.groupby("brand"):
        gx = g["x"].to_numpy(np.float64)
        xg, ng = gx.sum(), len(gx)
        tb += (xg / xt) * np.log((xg / xt) / (ng / n))
        tw += (xg / xt) * ((gx / xg) * np.log((gx / xg) * ng)).sum()
    assert out["n_parts"].iloc[0] == n
    assert abs(out["theil_between"].iloc[0] - tb) < 1e-5
    assert abs(out["theil_within"].iloc[0] - tw) < 1e-5
    assert abs(out["theil_total"].iloc[0] - t_total) < 1e-4


def test_bass_diffusion(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bass_diffusion"](SF).to_pandas()
    d = duckdb.sql(
        f"""SELECT CAST(ts AS DATE) AS d,
            sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS s
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    s = d["s"].to_numpy(np.float64)
    c = np.concatenate(([0.0], np.cumsum(s)[:-1]))
    X = np.column_stack([np.ones(len(s)), c, c * c])
    beta, *_ = np.linalg.lstsq(X, s, rcond=None)
    a, b, cc = beta
    assert out["t_days"].iloc[0] == len(s)
    assert abs(out["coef_a"].iloc[0] - a) < max(1e-4, 1e-5 * abs(a))
    assert abs(out["coef_b"].iloc[0] - b) < 1e-4
    assert abs(out["coef_c"].iloc[0] - cc) < 1e-4
    if not pd.isna(out["m_market"].iloc[0]):
        m = out["m_market"].iloc[0]
        # m is a root of c*m^2 + b*m + a = 0
        assert abs(cc * m * m + b * m + a) < 1e-3
        assert abs(out["p_innov"].iloc[0] - a / m) < 1e-4
        assert abs(out["q_imit"].iloc[0] - (-cc * m)) < 1e-4


import re


def _docs_text_pdf():
    import pyarrow.parquet as pq

    return pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pandas()


def test_readability(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = (
        QUERIES["q_readability"](SF)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = _docs_text_pdf()
    for _, row in docs.sample(25, random_state=0).iterrows():
        t = row["text"] or ""
        w = len(re.findall(r"\S+", t))
        s = max(len(re.findall(r"[.!?]+", t)), 1)
        syl = max(len(re.findall(r"[aeiouAEIOU]+", t)), 1)
        lt = len(re.findall(r"[A-Za-z0-9]", t))
        r = out.loc[row["doc_id"]]
        assert r["n_words"] == w and r["n_sents"] == s
        assert r["n_syll"] == syl and r["n_letters"] == lt
        if w:
            assert abs(
                r["flesch"] - (206.835 - 1.015 * w / s - 84.6 * syl / w)
            ) < 1e-4
            assert abs(
                r["ari"] - (4.71 * lt / w + 0.5 * w / s - 21.43)
            ) < 1e-4
            assert abs(
                r["coleman_liau"]
                - (0.0588 * 100 * lt / w - 0.296 * 100 * s / w - 15.8)
            ) < 1e-4


def test_gunning_fog(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_gunning_fog"](SF).to_pandas().set_index("source")
    docs = _docs_text_pdf()
    agg = {}
    for _, row in docs.iterrows():
        t = row["text"] or ""
        toks = re.findall(r"\S+", t)
        if not toks:
            continue
        w = len(toks)
        s = max(len(re.findall(r"[.!?]+", t)), 1)
        cw = sum(1 for x in toks if len(re.findall(r"[aeiouAEIOU]+", x)) >= 3)
        fog = 0.4 * (w / s + 100 * cw / w)
        smog = 1.043 * np.sqrt(cw * 30.0 / s) + 3.1291
        a = agg.setdefault(row["source"], [0, 0.0, 0.0])
        a[0] += 1
        a[1] += fog
        a[2] += smog
    for src, (n, f, m) in agg.items():
        r = out.loc[src]
        assert r["n_docs"] == n
        assert abs(r["mean_fog"] - f / n) < 1e-4
        assert abs(r["mean_smog"] - m / n) < 1e-4


def test_sentence_stats(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_sentence_stats"](SF).to_pandas().set_index("source")
    docs = _docs_text_pdf()
    agg = {}
    for _, row in docs.iterrows():
        for frag in re.split(r"[.!?]+", row["text"] or ""):
            w = len(re.findall(r"\S+", frag))
            if w > 0:
                agg.setdefault(row["source"], []).append(w)
    for src, ws in agg.items():
        ws = np.array(ws, np.float64)
        r = out.loc[src]
        assert r["n_sents"] == len(ws)
        assert r["max_words"] == ws.max()
        assert abs(r["mean_words"] - ws.mean()) < 1e-6
        assert abs(r["var_words"] - ws.var()) < 1e-5


def _emb_pdf():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    x = np.stack(
        [np.asarray(v, np.float64) for v in t["embedding"].to_pylist()]
    )
    return x, t["label"].to_numpy(zero_copy_only=False).astype(np.int64)


def test_calinski_harabasz(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_calinski_harabasz"](SF).to_pandas()
    x, lab = _emb_pdf()
    n, k = len(x), len(np.unique(lab))
    m = x.mean(axis=0)
    tr_b = tr_w = 0.0
    for l in np.unique(lab):
        g = x[lab == l]
        c = g.mean(axis=0)
        tr_b += len(g) * ((c - m) ** 2).sum()
        tr_w += ((g - c) ** 2).sum()
    ch = (tr_b / (k - 1)) / (tr_w / (n - k))
    assert out["n_vecs"].iloc[0] == n
    assert out["k_labels"].iloc[0] == k
    assert abs(out["tr_between"].iloc[0] - tr_b) < 1e-3
    assert abs(out["tr_within"].iloc[0] - tr_w) < 1e-3
    assert abs(out["ch"].iloc[0] - ch) < 1e-3


def test_davies_bouldin(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_davies_bouldin"](SF).to_pandas()
    x, lab = _emb_pdf()
    labels = np.unique(lab)
    cents = {l: x[lab == l].mean(axis=0) for l in labels}
    sg = {
        l: np.sqrt(((x[lab == l] - cents[l]) ** 2).sum(axis=1).mean())
        for l in labels
    }
    db = 0.0
    for g in labels:
        db += max(
            (sg[g] + sg[h]) / np.linalg.norm(cents[g] - cents[h])
            for h in labels
            if h != g
        )
    db /= len(labels)
    assert out["k_labels"].iloc[0] == len(labels)
    assert abs(out["db_index"].iloc[0] - db) < 1e-4


def test_mmd_linear(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mmd_linear"](SF).to_pandas()
    x, lab = _emb_pdf()
    mu_a = x[lab == 0].mean(axis=0)
    mu_b = x[lab == 1].mean(axis=0)
    mmd2 = ((mu_a - mu_b) ** 2).sum()
    assert out["n_a"].iloc[0] == (lab == 0).sum()
    assert out["n_b"].iloc[0] == (lab == 1).sum()
    assert abs(out["mmd2"].iloc[0] - mmd2) < 1e-5
    assert abs(out["mmd"].iloc[0] - np.sqrt(mmd2)) < 1e-5


def _daily_pdf():
    import duckdb

    d = duckdb.sql(
        f"""SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
            count(*) AS c FROM '{SF}/events.parquet'
            GROUP BY 1 ORDER BY 1"""
    ).df()
    return d["d"].to_numpy(np.int64), d["c"].to_numpy(np.int64)


def test_siegel_slopes(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_siegel_slopes"](SF).to_pandas()
    d, c = _daily_pdf()
    n = len(d)
    inner = []
    for i in range(n):
        sl = [(c[j] - c[i]) / (d[j] - d[i]) for j in range(n) if j != i]
        inner.append(np.median(sl))
    slope = np.median(inner)
    assert out["n_days"].iloc[0] == n
    assert abs(out["siegel_slope"].iloc[0] - slope) < 1e-6


def test_bartels_rank_vn(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_bartels_rank_vn"](SF).to_pandas()
    _, c = _daily_pdf()
    r = pd.Series(c).rank(method="average").to_numpy()
    n = len(r)
    rvn = ((r[:-1] - r[1:]) ** 2).sum() / ((r - r.mean()) ** 2).sum()
    assert abs(out["rvn"].iloc[0] - rvn) < 1e-6
    assert out["num4"].iloc[0] / 4.0 == ((r[:-1] - r[1:]) ** 2).sum()
    var = (
        4 * (n - 2) * (5 * n * n - 2 * n - 9)
        / (5 * n * (n + 1) * (n - 1) ** 2)
    )
    assert abs(out["z_rvn"].iloc[0] - (rvn - 2) / np.sqrt(var)) < 1e-5


def test_cox_stuart(ray_session):
    import math

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cox_stuart"](SF).to_pandas()
    _, c = _daily_pdf()
    n = len(c)
    m = n // 2
    pairs = list(zip(c[:m], c[n - m :]))
    pos = sum(1 for a, b in pairs if b > a)
    neg = sum(1 for a, b in pairs if b < a)
    mm = pos + neg
    st = max(pos, neg)
    p = min(1.0, 2 * sum(math.comb(mm, k) for k in range(st, mm + 1)) / 2**mm)
    assert out["n_up"].iloc[0] == pos
    assert out["n_down"].iloc[0] == neg
    assert abs(out["p_two"].iloc[0] - p) < 1e-6


def _hod_we_pur_pdf():
    import duckdb

    d = duckdb.sql(
        f"""SELECT date_diff('hour', TIMESTAMP '1970-01-01', ts) AS h,
            CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS pur
            FROM '{SF}/events.parquet'"""
    ).df()
    hod = (d["h"] % 24).to_numpy(np.int64)
    we = ((d["h"] // 24 + 3) % 7 >= 5).to_numpy()
    pur = d["pur"].to_numpy(np.int64)
    rows = []
    for h in range(24):
        m = hod == h
        rows.append(
            (
                int((m & we).sum()),
                int(pur[m & we].sum()),
                int((m & ~we).sum()),
                int(pur[m & ~we].sum()),
            )
        )
    return np.array(rows, np.float64)  # n_we, k_we, n_wd, k_wd


def test_mantel_haenszel(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_mantel_haenszel"](SF).to_pandas()
    r = _hod_we_pur_pdf()
    n_we, k_we, n_wd, k_wd = r.T
    a, b, c, d = k_we, n_we - k_we, k_wd, n_wd - k_wd
    or_crude = (a.sum() * d.sum()) / (b.sum() * c.sum())
    nt = n_we + n_wd
    or_mh = (a * d / nt).sum() / (b * c / nt).sum()
    assert out["n_strata"].iloc[0] == 24
    assert abs(out["or_crude"].iloc[0] - or_crude) < 1e-5
    assert abs(out["or_mh"].iloc[0] - or_mh) < 1e-4


def test_direct_standardization(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_direct_standardization"](SF).to_pandas()
    r = _hod_we_pur_pdf()
    n_we, k_we, n_wd, k_wd = r.T
    std = ((n_wd / n_wd.sum()) * (k_we / n_we)).sum()
    assert abs(out["crude_we"].iloc[0] - k_we.sum() / n_we.sum()) < 1e-6
    assert abs(out["crude_wd"].iloc[0] - k_wd.sum() / n_wd.sum()) < 1e-6
    assert abs(out["std_we"].iloc[0] - std) < 1e-5


def test_kitagawa(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_kitagawa"](SF).to_pandas()
    r = _hod_we_pur_pdf()
    n_we, k_we, n_wd, k_wd = r.T
    w1, w2 = n_we / n_we.sum(), n_wd / n_wd.sum()
    r1, r2 = k_we / n_we, k_wd / n_wd
    comp = ((w1 - w2) * (r1 + r2) / 2).sum()
    rate = ((w1 + w2) / 2 * (r1 - r2)).sum()
    delta = k_we.sum() / n_we.sum() - k_wd.sum() / n_wd.sum()
    assert abs(out["delta"].iloc[0] - delta) < 1e-6
    assert abs(out["comp_effect"].iloc[0] - comp) < 1e-5
    assert abs(out["rate_effect"].iloc[0] - rate) < 1e-5
    # identity: decomposition sums to the gap
    assert abs(
        out["comp_effect"].iloc[0] + out["rate_effect"].iloc[0]
        - out["delta"].iloc[0]
    ) < 1e-5


def _surv_pdf():
    from ptrail_ray.sources.transcripts import derive_from_events

    tr = (
        derive_from_events(SF)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "ts"])
    )
    rows = []
    for _, g in tr.groupby("conv_id"):
        t0 = g["ts"].iloc[0]
        tooled = g[g["tool"].notna()]
        coh = int(g["role"].iloc[0] == "user")
        if len(tooled):
            dur = (tooled["ts"].iloc[0] - t0).value // 10**9
            rows.append((dur, coh, 1, tooled["tool"].iloc[0]))
        else:
            dur = (g["ts"].iloc[-1] - t0).value // 10**9
            rows.append((dur, coh, 0, None))
    return pd.DataFrame(rows, columns=["dur", "coh", "ev", "ftool"])


def _risk_sets(df):
    times = sorted(df.loc[df["ev"] > 0, "dur"].unique())
    out = []
    for t in times:
        at = df[df["dur"] >= t]
        dd = df[(df["dur"] == t) & (df["ev"] > 0)]
        out.append((t, at, dd))
    return out


def test_weighted_logrank(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_weighted_logrank"](SF).to_pandas()
    df = _surv_pdf()
    gn = 0.0
    vg = 0.0
    twn = 0.0
    vtw = 0.0
    for t, at, dd in _risk_sets(df):
        nn, n1 = len(at), int((at["coh"] == 1).sum())
        d, d1 = len(dd), int((dd["coh"] == 1).sum())
        e1 = d * n1 / nn
        v = (
            (d * n1 / nn) * (nn - n1) / nn * (nn - d) / (nn - 1)
            if nn > 1
            else 0.0
        )
        gn += nn * (d1 - e1)
        vg += nn * nn * v
        twn += np.sqrt(nn) * (d1 - e1)
        vtw += nn * v
    assert abs(out["gehan_num"].iloc[0] - gn) < 1e-6
    assert abs(out["z_gehan"].iloc[0] - gn / np.sqrt(vg)) < 1e-4
    assert abs(out["z_tarone_ware"].iloc[0] - twn / np.sqrt(vtw)) < 1e-4


def test_cumulative_incidence(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_cumulative_incidence"](SF).to_pandas()
    df = _surv_pdf()
    s = 1.0
    cif1 = cif2 = 0.0
    for i, (t, at, dd) in enumerate(_risk_sets(df)):
        nn = len(at)
        d1 = int((dd["ftool"] == "tool-1").sum())
        d2 = len(dd) - d1
        r = out.iloc[i]
        assert r["dur_s"] == t and r["n_risk"] == nn
        assert r["d_cause1"] == d1 and r["d_cause2"] == d2
        assert abs(r["s_minus"] - s) < 1e-5
        cif1 += s * d1 / nn
        cif2 += s * d2 / nn
        assert abs(r["cif1"] - cif1) < 1e-5
        assert abs(r["cif2"] - cif2) < 1e-5
        s *= (nn - d1 - d2) / nn
    # CIFs + survival partition probability space
    assert abs(cif1 + cif2 + s - 1.0) < 1e-9


def test_km_median(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_km_median"](SF).to_pandas()
    df = _surv_pdf()
    s = 1.0
    gcum = 0.0
    med = None
    for t, at, dd in _risk_sets(df):
        nn, d = len(at), len(dd)
        s *= (nn - d) / nn
        if nn > d:
            gcum += d / (nn * (nn - d))
        if s <= 0.5:
            med = (t, s, s * np.sqrt(gcum))
            break
    if med is None:
        assert len(out) == 0
    else:
        assert out["median_s"].iloc[0] == med[0]
        assert abs(out["s_at_median"].iloc[0] - med[1]) < 1e-6
        assert abs(out["greenwood_se"].iloc[0] - med[2]) < 1e-6
