"""Round-4 continuation-6 ops: survival estimators (Nelson–Aalen,
RMST) and tool-graph clustering — each checked against an independent
pandas/numpy recomputation at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _transcripts_pdf():
    from ptrail_ray.sources.transcripts import derive_from_events

    df = derive_from_events(SF).to_pandas()
    return df.sort_values(["conv_id", "turn_idx", "ts"]).reset_index(drop=True)


def _risk_table_pdf():
    tr = _transcripts_pdf()
    rows = []
    for _, g in tr.groupby("conv_id"):
        t0 = g["ts"].iloc[0]
        tooled = g[g["tool"].notna()]
        if len(tooled):
            dur = (tooled["ts"].iloc[0] - t0).value // 10**9
            ev = 1
        else:
            dur = (g["ts"].iloc[-1] - t0).value // 10**9
            ev = 0
        rows.append((int(dur), ev))
    df = pd.DataFrame(rows, columns=["dur", "ev"])
    times = sorted(df.loc[df["ev"] == 1, "dur"].unique())
    out = []
    for t in times:
        nn = int((df["dur"] >= t).sum())
        d = int(((df["dur"] == t) & (df["ev"] == 1)).sum())
        out.append((t, nn, d))
    return out


def test_nelson_aalen(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_nelson_aalen"](SF).to_pandas()
    rt = _risk_table_pdf()
    assert list(out["dur_s"]) == [t for t, _, _ in rt]
    assert list(out["n_risk"]) == [nn for _, nn, _ in rt]
    assert list(out["n_event"]) == [d for _, _, d in rt]
    h = 0.0
    for i, (t, nn, d) in enumerate(rt):
        h += d / nn
        assert abs(out["na_h"].iloc[i] - h) < 5e-6
        assert abs(out["fh_s"].iloc[i] - np.exp(-h)) < 5e-6
    # cumulative hazard is nondecreasing, FH survival nonincreasing
    assert (np.diff(out["na_h"].to_numpy()) >= 0).all()
    assert (np.diff(out["fh_s"].to_numpy()) <= 1e-12).all()


def test_rmst(ray_session):
    from ptrail_ray.entry_queries import QUERIES, RMST_TAU_S

    out = QUERIES["q_rmst"](SF).to_pandas()
    rt = _risk_table_pdf()
    s, prev_t, area, steps = 1.0, 0, 0.0, 0
    for t, nn, d in rt:
        if t > RMST_TAU_S:
            break
        area += s * (t - prev_t)
        s *= (nn - d) / nn
        prev_t = t
        steps += 1
    area += s * (RMST_TAU_S - prev_t)
    assert out["tau_s"].iloc[0] == RMST_TAU_S
    assert out["n_steps"].iloc[0] == steps
    assert abs(out["rmst_s"].iloc[0] - area) < 1e-2
    assert 0.0 < out["rmst_s"].iloc[0] <= RMST_TAU_S


def test_clustering_coef(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_clustering_coef"](SF).to_pandas()
    tr = _transcripts_pdf()
    und = set()
    for _, g in tr.groupby("conv_id"):
        tools = g.loc[g["tool"].notna(), "tool"].tolist()
        for a, b in zip(tools, tools[1:]):
            if a != b:
                und.add((min(a, b), max(a, b)))
    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    assert list(out["tool"]) == sorted(nbr)
    for _, r in out.iterrows():
        ns = sorted(nbr[r["tool"]])
        assert r["degree"] == len(ns)
        tri = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if (min(ns[i], ns[j]), max(ns[i], ns[j])) in und
        )
        assert r["n_tri"] == tri
        if len(ns) >= 2:
            assert abs(r["lcc"] - 2 * tri / (len(ns) * (len(ns) - 1))) < 5e-6
        else:
            assert pd.isna(r["lcc"])


def _daily_counts_pdf():
    import duckdb

    return duckdb.sql(
        f"""SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
            count(*) AS c FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()


def test_jonckheere(ray_session):
    import duckdb

    from ptrail_ray.entry_queries import QUERIES

    out = QUERIES["q_jonckheere"](SF).to_pandas()
    per = duckdb.sql(
        f"""SELECT o.o_orderpriority AS pr, count(*) AS k
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority"""
    ).df()
    groups = [g["k"].to_numpy() for _, g in per.groupby("pr", sort=True)]
    jt2 = 0
    for gi in range(len(groups)):
        for gj in range(gi + 1, len(groups)):
            a, b = groups[gi], groups[gj]
            jt2 += int(2 * (a[:, None] < b[None, :]).sum())
            jt2 += int((a[:, None] == b[None, :]).sum())
    assert out["jt2"].iloc[0] == jt2
    ns = np.array([len(g) for g in groups], np.int64)
    nt = int(ns.sum())
    assert out["mean2"].iloc[0] == nt * nt - int((ns * ns).sum())
    assert out["var72"].iloc[0] == nt * nt * (2 * nt + 3) - int(
        (ns * ns * (2 * ns + 3)).sum()
    )


def _ab_scores(vals):
    """Tie-averaged Ansari-Bradley scores by explicit construction."""
    order = np.argsort(vals, kind="stable")
    n = len(vals)
    pos_scores = np.minimum(np.arange(1, n + 1), n + 1 - np.arange(1, n + 1))
    scores = np.empty(n, np.float64)
    sv = np.array(vals)[order]
    i = 0
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        scores[order[i:j]] = pos_scores[i:j].mean()
        i = j
    return scores


def test_ansari_bradley_and_lepage(ray_session):
    from ptrail_ray.entry_queries import QUERIES

    d = _daily_counts_pdf()
    we = ((d["d"].to_numpy(np.int64) + 3) % 7 >= 5)
    vals = d["c"].to_numpy(np.int64)
    sc = _ab_scores(vals)
    ab = QUERIES["q_ansari_bradley"](SF).to_pandas()
    assert ab["n_weekend"].iloc[0] == int(we.sum())
    assert ab["n_weekday"].iloc[0] == int((~we).sum())
    assert abs(ab["ab_sum"].iloc[0] - sc[we].sum()) < 1e-3
    n, nx = len(vals), int(we.sum())
    e_ab = nx * sc.sum() / n
    v_ab = (
        nx * (n - nx) * (n * (sc**2).sum() - sc.sum() ** 2)
        / (n * n * (n - 1))
    )
    assert abs(ab["e_ab"].iloc[0] - e_ab) < 1e-3
    assert abs(ab["z_ab"].iloc[0] - (sc[we].sum() - e_ab) / np.sqrt(v_ab)) < 1e-4

    lp = QUERIES["q_lepage"](SF).to_pandas()
    ranks = pd.Series(vals).rank(method="average").to_numpy()
    w = ranks[we].sum()
    e_w = nx * (n + 1) / 2.0
    _, tc = np.unique(vals, return_counts=True)
    tie = float((tc.astype(np.int64) ** 3 - tc).sum())
    v_w = nx * (n - nx) / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z_w = (w - e_w) / np.sqrt(v_w)
    assert abs(lp["z_w"].iloc[0] - z_w) < 1e-4
    assert abs(lp["z_ab"].iloc[0] - ab["z_ab"].iloc[0]) < 1e-6
    assert abs(lp["lepage"].iloc[0] - (z_w**2 + lp["z_ab"].iloc[0] ** 2)) < 1e-3
