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
