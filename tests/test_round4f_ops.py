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
