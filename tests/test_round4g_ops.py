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
