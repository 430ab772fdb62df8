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
