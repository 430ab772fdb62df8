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
