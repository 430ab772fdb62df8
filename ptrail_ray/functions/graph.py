"""Graph analytics over pair output (the near-dup graph as a graph).

`dedup.connected_components` turns pair lists into clusters; this
module ranks WITHIN the graph: distributed PageRank over the
similarity edge set (centrality of a document inside its near-dup
neighborhood — the canonical-pick signal richer than min-id, and the
classic iterative-graph-algorithm shape on Ray Data).

Integer-exact dynamics (the whole point for the hash gate): ranks are
int64 micro-units, one fixed contract both engines implement verbatim —

    r₀(v)    = SCALE // N
    r_{t+1}(v) = (SCALE·15) // (100·N)
                 + Σ_{u→v} (r_t(u)·85) // (100·deg(u))

floor division on non-negative ints is identical in numpy and SQL, so
after any number of iterations the ranks are BIT-IDENTICAL to a chained
CTE replica — no float accumulation anywhere. Dangling nodes keep the
base term only (standard no-redistribution simplification; the contract
is the operator's documented semantics, replayed by the oracle).

Scale shape per iteration: ONE hash join (edges ⋈ current ranks on
src — edges carry their precomputed out-degree so the join is the only
rank-dependent exchange) and ONE dst-keyed grouped sum of int64
contributions; the rank table is one row per node, re-materialized
between rounds exactly like `connected_components`' label table. Edges
never visit the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PR_SCALE = 10**12


def pagerank_int(
    edges,
    nodes,
    *,
    n_nodes: int,
    iters: int = 3,
    num_buckets: int = 32,
):
    """Integer-exact PageRank. ``edges``: Dataset (src, dst) — already
    DIRECTED (duplicate each undirected pair both ways first).
    ``nodes``: Dataset with a ``node`` column holding every node id
    (isolated nodes included). Returns a Dataset (node, r:int64)."""
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket
    from ptrail_ray.stages.join import hash_join

    if iters < 1:
        raise ValueError("iters must be >= 1")
    base = (PR_SCALE * 15) // (100 * n_nodes)
    r0 = PR_SCALE // n_nodes

    # out-degree, attached to each edge once (rank-independent)
    def deg_partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        keys, cnt = np.unique(src, return_counts=True)
        return pa.table(
            {
                "src": pa.array(keys, pa.int64()),
                "deg": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def deg_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("src", as_index=False, sort=False)["deg"].sum()

    degs = grouped_agg_by_bucket(
        edges.map_batches(deg_partial, batch_format="pyarrow", batch_size=1 << 20),
        "src",
        deg_sum,
        num_buckets=num_buckets,
        partial_batch=None,
    )
    edges_deg = hash_join(edges, degs, "src", num_buckets=num_buckets).materialize()

    # current ranks, one row per node
    def init(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"].cast(pa.int64()),
                "r": pa.array(np.full(t.num_rows, r0, np.int64), pa.int64()),
            }
        )

    nodes = nodes.materialize()
    ranks = nodes.map_batches(init, batch_format="pyarrow", batch_size=None)

    for _ in range(iters):
        # contributions ride the (static) edge set: one join on src
        ranks_src = ranks.map_batches(
            lambda t: t.rename_columns(["src", "r"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        joined = hash_join(edges_deg, ranks_src, "src", num_buckets=num_buckets)

        def contrib(t: pa.Table) -> pa.Table:
            r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = (r * np.int64(85)) // (np.int64(100) * d)
            return pa.table(
                {
                    "dst": t["dst"].cast(pa.int64()),
                    "c": pa.array(c, pa.int64()),
                }
            )

        def csum(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("dst", as_index=False, sort=False)["c"].sum()

        sums = grouped_agg_by_bucket(
            joined.map_batches(contrib, batch_format="pyarrow", batch_size=None),
            "dst",
            csum,
            num_buckets=num_buckets,
            partial_batch=None,
        ).map_batches(
            lambda t: t.rename_columns(["node", "c"]),
            batch_format="pyarrow",
            batch_size=None,
        )

        merged = hash_join(nodes, sums, "node", how="left", num_buckets=num_buckets)

        def update(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].fillna(0).astype(np.int64)
            return pd.DataFrame(
                {
                    "node": df["node"].astype(np.int64),
                    "r": (np.int64(base) + c.to_numpy(np.int64)).astype(np.int64),
                }
            )

        ranks = merged.map_batches(
            update, batch_format="pandas", batch_size=None
        ).materialize()

    return ranks
