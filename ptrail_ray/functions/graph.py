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


def triangle_count(
    pairs,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_buckets: int = 16,
    max_out_degree: int = 4096,
):
    """Exact triangle count over an undirected edge list (a < b
    canonical) — the clustering-structure audit of the near-dup
    similarity graph (many triangles ⇒ dense dup neighborhoods that
    min-id canonicalization will collapse aggressively; a triangle-free
    pairing is chains, a different cleanup regime).

    Node-iterator shape, two narrow exchanges, text-free throughout:

    1. bucket edges by their MIN endpoint; each node a emits the
       wedges (b, c), b < c, over its out-neighbors — every triangle
       {x<y<z} is generated exactly once, at its minimum node;
    2. wedges (need = 1) union edges (have = 1) exchange on the
       (b, c) pair key; a wedge closes iff its pair key is an edge.

    Σ deg⁺(a)² wedge work is the textbook cost; ``max_out_degree``
    guards the hub blowup LOUDLY (orient-by-degree is the production
    escape hatch, not silent truncation). Returns a one-row Dataset
    (n_triangles, n_wedges, n_edges)."""
    from ptrail_ray.stages.bucket import grouped_agg_by_bucket

    def wedges(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "u": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "need": pa.array([], pa.int64()),
                "have": pa.array([], pa.int64()),
            }
        )
        if len(a) == 0:
            return empty
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        lengths = np.diff(np.r_[starts, len(a)])
        if int(lengths.max()) > max_out_degree:
            raise ValueError(
                f"triangle_count: out-degree {int(lengths.max())} exceeds "
                f"max_out_degree={max_out_degree} — orient edges by degree "
                "before wedge generation for hub-heavy graphs"
            )
        us, vs = [], []
        for s, L in zip(starts, lengths):
            if L < 2:
                continue
            nb = b[s : s + L]  # sorted ascending
            iu, ju = np.triu_indices(int(L), 1)
            us.append(nb[iu])
            vs.append(nb[ju])
        w_u = np.concatenate(us) if us else np.array([], np.int64)
        w_v = np.concatenate(vs) if vs else np.array([], np.int64)
        return pa.table(
            {
                "u": pa.array(w_u, pa.int64()),
                "v": pa.array(w_v, pa.int64()),
                "need": pa.array(np.ones(len(w_u), np.int64), pa.int64()),
                "have": pa.array(np.zeros(len(w_u), np.int64), pa.int64()),
            }
        )

    wedge_ds = grouped_agg_by_bucket(
        pairs, a_col, wedges, num_buckets=num_buckets, group_format="pyarrow",
        partial_batch=None,
    )

    def as_have(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "u": t[a_col].cast(pa.int64()),
                "v": t[b_col].cast(pa.int64()),
                "need": pa.array(np.zeros(n, np.int64), pa.int64()),
                "have": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    edge_ds = pairs.map_batches(as_have, batch_format="pyarrow", batch_size=None)

    def close_bucket(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        need = t["need"].to_numpy(zero_copy_only=False)
        have = t["have"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            tri = wn = en = 0
        else:
            comp = np.stack([u, v], 1)
            _, inv = np.unique(comp, axis=0, return_inverse=True)
            n_need = np.bincount(inv, weights=need).astype(np.int64)
            n_have = np.bincount(inv, weights=have).astype(np.int64)
            tri = int((n_need * (n_have > 0)).sum())
            wn, en = int(need.sum()), int(have.sum())
        return pa.table(
            {
                "n_triangles": pa.array([tri], pa.int64()),
                "n_wedges": pa.array([wn], pa.int64()),
                "n_edges": pa.array([en], pa.int64()),
            }
        )

    parts = grouped_agg_by_bucket(
        wedge_ds.union(edge_ds),
        ["u", "v"],
        close_bucket,
        num_buckets=num_buckets,
        group_format="pyarrow",
        partial_batch=None,
    ).to_pandas()
    tot = parts.sum()
    return pa.table(
        {
            "n_triangles": pa.array([int(tot["n_triangles"])], pa.int64()),
            "n_wedges": pa.array([int(tot["n_wedges"])], pa.int64()),
            "n_edges": pa.array([int(tot["n_edges"])], pa.int64()),
        }
    )
