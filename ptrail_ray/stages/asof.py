"""Point-in-time (as-of) backfill join against a slowly-changing dimension.

The north_rule's extension of the reference's contextual joins
(``ptrail/features/contextual_features.py:33-184`` broadcast a small side
table and scan it per point): for each turn, attach the side-table row
with the greatest ``effective_ts <= ts`` for the turn's join key —
inclusive boundary, never a future version (zero temporal leakage,
SURVEY.md §2.5).

Ray design: the side table is small (a dimension) → ``ray.put`` ONCE on
the driver, then an **actor pool** (``map_batches(AsofJoiner,
concurrency=N)``) reads it from the object store in ``__init__`` (once
per actor, zero-copy), pre-sorts it by (key, effective_ts), and joins
each batch with a vectorized ``pandas.merge_asof`` — no shuffle at all.
This is the broadcast-small-side pattern; a shuffle join here would move
every turn for a kilobyte-scale dimension.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ptrail_ray.schema import TS

SIDE_COLS = ["key", "effective_ts", "attr_num", "attr_cat"]


def put_side_table(side: "pa.Table | pd.DataFrame"):
    """Broadcast the dimension once; returns the object ref to hand to
    every AsofJoiner actor."""
    if isinstance(side, pa.Table):
        side = side.to_pandas()
    side = side.sort_values(["key", "effective_ts"], kind="stable").reset_index(
        drop=True
    )
    return ray.put(side)


class AsofJoiner:
    """Actor-pool stage: per-batch vectorized point-in-time join.

    ``__init__`` runs once per actor (broadcast read + sort);
    ``__call__`` runs per batch.
    """

    def __init__(self, side_ref, key_col: str = "conv_id", ts_col: str = TS):
        side = ray.get(side_ref) if not isinstance(side_ref, pd.DataFrame) else side_ref
        side = side.copy()
        side["effective_ts"] = side["effective_ts"].astype("datetime64[us]")
        self.side = side.sort_values("effective_ts", kind="stable").reset_index(
            drop=True
        )
        self.key_col = key_col
        self.ts_col = ts_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.ts_col] = batch[self.ts_col].astype("datetime64[us]")
        order = np.argsort(batch[self.ts_col].to_numpy(), kind="stable")
        sorted_batch = batch.iloc[order]
        joined = pd.merge_asof(
            sorted_batch,
            self.side,
            left_on=self.ts_col,
            right_on="effective_ts",
            left_by=self.key_col,
            right_by="key",
            direction="backward",
            allow_exact_matches=True,  # inclusive <= boundary
        )
        # restore the batch's original row order
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        joined = joined.iloc[inv].reset_index(drop=True)
        return joined.drop(columns=["key", "effective_ts"], errors="ignore")


def asof_join(
    ds,
    side: "pa.Table | pd.DataFrame",
    *,
    key_col: str = "conv_id",
    concurrency: int = 4,
    batch_size: int = 16384,
):
    """Dataset-level as-of backfill: broadcast ``side`` and join in an
    actor pool. Appends ``attr_num`` (float64) and ``attr_cat`` (string);
    turns with no version at or before ``ts`` get nulls."""
    side_ref = put_side_table(side)
    return ds.map_batches(
        AsofJoiner,
        fn_constructor_kwargs={"side_ref": side_ref, "key_col": key_col},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
