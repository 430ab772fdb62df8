"""Greedy sequence packing: bin documents into fixed token-budget
training sequences.

The op a pretraining dataloader needs between "clean corpus" and
"shard writer": stream documents in a deterministic order (doc_id
ascending) within each packing stream (``source``), and close a bin
whenever the next document would overflow ``budget`` tokens. A single
document larger than the budget gets a bin of its own (never split —
chunking is ``functions/chunk.py``'s job).

Scale shape (100 TB): token counts are computed BEFORE the exchange in
a narrow vectorized projection (text never shuffles — only
``(source, doc_id, n_tokens)`` rows move, ~24 bytes/doc), then one
bucket exchange keyed on ``source`` co-locates each packing stream and
the per-stream kernel advances bin-by-bin with ``np.searchsorted`` over
the prefix-sum (O(#bins log n) — loop count scales with OUTPUT bins,
not input docs). Equivalent doc-by-doc recursion is the DuckDB
recursive-CTE oracle (entry_queries ``q_pack_greedy``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ptrail_ray.functions.tokenize import arrow_tokens
from ptrail_ray.stages.bucket import conv_runs, map_conv_buckets

DEFAULT_BUDGET = 1024


def count_tokens_batch(t: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Narrow projection: (passthrough non-text cols, n_tokens)."""
    _, idx = arrow_tokens(t[text_col])
    n_tok = np.bincount(idx, minlength=t.num_rows).astype(np.int64)
    out = t.drop_columns([text_col])
    return out.append_column("n_tokens", pa.array(n_tok, type=pa.int64()))


def pack_runs_kernel(table: pa.Table, *, budget: int, key_col: str) -> pa.Table:
    """Greedy packing over one sorted bucket of (key, doc_id, n_tokens).

    Bin semantics (must mirror the SQL recursion exactly): a new bin
    starts when the bin is non-empty AND adding the next doc would
    exceed the budget; an oversize doc therefore lands alone in the
    bin that was empty when it arrived.
    """
    n = table.num_rows
    if n == 0:
        return table.append_column("bin_id", pa.array([], type=pa.int64()))
    starts, lengths = conv_runs(table[key_col])
    tok = table["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    bins = np.empty(n, dtype=np.int64)
    for s, ln in zip(starts, lengths):
        c = np.cumsum(tok[s : s + ln])
        i = 0
        b = 0
        offset = np.int64(0)
        while i < ln:
            j = int(np.searchsorted(c, offset + budget, side="right"))
            if j <= i:  # oversize doc: own bin
                j = i + 1
            bins[s + i : s + j] = b
            offset = c[j - 1]
            b += 1
            i = j
    return table.append_column("bin_id", pa.array(bins, type=pa.int64()))


def pack_greedy(
    ds,
    *,
    budget: int = DEFAULT_BUDGET,
    key_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    **kwargs,
):
    """Dataset-level greedy packing: narrow token count → one exchange
    keyed on ``key_col`` → per-stream greedy kernel. Output rows =
    input rows with ``n_tokens`` and ``bin_id`` appended (text dropped;
    join back on ``order_col`` if payloads are needed downstream)."""
    import functools

    counted = ds.map_batches(
        functools.partial(count_tokens_batch, text_col=text_col),
        batch_format="pyarrow",
        batch_size=65536,
    )
    kern = functools.partial(pack_runs_kernel, budget=budget, key_col=key_col)
    return map_conv_buckets(
        counted,
        kern,
        num_buckets=num_buckets,
        key_col=key_col,
        sort_keys=(key_col, order_col),
        **kwargs,
    )
