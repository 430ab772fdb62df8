"""Fixed-size token-window document chunking (with overlap).

THE canonical LLM pre-training data op: split every document into
windows of ``chunk_tokens`` whitespace tokens advancing by ``stride``
(= chunk_tokens − overlap), the shape every context-window packer /
embedding indexer consumes. Beyond-reference (the reference segments
trajectories by time gap, `ptrail/preprocessing/filters.py` —
numeric, not text); token model matches `textstats` / the SQL
``regexp_split_to_array`` so one oracle covers all text ops.

Design for 100 TB: a stateless flat-map-shaped `map_batches` — each
batch of docs expands to its chunk rows in place (Ray Data lets a
batch fn return more rows than it got, so no separate flat_map pass),
no shuffle, no state, output is (doc_id, chunk_idx, n_chunk_tokens,
chunk_text). Expansion factor ≈ n_tokens/stride rows per doc; batch
size stays moderate so expanded batches fit the worker heap. The
chunk-text join is genuine output construction (every output byte is
new), not avoidable per-row Python.

Chunk rule: starts s = 0, stride, 2·stride, … while s < n_tokens;
chunk = tokens[s : s+chunk_tokens]. Every token is covered, tail
chunks may be short, empty docs emit zero chunks.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

TEXT_BATCH = 8_192


def chunk_batch(
    t: pa.Table,
    *,
    chunk_tokens: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    texts = t[text_col].to_pylist()
    out_id: list[int] = []
    out_idx: list[int] = []
    out_n: list[int] = []
    out_txt: list[str] = []
    for did, s in zip(ids, texts):
        toks = (s or "").split()
        n = len(toks)
        for ci, st in enumerate(range(0, n, stride)):
            w = toks[st : st + chunk_tokens]
            out_id.append(did)
            out_idx.append(ci)
            out_n.append(len(w))
            out_txt.append(" ".join(w))
    return pa.table(
        {
            id_col: pa.array(np.asarray(out_id, np.int64), pa.int64()),
            "chunk_idx": pa.array(np.asarray(out_idx, np.int64), pa.int64()),
            "n_chunk_tokens": pa.array(np.asarray(out_n, np.int64), pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string()),
        }
    )


def chunk_documents(
    ds,
    *,
    chunk_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = TEXT_BATCH,
):
    """Explode docs into overlapping token windows (module docstring)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    return ds.map_batches(
        functools.partial(
            chunk_batch,
            chunk_tokens=chunk_tokens,
            stride=stride,
            id_col=id_col,
            text_col=text_col,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
