"""Arrow-native whitespace tokenization shared by the text operators.

One C-level kernel chain replaces per-doc Python ``str.split`` plus
sort-based ``np.unique`` (measured 1.85 s → 0.14 s per 16k-doc batch
on the 100k-doc stress corpus — object-string sorting was the whole
cost): ``utf8_split_whitespace`` → zero-copy flatten → empty filter →
hash-based ``dictionary_encode``. Token semantics are IDENTICAL to
``str.split()`` / the SQL ``list_filter(regexp_split_to_array(text,
'\\s+'), x -> x <> '')`` model (verified element-wise) — Arrow keeps
boundary empties, hence the explicit filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def arrow_tokens(col) -> tuple[pa.Array, np.ndarray]:
    """Whitespace tokens of a string column → (flat token array,
    int64 row index per token), empties removed."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lst = pc.utf8_split_whitespace(pc.fill_null(col, ""))
    flat = lst.flatten()
    lens = np.diff(lst.offsets.to_numpy())
    idx = np.repeat(np.arange(len(lst), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "")
    return flat.filter(keep), idx[keep.to_numpy(zero_copy_only=False)]


def encoded_tokens(col) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """(codes, vocab, row index): tokens dictionary-encoded so all
    downstream work is int-coded — lookups, logs, counts run per
    UNIQUE term (Zipf: vocab ≪ tokens), never per token."""
    flat, idx = arrow_tokens(col)
    de = pc.dictionary_encode(flat)
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    return de.indices.to_numpy(zero_copy_only=False).astype(np.int64), de.dictionary, idx
