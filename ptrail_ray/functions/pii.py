"""Vectorized regex scrub / extract over a text column.

The corpus-cleaning op the reference has no analog for (its filters are
numeric, `ptrail/preprocessing/filters.py`): scan every document for a
set of patterns, count matches per pattern, and rewrite the text with
the matches masked. The shipped default pattern set is the standard PII
scrub (emails, IPv4 addresses, dashed phone numbers, SSN-shaped ids) a
training-data pipeline runs before anything else touches the text.

Design for 100 TB: a stateless `map_batches` task pool — both the count
(`pc.count_substring_regex`) and the rewrite (`pc.replace_substring_regex`)
are single Arrow RE2 kernels over the whole batch, zero Python per row,
no state, no shuffle. Patterns are compiled by RE2 once per kernel call;
DuckDB's regexp engine is RE2 as well, so the oracle replays the exact
same pattern semantics (`regexp_replace(..., 'g')` /
`len(regexp_extract_all(...))`).

Patterns must be RE2-safe: no backreferences, no lookaround.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, pattern, replacement) — applied in order; counts are taken on
# the ORIGINAL text so earlier rewrites can't hide later patterns.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
]

TEXT_BATCH = 16_384


def scrub_batch(
    t: pa.Table,
    *,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] = PII_PATTERNS,
    out_col: str = "scrubbed",
) -> pa.Table:
    """Per-pattern match counts (on the original text) + masked text.

    Adds one ``n_<name>`` int64 column per pattern and ``out_col`` with
    all patterns replaced, in list order. SSN-shaped strings also match
    the phone pattern only if dashed 3-3-4; the two defaults are
    disjoint (3-2-4 vs 3-3-4), so order doesn't leak.
    """
    txt = pc.fill_null(t[text_col], "")
    scrubbed = txt
    for name, pat, _ in patterns:
        t = t.append_column(
            f"n_{name}", pc.count_substring_regex(txt, pat).cast(pa.int64())
        )
    for _, pat, repl in patterns:
        scrubbed = pc.replace_substring_regex(scrubbed, pat, repl)
    return t.append_column(out_col, scrubbed)


def add_scrub(
    ds,
    *,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] = PII_PATTERNS,
    out_col: str = "scrubbed",
    batch_size: int = TEXT_BATCH,
):
    """Stateless scrub stage over a Dataset (see module docstring)."""
    return ds.map_batches(
        lambda t: scrub_batch(t, text_col=text_col, patterns=patterns, out_col=out_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
