"""Text-analysis kernels for large-scale training-data pipelines.

Beyond-reference operators (per the build brief): token counting,
quality scoring, language ID, document fingerprinting. All are
vectorized ``map_batches`` stages over the ``documents`` table schema
(doc_id, text, lang, source, n_chars); the regex-heavy ones are actor
pools so patterns compile once per actor (``__init__``), not per batch.

Every formula here is intentionally SQL-expressible so the driver's
DuckDB oracle can verify it exactly (see oracle_sql in __ray_entry__).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# must match the SQL stoplist in __ray_entry__ verbatim
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]

TOKEN_RE = r"\S+"
# BPE-ish subword segmentation (GPT-2-style coarse classes; RE2-compatible
# so the DuckDB oracle runs the identical pattern)
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"
WORD_RE = r"[A-Za-z]+"
DIGIT_RE = r"[0-9]"


class TextStats:
    """Actor-pool stage: per-doc token/quality metrics.

    Emits: n_chars_calc, n_tokens, n_alpha_words, n_digits, stop_ratio,
    mean_token_len, quality (all reproducible in ANSI SQL).
    """

    def __init__(self):
        self.tok = re.compile(TOKEN_RE)
        self.word = re.compile(WORD_RE)
        self.digit = re.compile(DIGIT_RE)
        self.bpe = re.compile(BPE_RE)
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        toks = text.map(self.tok.findall)
        n_tokens = toks.str.len().astype("int64")
        batch["n_chars_calc"] = text.str.len().astype("int64")
        batch["n_tokens"] = n_tokens
        batch["n_alpha_words"] = text.map(lambda s: len(self.word.findall(s))).astype(
            "int64"
        )
        batch["n_digits"] = text.map(lambda s: len(self.digit.findall(s))).astype(
            "int64"
        )
        batch["n_bpe_tokens"] = text.map(lambda s: len(self.bpe.findall(s))).astype(
            "int64"
        )
        n_stop = toks.map(lambda ws: sum(1 for w in ws if w in self.stop))
        with np.errstate(invalid="ignore"):
            batch["stop_ratio"] = np.where(
                n_tokens > 0, n_stop / n_tokens, np.nan
            )
            tok_chars = toks.map(lambda ws: sum(len(w) for w in ws))
            batch["mean_token_len"] = np.where(
                n_tokens > 0, tok_chars / n_tokens, np.nan
            )
        # simple composite quality score (documented formula, oracle-checked)
        batch["quality"] = np.where(
            n_tokens > 0,
            (batch["stop_ratio"].fillna(0) > 0.05).astype("int64")
            + (batch["mean_token_len"].between(3, 10)).astype("int64")
            + (batch["n_chars_calc"].between(50, 10_000)).astype("int64"),
            0,
        ).astype("int64")
        return batch


class LangId:
    """Heuristic language ID: stopword-profile scoring.

    score = |tokens ∩ english-stoplist| / |tokens|; 'en' if score > tau
    else 'unk'. (n-gram profiles would be the production version; the
    synthetic corpus is English-vocab so the stoplist heuristic is the
    deterministic, oracle-checkable choice.)
    """

    TAU = 0.05

    def __init__(self):
        self.tok = re.compile(TOKEN_RE)
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        toks = text.map(self.tok.findall)
        n = toks.str.len()
        n_stop = toks.map(lambda ws: sum(1 for w in ws if w in self.stop))
        with np.errstate(invalid="ignore"):
            score = np.where(n > 0, n_stop / n, 0.0)
        batch["lang_pred"] = np.where(score > self.TAU, "en", "unk")
        return batch


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized text.

    (The rolling-hash shingle fingerprint lives in functions/dedup.py;
    this one is the exact-content id used for exact dedup and lineage.)
    """
    norm = batch["text"].fillna("").map(lambda s: " ".join(s.split()))
    batch["fingerprint"] = norm.map(lambda s: hashlib.md5(s.encode()).hexdigest())
    return batch


def add_text_stats(ds, *, concurrency: int = 4, batch_size: int = 4096):
    return ds.map_batches(
        TextStats, batch_format="pandas", batch_size=batch_size, concurrency=(1, concurrency)
    )


def add_lang_id(ds, *, concurrency: int = 4, batch_size: int = 4096):
    return ds.map_batches(
        LangId, batch_format="pandas", batch_size=batch_size, concurrency=(1, concurrency)
    )


def add_fingerprint(ds):
    return ds.map_batches(fingerprint_batch, batch_format="pandas", batch_size=None)
