"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All vectorized (pyarrow.compute string kernels) except language-ID, which
is a small per-doc stopword-hit heuristic run through an actor pool so the
stopword tables are built once per actor (see LangId class).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = r"\s+"
_PUNCT_RE = r"[^\w\s]"
_DIGIT_RE = r"\d"
# a BPE-ish word/number/punct splitter for token estimation
_BPE_RE = r"[A-Za-z]+|\d+|[^\w\s]"


def token_counts(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_tokens (whitespace tokens of trimmed text) and n_bpe_tokens
    (word/number/punct pieces). Both exactly reproducible in SQL:
    n_tokens = len(regexp_split_to_array(trim(text), '\\s+'))."""
    t = tbl.column(text_col)
    trimmed = pc.utf8_trim_whitespace(t)
    n_ws = pc.count_substring_regex(trimmed, _TOKEN_RE)
    nonempty = pc.not_equal(trimmed, "")
    n_tokens = pc.if_else(nonempty, pc.add(n_ws, 1), 0)
    n_bpe = pc.count_substring_regex(t, _BPE_RE)
    return tbl.append_column("n_tokens", pc.cast(n_tokens, pa.int64())).append_column(
        "n_bpe_tokens", pc.cast(n_bpe, pa.int64())
    )


def quality_stats(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars, punct_ratio, digit_ratio (rounded to 6 dp so the
    DuckDB oracle can match bit-for-bit after identical rounding)."""
    t = tbl.column(text_col)
    n_chars = pc.cast(pc.utf8_length(t), pa.int64())
    denom = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    punct = pc.cast(pc.count_substring_regex(t, _PUNCT_RE), pa.float64())
    digit = pc.cast(pc.count_substring_regex(t, _DIGIT_RE), pa.float64())
    r6 = lambda x: pc.round(pc.divide(x, denom), 6)
    return (
        tbl.append_column("n_chars", n_chars)
        .append_column("punct_ratio", r6(punct))
        .append_column("digit_ratio", r6(digit))
    )


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "sie"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "je", "de", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "yo", "de", "que"},
}


class LangId:
    """Actor-pool language-ID stage: stopword tables built once per actor
    (__init__), scored per batch (__call__). Use via
    ``ds.map_batches(LangId, batch_format="pandas", concurrency=N)``."""

    def __init__(self):
        import re

        self.word = re.compile(r"[a-zà-ÿäöüß]+")
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def _score(self, text: str) -> str:
        toks = self.word.findall(text.lower())[:200]
        if not toks:
            return "unknown"
        best, best_hits = "unknown", 0
        for lang, stops in self.tables.items():
            hits = sum(t in stops for t in toks)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["pred_lang"] = batch["text"].map(self._score)
        return batch


def fingerprint(tbl: pa.Table, text_col: str = "text", out: str = "fingerprint") -> pa.Table:
    """Deterministic 64-bit document fingerprint of the
    whitespace-normalized, lowercased text (stable across runs/workers)."""
    texts = pc.utf8_lower(pc.replace_substring_regex(tbl.column(text_col), r"\s+", " "))
    h = pd.util.hash_array(texts.to_pandas().to_numpy(dtype=object), categorize=False)
    return tbl.append_column(out, pa.array(h.astype(np.uint64), pa.uint64()))
