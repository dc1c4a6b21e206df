"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

Everything is vectorized (pyarrow.compute string kernels + flat-token
numpy passes) AND deterministically reproducible in ANSI SQL so the
driver's DuckDB gate can hash-match each operator:

- token counts    : regexp splits/counts (RE2 on both sides)
- quality counts  : exact integer punct/digit/char counts
- fingerprint     : polynomial rolling hash mod a 40-bit prime — the SQL
                    side folds char codes with ``list_reduce``; the batch
                    side computes the identical value with one weighted
                    ``np.add.reduceat`` over the flat byte buffer
- language ID     : stopword-hit argmax over the first 200 word tokens,
                    actor-pool stage (tables built once per actor), flat
                    token scoring via pyarrow ``index_in`` (no per-row
                    Python)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = r"\s+"
_PUNCT_RE = r"[^\w\s]"
_DIGIT_RE = r"\d"
# a BPE-ish word/number/punct splitter for token estimation
_BPE_RE = r"[A-Za-z]+|\d+|[^\w\s]"

# fingerprint: polynomial base/modulus (modulus = largest prime < 2^40,
# so c*(B^k mod P) < 2^47 and docs up to ~60k chars sum inside int64)
FP_BASE = 31
FP_MOD = 1099511627689


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


def normalize_text(
    tbl: pa.Table, text_col: str = "text", out: str = "norm_text"
) -> pa.Table:
    """C4-style text normalization as a stateless Arrow kernel: lowercase,
    collapse whitespace runs to single spaces, trim — the canonical form
    fed to dedup/fingerprint stages. Exactly reproducible in SQL:
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``. Appends
    ``out`` and its exact char count ``n_chars_norm``."""
    t = tbl.column(text_col)
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(t), r"\s+", " ")
    )
    return tbl.append_column(out, norm).append_column(
        "n_chars_norm", pc.cast(pc.utf8_length(norm), pa.int64())
    )


# PII redaction rules, applied IN ORDER (sequential semantics: each
# count is taken on the text as already redacted by the previous rules).
# RE2 syntax on both sides — pyarrow's replace_substring_regex and
# DuckDB's regexp_replace are both RE2, so the gate is hash-exact.
PII_RULES: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
]


def pii_redact(
    tbl: pa.Table,
    text_col: str = "text",
    out: str = "redacted",
    rules: "list[tuple[str, str, str]] | None" = None,
) -> pa.Table:
    """Redact PII spans (emails, IPv4s, phone numbers by default) with
    typed placeholders and append an exact integer match count per rule
    (``n_email``, ``n_ipv4``, ``n_phone``) — the standard scrubbing stage
    of a training-data pipeline. Stateless zero-copy Arrow pass, no
    shuffle; rules apply sequentially so counts are well-defined even
    when patterns could overlap (mirror the same order in SQL)."""
    t = tbl.column(text_col)
    for name, pat, repl in rules if rules is not None else PII_RULES:
        tbl = tbl.append_column(
            f"n_{name}", pc.cast(pc.count_substring_regex(t, pat), pa.int64())
        )
        t = pc.replace_substring_regex(t, pat, repl)
    return tbl.append_column(out, t)


def quality_stats(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars + EXACT integer n_punct / n_digit counts (the gate
    hashes integers; float ratios are derived views) and the 6-dp ratios
    for library consumers."""
    t = tbl.column(text_col)
    n_chars = pc.cast(pc.utf8_length(t), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(t, _PUNCT_RE), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(t, _DIGIT_RE), pa.int64())
    denom = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    r6 = lambda x: pc.round(pc.divide(pc.cast(x, pa.float64()), denom), 6)
    return (
        tbl.append_column("n_chars", n_chars)
        .append_column("n_punct", n_punct)
        .append_column("n_digit", n_digit)
        .append_column("punct_ratio", r6(n_punct))
        .append_column("digit_ratio", r6(n_digit))
    )


def fingerprint(tbl: pa.Table, text_col: str = "text", out: str = "fingerprint") -> pa.Table:
    """Deterministic document fingerprint: polynomial rolling hash
    (base FP_BASE mod FP_MOD) of the whitespace-normalized, lowercased
    text. SQL-identical via
    ``list_reduce([unicode(c) ...], (a,c) -> (a*31+c) % FP_MOD)``.

    Vectorized: terms c_i * (B^(L-1-i) mod P) summed per doc with ONE
    ``np.add.reduceat`` over the flat byte buffer (no per-doc Python).
    Empty text -> 0. Docs are capped at 60k chars (int64 headroom)."""
    from vaero_ray.stages.dedup import _flat_texts

    norm = pc.utf8_lower(pc.replace_substring_regex(tbl.column(text_col), r"\s+", " "))
    tmp = pa.table({"__t": norm})
    data, off = _flat_texts(tmp, "__t")
    lens = off[1:] - off[:-1]
    n = len(lens)
    h = np.zeros(n, dtype=np.int64)
    if len(data):
        maxlen = int(lens.max())
        if maxlen > 60000:
            raise ValueError("fingerprint: document longer than 60k chars (int64 headroom)")
        pows = np.empty(maxlen, dtype=np.int64)
        acc = 1
        for k in range(maxlen):
            pows[k] = acc
            acc = (acc * FP_BASE) % FP_MOD
        # exponent of global byte g in doc i: off[i+1]-1-g
        exps = np.repeat(off[1:] - 1, lens) - np.arange(len(data), dtype=np.int64)
        terms = data.astype(np.int64) * pows[exps] % FP_MOD
        nz = lens > 0
        # reduceat over NONEMPTY docs only: their starts are strictly
        # increasing and in-range (clipping starts for empty docs would
        # silently split a neighbor's segment)
        h[nz] = np.add.reduceat(terms, off[:-1][nz]) % FP_MOD
    return tbl.append_column(out, pa.array(h, pa.int64()))


def vocab_top_terms(ds, text_col: str = "text", k: int = 50):
    """Corpus vocabulary: top-``k`` lowercased whitespace tokens by total
    occurrence count, ties broken by token ascending.

    Scale shape: per-block PARTIAL counts (one row per distinct token per
    block — the shuffle moves vocabulary, not tokens), small
    groupby(token) merge, then a tiny global sort+limit. The canonical
    pre-aggregation pattern for corpus statistics at 100 TB."""
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    from vaero_ray.stages.dedup import _flat_tokens

    def partial(tbl: pa.Table) -> pa.Table:
        toks, _ = _flat_tokens(tbl, text_col)
        if not len(toks):
            return pa.table({"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        g = pa.table({"token": toks}).group_by("token").aggregate([("token", "count")])
        return pa.table({"token": g.column("token"), "cnt": g.column("token_count").cast(pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("token").aggregate(Sum("cnt", alias_name="cnt"))
    return merged.sort(["cnt", "token"], descending=[True, False]).limit(k)


def term_frequency_spectrum(ds, text_col: str = "text"):
    """Zipf frequency spectrum: for each total occurrence count k, how
    many distinct terms occur exactly k times in the corpus — the
    count-of-counts view linguists and dedup-threshold tuners read
    (hapax mass, head weight) before picking vocabulary / df cutoffs.

    Scale shape: the SAME per-block partial-count -> groupby(token)
    merge as :func:`vocab_top_terms` (the exchange moves vocabulary,
    never tokens), then a second, strictly smaller two-phase aggregate
    over the per-term totals (per-block ``group_by(cnt)`` partials ->
    groupby(occurrences) sum — at most one row per distinct count value
    per block leaves any block). Output rows = number of DISTINCT count
    values, tiny at any corpus size."""
    from ray.data.aggregate import Sum

    from vaero_ray.stages.dedup import _flat_tokens

    def partial(tbl: pa.Table) -> pa.Table:
        toks, _ = _flat_tokens(tbl, text_col)
        if not len(toks):
            return pa.table({"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        g = pa.table({"token": toks}).group_by("token").aggregate([("token", "count")])
        return pa.table({"token": g.column("token"), "cnt": g.column("token_count").cast(pa.int64())})

    def spectrum_partial(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {"occurrences": pa.array([], pa.int64()), "n_terms": pa.array([], pa.int64())}
            )
        g = tbl.group_by("cnt").aggregate([("cnt", "count")])
        return pa.table(
            {
                "occurrences": g.column("cnt"),
                "n_terms": g.column("cnt_count").cast(pa.int64()),
            }
        )

    per_term = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return (
        per_term.map_batches(spectrum_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("occurrences")
        .aggregate(Sum("n_terms", alias_name="n_terms"))
    )


# language order = tie-break priority (first wins on equal hits)
_LANGS = ["en", "de", "fr", "es"]
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "sie"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "je", "de", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "yo", "de", "que"],
}
_WORD_SPLIT_RE = r"[^a-zà-ÿäöüß]+"
_LANG_TOKEN_CAP = 200


class LangId:
    """Actor-pool language-ID stage: stopword lookup arrays built once per
    actor (__init__); per batch, ONE flat-token pyarrow ``index_in`` pass
    per language + segmented sums — no per-row Python. Deterministic
    argmax: hits DESC, language priority order breaks ties; zero hits ->
    'unknown'. SQL-reproducible (regexp_split + unnest + stopword VALUES
    join + ROW_NUMBER)."""

    def __init__(self):
        self.langs = list(_LANGS)
        self.tables = {k: pa.array(_STOPWORDS[k]) for k in self.langs}

    def __call__(self, tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        pred = np.full(n, "unknown", dtype=object)
        if n:
            toks_list = pc.split_pattern_regex(
                pc.utf8_lower(tbl.column("text")), _WORD_SPLIT_RE
            ).combine_chunks()
            flat = toks_list.flatten()
            off = np.asarray(toks_list.offsets).astype(np.int64)
            off = off - off[0]
            tok_len = np.asarray(pc.binary_length(flat)).astype(np.int64)
            nonempty = tok_len > 0
            # cap: only the first _LANG_TOKEN_CAP NONEMPTY tokens per doc vote
            lens = off[1:] - off[:-1]
            seg = np.repeat(np.arange(n, dtype=np.int64), lens)
            rank = np.cumsum(nonempty) - 1  # global rank among nonempty
            first_rank = np.full(n, 0, dtype=np.int64)
            # rank of each doc's first nonempty token = count of nonempty before doc start
            cum = np.concatenate([[0], np.cumsum(nonempty)])
            first_rank = cum[off[:-1]]
            within = rank - first_rank[seg]
            keep = nonempty & (within < _LANG_TOKEN_CAP)
            flat_np = np.asarray(flat, dtype=object)
            kept_tok = pa.array(flat_np[keep])
            kept_seg = seg[keep]
            hits = np.zeros((n, len(self.langs)), dtype=np.int64)
            for li, lang in enumerate(self.langs):
                is_stop = pc.is_valid(pc.index_in(kept_tok, self.tables[lang]))
                m = np.asarray(is_stop).astype(np.int64)
                hits[:, li] = np.bincount(kept_seg, weights=m, minlength=n).astype(np.int64)
            best = hits.argmax(axis=1)  # first max wins (priority order)
            any_hit = hits.max(axis=1) > 0
            lang_arr = np.array(self.langs, dtype=object)
            pred = np.where(any_hit, lang_arr[best], "unknown")
        return tbl.append_column("pred_lang", pa.array(pred.astype(object), pa.string()))


_LANG_ID_WORKER: "LangId | None" = None


def lang_id_batch(tbl: pa.Table) -> pa.Table:
    """Task-pool form of :class:`LangId`: the stopword tables are built
    once per WORKER PROCESS (module cache) instead of once per actor.
    A fresh actor pool costs ~1 s spawn + package import per actor per
    execution — ~15x the whole scoring kernel on a 5k-doc corpus —
    while plain tasks reuse the session's warm worker pool. Use the
    class form only for stages whose setup is genuinely heavy (real
    model weights)."""
    global _LANG_ID_WORKER
    if _LANG_ID_WORKER is None:
        _LANG_ID_WORKER = LangId()
    return _LANG_ID_WORKER(tbl)


def repetition_stats(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition counts per doc, exact integers: token
    total/distinct/top-frequency and bigram total/distinct/top-frequency
    (high top_token_n / n_tokens or top_bigram_n / n_bigrams flags
    boilerplate and spam in web-corpus curation).

    Vectorized: one dictionary-encode of the batch's flat token array,
    then np.unique / bincount / maximum.at over integer (doc, code) keys
    — no per-doc Python. SQL-identical via unnest + GROUP BY (tokens)
    and a list comprehension join (bigrams)."""
    from vaero_ray.stages.dedup import _flat_tokens

    n = tbl.num_rows
    toks, off = _flat_tokens(tbl, text_col)
    counts = off[1:] - off[:-1]
    n_tok = counts.astype(np.int64)
    n_dis = np.zeros(n, dtype=np.int64)
    top_tok = np.zeros(n, dtype=np.int64)
    n_big = np.maximum(n_tok - 1, 0)
    n_disb = np.zeros(n, dtype=np.int64)
    top_big = np.zeros(n, dtype=np.int64)
    if len(toks):
        codes = np.asarray(pc.dictionary_encode(toks).indices).astype(np.int64)
        K = int(codes.max()) + 1
        # the bigram key is doc_idx*K^2 + pair, so the guard must include
        # the DOC count: n*K^2 (and n*K for the token key) must fit int64
        if K > 3_000_000 or n * K * K >= 2**63 or n * K >= 2**63:
            raise ValueError(
                "repetition_stats: batch vocabulary too large for the "
                f"int64 (doc, code) keys (n={n}, K={K}); lower batch_size"
            )
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        uk, uc = np.unique(doc_idx * K + codes, return_counts=True)
        doc_u = uk // K
        n_dis += np.bincount(doc_u, minlength=n)
        np.maximum.at(top_tok, doc_u, uc)
        same = doc_idx[:-1] == doc_idx[1:]
        if same.any():
            pair = codes[:-1][same] * K + codes[1:][same]
            doc_b = doc_idx[:-1][same]
            ubk, ubc = np.unique(doc_b * (K * K) + pair, return_counts=True)
            doc_ub = ubk // (K * K)
            n_disb += np.bincount(doc_ub, minlength=n)
            np.maximum.at(top_big, doc_ub, ubc)
    for name, arr in (
        ("n_tokens", n_tok),
        ("n_distinct_tokens", n_dis),
        ("top_token_n", top_tok),
        ("n_bigrams", n_big),
        ("n_distinct_bigrams", n_disb),
        ("top_bigram_n", top_big),
    ):
        tbl = tbl.append_column(name, pa.array(arr, pa.int64()))
    return tbl


def tfidf_topk(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_docs: "int | None" = None,
    num_buckets: "int | None" = None,
):
    """Top-``k`` characteristic terms per document by INTEGER tf-idf:
    ``score = tf * ((1000 * n_docs) // df)`` — floor-divided reciprocal
    document frequency, monotone in the classical tf·idf for fixed tf
    and integer-exact on both engine and SQL sides (transcendental
    ``ln`` differs across libms; linear integer ops do not). Ties break
    on term ascending. Requires ``1000 * n_docs * max_tf < 2^63``.

    Scale shape (no broadcast, no all-to-all beyond the two required
    exchanges): per-block (doc, term, tf) partials via one Arrow
    group_by — a doc is one row so each (doc, term) pair is globally
    unique; ONE bucketed shuffle on ``term`` computes df (= group size
    over tf rows) and the score inside each bucket; then
    ``ranking.top_k_per_group`` re-shuffles by doc with its partial
    top-k bound. ``n_docs`` is explicit (parquet-footer metadata at the
    call site — counting here would execute the read twice)."""
    import pandas as pd
    import pyarrow as pa

    from vaero_ray.stages.dedup import _flat_tokens
    from vaero_ray.stages.keyed import bucketed_map_groups
    from vaero_ray.stages.ranking import top_k_per_group

    if n_docs is None:
        raise ValueError("tfidf_topk: pass n_docs (metadata count at the call site)")
    scale = 1000 * int(n_docs)

    def tf_partial(tbl: pa.Table) -> pa.Table:
        toks, off = _flat_tokens(tbl, text_col)
        if not len(toks):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        ids = np.repeat(
            tbl.column(id_col).to_numpy(zero_copy_only=False), np.diff(off)
        )
        g = (
            pa.table({id_col: pa.array(ids, pa.int64()), "term": toks})
            .group_by([id_col, "term"])
            .aggregate([(id_col, "count")])
        )
        return pa.table(
            {
                id_col: g.column(id_col),
                "term": g.column("term"),
                "tf": g.column(f"{id_col}_count").cast(pa.int64()),
            }
        )

    def score_stage(df: pd.DataFrame) -> pd.DataFrame:
        dfc = df.groupby("term", sort=False)["term"].transform("size").to_numpy().astype(np.int64)
        out = df.copy()
        out["df"] = dfc
        out["score"] = df["tf"].to_numpy().astype(np.int64) * (scale // dfc)
        return out

    tf = ds.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True)
    scored = bucketed_map_groups(tf, "term", score_stage, num_buckets=num_buckets)
    return top_k_per_group(
        scored, group_col=id_col, order_col="score", k=k, tie_col="term",
        num_buckets=num_buckets,
    )


def bigram_commonness(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: "int | None" = None,
):
    """Per-document corpus-commonness score — a cheap LM-frequency proxy
    for quality filtering (boilerplate scores high, gibberish scores
    low): for every bigram OCCURRENCE in a doc, its corpus-wide
    occurrence count; per doc the occurrence total, the summed counts
    and the integer mean ``sum_freq // n_bigrams``. Docs with < 2
    tokens have no bigrams and are absent (SQL inner-join semantics).

    Scale shape (the decontamination/tf-idf shape — NO broadcast of the
    count table, which at corpus scale is itself huge): per-block
    (doc, bigram) occurrence rows; ONE bucketed shuffle on the bigram
    groups every occurrence of a bigram into the same bucket, so the
    global count is the in-bucket group size; per-doc partials are
    collapsed INSIDE the bucket (3-int rows), then a keyed sum merges
    the per-bucket partials. Tokenization = lowercased whitespace split
    (``_flat_tokens``), bigram = ``tok[i] + ' ' + tok[i+1]``."""
    from ray.data.aggregate import Sum

    from vaero_ray.stages.dedup import _flat_tokens
    from vaero_ray.stages.keyed import bucketed_map_groups

    def occ_partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "b": pa.array([], pa.string())})
        if not tbl.num_rows:
            return empty
        toks, off = _flat_tokens(tbl, text_col)
        total = len(toks)
        if total < 2:
            return empty
        # valid bigram start positions: token i and i+1 in the SAME doc
        valid = np.ones(total - 1, dtype=bool)
        ends = off[1:] - 1  # last-token index per doc (off[j+1]-1)
        ends = ends[(ends >= 0) & (ends < total - 1)]
        valid[ends] = False
        if not valid.any():
            return empty
        grams = pc.binary_join_element_wise(
            toks.slice(0, total - 1), toks.slice(1, total - 1), " "
        ).filter(pa.array(valid))
        ids = np.repeat(
            tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64),
            np.diff(off),
        )[:-1][valid]
        return pa.table({id_col: pa.array(ids), "b": grams})

    def freq_stage(df: pd.DataFrame) -> pd.DataFrame:
        # global bigram count == in-bucket group size (all occurrences of
        # a bigram hash to this bucket); collapse to per-doc partials so
        # the second exchange moves 3-int rows, not occurrences
        f = df.groupby("b", sort=False)["b"].transform("size").to_numpy().astype(np.int64)
        out = pd.DataFrame({id_col: df[id_col].to_numpy(), "__f": f})
        g = out.groupby(id_col, sort=False)["__f"].agg(["count", "sum"]).reset_index()
        g.columns = [id_col, "n_bigrams", "sum_freq"]
        return g.astype({"n_bigrams": "int64", "sum_freq": "int64"})

    occ = ds.map_batches(occ_partial, batch_format="pyarrow", zero_copy_batch=True)
    partials = bucketed_map_groups(occ, "b", freq_stage, num_buckets=num_buckets)
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    # one hash-bucket exchange, not Ray's per-column sort Aggregate
    merged = bucketed_keyed_sum(partials, [id_col], ["n_bigrams", "sum_freq"])

    def finalize(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.int64)
        s = tbl.column("sum_freq").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: tbl.column(id_col).cast(pa.int64()),
            "n_bigrams": pa.array(n),
            "sum_freq": pa.array(s),
            "avg_freq": pa.array(s // np.maximum(n, 1)),  # nonneg: floor == trunc
        })

    return merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def token_diversity(tbl: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-doc lexical diversity as exact integers: token count and the
    Simpson concentration numerator ``sum(count_t^2)`` over the doc's
    token histogram (inverse-Simpson diversity = n_tokens^2 /
    simpson_num derives exactly; high concentration flags boilerplate —
    the integer-safe alternative to Shannon entropy, whose float sums
    drift under re-ordering). Same one-dictionary-encode kernel as
    ``repetition_stats``; SQL-identical via unnest + GROUP BY."""
    from vaero_ray.stages.dedup import _flat_tokens

    n = tbl.num_rows
    toks, off = _flat_tokens(tbl, text_col)
    n_tok = (off[1:] - off[:-1]).astype(np.int64)
    simpson = np.zeros(n, dtype=np.int64)
    if len(toks):
        codes = np.asarray(pc.dictionary_encode(toks).indices).astype(np.int64)
        K = int(codes.max()) + 1
        if n * K >= 2**63:
            raise ValueError(
                f"token_diversity: (doc, code) key overflow (n={n}, K={K})"
            )
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_tok)
        uk, uc = np.unique(doc_idx * K + codes, return_counts=True)
        np.add.at(simpson, uk // K, uc.astype(np.int64) ** 2)
    return pa.table(
        {
            id_col: tbl.column(id_col).cast(pa.int64()),
            "n_tokens": pa.array(n_tok),
            "simpson_num": pa.array(simpson),
        }
    )


def chunk_documents(
    tbl: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> pa.Table:
    """Split each doc's whitespace token stream into fixed-size training
    chunks with overlap (``chunk_tokens`` per chunk, window advancing by
    ``stride`` — overlap = chunk_tokens - stride): the context-window
    chunker that feeds tokenize-and-pack. Case is PRESERVED (unlike the
    stats kernels); whitespace inside a chunk normalizes to single
    spaces (chunks are token joins, exactly
    ``array_to_string(toks[a:b], ' ')`` in the SQL oracle).

    Output: one row per chunk — (id, chunk_idx, n_chunk_tokens,
    chunk_text); a doc with no tokens emits no rows. Fully vectorized:
    one Arrow split, chunk spans from offset arithmetic, one ``pc.take``
    gather and one ``pc.binary_join`` — no per-doc or per-chunk Python."""
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    n = tbl.num_rows
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "n_chunk_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )
    if not n:
        return empty
    toks_list = pc.utf8_split_whitespace(tbl.column(text_col)).combine_chunks()
    flat = toks_list.flatten()
    off = np.asarray(toks_list.offsets).astype(np.int64)
    off = off - off[0]
    keep = np.asarray(pc.binary_length(flat)).astype(np.int64) > 0
    counts = np.zeros(n, np.int64)
    seg_nz = off[:-1] < off[1:]
    if len(keep) and seg_nz.any():
        counts[seg_nz] = np.add.reduceat(keep.astype(np.int64), off[:-1][seg_nz])
    toks = flat.filter(pa.array(keep)) if len(keep) else flat
    doc_start = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=doc_start[1:])

    n_chunks = (counts + stride - 1) // stride  # 0 chunks for empty docs
    total_chunks = int(n_chunks.sum())
    if not total_chunks:
        return empty
    doc_of = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    chunk_base = np.zeros(n, dtype=np.int64)
    np.cumsum(n_chunks[:-1], out=chunk_base[1:])
    chunk_idx = np.arange(total_chunks, dtype=np.int64) - chunk_base[doc_of]
    start = doc_start[doc_of] + chunk_idx * stride
    end = np.minimum(start + chunk_tokens, doc_start[doc_of] + counts[doc_of])
    lengths = end - start
    # flat gather indices: per chunk, start..end
    cum = np.zeros(total_chunks, dtype=np.int64)
    np.cumsum(lengths[:-1], out=cum[1:])
    total_toks = int(lengths.sum())
    gather = np.arange(total_toks, dtype=np.int64) - np.repeat(cum, lengths) + np.repeat(
        start, lengths
    )
    taken = pc.take(toks, pa.array(gather, pa.int64()))
    chunk_off = np.zeros(total_chunks + 1, dtype=np.int64)
    np.cumsum(lengths, out=chunk_off[1:])
    if chunk_off[-1] >= 2**31:
        raise ValueError("chunk_documents: batch too large for int32 list offsets")
    if isinstance(taken, pa.ChunkedArray):
        taken = taken.combine_chunks()
    chunk_list = pa.ListArray.from_arrays(
        pa.array(chunk_off.astype(np.int32), pa.int32()), taken
    )
    text = pc.binary_join(chunk_list, pa.scalar(" "))
    ids = tbl.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            id_col: pa.array(ids[doc_of]),
            "chunk_idx": pa.array(chunk_idx),
            "n_chunk_tokens": pa.array(lengths),
            "chunk_text": text,
        }
    )


def bigram_association(
    ds,
    text_col: str = "text",
    min_count: int = 5,
    num_buckets: "int | None" = None,
):
    """EXACT positive-PMI bigram detection with zero transcendentals:
    the association test  p(ab) > p(a)p(b)  cross-multiplies to

        n_ab * N_tok * N_tok  >  n_a * n_b * N_bigrams

    — pure integer arithmetic, so the flag (and every count) hashes
    identically to SQL; log-PMI ordering can be derived downstream from
    the emitted integers. The collocation/phrase-mining primitive
    (Church & Hanks association ratio, kept exact).

    Scale shape: token counts and bigram counts are BOTH partial-count
    exchanges (one row per distinct term per block — vocabulary, never
    tokens, on the wire); corpus totals derive from the merged count
    tables; unigram counts attach via two partitioned hash joins (the
    count tables are corpus-sized at 100 TB — nothing is broadcast).
    Only bigrams with ``n_ab >= min_count`` survive to the join (the
    standard collocation support floor; totals are computed BEFORE the
    floor). int64 guard: raises when ``max(n_ab) * N_tok^2`` could wrap
    (switch to the HUGEINT/ratio form at that corpus size)."""
    from vaero_ray.stages.dedup import _flat_tokens

    # the EXPLICIT bucketed join, not the native hash shuffle: both join
    # inputs here are map_groups outputs, which can carry zero-column
    # empty blocks that poison the native join's partition schema
    # seeding (see joins.skew_split_join's cold path for the flake)
    from vaero_ray.stages.joins import _bucketed_hash_join as hash_join
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    def tok_partial(tbl: pa.Table) -> pa.Table:
        toks, _ = _flat_tokens(tbl, text_col)
        # pc.value_counts stays in Arrow — np.unique over an Arrow string
        # array first materializes a Python-object array, which dominates
        vc = pc.value_counts(toks)
        return pa.table({"tok": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    def bigram_partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"b": pa.array([], pa.string()),
                          "n_ab": pa.array([], pa.int64())})
        if not tbl.num_rows:
            return empty
        toks, off = _flat_tokens(tbl, text_col)
        total = len(toks)
        if total < 2:
            return empty
        valid = np.ones(total - 1, dtype=bool)
        ends = off[1:] - 1
        ends = ends[(ends >= 0) & (ends < total - 1)]
        valid[ends] = False
        if not valid.any():
            return empty
        grams = pc.binary_join_element_wise(
            toks.slice(0, total - 1), toks.slice(1, total - 1), " "
        ).filter(pa.array(valid))
        vc = pc.value_counts(grams)
        return pa.table({"b": vc.field("values"),
                         "n_ab": vc.field("counts").cast(pa.int64())})

    from vaero_ray.stages.keyed import compact_small_blocks

    # compact the materialized count tables: the bucketed sum's sort
    # emits ~2x-cpus mostly-empty blocks, taxing the sums and both
    # joins below on every execution (keyed.compact_small_blocks)
    tok_counts = compact_small_blocks(
        bucketed_keyed_sum(
            ds.map_batches(tok_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["tok"], ["n"], num_buckets=num_buckets,
        ).materialize()
    )
    bigram_counts = compact_small_blocks(
        bucketed_keyed_sum(
            ds.map_batches(bigram_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["b"], ["n_ab"], num_buckets=num_buckets,
        ).materialize()
    )

    n_tok = int(tok_counts.sum("n") or 0)
    n_big = int(bigram_counts.sum("n_ab") or 0)
    if not n_big:
        return bigram_counts  # empty

    def split_floor(tbl: pa.Table) -> pa.Table:
        keep = pc.greater_equal(tbl.column("n_ab"), min_count)
        t = tbl.filter(keep)
        parts = pc.split_pattern(t.column("b").combine_chunks(), " ", max_splits=1)
        return pa.table({
            "tok_a": pc.list_element(parts, 0),
            "tok_b": pc.list_element(parts, 1),
            "n_ab": t.column("n_ab").cast(pa.int64()),
        })

    survivors = bigram_counts.map_batches(
        split_floor, batch_format="pyarrow", zero_copy_batch=True
    )
    a_counts = tok_counts.map_batches(
        lambda t: t.rename_columns(["tok_a", "n_a"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    b_counts = tok_counts.map_batches(
        lambda t: t.rename_columns(["tok_b", "n_b"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = hash_join(survivors, a_counts, ["tok_a"], num_buckets=num_buckets or 16)
    joined = hash_join(joined, b_counts, ["tok_b"], num_buckets=num_buckets or 16)

    def finalize(tbl: pa.Table) -> pa.Table:
        n_ab = tbl.column("n_ab").to_numpy(zero_copy_only=False).astype(np.int64)
        n_a = tbl.column("n_a").to_numpy(zero_copy_only=False).astype(np.int64)
        n_b = tbl.column("n_b").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(n_ab) and (
            float(n_ab.max()) * n_tok * n_tok >= 2.0**63
            or float(n_a.max()) * float(n_b.max()) * n_big >= 2.0**63
        ):
            raise ValueError(
                "bigram_association: corpus too large for the int64 "
                "cross-multiplication; use the ratio form"
            )
        assoc = (n_ab * n_tok * n_tok > n_a * n_b * n_big).astype(np.int64)
        return pa.table({
            "tok_a": tbl.column("tok_a"),
            "tok_b": tbl.column("tok_b"),
            "n_ab": pa.array(n_ab),
            "n_a": pa.array(n_a),
            "n_b": pa.array(n_b),
            "assoc": pa.array(assoc),
        })

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def inverted_index(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: "int | None" = None,
    num_buckets: "int | None" = None,
    prefilter_stopwords: "bool | str" = "auto",
    prefilter_sample_factor: int = 8,
    prefilter_min_bytes: int = 1 << 30,
    stopword_broadcast_max: int = 2_000_000,
):
    """Posting-list inverted index: one row per distinct term with its
    document frequency ``df`` and ``postings`` — the comma-joined
    ascending doc-id list (the classic search/retrieval index build;
    the reference has no index op, extension per the training-data
    mandate).

    Scale shape: per-block DISTINCT (doc, term) pairs via one Arrow
    group_by (dedup BEFORE the exchange — a term repeated in a doc
    contributes one pair), then ONE bucketed shuffle on term assembles
    each term's posting list; ``df`` is global inside a bucket, so the
    ``min_df``/``max_df`` bounds apply there. ``max_df`` is the standard
    index-construction stopword cap — posting lists of stopword-class
    terms are inherently corpus-sized; the cap is a semantic knob
    (documented recall policy), not silent truncation. The only
    per-group Python is the final ``','.join`` that MATERIALIZES the
    output string — the string is the deliverable, not a temp.

    When ``max_df`` is set and ``prefilter_stopwords`` is on, a cheap
    pre-pass counts per-term df over a BOUNDED SAMPLE of
    ``prefilter_sample_factor * max_df`` doc rows (``ds.limit`` — the
    streaming executor reads only the needed blocks). Sample df is a
    LOWER BOUND on global df, so any term already over the cap within
    the sample is guaranteed over it globally — those terms' pairs are
    dropped BEFORE the main exchange via a broadcast set. By Zipf the
    head terms the sample catches are exactly the ones whose pairs
    dominate exchange volume (a term must appear in >1/factor of
    sampled docs to be caught; rarer over-cap terms slip through the
    pre-filter and are dropped by the exact post-shuffle cap — output
    is IDENTICAL either way, the sample only tunes exchanged bytes).
    At the 16 M-turn rehearsal (max_df=100k) this cut the index build
    278 s -> 173 s (the ~69 lorem head terms, ~16 M pair rows each,
    never reach the exchange; a FULL-scan pre-pass variant measured
    210 s — the sample keeps the win without paying a second tokenize
    scan; see BASELINE.md). Falls back to the single-pass plan if the
    over-cap set exceeds ``stopword_broadcast_max`` (a pathological
    flat distribution). Default ``"auto"`` enables the pre-pass only
    when the read lineage's metadata size estimate is >=
    ``prefilter_min_bytes`` (the pre-pass is a second small Dataset
    execution, a ~1 s fixed premium toy inputs shouldn't pay — the
    same metadata switch as ``exact_dedup auto`` and the Bloom
    semi-join pre-filter; unresolvable lineage == small in-memory
    input == off)."""
    import pandas as pd

    from vaero_ray.stages.dedup import _flat_tokens
    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    def pairs_tbl(tbl: pa.Table) -> pa.Table:
        toks, off = _flat_tokens(tbl, text_col)
        if not len(toks):
            return pa.table(
                {id_col: pa.array([], pa.int64()), "term": pa.array([], pa.string())}
            )
        ids = np.repeat(tbl.column(id_col).to_numpy(zero_copy_only=False), np.diff(off))
        g = (
            pa.table({id_col: pa.array(ids, pa.int64()), "term": toks})
            .group_by([id_col, "term"])
            .aggregate([])
        )
        return g.select([id_col, "term"])

    enabled = bool(prefilter_stopwords)
    if prefilter_stopwords == "auto" and max_df is not None:
        from vaero_ray.stages.keyed import input_file_bytes, lineage_inmemory_bytes

        est = lineage_inmemory_bytes(ds)
        if est is None:
            fb = input_file_bytes(ds)
            est = fb * 3 if fb is not None else None
        enabled = est is not None and est >= prefilter_min_bytes

    stop_ref = None
    if max_df is not None and enabled:
        import ray as _ray

        def df_partial(tbl: pa.Table) -> pa.Table:
            p = pairs_tbl(tbl)
            g = p.group_by("term").aggregate([("term", "count")])
            return pa.table(
                {"term": g.column("term"), "n": g.column("term_count").cast(pa.int64())}
            )

        sample = ds.limit(int(prefilter_sample_factor) * int(max_df))
        dfs = bucketed_keyed_sum(
            sample.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["term"], ["n"], num_buckets=num_buckets,
        )
        over = dfs.map_batches(
            lambda t: t.filter(pc.greater(t.column("n"), max_df)).select(["term"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        over = over.materialize()
        if over.count() <= stopword_broadcast_max:
            # over-cap set is tiny by Zipf; take_all moves terms only
            stop_set = pa.array([r["term"] for r in over.take_all()], pa.string())
            stop_ref = _ray.put(stop_set)
        # else: flat distribution — fall through to the single-pass plan

    def pairs(tbl: pa.Table) -> pa.Table:
        p = pairs_tbl(tbl)
        if stop_ref is not None and p.num_rows:
            import ray as _ray

            stop = _ray.get(stop_ref)
            if len(stop):
                p = p.filter(pc.invert(pc.is_in(p.column("term"), value_set=stop)))
        return p

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["term", id_col], kind="mergesort")
        sizes = df.groupby("term", sort=False)[id_col].transform("size")
        keep = sizes >= min_df
        if max_df is not None:
            keep &= sizes <= max_df
        df = df[keep]
        if not len(df):
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype="int64"),
                                 "postings": pd.Series([], dtype=object)})
        s = df[id_col].astype(str)
        g = df.assign(__s=s).groupby("term", sort=False)
        out = g.agg(df_=("__s", "size"), postings=("__s", ",".join)).reset_index()
        out = out.rename(columns={"df_": "df"})
        out["df"] = out["df"].astype("int64")
        return out[["term", "df", "postings"]]

    dpairs = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_map_groups(dpairs, "term", per_bucket, num_buckets=num_buckets)


def query_topk_docs(
    ds,
    terms: "list[str]",
    k: int = 10,
    n_docs: "int | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Query-time retrieval over the corpus: top-``k`` documents for a
    bag-of-terms query by integer tf-idf (same ``tf * ((1000 * n_docs)
    // df)`` weighting as ``tfidf_topk``; the lexical complement of the
    ANN embedding search). Ties at rank k break on doc_id ascending.

    Scale shape: tokens are pruned to the query term set INSIDE the
    scan (``pc.is_in`` on the flat token array — only query-term hits
    survive the batch), and a doc is one input row, so each (doc, term,
    tf) pair is globally unique per block; df is a ``|terms|``-row
    aggregate shipped to the driver (lineage-size) and closed over, the
    per-doc score needs NO shuffle, and the only exchange is the final
    sort-limit over docs that matched at least one term."""
    from vaero_ray.stages.dedup import _flat_tokens

    if n_docs is None:
        raise ValueError("query_topk_docs: pass n_docs (parquet-footer count at the call site)")
    term_set = pa.array(sorted(set(terms)), pa.string())
    scale = 1000 * int(n_docs)

    def tf_pairs(tbl: pa.Table) -> pa.Table:
        toks, off = _flat_tokens(tbl, text_col)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
        if not len(toks):
            return empty
        hit = pc.is_in(toks, value_set=term_set)
        ids = np.repeat(tbl.column(id_col).to_numpy(zero_copy_only=False), np.diff(off))
        ids = ids[np.asarray(hit)]
        toks = toks.filter(hit)
        if not len(toks):
            return empty
        g = (
            pa.table({id_col: pa.array(ids, pa.int64()), "term": toks})
            .group_by([id_col, "term"])
            .aggregate([(id_col, "count")])
        )
        return pa.table(
            {
                id_col: g.column(id_col),
                "term": g.column("term"),
                "tf": g.column(f"{id_col}_count").cast(pa.int64()),
            }
        )

    pairs = ds.map_batches(tf_pairs, batch_format="pyarrow", zero_copy_batch=True).materialize()
    # df: one row per query term — driver-tiny by construction
    df_rows = pairs.groupby("term").count().take_all()
    weights = {r["term"]: scale // int(r["count()"]) for r in df_rows}

    def score(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({id_col: pa.array([], pa.int64()), "score": pa.array([], pa.int64())})
        w = np.array(
            [weights[t] for t in tbl.column("term").to_pylist()], dtype=np.int64
        )
        sc = tbl.column("tf").to_numpy(zero_copy_only=False) * w
        g = (
            pa.table({id_col: tbl.column(id_col), "s": pa.array(sc, pa.int64())})
            .group_by(id_col)
            .aggregate([("s", "sum")])
        )
        return pa.table({id_col: g.column(id_col), "score": g.column("s_sum")})

    scored = pairs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)


def _query_tf_pairs(ds, tsorted: "list[str]", text_col: str, id_col: str):
    """Shared query-pruned (doc, term, tf, dl) scan for the retrieval
    operators (BM25 / RRF): tokens are pruned to the query term set
    INSIDE the scan, each surviving pair row carries its doc length, a
    doc lives in one block so pairs are globally unique. Returns a
    MATERIALIZED Dataset (the callers consume it 2-3 times: df
    aggregate + scoring)."""
    term_set = pa.array(tsorted, pa.string())

    def tf_pairs(tbl: pa.Table) -> pa.Table:
        from vaero_ray.stages.dedup import _flat_tokens

        toks, off = _flat_tokens(tbl, text_col)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
            }
        )
        if not len(toks):
            return empty
        dl_per_doc = np.diff(off)
        hit = pc.is_in(toks, value_set=term_set)
        ids = np.repeat(tbl.column(id_col).to_numpy(zero_copy_only=False), dl_per_doc)
        dls = np.repeat(dl_per_doc.astype(np.int64), dl_per_doc)
        m = np.asarray(hit)
        if not m.any():
            return empty
        g = (
            pa.table(
                {
                    id_col: pa.array(ids[m], pa.int64()),
                    "term": toks.filter(hit),
                    "dl": pa.array(dls[m], pa.int64()),
                }
            )
            .group_by([id_col, "term", "dl"])
            .aggregate([(id_col, "count")])
        )
        return pa.table(
            {
                id_col: g.column(id_col),
                "term": g.column("term"),
                "tf": g.column(f"{id_col}_count").cast(pa.int64()),
                "dl": g.column("dl"),
            }
        )

    return ds.map_batches(tf_pairs, batch_format="pyarrow", zero_copy_batch=True).materialize()


def bm25_topk_docs(
    ds,
    terms: "list[str]",
    n_docs: int,
    n_tokens_total: int,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Okapi BM25 top-``k`` retrieval (Lucene defaults k1=1.2, b=0.75)
    — the length-normalized, tf-saturating upgrade of the integer
    tf-idf gate (:func:`query_topk_docs`): long documents stop winning
    on raw term counts, and repeated terms saturate instead of scoring
    linearly.

    Engine-independence trick: with k1=6/5 and b=3/4 the tf-saturation
    factor collapses to the exact int64 rational
    ``22*tf*Ntok / (10*tf*Ntok + 3*Ntok + 9*dl*N)`` (Ntok = corpus
    tokens, N = corpus docs, dl = doc length), so the ONLY floats are
    |terms| idf constants ``ln((N-df+0.5)/(df+0.5)+1)`` and the final
    fixed-order weighted sum over the (sorted) query terms — the
    identical expression the SQL oracle writes, no order-dependent
    float aggregation anywhere.

    Scale shape mirrors query_topk_docs: tokens pruned to the query set
    inside the scan (dl rides each surviving pair row), df is a
    |terms|-row driver aggregate closed over, scoring is per-block
    (a doc lives in one row), and the one exchange is the sort-limit."""
    from vaero_ray.stages.dedup import _flat_tokens

    tsorted = sorted(set(terms))
    pairs = _query_tf_pairs(ds, tsorted, text_col, id_col)
    df_rows = pairs.groupby("term").count().take_all()
    dfs = {r["term"]: int(r["count()"]) for r in df_rows}
    idf = {
        t: math.log((n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) + 1.0)
        for t in tsorted
    }

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        piv = df.pivot_table(
            index=id_col, columns="term", values="tf", aggfunc="sum", fill_value=0
        )
        dl = df.groupby(id_col)["dl"].first().loc[piv.index].to_numpy(np.int64)
        sc = np.zeros(len(piv), np.float64)
        for t in tsorted:  # FIXED lex order: same float association as the oracle
            tf = (
                piv[t].to_numpy(np.int64) if t in piv.columns
                else np.zeros(len(piv), np.int64)
            )
            den = (10 * tf * n_tokens_total + 3 * n_tokens_total + 9 * dl * n_docs).astype(np.float64)
            sc = sc + idf[t] * (((22.0 * tf) * n_tokens_total) / den)
        return pd.DataFrame({id_col: piv.index.to_numpy(np.int64), "score": sc})

    scored = pairs.map_batches(score, batch_format="pandas")
    top = (
        scored.sort(["score", id_col], descending=[True, False]).limit(k).to_pandas()
    )
    return pa.table(
        {
            id_col: pa.array(top[id_col].to_numpy(np.int64), pa.int64()),
            "score": pa.array(np.round(top["score"].to_numpy(np.float64), 6), pa.float64()),
        }
    )


def rrf_topk_docs(
    ds,
    terms: "list[str]",
    n_docs: int,
    n_tokens_total: int,
    k: int = 10,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Reciprocal-rank fusion of the engine's two lexical rankers —
    integer tf-idf (:func:`query_topk_docs` weighting) and Okapi BM25
    (:func:`bm25_topk_docs` integer-rational form) — the standard
    hybrid-retrieval combiner: ``rrf = sum_r 1/(rrf_k + rank_r)``.
    Ranks are dense ROW_NUMBERs over the candidate set (docs matching
    >= 1 query term), ordered (score DESC, doc_id); the per-ranker
    reciprocal is quantized to ``round(1e9/(rrf_k+rank))`` NANO-units
    (half-away, mirroring SQL ROUND) so the fused score is an exact
    int64 sum — order/engine-invariant — and ``rrf`` is the raw float64
    division by 1e9.

    Scale shape: ONE query-pruned tf scan feeds both scorers (each doc
    scores inside its own block; df / idf are |terms|-row driver
    constants); each ranking is one range-partitioning sort +
    block-offset prefix sum (``rowwindow.global_row_number`` — no rows
    leave their post-sort block); one adaptive join aligns the two rank
    columns; the final top-k is a sort-limit over candidates only."""
    from vaero_ray.stages.joins import auto_join
    from vaero_ray.stages.rowwindow import global_row_number

    tsorted = sorted(set(terms))
    pairs = _query_tf_pairs(ds, tsorted, text_col, id_col)
    df_rows = pairs.groupby("term").count().take_all()
    dfs = {r["term"]: int(r["count()"]) for r in df_rows}
    idf = {
        t: math.log((n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) + 1.0)
        for t in tsorted
    }
    w_tfidf = {t: (1000 * n_docs) // max(dfs.get(t, 0), 1) for t in tsorted}

    def score_both(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "s_tfidf": pd.Series([], dtype=np.int64),
                                 "neg_tfidf": pd.Series([], dtype=np.int64),
                                 "s_bm25": pd.Series([], dtype=np.float64),
                                 "neg_bm25": pd.Series([], dtype=np.float64)})
        piv = df.pivot_table(
            index=id_col, columns="term", values="tf", aggfunc="sum", fill_value=0
        )
        dl = df.groupby(id_col)["dl"].first().loc[piv.index].to_numpy(np.int64)
        s_int = np.zeros(len(piv), np.int64)
        s_bm = np.zeros(len(piv), np.float64)
        for t in tsorted:  # FIXED lex order: same float association as the oracle
            tf = (
                piv[t].to_numpy(np.int64) if t in piv.columns
                else np.zeros(len(piv), np.int64)
            )
            s_int = s_int + tf * w_tfidf[t]
            den = (10 * tf * n_tokens_total + 3 * n_tokens_total + 9 * dl * n_docs).astype(np.float64)
            s_bm = s_bm + idf[t] * (((22.0 * tf) * n_tokens_total) / den)
        return pd.DataFrame(
            {id_col: piv.index.to_numpy(np.int64),
             "s_tfidf": s_int, "neg_tfidf": -s_int,
             "s_bm25": s_bm, "neg_bm25": -s_bm}
        )

    scored = pairs.map_batches(score_both, batch_format="pandas").materialize()
    ra = global_row_number(scored, ["neg_tfidf", id_col], out_col="rank_tfidf")
    rb = global_row_number(
        scored.select_columns([id_col, "neg_bm25"]), ["neg_bm25", id_col],
        out_col="rank_bm25",
    ).select_columns([id_col, "rank_bm25"])
    both = auto_join(
        ra.select_columns([id_col, "rank_tfidf"]), rb, keys=id_col
    )

    def fuse(tbl: pa.Table) -> pa.Table:
        raa = tbl.column("rank_tfidf").to_numpy(zero_copy_only=False).astype(np.int64)
        rbb = tbl.column("rank_bm25").to_numpy(zero_copy_only=False).astype(np.int64)
        micro = (
            np.floor(1e9 / (rrf_k + raa) + 0.5).astype(np.int64)
            + np.floor(1e9 / (rrf_k + rbb) + 0.5).astype(np.int64)
        )
        return pa.table(
            {id_col: tbl.column(id_col), "rank_tfidf": pa.array(raa, pa.int64()),
             "rank_bm25": pa.array(rbb, pa.int64()),
             "rrf_nano": pa.array(micro, pa.int64()),
             "rrf": pa.array(micro / 1e9, pa.float64())}
        )

    fused = both.map_batches(fuse, batch_format="pyarrow", zero_copy_batch=True)
    top = fused.sort(["rrf_nano", id_col], descending=[True, False]).limit(k)
    return top


def bm25_ndcg(
    ds,
    terms: "list[str]",
    n_docs: int,
    n_tokens_total: int,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """NDCG@k of the BM25 ranking against graded TERM-COVERAGE
    relevance (rel = number of distinct query terms present) — the
    self-contained retrieval-quality metric: no human labels at corpus
    scale, but coverage grades are deterministic and the metric still
    moves when the ranker regresses. DCG uses the engine's own top-k
    (one sort-limit); the ideal DCG needs only the global relevance
    SPECTRUM (a <=|terms|+1-cell aggregate), never a second ranking.
    Same integer-rational BM25 score and fixed-order float chain as
    :func:`bm25_topk_docs`."""
    tsorted = sorted(set(terms))
    pairs = _query_tf_pairs(ds, tsorted, text_col, id_col)
    df_rows = pairs.groupby("term").count().take_all()
    dfs = {r["term"]: int(r["count()"]) for r in df_rows}
    idf = {
        t: math.log((n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) + 1.0)
        for t in tsorted
    }

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "rel": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        piv = df.pivot_table(
            index=id_col, columns="term", values="tf", aggfunc="sum", fill_value=0
        )
        dl = df.groupby(id_col)["dl"].first().loc[piv.index].to_numpy(np.int64)
        sc = np.zeros(len(piv), np.float64)
        rel = np.zeros(len(piv), np.int64)
        for t in tsorted:  # FIXED lex order: same float association as the oracle
            tf = (
                piv[t].to_numpy(np.int64) if t in piv.columns
                else np.zeros(len(piv), np.int64)
            )
            rel = rel + (tf > 0).astype(np.int64)
            den = (10 * tf * n_tokens_total + 3 * n_tokens_total + 9 * dl * n_docs).astype(np.float64)
            sc = sc + idf[t] * (((22.0 * tf) * n_tokens_total) / den)
        return pd.DataFrame({id_col: piv.index.to_numpy(np.int64), "rel": rel, "score": sc})

    scored = pairs.map_batches(score, batch_format="pandas").materialize()
    n_cand = int(scored.count())
    top = scored.sort(["score", id_col], descending=[True, False]).limit(k).to_pandas()
    spectrum = scored.groupby("rel").count().to_pandas()
    rels_ideal: "list[int]" = []
    for rel_v in sorted(spectrum["rel"], reverse=True):
        cnt = int(spectrum.loc[spectrum["rel"] == rel_v, "count()"].iloc[0])
        take = min(cnt, k - len(rels_ideal))
        rels_ideal.extend([int(rel_v)] * take)
        if len(rels_ideal) >= k:
            break
    dcg = 0.0
    for i, rel_v in enumerate(top["rel"].tolist()):
        dcg += (2.0 ** rel_v - 1.0) / np.log2(i + 2.0)
    idcg = 0.0
    for i, rel_v in enumerate(rels_ideal):
        idcg += (2.0 ** rel_v - 1.0) / np.log2(i + 2.0)
    ndcg = round(dcg / idcg, 6) if idcg > 0 else None
    return pa.table(
        {
            "n_candidates": pa.array([n_cand], pa.int64()),
            "dcg": pa.array([round(dcg, 6)], pa.float64()),
            "idcg": pa.array([round(idcg, 6)], pa.float64()),
            "ndcg": pa.array([ndcg], pa.float64()),
        }
    )


def unigram_xent(
    ds,
    n_docs_hint: "int | None" = None,
    top_v: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document cross-entropy under the corpus UNIGRAM language
    model — the perplexity-filter stage of a training-data pipeline
    (CCNet-style: documents whose token stream the corpus LM finds
    surprising are boilerplate, noise, or wrong-language): with
    add-one-smoothed probabilities over the top-``top_v`` vocabulary
    (OOV collapses to one UNK class), ``xent(doc) = -sum_t ln p(t) /
    n_tokens``.

    Engine-independence: each vocabulary term's log-probability is
    quantized ONCE to nano-units (``floor(ln(p)*1e9 + 0.5)``, a
    per-term constant), so every document's sum is an exact int64 —
    token order, shard order and float association all drop out; the
    only division is the final raw float64 ``-sum/(n*1e9)``.

    Scale shape: the vocabulary pass is the standard per-block partial
    count + small merge (moves vocabulary, not tokens); the top-V +
    total fit the driver (lineage-size) and broadcast into the scoring
    scan; each doc scores inside its own block — no shuffle at all
    beyond the vocab aggregate. Returns (doc_id, n_toks, sum_lp_nano,
    xent)."""
    from ray.data.aggregate import Sum

    from vaero_ray.stages.dedup import _flat_tokens

    def partial(tbl: pa.Table) -> pa.Table:
        toks, _ = _flat_tokens(tbl, text_col)
        if not len(toks):
            return pa.table({"term": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"term": toks}).group_by("term").aggregate([([], "count_all")])
        return t.rename_columns(["term", "c"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
    )
    # deterministic top-V: count DESC, term ASC; total over ALL terms
    top = counts.sort(["c", "term"], descending=[True, False]).limit(top_v).to_pandas()
    n_total = int(counts.sum("c"))
    vocab = dict(zip(top["term"], top["c"].astype(np.int64)))
    in_vocab_total = int(top["c"].sum())
    denom = float(n_total + top_v + 1)
    lp_nano = {
        t: int(np.floor(math.log((int(c) + 1) / denom) * 1e9 + 0.5))
        for t, c in vocab.items()
    }
    # OOV class: all out-of-vocab tokens share one smoothed mass
    oov_c = n_total - in_vocab_total
    lp_oov = int(np.floor(math.log((oov_c + 1) / denom) * 1e9 + 0.5))

    def score(tbl: pa.Table) -> pa.Table:
        toks, off = _flat_tokens(tbl, text_col)
        n = tbl.num_rows
        n_toks = (off[1:] - off[:-1]).astype(np.int64)
        if not len(toks):
            return pa.table(
                {id_col: tbl.column(id_col),
                 "n_toks": pa.array(np.zeros(n, np.int64)),
                 "sum_lp_nano": pa.array(np.zeros(n, np.int64)),
                 "xent": pa.array([None] * n, pa.float64())}
            )
        tv = pd.Series(toks.to_pandas()).map(lp_nano).fillna(lp_oov).to_numpy(np.int64)
        sums = np.zeros(n, np.int64)
        nz = n_toks > 0
        if nz.any():
            csum = np.concatenate(([0], np.cumsum(tv)))
            sums[nz] = csum[off[1:][nz]] - csum[off[:-1][nz]]
        with np.errstate(invalid="ignore", divide="ignore"):
            xent = np.where(n_toks > 0, -sums / (n_toks * 1e9), np.nan)
        return pa.table(
            {id_col: tbl.column(id_col),
             "n_toks": pa.array(n_toks),
             "sum_lp_nano": pa.array(sums),
             "xent": pa.array(
                 [None if not k else float(x) for k, x in zip(n_toks, xent)],
                 pa.float64())}
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def blocklist_scan(
    ds,
    terms: "list[str]",
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Blocklist/dictionary tagger — the safety-filter primitive of a
    corpus-curation pipeline: per document, total occurrences of the
    blocklist terms (case-insensitive substring count), how many
    distinct terms hit, and a flag at ``min_hits`` total occurrences.

    Stateless one-pass ``map_batches``: one vectorized
    ``pc.count_substring`` kernel per term per batch (T kernels over
    zero-copy Arrow — no per-row Python, no shuffle; at 100 TB this is
    a pure scan that prunes to three int64 columns). For large
    dictionaries, swap the per-term kernels for one Aho-Corasick actor
    pool; the per-doc output contract stays identical.
    """
    import pyarrow.compute as _pc

    # the contract is case-insensitive matching: text is lowercased per
    # batch, so the terms must be lowercased too or an uppercase term
    # could never match
    terms = [t.lower() for t in terms]

    def scan(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        total = np.zeros(n, np.int64)
        nterm = np.zeros(n, np.int64)
        if n:
            low = _pc.utf8_lower(tbl.column(text_col))
            for t in terms:
                c = _pc.count_substring(low, t).to_numpy(zero_copy_only=False).astype(np.int64)
                total += c
                nterm += c > 0
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "total_hits": pa.array(total, pa.int64()),
                "n_terms": pa.array(nterm, pa.int64()),
                "flagged": pa.array((total >= min_hits).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
