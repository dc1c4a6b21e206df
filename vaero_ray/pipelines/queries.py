"""The driver-facing query catalog: named Ray pipelines + DuckDB oracles.

Each entry exercises one operator family from SURVEY.md §2 over the
driver's testdata tables (pre-registered DuckDB views). Transcript-engine
pipelines run over the transcript table derived from ``events``
(see derived.py) so their oracles are pure SQL.

Conventions for the driver's compare (row-count + schema + order-
insensitive value-hash):
- every computed column is aliased identically in Ray and SQL;
- SUMs of integers are CAST AS BIGINT in SQL (DuckDB would return
  HUGEINT) to match Arrow int64;
- double aggregates are ROUNDed identically on both sides;
- ratio-style outputs are avoided in oracle-checked queries (banker's
  vs half-away rounding could differ at exact .5 ULPs) — counts only.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from vaero_ray.io import read_parquet as _read_pq

from vaero_ray.pipelines.derived import TRANSCRIPTS_CTE, derive_transcripts
from vaero_ray.stages.ann import brute_force_topk, ivf_topk, train_centroids
from vaero_ray.stages.dedup import (
    embedding_cosine_dups,
    embedding_lsh_dups,
    exact_dedup,
    ngram_jaccard_dups,
    simhash_signatures,
)
from vaero_ray.stages.stitch import stitch_conversations, stitch_exchanges
from vaero_ray.stages.textstats import LangId, token_counts
from vaero_ray.stages.windows import (
    AggSpec,
    session_aggregate,
    windowed_aggregate,
)
from vaero_ray.transforms import compile_chain

QueryFn = Callable[[str], Any]

_EMAIL_RE = r"user\d+@example\.com"


def _events(sf_dir: str, columns=None) -> rd.Dataset:
    return _read_pq(f"{sf_dir}/events.parquet", columns=columns)


# ------------------------------------------------------------------
# Vaero core transforms (reference §2a) over the events table
# ------------------------------------------------------------------

def q_vaero_add_rename_delete(sf_dir: str):
    chain = compile_chain(
        [
            ("add", {"path": "pipeline", "value": "p1"}),
            ("rename", {"path": "value", "new_path": "score"}),
            ("delete", {"path": "props"}),
        ]
    )
    return _events(sf_dir).map_batches(chain, batch_format="pyarrow", zero_copy_batch=True)


SQL_ADD_RENAME_DELETE = """
SELECT event_id, ts, user_id, event_type, value AS score, 'p1' AS pipeline FROM events
"""


def q_vaero_filter_regexp(sf_dir: str):
    chain = compile_chain([("filter_regexp", {"path": "event_type", "regex": "^(click|view)$"})])
    return _events(sf_dir).map_batches(chain, batch_format="pyarrow", zero_copy_batch=True)


SQL_FILTER_REGEXP = """
SELECT * FROM events WHERE regexp_matches(event_type, '^(click|view)$')
"""


def q_vaero_mask(sf_dir: str):
    chain = compile_chain([("mask", {"path": "props", "regex": r"\d+", "replace_expr": "#"})])
    ds = _events(sf_dir, columns=["event_id", "props"])
    return ds.map_batches(chain, batch_format="pyarrow", zero_copy_batch=True)


SQL_MASK = r"""
SELECT event_id, regexp_replace(props, '\d+', '#', 'g') AS props FROM events
"""


def q_vaero_parse_regexp(sf_dir: str):
    chain = compile_chain([("parse_regexp", {"path": "props", "regex": r'"k": (?P<k_val>\d+)'})])
    ds = _events(sf_dir, columns=["event_id", "props"])
    out = ds.map_batches(chain, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["event_id", "k_val"])


SQL_PARSE_REGEXP = r"""
SELECT event_id, regexp_extract(props, '"k": (\d+)', 1) AS k_val FROM events
"""


def q_vaero_parse_json(sf_dir: str):
    """JSON payload promotion — the columnar form of the reference's JSON
    event model: parse props once per batch (one pyarrow C++ NDJSON read,
    no per-row json.loads) and surface its keys as typed fields."""
    chain = compile_chain([("parse_json", {"path": "props"})])
    ds = _events(sf_dir, columns=["event_id", "props"])
    out = ds.map_batches(chain, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["event_id", "k"])


SQL_PARSE_JSON = """
SELECT event_id, CAST(props::JSON->>'k' AS BIGINT) AS k FROM events
"""


def q_vaero_select(sf_dir: str):
    chain = compile_chain([("select", {"path": "event_type"})])
    return _events(sf_dir, columns=["event_type"]).map_batches(
        chain, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_SELECT = "SELECT event_type FROM events"


# ------------------------------------------------------------------
# Windows / watermark-tier operators (north_star §2b) over events
# ------------------------------------------------------------------

def _value_to_cents(t: pa.Table) -> pa.Table:
    """Fixed-point the money column PER ROW before any aggregate
    (``floor(v*100+0.5)``, the engine-wide exact-sum convention): partial
    sums are then order/shard/epoch-boundary-invariant int64, instead of
    float64 sums rounded at the end (whose low bits depend on addition
    order and whose .5 boundary Arrow rounds half-to-even but DuckDB
    half-away)."""
    return t.set_column(
        t.column_names.index("value"),
        "value",
        pc.cast(pc.floor(pc.add(pc.multiply(t.column("value"), 100.0), 0.5)), pa.int64()),
    )


def q_tumbling_window_agg(sf_dir: str):
    ds = _events(sf_dir, columns=["event_type", "ts", "value"]).map_batches(
        _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
    )
    return windowed_aggregate(
        ds,
        keys=["event_type"],
        aggs=[AggSpec(None, "count", "n_events"), AggSpec("value", "sum", "sum_value_cents")],
        ts_col="ts",
        size_s=3600,
    )


SQL_TUMBLING = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


def q_sliding_window_count(sf_dir: str):
    # pane-based: partials on the slide pane, panes expanded to windows
    # (no event replication — round 1 replicated rows size/slide times)
    from vaero_ray.stages.windows import sliding_windowed_aggregate

    ds = _events(sf_dir, columns=["event_type", "ts"])
    return sliding_windowed_aggregate(
        ds, keys=["event_type"], aggs=[AggSpec(None, "count", "n_events")], ts_col="ts",
        size_s=7200, slide_s=3600,
    )


SQL_SLIDING = """
SELECT event_type, window_start, COUNT(*) AS n_events FROM (
  SELECT event_type, date_trunc('hour', ts) AS window_start FROM events
  UNION ALL
  SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events
) GROUP BY 1, 2
"""


def q_session_window_stats(sf_dir: str):
    # fused sessionize + per-session aggregate: ONE bucketed shuffle
    ds = _events(sf_dir, columns=["user_id", "ts"])
    return session_aggregate(
        ds,
        key="user_id",
        ts_col="ts",
        gap_s=1800,
        aggs=[
            AggSpec(None, "count", "n_events"),
            AggSpec("ts", "min", "start_ts"),
            AggSpec("ts", "max", "end_ts"),
        ],
    )


SQL_SESSION = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM d
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM s GROUP BY 1, 2
"""


# ------------------------------------------------------------------
# Transcript engine (derived transcript table; see derived.py)
# ------------------------------------------------------------------

def q_transcripts_derive(sf_dir: str):
    return derive_transcripts(sf_dir)


SQL_TRANSCRIPTS = f"WITH {TRANSCRIPTS_CTE} SELECT * FROM transcripts"


def q_transcript_stitch(sf_dir: str):
    return stitch_conversations(derive_transcripts(sf_dir))


SQL_STITCH = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id,
       COUNT(*) AS n_turns,
       COUNT(*) FILTER (WHERE role = 'user') AS n_user,
       COUNT(*) FILTER (WHERE role = 'assistant') AS n_assistant,
       COUNT(*) FILTER (WHERE role = 'tool') AS n_tool,
       string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS transcript,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM transcripts GROUP BY conv_id
"""


def q_transcript_exchanges(sf_dir: str):
    from vaero_ray.stages.stitch import assign_exchanges

    return assign_exchanges(derive_transcripts(sf_dir))


SQL_EXCHANGES = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, role, text, tool, ts,
       COUNT(CASE WHEN role = 'user' THEN 1 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS UNBOUNDED PRECEDING) AS exchange_idx
FROM transcripts
"""


def q_transcript_stitch_exchanges(sf_dir: str):
    return stitch_exchanges(derive_transcripts(sf_dir))


SQL_STITCH_EXCHANGES = f"""
WITH {TRANSCRIPTS_CTE}, e AS (
  SELECT *, COUNT(CASE WHEN role = 'user' THEN 1 END)
                OVER (PARTITION BY conv_id ORDER BY turn_idx
                      ROWS UNBOUNDED PRECEDING) AS exchange_idx
  FROM transcripts
)
SELECT conv_id, exchange_idx,
       COALESCE(string_agg(CASE WHEN role = 'user' THEN text END,
                           chr(10) ORDER BY turn_idx), '') AS user_text,
       COALESCE(string_agg(CASE WHEN role = 'assistant' THEN text END,
                           chr(10) ORDER BY turn_idx), '') AS assistant_text,
       COUNT(CASE WHEN role = 'tool' THEN 1 END) AS n_tool_calls,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM e GROUP BY 1, 2
"""


def q_conv_response_latency(sf_dir: str):
    """Per-conversation assistant response latency (the agent-transcript
    SLA metric): every assistant turn immediately preceded by a user turn
    contributes ts - prev_ts; lag derivation AND the per-conversation
    aggregate run inside ONE conv_id bucket kernel — only final aggregate
    rows leave any task (a LAG stage then a GROUP BY stage would shuffle
    the turns twice). Uses the STATELESS transcript derivation and
    orders by (ts, event_id) inside the bucket — identical to turn_idx
    order by construction, skipping the turn-numbering shuffle
    (flagship lesson: don't pay a shuffle for numbering you re-derive)."""
    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.stitch import response_latency

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.select_columns(["conv_id", "role", "ts", "event_id"])
    return response_latency(ds, order=["ts", "event_id"])


SQL_RESPONSE_LATENCY = f"""
WITH {TRANSCRIPTS_CTE}, l AS (
  SELECT conv_id, role, ts,
         LAG(role) OVER w AS prev_role,
         LAG(ts)   OVER w AS prev_ts
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id,
       COUNT(*) AS n_responses,
       CAST(SUM(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT) AS total_latency_us,
       CAST(MAX(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT) AS max_latency_us
FROM l
WHERE role = 'assistant' AND prev_role = 'user'
GROUP BY conv_id
"""


def q_conv_fingerprint_dedup(sf_dir: str):
    """CONVERSATION-level exact dedup: an order-sensitive mergeable
    fingerprint (per-turn ``(text_hash+1) * 131^turn_idx`` mod M31,
    summed per conversation) identifies conversations whose full turn
    sequence repeats, and the keep-min rule drops the copies. The
    event-id prefix is stripped from the text first, so two
    conversations that replay the same (event_type, props) sequence on
    different days genuinely collide — the transcript analogue of
    exact_dedup_docs. Text is hashed STATELESS before the conv shuffle
    (the exchange moves int64 hashes, not text); turn order is derived
    in-bucket from (ts, event_id), skipping the turn-numbering shuffle."""
    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.convstats import conv_fingerprint, dedup_by_fingerprint, turn_hash

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    def hash_stage(tbl: pa.Table) -> pa.Table:
        stripped = pc.replace_substring_regex(tbl.column("text"), r"^event \d+ ", "")
        tmp = turn_hash(pa.table({"__t": stripped}), "__t")
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "ts": tbl.column("ts"),
                "event_id": tbl.column("event_id"),
                "th": tmp.column("th"),
            }
        )

    ds = ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    fps = conv_fingerprint(ds, key="conv_id", order=["ts", "event_id"])
    return dedup_by_fingerprint(fps)


SQL_CONV_FP_DEDUP = f"""
WITH {TRANSCRIPTS_CTE}, s AS (
  SELECT conv_id, turn_idx,
    lower(regexp_replace(regexp_replace(text, '^event \\d+ ', ''), '\\s+', ' ', 'g')) AS norm
  FROM transcripts
), h AS (
  SELECT conv_id, turn_idx,
    CASE WHEN length(norm) = 0 THEN 0 ELSE
      list_reduce([CAST(unicode(substr(norm, CAST(i AS INT), 1)) AS BIGINT)
                   FOR i IN range(1, length(norm)+1)],
                  (a,c) -> (a*31+c) % 2147483647) END AS th
  FROM s
), t AS (
  SELECT conv_id,
    ((th + 1) * list_reduce([CAST(1 AS BIGINT)] ||
        [CAST(131 AS BIGINT) FOR i IN range(1, turn_idx + 1)],
        (a,c) -> (a*c) % 2147483647)) % 2147483647 AS term
  FROM h
), f AS (
  SELECT conv_id, COUNT(*) AS n_turns,
         CAST(SUM(term) % 2147483647 AS BIGINT) AS conv_fp
  FROM t GROUP BY conv_id
)
SELECT MIN(conv_id) AS conv_id, n_turns, conv_fp
FROM f GROUP BY conv_fp, n_turns
"""


def q_conv_role_violations(sf_dir: str):
    """Turn-taking CEP over transcripts: per conversation, count adjacent
    turn pairs with the SAME role (a well-formed agent transcript
    alternates; violations flag duplicated or mis-stitched turns). One
    conv-bucketed shuffle; lag compare and the per-conv aggregate run in
    the bucket kernel, so only aggregate rows leave any task."""
    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.convstats import alternation_stats

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.select_columns(["conv_id", "role", "ts", "event_id"])
    return alternation_stats(ds, key="conv_id", order=["ts", "event_id"])


SQL_CONV_ROLE_VIOLATIONS = f"""
WITH {TRANSCRIPTS_CTE}, l AS (
  SELECT conv_id,
         CASE WHEN role = LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
              THEN 1 ELSE 0 END AS v
  FROM transcripts
)
SELECT conv_id, COUNT(*) AS n_turns, CAST(SUM(v) AS BIGINT) AS n_violations
FROM l GROUP BY conv_id
"""


def q_flagship_windowed_route(sf_dir: str):
    """The headline pipeline: transcripts -> Vaero transform chain (mask
    PII emails, route user/assistant turns) -> tumbling 1h windowed
    per-role aggregate. Composition of reference semantics (§2a) with the
    mandated window tier (§2b)."""
    from vaero_ray.pipelines.derived import derive_transcripts_stateless

    ds = derive_transcripts_stateless(sf_dir)  # no turn_idx needed: skip its shuffle
    chain = compile_chain(
        [
            ("mask", {"path": "text", "regex": _EMAIL_RE, "replace_expr": "<email>"}),
            ("filter_regexp", {"path": "role", "regex": "^(user|assistant)$"}),
        ]
    )
    ds = ds.map_batches(chain, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: t.append_column("n_chars", pc.cast(pc.utf8_length(t.column("text")), pa.int64())),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return windowed_aggregate(
        ds,
        keys=["role"],
        aggs=[AggSpec(None, "count", "n_turns"), AggSpec("n_chars", "sum", "sum_chars")],
        ts_col="ts",
        size_s=3600,
    )


SQL_FLAGSHIP = rf"""
WITH {TRANSCRIPTS_CTE}, m AS (
  SELECT role, date_trunc('hour', ts) AS window_start,
         length(regexp_replace(text, 'user\d+@example\.com', '<email>', 'g')) AS nc
  FROM transcripts
  WHERE regexp_matches(role, '^(user|assistant)$')
)
SELECT role, window_start, COUNT(*) AS n_turns,
       CAST(SUM(nc) AS BIGINT) AS sum_chars
FROM m GROUP BY 1, 2
"""


# ------------------------------------------------------------------
# Training-data ops: dedup / text stats / similarity search
# ------------------------------------------------------------------

def q_exact_dedup_docs(sf_dir: str):
    ds = _read_pq(f"{sf_dir}/documents.parquet")
    return exact_dedup(ds, text_col="text", id_col="doc_id")


SQL_EXACT_DEDUP = """
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)
"""


def q_doc_token_stats(sf_dir: str):
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(token_counts, batch_format="pyarrow", zero_copy_batch=True)

    def extra(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "n_bpe_tokens": t.column("n_bpe_tokens"),
                "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
                "n_punct": pc.cast(pc.count_substring_regex(txt, r"[^\w\s]"), pa.int64()),
                "n_digits": pc.cast(pc.count_substring_regex(txt, r"\d"), pa.int64()),
            }
        )

    return out.map_batches(extra, batch_format="pyarrow", zero_copy_batch=True)


SQL_TOKEN_STATS = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\w\s]')) AS n_bpe_tokens,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
       len(regexp_extract_all(text, '\d')) AS n_digits
FROM documents
"""


def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", filters=[("vec_id", "=", vec_id)])
    return np.asarray(t.column("embedding")[0].as_py(), dtype=np.float64)


def q_ann_topk_bruteforce(sf_dir: str):
    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk(ds, _query_vec(sf_dir), k=10, round_dp=6)


SQL_ANN_TOPK = """
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    (SELECT CAST(embedding AS DOUBLE[])
                                     FROM embeddings WHERE vec_id = 0)), 6) AS cosine_sim
FROM embeddings e
ORDER BY cosine_sim DESC, vec_id LIMIT 10
"""


# ------------------------------------------------------------------
# Streaming engine through the SQL gate: the micro-batch epoch driver
# (watermarks + exactly-once checkpointed sink) must converge to the
# same rows as a batch/SQL tumbling aggregate once the stream ends.
# ------------------------------------------------------------------

# Arrival chunks per streaming GATE (not a job-semantics knob): each
# chunk is one exactly-once epoch, and every epoch pays the full commit
# barrier (merge shuffle + canonical write + fsync'd manifest). 2 chunks
# still exercise the incremental path the gates exist to check — state
# carried across an epoch boundary plus the finalize flush (3 commits) —
# while halving the fixed premium the 4-chunk fixture paid (5 commits);
# production epoch sizes amortize this cost, gate inputs do not. The
# multi-epoch / kill-resume machinery keeps its own deeper pytest
# coverage (test_streaming, test_compact, test_*_job).
GATE_STREAM_CHUNKS = int(os.environ.get("VAERO_GATE_STREAM_CHUNKS", "2"))


def _stream_chunks(sf_dir: str, subdir: str, columns: "list[str]",
                   table: str = "events", n_chunks: int | None = None) -> str:
    """Arrival-chunk fixture for the streaming gates: ``n_chunks``
    (default ``GATE_STREAM_CHUNKS``) ts-sorted parquet chunks of
    ``table``'s ``columns`` under ``/tmp/vaero_ray_gate/<sf>/<subdir>``,
    built atomically (tmp dir + os.replace). The cache is keyed by the
    sf-dir BASENAME plus (row count, chunk count), so it is re-built
    whenever the source row count OR the chunking changes (regenerated
    testdata previously replayed stale chunks against a fresh oracle)."""
    import os
    import shutil

    if n_chunks is None:
        n_chunks = GATE_STREAM_CHUNKS
    src = f"{sf_dir}/{table}.parquet"
    n_src = pq.ParquetFile(src).metadata.num_rows
    base = f"/tmp/vaero_ray_gate/{os.path.basename(os.path.normpath(sf_dir))}"
    ind = f"{base}/{subdir}"
    if os.path.isdir(ind):
        try:
            files = [f for f in sorted(os.listdir(ind)) if f.endswith(".parquet")]
            cached = sum(
                pq.ParquetFile(os.path.join(ind, f)).metadata.num_rows
                for f in files
            )
            n_files = len(files)
        except Exception:
            cached, n_files = -1, -1
        if cached == n_src and n_files == n_chunks:
            return ind
        shutil.rmtree(ind, ignore_errors=True)
    tmp = ind + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    t = pq.read_table(src, columns=columns)
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n = t.num_rows
    for i in range(n_chunks):
        lo, hi = i * n // n_chunks, (i + 1) * n // n_chunks
        pq.write_table(t.slice(lo, hi - lo), f"{tmp}/chunk-{i:04d}.parquet")
    os.replace(tmp, ind)
    return ind


def q_streaming_tumbling_agg(sf_dir: str):
    import os
    import shutil

    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(sf_dir, "events_in", ["event_type", "ts", "value"])
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["event_type"],
        aggs=[AggSpec(None, "count", "n_events"), AggSpec("value", "sum", "sum_value_cents")],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,  # arrival chunks are ts-sorted
        num_partitions=4,
        # fixed-point per row BEFORE the partials: epoch-boundary-invariant
        # integer sums (see _value_to_cents)
        transform=lambda ds: ds.map_batches(
            _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
        ),
    )
    job.run()
    return job.committed_output()


SQL_STREAMING_TUMBLING = SQL_TUMBLING  # identical final answer by design


def q_streaming_sliding_count(sf_dir: str):
    """Streaming SLIDING windows through the gate (the last cell of the
    windows x {batch, streaming} matrix with only pytest coverage):
    events arrive as 4 ts-sorted chunks; per-epoch partials land on the
    SLIDE pane and each pane partial expands statelessly to its
    k = size/slide containing windows (no event replication); the
    committed exactly-once output must equal the batch/SQL sliding
    count."""
    import os
    import shutil

    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(sf_dir, "sliding/in", ["event_type", "ts"])
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["event_type"],
        aggs=[AggSpec(None, "count", "n_events")],
        ts_col="ts",
        size_s=7200,
        slide_s=3600,
        allowed_lateness_s=0,  # arrival chunks are ts-sorted
        num_partitions=4,
    )
    job.run()
    return job.committed_output()


SQL_STREAMING_SLIDING = SQL_SLIDING  # identical final answer by design


def _transcript_chunks(sf_dir: str) -> str:
    """Shared streaming fixture: the derived transcript table as
    ``GATE_STREAM_CHUNKS`` ts-sorted arrival chunks under /tmp (built
    once per scale; prep runs INSIDE a Ray task — the driver holds only
    the row-count ack). Cache re-built when the chunk count changes."""
    import os
    import shutil

    k = GATE_STREAM_CHUNKS
    base = f"/tmp/vaero_ray_gate/{os.path.basename(os.path.normpath(sf_dir))}/stitch"
    ind = f"{base}/in"
    if os.path.isdir(ind):
        n_files = len([f for f in os.listdir(ind) if f.endswith(".parquet")])
        if n_files != k:
            shutil.rmtree(ind, ignore_errors=True)
    if not os.path.isdir(ind):
        tmp = ind + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        import ray

        @ray.remote
        def prep_chunks(*tabs: pa.Table) -> int:
            t = pa.concat_tables(tabs, promote_options="permissive").combine_chunks()
            t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
            n = t.num_rows
            for i in range(k):
                lo, hi = i * n // k, (i + 1) * n // k
                pq.write_table(t.slice(lo, hi - lo), f"{tmp}/chunk-{i:04d}.parquet")
            return n

        ray.get(prep_chunks.remote(*derive_transcripts(sf_dir).to_arrow_refs()))
        os.replace(tmp, ind)
    return ind


def q_streaming_stitch(sf_dir: str):
    """Streaming stateful turn-stitch join driven through the gate: the
    derived transcript table arrives as 4 ts-sorted chunks; conversations
    close when the watermark passes last-ts + gap; the committed output
    must equal the batch/SQL whole-conversation stitch (gap > any
    intra-conversation silence, so one segment per conversation)."""
    import os
    import shutil

    from vaero_ray.streaming import StreamingStitchJob

    ind = _transcript_chunks(sf_dir)
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingStitchJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        gap_s=86400 * 2,  # > any intra-conversation gap -> whole-conv segments
        allowed_lateness_s=0,
        num_partitions=4,
    )
    job.run()
    return job.committed_output()


SQL_STREAMING_STITCH = SQL_STITCH  # whole-conversation stitch, same answer


def q_streaming_pattern_counts(sf_dir: str):
    """STREAMING regex CEP through the exactly-once machinery: the
    ``at+a`` (assistant -> tool(s) -> assistant) pattern counted per
    conversation as conversations CLOSE at the watermark — the
    buffer-until-watermark stitch job supplies whole per-key sequences,
    and the batch regex kernel (cep.regex_counts_df) plugs in as the
    closed-conversation emitter. No new streaming machinery; committed
    output must equal the batch/SQL whole-conversation count."""
    import os
    import shutil

    from vaero_ray.stages.cep import regex_counts_df
    from vaero_ray.streaming import StreamingStitchJob

    ind = _transcript_chunks(sf_dir)
    base = f"{os.path.dirname(ind)}/regexcep"
    out_d, ckpt_d = f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)

    def emit(closed: "pd.DataFrame") -> "pd.DataFrame":
        return regex_counts_df(
            closed,
            "conv_id",
            ["turn_idx"],
            "role",
            {"user": "u", "assistant": "a", "tool": "t"},
            r"at+a",
        )

    job = StreamingStitchJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        gap_s=86400 * 2,  # > any intra-conversation gap -> whole convs
        allowed_lateness_s=0,
        num_partitions=4,
        emitter=emit,
    )
    job.run()
    return job.committed_output()



def q_streaming_session_stats(sf_dir: str):
    """Streaming SESSION windows through the gate, completing the
    windows x {batch, streaming} matrix: events arrive as 4 ts-sorted
    chunks; per-key gap sessions are held as MERGEABLE FRAGMENT PARTIALS
    (never raw events) and close when the watermark passes end+gap; the
    committed exactly-once output must equal the batch/SQL gap-session
    aggregate. sum(value) emitted as exact integer cents both sides."""
    import os
    import shutil

    from vaero_ray.streaming import StreamingSessionJob

    ind = _stream_chunks(sf_dir, "session/in", ["user_id", "ts", "value"])
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingSessionJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        key="user_id",
        aggs=[
            AggSpec(None, "count", "n_events"),
            AggSpec("ts", "min", "start_ts"),
            AggSpec("ts", "max", "end_ts"),
            AggSpec("value", "sum", "sum_value_cents"),
        ],
        ts_col="ts",
        gap_s=1800,
        allowed_lateness_s=0,  # arrival chunks are ts-sorted
        num_partitions=4,
        # fixed-point per row BEFORE the fragment partials (see
        # _value_to_cents): integer sums, invariant to epoch boundaries
        transform=lambda ds: ds.map_batches(
            _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
        ),
    )
    job.run()
    return job.committed_output()


SQL_STREAMING_SESSION = """
WITH sess_d AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
), sess_s AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM sess_d
)
SELECT user_id, COUNT(*) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM sess_s GROUP BY user_id, session_id
"""


def q_streaming_dedup_events(sf_dir: str):
    """Streaming exactly-once ingestion dedup (``dropDuplicates`` over an
    at-least-once source): the arrival stream replays every 8th event —
    some into the NEXT epoch while the event's window is still open, the
    rest as a final all-replay epoch long after their windows closed.
    Replays are IDENTICAL rows (a redelivery carries the original event
    time), so keying the exactly-once windowed path by ``event_id`` with
    the payload riding mergeable ``min()`` aggregates makes dedup free:
    an in-horizon replay merges idempotently into the open-window partial
    (min(x,x)=x), and a post-close replay is dropped by the late-data
    policy — its row already shipped. Either way the committed output
    carries exactly ONE bit-identical row per event, whatever the replay
    timing, and the oracle is simply the original (duplicate-free) events
    table. State bound = events inside the watermark horizon, the
    standard streaming-dedup contract."""
    import os
    import shutil

    from vaero_ray.streaming import StreamingWindowedJob

    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    src = f"{sf_dir}/events.parquet"
    n_src = pq.ParquetFile(src).metadata.num_rows
    base = f"/tmp/vaero_ray_gate/{os.path.basename(os.path.normpath(sf_dir))}/dedup_stream"
    ind = f"{base}/in"
    marker = os.path.join(ind, ".n_src")
    try:
        cached_ok = int(open(marker).read()) == n_src
    except Exception:
        cached_ok = False
    if os.path.isdir(ind) and not cached_ok:
        shutil.rmtree(ind, ignore_errors=True)
    if not os.path.isdir(ind):
        tmp = ind + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        import ray

        @ray.remote
        def prep(src: str) -> int:
            # 3 epochs (each epoch pays a full commit barrier — keep the
            # fixture minimal while covering both dedup paths): epoch 1
            # redelivers epoch 0's multiples (merge path), epoch 2
            # redelivers EVERY multiple (late path for epoch 0's closed
            # windows, merge path for epoch 1's still-open last hour)
            t = pq.read_table(src, columns=cols)
            t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
            n = t.num_rows
            chunks = [t.slice(i * n // 2, (i + 1) * n // 2 - i * n // 2) for i in range(2)]
            replays = [
                c.filter(pc.equal(pc.bit_wise_and(c.column("event_id"), 7), 0))
                for c in chunks
            ]
            total = 0
            for i, out in enumerate(
                [chunks[0], pa.concat_tables([chunks[1], replays[0]]), pa.concat_tables(replays)]
            ):
                out = out.combine_chunks()
                total += out.num_rows
                pq.write_table(out, f"{tmp}/chunk-{i:04d}.parquet")
            return total

        ray.get(prep.remote(src))
        with open(os.path.join(tmp, ".n_src"), "w") as f:
            f.write(str(n_src))
        os.replace(tmp, ind)
    out_d, ckpt_d = f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["event_id"],
        aggs=[
            AggSpec("user_id", "min", "user_id"),
            AggSpec("event_type", "min", "event_type"),
            AggSpec("value", "min", "value_cents"),
        ],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,
        num_partitions=4,
        # 5 partial columns keyed by event id: the native per-column
        # Ray aggregate would pay its fixed cost 5x per epoch
        merge_backend="bucketed",
        transform=lambda ds: ds.map_batches(
            _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
        ),
    )
    job.run()
    return job.committed_output()


SQL_STREAMING_DEDUP = """
SELECT event_id, date_trunc('hour', ts) AS window_start,
       user_id, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
FROM events
"""


def q_streaming_interval_join(sf_dir: str):
    """Stream-STREAM windowed equi-join through the exactly-once epoch
    driver (the canonical hard streaming operator — neither side is a
    static table): the view stream joins the purchase stream per user
    within 30 minutes, both arriving as 3 ts-sorted chunks. Pairs span
    epochs (a purchase matches views from earlier epochs held in the
    watermark-bounded buffer); per-side watermarks gate eviction via
    their MIN, so a lagging side never loses the fast side's matches.
    The committed output must equal the batch interval join."""
    import os
    import shutil

    from vaero_ray.streaming.join_job import StreamingJoinJob

    src = f"{sf_dir}/events.parquet"
    n_src = pq.ParquetFile(src).metadata.num_rows
    base = f"/tmp/vaero_ray_gate/{os.path.basename(os.path.normpath(sf_dir))}/ssjoin"
    marker = os.path.join(base, "in", ".n_src")
    try:
        cached_ok = int(open(marker).read()) == n_src
    except Exception:
        cached_ok = False
    ind = os.path.join(base, "in")
    if os.path.isdir(ind) and not cached_ok:
        shutil.rmtree(ind, ignore_errors=True)
    if not os.path.isdir(ind):
        tmp = ind + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(f"{tmp}/L")
        os.makedirs(f"{tmp}/R")
        import ray

        @ray.remote
        def prep(src: str) -> int:
            t = pq.read_table(src, columns=["event_id", "user_id", "event_type", "ts"])
            t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
            total = 0
            for sub, idcol, et in (("L", "view_id", "view"), ("R", "purchase_id", "purchase")):
                s = t.filter(pc.equal(t.column("event_type"), et))
                s = s.select(["user_id", "ts", "event_id"]).rename_columns(
                    ["user_id", "ts", idcol]
                )
                n = s.num_rows
                for i in range(3):
                    c = s.slice(i * n // 3, (i + 1) * n // 3 - i * n // 3)
                    total += c.num_rows
                    pq.write_table(c.combine_chunks(), f"{tmp}/{sub}/chunk-{i:04d}.parquet")
            return total

        ray.get(prep.remote(src))
        with open(os.path.join(tmp, ".n_src"), "w") as f:
            f.write(str(n_src))
        os.replace(tmp, ind)
    out_d, ckpt_d = f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingJoinJob(
        left_dir=f"{ind}/L",
        right_dir=f"{ind}/R",
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        key="user_id",
        within_s=1800,
        left_cols=["view_id"],
        right_cols=["purchase_id"],
        allowed_lateness_s=1,  # boundary-equal ts across sorted chunks
        num_partitions=4,
    )
    job.run()
    return job.committed_output().rename_columns({"ts_l": "view_ts", "ts_r": "purchase_ts"})


SQL_STREAMING_JOIN = """
SELECT v.user_id, v.ts AS view_ts, p.ts AS purchase_ts,
       v.event_id AS view_id, p.event_id AS purchase_id
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
"""


def q_streaming_transform_route(sf_dir: str):
    """The reference's WHOLE execution loop — tap -> transform chain ->
    route (fan-out branches) -> prefix-bucketed sink — as the
    exactly-once StreamingTransformJob, under the SQL oracle (this loop
    previously had pytest-only parity): branch A keeps views, branch B
    keeps purchase/signup with `signup` masked to `join`; both routes
    are unioned for the compare. Where the reference loses in-flight
    buffers on crash (at-most-once), a crash here reruns the epoch
    byte-identically."""
    import os
    import shutil

    from vaero_ray.dsl import Vaero
    from vaero_ray.streaming.transform_job import StreamingTransformJob

    ind = _stream_chunks(
        sf_dir, "transform_route/in", ["event_id", "user_id", "event_type", "ts"]
    )
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    Vaero.reset()
    src = Vaero().source("parquet", path="unused")
    src.filter_regexp("event_type", "^view$").add("route", "A").sink(
        "s3", timestamp_key="ts", filename_prefix="%Y-%m"
    )
    src.filter_regexp("event_type", "^(purchase|signup)$").mask(
        "event_type", "^signup$", "join"
    ).add("route", "B").sink("s3", timestamp_key="ts", filename_prefix="%Y-%m")
    job = StreamingTransformJob(
        input_dir=ind, out_dir=out_d, ckpt_dir=ckpt_d, graph=Vaero.start()
    )
    job.run()
    cols = ["event_id", "user_id", "event_type", "ts", "route"]
    a = job.committed_output("b0_s3").select_columns(cols)
    b = job.committed_output("b1_s3").select_columns(cols)
    return a.union(b)


SQL_STREAMING_TRANSFORM = """
SELECT event_id, user_id, event_type, ts, 'A' AS route
FROM events WHERE regexp_matches(event_type, '^view$')
UNION ALL
SELECT event_id, user_id,
       regexp_replace(event_type, '^signup$', 'join', 'g') AS event_type,
       ts, 'B' AS route
FROM events WHERE regexp_matches(event_type, '^(purchase|signup)$')
"""


def q_streaming_interval_join_outer(sf_dir: str):
    """LEFT OUTER stream-stream join (Spark's outer stream-stream-join
    rule): a view with no purchase within 30 minutes emits ONCE with a
    null right side — at EVICTION time, when the watermark proves no
    future purchase can match it. The matched-ever flag rides the left
    state snapshot across epochs, so a view matched by a LATER epoch's
    purchase never appears in the outer set."""
    import os
    import shutil

    from vaero_ray.streaming.join_job import StreamingJoinJob

    q_streaming_interval_join(sf_dir)  # ensure the shared fixture exists
    base = f"/tmp/vaero_ray_gate/{os.path.basename(os.path.normpath(sf_dir))}/ssjoin"
    ind = os.path.join(base, "in")
    out_d, ckpt_d = f"{base}/outer_out", f"{base}/outer_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingJoinJob(
        left_dir=f"{ind}/L",
        right_dir=f"{ind}/R",
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        key="user_id",
        within_s=1800,
        left_cols=["view_id"],
        right_cols=["purchase_id"],
        allowed_lateness_s=1,
        num_partitions=4,
        join_type="left_outer",
        left_id_col="view_id",
    )
    job.run()
    return job.committed_output().rename_columns({"ts_l": "view_ts", "ts_r": "purchase_ts"})


SQL_STREAMING_JOIN_OUTER = """
SELECT v.user_id, v.ts AS view_ts, p.ts AS purchase_ts,
       v.event_id AS view_id, p.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'view') v
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""


def q_top10_orders(sf_dir: str):
    """Global top-k: Ray Data sort (range-partitioned shuffle) + limit.
    Ties broken by o_orderkey so the answer is deterministic."""
    ds = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    # descending price; ties broken by NEGATED orderkey so a single
    # two-column descending sort gives (price desc, orderkey asc)
    ds = ds.map_batches(
        lambda t: t.append_column("__nk", pc.negate(pc.cast(t.column("o_orderkey"), pa.int64()))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = ds.sort(["o_totalprice", "__nk"], descending=True).limit(10)
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "price_cents": pc.cast(pc.round(pc.multiply(t.column("o_totalprice"), 100)), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_TOP10_ORDERS = """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_customer_nation_broadcast(sf_dir: str):
    """Broadcast join: nation (25 rows) ray.put once, Arrow-native join
    per batch — no shuffle."""
    from vaero_ray.stages.joins import broadcast_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation = nation.rename_columns(["c_nationkey", "nation_name"])
    cust = _read_pq(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    return broadcast_join(cust, nation, keys="c_nationkey")


SQL_CUSTOMER_NATION = """
SELECT c_custkey, c_name, c_nationkey, n_name AS nation_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def q_orders_customer_hash_join(sf_dir: str):
    """Partitioned hash join: both sides bucketed by hash(custkey), one
    shuffle, vectorized merge per bucket."""
    from vaero_ray.stages.joins import hash_join

    orders = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderstatus"]
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey", "o_orderstatus"]),
        batch_format="pyarrow",
    )
    cust = _read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    return hash_join(orders, cust, keys="c_custkey")


SQL_ORDERS_CUSTOMER = """
SELECT o_orderkey, o_custkey AS c_custkey, o_orderstatus, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_purchase_asof_view(sf_dir: str):
    """Backward as-of join: each purchase matched with the user's latest
    view at-or-before it (DuckDB ASOF LEFT JOIN semantics)."""
    from vaero_ray.stages.joins import asof_join

    ev = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    views = ev.filter(expr="event_type == 'view'").drop_columns(["event_type", "event_id"])
    out = asof_join(purchases, views, key="user_id", ts_col="ts", right_ts_out="viewed_ts")
    return out.select_columns(["event_id", "user_id", "ts", "viewed_ts"])


SQL_PURCHASE_ASOF = """
SELECT p.event_id, p.user_id, p.ts, v.ts AS viewed_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def q_distinct_users_per_type(sf_dir: str):
    """Salted exact distinct count (north_rule skew pattern): values
    hash-salted so no task ever sees a whole hot key."""
    from vaero_ray.stages.windows import salted_distinct_count

    ds = _events(sf_dir, columns=["event_type", "user_id"])
    return salted_distinct_count(ds, key="event_type", value_col="user_id", alias="n_distinct_users")


SQL_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY 1
"""


# TPC-H-ish sanity aggregate: proves the generic two-phase agg path
def q_lineitem_pricing(sf_dir: str):
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def pre(t: pa.Table) -> pa.Table:
        # fixed-point PER ROW before the aggregate (engine-wide exact-sum
        # convention): quantities are integral doubles -> units, prices
        # have 2 decimals -> cents; partial sums are then int64 and
        # invariant to addition order across shards
        t = t.set_column(
            t.column_names.index("l_quantity"),
            "l_quantity",
            pc.cast(pc.floor(pc.add(t.column("l_quantity"), 0.5)), pa.int64()),
        )
        return t.set_column(
            t.column_names.index("l_extendedprice"),
            "l_extendedprice",
            pc.cast(
                pc.floor(pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)),
                pa.int64(),
            ),
        )

    return windowed_aggregate(
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_returnflag", "l_linestatus"],
        aggs=[
            AggSpec("l_quantity", "sum", "sum_qty"),
            AggSpec("l_extendedprice", "sum", "sum_base_cents"),
            AggSpec(None, "count", "count_order"),
        ],
        size_s=None,
    )


SQL_LINEITEM = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       COUNT(*) AS count_order
FROM lineitem GROUP BY 1, 2
"""


def q_embedding_cosine_dups(sf_dir: str):
    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_cosine_dups(ds, threshold=0.45)


SQL_EMBEDDING_DUPS = """
SELECT a.vec_id AS vec_id, b.vec_id AS dup_of,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
"""


# ------------------------------------------------------------------
# Hash-family / model / multimodal ops — each with a first-principles
# DuckDB oracle (round 1 left these rows-only; every construction here
# is SQL-reproducible by design: polynomial char hashes, explicit band
# semantics, closed-form fake codecs, integer outputs)
# ------------------------------------------------------------------

# fingerprint / seed expression shared by several oracles: polynomial
# char-code fold, base 31 mod 1099511627689 (= textstats.FP_BASE/FP_MOD)
_FP_SQL = (
    "CASE WHEN length({n}) = 0 THEN 0 ELSE "
    "list_reduce([CAST(unicode(substr({n}, CAST(i AS INT), 1)) AS BIGINT) "
    "FOR i IN range(1, length({n})+1)], (a,c) -> (a*31+c) % 1099511627689) END"
)


def q_doc_quality_fingerprint(sf_dir: str):
    from vaero_ray.stages.textstats import fingerprint, quality_stats

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(quality_stats, batch_format="pyarrow", zero_copy_batch=True)
    out = out.map_batches(fingerprint, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["doc_id", "n_chars", "n_punct", "n_digit", "fingerprint"])


SQL_QUALITY_FP = rf"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct,
  CAST(len(regexp_extract_all(text, '\d')) AS BIGINT) AS n_digit,
  {_FP_SQL.format(n="norm")} AS fingerprint
FROM (SELECT doc_id, text, lower(regexp_replace(text, '\s+', ' ', 'g')) AS norm FROM documents)
"""


def q_embedding_lsh_dups(sf_dir: str):
    # axes mode: 8 tables x 2 coordinate hyperplanes (dims 0..15) — the
    # sign bits are embedding[d] > 0, and the SQL oracle reproduces the
    # band condition VERBATIM, so both sides compute the identical
    # candidate-intersect-threshold set (recall vs the exact operator is
    # a property of the banding, measured in tests). The random-Gaussian
    # mode is property-tested (LSH subset-of exact).
    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_lsh_dups(ds, threshold=0.45, n_planes=2, n_tables=8, planes_mode="axes")


def _axes_band_sql(t: int, n_planes: int = 2) -> str:
    return "(" + " AND ".join(
        f"(a.embedding[{t * n_planes + p + 1}] > 0) = (b.embedding[{t * n_planes + p + 1}] > 0)"
        for p in range(n_planes)
    ) + ")"


SQL_EMBEDDING_LSH = f"""
SELECT a.vec_id AS vec_id, b.vec_id AS dup_of,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
  AND ({" OR ".join(_axes_band_sql(t) for t in range(8))})
"""


def q_ngram_jaccard_dups(sf_dir: str):
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_dups(ds, threshold=0.5)


SQL_NGRAM_JACCARD = """
WITH s AS (
  SELECT doc_id, list_distinct(CASE WHEN length(text) < 5 THEN [rpad(text, 5, ' ')]
         ELSE [substr(text, CAST(i AS INT), 5) FOR i IN range(1, length(text)-3)] END) AS sh
  FROM documents
),
c AS (SELECT doc_id, sh, len(sh) AS n FROM s),
e AS (SELECT doc_id, UNNEST(sh) AS g FROM c),
p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS inter
      FROM e a JOIN e b ON a.g = b.g AND a.doc_id > b.doc_id GROUP BY 1, 2)
SELECT p.ida AS doc_id, p.idb AS dup_of,
       CAST(p.inter AS BIGINT) AS n_common,
       CAST(ca.n + cb.n - p.inter AS BIGINT) AS n_union
FROM p JOIN c ca ON ca.doc_id = p.ida JOIN c cb ON cb.doc_id = p.idb
WHERE 2 * p.inter >= ca.n + cb.n - p.inter
"""


def q_minhash_dup_edges(sf_dir: str):
    # MinHash-LSH candidate generation over WORD 3-gram (w-shingling)
    # sets, verified with true Jaccard — emitted as exact integer
    # (n_common, n_union). The estimate-only variant
    # (minhash_lsh_dup_edges, est_jaccard from signature agreement) is
    # property-tested in tests/ (estimates aren't SQL-reproducible).
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_dups(ds, shingle_k=3, threshold=0.5, unit="word")


SQL_MINHASH_WORD = r"""
WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
s AS (SELECT doc_id,
             list_distinct([array_to_string(toks[CAST(i AS INT):CAST(i+2 AS INT)], ' ')
                            FOR i IN range(1, len(toks)-1)]) AS sh
      FROM t WHERE len(toks) >= 3),
c AS (SELECT doc_id, sh, len(sh) AS n FROM s),
e AS (SELECT doc_id, UNNEST(sh) AS g FROM c),
p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS inter
      FROM e a JOIN e b ON a.g = b.g AND a.doc_id > b.doc_id GROUP BY 1, 2)
SELECT p.ida AS doc_id, p.idb AS dup_of,
       CAST(p.inter AS BIGINT) AS n_common,
       CAST(ca.n + cb.n - p.inter AS BIGINT) AS n_union
FROM p JOIN c ca ON ca.doc_id = p.ida JOIN c cb ON cb.doc_id = p.idb
WHERE 2 * p.inter >= ca.n + cb.n - p.inter
"""


def q_dup_clusters(sf_dir: str):
    """Cluster-correct dedup: the word-3-gram true-Jaccard dup EDGES
    (same pipeline as ``minhash_dup_edges``) resolved to connected
    components — every member of a dup cluster labeled with the cluster's
    min doc_id, chains included (the single-round min-label gap the
    round-2 verdict flagged). Oracle: recursive-CTE transitive closure
    over the identical pair query."""
    from vaero_ray.stages.graph import connected_components

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    edges = ngram_jaccard_dups(ds, shingle_k=3, threshold=0.5, unit="word")
    return connected_components(edges, a_col="doc_id", b_col="dup_of")


SQL_DUP_CLUSTERS = f"""
WITH RECURSIVE dup_pairs AS ({SQL_MINHASH_WORD}),
dup_edges AS (SELECT doc_id AS src, dup_of AS dst FROM dup_pairs
              UNION SELECT dup_of, doc_id FROM dup_pairs),
dup_nodes AS (SELECT DISTINCT src AS node FROM dup_edges),
reach(node, m) AS (
  SELECT node, node FROM dup_nodes
  UNION
  SELECT r.node, de.dst FROM reach r JOIN dup_edges de ON de.src = r.m
)
SELECT node AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster FROM reach GROUP BY 1
"""


def q_media_features(sf_dir: str):
    from vaero_ray.stages.multimodal import make_fake_media, media_features

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = ds.map_batches(make_fake_media, batch_format="pyarrow", zero_copy_batch=True)
    return media_features(media, batch_size=64)


SQL_MEDIA_FEATURES = rf"""
WITH f AS (SELECT doc_id, {_FP_SQL.format(n="text")} AS seed FROM documents),
d AS (SELECT doc_id, seed, 16 + seed % 48 AS w, 16 + (seed // 48) % 48 AS h FROM f),
px AS (SELECT doc_id, w, h, ((seed % 256) + i.i) % 256 AS v
       FROM d, UNNEST(range(0, w*h*3)) AS i(i))
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(3 AS INT) AS channels,
       CAST(SUM(v) AS BIGINT) AS pixel_sum, CAST(SUM(v*v) AS BIGINT) AS pixel_sumsq
FROM px GROUP BY 1, 2, 3
"""


def q_video_frame_sample(sf_dir: str):
    from vaero_ray.stages.multimodal import (
        frame_sample_batch,
        image_features_batch,
        make_fake_video,
    )

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    vids = ds.map_batches(make_fake_video, batch_format="pyarrow", zero_copy_batch=True)
    frames = vids.map_batches(frame_sample_batch, batch_size=32, batch_format="pyarrow")
    return frames.map_batches(image_features_batch, batch_size=32, batch_format="pyarrow")


SQL_VIDEO_FRAMES = rf"""
WITH f AS (SELECT doc_id, {_FP_SQL.format(n="text")} AS seed FROM documents),
d AS (SELECT doc_id, seed, 8 + seed % 24 AS nf,
             8 + (seed // 24) % 16 AS w, 8 + (seed // 384) % 16 AS h FROM f),
px AS (SELECT doc_id, w, h, fi.fi AS fi, ((seed % 256) + fi.fi*w*h + j.j) % 256 AS v
       FROM d, UNNEST(range(0, nf, 4)) AS fi(fi), UNNEST(range(0, w*h)) AS j(j))
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(1 AS INT) AS channels,
       CAST(SUM(v) AS BIGINT) AS pixel_sum, CAST(SUM(v*v) AS BIGINT) AS pixel_sumsq
FROM px GROUP BY doc_id, w, h, fi
"""


def q_simhash_dup_pairs(sf_dir: str):
    from vaero_ray.stages.dedup import simhash_dup_pairs

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_dup_pairs(ds, max_hamming=8)


def q_simhash_signatures(sf_dir: str):
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(simhash_signatures, batch_format="pyarrow", zero_copy_batch=True)


# 62-bit simhash recomputed from first principles: two polynomial char
# hashes (bases 31/37 mod Mersenne31) per token (<=16 chars), per-bit
# +-1 majority vote (see stages/dedup.py simhash_signatures)
_SIMHASH_CTE = r"""toks AS (
  SELECT d.doc_id, t.tok FROM (
    SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
    FROM documents) d, UNNEST(d.toks) AS t(tok)
),
th AS (
  SELECT doc_id,
    list_reduce([CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT)
                 FOR i IN range(1, 1+least(length(tok),16))], (a,c) -> (a*31+c) % 2147483647)
    + list_reduce([CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT)
                   FOR i IN range(1, 1+least(length(tok),16))], (a,c) -> (a*37+c) % 2147483647)
      * CAST(2147483648 AS BIGINT) AS h
  FROM toks
),
votes AS (
  SELECT doc_id, b.b AS bit, SUM(CASE WHEN (h >> CAST(b.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, UNNEST(range(0, 62)) AS b(b) GROUP BY 1, 2
),
sig0 AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY 1
),
sig AS (
  SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sig0 s ON d.doc_id = s.doc_id
)"""

SQL_SIMHASH_SIG = f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM sig"

SQL_SIMHASH_PAIRS = f"""
WITH {_SIMHASH_CTE}
SELECT a.doc_id AS doc_id, b.doc_id AS dup_of,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id > b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
  AND (  (a.simhash & 65535) = (b.simhash & 65535)
      OR ((a.simhash >> 16) & 65535) = ((b.simhash >> 16) & 65535)
      OR ((a.simhash >> 32) & 65535) = ((b.simhash >> 32) & 65535)
      OR ((a.simhash >> 48) & 16383) = ((b.simhash >> 48) & 16383))
"""


def q_lang_id(sf_dir: str):
    from vaero_ray.stages.textstats import lang_id_batch

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # task pool + per-worker stopword cache: an actor pool costs ~1 s
    # spawn per actor per execution, ~15x this corpus's scoring kernel
    return ds.map_batches(
        lang_id_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "pred_lang"])


SQL_LANG_ID = r"""
WITH toks AS (
  SELECT d.doc_id, t.tok FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-zà-ÿäöüß]+'), x -> x <> '')[1:200] AS toks
    FROM documents) d, UNNEST(d.toks) AS t(tok)
),
sw(lang, word, prio) AS (VALUES
  ('en','the',1),('en','and',1),('en','of',1),('en','to',1),('en','a',1),
  ('en','in',1),('en','is',1),('en','it',1),('en','you',1),('en','that',1),
  ('de','der',2),('de','die',2),('de','das',2),('de','und',2),('de','ist',2),
  ('de','nicht',2),('de','ein',2),('de','ich',2),('de','zu',2),('de','sie',2),
  ('fr','le',3),('fr','la',3),('fr','les',3),('fr','et',3),('fr','est',3),
  ('fr','un',3),('fr','une',3),('fr','je',3),('fr','de',3),('fr','que',3),
  ('es','el',4),('es','la',4),('es','los',4),('es','y',4),('es','es',4),
  ('es','un',4),('es','una',4),('es','yo',4),('es','de',4),('es','que',4)),
hits AS (
  SELECT t.doc_id, s.lang, s.prio, COUNT(*) AS h
  FROM toks t JOIN sw s ON t.tok = s.word GROUP BY 1, 2, 3
),
best AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, prio ASC) AS rn
  FROM hits
)
SELECT d.doc_id, COALESCE(b.lang, 'unknown') AS pred_lang
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
"""


def q_vocab_top_terms(sf_dir: str):
    from vaero_ray.stages.textstats import vocab_top_terms

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return vocab_top_terms(ds, k=50)


SQL_VOCAB = r"""
WITH t AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
u AS (SELECT UNNEST(toks) AS token FROM t)
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM u GROUP BY 1 ORDER BY cnt DESC, token LIMIT 50
"""


def q_pack_sequences(sf_dir: str):
    # GPT-style concat-then-chunk packing over global doc_id order: the
    # distributed ordered-prefix-sum pattern (block totals -> broadcast
    # exclusive offsets); only block METADATA ever reaches the driver
    from vaero_ray.stages.pack import pack_sequences

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_sequences(ds, target_len=512)


SQL_PACK = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
  FROM documents
),
o AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
  FROM t
)
SELECT doc_id, n AS n_tokens, tok_start,
       tok_start // 512 AS first_seq,
       (tok_start + n - 1) // 512 AS last_seq
FROM o WHERE n > 0
"""


def q_contamination_check(sf_dir: str):
    # benchmark-decontamination: even doc_id = train split, odd = test;
    # count each test doc's distinct 13-grams that appear in ANY train doc
    from vaero_ray.stages.dedup import contamination_check

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return contamination_check(ds, shingle_k=13)


SQL_CONTAMINATION = """
WITH s AS (
  SELECT doc_id,
         UNNEST(list_distinct(CASE WHEN length(text) < 13 THEN [rpad(text, 13, ' ')]
                ELSE [substr(text, CAST(i AS INT), 13) FOR i IN range(1, length(text)-11)] END)) AS g
  FROM documents
),
tr AS (SELECT DISTINCT g FROM s WHERE doc_id % 2 = 0),
te AS (SELECT doc_id, g FROM s WHERE doc_id % 2 = 1)
SELECT te.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
FROM te JOIN tr USING (g) GROUP BY 1
"""


def q_training_data_pipeline(sf_dir: str):
    """Capstone composition — the whole training-data story in ONE
    pipeline: exact dedup (keep min-id per text) -> quality filter
    (>=100 chars) -> language filter (pred_lang = 'en') -> GPT-style
    sequence packing over the survivors in doc_id order. Two keyed
    shuffles (dedup hash, pack sort) + stateless filters; the SQL oracle
    reproduces every stage."""
    from vaero_ray.stages.pack import pack_sequences
    from vaero_ray.stages.textstats import lang_id_batch, quality_stats

    def curate(d):
        # text-pure stages commute with dedup -> exact_dedup places them
        # on the payload side (pre-join in project mode: full read
        # parallelism, filtered rows never enter the exchange)
        d = d.map_batches(quality_stats, batch_format="pyarrow", zero_copy_batch=True)
        d = d.filter(expr="n_chars >= 100")
        d = d.map_batches(lang_id_batch, batch_format="pyarrow", zero_copy_batch=True)
        d = d.filter(expr="pred_lang == 'en'")
        return d.select_columns(["doc_id", "text"])

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = exact_dedup(ds, text_col="text", id_col="doc_id", payload_transform=curate)
    return pack_sequences(ds, target_len=512)


_LANG_CTE = SQL_LANG_ID.replace("FROM documents) d", "FROM survivors) d").replace(
    "FROM documents d LEFT JOIN best", "FROM survivors d LEFT JOIN best"
)

SQL_TRAINING_PIPELINE = rf"""
WITH dedup AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)
),
survivors AS (
  SELECT doc_id, text FROM dedup WHERE length(text) >= 100
),
lang AS ({_LANG_CTE}),
en AS (
  SELECT s.doc_id, s.text FROM survivors s JOIN lang l ON s.doc_id = l.doc_id
  WHERE l.pred_lang = 'en'
),
t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
  FROM en
),
o AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
  FROM t
)
SELECT doc_id, n AS n_tokens, tok_start,
       tok_start // 512 AS first_seq,
       (tok_start + n - 1) // 512 AS last_seq
FROM o WHERE n > 0
"""


def q_ann_topk_ivf(sf_dir: str):
    # nprobe/n_centroids chosen so the probe set covers the true top-k on
    # the gate fixtures (verified against brute force) — the SQL oracle
    # is the exact top-k; approximate regimes (lower nprobe) are
    # recall-tested in tests/test_multimodal_dedup2.py
    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cents = train_centroids(ds, n_centroids=8)
    return ivf_topk(ds, _query_vec(sf_dir), cents, k=10, nprobe=5)


# ------------------------------------------------------------------
# Mergeable sketches + deterministic split (training-data tier)
# ------------------------------------------------------------------

_HLL_P = 8  # 256 registers — plenty for a gate fixture, 2^p ints at scale


def q_hll_user_registers(sf_dir: str):
    """HyperLogLog registers of distinct ``user_id`` over events: the
    canonical mergeable-sketch shape (per-block partials, elementwise-max
    merge — at most 2^p ints leave any block regardless of input size).
    The REGISTERS are integer-exact and SQL-recomputable; the float
    estimate derived from them is tested in tests/test_round3.py."""
    from vaero_ray.stages.sketch import hll_registers

    return hll_registers(_events(sf_dir, columns=["user_id"]), "user_id", p=_HLL_P)


# DuckDB recomputes the strengthened Mersenne-61 hash with HUGEINT
# arithmetic: two linear rounds (A*v + B) mod (2^61-1) separated by an
# xorshift v ^= v >> 29 (see sketch.hll_hash for why the xorshift is
# needed); bucket = top p bits, rho = 1 + trailing zeros of the rest.
# NB: parenthesize (w & -w) — SQL '&' binds looser than '-'.
SQL_HLL_REGISTERS = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
h1 AS (
  SELECT CAST(((A * ((CASE WHEN user_id < 0
                THEN CAST(user_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
                ELSE CAST(user_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM events, m),
hs AS (
  SELECT CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) AS hv
  FROM h1, m),
w AS (SELECT hv >> (61 - {p}) AS bucket,
             ((hv & ((1::BIGINT << (61 - {p})) - 1)) | (1::BIGINT << (61 - {p}))) AS wv
      FROM hs)
SELECT bucket, CAST(MAX(bit_count((wv & (-wv)) - 1) + 1) AS BIGINT) AS max_rho
FROM w GROUP BY bucket
"""


def q_hll_users_by_type(sf_dir: str):
    """Per-group HLL registers: approximate distinct users per event
    type — the sketch composed with a keyed aggregate (scale path of the
    exact `distinct_users_per_type` query)."""
    from vaero_ray.stages.sketch import hll_registers_by

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return hll_registers_by(ds, "user_id", "event_type", p=_HLL_P)


SQL_HLL_BY = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
h1 AS (
  SELECT event_type,
         CAST(((A * ((CASE WHEN user_id < 0
                THEN CAST(user_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
                ELSE CAST(user_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM events, m),
hs AS (
  SELECT event_type,
         CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) AS hv
  FROM h1, m),
w AS (SELECT event_type, hv >> (61 - {p}) AS bucket,
             ((hv & ((1::BIGINT << (61 - {p})) - 1)) | (1::BIGINT << (61 - {p}))) AS wv
      FROM hs)
SELECT event_type, bucket,
       CAST(MAX(bit_count((wv & (-wv)) - 1) + 1) AS BIGINT) AS max_rho
FROM w GROUP BY event_type, bucket
"""


def q_hash_split_docs(sf_dir: str):
    """Deterministic hash-based train/val split of documents — stable
    across runs, workers, and input re-sharding (a resumable 100-TB
    pipeline must never reshuffle its split)."""
    from vaero_ray.stages.sketch import hash_split

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return hash_split(ds, "doc_id", train_permille=900)


SQL_HASH_SPLIT = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
h1 AS (
  SELECT doc_id, lang,
    CAST(((A * ((CASE WHEN doc_id < 0
         THEN CAST(doc_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
         ELSE CAST(doc_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM documents, m)
SELECT doc_id, lang,
  CASE WHEN CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT)
            % 1000 < 900
       THEN 'train' ELSE 'val' END AS split
FROM h1, m
"""


def q_per_source_cap(sf_dir: str):
    """C4-style domain cap: keep the 10 lowest-doc_id documents per
    source. Per-block partial prune bounds the shuffle to cap rows per
    (block, key) no matter how hot a source is."""
    from vaero_ray.stages.corpus import cap_per_key

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return cap_per_key(ds, key="source", cap=10, order_col="doc_id", num_buckets=8)


SQL_PER_SOURCE_CAP = r"""
SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10
"""


def q_doc_token_diversity(sf_dir: str):
    """Per-doc lexical diversity as exact integers (token count +
    Simpson concentration numerator sum(c^2)) — the integer-safe
    entropy alternative for boilerplate flagging."""
    from vaero_ray.stages.textstats import token_diversity

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        token_diversity, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_TOKEN_DIVERSITY = r"""
WITH dv_t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
                                         x -> x <> '') AS toks FROM documents),
dv_u AS (SELECT doc_id, UNNEST(toks) AS token FROM dv_t),
dv_c AS (SELECT doc_id, token, COUNT(*) AS c FROM dv_u GROUP BY 1, 2),
dv_a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                CAST(SUM(c * c) AS BIGINT) AS simpson_num
         FROM dv_c GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.simpson_num, 0) AS BIGINT) AS simpson_num
FROM documents d LEFT JOIN dv_a a USING (doc_id)
"""


def q_chunk_docs(sf_dir: str):
    """Context-window chunker: 32-token chunks advancing 24 tokens
    (8-token overlap), case preserved, whitespace normalized — the
    stage that feeds tokenize-and-pack in a training-data pipeline."""
    from vaero_ray.stages.textstats import chunk_documents

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: chunk_documents(t, chunk_tokens=32, stride=24),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_CHUNK_DOCS = r"""
WITH ck_t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                         x -> x <> '') AS toks FROM documents),
ck_s AS (SELECT doc_id, toks, len(toks) AS n FROM ck_t WHERE len(toks) > 0),
ck_c AS (SELECT doc_id, UNNEST(range(0, n, 24)) AS start, toks, n FROM ck_s)
SELECT doc_id,
       CAST(start // 24 AS BIGINT) AS chunk_idx,
       CAST(least(start + 32, n) - start AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[start + 1 : least(start + 32, n)], ' ') AS chunk_text
FROM ck_c
"""


def q_doc_repetition_stats(sf_dir: str):
    """Gopher-style repetition counts (token/bigram total, distinct,
    top frequency) — integer-exact boilerplate/spam signals."""
    from vaero_ray.stages.textstats import repetition_stats

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: repetition_stats(t).drop_columns("text"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_REPETITION = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
ts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_tokens,
               CAST(max(c) AS BIGINT) AS top_token_n FROM tc GROUP BY 1),
bg0 AS (SELECT doc_id,
               [toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))] AS bgs
        FROM tk),
bg AS (SELECT doc_id, unnest(bgs) AS b FROM bg0),
bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
bs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
               CAST(max(c) AS BIGINT) AS top_bigram_n FROM bc GROUP BY 1)
SELECT tk.doc_id,
       CAST(len(tk.toks) AS BIGINT) AS n_tokens,
       COALESCE(ts.n_distinct_tokens, 0) AS n_distinct_tokens,
       COALESCE(ts.top_token_n, 0) AS top_token_n,
       CAST(greatest(len(tk.toks) - 1, 0) AS BIGINT) AS n_bigrams,
       COALESCE(bs.n_distinct_bigrams, 0) AS n_distinct_bigrams,
       COALESCE(bs.top_bigram_n, 0) AS top_bigram_n
FROM tk LEFT JOIN ts ON tk.doc_id = ts.doc_id
        LEFT JOIN bs ON tk.doc_id = bs.doc_id
"""


def q_customers_no_big_orders(sf_dir: str):
    """Anti join (existence filter): customers with NO order above 300k.
    The right side shrinks to distinct keys before the shuffle — the
    decontamination pattern as a first-class relational operator."""
    from vaero_ray.stages.joins import semi_join

    cust = _read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def big_cust(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater(t.column("o_totalprice"), 300000.0))
        return keep.select(["o_custkey"]).rename_columns(["c_custkey"])

    big = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]).map_batches(
        big_cust, batch_format="pyarrow", zero_copy_batch=True
    )
    # bloom_prefilter="auto": at volume, definite-absence customers are
    # emitted locally (absence IS the anti-join keep condition) and only
    # may-contain rows ride the shuffle; below the metadata threshold the
    # register build's fixed ~2 s premium is skipped — identical output
    # either way (tested against the forced-on path in test_round3)
    return semi_join(cust, big, "c_custkey", anti=True, num_buckets=8, bloom_prefilter="auto")


SQL_ANTI_JOIN = r"""
SELECT c_custkey, c_nationkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


def q_length_histogram_by_source(sf_dir: str):
    """Per-source log-histogram of document length (quantile sketch
    composed with a keyed aggregate — per-domain length percentiles are
    the per-stratum filter-threshold tool)."""
    from ray.data.aggregate import Sum

    from vaero_ray.stages.sketch import lhq_bins

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])

    def partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "bin": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if not tbl.num_rows:
            return empty
        bins = lhq_bins(tbl.column("n_chars").to_numpy(zero_copy_only=False))
        enc = tbl.column("source").combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        key = codes << np.int64(20) | bins  # lhq bins < 2^20 by construction
        uk, uc = np.unique(key, return_counts=True)
        return pa.table(
            {
                "source": enc.dictionary.take(pa.array(uk >> np.int64(20), pa.int64())),
                "bin": pa.array(uk & ((1 << 20) - 1), pa.int64()),
                "cnt": pa.array(uc.astype(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby(["source", "bin"]).aggregate(Sum("cnt", alias_name="cnt"))
    return merged


SQL_LHQ_BY = r"""
WITH b AS (
  SELECT source, n_chars AS v,
         CASE WHEN n_chars = 0 THEN 0 ELSE length(bin(n_chars)) END AS bl
  FROM documents)
SELECT source,
       CAST(CASE WHEN v < 8 THEN v
            ELSE (bl << 3) | ((v >> greatest(bl - 4, 0)) & 7) END AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1, 2
"""


def q_rolling_user_counts(sf_dir: str):
    """Per-event rolling 1-hour event count per user (burst / rate
    detection): the per-event form of a sliding aggregate, one bucketed
    shuffle + offset-searchsorted inside each bucket."""
    from vaero_ray.stages.cep import rolling_counts

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts"])
    out = rolling_counts(ds, "user_id", "ts", window_s=3600, num_buckets=16)
    return out.select_columns(["event_id", "user_id", "rolling_count"])


SQL_ROLLING = r"""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 3600 SECONDS PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rolling_count
FROM events
"""


def q_funnel_view_purchase(sf_dir: str):
    """A-then-B-within-T CEP funnel: per user, purchases overall and
    purchases preceded by a view within 1 hour."""
    from vaero_ray.stages.cep import funnel_conversions

    ds = _events(sf_dir, columns=["user_id", "ts", "event_type"])
    return funnel_conversions(
        ds, "user_id", "ts", "event_type", first="view", then="purchase",
        within_s=3600, num_buckets=16,
    )


SQL_FUNNEL = r"""
WITH t AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
conv AS (
  SELECT t.user_id,
         EXISTS (SELECT 1 FROM events f
                 WHERE f.user_id = t.user_id AND f.event_type = 'view'
                   AND f.ts >= t.ts - INTERVAL 3600 SECONDS AND f.ts <= t.ts) AS c
  FROM t)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_then,
       CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n_conv
FROM conv GROUP BY user_id
"""


def q_seq_view_click_purchase(sf_dir: str):
    """3-step CEP sequence (view -> click -> purchase, each hop within
    15 min): per user, purchases overall and purchases completing the
    chain. The k-step NFA-frontier generalization of the funnel —
    len(steps)-1 searchsorted passes per bucket, no per-key loop."""
    from vaero_ray.stages.cep import sequence_matches

    ds = _events(sf_dir, columns=["user_id", "ts", "event_type"])
    return sequence_matches(
        ds, "user_id", "ts", "event_type",
        steps=["view", "click", "purchase"], within_s=900, num_buckets=16,
    )


# the EXISTS chain mirrors the frontier propagation: a click qualifies
# iff a view lies in ITS window; a purchase matches iff a QUALIFYING
# click lies in its window
SQL_SEQUENCE = r"""
WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT p.user_id,
         EXISTS (
           SELECT 1 FROM events b
           WHERE b.user_id = p.user_id AND b.event_type = 'click'
             AND b.ts >= p.ts - INTERVAL 900 SECONDS AND b.ts <= p.ts
             AND EXISTS (
               SELECT 1 FROM events a
               WHERE a.user_id = b.user_id AND a.event_type = 'view'
                 AND a.ts >= b.ts - INTERVAL 900 SECONDS AND a.ts <= b.ts)
         ) AS c
  FROM p)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_last,
       CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
FROM m GROUP BY user_id
"""


def q_views_in_purchase_window(sf_dir: str):
    """Keyed interval (range) join: every (view, purchase) pair of the
    same user with the view inside the purchase's trailing 1-hour
    window — a non-equi join Ray Data lacks, composed as one bucketed
    shuffle + a per-bucket vectorized interval-stab (joins.range_join)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from vaero_ray.stages.joins import range_join

    ev = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    views = ev.filter(expr="event_type == 'view'").drop_columns(["event_type"])

    def mk_intervals(tbl):
        hour = _pa.scalar(3600_000_000, type=_pa.duration("us"))
        return _pa.table(
            {
                "user_id": tbl.column("user_id"),
                "start": _pc.subtract(tbl.column("ts"), hour),
                "end": tbl.column("ts"),
                "purchase_id": tbl.column("event_id"),
            }
        )

    purchases = (
        ev.filter(expr="event_type == 'purchase'")
        .map_batches(mk_intervals, batch_format="pyarrow", zero_copy_batch=True)
    )
    out = range_join(
        views, purchases, key="user_id", left_ts="ts",
        right_start="start", right_end="end", num_buckets=16,
    )
    out = out.rename_columns({"event_id": "view_id", "ts": "view_ts", "end": "purchase_ts"})
    return out.select_columns(["user_id", "view_id", "view_ts", "purchase_id", "purchase_ts"])


SQL_RANGE_JOIN = r"""
SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
       p.event_id AS purchase_id, p.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND v.ts >= p.ts - INTERVAL 3600 SECONDS AND v.ts <= p.ts
"""


def q_top3_docs_per_source(sf_dir: str):
    """Exact grouped top-k without a global sort: per-block partial
    top-3 (bounded k*groups*blocks exchange) + one bucketed shuffle.
    Ties on n_chars break by doc_id ascending, making the output
    shard-invariant."""
    from vaero_ray.stages.ranking import top_k_per_group

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    return top_k_per_group(
        ds, group_col="source", order_col="n_chars", k=3, tie_col="doc_id",
        num_buckets=16,
    )


SQL_TOP_K_GROUP = r"""
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn <= 3
"""


def q_line_dedup_docs(sf_dir: str):
    """C4/RefinedWeb-style exact line dedup (dedup.line_dedup): each
    unit of >= min_chars chars survives only at its corpus-wide first
    occurrence (min (doc_id, idx)); docs reassemble in original order.
    The testdata documents are single-line word streams, so the gate
    runs at WORD granularity (sep=' ', min_chars=4) — same machinery,
    unit = token; the newline path is covered by the brute-force pytest
    (tests/test_round4.py::test_line_dedup_matches_bruteforce)."""
    from vaero_ray.stages.dedup import line_dedup

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return line_dedup(ds, sep=" ", min_chars=4, num_buckets=16)


SQL_LINE_DEDUP = r"""
WITH l AS (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS line,
         UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS line_idx,
         len(string_split(text, ' ')) AS n_lines
  FROM documents
),
kept AS (
  SELECT doc_id, line, line_idx, n_lines FROM (
    SELECT doc_id, line, line_idx, n_lines,
           ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn
    FROM l WHERE length(line) >= 4) WHERE rn = 1
  UNION ALL
  SELECT doc_id, line, line_idx, n_lines FROM l WHERE length(line) < 4
)
SELECT doc_id,
       string_agg(line, ' ' ORDER BY line_idx) AS text,
       CAST(any_value(n_lines) AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_kept
FROM kept GROUP BY doc_id
"""


def q_tfidf_top_terms(sf_dir: str):
    """Top-3 characteristic terms per document by integer tf-idf
    (textstats.tfidf_topk): tf * ((1000*N) // df) — floor-divided
    reciprocal df, integer-exact on both sides (no transcendental ln).
    Two bucketed shuffles (df by term, top-k by doc), no broadcast."""
    import pyarrow.parquet as _pq

    from vaero_ray.stages.textstats import tfidf_topk

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_topk(ds, k=3, n_docs=n_docs, num_buckets=16)


SQL_TFIDF = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS term
  FROM documents),
tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1),
s AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(t.tf * ((1000 * (SELECT count(*) FROM documents)) // d.df) AS BIGINT) AS score
  FROM tfc t JOIN dfc d USING (term))
SELECT doc_id, term, tf, df, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM s) WHERE rn <= 3
"""


def q_customer_big_order_stats(sf_dir: str):
    """LEFT OUTER hash join: every customer joined with its big-order
    (>400k) count and max price in integer cents; customers with no big
    orders keep the row with absent stats filled to 0 (fill_null after
    the join — integer-exact both sides, no float degradation through
    typed nulls). The build side is an aggregate over a runtime filter —
    exactly the shape ``auto_join`` sizes at runtime (broadcast here;
    partitioned at SFs where per-customer stats outgrow the threshold)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count, Max

    from vaero_ray.stages.joins import auto_join

    orders = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    big = orders.filter(expr="o_totalprice > 400000.0")

    def to_cents(tbl):
        cents = _pc.cast(
            _pc.floor(_pc.add(_pc.multiply(tbl.column("o_totalprice"), 100.0), 0.5)),
            _pa.int64(),
        )
        return _pa.table({"c_custkey": tbl.column("o_custkey"), "cents": cents})

    stats = (
        big.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_custkey")
        .aggregate(Count(on="cents", alias_name="n_big"), Max("cents", alias_name="max_cents"))
    )
    cust = _read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    joined = auto_join(cust, stats, keys="c_custkey", join_type="left outer")

    def fill(tbl):
        return _pa.table(
            {
                "c_custkey": tbl.column("c_custkey"),
                "c_name": tbl.column("c_name"),
                "n_big": _pc.fill_null(_pc.cast(tbl.column("n_big"), _pa.int64()), 0),
                "max_cents": _pc.fill_null(_pc.cast(tbl.column("max_cents"), _pa.int64()), 0),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


SQL_LEFT_JOIN = r"""
SELECT c.c_custkey, c.c_name,
       CAST(coalesce(b.n_big, 0) AS BIGINT) AS n_big,
       CAST(coalesce(b.max_cents, 0) AS BIGINT) AS max_cents
FROM customer c LEFT JOIN (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n_big,
         CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
  FROM orders WHERE o_totalprice > 400000.0 GROUP BY 1) b
ON c.c_custkey = b.o_custkey
"""


def q_docs_above_p90_length(sf_dir: str):
    """Sketch -> threshold -> filter composition (the canonical corpus
    length-filter flow): build the mergeable log-histogram registers,
    take the INTEGER p90 threshold (lower bound of the first bin whose
    cumulative count reaches ceil(0.9 n), integer ceil — no float rank
    interpolation, so both engines agree bit-exactly), then stream-filter
    the corpus against the broadcast threshold. Only the <=500-row
    register table ever reaches the driver."""
    import math  # noqa: F401

    from vaero_ray.stages.sketch import lhq_bounds, lhq_registers

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    regs = lhq_registers(ds, "n_chars").to_pandas().sort_values("bin")
    cum = regs["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    need = (9 * n + 9) // 10  # integer ceil(0.9 n)
    j = int(np.searchsorted(cum, need, side="left"))
    lo, _ = lhq_bounds(regs["bin"].to_numpy()[j : j + 1])
    thr = int(lo[0])
    return ds.filter(expr=f"n_chars >= {thr}")


SQL_P90_FILTER = r"""
WITH b AS (
  SELECT n_chars AS v,
         CASE WHEN n_chars = 0 THEN 0 ELSE length(bin(n_chars)) END AS bl
  FROM documents),
r AS (
  SELECT CAST(CASE WHEN v < 8 THEN v
              ELSE (bl << 3) | ((v >> greatest(bl - 4, 0)) & 7) END AS BIGINT) AS bin,
         count(*) AS cnt
  FROM b GROUP BY 1),
c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
             (SELECT sum(cnt) FROM r) AS n FROM r),
t AS (SELECT min(bin) AS tbin FROM c WHERE cum >= ((9 * n + 9) // 10)),
thr AS (SELECT CASE WHEN tbin < 8 THEN tbin
               ELSE (8 + (tbin & 7)) * (1 << greatest((tbin >> 3) - 4, 0))
               END AS v FROM t)
SELECT doc_id, n_chars FROM documents WHERE n_chars >= (SELECT v FROM thr)
"""


def q_event_type_pivot(sf_dir: str):
    """Pivot / wide conditional aggregate: per user, one count column
    per event type. Bounded exchange: a per-block factorize+bincount
    partial (<= keys x categories rows per block) merged by one bucketed
    keyed sum."""
    from vaero_ray.stages.pivot import pivot_counts

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return pivot_counts(
        ds, "user_id", "event_type", ["view", "click", "purchase"], num_buckets=16
    )


SQL_PIVOT = r"""
SELECT user_id,
  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase
FROM events WHERE event_type IN ('view', 'click', 'purchase')
GROUP BY user_id
"""


def q_doc_length_histogram(sf_dir: str):
    """Log-histogram registers of document length: the mergeable-by-SUM
    quantile sketch (<=6.25% relative bin width); length percentiles are
    the standard corpus-filter threshold tool. Integer bins both sides —
    SQL uses length(bin(v)), not float log2."""
    from vaero_ray.stages.sketch import lhq_registers

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return lhq_registers(ds, "n_chars")


SQL_LHQ = r"""
WITH b AS (
  SELECT n_chars AS v,
         CASE WHEN n_chars = 0 THEN 0 ELSE length(bin(n_chars)) END AS bl
  FROM documents)
SELECT CAST(CASE WHEN v < 8 THEN v
            ELSE (bl << 3) | ((v >> greatest(bl - 4, 0)) & 7) END AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1
"""


def q_doc_length_quantiles(sf_dir: str):
    """EXACT global length quantiles by bit-prefix radix selection — the
    exact counterpart of the `doc_length_histogram` sketch: binary-search
    the VALUE domain instead of sorting rows (a (min,max,n)-per-block
    metadata pass anchors the search, then ceil(bits(range)/16) histogram
    passes — 1 for this column; the only exchange is <=2^16-bin register
    rows; a sort-based quantile is an all-to-all of every row). All four
    quantiles ride the same passes
    (stages/selection.exact_quantiles_disc; DuckDB quantile_disc rank
    semantics, verified over 300 random arrays)."""
    from vaero_ray.stages.selection import exact_quantiles_disc

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    p25, p50, p90, p99 = exact_quantiles_disc(ds, "n_chars", [0.25, 0.5, 0.9, 0.99])
    return pa.table(
        {
            "p25_chars": pa.array([p25], pa.int64()),
            "p50_chars": pa.array([p50], pa.int64()),
            "p90_chars": pa.array([p90], pa.int64()),
            "p99_chars": pa.array([p99], pa.int64()),
        }
    )


SQL_LENGTH_QUANTILES = r"""
SELECT CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25_chars,
       CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS p50_chars,
       CAST(quantile_disc(n_chars, 0.90) AS BIGINT) AS p90_chars,
       CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99_chars
FROM documents
"""


def q_source_length_quantiles(sf_dir: str):
    """Per-SOURCE exact p50/p90/p99 of document length by GROUPED radix
    selection: every (source, quantile) pair rides the same 2-3
    column-pruned scans — NO row exchange at all, where the
    `median_length_per_source` shape moves every row through its
    bucketed shuffle (the win is few-groups x huge-rows;
    stages/selection.exact_group_quantiles_disc)."""
    from vaero_ray.stages.selection import exact_group_quantiles_disc

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    per = exact_group_quantiles_disc(ds, "n_chars", "source", [0.5, 0.9, 0.99])
    srcs = sorted(per)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "p50_chars": pa.array([per[s][0] for s in srcs], pa.int64()),
            "p90_chars": pa.array([per[s][1] for s in srcs], pa.int64()),
            "p99_chars": pa.array([per[s][2] for s in srcs], pa.int64()),
        }
    )


SQL_SOURCE_LENGTH_QUANTILES = r"""
SELECT source,
       CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS p50_chars,
       CAST(quantile_disc(n_chars, 0.90) AS BIGINT) AS p90_chars,
       CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99_chars
FROM documents GROUP BY source
"""


def q_table_diff_docs(sf_dir: str):
    """Corpus-copy reconciliation (stages/diff.table_diff): documents vs
    a deterministically perturbed replica (drops where doc_id%131==0,
    text mutations where %97==0, id remaps where %151==0 — the CDC-drift
    trifecta). Each side reduces in-scan to (doc_id, 128-bit content
    hash); the one key-bucketed exchange moves ~24 B/row, no payload
    byte leaves its scan task (oracle: FULL OUTER JOIN on values)."""
    import pyarrow.compute as pc

    from vaero_ray.stages.diff import table_diff

    left = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])

    def perturb(tbl: pa.Table) -> pa.Table:
        d = pc.cast(tbl.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        tbl = tbl.filter(pa.array(d % 131 != 0))
        d = d[d % 131 != 0]
        text = pc.if_else(
            pa.array(d % 97 == 0),
            pc.binary_join_element_wise(
                pc.cast(tbl.column("text"), pa.string()), "X", ""
            ),
            tbl.column("text"),
        )
        return pa.table(
            {
                "doc_id": pa.array(np.where(d % 151 == 0, d + 10_000_000, d), pa.int64()),
                "text": text,
                "source": tbl.column("source"),
            }
        )

    right = left.map_batches(perturb, batch_format="pyarrow", zero_copy_batch=True)
    return table_diff(
        left, right, keys="doc_id", compare_cols=["text", "source"], num_buckets=8
    )


def q_length_equidepth_bins(sf_dir: str):
    """Equi-depth (quartile) binning WITHOUT a sort: the exact q25/q50/
    q75 boundaries come from radix selection (2 metadata-light scans),
    then ONE scan assigns bins by searchsorted and a 4-group aggregate
    profiles each bin — the classic percentile-bucketize preprocessing,
    composed from exact_quantiles_disc as a building block."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min

    from vaero_ray.stages.selection import exact_quantiles_disc

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    bounds = np.array(
        exact_quantiles_disc(ds, "n_chars", [0.25, 0.5, 0.75]), dtype=np.int64
    )

    def assign(tbl: pa.Table) -> pa.Table:
        v = pc.cast(tbl.column("n_chars"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bin": pa.array(np.searchsorted(bounds, v, side="left"), pa.int64()),
                "n_chars": pa.array(v, pa.int64()),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(
            Count(alias_name="n_docs"),
            Min("n_chars", alias_name="lo_chars"),
            Max("n_chars", alias_name="hi_chars"),
        )
    )


SQL_EQUIDEPTH = r"""
WITH q AS (SELECT quantile_disc(n_chars, 0.25) AS b1,
                  quantile_disc(n_chars, 0.50) AS b2,
                  quantile_disc(n_chars, 0.75) AS b3 FROM documents)
SELECT CAST(CASE WHEN n_chars <= b1 THEN 0 WHEN n_chars <= b2 THEN 1
            WHEN n_chars <= b3 THEN 2 ELSE 3 END AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS lo_chars,
       CAST(max(n_chars) AS BIGINT) AS hi_chars
FROM documents, q GROUP BY 1
"""


SQL_TABLE_DIFF = r"""
WITH b AS (
  SELECT CASE WHEN doc_id % 151 = 0 THEN doc_id + 10000000 ELSE doc_id END AS doc_id,
         CASE WHEN doc_id % 97 = 0 THEN text || 'X' ELSE text END AS text,
         source
  FROM documents WHERE doc_id % 131 <> 0),
j AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN b.doc_id IS NULL THEN 'left_only'
              WHEN a.doc_id IS NULL THEN 'right_only'
              WHEN a.text <> b.text OR a.source <> b.source THEN 'changed'
              ELSE NULL END AS diff
  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
SELECT doc_id, diff FROM j WHERE diff IS NOT NULL
"""


def q_user_activity_intervals(sf_dir: str):
    """Per-user UNION of overlapping activity intervals (merged
    sessions with explicit durations): each event opens an extent of
    (event_id % 3600 + 60) seconds; overlapping-or-touching extents of
    a user collapse to one row (the coverage/uptime operator,
    stages/cep.merge_intervals — the SQL islands pattern in one
    key-bucketed shuffle + one cummax sweep, no per-key Python)."""
    from vaero_ray.stages.cep import merge_intervals

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])

    def derive(tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        end = ts + ((eid % 3600) + 60) * 1_000_000
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "start_us": pa.array(ts, pa.int64()),
                "end_us": pa.array(end, pa.int64()),
            }
        )

    iv = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    return merge_intervals(iv, "user_id", "start_us", "end_us")


SQL_ACTIVITY_INTERVALS = r"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + ((event_id % 3600) + 60) * 1000000 AS e
  FROM events),
o AS (SELECT user_id, s, e,
        MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM iv),
g AS (SELECT *, SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp
      FROM o)
SELECT user_id, MIN(s) AS start_us, MAX(e) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_merged
FROM g GROUP BY user_id, grp
"""


def q_weighted_sample_docs(sf_dir: str):
    """Deterministic WEIGHTED 200-sample without replacement: weight
    (doc_id % 7 + 1) tickets per doc, selection key = smallest ticket
    hash (stages/corpus.weighted_sample_k — replicated bottom-k /
    coordinated weighted sampling); membership is a pure function of the
    (id, weight) set, tickets never leave their block. The per-ROW
    importance knob of corpus mixing (sample_k/mixture handle uniform /
    per-stratum)."""
    from vaero_ray.stages.corpus import weighted_sample_k

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def derive(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return tbl.append_column("wt", pa.array((ids % 7) + 1, pa.int64()))

    withw = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    return weighted_sample_k(withw, "doc_id", "wt", 200, max_weight=8)


# DuckDB recomputes the SAME Mersenne-61 ticket hashes with HUGEINT
# arithmetic (constants from stages/sketch), replicating each doc's
# weight tickets via LATERAL generate_series — verified bitwise against
# the numpy kernel on 3000 random ids before the gate landed.
SQL_WEIGHTED_SAMPLE = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
w AS (SELECT doc_id, source, n_chars, doc_id % 7 + 1 AS wt FROM documents),
rep AS (SELECT doc_id, CAST(doc_id AS HUGEINT) * 8 + j.j AS rid
        FROM w, LATERAL (SELECT unnest(generate_series(0, doc_id % 7)) AS j) j),
h1 AS (SELECT doc_id, CAST(((A * (rid % M)) % M + B) % M AS BIGINT) AS v1
       FROM rep, m),
h2 AS (SELECT doc_id,
  CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) AS hv
  FROM h1, m),
mk AS (SELECT doc_id, MIN(hv) AS hkey FROM h2 GROUP BY doc_id),
r AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY hkey, doc_id) AS rn FROM mk)
SELECT w.doc_id, w.source, w.n_chars, CAST(w.wt AS BIGINT) AS wt
FROM r JOIN w USING (doc_id) WHERE rn <= 200
"""


def _fmt_weighted_sample_sql() -> str:
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    return SQL_WEIGHTED_SAMPLE.format(
        A=int(HLL_A), B=int(HLL_B), A2=int(HLL_A2), B2=int(HLL_B2), XS=HLL_XS
    )


SQL_WEIGHTED_SAMPLE = _fmt_weighted_sample_sql()


def q_trimmed_length_stats(sf_dir: str):
    """Outlier-robust length profile: exact [p05, p95] band from radix
    selection, then one integer (count, sum) scan — the trimmed mean
    (stages/selection.trimmed_stats). No sort, no hand-tuned cutoffs,
    register-sized exchange only."""
    from vaero_ray.stages.selection import trimmed_stats

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return trimmed_stats(ds, "n_chars", 0.05, 0.95)


SQL_TRIMMED_STATS = r"""
WITH q AS (SELECT quantile_disc(n_chars, 0.05) AS lo,
                  quantile_disc(n_chars, 0.95) AS hi FROM documents),
f AS (SELECT n_chars FROM documents, q WHERE n_chars BETWEEN q.lo AND q.hi)
SELECT CAST(q.lo AS BIGINT) AS lo, CAST(q.hi AS BIGINT) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS sum_val,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_val
FROM f, q GROUP BY q.lo, q.hi
"""


def q_length_percent_rank(sf_dir: str):
    """Global rank normalization WITHOUT a global sort: every document's
    PERCENT_RANK over n_chars via a broadcast (value, cumulative-count)
    lookup (stages/ranking.global_percent_rank — blocks reduce to
    distinct value counts, one small merge, one assign scan; no data row
    leaves its block). Percentile calibration of a metric column, the
    row-level complement of the quantile/binning gates."""
    from vaero_ray.stages.ranking import global_percent_rank

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return global_percent_rank(ds, "n_chars", out="pct_rank")


SQL_LENGTH_PERCENT_RANK = r"""
SELECT doc_id, n_chars, PERCENT_RANK() OVER (ORDER BY n_chars) AS pct_rank
FROM documents
"""


def q_documents_profile(sf_dir: str):
    """DESCRIBE at corpus scale (stages/profile.profile_table): row
    count, per-column nulls, native-typed min/max and EXACT distinct
    cardinalities for all five documents columns — one metadata-row
    scan plus one deduped-hash-pair exchange; no data row or raw string
    rides a shuffle."""
    from vaero_ray.stages.profile import profile_table

    ds = _read_pq(f"{sf_dir}/documents.parquet")
    return profile_table(ds, ["doc_id", "text", "lang", "source", "n_chars"])


def _profile_col_sql(c: str) -> str:
    return (
        f"SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"CAST(MIN({c}) AS VARCHAR) AS min_val, "
        f"CAST(MAX({c}) AS VARCHAR) AS max_val FROM documents"
    )


SQL_DOCUMENTS_PROFILE = " UNION ALL ".join(
    _profile_col_sql(c) for c in ["doc_id", "text", "lang", "source", "n_chars"]
)


def q_lang_source_chi2(sf_dir: str):
    """Chi-square contingency profile lang x source
    (stages/relational.contingency_chi2): per-cell observed counts,
    independence-expected counts and chi-square terms — the
    distribution-drift / association screen of corpus QA. Blocks
    pre-collapse to distinct cell partials; one keyed-sum exchange;
    exact integer marginals, doubles only in the final per-cell
    expression."""
    from vaero_ray.stages.relational import contingency_chi2

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
    return contingency_chi2(ds, "lang", "source")


SQL_LANG_SOURCE_CHI2 = r"""
WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
m AS (SELECT *, SUM(n) OVER (PARTITION BY lang) AS rt,
             SUM(n) OVER (PARTITION BY source) AS ct,
             SUM(n) OVER () AS tot FROM c),
x AS (SELECT lang, source, n,
             CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tot AS DOUBLE) AS expected
      FROM m)
SELECT lang, source, n, expected,
       (n - expected) * (n - expected) / expected AS chi2_term
FROM x
"""


def q_source_iqr_survivors(sf_dir: str):
    """Per-source Tukey-fence outlier removal
    (stages/selection.iqr_outlier_filter): keep documents whose length
    lies in [q1 - 1.5*IQR, q3 + 1.5*IQR] of THEIR source — the
    data-derived robust curation cut. q1/q3 for every source ride the
    same radix-selection scans (zero row exchange); fences broadcast;
    one filter scan."""
    from vaero_ray.stages.selection import iqr_outlier_filter

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return iqr_outlier_filter(ds, "n_chars", "source", k=1.5)


SQL_IQR_SURVIVORS = r"""
WITH q AS (SELECT source, quantile_disc(n_chars, 0.25) AS q1,
                  quantile_disc(n_chars, 0.75) AS q3
           FROM documents GROUP BY 1)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN q USING (source)
WHERE d.n_chars >= q.q1 - 1.5 * (q.q3 - q.q1)
  AND d.n_chars <= q.q3 + 1.5 * (q.q3 - q.q1)
"""


def q_top_unshipped_orders(sf_dir: str):
    """TPC-H-Q3-style capstone: top-10 BUILDING-segment orders by
    unshipped revenue (ordered before 1997-07-01, line items shipped
    after). Same composition rules as the Q5 gate: runtime-filtered
    customer keys through auto_join (broadcast under threshold,
    partitioned above), lineitem revenue fixed-pointed to integer cents
    PER LINE and pre-aggregated by orderkey inside each scan block
    before its exchange, final exact sum per order, deterministic
    (revenue DESC, orderkey) top-10."""
    import datetime as _dt

    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    from vaero_ray.stages.joins import auto_join

    cut = pa.scalar(_dt.datetime(1997, 7, 1), pa.timestamp("us"))

    def cust_keys(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(_pc.equal(tbl.column("c_mktsegment"), "BUILDING"))
        return pa.table({"o_custkey": t.column("c_custkey")})

    cust = _read_pq(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_keys, batch_format="pyarrow", zero_copy_batch=True)

    def order_window(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(_pc.less(tbl.column("o_orderdate"), cut))
        return t.select(["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    orders = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_window, batch_format="pyarrow", zero_copy_batch=True)
    orders_b = auto_join(orders, cust, keys="o_custkey").drop_columns(["o_custkey"])

    def line_rev_partial(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(_pc.greater(tbl.column("l_shipdate"), cut))
        cents = _pc.cast(
            _pc.floor(
                _pc.add(
                    _pc.multiply(
                        _pc.multiply(
                            t.column("l_extendedprice"),
                            _pc.subtract(pa.scalar(1.0), t.column("l_discount")),
                        ),
                        pa.scalar(100.0),
                    ),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        )
        g = (
            pa.table({"o_orderkey": t.column("l_orderkey"), "cents": cents})
            .group_by("o_orderkey")
            .aggregate([("cents", "sum")])
        )
        return pa.table(
            {"o_orderkey": g.column("o_orderkey"), "rev": g.column("cents_sum")}
        )

    line = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(line_rev_partial, batch_format="pyarrow", zero_copy_batch=True)

    from ray.data.aggregate import Min

    joined = auto_join(line, orders_b, keys="o_orderkey")
    # date/priority are functionally dependent on the order key, so Min
    # carries them through the ONE aggregate exactly — no re-attach join
    per_order = joined.groupby("o_orderkey").aggregate(
        Sum("rev", alias_name="revenue_cents"),
        Min("o_orderdate", alias_name="o_orderdate"),
        Min("o_orderpriority", alias_name="o_orderpriority"),
    )
    # (revenue desc, orderkey asc) via the negated tie key, the
    # top10_orders idiom — one two-column descending sort + limit
    ranked = per_order.map_batches(
        lambda t: t.append_column(
            "__nk", _pc.negate(_pc.cast(t.column("o_orderkey"), pa.int64()))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = ranked.sort(["revenue_cents", "__nk"], descending=True).limit(10)

    def finish(t: pa.Table) -> pa.Table:
        # Ray's Min aggregate coarsens timestamp[us] to [s]; restore
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "revenue_cents": t.column("revenue_cents"),
                "o_orderdate": t.column("o_orderdate").cast(pa.timestamp("us")),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


SQL_TOP_UNSHIPPED = r"""
WITH l AS (SELECT l_orderkey,
                  CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
           FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-07-01')
SELECT o.o_orderkey, CAST(SUM(l.cents) AS BIGINT) AS revenue_cents,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY 1, 3, 4
ORDER BY revenue_cents DESC, o_orderkey LIMIT 10
"""


def q_rolling_value_sums(sf_dir: str):
    """Per-event moving aggregate (stages/cep.rolling_sums): each
    event's sum of the same user's fixed-point value over the trailing
    30 minutes — spend-in-last-window burst detection, the aggregate
    complement of rolling_user_counts. Values fixed-pointed to integer
    micro-units with the identical floor(x*1e6 + 0.5) expression the
    oracle writes, so sums are order/shard-invariant integers."""
    import pyarrow.compute as _pc

    from vaero_ray.stages.cep import rolling_sums

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def derive(tbl: pa.Table) -> pa.Table:
        micro = _pc.cast(
            _pc.floor(
                _pc.add(
                    _pc.multiply(tbl.column("value"), pa.scalar(1_000_000.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {"user_id": tbl.column("user_id"), "ts": tbl.column("ts"), "micro": micro}
        )

    ev = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    return rolling_sums(ev, "user_id", "ts", "micro", window_s=1800)


SQL_ROLLING_VALUE_SUMS = r"""
WITH e AS (SELECT user_id, ts,
                  CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS micro
           FROM events)
SELECT user_id, ts, micro,
       CAST(SUM(micro) OVER (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1800 SECONDS PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rolling_sum
FROM e
"""


def q_edit_distance_dups(sf_dir: str):
    """Exact Levenshtein-verified duplicate pairs
    (stages/editdist.edit_distance_pairs): documents unioned with a
    planted perturbed replica (first char replaced, every 5th doc),
    blocked on (source, n_chars) equality, every in-bucket pair verified
    by the pair-vectorized Wagner-Fischer DP, dist <= 3 emitted. The
    edit-metric verify step of fuzzy dedup (typos / small template
    perturbations), complementing the token-overlap verifiers."""
    from vaero_ray.stages.editdist import edit_distance_pairs

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source", "n_chars"]
    )

    def with_replica(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        sel = ids % 5 == 0
        sub = tbl.filter(pa.array(sel))
        texts = sub.column("text").to_pylist()
        mtexts = ["q" + t[1:] if t else t for t in texts]
        rep = pa.table(
            {
                "doc_id": pa.array(
                    sub.column("doc_id").to_numpy(zero_copy_only=False) + 10_000_000,
                    pa.int64(),
                ),
                "text": pa.array(mtexts, pa.string()),
                "source": sub.column("source"),
                "n_chars": sub.column("n_chars"),
            }
        )
        return pa.concat_tables([tbl.select(rep.column_names), rep])

    both = ds.map_batches(with_replica, batch_format="pyarrow", zero_copy_batch=True)
    return edit_distance_pairs(
        both, "doc_id", "text", ["source", "n_chars"], max_distance=3
    )


SQL_EDIT_DISTANCE_DUPS = r"""
WITH all_docs AS (
  SELECT doc_id, text, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 10000000, 'q' || substr(text, 2), source, n_chars
  FROM documents WHERE doc_id % 5 = 0)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM all_docs a JOIN all_docs b
  ON a.source = b.source AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 3
"""


def q_event_type_transitions(sf_dir: str):
    """First-order Markov transition matrix of per-user event streams
    (stages/cep.transition_counts): consecutive event-type steps in
    (ts, event_id) order, counted and normalized to transition
    probabilities — the journey-graph summary. One key-bucketed
    shuffle; per-bucket shift-and-mask collapses to distinct cells
    immediately; tiny bounded cell merge."""
    from vaero_ray.stages.cep import transition_counts

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "event_id"]
    )
    return transition_counts(ds, "user_id", "ts", "event_type", "event_id")


SQL_EVENT_TRANSITIONS = r"""
WITH s AS (SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
c AS (SELECT prev, event_type AS cur, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
SELECT prev, cur, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev) AS DOUBLE) AS p
FROM c
"""


def q_weighted_length_quantiles(sf_dir: str):
    """EXACT WEIGHTED quantiles by radix selection
    (stages/selection.exact_quantiles_disc with weight_col): p25/p50/p90
    of document length where each doc carries integer weight
    (doc_id % 7 + 1) — the importance-weighted form of the quantile
    gates (e.g. median length weighted by sampling multiplicity). Same
    passes and register-row exchanges as the unweighted gate; histograms
    sum weights. Rank rule: smallest value whose cumulative weight
    reaches max(ceil(q * total_weight), 1), verified vs DuckDB over 200
    random weighted arrays."""
    from vaero_ray.stages.selection import exact_quantiles_disc

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def derive(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_chars": tbl.column("n_chars"),
                "wt": pa.array((ids % 7) + 1, pa.int64()),
            }
        )

    withw = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    p25, p50, p90 = exact_quantiles_disc(
        withw, "n_chars", [0.25, 0.5, 0.9], weight_col="wt"
    )
    return pa.table(
        {
            "p25_chars": pa.array([p25], pa.int64()),
            "p50_chars": pa.array([p50], pa.int64()),
            "p90_chars": pa.array([p90], pa.int64()),
        }
    )


SQL_WEIGHTED_QUANTILES = r"""
WITH x AS (SELECT n_chars AS v, doc_id % 7 + 1 AS w FROM documents),
tot AS (SELECT SUM(w) AS t FROM x),
o AS (SELECT v, SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c FROM x)
SELECT CAST(MIN(CASE WHEN c >= GREATEST(CEIL(0.25 * t), 1) THEN v END) AS BIGINT) AS p25_chars,
       CAST(MIN(CASE WHEN c >= GREATEST(CEIL(0.50 * t), 1) THEN v END) AS BIGINT) AS p50_chars,
       CAST(MIN(CASE WHEN c >= GREATEST(CEIL(0.90 * t), 1) THEN v END) AS BIGINT) AS p90_chars
FROM o, tot
"""


def q_streaming_activity_intervals(sf_dir: str):
    """STREAMING interval union through the exactly-once session driver
    (StreamingSessionJob extent mode, gap 0): the same per-user activity
    extents as the batch `user_activity_intervals` gate arrive as 4
    ts-sorted chunks; open components are held as mergeable fragment
    partials and close when the watermark (max raw START — an extent's
    end is not its event time) passes their end; committed output must
    equal the batch islands oracle. Completes the batch<->streaming
    matrix for the interval-union operator."""
    import os
    import shutil

    import pyarrow.compute as _pc

    from vaero_ray.stages.windows import AggSpec
    from vaero_ray.streaming import StreamingSessionJob

    ind = _stream_chunks(sf_dir, "iunion/in", ["event_id", "ts", "user_id"])
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)

    def derive_end(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        end = ts_us + ((eid % 3600) + 60) * 1_000_000
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "ts": tbl.column("ts"),
                "end_us": pa.array(end, pa.int64()),
            }
        )

    job = StreamingSessionJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        key="user_id",
        aggs=[
            AggSpec(None, "count", "n_merged"),
            AggSpec("ts", "min", "start_ts"),
            AggSpec("end_us", "max", "end_us"),
        ],
        ts_col="ts",
        end_col="end_us",
        gap_s=0,
        allowed_lateness_s=0,  # arrival chunks are ts-sorted
        num_partitions=4,
        transform=lambda ds: ds.map_batches(
            derive_end, batch_format="pyarrow", zero_copy_batch=True
        ),
    )
    job.run()
    return job.committed_output()


SQL_STREAMING_ACTIVITY = r"""
WITH iv AS (
  SELECT user_id, ts AS s,
         epoch_us(ts) + ((event_id % 3600) + 60) * 1000000 AS e
  FROM events),
o AS (SELECT user_id, s, e,
        MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM iv),
g AS (SELECT *, SUM(CASE WHEN pm IS NULL OR epoch_us(s) > pm THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp
      FROM o)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_merged,
       MIN(s) AS start_ts, MAX(e) AS end_us
FROM g GROUP BY user_id, grp
"""


def q_user_state_history(sf_dir: str):
    """SCD2 timeline build (stages/rowwindow.state_history): per-user
    event-type runs with [valid_from, valid_to) validity — consecutive
    equal states collapse, the next run's start closes each row, the
    live run stays open (null). The warehouse slowly-changing-dimension
    complement of user_state_changelog (which keeps only the LAST
    state). One bucketed sort, shard-invariant via the event_id tie."""
    from vaero_ray.stages.rowwindow import state_history

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "event_id"]
    )
    return state_history(ds, "user_id", "ts", "event_type", "event_id")


SQL_STATE_HISTORY = r"""
WITH s AS (SELECT user_id, ts, event_type, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
c AS (SELECT user_id, ts, event_type, event_id FROM s
      WHERE prev IS NULL OR event_type IS DISTINCT FROM prev)
SELECT user_id, event_type AS state, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM c
"""


def q_weighted_source_medians(sf_dir: str):
    """Per-SOURCE exact WEIGHTED p50/p90 — the grouped form of the
    weighted quantile gate (stages/selection.exact_group_quantiles_disc
    with weight_col): every (source, quantile) pair rides the same
    scans, histograms sum the doc's integer weight (doc_id % 7 + 1),
    zero row exchange."""
    from vaero_ray.stages.selection import exact_group_quantiles_disc

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def derive(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": tbl.column("source"),
                "n_chars": tbl.column("n_chars"),
                "wt": pa.array((ids % 7) + 1, pa.int64()),
            }
        )

    withw = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    per = exact_group_quantiles_disc(
        withw, "n_chars", "source", [0.5, 0.9], weight_col="wt"
    )
    srcs = sorted(per)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "p50_chars": pa.array([per[s][0] for s in srcs], pa.int64()),
            "p90_chars": pa.array([per[s][1] for s in srcs], pa.int64()),
        }
    )


SQL_WEIGHTED_SOURCE_MEDIANS = r"""
WITH x AS (SELECT source, n_chars AS v, doc_id % 7 + 1 AS w FROM documents),
tot AS (SELECT source, SUM(w) AS t FROM x GROUP BY 1),
o AS (SELECT source, v,
        SUM(w) OVER (PARTITION BY source ORDER BY v ROWS UNBOUNDED PRECEDING) AS c
      FROM x)
SELECT o.source,
       CAST(MIN(CASE WHEN c >= GREATEST(CEIL(0.50 * t), 1) THEN v END) AS BIGINT) AS p50_chars,
       CAST(MIN(CASE WHEN c >= GREATEST(CEIL(0.90 * t), 1) THEN v END) AS BIGINT) AS p90_chars
FROM o JOIN tot USING (source) GROUP BY o.source
"""


def q_event_state_asof(sf_dir: str):
    """Point-in-time enrichment against the SCD2 dimension — the
    composition the history table exists for: every event gains the
    state valid AT its timestamp via a backward as-of join against the
    change rows (stages/rowwindow.state_history -> stages/joins.asof_join,
    per-side shuffles). Oracle: DuckDB ASOF JOIN against the same
    LAG-filtered change set."""
    from vaero_ray.stages.joins import asof_join
    from vaero_ray.stages.rowwindow import state_history

    ev = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "event_id"]
    )
    hist = state_history(ev, "user_id", "ts", "event_type", "event_id")

    def as_right(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "ts": tbl.column("valid_from"),
                "state": tbl.column("state"),
            }
        )

    right = hist.map_batches(as_right, batch_format="pyarrow", zero_copy_batch=True)
    left = _read_pq(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    return asof_join(
        left, right, key="user_id", ts_col="ts",
        right_ts_out="state_since", right_cols=["state"],
    )


SQL_EVENT_STATE_ASOF = r"""
WITH s AS (SELECT user_id, ts, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
c AS (SELECT user_id, ts, event_type FROM s
      WHERE prev IS NULL OR event_type IS DISTINCT FROM prev)
SELECT e.event_id, e.user_id, e.ts, c.ts AS state_since, c.event_type AS state
FROM events e ASOF JOIN c ON e.user_id = c.user_id AND c.ts <= e.ts
"""


def q_user_path_counts(sf_dir: str):
    """Top 3-step user journeys (stages/cep.path_counts): every
    consecutive same-user event-type triple in (ts, event_id) order,
    counted with each path's share of all 3-step windows — the k-gram
    generalization of the transition matrix. Same shape: shifts +
    immediate cell collapse, tiny bounded merge."""
    from vaero_ray.stages.cep import path_counts

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "event_id"]
    )
    return path_counts(ds, "user_id", "ts", "event_type", "event_id", depth=3)


SQL_USER_PATH_COUNTS = r"""
WITH s AS (SELECT user_id, event_type AS step_3,
             LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step_2,
             LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step_1
           FROM events),
c AS (SELECT step_1, step_2, step_3, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE step_1 IS NOT NULL GROUP BY 1, 2, 3)
SELECT step_1, step_2, step_3, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS p
FROM c
"""


def q_user_covered_seconds(sf_dir: str):
    """Coverage accounting on top of the interval union: per user, total
    DISTINCT covered seconds (overlaps counted once — the reason the
    union must run first; a plain SUM of extents double-counts) plus the
    span and event counts. merge_intervals -> one small keyed aggregate
    over the merged spans."""
    from ray.data.aggregate import Count, Sum

    from vaero_ray.stages.cep import merge_intervals

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])

    def derive(tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        end = ts + ((eid % 3600) + 60) * 1_000_000
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "start_us": pa.array(ts, pa.int64()),
                "end_us": pa.array(end, pa.int64()),
            }
        )

    iv = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    merged = merge_intervals(iv, "user_id", "start_us", "end_us")

    def span_len(tbl: pa.Table) -> pa.Table:
        s = tbl.column("start_us").to_numpy(zero_copy_only=False)
        e = tbl.column("end_us").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "sec": pa.array((e - s) // 1_000_000, pa.int64()),
                "n_merged": tbl.column("n_merged"),
            }
        )

    return (
        merged.map_batches(span_len, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_spans"),
            Sum("sec", alias_name="covered_sec"),
            Sum("n_merged", alias_name="n_events"),
        )
    )


SQL_USER_COVERED_SECONDS = r"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + ((event_id % 3600) + 60) * 1000000 AS e
  FROM events),
o AS (SELECT user_id, s, e,
        MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM iv),
g AS (SELECT *, SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp
      FROM o),
sp AS (SELECT user_id, (MAX(e) - MIN(s)) // 1000000 AS sec, COUNT(*) AS n
       FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(sec) AS BIGINT) AS covered_sec,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM sp GROUP BY user_id
"""


def q_part_pair_support(sf_dir: str):
    """Market-basket pair co-occurrence over lineitem: support count per
    unordered part pair appearing in the same order (DISTINCT per order),
    kept at support >= 2. The quadratic pair emission is confined inside
    each order's basket (vectorized repeat/cumsum index arithmetic, fat
    baskets truncated with a logged cap); cross-corpus cost is two
    hash-bucket exchanges of (pair, partial-count) rows."""
    from vaero_ray.stages.basket import pair_cooccurrence

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    pairs = pair_cooccurrence(ds, "l_orderkey", "l_partkey", min_support=2)

    def rename(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part1": tbl.column("item_a"),
                "part2": tbl.column("item_b"),
                "support": tbl.column("support"),
            }
        )

    return pairs.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def q_user_time_weighted(sf_dir: str):
    """Time-weighted value accounting per user: each event's value (cents)
    is held until the user's next event; exact integer sums of
    value x hold-seconds and of held seconds (the TWA numerator /
    denominator, no ratio emitted). One bucketed shuffle, shift +
    key-boundary mask inside the bucket."""
    from vaero_ray.stages.cep import time_weighted_sums

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    ).map_batches(_value_to_cents, batch_format="pyarrow", zero_copy_batch=True)
    return time_weighted_sums(ds, "user_id", "ts", "value", "event_id")


SQL_USER_TIME_WEIGHTED = r"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
  FROM events),
h AS (SELECT user_id, v,
             (epoch_us(nts) - epoch_us(ts)) // 1000000 AS hold_sec
      FROM e WHERE nts IS NOT NULL)
SELECT user_id,
       CAST(SUM(v * hold_sec) AS BIGINT) AS vw_sum,
       CAST(SUM(hold_sec) AS BIGINT) AS held_sec,
       CAST(COUNT(*) AS BIGINT) AS n_holds
FROM h GROUP BY user_id
"""


SQL_PART_PAIR_SUPPORT = r"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part1, b.l_partkey AS part2,
       CAST(COUNT(*) AS BIGINT) AS support
FROM items a
JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


def q_part_triangle_counts(sf_dir: str):
    """Per-part triangle participation in the co-occurrence graph
    (support >= 2 pairs as edges): how many closed part-triples each part
    belongs to — the clustering signal on top of part_pair_support.
    Degree-oriented wedge emission bounds the quadratic work by each
    node's OUT-neighborhood (O(sqrt(m)) under degree orientation), with
    a logged truncation guard for degenerate lists."""
    from vaero_ray.stages.basket import pair_cooccurrence
    from vaero_ray.stages.graph import triangle_counts

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    edges = pair_cooccurrence(ds, "l_orderkey", "l_partkey", min_support=2)
    return triangle_counts(
        edges, "item_a", "item_b", node_out="part", count_out="n_triangles"
    )


SQL_PART_TRIANGLES = r"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
        FROM e a JOIN e b ON b.u = a.v
        JOIN e c ON c.u = a.u AND c.v = b.v)
SELECT part, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT x AS part FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
GROUP BY part
"""


_BLOOM_M = 1 << 16


def q_bloom_user_filter(sf_dir: str):
    """Bloom-filter registers of the user-id set: the OR-mergeable
    membership sketch a 100-TB decontamination pass broadcasts as its
    pre-filter (definite-absence answers skip the expensive exact join).
    No false negatives; FPR tested in tests/test_round3.py."""
    from vaero_ray.stages.sketch import bloom_registers

    return bloom_registers(_events(sf_dir, columns=["user_id"]), "user_id", m_bits=_BLOOM_M)


def _fmt_bloom_sql() -> str:
    from vaero_ray.stages.sketch import _BLOOM_K, _WORD_BITS, CMS_A, CMS_B

    parts = []
    for r in range(_BLOOM_K):
        parts.append(
            f"""
SELECT CAST(((CAST({int(CMS_A[r])} AS HUGEINT)
     * ((CASE WHEN user_id < 0
          THEN CAST(user_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
          ELSE CAST(user_id AS HUGEINT) END) % CAST(2305843009213693951 AS HUGEINT)))
     % CAST(2305843009213693951 AS HUGEINT)
     + CAST({int(CMS_B[r])} AS HUGEINT)) % CAST(2305843009213693951 AS HUGEINT)
     AS BIGINT) % {_BLOOM_M} AS p
FROM events"""
        )
    union = " UNION ALL ".join(parts)
    return f"""
WITH pos AS ({union})
SELECT p // {_WORD_BITS} AS word,
       CAST(bit_or(1::BIGINT << (p % {_WORD_BITS})) AS BIGINT) AS bits
FROM pos GROUP BY 1
"""


SQL_BLOOM = _fmt_bloom_sql()


_CMS_W, _CMS_D = 1024, 4


def q_cms_user_counts(sf_dir: str):
    """Count-Min registers of event frequency per user: mergeable-by-SUM
    counter sketch (depth x width small ints leave any block); point
    estimates from the merged registers are upper bounds (min over
    rows), tested in tests/test_round3.py."""
    from vaero_ray.stages.sketch import cms_registers

    return cms_registers(
        _events(sf_dir, columns=["user_id"]), "user_id", width=_CMS_W, depth=_CMS_D
    )


def _fmt_cms_sql() -> str:
    from vaero_ray.stages.sketch import CMS_A, CMS_B

    parts = []
    for r in range(_CMS_D):
        parts.append(
            f"""
SELECT CAST({r} AS BIGINT) AS row,
  CAST(((CAST({int(CMS_A[r])} AS HUGEINT)
     * ((CASE WHEN user_id < 0
          THEN CAST(user_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
          ELSE CAST(user_id AS HUGEINT) END) % CAST(2305843009213693951 AS HUGEINT)))
     % CAST(2305843009213693951 AS HUGEINT)
     + CAST({int(CMS_B[r])} AS HUGEINT)) % CAST(2305843009213693951 AS HUGEINT)
     AS BIGINT) % {_CMS_W} AS slot,
  CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1, 2"""
        )
    return " UNION ALL ".join(parts)


SQL_CMS = _fmt_cms_sql()


def q_streaming_hll_distinct(sf_dir: str):
    """STREAMING approximate distinct users per (event_type, hour):
    HyperLogLog composed with the exactly-once windowed machinery by
    representing registers AS ROWS — a stateless per-event (bucket, rho)
    transform, then the standard streaming tumbling aggregate keyed by
    (event_type, bucket) with a max(rho) agg. Registers ride the same
    checkpointed partial/merge/carry path as any other windowed state;
    the estimate is derived from the committed registers downstream.
    No new streaming machinery — the point is that mergeable sketches
    ARE windowed aggregates."""
    import os
    import shutil

    from vaero_ray.stages.sketch import hll_bucket_rho
    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(sf_dir, "events_uid_in", ["event_type", "ts", "user_id"])
    base = os.path.dirname(ind)

    def pre(ds: rd.Dataset) -> rd.Dataset:
        def per_batch(tbl: pa.Table) -> pa.Table:
            x = np.asarray(tbl.column("user_id").to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            bucket, rho = hll_bucket_rho(x.astype(np.uint64), _HLL_P)
            return (
                tbl.drop_columns("user_id")
                .append_column("bucket", pa.array(bucket, pa.int64()))
                .append_column("rho", pa.array(rho, pa.int64()))
            )

        return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)

    out_d, ckpt_d = f"{base}/hll_out", f"{base}/hll_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["event_type", "bucket"],
        aggs=[AggSpec("rho", "max", "max_rho")],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,
        num_partitions=4,
        transform=pre,
    )
    job.run()
    return job.committed_output()


def q_streaming_funnel(sf_dir: str):
    """STREAMING funnel/CEP through the exactly-once machinery: did the
    user view-then-purchase within the hour window? The ORDERED pattern
    reduces to mergeable aggregates — min(view ts) and max(purchase ts)
    per (user, window): a conversion exists iff some purchase falls
    strictly after the first view, i.e. max_purchase_ts > min_view_ts.
    So the CEP rides the standard streaming tumbling job (partials
    merge associatively across epochs — no event buffering, no new
    machinery) and the flag derives from the two committed values
    downstream. Stage timestamps ride as SENTINEL-ENCODED int64
    microseconds (missing view = +2^62 under min, missing purchase =
    -1 under max) per the engine's fixed-point-before-aggregate
    convention — nullable timestamps would degrade to binary through
    the pandas sink conversion (Ray quirk), and the sentinels keep
    every partial column non-nullable."""
    import os
    import shutil

    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(sf_dir, "funnel_in", ["user_id", "event_type", "ts"])
    base = os.path.dirname(ind)

    NO_VIEW = 1 << 62  # absorbing under min

    def pre(ds: rd.Dataset) -> rd.Dataset:
        def per_batch(tbl: pa.Table) -> pa.Table:
            et = tbl.column("event_type")
            ts = tbl.column("ts")
            us = ts.cast(pa.timestamp("us")).cast(pa.int64())
            view_us = pc.if_else(pc.equal(et, "view"), us, pa.scalar(NO_VIEW, pa.int64()))
            pur_us = pc.if_else(
                pc.equal(et, "purchase"), us, pa.scalar(-1, pa.int64())
            )
            return pa.table(
                {
                    "user_id": tbl.column("user_id"),
                    "ts": ts,
                    "view_us": view_us,
                    "purchase_us": pur_us,
                }
            )

        return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)

    out_d, ckpt_d = f"{base}/funnel_out", f"{base}/funnel_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["user_id"],
        aggs=[
            AggSpec("view_us", "min", "min_view_us"),
            AggSpec("purchase_us", "max", "max_purchase_us"),
        ],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,
        num_partitions=4,
        transform=pre,
    )
    job.run()

    def derive(tbl: pa.Table) -> pa.Table:
        mv = tbl.column("min_view_us").cast(pa.int64())
        mp = tbl.column("max_purchase_us").cast(pa.int64())
        conv = pc.and_(
            pc.and_(
                pc.less(mv, pa.scalar(NO_VIEW, pa.int64())),
                pc.greater_equal(mp, pa.scalar(0, pa.int64())),
            ),
            pc.greater(mp, mv),
        )
        return pa.table(
            {
                "user_id": tbl.column("user_id").cast(pa.int64()),
                "window_start": tbl.column("window_start").cast(pa.timestamp("us")),
                "converted": conv.cast(pa.int64()),
            }
        )

    return job.committed_output().map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_STREAMING_FUNNEL = r"""
WITH sf_g AS (
  SELECT user_id, date_trunc('hour', ts) AS window_start,
         min(CASE WHEN event_type = 'view' THEN ts END) AS mv,
         max(CASE WHEN event_type = 'purchase' THEN ts END) AS mp
  FROM events GROUP BY 1, 2)
SELECT user_id, window_start,
       CAST(CASE WHEN mv IS NOT NULL AND mp IS NOT NULL AND mp > mv
            THEN 1 ELSE 0 END AS BIGINT) AS converted
FROM sf_g
"""


SQL_STREAMING_HLL = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
h1 AS (
  SELECT event_type, ts,
         CAST(((A * ((CASE WHEN user_id < 0
                THEN CAST(user_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
                ELSE CAST(user_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM events, m),
hs AS (
  SELECT event_type, ts,
         CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) AS hv
  FROM h1, m),
w AS (SELECT event_type, ts, hv >> (61 - {p}) AS bucket,
             ((hv & ((1::BIGINT << (61 - {p})) - 1)) | (1::BIGINT << (61 - {p}))) AS wv
      FROM hs)
SELECT event_type, date_trunc('hour', ts) AS window_start, bucket,
       CAST(MAX(bit_count((wv & (-wv)) - 1) + 1) AS BIGINT) AS max_rho
FROM w GROUP BY 1, 2, 3
"""


def q_label_centroid_sums(sf_dir: str):
    """Distributed exact per-label centroid accumulators (two-phase
    vector aggregate, integer micro-units so sums are order-independent
    and SQL-exact)."""
    from vaero_ray.stages.ann import label_centroid_sums

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"])
    return label_centroid_sums(ds)


# fixture embeddings are 64-dim (both gate scales); the Ray side derives
# d from the data, the oracle pins the same width
SQL_CENTROID_SUMS = r"""
WITH dims AS (SELECT unnest(range(1, 65)) AS dim)
SELECT CAST(label AS BIGINT) AS label, CAST(d.dim AS BIGINT) AS dim,
  CAST(SUM(CAST(floor(CAST(embedding[d.dim] AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
       AS BIGINT) AS sum_micro,
  CAST(count(*) AS BIGINT) AS n_vecs
FROM embeddings, dims d
GROUP BY label, d.dim
"""


_MIX_RATES = {"src0": 1000, "src1": 300, "src2": 0}
_MIX_DEFAULT = 500


def q_stratified_sample_docs(sf_dir: str):
    """Deterministic per-source downsampling (data-mixing weights):
    keep all of src0, 30% of src1, none of src2, 50% elsewhere — a
    stateless pure-function-of-the-row filter (stable across runs,
    workers, and re-sharding; nested rates give nested samples)."""
    from vaero_ray.stages.corpus import stratified_sample

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return stratified_sample(ds, "doc_id", "source", _MIX_RATES, _MIX_DEFAULT)


SQL_STRATIFIED = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
h1 AS (
  SELECT doc_id, source,
    CAST(((A * ((CASE WHEN doc_id < 0
         THEN CAST(doc_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
         ELSE CAST(doc_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM documents, m)
SELECT doc_id, source FROM h1, m
WHERE CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) % 1000
      < CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 300 WHEN 'src2' THEN 0
                    ELSE 500 END
"""


def q_latest_event_per_user(sf_dir: str):
    """Changelog / upsert compaction: the single latest event per user
    (max (ts, event_id)) — last-value-wins materialization of a keyed
    update stream. One bucketed shuffle, one survivor per key."""
    from vaero_ray.stages.rowwindow import compact_latest

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"])
    return compact_latest(ds, "user_id", "ts", "event_id", num_buckets=16)


SQL_LATEST = r"""
SELECT event_id, user_id, ts, event_type
FROM (SELECT event_id, user_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def q_running_value_per_user(sf_dir: str):
    """Per-row running total of event value per user (SQL SUM OVER
    PARTITION ... ROWS UNBOUNDED PRECEDING), fixed-pointed to integer
    cents so partial sums are exact and order-independent."""
    from vaero_ray.stages.rowwindow import running_sum

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts", "value"])
    out = running_sum(
        ds, "user_id", "ts", "value", tie_col="event_id",
        out="running_cents", scale=100, num_buckets=16,
    )
    return out.select_columns(["event_id", "user_id", "running_cents"])


SQL_RUNNING_SUM = r"""
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events
"""


def q_moving_avg_value(sf_dir: str):
    """Per-row 5-row moving sum + frame count of event value per user
    (SQL SUM/COUNT OVER ... ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) —
    the short-horizon trend feature; the avg derives exactly from the
    two integers."""
    from vaero_ray.stages.rowwindow import moving_frame_sum

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts", "value"])
    out = moving_frame_sum(
        ds, "user_id", "ts", "value", tie_col="event_id", frame_rows=5,
        out="frame_cents", count_out="frame_n", scale=100, num_buckets=16,
    )
    return out.select_columns(["event_id", "user_id", "frame_cents", "frame_n"])


SQL_MOVING_AVG = r"""
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS frame_cents,
       CAST(COUNT(*)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS frame_n
FROM events
"""


def q_event_lag_lead(sf_dir: str):
    """Per-row previous/next event value per user (SQL LAG/LEAD), integer
    cents with -1 where SQL yields NULL (values are non-negative)."""
    from vaero_ray.stages.rowwindow import lag_lead

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts", "value"])
    out = lag_lead(
        ds, "user_id", "ts", "value", tie_col="event_id",
        lag_out="lag_cents", lead_out="lead_cents", scale=100, num_buckets=16,
    )
    return out.select_columns(["event_id", "user_id", "lag_cents", "lead_cents"])


SQL_LAG_LEAD = r"""
SELECT event_id, user_id,
       CAST(COALESCE(LAG(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS BIGINT) AS lag_cents,
       CAST(COALESCE(LEAD(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS BIGINT) AS lead_cents
FROM events
"""


def q_event_interarrival(sf_dir: str):
    """Per-row microseconds since the user's previous event (LAG), -1
    for each user's first event — dwell-time / burst features."""
    from vaero_ray.stages.rowwindow import interarrival

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts"])
    return interarrival(ds, "user_id", "ts", tie_col="event_id", num_buckets=16)


SQL_INTERARRIVAL = r"""
SELECT event_id, user_id, ts,
       COALESCE(epoch_us(ts) - LAG(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id),
                -1) AS gap_us
FROM events
"""


def q_sessionize_events(sf_dir: str):
    """Per-row 1-based session number per user with a 30-minute gap rule
    (strict >, matching the batch session windows) — the labeling form
    of a session window."""
    from vaero_ray.stages.rowwindow import sessionize

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts"])
    out = sessionize(
        ds, "user_id", "ts", tie_col="event_id", gap_s=1800, num_buckets=16
    )
    return out.select_columns(["event_id", "user_id", "session_id"])


SQL_SESSIONIZE = r"""
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 * 1000000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (SELECT event_id, user_id, ts,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events)
"""


def q_source_lang_rollup(sf_dir: str):
    """GROUP BY ROLLUP(source, lang) in ONE exchange: per-batch partials
    for every grouping level ride a single groupby shuffle; rolled-up
    dims carry the '<all>' sentinel."""
    from vaero_ray.stages.relational import rollup_counts

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"])
    return rollup_counts(ds, ["source", "lang"], measure="n_chars")


SQL_ROLLUP = r"""
SELECT COALESCE(source, '<all>') AS source, COALESCE(lang, '<all>') AS lang,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
FROM documents GROUP BY ROLLUP(source, lang)
"""


def q_median_length_per_source(sf_dir: str):
    """Exact lower median of document length per source (element pick at
    (n-1)//2 in value order — no float interpolation), one bucketed
    shuffle + segment-offset gather."""
    from vaero_ray.stages.relational import grouped_median

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return grouped_median(ds, "source", "n_chars", out="med_chars", num_buckets=8)


SQL_GROUPED_MEDIAN = r"""
WITH r AS (SELECT source, n_chars,
                  row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
                  count(*) OVER (PARTITION BY source) AS n
           FROM documents)
SELECT source, CAST(n_chars AS BIGINT) AS med_chars, CAST(n AS BIGINT) AS n_rows
FROM r WHERE rn = (n + 1) // 2
"""


def q_doc_tokens_exploded(sf_dir: str):
    """Explode / UNNEST WITH ORDINALITY as a user-facing operator: one
    row per whitespace token with its 0-based position — a stateless
    zero-copy Arrow flatten, no shuffle, no per-row flat_map calls."""
    from vaero_ray.stages.relational import explode_lines

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return explode_lines(ds, "text", "doc_id", sep=" ", out_col="token", idx_col="token_no")


SQL_EXPLODE = r"""
SELECT doc_id,
       CAST(generate_subscripts(split(text, ' '), 1) - 1 AS BIGINT) AS token_no,
       unnest(split(text, ' ')) AS token
FROM documents
"""


def q_view_purchase_full_outer(sf_dir: str):
    """FULL OUTER join of two derived per-user aggregates (high-value
    viewers vs high-value purchasers — 22 left-only and 21 right-only
    users at sf0.01): exercises null fill on BOTH sides; keys coalesce,
    counts fill to 0."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from vaero_ray.stages.joins import hash_join

    ds = _events(sf_dir, columns=["user_id", "event_type", "value"])

    def side(event_type: str, out: str):
        def partial(tbl: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.equal(tbl.column("event_type"), event_type),
                pc.greater(tbl.column("value"), 90.0),
            ) if tbl.num_rows else None
            sub = tbl.filter(m) if tbl.num_rows else tbl
            if not sub.num_rows:
                return pa.table({"user_id": pa.array([], pa.int64()),
                                 out: pa.array([], pa.int64())})
            uid, cnt = np.unique(sub.column("user_id").to_numpy(), return_counts=True)
            return pa.table({"user_id": pa.array(uid, pa.int64()),
                             out: pa.array(cnt.astype(np.int64), pa.int64())})

        part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        return part.groupby("user_id").aggregate(Sum(out, alias_name=out))

    joined = hash_join(
        side("view", "n_views"), side("purchase", "n_purchases"),
        keys="user_id", join_type="full outer", num_buckets=4,
    )

    def finalize(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_views": pa.array([], pa.int64()),
                             "n_purchases": pa.array([], pa.int64())})
        uid = tbl.column("user_id")
        if "user_id_r" in tbl.column_names:  # engine did not coalesce keys
            uid = pc.coalesce(uid, tbl.column("user_id_r"))
        return pa.table(
            {
                "user_id": uid.cast(pa.int64()),
                "n_views": pc.coalesce(tbl.column("n_views"), pa.scalar(0)).cast(pa.int64()),
                "n_purchases": pc.coalesce(tbl.column("n_purchases"), pa.scalar(0)).cast(pa.int64()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


SQL_FULL_OUTER = r"""
WITH v AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_views FROM events
           WHERE event_type = 'view' AND value > 90 GROUP BY 1),
p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases FROM events
      WHERE event_type = 'purchase' AND value > 90 GROUP BY 1)
SELECT COALESCE(v.user_id, p.user_id) AS user_id,
       COALESCE(n_views, 0) AS n_views,
       COALESCE(n_purchases, 0) AS n_purchases
FROM v FULL OUTER JOIN p ON v.user_id = p.user_id
"""


def q_doc_normalize_text(sf_dir: str):
    """C4-style text normalization (lowercase, collapse whitespace, trim)
    as a stateless zero-copy Arrow pass — the canonical form fed to
    dedup/fingerprint stages."""
    from vaero_ray.stages.textstats import normalize_text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: normalize_text(t, "text").drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_NORMALIZE = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
       CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS BIGINT)
         AS n_chars_norm
FROM documents
"""


def _fmt_sketch_sql() -> tuple[str, str, str, str, str]:
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    subs = {
        "A": int(HLL_A),
        "B": int(HLL_B),
        "A2": int(HLL_A2),
        "B2": int(HLL_B2),
        "XS": HLL_XS,
        "p": _HLL_P,
    }
    return (
        SQL_HLL_REGISTERS.format(**subs),
        SQL_HASH_SPLIT.format(**subs),
        SQL_HLL_BY.format(**subs),
        SQL_STRATIFIED.format(**subs),
        SQL_STREAMING_HLL.format(**subs),
    )


(
    SQL_HLL_REGISTERS,
    SQL_HASH_SPLIT,
    SQL_HLL_BY,
    SQL_STRATIFIED,
    SQL_STREAMING_HLL,
) = _fmt_sketch_sql()


def _pii_enrich(t: pa.Table) -> pa.Table:
    """Deterministically plant one email, one IPv4 and one phone number
    per doc (pure function of doc_id, identical expression in SQL) — the
    synthetic corpus carries no natural PII, so the gate enriches first,
    then exercises the redaction kernel."""
    did = t.column("doc_id").cast(pa.int64())
    d = did.to_numpy()
    s = lambda arr: pc.cast(pa.array(arr, pa.int64()), pa.string())
    txt = pc.binary_join_element_wise(
        t.column("text"),
        " contact u", s(d), "@ex.com at 10.",
        s(d % 256), ".0.", s(d % 100),
        " call 555-", s(100 + d % 900),
        "-", s(1000 + d % 9000), " end",
        "",
    )
    return pa.table({"doc_id": did, "text": txt})


def q_doc_pii_redact(sf_dir: str):
    """PII scrubbing over documents: typed-placeholder redaction of
    emails / IPv4s / phone numbers with exact per-rule match counts —
    stateless Arrow pass, sequential rule semantics mirrored in SQL."""
    from vaero_ray.stages.textstats import pii_redact

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    enriched = ds.map_batches(_pii_enrich, batch_format="pyarrow", zero_copy_batch=True)
    return enriched.map_batches(
        lambda t: pii_redact(t, "text").drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_PII_REDACT = r"""
WITH p0 AS (
  SELECT doc_id,
         text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com at 10.'
              || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR)
              || ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)
              || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' end' AS t0
  FROM documents),
p1 AS (SELECT doc_id,
              len(regexp_extract_all(t0, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS n_email,
              regexp_replace(t0, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
       FROM p0),
p2 AS (SELECT doc_id, n_email,
              len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
              regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS t2
       FROM p1)
SELECT doc_id,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t2, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
       regexp_replace(t2, '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS redacted
FROM p2
"""


def q_event_rank_per_user(sf_dir: str):
    """ROW_NUMBER / RANK / DENSE_RANK per user over event value DESC —
    the per-row ranking tier; one bucketed shuffle, all three variants
    from one sort + two edge masks."""
    from vaero_ray.stages.rowwindow import rank_rows

    ds = _events(sf_dir, columns=["event_id", "user_id", "value"])
    out = rank_rows(ds, "user_id", "value", "event_id", descending=True, num_buckets=16)
    return out.select_columns(["event_id", "user_id", "rn", "rnk", "dense_rnk"])


SQL_RANK = r"""
SELECT event_id, user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rn,
       CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS BIGINT) AS dense_rnk
FROM events
"""


def q_user_event_path(sf_dir: str):
    """Ordered event-type journey per user (SQL string_agg with ORDER
    BY): one bucketed shuffle, per-key concat via a single Arrow
    binary_join over segment offsets — no per-key Python."""
    from vaero_ray.stages.relational import string_agg_ordered

    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"])
    return string_agg_ordered(
        ds, "user_id", "event_type", ["ts", "event_id"], sep=">", out="path",
        num_buckets=16,
    )


SQL_EVENT_PATH = r"""
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       CAST(count(*) AS BIGINT) AS n_rows
FROM events
GROUP BY 1
"""


def _typed_users(sf_dir: str, event_type: str, min_value: "float | None" = None):
    ds = _events(sf_dir, columns=["user_id", "event_type", "value"])

    def f(t: pa.Table, et=event_type, mv=min_value) -> pa.Table:
        mask = pc.equal(t.column("event_type"), et)
        if mv is not None:
            mask = pc.and_(mask, pc.greater(t.column("value"), mv))
        return t.filter(mask).select(["user_id"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_users_view_not_purchase(sf_dir: str):
    """SQL EXCEPT (distinct): users who viewed but never made a BIG
    (value > 90) purchase. Per-block distinct combiner + one
    membership-flag groupby exchange."""
    from vaero_ray.stages.relational import distinct_set_op

    return distinct_set_op(
        _typed_users(sf_dir, "view"), _typed_users(sf_dir, "purchase", 90.0),
        ["user_id"], "except", types={"user_id": pa.int64()},
    )


SQL_EXCEPT_USERS = r"""
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
"""


def q_users_view_and_purchase(sf_dir: str):
    """SQL INTERSECT (distinct): users with both a view and a BIG
    (value > 90) purchase."""
    from vaero_ray.stages.relational import distinct_set_op

    return distinct_set_op(
        _typed_users(sf_dir, "view"), _typed_users(sf_dir, "purchase", 90.0),
        ["user_id"], "intersect", types={"user_id": pa.int64()},
    )


SQL_INTERSECT_USERS = r"""
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
"""


def q_length_token_moments(sf_dir: str):
    """Per-source second-moment sums of (n_chars, n_tokens) — the exact
    mergeable state behind variance/covariance/correlation, emitted as
    integer sums (order- and shard-independent)."""
    from vaero_ray.stages.relational import grouped_moments

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["source", "text", "n_chars"]
    )
    with_tok = ds.map_batches(
        lambda t: token_counts(t, "text").drop_columns(["text", "n_bpe_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return grouped_moments(with_tok, "source", "n_chars", "n_tokens")


SQL_MOMENTS = r"""
WITH t AS (SELECT source, n_chars AS x,
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS y
           FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * x) AS BIGINT) AS sum_xx,
       CAST(sum(y * y) AS BIGINT) AS sum_yy,
       CAST(sum(x * y) AS BIGINT) AS sum_xy
FROM t GROUP BY 1
"""


def q_length_token_corr(sf_dir: str):
    """Per-source Pearson correlation of (n_chars, n_tokens): the
    closed-form finalize over the exact mergeable integer moment sums —
    identical float64 expression both engines, 6-dp rounded (cosine-gate
    precedent)."""
    from vaero_ray.stages.relational import corr_per_group

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["source", "text", "n_chars"]
    )
    with_tok = ds.map_batches(
        lambda t: token_counts(t, "text").drop_columns(["text", "n_bpe_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return corr_per_group(with_tok, "source", "n_chars", "n_tokens")


SQL_CORR = r"""
WITH t AS (SELECT source, n_chars AS x,
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS y
           FROM documents),
m AS (SELECT source,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(x) AS BIGINT) AS sum_x,
             CAST(sum(y) AS BIGINT) AS sum_y,
             CAST(sum(x * x) AS BIGINT) AS sum_xx,
             CAST(sum(y * y) AS BIGINT) AS sum_yy,
             CAST(sum(x * y) AS BIGINT) AS sum_xy
      FROM t GROUP BY 1)
SELECT source, n_rows,
       CASE WHEN (CAST(n_rows AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x)
               * (CAST(n_rows AS DOUBLE) * sum_yy - CAST(sum_y AS DOUBLE) * sum_y) > 0
            THEN ROUND((CAST(n_rows AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
                       / sqrt((CAST(n_rows AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x)
                            * (CAST(n_rows AS DOUBLE) * sum_yy - CAST(sum_y AS DOUBLE) * sum_y)), 6)
            ELSE NULL END AS corr_xy
FROM m
"""


def q_dedup_keep_best(sf_dir: str):
    """Near-dup removal keeping each cluster's BEST member (max n_chars,
    ties to min doc_id) — dup edges from the word-3-gram true-Jaccard
    pipeline, clusters from connected components, survivors = non-members
    plus one rep per cluster."""
    from vaero_ray.stages.dedup import dedup_keep_best

    docs = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    edges = ngram_jaccard_dups(
        docs.select_columns(["doc_id", "text"]), shingle_k=3, threshold=0.5,
        unit="word",
    )
    return dedup_keep_best(docs, edges, quality_col="n_chars")


SQL_KEEP_BEST = f"""
WITH RECURSIVE kb_pairs AS ({SQL_MINHASH_WORD}),
kb_edges AS (SELECT doc_id AS src, dup_of AS dst FROM kb_pairs
             UNION SELECT dup_of, doc_id FROM kb_pairs),
kb_nodes AS (SELECT DISTINCT src AS node FROM kb_edges),
kb_reach(node, m) AS (
  SELECT node, node FROM kb_nodes
  UNION
  SELECT r.node, e.dst FROM kb_reach r JOIN kb_edges e ON e.src = r.m
),
kb_labels AS (SELECT node AS doc_id, MIN(m) AS cluster FROM kb_reach GROUP BY 1),
kb_best AS (SELECT l.doc_id, l.cluster,
                   row_number() OVER (PARTITION BY l.cluster
                                      ORDER BY d.n_chars DESC, l.doc_id) AS rn
            FROM kb_labels l JOIN documents d USING (doc_id))
SELECT d.doc_id, CAST(d.doc_id AS BIGINT) AS cluster
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM kb_labels)
UNION ALL
SELECT doc_id, CAST(cluster AS BIGINT) AS cluster FROM kb_best WHERE rn = 1
"""


def q_event_ntile_per_user(sf_dir: str):
    """NTILE(4) quartile assignment per user over event value DESC (ties
    broken by event_id) — same one-sort kernel as the rank gate, SQL fill
    rule vectorized from broadcast segment sizes."""
    from vaero_ray.stages.rowwindow import rank_rows

    ds = _events(sf_dir, columns=["event_id", "user_id", "value"])
    out = rank_rows(
        ds, "user_id", "value", "event_id", descending=True, ntile=4, num_buckets=16
    )
    return out.select_columns(["event_id", "user_id", "tile"])


SQL_NTILE = r"""
SELECT event_id, user_id,
       CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS tile
FROM events
"""


def q_event_percent_rank(sf_dir: str):
    """PERCENT_RANK and CUME_DIST per user over event value — the same
    one-sort rank kernel; both are exact small-integer divisions so the
    doubles hash identically to the SQL engine's."""
    from vaero_ray.stages.rowwindow import rank_rows

    ds = _events(sf_dir, columns=["event_id", "user_id", "value"])
    out = rank_rows(
        ds, "user_id", "value", "event_id",
        percent_col="pct_rank", cume_col="cume_dist", num_buckets=16,
    )
    return out.select_columns(["event_id", "user_id", "pct_rank", "cume_dist"])


SQL_PERCENT_RANK = """
SELECT event_id, user_id,
       percent_rank() OVER (PARTITION BY user_id ORDER BY value) AS pct_rank,
       cume_dist() OVER (PARTITION BY user_id ORDER BY value) AS cume_dist
FROM events
"""


def q_source_lang_cube(sf_dir: str):
    """GROUP BY CUBE(source, lang) counts + summed doc length — all four
    grouping sets as partials riding ONE groupby exchange."""
    from vaero_ray.stages.relational import cube_counts

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
    )
    return cube_counts(ds, ["source", "lang"], measure="n_chars")


SQL_CUBE = r"""
SELECT COALESCE(source, '<all>') AS source,
       COALESCE(lang, '<all>') AS lang,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
FROM documents
GROUP BY CUBE (source, lang)
"""


def q_purchase_next_view(sf_dir: str):
    """FORWARD as-of join with tolerance: each purchase matched with the
    user's EARLIEST view at-or-after it, within one hour — the
    direction/tolerance extension of the backward as-of gate."""
    import pandas as pd

    from vaero_ray.stages.joins import asof_join

    ev = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    views = ev.filter(expr="event_type == 'view'").drop_columns(
        ["event_type", "event_id"]
    )
    out = asof_join(
        purchases, views, key="user_id", ts_col="ts", right_ts_out="next_view_ts",
        direction="forward", tolerance=pd.Timedelta(hours=1),
    )
    return out.select_columns(["event_id", "user_id", "ts", "next_view_ts"])


SQL_NEXT_VIEW = """
SELECT p.event_id, p.user_id, p.ts, MIN(v.ts) AS next_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON v.user_id = p.user_id AND v.ts >= p.ts AND v.ts <= p.ts + INTERVAL 1 HOUR
GROUP BY p.event_id, p.user_id, p.ts
"""


def q_kmeans_embeddings(sf_dir: str):
    """Distributed EXACT k-means (k=4, 2 assignment passes) over the
    embeddings table — iterative broadcast-centroids: per-iteration
    shuffle is k x d integer accumulator rows, nothing else leaves a
    block. Deterministic residue-class init, integer micro-unit
    distances, trunc-div centroid update — hash-exact vs the unrolled
    SQL oracle."""
    from vaero_ray.stages.ann import kmeans_assign

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return kmeans_assign(ds, k=4, iters=2)


# Lloyd iterations unrolled: c0 = residue-class seeds; a1 = assignment
# under c0 (exact integer squared L2, ties -> lowest cid); c1 = per-dim
# trunc-div centroid update (DuckDB // truncates; the engine matches);
# a2 = final assignment. COALESCE keeps an empty cluster's previous
# centroid, mirroring the engine.
SQL_KMEANS = """
WITH q AS (
  SELECT vec_id,
         [CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
  FROM embeddings),
dims AS (SELECT CAST(unnest(range(1, 65)) AS BIGINT) AS dim),
init AS (SELECT vec_id % 4 AS cid, min(vec_id) AS vid FROM q GROUP BY 1),
c0 AS (SELECT i.cid, d.dim, q.qv[d.dim] AS val
       FROM init i JOIN q ON q.vec_id = i.vid CROSS JOIN dims d),
d1 AS (SELECT q.vec_id, c.cid,
              SUM((q.qv[c.dim] - c.val) * (q.qv[c.dim] - c.val)) AS dist
       FROM q CROSS JOIN c0 c GROUP BY 1, 2),
a1 AS (SELECT vec_id, cid FROM (
         SELECT vec_id, cid,
                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         FROM d1) WHERE rn = 1),
c1n AS (SELECT a.cid, d.dim,
               CAST(SUM(q.qv[d.dim]) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS val
        FROM a1 a JOIN q USING (vec_id) CROSS JOIN dims d GROUP BY 1, 2),
c1 AS (SELECT c0.cid, c0.dim, COALESCE(c1n.val, c0.val) AS val
       FROM c0 LEFT JOIN c1n ON c0.cid = c1n.cid AND c0.dim = c1n.dim),
d2 AS (SELECT q.vec_id, c.cid,
              SUM((q.qv[c.dim] - c.val) * (q.qv[c.dim] - c.val)) AS dist
       FROM q CROSS JOIN c1 c GROUP BY 1, 2)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM d2) WHERE rn = 1
"""


def q_doc_bigram_commonness(sf_dir: str):
    """Corpus bigram-commonness quality score: per doc, occurrence
    count, summed corpus-wide bigram frequencies and their integer
    mean — the decontamination shuffle shape (bigram-sharded, no
    broadcast of the count table)."""
    from vaero_ray.stages.textstats import bigram_commonness

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bigram_commonness(ds, num_buckets=16)


SQL_BIGRAM_COMMON = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
bg0 AS (SELECT doc_id,
               [toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))] AS bgs
        FROM tk),
bg AS (SELECT doc_id, unnest(bgs) AS b FROM bg0),
cnt AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(cnt.c) AS BIGINT) AS sum_freq,
       CAST(SUM(cnt.c) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg_freq
FROM bg JOIN cnt USING (b)
GROUP BY 1
"""


def q_views_unconverted(sf_dir: str):
    """Negation CEP (absence pattern): per user, view events with NO
    purchase strictly after them within 1 hour — cart abandonment."""
    from vaero_ray.stages.cep import absence_counts

    ev = _events(sf_dir, columns=["ts", "user_id", "event_type"])
    return absence_counts(
        ev, key="user_id", ts_col="ts", type_col="event_type",
        first="view", then="purchase", within_s=3600, num_buckets=16,
    )


SQL_ABSENCE = """
WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
m AS (SELECT v.event_id, v.user_id, count(p.ts) AS nb
      FROM v LEFT JOIN p
        ON p.user_id = v.user_id AND p.ts > v.ts
       AND p.ts <= v.ts + INTERVAL 1 HOUR
      GROUP BY 1, 2)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_first,
       CAST(sum(CASE WHEN nb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned
FROM m GROUP BY 1
"""


def q_doc_stats_unpivot(sf_dir: str):
    """UNPIVOT / melt: the three exact quality counters per doc as
    (doc_id, metric, value) long-format rows — stateless Arrow kernel,
    no shuffle."""
    from vaero_ray.stages.relational import unpivot
    from vaero_ray.stages.textstats import quality_stats

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    stats = ds.map_batches(quality_stats, batch_format="pyarrow", zero_copy_batch=True)
    return unpivot(
        stats, id_cols=["doc_id"], value_cols=["n_chars", "n_punct", "n_digit"],
        var_col="metric", value_col="value",
    )


SQL_UNPIVOT = r"""
WITH s AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct,
         CAST(len(regexp_extract_all(text, '\d')) AS BIGINT) AS n_digit
  FROM documents)
SELECT doc_id, 'n_chars' AS metric, n_chars AS value FROM s
UNION ALL SELECT doc_id, 'n_punct', n_punct FROM s
UNION ALL SELECT doc_id, 'n_digit', n_digit FROM s
"""


def q_p90_length_per_source(sf_dir: str):
    """Exact lower p90 of document length per source — element pick at
    0-based index (n-1)*9//10 in value order (integer-rational quantile,
    no interpolation); grouped_median generalized to any q_num/q_den."""
    from vaero_ray.stages.relational import grouped_percentile

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return grouped_percentile(
        ds, "source", "n_chars", q_num=9, q_den=10, out="p90_chars", num_buckets=8
    )


SQL_GROUPED_P90 = r"""
WITH r AS (SELECT source, n_chars,
                  row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
                  count(*) OVER (PARTITION BY source) AS n
           FROM documents)
SELECT source, CAST(n_chars AS BIGINT) AS p90_chars, CAST(n AS BIGINT) AS n_rows
FROM r WHERE rn = (n - 1) * 9 // 10 + 1
"""


def q_mad_length_per_source(sf_dir: str):
    """Median absolute deviation of document length per source (robust
    spread for corpus profiling): two grouped-median passes — group
    medians broadcast between them (one tiny row per source), deviations
    derived statelessly. Integer in, integer out: both medians are exact
    element picks, hash-identical across engines."""
    from vaero_ray.stages.relational import mad_per_group

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return mad_per_group(ds, "source", "n_chars", num_buckets=8)


SQL_MAD = r"""
WITH med AS (
  SELECT source, n_chars AS median FROM (
    SELECT source, n_chars,
           row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
           count(*) OVER (PARTITION BY source) AS n
    FROM documents) WHERE rn = (n + 1) // 2
), dev AS (
  SELECT d.source, m.median, abs(d.n_chars - m.median) AS ad
  FROM documents d JOIN med m USING (source)
)
SELECT source, CAST(median AS BIGINT) AS median, CAST(ad AS BIGINT) AS mad,
       CAST(n AS BIGINT) AS n_rows
FROM (
  SELECT source, median, ad,
         row_number() OVER (PARTITION BY source ORDER BY ad) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM dev) WHERE rn = (n + 1) // 2
"""


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix over events (distinct active users per
    first-activity-day cohort x activity day): the self-join + COUNT
    DISTINCT collapse into one bucketed shuffle on the user — user
    buckets partition the user set, so per-bucket distinct counts are
    exact summable partials; a tiny (cohorts x days) exchange merges."""
    from vaero_ray.stages.relational import cohort_counts

    ev = _events(sf_dir, columns=["user_id", "ts"])
    return cohort_counts(ev, "user_id", "ts")


SQL_COHORT = """
WITH f AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY 1
)
SELECT f.cohort_day, date_trunc('day', e.ts) AS day,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
"""


def q_length_profile_per_source(sf_dir: str):
    """p10 / median / p90 of document length per source in ONE bucketed
    shuffle (the corpus length-profile view): the sort and segment
    offsets are shared, each quantile is just another element pick."""
    from vaero_ray.stages.relational import grouped_percentiles

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return grouped_percentiles(ds, "source", "n_chars", [(1, 10), (1, 2), (9, 10)], num_buckets=8)


SQL_LENGTH_PROFILE = r"""
WITH r AS (SELECT source, n_chars,
                  row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
                  count(*) OVER (PARTITION BY source) AS n
           FROM documents),
q(nu, de) AS (VALUES (1, 10), (1, 2), (9, 10))
SELECT source, CAST(nu * 1000 // de AS BIGINT) AS q_permille,
       CAST(n_chars AS BIGINT) AS value, CAST(n AS BIGINT) AS n_rows
FROM r JOIN q ON rn = (n - 1) * nu // de + 1
"""


def q_modal_event_per_user(sf_dir: str):
    """Exact mode of event_type per user (ties -> smallest value):
    per-batch partial counts collapse the exchange to distinct
    (user, type) pairs per block, one bucketed merge picks winners."""
    from vaero_ray.stages.relational import mode_per_group

    ev = _events(sf_dir, columns=["user_id", "event_type"])
    return mode_per_group(ev, "user_id", "event_type", num_buckets=8)


SQL_MODE = """
WITH c AS (SELECT user_id, event_type, count(*) AS cnt
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, event_type, cnt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type) AS rn
      FROM c)
SELECT user_id, event_type AS mode, CAST(cnt AS BIGINT) AS mode_count
FROM r WHERE rn = 1
"""


def q_length_fixed_histogram(sf_dir: str):
    """Exact fixed-width histogram of document lengths (width 40,
    16 bins, overflow clamped into the last bin) — sum-mergeable
    per-block bincount partials, <= nbins rows leave any block."""
    from vaero_ray.stages.sketch import fixed_histogram

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return fixed_histogram(ds, "n_chars", lo=0, width=40, nbins=16)


SQL_FIXED_HIST = """
WITH b AS (SELECT LEAST(GREATEST((n_chars - 0) // 40, 0), 15) AS bin
           FROM documents)
SELECT bin, CAST(bin * 40 AS BIGINT) AS bin_lo, CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1
"""


def q_sample_k_docs(sf_dir: str):
    """Deterministic uniform 100-sample without replacement: the k rows
    with the smallest (hll_hash(id), id) — per-block partial top-k prune
    bounds the exchange to k rows per block; membership is a pure
    function of the id set (re-run / re-shard / resume stable)."""
    from vaero_ray.stages.corpus import sample_k

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return sample_k(ds, "doc_id", k=100)


def _fmt_sample_sql(final_select: str) -> str:
    """SQL reproduction of hll_hash(doc_id) (two linear rounds mod M61
    split by an xor-shift, HUGEINT-exact) as CTE ``h2``; ``final_select``
    picks the sample from it."""
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    return r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
h1 AS (
  SELECT doc_id, source,
    CAST(((A * ((CASE WHEN doc_id < 0
         THEN CAST(doc_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
         ELSE CAST(doc_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM documents, m),
h2 AS (
  SELECT doc_id, source,
    CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) AS h
  FROM h1, m)
{FINAL}
""".format(
        A=int(HLL_A), B=int(HLL_B), A2=int(HLL_A2), B2=int(HLL_B2), XS=HLL_XS,
        FINAL=final_select,
    )


SQL_SAMPLE_K = _fmt_sample_sql(
    "SELECT doc_id, source FROM h2 ORDER BY h, doc_id LIMIT 100"
)


def q_sample_per_source(sf_dir: str):
    """Deterministic exact 50-sample per source (seedless per-group
    reservoir): the data-mixing primitive — equal-size per-source
    subcorpora whose membership is a pure function of each source's id
    set (re-run/re-shard/resume stable; adding a source never perturbs
    another source's sample). Stateless hash + exact grouped top-k: the
    per-block partial prune bounds the exchange to k rows per (source,
    block)."""
    from vaero_ray.stages.corpus import sample_k_per_group

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return sample_k_per_group(ds, "source", "doc_id", k=50, num_buckets=8)


SQL_SAMPLE_PER_SOURCE = _fmt_sample_sql(
    """SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM h2)
WHERE rn <= 50"""
)


def q_revenue_by_nation(sf_dir: str):
    """TPC-H-Q5-style multi-join analytics capstone: revenue by nation
    for ASIA customers on 1996-1997 orders — broadcast dims (region ⋈
    nation resolved driver-side, 25 rows, ray.put once), adaptive joins
    for the two fact exchanges (orders ⋈ customer, then lineitem ⋈
    that): the build sides are only small AFTER the runtime filters, so
    ``auto_join`` materializes them and broadcasts under the size
    threshold, partitioned-hash-joins above it (at 100-TB SF both
    exceed it). Revenue fixed-pointed to integer cents PER LINE
    ITEM before any sum (identical float64 expression both engines, so
    partial sums are order/shard-invariant integers), and the lineitem
    side pre-aggregated per block by orderkey before its shuffle (line
    items of an order co-locate in row groups, so the big exchange
    shrinks ~4x)."""
    import datetime as _dt

    import pyarrow as _pa
    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    from vaero_ray.stages.joins import auto_join, broadcast_join

    # dims: region (5) ⋈ nation (25) driver-side, broadcast
    region = pq.read_table(f"{sf_dir}/region.parquet")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    asia_keys = region.filter(_pc.equal(region.column("r_name"), "ASIA")).select(
        ["r_regionkey"]
    ).rename_columns(["n_regionkey"])
    nat = nation.join(asia_keys, keys="n_regionkey", join_type="inner")
    nat = nat.select(["n_nationkey", "n_name"]).rename_columns(["c_nationkey", "n_name"])

    cust = _read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust_nat = broadcast_join(cust, nat, keys="c_nationkey").drop_columns(["c_nationkey"])

    lo = _pa.scalar(_dt.datetime(1996, 1, 1), _pa.timestamp("us"))
    hi = _pa.scalar(_dt.datetime(1998, 1, 1), _pa.timestamp("us"))

    def order_window(tbl: _pa.Table) -> _pa.Table:
        d = tbl.column("o_orderdate")
        keep = _pc.and_(_pc.greater_equal(d, lo), _pc.less(d, hi))
        t = tbl.filter(keep)
        return _pa.table({"o_orderkey": t.column("o_orderkey"), "c_custkey": t.column("o_custkey")})

    orders = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_window, batch_format="pyarrow", zero_copy_batch=True)
    orders_nat = auto_join(orders, cust_nat, keys="c_custkey").drop_columns(["c_custkey"])

    def line_rev_partial(tbl: _pa.Table) -> _pa.Table:
        # floor(ext * (1 - disc) * 100 + 0.5) per line item — the exact
        # left-assoc float64 chain the oracle writes; integer thereafter
        cents = _pc.cast(
            _pc.floor(
                _pc.add(
                    _pc.multiply(
                        _pc.multiply(
                            tbl.column("l_extendedprice"),
                            _pc.subtract(_pa.scalar(1.0), tbl.column("l_discount")),
                        ),
                        _pa.scalar(100.0),
                    ),
                    _pa.scalar(0.5),
                )
            ),
            _pa.int64(),
        )
        g = (
            _pa.table({"o_orderkey": tbl.column("l_orderkey"), "cents": cents})
            .group_by("o_orderkey")
            .aggregate([("cents", "sum")])
        )
        return _pa.table(
            {"o_orderkey": g.column("o_orderkey"), "rev": g.column("cents_sum")}
        )

    line = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_rev_partial, batch_format="pyarrow", zero_copy_batch=True)

    joined = auto_join(line, orders_nat, keys="o_orderkey")
    return joined.groupby("n_name").aggregate(Sum("rev", alias_name="revenue_cents"))


SQL_REVENUE_NATION = r"""
SELECT n.n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q_term_frequency_spectrum(sf_dir: str):
    """Zipf count-of-counts over the corpus vocabulary (hapax mass /
    head weight — the df-cutoff tuning view); see
    textstats.term_frequency_spectrum for the two-level partial-agg
    shape (vocabulary, never tokens, on the wire)."""
    from vaero_ray.stages.textstats import term_frequency_spectrum

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return term_frequency_spectrum(ds)


SQL_TERM_SPECTRUM = r"""
WITH t AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
u AS (SELECT UNNEST(toks) AS token FROM t),
c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS occurrences FROM u GROUP BY 1)
SELECT occurrences, CAST(COUNT(*) AS BIGINT) AS n_terms FROM c GROUP BY 1
"""


def q_heavy_hitter_users(sf_dir: str):
    """EXACT phi-heavy hitters over events.user_id (count > n/k): the
    sketch-prune + exact-verify pattern — per-block local-threshold
    candidates (averaging argument: no global heavy hitter can be below
    threshold in every block), candidate set broadcast once via
    ray.put, exact counts of candidates only, threshold on the exact
    totals. The exchange is bounded by (k-1) values per block at any
    corpus size."""
    from vaero_ray.stages.sketch import heavy_hitters

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id"])
    return heavy_hitters(ds, "user_id", k=140)


SQL_HEAVY_HITTERS = """
SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
HAVING COUNT(*) * 140 > (SELECT COUNT(*) FROM events)
"""


def q_streaming_topk_terms(sf_dir: str):
    """STREAMING per-window top-k: the hourly trending-terms view,
    composed from existing machinery — a stateless tokenizer expansion
    (one row per term occurrence), the exactly-once windowed job keyed
    by term with a count aggregate (term counts are sum-mergeable, so
    partials merge associatively across epochs), and a batch
    top-k-per-group finisher over the COMMITTED output (ties: count
    desc, term asc). Top-k itself is not a mergeable aggregate — the
    engine's composition keeps the mergeable part streaming and the
    non-mergeable finisher on the tiny committed table, which is the
    correct split at any scale."""
    import os
    import shutil

    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.ranking import top_k_per_group
    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(
        sf_dir, "topk_terms_in", ["event_id", "ts", "user_id", "event_type", "props"]
    )
    base = os.path.dirname(ind)

    def pre(ds: rd.Dataset) -> rd.Dataset:
        def tokenize(tbl: pa.Table) -> pa.Table:
            t = _prep(tbl)
            txt = pc.utf8_lower(t.column("text").combine_chunks())
            toks = pc.split_pattern(txt, " ")
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = pc.list_flatten(toks)
            par = pc.list_parent_indices(toks)
            return pa.table({"term": flat, "ts": t.column("ts").take(par)})

        return ds.map_batches(tokenize, batch_format="pyarrow", zero_copy_batch=True)

    out_d, ckpt_d = f"{base}/topk_terms_out", f"{base}/topk_terms_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["term"],
        aggs=[AggSpec(None, "count", "n")],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,
        num_partitions=4,
        transform=pre,
    )
    job.run()
    return top_k_per_group(
        job.committed_output(), group_col="window_start", order_col="n",
        k=5, tie_col="term", num_buckets=16,
    )


SQL_STREAMING_TOPK_TERMS = f"""
WITH {TRANSCRIPTS_CTE}, tok AS (
  SELECT date_trunc('hour', ts) AS window_start,
         UNNEST(regexp_split_to_array(lower(text), ' ')) AS term
  FROM transcripts
), c AS (
  SELECT term, window_start, COUNT(*) AS n FROM tok GROUP BY 1, 2
)
SELECT term, window_start, n FROM (
  SELECT term, window_start, n,
         ROW_NUMBER() OVER (PARTITION BY window_start ORDER BY n DESC, term) AS rn
  FROM c) WHERE rn <= 5
"""


def q_audience_overlap(sf_dir: str):
    """Pairwise audience overlap between event types: exact distinct-user
    intersection and union per type pair, via per-user BITMASKS folded in
    one member-bucketed exchange and a <=2^G mask histogram — no pairwise
    self-join of the membership table ever runs (see
    relational.group_overlap for the three bounded stages)."""
    from vaero_ray.stages.relational import group_overlap

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return group_overlap(ds, "event_type", "user_id", num_buckets=16)


SQL_AUDIENCE_OVERLAP = """
WITH p AS (SELECT DISTINCT user_id, event_type FROM events),
c AS (SELECT event_type, COUNT(*) AS n FROM p GROUP BY 1),
j AS (SELECT p1.event_type AS ta, p2.event_type AS tb, COUNT(*) AS nc
      FROM p p1 JOIN p p2 USING (user_id)
      WHERE p1.event_type < p2.event_type GROUP BY 1, 2)
SELECT ca.event_type AS type_a, cb.event_type AS type_b,
       CAST(COALESCE(j.nc, 0) AS BIGINT) AS n_common,
       CAST(ca.n + cb.n - COALESCE(j.nc, 0) AS BIGINT) AS n_union
FROM c ca JOIN c cb ON ca.event_type < cb.event_type
LEFT JOIN j ON j.ta = ca.event_type AND j.tb = cb.event_type
"""


def q_source_lang_grouping_sets(sf_dir: str):
    """Generic GROUP BY GROUPING SETS — the superset of rollup (prefix
    sets) and cube (all subsets) with an ARBITRARY set list, here
    ((source, lang), (lang), ()): per-batch partials per listed set ride
    one hash-bucket exchange (relational.grouping_sets_counts)."""
    from vaero_ray.stages.relational import grouping_sets_counts

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"])
    return grouping_sets_counts(
        ds, ["source", "lang"], [["source", "lang"], ["lang"], []], measure="n_chars"
    )


SQL_GROUPING_SETS = r"""
SELECT COALESCE(source, '<all>') AS source, COALESCE(lang, '<all>') AS lang,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
FROM documents GROUP BY GROUPING SETS ((source, lang), (lang), ())
"""


def q_p90_value_cont_per_user(sf_dir: str):
    """INTERPOLATED p90 (SQL percentile_cont) of the cent-scaled event
    value per user, kept integer-exact by emitting the percentile TIMES
    q_den (10): v[lo]*10 + rem*(v[lo+1]-v[lo]) — no float interpolation
    drift between engines (relational.grouped_percentile_cont)."""
    from vaero_ray.stages.relational import grouped_percentile_cont

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def cents(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        c = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table({"user_id": tbl.column("user_id"), "c": pa.array(c)})

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_percentile_cont(
        ds, "user_id", "c", q_num=9, q_den=10, out="p90_x_10", num_buckets=16
    )


SQL_P90_CONT = r"""
WITH c AS (SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS v FROM events),
o AS (SELECT user_id, v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY v) - 1 AS i,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM c),
a AS (SELECT user_id, n,
             SUM(CASE WHEN i = ((n-1)*9)//10 THEN v ELSE 0 END) AS lov,
             SUM(CASE WHEN i = ((n-1)*9)//10 + 1 THEN v ELSE 0 END) AS hiv,
             MAX(((n-1)*9) % 10) AS rem
      FROM o GROUP BY user_id, n)
SELECT user_id, CAST(lov*10 + rem*(hiv - lov) AS BIGINT) AS p90_x_10,
       CAST(n AS BIGINT) AS n_rows
FROM a
"""


def q_value_outliers_per_user(sf_dir: str):
    """Per-user z-score anomaly flags with integer-exact comparisons:
    (n*c - s1)^2 > 4*(n*s2 - s1^2) over cent-scaled values — |x - mean| >
    2 stddev with no division and no float boundary flips. Emits only the
    outlier rows (relational.zscore_outliers, one bucketed shuffle)."""
    from vaero_ray.stages.relational import zscore_outliers

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"])
    return zscore_outliers(
        ds, key="user_id", value_col="value", id_col="event_id",
        z_threshold=2, scale=100, num_buckets=16,
    )


SQL_ZSCORE_OUTLIERS = r"""
WITH c AS (SELECT event_id, user_id,
                  CAST(floor(value*100 + 0.5) AS BIGINT) AS v FROM events),
s AS (SELECT user_id, COUNT(*) AS n, SUM(v) AS s1, SUM(v*v) AS s2
      FROM c GROUP BY 1)
SELECT c.event_id, c.user_id, c.v AS value_scaled
FROM c JOIN s USING (user_id)
WHERE (s.n*c.v - s.s1)*(s.n*c.v - s.s1) > 4*(s.n*s.s2 - s.s1*s.s1)
"""


def q_dup_ngram_stats(sf_dir: str):
    """Per-document duplicate-span exposure: distinct 13-char grams that
    occur in >= 2 documents, over total distinct grams — the substring-
    dedup policy input (see dedup.dup_ngram_stats; gram-sharded shuffle,
    nothing broadcast)."""
    from vaero_ray.stages.dedup import dup_ngram_stats

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dup_ngram_stats(ds)


SQL_DUP_NGRAMS = """
WITH s AS (
  SELECT doc_id,
         UNNEST(list_distinct(CASE WHEN length(text) < 13 THEN [rpad(text, 13, ' ')]
                ELSE [substr(text, CAST(i AS INT), 13) FOR i IN range(1, length(text)-11)] END)) AS g
  FROM documents
),
f AS (SELECT doc_id, g, COUNT(*) OVER (PARTITION BY g) >= 2 AS dup FROM s)
SELECT doc_id,
       CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM f GROUP BY 1
"""


def q_streaming_distinct_users(sf_dir: str):
    """STREAMING exact windowed COUNT(DISTINCT): the distinct set rides
    the exactly-once machinery as KEYS — the job aggregates by
    (event_type, user_id) per window (idempotent under in-window
    replays, the same trick as streaming_dedup_events), and a batch
    finisher counts the committed distinct tuples per (event_type,
    window). Exact distinct without buffering raw events OR a sketch."""
    import os
    import shutil

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(sf_dir, "distinct_users_in", ["event_type", "user_id", "ts"])
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/distinct_users_out", f"{base}/distinct_users_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["event_type", "user_id"],
        aggs=[AggSpec(None, "count", "n")],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,
        num_partitions=4,
        transform=None,
    )
    job.run()
    committed = job.committed_output()

    def one(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": tbl.column("event_type"),
                "window_start": tbl.column("window_start"),
                "n_distinct_users": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )

    partials = committed.map_batches(one, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_keyed_sum(
        partials, ["event_type", "window_start"], ["n_distinct_users"], num_buckets=8
    )


SQL_STREAMING_DISTINCT = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events GROUP BY 1, 2
"""


def q_user_stats_skew_join(sf_dir: str):
    """Skew-aware join: hot keys (users with >= 70 events here) bypass
    the shuffle — their rows join per-batch against a broadcast right
    slice, so a degenerate key's volume spreads across every input block
    instead of landing on one reducer; cold keys take the normal
    partitioned hash join; the disjoint results union bit-exact
    (joins.skew_split_join)."""
    from ray.data.aggregate import Sum

    from vaero_ray.stages.joins import skew_split_join

    left = _read_pq(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        vc = tbl.column("user_id").to_pandas().value_counts(dropna=False)
        return pa.table(
            {"user_id": pa.array(vc.index), "n_user_events": pa.array(vc.to_numpy(), pa.int64())}
        )

    right = (
        _read_pq(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("n_user_events", alias_name="n_user_events"))
    )
    return skew_split_join(left, right, "user_id", hot_count=70, num_buckets=8)


SQL_SKEW_JOIN = """
WITH s AS (SELECT user_id, COUNT(*) AS n_user_events FROM events GROUP BY 1)
SELECT e.event_id, e.user_id, s.n_user_events FROM events e JOIN s USING (user_id)
"""


def q_pagerank_user_types(sf_dir: str):
    """Integer-exact distributed PageRank (2 fixed-point power
    iterations, every division a floor division — deterministic across
    shard layouts AND engines, which float PageRank can never be) over
    the bipartite user <-> event_type interaction graph: nodes are
    user_id*2 and type_code*2+1, edges both directions of the distinct
    (user, type) pairs. See graph.pagerank for the two-exchange-per-
    iteration shape."""
    from vaero_ray.stages.graph import pagerank
    from vaero_ray.stages.keyed import bucketed_map_groups

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    types_rows = ds.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type").unique()}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    code = {v: i for i, v in enumerate(sorted({r["event_type"] for r in types_rows}))}

    def to_pairs(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = tbl.column("event_type").to_pandas().map(code).to_numpy(dtype=np.int64)
        uniq = pd.DataFrame({"u": u, "t": t}).drop_duplicates()
        return pa.table({"u": pa.array(uniq["u"].to_numpy()),
                         "t": pa.array(uniq["t"].to_numpy(), pa.int64())})

    pairs = ds.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)
    # compact: the bucketed dedup's sort emits ~2x-cpus mostly-empty
    # blocks; left as-is every pagerank stage downstream pays the
    # empty-task scheduling per execution (see graph.pagerank's nb note)
    pairs = bucketed_map_groups(
        pairs, "u", lambda df: df.drop_duplicates(), num_buckets=8
    ).repartition(8)

    def to_edges(tbl: pa.Table) -> pa.Table:
        u = tbl.column("u").to_numpy(zero_copy_only=False).astype(np.int64) * 2
        t = tbl.column("t").to_numpy(zero_copy_only=False).astype(np.int64) * 2 + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, t])),
                "dst": pa.array(np.concatenate([t, u])),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return pagerank(edges, iters=2, num_buckets=8)


SQL_PAGERANK = """
WITH p AS (SELECT DISTINCT user_id, event_type FROM events),
tid AS (SELECT event_type, CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS BIGINT) AS t
        FROM (SELECT DISTINCT event_type FROM events)),
edges AS (
  SELECT p.user_id*2 AS src, tid.t*2+1 AS dst FROM p JOIN tid USING (event_type)
  UNION ALL
  SELECT tid.t*2+1 AS src, p.user_id*2 AS dst FROM p JOIN tid USING (event_type)),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT node, deg, 1000000000000 // nn.n AS r FROM deg CROSS JOIN nn),
c1 AS (SELECT e.dst AS node, SUM((r0.r * 85) // (100 * r0.deg)) AS s
       FROM edges e JOIN r0 ON r0.node = e.src GROUP BY 1),
r1 AS (SELECT d.node, d.deg,
              (1000000000000 * 15) // (100 * nn.n) + COALESCE(c1.s, 0) AS r
       FROM deg d CROSS JOIN nn LEFT JOIN c1 ON c1.node = d.node),
c2 AS (SELECT e.dst AS node, SUM((r1.r * 85) // (100 * r1.deg)) AS s
       FROM edges e JOIN r1 ON r1.node = e.src GROUP BY 1),
r2 AS (SELECT d.node, d.deg,
              (1000000000000 * 15) // (100 * nn.n) + COALESCE(c2.s, 0) AS r
       FROM deg d CROSS JOIN nn LEFT JOIN c2 ON c2.node = d.node)
SELECT node, deg, CAST(r AS BIGINT) AS rank_scaled FROM r2
"""


def q_bigram_associations(sf_dir: str):
    """Exact positive-PMI collocations: p(ab) > p(a)p(b) cross-multiplied
    to pure integers (n_ab*N^2 > n_a*n_b*N2) — no logs, hash-identical
    flags (textstats.bigram_association; vocabulary-shaped exchanges +
    two partitioned hash joins, nothing broadcast)."""
    from vaero_ray.stages.textstats import bigram_association

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bigram_association(ds, min_count=5, num_buckets=8)


SQL_BIGRAM_ASSOC = r"""
WITH t AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
u AS (SELECT UNNEST(toks) AS tok FROM t),
tc AS (SELECT tok, COUNT(*) AS n FROM u GROUP BY 1),
nn AS (SELECT SUM(n) AS n_tok FROM tc),
bg AS (SELECT UNNEST([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]) AS b FROM t),
bc AS (SELECT b, COUNT(*) AS n_ab FROM bg GROUP BY 1),
n2 AS (SELECT SUM(n_ab) AS n_big FROM bc),
f AS (SELECT split_part(b, ' ', 1) AS tok_a, split_part(b, ' ', 2) AS tok_b, n_ab
      FROM bc WHERE n_ab >= 5)
SELECT f.tok_a, f.tok_b, CAST(f.n_ab AS BIGINT) AS n_ab,
       CAST(a.n AS BIGINT) AS n_a, CAST(c.n AS BIGINT) AS n_b,
       CAST(CASE WHEN f.n_ab * nn.n_tok * nn.n_tok > a.n * c.n * n2.n_big
                 THEN 1 ELSE 0 END AS BIGINT) AS assoc
FROM f JOIN tc a ON a.tok = f.tok_a JOIN tc c ON c.tok = f.tok_b
CROSS JOIN nn CROSS JOIN n2
"""


def q_sft_examples(sf_dir: str):
    """The transcripts -> training-data materialization: per assistant
    turn, the previous <= 3 turns rendered 'role: text' joined by
    newlines as CONTEXT, the turn's text as TARGET — the SFT example
    builder (stitch.sft_examples: stateless part render, one conv
    exchange, k constant shifted-array joins in the bucket)."""
    from vaero_ray.pipelines.derived import derive_transcripts
    from vaero_ray.stages.stitch import sft_examples

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    )
    return sft_examples(ds, n_context=3)


SQL_SFT_EXAMPLES = f"""
WITH {TRANSCRIPTS_CTE},
l AS (SELECT conv_id, turn_idx, role, text, role || ': ' || text AS part FROM transcripts)
SELECT conv_id, turn_idx,
       string_agg(part, chr(10)) OVER (PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS context,
       text AS target
FROM l QUALIFY role = 'assistant' AND turn_idx > 0
"""


def q_longest_type_streak(sf_dir: str):
    """Gaps-and-islands CEP: the longest consecutive same-event_type
    streak per user (retry storms / crawler bursts), the SQL rn - rn2
    islands trick vectorized in one bucket kernel
    (cep.longest_run_per_key); ties run_len desc then value asc."""
    from vaero_ray.stages.cep import longest_run_per_key

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "event_id"]
    )
    out = longest_run_per_key(
        ds, key="user_id", value_col="event_type", order=["ts", "event_id"],
        num_buckets=16,
    )
    return out.rename_columns({"value": "event_type"})


SQL_LONGEST_STREAK = """
WITH o AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS island
  FROM events
),
runs AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS run_len
         FROM o GROUP BY user_id, event_type, island)
SELECT user_id, event_type, run_len FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY run_len DESC, event_type) AS rk
  FROM runs) WHERE rk = 1
"""


_CHANGELOG_CUTOFF = "2024-01-15"


def q_user_state_changelog(sf_dir: str):
    """CDC / snapshot maintenance: a base snapshot (latest per-user state
    before the cutoff) plus a changelog (post-cutoff events; 'error' rows
    are tombstones) compact to the current state in ONE exchange — base
    and changes union into the same compaction shuffle, the winner per
    key is the greatest (ts, event_id), tombstone winners drop the key
    (rowwindow.apply_changelog)."""
    import numpy as np

    from vaero_ray.stages.rowwindow import apply_changelog, compact_latest

    cutoff = np.datetime64(_CHANGELOG_CUTOFF, "us")

    def prep(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "value_cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                "ts": tbl.column("ts"),
                "event_id": tbl.column("event_id"),
                "event_type": tbl.column("event_type"),
            }
        )

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "value", "ts", "event_id", "event_type"],
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def before(tbl: pa.Table) -> pa.Table:
        m = pc.less(tbl.column("ts").cast(pa.timestamp("us")), pa.scalar(cutoff))
        return tbl.filter(m).drop_columns("event_type")

    def after(tbl: pa.Table) -> pa.Table:
        m = pc.greater_equal(tbl.column("ts").cast(pa.timestamp("us")), pa.scalar(cutoff))
        t = tbl.filter(m)
        op = pc.if_else(pc.equal(t.column("event_type"), "error"), "D", "U")
        return t.drop_columns("event_type").append_column("op", op)

    base = compact_latest(
        ds.map_batches(before, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id", order_col="ts", tie_col="event_id", num_buckets=8,
    )
    changes = ds.map_batches(after, batch_format="pyarrow", zero_copy_batch=True)
    return apply_changelog(
        base, changes, key="user_id", order_col="ts", tie_col="event_id",
        num_buckets=8,
    )


SQL_CHANGELOG = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS value_cents,
         ts, event_id,
         CASE WHEN ts >= TIMESTAMP '{_CHANGELOG_CUTOFF}' AND event_type = 'error'
              THEN 'D' ELSE 'U' END AS op
  FROM events
),
last AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rk
    FROM ev) WHERE rk = 1
)
SELECT user_id, value_cents, ts, event_id FROM last WHERE op <> 'D'
"""


def q_conversation_sft_pipeline(sf_dir: str):
    """The transcript-tier CAPSTONE — the full conversations ->
    training-data story in one pipeline: conversation-level exact dedup
    (order-sensitive mergeable fingerprint over event-id-stripped text,
    keep-min survivor), turn-taking quality filter (< 20% same-role
    adjacent violations), then SFT example assembly (previous <= 3 turns
    as context per assistant turn) restricted to the surviving
    well-formed conversations via a semi join. Composes convstats +
    stitch + joins; every stage SQL-mirrored."""
    from vaero_ray.pipelines.derived import derive_transcripts
    from vaero_ray.stages.convstats import (
        alternation_stats,
        conv_fingerprint,
        dedup_by_fingerprint,
        turn_hash,
    )
    from vaero_ray.stages.joins import semi_join
    from vaero_ray.stages.keyed import compact_small_blocks
    from vaero_ray.stages.stitch import sft_examples

    tr = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    ).materialize()

    def hash_stage(tbl: pa.Table) -> pa.Table:
        stripped = pc.replace_substring_regex(tbl.column("text"), r"^event \d+ ", "")
        tmp = turn_hash(pa.table({"__t": stripped}), "__t")
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "turn_idx": tbl.column("turn_idx"),
                "th": tmp.column("th"),
            }
        )

    hashed = tr.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    surv = dedup_by_fingerprint(conv_fingerprint(hashed, order="turn_idx"))
    surv_ids = surv.select_columns(["conv_id"])

    viol = alternation_stats(
        tr.select_columns(["conv_id", "role", "turn_idx"]), order="turn_idx"
    )

    def ok_filter(tbl: pa.Table) -> pa.Table:
        keep = pc.less_equal(
            pc.multiply(tbl.column("n_violations"), pa.scalar(5, pa.int64())),
            tbl.column("n_turns"),
        )
        return tbl.filter(keep).select(["conv_id"])

    ok_ids = viol.map_batches(ok_filter, batch_format="pyarrow", zero_copy_batch=True)
    allowed = compact_small_blocks(
        semi_join(surv_ids, ok_ids, "conv_id", num_buckets=8).materialize()
    )

    examples = sft_examples(tr, n_context=3)
    return semi_join(examples, allowed, "conv_id", num_buckets=8)


SQL_CONV_SFT_PIPELINE = f"""
WITH {TRANSCRIPTS_CTE},
s AS (
  SELECT conv_id, turn_idx,
    lower(regexp_replace(regexp_replace(text, '^event \\d+ ', ''), '\\s+', ' ', 'g')) AS norm
  FROM transcripts
),
h AS (
  SELECT conv_id, turn_idx,
    CASE WHEN length(norm) = 0 THEN 0 ELSE
      list_reduce([CAST(unicode(substr(norm, CAST(i AS INT), 1)) AS BIGINT)
                   FOR i IN range(1, length(norm)+1)],
                  (a,c) -> (a*31+c) % 2147483647) END AS th
  FROM s
),
t AS (
  SELECT conv_id,
    ((th + 1) * list_reduce([CAST(1 AS BIGINT)] ||
        [CAST(131 AS BIGINT) FOR i IN range(1, turn_idx + 1)],
        (a,c) -> (a*c) % 2147483647)) % 2147483647 AS term
  FROM h
),
f AS (
  SELECT conv_id, COUNT(*) AS n_turns,
         CAST(SUM(term) % 2147483647 AS BIGINT) AS conv_fp
  FROM t GROUP BY conv_id
),
surv AS (SELECT MIN(conv_id) AS conv_id FROM f GROUP BY conv_fp, n_turns),
lv AS (
  SELECT conv_id,
         CASE WHEN role = LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
              THEN 1 ELSE 0 END AS v
  FROM transcripts
),
ok AS (SELECT conv_id FROM lv GROUP BY conv_id HAVING SUM(v) * 5 <= COUNT(*)),
allowed AS (SELECT conv_id FROM surv JOIN ok USING (conv_id)),
parts AS (SELECT conv_id, turn_idx, role, text, role || ': ' || text AS part
          FROM transcripts),
sftl AS (
  SELECT conv_id, turn_idx,
         string_agg(part, chr(10)) OVER (PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS context,
         text AS target, role
  FROM parts
)
SELECT conv_id, turn_idx, context, target
FROM sftl JOIN allowed USING (conv_id)
WHERE role = 'assistant' AND turn_idx > 0
"""


def q_streaming_value_quantile(sf_dir: str):
    """STREAMING per-window quantile sketch: log-histogram registers AS
    ROWS through the exactly-once windowed machinery (the same
    composition as streaming_hll_distinct) — a stateless per-event
    (bin) map, then the standard tumbling job keyed by bin with a count
    aggregate; window quantile bounds derive from the committed
    registers downstream. Registers are sum-mergeable, so partials
    merge associatively across epochs with zero new streaming
    machinery."""
    import os
    import shutil

    from vaero_ray.stages.sketch import lhq_bins
    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(sf_dir, "value_quantile_in", ["ts", "value"])
    base = os.path.dirname(ind)

    def pre(ds: rd.Dataset) -> rd.Dataset:
        def per_batch(tbl: pa.Table) -> pa.Table:
            v = tbl.column("value").to_numpy(zero_copy_only=False)
            cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {"ts": tbl.column("ts"), "bin": pa.array(lhq_bins(cents), pa.int64())}
            )

        return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)

    out_d, ckpt_d = f"{base}/value_quantile_out", f"{base}/value_quantile_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["bin"],
        aggs=[AggSpec(None, "count", "cnt")],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,
        num_partitions=4,
        transform=pre,
    )
    job.run()
    return job.committed_output()


SQL_STREAMING_VALUE_QUANTILE = r"""
WITH c AS (
  SELECT ts, CAST(floor(value*100 + 0.5) AS BIGINT) AS v FROM events),
b AS (
  SELECT ts, v, CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS bl FROM c)
SELECT CAST(CASE WHEN v < 8 THEN v
            ELSE (bl << 3) | ((v >> greatest(bl - 4, 0)) & 7) END AS BIGINT) AS bin,
       date_trunc('hour', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1, 2
"""


def q_preference_pairs(sf_dir: str):
    """DPO/RLHF preference-pair assembly over the derived transcripts:
    every (user turn -> immediately-following assistant turn) adjacency
    is a candidate response to the user turn's prompt key (the ``k``
    field embedded in the text); per prompt key the longest response is
    ``chosen`` and the shortest ``rejected`` (opposed deterministic
    tie-breaks on the response event id). Adjacency derives INSIDE one
    conv-bucket kernel over the stateless transcript derivation (no
    turn-numbering shuffle); pairing is the two-phase bounded-exchange
    ``preference_pairs`` operator (stages/preference.py)."""
    import pandas as pd

    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.keyed import bucketed_map_groups
    from vaero_ray.stages.preference import preference_pairs

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    def pre(tbl: pa.Table) -> pa.Table:
        txt = tbl.column("text")
        pk = pc.struct_field(pc.extract_regex(txt, r'"k": (?P<k>\d+)'), "k")
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "role": tbl.column("role"),
                "ts": tbl.column("ts"),
                "event_id": tbl.column("event_id"),
                "pk": pc.fill_null(pc.cast(pk, pa.int64()), -1),
                "tlen": pc.cast(pc.utf8_length(txt), pa.int64()),
            }
        )

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        # (ts, event_id) order inside a conv == turn_idx order by
        # construction — adjacency without the numbering shuffle
        df = df.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
        conv = df["conv_id"].to_numpy()
        role = df["role"].to_numpy()
        pk = df["pk"].to_numpy()
        m = (
            (conv[1:] == conv[:-1])
            & (role[:-1] == "user")
            & (role[1:] == "assistant")
            & (pk[:-1] >= 0)
        )
        return pd.DataFrame(
            {
                "prompt_key": pk[:-1][m],
                "resp_id": df["event_id"].to_numpy()[1:][m],
                "score": df["tlen"].to_numpy()[1:][m],
            }
        )

    pre_ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    cand = bucketed_map_groups(pre_ds, "conv_id", candidates)
    return preference_pairs(cand, "prompt_key", "score", "resp_id")


SQL_PREFERENCE_PAIRS = rf"""
WITH {TRANSCRIPTS_CTE},
seq AS (
  SELECT conv_id, role, text,
         lead(role) OVER w AS nrole, lead(text) OVER w AS ntext
  FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
cand AS (
  SELECT TRY_CAST(regexp_extract(text, '"k": (\d+)', 1) AS BIGINT) AS prompt_key,
         CAST(regexp_extract(ntext, '^event (\d+) ', 1) AS BIGINT) AS resp_id,
         CAST(length(ntext) AS BIGINT) AS score
  FROM seq WHERE role = 'user' AND nrole = 'assistant'),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY prompt_key ORDER BY score DESC, resp_id ASC) AS rc,
         ROW_NUMBER() OVER (PARTITION BY prompt_key ORDER BY score ASC, resp_id DESC) AS rr
  FROM cand WHERE prompt_key IS NOT NULL AND prompt_key >= 0)
SELECT prompt_key,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       MAX(CASE WHEN rc = 1 THEN resp_id END) AS chosen_id,
       MAX(CASE WHEN rc = 1 THEN score END) AS chosen_score,
       MAX(CASE WHEN rr = 1 THEN resp_id END) AS rejected_id,
       MAX(CASE WHEN rr = 1 THEN score END) AS rejected_score,
       MAX(CASE WHEN rc = 1 THEN score END) - MAX(CASE WHEN rr = 1 THEN score END) AS margin
FROM r GROUP BY prompt_key HAVING COUNT(*) >= 2
"""


_MIXTURE_WEIGHTS = {"src0": 5, "src1": 3, "src2": 2}


def q_mixture_resample(sf_dir: str):
    """Exact-proportion corpus mixing (stages/corpus.resample_to_mixture):
    the largest sub-corpus at 5:3:2 across three sources, survivors the
    smallest-(hll_hash, id) rows per stratum. Counts pass + one bounded
    prune/shuffle selection."""
    from vaero_ray.stages.corpus import resample_to_mixture

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return resample_to_mixture(ds, "doc_id", "source", _MIXTURE_WEIGHTS)


# the limiting stratum (lim) is the lexicographically-first argmin of
# n/wt, compared in integers (b.n*a.wt vs a.n*b.wt) — same rule as the
# Fraction-based driver math in resample_to_mixture
SQL_MIXTURE = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
w AS (SELECT * FROM (VALUES ('src0', 5), ('src1', 3), ('src2', 2)) AS t(source, wt)),
c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
cw AS (SELECT c.source, c.n, w.wt FROM c JOIN w USING (source) WHERE c.n > 0),
lim AS (SELECT a.n AS cm, a.wt AS wm FROM cw a
        WHERE NOT EXISTS (SELECT 1 FROM cw b
              WHERE b.n * a.wt < a.n * b.wt
                 OR (b.n * a.wt = a.n * b.wt AND b.source < a.source))),
q AS (SELECT cw.source, CAST((lim.cm * cw.wt) // lim.wm AS BIGINT) AS quota FROM cw, lim),
h1 AS (SELECT doc_id, source,
  CAST(((A * ((CASE WHEN doc_id < 0
       THEN CAST(doc_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
       ELSE CAST(doc_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM documents, m),
h2 AS (SELECT doc_id, source,
  CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) AS hv
  FROM h1, m),
r AS (SELECT h2.*, ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn FROM h2)
SELECT r.doc_id, r.source FROM r JOIN q USING (source) WHERE r.rn <= q.quota
"""


def _fmt_mixture_sql() -> str:
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    return SQL_MIXTURE.format(
        A=int(HLL_A), B=int(HLL_B), A2=int(HLL_A2), B2=int(HLL_B2), XS=HLL_XS
    )


SQL_MIXTURE = _fmt_mixture_sql()


def q_docs_length_band(sf_dir: str):
    """Sketch -> filter composition: keep documents inside the
    [5%, 95%] length band resolved from the log-histogram quantile
    sketch (bin-resolution bounds; stages/sketch.quantile_band_filter).
    The standard drop-the-length-outliers curation stage, with the
    band derived FROM the data rather than hand-tuned."""
    from vaero_ray.stages.sketch import quantile_band_filter

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    return quantile_band_filter(ds, "n_chars", 50, 950)


SQL_LENGTH_BAND = r"""
WITH b AS (
  SELECT n_chars,
         CASE WHEN n_chars < 8 THEN n_chars
              ELSE (length(bin(n_chars)) << 3)
                   | ((n_chars >> greatest(length(bin(n_chars)) - 4, 0)) & 7) END AS bin
  FROM documents),
h AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY 1),
cum AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum,
               (SELECT SUM(cnt) FROM h) AS n
        FROM h),
blo AS (SELECT MIN(bin) AS b FROM cum WHERE cum >= ((50 * n + 999) // 1000)),
bhi AS (SELECT MIN(bin) AS b FROM cum WHERE cum >= ((950 * n + 999) // 1000)),
bounds AS (
  SELECT CASE WHEN blo.b < 8 THEN blo.b
              ELSE ((8 + (blo.b & 7)) << greatest((blo.b >> 3) - 4, 0)) END AS lo,
         CASE WHEN bhi.b < 8 THEN bhi.b + 1
              ELSE ((8 + (bhi.b & 7)) << greatest((bhi.b >> 3) - 4, 0))
                   + (CAST(1 AS BIGINT) << greatest((bhi.b >> 3) - 4, 0)) END AS hi
  FROM blo, bhi)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d, bounds WHERE d.n_chars >= bounds.lo AND d.n_chars < bounds.hi
"""


def q_user_value_ewma(sf_dir: str):
    """Per-user integer-exact EWMA of event value (cents fixed-point,
    alpha = 0.30) over the (ts, event_id)-ordered stream — the decayed
    per-entity signal (fraud/engagement scoring) that a mergeable
    aggregate cannot express (floor-div fold is non-associative); see
    stages/cep.ordered_ewma for the rank-step vectorization."""
    from vaero_ray.stages.cep import ordered_ewma

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def cents(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "ts": tbl.column("ts"),
                "event_id": tbl.column("event_id"),
                "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return ordered_ewma(ds, "user_id", "ts", "cents", "event_id", 30, 100, out="ewma_cents")


SQL_USER_EWMA = r"""
WITH c AS (SELECT user_id, ts, event_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
l AS (SELECT user_id, list(v ORDER BY ts, event_id) AS lv FROM c GROUP BY 1)
SELECT user_id, CAST(len(lv) AS BIGINT) AS n_events,
       CAST(list_reduce(lv, (a, x) -> (30 * x + 70 * a) // 100) AS BIGINT) AS ewma_cents
FROM l
"""


def q_source_similarity(sf_dir: str):
    """Corpus-overlap scan: pairwise estimated Jaccard between every
    pair of sources from ONE grouped-minhash pass (register-sized
    exchange; stages/sourcesim.py) instead of a cross-corpus pairwise
    join. SQL twin recomputes the identical signature (char-poly mod
    M31 shingle hash, (a*h+b) mod M31 perms, min per source)."""
    from vaero_ray.stages.sourcesim import source_similarity

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return source_similarity(ds, "source", "text")


def _fmt_source_sim_sql() -> str:
    from vaero_ray.stages.sourcesim import NUM_PERM, SS_A, SS_B

    perms = ", ".join(
        f"({j}, {int(SS_A[j])}, {int(SS_B[j])})" for j in range(NUM_PERM)
    )
    return rf"""
WITH t AS (SELECT source,
                  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
g AS (SELECT source, array_to_string(toks[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS sh
      FROM t, UNNEST(range(1, len(toks) - 1)) AS r(i)),
h AS (SELECT source,
             list_reduce([CAST(unicode(substr(sh, CAST(i AS INT), 1)) AS BIGINT)
                          FOR i IN range(1, 1 + length(sh))],
                         (a, c) -> (a * 31 + c) % 2147483647) AS hv
      FROM g),
p AS (SELECT CAST(j AS BIGINT) AS j, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
      FROM (VALUES {perms}) AS v(j, a, b)),
s AS (SELECT source, p.j, MIN((p.a * h.hv + p.b) % 2147483647) AS sig
      FROM h, p GROUP BY 1, 2)
SELECT x.source AS group_a, y.source AS group_b,
       CAST(COUNT(*) FILTER (WHERE x.sig = y.sig) AS BIGINT) AS n_agree,
       CAST((COUNT(*) FILTER (WHERE x.sig = y.sig)) * 1000 // {NUM_PERM} AS BIGINT)
         AS est_permille
FROM s x JOIN s y ON x.j = y.j AND x.source < y.source
GROUP BY 1, 2
"""


SQL_SOURCE_SIM = _fmt_source_sim_sql()


def q_streaming_user_ewma(sf_dir: str):
    """STREAMING ordered per-key fold: the integer EWMA of
    ``user_value_ewma`` computed over arrival chunks by
    ``StreamingFoldJob`` — events fold only once the watermark proves
    their event-time position final; a carried (key, acc, n) accumulator
    rides the state snapshot between epochs; rows inside the lateness
    horizon buffer. Emission at finalize == the batch operator's rows,
    so the gate shares SQL_USER_EWMA verbatim (stream == batch parity
    for a NON-mergeable fold — the class of op the keyed-aggregate
    streaming path cannot express)."""
    import os
    import shutil

    from vaero_ray.streaming.fold_job import StreamingFoldJob

    ind = _stream_chunks(sf_dir, "ewma_in", ["ts", "event_id", "user_id", "value"])
    base = os.path.dirname(ind)

    def pre(ds: rd.Dataset) -> rd.Dataset:
        def per_batch(tbl: pa.Table) -> pa.Table:
            v = tbl.column("value").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "user_id": tbl.column("user_id"),
                    "ts": tbl.column("ts"),
                    "event_id": tbl.column("event_id"),
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64()),
                }
            )

        return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)

    out_d, ckpt_d = f"{base}/ewma_out", f"{base}/ewma_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingFoldJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        val_col="cents",
        alpha_num=30,
        alpha_den=100,
        out_val="ewma_cents",
        allowed_lateness_s=3600,
        num_partitions=4,
        transform=pre,
    )
    job.run()
    return job.committed_output()


def q_dedup_against_reference(sf_dir: str):
    """Incremental dedup of a NEW shard against a FROZEN reference
    corpus (the new-crawl-vs-previous-crawls production step): 'new' =
    the hash_split train docs, 'reference' = the val docs; a new doc is
    dropped when its opening-boilerplate fingerprint (char-poly hash of
    the first-2-token prefix) already appears in the reference. Anti
    semi-join on the int64 fingerprint — the reference side shrinks to
    distinct keys before the one exchange, no payload moves."""
    from vaero_ray.stages.convstats import turn_hash
    from vaero_ray.stages.dedup import _flat_tokens
    from vaero_ray.stages.joins import semi_join
    from vaero_ray.stages.sketch import hash_split

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fingerprint(tbl: pa.Table) -> pa.Table:
        toks, off = _flat_tokens(tbl, "text")
        n = tbl.num_rows
        counts = off[1:] - off[:-1]
        if len(toks):
            last = len(toks) - 1
            t0 = pc.take(toks, pa.array(np.minimum(off[:-1], last)))
            t1 = pc.take(toks, pa.array(np.minimum(off[:-1] + 1, last)))
            sep = pa.scalar(" ", type=t0.type)
            both = pc.binary_join_element_wise(t0, t1, sep)
            pfx = pc.if_else(
                pa.array(counts >= 2), both, pc.if_else(pa.array(counts >= 1), t0, "")
            )
        else:
            pfx = pa.array([""] * n, pa.string())
        h = turn_hash(pa.table({"__t": pc.cast(pfx, pa.string())}), "__t", "h").column("h")
        return pa.table({"doc_id": tbl.column("doc_id"), "pfx_hash": h})

    keyed = hash_split(
        ds.map_batches(fingerprint, batch_format="pyarrow", zero_copy_batch=True), "doc_id"
    )

    def pick(which: str):
        def fn(tbl: pa.Table) -> pa.Table:
            t = tbl.filter(pc.equal(tbl.column("split"), which))
            return t.select(["doc_id", "pfx_hash"]) if which == "train" else t.select(["pfx_hash"])

        return fn

    new = keyed.map_batches(pick("train"), batch_format="pyarrow", zero_copy_batch=True)
    ref = keyed.map_batches(pick("val"), batch_format="pyarrow", zero_copy_batch=True)
    return semi_join(new, ref, "pfx_hash", anti=True)


SQL_DEDUP_AGAINST_REF = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
t AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
      FROM documents),
p AS (SELECT doc_id, array_to_string(toks[1:2], ' ') AS pfx FROM t),
hh AS (SELECT doc_id,
              CASE WHEN length(pfx) = 0 THEN 0
                   ELSE list_reduce([CAST(unicode(substr(pfx, CAST(i AS INT), 1)) AS BIGINT)
                                     FOR i IN range(1, 1 + length(pfx))],
                                    (a, c) -> (a * 31 + c) % 2147483647) END AS pfx_hash
       FROM p),
h1 AS (SELECT doc_id, pfx_hash,
  CAST(((A * ((CASE WHEN doc_id < 0
       THEN CAST(doc_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
       ELSE CAST(doc_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM hh, m),
sp AS (SELECT doc_id, pfx_hash,
  CASE WHEN CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT)
            % 1000 < 900 THEN 'train' ELSE 'val' END AS split
  FROM h1, m)
SELECT n.doc_id, n.pfx_hash FROM sp n
WHERE n.split = 'train'
  AND NOT EXISTS (SELECT 1 FROM sp r WHERE r.split = 'val' AND r.pfx_hash = n.pfx_hash)
"""


def _fmt_dedup_ref_sql() -> str:
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    return SQL_DEDUP_AGAINST_REF.format(
        A=int(HLL_A), B=int(HLL_B), A2=int(HLL_A2), B2=int(HLL_B2), XS=HLL_XS
    )


SQL_DEDUP_AGAINST_REF = _fmt_dedup_ref_sql()


def q_inverted_index(sf_dir: str):
    """Posting-list inverted index over the corpus vocabulary
    (textstats.inverted_index): term -> (df, ascending doc-id posting
    string), terms with 2 <= df <= 500 — per-block distinct (doc, term)
    pairs dedup BEFORE the one term-bucketed exchange; df bounds apply
    inside the bucket where df is global. The retrieval-side primitive
    backing contamination / search ops (extension; no reference index)."""
    from vaero_ray.stages.textstats import inverted_index

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return inverted_index(ds, min_df=2, max_df=500, num_buckets=16)


SQL_INVERTED_INDEX = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS term
  FROM documents),
pairs AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY term
HAVING COUNT(*) BETWEEN 2 AND 500
"""


def q_near_dedup_docs(sf_dir: str):
    """The END-TO-END near-dedup a corpus pipeline actually ships: dup
    EDGES (word-3-gram true-Jaccard >= 0.5, the ``minhash_dup_edges``
    pipeline) -> connected components -> keep each cluster's min doc_id
    plus all unclustered docs, anti-semi-joined back onto the corpus.
    Composition of three already-verified stages in their 100-TB shapes
    (keys-only CC labels; the anti join ships only loser doc_ids)."""
    from vaero_ray.stages.graph import connected_components
    from vaero_ray.stages.joins import semi_join

    text = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    edges = ngram_jaccard_dups(text, shingle_k=3, threshold=0.5, unit="word")
    labels = connected_components(edges, a_col="doc_id", b_col="dup_of")

    def losers(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:  # empty shuffle partitions carry no columns
            return pa.table({"doc_id": pa.array([], pa.int64())})
        keep = pc.invert(pc.equal(tbl.column("doc_id"), tbl.column("cluster")))
        return tbl.filter(keep).select(["doc_id"])

    lose = labels.map_batches(losers, batch_format="pyarrow", zero_copy_batch=True)
    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return semi_join(docs, lose, keys="doc_id", anti=True)


SQL_NEAR_DEDUP = f"""
WITH RECURSIVE dup_pairs AS ({SQL_MINHASH_WORD}),
dup_edges AS (SELECT doc_id AS src, dup_of AS dst FROM dup_pairs
              UNION SELECT dup_of, doc_id FROM dup_pairs),
dup_nodes AS (SELECT DISTINCT src AS node FROM dup_edges),
reach(node, m) AS (
  SELECT node, node FROM dup_nodes
  UNION
  SELECT r.node, de.dst FROM reach r JOIN dup_edges de ON de.src = r.m
),
labels AS (SELECT node AS doc_id, MIN(m) AS cluster FROM reach GROUP BY 1)
SELECT d.doc_id, d.source FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> cluster)
"""


def q_brand_promo_revenue(sf_dir: str):
    """Part-dimension revenue rollup (TPC-H-Q14-family shape): revenue
    and line count per p_brand for PROMO-type parts. The part side is
    runtime-filtered then ``auto_join``-sized (broadcast at toy SF,
    partitioned-hash where the brand dimension outgrows the threshold);
    line revenue fixed-points to integer cents PER LINE before any sum
    (identical float64 chain both engines), and the lineitem side
    pre-collapses per (block, partkey) so the fact exchange ships
    partial sums, not line items."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    from vaero_ray.stages.joins import auto_join

    def promo_parts(tbl: _pa.Table) -> _pa.Table:
        t = tbl.filter(_pc.equal(tbl.column("p_type"), "PROMO"))
        return _pa.table({"l_partkey": t.column("p_partkey"), "p_brand": t.column("p_brand")})

    parts = _read_pq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type", "p_brand"]
    ).map_batches(promo_parts, batch_format="pyarrow", zero_copy_batch=True)

    def line_partial(tbl: _pa.Table) -> _pa.Table:
        cents = _pc.cast(
            _pc.floor(
                _pc.add(
                    _pc.multiply(
                        _pc.multiply(
                            tbl.column("l_extendedprice"),
                            _pc.subtract(_pa.scalar(1.0), tbl.column("l_discount")),
                        ),
                        _pa.scalar(100.0),
                    ),
                    _pa.scalar(0.5),
                )
            ),
            _pa.int64(),
        )
        g = (
            _pa.table({"l_partkey": tbl.column("l_partkey"), "cents": cents})
            .group_by("l_partkey")
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        return _pa.table(
            {
                "l_partkey": g.column("l_partkey"),
                "rev": g.column("cents_sum"),
                "n": g.column("cents_count").cast(_pa.int64()),
            }
        )

    line = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(line_partial, batch_format="pyarrow", zero_copy_batch=True)

    joined = auto_join(line, parts, keys="l_partkey")
    return joined.groupby("p_brand").aggregate(
        Sum("rev", alias_name="revenue_cents"), Sum("n", alias_name="n_lines")
    )


SQL_BRAND_PROMO_REVENUE = r"""
SELECT p.p_brand,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_type = 'PROMO'
GROUP BY 1
"""


def q_streaming_user_state(sf_dir: str):
    """STREAMING CDC compaction: the current per-user state (last value
    by event time; 'error' events are tombstones that DROP the user)
    maintained incrementally over arrival chunks by ``StreamingFoldJob``
    with alpha = 1/1 — the ordered-fold identity ``acc = v`` makes the
    carried accumulator exactly the per-key LAST value, so the CDC
    changelog-apply op rides the existing exactly-once fold machinery
    with zero new streaming code. Tombstone-ness rides the value lane
    (live = 2*cents, tombstone = 1); a stateless post-filter drops keys
    whose final state is a tombstone."""
    import os
    import shutil

    from vaero_ray.streaming.fold_job import StreamingFoldJob

    ind = _stream_chunks(sf_dir, "cdc_in", ["ts", "event_id", "user_id", "value", "event_type"])
    base = os.path.dirname(ind)

    def pre(ds: rd.Dataset) -> rd.Dataset:
        def per_batch(tbl: pa.Table) -> pa.Table:
            v = tbl.column("value").to_numpy(zero_copy_only=False)
            cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
            tomb = np.asarray(pc.equal(tbl.column("event_type"), "error"))
            enc = np.where(tomb, np.int64(1), cents * 2)
            return pa.table(
                {
                    "user_id": tbl.column("user_id"),
                    "ts": tbl.column("ts"),
                    "event_id": tbl.column("event_id"),
                    "enc": pa.array(enc, pa.int64()),
                }
            )

        return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)

    out_d, ckpt_d = f"{base}/cdc_out", f"{base}/cdc_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingFoldJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        val_col="enc",
        alpha_num=1,
        alpha_den=1,
        out_val="enc",
        allowed_lateness_s=3600,
        num_partitions=4,
        transform=pre,
    )
    job.run()

    def decode(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "state_cents": pa.array([], pa.int64()),
                }
            )
        enc = tbl.column("enc").to_numpy(zero_copy_only=False)
        live = (enc % 2) == 0
        t = tbl.filter(pa.array(live))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_events": t.column("n_events"),
                "state_cents": pa.array(
                    t.column("enc").to_numpy(zero_copy_only=False) // 2, pa.int64()
                ),
            }
        )

    return job.committed_output().map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_STREAMING_USER_STATE = r"""
WITH ranked AS (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS state_cents
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


def q_streaming_enriched_agg(sf_dir: str):
    """STREAMING dimension enrichment (the stream-enrichment production
    op: events x slowly-changing dim): each arrival chunk is joined to
    the customer market-segment dim INSIDE the epoch transform via a
    ``ray.put``-broadcast sorted-key lookup (read zero-copy per task —
    never re-shipped per batch), then the enriched rows ride the
    standard exactly-once tumbling window aggregate. Unmatched users map
    to 'UNKNOWN' (left-outer semantics). At 100 TB the dim broadcast is
    the documented small-side pattern; a dim too big to broadcast would
    use the hash_join stage pre-window instead."""
    import os
    import shutil

    import ray as _ray

    from vaero_ray.streaming import StreamingWindowedJob

    dim = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    dim = dim.take(pc.sort_indices(dim, sort_keys=[("c_custkey", "ascending")]))
    lut_ref = _ray.put(
        (
            dim.column("c_custkey").to_numpy().astype(np.int64),
            np.asarray(dim.column("c_mktsegment"), dtype=object),
        )
    )

    def pre(ds: rd.Dataset) -> rd.Dataset:
        def enrich(tbl: pa.Table) -> pa.Table:
            k, s = _ray.get(lut_ref)
            uid = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.minimum(np.searchsorted(k, uid), len(k) - 1)
            ok = k[idx] == uid
            seg = np.where(ok, s[idx], "UNKNOWN")
            v = tbl.column("value").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "segment": pa.array(seg, pa.string()),
                    "ts": tbl.column("ts"),
                    "value": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64()),
                }
            )

        return ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)

    ind = _stream_chunks(sf_dir, "enrich_in", ["ts", "user_id", "value"])
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/enrich_out", f"{base}/enrich_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["segment"],
        aggs=[AggSpec(None, "count", "n_events"), AggSpec("value", "sum", "sum_value_cents")],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,  # arrival chunks are ts-sorted
        num_partitions=4,
        transform=pre,
    )
    job.run()
    return job.committed_output()


SQL_STREAMING_ENRICHED = """
SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
       date_trunc('hour', e.ts) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def q_supplier_nation_balance(sf_dir: str):
    """Supplier-dimension rollup (completes gate coverage of every
    testdata table): account-balance cents and supplier count per
    nation. The 25-row nation dim broadcasts (driver-side read +
    broadcast_join — the canonical small-side pattern); balances
    fixed-point to integer cents per row before the two-phase sum."""
    from ray.data.aggregate import Count, Sum

    from vaero_ray.stages.joins import broadcast_join

    nat = (
        pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
        .rename_columns(["s_nationkey", "n_name"])
    )

    def cents(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_nationkey": tbl.column("s_nationkey").cast(pa.int32()),
                "bal": pc.cast(
                    pc.floor(pc.add(pc.multiply(tbl.column("s_acctbal"), 100.0), 0.5)),
                    pa.int64(),
                ),
            }
        )

    sup = _read_pq(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    joined = broadcast_join(sup, nat, keys="s_nationkey")
    return joined.groupby("n_name").aggregate(
        Sum("bal", alias_name="acctbal_cents"), Count(alias_name="n_suppliers")
    )


SQL_SUPPLIER_NATION_BALANCE = r"""
SELECT n.n_name,
       CAST(SUM(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents,
       COUNT(*) AS n_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1
"""


def q_conv_tool_calls(sf_dir: str):
    """Agentic tool-call adjacency over transcripts: per conversation,
    count of assistant -> tool adjacent turn pairs (the tool-invocation
    micro-pattern; uses the transcript ``tool``-role lane the input_hint
    mandates). Same one-shuffle kernel family as conv_role_violations
    (convstats.pair_pattern_stats)."""
    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.convstats import pair_pattern_stats

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.select_columns(["conv_id", "role", "ts", "event_id"])
    return pair_pattern_stats(
        ds, key="conv_id", col="role", from_val="assistant", to_val="tool",
        order=["ts", "event_id"], out_col="n_tool_calls",
    )


SQL_CONV_TOOL_CALLS = f"""
WITH {TRANSCRIPTS_CTE}, l AS (
  SELECT conv_id,
         CASE WHEN LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) = 'assistant'
              AND role = 'tool' THEN 1 ELSE 0 END AS hit
  FROM transcripts
)
SELECT conv_id, COUNT(*) AS n_turns, CAST(SUM(hit) AS BIGINT) AS n_tool_calls
FROM l GROUP BY conv_id
"""


def q_query_top_docs(sf_dir: str):
    """Lexical retrieval (the search-time complement of the ANN gates):
    top-10 docs for the bag-of-terms query {hash, join, stream} by
    integer tf-idf — tokens pruned to the query set inside the scan, df
    is a 3-row driver aggregate, per-doc scores need no shuffle, and the
    only exchange is the final sort-limit (textstats.query_topk_docs)."""
    import pyarrow.parquet as _pq

    from vaero_ray.stages.textstats import query_topk_docs

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return query_topk_docs(ds, terms=["hash", "join", "stream"], k=10, n_docs=n_docs)


SQL_QUERY_TOP_DOCS = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS term
  FROM documents),
tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
        WHERE term IN ('hash', 'join', 'stream') GROUP BY 1, 2),
dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1)
SELECT t.doc_id,
       CAST(SUM(t.tf * ((1000 * (SELECT count(*) FROM documents)) // d.df)) AS BIGINT) AS score
FROM tfc t JOIN dfc d USING (term)
GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 10
"""


def q_global_event_seq(sf_dir: str):
    """Global ordered enumeration — ROW_NUMBER() with NO partition
    clause over the full event stream (export numbering): one
    range-partitioning sort, then the pack_sequences-style block-offset
    prefix sum (one metadata row per block to the driver; no row leaves
    its post-sort block). rowwindow.global_row_number."""
    from vaero_ray.stages.rowwindow import global_row_number

    ds = _events(sf_dir, columns=["event_id", "ts", "event_type"])
    out = global_row_number(ds, keys=["ts", "event_id"], out_col="seq")
    return out.select_columns(["event_id", "event_type", "seq"])


SQL_GLOBAL_EVENT_SEQ = r"""
SELECT event_id, event_type,
       CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) AS seq
FROM events
"""


# ------------------------------------------------------------------
# Numerical-statistics tier (stages/numstats.py): one-pass correlation
# matrix, per-group OLS, entropy, exact Gini, Mann-Whitney rank-sum
# ------------------------------------------------------------------

def _lineitem_scaled(sf_dir: str) -> rd.Dataset:
    """Integer-scale the four lineitem measures with the engine-wide
    half-away fixed-point (floor(x*s + 0.5)): qty (integral), price in
    whole dollars, discount/tax in percent points. Headroom: worst Gram
    entry dollars^2 ~ 1.1e10 x 6e5 rows (sf0.1) = 6.6e15 << 2^63."""
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def scale(t: pa.Table) -> pa.Table:
        fx = lambda col, s: pc.cast(  # noqa: E731
            pc.floor(pc.add(pc.multiply(t.column(col), s), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "qty": fx("l_quantity", 1.0),
                "price_usd": fx("l_extendedprice", 1.0),
                "disc_pct": fx("l_discount", 100.0),
                "tax_pct": fx("l_tax", 100.0),
            }
        )

    return ds.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)


def q_lineitem_corr_matrix(sf_dir: str):
    """All pairwise Pearson correlations over the four lineitem measures
    in ONE pass: each block reduces to a single 15-int64 partial (one
    numpy Gram matmul), the merge is a driver-side Dataset.sum — zero
    shuffle, exact integer moments, 6-dp closed-form corr (numstats
    docstring has the full scale shape)."""
    from vaero_ray.stages.numstats import corr_matrix

    return corr_matrix(_lineitem_scaled(sf_dir), ["qty", "price_usd", "disc_pct", "tax_pct"])


SQL_LINEITEM_CORR = r"""
WITH t AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
                  CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS price_usd,
                  CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS disc_pct,
                  CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS tax_pct
           FROM lineitem),
u AS (
  SELECT 'qty' AS col_x, 'price_usd' AS col_y, qty AS x, price_usd AS y FROM t
  UNION ALL SELECT 'qty', 'disc_pct', qty, disc_pct FROM t
  UNION ALL SELECT 'qty', 'tax_pct', qty, tax_pct FROM t
  UNION ALL SELECT 'price_usd', 'disc_pct', price_usd, disc_pct FROM t
  UNION ALL SELECT 'price_usd', 'tax_pct', price_usd, tax_pct FROM t
  UNION ALL SELECT 'disc_pct', 'tax_pct', disc_pct, tax_pct FROM t),
m AS (SELECT col_x, col_y, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
             CAST(sum(x*x) AS BIGINT) AS sum_xx, CAST(sum(y*y) AS BIGINT) AS sum_yy,
             CAST(sum(x*y) AS BIGINT) AS sum_xy
      FROM u GROUP BY 1, 2)
SELECT col_x, col_y, n_rows, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
       CASE WHEN (CAST(n_rows AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x)
               * (CAST(n_rows AS DOUBLE) * sum_yy - CAST(sum_y AS DOUBLE) * sum_y) > 0
            THEN ROUND((CAST(n_rows AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
                       / sqrt((CAST(n_rows AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x)
                            * (CAST(n_rows AS DOUBLE) * sum_yy - CAST(sum_y AS DOUBLE) * sum_y)), 6)
            ELSE NULL END AS corr_xy
FROM m
"""


def q_value_trend_per_type(sf_dir: str):
    """Per-event-type OLS trend of value (cents) on event-time (whole
    hours since epoch): slope/intercept/r2 from the exact grouped
    integer moments — the drift detector over a metric stream. Hours
    (~4.8e5) keep sum_xx ~ 2.3e11 x rows inside int64 at any tested
    scale; closed-form finalize (NOT DuckDB regr_slope, whose streaming
    accumulation differs in low bits)."""
    from vaero_ray.stages.numstats import regression_per_group

    ds = _events(sf_dir, columns=["event_type", "ts", "value"]).map_batches(
        _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
    )

    def add_hours(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        hours = pc.divide(us, 3600000000)  # integer division on int64
        return pa.table(
            {"event_type": t.column("event_type"), "hr": hours, "cents": t.column("value")}
        )

    scaled = ds.map_batches(add_hours, batch_format="pyarrow", zero_copy_batch=True)
    return regression_per_group(scaled, "event_type", "hr", "cents")


SQL_VALUE_TREND = r"""
WITH t AS (SELECT event_type, epoch_us(ts) // 3600000000 AS x,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
           FROM events),
m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
             CAST(sum(x*y) AS BIGINT) AS sxy
      FROM t GROUP BY 1),
f AS (SELECT event_type, n_rows,
             CAST(n_rows AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS num,
             CAST(n_rows AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS dx,
             CAST(n_rows AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS dy,
             CAST(sx AS DOUBLE) AS fsx, CAST(sy AS DOUBLE) AS fsy
      FROM m)
SELECT event_type, n_rows,
       CASE WHEN dx > 0 THEN ROUND(num / dx, 6) END AS slope,
       CASE WHEN dx > 0 THEN ROUND((fsy - (num / dx) * fsx) / n_rows, 6) END AS intercept,
       CASE WHEN dx > 0 AND dy > 0 THEN ROUND(num * num / (dx * dy), 6) END AS r2
FROM f
"""


def q_user_event_entropy(sf_dir: str):
    """Shannon entropy (nats) of each user's event-type mix — the
    behavioral-diversity score: exact integer (user, type) counts
    through two bounded bucketed exchanges; only the final
    ``ln(n) - sum(c ln c)/n`` is float (6-dp, identical expression both
    engines)."""
    from vaero_ray.stages.numstats import entropy_per_group

    return entropy_per_group(
        _events(sf_dir, columns=["user_id", "event_type"]), "user_id", "event_type"
    )


SQL_USER_ENTROPY = r"""
WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)
SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_cats,
       ROUND(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(c * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE), 6) AS entropy
FROM c GROUP BY 1
"""


def q_value_gini_per_type(sf_dir: str):
    """Exact Gini coefficient of event value (cents) per event type
    WITHOUT a row sort: distinct-value compression moves one exact
    (type, cents, count) row per distinct value (~6.6k per type, data
    domain-bounded), the per-type fold is a vectorized cumsum, and the
    numerator stays int64 to the end (tie-invariant closed form — see
    numstats.gini_per_group)."""
    from vaero_ray.stages.numstats import gini_per_group

    ds = _events(sf_dir, columns=["event_type", "value"]).map_batches(
        _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
    )
    return gini_per_group(ds, "event_type", "value")


SQL_VALUE_GINI = r"""
WITH t AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
r AS (SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM t)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_val,
       CAST(SUM((2*rn - n - 1) * v) AS BIGINT) AS gini_num,
       ROUND(CAST(SUM((2*rn - n - 1) * v) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(v) AS DOUBLE)), 6) AS gini
FROM r GROUP BY 1
"""


def q_source_length_ranksum(sf_dir: str):
    """Mann-Whitney rank-sum comparing src0 vs src1 document lengths —
    exact with ties via average-rank DOUBLING (all-integer output:
    2*R1 and 2*U1), distinct-value compressed so the exchange carries
    one row per distinct length (~313 here; domain-bounded by
    contract). The distribution-shift A/B check for corpus QA."""
    from vaero_ray.stages.numstats import rank_sum_test

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return rank_sum_test(ds, "n_chars", "source", "src0", "src1")


SQL_RANKSUM = r"""
WITH t AS (SELECT n_chars AS v, source FROM documents WHERE source IN ('src0', 'src1')),
r AS (SELECT v, source, RANK() OVER (ORDER BY v) AS mn,
             COUNT(*) OVER (PARTITION BY v) AS c
      FROM t)
SELECT CAST(COUNT(*) FILTER (source = 'src0') AS BIGINT) AS n1,
       CAST(COUNT(*) FILTER (source = 'src1') AS BIGINT) AS n2,
       CAST(SUM(2*mn + c - 1) FILTER (source = 'src0') AS BIGINT) AS two_r1,
       CAST(SUM(2*mn + c - 1) FILTER (source = 'src0') AS BIGINT)
         - COUNT(*) FILTER (source = 'src0')
           * (COUNT(*) FILTER (source = 'src0') + 1) AS two_u1
FROM r
"""


# ------------------------------------------------------------------
# Session-7 batch 2: transcript turn-balance / tool outcomes,
# winsorized robust mean, session conversion, RFM scoring
# ------------------------------------------------------------------

def q_conv_turn_balance(sf_dir: str):
    """Per-conversation role balance: turn counts and text volume per
    role lane (user/assistant/tool) — the transcript-health profile
    (one-sided conversations, tool-heavy loops). Stateless per-batch
    indicator partials, ONE bounded keyed exchange; no turn numbering
    needed, so the derivation's row_number shuffle is skipped."""
    import pandas as _pd

    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        ln = df["text"].str.len().astype("int64")
        role = df["role"]
        out = _pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "n_user": (role == "user").astype("int64"),
                "n_assistant": (role == "assistant").astype("int64"),
                "n_tool": (role == "tool").astype("int64"),
                "user_chars": np.where(role == "user", ln, 0),
                "assistant_chars": np.where(role == "assistant", ln, 0),
            }
        )
        return out.groupby("conv_id", sort=False, as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas")
    return bucketed_keyed_sum(
        parts,
        ["conv_id"],
        ["n_user", "n_assistant", "n_tool", "user_chars", "assistant_chars"],
    )


SQL_CONV_TURN_BALANCE = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id,
       CAST(COUNT(*) FILTER (role = 'user') AS BIGINT) AS n_user,
       CAST(COUNT(*) FILTER (role = 'assistant') AS BIGINT) AS n_assistant,
       CAST(COUNT(*) FILTER (role = 'tool') AS BIGINT) AS n_tool,
       CAST(COALESCE(SUM(length(text)) FILTER (role = 'user'), 0) AS BIGINT) AS user_chars,
       CAST(COALESCE(SUM(length(text)) FILTER (role = 'assistant'), 0) AS BIGINT) AS assistant_chars
FROM transcripts GROUP BY 1
"""


def q_tool_followup_roles(sf_dir: str):
    """Tool-outcome profile of the agentic stream: for every tool turn,
    the distribution of what the conversation does NEXT (hand back to
    the assistant, another tool hop, user interjection, or end) grouped
    by tool name — convstats.follow_role_counts, one conv-bucketed
    shuffle + one tiny cell merge."""
    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.convstats import follow_role_counts

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.select_columns(["conv_id", "role", "tool", "ts", "event_id"])
    return follow_role_counts(
        ds, key="conv_id", col="role", from_val="tool", by_col="tool",
        order=["ts", "event_id"],
    )


SQL_TOOL_FOLLOWUP = f"""
WITH {TRANSCRIPTS_CTE}, l AS (
  SELECT tool, role,
         COALESCE(LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx), '<end>') AS next
  FROM transcripts)
SELECT tool, next, CAST(COUNT(*) AS BIGINT) AS n
FROM l WHERE role = 'tool' GROUP BY 1, 2
"""


def q_winsorized_length_stats(sf_dir: str):
    """Per-source winsorized mean length — tails CLAMPED to the exact
    per-group [p05, p95] (vs trimmed_length_stats, which drops them):
    grouped radix-selection quantiles (zero row exchange), clamp bounds
    broadcast once, integer clamped-sum partials through one bounded
    keyed exchange."""
    from vaero_ray.stages.selection import winsorized_stats_per_group

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return winsorized_stats_per_group(ds, "n_chars", "source", 0.05, 0.95)


SQL_WINSORIZED = r"""
WITH q AS (SELECT source,
                  CAST(quantile_disc(n_chars, 0.05) AS BIGINT) AS lo,
                  CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS hi
           FROM documents GROUP BY 1)
SELECT d.source, q.lo, q.hi,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(LEAST(GREATEST(d.n_chars, q.lo), q.hi)) AS BIGINT) AS sum_w,
       CAST(SUM(LEAST(GREATEST(d.n_chars, q.lo), q.hi)) AS DOUBLE) / COUNT(*) AS mean_w
FROM documents d JOIN q USING (source)
GROUP BY 1, 2, 3
"""


def q_session_conversion_rate(sf_dir: str):
    """Session-level funnel outcome per user: gap-1800s sessionization
    (the sessionize_events kernel), per-(user, session) any-purchase
    flag collapsed IN the partial, then two bounded keyed exchanges —
    sessions with a purchase vs sessions total."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.rowwindow import sessionize

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    s = sessionize(ds, "user_id", "ts", "event_id", gap_s=1800)

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame(
            {
                "user_id": df["user_id"],
                "session_id": df["session_id"],
                "p": (df["event_type"] == "purchase").astype("int64"),
            }
        )
        return out.groupby(["user_id", "session_id"], sort=False, as_index=False).max()

    per_sess = bucketed_keyed_sum(
        s.map_batches(partial, batch_format="pandas"),
        ["user_id", "session_id"], ["p"], agg="max",
    )

    def to_counts(df: _pd.DataFrame) -> _pd.DataFrame:
        return _pd.DataFrame(
            {
                "user_id": df["user_id"],
                "n_sessions": np.ones(len(df), np.int64),
                "n_converted": df["p"].astype("int64"),
            }
        )

    return bucketed_keyed_sum(
        per_sess.map_batches(to_counts, batch_format="pandas"),
        ["user_id"], ["n_sessions", "n_converted"],
    )


SQL_SESSION_CONVERSION = r"""
WITH s AS (
  SELECT user_id, event_type,
         SUM(CASE WHEN gap IS NULL OR gap > 1800 * 1000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (SELECT event_id, user_id, event_type, ts,
               epoch_us(ts) - LAG(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events)),
g AS (SELECT user_id, session_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM s GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(p) AS BIGINT) AS n_converted
FROM g GROUP BY 1
"""


def q_user_rfm_scores(sf_dir: str):
    """RFM quintile scoring — the classic audience-segmentation
    composite: exact per-user (recency, frequency, monetary) aggregates,
    then THREE global NTILE(5) rankings via global_row_number (range-
    partitioning sort + block-offset prefix sum — runs on the AGGREGATED
    user table, orders of magnitude smaller than the stream) with
    DESC-by-negation and user_id tiebreak; the closed-form ntile split
    (first n%k tiles one row bigger) reproduces SQL NTILE exactly."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_agg
    from vaero_ray.stages.rowwindow import global_row_number

    ds = _events(sf_dir, columns=["ts", "user_id", "value"]).map_batches(
        _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
    )

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        out = _pd.DataFrame(
            {
                "user_id": df["user_id"],
                "rec_us": us,
                "freq": np.ones(len(df), np.int64),
                "mon": df["value"].astype("int64"),
            }
        )
        return out.groupby("user_id", sort=False, as_index=False).agg(
            {"rec_us": "max", "freq": "sum", "mon": "sum"}
        )

    agg = bucketed_keyed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], {"rec_us": "max", "freq": "sum", "mon": "sum"},
    )

    def addneg(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.copy()
        df["neg_rec"] = -df["rec_us"].astype("int64")
        df["neg_freq"] = -df["freq"].astype("int64")
        df["neg_mon"] = -df["mon"].astype("int64")
        return df

    a = agg.map_batches(addneg, batch_format="pandas")
    a = global_row_number(a, ["neg_rec", "user_id"], out_col="r_seq")
    a = global_row_number(a, ["neg_freq", "user_id"], out_col="f_seq")
    a = global_row_number(a, ["neg_mon", "user_id"], out_col="m_seq")
    n = a.count()

    def tiles(df: _pd.DataFrame) -> _pd.DataFrame:
        k = 5
        big, small = n % k, n // k

        def ntile(seq: _pd.Series) -> np.ndarray:
            r0 = seq.to_numpy(np.int64) - 1
            cut = big * (small + 1)
            with np.errstate(divide="ignore", invalid="ignore"):
                late = big + (r0 - cut) // max(small, 1)
            return np.where(r0 < cut, r0 // (small + 1), late).astype(np.int64) + 1

        out = _pd.DataFrame(
            {
                "user_id": df["user_id"],
                "rec_us": df["rec_us"],
                "freq": df["freq"],
                "mon": df["mon"],
                "r_score": ntile(df["r_seq"]),
                "f_score": ntile(df["f_seq"]),
                "m_score": ntile(df["m_seq"]),
            }
        )
        out["rfm"] = out["r_score"] * 100 + out["f_score"] * 10 + out["m_score"]
        return out

    return a.map_batches(tiles, batch_format="pandas")


SQL_USER_RFM = r"""
WITH a AS (SELECT user_id,
                  CAST(max(epoch_us(ts)) AS BIGINT) AS rec_us,
                  CAST(count(*) AS BIGINT) AS freq,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mon
           FROM events GROUP BY 1)
SELECT user_id, rec_us, freq, mon,
       CAST(ntile(5) OVER (ORDER BY rec_us DESC, user_id) AS BIGINT) AS r_score,
       CAST(ntile(5) OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS f_score,
       CAST(ntile(5) OVER (ORDER BY mon DESC, user_id) AS BIGINT) AS m_score,
       CAST(ntile(5) OVER (ORDER BY rec_us DESC, user_id) * 100
            + ntile(5) OVER (ORDER BY freq DESC, user_id) * 10
            + ntile(5) OVER (ORDER BY mon DESC, user_id) AS BIGINT) AS rfm
FROM a
"""


# ------------------------------------------------------------------
# Session-7 batch 3: TPC-H-style join/agg fills (Q4/Q6/Q17/Q18 shapes
# adapted to the testdata columns) + per-dimension embedding stats
# ------------------------------------------------------------------

_US = 1_000_000


def q_discount_band_revenue(sf_dir: str):
    """TPC-H Q6 shape — forecasting-revenue-change filter-aggregate:
    shipdate year 1995, discount band [5%, 7%], qty < 24; revenue =
    sum(price_cents x disc_pct) kept in exact integer micro-units (no
    float product). Pure scan: column-pruned read, per-block (n, sum)
    partials, one driver-side Dataset.sum — zero shuffle."""
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = int(pa.scalar(np.datetime64("1995-01-01", "us")).value)
    hi = int(pa.scalar(np.datetime64("1996-01-01", "us")).value)

    def partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        disc = pc.cast(pc.floor(pc.add(pc.multiply(t.column("l_discount"), 100.0), 0.5)), pa.int64())
        cents = pc.cast(pc.floor(pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)), pa.int64())
        keep = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(ship, lo), pc.less(ship, hi)),
                pc.and_(pc.greater_equal(disc, 5), pc.less_equal(disc, 7)),
            ),
            pc.less(t.column("l_quantity"), 24.0),
        )
        rev = pc.multiply(pc.filter(cents, keep), pc.filter(disc, keep))
        n = len(rev)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "rev": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum(["n", "rev"])
    return pa.table(
        {
            "n_rows": pa.array([int(agg["sum(n)"])], pa.int64()),
            "revenue_micro": pa.array([int(agg["sum(rev)"])], pa.int64()),
        }
    )


SQL_DISCOUNT_BAND = r"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_micro
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q_order_priority_counts(sf_dir: str):
    """TPC-H Q4 shape — order-priority checking with the correlated
    EXISTS rewritten as a per-order MAX pre-aggregate: lineitem collapses
    to one (orderkey, max_shipdate) row per order BEFORE any join (the
    keys-only exchange — at 100 TB this is the difference between
    shuffling the fact table and shuffling its key set), orders are
    date-filtered at the scan, one partitioned hash join, then
    EXISTS(l_shipdate > o_orderdate) == max_ship > o_orderdate and a
    tiny priority count."""
    import pandas as _pd

    from vaero_ray.stages.joins import hash_join
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    lo = np.datetime64("1995-07-01", "us").astype(np.int64)
    hi = np.datetime64("1995-10-01", "us").astype(np.int64)

    li = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])

    def li_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].astype("int64"),
                "max_ship": df["l_shipdate"].to_numpy().astype("datetime64[us]").astype(np.int64),
            }
        )
        return out.groupby("o_orderkey", sort=False, as_index=False).max()

    li_max = bucketed_keyed_sum(
        li.map_batches(li_partial, batch_format="pandas"), ["o_orderkey"], ["max_ship"], agg="max"
    )

    orders = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def o_filter(t: pa.Table) -> pa.Table:
        od = pc.cast(t.column("o_orderdate").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        keep = pc.and_(pc.greater_equal(od, int(lo)), pc.less(od, int(hi)))
        return pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "od_us": od,
                "o_orderpriority": t.column("o_orderpriority"),
            }
        ).filter(keep)

    of = orders.map_batches(o_filter, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(of, li_max, "o_orderkey")

    def count_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hit = df[df["max_ship"] > df["od_us"]]
        g = hit.groupby("o_orderpriority", sort=False).size().rename("n_orders").reset_index()
        g["n_orders"] = g["n_orders"].astype("int64")
        return g

    counts = j.map_batches(count_partial, batch_format="pandas")
    return bucketed_keyed_sum(counts, ["o_orderpriority"], ["n_orders"])


SQL_ORDER_PRIORITY = r"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-07-01' AND o.o_orderdate < TIMESTAMP '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY 1
"""


def q_small_qty_part_revenue(sf_dir: str):
    """TPC-H Q17 shape — small-quantity-order revenue for one brand:
    the brand filter shrinks the part dimension to a driver-resident
    key set (broadcast, not shuffled); lineitem is filtered to those
    parts AT THE SCAN; the per-part (sum_qty, cnt) pre-aggregate is a
    73-row driver table rebroadcast for the final pass; and the
    correlated ``qty < 0.2 * avg(qty)`` becomes the EXACT integer
    inequality ``5*q*cnt < sum_qty`` on both engines (no float
    threshold at the boundary)."""
    import pandas as _pd

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    keys = pc.filter(
        part.column("p_partkey"), pc.equal(part.column("p_brand"), "Brand#23")
    ).combine_chunks()
    key_set = pa.array(keys.to_pylist(), pa.int64())

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def narrow(t: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(t.column("l_partkey"), pa.int64()), value_set=key_set)
        q = pc.cast(pc.floor(pc.add(t.column("l_quantity"), 0.5)), pa.int64())
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {"pk": pc.cast(t.column("l_partkey"), pa.int64()), "q": q, "cents": cents}
        ).filter(keep)

    nds = li.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)

    def agg_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame({"pk": df["pk"], "s": df["q"], "c": np.ones(len(df), np.int64)})
        return out.groupby("pk", sort=False, as_index=False).sum()

    # brand-filtered part set: 73 keys -> the pre-agg is driver-sized
    ag = (
        nds.map_batches(agg_partial, batch_format="pandas")
        .to_pandas()
        .groupby("pk", sort=False, as_index=False)
        .sum()
    )
    thr = dict(zip(ag["pk"], zip(ag["s"], ag["c"])))

    def survivors(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        q = t.column("q").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        s = np.array([thr[k][0] for k in pk], np.int64) if len(pk) else np.array([], np.int64)
        c = np.array([thr[k][1] for k in pk], np.int64) if len(pk) else np.array([], np.int64)
        keep = 5 * q * c < s
        return pa.table(
            {
                "n": pa.array([int(keep.sum())], pa.int64()),
                "sum_cents": pa.array([int(cents[keep].sum())], pa.int64()),
            }
        )

    agg = nds.map_batches(survivors, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["n", "sum_cents"]
    )
    return pa.table(
        {
            "n_rows": pa.array([int(agg["sum(n)"])], pa.int64()),
            "sum_cents": pa.array([int(agg["sum(sum_cents)"])], pa.int64()),
        }
    )


SQL_SMALL_QTY_PART = r"""
WITH pp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
li AS (SELECT l_partkey, CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
       FROM lineitem JOIN pp ON l_partkey = p_partkey),
ag AS (SELECT l_partkey, SUM(q) AS s, COUNT(*) AS c FROM li GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM li JOIN ag USING (l_partkey) WHERE 5 * q * c < s
"""


def q_large_volume_customers(sf_dir: str):
    """TPC-H Q18 shape — large-volume customers: lineitem collapses to
    per-order quantity sums (keys-only exchange), the HAVING > 250
    filter shrinks the result to ~0.1% of orders BEFORE the two hash
    joins (orders, then customer), and the global top-100 rides the
    top10_orders negated-tiebreak sort."""
    import pandas as _pd

    from vaero_ray.stages.joins import hash_join
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    li = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])

    def li_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].astype("int64"),
                "sum_qty": np.floor(df["l_quantity"].to_numpy() + 0.5).astype(np.int64),
            }
        )
        return out.groupby("o_orderkey", sort=False, as_index=False).sum()

    per_order = bucketed_keyed_sum(
        li.map_batches(li_partial, batch_format="pandas"), ["o_orderkey"], ["sum_qty"]
    ).filter(expr="sum_qty > 250")

    orders = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "o_orderdate": t.column("o_orderdate"),
                "price_cents": pc.cast(
                    pc.floor(pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust = _read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]).map_batches(
        lambda t: t.set_column(
            t.column_names.index("c_custkey"),
            "c_custkey",
            pc.cast(t.column("c_custkey"), pa.int64()),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = hash_join(hash_join(per_order, orders, "o_orderkey"), cust, "c_custkey")
    j = j.map_batches(
        lambda t: t.append_column(
            "__nk", pc.negate_checked(pc.cast(t.column("o_orderkey"), pa.int64()))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = j.sort(["price_cents", "__nk"], descending=True).limit(100)
    return out.select_columns(
        ["c_custkey", "c_name", "o_orderkey", "o_orderdate", "price_cents", "sum_qty"]
    )


SQL_LARGE_VOLUME = r"""
WITH t AS (SELECT l_orderkey,
                  CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty
           FROM lineitem GROUP BY 1
           HAVING SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 250)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents, t.sum_qty
FROM t JOIN orders o ON o.o_orderkey = t.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY price_cents DESC, o.o_orderkey LIMIT 100
"""


def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension mean/variance over the embedding corpus (feature
    drift / normalization profile): micro-unit integer sums + squared
    sums per block, one d-row bucketed merge, closed-form 6-dp finalize
    (ann.embedding_dim_stats)."""
    from vaero_ray.stages.ann import embedding_dim_stats

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return embedding_dim_stats(ds, "embedding")


SQL_EMBEDDING_DIM_STATS = r"""
WITH u AS (SELECT unnest(range(1, len(embedding) + 1)) AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
           FROM embeddings),
a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(m) AS BIGINT) AS sum_micro,
             CAST(SUM(m * m) AS BIGINT) AS sumsq_micro
      FROM u GROUP BY 1)
SELECT dim, n_vecs, sum_micro, sumsq_micro,
       CAST(sum_micro AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1000000.0) AS mean_val,
       (CAST(sumsq_micro AS DOUBLE) / CAST(n_vecs AS DOUBLE)
        - (CAST(sum_micro AS DOUBLE) / CAST(n_vecs AS DOUBLE))
          * (CAST(sum_micro AS DOUBLE) / CAST(n_vecs AS DOUBLE)))
       / 1000000000000.0 AS var_val
FROM a
"""


# ------------------------------------------------------------------
# Session-7 batch 4: Simpson diversity, ratio-to-report, interarrival
# burstiness, and streaming windowed entropy (counts-are-aggregates)
# ------------------------------------------------------------------

def q_source_simpson_diversity(sf_dir: str):
    """Simpson concentration of each source's language mix — entropy's
    fully-integer sibling (numerator never touches float; see
    numstats.simpson_per_group)."""
    from vaero_ray.stages.numstats import simpson_per_group

    return simpson_per_group(
        _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "lang"]),
        "source", "lang",
    )


SQL_SOURCE_SIMPSON = r"""
WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2)
SELECT source, CAST(SUM(c) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_cats,
       CAST(SUM(c * (c - 1)) AS BIGINT) AS simpson_num,
       CASE WHEN SUM(c) >= 2
            THEN CAST(SUM(c * (c - 1)) AS DOUBLE)
                 / (CAST(SUM(c) AS DOUBLE) * (CAST(SUM(c) AS DOUBLE) - 1.0)) END AS simpson
FROM c GROUP BY 1
"""


def q_hourly_type_share(sf_dir: str):
    """Ratio-to-report: each event type's share of its hour — exact
    (hour, type) counts through one bounded exchange, the per-hour total
    and the single share division in a second tiny hour-bucketed fold
    (the windowed SUM() OVER (PARTITION BY hr) without shipping rows)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    ds = _events(sf_dir, columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        hr = pc.divide(us, 3600000000)
        df = _pd.DataFrame(
            {"hr": hr.to_numpy(zero_copy_only=False), "event_type": t.column("event_type").to_pandas()}
        )
        g = df.groupby(["hr", "event_type"], sort=False).size().rename("c").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_keyed_sum(counts, ["hr", "event_type"], ["c"])

    def per_hour(df: _pd.DataFrame) -> _pd.DataFrame:
        tot = df.groupby("hr", sort=False)["c"].transform("sum").astype("int64")
        df = df.copy()
        df["hr_total"] = tot
        df["share"] = df["c"].to_numpy(np.float64) / tot.to_numpy(np.float64)
        return df

    return bucketed_map_groups(merged, "hr", per_hour)


SQL_HOURLY_SHARE = r"""
WITH c AS (SELECT epoch_us(ts) // 3600000000 AS hr, event_type,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)
SELECT hr, event_type, c,
       CAST(SUM(c) OVER (PARTITION BY hr) AS BIGINT) AS hr_total,
       CAST(c AS DOUBLE) / CAST(SUM(c) OVER (PARTITION BY hr) AS DOUBLE) AS share
FROM c
"""


def q_user_interarrival_cv(sf_dir: str):
    """Burstiness profile per user: coefficient of variation of the
    inter-event gaps (whole seconds) — exact integer (n, sum, sumsq)
    moments over the interarrival kernel's gaps, one closed-form
    UNROUNDED sqrt/division tree (identical IEEE expression both
    engines; the variance>0 guard is itself part of the shared tree, so
    mask decisions agree bitwise)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.rowwindow import interarrival

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id"])
    g = interarrival(ds, "user_id", "ts", "event_id", out="gap_us")

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df[df["gap_us"] >= 0]
        gs = (df["gap_us"].to_numpy(np.int64) // 1_000_000).astype(np.int64)
        out = _pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "n_gaps": np.ones(len(gs), np.int64),
                "sum_s": gs,
                "sumsq_s": gs * gs,
            }
        )
        return out.groupby("user_id", sort=False, as_index=False).sum()

    merged = bucketed_keyed_sum(
        g.map_batches(partial, batch_format="pandas"),
        ["user_id"], ["n_gaps", "sum_s", "sumsq_s"],
    )

    def finalize(df: _pd.DataFrame) -> _pd.DataFrame:
        n = df["n_gaps"].to_numpy(np.float64)
        s = df["sum_s"].to_numpy(np.float64)
        ss = df["sumsq_s"].to_numpy(np.float64)
        var = ss / n - (s / n) * (s / n)
        ok = (s > 0) & (var > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            cv = np.sqrt(var) / (s / n)
        df = df.copy()
        df["cv"] = [float(x) if o else None for x, o in zip(cv, ok)]
        return df

    return merged.map_batches(finalize, batch_format="pandas")


SQL_INTERARRIVAL_CV = r"""
WITH g AS (SELECT user_id,
                  (epoch_us(ts) - LAG(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
           FROM events),
m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(SUM(gap_s) AS BIGINT) AS sum_s,
             CAST(SUM(gap_s * gap_s) AS BIGINT) AS sumsq_s
      FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
SELECT user_id, n_gaps, sum_s, sumsq_s,
       CASE WHEN sum_s > 0
             AND (CAST(sumsq_s AS DOUBLE) / n_gaps
                  - (CAST(sum_s AS DOUBLE) / n_gaps) * (CAST(sum_s AS DOUBLE) / n_gaps)) > 0
            THEN sqrt(CAST(sumsq_s AS DOUBLE) / n_gaps
                      - (CAST(sum_s AS DOUBLE) / n_gaps) * (CAST(sum_s AS DOUBLE) / n_gaps))
                 / (CAST(sum_s AS DOUBLE) / n_gaps) END AS cv
FROM m
"""


def q_streaming_type_entropy(sf_dir: str):
    """STREAMING per-window behavioral entropy: exact (event_type, hour)
    counts ride the exactly-once windowed job as ordinary mergeable
    aggregates (checkpointed partial/merge/carry, idempotent commit);
    the entropy finalize runs DOWNSTREAM of the committed output via
    numstats.entropy_from_counts — the same counts-are-windowed-
    aggregates composition as the streaming HLL gate, reused for an
    information-theoretic statistic with zero new streaming machinery."""
    import os
    import shutil

    from vaero_ray.stages.numstats import entropy_from_counts
    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(sf_dir, "type_entropy_in", ["event_type", "ts"])
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/type_entropy_out", f"{base}/type_entropy_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["event_type"],
        aggs=[AggSpec(None, "count", "c")],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,
        num_partitions=4,
    )
    job.run()
    return entropy_from_counts(job.committed_output(), "window_start")


SQL_STREAMING_ENTROPY = r"""
WITH c AS (SELECT date_trunc('hour', ts) AS window_start, event_type,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)
SELECT window_start, CAST(SUM(c) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_cats,
       ROUND(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(c * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE), 6) AS entropy
FROM c GROUP BY 1
"""


# ------------------------------------------------------------------
# Session-7 batch 5: hourly deltas, conv duration quantiles, top-10
# value concentration, Zipf slope (quantized-log exact OLS)
# ------------------------------------------------------------------

def q_hourly_count_change(sf_dir: str):
    """Hour-over-hour change per event type — the ops-monitoring delta
    series: exact (type, hour) counts through one bounded exchange,
    then the per-type ordered shift (LAG) and the single pct division
    run in a tiny type-bucketed fold over the AGGREGATED series (hours
    x types rows, never events)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    ds = _events(sf_dir, columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        df = _pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "hr": pc.divide(us, 3600000000).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["event_type", "hr"], sort=False).size().rename("c").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_keyed_sum(counts, ["event_type", "hr"], ["c"])

    def per_type(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.sort_values(["event_type", "hr"], kind="mergesort").reset_index(drop=True)
        c = df["c"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        prev = np.roll(c, 1)
        first = np.r_[True, et[1:] != et[:-1]] if len(c) else np.zeros(0, bool)
        delta = c - prev
        with np.errstate(divide="ignore", invalid="ignore"):
            pct = delta.astype(np.float64) / prev.astype(np.float64)
        # first row per type has no prior hour: null delta / null pct
        delta_n = _pd.array(delta, dtype="Int64")
        delta_n[first] = _pd.NA
        pct[first] = np.nan  # NaN -> arrow null via from_pandas
        return _pd.DataFrame(
            {
                "event_type": et,
                "hr": df["hr"].to_numpy(np.int64),
                "c": c,
                "delta": delta_n,
                "pct_change": pct,
            }
        )

    return bucketed_map_groups(merged, "event_type", per_type)


SQL_HOURLY_CHANGE = r"""
WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)
SELECT event_type, hr, c,
       c - LAG(c) OVER (PARTITION BY event_type ORDER BY hr) AS delta,
       CAST(c - LAG(c) OVER (PARTITION BY event_type ORDER BY hr) AS DOUBLE)
         / CAST(LAG(c) OVER (PARTITION BY event_type ORDER BY hr) AS DOUBLE) AS pct_change
FROM c
"""


def q_conv_duration_quantiles(sf_dir: str):
    """Conversation-duration distribution: per-conv (max ts - min ts)
    whole seconds via one bounded min/max keyed exchange, then EXACT
    p50/p90/p99 by radix selection over the MATERIALIZED per-conv
    aggregate (the selection's multi-scan reads the 1-row-per-conv
    table, never the event stream). Composition proof that the
    selection tier runs on derived datasets, not just file reads."""
    import pandas as _pd

    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.keyed import bucketed_keyed_agg
    from vaero_ray.stages.selection import exact_quantiles_disc

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        out = _pd.DataFrame({"conv_id": df["conv_id"], "mn": us, "mx": us})
        return out.groupby("conv_id", sort=False, as_index=False).agg(
            {"mn": "min", "mx": "max"}
        )

    spans = bucketed_keyed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["conv_id"], {"mn": "min", "mx": "max"},
    )
    durs = spans.map_batches(
        lambda df: _pd.DataFrame({"dur_s": (df["mx"] - df["mn"]) // 1_000_000}),
        batch_format="pandas",
    ).materialize()
    n = durs.count()
    p50, p90, p99 = exact_quantiles_disc(durs, "dur_s", [0.5, 0.9, 0.99])
    return pa.table(
        {
            "n_convs": pa.array([n], pa.int64()),
            "p50_s": pa.array([p50], pa.int64()),
            "p90_s": pa.array([p90], pa.int64()),
            "p99_s": pa.array([p99], pa.int64()),
        }
    )


SQL_CONV_DURATION = f"""
WITH {TRANSCRIPTS_CTE},
d AS (SELECT conv_id, (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS dur_s
      FROM transcripts GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(quantile_disc(dur_s, 0.5) AS BIGINT) AS p50_s,
       CAST(quantile_disc(dur_s, 0.9) AS BIGINT) AS p90_s,
       CAST(quantile_disc(dur_s, 0.99) AS BIGINT) AS p99_s
FROM d
"""


def q_type_value_topn_share(sf_dir: str):
    """Revenue concentration per event type: the share of total value
    captured by each type's top-10 users — exact per-(type, user) cent
    sums through one bounded exchange, then the rank/take-10/total fold
    runs per type over the AGGREGATED table (users x types rows).
    Deterministic ties: (value DESC, user_id ASC)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    ds = _events(sf_dir, columns=["event_type", "user_id", "value"]).map_batches(
        _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
    )

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame(
            {
                "event_type": df["event_type"],
                "user_id": df["user_id"],
                "v": df["value"].astype("int64"),
            }
        )
        return out.groupby(["event_type", "user_id"], sort=False, as_index=False).sum()

    agg = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pandas"), ["event_type", "user_id"], ["v"]
    )

    def per_type(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.sort_values(
            ["event_type", "v", "user_id"], ascending=[True, False, True], kind="mergesort"
        )
        g = df.groupby("event_type", sort=False)
        top10 = g.head(10).groupby("event_type", sort=False, as_index=False)["v"].sum()
        tot = g["v"].sum().rename("total_cents").reset_index()
        out = tot.merge(top10.rename(columns={"v": "top10_cents"}), on="event_type")
        out["share"] = out["top10_cents"].to_numpy(np.float64) / out[
            "total_cents"
        ].to_numpy(np.float64)
        return out

    return bucketed_map_groups(agg, "event_type", per_type)


SQL_TOPN_SHARE = r"""
WITH a AS (SELECT event_type, user_id,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
r AS (SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v DESC, user_id) AS rn
      FROM a)
SELECT event_type, CAST(SUM(v) AS BIGINT) AS total_cents,
       CAST(SUM(v) FILTER (rn <= 10) AS BIGINT) AS top10_cents,
       CAST(SUM(v) FILTER (rn <= 10) AS DOUBLE) / CAST(SUM(v) AS DOUBLE) AS share
FROM r GROUP BY 1
"""


def q_vocab_zipf_slope(sf_dir: str):
    """Zipf-law fit over the corpus vocabulary: OLS slope of
    log(count) on log(rank) — run EXACTLY: the distributed part is the
    vocab_top_terms partial-count merge (the exchange moves vocabulary,
    never tokens), and the log-log regression QUANTIZES both logs to
    1e-4 units (``floor(ln(v)*10000 + 0.5)`` — identical float64 ln +
    fixed-point both engines) so the OLS moments are exact integers and
    the slope is one closed-form float expression. Vocabulary-bounded
    by contract (the same bound vocab_top_terms already assumes)."""
    from ray.data.aggregate import Sum

    from vaero_ray.stages.dedup import _flat_tokens

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(tbl: pa.Table) -> pa.Table:
        toks, _ = _flat_tokens(tbl, "text")
        if not len(toks):
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        g = pa.table({"token": toks}).group_by("token").aggregate([("token", "count")])
        return pa.table(
            {"token": g.column("token"), "cnt": g.column("token_count").cast(pa.int64())}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    merged = merged.sort_values(
        ["cnt", "token"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    rank = np.arange(1, len(merged) + 1, dtype=np.int64)
    cnt = merged["cnt"].to_numpy(np.int64)
    x = np.floor(np.log(rank.astype(np.float64)) * 10000.0 + 0.5).astype(np.int64)
    y = np.floor(np.log(cnt.astype(np.float64)) * 10000.0 + 0.5).astype(np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy, sxy = int((x * x).sum()), int((y * y).sum()), int((x * y).sum())
    num = float(n) * sxy - float(sx) * sy
    dx = float(n) * sxx - float(sx) * sx
    dy = float(n) * syy - float(sy) * sy
    slope = num / dx if dx > 0 else None
    r2 = (num * num) / (dx * dy) if dx > 0 and dy > 0 else None
    return pa.table(
        {
            "n_terms": pa.array([n], pa.int64()),
            "sum_x": pa.array([sx], pa.int64()),
            "sum_y": pa.array([sy], pa.int64()),
            "sum_xy": pa.array([sxy], pa.int64()),
            "slope": pa.array([slope], pa.float64()),
            "r2": pa.array([r2], pa.float64()),
        }
    )


SQL_ZIPF = r"""
WITH t AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
u AS (SELECT UNNEST(toks) AS token FROM t),
v AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM u GROUP BY 1),
r AS (SELECT CAST(floor(ln(CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(CAST(cnt AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS y
      FROM v),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(y*y) AS BIGINT) AS syy, CAST(SUM(x*y) AS BIGINT) AS sxy
      FROM r)
SELECT n AS n_terms, sx AS sum_x, sy AS sum_y, sxy AS sum_xy,
       CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
            THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) END AS slope,
       CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0
             AND (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
            THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) END AS r2
FROM m
"""


def q_conv_turn_drift(sf_dir: str):
    """Within-conversation verbosity drift: for every conversation with
    >=4 turns, does the SECOND half (turns n//2..) average longer text
    than the first? The half-vs-half mean comparison is EXACT via
    cross-multiplied integer char sums (s2*c1 > s1*c2 — no division on
    either engine). Per-conv halves fold inside the one conv_id-bucketed
    shuffle the transcript derivation already pays; only four integer
    partials per conversation reach the global aggregate."""
    import pandas as _pd

    from ray.data.aggregate import Count, Sum

    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.keyed import bucketed_map_groups

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "ts": tbl.column("ts"),
                "event_id": tbl.column("event_id"),
                "len": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
            }
        )

    ds = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    def per_conv(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)
        n = g["len"].transform("size").to_numpy(np.int64)
        idx = g.cumcount().to_numpy(np.int64)
        keep = n >= 4
        first = idx < (n // 2)
        ln = df["len"].to_numpy(np.int64)
        out = _pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy()[keep],
                "s1": np.where(first, ln, 0)[keep],
                "c1": first.astype(np.int64)[keep],
                "s2": np.where(~first, ln, 0)[keep],
                "c2": (~first).astype(np.int64)[keep],
            }
        )
        agg = out.groupby("conv_id", sort=False, as_index=False).sum()
        agg["up"] = (agg["s2"] * agg["c1"] > agg["s1"] * agg["c2"]).astype(np.int64)
        return agg[["s1", "s2", "up"]]

    convs = bucketed_map_groups(ds, "conv_id", per_conv)
    a = convs.aggregate(
        Count(alias_name="n_convs"),
        Sum("up", alias_name="n_drift_up"),
        Sum("s1", alias_name="first_half_chars"),
        Sum("s2", alias_name="second_half_chars"),
    )
    return pa.table(
        {
            "n_convs": pa.array([int(a["n_convs"])], pa.int64()),
            "n_drift_up": pa.array([int(a["n_drift_up"])], pa.int64()),
            "first_half_chars": pa.array([int(a["first_half_chars"])], pa.int64()),
            "second_half_chars": pa.array([int(a["second_half_chars"])], pa.int64()),
        }
    )


SQL_TURN_DRIFT = f"""
WITH {TRANSCRIPTS_CTE},
t AS (SELECT conv_id, turn_idx, CAST(length(text) AS BIGINT) AS len,
             COUNT(*) OVER (PARTITION BY conv_id) AS n
      FROM transcripts),
c AS (SELECT conv_id,
             COALESCE(SUM(len) FILTER (turn_idx < n // 2), 0) AS s1,
             COUNT(*) FILTER (turn_idx < n // 2) AS c1,
             COALESCE(SUM(len) FILTER (turn_idx >= n // 2), 0) AS s2,
             COUNT(*) FILTER (turn_idx >= n // 2) AS c2
      FROM t WHERE n >= 4 GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(COUNT(*) FILTER (s2 * c1 > s1 * c2) AS BIGINT) AS n_drift_up,
       CAST(SUM(s1) AS BIGINT) AS first_half_chars,
       CAST(SUM(s2) AS BIGINT) AS second_half_chars
FROM c
"""


def q_role_transition_gaps(sf_dir: str):
    """Inter-turn latency per role handoff (user->assistant,
    assistant->tool, ...): LAG of (role, ts) within each conversation,
    exact integer-microsecond gap sums per ordered role pair. The lag
    runs vectorized inside the conv_id-bucketed shuffle (shift + same-
    conv mask, no per-conv Python); the exchange after it carries nine
    partial rows per bucket, not turns."""
    import pandas as _pd

    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "ts": tbl.column("ts"),
                "event_id": tbl.column("event_id"),
                "role": tbl.column("role"),
            }
        )

    ds = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
        conv = df["conv_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        role = df["role"].to_numpy()
        same = np.r_[False, conv[1:] == conv[:-1]]
        gap = np.empty_like(us)
        gap[1:] = us[1:] - us[:-1]
        prev_role = np.roll(role, 1)
        out = _pd.DataFrame(
            {
                "role_prev": prev_role[same],
                "role": role[same],
                "n": np.ones(int(same.sum()), np.int64),
                "gap_us": gap[same],
            }
        )
        return out.groupby(["role_prev", "role"], sort=False, as_index=False).sum()

    partials = bucketed_map_groups(ds, "conv_id", per_bucket)
    return bucketed_keyed_sum(partials, ["role_prev", "role"], ["n", "gap_us"])


SQL_ROLE_GAPS = f"""
WITH {TRANSCRIPTS_CTE},
t AS (SELECT conv_id, role, epoch_us(ts) AS us,
             LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS role_prev,
             LAG(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS us_prev
      FROM transcripts)
SELECT role_prev, role, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(us - us_prev) AS BIGINT) AS gap_us
FROM t WHERE role_prev IS NOT NULL GROUP BY 1, 2
"""


# ------------------------------------------------------------------
# Session-8 batch 1: KMV distinct sketch, Pareto frontier, Benford
# leading-digit profile, Z-order layout key
# ------------------------------------------------------------------

_KMV_K = 64  # < distinct users at every test scale, so bottom-k selects


def q_kmv_user_minima(sf_dir: str):
    """K-minimum-values distinct sketch of user_id: the 64 smallest
    distinct 61-bit hashes across the corpus — the third mergeable
    distinct shape beside HLL (register max) and Bloom (word OR), and
    the one that composes into set-operation estimates. Per-block
    bottom-k partials (≤k ints leave any block), one-task merge over
    block refs; minima + estimate are integer-exact and SQL-identical
    (same strengthened M61 hash as the HLL gates)."""
    from vaero_ray.stages.sketch import kmv_minima

    return kmv_minima(_events(sf_dir, columns=["user_id"]), "user_id", k=_KMV_K)


SQL_KMV = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
h1 AS (
  SELECT DISTINCT CAST(((A * ((CASE WHEN user_id < 0
                THEN CAST(user_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
                ELSE CAST(user_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM events, m),
hs AS (
  SELECT DISTINCT CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) AS hv
  FROM h1, m)
SELECT CAST(row_number() OVER (ORDER BY hv) AS BIGINT) - 1 AS rk, hv
FROM hs ORDER BY hv LIMIT {K}
"""


def _fmt_kmv_sql() -> str:
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    return SQL_KMV.format(
        A=int(HLL_A), B=int(HLL_B), A2=int(HLL_A2), B2=int(HLL_B2),
        XS=HLL_XS, K=_KMV_K,
    )


SQL_KMV = _fmt_kmv_sql()


def q_user_value_frontier(sf_dir: str):
    """Pareto frontier (skyline) over per-user (total spend, event
    count): the users no other user weakly dominates with a strict
    improvement on either axis — multi-objective top-N without a
    scalarization weight. Exact-cents keyed sum feeds the distributed
    skyline: per-block local frontiers (the combiner property
    pareto(pareto(A) ∪ pareto(B)) == pareto(A ∪ B)) prune before one
    tiny repartition; only frontier candidates ever move."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.selection import pareto_frontier

    ds = _events(sf_dir, columns=["user_id", "value"]).map_batches(
        _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
    )

    def proj(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "n_events": pa.array(np.ones(tbl.num_rows, np.int64), pa.int64()),
                "sum_value_cents": tbl.column("value"),
            }
        )

    per_user = bucketed_keyed_sum(
        ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        ["n_events", "sum_value_cents"],
    )
    return pareto_frontier(per_user, "sum_value_cents", "n_events")


SQL_FRONTIER = r"""
WITH a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
           FROM events GROUP BY 1)
SELECT user_id, n_events, sum_value_cents FROM a r
WHERE NOT EXISTS (
  SELECT 1 FROM a s
  WHERE s.sum_value_cents >= r.sum_value_cents AND s.n_events >= r.n_events
    AND (s.sum_value_cents > r.sum_value_cents OR s.n_events > r.n_events))
"""


def q_value_benford_digits(sf_dir: str):
    """Benford leading-digit profile of the money column per event
    type — the classic fabricated-data / unit-mixup QA scan. Exact:
    cents fixed-point per row, first digit via decimal string slice
    (identical expression in SQL), per-block (type, digit) partials,
    tiny keyed-sum merge — at most 9x|types| rows leave any block."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _events(sf_dir, columns=["event_type", "value"]).map_batches(
        _value_to_cents, batch_format="pyarrow", zero_copy_batch=True
    )

    def partial(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.greater(tbl.column("value"), 0))
        digit = pc.cast(
            pc.utf8_slice_codeunits(pc.cast(t.column("value"), pa.string()), 0, 1),
            pa.int64(),
        )
        g = (
            pa.table({"event_type": t.column("event_type"), "digit": digit})
            .group_by(["event_type", "digit"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "digit": g.column("digit"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_keyed_sum(partials, ["event_type", "digit"], ["n"], num_buckets=4)


SQL_BENFORD = r"""
WITH c AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
SELECT event_type, CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM c WHERE cents > 0 GROUP BY 1, 2
"""


def q_zorder_events(sf_dir: str):
    """Z-order (Morton) layout key over (user_id, event hour): the
    multi-dimensional clustering primitive — sort/partition output
    files by this interleaved code and a 100-TB scan filtered on EITHER
    dimension prunes row groups instead of reading everything (the
    Delta/Iceberg OPTIMIZE ZORDER trick as a plain vectorized column).
    Stateless mask-shift dilation per batch; bit-exact in SQL via 16
    shift-mask terms per dimension."""
    from vaero_ray.stages.keyed import morton16

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id"])

    def add_z(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl.column("user_id").to_numpy(zero_copy_only=False)).astype(
            np.uint64
        )
        us = np.asarray(
            tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        hrs = (us // 3_600_000_000).astype(np.uint64)
        return pa.table(
            {
                "event_id": tbl.column("event_id"),
                "zcode": pa.array(morton16(u, hrs), pa.int64()),
            }
        )

    return ds.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True)


_Z_U = " | ".join(f"(((u >> {i}) & 1) << {2 * i})" for i in range(16))
_Z_T = " | ".join(f"(((h >> {i}) & 1) << {2 * i + 1})" for i in range(16))
SQL_ZORDER = f"""
WITH b AS (SELECT event_id, (user_id & 65535) AS u,
                  ((epoch_us(ts) // 3600000000) & 65535) AS h
           FROM events)
SELECT event_id, CAST({_Z_U} | {_Z_T} AS BIGINT) AS zcode FROM b
"""


# ------------------------------------------------------------------
# Session-8 batch 2: MATCH_RECOGNIZE-style regex CEP over per-key
# event/turn sequences
# ------------------------------------------------------------------


def q_conv_pattern_matches(sf_dir: str):
    """Regex CEP over per-conversation role sequences: count
    non-overlapping ``at+a`` matches (assistant -> tool call(s) ->
    assistant, the resolved-tool-use exchange) per conv — the pattern
    QUANTIFIER form of sequence detection that fixed-step funnels can't
    express (MATCH_RECOGNIZE territory). One conv_id-bucketed shuffle,
    one compiled-regex scan per bucket over a separator-walled byte
    buffer; the Python loop is over matches, never rows."""
    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.cep import regex_pattern_counts

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "ts": tbl.column("ts"),
                "event_id": tbl.column("event_id"),
                "role": tbl.column("role"),
            }
        )

    ds = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return regex_pattern_counts(
        ds,
        "conv_id",
        ["ts", "event_id"],
        "role",
        {"user": "u", "assistant": "a", "tool": "t"},
        r"at+a",
    )


SQL_CONV_PATTERN = f"""
WITH {TRANSCRIPTS_CTE},
s AS (SELECT conv_id,
             string_agg(CASE role WHEN 'user' THEN 'u'
                                  WHEN 'assistant' THEN 'a'
                                  ELSE 't' END, '' ORDER BY turn_idx) AS seq
      FROM transcripts GROUP BY 1)
SELECT conv_id, CAST(len(regexp_extract_all(seq, 'at+a')) AS BIGINT) AS n_matches
FROM s
"""


def q_event_regex_funnel(sf_dir: str):
    """The same regex-CEP operator over the raw event stream: per user,
    non-overlapping ``v+c`` matches (a browse burst of consecutive
    views ending in a click) over the (ts, event_id)-ordered event-type
    sequence — event types encode as their distinct first letters
    (v/c/p/s/e), identical to the SQL twin's substr."""
    from vaero_ray.stages.cep import regex_pattern_counts

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    return regex_pattern_counts(
        ds,
        "user_id",
        ["ts", "event_id"],
        "event_type",
        {"view": "v", "click": "c", "purchase": "p", "signup": "s", "error": "e"},
        r"v+c",
    )


SQL_EVENT_REGEX = r"""
WITH s AS (SELECT user_id,
                  string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
           FROM events GROUP BY 1)
SELECT user_id, CAST(len(regexp_extract_all(seq, 'v+c')) AS BIGINT) AS n_matches
FROM s
"""


# ------------------------------------------------------------------
# Session-8 batch 3: time-series QA over the hourly count series —
# lag-1 autocorrelation and CUSUM change-point peak per event type
# ------------------------------------------------------------------


def _hourly_type_counts(sf_dir: str):
    """Exact (event_type, hr, c) hourly counts: per-block partials,
    one bounded keyed-sum exchange (hours x types rows, never events)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _events(sf_dir, columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        df = _pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "hr": pc.divide(us, 3600000000).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["event_type", "hr"], sort=False).size().rename("c").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_keyed_sum(counts, ["event_type", "hr"], ["c"])


def q_hourly_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the hourly count series per event type
    — the burstiness/seasonality probe (r near 0: Poisson-ish arrivals;
    near 1: trending load). Exact int64 pair moments over the ALREADY
    AGGREGATED (type, hour) series, one closed-form 6-dp float,
    identical expression in the SQL twin (LAG over observed hours)."""
    from vaero_ray.stages.numstats import lag_autocorr_per_group

    return lag_autocorr_per_group(_hourly_type_counts(sf_dir), "event_type", "hr", "c")


SQL_HOURLY_AUTOCORR = r"""
WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS x
           FROM events GROUP BY 1, 2),
l AS (SELECT event_type, x,
             LAG(x) OVER (PARTITION BY event_type ORDER BY hr) AS xp
      FROM c),
m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(xp) AS BIGINT) AS sum_x, CAST(SUM(x) AS BIGINT) AS sum_y,
             CAST(SUM(xp * xp) AS BIGINT) AS sum_xx,
             CAST(SUM(x * x) AS BIGINT) AS sum_yy,
             CAST(SUM(xp * x) AS BIGINT) AS sum_xy
      FROM l WHERE xp IS NOT NULL GROUP BY 1)
SELECT event_type, n_pairs, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
       CASE WHEN (CAST(n_pairs AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x)
               * (CAST(n_pairs AS DOUBLE) * sum_yy - CAST(sum_y AS DOUBLE) * sum_y) > 0
            THEN ROUND((CAST(n_pairs AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
                       / sqrt((CAST(n_pairs AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x)
                            * (CAST(n_pairs AS DOUBLE) * sum_yy - CAST(sum_y AS DOUBLE) * sum_y)), 6)
            ELSE NULL END AS autocorr
FROM m
"""


def q_hourly_cusum_peak(sf_dir: str):
    """CUSUM change-point per event type: the hour where the scaled
    cumulative deviation |n*prefix_k - k*total| of the hourly count
    series peaks (ties -> earliest hour) — the level-shift detector,
    INTEGER-exact end to end (the n* scaling keeps the mean-free CUSUM
    in int64, no float anywhere)."""
    from vaero_ray.stages.numstats import cusum_peak_per_group

    ds = cusum_peak_per_group(_hourly_type_counts(sf_dir), "event_type", "hr", "c")

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(
            ["event_type", "n_points", "total", "peak_dev", "peak_hr"]
        )

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


SQL_HOURLY_CUSUM = r"""
WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS x
           FROM events GROUP BY 1, 2),
w AS (SELECT event_type, hr, x,
             SUM(x) OVER (PARTITION BY event_type ORDER BY hr) AS pref,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS k,
             SUM(x) OVER (PARTITION BY event_type) AS tot,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c),
d AS (SELECT event_type, hr, n, tot, abs(n * pref - k * tot) AS dev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY abs(n * pref - k * tot) DESC, hr) AS rn
      FROM w)
SELECT event_type, CAST(n AS BIGINT) AS n_points, CAST(tot AS BIGINT) AS total,
       CAST(dev AS BIGINT) AS peak_dev, CAST(hr AS BIGINT) AS peak_hr
FROM d WHERE rn = 1
"""


def q_purchase_attribution(sf_dir: str):
    """Last-touch attribution: every purchase credits the same user's
    latest prior non-purchase event type (unbounded lookback, strict
    (ts, event_id) order; first-event purchases credit 'none') — the
    marketing-attribution / tool-credit CEP shape. One bucketed shuffle,
    vectorized index forward-fill, (attr_type, n) partials out."""
    from vaero_ray.stages.cep import last_touch_counts

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    out = last_touch_counts(ds, "user_id", ["ts", "event_id"], "event_type", "purchase")

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(["attr_type", "n_purchases"])

    return out.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


SQL_ATTRIBUTION = r"""
WITH o AS (SELECT event_type,
                  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                             IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
           FROM events)
SELECT COALESCE(attr, 'none') AS attr_type, CAST(COUNT(*) AS BIGINT) AS n_purchases
FROM o WHERE event_type = 'purchase' GROUP BY 1
"""


# ------------------------------------------------------------------
# Session-8 batch 5: grouped KMV, rolling z-score anomaly detection,
# time-to-convert quantiles
# ------------------------------------------------------------------


def q_kmv_users_by_type(sf_dir: str):
    """GROUPED KMV distinct sketch: per event type, the 64 smallest
    distinct user-id hashes — the per-group companion of
    kmv_user_minima (as hll_users_by_type is to hll_user_registers).
    Partials carry ≤k hashes per (block, type); one bounded keyed
    exchange merges by union→unique→bottom-k."""
    from vaero_ray.stages.sketch import kmv_minima_by_key

    return kmv_minima_by_key(
        _events(sf_dir, columns=["event_type", "user_id"]),
        "event_type",
        "user_id",
        k=_KMV_K,
    )


SQL_KMV_BY_TYPE_T = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
h1 AS (
  SELECT DISTINCT event_type,
         CAST(((A * ((CASE WHEN user_id < 0
               THEN CAST(user_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
               ELSE CAST(user_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM events, m),
hs AS (
  SELECT DISTINCT event_type,
         CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) AS hv
  FROM h1, m),
r AS (SELECT event_type, hv,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY hv) AS BIGINT) - 1 AS rk
      FROM hs)
SELECT event_type, rk, hv FROM r WHERE rk < {K}
"""


def _fmt_kmv_by_type_sql() -> str:
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    return SQL_KMV_BY_TYPE_T.format(
        A=int(HLL_A), B=int(HLL_B), A2=int(HLL_A2), B2=int(HLL_B2),
        XS=HLL_XS, K=_KMV_K,
    )


SQL_KMV_BY_TYPE = _fmt_kmv_by_type_sql()


def q_hourly_anomaly_scores(sf_dir: str):
    """Trailing-24h anomaly score for every (type, hour): population
    z-score of the hour's count against the previous 24 OBSERVED hours,
    derived from exact int64 window sums (z = (m*x - s1)/sqrt(m*s2 -
    s1^2)) — the streaming ops-alerting shape, hash-exact because no
    engine ever runs a streaming STDDEV."""
    from vaero_ray.stages.numstats import rolling_zscores_per_group

    return rolling_zscores_per_group(
        _hourly_type_counts(sf_dir), "event_type", "hr", "c", w=24
    )


SQL_HOURLY_ANOMALY = r"""
WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS x
           FROM events GROUP BY 1, 2),
w AS (SELECT event_type, hr, x,
             COUNT(x) OVER win AS m,
             COALESCE(SUM(x) OVER win, 0) AS s1,
             COALESCE(SUM(x * x) OVER win, 0) AS s2
      FROM c
      WINDOW win AS (PARTITION BY event_type ORDER BY hr
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
SELECT event_type, CAST(hr AS BIGINT) AS hr, CAST(x AS BIGINT) AS c,
       CAST(m AS BIGINT) AS m, CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
       CASE WHEN m > 0 AND CAST(m AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1 > 0
            THEN ROUND((CAST(m AS DOUBLE) * x - s1)
                       / sqrt(CAST(m AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1), 6)
            END AS z
FROM w
"""


def q_view_to_purchase_quantiles(sf_dir: str):
    """Time-to-convert distribution: per user the gap from FIRST view
    to FIRST purchase (whole seconds, users whose first purchase
    follows their first view), then EXACT p50/p90 by radix selection
    over the 1-row-per-user aggregate — the funnel-latency SLA curve.
    Conditional mins ride one keyed exchange as sentinel-encoded int64
    (missing = +2^62, absorbing under min)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_agg
    from vaero_ray.stages.selection import exact_quantiles_disc

    NO_TS = 1 << 62
    ds = _events(sf_dir, columns=["user_id", "event_type", "ts"])

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        out = _pd.DataFrame(
            {
                "user_id": df["user_id"],
                "v": np.where(et == "view", us, NO_TS),
                "p": np.where(et == "purchase", us, NO_TS),
            }
        )
        return out.groupby("user_id", sort=False, as_index=False).agg(
            {"v": "min", "p": "min"}
        )

    firsts = bucketed_keyed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], {"v": "min", "p": "min"},
    )

    def to_delta(df: _pd.DataFrame) -> _pd.DataFrame:
        ok = (df["v"] < NO_TS) & (df["p"] < NO_TS) & (df["p"] >= df["v"])
        return _pd.DataFrame({"dt_s": (df.loc[ok, "p"] - df.loc[ok, "v"]) // 1_000_000})

    deltas = firsts.map_batches(to_delta, batch_format="pandas").materialize()
    n = deltas.count()
    p50, p90 = exact_quantiles_disc(deltas, "dt_s", [0.5, 0.9])
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "p50_s": pa.array([p50], pa.int64()),
            "p90_s": pa.array([p90], pa.int64()),
        }
    )


SQL_VIEW_TO_PURCHASE = r"""
WITH f AS (SELECT user_id,
                  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
                  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
           FROM events GROUP BY 1),
d AS (SELECT (p - v) // 1000000 AS dt_s
      FROM f WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(quantile_disc(dt_s, 0.5) AS BIGINT) AS p50_s,
       CAST(quantile_disc(dt_s, 0.9) AS BIGINT) AS p90_s
FROM d
"""


def q_kmv_audience_estimates(sf_dir: str):
    """KMV set-operation estimates — the sketch-tier payoff over HLL:
    viewer-audience and purchaser-audience sketches (ONE pass, the
    two-sided grouped KMV) compose into union / Jaccard / intersection
    estimates from ≤2k integers, because bottom-k(A ∪ B) is computable
    from the two bottom-k sketches alone. Integer core (h_k of each
    sketch + shared count) is hash-exact; the float estimates are one
    closed-form expression mirrored in SQL."""
    from vaero_ray.stages.sketch import kmv_minima_by_key, kmv_overlap_stats

    ds = _events(sf_dir, columns=["event_type", "user_id"]).filter(
        expr="event_type == 'view' or event_type == 'purchase'"
    )
    sk = kmv_minima_by_key(ds, "event_type", "user_id", k=_KMV_K)
    rows = sk.take_all()  # <= 2k sketch rows — the sketches ARE the product
    a = np.array([r["hv"] for r in rows if r["event_type"] == "view"], np.int64)
    b = np.array([r["hv"] for r in rows if r["event_type"] == "purchase"], np.int64)
    st = kmv_overlap_stats(a, b, _KMV_K)
    return pa.table(
        {
            "hk_a": pa.array([st["hk_a"]], pa.int64()),
            "hk_b": pa.array([st["hk_b"]], pa.int64()),
            "hk_union": pa.array([st["hk_union"]], pa.int64()),
            "n_shared": pa.array([st["n_shared"]], pa.int64()),
            "est_a": pa.array([st["est_a"]], pa.float64()),
            "est_b": pa.array([st["est_b"]], pa.float64()),
            "est_union": pa.array([st["est_union"]], pa.float64()),
            "jaccard": pa.array([st["jaccard"]], pa.float64()),
            "est_intersection": pa.array([st["est_intersection"]], pa.float64()),
        }
    )


SQL_KMV_OVERLAP_T = r"""
WITH m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
                  CAST({A} AS HUGEINT) AS A,  CAST({B} AS HUGEINT) AS B,
                  CAST({A2} AS HUGEINT) AS A2, CAST({B2} AS HUGEINT) AS B2),
h1 AS (
  SELECT DISTINCT event_type,
         CAST(((A * ((CASE WHEN user_id < 0
               THEN CAST(user_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
               ELSE CAST(user_id AS HUGEINT) END) % M)) % M + B) % M AS BIGINT) AS v1
  FROM events, m WHERE event_type IN ('view', 'purchase')),
hs AS (
  SELECT DISTINCT event_type,
         CAST(((A2 * CAST(xor(v1, v1 >> {XS}) AS HUGEINT)) % M + B2) % M AS BIGINT) AS hv
  FROM h1, m),
a AS (SELECT hv FROM hs WHERE event_type = 'view' ORDER BY hv LIMIT {K}),
b AS (SELECT hv FROM hs WHERE event_type = 'purchase' ORDER BY hv LIMIT {K}),
u AS (SELECT DISTINCT hv FROM (SELECT hv FROM a UNION ALL SELECT hv FROM b)
      ORDER BY hv LIMIT {K}),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_shared FROM u
      WHERE hv IN (SELECT hv FROM a) AND hv IN (SELECT hv FROM b)),
t AS (SELECT (SELECT max(hv) FROM a) AS hk_a, (SELECT max(hv) FROM b) AS hk_b,
             (SELECT max(hv) FROM u) AS hk_union, (SELECT n_shared FROM s) AS n_shared)
SELECT hk_a, hk_b, hk_union, n_shared,
       ROUND(({KM1} * CAST(2305843009213693951 AS DOUBLE)) / hk_a, 4) AS est_a,
       ROUND(({KM1} * CAST(2305843009213693951 AS DOUBLE)) / hk_b, 4) AS est_b,
       ROUND(({KM1} * CAST(2305843009213693951 AS DOUBLE)) / hk_union, 4) AS est_union,
       ROUND(CAST(n_shared AS DOUBLE) / {K}, 6) AS jaccard,
       ROUND((CAST(n_shared AS DOUBLE) / {K})
             * (({KM1} * CAST(2305843009213693951 AS DOUBLE)) / hk_union), 4)
         AS est_intersection
FROM t
"""


def _fmt_kmv_overlap_sql() -> str:
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    return SQL_KMV_OVERLAP_T.format(
        A=int(HLL_A), B=int(HLL_B), A2=int(HLL_A2), B2=int(HLL_B2),
        XS=HLL_XS, K=_KMV_K, KM1=_KMV_K - 1,
    )


SQL_KMV_OVERLAP = _fmt_kmv_overlap_sql()


def q_cms_join_size(sf_dir: str):
    """Self-join size estimation from the Count-Min sketch — the query
    planner's cardinality primitive: ``min_r sum_slot cnt_r[slot]^2``
    upper-bounds ``sum_u f(u)^2`` = |events ⋈ events ON user_id|
    (Cormode-Muthukrishnan inner product). The gate emits BOTH the
    sketch estimate and the exact value (per-user counts via one
    bounded keyed exchange, then a sum of squares), so the oracle also
    certifies the bound's tightness. Everything integer — hash-exact."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.sketch import cms_inner_product, cms_registers

    ds = _events(sf_dir, columns=["user_id"])
    regs = cms_registers(ds, "user_id", width=_CMS_W, depth=_CMS_D)
    est = cms_inner_product(
        pa.Table.from_pylist(regs.take_all()), width=_CMS_W, depth=_CMS_D
    )  # <= depth*width register rows — sketch metadata, not data

    def ones(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64), pa.int64()),
            }
        )

    per_user = bucketed_keyed_sum(
        ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], ["n"],
    )

    def sq(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"s": pa.array([int((n * n).sum())], pa.int64())})

    true_sz = int(
        per_user.map_batches(sq, batch_format="pyarrow", zero_copy_batch=True).sum("s")
    )
    return pa.table(
        {
            "est_join_size": pa.array([est], pa.int64()),
            "true_join_size": pa.array([true_sz], pa.int64()),
        }
    )


def _fmt_cms_join_sql() -> str:
    # reuse the register CTE of SQL_CMS verbatim, then min-over-rows of
    # the per-row sum of squared counters vs the exact per-user fold
    regs = SQL_CMS.strip()
    return f"""
WITH regs AS ({regs}),
e AS (SELECT CAST(min(s) AS BIGINT) AS est
      FROM (SELECT row, SUM(cnt * cnt) AS s FROM regs GROUP BY 1)),
t AS (SELECT CAST(SUM(n * n) AS BIGINT) AS tru
      FROM (SELECT COUNT(*) AS n FROM events GROUP BY user_id))
SELECT (SELECT est FROM e) AS est_join_size, (SELECT tru FROM t) AS true_join_size
"""


SQL_CMS_JOIN = _fmt_cms_join_sql()


def q_cheapest_supplier_per_part(sf_dir: str):
    """TPC-H Q2 shape: the GROUPWISE argmin equality join — per part,
    the cheapest lineitem price and the supplier achieving it (ties ->
    smallest suppkey), with the supplier name attached. The argmin is
    a MERGEABLE integer min by packing (cents << 20) | suppkey into one
    int64 (cents < 2^42, suppkey < 2^20 — asserted): per-block lexsort
    partials collapse to one row per (block, part), the keyed min
    exchange is order/shard independent, and the dimension attaches by
    broadcast — no groupwise re-join against the fact table."""
    from vaero_ray.stages.joins import broadcast_join
    from vaero_ray.stages.keyed import bucketed_keyed_agg

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def partial(tbl: pa.Table) -> pa.Table:
        cents = np.floor(
            tbl.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        sk = tbl.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pk = tbl.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(cents) and (int(cents.max()) >= 1 << 42 or int(sk.max()) >= 1 << 20):
            raise ValueError("packed argmin overflows int64; widen the packing")
        packed = (cents << 20) | sk
        import pandas as _pd

        g = (
            _pd.DataFrame({"p_partkey": pk, "packed": packed})
            .groupby("p_partkey", sort=False, as_index=False)
            .min()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_keyed_agg(partials, ["p_partkey"], {"packed": "min"})

    def unpack(tbl: pa.Table) -> pa.Table:
        packed = tbl.column("packed").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "p_partkey": tbl.column("p_partkey"),
                "min_price_cents": pa.array(packed >> 20, pa.int64()),
                "s_suppkey": pa.array(packed & ((1 << 20) - 1), pa.int64()),
            }
        )

    facts = merged.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)
    supp = (
        _read_pq(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
        .materialize()
        .take_all()
    )
    supp_tbl = pa.Table.from_pylist(supp).select(["s_suppkey", "s_name"])
    supp_tbl = pa.table(
        {
            "s_suppkey": supp_tbl.column("s_suppkey").cast(pa.int64()),
            "s_name": supp_tbl.column("s_name"),
        }
    )
    return broadcast_join(facts, supp_tbl, "s_suppkey")


SQL_CHEAPEST_SUPPLIER = r"""
WITH l AS (SELECT l_partkey AS p_partkey, l_suppkey,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
           FROM lineitem),
mn AS (SELECT p_partkey, min(cents) AS min_price_cents FROM l GROUP BY 1),
w AS (SELECT l.p_partkey, mn.min_price_cents,
             CAST(min(l.l_suppkey) AS BIGINT) AS s_suppkey
      FROM l JOIN mn ON l.p_partkey = mn.p_partkey AND l.cents = mn.min_price_cents
      GROUP BY 1, 2)
SELECT w.p_partkey, w.min_price_cents, w.s_suppkey, s.s_name
FROM w JOIN supplier s ON s.s_suppkey = w.s_suppkey
"""


def q_lateness_coverage(sf_dir: str):
    """Event-time disorder profile — the measurement that SIZES a
    watermark policy instead of guessing it: per user in arrival order
    (event_id), how far events land behind the running event-time max,
    and for each candidate allowed-lateness L the count of events a
    watermark at (max_seen - L) would declare late. One bucketed pass
    (segmented maximum.accumulate, no per-key Python); the exchange
    carries |L| count partials per bucket."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    LS = [0, 60, 300, 3600]
    ds = _events(sf_dir, columns=["user_id", "event_id", "ts"])

    def per_bucket(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        codes = _pd.factorize(df["user_id"], use_na_sentinel=False)[0]
        gs = np.r_[True, codes[1:] != codes[:-1]] if len(df) else np.zeros(0, bool)
        if len(us):
            # segmented running max via the offset trick: seg_id * BIG
            # keeps maxima from crossing user segments in one global
            # maximum.accumulate (BIG > the bucket's whole time range)
            seg_id = np.cumsum(gs) - 1
            big = int(us.max() - us.min()) + 1
            shifted = (us - us.min()) + seg_id * big
            runm = np.maximum.accumulate(shifted) - seg_id * big + us.min()
            prev = np.r_[np.int64(0), runm[:-1]]
            lu = np.maximum(prev - us, 0)
            lu[gs] = 0  # first arrival per user is never late
        else:
            lu = us
        rows = {"lateness_s": [], "n_late": []}
        for L in LS:
            rows["lateness_s"].append(L)
            rows["n_late"].append(int((lu > L * 1_000_000).sum()))
        return _pd.DataFrame(rows)

    partials = bucketed_map_groups(ds, "user_id", per_bucket)
    return bucketed_keyed_sum(partials, ["lateness_s"], ["n_late"], num_buckets=4)


SQL_LATENESS = r"""
WITH w AS (SELECT epoch_us(ts) AS us,
                  MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
           FROM events),
late AS (SELECT CASE WHEN runmax IS NULL THEN 0
                     ELSE GREATEST(runmax - us, 0) END AS lu FROM w),
ls AS (SELECT * FROM (VALUES (0), (60), (300), (3600)) t(lateness_s))
SELECT CAST(lateness_s AS BIGINT) AS lateness_s,
       CAST(COUNT(*) FILTER (WHERE lu > CAST(lateness_s AS BIGINT) * 1000000) AS BIGINT) AS n_late
FROM late, ls GROUP BY 1
"""


def q_embedding_dim_quantiles(sf_dir: str):
    """Per-dimension p25/median/p75 (+IQR) of the embedding corpus —
    the ROBUST normalization profile (median/IQR scaling shrugs off the
    outliers that pollute mean/std): components fixed-pointed to micro
    units, exploded per batch (stateless, no exchange), then every
    (dim, quantile) pair rides the SAME grouped radix-selection scans —
    zero row exchange for 64 x 3 exact quantiles."""
    from vaero_ray.stages.ann import _mat
    from vaero_ray.stages.selection import exact_group_quantiles_disc

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def explode(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {"dim": pa.array([], pa.int64()), "micro": pa.array([], pa.int64())}
            )
        m = _mat(tbl, "embedding", dtype=np.float64)
        micro = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        n, d = micro.shape
        dims = np.tile(np.arange(1, d + 1, dtype=np.int64), n)
        return pa.table(
            {"dim": pa.array(dims), "micro": pa.array(micro.reshape(-1))}
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    per = exact_group_quantiles_disc(exploded, "micro", "dim", [0.25, 0.5, 0.75])
    dims = sorted(per, key=int)  # group keys round-trip as strings
    p25 = np.array([per[d][0] for d in dims], np.int64)
    p75 = np.array([per[d][2] for d in dims], np.int64)
    return pa.table(
        {
            "dim": pa.array([int(d) for d in dims], pa.int64()),
            "p25_micro": pa.array(p25, pa.int64()),
            "p50_micro": pa.array([per[d][1] for d in dims], pa.int64()),
            "p75_micro": pa.array(p75, pa.int64()),
            "iqr_micro": pa.array(p75 - p25, pa.int64()),
        }
    )


SQL_EMBEDDING_DIM_QUANTILES = r"""
WITH u AS (SELECT unnest(range(1, len(embedding) + 1)) AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
           FROM embeddings)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(quantile_disc(m, 0.25) AS BIGINT) AS p25_micro,
       CAST(quantile_disc(m, 0.50) AS BIGINT) AS p50_micro,
       CAST(quantile_disc(m, 0.75) AS BIGINT) AS p75_micro,
       CAST(quantile_disc(m, 0.75) - quantile_disc(m, 0.25) AS BIGINT) AS iqr_micro
FROM u GROUP BY 1
"""


def q_tool_resolution_latency(sf_dir: str):
    """Tool-resolution latency SLA: the gap from each TOOL turn to the
    next turn in the conversation WHEN that turn is the assistant
    resuming (exact whole-second p50/p90/p99 + count) — how long tool
    calls stall conversations. Adjacent-pair extraction runs inside the
    conv bucket shuffle (shift + same-conv mask, no per-conv Python);
    quantiles by radix selection over the materialized gap rows."""
    import pandas as _pd

    from vaero_ray.pipelines.derived import _prep
    from vaero_ray.stages.keyed import bucketed_map_groups
    from vaero_ray.stages.selection import exact_quantiles_disc

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "ts": tbl.column("ts"),
                "event_id": tbl.column("event_id"),
                "role": tbl.column("role"),
            }
        )

    ds = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
        conv = df["conv_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        role = df["role"].to_numpy()
        same = np.r_[conv[1:] == conv[:-1], False]
        hit = same & (role == "tool") & np.r_[role[1:] == "assistant", False]
        gaps = (np.r_[us[1:], 0] - us)[hit] // 1_000_000
        return _pd.DataFrame({"gap_s": gaps.astype(np.int64)})

    gaps = bucketed_map_groups(ds, "conv_id", per_bucket).materialize()
    n = gaps.count()
    p50, p90, p99 = exact_quantiles_disc(gaps, "gap_s", [0.5, 0.9, 0.99])
    return pa.table(
        {
            "n_resolutions": pa.array([n], pa.int64()),
            "p50_s": pa.array([p50], pa.int64()),
            "p90_s": pa.array([p90], pa.int64()),
            "p99_s": pa.array([p99], pa.int64()),
        }
    )


SQL_TOOL_LATENCY = f"""
WITH {TRANSCRIPTS_CTE},
t AS (SELECT conv_id, role, epoch_us(ts) AS us,
             LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS role_next,
             LEAD(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS us_next
      FROM transcripts),
g AS (SELECT (us_next - us) // 1000000 AS gap_s
      FROM t WHERE role = 'tool' AND role_next = 'assistant')
SELECT CAST(COUNT(*) AS BIGINT) AS n_resolutions,
       CAST(quantile_disc(gap_s, 0.5) AS BIGINT) AS p50_s,
       CAST(quantile_disc(gap_s, 0.9) AS BIGINT) AS p90_s,
       CAST(quantile_disc(gap_s, 0.99) AS BIGINT) AS p99_s
FROM g
"""


def q_funnel_dropoff(sf_dir: str):
    """Funnel drop-off table view -> click -> purchase (first-touch,
    unbounded window): users reaching each step, where step i+1 is the
    first matching event AT/AFTER step i's first qualifying time. One
    bucketed shuffle; per step ONE composite searchsorted against the
    surviving frontier; the exchange carries 3 integers per bucket."""
    from vaero_ray.stages.cep import funnel_dropoff

    ds = _events(sf_dir, columns=["user_id", "ts", "event_type"])
    return funnel_dropoff(ds, "user_id", "ts", "event_type",
                          ["view", "click", "purchase"])


SQL_FUNNEL_DROPOFF = r"""
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY 1)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_reached
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM c)
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM p))
"""


def q_hourly_trend_kendall(sf_dir: str):
    """Mann-Kendall monotone-trend test per event type over the hourly
    count series — the robust companion of the OLS trend gate (sign
    statistic shrugs off outliers and level shifts): exact int64 S over
    all ordered hour pairs, tau_a 6-dp closed form. Pairwise pass runs
    on the MERGED series (hours x types rows), chunked broadcasting."""
    from vaero_ray.stages.numstats import kendall_trend_per_group

    return kendall_trend_per_group(_hourly_type_counts(sf_dir), "event_type", "hr", "c")


SQL_HOURLY_KENDALL = r"""
WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS x
           FROM events GROUP BY 1, 2),
p AS (SELECT a.event_type,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM c a JOIN c b ON a.event_type = b.event_type AND b.hr > a.hr
      GROUP BY 1),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points FROM c GROUP BY 1)
SELECT n.event_type, n.n_points, COALESCE(p.s_stat, 0) AS s_stat,
       CASE WHEN n.n_points >= 2
            THEN ROUND(CAST(COALESCE(p.s_stat, 0) AS DOUBLE)
                       / (CAST(n.n_points AS DOUBLE) * (n.n_points - 1) / 2), 6)
            END AS tau_a
FROM n LEFT JOIN p USING (event_type)
"""


def q_hourly_active_sessions(sf_dir: str):
    """Occupancy histogram — concurrent session count per hour (the ops
    concurrency metric): 30-min-gap sessions per user collapse to
    (start_hr, end_hr) spans inside the user-bucketed shuffle, then an
    INTERVAL->GRID explode (repeat + offset arange, bounded by span
    hours) and a tiny per-hour keyed sum. A session touching an hour
    counts once; the exchange after the fold carries (hr, n) partials."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    ds = _events(sf_dir, columns=["user_id", "ts"])
    GAP_US = 1800 * 1_000_000

    def per_bucket(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort").reset_index(drop=True)
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        codes = _pd.factorize(df["user_id"], use_na_sentinel=False)[0]
        new_sess = np.r_[True, (codes[1:] != codes[:-1])
                         | (us[1:] - us[:-1] > GAP_US)] if len(df) else np.zeros(0, bool)
        starts = np.flatnonzero(new_sess)
        if not len(starts):
            return _pd.DataFrame({"hr": np.array([], np.int64),
                                  "n": np.array([], np.int64)})
        ends = np.r_[starts[1:], len(df)] - 1
        h0 = us[starts] // 3_600_000_000
        h1 = us[ends] // 3_600_000_000
        spans = (h1 - h0 + 1).astype(np.int64)
        total = int(spans.sum())
        rep = np.repeat(h0, spans)
        base = np.repeat(np.cumsum(spans) - spans, spans)
        hrs = rep + (np.arange(total, dtype=np.int64) - base)
        g = _pd.DataFrame({"hr": hrs}).groupby("hr", sort=False).size().rename(
            "n"
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    partials = bucketed_map_groups(ds, "user_id", per_bucket)
    return bucketed_keyed_sum(partials, ["hr"], ["n"], num_buckets=4).map_batches(
        lambda t: t.rename_columns(["hr", "n_sessions"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


SQL_ACTIVE_SESSIONS = r"""
WITH sess_d AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
sess_s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM sess_d),
sp AS (SELECT user_id, session_id,
              epoch_us(min(ts)) // 3600000000 AS h0,
              epoch_us(max(ts)) // 3600000000 AS h1
       FROM sess_s GROUP BY 1, 2),
h AS (SELECT unnest(range(h0, h1 + 1)) AS hr FROM sp)
SELECT CAST(hr AS BIGINT) AS hr, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM h GROUP BY 1
"""


def q_value_psi_drift(sf_dir: str):
    """Population Stability Index of the money column between the first
    and second half of the observed time range, per event type — the
    standard ML-monitoring drift score, here with integer-exact bin
    counts (log2 bins via bit length, the mergeable log-histogram's
    binning) and per-BIN 6-dp contributions so no cross-bin float sum
    ever happens in either engine (SQL SUM order is unspecified; the
    reader sums rounded contributions). Two executions: a tiny min/max
    bounds pass, then per-block (type, half, bin) partials through one
    bounded exchange; bins present in only one half are omitted (PSI's
    undefined-bin case, disclosed)."""
    import pandas as _pd

    from ray.data.aggregate import Max, Min

    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    ds = _events(sf_dir, columns=["event_type", "ts", "value"])

    def hr_only(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        return pa.table({"hr": pc.divide(us, 3600000000)})

    b = ds.map_batches(hr_only, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        Min("hr"), Max("hr")
    )
    mid = (int(b["min(hr)"]) + int(b["max(hr)"]) + 1) // 2

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        hr = pc.divide(us, 3600000000).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        # bit_length(n) == frexp exponent (exact for cents < 2^53),
        # matching SQL length(bin(cents))
        bl = np.where(cents <= 0, 0, np.frexp(np.maximum(cents, 1).astype(np.float64))[1])
        df = _pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "half": (hr >= mid).astype(np.int64),
                "bin": bl.astype(np.int64),
            }
        )
        g = df.groupby(["event_type", "half", "bin"], sort=False).size().rename(
            "n"
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_keyed_sum(counts, ["event_type", "half", "bin"], ["n"], num_buckets=4)

    def finalize(df: _pd.DataFrame) -> _pd.DataFrame:
        out = []
        for et, g in df.groupby("event_type", sort=False):
            tot = g.groupby("half")["n"].sum()
            if 0 not in tot.index or 1 not in tot.index:
                continue
            a = g[g["half"] == 0].set_index("bin")["n"]
            bb = g[g["half"] == 1].set_index("bin")["n"]
            bins = sorted(set(a.index) & set(bb.index))
            for bn in bins:
                pa_ = float(a[bn]) / float(tot[0])
                pb_ = float(bb[bn]) / float(tot[1])
                out.append(
                    (et, int(bn), int(a[bn]), int(bb[bn]),
                     round((pa_ - pb_) * np.log(pa_ / pb_), 6))
                )
        return _pd.DataFrame(
            out, columns=["event_type", "bin", "n_a", "n_b", "psi_bin"]
        ).astype({"bin": "int64", "n_a": "int64", "n_b": "int64"})

    return bucketed_map_groups(merged, "event_type", finalize, num_buckets=4)


SQL_PSI_DRIFT = r"""
WITH bounds AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                       max(epoch_us(ts) // 3600000000) AS h1 FROM events),
c0 AS (SELECT event_type,
              CASE WHEN epoch_us(ts) // 3600000000 < (h0 + h1 + 1) // 2
                   THEN 0 ELSE 1 END AS half,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
       FROM events, bounds),
c AS (SELECT event_type, half,
             CASE WHEN cents <= 0 THEN 0 ELSE length(bin(cents)) END AS bin,
             COUNT(*) AS n
      FROM c0 GROUP BY 1, 2, 3),
t AS (SELECT event_type, half, SUM(n) AS tot FROM c GROUP BY 1, 2),
j AS (SELECT a.event_type, a.bin, a.n AS n_a, b.n AS n_b,
             ta.tot AS tot_a, tb.tot AS tot_b
      FROM c a
      JOIN c b ON a.event_type = b.event_type AND a.bin = b.bin
                  AND a.half = 0 AND b.half = 1
      JOIN t ta ON ta.event_type = a.event_type AND ta.half = 0
      JOIN t tb ON tb.event_type = a.event_type AND tb.half = 1)
SELECT event_type, CAST(bin AS BIGINT) AS bin,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND((CAST(n_a AS DOUBLE) / tot_a - CAST(n_b AS DOUBLE) / tot_b)
             * ln((CAST(n_a AS DOUBLE) / tot_a)
                  / (CAST(n_b AS DOUBLE) / tot_b)), 6) AS psi_bin
FROM j
"""


def q_hourly_ctr_wilson(sf_dir: str):
    """Hourly click share with the Wilson-score LOWER bound — the
    ranking-with-uncertainty primitive (a raw rate from 3 interactions
    outranks one from 30k; the Wilson bound doesn't): p = clicks /
    (views + clicks), a true proportion. Exact integer counts per hour
    through one bounded exchange, then ONE closed-form float64
    expression per row, written with the identical operation tree in
    SQL (z = 1.96 literal both sides). Zero-interaction hours omitted."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    ds = _events(sf_dir, columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        hr = pc.divide(us, 3600000000).to_numpy(zero_copy_only=False)
        df = _pd.DataFrame(
            {
                "hr": hr,
                "n_views": (et == "view").astype(np.int64),
                "n_clicks": (et == "click").astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("hr", sort=False, as_index=False).sum(), preserve_index=False
        )

    counts = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["hr"], ["n_views", "n_clicks"], num_buckets=4,
    )

    def finalize(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df[(df["n_views"] + df["n_clicks"]) > 0].copy()
        nf = (df["n_views"] + df["n_clicks"]).to_numpy().astype(np.float64)
        kf = df["n_clicks"].to_numpy().astype(np.float64)
        p = kf / nf
        z = 1.96
        lb = (p + z * z / (2 * nf)
              - z * np.sqrt((p * (1 - p) + z * z / (4 * nf)) / nf)) / (1 + z * z / nf)
        df["ctr"] = np.round(p, 6)
        df["wilson_lb"] = np.round(lb, 6)
        return df

    return bucketed_map_groups(counts, "hr", finalize, num_buckets=4)


SQL_CTR_WILSON = r"""
WITH c AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_views,
                  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_clicks
           FROM events GROUP BY 1),
f AS (SELECT hr, n_views, n_clicks,
             CAST(n_clicks AS DOUBLE) / (n_views + n_clicks) AS p,
             CAST(n_views + n_clicks AS DOUBLE) AS nf
      FROM c WHERE n_views + n_clicks > 0)
SELECT CAST(hr AS BIGINT) AS hr, n_views, n_clicks,
       ROUND(p, 6) AS ctr,
       ROUND((p + 1.96 * 1.96 / (2 * nf)
              - 1.96 * sqrt((p * (1 - p) + 1.96 * 1.96 / (4 * nf)) / nf))
             / (1 + 1.96 * 1.96 / nf), 6) AS wilson_lb
FROM f
"""


def q_length_ks_en_rest(sf_dir: str):
    """Two-sample KS test: do English documents have a different length
    distribution than the rest of the corpus? Exact integer max-CDF-gap
    via distinct-value compression (one (len, c_en, c_rest) row per
    distinct length moves, never documents) — the binning-free
    distribution-shift test beside PSI."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.numstats import ks_two_sample

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        en = pc.equal(t.column("lang"), "en").to_numpy(zero_copy_only=False)
        df = _pd.DataFrame(
            {
                "v": t.column("n_chars").to_numpy(zero_copy_only=False),
                "c1": en.astype(np.int64),
                "c2": (~en).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("v", sort=False, as_index=False).sum(), preserve_index=False
        )

    merged = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["v"], ["c1", "c2"], num_buckets=4,
    )
    return ks_two_sample(merged, "v")


SQL_LENGTH_KS = r"""
WITH a AS (SELECT n_chars AS v,
                  COUNT(*) FILTER (WHERE lang = 'en') AS c1,
                  COUNT(*) FILTER (WHERE lang <> 'en') AS c2
           FROM documents GROUP BY 1),
w AS (SELECT v, SUM(c1) OVER (ORDER BY v) AS cum1,
             SUM(c2) OVER (ORDER BY v) AS cum2 FROM a),
t AS (SELECT (SELECT SUM(c1) FROM a) AS n1, (SELECT SUM(c2) FROM a) AS n2)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(max(abs(n2 * cum1 - n1 * cum2)) AS BIGINT) AS d_scaled,
       ROUND(CAST(max(abs(n2 * cum1 - n1 * cum2)) AS DOUBLE) / (n1 * n2), 6) AS d_stat
FROM w, t GROUP BY n1, n2
"""


# ------------------------------------------------------------------
# Session-7 batch 6: TPC-H Q10/Q15/Q16/Q22 shapes over the available
# columns — returned-item top customers, max-equality supplier,
# distinct-suppliers-per-(brand,size), rich-churned anti join
# ------------------------------------------------------------------

def q_returned_item_revenue(sf_dir: str):
    """TPC-H-Q10 shape: top-20 customers by revenue lost to returned
    items ('R' line items of 1996-H1 orders) with name / balance /
    nation attached. Composition: per-block cents partials by orderkey
    on the lineitem scan, adaptive join to the window-filtered orders,
    exact per-customer integer sum, THEN the two dimension attachments
    run on the aggregate (one row per returning customer, never line
    items) — nation broadcast (25 rows), customer via auto_join.
    Deterministic top-20: (revenue DESC, custkey ASC) via the negated
    tie key."""
    import datetime as _dt

    from ray.data.aggregate import Sum

    from vaero_ray.stages.joins import auto_join, broadcast_join

    lo = pa.scalar(_dt.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 7, 1), pa.timestamp("us"))

    def order_window(tbl: pa.Table) -> pa.Table:
        d = tbl.column("o_orderdate")
        t = tbl.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return pa.table({"o_orderkey": t.column("o_orderkey"), "c_custkey": t.column("o_custkey")})

    orders = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_window, batch_format="pyarrow", zero_copy_batch=True)

    def line_rev_partial(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(tbl.column("l_returnflag"), "R"))
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(
                            t.column("l_extendedprice"),
                            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
                        ),
                        pa.scalar(100.0),
                    ),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        )
        g = (
            pa.table({"o_orderkey": t.column("l_orderkey"), "cents": cents})
            .group_by("o_orderkey")
            .aggregate([("cents", "sum")])
        )
        return pa.table({"o_orderkey": g.column("o_orderkey"), "rev": g.column("cents_sum")})

    line = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(line_rev_partial, batch_format="pyarrow", zero_copy_batch=True)

    per_cust = (
        auto_join(line, orders, keys="o_orderkey")
        .groupby("c_custkey")
        .aggregate(Sum("rev", alias_name="revenue_cents"))
    )

    def cust_prep(tbl: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(tbl.column("c_acctbal"), pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return pa.table(
            {
                "c_custkey": tbl.column("c_custkey"),
                "c_name": tbl.column("c_name"),
                "acctbal_cents": cents,
                "c_nationkey": tbl.column("c_nationkey"),
            }
        )

    cust = _read_pq(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    ).map_batches(cust_prep, batch_format="pyarrow", zero_copy_batch=True)
    nat = (
        pq.read_table(f"{sf_dir}/nation.parquet")
        .select(["n_nationkey", "n_name"])
        .rename_columns(["c_nationkey", "n_name"])
    )

    enriched = broadcast_join(
        auto_join(per_cust, cust, keys="c_custkey"), nat, keys="c_nationkey"
    ).drop_columns(["c_nationkey"])
    ranked = enriched.map_batches(
        lambda t: t.append_column("__nk", pc.negate(pc.cast(t.column("c_custkey"), pa.int64()))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ranked.sort(["revenue_cents", "__nk"], descending=True).limit(20).drop_columns(["__nk"])


SQL_RETURNED_REVENUE = r"""
WITH l AS (SELECT l_orderkey,
                  CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
           FROM lineitem WHERE l_returnflag = 'R'),
o AS (SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'),
r AS (SELECT o.o_custkey, CAST(SUM(l.cents) AS BIGINT) AS revenue_cents
      FROM l JOIN o ON l.l_orderkey = o.o_orderkey GROUP BY 1)
SELECT c.c_custkey, c.c_name, r.revenue_cents,
       CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents, n.n_name
FROM r JOIN customer c ON r.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY r.revenue_cents DESC, c.c_custkey LIMIT 20
"""


def q_top_revenue_supplier(sf_dir: str):
    """TPC-H-Q15 shape (max-equality scalar subquery): the supplier(s)
    whose 1996-Q1 shipped revenue equals the GLOBAL max. Per-block cents
    partials by suppkey -> one bounded exchange (#suppliers rows) ->
    the materialized per-supplier aggregate is probed twice (max scalar,
    then the equality filter) without re-reading lineitem; only the
    TIED winners (a handful of rows by construction) come to the driver
    and broadcast into a distributed filter over the supplier table —
    supplier itself is never collected."""
    import datetime as _dt

    from ray.data.aggregate import Sum

    lo = pa.scalar(_dt.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 4, 1), pa.timestamp("us"))

    def partial(tbl: pa.Table) -> pa.Table:
        d = tbl.column("l_shipdate")
        t = tbl.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(
                            t.column("l_extendedprice"),
                            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
                        ),
                        pa.scalar(100.0),
                    ),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        )
        g = (
            pa.table({"s_suppkey": t.column("l_suppkey"), "cents": cents})
            .group_by("s_suppkey")
            .aggregate([("cents", "sum")])
        )
        return pa.table({"s_suppkey": g.column("s_suppkey"), "rev": g.column("cents_sum")})

    revs = (
        _read_pq(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("s_suppkey")
        .aggregate(Sum("rev", alias_name="rev_cents"))
        .materialize()  # one row per supplier — bounded, reused twice
    )
    mx = revs.max("rev_cents")
    winners = {
        r["s_suppkey"]: r["rev_cents"]
        for r in revs.filter(lambda row: row["rev_cents"] == mx).take_all()
    }  # ties-only: a handful of rows by construction

    def pick(tbl: pa.Table) -> pa.Table:
        keys = np.asarray(tbl.column("s_suppkey").to_numpy(zero_copy_only=False))
        wk = np.fromiter(winners.keys(), dtype=np.int64, count=len(winners))
        mask = np.isin(keys, wk)
        t = tbl.filter(pa.array(mask))
        rev = pa.array(
            [winners[int(k)] for k in t.column("s_suppkey").to_pylist()], pa.int64()
        )
        return pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "s_name": t.column("s_name"),
                "rev_cents": rev,
            }
        )

    return _read_pq(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


SQL_TOP_SUPPLIER = r"""
WITH r AS (SELECT l_suppkey,
                  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.rev AS rev_cents
FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
WHERE r.rev = (SELECT MAX(rev) FROM r)
"""


def q_brand_size_supplier_counts(sf_dir: str):
    """TPC-H-Q16 shape: COUNT(DISTINCT supplier) per (brand, size) —
    the distinct-agg-after-join composition. lineitem (part, supp)
    pairs are block-locally DEDUPED before the join exchange (orders
    repeat pairs heavily), joined to the filtered part dimension, then
    the salted-distinct pattern: triples dedupe per block, shuffle by
    hash(suppkey) so a supplier lands in exactly one bucket (per-bucket
    per-group counts are disjoint — no task sees a whole hot group),
    tiny keyed sum merges. Brand#45 excluded as in Q16."""
    from vaero_ray.stages.joins import auto_join
    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    def pair_partial(tbl: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"p_partkey": tbl.column("l_partkey"), "s": tbl.column("l_suppkey")}
            )
            .group_by(["p_partkey", "s"])
            .aggregate([])
        )
        return g

    pairs = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)

    def part_prep(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.invert(pc.equal(tbl.column("p_brand"), "Brand#45")))
        return t.select(["p_partkey", "p_brand", "p_size"])

    part = _read_pq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(part_prep, batch_format="pyarrow", zero_copy_batch=True)

    triples = auto_join(pairs, part, keys="p_partkey").drop_columns(["p_partkey"])

    def dedup_block(tbl: pa.Table) -> pa.Table:
        return tbl.group_by(["p_brand", "p_size", "s"]).aggregate([])

    triples = triples.map_batches(dedup_block, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df):
        import pandas as _pd

        g = df.drop_duplicates(["p_brand", "p_size", "s"]).groupby(
            ["p_brand", "p_size"], sort=False
        )
        out = g.size().rename("supplier_cnt").reset_index()
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out[["p_brand", "p_size", "supplier_cnt"]]

    partials = bucketed_map_groups(triples, "s", per_bucket)
    return bucketed_keyed_sum(partials, ["p_brand", "p_size"], ["supplier_cnt"])


SQL_BRAND_SIZE_SUPPLIERS = r"""
SELECT p.p_brand, p.p_size, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#45'
GROUP BY 1, 2
"""


def q_rich_inactive_customers(sf_dir: str):
    """TPC-H-Q22 shape (scalar-subquery threshold + anti join): per
    nation, the count and total balance of customers with
    ABOVE-AVERAGE positive account balance and NO orders in the last
    year of the data. The average threshold is compared exactly as the
    cross-multiplied integers cents*n > total (no float division on
    either engine); recent orders shrink to distinct custkeys inside
    the anti semi-join; the final nation attachment broadcasts 25
    rows against the per-nation aggregate."""
    import datetime as _dt

    from ray.data.aggregate import Count, Sum

    from vaero_ray.stages.joins import broadcast_join, semi_join
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    def cust_prep(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.greater(tbl.column("c_acctbal"), 0.0))
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t.column("c_acctbal"), pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_nationkey": t.column("c_nationkey"),
                "cents": cents,
            }
        )

    cust = _read_pq(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(cust_prep, batch_format="pyarrow", zero_copy_batch=True)

    agg = cust.aggregate(Sum("cents", alias_name="total"), Count(alias_name="n"))
    total, n = int(agg["total"]), int(agg["n"])  # two driver scalars

    rich = cust.map_batches(
        lambda t: t.filter(
            pc.greater(pc.multiply(t.column("cents"), pa.scalar(n, pa.int64())), pa.scalar(total, pa.int64()))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    cut = pa.scalar(_dt.datetime(2000, 8, 1), pa.timestamp("us"))

    def recent_keys(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.greater_equal(tbl.column("o_orderdate"), cut))
        return pa.table({"c_custkey": t.column("o_custkey")})

    recent = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(recent_keys, batch_format="pyarrow", zero_copy_batch=True)

    churned = semi_join(rich, recent, keys="c_custkey", anti=True)

    def per_nation_partial(tbl: pa.Table) -> pa.Table:
        g = (
            pa.table({"c_nationkey": tbl.column("c_nationkey"), "cents": tbl.column("cents")})
            .group_by("c_nationkey")
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        return pa.table(
            {
                "c_nationkey": g.column("c_nationkey"),
                "bal_cents": g.column("cents_sum"),
                "n_cust": g.column("cents_count").cast(pa.int64()),
            }
        )

    per_nat = bucketed_keyed_sum(
        churned.map_batches(per_nation_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["c_nationkey"],
        ["bal_cents", "n_cust"],
    )
    nat = (
        pq.read_table(f"{sf_dir}/nation.parquet")
        .select(["n_nationkey", "n_name"])
        .rename_columns(["c_nationkey", "n_name"])
    )
    return broadcast_join(per_nat, nat, keys="c_nationkey").drop_columns(["c_nationkey"])


SQL_RICH_INACTIVE = r"""
WITH p AS (SELECT c_custkey, c_nationkey,
                  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
           FROM customer WHERE c_acctbal > 0.0),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n FROM p),
r AS (SELECT p.* FROM p, t WHERE p.cents * t.n > t.total
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-08-01'))
SELECT n.n_name, CAST(SUM(r.cents) AS BIGINT) AS bal_cents,
       CAST(COUNT(*) AS BIGINT) AS n_cust
FROM r JOIN nation n ON r.c_nationkey = n.n_nationkey GROUP BY 1
"""


# ------------------------------------------------------------------
# TPC-H Q7/Q8/Q9/Q19/Q20/Q21 join shapes (adapted: the driver tables
# carry no partsupp / commitdate / shipmode, so each query keeps the
# REFERENCE SHAPE — the join topology + aggregate skeleton — over the
# columns that exist; reference parity target is the shape inventory
# of SURVEY.md §2's analytics tier)
# ------------------------------------------------------------------


def _line_cents(tbl: pa.Table) -> pa.Array:
    """floor(ext * (1 - disc) * 100 + 0.5) — the engine-wide fixed-point
    revenue chain (identical left-assoc float64 expression in every SQL
    oracle, so partial sums are order/shard-invariant int64)."""
    return pc.cast(
        pc.floor(
            pc.add(
                pc.multiply(
                    pc.multiply(
                        tbl.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), tbl.column("l_discount")),
                    ),
                    pa.scalar(100.0),
                ),
                pa.scalar(0.5),
            )
        ),
        pa.int64(),
    )


def _typed_empty(cols: "dict[str, pa.DataType]") -> pa.Table:
    """Typed empty output for post-join kernels: empty blocks from derived
    datasets can carry no columns (the documented trap guarded in
    joins/graph/sketch), so every kernel downstream of a join returns this
    instead of touching t.column()."""
    return pa.table({c: pa.array([], typ) for c, typ in cols.items()})


def _supp_nation_ds(sf_dir: str) -> rd.Dataset:
    """supplier ⋈ nation as a Dataset keyed ``l_suppkey`` → ``supp_nation``.
    nation (25 rows) resolves driver-side; supplier stays a Dataset so the
    downstream ``auto_join`` picks broadcast vs partitioned from its
    ACTUAL size (SF·10k rows: broadcast here, hash join at 100-TB SF)."""
    from vaero_ray.stages.joins import broadcast_join

    nat = (
        pq.read_table(f"{sf_dir}/nation.parquet")
        .select(["n_nationkey", "n_name"])
        .rename_columns(["s_nationkey", "supp_nation"])
    )
    supp = _read_pq(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    return broadcast_join(supp, nat, keys="s_nationkey").map_batches(
        lambda t: pa.table(
            {"l_suppkey": t.column("s_suppkey"), "supp_nation": t.column("supp_nation")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_nation_pair_volume(sf_dir: str):
    """TPC-H Q7 shape — cross-nation trade volume per (supp_nation,
    cust_nation, ship year): the two-dimension join where NEITHER
    dimension lives on the fact row (supplier side via l_suppkey,
    customer side via orders ⋈ customer). Both fact exchanges are
    adaptive joins (the dims are only small at test SF); revenue is
    fixed-pointed per line BEFORE the joins so the final merge is an
    integer keyed sum over ≤ nations² × years rows."""
    from vaero_ray.stages.joins import auto_join, broadcast_join
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    nat_c = (
        pq.read_table(f"{sf_dir}/nation.parquet")
        .select(["n_nationkey", "n_name"])
        .rename_columns(["c_nationkey", "cust_nation"])
    )
    cust = _read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust_nat = broadcast_join(cust, nat_c, keys="c_nationkey").drop_columns(
        ["c_nationkey"]
    )
    orders = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    orders_nat = (
        auto_join(
            orders.map_batches(
                lambda t: t.rename_columns(["o_orderkey", "c_custkey"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            cust_nat,
            keys="c_custkey",
        )
        .drop_columns(["c_custkey"])
        .map_batches(
            lambda t: t.rename_columns(["l_orderkey", "cust_nation"])
            if t.num_rows
            else _typed_empty({"l_orderkey": pa.int64(), "cust_nation": pa.string()}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def line_proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "l_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
                "cents": _line_cents(t),
            }
        )

    line = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(line_proj, batch_format="pyarrow", zero_copy_batch=True)
    j = auto_join(line, _supp_nation_ds(sf_dir), keys="l_suppkey")
    j = auto_join(j, orders_nat, keys="l_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _typed_empty(
                {"supp_nation": pa.string(), "cust_nation": pa.string(),
                 "l_year": pa.int64(), "revenue_cents": pa.int64()}
            )
        t = t.filter(pc.invert(pc.equal(t.column("supp_nation"), t.column("cust_nation"))))
        g = (
            t.select(["supp_nation", "cust_nation", "l_year", "cents"])
            .group_by(["supp_nation", "cust_nation", "l_year"])
            .aggregate([("cents", "sum")])
        )
        return g.rename_columns(["supp_nation", "cust_nation", "l_year", "revenue_cents"])

    partials = j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_keyed_sum(
        partials, ["supp_nation", "cust_nation", "l_year"], ["revenue_cents"], num_buckets=4
    )


SQL_NATION_PAIR_VOLUME = r"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY 1, 2, 3
"""


def q_promo_market_share(sf_dir: str):
    """TPC-H Q8 shape — every supplier nation's share of PROMO-part
    revenue per order year, emitted as EXACT integer (nation_cents,
    total_cents) pairs instead of a float ratio (the driver hash is
    order-insensitive but float-exact; the ratio is downstream's one
    division). The year total rides the same bucketed exchange as the
    per-nation merge: buckets key on o_year, so a vectorized transform
    sum inside the bucket sees every nation of that year."""
    from vaero_ray.stages.joins import auto_join
    from vaero_ray.stages.keyed import bucketed_map_groups

    part = _read_pq(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    promo = part.map_batches(
        lambda t: pa.table(
            {"l_partkey": t.filter(pc.equal(t.column("p_type"), "PROMO")).column("p_partkey")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    line = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "cents": _line_cents(t),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = auto_join(line, promo, keys="l_partkey").drop_columns(["l_partkey"])
    j = auto_join(j, _supp_nation_ds(sf_dir), keys="l_suppkey")
    orders = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = auto_join(j, orders, keys="l_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _typed_empty(
                {"o_year": pa.int64(), "supp_nation": pa.string(), "nation_cents": pa.int64()}
            )
        g = (
            t.select(["o_year", "supp_nation", "cents"])
            .group_by(["o_year", "supp_nation"])
            .aggregate([("cents", "sum")])
        )
        return g.rename_columns(["o_year", "supp_nation", "nation_cents"])

    partials = j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_year(df):
        g = df.groupby(["o_year", "supp_nation"], sort=False, as_index=False)[
            "nation_cents"
        ].sum()
        g["total_cents"] = g.groupby("o_year")["nation_cents"].transform("sum")
        return g

    return bucketed_map_groups(partials, "o_year", per_year, num_buckets=4)


SQL_PROMO_MARKET_SHARE = r"""
WITH v AS (
  SELECT year(o.o_orderdate) AS o_year, ns.n_name AS supp_nation,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey),
g AS (SELECT o_year, supp_nation, SUM(cents) AS nation_cents FROM v GROUP BY 1, 2)
SELECT CAST(o_year AS BIGINT) AS o_year, supp_nation,
       CAST(nation_cents AS BIGINT) AS nation_cents,
       CAST(SUM(nation_cents) OVER (PARTITION BY o_year) AS BIGINT) AS total_cents
FROM g
"""


def q_part_type_profit(sf_dir: str):
    """TPC-H Q9 shape — profit by (supplier nation, ship year) for one
    part type, with the supply cost proxied at 50% of p_retailprice
    (the driver tables carry no partsupp.ps_supplycost). Revenue and
    cost are each fixed-pointed per line item with the oracle's exact
    float64 chain, so the profit partial is an int64 the keyed sum can
    merge in any order."""
    from vaero_ray.stages.joins import auto_join
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    part = _read_pq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type", "p_retailprice"]
    ).map_batches(
        lambda t: (lambda f: pa.table(
            {"l_partkey": f.column("p_partkey"), "p_retailprice": f.column("p_retailprice")}
        ))(t.filter(pc.equal(t.column("p_type"), "PROMO"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    line = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_partkey",
            "l_suppkey",
            "l_shipdate",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )
    j = auto_join(line, part, keys="l_partkey")

    def profit(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _typed_empty(
                {"l_suppkey": pa.int64(), "l_year": pa.int64(), "profit_cents": pa.int64()}
            )
        cost = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(t.column("p_retailprice"), t.column("l_quantity")),
                        pa.scalar(50.0),
                    ),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_suppkey": t.column("l_suppkey"),
                "l_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
                "profit_cents": pc.subtract(_line_cents(t), cost),
            }
        )

    j = j.map_batches(profit, batch_format="pyarrow", zero_copy_batch=True)
    j = auto_join(j, _supp_nation_ds(sf_dir), keys="l_suppkey")

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _typed_empty(
                {"supp_nation": pa.string(), "l_year": pa.int64(), "profit_cents": pa.int64()}
            )
        g = (
            t.select(["supp_nation", "l_year", "profit_cents"])
            .group_by(["supp_nation", "l_year"])
            .aggregate([("profit_cents", "sum")])
        )
        return g.rename_columns(["supp_nation", "l_year", "profit_cents"])

    partials = j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_keyed_sum(
        partials, ["supp_nation", "l_year"], ["profit_cents"], num_buckets=4
    )


SQL_PART_TYPE_PROFIT = r"""
SELECT ns.n_name AS supp_nation, CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
              - CAST(floor(p.p_retailprice * l.l_quantity * 50 + 0.5) AS BIGINT))
            AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
GROUP BY 1, 2
"""


def q_disjunctive_brand_revenue(sf_dir: str):
    """TPC-H Q19 shape — revenue under an OR of three conjunctive
    (brand, size band, quantity band) clauses: the disjunctive-predicate
    pattern that defeats naive predicate pushdown. The part side prunes
    to the three brands BEFORE the adaptive join; the clause disjunction
    evaluates as one vectorized boolean expression per batch; output is
    a single exact row (n_lines, revenue_cents) from int64 partials."""
    from ray.data.aggregate import Count, Sum

    from vaero_ray.stages.joins import auto_join

    part = _read_pq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(
        lambda t: (lambda f: pa.table(
            {
                "l_partkey": f.column("p_partkey"),
                "p_brand": f.column("p_brand"),
                "p_size": f.column("p_size"),
            }
        ))(t.filter(
            pc.is_in(t.column("p_brand"), value_set=pa.array(["Brand#1", "Brand#2", "Brand#3"]))
        )),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    line = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    j = auto_join(line, part, keys="l_partkey")

    def clause_filter(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _typed_empty({"cents": pa.int64()})
        brand = t.column("p_brand")
        size = t.column("p_size")
        qty = t.column("l_quantity")

        def band(b, smax, qlo, qhi):
            return pc.and_(
                pc.and_(pc.equal(brand, b), pc.less_equal(size, smax)),
                pc.and_(
                    pc.greater_equal(qty, pa.scalar(float(qlo))),
                    pc.less_equal(qty, pa.scalar(float(qhi))),
                ),
            )

        keep = pc.or_(
            pc.or_(band("Brand#1", 15, 1, 20), band("Brand#2", 25, 10, 35)),
            band("Brand#3", 35, 20, 50),
        )
        t = t.filter(keep)
        return pa.table({"cents": _line_cents(t)})

    f = j.map_batches(clause_filter, batch_format="pyarrow", zero_copy_batch=True)
    agg = f.aggregate(Count(), Sum("cents"))
    return pa.table(
        {
            "n_lines": pa.array([int(agg["count()"] or 0)], pa.int64()),
            "revenue_cents": pa.array([int(agg["sum(cents)"] or 0)], pa.int64()),
        }
    )


SQL_DISJUNCTIVE_REVENUE = r"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 15 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size <= 25 AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size <= 35 AND l.l_quantity BETWEEN 20 AND 50)
"""


def q_dominant_part_suppliers(sf_dir: str):
    """TPC-H Q20 shape — (part, supplier) pairs where the supplier moved
    more than DOUBLE the fair share of that part's total shipped
    quantity (q · n_supp > 2 · total, exact integers; parts with < 3
    suppliers excluded): the correlated-aggregate semi-join, done in ONE
    exchange — bucketing on l_partkey co-locates every supplier row of
    a part, so the per-part total/count and the share filter are a
    vectorized transform inside the same bucket that merges the
    per-block (part, supp) partials."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(t.column("l_quantity"), pa.int64())
        g = (
            pa.table(
                {"l_partkey": t.column("l_partkey"), "l_suppkey": t.column("l_suppkey"), "q": q}
            )
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([("q", "sum")])
        )
        return g.rename_columns(["l_partkey", "l_suppkey", "q"])

    line = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey", "l_quantity"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(df):
        ps = df.groupby(["l_partkey", "l_suppkey"], sort=False, as_index=False)["q"].sum()
        ps["part_qty"] = ps.groupby("l_partkey")["q"].transform("sum")
        ps["n_supp"] = ps.groupby("l_partkey")["q"].transform("size").astype("int64")
        out = ps[(ps["n_supp"] >= 3) & (ps["q"] * ps["n_supp"] > 2 * ps["part_qty"])]
        return out.rename(columns={"q": "qty"}).reset_index(drop=True)

    return bucketed_map_groups(line, "l_partkey", per_part, num_buckets=4)


SQL_DOMINANT_SUPPLIERS = r"""
WITH ps AS (SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q
            FROM lineitem GROUP BY 1, 2),
pt AS (SELECT l_partkey, SUM(q) AS tot, COUNT(*) AS nsup FROM ps GROUP BY 1)
SELECT ps.l_partkey, ps.l_suppkey, CAST(ps.q AS BIGINT) AS qty,
       CAST(pt.tot AS BIGINT) AS part_qty, CAST(pt.nsup AS BIGINT) AS n_supp
FROM ps JOIN pt USING (l_partkey)
WHERE pt.nsup >= 3 AND ps.q * pt.nsup > 2 * pt.tot
"""


def q_order_blocker_suppliers(sf_dir: str):
    """TPC-H Q21 shape — per multi-supplier order, the UNIQUE supplier
    holding the strictly latest ship date (the order's "blocker"),
    counted per supplier: the exists + not-exists self-join on the fact
    table, collapsed to one exchange — per-block (order, supplier) max
    partials bucket on l_orderkey, the bucket kernel merges maxes and
    resolves n_suppliers / order max / uniqueness vectorized, and only
    tiny (supplier, count) partials leave the bucket for the final
    keyed sum."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        g = (
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "l_suppkey": t.column("l_suppkey"),
                    "smax": us,
                }
            )
            .group_by(["l_orderkey", "l_suppkey"])
            .aggregate([("smax", "max")])
        )
        return g.rename_columns(["l_orderkey", "l_suppkey", "smax"])

    line = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_order(df):
        sm = df.groupby(["l_orderkey", "l_suppkey"], sort=False, as_index=False)["smax"].max()
        g = sm.groupby("l_orderkey")["smax"]
        sm["omax"] = g.transform("max")
        sm["nsupp"] = g.transform("size").astype("int64")
        at_max = sm[(sm["nsupp"] >= 2) & (sm["smax"] == sm["omax"])].copy()
        at_max["n_at_max"] = at_max.groupby("l_orderkey")["l_suppkey"].transform("size")
        uniq = at_max[at_max["n_at_max"] == 1]
        out = uniq.groupby("l_suppkey", sort=False, as_index=False).size()
        out = out.rename(columns={"size": "n_blocked"})
        out["n_blocked"] = out["n_blocked"].astype("int64")
        return out

    partials = bucketed_map_groups(line, "l_orderkey", per_order, num_buckets=4)
    return bucketed_keyed_sum(partials, ["l_suppkey"], ["n_blocked"], num_buckets=2)


SQL_ORDER_BLOCKERS = r"""
WITH sm AS (SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax
            FROM lineitem GROUP BY 1, 2),
om AS (SELECT l_orderkey, MAX(smax) AS omax, COUNT(*) AS nsupp FROM sm GROUP BY 1),
b AS (SELECT sm.l_orderkey, MAX(sm.l_suppkey) AS the_supp
      FROM sm JOIN om USING (l_orderkey)
      WHERE om.nsupp >= 2 AND sm.smax = om.omax
      GROUP BY 1 HAVING COUNT(*) = 1)
SELECT the_supp AS l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_blocked
FROM b GROUP BY 1
"""





def q_length_token_spearman(sf_dir: str):
    """Global Spearman rank correlation of (n_chars, n_tokens) — the
    monotone-association complement to the Pearson gate. Ranks depend
    only on the VALUE distribution, so the whole statistic computes from
    the joint (x, y) PAIR-COUNT table: per-block pair counts, one
    bucketed keyed-sum exchange bounded by DISTINCT pairs (never rows),
    then a driver finalize that builds the tie-averaged rank maps and
    the moment sums in arbitrary-precision Python ints — exact at any
    corpus size (the SQL mirror casts through HUGEINT). rho emitted as
    floor(rho * 1e6 + 0.5) from the identical float64 expression
    A / (sqrt(B) * sqrt(C)) both engines."""
    import math

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["text", "n_chars"])

    def pair_counts(t: pa.Table) -> pa.Table:
        wt = token_counts(t, "text")
        g = (
            pa.table({"x": wt.column("n_chars"), "y": wt.column("n_tokens")})
            .group_by(["x", "y"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["x", "y", "c"])

    pairs = ds.map_batches(pair_counts, batch_format="pyarrow", zero_copy_batch=True)
    merged = pa.Table.from_pylist(
        bucketed_keyed_sum(pairs, ["x", "y"], ["c"], num_buckets=4).take_all()
    )
    xs = merged.column("x").to_pylist()
    ys = merged.column("y").to_pylist()
    cs = merged.column("c").to_pylist()

    def rank2_map(vals, cnts):
        # 2 * tie-averaged rank per distinct value: 2*cum_before + c + 1
        per = {}
        for v, c in zip(vals, cnts):
            per[v] = per.get(v, 0) + c
        out, cum = {}, 0
        for v in sorted(per):
            out[v] = 2 * cum + per[v] + 1
            cum += per[v]
        return out

    r2x = rank2_map(xs, cs)
    r2y = rank2_map(ys, cs)
    n = sx = sy = sxx = syy = sxy = 0
    for x, y, c in zip(xs, ys, cs):
        rx, ry = r2x[x], r2y[y]
        n += c
        sx += c * rx
        sy += c * ry
        sxx += c * rx * rx
        syy += c * ry * ry
        sxy += c * rx * ry
    a = n * sxy - sx * sy
    b = n * sxx - sx * sx
    cc = n * syy - sy * sy
    rho = float(a) / (math.sqrt(float(b)) * math.sqrt(float(cc)))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "rho_e6": pa.array([math.floor(rho * 1e6 + 0.5)], pa.int64()),
        }
    )


SQL_SPEARMAN = r"""
WITH t AS (SELECT n_chars AS x,
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS y
           FROM documents),
r AS (SELECT 2 * RANK() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x) - 1 AS rx,
             2 * RANK() OVER (ORDER BY y) + COUNT(*) OVER (PARTITION BY y) - 1 AS ry
      FROM t),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
             SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
             SUM(CAST(ry AS HUGEINT) * ry) AS syy,
             SUM(CAST(rx AS HUGEINT) * ry) AS sxy
      FROM r)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE)
                   / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
                  * 1000000 + 0.5) AS BIGINT) AS rho_e6
FROM m
"""




def q_length_token_kendall(sf_dir: str):
    """Global Kendall tau-b of (n_chars, n_tokens) — the third
    association measure next to Pearson/Spearman, exact under heavy
    ties. Rides the SAME joint pair-count exchange as the Spearman gate
    (bounded by distinct pairs, never rows); the driver finalize counts
    concordant/discordant pairs with a Fenwick tree over y-ranks in one
    x-ascending sweep over DISTINCT pairs (O(P log P), arbitrary-
    precision ints), versus the oracle's O(P^2) distinct-pair self-join.
    tau emitted as floor(tau * 1e6 + 0.5) from the identical float64
    expression (C - D) / sqrt((n0 - n1) * (n0 - n2))."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["text", "n_chars"])

    def pair_counts(t: pa.Table) -> pa.Table:
        wt = token_counts(t, "text")
        g = (
            pa.table({"x": wt.column("n_chars"), "y": wt.column("n_tokens")})
            .group_by(["x", "y"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["x", "y", "c"])

    pairs = ds.map_batches(pair_counts, batch_format="pyarrow", zero_copy_batch=True)
    merged = pa.Table.from_pylist(
        bucketed_keyed_sum(pairs, ["x", "y"], ["c"], num_buckets=4).take_all()
    )
    from vaero_ray.stages.numstats import kendall_tau_from_pairs

    r = kendall_tau_from_pairs(
        merged.column("x").to_pylist(),
        merged.column("y").to_pylist(),
        merged.column("c").to_pylist(),
    )
    return pa.table(
        {
            "n": pa.array([r["n"]], pa.int64()),
            "conc": pa.array([r["conc"]], pa.int64()),
            "disc": pa.array([r["disc"]], pa.int64()),
            "tau_e6": pa.array([r["tau_e6"]], pa.int64()),
        }
    )


SQL_KENDALL = r"""
WITH t AS (SELECT n_chars AS x,
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS y
           FROM documents),
c AS (SELECT x, y, CAST(COUNT(*) AS HUGEINT) AS n FROM t GROUP BY 1, 2),
p AS (SELECT
        COALESCE(SUM(a.n * b.n) FILTER (WHERE b.x < a.x AND b.y < a.y), 0) AS conc,
        COALESCE(SUM(a.n * b.n) FILTER (WHERE b.x < a.x AND b.y > a.y), 0) AS disc
      FROM c a, c b),
m AS (SELECT CAST(SUM(n) AS HUGEINT) AS nn,
             CAST(SUM(n * (n - 1) / 2) AS HUGEINT) AS n3 FROM c),
tx AS (SELECT CAST(SUM(s * (s - 1) / 2) AS HUGEINT) AS n1
       FROM (SELECT SUM(n) AS s FROM c GROUP BY x)),
ty AS (SELECT CAST(SUM(s * (s - 1) / 2) AS HUGEINT) AS n2
       FROM (SELECT SUM(n) AS s FROM c GROUP BY y))
SELECT CAST(nn AS BIGINT) AS n,
       CAST(conc AS BIGINT) AS conc,
       CAST(disc AS BIGINT) AS disc,
       CAST(floor(CAST(conc - disc AS DOUBLE)
                  / sqrt(CAST(nn * (nn - 1) / 2 - n1 AS DOUBLE)
                         * CAST(nn * (nn - 1) / 2 - n2 AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS tau_e6
FROM p, m, tx, ty
"""


def q_late_shipment_priority(sf_dir: str):
    """TPC-H Q12 shape (adapted: the driver tables carry no
    l_shipmode/l_commitdate — reference tpch Q12 semantics re-keyed to
    the columns that exist): per line STATUS, how many lines shipped
    more than 60 days after their order date, split into high-priority
    ('1-URGENT'/'2-HIGH') vs low-priority counts. The classic fact-fact
    join + CASE-split conditional aggregate: both sides project to
    three narrow int columns BEFORE the partitioned hash join (the
    orders side ships one int flag instead of the priority string), the
    late filter and both conditional counts collapse per block, and
    only (status, hi, lo) partials reach the final tiny exchange.
    All comparisons are int64 microsecond arithmetic — exact."""
    import pandas as _pd

    from vaero_ray.stages.joins import hash_join
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    LATE_US = 60 * 86400 * 1_000_000

    orders = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def o_proj(t: pa.Table) -> pa.Table:
        od = pc.cast(t.column("o_orderdate").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        hi = pc.cast(
            pc.is_in(
                t.column("o_orderpriority"),
                value_set=pa.array(["1-URGENT", "2-HIGH"]),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "od_us": od,
                "is_high": hi,
            }
        )

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate", "l_linestatus"]
    )

    def l_proj(t: pa.Table) -> pa.Table:
        ship = pc.cast(
            t.column("l_shipdate").combine_chunks().cast(pa.timestamp("us")), pa.int64()
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
                "ship_us": ship,
                "l_linestatus": t.column("l_linestatus"),
            }
        )

    j = hash_join(
        li.map_batches(l_proj, batch_format="pyarrow", zero_copy_batch=True),
        orders.map_batches(o_proj, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey",
    )

    def split_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        late = df[df["ship_us"].to_numpy() > df["od_us"].to_numpy() + LATE_US]
        hi = late["is_high"].to_numpy()
        out = _pd.DataFrame(
            {
                "l_linestatus": late["l_linestatus"],
                "high_line_count": hi,
                "low_line_count": 1 - hi,
            }
        )
        return out.groupby("l_linestatus", sort=False, as_index=False).sum()

    parts = j.map_batches(split_partial, batch_format="pandas")
    return bucketed_keyed_sum(parts, ["l_linestatus"], ["high_line_count", "low_line_count"])


SQL_LATE_SHIPMENT = r"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
"""


def q_customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape — distribution of customers by order count,
    INCLUDING the zero-order customers the classic LEFT JOIN exists to
    keep. The left join is rewritten away: orders collapse to
    (custkey, c_count) with per-block partials + one keys-only
    exchange; a second tiny exchange counts customers per c_count; and
    the zero bucket is pure parquet-FOOTER arithmetic — customer
    row-count metadata minus the number of distinct ordering customers
    (c_custkey is the table's primary key, so num_rows == distinct
    keys; no customer-table scan, let alone a 100-TB dimension
    broadcast, is ever needed)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    orders = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def per_cust(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame({"ck": df["o_custkey"].astype("int64")})
        out["c_count"] = np.int64(1)
        return out.groupby("ck", sort=False, as_index=False).sum()

    per = bucketed_keyed_sum(
        orders.map_batches(per_cust, batch_format="pandas"), ["ck"], ["c_count"]
    )

    def hist_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame({"c_count": df["c_count"].astype("int64")})
        out["custdist"] = np.int64(1)
        return out.groupby("c_count", sort=False, as_index=False).sum()

    hist = pa.Table.from_pylist(
        bucketed_keyed_sum(
            per.map_batches(hist_partial, batch_format="pandas"),
            ["c_count"],
            ["custdist"],
            num_buckets=4,
        ).take_all()
    )
    n_customers = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    n_with_orders = int(pc.sum(hist.column("custdist")).as_py() or 0)
    zeros = n_customers - n_with_orders
    if zeros > 0:
        hist = pa.concat_tables(
            [
                hist.select(["c_count", "custdist"]).cast(
                    pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())])
                ),
                pa.table(
                    {
                        "c_count": pa.array([0], pa.int64()),
                        "custdist": pa.array([zeros], pa.int64()),
                    }
                ),
            ]
        )
    return hist


SQL_CUSTOMER_ORDER_DIST = r"""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1)
GROUP BY 1
"""


def q_hourly_theil_sen(sf_dir: str):
    """Theil–Sen robust trend slope per event type over the hourly
    count series — the slope ESTIMATOR companion to the existing
    Mann–Kendall trend TEST (`hourly_trend_kendall`): median of all
    pairwise slopes (n_j - n_i) / (h_j - h_i), insensitive to outlier
    hours where OLS (`value_trend_per_type`) is not. Scale shape is the
    hourly family's: the only exchange is the bounded (type, hour)
    keyed sum (720 rows per type at any corpus size); the O(H^2)
    pairwise-slope median runs vectorized on the merged tiny series.
    The median is computed with DuckDB's exact quantile_cont
    interpolation (lo + (hi - lo) * 0.5, float64) so even-count
    midpoints hash-match the oracle bit-for-bit; emitted as
    floor(slope * 1e6 + 0.5)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hour_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hr = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        out = _pd.DataFrame({"event_type": df["event_type"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "hr"], sort=False, as_index=False).sum()

    hourly = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ev.map_batches(hour_partial, batch_format="pandas"),
            ["event_type", "hr"],
            ["n"],
            num_buckets=8,
        ).take_all()
    )
    from vaero_ray.stages.numstats import theil_sen_slope_e6

    df = hourly.to_pandas().sort_values(["event_type", "hr"])
    out_t, out_s = [], []
    for et, g in df.groupby("event_type", sort=True):
        out_t.append(et)
        out_s.append(
            theil_sen_slope_e6(g["hr"].to_numpy(np.int64), g["n"].to_numpy(np.int64))
        )
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "slope_e6": pa.array(out_s, pa.int64()),
        }
    )


SQL_THEIL_SEN = r"""
WITH h AS (SELECT event_type,
                  epoch_us(ts) // 3600000000 AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
s AS (SELECT a.event_type AS event_type,
             CAST(b.n - a.n AS DOUBLE) / CAST(b.hr - a.hr AS DOUBLE) AS sl
      FROM h a JOIN h b ON a.event_type = b.event_type AND b.hr > a.hr)
SELECT event_type,
       CAST(floor(quantile_cont(sl, 0.5) * 1000000 + 0.5) AS BIGINT) AS slope_e6
FROM s GROUP BY 1
"""


def q_jw_title_dups(sf_dir: str):
    """Jaro-Winkler title dedup (stages/editdist.jaro_winkler_pairs):
    documents unioned with a planted char-TRANSPOSITION replica (chars
    2/3 swapped, every 5th doc — the perturbation class where JW stays
    high but Levenshtein counts 2 edits), keyed on the first 32 chars
    ("title"), blocked on (source, n_chars) equality, every in-bucket
    pair scored by the pair-vectorized DuckDB-bit-exact JW kernel,
    sim >= 0.99 emitted as jw_e6. The positional-metric verify step of
    fuzzy dedup, complementing the edit-distance and token-overlap
    verifiers."""
    from vaero_ray.stages.editdist import jaro_winkler_pairs

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source", "n_chars"]
    )

    def with_replica(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        texts = tbl.column("text").to_pylist()
        sel = (ids % 5 == 0) & np.array([len(t or "") >= 4 for t in texts])
        sub = tbl.filter(pa.array(sel))
        stexts = sub.column("text").to_pylist()
        swapped = [t[0] + t[2] + t[1] + t[3:] for t in stexts]
        rep = pa.table(
            {
                "doc_id": pa.array(
                    sub.column("doc_id").to_numpy(zero_copy_only=False) + 10_000_000,
                    pa.int64(),
                ),
                "text": pa.array(swapped, pa.string()),
                "source": sub.column("source"),
                "n_chars": sub.column("n_chars"),
            }
        )
        both = pa.concat_tables([tbl.select(rep.column_names), rep])
        key = pc.utf8_slice_codeunits(both.column("text"), 0, 32)
        return both.append_column("jw_key", key)

    both = ds.map_batches(with_replica, batch_format="pyarrow", zero_copy_batch=True)
    return jaro_winkler_pairs(
        both, "doc_id", "jw_key", ["source", "n_chars"], min_sim=0.99
    )


SQL_JW_TITLE_DUPS = r"""
WITH all_docs AS (
  SELECT doc_id, substr(text, 1, 32) AS k, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 10000000,
         substr(substr(text, 1, 1) || substr(text, 3, 1) || substr(text, 2, 1)
                || substr(text, 4), 1, 32),
         source, n_chars
  FROM documents WHERE doc_id % 5 = 0 AND length(text) >= 4)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(floor(jaro_winkler_similarity(a.k, b.k) * 1000000 + 0.5) AS BIGINT)
         AS jw_e6
FROM all_docs a JOIN all_docs b
  ON a.source = b.source AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
WHERE jaro_winkler_similarity(a.k, b.k) >= 0.99
"""


def q_source_lang_mutual_info(sf_dir: str):
    """Mutual information (nats) between document source and language,
    plus marginal entropies and normalized MI — the information-
    theoretic association measure next to the chi-square test
    (`lang_source_chi2`): how much knowing the source tells you about
    the language, on the SAME exact integer contingency counts. One
    bounded (source, lang) keyed exchange (cells ~ |sources| x |langs|,
    domain-bounded at any corpus size); marginals and the cell sum are
    driver arithmetic over the tiny table. Only the final expressions
    are float (6-dp, written identically on both engines — the entropy
    gates' determinism recipe)."""
    import math

    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "lang"])

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame({"source": df["source"], "lang": df["lang"]})
        out["c"] = np.int64(1)
        return out.groupby(["source", "lang"], sort=False, as_index=False).sum()

    cells = (
        pa.Table.from_pylist(
            bucketed_keyed_sum(
                ds.map_batches(partial, batch_format="pandas"),
                ["source", "lang"],
                ["c"],
                num_buckets=4,
            ).take_all()
        )
        .to_pandas()
        .sort_values(["source", "lang"])
    )
    c = cells["c"].to_numpy(np.int64)
    n = int(c.sum())
    r = cells.groupby("source")["c"].transform("sum").to_numpy(np.int64)
    s = cells.groupby("lang")["c"].transform("sum").to_numpy(np.int64)
    mi = float(np.sum((c / n) * np.log(c.astype(np.float64) * n / (r.astype(np.float64) * s))))
    rm = cells.groupby("source")["c"].sum().to_numpy(np.int64)
    sm = cells.groupby("lang")["c"].sum().to_numpy(np.int64)
    h_source = math.log(n) - float(np.sum(rm * np.log(rm.astype(np.float64)))) / n
    h_lang = math.log(n) - float(np.sum(sm * np.log(sm.astype(np.float64)))) / n
    nmi = mi / math.sqrt(h_source * h_lang)
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "n_cells": pa.array([len(cells)], pa.int64()),
            "mi": pa.array([round(mi, 6)], pa.float64()),
            "h_source": pa.array([round(h_source, 6)], pa.float64()),
            "h_lang": pa.array([round(h_lang, 6)], pa.float64()),
            "nmi": pa.array([round(nmi, 6)], pa.float64()),
        }
    )


SQL_SOURCE_LANG_MI = r"""
WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
r AS (SELECT source, CAST(SUM(c) AS BIGINT) AS r FROM c GROUP BY 1),
s AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS s FROM c GROUP BY 1),
mi AS (SELECT SUM((CAST(c.c AS DOUBLE) / n.n)
                  * ln(CAST(c.c AS DOUBLE) * n.n
                       / (CAST(r.r AS DOUBLE) * s.s))) AS mi,
              CAST(COUNT(*) AS BIGINT) AS n_cells
       FROM c JOIN r USING (source) JOIN s USING (lang) CROSS JOIN n),
hs AS (SELECT ln(CAST(n.n AS DOUBLE))
              - SUM(r.r * ln(CAST(r.r AS DOUBLE))) / n.n AS h
       FROM r CROSS JOIN n GROUP BY n.n),
hl AS (SELECT ln(CAST(n.n AS DOUBLE))
              - SUM(s.s * ln(CAST(s.s AS DOUBLE))) / n.n AS h
       FROM s CROSS JOIN n GROUP BY n.n)
SELECT n.n AS n_rows, mi.n_cells AS n_cells,
       ROUND(mi.mi, 6) AS mi,
       ROUND(hs.h, 6) AS h_source,
       ROUND(hl.h, 6) AS h_lang,
       ROUND(mi.mi / sqrt(hs.h * hl.h), 6) AS nmi
FROM n, mi, hs, hl
"""


def q_hourly_view_purchase_lag(sf_dir: str):
    """Lead/lag cross-products between the hourly VIEW and PURCHASE
    count series — does view volume lead purchase volume, and by how
    many hours? For each lag in [-3, 3]: the number of hour pairs
    (a, a+lag) both present and the EXACT int64 sum of
    view(a) * purchase(a+lag) (raw cross-moment — no float
    normalization, so the gate is integer-exact end to end; the
    analyst can normalize downstream). Scale shape is the hourly
    family's: one bounded (hour) keyed exchange with per-block
    view/purchase indicator partials; the 7-lag sweep is a vectorized
    searchsorted over the tiny merged series."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hour_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        et = df["event_type"].to_numpy()
        keep = (et == "view") | (et == "purchase")
        sub = df.loc[keep]
        hr = sub["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        isv = (sub["event_type"].to_numpy() == "view").astype(np.int64)
        out = _pd.DataFrame({"hr": hr, "v": isv, "p": 1 - isv})
        return out.groupby("hr", sort=False, as_index=False).sum()

    hourly = (
        pa.Table.from_pylist(
            bucketed_keyed_sum(
                ev.map_batches(hour_partial, batch_format="pandas"),
                ["hr"],
                ["v", "p"],
                num_buckets=4,
            ).take_all()
        )
        .to_pandas()
        .sort_values("hr")
    )
    hr = hourly["hr"].to_numpy(np.int64)
    v = hourly["v"].to_numpy(np.int64)
    p = hourly["p"].to_numpy(np.int64)
    lags, n_pairs, sums = [], [], []
    for lag in range(-3, 4):
        idx = np.searchsorted(hr, hr + lag)
        ok = (idx < len(hr)) & (hr[np.minimum(idx, len(hr) - 1)] == hr + lag)
        lags.append(lag)
        n_pairs.append(int(ok.sum()))
        sums.append(int(np.sum(v[ok] * p[idx[ok]])))
    return pa.table(
        {
            "lag": pa.array(lags, pa.int64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
            "sum_vp": pa.array(sums, pa.int64()),
        }
    )


SQL_VIEW_PURCHASE_LAG = r"""
WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS v,
                  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS p
           FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
l AS (SELECT CAST(lag AS BIGINT) AS lag
      FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) t(lag))
SELECT l.lag, CAST(COUNT(b.hr) AS BIGINT) AS n_pairs,
       CAST(COALESCE(SUM(a.v * b.p), 0) AS BIGINT) AS sum_vp
FROM l LEFT JOIN h a ON TRUE
       LEFT JOIN h b ON b.hr = a.hr + l.lag
GROUP BY 1
"""


def q_source_length_kruskal(sf_dir: str):
    """Kruskal-Wallis rank ingredients for document length across ALL
    sources at once — the k-group generalization of the two-sample
    rank-sum gate (`source_length_ranksum`): per source the exact
    int64 doubled rank sum and count, plus the tie term and the H
    statistic (plain and tie-corrected, 6-dp — the one closed-form
    float both engines write over the same integers). Exchange is
    distinct-value compressed: one (n_chars, source) cell per distinct
    pair, domain-bounded at any corpus size."""
    from vaero_ray.stages.numstats import kruskal_rank_ingredients

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return kruskal_rank_ingredients(ds, "n_chars", "source")


SQL_KRUSKAL = r"""
WITH t AS (SELECT n_chars AS v, source FROM documents),
r AS (SELECT v, source, RANK() OVER (ORDER BY v) AS mn,
             COUNT(*) OVER (PARTITION BY v) AS c
      FROM t),
g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_j,
             CAST(SUM(2*mn + c - 1) AS BIGINT) AS two_r
      FROM r GROUP BY 1),
n AS (SELECT CAST(SUM(n_j) AS BIGINT) AS n FROM g),
tie AS (SELECT CAST(SUM(c*c*c - c) AS BIGINT) AS tie_sum
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY v)),
h AS (SELECT 12.0 / (n.n * (n.n + 1.0))
               * SUM(CAST(two_r AS DOUBLE) * two_r / (4.0 * n_j))
             - 3.0 * (n.n + 1.0) AS h
      FROM g CROSS JOIN n GROUP BY n.n)
SELECT g.source, g.n_j, g.two_r, n.n, tie.tie_sum,
       ROUND(h.h, 6) AS h,
       ROUND(h.h / (1.0 - CAST(tie.tie_sum AS DOUBLE)
                          / (CAST(n.n AS DOUBLE) * n.n * n.n - n.n)), 6)
         AS h_tie
FROM g CROSS JOIN n CROSS JOIN tie CROSS JOIN h
"""


def q_source_length_jsd(sf_dir: str):
    """Jensen-Shannon divergence (nats) between the src0 and src1
    document-length distributions — the bounded, symmetric
    distribution-shift measure next to KS (`length_ks_en_rest`) and
    PSI (`value_psi_drift`): 0.5*KL(P||M) + 0.5*KL(Q||M), M the
    mixture, always finite on disjoint support (where KL diverges and
    PSI needs smoothing). Distinct-value compression again: one exact
    (n_chars, c1, c2) row per distinct length crosses the wire; only
    the final per-row term + sum are float (written identically in the
    oracle, 6-dp)."""
    from vaero_ray.stages.numstats import jsd_two_sample

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return jsd_two_sample(ds, "n_chars", "source", "src0", "src1")


SQL_SOURCE_LENGTH_JSD = r"""
WITH t AS (SELECT n_chars AS v,
                  CAST(COUNT(*) FILTER (source = 'src0') AS BIGINT) AS c1,
                  CAST(COUNT(*) FILTER (source = 'src1') AS BIGINT) AS c2
           FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM t)
SELECT n.n1, n.n2,
       CAST(COUNT(*) AS BIGINT) AS support,
       CAST(COUNT(*) FILTER (c1 > 0 AND c2 > 0) AS BIGINT) AS overlap,
       ROUND(SUM(
         CASE WHEN c1 > 0 THEN 0.5 * (c1 / CAST(n.n1 AS DOUBLE))
              * ln((c1 / CAST(n.n1 AS DOUBLE))
                   / ((c1 / CAST(n.n1 AS DOUBLE)
                       + c2 / CAST(n.n2 AS DOUBLE)) / 2.0))
              ELSE 0.0 END
         + CASE WHEN c2 > 0 THEN 0.5 * (c2 / CAST(n.n2 AS DOUBLE))
              * ln((c2 / CAST(n.n2 AS DOUBLE))
                   / ((c1 / CAST(n.n1 AS DOUBLE)
                       + c2 / CAST(n.n2 AS DOUBLE)) / 2.0))
              ELSE 0.0 END), 6) AS jsd
FROM t CROSS JOIN n GROUP BY 1, 2
"""


def q_hourly_siegel_slope(sf_dir: str):
    """Siegel REPEATED-median slope of the hourly count series per
    event type — the 50%-breakdown robust-regression step past
    Theil-Sen (`hourly_theil_sen`, 29%): median over points i of the
    median slope from i to every other point. Same scale shape: the
    only exchange is the bounded (type, hour) keyed sum; the O(H^2)
    slope matrix + two nested medians run vectorized on the tiny
    merged series, both median levels with DuckDB's exact
    quantile_cont interpolation so slope_e6 hash-matches the nested
    quantile_cont oracle bit-for-bit."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.numstats import siegel_slope_e6

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hour_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hr = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        out = _pd.DataFrame({"event_type": df["event_type"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "hr"], sort=False, as_index=False).sum()

    hourly = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ev.map_batches(hour_partial, batch_format="pandas"),
            ["event_type", "hr"],
            ["n"],
            num_buckets=8,
        ).take_all()
    )
    df = hourly.to_pandas().sort_values(["event_type", "hr"])
    out_t, out_s = [], []
    for et, g in df.groupby("event_type", sort=True):
        if len(g) < 2:  # SQL's b.hr != a.hr join drops singleton series
            continue
        out_t.append(et)
        out_s.append(
            siegel_slope_e6(g["hr"].to_numpy(np.int64), g["n"].to_numpy(np.int64))
        )
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "siegel_e6": pa.array(out_s, pa.int64()),
        }
    )


SQL_SIEGEL = r"""
WITH h AS (SELECT event_type,
                  epoch_us(ts) // 3600000000 AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
p AS (SELECT a.event_type AS event_type, a.hr AS hr,
             quantile_cont(CAST(b.n - a.n AS DOUBLE)
                           / CAST(b.hr - a.hr AS DOUBLE), 0.5) AS med_i
      FROM h a JOIN h b ON a.event_type = b.event_type AND b.hr <> a.hr
      GROUP BY 1, 2)
SELECT event_type,
       CAST(floor(quantile_cont(med_i, 0.5) * 1000000 + 0.5) AS BIGINT)
         AS siegel_e6
FROM p GROUP BY 1
"""


def q_source_length_hl_shift(sf_dir: str):
    """Hodges-Lehmann location-shift estimate between src0 and src1
    document lengths — the ESTIMATOR companion to the rank-sum test
    (`source_length_ranksum`), as Siegel/Theil-Sen are to Mann-Kendall:
    median of all n1 x n2 pairwise differences. Distinct-value
    compression keeps the all-pairs multiset off the wire (one
    (value, c1, c2) row per distinct length crosses; the driver
    crosses the two ~300-value compressed sides and takes the weighted
    median by cumsum rank). The median only ever averages two INTEGER
    diffs, so hl_e6 is exact — no float-expression mirroring needed."""
    from vaero_ray.stages.numstats import hodges_lehmann_shift

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return hodges_lehmann_shift(ds, "n_chars", "source", "src0", "src1")


SQL_HL_SHIFT = r"""
WITH t AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents WHERE source = 'src0' GROUP BY 1),
u AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents WHERE source = 'src1' GROUP BY 1),
d AS (SELECT t.v - u.v AS diff, CAST(SUM(t.c * u.c) AS BIGINT) AS w
      FROM t CROSS JOIN u GROUP BY 1),
c AS (SELECT diff, SUM(w) OVER (ORDER BY diff) AS cum FROM d),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tot FROM d),
q AS (SELECT
        (SELECT MIN(diff) FROM c, tot WHERE cum >= (tot.tot - 1) // 2 + 1)
          AS lo_val,
        (SELECT MIN(diff) FROM c, tot
         WHERE cum >= (CASE WHEN tot.tot % 2 = 0 THEN tot.tot // 2
                            ELSE (tot.tot - 1) // 2 END) + 1) AS hi_val)
SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM t) AS n1,
       (SELECT CAST(SUM(c) AS BIGINT) FROM u) AS n2,
       tot.tot AS n_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_diffs,
       CAST(floor((q.lo_val + (q.hi_val - q.lo_val)
                   * (CASE WHEN tot.tot % 2 = 0 THEN 0.5 ELSE 0.0 END))
                  * 1000000 + 0.5) AS BIGINT) AS hl_e6
FROM q CROSS JOIN tot
"""


def q_source_length_mood(sf_dir: str):
    """Mood's median test of document length across ALL sources: the
    pooled grand median (quantile_disc 0-based rank rule), then each
    source's above-median count — the coarser, outlier-immune sibling
    of Kruskal-Wallis on the same exchange (one (n_chars, source) cell
    per distinct pair). Every count exact int64; the 2xk chi-square is
    the one final 6-dp float, written identically in the oracle."""
    from vaero_ray.stages.numstats import mood_median_test

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return mood_median_test(ds, "n_chars", "source")


SQL_MOOD = r"""
WITH t AS (SELECT source, n_chars AS v FROM documents),
m AS (SELECT CAST(quantile_disc(v, 0.5) AS BIGINT) AS med FROM t),
g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_j,
             CAST(COUNT(*) FILTER (v > m.med) AS BIGINT) AS n_above
      FROM t CROSS JOIN m GROUP BY 1),
n AS (SELECT CAST(SUM(n_j) AS BIGINT) AS n,
             CAST(SUM(n_above) AS BIGINT) AS a FROM g),
chi AS (SELECT SUM(
          (n_above - CAST(n_j AS DOUBLE) * n.a / n.n)
            * (n_above - CAST(n_j AS DOUBLE) * n.a / n.n)
            / (CAST(n_j AS DOUBLE) * n.a / n.n)
          + ((n_j - n_above) - CAST(n_j AS DOUBLE) * (n.n - n.a) / n.n)
            * ((n_j - n_above) - CAST(n_j AS DOUBLE) * (n.n - n.a) / n.n)
            / (CAST(n_j AS DOUBLE) * (n.n - n.a) / n.n)) AS chi2
        FROM g CROSS JOIN n GROUP BY n.n, n.a)
SELECT g.source, g.n_j, g.n_above, m.med, n.n, n.a AS n_above_total,
       ROUND(chi.chi2, 6) AS chi2
FROM g CROSS JOIN m CROSS JOIN n CROSS JOIN chi
"""


def q_hourly_friedman(sf_dir: str):
    """Friedman test across event types with hours as blocks: within
    every COMPLETE hour (all k types present — both engines apply the
    same completeness filter) rank the types by hourly count, then
    compare rank sums — the blocked-design cousin of Kruskal-Wallis
    (hour-of-day/traffic level is the nuisance factor the blocking
    removes). Doubled average ranks keep every exchanged/emitted count
    exact int64 (two_r per type, block count b, k, the tie term); the
    chi-square (plain + tie-corrected) and Kendall's W concordance are
    the final shared 6-dp floats. The only exchange is the bounded
    (type, hour) keyed sum; ranking happens on the tiny merged
    series."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hour_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hr = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        out = _pd.DataFrame({"event_type": df["event_type"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "hr"], sort=False, as_index=False).sum()

    hourly = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ev.map_batches(hour_partial, batch_format="pandas"),
            ["event_type", "hr"],
            ["n"],
            num_buckets=8,
        ).take_all()
    )
    df = hourly.to_pandas()
    k = int(df["event_type"].nunique())
    cnt = df.groupby("hr")["event_type"].size()
    complete = cnt[cnt == k].index
    sub = df[df["hr"].isin(complete)].copy()
    sub["two_rank"] = (
        (2 * sub.groupby("hr")["n"].rank(method="average")).round().astype(np.int64)
    )
    g = sub.groupby("event_type", sort=True)["two_rank"].sum()
    b = int(len(complete))
    if not b:  # no complete block: the oracle's rank CTE is empty -> 0 rows
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "two_r": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "tie_sum": pa.array([], pa.int64()),
                "chi2": pa.array([], pa.float64()),
                "chi2_tie": pa.array([], pa.float64()),
                "kendall_w": pa.array([], pa.float64()),
            }
        )
    tc = sub.groupby(["hr", "n"]).size().to_numpy(np.int64)
    tie_sum = int(np.sum(tc * tc * tc - tc))
    s = float(np.sum(g.to_numpy(np.float64) ** 2 / 4.0))
    chi2 = 12.0 / (b * k * (k + 1.0)) * s - 3.0 * b * (k + 1.0)
    chi2_tie = chi2 / (1.0 - tie_sum / (b * k * (float(k) * k - 1.0)))
    kendall_w = chi2_tie / (b * (k - 1.0))
    nt = len(g)
    return pa.table(
        {
            "event_type": pa.array(list(g.index), pa.string()),
            "two_r": pa.array(g.to_numpy(np.int64), pa.int64()),
            "b": pa.array([b] * nt, pa.int64()),
            "k": pa.array([k] * nt, pa.int64()),
            "tie_sum": pa.array([tie_sum] * nt, pa.int64()),
            "chi2": pa.array([round(chi2, 6)] * nt, pa.float64()),
            "chi2_tie": pa.array([round(chi2_tie, 6)] * nt, pa.float64()),
            "kendall_w": pa.array([round(kendall_w, 6)] * nt, pa.float64()),
        }
    )


SQL_FRIEDMAN = r"""
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM h),
cb AS (SELECT hr FROM h GROUP BY hr HAVING COUNT(*) = (SELECT k FROM k)),
r AS (SELECT h.event_type, h.hr,
             RANK() OVER (PARTITION BY h.hr ORDER BY h.n) AS mn,
             COUNT(*) OVER (PARTITION BY h.hr, h.n) AS c
      FROM h JOIN cb USING (hr)),
g AS (SELECT event_type, CAST(SUM(2*mn + c - 1) AS BIGINT) AS two_r
      FROM r GROUP BY 1),
b AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM cb),
tie AS (SELECT CAST(SUM(c*c*c - c) AS BIGINT) AS tie_sum
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c
              FROM h JOIN cb USING (hr) GROUP BY h.hr, h.n)),
chi AS (SELECT 12.0 / (b.b * k.k * (k.k + 1.0))
                 * SUM(CAST(two_r AS DOUBLE) * two_r / 4.0)
               - 3.0 * b.b * (k.k + 1.0) AS chi2
        FROM g CROSS JOIN b CROSS JOIN k GROUP BY b.b, k.k)
SELECT g.event_type, g.two_r, b.b, k.k, tie.tie_sum,
       ROUND(chi.chi2, 6) AS chi2,
       ROUND(chi.chi2 / (1.0 - CAST(tie.tie_sum AS DOUBLE)
                               / (b.b * k.k * (CAST(k.k AS DOUBLE) * k.k - 1.0))), 6)
         AS chi2_tie,
       ROUND(chi.chi2 / (1.0 - CAST(tie.tie_sum AS DOUBLE)
                               / (b.b * k.k * (CAST(k.k AS DOUBLE) * k.k - 1.0)))
             / (b.b * (k.k - 1.0)), 6) AS kendall_w
FROM g CROSS JOIN b CROSS JOIN k CROSS JOIN tie CROSS JOIN chi
"""


def q_source_lang_cramers_v(sf_dir: str):
    """Cramer's V and Tschuprow's T association effect sizes for the
    source x lang contingency — the normalized [0,1] companions to the
    raw chi-square profile (`lang_source_chi2`) and MI
    (`source_lang_mutual_info`). Unlike the per-cell profile gate this
    computes the FULL-GRID statistic: unobserved (r x c minus
    observed) cells contribute their expected mass, via the identity
    sum over missing cells of e = n - sum over observed cells of e —
    no grid materialization in either engine. One bounded (source,
    lang) keyed exchange; marginals and the final 6-dp floats are
    driver arithmetic over the tiny cell table."""
    import math

    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "lang"])

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame({"source": df["source"], "lang": df["lang"]})
        out["c"] = np.int64(1)
        return out.groupby(["source", "lang"], sort=False, as_index=False).sum()

    cells = (
        pa.Table.from_pylist(
            bucketed_keyed_sum(
                ds.map_batches(partial, batch_format="pandas"),
                ["source", "lang"],
                ["c"],
                num_buckets=4,
            ).take_all()
        )
        .to_pandas()
        .sort_values(["source", "lang"])
    )
    o = cells["c"].to_numpy(np.int64)
    n = int(o.sum())
    rt = cells.groupby("lang")["c"].transform("sum").to_numpy(np.int64)
    ct = cells.groupby("source")["c"].transform("sum").to_numpy(np.int64)
    e = rt.astype(np.float64) * ct / n
    chi2 = float(np.sum((o - e) ** 2 / e)) + (n - float(np.sum(e)))
    r = int(cells["lang"].nunique())
    c = int(cells["source"].nunique())
    v = math.sqrt(chi2 / (n * min(r - 1, c - 1)))
    t = math.sqrt(chi2 / (n * math.sqrt(float((r - 1) * (c - 1)))))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "n_cells": pa.array([len(cells)], pa.int64()),
            "r": pa.array([r], pa.int64()),
            "c": pa.array([c], pa.int64()),
            "chi2": pa.array([round(chi2, 6)], pa.float64()),
            "cramers_v": pa.array([round(v, 6)], pa.float64()),
            "tschuprow_t": pa.array([round(t, 6)], pa.float64()),
        }
    )


SQL_CRAMERS_V = r"""
WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS tot FROM c),
rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM c GROUP BY 1),
ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM c GROUP BY 1),
x AS (SELECT SUM((c.o - CAST(rt.rt AS DOUBLE) * ct.ct / n.tot)
                 * (c.o - CAST(rt.rt AS DOUBLE) * ct.ct / n.tot)
                 / (CAST(rt.rt AS DOUBLE) * ct.ct / n.tot))
             + (n.tot - SUM(CAST(rt.rt AS DOUBLE) * ct.ct / n.tot)) AS chi2,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM c JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
      GROUP BY n.tot),
d AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS r,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS c)
SELECT n.tot AS n, x.n_cells, d.r, d.c,
       ROUND(x.chi2, 6) AS chi2,
       ROUND(sqrt(x.chi2 / (n.tot * LEAST(d.r - 1, d.c - 1))), 6) AS cramers_v,
       ROUND(sqrt(x.chi2 / (n.tot * sqrt(CAST((d.r - 1) * (d.c - 1) AS DOUBLE)))), 6)
         AS tschuprow_t
FROM n CROSS JOIN x CROSS JOIN d
"""


def q_hourly_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test on the SIGN of hour-to-hour count
    change per event type — is the hourly series' direction random, or
    does it trend/oscillate? Successive-row diffs over the merged
    hourly series (zero diffs dropped, classic dichotomous form):
    n_plus, n_minus and the run count are exact int64; the normal
    z-score is the one shared 6-dp float. Same hourly-family scale
    shape: one bounded (type, hour) exchange, vectorized sign/run
    fold on the tiny series."""
    import math

    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hour_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hr = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        out = _pd.DataFrame({"event_type": df["event_type"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "hr"], sort=False, as_index=False).sum()

    hourly = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ev.map_batches(hour_partial, batch_format="pandas"),
            ["event_type", "hr"],
            ["n"],
            num_buckets=8,
        ).take_all()
    )
    df = hourly.to_pandas().sort_values(["event_type", "hr"])
    out = {k: [] for k in ("event_type", "n_plus", "n_minus", "n_runs", "z")}
    for et, g in df.groupby("event_type", sort=True):
        d = np.diff(g["n"].to_numpy(np.int64))
        sgn = np.sign(d)
        sgn = sgn[sgn != 0]
        if len(sgn) == 0:
            continue
        n1 = int(np.sum(sgn > 0))
        n2 = int(np.sum(sgn < 0))
        runs = int(1 + np.sum(sgn[1:] != sgn[:-1]))
        out["event_type"].append(et)
        out["n_plus"].append(n1)
        out["n_minus"].append(n2)
        out["n_runs"].append(runs)
        m = n1 + n2
        if n1 == 0 or n2 == 0 or m < 2:
            out["z"].append(None)
            continue
        mu = 2.0 * n1 * n2 / m + 1.0
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / (float(m) * m * (m - 1.0))
        )
        out["z"].append(round((runs - mu) / math.sqrt(var), 6))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_plus": pa.array(out["n_plus"], pa.int64()),
            "n_minus": pa.array(out["n_minus"], pa.int64()),
            "n_runs": pa.array(out["n_runs"], pa.int64()),
            "z": pa.array(out["z"], pa.float64()),
        }
    )


SQL_RUNS_TEST = r"""
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
d AS (SELECT event_type, hr,
             n - lag(n) OVER (PARTITION BY event_type ORDER BY hr) AS d
      FROM h),
s AS (SELECT event_type, hr, CASE WHEN d > 0 THEN 1 ELSE -1 END AS sgn
      FROM d WHERE d IS NOT NULL AND d <> 0),
r AS (SELECT event_type, sgn,
             CASE WHEN sgn <> lag(sgn) OVER (PARTITION BY event_type ORDER BY hr)
                  THEN 1 ELSE 0 END AS chg
      FROM s),
a AS (SELECT event_type,
             CAST(COUNT(*) FILTER (sgn = 1) AS BIGINT) AS n_plus,
             CAST(COUNT(*) FILTER (sgn = -1) AS BIGINT) AS n_minus,
             CAST(1 + COALESCE(SUM(chg), 0) AS BIGINT) AS n_runs
      FROM r GROUP BY 1)
SELECT event_type, n_plus, n_minus, n_runs,
       CASE WHEN n_plus = 0 OR n_minus = 0 OR n_plus + n_minus < 2 THEN NULL
            ELSE ROUND((n_runs - (2.0 * n_plus * n_minus / (n_plus + n_minus) + 1.0))
                       / sqrt(2.0 * n_plus * n_minus
                              * (2.0 * n_plus * n_minus - n_plus - n_minus)
                              / (CAST(n_plus + n_minus AS DOUBLE)
                                 * (n_plus + n_minus)
                                 * (n_plus + n_minus - 1.0))), 6)
       END AS z
FROM a
"""


def q_hourly_durbin_watson(sf_dir: str):
    """Durbin-Watson first-order autocorrelation statistic of the
    hourly count series per event type (constant-model residuals:
    deviations from the series mean): DW = sum((n_t - n_{t-1})^2) /
    sum((n_t - mean)^2) — near 2 means no lag-1 autocorrelation, the
    quick serial-dependence screen next to the ACF gate
    (`hourly_autocorr`). Everything exchanged/emitted is exact int64
    (squared-diff sum, sum, sum of squares, T); DW is the one shared
    6-dp float over those integers."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hour_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hr = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        out = _pd.DataFrame({"event_type": df["event_type"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "hr"], sort=False, as_index=False).sum()

    hourly = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ev.map_batches(hour_partial, batch_format="pandas"),
            ["event_type", "hr"],
            ["n"],
            num_buckets=8,
        ).take_all()
    )
    df = hourly.to_pandas().sort_values(["event_type", "hr"])
    out = {k: [] for k in ("event_type", "t_hours", "sum_n", "sum_n2", "ssd", "dw")}
    for et, g in df.groupby("event_type", sort=True):
        n = g["n"].to_numpy(np.int64)
        t = len(n)
        d = np.diff(n)
        ssd = int(np.sum(d * d))
        sn = int(n.sum())
        sn2 = int(np.sum(n * n))
        out["event_type"].append(et)
        out["t_hours"].append(t)
        out["sum_n"].append(sn)
        out["sum_n2"].append(sn2)
        out["ssd"].append(ssd)
        den = sn2 - float(sn) * sn / t
        out["dw"].append(round(ssd / den, 6) if den > 0 else None)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "t_hours": pa.array(out["t_hours"], pa.int64()),
            "sum_n": pa.array(out["sum_n"], pa.int64()),
            "sum_n2": pa.array(out["sum_n2"], pa.int64()),
            "ssd": pa.array(out["ssd"], pa.int64()),
            "dw": pa.array(out["dw"], pa.float64()),
        }
    )


SQL_DURBIN_WATSON = r"""
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
d AS (SELECT event_type, n,
             n - lag(n) OVER (PARTITION BY event_type ORDER BY hr) AS d
      FROM h),
a AS (SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS t_hours,
             CAST(SUM(n) AS BIGINT) AS sum_n,
             CAST(SUM(n * n) AS BIGINT) AS sum_n2,
             CAST(COALESCE(SUM(d * d), 0) AS BIGINT) AS ssd
      FROM d GROUP BY 1)
SELECT event_type, t_hours, sum_n, sum_n2, ssd,
       CASE WHEN sum_n2 - CAST(sum_n AS DOUBLE) * sum_n / t_hours > 0
            THEN ROUND(ssd / (sum_n2 - CAST(sum_n AS DOUBLE) * sum_n / t_hours), 6)
            ELSE NULL END AS dw
FROM a
"""


def q_length_token_gamma(sf_dir: str):
    """Goodman-Kruskal gamma, Somers' D (both directions) and Kendall
    tau-a of (n_chars, n_tokens) — the tie-aware ordinal effect-size
    family completing the association suite next to tau-b
    (`length_token_kendall`), on the SAME joint distinct-pair exchange
    (bounded by distinct pairs, never rows). The driver finalize is the
    shared Fenwick sweep (O(P log P), arbitrary-precision ints); the
    oracle is the O(P^2) distinct-pair self-join. All pair counts exact
    int64; the four statistics are e6-floored from identical float64
    expressions: gamma=(C-D)/(C+D), D_yx=(C-D)/(n0-n1),
    D_xy=(C-D)/(n0-n2), tau_a=(C-D)/n0."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.numstats import ordinal_association_from_pairs

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["text", "n_chars"])

    def pair_counts(t: pa.Table) -> pa.Table:
        wt = token_counts(t, "text")
        g = (
            pa.table({"x": wt.column("n_chars"), "y": wt.column("n_tokens")})
            .group_by(["x", "y"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["x", "y", "c"])

    pairs = ds.map_batches(pair_counts, batch_format="pyarrow", zero_copy_batch=True)
    merged = pa.Table.from_pylist(
        bucketed_keyed_sum(pairs, ["x", "y"], ["c"], num_buckets=4).take_all()
    )
    r = ordinal_association_from_pairs(
        merged.column("x").to_pylist(),
        merged.column("y").to_pylist(),
        merged.column("c").to_pylist(),
    )
    return pa.table(
        {
            k: pa.array([r[k]], pa.int64())
            for k in (
                "n",
                "conc",
                "disc",
                "tied_x",
                "tied_y",
                "tied_xy",
                "gamma_e6",
                "d_yx_e6",
                "d_xy_e6",
                "tau_a_e6",
            )
        }
    )


SQL_GAMMA = r"""
WITH t AS (SELECT n_chars AS x,
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS y
           FROM documents),
c AS (SELECT x, y, CAST(COUNT(*) AS HUGEINT) AS n FROM t GROUP BY 1, 2),
p AS (SELECT
        COALESCE(SUM(a.n * b.n) FILTER (WHERE b.x < a.x AND b.y < a.y), 0) AS conc,
        COALESCE(SUM(a.n * b.n) FILTER (WHERE b.x < a.x AND b.y > a.y), 0) AS disc
      FROM c a, c b),
m AS (SELECT CAST(SUM(n) AS HUGEINT) AS nn,
             CAST(SUM(n * (n - 1) / 2) AS HUGEINT) AS n3 FROM c),
tx AS (SELECT CAST(SUM(s * (s - 1) / 2) AS HUGEINT) AS n1
       FROM (SELECT SUM(n) AS s FROM c GROUP BY x)),
ty AS (SELECT CAST(SUM(s * (s - 1) / 2) AS HUGEINT) AS n2
       FROM (SELECT SUM(n) AS s FROM c GROUP BY y))
SELECT CAST(nn AS BIGINT) AS n,
       CAST(conc AS BIGINT) AS conc,
       CAST(disc AS BIGINT) AS disc,
       CAST(n1 AS BIGINT) AS tied_x,
       CAST(n2 AS BIGINT) AS tied_y,
       CAST(n3 AS BIGINT) AS tied_xy,
       CAST(floor(CAST(conc - disc AS DOUBLE) / CAST(conc + disc AS DOUBLE)
                  * 1000000 + 0.5) AS BIGINT) AS gamma_e6,
       CAST(floor(CAST(conc - disc AS DOUBLE)
                  / CAST(nn * (nn - 1) / 2 - n1 AS DOUBLE)
                  * 1000000 + 0.5) AS BIGINT) AS d_yx_e6,
       CAST(floor(CAST(conc - disc AS DOUBLE)
                  / CAST(nn * (nn - 1) / 2 - n2 AS DOUBLE)
                  * 1000000 + 0.5) AS BIGINT) AS d_xy_e6,
       CAST(floor(CAST(conc - disc AS DOUBLE)
                  / CAST(nn * (nn - 1) / 2 AS DOUBLE)
                  * 1000000 + 0.5) AS BIGINT) AS tau_a_e6
FROM p, m, tx, ty
"""


def q_source_length_cliffs(sf_dir: str):
    """Cliff's delta ordinal effect size of document length, src0 vs
    src1 — the scale-free EFFECT-SIZE companion to the rank-sum test
    (`source_length_ranksum`) and the Hodges-Lehmann location estimate
    (`source_length_hl_shift`); numerically equal to the Mann-Whitney
    rank-biserial correlation. Distinct-value compression: one
    (value, c1, c2) row per distinct length crosses; n_gt / n_lt /
    n_eq are exact int64 from a cumsum over the sorted compressed
    side (never an n1 x n2 expansion); delta_e6 is the one shared
    float, floored at 1e6 from the identical expression."""
    from vaero_ray.stages.numstats import cliffs_delta

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return cliffs_delta(ds, "n_chars", "source", "src0", "src1")


SQL_CLIFFS = r"""
WITH t AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents WHERE source = 'src0' GROUP BY 1),
u AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents WHERE source = 'src1' GROUP BY 1),
p AS (SELECT
        CAST(COALESCE(SUM(t.c * u.c) FILTER (WHERE t.v > u.v), 0) AS BIGINT) AS n_gt,
        CAST(COALESCE(SUM(t.c * u.c) FILTER (WHERE t.v < u.v), 0) AS BIGINT) AS n_lt,
        CAST(COALESCE(SUM(t.c * u.c) FILTER (WHERE t.v = u.v), 0) AS BIGINT) AS n_eq
      FROM t CROSS JOIN u),
n AS (SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM t) AS n1,
             (SELECT CAST(SUM(c) AS BIGINT) FROM u) AS n2)
SELECT n.n1, n.n2, p.n_gt, p.n_lt, p.n_eq,
       CAST(floor(CAST(p.n_gt - p.n_lt AS DOUBLE)
                  / (CAST(n.n1 AS DOUBLE) * n.n2) * 1000000 + 0.5) AS BIGINT)
         AS delta_e6
FROM p CROSS JOIN n
"""


def q_source_lang_theil_u(sf_dir: str):
    """Theil's U uncertainty coefficients for source x lang — the
    DIRECTIONAL companions to the symmetric NMI gate
    (`source_lang_mutual_info`): U(lang|source) = MI / H(lang) is the
    fraction of language uncertainty removed by knowing the source,
    U(source|lang) the reverse, plus the symmetric U and the joint
    entropy. Same bounded (source, lang) cell exchange (exact int64
    counts); all entropies/ratios are 6-dp floats written identically
    in the oracle (the entropy gates' determinism recipe)."""
    import math

    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "lang"])

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame({"source": df["source"], "lang": df["lang"]})
        out["c"] = np.int64(1)
        return out.groupby(["source", "lang"], sort=False, as_index=False).sum()

    cells = (
        pa.Table.from_pylist(
            bucketed_keyed_sum(
                ds.map_batches(partial, batch_format="pandas"),
                ["source", "lang"],
                ["c"],
                num_buckets=4,
            ).take_all()
        )
        .to_pandas()
        .sort_values(["source", "lang"])
    )
    c = cells["c"].to_numpy(np.int64)
    n = int(c.sum())
    r = cells.groupby("source")["c"].transform("sum").to_numpy(np.int64)
    s = cells.groupby("lang")["c"].transform("sum").to_numpy(np.int64)
    mi = float(np.sum((c / n) * np.log(c.astype(np.float64) * n / (r.astype(np.float64) * s))))
    rm = cells.groupby("source")["c"].sum().to_numpy(np.int64)
    sm = cells.groupby("lang")["c"].sum().to_numpy(np.int64)
    h_source = math.log(n) - float(np.sum(rm * np.log(rm.astype(np.float64)))) / n
    h_lang = math.log(n) - float(np.sum(sm * np.log(sm.astype(np.float64)))) / n
    h_joint = math.log(n) - float(np.sum(c * np.log(c.astype(np.float64)))) / n
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "n_cells": pa.array([len(cells)], pa.int64()),
            "h_joint": pa.array([round(h_joint, 6)], pa.float64()),
            "u_lang_given_source": pa.array([round(mi / h_lang, 6)], pa.float64()),
            "u_source_given_lang": pa.array([round(mi / h_source, 6)], pa.float64()),
            "u_symmetric": pa.array([round(2.0 * mi / (h_source + h_lang), 6)], pa.float64()),
        }
    )


SQL_THEIL_U = r"""
WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
r AS (SELECT source, CAST(SUM(c) AS BIGINT) AS r FROM c GROUP BY 1),
s AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS s FROM c GROUP BY 1),
mi AS (SELECT SUM((CAST(c.c AS DOUBLE) / n.n)
                  * ln(CAST(c.c AS DOUBLE) * n.n
                       / (CAST(r.r AS DOUBLE) * s.s))) AS mi,
              CAST(COUNT(*) AS BIGINT) AS n_cells
       FROM c JOIN r USING (source) JOIN s USING (lang) CROSS JOIN n),
hs AS (SELECT ln(CAST(n.n AS DOUBLE))
              - SUM(r.r * ln(CAST(r.r AS DOUBLE))) / n.n AS h
       FROM r CROSS JOIN n GROUP BY n.n),
hl AS (SELECT ln(CAST(n.n AS DOUBLE))
              - SUM(s.s * ln(CAST(s.s AS DOUBLE))) / n.n AS h
       FROM s CROSS JOIN n GROUP BY n.n),
hj AS (SELECT ln(CAST(n.n AS DOUBLE))
              - SUM(c.c * ln(CAST(c.c AS DOUBLE))) / n.n AS h
       FROM c CROSS JOIN n GROUP BY n.n)
SELECT n.n AS n_rows, mi.n_cells AS n_cells,
       ROUND(hj.h, 6) AS h_joint,
       ROUND(mi.mi / hl.h, 6) AS u_lang_given_source,
       ROUND(mi.mi / hs.h, 6) AS u_source_given_lang,
       ROUND(2.0 * mi.mi / (hs.h + hl.h), 6) AS u_symmetric
FROM n, mi, hs, hl, hj
"""


def q_source_lang_gtest(sf_dir: str):
    """G-test (log-likelihood ratio chi-square) of source x lang
    independence, plus the Williams small-sample correction — the
    LIKELIHOOD-based counterpart to the Pearson chi-square
    (`lang_source_chi2`) on the same exact integer cells. Zero cells
    contribute nothing to G (o*ln(o/e) -> 0), so unlike the Pearson
    full-grid statistic no missing-cell identity is needed. df is
    exact int64; G, the Williams divisor q and G/q are the 6-dp
    floats, written identically in the oracle."""
    import math

    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "lang"])

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame({"source": df["source"], "lang": df["lang"]})
        out["c"] = np.int64(1)
        return out.groupby(["source", "lang"], sort=False, as_index=False).sum()

    cells = (
        pa.Table.from_pylist(
            bucketed_keyed_sum(
                ds.map_batches(partial, batch_format="pandas"),
                ["source", "lang"],
                ["c"],
                num_buckets=4,
            ).take_all()
        )
        .to_pandas()
        .sort_values(["source", "lang"])
    )
    o = cells["c"].to_numpy(np.int64)
    n = int(o.sum())
    r = cells.groupby("lang")["c"].transform("sum").to_numpy(np.int64)
    ct = cells.groupby("source")["c"].transform("sum").to_numpy(np.int64)
    g = 2.0 * float(
        np.sum(o * np.log(o.astype(np.float64) * n / (r.astype(np.float64) * ct)))
    )
    rm = cells.groupby("lang")["c"].sum().to_numpy(np.int64)
    cm = cells.groupby("source")["c"].sum().to_numpy(np.int64)
    nr, nc = len(rm), len(cm)
    df_ = (nr - 1) * (nc - 1)
    q = 1.0 + (n * float(np.sum(1.0 / rm)) - 1.0) * (n * float(np.sum(1.0 / cm)) - 1.0) / (
        6.0 * n * df_
    )
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "n_cells": pa.array([len(cells)], pa.int64()),
            "df": pa.array([df_], pa.int64()),
            "g": pa.array([round(g, 6)], pa.float64()),
            "williams_q": pa.array([round(q, 6)], pa.float64()),
            "g_adj": pa.array([round(g / q, 6)], pa.float64()),
        }
    )


SQL_GTEST = r"""
WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM c GROUP BY 1),
ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM c GROUP BY 1),
g AS (SELECT 2.0 * SUM(c.o * ln(CAST(c.o AS DOUBLE) * n.n
                                / (CAST(rt.rt AS DOUBLE) * ct.ct))) AS g,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM c JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n),
d AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS nr,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS nc,
             (SELECT SUM(1.0 / rt) FROM rt) AS ir,
             (SELECT SUM(1.0 / ct) FROM ct) AS ic)
SELECT n.n, g.n_cells,
       CAST((d.nr - 1) * (d.nc - 1) AS BIGINT) AS df,
       ROUND(g.g, 6) AS g,
       ROUND(1.0 + (n.n * d.ir - 1.0) * (n.n * d.ic - 1.0)
                   / (6.0 * n.n * (d.nr - 1) * (d.nc - 1)), 6) AS williams_q,
       ROUND(g.g / (1.0 + (n.n * d.ir - 1.0) * (n.n * d.ic - 1.0)
                          / (6.0 * n.n * (d.nr - 1) * (d.nc - 1))), 6) AS g_adj
FROM n, g, d
"""


def q_hourly_page_trend(sf_dir: str):
    """Page's L test for an ORDERED alternative across event types with
    hours as blocks — the trend-sensitive refinement of the Friedman
    test (`hourly_friedman`) on the same complete-block doubled ranks:
    L = sum_j j * R_j with the hypothesized ordering fixed as the
    ALPHABETICAL event-type order (a deterministic convention both
    engines share; analysts re-map the labels to test any other
    ordering). two_l = sum_j j * two_R_j is exact int64; the df=1
    chi-square (12L - 3bk(k+1)^2)^2 / (bk^2(k+1)(k^2-1)) and the
    signed z use 6*two_l = 12L so the numerator stays integer-exact
    before the one shared float division. Ties ride through the
    doubled average ranks (the classic large-sample form). Same
    bounded (type, hour) exchange as the Friedman gate."""
    import math

    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hour_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hr = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        out = _pd.DataFrame({"event_type": df["event_type"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "hr"], sort=False, as_index=False).sum()

    hourly = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ev.map_batches(hour_partial, batch_format="pandas"),
            ["event_type", "hr"],
            ["n"],
            num_buckets=8,
        ).take_all()
    )
    df = hourly.to_pandas()
    k = int(df["event_type"].nunique())
    cnt = df.groupby("hr")["event_type"].size()
    complete = cnt[cnt == k].index
    sub = df[df["hr"].isin(complete)].copy()
    sub["two_rank"] = (
        (2 * sub.groupby("hr")["n"].rank(method="average")).round().astype(np.int64)
    )
    g = sub.groupby("event_type", sort=True)["two_rank"].sum()
    b = int(len(complete))
    if not b:  # no complete block: oracle emits (0, k, NULL, NULL, NULL)
        return pa.table(
            {
                "b": pa.array([0], pa.int64()),
                "k": pa.array([k], pa.int64()),
                "two_l": pa.array([None], pa.int64()),
                "chi2_l": pa.array([None], pa.float64()),
                "z": pa.array([None], pa.float64()),
            }
        )
    j = np.arange(1, k + 1, dtype=np.int64)
    two_l = int(np.sum(j * g.to_numpy(np.int64)))
    num = 6.0 * two_l - 3.0 * b * k * (k + 1) * (k + 1)
    den = b * k * k * (k + 1.0) * (k * k - 1)
    return pa.table(
        {
            "b": pa.array([b], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "two_l": pa.array([two_l], pa.int64()),
            "chi2_l": pa.array([round(num * num / den, 6)], pa.float64()),
            "z": pa.array([round(num / math.sqrt(den), 6)], pa.float64()),
        }
    )


SQL_PAGE_TREND = r"""
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM h),
cb AS (SELECT hr FROM h GROUP BY hr HAVING COUNT(*) = (SELECT k FROM k)),
r AS (SELECT h.event_type, h.hr,
             RANK() OVER (PARTITION BY h.hr ORDER BY h.n) AS mn,
             COUNT(*) OVER (PARTITION BY h.hr, h.n) AS c
      FROM h JOIN cb USING (hr)),
g AS (SELECT event_type, CAST(SUM(2*mn + c - 1) AS BIGINT) AS two_r
      FROM r GROUP BY 1),
b AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM cb),
pos AS (SELECT event_type,
               CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS j
        FROM g),
l AS (SELECT CAST(SUM(pos.j * g.two_r) AS BIGINT) AS two_l
      FROM g JOIN pos USING (event_type)),
f AS (SELECT l.two_l,
             6.0 * l.two_l - 3.0 * b.b * k.k * (k.k + 1) * (k.k + 1) AS num,
             b.b * k.k * k.k * (k.k + 1.0) * (k.k * k.k - 1) AS den
      FROM l CROSS JOIN b CROSS JOIN k)
SELECT b.b, k.k, f.two_l,
       ROUND(f.num * f.num / f.den, 6) AS chi2_l,
       ROUND(f.num / sqrt(f.den), 6) AS z
FROM f CROSS JOIN b CROSS JOIN k
"""


def q_hourly_cochran_q(sf_dir: str):
    """Cochran's Q test of equal OCCURRENCE rates across event types
    with hours as blocks, on the binary design x_ij = [type j had >= 1
    event in hour i] — the dichotomous member of the blocked-design
    family next to Friedman (counts->ranks) and Page (ordered): do the
    k types differ in how many hours they show up in at all? Blocks
    are the hours with any event (both engines derive the identical
    block set from the cells themselves). All ingredients exact int64
    (per-type presence-hours C_j, the cell total N, sum of squared
    per-hour presence counts sum R_i^2, b, k); Q = (k-1)(k*sum C_j^2 -
    N^2) / (k*N - sum R_i^2) is the one shared 6-dp float. Same
    bounded (type, hour) cell exchange; only EXISTENCE of each cell is
    used."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hour_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hr = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        out = _pd.DataFrame({"event_type": df["event_type"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "hr"], sort=False, as_index=False).sum()

    hourly = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ev.map_batches(hour_partial, batch_format="pandas"),
            ["event_type", "hr"],
            ["n"],
            num_buckets=8,
        ).take_all()
    )
    df = hourly.to_pandas()
    k = int(df["event_type"].nunique())
    cj = df.groupby("event_type", sort=True).size()
    ri = df.groupby("hr").size().to_numpy(np.int64)
    b = int(len(ri))
    n_tot = int(ri.sum())
    sum_r2 = int(np.sum(ri * ri))
    c_j = cj.to_numpy(np.int64)
    sum_c2 = int(np.sum(c_j * c_j))
    # denominator sum R_i (k - R_i) == 0 iff every block is all-present
    # or all-absent — Q is undefined on a saturated design (both
    # engines emit NULL; happens at dense scales where every hour has
    # every type)
    den = k * n_tot - sum_r2
    q = (k - 1.0) * (k * sum_c2 - float(n_tot) * n_tot) / den if den > 0 else None
    nt = len(cj)
    return pa.table(
        {
            "event_type": pa.array(list(cj.index), pa.string()),
            "c_j": pa.array(c_j, pa.int64()),
            "b": pa.array([b] * nt, pa.int64()),
            "k": pa.array([k] * nt, pa.int64()),
            "n_tot": pa.array([n_tot] * nt, pa.int64()),
            "sum_r2": pa.array([sum_r2] * nt, pa.int64()),
            "q": pa.array([round(q, 6) if q is not None else None] * nt, pa.float64()),
        }
    )


SQL_COCHRAN_Q = r"""
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr
           FROM events GROUP BY 1, 2),
k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM h),
cj AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c_j FROM h GROUP BY 1),
ri AS (SELECT hr, CAST(COUNT(*) AS BIGINT) AS r FROM h GROUP BY 1),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS b,
               CAST(SUM(r) AS BIGINT) AS n_tot,
               CAST(SUM(r * r) AS BIGINT) AS sum_r2 FROM ri),
s AS (SELECT CAST(SUM(c_j * c_j) AS BIGINT) AS sum_c2 FROM cj)
SELECT cj.event_type, cj.c_j, agg.b, k.k, agg.n_tot, agg.sum_r2,
       CASE WHEN k.k * agg.n_tot - agg.sum_r2 > 0
            THEN ROUND((k.k - 1.0)
                       * (k.k * s.sum_c2 - CAST(agg.n_tot AS DOUBLE) * agg.n_tot)
                       / (k.k * agg.n_tot - agg.sum_r2), 6)
            ELSE NULL END AS q
FROM cj CROSS JOIN agg CROSS JOIN k CROSS JOIN s
"""


def q_damerau_title_dups(sf_dir: str):
    """Unrestricted Damerau-Levenshtein title dedup
    (stages/editdist.damerau_pairs): documents unioned with a planted
    swap+substitution replica (chars 2/3 swapped AND char 7 replaced,
    every 7th doc — DL counts 2 where plain Levenshtein needs 3, so a
    <=2 threshold admits the typo class and rejects real edits), keyed
    on the first 32 chars, blocked on (source, n_chars), every
    in-bucket pair scored by the pair-vectorized Lowrance-Wagner
    kernel (DuckDB-damerau_levenshtein-exact). Completes the
    edit-metric verifier family: Levenshtein (pure edits), JW
    (prefix-weighted similarity), DL (edits + transpositions)."""
    from vaero_ray.stages.editdist import damerau_pairs

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source", "n_chars"]
    )

    def with_replica(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        texts = tbl.column("text").to_pylist()
        sel = (ids % 7 == 0) & np.array([len(t or "") >= 8 for t in texts])
        sub = tbl.filter(pa.array(sel))
        stexts = sub.column("text").to_pylist()
        mut = [t[0] + t[2] + t[1] + t[3:6] + "Z" + t[7:] for t in stexts]
        rep = pa.table(
            {
                "doc_id": pa.array(
                    sub.column("doc_id").to_numpy(zero_copy_only=False) + 10_000_000,
                    pa.int64(),
                ),
                "text": pa.array(mut, pa.string()),
                "source": sub.column("source"),
                "n_chars": sub.column("n_chars"),
            }
        )
        both = pa.concat_tables([tbl.select(rep.column_names), rep.cast(tbl.select(rep.column_names).schema)])
        key = pc.utf8_slice_codeunits(both.column("text"), 0, 32)
        return both.append_column("dl_key", key)

    both = ds.map_batches(with_replica, batch_format="pyarrow", zero_copy_batch=True)
    return damerau_pairs(
        both, "doc_id", "dl_key", ["source", "n_chars"], max_distance=2
    )


SQL_DAMERAU_TITLE_DUPS = r"""
WITH all_docs AS (
  SELECT doc_id, substr(text, 1, 32) AS k, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 10000000,
         substr(substr(text, 1, 1) || substr(text, 3, 1) || substr(text, 2, 1)
                || substr(text, 4, 3) || 'Z' || substr(text, 8), 1, 32),
         source, n_chars
  FROM documents WHERE doc_id % 7 = 0 AND length(text) >= 8)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(damerau_levenshtein(a.k, b.k) AS BIGINT) AS dl_dist
FROM all_docs a JOIN all_docs b
  ON a.source = b.source AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
WHERE damerau_levenshtein(a.k, b.k) <= 2
"""


def q_source_length_anova(sf_dir: str):
    """One-way ANOVA F test of document length across all sources —
    the PARAMETRIC sibling of Kruskal-Wallis (`source_length_kruskal`)
    on the same grouping: equal mean lengths? One bounded per-group
    (n, sum, sum-of-squares) keyed exchange, exact int64; F and
    eta-squared are the 6-dp ratio floats (raw SS magnitudes would be
    summation-order-sensitive at 6 dp — ratios keep the error
    relative)."""
    from vaero_ray.stages.numstats import anova_oneway

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return anova_oneway(ds, "n_chars", "source")


SQL_ANOVA = r"""
WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_j,
                  CAST(SUM(n_chars) AS BIGINT) AS s1,
                  CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
           FROM documents GROUP BY 1),
t AS (SELECT CAST(SUM(n_j) AS BIGINT) AS n, CAST(SUM(s1) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS k FROM g),
x AS (SELECT SUM(CAST(s1 AS DOUBLE) * s1 / n_j) AS sb_raw,
             SUM(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_j) AS ssw
      FROM g),
f AS (SELECT x.sb_raw - CAST(t.s AS DOUBLE) * t.s / t.n AS ssb, x.ssw AS ssw,
             t.n AS n, t.k AS k
      FROM x CROSS JOIN t)
SELECT g.source, g.n_j, g.s1, g.s2, f.k, f.n,
       ROUND((f.ssb / (f.k - 1)) / (f.ssw / (f.n - f.k)), 6) AS f_stat,
       ROUND(f.ssb / (f.ssb + f.ssw), 6) AS eta2
FROM g CROSS JOIN f
"""


def q_source_length_welch(sf_dir: str):
    """Welch's unequal-variance t test of mean document length, src0 vs
    src1 — the parametric two-sample companion to the rank-sum /
    Hodges-Lehmann / Cliff's-delta family, with the Welch-Satterthwaite
    df. Per-side (n, sum, sum-of-squares) exact int64 from the shared
    moments exchange; mean_diff, t, df are the 6-dp floats."""
    from vaero_ray.stages.numstats import welch_t_test

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return welch_t_test(ds, "n_chars", "source", "src0", "src1")


SQL_WELCH = r"""
WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_j,
                  CAST(SUM(n_chars) AS BIGINT) AS s1,
                  CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
           FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
w AS (SELECT
        (SELECT n_j FROM g WHERE source = 'src0') AS n1,
        (SELECT n_j FROM g WHERE source = 'src1') AS n2,
        (SELECT s1 FROM g WHERE source = 'src0') AS sum1,
        (SELECT s1 FROM g WHERE source = 'src1') AS sum2,
        (SELECT s2 FROM g WHERE source = 'src0') AS ss1,
        (SELECT s2 FROM g WHERE source = 'src1') AS ss2),
v AS (SELECT *,
        (CAST(ss1 AS DOUBLE) - CAST(sum1 AS DOUBLE) * sum1 / n1) / (n1 - 1) AS v1,
        (CAST(ss2 AS DOUBLE) - CAST(sum2 AS DOUBLE) * sum2 / n2) / (n2 - 1) AS v2,
        CAST(sum1 AS DOUBLE) / n1 - CAST(sum2 AS DOUBLE) / n2 AS md
      FROM w),
s AS (SELECT *, v1 / n1 + v2 / n2 AS se2 FROM v)
SELECT n1, n2, sum1, sum2, ss1, ss2,
       ROUND(md, 6) AS mean_diff,
       ROUND(md / sqrt(se2), 6) AS t,
       ROUND(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                          + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df
FROM s
"""


def q_source_length_shape(sf_dir: str):
    """Per-source skewness (Fisher g1) and excess kurtosis of document
    length — the 3rd/4th-moment shape profile extending the per-source
    mean/variance gates. Distinct-value compression keeps the power
    sums exact: one (source, value, count) row per distinct length
    crosses, s1..s4 fold over the compressed rows as exact int64
    (contract n * max(v^4) < 2^63 — length-like domains), and only the
    two O(1)-magnitude shape ratios are 6-dp floats."""
    from vaero_ray.stages.numstats import shape_per_group

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return shape_per_group(ds, "n_chars", "source")


SQL_SHAPE = r"""
WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(n_chars) AS BIGINT) AS s1,
                  CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2,
                  CAST(SUM(n_chars * n_chars * n_chars) AS BIGINT) AS s3,
                  CAST(SUM(n_chars * n_chars * n_chars * n_chars) AS BIGINT) AS s4
           FROM documents GROUP BY 1),
m AS (SELECT *, CAST(s1 AS DOUBLE) / n AS mean FROM g),
c AS (SELECT *,
        CAST(s2 AS DOUBLE) / n - mean * mean AS m2,
        CAST(s3 AS DOUBLE) / n - 3.0 * mean * CAST(s2 AS DOUBLE) / n
          + 2.0 * mean * mean * mean AS m3,
        CAST(s4 AS DOUBLE) / n - 4.0 * mean * CAST(s3 AS DOUBLE) / n
          + 6.0 * mean * mean * CAST(s2 AS DOUBLE) / n
          - 3.0 * mean * mean * mean * mean AS m4
      FROM m)
SELECT source, n, s1, s2, s3, s4,
       ROUND(m3 / (m2 * sqrt(m2)), 6) AS skew,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS ex_kurt
FROM c
"""


def q_source_length_brown_forsythe(sf_dir: str):
    """Brown-Forsythe equal-spread test of document length across
    sources: one-way ANOVA on |v - median_j| — the robust Levene
    variant whose ingredients stay INTEGER because the median-centered
    deviations are exact (per-group median by the quantile_disc rank
    rule). Completes the location/spread test pair: ANOVA asks 'same
    mean?', Brown-Forsythe asks 'same spread?'. Same compressed
    (source, value, count) exchange; F is the one 6-dp ratio float."""
    from vaero_ray.stages.numstats import brown_forsythe

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return brown_forsythe(ds, "n_chars", "source")


SQL_BROWN_FORSYTHE = r"""
WITH m AS (SELECT source, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med
           FROM documents GROUP BY 1),
z AS (SELECT d.source, CAST(abs(d.n_chars - m.med) AS BIGINT) AS z, m.med
      FROM documents d JOIN m USING (source)),
g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_j,
             CAST(MIN(med) AS BIGINT) AS med,
             CAST(SUM(z) AS BIGINT) AS sz,
             CAST(SUM(z * z) AS BIGINT) AS szz
      FROM z GROUP BY 1),
t AS (SELECT CAST(SUM(n_j) AS BIGINT) AS n, CAST(SUM(sz) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS k FROM g),
x AS (SELECT SUM(CAST(sz AS DOUBLE) * sz / n_j) AS sb_raw,
             SUM(CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n_j) AS ssw
      FROM g),
f AS (SELECT x.sb_raw - CAST(t.s AS DOUBLE) * t.s / t.n AS ssb, x.ssw AS ssw,
             t.n AS n, t.k AS k
      FROM x CROSS JOIN t)
SELECT g.source, g.n_j, g.med, g.sz, g.szz,
       ROUND((f.ssb / (f.k - 1)) / (f.ssw / (f.n - f.k)), 6) AS f_bf
FROM g CROSS JOIN f
"""


def q_source_lang_lambda(sf_dir: str):
    """Goodman-Kruskal lambda for source x lang — the
    proportional-reduction-in-error association measure for NOMINAL
    categories (no ordering assumed, unlike gamma/Somers): how much
    does knowing the source cut the error of guessing the lang by its
    mode? Unique in the association suite in that EVERY ingredient is
    an integer (modal cell sums and marginal maxima) — the three
    lambdas are 6-dp ratios of exact int64s, no entropy/chi-square
    float accumulation at all. Same bounded (source, lang) cell
    exchange as the MI/chi-square gates."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "lang"])

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame({"source": df["source"], "lang": df["lang"]})
        out["c"] = np.int64(1)
        return out.groupby(["source", "lang"], sort=False, as_index=False).sum()

    cells = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ds.map_batches(partial, batch_format="pandas"),
            ["source", "lang"],
            ["c"],
            num_buckets=4,
        ).take_all()
    ).to_pandas()
    n = int(cells["c"].sum())
    mr = int(cells.groupby("lang")["c"].sum().max())  # best blind lang guess
    ms = int(cells.groupby("source")["c"].sum().max())
    sa = int(cells.groupby("source")["c"].max().sum())  # best lang per source
    sb = int(cells.groupby("lang")["c"].max().sum())  # best source per lang
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "max_lang_marginal": pa.array([mr], pa.int64()),
            "max_source_marginal": pa.array([ms], pa.int64()),
            "sum_best_lang_per_source": pa.array([sa], pa.int64()),
            "sum_best_source_per_lang": pa.array([sb], pa.int64()),
            "lambda_lang_given_source": pa.array(
                [round(float(sa - mr) / (n - mr), 6)], pa.float64()
            ),
            "lambda_source_given_lang": pa.array(
                [round(float(sb - ms) / (n - ms), 6)], pa.float64()
            ),
            "lambda_symmetric": pa.array(
                [round(float(sa + sb - mr - ms) / (2 * n - mr - ms), 6)], pa.float64()
            ),
        }
    )


SQL_GK_LAMBDA = r"""
WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
rl AS (SELECT CAST(MAX(s) AS BIGINT) AS mr
       FROM (SELECT SUM(c) AS s FROM c GROUP BY lang)),
rs AS (SELECT CAST(MAX(s) AS BIGINT) AS ms
       FROM (SELECT SUM(c) AS s FROM c GROUP BY source)),
a AS (SELECT CAST(SUM(m) AS BIGINT) AS sa
      FROM (SELECT MAX(c) AS m FROM c GROUP BY source)),
b AS (SELECT CAST(SUM(m) AS BIGINT) AS sb
      FROM (SELECT MAX(c) AS m FROM c GROUP BY lang))
SELECT n.n, rl.mr AS max_lang_marginal, rs.ms AS max_source_marginal,
       a.sa AS sum_best_lang_per_source, b.sb AS sum_best_source_per_lang,
       ROUND(CAST(a.sa - rl.mr AS DOUBLE) / (n.n - rl.mr), 6)
         AS lambda_lang_given_source,
       ROUND(CAST(b.sb - rs.ms AS DOUBLE) / (n.n - rs.ms), 6)
         AS lambda_source_given_lang,
       ROUND(CAST(a.sa + b.sb - rl.mr - rs.ms AS DOUBLE)
             / (2 * n.n - rl.mr - rs.ms), 6) AS lambda_symmetric
FROM n, rl, rs, a, b
"""


def q_hod_purchase_trend(sf_dir: str):
    """Cochran-Armitage trend test: does the PURCHASE share rise or
    fall monotonically across hour-of-day (scores t = 0..23)? The 2xk
    ordered-contingency member of the trend family (Mann-Kendall/
    Theil-Sen work on the series; this works on the binary share).
    Per-hod (n_i, y_i) and the score sums (sum t*n, sum t*y, sum
    t^2*n) are exact int64 from one bounded keyed exchange; the
    statistic T = sum t*y - (Y/N) sum t*n and z = T / sqrt(p(1-p)
    (sum t^2 n - (sum t n)^2 / N)) are SCALAR float ops over exact
    ints (bit-deterministic — no float summation anywhere), 6-dp."""
    import math

    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hod_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hod = (
            df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        ) % 24
        out = _pd.DataFrame(
            {
                "hod": hod,
                "n_i": np.int64(1),
                "y_i": (df["event_type"].to_numpy() == "purchase").astype(np.int64),
            }
        )
        return out.groupby("hod", sort=False, as_index=False).sum()

    g = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ev.map_batches(hod_partial, batch_format="pandas"),
            ["hod"],
            ["n_i", "y_i"],
            num_buckets=4,
        ).take_all()
    ).to_pandas()
    hod = g["hod"].to_numpy(np.int64)
    n_i = g["n_i"].to_numpy(np.int64)
    y_i = g["y_i"].to_numpy(np.int64)
    n = int(n_i.sum())
    y = int(y_i.sum())
    stn = int(np.sum(hod * n_i))
    sty = int(np.sum(hod * y_i))
    st2n = int(np.sum(hod * hod * n_i))
    t_stat = float(sty) - float(y) * stn / n
    p = float(y) / n
    var = p * (1.0 - p) * (st2n - float(stn) * stn / n)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "y": pa.array([y], pa.int64()),
            "stn": pa.array([stn], pa.int64()),
            "sty": pa.array([sty], pa.int64()),
            "st2n": pa.array([st2n], pa.int64()),
            "t_num": pa.array([round(t_stat, 6)], pa.float64()),
            "z": pa.array([round(t_stat / math.sqrt(var), 6)], pa.float64()),
        }
    )


SQL_HOD_TREND = r"""
WITH e AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hod,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events),
g AS (SELECT hod, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(y) AS BIGINT) AS y_i
      FROM e GROUP BY 1),
s AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(y_i) AS BIGINT) AS y,
             CAST(SUM(hod * n_i) AS BIGINT) AS stn,
             CAST(SUM(hod * y_i) AS BIGINT) AS sty,
             CAST(SUM(hod * hod * n_i) AS BIGINT) AS st2n
      FROM g),
f AS (SELECT *,
             CAST(sty AS DOUBLE) - CAST(y AS DOUBLE) * stn / n AS t_stat,
             (CAST(y AS DOUBLE) / n) * (1.0 - CAST(y AS DOUBLE) / n)
               * (st2n - CAST(stn AS DOUBLE) * stn / n) AS var
      FROM s)
SELECT n, y, stn, sty, st2n,
       ROUND(t_stat, 6) AS t_num,
       ROUND(t_stat / sqrt(var), 6) AS z
FROM f
"""


def q_part_bfs_hops(sf_dir: str):
    """Multi-source BFS over the part co-occurrence graph: hop
    distance (<= 3) from the seed set {parts = 0 mod 23 present in the
    edge set} along support>=2 co-purchase edges — the k-neighborhood
    / blast-radius graph query completing the graph tier next to
    connected components (unbounded reach), pagerank (global weight)
    and triangles (local density). Edges are the `part_pair_support`
    pair-mined output, materialized once and re-scanned per round
    (<= max_hops scans, no labels-x-edges shuffle); each round
    broadcasts the frontier via ray.put and exchanges per-block
    DEDUPED neighbor sets only. Oracle: bounded-depth recursive CTE
    with min-hop fold."""
    from vaero_ray.stages.basket import pair_cooccurrence
    from vaero_ray.stages.graph import bfs_hops

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    pairs = pair_cooccurrence(ds, "l_orderkey", "l_partkey", min_support=2).materialize()

    def seed_part(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"node": pa.array([], pa.int64())})
        a = tbl.column("item_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column("item_b").to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.unique(np.concatenate([a[a % 23 == 0], b[b % 23 == 0]]))
        return pa.table({"node": pa.array(s, pa.int64())})

    seed_rows = pa.Table.from_pylist(
        pairs.map_batches(seed_part, batch_format="pyarrow", zero_copy_batch=True).take_all()
    )
    seeds = (
        np.unique(seed_rows.column("node").to_numpy(zero_copy_only=False))
        if seed_rows.num_rows
        else np.empty(0, np.int64)
    )
    return bfs_hops(pairs, "item_a", "item_b", seeds, max_hops=3)


SQL_PART_BFS = r"""
WITH RECURSIVE items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
seeds AS (SELECT DISTINCT u AS node FROM e WHERE u % 23 = 0),
r AS (
  SELECT node, 0 AS hop FROM seeds
  UNION
  SELECT e.v AS node, r.hop + 1 AS hop
  FROM r JOIN e ON e.u = r.node WHERE r.hop < 3
)
SELECT node, CAST(MIN(hop) AS BIGINT) AS hop FROM r GROUP BY 1
"""


def q_km_time_to_purchase(sf_dir: str):
    """Kaplan-Meier survival curve of time-to-first-purchase with right
    censoring (never-purchasers censored at their last event) plus the
    Nelson-Aalen cumulative hazard — the funnel-latency view that,
    unlike `view_to_purchase_quantiles`, does NOT throw away users who
    never converted (dropping them biases every latency quantile
    optimistic). Exchange: per-user sentinel-min reductions, then one
    (dur_s, event, c) row per distinct whole-second duration; the KM
    fold runs over that compressed table."""
    from vaero_ray.stages.survival import km_curve

    ds = _events(sf_dir, columns=["user_id", "event_type", "ts"])
    return km_curve(ds)


SQL_KM = r"""
WITH f AS (SELECT user_id, min(epoch_us(ts)) AS t0,
                  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS pe,
                  max(epoch_us(ts)) AS tm
           FROM events GROUP BY 1),
d AS (SELECT CASE WHEN pe IS NOT NULL THEN (pe - t0) // 1000000
                  ELSE (tm - t0) // 1000000 END AS dur,
             CASE WHEN pe IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM f),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
alld AS (SELECT dur, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1),
cums AS (SELECT dur, SUM(c) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS before
         FROM alld),
evt AS (SELECT dur AS t_sec, CAST(SUM(ev) AS BIGINT) AS n_event
        FROM d GROUP BY 1 HAVING SUM(ev) > 0),
km0 AS (SELECT e.t_sec, e.n_event,
               CAST((SELECT n FROM tot) - c.before AS BIGINT) AS n_risk
        FROM evt e JOIN cums c ON c.dur = e.t_sec),
km AS (SELECT t_sec, n_risk, n_event,
       MAX(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END)
         OVER (ORDER BY t_sec) AS zflag,
       SUM(CASE WHEN n_event < n_risk
                THEN LN(1.0 - CAST(n_event AS DOUBLE) / n_risk) ELSE 0 END)
         OVER (ORDER BY t_sec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum,
       SUM(CAST(n_event AS DOUBLE) / n_risk)
         OVER (ORDER BY t_sec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
       FROM km0)
SELECT t_sec, n_risk, n_event,
       ROUND(CASE WHEN zflag = 1 THEN 0.0 ELSE EXP(lsum) END, 6) AS surv,
       ROUND(ch, 6) AS cumhaz
FROM km
"""


def q_logrank_purchase_cohorts(sf_dir: str):
    """Two-group log-rank test: do view-first users (their earliest
    event is a view) convert to purchase on a different time scale
    than everyone else? Observed vs expected events per cohort from
    the hypergeometric fold at each distinct event time, shared
    chi-square (1 df) — the A/B-test statistic for censored funnel
    latencies, where a naive mean-delta is biased by the censoring.
    Same compressed exchange as `km_time_to_purchase` with a cohort
    axis (x2 rows)."""
    from vaero_ray.stages.survival import logrank_test

    ds = _events(sf_dir, columns=["user_id", "event_type", "ts"])
    return logrank_test(ds)


SQL_LOGRANK = r"""
WITH f AS (SELECT user_id, min(epoch_us(ts)) AS t0,
                  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS pe,
                  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS ve,
                  max(epoch_us(ts)) AS tm
           FROM events GROUP BY 1),
d AS (SELECT CASE WHEN pe IS NOT NULL THEN (pe - t0) // 1000000
                  ELSE (tm - t0) // 1000000 END AS dur,
             CASE WHEN pe IS NOT NULL THEN 1 ELSE 0 END AS ev,
             CASE WHEN ve = t0 THEN 1 ELSE 0 END AS ch
      FROM f),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ch) AS BIGINT) AS n1 FROM d),
alld AS (SELECT dur, CAST(COUNT(*) AS BIGINT) AS c,
                CAST(SUM(ch) AS BIGINT) AS c1 FROM d GROUP BY 1),
cums AS (SELECT dur,
               SUM(c) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - c AS before,
               SUM(c1) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - c1 AS before1
         FROM alld),
evt AS (SELECT dur AS t_sec, CAST(SUM(ev) AS BIGINT) AS dd,
               CAST(SUM(ev * ch) AS BIGINT) AS d1
        FROM d GROUP BY 1 HAVING SUM(ev) > 0),
ing AS (SELECT e.t_sec, e.dd, e.d1,
               (SELECT n FROM tot) - c.before AS n_all,
               (SELECT n1 FROM tot) - c.before1 AS n_c1
        FROM evt e JOIN cums c ON c.dur = e.t_sec),
agg AS (SELECT SUM(CAST(d1 AS BIGINT)) AS o1, SUM(CAST(dd AS BIGINT)) AS od,
               SUM(n_c1 * CAST(dd AS DOUBLE) / n_all) AS e1,
               SUM(CASE WHEN n_all > 1 THEN
                   dd * (CAST(n_c1 AS DOUBLE) / n_all)
                      * (1.0 - CAST(n_c1 AS DOUBLE) / n_all)
                      * (n_all - dd) / (n_all - 1) ELSE 0 END) AS v
        FROM ing)
SELECT t.cohort,
       CASE WHEN t.cohort = 'cohort_first' THEN (SELECT n1 FROM tot)
            ELSE (SELECT n FROM tot) - (SELECT n1 FROM tot) END AS n_subj,
       CAST(CASE WHEN t.cohort = 'cohort_first' THEN a.o1
                 ELSE a.od - a.o1 END AS BIGINT) AS n_event,
       ROUND(CASE WHEN t.cohort = 'cohort_first' THEN a.e1
                  ELSE a.od - a.e1 END, 6) AS expected,
       CASE WHEN a.v > 0
            THEN ROUND((a.o1 - a.e1) * (a.o1 - a.e1) / a.v, 6) END AS chi2
FROM (VALUES ('cohort_first'), ('other')) t(cohort) CROSS JOIN agg a
"""


def q_source_length_jonckheere(sf_dir: str):
    """Jonckheere-Terpstra ordered-trend test of document length
    across sources in ascending source-name order — the ordered
    sibling of `source_length_kruskal` (KW asks "any difference", JT
    asks "a monotone one"): the DOUBLED Mann-Whitney pair sum over all
    ordered source pairs, its exact null mean and tie-corrected
    variance ingredients (all int64), and the one z float. Exchange is
    the same distinct-(value, group) cell compression; the fold is two
    exclusive cumsums over the dense cell matrix, no pair loop."""
    from vaero_ray.stages.numstats import jonckheere_trend

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return jonckheere_trend(ds, "n_chars", "source")


SQL_JONCKHEERE = r"""
WITH t AS (SELECT n_chars AS v, source AS g FROM documents),
gs AS (SELECT DISTINCT g FROM t),
pairs AS (SELECT a.g AS gi, b.g AS gj FROM gs a JOIN gs b ON a.g < b.g),
u AS (SELECT p.gi, p.gj, t.g, t.v FROM pairs p JOIN t ON t.g IN (p.gi, p.gj)),
r AS (SELECT gi, gj, g, v,
             RANK() OVER (PARTITION BY gi, gj ORDER BY v) AS mn,
             COUNT(*) OVER (PARTITION BY gi, gj, v) AS c
      FROM u),
tu AS (SELECT gi, gj,
              CAST(SUM(CASE WHEN g = gj THEN 2 * mn + c - 1 ELSE 0 END) AS BIGINT) AS two_r_j,
              CAST(SUM(CASE WHEN g = gj THEN 1 ELSE 0 END) AS BIGINT) AS nj
       FROM r GROUP BY 1, 2),
jt AS (SELECT CAST(SUM(two_r_j - nj * (nj + 1)) AS BIGINT) AS two_jt FROM tu),
grp AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_j FROM t GROUP BY 1),
ties AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_v FROM t GROUP BY v),
gsum AS (SELECT CAST(SUM(n_j) AS BIGINT) AS n,
                CAST(SUM(n_j * n_j) AS BIGINT) AS s2,
                CAST(SUM(n_j * (n_j - 1) * (2 * n_j + 5)) AS BIGINT) AS ga,
                CAST(SUM(n_j * (n_j - 1) * (n_j - 2)) AS BIGINT) AS b1,
                CAST(SUM(n_j * (n_j - 1)) AS BIGINT) AS c1
         FROM grp),
tsum AS (SELECT CAST(SUM(t_v * (t_v - 1) * (2 * t_v + 5)) AS BIGINT) AS ta,
                CAST(SUM(t_v * (t_v - 1) * (t_v - 2)) AS BIGINT) AS b2,
                CAST(SUM(t_v * (t_v - 1)) AS BIGINT) AS c2
         FROM ties),
fin AS (SELECT n, n * n - s2 AS mean4,
               n * (n - 1) * (2 * n + 5) - ga - ta AS a_term,
               b1, b2, c1, c2,
               CAST(a_term AS DOUBLE) / 72.0
                 + CAST(b1 AS DOUBLE) * b2 / (36.0 * n * (n - 1.0) * (n - 2.0))
                 + CAST(c1 AS DOUBLE) * c2 / (8.0 * n * (n - 1.0)) AS var
        FROM gsum CROSS JOIN tsum)
SELECT g.g AS source, g.n_j, f.n, j.two_jt, f.mean4, f.a_term,
       f.b1, f.b2, f.c1, f.c2,
       ROUND((CAST(j.two_jt AS DOUBLE) / 2.0 - CAST(f.mean4 AS DOUBLE) / 4.0)
             / SQRT(f.var), 6) AS z_jt
FROM grp g CROSS JOIN jt j CROSS JOIN fin f
"""


def q_vocab_richness(sf_dir: str):
    """Species-richness estimators over the corpus vocabulary: Chao1
    (bias-corrected: ``V + f1(f1-1)/(2(f2+1))`` — how many distinct
    terms the corpus would show at infinite sampling) and Good-Turing
    coverage (``1 - f1/N`` — the probability mass of already-seen
    terms), both read straight off the term-frequency spectrum
    (`term_frequency_spectrum`): V distinct terms, N total tokens, f1
    singletons, f2 doubletons. The exchange is the spectrum's
    vocabulary-partials shape; the fold is four integer sums over the
    tiny count-of-counts table plus two float formulas (6-dp)."""
    from vaero_ray.stages.textstats import term_frequency_spectrum

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    spec = term_frequency_spectrum(ds).to_pandas()
    occ = spec["occurrences"].to_numpy(np.int64)
    nt = spec["n_terms"].to_numpy(np.int64)
    v = int(nt.sum())
    n = int(np.sum(occ * nt))
    f1 = int(nt[occ == 1].sum()) if (occ == 1).any() else 0
    f2 = int(nt[occ == 2].sum()) if (occ == 2).any() else 0
    chao1 = v + f1 * (f1 - 1) / (2.0 * (f2 + 1))
    cov = 1.0 - f1 / n if n else None
    return pa.table(
        {
            "v_terms": pa.array([v], pa.int64()),
            "n_tokens": pa.array([n], pa.int64()),
            "f1": pa.array([f1], pa.int64()),
            "f2": pa.array([f2], pa.int64()),
            "chao1": pa.array([round(chao1, 6)], pa.float64()),
            "gt_coverage": pa.array(
                [round(cov, 6) if cov is not None else None], pa.float64()
            ),
        }
    )


SQL_VOCAB_RICHNESS = r"""
WITH t AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
u AS (SELECT UNNEST(toks) AS token FROM t),
c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS occurrences FROM u GROUP BY 1),
spec AS (SELECT occurrences, CAST(COUNT(*) AS BIGINT) AS n_terms FROM c GROUP BY 1),
agg AS (SELECT CAST(SUM(n_terms) AS BIGINT) AS v,
               CAST(SUM(occurrences * n_terms) AS BIGINT) AS n,
               CAST(COALESCE(SUM(n_terms) FILTER (occurrences = 1), 0) AS BIGINT) AS f1,
               CAST(COALESCE(SUM(n_terms) FILTER (occurrences = 2), 0) AS BIGINT) AS f2
        FROM spec)
SELECT v AS v_terms, n AS n_tokens, f1, f2,
       ROUND(v + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6) AS chao1,
       CASE WHEN n > 0 THEN ROUND(1.0 - CAST(f1 AS DOUBLE) / n, 6) END AS gt_coverage
FROM agg
"""


def q_hourly_quade(sf_dir: str):
    """Quade test across event types with hours as blocks — the
    blocked-rank test that, unlike Friedman (`hourly_friedman`),
    WEIGHTS each block by the rank of its within-block range, so
    high-traffic hours (where a real treatment difference shows up
    large) dominate: with doubled within-block ranks 2r and doubled
    block-range ranks 2Q, the weighted centered score
    ``fourS = 2Q * (2r - (k+1))`` is exact int64, and the Quade F
    collapses to the pure integer ratio
    ``F = (b-1) * sum(S4_j^2) / (b * sum(fourS^2) - sum(S4_j^2))`` —
    the ONE float. Same bounded (type, hour) keyed-sum exchange as
    Friedman; all ranking on the tiny merged series."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hour_partial(df: _pd.DataFrame) -> _pd.DataFrame:
        hr = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        out = _pd.DataFrame({"event_type": df["event_type"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "hr"], sort=False, as_index=False).sum()

    hourly = pa.Table.from_pylist(
        bucketed_keyed_sum(
            ev.map_batches(hour_partial, batch_format="pandas"),
            ["event_type", "hr"],
            ["n"],
            num_buckets=8,
        ).take_all()
    )
    df = hourly.to_pandas()
    k = int(df["event_type"].nunique())
    cnt = df.groupby("hr")["event_type"].size()
    complete = cnt[cnt == k].index
    sub = df[df["hr"].isin(complete)].copy()
    b = int(len(complete))
    sub["two_rank"] = (
        (2 * sub.groupby("hr")["n"].rank(method="average")).round().astype(np.int64)
    )
    rng = sub.groupby("hr")["n"].agg(lambda x: int(x.max()) - int(x.min()))
    two_q = (2 * rng.rank(method="average")).round().astype(np.int64)
    sub["two_q"] = sub["hr"].map(two_q).to_numpy(np.int64)
    sub["four_s"] = sub["two_q"] * (sub["two_rank"] - (k + 1))
    a16 = int(np.sum(sub["four_s"].to_numpy(np.int64) ** 2))
    s4 = sub.groupby("event_type", sort=True)["four_s"].sum()
    sb = int(np.sum(s4.to_numpy(np.int64) ** 2))
    den = b * a16 - sb
    f = round((b - 1) * sb / den, 6) if den > 0 else None
    nt = len(s4)
    return pa.table(
        {
            "event_type": pa.array(list(s4.index), pa.string()),
            "s4": pa.array(s4.to_numpy(np.int64), pa.int64()),
            "b": pa.array([b] * nt, pa.int64()),
            "k": pa.array([k] * nt, pa.int64()),
            "a16": pa.array([a16] * nt, pa.int64()),
            "sb": pa.array([sb] * nt, pa.int64()),
            "f_quade": pa.array([f] * nt, pa.float64()),
        }
    )


SQL_QUADE = r"""
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM h),
cb AS (SELECT hr FROM h GROUP BY hr HAVING COUNT(*) = (SELECT k FROM k)),
r AS (SELECT h.event_type, h.hr, h.n,
             CAST(2 * RANK() OVER (PARTITION BY h.hr ORDER BY h.n)
                  + COUNT(*) OVER (PARTITION BY h.hr, h.n) - 1 AS BIGINT) AS two_rank
      FROM h JOIN cb USING (hr)),
rng AS (SELECT hr, MAX(n) - MIN(n) AS sp FROM r GROUP BY 1),
q AS (SELECT hr, CAST(2 * RANK() OVER (ORDER BY sp)
                 + COUNT(*) OVER (PARTITION BY sp) - 1 AS BIGINT) AS two_q
      FROM rng),
s AS (SELECT r.event_type, r.hr,
             q.two_q * (r.two_rank - ((SELECT k FROM k) + 1)) AS four_s
      FROM r JOIN q USING (hr)),
b AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM cb),
a16 AS (SELECT CAST(SUM(four_s * four_s) AS BIGINT) AS a16 FROM s),
g AS (SELECT event_type, CAST(SUM(four_s) AS BIGINT) AS s4 FROM s GROUP BY 1),
sb AS (SELECT CAST(SUM(s4 * s4) AS BIGINT) AS sb FROM g)
SELECT g.event_type, g.s4, b.b, k.k, a16.a16, sb.sb,
       CASE WHEN b.b * a16.a16 - sb.sb > 0
            THEN ROUND((b.b - 1) * CAST(sb.sb AS DOUBLE)
                       / (b.b * a16.a16 - sb.sb), 6) END AS f_quade
FROM g CROSS JOIN b CROSS JOIN k CROSS JOIN a16 CROSS JOIN sb
"""


def q_user_halves_mcnemar(sf_dir: str):
    """McNemar's paired test of user activity between the two halves of
    the observation window: each user is their own control (the paired
    design removes between-user variance); only the DISCORDANT users —
    active in exactly one half — carry information. Counts n11/b/c are
    exact int64 off one per-user (min ts, max ts) exchange against the
    driver-computed global midpoint; chi-square plain + Edwards
    continuity-corrected are the 6-dp floats."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_agg

    ds = _events(sf_dir, columns=["user_id", "ts"])

    def span_partial(tbl: pa.Table) -> pa.Table:
        us = pc.cast(tbl.column("ts"), pa.int64())
        return pa.table(
            {
                "lo": pa.array([pc.min(us).as_py()], pa.int64()),
                "hi": pa.array([pc.max(us).as_py()], pa.int64()),
            }
        )

    span = ds.map_batches(span_partial, batch_format="pyarrow").to_pandas()
    lo, hi = int(span["lo"].min()), int(span["hi"].max())
    mid = (lo + hi) // 2

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        out = _pd.DataFrame({"user_id": df["user_id"], "mn": us, "mx": us})
        return out.groupby("user_id", sort=False, as_index=False).agg(
            {"mn": "min", "mx": "max"}
        )

    spans = bucketed_keyed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], {"mn": "min", "mx": "max"},
    ).to_pandas()
    a1 = spans["mn"].to_numpy(np.int64) < mid
    a2 = spans["mx"].to_numpy(np.int64) >= mid
    n11 = int(np.sum(a1 & a2))
    bb = int(np.sum(a1 & ~a2))
    cc = int(np.sum(~a1 & a2))
    chi2 = round((bb - cc) * (bb - cc) / (bb + cc), 6) if bb + cc else None
    d = abs(bb - cc) - 1
    chi2_cc = round(d * d / (bb + cc), 6) if bb + cc else None
    return pa.table(
        {
            "n_both": pa.array([n11], pa.int64()),
            "b_then_not": pa.array([bb], pa.int64()),
            "c_not_then": pa.array([cc], pa.int64()),
            "chi2": pa.array([chi2], pa.float64()),
            "chi2_cc": pa.array([chi2_cc], pa.float64()),
        }
    )


SQL_MCNEMAR = r"""
WITH g AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
u AS (SELECT user_id, min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
      FROM events GROUP BY 1),
f AS (SELECT CASE WHEN mn < (g.lo + g.hi) // 2 THEN 1 ELSE 0 END AS a1,
             CASE WHEN mx >= (g.lo + g.hi) // 2 THEN 1 ELSE 0 END AS a2
      FROM u CROSS JOIN g),
c AS (SELECT CAST(SUM(a1 * a2) AS BIGINT) AS n_both,
             CAST(SUM(a1 * (1 - a2)) AS BIGINT) AS b,
             CAST(SUM((1 - a1) * a2) AS BIGINT) AS c
      FROM f)
SELECT n_both, b AS b_then_not, c AS c_not_then,
       CASE WHEN b + c > 0
            THEN ROUND((b - c) * (b - c) / CAST(b + c AS DOUBLE), 6) END AS chi2,
       CASE WHEN b + c > 0
            THEN ROUND((ABS(b - c) - 1) * (ABS(b - c) - 1)
                       / CAST(b + c AS DOUBLE), 6) END AS chi2_cc
FROM c
"""


def q_cohort_conversion_odds(sf_dir: str):
    """Odds ratio (Haldane-Anscombe corrected) with a 95% Wald CI for
    view-first cohort membership vs eventual purchase — the effect-size
    companion to the log-rank gate (`logrank_purchase_cohorts`): the
    2x2 cells ride the SAME per-user sentinel-min exchange; the cells
    are exact int64 and lnOR/SE/CI are the mirrored 6-dp floats
    (+0.5 on every cell, so zero cells stay finite)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_agg

    NO_TS = 1 << 62
    ds = _events(sf_dir, columns=["user_id", "event_type", "ts"])

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        out = _pd.DataFrame(
            {
                "user_id": df["user_id"],
                "t0": us,
                "pe": np.where(et == "purchase", us, NO_TS),
                "ve": np.where(et == "view", us, NO_TS),
            }
        )
        return out.groupby("user_id", sort=False, as_index=False).agg(
            {"t0": "min", "pe": "min", "ve": "min"}
        )

    firsts = bucketed_keyed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], {"t0": "min", "pe": "min", "ve": "min"},
    ).to_pandas()
    cohort = firsts["ve"].to_numpy(np.int64) == firsts["t0"].to_numpy(np.int64)
    conv = firsts["pe"].to_numpy(np.int64) < NO_TS
    a = int(np.sum(cohort & conv))
    b = int(np.sum(cohort & ~conv))
    c = int(np.sum(~cohort & conv))
    d = int(np.sum(~cohort & ~conv))
    lnor = math.log(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5)))
    se = math.sqrt(1 / (a + 0.5) + 1 / (b + 0.5) + 1 / (c + 0.5) + 1 / (d + 0.5))
    return pa.table(
        {
            "a_conv": pa.array([a], pa.int64()),
            "b_noconv": pa.array([b], pa.int64()),
            "c_conv": pa.array([c], pa.int64()),
            "d_noconv": pa.array([d], pa.int64()),
            "odds_ratio": pa.array([round(math.exp(lnor), 6)], pa.float64()),
            "ci_lo": pa.array([round(math.exp(lnor - 1.96 * se), 6)], pa.float64()),
            "ci_hi": pa.array([round(math.exp(lnor + 1.96 * se), 6)], pa.float64()),
        }
    )


SQL_COHORT_ODDS = r"""
WITH u AS (SELECT user_id, min(epoch_us(ts)) AS t0,
                  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS pe,
                  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS ve
           FROM events GROUP BY 1),
f AS (SELECT CASE WHEN ve = t0 THEN 1 ELSE 0 END AS coh,
             CASE WHEN pe IS NOT NULL THEN 1 ELSE 0 END AS conv
      FROM u),
c AS (SELECT CAST(SUM(coh * conv) AS BIGINT) AS a,
             CAST(SUM(coh * (1 - conv)) AS BIGINT) AS b,
             CAST(SUM((1 - coh) * conv) AS BIGINT) AS c,
             CAST(SUM((1 - coh) * (1 - conv)) AS BIGINT) AS d
      FROM f),
s AS (SELECT a, b, c, d,
             LN(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))) AS lnor,
             SQRT(1 / (a + 0.5) + 1 / (b + 0.5) + 1 / (c + 0.5) + 1 / (d + 0.5)) AS se
      FROM c)
SELECT a AS a_conv, b AS b_noconv, c AS c_conv, d AS d_noconv,
       ROUND(EXP(lnor), 6) AS odds_ratio,
       ROUND(EXP(lnor - 1.96 * se), 6) AS ci_lo,
       ROUND(EXP(lnor + 1.96 * se), 6) AS ci_hi
FROM s
"""


def q_bm25_top_docs(sf_dir: str):
    """Okapi BM25 top-10 for the bag-of-terms query {hash, join,
    stream} — the length-normalized, tf-saturating ranking next to the
    integer tf-idf gate (`query_top_docs`): with k1=6/5, b=3/4 the
    saturation factor is an exact int64 rational, so the only floats
    are the 3 idf constants and a FIXED-ORDER 3-term weighted sum
    (identical association in the oracle). Corpus totals: N from the
    parquet footer, Ntok from one per-block token-count sum."""
    import pyarrow.parquet as _pq

    from vaero_ray.stages.textstats import bm25_topk_docs

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tok_count(tbl: pa.Table) -> pa.Table:
        from vaero_ray.stages.dedup import _flat_tokens

        toks, _ = _flat_tokens(tbl, "text")
        return pa.table({"ntok": pa.array([len(toks)], pa.int64())})

    ntok = int(
        ds.map_batches(tok_count, batch_format="pyarrow", zero_copy_batch=True).sum("ntok")
    )
    return bm25_topk_docs(
        ds, terms=["hash", "join", "stream"], n_docs=int(n_docs), n_tokens_total=ntok, k=10
    )


SQL_BM25 = r"""
WITH t AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(toks)) AS BIGINT) AS ntok FROM t),
u AS (SELECT doc_id, UNNEST(toks) AS tok FROM t),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       FROM u WHERE tok IN ('hash', 'join', 'stream') GROUP BY 1, 2),
dfc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
p AS (SELECT tf.doc_id,
             CAST(COALESCE(SUM(tf) FILTER (tok = 'hash'), 0) AS BIGINT) AS tf_a,
             CAST(COALESCE(SUM(tf) FILTER (tok = 'join'), 0) AS BIGINT) AS tf_b,
             CAST(COALESCE(SUM(tf) FILTER (tok = 'stream'), 0) AS BIGINT) AS tf_c
      FROM tf GROUP BY 1),
idf AS (SELECT
  LN((n.n - COALESCE((SELECT df FROM dfc WHERE tok = 'hash'), 0) + 0.5)
     / (COALESCE((SELECT df FROM dfc WHERE tok = 'hash'), 0) + 0.5) + 1.0) AS ia,
  LN((n.n - COALESCE((SELECT df FROM dfc WHERE tok = 'join'), 0) + 0.5)
     / (COALESCE((SELECT df FROM dfc WHERE tok = 'join'), 0) + 0.5) + 1.0) AS ib,
  LN((n.n - COALESCE((SELECT df FROM dfc WHERE tok = 'stream'), 0) + 0.5)
     / (COALESCE((SELECT df FROM dfc WHERE tok = 'stream'), 0) + 0.5) + 1.0) AS ic
  FROM n),
s AS (SELECT p.doc_id,
             idf.ia * ((22.0 * p.tf_a) * n.ntok
                       / (10 * p.tf_a * n.ntok + 3 * n.ntok + 9 * dl.dl * n.n))
           + idf.ib * ((22.0 * p.tf_b) * n.ntok
                       / (10 * p.tf_b * n.ntok + 3 * n.ntok + 9 * dl.dl * n.n))
           + idf.ic * ((22.0 * p.tf_c) * n.ntok
                       / (10 * p.tf_c * n.ntok + 3 * n.ntok + 9 * dl.dl * n.n)) AS score
      FROM p JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN idf)
SELECT doc_id, ROUND(score, 6) AS score
FROM s ORDER BY s.score DESC, doc_id LIMIT 10
"""


# ------------------------------------------------------------------
# Session-13 batch 1: distribution-distance + paired-agreement
# statistics — Wasserstein-1/Hellinger beside KS/PSI/JSD, Cohen's
# kappa beside McNemar
# ------------------------------------------------------------------

def q_length_emd_en_rest(sf_dir: str):
    """Wasserstein-1 (earth mover's) distance + Hellinger affinity of
    English vs non-English document lengths — the integrated companion
    to `length_ks_en_rest` (KS is the WORST CDF gap, W1 its integral;
    Hellinger the bounded affinity metric). Same distinct-value
    compression: one (len, c_en, c_rest) row per distinct length moves,
    never documents; w1_num exact int64, w1 the raw division
    (bit-identical), bc/hellinger 6-dp."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.numstats import emd_two_sample

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        en = pc.equal(t.column("lang"), "en").to_numpy(zero_copy_only=False)
        df = _pd.DataFrame(
            {
                "v": t.column("n_chars").to_numpy(zero_copy_only=False),
                "c1": en.astype(np.int64),
                "c2": (~en).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("v", sort=False, as_index=False).sum(), preserve_index=False
        )

    merged = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["v"], ["c1", "c2"], num_buckets=4,
    )
    return emd_two_sample(merged, "v")


SQL_LENGTH_EMD = r"""
WITH a AS (SELECT n_chars AS v,
                  COUNT(*) FILTER (WHERE lang = 'en') AS c1,
                  COUNT(*) FILTER (WHERE lang <> 'en') AS c2
           FROM documents GROUP BY 1),
w AS (SELECT v, c1, c2,
             SUM(c1) OVER (ORDER BY v) AS cum1,
             SUM(c2) OVER (ORDER BY v) AS cum2,
             LEAD(v) OVER (ORDER BY v) AS nxt FROM a),
t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM a),
s AS (SELECT CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                           ELSE abs(n2 * cum1 - n1 * cum2) * (nxt - v) END)
                  AS BIGINT) AS w1_num,
             SUM(SQRT(CAST(c1 * c2 AS DOUBLE))) AS bc_raw
      FROM w, t GROUP BY n1, n2)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, w1_num,
       CAST(w1_num AS DOUBLE) / (n1 * n2) AS w1,
       ROUND(bc_raw / SQRT(CAST(n1 AS DOUBLE) * n2), 6) AS bc,
       ROUND(SQRT(GREATEST(0.0, 1.0 - bc_raw / SQRT(CAST(n1 AS DOUBLE) * n2))), 6)
           AS hellinger
FROM s, t
"""


def q_user_halves_kappa(sf_dir: str):
    """Cohen's kappa of each user's MODAL event type between the first
    and second half of their own event sequence — chance-corrected
    behavioral self-agreement, the categorical companion to the
    presence-based `user_halves_mcnemar`. One bucketed shuffle on
    user_id; only modal-contingency cells leave a bucket; kappa is an
    exact int64 rational plus the raw float64 division."""
    from vaero_ray.stages.numstats import paired_halves_kappa

    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"])
    return paired_halves_kappa(ds, "user_id", "ts", "event_id", "event_type")


SQL_HALVES_KAPPA = r"""
WITH e AS (SELECT user_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                  COUNT(*) OVER (PARTITION BY user_id) AS n
           FROM events),
h AS (SELECT user_id, event_type,
             CASE WHEN rn <= (n + 1) // 2 THEN 1 ELSE 2 END AS half
      FROM e WHERE n >= 2),
c AS (SELECT user_id, half, event_type, COUNT(*) AS c FROM h GROUP BY 1, 2, 3),
m AS (SELECT user_id, half, event_type FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, half
                                      ORDER BY c DESC, event_type) AS r FROM c)
      WHERE r = 1),
p AS (SELECT a.event_type AS m1, b.event_type AS m2
      FROM m a JOIN m b USING (user_id) WHERE a.half = 1 AND b.half = 2),
g AS (SELECT m1, m2, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(COALESCE(SUM(c) FILTER (WHERE m1 = m2), 0) AS BIGINT) AS agree
        FROM g),
r_ AS (SELECT m1 AS k, SUM(c) AS rc FROM g GROUP BY 1),
c_ AS (SELECT m2 AS k, SUM(c) AS cc FROM g GROUP BY 1),
pe AS (SELECT CAST(COALESCE(SUM(rc * cc), 0) AS BIGINT) AS pe_num
       FROM r_ JOIN c_ USING (k))
SELECT tot.n AS n_keys, tot.agree, pe.pe_num,
       tot.agree * tot.n - pe.pe_num AS kappa_num,
       tot.n * tot.n - pe.pe_num AS kappa_den,
       CASE WHEN tot.n * tot.n - pe.pe_num <> 0
            THEN CAST(tot.agree * tot.n - pe.pe_num AS DOUBLE)
                 / (tot.n * tot.n - pe.pe_num) END AS kappa
FROM tot, pe
"""


# ------------------------------------------------------------------
# Session-13 batch 2: link prediction + association over the
# co-purchase basket graph — Adamic-Adar, lift, degree assortativity
# ------------------------------------------------------------------

def q_part_adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction over the order<->part bipartite
    graph: top-20 part pairs by common orders discounted 1/ln(order
    size) — degree-weighted evidence beside the raw-support
    `part_pair_support` gate. Integer micro-unit weights keep the
    distributed sums exact; `aa` is the raw float division."""
    from vaero_ray.stages.basket import adamic_adar_pairs

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    return adamic_adar_pairs(ds, "l_orderkey", "l_partkey", top_k=20)


SQL_ADAMIC_ADAR = r"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
d AS (SELECT l_orderkey, COUNT(*) AS sz FROM li GROUP BY 1),
w AS (SELECT l_orderkey, CAST(ROUND(1000000000000.0 / LN(sz)) AS BIGINT) AS wt
      FROM d WHERE sz >= 2),
p AS (SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, w.wt
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
      JOIN w ON w.l_orderkey = a.l_orderkey),
s AS (SELECT item_a, item_b, CAST(SUM(wt) AS BIGINT) AS aa_micro,
             CAST(COUNT(*) AS BIGINT) AS common_groups
      FROM p GROUP BY 1, 2)
SELECT item_a, item_b, aa_micro, common_groups,
       CAST(aa_micro AS DOUBLE) / 1e12 AS aa
FROM s ORDER BY aa_micro DESC, item_a, item_b LIMIT 20
"""


def q_part_pair_lift(sf_dir: str):
    """Association-rule lift on the co-purchase pairs: support*N /
    (cnt_a*cnt_b) as an exact integer rational (num/den emitted), raw
    float division for the ranking. min_support=5 prunes the rare-pair
    noise lift is notorious for; deterministic top-20."""
    from vaero_ray.stages.basket import pair_lift

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    return pair_lift(ds, "l_orderkey", "l_partkey", min_support=5, top_k=20)


SQL_PAIR_LIFT = r"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ng FROM li),
cnt AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY 1),
p AS (SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 5),
s AS (SELECT p.item_a, p.item_b, p.support,
             ca.c AS cnt_a, cb.c AS cnt_b,
             p.support * n.ng AS lift_num, ca.c * cb.c AS lift_den
      FROM p JOIN cnt ca ON ca.l_partkey = p.item_a
             JOIN cnt cb ON cb.l_partkey = p.item_b
             CROSS JOIN n)
SELECT item_a, item_b, support, cnt_a, cnt_b, lift_num, lift_den,
       CAST(lift_num AS DOUBLE) / CAST(lift_den AS DOUBLE) AS lift
FROM s ORDER BY lift DESC, item_a, item_b LIMIT 20
"""


def q_part_degree_assortativity(sf_dir: str):
    """Degree assortativity of the part co-purchase graph (Pearson r of
    endpoint degrees over symmetrized distinct edges) — do popular
    parts co-occur with popular parts? Moments exact int64 per block,
    one tiny merge; r the raw float division."""
    from vaero_ray.stages.basket import pair_cooccurrence
    from vaero_ray.stages.graph import degree_assortativity

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    edges = pair_cooccurrence(ds, "l_orderkey", "l_partkey").drop_columns(["support"])
    return degree_assortativity(edges)


SQL_DEGREE_ASSORT = r"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT a.l_partkey AS pa_, b.l_partkey AS pb_
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey),
d AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT pa_ AS k FROM e UNION ALL SELECT pb_ FROM e) GROUP BY 1),
j AS (SELECT da.deg AS da, db.deg AS db
      FROM e JOIN d da ON da.k = e.pa_ JOIN d db ON db.k = e.pb_),
m AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS n,
             CAST(SUM(da + db) AS BIGINT) AS sx,
             CAST(SUM(da * da + db * db) AS BIGINT) AS sxx,
             CAST(2 * SUM(da * db) AS BIGINT) AS sxy
      FROM j)
SELECT n, sx, sxx, sxy,
       n * sxy - sx * sx AS r_num, n * sxx - sx * sx AS r_den,
       CASE WHEN n * sxx - sx * sx <> 0
            THEN CAST(n * sxy - sx * sx AS DOUBLE) / (n * sxx - sx * sx)
       END AS assortativity
FROM m
"""


# ------------------------------------------------------------------
# Session-13 batch 3: seasonality + chain predictability — first
# harmonic of the hour-of-day profile, Markov conditional entropy
# ------------------------------------------------------------------

def q_type_daily_cycle(sf_dir: str):
    """First-harmonic daily-cycle amplitude per event type: how
    concentrated is each type's activity within the 24-hour clock
    (rel_amp 0 flat, ->1 single-phase)? Exact (type, hod, count) cells
    are all that moves; trig enters only the final 24-term fold."""
    from vaero_ray.stages.numstats import daily_cycle_per_group

    ds = _events(sf_dir, columns=["event_type", "ts"])
    return daily_cycle_per_group(ds, "event_type", "ts")


SQL_DAILY_CYCLE = r"""
WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
s AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
             SUM(n * COS(2 * PI() * hod / 24.0)) AS a1,
             SUM(n * SIN(2 * PI() * hod / 24.0)) AS b1
      FROM c GROUP BY 1)
SELECT event_type, total, ROUND(a1, 6) AS a1, ROUND(b1, 6) AS b1,
       ROUND(SQRT(a1 * a1 + b1 * b1), 6) AS amp,
       ROUND(2.0 * SQRT(a1 * a1 + b1 * b1) / total, 6) AS rel_amp
FROM s
"""


def q_event_chain_entropy(sf_dir: str):
    """Conditional entropy H(next|prev) + next-marginal entropy + their
    mutual information over the per-user event-type Markov chain — the
    predictability summary on top of the `event_type_transitions`
    matrix (same bounded-cells exchange, one extra driver fold)."""
    from vaero_ray.stages.cep import transition_counts
    from vaero_ray.stages.numstats import markov_entropy

    ds = _events(sf_dir, columns=["user_id", "ts", "event_type", "event_id"])
    cells = transition_counts(ds, "user_id", "ts", "event_type", "event_id")
    return markov_entropy(cells.select(["prev", "cur", "n"]))


SQL_CHAIN_ENTROPY = r"""
WITH s AS (SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
c AS (SELECT prev, event_type AS cur, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(COUNT(*) AS BIGINT) AS cells FROM c),
r AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS rn FROM c GROUP BY 1),
m AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS mn FROM c GROUP BY 1),
hc AS (SELECT SUM((CAST(c.n AS DOUBLE) / t.nn)
                  * LN(CAST(c.n AS DOUBLE) / r.rn)) AS sc
       FROM c JOIN r USING (prev) CROSS JOIN t),
hn AS (SELECT SUM((CAST(mn AS DOUBLE) / t.nn)
                  * LN(CAST(mn AS DOUBLE) / t.nn)) AS sn
       FROM m CROSS JOIN t)
SELECT t.nn AS n_trans, t.cells AS n_cells,
       ROUND(-hc.sc, 6) AS h_cond, ROUND(-hn.sn, 6) AS h_next,
       ROUND(-hn.sn + hc.sc, 6) AS mi
FROM t, hc, hn
"""


# ------------------------------------------------------------------
# Session-13 batch 4: asymmetric containment dedup (the case
# Jaccard-LSH misses) + streaming CUSUM change-point parity
# ------------------------------------------------------------------

def q_doc_containment_dups(sf_dir: str):
    """Asymmetric n-gram containment pairs (quote/subset detection):
    inverted-index candidates with a df<=256 stop-gram cap that IS the
    mirrored semantics, integer 4/5 threshold — finds the
    short-inside-long dups whose Jaccard is too small for the LSH
    gates to propose."""
    from vaero_ray.stages.dedup import ngram_containment_dups

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_containment_dups(ds, containment_num=4, containment_den=5)


SQL_CONTAINMENT = """
WITH s AS (
  SELECT doc_id, list_distinct(CASE WHEN length(text) < 5 THEN [rpad(text, 5, ' ')]
         ELSE [substr(text, CAST(i AS INT), 5) FOR i IN range(1, length(text)-3)] END) AS sh
  FROM documents
),
e AS (SELECT doc_id, UNNEST(sh) AS g FROM s),
df AS (SELECT g, COUNT(*) AS d FROM e GROUP BY 1),
ek AS (SELECT e.doc_id, e.g FROM e JOIN df USING (g) WHERE df.d <= 256),
ck AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM ek GROUP BY 1),
p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(COUNT(*) AS BIGINT) AS inter
      FROM ek a JOIN ek b ON a.g = b.g AND a.doc_id > b.doc_id GROUP BY 1, 2)
SELECT p.ida AS doc_id, p.idb AS dup_of, p.inter AS n_common,
       LEAST(ca.n, cb.n) AS n_small
FROM p JOIN ck ca ON ca.doc_id = p.ida JOIN ck cb ON cb.doc_id = p.idb
WHERE 5 * p.inter >= 4 * LEAST(ca.n, cb.n)
"""


def q_streaming_cusum_peak(sf_dir: str):
    """STREAMING CUSUM change-point per event type: exact hourly counts
    ride the exactly-once windowed job (checkpointed partial/merge,
    idempotent commit); the integer level-shift fold
    (numstats.cusum_peak_per_group) runs downstream of the committed
    output — stream==batch parity with the `hourly_cusum_peak` gate,
    zero new streaming machinery."""
    import os
    import shutil

    from vaero_ray.stages.numstats import cusum_peak_per_group
    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(sf_dir, "cusum_in", ["event_type", "ts"])
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/cusum_out", f"{base}/cusum_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["event_type"],
        aggs=[AggSpec(None, "count", "c")],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,
        num_partitions=4,
    )
    job.run()

    def to_hr(tbl: pa.Table) -> pa.Table:
        hr = pc.divide(
            pc.cast(tbl.column("window_start"), pa.int64()),
            pa.scalar(3_600_000_000, pa.int64()),
        )
        return pa.table(
            {"event_type": tbl.column("event_type"), "hr": hr, "c": tbl.column("c")}
        )

    series = job.committed_output().map_batches(
        to_hr, batch_format="pyarrow", zero_copy_batch=True
    )
    out = cusum_peak_per_group(series, "event_type", "hr", "c")

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(
            ["event_type", "n_points", "total", "peak_dev", "peak_hr"]
        )

    return out.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


SQL_STREAMING_CUSUM = r"""
WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS x
           FROM events GROUP BY 1, 2),
w AS (SELECT event_type, hr, x,
             SUM(x) OVER (PARTITION BY event_type ORDER BY hr) AS pref,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS k,
             SUM(x) OVER (PARTITION BY event_type) AS tot,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c),
d AS (SELECT event_type, hr, n, tot, abs(n * pref - k * tot) AS dev,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY abs(n * pref - k * tot) DESC, hr) AS rn
      FROM w)
SELECT event_type, CAST(n AS BIGINT) AS n_points, CAST(tot AS BIGINT) AS total,
       CAST(dev AS BIGINT) AS peak_dev, CAST(hr AS BIGINT) AS peak_hr
FROM d WHERE rn = 1
"""


# ------------------------------------------------------------------
# Session-13 batch 5: hybrid retrieval (reciprocal-rank fusion of the
# tf-idf and BM25 rankers) + generic set-containment join on baskets
# ------------------------------------------------------------------

def q_rrf_top_docs(sf_dir: str):
    """Reciprocal-rank fusion of the integer tf-idf and BM25 rankings
    for the bag-of-terms query {hash, join, stream} — the standard
    hybrid-retrieval combiner: ranks are ROW_NUMBERs over the candidate
    set, each reciprocal quantized to nano-units so the fused score is
    an exact int64 sum; one query-pruned scan feeds both scorers, one
    range sort per ranking."""
    import pyarrow.parquet as _pq

    from vaero_ray.stages.dedup import _flat_tokens
    from vaero_ray.stages.textstats import rrf_topk_docs

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tok_count(tbl: pa.Table) -> pa.Table:
        toks, _ = _flat_tokens(tbl, "text")
        return pa.table({"ntok": pa.array([len(toks)], pa.int64())})

    ntok = int(
        ds.map_batches(tok_count, batch_format="pyarrow", zero_copy_batch=True).sum("ntok")
    )
    return rrf_topk_docs(
        ds, terms=["hash", "join", "stream"], n_docs=int(n_docs),
        n_tokens_total=ntok, k=10,
    )


SQL_RRF = r"""
WITH t AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(toks)) AS BIGINT) AS ntok FROM t),
u AS (SELECT doc_id, UNNEST(toks) AS tok FROM t),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       FROM u WHERE tok IN ('hash', 'join', 'stream') GROUP BY 1, 2),
dfc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
p AS (SELECT tf.doc_id,
             CAST(COALESCE(SUM(tf) FILTER (tok = 'hash'), 0) AS BIGINT) AS tf_a,
             CAST(COALESCE(SUM(tf) FILTER (tok = 'join'), 0) AS BIGINT) AS tf_b,
             CAST(COALESCE(SUM(tf) FILTER (tok = 'stream'), 0) AS BIGINT) AS tf_c
      FROM tf GROUP BY 1),
idf AS (SELECT
  LN((n.n - COALESCE((SELECT df FROM dfc WHERE tok = 'hash'), 0) + 0.5)
     / (COALESCE((SELECT df FROM dfc WHERE tok = 'hash'), 0) + 0.5) + 1.0) AS ia,
  LN((n.n - COALESCE((SELECT df FROM dfc WHERE tok = 'join'), 0) + 0.5)
     / (COALESCE((SELECT df FROM dfc WHERE tok = 'join'), 0) + 0.5) + 1.0) AS ib,
  LN((n.n - COALESCE((SELECT df FROM dfc WHERE tok = 'stream'), 0) + 0.5)
     / (COALESCE((SELECT df FROM dfc WHERE tok = 'stream'), 0) + 0.5) + 1.0) AS ic
  FROM n),
w AS (SELECT
  (1000 * n.n) // GREATEST(COALESCE((SELECT df FROM dfc WHERE tok = 'hash'), 0), 1) AS wa,
  (1000 * n.n) // GREATEST(COALESCE((SELECT df FROM dfc WHERE tok = 'join'), 0), 1) AS wb,
  (1000 * n.n) // GREATEST(COALESCE((SELECT df FROM dfc WHERE tok = 'stream'), 0), 1) AS wc
  FROM n),
s AS (SELECT p.doc_id,
             CAST(p.tf_a * w.wa + p.tf_b * w.wb + p.tf_c * w.wc AS BIGINT) AS s_tfidf,
             idf.ia * ((22.0 * p.tf_a) * n.ntok
                       / (10 * p.tf_a * n.ntok + 3 * n.ntok + 9 * dl.dl * n.n))
           + idf.ib * ((22.0 * p.tf_b) * n.ntok
                       / (10 * p.tf_b * n.ntok + 3 * n.ntok + 9 * dl.dl * n.n))
           + idf.ic * ((22.0 * p.tf_c) * n.ntok
                       / (10 * p.tf_c * n.ntok + 3 * n.ntok + 9 * dl.dl * n.n)) AS s_bm25
      FROM p JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN idf CROSS JOIN w),
r AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY s_tfidf DESC, doc_id) AS rank_tfidf,
             ROW_NUMBER() OVER (ORDER BY s_bm25 DESC, doc_id) AS rank_bm25
      FROM s),
f AS (SELECT doc_id, CAST(rank_tfidf AS BIGINT) AS rank_tfidf,
             CAST(rank_bm25 AS BIGINT) AS rank_bm25,
             CAST(ROUND(1e9 / (60 + rank_tfidf)) AS BIGINT)
           + CAST(ROUND(1e9 / (60 + rank_bm25)) AS BIGINT) AS rrf_nano
      FROM r)
SELECT doc_id, rank_tfidf, rank_bm25, rrf_nano,
       CAST(rrf_nano AS DOUBLE) / 1e9 AS rrf
FROM f ORDER BY rrf_nano DESC, doc_id LIMIT 10
"""


def q_order_basket_containment(sf_dir: str):
    """Set-containment similarity join on order baskets: order pairs
    where >= 2/3 of the smaller basket's distinct parts (and >= 2
    parts) appear in the other — near-identical-order detection, the
    generic form of the containment dedup with raw part keys as the
    posting space (no hashing; the oracle joins on values)."""
    from vaero_ray.stages.dedup import set_containment_pairs

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    return set_containment_pairs(
        ds, "l_orderkey", "l_partkey",
        containment_num=2, containment_den=3, min_common=2,
    )


SQL_BASKET_CONTAINMENT = r"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
df AS (SELECT l_partkey, COUNT(*) AS d FROM li GROUP BY 1),
ek AS (SELECT li.l_orderkey, li.l_partkey FROM li JOIN df USING (l_partkey)
       WHERE df.d <= 4096),
ck AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n FROM ek GROUP BY 1),
p AS (SELECT a.l_orderkey AS ida, b.l_orderkey AS idb, CAST(COUNT(*) AS BIGINT) AS inter
      FROM ek a JOIN ek b ON a.l_partkey = b.l_partkey
                          AND a.l_orderkey > b.l_orderkey
      GROUP BY 1, 2)
SELECT p.ida AS l_orderkey, p.idb AS dup_of, p.inter AS n_common,
       LEAST(ca.n, cb.n) AS n_small
FROM p JOIN ck ca ON ca.l_orderkey = p.ida JOIN ck cb ON cb.l_orderkey = p.idb
WHERE 3 * p.inter >= 2 * LEAST(ca.n, cb.n) AND p.inter >= 2
"""


# ------------------------------------------------------------------
# Session-13 batch 6: data-QA referential-integrity audit, Hill
# power-law tail exponent, embedding Gram matrix
# ------------------------------------------------------------------

_FK_SPECS = [
    # (fk label, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def q_referential_integrity(sf_dir: str):
    """Cross-table referential-integrity audit — the data-QA gate a
    warehouse runs before trusting joins: for each FK edge, exact child
    row count (parquet footer), orphan ROW count and distinct orphan
    KEY count. Scale shape per FK: the child projects to per-block
    (key, count) partials (keys-only — no payload ever moves), one
    keyed-sum exchange, then the anti semi-join against the parent's
    key projection; orphan totals are a tiny fold over surviving keys."""
    import pandas as _pd

    from vaero_ray.stages.joins import semi_join
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    # each FK audit is its own small pipeline (keys-only keyed sum +
    # anti semi-join), run sequentially: ~2 s fixed premium per audit at
    # toy scale (the documented multi-execution cost — measured: driver
    # threads contend instead of overlapping, 18 s; a union-everything
    # single pipeline defeats stage fusion, 48 s; sequential is 15 s and
    # the per-audit shape is the one that matters at 100 TB)
    def audit(spec):
        label, child, ck, parent, pk = spec
        n_rows = pq.ParquetFile(f"{sf_dir}/{child}.parquet").metadata.num_rows
        cds = _read_pq(f"{sf_dir}/{child}.parquet", columns=[ck])

        def partial(tbl: pa.Table, _ck=ck) -> pa.Table:
            g = tbl.group_by(_ck).aggregate([([], "count_all")])
            return pa.table(
                {"k": pc.cast(g.column(_ck), pa.int64()),
                 "c": g.column("count_all")}
            )

        cnts = bucketed_keyed_sum(
            cds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["k"], ["c"], num_buckets=4,
        )
        pds = _read_pq(f"{sf_dir}/{parent}.parquet", columns=[pk])

        def pkeys(tbl: pa.Table, _pk=pk) -> pa.Table:
            return pa.table({"k": pc.cast(tbl.column(_pk), pa.int64())})

        parent_keys = pds.map_batches(pkeys, batch_format="pyarrow", zero_copy_batch=True)
        orphans = semi_join(
            cnts, parent_keys, keys="k", anti=True, num_buckets=8
        ).to_pandas()
        return {
            "fk": label,
            "n_rows": int(n_rows),
            "n_orphan_rows": int(orphans["c"].sum()) if len(orphans) else 0,
            "n_orphan_keys": int(len(orphans)),
        }

    rows = [audit(spec) for spec in _FK_SPECS]
    df = _pd.DataFrame(rows)
    return pa.table(
        {
            "fk": pa.array(df["fk"], pa.string()),
            "n_rows": pa.array(df["n_rows"], pa.int64()),
            "n_orphan_rows": pa.array(df["n_orphan_rows"], pa.int64()),
            "n_orphan_keys": pa.array(df["n_orphan_keys"], pa.int64()),
        }
    )


SQL_REF_INTEGRITY = r"""
SELECT 'lineitem.l_orderkey->orders' AS fk,
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_orphan_rows,
       CAST(COUNT(DISTINCT l.l_orderkey) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_orphan_keys
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem.l_partkey->part',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT l.l_partkey) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE s.s_suppkey IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT l.l_suppkey) FILTER (WHERE s.s_suppkey IS NULL) AS BIGINT)
FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT o.o_custkey) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT c.c_nationkey) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       CAST((SELECT COUNT(*) FROM supplier) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT s.s_nationkey) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
UNION ALL
SELECT 'nation.n_regionkey->region',
       CAST((SELECT COUNT(*) FROM nation) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE r.r_regionkey IS NULL) AS BIGINT),
       CAST(COUNT(DISTINCT n.n_regionkey) FILTER (WHERE r.r_regionkey IS NULL) AS BIGINT)
FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def q_user_count_powerlaw(sf_dir: str):
    """Hill / continuous-MLE tail exponent of the per-user activity
    distribution (is user activity power-law, and how fat?) — the
    per-entity sibling of the vocabulary Zipf slope. Per-user counts
    via one keyed sum; the fold runs over distinct-count cells only."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.numstats import hill_alpha

    ds = _events(sf_dir, columns=["user_id"])

    def partial(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by("user_id").aggregate([([], "count_all")])
        return pa.table({"user_id": g.column("user_id"), "c": g.column("count_all")})

    per_user = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], ["c"], num_buckets=4,
    ).materialize()
    n_keys = int(per_user.count())

    def cells(df: _pd.DataFrame) -> _pd.DataFrame:
        out = df.groupby("c", sort=False).size().rename("m").reset_index()
        return out.rename(columns={"c": "v", "m": "c"})

    comp = per_user.map_batches(cells, batch_format="pandas").to_pandas()
    comp = comp.groupby("v", as_index=False)["c"].sum()
    import ray.data as _rd

    tail = hill_alpha(_rd.from_pandas(comp), "v", xmin=5)
    t = tail.to_pylist()[0]
    return pa.table(
        {
            "n_keys": pa.array([n_keys], pa.int64()),
            "n_tail": pa.array([t["n_tail"]], pa.int64()),
            "lnsum": pa.array([t["lnsum"]], pa.float64()),
            "alpha": pa.array([t["alpha"]], pa.float64()),
        }
    )


SQL_POWERLAW = r"""
WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
cells AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS c FROM pu WHERE x >= 5 GROUP BY 1),
t AS (SELECT CAST((SELECT COUNT(*) FROM pu) AS BIGINT) AS n_keys,
             CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_tail,
             SUM(c * LN(v / 5.0)) AS lnsum FROM cells)
SELECT n_keys, n_tail, ROUND(lnsum, 6) AS lnsum,
       CASE WHEN lnsum > 0 THEN ROUND(1.0 + n_tail / lnsum, 6) END AS alpha
FROM t
"""


def q_embedding_gram(sf_dir: str):
    """Exact integer Gram matrix of the embedding corpus (upper
    triangle, 2080 cells at d=64) — the list-column linear-algebra
    primitive under PCA/whitening: one int64 X^T X matmul per block,
    zero row exchange, tiny keyed merge."""
    from vaero_ray.stages.ann import embedding_gram

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return embedding_gram(ds, "embedding")


SQL_EMBEDDING_GRAM = r"""
WITH u AS (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
           FROM embeddings),
p AS (SELECT a.dim AS i, b.dim AS j,
             CAST(SUM(a.m * b.m) AS BIGINT) AS gram_micro2,
             CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.dim <= b.dim
      GROUP BY 1, 2)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, gram_micro2, n_vecs,
       CAST(gram_micro2 AS DOUBLE) / 1000000000000.0 AS gram
FROM p
"""


# ------------------------------------------------------------------
# Session-13 batch 7: ML evaluation operators — clustering quality
# (centroid silhouette) and retrieval quality (NDCG@10)
# ------------------------------------------------------------------

def q_label_silhouette(sf_dir: str):
    """Simplified silhouette score of the labeled embedding corpus
    (clustering-quality eval): per-vector (b-a)/max(a,b) against exact
    integer centroids, micro-quantized per row so the per-label sums
    are exact int64 — two passes, zero row exchange."""
    from vaero_ray.stages.ann import label_silhouette

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"])
    return label_silhouette(ds, "embedding", "label")


SQL_LABEL_SILHOUETTE = r"""
WITH u AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                  unnest(range(1, len(embedding) + 1)) AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
           FROM embeddings),
cs AS (SELECT label, dim, CAST(SUM(m) AS BIGINT) AS sum_micro,
              CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY 1, 2),
c AS (SELECT label, dim,
             CAST(sum_micro AS DOUBLE) / (n * 1000000.0) AS cc FROM cs),
d AS (SELECT u.vec_id, u.label AS own, c.label AS cl,
             SQRT(SUM((CAST(u.m AS DOUBLE) / 1000000.0 - c.cc)
                      * (CAST(u.m AS DOUBLE) / 1000000.0 - c.cc))) AS dist
      FROM u JOIN c ON u.dim = c.dim GROUP BY 1, 2, 3),
aa AS (SELECT vec_id, own, dist AS a FROM d WHERE cl = own),
bb AS (SELECT vec_id, MIN(dist) AS b FROM d WHERE cl <> own GROUP BY 1),
s AS (SELECT aa.own AS label,
             CASE WHEN GREATEST(aa.a, bb.b) > 0
                  THEN CAST(floor((bb.b - aa.a) / GREATEST(aa.a, bb.b) * 1000000 + 0.5) AS BIGINT)
                  ELSE 0 END AS micro
      FROM aa JOIN bb USING (vec_id))
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(micro) AS BIGINT) AS sum_sil_micro,
       CAST(SUM(micro) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mean_sil
FROM s GROUP BY 1
"""


def q_bm25_ndcg_eval(sf_dir: str):
    """NDCG@10 of the BM25 ranking against graded term-coverage
    relevance (rel = # distinct query terms present, 0-3) — the
    retrieval-quality eval beside the rankers themselves: DCG over the
    engine's own top-10, ideal DCG from the global relevance
    spectrum (a 4-cell aggregate), one number a regression can watch."""
    import pyarrow.parquet as _pq

    from vaero_ray.stages.dedup import _flat_tokens
    from vaero_ray.stages.textstats import bm25_ndcg

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tok_count(tbl: pa.Table) -> pa.Table:
        toks, _ = _flat_tokens(tbl, "text")
        return pa.table({"ntok": pa.array([len(toks)], pa.int64())})

    ntok = int(
        ds.map_batches(tok_count, batch_format="pyarrow", zero_copy_batch=True).sum("ntok")
    )
    return bm25_ndcg(
        ds, terms=["hash", "join", "stream"], n_docs=int(n_docs),
        n_tokens_total=ntok, k=10,
    )


SQL_BM25_NDCG = r"""
WITH t AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(toks)) AS BIGINT) AS ntok FROM t),
u AS (SELECT doc_id, UNNEST(toks) AS tok FROM t),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       FROM u WHERE tok IN ('hash', 'join', 'stream') GROUP BY 1, 2),
dfc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
p AS (SELECT tf.doc_id,
             CAST(COALESCE(SUM(tf) FILTER (tok = 'hash'), 0) AS BIGINT) AS tf_a,
             CAST(COALESCE(SUM(tf) FILTER (tok = 'join'), 0) AS BIGINT) AS tf_b,
             CAST(COALESCE(SUM(tf) FILTER (tok = 'stream'), 0) AS BIGINT) AS tf_c
      FROM tf GROUP BY 1),
idf AS (SELECT
  LN((n.n - COALESCE((SELECT df FROM dfc WHERE tok = 'hash'), 0) + 0.5)
     / (COALESCE((SELECT df FROM dfc WHERE tok = 'hash'), 0) + 0.5) + 1.0) AS ia,
  LN((n.n - COALESCE((SELECT df FROM dfc WHERE tok = 'join'), 0) + 0.5)
     / (COALESCE((SELECT df FROM dfc WHERE tok = 'join'), 0) + 0.5) + 1.0) AS ib,
  LN((n.n - COALESCE((SELECT df FROM dfc WHERE tok = 'stream'), 0) + 0.5)
     / (COALESCE((SELECT df FROM dfc WHERE tok = 'stream'), 0) + 0.5) + 1.0) AS ic
  FROM n),
s AS (SELECT p.doc_id,
             CAST((CASE WHEN p.tf_a > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN p.tf_b > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN p.tf_c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rel,
             idf.ia * ((22.0 * p.tf_a) * n.ntok
                       / (10 * p.tf_a * n.ntok + 3 * n.ntok + 9 * dl.dl * n.n))
           + idf.ib * ((22.0 * p.tf_b) * n.ntok
                       / (10 * p.tf_b * n.ntok + 3 * n.ntok + 9 * dl.dl * n.n))
           + idf.ic * ((22.0 * p.tf_c) * n.ntok
                       / (10 * p.tf_c * n.ntok + 3 * n.ntok + 9 * dl.dl * n.n)) AS score
      FROM p JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN idf),
r AS (SELECT doc_id, rel,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM s),
ideal AS (SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rnk FROM s),
dcg AS (SELECT SUM((POW(2.0, rel) - 1.0) / LOG2(rnk + 1.0)) AS v
        FROM r WHERE rnk <= 10),
idcg AS (SELECT SUM((POW(2.0, rel) - 1.0) / LOG2(rnk + 1.0)) AS v
         FROM ideal WHERE rnk <= 10)
SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_candidates,
       ROUND(dcg.v, 6) AS dcg, ROUND(idcg.v, 6) AS idcg,
       CASE WHEN idcg.v > 0 THEN ROUND(dcg.v / idcg.v, 6) END AS ndcg
FROM dcg, idcg
"""


# ------------------------------------------------------------------
# Session-13 batch 8: perplexity-proxy quality filter + lang-ID
# confusion matrix (classifier eval against the label column)
# ------------------------------------------------------------------

def q_doc_unigram_xent(sf_dir: str):
    """Per-document cross-entropy under the corpus unigram LM — the
    CCNet-style perplexity filter: per-term log-probs quantized ONCE to
    nano-units so every document's sum is exact int64 (token/shard
    order drop out); vocabulary pass moves vocabulary, never tokens;
    scoring is in-block with the broadcast top-V table."""
    from vaero_ray.stages.textstats import unigram_xent

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return unigram_xent(ds, top_v=1000)


SQL_UNIGRAM_XENT = r"""
WITH t AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
u AS (SELECT doc_id, UNNEST(toks) AS term FROM t),
cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM cnt),
topv AS (SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT 1000),
iv AS (SELECT CAST(SUM(c) AS BIGINT) AS in_total FROM topv),
lp AS (SELECT term,
              CAST(floor(LN((c + 1) / (tot.n_total + 1001.0)) * 1000000000 + 0.5) AS BIGINT) AS nano
       FROM topv, tot),
oov AS (SELECT CAST(floor(LN((tot.n_total - iv.in_total + 1) / (tot.n_total + 1001.0))
                          * 1000000000 + 0.5) AS BIGINT) AS nano
        FROM tot, iv),
sc AS (SELECT u.doc_id, CAST(SUM(COALESCE(lp.nano, oov.nano)) AS BIGINT) AS s,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM u LEFT JOIN lp USING (term) CROSS JOIN oov GROUP BY 1)
SELECT d.doc_id, COALESCE(sc.n, 0) AS n_toks, COALESCE(sc.s, 0) AS sum_lp_nano,
       CASE WHEN sc.n > 0 THEN -CAST(sc.s AS DOUBLE) / (sc.n * 1000000000.0) END AS xent
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def q_lang_confusion_matrix(sf_dir: str):
    """Confusion matrix of the engine's own language-ID against the
    corpus label column — classifier eval at scale: the lang_id scan
    appends pred_lang in-block, then one bounded (true, pred) cell
    merge. Exact integer cells; accuracy derives from the diagonal."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.textstats import lang_id_batch

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def cells(tbl: pa.Table) -> pa.Table:
        scored = lang_id_batch(tbl)
        g = (
            pa.table(
                {"true_lang": scored.column("lang"),
                 "pred_lang": scored.column("pred_lang")}
            )
            .group_by(["true_lang", "pred_lang"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["true_lang", "pred_lang", "n"])

    return bucketed_keyed_sum(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        ["true_lang", "pred_lang"], ["n"], num_buckets=4,
    )


SQL_LANG_CONFUSION = r"""
WITH toks AS (
  SELECT d.doc_id, t.tok FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-zà-ÿäöüß]+'), x -> x <> '')[1:200] AS toks
    FROM documents) d, UNNEST(d.toks) AS t(tok)
),
sw(lang, word, prio) AS (VALUES
  ('en','the',1),('en','and',1),('en','of',1),('en','to',1),('en','a',1),
  ('en','in',1),('en','is',1),('en','it',1),('en','you',1),('en','that',1),
  ('de','der',2),('de','die',2),('de','das',2),('de','und',2),('de','ist',2),
  ('de','nicht',2),('de','ein',2),('de','ich',2),('de','zu',2),('de','sie',2),
  ('fr','le',3),('fr','la',3),('fr','les',3),('fr','et',3),('fr','est',3),
  ('fr','un',3),('fr','une',3),('fr','je',3),('fr','de',3),('fr','que',3),
  ('es','el',4),('es','la',4),('es','los',4),('es','y',4),('es','es',4),
  ('es','un',4),('es','una',4),('es','yo',4),('es','de',4),('es','que',4)),
hits AS (
  SELECT t.doc_id, s.lang, s.prio, COUNT(*) AS h
  FROM toks t JOIN sw s ON t.tok = s.word GROUP BY 1, 2, 3
),
best AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, prio ASC) AS rn
  FROM hits
),
pred AS (
  SELECT d.doc_id, d.lang AS true_lang, COALESCE(b.lang, 'unknown') AS pred_lang
  FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
"""


def q_user_score_auc(sf_dir: str):
    """Exact ROC AUC of view-count 'score' predicting the balanced
    above-lower-median purchase label — rank-statistic AUC over
    compressed (score,pos,neg) cells: the events stream is scanned once,
    the keyed exchange moves per-user partials, and the finalizer sees
    one row per DISTINCT score whatever the population size. auc_num2
    is the doubled concordant+tie integer numerator (shard-exact)."""
    from vaero_ray.stages.mleval import roc_auc, user_score_label_cells

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return roc_auc(user_score_label_cells(ds))


_SQL_SCORE_CELLS = r"""
u AS (SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS score,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pc
      FROM events GROUP BY 1),
med AS (SELECT pc AS m FROM (
          SELECT pc, ROW_NUMBER() OVER (ORDER BY pc) AS rn,
                 COUNT(*) OVER () AS n FROM u)
        WHERE rn = (n + 1) // 2),
lab AS (SELECT score, CASE WHEN pc > (SELECT m FROM med) THEN 1 ELSE 0 END AS y FROM u),
cells AS (SELECT score, CAST(SUM(y) AS BIGINT) AS pos,
                 CAST(SUM(1 - y) AS BIGINT) AS neg
          FROM lab GROUP BY 1)
"""

SQL_USER_SCORE_AUC = (
    "WITH " + _SQL_SCORE_CELLS + r""",
c2 AS (SELECT pos, neg,
              COALESCE(SUM(neg) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
       FROM cells),
agg AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(neg) AS BIGINT) AS n_neg,
               CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS auc_num2
        FROM c2)
SELECT n_pos, n_neg, auc_num2,
       ROUND(CAST(auc_num2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
FROM agg
""")


def q_score_threshold_pr(sf_dir: str):
    """Full precision/recall/F1 curve (one row per distinct score
    threshold, predict-positive at score >= t) from the SAME compressed
    cell exchange as `user_score_auc` — cumulative tp/fp from the top,
    exact int64 counts, 6-dp mirrored ratios."""
    from vaero_ray.stages.mleval import pr_curve, user_score_label_cells

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return pr_curve(user_score_label_cells(ds))


SQL_SCORE_THRESHOLD_PR = (
    "WITH " + _SQL_SCORE_CELLS + r""",
c2 AS (SELECT score,
              CAST(SUM(pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
              CAST(SUM(neg) OVER (ORDER BY score DESC) AS BIGINT) AS fp
       FROM cells),
tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS p FROM cells)
SELECT score AS threshold, tp, fp, CAST((SELECT p FROM tot) - tp AS BIGINT) AS fn,
       ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS prec,
       ROUND(CAST(tp AS DOUBLE) / (SELECT p FROM tot), 6) AS rec,
       ROUND(2.0 * tp / (2.0 * tp + fp + ((SELECT p FROM tot) - tp)), 6) AS f1
FROM c2
""")


def q_score_bucket_lift(sf_dir: str):
    """Equal-width score-range lift table (k=10): deterministic integer
    bucketing (score - lo) * 10 // (hi - lo + 1) — no NTILE, no global
    sort, no tie ambiguity — per-bucket positive rate and lift vs the
    base rate, riding the same cell exchange as `user_score_auc`."""
    from vaero_ray.stages.mleval import bucket_lift, user_score_label_cells

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return bucket_lift(user_score_label_cells(ds), k=10)


SQL_SCORE_BUCKET_LIFT = (
    "WITH " + _SQL_SCORE_CELLS + r""",
mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM cells),
b AS (SELECT (score - (SELECT lo FROM mm)) * 10
               // ((SELECT hi FROM mm) - (SELECT lo FROM mm) + 1) AS bucket,
             pos, neg
      FROM cells),
tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS p,
               CAST(SUM(pos + neg) AS BIGINT) AS n FROM cells)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(SUM(pos + neg) AS BIGINT) AS n_users,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       ROUND(SUM(pos) * 1.0 / SUM(pos + neg), 6) AS pos_rate,
       ROUND((SUM(pos) * 1.0 / SUM(pos + neg))
             / ((SELECT p FROM tot) * 1.0 / (SELECT n FROM tot)), 6) AS lift
FROM b GROUP BY bucket
""")


def q_purchase_confusion_mcc(sf_dir: str):
    """Confusion matrix + accuracy/F1/MCC of the view-count score at its
    lower-median threshold against the balanced purchase label — the
    single-operating-point companion to `score_threshold_pr`, riding the
    same compressed cell exchange: exact int64 confusion cells, 6-dp
    mirrored ratios, O(distinct scores) finalizer."""
    from vaero_ray.stages.mleval import confusion_mcc, user_score_label_cells

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return confusion_mcc(user_score_label_cells(ds))


SQL_PURCHASE_CONFUSION_MCC = (
    "WITH " + _SQL_SCORE_CELLS + r""",
thr AS (SELECT score AS m FROM (
          SELECT score, SUM(pos + neg) OVER (ORDER BY score) AS cum,
                 (SELECT SUM(pos + neg) FROM cells) AS n
          FROM cells)
        WHERE cum >= (n + 1) // 2 ORDER BY score LIMIT 1),
c AS (SELECT
        CAST(SUM(CASE WHEN score > (SELECT m FROM thr) THEN pos ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN score > (SELECT m FROM thr) THEN neg ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN score <= (SELECT m FROM thr) THEN pos ELSE 0 END) AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN score <= (SELECT m FROM thr) THEN neg ELSE 0 END) AS BIGINT) AS tn
      FROM cells)
SELECT (SELECT m FROM thr) AS threshold, tp, fp, fn, tn,
       ROUND((tp + tn) * 1.0 / (tp + fp + fn + tn), 6) AS acc,
       ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1,
       ROUND((tp * 1.0 * tn - fp * 1.0 * fn)
             / SQRT((tp + fp) * 1.0 * (tp + fn) * (tn + fp) * (tn + fn)), 6) AS mcc
FROM c
""")


def q_winnow_dup_pairs(sf_dir: str):
    """Winnowing-fingerprint near-dup pairs (MOSS local sampling): docs
    sharing >= 10 selected window-min gram hashes, stop-fingerprints
    (df > 16) dropped by contract. Fingerprint selection is bit-exact to
    the SQL reconstruction (poly char hash base 31 mod FP_MOD, w=4
    window mins, full windows only); counts are exact int64."""
    from vaero_ray.stages.dedup import winnow_dup_pairs

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return winnow_dup_pairs(ds, k=8, w=4, min_shared=10, max_df=16)


SQL_WINNOW_DUPS = r"""
WITH d AS (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS norm FROM documents),
g AS (SELECT doc_id, CAST(t.i AS BIGINT) AS i,
        list_reduce([CAST(unicode(substr(norm, CAST(t.i + j AS INT), 1)) AS BIGINT)
                     FOR j IN range(0, 8)],
                    (a, c) -> (a * 31 + c) % 1099511627689) AS h
      FROM d, UNNEST(range(1, length(norm) - 8 + 2)) AS t(i)),
wm AS (SELECT doc_id, i,
              MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
              COUNT(*) OVER (PARTITION BY doc_id) AS s
       FROM g),
fp AS (SELECT DISTINCT doc_id, mh FROM wm WHERE i <= s - 4 + 1),
df AS (SELECT mh, COUNT(*) AS c FROM fp GROUP BY 1),
pairs AS (SELECT a.doc_id AS doc_id, b.doc_id AS dup_of,
                 CAST(COUNT(*) AS BIGINT) AS shared_fps
          FROM fp a JOIN fp b ON a.mh = b.mh AND a.doc_id > b.doc_id
          WHERE a.mh IN (SELECT mh FROM df WHERE c <= 16)
          GROUP BY 1, 2)
SELECT doc_id, dup_of, shared_fps FROM pairs WHERE shared_fps >= 10
"""


def q_score_ks_separation(sf_dir: str):
    """KS separation of the view-count score between purchase-label
    positives and negatives (classic scoring-power statistic): exact
    integer d_scaled over the same compressed cell exchange as
    `user_score_auc`, one mirrored float division at the end."""
    from vaero_ray.stages.mleval import ks_separation, user_score_label_cells

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return ks_separation(user_score_label_cells(ds))


SQL_SCORE_KS_SEPARATION = (
    "WITH " + _SQL_SCORE_CELLS + r"""
, w AS (SELECT score, SUM(pos) OVER (ORDER BY score) AS cump,
               SUM(neg) OVER (ORDER BY score) AS cumn FROM cells),
t AS (SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(neg) AS BIGINT) AS n FROM cells)
SELECT t.p AS n_pos, t.n AS n_neg,
       CAST(MAX(ABS(t.n * w.cump - t.p * w.cumn)) AS BIGINT) AS d_scaled,
       ROUND(CAST(MAX(ABS(t.n * w.cump - t.p * w.cumn)) AS DOUBLE) / (1.0 * t.p * t.n), 6) AS d_stat
FROM w, t GROUP BY t.p, t.n
""")


def q_blocklist_hits(sf_dir: str):
    """Blocklist tagger over the corpus: per-doc total occurrences of a
    4-term dictionary, distinct terms hit, flag at >= 5 total hits —
    stateless zero-copy scan, one count_substring kernel per term."""
    from vaero_ray.stages.textstats import blocklist_scan

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return blocklist_scan(ds, ["spark", "vector", "stream", "shuffle"], min_hits=5)


SQL_BLOCKLIST_HITS = r"""
WITH h AS (SELECT doc_id,
  CAST(len(regexp_extract_all(lower(text), 'spark')) AS BIGINT) AS t1,
  CAST(len(regexp_extract_all(lower(text), 'vector')) AS BIGINT) AS t2,
  CAST(len(regexp_extract_all(lower(text), 'stream')) AS BIGINT) AS t3,
  CAST(len(regexp_extract_all(lower(text), 'shuffle')) AS BIGINT) AS t4
  FROM documents)
SELECT doc_id, t1 + t2 + t3 + t4 AS total_hits,
       CAST((CASE WHEN t1 > 0 THEN 1 ELSE 0 END) + (CASE WHEN t2 > 0 THEN 1 ELSE 0 END)
          + (CASE WHEN t3 > 0 THEN 1 ELSE 0 END) + (CASE WHEN t4 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
       CAST(CASE WHEN t1 + t2 + t3 + t4 >= 5 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM h
"""


def q_embedding_jl_projection(sf_dir: str):
    """Rademacher JL projection 64 -> 8 dims of the embedding corpus —
    integer matmul over micro-int components with a deterministic sign
    matrix, exact int64 projected coordinates, zero shuffles."""
    from vaero_ray.stages.ann import jl_project

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return jl_project(ds, out_dim=8)


SQL_EMBEDDING_JL = r"""
WITH e AS (SELECT vec_id, CAST(t.i AS BIGINT) AS i,
             CAST(floor(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
           FROM embeddings, UNNEST(range(1, 65)) AS t(i))
SELECT vec_id, CAST(j.jd AS BIGINT) AS out_dim,
       CAST(SUM(CASE WHEN (i * 1103515245 + j.jd * 12345) % 97 < 48 THEN m ELSE -m END) AS BIGINT) AS proj_micro
FROM e, UNNEST(range(0, 8)) AS j(jd)
GROUP BY 1, 2
"""


def q_embedding_int8_codes(sf_dir: str):
    """Per-dimension int8 quantization of the embedding corpus: tiny
    min/max exchange (d rows per block), broadcast bounds, pure-integer
    code mapping (m - min) * 255 // (max - min) — exact on any engine."""
    from vaero_ray.stages.ann import int8_quantize

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return int8_quantize(ds)


SQL_EMBEDDING_INT8 = r"""
WITH e AS (SELECT vec_id, CAST(t.i AS BIGINT) AS dim,
             CAST(floor(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
           FROM embeddings, UNNEST(range(1, 65)) AS t(i)),
mm AS (SELECT dim, MIN(m) AS mn, MAX(m) AS mx FROM e GROUP BY 1)
SELECT e.vec_id, e.dim,
       CAST(CASE WHEN mm.mx = mm.mn THEN 0
            ELSE (e.m - mm.mn) * 255 // (mm.mx - mm.mn) END AS BIGINT) AS code
FROM e JOIN mm USING (dim)
"""


def q_sorted_neighborhood_pairs(sf_dir: str):
    """Sorted-neighborhood (SNM) blocking candidate pairs: total-order
    sort on a 16-char normalized key, window-8 neighborhood, pairs with
    key LCP >= 8 — the sort-based dedup family beside hash/LSH/winnow.
    Pair emission is halo-bucketed local work after ONE sort."""
    from vaero_ray.stages.dedup import sorted_neighborhood_pairs

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return sorted_neighborhood_pairs(ds, key_len=16, window=8, min_lcp=8)


SQL_SNM_PAIRS = r"""
WITH d AS (SELECT doc_id,
             substr(lower(regexp_replace(text, '\s+', ' ', 'g')) || repeat(' ', 16), 1, 16) AS key
           FROM documents),
r AS (SELECT doc_id, key, ROW_NUMBER() OVER (ORDER BY key, doc_id) - 1 AS rn FROM d),
p AS (SELECT b.doc_id AS doc_id, a.doc_id AS dup_of,
             CAST(b.rn - a.rn AS BIGINT) AS rn_gap,
             CAST(list_max([CASE WHEN substr(a.key, 1, CAST(x AS INT)) = substr(b.key, 1, CAST(x AS INT))
                                 THEN CAST(x AS BIGINT) ELSE 0 END FOR x IN range(1, 17)]) AS BIGINT) AS key_lcp
      FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 8)
SELECT doc_id, dup_of, rn_gap, key_lcp FROM p WHERE key_lcp >= 8
"""


def q_score_isotonic_calibration(sf_dir: str):
    """Isotonic (PAV) calibration of purchase rate vs the view-count
    score: exact-rational pool-adjacent-violators over the same cell
    exchange as `user_score_auc`; the SQL oracle recomputes the fit via
    the minimax identity max_{i<=k} min_{j>=k} avg(i,j) from the same
    integer sums (correctly-rounded IEEE division makes them equal)."""
    from vaero_ray.stages.mleval import isotonic_rates, user_score_label_cells

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return isotonic_rates(user_score_label_cells(ds))


SQL_SCORE_ISOTONIC = (
    "WITH " + _SQL_SCORE_CELLS + r""",
idx AS (SELECT score, pos, pos + neg AS n,
               ROW_NUMBER() OVER (ORDER BY score) AS k FROM cells),
pre AS (SELECT k, SUM(pos) OVER (ORDER BY k) AS cp,
               SUM(n) OVER (ORDER BY k) AS cn FROM idx),
a AS (SELECT i.k AS i, j.k AS j,
             (j.cp - COALESCE(ip.cp, 0)) * 1.0 / (j.cn - COALESCE(ip.cn, 0)) AS avg
      FROM pre j JOIN pre i ON i.k <= j.k
      LEFT JOIN pre ip ON ip.k = i.k - 1),
m1 AS (SELECT a.i, x.k, MIN(a.avg) AS mn
       FROM a JOIN idx x ON a.i <= x.k AND a.j >= x.k GROUP BY 1, 2),
fit AS (SELECT k, MAX(mn) AS iso FROM m1 GROUP BY 1)
SELECT idx.score, idx.n, idx.pos, ROUND(fit.iso, 6) AS iso_rate
FROM idx JOIN fit USING (k)
""")


def q_streaming_window_auc(sf_dir: str):
    """STREAMING per-window model-quality monitor: exact ROC AUC of the
    view-count score vs the above-window-median purchase label, PER
    tumbling hour window, through the exactly-once machinery. The
    streaming part is the standard checkpointed tumbling job keyed by
    user (count partials are mergeable across epochs — no new
    machinery); the AUC derives DOWNSTREAM of the committed
    per-(window, user) sums via one window-bucketed exchange whose
    per-window kernel is the same cell compression as
    `user_score_auc` (windows are tiny after the per-user collapse, so
    the per-window loop runs over score cells, not events)."""
    import os
    import shutil

    from vaero_ray.stages.keyed import bucketed_map_groups
    from vaero_ray.streaming import StreamingWindowedJob

    ind = _stream_chunks(sf_dir, "auc_in", ["user_id", "event_type", "ts"])
    base = os.path.dirname(ind)
    out_d, ckpt_d = f"{base}/auc_out", f"{base}/auc_ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)

    def pre(ds: rd.Dataset) -> rd.Dataset:
        def per_batch(tbl: pa.Table) -> pa.Table:
            et = tbl.column("event_type")
            return pa.table(
                {
                    "user_id": tbl.column("user_id"),
                    "ts": tbl.column("ts"),
                    "vc": pc.cast(pc.equal(et, "view"), pa.int64()),
                    "pcv": pc.cast(pc.equal(et, "purchase"), pa.int64()),
                }
            )

        return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)

    job = StreamingWindowedJob(
        input_dir=ind,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        keys=["user_id"],
        aggs=[AggSpec("vc", "sum", "vc"), AggSpec("pcv", "sum", "pcv")],
        ts_col="ts",
        size_s=3600,
        allowed_lateness_s=0,
        num_partitions=4,
        # (window, user) keys are high-cardinality: the bucketed merge
        # backend exists for exactly this shape (native Ray aggregate
        # costs seconds per column over many tiny partial blocks)
        merge_backend="bucketed",
        transform=pre,
    )
    job.run()
    committed = job.committed_output()

    import pandas as _pdmod

    def derive(df: _pdmod.DataFrame) -> _pdmod.DataFrame:
        rows = []
        for w, g in df.groupby("window_start", sort=False):
            pcs = np.sort(g["pcv"].to_numpy(np.int64))
            med = int(pcs[(len(pcs) + 1) // 2 - 1])
            y = (g["pcv"].to_numpy(np.int64) > med).astype(np.int64)
            cells = (
                _pdmod.DataFrame({"score": g["vc"].to_numpy(np.int64),
                                  "pos": y, "neg": 1 - y})
                .groupby("score", as_index=False).sum().sort_values("score")
            )
            pos = cells["pos"].to_numpy(np.int64)
            neg = cells["neg"].to_numpy(np.int64)
            p, n = int(pos.sum()), int(neg.sum())
            cumneg = np.concatenate(([0], np.cumsum(neg)[:-1]))
            num2 = int(np.sum(pos * (2 * cumneg + neg)))
            auc = round(num2 / (2.0 * p * n), 6) if p and n else None
            rows.append({"window_start": w, "n_pos": p, "n_neg": n,
                         "auc_num2": num2, "auc": auc})
        out = _pdmod.DataFrame(rows)
        return out.astype({"window_start": "datetime64[us]", "n_pos": "int64",
                           "n_neg": "int64", "auc_num2": "int64",
                           "auc": "float64"})

    return bucketed_map_groups(committed, "window_start", derive, num_buckets=4)


SQL_STREAMING_WINDOW_AUC = r"""
WITH u AS (SELECT date_trunc('hour', ts) AS window_start, user_id,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS score,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pc
           FROM events GROUP BY 1, 2),
med AS (SELECT window_start, pc AS m FROM (
          SELECT window_start, pc,
                 ROW_NUMBER() OVER (PARTITION BY window_start ORDER BY pc) AS rn,
                 COUNT(*) OVER (PARTITION BY window_start) AS n FROM u)
        WHERE rn = (n + 1) // 2),
lab AS (SELECT u.window_start, u.score,
               CASE WHEN u.pc > med.m THEN 1 ELSE 0 END AS y
        FROM u JOIN med USING (window_start)),
cells AS (SELECT window_start, score, CAST(SUM(y) AS BIGINT) AS pos,
                 CAST(SUM(1 - y) AS BIGINT) AS neg
          FROM lab GROUP BY 1, 2),
c2 AS (SELECT window_start, pos, neg,
              COALESCE(SUM(neg) OVER (PARTITION BY window_start ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
       FROM cells),
agg AS (SELECT window_start, CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(neg) AS BIGINT) AS n_neg,
               CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS auc_num2
        FROM c2 GROUP BY 1)
SELECT window_start, n_pos, n_neg, auc_num2,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN ROUND(CAST(auc_num2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) END AS auc
FROM agg
"""


def q_copurchase_butterflies(sf_dir: str):
    """Butterfly census of the order x part bipartite graph: 4-cycles,
    3-paths, both wedge counts, bipartite clustering coefficient 4B/C.
    Caterpillars via the one-exchange identity sum_i (c_i-1)*s_i (no
    edge x degree join); butterflies ride the in-basket pair emission."""
    from vaero_ray.stages.basket import bipartite_butterflies

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    return bipartite_butterflies(ds, "l_orderkey", "l_partkey")


SQL_COPURCHASE_BUTTERFLIES = r"""
WITH e AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
dg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1),
di AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1),
pp AS (SELECT a.i AS i1, b.i AS i2, CAST(COUNT(*) AS BIGINT) AS n
       FROM e a JOIN e b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) FROM dg) AS wedges_group,
       (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) FROM di) AS wedges_item,
       (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) FROM pp) AS n_butterflies,
       (SELECT CAST(SUM((dg.c - 1) * (di.c - 1)) AS BIGINT)
        FROM e JOIN dg ON e.g = dg.g JOIN di ON e.i = di.i) AS n_caterpillars,
       CASE WHEN (SELECT SUM((dg.c - 1) * (di.c - 1))
                  FROM e JOIN dg ON e.g = dg.g JOIN di ON e.i = di.i) > 0
            THEN ROUND(4.0 * (SELECT COALESCE(SUM(n * (n - 1) // 2), 0) FROM pp)
                       / (SELECT SUM((dg.c - 1) * (di.c - 1))
                          FROM e JOIN dg ON e.g = dg.g JOIN di ON e.i = di.i), 6)
       END AS bcc
"""


def q_user_score_auc_delong(sf_dir: str):
    """DeLong variance + 95% CI for the view-count AUC: exact integer
    component sums U10/U01 over the same cell exchange (HUGEINT-mirror
    recipe), one shared float expression for se/ci."""
    from vaero_ray.stages.mleval import delong_auc_ci, user_score_label_cells

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return delong_auc_ci(user_score_label_cells(ds))


SQL_USER_SCORE_AUC_DELONG = (
    "WITH " + _SQL_SCORE_CELLS + r""",
c2 AS (SELECT score, pos, neg,
              COALESCE(SUM(neg) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg,
              COALESCE(SUM(pos) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumpos
       FROM cells),
t AS (SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(neg) AS BIGINT) AS n,
             CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS num2 FROM c2),
comp AS (SELECT
        CAST(SUM(CAST(pos AS HUGEINT)
                 * CAST(((2 * cumneg + neg) * t.p - t.num2) AS HUGEINT)
                 * CAST(((2 * cumneg + neg) * t.p - t.num2) AS HUGEINT)) AS BIGINT) AS u10,
        CAST(SUM(CAST(neg AS HUGEINT)
                 * CAST(((2 * t.p - 2 * cumpos - pos) * t.n - t.num2) AS HUGEINT)
                 * CAST(((2 * t.p - 2 * cumpos - pos) * t.n - t.num2) AS HUGEINT)) AS BIGINT) AS u01
      FROM c2, t GROUP BY t.p, t.n, t.num2)
SELECT t.p AS n_pos, t.n AS n_neg, t.num2 AS auc_num2, comp.u10, comp.u01,
       ROUND(CAST(t.num2 AS DOUBLE) / (2.0 * t.p * t.n), 6) AS auc,
       CASE WHEN t.p > 1 AND t.n > 1 THEN
         ROUND(SQRT( (CAST(comp.u10 AS DOUBLE) / ((t.p - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.p
                   + (CAST(comp.u01 AS DOUBLE) / ((t.n - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.n ), 6)
       END AS auc_se,
       CASE WHEN t.p > 1 AND t.n > 1 THEN
         ROUND(CAST(t.num2 AS DOUBLE) / (2.0 * t.p * t.n)
               - 1.96 * SQRT( (CAST(comp.u10 AS DOUBLE) / ((t.p - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.p
                            + (CAST(comp.u01 AS DOUBLE) / ((t.n - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.n ), 6)
       END AS ci_lo,
       CASE WHEN t.p > 1 AND t.n > 1 THEN
         ROUND(CAST(t.num2 AS DOUBLE) / (2.0 * t.p * t.n)
               + 1.96 * SQRT( (CAST(comp.u10 AS DOUBLE) / ((t.p - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.p
                            + (CAST(comp.u01 AS DOUBLE) / ((t.n - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.n ), 6)
       END AS ci_hi
FROM t, comp
""")


def q_auc_pair_delong(sf_dir: str):
    """Paired DeLong model comparison: does view count or click count
    better predict the purchase label on the SAME users? Correlated-AUC
    z test with exact integer component/cross sums over ONE joint-cell
    exchange (the model-A/B primitive at scale)."""
    from vaero_ray.stages.mleval import delong_paired, user_two_score_cells

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return delong_paired(user_two_score_cells(ds))


SQL_AUC_PAIR_DELONG = r"""
WITH u2 AS (SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS s2,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pc
      FROM events GROUP BY 1),
med2 AS (SELECT pc AS m FROM (
          SELECT pc, ROW_NUMBER() OVER (ORDER BY pc) AS rn,
                 COUNT(*) OVER () AS n FROM u2)
        WHERE rn = (n + 1) // 2),
lab2 AS (SELECT s1, s2, CASE WHEN pc > (SELECT m FROM med2) THEN 1 ELSE 0 END AS y FROM u2),
jc AS (SELECT s1, s2, CAST(SUM(y) AS BIGINT) AS pos,
              CAST(SUM(1 - y) AS BIGINT) AS neg FROM lab2 GROUP BY 1, 2),
tp AS (SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(neg) AS BIGINT) AS n FROM jc),
m1 AS (SELECT s1, CAST(SUM(pos) AS BIGINT) AS p1, CAST(SUM(neg) AS BIGINT) AS n1
       FROM jc GROUP BY 1),
m1c AS (SELECT s1,
          2 * COALESCE(SUM(n1) OVER (ORDER BY s1
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n1 AS a1,
          2 * ((SELECT p FROM tp) - COALESCE(SUM(p1) OVER (ORDER BY s1
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) - p1) + p1 AS b1
        FROM m1),
m2 AS (SELECT s2, CAST(SUM(pos) AS BIGINT) AS p2, CAST(SUM(neg) AS BIGINT) AS n2
       FROM jc GROUP BY 1),
m2c AS (SELECT s2,
          2 * COALESCE(SUM(n2) OVER (ORDER BY s2
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n2 AS a2,
          2 * ((SELECT p FROM tp) - COALESCE(SUM(p2) OVER (ORDER BY s2
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) - p2) + p2 AS b2
        FROM m2),
jx AS (SELECT jc.pos, jc.neg, m1c.a1, m1c.b1, m2c.a2, m2c.b2
       FROM jc JOIN m1c USING (s1) JOIN m2c USING (s2)),
t AS (SELECT (SELECT p FROM tp) AS p, (SELECT n FROM tp) AS n,
        CAST(SUM(pos * a1) AS BIGINT) AS num2_1,
        CAST(SUM(pos * a2) AS BIGINT) AS num2_2 FROM jx),
comp AS (SELECT
   CAST(SUM(CAST(pos AS HUGEINT) * CAST(a1 * t.p - t.num2_1 AS HUGEINT)
            * CAST(a1 * t.p - t.num2_1 AS HUGEINT)) AS BIGINT) AS u10_1,
   CAST(SUM(CAST(pos AS HUGEINT) * CAST(a2 * t.p - t.num2_2 AS HUGEINT)
            * CAST(a2 * t.p - t.num2_2 AS HUGEINT)) AS BIGINT) AS u10_2,
   CAST(SUM(CAST(neg AS HUGEINT) * CAST(b1 * t.n - t.num2_1 AS HUGEINT)
            * CAST(b1 * t.n - t.num2_1 AS HUGEINT)) AS BIGINT) AS u01_1,
   CAST(SUM(CAST(neg AS HUGEINT) * CAST(b2 * t.n - t.num2_2 AS HUGEINT)
            * CAST(b2 * t.n - t.num2_2 AS HUGEINT)) AS BIGINT) AS u01_2,
   CAST(SUM(CAST(pos AS HUGEINT) * CAST(a1 * t.p - t.num2_1 AS HUGEINT)
            * CAST(a2 * t.p - t.num2_2 AS HUGEINT)) AS BIGINT) AS c10,
   CAST(SUM(CAST(neg AS HUGEINT) * CAST(b1 * t.n - t.num2_1 AS HUGEINT)
            * CAST(b2 * t.n - t.num2_2 AS HUGEINT)) AS BIGINT) AS c01
   FROM jx, t GROUP BY t.p, t.n, t.num2_1, t.num2_2),
f AS (SELECT t.p, t.n, t.num2_1, t.num2_2, comp.c10, comp.c01,
   (CAST(comp.u10_1 AS DOUBLE) / ((t.p - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.p
     + (CAST(comp.u01_1 AS DOUBLE) / ((t.n - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.n AS var1,
   (CAST(comp.u10_2 AS DOUBLE) / ((t.p - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.p
     + (CAST(comp.u01_2 AS DOUBLE) / ((t.n - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.n AS var2,
   (CAST(comp.c10 AS DOUBLE) / ((t.p - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.p
     + (CAST(comp.c01 AS DOUBLE) / ((t.n - 1) * ((2.0 * t.n * t.p) * (2.0 * t.n * t.p)))) / t.n AS cov
   FROM t, comp)
SELECT p AS n_pos, n AS n_neg, num2_1 AS auc1_num2, num2_2 AS auc2_num2, c10, c01,
   ROUND(CAST(num2_1 AS DOUBLE) / (2.0 * p * n), 6) AS auc1,
   ROUND(CAST(num2_2 AS DOUBLE) / (2.0 * p * n), 6) AS auc2,
   CASE WHEN p > 1 AND n > 1 AND var1 + var2 - 2 * cov > 0 THEN
     ROUND((CAST(num2_1 AS DOUBLE) / (2.0 * p * n) - CAST(num2_2 AS DOUBLE) / (2.0 * p * n))
           / SQRT(var1 + var2 - 2 * cov), 6)
   END AS z
FROM f
"""


def q_source_lang_auc_slices(sf_dir: str):
    """Slice metrics: per-SOURCE exact AUC of document length predicting
    lang == 'en' — one keyed (source, length) cell exchange, segmented
    vectorized finalizer, NULL auc on single-class slices."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.mleval import grouped_roc_auc

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        en = pc.equal(t.column("lang"), "en").to_numpy(zero_copy_only=False)
        df = _pd.DataFrame(
            {
                "source": t.column("source").to_pandas(),
                "score": t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64),
                "pos": en.astype(np.int64),
                "neg": (~en).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["source", "score"], sort=False, as_index=False).sum(),
            preserve_index=False,
        )

    cells = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "score"], ["pos", "neg"], num_buckets=4,
    ).to_pandas()
    return grouped_roc_auc(cells, group_col="source")


SQL_SOURCE_LANG_AUC = r"""
WITH c AS (SELECT source, CAST(n_chars AS BIGINT) AS score,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS neg
           FROM documents GROUP BY 1, 2),
c2 AS (SELECT source, pos, neg,
         COALESCE(SUM(neg) OVER (PARTITION BY source ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
       FROM c),
a AS (SELECT source, CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(SUM(neg) AS BIGINT) AS n_neg,
        CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS auc_num2
      FROM c2 GROUP BY 1)
SELECT source, n_pos, n_neg, auc_num2,
   CASE WHEN n_pos > 0 AND n_neg > 0
        THEN ROUND(CAST(auc_num2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) END AS auc
FROM a
"""


def q_hourly_mase_backtest(sf_dir: str):
    """Forecast-eval backtest per event type: seasonal-naive (lag-24h)
    forecast scored by MASE over the second half of the hour range —
    integer-exact SAE sums over the DENSE hourly grid (missing hours
    count 0), one bounded (type, hour) cell exchange, single mirrored
    ratio-of-ratios float."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _events(sf_dir, columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        h = pc.divide(us, 3_600_000_000)
        g = (
            pa.table({"event_type": t.column("event_type"), "h": h})
            .group_by(["event_type", "h"]).aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "h", "c"])

    cells = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "h"], ["c"], num_buckets=4,
    ).to_pandas()
    lo, hi = int(cells["h"].min()), int(cells["h"].max())
    span = hi - lo + 1
    split = lo + span // 2
    rows = []
    for et, g in cells.groupby("event_type", sort=True):
        y = np.zeros(span, dtype=np.int64)
        y[g["h"].to_numpy(np.int64) - lo] = g["c"].to_numpy(np.int64)
        if span <= 24:
            rows.append({"event_type": et, "n_train": 0, "sae_train": 0,
                         "n_test": 0, "sae_test": 0, "mase": None})
            continue
        ad = np.abs(y[24:] - y[:-24])  # |y_t - y_{t-24}| for t = lo+24..hi
        hs = np.arange(lo + 24, hi + 1)
        tr = hs < split
        te = ~tr
        sae_tr, n_tr = int(ad[tr].sum()), int(tr.sum())
        sae_te, n_te = int(ad[te].sum()), int(te.sum())
        mase = (
            round((sae_te * 1.0 / n_te) / (sae_tr * 1.0 / n_tr), 6)
            if sae_tr > 0 and n_te > 0 and n_tr > 0 else None
        )
        rows.append({"event_type": et, "n_train": n_tr, "sae_train": sae_tr,
                     "n_test": n_te, "sae_test": sae_te, "mase": mase})
    out = _pd.DataFrame(rows).astype(
        {"n_train": "int64", "sae_train": "int64", "n_test": "int64",
         "sae_test": "int64", "mase": "float64"}
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_HOURLY_MASE = r"""
WITH b AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
lim AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM b),
grid AS (SELECT t.event_type, g.h
         FROM (SELECT DISTINCT event_type FROM b) t,
              (SELECT UNNEST(range((SELECT lo FROM lim), (SELECT hi FROM lim) + 1)) AS h) g),
y AS (SELECT grid.event_type, grid.h, COALESCE(b.c, 0) AS c
      FROM grid LEFT JOIN b ON b.event_type = grid.event_type AND b.h = grid.h),
d AS (SELECT a.event_type, a.h, ABS(a.c - p.c) AS ad
      FROM y a JOIN y p ON p.event_type = a.event_type AND p.h = a.h - 24),
sp AS (SELECT (SELECT lo FROM lim)
              + ((SELECT hi FROM lim) - (SELECT lo FROM lim) + 1) // 2 AS s),
agg AS (SELECT event_type,
         CAST(SUM(CASE WHEN h < (SELECT s FROM sp) THEN ad ELSE 0 END) AS BIGINT) AS sae_train,
         CAST(SUM(CASE WHEN h < (SELECT s FROM sp) THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         CAST(SUM(CASE WHEN h >= (SELECT s FROM sp) THEN ad ELSE 0 END) AS BIGINT) AS sae_test,
         CAST(SUM(CASE WHEN h >= (SELECT s FROM sp) THEN 1 ELSE 0 END) AS BIGINT) AS n_test
       FROM d GROUP BY 1)
SELECT event_type, n_train, sae_train, n_test, sae_test,
  CASE WHEN sae_train > 0 AND n_test > 0 AND n_train > 0 THEN
    ROUND((sae_test * 1.0 / n_test) / (sae_train * 1.0 / n_train), 6) END AS mase
FROM agg
"""


def q_cuped_ab_arms(sf_dir: str):
    """CUPED variance-reduced A/B arm summary (arms = user-id parity,
    pre-period covariate = first-half activity, outcome = second-half
    purchases): exact integer moment sums per arm, pooled theta, one
    shared float tree for adjusted mean/variance."""
    from vaero_ray.stages.mleval import cuped_ab_arms

    ds = _events(sf_dir, columns=["user_id", "event_type", "ts"])
    return cuped_ab_arms(ds)


SQL_CUPED_AB = r"""
WITH sp AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts)) + 1) // 2 AS s FROM events),
u AS (SELECT user_id, user_id % 2 AS arm,
        CAST(SUM(CASE WHEN epoch_us(ts) < (SELECT s FROM sp) THEN 1 ELSE 0 END) AS BIGINT) AS x,
        CAST(SUM(CASE WHEN epoch_us(ts) >= (SELECT s FROM sp)
                       AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
m AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
        CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
      FROM u GROUP BY 1),
p AS (SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
        CAST(SUM(sy) AS BIGINT) AS sy, CAST(SUM(sxy) AS BIGINT) AS sxy,
        CAST(SUM(sxx) AS BIGINT) AS sxx FROM m),
th AS (SELECT CASE WHEN p.n * p.sxx - p.sx * p.sx > 0 THEN
          CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE) * 1.0 / (p.n * p.sxx - p.sx * p.sx)
          ELSE 0.0 END AS theta,
          CAST(p.sx AS DOUBLE) * 1.0 / p.n AS xbar FROM p)
SELECT arm, n, sx, sy,
  ROUND(sy * 1.0 / n - th.theta * (sx * 1.0 / n - th.xbar), 6) AS adj_mean,
  ROUND(syy * 1.0 / n - (sy * 1.0 / n) * (sy * 1.0 / n), 6) AS raw_var,
  ROUND((syy * 1.0 / n - (sy * 1.0 / n) * (sy * 1.0 / n))
        - 2 * th.theta * (sxy * 1.0 / n - (sx * 1.0 / n) * (sy * 1.0 / n))
        + th.theta * th.theta * (sxx * 1.0 / n - (sx * 1.0 / n) * (sx * 1.0 / n)), 6) AS adj_var,
  ROUND(th.theta, 6) AS theta
FROM m, th
"""


def q_k_anonymity_audit(sf_dir: str):
    """Privacy QA: k-anonymity audit of the (source, lang, length-band)
    quasi-identifier over the corpus — group sizes via one bounded cell
    exchange, single summary row of exact counts + one mirrored ratio
    (share of rows in under-k groups)."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    K = 5
    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        band = pc.divide(pc.cast(t.column("n_chars"), pa.int64()), 100)
        g = (
            pa.table({"source": t.column("source"), "lang": t.column("lang"),
                      "band": band})
            .group_by(["source", "lang", "band"]).aggregate([([], "count_all")])
        )
        return g.rename_columns(["source", "lang", "band", "c"])

    cells = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "lang", "band"], ["c"], num_buckets=4,
    ).to_pandas()
    c = cells["c"].to_numpy(np.int64)
    n_rows = int(c.sum())
    viol = c < K
    return pa.table(
        {
            "k": pa.array([K], pa.int64()),
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_groups": pa.array([len(c)], pa.int64()),
            "n_violating": pa.array([int(viol.sum())], pa.int64()),
            "rows_at_risk": pa.array([int(c[viol].sum())], pa.int64()),
            "min_group_size": pa.array([int(c.min()) if len(c) else 0], pa.int64()),
            "risk_share": pa.array(
                [round(int(c[viol].sum()) * 1.0 / n_rows, 6) if n_rows else None],
                pa.float64()),
        }
    )


SQL_K_ANONYMITY = r"""
WITH g AS (SELECT source, lang, n_chars // 100 AS band,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2, 3)
SELECT CAST(5 AS BIGINT) AS k,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(SUM(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT) AS rows_at_risk,
       CAST(MIN(c) AS BIGINT) AS min_group_size,
       ROUND(SUM(CASE WHEN c < 5 THEN c ELSE 0 END) * 1.0 / SUM(c), 6) AS risk_share
FROM g
"""


def q_lsh_recall_eval(sf_dir: str):
    """Eval-of-the-engine: recall of the hyperplane-LSH near-dup pass
    against the exact cosine pair set at the same threshold — exact
    integer pair counts from the two existing verified stages, one
    mirrored ratio. The standard banding-quality measurement."""
    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_exact = embedding_cosine_dups(ds, threshold=0.45).count()
    ds2 = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_lsh = embedding_lsh_dups(ds2, threshold=0.45, n_planes=2, n_tables=8,
                               planes_mode="axes").count()
    return pa.table(
        {
            "n_exact": pa.array([int(n_exact)], pa.int64()),
            "n_lsh": pa.array([int(n_lsh)], pa.int64()),
            "recall": pa.array(
                [round(int(n_lsh) * 1.0 / int(n_exact), 6) if n_exact else None],
                pa.float64()),
        }
    )


SQL_LSH_RECALL = f"""
WITH ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings a
            JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.45),
ls AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings a
       JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) >= 0.45
         AND ({" OR ".join(_axes_band_sql(t) for t in range(8))}))
SELECT ex.n AS n_exact, ls.n AS n_lsh,
       CASE WHEN ex.n > 0 THEN ROUND(ls.n * 1.0 / ex.n, 6) END AS recall
FROM ex, ls
"""


def q_leakage_safe_split(sf_dir: str):
    """Group-aware train/val split — the leakage-prevention primitive:
    near-dup CLUSTERS (word-3-gram true-Jaccard edges -> connected
    components) are assigned as a UNIT (split key = cluster label;
    singletons use their own id), so no near-duplicate pair ever
    straddles train/val. Keys-only composition of three verified
    shapes: dup edges, cluster labels, deterministic hll_hash split —
    one final doc-keyed exchange resolves label-or-self and hashes
    in-bucket."""
    import pandas as _pd

    from vaero_ray.stages.graph import connected_components
    from vaero_ray.stages.keyed import bucketed_map_groups
    from vaero_ray.stages.sketch import hll_hash

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    edges = ngram_jaccard_dups(ds, shingle_k=3, threshold=0.5, unit="word")
    labels = connected_components(edges, a_col="doc_id", b_col="dup_of")

    def tag_docs(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": tbl.column("doc_id"),
             "cluster": pa.array(np.full(tbl.num_rows, -1, np.int64))}
        )

    def tag_lab(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:  # post-shuffle empty blocks carry no columns
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        return pa.table({"doc_id": tbl.column("doc_id"),
                         "cluster": tbl.column("cluster")})

    keys = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    u = keys.map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True).union(
        labels.map_batches(tag_lab, batch_format="pyarrow", zero_copy_batch=True)
    )

    def resolve(df: _pd.DataFrame) -> _pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)["cluster"].max()
        key = np.where(g["cluster"].to_numpy(np.int64) >= 0,
                       g["cluster"].to_numpy(np.int64),
                       g["doc_id"].to_numpy(np.int64)).astype(np.uint64)
        h = hll_hash(key) % np.uint64(1000)
        return _pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(np.int64),
             "split": np.where(h < 900, "train", "val")}
        )

    return bucketed_map_groups(u, "doc_id", resolve, num_buckets=16)


def _fmt_leakage_sql() -> str:
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    return f"""
WITH RECURSIVE dup_pairs AS ({SQL_MINHASH_WORD}),
dup_edges AS (SELECT doc_id AS src, dup_of AS dst FROM dup_pairs
              UNION SELECT dup_of, doc_id FROM dup_pairs),
dup_nodes AS (SELECT DISTINCT src AS node FROM dup_edges),
reach(node, m) AS (
  SELECT node, node FROM dup_nodes
  UNION
  SELECT r.node, de.dst FROM reach r JOIN dup_edges de ON de.src = r.m
),
lab AS (SELECT node AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster FROM reach GROUP BY 1),
k AS (SELECT d.doc_id, COALESCE(lab.cluster, d.doc_id) AS key
      FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
m AS (SELECT CAST(2305843009213693951 AS HUGEINT) AS M,
             CAST({int(HLL_A)} AS HUGEINT) AS A,  CAST({int(HLL_B)} AS HUGEINT) AS B,
             CAST({int(HLL_A2)} AS HUGEINT) AS A2, CAST({int(HLL_B2)} AS HUGEINT) AS B2),
h1 AS (SELECT doc_id,
         CAST(((A * (CAST(key AS HUGEINT) % M)) % M + B) % M AS BIGINT) AS v1
       FROM k, m)
SELECT doc_id,
  CASE WHEN CAST(((A2 * CAST(xor(v1, v1 >> {HLL_XS}) AS HUGEINT)) % M + B2) % M AS BIGINT)
            % 1000 < 900
       THEN 'train' ELSE 'val' END AS split
FROM h1, m
"""


SQL_LEAKAGE_SPLIT = _fmt_leakage_sql()


def q_dedup_savings_report(sf_dir: str):
    """Operational dedup impact report: how much of the corpus would
    near-dedup remove? Near-dup clusters (same edges/labels as
    `dup_clusters`) joined with per-doc sizes in ONE doc-keyed
    exchange, per-cluster sums in a second tiny exchange, single
    summary row: docs/dup docs/clusters, chars total/removed (keep =
    cluster-min member), removal share."""
    import pandas as _pd

    from vaero_ray.stages.graph import connected_components
    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    edges = ngram_jaccard_dups(ds, shingle_k=3, threshold=0.5, unit="word")
    labels = connected_components(edges, a_col="doc_id", b_col="dup_of")

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def tag_docs(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": tbl.column("doc_id"),
             "cluster": pa.array(np.full(tbl.num_rows, -1, np.int64)),
             "chars": pc.cast(tbl.column("n_chars"), pa.int64())}
        )

    def tag_lab(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "chars": pa.array([], pa.int64())})
        return pa.table({"doc_id": tbl.column("doc_id"),
                         "cluster": tbl.column("cluster"),
                         "chars": pa.array(np.zeros(tbl.num_rows, np.int64))})

    u = docs.map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True).union(
        labels.map_batches(tag_lab, batch_format="pyarrow", zero_copy_batch=True)
    )

    def resolve(df: _pd.DataFrame) -> _pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            {"cluster": "max", "chars": "sum"}
        )
        return g

    per_doc = bucketed_map_groups(u, "doc_id", resolve, num_buckets=16)

    def part(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({k: pa.array([], pa.int64()) for k in
                             ("n_docs", "chars_total", "n_dup_docs",
                              "chars_dup", "chars_kept", "n_clusters")})
        cl = tbl.column("cluster").to_numpy(zero_copy_only=False)
        ch = tbl.column("chars").to_numpy(zero_copy_only=False)
        did = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        dup = cl >= 0
        kept = dup & (did == cl)
        return pa.table(
            {"n_docs": pa.array([tbl.num_rows], pa.int64()),
             "chars_total": pa.array([int(ch.sum())], pa.int64()),
             "n_dup_docs": pa.array([int(dup.sum())], pa.int64()),
             "chars_dup": pa.array([int(ch[dup].sum())], pa.int64()),
             "chars_kept": pa.array([int(ch[kept].sum())], pa.int64()),
             "n_clusters": pa.array([int(kept.sum())], pa.int64())}
        )

    agg = per_doc.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n_docs = int(agg["n_docs"].sum())
    chars_total = int(agg["chars_total"].sum())
    n_dup = int(agg["n_dup_docs"].sum())
    removed = int(agg["chars_dup"].sum()) - int(agg["chars_kept"].sum())
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_dup_docs": pa.array([n_dup], pa.int64()),
            "n_clusters": pa.array([int(agg["n_clusters"].sum())], pa.int64()),
            "chars_total": pa.array([chars_total], pa.int64()),
            "chars_removed": pa.array([removed], pa.int64()),
            "removal_share": pa.array(
                [round(removed * 1.0 / chars_total, 6) if chars_total else None],
                pa.float64()),
        }
    )


SQL_DEDUP_SAVINGS = f"""
WITH RECURSIVE dup_pairs AS ({SQL_MINHASH_WORD}),
dup_edges AS (SELECT doc_id AS src, dup_of AS dst FROM dup_pairs
              UNION SELECT dup_of, doc_id FROM dup_pairs),
dup_nodes AS (SELECT DISTINCT src AS node FROM dup_edges),
reach(node, m) AS (
  SELECT node, node FROM dup_nodes
  UNION
  SELECT r.node, de.dst FROM reach r JOIN dup_edges de ON de.src = r.m
),
lab AS (SELECT node AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster FROM reach GROUP BY 1),
j AS (SELECT d.doc_id, d.n_chars, lab.cluster
      FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cluster IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(SUM(CASE WHEN cluster = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_clusters,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(CASE WHEN cluster IS NOT NULL AND cluster <> doc_id
                     THEN n_chars ELSE 0 END) AS BIGINT) AS chars_removed,
       ROUND(SUM(CASE WHEN cluster IS NOT NULL AND cluster <> doc_id
                      THEN n_chars ELSE 0 END) * 1.0 / SUM(n_chars), 6) AS removal_share
FROM j
"""


def q_part_weighted_hops(sf_dir: str):
    """Bounded Bellman-Ford over the weighted co-purchase graph: min
    total tie-distance (w = 1000 // support + 1 — strong ties are
    short) within <= 3 edges of the {part % 23 == 0} seed set. The
    weighted companion of `part_bfs_hops`; synchronous broadcast-relax
    rounds, per-block min-deduped candidates only."""
    from vaero_ray.stages.basket import pair_cooccurrence
    from vaero_ray.stages.graph import weighted_hops

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    pairs = pair_cooccurrence(ds, "l_orderkey", "l_partkey", min_support=2)

    def weight(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"item_a": pa.array([], pa.int64()),
                             "item_b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        sup = tbl.column("support").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"item_a": tbl.column("item_a"),
                         "item_b": tbl.column("item_b"),
                         "w": pa.array(1000 // sup + 1, pa.int64())})

    wedges = pairs.map_batches(weight, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def seed_part(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"node": pa.array([], pa.int64())})
        a = tbl.column("item_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column("item_b").to_numpy(zero_copy_only=False).astype(np.int64)
        sset = np.unique(np.concatenate([a[a % 23 == 0], b[b % 23 == 0]]))
        return pa.table({"node": pa.array(sset, pa.int64())})

    seed_rows = pa.Table.from_pylist(
        wedges.map_batches(seed_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    )
    seeds = (
        np.unique(seed_rows.column("node").to_numpy(zero_copy_only=False))
        if seed_rows.num_rows else np.empty(0, np.int64)
    )
    return weighted_hops(wedges, "item_a", "item_b", "w", seeds, max_rounds=3)


SQL_PART_WEIGHTED_HOPS = r"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS sup
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e2 AS (SELECT u, v, 1000 // sup + 1 AS w FROM p
       UNION ALL SELECT v, u, 1000 // sup + 1 FROM p),
seeds AS (SELECT DISTINCT u AS node FROM e2 WHERE u % 23 = 0),
d0 AS (SELECT node, CAST(0 AS BIGINT) AS d FROM seeds),
r1 AS (SELECT e2.v AS node, d0.d + e2.w AS d FROM d0 JOIN e2 ON e2.u = d0.node
       UNION ALL SELECT node, d FROM d0),
d1 AS (SELECT node, MIN(d) AS d FROM r1 GROUP BY 1),
r2 AS (SELECT e2.v AS node, d1.d + e2.w AS d FROM d1 JOIN e2 ON e2.u = d1.node
       UNION ALL SELECT node, d FROM d1),
d2 AS (SELECT node, MIN(d) AS d FROM r2 GROUP BY 1),
r3 AS (SELECT e2.v AS node, d2.d + e2.w AS d FROM d2 JOIN e2 ON e2.u = d2.node
       UNION ALL SELECT node, d FROM d2),
d3 AS (SELECT node, MIN(d) AS d FROM r3 GROUP BY 1)
SELECT node, CAST(d AS BIGINT) AS dist FROM d3
"""


def q_sketch_quantile_error(sf_dir: str):
    """Eval-of-the-engine: accuracy of the mergeable log-histogram
    quantile sketch against the EXACT radix-selection quantiles of the
    same column — per quantile (p25/50/90/99), the sketch's bin-lower
    estimate, the exact value, and the integer ppm relative error.
    The bins are <= 6.25% wide relative to their UPPER edge, so the
    one-sided lower-edge estimate is within 12.5% of the exact value
    in the worst case (half that on average). Both numbers come from
    verified stages; the comparison is pure integers."""
    from vaero_ray.stages.selection import exact_quantiles_disc
    from vaero_ray.stages.sketch import lhq_registers

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    bins = lhq_registers(ds, "n_chars").to_pandas().sort_values("bin")
    b = bins["bin"].to_numpy(np.int64)
    cnt = bins["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)
    lo = np.where(b < 8, b, (8 + (b & 7)) << np.maximum((b >> 3) - 4, 0))
    ds2 = _read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    qs = [0.25, 0.5, 0.9, 0.99]
    exact = exact_quantiles_disc(ds2, "n_chars", qs)
    rows = {"q_pct": [], "exact": [], "sketch_est": [], "err_ppm": []}
    for q, ex in zip(qs, exact):
        rank = int(np.floor((n - 1) * q)) + 1
        est = int(lo[np.searchsorted(cum, rank, side="left")])
        rows["q_pct"].append(int(q * 100))
        rows["exact"].append(int(ex))
        rows["sketch_est"].append(est)
        rows["err_ppm"].append(abs(est - int(ex)) * 1000000 // int(ex))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


SQL_SKETCH_QERR = r"""
WITH b AS (
  SELECT n_chars AS v,
         CASE WHEN n_chars = 0 THEN 0 ELSE length(bin(n_chars)) END AS bl
  FROM documents),
reg AS (SELECT CAST(CASE WHEN v < 8 THEN v
               ELSE (bl << 3) | ((v >> greatest(bl - 4, 0)) & 7) END AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM b GROUP BY 1),
w AS (SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum,
             (SELECT SUM(cnt) FROM reg) AS n,
             CASE WHEN bin < 8 THEN bin
                  ELSE (8 + (bin & 7)) << greatest((bin >> 3) - 4, 0) END AS lo
      FROM reg),
q(q_pct, qf) AS (VALUES (25, 0.25), (50, 0.50), (90, 0.90), (99, 0.99)),
est AS (SELECT q.q_pct,
          (SELECT w.lo FROM w
           WHERE w.cum >= CAST(floor((w.n - 1) * q.qf) AS BIGINT) + 1
           ORDER BY w.bin LIMIT 1) AS sketch_est
        FROM q),
ex(q_pct, exact) AS (
  SELECT 25, CAST(quantile_disc(n_chars, 0.25) AS BIGINT) FROM documents
  UNION ALL SELECT 50, CAST(quantile_disc(n_chars, 0.50) AS BIGINT) FROM documents
  UNION ALL SELECT 90, CAST(quantile_disc(n_chars, 0.90) AS BIGINT) FROM documents
  UNION ALL SELECT 99, CAST(quantile_disc(n_chars, 0.99) AS BIGINT) FROM documents)
SELECT CAST(ex.q_pct AS BIGINT) AS q_pct, ex.exact, est.sketch_est,
       CAST(ABS(est.sketch_est - ex.exact) * 1000000 // ex.exact AS BIGINT) AS err_ppm
FROM ex JOIN est ON est.q_pct = ex.q_pct
"""


def _exact_distinct_users(sf_dir: str) -> int:
    """Exact COUNT(DISTINCT user_id) via the salted distinct shape:
    unique per block, hash-bucket exchange (disjoint value spaces), per
    bucket nunique, integer sum — shared by the sketch-accuracy gates."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_map_groups

    def uniq(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"user_id": pa.array([], pa.int64())})
        return pa.table({"user_id": pa.array(np.unique(
            tbl.column("user_id").to_numpy(zero_copy_only=False)), pa.int64())})

    def cnt(df: _pd.DataFrame) -> _pd.DataFrame:
        return _pd.DataFrame({"n": [int(df["user_id"].nunique())]})

    parts = bucketed_map_groups(
        _events(sf_dir, columns=["user_id"]).map_batches(
            uniq, batch_format="pyarrow", zero_copy_batch=True),
        "user_id", cnt, num_buckets=8,
    ).to_pandas()
    return int(parts["n"].sum())


def q_hll_error_eval(sf_dir: str):
    """Eval-of-the-engine: signed relative error of the HLL distinct
    sketch vs the EXACT distinct user count. The estimator denominator
    is accumulated as an INTEGER (sum of 2^(64-rho) in Python big ints
    / HUGEINT — dyadic terms are exact, so both engines convert the
    same integer to double once), making the float expression tree
    identical on both sides; the exact count comes from
    `_exact_distinct_users` (value-salted distinct exchange)."""
    from vaero_ray.stages.sketch import hll_registers

    ds = _events(sf_dir, columns=["user_id"])
    regs = hll_registers(ds, "user_id", p=_HLL_P).to_pandas()
    m = 1 << _HLL_P
    zeros = m - len(regs)
    s_int = sum(1 << (64 - int(r)) for r in regs["max_rho"]) + zeros * (1 << 64)
    den = float(s_int) / 18446744073709551616.0
    raw = (0.7213 / (1 + 1.079 / m)) * m * m / den
    est = m * math.log(m * 1.0 / zeros) if raw <= 2.5 * m and zeros > 0 else raw
    n_exact = _exact_distinct_users(sf_dir)
    return pa.table(
        {
            "n_exact": pa.array([n_exact], pa.int64()),
            "estimate": pa.array([round(est, 6)], pa.float64()),
            "rel_err": pa.array([round((est - n_exact) / n_exact, 6)], pa.float64()),
        }
    )


def _fmt_hll_error_sql() -> str:
    from vaero_ray.stages.sketch import HLL_A, HLL_A2, HLL_B, HLL_B2, HLL_XS

    reg = SQL_HLL_REGISTERS  # already formatted with the live constants
    return f"""
WITH reg AS ({reg}),
z AS (SELECT 256 - COUNT(*) AS zeros,
             SUM(CAST(1 AS HUGEINT) << (64 - max_rho)) AS s FROM reg),
d AS (SELECT zeros,
        CAST(s + CAST(zeros AS HUGEINT) * (CAST(1 AS HUGEINT) << 64) AS DOUBLE)
          / 18446744073709551616.0 AS den
      FROM z),
e AS (SELECT zeros, (0.7213 / (1 + 1.079 / 256)) * 256 * 256 / den AS raw FROM d),
f AS (SELECT CASE WHEN raw <= 2.5 * 256 AND zeros > 0
                  THEN 256 * LN(256.0 / zeros) ELSE raw END AS est FROM e),
x AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact FROM events)
SELECT x.n_exact, ROUND(f.est, 6) AS estimate,
       ROUND((f.est - x.n_exact) / x.n_exact, 6) AS rel_err
FROM x, f
"""


SQL_HLL_ERROR = _fmt_hll_error_sql()


def q_cms_error_eval(sf_dir: str):
    """Eval-of-the-engine: Count-Min overcount on the top-10 heaviest
    users — exact per-user counts (keyed exchange, deterministic
    (count DESC, user ASC) top-10) beside the sketch's min-over-rows
    upper bound; overcount = est - exact >= 0 by construction (the CMS
    guarantee, here VERIFIED against ground truth). All integers."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.sketch import cms_estimate, cms_registers

    ds = _events(sf_dir, columns=["user_id"])

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        out = _pd.DataFrame({"user_id": df["user_id"],
                             "n": np.ones(len(df), np.int64)})
        return out.groupby("user_id", sort=False, as_index=False).sum()

    per_user = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], ["n"]
    ).to_pandas()
    top = per_user.sort_values(["n", "user_id"], ascending=[False, True],
                               kind="mergesort").head(10)
    regs = cms_registers(
        _events(sf_dir, columns=["user_id"]), "user_id",
        width=_CMS_W, depth=_CMS_D,
    ).to_pandas()
    keys = top["user_id"].to_numpy(np.int64)
    est = cms_estimate(regs, keys, width=_CMS_W, depth=_CMS_D)
    exact = top["n"].to_numpy(np.int64)
    return pa.table(
        {
            "user_id": pa.array(keys, pa.int64()),
            "exact": pa.array(exact, pa.int64()),
            "cms_est": pa.array(est, pa.int64()),
            "overcount": pa.array(est - exact, pa.int64()),
        }
    )


def _fmt_cms_error_sql() -> str:
    from vaero_ray.stages.sketch import CMS_A, CMS_B

    slot_parts = []
    for r in range(_CMS_D):
        slot_parts.append(
            f"""
SELECT ex.user_id, ex.n, CAST({r} AS BIGINT) AS row,
  CAST(((CAST({int(CMS_A[r])} AS HUGEINT)
     * ((CASE WHEN ex.user_id < 0
          THEN CAST(ex.user_id AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
          ELSE CAST(ex.user_id AS HUGEINT) END) % CAST(2305843009213693951 AS HUGEINT)))
     % CAST(2305843009213693951 AS HUGEINT)
     + CAST({int(CMS_B[r])} AS HUGEINT)) % CAST(2305843009213693951 AS HUGEINT)
     AS BIGINT) % {_CMS_W} AS slot
FROM ex"""
        )
    slots = " UNION ALL ".join(slot_parts)
    return f"""
WITH regs AS ({SQL_CMS}),
ex AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
       GROUP BY 1 ORDER BY n DESC, user_id LIMIT 10),
slots AS ({slots}),
est AS (SELECT slots.user_id, slots.n,
          CAST(MIN(COALESCE(regs.cnt, 0)) AS BIGINT) AS cms_est
        FROM slots LEFT JOIN regs
          ON regs.row = slots.row AND regs.slot = slots.slot
        GROUP BY 1, 2)
SELECT user_id, n AS exact, cms_est, cms_est - n AS overcount FROM est
"""


SQL_CMS_ERROR = _fmt_cms_error_sql()


def q_bloom_fpr_eval(sf_dir: str):
    """Eval-of-the-engine: measured Bloom false-positive rate on 1000
    deterministic ABSENT probe keys (10^9 + i — far above any real
    user id, asserted) against the committed registers. No false
    negatives by construction; the positives here are ALL false, so
    fpr = positives / probes exactly. Integer counts + one mirrored
    ratio."""
    from vaero_ray.stages.sketch import bloom_may_contain, bloom_registers

    regs = bloom_registers(
        _events(sf_dir, columns=["user_id"]), "user_id", m_bits=_BLOOM_M
    ).to_pandas()
    probes = np.arange(1_000_000_000, 1_000_001_000, dtype=np.int64)
    ok = bloom_may_contain(regs, probes, m_bits=_BLOOM_M)
    fp = int(ok.sum())
    return pa.table(
        {
            "n_probes": pa.array([len(probes)], pa.int64()),
            "n_false_pos": pa.array([fp], pa.int64()),
            "fpr": pa.array([round(fp * 1.0 / len(probes), 6)], pa.float64()),
        }
    )


def _fmt_bloom_fpr_sql() -> str:
    from vaero_ray.stages.sketch import _BLOOM_K, _WORD_BITS, CMS_A, CMS_B

    checks = []
    for r in range(_BLOOM_K):
        checks.append(
            f"""
SELECT pr.k,
  CAST(((CAST({int(CMS_A[r])} AS HUGEINT)
     * (CAST(pr.k AS HUGEINT) % CAST(2305843009213693951 AS HUGEINT)))
     % CAST(2305843009213693951 AS HUGEINT)
     + CAST({int(CMS_B[r])} AS HUGEINT)) % CAST(2305843009213693951 AS HUGEINT)
     AS BIGINT) % {_BLOOM_M} AS p
FROM probes pr"""
        )
    union = " UNION ALL ".join(checks)
    return f"""
WITH regs AS ({SQL_BLOOM}),
probes AS (SELECT UNNEST(range(1000000000, 1000001000)) AS k),
pp AS ({union}),
hit AS (SELECT pp.k,
          CASE WHEN (COALESCE(regs.bits, 0) >> (pp.p % {_WORD_BITS})) & 1 = 1
               THEN 1 ELSE 0 END AS b
        FROM pp LEFT JOIN regs ON regs.word = pp.p // {_WORD_BITS}),
mem AS (SELECT k, CASE WHEN SUM(b) = {_BLOOM_K} THEN 1 ELSE 0 END AS pos
        FROM hit GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(pos) AS BIGINT) AS n_false_pos,
       ROUND(SUM(pos) * 1.0 / COUNT(*), 6) AS fpr
FROM mem
"""


SQL_BLOOM_FPR = _fmt_bloom_fpr_sql()


def q_kmv_error_eval(sf_dir: str):
    """Eval-of-the-engine, completing the sketch-accuracy tier for all
    four sketches: KMV distinct estimate ((k-1)*M61/h_k, k=64) vs the
    exact distinct user count — h_k is hash-exact int64 on both
    engines, the estimate is one mirrored float expression, and the
    exact count rides `_exact_distinct_users`."""
    from vaero_ray.stages.sketch import M61, kmv_minima

    minima = kmv_minima(
        _events(sf_dir, columns=["user_id"]), "user_id", k=_KMV_K
    ).to_pandas().sort_values("rk")
    hv = minima["hv"].to_numpy(np.int64)
    est = (
        float(len(hv)) if len(hv) < _KMV_K
        else (_KMV_K - 1) * float(M61) / float(hv[_KMV_K - 1])
    )
    n_exact = _exact_distinct_users(sf_dir)
    return pa.table(
        {
            "n_exact": pa.array([n_exact], pa.int64()),
            "estimate": pa.array([round(est, 6)], pa.float64()),
            "rel_err": pa.array([round((est - n_exact) / n_exact, 6)], pa.float64()),
        }
    )


SQL_KMV_ERROR = f"""
WITH mins AS ({SQL_KMV}),
hk AS (SELECT hv FROM mins WHERE rk = {_KMV_K} - 1),
nmin AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM mins),
e AS (SELECT CASE WHEN nmin.c < {_KMV_K} THEN CAST(nmin.c AS DOUBLE)
             ELSE ({_KMV_K} - 1) * CAST(2305843009213693951 AS DOUBLE)
                  / CAST((SELECT hv FROM hk) AS DOUBLE) END AS est
      FROM nmin),
x AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact FROM events)
SELECT x.n_exact, ROUND(e.est, 6) AS estimate,
       ROUND((e.est - x.n_exact) / x.n_exact, 6) AS rel_err
FROM x, e
"""


def q_user_delta_movers(sf_dir: str):
    """Heavy-hitter DRIFT: the top-10 users by absolute activity change
    between the two time halves (emerging + declining accounts — the
    who-moved companion of the distributional drift gates). Per-user
    (first-half, second-half) counts ride one keyed exchange; the
    midpoint split is the same (min+max+1)//2 rule as `cuped_ab_arms`;
    top-10 by (|delta| DESC, user ASC) is deterministic."""
    import pandas as _pd

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = _events(sf_dir, columns=["user_id", "ts"])
    bounds = ds.map_batches(
        lambda t: pa.table(
            {"lo": pa.array([pc.min(t.column("ts")).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
                             if t.num_rows else (1 << 62)], pa.int64()),
             "hi": pa.array([pc.max(t.column("ts")).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
                             if t.num_rows else -(1 << 62)], pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    split = (int(bounds["lo"].min()) + int(bounds["hi"].max()) + 1) // 2

    def partial(df: _pd.DataFrame) -> _pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        out = _pd.DataFrame(
            {"user_id": df["user_id"],
             "n1": (us < split).astype(np.int64),
             "n2": (us >= split).astype(np.int64)}
        )
        return out.groupby("user_id", sort=False, as_index=False).agg(
            {"n1": "sum", "n2": "sum"}
        )

    per_user = bucketed_keyed_sum(
        _events(sf_dir, columns=["user_id", "ts"]).map_batches(
            partial, batch_format="pandas"),
        ["user_id"], ["n1", "n2"],
    ).to_pandas()
    per_user["delta"] = per_user["n2"] - per_user["n1"]
    per_user["absd"] = per_user["delta"].abs()
    top = per_user.sort_values(["absd", "user_id"], ascending=[False, True],
                               kind="mergesort").head(10)
    return pa.table(
        {
            "user_id": pa.array(top["user_id"].to_numpy(np.int64), pa.int64()),
            "n_first": pa.array(top["n1"].to_numpy(np.int64), pa.int64()),
            "n_second": pa.array(top["n2"].to_numpy(np.int64), pa.int64()),
            "delta": pa.array(top["delta"].to_numpy(np.int64), pa.int64()),
        }
    )


SQL_USER_DELTA_MOVERS = r"""
WITH sp AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts)) + 1) // 2 AS s FROM events),
u AS (SELECT user_id,
        CAST(SUM(CASE WHEN epoch_us(ts) < (SELECT s FROM sp) THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        CAST(SUM(CASE WHEN epoch_us(ts) >= (SELECT s FROM sp) THEN 1 ELSE 0 END) AS BIGINT) AS n_second
      FROM events GROUP BY 1)
SELECT user_id, n_first, n_second, n_second - n_first AS delta
FROM u ORDER BY ABS(n_second - n_first) DESC, user_id LIMIT 10
"""


def q_dsl_windowed_join(sf_dir: str):
    """Fluent-DSL exposure of the relational tier (VERDICT r4 item 6): the
    reference's ``.source().add().sink()`` builder style
    (/root/reference/vaero/stream.py) extended with ``.window()`` /
    ``.join()`` verbs, compiled through the SAME planner/runner path as
    ``python -m vaero_ray add/start``. Grouped count+min+max over orders,
    adaptively joined (broadcast here — the build side is tiny after
    column pruning) to the customer segment via a detached side chain."""
    from vaero_ray.dsl import Vaero
    from vaero_ray.runner import run_batch

    Vaero.reset()
    right = (
        Vaero.side()
        .source("parquet", path=f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_mktsegment"])
        .rename("c_custkey", "o_custkey")
    )
    (
        Vaero()
        .source("parquet", path=f"{sf_dir}/orders.parquet",
                columns=["o_custkey", "o_orderkey"])
        .window(
            keys=["o_custkey"],
            aggs=[
                [None, "count", "n_orders"],
                ["o_orderkey", "min", "first_order"],
                ["o_orderkey", "max", "last_order"],
            ],
            size_s=None,
        )
        .join(right, on="o_custkey", how="inner")
        .sink("stdout")
    )
    graph = Vaero.start()
    Vaero.reset()
    return next(iter(run_batch(graph).values()))


SQL_DSL_WINDOWED_JOIN = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       MIN(o_orderkey) AS first_order,
       MAX(o_orderkey) AS last_order,
       c_mktsegment
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY o_custkey, c_mktsegment
"""


def q_dsl_dedup_select(sf_dir: str):
    """DSL relational tier, rel->tn interleave: `.dedup()` (exact content
    dedup, min-id survivor) followed by the reference's per-row `.select`
    transform — the fused tn segment runs AFTER the dataset-level stage,
    exercising the planner's mixed-step branch execution."""
    from vaero_ray.dsl import Vaero
    from vaero_ray.runner import run_batch

    Vaero.reset()
    (
        Vaero()
        .source("parquet", path=f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text"])
        .dedup(path="text", id_path="doc_id")
        .select("doc_id")
        .sink("stdout")
    )
    graph = Vaero.start()
    Vaero.reset()
    return next(iter(run_batch(graph).values()))


SQL_DSL_DEDUP_SELECT = """
-- .select stringifies (reference select.go: the event BECOMES the
-- string value at path), hence the VARCHAR cast
SELECT CAST(MIN(doc_id) AS VARCHAR) AS doc_id FROM documents GROUP BY text
"""


QUERIES: dict[str, QueryFn] = {
    "vaero_add_rename_delete": q_vaero_add_rename_delete,
    "vaero_filter_regexp": q_vaero_filter_regexp,
    "vaero_mask": q_vaero_mask,
    "vaero_parse_regexp": q_vaero_parse_regexp,
    "vaero_select": q_vaero_select,
    "tumbling_window_agg": q_tumbling_window_agg,
    "sliding_window_count": q_sliding_window_count,
    "session_window_stats": q_session_window_stats,
    "transcripts_derive": q_transcripts_derive,
    "transcript_stitch": q_transcript_stitch,
    "transcript_exchanges": q_transcript_exchanges,
    "transcript_stitch_exchanges": q_transcript_stitch_exchanges,
    "flagship_windowed_route": q_flagship_windowed_route,
    "exact_dedup_docs": q_exact_dedup_docs,
    "doc_token_stats": q_doc_token_stats,
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    "lineitem_pricing": q_lineitem_pricing,
    "distinct_users_per_type": q_distinct_users_per_type,
    "top10_orders": q_top10_orders,
    "customer_nation_broadcast": q_customer_nation_broadcast,
    "orders_customer_hash_join": q_orders_customer_hash_join,
    "purchase_asof_view": q_purchase_asof_view,
    "streaming_tumbling_agg": q_streaming_tumbling_agg,
    "streaming_sliding_count": q_streaming_sliding_count,
    "streaming_stitch": q_streaming_stitch,
    "streaming_session_stats": q_streaming_session_stats,
    "embedding_cosine_dups": q_embedding_cosine_dups,
    "embedding_lsh_dups": q_embedding_lsh_dups,
    "doc_quality_fingerprint": q_doc_quality_fingerprint,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "dup_clusters": q_dup_clusters,
    "media_features": q_media_features,
    "video_frame_sample": q_video_frame_sample,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "minhash_dup_edges": q_minhash_dup_edges,
    "simhash_signatures": q_simhash_signatures,
    "lang_id": q_lang_id,
    "ann_topk_ivf": q_ann_topk_ivf,
    "vocab_top_terms": q_vocab_top_terms,
    "pack_sequences": q_pack_sequences,
    "contamination_check": q_contamination_check,
    "training_data_pipeline": q_training_data_pipeline,
    "hll_user_registers": q_hll_user_registers,
    "hash_split_docs": q_hash_split_docs,
    "per_source_cap": q_per_source_cap,
    "doc_repetition_stats": q_doc_repetition_stats,
    "doc_token_diversity": q_doc_token_diversity,
    "chunk_docs": q_chunk_docs,
    "cms_user_counts": q_cms_user_counts,
    "doc_length_histogram": q_doc_length_histogram,
    "doc_length_quantiles": q_doc_length_quantiles,
    "source_length_quantiles": q_source_length_quantiles,
    "table_diff_docs": q_table_diff_docs,
    "length_equidepth_bins": q_length_equidepth_bins,
    "user_activity_intervals": q_user_activity_intervals,
    "weighted_sample_docs": q_weighted_sample_docs,
    "trimmed_length_stats": q_trimmed_length_stats,
    "length_percent_rank": q_length_percent_rank,
    "documents_profile": q_documents_profile,
    "lang_source_chi2": q_lang_source_chi2,
    "source_iqr_survivors": q_source_iqr_survivors,
    "top_unshipped_orders": q_top_unshipped_orders,
    "rolling_value_sums": q_rolling_value_sums,
    "edit_distance_dups": q_edit_distance_dups,
    "event_type_transitions": q_event_type_transitions,
    "weighted_length_quantiles": q_weighted_length_quantiles,
    "streaming_activity_intervals": q_streaming_activity_intervals,
    "user_state_history": q_user_state_history,
    "weighted_source_medians": q_weighted_source_medians,
    "event_state_asof": q_event_state_asof,
    "user_path_counts": q_user_path_counts,
    "user_covered_seconds": q_user_covered_seconds,
    "part_pair_support": q_part_pair_support,
    "user_time_weighted": q_user_time_weighted,
    "part_triangle_counts": q_part_triangle_counts,
    "lineitem_corr_matrix": q_lineitem_corr_matrix,
    "value_trend_per_type": q_value_trend_per_type,
    "user_event_entropy": q_user_event_entropy,
    "value_gini_per_type": q_value_gini_per_type,
    "source_length_ranksum": q_source_length_ranksum,
    "conv_turn_balance": q_conv_turn_balance,
    "tool_followup_roles": q_tool_followup_roles,
    "winsorized_length_stats": q_winsorized_length_stats,
    "session_conversion_rate": q_session_conversion_rate,
    "user_rfm_scores": q_user_rfm_scores,
    "discount_band_revenue": q_discount_band_revenue,
    "order_priority_counts": q_order_priority_counts,
    "small_qty_part_revenue": q_small_qty_part_revenue,
    "large_volume_customers": q_large_volume_customers,
    "embedding_dim_stats": q_embedding_dim_stats,
    "source_simpson_diversity": q_source_simpson_diversity,
    "hourly_type_share": q_hourly_type_share,
    "user_interarrival_cv": q_user_interarrival_cv,
    "streaming_type_entropy": q_streaming_type_entropy,
    "hourly_count_change": q_hourly_count_change,
    "conv_duration_quantiles": q_conv_duration_quantiles,
    "type_value_topn_share": q_type_value_topn_share,
    "vocab_zipf_slope": q_vocab_zipf_slope,
    "conv_turn_drift": q_conv_turn_drift,
    "role_transition_gaps": q_role_transition_gaps,
    "kmv_user_minima": q_kmv_user_minima,
    "conv_pattern_matches": q_conv_pattern_matches,
    "event_regex_funnel": q_event_regex_funnel,
    "hourly_autocorr": q_hourly_autocorr,
    "hourly_cusum_peak": q_hourly_cusum_peak,
    "streaming_pattern_counts": q_streaming_pattern_counts,
    "purchase_attribution": q_purchase_attribution,
    "kmv_users_by_type": q_kmv_users_by_type,
    "hourly_anomaly_scores": q_hourly_anomaly_scores,
    "view_to_purchase_quantiles": q_view_to_purchase_quantiles,
    "kmv_audience_estimates": q_kmv_audience_estimates,
    "cms_join_size": q_cms_join_size,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "lateness_coverage": q_lateness_coverage,
    "embedding_dim_quantiles": q_embedding_dim_quantiles,
    "tool_resolution_latency": q_tool_resolution_latency,
    "funnel_dropoff": q_funnel_dropoff,
    "hourly_trend_kendall": q_hourly_trend_kendall,
    "hourly_active_sessions": q_hourly_active_sessions,
    "value_psi_drift": q_value_psi_drift,
    "hourly_ctr_wilson": q_hourly_ctr_wilson,
    "length_ks_en_rest": q_length_ks_en_rest,
    "user_value_frontier": q_user_value_frontier,
    "value_benford_digits": q_value_benford_digits,
    "zorder_events": q_zorder_events,
    "returned_item_revenue": q_returned_item_revenue,
    "top_revenue_supplier": q_top_revenue_supplier,
    "brand_size_supplier_counts": q_brand_size_supplier_counts,
    "rich_inactive_customers": q_rich_inactive_customers,
    "rolling_user_counts": q_rolling_user_counts,
    "funnel_view_purchase": q_funnel_view_purchase,
    "customers_no_big_orders": q_customers_no_big_orders,
    "hll_users_by_type": q_hll_users_by_type,
    "bloom_user_filter": q_bloom_user_filter,
    "stratified_sample_docs": q_stratified_sample_docs,
    "label_centroid_sums": q_label_centroid_sums,
    "streaming_hll_distinct": q_streaming_hll_distinct,
    "streaming_funnel": q_streaming_funnel,
    "streaming_dedup_events": q_streaming_dedup_events,
    "streaming_interval_join": q_streaming_interval_join,
    "streaming_interval_join_outer": q_streaming_interval_join_outer,
    "streaming_transform_route": q_streaming_transform_route,
    "conv_response_latency": q_conv_response_latency,
    "conv_fingerprint_dedup": q_conv_fingerprint_dedup,
    "conv_role_violations": q_conv_role_violations,
    "heavy_hitter_users": q_heavy_hitter_users,
    "streaming_topk_terms": q_streaming_topk_terms,
    "audience_overlap": q_audience_overlap,
    "source_lang_grouping_sets": q_source_lang_grouping_sets,
    "p90_value_cont_per_user": q_p90_value_cont_per_user,
    "value_outliers_per_user": q_value_outliers_per_user,
    "vaero_parse_json": q_vaero_parse_json,
    "user_stats_skew_join": q_user_stats_skew_join,
    "pagerank_user_types": q_pagerank_user_types,
    "bigram_associations": q_bigram_associations,
    "sft_examples": q_sft_examples,
    "longest_type_streak": q_longest_type_streak,
    "user_state_changelog": q_user_state_changelog,
    "conversation_sft_pipeline": q_conversation_sft_pipeline,
    "streaming_value_quantile": q_streaming_value_quantile,
    "preference_pairs": q_preference_pairs,
    "mixture_resample": q_mixture_resample,
    "docs_length_band": q_docs_length_band,
    "user_value_ewma": q_user_value_ewma,
    "source_similarity": q_source_similarity,
    "streaming_user_ewma": q_streaming_user_ewma,
    "dedup_against_reference": q_dedup_against_reference,
    "inverted_index": q_inverted_index,
    "near_dedup_docs": q_near_dedup_docs,
    "brand_promo_revenue": q_brand_promo_revenue,
    "streaming_user_state": q_streaming_user_state,
    "query_top_docs": q_query_top_docs,
    "global_event_seq": q_global_event_seq,
    "streaming_enriched_agg": q_streaming_enriched_agg,
    "supplier_nation_balance": q_supplier_nation_balance,
    "conv_tool_calls": q_conv_tool_calls,
    "dup_ngram_stats": q_dup_ngram_stats,
    "streaming_distinct_users": q_streaming_distinct_users,
    "length_histogram_by_source": q_length_histogram_by_source,
    "seq_view_click_purchase": q_seq_view_click_purchase,
    "views_in_purchase_window": q_views_in_purchase_window,
    "top3_docs_per_source": q_top3_docs_per_source,
    "line_dedup_docs": q_line_dedup_docs,
    "event_type_pivot": q_event_type_pivot,
    "tfidf_top_terms": q_tfidf_top_terms,
    "customer_big_order_stats": q_customer_big_order_stats,
    "docs_above_p90_length": q_docs_above_p90_length,
    "latest_event_per_user": q_latest_event_per_user,
    "running_value_per_user": q_running_value_per_user,
    "moving_avg_value": q_moving_avg_value,
    "event_lag_lead": q_event_lag_lead,
    "event_interarrival": q_event_interarrival,
    "sessionize_events": q_sessionize_events,
    "source_lang_rollup": q_source_lang_rollup,
    "median_length_per_source": q_median_length_per_source,
    "doc_tokens_exploded": q_doc_tokens_exploded,
    "view_purchase_full_outer": q_view_purchase_full_outer,
    "doc_normalize_text": q_doc_normalize_text,
    "doc_pii_redact": q_doc_pii_redact,
    "event_rank_per_user": q_event_rank_per_user,
    "user_event_path": q_user_event_path,
    "users_view_not_purchase": q_users_view_not_purchase,
    "users_view_and_purchase": q_users_view_and_purchase,
    "length_token_moments": q_length_token_moments,
    "length_token_corr": q_length_token_corr,
    "dedup_keep_best": q_dedup_keep_best,
    "event_ntile_per_user": q_event_ntile_per_user,
    "source_lang_cube": q_source_lang_cube,
    "purchase_next_view": q_purchase_next_view,
    "kmeans_embeddings": q_kmeans_embeddings,
    "doc_bigram_commonness": q_doc_bigram_commonness,
    "views_unconverted": q_views_unconverted,
    "doc_stats_unpivot": q_doc_stats_unpivot,
    "p90_length_per_source": q_p90_length_per_source,
    "modal_event_per_user": q_modal_event_per_user,
    "mad_length_per_source": q_mad_length_per_source,
    "length_profile_per_source": q_length_profile_per_source,
    "cohort_retention": q_cohort_retention,
    "length_fixed_histogram": q_length_fixed_histogram,
    "event_percent_rank": q_event_percent_rank,
    "sample_k_docs": q_sample_k_docs,
    "sample_per_source": q_sample_per_source,
    "revenue_by_nation": q_revenue_by_nation,
    "term_frequency_spectrum": q_term_frequency_spectrum,
    "nation_pair_volume": q_nation_pair_volume,
    "promo_market_share": q_promo_market_share,
    "part_type_profit": q_part_type_profit,
    "disjunctive_brand_revenue": q_disjunctive_brand_revenue,
    "dominant_part_suppliers": q_dominant_part_suppliers,
    "order_blocker_suppliers": q_order_blocker_suppliers,
    "length_token_spearman": q_length_token_spearman,
    "length_token_kendall": q_length_token_kendall,
    "late_shipment_priority": q_late_shipment_priority,
    "customer_order_distribution": q_customer_order_distribution,
    "hourly_theil_sen": q_hourly_theil_sen,
    "jw_title_dups": q_jw_title_dups,
    "source_lang_mutual_info": q_source_lang_mutual_info,
    "hourly_view_purchase_lag": q_hourly_view_purchase_lag,
    "source_length_kruskal": q_source_length_kruskal,
    "source_length_jsd": q_source_length_jsd,
    "hourly_siegel_slope": q_hourly_siegel_slope,
    "source_length_hl_shift": q_source_length_hl_shift,
    "source_length_mood": q_source_length_mood,
    "hourly_friedman": q_hourly_friedman,
    "source_lang_cramers_v": q_source_lang_cramers_v,
    "hourly_runs_test": q_hourly_runs_test,
    "hourly_durbin_watson": q_hourly_durbin_watson,
    "length_token_gamma": q_length_token_gamma,
    "source_length_cliffs": q_source_length_cliffs,
    "source_lang_theil_u": q_source_lang_theil_u,
    "source_lang_gtest": q_source_lang_gtest,
    "hourly_page_trend": q_hourly_page_trend,
    "hourly_cochran_q": q_hourly_cochran_q,
    "damerau_title_dups": q_damerau_title_dups,
    "source_length_anova": q_source_length_anova,
    "source_length_welch": q_source_length_welch,
    "source_length_shape": q_source_length_shape,
    "source_length_brown_forsythe": q_source_length_brown_forsythe,
    "source_lang_lambda": q_source_lang_lambda,
    "hod_purchase_trend": q_hod_purchase_trend,
    "part_bfs_hops": q_part_bfs_hops,
    "km_time_to_purchase": q_km_time_to_purchase,
    "logrank_purchase_cohorts": q_logrank_purchase_cohorts,
    "source_length_jonckheere": q_source_length_jonckheere,
    "vocab_richness": q_vocab_richness,
    "hourly_quade": q_hourly_quade,
    "user_halves_mcnemar": q_user_halves_mcnemar,
    "cohort_conversion_odds": q_cohort_conversion_odds,
    "bm25_top_docs": q_bm25_top_docs,
    "length_emd_en_rest": q_length_emd_en_rest,
    "user_halves_kappa": q_user_halves_kappa,
    "part_adamic_adar": q_part_adamic_adar,
    "part_pair_lift": q_part_pair_lift,
    "part_degree_assortativity": q_part_degree_assortativity,
    "type_daily_cycle": q_type_daily_cycle,
    "event_chain_entropy": q_event_chain_entropy,
    "doc_containment_dups": q_doc_containment_dups,
    "streaming_cusum_peak": q_streaming_cusum_peak,
    "rrf_top_docs": q_rrf_top_docs,
    "order_basket_containment": q_order_basket_containment,
    "referential_integrity": q_referential_integrity,
    "user_count_powerlaw": q_user_count_powerlaw,
    "embedding_gram": q_embedding_gram,
    "label_silhouette": q_label_silhouette,
    "bm25_ndcg_eval": q_bm25_ndcg_eval,
    "doc_unigram_xent": q_doc_unigram_xent,
    "lang_confusion_matrix": q_lang_confusion_matrix,
    "user_score_auc": q_user_score_auc,
    "score_threshold_pr": q_score_threshold_pr,
    "score_bucket_lift": q_score_bucket_lift,
    "purchase_confusion_mcc": q_purchase_confusion_mcc,
    "winnow_dup_pairs": q_winnow_dup_pairs,
    "score_ks_separation": q_score_ks_separation,
    "blocklist_hits": q_blocklist_hits,
    "embedding_jl_projection": q_embedding_jl_projection,
    "embedding_int8_codes": q_embedding_int8_codes,
    "sorted_neighborhood_pairs": q_sorted_neighborhood_pairs,
    "score_isotonic_calibration": q_score_isotonic_calibration,
    "streaming_window_auc": q_streaming_window_auc,
    "copurchase_butterflies": q_copurchase_butterflies,
    "user_score_auc_delong": q_user_score_auc_delong,
    "auc_pair_delong": q_auc_pair_delong,
    "source_lang_auc_slices": q_source_lang_auc_slices,
    "hourly_mase_backtest": q_hourly_mase_backtest,
    "cuped_ab_arms": q_cuped_ab_arms,
    "k_anonymity_audit": q_k_anonymity_audit,
    "lsh_recall_eval": q_lsh_recall_eval,
    "leakage_safe_split": q_leakage_safe_split,
    "dedup_savings_report": q_dedup_savings_report,
    "part_weighted_hops": q_part_weighted_hops,
    "sketch_quantile_error": q_sketch_quantile_error,
    "hll_error_eval": q_hll_error_eval,
    "cms_error_eval": q_cms_error_eval,
    "bloom_fpr_eval": q_bloom_fpr_eval,
    "kmv_error_eval": q_kmv_error_eval,
    "user_delta_movers": q_user_delta_movers,
    "dsl_windowed_join": q_dsl_windowed_join,
    "dsl_dedup_select": q_dsl_dedup_select,
}

# Driver correctness window (rotated in round 5). The external gate
# harness hashes the FIRST 50 registry entries against their SQL
# oracles; rounds 3-4 kept the same 50 while the registry grew to 316,
# leaving 266 gates with no driver-issued correctness row. The window
# below keeps the reference-transform core (the seven §2a gates) and
# the streaming window matrix, and otherwise rotates onto entries the
# driver has never checked — 40 of these 50 are first-time driver
# checks, prioritizing the capstones (near-dedup, SFT/preference
# assembly, mixture resampling, revenue rollup, interval join, EWMA).
_DRIVER_WINDOW = [
    # §2a reference-transform core
    "vaero_add_rename_delete",
    "vaero_filter_regexp",
    "vaero_mask",
    "vaero_parse_regexp",
    "vaero_parse_json",
    "vaero_select",
    "streaming_transform_route",
    # streaming window matrix + stateful streaming ops
    "streaming_tumbling_agg",
    "streaming_sliding_count",
    "streaming_session_stats",
    "streaming_stitch",
    "streaming_interval_join",
    "streaming_user_ewma",
    # capstones
    "training_data_pipeline",
    "near_dedup_docs",
    "conversation_sft_pipeline",
    "revenue_by_nation",
    "preference_pairs",
    "mixture_resample",
    "leakage_safe_split",
    # dedup tier
    "line_dedup_docs",
    "winnow_dup_pairs",
    "sorted_neighborhood_pairs",
    "dedup_keep_best",
    "conv_fingerprint_dedup",
    "dedup_savings_report",
    # joins / relational
    "user_stats_skew_join",
    "cheapest_supplier_per_part",
    "top_unshipped_orders",
    "latest_event_per_user",
    "cohort_retention",
    # text / curation
    "doc_normalize_text",
    "doc_pii_redact",
    "stratified_sample_docs",
    "docs_length_band",
    "sft_examples",
    "inverted_index",
    "bm25_top_docs",
    "heavy_hitter_users",
    # embeddings / ANN
    "kmeans_embeddings",
    "embedding_jl_projection",
    "lsh_recall_eval",
    # sketches + accuracy evals
    "bloom_user_filter",
    "sketch_quantile_error",
    "hll_error_eval",
    # ML eval
    "user_score_auc",
    "auc_pair_delong",
    # row windows / sessions
    "sessionize_events",
    "event_lag_lead",
    "user_value_ewma",
]
assert len(_DRIVER_WINDOW) == 50 and len(set(_DRIVER_WINDOW)) == 50
QUERIES = {
    k: QUERIES[k]
    for k in (_DRIVER_WINDOW + [k for k in QUERIES if k not in set(_DRIVER_WINDOW)])
}

ORACLES: dict[str, str] = {
    "vaero_add_rename_delete": SQL_ADD_RENAME_DELETE,
    "vaero_filter_regexp": SQL_FILTER_REGEXP,
    "vaero_mask": SQL_MASK,
    "vaero_parse_regexp": SQL_PARSE_REGEXP,
    "vaero_select": SQL_SELECT,
    "tumbling_window_agg": SQL_TUMBLING,
    "sliding_window_count": SQL_SLIDING,
    "session_window_stats": SQL_SESSION,
    "transcripts_derive": SQL_TRANSCRIPTS,
    "transcript_stitch": SQL_STITCH,
    "transcript_exchanges": SQL_EXCHANGES,
    "transcript_stitch_exchanges": SQL_STITCH_EXCHANGES,
    "flagship_windowed_route": SQL_FLAGSHIP,
    "exact_dedup_docs": SQL_EXACT_DEDUP,
    "doc_token_stats": SQL_TOKEN_STATS,
    "ann_topk_bruteforce": SQL_ANN_TOPK,
    "lineitem_pricing": SQL_LINEITEM,
    "distinct_users_per_type": SQL_DISTINCT_USERS,
    "top10_orders": SQL_TOP10_ORDERS,
    "customer_nation_broadcast": SQL_CUSTOMER_NATION,
    "orders_customer_hash_join": SQL_ORDERS_CUSTOMER,
    "purchase_asof_view": SQL_PURCHASE_ASOF,
    "streaming_tumbling_agg": SQL_STREAMING_TUMBLING,
    "streaming_sliding_count": SQL_STREAMING_SLIDING,
    "streaming_stitch": SQL_STREAMING_STITCH,
    "streaming_session_stats": SQL_STREAMING_SESSION,
    "embedding_cosine_dups": SQL_EMBEDDING_DUPS,
    "embedding_lsh_dups": SQL_EMBEDDING_LSH,
    "doc_quality_fingerprint": SQL_QUALITY_FP,
    "ngram_jaccard_dups": SQL_NGRAM_JACCARD,
    "dup_clusters": SQL_DUP_CLUSTERS,
    "minhash_dup_edges": SQL_MINHASH_WORD,
    "media_features": SQL_MEDIA_FEATURES,
    "video_frame_sample": SQL_VIDEO_FRAMES,
    "simhash_dup_pairs": SQL_SIMHASH_PAIRS,
    "simhash_signatures": SQL_SIMHASH_SIG,
    "lang_id": SQL_LANG_ID,
    "ann_topk_ivf": SQL_ANN_TOPK,
    "vocab_top_terms": SQL_VOCAB,
    "pack_sequences": SQL_PACK,
    "contamination_check": SQL_CONTAMINATION,
    "training_data_pipeline": SQL_TRAINING_PIPELINE,
    "hll_user_registers": SQL_HLL_REGISTERS,
    "hash_split_docs": SQL_HASH_SPLIT,
    "per_source_cap": SQL_PER_SOURCE_CAP,
    "doc_repetition_stats": SQL_REPETITION,
    "doc_token_diversity": SQL_TOKEN_DIVERSITY,
    "chunk_docs": SQL_CHUNK_DOCS,
    "cms_user_counts": SQL_CMS,
    "doc_length_histogram": SQL_LHQ,
    "doc_length_quantiles": SQL_LENGTH_QUANTILES,
    "source_length_quantiles": SQL_SOURCE_LENGTH_QUANTILES,
    "table_diff_docs": SQL_TABLE_DIFF,
    "length_equidepth_bins": SQL_EQUIDEPTH,
    "user_activity_intervals": SQL_ACTIVITY_INTERVALS,
    "weighted_sample_docs": SQL_WEIGHTED_SAMPLE,
    "trimmed_length_stats": SQL_TRIMMED_STATS,
    "length_percent_rank": SQL_LENGTH_PERCENT_RANK,
    "documents_profile": SQL_DOCUMENTS_PROFILE,
    "lang_source_chi2": SQL_LANG_SOURCE_CHI2,
    "source_iqr_survivors": SQL_IQR_SURVIVORS,
    "top_unshipped_orders": SQL_TOP_UNSHIPPED,
    "rolling_value_sums": SQL_ROLLING_VALUE_SUMS,
    "edit_distance_dups": SQL_EDIT_DISTANCE_DUPS,
    "event_type_transitions": SQL_EVENT_TRANSITIONS,
    "weighted_length_quantiles": SQL_WEIGHTED_QUANTILES,
    "streaming_activity_intervals": SQL_STREAMING_ACTIVITY,
    "user_state_history": SQL_STATE_HISTORY,
    "weighted_source_medians": SQL_WEIGHTED_SOURCE_MEDIANS,
    "event_state_asof": SQL_EVENT_STATE_ASOF,
    "user_path_counts": SQL_USER_PATH_COUNTS,
    "user_covered_seconds": SQL_USER_COVERED_SECONDS,
    "part_pair_support": SQL_PART_PAIR_SUPPORT,
    "user_time_weighted": SQL_USER_TIME_WEIGHTED,
    "part_triangle_counts": SQL_PART_TRIANGLES,
    "lineitem_corr_matrix": SQL_LINEITEM_CORR,
    "value_trend_per_type": SQL_VALUE_TREND,
    "user_event_entropy": SQL_USER_ENTROPY,
    "value_gini_per_type": SQL_VALUE_GINI,
    "source_length_ranksum": SQL_RANKSUM,
    "conv_turn_balance": SQL_CONV_TURN_BALANCE,
    "tool_followup_roles": SQL_TOOL_FOLLOWUP,
    "winsorized_length_stats": SQL_WINSORIZED,
    "session_conversion_rate": SQL_SESSION_CONVERSION,
    "user_rfm_scores": SQL_USER_RFM,
    "discount_band_revenue": SQL_DISCOUNT_BAND,
    "order_priority_counts": SQL_ORDER_PRIORITY,
    "small_qty_part_revenue": SQL_SMALL_QTY_PART,
    "large_volume_customers": SQL_LARGE_VOLUME,
    "embedding_dim_stats": SQL_EMBEDDING_DIM_STATS,
    "source_simpson_diversity": SQL_SOURCE_SIMPSON,
    "hourly_type_share": SQL_HOURLY_SHARE,
    "user_interarrival_cv": SQL_INTERARRIVAL_CV,
    "streaming_type_entropy": SQL_STREAMING_ENTROPY,
    "hourly_count_change": SQL_HOURLY_CHANGE,
    "conv_duration_quantiles": SQL_CONV_DURATION,
    "type_value_topn_share": SQL_TOPN_SHARE,
    "vocab_zipf_slope": SQL_ZIPF,
    "conv_turn_drift": SQL_TURN_DRIFT,
    "role_transition_gaps": SQL_ROLE_GAPS,
    "kmv_user_minima": SQL_KMV,
    "conv_pattern_matches": SQL_CONV_PATTERN,
    "event_regex_funnel": SQL_EVENT_REGEX,
    "hourly_autocorr": SQL_HOURLY_AUTOCORR,
    "hourly_cusum_peak": SQL_HOURLY_CUSUM,
    "streaming_pattern_counts": SQL_CONV_PATTERN,  # stream == batch by design
    "purchase_attribution": SQL_ATTRIBUTION,
    "kmv_users_by_type": SQL_KMV_BY_TYPE,
    "hourly_anomaly_scores": SQL_HOURLY_ANOMALY,
    "view_to_purchase_quantiles": SQL_VIEW_TO_PURCHASE,
    "kmv_audience_estimates": SQL_KMV_OVERLAP,
    "cms_join_size": SQL_CMS_JOIN,
    "cheapest_supplier_per_part": SQL_CHEAPEST_SUPPLIER,
    "lateness_coverage": SQL_LATENESS,
    "embedding_dim_quantiles": SQL_EMBEDDING_DIM_QUANTILES,
    "tool_resolution_latency": SQL_TOOL_LATENCY,
    "funnel_dropoff": SQL_FUNNEL_DROPOFF,
    "hourly_trend_kendall": SQL_HOURLY_KENDALL,
    "hourly_active_sessions": SQL_ACTIVE_SESSIONS,
    "value_psi_drift": SQL_PSI_DRIFT,
    "hourly_ctr_wilson": SQL_CTR_WILSON,
    "length_ks_en_rest": SQL_LENGTH_KS,
    "user_value_frontier": SQL_FRONTIER,
    "value_benford_digits": SQL_BENFORD,
    "zorder_events": SQL_ZORDER,
    "returned_item_revenue": SQL_RETURNED_REVENUE,
    "top_revenue_supplier": SQL_TOP_SUPPLIER,
    "brand_size_supplier_counts": SQL_BRAND_SIZE_SUPPLIERS,
    "rich_inactive_customers": SQL_RICH_INACTIVE,
    "rolling_user_counts": SQL_ROLLING,
    "funnel_view_purchase": SQL_FUNNEL,
    "customers_no_big_orders": SQL_ANTI_JOIN,
    "hll_users_by_type": SQL_HLL_BY,
    "bloom_user_filter": SQL_BLOOM,
    "stratified_sample_docs": SQL_STRATIFIED,
    "label_centroid_sums": SQL_CENTROID_SUMS,
    "streaming_hll_distinct": SQL_STREAMING_HLL,
    "streaming_funnel": SQL_STREAMING_FUNNEL,
    "streaming_dedup_events": SQL_STREAMING_DEDUP,
    "streaming_interval_join": SQL_STREAMING_JOIN,
    "streaming_interval_join_outer": SQL_STREAMING_JOIN_OUTER,
    "streaming_transform_route": SQL_STREAMING_TRANSFORM,
    "conv_response_latency": SQL_RESPONSE_LATENCY,
    "conv_fingerprint_dedup": SQL_CONV_FP_DEDUP,
    "conv_role_violations": SQL_CONV_ROLE_VIOLATIONS,
    "heavy_hitter_users": SQL_HEAVY_HITTERS,
    "streaming_topk_terms": SQL_STREAMING_TOPK_TERMS,
    "audience_overlap": SQL_AUDIENCE_OVERLAP,
    "source_lang_grouping_sets": SQL_GROUPING_SETS,
    "p90_value_cont_per_user": SQL_P90_CONT,
    "value_outliers_per_user": SQL_ZSCORE_OUTLIERS,
    "vaero_parse_json": SQL_PARSE_JSON,
    "user_stats_skew_join": SQL_SKEW_JOIN,
    "pagerank_user_types": SQL_PAGERANK,
    "bigram_associations": SQL_BIGRAM_ASSOC,
    "sft_examples": SQL_SFT_EXAMPLES,
    "longest_type_streak": SQL_LONGEST_STREAK,
    "user_state_changelog": SQL_CHANGELOG,
    "conversation_sft_pipeline": SQL_CONV_SFT_PIPELINE,
    "streaming_value_quantile": SQL_STREAMING_VALUE_QUANTILE,
    "preference_pairs": SQL_PREFERENCE_PAIRS,
    "mixture_resample": SQL_MIXTURE,
    "docs_length_band": SQL_LENGTH_BAND,
    "user_value_ewma": SQL_USER_EWMA,
    "source_similarity": SQL_SOURCE_SIM,
    "streaming_user_ewma": SQL_USER_EWMA,
    "dedup_against_reference": SQL_DEDUP_AGAINST_REF,
    "inverted_index": SQL_INVERTED_INDEX,
    "near_dedup_docs": SQL_NEAR_DEDUP,
    "brand_promo_revenue": SQL_BRAND_PROMO_REVENUE,
    "streaming_user_state": SQL_STREAMING_USER_STATE,
    "query_top_docs": SQL_QUERY_TOP_DOCS,
    "global_event_seq": SQL_GLOBAL_EVENT_SEQ,
    "streaming_enriched_agg": SQL_STREAMING_ENRICHED,
    "supplier_nation_balance": SQL_SUPPLIER_NATION_BALANCE,
    "conv_tool_calls": SQL_CONV_TOOL_CALLS,
    "dup_ngram_stats": SQL_DUP_NGRAMS,
    "streaming_distinct_users": SQL_STREAMING_DISTINCT,
    "length_histogram_by_source": SQL_LHQ_BY,
    "seq_view_click_purchase": SQL_SEQUENCE,
    "views_in_purchase_window": SQL_RANGE_JOIN,
    "top3_docs_per_source": SQL_TOP_K_GROUP,
    "line_dedup_docs": SQL_LINE_DEDUP,
    "event_type_pivot": SQL_PIVOT,
    "tfidf_top_terms": SQL_TFIDF,
    "customer_big_order_stats": SQL_LEFT_JOIN,
    "docs_above_p90_length": SQL_P90_FILTER,
    "latest_event_per_user": SQL_LATEST,
    "running_value_per_user": SQL_RUNNING_SUM,
    "moving_avg_value": SQL_MOVING_AVG,
    "event_lag_lead": SQL_LAG_LEAD,
    "event_interarrival": SQL_INTERARRIVAL,
    "sessionize_events": SQL_SESSIONIZE,
    "source_lang_rollup": SQL_ROLLUP,
    "median_length_per_source": SQL_GROUPED_MEDIAN,
    "doc_tokens_exploded": SQL_EXPLODE,
    "view_purchase_full_outer": SQL_FULL_OUTER,
    "doc_normalize_text": SQL_NORMALIZE,
    "doc_pii_redact": SQL_PII_REDACT,
    "event_rank_per_user": SQL_RANK,
    "user_event_path": SQL_EVENT_PATH,
    "users_view_not_purchase": SQL_EXCEPT_USERS,
    "users_view_and_purchase": SQL_INTERSECT_USERS,
    "length_token_moments": SQL_MOMENTS,
    "length_token_corr": SQL_CORR,
    "dedup_keep_best": SQL_KEEP_BEST,
    "event_ntile_per_user": SQL_NTILE,
    "source_lang_cube": SQL_CUBE,
    "purchase_next_view": SQL_NEXT_VIEW,
    "kmeans_embeddings": SQL_KMEANS,
    "doc_bigram_commonness": SQL_BIGRAM_COMMON,
    "views_unconverted": SQL_ABSENCE,
    "doc_stats_unpivot": SQL_UNPIVOT,
    "p90_length_per_source": SQL_GROUPED_P90,
    "modal_event_per_user": SQL_MODE,
    "mad_length_per_source": SQL_MAD,
    "length_profile_per_source": SQL_LENGTH_PROFILE,
    "cohort_retention": SQL_COHORT,
    "length_fixed_histogram": SQL_FIXED_HIST,
    "event_percent_rank": SQL_PERCENT_RANK,
    "sample_k_docs": SQL_SAMPLE_K,
    "sample_per_source": SQL_SAMPLE_PER_SOURCE,
    "revenue_by_nation": SQL_REVENUE_NATION,
    "term_frequency_spectrum": SQL_TERM_SPECTRUM,
    "nation_pair_volume": SQL_NATION_PAIR_VOLUME,
    "promo_market_share": SQL_PROMO_MARKET_SHARE,
    "part_type_profit": SQL_PART_TYPE_PROFIT,
    "disjunctive_brand_revenue": SQL_DISJUNCTIVE_REVENUE,
    "dominant_part_suppliers": SQL_DOMINANT_SUPPLIERS,
    "order_blocker_suppliers": SQL_ORDER_BLOCKERS,
    "length_token_spearman": SQL_SPEARMAN,
    "length_token_kendall": SQL_KENDALL,
    "late_shipment_priority": SQL_LATE_SHIPMENT,
    "customer_order_distribution": SQL_CUSTOMER_ORDER_DIST,
    "hourly_theil_sen": SQL_THEIL_SEN,
    "jw_title_dups": SQL_JW_TITLE_DUPS,
    "source_lang_mutual_info": SQL_SOURCE_LANG_MI,
    "hourly_view_purchase_lag": SQL_VIEW_PURCHASE_LAG,
    "source_length_kruskal": SQL_KRUSKAL,
    "source_length_jsd": SQL_SOURCE_LENGTH_JSD,
    "hourly_siegel_slope": SQL_SIEGEL,
    "source_length_hl_shift": SQL_HL_SHIFT,
    "source_length_mood": SQL_MOOD,
    "hourly_friedman": SQL_FRIEDMAN,
    "source_lang_cramers_v": SQL_CRAMERS_V,
    "hourly_runs_test": SQL_RUNS_TEST,
    "hourly_durbin_watson": SQL_DURBIN_WATSON,
    "length_token_gamma": SQL_GAMMA,
    "source_length_cliffs": SQL_CLIFFS,
    "source_lang_theil_u": SQL_THEIL_U,
    "source_lang_gtest": SQL_GTEST,
    "hourly_page_trend": SQL_PAGE_TREND,
    "hourly_cochran_q": SQL_COCHRAN_Q,
    "damerau_title_dups": SQL_DAMERAU_TITLE_DUPS,
    "source_length_anova": SQL_ANOVA,
    "source_length_welch": SQL_WELCH,
    "source_length_shape": SQL_SHAPE,
    "source_length_brown_forsythe": SQL_BROWN_FORSYTHE,
    "source_lang_lambda": SQL_GK_LAMBDA,
    "hod_purchase_trend": SQL_HOD_TREND,
    "part_bfs_hops": SQL_PART_BFS,
    "km_time_to_purchase": SQL_KM,
    "logrank_purchase_cohorts": SQL_LOGRANK,
    "source_length_jonckheere": SQL_JONCKHEERE,
    "vocab_richness": SQL_VOCAB_RICHNESS,
    "hourly_quade": SQL_QUADE,
    "user_halves_mcnemar": SQL_MCNEMAR,
    "cohort_conversion_odds": SQL_COHORT_ODDS,
    "bm25_top_docs": SQL_BM25,
    "length_emd_en_rest": SQL_LENGTH_EMD,
    "user_halves_kappa": SQL_HALVES_KAPPA,
    "part_adamic_adar": SQL_ADAMIC_ADAR,
    "part_pair_lift": SQL_PAIR_LIFT,
    "part_degree_assortativity": SQL_DEGREE_ASSORT,
    "type_daily_cycle": SQL_DAILY_CYCLE,
    "event_chain_entropy": SQL_CHAIN_ENTROPY,
    "doc_containment_dups": SQL_CONTAINMENT,
    "streaming_cusum_peak": SQL_STREAMING_CUSUM,
    "rrf_top_docs": SQL_RRF,
    "order_basket_containment": SQL_BASKET_CONTAINMENT,
    "referential_integrity": SQL_REF_INTEGRITY,
    "user_count_powerlaw": SQL_POWERLAW,
    "embedding_gram": SQL_EMBEDDING_GRAM,
    "label_silhouette": SQL_LABEL_SILHOUETTE,
    "bm25_ndcg_eval": SQL_BM25_NDCG,
    "doc_unigram_xent": SQL_UNIGRAM_XENT,
    "lang_confusion_matrix": SQL_LANG_CONFUSION,
    "user_score_auc": SQL_USER_SCORE_AUC,
    "score_threshold_pr": SQL_SCORE_THRESHOLD_PR,
    "score_bucket_lift": SQL_SCORE_BUCKET_LIFT,
    "purchase_confusion_mcc": SQL_PURCHASE_CONFUSION_MCC,
    "winnow_dup_pairs": SQL_WINNOW_DUPS,
    "score_ks_separation": SQL_SCORE_KS_SEPARATION,
    "blocklist_hits": SQL_BLOCKLIST_HITS,
    "embedding_jl_projection": SQL_EMBEDDING_JL,
    "embedding_int8_codes": SQL_EMBEDDING_INT8,
    "sorted_neighborhood_pairs": SQL_SNM_PAIRS,
    "score_isotonic_calibration": SQL_SCORE_ISOTONIC,
    "streaming_window_auc": SQL_STREAMING_WINDOW_AUC,
    "copurchase_butterflies": SQL_COPURCHASE_BUTTERFLIES,
    "user_score_auc_delong": SQL_USER_SCORE_AUC_DELONG,
    "auc_pair_delong": SQL_AUC_PAIR_DELONG,
    "source_lang_auc_slices": SQL_SOURCE_LANG_AUC,
    "hourly_mase_backtest": SQL_HOURLY_MASE,
    "cuped_ab_arms": SQL_CUPED_AB,
    "k_anonymity_audit": SQL_K_ANONYMITY,
    "lsh_recall_eval": SQL_LSH_RECALL,
    "leakage_safe_split": SQL_LEAKAGE_SPLIT,
    "dedup_savings_report": SQL_DEDUP_SAVINGS,
    "part_weighted_hops": SQL_PART_WEIGHTED_HOPS,
    "sketch_quantile_error": SQL_SKETCH_QERR,
    "hll_error_eval": SQL_HLL_ERROR,
    "cms_error_eval": SQL_CMS_ERROR,
    "bloom_fpr_eval": SQL_BLOOM_FPR,
    "kmv_error_eval": SQL_KMV_ERROR,
    "user_delta_movers": SQL_USER_DELTA_MOVERS,
    "dsl_windowed_join": SQL_DSL_WINDOWED_JOIN,
    "dsl_dedup_select": SQL_DSL_DEDUP_SELECT,
}
