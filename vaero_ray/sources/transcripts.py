"""Deterministic synthetic multi-turn transcript generator (fixture F1).

Schema per BASELINE.json input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp[us]

Generation rules (FIXTURES.md F1): Zipf-skewed turns per conversation (hot
conversations exercise skew handling), cyclic role pattern
user -> assistant -> (tool p=0.3, repeating p=0.5) -> user..., seeded lorem
text with digits and email-like substrings (so mask / parse_regexp /
filter_regexp oracles have matches), ~5 s between turns with jitter, and a
``disorder_frac`` knob that perturbs timestamps ACROSS conversations (never
reordering a conversation's own logical order) to exercise watermarks.

This generator plays the role of the reference's ``random`` source
(/root/reference/integrations/sources/source_random.go:16-33): the
deterministic event feed every demo pipeline runs on. Fully vectorized in
numpy; the bench caches its output to Parquet once and streams from there.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE_TS_US = np.int64(1_767_225_600_000_000)  # 2026-01-01T00:00:00Z in micros

_WORDS = np.array(
    (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
        "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
        "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
        "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
        "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
        "sunt culpa qui officia deserunt mollit anim id est laborum"
    ).split()
)

_TOOLS = np.array(["search", "python", "browser", "calculator"])
ROLES = np.array(["user", "assistant", "tool"])

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.large_string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _turns_per_conv(rng: np.random.Generator, n_convs: int, mean_turns: int, zipf_s: float) -> np.ndarray:
    if zipf_s <= 0:
        return np.full(n_convs, mean_turns, dtype=np.int64)
    # heavy-tailed turn counts, clipped so one conversation's state stays bounded
    raw = rng.zipf(max(zipf_s, 1.01), size=n_convs)
    scaled = np.clip(raw, 1, 50) * max(1, mean_turns // 4)
    # rescale to hit ~n_convs * mean_turns total
    total = scaled.sum()
    target = n_convs * mean_turns
    scaled = np.maximum(2, (scaled * (target / total)).astype(np.int64))
    return scaled


def _roles_markov(rng: np.random.Generator, turns: np.ndarray) -> np.ndarray:
    """Vectorized role chain per conversation: one vector step per turn rank
    across all conversations (max_turns steps of O(n_convs) numpy work)."""
    n_convs = len(turns)
    max_t = int(turns.max())
    out = np.empty((max_t, n_convs), dtype=np.int8)  # 0=user 1=assistant 2=tool
    state = np.zeros(n_convs, dtype=np.int8)  # turn 0 is always user
    out[0] = state
    for t in range(1, max_t):
        u = rng.random(n_convs)
        nxt = np.where(
            state == 0,
            1,  # after user -> assistant
            np.where(
                state == 1,
                np.where(u < 0.3, 2, 0),  # assistant -> tool p=.3 else user
                np.where(u < 0.5, 2, 0),  # tool -> tool p=.5 else user
            ),
        ).astype(np.int8)
        state = nxt
        out[t] = state
    # flatten column-major per conversation, trimmed to each conv's length
    mask = np.arange(max_t)[:, None] < turns[None, :]
    return out.T[mask.T]


def make_transcripts(
    n_convs: int = 50,
    mean_turns: int = 20,
    seed: int = 42,
    zipf_s: float = 1.1,
    disorder_frac: float = 0.1,
    words_per_turn: tuple[int, int] = (10, 40),
) -> pa.Table:
    rng = np.random.default_rng(seed)
    turns = _turns_per_conv(rng, n_convs, mean_turns, zipf_s)
    n = int(turns.sum())

    conv_idx = np.repeat(np.arange(n_convs), turns)
    turn_idx = (np.arange(n) - np.repeat(np.cumsum(turns) - turns, turns)).astype(np.int32)
    roles_i = _roles_markov(rng, turns)
    role = ROLES[roles_i]

    tool = np.where(roles_i == 2, _TOOLS[rng.integers(0, len(_TOOLS), n)], "")

    # timestamps: per-conversation start offset + ~5 s per turn with jitter
    conv_start = rng.integers(0, 3600 * 6, n_convs) * 1_000_000
    step = (5_000_000 + rng.integers(-2_000_000, 2_000_000, n)).cumsum()
    step -= np.repeat(step[np.cumsum(turns) - turns], turns) - 5_000_000
    ts = BASE_TS_US + conv_start[conv_idx] + step
    if disorder_frac > 0:
        # jitter a fraction of rows by up to +/-8 s — reorders rows ACROSS
        # conversations in event-time without breaking (conv_id, turn_idx)
        # logical order semantics (turn_idx stays authoritative)
        k = rng.random(n) < disorder_frac
        ts = ts + np.where(k, rng.integers(-8_000_000, 8_000_000, n), 0)

    # conv ids built per CONVERSATION then gathered (np.char over every
    # row is 10x slower)
    per_conv = np.char.add("conv-", np.char.zfill(np.arange(n_convs).astype("U8"), 8))
    conv_id = per_conv[conv_idx]

    # text: "{role} turn {t} of {conv}: " + lorem + " user{n}@example.com"
    # lorem drawn from a seeded pool of pre-joined sentences — building
    # 10^8 individual words is ~10x the cost of the whole table; a 4096-
    # sentence pool keeps lengths/content varied and generation O(n) takes
    lo, hi = words_per_turn
    pool_rng = np.random.default_rng(seed ^ 0x5EED)
    pool = [
        " ".join(_WORDS[pool_rng.integers(0, len(_WORDS), pool_rng.integers(lo, hi + 1))])
        for _ in range(4096)
    ]
    pool_pa = pa.array(pool, pa.large_string())
    lorem_pa = pc.take(pool_pa, pa.array(rng.integers(0, len(pool), n)))
    head = pc.binary_join_element_wise(
        pa.array(role, pa.string()),
        " turn ",
        pa.array(turn_idx.astype("U8"), pa.string()),
        " of ",
        pa.array(conv_id, pa.string()),
        ": ",
        "",
    )
    email = pc.binary_join_element_wise(
        " user", pa.array(rng.integers(0, 1000, n).astype("U4"), pa.string()), "@example.com", ""
    )
    text = pc.binary_join_element_wise(
        head.cast(pa.large_string()),
        lorem_pa,
        email.cast(pa.large_string()),
        pa.scalar("", pa.large_string()),
    )

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": text,
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=SCHEMA,
    )


def write_transcripts(
    path: str,
    n_convs: int = 50,
    mean_turns: int = 20,
    seed: int = 42,
    row_group_size: int = 8192,
    **kw,
) -> str:
    """Materialize transcripts to one Parquet file with small row groups so
    multiple input slices exist per file (exercises epoch/checkpoint logic).
    Idempotent: skips generation when the file already exists."""
    if os.path.exists(path):
        return path
    tbl = make_transcripts(n_convs=n_convs, mean_turns=mean_turns, seed=seed, **kw)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp, row_group_size=row_group_size)
    os.replace(tmp, path)
    return path


def write_transcripts_chunks(
    dir_path: str,
    n_files: int = 64,
    n_convs: int = 50,
    mean_turns: int = 20,
    seed: int = 42,
    **kw,
) -> str:
    """Materialize transcripts as a DIRECTORY of ``n_files`` chunk files.

    Ray Data's parquet read parallelism is per-file at this scale — a
    single multi-GB file decodes in one task and serializes the whole
    pipeline behind it (measured: flat ~4.5 s decode regardless of CPU
    count). Multi-file layout is also what a real transcript stream looks
    like (one file per arrival chunk). Idempotent."""
    done = os.path.join(dir_path, "_DONE")
    if os.path.exists(done):
        return dir_path
    tbl = make_transcripts(n_convs=n_convs, mean_turns=mean_turns, seed=seed, **kw)
    os.makedirs(dir_path, exist_ok=True)
    n = tbl.num_rows
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        tmp = os.path.join(dir_path, f".chunk-{i:05d}.tmp")
        pq.write_table(tbl.slice(lo, hi - lo), tmp, row_group_size=65536)
        os.replace(tmp, os.path.join(dir_path, f"chunk-{i:05d}.parquet"))
    with open(done, "w") as fh:
        fh.write(f"{n}\n")
    return dir_path
