"""Property-based checks (SURVEY.md §5.2 item 3): for the same input SET
and final watermark, the streaming engine's closed-window outputs must
not depend on arrival order or chunking."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from vaero_ray.sources.transcripts import make_transcripts
from vaero_ray.stages.windows import AggSpec, windowed_aggregate
from vaero_ray.streaming import StreamingWindowedJob


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), ignore_index=True)[sorted(df.columns)]


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(0, 1_000_000),
    n_files=st.integers(2, 5),
    permute=st.permutations(list(range(5))),
)
def test_closed_windows_invariant_to_chunking_and_order(seed, n_files, permute, tmp_path_factory, ray_session):
    """Any chunking and any ARRIVAL order of the same rows (with
    unbounded lateness so nothing is dropped) must converge to the batch
    answer."""
    import ray.data as rd

    base = tmp_path_factory.mktemp("prop")
    tbl = make_transcripts(n_convs=20, mean_turns=8, seed=seed, disorder_frac=0.3)
    n = tbl.num_rows
    d = str(base / "in")
    os.makedirs(d)
    cuts = [i * n // n_files for i in range(n_files + 1)]
    order = [p for p in permute if p < n_files]
    for out_i, src_i in enumerate(order):
        pq.write_table(
            tbl.slice(cuts[src_i], cuts[src_i + 1] - cuts[src_i]),
            os.path.join(d, f"chunk-{out_i:04d}.parquet"),
        )
    job = StreamingWindowedJob(
        input_dir=d,
        out_dir=str(base / "out"),
        ckpt_dir=str(base / "ckpt"),
        keys=["role"],
        aggs=[AggSpec(None, "count", "n"), AggSpec("ts", "min", "first_ts")],
        ts_col="ts",
        size_s=300,
        allowed_lateness_s=1 << 40,  # unbounded: nothing may drop
        num_partitions=2,
    )
    ms = job.run()
    assert sum(m.rows_late for m in ms) == 0
    got = _norm(job.committed_output().to_pandas())
    want = _norm(
        windowed_aggregate(
            rd.from_arrow(tbl),
            keys=["role"],
            aggs=[AggSpec(None, "count", "n"), AggSpec("ts", "min", "first_ts")],
            ts_col="ts",
            size_s=300,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(want, got, check_dtype=False)
