"""vaero_ray — a Ray-Data-native streaming log/transcript pipeline engine.

A from-scratch engine with the query/data-processing capabilities of
vaerohq/vaero (tap -> transform -> route -> sink over event streams),
re-expressed Ray-Data-first:

- stateless per-event transforms are zero-copy Arrow ``map_batches`` stages
  (`vaero_ray.transforms`),
- the fluent pipeline DSL (`vaero_ray.dsl.Vaero`) produces the same JSON
  task-graph IR as the reference (see /root/reference/vaero/stream.py),
  compiled by `vaero_ray.planner` into Ray Data pipelines,
- windows / watermarks / stateful turn-stitch joins live in
  `vaero_ray.stages`,
- the exactly-once checkpointed Parquet sink and the micro-batch streaming
  shell live in `vaero_ray.streaming` and `vaero_ray.sinks`.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (tests, bench.py, CLI).
"""

from vaero_ray.dsl import Vaero
from vaero_ray.planner import Planner, plan_graph
from vaero_ray.runner import run_batch

__all__ = ["Vaero", "Planner", "plan_graph", "run_batch"]
