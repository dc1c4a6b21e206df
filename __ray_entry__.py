"""Driver contract for the vaero_ray engine.

The driver initialises Ray BEFORE importing this module; nothing here (or
in the vaero_ray package) calls ray.init/ray.shutdown.

- ``entry()``: flagship windowed transform+route pipeline over
  /root/testdata/sf0.001 (see vaero_ray/pipelines/queries.py
  q_flagship_windowed_route).
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 (reference transforms §2a, window/stitch tier §2b, plus
  the training-data tier: dedup family, text stats, ANN, vocabulary,
  sequence packing, decontamination, multimodal features).
- ``oracle_sql()``: DuckDB-equivalent SQL over the pre-registered
  testdata views — one oracle per queries() entry (round 2 closed the
  hash-family/multimodal gap: signatures, band conditions, closed-form
  fake codecs and integer outputs are all recomputed in SQL from first
  principles).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from vaero_ray.pipelines.queries import q_flagship_windowed_route

    return q_flagship_windowed_route("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from vaero_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from vaero_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
