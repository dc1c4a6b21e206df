"""Task-graph JSON IR -> logical plan.

The reference decodes the same IR into ``[]OpTask`` and interprets it
sequentially per capsule, copying the event list at each fan-out
(/root/reference/cmd/util.go:508-538 decode;
/root/reference/execute/transformNode.go:36-57 branch copy). Our planner
instead flattens the graph into BRANCHES: every root-to-sink chain becomes
one branch carrying the full fused transform list, so each branch is a
single zero-copy ``map_batches`` stage over the shared source Dataset —
fan-out "copies" are replaced by Ray object-store block sharing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

from vaero_ray.transforms import TransformFn, compile_chain, output_schema


@dataclass
class SinkSpec:
    op: str
    args: dict[str, Any]


@dataclass
class SourceSpec:
    op: str
    args: dict[str, Any]
    secret: dict[str, Any] | None = None


@dataclass
class RelStep:
    """One relational/window-tier node (the ``"rel"`` IR type): a
    dataset-level operation that breaks the fused per-block transform
    chain — window aggregate, join (with a nested right-side Plan), or
    exact dedup. Executed by the runner via the existing stage functions
    (stages/windows.py, stages/joins.py, stages/dedup.py)."""

    op: str
    args: dict[str, Any]
    right: "Plan | None" = None


@dataclass
class Branch:
    """One root-to-sink chain: ordered steps + terminal sink.

    ``steps`` is the ordered execution plan: maximal runs of per-row
    transforms fused into one ``("tn", [(op, args), ...])`` segment (one
    zero-copy map_batches each), interleaved with :class:`RelStep`
    entries. ``transforms`` keeps the flat transform view for the common
    all-``tn`` branch (and is what :meth:`compile` fuses)."""

    transforms: list[tuple[str, dict[str, Any]]] = field(default_factory=list)
    sink: SinkSpec | None = None
    steps: list[Any] = field(default_factory=list)

    def __post_init__(self):
        if not self.steps and self.transforms:
            self.steps = [("tn", list(self.transforms))]

    @property
    def has_rel(self) -> bool:
        return any(isinstance(s, RelStep) for s in self.steps)

    def compile(self) -> TransformFn:
        if self.has_rel:
            raise ValueError(
                "branch contains relational steps (window/join/dedup); "
                "execute via runner.apply_steps, not a single fused chain"
            )
        return compile_chain(self.transforms)

    def out_schema(self, input_schema: pa.Schema) -> pa.Schema:
        return output_schema(self.compile(), input_schema)


@dataclass
class Plan:
    source: SourceSpec | None
    branches: list[Branch]


def _make_branch(chain: list[Any], sink: SinkSpec | None) -> Branch:
    """Group a mixed chain (tn tuples + RelStep) into fused segments."""
    steps: list[Any] = []
    transforms: list[tuple[str, dict[str, Any]]] = []
    for item in chain:
        if isinstance(item, RelStep):
            steps.append(item)
        else:
            transforms.append(item)
            if steps and isinstance(steps[-1], tuple) and steps[-1][0] == "tn":
                steps[-1][1].append(item)
            else:
                steps.append(("tn", [item]))
    return Branch(transforms, sink, steps)


def plan_graph(graph: list) -> Plan:
    """Compile the array IR (possibly with nested fan-out lists) to a Plan."""
    source: SourceSpec | None = None
    branches: list[Branch] = []

    def walk(nodes: list, prefix: list[Any]) -> None:
        nonlocal source
        chain = list(prefix)
        terminal = False
        for node in nodes:
            if isinstance(node, list):
                # fan-out: list of sub-chains, each continues this prefix
                for sub in node:
                    walk(sub, chain)
                terminal = True
                break
            ntype = node.get("type")
            if ntype == "source":
                if source is not None:
                    raise ValueError("multiple sources in one task graph")
                source = SourceSpec(node["op"], dict(node.get("args", {})), node.get("secret"))
            elif ntype == "tn":
                chain.append((node["op"], dict(node.get("args", {}))))
            elif ntype == "rel":
                right = None
                if node.get("right") is not None:
                    right = plan_graph(node["right"])
                    if right.source is None:
                        raise ValueError("join right side has no source")
                    if not right.branches:  # bare source, no transforms
                        right.branches = [Branch([], None)]
                    if len(right.branches) != 1 or right.branches[0].sink is not None:
                        raise ValueError(
                            "join right side must be a single sinkless chain"
                        )
                chain.append(RelStep(node["op"], dict(node.get("args", {})), right))
            elif ntype == "sink":
                branches.append(_make_branch(chain, SinkSpec(node["op"], dict(node.get("args", {})))))
                terminal = True
                # reference allows nothing after a sink within one chain
                break
            else:
                raise ValueError(f"unknown node type: {ntype!r}")
        if not terminal and chain != prefix:
            # chain of transforms with no sink: events are dropped by the
            # reference; keep as a sinkless branch so callers can inspect it
            branches.append(_make_branch(chain, None))

    walk(graph, [])
    return Plan(source, branches)


class Planner:
    """Convenience wrapper: DSL graph -> Plan -> compiled branch fns."""

    def __init__(self, graph: list):
        self.plan = plan_graph(graph)

    @property
    def source(self) -> SourceSpec | None:
        return self.plan.source

    @property
    def branches(self) -> list[Branch]:
        return self.plan.branches

    def compiled(self) -> list[tuple[TransformFn, SinkSpec | None]]:
        return [(b.compile(), b.sink) for b in self.plan.branches]
