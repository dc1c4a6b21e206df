"""Pure-Python oracle interpreter for the Vaero transform semantics.

An independent reimplementation of the reference's per-event Go transforms
(gjson/sjson behavior over dicts instead of JSON strings; see SURVEY.md
§2a and /root/reference/transform/*.go). Used as the row-for-row oracle the
Ray engine is compared against. No Arrow, no Ray — just dicts.
"""

from __future__ import annotations

import re
from typing import Any


def get_path(event: dict, path: str):
    if path in event:
        return event[path]
    cur: Any = event
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def set_path(event: dict, path: str, value) -> None:
    if path in event:
        event[path] = value
        return
    parts = path.split(".")
    cur = event
    for p in parts[:-1]:
        if not isinstance(cur.get(p), dict):
            cur[p] = {}
        cur = cur[p]
    cur[parts[-1]] = value


def del_path(event: dict, path: str) -> None:
    if path in event:
        del event[path]
        return
    parts = path.split(".")
    cur = event
    for p in parts[:-1]:
        if not isinstance(cur.get(p), dict):
            return
        cur = cur[p]
    cur.pop(parts[-1], None)


def string_form(v) -> str:
    """gjson .String() of a value: nil -> "", bools lowercase, integral
    floats without the trailing .0 (JSON number text)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    return str(v)


def _go_repl_to_py(pattern: str, repl: str) -> str:
    """Go $1/${name} replacement template -> Python re \\g<> syntax."""
    def sub(m):
        ref = m.group(1)
        if ref == "$":
            return "$"
        if ref.startswith("{") and ref.endswith("}"):
            ref = ref[1:-1]
        try:
            re.compile(pattern).groupindex
        except re.error:
            pass
        if ref.isdigit():
            return f"\\g<{ref}>"
        gi = re.compile(pattern).groupindex
        if ref in gi:
            return f"\\g<{gi[ref]}>"
        return ""
    return re.sub(r"\$(\$|\d+|\{\w+\}|\w+)", sub, repl.replace("\\", "\\\\"))


def apply_op(events: list[dict], op: str, args: dict) -> list[dict]:
    out: list[dict] = []
    for ev in events:
        ev = _deepcopy(ev)
        if op == "add":
            set_path(ev, args["path"], args["value"])
        elif op == "delete":
            del_path(ev, args["path"])
        elif op == "rename":
            v = get_path(ev, args["path"])
            set_path(ev, args["new_path"], v)
            del_path(ev, args["path"])  # sjson.Delete: no-op when missing
        elif op == "filter_regexp":
            s = string_form(get_path(ev, args["path"]))
            if not re.search(args["regex"], s):
                continue
        elif op == "mask":
            s = string_form(get_path(ev, args["path"]))
            set_path(ev, args["path"], re.sub(args["regex"], _go_repl_to_py(args["regex"], args["replace_expr"]), s))
        elif op == "parse_regexp":
            s = string_form(get_path(ev, args["path"]))
            m = re.search(args["regex"], s)
            gi = re.compile(args["regex"]).groupindex
            for name in gi:
                ev[name] = m.group(name) if m else None
        elif op == "select":
            leaf = args["path"].rsplit(".", 1)[-1]
            ev = {leaf: string_form(get_path(ev, args["path"]))}
        else:
            raise ValueError(op)
        out.append(ev)
    return out


def run_chain(events: list[dict], ops: list[tuple[str, dict]]) -> list[dict]:
    for op, args in ops:
        events = apply_op(events, op, args)
    return events


def _deepcopy(ev):
    return {k: (_deepcopy(v) if isinstance(v, dict) else v) for k, v in ev.items()}
