"""The seven Vaero transforms as pure, vectorized pyarrow.Table kernels.

Reference semantics (Go, per-event over JSON strings; dispatcher at
/root/reference/execute/transformNode.go:18-35):

  add            transform/add.go:13-29        upsert literal at path
  delete         transform/delete.go:13-29     drop field; no-op if missing
  rename         transform/rename.go:14-41     get -> set new -> delete old;
                                               missing source => new_path=null
  filter_regexp  transform/filter_regexp.go:13-31  keep iff RE2 matches anywhere
                                               in string form; missing => ""
  mask           transform/mask.go:16-43       ReplaceAll on string form;
                                               missing path => field created ""
  parse_regexp   transform/parse_regexp.go:16-47  named groups -> new top-level
                                               fields (reference panics on
                                               non-match; we emit nulls —
                                               documented deviation)
  select         transform/select.go:11-23     event := string value at path

Each kernel is a pure function ``(pa.Table, **args) -> pa.Table`` so it can
be unit-tested without Ray and fused into a single ``map_batches`` stage by
``compile_chain`` (one Python-call per batch for a whole transform chain —
the Ray-Data analogue of the reference's sequential per-capsule loop).

Go regex replacement syntax uses ``$1`` / ``${name}`` group refs
(regexp.ReplaceAllString); Arrow's RE2 rewrite uses ``\\1``. The planner
translates via ``go_replacement_to_re2`` (both engines are RE2, so pattern
syntax itself is identical).
"""

from __future__ import annotations

import re
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

from vaero_ray.paths import del_path, get_path, set_path, string_form

TransformFn = Callable[[pa.Table], pa.Table]


def _literal_array(value: Any, n: int) -> pa.Array:
    """A length-n constant array for an `add` literal (any JSON value)."""
    if value is None:
        return pa.nulls(n)
    scalar = pa.scalar(value)
    if n == 0:
        return pa.nulls(0, scalar.type)
    return pa.repeat(scalar, n)


def add(tbl: pa.Table, path: str, value: Any) -> pa.Table:
    """Upsert ``path`` = literal ``value`` (transform/add.go:13-29)."""
    return set_path(tbl, path, _literal_array(value, tbl.num_rows))


def delete(tbl: pa.Table, path: str) -> pa.Table:
    """Remove field at ``path``; no-op when missing (transform/delete.go:13-29)."""
    return del_path(tbl, path)


def rename(tbl: pa.Table, path: str, new_path: str) -> pa.Table:
    """get(path) -> set(new_path) -> delete(path) (transform/rename.go:14-41).

    Missing source path: gjson yields nil, sjson sets null => the output
    gains ``new_path`` as an all-null column (reproduced here).
    """
    val = get_path(tbl, path)
    if val is None:
        return set_path(tbl, new_path, pa.nulls(tbl.num_rows))
    # fast path: plain top-level column-to-column rename
    if path in tbl.column_names and "." not in new_path and new_path not in tbl.column_names:
        names = [new_path if c == path else c for c in tbl.column_names]
        return tbl.rename_columns(names)
    tbl = set_path(tbl, new_path, val)
    return del_path(tbl, path)


def filter_regexp(tbl: pa.Table, path: str, regex: str) -> pa.Table:
    """Keep rows where RE2 ``regex`` matches anywhere in the string form of
    the value at ``path`` (transform/filter_regexp.go:13-31; unanchored
    regexp.MatchString). Missing path matches only regexes matching ""."""
    col = string_form(get_path(tbl, path), tbl.num_rows)
    mask_arr = pc.match_substring_regex(col, regex)
    return tbl.filter(mask_arr)


def mask(tbl: pa.Table, path: str, regex: str, replace_expr: str) -> pa.Table:
    """Replace every match of ``regex`` in the string form of ``path`` with
    ``replace_expr`` (Go ReplaceAllString, transform/mask.go:16-43), writing
    the result back as a string field. Missing path => field is created
    (with the result of replacing over "")."""
    col = string_form(get_path(tbl, path), tbl.num_rows)
    out = pc.replace_substring_regex(col, regex, go_replacement_to_re2(regex, replace_expr))
    return set_path(tbl, path, out)


def parse_regexp(tbl: pa.Table, path: str, regex: str) -> pa.Table:
    """Each named capture group becomes a new top-level field holding the
    matched substring (transform/parse_regexp.go:16-47). The reference
    panics on a non-matching event (FindStringSubmatch nil deref at
    parse_regexp.go:30); we emit null-filled group fields instead —
    documented deviation, covered by tests."""
    col = string_form(get_path(tbl, path), tbl.num_rows)
    struct = pc.extract_regex(col, regex)
    for field in struct.type:
        tbl = set_path(tbl, field.name, pc.struct_field(struct, field.name))
    return tbl


def parse_json(tbl: pa.Table, path: str) -> pa.Table:
    """Parse the JSON string at ``path``; every top-level key of the
    parsed object becomes a field (nested objects land as struct columns
    the path helpers can traverse) — the columnar form of the reference's
    JSON event model (events ARE gjson/sjson documents,
    transform/add.go:13-29), extending parse_regexp's groups->fields
    contract to structured payloads.

    VECTORIZED: the whole batch is parsed in ONE pyarrow C++ NDJSON read
    (rows joined with newlines via Arrow kernels — no per-row Python
    json.loads). Requires one-object-per-row JSON values; nulls/empties
    parse as ``{}``; invalid JSON fails the batch loudly (the reference's
    gjson silently yields empty — documented deviation, tested)."""
    import io

    from pyarrow import json as pa_json

    col = string_form(get_path(tbl, path), tbl.num_rows)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not tbl.num_rows:
        return tbl
    empty = pc.equal(pc.utf8_trim_whitespace(pc.fill_null(col, "{}")), "")
    col = pc.if_else(empty, pa.scalar("{}"), pc.fill_null(col, "{}"))
    # raw newlines are illegal INSIDE JSON strings, so flattening
    # pretty-printed objects to one line is lossless
    col = pc.replace_substring(col, "\n", " ")
    one = pa.ListArray.from_arrays(pa.array([0, len(col)], pa.int32()), col)
    blob = pc.binary_join(one, "\n")[0].as_py().encode()
    parsed = pa_json.read_json(io.BytesIO(blob))
    if parsed.num_rows != tbl.num_rows:
        raise ValueError(
            f"parse_json: {path} parsed to {parsed.num_rows} rows for "
            f"{tbl.num_rows} inputs (multi-line JSON values?)"
        )
    for name in parsed.column_names:
        tbl = set_path(tbl, name, parsed.column(name))
    return tbl


def select(tbl: pa.Table, path: str) -> pa.Table:
    """Replace the whole event with the string value at ``path``
    (transform/select.go:11-23): the output is a single string column named
    after the path leaf; downstream sinks write raw values."""
    col = string_form(get_path(tbl, path), tbl.num_rows)
    leaf = path.rsplit(".", 1)[-1]
    return pa.table({leaf: col})


_GO_GROUP_REF = re.compile(r"\$(\$|\d+|\{\w+\}|\w+)")


def go_replacement_to_re2(pattern: str, replacement: str) -> str:
    """Translate a Go regexp.ReplaceAllString template to RE2 rewrite syntax.

    Go: ``$1``, ``${name}``, ``$name``, ``$$`` literal dollar.
    Arrow/RE2 rewrite: ``\\1`` ... ``\\9`` only. Named refs are resolved to
    their group index via the pattern's group table. Backslashes are escaped
    so they stay literal in the RE2 rewrite."""
    try:
        groupindex = re.compile(pattern).groupindex
    except re.error:
        groupindex = {}

    replacement = replacement.replace("\\", "\\\\")

    def sub(m: re.Match) -> str:
        ref = m.group(1)
        if ref == "$":
            return "$"
        if ref.startswith("{") and ref.endswith("}"):
            ref = ref[1:-1]
        if ref.isdigit():
            return "\\" + ref
        idx = groupindex.get(ref)
        if idx is not None:
            return f"\\{idx}"
        # Go resolves unknown names to empty string
        return ""

    return _GO_GROUP_REF.sub(sub, replacement)


_KERNELS: dict[str, Callable[..., pa.Table]] = {
    "add": add,
    "delete": delete,
    "rename": rename,
    "filter_regexp": filter_regexp,
    "mask": mask,
    "parse_regexp": parse_regexp,
    "parse_json": parse_json,
    "select": select,
}


def kernel(op: str) -> Callable[..., pa.Table]:
    try:
        return _KERNELS[op]
    except KeyError:
        raise ValueError(f"unknown transform op: {op!r}") from None


def compile_chain(ops: list[tuple[str, dict[str, Any]]]) -> TransformFn:
    """Fuse an ordered transform chain into ONE batch function.

    ``ops`` is ``[(op_name, args), ...]`` with args exactly as in the task
    graph (the DSL stores regexes under key "regex", vaero/stream.py:57-70).
    The fused function runs all kernels sequentially over one Arrow batch —
    a single map_batches stage per branch, zero-copy for untouched columns.

    Regex args are validated HERE, at plan time, so a bad pattern fails
    fast on the driver instead of deep inside a Ray task.
    """
    probe = pa.array([""], pa.string())
    for op, args in ops:
        if "regex" in args:
            try:  # validate against the engine that will run it (RE2)
                pc.match_substring_regex(probe, args["regex"])
            except pa.ArrowInvalid as e:
                raise ValueError(f"{op}: invalid regex {args['regex']!r}: {e}") from None
    bound = [(kernel(op), dict(args)) for op, args in ops]

    def fused(tbl: pa.Table) -> pa.Table:
        for fn, args in bound:
            tbl = fn(tbl, **args)
        return tbl

    return fused


def output_schema(fn: TransformFn, input_schema: pa.Schema) -> pa.Schema:
    """Static schema propagation: every kernel is schema-deterministic, so
    running the fused chain over a zero-row table of the input schema yields
    the exact output schema (used by the planner and the streaming shell to
    keep epochs schema-consistent even for empty micro-batches)."""
    empty = input_schema.empty_table()
    return fn(empty).schema
