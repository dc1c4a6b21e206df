"""gjson/sjson-style path addressing over Arrow tables.

The reference addresses event fields with gjson dot-paths (read) and sjson
(write) over raw JSON strings (see /root/reference/transform/add.go:14,
/root/reference/transform/rename.go:15-26). Here an event is a row of an
Arrow table: a top-level path is a column name; a nested path ``a.b`` is a
field of a struct column ``a`` (created on demand on write, like sjson).

All helpers are pure functions pa.Table -> pa.Table / array, vectorized,
usable inside ``map_batches(batch_format="pyarrow")`` with zero copies for
untouched columns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _combine(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def get_path(tbl: pa.Table, path: str) -> pa.ChunkedArray | pa.Array | None:
    """Read the value array at ``path``; None when the path is missing.

    Mirrors gjson.Get: a literal dotted column name wins over nested
    resolution (our planner flattens literal nested names into real
    columns when it can), then struct-field traversal.
    """
    names = tbl.column_names
    if path in names:
        return tbl.column(path)
    if "." in path:
        head, rest = path.split(".", 1)
        if head in names:
            col = tbl.column(head)
            if pa.types.is_struct(col.type):
                try:
                    return pc.struct_field(col, rest.split("."))
                except (KeyError, pa.ArrowInvalid):
                    return None
    return None


def _struct_set(arr: pa.Array, parts: list[str], value: pa.Array) -> pa.StructArray:
    """Rebuild a struct array with field ``parts`` replaced/created."""
    arr = _combine(arr)
    if not pa.types.is_struct(arr.type):
        # sjson overwrites a non-object intermediate with a fresh object
        return _nested_struct(parts, value)
    name = parts[0]
    fields: list[tuple[str, pa.Array]] = []
    replaced = False
    for i, f in enumerate(arr.type):
        child = arr.field(i)
        if f.name == name:
            replaced = True
            if len(parts) == 1:
                child = value
            else:
                child = _struct_set(child, parts[1:], value)
        fields.append((f.name, _combine(child)))
    if not replaced:
        child = value if len(parts) == 1 else _nested_struct(parts[1:], value)
        fields.append((name, _combine(child)))
    return pa.StructArray.from_arrays([a for _, a in fields], [n for n, _ in fields])


def _nested_struct(parts: list[str], value: pa.Array) -> pa.StructArray:
    """Build struct<parts[0]: struct<...: value>> (sjson creates intermediates)."""
    arr = _combine(value)
    for name in reversed(parts):
        arr = pa.StructArray.from_arrays([arr], [name])
    return arr


def set_path(tbl: pa.Table, path: str, value: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Upsert ``path`` = value (per-row array). sjson.Set semantics:
    overwrites existing, creates intermediate objects for nested paths.

    A literal dotted name that already exists as a column is updated in
    place; otherwise ``a.b`` targets struct column ``a``.
    """
    value = _combine(value) if isinstance(value, pa.ChunkedArray) else value
    names = tbl.column_names
    if path in names:
        return tbl.set_column(names.index(path), path, value)
    if "." in path:
        head, rest = path.split(".", 1)
        parts = rest.split(".")
        if head in names:
            col = _combine(tbl.column(head))
            if pa.types.is_struct(col.type):
                new = _struct_set(col, parts, value)
                return tbl.set_column(names.index(head), head, new)
            # non-object intermediate: replaced wholesale with a new object
            new = _nested_struct(parts, value)
            return tbl.set_column(names.index(head), head, new)
        return tbl.append_column(head, _nested_struct(parts, value))
    return tbl.append_column(path, value)


def del_path(tbl: pa.Table, path: str) -> pa.Table:
    """Delete field at ``path``; no-op when missing (sjson.Delete)."""
    names = tbl.column_names
    if path in names:
        return tbl.drop_columns([path])
    if "." in path:
        head, rest = path.split(".", 1)
        if head in names:
            col = _combine(tbl.column(head))
            if pa.types.is_struct(col.type):
                new = _struct_del(col, rest.split("."))
                if new is None:  # struct emptied out entirely
                    return tbl.drop_columns([head])
                return tbl.set_column(names.index(head), head, new)
    return tbl


def _struct_del(arr: pa.StructArray, parts: list[str]) -> pa.StructArray | None:
    name = parts[0]
    fields: list[tuple[str, pa.Array]] = []
    for i, f in enumerate(arr.type):
        child = _combine(arr.field(i))
        if f.name == name:
            if len(parts) == 1:
                continue
            if pa.types.is_struct(child.type):
                sub = _struct_del(child, parts[1:])
                if sub is None:
                    continue
                child = sub
        fields.append((f.name, child))
    if not fields:
        return None
    return pa.StructArray.from_arrays([a for _, a in fields], [n for n, _ in fields])


def string_form(arr: pa.ChunkedArray | pa.Array | None, n: int) -> pa.Array:
    """The gjson ``.String()`` view of a value: missing/null -> "" and
    non-strings rendered as their JSON text (bools as true/false).

    Used by filter_regexp / mask, which operate on the string form
    (/root/reference/transform/filter_regexp.go:19,
    /root/reference/transform/mask.go:24).
    """
    if arr is None:
        return pa.nulls(n, pa.string()).fill_null("")
    arr = _combine(arr)
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        out = arr
    elif pa.types.is_boolean(t):
        out = pc.if_else(arr, "true", "false")
    elif pa.types.is_floating(t):
        # render 42.0 as "42" like JSON/gjson does for integral floats
        ints = pc.cast(arr, pa.int64(), safe=False)
        is_intval = pc.equal(pc.cast(ints, t, safe=False), arr)
        out = pc.if_else(is_intval, pc.cast(ints, pa.string()), pc.cast(arr, pa.string()))
    else:
        out = pc.cast(arr, pa.string(), safe=False)
    return _combine(out.fill_null(""))
