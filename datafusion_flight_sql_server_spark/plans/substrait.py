"""Minimal Substrait plan consumer: read/project/fetch subset → SQL text.

The reference consumes serialized Substrait plans
(reference: datafusion-flight-sql-server/src/service.rs:349-386 GetFlightInfo,
service.rs:274-303 DoGet, service.rs:1018-1029 ``parse_substrait_bytes``) by
handing them to DataFusion's full consumer. Spark has no Substrait consumer,
so this module closes the gap the Spark-first way: decode the (public,
substrait.io) protobuf wire format directly — the same hand-rolled-codec
discipline as ``protocol/wire.py`` — and **unparse the plan to SQL text**
for the existing statement path, where Catalyst plans it natively.

Scope is deliberately a strict subset, with everything else rejected by a
descriptive ``SubstraitUnsupported`` (mapped to NOT_IMPLEMENTED at the
Flight boundary, like every other stub):

- one plan relation: ``RelRoot``/``Rel`` over ``[FetchRel?] [ProjectRel?]
  ReadRel``;
- ``ReadRel`` must read a ``NamedTable`` (no virtual tables / local files),
  with no filter and no mask projection;
- ``ProjectRel`` expressions must be direct struct-field references
  (``FieldReference.direct_reference.struct_field`` with no nested child),
  with optional ``RelCommon.emit`` output remapping;
- ``FetchRel`` must carry a literal count (→ ``LIMIT``) and no offset;
- ``RelRoot.names`` become output aliases.

That covers the projection/limit class of plans ADBC/JDBC-over-Substrait
front-ends emit for schema probes and simple scans; joins, filters,
aggregates, expressions and DML are rejected with a message naming the
unsupported construct. Field numbers below come from the public
``substrait/plan.proto`` / ``algebra.proto`` / ``type.proto``.
"""

from __future__ import annotations

from datafusion_flight_sql_server_spark.protocol.wire import decode_varint

WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_I32 = 5


class SubstraitUnsupported(NotImplementedError):
    """Plan uses a construct outside the consumed subset."""


class SubstraitMalformed(ValueError):
    """Bytes are not a decodable Substrait plan."""


def _fields(data: bytes) -> dict[int, list[tuple[int, object]]]:
    """Parse one protobuf message into {field_number: [(wire_type, raw)]}.

    Raw values: varint → int, length-delimited → bytes. Keeping every field
    (not just expected ones) is what lets the interpreters below REJECT an
    unsupported oneof arm by name instead of silently ignoring it.
    """
    out: dict[int, list[tuple[int, object]]] = {}
    pos = 0
    try:
        while pos < len(data):
            key, pos = decode_varint(data, pos)
            num, wt = key >> 3, key & 0x7
            if wt == WT_VARINT:
                value, pos = decode_varint(data, pos)
            elif wt == WT_LEN:
                length, pos = decode_varint(data, pos)
                if pos + length > len(data):
                    raise ValueError("truncated length-delimited field")
                value = data[pos : pos + length]
                pos += length
            elif wt == WT_I32:
                value = data[pos : pos + 4]
                pos += 4
            elif wt == WT_I64:
                value = data[pos : pos + 8]
                pos += 8
            else:
                raise ValueError(f"unsupported wire type {wt}")
            out.setdefault(num, []).append((wt, value))
    except ValueError as exc:
        raise SubstraitMalformed(f"malformed Substrait bytes: {exc}") from exc
    return out


def _one(fields, num):
    vals = fields.get(num)
    return vals[-1][1] if vals else None


def _strings(fields, num) -> list[str]:
    try:
        return [v.decode("utf-8") for _, v in fields.get(num, [])]
    except UnicodeDecodeError as exc:  # pragma: no cover - garbage bytes
        raise SubstraitMalformed(f"non-UTF-8 string field {num}") from exc


def _packed_ints(fields, num) -> list[int]:
    """Repeated int32, accepting both packed and unpacked encodings."""
    out: list[int] = []
    for wt, v in fields.get(num, []):
        if wt == WT_VARINT:
            out.append(int(v))
        elif wt == WT_LEN:
            pos = 0
            while pos < len(v):
                value, pos = decode_varint(v, pos)
                out.append(value)
    return out


def _quote(name: str) -> str:
    """Spark backtick-quoted identifier (the SQL goes to our own engine)."""
    return "`" + name.replace("`", "``") + "`"


# -- relation interpreters ---------------------------------------------------

#: algebra.proto Rel oneof arms we refuse, by field number, for messages.
_REL_ARMS = {
    1: "read",
    2: "filter",
    3: "fetch",
    4: "aggregate",
    5: "sort",
    6: "join",
    7: "project",
    8: "set",
    9: "extension_single",
    10: "extension_multi",
    11: "extension_leaf",
    12: "cross",
}


def _read_rel(read: bytes) -> tuple[str, list[str]]:
    """ReadRel → (FROM clause, input column names)."""
    f = _fields(read)
    for num, label in ((3, "read filter"), (11, "best-effort filter"), (4, "mask projection")):
        if num in f:
            raise SubstraitUnsupported(
                f"Substrait consumer: ReadRel {label} is not supported; "
                f"send SQL text instead"
            )
    for num, label in ((5, "virtual_table"), (6, "local_files"), (8, "extension_table")):
        if num in f:
            raise SubstraitUnsupported(
                f"Substrait consumer: ReadRel read type {label!r} is not "
                f"supported (only named_table)"
            )
    named = _one(f, 7)
    if named is None:
        raise SubstraitUnsupported(
            "Substrait consumer: ReadRel without named_table is not supported"
        )
    names = _strings(_fields(named), 1)
    if not names:
        raise SubstraitMalformed("NamedTable carries no name")
    table = ".".join(_quote(n) for n in names)

    cols: list[str] = []
    base_schema = _one(f, 2)
    if base_schema is not None:
        cols = _strings(_fields(base_schema), 1)  # NamedStruct.names
    return table, cols


def _field_ref_index(expr: bytes) -> int:
    """Expression → index of a direct struct-field reference, or reject."""
    f = _fields(expr)
    sel = _one(f, 2)  # Expression.selection (FieldReference)
    if sel is None:
        arms = {1: "literal", 3: "scalar_function", 5: "window_function",
                6: "if_then", 11: "cast", 12: "subquery"}
        present = [arms.get(n, f"expression field {n}") for n in f]
        raise SubstraitUnsupported(
            f"Substrait consumer: only direct field references are supported "
            f"in projections; got {', '.join(present) or 'empty expression'}"
        )
    ref = _fields(sel)
    direct = _one(ref, 1)  # FieldReference.direct_reference (ReferenceSegment)
    if direct is None:
        raise SubstraitUnsupported(
            "Substrait consumer: only direct_reference field references are "
            "supported"
        )
    seg = _fields(direct)
    struct_field = _one(seg, 2)  # ReferenceSegment.struct_field
    if struct_field is None:
        raise SubstraitUnsupported(
            "Substrait consumer: only struct_field reference segments are "
            "supported"
        )
    sf = _fields(struct_field)
    if _one(sf, 2) is not None:  # nested child segment
        raise SubstraitUnsupported(
            "Substrait consumer: nested field references are not supported"
        )
    idx = _one(sf, 1)
    return int(idx or 0)


def _emit_mapping(common: bytes | None) -> list[int] | None:
    """RelCommon → emit output_mapping (None = direct emit)."""
    if common is None:
        return None
    f = _fields(common)
    emit = _one(f, 2)
    if emit is None:
        return None
    return _packed_ints(_fields(emit), 1)


def _interpret_rel(rel: bytes) -> tuple[str, list[str], int | None]:
    """Rel → (FROM clause, output column names, limit)."""
    f = _fields(rel)
    present = [n for n in f if n in _REL_ARMS]
    if len(present) != 1:
        names = ", ".join(_REL_ARMS.get(n, str(n)) for n in sorted(f))
        raise SubstraitUnsupported(
            f"Substrait consumer: expected exactly one relation arm, got "
            f"[{names or 'none'}]"
        )
    arm = present[0]
    kind = _REL_ARMS[arm]
    body = _one(f, arm)

    if kind == "read":
        table, cols = _read_rel(body)
        return table, cols, None

    if kind == "project":
        pf = _fields(body)
        inp = _one(pf, 2)
        if inp is None:
            raise SubstraitMalformed("ProjectRel without input")
        table, in_cols, limit = _interpret_rel(inp)
        exprs = [_field_ref_index(v) for _, v in pf.get(3, [])]

        def col_at(i: int) -> str:
            if i < len(in_cols):
                return in_cols[i]
            raise SubstraitUnsupported(
                f"Substrait consumer: field reference {i} is out of range "
                f"for the read schema ({len(in_cols)} columns)"
            )

        # ProjectRel output = input columns ++ expression columns; emit
        # remaps over that concatenation (RelCommon.Emit semantics).
        combined = list(in_cols) + [col_at(i) for i in exprs]
        emit = _emit_mapping(_one(pf, 1))
        if emit is None:
            out_cols = combined
        else:
            try:
                out_cols = [combined[i] for i in emit]
            except IndexError as exc:
                raise SubstraitMalformed(
                    f"emit mapping {emit} out of range for {len(combined)} "
                    f"columns"
                ) from exc
        return table, out_cols, limit

    if kind == "fetch":
        ff = _fields(body)
        inp = _one(ff, 2)
        if inp is None:
            raise SubstraitMalformed("FetchRel without input")
        if _one(ff, 3):  # non-zero offset
            raise SubstraitUnsupported(
                "Substrait consumer: FetchRel offset is not supported"
            )
        if 6 in ff or 5 in ff:  # count_expr / offset_expr arms
            raise SubstraitUnsupported(
                "Substrait consumer: FetchRel expression offsets/counts are "
                "not supported (literal count only)"
            )
        table, cols, _ = _interpret_rel(inp)
        count = _one(ff, 4)
        if count is None:
            raise SubstraitUnsupported(
                "Substrait consumer: FetchRel without a literal count"
            )
        return table, cols, int(count)

    raise SubstraitUnsupported(
        f"Substrait consumer: relation type {kind!r} is not supported "
        f"(supported: read of a named table, project of direct field "
        f"references, fetch with a literal count); send SQL text instead"
    )


def substrait_to_sql(plan_bytes: bytes) -> str:
    """Translate serialized ``substrait.Plan`` bytes to a SQL statement.

    Raises ``SubstraitUnsupported`` for plans outside the subset and
    ``SubstraitMalformed`` for undecodable bytes.
    """
    if not plan_bytes:
        raise SubstraitMalformed("empty Substrait plan")
    plan = _fields(plan_bytes)
    relations = plan.get(3, [])  # Plan.relations
    if len(relations) != 1:
        raise SubstraitUnsupported(
            f"Substrait consumer: expected exactly 1 plan relation, got "
            f"{len(relations)}"
        )
    plan_rel = _fields(relations[0][1])
    root = _one(plan_rel, 2)  # PlanRel.root (RelRoot)
    if root is not None:
        rf = _fields(root)
        rel = _one(rf, 1)
        if rel is None:
            raise SubstraitMalformed("RelRoot without input relation")
        out_names = _strings(rf, 2)
    else:
        rel = _one(plan_rel, 1)  # PlanRel.rel (no output names)
        if rel is None:
            raise SubstraitMalformed("PlanRel carries neither rel nor root")
        out_names = []

    table, cols, limit = _interpret_rel(rel)

    if not cols:
        select = "*"
        if out_names:
            raise SubstraitUnsupported(
                "Substrait consumer: RelRoot names without a readable "
                "column list (ReadRel.base_schema) are not supported"
            )
    else:
        if out_names and len(out_names) != len(cols):
            raise SubstraitMalformed(
                f"RelRoot names arity {len(out_names)} != output arity "
                f"{len(cols)}"
            )
        parts = []
        for i, col in enumerate(cols):
            if out_names and out_names[i] != col:
                parts.append(f"{_quote(col)} AS {_quote(out_names[i])}")
            else:
                parts.append(_quote(col))
        select = ", ".join(parts)

    sql = f"SELECT {select} FROM {table}"
    if limit is not None:
        sql += f" LIMIT {int(limit)}"
    return sql
