"""DataFusion-dialect SQL compatibility shim (pre-gate rewrite).

The reference hands every statement to DataFusion's own parser verbatim
(datafusion-flight-sql-server/src/service.rs:171 — ``ctx.sql(query)``), so
a reference client speaks **DataFusion SQL**. This engine's gate speaks
Spark SQL. Most of the surface is shared (``::`` casts, ILIKE,
``position(x IN y)``, ``||``, ANSI joins/windows/CTEs all parse in Spark
4), but DataFusion's *function names* frequently differ from Spark's for
the same computation — a migrating client's ``approx_distinct(x)`` or
``date_bin(interval '15 minutes', ts)`` would error here even though the
engine implements both natively. This module rewrites those names (and a
few argument shapes) into the Spark spelling **before** the statement gate
sees the SQL, at the Flight service boundary only — library users of
``Engine`` keep plain Spark SQL.

Three modes (``FlightSqlServiceConfig.sql_dialect``):

- ``"spark"`` — no rewriting.
- ``"auto"`` (default) — rewrite only function names that do **not**
  exist in Spark's registry (verified against Spark 4.1 ``SHOW
  FUNCTIONS``), so the shim is a strict no-op for valid Spark SQL: any
  statement it touches would otherwise have failed with
  UNRESOLVED_ROUTINE. Safe to leave on for Spark-dialect clients.
- ``"datafusion"`` — everything in ``auto``, plus the rewrites that
  *change the meaning* of valid Spark SQL and are therefore opt-in:
  PostgreSQL-style double-quoted **identifiers** become backticks (Spark
  parses ``"x"`` as a string literal), ``from_unixtime`` returns a
  timestamp (DataFusion) instead of a formatted string (Spark), and
  ``to_char`` with a chrono ``%``-pattern becomes ``date_format`` with
  the pattern converted.

The rewriter is a small SQL-aware tokenizer (strings, quoted identifiers
and comments pass through untouched), not a parser: it only rewrites a
mapped word immediately followed by ``(`` and not preceded by ``.``.
Names it cannot map keep erroring through Spark's UNRESOLVED_ROUTINE
(clearly, with the name); argument shapes it recognizes but cannot
express raise :class:`DialectUnsupported` naming the construct.

Application contract: rewrite ONCE, where client SQL first enters (the
Flight service's statement GetFlightInfo and prepared-statement
creation). ``auto``-mode rewrites are idempotent (every output spelling
is outside the auto maps), but the ``datafusion``-mode argument-order
swaps (``array_prepend``) are their own inverse — a second pass would
swap back — so tickets/handles round-trip the REWRITTEN SQL and the
execution paths never rewrite again.
"""

from __future__ import annotations

import re

__all__ = ["DialectUnsupported", "rewrite_sql"]


class DialectUnsupported(ValueError):
    """A recognized DataFusion construct with no Spark SQL rendering."""


# -- tokenizer ---------------------------------------------------------------

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _tokens(sql: str):
    """Yield (kind, start, end): kind ∈ word/str/dq/bq/comment/other.

    Strings honor ``''`` escapes, double-quoted tokens honor ``""``,
    backticks honor ` `` `; comments are ``--`` to EOL and ``/* */``.
    """
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            yield ("str", i, min(j + 1, n))
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':
                        j += 2
                        continue
                    break
                j += 1
            yield ("dq", i, min(j + 1, n))
            i = j + 1
        elif c == "`":
            j = i + 1
            while j < n:
                if sql[j] == "`":
                    if j + 1 < n and sql[j + 1] == "`":
                        j += 2
                        continue
                    break
                j += 1
            yield ("bq", i, min(j + 1, n))
            i = j + 1
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            yield ("comment", i, j)
            i = j
        elif c == "/" and i + 1 < n and sql[i + 1] == "*":
            j = sql.find("*/", i + 2)
            j = n if j < 0 else j + 2
            yield ("comment", i, j)
            i = j
        else:
            m = _WORD.match(sql, i)
            if m:
                yield ("word", i, m.end())
                i = m.end()
            else:
                yield ("other", i, i + 1)
                i += 1


# -- rename maps (see module docstring for the mode contract) ---------------

#: DataFusion → Spark same-shape renames; every KEY is absent from Spark
#: 4.1's function registry (verified via SHOW FUNCTIONS), so applying
#: these cannot change the meaning of valid Spark SQL.
_AUTO_RENAMES = {
    "approx_distinct": "APPROX_COUNT_DISTINCT",
    "approx_median": "MEDIAN",
    "approx_percentile_cont": "PERCENTILE_APPROX",
    "arrow_typeof": "TYPEOF",
    "to_timestamp_seconds": "TIMESTAMP_SECONDS",
    "to_timestamp_millis": "TIMESTAMP_MILLIS",
    "to_timestamp_micros": "TIMESTAMP_MICROS",
    "strpos": "INSTR",
    "starts_with": "STARTSWITH",
    "ends_with": "ENDSWITH",
    "make_array": "ARRAY",
    "list_length": "ARRAY_SIZE",
    "array_has": "ARRAY_CONTAINS",
    "list_contains": "ARRAY_CONTAINS",
    "array_has_any": "ARRAYS_OVERLAP",
    "array_to_string": "ARRAY_JOIN",
    "list_to_string": "ARRAY_JOIN",
    "array_element": "ELEMENT_AT",
    "list_element": "ELEMENT_AT",
    "array_push_back": "ARRAY_APPEND",
    "array_concat": "CONCAT",
    "to_hex": "HEX",
    "datetrunc": "DATE_TRUNC",
    "substr_index": "SUBSTRING_INDEX",
    "generate_series": "SEQUENCE",
    # batch 2 (round 9, same verified-absent-from-Spark rule)
    "array_reverse": "REVERSE",
    "list_reverse": "REVERSE",
    "list_distinct": "ARRAY_DISTINCT",
    "list_cat": "CONCAT",
    "list_concat": "CONCAT",
    "list_append": "ARRAY_APPEND",
    "list_max": "ARRAY_MAX",
    "list_min": "ARRAY_MIN",
    "covar": "COVAR_SAMP",  # DataFusion's covar IS the sample covariance
    "today": "CURRENT_DATE",
}

#: Applied only in full "datafusion" mode: the name EXISTS in Spark with
#: different semantics, so the rewrite would change valid Spark SQL.
_DATAFUSION_RENAMES = {
    # DataFusion returns a timestamp; Spark's returns a formatted string
    "from_unixtime": "TIMESTAMP_SECONDS",
}

#: Arrow type-name (arrow_cast's second argument) → Spark SQL type. The
#: unsigned widths widen to the next signed type that holds the range.
_ARROW_TYPES = {
    "int8": "TINYINT",
    "int16": "SMALLINT",
    "int32": "INT",
    "int64": "BIGINT",
    "uint8": "SMALLINT",
    "uint16": "INT",
    "uint32": "BIGINT",
    "uint64": "DECIMAL(20,0)",
    "float32": "FLOAT",
    "float64": "DOUBLE",
    "utf8": "STRING",
    "largeutf8": "STRING",
    "utf8view": "STRING",
    "boolean": "BOOLEAN",
    "date32": "DATE",
    "date64": "DATE",
    "binary": "BINARY",
    "largebinary": "BINARY",
    "binaryview": "BINARY",
}

_INTERVAL_UNITS_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}

#: chrono strftime → Spark (java.time) datetime pattern, for to_char
_CHRONO_MAP = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "e": "d",
    "b": "MMM", "B": "MMMM", "a": "EEE", "A": "EEEE",
    "H": "HH", "I": "hh", "M": "mm", "S": "ss", "p": "a", "j": "DDD",
    "F": "yyyy-MM-dd", "T": "HH:mm:ss", "R": "HH:mm",
}


def _strip_str_literal(arg: str, what: str) -> str:
    """Require ``arg`` to be a single SQL string literal; return its text."""
    a = arg.strip()
    if len(a) < 2 or a[0] != "'" or a[-1] != "'":
        raise DialectUnsupported(
            f"{what} requires a string literal, got: {arg.strip()!r}"
        )
    return a[1:-1].replace("''", "'")


def _interval_micros(arg: str) -> int:
    """``INTERVAL '15 minutes'`` / ``INTERVAL '1' HOUR`` → microseconds."""
    m = re.match(
        r"^\s*INTERVAL\s+'([^']*)'(?:\s+([A-Za-z]+))?\s*$",
        arg.strip(),
        re.IGNORECASE,
    )
    if not m:
        raise DialectUnsupported(
            f"date_bin stride must be a literal INTERVAL, got: {arg.strip()!r}"
        )
    body, unit = m.group(1), m.group(2)
    pairs = (
        [(body.strip(), unit)]
        if unit
        else re.findall(r"([0-9]+)\s*([A-Za-z]+)", body)
    )
    if not pairs:
        raise DialectUnsupported(f"unparseable INTERVAL literal: {arg.strip()!r}")
    total = 0
    for value, u in pairs:
        key = u.lower().rstrip("s") if u.lower() != "s" else u.lower()
        key = {"min": "minute", "sec": "second", "hr": "hour"}.get(key, key)
        if key not in _INTERVAL_UNITS_US:
            raise DialectUnsupported(
                f"date_bin stride unit {u!r} is not fixed-width in "
                f"microseconds (month/year bins have no epoch-arithmetic "
                f"form; fixed-width units only)"
            )
        if not value.strip().isdigit():
            raise DialectUnsupported(
                f"date_bin stride value {value!r} is not an integer"
            )
        total += int(value) * _INTERVAL_UNITS_US[key]
    if total <= 0:
        raise DialectUnsupported("date_bin stride must be positive")
    return total


# -- argument-shape transforms ----------------------------------------------


def _t_arrow_cast(args: list[str]) -> str:
    if len(args) != 2:
        raise DialectUnsupported("arrow_cast takes (expression, 'Type')")
    tname = _strip_str_literal(args[1], "arrow_cast type").strip()
    key = re.sub(r"\s+", "", tname).lower()
    m = re.match(r"^decimal(?:128|256)?\((\d+),(-?\d+)\)$", key)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        if p > 38 or s < 0 or s > p:
            raise DialectUnsupported(
                f"arrow_cast decimal({p},{s}) exceeds Spark's DECIMAL(38)"
            )
        return f"CAST(({args[0].strip()}) AS DECIMAL({p},{s}))"
    m = re.match(r"^timestamp\((\w+),(none|some\(\"([^\"]*)\"\))\)$", key)
    if m:
        unit, tz = m.group(1), m.group(3)
        if unit == "nanosecond":
            raise DialectUnsupported(
                "arrow_cast Timestamp(Nanosecond, ..): Spark timestamps "
                "are microsecond precision"
            )
        spark_t = "TIMESTAMP" if tz else "TIMESTAMP_NTZ"
        return f"CAST(({args[0].strip()}) AS {spark_t})"
    spark_t = _ARROW_TYPES.get(key)
    if spark_t is None:
        raise DialectUnsupported(
            f"arrow_cast type {tname!r} has no Spark SQL mapping"
        )
    return f"CAST(({args[0].strip()}) AS {spark_t})"


def _t_date_bin(args: list[str]) -> str:
    # Exact-integer epoch bucketing: d − pmod(d, stride) floors toward
    # −∞ for pre-origin timestamps too, with no double rounding at
    # bucket boundaries (FLOOR(d/stride) in fp64 can mis-bucket exact
    # multiples). Matches DataFusion date_bin / DuckDB time_bucket.
    if len(args) not in (2, 3):
        raise DialectUnsupported(
            "date_bin takes (INTERVAL stride, source[, origin])"
        )
    stride = _interval_micros(args[0])
    origin = (
        args[2].strip() if len(args) == 3 else "TIMESTAMP '1970-01-01 00:00:00'"
    )
    o = f"UNIX_MICROS(CAST(({origin}) AS TIMESTAMP))"
    d = f"(UNIX_MICROS(CAST(({args[1].strip()}) AS TIMESTAMP)) - {o})"
    return f"TIMESTAMP_MICROS(({d} - PMOD({d}, {stride})) + {o})"


def _t_array_length(args: list[str]) -> str:
    if len(args) == 2 and args[1].strip() != "1":
        raise DialectUnsupported(
            "array_length with a dimension other than 1 (Spark arrays "
            "are single-dimension)"
        )
    if len(args) not in (1, 2):
        raise DialectUnsupported("array_length takes (array[, dimension])")
    return f"ARRAY_SIZE({args[0].strip()})"


def _t_array_slice(args: list[str]) -> str:
    if len(args) != 3:
        raise DialectUnsupported(
            "array_slice supports (array, begin, end); stride does not "
            "map to Spark's SLICE"
        )
    a, b, e = (x.strip() for x in args)
    return f"SLICE(({a}), ({b}), (({e}) - ({b}) + 1))"


def _t_array_pop_back(args: list[str]) -> str:
    if len(args) != 1:
        raise DialectUnsupported("array_pop_back takes (array)")
    a = args[0].strip()
    return f"SLICE(({a}), 1, GREATEST(SIZE(({a})) - 1, 0))"


def _t_list_sort(args: list[str]) -> str:
    if len(args) == 1:
        return f"ARRAY_SORT({args[0].strip()})"
    raise DialectUnsupported(
        "list_sort with explicit order/null placement does not map to "
        "a single Spark ARRAY_SORT form"
    )


def _sha(bits: int):
    def t(args: list[str]) -> str:
        if len(args) != 1:
            raise DialectUnsupported(f"sha{bits} takes one argument")
        # DataFusion's sha* return Binary; Spark's SHA2 returns hex text
        return f"UNHEX(SHA2(({args[0].strip()}), {bits}))"

    return t


def _t_regexp_match(args: list[str]) -> str:
    # group index pinned to 0 (whole match): Spark's REGEXP_EXTRACT_ALL
    # defaults to group 1 and errors on group-less patterns. DataFusion
    # returns the first match's capture groups (pg semantics); for the
    # common group-less pattern both give the matched text.
    if len(args) == 3:
        flags = _strip_str_literal(args[2], "regexp_match flags")
        if flags and set(flags) <= {"i", "s", "m", "x", "u"}:
            pat = args[1].strip()
            if pat.startswith("'"):
                inner = _strip_str_literal(args[1], "regexp_match pattern")
                esc = f"(?{flags}){inner}".replace("'", "''")
                return f"REGEXP_EXTRACT_ALL(({args[0].strip()}), '{esc}', 0)"
        raise DialectUnsupported(
            "regexp_match flags require a literal pattern and inline-able "
            "flags (i/s/m/x/u)"
        )
    if len(args) != 2:
        raise DialectUnsupported("regexp_match takes (string, pattern[, flags])")
    return (
        f"REGEXP_EXTRACT_ALL(({args[0].strip()}), ({args[1].strip()}), 0)"
    )


def _t_iszero(args: list[str]) -> str:
    if len(args) != 1:
        raise DialectUnsupported("iszero takes one argument")
    return f"(CAST(({args[0].strip()}) AS DOUBLE) = CAST(0 AS DOUBLE))"


def _t_string_to_array(args: list[str]) -> str:
    if len(args) != 2:
        raise DialectUnsupported(
            "string_to_array supports (string, delimiter) with a literal "
            "delimiter (Spark SPLIT's delimiter is a regex)"
    )
    delim = _strip_str_literal(args[1], "string_to_array delimiter")
    escaped = re.escape(delim).replace("\\", "\\\\").replace("'", "''")
    return f"SPLIT(({args[0].strip()}), '{escaped}', -1)"


def _t_prepend(args: list[str]) -> str:
    # DataFusion's array_prepend/list_prepend/array_push_front all take
    # (element, array); Spark's ARRAY_PREPEND takes (array, element)
    if len(args) != 2:
        raise DialectUnsupported("array_prepend takes (element, array)")
    el, arr = (a.strip() for a in args)
    return f"ARRAY_PREPEND(({arr}), ({el}))"


def _t_empty(args: list[str]) -> str:
    if len(args) != 1:
        raise DialectUnsupported("empty takes (array)")
    return f"(SIZE(({args[0].strip()})) = 0)"


def _t_to_unixtime(args: list[str]) -> str:
    if len(args) != 1:
        raise DialectUnsupported(
            "to_unixtime supports a single castable argument"
        )
    return f"UNIX_SECONDS(CAST(({args[0].strip()}) AS TIMESTAMP))"


_AUTO_TRANSFORMS = {
    "arrow_cast": _t_arrow_cast,
    "date_bin": _t_date_bin,
    "array_length": _t_array_length,
    "array_slice": _t_array_slice,
    "list_slice": _t_array_slice,
    "empty": _t_empty,
    "array_empty": _t_empty,
    "to_unixtime": _t_to_unixtime,
    "list_prepend": _t_prepend,
    "array_push_front": _t_prepend,
    "array_pop_back": _t_array_pop_back,
    "list_sort": _t_list_sort,
    "sha224": _sha(224),
    "sha256": _sha(256),
    "sha384": _sha(384),
    "sha512": _sha(512),
    "iszero": _t_iszero,
    "string_to_array": _t_string_to_array,
    "regexp_match": _t_regexp_match,
}


#: datafusion-mode-only transforms: the NAME exists in Spark with
#: different semantics or argument order, so touching it would change
#: valid Spark SQL. A transform returning None keeps the original call.
#: (populated after the function definitions below)
_DF_TRANSFORMS: dict = {}


def _chrono_to_java(fmt: str) -> str:
    """chrono strftime pattern → Spark datetime pattern (subset)."""
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if lit:
            text = "".join(lit)
            if re.search(r"[A-Za-z']", text):
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            lit.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                raise DialectUnsupported("to_char pattern ends with '%'")
            spec = fmt[i + 1]
            if spec == "%":
                lit.append("%")
            else:
                mapped = _CHRONO_MAP.get(spec)
                if mapped is None:
                    raise DialectUnsupported(
                        f"to_char chrono specifier %{spec} has no Spark "
                        f"datetime-pattern mapping"
                    )
                flush()
                out.append(mapped)
            i += 2
        else:
            lit.append(c)
            i += 1
    flush()
    return "".join(out)


def _t_to_char(args: list[str]) -> str | None:
    """Full mode only: chrono %-pattern → date_format; else untouched."""
    if len(args) != 2:
        return None
    a = args[1].strip()
    if not (a.startswith("'") and a.endswith("'") and "%" in a):
        return None  # numeric to_char — Spark's own to_char handles it
    fmt = _chrono_to_java(_strip_str_literal(args[1], "to_char pattern"))
    esc = fmt.replace("'", "''")
    return f"DATE_FORMAT(({args[0].strip()}), '{esc}')"


def _t_to_date(args: list[str]) -> str | None:
    """Full mode only: DataFusion's to_date formats are chrono
    %-patterns; convert a literal one to Spark's pattern dialect.
    1-arg and non-%-literal forms keep Spark's own TO_DATE."""
    if len(args) != 2:
        return None
    a = args[1].strip()
    if not (a.startswith("'") and a.endswith("'") and "%" in a):
        return None
    fmt = _chrono_to_java(_strip_str_literal(args[1], "to_date pattern"))
    esc = fmt.replace("'", "''")
    return f"TO_DATE(({args[0].strip()}), '{esc}')"


_DF_TRANSFORMS.update(
    {
        "to_char": _t_to_char,  # chrono %-patterns only; numeric kept
        "to_date": _t_to_date,  # chrono %-patterns only; others kept
        # Spark's ARRAY_PREPEND is (array, element); DataFusion's is
        # (element, array) — swap only when the client speaks DataFusion
        "array_prepend": _t_prepend,
    }
)


# -- rewriter ----------------------------------------------------------------


def _find_call(toks: list, i: int):
    """If toks[i] is a word heading a call (whitespace/comments allowed
    before the '(' — ``strpos (a, b)`` is legal SQL), return the index
    of its '(' token, else None. A preceding '.' disqualifies
    (qualified name) — walk back over whitespace/comments to check."""
    j = i + 1
    while j < len(toks) and (
        toks[j][0] == "comment"
        or (toks[j][0] == "other" and toks[j][3].isspace())
    ):
        j += 1
    if j >= len(toks) or toks[j][0] != "other" or toks[j][3] != "(":
        return None
    k = i - 1
    while k >= 0 and toks[k][0] == "comment":
        k -= 1
    while k >= 0 and toks[k][0] == "other" and toks[k][3].isspace():
        k -= 1
    if k >= 0 and toks[k][0] == "other" and toks[k][3] == ".":
        return None
    return j


def _match_paren(toks: list, open_i: int) -> int:
    depth = 0
    for j in range(open_i, len(toks)):
        kind, _, _, text = toks[j]
        if kind == "other":
            if text == "(":
                depth += 1
            elif text == ")":
                depth -= 1
                if depth == 0:
                    return j
    raise DialectUnsupported("unbalanced parentheses")


def _render(toks: list, lo: int, hi: int, mode: str, sql: str) -> str:
    out: list[str] = []
    i = lo
    renames = dict(_AUTO_RENAMES)
    if mode == "datafusion":
        renames.update(_DATAFUSION_RENAMES)
    while i < hi:
        kind, _s, _e, text = toks[i]
        if kind == "dq" and mode == "datafusion":
            # pg-style quoted identifier → backticks (Spark reads "x"
            # as a string literal unless ansi double-quote idents are on)
            inner = text[1:-1].replace('""', '"').replace("`", "``")
            out.append(f"`{inner}`")
            i += 1
            continue
        if kind == "word":
            name = text.lower()
            transform = _AUTO_TRANSFORMS.get(name)
            if transform is None and mode == "datafusion":
                transform = _DF_TRANSFORMS.get(name)
            renamed = renames.get(name)
            if transform or renamed:
                open_i = _find_call(toks, i)
                if open_i is not None:
                    close_i = _match_paren(toks, open_i)
                    args = _split_args(toks, open_i, close_i, mode, sql)
                    if transform:
                        replaced = transform(args)
                        if replaced is None:  # transform declined: keep
                            out.append(
                                f"{text}({', '.join(a.strip() for a in args)})"
                            )
                        else:
                            out.append(replaced)
                    else:
                        inner = ", ".join(a.strip() for a in args)
                        out.append(f"{renamed}({inner})")
                    i = close_i + 1
                    continue
        out.append(text)
        i += 1
    return "".join(out)


def _split_args(
    toks: list, open_i: int, close_i: int, mode: str, sql: str
) -> list[str]:
    """Render the top-level comma-separated args inside a call
    (recursively rewritten). ``f()`` → []."""
    args: list[str] = []
    depth = 0
    seg_start = open_i + 1
    for j in range(open_i, close_i + 1):
        kind, _s, _e, text = toks[j]
        if kind != "other":
            continue
        if text == "(":
            depth += 1
        elif text == ")":
            depth -= 1
            if depth == 0:
                if j > seg_start or args:
                    args.append(_render(toks, seg_start, j, mode, sql))
        elif text == "," and depth == 1:
            args.append(_render(toks, seg_start, j, mode, sql))
            seg_start = j + 1
    if args and all(not a.strip() for a in args):
        args = []
    return args


def rewrite_sql(sql: str, mode: str = "auto") -> str:
    """Rewrite DataFusion-dialect SQL into Spark SQL (see module doc)."""
    if mode == "spark":
        return sql
    if mode not in ("auto", "datafusion"):
        raise ValueError(
            f"sql_dialect must be 'spark', 'auto' or 'datafusion', "
            f"got {mode!r}"
        )
    toks = [(k, s, e, sql[s:e]) for k, s, e in _tokens(sql)]
    # fast path: nothing rewriteable present
    lowered = {t[3].lower() for t in toks if t[0] == "word"}
    interesting = (
        lowered & (set(_AUTO_RENAMES) | set(_AUTO_TRANSFORMS))
        or (
            mode == "datafusion"
            and (
                lowered & (set(_DATAFUSION_RENAMES) | set(_DF_TRANSFORMS))
                or any(t[0] == "dq" for t in toks)
            )
        )
    )
    if not interesting:
        return sql
    return _render(toks, 0, len(toks), mode, sql)
