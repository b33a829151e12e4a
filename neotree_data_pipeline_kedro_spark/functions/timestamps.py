"""Multi-format timestamp parsing (SURVEY.md §2.8, the dominant scalar family).

Re-expresses the reference's 20-branch regex-dispatched CASE
(reference: conf/common/sql_functions.py:173-293
``generate_timestamp_conversion_query``; duplicated at :611-701) plus the
``'DD Mon, YYYY HH:MM'`` unique-key reformat
(data_tyding/regenerate_unique_key.py:10-53) as ONE shared Spark column
expression. Branch order is semantic and preserved exactly — in particular
US ``MM/DD/YYYY`` is tested before European ``DD/MM/YYYY`` for 4-digit years,
but ``DD/MM/YY`` before ``MM/DD/YY`` for 2-digit years, matching the
reference's CASE ordering.

Pure built-in functions (regexp dispatch + ``try_to_timestamp``) — stays
inside whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .nulls import nullify

# anchored regexes, mirroring the reference CASE guards.
# The five ISO-ish branches (trailing-dot T/space, bare date, date+time,
# date'T'time — reference branches 2-6) all produce the same _iso_canonical
# parse, so their guards are merged into ONE alternation: this keeps the
# (large) canonicalization expression tree in the plan once instead of five
# times, which is what kept whole-stage codegen under the JVM's 64 KB
# method limit. The alternation is the exact union of the original five.
_RX_ISO_ANY = (
    r"^\d{4}[-/.]\d{1,2}[-/.]\d{1,2}"
    r"($|T.*\.$|\s+.*\.$|\s+\d{1,2}:\d{2}|T\d{1,2}:\d{2})"
)
_RX_DMY_TEXT = r"^\d{1,2}\s+[A-Za-z]+\s+\d{4}$"
_RX_MDY_TEXT = r"^[A-Za-z]+\s+\d{1,2},?\s+\d{4}$"
_RX_YMD_TEXT = r"^\d{4}\s+[A-Za-z]+\s+\d{1,2}$"
_RX_YMD_TEXT2 = r"^\d{4}\s+[A-Za-z]+,?\s?\d{1,2}$"
_RX_D_MON_Y = r"^\d{1,2}[- ]?[A-Za-z]{3,9}[- ]?\d{4}$"
_RX_US_SLASH = r"^(0?[1-9]|1[0-2])/(0?[1-9]|[12][0-9]|3[01])/\d{4}$"
_RX_EU_SLASH = r"^(0?[1-9]|[12][0-9]|3[01])/(0?[1-9]|1[0-2])/\d{4}$"
_RX_EU_DOT = r"^(0?[1-9]|[12][0-9]|3[01])\.(0?[1-9]|1[0-2])\.\d{4}$"
_RX_EU_DASH = r"^(0?[1-9]|[12][0-9]|3[01])-(0?[1-9]|1[0-2])-\d{4}$"
_RX_EU_SLASH_YY = r"^(0?[1-9]|[12][0-9]|3[01])/(0?[1-9]|1[0-2])/\d{2}$"
_RX_US_SLASH_YY = r"^(0?[1-9]|1[0-2])/(0?[1-9]|[12][0-9]|3[01])/\d{2}$"
_RX_COMPACT = r"^\d{8}$"
_RX_UNIX_S = r"^\d{10}$"
_RX_UNIX_MS = r"^\d{13}$"
_RX_D_MON_COMMA_Y = r"^\d{1,2}\s+[A-Za-z]{3,9},\s*\d{4}(\s+\d{1,2}:\d{2}(:\d{2})?)?$"


def _try(col: Column, *fmts: str) -> Column:
    """First successful parse among Java DateTimeFormatter patterns."""
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in fmts])


def _iso_canonical(t: Column) -> Column:
    """Rebuild a `yyyy-M-d H:mm:ss` string from any ISO-ish input.

    Normalizes the `-`/`/`/`.` separator zoo, `T` vs space, optional
    seconds, and ignores fractional seconds / timezone suffixes — the same
    tolerance Postgres's TO_TIMESTAMP pattern matching gives the reference.
    """
    y = F.regexp_extract(t, r"^(\d{4})[-/.](\d{1,2})[-/.](\d{1,2})", 1)
    m = F.regexp_extract(t, r"^(\d{4})[-/.](\d{1,2})[-/.](\d{1,2})", 2)
    d = F.regexp_extract(t, r"^(\d{4})[-/.](\d{1,2})[-/.](\d{1,2})", 3)
    hm = F.regexp_extract(t, r"[T\s](\d{1,2}:\d{2})", 1)
    s = F.regexp_extract(t, r"[T\s]\d{1,2}:\d{2}:(\d{2})", 1)
    time_part = F.when(hm == "", F.lit("0:00:00")).otherwise(
        F.concat(hm, F.lit(":"), F.when(s == "", F.lit("00")).otherwise(s))
    )
    return F.concat(y, F.lit("-"), m, F.lit("-"), d, F.lit(" "), time_part)


def parse_timestamp_multi(col: Column | str) -> Column:
    """Parse a dirty string column to TimestampType, reference branch order.

    Returns NULL for unparseable values (the reference's tolerant contract).
    """
    c = F.col(col) if isinstance(col, str) else col
    t = nullify(c)  # null tokens first (reference CASE branch 1)
    ti = F.initcap(t)  # Java month-name parsing is case-sensitive
    iso = F.try_to_timestamp(_iso_canonical(t), F.lit("yyyy-M-d H:mm:ss"))

    # Fast path: clean `yyyy-M-d H:mm:ss` (the overwhelmingly common shape
    # in practice) parses in ONE attempt; any miss falls through to the
    # branch-ordered chain, whose ISO branches produce the identical result,
    # so this is a pure short-circuit, not a semantic branch.
    fast = F.try_to_timestamp(t, F.lit("yyyy-M-d H:mm:ss"))

    return F.coalesce(
        fast,
        F.when(t.isNull(), F.lit(None).cast("timestamp"))
        # ISO-ish family (branches 2-6 merged — see _RX_ISO_ANY):
        # trailing-dot variants rtrim via regexp_extract's prefix match
        .when(t.rlike(_RX_ISO_ANY), iso)
        # textual month forms (branches 7-10)
        .when(t.rlike(_RX_DMY_TEXT), _try(ti, "d MMMM yyyy", "d MMM yyyy"))
        .when(
            t.rlike(_RX_MDY_TEXT),
            _try(F.regexp_replace(ti, ",", ""), "MMMM d yyyy", "MMM d yyyy"),
        )
        .when(t.rlike(_RX_YMD_TEXT), _try(ti, "yyyy MMMM d", "yyyy MMM d"))
        .when(
            t.rlike(_RX_YMD_TEXT2),
            _try(F.regexp_replace(ti, ",", " "), "yyyy MMMM d", "yyyy MMM d"),
        )
        # unique-key reformat family: '12 Mar, 2024 10:22'
        # (regenerate_unique_key.py:49-53)
        .when(
            t.rlike(_RX_D_MON_COMMA_Y),
            _try(
                F.regexp_replace(ti, ",", ""),
                "d MMM yyyy H:mm:ss",
                "d MMM yyyy H:mm",
                "d MMM yyyy",
                "d MMMM yyyy H:mm:ss",
                "d MMMM yyyy H:mm",
                "d MMMM yyyy",
            ),
        )
        # 19-Jul-2025 / 19 Jul 2025 (branch 11)
        .when(
            t.rlike(_RX_D_MON_Y),
            _try(
                F.initcap(F.regexp_replace(t, "-", " ")),
                "d MMM yyyy",
                "d MMMM yyyy",
            ),
        )
        # slash/dot/dash numeric forms — ORDER IS THE CONTRACT
        # (sql_functions.py:248-266: US before EU for 4-digit years,
        #  EU before US for 2-digit years)
        .when(t.rlike(_RX_US_SLASH), _try(t, "M/d/yyyy"))
        .when(t.rlike(_RX_EU_SLASH), _try(t, "d/M/yyyy"))
        .when(t.rlike(_RX_EU_DOT), _try(t, "d.M.yyyy"))
        .when(t.rlike(_RX_EU_DASH), _try(t, "d-M-yyyy"))
        .when(t.rlike(_RX_EU_SLASH_YY), _try(t, "d/M/yy"))
        .when(t.rlike(_RX_US_SLASH_YY), _try(t, "M/d/yy"))
        # compact + unix epoch (branches 18-20)
        .when(t.rlike(_RX_COMPACT), _try(t, "yyyyMMdd"))
        .when(t.rlike(_RX_UNIX_S), F.timestamp_seconds(t.cast("bigint")))
        .when(t.rlike(_RX_UNIX_MS), F.timestamp_millis(t.cast("bigint")))
        # ELSE: tolerant cast — try_cast yields NULL on failure even under
        # ANSI mode (the driver's vanilla session has ANSI on by default)
        .otherwise(t.try_cast("timestamp")),
    )
