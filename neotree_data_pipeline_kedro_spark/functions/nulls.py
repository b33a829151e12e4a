"""Null-token normalization (SURVEY.md §2.8 "Null normalization").

The reference treats a fixed set of stringly-null tokens as NULL on every
boundary (reference: conf/common/sql_functions.py:988,1377-1402;
utils/custom_date_formatter.py:38-41; data_validation/validate.py:394-399),
case-insensitively for the date parser
(conf/common/sql_functions.py:205-208: lower(trim(x)) in
('nan','none','nat','<na>')). uids additionally treat 'Unknown'/'Unkown'
(sic) as null (queries/assorted_queries.py:357,373).

This engine never *produces* these tokens (they are pandas artifacts), but
must accept them on input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# lower-cased match set; '' covers whitespace-only after trim.
NULL_TOKENS = ("", "nan", "nat", "none", "<na>", "null")

UID_JUNK_TOKENS = ("null", "unknown", "unkown")


def nullify(col: Column | str) -> Column:
    """Map stringly-null tokens to real NULL; passes other values through
    trimmed. Case-insensitive, mirroring the reference's date-parser guard.

    trim() strips ASCII spaces only — the SQL contract shared by Spark,
    Postgres, and the DuckDB oracle. (The reference's pandas .str.strip()
    also eats tabs/newlines; divergence is deliberate and pinned by the
    nullify property test.)"""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.lower(t).isin(*NULL_TOKENS), F.lit(None)).otherwise(t)


def nullify_uid(col: Column | str) -> Column:
    """uid-specific variant: also rejects Unknown/Unkown and upper-cases
    (reference: extract_key_values.py:47 upper-casing;
    assorted_queries.py:357 junk-uid filter)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    bad = NULL_TOKENS + UID_JUNK_TOKENS
    return F.when(F.lower(t).isin(*bad), F.lit(None)).otherwise(F.upper(t))
