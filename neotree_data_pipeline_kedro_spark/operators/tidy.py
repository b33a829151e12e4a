"""Column hygiene for wide derived tables (SURVEY.md §2.2 P7 + P8).

P7 junk-column pruning — reference drops single-letter / all-digit column
names (tidy_admissions_discharges_and_create_mcl_tables.py:273 regex
``^\\d+$|^[a-zA-Z]$``) and, for union views, keeps only ``.value``/``.label``
pairs plus a pinned key-column list with a column cap
(derive_data/create_union_views.py:73-156). The 1550-column cap was a
Postgres limit; Spark has no such limit but the cap is kept as an optional
parameter for output-schema parity.

P8 column-name normalization — ``[()-]`` → ``_``
(tidy_...mcl_tables.py:440) and the clean-table lowercase convention
(queries/normalize_clean_tables.sql): ``Key.value`` → ``key``,
``Key.label`` → ``key_label`` (label kept only for select-typed fields per
the metadata registry).

All pure column-name computation on the driver — a single ``select`` whose
projection Catalyst prunes straight into the scan; nothing here touches row
data.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# create_union_views.py:91-96 — always preserved, listed first under the cap
KEY_COLUMNS = (
    "uid",
    "unique_key",
    "facility",
    "created_at",
    "form_id",
    "review_number",
    "Age.value",
    "AgeCategory",
    "scriptId",
    "ingested_at",
    "script_type",
    "DateTimeAdmission.value",
    "DateTimeDischarge.value",
    "EndScriptDatetime.value",
)

_JUNK_RE = re.compile(r"^\d+$|^[a-zA-Z]$")


def prune_junk_columns(
    df: DataFrame,
    key_columns: Sequence[str] = KEY_COLUMNS,
    value_label_only: bool = False,
    max_columns: int | None = None,
) -> DataFrame:
    """P7: drop junk columns, optionally restrict to the ``.value/.label``
    convention, optionally cap width keeping key columns first
    (finalize_dataframe :273 + filter_columns_optimized :73-156)."""
    keys = [c for c in df.columns if c in set(key_columns)]
    kept = []
    for c in df.columns:
        if _JUNK_RE.match(c):
            continue
        if c in set(key_columns):
            kept.append(c)
            continue
        if value_label_only and not (c.endswith(".value") or c.endswith(".label")):
            continue
        kept.append(c)
    if max_columns is not None and len(kept) > max_columns:
        others = [c for c in kept if c not in set(keys)]
        kept = (keys + others[: max(0, max_columns - len(keys))])[:max_columns]
    return df.select(*[F.col(f"`{c}`") for c in kept])


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P8a: ``[()-]`` → ``_`` in every column name (tidy_...mcl_tables.py:440).
    Collisions after rewrite keep the first occurrence (pandas would raise on
    use; dropping the duplicate is the documented divergence)."""
    seen: set[str] = set()
    cols = []
    for c in df.columns:
        new = re.sub(r"[()\-]", "_", c)
        if new in seen:
            continue
        seen.add(new)
        cols.append(F.col(f"`{c}`").alias(new))
    return df.select(*cols)


def clean_table_projection(
    df: DataFrame,
    field_info: dict[str, dict[str, Any]] | None = None,
    label_types: Sequence[str] = ("dropdown", "single_select_option", "period"),
) -> DataFrame:
    """P8b: the clean-table lowercase convention
    (normalize_clean_tables.sql): ``Key.value`` → ``key``; ``Key.label`` →
    ``key_label`` kept only when the field's metadata type is select-like
    (or when no registry is supplied); all other columns lowercase.
    First-wins on case collisions."""
    fi = {k.lower(): v for k, v in (field_info or {}).items()}
    seen: set[str] = set()
    cols = []
    for c in df.columns:
        if c.endswith(".value"):
            new = c[: -len(".value")].lower()
        elif c.endswith(".label"):
            base = c[: -len(".label")].lower()
            meta = fi.get(base)
            if field_info is not None and (
                meta is None or meta.get("type") not in label_types
            ):
                continue
            new = f"{base}_label"
        else:
            new = c.lower()
        if new in seen:
            continue
        seen.add(new)
        cols.append(F.col(f"`{c}`").alias(new))
    return df.select(*cols)
