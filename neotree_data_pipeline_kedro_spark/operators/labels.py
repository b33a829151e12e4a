"""Metadata-driven label repair (SURVEY.md §2.10).

Reference: ``transform_dataframe_with_field_info`` /
``transform_matching_labels`` (conf/common/sql_functions.py:1116-1307;
utils/field_info.py:227-377): for select-typed fields, the stored
``Key.label`` must equal the options map's label for ``Key.value``;
includes inverted value/label swap detection (field_info.py:348-354),
``Oth``/``other`` passthrough (:356-358), and multi-select CSV label joins
(:364-370).

Spark form: the field-options dict is tiny driver-side metadata → literal
``create_map`` expressions (constant-folded by Catalyst), no join, no UDF.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OTHER_TOKENS = ("oth", "other")


def _literal_map(options: dict[str, str]) -> Column:
    return F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in options.items()))


def repair_label(
    value_col: Column | str,
    label_col: Column | str,
    options: dict[str, str],
) -> tuple[Column, Column]:
    """Return (fixed_value, fixed_label) for a single-select field.

    - value found in options → label := options[value]
    - inverted pair (stored value is actually a label and stored label is a
      valid value) → swap, then map (field_info.py:348-354)
    - 'Oth'/'other' → passthrough (:356-358)
    - unknown value → keep both as-is
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    lb = F.col(label_col) if isinstance(label_col, str) else label_col
    vmap = _literal_map(options)  # value -> label
    inv = _literal_map({label: val for val, label in options.items()})  # label -> value

    is_other = F.lower(v).isin(*OTHER_TOKENS)
    swapped_value = inv[lb]  # non-null iff stored label is a known value...
    # inverted detection: stored *value* is a known label AND stored label is a known value
    inverted = vmap[v].isNull() & inv[v].isNotNull()

    fixed_value = (
        F.when(is_other, v)
        .when(inverted, inv[v])
        .otherwise(v)
    )
    fixed_label = (
        F.when(is_other, lb)
        .when(inverted, v.alias("x"))  # after swap the label is the old value's label
        .otherwise(F.coalesce(vmap[fixed_value], lb))
    )
    # after an inverted swap, label must come from the map for the swapped value
    fixed_label = F.when(inverted, F.coalesce(vmap[inv[v]], lb)).otherwise(fixed_label)
    return fixed_value, fixed_label


def repair_multiselect_label(
    value_col: Column | str,
    options: dict[str, str],
    sep: str = ",",
) -> Column:
    """Multi-select CSV label join (field_info.py:364-370): split the CSV
    value list, map each token through the options, join labels with ', '.
    Unknown tokens pass through unchanged."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    vmap = _literal_map(options)
    toks = F.transform(F.split(v, sep), lambda t: F.coalesce(vmap[F.trim(t)], F.trim(t)))
    return F.array_join(toks, ", ")


def repair_dataframe_labels(
    df: DataFrame,
    field_options: dict[str, dict[str, str]],
    multiselect_fields: set[str] | None = None,
) -> DataFrame:
    """Apply label repair across a wide Key.value/Key.label table given the
    metadata registry {field_key: {value: label}} (broadcast-free: literal
    maps are embedded in the plan and constant-folded)."""
    multiselect_fields = multiselect_fields or set()
    out = df
    for key, options in field_options.items():
        vcol, lcol = f"{key}.value", f"{key}.label"
        if vcol not in df.columns:
            continue
        if key in multiselect_fields:
            if lcol in df.columns:
                out = out.withColumn(
                    lcol, repair_multiselect_label(F.col(f"`{vcol}`"), options)
                )
            continue
        if lcol in df.columns:
            fv, fl = repair_label(F.col(f"`{vcol}`"), F.col(f"`{lcol}`"), options)
            out = out.withColumn(vcol, fv).withColumn(lcol, fl)
    return out
