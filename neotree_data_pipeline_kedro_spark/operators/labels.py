"""Metadata-driven label repair (SURVEY.md §2.10).

Reference: ``transform_dataframe_with_field_info`` / ``_transform_subset``
(conf/common/sql_functions.py:1116-1307; utils/field_info.py:306-377). The
app sometimes stores a field's QUESTION label instead of the option label,
or swaps value and label; the repair, per field with metadata:

1. label := NULL wherever value is NULL (field_info.py:323-329);
2. inverted swap — value ∈ option LABELS and label ∈ option VALUES — swap
   them (select-typed fields only, :348-354);
3. relabel gate: value non-null AND stored label == the field's own
   question label (``json_label``) AND value not in {'oth','other'}
   (:356-358); gated rows get label := options[value] (unknown value →
   NULL, pandas ``.map`` semantics) or label := value when the field has
   no options; multi_select/checklist fields get a ','-joined per-token
   mapping (:364-370).

Spark form: the field-options dict is tiny driver-side metadata → literal
``create_map`` expressions (constant-folded by Catalyst), no join, no UDF.
"""

from __future__ import annotations

from itertools import chain
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OTHER_TOKENS = ("oth", "other")
SELECT_TYPES = ("single_select_option", "dropdown", "multi_select_option")
MULTISELECT_TYPES = ("multi_select", "checklist")


def _literal_map(options: dict[str, str]) -> Column:
    return F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in options.items())
    )


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def repair_field(
    value_col: Column | str,
    label_col: Column | str,
    field: dict[str, Any],
) -> tuple[Column, Column]:
    """(fixed_value, fixed_label) for one field given its metadata dict
    ``{label: <question label>, type: <field type>, options:
    [{value, valueLabel}, ...]}`` (the S9 registry shape)."""
    v = _col(value_col)
    lb = _col(label_col)
    json_label = field.get("label")
    field_type = field.get("type", "")
    options = {
        o["value"]: o["valueLabel"] for o in field.get("options") or []
    }
    vmap = _literal_map(options)  # value -> valueLabel
    inv = _literal_map({l: k for k, l in options.items()})  # valueLabel -> value

    # pass 1: null value forces null label
    lb1 = F.when(v.isNull(), F.lit(None)).otherwise(lb)

    # pass 2: inverted pair — value is a known LABEL and label a known VALUE
    if options and field_type in SELECT_TYPES:
        inverted = inv[v].isNotNull() & vmap[lb1].isNotNull()
    else:
        inverted = F.lit(False)
    v2 = F.when(inverted, lb1).otherwise(v)
    lb2 = F.when(inverted, v).otherwise(lb1)

    # pass 3: relabel only rows still carrying the field's question label
    oth = F.lower(v2).isin(*OTHER_TOKENS)
    relabel = v2.isNotNull() & (lb2 == F.lit(json_label)) & ~oth
    if field_type in MULTISELECT_TYPES:
        toks = F.filter(
            F.transform(F.split(v2.cast("string"), ","), lambda t: F.trim(t)),
            lambda t: t != "",
        )
        joined = F.array_join(
            F.transform(toks, lambda t: F.coalesce(vmap[t], t)), ","
        )
        lb3 = F.when(relabel, joined).otherwise(lb2)
    elif options:
        # pandas .map: unknown value -> NULL label
        lb3 = F.when(relabel, vmap[v2]).otherwise(lb2)
    else:
        lb3 = F.when(relabel, v2).otherwise(lb2)
    return v2, lb3


def repair_dataframe_labels(
    df: DataFrame,
    field_info: dict[str, dict[str, Any]],
) -> DataFrame:
    """Apply label repair across a wide Key.value/Key.label table given the
    metadata registry ``{field_key: field_meta}`` (S9). One projection —
    literal maps embed in the plan and constant-fold; fields without both
    columns are skipped, like the reference's column checks."""
    fixes: dict[str, Column] = {}
    for key, field in field_info.items():
        vcol, lcol = f"{key}.value", f"{key}.label"
        if vcol not in df.columns or lcol not in df.columns:
            continue
        fv, fl = repair_field(F.col(f"`{vcol}`"), F.col(f"`{lcol}`"), field)
        fixes[vcol] = fv
        fixes[lcol] = fl
    return df.select(
        *[fixes.get(c, F.col(f"`{c}`")).alias(c) for c in df.columns]
    )
