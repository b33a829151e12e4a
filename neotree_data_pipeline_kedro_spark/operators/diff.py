"""Row-level table diff between two versions of a keyed table.

The reconcile/upsert sinks (operators/sinks.py, reference
conf/common/sql_functions.py upsert + merge_all.py lifecycle) APPLY a
delta; this operator COMPUTES one — the audit/refresh primitive a
warehouse needs between snapshot versions: which keys were added,
removed, or changed, and which columns changed. Feed its output to
upsert_by_key to replicate a snapshot incrementally, or to a report.

Scale shape: ONE full-outer shuffle join on the key (both sides
partitioned the same way — co-bucketed tables join exchange-free), all
column comparisons are null-safe JVM expressions evaluated post-join,
and unchanged rows are filtered before anything downstream sees them, so
the output is delta-sized, not table-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff ``new`` against ``old`` by ``keys``.

    Output: the key columns + ``change_type`` ('added' | 'removed' |
    'changed') + ``changed_columns`` (comma-joined, ordered as
    ``compare_cols``; empty for added/removed). Unchanged rows are
    dropped. Comparison is null-safe (NULL == NULL is "unchanged",
    NULL vs value is "changed") — the IS DISTINCT FROM semantics.
    Key columns themselves must be non-null (presence on each side is
    detected through them; the standard primary-key contract).
    """
    keyset = list(keys)
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in old.columns if c not in keyset and c in new.columns
    ]
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keyset],
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keyset],
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    cond = [F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}")) for k in keyset]
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"__ok_{keyset[0]}").isNotNull()
    in_new = F.col(f"__nk_{keyset[0]}").isNotNull()
    # key-only diffs (no compare columns) still report added/removed:
    # F.concat(*[]) with zero args does not resolve as an array concat,
    # so short-circuit to an empty string array
    changed_list = (
        F.concat(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.array(F.lit(c)),
                ).otherwise(F.array().cast("array<string>"))
                for c in cols
            ]
        )
        if cols
        else F.array().cast("array<string>")
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in keyset
        ],
        F.when(in_old & in_new, F.lit("changed"))
        .when(in_new, F.lit("added"))
        .otherwise(F.lit("removed"))
        .alias("change_type"),
        F.when(in_old & in_new, F.array_join(changed_list, ","))
        .otherwise(F.lit(""))
        .alias("changed_columns"),
    )
    return out.filter(
        (F.col("change_type") != "changed") | (F.col("changed_columns") != "")
    )
