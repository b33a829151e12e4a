"""Python UDTFs — the SQL-surface table functions (Spark 4).

The reference's entries restructure (S1,
scripts/restructure_entries, re-expressed vectorized in
sources/sessions.py) has a second natural surface: a TABLE FUNCTION a
SQL user can LATERAL-join without touching Python — `SELECT s.uid, e.*
FROM sessions s, LATERAL explode_entries(s.entries) e`. This module
provides that registration. UDTFs are row-at-a-time Python: right for
moderate-fanout restructuring reachable from pure SQL, wrong for the
bulk hot path — there the Arrow-batched mapInPandas kernels in
sources/sessions.py remain the implementation of record.
"""
from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="key string, value string, n_keys int")
class ExplodeEntries:
    """One row per key of a JSON-object string, keys in sorted order;
    malformed/non-object input yields no rows (quarantine-by-absence,
    the PERMISSIVE-scan convention)."""

    def eval(self, entries: str | None):  # noqa: D102
        try:
            d = json.loads(entries) if entries else None
        except (ValueError, TypeError):
            return
        if not isinstance(d, dict):
            return
        for k in sorted(d):
            v = d[k]
            yield (
                k,
                json.dumps(v, sort_keys=True)
                if isinstance(v, (dict, list))
                else (None if v is None else str(v)),
                len(d),
            )


def register_udtfs(spark) -> None:
    """Register every UDTF under its SQL name."""
    spark.udtf.register("explode_entries", ExplodeEntries)
