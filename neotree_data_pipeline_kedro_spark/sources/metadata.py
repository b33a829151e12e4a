"""S9: field-metadata registry source (SURVEY §2.1).

Reference (conf/common/scripts.py:33-177): the "webeditor" HTTP API serves
per-script field metadata ``{scriptid: {fieldKey: {key, type, dataType,
label, optional, minValue, maxValue, confidential, options: [{value,
valueLabel}]}}}``, cached as JSON under conf/local/scripts/. It drives
casting, label repair (operators/labels.py), confidentiality (redact) and
validation ranges.

Spark form: the registry is tiny driver-side state — load from the JSON
cache (or any fetcher callable), normalize, and either embed as literal
expressions (labels.py does this) or broadcast for UDF-side consumers.
No HTTP client here: the fetch is an injected callable so the engine stays
network-free; the cache file protocol matches the reference's.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession

FieldMeta = dict[str, Any]
ScriptMeta = dict[str, dict[str, FieldMeta]]

_FIELD_KEYS = (
    "key",
    "type",
    "dataType",
    "label",
    "optional",
    "minValue",
    "maxValue",
    "confidential",
    "options",
)


def _normalize_field(key: str, raw: dict[str, Any]) -> FieldMeta:
    out: FieldMeta = {k: raw.get(k) for k in _FIELD_KEYS}
    out["key"] = out.get("key") or key
    opts = out.get("options")
    if opts:
        out["options"] = [
            {"value": str(o.get("value")), "valueLabel": o.get("valueLabel")}
            for o in opts
        ]
    return out


def load_field_metadata(
    cache_path: str | Path,
    fetch: Callable[[], ScriptMeta] | None = None,
) -> ScriptMeta:
    """Load the per-script field registry, reference cache protocol
    (scripts.py:61-67,121-127): read the JSON cache if present, else call
    ``fetch`` and write the cache. Returns
    ``{scriptid: {fieldKey: field_meta}}``."""
    p = Path(cache_path)
    if p.exists():
        raw = json.loads(p.read_text())
    elif fetch is not None:
        raw = fetch()
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(raw))
    else:
        raise FileNotFoundError(
            f"metadata cache {p} missing and no fetcher provided"
        )
    return {
        script: {k: _normalize_field(k, f) for k, f in (fields or {}).items()}
        for script, fields in raw.items()
    }


def confidential_keys(meta: ScriptMeta) -> set[str]:
    """Field keys flagged confidential anywhere in the registry — feeds the
    P6 redact operator (sql_functions.py:1140-1145)."""
    return {
        k
        for fields in meta.values()
        for k, f in fields.items()
        if f.get("confidential")
    }


def numeric_ranges(meta: ScriptMeta) -> dict[str, tuple[float | None, float | None]]:
    """{field_key: (minValue, maxValue)} for range validation (§2.11)."""
    out: dict[str, tuple[float | None, float | None]] = {}
    for fields in meta.values():
        for k, f in fields.items():
            if f.get("minValue") is not None or f.get("maxValue") is not None:
                out[k] = (f.get("minValue"), f.get("maxValue"))
    return out


def broadcast_metadata(spark: SparkSession, meta: ScriptMeta):
    """Broadcast the registry for UDF-side consumers (scripts.py's module
    cache, but cluster-safe). Expression-side consumers (labels/redact)
    should embed literal maps instead."""
    return spark.sparkContext.broadcast(meta)
