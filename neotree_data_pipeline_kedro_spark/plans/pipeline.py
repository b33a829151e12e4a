"""End-to-end engine: the 14-stage DAG (SURVEY.md §1 topology / §3.1).

Mirrors the reference's Kedro pipeline (src/data_pipeline/pipelines/
data_engineering/pipeline.py:21-40, node wiring nodes.py:21-97):

    import_raw_json_files -> deduplicate_data -> tidy_data
        -> manually_fix_admissions / manually_fix_discharges
        -> create_summary_tables / join_tables
        -> union_views / convenience_views / summary_discharge_diagnosis /
           summary_baseline
        -> summary_counts -> grant_privileges -> clean_derived_data
        -> merge_raw_data

Where the reference passes status dicts between OS processes and keeps all
state in Postgres, here every stage is a pure ``DataFrame -> DataFrame``
function and ``Engine.run`` composes one lazy plan per output; Spark's own
scheduler distributes the work, so the Kedro ParallelRunner machinery has
no twin. Stage boundaries survive as the keys of the returned dict (and
the optional per-stage ``materialize`` hook) so each intermediate remains
independently inspectable, preserving the reference's derived-schema
contract.

Per-stage semantics live in the operator modules (cited there); this file
only wires them.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.buckets import bw_group, gest_group, temp_group
from ..functions.neolab import canonicalize_organism
from ..functions.timestamps import parse_timestamp_multi
from ..operators.dedup import dedupe_keep_latest
from ..operators.labels import repair_dataframe_labels
from ..operators.redact import redact
from ..operators.tidy import (
    clean_table_projection,
    normalize_column_names,
    prune_junk_columns,
)
from ..operators.uids import repair_duplicate_uids
from ..sources.sessions import entry_rows, explode_mcl, repair_uid

log = logging.getLogger(__name__)

# old->new field-key renames (tidy_...mcl_tables.py:414-422,510-518)
KEY_RENAMES = {
    "BW": "BirthWeight",
    "Conv": "Convulsions",
    "AW": "AdmissionWeight",
    "BSmmol": "BloodSugarmmol",
    "BWTDis": "BirthWeight",
    "BirthDateDis": "DOBTOB",
    "Delivery": "ModeDelivery",
    "NNUAdmTemp": "Temperature",
    "GestBirth": "Gestation",
    "PresComp": "AdmReason",
    "ROMlength": "ROMLength",
}


@dataclass
class EngineConfig:
    """Driver-side configuration (the reference's conf/ directory).

    ``scripts``: scriptid -> logical script name (catalog.py:60-123 routing).
    ``facility_map``: scriptid-or-code -> facility name (hospitals.ini CASE,
    catalog.py:69-95).
    ``field_info``: per-script field metadata registry (S9) keyed by script
    NAME, feeding label repair / clean projection / redaction.
    ``pivot_keys``: per script name, the field keys to widen into
    ``Key.value``/``Key.label`` pairs. At scale this MUST come from the
    registry (a distinct-scan over 100 TB to discover keys is wrong); when
    absent and ``field_info`` has the script, its keys are used.
    """

    scripts: dict[str, str]
    facility_map: dict[str, str] = field(default_factory=dict)
    field_info: dict[str, dict[str, Any]] = field(default_factory=dict)
    pivot_keys: dict[str, Sequence[str]] = field(default_factory=dict)
    confidential_extra: Sequence[str] = ()


def _lit_map(d: dict[str, str]):
    from itertools import chain

    if not d:
        return F.create_map()
    return F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in d.items())
    )


class Engine:
    """``Engine(config).run(spark_sessions_df)`` -> dict of stage outputs.

    ``materialize`` (optional): called as ``materialize(name, df)`` after
    each stage — the warehouse-write hook (parquet/Delta path or temp view);
    by default stages stay lazy.
    """

    def __init__(
        self,
        config: EngineConfig,
        materialize: Callable[[str, DataFrame], DataFrame] | None = None,
    ):
        self.config = config
        self._mat = materialize

    def _out(self, name: str, df: DataFrame) -> DataFrame:
        if self._mat is not None:
            df = self._mat(name, df) or df
        return df

    # -- stage 1: import_raw_json_files (import_raw_jsons.py:31-215) -------
    def import_raw(self, sessions: DataFrame) -> DataFrame:
        """Bronze: extract the ``entries`` payload from the envelope, repair
        the uid from it (S1), tag the facility (P5)."""
        return (
            sessions.withColumn(
                "entries", F.get_json_object(F.col("data"), "$.entries")
            )
            .withColumn("uid", repair_uid(F.col("uid"), F.col("entries")))
            .withColumn(
                "facility",
                _lit_map(self.config.facility_map)[F.col("scriptid")],
            )
        )

    # -- stage 2: deduplicate_data (step_1; assorted_queries.py:62-289) ----
    def deduplicate(self, bronze: DataFrame) -> DataFrame:
        """Last-upload-wins per (uid, scriptid): MAX(id) kept (D1)."""
        return dedupe_keep_latest(
            bronze.filter(F.col("uid").isNotNull()),
            ["uid", "scriptid"],
            [F.desc("id")],
        )

    # -- stage 3: tidy_data (step_2; tidy_...mcl_tables.py:823-961) --------
    def tidy(self, deduped: DataFrame) -> dict[str, DataFrame]:
        """Per-script wide tables: entry restructuring -> key renames ->
        pivot to ``Key.value``/``Key.label`` pairs + MCL exploded table."""
        out: dict[str, DataFrame] = {}
        rename = _lit_map(KEY_RENAMES)
        for scriptid, name in self.config.scripts.items():
            sess = deduped.filter(F.col("scriptid") == scriptid).select(
                "id", "uid", "facility", "ingested_at", "entries"
            )
            rows = entry_rows(sess, id_cols=("id", "uid", "facility", "ingested_at"))
            rows = rows.withColumn(
                "key", F.coalesce(rename[F.col("key")], F.col("key"))
            )
            keys = list(
                self.config.pivot_keys.get(name)
                or self.config.field_info.get(name, {}).keys()
            )
            wide = (
                rows.groupBy("id", "uid", "facility", "ingested_at")
                .pivot("key", keys)
                .agg(
                    F.first("value", ignorenulls=True).alias("value"),
                    F.first("label", ignorenulls=True).alias("label"),
                )
            )
            # pivot names columns {key}_value/{key}_label -> Key.value pairs
            for k in keys:
                wide = wide.withColumnRenamed(f"{k}_value", f"{k}.value")
                wide = wide.withColumnRenamed(f"{k}_label", f"{k}.label")
            out[name] = wide
            out[f"{name}_mcl"] = explode_mcl(
                rows, id_cols=("id", "uid", "facility")
            )
        return out

    # -- stages 4/5: manual fixes (step_3) ---------------------------------
    def fix_records(self, wide: DataFrame, script: str) -> DataFrame:
        """Label repair from metadata + duplicate-uid repair (D8) + organism
        canonicalization when neolab columns are present."""
        fi = self.config.field_info.get(script, {})
        fixed = repair_dataframe_labels(wide, fi) if fi else wide
        if "Org1.value" in fixed.columns and "OtherOrg1.value" in fixed.columns:
            fv, fl = canonicalize_organism(
                F.col("`Org1.value`"),
                F.col("`Org1.label`"),
                F.col("`OtherOrg1.value`"),
            )
            fixed = fixed.withColumn("Org1.value", fv).withColumn("Org1.label", fl)
        if "DateTimeAdmission.value" in fixed.columns:
            fixed = fixed.withColumn(
                "admission_ts",
                parse_timestamp_multi(F.col("`DateTimeAdmission.value`")),
            )
            fixed = repair_duplicate_uids(
                fixed, "uid", "admission_ts"
            )
        return fixed

    # -- stage 6: create_summary_tables (step_2 summaries) -----------------
    def summary_tables(self, adm: DataFrame) -> DataFrame:
        """Monthly per-facility admission rollup (A2 family)."""
        ts = (
            F.col("admission_ts")
            if "admission_ts" in adm.columns
            else F.col("ingested_at")
        )
        return (
            adm.withColumn("month", F.date_trunc("month", ts))
            .groupBy("facility", "month")
            .agg(F.count("*").alias("admissions"))
        )

    # -- stage 7: join_tables (step_4; create_...join SQL) -----------------
    def join_tables(self, adm: DataFrame, dis: DataFrame) -> DataFrame:
        """Admission->discharge left join on uid, latest discharge per uid
        (J1 fan-out resolved J8-style by window, not join-back)."""
        latest_dis = dedupe_keep_latest(dis, ["uid"], [F.desc("ingested_at")])
        d = latest_dis.select(
            "uid",
            *[
                F.col(f"`{c}`").alias(f"dis_{c}")
                for c in latest_dis.columns
                if c != "uid"
            ],
        )
        return adm.join(d, "uid", "left")

    # -- stage 8: union_views (step_4; create_union_views.py) --------------
    def union_views(self, joined: DataFrame) -> DataFrame:
        return normalize_column_names(
            prune_junk_columns(joined, value_label_only=False)
        )

    # -- stage 9: convenience_views (step_4; create_convenience_views_sql) -
    def convenience_views(self, joined: DataFrame) -> DataFrame:
        """Derived bucket/indicator columns (§2.8 CASE ladders)."""
        out = joined
        if "Gestation.value" in out.columns:
            out = out.withColumn(
                "GestGroup",
                gest_group(F.col("`Gestation.value`").try_cast("double")),
            )
        if "BirthWeight.value" in out.columns:
            out = out.withColumn(
                "BWGroup",
                bw_group(F.col("`BirthWeight.value`").try_cast("double")),
            )
        if "Temperature.value" in out.columns:
            out = out.withColumn(
                "TempGroup",
                temp_group(F.col("`Temperature.value`").try_cast("double")),
            )
        return out

    # -- stage 10: summary_counts (step_4) ---------------------------------
    def summary_counts(self, conv: DataFrame) -> DataFrame:
        return conv.groupBy("facility").agg(
            F.count("*").alias("n"),
            F.countDistinct("uid").alias("patients"),
        )

    # -- stage 11: grant_privileges (step_5) -------------------------------
    def grant_privileges(self) -> None:
        """S10 stub: Postgres GRANT loops have no Spark twin — table ACLs
        belong to the warehouse catalog (Unity/Hive). Logged no-op."""
        log.info("grant_privileges: no-op (warehouse ACLs are external)")

    # -- stage 12: clean_derived_data (step_6; data_clean_up) --------------
    def clean_for_research(self, conv: DataFrame, script: str) -> DataFrame:
        """Redact confidential fields then project the clean-table
        lowercase convention."""
        fi = self.config.field_info.get(script, {})
        meta_conf = [k for k, f in fi.items() if f.get("confidential")]
        red = redact(conv, metadata_confidential=meta_conf)
        return clean_table_projection(red, fi or None)

    # -- stage 13/14: merge_raw_data (step_7; merge_all.py) ----------------
    def merge_raw(self, adm: DataFrame, dis: DataFrame) -> DataFrame:
        """Merged ALL table: admissions + discharges unioned by name with
        missing columns null-filled, exact duplicate rows dropped."""
        return adm.unionByName(dis, allowMissingColumns=True).dropDuplicates()

    # -- composition -------------------------------------------------------
    def run(self, sessions: DataFrame) -> dict[str, DataFrame]:
        cfg = self.config
        out: dict[str, DataFrame] = {}
        out["bronze"] = self._out("bronze", self.import_raw(sessions))
        out["deduplicated"] = self._out("deduplicated", self.deduplicate(out["bronze"]))
        tidy = self.tidy(out["deduplicated"])
        for name, df in tidy.items():
            out[name] = self._out(name, df)

        names = list(cfg.scripts.values())
        adm_name = names[0]
        dis_name = names[1] if len(names) > 1 else None

        out["admissions_fixed"] = self._out(
            "admissions_fixed", self.fix_records(tidy[adm_name], adm_name)
        )
        if dis_name:
            out["discharges_fixed"] = self._out(
                "discharges_fixed", self.fix_records(tidy[dis_name], dis_name)
            )
        out["summary_admissions"] = self._out(
            "summary_admissions", self.summary_tables(out["admissions_fixed"])
        )
        joined = (
            self.join_tables(out["admissions_fixed"], out["discharges_fixed"])
            if dis_name
            else out["admissions_fixed"]
        )
        out["joined"] = self._out("joined", joined)
        out["union_view"] = self._out("union_view", self.union_views(joined))
        out["convenience"] = self._out(
            "convenience", self.convenience_views(joined)
        )
        out["summary_counts"] = self._out(
            "summary_counts", self.summary_counts(out["convenience"])
        )
        self.grant_privileges()
        out["clean_admissions"] = self._out(
            "clean_admissions",
            self.clean_for_research(out["convenience"], adm_name),
        )
        if dis_name:
            out["merged_all"] = self._out(
                "merged_all",
                self.merge_raw(out["admissions_fixed"], out["discharges_fixed"]),
            )
        return out
