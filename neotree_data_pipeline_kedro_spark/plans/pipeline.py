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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.buckets import bw_group, gest_group, temp_group
from ..functions.neolab import canonicalize_organism
from ..functions.timestamps import parse_timestamp_multi
from ..operators.dedup import dedupe_keep_latest
from ..operators.joins import best_match_join, tiered_asof_assignment
from ..operators.labels import repair_dataframe_labels
from ..operators.redact import redact
from ..operators.tidy import (
    clean_table_projection,
    normalize_column_names,
    prune_junk_columns,
)
from ..operators.sinks import reconcile_update
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


def lifecycle_union(
    merged: DataFrame | None,
    adm_only: DataFrame | None,
    dis_only: DataFrame | None,
) -> DataFrame:
    """Attach the ALL-table lifecycle columns and union the three branches
    (merge_all.py:485-510): merged rows are has_admission & has_discharge &
    is_closed; one-sided rows stay open. ``match_status`` defaults to
    'matched' / 'unmatched_admission' / 'unmatched_discharge' when the
    branch doesn't already carry one (the assignment operator's statuses
    win when present)."""
    parts: list[DataFrame] = []
    if merged is not None:
        m = merged
        if "match_status" not in m.columns:
            m = m.withColumn("match_status", F.lit("matched"))
        parts.append(
            m.withColumn("has_admission", F.lit(True))
            .withColumn("has_discharge", F.lit(True))
            .withColumn("is_closed", F.lit(True))
        )
    if adm_only is not None:
        a = adm_only
        if "match_status" not in a.columns:
            a = a.withColumn("match_status", F.lit("unmatched_admission"))
        parts.append(
            a.withColumn("has_admission", F.lit(True))
            .withColumn("has_discharge", F.lit(False))
            .withColumn("is_closed", F.lit(False))
        )
    if dis_only is not None:
        d = dis_only
        if "match_status" not in d.columns:
            d = d.withColumn("match_status", F.lit("unmatched_discharge"))
        parts.append(
            d.withColumn("has_admission", F.lit(False))
            .withColumn("has_discharge", F.lit(True))
            .withColumn("is_closed", F.lit(False))
        )
    if not parts:
        raise ValueError("lifecycle_union: at least one branch is required")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


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
            if not keys:
                # an explicit-values pivot with no values would silently
                # produce an id-only frame; the reference always has script
                # metadata (tidy_...mcl_tables.py:823-961), so a script with
                # neither pivot_keys nor field_info is a config error
                raise ValueError(
                    f"Engine.tidy: script {name!r} ({scriptid}) has neither "
                    "pivot_keys nor field_info — declare its fields in "
                    "EngineConfig (an empty pivot would drop every entry)"
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

    # -- stage 7: join_tables (step_4; create_joined_table_and_derived_
    # columns.py:268-394) --------------------------------------------------
    def join_tables(self, adm: DataFrame, dis: DataFrame) -> DataFrame:
        """Admission->discharge left join on uid with the reference's
        clinical match score resolving fan-out per admission (J1+J2):
        OFC closeness (max 10, -1/cm), Gestation closeness (max 10, -1/wk),
        BirthWeight closeness (max 5, -1/500g); no comparable fields => -1
        and the tiebreak (latest discharge) decides, mirroring the
        reference's keep-first-on-all--1 (calculate_match_score /
        resolve_duplicate_matches)."""
        d = dis.select(
            "uid",
            *[
                F.col(f"`{c}`").alias(f"dis_{c}")
                for c in dis.columns
                if c != "uid"
            ],
        )

        def score(j: DataFrame) -> Column:
            def closeness(a: str, b: str, cap: int, scale: float = 1.0) -> Column:
                if a not in j.columns or b not in j.columns:
                    return F.lit(None).cast("double")
                av = F.col(f"`{a}`").try_cast("double")
                bv = F.col(f"`{b}`").try_cast("double")
                return F.greatest(F.lit(0.0), cap - F.abs(av - bv) / scale)

            parts = [
                closeness("OFC.value", "dis_OFCDis.value", 10),
                closeness("Gestation.value", "dis_Gestation.value", 10),
                closeness("BirthWeight.value", "dis_BirthWeight.value", 5, 500.0),
            ]
            total = sum((F.coalesce(p, F.lit(0.0)) for p in parts), F.lit(0.0))
            made = sum(
                (F.when(p.isNotNull(), 1).otherwise(0) for p in parts), F.lit(0)
            )
            return F.when(made > 0, total).otherwise(F.lit(-1.0))

        return best_match_join(
            adm,
            d,
            ["uid"],
            score=score,
            tiebreak=[F.desc("dis_ingested_at"), F.desc("dis_id")],
        )

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

    # -- stage 13/14: merge_raw_data (step_7; merge_all.py:143-533) --------
    def merge_all(self, adm: DataFrame, dis: DataFrame) -> DataFrame:
        """Merged ALL table: admissions deduped on (uid, facility,
        admission datetime); the greedy tiered 1:1 assignment (J3b,
        merge_all.py:343-470) pairs each discharge with a free admission;
        matched pairs merge with discharge columns overwriting admission
        columns of the same name (merge_all.py:452 ``{**adm, **dis}``);
        leftovers keep their side; every row carries
        has_admission/has_discharge/is_closed/match_status
        (merge_all.py:485-510)."""

        def num(df: DataFrame, names: Sequence[str]) -> Column:
            for n in names:
                if n in df.columns:
                    return F.col(f"`{n}`").try_cast("double")
            return F.lit(None).cast("double")

        def ts_of(df: DataFrame, names: Sequence[str]) -> Column:
            parts = [
                parse_timestamp_multi(F.col(f"`{n}`").cast("string"))
                for n in names
                if n in df.columns
            ]
            if not parts:
                return F.lit(None).cast("timestamp")
            return F.coalesce(*parts) if len(parts) > 1 else parts[0]

        # dedup admissions on (uid, facility, admission datetime), min id
        # wins for the reference's keep-first (merge_all.py:281-287)
        dedup_keys: list = ["uid", "facility"]
        if "DateTimeAdmission.value" in adm.columns:
            dedup_keys.append(F.col("`DateTimeAdmission.value`"))
        adm = dedupe_keep_latest(adm, dedup_keys, [F.asc("id")])

        adm_ts = (
            F.col("admission_ts")
            if "admission_ts" in adm.columns
            else ts_of(adm, ["DateTimeAdmission.value"])
        )
        a_r = adm.select(
            "uid",
            "facility",
            F.col("id").alias("arid"),
            adm_ts.alias("ats"),
            num(adm, ["OFC.value"]).alias("ofc"),
            num(adm, ["BirthWeight.value"]).alias("bw"),
        )
        d_r = dis.select(
            "uid",
            "facility",
            F.col("id").alias("drid"),
            ts_of(dis, ["DateTimeDischarge.value", "DateTimeDeath.value"]).alias(
                "dts"
            ),
            num(dis, ["OFCDis.value", "OFC.value"]).alias("ofc"),
            num(dis, ["BirthWeight.value_dis", "BirthWeight.value"]).alias("bw"),
        )
        asg = tiered_asof_assignment(
            a_r, d_r, adm_ts="ats", dis_ts="dts", adm_id="arid", dis_id="drid"
        )

        adm_cols = [c for c in adm.columns if c not in ("uid", "facility")]
        dis_cols = [c for c in dis.columns if c not in ("uid", "facility")]
        a_pay = adm.select(
            F.col("id").alias("__arid"),
            *[F.col(f"`{c}`").alias(f"__a_{c}") for c in adm_cols],
        )
        d_pay = dis.select(
            F.col("id").alias("__drid"),
            *[F.col(f"`{c}`").alias(f"__d_{c}") for c in dis_cols],
        )

        hit = asg.filter(F.col("admission_rid").isNotNull())
        merged = (
            hit.join(a_pay, F.col("admission_rid") == F.col("__arid"))
            .join(d_pay, F.col("discharge_rid") == F.col("__drid"))
            .select(
                "uid",
                "facility",
                "match_status",
                *[
                    F.col(f"`__d_{c}`" if c in dis_cols else f"`__a_{c}`").alias(c)
                    for c in dict.fromkeys(adm_cols + dis_cols)
                ],
            )
        )
        adm_only = adm.join(
            hit.select(F.col("admission_rid").alias("__arid")),
            F.col("id") == F.col("__arid"),
            "left_anti",
        )
        dis_only = (
            asg.filter(F.col("admission_rid").isNull())
            .select("uid", "facility", "match_status", "discharge_rid")
            .join(d_pay, F.col("discharge_rid") == F.col("__drid"))
            .select(
                "uid",
                "facility",
                "match_status",
                *[F.col(f"`__d_{c}`").alias(c) for c in dis_cols],
            )
        )
        return lifecycle_union(merged, adm_only, dis_only)

    # -- incremental reconcile (J7; sql_functions.py:1960-2160) ------------
    def reconcile(
        self,
        all_table: DataFrame,
        new_adm: DataFrame | None = None,
        new_dis: DataFrame | None = None,
    ) -> DataFrame:
        """Complete open one-sided rows of the ALL table from newly arrived
        rows of the other side: admission-only rows take the first matching
        new discharge (and close), discharge-only rows the first matching
        new admission — the reference's update_has_admission_to_is_closed
        pair of UPDATE passes."""
        out = all_table
        if new_dis is not None:
            out = reconcile_update(
                out, new_dis, "has_admission", "has_discharge", order=[F.asc("id")]
            )
        if new_adm is not None:
            out = reconcile_update(
                out, new_adm, "has_discharge", "has_admission", order=[F.asc("id")]
            )
        return out

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
                self.merge_all(out["admissions_fixed"], out["discharges_fixed"]),
            )
        return out
