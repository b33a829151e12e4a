"""Whole-table summary twins: the reference's summary_admissions /
summary_discharges wide projections reproduced COLUMN-FOR-COLUMN.

Reference: create_summary_admissions_sql.py:44-280 and
create_summary_discharges_sql.py:26-175 — each builds one giant SELECT
over derived.admissions / derived.discharges from a column manifest,
injecting ``NULL AS alias`` for columns the source table does not have
(schema evolution, build_column_select / get_column_or_null), a 3-branch
multi-format timestamp CASE for date columns (``DD Mon,YYYY`` /
``YYYY Mon,DD`` / typed passthrough), null-coalescing CASE fallbacks for
the Thompson-score exam pairs (SuckTh->SuckReflex, FontTh->Fontanelle,
ToneTh->Tone, AgeCat->AgeCategory), and a numeric-regex-guarded DOUBLE
cast for MotherSatsO2.

This module keeps the reference's *builder* architecture: ONE manifest
drives BOTH the Spark projection and the DuckDB oracle SQL, so the two
can never drift (the reference builds its SQL from the live column list
the same way). The fixture has no Neotree tables, so the source table is
synthesized deterministically from ``orders`` inside both twins — every
source column is pure integer arithmetic on o_orderkey, identical in
both engines (no transcendentals, no engine RNG).

Differences preserved, not papered over:
- admissions' date CASE ends ``ELSE NULL`` (an unrecognized text format
  is DROPPED — create_summary_admissions_sql.py:95-102) while
  discharges' ends with a cast fallback (``ELSE CAST(.. AS timestamp)``,
  create_summary_discharges_sql.py:55-62) — modeled as try_cast, which
  is what the reference's behavior is on a typed column (the
  pg_typeof()-branch is statically false on text sources and statically
  true on typed ones; a text 'n/a' in the reference ERRORS the load —
  try_cast is the deliberate divergence, documented in README).
- the schema-evolution path is exercised: ADMISSIONS_MISSING /
  DISCHARGES_MISSING model a deployment whose source table lacks those
  columns, so their aliases are NULL-injected exactly like
  build_column_select does.
- the reference's NOT-EXISTS incremental INSERT wrapper is the j4
  operator (operators/dedup.incremental_append), not re-tested here.

Scale: both twins are single-scan stateless projections — no shuffle,
no UDF, fully codegen'd; at 100 TB they parallelize per input split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]
_RE_DMY = "^[0-9]{1,2} [A-Za-z]{3},[0-9]{4}$"
_RE_YMD = "^[0-9]{4} [A-Za-z]{3},[0-9]{1,2}$"
_RE_NUM = r"^[-+]?[0-9]*\.?[0-9]+([eE][-+]?[0-9]+)?$"

# ---------------------------------------------------------------------------
# Manifests: (alias, kind, *sources) in the reference's SELECT order.
# kinds: facility | uid | plain | bw_case | date_null | date_cast |
#        numguard | fallback (primary, secondary)
# create_summary_admissions_sql.py:93-279
# ---------------------------------------------------------------------------
ADMISSIONS_COLUMNS: list[tuple] = [
    ("Facility Name", "facility", "facility"),
    ("NeoTree_ID", "uid", "uid"),
    ("DateTime Admission", "date_null", "DateTimeAdmission.value"),
    ("Re-admission?", "plain", "Readmission.label"),
    ("Gender", "plain", "Gender.label"),
    ("Baby Cry Triage", "plain", "BabyCryTriage.label"),
    ("Further Triage", "plain", "FurtherTriage.label"),
    ("Danger Signs1", "plain", "DangerSigns.label"),
    ("Danger Signs2", "plain", "DangerSigns2.label"),
    ("Respiratory Rate", "plain", "RR.value"),
    ("Saturation in Air", "plain", "SatsAir.value"),
    ("Heart Rate", "plain", "HR.value"),
    ("Oxygen Saturation", "plain", "SatsO2.value"),
    ("Temperature", "plain", "Temperature.value"),
    ("Temperature Group", "plain", "TempGroup.value"),
    ("TempThermia", "plain", "TempThermia.value"),
    ("Blood Sugar mmol", "plain", "BSmmol.value"),
    ("Blood Sugar mg", "plain", "BSmg.value"),
    ("Admission Weight", "plain", "AW.value"),
    ("Admission Weight Group", "plain", "AWGroup.value"),
    ("Birth Weight", "bw_case", "BirthWeight.value"),
    ("Birth Weight Group", "plain", "BWGroup.value"),
    ("<28wks/1kg", "plain", "<28wks/1kg.value"),
    ("Low Birth Weight?", "plain", "LBWBinary"),
    ("Head Circumference (cm)", "plain", "OFC.value"),
    ("Admission Reason", "plain", "AdmReason.label"),
    ("Other admission reason", "plain", "AdmReasonOth.label"),
    ("AgeB.label", "plain", "AgeB.label"),
    ("AgeC.label", "plain", "AgeC.label"),
    ("AgeA.label", "plain", "AgeA.label"),
    ("Type of Birth", "plain", "TypeBirth.label"),
    ("Gestation", "plain", "Gestation.value"),
    ("Gestetation Group", "plain", "GestGroup.value"),
    ("Method of Gestation Extimation", "plain", "MethodEstGest.label"),
    ("Presentation", "plain", "Presentation.label"),
    ("Mode of Delivery", "plain", "ModeDelivery.label"),
    ("Meconium Present?", "plain", "MecPresent.label"),
    ("Cry at Birth?", "plain", "CryBirth.label"),
    ("Baby Colour", "plain", "Colour.label"),
    ("Apgar score at 1 min", "plain", "Apgar1.value"),
    ("Apgar score at 5 mins", "plain", "Apgar5.value"),
    ("Apgar score at 10 mins", "plain", "Apgar10.value"),
    ("Palate", "plain", "Palate.label"),
    ("Head Shape", "plain", "HeadShape.label"),
    ("Dysmorphic", "plain", "Dysmorphic.label"),
    ("Spine", "plain", "Spine.label"),
    ("Activity", "plain", "Activity.label"),
    ("Signs of Respiratory Distress", "plain", "SignsRD.label"),
    ("Work of breathing", "plain", "WOB.label"),
    ("Stethoscope use?", "plain", "Stethoscope.label"),
    ("Chest Auscultation", "plain", "ChestAusc.label"),
    ("Murmur", "plain", "Murmur.label"),
    ("Signs of Dehydration", "plain", "SignsDehydrations.label"),
    ("Abdomen", "plain", "Abdomen.label"),
    ("Umbilicus", "plain", "Umbilicus.label"),
    ("Genitalia", "plain", "Genitalia.label"),
    ("Anus2", "plain", "Anus2.label"),
    ("Musculoskeletal problems", "plain", "MSKproblems.label"),
    ("Skin tone", "plain", "Skin.label"),
    ("Breathing Problem", "plain", "BrProbs.label"),
    ("Vomiting", "plain", "Vomiting.label"),
    ("Feeding Review", "plain", "FeedingReview.label"),
    ("Stools Infant", "plain", "StoolsInfant.label"),
    ("SRNeuroOther", "plain", "SRNeuroOther.label"),
    ("GSCvsOM", "plain", "GSCvsOM.label"),
    ("InOrOut", "plain", "InOrOut.label"),
    ("Other Referred From", "plain", "ReferredFrom2.label"),
    ("Referred From", "plain", "ReferredFrom.label"),
    ("Other Referral Facility", "plain", "OtherReferralFacility.label"),
    ("Place of Birth", "plain", "PlaceBirth.label"),
    ("Birth Facility", "plain", "BirthFacility.label"),
    ("Same birth place?", "plain", "BirthPlaceSame.label"),
    ("Other Birth Facility", "plain", "OtherBirthFacility.label"),
    ("Mothers Disctrict", "plain", "MatPhysAddressDistrict.label"),
    ("Mathors Age in years", "plain", "MatAgeYrs.value"),
    ("Marital Status", "plain", "MaritalStat.label"),
    ("Ethnicity", "plain", "Ethnicity.label"),
    ("Tribe", "plain", "Tribe.label"),
    ("Other Tribe", "plain", "TribeOther.label"),
    ("Religion", "plain", "Religion.label"),
    ("Other Religion", "plain", "ReligionOther.label"),
    ("HIV test?", "plain", "MatHIVtest.label"),
    ("ANVDRL", "plain", "ANVDRL.label"),
    ("Date of HIV test", "date_null", "DateHIVtest.value"),
    ("When HIV test was done", "plain", "TestThisPreg.label"),
    ("HIV test Result", "plain", "HIVtestResult.label"),
    ("HAART", "plain", "HAART.label"),
    ("Length of HAART", "plain", "LengthHAART.label"),
    ("NVP given?", "plain", "NVPgiven.label"),
    ("ANVDRLDate", "date_null", "ANVDRLDate.value"),
    ("Date of VDRL Same as HIV Test Date?", "plain", "DateVDRLSameHIV.value"),
    ("ANVDRL Result", "plain", "ANVDRLResult.label"),
    ("Conditions in Pregnancy", "plain", "PregConditions.label"),
    ("Antenatal Care", "plain", "AntenatalCare.label"),
    ("Mataternal Syphillis Treated?", "plain", "ANMatSyphTreat.label"),
    ("IPT Taken", "plain", "IPT.label"),
    ("FeFo", "plain", "FeFo.label"),
    ("TTV", "plain", "TTV.label"),
    ("Antenatal Steroids", "plain", "ANSteroids.label"),
    ("Problems in Labor", "plain", "ProbsLab.label"),
    ("Duration in Labor", "plain", "DurationLab.label"),
    ("ROM", "plain", "ROM.label"),
    ("ROM Length", "plain", "ROMLength.value"),
    ("Risk Factors for Sepsis", "plain", "RFSepsis.label"),
    ("Resusitation", "plain", "Resus.label"),
    ("IM vit K given at birth?", "plain", "VitK.label"),
    ("TEO given at birth?", "plain", "TetraEye.label"),
    ("Chlorhexidine on umbilicus at birth?", "plain", "Chlor.label"),
    ("Plan", "plain", "Plan.label"),
    ("Other Plan", "plain", "PlanOth.label"),
    ("RespSR", "plain", "RespSR.value"),
    ("Diagnoses", "plain", "Diagnoses.label"),
    ("Other Diagnoses", "plain", "DiagnosesOth.label"),
    ("Diagnosis (Surgical Cond)", "plain", "DiagnosisSurgicalCond.label"),
    ("Admission Reason (Surgical Cond)", "plain", "AdmReaSurgCond.label"),
    ("Admission Source", "plain", "AdmittedFrom.label"),
    ("Meconium?", "plain", "PassedMec.label"),
    ("Passing Urine?", "plain", "PUNewborn.label"),
    ("Passing urine? (infant)", "plain", "PUInfant.label"),
    ("Suck Reflex", "fallback", "SuckTh.label", "SuckReflex.label"),
    ("Fontanelle", "fallback", "FontTh.label", "Fontanelle.label"),
    ("Tone", "fallback", "ToneTh.label", "Tone.label"),
    ("Level of Conciousness", "plain", "LOCTh.label"),
    ("Fits, Seizures or convulsions", "plain", "FitsTh.label"),
    ("Respiration", "plain", "RespTh.label"),
    ("Thompson Score", "plain", "ThompScore.label"),
    ("Posture", "plain", "PostTh.label"),
    ("Moro reflex", "plain", "MoroTh.label"),
    ("Grasp reflex", "plain", "GraspTh.label"),
    ("Reason for CS", "plain", "Reason.label"),
    ("Other Reason for CS", "plain", "ReasonOther.label"),
    ("Length of Resusitation", "plain", "LengthResus.value"),
    ("Length of Resusitation (Known)", "plain", "LengthResusKnown.label"),
    ("Meconium Thick or Thin", "plain", "MecThickThin.label"),
    ("Cardiovascular exam", "plain", "CRT.label"),
    ("Femorals", "plain", "Femorals.label"),
    ("HypoSxYN", "plain", "HypoSxYN.label"),
    ("Chest Ausc", "plain", "ChestAusc"),
    ("Respiratory Support", "plain", "RespSR"),
    ("RISK for Covid?", "plain", "RISKCovid.label"),
    ("External Source", "plain", "EXTERNALSOURCE.label"),
    ("Mothers Symptoms", "plain", "MatSymptoms.label"),
    ("Mothers Diagnosis", "plain", "MothersDiagnosis.label"),
    ("Mother Oxygen saturations", "numguard", "MotherSatsO2.value"),
    ("is mother present?", "plain", "MotherPresent.label"),
    ("Other Ethnicity", "plain", "EthnicityOther.label"),
    ("Manual Heart Rate", "plain", "ManualHR.label"),
    ("MatComorbidities", "plain", "MatComorbidities.label"),
    ("MatComorbidities.value", "plain", "MatComorbidities.value"),
    ("DOBYN.value", "plain", "DOBYN.value"),
    ("Age Estimated", "plain", "AgeEst.label"),
    ("Age", "plain", "Age.value"),
    ("Age Category", "fallback", "AgeCat.label", "AgeCategory"),
    ("BirthWeight", "plain", "BirthWeight.value"),
]

# a deployment whose derived.admissions lacks these columns — each alias
# referencing them is NULL-injected, build_column_select's behavior
ADMISSIONS_MISSING = {"LBWBinary", "ChestAusc", "RespSR", "AgeCategory"}

# create_summary_discharges_sql.py:51-168
DISCHARGES_COLUMNS: list[tuple] = [
    ("Facility Name", "facility", "facility"),
    ("Neotree_ID", "uid", "uid"),
    ("Started_at", "date_cast", "started_at"),
    ("Completed_at", "date_cast", "completed_at"),
    ("Time Spent", "plain", "time_spent"),
    ("DateAdmissionDC", "date_cast", "DateAdmissionDC.value"),
    ("DateTime of Discharge", "date_cast", "DateTimeDischarge.value"),
    ("Outcome", "plain", "NeoTreeOutcome.label"),
    ("Apgar score at 1min DC", "plain", "Apgar1DC.value"),
    ("Apgar score at 5mins DC", "plain", "Apgar5DC.value"),
    ("Apgar score at 10mins DC", "plain", "Apgar10DC.value"),
    ("HIV test Result DC", "plain", "HIVtestResultDC.label"),
    ("NVP given?", "plain", "NVPgiven.value"),
    ("Mode of Delivery DC", "plain", "ModeDeliveryDC.label"),
    ("Date Discharge Vitals taken", "date_cast", "DateDischVitals.value"),
    ("Birth Weight (g) DC", "plain", "BWDC.value"),
    ("Gestation DC", "plain", "GestationDC.value"),
    ("Discharge Heart Rate", "plain", "DischHR.value"),
    ("Discharge Oxygen Saturations", "plain", "DischSats.value"),
    ("Discharge Temperature", "plain", "DischTemp.value"),
    ("Discharge Respiratory Rate", "plain", "DischRR.value"),
    ("Discharge Weight (g)", "plain", "DischWeight.value"),
    ("Date of Discharge Weight", "date_cast", "DateDischWeight.value"),
    ("Discharge Primary Diagnosis", "plain", "DIAGDIS1.label"),
    ("Other discharge diagnosis", "plain", "DIAGDIS1OTH.value"),
    ("Thermoregulation during admission", "plain", "ThermCare.label"),
    ("Feeds during admission", "plain", "FeedsAdm.label"),
    ("Respiratory Support", "plain", "RESPSUP.label"),
    ("Date Weaned off the support", "date_cast", "DateWeaned.value"),
    ("Phototherapy given during admission?", "plain", "PHOTOTHERAPY.label"),
    ("Medications Given", "plain", "MedsGiven.label"),
    ("Other medications given", "plain", "MEDOTH.label"),
    ("Baby review clinic organized?", "plain", "REVCLIN.label"),
    ("Baby review clinic", "plain", "REVCLINTYP.label"),
    ("Other baby review clinic", "plain", "REVCLINOTH.value"),
    ("Date of clinic review", "plain", "CLINREVDAT.value"),
    ("Health Education given?", "plain", "HealthEd.label"),
    ("Other Problems", "plain", "OtherProbs.label"),
    ("Other Problems (additional)", "plain", "OtherProbsOth.label"),
    ("DateTime of Death", "date_cast", "DateTimeDeath.value"),
    ("Cause of Death", "plain", "CauseDeath.label"),
    ("Other Cause of Death_", "plain", "CauseDeathOther.value"),
    ("Other Cause of death", "plain", "CauseDeathOth.value"),
    ("Contributory Cause of Death", "plain", "ContCauseDeath.label"),
    ("Other Contributory cause of death", "plain", "ContribOth.label"),
    ("Modifable Factor1", "plain", "ModFactor1.value"),
    ("Modifable Factor2", "plain", "ModFactor2.value"),
    ("Modifable Factor3", "plain", "ModFactor3.value"),
    ("Covid Risk?", "plain", "DiscCovidRisk.label"),
    (
        "Discharge Surgical Conditions diagnosis",
        "plain",
        "DiscDiagSurgicalCond.label",
    ),
    ("Covid Repeat Results", "plain", "CovidRepResults.label"),
    ("Covid Confirmation", "plain", "CovidConfirmation.label"),
]

DISCHARGES_MISSING = {"CovidRepResults.label", "CovidConfirmation.label"}


# ---------------------------------------------------------------------------
# Deterministic source synthesis — identical integer arithmetic on
# o_orderkey in both engines. One seed per distinct source column.
# ---------------------------------------------------------------------------
def _seed_map(manifest: list[tuple], missing: set[str]) -> dict[str, int]:
    seeds: dict[str, int] = {}
    for entry in manifest:
        for src in entry[2:]:
            if src not in seeds and src not in missing:
                seeds[src] = len(seeds)
    return seeds


def _date_sources(manifest: list[tuple]) -> set[str]:
    return {e[2] for e in manifest if e[1] in ("date_null", "date_cast")}


def _numguard_sources(manifest: list[tuple]) -> set[str]:
    return {e[2] for e in manifest if e[1] == "numguard"}


def _synth_sql(src: str, seed: int, kind: str, uid_prefix: str) -> str:
    """DuckDB synthesis of the same source column (mirror of _synth_col)."""
    k = f"(o_orderkey + {seed})"
    if kind == "uid":
        return f"'{uid_prefix}' || CAST(o_orderkey AS STRING)"
    if kind == "facility":
        return f"'FAC-' || CAST({k} % 5 AS STRING)"
    if kind == "date":
        day = f"CAST(1 + {k} % 28 AS STRING)"
        yr = f"CAST(1995 + {k} % 6 AS STRING)"
        mon_case = "CASE 1 + {k} % 12 {w} END".format(
            k=k,
            w=" ".join(
                f"WHEN {i + 1} THEN '{m}'" for i, m in enumerate(_MONTHS)
            ),
        )
        iso = (
            f"{yr} || '-' || lpad(CAST(1 + {k} % 12 AS STRING), 2, '0') || "
            f"'-' || lpad({day}, 2, '0') || ' 08:30:00'"
        )
        return (
            f"CASE {k} % 5 "
            f"WHEN 0 THEN {day} || ' ' || {mon_case} || ',' || {yr} "
            f"WHEN 1 THEN {yr} || ' ' || {mon_case} || ',' || {day} "
            f"WHEN 2 THEN {iso} "
            f"WHEN 3 THEN 'n/a' END"
        )
    if kind == "numguard":
        return (
            f"CASE {k} % 5 WHEN 0 THEN '97.5' WHEN 1 THEN '88' "
            f"WHEN 2 THEN 'abc' WHEN 3 THEN '9e1' END"
        )
    if kind == "numeric":
        return f"CASE WHEN {k} % 11 <> 0 THEN CAST({k} % 140 AS STRING) END"
    return (
        f"CASE WHEN {k} % 11 <> 0 "
        f"THEN '{src}#' || CAST({k} % 5 AS STRING) END"
    )


def _sql_str(s: str) -> str:
    """Spark-SQL single-quoted string literal: double every backslash
    (the default parser treats backslash as an escape inside literals)
    and escape single quotes."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _synth_spark_sql(src: str, seed: int, kind: str, uid_prefix: str) -> str:
    """Spark-SQL synthesis of one source column — the TEXT twin of
    ``_synth_col``, expression-for-expression (r13, guide §7.3 avoid
    generating gigantic expression trees driver-side: building the two
    154-column projections as Column objects cost ~2.6 s of pure py4j
    round-trips per query construction — one selectExpr string parses
    JVM-side in milliseconds)."""
    k = f"(o_orderkey + {seed})"
    if kind == "uid":
        return f"concat('{uid_prefix}', CAST(o_orderkey AS STRING))"
    if kind == "facility":
        return f"concat('FAC-', CAST({k} % 5 AS STRING))"
    if kind == "date":
        day = f"CAST(1 + {k} % 28 AS STRING)"
        yr = f"CAST(1995 + {k} % 6 AS STRING)"
        months = ", ".join(f"'{m}'" for m in _MONTHS)
        mon = f"element_at(array({months}), CAST(1 + {k} % 12 AS INT))"
        iso = (
            f"concat({yr}, '-', lpad(CAST(CAST(1 + {k} % 12 AS INT) "
            f"AS STRING), 2, '0'), '-', lpad({day}, 2, '0'), ' 08:30:00')"
        )
        return (
            f"CASE WHEN {k} % 5 = 0 THEN concat({day}, ' ', {mon}, ',', {yr}) "
            f"WHEN {k} % 5 = 1 THEN concat({yr}, ' ', {mon}, ',', {day}) "
            f"WHEN {k} % 5 = 2 THEN {iso} "
            f"WHEN {k} % 5 = 3 THEN 'n/a' END"
        )
    if kind == "numguard":
        return (
            f"CASE WHEN {k} % 5 = 0 THEN '97.5' WHEN {k} % 5 = 1 THEN '88' "
            f"WHEN {k} % 5 = 2 THEN 'abc' WHEN {k} % 5 = 3 THEN '9e1' END"
        )
    if kind == "numeric":
        return (
            f"CASE WHEN {k} % 11 != 0 THEN CAST({k} % 140 AS STRING) END"
        )
    return (
        f"CASE WHEN {k} % 11 != 0 "
        f"THEN concat({_sql_str(src + '#')}, CAST({k} % 5 AS STRING)) END"
    )


def _parse_date_spark_sql(ref: str, else_cast: bool) -> str:
    """Spark-SQL twin of ``_parse_date_col`` (same CASE structure; the
    regex literals double their backslashes for the SQL parser)."""
    tail = f"ELSE TRY_CAST({ref} AS TIMESTAMP) " if else_cast else ""
    return (
        f"CASE WHEN {ref} RLIKE {_sql_str(_RE_DMY)} "
        f"THEN try_to_timestamp(concat({ref}, ' 00:00:00'), "
        f"'d MMM,yyyy HH:mm:ss') "
        f"WHEN {ref} RLIKE {_sql_str(_RE_YMD)} "
        f"THEN try_to_timestamp(concat({ref}, ' 00:00:00'), "
        f"'yyyy MMM,d HH:mm:ss') "
        f"{tail}END"
    )


def _source_kind(src: str, manifest: list[tuple]) -> str:
    if src == "uid":
        return "uid"
    if src == "facility":
        return "facility"
    if src in _date_sources(manifest):
        return "date"
    if src in _numguard_sources(manifest):
        return "numguard"
    if src.endswith(".value") or src == "time_spent":
        return "numeric"
    return "label"


# ---------------------------------------------------------------------------
# Projection builders — one per manifest kind, Spark + SQL in lockstep.
# ---------------------------------------------------------------------------
def _q(name: str) -> str:
    return '"' + name + '"'


def _bq(name: str) -> str:
    """Spark-SQL backquoted identifier (column names carry dots, spaces,
    '?', '<', '/'; embedded backquotes would need doubling — none occur
    in the manifests)."""
    return "`" + name.replace("`", "``") + "`"


def _parse_date_sql(ref: str, else_cast: bool) -> str:
    tail = (
        f"ELSE TRY_CAST({ref} AS TIMESTAMP)" if else_cast else "ELSE NULL"
    )
    return (
        f"CASE WHEN regexp_matches({ref}, '{_RE_DMY}') "
        f"THEN try_strptime({ref} || ' 00:00:00', '%-d %b,%Y %H:%M:%S') "
        f"WHEN regexp_matches({ref}, '{_RE_YMD}') "
        f"THEN try_strptime({ref} || ' 00:00:00', '%Y %b,%-d %H:%M:%S') "
        f"{tail} END"
    )


def build_summary(
    base: DataFrame,
    manifest: list[tuple],
    missing: set[str],
    uid_prefix: str,
) -> DataFrame:
    """Spark twin: stage the synthesized source table (one narrow select,
    mirrors reading derived.admissions), then apply the full wide
    projection. Both selects are stateless scan-stage expressions.

    r13 (guide §7.3): both projections are built as SQL TEXT and handed
    to ONE ``selectExpr`` each — the previous Column-object construction
    made ~5 000 py4j round-trips per query build (~2.6 s per bench
    execution, dominating the query); the text form parses JVM-side.
    The expressions are the same, node for node (``_synth_spark_sql`` /
    ``_parse_date_spark_sql`` mirror the manifest kinds exactly), so the
    physical plan and output are unchanged."""
    seeds = _seed_map(manifest, missing)
    staged = base.selectExpr(
        *[
            f"{_synth_spark_sql(s, i, _source_kind(s, manifest), uid_prefix)}"
            f" AS {_bq(s)}"
            for s, i in seeds.items()
        ]
    )

    def ref(name: str) -> str:
        if name in missing:
            return "CAST(NULL AS STRING)"
        return _bq(name)

    exprs: list[str] = []
    for alias, kind, *srcs in manifest:
        a = _bq(alias)
        r = ref(srcs[0])
        if kind in ("facility", "uid", "plain"):
            exprs.append(f"{r} AS {a}")
        elif kind == "bw_case":
            exprs.append(f"CASE WHEN {r} IS NOT NULL THEN {r} END AS {a}")
        elif kind == "date_null":
            exprs.append(f"{_parse_date_spark_sql(r, False)} AS {a}")
        elif kind == "date_cast":
            exprs.append(f"{_parse_date_spark_sql(r, True)} AS {a}")
        elif kind == "numguard":
            exprs.append(
                f"CASE WHEN {r} RLIKE {_sql_str(_RE_NUM)} "
                f"THEN CAST({r} AS DOUBLE) END AS {a}"
            )
        elif kind == "fallback":
            p, s = ref(srcs[0]), ref(srcs[1])
            exprs.append(
                f"CASE WHEN {p} IS NULL THEN {s} ELSE {p} END AS {a}"
            )
        else:  # pragma: no cover - manifest typo guard
            raise ValueError(f"unknown manifest kind {kind!r}")
    return staged.selectExpr(*exprs)


def build_summary_oracle(
    manifest: list[tuple],
    missing: set[str],
    uid_prefix: str,
    base_table: str = "orders",
) -> str:
    """DuckDB twin generated from the SAME manifest (the reference's own
    build-SQL-from-column-list architecture)."""
    seeds = _seed_map(manifest, missing)
    synth = ",\n      ".join(
        f"{_synth_sql(s, i, _source_kind(s, manifest), uid_prefix)} "
        f"AS {_q(s)}"
        for s, i in seeds.items()
    )

    def ref(name: str) -> str:
        return "NULL" if name in missing else _q(name)

    lines: list[str] = []
    for alias, kind, *srcs in manifest:
        a = _q(alias)
        if kind in ("facility", "uid", "plain"):
            lines.append(f"{ref(srcs[0])} AS {a}")
        elif kind == "bw_case":
            r = ref(srcs[0])
            lines.append(f"CASE WHEN {r} IS NOT NULL THEN {r} END AS {a}")
        elif kind == "date_null":
            lines.append(f"{_parse_date_sql(ref(srcs[0]), False)} AS {a}")
        elif kind == "date_cast":
            lines.append(f"{_parse_date_sql(ref(srcs[0]), True)} AS {a}")
        elif kind == "numguard":
            r = ref(srcs[0])
            lines.append(
                f"CASE WHEN regexp_matches({r}, '{_RE_NUM}') "
                f"THEN CAST({r} AS DOUBLE) END AS {a}"
            )
        elif kind == "fallback":
            p, s = ref(srcs[0]), ref(srcs[1])
            lines.append(
                f"CASE WHEN {p} IS NULL THEN {s} ELSE {p} END AS {a}"
            )
        else:  # pragma: no cover
            raise ValueError(f"unknown manifest kind {kind!r}")
    select = ",\n      ".join(lines)
    return (
        f"WITH src_table AS (\n  SELECT\n      {synth}\n"
        f"  FROM {base_table}\n)\nSELECT\n      {select}\nFROM src_table"
    )
