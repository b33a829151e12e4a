"""End-to-end engine test over FIXTURES.md-shaped session envelopes:
import -> dedup -> tidy -> fixes -> summaries -> join -> views -> clean ->
merge, mirroring the reference DAG (pipeline.py:21-40)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.plans.pipeline import Engine, EngineConfig

import pytest

# r13 (VERDICT r12 #2): heavyweight integration tail — excluded from the
# default driver-window run; executed by the builder via `-m slow`.
pytestmark = pytest.mark.slow


ADM_SCRIPT = "-ZO1TK4zMvLhxTw6eKia"
DIS_SCRIPT = "-ZO2DISxMvLhxTw6eKia"


def _new_entries(uid, gest, bw, outcome_label, outcome_value, temp="36.1"):
    e = {
        "Gestation": {"values": {"label": ["Gestation"], "value": [str(gest)]}},
        "BW": {"values": {"label": ["Birth weight"], "value": [str(bw)]}},
        "Temperature": {"values": {"label": ["Temperature"], "value": [temp]}},
        "DateTimeAdmission": {
            "values": {"label": ["Admission date"], "value": ["2024-03-01T09:55:00"]}
        },
        "DOBTOB": {"values": {"label": ["DOB"], "value": ["2024-02-28T22:00:00"]}},
        "AdmReason": {
            "values": {"label": ["Prematurity", "Sepsis risk"], "value": ["Prem", "RFSep"]}
        },
    }
    if outcome_value is not None:
        e["NeoTreeOutcome"] = {
            "values": {"label": [outcome_label], "value": [outcome_value]}
        }
    if uid is not None:
        e["NeoTreeID"] = {"values": {"label": ["NeoTree ID"], "value": [uid]}}
    return json.dumps({"entries": e})


def _old_entries(uid, bw):
    return json.dumps(
        {
            "entries": [
                {"key": "NeoTreeID", "values": [{"label": "id", "value": uid}]},
                {"key": "BW", "values": [{"label": "Birth weight", "value": str(bw)}]},
            ]
        }
    )


FIELD_INFO = {
    "admissions": {
        "Gestation": {"label": "Gestation", "type": "number", "options": []},
        "BirthWeight": {"label": "Birth weight", "type": "number", "options": []},
        "Temperature": {"label": "Temperature", "type": "number", "options": []},
        "DateTimeAdmission": {"label": "Admission date", "type": "datetime",
                              "options": []},
        "DOBTOB": {"label": "DOB", "type": "datetime", "confidential": True,
                   "options": []},
        "NeoTreeOutcome": {
            "label": "Outcome",
            "type": "dropdown",
            "options": [
                {"value": "DC", "valueLabel": "Discharged"},
                {"value": "NND", "valueLabel": "Died"},
            ],
        },
        "AdmReason": {"label": "Admission Reason", "type": "multi_select",
                      "options": [{"value": "Prem", "valueLabel": "Prematurity"},
                                  {"value": "RFSep",
                                   "valueLabel": "Risk factors for sepsis"}]},
    },
    "discharges": {
        "NeoTreeOutcome": {
            "label": "Outcome",
            "type": "dropdown",
            "options": [{"value": "DC", "valueLabel": "Discharged"}],
        },
    },
}


def _sessions(spark):
    rows = [
        # two uploads of the same admission: dedup keeps id=2
        (1, "A7C6-0350", ADM_SCRIPT, "2024-03-01 10:00:00",
         _new_entries("A7C6-0350", 34, 2100, "Outcome", "DC")),
        (2, "A7C6-0350", ADM_SCRIPT, "2024-03-01 11:00:00",
         _new_entries("A7C6-0350", 34, 2100, "Outcome", "DC")),
        # null envelope uid repaired from entries (old format)
        (3, None, ADM_SCRIPT, "2024-03-02 10:00:00", _old_entries("F55F-0118", 2350)),
        # a third patient, label already correct
        (4, "B111-0001", ADM_SCRIPT, "2024-03-03 10:00:00",
         _new_entries("B111-0001", 28, 900, "Died", "NND")),
        # discharge for the first patient
        (5, "A7C6-0350", DIS_SCRIPT, "2024-03-05 10:00:00",
         json.dumps({"entries": {
             "NeoTreeOutcome": {"values": {"label": ["Outcome"], "value": ["DC"]}}
         }})),
    ]
    return spark.createDataFrame(
        [(i, u, s, t, d) for i, u, s, t, d in rows],
        "id long, uid string, scriptid string, ingested_at string, data string",
    ).withColumn("ingested_at", F.col("ingested_at").cast("timestamp"))


def _engine():
    return Engine(
        EngineConfig(
            scripts={ADM_SCRIPT: "admissions", DIS_SCRIPT: "discharges"},
            facility_map={ADM_SCRIPT: "Harare NNU", DIS_SCRIPT: "Harare NNU"},
            field_info=FIELD_INFO,
        )
    )


def test_engine_end_to_end(spark):
    out = _engine().run(_sessions(spark))

    # stage 2: last-upload-wins (id=1 dropped), uid repaired for id=3
    dd = out["deduplicated"].select("id", "uid").collect()
    assert {r.id for r in dd} == {2, 3, 4, 5}
    assert {r.uid for r in dd} == {"A7C6-0350", "F55F-0118", "B111-0001"}

    # stage 3: wide admissions with Key.value pairs; BW renamed to BirthWeight
    adm = out["admissions"]
    assert "Gestation.value" in adm.columns and "BirthWeight.value" in adm.columns
    by_uid = {r["uid"]: r for r in adm.collect()}
    assert by_uid["F55F-0118"]["BirthWeight.value"] == "2350"
    assert len(by_uid) == 3

    # MCL explode: AdmReason contributes one row per selected label
    mcl = out["admissions_mcl"].filter(F.col("key") == "AdmReason")
    assert mcl.count() == 4  # 2 admissions x 2 selected options

    # stage 4: label repair fixed the question-label row to the option label
    fixed = {r["uid"]: r for r in out["admissions_fixed"].collect()}
    assert fixed["A7C6-0350"]["NeoTreeOutcome.label"] == "Discharged"
    assert fixed["B111-0001"]["NeoTreeOutcome.label"] == "Died"

    # stage 6: monthly rollup counts every admission in its month
    summ = out["summary_admissions"].collect()
    assert sum(r.admissions for r in summ) == 3

    # stage 7: join carries the discharge outcome onto the admission
    joined = {r["uid"]: r for r in out["joined"].collect()}
    assert joined["A7C6-0350"]["dis_NeoTreeOutcome.value"] == "DC"
    assert joined["F55F-0118"]["dis_NeoTreeOutcome.value"] is None

    # stage 9: convenience buckets derived from typed values
    conv = {r["uid"]: r for r in out["convenience"].collect()}
    assert conv["B111-0001"]["BWGroup"] is not None

    # stage 10: counts per facility
    counts = out["summary_counts"].collect()
    assert counts[0]["patients"] == 3

    # stage 12: clean table is lowercase and carries no confidential columns
    clean = out["clean_admissions"]
    assert all(c == c.lower() for c in clean.columns)
    assert not any("dobtob" in c for c in clean.columns)
    assert "gestation" in clean.columns

    # stage 13: merged ALL carries the lifecycle columns; the discharge
    # (no OFC/BW/datetime) pairs with its uid's only admission via the
    # datetime fallback => ambiguous + closed (merge_all.py:430-432)
    allt = {r["uid"]: r for r in out["merged_all"].collect()}
    assert len(allt) == 3
    m = allt["A7C6-0350"]
    assert m["has_admission"] and m["has_discharge"] and m["is_closed"]
    assert m["match_status"] == "ambiguous"
    assert m["NeoTreeOutcome.value"] == "DC"
    for u in ("F55F-0118", "B111-0001"):
        r = allt[u]
        assert r["has_admission"] and not r["has_discharge"]
        assert not r["is_closed"]
        assert r["match_status"] == "unmatched_admission"


def test_engine_from_json_files(tmp_path, spark):
    """S1 front half: real .json export files through read_session_files
    into Engine.run (import_raw_jsons.py:31-215)."""
    import json as _json

    from neotree_data_pipeline_kedro_spark.sources.sessions import read_session_files

    def session_obj(uid, entries, script=ADM_SCRIPT):
        return {
            "uid": uid,
            "script": {"id": script},
            "completed_at": "2024-03-01T10:00:00",
            "entries": entries,
        }

    new_e = _json.loads(_new_entries("A7C6-0350", 34, 2100, "Outcome", "DC"))["entries"]
    old_e = _json.loads(_old_entries("F55F-0118", 2350))["entries"]
    (tmp_path / "export1.json").write_text(
        _json.dumps(
            {
                "sessions": [
                    session_obj("A7C6-0350", new_e),
                    session_obj(None, old_e),  # uid repaired from entries
                    {"uid": "DROP-01", "entries": {}},  # no script id: dropped
                ]
            }
        )
    )
    (tmp_path / "Chinhoyi_Maternity_Outcome.json").write_text(
        _json.dumps({"sessions": [session_obj("C111-0001", new_e, script="-ORIG")]})
    )

    sessions = read_session_files(spark, str(tmp_path / "*.json"))
    rows = {r.uid: r for r in sessions.collect()}
    assert set(rows) == {"A7C6-0350", "F55F-0118", "C111-0001"}
    assert rows["F55F-0118"].scriptid == ADM_SCRIPT
    # per-file script reroute
    assert rows["C111-0001"].scriptid == "-MYk0A3-Z_QjaXYU5MsS"
    assert rows["A7C6-0350"].ingested_at is not None
    assert len({r.id for r in rows.values()}) == 3  # surrogate ids distinct

    # skip-existing probe
    existing = spark.createDataFrame([("A7C6-0350",)], ["uid"])
    left = read_session_files(
        spark, str(tmp_path / "*.json"), existing_uids=existing
    )
    assert {r.uid for r in left.collect()} == {"F55F-0118", "C111-0001"}

    # end-to-end: the file scan feeds the engine unchanged
    out = _engine().run(sessions.filter(F.col("scriptid") == ADM_SCRIPT))
    adm = {r["uid"]: r for r in out["admissions"].collect()}
    assert adm["F55F-0118"]["BirthWeight.value"] == "2350"
    assert adm["A7C6-0350"]["Gestation.value"] == "34"


def test_engine_files_to_warehouse_integration(tmp_path, spark):
    """The full product path in one test: .json export files (S1 glob scan,
    both scripts) -> Engine.run 14-stage DAG -> parquet warehouse via the
    materialize hook; per-stage row counts and ALL-table lifecycle flags
    asserted from the WAREHOUSE files (what a downstream consumer reads),
    not the in-memory frames."""
    import json as _json

    from neotree_data_pipeline_kedro_spark.sources.sessions import (
        read_session_files,
    )

    def session_obj(uid, entries, script):
        return {
            "uid": uid,
            "script": {"id": script},
            "completed_at": "2024-03-01T10:00:00",
            "entries": entries,
        }

    def dis_entries(uid):
        return {
            "NeoTreeID": {"values": {"label": ["NeoTree ID"], "value": [uid]}},
            "NeoTreeOutcome": {"values": {"label": ["Outcome"], "value": ["DC"]}},
        }

    adm = [
        session_obj(
            "A7C6-0350",
            _json.loads(_new_entries("A7C6-0350", 34, 2100, "Outcome", "DC"))["entries"],
            ADM_SCRIPT,
        ),
        # duplicate upload of the same admission: dedup must keep one
        session_obj(
            "A7C6-0350",
            _json.loads(_new_entries("A7C6-0350", 34, 2100, "Outcome", "DC"))["entries"],
            ADM_SCRIPT,
        ),
        session_obj(
            "B111-0001",
            _json.loads(_new_entries("B111-0001", 28, 900, "Died", "NND"))["entries"],
            ADM_SCRIPT,
        ),
    ]
    dis = [session_obj("A7C6-0350", dis_entries("A7C6-0350"), DIS_SCRIPT)]
    (tmp_path / "export_adm.json").write_text(_json.dumps({"sessions": adm}))
    (tmp_path / "export_dis.json").write_text(_json.dumps({"sessions": dis}))

    warehouse = tmp_path / "warehouse"

    def materialize(name, df):
        df.write.mode("overwrite").parquet(str(warehouse / name))
        return df

    sessions = read_session_files(spark, str(tmp_path / "export_*.json"))
    Engine(
        EngineConfig(
            scripts={ADM_SCRIPT: "admissions", DIS_SCRIPT: "discharges"},
            facility_map={ADM_SCRIPT: "Harare NNU", DIS_SCRIPT: "Harare NNU"},
            field_info=FIELD_INFO,
        ),
        materialize=materialize,
    ).run(sessions)

    def wh(name):
        return spark.read.parquet(str(warehouse / name))

    # per-stage row counts from the warehouse
    assert wh("bronze").count() == 4  # 3 adm uploads + 1 dis
    assert wh("deduplicated").count() == 3  # duplicate upload collapsed
    assert wh("admissions").count() == 2
    assert wh("discharges").count() == 1
    assert wh("admissions_fixed").count() == 2
    assert wh("joined").count() == 2  # left join keeps both admissions
    assert wh("summary_counts").collect()[0]["patients"] == 2
    clean = wh("clean_admissions")
    assert clean.count() == 2
    assert not any("dobtob" in c for c in clean.columns)  # confidential gone

    # lifecycle flags on the warehouse ALL table
    allt = {r["uid"]: r for r in wh("merged_all").collect()}
    assert len(allt) == 2
    assert allt["A7C6-0350"]["has_admission"]
    assert allt["A7C6-0350"]["has_discharge"]
    assert allt["A7C6-0350"]["is_closed"]
    assert allt["A7C6-0350"]["NeoTreeOutcome.value"] == "DC"
    assert allt["B111-0001"]["has_admission"]
    assert not allt["B111-0001"]["has_discharge"]
    assert not allt["B111-0001"]["is_closed"]
    assert allt["B111-0001"]["match_status"] == "unmatched_admission"


def test_engine_reconcile_completes_open_rows(spark):
    eng = _engine()
    out = eng.run(_sessions(spark))
    new_dis = spark.createDataFrame(
        [(99, "F55F-0118", "Harare NNU", "DC", "Discharged")],
        "id long, uid string, facility string, "
        "`NeoTreeOutcome.value` string, `NeoTreeOutcome.label` string",
    )
    rec = {r["uid"]: r for r in eng.reconcile(out["merged_all"], new_dis=new_dis).collect()}
    # the open admission-only row completes and closes
    assert rec["F55F-0118"]["has_discharge"] and rec["F55F-0118"]["is_closed"]
    assert rec["F55F-0118"]["NeoTreeOutcome.value"] == "DC"
    # untouched rows keep their lifecycle state
    assert not rec["B111-0001"]["has_discharge"]
    assert rec["A7C6-0350"]["is_closed"]


def test_engine_materialize_hook(spark):
    seen = []
    eng = _engine()
    eng._mat = lambda name, df: seen.append(name) or df
    eng.run(_sessions(spark))
    assert "deduplicated" in seen and "clean_admissions" in seen


def test_cli_main_runs_all_stages(spark):
    from neotree_data_pipeline_kedro_spark.__main__ import main

    counts = main(argv=["--sf-dir", "/root/testdata/sf0.001"], spark=spark)
    assert counts["bronze"] == 1000
    assert set(counts) >= {
        "bronze", "deduplicated", "admissions", "discharges", "joined",
        "convenience", "summary_counts", "clean_admissions", "merged_all",
    }
    assert all(n >= 0 for n in counts.values())


def test_tidy_requires_field_metadata(spark):
    """A script with neither pivot_keys nor field_info must fail loudly, not
    pivot into an id-only frame."""
    import pytest

    from neotree_data_pipeline_kedro_spark.plans.pipeline import Engine, EngineConfig

    eng = Engine(
        EngineConfig(
            scripts={ADM_SCRIPT: "admissions"},
            facility_map={ADM_SCRIPT: "Harare NNU"},
            field_info={},
        )
    )
    sess = spark.createDataFrame(
        [(1, "A7C6-0350", ADM_SCRIPT, None,
          _new_entries("A7C6-0350", 34, 2100, "Outcome", "DC"))],
        "id long, uid string, scriptid string, ingested_at timestamp, data string",
    )
    bronze = eng.import_raw(sess)
    with pytest.raises(ValueError, match="pivot_keys nor field_info"):
        eng.tidy(eng.deduplicate(bronze))


def test_engine_two_cycle_incremental_delta(tmp_path, spark):
    """The reference's cron cycle composed end-to-end (NOT-EXISTS contract,
    merge_all.py:598-677 / assorted_queries.py:241-252): cycle 1 imports and
    runs the DAG; new export files land; cycle 2 must (a) skip
    already-imported (uid, scriptid) keys at the bronze sink, (b) run every
    stage on the delta only — per-stage row counts equal the delta, and
    (c) reconcile flips the open admission closed from the newly arrived
    discharge (J7) without touching other rows."""
    import json as _json

    from neotree_data_pipeline_kedro_spark.operators.dedup import (
        incremental_append,
    )
    from neotree_data_pipeline_kedro_spark.sources.sessions import (
        read_session_files,
    )
    from neotree_data_pipeline_kedro_spark.streaming.incremental import (
        incremental_sink,
    )

    def session_obj(uid, entries, script):
        return {
            "uid": uid,
            "script": {"id": script},
            "completed_at": "2024-03-01T10:00:00",
            "entries": entries,
        }

    def adm_obj(uid, gest, bw, outcome_label, outcome_value):
        return session_obj(
            uid,
            _json.loads(_new_entries(uid, gest, bw, outcome_label, outcome_value))[
                "entries"
            ],
            ADM_SCRIPT,
        )

    def dis_obj(uid):
        return session_obj(
            uid,
            {
                "NeoTreeID": {"values": {"label": ["NeoTree ID"], "value": [uid]}},
                "NeoTreeOutcome": {"values": {"label": ["Outcome"], "value": ["DC"]}},
            },
            DIS_SCRIPT,
        )

    eng = _engine()
    sink = str(tmp_path / "bronze_sink")

    # ---- cycle 1: initial import + full DAG -------------------------------
    in1 = tmp_path / "in1"
    in1.mkdir()
    (in1 / "export_adm.json").write_text(
        _json.dumps(
            {
                "sessions": [
                    adm_obj("A7C6-0350", 34, 2100, "Outcome", "DC"),
                    adm_obj("A7C6-0350", 34, 2100, "Outcome", "DC"),  # dup upload
                    adm_obj("B111-0001", 28, 900, "Died", "NND"),
                ]
            }
        )
    )
    (in1 / "export_dis.json").write_text(
        _json.dumps({"sessions": [dis_obj("A7C6-0350")]})
    )
    sessions1 = read_session_files(spark, str(in1 / "export_*.json"))
    assert incremental_sink(spark, sessions1, sink, ["uid", "scriptid"]) == 4

    out1 = eng.run(sessions1)
    assert out1["deduplicated"].count() == 3
    all1 = {r["uid"]: r for r in out1["merged_all"].collect()}
    assert all1["A7C6-0350"]["is_closed"]
    assert not all1["B111-0001"]["is_closed"]  # open: admission, no discharge

    # ---- between cycles: new exports land ---------------------------------
    in2 = tmp_path / "in2"
    in2.mkdir()
    (in2 / "export_adm.json").write_text(
        _json.dumps(
            {
                "sessions": [
                    adm_obj("A7C6-0350", 34, 2100, "Outcome", "DC"),  # re-upload
                    adm_obj("C222-0002", 30, 1500, "Outcome", "DC"),  # new
                ]
            }
        )
    )
    (in2 / "export_dis.json").write_text(
        _json.dumps({"sessions": [dis_obj("B111-0001")]})  # closes B111
    )

    # ---- cycle 2: sink append skips existing keys -------------------------
    incoming2 = read_session_files(spark, str(in2 / "export_*.json"))
    assert incoming2.count() == 3
    assert incremental_sink(spark, incoming2, sink, ["uid", "scriptid"]) == 2
    sunk = spark.read.parquet(sink)
    assert sunk.count() == 6  # 4 + 2; the A7C6 re-upload never lands
    assert (
        sunk.filter(
            (F.col("uid") == "A7C6-0350") & (F.col("scriptid") == ADM_SCRIPT)
        ).count()
        == 2  # both cycle-1 uploads, nothing from cycle 2
    )

    # ---- cycle 2: every stage sees only the delta -------------------------
    delta2 = incremental_append(
        incoming2, sessions1.select("uid", "scriptid"), ["uid", "scriptid"]
    )
    out2 = eng.run(delta2)
    assert out2["bronze"].count() == 2
    assert out2["deduplicated"].count() == 2
    assert out2["admissions"].count() == 1
    assert out2["discharges"].count() == 1
    assert out2["admissions_fixed"].count() == 1
    assert out2["discharges_fixed"].count() == 1
    assert out2["joined"].count() == 1  # the new admission only
    assert out2["summary_counts"].collect()[0]["patients"] == 1
    all2 = {r["uid"]: r for r in out2["merged_all"].collect()}
    assert set(all2) == {"C222-0002", "B111-0001"}
    assert all2["C222-0002"]["match_status"] == "unmatched_admission"
    assert all2["B111-0001"]["match_status"] == "unmatched_discharge"

    # ---- reconcile: the delta discharge closes cycle-1's open row ---------
    rec = {
        r["uid"]: r
        for r in eng.reconcile(
            out1["merged_all"],
            new_adm=out2["admissions_fixed"],
            new_dis=out2["discharges_fixed"],
        ).collect()
    }
    assert rec["B111-0001"]["has_discharge"] and rec["B111-0001"]["is_closed"]
    assert rec["B111-0001"]["NeoTreeOutcome.value"] == "DC"
    assert rec["A7C6-0350"]["is_closed"]  # untouched rows keep their state
    assert rec["A7C6-0350"]["has_admission"] and rec["A7C6-0350"]["has_discharge"]


def test_cli_compact_mb_compacts_stage_dirs(spark, tmp_path):
    import glob as g

    from neotree_data_pipeline_kedro_spark.__main__ import main

    out = str(tmp_path / "wh")
    counts = main(
        argv=["--sf-dir", "/root/testdata/sf0.001", "--out", out,
              "--compact-mb", "128"],
        spark=spark,
    )
    # every materialized stage dir exists, is compacted to one file at this
    # size, and still reads back with the reported row count
    for name, n in counts.items():
        files = g.glob(f"{out}/{name}/*.parquet")
        if not files:
            continue
        assert len(files) == 1, (name, files)
        assert spark.read.parquet(f"{out}/{name}").count() == n
