"""Unit tests: label repair against the reference's _transform_subset
semantics (field_info.py:306-377), D8 deterministic uid minting (incl.
collision resolution), and the S9 metadata registry loader."""

from __future__ import annotations

import json
import re

from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.operators.labels import (
    repair_dataframe_labels,
    repair_field,
)
from neotree_data_pipeline_kedro_spark.operators.uids import (
    minted_uid,
    repair_duplicate_uids,
)
from neotree_data_pipeline_kedro_spark.sources.metadata import (
    confidential_keys,
    load_field_metadata,
    numeric_ranges,
)

GENDER = {
    "label": "What is the gender?",
    "type": "dropdown",
    "options": [
        {"value": "M", "valueLabel": "Male"},
        {"value": "F", "valueLabel": "Female"},
    ],
}
SYMPTOMS = {
    "label": "Symptoms observed",
    "type": "multi_select",
    "options": [
        {"value": "FV", "valueLabel": "Fever"},
        {"value": "CG", "valueLabel": "Cough"},
    ],
}
FREE = {"label": "Notes", "type": "text", "options": []}


def _run(spark, rows, field):
    df = spark.createDataFrame(rows, "value string, label string")
    fv, fl = repair_field("value", "label", field)
    return [(r.v, r.l) for r in df.select(fv.alias("v"), fl.alias("l")).collect()]


def test_repair_field_select(spark):
    got = _run(
        spark,
        [
            # question-label rows get relabeled from options
            ("M", "What is the gender?"),
            # unknown value under the gate -> NULL label (pandas .map)
            ("X", "What is the gender?"),
            # correct label untouched
            ("F", "Female"),
            # inverted pair (value holds the label, label holds the value) swaps
            ("Male", "M"),
            # junk label NOT equal to json_label: left alone (the gate)
            ("M", "junk"),
            # oth passthrough: no relabel even under the gate
            ("Oth", "What is the gender?"),
            # null value forces null label
            (None, "Male"),
        ],
        GENDER,
    )
    assert got == [
        ("M", "Male"),
        ("X", None),
        ("F", "Female"),
        ("M", "Male"),
        ("M", "junk"),
        ("Oth", "What is the gender?"),
        (None, None),
    ]


def test_repair_field_multiselect(spark):
    got = _run(
        spark,
        [
            ("FV,CG", "Symptoms observed"),
            ("FV, ZZ ,", "Symptoms observed"),  # strip + unknown passthrough + empty drop
            ("FV", "Fever"),  # gate closed: untouched
        ],
        SYMPTOMS,
    )
    assert got == [
        ("FV,CG", "Fever,Cough"),
        ("FV, ZZ ,", "Fever,ZZ"),
        ("FV", "Fever"),
    ]


def test_repair_field_no_options(spark):
    got = _run(spark, [("hello", "Notes"), ("hello", "kept")], FREE)
    # no options: gated rows take label := value
    assert got == [("hello", "hello"), ("hello", "kept")]


def test_repair_dataframe_labels(spark):
    df = spark.createDataFrame(
        [("M", "What is the gender?", "x")],
        ["Gender.value", "Gender.label", "other"],
    )
    out = repair_dataframe_labels(df, {"Gender": GENDER, "Missing": GENDER})
    row = out.collect()[0]
    assert row["Gender.label"] == "Male"
    assert row["other"] == "x"
    assert out.columns == df.columns


def test_repair_duplicate_uids(spark):
    df = spark.createDataFrame(
        [
            ("A", "2024-01", 1),
            ("A", "2024-01", 2),  # same episode: keeps uid
            ("A", "2024-02", 3),  # second episode: minted
            ("B", "2024-01", 4),  # unique uid: untouched
        ],
        ["uid", "da", "rid"],
    )
    out = {r.rid: r.uid for r in repair_duplicate_uids(df, "uid", "da").collect()}
    assert out[1] == "A" and out[2] == "A" and out[4] == "B"
    assert re.fullmatch(r"[A-Z0-9]{2}ZZ-\d{4}", out[3])
    # deterministic across runs
    again = {r.rid: r.uid for r in repair_duplicate_uids(df, "uid", "da").collect()}
    assert again == out


def test_repair_duplicate_uids_collision(spark):
    df = spark.createDataFrame(
        [("A", "2024-01", 1), ("A", "2024-02", 2)], ["uid", "da", "rid"]
    )
    salt0 = spark.createDataFrame([("x",)], ["u"]).select(
        minted_uid(F.lit("A"), F.lit("2024-02"), 0).alias("m")
    ).collect()[0].m
    # poison the existing-uid set with the salt-0 mint -> forces a re-salt
    existing = spark.createDataFrame([(salt0,)], ["uid"])
    out = {
        r.rid: r.uid
        for r in repair_duplicate_uids(df, "uid", "da", existing_uids=existing).collect()
    }
    assert out[2] != salt0
    assert re.fullmatch(r"[A-Z0-9]{2}ZZ-\d{4}", out[2])


def test_metadata_loader(tmp_path):
    raw = {
        "script1": {
            "Gender": {**GENDER, "confidential": False},
            "KinCell": {
                "label": "Kin phone",
                "type": "text",
                "confidential": True,
                "minValue": None,
            },
            "BW": {"label": "Birth weight", "type": "number", "minValue": 400,
                   "maxValue": 6000},
        }
    }
    p = tmp_path / "scripts.json"
    p.write_text(json.dumps(raw))
    meta = load_field_metadata(p)
    assert meta["script1"]["Gender"]["options"][0] == {
        "value": "M", "valueLabel": "Male",
    }
    assert confidential_keys(meta) == {"KinCell"}
    assert numeric_ranges(meta) == {"BW": (400, 6000)}
    # fetch path: cache miss writes the cache
    p2 = tmp_path / "fetched.json"
    meta2 = load_field_metadata(p2, fetch=lambda: raw)
    assert p2.exists() and meta2.keys() == meta.keys()
