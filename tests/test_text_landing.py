"""Text landing-zone reader: PERMISSIVE parse + corrupt-line quarantine
for JSONL and CSV, with the conservation identity (good + quarantined ==
input lines) the session-scan audit also guarantees."""

from __future__ import annotations

import pytest

from neotree_data_pipeline_kedro_spark.sources.tables import load_text_landing


def test_jsonl_quarantine_split(spark, tmp_path):
    p = tmp_path / "landing.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        '{"id": 2, "v": "b"}\n'
        "this is not json\n"
        '{"id": "not-an-int", "v": "c"}\n'
        '{"id": 4}\n'  # missing field -> null, NOT corrupt
    )
    good, quar = load_text_landing(spark, str(p), "id BIGINT, v STRING")
    g = {r.id: r.v for r in good.collect()}
    q = [r.raw_line for r in quar.collect()]
    assert g == {1: "a", 2: "b", 4: None}
    assert len(q) == 2
    assert any("not json" in line for line in q)
    assert any("not-an-int" in line for line in q)
    # conservation: nothing silently dropped
    assert good.count() + quar.count() == 5


def test_csv_quarantine_split(spark, tmp_path):
    p = tmp_path / "landing.csv"
    p.write_text("1,a\n2,b\nnot-an-int,c\n4,d,extra-field\n")
    good, quar = load_text_landing(spark, str(p), "id BIGINT, v STRING", fmt="csv")
    g = {r.id: r.v for r in good.collect()}
    assert g == {1: "a", 2: "b"}
    assert quar.count() == 2  # bad type + arity mismatch


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        load_text_landing(spark, str(tmp_path), "id BIGINT", fmt="avro")
