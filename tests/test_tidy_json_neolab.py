"""Unit tests: P7/P8 column hygiene (tidy_...mcl_tables.py:273,440,
create_union_views.py:73-156, normalize_clean_tables.sql), JSON scalar ops
(assorted_queries.py:728-908), and neolab organism canonicalization
(neolab_data_cleanup.py:7-122) incl. the replicated reference bugs."""

from __future__ import annotations

from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.functions.json_ops import (
    json_delete_keys,
    json_has_any_key,
    json_set,
)
from neotree_data_pipeline_kedro_spark.functions.neolab import (
    canonicalize_organism,
)
from neotree_data_pipeline_kedro_spark.operators.tidy import (
    clean_table_projection,
    normalize_column_names,
    prune_junk_columns,
)


def _wide(spark):
    return spark.createDataFrame(
        [("u1", "j", "j", "M", "Male", "x", "3.1")],
        ["uid", "A", "42", "Gender.value", "Gender.label", "note", "Temp(C).value"],
    )


def test_prune_junk_columns(spark):
    out = prune_junk_columns(_wide(spark))
    assert out.columns == ["uid", "Gender.value", "Gender.label", "note",
                           "Temp(C).value"]
    only_pairs = prune_junk_columns(_wide(spark), value_label_only=True)
    assert only_pairs.columns == ["uid", "Gender.value", "Gender.label",
                                  "Temp(C).value"]


def test_prune_max_columns_keeps_keys_first(spark):
    out = prune_junk_columns(_wide(spark), max_columns=2)
    assert out.columns[0] == "uid" and len(out.columns) == 2


def test_normalize_column_names(spark):
    out = normalize_column_names(_wide(spark).select("uid", F.col("`Temp(C).value`")))
    assert out.columns == ["uid", "Temp_C_.value"]


def test_clean_table_projection(spark):
    df = _wide(spark).select(
        "uid",
        F.col("`Gender.value`"),
        F.col("`Gender.label`"),
        F.col("`Temp(C).value`"),
    )
    out = clean_table_projection(
        df, field_info={"Gender": {"type": "dropdown"}, "Temp(C)": {"type": "number"}}
    )
    # number-typed field loses its label; dropdown keeps key_label
    assert out.columns == ["uid", "gender", "gender_label", "temp(c)"]
    # no registry -> every label kept
    assert clean_table_projection(df).columns == [
        "uid", "gender", "gender_label", "temp(c)",
    ]


def _json_df(spark):
    return spark.createDataFrame(
        [('{"k": 1, "uid": "a"}',), (None,)], ["j"]
    )


def test_json_set_delete_has(spark):
    df = _json_df(spark).select(
        F.get_json_object(json_set(F.col("j"), "uid", F.lit("B")), "$.uid").alias("set_uid"),
        F.get_json_object(json_delete_keys(F.col("j"), ["k"]), "$.k").alias("del_k"),
        F.get_json_object(json_delete_keys(F.col("j"), ["k"]), "$.uid").alias("kept"),
        json_has_any_key(F.col("j"), ["k", "zz"]).alias("has"),
        json_has_any_key(F.col("j"), ["zz"]).alias("has_not"),
    )
    rows = df.collect()
    assert (rows[0].set_uid, rows[0].del_k, rows[0].kept) == ("B", None, "a")
    assert rows[0].has is True and rows[0].has_not is False
    # NULL json stays NULL through set/delete; ?| on NULL is false
    assert rows[1].set_uid is None and rows[1].kept is None and rows[1].has is False


def _org(spark, value, label, other):
    df = spark.createDataFrame([(value, label, other)], "v string, l string, o string")
    fv, fl = canonicalize_organism(F.col("v"), F.col("l"), F.col("o"))
    r = df.select(fv.alias("v"), fl.alias("l")).collect()[0]
    return r.v, r.l


def test_organism_rules(spark):
    assert _org(spark, "Oth", "x", "Klebsiella pneumoniae") == ("KLS", "Klebsiella sp.")
    assert _org(spark, "Oth", "x", "S.Aureus") == ("SA", "Staphylococcus aureus")
    # sequential-overwrite: NHS immediately overwritten by the NLFC bug (:94)
    assert _org(spark, "Oth", "x", "non-haemolytic strep") == (
        "NLFC", "Non-lactose fermenting coliform",
    )
    # truthy-find quirk: unmatched text still becomes CONS...
    assert _org(spark, "Oth", "x", "no organism match") == (
        "CONS", "Coagulase negative staphylococcus",
    )
    # ...unless it STARTS with the reference's typo spelling
    assert _org(spark, "Oth", " pend ", "stapgylococcus x") == ("Oth", " pend ")
    # NULL other hits the CONS default (str(nan) matches nothing)
    assert _org(spark, "Oth", "x", None) == (
        "CONS", "Coagulase negative staphylococcus",
    )


def test_organism_non_oth(spark):
    # non-Oth rows: canonical label fix + trim only
    assert _org(spark, "KLS", " Klebsiella sp. ", "ignored") == (
        "KLS", "Klebsiella sp.",
    )
    assert _org(spark, "SA", "Coagulase negative Staph seen", "x") == (
        "SA", "Coagulase negative staphylococcus",
    )


def test_organism_no_other_column(spark):
    df = spark.createDataFrame([("Oth", " lbl ")], ["v", "l"])
    fv, fl = canonicalize_organism(F.col("v"), F.col("l"))
    r = df.select(fv.alias("v"), fl.alias("l")).collect()[0]
    assert (r.v, r.l) == ("Oth", "lbl")
