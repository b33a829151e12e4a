"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of neotree/neotree-data-pipeline-kedro.

The reference (/root/reference) is a Kedro + Postgres + pandas ETL pipeline;
this package re-expresses every operator class it uses (SURVEY.md §2) as
idiomatic, declarative PySpark DataFrame transformations so Catalyst/Tungsten
pick the physical plan, plus the LLM-training-data operators (dedup families,
similarity search, text analysis, multimodal plumbing) required at 100 TB
scale.

Layout:
    functions/  scalar column-expression families (timestamps, nulls, buckets,
                booleans, strings, text metrics) — pure `Column` builders, no
                UDFs in the hot path.
    operators/  DataFrame -> DataFrame relational operators (dedup, joins,
                windows, explode, redaction, label repair, near-dup, ANN,
                validation, multimodal).
    sources/    table registry + JSON session-envelope parsing (bronze layer).
    plans/      assembled query plans: the driver-facing query registry and
                the Neotree pipeline stages.
    streaming/  batch-incremental & Structured Streaming wrappers.
"""

__version__ = "0.1.0"
