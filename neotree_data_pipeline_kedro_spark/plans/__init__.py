"""Assembled query plans: the driver-facing registry (queries + DuckDB
oracle SQL) covering SURVEY.md §2 plus the LLM-pipeline extensions."""

from .queries import ORACLE_SQL, QUERIES, flagship

__all__ = ["ORACLE_SQL", "QUERIES", "flagship"]
