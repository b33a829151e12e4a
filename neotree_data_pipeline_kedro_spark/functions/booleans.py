"""Boolean token mapping (SURVEY.md §2.8 "Boolean").

Reference: conf/common/sql_functions.py:955-958 (update casts),
conf/common/scripts.py:271-277 (clean-table coercion),
data_validation/validate.py:263-266 (validation regex) — the union of the
truthy/falsy token sets used across those three sites.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .nulls import nullify

TRUE_TOKENS = ("y", "yes", "true", "t", "1", "1.0")
FALSE_TOKENS = ("n", "no", "false", "f", "0", "0.0")


def bool_map(col: Column | str) -> Column:
    """Map y/yes/true/1-style tokens to BooleanType; unknown tokens → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    v = F.lower(nullify(c))
    return (
        F.when(v.isin(*TRUE_TOKENS), F.lit(True))
        .when(v.isin(*FALSE_TOKENS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
