"""DataFrame -> DataFrame relational operators (SURVEY.md §2)."""

from .dedup import (
    dedupe_keep_latest,
    dedupe_prefix_key,
    incremental_append,
    review_numbering,
)
from .joins import (
    anti_join,
    asof_join,
    best_match_join,
    semi_join,
    tiered_asof_assignment,
)
from .windows import episode_labels, episode_sessionize, gap_sessionize
from .explode import explode_delimited, explode_mcl
from .redact import redact

__all__ = [
    "anti_join",
    "asof_join",
    "best_match_join",
    "dedupe_keep_latest",
    "dedupe_prefix_key",
    "episode_labels",
    "episode_sessionize",
    "explode_delimited",
    "explode_mcl",
    "gap_sessionize",
    "incremental_append",
    "redact",
    "review_numbering",
    "semi_join",
    "tiered_asof_assignment",
]
