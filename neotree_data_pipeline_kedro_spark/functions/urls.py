"""URL hygiene for crawl-derived corpora: canonicalization and domain
extraction — the keys for URL-level dedup and per-domain rate caps, the
two cheapest, highest-yield cleanup passes on a web crawl (the same URL
fetched twice, and boilerplate-heavy domains flooding the mixture).

Canonicalization policy (deliberately aggressive, stated so the contract
is testable): drop query string and fragment entirely, lowercase the
scheme and host, keep the path byte-exact (paths are case-sensitive).
All regexp/substring expressions — JVM-side, RE2-compatible (no
alternation, no backreferences), so a SQL oracle replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_HOST_RX = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form: query+fragment stripped, scheme+host lowercased,
    path preserved."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, r"[?#].*$", "")
    head = F.regexp_extract(u, _SCHEME_HOST_RX, 1)
    tail = F.substring(u, F.length(head) + 1, F.lit(1 << 30))
    return F.concat(F.lower(head), tail)


def url_domain(col: Column | str) -> Column:
    """Lowercased host of a URL ('' when the input has no scheme://host)."""
    u = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
