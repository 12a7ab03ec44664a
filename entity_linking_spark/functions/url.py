"""URL canonicalization — the standard first dedup key of web-crawl
pipelines (C4/RefinedWeb dedupe by canonical URL before any content
hashing).

Pure JVM expression tree (regexp_extract / array_sort / concat_ws):
scan-stage, codegen-friendly, no Python in the path.  The regexes stay
in the Java∩RE2 subset so the DuckDB oracle replays them verbatim.

Canonical form:
- fragment dropped
- scheme and host lowercased; default ports (:80 http, :443 https)
  stripped
- trailing slashes stripped from the path
- tracking params (utm_*, fbclid, gclid, ref) dropped; surviving query
  params sorted bytewise so param order never splits a dedup key
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING_PARAM = r"^(utm_[^=&]*|fbclid|gclid|ref)(=|$)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str) -> Column:
    """Lowercased host[:port] of a URL (empty string when unparseable)."""
    return F.lower(
        F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )


def canonical_url(col: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL, as one JVM expression."""
    u = F.regexp_replace(_c(col), r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = url_host(u)
    host = (
        F.when(scheme == F.lit("http"),
               F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == F.lit("https"),
              F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
        r"/+$", "",
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_PARAM),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.concat_ws("&", kept))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qpart)
