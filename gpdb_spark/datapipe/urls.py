"""URL canonicalization + dedup — the web-corpus normalization step that
runs before any content-level dedup.

Reference point: the reference engine has no analog (its text stack stops
at SQL string functions); a 100 TB crawl pipeline dedups by canonical URL
first because it is FREE relative to content hashing — one projection +
one 2-stage groupBy, no document bytes touched.

Canonical form (the common crawler policy, e.g. Apache Nutch / Common
Crawl style):

- scheme and host lowercased; default ports (``:80`` http, ``:443``
  https) dropped
- fragment (``#...``) dropped
- tracking query parameters removed (``utm_*`` as a name-prefix
  family; ``fbclid`` / ``gclid`` by EXACT name — a prefix match would
  also strip legitimate params like ``gclidtype``)
- remaining query parameters SORTED (param order is not semantic)
- trailing ``/`` on a non-root path dropped; an EMPTY path normalizes
  to ``/`` (RFC 3986 §6.2.3: for an authority URI the empty path is
  equivalent to ``/`` — ``http://x.com`` and ``http://x.com/`` are the
  single most common duplicate pair in a crawl)
- a URL the parser cannot decompose (no scheme/host — mailto:,
  relative links, junk) canonicalizes to ITSELF, so malformed URLs
  are never collapsed into one NULL group

Everything is JVM expressions — ``parse_url`` (Hive URL parser, runs in
codegen) + higher-order array functions for the param filter/sort; no
Python in the path, so the projection fuses into whatever scan feeds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def canonicalize_url(url) -> Column:
    """Canonical form of a URL column (module-docstring policy)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    # parse_url HOST excludes the port; pull it off the authority so
    # only scheme-default ports are dropped
    hostport = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port_sfx = F.when(
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443")),
        F.concat(F.lit(":"), port),
    ).otherwise(F.lit(""))
    raw_path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.when(
        (F.length(raw_path) > 1) & raw_path.endswith("/"),
        raw_path.substr(F.lit(1), F.length(raw_path) - 1),
    ).otherwise(raw_path)
    # empty path == root path for authority URIs (RFC 3986 §6.2.3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    pname = lambda p: F.split(p, "=").getItem(0)  # noqa: E731
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~pname(p).startswith("utm_")
        & (pname(p) != "fbclid")
        & (pname(p) != "gclid"),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        port_sfx,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(
            F.lit("")
        ),
    )
    # unparseable URL (concat null-propagates) -> identity, never a
    # shared NULL group
    return F.coalesce(canonical, u)


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """(canonical_url, n_dups, keep_id) — group by canonical form, count
    variants, keep the min id as representative. One projection + one
    2-stage hash agg (partial counts map-side): the cheapest dedup tier,
    always run before content hashing at crawl scale."""
    return (
        df.select(
            canonicalize_url(url_col).alias("canonical_url"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("_id").alias("keep_id"),
        )
    )
