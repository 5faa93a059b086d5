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
- tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``)
- remaining query parameters SORTED (param order is not semantic)
- trailing ``/`` on a non-root path dropped

Everything is JVM expressions — ``parse_url`` (Hive URL parser, runs in
codegen) + higher-order array functions for the param filter/sort; no
Python in the path, so the projection fuses into whatever scan feeds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def canonicalize_url(url) -> Column:
    """Canonical form of a URL column (module-docstring policy)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
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
    raw_path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.when(
        (F.length(raw_path) > 1) & raw_path.endswith("/"),
        raw_path.substr(F.lit(1), F.length(raw_path) - 1),
    ).otherwise(raw_path)
    query = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.exists(
            F.array(*[F.lit(pref) for pref in _TRACKING_PREFIXES]),
            lambda pref: p.startswith(pref),
        ),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_sfx,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(
            F.lit("")
        ),
    )


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
