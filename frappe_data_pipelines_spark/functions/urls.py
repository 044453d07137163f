"""URL canonicalization — the crawl-dedup primitive.

Web pipelines dedup by URL before anything touches page content (C4 §2.1
deduplicates at the URL level; every crawler frontier canonicalizes first).
The rules here are the widely agreed-on safe subset: lowercase scheme and
host, strip a leading ``www.``, drop default ports (:80 http / :443 https),
drop the fragment, remove tracking parameters (utm_*, gclid, fbclid), sort
the remaining query parameters, and trim a single trailing slash off
non-root paths. Path case is preserved (paths are case-sensitive).

Everything is a Column expression over ``pyspark.sql.functions`` — no UDF,
whole-stage codegen end to end — and deliberately mirrorable in ANSI SQL
(the ``url_normalize_canonical`` catalog query carries the oracle).

Reference: no counterpart (the reference ingests drive files, not crawls);
part of the beyond-the-reference web-corpus surface with
``operators/htmlmini.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "gclid", "fbclid")


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL with regexes (no parse_url — keeps the expression
    portable to engines without it and identical to the SQL oracle)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1))
    path = F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    # anchor the query to BEFORE the fragment: a '?' that first appears
    # inside the fragment ('https://h/p#sec?x') is fragment content, not a
    # query string — the unanchored r"\?([^#]*)" would leak it into the
    # canonical form and split URL-level dedup groups
    query = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)
    return {"scheme": scheme, "hostport": hostport, "path": path, "query": query}


def url_normalize_expr(url: Column) -> Column:
    """Canonical form of ``url`` as a single Column expression."""
    p = url_parts(F.trim(url))
    scheme = p["scheme"]
    host = F.regexp_replace(p["hostport"], r"^www\.", "")
    host = F.when((scheme == F.lit("http")) & host.endswith(":80"),
                  F.substring(host, 1, F.length(host) - 3)) \
            .when((scheme == F.lit("https")) & host.endswith(":443"),
                  F.substring(host, 1, F.length(host) - 4)) \
            .otherwise(host)
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    def _keep(kv: Column) -> Column:
        cond = kv != ""
        for prefix in TRACKING_PREFIXES:  # single source of truth
            cond = cond & ~kv.startswith(prefix)
        return cond

    params = F.filter(F.split(p["query"], "&"), _keep)
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def url_host_expr(url: Column) -> Column:
    """Registrable-host column (post-canonicalization host, port stripped) —
    the grouping key for per-domain caps and host-level dedup."""
    hostport = F.lower(F.regexp_extract(F.trim(url), r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    return F.regexp_extract(host, r"^([^:]*)", 1)
