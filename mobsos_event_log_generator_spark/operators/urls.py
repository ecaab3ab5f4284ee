"""URL canonicalization — web-corpus preparation primitives.

Crawled training corpora are keyed by URL, and the same page arrives under
many spellings: scheme/host case, default ports, `www.` prefixes, tracking
parameters (`utm_*`, `gclid`, ...), parameter order, trailing slashes,
fragments. Canonicalizing before URL-level dedup is the first dedup stage of
the public web-corpus pipelines (it is cheaper than any content hash and
removes the bulk of recrawl duplicates).

Everything here is pure Column algebra — regexp parse + array ops — so the
hot path stays JVM-side and the exact same logic is expressible in the
DuckDB oracle dialect. The parse follows the RFC 3986 component grammar
(scheme://authority/path?query#fragment) without attempting full validation:
component extraction is anchored regex, normalization rules are explicit and
documented per step.

Scale shape: per-row string work, no shuffle; the downstream dedup is a
single hash-groupBy on the canonical URL (the natural partition key of a
crawl corpus at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query parameters that never change page identity (tracking/session junk).
#: Anchored match against the full `key=value` token.
TRACKING_PARAM_RE = r"^(utm_[^=]*|ref|fbclid|gclid|msclkid|mc_eid|sessionid|phpsessid)(=.*)?$"

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme (`''` if the value does not parse as a URL)."""
    return F.lower(F.regexp_extract(url, _URL_RE, 1))


def url_host(url: Column) -> Column:
    """Lower-cased host: authority minus userinfo and port."""
    auth = F.lower(F.regexp_extract(url, _URL_RE, 2))
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(no_user, r":\d*$", "")


def url_registered_domain(url: Column) -> Column:
    """Last two host labels — a public-suffix-list-free heuristic for the
    registrable domain (documented approximation: multi-label suffixes like
    `co.uk` would need the PSL table as a broadcast dim)."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL:

    1. scheme and host lower-cased;
    2. userinfo dropped; default port stripped (`:443` for https, `:80` for
       http, any empty `:`);
    3. `www.` host prefix dropped;
    4. fragment dropped;
    5. tracking parameters removed (``TRACKING_PARAM_RE``), remaining
       `key=value` tokens sorted lexicographically, empty tokens dropped;
    6. trailing slashes stripped from the path (root `/` becomes empty —
       `https://x.com/` and `https://x.com` are the same page).

    Non-URL strings (no `scheme://`) pass through unchanged so the operator
    is total — callers filter on ``url_scheme() != ''`` when they need only
    parseable rows."""
    scheme = url_scheme(url)
    host = F.regexp_replace(url_host(url), r"^www\.", "")
    auth = F.lower(F.regexp_extract(url, _URL_RE, 2))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("https")) & (port == "443"))
        & ~((scheme == F.lit("http")) & (port == "80"))
    )
    path = F.regexp_replace(F.regexp_extract(url, _URL_RE, 3), r"/+$", "")
    query = F.regexp_extract(url, _URL_RE, 4)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", url).otherwise(canon)


#: DuckDB rendering of the same six canonicalization steps, applied to a
#: column expression — keep rule-for-rule in sync with ``canonicalize_url``.
def canonicalize_url_sql(col: str) -> str:
    url_re = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
    return f"""
    CASE WHEN lower(regexp_extract({col}, '{url_re}', 1)) = '' THEN {col} ELSE
      lower(regexp_extract({col}, '{url_re}', 1)) || '://' ||
      regexp_replace(regexp_replace(regexp_replace(lower(regexp_extract({col}, '{url_re}', 2)), '^[^@]*@', ''), ':[0-9]*$', ''), '^www\\.', '') ||
      CASE WHEN regexp_extract(lower(regexp_extract({col}, '{url_re}', 2)), ':([0-9]+)$', 1) <> ''
            AND NOT (lower(regexp_extract({col}, '{url_re}', 1)) = 'https'
                     AND regexp_extract(lower(regexp_extract({col}, '{url_re}', 2)), ':([0-9]+)$', 1) = '443')
            AND NOT (lower(regexp_extract({col}, '{url_re}', 1)) = 'http'
                     AND regexp_extract(lower(regexp_extract({col}, '{url_re}', 2)), ':([0-9]+)$', 1) = '80')
           THEN ':' || regexp_extract(lower(regexp_extract({col}, '{url_re}', 2)), ':([0-9]+)$', 1)
           ELSE '' END ||
      regexp_replace(regexp_extract({col}, '{url_re}', 3), '/+$', '') ||
      CASE WHEN array_to_string(list_sort(list_filter(string_split(regexp_extract({col}, '{url_re}', 4), '&'),
                p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))), '&') <> ''
           THEN '?' || array_to_string(list_sort(list_filter(string_split(regexp_extract({col}, '{url_re}', 4), '&'),
                p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))), '&')
           ELSE '' END
    END
    """
