"""URL canonicalization — the web-crawl curation primitive that collapses
superficially-different URLs to one canonical key before any fetch/dedup
decision (the same role ``fingerprint`` plays for text bodies).

Rules (the conservative, widely-published subset — each provably
idempotent and loss-free for HTTP semantics):
- scheme and host lowercase (RFC 3986 §6.2.2.1 case normalization);
- default port stripped (``:80`` for http, ``:443`` for https);
- fragment dropped (never sent to the server);
- tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``,
  ``ref`` — the analytics noise that multiplies crawl frontiers);
- remaining query parameters sorted bytewise (order is almost always
  insignificant; sorting makes permutations collide);
- trailing slashes on the path trimmed.

Everything is a chain of codegen'd Column expressions (regexp_extract /
split / filter / array_sort / concat) — zero UDFs, zero shuffle; the
identical logic is emitted as DuckDB SQL by ``canonical_url_sql`` so the
oracle runs the same algorithm, not a reimplementation.

Scale shape: a linear per-row rewrite; the dedup that follows groups on
an 8-byte hash of the canonical form, so the exchange carries
fingerprints, not URLs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-compatible (no lookarounds/backrefs): scheme / authority / path /
# optional query / optional fragment.
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"

# query parameters dropped by exact name ...
TRACKING_PARAMS = ("fbclid", "gclid", "ref")
# ... and by prefix
TRACKING_PREFIX = "utm_"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of ``url`` (non-URL strings come back unchanged:
    the master regex not matching yields empty groups, and the rebuild
    guard returns the trimmed original)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    auth = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)  # includes leading '?' or ''

    auth = F.when(
        scheme == "http", F.regexp_replace(auth, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    path = F.regexp_replace(path, "/+$", "")

    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "")
        & (F.substring(p, 1, len(TRACKING_PREFIX)) != TRACKING_PREFIX)
        & ~F.element_at(F.split(p, "="), 1).isin(*TRACKING_PARAMS),
    )
    query_n = F.array_join(F.array_sort(params), "&")

    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query_n == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query_n)
        ),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def canonical_url_sql(expr: str) -> str:
    """The identical algorithm as one DuckDB SQL expression (same master
    regex, same rule order, same bytewise param sort)."""
    re = _URL_RE.replace("'", "''")
    u = f"trim({expr})"
    scheme = f"lower(regexp_extract({u}, '{re}', 1))"
    auth_raw = f"lower(regexp_extract({u}, '{re}', 2))"
    auth = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth_raw}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth_raw}, ':443$', '') "
        f"ELSE {auth_raw} END"
    )
    path = f"regexp_replace(regexp_extract({u}, '{re}', 3), '/+$', '')"
    qraw = f"regexp_replace(regexp_extract({u}, '{re}', 4), '^\\?', '')"
    names = ", ".join(f"'{n}'" for n in TRACKING_PARAMS)
    params = (
        f"list_filter(string_split({qraw}, '&'), "
        f"p -> p <> '' AND substr(p, 1, {len(TRACKING_PREFIX)}) <> "
        f"'{TRACKING_PREFIX}' AND split_part(p, '=', 1) NOT IN ({names}))"
    )
    # coalesce: DuckDB's array_to_string on an empty list yields NULL,
    # not '' (Spark's array_join yields '')
    query_n = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    rebuilt = (
        f"concat({scheme}, '://', {auth}, {path}, "
        f"CASE WHEN {query_n} = '' THEN '' ELSE concat('?', {query_n}) END)"
    )
    return f"CASE WHEN {scheme} = '' THEN {u} ELSE {rebuilt} END"
