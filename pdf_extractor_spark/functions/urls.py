"""URL canonicalization for web-corpus dedup (beyond-reference web op).

A Common-Crawl-scale pipeline dedupes by CANONICAL url before content
dedup: the same page is crawled as ``HTTP://WWW.Site.COM:80/p?utm_source=x``
and ``http://www.site.com/p``. Canonical form used here (the common subset
of RFC 3986 normalization + tracker stripping):

  1. lowercase scheme and host (path stays case-sensitive per RFC 3986);
  2. strip the fragment;
  3. strip default ports (http:80, https:443);
  4. empty path -> "/";
  5. drop tracking query params (utm_*, gclid, fbclid), preserving the
     order of the remaining params.

Everything is regexp_extract / array filter — pure codegen'd expressions,
and every regex is in the common Java-regex/RE2 dialect so the DuckDB
oracle runs the identical patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
PATHQ_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
TRACKING_RE = r"^(utm_[^=&]*|gclid|fbclid)(=|$)"


# minimal multi-label public-suffix set (the publicsuffix.org idea at demo
# scale; production ships the full list the same way — one generated regex)
PLD_SUFFIX2 = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.nz", "co.in", "com.br",
)
_S2_ALT = "|".join(s.replace(".", r"\.") for s in sorted(PLD_SUFFIX2))
PLD_S2_RE = rf"([^.]+\.(?:{_S2_ALT}))$"
PLD_S1_RE = r"([^.]+\.[^.]+)$"


def pay_level_domain(host: Column) -> Column:
    """Pay-level domain (registrable domain / eTLD+1) from a host column:
    label+multi-label-suffix when the host ends in a known two-label
    public suffix (www.blog.example.co.uk -> example.co.uk), else
    label+TLD (www.a.example.com -> example.com), else the host itself
    (single-label / IP-ish inputs pass through). Host aggregation keyed by
    PLD is how crawl budgets and domain-level dedup group sites — per-host
    keys split a site's subdomains apart. Pure regexp_extract: the same
    pattern strings run in the DuckDB oracle."""
    s2 = F.regexp_extract(host, PLD_S2_RE, 1)
    s1 = F.regexp_extract(host, PLD_S1_RE, 1)
    return (
        F.when(F.length(s2) > 0, s2)
        .when(F.length(s1) > 0, s1)
        .otherwise(host)
    )


def canonicalize_url(col: Column) -> Column:
    """Canonical url column (see module docstring for the exact rules)."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_extract(u, PATHQ_RE, 1)
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(F.length(path) == 0, F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (~kv.rlike(TRACKING_RE)) & (F.length(kv) > 0),
    )
    qjoin = F.array_join(kept, "&")
    built = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(qjoin) > 0, F.concat(F.lit("?"), qjoin)).otherwise(
            F.lit("")
        ),
    )
    # no scheme (relative / schemeless urls): pass the trimmed input through
    # rather than fabricating '://...'
    return F.when(F.length(scheme) == 0, u).otherwise(built)
