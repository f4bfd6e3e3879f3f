"""URL canonicalization, URL-level dedup, and per-domain caps — the
web-corpus curation ops a crawl-derived training pipeline runs before
any text-level dedup (C4/CCNet shape: canonicalize -> URL dedup ->
domain caps -> content dedup).

The canonicalizer is a frozen regex pipeline written in the common
RE2/Java-regex subset, so the DuckDB oracle reproduces it exactly:

  1. scheme  := lower(extract('^scheme://')), default 'http'
  2. host    := lower(authority) minus userinfo, minus leading 'www.',
                minus the scheme's default port (:80 / :443)
  3. path    := authority-stripped path; '' -> '/'; trailing '/' runs
                stripped (root stays '/')
  4. query   := params split on '&', empties and tracking params
                (utm_*, fbclid, gclid, msclkid, ref) dropped, sorted,
                rejoined; '?' omitted when none survive
  5. fragment dropped

All JVM-side column expressions — one codegen'd projection, no UDF,
no shuffle. Dedup/caps add the single groupBy/window shuffle their
semantics require.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
TRACKING_RE = r"^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute URL (see module doc). Pure column
    expression; NULL urls stay NULL."""
    s0 = F.trim(url)
    scheme = F.lower(F.regexp_extract(s0, _SCHEME_RE, 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    rest = F.regexp_replace(s0, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]+)", 1))
    hostport = F.regexp_replace(hostport, r"^[^@]*@", "")
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", "")).otherwise(
        F.when((scheme == "https") & hostport.endswith(":443"),
               F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport))
    host = F.regexp_replace(hostport, r"^www\.", "")
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(s0, r"\?([^#]*)", 1)
    keep = F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_RE))
    qs = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)))


def canonicalize_url_sql(url: str) -> str:
    """The identical pipeline as ANSI-ish SQL text (DuckDB oracle).
    coalesce(...,'') mirrors Spark's ''-on-no-match regexp_extract."""
    s0 = f"trim({url})"
    scheme_raw = f"coalesce(regexp_extract({s0}, '{_SCHEME_RE}', 1), '')"
    scheme = (f"(CASE WHEN lower({scheme_raw}) = '' THEN 'http' "
              f"ELSE lower({scheme_raw}) END)")
    rest = f"regexp_replace({s0}, '{_SCHEME_RE}', '')"
    hostport = (f"regexp_replace(lower(coalesce(regexp_extract("
                f"{rest}, '^([^/?#]+)', 1), '')), '^[^@]*@', '')")
    hostport = (f"(CASE WHEN {scheme} = 'http' AND {hostport} LIKE "
                f"'%:80' THEN regexp_replace({hostport}, ':80$', '') "
                f"WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
                f"THEN regexp_replace({hostport}, ':443$', '') "
                f"ELSE {hostport} END)")
    host = f"regexp_replace({hostport}, '^www\\.', '')"
    path = (f"coalesce(regexp_extract({rest}, "
            f"'^[^/?#]*([^?#]*)', 1), '')")
    path = f"regexp_replace({path}, '/+$', '')"
    path = f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    q = f"coalesce(regexp_extract({s0}, '\\?([^#]*)', 1), '')"
    # coalesce: DuckDB's array_to_string of an EMPTY list is NULL
    # (Spark's array_join is '')
    qs = (f"coalesce(array_to_string(list_sort(list_filter("
          f"string_split({q}, '&'), x -> x <> '' AND NOT "
          f"regexp_matches(x, '{TRACKING_RE}'))), '&'), '')")
    return (f"({scheme} || '://' || {host} || {path} || "
            f"(CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END))")


def url_domain_sql(canon_url: str) -> str:
    """url_domain as SQL text over an already-canonical URL column
    (DuckDB oracle form of url_domain)."""
    h = (f"coalesce(regexp_extract({canon_url}, "
         f"'^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), '')")
    h = f"regexp_replace({h}, ':[0-9]+$', '')"
    two = (f"coalesce(regexp_extract({h}, "
           f"'([a-z0-9-]+\\.[a-z0-9-]+)$', 1), '')")
    return f"(CASE WHEN {two} = '' THEN {h} ELSE {two} END)"


def url_host(canon_url: Column) -> Column:
    """Host of an already-canonical URL."""
    return F.regexp_extract(canon_url, r"^[a-z][a-z0-9+.-]*://([^/?#]+)",
                            1)


def url_domain(canon_url: Column) -> Column:
    """Registrable-domain approximation: the host's last two labels
    (no public-suffix list in this sandbox — documented heuristic;
    swap in a PSL broadcast join where precision matters)."""
    h = url_host(canon_url)
    # strip a :port so 'example.com:8080' groups with 'example.com'
    h = F.regexp_replace(h, r":[0-9]+$", "")
    two = F.regexp_extract(h, r"([a-z0-9-]+\.[a-z0-9-]+)$", 1)
    return F.when(two == "", h).otherwise(two)


def dedup_url_keep_first(df: DataFrame, url_col: str = "url",
                         id_col: str = "doc_id") -> DataFrame:
    """One row per canonical URL — the lowest id wins (deterministic
    under any partitioning). Adds `canon_url`. Scale shape: one
    groupBy-sized shuffle on the canonical key; no pair joins."""
    w = Window.partitionBy("canon_url").orderBy(id_col)
    return (df.withColumn("canon_url", canonicalize_url(F.col(url_col)))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def domain_caps(df: DataFrame, max_per_domain: int,
                url_col: str = "url",
                id_col: str = "doc_id") -> DataFrame:
    """Keep at most `max_per_domain` rows per registrable domain,
    lowest ids first (the C4-style anti-domination cap). Adds
    `domain`. One shuffle on domain; skewed mega-domains bound the
    task at max_per_domain survivors but still stream their window —
    cap upstream with hash_sample for pathological hosts."""
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    w = Window.partitionBy("domain").orderBy(id_col)
    return (df.withColumn(
                "domain",
                url_domain(canonicalize_url(F.col(url_col))))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_per_domain).drop("__rn"))
