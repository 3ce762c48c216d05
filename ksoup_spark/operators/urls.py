"""URL canonicalization + URL-level dedup — the web-pipeline companion to
content dedup (a crawl holds the same page under many URL spellings).

All transformations are single-row JVM regex/string expressions (no
shuffle, no Python), so canonicalization runs at scan speed at 100 TB;
the dedup is one hash-groupBy on the canonical string.

The rules are the standard safe-normalization set (RFC 3986 §6 + the
tracking-param strip every crawler applies):
  - scheme and host lowercased (path/query case preserved)
  - default ports dropped (http:80, https:443)
  - fragment dropped
  - tracking params dropped (utm_*, fbclid, gclid, msclkid)
  - empty query tidied ("?" / dangling "&" removed)
  - duplicate slashes in the path collapsed (scheme's "//" kept)

Patterns stay inside the Java-regex ∩ RE2 subset (no lookaround) so the
DuckDB oracle runs the IDENTICAL expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"
_TRACKING = r"(utm_[A-Za-z]+|fbclid|gclid|msclkid)=[^&#]*"
_PORT80 = r"^(http://[^/?#:]*):80($|[/?#].*)"
_PORT443 = r"^(https://[^/?#:]*):443($|[/?#].*)"
_DUPSLASH = r"([^:/])/{2,}"


def canonical_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # 1. lowercase scheme://host
    lowered = F.concat(
        F.lower(F.regexp_extract(c, _SCHEME_HOST, 1)),
        F.regexp_replace(c, _SCHEME_HOST, ""),
    )
    # 2. drop fragment
    out = F.regexp_replace(lowered, r"#.*$", "")
    # 3. drop default ports
    out = F.regexp_replace(out, _PORT80, r"$1$2")
    out = F.regexp_replace(out, _PORT443, r"$1$2")
    # 4. strip tracking params (+ tidy separators)
    out = F.regexp_replace(out, _TRACKING, "")
    out = F.regexp_replace(out, r"\?&+", "?")
    out = F.regexp_replace(out, r"&&+", "&")
    out = F.regexp_replace(out, r"[?&]+$", "")
    # 5. collapse duplicate slashes in the path (scheme "//" untouched:
    # the preceding char there is ':')
    return F.regexp_replace(out, _DUPSLASH, r"$1/")


def canonical_url_sql(u: str) -> str:
    """DuckDB twin of canonical_url over SQL expression `u`: the same
    regex pipeline with RE2 backreference syntax."""
    return rf"""
regexp_replace(
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                lower(regexp_extract({u},
                      '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1))
                  || regexp_replace({u},
                      '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', ''),
                '#.*$', ''),
              '^(http://[^/?#:]*):80($|[/?#].*)', '\1\2'),
            '^(https://[^/?#:]*):443($|[/?#].*)', '\1\2'),
          '(utm_[A-Za-z]+|fbclid|gclid|msclkid)=[^&#]*', '', 'g'),
        '\?&+', '?', 'g'),
      '&&+', '&', 'g'),
    '[?&]+$', ''),
  '([^:/])/{{2,}}', '\1/', 'g')
"""


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """One canonical (min id) row per canonical URL; spelling variants
    counted. One hash-groupBy on the canonical string — at 10^12 rows,
    group on md5(canon) to keep shuffle keys fixed-width."""
    canon = canonical_url(url_col)
    return (
        df.select(F.col(id_col).alias("doc_id"), canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.min("doc_id").alias("canonical_id"),
             F.count(F.lit(1)).alias("n_variants"))
    )
