"""PII detection and redaction over document text.

A standard pre-training scrub pass (the C4/CCNet-style pipeline step):
count pattern hits per class for filtering decisions, and rewrite the
text with class tokens for retention. Everything is built-in regexp
Column expressions — per-row maps inside whole-stage codegen, no
shuffle, corpus-linear at any scale.

The patterns are deliberately conservative and RE2-compatible (no
backreferences, no lookaround) so the exact same strings run under
Spark's Java regex and external engines (the DuckDB oracle uses them
verbatim): for alternation-free greedy patterns, leftmost-first (Java)
and leftmost-longest (RE2) matching coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (class, pattern, replacement) — redaction applies IN THIS ORDER, so a
# URL containing an email/IP is swallowed whole before the narrower
# classes run; counts are measured per class on the original text.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[- ]\d{2,4}[- ]\d{3,4}(?:[- ]\d{2,4})?", "<PHONE>"),
]


def pii_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``<class>_cnt`` per PII class plus ``pii_total``.

    Counts run independently per class on the raw text (a detection
    report: an email inside a URL counts for both), unlike redaction
    which is sequential."""
    text = F.col(text_col)
    cols = {}
    for name, pat, _repl in PII_PATTERNS:
        cols[f"{name}_cnt"] = F.regexp_count(text, F.lit(pat))
    out = df.withColumns(cols)
    total = None
    for name, _pat, _repl in PII_PATTERNS:
        c = F.col(f"{name}_cnt")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Adds ``out_col``: the text with each PII class replaced by its
    token, applied in PII_PATTERNS order (URL first — widest span)."""
    text = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        text = F.regexp_replace(text, pat, repl)
    return df.withColumn(out_col, text)


def domain_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus domain inventory from in-text URLs — the C4-style
    blocklist-analysis step (Raffel et al. 2020 filter by domain
    blocklists; this emits the measurements a blocklist decision needs):
    the host of every http(s) URL, aggregated to
    ``(domain, url_cnt, doc_cnt)``.

    The host pattern is RE2-safe like PII_PATTERNS, so the oracle runs
    the identical string. Shape at scale: per-row extraction inside the
    scan, one explode, two map-side-combinable aggregations keyed by
    (doc, domain) then domain — corpus-linear; popular domains are
    aggregate keys (counts), never join keys, so skew is benign.
    """
    hosts = F.regexp_extract_all(
        F.col(text_col), F.lit(r"https?://([^/\s:]+)"), 1
    )
    ex = df.select(F.col(id_col), F.explode(hosts).alias("_h")).select(
        F.col(id_col), F.lower(F.col("_h")).alias("domain")
    )
    per_doc = ex.groupBy(id_col, "domain").agg(F.count(F.lit(1)).alias("_c"))
    return per_doc.groupBy("domain").agg(
        F.sum("_c").alias("url_cnt"),
        F.count(F.lit(1)).alias("doc_cnt"),
    )


def url_canonical_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """URL-level deduplication by canonical form — the crawl-frontier /
    WARC dedup step (CommonCrawl dedups fetches by canonicalized URL
    before any content hashing): extract every http(s) URL, canonicalize
    (lowercase, strip scheme, strip a leading ``www.``, strip query
    string and fragment, strip one trailing slash), and keep the first
    (min id) document per canonical URL.

    Dropping the whole query string is the documented simplification of
    "strip tracking parameters" — the key is URL-sans-query, the common
    conservative canonical form. All patterns are RE2-safe so the oracle
    runs the identical strings. Returns
    (canon_url, keeper_id, n_docs, n_urls).

    Shape at scale: per-row extraction inside the scan, one explode,
    one aggregation keyed by canonical URL with map-side combine —
    corpus-linear; hot URLs are aggregate keys, never join keys.
    """
    urls = F.regexp_extract_all(
        F.col(text_col), F.lit(r"https?://[^\s]+"), 0
    )
    ex = df.select(F.col(id_col), F.explode(urls).alias("_u"))
    canon = F.lower(F.col("_u"))
    canon = F.regexp_replace(canon, r"^https?://", "")
    canon = F.regexp_replace(canon, r"^www\.", "")
    canon = F.regexp_replace(canon, r"[?#].*$", "")
    canon = F.regexp_replace(canon, r"/$", "")
    return (
        ex.select(F.col(id_col), canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_urls"),
        )
    )
