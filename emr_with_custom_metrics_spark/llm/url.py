"""URL canonicalization + dedup ([EXT], SURVEY.md §2B — web-corpus hygiene).

Crawls re-fetch the same page under many spellings — scheme/host case,
explicit default ports, percent-encoded unreserved characters, trailing
slashes, tracking parameters, shuffled query order, fragments. URL-level
dedup is the cheapest dedup tier in a web pipeline (it runs on the *index*,
before a single payload byte is fetched or decoded), so the normalizer
must be pure Catalyst: every step below is built-in expressions (regexp /
split / transform / filter / array_sort), zero Python in the row path,
whole-stage-codegen'd, linear at 100 TB of URLs.

Normalization implemented (RFC 3986 §6 syntax-based normalization):

- strip the fragment (never part of the resource identity)
- lowercase the scheme and the host (ONLY those — path/query are
  case-sensitive per spec)
- drop an explicit default port (https:443 / http:80), keep others
- percent-decode unreserved characters only (``%64`` → ``d``;
  reserved escapes like ``%2F`` must stay encoded — decoding them would
  CHANGE the path structure)
- collapse/strip trailing slashes on a non-root path
- drop tracking parameters (utm_*, fbclid, gclid), sort the remaining
  query parameters, rejoin

Oracle design: three messy deterministic variants of each group's
canonical URL are synthesized in-engine; the oracle predicts the canonical
string and group census closed-form from the generation rule, while the
Spark side must EARN it through the generic normalizer — any
case/port/escape/param bug yields a different string and breaks the hash.

No reference analogue (`scripts/spark_converter.py` is a metrics ETL);
this is §2B extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register

# Tracking parameters a crawl pipeline strips. Anchored match on the
# param NAME (the text before '='), not a substring scan.
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="


def _decode_piece(piece: Column) -> Column:
    """Decode one post-'%' fragment: leading 2 hex digits + tail.

    Unreserved characters (RFC 3986 §2.3: ALPHA / DIGIT / - . _ ~) decode;
    everything else — reserved escapes, invalid hex — keeps its '%'.
    """
    hex2 = F.substring(piece, 1, 2)
    valid = hex2.rlike("^[0-9A-Fa-f]{2}$")
    ch = F.char(F.conv(hex2, 16, 10).cast("int"))
    unreserved = ch.rlike("^[A-Za-z0-9._~-]$")
    return F.when(
        valid & unreserved, F.concat(ch, F.substring(piece, 3, 1_000_000))
    ).otherwise(F.concat(F.lit("%"), piece))


def percent_decode_unreserved(s: Column) -> Column:
    """Selective percent-decode: split on '%', decode each escape head."""
    parts = F.split(s, "%")
    tail = F.transform(F.slice(parts, 2, F.size(parts)), _decode_piece)
    return F.concat(F.element_at(parts, 1), F.array_join(tail, ""))


def canonical_url(url: Column) -> Column:
    """RFC 3986 syntax-based canonical form, as one Catalyst expression."""
    base = F.substring_index(url, "#", 1)
    scheme = F.lower(
        F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    after = F.regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.substring_index(F.substring_index(after, "/", 1), "?", 1)
    hostport = F.lower(authority)
    host = F.substring_index(hostport, ":", 1)
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    default_port = (
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
        | (port == "")
    )
    netloc = F.when(default_port, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    pathq = F.substring(after, F.length(authority) + 1, 1_000_000)
    raw_path = F.substring_index(pathq, "?", 1)
    raw_query = F.when(
        pathq.contains("?"),
        F.substring(
            pathq, F.length(raw_path) + 2, 1_000_000
        ),
    ).otherwise(F.lit(""))
    path = percent_decode_unreserved(raw_path)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(path == "/", F.lit("/")).otherwise(
            F.regexp_replace(path, "/+$", "")
        )
    )
    params = F.filter(
        F.split(raw_query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        netloc,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )


def _variant_urls(grp: Column) -> Column:
    """Three deterministic messy spellings of the group's canonical URL."""
    h = (grp % 40).cast("string")
    g = grp.cast("string")
    page = (grp % 7).cast("string")
    ref = (grp % 3).cast("string")
    v_canonical = F.concat(
        F.lit("https://host"), h, F.lit(".example.com/docs/doc/"), g,
        F.lit("?page="), page, F.lit("&ref="), ref,
    )
    v_messy = F.concat(
        F.lit("HTTPS://Host"), h, F.lit(".EXAMPLE.com:443/docs/%64oc/"), g,
        F.lit("/?utm_source=feed&ref="), ref, F.lit("&page="), page,
        F.lit("#frag"),
    )
    v_tracking = F.concat(
        F.lit("https://HOST"), h, F.lit(".example.com/docs/doc/"), g,
        F.lit("?ref="), ref, F.lit("&page="), page, F.lit("&gclid=abc123"),
    )
    return F.array(v_canonical, v_messy, v_tracking)


@register(
    "dedup_url_canonical",
    # The oracle predicts the canonical string + group census from the
    # generation rule; Spark must recover the identical string through the
    # generic normalizer over three messy spellings per document.
    oracle="""
    WITH g AS (
        SELECT doc_id % 200 AS grp, COUNT(*) AS docs
        FROM documents GROUP BY doc_id % 200
    )
    SELECT 'https://host' || CAST(grp % 40 AS VARCHAR)
             || '.example.com/docs/doc/' || CAST(grp AS VARCHAR)
             || '?page=' || CAST(grp % 7 AS VARCHAR)
             || '&ref=' || CAST(grp % 3 AS VARCHAR) AS canonical_url,
           CAST(3 * docs AS BIGINT) AS n_variants,
           CAST(docs AS BIGINT) AS n_docs
    FROM g ORDER BY canonical_url
    """,
    doc="URL-level dedup (web-corpus hygiene, the cheapest dedup tier — "
    "runs on the crawl index before any payload is fetched): three messy "
    "spellings per document (case, explicit :443, %-encoded unreserved "
    "chars, trailing slash, utm/gclid tracking params, shuffled query "
    "order, fragment) are normalized by a pure-Catalyst RFC 3986 "
    "canonicalizer and grouped. One hash-aggregate shuffle on the "
    "canonical string; the normalizer itself is whole-stage-codegen "
    "expressions, zero Python.",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 200).alias("grp")
    )
    urls = d.select(
        "doc_id", F.explode(_variant_urls(F.col("grp"))).alias("url")
    )
    return (
        urls.select(
            "doc_id", canonical_url(F.col("url")).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("canonical_url")
    )
