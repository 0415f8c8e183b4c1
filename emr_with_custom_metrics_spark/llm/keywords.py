"""Keyword / collocation extraction over the documents corpus.

Two classic unsupervised extractors a corpus pipeline runs before any
modeling: RAKE (Rose et al. 2010 — phrase candidates between stopword
boundaries, scored by word degree/frequency) and Dunning's log-likelihood
ratio (Computational Linguistics 1993 — the collocation significance test
that, unlike PMI, does not explode on rare pairs).

Determinism notes:
- RAKE's word scores are a single division of two exact integers
  (degree/frequency), quantized to 1e-6 BIGINT BEFORE the per-phrase sum,
  so phrase scores are exact integer sums — order-free.
- LLR's four xlog(x) terms use ln(), the repo's documented transcendental
  hazard (libm vs DuckDB last-ulp drift). The LLR output quantizes at 1e-4
  where a flip would need the true value within ~1e-11 of a .5 boundary —
  the adamic-adar precedent; the top-k tie-break is the bigram string, so
  ranking cannot flip either.
- The stoplist is corpus-derived (top-8 tokens by frequency with
  deterministic ties) — a fixed English list would be vacuous against the
  synthetic vocabulary (the text_gopher_rules lesson).

Scale: both are explode + aggregate plans whose shuffles carry tokens /
bigrams with integer counts; the stoplist and vocabulary statistics are
broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from emr_with_custom_metrics_spark.catalog import register_views
from emr_with_custom_metrics_spark.operators.stats import global_rank_guard
from emr_with_custom_metrics_spark.registry import register

# ---------------------------------------------------------------------------
# RAKE
# ---------------------------------------------------------------------------
# Shared head: from a (doc_id, pos, tok) token stream to flagged
# segmented tokens. The token stream is referenced twice (stoplist +
# flagging) — the linear map-side cost, accepted and bounded; everything
# BELOW seg is staged on the Spark side because seg feeds both the
# word-statistics pass and the phrase-text assembly (WITH-inlining would
# re-run tokenize + window per consumer).
_RAKE_SEG = """
    , stop AS (
        SELECT tok FROM (
            SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
        ) f ORDER BY c DESC, tok LIMIT 8
    ), flagged AS (
        SELECT t.doc_id, t.pos, t.tok,
               CASE WHEN s.tok IS NULL THEN 0 ELSE 1 END AS is_stop
        FROM toks t LEFT JOIN stop s ON t.tok = s.tok
    ), seg AS (
        SELECT doc_id, pos, tok, is_stop,
               CAST(SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS seg_id
        FROM flagged
    )
"""

_RAKE_TAIL = """
    , phrase_words AS (
        SELECT doc_id, seg_id, pos, tok,
               COUNT(*) OVER (PARTITION BY doc_id, seg_id) AS phrase_len
        FROM seg WHERE is_stop = 0
    ), word_stats AS (
        SELECT tok,
               COUNT(*) AS freq,
               CAST(SUM(phrase_len) AS BIGINT) AS degree
        FROM phrase_words GROUP BY tok
    ), scored_words AS (
        SELECT tok,
               CAST(ROUND((CAST(degree AS DOUBLE) / freq) * 1000000)
                   AS BIGINT) AS wscore_e6
        FROM word_stats
    ), phrase_scores AS (
        SELECT p.doc_id, p.seg_id,
               CAST(SUM(w.wscore_e6) AS BIGINT) AS score_e6,
               COUNT(*) AS n_words
        FROM phrase_words p JOIN scored_words w ON p.tok = w.tok
        GROUP BY p.doc_id, p.seg_id
    ), phrases AS (
        SELECT ps.doc_id, ps.seg_id, ps.score_e6, ps.n_words, pt.phrase
        FROM phrase_scores ps JOIN agg_phrase pt
          ON ps.doc_id = pt.doc_id AND ps.seg_id = pt.seg_id
        WHERE ps.n_words BETWEEN 2 AND 4
    ), best AS (
        SELECT phrase,
               CAST(MAX(score_e6) AS BIGINT) AS score_e6,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM phrases GROUP BY phrase
    )
    SELECT phrase, score_e6, n_occurrences
    FROM best ORDER BY score_e6 DESC, phrase LIMIT 15
"""

_AGG_PHRASE_SPARK = """(
        SELECT doc_id, seg_id,
               concat_ws(' ', transform(array_sort(collect_list(
                   struct(pos, tok))), s -> s.tok)) AS phrase
        FROM (SELECT doc_id, seg_id, pos, tok FROM seg WHERE is_stop = 0) z
        GROUP BY doc_id, seg_id
    )"""

_RAKE_HEAD_SPARK = (
    """
    WITH raw AS (
        SELECT doc_id, split(text, ' ') AS t FROM documents
    ), toks AS (
        SELECT doc_id, pos + 1 AS pos, tok
        FROM raw LATERAL VIEW posexplode(t) x AS pos, tok
    )
"""
    + _RAKE_SEG
    + "SELECT doc_id, pos, tok, is_stop, seg_id FROM seg"
)

_RAKE_DUCK = (
    """
    WITH raw AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), toks AS (
        SELECT doc_id, u.pos AS pos, u.tok AS tok
        FROM raw, UNNEST(list_transform(range(1, len(t) + 1),
             i -> {'pos': i, 'tok': t[i]})) AS x(u)
    )
"""
    + _RAKE_SEG
    + _RAKE_TAIL.replace(
        "agg_phrase",
        """(
        SELECT doc_id, seg_id,
               string_agg(tok, ' ' ORDER BY pos) AS phrase
        FROM (SELECT doc_id, seg_id, pos, tok FROM seg WHERE is_stop = 0) z
        GROUP BY doc_id, seg_id
    )""",
    )
)


@register(
    "text_rake_keywords",
    oracle=_RAKE_DUCK,
    doc="RAKE keyphrase extraction (Rose et al. 2010): candidate phrases "
    "are maximal token runs between corpus-derived stopwords (top-8 by "
    "frequency, deterministic ties), each word scored degree/frequency "
    "over the phrase graph, each phrase by the sum of its word scores "
    "(1e-6-quantized before the sum so the reduction is integer); "
    "corpus-level top-15 phrases of 2-4 words (the standard RAKE length "
    "cap) with occurrence counts. "
    "Segment ids come from a running sum of stopword flags per doc — "
    "the islands idiom. Shuffles carry (token, count) and (doc, segment) "
    "keys; the stoplist is an 8-row broadcast.",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    spark.sql(_RAKE_HEAD_SPARK).localCheckpoint().createOrReplaceTempView(
        "st_rake_seg"
    )
    return spark.sql(
        "WITH seg AS (SELECT * FROM st_rake_seg)"
        + _RAKE_TAIL.replace("agg_phrase", _AGG_PHRASE_SPARK)
    )


# ---------------------------------------------------------------------------
# Dunning log-likelihood ratio collocations
# ---------------------------------------------------------------------------
_LLR_POST = """
    , r AS (
        SELECT w1, CAST(SUM(k11) AS BIGINT) AS r1 FROM bg GROUP BY w1
    ), c AS (
        SELECT w2, CAST(SUM(k11) AS BIGINT) AS c1 FROM bg GROUP BY w2
    ), n AS (
        SELECT CAST(SUM(k11) AS BIGINT) AS nn FROM bg
    ), cells AS (
        SELECT bg.w1, bg.w2, bg.k11,
               r.r1 - bg.k11 AS k12,
               c.c1 - bg.k11 AS k21,
               n.nn - r.r1 - c.c1 + bg.k11 AS k22,
               r.r1, c.c1, n.nn
        FROM bg JOIN r ON bg.w1 = r.w1 JOIN c ON bg.w2 = c.w2 CROSS JOIN n
    ), llr AS (
        SELECT w1, w2, k11,
               CAST(ROUND(2 * (
                   (CASE WHEN k11 = 0 THEN 0 ELSE k11 * ln(CAST(k11 AS DOUBLE) * nn / (CAST(r1 AS DOUBLE) * c1)) END)
                 + (CASE WHEN k12 = 0 THEN 0 ELSE k12 * ln(CAST(k12 AS DOUBLE) * nn / (CAST(r1 AS DOUBLE) * (nn - c1))) END)
                 + (CASE WHEN k21 = 0 THEN 0 ELSE k21 * ln(CAST(k21 AS DOUBLE) * nn / (CAST(nn - r1 AS DOUBLE) * c1)) END)
                 + (CASE WHEN k22 = 0 THEN 0 ELSE k22 * ln(CAST(k22 AS DOUBLE) * nn / (CAST(nn - r1 AS DOUBLE) * (nn - c1))) END)
               ) * 10000) AS BIGINT) AS llr_e4
        FROM cells
    )
    SELECT w1, w2, k11, llr_e4
    FROM llr ORDER BY llr_e4 DESC, w1, w2 LIMIT 20
"""

# Spark stages the bigram-count table: the marginals (r, c, n) and the
# cells join all reference bg, and WITH-inlining would re-run the
# tokenize + explode + aggregate chain per reference.
_LLR_BG_SPARK = """
    WITH tok AS (
        SELECT doc_id, split(text, ' ') AS toks FROM documents
        WHERE size(split(text, ' ')) >= 2
    ), bigrams AS (
        SELECT explode(transform(sequence(1, size(toks) - 1),
                   i -> struct(element_at(toks, i) AS w1,
                               element_at(toks, i + 1) AS w2))) AS b
        FROM tok
    ), bigrams2 AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bigrams)
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS k11
    FROM bigrams2 GROUP BY w1, w2
"""

_LLR_DUCK = (
    """
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ), bigrams AS (
        SELECT UNNEST(list_transform(range(1, len(toks)),
                   i -> {'w1': toks[i], 'w2': toks[i + 1]})) AS b
        FROM tok
    ), bigrams2 AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bigrams
    ), bg AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS k11
        FROM bigrams2 GROUP BY w1, w2
    )
"""
    + _LLR_POST
)


@register(
    "text_collocation_llr",
    oracle=_LLR_DUCK,
    doc="Dunning log-likelihood-ratio collocations (Computational "
    "Linguistics 19(1), 1993): the bigram significance test that stays "
    "calibrated on rare pairs where PMI (text_cooccurrence_pmi) "
    "saturates. The 2x2 contingency per bigram comes from exact integer "
    "marginals (one bigram aggregation + two marginal re-aggregations + "
    "a broadcast grand total); the four x*ln(...) terms are the repo's "
    "documented transcendental hazard, so LLR quantizes at 1e-4 and the "
    "top-20 tie-break is the bigram text. Shuffle payload: bigram keys "
    "with counts, nothing larger.",
)
def text_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    spark.sql(_LLR_BG_SPARK).localCheckpoint().createOrReplaceTempView(
        "st_llr_bg"
    )
    return spark.sql("WITH bg AS (SELECT * FROM st_llr_bg)" + _LLR_POST)


# ---------------------------------------------------------------------------
# Zipf law fit — corpus sanity diagnostic
# ---------------------------------------------------------------------------
# OLS of ln(freq) on ln(rank): natural corpora sit near slope -1; synthetic
# or templated corpora (like this one) flatten toward 0 — which is exactly
# what makes the fit a GENERATION-ARTIFACT detector in a data pipeline.
# ln() outputs quantize to 1e-6 integers BEFORE the moment sums, so all five
# OLS moments are exact integers and the slope/intercept/r2 are single
# deterministic expressions over them.

_ZIPF_TAIL = """
    , freqs AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM words GROUP BY tok
    ), ranked AS (
        SELECT tok, f,
               ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS r
        FROM freqs
    ), pts AS (
        -- the OLS needs ln(rank) PER RANK (no tie-group closed form),
        -- so the global vocabulary sort stays — behind the loud budget
        -- guard (r11 VERDICT item 1): past GLOBAL_RANK_BUDGET types
        -- the fit must be chunked, never silently one-task-sorted
        SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
               CAST(ROUND(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
        FROM ranked
        WHERE {guard}
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pts
    )
    SELECT n AS n_words,
           CAST(ROUND(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                 * 1000000) AS BIGINT) AS slope_e6,
           CAST(ROUND((((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * sx) / n) / CAST(1000000 AS DOUBLE)) * 1000000)
               AS BIGINT) AS intercept_e6,
           CAST(ROUND(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
                 * 1000000) AS BIGINT) AS r2_e6
    FROM mom
"""

_ZIPF_SPARK = (
    """
    WITH words AS (
        SELECT explode(split(text, ' ')) AS tok FROM documents
    )
"""
    + _ZIPF_TAIL.format(guard=global_rank_guard("spark", "r"))
)

_ZIPF_DUCK = (
    """
    WITH words AS (
        SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    )
"""
    + _ZIPF_TAIL.format(guard=global_rank_guard("duck", "r"))
)


@register(
    "text_zipf_fit",
    oracle=_ZIPF_DUCK,
    doc="Zipf-law fit of the corpus frequency spectrum: OLS slope of "
    "ln(freq) on ln(rank) plus intercept and r² — natural text sits near "
    "slope -1, so the fit doubles as a generation-artifact detector for "
    "templated/synthetic corpora (this corpus measures far shallower, "
    "which is the point). The repo's transcendental-hazard rule applied: "
    "each ln() quantizes to a 1e-6 integer BEFORE the moment sums, so "
    "all five OLS moments are exact integers and slope/r² are fixed "
    "expression DAGs over them. One token aggregation (vocabulary-sized "
    "state), one ROW_NUMBER over the vocabulary, one scalar reduce.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_ZIPF_SPARK)
