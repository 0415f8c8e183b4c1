"""Round-13 wave 13c: AR order selection + fit, Markov entropy rate,
and Simpson lexical concentration.

* ``timeseries_ar_order_fit`` — PACF-based AR order selection (largest
  lag whose partial autocorrelation clears the 1.96/sqrt(n) band)
  feeding a Yule-Walker AR(p*) fit at exactly that order: the step
  the identification family has pointed at since round 12
  (``timeseries_pacf_durbin`` picks, this op FITS). Both the pick and
  the order-p* Durbin-Levinson re-run are higher-order folds over the
  same packed ACF vector — the conditional fold simply freezes past
  round p*, so one template serves every data-chosen order.
* ``events_markov_entropy_rate`` — entropy rate of the first-order
  user-journey Markov chain: H = -sum_{ij} (c_ij/T) ln(c_ij/c_i.),
  the predictability number over the same transition counts the
  absorption/attribution rows consume (high = erratic journeys, low =
  deterministic funnels), plus the ln(k)-normalized form.
* ``text_simpson_diversity`` — Simpson concentration per source from
  the exact term-frequency spectrum: D = sum m(m-1) / (N(N-1)) (the
  probability two tokens drawn without replacement are the same
  type — an exact rational!), Gini-Simpson 1-D, and Berger-Parker
  dominance max(m)/N. The concentration axis beside Yule's K
  (which weights the same spectrum quadratically but is unbounded).

House discipline: the AR fit quantizes phi e9 per Durbin-Levinson
round (identical trajectories); entropy terms quantize e9 before the
exact integer reduction (the Fisher lnp pattern); Simpson's sums are
exact integers with one e9 epilogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from emr_with_custom_metrics_spark.catalog import register_views
from emr_with_custom_metrics_spark.operators.stats import (
    _SPINE_FROM_COUNTS_DUCK,
    _SPINE_FROM_COUNTS_SPARK,
    _stage_hour_counts,
)
from emr_with_custom_metrics_spark.operators.wave12b import (
    _PACF_ACF_CORE,
    _PACF_L,
    _pacf_step_duck,
    _pacf_step_spark,
)
from emr_with_custom_metrics_spark.registry import register

_EPOCH_US_SPARK = "unix_micros(CAST(ts AS TIMESTAMP))"
_EPOCH_US_DUCK = "epoch_us(ts)"


# ---------------------------------------------------------------------------
# AR order pick + Yule-Walker fit at the picked order
# ---------------------------------------------------------------------------
# Fold-state layout (wave12b): [v, phi_1..phi_L, pacf_1..pacf_L] with
# v starting at 1.0 and multiplying (1 - pacf_k^2) per round — so the
# final v IS the innovation-variance ratio sigma_p^2 / gamma_0. The
# SECOND fold freezes past round p* (CASE k <= p THEN step ELSE acc),
# which leaves phi_{p*+1}..phi_L exactly 0 and v at the order-p* ratio.


def _arfit_sql(engine: str) -> str:
    L = _PACF_L
    if engine == "spark":
        prefix = _SPINE_FROM_COUNTS_SPARK
        lags = ", lags AS (SELECT explode(sequence(1, 24)) AS lag)"
        pack = (
            "SELECT event_type, transform(array_sort(collect_list("
            "struct(lag, acf_e6))), s -> CAST(s.acf_e6 AS DOUBLE)"
            " / 1000000.0) AS rarr "
            "FROM acf GROUP BY event_type"
        )
        init = (
            f"concat(array(CAST(1.0 AS DOUBLE)), "
            f"transform(sequence(1, {2 * L}), z -> CAST(0.0 AS DOUBLE)))"
        )
        fold1 = (
            f"aggregate(sequence(1, {L}), {init}, "
            f"(acc, k) -> ({_pacf_step_spark('acc', 'k')}))"
        )
        pickf = (
            f"aggregate(sequence(1, {L}), 0, (m, k) -> "
            f"CASE WHEN abs(element_at(f.st, {1 + L} + k)) * sqrt(f.nd) "
            f"> 1.96e0 AND k > m THEN k ELSE m END)"
        )
        # the round list is truncated to p_ord OUTSIDE the lambda: a
        # lambda capturing BOTH rarr and p_ord triggers a DuckDB
        # list_reduce row-correlation bug (see tail comment), and the
        # Spark text mirrors the shape so the two engines share one plan
        fold2 = (
            f"aggregate(slice(sequence(1, {L}), 1, CAST(p.p_ord AS INT)), "
            f"{init}, (acc, k) -> ({_pacf_step_spark('acc', 'k')}))"
        )
        fin = "element_at(g.st2, {i})"
        mat = ""
    else:
        prefix = _SPINE_FROM_COUNTS_DUCK
        lags = ", lags AS (SELECT UNNEST(generate_series(1, 24)) AS lag)"
        pack = (
            "SELECT event_type, list(CAST(acf_e6 AS DOUBLE) / 1000000.0 "
            "ORDER BY lag) AS rarr FROM acf GROUP BY event_type"
        )
        init = (
            f"list_concat([1.0], list_transform(generate_series(1, {2 * L}),"
            f" z -> 0.0))"
        )
        fold1 = (
            f"list_reduce(list_concat([{init}], "
            f"list_transform(generate_series(1, {L}), "
            f"k -> [CAST(k AS DOUBLE)])), "
            f"(acc, st) -> ({_pacf_step_duck('acc', 'CAST(st[1] AS INT)')}))"
        )
        pickf = (
            f"list_reduce(list_concat([0], generate_series(1, {L})), "
            f"(m, k) -> CASE WHEN abs(f.st[CAST({1 + L} + k AS INT)]) "
            f"* sqrt(f.nd) > 1.96e0 AND k > m THEN k ELSE m END)"
        )
        fold2 = (
            f"list_reduce(list_concat([{init}], "
            f"list_transform(generate_series(1, CAST(p.p_ord AS BIGINT)), "
            f"k -> [CAST(k AS DOUBLE)])), "
            f"(acc, st) -> ({_pacf_step_duck('acc', 'CAST(st[1] AS INT)')}))"
        )
        fin = "g.st2[{i}]"
        mat = " MATERIALIZED"
    # every fold/HOF below reads columns of ONE table alias, and each
    # DuckDB fold lambda captures at most ONE outer column (rarr, the
    # shape the round-12 pacf fold proved): at sf0.001 a fold whose
    # lambda captured rarr AND p_ord returned ANOTHER ROW's fold result
    # (e.g. 'error' silently got 'signup's st2) — both with a JOIN in
    # the same SELECT and without one. The order count is therefore
    # applied OUTSIDE the lambda by truncating the round list to p_ord,
    # and rarr/nd/p_ord are carried through the CTE chain.
    tail = f"""
    , nd AS{mat} (
        SELECT event_type, CAST(MAX(n) AS DOUBLE) AS nd FROM tot
        GROUP BY event_type
    ), packed AS{mat} (
        SELECT a.event_type, a.rarr, t.nd
        FROM ({pack}) a JOIN nd t ON t.event_type = a.event_type
    ), folded AS{mat} (
        SELECT p.event_type, p.rarr, p.nd, ({fold1}) AS st
        FROM packed p
    ), pick AS{mat} (
        SELECT f.event_type, f.rarr, CAST(f.nd AS BIGINT) AS n,
               ({pickf}) AS p_ord
        FROM folded f
    ), fitted AS{mat} (
        SELECT p.event_type, p.n, p.p_ord, ({fold2}) AS st2
        FROM pick p
    )
    SELECT g.event_type, g.n, CAST(g.p_ord AS BIGINT) AS chosen_p,
           CAST(round({fin.format(i=2)} * 1000000000) AS BIGINT) AS phi1_e9,
           CAST(round({fin.format(i=3)} * 1000000000) AS BIGINT) AS phi2_e9,
           CAST(round({fin.format(i=4)} * 1000000000) AS BIGINT) AS phi3_e9,
           CAST(round({fin.format(i=1)} * 1000000000) AS BIGINT)
               AS var_ratio_e9
    FROM fitted g
"""
    return prefix + lags + _PACF_ACF_CORE + tail


@register(
    "timeseries_ar_order_fit",
    oracle=_arfit_sql("duck"),
    doc="AR order selection + Yule-Walker fit per metric: p* = the "
    "largest lag whose PACF clears the 1.96/sqrt(n) significance band "
    "(picked by a pure integer-max fold over the Durbin-Levinson "
    "state), then the recursion RE-RUN frozen past round p* (CASE "
    "k <= p* in the fold step), so phi_1..phi_3 are the exact "
    "order-p* Yule-Walker coefficients and v = prod(1 - pacf_k^2) is "
    "the innovation-variance ratio sigma_p^2/gamma_0 — the "
    "identification -> estimation step timeseries_pacf_durbin points "
    "at (Box-Jenkins). Shares the family's exact centered ACF "
    "integers and the wave-12b fold verbatim; two model-sized folds "
    "per metric, phi quantized e9 per round. The data-sized stage is "
    "the shared hourly count reduction.",
)
def timeseries_ar_order_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _stage_hour_counts(spark, sf_dir)
    return spark.sql(_arfit_sql("spark"))


# ---------------------------------------------------------------------------
# Markov-chain entropy rate over user journeys
# ---------------------------------------------------------------------------
_ENTROPY_RATE_TMPL = """
    WITH seq AS (
        SELECT user_id, event_type, {epoch_us} AS us, event_id,
               LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY {epoch_us}, event_id) AS nxt
        FROM events
    ), trans AS (
        SELECT event_type AS s_from, nxt AS s_to,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY event_type, nxt
    ), rowt AS (
        SELECT s_from, CAST(SUM(c) AS BIGINT) AS rc
        FROM trans GROUP BY s_from
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS t,
               CAST(COUNT(DISTINCT s_from) AS BIGINT) AS k
        FROM trans
    ), terms AS (
        SELECT CAST(SUM(CAST(ROUND(
                   -(CAST(tr.c AS DOUBLE) / t.t)
                   * ln(CAST(tr.c AS DOUBLE) / r.rc)
                   * 1000000000) AS BIGINT)) AS BIGINT) AS h_e9
        FROM trans tr
        JOIN rowt r ON r.s_from = tr.s_from
        CROSS JOIN tot t
    )
    SELECT t.t AS n_transitions, t.k AS n_states, x.h_e9 AS entropy_rate_e9,
           CASE WHEN t.k > 1
                THEN CAST(ROUND(CAST(x.h_e9 AS DOUBLE)
                     / (ln(CAST(t.k AS DOUBLE)) * 1000000000)
                     * 1000000000) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS normalized_e9
    FROM terms x CROSS JOIN tot t
"""


@register(
    "events_markov_entropy_rate",
    oracle=_ENTROPY_RATE_TMPL.format(epoch_us=_EPOCH_US_DUCK),
    doc="Entropy rate of the first-order user-journey Markov chain: "
    "H = -sum_ij (c_ij/T) ln(c_ij/c_i.) over the same LEAD-pair "
    "transition counts the absorption/attribution family consumes — "
    "the journey-predictability scalar (low = deterministic funnels, "
    "high = erratic browsing; the stationary weight is the empirical "
    "transition-origin frequency, exact by construction), plus the "
    "ln(k)-normalized form. Each -p ln p term quantizes e9 before the "
    "exact integer reduction over the k^2-bounded transition cells "
    "(Fisher lnp discipline). One window pass + one "
    "map-side-combinable count; model-sized epilogue.",
)
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ENTROPY_RATE_TMPL.format(epoch_us=_EPOCH_US_SPARK))


# ---------------------------------------------------------------------------
# Simpson concentration / diversity per source
# ---------------------------------------------------------------------------
_SIMPSON_TMPL = """
    WITH tok AS (
        {tokens}
    ), tf AS (
        SELECT source, term, CAST(COUNT(*) AS BIGINT) AS m
        FROM tok GROUP BY source, term
    ), spec AS (
        SELECT source,
               CAST(SUM(m) AS BIGINT) AS n,
               CAST(SUM(m * (m - 1)) AS BIGINT) AS pairs_same,
               CAST(MAX(m) AS BIGINT) AS m_max,
               CAST(COUNT(*) AS BIGINT) AS vocab
        FROM tf GROUP BY source
    )
    SELECT source, n AS n_tokens, vocab,
           CASE WHEN n > 1
                THEN CAST(ROUND(CAST(pairs_same AS DOUBLE) / n / (n - 1)
                     * 1000000000) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS simpson_d_e9,
           CASE WHEN n > 1
                THEN 1000000000 - CAST(ROUND(CAST(pairs_same AS DOUBLE)
                     / n / (n - 1) * 1000000000) AS BIGINT)
                ELSE CAST(1000000000 AS BIGINT) END AS gini_simpson_e9,
           CAST(ROUND(CAST(m_max AS DOUBLE) / n * 1000000000) AS BIGINT)
               AS berger_parker_e9
    FROM spec
"""

_SIMPSON_SPARK = _SIMPSON_TMPL.format(
    tokens="SELECT source, explode(split(text, ' ')) AS term FROM documents"
)
_SIMPSON_DUCK = _SIMPSON_TMPL.format(
    tokens="SELECT source, UNNEST(string_split(text, ' ')) AS term "
    "FROM documents"
)


@register(
    "text_simpson_diversity",
    oracle=_SIMPSON_DUCK,
    doc="Simpson concentration per source from the exact term-frequency "
    "spectrum: D = sum m(m-1) / (N(N-1)) — the probability two tokens "
    "drawn without replacement are the same type, an exact integer "
    "rational with one e9 epilogue — plus Gini-Simpson diversity 1-D "
    "and Berger-Parker dominance max(m)/N. The bounded concentration "
    "axis beside text_yule_k (same spectrum, unbounded quadratic "
    "weighting) and the Shannon rows: template farms and boilerplate "
    "sources push D and dominance up together. One explode + two "
    "map-side-combinable aggregations.",
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_SIMPSON_SPARK)
