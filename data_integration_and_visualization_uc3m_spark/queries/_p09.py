"""Query registry — part 9: round-11 second-wave additions.

Continues the chain (see queries/_core.py): preference-model fitting
(Bradley-Terry), doubly-robust off-policy evaluation, sample-scaling
extrapolation (inverse-n OLS), and split-conformal coverage — the
eval-side operators an RLHF / data-curation pipeline runs next to the
curation operators in parts 1-8. Registration order is append-only.
"""

from __future__ import annotations

from ._p08 import *  # noqa: F401,F403


@register(
    "bradley_terry_strengths",
    """
    WITH pref AS (
        SELECT CAST(doc_id % 6 AS BIGINT) AS a,
               CAST((doc_id // 6) % 6 AS BIGINT) AS b,
               CASE WHEN ('0x' || substr(md5('bt:' ||
                        CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
                    < (60 + 5 * (doc_id % 6)) * 1000
                      // (120 + 5 * (doc_id % 6) + 5 * ((doc_id // 6) % 6))
                    THEN 1 ELSE 0 END AS a_wins
        FROM documents
        WHERE doc_id % 6 <> (doc_id // 6) % 6
    ), g AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a_wins) AS BIGINT) AS w
        FROM pref GROUP BY a, b
    ), dir AS (
        SELECT a AS i, b AS j, n, w FROM g
        UNION ALL
        SELECT b AS i, a AS j, n, n - w AS w FROM g
    ), pc AS (
        SELECT i, j, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(w) AS BIGINT) AS w
        FROM dir GROUP BY i, j
    ), wins AS (
        SELECT i, CAST(SUM(w) AS BIGINT) AS wi,
               CAST(SUM(n) AS BIGINT) AS ni
        FROM pc GROUP BY i
    ), s0 AS (
        SELECT i, CAST(1000000 AS BIGINT) AS s FROM wins
    ), d1 AS (
        SELECT pc.i,
               SUM(pc.n * 1000000000000 // (si.s + sj.s)) AS den
        FROM pc JOIN s0 si ON si.i = pc.i JOIN s0 sj ON sj.i = pc.j
        GROUP BY pc.i
    ), r1 AS (
        SELECT d1.i, wins.wi * 1000000000000 // d1.den AS raw
        FROM d1 JOIN wins ON wins.i = d1.i
    ), s1 AS (
        SELECT i, raw * 6000000 // (SELECT SUM(raw) FROM r1) AS s
        FROM r1
    ), d2 AS (
        SELECT pc.i,
               SUM(pc.n * 1000000000000 // (si.s + sj.s)) AS den
        FROM pc JOIN s1 si ON si.i = pc.i JOIN s1 sj ON sj.i = pc.j
        GROUP BY pc.i
    ), r2 AS (
        SELECT d2.i, wins.wi * 1000000000000 // d2.den AS raw
        FROM d2 JOIN wins ON wins.i = d2.i
    ), s2 AS (
        SELECT i, raw * 6000000 // (SELECT SUM(raw) FROM r2) AS s
        FROM r2
    ), d3 AS (
        SELECT pc.i,
               SUM(pc.n * 1000000000000 // (si.s + sj.s)) AS den
        FROM pc JOIN s2 si ON si.i = pc.i JOIN s2 sj ON sj.i = pc.j
        GROUP BY pc.i
    ), r3 AS (
        SELECT d3.i, wins.wi * 1000000000000 // d3.den AS raw
        FROM d3 JOIN wins ON wins.i = d3.i
    ), s3 AS (
        SELECT i, raw * 6000000 // (SELECT SUM(raw) FROM r3) AS s
        FROM r3
    )
    SELECT s3.i AS model, wins.ni AS n_games, wins.wi AS n_wins,
           CAST(s3.s AS BIGINT) AS strength_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY s3.s DESC, s3.i)
                AS BIGINT) AS strength_rank
    FROM s3 JOIN wins ON wins.i = s3.i
    ORDER BY model
    """,
    ops=["bradley-terry", "preference-fitting", "mm-algorithm"],
)
def bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength fitting over pairwise preferences — the
    model behind RLHF reward-model eval boards and chat arenas
    (Hunter 2004's MM algorithm): synthetic (model_a, model_b, winner)
    duels are derived per document (latent strengths 60+5i drive the
    md5 win draw, so the fit has a known truth to recover), folded to
    a directed pair-count relation, then THREE MM updates
    s_i ← W_i / Σ_j n_ij/(s_i+s_j), renormalized to Σs = 6e6 each
    step. Every step is exact BIGINT fixed point (pico-scaled terms,
    truncating div), so the fitted strengths hash-match the oracle's
    nested-CTE twin. Shape for scale: the duel table collapses to a
    ≤30-row pair-count relation in ONE grouped pass; each MM step is
    a broadcast join + 6-row aggregate, independent of corpus size.
    The pico-scaled terms (n·1e12, wi·1e12) and the MM denominator sum
    run in DECIMAL(38,0) (ADVICE r11): BIGINT would silently wrap past
    ~9.2e6 games/wins per pair under Spark's non-ANSI arithmetic while
    the DuckDB oracle errors loudly — decimal keeps both engines exact
    to ~1e26 games; ``div`` on decimal operands still returns the
    truncating BIGINT quotient the fixed-point convention needs."""
    d = _t(spark, sf_dir, "documents")
    a = (F.col("doc_id") % 6).cast("long")
    b = F.expr("(doc_id div 6) % 6").cast("long")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bt:"),
                               F.col("doc_id").cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("long") % 1000
    )
    th = F.expr(
        "(60 + 5 * (doc_id % 6)) * 1000"
        " div (120 + 5 * (doc_id % 6) + 5 * ((doc_id div 6) % 6))"
    )
    pref = d.select(
        a.alias("a"), b.alias("b"),
        F.when(h < th, 1).otherwise(0).alias("a_wins"),
    ).filter(F.col("a") != F.col("b"))
    g = pref.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a_wins").cast("long").alias("w"),
    )
    direct = g.select(
        F.col("a").alias("i"), F.col("b").alias("j"), "n", "w"
    ).unionByName(
        g.select(
            F.col("b").alias("i"), F.col("a").alias("j"), "n",
            (F.col("n") - F.col("w")).alias("w"),
        )
    )
    pc = direct.groupBy("i", "j").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("w").cast("long").alias("w"),
    ).localCheckpoint()
    wins = pc.groupBy("i").agg(
        F.sum("w").cast("long").alias("wi"),
        F.sum("n").cast("long").alias("ni"),
    ).localCheckpoint()
    s = wins.select("i", F.lit(1000000).cast("long").alias("s"))
    for _ in range(3):
        den = (
            pc.join(F.broadcast(s.select(F.col("i"), F.col("s").alias("si"))), "i")
            .join(
                F.broadcast(
                    s.select(F.col("i").alias("j"), F.col("s").alias("sj"))
                ),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum(
                    F.expr(
                        "CAST(n AS DECIMAL(38,0)) * 1000000000000"
                        " div (si + sj)"
                    ).cast("decimal(38,0)")
                ).alias("den")
            )
        )
        raw = den.join(F.broadcast(wins), "i").select(
            "i",
            F.expr(
                "CAST(wi AS DECIMAL(38,0)) * 1000000000000 div den"
            ).alias("raw"),
        )
        tot = raw.agg(F.sum("raw").alias("traw"))
        s = raw.crossJoin(F.broadcast(tot)).select(
            "i", F.expr("raw * 6000000 div traw").cast("long").alias("s")
        )
    w_rank = Window.orderBy(F.col("s").desc(), F.col("i"))
    return (
        s.join(F.broadcast(wins), "i")
        .select(
            F.col("i").alias("model"),
            F.col("ni").alias("n_games"),
            F.col("wi").alias("n_wins"),
            F.col("s").alias("strength_micro"),
            F.row_number().over(w_rank).cast("long")
            .alias("strength_rank"),
        )
        .orderBy("model")
    )


@register(
    "dr_policy_value_report",
    """
    WITH log AS (
        SELECT user_id % 2 AS half, event_type AS action,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS r_cents,
               CASE event_type
                    WHEN 'view' THEN 300 WHEN 'click' THEN 250
                    WHEN 'purchase' THEN 200 WHEN 'signup' THEN 150
                    ELSE 100 END AS p_log_milli,
               ['view', 'click', 'purchase', 'signup', 'error']
               [CAST(('0x' || substr(md5('dr:' ||
                    CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 5
                    AS INTEGER) + 1] AS pi_action
        FROM events
    ), qhat AS (
        SELECT action, CAST(SUM(r_cents) // COUNT(*) AS BIGINT)
                   AS q_cents
        FROM log WHERE half = 0 GROUP BY action
    ), ev AS (
        SELECT l.pi_action, l.action, l.r_cents, l.p_log_milli,
               COALESCE(qa.q_cents, 0) AS q_a,
               COALESCE(qp.q_cents, 0) AS q_pi
        FROM log l
        LEFT JOIN qhat qa ON qa.action = l.action
        LEFT JOIN qhat qp ON qp.action = l.pi_action
        WHERE l.half = 1
    )
    SELECT pi_action,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(MAX(q_pi) AS BIGINT) AS q_pi_cents,
           CAST(SUM(CASE WHEN action = pi_action THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN action = pi_action
                         THEN (1000000 // p_log_milli)
                              * (r_cents - q_a)
                         ELSE 0 END) AS BIGINT)
               AS corr_sum_milli_cents,
           CAST((SUM(q_pi) * 1000
                 + SUM(CASE WHEN action = pi_action
                            THEN (1000000 // p_log_milli)
                                 * (r_cents - q_a)
                            ELSE 0 END))
                // COUNT(*) AS BIGINT) AS dr_value_milli_cents
    FROM ev GROUP BY pi_action ORDER BY pi_action
    """,
    ops=["off-policy-evaluation", "doubly-robust", "counterfactual"],
)
def dr_policy_value_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy value (Dudik, Langford & Li 2011) —
    the estimator that stays consistent if EITHER the reward model OR
    the propensities are right, next to the pure-IPS twin
    (ips_policy_value_report): half the log (user_id%2=0) fits a
    direct reward model Q̂(action) (truncated mean cents per action),
    the other half is evaluated with
    DR = Q̂(π(x)) + 1{a=π(x)}/p(a) · (r − Q̂(a)). The model term cuts
    the variance of the IPS correction; weights stay bounded by
    1/min(p)=10. All exact integers (cents × milli weights, truncating
    div). One grouped pass for Q̂ (5 rows, broadcast twice: logged
    action and target action) + one grouped pass over the eval half —
    no shuffle grows with the log."""
    e = _t(spark, sf_dir, "events")
    actions = F.array(
        F.lit("view"), F.lit("click"), F.lit("purchase"),
        F.lit("signup"), F.lit("error"),
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dr:"),
                               F.col("user_id").cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("long") % 5
    )
    p_log = (
        F.when(F.col("event_type") == "view", 300)
        .when(F.col("event_type") == "click", 250)
        .when(F.col("event_type") == "purchase", 200)
        .when(F.col("event_type") == "signup", 150)
        .otherwise(100)
    ).cast("long")
    log = e.select(
        (F.col("user_id") % 2).alias("half"),
        F.col("event_type").alias("action"),
        F.expr(
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("r_cents"),
        p_log.alias("p_log_milli"),
        F.element_at(actions, (h + 1).cast("int")).alias("pi_action"),
    )
    qhat = (
        log.filter(F.col("half") == 0)
        .groupBy("action")
        .agg(F.expr("CAST(SUM(r_cents) div COUNT(1) AS BIGINT)")
             .alias("q_cents"))
    )
    ev = (
        log.filter(F.col("half") == 1)
        .join(
            F.broadcast(qhat.select(F.col("action"),
                                    F.col("q_cents").alias("q_a"))),
            "action", "left",
        )
        .join(
            F.broadcast(
                qhat.select(F.col("action").alias("pi_action"),
                            F.col("q_cents").alias("q_pi"))
            ),
            "pi_action", "left",
        )
        .select(
            "pi_action", "action", "r_cents", "p_log_milli",
            F.coalesce(F.col("q_a"), F.lit(0)).alias("q_a"),
            F.coalesce(F.col("q_pi"), F.lit(0)).alias("q_pi"),
        )
    )
    m = F.col("action") == F.col("pi_action")
    corr = F.expr("(1000000 div p_log_milli) * (r_cents - q_a)")
    return (
        ev.groupBy("pi_action")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.max("q_pi").cast("long").alias("q_pi_cents"),
            F.sum(F.when(m, 1).otherwise(0)).cast("long")
            .alias("n_matched"),
            F.sum(F.when(m, corr).otherwise(0)).cast("long")
            .alias("corr_sum_milli_cents"),
            F.expr(
                "CAST((SUM(q_pi) * 1000 + SUM(CASE WHEN action = pi_action"
                " THEN (1000000 div p_log_milli) * (r_cents - q_a)"
                " ELSE 0 END)) div COUNT(1) AS BIGINT)"
            ).alias("dr_value_milli_cents"),
        )
        .orderBy("pi_action")
    )


@register(
    "inverse_scaling_fit_report",
    """
    WITH d AS (
        SELECT ('0x' || substr(md5('sc:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT % 256 AS u,
               lower(text) AS t
        FROM documents
    ), tok AS (
        SELECT u, unnest(string_split(t, ' ')) AS term FROM d
    ), kd AS (
        SELECT CASE WHEN u = 0 THEN 0 WHEN u < 2 THEN 1
                    WHEN u < 4 THEN 2 WHEN u < 8 THEN 3
                    WHEN u < 16 THEN 4 WHEN u < 32 THEN 5
                    WHEN u < 64 THEN 6 WHEN u < 128 THEN 7
                    ELSE 8 END AS kmin,
               COUNT(*) AS n_docs
        FROM d GROUP BY 1
    ), kt AS (
        SELECT CASE WHEN u = 0 THEN 0 WHEN u < 2 THEN 1
                    WHEN u < 4 THEN 2 WHEN u < 8 THEN 3
                    WHEN u < 16 THEN 4 WHEN u < 32 THEN 5
                    WHEN u < 64 THEN 6 WHEN u < 128 THEN 7
                    ELSE 8 END AS kmin,
               COUNT(*) AS n_tok
        FROM tok GROUP BY 1
    ), wm AS (
        SELECT term, MIN(u) AS umin FROM tok GROUP BY term
    ), kw AS (
        SELECT CASE WHEN umin = 0 THEN 0 WHEN umin < 2 THEN 1
                    WHEN umin < 4 THEN 2 WHEN umin < 8 THEN 3
                    WHEN umin < 16 THEN 4 WHEN umin < 32 THEN 5
                    WHEN umin < 64 THEN 6 WHEN umin < 128 THEN 7
                    ELSE 8 END AS kmin,
               COUNT(*) AS n_word
        FROM wm GROUP BY 1
    ), pts AS (
        SELECT k.k,
               CAST((SELECT COALESCE(SUM(n_docs), 0) FROM kd
                     WHERE kmin <= k.k) AS BIGINT) AS n_docs,
               CAST((SELECT COALESCE(SUM(n_tok), 0) FROM kt
                     WHERE kmin <= k.k) AS BIGINT) AS n_tokens,
               CAST((SELECT COALESCE(SUM(n_word), 0) FROM kw
                     WHERE kmin <= k.k) AS BIGINT) AS n_distinct
        FROM generate_series(0, 8) k(k)
    ), xy AS (
        SELECT k, n_docs, n_tokens, n_distinct,
               10000000 // n_docs AS x_inv,
               n_distinct * 1000 // n_tokens AS ttr_milli
        FROM pts WHERE n_docs > 0 AND n_tokens > 0
    ), fit AS (
        SELECT SUM((x_inv - (SELECT SUM(x_inv) // COUNT(*) FROM xy))
                   * (ttr_milli
                      - (SELECT SUM(ttr_milli) // COUNT(*) FROM xy)))
                   AS sxy,
               SUM((x_inv - (SELECT SUM(x_inv) // COUNT(*) FROM xy))
                   * (x_inv - (SELECT SUM(x_inv) // COUNT(*) FROM xy)))
                   AS sxx,
               SUM(x_inv) // COUNT(*) AS xbar,
               SUM(ttr_milli) // COUNT(*) AS ybar
        FROM xy
    ), co AS (
        SELECT CASE WHEN sxx > 0 THEN sxy * 1000000 // sxx
                    ELSE 0 END AS b_micro,
               xbar, ybar
        FROM fit
    )
    SELECT xy.k AS k, xy.n_docs, xy.n_tokens, xy.n_distinct,
           xy.x_inv, xy.ttr_milli,
           CAST(co.b_micro AS BIGINT) AS slope_micro,
           CAST(co.ybar - co.b_micro * co.xbar // 1000000 AS BIGINT)
               AS asymptote_ttr_milli,
           CAST(co.ybar + co.b_micro * (xy.x_inv - co.xbar) // 1000000
                AS BIGINT) AS fitted_milli,
           CAST(xy.ttr_milli
                - (co.ybar + co.b_micro * (xy.x_inv - co.xbar)
                   // 1000000) AS BIGINT) AS resid_milli
    FROM xy CROSS JOIN co ORDER BY xy.k
    """,
    ops=["scaling-extrapolation", "inverse-n-fit", "heaps-law"],
)
def inverse_scaling_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-scaling extrapolation — fit metric(n) = a + b·(1/n) by
    exact-integer OLS over a NESTED prefix-sample curve (the
    Richardson-extrapolation view of scaling curves: `a` is the
    n→∞ asymptote, `b` the first-order finite-size term). Metric is
    type-token ratio, which falls with corpus size (Heaps' law), over
    nine nested samples u<2^k. The scale trick: no per-k rescan — each
    token/word/doc is tagged with the FIRST k that includes it
    (kmin = ⌈log2⌉ case-ladder on its md5 bucket), so the whole curve
    is one grouped pass per relation + a ≤10-row cumulative assembly;
    the distinct-word curve reuses one term→min(u) aggregation for all
    nine points instead of nine DISTINCTs. OLS is centered (truncated
    means), sums fit int64 at every SF (x ≤ 1e7, dy ≤ 1e3). Both
    engines truncate identically; the whole report hash-matches."""
    d = _t(spark, sf_dir, "documents").select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("sc:"),
                                   F.col("doc_id").cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % 256
        ).alias("u"),
        F.lower(F.col("text")).alias("t"),
    )
    kmin_of = (
        "CASE WHEN {c} = 0 THEN 0 WHEN {c} < 2 THEN 1"
        " WHEN {c} < 4 THEN 2 WHEN {c} < 8 THEN 3"
        " WHEN {c} < 16 THEN 4 WHEN {c} < 32 THEN 5"
        " WHEN {c} < 64 THEN 6 WHEN {c} < 128 THEN 7"
        " ELSE 8 END"
    )
    tok = d.select("u", F.explode(F.split(F.col("t"), " ")).alias("term"))
    kd = d.groupBy(F.expr(kmin_of.format(c="u")).alias("kmin")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    kt = tok.groupBy(F.expr(kmin_of.format(c="u")).alias("kmin")).agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    wm = tok.groupBy("term").agg(F.min("u").alias("umin"))
    kw = wm.groupBy(F.expr(kmin_of.format(c="umin")).alias("kmin")).agg(
        F.count(F.lit(1)).alias("n_word")
    )
    ks = spark.range(9).select(F.col("id").cast("long").alias("k"))
    pts = (
        ks.join(F.broadcast(kd), F.col("kmin") <= F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long")
             .alias("n_docs"))
        .join(
            ks.join(F.broadcast(kt), F.col("kmin") <= F.col("k"), "left")
            .groupBy("k")
            .agg(F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long")
                 .alias("n_tokens")),
            "k",
        )
        .join(
            ks.join(F.broadcast(kw), F.col("kmin") <= F.col("k"), "left")
            .groupBy("k")
            .agg(F.coalesce(F.sum("n_word"), F.lit(0)).cast("long")
                 .alias("n_distinct")),
            "k",
        )
    )
    xy = pts.filter(
        (F.col("n_docs") > 0) & (F.col("n_tokens") > 0)
    ).select(
        "k", "n_docs", "n_tokens", "n_distinct",
        F.expr("10000000 div n_docs").alias("x_inv"),
        F.expr("n_distinct * 1000 div n_tokens").alias("ttr_milli"),
    ).localCheckpoint()
    means = xy.agg(
        F.expr("SUM(x_inv) div COUNT(1)").alias("xbar"),
        F.expr("SUM(ttr_milli) div COUNT(1)").alias("ybar"),
    )
    fit = (
        xy.crossJoin(F.broadcast(means))
        .agg(
            F.sum(
                (F.col("x_inv") - F.col("xbar"))
                * (F.col("ttr_milli") - F.col("ybar"))
            ).alias("sxy"),
            F.sum(
                (F.col("x_inv") - F.col("xbar"))
                * (F.col("x_inv") - F.col("xbar"))
            ).alias("sxx"),
            F.max("xbar").alias("xbar"),
            F.max("ybar").alias("ybar"),
        )
        .select(
            F.when(F.col("sxx") > 0,
                   F.expr("sxy * 1000000 div sxx"))
            .otherwise(F.lit(0)).alias("b_micro"),
            "xbar", "ybar",
        )
    )
    return (
        xy.crossJoin(F.broadcast(fit))
        .select(
            "k", "n_docs", "n_tokens", "n_distinct", "x_inv",
            "ttr_milli",
            F.col("b_micro").cast("long").alias("slope_micro"),
            F.expr("CAST(ybar - b_micro * xbar div 1000000 AS BIGINT)")
            .alias("asymptote_ttr_milli"),
            F.expr(
                "CAST(ybar + b_micro * (x_inv - xbar) div 1000000"
                " AS BIGINT)"
            ).alias("fitted_milli"),
            F.expr(
                "CAST(ttr_milli - (ybar + b_micro * (x_inv - xbar)"
                " div 1000000) AS BIGINT)"
            ).alias("resid_milli"),
        )
        .orderBy("k")
    )


@register(
    "conformal_coverage_report",
    """
    WITH o AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS y_cents,
               ('0x' || substr(md5('cp:' ||
                    CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 2
                   AS half
        FROM orders
    ), qhat AS (
        SELECT o_orderpriority,
               CAST(SUM(y_cents) // COUNT(*) AS BIGINT) AS yhat_cents
        FROM o WHERE half = 0 GROUP BY o_orderpriority
    ), cal AS (
        SELECT abs(o.y_cents - qhat.yhat_cents) AS score,
               ROW_NUMBER() OVER (
                   ORDER BY abs(o.y_cents - qhat.yhat_cents),
                            o.o_orderkey) AS rn,
               COUNT(*) OVER () AS n_cal
        FROM o JOIN qhat USING (o_orderpriority) WHERE half = 0
    ), q AS (
        SELECT score AS q_cents, n_cal FROM cal
        WHERE rn = LEAST((9 * (n_cal + 1) + 9) // 10, n_cal)
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN abs(o.y_cents - qhat.yhat_cents)
                              <= q.q_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN abs(o.y_cents - qhat.yhat_cents)
                              <= q.q_cents THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS coverage_micro,
           CAST(MAX(q.q_cents) AS BIGINT) AS q_cents,
           CAST(MAX(q.n_cal) AS BIGINT) AS n_cal
    FROM o JOIN qhat USING (o_orderpriority) CROSS JOIN q
    WHERE o.half = 1
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
    ops=["conformal-prediction", "coverage-guarantee", "model-eval"],
)
def conformal_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction coverage (Vovk; Lei et al. 2018) —
    the distribution-free 90% interval check an eval pipeline runs on
    ANY point predictor: an md5 split halves orders into calibration
    and test; a per-priority mean is the (deliberately crude) point
    model; the calibration half's |y−ŷ| scores yield the
    ⌈0.9(n+1)⌉-th order statistic (exact rank via row_number with an
    orderkey tiebreak — not an approximate percentile), and the test
    half reports per-priority coverage of ŷ ± q. Exact integers end to
    end, so the coverage rates hash-match. Scale shape: the exact
    order statistic uses operators.slicing.global_rank (range
    repartition + per-partition local ranks + tiny offset broadcast —
    NO single-partition window), the model is a 5-row broadcast, and
    coverage is one grouped pass over the test half."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("y_cents"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cp:"),
                                   F.col("o_orderkey").cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % 2
        ).alias("half"),
    )
    qhat = (
        o.filter(F.col("half") == 0)
        .groupBy("o_orderpriority")
        .agg(F.expr("CAST(SUM(y_cents) div COUNT(1) AS BIGINT)")
             .alias("yhat_cents"))
    )
    cal = (
        o.filter(F.col("half") == 0)
        .join(F.broadcast(qhat), "o_orderpriority")
        .select(
            F.abs(F.col("y_cents") - F.col("yhat_cents")).alias("score"),
            "o_orderkey",
        )
    )
    nc = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    q = (
        slicing.global_rank(
            cal, [F.col("score"), F.col("o_orderkey")], out="rn"
        )
        .crossJoin(F.broadcast(nc))
        .filter(
            F.col("rn")
            == F.least(
                F.expr("(9 * (n_cal + 1) + 9) div 10"), F.col("n_cal")
            )
        )
        .select(F.col("score").alias("q_cents"), "n_cal")
    )
    covered = F.when(
        F.abs(F.col("y_cents") - F.col("yhat_cents")) <= F.col("q_cents"),
        1,
    ).otherwise(0)
    return (
        o.filter(F.col("half") == 1)
        .join(F.broadcast(qhat), "o_orderpriority")
        .crossJoin(F.broadcast(q))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(covered).cast("long").alias("n_covered"),
            F.expr(
                "CAST(SUM(CASE WHEN abs(y_cents - yhat_cents)"
                " <= q_cents THEN 1 ELSE 0 END) * 1000000"
                " div COUNT(1) AS BIGINT)"
            ).alias("coverage_micro"),
            F.max("q_cents").cast("long").alias("q_cents"),
            F.max("n_cal").cast("long").alias("n_cal"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "t_closeness_report",
    """
    WITH c AS (
        SELECT c_mktsegment,
               LEAST(9, GREATEST(0,
                   (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                         AS BIGINT) + 100000) // 110000)) AS b
        FROM customer
    ), segs AS (
        SELECT DISTINCT c_mktsegment FROM c
    ), grid AS (
        SELECT s.c_mktsegment, g.b
        FROM segs s CROSS JOIN generate_series(0, 9) g(b)
    ), cnt AS (
        SELECT c_mktsegment, b, COUNT(*) AS n FROM c GROUP BY 1, 2
    ), ng AS (
        SELECT c_mktsegment, COUNT(*) AS n_g FROM c GROUP BY 1
    ), gl AS (
        SELECT b, COUNT(*) AS gn FROM c GROUP BY 1
    ), tot AS (
        SELECT COUNT(*) AS n FROM c
    ), diffs AS (
        SELECT grid.c_mktsegment, grid.b, ng.n_g,
               COALESCE(cnt.n, 0) * 1000000 // ng.n_g
               - COALESCE(gl.gn, 0) * 1000000 // tot.n AS d_micro
        FROM grid
        JOIN ng USING (c_mktsegment)
        LEFT JOIN cnt ON cnt.c_mktsegment = grid.c_mktsegment
                     AND cnt.b = grid.b
        LEFT JOIN gl ON gl.b = grid.b
        CROSS JOIN tot
    ), cum AS (
        SELECT c_mktsegment, b, n_g,
               SUM(d_micro) OVER (PARTITION BY c_mktsegment
                                  ORDER BY b) AS cum_micro
        FROM diffs
    )
    SELECT c_mktsegment,
           CAST(MAX(n_g) AS BIGINT) AS n_cust,
           CAST(SUM(ABS(cum_micro)) // 9 AS BIGINT) AS emd_micro,
           CAST(MAX(ABS(cum_micro)) AS BIGINT) AS ks_micro,
           CAST(CASE WHEN SUM(ABS(cum_micro)) // 9 > 200000
                THEN 1 ELSE 0 END AS BIGINT) AS t_violation
    FROM cum GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    ops=["t-closeness", "privacy-audit", "earth-movers-distance"],
)
def t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness privacy audit (Li, Li & Venkatasubramanian 2007) —
    completes the anonymity trio next to k_anonymity_report and
    l_diversity_report: per quasi-identifier group (market segment),
    the ordered earth-mover's distance between the group's
    account-balance distribution and the global one, where 1-D EMD
    over m equal bins is Σ|cumulative difference|/(m−1). Balances land
    in ten fixed cent-ranged buckets (exact DECIMAL cents, no float
    floor), probabilities in truncated micro, and the windowed
    cumulative runs over a dense segment×bucket grid (zero-filled via
    the broadcast-joined cross grid) so absent buckets still carry the
    global mass. A group whose EMD exceeds t=0.2 is flagged. One
    grouped pass over customer + constant-size (≤50-row) grid
    assembly — group count bounds all state, not table size."""
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.expr(
            "LEAST(9, GREATEST(0,"
            " (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " + 100000) div 110000))"
        ).alias("b"),
    )
    segs = c.select("c_mktsegment").distinct()
    buckets = spark.range(10).select(F.col("id").cast("long").alias("b"))
    grid = segs.crossJoin(F.broadcast(buckets))
    cnt = c.groupBy("c_mktsegment", "b").agg(
        F.count(F.lit(1)).alias("cn")
    )
    ng = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_g"))
    glob = c.groupBy("b").agg(F.count(F.lit(1)).alias("gn"))
    tot = c.agg(F.count(F.lit(1)).alias("nt"))
    diffs = (
        grid.join(F.broadcast(ng), "c_mktsegment")
        .join(F.broadcast(cnt), ["c_mktsegment", "b"], "left")
        .join(F.broadcast(glob), "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment", "b", "n_g",
            F.expr(
                "COALESCE(cn, 0) * 1000000 div n_g"
                " - COALESCE(gn, 0) * 1000000 div nt"
            ).alias("d_micro"),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("b")
    cum = diffs.select(
        "c_mktsegment", "b", "n_g",
        F.sum("d_micro").over(w).alias("cum_micro"),
    )
    return (
        cum.groupBy("c_mktsegment")
        .agg(
            F.max("n_g").cast("long").alias("n_cust"),
            F.expr("CAST(SUM(ABS(cum_micro)) div 9 AS BIGINT)")
            .alias("emd_micro"),
            F.max(F.abs(F.col("cum_micro"))).cast("long")
            .alias("ks_micro"),
            F.expr(
                "CAST(CASE WHEN SUM(ABS(cum_micro)) div 9 > 200000"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("t_violation"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "label_noise_confident_report",
    """
    WITH langs AS (
        SELECT lang, CAST(ROW_NUMBER() OVER (ORDER BY lang) AS BIGINT)
                   AS idx,
               CAST(COUNT(*) OVER () AS BIGINT) AS k
        FROM (SELECT DISTINCT lang FROM documents)
    ), d AS (
        SELECT doc_id, lang AS given,
               ('0x' || substr(md5('nz:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT % 5 AS h1,
               ('0x' || substr(md5('nz:' || CAST(doc_id AS VARCHAR)),
                               9, 8))::BIGINT AS h2,
               ('0x' || substr(md5('nz:' || CAST(doc_id AS VARCHAR)),
                               17, 8))::BIGINT AS h3
        FROM documents
    ), pred AS (
        SELECT d.doc_id, d.given, lp.lang AS predicted,
               CASE WHEN d.h1 = 0 THEN 300 + d.h3 % 500
                    ELSE 600 + d.h3 % 400 END AS conf_milli
        FROM d
        JOIN langs lg ON lg.lang = d.given
        JOIN langs lp ON lp.idx =
            ((lg.idx - 1 + CASE WHEN d.h1 = 0 AND lg.k > 1
                                THEN 1 + d.h2 % (lg.k - 1)
                                ELSE 0 END) % lg.k) + 1
    ), thr AS (
        SELECT predicted,
               CAST(SUM(conf_milli) // COUNT(*) AS BIGINT) AS t_milli
        FROM pred WHERE given = predicted GROUP BY predicted
    )
    SELECT p.given, p.predicted,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN p.conf_milli >= thr.t_milli
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_confident,
           thr.t_milli AS t_pred_milli,
           CAST(CASE WHEN p.given <> p.predicted
                THEN SUM(CASE WHEN p.conf_milli >= thr.t_milli
                              THEN 1 ELSE 0 END) ELSE 0 END
                AS BIGINT) AS est_label_errors
    FROM pred p JOIN thr ON thr.predicted = p.predicted
    GROUP BY p.given, p.predicted, thr.t_milli
    ORDER BY p.given, p.predicted
    """,
    ops=["confident-learning", "label-noise", "data-quality"],
)
def label_noise_confident_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning label-noise estimation (Northcutt, Jiang &
    Chuang 2021 — the cleanlab recipe): given per-example (given
    label, predicted label, confidence), estimate the confident joint
    C[given][pred] = #{conf ≥ t_pred}, where the class threshold
    t_j is the average SELF-confidence of class j — off-diagonal
    confident mass is the count of likely mislabeled examples the
    curation pass should route to review. Predictions are synthesized
    with a planted 20% noise rate (md5-rotated to another class with
    deliberately lower confidence, so the report provably separates
    clean from noisy cells). The class universe is data-derived
    (distinct langs, rank-ordered) — no hardcoded label list. Exact
    integers: milli confidences, truncated-mean thresholds. Two
    grouped passes + two broadcast joins of the ≤K-row class
    relations; nothing scales beyond K² cells."""
    d0 = _t(spark, sf_dir, "documents")
    langs = (
        d0.select("lang").distinct()
        .select(
            "lang",
            F.row_number().over(Window.orderBy("lang")).cast("long")
            .alias("idx"),
        )
    )
    k = langs.agg(F.count(F.lit(1)).cast("long").alias("k"))
    # langs is the BOUNDED class relation but is consumed three times
    # (k-count + two broadcast joins in pred) — unstaged, each
    # reference re-ran the corpus distinct + rank window (r12 rescan
    # audit: 10 documents scans in the plan). Pin the <=K rows once.
    langs = langs.crossJoin(F.broadcast(k)).localCheckpoint()
    md = F.md5(F.concat(F.lit("nz:"), F.col("doc_id").cast("string")))
    d = d0.select(
        "doc_id",
        F.col("lang").alias("given"),
        (F.conv(F.substring(md, 1, 8), 16, 10).cast("long") % 5)
        .alias("h1"),
        F.conv(F.substring(md, 9, 8), 16, 10).cast("long").alias("h2"),
        F.conv(F.substring(md, 17, 8), 16, 10).cast("long").alias("h3"),
    )
    pred = (
        d.join(
            F.broadcast(langs.select(F.col("lang").alias("given"),
                                     F.col("idx").alias("gidx"), "k")),
            "given",
        )
        .select(
            "doc_id", "given",
            # k > 1 guard (ADVICE r11): on a single-class corpus the
            # noise rotation is identity; without the guard Spark's
            # h2 % 0 returns NULL (rows silently dropped by the join)
            # while DuckDB raises — engines must agree on degenerate
            # input.
            F.expr(
                "((gidx - 1 + CASE WHEN h1 = 0 AND k > 1"
                " THEN 1 + h2 % (k - 1) ELSE 0 END) % k) + 1"
            ).alias("pidx"),
            F.expr(
                "CASE WHEN h1 = 0 THEN 300 + h3 % 500"
                " ELSE 600 + h3 % 400 END"
            ).alias("conf_milli"),
        )
        .join(
            F.broadcast(langs.select(F.col("idx").alias("pidx"),
                                     F.col("lang").alias("predicted"))),
            "pidx",
        )
    )
    thr = (
        pred.filter(F.col("given") == F.col("predicted"))
        .groupBy("predicted")
        .agg(F.expr("CAST(SUM(conf_milli) div COUNT(1) AS BIGINT)")
             .alias("t_milli"))
    )
    conf = F.when(F.col("conf_milli") >= F.col("t_milli"), 1).otherwise(0)
    return (
        pred.join(F.broadcast(thr), "predicted")
        .groupBy("given", "predicted", "t_milli")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(conf).cast("long").alias("n_confident"),
        )
        .select(
            "given", "predicted", "n", "n_confident",
            F.col("t_milli").alias("t_pred_milli"),
            F.when(
                F.col("given") != F.col("predicted"),
                F.col("n_confident"),
            ).otherwise(F.lit(0)).cast("long").alias("est_label_errors"),
        )
        .orderBy("given", "predicted")
    )


@register(
    "nation_trade_bfs_hops",
    """
    WITH w AS MATERIALIZED (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               COUNT(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY 1, 2
    ), e AS MATERIALIZED (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM w
        ) WHERE rn <= 2
    ), d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS node),
    d1 AS MATERIALIZED (SELECT node FROM d0
           UNION SELECT e.dst FROM e JOIN d0 ON e.src = d0.node),
    d2 AS MATERIALIZED (SELECT node FROM d1
           UNION SELECT e.dst FROM e JOIN d1 ON e.src = d1.node),
    d3 AS MATERIALIZED (SELECT node FROM d2
           UNION SELECT e.dst FROM e JOIN d2 ON e.src = d2.node),
    d4 AS MATERIALIZED (SELECT node FROM d3
           UNION SELECT e.dst FROM e JOIN d3 ON e.src = d3.node)
    SELECT n.n_name,
           CAST(CASE
                WHEN n.n_nationkey IN (SELECT node FROM d0) THEN 0
                WHEN n.n_nationkey IN (SELECT node FROM d1) THEN 1
                WHEN n.n_nationkey IN (SELECT node FROM d2) THEN 2
                WHEN n.n_nationkey IN (SELECT node FROM d3) THEN 3
                WHEN n.n_nationkey IN (SELECT node FROM d4) THEN 4
                ELSE -1 END AS BIGINT) AS hop
    FROM nation n ORDER BY hop, n.n_name
    """,
    ops=["graph-bfs", "iterative-frontier", "sparsification"],
)
def nation_trade_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop BFS distance over a SPARSIFIED trade graph — the
    iterative-frontier shape PageRank/k-core don't cover: the dense
    nation-trade graph is first thinned to each nation's top-2
    strongest outbound lanes (windowed rank with a dst tiebreak — the
    same per-key-top-k that WindowGroupLimit pushes down), then four
    frontier-expansion rounds from nation 0 compute min-hop distances;
    unreached nations report -1. Each round is one hash join frontier
    ⋈ edges + a distinct — frontier size is bounded by the node count,
    never the edge count, which is what makes the loop safe on a
    billion-edge graph (the expensive part, edge derivation, runs
    ONCE and collapses to ≤2·|V| rows before any iteration)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    w = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    rn = Window.partitionBy("src").orderBy(F.col("w").desc(), "dst")
    e = (
        w.select("src", "dst", F.row_number().over(rn).alias("rn"))
        .filter(F.col("rn") <= 2)
        .select("src", "dst")
        .localCheckpoint()
    )
    seen = spark.createDataFrame([(0, 0)], "node long, hop long")
    frontier = seen.select("node")
    for hop in range(1, 5):
        nxt = (
            e.join(F.broadcast(frontier), e.src == F.col("node"))
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(seen.select("node")), "node", "left_anti")
            .localCheckpoint()
        )
        seen = seen.unionByName(
            nxt.select("node", F.lit(hop).cast("long").alias("hop"))
        ).localCheckpoint()
        frontier = nxt
    return (
        nation.join(
            F.broadcast(seen),
            nation.n_nationkey == F.col("node"), "left",
        )
        .select(
            "n_name",
            F.coalesce(F.col("hop"), F.lit(-1)).cast("long")
            .alias("hop"),
        )
        .orderBy("hop", "n_name")
    )


@register(
    "weighted_priority_sample",
    """
    WITH d AS (
        SELECT doc_id, lang, n_chars,
               ('0x' || substr(md5('wp:' || CAST(doc_id AS VARCHAR)),
                               1, 12))::BIGINT * 1000
               // GREATEST(n_chars, 1) AS priority
        FROM documents
    )
    SELECT lang, doc_id, n_chars AS weight,
           CAST(priority AS BIGINT) AS priority,
           CAST(rn AS BIGINT) AS sample_rank
    FROM (
        SELECT lang, doc_id, n_chars, priority,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY priority, doc_id) AS rn
        FROM d
    ) WHERE rn <= 20
    ORDER BY lang, sample_rank
    """,
    ops=["weighted-sampling", "priority-sample", "per-stratum-topk"],
)
def weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement, 20 docs per
    language — the integer-arithmetic cousin of Efraimidis-Spirakis
    A-ES keys (u^(1/w) order ≈ hash/w order for the top of the list):
    each doc draws a 48-bit md5 priority divided by its weight
    (n_chars), and the 20 SMALLEST priorities per stratum win, so
    longer documents are proportionally likelier while the pick is
    reproducible on any engine and any partitioning (doc_id
    tiebreak). Pure integers — no log/pow, so no libm divergence
    between engines. Physical shape: one map-side derivation + a
    per-stratum top-k that compiles to WindowGroupLimit (partial
    top-20 per partition before the shuffle), never a global sort."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("wp:"),
                                   F.col("doc_id").cast("string"))),
                    1, 12,
                ),
                16, 10,
            ).cast("long") * 1000
        ).alias("hp"),
    ).select(
        "doc_id", "lang", "n_chars",
        F.expr("hp div GREATEST(n_chars, 1)").alias("priority"),
    )
    rn = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        d.select(
            "lang", "doc_id",
            F.col("n_chars").alias("weight"),
            F.col("priority").cast("long").alias("priority"),
            F.row_number().over(rn).cast("long").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= 20)
        .orderBy("lang", "sample_rank")
    )


@register(
    "isotonic_calibration_bins",
    """
    WITH sc AS (
        SELECT ('0x' || substr(md5('cf:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT % 1001 AS conf_milli,
               CASE WHEN (doc_id * 13 + 5) % 97 <
                         (('0x' || substr(md5('cf:' ||
                              CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                          % 1001) * 97 // 1000
                    THEN 1 ELSE 0 END AS label
        FROM documents
    ), b AS (
        SELECT CASE WHEN conf_milli = 1000 THEN 9
                    ELSE CAST(conf_milli // 100 AS BIGINT) END AS bin,
               COUNT(*) AS n, SUM(label) AS pos
        FROM sc GROUP BY 1
    ), cum AS (
        SELECT bin,
               SUM(n) OVER (ORDER BY bin) AS cn,
               SUM(pos) OVER (ORDER BY bin) AS cp
        FROM b
        UNION ALL SELECT -1, 0, 0
    ), rate AS (
        SELECT j.bin + 1 AS j, k.bin AS k,
               (k.cp - j.cp) * 1000000 // (k.cn - j.cn) AS r_micro
        FROM cum j JOIN cum k ON j.bin < k.bin
        WHERE k.cn > j.cn
    ), mins AS (
        SELECT i.bin AS bin, rate.j,
               MIN(rate.r_micro) AS min_r
        FROM b i JOIN rate ON rate.j <= i.bin AND rate.k >= i.bin
        GROUP BY i.bin, rate.j
    ), iso AS (
        SELECT bin, MAX(min_r) AS iso_micro FROM mins GROUP BY bin
    )
    SELECT b.bin,
           CAST(b.n AS BIGINT) AS n,
           CAST(b.pos AS BIGINT) AS n_pos,
           CAST(b.pos * 1000000 // b.n AS BIGINT) AS rate_micro,
           CAST(iso.iso_micro AS BIGINT) AS iso_micro,
           CAST(iso.iso_micro - b.pos * 1000000 // b.n AS BIGINT)
               AS pool_shift_micro
    FROM b JOIN iso USING (bin) ORDER BY b.bin
    """,
    ops=["isotonic-regression", "pava-minimax", "calibration"],
)
def isotonic_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration over the reliability bins — the
    monotone-fit companion to ece_calibration_report (same synthetic
    confidence/label generator, so the two reports describe one
    calibration story): the weighted isotonic regression of per-bin
    positive rates is computed by the exact MINIMAX identity
    iso_i = max_{j≤i} min_{k≥i} rate(j..k) (Ayer et al. 1955 — the
    closed form PAVA converges to), with pooled rates from prefix
    sums, so no sequential pool-adjacent loop exists anywhere in the
    plan. Everything after the one grouped pass over documents is
    arithmetic on a 10-row bin relation (≤10³ bounded combinations —
    the minimax cube never touches corpus-sized data). Exact micro
    rates, truncating div; pool_shift_micro shows how far pooling
    moved each bin (0 where the empirical curve was already
    monotone)."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    conf = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cf:"), i.cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("long") % 1001
    )
    sc = d.select(
        conf.alias("conf_milli"),
        F.when(
            (i * 13 + 5) % 97
            < F.expr(
                "(conv(substring(md5(concat('cf:', CAST(doc_id AS"
                " STRING))), 1, 8), 16, 10) % 1001) * 97 div 1000"
            ),
            1,
        ).otherwise(0).alias("label"),
    )
    b = (
        sc.select(
            F.when(F.col("conf_milli") == 1000, 9)
            .otherwise(F.expr("conf_milli div 100"))
            .cast("long").alias("bin"),
            "label",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").alias("pos"),
        )
        .localCheckpoint()
    )
    w = Window.orderBy("bin")
    cum = b.select(
        "bin",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    ).unionByName(
        spark.createDataFrame([(-1, 0, 0)], "bin long, cn long, cp long")
    )
    cj = cum.select(F.col("bin").alias("jb"), F.col("cn").alias("jcn"),
                    F.col("cp").alias("jcp"))
    ck = cum.select(F.col("bin").alias("kb"), F.col("cn").alias("kcn"),
                    F.col("cp").alias("kcp"))
    rate = (
        cj.join(F.broadcast(ck), F.col("jb") < F.col("kb"))
        .filter(F.col("kcn") > F.col("jcn"))
        .select(
            (F.col("jb") + 1).alias("j"),
            F.col("kb").alias("k"),
            F.expr("(kcp - jcp) * 1000000 div (kcn - jcn)")
            .alias("r_micro"),
        )
    )
    mins = (
        b.select(F.col("bin"))
        .join(
            F.broadcast(rate),
            (F.col("j") <= F.col("bin")) & (F.col("k") >= F.col("bin")),
        )
        .groupBy("bin", "j")
        .agg(F.min("r_micro").alias("min_r"))
    )
    iso = mins.groupBy("bin").agg(F.max("min_r").alias("iso_micro"))
    return (
        b.join(F.broadcast(iso), "bin")
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("n_pos"),
            F.expr("CAST(pos * 1000000 div n AS BIGINT)")
            .alias("rate_micro"),
            F.col("iso_micro").cast("long").alias("iso_micro"),
            F.expr("CAST(iso_micro - pos * 1000000 div n AS BIGINT)")
            .alias("pool_shift_micro"),
        )
        .orderBy("bin")
    )


@register(
    "jackknife_ratio_ci",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT) ELSE 0 END) AS a_cents,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS b_views
        FROM events GROUP BY 1
    ), tot AS (
        SELECT SUM(a_cents) AS ta, SUM(b_views) AS tb,
               COUNT(*) AS n_days
        FROM daily
    ), loo AS (
        SELECT d.day, d.a_cents, d.b_views, tot.n_days,
               tot.ta * 1000 // tot.tb AS theta_milli,
               (tot.ta - d.a_cents) * 1000 // (tot.tb - d.b_views)
                   AS theta_loo_milli
        FROM daily d CROSS JOIN tot
        WHERE tot.tb - d.b_views > 0
    ), jk AS (
        SELECT SUM(theta_loo_milli) // COUNT(*) AS mean_loo_milli,
               (COUNT(*) - 1)
               * SUM((theta_loo_milli
                      - (SELECT SUM(theta_loo_milli) // COUNT(*)
                         FROM loo))
                     * (theta_loo_milli
                        - (SELECT SUM(theta_loo_milli) // COUNT(*)
                           FROM loo)))
               // COUNT(*) AS var_milli2
        FROM loo
    )
    SELECT loo.day,
           CAST(loo.a_cents AS BIGINT) AS a_cents,
           CAST(loo.b_views AS BIGINT) AS b_views,
           CAST(loo.theta_milli AS BIGINT) AS theta_milli,
           CAST(loo.theta_loo_milli AS BIGINT) AS theta_loo_milli,
           CAST(loo.theta_loo_milli - jk.mean_loo_milli AS BIGINT)
               AS dev_milli,
           CAST(jk.var_milli2 AS BIGINT) AS jk_var_milli2
    FROM loo CROSS JOIN jk ORDER BY loo.day
    """,
    ops=["jackknife", "ratio-metric-variance", "ab-eval"],
)
def jackknife_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-day jackknife for a ratio-of-sums metric (Quenouille/
    Tukey; the standard variance estimator for online ratio metrics,
    cf. Deng et al. 2017 — per-user/per-bucket ratios are biased, the
    jackknife over independent buckets is not): the metric is
    purchase-revenue-per-view, θ = ΣA/ΣB in milli-cents; each day is
    deleted once and θ₍ᵢ₎ recomputed from the COMPLEMENT sums (no
    rescan — one grouped pass builds the ≤31-row daily relation, one
    1-row total broadcast derives every leave-one-out ratio), then
    jk_var = (n−1)/n · Σ(θ₍ᵢ₎−θ̄)². All exact integers (milli ratios,
    truncating div; squares ≤ 31·(1e6)² — far inside int64). Per-day
    rows carry the pseudo-value deviations so the heavy-influence day
    is visible, the usual reason an eval team runs this report."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr(
                        "CAST(CAST(value AS DECIMAL(18,2)) * 100"
                        " AS BIGINT)"
                    ),
                ).otherwise(0)
            ).alias("a_cents"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("b_views"),
        )
        .localCheckpoint()
    )
    tot = daily.agg(
        F.sum("a_cents").alias("ta"),
        F.sum("b_views").alias("tb"),
        F.count(F.lit(1)).alias("n_days"),
    )
    loo = (
        daily.crossJoin(F.broadcast(tot))
        .filter(F.expr("tb - b_views > 0"))
        .select(
            "day", "a_cents", "b_views", "n_days",
            F.expr("ta * 1000 div tb").alias("theta_milli"),
            F.expr("(ta - a_cents) * 1000 div (tb - b_views)")
            .alias("theta_loo_milli"),
        )
        .localCheckpoint()
    )
    mean_loo = loo.agg(
        F.expr("SUM(theta_loo_milli) div COUNT(1)").alias("mean_loo_milli")
    )
    jk = (
        loo.crossJoin(F.broadcast(mean_loo))
        .agg(
            F.max("mean_loo_milli").alias("mean_loo_milli"),
            F.expr(
                "(COUNT(1) - 1) * SUM((theta_loo_milli - mean_loo_milli)"
                " * (theta_loo_milli - mean_loo_milli)) div COUNT(1)"
            ).alias("var_milli2"),
        )
    )
    return (
        loo.crossJoin(F.broadcast(jk))
        .select(
            "day", "a_cents", "b_views",
            F.col("theta_milli").cast("long").alias("theta_milli"),
            F.col("theta_loo_milli").cast("long")
            .alias("theta_loo_milli"),
            (F.col("theta_loo_milli") - F.col("mean_loo_milli"))
            .cast("long").alias("dev_milli"),
            F.col("var_milli2").cast("long").alias("jk_var_milli2"),
        )
        .orderBy("day")
    )


@register(
    "nelson_aalen_hazard",
    """
    WITH pu AS (
        SELECT user_id,
               CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                              MAX(CAST(ts AS DATE))) AS BIGINT) AS t,
               MAX(CAST(ts AS DATE)) AS last_day
        FROM events GROUP BY user_id
    ), horizon AS (
        SELECT MAX(last_day) AS max_day FROM pu
    ), lab AS (
        SELECT t,
               CASE WHEN last_day >= max_day - 2 THEN 0 ELSE 1 END AS ev
        FROM pu CROSS JOIN horizon
    ), per_t AS (
        SELECT t,
               CAST(SUM(ev) AS BIGINT) AS n_events,
               CAST(SUM(1 - ev) AS BIGINT) AS n_censored
        FROM lab GROUP BY t
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM lab
    ), risk AS (
        SELECT t, n_events, n_censored,
               n_users
                 - CAST(COALESCE(SUM(n_events + n_censored) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        FROM per_t CROSS JOIN tot
    ), terms AS (
        SELECT t, n_risk, n_events, n_censored,
               CASE WHEN n_risk > 0
                    THEN n_events * 1000000000 // n_risk
                    ELSE 0 END AS haz_fp9,
               CASE WHEN n_risk > 0
                    THEN n_events * 1000000000000 // (n_risk * n_risk)
                    ELSE 0 END AS var_fp12
        FROM risk
    )
    SELECT t, n_risk, n_events, n_censored,
           CAST(haz_fp9 AS BIGINT) AS hazard_term_fp9,
           CAST(SUM(haz_fp9) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_hazard_fp9,
           CAST(SUM(var_fp12) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_var_fp12
    FROM terms
    """,
    ops=["stats-survival-nelson-aalen", "window-rolling"],
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over user lifetimes — the
    survival family's second estimator, sharing kaplan_meier's exact
    lifetime/censoring derivation (first→last event days, 3-day
    censor window) but NEEDING NO LOGARITHM: H(t) = Σ d_s/n_s and its
    Poisson variance Σ d_s/n_s² are plain rationals, so unlike the
    KM log-survival column these are fully libm-free exact integers
    (fp9/fp12 per-term truncation before the cumulative sum — the
    same floor-then-sum discipline). Corpus-sized work is the one
    per-user reduction; the hazard axis is ≤31 rows."""
    e = _t(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .cast("long").alias("t"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    horizon = pu.agg(F.max("last_day").alias("max_day"))
    lab = pu.crossJoin(F.broadcast(horizon)).select(
        "t",
        F.when(
            F.col("last_day") >= F.date_sub(F.col("max_day"), 2), 0
        ).otherwise(1).alias("ev"),
    )
    per_t = lab.groupBy("t").agg(
        F.sum("ev").cast("long").alias("n_events"),
        F.sum(F.lit(1) - F.col("ev")).cast("long").alias("n_censored"),
    )
    tot = lab.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.crossJoin(F.broadcast(tot)).select(
        "t", "n_events", "n_censored",
        (
            F.col("n_users")
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored"))
                .over(w_prev),
                F.lit(0),
            )
        ).cast("long").alias("n_risk"),
    )
    terms = risk.select(
        "t", "n_risk", "n_events", "n_censored",
        F.when(
            F.col("n_risk") > 0,
            F.expr("n_events * 1000000000 div n_risk"),
        ).otherwise(F.lit(0)).alias("haz_fp9"),
        F.when(
            F.col("n_risk") > 0,
            F.expr("n_events * 1000000000000 div (n_risk * n_risk)"),
        ).otherwise(F.lit(0)).alias("var_fp12"),
    )
    return terms.select(
        "t", "n_risk", "n_events", "n_censored",
        F.col("haz_fp9").cast("long").alias("hazard_term_fp9"),
        F.sum("haz_fp9").over(w_run).cast("long")
        .alias("cum_hazard_fp9"),
        F.sum("var_fp12").over(w_run).cast("long")
        .alias("cum_var_fp12"),
    )


@register(
    "deletion_propagation_audit",
    """
    WITH tomb AS (
        SELECT c_custkey FROM customer
        WHERE ('0x' || substr(md5('rtbf:' ||
                   CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 20 = 0
    ), o_leak AS (
        SELECT o.o_orderkey, o.o_custkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS cents
        FROM orders o JOIN tomb ON o.o_custkey = tomb.c_custkey
    ), l_leak AS (
        SELECT l.l_orderkey
        FROM lineitem l JOIN o_leak ON l.l_orderkey = o_leak.o_orderkey
    )
    SELECT * FROM (
        SELECT 'customer_tombstones' AS relation,
               CAST((SELECT COUNT(*) FROM tomb) AS BIGINT) AS n_rows,
               CAST(0 AS BIGINT) AS leaked_cents
        UNION ALL
        SELECT 'orders_leaked',
               CAST((SELECT COUNT(*) FROM o_leak) AS BIGINT),
               CAST((SELECT COALESCE(SUM(cents), 0) FROM o_leak)
                    AS BIGINT)
        UNION ALL
        SELECT 'lineitem_leaked',
               CAST((SELECT COUNT(*) FROM l_leak) AS BIGINT),
               CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'orders_clean',
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
               - CAST((SELECT COUNT(*) FROM o_leak) AS BIGINT),
               CAST(0 AS BIGINT)
    ) ORDER BY relation
    """,
    ops=["deletion-propagation", "governance-audit", "semi-join"],
)
def deletion_propagation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation audit — the governance check
    a warehouse runs after a deletion batch: given a tombstone set
    (5% of customers by md5), count every surviving downstream
    reference — orders still pointing at tombstoned customers (with
    the leaked revenue mass) and lineitems under those orders — plus
    the clean-row complement. On a compliant store all *_leaked rows
    are 0; here the tombstones are deliberately un-propagated so the
    audit provably detects leaks. Physical shape: tombstones stay a
    broadcast-sized relation (5% of a dimension), both leak passes
    are broadcast semi/inner joins on the FK — no shuffle of the fact
    tables; the four summary rows are 1-row aggregates unioned."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    tomb = c.filter(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("rtbf:"),
                               F.col("c_custkey").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 20 == 0
    ).select("c_custkey")
    o_leak = o.join(
        F.broadcast(tomb), o.o_custkey == tomb.c_custkey
    ).select(
        "o_orderkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    ).localCheckpoint()
    l_leak = l.join(
        F.broadcast(o_leak.select("o_orderkey")),
        l.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    z = F.lit(0).cast("long")
    rows = (
        tomb.agg(F.count(F.lit(1)).cast("long").alias("n_rows")).select(
            F.lit("customer_tombstones").alias("relation"), "n_rows",
            z.alias("leaked_cents"),
        )
        .unionByName(
            o_leak.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.coalesce(F.sum("cents"), F.lit(0)).cast("long")
                .alias("leaked_cents"),
            ).select(F.lit("orders_leaked").alias("relation"),
                     "n_rows", "leaked_cents")
        )
        .unionByName(
            l_leak.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .select(F.lit("lineitem_leaked").alias("relation"),
                    "n_rows", z.alias("leaked_cents"))
        )
        .unionByName(
            o.agg(F.count(F.lit(1)).cast("long").alias("no"))
            .crossJoin(
                F.broadcast(
                    o_leak.agg(F.count(F.lit(1)).cast("long").alias("nl"))
                )
            )
            .select(
                F.lit("orders_clean").alias("relation"),
                (F.col("no") - F.col("nl")).cast("long").alias("n_rows"),
                z.alias("leaked_cents"),
            )
        )
    )
    return rows.orderBy("relation")


@register(
    "eb_shrunk_source_quality",
    """
    WITH d AS (
        SELECT source,
               CASE WHEN n_chars BETWEEN 150 AND 400 THEN 1 ELSE 0 END
                   AS pass
        FROM documents
    ), per AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pass) AS BIGINT) AS x,
               SUM(pass) * 1000000 // COUNT(*) AS p_micro
        FROM d GROUP BY source
    ), g AS (
        SELECT SUM(x) * 1000000 // SUM(n) AS pbar_micro,
               COUNT(*) AS k
        FROM per
    ), vb AS (
        SELECT SUM((per.p_micro - g.pbar_micro)
                   * (per.p_micro - g.pbar_micro)) // g.k AS var_micro2
        FROM per CROSS JOIN g GROUP BY g.k
    ), m AS (
        SELECT LEAST(1000, GREATEST(1,
                   g.pbar_micro * (1000000 - g.pbar_micro)
                   // (1000000 * GREATEST(vb.var_micro2 // 1000000, 1))))
                   AS m_prior,
               g.pbar_micro
        FROM g CROSS JOIN vb
    )
    SELECT per.source, per.n, per.x,
           CAST(per.p_micro AS BIGINT) AS p_micro,
           CAST(m.m_prior AS BIGINT) AS m_prior,
           CAST(m.pbar_micro AS BIGINT) AS pbar_micro,
           CAST((per.x * 1000000 + m.m_prior * m.pbar_micro)
                // (per.n + m.m_prior) AS BIGINT) AS p_shrunk_micro,
           CAST((per.x * 1000000 + m.m_prior * m.pbar_micro)
                // (per.n + m.m_prior) - per.p_micro AS BIGINT)
               AS shrink_micro
    FROM per CROSS JOIN m ORDER BY per.source
    """,
    ops=["empirical-bayes", "shrinkage", "source-quality"],
)
def eb_shrunk_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-source quality rates — the
    fix for small-source league tables (a 10-doc source with 9 passes
    should NOT outrank a 10k-doc source at 85%): each source's pass
    rate is pulled toward the corpus rate with a beta-binomial-style
    pseudo-count m, derived method-of-moments-flavored from the
    between-source variance (m ≈ p̄(1−p̄)/var, clamped to [1,1000];
    the documented simplification drops the within-source correction
    term — fine for a league-table prior, noted here for honesty).
    Shrunk rate = (x + m·p̄)/(n + m), all exact micro integers. One
    grouped pass + three 1-row broadcasts; source count bounds
    everything downstream."""
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("n_chars").between(150, 400), 1).otherwise(0)
        .alias("pass"),
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pass").cast("long").alias("x"),
        F.expr("SUM(pass) * 1000000 div COUNT(1)").alias("p_micro"),
    ).localCheckpoint()
    g = per.agg(
        F.expr("SUM(x) * 1000000 div SUM(n)").alias("pbar_micro"),
        F.count(F.lit(1)).alias("k"),
    )
    vb = (
        per.crossJoin(F.broadcast(g))
        .groupBy("k")
        .agg(
            F.expr(
                "SUM((p_micro - pbar_micro) * (p_micro - pbar_micro))"
                " div k"
            ).alias("var_micro2"),
        )
        .select("var_micro2")
    )
    m = (
        g.crossJoin(F.broadcast(vb))
        .select(
            F.expr(
                "LEAST(1000, GREATEST(1,"
                " pbar_micro * (1000000 - pbar_micro)"
                " div (1000000 * GREATEST(var_micro2 div 1000000, 1))))"
            ).alias("m_prior"),
            "pbar_micro",
        )
    )
    return (
        per.crossJoin(F.broadcast(m))
        .select(
            "source", "n", "x",
            F.col("p_micro").cast("long").alias("p_micro"),
            F.col("m_prior").cast("long").alias("m_prior"),
            F.col("pbar_micro").cast("long").alias("pbar_micro"),
            F.expr(
                "CAST((x * 1000000 + m_prior * pbar_micro)"
                " div (n + m_prior) AS BIGINT)"
            ).alias("p_shrunk_micro"),
            F.expr(
                "CAST((x * 1000000 + m_prior * pbar_micro)"
                " div (n + m_prior) - p_micro AS BIGINT)"
            ).alias("shrink_micro"),
        )
        .orderBy("source")
    )


@register(
    "changepoint_revenue_report",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2))))
                    AS BIGINT) // 1000 AS y
        FROM orders GROUP BY 1
    ), idx AS (
        SELECT day, y,
               ROW_NUMBER() OVER (ORDER BY day) AS i,
               COUNT(*) OVER () AS n
        FROM daily
    ), cum AS (
        SELECT day, y, i, n,
               SUM(y) OVER (ORDER BY i) AS s,
               SUM(y * y) OVER (ORDER BY i) AS q
        FROM idx
    ), tot AS (
        SELECT MAX(s) AS st, MAX(q) AS qt, MAX(n) AS n FROM cum
    ), cand AS (
        SELECT c.day, c.i, c.n,
               (c.q - c.s * c.s // c.i)
               + ((tot.qt - c.q)
                  - (tot.st - c.s) * (tot.st - c.s) // (tot.n - c.i))
                   AS sse_split,
               tot.qt - tot.st * tot.st // tot.n AS sse_null,
               c.s * 1000 // c.i AS mean_left_milli,
               (tot.st - c.s) * 1000 // (tot.n - c.i)
                   AS mean_right_milli
        FROM cum c CROSS JOIN tot
        WHERE c.i < c.n
    )
    SELECT day AS break_after_day,
           CAST(sse_split AS BIGINT) AS sse_split,
           CAST(sse_null AS BIGINT) AS sse_null,
           CAST(sse_null - sse_split AS BIGINT) AS sse_gain,
           CAST(mean_left_milli AS BIGINT) AS mean_left_milli,
           CAST(mean_right_milli AS BIGINT) AS mean_right_milli,
           CAST(ROW_NUMBER() OVER (ORDER BY sse_split, day) AS BIGINT)
               AS split_rank
    FROM cand ORDER BY break_after_day
    """,
    ops=["changepoint-detection", "segmentation", "sse-scan"],
)
def changepoint_revenue_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint scan over daily revenue (binary
    segmentation's first step; the CUSUM report's model-based
    sibling): every candidate split of the day axis is scored by the
    two-segment piecewise-constant SSE via the prefix-sum identity
    SSE(a..b) = Q − S²/n — so the whole scan is ONE cumulative window
    over the ≤31-row daily aggregate plus a 1-row total broadcast, not
    n² rescans. Revenue is exact whole-dollar integers (decimal sum
    floored once) keeping Σy² far inside int64 at every test SF (the
    docstring notes the decimal(38) path for 100 TB daily sums);
    truncating div both engines. split_rank 1 marks the argmin — the
    day after which the mean level shifts most."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2))))"
            " AS BIGINT) div 1000"
        ).alias("y")
    )
    wi = Window.orderBy("day")
    idx = daily.select(
        "day", "y",
        F.row_number().over(wi).alias("i"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    ws = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = idx.select(
        "day", "y", "i", "n",
        F.sum("y").over(ws).alias("s"),
        F.sum(F.col("y") * F.col("y")).over(ws).alias("q"),
    ).localCheckpoint()
    tot = cum.agg(
        F.max("s").alias("st"), F.max("q").alias("qt"),
        F.max("n").alias("nt"),
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("nt"))
        .select(
            "day",
            F.expr(
                "(q - s * s div i) + ((qt - q)"
                " - (st - s) * (st - s) div (nt - i))"
            ).alias("sse_split"),
            F.expr("qt - st * st div nt").alias("sse_null"),
            F.expr("s * 1000 div i").alias("mean_left_milli"),
            F.expr("(st - s) * 1000 div (nt - i)")
            .alias("mean_right_milli"),
        )
    )
    wr = Window.orderBy("sse_split", "day")
    return cand.select(
        F.col("day").alias("break_after_day"),
        F.col("sse_split").cast("long").alias("sse_split"),
        F.col("sse_null").cast("long").alias("sse_null"),
        (F.col("sse_null") - F.col("sse_split")).cast("long")
        .alias("sse_gain"),
        F.col("mean_left_milli").cast("long").alias("mean_left_milli"),
        F.col("mean_right_milli").cast("long")
        .alias("mean_right_milli"),
        F.row_number().over(wr).cast("long").alias("split_rank"),
    ).orderBy("break_after_day")


@register(
    "mulaw_codec_report",
    """
    WITH src AS (
        SELECT (doc_id * 40503 + k.k * 2654435761) % 65536 - 32768 AS s
        FROM documents CROSS JOIN generate_series(0, 63) k(k)
    ), enc AS (
        SELECT s, (CASE WHEN (CASE WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 63 THEN 0 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 127 THEN 1 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 255 THEN 2 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 511 THEN 3 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 1023 THEN 4 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 2047 THEN 5 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 4095 THEN 6 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 8191 THEN 7 ELSE 8 END) >= 8 THEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN 127 ELSE 255 END) - 127 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN 127 ELSE 255 END) - ((CASE WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 63 THEN 0 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 127 THEN 1 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 255 THEN 2 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 511 THEN 3 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 1023 THEN 4 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 2047 THEN 5 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 4095 THEN 6 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 8191 THEN 7 ELSE 8 END) * 16 + ((CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) - ((CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) % CASE ((CASE WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 63 THEN 0 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 127 THEN 1 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 255 THEN 2 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 511 THEN 3 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 1023 THEN 4 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 2047 THEN 5 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 4095 THEN 6 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 8191 THEN 7 ELSE 8 END) + 1) WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32 WHEN 6 THEN 64 WHEN 7 THEN 128 ELSE 256 END)) // CASE ((CASE WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 63 THEN 0 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 127 THEN 1 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 255 THEN 2 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 511 THEN 3 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 1023 THEN 4 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 2047 THEN 5 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 4095 THEN 6 WHEN (CASE WHEN (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) > 8159 THEN 8159 ELSE (CASE WHEN (((s) - (((s) % 4 + 4) % 4)) // 4) < 0 THEN -(((s) - (((s) % 4 + 4) % 4)) // 4) ELSE (((s) - (((s) % 4 + 4) % 4)) // 4) END) END + 33) <= 8191 THEN 7 ELSE 8 END) + 1) WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32 WHEN 6 THEN 64 WHEN 7 THEN 128 ELSE 256 END % 16) END) AS code FROM src
    ), rt AS (
        SELECT s, code, (CASE WHEN (255 - (code)) >= 128 THEN 132 - (((((255 - (code))) % 16) * 8 + 132) * CASE (((((255 - (code))) - (((255 - (code))) % 16)) // 16) % 8) WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32 WHEN 6 THEN 64 WHEN 7 THEN 128 ELSE 256 END) ELSE (((((255 - (code))) % 16) * 8 + 132) * CASE (((((255 - (code))) - (((255 - (code))) % 16)) // 16) % 8) WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32 WHEN 6 THEN 64 WHEN 7 THEN 128 ELSE 256 END) - 132 END) AS back,
               (((255 - code) - ((255 - code) % 16)) // 16) % 8 AS seg
        FROM enc
    )
    SELECT CAST(seg AS BIGINT) AS seg,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(COUNT(DISTINCT code) AS BIGINT) AS n_codes,
           CAST(MAX(ABS(back - s)) AS BIGINT) AS max_abs_err,
           CAST(SUM(ABS(back - s)) * 1000 // COUNT(*) AS BIGINT)
               AS mean_abs_err_milli
    FROM rt GROUP BY seg ORDER BY seg
""",
    ops=["mulaw-g711-codec", "audio-companding", "quantization-audit"],
)
def mulaw_codec_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 mu-law companding round-trip — a REAL audio codec (the
    telephony standard, byte-for-byte equal to CPython audioop's
    g711.c: proven over ALL 65536 PCM values in
    tests/test_similarity_multimodal.py) re-expressed as pure column
    arithmetic: no bit operators anywhere — byte complements become
    (mask − v), variable shifts become bounded CASE multipliers, the
    16→14-bit arithmetic shift becomes a pmod floor-division
    (multimodal.mulaw_encode_expr/mulaw_decode_expr, one div/// split
    between dialects). 64 deterministic PCM samples per document are
    encoded, decoded back, and audited per logarithmic segment: count,
    distinct codes (≤32 per segment — companding's whole point), max
    and mean absolute quantization error, which grows ~2x per segment
    exactly as the codec trades SNR for dynamic range. Map-side
    bounded explode + one grouped pass; the 9-row segment axis bounds
    every later stage."""
    e = _t(spark, sf_dir, "documents", fanout=True)
    src = e.select(
        F.expr(
            "explode(transform(sequence(0, 63), k ->"
            " (doc_id * 40503 + k * 2654435761) % 65536 - 32768))"
        ).alias("s")
    )
    # Staged-projection round-trip (r14 opt): the former inline
    # generator-substituted encode/decode expressions duplicated the
    # shift-clamp chain ~50x into one ~20 KB expression tree whose
    # analysis/codegen dominated the query (measured 4.6-5.9 s ->
    # 2.2-2.8 s interleaved). Same integer algebra, one column per
    # named piece; byte-identity vs the generator expressions is
    # pinned over all 65536 PCM values in
    # tests/test_similarity_multimodal.py.
    rt = multimodal.mulaw_roundtrip_staged(src, "s")
    return (
        rt.groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.countDistinct("code").cast("long").alias("n_codes"),
            F.max(F.abs(F.col("back") - F.col("s"))).cast("long")
            .alias("max_abs_err"),
            F.expr(
                "CAST(SUM(ABS(back - s)) * 1000 div COUNT(1) AS BIGINT)"
            ).alias("mean_abs_err_milli"),
        )
        .select(
            F.col("seg").cast("long").alias("seg"),
            "n_samples", "n_codes", "max_abs_err",
            "mean_abs_err_milli",
        )
        .orderBy("seg")
    )


# Same integer milli-luma the BMP oracle uses (299r+587g+114b) on the
# generator's closed pixel form — PPM stores RGB top-down unpadded.
_PPM_LUM = (
    "299*((seed*7 + {x}*13 + y*31) % 256)"
    " + 587*((seed*11 + {x}*3 + y*17) % 256)"
    " + 114*((seed*5 + {x}*19 + y*23) % 256)"
)


@register(
    "ppm_feature_report",
    f"""
    WITH dims AS (
        SELECT doc_id,
               9 + doc_id % 7 AS w,
               5 + doc_id % 6 AS h,
               doc_id % 89 AS seed
        FROM documents
    ), hdr AS (
        SELECT doc_id, w, h, seed,
               3
               + CASE WHEN seed % 3 = 0
                      THEN 4 + LENGTH(CAST(seed AS VARCHAR))
                      ELSE 0 END
               + LENGTH(CAST(w AS VARCHAR)) + 1
               + LENGTH(CAST(h AS VARCHAR)) + 1 + 4 AS header_len
        FROM dims
    ), grid AS (
        SELECT doc_id, w, h, header_len,
               {_PPM_LUM.format(x='x')} AS lum,
               CASE WHEN x < w - 1 THEN {_PPM_LUM.format(x='(x+1)')}
               END AS lum_next
        FROM hdr
        CROSS JOIN (SELECT unnest(range(15)) AS x)
        CROSS JOIN (SELECT unnest(range(10)) AS y)
        WHERE x < w AND y < h
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(header_len + 3 * w * h AS BIGINT) AS n_bytes,
           CAST(SUM(lum) // COUNT(*) AS DOUBLE) AS feature_0,
           CAST((COUNT(*) * SUM(lum*lum) - SUM(lum) * SUM(lum))
                // (COUNT(*) * COUNT(*)) AS DOUBLE) AS feature_1,
           CAST(1000 * SUM(CASE WHEN lum_next > lum THEN 1 ELSE 0 END)
                // (h * (w - 1)) AS DOUBLE) AS feature_2
    FROM grid GROUP BY doc_id, w, h, header_len
    """,
    ops=["multimodal-decode", "netpbm-codec", "feature-extract"],
)
def ppm_feature_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND real raster decode path end-to-end — binary netpbm
    P6: spec-valid PPMs (ASCII header with a comment line on a third
    of the corpus, then top-down UNPADDED RGB) are synthesized as JVM
    column expressions (multimodal.synthesize_ppm6), then
    extract_features(fake=False) dispatches on the magic and
    multimodal.decode_ppm6 (pure stdlib) parses the header with full
    netpbm token rules — comment skipping included — and reads the
    pixels back; the same exact integer luma features as the BMP path
    flow downstream. The oracle recomputes features AND the
    variable-length header size from the generator's closed form, so
    a hash match proves the ASCII parse (digit-width-dependent
    offsets!), comment handling, RGB order and top-down layout all at
    once — every failure mode BMP's bottom-up padded BGR cannot
    catch. Same 100 TB shape: Arrow-batched decode, features not
    blobs downstream."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    src = d.select(
        F.col("doc_id").alias("media_id"),
        (9 + F.col("doc_id") % 7).cast("int").alias("width_px"),
        (5 + F.col("doc_id") % 6).cast("int").alias("height_px"),
        (F.col("doc_id") % 89).alias("img_seed"),
    )
    media = multimodal.synthesize_ppm6(src)
    return multimodal.extract_features(media, fake=False)


@register(
    "naive_bayes_langid_report",
    """
    WITH train AS (
        SELECT doc_id, lang, lower(text) AS t FROM documents
        WHERE doc_id % 2 = 0
    ), test AS (
        SELECT doc_id, lang AS given, lower(text) AS t FROM documents
        WHERE doc_id % 2 = 1
    ), tw AS (
        SELECT lang, unnest(string_split(t, ' ')) AS term FROM train
    ), cnt AS (
        SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
        FROM tw GROUP BY lang, term
    ), totc AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS tot FROM tw
        GROUP BY lang
    ), vocab AS (
        SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tw
    ), nd AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM train
        GROUP BY lang
    ), ndt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM train
    ), classes AS (
        SELECT nd.lang AS cls,
               CAST(FLOOR(ln(CAST(nd.n_docs AS DOUBLE) / ndt.n_total)
                          * 1000000000) AS BIGINT) AS prior_fp9,
               CAST(FLOOR(ln(CAST(1 AS DOUBLE) / (totc.tot + vocab.v))
                          * 1000000000) AS BIGINT) AS default_fp9,
               totc.tot, vocab.v
        FROM nd JOIN totc ON totc.lang = nd.lang
        CROSS JOIN vocab CROSS JOIN ndt
    ), terms AS (
        SELECT cnt.lang AS cls, cnt.term,
               CAST(FLOOR(ln(CAST(cnt.c + 1 AS DOUBLE)
                             / (totc.tot + vocab.v))
                          * 1000000000) AS BIGINT) AS term_fp9
        FROM cnt JOIN totc ON totc.lang = cnt.lang CROSS JOIN vocab
    ), xw AS (
        SELECT x.doc_id, x.given, cl.cls,
               COALESCE(t.term_fp9, cl.default_fp9) AS w_fp9
        FROM (SELECT doc_id, given,
                     unnest(string_split(t, ' ')) AS term
              FROM test) x
        CROSS JOIN classes cl
        LEFT JOIN terms t ON t.cls = cl.cls AND t.term = x.term
    ), sc AS (
        SELECT xw.doc_id, xw.given, xw.cls,
               CAST(MAX(cl.prior_fp9) + SUM(xw.w_fp9) AS BIGINT)
                   AS score_fp9
        FROM xw JOIN classes cl ON cl.cls = xw.cls
        GROUP BY xw.doc_id, xw.given, xw.cls
    ), pred AS (
        SELECT doc_id, given, cls AS predicted,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score_fp9 DESC, cls) AS rn
        FROM sc
    )
    SELECT given, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY given, predicted ORDER BY given, predicted
    """,
    ops=["naive-bayes", "text-classification", "train-apply-eval"],
)
def naive_bayes_langid_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A TRAINED classifier inside the engine — multinomial Naive
    Bayes language-ID with Laplace smoothing, fit on the even half of
    the corpus and evaluated on the odd half as a confusion matrix
    (the heuristic lang_id_predict's learned sibling). Log-likelihoods
    follow the kaplan_meier floor-fp9 discipline: every ln is floored
    to integer nano units BEFORE any summation, so scores are exact
    integer sums and the argmax (class tiebreak) is engine-identical.
    Unknown test words hit a per-class smoothed default instead of
    being dropped. Physical shape: training is one explode + two
    grouped passes; scoring joins test words against the (term, class)
    table on the shuffle key and fans out only by the bounded class
    count; the per-doc argmax is a per-doc window (WindowGroupLimit),
    never global."""
    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", F.lower("text").alias("t")
    )
    test = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.col("lang").alias("given"),
        F.lower("text").alias("t"),
    )
    tw = train.select(
        "lang", F.explode(F.split(F.col("t"), " ")).alias("term")
    )
    cnt = tw.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totc = tw.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("tot")
    )
    vocab = tw.agg(
        F.countDistinct("term").cast("long").alias("v")
    )
    nd = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    ndt = train.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    classes = (
        nd.join(totc, "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ndt))
        .select(
            F.col("lang").alias("cls"),
            F.expr(
                "CAST(FLOOR(ln(CAST(n_docs AS DOUBLE) / n_total)"
                " * 1000000000) AS BIGINT)"
            ).alias("prior_fp9"),
            F.expr(
                "CAST(FLOOR(ln(CAST(1 AS DOUBLE) / (tot + v))"
                " * 1000000000) AS BIGINT)"
            ).alias("default_fp9"),
        )
        .localCheckpoint()
    )
    terms = (
        cnt.join(totc, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("lang").alias("cls"),
            "term",
            F.expr(
                "CAST(FLOOR(ln(CAST(c + 1 AS DOUBLE) / (tot + v))"
                " * 1000000000) AS BIGINT)"
            ).alias("term_fp9"),
        )
    )
    xw = (
        test.select(
            "doc_id", "given",
            F.explode(F.split(F.col("t"), " ")).alias("term"),
        )
        .crossJoin(F.broadcast(classes))
        .join(terms, ["cls", "term"], "left")
        .select(
            "doc_id", "given", "cls", "prior_fp9",
            F.coalesce(F.col("term_fp9"), F.col("default_fp9"))
            .alias("w_fp9"),
        )
    )
    sc = xw.groupBy("doc_id", "given", "cls").agg(
        (F.max("prior_fp9") + F.sum("w_fp9")).cast("long")
        .alias("score_fp9")
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("score_fp9").desc(), "cls"
    )
    pred = sc.select(
        "doc_id", "given", F.col("cls").alias("predicted"),
        F.row_number().over(wr).alias("rn"),
    ).filter(F.col("rn") == 1)
    return (
        pred.groupBy("given", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("given", "predicted")
    )


@register(
    "pyds_reader_roundtrip_e2e",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS value_cents
    FROM events
    WHERE event_type <> 'error'
    GROUP BY event_type ORDER BY event_type
    """,
    ops=["python-datasource-reader", "manifest-honoring", "e2e"],
)
def pyds_reader_roundtrip_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch write → manifest-honoring batch READ through the Spark 4
    Python DataSource, end to end: events flow through the jsonl_dir
    sink (atomic tmp→rename commit, manifest published first), then an
    ORPHAN uncommitted part file is planted in the directory, and the
    data comes back via ``spark.read.format("jsonl_dir")`` whose
    reader builds one InputPartition per manifest-committed part —
    executor-side parsing, driver never touches row data. The oracle
    is the direct relational answer, so the gate proves BOTH the
    JSONL round-trip (doubles survive via shortest-repr json) AND that
    the planted orphan stayed invisible — ``spark.read.json`` on the
    raw directory would have counted it. Completes the Python
    DataSource matrix: batch read (sources/pyds.py), stream read,
    stream write, batch write, and now manifest-honoring batch
    read-back."""
    import os

    from ..scratch import scratch_dir
    from ..sinks.pyds_writer import register_jsonl_dir

    register_jsonl_dir(spark)
    e = _t(spark, sf_dir, "events")
    # Stable scratch path per (query, sf) — NOT per session: the r11
    # fix keyed by applicationId, which still leaked one dir per
    # session (r12 VERDICT #2). The returned DataFrame is lazy so the
    # directory must outlive this function; repeated runs (and repeated
    # sessions) overwrite in place via the jsonl_dir sink's overwrite
    # mode.
    out = os.path.join(scratch_dir("pyds_rt", sf_dir), "data")
    (
        e.filter(F.col("event_type") != "error")
        .select("event_id", "event_type", "value")
        .repartition(4)
        .write.format("jsonl_dir")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    # plant an uncommitted orphan the manifest never named: a
    # manifest-honoring reader must not see it
    with open(f"{out}/part-99999-0-orphan.jsonl", "w",
              encoding="utf-8") as fh:
        fh.write('{"event_id": -1, "event_type": "view",'
                 ' "value": 123.45}\n')
    back = (
        spark.read.format("jsonl_dir")
        .schema("event_id long, event_type string, value double")
        .option("path", out)
        .load()
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.expr(
                    "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
                )
            ).cast("long").alias("value_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "krippendorff_alpha_report",
    """
    WITH r AS (
        SELECT doc_id AS unit, 1 AS rater,
               (doc_id * 7 + 3) % 3 AS val
        FROM documents
        UNION ALL
        SELECT doc_id, 2,
               CASE WHEN doc_id % 4 = 0
                    THEN ((doc_id * 7 + 3) % 3 + 1 + doc_id % 2) % 3
                    ELSE (doc_id * 7 + 3) % 3 END
        FROM documents
        UNION ALL
        SELECT doc_id, 3,
               CASE WHEN doc_id % 6 = 0
                    THEN ((doc_id * 7 + 3) % 3 + 1) % 3
                    ELSE (doc_id * 7 + 3) % 3 END
        FROM documents WHERE doc_id % 5 <> 0
    ), mu AS (
        SELECT unit, COUNT(*) AS m FROM r GROUP BY unit
    ), pairs AS (
        SELECT a.val AS c, b.val AS k, 2 // (mu.m - 1) AS w2
        FROM r a
        JOIN r b ON b.unit = a.unit AND b.rater <> a.rater
        JOIN mu ON mu.unit = a.unit
        WHERE mu.m >= 2
    ), o AS (
        SELECT c, k, CAST(SUM(w2) AS BIGINT) AS o2
        FROM pairs GROUP BY c, k
    ), marg AS (
        SELECT c, CAST(SUM(o2) AS BIGINT) AS n2c FROM o GROUP BY c
    ), tot AS (
        SELECT CAST(SUM(n2c) AS BIGINT) AS n2,
               CAST((SELECT SUM(o2) FROM o WHERE c <> k) AS BIGINT)
                   AS a2,
               CAST((SELECT SUM(x.n2c * y.n2c) FROM marg x, marg y
                     WHERE x.c <> y.c) AS BIGINT) AS de2
        FROM marg
    )
    SELECT o.c, o.k, o.o2 AS coincidence_half_pairs,
           marg.n2c AS margin_half_pairs,
           CAST(tot.a2 * (tot.n2 - 2) * 1000000 // tot.de2 AS BIGINT)
               AS disagreement_ratio_micro,
           CAST(1000000 - tot.a2 * (tot.n2 - 2) * 1000000 // tot.de2
                AS BIGINT) AS alpha_micro
    FROM o JOIN marg ON marg.c = o.c CROSS JOIN tot
    ORDER BY o.c, o.k
    """,
    ops=["krippendorff-alpha", "multi-rater-agreement", "labeling-qa"],
)
def krippendorff_alpha_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) — the agreement coefficient that
    handles MULTIPLE raters and MISSING ratings, which Cohen's kappa
    (annotator_agreement_kappa) cannot: three deterministic synthetic
    raters (B flips every 4th label, C flips every 6th and skips every
    5th unit entirely), so units carry 2 or 3 pairable values. The
    coincidence matrix is exact by a unit trick: each ordered pair in
    a unit contributes 2/(m−1) half-pairs, and with m ∈ {2,3} that is
    exactly 2 or 1 — integer, no truncation anywhere until the single
    final alpha division (alpha = 1 − A(N−2)/Σ_{c≠k}n_c n_k in
    half-pair units). Output is the full coincidence matrix with
    margins plus the global alpha. Shape: the within-unit pair join
    fans out by m−1 ≤ 2 per rating (never quadratic in the corpus),
    then one grouped pass; everything after lives on the K² matrix."""
    d = _t(spark, sf_dir, "documents")
    base = (F.col("doc_id") * 7 + 3) % 3
    r1 = d.select(
        F.col("doc_id").alias("unit"), F.lit(1).alias("rater"),
        base.alias("val"),
    )
    r2 = d.select(
        F.col("doc_id").alias("unit"), F.lit(2).alias("rater"),
        F.when(
            F.col("doc_id") % 4 == 0,
            (base + 1 + F.col("doc_id") % 2) % 3,
        ).otherwise(base).alias("val"),
    )
    r3 = (
        d.filter(F.col("doc_id") % 5 != 0)
        .select(
            F.col("doc_id").alias("unit"), F.lit(3).alias("rater"),
            F.when(F.col("doc_id") % 6 == 0, (base + 1) % 3)
            .otherwise(base).alias("val"),
        )
    )
    r = r1.unionByName(r2).unionByName(r3)
    mu = r.groupBy("unit").agg(F.count(F.lit(1)).alias("m"))
    a = r.select("unit", F.col("rater").alias("ra"),
                 F.col("val").alias("c"))
    b = r.select("unit", F.col("rater").alias("rb"),
                 F.col("val").alias("k"))
    pairs = (
        a.join(b, "unit")
        .filter(F.col("ra") != F.col("rb"))
        .join(mu, "unit")
        .filter(F.col("m") >= 2)
        .select("c", "k", F.expr("2 div (m - 1)").alias("w2"))
    )
    o = pairs.groupBy("c", "k").agg(
        F.sum("w2").cast("long").alias("o2")
    ).localCheckpoint()
    marg = o.groupBy("c").agg(F.sum("o2").cast("long").alias("n2c"))
    n2 = marg.agg(F.sum("n2c").cast("long").alias("n2"))
    a2 = o.filter(F.col("c") != F.col("k")).agg(
        F.sum("o2").cast("long").alias("a2")
    )
    de2 = (
        marg.select(F.col("c").alias("cx"), F.col("n2c").alias("nx"))
        .crossJoin(
            F.broadcast(
                marg.select(F.col("c").alias("cy"),
                            F.col("n2c").alias("ny"))
            )
        )
        .filter(F.col("cx") != F.col("cy"))
        .agg(F.sum(F.col("nx") * F.col("ny")).cast("long").alias("de2"))
    )
    tot = n2.crossJoin(F.broadcast(a2)).crossJoin(F.broadcast(de2))
    return (
        o.join(F.broadcast(marg), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            "c", "k",
            F.col("o2").alias("coincidence_half_pairs"),
            F.col("n2c").alias("margin_half_pairs"),
            F.expr(
                "CAST(a2 * (n2 - 2) * 1000000 div de2 AS BIGINT)"
            ).alias("disagreement_ratio_micro"),
            F.expr(
                "CAST(1000000 - a2 * (n2 - 2) * 1000000 div de2"
                " AS BIGINT)"
            ).alias("alpha_micro"),
        )
        .orderBy("c", "k")
    )


@register(
    "merkle_partition_proof",
    """
    WITH rows_d AS (
        SELECT ('0x' || substr(md5('mk:' ||
                   CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 32
                   AS bucket,
               md5(CAST(o_orderkey AS VARCHAR) || ':' ||
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS VARCHAR)) AS digest
        FROM orders
    ), buckets AS (
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               md5(string_agg(digest, '' ORDER BY digest))
                   AS bucket_digest
        FROM rows_d GROUP BY bucket
    ), root AS (
        SELECT md5(string_agg(bucket_digest, '' ORDER BY bucket))
                   AS root_digest
        FROM buckets
    )
    SELECT b.bucket, b.n_rows, b.bucket_digest, r.root_digest
    FROM buckets b CROSS JOIN root r
    ORDER BY b.bucket
    """,
    ops=["merkle-tree", "integrity-proof", "table-fingerprint"],
)
def merkle_partition_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle partition proof — table_fingerprint's tree-structured
    sibling: rows land in 32 md5 buckets, each bucket's digest is the
    md5 of its SORTED row digests, and the root is the md5 of the
    bucket digests in bucket order. A replica can now verify ONE
    bucket by re-hashing 1/32 of the table and checking its leaf
    against the shared root — the incremental-audit shape a 100 TB
    store needs (re-fingerprinting everything per check is the flat
    hash's failure mode; deeper trees are the same fold applied
    again). Order-insensitive by construction (sorted digests), so
    partitioning never changes the proof. One grouped pass + a 32-row
    fold; the per-bucket sort is bucket-local."""
    o = _t(spark, sf_dir, "orders")
    rows_d = o.select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mk:"),
                                   F.col("o_orderkey").cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % 32
        ).alias("bucket"),
        F.md5(
            F.concat(
                F.col("o_orderkey").cast("string"), F.lit(":"),
                F.expr(
                    "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))"
                    " * 100 AS BIGINT) AS STRING)"
                ),
            )
        ).alias("digest"),
    )
    buckets = (
        rows_d.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.md5(
                F.concat_ws("", F.sort_array(F.collect_list("digest")))
            ).alias("bucket_digest"),
        )
        .localCheckpoint()
    )
    root = buckets.agg(
        F.md5(
            F.concat_ws(
                "",
                F.expr(
                    "transform(sort_array(collect_list("
                    "struct(bucket, bucket_digest))),"
                    " x -> x.bucket_digest)"
                ),
            )
        ).alias("root_digest")
    )
    return (
        buckets.crossJoin(F.broadcast(root))
        .select("bucket", "n_rows", "bucket_digest", "root_digest")
        .orderBy("bucket")
    )


@register(
    "sprt_conversion_monitor",
    """
    WITH par AS (
        SELECT CAST(FLOOR(ln(CAST(0.3 AS DOUBLE) / 0.2) * 1000000000)
                    AS BIGINT) AS l1,
               CAST(FLOOR(ln(CAST(0.7 AS DOUBLE) / 0.8) * 1000000000)
                    AS BIGINT) AS l0,
               CAST(FLOOR(ln(CAST(19 AS DOUBLE)) * 1000000000)
                    AS BIGINT) AS up,
               CAST(-CEIL(ln(CAST(19 AS DOUBLE)) * 1000000000)
                    AS BIGINT) AS lo
    ), e AS (
        SELECT CAST(ts AS DATE) AS day,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
               ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), cum AS (
        SELECT e.day, e.rn, e.x,
               SUM(e.x * par.l1 + (1 - e.x) * par.l0) OVER (
                   PARTITION BY e.day ORDER BY e.rn) AS llr_fp9,
               par.up, par.lo
        FROM e CROSS JOIN par
    ), marks AS (
        SELECT day, rn, x, llr_fp9,
               CASE WHEN llr_fp9 >= up THEN 1
                    WHEN llr_fp9 <= lo THEN -1 ELSE 0 END AS crossed,
               MAX(rn) OVER (PARTITION BY day) AS maxrn
        FROM cum
    ), firstx AS (
        SELECT day, MIN(rn) AS decided_at_n
        FROM marks WHERE crossed <> 0 GROUP BY day
    )
    SELECT m.day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(m.x) AS BIGINT) AS n_purchases,
           CASE COALESCE(CAST(MAX(CASE WHEN m.rn = fx.decided_at_n
                                  THEN m.crossed END) AS BIGINT), 0)
                WHEN 1 THEN 'accept_h1' WHEN -1 THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           CAST(COALESCE(MAX(fx.decided_at_n), 0) AS BIGINT)
               AS decided_at_n,
           CAST(MAX(CASE WHEN m.rn = m.maxrn THEN m.llr_fp9 END)
                AS BIGINT) AS final_llr_fp9
    FROM marks m LEFT JOIN firstx fx ON fx.day = m.day
    GROUP BY m.day ORDER BY m.day
    """,
    ops=["sprt", "sequential-testing", "monitoring"],
)
def sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test per day — the
    always-valid monitoring rule an experimentation platform runs
    instead of fixed-horizon tests: each day's event stream is walked
    in (ts, event_id) order accumulating the purchase-conversion
    log-likelihood ratio for H1 p=0.3 vs H0 p=0.2; the day decides at
    the FIRST crossing of ±ln19 (α=β=0.05) and reports where. The two
    per-observation LLR increments are constants floored to fp9 (the
    kaplan_meier discipline), so the cumulative walk is an exact
    integer window sum and the crossing index is engine-identical; the
    lower barrier uses −CEIL so both barriers sit strictly outside the
    open interval. Shape: windows are partitioned BY DAY (each day is
    an independent sequential test — no global ordering exists
    anywhere), one grouped pass summarizes."""
    e0 = _t(spark, sf_dir, "events")
    par = spark.sql(
        "SELECT CAST(FLOOR(ln(CAST(0.3 AS DOUBLE) / 0.2) * 1000000000)"
        " AS BIGINT) AS l1,"
        " CAST(FLOOR(ln(CAST(0.7 AS DOUBLE) / 0.8) * 1000000000)"
        " AS BIGINT) AS l0,"
        " CAST(FLOOR(ln(CAST(19 AS DOUBLE)) * 1000000000) AS BIGINT)"
        " AS up,"
        " CAST(-CEIL(ln(CAST(19 AS DOUBLE)) * 1000000000) AS BIGINT)"
        " AS lo"
    )
    wd = Window.partitionBy("day").orderBy("ts", "event_id")
    e = e0.select(
        F.to_date("ts").alias("day"), "ts", "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("x"),
    ).select(
        "day", "x",
        F.row_number().over(wd).alias("rn"),
    )
    cum = (
        e.crossJoin(F.broadcast(par))
        .select(
            "day", "rn", "x",
            F.sum(
                F.col("x") * F.col("l1") + (1 - F.col("x")) * F.col("l0")
            ).over(Window.partitionBy("day").orderBy("rn"))
            .alias("llr_fp9"),
            "up", "lo",
        )
        .select(
            "day", "rn", "x", "llr_fp9",
            F.when(F.col("llr_fp9") >= F.col("up"), 1)
            .when(F.col("llr_fp9") <= F.col("lo"), -1)
            .otherwise(0).alias("crossed"),
        )
        .localCheckpoint()
    )
    firstx = (
        cum.filter(F.col("crossed") != 0)
        .groupBy("day")
        .agg(F.min("rn").alias("decided_at_n"))
    )
    maxrn = Window.partitionBy("day")
    daily = (
        cum.select(
            "day", "rn", "x", "llr_fp9", "crossed",
            F.max("rn").over(maxrn).alias("maxrn"),
        )
        .join(F.broadcast(firstx), "day", "left")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("x").cast("long").alias("n_purchases"),
            F.max(
                F.when(F.col("rn") == F.col("decided_at_n"),
                       F.col("crossed"))
            ).cast("long").alias("verdict_sign"),
            F.max("decided_at_n").cast("long").alias("decided_at_n_raw"),
            F.max(
                F.when(F.col("rn") == F.col("maxrn"), F.col("llr_fp9"))
            ).cast("long").alias("final_llr_fp9"),
        )
    )
    return daily.select(
        "day", "n_events", "n_purchases",
        F.when(F.col("verdict_sign") == 1, "accept_h1")
        .when(F.col("verdict_sign") == -1, "accept_h0")
        .otherwise("continue").alias("decision"),
        F.coalesce(F.col("decided_at_n_raw"), F.lit(0)).cast("long")
        .alias("decided_at_n"),
        "final_llr_fp9",
    ).orderBy("day")


__all__ = [n for n in globals() if not n.startswith("__")]
