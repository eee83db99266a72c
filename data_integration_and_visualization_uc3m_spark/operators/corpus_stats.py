"""Corpus-level distributional statistics for training-data curation.

Four dataset-card measurements a 100 TB pipeline reports per shard and
per source (extension surface beyond the reference's aggregate ops,
crime_immigration_etl.py:255-275, which stop at per-group sums):

* n-gram diversity (distinct-1 / distinct-2) — the collapse detector
  for synthetic or templated text;
* Zipf rank-frequency slope — natural corpora fit ≈ −1; heavy
  boilerplate or deduplication failures bend it;
* per-document character entropy — flags binary junk / mojibake /
  single-character spam at the document level;
* corpus-bigram-LM log-probability — a perplexity proxy scoring each
  document against the corpus's own bigram statistics (the classic
  CCNet-style quality signal, here self-trained in the same pass).

Determinism discipline (convention #7 of this repo): every
cross-row float accumulation is fixed-pointed to BIGINT *per term*
before summation, so the sum is exact-integer and order-free; the
only floating-point left is a final fixed-order scalar expression,
emitted as floor(x * 10^k). libm calls (`ln`) take only integer
arguments, where Java's and DuckDB's correctly-rounded results agree.

Scale notes: everything here is one token/char explode (linear in
corpus bytes — the same cost as tokenization itself) followed by hash
aggregations on bounded keys (vocabulary, (doc, char), (doc, bigram)).
No windows over the full corpus, no cross-document joins; the bigram
LM join is vocabulary-sized on the build side and pre-combined
map-side on the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP9 = 1_000_000_000  # fixed-point scale for per-term ln() values
FP6 = 1_000_000  # fixed-point scale for reported scores

DEC38 = "decimal(38,0)"


def _tokens(text_col: str = "text") -> F.Column:
    return F.filter(F.split(F.lower(text_col), " "), lambda x: x != "")


def _doc_bigrams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair per document."""
    w = df.select(F.col(id_col), _tokens(text_col).alias("__w"))
    return (
        w.filter(F.size("__w") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__w") - 2),
                    lambda i: F.struct(
                        F.element_at("__w", i + 1).alias("w1"),
                        F.element_at("__w", i + 2).alias("w2"),
                    ),
                )
            ).alias("p"),
        )
        .select(id_col, "p.w1", "p.w2")
    )


def ngram_diversity(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Distinct-1 / distinct-2 per group: distinct n-grams over total
    n-gram instances, the standard text-diversity ratio. Two hash
    aggregations (token key, bigram key) + per-group distinct counts;
    ratios are exact-integer inputs to one final double expression."""
    toks = df.select(F.col(group_col), F.explode(_tokens(text_col)).alias("tok"))
    uni = toks.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("tok").cast("long").alias("n_distinct_uni"),
    )
    bg = _doc_bigrams(
        df.select(F.col(group_col).alias("__g"), F.col(text_col)),
        id_col="__g",
        text_col=text_col,
    )
    bi = bg.groupBy(F.col("__g").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.count_distinct("w1", "w2").cast("long").alias("n_distinct_bi"),
    )
    return uni.join(bi, group_col).select(
        group_col,
        "n_tokens",
        "n_distinct_uni",
        "n_bigrams",
        "n_distinct_bi",
        F.floor(
            F.col("n_distinct_uni").cast("double")
            / F.col("n_tokens")
            * FP6
        )
        .cast("long")
        .alias("distinct1_fp6"),
        F.floor(
            F.col("n_distinct_bi").cast("double")
            / F.col("n_bigrams")
            * FP6
        )
        .cast("long")
        .alias("distinct2_fp6"),
    )


def zipf_slope(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Per-group OLS slope of ln(freq) on ln(rank) over the top-n
    terms — the Zipf exponent (≈ −1 for natural text). Ranks come from
    a per-group window over the vocabulary aggregate (vocabulary-sized,
    never corpus-sized); ln(rank)/ln(freq) are integer-argument libm
    calls fixed-pointed to BIGINT, the OLS moments are exact
    DECIMAL(38,0) sums, and the slope is one final double ratio."""
    from pyspark.sql import Window

    toks = df.select(F.col(group_col), F.explode(_tokens(text_col)).alias("tok"))
    vocab = toks.groupBy(group_col, "tok").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy(group_col).orderBy(F.col("freq").desc(), F.col("tok"))
    ranked = vocab.select(
        group_col, "freq", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= top_n)
    x = F.floor(F.log(F.col("rank").cast("double")) * FP9).cast("long")
    y = F.floor(F.log(F.col("freq").cast("double")) * FP9).cast("long")
    pts = ranked.select(group_col, x.alias("x"), y.alias("y"))
    # a 1-term vocabulary has no rank spread — the OLS denominator is
    # zero; such degenerate groups are excluded, not NaN-propagated
    sums = pts.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("x").cast(DEC38)).alias("sx"),
        F.sum(F.col("y").cast(DEC38)).alias("sy"),
        F.sum(F.col("x").cast(DEC38) * F.col("x").cast(DEC38)).alias("sxx"),
        F.sum(F.col("x").cast(DEC38) * F.col("y").cast(DEC38)).alias("sxy"),
    )
    n_d = F.col("n_terms").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    return sums.filter(F.col("n_terms") >= 2).select(
        group_col,
        "n_terms",
        F.floor((n_d * sxy - sx * sy) / (n_d * sxx - sx * sx) * FP6)
        .cast("long")
        .alias("zipf_slope_fp6"),
    )


def heaps_fit(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_checkpoints: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit per group: V(n) = K·n^beta
    (Heaps 1978; beta ≈ 0.4-0.6 for natural text), the planning curve
    that answers "how much NEW vocabulary does the next 10× of corpus
    buy" — a tokenizer/vocab-budget question zipf_slope (frequency
    within a fixed vocabulary) cannot.

    Spark-first shape, NO corpus-sized window: the growth curve needs
    cumulative token counts and cumulative distinct vocabulary at
    checkpoints, and both collapse to group-by math — each token's
    FIRST document (min doc_id) decides when it enters the vocabulary,
    so V(cut) = #{tokens: first_id <= cut} and n(cut) = sum of token
    counts of docs with doc_id <= cut. Checkpoints are id-value deciles
    (one 2-number bounds row per group), the checkpoint join is a
    broadcast of the bounded cuts relation (each doc/token row matches
    <= n_checkpoints cuts), and the log-log OLS runs over
    n_checkpoints points per group under the zipf_slope discipline:
    libm ln on INTEGER args fixed-pointed to BIGINT, DECIMAL(38,0)
    moments, one final double ratio."""
    toks = df.select(
        F.col(group_col), F.col(id_col), F.explode(_tokens(text_col)).alias("tok")
    )
    per_doc = toks.groupBy(group_col, id_col).agg(
        F.count(F.lit(1)).alias("n_toks")
    )
    vocab = toks.groupBy(group_col, "tok").agg(
        F.min(id_col).alias("first_id")
    )
    cuts = (
        df.groupBy(group_col)
        .agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi"))
        .select(
            group_col,
            F.explode(F.sequence(F.lit(1), F.lit(n_checkpoints))).alias("c"),
            "lo", "hi",
        )
        .select(
            group_col, "c",
            F.expr(f"lo + (hi - lo) * c div {n_checkpoints}").alias("cut"),
        )
    )
    # cuts' group column aliased before each join: cuts shares lineage
    # with per_doc/vocab, and same-lineage equality would lean on
    # Dataset self-join auto-resolution (ADVICE r12 — fragile across
    # Spark versions and compound conditions).
    cuts_r = cuts.select(
        F.col(group_col).alias("_cut_grp"), "c", "cut"
    )
    n_c = (
        per_doc.join(
            F.broadcast(cuts_r),
            (F.col(group_col) == F.col("_cut_grp"))
            & (F.col(id_col) <= F.col("cut")),
        )
        .groupBy(group_col, "c")
        .agg(F.sum("n_toks").cast("long").alias("n_tokens"))
    )
    v_c = (
        vocab.join(
            F.broadcast(cuts_r),
            (F.col(group_col) == F.col("_cut_grp"))
            & (F.col("first_id") <= F.col("cut")),
        )
        .groupBy(group_col, "c")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    pts = (
        n_c.join(v_c, [group_col, "c"])
        .filter((F.col("n_tokens") >= 1) & (F.col("vocab") >= 1))
        .select(
            group_col, "c", "n_tokens", "vocab",
            F.floor(F.log(F.col("n_tokens").cast("double")) * FP9)
            .cast("long").alias("x"),
            F.floor(F.log(F.col("vocab").cast("double")) * FP9)
            .cast("long").alias("y"),
        )
    )
    sums = pts.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.max(F.when(F.col("c") == n_checkpoints, F.col("n_tokens")))
        .cast("long").alias("tokens_final"),
        F.max(F.when(F.col("c") == n_checkpoints, F.col("vocab")))
        .cast("long").alias("vocab_final"),
        F.sum(F.col("x").cast(DEC38)).alias("sx"),
        F.sum(F.col("y").cast(DEC38)).alias("sy"),
        F.sum(F.col("x").cast(DEC38) * F.col("x").cast(DEC38)).alias("sxx"),
        F.sum(F.col("x").cast(DEC38) * F.col("y").cast(DEC38)).alias("sxy"),
    )
    n_d = F.col("n_points").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    beta = (n_d * sxy - sx * sy) / (n_d * sxx - sx * sx)
    return sums.filter(F.col("n_points") >= 2).select(
        group_col,
        F.col("n_points").cast("long").alias("n_points"),
        "tokens_final",
        "vocab_final",
        F.floor(beta * FP6).cast("long").alias("heaps_beta_fp6"),
        F.floor((sy - beta * sx) / n_d / FP9 * FP6).cast("long")
        .alias("heaps_lnk_fp6"),
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon character entropy (nats), via the exact
    decomposition H = ln(n) − (Σ c·ln c)/n over per-character counts
    c. The only cross-row sum is Σ c·floor(ln(c)·10⁹) — exact BIGINT.
    The char explode is linear in corpus bytes (one substring per
    position — same asymptotics as tokenization); counts collapse to
    ≤ |alphabet| rows per document before anything else happens.
    Empty documents are excluded (a descending sequence(1, 0) would
    otherwise fabricate two empty-string positions)."""
    df = df.filter(F.length(text_col) > 0)
    chars = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(text_col)),
                lambda i: F.col(text_col).substr(i, F.lit(1)),
            )
        ).alias("ch"),
    )
    counts = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    term = (
        F.floor(F.log(F.col("c").cast("double")) * FP9).cast("long")
        * F.col("c")
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_chars_counted"),
        F.sum(term).alias("s_clnc_fp9"),
    )
    n_d = F.col("n_chars_counted").cast("double")
    return per_doc.select(
        id_col,
        "n_chars_counted",
        F.floor(
            (F.log(n_d) - F.col("s_clnc_fp9").cast("double") / FP9 / n_d)
            * FP6
        )
        .cast("long")
        .alias("entropy_fp6"),
    )


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score every document against the corpus's own bigram LM:
    per-doc Σ ln P(w2|w1) with P = c(w1,w2)/c(w1,·), both counts from
    the corpus itself (so no smoothing is needed — every observed
    bigram has corpus support). The CCNet-style quality signal, with
    the LM training and the scoring fused into one lazy plan.

    Plan: doc-level bigram multiplicities pre-combine map-side on
    (doc, w1, w2); the corpus LM is a vocabulary-sized aggregate
    joined back on the bigram key (shuffle join — the LM side is
    vocabulary-scaled, NOT broadcast: real corpora have billions of
    distinct bigrams). Per-pair ln terms are fixed-pointed before the
    per-doc sum, keeping the score exact-integer."""
    bg = _doc_bigrams(df, id_col=id_col, text_col=text_col)
    per_doc_pair = bg.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    pair_counts = per_doc_pair.groupBy("w1", "w2").agg(
        F.sum("m").alias("c2")
    )
    w1_counts = pair_counts.groupBy("w1").agg(F.sum("c2").alias("c1"))
    term = F.floor(
        (
            F.log(F.col("c2").cast("double"))
            - F.log(F.col("c1").cast("double"))
        )
        * FP9
    ).cast("long")
    scored = (
        per_doc_pair.join(pair_counts, ["w1", "w2"])
        .join(w1_counts, "w1")
        .select(F.col(id_col), F.col("m"), term.alias("t"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("m").alias("n_bigrams"),
        F.sum(F.col("m") * F.col("t")).alias("sum_logp_fp9"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        "sum_logp_fp9",
        F.floor(
            F.col("sum_logp_fp9").cast("double")
            / F.col("n_bigrams")
            / 1000.0
        )
        .cast("long")
        .alias("avg_logp_fp6"),
    )


def dsir_score(
    df: DataFrame,
    target_cond: F.Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data selection scores (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): rank
    raw documents by how much more likely a TARGET-domain n-gram LM
    finds them than the raw-corpus LM —
    ``score = Σ m·(ln P_target(w2|w1) − ln P_raw(w2|w1))``.

    Both LMs train in the same lazy plan (the target is the
    ``target_cond`` slice of the corpus); scoring covers the bigrams
    the target LM has support for (the importance ratio is undefined
    off-support — documents whose bigrams never occur in-domain simply
    contribute nothing, and ``n_scored_bigrams`` reports the
    coverage). Each ln takes an INTEGER count (correctly-rounded and
    engine-identical), is fixed-pointed per term, and the per-doc sum
    is exact integer — the whole selection is oracle-reproducible.

    Shape: one bigram explode (pre-combined map-side per doc), two
    vocabulary-sized LM aggregates, vocabulary-keyed joins. Positive
    ``diff_fp9`` = more target-like than average.
    """
    bg = _doc_bigrams(df, id_col=id_col, text_col=text_col)
    per_doc_pair = bg.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    raw_pc = per_doc_pair.groupBy("w1", "w2").agg(F.sum("m").alias("c2"))
    raw_wc = raw_pc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    target_ids = df.filter(target_cond).select(F.col(id_col))
    tgt_pc = (
        per_doc_pair.join(target_ids, id_col, "left_semi")
        .groupBy("w1", "w2")
        .agg(F.sum("m").alias("t2"))
    )
    tgt_wc = tgt_pc.groupBy("w1").agg(F.sum("t2").alias("t1"))
    term = lambda num, den: F.floor(
        (F.log(F.col(num).cast("double")) - F.log(F.col(den).cast("double")))
        * FP9
    ).cast("long")
    scored = (
        per_doc_pair.join(tgt_pc, ["w1", "w2"])
        .join(tgt_wc, "w1")
        .join(raw_pc, ["w1", "w2"])
        .join(raw_wc, "w1")
        .select(
            F.col(id_col),
            F.col("m"),
            (term("t2", "t1") - term("c2", "c1")).alias("d"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("m").alias("n_scored_bigrams"),
        F.sum(F.col("m") * F.col("d")).alias("diff_fp9"),
    )


def two_sample_ks(
    df: DataFrame,
    group_cols: list[str],
    side_col: str,
    side_a: str,
    side_b: str,
    val_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per group — the
    distribution-shift test for "did source A's length/score profile
    drift from source B's", computed ENTIRELY in integers:
    D = max_x |F_a(x) − F_b(x)| over the pooled observed values, held
    as the integer numerator max_x |c_a(x)·n_b − c_b(x)·n_a| so no
    float ever crosses rows (convention #7; the fp6 ratio is one
    final fixed-order scalar per group).

    One aggregation to per-value side counts, one ordered window per
    group for the running ECDFs, one max — shuffle-aligned on the
    group key throughout. Groups missing either side are dropped
    (D undefined).

    Returns ``group_cols + (n_a, n_b, d_num, d_fp6)`` where
    ``D = d_num / (n_a · n_b)``.
    """
    from pyspark.sql import Window

    sided = df.filter(F.col(side_col).isin([side_a, side_b]))
    vals = sided.groupBy(*group_cols, F.col(val_col).alias("x")).agg(
        F.sum(
            F.when(F.col(side_col) == side_a, 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when(F.col(side_col) == side_b, 1).otherwise(0)
        ).alias("b"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vals.select(
        *group_cols,
        F.sum("a").over(w).alias("ca"),
        F.sum("b").over(w).alias("cb"),
    )
    tot = vals.groupBy(*group_cols).agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
    )
    gap = F.abs(
        F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")
    )
    return (
        cum.join(tot, group_cols)
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .groupBy(*group_cols, "n_a", "n_b")
        .agg(F.max(gap).cast("long").alias("d_num"))
        .select(
            *group_cols,
            "n_a",
            "n_b",
            "d_num",
            F.floor(
                F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b"))
                * F.lit(1e6)
            ).cast("long").alias("d_fp6"),
        )
    )
