"""Generate an sf1-EQUIVALENT synthetic slice (10× sf0.1 volume) for
scaling probes one decade past the driver's largest testdata.

Motivation (VERDICT r12 ask #4): at sf0.1 the scheduling floor
dominates and most 10×-data ratios sit under 2×, which proves little
about the genuinely data-proportional families. This tool materializes
the same ten-table star at 10× the sf0.1 row counts so
tools/decade_probe.py can measure sf0.1 → sf1 ratios where data cost
actually dominates.

Discipline: the synthetic_sku_profile generator rules — spark.range +
hash-derived attributes ONLY (executor-side, no driver lists, no RNG,
bit-reproducible on any partitioning). Distributions mirror the
measured sf0.1 profiles (same 31-word document vocabulary, 5-lang mix,
64 part names, 30-day event span, 1995–2001 order dates, 1–17 lines
per order, 64-dim label-clustered embeddings, ~0.2% exact-dup and ~2%
near-dup documents) so per-row work matches the driver data — only the
VOLUME changes. Fixed key spaces scale 10×: 150k customers, 10k
suppliers, 200k parts, 1.5M orders, ~6M lineitems, 1M events, 50k
docs, 20k vectors. nation/region stay the bounded dims they are.

Output: $TMPDIR/spark_graft_scratch/sf1/{table}.parquet — the same
layout load_table expects, so every registered query runs on it
unchanged via queries()[name](spark, SF1_DIR).

Usage: python tools/gen_sf1.py   (~20 s; idempotent, overwrites)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

# The sf0.1 document vocabulary, read once from the corpus (31 words).
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

N_CUST = 150_000
N_SUPP = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_EVENTS = 1_000_000
N_DOCS = 50_000
N_VECS = 20_000


def _h(salt: str, *cols):
    return F.xxhash64(F.lit(salt), *cols)


def _u(salt: str, *cols):
    """Uniform double in [0, 1), hash-derived."""
    return F.pmod(_h(salt, *cols), F.lit(1_000_000_007)) / 1_000_000_007.0


def _pick(salt: str, options: list[str], *cols):
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(_h(salt, *cols), F.lit(len(options))) + 1).cast("int"))


def _doc_text(idc):
    """Deterministic word-sequence text for a doc id expression —
    callable on ANY id column so dup/near-dup docs can re-render their
    source doc's text without a self-join."""
    n_words = (F.pmod(_h("dw", idc), F.lit(91)) + 10).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(
            F.array(*[F.lit(w) for w in VOCAB]),
            (F.pmod(F.xxhash64(F.lit("w"), idc, j), F.lit(len(VOCAB))) + 1).cast("int"),
        ),
    )
    return F.array_join(words, " ")


def main() -> None:
    out_dir = os.environ.get("SPARK_GRAFT_SF1_DIR")
    if not out_dir:
        from data_integration_and_visualization_uc3m_spark.scratch import scratch_dir
        out_dir = scratch_dir("sf1")
    from data_integration_and_visualization_uc3m_spark.session import get_spark

    spark = get_spark("gen_sf1")
    t0 = time.time()

    def w(df, name, parts):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"  {name}: written", flush=True)

    # bounded dims: copy verbatim (they are fixed-universe at any SF)
    for name in ("region", "nation"):
        w(spark.read.parquet(f"/root/testdata/sf0.1/{name}.parquet"), name, 1)

    cust = spark.range(N_CUST).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        F.pmod(_h("cn", F.col("id")), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(_u("cb", F.col("id")) * 11000 - 1000, 2).alias("c_acctbal"),
        _pick("cm", ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY"], F.col("id")).alias("c_mktsegment"),
    )
    w(cust, "customer", 4)

    supp = spark.range(N_SUPP).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        F.pmod(_h("sn", F.col("id")), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(_u("sb", F.col("id")) * 11000 - 1000, 2).alias("s_acctbal"),
    )
    w(supp, "supplier", 2)

    # 64 distinct p_names (8 adjectives x 8 nouns), as measured
    adjs = ["large", "hot", "small", "cold", "blue", "green", "lemon", "round"]
    nouns = ["ring", "bolt", "cap", "gear", "plate", "rod", "washer", "pin"]
    part = spark.range(N_PART).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            _pick("pa", adjs, F.col("id")), F.lit(" "),
            _pick("pn", nouns, F.col("id")),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 F.pmod(_h("pb", F.col("id")), F.lit(25)).cast("string")
                 ).alias("p_brand"),
        _pick("pt", ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
                     "STANDARD"], F.col("id")).alias("p_type"),
        (F.pmod(_h("ps", F.col("id")), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.pmod(_h("pr", F.col("id")), F.lit(1000)) / 10.0, 2
                ).alias("p_retailprice"),
    )
    w(part, "part", 4)

    orders = spark.range(N_ORDERS).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(_h("oc", F.col("id")), F.lit(N_CUST)).alias("o_custkey"),
        _pick("os", ["F", "O", "P"], F.col("id")).alias("o_orderstatus"),
        F.round(_u("op", F.col("id")) * 499000 + 1000, 2).alias("o_totalprice"),
        (F.to_timestamp(F.lit("1995-01-01"))
         + F.make_dt_interval(F.pmod(_h("od", F.col("id")), F.lit(2405)))
         ).alias("o_orderdate"),
        _pick("opr", ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"], F.col("id")).alias("o_orderpriority"),
    )
    w(orders, "orders", 8)

    # lineitem derives FROM orders (1-7 lines each, avg 4 -> ~6M) so FK
    # consistency and the measured 1-17 band both hold by construction.
    li = (
        spark.range(N_ORDERS)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(
                F.sequence(F.lit(1), (F.pmod(_h("ln", F.col("id")), F.lit(7)) + 1).cast("int"))
            ).alias("l_linenumber"),
        )
        .select(
            "l_orderkey",
            F.pmod(_h("lp", F.col("l_orderkey"), F.col("l_linenumber")),
                   F.lit(N_PART)).alias("l_partkey"),
            F.pmod(_h("ls", F.col("l_orderkey"), F.col("l_linenumber")),
                   F.lit(N_SUPP)).alias("l_suppkey"),
            F.col("l_linenumber").cast("int"),
            (F.pmod(_h("lq", F.col("l_orderkey"), F.col("l_linenumber")),
                    F.lit(50)) + 1).cast("double").alias("l_quantity"),
            F.round(_u("le", F.col("l_orderkey"), F.col("l_linenumber"))
                    * 104099 + 900, 2).alias("l_extendedprice"),
            (F.pmod(_h("ld", F.col("l_orderkey"), F.col("l_linenumber")),
                    F.lit(11)) / 100.0).alias("l_discount"),
            (F.pmod(_h("lt", F.col("l_orderkey"), F.col("l_linenumber")),
                    F.lit(9)) / 100.0).alias("l_tax"),
            _pick("lr", ["A", "N", "R"], F.col("l_orderkey"),
                  F.col("l_linenumber")).alias("l_returnflag"),
            _pick("ll", ["F", "O"], F.col("l_orderkey"),
                  F.col("l_linenumber")).alias("l_linestatus"),
            (F.to_timestamp(F.lit("1995-01-01"))
             + F.make_dt_interval(
                 F.pmod(_h("od", F.col("l_orderkey")), F.lit(2405))
                 + F.pmod(_h("lsd", F.col("l_orderkey"),
                              F.col("l_linenumber")), F.lit(95)) + 1)
             ).alias("l_shipdate"),
        )
    )
    w(li, "lineitem", 16)

    events = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit("2024-01-01"))
         + F.make_dt_interval(
             F.lit(0), F.lit(0), F.lit(0),
             F.pmod(_h("et", F.col("id")), F.lit(2_592_000))
             + F.pmod(_h("eu2", F.col("id")), F.lit(1_000_000)) / 1e6)
         ).alias("ts"),
        F.pmod(_h("eu", F.col("id")), F.lit(15_000)).alias("user_id"),
        _pick("ee", ["click", "error", "purchase", "signup", "view"],
              F.col("id")).alias("event_type"),
        F.round(_u("ev", F.col("id")) * 560, 2).alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(_h("ek", F.col("id")), F.lit(100))
        ).alias("props"),
    )
    w(events, "events", 8)

    # documents: ~0.2% exact dups + ~2% near dups (one word appended),
    # source doc chosen deterministically among earlier ids.
    idc = F.col("id")
    dup_sel = F.pmod(_h("dup", idc), F.lit(500))
    src_id = F.when(idc > 0, F.pmod(_h("dsrc", idc), idc)).otherwise(F.lit(0))
    base_text = _doc_text(idc)
    text = (
        F.when(dup_sel == 0, _doc_text(src_id))  # exact dup of src
        .when(dup_sel < 11,                       # near dup: one extra word
              F.concat(_doc_text(src_id), F.lit(" "),
                       F.element_at(F.array(*[F.lit(w) for w in VOCAB]),
                                    (F.pmod(_h("nw", idc), F.lit(len(VOCAB))) + 1).cast("int"))))
        .otherwise(base_text)
    )
    docs = spark.range(N_DOCS).select(
        idc.alias("doc_id"),
        text.alias("text"),
        # en-heavy mix as measured (~41% en, rest ~15% each)
        F.when(F.pmod(_h("dl", idc), F.lit(100)) < 41, F.lit("en"))
        .otherwise(_pick("dl2", ["de", "es", "fr", "zh"], idc)).alias("lang"),
        F.concat(F.lit("src"),
                 F.pmod(_h("dsx", idc), F.lit(20)).cast("string")).alias("source"),
        F.length(text).alias("n_chars"),
    )
    w(docs, "documents", 4)

    # embeddings: near-INDEPENDENT uniform components (the driver
    # data's measured profile — random-pair cosine ~N(0, 1/sqrt(64)),
    # within-cell near-dup density 0.1%, NOT label-clustered: a first
    # cut with strong label centroids pushed blocked-pair density to
    # 62% and made every semdedup probe quadratic-in-output, which the
    # driver data refutes) + ~1.5% injected near-dups (source vector's
    # components with small jitter), mirroring the documents table's
    # dup discipline. Label keeps a faint offset so classifiers have
    # signal without creating cosine-0.4 neighborhoods.
    vid = F.col("id")
    label = F.pmod(_h("el", vid), F.lit(10)).cast("int")

    def _comp(idc):
        return F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: (
                (F.pmod(F.xxhash64(F.lit("en"), idc, j), F.lit(1_000_033))
                 / 1_000_033.0 - 0.5) * 1.15
                + (F.pmod(F.xxhash64(F.lit("ec"), F.pmod(F.xxhash64(F.lit("el"), idc), F.lit(10)), j),
                          F.lit(1_000_003)) / 1_000_003.0 - 0.5) * 0.1
            ),
        )

    vdup_sel = F.pmod(_h("vdup", vid), F.lit(1000))
    vsrc = F.when(vid > 0, F.pmod(_h("vdsrc", vid), vid)).otherwise(F.lit(0))
    emb = F.when(
        vdup_sel < 15,
        F.zip_with(
            _comp(vsrc),
            F.sequence(F.lit(1), F.lit(64)),
            lambda x, j: x + (F.pmod(F.xxhash64(F.lit("vj"), vid, j),
                                     F.lit(1_000_003)) / 1_000_003.0 - 0.5) * 0.04,
        ),
    ).otherwise(_comp(vid))
    vecs = spark.range(N_VECS).select(
        vid.alias("vec_id"),
        F.transform(emb, lambda x: x.cast("float")).alias("embedding"),
        label.alias("label"),
    )
    w(vecs, "embeddings", 2)

    print(f"sf1 slice at {out_dir} in {time.time() - t0:.1f}s")
    for name in ("customer", "supplier", "part", "orders", "lineitem",
                 "events", "documents", "embeddings"):
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"  {name}: {n:,} rows")


if __name__ == "__main__":
    main()
