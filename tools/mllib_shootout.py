"""Stock MLlib MinHashLSH vs this engine's md5-banded MinHash-LSH.

SURVEY §7.3 said "stock MLlib MinHashLSH first" for similarity-join
strategy; this harness records why the engine ships its own
construction instead:

1. MLlib's hash seeds are driver-random unless the pipeline is
   refit from a saved model — re-runs on another session give a
   DIFFERENT candidate set (oracle-unfriendly); the engine's
   md5(seed:shingle) signatures are bit-stable everywhere.
2. approxSimilarityJoin keys candidates on (band hash) via an
   internal explode+join like ours, but its Jaccard distance is
   recomputed on sparse ML vectors (CountVectorizer vocabulary
   build = one extra full scan + a fit on the driver).
3. The engine's first-shared-band emission avoids the distinct()
   over the candidate set; MLlib deduplicates pairs post-join.

Usage: python tools/mllib_shootout.py [sf_dir]
Prints one JSON line: runtimes + pair counts + agreement on the
verified (Jaccard >= 0.5) pair set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def main() -> None:
    from pyspark.ml.feature import CountVectorizer, MinHashLSH
    from pyspark.sql import functions as F

    from data_integration_and_visualization_uc3m_spark.operators import dedup
    from data_integration_and_visualization_uc3m_spark.session import get_spark
    from data_integration_and_visualization_uc3m_spark.sources.readers import load_table

    spark = get_spark("mllib-shootout")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents", respread=True)

    # --- engine path: shingles -> md5 minhash -> banded candidates ->
    # exact-verified pairs (the dedup_minhash_lsh query shape)
    t0 = time.perf_counter()
    sets = dedup.ngram_set(docs, n=3)
    sigs = dedup.minhash_signatures(sets, num_hashes=16, item_col="shingle")
    cand = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    exact = dedup.jaccard_pairs(sets, item_col="shingle", threshold=0.5)
    engine_pairs = cand.join(exact, ["id_a", "id_b"]).select("id_a", "id_b")
    n_engine = engine_pairs.count()
    engine_s = time.perf_counter() - t0

    # --- MLlib path: tokens -> CountVectorizer(binary) -> MinHashLSH
    # approxSimilarityJoin at the S-curve-equivalent distance threshold
    t0 = time.perf_counter()
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != F.lit(""))
        ).alias("tokens"),
    )
    cv = CountVectorizer(inputCol="tokens", outputCol="features", binary=True)
    model = cv.fit(toks)
    feats = model.transform(toks).filter(
        F.expr("aggregate(tokens, 0, (a, x) -> a + 1) > 0")
    )
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    mh_model = mh.fit(feats)
    joined = mh_model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    mllib_pairs = (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
        )
    )
    n_mllib = mllib_pairs.count()
    mllib_s = time.perf_counter() - t0

    # NB: not apples-to-apples on SEMANTICS — MLlib joins on token sets
    # (unigram Jaccard), the engine on 3-gram shingles — but both
    # answer "near-dup pairs at >= 0.5 similarity" and that is how a
    # user would reach for each. Overlap reported for context; all
    # counting is distributed (no driver collect of the pair sets).
    both = engine_pairs.join(mllib_pairs, ["id_a", "id_b"]).count()
    out = {
        "sf_dir": SF_DIR,
        "engine_seconds": round(engine_s, 2),
        "mllib_seconds": round(mllib_s, 2),
        "engine_pairs": n_engine,
        "mllib_pairs": n_mllib,
        "pairs_in_both": both,
        "notes": "engine=3-gram shingles md5-stable; mllib=unigram CV+MinHashLSH seed=42",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
