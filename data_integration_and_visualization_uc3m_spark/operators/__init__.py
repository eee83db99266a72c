"""Composable DataFrame→DataFrame operators (SURVEY.md §2 inventory).

Each module maps a category of the reference's operator surface to
idiomatic, Catalyst-friendly Spark:

    cleaning    C1-C6: normalize, coercing casts, missing markers, rounding
    filters     F1-F8: membership/length/range/conjunctive predicates
    joins       J1-J4: validated m2o join, broadcast lookup with fallback
    dedup       A1/A2 + exact/minhash/simhash/jaccard document dedup,
                content-defined (FastCDC-style) chunking
    validate    V1-V5: NOT NULL / UNIQUE / FK / range violation sets
    upsert      K2: conflict-ignoring idempotent upsert (anti-join append)
    slicing     F8/C9/§2.8: deterministic slices, top-k, bucketize, windows
    similarity  embedding cosine top-k, LSH bucketing (scale path),
                late-interaction MaxSim retrieval
    text        language-ID, quality score, token counts, fingerprints,
                TF-IDF top terms, PII redaction, context chunking
    multimodal  binary-column plumbing (decode/resize stubs, frame and
                audio-chunk expansion — real Spark shape)
    sampling    deterministic md5 sampling + training-order shuffle
    packing     contiguous sequence packing + payload materialization,
                max_len pad-vs-fragmentation sweep
    cdc         snapshot diff + incremental aggregate maintenance
    skew        salted aggregation/join, key histograms
    history     SCD2 content-hash change tracking
    skyline     Pareto frontier (two-phase local/global)
    timeseries  daily-grid resample + forward-fill (no range join)
    mixing      corpus composition plan + md5-threshold materialization
    graph       fixed-point weighted PageRank (iterative, bit-exact)
    linkage     entity resolution: length-band blocked fuzzy value match
    web         URL canonicalization, re-crawl dedup, domain profiling
    telemetry   observed-metrics quality counters (zero-extra-scan V1/V4)
"""
