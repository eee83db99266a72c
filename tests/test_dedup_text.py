"""Document dedup (exact/Jaccard/MinHash/SimHash) and text analysis."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_visualization_uc3m_spark.operators import dedup, text


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(spark):
    d = docs(spark, [(1, "same text"), (5, "same text"), (3, "other")])
    got = {r.keep_id: r.n_copies for r in dedup.exact_dedup(d).collect()}
    assert got == {1: 2, 3: 1}


def test_jaccard_pairs_exact_value(spark):
    # A={a,b,c,d}, B={a,b,c,e} → |∩|=3, |∪|=5 → 0.6
    d = docs(spark, [(1, "a b c d"), (2, "a b c e"), (3, "z z z")])
    sets = dedup.token_set(d)
    got = dedup.jaccard_pairs(sets, threshold=0.5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert abs(r.jaccard - 0.6) < 1e-12


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " extra"
    far = "completely different words in this one entirely unrelated stuff"
    d = docs(spark, [(1, base), (2, near), (3, far)])
    sigs = dedup.minhash_signatures(dedup.token_set(d), num_hashes=16)
    assert sigs.count() == 3  # wide: one row per doc
    assert len(sigs.columns) == 17  # id + 16 signature columns
    cands = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4).collect()
    pairs = {(r.id_a, r.id_b) for r in cands}
    assert (1, 2) in pairs  # near-dup pair bucketed together
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_identical_docs_equal_near_docs_close(spark):
    base = "spark engine query plan optimizer shuffle partition broadcast"
    d = docs(spark, [(1, base), (2, base), (3, base + " tweak"), (4, "xyz unrelated")])
    got = {r.doc_id: r.simhash for r in dedup.simhash(d, bits=32).collect()}
    assert got[1] == got[2]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(got[1], got[3]) <= 8
    assert ham(got[1], got[4]) > ham(got[1], got[3])


def test_connected_components_and_survivors(spark):
    # chain a-b-c + isolated pair (d,e): two clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    cc = {r.doc_id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    all_docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11]], "doc_id long")
    kept = sorted(
        r.doc_id
        for r in dedup.dedup_survivors(
            all_docs, dedup.connected_components(pairs)
        ).collect()
    )
    assert kept == [1, 4, 10]  # one survivor per cluster + untouched doc


def test_connected_components_frees_superseded_blocks(spark):
    # each round's localCheckpoint blocks must be freed once superseded
    # (only the final checkpoint backing the result may remain) — left
    # alone they accumulate across a session and degrade later queries
    # 3-5x until a driver full GC happens to run
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    # a 4-chain needs >1 propagation round => >1 superseded checkpoint
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    out = dedup.connected_components(pairs)
    assert {r.cluster_id for r in out.collect()} == {1}
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, f"leaked {after - before} persistent RDDs"
    # the survivor checkpoint still serves reads
    assert out.count() == 5


def test_ngram_set_shingles(spark):
    d = docs(spark, [(1, "a b c d")])
    got = sorted(r.shingle for r in dedup.ngram_set(d, n=3).collect())
    assert got == ["a b c", "b c d"]


def test_token_stats(spark):
    d = docs(spark, [(1, "one two two three")])
    r = text.token_stats(d).collect()[0]
    assert (r.n_chars, r.n_tokens, r.n_unique_tokens) == (17, 4, 3)
    assert r.approx_bpe_tokens == 5  # ceil(17/4)


def test_quality_score_components(spark):
    d = docs(spark, [(1, "the cat sat")])  # 3 tokens → len_ok=0
    r = text.quality_score(d).collect()[0]
    assert r.n_tokens == 3
    assert abs(r.type_token_ratio - 1.0) < 1e-12
    assert abs(r.stopword_ratio - 1 / 3) < 1e-12
    assert abs(r.quality_score - (0.3 * 1.0 + 0.3 / 3)) < 1e-12


def test_lang_id_tiebreak_deterministic(spark):
    d = spark.createDataFrame(
        [(1, "xq zz", "en"), (2, "el la de que y", "es")],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r.predicted_lang for r in text.lang_id(d).collect()}
    assert got[1] == "de"  # all-zero hits → alphabetical first
    assert got[2] == "es"


def test_winnowing_shares_fingerprints_on_overlap(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = docs(
        spark,
        [(1, "x y " + shared), (2, shared + " p q"), (3, "totally different words here now ok")],
    )
    got = {r.doc_id: r.fingerprint for r in text.winnowing_fingerprint(d).collect()}
    # overlapping docs share most kept hashes but full fingerprint differs
    assert got[1] != got[3]
    kept = text.winnowing_fingerprint(d, window=4).select("doc_id", "n_kept").collect()
    assert all(r.n_kept >= 1 for r in kept)


def test_decontamination_flags_overlapping_docs(spark):
    bench = docs(spark, [(100, "secret eval question answer")])
    corpus = docs(
        spark,
        [
            (1, "prefix secret eval question answer suffix"),  # contains bench 3-grams
            (2, "totally unrelated corpus document text"),
        ],
    )
    bsets = dedup.ngram_set(bench, n=3)
    csets = dedup.ngram_set(corpus, n=3)
    hits = {r.doc_id: r.n_contaminated for r in dedup.contaminated_docs(csets, bsets).collect()}
    assert 1 in hits and hits[1] >= 2
    assert 2 not in hits
    clean = dedup.decontaminate(corpus, csets, bsets)
    assert [r.doc_id for r in clean.collect()] == [2]


def test_pii_redaction_counts_and_order(spark):
    d = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.com and ip 10.0.0.1 and card 123456789"),
            (2, "clean text with short 123 digits"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text.redact_pii(d).collect()}
    r1 = got[1]
    assert (r1.n_email, r1.n_ipv4, r1.n_long_digits) == (1, 1, 1)
    assert r1.redacted == "mail <email> and ip <ipv4> and card <long_digits>"
    r2 = got[2]
    assert (r2.n_email, r2.n_ipv4, r2.n_long_digits) == (0, 0, 0)
    assert r2.redacted == "clean text with short 123 digits"
    # an email's digits must not double-count as a digit run
    d3 = spark.createDataFrame([(3, "x 123456789@example.com y")], "doc_id long, text string")
    r3 = text.redact_pii(d3).collect()[0]
    assert (r3.n_email, r3.n_long_digits) == (1, 0)
    assert r3.redacted == "x <email> y"


def test_chunk_text_exact_cover_and_overlap(spark):
    d = docs(spark, [(1, "abcdefghij"), (2, ""), (3, "xy")])
    got = {}
    for r in text.chunk_text(d, chunk_chars=4).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_index, r.chunk))
    assert sorted(got[1]) == [(0, "abcd"), (1, "efgh"), (2, "ij")]
    assert sorted(got[2]) == [(0, "")]
    assert sorted(got[3]) == [(0, "xy")]
    # overlap: starts step by chunk-overlap
    ov = {}
    for r in text.chunk_text(d.filter("doc_id = 1"), chunk_chars=4, overlap=2).collect():
        ov.setdefault(r.doc_id, []).append((r.chunk_index, r.chunk))
    assert sorted(ov[1])[:3] == [(0, "abcd"), (1, "cdef"), (2, "efgh")]


# --- MinHash-LSH recall against engineered ground truth -------------------
#
# The oracle gate proves the LSH pipeline computes what it claims; this
# test pins down WHAT the default S-curve parameters deliver. With
# b=4 bands × r=4 rows (the dedup_minhash_lsh defaults),
# P(candidate | Jaccard s) = 1 - (1 - s^4)^4:
#     s = 0.905  →  0.988   (high-sim near-dups: must be caught)
#     s = 0.50   →  0.2275  (borderline: mostly BELOW the curve's knee)
# So the documented contract is: recall ≈ 1 for true near-dups
# (s ≳ 0.9), deliberately low at s = 0.5 — callers wanting recall at
# 0.5 must raise bands (e.g. b=8, r=2 → P(0.5) = 0.90) or verify with
# the exact jaccard_pairs pass.


def _engineered_sets(spark):
    """60 doc-pair islands with exact, constructed Jaccard:
    30 pairs at J = 38/42 ≈ 0.905 and 30 at J = 26/52 = 0.5.
    Tokens are namespaced per pair, so cross-pair Jaccard is 0."""
    rows = []
    high, border = [], []
    for i in range(30):
        a, b = 2 * i, 2 * i + 1
        high.append((a, b))
        shared = [f"h{i}_s{j}" for j in range(38)]
        for d, tag in ((a, "a"), (b, "b")):
            for t in shared + [f"h{i}_{tag}{u}" for u in range(2)]:
                rows.append((d, t))
    for i in range(30):
        a, b = 1000 + 2 * i, 1000 + 2 * i + 1
        border.append((a, b))
        shared = [f"m{i}_s{j}" for j in range(26)]
        for d, tag in ((a, "a"), (b, "b")):
            for t in shared + [f"m{i}_{tag}{u}" for u in range(13)]:
                rows.append((d, t))
    sets_df = spark.createDataFrame(rows, "doc_id long, token string")
    return sets_df, set(high), set(border)


def test_minhash_lsh_recall_matches_s_curve(spark):
    sets_df, high, border = _engineered_sets(spark)
    sigs = dedup.minhash_signatures(sets_df, num_hashes=16)
    cand = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4).collect()
    }
    # no false positives across islands: md5 band buckets don't collide
    assert cand <= (high | border)
    # high-sim recall: theory 0.988 over 30 pairs ⇒ allow one miss + noise
    high_recall = len(cand & high) / len(high)
    assert high_recall >= 0.9, f"high-sim recall {high_recall}"
    # borderline: theory 0.2275 ⇒ assert the curve's knee is where the
    # formula says, not accidentally high or zero (wide deterministic
    # band: the seeded-md5 outcome is fixed, this documents the regime)
    border_recall = len(cand & border) / len(border)
    assert 0.03 <= border_recall <= 0.6, f"borderline recall {border_recall}"


def test_minhash_lsh_pipeline_clusters_true_near_dups(spark):
    # end-to-end: candidates → exact-Jaccard verify (≥0.5) → components.
    # Every verified pair must land in one cluster with its twin.
    sets_df, high, _ = _engineered_sets(spark)
    sigs = dedup.minhash_signatures(sets_df, num_hashes=16)
    cand = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    exact = dedup.jaccard_pairs(sets_df, threshold=0.5)
    verified = cand.join(exact, ["id_a", "id_b"], "inner")
    clusters = dedup.connected_components(verified.select("id_a", "id_b"))
    label = {r.doc_id: r.cluster_id for r in clusters.collect()}
    caught = {(r.id_a, r.id_b) for r in verified.collect()}
    assert caught  # non-empty by the recall assertion above
    for a, b in caught:
        assert label[a] == label[b] == min(a, b)


def test_gopher_rules_edges(spark):
    d = docs(
        spark,
        [
            (1, "the cat sat on the mat and looked to the open door in it is a that " * 3),
            (2, ""),                     # empty: everything null/false
            (3, "x " * 30),              # no stopwords, degenerate distinct ratio
            (4, "supercalifragilistic " * 25),  # mean word length out of range
        ],
    )
    got = {r.doc_id: r for r in text.gopher_rules(d, min_words=10).collect()}
    assert got[1].keep is True
    assert got[2].n_words == 0 and got[2].keep is False
    assert got[2].mean_word_len is None and got[2].distinct_ratio is None
    assert got[3].stop_ok is False and got[3].distinct_ok is False
    assert got[3].keep is False
    assert got[4].mwl_ok is False and got[4].keep is False


def test_containment_pairs_asymmetric(spark):
    # doc 2 is a strict subset of doc 1 (quote inclusion): containment
    # = 1.0 while jaccard is only 3/10 — the pair Jaccard misses.
    sets_df = spark.createDataFrame(
        [(1, f"s{i}") for i in range(10)] + [(2, f"s{i}") for i in range(3)]
        + [(3, "zz")],
        "doc_id long, shingle string",
    )
    got = dedup.containment_pairs(sets_df, threshold=0.8).collect()
    assert [(r.id_a, r.id_b, r.containment) for r in got] == [(1, 2, 1.0)]
    # jaccard at the same threshold finds nothing
    assert (
        dedup.jaccard_pairs(sets_df, item_col="shingle", threshold=0.8).count()
        == 0
    )


def test_prefix_filter_matches_plain_jaccard(spark):
    """Prefix filtering is an exact optimization: same pair set as the
    all-shared-items join, with candidates drawn only from rarest-first
    prefixes."""
    d = docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),   # near-dup of 1
            (3, "p q r s t u v w"),
            (4, "p q r s t u v z"),   # near-dup of 3
            (5, "a p m n o k l j"),   # shares only hot singles
        ],
    )
    sets = dedup.ngram_set(d, n=3)
    plain = {
        (r.id_a, r.id_b, r.n_common, round(r.jaccard, 9))
        for r in dedup.jaccard_pairs(sets, item_col="shingle", threshold=0.5).collect()
    }
    pf = {
        (r.id_a, r.id_b, r.n_common, round(r.jaccard, 9))
        for r in dedup.prefix_filter_jaccard_pairs(
            sets, item_col="shingle", threshold=0.5
        ).collect()
    }
    assert pf == plain
    assert len(pf) == 2  # (1,2) and (3,4)


# ------------------------------------------------------- chunk dup profile


def test_chunk_dup_stats_shared_chunk(spark):
    from data_integration_and_visualization_uc3m_spark.operators import text as T

    shared = "a b c d e"  # one exact 5-word chunk shared by docs 1 and 2
    rows = [
        (1, shared + " x y z"),     # chunks: "a b c d e", "x y z"
        (2, shared),                 # chunk:  "a b c d e"
        (3, "p q r s t u v w"),      # chunks: "p q r s t", "u v w" — unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_chunk_fraction)
        for r in T.chunk_dup_stats(df, chunk_words=5).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (1, 1, 1.0)
    assert got[3] == (2, 0, 0.0)


def test_chunk_dup_stats_short_doc_single_chunk(spark):
    from data_integration_and_visualization_uc3m_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "only three words"), (2, "")], "doc_id long, text string"
    )
    rows = T.chunk_dup_stats(df, chunk_words=5).collect()
    got = {r.doc_id: r.n_chunks for r in rows}
    assert got == {1: 1}  # empty doc contributes no chunks at all


# ----------------------------------------------------------- bigram lift


def test_bigram_lift_counts_and_score(spark):
    from data_integration_and_visualization_uc3m_spark.operators import text as T

    # corpus: "x y" always adjacent (3 times), fillers break other pairs
    rows = [(1, "x y q x y"), (2, "x y q q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = T.bigram_lift(df, min_pair_count=3, k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.w1, r.w2, r.n_pair) == ("x", "y", 3)
    # unigrams: doc1 has x2 y2 q1, doc2 has x1 y1 q2 -> x=3 y=3 q=3, n_uni=9
    # bigrams: doc1 yields 4, doc2 yields 3 -> n_bi=7
    assert (r.n_w1, r.n_w2) == (3, 3)
    expected = (3.0 * 9 * 9) / 7 / 3 / 3
    assert r.lift == expected


def test_bigram_lift_respects_floor_and_k(spark):
    from data_integration_and_visualization_uc3m_spark.operators import text as T

    df = spark.createDataFrame([(1, "a b a b c d")], "doc_id long, text string")
    # all pairs occur < 3 times -> empty under the default floor
    assert T.bigram_lift(df, min_pair_count=3, k=5).count() == 0
    all_pairs = T.bigram_lift(df, min_pair_count=1, k=2).collect()
    assert len(all_pairs) == 2  # k caps the output


def test_char_gram_set_window_count_and_short_doc(spark):
    d = docs(spark, [(1, "abcdefgh"), (2, "ab")])
    got = (
        dedup.char_gram_set(d, k=5)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {r.doc_id: r.n for r in got}
    # len 8, k 5 → 4 windows; doc shorter than k → its whole text, 1 window
    assert counts == {1: 4, 2: 1}


def test_exact_substring_pairs_shared_verbatim_window(spark):
    shared = "THIS EXACT RUN OF CHARACTERS IS SHARED"
    d = docs(
        spark,
        [
            (1, "prefix one " + shared + " tail a"),
            (2, "other start " + shared + " tail b"),
            (3, "nothing in common with the rest at all"),
        ],
    )
    got = dedup.exact_substring_pairs(d, k=20, max_df_frac=1.0).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    row = next(r for r in got if (r.id_a, r.id_b) == (1, 2))
    # the full common run is " " + shared + " tail " (45 chars, both docs
    # continue with ' tail'): 45 - 20 + 1 = 26 shared windows
    assert row.n_common == 26


def test_exact_substring_pairs_df_cap_drops_boilerplate(spark):
    # the same window in EVERY doc is boilerplate → capped out, no pairs
    d = docs(spark, [(i, "IDENTICAL BOILERPLATE LINE") for i in range(1, 6)])
    got = dedup.exact_substring_pairs(d, k=10, max_df_frac=0.5).collect()
    assert got == []


def test_split_leakage_pairs_only_cross_split(spark):
    from data_integration_and_visualization_uc3m_spark.operators.sampling import (
        HASH_SPACE,
        hash_bucket,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" tail{i % 2}") for i in range(1, 9)]
    d = docs(spark, rows)
    # ground-truth splits via the same hash primitive
    frac = 0.5
    splits = {
        r.doc_id: ("holdout" if r.b < int(frac * HASH_SPACE) else "train")
        for r in d.select(
            "doc_id", hash_bucket(F.col("doc_id"), "split").alias("b")
        ).collect()
    }
    got = dedup.split_leakage_pairs(
        d, holdout_frac=frac, seed="split", threshold=0.8
    ).collect()
    assert got, "near-identical docs across splits must produce leak rows"
    for r in got:
        assert r.split_a != r.split_b
        assert splits[r.id_a] == r.split_a and splits[r.id_b] == r.split_b
        assert r.jaccard >= 0.8


def test_strip_boilerplate_removes_high_df_tokens_in_order(spark):
    d = docs(
        spark,
        [
            (1, "header alpha beta header"),
            (2, "header gamma delta"),
            (3, "header epsilon zeta"),
        ],
    )
    got = {r.doc_id: r for r in text.strip_boilerplate(d, max_df_frac=0.5).collect()}
    # 'header' in 3/3 docs > 50% → stripped everywhere, incl. repeats
    assert got[1].cleaned_text == "alpha beta"
    assert (got[1].n_tokens_before, got[1].n_tokens_after) == (4, 2)
    assert got[2].cleaned_text == "gamma delta"
    # nothing over threshold → untouched text
    unique = docs(spark, [(1, "aa bb"), (2, "cc dd"), (3, "ee ff")])
    kept = {r.doc_id: r.cleaned_text for r in text.strip_boilerplate(unique, 0.5).collect()}
    assert kept == {1: "aa bb", 2: "cc dd", 3: "ee ff"}


def test_cooccurrence_lift_exact_ratios(spark):
    # baskets: parts 1,2 together twice; 1,3 once
    rows = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 3),
        (12, 1),  # duplicate (basket, part) must not inflate counts
    ]
    df = spark.createDataFrame(rows, "bid long, pid long")
    got = {
        (r.id_a, r.id_b): r
        for r in dedup.cooccurrence_lift_pairs(
            df, id_col="pid", item_col="bid", min_co=2
        ).collect()
    }
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert (r.co, r.n_a, r.n_b) == (2, 3, 2)
    assert abs(r.support - 2 / 3) < 1e-12
    assert abs(r.conf_a_to_b - 2 / 3) < 1e-12
    assert abs(r.lift - (2 * 3) / (3 * 2)) < 1e-12


def test_bpe_train_merges_known_sequence(spark):
    # words: 'aaab' ×2, 'ab' ×1.
    # step 1: (a,a) freq 4 → aa   ('aaab' → aa·a·b, left-to-right)
    # step 2: (a,b) freq 3 beats (aa,a) freq 2 → ab
    # step 3: (aa,ab) freq 2 → aaab; then no pairs remain → early stop
    d = docs(spark, [(1, "aaab aaab"), (2, "ab")])
    got = text.bpe_train_merges(d, n_merges=4).collect()
    seq = [(r.step, r.lhs, r.rhs, r.merged, r.freq) for r in sorted(got, key=lambda r: r.step)]
    assert seq == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 2),
    ]


def test_dsir_score_prefers_target_like_docs(spark):
    from data_integration_and_visualization_uc3m_spark.operators import corpus_stats

    # target domain speaks "x y"; off-domain speaks "p q"; doc 5 mixes
    rows = [
        (1, "x y x y x y", "t"),
        (2, "x y x y", "t"),
        (3, "p q p q p q", "r"),
        (4, "p q p q", "r"),
        (5, "x y p q", "r"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, src string")
    got = {
        r.doc_id: r
        for r in corpus_stats.dsir_score(
            d, F.col("src") == "t"
        ).collect()
    }
    # pure off-domain bigrams have no target support → doc 3/4 drop out
    assert 3 not in got and 4 not in got
    # target-like docs score strictly higher per-bigram than the mixed doc
    assert got[1].diff_fp9 > 0 and got[2].diff_fp9 > 0
    assert got[5].n_scored_bigrams < got[1].n_scored_bigrams
    # the mixed doc's scored bigrams are the same target-supported ones,
    # so its per-bigram ratio matches — but total mass is smaller
    assert got[5].diff_fp9 <= got[1].diff_fp9


def test_content_defined_chunks_shift_robust(spark):
    """The CDC property: prepending one character re-chunks only the
    neighborhood of the edit — most chunk hashes survive, which is why
    shared-chunk rate is a shift-robust duplication signal (fixed-width
    windows would share zero full chunks after the shift)."""
    from data_integration_and_visualization_uc3m_spark.operators.dedup import content_defined_chunks

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the pipeline chunks bytes by content not by position "
        "so a single shifted byte cannot cascade through the stream"
    ) * 3
    df = spark.createDataFrame(
        [(1, base), (2, "X" + base)], "doc_id long, text string"
    )
    chunks = content_defined_chunks(df, window=8).collect()
    a = [r.chash for r in chunks if r.doc_id == 1]
    b = [r.chash for r in chunks if r.doc_id == 2]
    assert len(a) > 5  # the boundary rate actually fired
    shared = set(a) & set(b)
    # everything after the first boundary re-synchronizes, so all
    # DISTINCT chunks except the edited head chunk are shared (the
    # repeated base text collapses occurrences within each doc)
    assert len(shared) >= len(set(a)) - 2
    # chunk lengths tile the document exactly
    assert sum(r.clen for r in chunks if r.doc_id == 1) == len(base)
    assert sum(r.clen for r in chunks if r.doc_id == 2) == len(base) + 1


def test_content_defined_chunks_short_doc_single_chunk(spark):
    from data_integration_and_visualization_uc3m_spark.operators.dedup import content_defined_chunks

    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    rows = content_defined_chunks(df, window=8).collect()
    assert len(rows) == 1 and rows[0].clen == 4


def test_incremental_dedup_assign_known_answers(spark, tmp_path):
    """Frozen-index probe: odd doc 1 duplicates BOTH even docs 0 and 2
    (identical text, so all four bands match each) -> n_candidates must
    be 2 (one per OLD DOC, not per band — pins first-shared-band
    emission), best match is the smaller old id at exact Jaccard 1.
    Odd doc 3 is unique -> zero candidates, null match, not a dup."""
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = str(tmp_path)
    t1 = "the quick brown fox jumps over the lazy dog"
    t3 = "nothing here matches any other sentence at all whatsoever"
    spark.createDataFrame(
        [
            (0, t1, "en", "s1", len(t1)),
            (2, t1, "en", "s1", len(t1)),
            (4, "completely different filler words occupy this row",
             "en", "s1", 49),
            (1, t1, "en", "s1", len(t1)),
            (3, t3, "en", "s1", len(t3)),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r.doc_id: r for r in
            Q.REGISTRY["incremental_dedup_assign"].fn(spark, sf).collect()}
    assert set(rows) == {1, 3}  # only the new (odd) batch is reported
    d1 = rows[1]
    assert d1.n_candidates == 2
    assert d1.best_match_id == 0  # Jaccard tie -> smaller old id
    assert d1.best_j_micro == 1_000_000
    assert d1.is_dup is True
    d3 = rows[3]
    assert d3.n_candidates == 0
    assert d3.best_match_id is None and d3.best_j_micro is None
    assert d3.is_dup is False


def test_lsh_recall_report_truth_sample_frac(spark):
    """The production sampling knob: restricting both arms to a
    deterministic hash stratum must (a) still produce one well-formed
    report row, (b) count no more truth pairs than the full run, and
    (c) be reproducible (hash sampling, not RNG)."""
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    full = Q.lsh_recall_report(spark, sf).collect()[0]
    a = Q.lsh_recall_report(spark, sf, truth_sample_frac=0.5).collect()[0]
    b = Q.lsh_recall_report(spark, sf, truth_sample_frac=0.5).collect()[0]
    assert a == b  # deterministic
    assert a["n_truth_pairs"] <= full["n_truth_pairs"]
    assert a["n_candidates"] <= full["n_candidates"]
    assert 0 <= a["n_candidates_true"] <= a["n_candidates"]
