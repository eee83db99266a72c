"""Unit tests for sequence packing, stop-shingle df-capping, and
TF-IDF top-terms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_and_visualization_uc3m_spark.operators import dedup, packing, text


class TestPackContiguous:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, shard string, tokens long")

    def test_bins_fill_in_order(self, spark):
        df = self._docs(
            spark,
            [(1, "en", 600), (2, "en", 600), (3, "en", 600), (4, "en", 600)],
        )
        got = {
            r.doc_id: (r.seq_offset, r.seq_no)
            for r in packing.pack_contiguous(
                df, budget=1000, tokens_col="tokens", shard_col="shard"
            ).collect()
        }
        # start offsets 0,600,1200,1800 → bins 0,0,1,1
        assert got == {1: (0, 0), 2: (600, 0), 3: (1200, 1), 4: (1800, 1)}

    def test_shards_pack_independently(self, spark):
        df = self._docs(spark, [(1, "en", 900), (2, "fr", 900), (3, "fr", 900)])
        got = {
            r.doc_id: r.seq_no
            for r in packing.pack_contiguous(
                df, budget=1000, tokens_col="tokens", shard_col="shard"
            ).collect()
        }
        # fr restarts at offset 0: doc 3 starts at 900 → still bin 0
        assert got == {1: 0, 2: 0, 3: 0}

    def test_oversized_doc_owns_start_bin(self, spark):
        df = self._docs(spark, [(1, "en", 5000), (2, "en", 10)])
        got = {
            r.doc_id: (r.seq_offset, r.seq_no)
            for r in packing.pack_contiguous(
                df, budget=1000, tokens_col="tokens", shard_col="shard"
            ).collect()
        }
        assert got == {1: (0, 0), 2: (5000, 5)}

    def test_stats_roll_up(self, spark):
        df = self._docs(spark, [(1, "en", 600), (2, "en", 600), (3, "fr", 10)])
        packed = packing.pack_contiguous(
            df, budget=1000, tokens_col="tokens", shard_col="shard"
        )
        got = {
            r.shard: (r.n_sequences, r.total_tokens, r.n_docs)
            for r in packing.packing_stats(
                packed, tokens_col="tokens", shard_col="shard"
            ).collect()
        }
        assert got == {"en": (1, 1200, 2), "fr": (1, 10, 1)}


class TestDfCappedSets:
    def test_drops_only_high_df_items(self, spark):
        # 'common' appears in all 4 docs (df=4 > floor(0.5*4)=2);
        # 'rare' in 1 doc; 'mid' in 2 docs (df=2 ≤ 2 → kept).
        rows = [
            (1, "common"), (2, "common"), (3, "common"), (4, "common"),
            (1, "rare"),
            (2, "mid"), (3, "mid"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, shingle string")
        kept = {
            (r.doc_id, r.shingle)
            for r in dedup.df_capped_sets(
                df, max_df_frac=0.5, item_col="shingle"
            ).collect()
        }
        assert kept == {(1, "rare"), (2, "mid"), (3, "mid")}

    def test_capped_jaccard_ignores_boilerplate(self, spark):
        # Docs 1/2 share only the boilerplate shingle; 3/4 share a real one.
        rows = [
            (1, "boiler"), (2, "boiler"), (3, "boiler"), (4, "boiler"),
            (1, "alpha"), (2, "beta"),
            (3, "gamma"), (4, "gamma"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, shingle string")
        capped = dedup.df_capped_sets(df, max_df_frac=0.6, item_col="shingle")
        pairs = {
            (r.id_a, r.id_b)
            for r in dedup.jaccard_pairs(
                capped, item_col="shingle", threshold=0.5
            ).collect()
        }
        assert pairs == {(3, 4)}


class TestTopTermsTfidf:
    def test_rare_term_outranks_common(self, spark):
        df = spark.createDataFrame(
            [
                (1, "shared shared unique"),
                (2, "shared filler"),
                (3, "shared filler"),
            ],
            "doc_id long, text string",
        )
        top1 = {
            r.doc_id: r.term
            for r in text.top_terms_tfidf(df, k=1).collect()
        }
        # doc 1: unique has df=1 → score 1*3/1=3 beats shared 2*3/3=2
        assert top1[1] == "unique"
        # docs 2/3: filler (df=2, score 1.5) beats shared (df=3, score 1.0)
        assert top1[2] == "filler"

    def test_k_and_tiebreak(self, spark):
        df = spark.createDataFrame([(1, "b a")], "doc_id long, text string")
        rows = text.top_terms_tfidf(df, k=2).orderBy("rk").collect()
        # equal scores → lexicographic term tiebreak
        assert [(r.term, r.rk) for r in rows] == [("a", 1), ("b", 2)]


class TestPackPayloads:
    def test_payload_concat_in_doc_order(self, spark):
        df = spark.createDataFrame(
            [
                (2, "en", "world", 600),
                (1, "en", "hello", 600),
                (3, "en", "again", 600),
            ],
            "doc_id long, shard string, text string, tokens long",
        )
        packed = packing.pack_contiguous(
            df, budget=1000, tokens_col="tokens", shard_col="shard"
        )
        rows = {
            (r.shard, r.seq_no): (r.payload, r.n_docs)
            for r in packing.pack_payloads(
                packed, text_col="text", shard_col="shard"
            ).collect()
        }
        # docs 1,2 (offsets 0,600) → seq 0; doc 3 (offset 1200) → seq 1
        assert rows == {("en", 0): ("hello world", 2), ("en", 1): ("again", 1)}


def test_fused_df_capped_jaccard_matches_composed(spark):
    rows = [
        (1, "boiler"), (2, "boiler"), (3, "boiler"), (4, "boiler"),
        (1, "alpha"), (2, "beta"),
        (3, "gamma"), (4, "gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, shingle string")
    composed = dedup.jaccard_pairs(
        dedup.df_capped_sets(df, max_df_frac=0.6, item_col="shingle"),
        item_col="shingle", threshold=0.5,
    )
    fused = dedup.jaccard_pairs_df_capped(
        df, max_df_frac=0.6, item_col="shingle", threshold=0.5
    )
    assert sorted(map(tuple, fused.collect())) == sorted(map(tuple, composed.collect()))
    assert {(r.id_a, r.id_b) for r in fused.collect()} == {(3, 4)}


# --------------------------------------------------------- inverted index


def test_inverted_index_postings_and_counts(spark):
    from data_integration_and_visualization_uc3m_spark.operators import text as T

    rows = [(1, "a b a"), (2, "b c"), (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.tok: (r.cf, r.df, r.postings_head)
        for r in T.inverted_index(df, postings_cap=20).collect()
    }
    assert got == {
        "a": (3, 2, "1,3"),
        "b": (2, 2, "1,2"),
        "c": (1, 1, "2"),
    }


def test_inverted_index_caps_postings(spark):
    from data_integration_and_visualization_uc3m_spark.operators import text as T

    df = spark.createDataFrame(
        [(i, "x") for i in range(30)], "doc_id long, text string"
    )
    r = T.inverted_index(df, postings_cap=5).collect()[0]
    assert (r.cf, r.df) == (30, 30)
    assert r.postings_head == "0,1,2,3,4"  # sorted head, capped


def test_packing_length_sweep_tradeoff_and_exact_numbers(spark):
    """Hand-checked tiny shard + the tradeoff direction: padding grows
    and fragmentation shrinks as the budget grows."""
    from data_integration_and_visualization_uc3m_spark.operators.packing import packing_length_sweep

    df = spark.createDataFrame(
        [(1, "en", 300), (2, "en", 300), (3, "en", 500), (4, "de", 900)],
        "doc_id long, lang string, tokens long",
    )
    rows = {
        r.max_len: r
        for r in packing_length_sweep(
            df, [512, 1024], tokens_col="tokens", shard_col="lang"
        ).collect()
    }
    r512 = rows[512]
    # en stream = 1100 -> 3 seqs, pad 436; de stream = 900 -> 2 seqs, pad 124
    assert (r512.n_seqs, r512.pad_tokens) == (5, 560)
    # en: doc2 spans 300..600 (crosses 512), doc3 spans 600..1100
    # (crosses 1024); de: doc4 spans 0..900 (crosses 512) -> 3 split docs
    assert r512.n_boundary_docs == 3 and r512.n_extra_fragments == 3
    r1024 = rows[1024]
    assert (r1024.n_seqs, r1024.pad_tokens) == (3, 1072)
    assert r1024.n_boundary_docs == 1  # only doc3 (600..1100) crosses
    assert r1024.pad_tokens > r512.pad_tokens
    assert r1024.n_extra_fragments < r512.n_extra_fragments
    assert abs(r512.pad_frac - 560 / (5 * 512)) < 1e-15


def test_packing_length_sweep_zero_token_doc_on_boundary(spark):
    """A zero-token document whose offset sits exactly on a max_len
    boundary must contribute 0 fragments (not -1) and must not count
    as a boundary doc; totals stay identical to the corpus without it
    except n_docs."""
    from data_integration_and_visualization_uc3m_spark.operators.packing import packing_length_sweep

    base = [(1, "en", 512), (3, "en", 100)]
    with_empty = base + [(2, "en", 0)]  # doc 2: off=512, tokens=0
    def sweep(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, tokens long"
        )
        return packing_length_sweep(
            df, [512], tokens_col="tokens", shard_col="lang"
        ).collect()[0]

    r0, r1 = sweep(base), sweep(with_empty)
    assert r1.n_extra_fragments == r0.n_extra_fragments == 0
    assert r1.n_boundary_docs == r0.n_boundary_docs == 0
    assert (r1.n_seqs, r1.pad_tokens) == (r0.n_seqs, r0.pad_tokens)
    assert r1.n_docs == r0.n_docs + 1


def test_chat_template_lint_flags(spark):
    """Hand-built transcripts covering every violation class — flags
    must come from the PARSED JSON, including NULLs for junk JSON."""
    import json as _json

    from data_integration_and_visualization_uc3m_spark.operators.text import (
        chat_template_lint,
    )

    def j(*turns):
        return _json.dumps(
            [{"role": r, "content": c} for r, c in turns]
        )

    rows = [
        (1, j(("system", "s"), ("user", "hi"), ("assistant", "yo"))),
        (2, j(("user", "hi"), ("assistant", "yo"))),           # no system, still ok
        (3, j(("system", "s"), ("user", "a"), ("user", "b"),
              ("assistant", "c"))),                            # doubled user
        (4, j(("system", "s"), ("user", ""), ("assistant", "x"))),  # empty
        (5, j(("system", "s"), ("user", "a"), ("assistant", "b"),
              ("user", "c"))),                                 # ends with user
        (6, j(("tool", "t"), ("user", "a"), ("assistant", "b"))),   # bad role
        (7, "{not json"),                                      # malformed
    ]
    df = spark.createDataFrame(rows, "doc_id long, chat_json string")
    got = {r["doc_id"]: r.asDict()
           for r in chat_template_lint(df).collect()}

    assert got[1]["has_system"] and got[1]["alternation_ok"]
    assert got[1]["ends_with_assistant"] and got[1]["no_empty_content"]
    assert got[1]["roles_ok"] and got[1]["n_messages"] == 3
    assert not got[2]["has_system"] and got[2]["alternation_ok"]
    assert not got[3]["alternation_ok"] and got[3]["no_empty_content"]
    assert not got[4]["no_empty_content"] and got[4]["alternation_ok"]
    assert not got[5]["ends_with_assistant"]
    assert not got[6]["roles_ok"]
    # "tool" also breaks user/assistant alternation of the body
    assert not got[6]["alternation_ok"]
    assert got[7]["n_messages"] in (None, -1) or got[7]["roles_ok"] is None


def test_semantic_packing_order_improves_adjacency(spark):
    """Bucket-sorted packing order must strictly beat id order on mean
    adjacent-pair cosine — the measured claim of in-context-pretraining
    ordering (and the reason to pay the sort)."""
    from data_integration_and_visualization_uc3m_spark import queries as Q

    rows = {
        r["arm"]: r.asDict()
        for r in Q.REGISTRY["semantic_packing_order_report"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert rows["semantic"]["mean_cos_fp6"] > rows["baseline"]["mean_cos_fp6"]
    assert (
        rows["semantic"]["n_adjacent_pairs"]
        == rows["baseline"]["n_adjacent_pairs"]
    )
