"""Known-answer tests for the round-9 evaluation/reporting queries:
GIF codec round-trip, exact ROC-AUC, Brier calibration bins, MASE
forecast backtest, l-diversity and Simpson-diversity audits.

Each query-level test writes a tiny hand-built parquet table and
checks hand-computed integers — the same ground-truth style as the
Mann-Whitney/Wilcoxon tests (test_timeseries_mixing.py)."""

import datetime
import struct

import pytest

from data_integration_and_visualization_uc3m_spark import queries as Q


def _write_docs(spark, sf, rows):
    """rows: (doc_id, text, lang, source, n_chars)"""
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")


# --- GIF codec -------------------------------------------------------


def test_gif_roundtrip_matches_python_reference(spark):
    """Byte-level ground truth: synthesize_gif's payload must be a
    valid GIF89a header+LSD per Python struct decoding of the raw
    bytes, and gif_screen_meta must read back exactly the fields the
    closed form put in — including the bit-packed byte split."""
    from data_integration_and_visualization_uc3m_spark.operators.multimodal import (
        gif_screen_meta,
        synthesize_gif,
    )

    cases = [(3, 321, 7, 5, 2, 77), (9, 8, 207, 0, 7, 255)]
    src = spark.createDataFrame(
        cases,
        "media_id long, width_px long, height_px long, color_res long,"
        " gct_exp long, bg_index long",
    )
    media = synthesize_gif(src)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    meta = {r["media_id"]: r.asDict()
            for r in gif_screen_meta(media).collect()}

    for mid, w, h, cres, gexp, bg in cases:
        raw = payloads[mid]
        assert raw[:6] == b"GIF89a" and len(raw) == 13
        gw, gh, packed, gbg, aspect = struct.unpack("<HHBBB", raw[6:])
        assert (gw, gh, gbg, aspect) == (w, h, bg, 0)
        assert packed == 128 + cres * 16 + gexp

        m = meta[mid]
        assert m["gif_sig_ok"] and m["n_bytes"] == 13
        assert (m["width_px"], m["height_px"]) == (w, h)
        assert (m["color_res"], m["bg_index"]) == (cres, bg)
        assert m["gct_entries"] == 2 ** (gexp + 1)


def test_gif_parse_rejects_and_flagless(spark):
    """A non-GIF payload nulls every field; a GCT-flag-clear packed
    byte (bit 7 = 0, built in Python, not by the synthesizer) reports
    gct_entries = 0, proving the parser reads the flag bit, not just
    the exponent bits."""
    from data_integration_and_visualization_uc3m_spark.operators.multimodal import (
        gif_screen_meta,
    )

    flagless = (
        b"GIF89a" + struct.pack("<HH", 40, 30)
        + bytes([0b0110_0101, 9, 0])  # flag 0, cres 6, exp 5
    )
    media = spark.createDataFrame(
        [(1, bytearray(b"NOTGIF" + b"\x00" * 7)), (2, bytearray(flagless))],
        "media_id long, payload binary",
    )
    m = {r["media_id"]: r.asDict() for r in gif_screen_meta(media).collect()}
    assert m[1]["gif_sig_ok"] is False
    assert m[1]["width_px"] is None and m[1]["gct_entries"] is None
    assert m[2]["gif_sig_ok"] is True
    assert (m[2]["width_px"], m[2]["height_px"]) == (40, 30)
    assert m[2]["color_res"] == 6
    assert m[2]["gct_entries"] == 0  # flag clear beats exp = 5
    assert m[2]["bg_index"] == 9


# --- ROC-AUC ---------------------------------------------------------


def test_roc_auc_known_answers(spark, tmp_path):
    """Hand-checked tie case: positives at scores {2,2,4,4}, negatives
    at {2,6,8} -> U = 2 wins + 0.5*2 ties = 3, AUC = 3/12 = 0.25."""
    sf = str(tmp_path)
    _write_docs(spark, sf, [
        (1, "aa", "en", "s1", 2),
        (2, "aa", "en", "s1", 2),          # dup pair, score 2
        (3, "bbbb", "en", "s1", 4),
        (4, "bbbb", "en", "s1", 4),        # dup pair, score 4
        (5, "ee", "en", "s1", 2),          # unique, ties a positive
        (6, "cccccc", "en", "s1", 6),      # unique
        (7, "dddddddd", "en", "s1", 8),    # unique
    ])
    out = Q.REGISTRY["roc_auc_length_vs_dup"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_pos, r.n_neg) == (4, 3)
    assert r.u_doubled == 6          # 2U, U = 3
    assert r.auc_micro == 250_000    # floor(1e6 * 3/12)
    assert r.gini_micro == -500_000  # floor(2e6 * 0.25) - 1e6


def test_roc_auc_perfect_separation(spark, tmp_path):
    """All duplicates longer than all uniques -> AUC = 1, Gini = 1."""
    sf = str(tmp_path)
    _write_docs(spark, sf, [
        (1, "zzzzzzzzzz", "en", "s1", 10),
        (2, "zzzzzzzzzz", "en", "s1", 10),
        (3, "a", "en", "s1", 1),
        (4, "bb", "en", "s1", 2),
    ])
    r = Q.REGISTRY["roc_auc_length_vs_dup"].fn(spark, sf).collect()[0]
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert r.u_doubled == 8          # 2 * n_pos * n_neg
    assert r.auc_micro == 1_000_000 and r.gini_micro == 1_000_000


# --- Brier calibration ----------------------------------------------


def test_brier_calibration_known_answers(spark, tmp_path):
    """Two bins: the dup pair at n=2 (p = 2000//502 = 3 milli, bin 0)
    and one unique long doc (p = 1500000//2000 = 750, bin 7)."""
    sf = str(tmp_path)
    _write_docs(spark, sf, [
        (1, "aa", "en", "s1", 2),
        (2, "aa", "en", "s1", 2),
        (3, "y" * 1500, "en", "s1", 1500),
    ])
    rows = {r.bin: r for r in
            Q.REGISTRY["brier_calibration_report"].fn(spark, sf).collect()}
    assert set(rows) == {0, 7}
    b0 = rows[0]
    assert (b0.n_docs, b0.n_pos, b0.sum_pred_milli) == (2, 2, 6)
    assert b0.event_rate_milli == 1000
    assert b0.brier_micro == (3 - 1000) ** 2  # both rows identical
    b7 = rows[7]
    assert (b7.n_docs, b7.n_pos, b7.sum_pred_milli) == (1, 0, 750)
    assert b7.event_rate_milli == 0
    assert b7.brier_micro == 750 ** 2


# --- MASE backtest ---------------------------------------------------


def test_forecast_backtest_mase_known_answers(spark, tmp_path):
    """Linear daily revenue (100+i dollars on day i, 40 days): every
    lag-1 diff is 100 cents and every lag-7 diff is 700 cents, so
    MASE(naive1) = 1.0 and MASE(snaive7) = 7.0 exactly."""
    sf = str(tmp_path)
    d0 = datetime.datetime(2021, 1, 1)
    rows = [
        (i, 1, "O", float(100 + i), d0 + datetime.timedelta(days=i), "1-X")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")
    out = {r.method: r for r in
           Q.REGISTRY["forecast_backtest_mase"].fn(spark, sf).collect()}
    n1, s7 = out["naive1"], out["snaive7"]
    # test window: days 12..39 (28 days); train diffs: days 1..11 (11)
    assert (n1.n_test_days, n1.n_train_diffs) == (28, 11)
    assert n1.sum_abs_err_cents == 28 * 100
    assert n1.scale_abs_diff_cents == 11 * 100
    assert n1.mase_micro == 1_000_000
    assert (s7.n_test_days, s7.sum_abs_err_cents) == (28, 28 * 700)
    assert s7.mase_micro == 7_000_000


# --- privacy / diversity audits --------------------------------------


def test_l_diversity_known_answers(spark, tmp_path):
    """Three QI groups: (en, 0) has sources {s1, s2} -> l=2; (en, 1)
    all s1 -> l=1; (fr, 0) all s3 -> l=1."""
    sf = str(tmp_path)
    _write_docs(spark, sf, [
        (1, "a", "en", "s1", 10),
        (2, "b", "en", "s2", 20),
        (3, "c", "en", "s1", 120),
        (4, "d", "en", "s1", 130),
        (5, "e", "en", "s1", 140),
        (6, "f", "fr", "s3", 50),
    ])
    rows = {r.l_distinct: r for r in
            Q.REGISTRY["l_diversity_report"].fn(spark, sf).collect()}
    assert set(rows) == {1, 2}
    assert (rows[1].n_groups, rows[1].n_docs) == (2, 4)
    assert rows[1].min_group_size == 1
    assert (rows[2].n_groups, rows[2].n_docs, rows[2].min_group_size) == (
        1, 2, 2)


def test_source_lang_simpson_known_answers(spark, tmp_path):
    """s1: 2 en + 2 fr of 4 docs -> Simpson = 1 - (2+2)/12 = 2/3;
    s2: all same lang -> 0; s3: a single doc -> NULL (undefined)."""
    sf = str(tmp_path)
    _write_docs(spark, sf, [
        (1, "a", "en", "s1", 1), (2, "b", "en", "s1", 1),
        (3, "c", "fr", "s1", 1), (4, "d", "fr", "s1", 1),
        (5, "e", "de", "s2", 1), (6, "f", "de", "s2", 1),
        (7, "g", "it", "s3", 1),
    ])
    rows = {r.source: r for r in
            Q.REGISTRY["source_lang_simpson"].fn(spark, sf).collect()}
    s1 = rows["s1"]
    assert (s1.n_docs, s1.n_langs) == (4, 2)
    assert s1.simpson_micro == 666_666  # floor(2/3 * 1e6)
    assert rows["s2"].simpson_micro == 0
    assert rows["s3"].simpson_micro is None


def test_theil_sen_robust_to_outlier_month(spark, tmp_path):
    """Five months at a perfect +$100/month line, with the last month
    a 25x outlier: 6 of 10 pairwise slopes are exactly $100/month, so
    the lower median stays 1e10 micro-cents/month — the robustness the
    least-squares trend lacks."""
    import datetime

    sf = str(tmp_path)
    spark.createDataFrame([(0, "AMERICA")], "r_regionkey int, r_name string"
                          ).write.parquet(f"{sf}/region.parquet")
    spark.createDataFrame([(0, "BRAZIL", 0)],
                          "n_nationkey int, n_name string, n_regionkey int"
                          ).write.parquet(f"{sf}/nation.parquet")
    spark.createDataFrame(
        [(1, "c1", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{sf}/customer.parquet")
    vals = [100.0, 200.0, 300.0, 400.0, 10_000.0]
    spark.createDataFrame(
        [(m, 1, "O", v, datetime.datetime(2021, m + 1, 15), "1-X")
         for m, v in enumerate(vals)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")
    out = Q.REGISTRY["theil_sen_region_trend"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.r_name, r.n_pairs) == ("AMERICA", 10)
    assert r.median_slope_micro_cents == 10_000 * 1_000_000


def test_readability_negative_sum_truncates_like_duckdb(spark, tmp_path):
    """Vowel-run words make Flesch strongly negative; with a 3-doc
    count that doesn't divide the sum, the mean must TRUNCATE toward
    zero (both engines' integer division semantics), not floor."""
    sf = str(tmp_path)
    texts = [" ".join(["aaa"] * w) for w in (300, 301, 304)]
    _write_docs(spark, sf, [
        (i, t, "xx", "s1", len(t)) for i, t in enumerate(texts)
    ])
    out = {r.lang: r for r in
           Q.REGISTRY["readability_report"].fn(spark, sf).collect()}
    r = out["xx"]

    def flesch(w):
        # s = 1 (no terminal punctuation), syllables == words
        return 206835 - (1015 * w) // 1 - (84600 * w) // w

    total = sum(flesch(w) for w in (300, 301, 304))
    assert total < 0 and total % 3 != 0  # the case that exposes floor
    trunc = int(total / 3)  # truncation toward zero
    assert r.mean_flesch_milli == trunc
    assert r.mean_flesch_milli == -(-total // 3)  # == trunc, not floor
