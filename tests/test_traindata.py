"""Training-data curation operators (plans/traindata.py).

The oracle harness verifies these end-to-end on the synthetic corpus;
these tests cover what the corpus can't: live PII masking (the
testdata contains none), split stability under corpus growth, packing
invariants, and sampling determinism.
"""

from __future__ import annotations

import pytest

from bigdata_riveranalysis_spark.plans import traindata as TD

SF = "/root/testdata/sf0.001"


def test_scrub_pii_masks_and_counts(spark):
    rows = [
        (1, "contact me at alice.smith+work@example.co.uk today", "en", "src0", 0),
        (2, "call 555-867-5309 or ping 10.0.255.7 now", "en", "src1", 0),
        (3, "nothing sensitive here", "en", "src2", 0),
        (4, "two mails: a@b.io c@d.org and 1.2.3.4", "en", "src3", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r for r in TD.scrub_pii(df).collect()}
    assert out[1]["clean"] == "contact me at <EMAIL> today"
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 0
    assert out[2]["clean"] == "call <PHONE> or ping <IP> now"
    assert out[2]["n_phone"] == 1 and out[2]["n_ip"] == 1
    assert out[3]["clean"] == "nothing sensitive here"
    assert out[4]["n_email"] == 2 and out[4]["n_ip"] == 1
    assert "<EMAIL>" in out[4]["clean"] and "<IP>" in out[4]["clean"]


def test_split_assignment_stable_under_growth(spark):
    """Hash-bucket splits must not move existing docs when the corpus
    grows — the property rand()-based splits lack."""
    from bigdata_riveranalysis_spark.functions import text as TX
    from pyspark.sql import functions as F

    small = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    big = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    bucket = lambda df: {  # noqa: E731
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", (TX.hash32(F.col("doc_id").cast("string")) % 100).alias("b")
        ).collect()
    }
    b_small, b_big = bucket(small), bucket(big)
    assert all(b_big[k] == v for k, v in b_small.items())
    # 90/5/5 edges produce all three splits on a few hundred docs.
    splits = {
        "train" if b < TD.SPLIT_TRAIN_END else "val" if b < TD.SPLIT_VAL_END else "test"
        for b in b_big.values()
    }
    assert splits == {"train", "val", "test"}


def test_domain_mix_rates_bounded_and_deterministic(spark):
    one = {r["source"]: r for r in TD.sample_domain_mix(spark, SF).collect()}
    two = {r["source"]: r for r in TD.sample_domain_mix(spark, SF).collect()}
    assert one.keys() == two.keys()
    for s in one:
        assert one[s]["n_kept"] == two[s]["n_kept"]  # no RNG anywhere
        assert 0 <= one[s]["n_kept"] <= one[s]["n_total"]
    # src0 keeps everything (permille=1000).
    assert one["src0"]["n_kept"] == one["src0"]["n_total"]


def test_seq_pack_bins_respect_budget(spark):
    """Greedy packing invariants: bins contiguous from 0 per source,
    every bin non-empty, and every non-final bin holds at least
    budget − max_doc tokens (a bin can start mid-stride when the
    previous doc straddled the boundary, so `budget` itself is not
    the floor — budget − max_doc is exact for the one-pass packer)."""
    from pyspark.sql import functions as F

    from bigdata_riveranalysis_spark.sources.tables import load_table

    max_tok = (
        load_table(spark, SF, "documents")
        .select(
            F.size(
                F.regexp_extract_all(
                    F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)
                )
            ).alias("n")
        )
        .agg(F.max("n"))
        .collect()[0][0]
    )
    rows = TD.seq_pack_greedy(spark, SF).collect()
    assert rows, "packing produced no bins"
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r["bin"])
        # docs here are far smaller than the budget, so bins are contiguous
        assert [b["bin"] for b in bins] == list(range(len(bins)))
        for b in bins:
            assert b["n_docs"] >= 1
        for b in bins[:-1]:
            assert b["tokens_in_bin"] >= TD.PACK_BUDGET - max_tok


def test_contamination_screen_flags_planted_overlap(spark, tmp_path):
    """Plant a training doc that quotes an eval doc verbatim; the
    screen must flag it with shared_frac near 1."""
    import shutil
    from pathlib import Path

    src = Path(SF)
    dst = tmp_path / "sf"
    dst.mkdir()
    for p in src.glob("*.parquet"):
        shutil.copy(p, dst / p.name)
    import duckdb

    con = duckdb.connect()
    eval_text = con.execute(
        f"SELECT text FROM read_parquet('{src}/documents.parquet') "
        f"WHERE source = '{TD.EVAL_SOURCE}' ORDER BY doc_id LIMIT 1"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
            SELECT * FROM read_parquet('{src}/documents.parquet')
            UNION ALL
            SELECT 999999, '{eval_text.replace("'", "''")}', 'en', 'srcX',
                   {len(eval_text)}
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    flagged = {
        r["doc_id"]: r
        for r in TD.contamination_ngram_screen(spark, str(dst)).collect()
    }
    assert 999999 in flagged
    assert flagged[999999]["shared_frac"] == pytest.approx(1.0)
