"""Planted-case tests for the late-round curation operators: PII
scrubbing, sequence packing, corpus boilerplate top-k, and JSON
property extraction. (Cross-engine value parity for each catalog query
is separately enforced by tests/test_oracle_parity.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymfe_spark.operators.packing import PACK_BUDGET, pack_sequences_df
from pymfe_spark.operators.textops import scrub_pii
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- PII


def test_pii_scrub_planted_cases(spark):
    rows = [
        (0, "no pii here at all"),
        (1, "mail a@b.co and c.d+x@e-f.org twice"),
        (2, "call 555-123-4567 or 555-000-1111 now"),
        (3, "host 192.168.1.1 and 10.0.0.255"),
        (4, "mixed a@b.io 555-123-4567 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_em, n_ph, n_ip, red = scrub_pii(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            n_em.alias("em"),
            n_ph.alias("ph"),
            n_ip.alias("ip"),
            red.alias("red"),
        ).collect()
    }
    assert (out[0]["em"], out[0]["ph"], out[0]["ip"]) == (0, 0, 0)
    assert out[0]["red"] == "no pii here at all"  # no-PII text untouched
    assert out[1]["em"] == 2
    assert out[2]["ph"] == 2
    assert out[3]["ip"] == 2
    assert (out[4]["em"], out[4]["ph"], out[4]["ip"]) == (1, 1, 1)
    assert out[4]["red"] == "mixed <EMAIL> <PHONE> <IP>"


def test_pii_redaction_removes_all_matches(spark):
    """Scrubbing is idempotent: a second pass finds zero PII."""
    rows = [(0, "a@b.co 555-123-4567 1.2.3.4 and b@c.de")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _, _, _, red = scrub_pii(F.col("text"))
    n_em2, n_ph2, n_ip2, _ = scrub_pii(red)
    row = df.select(n_em2.alias("e"), n_ph2.alias("p"), n_ip2.alias("i")).first()
    assert (row["e"], row["p"], row["i"]) == (0, 0, 0)


# ------------------------------------------------------------ packing


@pytest.fixture(scope="module")
def packed(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return pack_sequences_df(docs).toPandas()


def test_packing_streams_are_contiguous(packed):
    """Within each shard the doc token spans tile the stream exactly:
    each start_offset equals the previous doc's end — no gaps, no
    overlaps (token conservation)."""
    for _, g in packed.sort_values(["shard", "doc_id"]).groupby("shard"):
        end = 0
        for r in g.itertuples():
            assert r.start_offset == end, (r.shard, r.doc_id)
            end = r.start_offset + r.n_tokens
        assert end == g["n_tokens"].sum()


def test_packing_chunk_arithmetic(packed):
    first = packed["start_offset"] // PACK_BUDGET
    last = (packed["start_offset"] + packed["n_tokens"] - 1) // PACK_BUDGET
    assert (packed["chunk_first"] == first).all()
    assert (packed["chunk_last"] == last).all()
    assert (packed["n_chunks"] == last - first + 1).all()
    # short docs (< budget tokens) span at most 2 chunks
    short = packed[packed["n_tokens"] < PACK_BUDGET]
    assert (short["n_chunks"] <= 2).all()


def test_packing_boundary_spanning_doc(spark):
    """A doc straddling the 2048-token boundary spans exactly 2 chunks."""
    rows = [
        (0, " ".join(["w"] * 2000)),  # [0, 2000)      -> chunk 0
        (32, " ".join(["w"] * 100)),  # [2000, 2100)   -> chunks 0-1
        (64, " ".join(["w"] * 10)),  #  [2100, 2110)   -> chunk 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences_df(df).collect()}
    assert out[0]["n_chunks"] == 1 and out[0]["chunk_first"] == 0
    assert out[32]["n_chunks"] == 2
    assert (out[32]["chunk_first"], out[32]["chunk_last"]) == (0, 1)
    assert out[64]["chunk_first"] == 1 and out[64]["n_chunks"] == 1


# ------------------------------------------------------- top n-grams


def test_top_ngrams_finds_planted_boilerplate(spark):
    """A 3-gram planted in many docs must surface at rank 1."""
    from pymfe_spark.operators.textops import corpus_top_ngrams

    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    planted = base.withColumn(
        "text", F.concat(F.lit("copy right notice "), F.col("text"))
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        planted.write.parquet(f"{d}/documents.parquet")
        top = corpus_top_ngrams(spark, d).collect()
    assert top[0]["gram"] == "copy_right_notice"
    assert top[0]["rank"] == 1
    assert top[0]["n_docs"] == base.count()
    # ranks are 1..k, ordered by count desc then gram
    ranks = [r["rank"] for r in top]
    assert ranks == sorted(ranks) and ranks[0] == 1


# ------------------------------------------------------------- JSON


def test_events_json_extraction_agrees_with_raw(spark):
    """Sanity: parsed count equals total (all props rows are valid
    JSON in the fixture) and sum matches a direct string-parse."""
    from pymfe_spark.operators.jsonops import events_json_props

    out = events_json_props(spark, SF_SMOKE).toPandas()
    assert (out["n_parsed"] == out["n_events"]).all()
    assert (out["min_k"] >= 0).all() and (out["max_k"] <= 100).all()


# ----------------------------------------------------------- sketch


def test_sketch_profile_bounds_against_exact(spark):
    """HLL distinct counts within ~3x the configured 2% rsd; approx
    percentiles within the quantile-summary's rank-error contract
    (bounded here by the neighboring exact deciles)."""
    from pymfe_spark.operators.sketch import corpus_profile_sketch, exact_profile

    approx = corpus_profile_sketch(spark, SF_SMOKE).toPandas().set_index("source")
    exact = exact_profile(spark, SF_SMOKE).toPandas().set_index("source")
    for src in exact.index:
        e, a = exact.loc[src], approx.loc[src]
        assert abs(a["approx_distinct_texts"] - e["distinct_texts"]) <= max(
            0.06 * e["distinct_texts"], 2
        ), (src, a["approx_distinct_texts"], e["distinct_texts"])
        for c in ("p50_chars", "p90_chars", "p99_chars"):
            # rank error 1/accuracy=1e-4 -> value must sit within the
            # exact [p-5%, p+5%] value band; lengths are tightly
            # clustered so a generous relative band suffices
            assert abs(a[c] - e[c]) <= 0.1 * e[c] + 2, (src, c, a[c], e[c])


def test_events_json_malformed_rows_null_out(spark):
    rows = [(0, "a", '{"k": 3}'), (1, "a", "not json"), (2, "b", '{"j": 9}')]
    df = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    got = df.select(F.count(k).alias("n")).first()["n"]
    assert got == 1  # malformed + missing-key rows -> NULL, not error


def test_unigram_logprob_ranks_common_above_rare(spark, tmp_path):
    """A document of corpus-common tokens must outscore a document of
    corpus-unique tokens, and singleton-token docs hit the floor
    ln(1/total)."""
    import math

    import pandas as pd

    from pymfe_spark.operators.textops import text_unigram_logprob

    rows = [{"doc_id": i, "text": "the cat sat on the mat"} for i in range(8)]
    rows.append({"doc_id": 100, "text": "qxzv wkfj plmn zzyx qqrr ttss"})
    pdf = pd.DataFrame(rows)
    pdf["lang"] = "en"
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len()
    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = text_unigram_logprob(spark, d).toPandas().set_index("doc_id")
    total = 8 * 6 + 6
    assert got.loc[0, "avg_logprob"] > got.loc[100, "avg_logprob"]
    # every token of doc 100 is a singleton: score is exactly ln(1/total)
    assert abs(got.loc[100, "avg_logprob"] - math.log(1 / total)) < 1e-5
    assert (got["n_tokens"] == 6).all()
