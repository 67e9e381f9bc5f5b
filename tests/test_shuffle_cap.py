"""Unit tests for the curation operators (corpus_shuffle_order,
docs_per_source_cap) and the banded+verified MinHash pipeline. Oracle
value parity is covered by tests/test_oracle_parity.py; these tests pin
the structural guarantees the oracles can't express: permutation
exactness, two-phase == single-phase equivalence, plan shape, and the
exact-Jaccard precision contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymfe_spark.operators.curation import (
    corpus_shuffle_order,
    docs_per_source_cap,
    docs_per_source_cap_direct,
)
from pymfe_spark.operators.dedup import (
    MINHASH_VERIFY_PCT,
    dedup_exact,
    dedup_minhash_verified,
    gram_hash_table,
)
from tests.conftest import SF_SMOKE


def test_shuffle_order_is_exact_permutation(spark):
    pdf = corpus_shuffle_order(spark, SF_SMOKE).toPandas()
    n = len(pdf)
    assert sorted(pdf["shuffle_pos"]) == list(range(n))
    assert pdf["doc_id"].nunique() == n
    # order is (skey, doc_id): positions sorted by key are monotone
    pdf = pdf.sort_values(["skey", "doc_id"]).reset_index(drop=True)
    assert list(pdf["shuffle_pos"]) == list(range(n))


def test_shuffle_order_plan_has_no_global_sort(spark):
    """The global index must come from bucket offsets + within-bucket
    rank — never a rangepartitioned total sort or a single-partition
    window over the full relation (the naive row_number plan)."""
    plan = corpus_shuffle_order(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan, "global sort leaked into the plan"
    assert "hashpartitioning(bkt" in plan, "within-bucket window exchange missing"


def test_per_source_cap_two_phase_equals_direct(spark):
    """The skew-safe two-phase top-N must be bit-identical to the
    single-phase window (the true top-N per source survives every
    per-salt phase-1 cut)."""
    two = docs_per_source_cap(spark, SF_SMOKE).toPandas()
    one = docs_per_source_cap_direct(spark, SF_SMOKE).toPandas()
    key = ["source", "keep_rank"]
    two = two.sort_values(key).reset_index(drop=True)
    one = one.sort_values(key).reset_index(drop=True)
    assert two.equals(one)


def test_per_source_cap_bounds(spark):
    pdf = docs_per_source_cap(spark, SF_SMOKE).toPandas()
    per_source = pdf.groupby("source")["doc_id"].count()
    assert (per_source <= 8).all()
    assert (pdf.groupby("source")["keep_rank"].max() <= 8).all()
    assert (pdf.groupby("source")["keep_rank"].min() == 1).all()


@pytest.fixture(scope="module")
def gram_sets(spark):
    rows = gram_hash_table(spark, SF_SMOKE).toPandas()
    return rows.groupby("doc_id")["h"].agg(set).to_dict()


def test_minhash_verified_precision_is_exact(spark, gram_sets):
    """Every emitted pair's jaccard must equal the exact gram-set
    Jaccard (rounded at 6) and clear the integer-exact threshold —
    the verify stage guarantees 100% precision over the banded
    candidates."""
    pdf = dedup_minhash_verified(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    for row in pdf.itertuples():
        sa, sb = gram_sets[row.doc_a], gram_sets[row.doc_b]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        assert 100 * inter >= MINHASH_VERIFY_PCT * union
        assert abs(row.jaccard - inter / union) < 5e-7
        assert 1 <= row.n_bands_matched <= 8


def test_minhash_verified_recalls_exact_duplicates(spark, gram_sets):
    """Identical documents (jaccard 1.0 -> every band matches) must all
    be recovered, modulo the mega-bucket cap (not hit at this scale)."""
    dup_groups = (
        dedup_exact(spark, SF_SMOKE)
        .groupBy("canonical_id")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .toPandas()
    )
    expected = set()
    for ids in dup_groups["ids"]:
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                # only docs with >= 1 gram participate in the pipeline
                if ids[i] in gram_sets and ids[j] in gram_sets:
                    expected.add((ids[i], ids[j]))
    got = {
        (a, b)
        for a, b in dedup_minhash_verified(spark, SF_SMOKE)
        .select("doc_a", "doc_b")
        .toPandas()
        .itertuples(index=False)
    }
    missing = expected - got
    assert not missing, f"exact-dup pairs not recalled: {sorted(missing)[:5]}"


def test_projection_band_keys_equal_aggregated_path(spark):
    """with_band_keys (the streaming-safe pure projection, let-bound
    intermediates) must emit bit-identical (doc_id, band, bk) rows to
    the gram-table groupBy signature path used by the batch pipeline —
    min over the gram array == min over exploded distinct grams."""
    from pyspark.sql import functions as F

    from pymfe_spark.operators.dedup import (
        BND_B,
        BND_K,
        BND_R,
        BV_A,
        BV_B,
        GRAM_C,
        _P,
        with_band_keys,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    proj = (
        with_band_keys(docs)
        .select("doc_id", F.explode("bands").alias("bv"))
        .select("doc_id", F.col("bv.band").alias("band"), F.col("bv.bk").alias("bk"))
        .toPandas()
    )
    sig = gram_hash_table(spark, SF_SMOKE).groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(F.lit(BV_A[k]) * F.col("h") + F.lit(BV_B[k]), F.lit(_P))
            ).alias(f"m{k}")
            for k in range(BND_K)
        ]
    )
    agg = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.pmod(
                            sum(
                                F.pmod(
                                    F.col(f"m{4 * b + j}") * F.lit(GRAM_C[j]),
                                    F.lit(_P),
                                )
                                for j in range(BND_R)
                            ),
                            F.lit(_P),
                        ).alias("bk"),
                    )
                    for b in range(BND_B)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "bv.band", "bv.bk").toPandas()
    key = ["doc_id", "band"]
    proj = proj.sort_values(key).reset_index(drop=True)
    agg = agg.sort_values(key).reset_index(drop=True)
    assert len(proj) > 0
    assert proj.equals(agg)


def test_minhash_verified_recalls_high_jaccard_near_dups(spark):
    """Every near-dup pair the exact shingle join finds at jaccard >=
    0.5 must survive banding (expected recall 1-(1-j^4)^8 >= 0.40 at
    j=0.5, ~0.99 at j=0.8; on this fixed seeded corpus the observed
    recall is exactly 100% — deterministic, so pinned)."""
    from pymfe_spark.operators.dedup import dedup_ngram_jaccard

    ng = dedup_ngram_jaccard(spark, SF_SMOKE).toPandas()
    hi = ng[ng["jaccard"] >= 0.5]
    assert len(hi) > 0, "fixture lost its planted near-dups"
    got = {
        (a, b)
        for a, b in dedup_minhash_verified(spark, SF_SMOKE)
        .select("doc_a", "doc_b")
        .toPandas()
        .itertuples(index=False)
    }
    missing = [t for t in zip(hi["doc_a"], hi["doc_b"]) if t not in got]
    assert not missing, f"high-jaccard pairs not recalled: {missing[:5]}"


def test_incremental_dedup_planted_decisions(spark, tmp_path):
    """Planted increment: an exact duplicate of a history doc (case
    variant -> drop_exact), a near duplicate (one token changed in 30
    -> drop_near via band match + jaccard verify), and a unique doc
    (keep). doc_id % 5 == 0 marks the increment."""
    import pandas as pd

    from pymfe_spark.operators.dedup import dedup_incremental

    base = " ".join(f"tok{i} word{i * 7 % 13}" for i in range(15))  # 30 tokens
    near = base.split(" ")
    near[14] = "CHANGED"
    other = " ".join(f"zz{i} qq{i}" for i in range(12))
    rows = [
        # history (doc_id % 5 != 0)
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": other},
        # increment (doc_id % 5 == 0)
        {"doc_id": 0, "text": base.upper()},          # exact (case) dup of 1
        {"doc_id": 5, "text": " ".join(near)},        # near dup of 1
        {"doc_id": 10, "text": "totally different words entirely here now"},
    ]
    pdf = pd.DataFrame(rows)
    pdf["lang"] = "en"
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len()
    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = (
        dedup_incremental(spark, d)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0, "decision"] == "drop_exact" and got.loc[0, "dup_of"] == 1
    assert got.loc[5, "decision"] == "drop_near" and got.loc[5, "dup_of"] == 1
    assert got.loc[10, "decision"] == "keep" and pd.isna(got.loc[10, "dup_of"])
