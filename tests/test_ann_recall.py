"""ANN recall floors at sf0.1 (round-2 verdict "Next round" #7).

recall@3 of each approximate method against the brute-force truth
(sim_topk_bruteforce), pinned as a tested threshold so a regression in
bucketing/probing/centroid assignment fails CI instead of silently
degrading retrieval quality. Round-4 raises (verdict item #7):
hamming-2 probes lifted multi-probe LSH 0.133 -> 0.367 measured;
IVF multi-assignment (spill=2 nearest-centroid lists) lifted IVF
0.30 -> 0.733 measured; learned-IVF 0.90. Floors sit under the
measured values — tight enough to catch the round-2 single-probe LSH
regression (recall 0.0), loose enough for plane/centroid seed noise.

The embeddings are near-isotropic gaussians (hard mode for hyperplane
LSH — true cosine neighbors are weak), so absolute recall is naturally
modest for the unlearned methods; the learned spherical-k-means IVF
shows what structure-aware bucketing buys.
"""

from __future__ import annotations

import pytest

from pymfe_spark.plans.catalog import load_catalog

SF_BENCH = "/root/testdata/sf0.1"

FLOORS = {
    "sim_lsh_topk": 0.30,  # hamming<=2 multi-probe; measured 0.367
    "sim_ivf_topk": 0.50,  # spill=2 multi-assignment; measured 0.733
    "zz_sim_kmeans_ivf_topk": 0.70,  # measured 0.90
}

CATALOG = load_catalog()


@pytest.fixture(scope="module")
def true_top3(spark):
    bf = CATALOG["sim_topk_bruteforce"].fn(spark, SF_BENCH).toPandas()
    return {
        q: set(g[g.rk <= 3].neighbor_id)
        for q, g in bf.groupby("query_id")
    }


@pytest.mark.parametrize("name", sorted(FLOORS))
def test_ann_recall_floor(spark, true_top3, name):
    got = CATALOG[name].fn(spark, SF_BENCH).toPandas()
    per_q = [
        len(set(got[got.query_id == q].neighbor_id) & s) / len(s)
        for q, s in true_top3.items()
    ]
    recall = sum(per_q) / len(per_q)
    assert recall >= FLOORS[name], (
        f"{name}: recall@3 {recall:.3f} fell below the pinned floor "
        f"{FLOORS[name]} at sf0.1"
    )
