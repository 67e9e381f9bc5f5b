"""Freeze golden parquet for the seed-fixed Spark-iterative queries
(round-3 verdict "Next round" #5): ``zz_kmeans_assign`` and
``zz_sim_kmeans_ivf_topk``.

Unlike tools/freeze_goldens.py (driver-side numpy twin), these queries
are iterative distributed k-means with no independent twin — the
golden is the query's OWN output frozen once, which pins regressions
(a changed seed rule, tie-break, probe order, or join shape now fails
a value test instead of hiding behind a rows-only check). Centroid
means reassociate float sums across partitions (~1e-16), so the test
compares ids exactly and scores at rounding tolerance.

Usage: python tools/freeze_spark_goldens.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 -> tests/goldens/
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DEFAULT = "/root/testdata/sf0.001"
OUT_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "goldens",
)

FROZEN = ("zz_kmeans_assign", "zz_sim_kmeans_ivf_topk")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DEFAULT
    out_dir = sys.argv[2] if len(sys.argv) > 2 else OUT_DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    from pymfe_spark import get_spark
    from pymfe_spark.plans.catalog import load_catalog

    catalog = load_catalog()
    spark = get_spark(app_name="freeze_spark_goldens")
    for name in FROZEN:
        pdf = catalog[name].fn(spark, sf_dir).toPandas()
        # 'rk' (not 'rank') is the actual top-k output column — sorting
        # on it keeps refrozen goldens byte-stable (ADVICE r4)
        sort_cols = [
            c for c in ("query_id", "vec_id", "rk") if c in pdf.columns
        ]
        pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
        path = os.path.join(out_dir, f"{name}.parquet")
        pdf.to_parquet(path, index=False)
        print(f"froze {name}: {len(pdf)} rows -> {path}")


if __name__ == "__main__":
    main()
