"""spark-submit packaging probe (the north-rule ship vehicle).

Run:
    zip -qr /tmp/pymfe_spark.zip pymfe_spark
    spark-submit --master "local[4]" --py-files /tmp/pymfe_spark.zip \
        tools/submit_job.py /root/testdata/sf0.001

Proves the engine works as a shipped artifact: executors import
pymfe_spark from the zip (NOT from the repo working directory), the
Arrow kernels deserialize on workers, and the flagship + extractor
paths produce rows. Prints one JSON line; exit code 0 on success.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("pymfe_spark_submit_probe").getOrCreate()

    # imports resolve from --py-files on executors
    from pymfe_spark.operators.base import turns
    from pymfe_spark.plans.extractor import MFESpark
    from pymfe_spark.plans.flagship import conv_feature_vector

    flagship_rows = conv_feature_vector(spark, sf_dir).count()
    ex = MFESpark(groups=("general", "info-theory"))
    arrow_rows = ex.extract(turns(spark, sf_dir)).count()
    print(
        json.dumps(
            {
                "probe": "spark-submit --py-files",
                "sf_dir": sf_dir,
                "flagship_rows": flagship_rows,
                "arrow_rows": arrow_rows,
                "ok": flagship_rows > 0 and arrow_rows > 0,
            }
        )
    )
    spark.stop()
    if not (flagship_rows > 0 and arrow_rows > 0):
        sys.exit(1)


if __name__ == "__main__":
    main()
