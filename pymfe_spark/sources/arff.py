"""ARFF / CSV ingestion (SURVEY.md §2.0: the reference's test/example
ingest path, /root/reference/tests/utils.py:24-34 ``arff.load`` +
``pd.DataFrame`` and
examples/03_miscellaneous_examples/plot_using_pandas_csv_arff.py).

Spark-first split: the ARFF *header* (a few hundred bytes) is parsed
driver-side to build the schema; the *data* section is parsed
distributed — ``spark.read.text`` -> filter comment/declaration lines
-> ``from_csv`` with the derived schema. No driver-side row handling,
so a multi-GB ARFF ingests at scan speed with column pruning intact
downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NUMERIC_TYPES = {"numeric", "real", "integer"}


def arff_schema(path: str) -> str:
    """DDL schema string from an ARFF header: numeric/real/integer ->
    double, everything else (nominal enums, string, date) -> string."""
    fields = []
    with open(path) as f:
        for line in f:
            s = line.strip()
            low = s.lower()
            if low.startswith("@attribute"):
                parts = s.split(None, 2)
                name = parts[1].strip("'\"")
                typ = (
                    "double"
                    if parts[2].strip().lower() in _NUMERIC_TYPES
                    else "string"
                )
                fields.append(f"`{name}` {typ}")
            elif low.startswith("@data"):
                break
    if not fields:
        raise ValueError(f"no @attribute declarations found in {path}")
    return ", ".join(fields)


def read_arff(spark: SparkSession, path: str) -> DataFrame:
    """Distributed ARFF reader: header-derived schema + from_csv over
    the data section (declaration lines ``@...``, comments ``%...`` and
    blanks filtered out; ARFF single-quoted nominals unquoted)."""
    schema = arff_schema(path)
    lines = spark.read.text(path)
    data = lines.filter(
        (F.trim("value") != "")
        & ~F.col("value").startswith("@")
        & ~F.col("value").startswith("%")
    )
    return (
        data.select(
            F.from_csv(F.col("value"), schema, {"quote": "'"}).alias("r")
        ).select("r.*")
    )


def read_csv(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """CSV ingest with schema inference — the plot_using_pandas_csv_arff
    path; thin by design (spark.read.csv already is the operator)."""
    return spark.read.csv(path, header=header, inferSchema=True)
