"""Arbitrary-table meta-feature extraction — the reference's core use
case (`MFE().fit(X).extract()` over ANY tabular dataset) demonstrated
against a table the engine does not otherwise touch: TPC-H lineitem.

One row out per meta-feature, long format ``(mtf_name, mtf_val)``,
reference semantics throughout:

- per-attribute mean / sd (ddof=1) / e1071 method-3 skewness &
  kurtosis (_summary.py:146-270), summarized across attributes with
  pymfe's default mean+sd summary pair;
- cov / cor as the ABS lower triangle of the covariance / correlation
  matrix (statistical.py:410-498), summarized the same way;
- general scalars nr_inst / nr_attr / attr_to_inst / inst_to_attr.

Plan shape (the whole-table analogue of the per-conversation SQL
tier): ONE partial-aggregated pass for the 1-row means, a second pass
for central/cross moments against the broadcast means, then every
meta-feature is a scalar expression over the single moment row —
nothing but two 1-row exchanges regardless of table size. Summaries
across the 4 attributes are written as explicit fixed-order
expressions so both engines evaluate the identical float tree;
outputs round at 4 decimals (the kernel cross-check precedent: global
float aggregation agrees across engines to ~1 ulp, and a 4-decimal
boundary flip at 1-ulp input distance is negligible — BENCH.md
"Correctness at scale").

Known benign log line: the FINAL explode projection (16 struct fields,
each inlining the fixed-order sd/cov/cor float trees) exceeds Janino's
method-size limit, so Spark logs ``ERROR CodeGenerator: Failed to
compile`` once and falls back to interpreted projection FOR THAT
OPERATOR ONLY. It runs downstream of both aggregation passes, i.e. on
one row per group (1-3 rows here), so the fallback costs microseconds
at any input scale; the scan-side aggregations still whole-stage-
codegen. Rewriting the summaries as higher-order-function let-bindings
would shrink the tree but HOFs are themselves CodegenFallback, so the
projection would be interpreted either way — the explicit tree keeps
both engines' float semantics identical, which is the priority."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymfe_spark.plans.catalog import register

GROUP = "tabular"

NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_PAIRS = [
    (i, j) for i in range(len(NUM_COLS)) for j in range(len(NUM_COLS)) if i < j
]


def _summary_exprs(vals):
    """mean and sd (ddof=1) over a fixed-order list of scalar Columns,
    written as explicit sequential expressions (no aggregation node —
    identical float tree on both engines)."""
    n = len(vals)
    mean = sum(vals[1:], vals[0]) / F.lit(float(n))
    var = (
        sum(
            ((v - mean) * (v - mean) for v in vals[1:]),
            (vals[0] - mean) * (vals[0] - mean),
        )
        / F.lit(float(n - 1))
    )
    return mean, F.sqrt(var)


def mfe_tabular(df: DataFrame, cols=NUM_COLS, by: str | None = None) -> DataFrame:
    """Long-format meta-feature vector of the numeric columns of an
    arbitrary DataFrame (see module doc). With ``by``, every group is
    its own pymfe dataset — the engine's core semantic inversion
    (thousands of fits in one plan) applied to any table: the two
    aggregation passes gain the group key (same shuffle count, keyed),
    and the means join becomes a broadcast equi-join on ``by``."""
    k = len(cols)
    mu_aggs = [
        F.count("*").alias("n"),
        *[F.avg(c).alias(f"mu{i}") for i, c in enumerate(cols)],
    ]
    mu = df.groupBy(by).agg(*mu_aggs) if by else df.agg(*mu_aggs)
    d = [F.col(c) - F.col(f"mu{i}") for i, c in enumerate(cols)]
    joined = (
        df.join(F.broadcast(mu), by) if by else df.join(F.broadcast(mu))
    )
    mom_aggs = [
        F.max("n").alias("n"),
        *[F.max(f"mu{i}").alias(f"mu{i}") for i in range(k)],
        *[F.avg(d[i] * d[i]).alias(f"m2_{i}") for i in range(k)],
        *[F.avg(d[i] * d[i] * d[i]).alias(f"m3_{i}") for i in range(k)],
        *[
            F.avg(d[i] * d[i] * d[i] * d[i]).alias(f"m4_{i}")
            for i in range(k)
        ],
        *[F.avg(d[i] * d[j]).alias(f"cx_{i}_{j}") for i, j in _PAIRS],
    ]
    mom = joined.groupBy(by).agg(*mom_aggs) if by else joined.agg(*mom_aggs)
    n = F.col("n").cast("double")
    bessel = n / (n - F.lit(1.0))
    means = [F.col(f"mu{i}") for i in range(k)]
    sds = [F.sqrt(F.col(f"m2_{i}") * bessel) for i in range(k)]
    skews = [
        (F.col(f"m3_{i}") / F.pow(F.col(f"m2_{i}"), 1.5))
        * F.pow((n - F.lit(1.0)) / n, 1.5)
        for i in range(k)
    ]
    kurts = [
        (F.col(f"m4_{i}") / F.pow(F.col(f"m2_{i}"), 2.0))
        * F.pow(F.lit(1.0) - F.lit(1.0) / n, 2.0)
        - F.lit(3.0)
        for i in range(k)
    ]
    covs = [F.abs(F.col(f"cx_{i}_{j}") * bessel) for i, j in _PAIRS]
    cors = [
        F.abs(
            F.col(f"cx_{i}_{j}")
            / F.sqrt(F.col(f"m2_{i}") * F.col(f"m2_{j}"))
        )
        for i, j in _PAIRS
    ]

    rows = []
    for name, vals in (
        ("mean", means),
        ("sd", sds),
        ("skewness", skews),
        ("kurtosis", kurts),
        ("cov", covs),
        ("cor", cors),
    ):
        m, s = _summary_exprs(vals)
        rows.append((f"{name}.mean", m))
        rows.append((f"{name}.sd", s))
    rows.append(("nr_inst", n))
    rows.append(("nr_attr", F.lit(float(k))))
    rows.append(("attr_to_inst", F.lit(float(k)) / n))
    rows.append(("inst_to_attr", n / F.lit(float(k))))

    exploded = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(nm).alias("mtf_name"),
                    F.round(v, 4).alias("mtf_val"),
                )
                for nm, v in rows
            ]
        )
    ).alias("r")
    if by:
        out = mom.select(F.col(by), exploded)
        return out.select(by, "r.mtf_name", "r.mtf_val").orderBy(
            by, "mtf_name"
        )
    out = mom.select(exploded)
    return out.select("r.mtf_name", "r.mtf_val").orderBy("mtf_name")


def _tabular_oracle(by: str | None = None) -> str:
    k = len(NUM_COLS)
    mu_cols = ", ".join(
        f"avg({c}) AS mu{i}" for i, c in enumerate(NUM_COLS)
    )
    d = [f"(t.{c} - m.mu{i})" for i, c in enumerate(NUM_COLS)]
    mom_cols = (
        ", ".join(f"max(m.mu{i}) AS mu{i}" for i in range(k))
        + ", "
        + ", ".join(f"avg({d[i]} * {d[i]}) AS m2_{i}" for i in range(k))
        + ", "
        + ", ".join(
            f"avg({d[i]} * {d[i]} * {d[i]}) AS m3_{i}" for i in range(k)
        )
        + ", "
        + ", ".join(
            f"avg({d[i]} * {d[i]} * {d[i]} * {d[i]}) AS m4_{i}"
            for i in range(k)
        )
        + ", "
        + ", ".join(f"avg({d[i]} * {d[j]}) AS cx_{i}_{j}" for i, j in _PAIRS)
    )
    bessel = "(n / (n - 1.0))"
    means = [f"mu{i}" for i in range(k)]
    sds = [f"sqrt(m2_{i} * {bessel})" for i in range(k)]
    skews = [
        f"((m3_{i} / pow(m2_{i}, 1.5)) * pow((n - 1.0) / n, 1.5))"
        for i in range(k)
    ]
    kurts = [
        f"((m4_{i} / pow(m2_{i}, 2.0)) * pow(1.0 - 1.0 / n, 2.0) - 3.0)"
        for i in range(k)
    ]
    covs = [f"abs(cx_{i}_{j} * {bessel})" for i, j in _PAIRS]
    cors = [
        f"abs(cx_{i}_{j} / sqrt(m2_{i} * m2_{j}))" for i, j in _PAIRS
    ]

    def summ(vals):
        n = len(vals)
        mean = "(((" + ") + (".join(vals) + f")) / {float(n)})"
        # multiplication, not pow(x, 2): the Spark side squares by
        # multiplication and pow's libm path is not guaranteed identical
        sq = " + ".join(f"((({v}) - {mean}) * (({v}) - {mean}))" for v in vals)
        return mean, f"sqrt(({sq}) / {float(n - 1)})"

    g = f"{by}, " if by else ""
    selects = []
    for name, vals in (
        ("mean", means),
        ("sd", sds),
        ("skewness", skews),
        ("kurtosis", kurts),
        ("cov", covs),
        ("cor", cors),
    ):
        m, s = summ(vals)
        selects.append(
            f"SELECT {g}'{name}.mean' AS mtf_name, round({m}, 4) AS mtf_val FROM mom"
        )
        selects.append(f"SELECT {g}'{name}.sd', round({s}, 4) FROM mom")
    selects.append(f"SELECT {g}'nr_inst', round(n, 4) FROM mom")
    selects.append(f"SELECT {g}'nr_attr', {float(k)} FROM mom")
    selects.append(f"SELECT {g}'attr_to_inst', round({float(k)} / n, 4) FROM mom")
    selects.append(f"SELECT {g}'inst_to_attr', round(n / {float(k)}, 4) FROM mom")
    body = "\nUNION ALL ".join(selects)
    if by:
        return f"""
WITH mu AS (
  SELECT {by} AS grp, count(*) AS n, {mu_cols}
  FROM lineitem GROUP BY {by}
), mom AS (
  SELECT m.grp AS {by}, max(m.n)::DOUBLE AS n, {mom_cols}
  FROM lineitem t JOIN mu m ON t.{by} = m.grp
  GROUP BY m.grp
)
{body}
ORDER BY {by}, mtf_name
"""
    return f"""
WITH mu AS (
  SELECT count(*) AS n, {mu_cols} FROM lineitem
), mom AS (
  SELECT max(m.n)::DOUBLE AS n, {mom_cols}
  FROM lineitem t CROSS JOIN mu m
)
{body}
ORDER BY mtf_name
"""


@register(
    "mfe_tabular_lineitem",
    oracle=_tabular_oracle(),
    group=GROUP,
)
def mfe_tabular_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pymfe drop-in demo: meta-features of an arbitrary parquet
    table (lineitem's 4 numeric attributes)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(*NUM_COLS)
    return mfe_tabular(li)


@register(
    "mfe_tabular_by_returnflag",
    oracle=_tabular_oracle(by="l_returnflag"),
    group=GROUP,
)
def mfe_tabular_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped tabular extraction — every l_returnflag group is its own
    pymfe dataset, all fit in one plan (the engine's per-conversation
    inversion applied to an arbitrary table: 3 datasets here, millions
    at 100 TB, same two keyed exchanges)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", *NUM_COLS
    )
    return mfe_tabular(li, by="l_returnflag")
