"""Statistical-testing tier IV (round 9b): ordered-alternative and
ordinal-association tests — Page's L trend test across event types
within days, and the Goodman-Kruskal gamma / Somers' D pair on
lineitem ordinals. These complete the rank-test battery around
friedman (unordered blocks) and kendall (continuous ordinals).

Exactness discipline: doubled midranks and concordance masses are
exact integers (128-bit where products can exceed int64); one IEEE
tail per statistic, same text both engines. Scale: Page rides the
(days × k) dense grid (calendar × type-count bounded); gamma rides
the (quantity × discount) CELL table pair join — cell counts are
domain-bounded (50 × 11), never row-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import (
    wide_to_double_sql as _w2d,
)
from de4ml_spark.session import load_table

REGISTRY: dict = {}


def _big(div: str) -> str:
    return "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"


# --------------------------------------------------------------------------
# Page's L test for an ORDERED trend across event types (lexicographic
# a-priori order, same convention as jonckheere_value) with days as
# blocks: L = Σ_j j·R_j over per-day midranks of the k per-type daily
# counts (missing types count 0 via the dense day × type grid).
# Doubled midranks keep everything integer (L2 = 2L);
# z = (6·L2 − 3·n·k·(k+1)²)/√(n·k²·(k+1)·(k²−1)). The grid is
# days × k; the rank join is days × k².
# --------------------------------------------------------------------------

_PAGE_FINAL = [
    "n_blocks",
    "k_treat",
    "l2_stat",
    "(6.0 * CAST(l2_stat AS DOUBLE)"
    " - 3.0 * CAST(n_blocks AS DOUBLE) * CAST(k_treat AS DOUBLE)"
    " * CAST(k_treat + 1 AS DOUBLE) * CAST(k_treat + 1 AS DOUBLE))"
    " / sqrt(CAST(n_blocks AS DOUBLE) * CAST(k_treat AS DOUBLE)"
    " * CAST(k_treat AS DOUBLE) * CAST(k_treat + 1 AS DOUBLE)"
    " * (CAST(k_treat AS DOUBLE) * CAST(k_treat AS DOUBLE) - 1.0))"
    " AS z_page",
]


def page_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isNotNull())
    days = base.select(
        F.col("ts").cast("date").alias("day")
    ).distinct()
    types = base.select("event_type").distinct()
    counts = base.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(counts, ["day", "event_type"], "left")
        .selectExpr("day", "event_type", "COALESCE(c, 0) AS c")
    )
    o = grid.selectExpr(
        "day", "event_type AS et2", "c AS c2"
    )
    r2 = (
        grid.join(o, "day")
        .groupBy("day", "event_type")
        .agg(
            F.sum(
                F.expr("2 * CAST(c2 < c AS BIGINT)"
                       " + CAST(c2 = c AS BIGINT)")
            )
            .cast("bigint")
            .alias("r2m1")
        )
        .selectExpr("day", "event_type", "r2m1 + 1 AS r2")
    )
    # treatment index j = lexicographic rank of event_type (broadcast)
    t2 = types.selectExpr("event_type AS et3")
    jidx = (
        types.join(
            F.broadcast(t2), F.expr("et3 <= event_type")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("j"))
    )
    l2 = (
        r2.join(F.broadcast(jidx), "event_type")
        .agg(F.sum(F.expr("j * r2")).cast("bigint").alias("l2_stat"))
    )
    dims = grid.agg(
        F.countDistinct("day").cast("bigint").alias("n_blocks"),
        F.countDistinct("event_type").cast("bigint").alias("k_treat"),
    )
    return l2.crossJoin(F.broadcast(dims)).selectExpr(*_PAGE_FINAL)


def _page_sql() -> str:
    final = ",\n       ".join(_PAGE_FINAL)
    return f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS day, event_type
  FROM events WHERE event_type IS NOT NULL
),
days AS (SELECT DISTINCT day FROM base),
types AS (SELECT DISTINCT event_type FROM base),
counts AS (
  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2
),
grid AS (
  SELECT d.day, t.event_type, COALESCE(c.c, 0) AS c
  FROM days d CROSS JOIN types t
  LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
),
r2 AS (
  SELECT g.day, g.event_type,
         CAST(SUM(2 * CASE WHEN o.c < g.c THEN 1 ELSE 0 END
                  + CASE WHEN o.c = g.c THEN 1 ELSE 0 END)
              AS BIGINT) + 1 AS r2
  FROM grid g JOIN grid o ON o.day = g.day
  GROUP BY 1, 2
),
jidx AS (
  SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS j
  FROM types a JOIN types b ON b.event_type <= a.event_type
  GROUP BY 1
),
l2 AS (
  SELECT CAST(SUM(j * r2) AS BIGINT) AS l2_stat
  FROM r2 JOIN jidx USING (event_type)
),
dims AS (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_blocks,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k_treat
  FROM grid
)
SELECT {final}
FROM l2 CROSS JOIN dims
"""


REGISTRY["page_trend_daily"] = {
    "fn": page_trend_daily,
    "sql": _page_sql(),
}


# --------------------------------------------------------------------------
# Goodman-Kruskal gamma + Somers' d_yx between l_quantity (x) and
# l_discount (y): concordant/discordant/y-tied masses from the
# (x, y) CELL table's ordered pair join (x₂ > x₁ once per unordered
# cross-x pair) — cell products carried 128-bit. γ = (C−D)/(C+D);
# d_yx = (C−D)/(C+D+T_y) with T_y = x-differing y-tied pairs.
# --------------------------------------------------------------------------


def _gamma_final(div: str) -> list[str]:
    # pair masses are 128-bit internally; exported through
    # wide_to_double (driver-safe schema — DECIMAL/HUGEINT result
    # columns fail the driver hasher even on identical values)
    return [
        f"{_w2d('c_mass', div)} AS c_pairs",
        f"{_w2d('d_mass', div)} AS d_pairs",
        f"{_w2d('ty_mass', div)} AS ty_pairs",
        f"({_w2d('c_mass - d_mass', div)})"
        f" / ({_w2d('c_mass + d_mass', div)}) AS gamma",
        f"({_w2d('c_mass - d_mass', div)})"
        f" / ({_w2d('c_mass + d_mass + ty_mass', div)})"
        " AS somers_dyx",
    ]


def gamma_somers_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS y",
    ).groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    o = cells.selectExpr("x AS x2", "y AS y2", "n AS n2")
    pairs = cells.join(F.broadcast(o), F.expr("x2 > x"))
    agg = pairs.agg(
        F.sum(
            F.expr(
                "CASE WHEN y2 > y THEN CAST(n AS DECIMAL(38,0)) * n2"
                " ELSE CAST(0 AS DECIMAL(38,0)) END"
            )
        ).alias("c_mass"),
        F.sum(
            F.expr(
                "CASE WHEN y2 < y THEN CAST(n AS DECIMAL(38,0)) * n2"
                " ELSE CAST(0 AS DECIMAL(38,0)) END"
            )
        ).alias("d_mass"),
        F.sum(
            F.expr(
                "CASE WHEN y2 = y THEN CAST(n AS DECIMAL(38,0)) * n2"
                " ELSE CAST(0 AS DECIMAL(38,0)) END"
            )
        ).alias("ty_mass"),
    )
    return agg.selectExpr(*_gamma_final("DIV"))


def _gamma_sql() -> str:
    final = ",\n       ".join(_gamma_final("//"))
    return f"""
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS y,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2
),
agg AS (
  SELECT
    SUM(CASE WHEN b.y > a.y THEN CAST(a.n AS HUGEINT) * b.n
        ELSE CAST(0 AS HUGEINT) END) AS c_mass,
    SUM(CASE WHEN b.y < a.y THEN CAST(a.n AS HUGEINT) * b.n
        ELSE CAST(0 AS HUGEINT) END) AS d_mass,
    SUM(CASE WHEN b.y = a.y THEN CAST(a.n AS HUGEINT) * b.n
        ELSE CAST(0 AS HUGEINT) END) AS ty_mass
  FROM cells a JOIN cells b ON b.x > a.x
)
SELECT {final}
FROM agg
"""


REGISTRY["gamma_somers_lineitem"] = {
    "fn": gamma_somers_lineitem,
    "sql": _gamma_sql(),
}
