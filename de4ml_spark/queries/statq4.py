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
    " / NULLIF(sqrt(CAST(n_blocks AS DOUBLE) * CAST(k_treat AS DOUBLE)"
    " * CAST(k_treat AS DOUBLE) * CAST(k_treat + 1 AS DOUBLE)"
    " * (CAST(k_treat AS DOUBLE) * CAST(k_treat AS DOUBLE) - 1.0)),"
    " 0.0) AS z_page",
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


# --------------------------------------------------------------------------
# OLS trend of the daily event-count series on the calendar index:
# slope, intercept, R², and the slope t-statistic — the parametric
# trend quartet beside theil_sen (estimate) and mann_kendall (test).
# Everything flows from the exact integer moment six-tuple of
# (t, y); slope/intercept/R²/t are one staged IEEE chain
# (sxx/sxy/syy names match the n-scaled centered moments
# n·Σab − Σa·Σb, each a 128-bit integer through wide_to_double).
# --------------------------------------------------------------------------


def _ols_final() -> list[str]:
    return [
        "n",
        "slope",
        "intercept",
        "r2_fit",
        # t = slope / SE, SE² = (Syy/Sxx − slope²)/(n−2) in the
        # n-scaled moment algebra: SE² = (Syy − slope·Sxy)/((n−2)·Sxx)
        "slope / NULLIF(sqrt((syy_d - slope * sxy_d)"
        " / NULLIF(CAST(n - 2 AS DOUBLE) * sxx_d, 0.0)), 0.0)"
        " AS t_slope",
    ]


def ols_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    mind = daily.agg(F.min("t").alias("t0"))
    idx = daily.crossJoin(F.broadcast(mind)).selectExpr(
        "t - t0 AS t", "y"
    )
    mom = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).alias("stt"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * y")).alias("sty"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
    )
    big = "DECIMAL(38,0)"
    staged = mom.selectExpr(
        "n",
        "st",
        "sy",
        f"{_w2d(f'CAST(n AS {big}) * stt - CAST(st AS {big}) * st', 'DIV')}"
        " AS sxx_d",
        f"{_w2d(f'CAST(n AS {big}) * sty - CAST(st AS {big}) * sy', 'DIV')}"
        " AS sxy_d",
        f"{_w2d(f'CAST(n AS {big}) * syy - CAST(sy AS {big}) * sy', 'DIV')}"
        " AS syy_d",
    )
    s2 = staged.selectExpr(
        "n",
        "sxx_d",
        "sxy_d",
        "syy_d",
        "sxy_d / NULLIF(sxx_d, 0.0) AS slope",
        "(CAST(sy AS DOUBLE) - (sxy_d / NULLIF(sxx_d, 0.0))"
        " * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept",
        "(sxy_d * sxy_d) / NULLIF(sxx_d * syy_d, 0.0) AS r2_fit",
    )
    return s2.selectExpr(*_ols_final())


def _ols_sql() -> str:
    final = ",\n       ".join(_ols_final())
    big = "HUGEINT"
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT t - (SELECT MIN(t) FROM daily) AS t, y FROM daily
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(t AS HUGEINT) * t) AS stt,
         SUM(CAST(t AS HUGEINT) * y) AS sty,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM idx
),
staged AS (
  SELECT n, st, sy,
    {_w2d(f'CAST(n AS {big}) * stt - CAST(st AS {big}) * st', '//')}
      AS sxx_d,
    {_w2d(f'CAST(n AS {big}) * sty - CAST(st AS {big}) * sy', '//')}
      AS sxy_d,
    {_w2d(f'CAST(n AS {big}) * syy - CAST(sy AS {big}) * sy', '//')}
      AS syy_d
  FROM mom
),
s2 AS (
  SELECT n, sxx_d, sxy_d, syy_d,
         sxy_d / NULLIF(sxx_d, 0.0) AS slope,
         (CAST(sy AS DOUBLE) - (sxy_d / NULLIF(sxx_d, 0.0))
          * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
         (sxy_d * sxy_d) / NULLIF(sxx_d * syy_d, 0.0) AS r2_fit
  FROM staged
)
SELECT {final}
FROM s2
"""


REGISTRY["ols_daily_trend"] = {
    "fn": ols_daily_trend,
    "sql": _ols_sql(),
}


# --------------------------------------------------------------------------
# Breusch-Pagan (Koenker studentized form) heteroskedasticity test on
# the same daily OLS: LM = n·R²(ê², t). Residuals are carried EXACTLY
# as E_i = n·D·e_i = D(n·y_i − Σy) − N_b(n·t_i − Σt) (wide ints,
# D = nΣt²−(Σt)², N_b = nΣty−ΣtΣy), then milli-quantized via a
# half-up wide division back to e-scale (documented: LM is computed
# on e rounded to 1e-3 — deterministic both engines, recompute test
# replicates the quantization). The aux correlation uses exact
# integer moments of (e_u², t).
# --------------------------------------------------------------------------

_BP_FINAL = [
    "n",
    "r2_aux",
    "CAST(n AS DOUBLE) * r2_aux AS lm_breusch_pagan",
]


def breusch_pagan_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd2,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    mind = daily.agg(F.min("t").alias("t0"))
    idx = daily.crossJoin(F.broadcast(mind)).selectExpr(
        "t - t0 AS t", "y"
    )
    mom = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).alias("stt"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * y")).alias("sty"),
    )
    big = "DECIMAL(38,0)"
    dnb = mom.selectExpr(
        "n",
        "st",
        "sy",
        f"CAST(n AS {big}) * stt - CAST(st AS {big}) * st AS dd",
        f"CAST(n AS {big}) * sty - CAST(st AS {big}) * sy AS nb",
    )
    # E_i = D(n·y − Σy) − N_b(n·t − Σt); e_u = halfup(1000·E, n·D)
    ej = idx.crossJoin(F.broadcast(dnb)).selectExpr(
        "t",
        "n",
        "dd * (CAST(n AS DECIMAL(38,0)) * y - sy)"
        " - nb * (CAST(n AS DECIMAL(38,0)) * t - st) AS e_wide",
        "CAST(n AS DECIMAL(38,0)) * dd AS nd",
    )
    eq = ej.selectExpr(
        "t",
        "n",
        "CASE WHEN e_wide >= 0 THEN"
        f" CAST({_whd2('1000 * e_wide', 'CAST(nd AS BIGINT)', 'DIV')}"
        " AS BIGINT)"
        f" ELSE -CAST({_whd2('1000 * (-e_wide)', 'CAST(nd AS BIGINT)', 'DIV')}"
        " AS BIGINT) END AS e_u",
    )
    aux = eq.selectExpr(
        "t", "n", "CAST(e_u AS DECIMAL(38,0)) * e_u AS g"
    )
    amom = aux.groupBy("n").agg(
        F.sum("t").cast("bigint").alias("st"),
        F.sum("g").alias("sg"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).alias("stt"),
        F.sum(F.expr("g * t")).alias("sgt"),
        F.sum(F.expr("g * g")).alias("sgg"),
    )
    r2 = amom.selectExpr(
        "n",
        f"(({_w2d(f'CAST(n AS {big}) * sgt - CAST(st AS {big}) * sg', 'DIV')})"
        f" * ({_w2d(f'CAST(n AS {big}) * sgt - CAST(st AS {big}) * sg', 'DIV')}))"
        f" / (({_w2d(f'CAST(n AS {big}) * stt - CAST(st AS {big}) * st', 'DIV')})"
        f" * ({_w2d(f'CAST(n AS {big}) * sgg - sg * sg', 'DIV')}))"
        " AS r2_aux",
    )
    return r2.selectExpr(*_BP_FINAL)


def _bp_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd2,
    )

    big = "HUGEINT"
    final = ",\n       ".join(_BP_FINAL)
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT t - (SELECT MIN(t) FROM daily) AS t, y FROM daily
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(t AS HUGEINT) * t) AS stt,
         SUM(CAST(t AS HUGEINT) * y) AS sty
  FROM idx
),
dnb AS (
  SELECT n, st, sy,
         CAST(n AS HUGEINT) * stt - CAST(st AS HUGEINT) * st AS dd,
         CAST(n AS HUGEINT) * sty - CAST(st AS HUGEINT) * sy AS nb
  FROM mom
),
ej AS (
  SELECT t, n,
         dd * (CAST(n AS HUGEINT) * y - sy)
         - nb * (CAST(n AS HUGEINT) * t - st) AS e_wide,
         CAST(n AS HUGEINT) * dd AS nd
  FROM idx CROSS JOIN dnb
),
eq AS (
  SELECT t, n,
         CASE WHEN e_wide >= 0 THEN
           CAST({_whd2('1000 * e_wide', 'CAST(nd AS BIGINT)', '//')}
                AS BIGINT)
         ELSE
           -CAST({_whd2('1000 * (-e_wide)', 'CAST(nd AS BIGINT)', '//')}
                 AS BIGINT) END AS e_u
  FROM ej
),
aux AS (
  SELECT t, n, CAST(e_u AS HUGEINT) * e_u AS g FROM eq
),
amom AS (
  SELECT n,
         CAST(SUM(t) AS BIGINT) AS st,
         SUM(g) AS sg,
         SUM(CAST(t AS HUGEINT) * t) AS stt,
         SUM(g * t) AS sgt,
         SUM(g * g) AS sgg
  FROM aux GROUP BY 1
),
r2 AS (
  SELECT n,
    (({_w2d(f'CAST(n AS {big}) * sgt - CAST(st AS {big}) * sg', '//')})
     * ({_w2d(f'CAST(n AS {big}) * sgt - CAST(st AS {big}) * sg', '//')}))
    / (({_w2d(f'CAST(n AS {big}) * stt - CAST(st AS {big}) * st', '//')})
     * ({_w2d(f'CAST(n AS {big}) * sgg - sg * sg', '//')}))
      AS r2_aux
  FROM amom
)
SELECT {final}
FROM r2
"""


REGISTRY["breusch_pagan_daily"] = {
    "fn": breusch_pagan_daily,
    "sql": _bp_sql(),
}


# --------------------------------------------------------------------------
# Kendall's W — concordance of the k event-type "rankings" produced
# by each day (days = judges, types = objects; the effect-size
# companion to friedman_daily_value). Doubled midranks off page's
# dense grid: with R2_j = Σ_days 2·r_dj, S4 = Σ_j (R2_j − k(n+1))²
# = 4S and tie term T_d = Σ(t³−t) per day,
# W = 3·S4 / (k²(n³−n) − k·ΣT). Exact integers; one ratio.
# --------------------------------------------------------------------------


def _kw_final(div: str) -> list[str]:
    big = _big(div)
    den = (
        f"CAST(k_days AS {big}) * k_days * (CAST(n_types AS {big})"
        f" * n_types * n_types - n_types)"
        f" - CAST(k_days AS {big}) * sum_t"
    )
    return [
        "k_days",
        "n_types",
        f"3.0 * {_w2d('s4', div)} / NULLIF({_w2d(den, div)}, 0.0)"
        " AS kendalls_w",
    ]


def kendalls_w_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    o = grid.selectExpr("day", "event_type AS et2", "c AS c2")
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
    rsum = r2.groupBy("event_type").agg(
        F.sum("r2").cast("bigint").alias("r2_j")
    )
    dims = grid.agg(
        F.countDistinct("day").cast("bigint").alias("k_days"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )
    s4 = (
        rsum.crossJoin(F.broadcast(dims))
        .selectExpr(
            "k_days",
            "n_types",
            "(r2_j - k_days * (n_types + 1))"
            " * (r2_j - k_days * (n_types + 1)) AS dev2",
        )
        .groupBy("k_days", "n_types")
        .agg(F.sum("dev2").cast("bigint").alias("s4"))
    )
    # per-day tie correction: group sizes within the day's value ties
    tied = (
        grid.groupBy("day", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tt"))
        .agg(
            F.sum(
                F.expr("CAST(tt AS DECIMAL(38,0)) * tt * tt - tt")
            ).alias("sum_t")
        )
    )
    return s4.crossJoin(F.broadcast(tied)).selectExpr(
        *_kw_final("DIV")
    )


def _kw_sql() -> str:
    final = ",\n       ".join(_kw_final("//"))
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
rsum AS (
  SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2_j
  FROM r2 GROUP BY 1
),
dims AS (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS k_days,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM grid
),
s4 AS (
  SELECT k_days, n_types,
         CAST(SUM((r2_j - k_days * (n_types + 1))
                  * (r2_j - k_days * (n_types + 1))) AS BIGINT) AS s4
  FROM rsum CROSS JOIN dims
  GROUP BY 1, 2
),
tied AS (
  SELECT SUM(CAST(tt AS HUGEINT) * tt * tt - tt) AS sum_t
  FROM (
    SELECT day, c, CAST(COUNT(*) AS BIGINT) AS tt
    FROM grid GROUP BY 1, 2
  )
)
SELECT {final}
FROM s4 CROSS JOIN tied
"""


REGISTRY["kendalls_w_daily"] = {
    "fn": kendalls_w_daily,
    "sql": _kw_sql(),
}


# --------------------------------------------------------------------------
# Hoeffding's D independence test on the (l_quantity, l_discount)
# ordinal pair — the omnibus companion of gamma/Somers' D above (D
# detects NON-monotone dependence they cannot). Hollander-Wolfe ties
# convention (φ = ½ on ties), Hmisc::hoeffd's formula, carried in
# quadrupled integers on the SAME bounded cell table: per cell,
# R2 = 2·xless + xtie + 1, S2 likewise, and
# Q4 = 4·LL + 2·TL + 2·LT + (c−1) + 4 from the cell-pair join
# (the pair frame is DOMAIN-bounded: 50 × 11 cells → ≤ 550² rows at
# any corpus size). D1·16 = Σc(Q4−4)(Q4−8),
# D2·16 = Σc(R2−2)(R2−4)(S2−2)(S2−4), D3·16 = Σc(R2−4)(S2−4)(Q4−4);
# D = 30·((n−2)(n−3)D1₁₆ + D2₁₆ − 2(n−2)D3₁₆)
#   / (16·n(n−1)(n−2)(n−3)(n−4)). Exact to n ≲ 3e9 (the (2n)⁴ wide
# bound, same documented class as jarque_bera).
# --------------------------------------------------------------------------


def _hoeffding_final(div: str) -> list[str]:
    big = _big(div)
    num = (
        f"30.0 * ((CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0)"
        f" * {_w2d('d1_16', div)} + {_w2d('d2_16', div)}"
        f" - 2.0 * (CAST(n AS DOUBLE) - 2.0) * {_w2d('d3_16', div)})"
    )
    den = (
        "(16.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)"
        " * (CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0)"
        " * (CAST(n AS DOUBLE) - 4.0))"
    )
    return [
        "n AS n_rows",
        f"{num} / NULLIF({den}, 0.0) AS hoeffding_d",
    ]


def hoeffding_d_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS y",
    ).groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    o = cells.selectExpr("x AS x2", "y AS y2", "c AS c2")
    # every ordered cell pair once — the frame is DOMAIN-bounded
    # (50 quantities x 11 discounts), so the cross join is <= 550^2
    # rows at any corpus size; the CASE masses classify each pair
    rel = cells.crossJoin(F.broadcast(o))
    per = rel.groupBy("x", "y", "c").agg(
        F.sum(
            F.expr("CASE WHEN x2 < x THEN c2 ELSE 0 END")
        ).cast("bigint").alias("xless"),
        F.sum(
            F.expr("CASE WHEN x2 = x THEN c2 ELSE 0 END")
        ).cast("bigint").alias("xtie"),
        F.sum(
            F.expr("CASE WHEN y2 < y THEN c2 ELSE 0 END")
        ).cast("bigint").alias("yless"),
        F.sum(
            F.expr("CASE WHEN y2 = y THEN c2 ELSE 0 END")
        ).cast("bigint").alias("ytie"),
        F.sum(
            F.expr("CASE WHEN x2 < x AND y2 < y THEN c2 ELSE 0 END")
        ).cast("bigint").alias("ll"),
        F.sum(
            F.expr("CASE WHEN x2 = x AND y2 < y THEN c2 ELSE 0 END")
        ).cast("bigint").alias("tl"),
        F.sum(
            F.expr("CASE WHEN x2 < x AND y2 = y THEN c2 ELSE 0 END")
        ).cast("bigint").alias("lt"),
    )
    scaled = per.selectExpr(
        "c",
        "2 * xless + xtie + 1 AS r2",
        "2 * yless + ytie + 1 AS s2",
        "4 * ll + 2 * tl + 2 * lt + (c - 1) + 4 AS q4",
    )
    big = "DECIMAL(38,0)"
    agg = scaled.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(
            F.expr(
                f"CAST(c AS {big}) * (q4 - 4) * (q4 - 8)"
            )
        ).alias("d1_16"),
        F.sum(
            F.expr(
                f"CAST(c AS {big}) * (r2 - 2) * (r2 - 4)"
                " * (s2 - 2) * (s2 - 4)"
            )
        ).alias("d2_16"),
        F.sum(
            F.expr(
                f"CAST(c AS {big}) * (r2 - 4) * (s2 - 4) * (q4 - 4)"
            )
        ).alias("d3_16"),
    )
    return agg.selectExpr(*_hoeffding_final("DIV"))


def _hoeffding_sql() -> str:
    final = ",\n       ".join(_hoeffding_final("//"))
    return f"""
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
per AS (
  SELECT g.x, g.y, g.c,
         CAST(SUM(CASE WHEN o.x < g.x THEN o.c ELSE 0 END)
              AS BIGINT) AS xless,
         CAST(SUM(CASE WHEN o.x = g.x THEN o.c ELSE 0 END)
              AS BIGINT) AS xtie,
         CAST(SUM(CASE WHEN o.y < g.y THEN o.c ELSE 0 END)
              AS BIGINT) AS yless,
         CAST(SUM(CASE WHEN o.y = g.y THEN o.c ELSE 0 END)
              AS BIGINT) AS ytie,
         CAST(SUM(CASE WHEN o.x < g.x AND o.y < g.y THEN o.c ELSE 0
              END) AS BIGINT) AS ll,
         CAST(SUM(CASE WHEN o.x = g.x AND o.y < g.y THEN o.c ELSE 0
              END) AS BIGINT) AS tl,
         CAST(SUM(CASE WHEN o.x < g.x AND o.y = g.y THEN o.c ELSE 0
              END) AS BIGINT) AS lt
  FROM cells g CROSS JOIN cells o
  GROUP BY 1, 2, 3
),
scaled AS (
  SELECT c,
         2 * xless + xtie + 1 AS r2,
         2 * yless + ytie + 1 AS s2,
         4 * ll + 2 * tl + 2 * lt + (c - 1) + 4 AS q4
  FROM per
),
agg AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         SUM(CAST(c AS HUGEINT) * (q4 - 4) * (q4 - 8)) AS d1_16,
         SUM(CAST(c AS HUGEINT) * (r2 - 2) * (r2 - 4)
             * (s2 - 2) * (s2 - 4)) AS d2_16,
         SUM(CAST(c AS HUGEINT) * (r2 - 4) * (s2 - 4) * (q4 - 4))
           AS d3_16
  FROM scaled
)
SELECT {final}
FROM agg
"""


REGISTRY["hoeffding_d_lineitem"] = {
    "fn": hoeffding_d_lineitem,
    "sql": _hoeffding_sql(),
}


# --------------------------------------------------------------------------
# Distance correlation (Székely-Rizzo dCor) between l_quantity and
# l_discount — detects ARBITRARY dependence (zero iff independent),
# completing the ordinal battery: monotone (gamma/Somers), omnibus
# rank (Hoeffding D), and now energy-based. The V-statistic needs
# O(n²) pairwise |Δx||Δy| masses, but both variables live on the
# DOMAIN-bounded 50 × 11 cell grid, so every double sum collapses to
# the ≤550² cell-pair join (exact integers; |Δx| in units, |Δy| in
# cents):
#   S1 = ΣΣ c_a c_b dX_ab dY_ab / n²,  S2 = (ΣΣ c c dX)(ΣΣ c c dY)/n⁴,
#   S3 = Σ_i c_i·ax_i·by_i / n³ with ax_i = Σ_j c_j dX_ij,
#   dCov² = S1 + S2 − 2S3;  dVarX/dVarY the same with X=Y;
#   dCor = √(dCov²/√(dVarX·dVarY)).
# Everything is a 128-bit integer until the single IEEE tail.
# --------------------------------------------------------------------------


def _dcor_final(div: str) -> list[str]:
    big = _big(div)

    def dcov2(s1: str, rx: str, ry: str, s3: str, p2: str, p3: str, p4: str) -> str:
        # S1/n² + Sx·Sy/n⁴ − 2·S3/n³, with n-powers staged as doubles
        return (
            f"({_w2d(s1, div)} / {p2}"
            f" + ({_w2d(rx, div)} / {p2}) * ({_w2d(ry, div)} / {p2})"
            f" - 2.0 * {_w2d(s3, div)} / {p3})"
        )

    p2 = "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    p3 = "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    dxy = dcov2("s1_xy", "sx_tot", "sy_tot", "s3_xy", p2, p3, "")
    dxx = dcov2("s1_xx", "sx_tot", "sx_tot", "s3_xx", p2, p3, "")
    dyy = dcov2("s1_yy", "sy_tot", "sy_tot", "s3_yy", p2, p3, "")
    return [
        "n AS n_rows",
        f"{dxy} AS dcov2",
        f"sqrt({dxy} / NULLIF(sqrt(({dxx}) * ({dyy})), 0.0)) AS dcor",
    ]


def distance_correlation_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS y",
    ).groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    o = cells.selectExpr("x AS x2", "y AS y2", "c AS c2")
    big = "DECIMAL(38,0)"
    # per-cell row sums over the bounded pair frame
    per = (
        cells.crossJoin(F.broadcast(o))
        .groupBy("x", "y", "c")
        .agg(
            F.sum(
                F.expr(f"CAST(c2 AS {big}) * abs(x - x2)")
            ).alias("ax"),
            F.sum(
                F.expr(f"CAST(c2 AS {big}) * abs(y - y2)")
            ).alias("by_"),
            F.sum(
                F.expr(
                    f"CAST(c2 AS {big}) * abs(x - x2) * abs(y - y2)"
                )
            ).alias("axy"),
            F.sum(
                F.expr(
                    f"CAST(c2 AS {big}) * abs(x - x2) * abs(x - x2)"
                )
            ).alias("axx"),
            F.sum(
                F.expr(
                    f"CAST(c2 AS {big}) * abs(y - y2) * abs(y - y2)"
                )
            ).alias("ayy"),
        )
    )
    agg = per.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.expr(f"CAST(c AS {big}) * axy")).alias("s1_xy"),
        F.sum(F.expr(f"CAST(c AS {big}) * axx")).alias("s1_xx"),
        F.sum(F.expr(f"CAST(c AS {big}) * ayy")).alias("s1_yy"),
        F.sum(F.expr(f"CAST(c AS {big}) * ax")).alias("sx_tot"),
        F.sum(F.expr(f"CAST(c AS {big}) * by_")).alias("sy_tot"),
        F.sum(F.expr(f"CAST(c AS {big}) * ax * by_")).alias("s3_xy"),
        F.sum(F.expr(f"CAST(c AS {big}) * ax * ax")).alias("s3_xx"),
        F.sum(F.expr(f"CAST(c AS {big}) * by_ * by_")).alias("s3_yy"),
    )
    return agg.selectExpr(*_dcor_final("DIV"))


def _dcor_sql() -> str:
    final = ",\n       ".join(_dcor_final("//"))
    return f"""
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
per AS (
  SELECT g.x, g.y, g.c,
         SUM(CAST(o.c AS HUGEINT) * abs(g.x - o.x)) AS ax,
         SUM(CAST(o.c AS HUGEINT) * abs(g.y - o.y)) AS by_,
         SUM(CAST(o.c AS HUGEINT) * abs(g.x - o.x) * abs(g.y - o.y))
           AS axy,
         SUM(CAST(o.c AS HUGEINT) * abs(g.x - o.x) * abs(g.x - o.x))
           AS axx,
         SUM(CAST(o.c AS HUGEINT) * abs(g.y - o.y) * abs(g.y - o.y))
           AS ayy
  FROM cells g CROSS JOIN cells o
  GROUP BY 1, 2, 3
),
agg AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         SUM(CAST(c AS HUGEINT) * axy) AS s1_xy,
         SUM(CAST(c AS HUGEINT) * axx) AS s1_xx,
         SUM(CAST(c AS HUGEINT) * ayy) AS s1_yy,
         SUM(CAST(c AS HUGEINT) * ax) AS sx_tot,
         SUM(CAST(c AS HUGEINT) * by_) AS sy_tot,
         SUM(CAST(c AS HUGEINT) * ax * by_) AS s3_xy,
         SUM(CAST(c AS HUGEINT) * ax * ax) AS s3_xx,
         SUM(CAST(c AS HUGEINT) * by_ * by_) AS s3_yy
  FROM per
)
SELECT {final}
FROM agg
"""


REGISTRY["distance_correlation_lineitem"] = {
    "fn": distance_correlation_lineitem,
    "sql": _dcor_sql(),
}
