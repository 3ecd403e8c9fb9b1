"""Round-12 registrations, batch 9: the spatial tier — grid-bucketed
radius join and density grid.

Spatial joins are the one classic warehouse workload family the engine
did not yet cover. The standard distributed formulation (PostGIS's
ST_DWithin + GiST translated to MapReduce; Aji et al. 2013 Hadoop-GIS;
Spark's own range-join strategy): bucket points into radius-sized grid
cells, replicate ONE side to its 3x3 cell neighborhood, equi-join on
cell, then verify exact distance — the pair volume is bounded by local
density instead of n^2.

1. ``spatial_radius_join`` — all point pairs within EPS: probe side
   replicated to 9 cells (a pair meets in EXACTLY one cell — the one
   holding the build point — so no dedup pass is needed), equi-join,
   exact squared-distance verify, id-ordered.
2. ``spatial_density_grid`` — per-cell point counts + exact coordinate
   sums, the heatmap/partition-planning aggregate.

Coordinates are derived deterministically from doc_id on a DYADIC
lattice (multiples of 1/64): differences, squares and sums of such
values are exact binary fractions, so the distance predicate
dist2 <= EPS^2 and the cell floor are bit-identical across engines —
no trig, no rounding grid, oracle-EXACT (the repo's dyadic idiom; a
real lat/lon deployment swaps in haversine and a tolerance band).

Scale posture (100 TB of points): the join key is the grid cell, so
the shuffle is cell-partitioned and the only blowup factor is the
constant 9x probe replication (map-only explode of a 9-literal array);
pair work is sum-of-squared-cell-densities — local density, never n^2
(the oracle IS the n^2 form, on fixture scales). Density skew in a hot
cell is ordinary groupBy skew: AQE skew-split applies, and halving the
cell size quarters per-cell load — the documented tuning knob.

Semantic contract with the reference engine: map (assign cells, emit
replicas) -> shuffle by cell -> reduce (pairwise verify within cell),
the Emit2/Reduce shape of `/root/reference/MapReduceClient.h:47-51`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

EPS = 2.0  # join radius (grid cell edge = EPS)
GRID = 8192  # coordinate lattice: x, y in [0, 128) at 1/64 resolution

# (id, x, y) on the dyadic lattice: k/64 with k a seeded md5 hash — NOT a
# linear-congruential k = id*prime % m form, whose points are a rank-1
# lattice whose minimum vector exceeds the join radius (the first fixture
# produced ZERO qualifying pairs); hashes scatter uniformly
_PTS_SQL = f"""
pts AS (
  SELECT doc_id AS id,
         CAST(CAST(('0x' || substr(md5('sx:' || doc_id), 1, 12)) AS BIGINT)
              % {GRID} AS DOUBLE) / 64 AS x,
         CAST(CAST(('0x' || substr(md5('sy:' || doc_id), 1, 12)) AS BIGINT)
              % {GRID} AS DOUBLE) / 64 AS y
  FROM documents WHERE doc_id IS NOT NULL
)
"""


def _coord(salt: str) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col("doc_id"))), 1, 12), 16, 10
    ).cast("bigint")
    return (h % GRID).cast("double") / 64


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    return d.select(
        F.col("doc_id").alias("id"),
        _coord("sx:").alias("x"),
        _coord("sy:").alias("y"),
    )


@register(
    "spatial_radius_join",
    oracle=f"""
WITH {_PTS_SQL}
SELECT a.id AS id_a, b.id AS id_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {EPS * EPS!r}
""",
)
def spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs within EPS via the grid-bucketed join; the oracle is the
    quadratic definition. dist2 is exact dyadic arithmetic on both
    engines — no rounding grid anywhere."""
    p = points(spark, sf_dir)
    cell = lambda c: F.floor(c / EPS).cast("bigint")  # noqa: E731
    build = p.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        cell(F.col("x")).alias("cx"),
        cell(F.col("y")).alias("cy"),
    )
    # probe side replicated to its 3x3 neighborhood: a qualifying pair
    # meets exactly once — in the BUILD point's home cell
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        p.select(
            F.col("id").alias("id_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            F.explode(offs).alias("o"),
        )
        .select(
            "id_b",
            "xb",
            "yb",
            (cell(F.col("xb")) + F.col("o.dx")).alias("cx"),
            (cell(F.col("yb")) + F.col("o.dy")).alias("cy"),
        )
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        build.join(probe, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (dist2 <= F.lit(EPS * EPS)))
        .select("id_a", "id_b", dist2.alias("dist2"))
    )


@register(
    "spatial_density_grid",
    oracle=f"""
WITH {_PTS_SQL}
SELECT CAST(FLOOR(x / {EPS!r}) AS BIGINT) AS cell_x,
       CAST(FLOOR(y / {EPS!r}) AS BIGINT) AS cell_y,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       SUM(x) AS sum_x, SUM(y) AS sum_y
FROM pts GROUP BY 1, 2
""",
)
def spatial_density_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell counts + exact dyadic coordinate sums — the heatmap /
    skew-planning aggregate (one map-side-combined shuffle)."""
    p = points(spark, sf_dir)
    return p.groupBy(
        F.floor(F.col("x") / EPS).cast("bigint").alias("cell_x"),
        F.floor(F.col("y") / EPS).cast("bigint").alias("cell_y"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
    )
