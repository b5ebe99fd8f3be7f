"""Coords query route: the consumer for the router's 'coords' class.

Reference lifecycle parity (the last unreplicated entry point, SURVEY.md
§3.3): the reference GUI regex-detects coordinate-shaped input
(``geo_gui.py:203-218``), then answers it with a sector-pruned nearest-
neighbor lookup over the point index — it ranks sectors by distance, scans
at most ``MAX_SEKTS = 25`` of the ~40,000 sectors nearest-first
(``geo_gui.py:180-186, 251-278``) — and finally point-fetches the winning
rows. Here the same three phases are pure dataflow:

1. parse      — regexp-extract the two signed decimals ('.' or ',' decimal
                separator), all column expressions;
2. pruned NN  — grid-sector index: points carry (cell_x, cell_y); the
                query's ``n_sectors`` nearest non-empty sectors are chosen
                by sector-centroid distance (window top-n over the distinct-
                sector table, which is small and broadcastable), and only
                points in those sectors are scanned (broadcast-join prune;
                on a cell-partitioned table the same literal cell list
                reaches PartitionFilters, exactly like the term-bucket
                prune in ``topk._pruned_scan``);
3. fetch      — the k winners (a handful of rows) broadcast-join back to
                the wide source table for display metadata (J9/J10).

Like the reference's bounded scan, the result is exact whenever the true
NN lies within the ``n_sectors`` nearest sectors (always true for in-domain
queries with dense grids) and best-effort-bounded otherwise — semantics the
DuckDB oracle replicates sector-for-sector.

All distance math is float64 with identical expression shape on both sides
(dx*dx + dy*dy, round(sqrt(...), 6) only at the end) so results hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COORD_EXTRACT = r"^\s*(-?\d+[.,]\d+)[\s,]+(-?\d+[.,]\d+)\s*$"
DIST_DECIMALS = 6


def customer_points(spark, sf_dir: str) -> DataFrame:
    """Deterministic 2-d point table derived from the customer keys (the
    sandbox has no real geo data): px, py in [0, 100) on a 0.1 grid, with
    (cell_x, cell_y) = unit-grid sector ids. At scale this table would be
    written partitioned by (cell_x, cell_y) — the sector index."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    px = (F.col("c_custkey") * 37 % 1000) / 10.0
    py = (F.col("c_custkey") * 91 % 1000) / 10.0
    return cust.select(
        F.col("c_custkey").alias("point_id"),
        px.alias("px"),
        py.alias("py"),
        F.floor(px).cast("int").alias("cell_x"),
        F.floor(py).cast("int").alias("cell_y"),
    )


def parse_coords(queries: DataFrame, text_col: str = "query_text") -> DataFrame:
    """'52.2297, 21.0122' -> (qx, qy) doubles; ',' decimal separator
    normalized (reference P5 analog: the GUI accepts both)."""

    def num(group: int):
        s = F.regexp_extract(F.col(text_col), COORD_EXTRACT, group)
        return F.replace(s, F.lit(","), F.lit(".")).cast("double")

    return queries.withColumn("qx", num(1)).withColumn("qy", num(2))


def route_coords_lookup(
    queries: DataFrame,
    points: DataFrame,
    fetch: DataFrame | None = None,
    fetch_key: str = "point_id",
    fetch_cols: list[str] | None = None,
    n_sectors: int = 9,
    k: int = 3,
) -> DataFrame:
    """Full coords lifecycle: route -> parse -> sector-pruned NN -> fetch.

    queries: (query_id, query_text); only rows the router classifies
    'coords' are answered. Output: (query_id, rank, point_id, px, py, dist
    [, fetch_cols...]).
    """
    from .textstats import query_router

    routed = query_router(queries).filter(F.col("route") == "coords")
    coords = parse_coords(queries.join(routed, "query_id").select(queries["*"]))
    coords = coords.select("query_id", "qx", "qy")

    # sector directory: distinct non-empty cells (bounded by grid size —
    # 10^4 here, ~40k in the reference — always broadcastable)
    sectors = points.groupBy("cell_x", "cell_y").agg(F.count(F.lit(1)).alias("n_pts"))
    dx = (F.col("cell_x").cast("double") + 0.5) - F.col("qx")
    dy = (F.col("cell_y").cast("double") + 0.5) - F.col("qy")
    ranked_sect = (
        coords.crossJoin(F.broadcast(sectors))  # tiny queries x small sectors
        .withColumn("sdist", dx * dx + dy * dy)
        .withColumn(
            "srank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("sdist"), F.asc("cell_x"), F.asc("cell_y")
                )
            ),
        )
        .filter(F.col("srank") <= n_sectors)
        .select("query_id", "qx", "qy", "cell_x", "cell_y")
    )

    # pruned scan: only points inside the chosen sectors are touched
    ddx = F.col("px") - F.col("qx")
    ddy = F.col("py") - F.col("qy")
    cand = points.join(F.broadcast(ranked_sect), ["cell_x", "cell_y"]).withColumn(
        "dist", F.round(F.sqrt(ddx * ddx + ddy * ddy), DIST_DECIMALS)
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("point_id"))
    hits = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "point_id", "px", "py", "dist")
    )
    if fetch is None:
        return hits
    cols = fetch_cols or [c for c in fetch.columns if c != fetch_key]
    return F.broadcast(hits).join(
        fetch.withColumnRenamed(fetch_key, "point_id"), "point_id"
    ).select("query_id", "rank", "point_id", "px", "py", "dist", *cols)
