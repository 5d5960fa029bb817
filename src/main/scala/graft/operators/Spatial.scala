package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial operators (SURVEY.md §2.3 J8/J9, §2.4 A4).
  *
  * Physical strategy: the reference builds an in-memory rbush R-tree over
  * areas and probes per way (`utils.js:83-98`,
  * `indicator-from-areas.js:74-84`). The Spark-native equivalent broadcasts
  * the (small) area side and evaluates the cheap bbox-overlap predicate as
  * the join condition — a BroadcastNestedLoopJoin where the bbox test
  * prunes before the exact geometry UDF runs. At 100 TB of ways the stream
  * side never shuffles; if the AREA side ever outgrew broadcast, the
  * upgrade path is grid-cell bucketing (explode both sides by cell id →
  * equi-join on cell), which keeps the same operator contract.
  */
object Spatial {

  /** J9 — bbox-prefiltered spatial join: `ways ⋈ areas` on bbox overlap,
    * exact predicate applied afterwards. `waysBbox`/`areasBbox` are
    * [minX, minY, maxX, maxY] array columns.
    */
  def bboxJoin(ways: DataFrame, areas: DataFrame, waysBbox: Column, areasBbox: Column): DataFrame =
    ways.join(broadcast(areas), GeoFunctions.bboxOverlap(waysBbox, areasBbox))

  /** J9 scale path — grid-cell bucketed spatial join for when the area
    * side outgrows broadcast: both sides explode to the grid cells their
    * bbox covers, equi-join on cell id (a plain shuffle hash join — no
    * cross product anywhere), refine with the exact bbox test.
    *
    * Pair dedup (a pair shares many cells) uses the reference-cell trick:
    * a pair is emitted ONLY from the cell containing the top-left corner
    * of the bbox intersection — exactly one cell qualifies, so no
    * `distinct()` shuffle is needed. Skew: pick `cellSize` near the median
    * bbox diagonal; pathological hot cells fall to AQE skew-join handling.
    */
  def bboxJoinGrid(left: DataFrame, right: DataFrame, leftBbox: Column, rightBbox: Column, cellSize: Double): DataFrame = {
    def cells(b: Column): Column = {
      val x0 = floor(b.getItem(0) / cellSize).cast("long")
      val x1 = floor(b.getItem(2) / cellSize).cast("long")
      val y0 = floor(b.getItem(1) / cellSize).cast("long")
      val y1 = floor(b.getItem(3) / cellSize).cast("long")
      flatten(transform(sequence(x0, x1), cx => transform(sequence(y0, y1), cy => struct(cx.as("cx"), cy.as("cy")))))
    }
    val l = left.withColumn("__lbox", leftBbox).withColumn("__cell", explode(cells(col("__lbox"))))
    val r = right.withColumn("__rbox", rightBbox).withColumn("__cell", explode(cells(col("__rbox"))))
    val ownerX = floor(greatest(col("__lbox").getItem(0), col("__rbox").getItem(0)) / cellSize).cast("long")
    val ownerY = floor(greatest(col("__lbox").getItem(1), col("__rbox").getItem(1)) / cellSize).cast("long")
    l.join(r, Seq("__cell"))
      .filter(GeoFunctions.bboxOverlap(col("__lbox"), col("__rbox")))
      .filter(col("__cell.cx") === ownerX && col("__cell.cy") === ownerY)
      .drop("__cell", "__lbox", "__rbox")
  }

  /** J8 — nearest-neighbour (argmin) join, window form: for each left row
    * the single closest right row by `distCol`, deterministic tie-break on
    * `tieCol`. The window sorts every candidate row — prefer
    * `nearestJoinAgg` on big pair sets.
    */
  def nearestJoinWindow(pairs: DataFrame, leftKey: String, distCol: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy(col(leftKey)).orderBy(distCol, tieCol)
    pairs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** J8 scale form — argmin via `min_by` hash aggregation: partial (map-
    * side) combine collapses each key to ONE candidate before the shuffle,
    * so a billions-row candidate set shuffles only |left keys| rows — vs
    * the window form shuffling and sorting every candidate. Ordering is
    * the lexicographic struct (dist, tie), same determinism contract.
    * `payload` columns are carried through on the winning row.
    */
  def nearestJoinAgg(
      pairs: DataFrame,
      leftKey: String,
      distCol: Column,
      tieCol: Column,
      payload: Seq[String]): DataFrame = {
    val winner = min_by(
      struct((payload.map(col) :+ distCol.as("__dist")): _*),
      struct(distCol, tieCol))
    pairs
      .groupBy(col(leftKey))
      .agg(winner.as("__nn"))
      .select(col(leftKey) +: payload.map(p => col(s"__nn.$p")) :+ col("__nn.__dist").as("dist"): _*)
  }

  /** A11 equivalent — zonal statistics over a cell table (reference
    * `scripts/imgstats/img-stats.py:98-104` computes count/mean/min/max of
    * raster cells under each polygon + `percent = count/total·100`; the
    * raster decode itself is upstream, its cell table is the input here):
    * point-in-polygon join (bbox-prefiltered) → groupBy polygon.
    */
  def zonalStats(cells: DataFrame, polys: DataFrame, gridCell: Double = 2.0): DataFrame = {
    // total cell count as an in-plan broadcast 1-row aggregate (the
    // `Relational.scaleScore` pattern) — NOT a driver-side count(): the
    // whole query stays ONE lazy plan / one job, no extra scan of `cells`
    // before the query's own job runs.
    val total = cells.agg(count(lit(1)).as("__total"))
    val cellsB = cells.withColumn("__pbox", array(col("x"), col("y"), col("x"), col("y")))
    val polysB = polys.withColumn("__abox", GeoFunctions.bboxUdf(flatten(col("rings"))))
    // grid equi-join, not nested-loop: points explode to exactly one grid
    // cell, zones to the cells they cover
    bboxJoinGrid(cellsB, polysB, col("__pbox"), col("__abox"), gridCell)
      .filter(GeoFunctions.pointInPolygonUdf(col("x"), col("y"), col("rings")))
      .groupBy(col("zone_id"))
      .agg(
        count(lit(1)).as("n_cells"),
        round(avg(col("value")), 4).as("mean_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .crossJoin(broadcast(total))
      .withColumn("percent", round(col("n_cells") * 100.0 / col("__total"), 4))
      .drop("__total")
  }

  /** J8 fastest form — argmin via a packed-Long `min()`: (dist rounded to
    * 1e-6, tie key) packs into one comparable Long, so the aggregate is a
    * plain `min` — fully hash-aggregable (HashAggregate + map-side
    * partials), unlike `min_by(struct)` which falls back to SortAggregate
    * and locally sorts every candidate row.
    *
    * Bounds (documented AND runtime-enforced): dist in [0, 2^43/1e6 ≈
    * 8.8e6 km) and 0 ≤ tie key < 2^20. Out-of-range input raises an error
    * instead of silently corrupting the argmin (a tie key ≥ 2^20 would
    * bleed into the distance bits). Unpacked dist is bit-identical to
    * `round(dist, 6)` (both resolve to the double nearest n/1e6).
    */
  def nearestJoinAggPacked(
      pairs: DataFrame,
      leftKey: String,
      distCol: Column,
      tieKeyCol: Column): DataFrame = {
    val distL = round(distCol * 1e6).cast("long")
    val packed = when(
      tieKeyCol < 0 || tieKeyCol >= lit(1048576L) || distCol < 0 || distL >= lit(8796093022208L),
      raise_error(concat(
        lit("nearestJoinAggPacked bounds exceeded (need 0<=dist<8.8e6, 0<=tieKey<2^20): dist="),
        distCol.cast("string"), lit(" tieKey="), tieKeyCol.cast("string"))).cast("long")
    ).otherwise(distL * lit(1048576L) + tieKeyCol)
    pairs
      .groupBy(col(leftKey))
      .agg(min(packed).as("__packed"))
      .select(
        col(leftKey),
        pmod(col("__packed"), lit(1048576L)).as("__tie"),
        // integer div BEFORE the double conversion: packed itself exceeds
        // double's 2^53 exact range, the quotient does not
        (expr("__packed div 1048576") / 1e6).as("dist"))
  }

  /** A4 + J9 + F11/F12 — weighted overlay (reference
    * `indicator-from-areas.js:68-134`, the §3.2 representative query):
    * for each (way, area) candidate pair from the bbox join, split the way
    * by the area boundary (F11), keep pieces whose first-segment midpoint
    * (F9) lies strictly inside (F12), weight `len(piece)/len(way) · value`
    * (geodesic lengths, F8), then sum per way and scale-score (A1).
    *
    * `ways`: (way_id, coords array<array<double>>);
    * `areas`: (area_id, rings array<array<array<double>>>, value).
    */
  def indicatorFromAreas(ways: DataFrame, areas: DataFrame): DataFrame =
    indicatorFromAreasImpl(ways, areas, gridCell = None)

  /** Scale form: identical semantics, but candidate pairs come from the
    * grid-cell equi-join instead of broadcasting the area side — use when
    * areas outgrow broadcast. Equality with the broadcast form is spec-
    * tested.
    */
  def indicatorFromAreasGrid(ways: DataFrame, areas: DataFrame, gridCell: Double): DataFrame =
    indicatorFromAreasImpl(ways, areas, Some(gridCell))

  private def indicatorFromAreasImpl(ways: DataFrame, areas: DataFrame, gridCell: Option[Double]): DataFrame = {
    val contribUdf = udf {
      (coords: Seq[Seq[Double]], rings: Seq[Seq[Seq[Double]]], value: Double) =>
        val wayLen = GeoFunctions.lineLengthKm(coords)
        if (wayLen == 0.0) 0.0
        else {
          val pieces = GeoFunctions.lineSplit(coords, rings)
          pieces.iterator.map { piece =>
            val mid = GeoFunctions.firstSegmentMidpoint(piece)
            if (GeoFunctions.pointInPolygon(mid(0), mid(1), rings))
              GeoFunctions.lineLengthKm(piece) / wayLen * value
            else 0.0
          }.sum
        }
    }
    val waysB = ways.withColumn("__wbox", GeoFunctions.bboxUdf(col("coords")))
    val areasB = areas.withColumn("__abox", GeoFunctions.bboxUdf(flatten(col("rings"))))
    val candidates = gridCell match {
      case Some(cell) => bboxJoinGrid(waysB, areasB, col("__wbox"), col("__abox"), cell)
      case None => bboxJoin(waysB, areasB, col("__wbox"), col("__abox"))
    }
    val pairs = candidates
      .withColumn("__contrib", contribUdf(col("coords"), col("rings"), col("value")))
      .filter(col("__contrib") > 0.0)
    val summed = pairs
      .groupBy(col("way_id"))
      .agg(sum(col("__contrib")).as("value"))
    Relational.scaleScore2(summed, "value")
  }
}
