package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A2 — grouped geometry dissolve (reference: ogr2ogr
  * `SELECT ST_union(Geometry), * … GROUP BY iso_3166_2`,
  * `scripts/preparation.sh:149-151`, used to merge Maputo city into its
  * province).
  *
  * Implemented as a typed `Aggregator` (the custom-UDAF tier of SURVEY
  * §7.3): the buffer accumulates polygon shells; merge-time containment
  * pruning drops any shell whose vertices all lie inside another shell —
  * exact for the reference's nested-admin-area case (a city inside its
  * province), and a documented approximation for partially-overlapping
  * shells (kept as a multi-part result rather than re-traced boundaries;
  * exact boundary dissolve needs a full polygon-clipping kernel, which no
  * reference query actually requires).
  *
  * Distribution: Aggregator gives Spark partial aggregation — shells merge
  * map-side per partition before the group shuffle, so a group's rings
  * travel once.
  */
class GeomUnionAggregator extends Aggregator[Seq[Seq[Seq[Double]]], List[Seq[Seq[Seq[Double]]]], Seq[Seq[Seq[Double]]]] {

  override def zero: List[Seq[Seq[Seq[Double]]]] = Nil

  private def shellContained(a: Seq[Seq[Double]], bPoly: Seq[Seq[Seq[Double]]]): Boolean =
    a.forall(p => GeoFunctions.pointInPolygon(p(0), p(1), bPoly))

  protected def prune(polys: List[Seq[Seq[Seq[Double]]]]): List[Seq[Seq[Seq[Double]]]] =
    polys.filterNot { p =>
      polys.exists(q => (q ne p) && shellContained(p.head, q))
    }

  override def reduce(buf: List[Seq[Seq[Seq[Double]]]], poly: Seq[Seq[Seq[Double]]]): List[Seq[Seq[Seq[Double]]]] =
    if (poly == null || poly.isEmpty) buf else prune(poly :: buf)

  override def merge(a: List[Seq[Seq[Seq[Double]]]], b: List[Seq[Seq[Seq[Double]]]]): List[Seq[Seq[Seq[Double]]]] =
    prune(a ::: b)

  /** Output: all surviving rings flattened into one multi-polygon ring
    * list (shells first, then holes, per input polygon order).
    */
  override def finish(buf: List[Seq[Seq[Seq[Double]]]]): Seq[Seq[Seq[Double]]] =
    buf.reverse.flatten

  override def bufferEncoder: Encoder[List[Seq[Seq[Seq[Double]]]]] =
    Encoders.kryo[List[Seq[Seq[Seq[Double]]]]]

  override def outputEncoder: Encoder[Seq[Seq[Seq[Double]]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Seq[Seq[Double]]]]()
}

/** A2 exact path — same Aggregator shape (containment prune stays the
  * map-side fast path: contained shells can never contribute boundary),
  * but finish() runs the [[PolygonUnion]] slab-sweep boolean union, so
  * partially-OVERLAPPING shells come out as the traced merged boundary
  * (`ST_union` semantics, `preparation.sh:149-151`) instead of the base
  * aggregator's documented multi-part approximation. Output rings are
  * oriented outer-CCW / hole-CW; [[PolygonUnion.signedArea]] over them
  * is the exact covered area.
  */
class GeomUnionExactAggregator extends GeomUnionAggregator {
  override def finish(buf: List[Seq[Seq[Seq[Double]]]]): Seq[Seq[Seq[Double]]] =
    PolygonUnion.union(buf.reverse)
}

object GeomAggregates {
  /** DataFrame-facing dissolve: `df.groupBy(k).agg(geomUnion(col("rings")))`. */
  val geomUnion: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new GeomUnionAggregator)

  /** Exact-boundary dissolve (overlapping shells traced, not stacked). */
  val geomUnionExact: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new GeomUnionExactAggregator)

  /** Signed shoelace (outer-CCW positive, hole-CW negative) for
    * [[geomUnionExact]] output — the exact covered area.
    */
  val signedAreaUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((rings: Seq[Seq[Seq[Double]]]) => PolygonUnion.signedArea(rings))
}
