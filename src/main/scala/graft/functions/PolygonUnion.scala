package graft.functions

import scala.collection.mutable

/** A2 exact path — polygon boolean union by vertical slab (trapezoid)
  * decomposition (reference `ogr2ogr ... ST_union`,
  * `scripts/preparation.sh:149-151`, which traces the merged boundary of
  * partially-overlapping admin areas).
  *
  * Why slabs and not Greiner–Hormann/Weiler–Atherton: the clipping-
  * traversal algorithms degrade on exactly the inputs dissolve sees most
  * — shared edges, touching rectangles, T-vertices. The arrangement
  * approach used here has no special cases for those: the plane is cut
  * at every vertex and every pairwise edge-crossing x; inside one slab
  * no two edges cross, so each polygon's interior is an even-odd stack
  * of trapezoids, the union of stacks is a 1-D interval union, and the
  * union's boundary falls out as the top/bottom sides of merged
  * intervals plus the vertical coverage differences between adjacent
  * slabs (which also subsumes every vertical input edge with zero
  * special-casing). Boundary pieces are emitted oriented with the
  * covered region on the LEFT, so stitching yields outer rings CCW and
  * holes CW — the signed shoelace over the result is exactly the union
  * area.
  *
  * Complexity O((E + K)·E) for E edges and K crossings — dissolve groups
  * are admin-area-sized (the reference's largest is a province), and the
  * surrounding Aggregator has already containment-pruned map-side, so
  * this runs once per group on a handful of shells.
  */
object PolygonUnion {

  private final case class Edge(x1: Double, y1: Double, x2: Double, y2: Double) {
    def yAt(x: Double): Double =
      if (x == x1) y1 else if (x == x2) y2 else y1 + (y2 - y1) * (x - x1) / (x2 - x1)
    def minX: Double = math.min(x1, x2)
    def maxX: Double = math.max(x1, x2)
  }

  /** Oriented boundary piece (covered region to the LEFT of a→b). */
  private final case class Piece(ax: Double, ay: Double, bx: Double, by: Double)

  /** x of the interior crossing of two segments, if any (endpoint
    * touches are already cuts via the vertices).
    */
  private def crossingX(e1: Edge, e2: Edge): Option[Double] = {
    val d1x = e1.x2 - e1.x1; val d1y = e1.y2 - e1.y1
    val d2x = e2.x2 - e2.x1; val d2y = e2.y2 - e2.y1
    val den = d1x * d2y - d1y * d2x
    if (den == 0) None
    else {
      val t = ((e2.x1 - e1.x1) * d2y - (e2.y1 - e1.y1) * d2x) / den
      val u = ((e2.x1 - e1.x1) * d1y - (e2.y1 - e1.y1) * d1x) / den
      if (t > 0 && t < 1 && u > 0 && u < 1) Some(e1.x1 + t * d1x) else None
    }
  }

  /** Union of polygons (each = shell + holes, even-odd). Returns the
    * traced boundary rings, outer rings counter-clockwise and holes
    * clockwise, closed (first point repeated last). Signed shoelace over
    * the result sums to the covered area.
    */
  def union(polys: Seq[Seq[Seq[Seq[Double]]]]): Seq[Seq[Seq[Double]]] = {
    val clean = polys.filter(p => p != null && p.nonEmpty)
    if (clean.isEmpty) return Seq.empty

    val polyEdges: Array[Array[Edge]] = clean.map { rings =>
      val buf = mutable.ArrayBuffer.empty[Edge]
      rings.foreach { ring =>
        val pts = if (ring.nonEmpty && ring.head == ring.last) ring else ring ++ ring.take(1)
        var i = 0
        while (i < pts.length - 1) {
          val a = pts(i); val b = pts(i + 1)
          if (!(a(0) == b(0) && a(1) == b(1))) buf += Edge(a(0), a(1), b(0), b(1))
          i += 1
        }
      }
      buf.toArray
    }.toArray
    val allEdges = polyEdges.flatten

    // x-cuts: every vertex x + every pairwise interior-crossing x
    val cutSet = mutable.TreeSet.empty[Double]
    allEdges.foreach { e => cutSet += e.x1; cutSet += e.x2 }
    var i = 0
    while (i < allEdges.length) {
      var j = i + 1
      while (j < allEdges.length) {
        crossingX(allEdges(i), allEdges(j)).foreach(cutSet += _)
        j += 1
      }
      i += 1
    }
    val cuts = cutSet.toArray
    if (cuts.length < 2) return Seq.empty

    val pieces = mutable.ArrayBuffer.empty[Piece]
    // coverage (list of disjoint [lo, hi]) each slab contributes at its
    // left/right cut, indexed by cut position
    val covAtCutFromLeftSlab = Array.fill(cuts.length)(mutable.ArrayBuffer.empty[(Double, Double)])
    val covAtCutFromRightSlab = Array.fill(cuts.length)(mutable.ArrayBuffer.empty[(Double, Double)])

    var k = 0
    while (k < cuts.length - 1) {
      val xa = cuts(k); val xb = cuts(k + 1)
      val xm = xa / 2 + xb / 2
      // per-polygon even-odd interval stacks of slab-spanning edges
      val intervals = mutable.ArrayBuffer.empty[(Double, Double, Edge, Edge)] // (lo@xm, hi@xm, bot, top)
      polyEdges.foreach { edges =>
        val span = edges.filter(e => e.x1 != e.x2 && e.minX <= xa && e.maxX >= xb).sortBy(_.yAt(xm))
        var s = 0
        while (s + 1 < span.length) {
          intervals += ((span(s).yAt(xm), span(s + 1).yAt(xm), span(s), span(s + 1)))
          s += 2
        }
      }
      // 1-D union of the stacks (ordering is constant across the slab —
      // no two edges cross strictly inside it)
      val sorted = intervals.sortBy(t => (t._1, t._2))
      var idx = 0
      while (idx < sorted.length) {
        val bot = sorted(idx)._3
        var hi = sorted(idx)._2
        var top = sorted(idx)._4
        idx += 1
        while (idx < sorted.length && sorted(idx)._1 <= hi) {
          if (sorted(idx)._2 > hi) { hi = sorted(idx)._2; top = sorted(idx)._4 }
          idx += 1
        }
        val botA = bot.yAt(xa); val botB = bot.yAt(xb)
        val topA = top.yAt(xa); val topB = top.yAt(xb)
        // boundary pieces, covered side left: bottom runs +x, top runs −x
        pieces += Piece(xa, botA, xb, botB)
        pieces += Piece(xb, topB, xa, topA)
        covAtCutFromRightSlab(k) += ((botA, topA))
        covAtCutFromLeftSlab(k + 1) += ((botB, topB))
      }
      k += 1
    }

    // vertical boundary at every cut: symmetric difference of the left
    // and right slabs' coverage (subsumes all vertical input edges)
    var c = 0
    while (c < cuts.length) {
      val x = cuts(c)
      val left = normalize(covAtCutFromLeftSlab(c))
      val right = normalize(covAtCutFromRightSlab(c))
      val ys = mutable.TreeSet.empty[Double]
      left.foreach { case (a, b) => ys += a; ys += b }
      right.foreach { case (a, b) => ys += a; ys += b }
      val ysArr = ys.toArray
      var s = 0
      while (s < ysArr.length - 1) {
        val ya = ysArr(s); val yb = ysArr(s + 1)
        val mid = ya / 2 + yb / 2
        val inL = left.exists { case (a, b) => a <= mid && mid <= b }
        val inR = right.exists { case (a, b) => a <= mid && mid <= b }
        if (inL != inR && ya != yb) {
          // covered-left only → travel up (left normal −x); right only → down
          if (inL) pieces += Piece(x, ya, x, yb) else pieces += Piece(x, yb, x, ya)
        }
        s += 1
      }
      c += 1
    }

    stitch(pieces.toSeq)
  }

  /** Merge touching/overlapping coverage intervals into disjoint form. */
  private def normalize(ivs: mutable.ArrayBuffer[(Double, Double)]): Seq[(Double, Double)] = {
    val nonEmpty = ivs.filter(t => t._2 > t._1).sortBy(identity)
    val out = mutable.ArrayBuffer.empty[(Double, Double)]
    nonEmpty.foreach { case (a, b) =>
      if (out.nonEmpty && a <= out.last._2) {
        if (b > out.last._2) out(out.length - 1) = (out.last._1, b)
      } else out += ((a, b))
    }
    out.toSeq
  }

  /** Quantized endpoint key — adjacent slabs may evaluate the same
    * geometric point through different edges (a crossing AT a cut), so
    * exact-double keying can miss by an ulp; 1e-9 buckets with ±1
    * neighbor lookup absorb that without moving any coordinate.
    */
  private def keyOf(x: Double, y: Double): (Long, Long) =
    (math.round(x * 1e9), math.round(y * 1e9))

  private def stitch(rawPieces: Seq[Piece]): Seq[Seq[Seq[Double]]] = {
    // canonical piece order ⇒ the cycle decomposition (hence ring count
    // and order) is identical no matter how Aggregator merges interleaved
    val pieces = rawPieces.sortBy(p => (p.ax, p.ay, p.bx, p.by))
    val outgoing = mutable.HashMap.empty[(Long, Long), mutable.ArrayBuffer[Int]]
    pieces.zipWithIndex.foreach { case (p, idx) =>
      outgoing.getOrElseUpdate(keyOf(p.ax, p.ay), mutable.ArrayBuffer.empty) += idx
    }
    val used = Array.fill(pieces.length)(false)
    def takeFrom(x: Double, y: Double): Option[Int] = {
      val (kx, ky) = keyOf(x, y)
      val candidates = for {
        dx <- -1L to 1L; dy <- -1L to 1L
        ids <- outgoing.get((kx + dx, ky + dy)).toSeq
        id <- ids if !used(id)
      } yield id
      // min id = first in canonical piece order → deterministic walk
      candidates.sorted.headOption.map { id => used(id) = true; id }
    }
    val rings = mutable.ArrayBuffer.empty[Seq[Seq[Double]]]
    var start = 0
    while (start < pieces.length) {
      if (!used(start)) {
        used(start) = true
        val first = pieces(start)
        val ring = mutable.ArrayBuffer[Seq[Double]](Seq(first.ax, first.ay), Seq(first.bx, first.by))
        var cx = first.bx; var cy = first.by
        var closed = keyOf(cx, cy) == keyOf(first.ax, first.ay)
        var guard = pieces.length + 1
        while (!closed && guard > 0) {
          guard -= 1
          takeFrom(cx, cy) match {
            case Some(id) =>
              val p = pieces(id)
              // drop collinear intermediate points (pieces of one edge
              // split at slab cuts fuse back into a single segment)
              val n = ring.length
              val keep =
                if (n >= 2) {
                  val a = ring(n - 2)
                  val cross = (cx - a(0)) * (p.by - a(1)) - (cy - a(1)) * (p.bx - a(0))
                  math.abs(cross) > 1e-9
                } else true
              if (keep) ring += Seq(p.bx, p.by)
              else ring(n - 1) = Seq(p.bx, p.by)
              cx = p.bx; cy = p.by
              closed = keyOf(cx, cy) == keyOf(first.ax, first.ay)
            case None =>
              guard = 0 // open chain (numeric orphan) — drop it
          }
        }
        if (closed && ring.length >= 4) {
          ring(ring.length - 1) = ring.head // snap the ulp-close endpoint shut
          rings += ring.toSeq
        }
      }
      start += 1
    }
    rings.toSeq
  }

  /** Signed shoelace over traced rings: outers (CCW) positive, holes
    * (CW) negative — sums to the exact covered area of [[union]] output.
    */
  def signedArea(rings: Seq[Seq[Seq[Double]]]): Double =
    if (rings == null) 0.0
    else rings.map { ring =>
      var s = 0.0
      var i = 0
      while (i < ring.length - 1) {
        s += ring(i)(0) * ring(i + 1)(1) - ring(i + 1)(0) * ring(i)(1)
        i += 1
      }
      s / 2.0
    }.sum
}
