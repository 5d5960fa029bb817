package graft.operators

import graft.functions.GeoFunctions

/** Balanced 3D KD-tree over unit-sphere points — the J8 nearest-join
  * fast path for a broadcast-sized right side (reference semantics:
  * `bridges.js` nearest-supplier style argmin; see
  * [[Spatial.nearestJoinGridKm]] for the operator contract).
  *
  * EXACTNESS: great-circle distance is a strictly monotone function of
  * 3D chord distance between the unit vectors (d_km = 2R·asin(chord/2)),
  * so the Euclidean nearest neighbour on the sphere IS the haversine
  * nearest neighbour. The packed-argmin contract
  * ([[Spatial.nearestJoinAggPacked]]) orders by (round(km·1e6), key), so
  * after the by-chord winner is found, every point whose distance could
  * round into the same 1e-6-km bin is range-collected (bin upper edge
  * +0.1 mm slack, chord bound widened by 1e-9 relative + 1e-20 absolute
  * to absorb FP divergence between the chord and haversine formulas, and
  * clamped to the full sphere past the antipodal fold where
  * 2·sin(km/2R) stops growing) and the (round(km·1e6), key) minimum over
  * that bin is returned — bit-identical to the distributed argmin, ties
  * and all (spec: SpatialSpec "J8 grid nearest ≡ cross-join nearest").
  *
  * The final km for every collected candidate is computed by
  * [[GeoFunctions.haversineKm]], the same operation sequence the Column
  * form codegens (radians → sin²/cos·cos·sin² → 2R·asin(min(1,√a))), and
  * rounded with the same java.math.BigDecimal HALF_UP that Spark's
  * `round` uses — so the returned (n, key) matches the SQL plan's bits.
  *
  * Thread safety: one instance is broadcast per executor JVM and probed
  * concurrently by every task thread, so the tree arrays are read-only
  * and all search state lives in a per-call [[SphereKd.State]].
  */
final class SphereKd private[operators] (
    px: Array[Double],
    py: Array[Double],
    pz: Array[Double],
    lons: Array[Double],
    lats: Array[Double],
    keys: Array[Long]) extends Serializable {

  /** (round(km·1e6), key) of the argmin under the packed ordering. */
  def nearestPacked(qlon: Double, qlat: Double): (Long, Long) = {
    val st = new SphereKd.State
    val phi = math.toRadians(qlat)
    val lam = math.toRadians(qlon)
    val cp = math.cos(phi)
    st.qx = cp * math.cos(lam); st.qy = cp * math.sin(lam); st.qz = math.sin(phi)
    st.qlon = qlon; st.qlat = qlat
    nearest(0, keys.length, 0, st)
    val kmBest = GeoFunctions.haversineKm(qlon, qlat, lons(st.bestIdx), lats(st.bestIdx))
    val nBest = SphereKd.roundMicroKm(kmBest)
    // rounding-bin upper edge: anything scoring n <= nBest has km·1e6 <
    // nBest + 0.5 (HALF_UP); +0.1 bin slack then FP margins on the chord
    val kmUp = (nBest + 0.6) / 1e6
    val t = kmUp / (2.0 * GeoFunctions.EarthRadiusKm)
    val cUp = if (t >= math.Pi / 2) 2.0 else 2.0 * math.sin(t)
    st.bound2 = cUp * cUp * (1.0 + 1e-9) + 1e-20
    st.bn = Long.MaxValue; st.bk = Long.MaxValue
    collect(0, keys.length, 0, st)
    (st.bn, st.bk)
  }

  // implicit balanced layout: node = midpoint of [lo, hi), axis cycles
  private def nearest(lo: Int, hi: Int, ax: Int, st: SphereKd.State): Unit = {
    if (lo >= hi) return
    val mid = (lo + hi) >>> 1
    val dx = st.qx - px(mid); val dy = st.qy - py(mid); val dz = st.qz - pz(mid)
    val d2 = dx * dx + dy * dy + dz * dz
    if (d2 < st.best2) { st.best2 = d2; st.bestIdx = mid }
    val diff = ax match { case 0 => dx; case 1 => dy; case _ => dz }
    val nax = if (ax == 2) 0 else ax + 1
    if (diff < 0) {
      nearest(lo, mid, nax, st)
      // a far-side point is >= |diff| from the query in this axis alone,
      // so slab² >= best2 can never strictly improve — safe to prune
      if (diff * diff < st.best2) nearest(mid + 1, hi, nax, st)
    } else {
      nearest(mid + 1, hi, nax, st)
      if (diff * diff < st.best2) nearest(lo, mid, nax, st)
    }
  }

  private def collect(lo: Int, hi: Int, ax: Int, st: SphereKd.State): Unit = {
    if (lo >= hi) return
    val mid = (lo + hi) >>> 1
    val dx = st.qx - px(mid); val dy = st.qy - py(mid); val dz = st.qz - pz(mid)
    val d2 = dx * dx + dy * dy + dz * dz
    if (d2 <= st.bound2) {
      val km = GeoFunctions.haversineKm(st.qlon, st.qlat, lons(mid), lats(mid))
      val n = SphereKd.roundMicroKm(km)
      if (n < st.bn || (n == st.bn && keys(mid) < st.bk)) { st.bn = n; st.bk = keys(mid) }
    }
    val diff = ax match { case 0 => dx; case 1 => dy; case _ => dz }
    val nax = if (ax == 2) 0 else ax + 1
    if (diff < 0) {
      collect(lo, mid, nax, st)
      if (diff * diff <= st.bound2) collect(mid + 1, hi, nax, st)
    } else {
      collect(mid + 1, hi, nax, st)
      if (diff * diff <= st.bound2) collect(lo, mid, nax, st)
    }
  }
}

object SphereKd {

  /** Per-probe mutable search state (the tree itself is shared read-only
    * across executor task threads).
    */
  private[operators] final class State {
    var qx = 0.0; var qy = 0.0; var qz = 0.0
    var qlon = 0.0; var qlat = 0.0
    var best2: Double = Double.MaxValue
    var bestIdx: Int = -1
    var bound2 = 0.0
    var bn = Long.MaxValue
    var bk = Long.MaxValue
  }

  /** Exactly Spark's `round(x).cast("long")` for doubles: BigDecimal of
    * the double's canonical decimal form, HALF_UP at scale 0.
    */
  private[operators] def roundMicroKm(km: Double): Long =
    java.math.BigDecimal.valueOf(km * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Build from parallel coordinate/key arrays. Enforces the same tie-key
    * bound the packed argmin enforces (a key >= 2^20 would bleed into the
    * distance bits there; here it would silently change tie semantics).
    */
  def build(lon: Array[Double], lat: Array[Double], key: Array[Long]): SphereKd = {
    val n = key.length
    require(n > 0, "SphereKd.build: empty right side")
    var i = 0
    while (i < n) {
      if (key(i) < 0L || key(i) >= 1048576L)
        throw new IllegalArgumentException(
          s"nearestJoinAggPacked bounds exceeded (need 0<=tieKey<2^20): tieKey=${key(i)}")
      i += 1
    }
    val xs = new Array[Double](n); val ys = new Array[Double](n); val zs = new Array[Double](n)
    i = 0
    while (i < n) {
      val phi = math.toRadians(lat(i)); val lam = math.toRadians(lon(i))
      val cp = math.cos(phi)
      xs(i) = cp * math.cos(lam); ys(i) = cp * math.sin(lam); zs(i) = math.sin(phi)
      i += 1
    }
    val idx = Array.tabulate(n)(identity)
    buildRange(idx, 0, n, 0, xs, ys, zs)
    new SphereKd(
      idx.map(xs), idx.map(ys), idx.map(zs),
      idx.map(lon), idx.map(lat), idx.map(key))
  }

  private def buildRange(
      idx: Array[Int], lo: Int, hi: Int, ax: Int,
      xs: Array[Double], ys: Array[Double], zs: Array[Double]): Unit = {
    if (hi - lo <= 1) return
    val mid = (lo + hi) >>> 1
    val v = ax match { case 0 => xs; case 1 => ys; case _ => zs }
    select(idx, lo, hi, mid, v)
    val nax = if (ax == 2) 0 else ax + 1
    buildRange(idx, lo, mid, nax, xs, ys, zs)
    buildRange(idx, mid + 1, hi, nax, xs, ys, zs)
  }

  /** Hoare quickselect: partition idx[lo0, hi0) so idx(k) holds the k-th
    * element by v, smaller-or-equal values left of it. O(n) expected.
    */
  private def select(idx: Array[Int], lo0: Int, hi0: Int, k: Int, v: Array[Double]): Unit = {
    var lo = lo0; var hi = hi0 - 1
    while (lo < hi) {
      val p = v(idx((lo + hi) >>> 1))
      var i = lo; var j = hi
      while (i <= j) {
        while (v(idx(i)) < p) i += 1
        while (v(idx(j)) > p) j -= 1
        if (i <= j) { val t = idx(i); idx(i) = idx(j); idx(j) = t; i += 1; j -= 1 }
      }
      if (k <= j) hi = j else if (k >= i) lo = i
      else return
    }
  }
}
