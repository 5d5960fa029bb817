package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling for training-data QA (the §"training-data pipeline"
  * mandate): null count, distinct count, min/max/avg per column in ONE
  * scan (a single wide multi-agg), unpivoted to long form.
  *
  * Two distinct-count tiers:
  *  - `exact = true`: `count(DISTINCT c)` per column. Spark plans an
  *    Expand ×(cols+1) over the input — correct-by-contract (the oracle
  *    gate needs it) but the Expand multiplies the exchanged rows, so at
  *    100 TB this is the audit path, not the routine one.
  *  - `exact = false`: HyperLogLog++ `approx_count_distinct(c, rsd)` —
  *    no Expand, one pass, fixed-size sketches that merge map-side; the
  *    plan shape is identical to the plain min/max/avg aggregation. The
  *    published HLL++ error bound is ~1.04/√(2^p) relative standard
  *    deviation, so rsd = 0.02 keeps distinct counts within ±2% (1σ) —
  *    spec-asserted against the exact tier on real data.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true, rsd: Double = 0.02): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nnull"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"${c}__ndist"),
        round(min(col(c)), 6).as(s"${c}__min"),
        round(max(col(c)), 6).as(s"${c}__max"),
        // 4 dp, not 6: avg divides a large FP sum whose engine-order
        // divergence sits too close to a 6-dp boundary to gamble a gate on
        round(avg(col(c)), 4).as(s"${c}__avg"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', ${c}__nnull, ${c}__ndist, ${c}__min, ${c}__max, ${c}__avg")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) as (col_name, n_null, n_distinct, minv, maxv, avgv)")
  }

  /** Quantile tier: p25/p50/p75/p99 per column in ONE scan via Spark's
    * `approx_percentile` (Greenwald–Khanna sketch: fixed-size per-column
    * state, merges map-side — the same plan shape as min/max/avg, no sort,
    * no Expand). `accuracy` bounds the RANK error at 1/accuracy of N
    * (10⁻⁴ at the default), so values land within that rank band of the
    * exact order statistic — spec-asserted against exact `percentile`
    * on real data. The exact companion (`percentile`) buffers each
    * group's column and is the audit path, not the routine one.
    */
  def quantiles(df: DataFrame, cols: Seq[String], accuracy: Int = 10000): DataFrame = {
    val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.99 -> "p99")
    val aggs = cols.flatMap { c =>
      ps.map { case (p, nm) =>
        round(
          expr(s"approx_percentile($c, $p, $accuracy)").cast("double"),
          6).as(s"${c}__$nm")
      }
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', ${c}__p25, ${c}__p50, ${c}__p75, ${c}__p99")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) as (col_name, p25, p50, p75, p99)")
  }

  /** Join/agg-key SKEW report — the diagnosis step before every salting
    * decision at 100 TB: per-key row counts for the `topN` heaviest keys,
    * each with its share of the table and the SALT FACTOR that would
    * level it to the mean key load (ceil(count / mean), 1 = no salting
    * needed). One aggregation (partial map-side combine on the key) + a
    * tiny two-row side agg for (total, #keys), broadcast back — no second
    * scan. TakeOrdered keeps the topN selection off the driver until the
    * final rows. Deterministic: ties on count break by key string.
    */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("__total"),
      count(lit(1)).as("__nkeys"))
    counts
      .crossJoin(broadcast(totals))
      .withColumn("share", round(col("n") / col("__total"), 6))
      .withColumn(
        // multiply in DOUBLE (as the oracle does): n × nkeys as longs
        // overflows at planetary key counts, exactly where this runs
        "salt_factor",
        ceil(col("n") * lit(1.0) * col("__nkeys") / col("__total")).cast("long"))
      .select(col("key"), col("n"), col("share"), col("salt_factor"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
  }
  /** DATASET DRIFT REPORT — categorical distribution shift between two
    * slices (yesterday vs today, train vs serve): per key, counts,
    * shares, and the POPULATION STABILITY INDEX term
    * `(p − q)·ln(p/q)` (the industry drift alarm: Σ psi < 0.1 stable,
    * > 0.25 investigate). Shares divide UNROUNDED inside the psi term
    * (rounding first would corrupt the log ratio); a key absent from
    * either side has no defined PSI term and reports null — smoothing
    * policies are a caller decision, not silently applied. One keyed
    * count per slice + a broadcast totals row: two shuffles bounded by
    * key cardinality, never slice size.
    */
  def driftReport(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    // null-SAFE key equality (<=>): a plain USING join never matches null
    // keys, so a null category would split into two half-rows (each
    // seeing the other slice as 0) instead of one compared row
    val ca = a.groupBy(col(keyCol)).agg(count(lit(1)).as("n_a"))
      .withColumnRenamed(keyCol, "__ka")
    val cb = b.groupBy(col(keyCol)).agg(count(lit(1)).as("n_b"))
      .withColumnRenamed(keyCol, "__kb")
    val j = ca.join(cb, col("__ka") <=> col("__kb"), "full_outer")
      .select(
        coalesce(col("__ka"), col("__kb")).as(keyCol),
        col("n_a"), col("n_b"))
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = j.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    val p = col("n_a") / col("__ta")
    val q = col("n_b") / col("__tb")
    j.crossJoin(broadcast(tot))
      .withColumn("share_a", round(p, 6))
      .withColumn("share_b", round(q, 6))
      .withColumn("psi",
        when(col("n_a") > 0 && col("n_b") > 0, round((p - q) * log(p / q), 6)))
      .select(col(keyCol), col("n_a"), col("n_b"),
        col("share_a"), col("share_b"), col("psi"))
  }

  /** EMBEDDING-SPACE DRIFT — [[driftReport]] for vector columns: per
    * DIMENSION, the mean shift between two embedding corpora (model
    * re-embeds, crawl-snapshot shifts, pre/post-filter skew — the
    * readouts the categorical PSI can't see). The top-`topK`
    * dimensions by |Δmean| with both means — the triage list before a
    * re-embed or retrain.
    *
    * Exactness: components micro-quantize (⌊v·10⁶ + ½⌋, exact Longs)
    * so per-dimension SUMS are order-free exact integers; each mean is
    * then ONE IEEE divide and drift |mean_a − mean_b| one subtract —
    * no unordered float summation anywhere, the qp5/qp7 recipe.
    * Ranking is (drift DESC, dim ASC) on 6-dp-rounded values.
    *
    * Shape: posexplode inflates rows ×dim but map-side partial
    * aggregation means only `dim` rows per partition cross the wire
    * (the shuffle is dim-bounded, the CPU is the scan it rides);
    * one dim-keyed aggregate per side, a dim-bounded join, a top-K
    * cut. Σ|micro| must stay under 2⁶³: fine to ~10¹² rows at
    * |v| ≤ 10³ — past that, pre-aggregate per shard.
    */
  def embeddingDrift(
      a: DataFrame, b: DataFrame, vecCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    def dimSums(df: DataFrame): DataFrame = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "__v")))
      .groupBy(col("dim"))
      .agg(
        sum(floor(col("__v") * lit(1e6) + lit(0.5)).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
    val da = dimSums(a).select(col("dim"), col("__s").as("__sa"), col("__n").as("__na"))
    val db = dimSums(b).select(col("dim"), col("__s").as("__sb"), col("__n").as("__nb"))
    da.join(db, Seq("dim"), "full_outer")
      .na.fill(0L, Seq("__sa", "__na", "__sb", "__nb"))
      .withColumn("mean_a",
        when(col("__na") > 0L,
          round(col("__sa").cast("double") / (col("__na").cast("double") * lit(1e6)), 6))
          .otherwise(lit(0.0)))
      .withColumn("mean_b",
        when(col("__nb") > 0L,
          round(col("__sb").cast("double") / (col("__nb").cast("double") * lit(1e6)), 6))
          .otherwise(lit(0.0)))
      .withColumn("drift", round(abs(col("mean_a") - col("mean_b")), 6))
      .select(col("dim"), col("mean_a"), col("mean_b"), col("drift"))
      .orderBy(desc("drift"), col("dim"))
      .limit(topK)
  }

  /** Benford's-law probabilities P(d) = log10(1 + 1/d), d = 1..9, as
    * the exact shortest-repr DOUBLE LITERALS — both engines parse the
    * same decimal string to the same double, so n·p and the chi-square
    * terms are identical IEEE ops everywhere. Computing log10 at
    * runtime would hand the constant to libm, which is NOT
    * correctly-rounded across platforms.
    */
  private val BenfordP = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  /** BENFORD FIRST-DIGIT PROFILE — per key, the leading-significant-
    * digit distribution of a positive measure against Benford's law,
    * with the Pearson chi-square statistic (8 df) and a 5%-level flag.
    * The fraud/data-quality screen: naturally-generated multiplicative
    * data follows log10(1+1/d); fabricated or clipped columns don't.
    *
    * Digit extraction is INTEGER-EXACT: the value floor-quantizes to
    * micro-units and the first digit is the first character of the
    * Long's decimal string — no runtime log10 (whose floor misbuckets
    * at powers of ten on a libm ulp). The chi-square is a FIXED
    * left-associated 9-term chain over (count, n, literal p_d), so
    * every operand and operation order matches the oracle's replay
    * exactly. Zero and null values are excluded (they have no leading
    * significant digit); negatives contribute |x|.
    *
    * Shape: one key-cardinality-bounded hash aggregate (9 conditional
    * sums ride the same map-side partial), nothing driver-side.
    */
  def benford(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val q = floor(abs(col(valCol).cast("double")) * lit(1e6)).cast("long")
    val base = df
      .filter(col(valCol).isNotNull && q > 0L)
      .select(col(keyCol),
        substring(q.cast("string"), 1, 1).cast("int").as("__d"))
    val cnts = (1 to 9).map(d =>
      sum(when(col("__d") === d, 1L).otherwise(0L)).as(s"d${d}_cnt"))
    val counted = base
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_values"), cnts: _*)
    val n = col("n_values").cast("double")
    val chi2 = (1 to 9).map { d =>
      val e = n * lit(BenfordP(d - 1))
      val diff = col(s"d${d}_cnt").cast("double") - e
      diff * diff / e
    }.reduce(_ + _)
    counted
      .withColumn("chi_square", round(chi2, 6))
      .withColumn("benford_ok",
        when(col("chi_square") <= lit(15.507313), 1L).otherwise(0L))
  }

  /** TWO-PROPORTION A/B TEST — per outcome value, the pooled z-test for
    * a rate difference between two arms: trials = each arm's TOTAL
    * event count, successes = its count of this outcome, `z = (p̂ₐ −
    * p̂ᵦ) / sqrt(p̂(1−p̂)(1/nₐ + 1/nᵦ))` with p̂ pooled. The experiment
    * readout every product analytics stack ships.
    *
    * Cross-engine exact the Benford way: the four counts are exact
    * integers from ONE grouped pass, and everything after is a FIXED
    * left-associated IEEE op tree on identically-valued operands —
    * integer sums first, one divide per rate, pooled variance in
    * written order. Degenerate pools (p̂ ∈ {0, 1} ⇒ zero variance)
    * report z = 0 / not-significant rather than NaN.
    *
    * Shape: one outcome-cardinality-bounded aggregate plus a broadcast
    * single-row totals join (the driftReport pattern) — never
    * data-sized.
    */
  def abTest(df: DataFrame, arm: Column, outcomeCol: String): DataFrame = {
    val isA = when(arm, 1L).otherwise(0L)
    val isB = when(arm, 0L).otherwise(1L)
    val tot = df.agg(sum(isA).as("n_a"), sum(isB).as("n_b"))
    val per = df.groupBy(col(outcomeCol))
      .agg(sum(isA).as("x_a"), sum(isB).as("x_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("x_a").cast("double") / na
    val pb = col("x_b").cast("double") / nb
    val pool = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb))
    per.crossJoin(broadcast(tot))
      .select(
        col(outcomeCol), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        round(pa, 6).as("rate_a"),
        round(pb, 6).as("rate_b"),
        when(se > 0.0, round((pa - pb) / se, 6)).otherwise(lit(0.0))
          .as("z_score"))
      .withColumn("significant",
        when(abs(col("z_score")) > lit(1.959964), 1L).otherwise(0L))
  }

  /** CALIBRATION PROFILE + EXPECTED CALIBRATION ERROR — the standard
    * ML-eval readout: bucket predictions by confidence, compare each
    * bucket's mean confidence to its empirical accuracy, and weight the
    * gaps into ECE = Σ_b (n_b/N)·|acc_b − conf_b|. A model (or a
    * heuristic score) is calibrated iff the curve hugs the diagonal.
    *
    * Cross-engine exact: confidences micro-quantize so per-bin sums are
    * exact Longs, accuracy/mean-confidence are single divides, and the
    * ECE is an ORDERED fold over the bin-sorted terms (bins ≤ `bins`
    * rows — the weighted sum replays as a list fold, never an unordered
    * double aggregate). Bin ids floor-clamp into [0, bins) so conf = 1.0
    * lands in the top bin.
    *
    * Shape: one bins-bounded hash aggregate, then a broadcast one-row
    * totals join — the driftReport pattern.
    */
  def calibration(
      df: DataFrame, conf: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins must be in [2,100], got $bins")
    val bin = greatest(lit(0L),
      least(floor(conf * bins).cast("long"), lit(bins - 1).cast("long")))
    val per = df
      .filter(conf.isNotNull)
      .select(bin.as("bin"),
        floor(conf * lit(1e6)).cast("long").as("__cq"),
        when(label, 1L).otherwise(0L).as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_values"),
        sum(col("__cq")).as("__sq"), sum(col("__y")).as("__sy"))
    val tot = per
      .agg(sort_array(collect_list(struct(
        col("bin"), col("n_values").as("n"),
        col("__sq").as("sq"), col("__sy").as("sy")))).as("__t"))
      .select(
        aggregate(col("__t"), lit(0L), (a, x) => a + x("n")).as("__nt"),
        col("__t"))
      .select(col("__nt").as("n_total"),
        round(aggregate(col("__t"), lit(0.0), (a, x) =>
          a + x("n").cast("double") / col("__nt").cast("double")
            * abs(x("sy").cast("double") / x("n").cast("double")
              - x("sq").cast("double") / (lit(1e6) * x("n").cast("double")))),
          6).as("ece"))
    per.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_values"),
        round(col("__sq").cast("double")
          / (lit(1e6) * col("n_values").cast("double")), 6).as("avg_conf"),
        round(col("__sy").cast("double")
          / col("n_values").cast("double"), 6).as("accuracy"),
        col("n_total"), col("ece"))
  }

  /** CHI-SQUARE INDEPENDENCE TEST + CRAMÉR'S V — are two categorical
    * columns associated? The contingency-table sibling of [[benford]]'s
    * goodness-of-fit: observed cell counts vs the independence
    * expectation `e = row·col/N`, `χ² = Σ (o−e)²/e`, effect size
    * `V = √(χ²/(N·min(r−1, c−1)))`. The segmentation/feature-screen
    * readout (is event mix independent of the arm?).
    *
    * The grid is ZERO-DENSIFIED (a missing cell is o = 0 with e > 0 —
    * skipping it understates χ²), margins and N are exact integer
    * sums, and the χ² accumulates as an ORDERED fold over the
    * (a, b)-sorted cells. Cell count is \|a\|·\|b\|-bounded — category
    * cardinalities, never data size.
    */
  def chiSquareIndependence(
      df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df
      .groupBy(aCol.as("__a"), bCol.as("__b"))
      .agg(count(lit(1)).as("__o"))
    val grid = cells.select(col("__a")).distinct()
      .crossJoin(broadcast(cells.select(col("__b")).distinct()))
      .join(cells, Seq("__a", "__b"), "left")
      .select(col("__a"), col("__b"), coalesce(col("__o"), lit(0L)).as("__o"))
    val withMargins = grid
      .join(grid.groupBy("__a").agg(sum("__o").as("__ra")), Seq("__a"))
      .join(grid.groupBy("__b").agg(sum("__o").as("__cb")), Seq("__b"))
    withMargins
      .agg(sort_array(collect_list(struct(
        col("__a"), col("__b"), col("__o"), col("__ra"), col("__cb"))))
        .as("__t"))
      .select(explode(transform(array(col("__t")), t => {
        val n = aggregate(t, lit(0L), (a, x) => a + x("__o"))
        val r = size(array_distinct(transform(t, x => x("__a")))).cast("long")
        val c = size(array_distinct(transform(t, x => x("__b")))).cast("long")
        val chi = aggregate(t, lit(0.0), (a, x) => {
          val e = (x("__ra") * x("__cb")).cast("double") / n.cast("double")
          a + (x("__o").cast("double") - e) * (x("__o").cast("double") - e) / e
        })
        val mindim = least(r - 1L, c - 1L)
        struct(
          n.as("n"), r.as("r"), c.as("c"),
          ((r - 1L) * (c - 1L)).as("dof"),
          round(chi, 6).as("chi"),
          when(mindim >= 1L && n > 0L,
            round(sqrt(chi / (n.cast("double") * mindim.cast("double"))), 6))
            .otherwise(lit(0.0)).as("v"))
      })).as("__x"))
      .select(col("__x.n").as("n_total"), col("__x.r").as("n_rows"),
        col("__x.c").as("n_cols"), col("__x.dof").as("dof"),
        col("__x.chi").as("chi_square"), col("__x.v").as("cramers_v"))
  }

  /** MUTUAL INFORMATION between two categorical columns — the
    * feature-relevance readout next to [[chiSquareIndependence]]'s
    * significance test: `I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))`,
    * plus the √(H(X)·H(Y))-normalized NMI so corpora of different
    * entropy compare on one scale. Zero cells contribute exactly 0 to
    * MI by definition, so (unlike χ²) NO grid densification is needed
    * — the cell frame stays observed-cells-sized.
    *
    * Cross-engine exact: cell and margin counts are exact integers;
    * every log argument is ONE IEEE divide of exact integer products
    * (`o·N / (ra·cb)` — the qt36 ratio rule), and all three entropic
    * sums fold in sorted-cell / sorted-margin order (the qp11 fixed
    * fold), so no order-dependent float summation exists.
    *
    * Shape: one (x, y)-grouped count, two margin re-aggregations, one
    * category-bounded fold — never data-sized after the first
    * aggregate.
    */
  def mutualInformation(
      df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df
      .groupBy(aCol.as("__a"), bCol.as("__b"))
      .agg(count(lit(1)).as("__o"))
    val withMargins = cells
      .join(cells.groupBy("__a").agg(sum("__o").as("__ra")), Seq("__a"))
      .join(cells.groupBy("__b").agg(sum("__o").as("__cb")), Seq("__b"))
    withMargins
      .agg(sort_array(collect_list(struct(
        col("__a"), col("__b"), col("__o"), col("__ra"), col("__cb"))))
        .as("__t"))
      .filter(size(col("__t")) > 0)
      .select(explode(transform(array(col("__t")), t => {
        val n = aggregate(t, lit(0L), (a, x) => a + x("__o"))
        val nd = n.cast("double")
        val mi = aggregate(t, lit(0.0), (a, x) =>
          a + x("__o").cast("double") / nd *
            log((x("__o") * n).cast("double") / (x("__ra") * x("__cb")).cast("double")))
        // margins once each, in first-occurrence (= sorted) order
        val ma = array_distinct(transform(t, x => struct(x("__a").as("k"), x("__ra").as("m"))))
        val mb = array_distinct(transform(t, x => struct(x("__b").as("k"), x("__cb").as("m"))))
        def entropy(m: Column) = aggregate(m, lit(0.0), (a, x) =>
          a - x("m").cast("double") / nd * log(x("m").cast("double") / nd))
        val ha = entropy(ma)
        val hb = entropy(sort_array(mb))
        struct(
          n.as("n"),
          size(ma).cast("long").as("ka"),
          size(mb).cast("long").as("kb"),
          round(mi, 6).as("mi"),
          round(ha, 6).as("ha"),
          round(hb, 6).as("hb"),
          when(ha > 0.0 && hb > 0.0, round(mi / sqrt(ha * hb), 6)).as("nmi"))
      })).as("__x"))
      .select(
        col("__x.n").as("n_total"), col("__x.ka").as("n_a"),
        col("__x.kb").as("n_b"), col("__x.mi").as("mi"),
        col("__x.ha").as("h_a"), col("__x.hb").as("h_b"),
        col("__x.nmi").as("nmi"))
  }

  /** GINI COEFFICIENT — per key, the concentration/inequality of a
    * non-negative value distribution (how much of the spend / token
    * mass / traffic sits in the top rows): `G = Σ(2i − n − 1)·xᵢ /
    * (n·Σx)` over the ascending sort — 0 = uniform, → 1 = one row
    * holds everything. The curation readout behind "is this corpus
    * dominated by a handful of sources?".
    *
    * ALL-INTEGER numerator: values centi-quantize (negative values are
    * excluded — Gini is defined on non-negative mass), i is the
    * ascending row_number, and `2Σ(i·xᵢ) − (n+1)Σx` is an exact Long.
    * Intra-tie row_number order CANNOT change the sum — equal values
    * swap coefficients between equal xᵢ — so the statistic is
    * deterministic without a tie-break key. One IEEE divide at the
    * end. Overflow bound: Σ(i·xᵢ) < n²·max(x) — exact to ~10⁸ rows/key
    * at centi scale, far past any per-key contract.
    *
    * Shape: ONE key-partitioned window + one key-bounded aggregate.
    */
  def gini(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val q = floor(col(valCol).cast("double") * lit(100.0)).cast("long")
    val base = df
      .filter(col(valCol).isNotNull && col(valCol) >= 0.0)
      .select(col(keyCol), q.as("__q"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__q"))
    base
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("__q")).as("__sq"),
        sum(col("__i") * col("__q")).as("__siq"))
      .select(
        col(keyCol),
        col("__n").as("n_events"),
        round(col("__sq").cast("double") / lit(100.0), 2).as("total_value"),
        when(col("__sq") > 0L,
          round((lit(2L) * col("__siq") - (col("__n") + 1L) * col("__sq")).cast("double")
            / (col("__n") * col("__sq")).cast("double"), 6)).as("gini"))
  }

  /** TWO-SAMPLE KOLMOGOROV-SMIRNOV TEST — per key, the exact supremum
    * distance between two arms' empirical CDFs: `D = sup_v |F_a(v) −
    * F_b(v)|`, the UNBINNED distribution-shift test ([[driftReport]]'s
    * PSI needs bins; KS sees any shift, anywhere in the distribution).
    * Statistic `√(nₐnᵦ/(nₐ+nᵦ))·D` against the 1.358 (α = 0.05)
    * critical coefficient.
    *
    * ALL-INTEGER supremum: values micro-quantize and the per-row CDF
    * gap is `|cₐ·nᵦ − cᵦ·nₐ|` over cumulative counts from a RANGE-frame
    * window (the frame includes ALL peers of the current value, so
    * every row of a tie group carries the value-boundary counts —
    * intra-tie order cannot matter), and the max of exact Longs is
    * order-free. D and the statistic are then two IEEE ops on exact
    * operands.
    *
    * Shape: ONE key-partitioned window + one key-bounded aggregate —
    * no pairwise work, no global sort.
    */
  def ksTest(
      df: DataFrame, keyCol: String, valCol: String,
      arm: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__q"))
    val wp = Window.partitionBy(col("__k"))
    val base = df
      .filter(col(valCol).isNotNull)
      .select(col(keyCol).as("__k"),
        floor(col(valCol).cast("double") * lit(1e6)).cast("long").as("__q"),
        when(arm, 1L).otherwise(0L).as("__a"))
      .withColumn("__ca", sum(col("__a")).over(w))
      .withColumn("__cb", sum(lit(1L) - col("__a")).over(w))
      .withColumn("__na", sum(col("__a")).over(wp))
      .withColumn("__nb", sum(lit(1L) - col("__a")).over(wp))
    base
      .groupBy(col("__k").as(keyCol))
      .agg(
        max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(abs(col("__ca") * col("__nb") - col("__cb") * col("__na")))
          .as("__dn"))
      .filter(col("n_a") > 0L && col("n_b") > 0L)
      .select(
        col(keyCol), col("n_a"), col("n_b"),
        round(col("__dn").cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("d_stat"),
        round(col("__dn").cast("double")
          / (col("n_a") * col("n_b")).cast("double")
          * sqrt((col("n_a") * col("n_b")).cast("double")
            / (col("n_a") + col("n_b")).cast("double")), 6).as("ks_stat"))
      .withColumn("significant",
        when(col("ks_stat") > lit(1.358), 1L).otherwise(0L))
  }

  /** MANN-WHITNEY U / WILCOXON RANK-SUM TEST — per key, the rank-based
    * two-sample location test: does one arm's distribution sit higher?
    * Robust where the t-test's normality assumption fails, and the
    * standard companion to [[ksTest]] (KS asks "different at all?",
    * Mann-Whitney asks "shifted which way?").
    *
    * ALL-INTEGER ranks: ties take MIDRANKS, which are half-integers —
    * so the implementation carries DOUBLED midranks
    * `2·rank = 2·rank_lo + tie_count − 1` (exact Longs from one
    * RANGE/row window pass), giving `2U = Σ₁2r − n₁(n₁+1)` exactly.
    * The tie-corrected normal approximation
    * `σ² = (n₁n₀/12)·((N+1) − Σ(t³−t)/(N(N−1)))` is a fixed IEEE tree
    * over exact integer sums (Σ(t³−t) from the per-value tie counts),
    * and `z = (2U − n₁n₀)/(2σ)` (no continuity correction — documented,
    * matching the oracle exactly).
    *
    * Shape: one key window pass for ranks + two key-bounded aggregates.
    */
  def mannWhitney(
      df: DataFrame, keyCol: String, valCol: String,
      arm: Column): DataFrame = {
    val base = df
      .filter(col(valCol).isNotNull)
      .select(col(keyCol).as("__k"),
        floor(col(valCol).cast("double") * lit(1e6)).cast("long").as("__q"),
        when(arm, 1L).otherwise(0L).as("__a"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__q"))
    val wt = Window.partitionBy(col("__k"), col("__q"))
    val ranked = base
      .withColumn("__rlo", rank().over(w).cast("long"))
      .withColumn("__t", count(lit(1)).over(wt))
      .withColumn("__r2", lit(2L) * col("__rlo") + col("__t") - 1L)
    val ties = base
      .groupBy(col("__k"), col("__q"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col("__k"))
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .as("__tcorr"))
    val agg = ranked
      .groupBy(col("__k"))
      .agg(
        sum(col("__a")).as("n_a"),
        sum(lit(1L) - col("__a")).as("n_b"),
        sum(when(col("__a") === 1L, col("__r2")).otherwise(0L)).as("__r2a"))
      .join(ties, Seq("__k"))
    val na = col("n_a")
    val nb = col("n_b")
    val n = na + nb
    val u2 = col("__r2a") - na * (na + 1L)
    val sig2 = na.cast("double") * nb.cast("double") / lit(12.0) *
      ((n + 1L).cast("double") -
        col("__tcorr").cast("double") /
          (n.cast("double") * (n - 1L).cast("double")))
    agg
      .filter(na > 0L && nb > 0L && n > 1L)
      .select(
        col("__k").as(keyCol), na, nb,
        round(u2.cast("double") / lit(2.0), 6).as("u_stat"),
        when(sig2 > 0.0,
          round((u2 - na * nb).cast("double")
            / (lit(2.0) * sqrt(sig2)), 6))
          .otherwise(lit(0.0)).as("z_score"))
      .withColumn("significant",
        when(abs(col("z_score")) > lit(1.959964), 1L).otherwise(0L))
  }

  /** ONE-WAY ANOVA — does the mean of `valCol` differ across the
    * k groups of `groupCol`? The parametric k-group location test the
    * 2-arm family ([[abTest]], [[mannWhitney]], [[ksTest]]) can't
    * express: F = (SSB/(k−1)) / (SSW/(N−k)) with effect size
    * η² = SSB/SST.
    *
    * Cross-engine exact by the power-sum recipe: values
    * centi-quantize, each group reduces to exact integer (n, Σq, Σq²)
    * — Σq² stays under 2⁶³ (and 2⁵³, double-exact) to ~10⁹ rows/group
    * at this value range — and the sums of squares are a FIXED IEEE
    * tree over the groups in sorted-key order (`SSB = Σ_g S_g²/n_g −
    * S²/N` folded k-wise, like [[chiSquareIndependence]]'s cell fold),
    * so no order-dependent float summation exists anywhere. A
    * zero-variance corpus (SSW = 0) reports a null F rather than ∞.
    *
    * Shape: one group-cardinality-bounded hash aggregate (map-side
    * partials carry three longs per group) + one k-row fold — never
    * event-sized after the first aggregate, no window, no sort of the
    * data itself.
    */
  def oneWayAnova(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val groups = df
      .filter(col(valCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(
        count(lit(1)).as("__n"),
        sum(floor(col(valCol).cast("double") * lit(100.0)).cast("long"))
          .as("__s"),
        sum(floor(col(valCol).cast("double") * lit(100.0)).cast("long")
          * floor(col(valCol).cast("double") * lit(100.0)).cast("long"))
          .as("__qq"))
    groups
      .agg(sort_array(collect_list(struct(col("__g"), col("__n"), col("__s"),
        col("__qq")))).as("__t"))
      // empty/all-null input → NO row (the oracle's `WHERE k > 0` twin):
      // without this the fold emits one row of 0/0 NaN sums-of-squares
      .filter(size(col("__t")) > 0)
      .select(explode(transform(array(col("__t")), t => {
        val k = size(t).cast("long")
        val n = aggregate(t, lit(0L), (a, x) => a + x("__n"))
        val s = aggregate(t, lit(0L), (a, x) => a + x("__s"))
        val qq = aggregate(t, lit(0L), (a, x) => a + x("__qq"))
        // fixed k-term fold in sorted group order: Σ_g S_g²/n_g
        val sbRaw = aggregate(t, lit(0.0), (a, x) =>
          a + x("__s").cast("double") * x("__s").cast("double")
            / x("__n").cast("double"))
        val grand = s.cast("double") * s.cast("double") / n.cast("double")
        val ssb = sbRaw - grand
        val sst = qq.cast("double") - grand
        val ssw = sst - ssb
        struct(n.as("n"), k.as("k"), ssb.as("ssb"), ssw.as("ssw"),
          sst.as("sst"))
      })).as("__x"))
      .select(
        col("__x.n").as("n_total"), col("__x.k").as("n_groups"),
        (col("__x.k") - 1L).as("df_between"),
        (col("__x.n") - col("__x.k")).as("df_within"),
        // centi units square to 1e4× — rescale the SS readouts back to
        // value² units so the numbers mean something
        round(col("__x.ssb") / lit(1e4), 4).as("ss_between"),
        round(col("__x.ssw") / lit(1e4), 4).as("ss_within"),
        when(col("__x.ssw") > 0.0 && col("__x.k") > 1L
          && col("__x.n") > col("__x.k"),
          round((col("__x.ssb") / (col("__x.k") - 1L).cast("double"))
            / (col("__x.ssw") / (col("__x.n") - col("__x.k")).cast("double")),
            6)).as("f_stat"),
        when(col("__x.sst") > 0.0,
          round(col("__x.ssb") / col("__x.sst"), 6)).as("eta_sq"))
  }

  /** COUNT-CORRELATION MATRIX — pairwise Pearson correlation of
    * per-unit activity counts between categories (do clicks move with
    * purchases day over day?): the metric-relationship readout behind
    * every "correlated signals" dashboard.
    *
    * The load-bearing subtlety is DENSIFICATION: a (unit, category)
    * cell with no events is a ZERO observation, not a missing row —
    * skipping it biases every moment, so the counts left-join onto the
    * full unit × category grid first (categories broadcast; units come
    * from the data). Correlation itself is the Benford/abTest recipe:
    * exact integer power sums (n, Σa, Σb, Σab, Σa², Σb² — counts, so
    * overflow-free far past 100 TB) from one grouped pass, then the
    * fixed IEEE tree `r = (nΣab − ΣaΣb)/√(va·vb)`; zero-variance
    * sides report null.
    *
    * Shape: unit×category-bounded frames end to end — never
    * event-sized after the first aggregate.
    */
  def countCorrelation(df: DataFrame, unit: Column, catCol: String): DataFrame = {
    val counts = df
      .groupBy(unit.as("__u"), col(catCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
    val units = counts.select(col("__u")).distinct()
    val cats = counts.select(col("__c")).distinct()
    val filled = units.crossJoin(broadcast(cats))
      .join(counts, Seq("__u", "__c"), "left")
      .select(col("__u"), col("__c"), coalesce(col("__n"), lit(0L)).as("__n"))
    val a = filled.select(col("__u"), col("__c").as("type_a"), col("__n").as("__na"))
    val b = filled.select(col("__u"), col("__c").as("type_b"), col("__n").as("__nb"))
    val agg = a.join(b, Seq("__u"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        count(lit(1)).as("n_units"),
        sum(col("__na")).as("sa"), sum(col("__nb")).as("sb"),
        sum(col("__na") * col("__nb")).as("sab"),
        sum(col("__na") * col("__na")).as("saa"),
        sum(col("__nb") * col("__nb")).as("sbb"))
    val n = col("n_units").cast("double")
    val cov = n * col("sab").cast("double") -
      col("sa").cast("double") * col("sb").cast("double")
    val va = n * col("saa").cast("double") -
      col("sa").cast("double") * col("sa").cast("double")
    val vb = n * col("sbb").cast("double") -
      col("sb").cast("double") * col("sb").cast("double")
    agg.select(col("type_a"), col("type_b"), col("n_units"),
      when(va > 0.0 && vb > 0.0, round(cov / sqrt(va * vb), 6))
        .as("pearson_r"))
  }

  /** DATA-QUALITY RULE REPORT — the expectations audit (the dbt-test /
    * Great-Expectations shape): each rule is a boolean Column evaluated
    * over every row, and the report is one row per rule with pass
    * counts and rate. ALL rules evaluate in ONE scan (a single wide
    * aggregate with map-side partials — adding a rule adds a counter,
    * not a pass); the per-rule rows unpivot from that single result
    * row. Null rule results count as FAIL (SQL three-valued logic
    * would silently drop them from a naive filter count).
    *
    * Referential rules: pre-join the indicator column (e.g. a
    * broadcast left-join flag) and pass it as the rule Column — the
    * report stays one scan over the joined frame.
    */
  def qualityReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    // internal columns are INDEX-named — rule names are arbitrary user
    // strings (dots/backticks would break col() resolution)
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, c), i) =>
        // sum over an EMPTY frame is null — the report contract is 0
        coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L)).as(s"__r_$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((nm, _), i) =>
        struct(
          lit(nm).as("rule"),
          col("__n").as("n_rows"),
          col(s"__r_$i").as("n_pass"))
      }: _*)).as("__x"))
      .select(
        col("__x.rule").as("rule"),
        col("__x.n_rows").as("n_rows"),
        col("__x.n_pass").as("n_pass"),
        when(col("__x.n_rows") > 0L,
          round(col("__x.n_pass").cast("double")
            / col("__x.n_rows").cast("double"), 6)).as("pass_rate"))
  }

  /** JENSEN–SHANNON DIVERGENCE between two categorical distributions —
    * the symmetric, bounded (≤ ln 2) drift measure for TOKEN/label
    * distributions, where PSI ([[driftReport]]) breaks on zero bins
    * (its log-ratio is infinite for any category one side lacks; JSD's
    * mixture midpoint absorbs them). The standard corpus-shift readout
    * between two text corpora: feed each side's exploded tokens.
    *
    * Exactness: per-category counts are exact Longs; the categorical
    * table collects into ONE sorted array (the dictionary trick —
    * category-bounded, like [[mutualInformation]]) and every double
    * fold runs in the same category order both engines, so the sums
    * are bit-reproducible. Zero-count sides contribute exactly their
    * guarded 0.5·p·ln(p/m) term (p > 0 always when its count > 0; m > 0
    * whenever either side is present).
    *
    * Output (one row): n_a, n_b (token totals), n_cats, jsd (nats),
    * jsd_norm (= jsd / ln 2 ∈ [0, 1]). If EITHER side is empty
    * (n_a = 0 or n_b = 0) the divergence is undefined as a ratio of
    * distributions (the mathematical limit is ln 2, but p = c/0 is a
    * null divide in Spark and NaN in DuckDB — neither is the limit), so
    * the operator emits NO row rather than an engine-dependent value.
    */
  def jsDivergence(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val ca = a.groupBy(col(catCol).as("__c")).agg(count(lit(1)).as("__ca"))
    val cb = b.groupBy(col(catCol).as("__c")).agg(count(lit(1)).as("__cb"))
    val joined = ca
      .join(cb, Seq("__c"), "full_outer")
      .select(
        col("__c"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    joined
      .agg(sort_array(collect_list(struct(col("__c"), col("__ca"), col("__cb"))))
        .as("__t"))
      .filter(size(col("__t")) > 0)
      .select(explode(transform(array(col("__t")), t => {
        val na = aggregate(t, lit(0L), (acc, x) => acc + x("__ca"))
        val nb = aggregate(t, lit(0L), (acc, x) => acc + x("__cb"))
        val naD = na.cast("double")
        val nbD = nb.cast("double")
        val jsdFold = aggregate(t, lit(0.0), (acc, x) => {
          val p = x("__ca").cast("double") / naD
          val q = x("__cb").cast("double") / nbD
          val m = (p + q) / lit(2.0)
          // grouped acc + (termA + termB): the oracle folds one list
          // element per category, so the engine must add the two side
          // terms together FIRST — (acc+A)+B vs acc+(A+B) differ in
          // the last ulp and can flip a 6-dp rounding boundary
          acc +
            (when(x("__ca") > 0L, lit(0.5) * p * log(p / m)).otherwise(lit(0.0)) +
              when(x("__cb") > 0L, lit(0.5) * q * log(q / m)).otherwise(lit(0.0)))
        })
        // one-side-empty: the p = c/0 divide is an ANSI error (and a
        // NaN in DuckDB) — the `when` short-circuits so the fold never
        // evaluates; the row is dropped by the filter below
        val jsd = when(na > 0L && nb > 0L, jsdFold)
        struct(
          na.as("na"), nb.as("nb"),
          size(t).cast("long").as("k"),
          round(jsd, 6).as("jsd"),
          round(jsd / lit(math.log(2.0)), 6).as("jn"))
      })).as("__x"))
      // one-side-empty guard: with na = 0 the p = c/0 divide nulls the
      // whole fold (the size(__t) > 0 filter above only covers
      // both-empty) — drop the row per the documented contract
      .filter(col("__x.na") > 0L && col("__x.nb") > 0L)
      .select(
        col("__x.na").as("n_a"), col("__x.nb").as("n_b"),
        col("__x.k").as("n_cats"), col("__x.jsd").as("jsd"),
        col("__x.jn").as("jsd_norm"))
  }

  /** SAMPLE-RATIO-MISMATCH check — the mandatory pre-test before any
    * A/B readout ([[abTest]]/[[cuped]] results are invalid if the
    * randomizer itself is broken): chi-square goodness-of-fit of the
    * observed arm counts against the DESIGNED allocation. Per expected
    * arm: observed count, expected count n·share, and the χ² term
    * (o − e)²/e; Σ contrib vs χ²(k−1) is the caller's alarm (SRM
    * practice: p < 0.001 ⇒ halt the experiment). Arms present in the
    * data but not in `expected` are ignored (they are a DIFFERENT bug —
    * [[driftReport]] finds them); expected arms with zero observations
    * report a full-mass contribution.
    *
    * Counts are exact integers; e and the contribution are one fixed
    * IEEE tree each (6-dp round). One keyed count + a broadcast
    * expected table — no second scan.
    */
  def srmCheck(
      df: DataFrame, armCol: String,
      expected: Seq[(String, Double)]): DataFrame = {
    require(expected.nonEmpty, "expected allocation must be non-empty")
    require(expected.forall(_._2 > 0.0), "every expected share must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val exp = expected.toDF("arm", "share")
    val counts = df
      .filter(col(armCol).isNotNull)
      .select(col(armCol).cast("string").as("arm"))
      .join(broadcast(exp), Seq("arm"), "left_semi")
      .groupBy(col("arm"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_obs"))
    val joined = exp
      .join(counts, Seq("arm"), "left")
      .select(col("arm"), col("share"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .crossJoin(broadcast(
        counts.agg(coalesce(sum(col("n_obs")), lit(0L)).as("__n"))))
    joined.select(
      col("arm"), col("n_obs"),
      round(col("__n").cast("double") * col("share"), 6).as("expected_n"),
      // n = 0 (no observations in any expected arm) -> null, not 0/0
      when(col("__n") > 0L,
        round(
          (col("n_obs").cast("double") - col("__n").cast("double") * col("share"))
            * (col("n_obs").cast("double") - col("__n").cast("double") * col("share"))
            / (col("__n").cast("double") * col("share")), 6)).as("chi2_term"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013) —
    * the industry-standard experiment sharpener next to [[abTest]]'s
    * raw comparison: each unit's metric Y is adjusted by a pre-exposure
    * covariate X, `Y' = Y − θ(X − X̄)` with `θ = cov(X,Y)/var(X)` POOLED
    * across arms (arm-agnostic by construction, so the adjustment
    * cannot bias the contrast). Per arm the report carries the raw and
    * adjusted means and variances — the variance drop is the factor
    * the experiment's sample-size requirement shrinks by (1 − ρ²).
    *
    * EXACTNESS (the qp14/qp17 recipe): X and Y half-up-quantize at
    * `quantScale` into integers, every moment (Σx, Σy, Σxy, Σx², Σy²)
    * accumulates as DECIMAL(38,0) ↔ HUGEINT — order-free and exact —
    * and θ, means, variances are fixed trees of IEEE ops over those
    * exact sums, bit-identical across engines. Means round at 6 dp;
    * VARIANCES round at 4 dp — their magnitude (metric² ~ 10⁹ for
    * prices) pushes a 6-dp round past double's 15 significant digits,
    * where DuckDB's multiply/divide rounding lands one ulp off Spark's
    * exact-decimal rounding (observed on the qp18 gate). θ is dimensionless under shared quantization, so
    * the scale cancels out of the adjustment. Degenerate var(X) = 0 →
    * θ and the adjusted columns are null, raw columns still report.
    *
    * One pass for the pooled 1-row moments (broadcast), one grouped
    * pass per arm — no per-unit second scan, no window.
    */
  def cuped(
      df: DataFrame, armCol: String, metricCol: String, covCol: String,
      quantScale: Double = 1e6): DataFrame = {
    require(quantScale > 0.0, s"quantScale must be > 0, got $quantScale")
    val q = df
      .filter(col(armCol).isNotNull && col(metricCol).isNotNull
        && col(covCol).isNotNull)
      .select(col(armCol).as("arm"),
        floor(col(metricCol).cast("double") * lit(quantScale) + lit(0.5))
          .cast("decimal(38,0)").as("__y"),
        floor(col(covCol).cast("double") * lit(quantScale) + lit(0.5))
          .cast("decimal(38,0)").as("__x"))
    val pooled = q.agg(
      org.apache.spark.sql.functions.count(lit(1)).as("__n"),
      sum(col("__x")).as("__gsx"), sum(col("__y")).as("__gsy"),
      sum(col("__x") * col("__y")).as("__gsxy"),
      sum(col("__x") * col("__x")).as("__gsxx"))
      .select(
        (col("__gsx").cast("double") / col("__n")).as("__xbar"),
        {
          val den = (col("__gsxx").cast("double") * col("__n")
            - col("__gsx").cast("double") * col("__gsx").cast("double"))
          val num = (col("__gsxy").cast("double") * col("__n")
            - col("__gsx").cast("double") * col("__gsy").cast("double"))
          when(den > 0.0, num / den).as("__theta")
        })
    q.groupBy(col("arm"))
      .agg(
        org.apache.spark.sql.functions.count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .crossJoin(broadcast(pooled))
      .select(col("arm"), col("n"),
        round(col("__theta"), 6).as("theta"),
        round(col("__sy").cast("double") / col("n") / lit(quantScale), 6)
          .as("mean_y"),
        round((col("__sy").cast("double") / col("n")
          - col("__theta") * (col("__sx").cast("double") / col("n")
            - col("__xbar"))) / lit(quantScale), 6).as("mean_y_adj"),
        round((col("__syy").cast("double") / col("n")
          - (col("__sy").cast("double") / col("n"))
            * (col("__sy").cast("double") / col("n")))
          / lit(quantScale * quantScale), 4).as("var_y"),
        round(((col("__syy").cast("double")
          - lit(2.0) * col("__theta") * col("__sxy").cast("double")
          + col("__theta") * col("__theta") * col("__sxx").cast("double"))
          / col("n")
          - (col("__sy").cast("double") / col("n")
            - col("__theta") * col("__sx").cast("double") / col("n"))
            * (col("__sy").cast("double") / col("n")
              - col("__theta") * col("__sx").cast("double") / col("n")))
          / lit(quantScale * quantScale), 4).as("var_y_adj"))
  }

}
