package graft

/** Head-to-head adjudication harness for text-tier plan alternatives
  * (the qt46 protocol: build the variant, race it at sf1, ship the
  * winner, document the loser's numbers). Currently races qd21's two
  * source-overlap forms over a real documents table:
  *
  *  - `sets` (SHIPPED since r14): per gram, collect the ≤-sources set
  *    once (ObjectHashAggregate) and explode its ordered pairs — one
  *    exchange, object state bounded by the source count.
  *  - `join` (the r13 form, adjudication loser): distinct (source,
  *    gram) self-joined ON GRAM — a second gram-keyed exchange.
  *
  * Run: `sbt "runMain graft.TextScale [sfDir] [runs]"` (default
  * /tmp/sf1, 5 runs). Prints per-run walls + medians; equality of the
  * two forms' outputs is asserted once per invocation.
  */
object TextScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local(32, "text-scale")
    val docs = Tables.load(spark, sfDir, "documents")

    def once(label: String)(body: => Long): Double = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.parallelize(1 to 64, 64)
        .foreach(_ => System.gc())
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[textscale] $label%-6s $s%7.2f s  (rows=$r)")
      s
    }
    val assocMode = args.contains("assoc")
    // equality once: the adjudication is about PLAN cost, not semantics
    if (assocMode) {
      val a = operators.TextAnalysis
        .assocPairs(docs, "text", 50L, 20).collect().toSet
      val b = operators.TextAnalysis
        .assocPairs(docs, "text", 50L, 20,
          localFrequentMax = 0, reuseBaskets = false).collect().toSet
      require(a == b, s"variant outputs differ: ${a.size} vs ${b.size} rows")
      println(s"[textscale] outputs identical (${a.size} pairs)")
    } else {
      val a = operators.TextAnalysis
        .sourceOverlap(docs, "source", "text", 3).collect().toSet
      val b = operators.TextAnalysis
        .sourceOverlapViaJoin(docs, "source", "text", 3).collect().toSet
      require(a == b, s"variant outputs differ: ${a.size} vs ${b.size} rows")
      println(s"[textscale] outputs identical (${a.size} pairs)")
    }

    // INTERLEAVED, ORDER-ALTERNATED design: running one form's 5 runs
    // before the other's hands the second form a warmer JIT — measured
    // r19: the second-run form "won" by ~7% in BOTH orders. Alternating
    // which form leads each round cancels the first-order bias; the
    // comparison is paired per round.
    def run(form: String): Double = once(form) {
      (form match {
        case "join" => operators.TextAnalysis
          .sourceOverlapViaJoin(docs, "source", "text", 3)
        case "nocache" => operators.TextAnalysis
          .sourceOverlap(docs, "source", "text", 3, reuseGrams = false)
        case "regroup" => operators.TextAnalysis
          .assocPairs(docs, "text", 50L, 20,
            localFrequentMax = 0, reuseBaskets = false)
        case "inarr" => operators.TextAnalysis
          .assocPairs(docs, "text", 50L, 20)
        case "inarrnc" => operators.TextAnalysis
          .assocPairs(docs, "text", 50L, 20, reuseBaskets = false)
        case _ => operators.TextAnalysis
          .sourceOverlap(docs, "source", "text", 3)
      }).count()
    }
    // second race (r19): grams persisted vs recomputed, same paired design;
    // third race (r19): assocPairs explode+regroup prune vs in-array
    // retain_in prune + persisted baskets
    val forms =
      if (assocMode && args.contains("nocache")) Seq("regroup", "inarrnc")
      else if (assocMode) Seq("regroup", "inarr")
      else if (args.contains("cache")) Seq("nocache", "sets")
      else Seq("join", "sets")
    val walls = (1 to runs).flatMap { i =>
      val order = if (i % 2 == 1) forms else forms.reverse
      order.map(f => f -> run(f))
    }
    val med = forms.map { f =>
      val ws = walls.collect { case (`f`, w) => w }.sorted
      f -> ws(ws.size / 2)
    }
    med.foreach { case (f, m) => println(f"[textscale] MEDIAN $f%-6s $m%7.2f s") }
    val diffs = (1 to runs).map { i =>
      val round = walls.slice((i - 1) * 2, i * 2).toMap
      round(forms.head) - round(forms.last)
    }.sorted
    println(f"[textscale] PAIRED median(${forms.head} - ${forms.last}) = ${diffs(diffs.size / 2)}%+.2f s")
    spark.stop()
  }
}
