package graft.streaming

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "streaming-spec")
  private val sfDir = "/root/testdata/sf0.001"

  private def events = Tables.normalizeTs(Tables.events(spark, sfDir))

  test("stateful sessionization matches the batch window-function form") {
    import spark.implicits._
    val batch = EventStreams
      .sessionizeBatch(events)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val stateful = EventStreams
      .sessionizeStateful(
        events
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
          .as[EventStreams.Event])
      .collect()
      .map(s => (s.user_id, s.n_sessions, s.n_events))
      .toSet
    assert(stateful == batch)
  }

  test("stream-static enrich equals the batch join, joining fresh per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val dim = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "seg")
    val mem = MemoryStream[(Long, Long)]
    val stream = mem.toDF().toDF("id", "user")
    val q = EventStreams
      .enrichStream(stream, dim, "user", "k")
      .select(col("id"), col("user"), col("seg"))
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_spec").start()
    try {
      mem.addData((10L, 1L), (11L, 2L), (12L, 9L)) // 9 has no dim row -> dropped
      q.processAllAvailable()
      val afterB1 = spark.table("enrich_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(afterB1 == Set((10L, 1L, "A"), (11L, 2L, "B")))
      // second micro-batch joins the dim AGAIN (per-batch broadcast)
      mem.addData((13L, 3L), (14L, 1L))
      q.processAllAvailable()
      val afterB2 = spark.table("enrich_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(afterB2 == afterB1 ++ Set((13L, 3L, "C"), (14L, 1L, "A")))
    } finally q.stop()
  }

  test("idempotent foreachBatch sink: redelivered batch replaces, not appends; stream lands exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-e1o").toString

    // the per-batch kernel: same batchId redelivered ⇒ same final rows
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    EventStreams.writeIdempotentBatch(b0, 0L, out)
    EventStreams.writeIdempotentBatch(b0, 0L, out) // at-least-once redelivery
    EventStreams.writeIdempotentBatch(Seq((3L, "c")).toDF("id", "v"), 1L, out)
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Int]("batch_id"))).toSet
    assert(rows == Set((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)))

    // end-to-end: a real writeStream through the sink lands each input once
    val out2 = java.nio.file.Files.createTempDirectory("graft-e1o-2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-e1o-ck").toString
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.idempotentParquetSink(mem.toDF().toDF("id", "v"), out2, ckpt)
    try {
      mem.addData((10L, "x"), (11L, "y"))
      q.processAllAvailable()
      mem.addData((12L, "z"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out2).drop("batch_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((10L, "x"), (11L, "y"), (12L, "z")))
    // and the batches really partitioned the stream (2 batch dirs)
    assert(new java.io.File(out2).listFiles.count(_.getName.startsWith("batch_id=")) == 2)
  }

  test("tx-log streaming sink: redelivered batch no-ops; stream lands exactly once in whole versions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.TxLog
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-txsink").resolve("tbl").toString

    // per-batch kernel: batch b commits as version b+1; redelivery no-ops
    TxLog.create(spark, dir, Seq.empty[(Long, String)].toDF("id", "v"))
    assert(TxLog.appendStreamBatch(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L))
    assert(!TxLog.appendStreamBatch(spark, dir, Seq((666L, "poison")).toDF("id", "v"), 0L),
      "redelivered batch 0 must not commit")
    assert(TxLog.appendStreamBatch(spark, dir, Seq((3L, "c")).toDF("id", "v"), 1L))
    assert(TxLog.versions(spark, dir) == Seq(0L, 1L, 2L))
    assert(TxLog.snapshot(spark, dir).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // time travel still sees the pre-batch-1 table
    assert(TxLog.snapshot(spark, dir, Some(1L)).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))

    // end-to-end: a real writeStream through the sink, one version per batch
    val dir2 = java.nio.file.Files.createTempDirectory("graft-txsink2").resolve("tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-txsink-ck").toString
    TxLog.create(spark, dir2, Seq.empty[(Long, String)].toDF("id", "v"))
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.txLogSink(mem.toDF().toDF("id", "v"), dir2, ckpt)
    try {
      mem.addData((10L, "x"), (11L, "y"))
      q.processAllAvailable()
      mem.addData((12L, "z"))
      q.processAllAvailable()
    } finally q.stop()
    assert(TxLog.versions(spark, dir2) == Seq(0L, 1L, 2L), "one version per micro-batch")
    assert(TxLog.snapshot(spark, dir2).as[(Long, String)].collect().toSet ==
      Set((10L, "x"), (11L, "y"), (12L, "z")))
  }

  test("buffered sessionization is exact under cross-batch event-time disorder") {
    import spark.implicits._
    import java.sql.Timestamp
    // three single-file micro-batches; batch B's event is EARLIER than
    // batch A's (cross-batch disorder): true sessions for user 1 are
    // {09:00} and {10:00, 10:10} — the compact lastEpoch state cannot
    // recover this, the buffered variant must
    def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val dir = java.nio.file.Files.createTempDirectory("buffered-sessions").toString
    def writeBatch(name: String, rows: Seq[EventStreams.Event], mtime: Long): Unit = {
      val sub = s"$dir/$name"
      rows.toDS().repartition(1).write.parquet(sub)
      // deterministic file-source pickup order via modification times
      new java.io.File(sub).listFiles().foreach(f => f.setLastModified(mtime))
    }
    writeBatch("a", Seq(
      EventStreams.Event(1L, ts("10:00"), 1L, "click", 1.0),
      EventStreams.Event(2L, ts("10:10"), 1L, "click", 1.0)), 1000000L)
    writeBatch("b", Seq(
      EventStreams.Event(3L, ts("09:00"), 1L, "click", 1.0)), 2000000L)
    writeBatch("c", Seq( // watermark pusher: 14:00 − 1h ≫ 10:10 + gap
      EventStreams.Event(9L, ts("14:00"), 99L, "click", 1.0)), 3000000L)
    val schema = implicitly[org.apache.spark.sql.Encoder[EventStreams.Event]].schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .as[EventStreams.Event]
    val q = EventStreams.sessionizeBuffered(stream, gapSec = 1800).writeStream
      .outputMode("append")
      .format("memory")
      .queryName("buffered_sessions")
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("buffered_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 3L)), s"got $out") // 2 sessions, 3 events — exact despite disorder
  }

  test("buffered sessionization compacts closed sessions mid-stream and still counts exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val dir = java.nio.file.Files.createTempDirectory("buffered-compact").toString
    def writeBatch(name: String, rows: Seq[EventStreams.Event], mtime: Long): Unit = {
      val sub = s"$dir/$name"
      rows.toDS().repartition(1).write.parquet(sub)
      new java.io.File(sub).listFiles().foreach(f => f.setLastModified(mtime))
    }
    // batch A closes user 1's first session and pushes the watermark to
    // 10:00 (user 99 at 11:00, 1h delay); batch B's 10:30 event arrives
    // with fold boundary 09:30, so the 09:00/09:10 prefix compacts into
    // the summary while 10:30 stays buffered; batch C pushes the
    // watermark past 11:00 and times user 1 out.
    writeBatch("a", Seq(
      EventStreams.Event(1L, ts("09:00"), 1L, "click", 1.0),
      EventStreams.Event(2L, ts("09:10"), 1L, "click", 1.0),
      EventStreams.Event(8L, ts("11:00"), 99L, "click", 1.0)), 1000000L)
    writeBatch("b", Seq(
      EventStreams.Event(3L, ts("10:30"), 1L, "click", 1.0)), 2000000L)
    writeBatch("c", Seq(
      EventStreams.Event(9L, ts("14:00"), 99L, "click", 1.0)), 3000000L)
    val schema = implicitly[org.apache.spark.sql.Encoder[EventStreams.Event]].schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .as[EventStreams.Event]
    val q = EventStreams.sessionizeBuffered(stream, gapSec = 1800).writeStream
      .outputMode("append")
      .format("memory")
      .queryName("buffered_compact")
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("buffered_compact")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 3L)), s"got $out") // sessions {09:00,09:10} and {10:30}
  }

  test("streaming windowed aggregation equals the batch q17 aggregation") {
    val raw = Tables.events(spark, sfDir)
    // file stream sources need a directory, not a single file
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStreams
      .runWindowedStream(spark, dir.toString, raw.schema)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventStreams
      .windowedCounts(events)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
  }

  test("streaming HLL: drained registers equal the batch sketch; duplicate files are free") {
    val raw = Tables.events(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("events-hll-stream")
    // the SAME file staged twice: every user id arrives twice, and the
    // register max must absorb the repeats — the merge-idempotence that
    // makes the sketch safe under redelivery
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events_again.parquet"))
    val streamed = EventStreams
      .runHllStream(spark, dir.toString, raw.schema, p = 4,
        queryName = s"hll_spec_${System.nanoTime()}")
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batch = graft.operators.Sketches
      .hllDistinct(
        events.select(window(col("ts"), "1 hour").as("__w"), col("user_id")),
        "__w", "user_id", p = 4)
      .select(col("__w.start"), col("n_registers"), col("est_distinct"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch)
  }

  test("streaming top-k: exact-regime drain equals batch counts with the " +
    "same rank cut; redelivery DOUBLES estimates (sum-merge)") {
    val raw = Tables.events(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__w")).orderBy(col("est").desc, col("term"))
    def batchTopk(times: Int) = events
      .filter(col("event_type").isNotNull)
      .select(window(col("ts"), "1 hour").as("__w"),
        col("event_type").as("term"))
      .groupBy(col("__w"), col("term"))
      .agg((count(lit(1)) * times).as("est"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("__w.start"), col("rank"), col("term"), col("est"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val dir = java.nio.file.Files.createTempDirectory("events-topk-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    def streamed() = EventStreams
      .runTopKStream(spark, dir.toString, raw.schema, m = 64, k = 3,
        queryName = s"topk_spec_${System.nanoTime()}")
      .collect()
      .map { r =>
        assert(r.getLong(4) == 0L) // exact regime: every err 0
        (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getLong(3))
      }
      .toSet
    assert(streamed() == batchTopk(1))
    // the SAME file staged again: counts are sum-merged state, so a
    // redelivered source doubles every estimate (the CMS caveat — the
    // qe12 tx-log sink is the dedup layer when sources can repeat)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events_again.parquet"))
    assert(streamed() == batchTopk(2))
  }

  test("streaming quantile sketch: multi-batch drain equals the batch " +
      "aggregate; state stays bounded; below-k windows answer exactly") {
    import spark.implicits._
    val raw = Tables.events(spark, sfDir)
    // TWO staged files + maxFilesPerTrigger=1 => the merge path (not
    // just reduce) carries state across micro-batches
    val dir = java.nio.file.Files.createTempDirectory("events-q-stream")
    raw.repartition(2).write.mode("overwrite").parquet(dir.toString)
    // k = 64: every sf0.001 window is below k — the exact path.
    // k = 2: windows exceed k — the level-rise/prune/merge path.
    for (k <- Seq(64, 2)) {
    val streamed = EventStreams
      .runQuantileStream(spark, dir.toString, raw.schema, k = k,
        qs = Seq(0.5, 0.95),
        queryName = s"q_spec_${System.nanoTime()}")
      .collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // batch reference: the SAME aggregator run as one batch aggregate
    val h = graft.operators.Sketches.md5Hash32(col("__id"))
    val src = events
      .filter(col("value").isNotNull && col("event_id").isNotNull)
      .select(window(col("ts"), "1 hour").as("__w"),
        col("value").cast("double").as("__v"),
        col("event_id").cast("string").as("__id"))
      .select(col("__w"), col("__v"), col("__id"),
        when(h === 0L, lit(32))
          .otherwise(length(bin(h.bitwiseAND(-h))) - lit(1))
          .cast("int").as("__tz"))
    val agg = udaf(new graft.operators.LevelSampleAgg(k))
    val st = src.groupBy(col("__w"))
      .agg(agg(col("__tz"), col("__v"), col("__id")).as("__st"))
      .select(col("__w.start").as("ws"), col("__st._1").as("n"),
        col("__st._2").as("level"),
        sort_array(col("__st._3")).as("rows"))
      .collect()
    // per-window: n exact, the retained set is {tz >= L(n)}, and the
    // streamed nearest-rank answers replay from it
    val byW = st.map(r => r.getTimestamp(0) ->
      ((r.getLong(1), r.getLong(2), r.getSeq[org.apache.spark.sql.Row](3)))).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (ws, q, n, lvl, ns, est) =>
      val (bn, blvl, rows) = byW(ws)
      assert(n == bn && lvl == blvl && ns == rows.size.toLong,
        s"stream/batch state mismatch at $ws")
      val sorted = rows.map(r => (r.getDouble(1), r.getString(2)))
        .sortBy(identity)
      val target = math.max(1L, math.ceil(n.toDouble * q).toLong)
      val istar = math.min(((target - 1) >> lvl.toInt) + 1, ns)
      assert(est == sorted((istar - 1).toInt)._1, s"answer mismatch at $ws q=$q")
      // bounded state: Binomial(n, 2^-L) with mean <= k — 4k is 6+
      // sigma out, the spec-pinned bound
      assert(ns <= 4L * k, s"state $ns exceeds 4k at $ws")
      // below-k windows degrade to exact: level 0, the sample IS the set
      if (n <= k) assert(lvl == 0L && ns == n)
    }
    // at sf0.001 most hourly windows hold < 64 events — the exact path
    // is genuinely exercised
    assert(streamed.exists(_._3 <= k))
    // and at k = 2 some window must have RISEN its level (the sketch
    // path), or the small-k leg proves nothing
    if (k == 2) assert(streamed.exists(_._4 > 0L),
      "no window exercised the level-rise path at k=2")
    }
  }

  test("streaming CMS: deterministic drain; redelivery DOUBLES estimates (sum-merge, unlike HLL's max)") {
    val raw = Tables.events(spark, sfDir)
    val once = java.nio.file.Files.createTempDirectory("events-cms-once")
    val twice = java.nio.file.Files.createTempDirectory("events-cms-twice")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      once.resolve("events.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      twice.resolve("events.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      twice.resolve("events_again.parquet"))
    def run(dir: java.nio.file.Path, tag: String) = EventStreams
      .runCmsStream(spark, dir.toString, raw.schema,
        probes = Seq("click", "purchase", "zzz_missing"),
        queryName = s"cms_spec_${tag}_${System.nanoTime()}")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val single = run(once, "a")
    // deterministic: a second drain of the same files reproduces it
    assert(run(once, "b") == single)
    // sum is the CMS merge: every cell doubles, so every min doubles —
    // the at-least-once caveat the HLL sketch (register max) does NOT
    // have; exactly-once delivery is the qe12 sink's job, not the
    // sketch's
    val doubled = run(twice, "c")
    assert(doubled.keySet == single.keySet)
    single.foreach { case (k, v) => assert(doubled(k) == 2 * v, s"$k") }
    // the present probes are genuinely counted somewhere
    assert(single.exists { case ((_, t), v) => t == "click" && v > 0 })
    intercept[IllegalArgumentException](
      EventStreams.runCmsStream(spark, once.toString, raw.schema, probes = Seq.empty))
  }

  test("streaming near-dup LSH: single batch ≡ batch minHashDedup; cross-batch first-seen-wins") {
    import spark.implicits._
    // real corpus slice: 60 docs incl. planted near-dups
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 60)
    val batchSurvivors = graft.operators.Dedup
      .minHashDedup(corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("neardup-stream").toString
    val docsDs = corpus.as[(Long, String)]
      .map { case (id, t) => EventStreams.StreamDoc(id, t) }
    docsDs.repartition(1).write.parquet(s"$dir/a")
    new java.io.File(s"$dir/a").listFiles().foreach(_.setLastModified(1000000L))
    // batch 2: re-send doc 0's text under a NEW smaller-looking id bucket
    // (id 1000) plus one genuinely novel doc — first-seen-wins must flag
    // the re-send dup even though batch ids differ
    val doc0Text = corpus.filter(col("doc_id") === 0).select("text").first().getString(0)
    Seq(
      EventStreams.StreamDoc(1000L, doc0Text),
      EventStreams.StreamDoc(1001L, "utterly novel zebra quantum paragraph nothing shares these words at all " * 3))
      .toDS().repartition(1).write.parquet(s"$dir/b")
    new java.io.File(s"$dir/b").listFiles().foreach(_.setLastModified(2000000L))
    val schema = implicitly[org.apache.spark.sql.Encoder[EventStreams.StreamDoc]].schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .as[EventStreams.StreamDoc]
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = EventStreams.nearDupBandVerdicts(stream).writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[EventStreams.BandVerdict], id: Long) =>
        val s = EventStreams.nearDupSurvivors(df.toDF())
          .collect().map(_.getLong(0)).toSet
        if (s.nonEmpty || df.count() > 0) perBatch.synchronized { perBatch(id) = s }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = perBatch.toSeq.sortBy(_._1).map(_._2).filter(_.nonEmpty)
    assert(streamed.nonEmpty)
    // batch 1 survivors ≡ the batch operator on the same corpus
    assert(streamed.head == batchSurvivors,
      s"single-batch mismatch: ${streamed.head.diff(batchSurvivors)} / ${batchSurvivors.diff(streamed.head)}")
    // batch 2: the re-sent text is dup (bucket owned since batch 1), the
    // novel doc survives
    assert(streamed.last.contains(1001L) && !streamed.last.contains(1000L),
      s"cross-batch survivors: ${streamed.last}")
  }

  test("stream-static incremental dedup: corpus hits drop, novel fingerprints exactly once") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("incdedup-stream").toString
    Seq(
      EventStreams.StreamDoc(10L, "ALPHA  beta"), // normalizes into the corpus → drop
      EventStreams.StreamDoc(11L, "epsilon zeta"), // novel
      EventStreams.StreamDoc(12L, "epsilon zeta")) // in-batch dup of 11
      .toDS().repartition(1).write.parquet(s"$dir/a")
    new java.io.File(s"$dir/a").listFiles().foreach(_.setLastModified(1000000L))
    Seq(
      EventStreams.StreamDoc(13L, "epsilon  zeta"), // cross-batch dup → state drops it
      EventStreams.StreamDoc(14L, "eta theta")) // novel
      .toDS().repartition(1).write.parquet(s"$dir/b")
    new java.io.File(s"$dir/b").listFiles().foreach(_.setLastModified(2000000L))
    val schema = implicitly[org.apache.spark.sql.Encoder[EventStreams.StreamDoc]].schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = EventStreams.incrementalDedupStream(stream, corpus, "text").writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val s = df.select("doc_id").collect().map(_.getLong(0)).toSet
        if (s.nonEmpty) perBatch.synchronized { perBatch(id) = s }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val batches = perBatch.toSeq.sortBy(_._1).map(_._2)
    assert(batches.size == 2, s"expected survivors in both batches: $perBatch")
    // batch 1: corpus hit (10) gone, exactly ONE of the in-batch twins
    assert(batches.head.subsetOf(Set(11L, 12L)) && batches.head.size == 1, s"batch 1: ${batches.head}")
    // batch 2: 13 is a cross-batch dup (state), 14 survives
    assert(batches.last == Set(14L), s"batch 2: ${batches.last}")
  }

  test("streaming near-dup TTL: dup within horizon, forgotten (survives) past it") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(t: String) = Timestamp.valueOf(
      s"2024-01-01 $t" + (if (t.count(_ == ':') == 1) ":00" else ""))
    val text = "a highly distinctive crawl page body with many stable words " * 3
    val dir = java.nio.file.Files.createTempDirectory("neardup-ttl").toString
    def writeBatch(name: String, rows: Seq[EventStreams.StreamDocTs], mtime: Long): Unit = {
      val sub = s"$dir/$name"
      rows.toDS().repartition(1).write.parquet(sub)
      new java.io.File(sub).listFiles().foreach(_.setLastModified(mtime))
    }
    // ttl 600 s: batch B re-sends within the horizon (dup), batch C
    // pushes the watermark far past lastSeen + ttl (bucket expires),
    // batch D re-sends after expiry (survives)
    writeBatch("a", Seq(EventStreams.StreamDocTs(1L, text, ts("10:00"))), 1000000L)
    writeBatch("b", Seq(EventStreams.StreamDocTs(2L, text, ts("10:05"))), 2000000L)
    writeBatch("c", Seq(EventStreams.StreamDocTs(3L, "completely unrelated watermark pusher content zebra", ts("14:00"))), 3000000L)
    // watermark computation lags one batch AND a key's timeout only
    // fires in a batch where that key receives NO data — c2 is the batch
    // where the 13:50 watermark takes effect and doc-1's idle buckets
    // (timeout 10:15) actually expire
    writeBatch("c2", Seq(EventStreams.StreamDocTs(5L, "another unrelated quokka pusher wholly different", ts("14:00:30"))), 4000000L)
    writeBatch("d", Seq(EventStreams.StreamDocTs(4L, text, ts("14:01"))), 5000000L)
    val schema = implicitly[org.apache.spark.sql.Encoder[EventStreams.StreamDocTs]].schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .as[EventStreams.StreamDocTs]
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = EventStreams.nearDupBandVerdictsTtl(stream, ttlSec = 600).writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[EventStreams.BandVerdict], _: Long) =>
        val s = EventStreams.nearDupSurvivors(df.toDF()).collect().map(_.getLong(0)).toSet
        survivors.synchronized { if (s.nonEmpty) survivors += s }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val all = survivors.reduceOption(_ ++ _).getOrElse(Set.empty)
    assert(all.contains(1L), s"first sighting must survive: $all")
    assert(!all.contains(2L), s"re-send inside the TTL horizon must be flagged: $all")
    assert(all.contains(4L), s"re-send AFTER bucket expiry must survive (weakened contract): $all")
    assert(all.contains(3L))
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    val raw = Tables.events(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("events-dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("a.parquet"))
    // duplicate the whole file: every event id appears twice in the stream
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("b.parquet"))
    val stream = spark.readStream.schema(raw.schema).parquet(dir.toString)
    val withTs = Tables.normalizeTs(stream)
    val q = EventStreams
      .dedupStream(withTs, "event_id")
      .writeStream.outputMode("append").format("memory").queryName("dedup_events").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_events").count()
    assert(got == events.count()) // each id exactly once despite 2× input
  }

  test("multimodal: decode stub features are deterministic and shaped") {
    import spark.implicits._
    val media = graft.multimodal.Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))
    val feats = graft.multimodal.Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.feature.length == 16))
    assert(feats.forall(f => f.byte_entropy >= 0 && f.byte_entropy <= 8))
    val again = graft.multimodal.Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.mean_byte).sorted.sameElements(again.map(_.mean_byte).sorted))
  }

  test("multimodal: null payloads are empty media, not NPEs") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    import graft.multimodal.Multimodal.{Media, MediaMeta}
    val media = Seq(
      Media(1L, MediaMeta("image", 64, 64, 16000), null),
      Media(2L, MediaMeta("image", 64, 64, 16000), Array[Byte](1, 2, 3))).toDS()
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f.n_bytes).toMap
    assert(feats(1L) == 0L && feats(2L) == 3L)
    val frames = Multimodal.sampleFrames(media, everyK = 1, frameBytes = 2).collect()
    assert(frames.count(_.getLong(0) == 1L) == 1) // one empty frame
    val resized = Multimodal.resizeStub(media, 2).collect().map(m => m.media_id -> m.bytes.length).toMap
    assert(resized(1L) == 0 && resized(2L) == 1)
  }

  test("stream-stream interval join equals the batch equivalent") {
    val raw = Tables.events(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("events-ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), dir.resolve("e.parquet"))
    val stream = Tables.normalizeTs(
      spark.readStream.schema(raw.schema).parquet(dir.toString))
    val q = EventStreams.clickToPurchaseJoin(stream)
      .writeStream.outputMode("append").format("memory").queryName("ssj").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssj").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val batch = EventStreams.clickToPurchaseJoin(events).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("chained dedup -> stream-stream join: cross-batch dups vanish before the join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val in = MemoryStream[(Long, Long, Long, String, Double)]
      val ev = in.toDF().toDF("event_id", "us", "user_id", "event_type", "value")
        .withColumn("ts", timestamp_micros($"us")).drop("us")
        // exactly ONE watermark, owned by the dedup; the join inherits it
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
      val q = EventStreams.clickToPurchaseJoin(ev, windowSec = 600, preWatermarked = true)
        .writeStream.outputMode("append").format("memory").queryName("dedupjoin").start()
      val h = 3600L * 1000000L
      // base offset well past epoch: the initial watermark is 0 (epoch),
      // and a row whose event time equals it is filtered as LATE — rows
      // at ts=0 silently vanish before any operator sees them
      val b = 24L * h
      // batch 1: click u1, purchase u1 within window (joins), click u2
      in.addData((1L, b, 1L, "click", 0.0), (2L, b + 100L * 1000000L, 1L, "purchase", 9.5),
        (3L, b, 2L, "click", 0.0))
      q.processAllAvailable()
      // batch 2: byte-identical RE-SENT rows (cross-batch dedup state must
      // drop them — letting them through would duplicate the (1,2) join
      // row and fabricate a (3,4) match from the re-sent click), plus one
      // genuinely new purchase for u2
      in.addData((1L, b, 1L, "click", 0.0), (2L, b + 100L * 1000000L, 1L, "purchase", 9.5),
        (4L, b + 200L * 1000000L, 2L, "purchase", 4.0))
      q.processAllAvailable()
      // watermark-advancing tail so nothing is stuck in state
      in.addData((99L, b + 3L * h, 0L, "click", 0.0), (98L, b + 3L * h, 0L, "purchase", 0.0))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("dedupjoin").filter($"user_id" > 0).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toList.sorted
      assert(rows == List((1L, 2L), (3L, 4L)), s"got $rows")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  test("stream-stream LEFT OUTER join: matches emit eagerly, nulls only after watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val in = MemoryStream[(Long, Long, Long, String, Double, String)]
      val ev = in.toDF()
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros($"us")).drop("us")
      val q = EventStreams.clickToPurchaseJoin(ev, windowSec = 600, joinType = "left_outer")
        .writeStream.outputMode("append").format("memory").queryName("ssloj").start()
      def rows() = spark.table("ssloj").filter($"user_id" >= 0).collect()
        .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
      try {
        val t0 = 1000000000L * 1000000L // base µs
        // batch 1: user 1 click converts (+300 s), user 2 click does not
        in.addData(
          (10L, t0, 1L, "click", 0.0, "{}"),
          (11L, t0 + 300L * 1000000L, 1L, "purchase", 5.0, "{}"),
          (20L, t0, 2L, "click", 0.0, "{}"))
        q.processAllAvailable()
        // the match is out eagerly; the non-converting click is NOT out yet
        assert(rows() == Set((10L, Some(11L))))
        // batch 2: watermark-advancing rows on BOTH sides (global wm = min)
        val far = t0 + 10L * 86400L * 1000000L
        in.addData(
          (90L, far, -1L, "click", 0.0, "{}"),
          (91L, far, -2L, "purchase", 0.0, "{}"))
        q.processAllAvailable()
        in.addData(
          (92L, far + 1000000L, -1L, "click", 0.0, "{}"),
          (93L, far + 1000000L, -2L, "purchase", 0.0, "{}"))
        q.processAllAvailable() // eviction flush
        assert(rows() == Set((10L, Some(11L)), (20L, None)),
          "non-converting click must emit exactly one null-padded row after eviction")
      } finally q.stop()
      // a too-late purchase (outside the 600 s window) stays unmatched
      val batch = EventStreams.clickToPurchaseJoin(
        Seq((1L, 1000L * 1000000L, 7L, "click", 0.0, "{}"),
          (2L, 2000L * 1000000L, 7L, "purchase", 9.0, "{}"))
          .toDF("event_id", "us", "user_id", "event_type", "value", "props")
          .withColumn("ts", timestamp_micros($"us")).drop("us"),
        windowSec = 600, joinType = "left_outer").collect()
      assert(batch.length == 1 && batch(0).isNullAt(2))
      // full outer (batch form): the out-of-window purchase surfaces as
      // its own null-click row carrying its user via the coalesce
      val full = EventStreams.clickToPurchaseJoin(
        Seq((1L, 1000L * 1000000L, 7L, "click", 0.0, "{}"),
          (2L, 2000L * 1000000L, 7L, "purchase", 9.0, "{}"))
          .toDF("event_id", "us", "user_id", "event_type", "value", "props")
          .withColumn("ts", timestamp_micros($"us")).drop("us"),
        windowSec = 600, joinType = "full_outer").collect()
      assert(full.length == 2)
      assert(full.exists(r => r.isNullAt(2) && r.getLong(0) == 1L))
      assert(full.exists(r => r.isNullAt(0) && r.getLong(1) == 7L && r.getLong(2) == 2L))
      // unsupported types still fail loudly
      intercept[IllegalArgumentException](
        EventStreams.clickToPurchaseJoin(events, 600, joinType = "right_outer"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  test("multimodal: resize halves metadata and payload in lockstep") {
    import spark.implicits._
    val media = graft.multimodal.Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))
    val resized = graft.multimodal.Multimodal.resizeStub(media, factor = 2).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    resized.foreach { m =>
      val o = orig(m.media_id)
      assert(m.meta.width == o.meta.width / 2 && m.meta.height == o.meta.height / 2)
      assert(m.bytes.length == (o.bytes.length + 3) / 4)
      if (o.bytes.nonEmpty) assert(m.bytes(0) == o.bytes(0)) // deterministic subsample
    }
  }

  test("multimodal: frame sampling multiplies rows by payload size") {
    import spark.implicits._
    val media = graft.multimodal.Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))
    val frames = graft.multimodal.Multimodal.sampleFrames(media, everyK = 2, frameBytes = 64)
    assert(frames.count() >= media.count())
  }

  test("multimodal: imageDims reads PNG/GIF/BMP/JPEG headers without a codec") {
    import graft.multimodal.Multimodal.imageDims
    // PNG: signature + IHDR length/type + 320×200 big-endian
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 1, 0x40, 0, 0, 0, 0xC8, 8, 6, 0, 0, 0).map(_.toByte)
    assert(imageDims(png).contains(("png", 320, 200)))
    // GIF89a 17×9 little-endian
    val gif = "GIF89a".getBytes("ASCII") ++ Array[Byte](17, 0, 9, 0)
    assert(imageDims(gif).contains(("gif", 17, 9)))
    // BMP with negative (top-down) height −33, width 12
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 12
    bmp(22) = (-33 & 0xff).toByte; bmp(23) = 0xff.toByte; bmp(24) = 0xff.toByte; bmp(25) = 0xff.toByte
    assert(imageDims(bmp).contains(("bmp", 12, 33)))
    // JPEG: SOI, APP0 (skipped via its length), SOF0 with height 7, width 5
    val jpg = Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0, 4, 0, 0, // APP0, length 4 (2 payload bytes)
      0xff, 0xc0, 0, 11, 8, 0, 7, 0, 5, 3, 0, 0, 0).map(_.toByte)
    assert(imageDims(jpg).contains(("jpeg", 5, 7)))
    // non-image bytes and nulls are None, never a throw
    assert(imageDims("plain text".getBytes).isEmpty && imageDims(null).isEmpty)
  }

  test("multimodal: imageDims reads TIFF and WebP headers without a codec") {
    import graft.multimodal.Multimodal.imageDims
    // TIFF both byte orders: real header built by the engine's own writer
    val dir = java.nio.file.Files.createTempDirectory("dims")
    val p = dir.resolve("t.tif").toString
    graft.sources.GeoTiff.write(p, 19, 7, Array.fill(19 * 7)(1.0f), 1.0, 1.0, 0.0, 7.0)
    assert(imageDims(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      .contains(("tiff", 19, 7)))
    // big-endian TIFF, hand-built: MM, 42, IFD at 8 with tags 256/257
    val be = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.BIG_ENDIAN)
    be.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    be.putShort(8, 2.toShort)
    be.putShort(10, 256.toShort); be.putShort(12, 3.toShort); be.putInt(14, 1); be.putShort(18, 640.toShort)
    be.putShort(22, 257.toShort); be.putShort(24, 3.toShort); be.putInt(26, 1); be.putShort(30, 480.toShort)
    assert(imageDims(be.array()).contains(("tiff", 640, 480)))
    // WebP lossy (VP8 ): RIFF header + key-frame start code + 14-bit dims
    def riff(fourcc: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("ASCII") ++ Array[Byte](0, 0, 0, 0) ++ "WEBP".getBytes("ASCII") ++
        fourcc.getBytes("ASCII") ++ Array[Byte](0, 0, 0, 0) ++ payload
    val vp8 = riff("VP8 ", Array[Int](0, 0, 0, 0x9d, 0x01, 0x2a, 100, 0, 60, 0).map(_.toByte))
    assert(imageDims(vp8).contains(("webp", 100, 60)))
    // WebP lossless (VP8L): 0x2F then width-1/height-1 packed 14+14 bits
    val bits = (99 & 0x3fff) | ((59 & 0x3fff) << 14)
    val vp8l = riff("VP8L", Array[Byte](0x2f,
      (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
      ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte, 0))
    assert(imageDims(vp8l).contains(("webp", 100, 60)))
    // WebP extended (VP8X): 24-bit canvas-1 dims after 4 flag bytes
    val vp8x = riff("VP8X", Array[Byte](0, 0, 0, 0, 99, 0, 0, 59, 0, 0))
    assert(imageDims(vp8x).contains(("webp", 100, 60)))
  }

  test("multimodal: extractFeaturesDecoded runs stats over REAL decoded JPEG pixels") {
    import graft.multimodal.Multimodal
    val w = 16; val h = 16
    // two constant 8x8 block columns: 10s on the left, 200s on the right
    val px = Array.tabulate(w * h)(i => if ((i % w) / 8 == 0) 10 else 200)
    val jpeg = graft.sources.Jpeg.encodeGray(px, w, h)
    // decodeImage yields the true pixels (block-constant => exact)
    assert(Multimodal.decodeImage(jpeg).get.map(_ & 0xff).toSeq == px.toSeq)
    // non-JPEG payloads have no codec here -> None (stub tier handles them)
    assert(Multimodal.decodeImage("plain bytes".getBytes).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    // Dataset path: stats come from pixels, n_bytes from the payload
    import spark.implicits._
    val media = Seq(Multimodal.Media(1L, Multimodal.MediaMeta("image", w, h, 0), jpeg)).toDS()
    val f = Multimodal.extractFeaturesDecoded(media).collect().head
    assert(f.mean_byte == 105.0) // (10 + 200) / 2 over pixels, NOT jpeg bytes
    assert(math.abs(f.byte_entropy - 1.0) < 1e-12) // two equally likely values
    assert(f.n_bytes == jpeg.length)
  }

  test("streaming media: decoded running aggregate equals the batch form over all batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.multimodal.Multimodal
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def wavClip(id: Long, rate: Int): Multimodal.Media = {
      val samples = Array.tabulate(256)(i => (((i * 31 + id * 7) % 4096) - 2048).toShort)
      Multimodal.Media(id, Multimodal.MediaMeta("audio", 0, 0, rate),
        graft.sources.Wav.encodeMono16(samples, rate))
    }
    def flacClip(id: Long, rate: Int): Multimodal.Media = {
      val samples = Array.tabulate(300)(i => (1000 * math.sin(i * 0.1 + id)).toShort)
      Multimodal.Media(id, Multimodal.MediaMeta("audio", 0, 0, rate),
        graft.sources.Flac.encodeMono16(samples, rate))
    }
    val batch1 = Seq(wavClip(1, 8000), wavClip(2, 16000), flacClip(3, 16000))
    val batch2 = Seq(flacClip(4, 8000), wavClip(5, 16000),
      Multimodal.Media(6, Multimodal.MediaMeta("audio", 0, 0, 0), "not audio".getBytes))
    val in = MemoryStream[Multimodal.Media]
    val q = MediaStream.audioQualityByRate(in.toDS())
      .writeStream.outputMode("update").format("memory").queryName("media_agg").start()
    try {
      in.addData(batch1)
      q.processAllAvailable()
      in.addData(batch2)
      q.processAllAvailable()
      // latest update per rate == the batch aggregate over ALL clips
      val streamed = spark.sql("SELECT * FROM media_agg").collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2._1)._2 } // latest = most clips
      val expect = MediaStream.audioQualityByRate((batch1 ++ batch2).toDS())
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(streamed == expect)
      // the corrupt payload landed as the zero-sample row (rate 0), not a crash
      assert(expect.contains(0) && expect(0)._2 == 0L)
    } finally q.stop()
  }

  test("streaming EAUL: per-batch recompute equals the batch sweep on folded stats") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (g, od) = graft.graph.DemoNetwork.grid(6) // the qg3 network — non-degenerate EAUL
    val stats0 = graft.graph.DemoNetwork.floodStats(g)
    val traffic = graft.graph.DemoNetwork.yearlyTraffic(od.length)
    def table(df: org.apache.spark.sql.DataFrame): Map[(String, String), Double] =
      df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

    val in = MemoryStream[EaulStream.DepthUpdate]
    val results = scala.collection.mutable.Map.empty[Long, Map[(String, String), Double]]
    val q = EaulStream.recompute(in.toDS(), g, stats0, od, traffic, Set.empty) {
      (id, df) => results(id) = table(df)
    }
    try {
      // batch 0: no revisions -> identical to the plain batch sweep
      in.addData(Seq.empty[EaulStream.DepthUpdate])
      q.processAllAvailable()
      assert(results(0) == table(graft.graph.Eaul.sweep(spark, g, stats0, od, traffic, Set.empty)))
      // batch 1: flood a previously-dry way; streaming result must equal
      // the batch sweep over the SAME folded stats
      val revs = Seq(
        // ARRIVAL order deliberately disagrees with seq order: the stale
        // depth (seq=1) arrives last and must still lose
        EaulStream.DepthUpdate(g.ways(1).name, 500, 2.0, 50.0, seq = 2L),
        EaulStream.DepthUpdate(g.ways(1).name, 1000, 2.5, 100.0, seq = 3L),
        EaulStream.DepthUpdate(g.ways(1).name, 500, 9.9, 1.0, seq = 1L))
      in.addData(revs)
      q.processAllAvailable()
      val folded = EaulStream.fold(stats0, revs)
      assert(folded.depth(g.ways(1).name)(500) == 2.0) // seq wins, not arrival
      assert(results(1) == table(graft.graph.Eaul.sweep(spark, g, folded, od, traffic, Set.empty)))
      // the revision actually changed the answer (not a vacuous identity)
      assert(results(0) != results(1))
    } finally q.stop()
  }
  test("qe14 observability: state metrics expose join buffering and watermark eviction") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    // (event_id, event_type, user_id, sec, value)
    val mem = MemoryStream[(Long, String, Long, Long, Double)]
    val events = mem.toDF()
      .toDF("event_id", "event_type", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds($"sec"))
      .drop("sec")
    val joined = EventStreams.clickToPurchaseJoin(events, windowSec = 3600)
      .observe("qe14", count(lit(1)).as("rows"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("qe14_obs").start()
    try {
      // batch 0: one converting click, one dangling click, one purchase
      mem.addData((1L, "click", 1L, 100L, 0.0), (2L, "click", 2L, 100L, 0.0),
        (3L, "purchase", 1L, 200L, 5.0))
      q.processAllAvailable()
      // batch 1 + 2: sentinels on BOTH sides push the min-watermark past
      // click_ts + window + delay, so batch 2 evicts batch 0's state
      mem.addData((90L, "click", 999L, 11000L, 0.0), (91L, "purchase", 997L, 11000L, 0.0))
      q.processAllAvailable()
      mem.addData((92L, "click", 999L, 12000L, 0.0), (93L, "purchase", 998L, 12000L, 0.0))
      q.processAllAvailable()

      val sm = EventStreams.stateMetrics(q)
      assert(sm.nonEmpty, "no state metrics harvested")
      val rowsByBatch = sm.groupBy(_.batchId).view.mapValues(_.map(_.stateRows).sum).toMap
      val peak = rowsByBatch.values.max
      val last = rowsByBatch(rowsByBatch.keys.max)
      // batch 0 buffers the 3 unexpired rows; eviction later shrinks state
      assert(peak >= 3L, s"peak state rows $peak, history $rowsByBatch")
      assert(last < peak, s"watermark never evicted: $rowsByBatch")
      // the watermark surfaced in the metrics advanced past epoch 0
      assert(sm.exists(_.watermark.exists(_ > "1970-01-01T01:00:00")))
      // observed per-batch counters: exactly the one converting pair emitted
      val om = EventStreams.observedMetrics(q, "qe14")
      assert(om.nonEmpty && om.values.map(_.getLong(0)).sum == 1L,
        s"observed rows ${om.view.mapValues(_.toString).toMap}")
    } finally q.stop()
  }

}
