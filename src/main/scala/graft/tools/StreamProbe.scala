package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc PHASE timing probe for the stream-gate floor (VERDICT r11
  * task 6): replicates qe6's body with a timer around each phase —
  * stage copy, schema read, sentinel writes, stream start,
  * processAllAvailable, stop — to split "per-query session setup
  * (shareable)" from "genuine multi-batch semantics (not)".
  * Run: `tools/jv.sh graft.tools.StreamProbe [sfDir]`.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warmup
    def phase[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe]   $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (i <- 1 to 3) {
      println(s"[probe] === qe6 replica, run $i")
      val t0 = System.nanoTime()
      val stage = phase("stage copy") {
        val st = Files.createTempDirectory("graft-probe-src")
        val src = Paths.get(dir, "events.parquet")
        if (Files.isDirectory(src)) {
          Files.list(src).forEach { p =>
            if (p.toString.endsWith(".parquet"))
              Files.copy(p, st.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
          }
        } else Files.copy(src, st.resolve("events.parquet"))
        st
      }
      val schema = phase("schema read")(spark.read.parquet(stage.toString).schema)
      val tsType = schema("ts").dataType
      val tsIsLong = tsType == org.apache.spark.sql.types.LongType
      val maxUs = phase("max ts agg") {
        graft.Tables.normalizeTs(spark.read.parquet(stage.toString))
          .agg(max(unix_micros(col("ts")))).first().getLong(0)
      }
      phase("sentinel writes") {
        import spark.implicits._
        (1 to 2).foreach { n =>
          val us = maxUs + 86400L * 1000000L * (100 + n)
          val df = Seq((-1L * n, if (tsIsLong) us * 1000 else us, -1L, "s", 0.0, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          val one =
            if (tsIsLong) df
            else df.withColumn("ts", timestamp_micros(col("ts")).cast(tsType))
          val tmp = Files.createTempDirectory("graft-probe-sent")
          one.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          Files.list(tmp).forEach { p =>
            if (p.toString.endsWith(".parquet"))
              Files.move(p, stage.resolve(s"zz_sentinel_$n.parquet"),
                StandardCopyOption.REPLACE_EXISTING)
          }
        }
      }
      val parts = sys.env.getOrElse("PROBE_PARTS", "8")
      val ckpt = sys.env.get("PROBE_CKPT")
        .map(base => Files.createTempDirectory(Paths.get(base), "probe-ckpt").toString)
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val name = s"probe_mem_${System.nanoTime()}"
      val q = phase("query start") {
        val w = graft.Tables.normalizeTs(spark.readStream.schema(schema).parquet(stage.toString))
          .withWatermark("ts", "1 second")
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(
            unix_timestamp(col("w.start")).as("session_start"),
            col("user_id"), col("n_events"))
          .writeStream.outputMode("append").format("memory").queryName(name)
        ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
      }
      phase("processAllAvailable")(q.processAllAvailable())
      q.recentProgress.foreach { p =>
        println(s"[probe]     batch ${p.batchId}: total=${p.durationMs.get("triggerExecution")}ms " +
          s"addBatch=${p.durationMs.get("addBatch")}ms commit=${p.durationMs.getOrDefault("commitOffsets", -1L)}ms " +
          s"stateCommit rows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} in=${p.numInputRows}")
      }
      phase("stop + count") {
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        spark.table(name).filter(col("user_id") >= 0).count()
      }
      println(f"[probe]   TOTAL                  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      Files.list(stage).forEach(p => Files.deleteIfExists(p))
      Files.deleteIfExists(stage)
    }
    spark.stop()
  }
}
