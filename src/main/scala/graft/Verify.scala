package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same AQE coalescing knobs as Bench (defaults = Spark's own) so
      // the correctness dump runs the exact plans the bench times
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY_BYTES", "67108864"))
      // events.parquet stores TIMESTAMP(NANOS); read as Long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local scale runs (sf1+) read single big files; a smaller split
      // size stands in for the many-file layout a real table has
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated filter (same contract as Bench's) for
    // single-query iteration; the driver sets no filter
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val succeeded = scala.collection.mutable.TreeSet.empty[String]
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
          System.err.println(df.coalesce(1).queryExecution.executedPlan.toString.take(8000))
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        succeeded += name
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Verified-gates manifest (tools/verified_gates.txt, checked in):
    // RegistrySpec asserts every declared gate is listed, so a gate added
    // without a successful Verify run fails `sbt test` — the mechanical
    // form of the "no untested gate ships in a snapshot" process rule.
    // A filtered (SPARK_GRAFT_ONLY) run MERGES its successes; a full run
    // REWRITES the file to exactly the gates that dumped, so a renamed or
    // broken gate drops out. Best-effort: skipped when cwd isn't the repo.
    try {
      val manifest = Paths.get("tools", "verified_gates.txt")
      if (Files.isDirectory(Paths.get("tools"))) {
        val prior: Set[String] =
          if (Files.exists(manifest))
            Files.readString(manifest).split("\n").map(_.trim).filter(_.nonEmpty).toSet
          else Set.empty
        val updated =
          if (only.isDefined) (prior ++ succeeded).toSeq.sorted else succeeded.toSeq
        Files.writeString(manifest, updated.mkString("", "\n", "\n"))
      }
    } catch { case e: Throwable =>
      System.err.println(s"[verify] manifest write skipped: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
