package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc PHASE timing probe for qd17's sf1 cost (VERDICT r11 task 1
  * follow-through): times the containment join's two checkpointed
  * stages — dictionary collapse (`containmentGroups`) and rare-first
  * ordering (`containmentOrdered`) — then the full gate, so
  * candidates+verify fall out as the difference.
  * Run: `tools/jv.sh graft.tools.ContainmentProbe [sfDir]`.
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def phase[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (i <- 1 to 3) {
      println(s"[probe] === containment phases, run $i")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val docs = graft.Tables.documents(spark, dir)
      val groups = phase("groups (collapse)") {
        graft.operators.Dedup.containmentGroups(docs, "doc_id", "text", 3)
      }
      phase("ordered (rare-1st)") {
        graft.operators.Dedup.containmentOrdered(groups).count()
      }
      phase("FULL gate") {
        graft.operators.Dedup.containmentJoin(docs, "doc_id", "text", 0.9).count()
      }
    }
    spark.stop()
  }
}
