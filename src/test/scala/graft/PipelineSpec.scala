package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end run of the five-stage indicator pipeline (§3.1) — OSM XML
  * ingest → graph build → criticality → EAUL sweep → merge → CSV/JSON
  * egress — asserting the egressed ARTIFACTS (what a downstream tile
  * builder would consume), not just in-memory frames.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "pipeline-spec")

  test("five-stage pipeline egresses merged indicators and EAUL results") {
    val outDir = java.nio.file.Files.createTempDirectory("pipeline-out").toString
    Pipeline.run(spark, Pipeline.demoOsmDir(), outDir)

    val indicators = spark.read.option("header", "true").csv(s"$outDir/indicators")
    // grid(6): 60 ways, every one present after the merge, each with a
    // parseable criticality score in [0, 100]
    assert(indicators.count() == 60)
    assert(indicators.columns.contains("crit_score"))
    val scores = indicators
      .select(col("crit_score").cast("double"))
      .collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0 && s <= 100))
    assert(scores.exists(_ > 0)) // leave-one-out found at least one critical way

    val eaul = spark.read.json(s"$outDir/eaul")
    // 60 ways × 3 upgrades + baseline = 181 rows
    assert(eaul.count() == 181)
    assert(eaul.filter(col("way_id") === "baseline").count() == 1)
  }
}
