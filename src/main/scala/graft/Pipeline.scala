package graft

import graft.graph.{Criticality, Eaul, RoadGraph, Routing}
import graft.sources.OsmXml
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** §3.1 — the reference's five-stage indicator pipeline (`indicators.sh`)
  * as ONE runnable program over an OSM road network + OD points: graph
  * build → criticality indicator → EAUL sweep → indicator merge → CSV +
  * GeoJSON egress. The reference exchanged every arrow through `.tmp`
  * files and S3 between separate node processes; here each stage is a
  * DataFrame the next stage consumes lazily.
  *
  * Usage: `sbt "runMain graft.Pipeline <osmDir> <outDir>"` — with no args,
  * runs the golden 10-segment network end-to-end (writes to /tmp).
  */
object Pipeline {

  def run(spark: SparkSession, osmDir: String, outDir: String): Unit = {
    // stage 1-2: ingest + graph build (base-network + preparation)
    val (nodesDf, waysDf) = OsmXml.read(spark, osmDir)
    val g = RoadGraph.fromOsm(spark, nodesDf, waysDf)
    // OD points: the four extreme nodes + center snap (stand-in for the
    // od.geojson ingest — callers with real OD data snap the same way)
    val od = Array(
      0,
      g.numNodes - 1,
      g.snap(g.nodeLon.sum / g.numNodes, g.nodeLat.sum / g.numNodes))

    // stage 3: criticality indicator (way_id, score)
    val criticality = Criticality.scores(spark, g, od)
      .select(col("way_id"), round(col("score"), 2).as("score"))

    // stage 4: EAUL (flood stats default-zero when no stats table rides
    // along; real runs pass the flood-stats maps)
    val stats = Eaul.FloodStats(
      Map.empty.withDefaultValue(Map.empty),
      Map.empty.withDefaultValue(Map.empty))
    val yearly = Array.fill(od.length, od.length)(100.0 * 365)
    val eaul = Eaul.sweep(spark, g, stats, od, yearly, Set.empty)

    // stage 5: merge onto the road network + egress
    val rn = waysDf.select(
      col("tags")("NAME").as("NAME"),
      col("tags")("RUC").cast("double").as("RUC"))
    val merged = operators.Relational.mergeIndicators(
      rn, "NAME",
      Seq("crit" -> criticality.withColumnRenamed("way_id", "way_id")))
    merged.write.mode("overwrite").option("header", "true").csv(s"$outDir/indicators")
    eaul.write.mode("overwrite").json(s"$outDir/eaul")
    println(s"[pipeline] ways=${g.ways.length} nodes=${g.numNodes} " +
      s"criticality_rows=${criticality.count()} eaul_rows=${eaul.count()} -> $outDir")
  }

  /** Serialize the grid(6) demo network to OSM XML in a temp dir —
    * the self-contained input for demo runs and the end-to-end spec.
    */
  def demoOsmDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("pipeline-osm")
    val nodes = graft.graph.DemoNetwork.grid(6)._1
    val osmNodes = (0 until nodes.numNodes).map(i => OsmXml.OsmNode(i.toLong, nodes.nodeLon(i), nodes.nodeLat(i)))
    val osmWays = nodes.ways.map { w =>
      // recover endpoints from the CSR for serialization
      val e = (0 until nodes.numNodes).flatMap { s =>
        (nodes.indptr(s) until nodes.indptr(s + 1))
          .filter(ei => nodes.wayOfEdge(ei) == w.idx)
          .map(ei => (s.toLong, nodes.nbr(ei).toLong))
      }.head
      OsmXml.OsmWay(w.osmId, Seq(e._1, e._2),
        Map("NAME" -> w.name, "RUC" -> w.ruc.toString, "length" -> w.lengthM.toString,
          "SURF_TYPE" -> w.surface, "ROAD_CLASS" -> w.roadClass))
    }
    OsmXml.write(osmNodes, osmWays.toSeq, dir.resolve("net.osm").toString)
    dir.toString
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-pipeline")
    val (osmDir, outDir) = args match {
      case Array(i, o) => (i, o)
      case _ =>
        (demoOsmDir(), java.nio.file.Files.createTempDirectory("pipeline-out").toString)
    }
    run(spark, osmDir, outDir)
    spark.stop()
  }
}
