package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S2/S3 — GeoJSON FeatureCollection scan/sink (reference loads whole
  * collections into memory, `indicator-from-areas.js:55-57`; writes with a
  * single serialize, `filter-percentile.js:73`).
  *
  * Scan: `multiLine` JSON → one row per FeatureCollection → `explode` the
  * features array → one row per feature with `geom_type`, `coordinates`
  * (kept as raw JSON string — ring nesting varies by geometry type) and the
  * dynamic `properties` struct (schema inferred, SURVEY §1.3).
  *
  * Sink: single-file FeatureCollection (tiles/API consumers need one file,
  * so the final egress is a deliberate single-partition write — the ONLY
  * place a collect-like pattern is legitimate; everything upstream stays
  * distributed).
  */
object GeoJson {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    raw
      .select(explode(col("features")).as("f"))
      .select(
        col("f.geometry.type").as("geom_type"),
        to_json(col("f.geometry.coordinates")).as("coordinates_json"),
        col("f.properties.*"))
  }

  /** Line/point coordinates as array<array<double>> for the geo kernel
    * (Point is wrapped to a 1-element line).
    */
  def lineCoords(df: DataFrame): DataFrame =
    df.withColumn(
      "coords",
      when(
        col("geom_type") === "Point",
        array(from_json(col("coordinates_json"), org.apache.spark.sql.types.DataTypes.createArrayType(org.apache.spark.sql.types.DataTypes.DoubleType))))
        .otherwise(from_json(
          col("coordinates_json"),
          org.apache.spark.sql.types.DataTypes.createArrayType(
            org.apache.spark.sql.types.DataTypes.createArrayType(org.apache.spark.sql.types.DataTypes.DoubleType)))))

  /** Write a DataFrame as one GeoJSON FeatureCollection file. `geomJson`
    * must hold the feature's geometry as a JSON string; all other columns
    * become properties.
    */
  def write(df: DataFrame, geomJsonCol: String, path: String): Unit = {
    val props = df.columns.filterNot(_ == geomJsonCol)
    val features = df.select(
      concat(
        lit("""{"type":"Feature","geometry":"""),
        col(geomJsonCol),
        lit(""","properties":"""),
        to_json(struct(props.map(col): _*)),
        lit("}")).as("feature"))
    val joined = features
      .agg(concat_ws(",", collect_list(col("feature"))).as("joined"))
      .select(concat(lit("""{"type":"FeatureCollection","features":["""), col("joined"), lit("]}")).as("value"))
    joined.coalesce(1).write.mode(SaveMode.Overwrite).text(path)
  }
}
