package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bridge-table preparation (reference `scripts/prep-bridge/prep-bridge.js`)
  * — the F3/F4/F5/F6 scalar-cleanup family as one composable projection:
  *
  *  - F3 (prep-bridge.js:48-55): road id from the first 5 chars of
  *    `Link_ID` via `([A-Z])0*([1-9][0-9]*)` → e.g. `N000201…` → `N2`;
  *  - F4 (prep-bridge.js:57-58): `Des_Type === 'CULV' ? 'culvert' :
  *    'bridge'`;
  *  - F5 (prep-bridge.js:60-64): strip thousands commas, cast, and default
  *    unknown (0) length to 7 m;
  *  - S6 (preparation.sh:113 csv2geojson): GPS_E/GPS_S → point geometry.
  *
  * Pure narrow projection — runs inside one codegen stage at any scale.
  */
object BridgePrep {

  def roadId(linkId: Column): Column = {
    val head = substring(linkId, 1, 5)
    concat(
      regexp_extract(head, "([A-Z])0*([1-9][0-9]*)", 1),
      regexp_extract(head, "([A-Z])0*([1-9][0-9]*)", 2))
  }

  def structureType(desType: Column): Column =
    when(desType === "CULV", "culvert").otherwise("bridge")

  def cleanLength(overLength: Column): Column = {
    val n = regexp_replace(overLength, ",", "").cast("double")
    when(n.isNull || n === 0.0, 7.0).otherwise(n)
  }

  /** Full prep: bridges CSV columns → typed rows with point geometry. */
  def prepare(bridges: DataFrame): DataFrame =
    bridges.select(
      col("Str_ID").as("bridge_id"),
      roadId(col("Link_ID")).as("road_id"),
      structureType(col("Des_Type")).as("type"),
      cleanLength(col("Over_Length")).as("length"),
      array(col("GPS_E").cast("double"), col("GPS_S").cast("double")).as("geometry"))
}
