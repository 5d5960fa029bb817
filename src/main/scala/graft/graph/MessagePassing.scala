package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WEIGHTED MESSAGE PASSING (GNN-style neighbourhood aggregation) — the
  * data-preparation primitive behind graph feature engineering and GNN
  * training pipelines: for a fixed round count,
  * `h_{r+1}(v) = h_r(v) + Σ_{(u→v, w)} w · h_r(u)` — each node folds
  * its weighted in-neighbourhood into its feature, so after R rounds a
  * node's value summarizes its R-hop upstream cone (Weisfeiler-Leman
  * style structural signatures; two nodes differing at hop ≤ R get
  * different features almost surely).
  *
  * ALL-INTEGER by construction: the seed feature is the node's weighted
  * OUT-degree (an exact count aggregate) and every round is
  * multiply-and-sum over exact Longs, so any engine replays the rounds
  * bit-for-bit — no damping constant, no normalization float. Magnitude
  * grows as (Σw)^R·h₀: with counts as weights this stays inside a Long
  * for R = 2 well past 10⁸-edge graphs (ANSI overflow would THROW, not
  * corrupt — the honest failure). Production variants at larger R
  * rescale per round (the qg14 HITS constant-divisor pattern); the
  * integer form is the oracle-exact core.
  *
  * Shape per round: one equi-join of edges against the feature vector
  * on src + one dst-keyed sum with map-side partials + one left join
  * back to the node set (isolated/no-inflow nodes keep their feature) —
  * all shuffles edge- or node-bounded. Fixed R keeps lineage shallow
  * (no checkpoint needed below ~8 rounds).
  */
object MessagePassing {

  /** `(node, feature)` after `rounds` of weighted-sum aggregation over
    * the directed weighted edge list.
    */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 8,
      s"rounds must be in [0,8] (see magnitude note), got $rounds")
    val e = edges.select(
      col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      col(wCol).cast("long").as("w"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
    val h0 = nodes
      .join(e.groupBy(col("src").as("node")).agg(sum(col("w")).as("__out")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__out"), lit(0L)).as("feature"))
    (1 to rounds).foldLeft(h0) { (h, _) =>
      val msg = e
        .join(h.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("w") * col("feature")).as("__in"))
      h.join(msg, Seq("node"), "left")
        .select(col("node"),
          (col("feature") + coalesce(col("__in"), lit(0L))).as("feature"))
    }
  }

}
