/** graft — a Spark-native analytics engine with the capabilities of the
  * `developmentseed/moz-datapipeline` reference (see SURVEY.md), plus the
  * corpus-scale training-data operators such an engine needs (ENGINE.md is
  * the per-operator coverage map).
  *
  * Architecture (SURVEY §7, Spark-first — not a port):
  *
  *  - `graft.operators` — relational/spatial/dedup/similarity operators as
  *    composable DataFrame transformations; everything declarative stays
  *    inside Catalyst so pushdown/pruning/join-planning are free.
  *  - `graft.functions` — scalar kernels: geo math, text analysis, vector
  *    ops; hot kernels are custom codegen `Expression`s
  *    (`functions.expressions`) or compiled UDFs, never interpreted
  *    array-HOF chains on the scan path.
  *  - `graft.graph` — the routing core: broadcast CSR graph + in-JVM
  *    Dijkstra, with criticality and EAUL as embarrassingly-parallel
  *    scenario sweeps (the reference's OSRM extract/contract/table cycle
  *    collapses to a `wayFactor` closure per scenario).
  *  - `graft.plans` — custom Catalyst operator (LogicalPlan + Strategy +
  *    SparkPlan) for the route matrix: the one operator built-ins can't
  *    express.
  *  - `graft.sources` — shapefile/.dbf, GeoJSON, OSM-XML readers (binary
  *    parsing executor-side, one task per file).
  *  - `graft.streaming` — batch/stream-shared event-time transforms.
  *  - `graft.multimodal` — binary media columns with per-partition decode
  *    plumbing (stubbed codec, real batch shape).
  *
  * Driver contract: `SparkEntry` (queries + DuckDB oracle SQL), `Verify`
  * (correctness dump), `Bench` (timings), `Explain` (plan audit),
  * `Pipeline` (five-stage composed run).
  */
package object graft
