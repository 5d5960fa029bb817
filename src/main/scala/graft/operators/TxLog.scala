package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** TRANSACTION-LOG TABLE FORMAT — versioned, atomically-committed
  * parquet tables with time travel, the minimal Delta-Lake/Iceberg shape
  * an incremental curation pipeline needs (the qd12/qd13/qd15
  * incremental-dedup operators maintain a standing corpus ARTIFACT; this
  * is the storage contract that makes updating that artifact safe while
  * trainers read it).
  *
  * Layout:
  * {{{
  *   table/
  *     data/c<version>-<uuid>/part-*.parquet   (immutable once committed)
  *     _log/<20-digit version>.json            (one commit per version)
  * }}}
  *
  * A commit file holds `{version, schemaJson, add: [...], remove: [...]}`
  * with paths RELATIVE to the table root. The live file set at version v
  * is the log replay `adds − removes` over commits 0..v — so a reader
  * never lists `data/` (at 100 TB / 10⁵ files, listing is the scan
  * planner's bottleneck and eventually-consistent stores lie); the log
  * IS the file inventory, Iceberg's core argument.
  *
  * Commit protocol: data files land fully under a fresh uuid directory
  * FIRST (invisible — nothing references them), then the commit file is
  * created with Hadoop `create(overwrite = false)`, which throws if the
  * version already exists — the loser of a concurrent race fails loudly
  * and retries against the new head (optimistic concurrency). Readers
  * resolve a version entirely from immutable files, so a reader never
  * sees a half-commit: either the JSON exists (all its data files do
  * too) or the version doesn't exist. On HDFS `create(overwrite=false)`
  * is an atomic namenode op; on S3 the same contract needs a
  * conditional PUT (If-None-Match) — the hook is [[commitFile]], one
  * method to swap. Crashed writers leave only orphan data dirs that no
  * log entry references; [[vacuum]] reclaims them.
  *
  * Reference: no analog (the reference pipeline rewrites flat files in
  * place between stages); this is the beyond-reference storage tier,
  * SURVEY §2's scale mandate applied to mutation.
  */
object TxLog {

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def logPath(root: Path, version: Long): Path =
    new Path(root, f"_log/$version%020d.json")

  /** Committed versions, ascending (empty if the table doesn't exist). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val (f, root) = fs(spark, dir)
    val logDir = new Path(root, "_log")
    if (!f.exists(logDir)) Seq.empty
    else f.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.endsWith(".checkpoint.json"))
      .map(_.stripSuffix(".json").toLong)
      .sorted
  }

  /** Checkpointed versions, ascending (see [[checkpoint]]). */
  private def checkpointVersions(f: FileSystem, root: Path): Seq[Long] = {
    val logDir = new Path(root, "_log")
    if (!f.exists(logDir)) Seq.empty
    else f.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".checkpoint.json"))
      .map(_.stripSuffix(".checkpoint.json").toLong)
      .sorted
  }

  private case class Commit(
      version: Long,
      schemaJson: String,
      add: Seq[String],
      remove: Seq[String],
      statsCol: Option[String],
      stats: Map[String, (Long, Long)])

  private def readCommit(f: FileSystem, root: Path, v: Long): Commit = {
    val in = f.open(logPath(root, v))
    try {
      val node = mapper.readTree(in)
      def arr(name: String): Seq[String] = {
        val a = node.get(name)
        (0 until a.size()).map(a.get(_).asText())
      }
      val statsCol = Option(node.get("statsCol")).filterNot(_.isNull).map(_.asText())
      val stats = Option(node.get("stats")).filterNot(_.isNull) match {
        case None => Map.empty[String, (Long, Long)]
        case Some(s) =>
          val it = s.fields()
          val b = Map.newBuilder[String, (Long, Long)]
          while (it.hasNext) {
            val e = it.next()
            b += e.getKey -> (e.getValue.get(0).asLong(), e.getValue.get(1).asLong())
          }
          b.result()
      }
      Commit(node.get("version").asLong(), node.get("schemaJson").asText(),
        arr("add"), arr("remove"), statsCol, stats)
    } finally in.close()
  }

  /** The one method whose atomicity the whole format rests on: create
    * the version file failing if it exists. Public-contract note: HDFS —
    * atomic; local FS — create(overwrite=false) checks-then-creates;
    * S3 — replace with a conditional PUT.
    */
  private def commitFile(
      f: FileSystem, root: Path, c: Commit): Unit = {
    val bytes = mapper.writeValueAsBytes(
      Map("version" -> c.version, "schemaJson" -> c.schemaJson,
        "add" -> c.add, "remove" -> c.remove,
        "statsCol" -> c.statsCol.orNull,
        "stats" -> c.stats.map { case (p, (lo, hi)) => p -> Seq(lo, hi) }))
    val out = f.create(logPath(root, c.version), false /* never overwrite */)
    try out.write(bytes) finally out.close()
    ()
  }

  /** Stage `df` as parquet under a fresh `data/c<v>-<uuid>` dir; return
    * table-relative paths of the files written, plus per-file (min, max)
    * of `statsCol` when declared — the MANIFEST STATS: collected once at
    * write time by one `groupBy(input_file_name)` pass over the just-
    * written files, stored in the commit, so a later range scan plans
    * its file set from the log alone (zero listing, zero footer probes —
    * the Iceberg manifest argument; the qy5 sidecar's lifecycle-managed
    * big sibling). Nothing references the staged files until the commit
    * file lands.
    */
  private def stage(
      spark: SparkSession,
      root: Path,
      df: DataFrame,
      v: Long,
      statsCol: Option[String]): (Seq[String], Map[String, (Long, Long)]) = {
    val sub = s"data/c$v-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("errorifexists").parquet(new Path(root, sub).toString)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = f.listStatus(new Path(root, sub)).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(n => s"$sub/$n")
      .sorted
    val stats = statsCol match {
      case None => Map.empty[String, (Long, Long)]
      case Some(c) if files.isEmpty => Map.empty[String, (Long, Long)]
      case Some(c) =>
        spark.read.parquet(new Path(root, sub).toString)
          .groupBy(input_file_name().as("uri"))
          .agg(min(col(c).cast("long")).as("lo"), max(col(c).cast("long")).as("hi"))
          .collect()
          .map { r =>
            val u = r.getString(0)
            s"$sub/${u.substring(u.lastIndexOf('/') + 1)}" -> (r.getLong(1), r.getLong(2))
          }.toMap
    }
    (files, stats)
  }

  /** Create the table at `dir` with `df` as version 0. `statsCol`
    * declares a long-valued column whose per-file min/max ride in every
    * commit (see [[snapshotRange]]); it is a table property — appends
    * and rewrites inherit it from the log.
    */
  def create(
      spark: SparkSession, dir: String, df: DataFrame,
      statsCol: Option[String] = None): Long = {
    val (f, root) = fs(spark, dir)
    require(versions(spark, dir).isEmpty, s"table already exists at $dir")
    val (files, stats) = stage(spark, root, df, 0L, statsCol)
    commitFile(f, root, Commit(0L, df.schema.json, files, Seq.empty, statsCol, stats))
    0L
  }

  private def tableStatsCol(f: FileSystem, root: Path, vs: Seq[Long]): Option[String] =
    vs.reverseIterator.map(readCommit(f, root, _).statsCol).collectFirst { case Some(c) => c }

  /** Append `df` as a new version. Returns the committed version. */
  def append(spark: SparkSession, dir: String, df: DataFrame): Long = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    appendAt(spark, dir, df, vs.last + 1)
  }

  /** The optimistic-concurrency core append targets: stage, then claim
    * exactly version `v` — if another writer claimed it between the
    * caller's log read and here, `commitFile` throws and the staged
    * files remain invisible orphans (vacuum's job). Package-visible so
    * the race is directly testable.
    */
  private[graft] def appendAt(spark: SparkSession, dir: String, df: DataFrame, v: Long): Long = {
    val (f, root) = fs(spark, dir)
    val sc = tableStatsCol(f, root, versions(spark, dir))
    val (files, stats) = stage(spark, root, df, v, sc)
    commitFile(f, root, Commit(v, df.schema.json, files, Seq.empty, sc, stats))
    v
  }

  private def replay(
      f: FileSystem, root: Path, upTo: Long): (Seq[String], StructType, Map[String, (Long, Long)]) = {
    // start from the newest checkpoint ≤ upTo: O(commits SINCE it), not
    // O(all commits) — at 10⁵ commits the log replay is otherwise the
    // planner bottleneck the log was built to remove
    val cp = checkpointVersions(f, root).filter(_ <= upTo).lastOption
    var live = scala.collection.immutable.ListSet.empty[String]
    var stats = Map.empty[String, (Long, Long)]
    var schema: StructType = null
    val from = cp match {
      case None => 0L
      case Some(cv) =>
        val c = readCheckpoint(f, root, cv)
        live = live ++ c.add
        stats = c.stats
        schema = org.apache.spark.sql.types.DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
        cv + 1
    }
    (from to upTo).foreach { v =>
      val c = readCommit(f, root, v)
      live = live -- c.remove ++ c.add
      stats = stats -- c.remove ++ c.stats
      schema = org.apache.spark.sql.types.DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
    }
    (live.toSeq.sorted, schema, stats)
  }

  private def checkpointPath(root: Path, v: Long): Path =
    new Path(root, f"_log/$v%020d.checkpoint.json")

  private def readCheckpoint(f: FileSystem, root: Path, v: Long): Commit = {
    val in = f.open(checkpointPath(root, v))
    try {
      val node = mapper.readTree(in)
      val a = node.get("live")
      val live = (0 until a.size()).map(a.get(_).asText())
      val statsCol = Option(node.get("statsCol")).filterNot(_.isNull).map(_.asText())
      val stats = Option(node.get("stats")).filterNot(_.isNull) match {
        case None => Map.empty[String, (Long, Long)]
        case Some(s) =>
          val it = s.fields()
          val b = Map.newBuilder[String, (Long, Long)]
          while (it.hasNext) {
            val e = it.next()
            b += e.getKey -> (e.getValue.get(0).asLong(), e.getValue.get(1).asLong())
          }
          b.result()
      }
      Commit(v, node.get("schemaJson").asText(), live, Seq.empty, statsCol, stats)
    } finally in.close()
  }

  /** LOG CHECKPOINT — collapse the replay prefix 0..`version` into one
    * derived summary file (`_log/<v>.checkpoint.json`: the fully-replayed
    * live set + schema + manifest stats), so any later snapshot /
    * range-scan / vacuum replays from the checkpoint forward instead of
    * from version 0. This is Delta's `_last_checkpoint` argument applied
    * to the qf11 format: the LOG solved O(files) listing, the checkpoint
    * solves O(commits) replay — a long-lived table absorbing a commit a
    * minute crosses 10⁵ commits in ten weeks, at which point cold
    * planning is 10⁵ small reads without one.
    *
    * The checkpoint is pure DERIVED data: it is written to a temp name
    * and RENAMED into place (atomic on HDFS/local — a crashed writer
    * leaves only an ignored temp file, never a half-parsable
    * checkpoint), commits never reference it, readers that ignore it get
    * identical answers (spec-pinned), re-checkpointing the same version
    * is idempotent, and deleting one merely slows the next replay.
    * Call periodically (every ~100 commits) from whatever owns the
    * write path. Returns the checkpointed version.
    */
  def checkpoint(spark: SparkSession, dir: String, version: Option[Long] = None): Long = {
    val (f, root) = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in ${vs.mkString(",")}")
    val (live, schema, stats) = replay(f, root, v)
    val sc = tableStatsCol(f, root, vs.filter(_ <= v))
    val bytes = mapper.writeValueAsBytes(
      Map("version" -> v, "schemaJson" -> schema.json, "live" -> live,
        "statsCol" -> sc.orNull,
        "stats" -> stats.map { case (p, (lo, hi)) => p -> Seq(lo, hi) }))
    val tmp = new Path(root, s"_log/.cp-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, false)
    try out.write(bytes) finally out.close()
    if (!f.rename(tmp, checkpointPath(root, v))) f.delete(tmp, false)
    v
  }

  /** Snapshot read — the table as of `version` (default: latest). The
    * scan lists NOTHING: the file set comes from the log replay, handed
    * to the reader explicitly with the committed schema (so an empty
    * table still has one).
    */
  def snapshot(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val (f, root) = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in ${vs.mkString(",")}")
    val (live, schema, _) = replay(f, root, v)
    if (live.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(live.map(p => new Path(root, p).toString): _*)
  }

  /** Range scan planned ENTIRELY from the log: keep only live files
    * whose committed [lo, hi] stats can contain `[lo, hi]` of the
    * table's declared stats column, scan those with the exact residual
    * BETWEEN. Files committed WITHOUT stats are never pruned (safety
    * under mixed history), and pruning only ever drops provably-disjoint
    * files, so output ≡ `snapshot(...).filter(between)` — the qy8
    * oracle's contract. At 10⁵ files this plans O(matching) tasks from
    * a KB of JSON, no listing, no footer reads.
    */
  def snapshotRange(
      spark: SparkSession,
      dir: String,
      lo: Long,
      hi: Long,
      version: Option[Long] = None): DataFrame = {
    val (f, root) = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in ${vs.mkString(",")}")
    val sc = tableStatsCol(f, root, vs.filter(_ <= v)).getOrElse(
      throw new IllegalArgumentException(s"table at $dir has no statsCol — use snapshot().filter"))
    val (live, schema, stats) = replay(f, root, v)
    val keep = live.filter(p => stats.get(p) match {
      case Some((flo, fhi)) => fhi >= lo && flo <= hi
      case None => true // stat-less file: cannot prove disjoint, must scan
    })
    val base =
      if (keep.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else
        spark.read.schema(schema).parquet(keep.map(p => new Path(root, p).toString): _*)
    base.filter(col(sc).cast("long").between(lo, hi))
  }

  /** Planned file count for a range probe — the pruning metric
    * (TxLogSpec asserts candidates ≪ live files for a narrow range).
    */
  def rangeCandidateFiles(spark: SparkSession, dir: String, lo: Long, hi: Long): Long = {
    val (f, root) = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    val (live, _, stats) = replay(f, root, vs.last)
    live.count(p => stats.get(p) match {
      case Some((flo, fhi)) => fhi >= lo && flo <= hi
      case None => true
    }).toLong
  }

  /** Rewrite: keep only rows satisfying `keep`, touching ONLY the files
    * that actually contain a dropped row (per-file dirty check via one
    * `input_file_name` aggregation — clean files carry over by
    * reference, the dominant case when a retraction hits a bounded key
    * range of a 10⁵-file table). Dirty files' surviving rows are
    * rewritten into the new commit's add-set; the commit removes the
    * dirty files. No dirty files → no commit (returns current version).
    */
  def rewrite(spark: SparkSession, dir: String, keep: Column): Long = {
    val (f, root) = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    val (live, schema, _) = replay(f, root, vs.last)
    if (live.isEmpty) return vs.last
    val byName = live.map(p => p.substring(p.lastIndexOf('/') + 1) -> p).toMap
    require(byName.size == live.size, "duplicate data-file names in live set")
    val cur = spark.read.schema(schema)
      .parquet(live.map(p => new Path(root, p).toString): _*)
    val dirtyNames = cur.filter(!keep)
      .select(input_file_name().as("uri")).distinct()
      .collect()
      .map(r => { val u = r.getString(0); u.substring(u.lastIndexOf('/') + 1) })
      .toSeq.sorted
    if (dirtyNames.isEmpty) return vs.last
    val dirtyRel = dirtyNames.map(byName)
    val v = vs.last + 1
    val dirtyAbs = dirtyRel.map(p => new Path(root, p).toString)
    val rewritten = spark.read.schema(schema).parquet(dirtyAbs: _*).filter(keep)
    val sc = tableStatsCol(f, root, vs)
    val (files, stats) = stage(spark, root, rewritten, v, sc)
    commitFile(f, root, Commit(v, schema.json, files, dirtyRel, sc, stats))
    v
  }

  /** OPTIMIZE — compact (and optionally re-cluster) the live file set
    * into `numFiles` files as ONE atomic commit: the new version adds
    * the compacted files and removes every current live file, so
    * readers switch from the fragmented layout to the compacted one
    * atomically (a snapshot never sees half of each), and time travel
    * to pre-optimize versions keeps working until a retention vacuum.
    * This is the table-format answer to the qf7 small-files problem —
    * a streaming sink (qe12) leaves one small file set per batch;
    * periodic optimize folds them without stopping the writer (the
    * writer claims version head+1 = the optimizer's target, so one of
    * the two loses the claim and retries — never corruption).
    *
    * `clusterBy`: two key columns → the compacted files are
    * Hilbert-clustered ([[Layout.clusterByHilbert]]) so multi-dim
    * min/max pruning holds at rest — Delta's `OPTIMIZE ... ZORDER BY`
    * shape, on the better curve. Without it, a plain `repartition`
    * barrel-files the data. The declared stats column's per-file
    * (min, max) are re-collected for the new files either way.
    */
  def optimize(
      spark: SparkSession,
      dir: String,
      numFiles: Int,
      clusterBy: Seq[String] = Seq.empty): Long = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(clusterBy.isEmpty || clusterBy.size == 2,
      s"clusterBy takes exactly 2 key columns (Hilbert), got ${clusterBy.size}")
    val (f, root) = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    val (live, schema, _) = replay(f, root, vs.last)
    if (live.isEmpty) return vs.last
    val cur = spark.read.schema(schema)
      .parquet(live.map(p => new Path(root, p).toString): _*)
    val arranged =
      if (clusterBy.isEmpty) cur.repartition(numFiles)
      else Layout.clusterByHilbert(cur, clusterBy.map(c => col(c).cast("long")), numFiles)
    val v = vs.last + 1
    val sc = tableStatsCol(f, root, vs)
    val (files, stats) = stage(spark, root, arranged, v, sc)
    commitFile(f, root, Commit(v, schema.json, files, live, sc, stats))
    v
  }

  /** EXACTLY-ONCE streaming ingest: commit micro-batch `batchId` as
    * version `batchId + 1` over a table created (possibly empty) at v0.
    * Structured Streaming redelivers a batch after recovery with the
    * SAME deterministic batchId — and its version file already exists,
    * so the redelivery is a no-op (returns false, commits nothing): the
    * at-least-once delivery + at-most-once version claim = exactly-once
    * table contents, with the claim enforced by the SAME
    * create(overwrite=false) atomicity every other commit uses (a true
    * race on the version still throws rather than double-appending).
    * This is the transactional upgrade of the qe11 overwrite-partition
    * recipe: readers see whole versions, never a half-written batch
    * directory. Single-writer-per-table, like any txn-id scheme.
    */
  def appendStreamBatch(
      spark: SparkSession, dir: String, df: DataFrame, batchId: Long,
      checkpointEvery: Int = 0): Boolean = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    val (f, root) = fs(spark, dir)
    val v = batchId + 1
    if (f.exists(logPath(root, v))) false
    else {
      appendAt(spark, dir, df, v)
      // steady-state log hygiene: a perpetual streaming writer is exactly
      // the producer that crosses 10⁵ commits — fold the replay prefix
      // periodically so cold planning stays O(checkpointEvery)
      if (checkpointEvery > 0 && v % checkpointEvery == 0) checkpoint(spark, dir, Some(v))
      true
    }
  }

  /** Delete data files referenced by NO retained version (crashed
    * writers' orphan stage dirs, and — when `retain` drops old versions
    * — files only old snapshots referenced). Returns deleted
    * table-relative paths. Time travel to a dropped version dies after
    * vacuum, exactly like Delta's.
    */
  def vacuum(
      spark: SparkSession,
      dir: String,
      retain: Option[Seq[Long]] = None): Seq[String] = {
    val (f, root) = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    val keep = retain.getOrElse(vs)
    val referenced = keep.flatMap(v => replay(f, root, v)._1).toSet
    val dataDir = new Path(root, "data")
    if (!f.exists(dataDir)) return Seq.empty
    val rootUri = f.makeQualified(root).toString
    val it = f.listFiles(dataDir, true)
    val all = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val s = it.next().getPath
      val rel = f.makeQualified(s).toString.stripPrefix(rootUri).stripPrefix("/")
      if (rel.endsWith(".parquet")) all += rel
    }
    val orphans = all.toSeq.filterNot(referenced)
    orphans.foreach(p => f.delete(new Path(root, p), false))
    orphans.sorted
  }

  /** MERGE (upsert) — Delta's `WHEN MATCHED THEN UPDATE SET * WHEN NOT
    * MATCHED THEN INSERT *`, committed as ONE atomic version:
    *
    *   final = (target ANTI-JOIN source on keys) ∪ source
    *
    * Scale shape: the target is NEVER rewritten wholesale. One
    * semi-join pass (source keys vs the live scan — Catalyst/AQE
    * broadcast the key projection when the source is small, the
    * dominant upsert case) finds the files that physically contain a
    * matched key; only those files' UNMATCHED survivors are rewritten,
    * clean files carry into the new version by reference, and every
    * source row (update or insert alike) lands in fresh files. A
    * 10⁵-file table absorbing a thousand-row upsert touches O(matched
    * files), not O(table).
    *
    * Source keys must be unique (two source rows matching one target
    * row would make the update nondeterministic — same validation Delta
    * runs); violation throws before anything stages. Source schema must
    * match the table's fields by name. A pure-insert merge (no matched
    * keys) degenerates to an append; an empty source commits nothing.
    * Returns the committed (or current, if no-op) version.
    */
  def merge(
      spark: SparkSession, dir: String, source: DataFrame,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val (f, root) = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    val (live, schema, _) = replay(f, root, vs.last)
    val tableCols = schema.fieldNames.toSeq
    require(source.schema.fieldNames.toSet == tableCols.toSet,
      s"source fields ${source.schema.fieldNames.toSeq} != table fields $tableCols")
    keyCols.foreach(k => require(tableCols.contains(k), s"key column $k not in table"))
    val src = source.select(tableCols.map(col): _*)
    val dupKeys = src.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupKeys == 0L,
      s"source has duplicate rows on merge keys ${keyCols.mkString(",")}")
    if (src.isEmpty) return vs.last
    val v = vs.last + 1
    val sc = tableStatsCol(f, root, vs)
    if (live.isEmpty) { // empty table: merge == insert-all
      val (files, stats) = stage(spark, root, src, v, sc)
      commitFile(f, root, Commit(v, schema.json, files, Seq.empty, sc, stats))
      return v
    }
    val byName = live.map(p => p.substring(p.lastIndexOf('/') + 1) -> p).toMap
    require(byName.size == live.size, "duplicate data-file names in live set")
    val cur = spark.read.schema(schema)
      .parquet(live.map(p => new Path(root, p).toString): _*)
    val srcKeys = src.select(keyCols.map(col): _*).distinct()
    // file name must bind to the scan BEFORE the join (input_file_name is
    // single-source); the semi-join then carries it through
    val dirtyNames = cur.withColumn("__uri", input_file_name())
      .join(srcKeys, keyCols, "left_semi")
      .select(col("__uri").as("uri")).distinct()
      .collect()
      .map(r => { val u = r.getString(0); u.substring(u.lastIndexOf('/') + 1) })
      .toSeq.sorted
    val dirtyRel = dirtyNames.map(byName)
    val survivors =
      if (dirtyRel.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else
        spark.read.schema(schema)
          .parquet(dirtyRel.map(p => new Path(root, p).toString): _*)
          .join(srcKeys, keyCols, "left_anti")
    val (files, stats) = stage(spark, root, survivors.unionByName(src), v, sc)
    commitFile(f, root, Commit(v, schema.json, files, dirtyRel, sc, stats))
    v
  }

  /** ROW-LEVEL CHANGE DATA FEED — the changes each commit in
    * `(fromVersion, toVersion]` made to the table's logical contents,
    * computed from the commit's own add/remove file sets:
    *
    *   inserts(v) = rows(add v) EXCEPT ALL rows(remove v)
    *   deletes(v) = rows(remove v) EXCEPT ALL rows(add v)
    *
    * The EXCEPT ALL cancels the carried rows a file-granularity rewrite
    * re-stages untouched (rewrite/merge/optimize copy dirty files'
    * survivors into new files — physically moved, logically unchanged),
    * so the feed is exactly the logical diff: an upsert surfaces as a
    * delete of the old row + insert of the new one, an optimize
    * surfaces as NOTHING. Cost is a shuffle over only the files the
    * commits in range touched — churn-bounded, never O(table) — which
    * is what lets an incremental consumer (a downstream index, a
    * feature store, the qd12/qd13 incremental-dedup artifacts) follow a
    * 100 TB table by reading KBs of log and MBs of churn.
    *
    * Output: the table columns plus `_commit_version` and
    * `_change_type` ('insert' | 'delete'). Requires the range's data
    * files to still exist (i.e. not reclaimed by a retention vacuum) —
    * same contract as Delta's CDF retention. Removed files are read
    * with the commit's schema (null-filling under widening evolution).
    */
  def changes(
      spark: SparkSession, dir: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    val (f, root) = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    require(fromVersion <= toVersion, s"bad range ($fromVersion, $toVersion]")
    require(vs.contains(toVersion), s"version $toVersion not in ${vs.mkString(",")}")
    val perVersion = ((fromVersion + 1) to toVersion).map { v =>
      val c = readCommit(f, root, v)
      val schema = org.apache.spark.sql.types.DataType.fromJson(c.schemaJson)
        .asInstanceOf[StructType]
      def readSet(rel: Seq[String]): DataFrame =
        if (rel.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else
          spark.read.schema(schema).parquet(rel.map(p => new Path(root, p).toString): _*)
      val added = readSet(c.add)
      val removed = readSet(c.remove)
      val inserts = added.exceptAll(removed)
        .withColumn("_commit_version", lit(v))
        .withColumn("_change_type", lit("insert"))
      val deletes = removed.exceptAll(added)
        .withColumn("_commit_version", lit(v))
        .withColumn("_change_type", lit("delete"))
      inserts.unionByName(deletes)
    }
    require(perVersion.nonEmpty, s"empty version range ($fromVersion, $toVersion]")
    perVersion.reduce(_ unionByName _)
  }
}
