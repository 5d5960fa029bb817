package graft.operators

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale deduplication operators for training-data pipelines:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup. Designed shuffle-minimal:
  *
  *  - exact dedup is one hash-groupBy (map-side partial combine);
  *  - MinHash/SimHash banding turns the O(n²) pair problem into a
  *    band-bucket equi-join — only docs sharing a band hash ever meet,
  *    so the shuffle volume is O(n·bands), not O(n²);
  *  - candidate verification (exact Jaccard / hamming / cosine) runs only
  *    inside buckets.
  *
  * All signatures are deterministic (seeded), so results are stable across
  * runs and cluster sizes.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per normalized-text fingerprint.
    * One shuffle on the 64-bit fingerprint. `min_by` semantics via min(id)
    * + semi-join-free aggregation keeps it a single pass.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = docs.withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
    val keep = fp.groupBy("__fp").agg(min(col(idCol)).as(idCol))
    fp.join(keep, Seq("__fp", idCol)).drop("__fp")
  }

  /** MinHash signature: `numHashes` permutations approximated by
    * `min((a_i * xxhash64(shingle) + b_i) mod p)` over word shingles.
    * Column-only: shingles → per-hash min via `transform` + `array_min`.
    */
  def minHashSignature(text: Column, shingleSize: Int, numHashes: Int, seed: Long = 42L): Column = {
    // 31-bit Mersenne prime field: shingle hash is reduced mod p BEFORE the
    // affine mix, so a·h + b < 2^62 never overflows Long under ANSI mode.
    val prime = 2147483647L // 2^31 - 1
    val rnd = new scala.util.Random(seed)
    val coefs = Seq.fill(numHashes)((rnd.nextInt(prime.toInt - 1) + 1L, rnd.nextInt(prime.toInt).toLong))
    val shingleHashes = transform(TextFunctions.wordShingles(text, shingleSize), s => pmod(xxhash64(s), lit(prime)))
    array(coefs.map { case (a, b) =>
      array_min(transform(shingleHashes, h => pmod(h * a + b, lit(prime))))
    }: _*)
  }

  /** MinHash + LSH near-dup clustering:
    * signature → split into `bands` bands of `rowsPerBand` → explode one row
    * per band → groupBy (band index, band-hash) → bucket ids. Docs sharing
    * any bucket are candidate dups; we keep the min doc id per bucket and
    * return docs dropped as near-duplicates of an earlier doc.
    *
    * Returns the deduplicated DataFrame (survivors).
    */
  def minHashDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = docs.withColumn("__sig", minHashSignature(col(textCol), shingleSize, numHashes))
    val banded = withSig
      .select(col(idCol), col("__sig"))
      .withColumn("__band", explode(array((0 until bands).map(lit): _*)))
      .withColumn("__bandhash", xxhash64(slice(col("__sig"), col("__band") * rowsPerBand + 1, lit(rowsPerBand)), col("__band")))
    // min doc id within each band bucket; a doc is a duplicate if ANY of
    // its buckets contains a smaller id
    val w = Window.partitionBy("__bandhash")
    val earliest = banded
      .withColumn("__bucketmin", min(col(idCol)).over(w))
      .groupBy(col(idCol))
      .agg(min(col("__bucketmin")).as("__keepid"))
    val survivors = earliest.filter(col(idCol) === col("__keepid")).select(col(idCol))
    docs.join(survivors, Seq(idCol), "left_semi")
  }

  /** SimHash: 64-bit signature where bit i = sign of the weighted sum of
    * token-hash bit i across tokens. Near-dups have small hamming distance.
    */
  def simHash(text: Column): Column = {
    val tokenHashes = transform(split(lower(trim(text)), "\\s+"), t => xxhash64(t))
    val bitCols = (0 until 64).map { i =>
      // per-bit vote: +1 if bit set, -1 otherwise, summed over tokens
      val vote = aggregate(
        tokenHashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup dedup: docs whose signatures agree on any of 4
    * 16-bit blocks are candidates (guarantees recall for hamming ≤ 3);
    * verify with full hamming ≤ `maxHamming`; keep the lowest id of each
    * verified pair's cluster.
    */
  def simHashDedup(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol), simHash(col(textCol)).as("__sig"))
    val blocked = sigs.withColumn("__blk", explode(array((0 until 4).map(lit): _*)))
      .withColumn("__blkval", expr("(__sig >> (__blk * 16)) & 65535"))
    val a = blocked.select(col(idCol).as("a_id"), col("__sig").as("a_sig"), col("__blk"), col("__blkval"))
    val b = blocked.select(col(idCol).as("b_id"), col("__sig").as("b_sig"), col("__blk"), col("__blkval"))
    val dupPairs = a.join(b, Seq("__blk", "__blkval"))
      .filter(col("a_id") > col("b_id"))
      .filter(hamming(col("a_sig"), col("b_sig")) <= maxHamming)
      .select(col("a_id").as(idCol)).distinct()
    docs.join(dupPairs, Seq(idCol), "left_anti")
  }

  /** N-gram Jaccard near-dup: MinHash-LSH candidates verified by exact
    * shingle-set Jaccard ≥ `threshold`. The exact verify only touches
    * LSH-candidate pairs, so the expensive set intersection never runs on
    * the full cross product.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  def ngramJaccardDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      numHashes: Int = 16,
      bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val prepared = docs.select(
      col(idCol),
      array_distinct(TextFunctions.wordShingles(col(textCol), shingleSize)).as("__sh"),
      minHashSignature(col(textCol), shingleSize, numHashes).as("__sig"))
    val banded = prepared
      .withColumn("__band", explode(array((0 until bands).map(lit): _*)))
      .withColumn("__bandhash", xxhash64(slice(col("__sig"), col("__band") * rowsPerBand + 1, lit(rowsPerBand)), col("__band")))
      .select(col(idCol), col("__sh"), col("__bandhash"))
    val a = banded.select(col(idCol).as("a_id"), col("__sh").as("a_sh"), col("__bandhash"))
    val b = banded.select(col(idCol).as("b_id"), col("__sh").as("b_sh"), col("__bandhash"))
    val dups = a.join(b, Seq("__bandhash"))
      .filter(col("a_id") > col("b_id"))
      .select(col("a_id"), col("a_sh"), col("b_sh")).distinct()
      .filter(jaccard(col("a_sh"), col("b_sh")) >= threshold)
      .select(col("a_id").as(idCol)).distinct()
    docs.join(dups, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-dup: hyperplane-LSH candidates verified by exact
    * cosine ≥ `threshold`; drop the higher id of each verified pair.
    */
  def embeddingNearDup(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      bits: Int = 16): DataFrame = {
    val vecD = transform(col(vecCol), v => v.cast("double"))
    val sigs = embs.withColumn("__sig", VectorFunctions.hyperplaneSignature(vecD, dim, bits))
    val a = sigs.select(col(idCol).as("a_id"), col(vecCol).as("a_v"), col("__sig"))
    val b = sigs.select(col(idCol).as("b_id"), col(vecCol).as("b_v"), col("__sig"))
    val dups = a.join(b, Seq("__sig"))
      .filter(col("a_id") > col("b_id"))
      .filter(
        VectorFunctions.cosine(
          transform(col("a_v"), v => v.cast("double")),
          transform(col("b_v"), v => v.cast("double"))) >= threshold)
      .select(col("a_id").as(idCol)).distinct()
    embs.join(dups, Seq(idCol), "left_anti")
  }
}
