package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.expressions.TextHashKernel

/** Measured-quality evidence for the FNV-1a + xor-fold hash that feeds
  * every LSH path (MinHash permutations, SimHash sign votes).
  *
  * Why this spec exists: FNV-1a's low bits are weakly mixed (bit 0 of
  * the raw hash is a parity function of the input bytes), and the
  * engine keeps FNV anyway because the whole pipeline — finalizer
  * included — must replay inside DuckDB SQL for the oracle gates
  * (`Dedup.hash64` scaladoc has the replay contract). The xor-fold
  * finalizer (`h ^ (h >>> 32)`) folds the well-mixed high bits onto the
  * weak low bits; this spec MEASURES, on the real test corpus, that the
  * folded hash is good enough for the LSH shapes built on it — the
  * "record measured dedup recall to confirm the tradeoff" option. Pure
  * kernel-level measurement: the corpus (500 docs, 25 planted near-dup
  * pairs at Jaccard ≥ 0.9) is small enough to brute-force ground truth
  * on the driver, so the bound is exact, not itself an estimate.
  */
class HashQualitySpec extends AnyFunSuite {

  private lazy val docs: Array[(Long, String)] = {
    val spark = graft.GraftSession.local(2, "hash-quality-spec")
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
  }

  test("MinHash LSH candidate recall on true near-dups ≥ ideal-hash expectation − noise") {
    // same shape as Dedup.minHashDedup defaults: 16 hashes, 4 bands × 4 rows
    val (numHashes, bands, rpb, shingle) = (16, 4, 4, 3)
    val cs = TextHashKernel.minHashCoefs(numHashes, 42L)
    val (ca, cb) = (cs.map(_._1), cs.map(_._2))
    val sigs = docs.map { case (id, t) =>
      id -> TextHashKernel.minHashSignature(t, shingle, ca, cb)
    }.toMap
    val sets = docs.map { case (id, t) =>
      id -> TextHashKernel.wordShingleSet(t, shingle).toSet
    }.toMap
    val ids = docs.map(_._1).sorted
    // brute-force ground truth: all pairs with exact Jaccard ≥ 0.8
    val truePairs = for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      u = (a ++ b).size if u > 0
      s = (a & b).size.toDouble / u if s >= 0.8
    } yield (ids(i), ids(j), s)
    val tp = truePairs.toVector
    assert(tp.size >= 20, s"corpus lost its planted near-dups (${tp.size} true pairs)")
    // candidate iff some band's row slice matches exactly (bucket equality
    // modulo xxhash collisions, which only ADD candidates in the operator)
    def candidate(x: Long, y: Long): Boolean = {
      val (sx, sy) = (sigs(x), sigs(y))
      (0 until bands).exists { b =>
        var r = 0; var eq = true
        while (r < rpb && eq) { eq = sx(b * rpb + r) == sy(b * rpb + r); r += 1 }
        eq
      }
    }
    val found = tp.count { case (x, y, _) => candidate(x, y) }
    val recall = found.toDouble / tp.size
    // ideal-hash expectation: P(candidate | s) = 1 − (1 − s^rpb)^bands
    val expected = tp.map { case (_, _, s) =>
      1.0 - math.pow(1.0 - math.pow(s, rpb), bands)
    }.sum / tp.size
    // binomial noise on 25 pairs is ~±0.06 at 1σ; a weak-bit hash failure
    // mode (correlated permutations) would crater recall far below this
    assert(recall >= expected - 0.1,
      s"measured LSH recall $recall vs ideal-hash expectation $expected " +
        s"($found/${tp.size} true pairs found) — FNV mixing degraded banding")
  }

  test("hash64 bits are balanced over real shingles; SimHash separates dups from the rest") {
    // bit balance is measured on the HASH over distinct shingles, not on
    // SimHash over docs: the synthetic corpus shares a ~30-word
    // vocabulary, so per-doc SimHash majorities are corpus-correlated by
    // construction (measured bit-1 fraction 0.17 — structure, not hash).
    // 16k distinct shingles is plenty to expose an unmixed parity bit.
    val shingles = docs.flatMap(d => TextHashKernel.wordShingleSet(d._2, 3)).distinct
    assert(shingles.length > 5000)
    val hs = shingles.map(TextHashKernel.hash64)
    (0 until 64).foreach { b =>
      val f = hs.count(h => ((h >>> b) & 1L) == 1L).toDouble / hs.length
      // measured 0.491–0.507 across all 64 bits; an unmixed FNV parity
      // bit drifts to structure-dependent extremes
      assert(f > 0.45 && f < 0.55, s"hash64 bit $b set fraction $f — weakly mixed bit")
    }
    // SimHash separation: what the ≤3-hamming dedup threshold needs is a
    // GAP, not absolute hamming ≈32 (shared vocabulary compresses
    // unrelated-pair hamming — measured mean ≈18.7 here, min 4)
    val sigs = docs.map { case (_, t) => TextHashKernel.simHash64(t) }
    val dupPairs = (for {
      i <- sigs.indices.iterator; j <- (i + 1) until sigs.length
      if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3
    } yield 1).size
    assert(dupPairs >= 15 && dupPairs <= 40,
      s"$dupPairs pairs at hamming ≤3 — expected ≈ the 25 planted near-dup pairs")
    val strideMean = sigs.indices
      .map(i => java.lang.Long.bitCount(sigs(i) ^ sigs((i + 37) % sigs.length)))
      .sum.toDouble / sigs.length
    assert(strideMean > 10, s"stride-pair mean hamming $strideMean — no dup/non-dup gap")
  }

  test("band-bucket sizes stay near uniform (no FNV-induced bucket skew)") {
    val (numHashes, bands, rpb, shingle) = (16, 4, 4, 3)
    val cs = TextHashKernel.minHashCoefs(numHashes, 42L)
    val (ca, cb) = (cs.map(_._1), cs.map(_._2))
    // bucket key = (band, row slice); the operator's xxhash64 over the
    // slice cannot split a bucket, so this measures the worst case
    val buckets = docs.iterator.flatMap { case (_, t) =>
      val sig = TextHashKernel.minHashSignature(t, shingle, ca, cb)
      (0 until bands).iterator.map(b => (b, sig.slice(b * rpb, b * rpb + rpb).toVector))
    }.toVector.groupBy(identity).map(_._2.size)
    // 500 docs × 4 bands; with 25 planted dup pairs the largest honest
    // bucket is small — a mixing failure collapses signatures into few
    // mega-buckets and blows the LSH join up quadratically
    assert(buckets.max <= 20,
      s"largest band bucket ${buckets.max} of ${buckets.sum} rows — hash collapsing buckets")
  }
}
