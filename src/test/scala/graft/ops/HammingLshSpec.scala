package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The pigeonhole losslessness claim of hammingBandedPairs as a property:
  * for random fingerprint sets (sized under the skew guard so no bucket
  * drops), the banded join's pair set EQUALS the brute-force all-pairs
  * Hamming filter — at both band geometries the engine uses (4x16 for
  * the text SimHash radius 3, 8x8 for the perceptual image radius 7).
  * Seeds mix planted near-dups (flip k random bits) with uniform noise
  * so both sides of the radius are exercised.
  */
class HammingLshSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(hs: Seq[(Long, Long)], maxHamming: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, ha) <- hs
      (ib, hb) <- hs
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= maxHamming
    } yield (ia, ib, d.toLong)).toSet

  private def banded(hs: Seq[(Long, Long)], maxHamming: Int, bands: Int): Set[(Long, Long, Long)] =
    TextDedup.hammingBandedPairs(hs.toDF("id", "h"), maxHamming, bands)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue()))
      .toSet

  private def fixtures(seed: Long, n: Int, planted: Int, flipBits: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map(i => i.toLong -> rnd.nextLong())
    val dups = (0 until planted).map { j =>
      val (srcId, h) = base(rnd.nextInt(n))
      var v = h
      (0 until rnd.nextInt(flipBits + 1)).foreach(_ => v ^= 1L << rnd.nextInt(64))
      (n + j).toLong -> v
    }
    base ++ dups
  }

  test("4x16 bands, radius 3: banded pairs == brute force (3 seeds)") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val hs = fixtures(seed, n = 40, planted = 12, flipBits = 5)
      assert(banded(hs, 3, 4) == bruteForce(hs, 3), s"seed $seed")
    }
  }

  test("8x8 bands, radius 7: banded pairs == brute force (3 seeds)") {
    for (seed <- Seq(11L, 12L, 13L)) {
      val hs = fixtures(seed, n = 40, planted = 12, flipBits = 10)
      assert(banded(hs, 7, 8) == bruteForce(hs, 7), s"seed $seed")
    }
  }

  test("maxHamming >= bands is rejected (the losslessness precondition)") {
    intercept[IllegalArgumentException] {
      TextDedup.hammingBandedPairs(Seq((1L, 2L)).toDF("id", "h"), 4, 4)
    }
  }
}
