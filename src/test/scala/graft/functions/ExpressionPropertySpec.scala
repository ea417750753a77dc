package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Properties of the custom codegen expressions against independent
  * re-implementations (plain Scala split/sliding + the XXH64 API).
  */
object ExpressionPropertySpec extends Properties("CustomExpressions") {

  // words may be empty (consecutive/leading/trailing spaces) and contain
  // multi-byte UTF-8
  private val word: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("héllo"),
      Gen.const("日本"), Gen.const("a"))
  private val text: Gen[String] = Gen.listOf(word).map(_.mkString(" "))

  property("WordShingleHashes == split/sliding/distinct + XXH64 reference") =
    forAll(text) { t =>
      val ws = t.split(" ", -1).toSeq
      val shingles =
        if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
        else Seq(t)
      val expect = shingles.map(s => XXH64.hashUTF8String(UTF8String.fromString(s), 42L))
      val got = WordShingleHashes.compute(UTF8String.fromString(t), 3, 42L)
        .toLongArray().toSeq
      got == expect
    }

  property("WordSegments == split/grouped/mkString reference") =
    forAll(text, Gen.chooseNum(1, 5)) { (t, k) =>
      val expect = t.split(" ", -1).toSeq.grouped(k).map(_.mkString(" ")).toSeq
      val got = WordSegments.compute(UTF8String.fromString(t), k)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).toSeq
        .map(_.toString)
      got == expect
    }

  property("MinHashSignature == min over XXH64.hashLong(h, hashInt(i, 42)) reference") =
    forAll(Gen.listOf(Gen.long), Gen.chooseNum(1, 16)) { (hs, k) =>
      val got = MinHashSignature(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          hs, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
        k).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      val expect = (0 until k).map { i =>
        val seed = XXH64.hashInt(i, 42L)
        if (hs.isEmpty) Long.MaxValue
        else hs.map(h => XXH64.hashLong(h, seed)).min
      }
      got == expect
    }

  property("SimHash64 == split/hash/vote reference (empty segments vote too)") =
    forAll(text) { t =>
      val votes = new Array[Int](64)
      t.split(" ", -1).foreach { w =>
        val h = XXH64.hashUTF8String(UTF8String.fromString(w), 42L)
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        }
      }
      val expect = (0 until 64).foldLeft(0L) { (fp, b) =>
        if (votes(b) > 0) fp | (1L << b) else fp
      }
      SimHash64.compute(UTF8String.fromString(t)) == expect
    }

  property("Md5SimHash60 == split/md5-hex-prefix/vote reference") =
    forAll(text) { t =>
      val votes = new Array[Int](60)
      t.split(" ", -1).foreach { w =>
        // independent formulation: hex STRING prefix parsed base-16 (the
        // production path shifts the digest's first 8 bytes instead)
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        (0 until 60).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        }
      }
      val expect = (0 until 60).foldLeft(0L) { (fp, b) =>
        if (votes(b) > 0) fp | (1L << b) else fp
      }
      Md5SimHash60.compute(UTF8String.fromString(t)) == expect
    }

  private val vec: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f)).map(_.toSeq)

  property("MultiPlaneCode == per-plane double dot products, MSB-first packing") =
    forAll(vec, Gen.listOfN(8, vec)) { (v, planes) =>
      val codes = MultiPlaneCode(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        planes, planesPerTable = 4)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      val expect = planes.grouped(4).map { tbl =>
        tbl.foldLeft(0) { (code, p) =>
          val dot = v.zip(p).map { case (a, b) => a.toDouble * b.toDouble }.sum
          (code << 1) | (if (dot > 0) 1 else 0)
        }
      }.toSeq
      codes == expect
    }

  property("SortedIntersectCount == toSet.intersect reference on sorted distinct arrays") =
    forAll(Gen.listOf(Gen.chooseNum(-50L, 50L)), Gen.listOf(Gen.chooseNum(-50L, 50L))) {
      (a0, b0) =>
        val a = a0.distinct.sorted
        val b = b0.distinct.sorted
        val got = SortedIntersectCount(
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            a, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            b, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
          .eval(null).asInstanceOf[Long]
        got == a.toSet.intersect(b.toSet).size.toLong
    }

  property("KarpRabinFingerprint == codepoint fold (acc*31+cp mod 1e9+7) reference") =
    forAll(text) { t =>
      // the reference is the interpreted-HOF recurrence it replaced:
      // aggregate(transform(split(text,''), c -> ascii(c)), 0, fold) —
      // split('') yields one element per codepoint, ascii() its value
      val expect = t.codePoints().toArray.foldLeft(0L) { (acc, cp) =>
        (acc * 31L + cp) % 1000000007L
      }
      KarpRabinFingerprint.compute(UTF8String.fromString(t)) == expect
    }

  property("WordStats == split/distinct/codepoint-length/contains reference") =
    forAll(text, Gen.someOf("the", "a", "héllo", "日本", "").map(_.toSeq)) { (t, stops) =>
      val ws = t.split(" ", -1).toSeq
      val got = WordStats.compute(UTF8String.fromString(t),
        stops.map(UTF8String.fromString).toArray)
      got.getLong(0) == ws.length.toLong &&
        got.getLong(1) == ws.distinct.length.toLong &&
        got.getLong(2) == ws.map(w => w.codePointCount(0, w.length).toLong).sum &&
        got.getLong(3) == ws.count(stops.contains).toLong
    }

  property("WordWindows == split/strided-slice/mkString reference") =
    forAll(text, Gen.chooseNum(1, 6), Gen.chooseNum(1, 6)) { (t, k0, s0) =>
      val k = math.max(k0, s0); val st = math.min(k0, s0) // stride <= k
      val ws = t.split(" ", -1).toSeq
      val n = ws.length
      val nWin = if (n <= k) 1 else (n - k + st - 1) / st + 1
      val expect = (0 until nWin).map(j => ws.slice(j * st, j * st + k).mkString(" "))
      val got = WordWindows.compute(UTF8String.fromString(t), k, st)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).toSeq
        .map(_.toString)
      got == expect
    }

  property("PqCodes == per-subspace argmin-L2 reference (ties -> smaller cid)") =
    forAll(Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f))) { v0 =>
      val v = v0.toIndexedSeq
      // 4 subspaces x 3 centroids x 4 dims, deterministic codebook
      val cb: Seq[Seq[Seq[Float]]] = (0 until 4).map(s =>
        (0 until 3).map(c => (0 until 4).map(d => ((s + c + d) % 5 - 2).toFloat / 2)))
      val got = PqCodes(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        cb).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      val expect = (0 until 4).map { s =>
        val x = v.slice(s * 4, s * 4 + 4)
        cb(s).zipWithIndex.map { case (c, cid) =>
          (x.zip(c).map { case (a, b) => val d = a.toDouble - b.toDouble; d * d }.sum, cid)
        }.min._2 // (dist, cid) natural order = dist ASC then cid ASC
      }
      got == expect
    }

  property("MarkerHits == per-profile split/count reference, one pass") =
    forAll(text) { t =>
      val profiles = Seq(Seq("the", "a"), Seq("héllo", "日本"), Seq("a", ""))
      val ws = t.split(" ", -1).toSeq
      val expect = profiles.map(p => ws.count(p.contains).toLong)
      val got = MarkerHits(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          t, org.apache.spark.sql.types.StringType),
        profiles).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      got == expect
    }

  property("LinearTextScore == per-word KarpRabin/bucket/Knuth-weight reference") =
    forAll(text) { t =>
      val expect = t.split(" ", -1).toSeq.filter(_.nonEmpty).map { w =>
        val h = w.codePoints().toArray.foldLeft(0L)((a, cp) => (a * 31L + cp) % 1000000007L)
        (h % 256L) * 2654435761L % 2001L - 1000L
      }.sum
      LinearTextScore.compute(UTF8String.fromString(t)) == expect
    }
}
