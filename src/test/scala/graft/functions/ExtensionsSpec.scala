package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions exposes float_dot to plain SQL sessions") {
    // Suites share one JVM/SparkContext: swap the default session out so
    // getOrCreate builds a NEW session (extensions bind at build time),
    // and never stop() — that would kill the shared context.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
        .head.getDouble(0)
      assert(r == 4.0)
      // word_shingle_hashes is SQL-callable too, default n = 3
      val hs = spark.sql(
        "SELECT word_shingle_hashes('a b c d') AS hs, " +
          "word_shingle_hashes('a b c d', 2) AS hs2")
        .head
      assert(hs.getSeq[Long](0).length == 2)  // "a b c", "b c d"
      assert(hs.getSeq[Long](1).length == 3)  // "a b", "b c", "c d"
      // matches the engine-side xxhash64 of the shingle string
      val expect = spark.sql("SELECT xxhash64('a b c') AS h").head.getLong(0)
      assert(hs.getSeq[Long](0).head == expect)
      // simhash64: SQL-callable, equals the expression-path fingerprint
      val sh = spark.sql("SELECT simhash64('hello world again') AS f").head.getLong(0)
      assert(sh == SimHash64.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world again")))
      // md5_simhash60: SQL-callable, equals the expression-path fingerprint
      val msh = spark.sql("SELECT md5_simhash60('hello world again') AS f").head.getLong(0)
      assert(msh == Md5SimHash60.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world again")))
      // minhash_signature: k slots, equals min(xxhash64(i, h)) per slot
      val sig = spark.sql(
        "SELECT minhash_signature(word_shingle_hashes('a b c d e'), 4) AS s")
        .head.getSeq[Long](0)
      assert(sig.length == 4)
      val viaAgg = spark.sql(
        """SELECT array(min(xxhash64(0, h)), min(xxhash64(1, h)),
                        min(xxhash64(2, h)), min(xxhash64(3, h))) AS s
           FROM (SELECT explode(word_shingle_hashes('a b c d e')) AS h)""")
        .head.getSeq[Long](0)
      assert(sig == viaAgg)
      // shingle_rows: custom Generator via LATERAL VIEW == exploded array
      val gen = spark.sql(
        """SELECT sh FROM (SELECT 'a b c d' AS t) LATERAL VIEW shingle_rows(t) g AS sh""")
        .collect().map(_.getLong(0)).toSeq
      val viaArr = spark.sql(
        "SELECT explode(word_shingle_hashes('a b c d')) AS sh")
        .collect().map(_.getLong(0)).toSeq
      assert(gen == viaArr && gen.length == 2)
      // karp_rabin_fingerprint: SQL-callable, equals the HOF recurrence
      val kr = spark.sql("SELECT karp_rabin_fingerprint('hash me 123') AS f")
        .head.getLong(0)
      val krRef = spark.sql(
        """SELECT aggregate(transform(split('hash me 123', ''),
                            c -> CAST(ascii(c) AS BIGINT)),
                  0L, (acc, x) -> (acc * 31 + x) % 1000000007) AS f""")
        .head.getLong(0)
      assert(kr == krRef)
      // word_stats: struct fields match the interpreted formulation
      val wsRow = spark.sql(
        "SELECT word_stats('the big the cat', 'the,a') AS s").selectExpr(
        "s.n_tokens", "s.n_uniq", "s.sum_len", "s.stop_hits").head
      assert(wsRow.getLong(0) == 4 && wsRow.getLong(1) == 3 &&
        wsRow.getLong(2) == 12 && wsRow.getLong(3) == 2)
      // marker_hits: one slot per literal CSV profile, multiplicity counts
      val mh = spark.sql(
        "SELECT marker_hits('the a le the', 'the,a', 'le,les') AS h")
        .head.getSeq[Long](0)
      assert(mh == Seq(3L, 1L))
      // linear_text_score: SQL-callable, equals the per-word HOF reference
      val lts = spark.sql("SELECT linear_text_score('score these words') AS s")
        .head.getLong(0)
      val ltsRef = spark.sql(
        """SELECT aggregate(transform(
                    filter(split('score these words', ' '), w -> w != ''),
                    w -> (aggregate(transform(split(w, ''),
                            c -> CAST(ascii(c) AS BIGINT)),
                          0L, (acc, x) -> (acc * 31 + x) % 1000000007)
                          % 256) * 2654435761 % 2001 - 1000),
                  0L, (acc, x) -> acc + x) AS s""")
        .head.getLong(0)
      assert(lts == ltsRef)
      // bpe_tokens: SQL-callable, equals the library encoder
      val bpe = spark.sql("SELECT bpe_tokens('the data table!') AS t")
        .head.getSeq[String](0)
      assert(bpe == BpeMerges.encodeDoc("the data table!"),
        s"bpe_tokens drifted from BpeMerges.encodeDoc: $bpe")
      assert(bpe == Seq("the", "data", "table"))
      // 2-arg form binds the generated 4k-merge vocabulary
      val bpeBig = spark.sql("SELECT bpe_tokens('the data table!', 'gen4096') AS t")
        .head.getSeq[String](0)
      assert(bpeBig == BpeMerges.big.encodeDoc("the data table!"),
        s"bpe_tokens(…, 'gen4096') drifted from BpeMerges.big: $bpeBig")
      intercept[Exception] {
        spark.sql("SELECT bpe_tokens('x', 'nope')").head
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}
