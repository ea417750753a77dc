package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.model.NewsArticle
import java.sql.Timestamp

/** ScalaCheck properties of the D1 state machine (SURVEY.md §5.2):
  * monotone watermark, emitted-id ordering, null-id bypass.
  */
object DedupPropertySpec extends Properties("HighWatermarkDedup") {

  private def art(id: Option[Long], t: Long): NewsArticle =
    NewsArticle("S", id, new Timestamp(0), Some(new Timestamp(t)),
      None, None, None, None, None, None)

  private val genBatch: Gen[Seq[NewsArticle]] = Gen.listOf(for {
    id <- Gen.option(Gen.chooseNum(0L, 50L))
    t <- Gen.chooseNum(0L, 1000L)
  } yield art(id, t))

  property("state never decreases and equals running max of emitted ids") =
    forAll(genBatch, Gen.chooseNum(-1L, 40L)) { (batch, seed) =>
      val (newMax, out) = HighWatermarkDedup.dedupBatch(seed, batch)
      val emittedIds = out.flatMap(_.news_id)
      newMax >= seed &&
        emittedIds.forall(_ > seed) &&
        (emittedIds.isEmpty || newMax == math.max(seed, emittedIds.max))
    }

  property("output preserves the O1 (published_ts, id) sort order") =
    forAll(genBatch) { batch =>
      val (_, out) = HighWatermarkDedup.dedupBatch(Long.MinValue, batch)
      val keys = out.map(a =>
        (a.published_ts.map(_.getTime).getOrElse(0L), a.news_id.getOrElse(0L)))
      keys == keys.sorted
    }

  property("null ids always pass through and never advance state") =
    forAll(genBatch) { batch =>
      val nullOnly = batch.map(a => a.copy(news_id = None))
      val (newMax, out) = HighWatermarkDedup.dedupBatch(7L, nullOnly)
      newMax == 7L && out.size == nullOnly.size
    }

  property("first batch drops ids <= 0 under the reference's initial state 0") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(-5L, 5L), Gen.chooseNum(0L, 100L)))) { pairs =>
      // ref producer_company_news.py:133: .get(symbol, 0) — an id <= 0 is
      // dropped even when the key has never been seen before
      val batch = pairs.map { case (id, t) => art(Some(id), t) }
      val (_, out) = HighWatermarkDedup.dedupBatch(
        HighWatermarkDedup.DefaultInitialWatermark, batch)
      out.flatMap(_.news_id).forall(_ > 0L)
    }

  property("idempotent: replaying the same batch emits nothing new") =
    forAll(genBatch) { batch =>
      val (max1, out1) = HighWatermarkDedup.dedupBatch(Long.MinValue, batch)
      val (max2, out2) = HighWatermarkDedup.dedupBatch(max1, batch)
      max2 == max1 && out2.flatMap(_.news_id).isEmpty
    }
}
