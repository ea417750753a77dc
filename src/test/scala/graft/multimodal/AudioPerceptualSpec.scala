package graft.multimodal

import graft.SparkSpec
import javax.sound.sampled._

/** The audio member of the perceptual near-dup triple: the PCM envelope
  * hash must collapse what exact content identity (pcm_crc) cannot —
  * the same clip re-containered, re-mastered at a different level, or
  * resampled — while keeping different material far away in Hamming
  * space, and the banded near-dup join must find exactly the planted
  * variant group.
  */
class AudioPerceptualSpec extends SparkSpec {
  import spark.implicits._

  /** Amplitude-modulated deterministic PCM: 64 equal time blocks, block w
    * loud (amp) or quiet (amp/20) per `loudAt`; carrier sin(0.3·frame).
    */
  private def envWav(frames: Int, rate: Float, amp: Double,
      loudAt: Int => Boolean): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val w = (i.toLong * 64 / frames).toInt
      val a = if (loudAt(w)) amp else amp / 20.0
      val v = (math.sin(i * 0.3) * a).toInt.toShort
      data(i * 2) = (v & 0xff).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Same PCM re-written into an AU container. */
  private def reContainerAu(wav: Array[Byte]): Array[Byte] = {
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.AU, bos)
    bos.toByteArray
  }

  /** Every other frame at half the rate — a 2:1 resample that preserves
    * the time envelope exactly.
    */
  private def decimate2(frames: Int, rate: Float, amp: Double,
      loudAt: Int => Boolean): Array[Byte] = {
    val fmt = new AudioFormat(rate / 2, 16, 1, true, false)
    val half = frames / 2
    val data = new Array[Byte](half * 2)
    var j = 0
    while (j < half) {
      val i = j * 2
      val w = (i.toLong * 64 / frames).toInt
      val a = if (loudAt(w)) amp else amp / 20.0
      val v = (math.sin(i * 0.3) * a).toInt.toShort
      data(j * 2) = (v & 0xff).toByte
      data(j * 2 + 1) = ((v >> 8) & 0xff).toByte
      j += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, half.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val patternA: Int => Boolean = w => ((w >> 1) & 1) == 0
  private val patternB: Int => Boolean = w => (((w + 2) >> 1) & 1) == 0

  test("envelope hash: container/volume/rate invariant; different material far; join finds the variant set") {
    val base = envWav(6400, 8000f, 2000.0, patternA)
    val au = reContainerAu(base)
    val quiet = envWav(6400, 8000f, 600.0, patternA) // re-mastered -10 dB
    val resam = decimate2(6400, 8000f, 2000.0, patternA)
    val other = envWav(6400, 8000f, 2000.0, patternB)

    val media = Seq(
      (0L, "audio", base), (1L, "audio", au), (2L, "audio", quiet),
      (3L, "audio", resam), (4L, "audio", other),
      (5L, "audio", "junk not audio".getBytes("UTF-8")), // skipped (R2)
      (6L, "audio", envWav(32, 8000f, 2000.0, patternA)) // < 64 frames: skipped
    ).toDF("media_id", "kind", "bytes")

    val hs = Multimodal.perceptualHashAudioBatched(media)
      .collect().map(h => h.media_id -> h.ehash).toMap
    assert(hs.keySet == Set(0L, 1L, 2L, 3L, 4L),
      s"junk + too-short must skip, got ${hs.keySet}")

    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(0L), hs(1L)) == 0, "re-containered PCM must hash identically")
    assert(hamming(hs(0L), hs(2L)) <= 2,
      s"volume change must stay tiny, got ${hamming(hs(0L), hs(2L))}")
    assert(hamming(hs(0L), hs(3L)) <= 7,
      s"2:1 resample must stay within radius, got ${hamming(hs(0L), hs(3L))}")
    assert(hamming(hs(0L), hs(4L)) > 7,
      s"different material must exceed the radius, got ${hamming(hs(0L), hs(4L))}")

    // the banded join finds exactly the planted variant group (0,1,2,3)
    val pairs = Multimodal.audioNearDupPerceptual(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- Seq(0L, 1L, 2L, 3L); b <- Seq(0L, 1L, 2L, 3L) if a < b
    } yield (a, b)).toSet
    assert(pairs == expected, s"got $pairs")
  }
}
