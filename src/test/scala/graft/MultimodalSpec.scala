package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.multimodal.Multimodal

/** The multimodal codec is REAL (JDK ImageIO): pin it against a golden
  * PNG written independently of Multimodal's own encoder, the
  * encode→decode round-trip, corrupt-byte degradation, and the batched
  * DataFrame plumbing. */
class MultimodalSpec extends SparkSuite {

  /** Golden image: 2×3, four distinct corner-ish pixels — written with
    * raw BufferedImage/ImageIO calls, NOT Multimodal.encodePng, so the
    * decoder is tested against an independent producer. */
  private def goldenPng(): Array[Byte] = {
    val img = new BufferedImage(2, 3, BufferedImage.TYPE_INT_RGB)
    // column-major fill: (x, y) -> rgb
    val px = Seq(
      (0, 0, 0xff0000), (1, 0, 0x00ff00),
      (0, 1, 0x0000ff), (1, 1, 0x102030),
      (0, 2, 0xffffff), (1, 2, 0x000000))
    px.foreach { case (x, y, rgb) => img.setRGB(x, y, rgb) }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeOne recovers dimensions and exact channel means from a golden PNG") {
    val Some((w, h, mr, mg, mb)) = Multimodal.decodeOne(goldenPng())
    assert((w, h) === (2, 3))
    // sums over the six pixels above, floor-divided by 6
    assert(mr === (0xff + 0x10 + 0xff) / 6)
    assert(mg === (0xff + 0x20 + 0xff) / 6)
    assert(mb === (0xff + 0x30 + 0xff) / 6)
  }

  test("encodePng -> decodeOne round-trips dims and solid fill exactly") {
    for ((w, h, r, g, b) <- Seq((1, 1, 0, 0, 0), (64, 48, 255, 255, 255), (7, 13, 17, 129, 254))) {
      val Some((dw, dh, mr, mg, mb)) = Multimodal.decodeOne(Multimodal.encodePng(w, h, r, g, b))
      assert((dw, dh, mr, mg, mb) === (w, h, r, g, b), s"round-trip $w x $h rgb($r,$g,$b)")
    }
  }

  test("corrupt and empty payloads degrade to None, never throw") {
    assert(Multimodal.decodeOne(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeOne("not a png".getBytes("UTF-8")).isEmpty)
    // valid header, truncated body
    assert(Multimodal.decodeOne(goldenPng().take(20)).isEmpty)
  }

  test("batched DataFrame encode -> decode validates per-row; corrupt row yields null features") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val meta = Seq((1L, 3, 2, 10, 20, 30), (2L, 1, 1, 255, 0, 128))
      .toDF("doc_id", "w", "h", "r", "g", "b")
    val decoded = Multimodal.decodeFeatures(Multimodal.encodePayloads(meta))
      .orderBy($"doc_id").collect()
    assert(decoded.map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).toSeq ===
      Seq((1L, 3, 2, 10, 20, 30), (2L, 1, 1, 255, 0, 128)))
    assert(decoded.forall(_.getLong(1) > 0), "png payloads must be non-empty")

    val corrupt = Seq((9L, "junk".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val row = Multimodal.decodeFeatures(corrupt).collect().head
    assert(row.getLong(1) === 4L && row.isNullAt(2) && row.isNullAt(4))
  }

  test("aHash is scale-invariant: same pattern at 8/16/24 px hashes identically, = its own bits") {
    val bits = java.lang.Long.parseUnsignedLong("a5c3f00f12345678", 16)
    val hashes = Seq(1, 2, 3).map { s =>
      Multimodal.ahashOne(Multimodal.encodePatternPng(8 * s, bits))
    }
    assert(hashes.forall(_.contains(bits)),
      s"expected ${bits.toHexString} at every scale, got ${hashes.map(_.map(_.toHexString))}")
  }

  test("aHash edge cases: all-dark pattern hashes to 0; corrupt payload yields None") {
    assert(Multimodal.ahashOne(Multimodal.encodePatternPng(8, 0L)).contains(0L))
    assert(Multimodal.ahashOne("not a png".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.ahashOne(Array.emptyByteArray).isEmpty)
    // 7x7 image: doesn't tile into 8x8 boxes -> None, not a wrong hash
    assert(Multimodal.ahashOne(Multimodal.encodePng(7, 7, 1, 2, 3)).isEmpty)
  }

  test("encodeWav emits a RIFF/WAVE container; decodeWavOne recovers exact square-wave features") {
    val wav = Multimodal.encodeWav(nSamples = 10, halfPeriod = 3, amplitude = 1000)
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    // samples: +++ --- +++ -  -> crossings at i=3,6,9 = (10-1) div 3
    val Some((n, sr, peak, sumAbs, zc)) = Multimodal.decodeWavOne(wav)
    assert((n, sr, peak, sumAbs, zc) === ((10L, 8000, 1000L, 10000L, 3L)))
  }

  test("decodeWavOne: corrupt, empty, and truncated payloads degrade to None, never throw") {
    assert(Multimodal.decodeWavOne("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeWavOne(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeWavOne(null).isEmpty)
    val wav = Multimodal.encodeWav(100, 5, 500)
    assert(Multimodal.decodeWavOne(wav.take(20)).isEmpty, "truncated header")
  }

  test("batched WAV encode -> decode validates per-row; corrupt row yields null features") {
    import spark.implicits._
    val meta = Seq((1L, 8, 2, 700), (2L, 5, 10, 8000))
      .toDF("doc_id", "n", "half_p", "amp")
    val rows = Multimodal.wavFeatures(Multimodal.encodeWavPayloads(meta))
      .orderBy($"doc_id").collect()
    // doc 1: 8 samples period 2 -> zc = 7 div 2 = 3; doc 2: zc = 4 div 10 = 0
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq ===
      Seq((1L, 8L, 8000, 700L, 5600L, 3L), (2L, 5L, 8000, 8000L, 40000L, 0L)))

    val corrupt = Seq((9L, "junk".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val row = Multimodal.wavFeatures(corrupt).collect().head
    assert(row.getLong(0) === 9L && row.isNullAt(1) && row.isNullAt(5))
  }

  test("vadOne: burst clip yields exact frame/activity/segment counts; gate is strict") {
    // 3 segments of 160 samples (2 frames each): tone, silence, tone
    val wav = Multimodal.encodeWavBursts(
      nSamples = 480, halfPeriod = 4, amplitude = 1000, segLen = 160)
    val Some((nf, na, ns)) = Multimodal.vadOne(wav, 80, 500L * 80)
    assert((nf, na, ns) === ((6L, 4L, 2L)))
    // amplitude exactly AT the mean threshold is NOT active (> gate)
    val quiet = Multimodal.encodeWavBursts(480, 4, 500, 160)
    val Some((_, na2, ns2)) = Multimodal.vadOne(quiet, 80, 500L * 80)
    assert((na2, ns2) === ((0L, 0L)))
    // adjacent tone segments merge into ONE segment when silence gap
    // is absent (segLen spanning the whole clip)
    val solid = Multimodal.encodeWavBursts(480, 4, 1000, 480)
    val Some((_, na3, ns3)) = Multimodal.vadOne(solid, 80, 500L * 80)
    assert((na3, ns3) === ((6L, 1L)))
  }

  test("vadOne: corrupt/truncated payloads degrade to None; trailing partial frame is dropped") {
    assert(Multimodal.vadOne("junk".getBytes("UTF-8"), 80, 40000L).isEmpty)
    assert(Multimodal.vadOne(Array.emptyByteArray, 80, 40000L).isEmpty)
    assert(Multimodal.vadOne(null, 80, 40000L).isEmpty)
    // 200 samples at frameLen 80 -> 2 complete frames, 40-sample tail ignored
    val wav = Multimodal.encodeWavBursts(200, 4, 1000, 200)
    val Some((nf, na, ns)) = Multimodal.vadOne(wav, 80, 500L * 80)
    assert((nf, na, ns) === ((2L, 2L, 1L)))
  }

  test("audioPeakHz: every tone class lands on its own fundamental") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val halfPeriods = Seq(4, 5, 8, 10, 20, 25, 40, 50)
    val cands = halfPeriods.map(4000 / _)
    val meta = halfPeriods.zipWithIndex
      .map { case (h, i) => (i.toLong, 400, h, 10000) }
      .toDF("doc_id", "n_samples", "half_period", "amplitude")
    val peaks = Multimodal.audioPeakHz(
      Multimodal.encodeWavPayloads(meta), cands, 400).collect()
    peaks.foreach { r =>
      val h = halfPeriods(r.getLong(0).toInt)
      assert(r.getLong(1) === 4000L / h,
        s"half-period $h must fingerprint as its fundamental ${4000 / h} Hz")
    }
    // the 200 Hz square's 5th harmonic lands on candidate 1000 Hz —
    // the fundamental must still win (harmonic power is 1/25)
    assert(peaks.find(_.getLong(0) === 4L).get.getLong(1) === 200L)
    // dead payload → null peak (DLQ pattern)
    val dead = Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Multimodal.audioPeakHz(dead, cands, 400).collect()(0).isNullAt(1))
  }
}
