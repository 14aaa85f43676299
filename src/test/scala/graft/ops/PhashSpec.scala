package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.ops.Multimodal.{DecodedImage, MediaKernels}

/** [[Multimodal.phash64]] / [[Multimodal.phashPairs]] — perceptual image
  * near-dup (declared q168). Pins the properties the operator's claims
  * rest on: determinism (StrictMath fixed-point DCT), the DC-exclusion
  * brightness invariance, small-Hamming tolerance to light noise, large
  * Hamming for unrelated content, and — the blocking contract — that the
  * 8×8-bit banded join returns EXACTLY the brute-force pair set for
  * maxHamming ≤ 7 (pigeonhole: ≤7 flipped bits leave ≥1 band intact).
  */
class PhashSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Deterministic 32×32 test image: scene texture + optional uniform
    * brightness + optional per-pixel tweaks (the q168 recipe). */
  private def img(scene: Long, brightness: Int = 0,
                  tweaks: Seq[(Int, Int)] = Nil): DecodedImage = {
    val px = Array.tabulate[Byte](32 * 32 * 3) { i =>
      val pix = i / 3; val c = i % 3
      (((scene * 31 + pix.toLong * (3 + scene) + c * 13) % 200) + brightness).toByte
    }
    tweaks.foreach { case (pix, c) =>
      val p = pix * 3 + c
      px(p) = (((px(p) & 0xFF) + 55) % 200).toByte
    }
    DecodedImage(32, 32, 255, px)
  }

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("deterministic: same pixels hash identically; PPM round-trip too") {
    val a = img(7)
    assert(Multimodal.phash64(a) == Multimodal.phash64(img(7)))
    val viaPpm = Multimodal.phashPpm(MediaKernels.encodePpm(a))
    assert(viaPpm.contains(Multimodal.phash64(a)))
  }

  test("uniform brightness shift moves only the DCT DC term: hash identical") {
    for (scene <- 0L until 8L)
      assert(Multimodal.phash64(img(scene)) ==
        Multimodal.phash64(img(scene, brightness = 10)),
        s"scene $scene: brightness must not change the DC-excluded hash")
  }

  test("light pixel noise stays within a few Hamming bits; unrelated " +
    "scenes are far apart") {
    val near = (0L until 16L).map { scene =>
      ham(Multimodal.phash64(img(scene)),
        Multimodal.phash64(img(scene, tweaks = Seq((100, 0), (400, 1)))))
    }
    assert(near.max <= 12, s"noise Hamming too high: $near")
    val far = for (a <- 0L until 8L; b <- (a + 1) until 8L)
      yield ham(Multimodal.phash64(img(a)), Multimodal.phash64(img(b)))
    assert(far.min >= 13, s"distinct scenes too close: ${far.sorted.take(5)}")
  }

  test("banded join is lossless for maxHamming <= 7: pairs equal brute force") {
    import spark.implicits._
    // 6 scenes x 4 variants = 24 images: within-scene pairs are near,
    // cross-scene pairs far (asserted above), so the expected set is
    // nontrivial in both directions
    val rows = (0L until 24L).map { id =>
      val scene = id % 6
      val v = id / 6
      val tweaks = (0 until (v % 3).toInt).map(i =>
        (((scene * 17 + v * 29 + i * 53) % 1024).toInt, ((v + i) % 3).toInt))
      val im = img(scene, brightness = if (v % 2 == 1) 10 else 0, tweaks = tweaks)
      (id, MediaKernels.encodePpm(im), Multimodal.phash64(im))
    }
    val brute = (for {
      (i1, _, h1) <- rows; (i2, _, h2) <- rows
      if i1 < i2 && ham(h1, h2) <= 6
    } yield (i1, i2, ham(h1, h2))).toSet
    assert(brute.nonEmpty, "test corpus must produce near-dup pairs")
    val media = rows.map(r => (r._1, r._2)).toDF("media_id", "ppm")
    val got = Multimodal.phashPairs(media, "media_id", "ppm", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"banded != brute: missing ${brute -- got}, extra ${got -- brute}")
    // repartitioned input produces the same set (pure function + set join)
    val got4 = Multimodal.phashPairs(media.repartition(4), "media_id", "ppm", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got4 == brute)
  }

  test("maxHamming above the pigeonhole bound is rejected") {
    import spark.implicits._
    val media = Seq((1L, MediaKernels.encodePpm(img(0)))).toDF("media_id", "ppm")
    intercept[IllegalArgumentException] {
      Multimodal.phashPairs(media, "media_id", "ppm", maxHamming = 8)
    }
  }
}
