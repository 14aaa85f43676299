package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal.MediaKernels

/** Container-level contract of the real RIFF/AVI mux/demux pair
  * (q111's kernel): byte-exact frame round-trip including the odd-size
  * pad rule, header metadata recovery, and corrupt-input rejection. */
class AviDemuxSpec extends AnyFunSuite {

  private def mkFrames(sizes: Int*): Array[Array[Byte]] =
    sizes.map(n => Array.tabulate[Byte](n)(j => (j * 5 + 1).toByte)).toArray

  test("mux/demux round-trips frames byte-exactly (even and ODD sizes)") {
    // odd frame sizes exercise the RIFF word-alignment pad: a demuxer
    // that forgets the pad byte desyncs on every chunk after the first
    val frames = mkFrames(10, 7, 64, 1, 33)
    val avi = MediaKernels.muxAvi(32, 24, 40000, frames)
    val v = MediaKernels.demuxAvi(avi).get
    assert(v.width == 32 && v.height == 24 && v.usPerFrame == 40000)
    assert(v.frames.length == frames.length)
    frames.zip(v.frames).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("single-frame and empty-frame-list containers") {
    val one = MediaKernels.demuxAvi(MediaKernels.muxAvi(16, 8, 33333, mkFrames(5))).get
    assert(one.frames.length == 1 && one.frames(0).length == 5)
    val none = MediaKernels.demuxAvi(MediaKernels.muxAvi(16, 8, 33333, Array.empty)).get
    assert(none.frames.isEmpty && none.width == 16)
  }

  test("Motion-PNG pipeline: ImageIO frames in AVI decode back pixel-exact, in order") {
    // the q115 composition: encode rasters -> mux -> demux -> decode. PNG
    // is lossless, so every decoded frame must equal its source raster
    // and arrive in mux order (frame identity is encoded in the pixels).
    val w = 7; val h = 5
    val rasters = Array.tabulate(4) { k =>
      Array.tabulate[Byte](w * h * 3)(i => ((k * 13 + i * 11) % 256).toByte)
    }
    val frames = rasters.map(px =>
      MediaKernels.encodeImage(Multimodal.DecodedImage(w, h, 255, px), "png"))
    val v = MediaKernels.demuxAvi(MediaKernels.muxAvi(w, h, 40000, frames)).get
    assert(v.frames.length == 4)
    v.frames.zip(rasters).foreach { case (payload, src) =>
      val img = MediaKernels.decodeImage(payload).get
      assert(img.width == w && img.height == h)
      assert(img.pixels.sameElements(src))
    }
  }

  test("Motion-JPEG pipeline: solid-color JPEG frames in AVI decode within DC error") {
    // true MJPEG is lossy; solid frames are pure DC so a real decode must
    // keep per-frame mean absolute error within quantization range
    val w = 6; val h = 4
    val solids = Array.tabulate(3) { k =>
      Array.tabulate[Byte](w * h * 3)(i => ((i % 3) * 40 + k * 29 + 30).toByte)
    }
    val frames = solids.map(px =>
      MediaKernels.encodeImage(Multimodal.DecodedImage(w, h, 255, px), "jpg"))
    val v = MediaKernels.demuxAvi(MediaKernels.muxAvi(w, h, 40000, frames)).get
    assert(v.frames.length == 3)
    v.frames.zip(solids).foreach { case (payload, src) =>
      val img = MediaKernels.decodeImage(payload).get
      assert(img.width == w && img.height == h)
      val mae = img.pixels.indices.map(i =>
        math.abs((img.pixels(i) & 0xFF) - (src(i) & 0xFF)).toLong).sum / img.pixels.length
      assert(mae <= 8, s"JPEG frame MAE $mae exceeds DC quantization bound")
    }
  }

  test("corrupt inputs reject as None, never throw") {
    assert(MediaKernels.demuxAvi(null).isEmpty)
    assert(MediaKernels.demuxAvi(Array.empty[Byte]).isEmpty)
    assert(MediaKernels.demuxAvi("RIFFxxxxWAVE".getBytes).isEmpty) // wrong subtype
    val good = MediaKernels.muxAvi(16, 8, 33333, mkFrames(9, 9))
    assert(MediaKernels.demuxAvi(java.util.Arrays.copyOf(good, 40)).isEmpty,
      "truncated mid-header must reject")
    // chunk size pointing past the buffer must reject, not overread
    val evil = good.clone()
    evil(16) = 0x7F.toByte; evil(17) = 0x7F.toByte // inflate hdrl LIST size
    assert(MediaKernels.demuxAvi(evil).isEmpty)
  }
}
