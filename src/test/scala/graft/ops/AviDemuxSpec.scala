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
