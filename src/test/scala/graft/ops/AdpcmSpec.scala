package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal.MediaKernels

/** IMA ADPCM codec contract (q112's kernel): decoder state-machine
  * edges, encoder→decoder reconstruction quality, and clamp behavior.
  * Decode bit-exactness vs an independent implementation is already
  * pinned by q112's DuckDB recursive-CTE oracle; these specs cover the
  * paths a declared query doesn't reach. */
class AdpcmSpec extends AnyFunSuite {

  test("decoder: known 2-nibble hand trace") {
    // idx=0 -> step 7. n=3: diff = 7>>3 + 7>>1 + 7>>2 = 0+3+1 = 4; pred=4;
    // idx += indexTable(3) = -1 -> clamped 0. n=8: diff = 0+... = 0 -> sign
    // bit subtracts 0>>3=0 -> step 7>>3=0 -> pred stays 4.
    val out = MediaKernels.decodeImaAdpcm(Array[Byte](3, 8), 0, 0)
    assert(out.toSeq == Seq[Short](4, 4))
  }

  test("decoder: predictor clamps at int16 extremes instead of wrapping") {
    // saturate upward with max-magnitude positive nibbles from the top of
    // the step table, then confirm the value pins at 32767
    val up = MediaKernels.decodeImaAdpcm(Array.fill[Byte](32)(7), 0, 88)
    assert(up.last == 32767.toShort)
    val down = MediaKernels.decodeImaAdpcm(Array.fill[Byte](32)(15), 0, 88)
    assert(down.last == -32768.toShort)
  }

  test("encoder/decoder: sine reconstruction error bounded (codec is genuinely lossy-but-close)") {
    val n = 2048
    val pcm = Array.tabulate[Short](n)(i =>
      (8000 * math.sin(2 * math.Pi * i / 64)).toShort)
    val nibbles = MediaKernels.encodeImaAdpcm(pcm, 0, 0)
    val back = MediaKernels.decodeImaAdpcm(nibbles, 0, 0)
    assert(back.length == n)
    // after the adaptation ramp the reconstruction should track closely:
    // bound mean absolute error over the steady-state tail
    val tail = (256 until n)
    val mae = tail.map(i => math.abs(back(i) - pcm(i)).toDouble).sum / tail.size
    assert(mae < 500.0, f"steady-state MAE $mae%.1f too high for a 16k-amplitude sine")
    // and it must NOT be byte-exact (if it were, the test is vacuous)
    assert(tail.exists(i => back(i) != pcm(i)))
  }

  test("empty/null input decodes to empty, never throws") {
    assert(MediaKernels.decodeImaAdpcm(Array.empty[Byte]).isEmpty)
    assert(MediaKernels.decodeImaAdpcm(null).isEmpty)
    assert(MediaKernels.encodeImaAdpcm(null).isEmpty)
  }
}
