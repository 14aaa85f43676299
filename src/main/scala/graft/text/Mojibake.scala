package graft.text

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

/** Mojibake (encoding-corruption) detection and repair — the ftfy-style
  * "fix text for me" pass every web-scale ingestion pipeline runs before
  * any other text operator, here reduced to its dominant real-world case:
  * UTF-8 bytes that were decoded as Latin-1 somewhere upstream (possibly
  * more than once), turning every accented character into the familiar
  * "Ã©"-style two-character garbage. No counterpart in the reference
  * (its corpora arrive pre-cleaned); public algorithm — the latin-1
  * round-trip inversion ftfy's `fix_encoding` documents.
  *
  * The repair is PRINCIPLED, not pattern-matching: one corruption round
  * is `utf8Bytes(s) decoded as latin-1`, which is total and lossless
  * (Latin-1 maps every byte), so the inverse — re-encode as Latin-1,
  * strictly re-decode as UTF-8 — either succeeds exactly or the strict
  * decode fails and the text is left alone. Iterating until the strict
  * decode fails unwinds any number of stacked corruption rounds and is
  * the identity on healthy text:
  *
  *   - pure ASCII: corruption is the identity, repair is a no-op
  *     (guarded explicitly — no decode attempted);
  *   - healthy single-encoded text ("tablé"): its Latin-1 bytes (0xE9)
  *     are not valid UTF-8, the strict decode throws, no change;
  *   - k-times corrupted text: each round strictly decodes, k rounds
  *     unwind, the (k+1)-th attempt fails and iteration stops.
  *
  * The only texts a round can touch are those whose chars all fit in
  * Latin-1 AND whose Latin-1 bytes form valid non-ASCII UTF-8 — i.e.
  * texts that syntactically ARE mojibake. (A human could in principle
  * type "Ã©" deliberately; at corpus scale that false-positive rate is
  * the documented, vanishingly small trade every encoding fixer makes.)
  *
  * Kernels are pure (String ⇒ result) and partition-local — the Spark
  * side is a zero-shuffle projection at any corpus size.
  */
object Mojibake {

  /** One corruption round: the UTF-8 bytes of `s` read back as Latin-1.
    * Total (every byte maps) and injective on valid input — the standard
    * double-encoding accident this module exists to undo. Test/fixture
    * helper; production data arrives already corrupted. */
  def corrupt(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1)

  /** `corrupt` iterated `rounds` times (0 ⇒ identity). */
  def corruptN(s: String, rounds: Int): String = {
    var cur = s
    var i = 0
    while (i < rounds) { cur = corrupt(cur); i += 1 }
    cur
  }

  /** Undo ONE corruption round, or return null when `s` is not
    * syntactically mojibake (chars outside Latin-1, pure ASCII, or
    * Latin-1 bytes that are not strictly valid UTF-8). */
  private def undoOnce(s: String): String = {
    var hasNonAscii = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF) return null // not Latin-1-encodable: healthy Unicode text
      if (c >= 0x80) hasNonAscii = true
      i += 1
    }
    if (!hasNonAscii) return null // pure ASCII: corruption would be the identity
    val bytes = s.getBytes(StandardCharsets.ISO_8859_1)
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try dec.decode(ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => null }
  }

  /** Repair stacked encoding corruption: iterate [[undoOnce]] until the
    * strict decode refuses (or `maxRounds` as a safety bound — real
    * corpora never stack deeper than 2-3). Returns (repairedText,
    * roundsUnwound); roundsUnwound == 0 ⇔ the text was healthy. */
  def repair(s: String, maxRounds: Int = 4): (String, Int) = {
    var cur = s
    var rounds = 0
    var continue = true
    while (continue && rounds < maxRounds) {
      val undone = undoOnce(cur)
      if (undone == null || undone == cur) continue = false
      else { cur = undone; rounds += 1 }
    }
    (cur, rounds)
  }
}
