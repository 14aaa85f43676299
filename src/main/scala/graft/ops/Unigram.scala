package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer induction (the SentencePiece unigram
  * model, Kudo 2018) — the OTHER standard tokenizer-training algorithm a
  * training-data pipeline meets, beside BPE ([[Bpe]]). No counterpart in
  * the reference (it consumes a served LLM's tokenizer); declared under
  * the training-data-pipeline surface like q121/q125.
  *
  * Same scalable formulation as BPE: ONE corpus pass builds the
  * (word, count) table; everything after touches only that bounded
  * table. Seeding counts every substring up to [[MaxPieceLen]] weighted
  * by word frequency (one flatMap + reduce over the word table) and
  * keeps the top `seedSize` by a total order, plus every single
  * character (losslessness floor). Each EM round is hard
  * (Viterbi-style): segment every word into the maximum-likelihood
  * piece sequence under the current counts, re-count pieces along the
  * winning segmentations, drop pieces no segmentation used; the final
  * round's counts rank the vocabulary and the top `vocabSize` (plus the
  * character floor) survive. Hard EM instead of forward-backward is a
  * deliberate determinism trade: expected counts are sums of FLOATS in
  * data-dependent order, hard counts are exact integers.
  *
  * The Viterbi comparison itself is EXACT INTEGER arithmetic, not log
  * probabilities: a segmentation's likelihood is ∏ cᵢ / C^k, and two
  * candidate prefixes (P₁, k₁), (P₂, k₂) compare as
  * P₁·C^k₂ vs P₂·C^k₁ — BigInt products over bounded word lengths, so
  * the induction is bit-reproducible at ANY partitioning and on any
  * platform (no Math.log in the loop; the same determinism grade as
  * BPE's integer argmax). Ties break toward fewer pieces, then toward
  * the longer last piece — a total order.
  *
  * Hybrid venue like [[Bpe.learnMerges]]: the corpus pass is always
  * distributed; the EM rounds run driver-local below `driverWordBound`
  * (identical kernels) and distributed above it — per round one
  * flatMap+reduce over the word table with the piece-count map
  * broadcast (model-sized: the vocabulary, never the corpus). Driver
  * state is the piece-count table — model-sized, the k-means/BPE-argmax
  * precedent. */
object Unigram {

  val MaxPieceLen = 8

  final case class Piece(rank: Long, piece: String, count: Long)

  /** Code-point-safe single characters of a word (surrogate pairs stay
    * whole — the same discipline as [[Bpe.toSymbols]], no end marker). */
  private[ops] def charsOf(word: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  /** Substring start offsets aligned to code points (a piece must never
    * split a surrogate pair). */
  private def cpOffsets(word: String): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < word.length) {
      out += i
      i += Character.charCount(word.codePointAt(i))
    }
    out += word.length
    out.toArray
  }

  /** Maximum-likelihood segmentation of `word` under piece `counts`
    * with corpus total `total` — the exact-integer Viterbi above.
    * Characters absent from `counts` (possible only when encoding text
    * the vocabulary never saw) fall back to count 1, the lowest
    * likelihood, keeping the segmentation total and deterministic. */
  def segmentWord(word: String, counts: scala.collection.Map[String, Long],
                  total: BigInt): Array[String] = {
    val off = cpOffsets(word)
    val n = off.length - 1 // positions in code points
    if (n == 0) return Array.empty
    // C^0..C^n once per word (n is small; products stay bounded)
    val pow = new Array[BigInt](n + 1)
    pow(0) = BigInt(1)
    var p = 1
    while (p <= n) { pow(p) = pow(p - 1) * total; p += 1 }
    val prod = new Array[BigInt](n + 1)
    val k = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    prod(0) = BigInt(1); k(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (prod(j) != null) {
          val piece = word.substring(off(j), off(i))
          val c = counts.getOrElse(piece,
            if (i - j == 1) 1L else 0L) // single-char OOV floor
          if (c > 0L) {
            val candProd = prod(j) * c
            val candK = k(j) + 1
            val better =
              if (prod(i) == null) true
              else {
                val cmp = (candProd * pow(k(i))) compare (prod(i) * pow(candK))
                cmp > 0 || (cmp == 0 && candK < k(i))
                // full tie at equal k keeps the SMALLER j already set
                // (j ascends and replacement requires strict gain):
                // the longer last piece wins — a total order
              }
            if (better) { prod(i) = candProd; k(i) = candK; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    // single-char floor guarantees reachability
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var at = n
    while (at > 0) { out += word.substring(off(back(at)), off(at)); at = back(at) }
    out.reverse.toArray
  }

  /** Learn a unigram vocabulary of (at most) `vocabSize` pieces plus the
    * single-character floor. Deterministic at any partitioning (exact
    * integer counts, total-order ranking). */
  def learnVocab(docs: DataFrame, textCol: String, vocabSize: Int,
                 seedSize: Int = 4000, rounds: Int = 4,
                 driverWordBound: Long = 200000L): Seq[Piece] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words: Dataset[(String, Long)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .as[(String, Long)]
      .persist()
    val nWords = words.count()
    val result =
      if (nWords <= driverWordBound)
        learnLocal(words.collect(), vocabSize, seedSize, rounds)
      else
        learnDistributed(words, vocabSize, seedSize, rounds)
    words.unpersist()
    result
  }

  /** Seed counts from one word table pass: every code-point substring up
    * to [[MaxPieceLen]], occurrence-weighted by word frequency. */
  private def seedPairs(word: String, wc: Long): Iterator[(String, Long)] = {
    val off = cpOffsets(word)
    val n = off.length - 1
    (0 until n).iterator.flatMap { j =>
      ((j + 1) to math.min(n, j + MaxPieceLen)).iterator
        .map(i => (word.substring(off(j), off(i)), wc))
    }
  }

  /** (piece → count) after seeding: top `seedSize` by (count desc,
    * piece asc) UNION the single-character floor. */
  private def seedSelect(counts: Iterable[(String, Long)], seedSize: Int,
                         chars: Set[String]): Map[String, Long] = {
    val all = counts.toSeq
    val top = all.sortBy { case (s, c) => (-c, s) }.take(seedSize)
    (top ++ all.filter { case (s, _) => chars.contains(s) }).toMap
  }

  /** One hard-EM round on the driver: returns the new counts (pieces
    * used by at least one winning segmentation, plus the char floor). */
  private def emRoundLocal(words: Array[(String, Long)],
                           counts: Map[String, Long],
                           chars: Set[String]): Map[String, Long] = {
    val total = BigInt(counts.valuesIterator.sum)
    val next = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, wc) =>
      segmentWord(w, counts, total).foreach { p =>
        next.update(p, next.getOrElse(p, 0L) + wc)
      }
    }
    withCharFloor(next.toMap, chars)
  }

  /** Characters must stay encodable: an unused char survives with the
    * floor count 1 (the SentencePiece keep-chars rule, integerized). */
  private def withCharFloor(counts: Map[String, Long],
                            chars: Set[String]): Map[String, Long] =
    counts ++ chars.filterNot(counts.contains).map(_ -> 1L)

  private def finalRank(counts: Map[String, Long], vocabSize: Int,
                        chars: Set[String]): Seq[Piece] = {
    val ranked = counts.toSeq.sortBy { case (s, c) => (-c, s) }
    val kept = (ranked.take(vocabSize) ++
      ranked.drop(vocabSize).filter { case (s, _) => chars.contains(s) })
    kept.sortBy { case (s, c) => (-c, s) }.zipWithIndex
      .map { case ((s, c), i) => Piece(i + 1L, s, c) }
  }

  private def learnLocal(words: Array[(String, Long)], vocabSize: Int,
                         seedSize: Int, rounds: Int): Seq[Piece] = {
    val chars = words.iterator.flatMap(w => charsOf(w._1)).toSet
    val seeds = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, wc) =>
      seedPairs(w, wc).foreach { case (s, c) =>
        seeds.update(s, seeds.getOrElse(s, 0L) + c)
      }
    }
    var counts = seedSelect(seeds, seedSize, chars)
    for (_ <- 1 to rounds) counts = emRoundLocal(words, counts, chars)
    finalRank(counts, vocabSize, chars)
  }

  /** The distributed rounds: same kernels, the piece-count map broadcast
    * per round, one flatMap+reduce over the word table. The reduced
    * piece table collects to the driver — model-sized (≤ seed size),
    * the documented bounded materialization. */
  private def learnDistributed(words: Dataset[(String, Long)],
                               vocabSize: Int, seedSize: Int,
                               rounds: Int): Seq[Piece] = {
    val spark = words.sparkSession
    val chars = words.rdd
      .flatMap { case (w, _) => charsOf(w) }.distinct().collect().toSet
    val seeds = words.rdd
      .flatMap { case (w, wc) => seedPairs(w, wc) }
      .reduceByKey(_ + _).collect()
    var counts = seedSelect(seeds, seedSize, chars)
    for (_ <- 1 to rounds) {
      val bc = spark.sparkContext.broadcast(counts)
      val total = BigInt(counts.valuesIterator.sum)
      val next = words.rdd.flatMap { case (w, wc) =>
        segmentWord(w, bc.value, total).iterator.map(_ -> wc)
      }.reduceByKey(_ + _).collect().toMap
      bc.destroy()
      counts = withCharFloor(next, chars)
    }
    finalRank(counts, vocabSize, chars)
  }

  /** Declared-query form: the ranked vocabulary as a DataFrame. */
  def vocab(docs: DataFrame, textCol: String, vocabSize: Int,
            seedSize: Int = 4000, rounds: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnVocab(docs, textCol, vocabSize, seedSize, rounds).toDF()
      .select(col("rank"), col("piece"), col("count"))
  }
}
