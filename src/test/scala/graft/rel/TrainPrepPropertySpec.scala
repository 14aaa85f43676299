package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Randomized semantics of the training-prep cores over adversarial
  * corpora the real tables cannot produce: empty texts, one-token docs,
  * skewed source/lang cells, cells smaller than the quota, shared
  * boilerplate shingles. Each property replays the declared arithmetic
  * in plain Scala from scratch. Seed-looped scalacheck (the scalatest
  * bridge artifact is not in the offline cache). */
object TrainPrepPropertySpec {
  /** Top-level so Spark can derive an encoder. */
  final case class Doc(doc_id: Long, source: String, lang: String, text: String)
}

class TrainPrepPropertySpec extends AnyFunSuite {
  import TrainPrepPropertySpec.Doc
  lazy val spark = SparkTestBase.spark

  // tiny token alphabet forces shared shingles; empty and 1-token texts
  // exercise the size(split) = 1 floor and the no-shingle branch
  private val textGen: Gen[String] = for {
    k <- Gen.frequency((1, Gen.const(0)), (2, Gen.choose(1, 2)), (5, Gen.choose(3, 14)))
    toks <- Gen.listOfN(k, Gen.oneOf("a", "b", "c", "d", "e"))
  } yield toks.mkString(" ")

  private val corpusGen: Gen[List[Doc]] = for {
    nDocs <- Gen.choose(1, 50)
    rows <- Gen.listOfN(nDocs, for {
      src <- Gen.oneOf("s0", "s1", "s2")
      lang <- Gen.oneOf("en", "zh")
      text <- textGen
    } yield (src, lang, text))
  } yield rows.zipWithIndex.map { case ((s, l, t), i) => Doc(i.toLong, s, l, t) }

  private def corpora(n: Int): Seq[List[Doc]] = {
    var seed = Seed(4242L)
    (1 to n).flatMap { _ =>
      val c = corpusGen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      c
    }
  }

  test("sequencePack: replay equality + per-source contiguity on random corpora") {
    import spark.implicits._
    val L = 7L // tiny L so docs span many sequences
    for (docs <- corpora(12)) {
      val got = TrainPrepQueries.sequencePack(docs.toDF(), L).collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
      docs.groupBy(_.source).foreach { case (src, ds) =>
        var cum = 0L
        val covered = scala.collection.mutable.Set.empty[Long]
        ds.sortBy(_.doc_id).foreach { d =>
          val n = d.text.split(" ", -1).length.toLong
          val e = (src, n, cum / L, cum % L, (cum + n - 1) / L - cum / L + 1)
          assert(got(d.doc_id) == e, s"doc ${d.doc_id}: ${got(d.doc_id)} != $e")
          (e._3 to (e._3 + e._5 - 1)).foreach(covered += _)
          cum += n + 1
        }
        // the packed stream leaves no empty sequence behind it
        val maxSeq = covered.max
        assert(covered == (0L to maxSeq).toSet,
          s"source $src: gap in covered sequences $covered")
      }
    }
  }

  test("quotaSample: per-cell keep = min(cap, size), kept = hash-priority prefix") {
    import spark.implicits._
    for (docs <- corpora(12)) {
      val cap = 1 + (docs.length % 4)
      val got = TrainPrepQueries.quotaSample(docs.toDF(), cap).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
      val byCell = docs.groupBy(d => (d.source, d.lang))
      byCell.foreach { case ((s, l), ds) =>
        val kept = got.filter(t => t._2 == s && t._3 == l)
        assert(kept.length == math.min(cap, ds.length))
        val want = ds.map(d => (d.doc_id, (d.doc_id * 69069L) % 65536L))
          .sortBy { case (id, p) => (p, id) }.take(cap).map(_._1).toSet
        assert(kept.map(_._1).toSet == want)
        // ranks are 1..|kept| with no gaps
        assert(kept.map(_._4).sorted.toSeq == (1L to kept.length).toSeq)
      }
    }
  }

  test("splitLeakage: replay equality on random boilerplate-heavy corpora") {
    import spark.implicits._
    val (n, tau) = (3, 0.3)
    for (docs <- corpora(10)) {
      val got = TrainPrepQueries.splitLeakage(docs.toDF(), n, tau).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      def sh(text: String): Set[String] = {
        val t = text.split(" ", -1)
        if (t.length < n) Set.empty
        else (0 to t.length - n).map(k => t.slice(k, k + n).mkString(" ")).toSet
      }
      val posts = docs.map(d => (d.doc_id, sh(d.text))).filter(_._2.nonEmpty)
      val (ev, tr) = posts.partition { case (id, _) => (id * 69621L) % 65536L < 6554L }
      val expected = (for {
        (e, es) <- ev; (t, ts) <- tr
        inter = (es intersect ts).size
        if inter > 0
        j = inter.toDouble / (es.size + ts.size - inter)
        if j >= tau
      } yield (e, t, math.floor(j * 10000.0 + 0.5) / 10000.0)).toSet
      assert(got == expected,
        s"diverged: got-only=${got -- expected}, want-only=${expected -- got}")
    }
  }
}
