package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Randomized semantics of the fourth-wave cores over adversarial inputs
  * the real tables cannot produce: timestamp collisions, empty stages,
  * URL spelling storms, names at the edit-distance boundary, duplicate
  * vectors (distance-0 ties), waterfills where every regime flips. Each
  * property replays the declared arithmetic in plain Scala from scratch.
  * Seed-looped scalacheck (the scalatest bridge artifact is not in the
  * offline cache — the [[TrainPrepPropertySpec]] pattern). */
object FourthWavePropertySpec {
  final case class Ev(user_id: Long, event_type: String, ts: Long, event_id: Long)
  final case class Rec(doc_id: Long, name: String)
  final case class UrlRow(doc_id: Long, url: String)
  final case class Vec(vec_id: Long, embedding: Array[Double])
  final case class LangCnt(lang: String, cnt: Long)
  final case class Edge(u: Long, v: Long)
}

class FourthWavePropertySpec extends AnyFunSuite {
  import FourthWavePropertySpec._
  lazy val spark = SparkTestBase.spark

  private def sample[A](gen: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val a = gen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  // ---- q148 funnel -----------------------------------------------------------

  // few users, tiny ts domain → deliberate timestamp collisions; noise
  // types that are not funnel stages
  private val evGen: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 6L)
      t <- Gen.oneOf("view", "click", "purchase", "error", "signup")
      ts <- Gen.choose(1L, 12L)
    } yield (u, t, ts))
  } yield rows.zipWithIndex.map { case ((u, t, ts), i) => Ev(u, t, ts, i.toLong) }

  test("funnel: chained-minima replay equality on random colliding streams") {
    import spark.implicits._
    for (evs <- sample(evGen, 15, 991L).filter(_.nonEmpty)) {
      val got = AnalyticsQueries.funnel(evs.toDF(), Seq("view", "click", "purchase"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val stages = evs.groupBy(_.user_id).values.map { es =>
        val t1 = es.filter(_.event_type == "view").map(_.ts).minOption
        val t2 = t1.flatMap(a => es.filter(e => e.event_type == "click" && e.ts > a)
          .map(_.ts).minOption)
        val t3 = t2.flatMap(a => es.filter(e => e.event_type == "purchase" && e.ts > a)
          .map(_.ts).minOption)
        (t1.isDefined, t2.isDefined, t3.isDefined)
      }.toSeq
      assert(got("1_view") == stages.count(_._1).toLong, s"n1 on $evs")
      assert(got("2_click") == stages.count(_._2).toLong, s"n2 on $evs")
      assert(got("3_purchase") == stages.count(_._3).toLong, s"n3 on $evs")
    }
  }

  test("funnel: 11-stage output comes back in stage order, not " +
       "lexicographic label order ('10_x' must not sort before '2_y')") {
    import spark.implicits._
    val stages = (1 to 11).map(i => s"s$i")
    // one user walks the full funnel in order
    val evs = stages.zipWithIndex.map { case (st, i) =>
      Ev(1L, st, (i + 1).toLong, i.toLong) }
    val got = AnalyticsQueries.funnel(evs.toDF(), stages).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.map(_._1) == stages.zipWithIndex.map { case (st, i) => s"${i + 1}_$st" },
      s"stage order broken: ${got.map(_._1)}")
    assert(got.forall(_._2 == 1L))
  }

  // ---- q151 URL canonicalization --------------------------------------------

  private val urlVariantGen: Gen[(String, List[String])] = for {
    host <- Gen.oneOf("docs.example.com", "wiki.example.org")
    nSeg <- Gen.choose(1, 3)
    segs <- Gen.listOfN(nSeg, Gen.choose(0, 30).map(i => s"p$i"))
    id <- Gen.choose(0, 20)
    nVar <- Gen.choose(2, 4)
    variants <- Gen.listOfN(nVar, for {
      schemeUp <- Gen.oneOf(true, false)
      hostUp <- Gen.oneOf(true, false)
      port <- Gen.oneOf(true, false)
      slash <- Gen.oneOf(true, false)
      utm <- Gen.oneOf(true, false)
      refP <- Gen.oneOf(true, false)
      frag <- Gen.oneOf(true, false)
      flip <- Gen.oneOf(true, false)
    } yield {
      val scheme = if (schemeUp) "HTTPS://" else "https://"
      val h = if (hostUp) host.toUpperCase else host
      val p = (if (port) ":443" else "")
      val path = "/" + segs.mkString("/") + (if (slash) "/" else "")
      val base = List(s"id=$id", "v=2")
      val params = (if (flip) base.reverse else base) ++
        (if (utm) List("utm_source=x") else Nil) ++
        (if (refP) List("ref=rss") else Nil)
      scheme + h + p + path + "?" + params.mkString("&") +
        (if (frag) "#s1" else "")
    })
  } yield (s"https://$host/${segs.mkString("/")}?id=$id&v=2", variants)

  test("canonicalUrlDedup: every spelling storm collapses to its one " +
       "canonical form, and canonicalization is idempotent") {
    import spark.implicits._
    val groups = sample(urlVariantGen, 12, 1777L)
    val rows = groups.zipWithIndex.flatMap { case ((_, vs), g) =>
      vs.zipWithIndex.map { case (u, i) => UrlRow(g * 100L + i, u) }
    }
    val out = WebCurationQueries.canonicalUrlDedup(rows.toDF()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // one output group per distinct expected canonical; counts add up
    val expected = groups.zipWithIndex
      .groupBy(_._1._1).view.mapValues { gs =>
        (gs.map(_._1._2.length).sum.toLong,
         gs.map { case (_, g) => g * 100L }.min)
      }.toMap
    assert(out.map(_._1).toSet == expected.keySet,
      s"canonical set mismatch: ${out.map(_._1).toSet} vs ${expected.keySet}")
    out.foreach { case (c, nRaw, keeper) =>
      assert((nRaw, keeper) == expected(c), s"group $c")
    }
    // idempotence: canonical urls canonicalize to themselves
    val again = WebCurationQueries.canonicalUrlDedup(
      out.map(_._1).zipWithIndex.map { case (u, i) => UrlRow(i.toLong, u) }.toSeq.toDF())
      .collect().map(_.getString(0)).toSet
    assert(again == out.map(_._1).toSet)
  }

  // ---- q152 fuzzy entity dedup ----------------------------------------------

  private val recGen: Gen[List[Rec]] = for {
    nBase <- Gen.choose(1, 5)
    bases <- Gen.listOfN(nBase, for {
      pre <- Gen.choose(0, 9) // block prefix 'entity-N--' is 10 chars
      tail <- Gen.listOfN(8, Gen.oneOf('a', 'b', 'c'))
    } yield s"entity-$pre--" + tail.mkString)
    recs <- Gen.listOfN(12, for {
      b <- Gen.oneOf(bases)
      op <- Gen.choose(0, 3) // 0 = verbatim, else typo at position >= 11
      pos <- Gen.choose(11, 17)
    } yield op match {
      case 0 => b
      case 1 => b.substring(0, pos) + b.substring(math.min(pos + 1, b.length)) // delete
      case 2 => b.substring(0, pos) + "z" + b.substring(math.min(pos + 1, b.length)) // substitute
      case _ => b.substring(0, pos) + "z" + b.substring(pos) // insert
    })
  } yield recs.zipWithIndex.map { case (n, i) => Rec(i.toLong, n) }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzyEntityDedup: blocked DP replay equality on random typo storms " +
       "(boundary pairs at distance exactly 2 and 3 included)") {
    import spark.implicits._
    for (recs <- sample(recGen, 10, 33L)) {
      val got = WebCurationQueries.fuzzyEntityDedup(recs.toDF(), maxDist = 2)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val byBlock = recs.groupBy(_.name.take(10))
      recs.foreach { r =>
        val matchedMin = byBlock(r.name.take(10))
          .filter(o => lev(o.name, r.name) <= 2)
          .map(_.doc_id).min
        assert(got(r.doc_id) == matchedMin,
          s"rec ${r.doc_id} '${r.name}': ${got(r.doc_id)} != $matchedMin")
      }
    }
  }

  // ---- q154 UniMax waterfill -------------------------------------------------

  private val cntGen: Gen[List[LangCnt]] = for {
    n <- Gen.choose(1, 8)
    cnts <- Gen.listOfN(n, Gen.choose(1L, 1000000L))
  } yield cnts.zipWithIndex.map { case (c, i) => LangCnt(s"l$i", c) }

  test("unimaxAlloc: replay equality + cap/budget invariants + " +
       "leftover-implies-all-capped on random language tables") {
    import spark.implicits._
    for (cnts <- sample(cntGen, 15, 55L)) {
      val got = TrainPrepQueries.unimaxAlloc(spark, cnts.toDF("lang", "cnt"), 3L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
      val total = cnts.map(_.cnt).sum
      var remaining = total * 5 / 2
      val asc = cnts.sortBy(c => (c.cnt, c.lang))
      val expected = asc.zipWithIndex.map { case (c, i) =>
        val a = math.min(c.cnt * 3, remaining / (asc.length - i))
        remaining -= a
        (c.lang, c.cnt, a)
      }.sortBy(_._1)
      assert(got == expected, s"on $cnts")
      val spent = got.map(_._3).sum
      assert(spent <= total * 5 / 2)
      got.foreach { case (_, c, a) => assert(a >= 0 && a <= c * 3) }
      // leftover budget can only remain when every language hit its cap
      // (the largest language is processed last and takes all remaining
      // unless capped; scarcity propagates upward in size)
      if (spent < total * 5 / 2)
        assert(got.forall { case (_, c, a) => a == c * 3 },
          s"leftover with an uncapped language: $got")
    }
  }

  // ---- q163 triangle counting -----------------------------------------------

  // random graphs with a planted CELEBRITY hub (every node attaches to
  // node 0 with high probability) — exactly the skew shape the
  // degree-ordered orientation exists to survive
  private val graphGen: Gen[List[Edge]] = for {
    n <- Gen.choose(4, 14)
    extra <- Gen.listOfN(n * 2, for {
      a <- Gen.choose(0L, (n - 1).toLong)
      b <- Gen.choose(0L, (n - 1).toLong)
    } yield (a, b))
    hub <- Gen.listOfN(n, Gen.choose(1L, (n - 1).toLong))
  } yield (extra ++ hub.map(x => (0L, x)))
    .filter { case (a, b) => a != b }
    .map { case (a, b) => Edge(a min b, a max b) }
    .distinct

  test("triangleCounts: brute-force triple-scan equality on random graphs " +
       "with a planted celebrity hub") {
    import spark.implicits._
    for (edges <- sample(graphGen, 10, 4040L).filter(_.nonEmpty)) {
      val eset = edges.map(e => (e.u, e.v)).toSet
      val nodes = eset.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      def adj(a: Long, b: Long) = eset((a min b, a max b))
      val expected = nodes.map { n =>
        val tri = (for {
          a <- nodes; if a != n && adj(n, a)
          b <- nodes; if b > a && b != n && adj(n, b) && adj(a, b)
        } yield 1).size.toLong
        (n, eset.count(e => e._1 == n || e._2 == n).toLong, tri)
      }
      val got = AnalyticsQueries.triangleCounts(edges.toDF("u", "v")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected, s"on $eset")
      // 3 x triangle count identity: per-node credits sum to 3 per triangle
      assert(got.map(_._3).sum % 3 == 0)
    }
  }

  // ---- q165 k-anonymity ------------------------------------------------------

  test("k-anonymity distribution: mass conservation and terminal share 1.0 " +
       "hold on random quasi-identifier tables (via the customer replay " +
       "shape over synthetic classes)") {
    // pure-scala property of the distribution algebra the query implements
    for (sizes <- sample(Gen.listOfN(30, Gen.choose(1L, 9L)), 10, 606L)) {
      val dist = sizes.groupBy(identity).toSeq
        .map { case (sz, cs) => (sz, cs.length.toLong, cs.length * sz) }
        .sortBy(_._1)
      val total = dist.map(_._3).sum
      var cum = 0L
      val shares = dist.map { case (_, _, nr) => cum += nr; cum.toDouble / total }
      assert(total == sizes.sum)
      assert(math.abs(shares.last - 1.0) < 1e-12)
      assert(shares == shares.sorted, "cumulative share must be monotone")
    }
  }

  // ---- q157 kNN graph --------------------------------------------------------

  private val vecsGen: Gen[List[Vec]] = for {
    n <- Gen.choose(5, 16)
    dim <- Gen.choose(2, 4)
    raw <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-3, 3).map(_.toDouble / 2)))
    dupAt <- Gen.choose(0, n - 1)
  } yield {
    // plant an exact duplicate so distance-0 ties exercise the tie-break
    val lists = raw.zipWithIndex.map { case (v, i) =>
      if (i == (dupAt + 1) % n) raw(dupAt) else v }
    lists.zipWithIndex.map { case (v, i) => Vec(i.toLong, v.toArray) }
  }

  test("knnGraph: brute replay equality on random sets with exact " +
       "duplicates (distance-0 ties) and row-order invariance") {
    import spark.implicits._
    for (vecs <- sample(vecsGen, 8, 77L)) {
      val q = vecs.map(v => (v.vec_id,
        v.embedding.map(x => math.floor(x * 1e6 + 0.5).toLong)))
      val expected = q.flatMap { case (id, a) =>
        q.filter(_._1 != id).map { case (nbr, b) =>
          (id, nbr, a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
        }.sortBy { case (_, nbr, d2) => (d2, nbr) }.take(3).zipWithIndex
          .map { case ((vid, nbr, d2), i) => (vid, i + 1L, nbr, d2) }
      }.sorted
      val df = vecs.toDF("vec_id", "embedding")
      val got = graft.ops.Similarity.knnGraph(df, "vec_id", "embedding", 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toList.sorted
      assert(got == expected, s"on ${vecs.map(_.embedding.toList)}")
      // permuting input rows must not change the graph
      val got2 = graft.ops.Similarity.knnGraph(
        vecs.reverse.toDF("vec_id", "embedding"), "vec_id", "embedding", 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toList.sorted
      assert(got2 == expected)
    }
  }
}
