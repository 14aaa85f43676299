package graft

import org.scalatest.funsuite.AnyFunSuite

/** The three-line user journey the README promises: views + functions on
  * an existing session, SQL straight through the parser, and the query
  * catalog. (Session construction itself is covered implicitly — the
  * shared test session just doesn't carry the extensions class, so the
  * explicit registerFunctions path is what's pinned here.) */
class GraftFacadeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("registerViews + registerFunctions: SQL front door works end-to-end") {
    val registered = Graft.registerViews(spark, SparkTestBase.Sf0001)
    assert(registered.toSet == Graft.tableNames.toSet, s"registered: $registered")
    Graft.registerFunctions(spark)
    val row = spark.sql(
      """SELECT count(*) AS n,
                count(DISTINCT graft_normalize(lang)) AS n_langs
         FROM documents""").collect()(0)
    assert(row.getLong(0) == 500L && row.getLong(1) > 0)
  }

  test("query catalog: every declared name resolves and the catalog is complete") {
    assert(Graft.queryNames.size == SparkEntry.queries.size)
    assert(Graft.queryNames.contains("q40_rag_eval_pipeline"))
    val df = Graft.query("q13_topk")(spark, SparkTestBase.Sf0001)
    assert(df.count() == 100)
  }

  test("registerViews skips missing tables instead of failing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty").toString
    assert(Graft.registerViews(spark, tmp).isEmpty)
  }
}
