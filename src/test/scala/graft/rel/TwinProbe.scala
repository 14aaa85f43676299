package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** SCRATCH diagnostic (not part of the suite contract): tries every
  * committed oracle verbatim through spark.sql and prints the outcome. */
class TwinProbe extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("probe: which oracles run verbatim") {
    Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation", "region", "events", "documents", "embeddings")
      .foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(""))
    graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      val out = try {
        val viaSql = spark.sql(sql)
        val viaDf = graft.SparkEntry.queries(name)(spark, dir)
        if (viaSql.columns.toSeq != viaDf.columns.toSeq) s"COLS ${viaSql.columns.toSeq.take(4)}"
        else if (canon(viaSql) == canon(viaDf)) "VERBATIM"
        else "MISMATCH"
      } catch {
        case e: Throwable =>
          "ERR " + Option(e.getMessage).getOrElse(e.getClass.getName).replaceAll("\n", " ").take(110)
      }
      println(s"TWINPROBE $name -> $out")
    }
  }
}
