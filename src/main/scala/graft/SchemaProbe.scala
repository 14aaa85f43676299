package graft
import org.apache.spark.sql.SparkSession
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("events","orders","lineitem","documents","embeddings")) {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      println(s"== $t: ${df.schema.simpleString}")
    }
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e.selectExpr("min(ts)","max(ts)","count(distinct user_id)").show(false)
    spark.stop()
  }
}
