package graft

/** Dev-only smoke: confirm every testdata table reads under Spark 4
  * (notably events.parquet's nanosecond timestamps and
  * embeddings.parquet's list&lt;float&gt;).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    Tables.names.foreach { n =>
      val df = Tables.load(spark, dir, n)
      println(s"== $n rows=${df.count()}")
      df.printSchema()
    }
    spark.stop()
  }
}
