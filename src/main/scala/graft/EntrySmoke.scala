package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.entry(spark)
    df.show(30, false)
    println("ROWS=" + df.count())
    spark.stop()
  }
}
