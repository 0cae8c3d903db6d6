package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val fn = SparkEntry.queries(name)
    // warm
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"RUN$i ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
