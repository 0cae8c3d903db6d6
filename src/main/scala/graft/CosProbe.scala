package graft
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
object CosProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = e.select(col("vec_id").as("a_id"), asDouble(col("embedding")).as("va"))
    val b = e.select(col("vec_id").as("b_id"), asDouble(col("embedding")).as("vb"))
    a.join(b, col("a_id") < col("b_id"))
      .filter(col("a_id") < 3 && col("b_id") < 6)
      .select(col("a_id"), col("b_id"), cosine(col("va"), col("vb")).as("sim"))
      .orderBy("a_id", "b_id")
      .collect().foreach(r => println(f"COS ${r.getLong(0)} ${r.getLong(1)} ${r.getDouble(2)}%.17g"))
    spark.stop()
  }
}
