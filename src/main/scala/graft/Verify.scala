package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = (args.take(2), args.drop(2).toSet)
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // retries are legitimate (every attempt still faces the DuckDB hash)
    // but must stay VISIBLE: a trending-flaky face should surface in the
    // run log long before it costs a gate run
    val flaked = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      def attempt(): Unit = fn(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      // one retry: streaming replay faces can flake transiently under
      // full-surface load (e.g. a stream-stream join's drain timing);
      // every attempt recomputes from scratch and still faces the
      // DuckDB hash, so a retry can mask nothing but the flake itself
      try attempt()
      catch { case e1: Throwable =>
        System.err.println(s"[verify] $name failed " +
          s"(${e1.getClass.getSimpleName}: ${e1.getMessage}); retrying")
        flaked += name
        spark.catalog.clearCache()
        try attempt()
        catch { case e2: Throwable =>
          System.err.println(s"[verify] $name failed: ${e2.getMessage}")
        }
      }
      finally spark.catalog.clearCache() // drop any query-interior persist()
    }
    if (flaked.nonEmpty)
      System.err.println("[verify] flaked: " + flaked.groupBy(identity)
        .toSeq.sortBy(_._1)
        .map { case (n, xs) => s"$n x${xs.size}" }.mkString(", "))
    else System.err.println("[verify] flaked: none")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // dump the FULL oracle map regardless of the face filter: the compare
    // iterates over result dirs and looks oracles up by name, so extra
    // entries are harmless — while a filtered dump overwrites a previous
    // full run's oracle_sql.json and breaks incremental re-verification
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
