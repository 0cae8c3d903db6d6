package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{StreamingQueries, TextAnalysis}

/** The maintained-inverted-index identity, cross-checked inside one
  * engine (the DuckDB oracle states it cross-engine): appending per-batch
  * postings generations and sum-merging the per-generation df/stats
  * partials ranks EXACTLY like the from-scratch single-scan build.
  */
class IndexIvmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("text_index_ivm: maintained index ranking == from-scratch " +
      "text_bm25_grouped, row for row") {
    val maintained = StreamingQueries.queries("text_index_ivm")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    val rebuilt = TextAnalysis.queries("text_bm25_grouped")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    assert(maintained.length == rebuilt.length)
    assert(maintained.sameElements(rebuilt))
  }
}
