package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the 100×-scale envelope of `embed_outliers`' exact-integer 2σ
  * inequality. Under the pre-round-10 1e6 quantization the comparison's
  * `N·Q` term (Q = Σ(n²)², n² ≤ 6.4e13) crossed DECIMAL(38,0)'s ~1e38
  * ceiling past N ≈ 160k max-magnitude vectors — Spark's non-ANSI
  * decimal overflow nulls the flag silently, so the sanity gate itself
  * went insane exactly when the corpus got big. This spec runs a
  * literal N = 200,000 (inside the old overflow band: 2e5 · 2e5 ·
  * (6.4e13)² ≈ 1.6e38 > 1e38) of unit-magnitude 64-dim vectors and
  * asserts ZERO null flags plus the exact expected flag set — which
  * the current 1e3 quantization satisfies with ~1e12 headroom
  * (peak term ≈ 1.6e26).
  */
class OutlierEnvelopeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("embed_outliers: no decimal overflow at N = 200k max-magnitude vectors") {
    val n = 200000L
    val nSmall = 100L
    // 100 half-magnitude vectors (n² = 64·500² = 1.6e7) in a sea of
    // unit vectors (n² = 64·1000² = 6.4e7): σ² ≈ (100/N)·(4.8e7)² so
    // the small ones sit ~45σ out and every unit vector well inside 2σ.
    val emb = spark.range(n).select(col("id").as("vec_id"),
      when(col("id") < nSmall, array_repeat(lit(0.5d), 64))
        .otherwise(array_repeat(lit(1.0d), 64)).as("embedding"))
    val row = graft.operators.Similarity.outliersOn(emb).agg(
      sum(when(col("is_outlier").isNull, 1L).otherwise(0L)).as("nulls"),
      sum(when(col("is_outlier") === true, 1L).otherwise(0L)).as("flagged"),
      countDistinct(col("n2")).as("n2_domain")).collect()(0)
    assert(row.getLong(0) == 0L,
      s"decimal overflow nulled ${row.getLong(0)} flags — envelope regressed")
    assert(row.getLong(1) == nSmall, s"expected $nSmall flagged, got $row")
    assert(row.getLong(2) == 2L, s"quantized n2 domain: $row")
  }
}
