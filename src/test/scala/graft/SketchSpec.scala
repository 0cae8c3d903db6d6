package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MinKAggregator

/** Invariants of the KMV sketch accumulator and estimator that the
  * DuckDB oracle (which states the window-form equivalent) can't pin:
  * mergeability (the distributed/streaming correctness property) and
  * estimator accuracy bounds on scales the sf tables don't reach.
  */
class SketchSpec extends AnyFunSuite {
  private val k = 8
  private val agg = new MinKAggregator(k)

  test("reduce keeps the k smallest distinct values in order") {
    val buf = (100L to 1L by -1L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == (1L to k.toLong).toList)
    // duplicates don't displace distinct values
    val dup = Seq(5L, 5L, 5L, 2L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(dup) == List(2L, 5L))
  }

  test("merge is the KMV union: min-k of the combined distinct sets") {
    val a = Seq(1L, 4L, 9L, 16L, 25L, 36L, 49L, 64L).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(2L, 3L, 4L, 50L, 70L, 90L, 110L, 130L).foldLeft(agg.zero)(agg.reduce)
    val direct = (Seq(1L, 4L, 9L, 16L, 25L, 36L, 49L, 64L) ++
      Seq(2L, 3L, 4L, 50L, 70L, 90L, 110L, 130L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(a, b)) == agg.finish(direct))
    assert(agg.finish(agg.merge(a, b)) ==
      List(1L, 2L, 3L, 4L, 9L, 16L, 25L, 36L))
    // merge order is immaterial (shuffle/batch arrival order freedom)
    assert(agg.merge(a, b) == agg.merge(b, a))
  }

  test("HLL registers yield estimates within error bounds of exact counts") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val regs = SparkEntry.queries("sketch_hll")(spark, SparkTestSession.sf)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val exact = Tables.load(spark, SparkTestSession.sf, "events")
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.countDistinct($"user_id"))
      .as[(String, Long)].collect().toMap
    val m = 64
    // the float estimator lives HERE, outside the hash gate: raw HLL
    // harmonic mean with alpha_64; stderr ~ 1.04/sqrt(64) = 13%, assert
    // a generous 4-sigma band (plus slack for the 26-bit hash width)
    regs.foreach { case (t, byBucket) =>
      val z = (0 until m).map(b =>
        math.pow(2.0, -byBucket.getOrElse(b.toLong, 0L).toDouble)).sum
      val raw = 0.709 * m * m / z
      // Flajolet's small-range correction: below 2.5m with empty
      // registers, linear counting on the zero-register count
      val zeros = m - byBucket.size
      val est = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      val rel = math.abs(est - exact(t)) / exact(t)
      assert(rel < 0.55, s"$t: est=$est exact=${exact(t)} rel=$rel")
    }
    // registers are within the rank domain for a 26-bit hash remainder
    assert(regs.values.flatMap(_.values).forall(r => r >= 1 && r <= 27))
  }

  test("stream_hll register table equals the one-pass batch build") {
    // the streaming twin shares the batch oracle in the driver gate;
    // this pins the same identity locally at sf0.001: max-merge across
    // micro-batches is lossless (idempotent + commutative), so the
    // incrementally-maintained registers are bit-identical to one pass
    val spark = SparkTestSession.spark
    val sf = SparkTestSession.sf
    val batch = SparkEntry.queries("sketch_hll")(spark, sf)
      .collect().map(_.toSeq).toSet
    val stream = SparkEntry.queries("stream_hll")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("theta set algebra estimates pairwise overlaps within error bounds") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val est = SparkEntry.queries("sketch_theta_ops")(spark, SparkTestSession.sf)
      .select("type_a", "type_b", "theta", "union_est", "inter_est")
      .as[(String, String, Long, Long, Long)].collect()
    assert(est.nonEmpty)
    // exact pairwise union/intersection of the per-type user sets
    val users = Tables.load(spark, SparkTestSession.sf, "events")
      .select($"event_type", $"user_id").distinct()
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    est.foreach { case (a, b, theta, uEst, iEst) =>
      val u = (users(a) ++ users(b)).size
      val i = (users(a) & users(b)).size
      if (theta == 4294967296L) {
        // neither sketch filled: the sketch IS the set, estimates exact
        assert(uEst == u && iEst == i, s"($a,$b) exact-mode mismatch")
      } else {
        // stderr ~ 1/sqrt(k-1) ≈ 18% on the union; intersections carry
        // the union's absolute error, so bound them absolutely
        assert(math.abs(uEst - u).toDouble / u < 0.75, s"($a,$b) union $uEst vs $u")
        assert(math.abs(iEst - i) <= math.max(8L, (0.75 * u).toLong),
          s"($a,$b) inter $iEst vs $i")
      }
    }
  }

  test("quantile sample median lands near the exact median; stream = batch") {
    val spark = SparkTestSession.spark
    val batch = SparkEntry.queries("sketch_quantile")(spark, SparkTestSession.sf)
      .collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      val est = r.getAs[Long]("est_p50_cents")
      val exact = r.getAs[Long]("exact_p50_cents")
      // a bottom-k hash sample is uniform: the sample median's rank in
      // the population concentrates around n/2 with sd ~ n/(2√k), so
      // the VALUE error is bounded by the local density — assert a
      // generous relative band (k = 32 → ~18% rank sd; the synthetic
      // value distribution is roughly uniform so value ≈ rank)
      assert(math.abs(est - exact).toDouble <= 0.8 * exact + 500,
        s"${r.getAs[String]("event_type")}: est=$est exact=$exact")
    }
    // the streaming twin accumulates the same sample across batches
    val stream = SparkEntry.queries("stream_quantile")(spark, SparkTestSession.sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch.map(_.toSeq).toSet)
  }

  test("estimator lands within KMV error bounds on a large synthetic set") {
    // hash stand-in: a deterministic LCG spraying n keys over [0, 2^32)
    // — the estimator only assumes uniformity, which the real md5-based
    // hash supplies. stderr ≈ 1/√(k−1); assert a generous 4σ.
    val bigK = 128
    val big = new MinKAggregator(bigK)
    val n = 100000
    var x = 88172645463325252L
    val buf = (1 to n).foldLeft(big.zero) { (b, _) =>
      x = x * 6364136223846793005L + 1442695040888963407L
      big.reduce(b, math.floorMod(x >>> 16, 1L << 32))
    }
    val ks = big.finish(buf)
    assert(ks.length == bigK)
    val est = (bigK - 1).toLong * 4294967296L / ks.last
    val relErr = math.abs(est.toDouble - n) / n
    assert(relErr < 4.0 / math.sqrt(bigK - 1.0), s"est=$est relErr=$relErr")
  }
}
