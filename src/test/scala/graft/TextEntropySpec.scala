package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the char-entropy fold — values the hash gate
  * can't see because the corpus has no degenerate texts.
  */
class TextEntropySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def entropies(texts: String*): Map[Long, (Long, Long, Double)] = {
    val dir = java.nio.file.Files.createTempDirectory("ent_docs").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.operators.TextAnalysis.queries("text_entropy")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("closed forms: constant text is 0 bits, uniform alphabets are log2(k)") {
    val got = entropies("aaaaaa", "ababab", "abcdabcd", "abc")
    assert(got(0L) == ((6L, 1L, 0.0)), "constant text must carry 0 bits")
    assert(got(1L) == ((6L, 2L, 1.0)), "uniform 2-alphabet must be 1 bit")
    assert(got(2L) == ((8L, 4L, 2.0)), "uniform 4-alphabet must be 2 bits")
    val log2of3 = BigDecimal(math.log(3) / math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(3L) == ((3L, 3L, log2of3)),
      s"uniform 3-alphabet must be log2(3) rounded to 6: ${got(3L)}")
  }

  test("skewed text lands strictly between constant and uniform") {
    val (_, _, h) = entropies("aaab")(0L)
    // H(3/4, 1/4) = 2 - 0.75*log2(3) = 0.811278...
    assert(math.abs(h - 0.811278) < 1e-6, s"got $h")
  }

  test("native char_run_stats equals the HOF fold row-for-row on the corpus") {
    val sf = SparkTestSession.sf
    val docs = Tables.load(spark, sf, "documents")
    val native = graft.operators.TextAnalysis
      .queries("text_entropy")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val hof = graft.operators.TextAnalysis.entropyHof(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(native == hof)
  }

  test("native bigram_stats equals the HOF fold row-for-row on the corpus") {
    val sf = SparkTestSession.sf
    val docs = Tables.load(spark, sf, "documents")
    val native = graft.operators.TextAnalysis
      .queries("text_repetition")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val hof = graft.operators.TextAnalysis.repetitionHof(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(native == hof)
  }

  test("repetition fold: closed forms on degenerate and clean texts") {
    val dir = java.nio.file.Files.createTempDirectory("rep_docs").toString
    Seq(
      (0L, "spam spam spam spam"),      // bigram "spam spam" ×3
      (1L, "all words here differ"),    // 3 distinct bigrams
      (2L, "one"),                      // <2 words: no bigrams
      (3L, "go go stop go go"),         // "go go"×2, "go stop", "stop go"
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis
      .queries("text_repetition")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(0L) == ((3L, 1L, 2L, 3L)), s"pure repetition: ${got(0L)}")
    assert(got(1L) == ((3L, 3L, 0L, 1L)), s"no repetition: ${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L, 0L)), s"single word: ${got(2L)}")
    assert(got(3L) == ((4L, 3L, 1L, 2L)), s"mixed: ${got(3L)}")
  }

  test("quality classifier: stopword-rich prose outranks digit/punct " +
      "spam; hard-sigmoid and decision cohere") {
    val dir = java.nio.file.Files.createTempDirectory("qc_docs").toString
    Seq(
      (0L, "the cat and the dog of the house is a friend of the family " +
        "and the story of the day is a good one"),
      (1L, "4532 8721 9943 1205 7768 3341 0092 5567 8810 2234 6679 1123"),
      (2L, "!!! ### $$$ %%% &&& *** ((( ))) @@@ ^^^ ~~~ ||| ??? ;;;"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis
      .queries("text_quality_classifier")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (proseS, proseP, proseKept) = got(0L)
    val (digitS, _, digitKept) = got(1L)
    val (punctS, _, punctKept) = got(2L)
    assert(proseS > digitS && proseS > punctS,
      s"prose must outscore spam: $got")
    assert(proseKept == 1L && digitKept == 0L && punctKept == 0L, got.toString)
    // the calibration is the exact hard sigmoid and the decision its
    // threshold — restated independently of the SQL expression
    got.values.foreach { case (s0, p, kept) =>
      val drift = if (s0 >= 0) s0 / 4 else -((-s0) / 4)
      assert(p == math.min(math.max(5000L + drift, 0L), 10000L))
      assert(kept == (if (p >= 5000L) 1L else 0L))
      assert(p >= 0L && p <= 10000L)
    }
    assert(proseP > 5000L)
  }
}
