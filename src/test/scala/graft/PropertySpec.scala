package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKAggregator
import graft.sources.FrameBuffer

/** Property-based invariants for the hand-rolled primitives the engine
  * leans on: the publish-log line codec, the bounded top-k fold, and the
  * frame buffer under concurrent producers/committers — the pieces whose
  * failure modes are exactly "some adversarial input you didn't write an
  * example for".
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministically sample n values from a generator (raw scalacheck,
    * no scalatest bridge in the dependency set).
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    samples(g, n).foreach(f)

  private def forAll2[A](g1: Gen[A], g2: Gen[A])(f: (A, A) => Unit): Unit =
    (0 until 100).foreach { i =>
      // independent seed streams: pairing a sample set with its own
      // reverse would only cover mirrored duplicates of one set
      for {
        a <- g1.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- g2.apply(Gen.Parameters.default, Seed(100000L + i))
      } f(a, b)
    }

  // ---- native text expressions vs their HOF twins -----------------------

  /** Adversarial document text: words of letters/digits/punct/accents
    * joined by runs of spaces/tabs/newlines, with leading/trailing
    * whitespace — the token-boundary shapes where a native
    * reimplementation of split(trim(x), "\\s+") would drift.
    */
  private val genDoc: Gen[String] = {
    val word = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ü', 'ß', 'ñ', '.', ',', '!')))
      .map(_.mkString)
    val sep = Gen.nonEmptyListOf(Gen.oneOf(' ', ' ', '\t', '\n'))
      .map(_.mkString)
    for {
      words <- Gen.listOfN(12, word)
      seps <- Gen.listOfN(13, sep)
      lead <- Gen.oneOf("", " ", "  ")
      trail <- Gen.oneOf("", " ", "\t")
    } yield lead + words.zip(seps).map { case (w, s) => w + s }
      .mkString.stripSuffix(seps.last) + trail
  }

  test("CharRunStats and BigramStats equal their HOF twins on adversarial text") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val texts = samples(genDoc, 200) ++ Seq("", " ", "\t", "one",
      "a a a a", " \t mixed \n ws ")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("prop_docs").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Option: empty text has log2(0) = null entropy in BOTH paths
    val entNative = graft.operators.TextAnalysis
      .queries("text_entropy")(spark, dir)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    val entHof = graft.operators.TextAnalysis.entropyHof(docs)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(entNative == entHof)
    val repNative = graft.operators.TextAnalysis
      .queries("text_repetition")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val repHof = graft.operators.TextAnalysis.repetitionHof(docs)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(repNative == repHof)
  }

  test("CharBigrams equals the transform+substr HOF twin, incl. astral chars") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // astral chars (surrogate pairs) are where a UTF-16-offset slice
    // could drift from SQL substr's code-point indexing
    val texts = samples(genDoc, 150) ++
      Seq("", "x", "ab", "日本語テキスト", "a😀b😁c")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val t = col("text")
    val hof = when(length(t) >= 2,
      transform(sequence(lit(1), length(t) - 1), i => t.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
    val both = docs.select(col("doc_id"),
      graft.functions.TextExpressions.char_bigrams(t).as("nat"),
      hof.as("hof"))
      .as[(Long, Seq[String], Seq[String])].collect()
    both.foreach { case (id, nat, h) =>
      assert(nat == h, s"doc $id: native $nat vs hof $h")
    }
  }

  // ---- publish-log codec ------------------------------------------------

  test("publish log round-trips ARBITRARY keys and payloads") {
    forAll(Gen.listOfN(5, for {
      k <- Gen.asciiPrintableStr
      v <- implicitly[org.scalacheck.Arbitrary[String]].arbitrary
    } yield (k, v)), 60) { msgs =>
      val sub = java.nio.file.Files.createTempDirectory("pub_prop_one").toString
      val p1 = new graft.streaming.FilePublisher(sub)
      p1.publishPartition(msgs.iterator)
      // non-empty messages only: an empty iterator writes no file
      val expect = msgs.toVector
      assert(graft.streaming.FilePublisher.consume(sub) == expect)
    }
  }

  // ---- bounded top-k fold ----------------------------------------------

  private val items: Gen[List[(Double, Long)]] =
    Gen.listOf(for {
      s <- Gen.chooseNum(-1e6, 1e6)
      id <- Gen.chooseNum(0L, 50L) // small id space forces score ties
    } yield (s, id))

  test("TopKAggregator: fold order never changes the result (merge soundness)") {
    val agg = new TopKAggregator(5)
    forAll2(items, items) { (a, b) =>
      val viaReduce = (a ++ b).foldLeft(agg.zero)(agg.reduce)
      val viaMerge = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(viaReduce) == agg.finish(viaMerge))
      // and merge is commutative - partitions arrive in any order
      val viaMergeRev = agg.merge(
        b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(viaMerge) == agg.finish(viaMergeRev))
    }
  }

  test("TopKAggregator equals a full sort-take on any input") {
    val agg = new TopKAggregator(5)
    forAll(items) { xs =>
      val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val want = xs.sorted(Ordering.by[(Double, Long), (Double, Long)] {
        case (s, id) => (-s, id)
      }).take(5)
      assert(got == want)
    }
  }

  // ---- frame buffer under concurrency ----------------------------------

  test("FrameBuffer invariants hold under concurrent push/commit/evict") {
    val buf = new FrameBuffer
    buf.setCapacity(500)
    val consumer = buf.register()
    val producers = (1 to 4).map { _ =>
      new Thread(() => (1 to 5000).foreach(i => buf.push(s"f$i")))
    }
    val committer = new Thread(() => (1 to 200).foreach { _ =>
      buf.committed(consumer, buf.lastSeq - 600) // trail behind the head
      Thread.sleep(1)
    })
    (producers :+ committer).foreach(_.start())
    (producers :+ committer).foreach(_.join())
    val total = 4 * 5000
    assert(buf.lastSeq == total, "no sequence number lost or duplicated")
    val remaining = buf.range(0, buf.lastSeq).length
    assert(remaining <= 500, s"capacity must hold after the dust settles: $remaining")
    assert(buf.droppedFrames <= total.toLong,
      "dropped can never exceed pushed (no phantom drops)")
    // surviving frames are a suffix-heavy set: the newest frame survives
    assert(buf.range(total - 1, total.toLong).nonEmpty,
      "drop-oldest must never evict the newest frame")
    buf.unregister(consumer)
  }
}
