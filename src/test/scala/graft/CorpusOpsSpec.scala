package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactness proofs for the scale-shaped corpus operators: each
  * distributed formulation must equal its naive (single-task /
  * nested-loop) reference on the same data — the shapes differ only in
  * how they distribute, never in what they return.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("corpus_reject_reasons: kept verdicts are exactly the build manifest") {
    import spark.implicits._
    val verdicts = SparkEntry.queries("corpus_reject_reasons")(spark, sf)
    // every document gets exactly one verdict
    assert(verdicts.count() ==
      Tables.load(spark, sf, "documents").count())
    // the kept set IS the corpus_build manifest — per-row lineage and
    // the shipped corpus cannot disagree
    val kept = verdicts.filter($"verdict" === "kept").select("doc_id")
    val manifest = SparkEntry.queries("corpus_build")(spark, sf)
      .select("doc_id")
    assert(kept.exceptAll(manifest).isEmpty && manifest.exceptAll(kept).isEmpty)
    // verdicts draw only from the gate vocabulary, and the smallest sf
    // still exercises rejection (quality) next to keeps; the full
    // 5-class spread is pinned by the sf0.01 oracle hash
    val classes = verdicts.select("verdict").distinct()
      .as[String].collect().toSet
    assert(classes.subsetOf(
      Set("lang", "quality", "exact_dup", "near_dup", "kept")), classes.toString)
    assert(Set("quality", "kept").subsetOf(classes), classes.toString)
  }

  test("corpus_bpe_curve: totals strictly shrink, bounded by the pair count") {
    val curve = SparkEntry.queries("corpus_bpe_curve")(spark, sf)
      .collect().map(r => r.getAs[Long]("round") ->
        r.getAs[Long]("total_symbols")).toMap
    val merges = SparkEntry.queries("corpus_bpe_train")(spark, sf)
      .collect().map(r => r.getAs[Long]("round") ->
        r.getAs[Long]("pair_n")).toMap
    assert(curve.keySet == (0L to merges.keySet.max).toSet)
    merges.foreach { case (r, pairN) =>
      val drop = curve(r - 1) - curve(r)
      // every applied merge fuses two symbols into one, so the corpus
      // strictly shrinks; replace is non-overlapping while the pair
      // count counts overlapping occurrences, so drop <= pair_n
      assert(drop > 0, s"round $r did not shrink the corpus")
      assert(drop <= pairN, s"round $r dropped $drop > pair_n $pairN")
    }
  }

  test("corpus_epoch_plan: budget respected, cap binds exactly when short") {
    val plan = SparkEntry.queries("corpus_epoch_plan")(spark, sf).collect()
    assert(plan.nonEmpty)
    val budget = 2000000L
    plan.foreach { r =>
      val (avail, want, planned, repeatBp, capped) = (
        r.getAs[Long]("avail_tokens"), r.getAs[Long]("want_tokens"),
        r.getAs[Long]("planned_tokens"), r.getAs[Long]("repeat_bp"),
        r.getAs[Long]("capped"))
      assert(planned <= want)
      assert(repeatBp <= 40000L, s"repeat cap violated: $r")
      // the capped flag is exactly "the cap bound before the ask did"
      assert((capped == 1L) == (avail * 4 < want), r.toString)
    }
    // the plan never asks for more than the budget in total
    assert(plan.map(_.getAs[Long]("planned_tokens")).sum <= budget)
  }

  test("text_novelty: commonness floor on literal docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // bigram "a b" appears in 6 distinct docs (>= MinDocs=5 -> common);
    // "b c" in one (rare). Doc 5: 2 bigrams, 1 common -> novelty 0.5.
    // Doc 6 ("x") has no bigram and must drop out, as declared.
    val docs = ((0L to 4L).map(i => (i, "a b")) ++
      Seq((5L, "a b c"), (6L, "x"))).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyOn(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == (0L to 5L).toSet, s"docs scored: ${got.keySet}")
    assert((0L to 4L).forall(got(_) == ((1L, 1L, 0.0))),
      s"template docs score zero novelty: $got")
    assert(got(5L) == ((2L, 1L, 0.5)), s"doc 5: $got")
  }

  test("sample_stratified two-phase salted top-k equals the naive per-stratum window") {
    val got = SparkEntry.queries("sample_stratified")(spark, sf)
    val docs = Tables.load(spark, sf, "documents")
    val naive = docs
      .select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("sample_key"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("sample_key"), col("doc_id"))))
      .filter(col("_rk") <= 100).drop("_rk")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("sample_stratified draws at most the quota per stratum") {
    val over = SparkEntry.queries("sample_stratified")(spark, sf)
      .groupBy("source").count().filter(col("count") > 100)
    assert(over.isEmpty)
  }

  test("interval_join binned equi-join equals the naive range join") {
    val got = SparkEntry.queries("interval_join")(spark, sf)
    // naive range join over the same session table: rebuild sessions,
    // then join on the raw inequality predicate (nested-loop — fine at
    // spec scale, the thing the binned shape exists to avoid at 100 TB)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = Tables.load(spark, sf, "events")
      .filter(col("user_id") < 40)
      .withColumn("sec", unix_seconds(col("ts").cast("timestamp")))
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("ns",
        when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("sec")).as("s"), max(col("sec")).as("e"))
    val a = sess.select(col("user_id").as("user_a"), col("sid").as("sess_a"),
      col("s").as("a_s"), col("e").as("a_e"))
    val b = sess.select(col("user_id").as("user_b"), col("sid").as("sess_b"),
      col("s").as("b_s"), col("e").as("b_e"))
    val naive = a.join(b,
        col("user_a") < col("user_b") &&
          col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("user_a"), col("sess_a"), col("user_b"), col("sess_b"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap_secs"))
    assert(got.count() > 0, "spec data must exercise at least one overlap")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("interval_join plans no nested loop (the binned shape is an equi-join)") {
    val plan = PlanCheck.finalPlanString(
      SparkEntry.queries("interval_join")(spark, sf))
    assert(!PlanCheck.hasNestedLoop(plan), plan)
  }

  test("contamination_check broadcasts the eval side (the train shingles never shuffle)") {
    val plan = PlanCheck.finalPlanString(
      SparkEntry.queries("contamination_check")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("embed_quantize zero-vector guard: all-zero embedding quantizes to zeros, no NaN/overflow") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(1f, -2f, 0.5f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.quantizeProfile(emb)
      .orderBy("vec_id").collect()
    assert(out(0).getLong(1) == 3 && out(0).getLong(2) == 0 &&
      out(0).getLong(3) == 0 && out(0).getLong(4) == 0)
    // max|x| element maps to exactly 127; others floor toward -inf
    assert(out(1).getLong(4) == 63)   // 0.5 * (127/2) = 31.75 -> 31; 1 * 63.5 -> 63
    assert(out(1).getLong(3) == -127) // -2 -> -127 exactly
  }

  test("basket_pairs: in-order dedup and pair orientation on literal orders") {
    import spark.implicits._
    // order 1 holds parts 10, 20, 30 with part 20 listed TWICE (two
    // lineitems, one basket membership); order 2 holds 10, 20. Pairs:
    // (10,20) in both orders, (10,30) and (20,30) in order 1 only.
    val li = Seq((1L, 10L), (1L, 20L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L)).toDF("l_orderkey", "l_partkey")
    val got = graft.operators.Breadth.basketPairsOn(li)
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((10L, 20L, 2L), (10L, 30L, 1L), (20L, 30L, 1L)),
      s"pairs: $got")
  }

  test("cdc chunks: boundaries are content-defined, so an insertion only " +
      "perturbs the chunks touching the edit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (1 to 1200).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "INSERTED PREAMBLE " + base
    val chunks = graft.operators.TextAnalysis.cdcChunksOn(
      Seq((1L, base), (2L, edited)).toDF("doc_id", "text"))
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2)
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    assert(a.length >= 10, s"expected many chunks, got ${a.length}")
    // every chunk of the original after the first content-defined
    // boundary reappears verbatim in the edited doc — the alignment a
    // fixed-window chunker loses for ALL chunks after an insertion
    val surviving = a.count(b.contains)
    assert(surviving >= a.length - 2,
      s"only $surviving/${a.length} chunks survived the insertion")
    // chunks reassemble the document exactly (no loss, no overlap)
    assert(a.mkString == base, "chunks must partition the text")
  }

  test("cdc_boundaries: rolling recurrence equals the closed-form window " +
      "polynomial on adversarial texts") {
    import graft.functions.CdcBoundaries
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // independent reimplementation: the oracle's closed form — per
    // position, the 8-term Σ c(i−k)·(B^k mod P), NOT the rolling update
    def closedForm(text: String, w: Int, mask: Long): Seq[Int] = {
      val cps = text.codePoints().toArray
      val pows = CdcBoundaries.powers(w)
      (w to cps.length).filter { i =>
        val h = (0 until w).map(k =>
          cps(i - 1 - k) * pows(k) % CdcBoundaries.Prime).sum %
          CdcBoundaries.Prime
        h % mask == 0
      }
    }
    val rnd = new scala.util.Random(11)
    val texts = Seq("", "short", "exactly8", "sevench",
      "é" * 20,                                   // 2-byte UTF-8
      new String(Character.toChars(0x1F600)) * 12,     // non-BMP
      "a" * 300) ++
      (1 to 8).map(_ => (1 to 200 + rnd.nextInt(400))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    for ((w, mask) <- Seq((8, 32L), (4, 16L)); (t, id) <- texts.zipWithIndex) {
      val got = texts.zipWithIndex.map(p => (p._2.toLong, p._1))
        .toDF("doc_id", "text")
        .where(col("doc_id") === id)
        .select(graft.functions.TextExpressions
          .cdc_boundaries(col("text"), w, mask).as("bs"))
        .as[Seq[Int]].head()
      assert(got == closedForm(t, w, mask),
        s"w=$w mask=$mask doc=$id: $got vs ${closedForm(t, w, mask)}")
    }
  }

  test("rolling_window_hashes: rolling recurrence equals the closed-form " +
      "window polynomial on adversarial texts") {
    import graft.functions.CdcBoundaries
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // independent reimplementation: per position the W-term
    // Σ c(i−k)·(B^k mod P), NOT the rolling update
    def closedForm(text: String, w: Int): Seq[Long] = {
      val cps = text.codePoints().toArray
      val pows = CdcBoundaries.powers(w)
      (w to cps.length).map { i =>
        (0 until w).map(k =>
          cps(i - 1 - k) * pows(k) % CdcBoundaries.Prime).sum %
          CdcBoundaries.Prime
      }
    }
    val rnd = new scala.util.Random(13)
    val texts = Seq("", "short text here", "sixteen chars ab",
      "é" * 40,                                    // 2-byte UTF-8
      new String(Character.toChars(0x1F600)) * 20, // non-BMP
      "a" * 300) ++
      (1 to 8).map(_ => (1 to 200 + rnd.nextInt(400))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    for (w <- Seq(16, 4); (t, id) <- texts.zipWithIndex) {
      val got = texts.zipWithIndex.map(p => (p._2.toLong, p._1))
        .toDF("doc_id", "text")
        .where(col("doc_id") === id)
        .select(graft.functions.TextExpressions
          .rolling_window_hashes(col("text"), w).as("hs"))
        .as[Seq[Long]].head()
      assert(got == closedForm(t, w),
        s"w=$w doc=$id: $got vs ${closedForm(t, w)}")
    }
  }

  test("repeated n-grams: cross-doc spans detected with exact interval-" +
      "union coverage; within-doc-only repeats excluded") {
    import spark.implicits._
    val S = "AAAABBBBCCCCDDDD"     // 16 chars shared by docs 1 & 2
    val R = "EEEEFFFFGGGGHHHHIIII" // 20 chars shared by docs 4 & 5
    val T = "JJJJKKKKLLLLMMMM"     // 16 chars repeated INSIDE doc 3 only
    val docs = Seq(
      (1L, S + "abcdefghijklmnopqrst"),
      (2L, "uvwxyz0123456789" + S),
      (3L, T + "nopq" + T),
      (4L, R + "rstuvwxyzabc"),
      (5L, "qrstuv0123wxyzab" + R),
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.repeatedNgramsOn(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toList
    // doc 1/2: exactly the one 16-char window S → 1 window, 16 chars.
    // doc 3: T recurs but only within doc 3 → no cross-doc signal.
    // doc 4/5: the 20-char span R = 5 overlapping windows; coverage is
    // the interval union 16 + 4·1 = 20, not 5·16.
    val expected = List(
      (1L, 21L, 1L, 16L), (2L, 17L, 1L, 16L), (3L, 21L, 0L, 0L),
      (4L, 17L, 5L, 20L), (5L, 21L, 5L, 20L))
    assert(got == expected, s"got $got")
  }

  test("bpe_train: greedy left merge on runs, total tie-break, merged " +
      "symbols pair in later rounds") {
    import spark.implicits._
    // vocabulary: "aaab" ×3, "abab" ×2, "cd" ×1.
    // Round 1 pair counts (all adjacent positions, weighted):
    //   (a,a): 2·3 = 6   (aaab has two a-a positions)
    //   (a,b): 1·3 + 2·2 = 7   <- argmax
    //   (b,a): 1·2 = 2, (c,d): 1
    // Merge ab (ONE replace pass; an occurrence whose leading
    // separator was consumed by the previous match defers):
    //   aaab -> a,a,ab ; abab -> ab,a,b (the second ab defers) ; cd
    // Round 2: (a,a): 3, (a,ab): 3, (ab,a): 2, (a,b): 2, (c,d): 1 —
    //   count tie between (a,a) and (a,ab) breaks on the RIGHT
    //   symbol: "a" < "ab" -> (a,a) wins.
    //   Merge: a,a,ab -> aa,ab ; ab,a,b unchanged (no a,a run)
    // Round 3: (aa,ab): 3, (ab,a): 2, (a,b): 2, (c,d): 1 -> (aa,ab) —
    //   a pair of two MERGED symbols, proving rounds compose.
    val docs = (Seq.fill(3)("aaab") ++ Seq.fill(2)("abab") ++ Seq("cd"))
      .map(w => s" $w ").mkString
    val got = graft.operators.CorpusBuild
      .bpeTrainOn(Seq(docs).toDF("text"))
      .orderBy("round")
      .as[(Long, String, String, Long)].collect().toList
    assert(got == List((1L, "a", "b", 7L), (2L, "a", "a", 3L),
      (3L, "aa", "ab", 3L)), s"merges: $got")
  }

  test("dedup_chunks: first occurrence keeps, corpus-wide, by (doc, idx)") {
    import spark.implicits._
    // "x" repeats WITHIN doc 1 (idx 0 keeps, idx 2 drops); "y" repeats
    // ACROSS docs (doc 1 keeps, doc 2 drops); "z" is unique.
    val chunks = Seq((1L, 0L, "x"), (1L, 1L, "y"), (1L, 2L, "x"),
      (2L, 0L, "y"), (2L, 1L, "z"))
      .toDF("doc_id", "chunk_idx", "chunk_text")
    val got = graft.operators.TextAnalysis.chunkDedupOn(chunks)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List((1L, 3L, 2L, 1L), (2L, 2L, 1L, 1L)),
      s"profiles: $got")
  }

  test("layout_zonemap: pruning is sound and non-trivial on sf data") {
    import spark.implicits._
    val zones = SparkEntry.queries("layout_zonemap")(spark, sf)
      .selectExpr("bucket", "n_rows", "min_nw", "max_nw", "overlaps",
        "n_match")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // soundness: a pruned zone (no range overlap) contains NO matches
    assert(zones.filter(_._5 == 0L).forall(_._6 == 0L),
      s"unsound prune: ${zones.filter(z => z._5 == 0L && z._6 > 0L).toList}")
    // the probe band must actually prune something AND keep something,
    // or the face degenerates to a vacuous census
    assert(zones.exists(_._5 == 0L), "no zone pruned — band too wide")
    assert(zones.exists(z => z._5 == 1L && z._6 > 0L),
      "no surviving zone has matches — band missed the data")
    // zones partition the table: every doc lands in exactly one zone
    val total = Tables.load(spark, sf, "documents").count()
    assert(zones.map(_._2).sum == total)
  }

  test("embed_outliers: exact 2-sigma flag on literal norms") {
    import spark.implicits._
    // nine vectors with n2 = 10^4 and one with n2 = 10^6: S = 1.09e6,
    // N*Q - S^2 = 8.82e12; the big vector's (N*n2 - S)^2 = 7.94e13
    // exceeds 4*8.82e12 = 3.53e13 -> flagged; the nine others'
    // (10*10^4 - S)^2 = 9.8e11 stays well under
    val emb = ((1L to 9L).map(i => (i, Array(0.1f))) :+
      (10L, Array(1.0f))).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.outliersOn(emb)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == ((1000000L, true)), s"big vector: $got")
    assert((1L to 9L).forall(got(_) == ((10000L, false))),
      s"inliers: $got")
  }

  test("ngrams_heavyhitters: the two-phase face emits EXACTLY the " +
      "guarantee region with exact counts") {
    import spark.implicits._
    val face = SparkEntry.queries("ngrams_heavyhitters")(spark, sf)
      .as[(String, Long)].collect().toMap
    val exactAll = Tables.load(spark, sf, "documents")
      .select(split(trim(col("text")), "\\s+").as("ws"))
      .select(explode(when(size(col("ws")) >= 2,
        transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat_ws(" ", element_at(col("ws"), i),
            element_at(col("ws"), i + 1)))).otherwise(array())).as("ngram"))
    val n = exactAll.count()
    val cap1 = graft.operators.CorpusBuild.HhCap + 1
    val expected = exactAll.groupBy("ngram").agg(count(lit(1)).as("f"))
      .filter(col("f") * cap1 > n)
      .as[(String, Long)].collect().toMap
    // MG guarantees every item with f > N/(cap+1) survives ANY
    // reduce/merge order, and the recount is exact — so the face must
    // equal the direct census of the guarantee region, set AND values
    assert(expected.nonEmpty, "testdata should contain heavy bigrams")
    assert(face == expected,
      s"missing=${expected.keySet -- face.keySet} " +
        s"extra=${face.keySet -- expected.keySet}")
  }

  test("ngrams_heavyhitters finds a dominant item in a skewed stream with a tight estimate") {
    import spark.implicits._
    // 5k copies of the hot item + 20k distinct cold items, 8 partitions:
    // N/(cap+1) ≈ 97, so the hot item MUST survive with est within slack
    val hot = Seq.fill(5000)("HOT")
    val cold = (1 to 20000).map(i => s"cold_$i")
    val ds = spark.sparkContext.parallelize(hot ++ cold, 8).toDS()
    val m = ds.select(
      new graft.functions.HeavyHittersAggregator(256).toColumn).head()
    val n = hot.size + cold.size
    val slack = n / 257
    assert(m.contains("HOT"), s"dominant item evicted: ${m.take(5)}")
    assert(m("HOT") <= 5000 && 5000 - m("HOT") <= slack, s"est=${m("HOT")}")
  }

  test("corpus_tfidf ranks at most k terms per doc, exactly k when enough terms") {
    val got = SparkEntry.queries("corpus_tfidf")(spark, sf)
    val per = got.groupBy("doc_id").count()
    assert(per.filter(col("count") > 3).isEmpty)
    assert(per.filter(col("count") === 3).count() > 0)
  }

  test("bigram LM: ppm model from corpus counts, occurrence-weighted doc score") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // corpus bigrams: "aab" → aa, ab; "ab" → ab. Prefix 'a' total = 3,
    // so p(aa) = 333333 ppm, p(ab) = 666666 ppm (integer div). Doc 1
    // scores (333333 + 666666) div 2 = 499999; doc 2 scores 666666.
    // Doc 3 is a single char: no bigrams, drops out by declaration.
    val docs = Seq((1L, "aab"), (2L, "ab"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmOn(docs)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((2L, 499999L)), 2L -> ((1L, 666666L))),
      s"scores: $got")
  }

  test("corpus_bpe_encode: corpus-wide alpha-token total equals the " +
      "compression curve's final point; OOV words cost one token each") {
    val enc = SparkEntry.queries("corpus_bpe_encode")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens")))
    assert(enc.nonEmpty)
    // independent OOV accounting from the raw corpus
    val oov = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("w").rlike("^[a-z]+$"), 0L).otherwise(1L))
        .as("n_oov"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // encode ≡ train: Σ_docs (n_tokens − n_oov) is Σ over alpha word
    // occurrences of their merged symbol count — exactly the curve's
    // round-BpeRounds total (vocab symbol count × word frequency)
    val alphaTotal = enc.map { case (id, _, nt) => nt - oov(id) }.sum
    val curveFinal = SparkEntry.queries("corpus_bpe_curve")(spark, sf)
      .filter(col("round") === 3L).collect()
      .head.getAs[Long]("total_symbols")
    assert(alphaTotal == curveFinal,
      s"encode total $alphaTotal != curve final $curveFinal")
    // a merge can only shrink: every doc costs at most its word-char
    // budget and at least one token per word
    enc.foreach { case (id, nw, nt) =>
      assert(nt >= nw, s"doc $id: $nt tokens < $nw words")
    }
  }
}
