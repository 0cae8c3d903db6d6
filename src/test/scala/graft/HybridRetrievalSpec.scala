package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HybridRetrieval

/** RRF fusion semantics on literal rank lists, plus the end-to-end shape
  * over the real tables (the value-level gate is the DuckDB oracle).
  */
class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  test("rrfFuse: both-list docs outrank single-list docs at equal ranks") {
    // doc 1 is rank 1 in both lists; doc 2 is rank 1 lexical-only;
    // doc 3 is rank 1 vector-only; doc 4 trails in both
    val lex = Seq((1L, 1L), (2L, 2L), (4L, 3L)).toDF("doc_id", "lex_rank")
    val vec = Seq((1L, 1L), (3L, 2L), (4L, 3L)).toDF("doc_id", "vec_rank")
    val out = HybridRetrieval.rrfFuse(lex, vec, 10)
      .select("doc_id", "rrf").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 2L, 3L))
    val byId = out.toMap
    // exact RRF arithmetic: 1/(60+r), summed, rounded to 6
    assert(byId(1L) == BigDecimal(1.0 / 61 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(byId(2L) == BigDecimal(1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // absent-list ranks surface as nulls, not zeros
    val row = HybridRetrieval.rrfFuse(lex, vec, 10)
      .filter(col("doc_id") === 2L).head()
    assert(!row.isNullAt(row.fieldIndex("lex_rank")))
    assert(row.isNullAt(row.fieldIndex("vec_rank")))
  }

  test("rrfFuse ties break by doc_id ascending") {
    val lex = Seq((7L, 1L), (5L, 2L)).toDF("doc_id", "lex_rank")
    val vec = Seq((9L, 1L), (3L, 2L)).toDF("doc_id", "vec_rank")
    // 7 and 9 tie (1/61), 5 and 3 tie (1/62): id breaks both ties
    val ids = HybridRetrieval.rrfFuse(lex, vec, 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(7L, 9L, 3L, 5L))
  }

  test("hybrid_rrf end-to-end: bounded lists, valid ranks, fused order") {
    val out = HybridRetrieval.queries("hybrid_rrf")(spark, sf)
      .select(col("doc_id"), col("rrf"), col("lex_rank"), col("vec_rank"))
      .collect()
    assert(out.length == 20)
    // every row is in at least one list, ranks within the list depth
    out.foreach { r =>
      val lexR = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val vecR = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(lexR.nonEmpty || vecR.nonEmpty)
      assert(lexR.forall(x => x >= 1 && x <= 50))
      assert(vecR.forall(x => x >= 1 && x <= 50))
    }
    // output is sorted by (rrf desc, doc_id asc)
    val key = out.map(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(key == key.sorted)
    // the query doc itself never appears in the vector leg
    assert(out.forall(r => r.isNullAt(3) || r.getLong(0) != 0L))
  }

  test("retrieval_ndcg_grouped: per-query rows cohere and the summary " +
      "row restates them") {
    val rows = HybridRetrieval.queries("retrieval_ndcg_grouped")(spark, sf)
      .collect().map(r => r.getAs[Long]("q_id") -> r).toMap
    val perQ = rows.filterNot(_._1 == -1L)
    assert(perQ.keySet == (0L until 10L).toSet, rows.keySet.toString)
    perQ.values.foreach { r =>
      val dcg = r.getAs[Long]("dcg_scaled")
      val idcg = r.getAs[Long]("idcg_scaled")
      val bp = r.getAs[Long]("ndcg_bp")
      // idcg is the prefix-table lookup at min(k, n_rel)
      val nRel = r.getAs[Long]("n_rel")
      assert(idcg ==
        HybridRetrieval.ndcgPrefix(math.min(10L, nRel).toInt), r.toString)
      // ndcg is a true ratio: dcg can never exceed ideal, bp in range
      assert(dcg >= 0L && dcg <= idcg, r.toString)
      assert(bp == (if (idcg > 0) dcg * 10000L / idcg else 0L), r.toString)
    }
    val sum = rows(-1L)
    assert(sum.getAs[Long]("dcg_scaled") ==
      perQ.values.map(_.getAs[Long]("dcg_scaled")).sum)
    assert(sum.getAs[Long]("n_rel") ==
      perQ.values.map(_.getAs[Long]("n_rel")).sum)
    // the macro mean is the integer mean of the per-query basis points
    assert(sum.getAs[Long]("ndcg_bp") ==
      perQ.values.map(_.getAs[Long]("ndcg_bp")).sum / perQ.size)
  }

  test("text_bm25_grouped: every query retrieves, self excluded, ranks " +
      "contiguous from 1") {
    val rows = graft.operators.TextAnalysis
      .queries("text_bm25_grouped")(spark, sf)
      .select("q_id", "doc_id", "rank", "bm25_scaled").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet, byQ.keySet.toString)
    byQ.foreach { case (q, rs) =>
      assert(rs.forall(_.getLong(1) != q), s"query $q retrieved itself")
      val ranks = rs.map(_.getLong(2)).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"query $q ranks: $ranks")
      assert(ranks.length <= 20)
      // ranks follow (score desc, doc_id asc)
      val ordered = rs.sortBy(_.getLong(2))
        .map(r => (-r.getLong(3), r.getLong(1))).toSeq
      assert(ordered == ordered.sorted, s"query $q order")
      // a query always shares terms with SOME doc on this corpus
      assert(rs.nonEmpty)
    }
  }

  test("hybrid_ndcg_grouped: summary restates per-query rows; fused " +
      "macro quality is sane next to vector-only") {
    val rows = HybridRetrieval.queries("hybrid_ndcg_grouped")(spark, sf)
      .collect().map(r => r.getAs[Long]("q_id") -> r).toMap
    val perQ = rows.filterNot(_._1 == -1L)
    assert(perQ.keySet == (0L until 10L).toSet, rows.keySet.toString)
    perQ.values.foreach { r =>
      val dcg = r.getAs[Long]("dcg_scaled")
      val idcg = r.getAs[Long]("idcg_scaled")
      assert(idcg == HybridRetrieval.ndcgPrefix(
        math.min(10L, r.getAs[Long]("n_rel")).toInt), r.toString)
      assert(dcg >= 0L && dcg <= idcg, r.toString)
      assert(r.getAs[Long]("ndcg_bp") ==
        (if (idcg > 0) dcg * 10000L / idcg else 0L), r.toString)
    }
    val sum = rows(-1L)
    assert(sum.getAs[Long]("dcg_scaled") ==
      perQ.values.map(_.getAs[Long]("dcg_scaled")).sum)
    assert(sum.getAs[Long]("ndcg_bp") ==
      perQ.values.map(_.getAs[Long]("ndcg_bp")).sum / perQ.size)
    // same corpus relevance totals as the vector-only grouped report
    val vecOnly = HybridRetrieval.queries("retrieval_ndcg_grouped")(spark, sf)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("n_rel"))
      .toMap
    perQ.foreach { case (q, r) =>
      assert(r.getAs[Long]("n_rel") == vecOnly(q), s"n_rel drift at $q")
    }
  }

  test("hybrid_rrf_sweep: all damping rows present; k=60 restates the " +
      "grouped face's macro summary") {
    val sweep = HybridRetrieval.queries("hybrid_rrf_sweep")(spark, sf)
      .collect().map(r => r.getAs[Long]("rrf_k") -> r).toMap
    assert(sweep.keySet == Set(10L, 30L, 60L, 120L), sweep.keySet.toString)
    val grouped = HybridRetrieval.queries("hybrid_ndcg_grouped")(spark, sf)
      .collect().map(r => r.getAs[Long]("q_id") -> r).toMap
    val summary = grouped(-1L)
    // k = 60 IS the grouped face's configuration — same fusion, same
    // grading, so the curve row and the summary row must agree exactly
    assert(sweep(60L).getAs[Long]("sum_dcg_scaled") ==
      summary.getAs[Long]("dcg_scaled"))
    assert(sweep(60L).getAs[Long]("macro_ndcg_bp") ==
      summary.getAs[Long]("ndcg_bp"))
  }

  test("hybrid_rerank: baseline column restates hybrid_ndcg_grouped; " +
      "summary is the macro mean of both rankings") {
    val rr = HybridRetrieval.queries("hybrid_rerank")(spark, sf)
      .collect().map(r => r.getAs[Long]("q_id") -> r).toMap
    val grouped = HybridRetrieval.queries("hybrid_ndcg_grouped")(spark, sf)
      .collect().map(r => r.getAs[Long]("q_id") -> r).toMap
    // the RRF baseline grades the SAME pool with the SAME k=60 fusion
    // and cutoff as the grouped face (TopK-truncation there can't touch
    // the top GroupK), so per query the columns must agree exactly
    grouped.keys.filter(_ >= 0).foreach { q =>
      assert(rr(q).getAs[Long]("rrf_ndcg_bp") ==
        grouped(q).getAs[Long]("ndcg_bp"),
        s"q=$q rerank baseline diverged from hybrid_ndcg_grouped")
    }
    val perQ = rr.filter(_._1 >= 0).values.toSeq
    val s2 = rr(-1L)
    assert(s2.getAs[Long]("rerank_ndcg_bp") ==
      perQ.map(_.getAs[Long]("rerank_ndcg_bp")).sum / perQ.size)
    assert(s2.getAs[Long]("rrf_ndcg_bp") ==
      perQ.map(_.getAs[Long]("rrf_ndcg_bp")).sum / perQ.size)
    assert(s2.getAs[Long]("delta_bp") ==
      s2.getAs[Long]("rerank_ndcg_bp") - s2.getAs[Long]("rrf_ndcg_bp"))
    // every per-query delta is the difference of its two columns
    perQ.foreach(r => assert(r.getAs[Long]("delta_bp") ==
      r.getAs[Long]("rerank_ndcg_bp") - r.getAs[Long]("rrf_ndcg_bp")))
  }

  test("embed_drift: one row per dimension, totals partition the corpus, " +
      "the L1 statistic is bounded by its scale") {
    val rows = SparkEntry.queries("embed_drift")(spark, sf).collect()
    val n = Tables.load(spark, sf, "embeddings").count()
    val dims = Tables.load(spark, sf, "embeddings")
      .selectExpr("size(embedding) AS d").head().getInt(0)
    assert(rows.length == dims, s"expected $dims dims, got ${rows.length}")
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[Long]("n_a_total"), r.getAs[Long]("n_b_total"))
      assert(ta + tb == n, s"halves must partition the corpus: $r")
      val l1 = r.getAs[Long]("l1_x_scaled")
      // TVD ≤ 1 ⟹ Σ|n_a·tb − n_b·ta| ≤ 2·ta·tb; max contrib ≤ sum
      assert(l1 >= 0 && l1 <= 2 * ta * tb, s"L1 out of range: $r")
      assert(r.getAs[Long]("max_bucket_contrib") <= l1, r.toString)
    }
  }

  test("hybrid_mmr: the distributed greedy trajectory equals an " +
      "in-memory MMR reference over the same pool and sims") {
    val out = HybridRetrieval.queries("hybrid_mmr")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("mmr_scaled"), r.getAs[Long]("pick_pos")))
    val poolRows = HybridRetrieval.mmrPool(spark, sf).collect()
    val pool = poolRows
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("rel_c"), r.getAs[Long]("r0"))).toMap
    // the pool's normalization columns must restate min-max over rel_i
    poolRows.groupBy(_.getAs[Long]("q_id")).values.foreach { g =>
      val rels = g.map(_.getAs[Long]("rel_i"))
      val (mn, r0) = (rels.min, math.max(rels.max - rels.min, 1L))
      g.foreach { r =>
        assert(r.getAs[Long]("rel_c") == (r.getAs[Long]("rel_i") - mn) * 10000L)
        assert(r.getAs[Long]("r0") == r0)
      }
    }
    val sims = HybridRetrieval.mmrSims(spark, sf,
        HybridRetrieval.mmrPool(spark, sf)).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("d2")) -> r.getAs[Long]("sim_i")).toMap
    // reference: per query, greedily pick argmax(7·rel_c − 3·maxsim·R0)
    // with the doc_id tie-break — plain Scala loops, no Spark
    val expected = pool.keys.map(_._1).toSeq.distinct.sorted.flatMap { q =>
      val cands = pool.keys.filter(_._1 == q).map(_._2).toSeq.sorted
      (1 to HybridRetrieval.MmrK).foldLeft(
          Seq.empty[(Long, Long, Long, Long)]) { (picked, k) =>
        val chosen = picked.map(_._2).toSet
        val best = cands.filterNot(chosen).map { d =>
          val mx = chosen.map(p => sims((q, d, p))).maxOption.getOrElse(0L)
          val (relC, r0) = pool((q, d))
          (HybridRetrieval.MmrLamN * relC -
            HybridRetrieval.MmrLamD * mx * r0, d)
        }.maxBy { case (s2, d) => (s2, -d) }
        picked :+ ((q, best._2, best._1, k.toLong))
      }
    }.toSet
    assert(out.length == expected.size, "row count diverged")
    assert(out.toSet == expected, "greedy trajectory diverged")
    // NOTE: marginal scores are NOT monotone along the picks — cosine
    // sims are signed, so a candidate anti-similar to the picked set
    // earns a bonus (−λ·mx > 0). Shape invariants instead:
    out.groupBy(_._1).values.foreach { g =>
      assert(g.length == HybridRetrieval.MmrK, s"short list: $g")
      assert(g.map(_._4).sorted.toSeq ==
        (1L to HybridRetrieval.MmrK).toSeq, g.toSeq)
      assert(g.map(_._2).distinct.length == g.length, s"dup pick: $g")
    }
  }

  test("hybrid_prf: one row per query plus macro; deltas and summary " +
      "restate the per-query columns; nDCG stays in basis-point range") {
    val rows = HybridRetrieval.queries("hybrid_prf")(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") -> r).toMap
    val perQ = rows.filter(_._1 >= 0).values.toSeq
    assert(perQ.size == 10 && rows.contains(-1L),
      s"expected 10 queries + summary, got ${rows.keySet}")
    (rows.values.toSeq :+ rows(-1L)).foreach { r =>
      val (p, b) = (r.getAs[Long]("prf_ndcg_bp"), r.getAs[Long]("base_ndcg_bp"))
      assert(p >= 0 && p <= 10000 && b >= 0 && b <= 10000, r.toString)
      assert(r.getAs[Long]("delta_bp") == p - b, r.toString)
    }
    val s2 = rows(-1L)
    assert(s2.getAs[Long]("prf_ndcg_bp") ==
      perQ.map(_.getAs[Long]("prf_ndcg_bp")).sum / perQ.size)
    assert(s2.getAs[Long]("base_ndcg_bp") ==
      perQ.map(_.getAs[Long]("base_ndcg_bp")).sum / perQ.size)
  }

  test("retrieval_triples: full pos x neg fan-out per query, labels " +
      "actually separate the roles, margins are consistent per pair") {
    val rows = HybridRetrieval.queries("retrieval_triples")(spark, sf)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("pos_id"),
        r.getAs[Long]("neg_id"), r.getAs[Long]("margin_scaled")))
    assert(rows.nonEmpty)
    val lbl = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    rows.groupBy(_._1).foreach { case (q, g) =>
      val (ps, ns) = (g.map(_._2).distinct, g.map(_._3).distinct)
      assert(ps.length <= HybridRetrieval.TripPos, s"q=$q pos overflow")
      assert(ns.length <= HybridRetrieval.TripNeg, s"q=$q neg overflow")
      assert(ps.intersect(ns).isEmpty, s"q=$q role overlap")
      assert(g.length == ps.length * ns.length, s"q=$q not a full cross")
      // positives share the query label; negatives never do
      ps.foreach(p => assert(lbl.get(p).contains(lbl(q)), s"q=$q pos $p"))
      ns.foreach(n => assert(!lbl.get(n).contains(lbl(q)), s"q=$q neg $n"))
      // margin(p1,n) − margin(p2,n) must be the same for every n —
      // margins decompose as pos_score − neg_score
      if (ps.length == 2) {
        val byPair = g.map(t => (t._2, t._3) -> t._4).toMap
        val diffs = ns.map(n => byPair((ps(0), n)) - byPair((ps(1), n)))
        assert(diffs.distinct.length == 1, s"q=$q inconsistent margins")
      }
    }
  }

  test("retrieval_qlm_ndcg: the report reproduces from the two public " +
      "ranking faces graded independently, summary row included") {
    import graft.operators.TextAnalysis
    val k = 10L
    val lbl = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    def legBp(rows: Array[(Long, Long, Long)]): Map[Long, Long] =
      rows.filter(_._3 <= k).groupBy(_._1).map { case (q, g) =>
        val dcg = g.filter(t => lbl.get(t._2).contains(lbl(q)))
          .map(t => HybridRetrieval.ndcgWeights(t._3.toInt - 1)).sum
        val nRel = lbl.count { case (id, l) => id != q && l == lbl(q) }
        val idcg = HybridRetrieval.ndcgPrefix(math.min(k, nRel).toInt)
        q -> (if (idcg > 0) dcg * 10000L / idcg else 0L)
      }
    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rank")))
    val qlmBp = legBp(ranks(TextAnalysis.queries("text_qlm_topk")(spark, sf)))
    val bmBp = legBp(ranks(
      TextAnalysis.queries("text_bm25_grouped")(spark, sf)))
    val report = HybridRetrieval.queries("retrieval_qlm_ndcg")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (0L until 10L).foreach { q =>
      val (ql, bm, dl) = report(q)
      assert(ql == qlmBp.getOrElse(q, 0L), s"q=$q qlm")
      assert(bm == bmBp.getOrElse(q, 0L), s"q=$q bm25")
      assert(dl == ql - bm, s"q=$q delta")
    }
    val (sq, sb, sd) = report(-1L)
    assert(sq == (0L until 10L).map(q => report(q)._1).sum / 10L)
    assert(sb == (0L until 10L).map(q => report(q)._2).sum / 10L)
    assert(sd == sq - sb)
  }

  test("text_qlm_topk: query 0's full top-10 matches an independent " +
      "driver-side Dirichlet QL recomputation, smoothing mass included") {
    import graft.operators.TextAnalysis
    val face = TextAnalysis.queries("text_qlm_topk")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rank"), r.getAs[Long]("ql_scaled")))
    assert(face.map(_._1).distinct.length == 10)
    face.foreach { case (q, doc, _, s) =>
      assert(doc != q, s"self-retrieval q=$q")
      assert(s > 0L, s"smoothing mass lost: q=$q doc=$doc scored $s")
    }
    // independent model: tokenize in plain Scala, fold in the same
    // fixed term order with the same IEEE ops
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val tf = docs.map { case (id, ws) =>
      id -> ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong } }
      .toMap
    val dl = docs.map { case (id, ws) => id -> ws.size.toLong }.toMap
    val total = dl.values.sum
    val cf = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val qTerms = tf(0L).toSeq.sortBy { case (t, n) => (-n, t) }
      .take(3).map(_._1).sorted
    val expected = docs.map(_._1).filter(_ != 0L).map { d =>
      val ql = qTerms.foldLeft(1.0) { (acc, t) =>
        acc * ((tf(d).getOrElse(t, 0L) * total + 200L * cf(t)).toDouble /
          ((dl(d) + 200L) * total).toDouble)
      }
      d -> math.floor(ql * 1e18).toLong
    }.sortBy { case (d, s) => (-s, d) }.take(10)
    val got = face.filter(_._1 == 0L).sortBy(_._3)
      .map(t => (t._2, t._4)).toSeq
    assert(got == expected.toSeq)
  }
}
