package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, StreamingQueries, TextAnalysis}

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

  test("text_index_compact: compacting every generation into one base " +
      "is invisible to the ranking — fold(compact(gens)) == fold(gens)") {
    val compacted = StreamingQueries.queries("text_index_compact")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    val maintained = StreamingQueries.queries("text_index_ivm")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    assert(compacted.length == maintained.length)
    assert(compacted.sameElements(maintained))
  }

  test("text_index_delete: tombstones + negative partials rank exactly " +
      "like a rebuild over the surviving documents") {
    import org.apache.spark.sql.functions._
    val deleted = StreamingQueries.queries("text_index_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    // from-scratch restatement over the surviving corpus, through the
    // identical scoring joins
    val docs = Tables.load(spark, sf, "documents")
      .filter(pmod(col("doc_id"), lit(StreamingQueries.TakedownMod)) =!=
        StreamingQueries.TakedownRem)
    val tok = docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val rebuilt = TextAnalysis.bm25GroupedRanked(
      TextAnalysis.bm25GroupedScoredFrom(tf, dl,
        tf.groupBy(col("term")).agg(count(lit(1)).as("df")),
        dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("total"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    assert(deleted.length == rebuilt.length)
    assert(deleted.sameElements(rebuilt))
    // no tombstoned doc survives anywhere in the ranking
    assert(deleted.forall(_._2 % StreamingQueries.TakedownMod !=
      StreamingQueries.TakedownRem))
  }

  test("dedup_index_delete / sim_index_delete: tombstoned stores read " +
      "exactly like the survivors' derivations; no victim survives") {
    import org.apache.spark.sql.functions._
    val M = StreamingQueries.TakedownMod
    val R = StreamingQueries.TakedownRem
    val pairs = StreamingQueries.queries("dedup_index_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.forall { case (a, b, _) => a % M != R && b % M != R })
    // the survivors' pairs are exactly the full index's pairs minus
    // those with a deleted endpoint (pairs are per-endpoint)
    val full = StreamingQueries.queries("dedup_index_ivm")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSet ==
      full.filter { case (a, b, _) => a % M != R && b % M != R }.toSet)
    val lists = StreamingQueries.queries("sim_index_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lists.forall(_._1 % M != R))
    // the frozen quantizer does NOT retrain: surviving assignments are
    // byte-identical to the undeleted index's
    val fullLists = StreamingQueries.queries("sim_index_ivm")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lists.toSet == fullLists.filter(_._1 % M != R).toSet)
  }

  test("stream_index_delete: a stream of takedown requests nets out " +
      "exactly like the one-shot deletion, row for row") {
    val streamed = StreamingQueries.queries("stream_index_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    val oneShot = StreamingQueries.queries("text_index_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    assert(streamed.length == oneShot.length)
    assert(streamed.sameElements(oneShot))
  }

  test("stream_gnav_insert: a stream of arrival batches folds into the " +
      "resident graph exactly like the one-shot insertion, row for row") {
    val streamed = StreamingQueries.queries("stream_gnav_insert")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).sorted
    val oneShot = SparkEntry.queries("sim_gnav_insert")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).sorted
    assert(streamed.length == oneShot.length)
    assert(streamed.sameElements(oneShot))
    // and the stream actually batched: every arrival appears exactly
    // once across the generations (edge-disjointness — the read-side
    // single re-cap is only sound because batches never collide)
    val M = graft.operators.Similarity.ClsArrMod
    val R = graft.operators.Similarity.ClsArrRem
    val arrivals = streamed.collect {
      case (a, _, _) if a % M == R => a }.distinct
    assert(arrivals.nonEmpty)
  }

  test("lifecycle capstone: the composed build->arrivals->takedown->" +
      "compact->arrivals replay lands each store on its isolated " +
      "lifecycle face's terminal state") {
    val M = StreamingQueries.TakedownMod
    val R = StreamingQueries.TakedownRem
    // the three rebuild-semantics stores must agree ROW FOR ROW with
    // the isolated one-shot deletion faces (both converge to
    // rebuild-without, through entirely different schedules — the
    // capstone's compaction and post-compaction arrivals must be
    // invisible)
    val lcText = StreamingQueries.queries("lifecycle_text")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    val oneText = StreamingQueries.queries("text_index_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    assert(lcText.length == oneText.length)
    assert(lcText.sameElements(oneText))
    val lcDedup = StreamingQueries.queries("lifecycle_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    val oneDedup = StreamingQueries.queries("dedup_index_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(lcDedup.length == oneDedup.length)
    assert(lcDedup.sameElements(oneDedup))
    val lcCc = StreamingQueries.queries("lifecycle_cc")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneCc = StreamingQueries.queries("dedup_cc_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lcCc == oneCc)
    // the graph store is path-dependent (its cross-engine gate is the
    // composed CTE replay) — assert the structural lifecycle
    // invariants: victims hard-removed, cap held, BOTH arrival waves
    // resident with at least their own connect surviving
    val adj = StreamingQueries.queries("lifecycle_gnav")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(adj.forall { case (a, b) => a % M != R && b % M != R })
    val deg = adj.groupBy(_._1).view.mapValues(_.length).toMap
    assert(deg.values.forall(_ <= 16))
    val AM = graft.operators.Similarity.ClsArrMod
    val AR = graft.operators.Similarity.ClsArrRem
    val waveA = deg.keys.filter(v => v % (2 * AM) == AR)
    val waveB = deg.keys.filter(v => v % (2 * AM) == AR + AM)
    assert(waveA.nonEmpty && waveB.nonEmpty)
    assert(waveA.forall(deg(_) >= 8) && waveB.forall(deg(_) >= 8))
  }

  test("streaming lifecycle capstone: the same composed cycle driven " +
      "through the real streaming doors lands every terminal store on " +
      "the batch capstone's, row for row") {
    // delivery must be immaterial: checkpointed micro-batches,
    // batch-id generation naming, the boundary takedown+compaction
    // inside foreachBatch, and the composed door denylists produce the
    // SAME terminal stores the batch capstone's direct calls do
    def rows4(name: String) = StreamingQueries.queries(name)(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    val st = rows4("lifecycle_stream_text")
    val bt = rows4("lifecycle_text")
    assert(st.length == bt.length)
    assert(st.sameElements(bt))
    def rows3(name: String) = StreamingQueries.queries(name)(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    val sd = rows3("lifecycle_stream_dedup")
    val bd = rows3("lifecycle_dedup")
    assert(sd.length == bd.length)
    assert(sd.sameElements(bd))
    val sc = StreamingQueries.queries("lifecycle_stream_cc")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bc = StreamingQueries.queries("lifecycle_cc")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sc == bc)
    // the graph is BIT-identical by construction: the same arrivals
    // walk the same frozen tiers, and the per-batch union commutes
    // with the one-shot walk — compare sims too
    val sg = StreamingQueries.queries("lifecycle_stream_gnav")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted
    val bg = StreamingQueries.queries("lifecycle_gnav")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted
    assert(sg.length == bg.length)
    assert(sg.sameElements(bg))
  }

  test("dedup_cc_delete: affected-components-only relabeling equals the " +
      "full recompute over every surviving pair; no victim survives") {
    import org.apache.spark.sql.functions._
    val M = StreamingQueries.TakedownMod
    val R = StreamingQueries.TakedownRem
    val face = StreamingQueries.queries("dedup_cc_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(face.forall { case (d, c) => d % M != R && c % M != R })
    // the survivors' pair graph is the from-scratch pair derivation
    // restricted to surviving endpoints (pairs are pairwise — deleting
    // a doc changes nobody else's shingles); CC over ALL of it must
    // equal the face's affected-only recompute
    val survPairs = Dedup.queries("dedup_minhash_verified")(spark, sf)
      .filter(pmod(col("a_id"), lit(M)) =!= R &&
        pmod(col("b_id"), lit(M)) =!= R)
      .select(col("a_id"), col("b_id"))
    val full = Dedup.connectedComponentsWithRounds(survPairs)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(face == full)
  }

  test("dedup_cc_takedown: interleaved arrivals and takedowns converge " +
      "to the one-shot deletion's labels, row for row") {
    val streamed = StreamingQueries.queries("dedup_cc_takedown")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = StreamingQueries.queries("dedup_cc_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == oneShot)
    val M = StreamingQueries.TakedownMod
    val R = StreamingQueries.TakedownRem
    assert(streamed.forall { case (d, c) => d % M != R && c % M != R })
  }

  test("dedup_cc_takedown: a takedown singleton re-labeled by a later " +
      "arrival survives the read-back (planted resurrection corpus)") {
    val s = spark
    import s.implicits._
    // ids 2, 13, 20 share one text: 2 and 13 are resident (first half
    // by rank), 20 arrives in the stream. The takedown at the batch-1
    // boundary deletes 13; if 20 has not arrived yet, 2 drops to a
    // tombstoned singleton and 20's arrival must RE-LABEL it — the
    // fresh row has to survive the chronological label fold (the
    // sf0.1 two-row regression this test pins). If 20 lands in batch
    // 0 the pair pre-exists the takedown and the affected re-cluster
    // covers it — either batch assignment must converge to the same
    // final labels.
    val dupText = (1 to 17).map(i => s"v$i").mkString(" ")
    val pairText = (1 to 12).map(i => s"u$i").mkString(" ")
    val docs = (1 to 26).map { i =>
      val text = i match {
        case 2 | 13 | 20 => dupText
        case 5 | 6 => pairText
        case _ => (1 to 12).map(j => s"x${i}_$j").mkString(" ")
      }
      i.toLong -> text
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cctd_spec_")
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val got = StreamingQueries.ccTakedownRaw(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(2L -> 2L, 20L -> 2L, 5L -> 5L, 6L -> 5L))
    // and the interleaved fold equals the one-shot artifact deletion
    // on the same corpus
    val oneShot = StreamingQueries.queries("dedup_cc_delete")(
        spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oneShot)
  }

  test("dedup_cc_takedown: a takedown that UNDOES a pre-boundary merge " +
      "must not resurrect the stale remap entry (planted merge-undo " +
      "corpus, one bridge per stream partition)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    // Three groups, each two exact-dup BASE pairs joinable only through
    // a victim bridge (17-word base text; each pair adds 2 words →
    // j(pair, bridge) = 15/17 ≥ 0.8 verifies, j(pairA, pairC) = 15/19
    // < 0.8 does not). The bridges are stream arrivals with victim ids
    // (≡ TakedownRem mod TakedownMod) chosen so the three of them hash
    // to the three distinct `repartition(3, doc_id)` partitions —
    // whichever file replays as batch 0, SOME bridge folds before the
    // boundary and merges its two base components (remap gains
    // cRoot -> aRoot). The takedown then deletes it: the re-clustered
    // C-pair re-anchors at cRoot, and a carried-forward remap entry
    // would re-resolve it into the A-pair's component (the
    // resurrection). Final labels must equal the never-merged base
    // labels for ALL groups, under every batch-order assignment.
    val M = StreamingQueries.TakedownMod
    val R = StreamingQueries.TakedownRem
    val groups = Seq(
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq(5L, 6L), Seq(9L, 10L)),
      (Seq(7L, 8L), Seq(11L, 12L)))
    val baseDocs = groups.zipWithIndex.flatMap { case ((pa, pc), k) =>
      val base = (1 to 17).map(i => s"g${k}w$i").mkString(" ")
      pa.map(_ -> (base + s" a${k}x a${k}y")) ++
        pc.map(_ -> (base + s" c${k}x c${k}y"))
    }
    // victim ids, one hashing to each stream partition (the planted
    // guarantee that a bridge folds pre-boundary regardless of the
    // file-mod-time batch order)
    val cands = (1 to 60).map(k => R + M * k).filter(_ > 12L)
    val byPart = cands.toDF("doc_id")
      .withColumn("p", pmod(hash(col("doc_id")), lit(3)))
      .collect().map(r => (r.getInt(1), r.getLong(0)))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).min }
    assert(byPart.keySet == Set(0, 1, 2),
      s"victim candidates must cover all 3 partitions, got $byPart")
    val bridges = byPart.values.toSeq.sorted.zipWithIndex.map {
      case (id, k) =>
        id -> (1 to 17).map(i => s"g${k}w$i").mkString(" ")
    }
    val fillers = (14L to 22L).map(i =>
      i -> (1 to 12).map(j => s"f${i}_$j").mkString(" "))
    assert(fillers.forall(_._1 % M != R))
    val docs = baseDocs ++ bridges ++ fillers // 12 base + 12 stream
    val dir = java.nio.file.Files.createTempDirectory("graft_cctdmu_")
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val got = StreamingQueries.ccTakedownRaw(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = groups.flatMap { case (pa, pc) =>
      pa.map(_ -> pa.min) ++ pc.map(_ -> pc.min)
    }.toSet
    assert(got == want)
    // and the interleaved fold equals the one-shot artifact deletion
    val oneShot = StreamingQueries.queries("dedup_cc_delete")(
        spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oneShot)
  }

  test("dedup_cc_delete: a deleted bridge SPLITS its component, a deleted " +
      "min-label re-anchors, and docs losing every partner drop") {
    val s = spark
    import s.implicits._
    // base 17 words (15 shingles); A/C add 2 words → 2 extra shingles:
    // j(A,B)=15/17≈0.88 and j(B,C) likewise verify (≥0.8), j(A,C)=15/19
    // ≈0.79 does not — B (doc 13, a victim) is the ONLY bridge
    val base = (1 to 17).map(i => s"w$i").mkString(" ")
    val textA = base + " a1 a2"
    val textC = base + " c1 c2"
    val textD = (1 to 12).map(i => s"d$i").mkString(" ")
    val textE = (1 to 12).map(i => s"e$i").mkString(" ")
    val docs = Seq(
      1L -> textA, 17L -> textA, // exact-dup pair, survives as {1,17}
      13L -> base, // the bridge — deleted (13 % 16 = 13)
      2L -> textC, // loses its only partner → drops
      3L -> textD, 4L -> textD, // untouched component, label kept
      29L -> textE, 30L -> textE, 31L -> textE) // min 29 deleted →
    // the surviving clique re-anchors at 30
    val dir = java.nio.file.Files.createTempDirectory("graft_ccdel_")
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    // pre-delete sanity: the bridge connects {1,17,13,2} into one
    // component — otherwise the split below proves nothing
    val before = Dedup.queries("dedup_components")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before == Set(1L -> 1L, 17L -> 1L, 13L -> 1L, 2L -> 1L,
      3L -> 3L, 4L -> 3L, 29L -> 29L, 30L -> 29L, 31L -> 29L))
    val after = StreamingQueries.queries("dedup_cc_delete")(
        spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == Set(1L -> 1L, 17L -> 1L, 3L -> 3L, 4L -> 3L,
      30L -> 30L, 31L -> 30L))
  }

  test("dedup_index_compact: compacting the signature generations into " +
      "one base derives the identical candidate-pair set") {
    val compacted = StreamingQueries.queries("dedup_index_compact")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val maintained = StreamingQueries.queries("dedup_index_ivm")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(compacted.length == maintained.length)
    assert(compacted.sameElements(maintained))
  }

  test("sim_index_compact: compacting the list generations into one base " +
      "reads the identical maintained lists") {
    val compacted = StreamingQueries.queries("sim_index_compact")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val maintained = StreamingQueries.queries("sim_index_ivm")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(compacted.length == maintained.length)
    assert(compacted.sameElements(maintained))
  }

  test("dedup_cc_compact: folds across a mid-replay compaction still " +
      "converge to the from-scratch clustering") {
    val compacted = StreamingQueries.queries("dedup_cc_compact")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val rebuilt = Dedup.queries("dedup_components")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(compacted.length == rebuilt.length)
    assert(compacted.sameElements(rebuilt))
  }

  test("dedup_cc_ivm: maintained labels == from-scratch clustering, " +
      "row for row") {
    val maintained = StreamingQueries.queries("dedup_cc_ivm")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val rebuilt = Dedup.queries("dedup_components")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(maintained.length == rebuilt.length)
    assert(maintained.sameElements(rebuilt))
  }

  test("ccIvmBatch: cross-batch merges re-point the compacted remap, " +
      "label rows are immutable and unique, replay is idempotent") {
    import spark.implicits._
    // ta-cliques merge DOWNWARD across batches (arriving ids 5 then 3
    // undercut the resident root 10), tb stays untouched, 'solo' has
    // no shingles and must never be labeled
    val ta = (1 to 10).map(i => s"a$i").mkString(" ")
    val tb = (1 to 10).map(i => s"b$i").mkString(" ")
    def docs(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("ccivm_spec_")
    Dedup.ccIvmBase(
      docs(10L -> ta, 11L -> ta, 20L -> tb, 21L -> tb, 30L -> "solo"),
      state)
    def rd(sub: String, gens: String*) =
      spark.read.parquet(gens.map(g => state.resolve(s"$sub/$g").toString): _*)
    val emptyRemap =
      spark.range(0).selectExpr("id AS old", "id AS root")
    Dedup.ccIvmBatch(docs(5L -> ta), rd("sh", "base"), rd("sig", "base"),
      rd("lbl", "base"), emptyRemap, rd("gk", "base"), state, "b00000")
    // batch 0 merged {10,11}+5 -> root 5: remap must hold 10 -> 5
    val remap0 = rd("remap", "b00000").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(remap0 == Map(10L -> 5L))
    def run1(): Unit = Dedup.ccIvmBatch(docs(3L -> ta),
      rd("sh", "base", "b00000"), rd("sig", "base", "b00000"),
      rd("lbl", "base", "b00000"), rd("remap", "b00000"),
      rd("gk", "base", "b00000"), state, "b00001")
    run1()
    val out1 = rd("lbl", "base", "b00000", "b00001").collect().toSet
    run1() // replay: per-gen overwrite must reproduce byte-equal state
    // batch 1 merged root 5 into 3: the stale 10 -> 5 entry re-points
    val remap1 = rd("remap", "b00001").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(remap1 == Map(10L -> 3L, 5L -> 3L))
    // compaction invariant: resolution is one hop — no value is a key
    assert(remap1.values.forall(v => !remap1.contains(v)))
    assert(rd("lbl", "base", "b00000", "b00001").collect().toSet == out1)
    // label rows are unique per doc and immutable (historical roots)
    val lblRows = rd("lbl", "base", "b00000", "b00001").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(lblRows.map(_._1).distinct.length == lblRows.length)
    val lbl = lblRows.toMap
    assert(lbl == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L,
      5L -> 5L, 3L -> 3L))
    // resolved through the final remap: the from-scratch components
    val resolved = lbl.view.mapValues(v => remap1.getOrElse(v, v)).toMap
    assert(resolved == Map(10L -> 3L, 11L -> 3L, 5L -> 3L, 3L -> 3L,
      20L -> 20L, 21L -> 20L))
    // contract enforcement: a doc re-delivered into a NEW generation
    // (at-least-once across generations) is dropped before signing —
    // no duplicate shingle/sig/label rows, remap untouched
    Dedup.ccIvmBatch(docs(5L -> ta, 40L -> "fresh f1 f2 f3"),
      rd("sh", "base", "b00000", "b00001"),
      rd("sig", "base", "b00000", "b00001"),
      rd("lbl", "base", "b00000", "b00001"),
      rd("remap", "b00001"),
      rd("gk", "base", "b00000", "b00001"), state, "b00002")
    val sh2Ids = rd("sh", "b00002").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(sh2Ids == Set(40L), "re-delivered doc 5 must not be re-signed")
    assert(rd("lbl", "b00002").count() == 0,
      "no new pairs: the fresh doc gets no label row, the dup none either")
    val remap2 = rd("remap", "b00002").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(remap2 == remap1, "re-delivery must not disturb the remap")
  }

  test("ccCompact: labels resolve to live roots, the remap resets, and " +
      "a fold against the compacted store equals the uncompacted fold") {
    import spark.implicits._
    val ta = (1 to 10).map(i => s"a$i").mkString(" ")
    val tb = (1 to 10).map(i => s"b$i").mkString(" ")
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("cccp_spec_")
    val cstate = state.resolve("compacted")
    Dedup.ccIvmBase(
      docs(10L -> ta, 11L -> ta, 20L -> tb, 21L -> tb, 30L -> "solo"),
      state)
    def rd(root: java.nio.file.Path, sub: String, gens: String*) =
      spark.read.parquet(gens.map(g => root.resolve(s"$sub/$g").toString): _*)
    val emptyRemap = spark.range(0).selectExpr("id AS old", "id AS root")
    // batch 0 merges {10,11} + 5 -> root 5 (remap: 10 -> 5)
    Dedup.ccIvmBatch(docs(5L -> ta), rd(state, "sh", "base"),
      rd(state, "sig", "base"), rd(state, "lbl", "base"),
      emptyRemap, rd(state, "gk", "base"), state, "b00000")
    // compact {base, b00000}: labels must come out RESOLVED (10's row
    // reads component 5, not its immutable historical root 10)
    def run(): Unit = Dedup.ccCompact(
      rd(state, "sh", "base", "b00000"), rd(state, "sig", "base", "b00000"),
      rd(state, "lbl", "base", "b00000"), rd(state, "remap", "b00000"),
      rd(state, "gk", "base", "b00000"), cstate)
    run()
    val cl1 = rd(cstate, "lbl", "base").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    run() // compaction is an idempotent overwrite
    assert(rd(cstate, "lbl", "base").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == cl1)
    assert(cl1 == Map(10L -> 5L, 11L -> 5L, 5L -> 5L, 20L -> 20L,
      21L -> 20L), "compacted labels must be live roots")
    // every compacted label is a root: no label is a remap key anymore
    assert(cl1.values.toSet.subsetOf(cl1.keySet))
    // store sizes carry over exactly (pure concatenation)
    assert(rd(cstate, "sh", "base").count() ==
      rd(state, "sh", "base", "b00000").count())
    assert(rd(cstate, "sig", "base").count() ==
      rd(state, "sig", "base", "b00000").count())
    // fold batch 1 against the COMPACTED store, remap starting empty —
    // arriving 3 undercuts root 5: resolved labels must equal the
    // uncompacted path's (the existing ccIvmBatch spec's expectation)
    Dedup.ccIvmBatch(docs(3L -> ta), rd(cstate, "sh", "base"),
      rd(cstate, "sig", "base"), rd(cstate, "lbl", "base"),
      emptyRemap, rd(cstate, "gk", "base"), cstate, "b00001")
    val remap1 = rd(cstate, "remap", "b00001").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(remap1 == Map(5L -> 3L),
      "post-compaction merge re-points the live root only — the " +
        "historical 10 -> 5 entry was retired by the compaction")
    val lbl = rd(cstate, "lbl", "base", "b00001").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val resolved = lbl.view.mapValues(v => remap1.getOrElse(v, v)).toMap
    assert(resolved == Map(10L -> 3L, 11L -> 3L, 5L -> 3L, 3L -> 3L,
      20L -> 20L, 21L -> 20L),
      "fold(compact(gens)) must equal fold(gens)")
  }

  test("stream_embed_drift: streaming frozen-reference fold == batch " +
      "frozen-reference computation, including edge-bucket clamping") {
    import org.apache.spark.sql.functions._
    val out = StreamingQueries.queries("stream_embed_drift")(spark, sf)
      .collect().map(r => r.getAs[Long]("i") ->
        (r.getAs[Long]("n_a_total"), r.getAs[Long]("n_b_total"),
          r.getAs[Long]("l1_x_scaled"), r.getAs[Long]("max_bucket_contrib")))
      .toMap
    // batch restatement of the SAME frozen-reference semantics
    val emb = Tables.load(spark, sf, "embeddings")
    val el = graft.operators.Similarity.sqElements(emb)
    val B = graft.operators.Similarity.DriftBuckets
    val rg = el.filter(pmod(col("vec_id"), lit(2)) === 0).groupBy(col("i"))
      .agg(min(col("xq")).as("mn"), max(col("xq")).as("mx"))
    val binned = el.join(broadcast(rg), Seq("i"))
      .withColumn("xqc", least(greatest(col("xq"), col("mn")), col("mx")))
      .withColumn("bucket", expr(s"((xqc - mn) * $B) div (mx - mn + 1)"))
    // arrivals may exceed the frozen range: the clamp must land them in
    // the edge buckets, never drop them — totals prove no row vanished
    val counts = binned.groupBy(col("i"), col("bucket"))
      .agg(sum(when(pmod(col("vec_id"), lit(2)) === 0, 1L).otherwise(0L))
        .as("n_a"),
        sum(when(pmod(col("vec_id"), lit(2)) === 1, 1L).otherwise(0L))
          .as("n_b"))
    val totals = counts.groupBy(col("i"))
      .agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    val expected = counts.join(totals, Seq("i"))
      .withColumn("contrib",
        abs(col("n_a") * col("tb") - col("n_b") * col("ta")))
      .groupBy(col("i"))
      .agg(min(col("ta")).as("ta"), min(col("tb")).as("tb"),
        sum(col("contrib")).as("l1"), max(col("contrib")).as("mx"))
      .collect().map(r => r.getAs[Long]("i") ->
        (r.getAs[Long]("ta"), r.getAs[Long]("tb"),
          r.getAs[Long]("l1"), r.getAs[Long]("mx")))
      .toMap
    assert(out == expected, "streaming fold diverged from batch frozen-ref")
    val nArr = emb.filter(pmod(col("vec_id"), lit(2)) === 1).count()
    val dims = emb.selectExpr("size(embedding) AS d").head().getInt(0)
    assert(out.values.map(_._2).sum == nArr * dims,
      "clamp dropped arriving elements")
  }

  test("ccIvmBaseFromShared: base labels from the resident slice of " +
      "the verified-pairs artifact == clusterSliceCollapsed over the " +
      "sliced tables (pair-locality)") {
    import org.apache.spark.sql.functions._
    val run = java.nio.file.Files.createTempDirectory("graft_ccbase_")
    val docs = Tables.load(spark, sf, "documents")
    // a split that is NOT the capstones' quartile split, so the pin is
    // about the subset algebra, not one schedule
    val ids = docs.filter(pmod(col("doc_id"), lit(3)) < 2)
      .select(col("doc_id"))
    operators.Dedup.ccIvmBaseFromShared(spark, sf, ids, run)
    val got = spark.read.parquet(run.resolve("lbl/base").toString)
    val shb = spark.read.parquet(run.resolve("sh/base").toString)
    val sigb = spark.read.parquet(run.resolve("sig/base").toString)
    val (ref, pins) = operators.Dedup.clusterSliceCollapsed(shb, sigb)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "sliced-artifact base labels diverged from the re-banded slice")
    pins.foreach(operators.Dedup.releaseCheckpoint)
  }

  test("textIndexBaseFromShared: the shared-tf base slice writes the " +
      "SAME four store frames as a fresh tokenize of the same ids") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
    val ids = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id"))
    val run = java.nio.file.Files.createTempDirectory("graft_tfslice_")
    StreamingQueries.textIndexBaseFromShared(spark, sf, ids,
      run.resolve("sliced"))
    StreamingQueries.textIndexGen(docs.join(ids, Seq("doc_id"),
      "left_semi"), run.resolve("fresh"), "base")
    for (sub <- Seq("post", "dl", "df", "st")) {
      val a = spark.read.parquet(
        run.resolve(s"sliced/$sub/base").toString)
      val b = spark.read.parquet(
        run.resolve(s"fresh/$sub/base").toString)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"frame $sub diverged between slice and fresh tokenize")
    }
    // and the derive-from-post tail itself: dl via SUM(tf) equals the
    // tokenize pipeline's per-doc token count
    val tok = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("term"))
    val dlRef = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dlGot = spark.read.parquet(
      run.resolve("sliced/dl/base").toString)
    assert(dlGot.exceptAll(dlRef).isEmpty && dlRef.exceptAll(dlGot).isEmpty,
      "dl = SUM(tf) diverged from the tokenize pipeline's count")
  }
}
