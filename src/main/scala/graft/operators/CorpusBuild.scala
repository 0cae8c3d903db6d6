package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{load => T}

/** The end-to-end training-corpus build — the composition a 100 TB data
  * pipeline actually ships, as ONE oracle-checked query instead of a
  * shelf of parts:
  *
  *   1. language gate — marker-based langid must say English;
  *   2. quality floor — at least 20 tokens AND a stopword ratio ≥ 5%
  *      (natural English text has stopwords; token-free or synthetic
  *      junk does not). The ratio is compared in INTEGER arithmetic
  *      (`20·n_stop ≥ n_words`), so both engines agree exactly, with no
  *      float-boundary risk;
  *   3. exact dedup — canonical fingerprint (lower-cased,
  *      whitespace-collapsed md5), keep the smallest doc_id per group,
  *      computed among gate SURVIVORS (a duplicate of a rejected doc is
  *      judged on its own merits);
  *   4. near-dup drop — any doc that is the GREATER endpoint of a
  *      verified MinHash pair (jaccard ≥ 0.8, the
  *      `dedup_minhash_verified` pipeline over the SHARED signature
  *      tables) is dropped: deterministic, one anti-join, no iterative
  *      connected components.
  *
  * Scale shape: steps 1-3 are one scan + one window over the
  * fingerprint groups; step 4 reuses the materialized shingle
  * /signature tables and lands as a broadcast-able anti-join of a
  * (tiny) pair list against the survivors. Nothing here is quadratic
  * and nothing re-scans `documents` beyond the single enrichment pass
  * plus the shared-table build it amortizes with every other dedup job.
  *
  * Output: the corpus manifest `(doc_id, n_words, fingerprint)` — what
  * a downstream tokenizer run consumes.
  */
object CorpusBuild {

  type Q = (SparkSession, String) => DataFrame

  private val MinWords = 20
  private val StopDenom = 20 // ratio floor 1/20 = 5%

  private val corpus: Q = (s, d) => {
    import TextAnalysis._
    val ws = words(col("text"))
    val nWords = size(ws).cast("long")
    val nStop = markerCount(ws, langMarkers.flatMap(_._2).distinct)
    val scores = langMarkers.map { case (l, m) => l -> markerCount(ws, m) }
    val enriched = T(s, d, "documents").select(
      col("doc_id"),
      nWords.as("n_words"),
      nStop.as("n_stop"),
      TextAnalysis.langGuessCol(scores).as("lang_guess"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))
        .cast("binary")).as("fingerprint"))
    val gated = enriched.filter(
      col("lang_guess") === "en" &&
        col("n_words") >= MinWords &&
        col("n_stop") * StopDenom >= col("n_words"))
    val exactKept = gated
      .withColumn("_keep",
        min(col("doc_id")).over(Window.partitionBy(col("fingerprint"))))
      .filter(col("doc_id") === col("_keep"))
    val nearDupLosers = Dedup.queries("dedup_minhash_verified")(s, d)
      .select(col("b_id").as("doc_id"))
    exactKept.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_words"), col("fingerprint"))
  }

  private val TopNgrams = 50

  /** Corpus bigram statistics: the top-[[TopNgrams]] most frequent word
    * 2-grams with a TOTAL tie-break order (count desc, then ngram), so
    * the cut at rank 50 is deterministic on both engines. One explode +
    * one count shuffle + a top-k sort of the (tiny) distinct-ngram
    * domain — corpus-size-independent output.
    */
  private val ngrams: Q = (s, d) => {
    val ws = TextAnalysis.words(col("text"))
    val grams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array())
    T(s, d, "documents")
      .select(explode(grams).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(TopNgrams)
  }

  private val EvalBoundary = 50 // doc_id < 50 plays the held-out eval set
  private val ContainFloor = 0.5

  /** Eval-set contamination check — the decontamination pass every
    * training pipeline runs before shipping a corpus: for each
    * "benchmark" document (doc_id < [[EvalBoundary]] stands in for the
    * held-out set), find training documents that CONTAIN it — shingle
    * containment |eval ∩ train| / |eval| ≥ [[ContainFloor]]. Asymmetric
    * on purpose: a training doc that merely embeds the eval text is
    * contamination even when Jaccard (symmetric) stays low because the
    * training doc is long.
    *
    * Reads the SHARED shingle table — the same materialization every
    * dedup job amortizes; the join is an equi-join on shingle with the
    * (tiny) eval side, so at 100 TB it is one shuffle of the eval
    * shingles against a pruned scan of the corpus shingles.
    */
  private val contamination: Q = (s, d) => {
    val sh = Dedup.sharedShingles(s, d)
    val eval = sh.filter(col("doc_id") < EvalBoundary)
      .select(col("doc_id").as("eval_id"), col("shingle"))
    val train = sh.filter(col("doc_id") >= EvalBoundary)
      .select(col("doc_id").as("train_id"), col("shingle"))
    val overlap = eval.join(train, Seq("shingle"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("overlap"))
    val evalSizes = eval.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("eval_n"))
    overlap.join(evalSizes, Seq("eval_id"))
      .withColumn("containment",
        col("overlap").cast("double") / col("eval_n"))
      .filter(col("containment") >= ContainFloor)
      .select(col("eval_id"), col("train_id"),
        round(col("containment"), 4).as("containment"))
  }

  val queries: Map[String, Q] = Map(
    "corpus_build" -> corpus,
    "corpus_ngrams" -> ngrams,
    "contamination_check" -> contamination)

  private val corpusOracle: String = {
    import TextAnalysis._
    val stops = sqlMarkerCount(langMarkers.flatMap(_._2).distinct)
    // the verified-pairs oracle embeds wholesale as a subquery (DuckDB
    // allows a WITH inside a derived table)
    val verified = Dedup.oracles("dedup_minhash_verified")
    s"""WITH enriched AS (
       |  SELECT doc_id,
       |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
       |    $stops AS n_stop,
       |    $langScoreColsSql,
       |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
       |  FROM documents),
       |lg AS (SELECT *, $langGuessSql AS lang_guess FROM enriched),
       |gated AS (SELECT * FROM lg
       |          WHERE lang_guess = 'en' AND n_words >= $MinWords
       |            AND n_stop * $StopDenom >= n_words),
       |exact AS (SELECT * FROM gated
       |          QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fingerprint)),
       |losers AS (SELECT b_id FROM ($verified) vp)
       |SELECT doc_id, n_words, fingerprint
       |FROM exact
       |WHERE doc_id NOT IN (SELECT b_id FROM losers)""".stripMargin
  }

  private val ngramsOracle: String =
    s"""WITH w AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws
       |           FROM documents),
       |g AS (SELECT ws[i] || ' ' || ws[i+1] AS ngram
       |      FROM w, unnest(generate_series(1, len(ws) - 1)) t(i))
       |SELECT ngram, count(*) AS n FROM g GROUP BY 1
       |ORDER BY n DESC, ngram LIMIT $TopNgrams""".stripMargin

  private val contaminationOracle: String =
    s"""WITH ${Dedup.shingleCteSql},
       |ev AS (SELECT doc_id AS eval_id, shingle FROM sh
       |       WHERE doc_id < $EvalBoundary),
       |tr AS (SELECT doc_id AS train_id, shingle FROM sh
       |       WHERE doc_id >= $EvalBoundary),
       |ov AS (SELECT eval_id, train_id, count(*) AS overlap
       |       FROM ev JOIN tr USING (shingle) GROUP BY 1, 2),
       |sz AS (SELECT eval_id, count(*) AS eval_n FROM ev GROUP BY 1)
       |SELECT eval_id, train_id,
       |  round(overlap * 1.0 / eval_n, 4) AS containment
       |FROM ov JOIN sz USING (eval_id)
       |WHERE overlap * 1.0 / eval_n >= $ContainFloor""".stripMargin

  val oracles: Map[String, String] = Map(
    "corpus_build" -> corpusOracle,
    "corpus_ngrams" -> ngramsOracle,
    "contamination_check" -> contaminationOracle)
}
