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

  val queries: Map[String, Q] = Map("corpus_build" -> corpus)

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

  val oracles: Map[String, String] = Map("corpus_build" -> corpusOracle)
}
