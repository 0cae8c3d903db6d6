package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{load => T}

/** Text-analysis operators for training-data pipelines (north-star Ext3):
  * token counting, quality scoring, language identification and document
  * fingerprinting over the `documents` table.
  *
  * Everything is built from codegen'd string/array built-ins — a single
  * scan, no shuffle at all (fully map-side): the ideal 100 TB shape.
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  private[operators] def words(c: Column): Column = split(trim(c), "\\s+")

  /** Stopword-ish marker sets per language for the n-gram/stopword
    * heuristic language ID. Deterministic tie-break: priority order below.
    */
  private[operators] val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
  )

  private[operators] def markerCount(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isin(markers.map(lit): _*))).cast("long")

  /** Token count: whitespace tokenization (the BPE-ish regex variant is
    * [[tokenCountRegex]] in the Scala API; same shape, different splitter).
    */
  private val tokenCount: Q = (s, d) =>
    T(s, d, "documents").select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_computed"))

  /** Quality scoring: length stats + stopword ratio. All ratios are exact
    * rationals of integer counts, so cross-engine double equality holds.
    */
  private val quality: Q = (s, d) => {
    val ws = words(col("text"))
    val nWords = size(ws).cast("long")
    val nStop = markerCount(ws, langMarkers.flatMap(_._2).distinct)
    val nNonSpace = length(regexp_replace(col("text"), "\\s", ""))
      .cast("long")
    T(s, d, "documents").select(
      col("doc_id"),
      nWords.as("n_words"),
      nStop.as("n_stopwords"),
      round(nStop.cast("double") / nWords, 4).as("stop_ratio"),
      round(nNonSpace.cast("double") / nWords, 4).as("avg_word_len"))
  }

  /** Classifier weights for [[qualityClassifier]] — small integers over
    * basis-point ratio features, the distilled shape of a
    * fasttext-style quality filter (CCNet/Gopher-rule lineage): natural
    * stopword density up-weights, digit- and punctuation-heavy text
    * down-weights, length contributes capped (so a 10⁶-word doc can't
    * buy its way past a digit wall). Frozen literals on BOTH SQL
    * surfaces — a trained model ships its weights the same way.
    */
  private val QcBias = -2000L
  private val QcWStop = 3L
  private val QcWDigit = -4L
  private val QcWPunct = -2L
  private val QcWLen = 5L
  private val QcLenCap = 400L
  private val QcKeepBp = 5000L

  /** TEXT-QUALITY LINEAR CLASSIFIER — the model-based curation face
    * next to the rule-based `corpus_quality_gate`: per doc, exact
    * integer basis-point features (stopword ratio, digit ratio,
    * punctuation ratio, capped length), a frozen integer weight vector,
    * and a HARD-SIGMOID calibration `p_bp = clamp(5000 + score/4,
    * 0, 10⁴)` (the piecewise-linear sigmoid — exact in integers, where
    * a float logistic would hash-diverge cross-engine in the last ulp).
    * Emits `(doc_id, score_scaled, p_bp, kept)` — the classifier IS a
    * hash gate: reweighting or a feature drift fails correctness, not
    * a dashboard. The negative-score branch sign-splits the integer
    * division (Spark truncating `div` ≡ DuckDB flooring `//` only on
    * nonnegative numerators — the pqLloydStep rule).
    *
    * Scale shape: one scan, per-row expressions only (regexp counts +
    * arithmetic), no shuffle at all — the cheapest possible 100 TB
    * pass, exactly why production curation runs linear filters first.
    */
  private val qualityClassifier: Q = (s, d) =>
    qualityClassifierOn(T(s, d, "documents"))

  /** The classifier over ANY documents frame — `private[operators]` so
    * the ingest-time streaming twin (`stream_quality_gate`) scores each
    * arriving micro-batch through the IDENTICAL per-row expressions
    * (frozen weights, exact integer features): the stream-static
    * confluence is about where rows arrive from, not a reimplemented
    * scorer. Per-row only — valid on a streaming frame as-is.
    */
  private[operators] def qualityClassifierOn(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val feats = docs.select(
      col("doc_id"),
      size(ws).cast("long").as("n_words"),
      markerCount(ws, langMarkers.flatMap(_._2).distinct).as("n_stop"),
      length(regexp_replace(col("text"), "\\s", ""))
        .cast("long").as("n_nonspace"),
      length(regexp_replace(col("text"), "[^0-9]", ""))
        .cast("long").as("n_digits"),
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
        .cast("long").as("n_punct"))
    feats
      .withColumn("score_scaled", expr(
        s"""$QcBias + $QcWStop * ((n_stop * 10000) div n_words)
           | + ($QcWDigit) * ((n_digits * 10000) div greatest(n_nonspace, 1))
           | + ($QcWPunct) * ((n_punct * 10000) div greatest(n_nonspace, 1))
           | + $QcWLen * least(n_words, $QcLenCap)""".stripMargin))
      .withColumn("p_bp", expr(
        """least(greatest(5000 + (CASE WHEN score_scaled >= 0
          |  THEN score_scaled div 4
          |  ELSE -((-score_scaled) div 4) END), 0), 10000)""".stripMargin))
      .select(col("doc_id"), col("score_scaled"), col("p_bp"),
        when(col("p_bp") >= QcKeepBp, 1L).otherwise(0L).as("kept"))
  }
  /** Argmax with fixed priority order on ties: a later language wins
    * only on a STRICTLY greater score than the running max of earlier
    * ones — shared by the langid query and the corpus-build gate.
    */
  private[operators] def langGuessCol(scores: Seq[(String, Column)]): Column =
    scores.tail.foldLeft[Column](lit(scores.head._1)) {
      case (acc, (l, sc)) =>
        // l wins only if strictly greater than all earlier scores
        when(scores.takeWhile(_._1 != l).map(_._2).reduce(greatest(_, _)) < sc,
          lit(l)).otherwise(acc)
    }

  private val langid: Q = (s, d) => {
    val ws = words(col("text"))
    val scores = langMarkers.map { case (l, m) => l -> markerCount(ws, m) }
    val best = langGuessCol(scores)
    T(s, d, "documents").select(
      col("doc_id") +:
        (scores.map { case (l, sc) => sc.as(s"score_$l") } :+
          best.as("lang_guess")): _*)
  }

  /** Confusion matrix of the langid heuristic against the corpus's
    * `lang` ground-truth column — the MODEL-EVAL report every
    * classifier in a pipeline owes its operators (precision/recall per
    * language derive from the integer cells). One scan + one tiny
    * (langs²-bounded) aggregation; scales as a pure map-side-combinable
    * count however big the corpus grows.
    */
  private val langidConfusion: Q = (s, d) => {
    val ws = words(col("text"))
    val scores = langMarkers.map { case (l, m) => l -> markerCount(ws, m) }
    T(s, d, "documents")
      .select(col("lang"), langGuessCol(scores).as("lang_guess"))
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
  }

  /** Stopword removal: the cleaned-text transform of a training
    * pipeline — tokens minus the marker stopword set, rejoined.
    */
  private val stopwordRemoval: Q = (s, d) => {
    val stops = langMarkers.flatMap(_._2).distinct
    T(s, d, "documents").select(
      col("doc_id"),
      concat_ws(" ",
        filter(words(col("text")), w => !w.isin(stops.map(lit): _*)))
        .as("clean_text"))
  }

  /** Document fingerprint: md5 of the canonical form (lower-cased,
    * whitespace-collapsed). Robust to case/spacing-only edits.
    */
  private val fingerprint: Q = (s, d) =>
    T(s, d, "documents").select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))
        .cast("binary")).as("fingerprint"))

  /** BPE-ish pre-tokenization (word / number / symbol runs) — the regex
    * split a byte-pair tokenizer applies before merges. Counts both token
    * classes; the whitespace variant above is the cheap path.
    */
  private val tokenBpe: Q = (s, d) => {
    val toks = regexp_extract_all(col("text"),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
    T(s, d, "documents").select(
      col("doc_id"),
      size(toks).cast("long").as("n_bpe_tokens"),
      size(filter(toks, t => t.rlike("^[0-9]+$"))).cast("long")
        .as("n_number_tokens"))
  }

  // PII patterns shared by the Spark query and the DuckDB oracle: plain
  // strings (no interpolator escape surprises), no lookaround — Java
  // regex and RE2 agree on these. Masking order matters: emails first
  // (they contain dots and digits), then IPs, then bare phone shapes.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val PhoneRe = "\\b[0-9]{3}-[0-9]{3,}\\b"

  /** PII scrubbing — the redaction pass every training-data pipeline runs
    * before text lands in a corpus. The synthetic `documents` table
    * carries no PII, so the query first appends a deterministic
    * doc_id-derived contact block (same construction in the oracle) and
    * then masks it: the hash check proves Spark's and DuckDB's regex
    * engines agree on the masking semantics, non-trivially on every row.
    * Single scan, zero shuffle, all codegen'd built-ins.
    */
  private val piiMask: Q = (s, d) =>
    T(s, d, "documents")
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com ph 555-01"), col("doc_id"),
          lit(" host 10.0."), pmod(col("doc_id"), lit(256)), lit(".7"))
          .as("raw"))
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("raw"), lit(EmailRe), lit("<EMAIL>")),
            lit(IpRe), lit("<IP>")),
          lit(PhoneRe), lit("<PHONE>")).as("masked"))

  private val ChunkSize = 32
  private val ChunkStep = 24 // 8-word overlap between consecutive chunks

  /** Sliding-window document chunking — the splitter every LLM corpus
    * build runs before tokenization: fixed-size word windows with
    * overlap, the final (possibly short) chunk kept. Pure generator
    * shape: one scan, explode, no shuffle; chunk boundaries are
    * deterministic functions of the word array, so the DuckDB oracle
    * reproduces them exactly (Spark `slice` and DuckDB list slicing are
    * both 1-based and clamp at the end).
    */
  /** The exploded chunk frame `(doc_id, chunk_idx, chunk_text)` —
    * shared by the chunking query and [[chunkDedup]].
    */
  private def chunkFrame(s: SparkSession, d: String): DataFrame =
    T(s, d, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(floor((size(ws) - 1) / $ChunkStep) AS INT)), " +
          s"i -> concat_ws(' ', slice(ws, i * $ChunkStep + 1, $ChunkSize)))"))
        .as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_text"))

  private val chunking: Q = (s, d) => chunkFrame(s, d)

  /** C4-style CHUNK-GRANULARITY dedup accounting — across the whole
    * corpus, a chunk text occurring in several places is KEPT only at
    * its first occurrence (smallest `(doc_id, chunk_idx)`) and counted
    * dropped everywhere else; the per-doc `(n_chunks, n_kept,
    * n_dropped)` profile is the sub-document dedup report (document-
    * level minhash blurs partial copies; this is the exact
    * chunk-level account that C4/RefinedWeb-style pipelines act on).
    *
    * Scale shape: the global first-occurrence rank shuffles on the
    * chunk's 128-bit MD5 FINGERPRINT, projected BEFORE the exchange —
    * the chunk text itself never moves (at 100 TB the text dominates
    * bytes; the fingerprint is 16 bytes regardless of chunk size).
    * The rank itself is deterministic: identical texts have identical
    * fingerprints, and the (doc_id, chunk_idx) order within a
    * fingerprint is a total order. One more map-side-combinable
    * group-by on doc_id folds the flags back to the doc profile.
    */
  private val chunkDedup: Q = (s, d) => chunkDedupOn(chunkFrame(s, d))

  /** The dedup-accounting body on an arbitrary `(doc_id, chunk_idx,
    * chunk_text)` frame — split out so first-occurrence semantics are
    * testable on literal chunk layouts.
    */
  private[graft] def chunkDedupOn(chunks: DataFrame): DataFrame = {
    val byFp = Window.partitionBy(col("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunks
      .select(col("doc_id"), col("chunk_idx"), md5(col("chunk_text")).as("fp"))
      .withColumn("rk", row_number().over(byFp))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        (col("n_chunks") - col("n_kept")).as("n_dropped"))
  }

  private val CdcWindow = 8 // rolling-window width (chars)
  private val CdcMask = 32L // boundary when window-hash % mask == 0

  /** CONTENT-DEFINED chunking (the rsync/LBFS/CDC idea): a chunk
    * boundary falls wherever the hash of the trailing [[CdcWindow]]
    * chars hits `≡ 0 (mod CdcMask)` — so boundaries are a function of
    * LOCAL CONTENT, not position. Insert a sentence into a document and
    * only the chunks touching the edit change; every fixed-window
    * scheme ([[chunkFrame]]) shifts every later chunk and loses all
    * downstream matches. That shift-robustness is why dedup over
    * near-identical scraped/revisioned pages chunks this way. The
    * boundary test is the Rabin-Karp polynomial hash of the window mod
    * a Mersenne prime, computed by the native
    * [[graft.functions.CdcBoundaries]] expression as ONE O(len) rolling
    * pass per document (one multiply/add/subtract/mod per position —
    * this replaced a per-position md5-prefix digest, ~50× the
    * arithmetic); bit-reproducible in ANY engine because the closed
    * form is 8 exact-int64 multiply-adds the DuckDB oracle states
    * verbatim with the same `B^k mod P` constants.
    *
    * Scale shape: pure map-side per document (position lambda → filter
    * → slice); the only shuffle is the downstream accounting's
    * fingerprint window, identical to `dedup_chunks`.
    */
  private def cdcChunkFrame(s: SparkSession, d: String): DataFrame =
    cdcChunksOn(T(s, d, "documents"))

  /** The chunker body on an arbitrary `(doc_id, text)` frame — split
    * out so the shift-robustness contract is testable on literal edits.
    */
  private[graft] def cdcChunksOn(docs: DataFrame): DataFrame = {
    val len = length(col("text"))
    val bs = concat(
      array(lit(0)),
      graft.functions.TextExpressions.cdc_boundaries(
        col("text"), CdcWindow, CdcMask),
      array(len))
    val chunks = filter(
      transform(sequence(lit(0), size(col("bs")) - 2),
        k => col("text").substr(element_at(col("bs"), k + 1) + 1,
          element_at(col("bs"), k + 2) - element_at(col("bs"), k + 1))),
      c => length(c) > 0)
    docs
      .select(col("doc_id"), col("text"), bs.as("bs"))
      .select(col("doc_id"), posexplode(chunks))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"))
  }

  private val cdcChunkDedup: Q = (s, d) => chunkDedupOn(cdcChunkFrame(s, d))

  /** Sliding-window width for cross-document repeated-n-gram detection —
    * the character-level proxy for Lee et al.'s 50-token span threshold,
    * sized so the sf corpora still carry plenty of true repeats.
    */
  private[operators] val RepWindow = 16

  /** Cross-document repeated n-grams — the substring-level dedup signal
    * of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    * Models Better"): a window of text that reappears verbatim in ANY
    * other document is memorization fuel, even when no whole document
    * or chunk is a near-dup. Per document: how many of its
    * [[RepWindow]]-char sliding windows also occur in at least one
    * OTHER document, and how many characters those windows cover (union
    * of overlapping spans, exact integer via the sorted-gap identity
    * `Σ min(W, start − prev_start)`).
    *
    * Scale shape (the reason this is NOT one groupBy on the window
    * strings): phase 1 groups the 8-byte rolling hashes
    * ([[graft.functions.RollingWindowHashes]], one O(len) map-side pass
    * per doc) — at 100 TB the overwhelmingly-unique keys shuffle as
    * longs, not W-char strings, and `min(doc) < max(doc)` decides
    * "≥ 2 distinct docs" with partial-aggregable min/max only. Phase 2
    * re-extracts the window TEXT solely for the surviving candidates
    * (hash → content verification, so a mod-P collision can never
    * fabricate a duplicate) and regroups those few by content. The
    * coverage fold is one per-doc sort — the same shape as sessionize.
    */
  private[graft] def repeatedNgramsOn(docs: DataFrame): DataFrame = {
    // pinned: referenced by the candidate aggregate AND the position
    // re-join — unpinned, the rolling-hash explode re-runs per reference
    val wins = Dedup.materialize(docs
      .select(col("doc_id"),
        posexplode(graft.functions.TextExpressions
          .rolling_window_hashes(col("text"), RepWindow)))
      .select(col("doc_id"), (col("pos") + 1).as("start"), col("col").as("h")))
    val cand = wins.groupBy("h")
      .agg(min("doc_id").as("dmin"), max("doc_id").as("dmax"))
      .where(col("dmin") < col("dmax"))
      .select("h")
    val candPos = wins.join(cand, "h").select("doc_id", "start")
    // pinned: feeds both the content grouping and the duplicate-position
    // join below
    val candWins = Dedup.materialize(candPos.groupBy("doc_id")
      .agg(collect_list("start").as("starts"))
      .join(docs.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), explode(transform(col("starts"),
        p => struct(p.as("start"),
          col("text").substr(p, lit(RepWindow)).as("win")))).as("sw"))
      .select(col("doc_id"), col("sw.start").as("start"),
        col("sw.win").as("win")))
    val dupKeys = candWins.groupBy("win")
      .agg(min("doc_id").as("dmin"), max("doc_id").as("dmax"))
      .where(col("dmin") < col("dmax"))
      .select("win")
    val dupPos = candWins.join(dupKeys, "win").select("doc_id", "start")
    val byDoc = Window.partitionBy("doc_id").orderBy("start")
    val cov = dupPos
      .withColumn("contrib", least(lit(RepWindow),
        coalesce(col("start") - lag("start", 1).over(byDoc),
          lit(RepWindow))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_windows"),
        sum("contrib").cast("long").as("dup_chars"))
    docs.select(col("doc_id"),
        greatest(length(col("text")) - (RepWindow - 1), lit(0))
          .cast("long").as("n_windows"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
  }

  private val repeatedNgrams: Q = (s, d) =>
    repeatedNgramsOn(T(s, d, "documents"))

  /** The oracle-side closed form of [[graft.functions.CdcBoundaries]]'
    * rolling hash: `Σ_{k=0}^{W−1} c(i−k)·(B^k mod P)` with the `B^k mod
    * P` literals generated from the expression's own constants, so the
    * two engines cannot drift. Each term ≤ 0x10FFFF·(P−1) ≈ 2.3e15 and
    * the 8-term sum ≈ 1.9e16 — exact in int64 on both engines.
    */
  private def cdcWindowHashSql: String = {
    val pows = graft.functions.CdcBoundaries.powers(CdcWindow)
    (0 until CdcWindow).map(k =>
      s"CAST(unicode(substr(text, i - $k, 1)) AS BIGINT) * ${pows(k)}")
      .mkString(" + ")
  }

  private val Bm25Terms = Seq("spark", "merge", "window")
  private val Bm25TopK = 20

  /** BM25 ranked retrieval for a fixed term query — the keyword-search
    * face of the corpus (tfidf's ranked sibling; what a contamination
    * triage or RAG keyword fallback runs over 100 TB of documents).
    *
    * Cross-engine float parity drives the formula's form: standard BM25
    * (k1 = 1.2, b = 0.75) with the log of the idf odds REPLACED by the
    * exact odds ratio (N - df + ½)/(df + ½) — a per-term monotone
    * transform, so per-term ordering is preserved while every score
    * stays an exact-integer ratio: numerator and denominator are built
    * in int64 (both sides scaled by 10·total to clear the k1/b
    * rationals), and the ONLY float ops are one IEEE division per term
    * plus a fixed-order sum — bit-identical in any IEEE-754 engine,
    * unlike `ln`, whose libm rounding differs across engines. (At
    * corpus scales where 22·tf·total overflows int64, compute the same
    * ratio in doubles from the start — ranking tolerates the ulp.)
    *
    * Scale shape: ONE token scan + per-doc conditional counts (map-side
    * combinable), corpus stats as a broadcast single-row build (the
    * governance-allowlisted 1-row nested loop), and a global top-k that
    * plans as TakeOrdered — per-partition k, never a full sort.
    */
  private val bm25: Q = (s, d) =>
    bm25Scored(s, d)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(Bm25TopK)

  /** Query-set size and score scale for [[bm25GroupedScored]]. */
  private[operators] val Bm25GroupQueries = 10L
  private[operators] val Bm25GroupScale = 10000L

  /** QUERY-SET BM25 — the fixed-term face generalized to real queries:
    * each of the standing 10 query DOCUMENTS retrieves with its OWN
    * term set, scored by the same odds-ratio BM25 (k1 = 1.2, b = 0.75)
    * against the whole corpus. This is the inverted-index shape proper:
    * per-(doc, term) tf and per-term df come from ONE token scan (the
    * posting lists a 100 TB search tier materializes), query terms
    * reach candidates by a term EQUI-join — fan-out per query is its
    * posting sizes, never the corpus — and the per-(query, doc) score
    * collapses map-side.
    *
    * Determinism without a fixed column order: the fixed-term face sums
    * three literal columns left-to-right; an arbitrary term SET has no
    * such order, and a float sum over a group is order-nondeterministic
    * under parallel aggregation. So each term's odds-ratio score is an
    * EXACT INTEGER — `(num·10⁴) div den`, both sides int64-positive at
    * test scales (the (2n−2df+1)·22·tf·total·10⁴ product peaks ≈ 8·10¹⁷
    * at sf0.1; at corpus scales past int64 the same ratio runs in
    * DECIMAL(38,0)) — and the per-pair sum of integers is
    * order-independent on any engine. Emits `(q_id, doc_id,
    * bm25_scaled)`, self excluded.
    */
  /** The inverted-index frames one token scan yields — per-(doc, term)
    * tf, per-doc length, per-term df, and the single-row corpus stats.
    * Shared by [[bm25GroupedScored]] and [[HybridRetrieval]]'s
    * query-expansion face (which needs the raw postings to mine and
    * re-score expansion terms without a second token scan).
    */
  private[graft] def bm25Postings(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val tok = T(s, d, "documents")
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("total"))
    (tf, dl, df, stats)
  }

  /** One term's exact-integer odds-ratio BM25 contribution — the `div`
    * keeps Spark ≡ DuckDB `//` on the nonnegative operands.
    */
  private[operators] def bm25TermScore: Column = expr(
    s"((2*n - 2*df + 1) * 22 * tf * total * $Bm25GroupScale) div " +
      "((2*df + 1) * (10*tf*total + 3*total + 9*dl*n))")

  private[operators] def bm25GroupedScored(s: SparkSession, d: String)
      : DataFrame = {
    val (tf, dl, df, stats) = bm25Postings(s, d)
    bm25GroupedScoredFrom(tf, dl, df, stats)
  }

  /** [[bm25GroupedScored]] over CALLER-SUPPLIED index frames — the
    * scoring joins alone, so a maintained (IVM) index can rank with the
    * exact code the from-scratch build uses
    * ([[StreamingQueries]]'s `text_index_ivm`).
    */
  private[graft] def bm25GroupedScoredFrom(tf: DataFrame, dl: DataFrame,
      df: DataFrame, stats: DataFrame): DataFrame = {
    val qt = tf.filter(col("doc_id") < Bm25GroupQueries)
      .select(col("doc_id").as("q_id"), col("term"))
    qt.join(tf, Seq("term"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(df, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("ts", bm25TermScore)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("ts")).as("bm25_scaled"))
  }

  /** The top-[[Bm25TopK]] cut per query by `(bm25_scaled desc, doc_id)`
    * — a total order on exact integers, so the cut is hash-stable.
    * Shared by the registry face and the maintained-index twin.
    */
  private[graft] def bm25GroupedRanked(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("bm25_scaled").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Bm25TopK)
      .select(col("q_id"), col("doc_id"), col("rank"), col("bm25_scaled"))
  }

  /** The ranked registry face of [[bm25GroupedScored]]. */
  private val bm25Grouped: Q = (s, d) =>
    bm25GroupedRanked(bm25GroupedScored(s, d))

  /** Dirichlet smoothing mass, query-term cut, result depth and the
    * fixed-point scale for [[qlmTopk]]. The scale is a power-of-two-
    * times-power-of-five double (1e18), exactly representable, so both
    * engines scale by the identical value.
    */
  private[operators] val QlmMu = 200L
  private[operators] val QlmQueryTerms = 3
  private[operators] val QlmTopK = 10L
  private[operators] val QlmScale = 1e18

  /** QUERY-LIKELIHOOD retrieval with Dirichlet smoothing — the
    * language-model ranking next to [[bm25Grouped]] on the same
    * inverted index (the second classic lexical ranker; what a
    * retrieval stack A/Bs against BM25). Each of the standing 10 query
    * docs is represented by its top-[[QlmQueryTerms]] terms (tf desc,
    * term asc — deterministic), and every candidate doc scores
    * `Π_t p(t|d)` with `p(t|d) = (tf + μ·cf/C) / (dl + μ)`.
    *
    * Cross-engine float parity: each per-term probability is ONE IEEE
    * division of int64-exact operands (`(tf·C + μ·cf) / ((dl+μ)·C)` —
    * both sides ≤ ~5·10⁸ at gate SFs, exactly representable), and the
    * product folds in FIXED term order (array_sort on the term key;
    * DuckDB's ordered-list twin parenthesizes identically), so the
    * double is bit-identical on any IEEE-754 engine — the same
    * discipline as [[bm25Scored]]'s fixed-order sum, for a product.
    * Ranking and output use `floor(ql·1e18)` (int64: ql ≤ 1), so the
    * hash-checked cut orders on exact integers.
    *
    * Scale shape: absent query terms still carry smoothing mass, so the
    * candidate grid is |query terms| × N — a broadcast of the ≤ 30-row
    * (term, cf) query frame onto the doc-length table (linear, one
    * bounded nested loop, governance-allowlisted), then a LEFT equi-join
    * against the postings of just those terms. The log-free product
    * form keeps the dl-dependence inside each factor, so there is no
    * per-doc constant to hoist (the log-domain decomposition a
    * floating-point tier would use trades that hoist for libm
    * portability — the wrong trade for a hash-checked gate).
    */
  private val qlmTopk: Q = (s, d) => {
    val (tf, dl, _, stats) = bm25Postings(s, d)
    qlmRankedFrom(tf, dl, stats)
  }

  /** The ranked QL frame `(q_id, doc_id, rank, ql_scaled)` over
    * CALLER-SUPPLIED index frames — the face body, split like
    * [[bm25GroupedScoredFrom]] so [[HybridRetrieval]]'s ranker A/B eval
    * feeds BOTH rankers from one postings derivation (one token scan).
    */
  private[graft] def qlmRankedFrom(tf: DataFrame, dl: DataFrame,
      stats: DataFrame): DataFrame = {
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val wq = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("term"))
    val qt = tf.filter(col("doc_id") < Bm25GroupQueries)
      .withColumn("tr", row_number().over(wq))
      .filter(col("tr") <= QlmQueryTerms)
      .select(col("doc_id").as("q_id"), col("term"))
    val qcf = broadcast(qt.join(cf, Seq("term"))
      .crossJoin(broadcast(stats.select(col("total")))))
    val grid = dl.crossJoin(qcf)
      .filter(col("doc_id") =!= col("q_id"))
      .join(tf.withColumnRenamed("tf", "dtf"), Seq("term", "doc_id"), "left")
      .withColumn("p",
        (coalesce(col("dtf"), lit(0L)) * col("total") +
          lit(QlmMu) * col("cf")).cast("double") /
          ((col("dl") + lit(QlmMu)) * col("total")).cast("double"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("ql_scaled").desc, col("doc_id"))
    grid.groupBy(col("q_id"), col("doc_id"))
      .agg(aggregate(array_sort(collect_list(struct(col("term"), col("p")))),
        lit(1.0), (acc, x) => acc * x.getField("p")).as("ql"))
      .withColumn("ql_scaled", floor(col("ql") * lit(QlmScale)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= QlmTopK)
      .select(col("q_id"), col("doc_id"), col("rank"), col("ql_scaled"))
  }

  /** The full per-doc BM25 score frame `(doc_id, bm25)` — shared by the
    * ranked-retrieval query above and the lexical leg of
    * [[HybridRetrieval]]'s rank fusion.
    */
  private[operators] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val tok = T(s, d, "documents")
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
    val perDocAggs = count(lit(1)).as("dl") +:
      Bm25Terms.zipWithIndex.map { case (t, i) =>
        count(when(col("term") === t, 1)).as(s"tf$i") }
    val perDoc = tok.groupBy(col("doc_id"))
      .agg(perDocAggs.head, perDocAggs.tail: _*)
    val statAggs = Seq(count(lit(1)).as("n"), sum(col("dl")).as("total")) ++
      Bm25Terms.indices.map(i =>
        count(when(col(s"tf$i") > 0, 1)).as(s"df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val termScores = Bm25Terms.indices.map { i =>
      val num = ((lit(2) * col("n") - lit(2) * col(s"df$i") + lit(1)) *
        lit(22) * col(s"tf$i") * col("total")).cast("double")
      val den = ((lit(2) * col(s"df$i") + lit(1)) *
        (lit(10) * col(s"tf$i") * col("total") + lit(3) * col("total") +
          lit(9) * col("dl") * col("n"))).cast("double")
      num / den
    }
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (round(termScores.reduce(_ + _), 4) + lit(0.0)).as("bm25"))
  }

  /** Character-level Shannon entropy per document — the classic
    * gibberish/boilerplate signal (low entropy: repeated padding,
    * ASCII-art, template residue; high: encrypted/binary spill).
    *
    * Stays SHUFFLE-FREE like the rest of this file: the char histogram
    * is folded WITHIN each row — sort the char array (native kernel),
    * then ONE O(len) run-length pass accumulates `Σ c·log2 c` as each
    * run closes. (The two rejected shapes: a count-per-distinct-char
    * lambda is O(distinct·len) interpreted work — measured 3.2 s at
    * sf0.1 vs 1.2 s for this fold; explode → groupBy(doc, ch) is fine
    * at scale thanks to map-side partial aggregation but pays an
    * exchange this needs no part of.) The fold visits runs in sorted
    * order, so the double sum is deterministic.
    * `H = log2(n) − (Σ c·log2 c)/n`; rounded to 6 so both engines'
    * float folds agree exactly.
    */
  private val entropy: Q = (s, d) => {
    // one native codegen'd pass per row ([[graft.functions.CharRunStats]])
    // — the HOF formulation (array_sort + aggregate lambda) computed the
    // same numbers at interpreted-lambda speed (1.40 s vs 0.4 s at
    // sf0.1); the entropy composition below is unchanged, so the float
    // contract with the oracle is too. The HOF twin lives on in
    // entropyHof, spec-pinned equal.
    val st = graft.functions.TextExpressions.char_run_stats(col("text"))
    val n = col("st.n_chars").cast("double")
    T(s, d, "documents").select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        col("st.n_chars").as("n_chars"),
        col("st.n_unique").as("n_unique"),
        (round(log2(n) - col("st.clog") / n, 6) + lit(0.0)).as("entropy_bits"))
  }

  /** The pre-expression HOF formulation of [[entropy]] — kept as the
    * cross-check twin (EntropyParitySpec asserts row-for-row equality
    * with the native expression path on the real corpus).
    */
  private[graft] def entropyHof(df: DataFrame): DataFrame = {
    val chars = filter(split(col("text"), ""), c => c =!= "")
    def clog(n: Column): Column = when(n > 0, n * log2(n)).otherwise(lit(0.0))
    val folded = aggregate(array_sort(chars),
      struct(lit("").as("ch"), lit(0.0).as("run"), lit(0.0).as("acc")),
      (st, x) => when(x === st.getField("ch"),
          struct(st.getField("ch").as("ch"),
            (st.getField("run") + 1).as("run"),
            st.getField("acc").as("acc")))
        .otherwise(struct(x.as("ch"), lit(1.0).as("run"),
          (st.getField("acc") + clog(st.getField("run"))).as("acc"))),
      st => st.getField("acc") + clog(st.getField("run")))
    val n = length(col("text")).cast("double")
    df.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(array_distinct(chars)).cast("long").as("n_unique"),
      (round(log2(n) - folded / n, 6) + lit(0.0)).as("entropy_bits"))
  }

  /** Duplicate-bigram repetition profile — the repetition family of
    * quality rules (a doc whose mass sits in a few repeated n-grams is
    * boilerplate, a scraper loop, or template residue; corpus curators
    * gate on the duplicate fraction and on the top n-gram's share).
    * Emits exact integers `(n_ngrams, n_distinct, n_dup, top_n)` per
    * doc — `n_dup/n_ngrams` and `top_n/n_ngrams` derive the two gate
    * ratios; keeping integers makes the row hash-exact.
    *
    * Shuffle-free like the rest of this file: bigrams assemble per row
    * (`transform` over an index sequence — same 1-based `element_at`
    * convention as the shingle pipeline), then ONE sorted run-length
    * fold (the [[entropy]] pattern) counts distinct bigrams and the
    * longest run in O(len) without exploding rows — explode → groupBy
    * would pay an exchange carrying every bigram of every doc.
    */
  private val repetition: Q = (s, d) => {
    // one native hash-map pass per row ([[graft.functions.BigramStats]])
    // — the HOF shape (transform + array_sort + aggregate lambda) was
    // 11.6 s at sf0.1 for the same integers; kept as repetitionHof,
    // spec-pinned equal
    val st = graft.functions.TextExpressions.bigram_stats(col("text"))
    T(s, d, "documents").select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        col("st.n_ngrams").as("n_ngrams"),
        col("st.n_distinct").as("n_distinct"),
        (col("st.n_ngrams") - col("st.n_distinct")).as("n_dup"),
        col("st.top_n").as("top_n"))
  }

  /** The HOF formulation of [[repetition]] — the cross-check twin the
    * parity spec holds against the native expression.
    */
  private[graft] def repetitionHof(df: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val ng = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    // state: (prev bigram, current run length, distinct count, max run)
    val folded = aggregate(array_sort(ng),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("nd"), lit(0L).as("mx")),
      (st, x) => when(x === st.getField("prev"),
          struct(st.getField("prev").as("prev"),
            (st.getField("run") + 1).as("run"),
            st.getField("nd").as("nd"),
            greatest(st.getField("mx"), st.getField("run") + 1).as("mx")))
        .otherwise(struct(x.as("prev"), lit(1L).as("run"),
          (st.getField("nd") + 1).as("nd"),
          greatest(st.getField("mx"), lit(1L)).as("mx"))))
    df.select(col("doc_id"), ng.as("ng"), folded.as("f"))
      .select(col("doc_id"),
        size(col("ng")).cast("long").as("n_ngrams"),
        col("f.nd").as("n_distinct"),
        (size(col("ng")).cast("long") - col("f.nd")).as("n_dup"),
        col("f.mx").as("top_n"))
  }

  /** A bigram is "common" when it appears in at least this many
    * DISTINCT documents — the cross-doc frequency floor that separates
    * boilerplate phrasing from doc-specific content.
    */
  private[operators] val NoveltyMinDocs = 5

  /** Cross-document NOVELTY score — the boilerplate/template detector
    * for corpora whose documents have no line structure: per document,
    * the fraction of its distinct word-bigrams that are NOT corpus-
    * common (`novelty = 1 − n_common/n_bigrams`). A near-zero score
    * marks a templated page (every phrase recurs across the corpus);
    * near-one marks genuinely novel text — the C4/RefinedWeb
    * line-dedup idea expressed at the phrase level. All counts are
    * exact integers; the single division + round at the end is
    * deterministic IEEE on both engines.
    *
    * Scale shape: one explode to the distinct `(doc_id, bigram)` domain
    * (map-side partial collapses in-doc repeats before the exchange), a
    * map-side-combinable doc-frequency count on bigram, an equi-join
    * back on bigram, and a per-doc fold — the exact tfidf topology, no
    * all-pairs anything. Docs with fewer than two words have no bigrams
    * and drop out, as declared.
    */
  private val novelty: Q = (s, d) => noveltyOn(T(s, d, "documents"))

  /** The novelty body on an arbitrary `(doc_id, text)`-shaped frame —
    * split out so the commonness floor is testable on literal docs.
    */
  private[graft] def noveltyOn(docs: DataFrame): DataFrame = {
    val ws = col("ws")
    val grams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    val docGrams = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), explode(grams).as("gram"))
      .distinct()
    val docFreq = docGrams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
    docGrams.join(docFreq, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("n_docs") >= NoveltyMinDocs, 1L).otherwise(0L))
          .as("n_common"))
      .withColumn("novelty",
        round(lit(1.0) -
          col("n_common").cast("double") / col("n_bigrams"), 6))
  }

  /** IN-CORPUS BIGRAM LANGUAGE-MODEL score — the KenLM-perplexity-
    * filter idea (CCNet/Dolma's quality gate) in exact integer
    * arithmetic: train a character-bigram model on the corpus itself
    * (`p(c₂|c₁) = count(c₁c₂) / count(c₁·)` as parts-per-million via
    * integer division — the [[CorpusBuild]] tfidf move, no float log
    * whose last ulp differs between engines), then score each document
    * by its occurrence-weighted mean bigram probability. Low scores
    * mark documents whose character statistics diverge from the
    * corpus — mojibake, binary spill, wrong-language or generated
    * text; the training-data gate next to [[quality]] and [[novelty]].
    *
    * Scale shape: the tfidf topology — one explode to `(doc, bigram)`
    * counts (map-side partial absorbs in-doc repeats), the model
    * collapses onto the ≤ alphabet² domain (tiny forever — its window
    * runs over that, never over text), a broadcast-sized equi-join
    * back, and a per-doc fold. Headroom: `cnt·10⁶` holds to ~9·10¹²
    * occurrences of one prefix char; past that the model arithmetic
    * moves to DECIMAL(38,0), the report shape unchanged.
    */
  private val bigramLm: Q = (s, d) => bigramLmOn(T(s, d, "documents"))

  /** The LM body on an arbitrary `(doc_id, text)`-shaped frame — split
    * out so the probability accounting is testable on a literal
    * corpus.
    */
  private[graft] def bigramLmOn(docs: DataFrame): DataFrame = {
    // native one-pass bigram slice — the transform+substr HOF twin is
    // O(len²) per doc (each SQL substr re-walks the bytes to position
    // i); measured 3.6 s → 1.7 s at sf0.1. PropertySpec pins the twins
    // equal on adversarial text. The docBg branch feeds both the model
    // and the scoring join; recomputing the (cheap, map-side) branch
    // measured FASTER than pinning it with a checkpoint write.
    val grams = graft.functions.TextExpressions.char_bigrams(col("text"))
    val docBg = docs.select(col("doc_id"), explode(grams).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
    val model = docBg.groupBy(col("bg")).agg(sum(col("n")).as("cnt"))
      .withColumn("tot", sum(col("cnt"))
        .over(Window.partitionBy(substring(col("bg"), 1, 1))))
      .select(col("bg"), expr("cnt * 1000000L div tot").as("p_ppm"))
    docBg.join(model, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
        expr("sum(n * p_ppm) div sum(n)").as("score_ppm"))
  }

  /** Feature-hashing dimensionality. */
  private val FhDims = 128

  /** HASHING-TRICK FEATURIZATION (Weinberger et al. 2009) — the
    * fixed-width bag-of-words vectorizer every scale pipeline reaches
    * for when a vocabulary table won't fit or can't be coordinated:
    * token → `md5 % FhDims` (no dictionary, no fit step, new tokens
    * just land somewhere), count collisions and all. The output is the
    * sparse matrix `(doc, dim, weight)` — the direct input to linear
    * probes/classifiers — over a deterministic 1-in-5 doc sample so the
    * gate stays bounded while the computation keeps its shape.
    *
    * Scale shape: pure map-side explode + one aggregation keyed
    * (doc, dim) with map-side partials absorbing in-doc repeats; no
    * model state of any kind, which is the entire point of the trick —
    * embarrassingly parallel at any corpus size.
    */
  private val hashingFeatures: Q = (s, d) =>
    T(s, d, "documents")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"),
        (conv(substring(md5(concat(lit("fh:"), col("w")).cast("binary")),
          1, 8), 16, 10).cast("long") % FhDims).as("dim"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).as("weight"))

  val queries: Map[String, Q] = Map(
    "text_hashing_features" -> hashingFeatures,
    "text_bigram_lm" -> bigramLm,
    "dedup_chunks" -> chunkDedup,
    "dedup_cdc_chunks" -> cdcChunkDedup,
    "dedup_repeated_ngrams" -> repeatedNgrams,
    "text_novelty" -> novelty,
    "text_repetition" -> repetition,
    "text_langid_confusion" -> langidConfusion,
    "text_entropy" -> entropy,
    "text_chunking" -> chunking,
    "text_token_count" -> tokenCount,
    "text_token_bpe" -> tokenBpe,
    "text_quality" -> quality,
    "text_quality_classifier" -> qualityClassifier,
    "text_langid" -> langid,
    "text_stopword_removal" -> stopwordRemoval,
    "text_fingerprint" -> fingerprint,
    "text_pii_mask" -> piiMask,
    "text_bm25_topk" -> bm25,
    "text_bm25_grouped" -> bm25Grouped,
    "text_qlm_topk" -> qlmTopk,
  )

  // ---- DuckDB oracles -----------------------------------------------------

  private[operators] def sqlMarkerCount(markers: Seq[String]): String =
    s"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), " +
      s"w -> w IN (${markers.map(m => s"'$m'").mkString(", ")})))"

  /** SQL twin of [[langGuessCol]] over `score_<lang>` columns. */
  private[operators] def langGuessSql: String =
    langMarkers.tail.foldLeft(s"'${langMarkers.head._1}'") {
      case (acc, (l, _)) =>
        val earlier = langMarkers.takeWhile(_._1 != l)
          .map(x => s"score_${x._1}")
        val maxEarlier =
          if (earlier.size == 1) earlier.head
          else s"greatest(${earlier.mkString(", ")})"
        s"CASE WHEN $maxEarlier < score_$l THEN '$l' ELSE $acc END"
    }

  /** SQL `score_<lang>` projections over `documents`. */
  private[operators] def langScoreColsSql: String = langMarkers
    .map { case (l, m) => s"${sqlMarkerCount(m)} AS score_$l" }
    .mkString(",\n  ")

  private val langidConfusionOracle: String =
    s"""SELECT lang, $langGuessSql AS lang_guess, count(*) AS n
       |FROM (SELECT lang, $langScoreColsSql FROM documents)
       |GROUP BY 1, 2""".stripMargin

  private val langidOracle: String =
    s"""SELECT doc_id, score_en, score_es, score_fr, score_de,
       |  $langGuessSql AS lang_guess
       |FROM (SELECT doc_id, $langScoreColsSql FROM documents)""".stripMargin

  /** WITH-clause body producing `scored(doc_id, bm25)` — the SQL twin of
    * [[bm25Scored]], shared with [[HybridRetrieval]]'s fusion oracle.
    */
  private[operators] val bm25ScoredCtes: String = {
    val tfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"count(CASE WHEN term = '$t' THEN 1 END) AS tf$i" }.mkString(", ")
    val dfCols = Bm25Terms.indices.map(i =>
      s"count(CASE WHEN tf$i > 0 THEN 1 END) AS df$i").mkString(", ")
    // same fixed left-to-right per-term sum as the Spark side — float
    // addition order is part of the cross-engine contract
    val scoreSum = Bm25Terms.indices.map(i =>
      s"(CAST((2*n - 2*df$i + 1) * 22 * tf$i * total AS DOUBLE) / " +
        s"CAST((2*df$i + 1) * (10*tf$i*total + 3*total + 9*dl*n) AS DOUBLE))")
      .mkString(" + ")
    s"""tok AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |perdoc AS (SELECT doc_id, count(*) AS dl, $tfCols
       |           FROM tok GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n, sum(dl) AS total, $dfCols
       |          FROM perdoc),
       |scored AS (SELECT doc_id, round($scoreSum, 4) + 0.0 AS bm25
       |           FROM perdoc CROSS JOIN stats)""".stripMargin
  }

  private val bm25Oracle: String =
    s"""WITH $bm25ScoredCtes
       |SELECT doc_id, bm25 FROM scored
       |ORDER BY bm25 DESC, doc_id LIMIT $Bm25TopK""".stripMargin

  /** The grouped-BM25 oracle over an optionally-restricted document
    * set — `docWhere` (e.g. ` WHERE doc_id % 16 <> 13`) restricts the
    * corpus the from-scratch index derives from; the maintained-index
    * DELETION face shares this text with the deletion predicate (the
    * tombstoned index must rank exactly like a rebuild over the
    * surviving documents).
    */
  private[operators] def bm25GroupedOracleFor(docWhere: String): String =
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents$docWhere),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n, sum(dl) AS total FROM dl),
       |qt AS (SELECT doc_id AS q_id, term FROM tf
       |       WHERE doc_id < $Bm25GroupQueries),
       |sc AS (
       |  SELECT q.q_id, t.doc_id,
       |    CAST(sum(((2*s.n - 2*f.df + 1) * 22 * t.tf * s.total
       |               * $Bm25GroupScale) //
       |      ((2*f.df + 1) * (10*t.tf*s.total + 3*s.total + 9*l.dl*s.n)))
       |      AS BIGINT) AS bm25_scaled
       |  FROM qt q JOIN tf t ON t.term = q.term AND t.doc_id <> q.q_id
       |  JOIN df f ON f.term = q.term
       |  JOIN dl l ON l.doc_id = t.doc_id
       |  CROSS JOIN stats s
       |  GROUP BY 1, 2)
       |SELECT q_id, doc_id, CAST(rank AS BIGINT) AS rank, bm25_scaled
       |FROM (
       |  SELECT q_id, doc_id, bm25_scaled,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY bm25_scaled DESC, doc_id) AS rank
       |  FROM sc) WHERE rank <= $Bm25TopK""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_hashing_features" ->
      s"""SELECT doc_id,
         |  ('0x' || substr(md5('fh:' || w), 1, 8))::BIGINT % $FhDims AS dim,
         |  count(*) AS weight
         |FROM (SELECT doc_id,
         |        unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
         |      FROM documents WHERE doc_id % 5 = 0)
         |GROUP BY 1, 2""".stripMargin,
    // NOTE substr/length are UTF-16-unit-based in Spark and
    // codepoint-based in DuckDB — identical on BMP-only corpora like
    // this one; an astral-plane corpus would need a byte-level model.
    "text_bigram_lm" ->
      """WITH bg AS (
        |  SELECT doc_id, substr(text, i, 2) AS bg
        |  FROM documents, unnest(generate_series(1, length(text) - 1)) t(i)
        |  WHERE length(text) >= 2),
        |db AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2),
        |m AS (SELECT bg, CAST(sum(n) AS HUGEINT) AS cnt FROM db GROUP BY 1),
        |mp AS (SELECT bg, CAST(cnt * 1000000 //
        |    sum(cnt) OVER (PARTITION BY substr(bg, 1, 1)) AS BIGINT)
        |    AS p_ppm FROM m)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |  CAST(sum(n * p_ppm) // sum(n) AS BIGINT) AS score_ppm
        |FROM db JOIN mp USING (bg) GROUP BY 1""".stripMargin,
    "text_novelty" ->
      s"""WITH w AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
         |  FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS gram
         |  FROM w, unnest(generate_series(1, len(ws) - 1)) t(i)
         |  WHERE len(ws) >= 2),
         |c AS (SELECT gram, count(*) AS n_docs FROM g GROUP BY 1)
         |SELECT g.doc_id, count(*) AS n_bigrams,
         |  CAST(sum(CASE WHEN c.n_docs >= $NoveltyMinDocs THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_common,
         |  round(1.0 - CAST(sum(CASE WHEN c.n_docs >= $NoveltyMinDocs
         |                   THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         |    AS novelty
         |FROM g JOIN c USING (gram) GROUP BY 1""".stripMargin,
    // independent derivation: explode bigrams + relational counts vs
    // the Spark side's per-row sorted fold — the two shapes must agree
    "text_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
        |    i -> ws[i] || ' ' || ws[i+1])) AS g
        |  FROM w WHERE len(ws) >= 2),
        |c AS (SELECT doc_id, g, count(*) AS n FROM ng GROUP BY 1, 2),
        |st AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_ngrams,
        |         count(*) AS n_distinct, CAST(max(n) AS BIGINT) AS top_n
        |       FROM c GROUP BY 1)
        |SELECT d.doc_id, coalesce(st.n_ngrams, 0) AS n_ngrams,
        |  coalesce(st.n_distinct, 0) AS n_distinct,
        |  coalesce(st.n_ngrams, 0) - coalesce(st.n_distinct, 0) AS n_dup,
        |  coalesce(st.top_n, 0) AS top_n
        |FROM documents d LEFT JOIN st USING (doc_id)""".stripMargin,
    "text_entropy" ->
      """WITH h AS (
        |  SELECT doc_id, length(text) AS n,
        |    list_transform(
        |      list_distinct(string_split(text, '')),
        |      ch -> len(list_filter(string_split(text, ''), c -> c = ch)))
        |      AS counts
        |  FROM documents)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  CAST(len(counts) AS BIGINT) AS n_unique,
        |  round(log2(n) -
        |    list_sum(list_transform(counts, c -> c * log2(c))) / n,
        |    6) + 0.0 AS entropy_bits
        |FROM h""".stripMargin,
    "text_bm25_topk" -> bm25Oracle,
    // the same inverted-index joins and exact-integer odds-ratio terms;
    // every `//` numerator/denominator is positive, so DuckDB flooring
    // equals Spark's truncating div
    "text_bm25_grouped" -> bm25GroupedOracleFor(""),
    // the same tokenization + postings CTEs; per-term probabilities are
    // single IEEE divisions of int64-exact operands and the product
    // parenthesizes ((p1·p2)·p3) exactly like the Spark-side left fold
    // (COALESCE(·, 1.0) pads short queries — ×1.0 is bit-exact)
    "text_qlm_topk" ->
      s"""WITH tok AS (SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
         |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf
         |       FROM tf GROUP BY 1),
         |stats AS (SELECT CAST(sum(dl) AS BIGINT) AS total FROM dl),
         |qt AS (SELECT doc_id AS q_id, term FROM (
         |    SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY tf DESC, term) AS tr
         |    FROM tf WHERE doc_id < $Bm25GroupQueries)
         |  WHERE tr <= $QlmQueryTerms),
         |p AS (SELECT q.q_id, l.doc_id, q.term,
         |    CAST(COALESCE(t.tf, 0) * s.total + $QlmMu * c.cf AS DOUBLE) /
         |      CAST((l.dl + $QlmMu) * s.total AS DOUBLE) AS p
         |  FROM qt q JOIN cf c USING (term)
         |  CROSS JOIN dl l
         |  CROSS JOIN stats s
         |  LEFT JOIN tf t ON t.term = q.term AND t.doc_id = l.doc_id
         |  WHERE l.doc_id <> q.q_id),
         |lp AS (SELECT q_id, doc_id, list(p ORDER BY term) AS ps
         |       FROM p GROUP BY 1, 2),
         |ql AS (SELECT q_id, doc_id, CAST(floor(
         |    ps[1] * COALESCE(ps[2], 1.0) * COALESCE(ps[3], 1.0) * $QlmScale)
         |    AS BIGINT) AS ql_scaled FROM lp)
         |SELECT q_id, doc_id, CAST(rank AS BIGINT) AS rank, ql_scaled
         |FROM (SELECT q_id, doc_id, ql_scaled,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY ql_scaled DESC, doc_id) AS rank
         |  FROM ql) WHERE rank <= $QlmTopK""".stripMargin,
    "text_chunking" ->
      (s"WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws " +
        s"FROM documents) " +
        s"SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, " +
        s"array_to_string(ws[i * $ChunkStep + 1 : i * $ChunkStep + $ChunkSize], ' ') AS chunk_text " +
        s"FROM w, unnest(generate_series(0, CAST(floor((len(ws) - 1) / $ChunkStep) AS INT))) t(i)"),
    // content-defined boundaries: position i (1-based, i >= window)
    // ends a chunk when the Rabin-Karp polynomial hash of the trailing
    // 8-char window (mod the Mersenne prime, leftmost char highest
    // power — the closed form of CdcBoundaries' rolling recurrence,
    // same B^k mod P constants) is divisible by the mask; spans between
    // boundaries (plus the 0/len sentinels) are the chunks, then the
    // identical first-occurrence accounting as dedup_chunks
    "dedup_cdc_chunks" ->
      s"""WITH bnd AS (
         |  SELECT doc_id, i FROM documents,
         |    unnest(generate_series($CdcWindow, length(text))) t(i)
         |  WHERE ((${cdcWindowHashSql}) % ${graft.functions.CdcBoundaries.Prime})
         |        % $CdcMask = 0),
         |b AS (SELECT doc_id, 0 AS p FROM documents
         |      UNION SELECT doc_id, length(text) FROM documents
         |      UNION SELECT doc_id, i FROM bnd),
         |spans AS (SELECT doc_id, p AS st,
         |            lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS en
         |          FROM b),
         |c AS (SELECT s.doc_id,
         |        row_number() OVER (PARTITION BY s.doc_id
         |          ORDER BY s.st) - 1 AS chunk_idx,
         |        substr(d.text, s.st + 1, s.en - s.st) AS chunk_text
         |      FROM spans s JOIN documents d USING (doc_id)
         |      WHERE s.en IS NOT NULL AND s.en > s.st),
         |r AS (
         |  SELECT doc_id, row_number() OVER (
         |      PARTITION BY md5(chunk_text)
         |      ORDER BY doc_id, chunk_idx) AS rk
         |  FROM c)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  count(*) - CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dropped
         |FROM r GROUP BY doc_id""".stripMargin,
    // States the CONTENT grouping directly: the Spark side's
    // hash-prefilter phase admits every content-duplicate (equal text ⇒
    // equal hash) and its verify phase regroups by the window text, so
    // the two formulations are exactly equivalent — the hash pass only
    // exists to shuffle longs instead of strings at scale.
    "dedup_repeated_ngrams" ->
      s"""WITH w AS (
         |  SELECT doc_id, i AS start, substr(text, i, $RepWindow) AS win
         |  FROM documents,
         |    unnest(generate_series(1, length(text) - ${RepWindow - 1})) t(i)),
         |g AS (SELECT win FROM w GROUP BY win
         |      HAVING min(doc_id) < max(doc_id)),
         |dw AS (SELECT doc_id, start FROM w JOIN g USING (win)),
         |cov AS (SELECT doc_id, least($RepWindow,
         |          coalesce(start - lag(start) OVER (
         |            PARTITION BY doc_id ORDER BY start), $RepWindow))
         |          AS contrib
         |        FROM dw),
         |a AS (SELECT doc_id, count(*) AS n_dup_windows,
         |        CAST(sum(contrib) AS BIGINT) AS dup_chars
         |      FROM cov GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(greatest(length(d.text) - ${RepWindow - 1}, 0) AS BIGINT)
         |    AS n_windows,
         |  coalesce(a.n_dup_windows, 0) AS n_dup_windows,
         |  coalesce(a.dup_chars, 0) AS dup_chars
         |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin,
    "dedup_chunks" ->
      s"""WITH w AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |    array_to_string(
         |      ws[i * $ChunkStep + 1 : i * $ChunkStep + $ChunkSize], ' ')
         |      AS chunk_text
         |  FROM w, unnest(generate_series(0,
         |    CAST(floor((len(ws) - 1) / $ChunkStep) AS INT))) t(i)),
         |r AS (
         |  SELECT doc_id, row_number() OVER (
         |      PARTITION BY md5(chunk_text)
         |      ORDER BY doc_id, chunk_idx) AS rk
         |  FROM c)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  count(*) - CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dropped
         |FROM r GROUP BY 1""".stripMargin,
    "text_token_count" ->
      ("SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens, " +
        "length(text) AS n_chars_computed FROM documents"),
    "text_quality" ->
      s"""SELECT doc_id, n_words, n_stopwords,
         |  round(n_stopwords * 1.0 / n_words, 4) AS stop_ratio,
         |  round(n_nonspace * 1.0 / n_words, 4) AS avg_word_len
         |FROM (SELECT doc_id,
         |  len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
         |  ${sqlMarkerCount(langMarkers.flatMap(_._2).distinct)} AS n_stopwords,
         |  length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
         |FROM documents)""".stripMargin,
    // the identical frozen weights, basis-point integer features, and
    // sign-split hard-sigmoid — `//` ≡ `div` on the nonnegative
    // numerators both sides arrange
    "text_quality_classifier" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
         |    ${sqlMarkerCount(langMarkers.flatMap(_._2).distinct)} AS n_stop,
         |    length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
         |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
         |    length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
         |      AS n_punct
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id, CAST($QcBias
         |    + $QcWStop * ((n_stop * 10000) // n_words)
         |    + ($QcWDigit) * ((n_digits * 10000) // greatest(n_nonspace, 1))
         |    + ($QcWPunct) * ((n_punct * 10000) // greatest(n_nonspace, 1))
         |    + $QcWLen * least(n_words, $QcLenCap) AS BIGINT)
         |    AS score_scaled
         |  FROM f),
         |p AS (
         |  SELECT doc_id, score_scaled,
         |    least(greatest(5000 + (CASE WHEN score_scaled >= 0
         |      THEN score_scaled // 4
         |      ELSE -((-score_scaled) // 4) END), 0), 10000) AS p_bp
         |  FROM sc)
         |SELECT doc_id, score_scaled, CAST(p_bp AS BIGINT) AS p_bp,
         |  CAST(CASE WHEN p_bp >= $QcKeepBp THEN 1 ELSE 0 END AS BIGINT)
         |    AS kept
         |FROM p""".stripMargin,
    "text_token_bpe" ->
      ("SELECT doc_id, len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens, " +
        "len(list_filter(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'), " +
        "t -> regexp_matches(t, '^[0-9]+$'))) AS n_number_tokens FROM documents"),
    "text_langid" -> langidOracle,
    "text_langid_confusion" -> langidConfusionOracle,
    "text_stopword_removal" ->
      (s"SELECT doc_id, array_to_string(list_filter(" +
        s"regexp_split_to_array(trim(text), '\\s+'), " +
        s"w -> w NOT IN (${langMarkers.flatMap(_._2).distinct.map(m => s"'$m'").mkString(", ")})), ' ') AS clean_text " +
        "FROM documents"),
    "text_fingerprint" ->
      "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint FROM documents",
    "text_pii_mask" ->
      (s"SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(" +
        s"text || ' contact user' || doc_id || '@example.com ph 555-01' || doc_id" +
        s" || ' host 10.0.' || (doc_id % 256) || '.7', " +
        s"'$EmailRe', '<EMAIL>', 'g'), " +
        s"'$IpRe', '<IP>', 'g'), " +
        s"'$PhoneRe', '<PHONE>', 'g') AS masked FROM documents"),
  )
}
