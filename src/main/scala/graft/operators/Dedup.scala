package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{load => T}

/** Deduplication operators for large-scale training-data pipelines
  * (north-star Ext1, SURVEY.md §2): exact, MinHash+LSH, SimHash and
  * n-gram-Jaccard over the `documents` table, embedding-cosine near-dup
  * over `embeddings`.
  *
  * Design for 100 TB:
  *  - exact dedup is a hash group-by — one shuffle on the content hash;
  *  - MinHash signatures are map-side-combinable `min()` aggregates over
  *    exploded shingles (partial agg before the shuffle);
  *  - LSH banding turns the O(n²) pair problem into an equi-join on band
  *    keys — only same-bucket docs are ever paired;
  *  - SimHash banding (4 bands of 8 bits) gives *guaranteed* recall for
  *    hamming distance ≤ 3 by pigeonhole while staying an equi-join;
  *  - the only deliberately bounded operator is the exact-Jaccard audit
  *    (`dedup_ngram_jaccard`), capped to doc_id < 300 — at scale you run it
  *    on LSH candidates, never all pairs.
  *
  * Hash functions are built from `md5` so the DuckDB oracle can reproduce
  * them exactly; the same shapes run with `xxhash64` when oracle parity is
  * not needed (cheaper, see [[graft.functions.TextFunctions]]).
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  /** Words of a document: whitespace tokenization. */
  private def words(c: Column): Column = split(trim(c), "\\s+")

  /** Shingle width (word n-gram size). ONE constant feeds both the
    * shingle computation and [[sharedLayout]] — the artifact key must
    * track the actual width, never a hardcoded twin that can drift.
    */
  private val ShingleWidth = 3

  /** Distinct word-n-gram shingles as (doc_id, shingle) rows.
    * `element_at` is 1-based, matching DuckDB `ws[i]`.
    */
  private[graft] def shingleRows(df: DataFrame): DataFrame =
    df.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        explode(when(size(col("ws")) >= ShingleWidth,
          transform(sequence(lit(1), size(col("ws")) - (ShingleWidth - 1)),
            i => concat_ws(" ", (0 until ShingleWidth)
              .map(k => element_at(col("ws"), i + k)): _*)))
          .otherwise(array())).as("shingle"))
      .distinct()

  /** Exact dedup: group on content hash; keep the smallest doc_id. */
  private val exact: Q = (s, d) =>
    T(s, d, "documents")
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  private val NumHashes = 8
  private val Bands = 4 // of 2 minhashes each

  /** MinHash+LSH near-dup candidates: shingle → NumHashes independent
    * minhashes → band keys → equi-join on (band, key) → distinct candidate
    * pairs. Hash i is an 8-hex-char slice of md5(seed:shingle) with
    * seed = i/4 — two md5 calls per shingle yield all eight hashes
    * (slices of a cryptographic digest are independent), and fixed-width
    * hex compares lexicographically = numerically for the min.
    */
  /** Per-doc minhash signatures (plus any extra aggregates computed in the
    * SAME scan + shuffle — e.g. the shingle count the verified pipeline
    * needs, so it doesn't pay a separate pass over the shingles).
    */
  private[graft] def minhashSig(sh: DataFrame, extraAggs: Seq[Column] = Nil): DataFrame = {
    val hashed = sh
      .withColumn("m0", md5(concat(lit("0:"), col("shingle")).cast("binary")))
      .withColumn("m1", md5(concat(lit("1:"), col("shingle")).cast("binary")))
    val aggs = (0 until NumHashes).map(i =>
      min(substring(col(s"m${i / 4}"), (i % 4) * 8 + 1, 8)).as(s"h$i")) ++
      extraAggs
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band keys of a signature table: `(doc_id, band, key)` — the
    * join domain for both the batch pair query and the streaming
    * ingest-time dedup.
    */
  private[graft] def bandKeys(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
      explode(array((0 until Bands).map(b => struct(
        lit(b).as("band"),
        md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))
          .cast("binary")).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))

  /** Band keys computed PER ROW — the same `(doc_id, band, key)` domain
    * as `bandKeys(minhashSig(shingleRows(df)))`, but with the shingle →
    * minhash → band pipeline folded into array expressions over each
    * document, so banding needs NO shuffle at all (the aggregate path
    * pays a groupBy): the shape a streaming micro-batch wants, where
    * every arriving doc must band itself before probing keyed state.
    * Shingle-set dedup is skipped because `min` is insensitive to
    * duplicates; docs with fewer than ShingleWidth words produce no
    * shingles and are dropped, matching the aggregate path (no shingle
    * rows → no signature row). Equality with the aggregate path is
    * spec-asserted.
    */
  private[graft] def bandKeysPerRow(docs: DataFrame): DataFrame = {
    // Two rules shape this pipeline, both measured on sf0.1:
    //
    //  1. GENERATOR BARRIERS (`explode(array(e))`) pin each expensive
    //     intermediate to ONE materialized attribute. Plain column
    //     aliases are inlined by projection collapse, so the word split
    //     would re-run per lambda element and the hex array once per
    //     consumer — ~8× the hash work.
    //  2. Per-SHINGLE higher-order folds are interpreted, and their
    //     per-element array allocations dominate: compute the per-
    //     shingle hex ONCE in a single transform (2 md5s — exactly the
    //     aggregate path's hash count), then take the eight signature
    //     mins as bulk array_min passes over the materialized array —
    //     8 cheap substring scans per DOC, no per-shingle fold state.
    //
    // h_i is an 8-hex slice of hex = md5("0:"+s) ++ md5("1:"+s) at
    // offset i*8 (slices 0-3 in the first digest, 4-7 in the second) —
    // identical to minhashSig's substring(m{i/4}, (i%4)*8+1, 8).
    val shingleHexes = transform(
      sequence(lit(1), size(col("ws")) - (ShingleWidth - 1)),
      i => {
        val s = concat_ws(" ", (0 until ShingleWidth)
          .map(k => element_at(col("ws"), i + k)): _*)
        concat(md5(concat(lit("0:"), s).cast("binary")),
          md5(concat(lit("1:"), s).cast("binary")))
      })
    val hs = (0 until NumHashes).map(i =>
      array_min(transform(col("hx"),
        x => substring(x, i * 8 + 1, 8))).as(s"h$i"))
    docs
      .select(col("doc_id"), explode(array(words(col("text")))).as("ws"))
      .filter(size(col("ws")) >= ShingleWidth) // no shingles ⇒ no signature
      .select(col("doc_id"), explode(array(shingleHexes)).as("hx"))
      .select(col("doc_id") +: hs: _*)
      .select(col("doc_id"),
        explode(array((0 until Bands).map(b => struct(
          lit(b).as("band"),
          md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))
            .cast("binary")).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
  }

  /** LSH banding over signatures → distinct candidate pairs (equi-join).
    * `private[graft]` so the maintained-index replay face
    * (`dedup_index_ivm`) derives pairs from ITS signature table through
    * the identical banding — the IVM identity is about the index, not a
    * reimplemented join.
    */
  private[graft] def bandPairs(sig: DataFrame): DataFrame = {
    val bands = bandKeys(sig)
    val l = bands.select(col("doc_id").as("a_id"), col("band"), col("key"))
    val r = bands.select(col("doc_id").as("b_id"), col("band"), col("key"))
    l.join(r, Seq("band", "key")).filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** LSH candidates read the SHARED signature table ([[sharedTables]]) —
    * the signatures are computed once per dataset version and every
    * dedup job (candidates, verified pipeline) reuses them. The h-column
    * projection means only 8 small string columns are scanned.
    */
  private val minhashLsh: Q = (s, d) => bandPairs(sharedTables(s, d)._2)

  /** The LSH candidate pairs off the shared signature table — exposed
    * for graph-analytics consumers ([[GraphOps]]) so they amortize the
    * same materialization every dedup job uses.
    */
  private[operators] def lshPairs(s: SparkSession, d: String): DataFrame =
    minhashLsh(s, d)

  /** Incremental dedup — the MAINTENANCE shape of [[minhashLsh]]: when
    * a batch of documents arrives (simulated here as the deterministic
    * `doc_id % 10 == 7` slice), only pairs touching the batch need
    * computing; everything old-vs-old was settled when those docs
    * arrived. The arriving side's band keys probe the corpus band
    * derivation of the SHARED bucketed signature table, so per-batch
    * cost is O(batch + matches), never O(corpus²) — at 100 TB the
    * fresh side is broadcast-small and the corpus side is the
    * maintained artifact ([[graft.streaming.IngestDedup]] is the same
    * recipe with the corpus side in keyed state). Emits the same
    * `(a_id, b_id, n_bands)` shape as the full query, restricted to
    * pairs with a new endpoint — which is exactly how the oracle
    * derives it (the full LSH SQL + the endpoint predicate).
    */
  private val minhashIncremental: Q = (s, d) => {
    val bands = bandKeys(sharedTables(s, d)._2)
    val fresh = bands.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id").as("n_id"), col("band"), col("key"))
    val corpus = bands.select(col("doc_id").as("c_id"), col("band"), col("key"))
    corpus.join(fresh, Seq("band", "key"))
      .filter(col("c_id") =!= col("n_id"))
      // both-new pairs meet twice (once per orientation): normalize and
      // collapse before counting shared bands
      .select(least(col("c_id"), col("n_id")).as("a_id"),
        greatest(col("c_id"), col("n_id")).as("b_id"), col("band"))
      .distinct()
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** How many distinct content-head keys the exact-Jaccard audit
    * samples (≈ that many docs, since head keys nearly identify docs).
    */
  private val JaccardSampleKeys = 280

  /** The audit's doc sample: the [[JaccardSampleKeys]] smallest DISTINCT
    * `md5(first 32 chars)` keys, adopted by semi-join. CONTENT-keyed so
    * near-duplicates — which share their head — land in or out of the
    * sample TOGETHER: the old `doc_id < 300` prefix rule silently went
    * vacuous beyond sf0.01 (planted pairs straddle the id range, so the
    * truth set and the recall gate built on it were empty at sf0.1 and
    * at the 10× rung). Key-level selection also keeps the sample's
    * expected PAIR count roughly constant as the corpus grows (the
    * sampled key fraction shrinks as 1/n while pairs grow as n).
    * Scale shape: distinct (one shuffle of keys) → TakeOrdered limit →
    * broadcast semi-join; the constant is the key budget, never a
    * fraction of the corpus.
    */
  private def jaccardSample(docs: DataFrame): DataFrame = {
    val keyed = docs.withColumn("kk",
      md5(substring(trim(col("text")), 1, 32).cast("binary")))
    val keys = keyed.select(col("kk")).distinct()
      .orderBy(col("kk")).limit(JaccardSampleKeys)
    keyed.join(broadcast(keys), Seq("kk")).drop("kk")
  }

  /** Exact n-gram (3-shingle) Jaccard audit over a bounded doc sample
    * ([[jaccardSample]]). At scale this runs on LSH candidates; the
    * key-budget cap keeps the demonstration all-pairs join bounded at
    * every SF. Shingles are computed directly from the SAMPLED documents
    * scan — NOT the shared shingle table: bucketing is an equality-hash
    * layout, it cannot prune the sample, so the shared table would scan
    * every shingle of every doc to keep ~300 docs' worth.
    */
  private val ngramJaccard: Q = (s, d) => {
    val sh = shingleRows(jaccardSample(T(s, d, "documents")))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("a_id"), col("shingle"))
      .join(sh.select(col("doc_id").as("b_id"), col("shingle")), Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n", "na"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n", "nb"), Seq("b_id"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  private val SimBits = 32 // 8 md5 hex digits
  private val SimBands = 4 // of 8 bits: pigeonhole ⇒ full recall for dist ≤ 3

  /** SimHash near-dup pairs: frequency-weighted 32-bit simhash per doc,
    * banded 4×8 bits for candidate generation, exact hamming ≤ 3 filter.
    * The token hash is parsed from the md5 hex prefix in ONE conversion
    * (`conv(…,16,10)` / DuckDB `('0x'||…)::BIGINT`); bits come out with
    * integer div/mod, identical arithmetic in both engines.
    */
  private val simhash: Q = (s, d) => {
    // explode + partial-aggregated conditional sums: A/B-measured ~3x
    // FASTER than the "clever" shuffle-free aggregate/zip_with fold
    // (per-token 32-element array allocation costs more than the
    // explode, whose map-side partial aggregation already reduces the
    // shuffle to one row per document before it moves)
    val tok = T(s, d, "documents")
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"),
        conv(substring(md5(col("w").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("h32"))
    val sumCols = (0 until SimBits).map { b =>
      val bit = (col("h32") / lit(1L << b)).cast("long") % 2
      sum(when(bit === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val sums = tok.groupBy(col("doc_id")).agg(sumCols.head, sumCols.tail: _*)
    val sig = sums.select(col("doc_id"),
      (0 until SimBits).map(b =>
        when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
    val bands = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimBands).map(b => struct(
        lit(b).as("band"),
        ((col("simhash") / lit(1L << (8 * b))).cast("long") % 256)
          .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    val l = bands.select(col("doc_id").as("a_id"),
      col("simhash").as("sim_a"), col("band"), col("key"))
    val r = bands.select(col("doc_id").as("b_id"),
      col("simhash").as("sim_b"), col("band"), col("key"))
    l.join(r, Seq("band", "key")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long")
          .as("dist"))
      .distinct()
      .filter(col("dist") <= 3)
  }

  private val CosineBlocks = 16 // B(B+1)/2 = 136 balanced join keys

  /** Embedding-cosine near-dup pairs, block-partitioned.
    *
    * Why not LSH candidates here: measured on this data, pair similarity is
    * a continuous tail (hundreds of pairs per 0.01 bucket right at the 0.40
    * threshold, no gap), and the answer set is itself ~5.5e-4 of ALL pairs
    * at every SF — i.e. the OUTPUT is quadratic in n. Sign-LSH at
    * cos θ = 0.4 needs p(plane agrees) ≈ 0.63, so any (planes, tables)
    * choice with recall ≈ 1 retains ~all pairs as candidates — no pruning.
    * LSH-bucketed near-dup is the right shape only at high thresholds
    * (see [[Similarity]] for where it does apply).
    *
    * What CAN be fixed is the join shape: instead of a
    * BroadcastNestedLoopJoin on `a_id < b_id` (single in-memory copy of the
    * whole table, undistributable), each vector is assigned a block
    * `vec_id % B` and every unordered block pair (p ≤ q) becomes ONE
    * equi-join key: the left side carries block b under keys (b, q≥b), the
    * right side under keys (p≤b, b), so each unordered vector pair meets
    * exactly once. The join is a plain shuffle equi-join on two int
    * columns — B(B+1)/2 evenly-sized keys that spread over any number of
    * executors, with only a (1+1/B) row overhead vs the exact pair count.
    * Norms are precomputed once per vector; the per-pair hot path is a
    * single codegen'd dot product.
    */
  /** The blocked all-pairs cosine frame `(a_id, b_id, sim)` (unordered
    * pairs once each, raw sims) — shared by `dedup_embedding_cosine`
    * (τ-filtered face) and `dedup_threshold_sweep` (the calibration
    * histogram over the SAME sims).
    */
  private def cosinePairFrame(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val B = CosineBlocks
    val e = T(s, d, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm2(col("v")))
      .withColumn("blk", pmod(col("vec_id"), lit(B)).cast("int"))
    val left = e.select(col("vec_id").as("a_id"), col("v").as("va"),
      col("nrm").as("na"), col("blk").as("kp"),
      explode(sequence(col("blk"), lit(B - 1))).as("kq"))
    val right = e.select(col("vec_id").as("b_id"), col("v").as("vb"),
      col("nrm").as("nb"), col("blk").as("kq"),
      explode(sequence(lit(0), col("blk"))).as("kp"))
    left.join(right, Seq("kp", "kq"))
      // diagonal keys (p == q) pair a block with itself: keep one order
      .filter(col("kp") =!= col("kq") || col("a_id") < col("b_id"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
  }

  private val embeddingCosine: Q = (s, d) =>
    cosinePairFrame(s, d)
      .filter(col("sim") >= 0.4)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        round(col("sim"), 4).as("sim"))

  /** THRESHOLD CALIBRATION SWEEP — the curve a dedup operator's τ is
    * chosen FROM: pair counts per 0.05-wide cosine bucket plus the
    * suffix-cumulative "pairs at or above" column, so "how many
    * near-dup pairs would τ = X admit" is one report instead of N
    * re-runs. Buckets are `floor(sim·20)`: the sims are bit-identical
    * cross-engine (fixed-order dot sums, the `dedup_embedding_cosine`
    * precedent), so the bucket of every pair — and therefore every
    * integer in this report — hash-matches exactly; no threshold ever
    * sits on a float comparison the engines could disagree about.
    *
    * Scale shape: the pair frame is the shared blocked equi-join; the
    * histogram collapses map-side to ≤ 41 buckets, and the one
    * unpartitioned window runs over those ≤ 41 rows — bounded however
    * large the corpus.
    */
  private val thresholdSweep: Q = (s, d) =>
    cosinePairFrame(s, d)
      .select(floor(col("sim") * 20).cast("long").as("bucket_5pct"))
      .groupBy("bucket_5pct").agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_at_or_above", sum(col("n_pairs")).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket_5pct").desc)))

  /** The complete two-stage near-dup pipeline: LSH candidates (stage 1,
    * equi-join shaped) verified with exact shingle-Jaccard computed ONLY
    * on the candidate pairs (stage 2) — the shape that replaces the
    * bounded all-pairs audit at scale. Output: verified pairs with
    * jaccard >= 0.8.
    *
    * The shingle explosion has multiple plan consumers (signatures,
    * sizes, both verify joins), and Spark re-executes a shared subplan
    * per branch — round 1 paid the explode+md5 pipeline FOUR times, and
    * `persist()` was A/B-measured a net LOSS under bench conditions
    * (cold-cache population cost outweighs the recompute). This is the
    * 100 TB shape instead, as CODE: the shingles are CHECKPOINTED ONCE
    * into a bucketed table (bucketed+sorted by doc_id, the verify-join
    * key, so those joins read co-located rows with no shuffle of the big
    * side) and the signature+size aggregation is materialized the same
    * way (one row per doc) — every downstream branch reads the tables,
    * and NO branch re-runs the shingle computation: the returned plan
    * contains zero scans of `documents` (spec-asserted). Across jobs,
    * these are exactly the shared signature/shingle tables a 100 TB
    * dedup pipeline maintains incrementally.
    */
  /** Fingerprint of a dataset's `documents` table: path plus every data
    * file's (name, mtime, size). Keys the materialized shingle/signature
    * tables — a changed source yields a new key, so reuse can never
    * serve stale derived data.
    */
  private[graft] def datasetKey(d: String): String =
    SharedArtifacts.fingerprint(d, "documents.parquet", sharedLayout)

  /** Bucket count for the shared tables: matches the 32 cores the bench
    * runs on — a 16-bucket layout caps every bucketed-read stage at half
    * the machine. On a cluster this is sized to target-parallelism, not
    * core-count-of-one-box.
    */
  private val Buckets = 32

  /** Layout key of the shared tables: every parameter that shapes the
    * written files (bucket count, minhash count, band count, shingle
    * width), plus an algorithm-version token to bump on any hashing
    * change that leaves the counts alone. Part of [[datasetKey]] so a
    * parameter change can never adopt an artifact built under the old
    * layout — e.g. declaring a 16-bucket table INTO 32 BUCKETS would
    * silently corrupt every bucketed join over it.
    */
  private[operators] def sharedLayout: String =
    s"mh:v1:b$Buckets:n$NumHashes:bd$Bands:w$ShingleWidth"

  /** Build-or-reuse the SHARED materialized dedup tables for a dataset:
    * `(shingles, signatures)` — shingles exploded+hashed exactly once,
    * signatures (+ per-doc shingle count) aggregated exactly once, both
    * bucketed+sorted by doc_id. Built once per (dataset, content
    * version) and reused by every dedup query — the maintained signature
    * table a 100 TB dedup pipeline shares across jobs, not per-query
    * scratch.
    *
    * Reuse is by PATH EXISTENCE, not catalog lookup: the files live
    * under a content-fingerprint key and carry a `_READY` marker, so a
    * FRESH SparkSession (a new job against the same dataset — the
    * 100 TB cross-job story) finds the finished files and re-registers
    * external bucketed tables over them without rewriting anything
    * (spec-asserted with a second session). Builders stage into a
    * private directory and publish with one atomic rename — a
    * concurrent builder loses the rename and adopts the winner's files,
    * and a crashed build leaves no marker, so readers can never see a
    * torn table. Rebuilds happen only when the fingerprint says the
    * source changed (fresh key), never per invocation or per session.
    */
  private def sharedTables(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ds = datasetKey(d)
    val shTbl = s"graft_mh_shingles_$ds"
    val sigTbl = s"graft_mh_sig_$ds"
    val base = SharedArtifacts.root.resolve(ds)
    if (!s.catalog.tableExists(shTbl) || !s.catalog.tableExists(sigTbl)) {
      if (!SharedArtifacts.isReady(base)) buildShared(s, d, base)
      registerBucketed(s, shTbl, base.resolve("shingles"))
      registerBucketed(s, sigTbl, base.resolve("signatures"))
    }
    // refresh the stale-sweep lease on EVERY use, not just on build —
    // an artifact adopted daily but never rebuilt must not age past
    // sweepStale's window while live tables point at its files
    SharedArtifacts.markUsed(base)
    (s.table(shTbl), s.table(sigTbl))
  }

  /** Materialize shingles+signatures via the [[SharedArtifacts]]
    * staging+publish protocol. Bucketed writes need transient catalog
    * names; the EXTERNAL drop afterwards leaves the published files
    * alone.
    */
  private def buildShared(s: SparkSession, d: String,
      base: java.nio.file.Path): Unit = {
    val staging = SharedArtifacts.stagingFor(base)
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val shTmp = s"graft_build_sh_$attempt"
    val sigTmp = s"graft_build_sig_$attempt"
    try {
      // ONE pass over documents: explode + md5 once, bucketed by doc_id
      shingleRows(T(s, d, "documents"))
        .write.mode("overwrite").bucketBy(Buckets, "doc_id").sortBy("doc_id")
        .option("path", staging.resolve("shingles").toString)
        .saveAsTable(shTmp)
      // signatures AND per-doc shingle counts from ONE aggregation over
      // the materialized shingles, itself materialized (one row per doc)
      minhashSig(s.table(shTmp), Seq(count(lit(1)).as("n")))
        .write.mode("overwrite").bucketBy(Buckets, "doc_id").sortBy("doc_id")
        .option("path", staging.resolve("signatures").toString)
        .saveAsTable(sigTmp)
      SharedArtifacts.publish(staging, base)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $shTmp")
      s.sql(s"DROP TABLE IF EXISTS $sigTmp")
    }
  }

  /** Register an EXTERNAL bucketed table over already-written files —
    * how a fresh session adopts a prior job's materialization. The
    * schema comes from the parquet footers, so registration can never
    * drift from what was written.
    */
  private def registerBucketed(s: SparkSession, name: String,
      path: java.nio.file.Path): Unit =
    if (!s.catalog.tableExists(name)) {
      val ddl = s.read.parquet(path.toString).schema.toDDL
      s.sql(s"""CREATE TABLE IF NOT EXISTS `$name` ($ddl) USING PARQUET
               |CLUSTERED BY (doc_id) SORTED BY (doc_id)
               |INTO $Buckets BUCKETS
               |LOCATION '${path.toString}'""".stripMargin)
    }

  /** The shared materialized shingle table — exposed for corpus-level
    * consumers (the contamination check) so they amortize the same
    * materialization every dedup job uses.
    */
  private[operators] def sharedShingles(s: SparkSession, d: String): DataFrame =
    sharedTables(s, d)._1

  /** The shingle CTE as SQL, for oracles composing over shingles. */
  private[operators] def shingleCteSql: String = shingleCte

  /** Eagerly build (or adopt) the shared tables for `d`, returning true
    * if this call did the build — the bench's hook for charging the
    * materialization cost to a visible line item instead of whichever
    * dedup query happens to touch the tables first.
    */
  def ensureSharedTables(s: SparkSession, d: String): Boolean = {
    val existed =
      SharedArtifacts.isReady(SharedArtifacts.root.resolve(datasetKey(d)))
    sharedTables(s, d)
    !existed
  }

  private val minhashVerified: Q = (s, d) => {
    val (sh, sigN) = sharedTables(s, d)
    verifiedPairsOn(sh, sigN)
  }

  /** The banding + exact-verify pipeline over ANY (shingles, signatures)
    * pair — the body of `dedup_minhash_verified`, factored so the
    * clustering artifact's PRE-COLLAPSED build ([[ccBuildFrames]]) runs
    * the identical pipeline over the exact-dup representatives' slice of
    * the shared tables.
    */
  private def verifiedPairsOn(sh: DataFrame, sigN: DataFrame): DataFrame =
    verifyCandidates(bandPairs(sigN).select(col("a_id"), col("b_id")),
      sh, sigN.select(col("doc_id"), col("n")))

  /** The exact-verify half of the pipeline over a CALLER-SUPPLIED
    * candidate list — factored from [[verifiedPairsOn]] so the
    * incremental clustering maintainer (`dedup_cc_ivm`) verifies its
    * per-batch candidates through the IDENTICAL intersection joins,
    * jaccard arithmetic, and ≥ 0.8 cut (the IVM identity is about where
    * candidates come from, not a reimplemented verifier). `sh`/`sizes`
    * must cover both endpoints of every candidate.
    */
  private[graft] def verifyCandidates(cand: DataFrame, sh: DataFrame,
      sizes: DataFrame): DataFrame = {
    // the b-side closes on the (b_id, shingle) EQUI-join — shingle in
    // the join key, not a post-join filter, so volume is O(|A|) probes
    // per candidate instead of an |A|×|B| shingle product first (the
    // containment query's shape; measured 2.4 s → 1.0 s at sf0.1, and
    // the bucketed-join co-location on doc_id survives because the
    // bucket column stays inside the join key set)
    val inter = cand
      .join(sh.select(col("doc_id").as("a_id"), col("shingle")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("shingle")),
        Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n", "na"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n", "nb"), Seq("b_id"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Eval stand-in slice, and the symmetric-jaccard report floor, for
    * the cross-set decontamination face.
    */
  private[operators] val DecontamEvalMod = 10L
  private[operators] val DecontamEvalRem = 3L
  private[operators] val DecontamFloorBp = 3000L

  /** CROSS-SET DECONTAMINATION AT LSH SCALE — `contamination_check`'s
    * sibling for the regime where the held-out set is NOT broadcastable
    * (a multi-benchmark suite against a 100 TB corpus): candidates come
    * from the band keys of the eval slice EQUI-joined against the band
    * keys of the train slice — both sides derived from the SHARED
    * signature artifact, no broadcast, no all-pairs — then only the
    * candidates pay the exact shingle-jaccard verification (the
    * verified-pipeline probe: the train side closes on the
    * `(train_id, shingle)` equi-join, so volume is O(|eval shingles|)
    * probes per candidate). Symmetric near-dup on purpose, next to the
    * containment face's asymmetric overlap: LSH banding can only see
    * Jaccard, and a benchmark item paraphrased wholesale IS the
    * near-dup shape. Emits `(eval_id, train_id, n_bands, jac_bp)` for
    * pairs at ≥ [[DecontamFloorBp]] — exact integers end to end.
    *
    * The eval stand-in is the deterministic `doc_id % 10 == 3` slice
    * (the split-assignment idiom), disjoint from the train side by
    * construction.
    */
  private val decontamLsh: Q = (s, d) => {
    val (sh, sigN) = sharedTables(s, d)
    val bands = bandKeys(sigN)
    val isEval = col("doc_id") % DecontamEvalMod === DecontamEvalRem
    val e = bands.filter(isEval)
      .select(col("doc_id").as("eval_id"), col("band"), col("key"))
    val t = bands.filter(!isEval)
      .select(col("doc_id").as("train_id"), col("band"), col("key"))
    val cand = e.join(t, Seq("band", "key"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_bands"))
    val sizes = sigN.select(col("doc_id"), col("n"))
    val inter = cand.select(col("eval_id"), col("train_id"))
      .join(sh.select(col("doc_id").as("eval_id"), col("shingle")),
        Seq("eval_id"))
      .join(sh.select(col("doc_id").as("train_id"), col("shingle")),
        Seq("train_id", "shingle"))
      .groupBy(col("eval_id"), col("train_id")).agg(count(lit(1)).as("i"))
    cand.join(inter, Seq("eval_id", "train_id"))
      .join(sizes.withColumnRenamed("doc_id", "eval_id")
        .withColumnRenamed("n", "ne"), Seq("eval_id"))
      .join(sizes.withColumnRenamed("doc_id", "train_id")
        .withColumnRenamed("n", "nt"), Seq("train_id"))
      .withColumn("jac_bp", expr("i * 10000 div (ne + nt - i)"))
      .filter(col("jac_bp") >= DecontamFloorBp)
      .select(col("eval_id"), col("train_id"), col("n_bands"),
        col("jac_bp"))
  }

  /** MINHASH ESTIMATOR-ERROR REPORT — the reason MinHash works, as a
    * hash gate: for every LSH candidate pair, the signature-agreement
    * ESTIMATE of jaccard (`matches/NumHashes` — the classic unbiased
    * estimator: P[minhash collision] = J) next to the EXACT
    * shingle-set jaccard, both in integer basis points, plus the
    * absolute error. The sketch-family discipline ("the estimator
    * ERROR itself is hash-checked") applied to the dedup pipeline's
    * own sketch — a hashing change that silently degrades the
    * estimator now fails correctness, not recall dashboards.
    *
    * Scale shape: candidates from the shared signature artifact
    * (banded equi-join), signatures re-attached by two doc_id
    * equi-joins (bucket-co-located), the exact intersection the
    * verified pipeline's (b_id, shingle)-keyed probe — nothing touches
    * documents, no all-pairs anywhere.
    */
  private val minhashEst: Q = (s, d) => {
    val (sh, sigN) = sharedTables(s, d)
    val cand = bandPairs(sigN).select(col("a_id"), col("b_id"))
    val ha = sigN.select(col("doc_id").as("a_id") +:
      (0 until NumHashes).map(i => col(s"h$i").as(s"ha$i")): _*)
    val hb = sigN.select(col("doc_id").as("b_id") +:
      (0 until NumHashes).map(i => col(s"h$i").as(s"hb$i")): _*)
    val matches = (0 until NumHashes)
      .map(i => when(col(s"ha$i") === col(s"hb$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val sizes = sigN.select(col("doc_id"), col("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("a_id"), col("shingle")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("shingle")),
        Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("i"))
    cand
      .join(ha, Seq("a_id")).join(hb, Seq("b_id"))
      .withColumn("m", matches)
      .withColumn("est_bp", expr(s"m * 10000 div $NumHashes"))
      .join(inter, Seq("a_id", "b_id"), "left")
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n", "na"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n", "nb"), Seq("b_id"))
      .withColumn("jac_bp", expr(
        "coalesce(i, 0L) * 10000 div (na + nb - coalesce(i, 0L))"))
      .select(col("a_id"), col("b_id"), col("est_bp"), col("jac_bp"),
        abs(col("est_bp") - col("jac_bp")).as("err_bp"))
  }

  /** Near-dup CLUSTERS: the connected components of the verified-pair
    * graph, labeled by each component's smallest doc_id — the grouping a
    * training pipeline needs when duplicates chain (a~b, b~c but a‖c):
    * per-PAIR greedy dropping is order-dependent; per-COMPONENT
    * keep-one is canonical.
    */
  private val components: Q = (s, d) => componentsTable(s, d)

  /** The `cc:v3` layout tag pins the component-label artifact to the
    * minhash layout it was clustered under (`mh:v1` banding feeds the
    * verified pairs) — bump BOTH when the LSH parameters change, or an
    * old clustering would be served over new candidate semantics.
    * (v3 = the exact-dup pre-collapsed builder; output is identical to
    * v2 — spec-asserted — but the bump forces every environment through
    * the new build path once.)
    */
  private def componentsKey(d: String): String =
    SharedArtifacts.fingerprint(d, "documents.parquet", "cc:v3:mh:v1")

  /** The shared COMPONENT-LABEL artifact: `(doc_id, component)` for
    * every doc in any verified near-dup pair — built once per dataset
    * version by the iterative [[connectedComponentsWithRounds]] loop
    * and adopted by every consumer (the registry query, the cluster
    * histogram, [[keepBest]]): the same train-once/consume-many
    * protocol as the LSH signature, IVF, and moments artifacts. The
    * point at 100 TB: the clustering is the EXPENSIVE iterative pass,
    * and before this artifact each consumer re-ran the whole loop —
    * measured 3.0 s (components) + 2.9 s (hist) + 2.4 s (keep_best) at
    * sf0.1 for three recomputations of one result.
    */
  private def componentsTable(s: SparkSession, d: String): DataFrame =
    ccArtifact(s, d, "labels")

  /** The component-label face of the shared artifact, for graph
    * consumers ([[GraphOps]]' modularity report).
    */
  private[operators] def componentLabels(s: SparkSession, d: String)
      : DataFrame = componentsTable(s, d)

  /** The verified near-dup PAIRS face of the same artifact —
    * `(a_id, b_id, jaccard)`, the input the clustering consumed. The
    * build pays the banding + intersection verify once; downstream
    * consumers (the corpus gate's near-dup losers, incremental probes)
    * read a flat parquet instead of re-deriving the pair pipeline. The
    * live `dedup_minhash_verified` registry query still derives pairs
    * from scratch every gate run — it is the oracle-checked derivation
    * the artifact's builder shares code with.
    */
  private[graft] def verifiedPairsTable(s: SparkSession, d: String)
      : DataFrame =
    ccArtifact(s, d, "pairs")

  /** EXACT-DUP PRE-COLLAPSED clustering build — the shape that removed
    * the one super-linear item from the 100× rung (`cc_shared_build`,
    * 448 s under the naive build): LSH pair emission — and far worse,
    * the per-pair exact-jaccard VERIFY join — is quadratic in the size
    * of a byte-identical clique (real web corpora carry boilerplate
    * cliques hundreds deep), yet every member of such a clique bands,
    * matches, and scores EXACTLY like every other. So: group documents
    * by content md5, run banding + verify + components over ONE
    * representative per group (the group's min doc_id — identical text
    * ⟹ identical shingle set ⟹ identical signature, band keys,
    * candidacy, and jaccard against any third document), then expand
    * labels and pairs back through the groups with plain equi-joins.
    *
    * The expansion is provably output-identical to the naive build
    * (spec-asserted against the from-scratch derivation):
    *  - a cross-group pair (a,b) is verified iff (rep(a), rep(b)) is,
    *    with the SAME jaccard — both sides' shingle sets equal their
    *    reps';
    *  - an intra-group pair is an LSH candidate iff the group's docs
    *    produce shingles at all (identical signatures collide in every
    *    band), and then its jaccard is exactly 1.0;
    *  - component labels are min doc_ids, reps are group minima, and
    *    every member connects to its rep — so the expanded labeling
    *    carries the same component ids the full graph would.
    *
    * Scale shape: grouping is one shuffle on the content hash; the rep
    * slice enters the UNCHANGED [[verifiedPairsOn]] pipeline; pair/label
    * expansion is pure equi-join row emission (no hashing, no shingle
    * fan-out) — the only remaining quadratic is the OUTPUT pair list
    * itself, which is the answer, not overhead.
    */
  private[graft] def ccBuildFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val (sh, sigN) = sharedTables(s, d)
    val keyed = T(s, d, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val groups = keyed.groupBy(col("h"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("grp_n"))
    val membership = materialize(keyed.join(groups, Seq("h"))
      .select(col("doc_id"), col("rep_id"), col("grp_n")))
    val repIds = membership.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"))
    // the reps' slice of the SHARED bucketed tables — nothing re-shingles
    val repSig = sigN.join(repIds, Seq("doc_id"), "left_semi")
    val repSh = sh.join(repIds, Seq("doc_id"), "left_semi")
    val repVerified =
      materialize(verifiedPairsOn(repSh, repSig))
    // reps that produced a signature (≥ ShingleWidth words): only their
    // groups band at all, so only their intra-group cliques are pairs
    val sigReps = materialize(
      repSig.select(col("doc_id").as("rep_id")))
    val memA = membership
      .select(col("rep_id").as("a_id"), col("doc_id").as("ma"))
    val memB = membership
      .select(col("rep_id").as("b_id"), col("doc_id").as("mb"))
    val cross = repVerified.join(memA, Seq("a_id")).join(memB, Seq("b_id"))
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"), col("jaccard"))
    val withSig = membership.join(sigReps, Seq("rep_id"), "left_semi")
    val intra = withSig.select(col("rep_id"), col("doc_id").as("a_id"))
      .join(withSig.select(col("rep_id"), col("doc_id").as("b_id")),
        Seq("rep_id"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("jaccard"))
    val pairs = cross.union(intra)
    val repLabels = connectedComponentsWithRounds(
      repVerified.select(col("a_id"), col("b_id")))._1
      .select(col("doc_id").as("rep_id"), col("component").as("rcomp"))
    val labels = membership
      .join(repLabels, Seq("rep_id"), "left")
      .join(sigReps.withColumn("has_sig", lit(true)),
        Seq("rep_id"), "left")
      // a rep in no rep-level pair still anchors a component when its
      // exact-dup group has ≥ 2 banded members (an all-identical clique)
      .withColumn("component", coalesce(col("rcomp"),
        when(col("grp_n") >= 2 && col("has_sig"), col("rep_id"))))
      .filter(col("component").isNotNull)
      .select(col("doc_id"), col("component"))
    (pairs, labels)
  }

  /** Build-or-adopt the clustering artifact and read one face of it:
    * the verified pair list and the component labels are ONE build
    * (labels are derived from pairs), published atomically together.
    * The builder is the pre-collapsed [[ccBuildFrames]]; the labels are
    * written from the staged pairs' frame lineage, both faces in one
    * staging → one atomic publish.
    */
  private def ccArtifact(s: SparkSession, d: String,
      face: String): DataFrame = {
    val base = SharedArtifacts.root.resolve(s"cc_${componentsKey(d)}")
    if (!SharedArtifacts.isReady(base)) {
      val staging = SharedArtifacts.stagingFor(base)
      val (pairs, labels) = ccBuildFrames(s, d)
      pairs.write.mode("overwrite")
        .parquet(staging.resolve("pairs").toString)
      labels.write.mode("overwrite")
        .parquet(staging.resolve("labels").toString)
      SharedArtifacts.publish(staging, base)
    }
    SharedArtifacts.markUsed(base)
    s.read.parquet(base.resolve(face).toString)
  }

  /** Eagerly build (or adopt) the shared component-label artifact —
    * the bench's visibility hook, like `ensureSharedTables`.
    */
  def ensureComponentsArtifact(s: SparkSession, d: String): Boolean = {
    val existed = SharedArtifacts.isReady(
      SharedArtifacts.root.resolve(s"cc_${componentsKey(d)}"))
    componentsTable(s, d)
    !existed
  }

  // ---- incremental clustering maintenance (dedup_cc_ivm) ------------------
  //
  // The index-IVM family's capstone: component LABELS maintained under
  // arriving documents without re-clustering the corpus. The maintained
  // state is four appended stores — shingles, signatures, label rows,
  // and a small fully-compacted label REMAP — and the per-batch fold
  // touches only the batch's own work plus the components its new pairs
  // connect:
  //
  //  1. sign ONLY the batch (shingle → minhash, O(batch));
  //  2. candidates = batch band keys equi-probing the maintained band
  //     derivation (cross) + the batch's own intra-banding — the
  //     dedup_index_ivm pair-emission shape, confluent because a pair is
  //     found exactly when its later endpoint arrives;
  //  3. exact-verify ONLY those candidates through the shared
  //     [[verifyCandidates]] joins against the maintained stores;
  //  4. FOLD: resolve each endpoint's current label (stored label → one
  //     remap hop — the remap is kept fully compacted, so resolution is
  //     a single join), CONTRACT the new pairs to label-node edges, run
  //     the pointer-doubling components over that touched subgraph only
  //     (bounded by merged components + batch, never the corpus), then
  //     append label rows for newly-labeled docs and fold the merges
  //     into the remap. Old docs' label rows are IMMUTABLE — a merge
  //     re-points their label through the remap instead of rewriting
  //     the label store, which is what keeps the per-batch write volume
  //     O(batch + merges) at 100 TB.
  //
  // Correctness invariants (spec-asserted; the face hash-checks against
  // the from-scratch transitive-closure oracle over ALL documents):
  //  - labels are component-member doc_ids and every stored label was
  //    the true min of its component when written, so the contracted
  //    min-CC over (resolved label, resolved label) edges yields the
  //    merged component's true min — label(C) = min doc_id survives
  //    every fold;
  //  - the compacted remap maps every historical root to its current
  //    root: a root that merges enters the remap that batch, and every
  //    existing entry whose target merges is re-pointed in the same
  //    write — so resolution is always exactly one hop.
  //
  // Scale shape: per batch, the signing is O(batch); the band probe is
  // an equi-join whose batch side is tiny (at 100 TB the maintained
  // band store is bucketed on key so probes prune; here it is a scan of
  // 8 short strings per resident doc — measured small-constant at the
  // rung); the verify is O(candidate shingles); the contraction is
  // output-bound. Nothing re-clusters resident components the batch
  // doesn't touch.

  /** The shingle-SET group key of every doc in a stored shingle slice.
    * Each shingle is hashed individually BEFORE aggregation: the
    * per-element md5 is fixed-width hex, so concatenating the sorted
    * hashes is injective on the shingle set no matter what bytes the
    * source text carries (a raw-text separator scheme aliases sets
    * whenever a shingle contains the separator, e.g. a NUL that
    * survives whitespace splitting). The set size stays in the key as
    * a cheap first-level discriminator.
    */
  private[graft] def shingleSetKeys(sh: DataFrame): DataFrame = sh
    .groupBy(col("doc_id"))
    .agg(concat(count(lit(1)).cast("string"), lit(":"),
      md5(concat_ws("",
        sort_array(collect_list(md5(col("shingle").cast("binary"))))).cast("binary")))
      .as("gkey"))

  /** Cluster a STORED (shingles, signatures) slice PRE-COLLAPSED on
    * shingle-set equality — [[ccBuildFrames]]'s move over stored
    * frames (no text needed), factored in r17 from the takedown fold
    * because the 100× rung caught the SAME quadratic-in-clique-size
    * verified-pair volume in the maintained base build (118 s for the
    * half-corpus base vs 33 s for the full pre-collapsed fresh
    * recluster). Equal sets ⟹ jaccard 1.0 ⟹ same component
    * regardless, and ⟹ identical signature/band keys ⟹ identical
    * rep-level candidacy; labels expand through the groups
    * (component = rep-component min, which is the member min because
    * every rep is its group's min). Returns the (doc_id, component)
    * label rows plus the interior pins — the CALLER must consume the
    * frame (write/collect) before releasing them.
    */
  private[graft] def clusterSliceCollapsed(sh: DataFrame, sig: DataFrame)
      : (DataFrame, Seq[DataFrame]) = {
    val gkeys = shingleSetKeys(sh)
    val grouped = gkeys.groupBy(col("gkey"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("grp_n"))
    val membership = materialize(gkeys.join(grouped, Seq("gkey"))
      .select(col("doc_id"), col("rep_id"), col("grp_n")))
    val repIds = membership.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"))
    val repSig = sig.join(repIds, Seq("doc_id"), "left_semi")
    val repSh = sh.join(repIds, Seq("doc_id"), "left_semi")
    val repPairs = verifyCandidates(
      bandPairs(repSig).select(col("a_id"), col("b_id")),
      repSh.select(col("doc_id"), col("shingle")),
      repSig.select(col("doc_id"), col("n")))
      .select(col("a_id"), col("b_id"))
    val repCC = connectedComponentsWithRounds(repPairs)._1
      .select(col("doc_id").as("rep_id"), col("component").as("rcomp"))
    val labels = membership
      .join(repCC, Seq("rep_id"), "left")
      // a rep in no rep-level pair still anchors a component when its
      // group has ≥ 2 members (an all-identical clique); every slice
      // doc has shingles by construction, so the builder's has_sig
      // gate is vacuous here
      .withColumn("component", coalesce(col("rcomp"),
        when(col("grp_n") >= 2, col("rep_id"))))
      .filter(col("component").isNotNull)
      .select(col("doc_id"), col("component"))
    (labels, Seq(membership))
  }

  /** Base generation of the maintained clustering state: sign the
    * resident corpus once and cluster it from scratch — the stores the
    * per-batch fold maintains thereafter. Clustering runs the
    * pre-collapsed slice path ([[clusterSliceCollapsed]]) — label-
    * identical to per-doc banding, never quadratic in clique size.
    */
  private[graft] def ccIvmBase(resident: DataFrame,
      state: java.nio.file.Path): Unit = {
    val sp = resident.sparkSession
    shingleRows(resident).write.mode("overwrite")
      .parquet(state.resolve("sh/base").toString)
    val sh = sp.read.parquet(state.resolve("sh/base").toString)
    minhashSig(sh, Seq(count(lit(1)).as("n")))
      .write.mode("overwrite").parquet(state.resolve("sig/base").toString)
    val sig = sp.read.parquet(state.resolve("sig/base").toString)
    shingleSetKeys(sh).write.mode("overwrite")
      .parquet(state.resolve("gk/base").toString)
    val (labels, pins) = clusterSliceCollapsed(sh, sig)
    labels.write.mode("overwrite")
      .parquet(state.resolve("lbl/base").toString)
    pins.foreach(releaseCheckpoint)
  }

  /** Left-semi slice of the shared signature artifact — values
    * identical to a fresh signing of the same ids by construction (the
    * artifact is built by the same [[shingleRows]]/[[minhashSig]]);
    * `n` dropped so the slice is schema-identical to a plain
    * [[minhashSig]] frame. The adoption path for replay base builds
    * that would otherwise re-shingle the resident corpus.
    */
  private[graft] def sharedSigSlice(s: SparkSession, d: String,
      ids: DataFrame): DataFrame =
    sharedTables(s, d)._2.join(ids, Seq("doc_id"), "left_semi").drop("n")

  /** [[ccIvmBase]] with the signing REUSED from the shared bucketed
    * tables — the registry face's base path: the resident slice's
    * shingles and signatures are left-semi slices of the per-dataset
    * artifact every dedup job shares (values identical by construction:
    * the artifact is built by the same `shingleRows`/`minhashSig`), so
    * the base generation costs two slice writes plus the clustering,
    * never a re-shingle of the resident corpus. The generic
    * [[ccIvmBase]] stays for callers with no shared artifact (specs,
    * synthetic corpora).
    */
  private[graft] def ccIvmBaseFromShared(s: SparkSession, d: String,
      residentIds: DataFrame, state: java.nio.file.Path): Unit = {
    val (sh, sigN) = sharedTables(s, d)
    val shSlice = sh.join(residentIds, Seq("doc_id"), "left_semi")
    // base LABELS: connected components over the resident slice of the
    // shared verified-pairs artifact — never a re-band + re-verify of
    // the resident corpus. Sound because verified pairs are PAIR-LOCAL:
    // a pair is an LSH candidate iff the two docs share a band key and
    // survives iff their exact shingle jaccard ≥ 0.8 — both functions
    // of the two docs' shingle sets alone — so pairs(S) =
    // pairs(corpus) ∩ S×S for any id-subset S, and the banding +
    // verification of the resident slice is already paid (once per
    // dataset version) by the clustering artifact every dedup job
    // shares. Label-identical to [[clusterSliceCollapsed]] over the
    // sliced tables (spec-pinned in IndexIvmSpec).
    val aIds = residentIds.select(col("doc_id").as("a_id"))
    val bIds = residentIds.select(col("doc_id").as("b_id"))
    val slicePairs = verifiedPairsTable(s, d)
      .join(aIds, Seq("a_id"), "left_semi")
      .join(bIds, Seq("b_id"), "left_semi")
      .select(col("a_id"), col("b_id"))
    // the four base stores each derive ONLY from the shared artifacts
    // plus the id set — no store reads another store's file — so their
    // writes run concurrently (guide §2.6) and the base costs
    // max(write), not the sum. gk comes off the slice PLAN rather than
    // the written sh/base (same rows: a parquet round-trip of the
    // slice changes no value shingleSetKeys reads).
    inParallelUnit(Seq(
      () => shSlice
        .write.mode("overwrite").parquet(state.resolve("sh/base").toString),
      () => sigN.join(residentIds, Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(state.resolve("sig/base").toString),
      () => shingleSetKeys(shSlice).write.mode("overwrite")
        .parquet(state.resolve("gk/base").toString),
      // (the CC loop's final frame carries a Project over the
      // LogicalRDD, like every other caller — it stays checkpointed)
      () => connectedComponentsWithRounds(slicePairs)._1
        .select(col("doc_id"), col("component"))
        .write.mode("overwrite")
        .parquet(state.resolve("lbl/base").toString)))
  }

  /** Run independent Spark actions concurrently on short-lived threads
    * (guide §2.6); first failure rethrows after cancelling siblings.
    */
  private[graft] def inParallelUnit(tasks: Seq[() => Unit]): Unit = {
    val pool =
      java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    val fs = tasks.map(t => pool.submit(
      new java.util.concurrent.Callable[Unit] { def call(): Unit = t() }))
    try fs.foreach(_.get())
    catch { case e: Throwable =>
      fs.foreach(_.cancel(true))
      pool.shutdown()
      pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS)
      throw e
    }
    pool.shutdown()
  }

  /** One maintenance fold: verify the batch's new pairs against the
    * maintained stores and merge ONLY the touched components. Writes
    * the batch's generation of all five stores — shingles,
    * signatures, labels, remap, and the shingle-set key registry the
    * resident-side collapse reads — (per-gen dirs; the
    * idempotent exactly-once idiom; a replayed batch overwrites
    * itself). `prior*` frames are the union of every generation BEFORE
    * this batch; `prevRemap` is the latest compacted remap (empty on
    * the first batch). Store contract: each doc_id appears at most once
    * across the prior generations plus the batch — ENFORCED here (the
    * batch is deduplicated and anti-joined against the prior ids before
    * signing), because duplicate store rows would double-count shingle
    * intersections in verification. Same-generation replay idempotency
    * comes from per-gen overwrite + the caller excluding the batch's
    * own generation from its priors.
    */
  private[graft] def ccIvmBatch(batch: DataFrame, priorSh: DataFrame,
      priorSig: DataFrame, priorLbl: DataFrame, prevRemap: DataFrame,
      priorGk: DataFrame, state: java.nio.file.Path, gen: String): Unit = {
    val sp = batch.sparkSession
    // 1. ENFORCE the store contract, then sign ONLY the surviving batch.
    // Docs are immutable, so a re-delivered doc_id (at-least-once
    // delivery into a NEW generation — per-gen overwrite only covers
    // same-generation replay) carries the same text; dropping it here is
    // a no-op semantically, and keeps the stores free of duplicate
    // shingle rows that would double-count intersections in
    // verifyCandidates (i can reach na+nb → jaccard div-by-zero under
    // ANSI). The anti-join is key-only on doc_id — a semi-join shape
    // that stays a shuffle of ids, never of shingles, at scale.
    val fresh = batch.dropDuplicates("doc_id")
      .join(priorSig.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // parquet round-trip pins the generation
    shingleRows(fresh).write.mode("overwrite")
      .parquet(state.resolve(s"sh/$gen").toString)
    val batchSh = sp.read.parquet(state.resolve(s"sh/$gen").toString)
    // the signature and key-registry generations both derive from the
    // WRITTEN batch shingles alone — write them concurrently
    // (guide §2.6; the gk write moves up from below, same frame)
    inParallelUnit(Seq(
      () => minhashSig(batchSh, Seq(count(lit(1)).as("n")))
        .write.mode("overwrite")
        .parquet(state.resolve(s"sig/$gen").toString),
      () => shingleSetKeys(batchSh).write.mode("overwrite")
        .parquet(state.resolve(s"gk/$gen").toString)))
    val batchSig = sp.read.parquet(state.resolve(s"sig/$gen").toString)
    // 2. PRE-COLLAPSE the batch on its shingle SET before banding —
    // [[clusterSliceCollapsed]]'s move applied at the fold (r17,
    // rung-caught: a boilerplate clique arriving inside one batch
    // otherwise pays candidate + verify volume quadratic in clique
    // size — 148 s for the quarter-corpus wave at the 100× rung).
    // Equal sets ⟹ identical band keys and verify scores, so the
    // group's min-id rep carries the group's entire candidacy, and
    // members attach through explicit rep–member edges (jaccard 1.0
    // by definition — exactly the pairs the per-doc path verified one
    // by one). The transitive closure, and therefore every label and
    // root, is unchanged: old pairs route through reps, member edges
    // add only same-set pairs the per-doc path also connected.
    val gkeys = sp.read.parquet(state.resolve(s"gk/$gen").toString)
    val grouped = gkeys.groupBy(col("gkey"))
      .agg(min(col("doc_id")).as("rep_id"))
    val membership = materialize(gkeys.join(grouped, Seq("gkey"))
      .select(col("doc_id"), col("rep_id")))
    val repIds = membership.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"))
    val repSh = batchSh.join(repIds, Seq("doc_id"), "left_semi")
    val repSig = batchSig.join(repIds, Seq("doc_id"), "left_semi")
    // the RESIDENT side collapses through the maintained key store
    // (`gk` generations — (doc_id, gkey), tombstone semantics like
    // every row-wise frame): banding the resident members per doc
    // pays band-key emission and verify volume linear in resident
    // clique size per probing batch; the surviving min-id holder of
    // each stored key carries its group's entire candidacy (same
    // induction as the batch side — same key ⟹ same component
    // always, so an edge to the rep merges the whole group). The
    // rep derivation is one skinny (doc_id, gkey) shuffle — the
    // store's MIN-mergeable fold, never a re-shingle.
    val resRepIds = priorGk.groupBy(col("gkey"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    // candidates: cross (batch REPS probe the resident REPS' bands)
    // + intra
    val bb = bandKeys(repSig)
      .select(col("doc_id").as("n_id"), col("band"), col("key"))
    val pb = bandKeys(
        priorSig.join(resRepIds, Seq("doc_id"), "left_semi"))
      .select(col("doc_id").as("c_id"), col("band"), col("key"))
    val cross = bb.join(pb, Seq("band", "key"))
      // belt-and-braces: the anti-join above makes a batch-vs-resident
      // self-collision impossible, but a self-pair is never a component
      // edge regardless, so keep the guard
      .filter(col("n_id") =!= col("c_id"))
      .select(least(col("n_id"), col("c_id")).as("a_id"),
        greatest(col("n_id"), col("c_id")).as("b_id"))
    val cand = cross
      .union(bandPairs(repSig).select(col("a_id"), col("b_id")))
      .distinct()
    // 3. exact-verify ONLY the candidates, against the union store
    // (rep slices cover every candidate endpoint), then attach the
    // members: rep is its group's min, so (rep, member) is already
    // (least, greatest)
    val allSh = priorSh.select(col("doc_id"), col("shingle"))
      .union(repSh.select(col("doc_id"), col("shingle")))
    val sizes = priorSig.select(col("doc_id"), col("n"))
      .union(repSig.select(col("doc_id"), col("n")))
    val memberEdges = membership.filter(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("a_id"), col("doc_id").as("b_id"))
    val newPairs = materialize(verifyCandidates(cand, allSh, sizes)
      .select(col("a_id"), col("b_id"))
      .union(memberEdges))
    // 4. fold: resolve endpoint labels (one remap hop), contract, merge
    val endpoints = newPairs.select(col("a_id").as("doc_id"))
      .union(newPairs.select(col("b_id").as("doc_id"))).distinct()
    val curr = materialize(endpoints
      .join(priorLbl.withColumnRenamed("component", "lbl"),
        Seq("doc_id"), "left")
      .withColumn("l0", coalesce(col("lbl"), col("doc_id")))
      .join(prevRemap.withColumnRenamed("old", "l0"), Seq("l0"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("l0")).as("cur")))
    val edges = newPairs
      .join(curr.select(col("doc_id").as("a_id"), col("cur").as("ca")),
        Seq("a_id"))
      .join(curr.select(col("doc_id").as("b_id"), col("cur").as("cb")),
        Seq("b_id"))
      .filter(col("ca") =!= col("cb"))
      .select(col("ca"), col("cb"))
    val cc = connectedComponentsWithRounds(edges)._1
      .select(col("doc_id").as("node"), col("component").as("nroot"))
    val mergeMap = materialize(cc.filter(col("node") =!= col("nroot"))
      .select(col("node").as("m_old"), col("nroot").as("m_root")))
    // newly-labeled docs (no prior label row): their one immutable row,
    // holding the current root
    val rootOf = curr
      .join(cc.withColumnRenamed("node", "cur"), Seq("cur"), "left")
      .select(col("doc_id"), coalesce(col("nroot"), col("cur")).as("root"))
    // the label and remap generations are independent frames over the
    // (checkpointed) CC result — write them concurrently (guide §2.6).
    // Compacted remap: re-point entries whose target just merged, then
    // add the merged roots themselves (key sets are disjoint — merge
    // keys were CURRENT roots, existing keys are stale by definition)
    inParallelUnit(Seq(
      () => rootOf
        .join(priorLbl.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("root").as("component"))
        .write.mode("overwrite")
        .parquet(state.resolve(s"lbl/$gen").toString),
      () => prevRemap
        .join(mergeMap.withColumnRenamed("m_old", "root"),
          Seq("root"), "left")
        .select(col("old"),
          coalesce(col("m_root"), col("root")).as("root"))
        .union(mergeMap
          .select(col("m_old").as("old"), col("m_root").as("root")))
        .write.mode("overwrite")
        .parquet(state.resolve(s"remap/$gen").toString)))
    // the CC loop's final labels frame stays checkpointed (its lineage
    // carries a Project over the LogicalRDD, like every other caller)
    Seq(newPairs, curr, mergeMap, membership).foreach(releaseCheckpoint)
  }

  /** COMPACT the maintained clustering state — the LSM lifecycle op
    * applied to [[ccIvmBatch]]'s five stores: the shingle, signature,
    * and key-registry
    * generations concatenate into one base each (append-only frames
    * over immutable docs — the store contract guarantees each doc_id
    * appears exactly once across the input generations), every label
    * row RESOLVES through the current remap into its live root, and
    * the remap itself vanishes — a compacted base's labels ARE current
    * roots, so the next fold's one-hop resolution starts from an empty
    * remap. fold(compact(gens)) ≡ fold(gens) because resolution is the
    * only way a label row is ever read ([[ccIvmBatch]] step 4), and
    * resolve∘compact = resolve by the remap's one-hop invariant.
    *
    * Inputs are the UNIONED prior stores (the same frames a fold would
    * probe), so callers with directory-backed state pass the gen union
    * and callers threading DataFrames (the scale rung) pass those.
    * Scale shape: three linear rewrites plus one broadcast-sized remap
    * join — O(index), never O(corpus re-shingle); this is what bounds
    * the band-store probe scan that grew 7 → 12 s/batch from 10× to
    * 100× generation depth in the r15 rung table.
    */
  private[graft] def ccCompact(sh: DataFrame, sig: DataFrame,
      lbl: DataFrame, remap: DataFrame, gk: DataFrame,
      cstate: java.nio.file.Path): Unit = {
    sh.select(col("doc_id"), col("shingle"))
      .write.mode("overwrite").parquet(cstate.resolve("sh/base").toString)
    sig.write.mode("overwrite")
      .parquet(cstate.resolve("sig/base").toString)
    gk.write.mode("overwrite")
      .parquet(cstate.resolve("gk/base").toString)
    lbl
      .join(remap.withColumnRenamed("old", "component"),
        Seq("component"), "left")
      .select(col("doc_id"),
        coalesce(col("root"), col("component")).as("component"))
      .write.mode("overwrite").parquet(cstate.resolve("lbl/base").toString)
  }

  /** DELETE a victim set from the maintained clustering state — the
    * takedown fold of the interleaved maintainer
    * (`dedup_cc_takedown`): tombstones are not enough for transitive
    * state (removing a bridge doc must SPLIT its component), so the
    * fold rewrites the affected labels from the STORED slices:
    *
    *  1. `dead/gen`: the victims as indexed — readers anti-join this
    *     so dead signatures stop banding and dead shingles stop
    *     verifying;
    *  2. `lbltomb/gen`: every doc of every component holding a victim
    *     — ALL their old label rows die (the one place the
    *     append-only label store needs a rewrite: splits cannot ride
    *     the merge-only remap);
    *  3. `lblfresh/gen`: the affected SURVIVORS re-clustered from the
    *     stored signature/shingle slices (banding + verification +
    *     components over the slice only — a verified pair implies
    *     same-component endpoints, so the slice loses nothing).
    *
    * The remap must be REWRITTEN at the boundary, not carried: every
    * remap entry whose root lies in an affected component is dead (all
    * docs resolving there just got tombstones + fresh rows holding
    * current roots), and carrying it is actively WRONG on the
    * merge-undo path — a takedown that removes a pre-boundary bridge
    * splits the merged component, the split-off survivors' fresh rows
    * re-anchor at the old sub-root (a remap KEY), and the stale entry
    * would silently re-resolve them into the component they split
    * from. This fold persists the affected-component set as
    * `affcomp/gen`; readers must drop pre-boundary remap entries whose
    * root is in it (one broadcast anti-join — post-boundary remap
    * snapshots are built from the filtered read and need no filter).
    * Completeness of the root-side filter: a fresh anchor x can only
    * collide with a remap key x if doc x's old component was merged
    * away — but then doc x resolved into that merge's root, doc x is
    * an affected survivor, so the entry's root IS affected.
    * `resolvedLbl` must be the CURRENT labels (store fold +
    * one remap hop) — the caller owns store layout and resolution.
    *
    * Scale shape: O(affected components' stored rows), never the
    * corpus — the semi-joins slice by a broadcast-sized affected set,
    * and the re-clustering is bounded by the affected subgraph.
    */
  private[graft] def ccDeleteBatch(victims: DataFrame, priorSh: DataFrame,
      priorSig: DataFrame, resolvedLbl: DataFrame,
      state: java.nio.file.Path, gen: String): Unit = {
    val sp = victims.sparkSession
    victims.select(col("doc_id")).distinct()
      .join(priorSig.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(state.resolve(s"dead/$gen").toString)
    val dead = sp.read.parquet(state.resolve(s"dead/$gen").toString)
    val affected = materialize(resolvedLbl
      .join(victims.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("component")).distinct())
    // the remap-rewrite input: readers anti-join pre-boundary remap
    // entries on root ∈ affcomp (see the merge-undo note above)
    affected.write.mode("overwrite")
      .parquet(state.resolve(s"affcomp/$gen").toString)
    resolvedLbl.join(broadcast(affected), Seq("component"), "left_semi")
      .select(col("doc_id"))
      .write.mode("overwrite")
      .parquet(state.resolve(s"lbltomb/$gen").toString)
    val affSurv = sp.read.parquet(state.resolve(s"lbltomb/$gen").toString)
      .join(dead, Seq("doc_id"), "left_anti")
    val affSig = priorSig.join(affSurv, Seq("doc_id"), "left_semi")
    val affSh = priorSh.join(affSurv, Seq("doc_id"), "left_semi")
    // re-cluster the slice PRE-COLLAPSED on the stored shingle SET —
    // the [[ccBuildFrames]] move applied to the takedown: banding the
    // slice per-doc pays pair emission quadratic in surviving clique
    // size (rung-measured 70.7 s on ~97-member cliques at 100×).
    // Shingle-set equality (not text equality — the stores never kept
    // the text) is the sound collapse key; the shared
    // [[clusterSliceCollapsed]] path carries the argument.
    val (freshLabels, pins) = clusterSliceCollapsed(affSh, affSig)
    freshLabels
      .write.mode("overwrite")
      .parquet(state.resolve(s"lblfresh/$gen").toString)
    (affected +: pins).foreach(releaseCheckpoint)
  }

  /** The maintained shared tables, for rung-scale maintenance timing. */
  private[graft] def maintainedStores(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = sharedTables(s, d)

  /** The clustering artifact's labels, for rung-scale maintenance
    * timing (the resident label store the per-batch fold probes).
    */
  private[graft] def ccLabelStore(s: SparkSession, d: String): DataFrame =
    componentsTable(s, d)

  /** Log2 histogram of near-dup CLUSTER sizes — the first number a
    * curator reads off a dedup run ("how much of the corpus sits in
    * 2-doc pairs vs 100-doc boilerplate families?"). Component labels
    * reduce to per-component sizes (one small shuffle over the label
    * table), sizes to [[GraphOps]]-style integer bit-length buckets —
    * the float-log pitfall documented there applies here too.
    */
  private val componentSizeHist: Q = (s, d) =>
    components(s, d)
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy((length(bin(col("sz"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_docs"),
        min(col("sz")).as("min_sz"), max(col("sz")).as("max_sz"))

  /** Round cap: a runaway backstop, not a tuning knob. With the
    * pointer-doubling shortcut each round roughly HALVES the remaining
    * label-chain length, so 25 rounds covers component diameters beyond
    * 2^24 — unreachable for any graph that fits in storage. (The plain
    * propagation this replaced needed diameter-many rounds, where a
    * 26-deep chain would genuinely hit the cap.)
    */
  private val MaxComponentRounds = 25

  /** Distributed connected components over an undirected pair list,
    * returning `(doc_id, component)` plus the rounds taken.
    *
    * Each round is TWO DataFrame-only steps (no driver-side graph):
    *
    *  1. propagate — every node takes the min of its own and its
    *     neighbors' labels (equi-join on edges + groupBy min);
    *  2. shortcut (pointer doubling) — every node replaces its label l
    *     with l's label: `L(v) ← L(L(v))`. Valid because labels are
    *     always node ids within the same component, and monotone
    *     because `L(x) ≤ x`.
    *
    * Propagation alone needs diameter-many rounds (the measured 9.8 s
    * hot spot of round 6 — each round a full join + fixpoint action);
    * with the shortcut the label chains halve per round, so convergence
    * is O(log diameter) rounds of ~1.5× the per-round cost — the
    * shortcut's two references to the propagated frame share one
    * physical aggregation via exchange reuse, and its probe side is
    * already partitioned on the join key from the groupBy.
    *
    * Convergence is detected by the label-sum invariant: labels only
    * ever move DOWN, and the node set is fixed, so the generation sum
    * strictly decreases until the fixpoint — one tiny aggregate per
    * round instead of a self-join. Decimal(38) keeps the sum exact at
    * any corpus size (1e9 ids of 1e12 would overflow a long); the sum
    * is coalesced to 0 so an EDGELESS input converges on round one
    * instead of NPE-ing on `sum()`'s null.
    *
    * The DuckDB oracle computes the same components with a recursive
    * CTE (transitive closure, min reachable node).
    */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame,
      maxRounds: Int = MaxComponentRounds): (DataFrame, Int) = {
    // Each round is materialized with an EAGER checkpoint, which does
    // two jobs at once: (1) the loop drives actions (the fixpoint
    // sum each round), so an unmaterialized round N would recompute the
    // whole upstream pipeline plus N-1 prior rounds — O(rounds²) work;
    // (2) unlike persist(), the checkpoint TRUNCATES LINEAGE — each
    // round's plan references its input several times, so chained
    // logical plans grow ~4× per round and the analyzer chokes on the
    // exponential tree long before data size matters (observed as a
    // minutes-long 10-round loop over a 201-node graph). With per-round
    // truncation every round's plan is a constant-size tree over two
    // flat scans. Superseded generations are explicitly released.
    //
    // Which checkpoint: see [[materialize]].
    def materialize(df: DataFrame): DataFrame = Dedup.materialize(df)
    val ab = pairs.toDF("a_id", "b_id")
    val edges = materialize(ab.union(
      ab.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .toDF("u", "v"))
    val zero = new java.math.BigDecimal(0)
    def labelSum(lbl: DataFrame): java.math.BigDecimal =
      Option(lbl.agg(sum(col("comp").cast(DecimalType(38, 0))))
        .head().getDecimal(0)).getOrElse(zero)
    // pointer doubling: the inner join is total — every comp value is a
    // node id (induction: round-1 labels are mins over self+neighbors;
    // propagate takes mins of existing labels; shortcut takes existing
    // labels). The two references to `prop` share one physical
    // aggregation via exchange reuse, and the probe side is already
    // partitioned on the join key by the groupBy.
    def shortcut(prop: DataFrame): DataFrame = {
      val parent = prop.select(col("doc_id").as("comp"),
        col("comp").as("pcomp"))
      prop.join(parent, Seq("comp"))
        .select(col("doc_id"), col("pcomp").as("comp"))
    }
    // FUSED round 1: propagating over the identity labeling needs no
    // label table at all — min(self, neighbors) comes straight off the
    // edge list, saving the identity materialization and its fixpoint
    // sum (two driver actions on the hot path of every invocation).
    var labels = materialize(shortcut(
      edges.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u").as("doc_id"),
          least(col("u"), col("mn")).as("comp"))))
    var prevSum = labelSum(labels)
    // sum 0 after round 1 means either an EMPTY graph or every node
    // labeled 0 — doc ids are nonnegative, so the sum is 0 only when
    // every label is, and label 0 only ever appears inside node 0's own
    // component (labels are component-member ids): all-zero is the
    // converged single-component-with-0 labeling. Any other round-1
    // labeling is not certified as a fixpoint, so the loop confirms it.
    var converged = prevSum.signum == 0
    var round = 1
    while (!converged && round < maxRounds) {
      val prop = labels.union(edges
          .join(labels.withColumnRenamed("doc_id", "v"), Seq("v"))
          .select(col("u").as("doc_id"), col("comp")))
        .groupBy(col("doc_id")).agg(min(col("comp")).as("comp"))
      val next = materialize(shortcut(prop))
      val s = labelSum(next)
      releaseCheckpoint(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      round += 1
    }
    // the final labels generation stays checkpointed (the caller's
    // action reads it); the edge list is no longer referenced by the
    // truncated final plan, so its blocks can go now
    releaseCheckpoint(edges)
    // the cap is a runaway backstop, not an answer: labels that haven't
    // reached the label-sum fixpoint are NOT components, and returning
    // them would diverge from the transitive-closure oracle silently
    if (!converged)
      throw new IllegalStateException(
        s"dedup_components did not converge within $maxRounds " +
          "rounds — a component's diameter exceeds the cap; raise " +
          "MaxComponentRounds (labels at the cap are not a fixpoint)")
    (labels.select(col("doc_id"), col("comp").as("component")), round)
  }

  /** Asymmetric shingle CONTAINMENT over the LSH candidate pairs —
    * `|A∩B| / |A|` distinguishes "b quotes/extends a" from symmetric
    * near-duplication (Jaccard blurs the two: a short doc fully
    * embedded in a long one scores low Jaccard but containment 1.0).
    * The real-corpus case is partial copies — quotations, article +
    * boilerplate, truncated mirrors — where the KEEP decision wants
    * the superset doc. Emits exact integer set sizes
    * `(n_a, n_b, n_common)` so the row stays hash-comparable; both
    * containment directions derive as `n_common/n_a`, `n_common/n_b`.
    *
    * Scale shape: candidates come from LSH banding (never all pairs);
    * the intersection count fans each pair to its a-side shingles and
    * closes with ONE equi-join on `(b_id, shingle)` — volume
    * O(Σ|A| over candidate pairs), all hash joins. Shingles AND the
    * per-doc set sizes come straight from the SHARED bucketed artifact
    * tables ([[sharedTables]] — sizes were aggregated into the
    * signature build), so this query re-scans neither `documents` nor
    * the shingle set: measured 3.0 s → 1.8 s at sf0.1 vs recomputing
    * both.
    */
  private val containmentQ: Q = (s, d) => {
    val (sh, sigs) = sharedTables(s, d)
    val sizes = sigs.select(col("doc_id"), col("n").cast("long").as("n_sh"))
    val pairs = lshPairs(s, d).select(col("a_id"), col("b_id"))
    val common = pairs
      .join(sh.select(col("doc_id").as("a_id"), col("shingle")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("shingle")),
        Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("n_a")),
        Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("n_b")),
        Seq("b_id"))
      .join(common, Seq("a_id", "b_id"), "left")
      .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
  }

  /** Window length (chars) of the exact-substring dedup scan. One
    * 40-char window ≈ 6-7 words — long enough that a match is
    * memorization-grade copying, short enough that boilerplate
    * fragments inside otherwise-distinct docs still hit.
    */
  private val SubL = 40

  /** EXACT-SUBSTRING duplication scan — the character-level dedup op
    * the word-shingle MinHash family cannot express (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better": the
    * memorization risk is verbatim character RUNS shared across docs,
    * which survive word-level shingle sampling and Jaccard thresholds).
    * Takes the [[SubL]]-char window at every WORD-BOUNDARY anchor
    * (position 1 and each position following a space) — anchoring on
    * content, not on fixed offsets, makes detection SHIFT-INVARIANT: a
    * verbatim run copied to any position in another doc anchors at the
    * same relative word starts and produces the identical gram strings,
    * where a fixed-stride sample would only match when the copy lands
    * stride-aligned. A window is DUPLICATED if the identical string
    * occurs in ≥ 2 distinct docs. Emits per doc the exact counters a
    * curator filters on: `(doc_id, n_grams, n_dup, dup_bp)` with
    * `dup_bp = n_dup·10⁴ div n_grams` — the verbatim-copy fraction.
    *
    * Scale shape: the anchor filter runs INSIDE the array expression
    * (higher-order `filter` before `transform`), so only word-start
    * windows ever explode — a bounded linear expansion of ~len/6 rows
    * per doc, each [[SubL]] chars. The dup set is one hash group-by on
    * the gram string (map-side combinable distinct-doc count); the
    * flag-back is one equi-join on the gram. No pair product anywhere —
    * the gram string itself is the join key, so cost is O(corpus·L/6)
    * at any corpus size. (The suffix-array formulation finds UNALIGNED
    * duplication too; word-anchoring recovers its recall for any copy
    * that preserves word boundaries — which verbatim copies do — while
    * staying a two-shuffle dataflow.)
    */
  /** Word-boundary-anchored [[SubL]]-char windows as (doc_id, gram)
    * rows — the substring faces' shared extraction (the anchor filter
    * runs inside the array expression so only word-start windows ever
    * explode). `private[operators]` for the ingest-time twin.
    */
  private[graft] def substringGrams(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      explode(when(length(col("text")) >= SubL,
        expr(s"transform(filter(sequence(1, length(text) - ${SubL - 1})," +
          " i -> i = 1 OR substring(text, i - 1, 1) = ' ')," +
          s" i -> substring(text, i, $SubL))"))
        .otherwise(array())).as("gram"))

  /** [[substringGrams]] carrying each window's ANCHOR POSITION
    * (1-based char offset) — the rewrite op needs to know WHERE the
    * duplicated span sits, not just that it exists. Same anchor filter
    * inside the array expression, same bounded ~len/6 expansion.
    */
  private[graft] def substringGramPos(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      explode(when(length(col("text")) >= SubL,
        expr(s"transform(filter(sequence(1, length(text) - ${SubL - 1})," +
          " i -> i = 1 OR substring(text, i - 1, 1) = ' ')," +
          s" i -> struct(i AS pos, substring(text, i, $SubL) AS gram))"))
        .otherwise(expr("CAST(array() AS " +
          s"array<struct<pos:int,gram:string>>)"))).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.gram").as("gram"))

  private val substringDup: Q = (s, d) => {
    // single corpus scan: reduce to (gram, doc) instance counts first,
    // read each gram's distinct-doc count off the partition (the rows
    // ARE the distinct docs after that group-by), then roll up per doc
    // — 3 exchanges total vs deriving the gram frame twice (once for
    // the dup set, once for the flag-back join)
    val gc = substringGrams(T(s, d, "documents"))
      .groupBy(col("gram"), col("doc_id")).agg(count(lit(1)).as("c"))
    val byGram = Window.partitionBy(col("gram"))
    gc.withColumn("nd", count(lit(1)).over(byGram))
      .withColumn("isdup", when(col("nd") >= 2, lit(1L)).otherwise(lit(0L)))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        sum(col("c") * col("isdup")).as("n_dup"))
      .withColumn("dup_bp", expr("n_dup * 10000 div n_grams"))
  }

  /** Boilerplate cap of the substring PAIR report: a window string
    * present in more than this many docs is boilerplate (site chrome,
    * license headers) — attributing it to pairs would fan out
    * quadratically in its carrier count while saying nothing about who
    * copied whom. Standard suffix-array-dedup practice caps it.
    */
  private val SubBoilerMax = 8

  /** SUBSTRING ATTRIBUTION PAIRS — the "who copies whom" report over
    * the exact-substring scan: for every doc pair sharing at least one
    * non-boilerplate window (the identical [[SubL]]-char word-anchored
    * string in 2..[[SubBoilerMax]] docs), the exact count of shared
    * distinct windows `(a_id, b_id, n_shared)`. [[substringDup]] tells
    * a curator HOW MUCH of each doc is verbatim-copied; this face tells
    * them FROM WHERE — the lineage input of a keep-best decision at
    * char granularity (the near-dup family's `dedup_source_matrix`
    * shape applied to verbatim runs).
    *
    * Scale shape: the per-gram self-join fans out ≤ [[SubBoilerMax]]²
    * rows per gram BY THE CAP — linear in the gram count at any corpus
    * size, never quadratic in clique size; everything else is the
    * single-scan (gram, doc) reduction plus one pair rollup.
    */
  private val substringPairs: Q = (s, d) => {
    val gd = substringGrams(T(s, d, "documents"))
      .select(col("doc_id"), col("gram")).distinct()
    val byGram = Window.partitionBy(col("gram"))
    val kept = gd.withColumn("nd", count(lit(1)).over(byGram))
      .filter(col("nd") >= 2 && col("nd") <= SubBoilerMax)
      .select(col("gram"), col("doc_id"))
    kept.select(col("gram"), col("doc_id").as("a_id"))
      .join(kept.select(col("gram"), col("doc_id").as("b_id")), Seq("gram"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** SUBSTRING DEDUP REWRITE — the step that closes Lee et al.'s
    * pipeline: [[substringDup]] COUNTS each doc's verbatim-copied
    * windows; this face REMOVES them and emits the deduplicated text.
    * Every flagged anchor (its [[SubL]]-char window string occurs in
    * ≥ 2 docs — the same dup criterion as the counters) contributes
    * the removal interval [pos, pos+L); per doc the intervals MERGE by
    * interval union (gaps-and-islands: an interval starts a new island
    * exactly when its start clears the running max end), and the kept
    * text is the concatenation of the uncovered segments — exact
    * integer span arithmetic end to end, so the emitted
    * `(doc_id, n_spans, n_removed, kept_text)` rows hash-check
    * cross-engine including the rewritten strings.
    *
    * Scale shape: the dup set is the same single-scan gram group-by as
    * the counters; the flag-back is one equi-join on the gram string;
    * the island merge is two windows partitioned by doc_id (never a
    * global sort); the carve is a per-row fold over the doc's own
    * sorted interval array. O(corpus·L/6) at any corpus size.
    */
  /** The carve: merge per-doc removal anchors `(doc_id, pos)` into
    * interval islands and emit every doc of `docs` with its duplicated
    * spans removed — the shared body of the batch rewrite and its
    * at-ingest twin (which differ only in WHERE the flagged anchors
    * come from).
    */
  private[graft] def carveFlagged(docs: DataFrame,
      flagged: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val ivg = flagged.withColumn("e", col("pos") + lit(SubL))
      .withColumn("pmax", max(col("e"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isnew",
        when(col("pmax").isNull || col("pos") > col("pmax"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("isnew")).over(byDoc))
    val merged = ivg.groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), max(col("e")).as("e"))
    val perDoc = merged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).cast("long").as("n_removed"),
        array_sort(collect_list(struct(col("s"), col("e")))).as("ivs"))
    docs.select(col("doc_id"), col("text"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        when(col("ivs").isNull, col("text")).otherwise(expr(
          """aggregate(ivs, struct(1 AS cur, '' AS acc),
            |  (st, iv) -> struct(iv.e AS cur,
            |    concat(st.acc, substring(text, st.cur, iv.s - st.cur))
            |      AS acc),
            |  st -> concat(st.acc,
            |    substring(text, st.cur, length(text))))""".stripMargin))
          .as("kept_text"))
  }

  private val substringRewrite: Q = (s, d) => {
    val docs = T(s, d, "documents")
    val gp = substringGramPos(docs)
    val dup = gp.select(col("gram"), col("doc_id")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("gram"))
    carveFlagged(docs,
      gp.join(dup, Seq("gram")).select(col("doc_id"), col("pos")))
  }

  /** Cross-SOURCE near-dup matrix: LSH candidate pairs rolled up by the
    * (unordered) source pair of their endpoints — which sources copy
    * from each other, the leakage report a corpus curator reads before
    * mixing sources (a benchmark source pairing with a crawl source IS
    * the contamination signal, here at near-dup rather than exact
    * n-gram granularity). Two co-partitioned equi-joins on doc_id plus
    * one small rollup; the doc→source projection prunes `documents` to
    * two columns at the scan.
    */
  private val sourceMatrix: Q = (s, d) => {
    val src = T(s, d, "documents").select(col("doc_id"), col("source"))
    lshPairs(s, d)
      .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")),
        Seq("a_id"))
      .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")),
        Seq("b_id"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Canonical representative per near-dup CLUSTER — the decision step
    * that actually prunes a corpus once components exist: for every
    * component keep the doc with the most tokens (longest near-copy =
    * the least-truncated one), smallest doc_id on ties. Output:
    * `(component, keep_id, best_words, n_members)` — the keep-list a
    * dedup job joins back against the corpus (everything else in the
    * component drops).
    *
    * Scale shape: the component label table is tiny relative to the
    * corpus (one row per doc that appears in any verified pair); the
    * token counts come from one pruned scan of `documents`; the argmax
    * is two ordinary hash aggregations (max then min-on-ties — fully
    * deterministic, unlike engine-specific `max_by` tie behavior). The
    * label table IS a maintained artifact ([[componentsTable]]) and
    * this query is its cheap consumer; the artifact's builder runs the
    * whole clustering path, which the `dedup_components` oracle checks.
    */
  private val keepBest: Q = (s, d) => {
    val comp = components(s, d)
      .select(col("doc_id"), col("component"))
    val nw = T(s, d, "documents").select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_words"))
    // one row per clustered doc — tiny. Materialized once because both
    // the max aggregation and the tie-break join consume it; lazily it
    // would scan+tokenize `documents` once per consumer. Routed through
    // materialize() so a reliable-checkpoint session gets the
    // executor-loss-safe variant here too.
    val j = materialize(comp.join(nw, Seq("doc_id")))
    val best = j.groupBy(col("component"))
      .agg(max(col("n_words")).as("best_words"),
        count(lit(1)).as("n_members"))
    j.join(best, Seq("component"))
      .filter(col("n_words") === col("best_words"))
      .groupBy(col("component"), col("best_words"), col("n_members"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("component"), col("keep_id"),
        col("best_words"), col("n_members"))
  }

  /** Release the block-manager storage behind an eagerly
    * localCheckpoint'ed frame (its analyzed plan is a flat
    * [[org.apache.spark.sql.execution.LogicalRDD]] over the
    * checkpointed RDD) once a newer generation supersedes it.
    */
  /** Eagerly pin a generation of an iterative computation, TRUNCATING
    * LINEAGE (persist() alone reuses computation, but a plan that
    * references its input several times grows ~4× per round and the
    * analyzer chokes on the exponential tree long before data size
    * matters). A session WITH a configured checkpoint dir gets RELIABLE
    * checkpoints (survive executor loss — on a big cluster an iterative
    * job will see one mid-run, and a localCheckpoint'ed generation
    * cannot be recomputed); without one, localCheckpoint (block-manager
    * storage, no filesystem round-trip) is the right local[] / tests /
    * bench shape. Same machinery either way. Shared by the iterative
    * graph consumers ([[connectedComponentsWithRounds]],
    * [[GraphOps]]).
    */
  private[graft] def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** Release a superseded [[materialize]] generation: unpersist the
    * block-manager storage AND, when the session runs with reliable
    * checkpoints, delete the generation's checkpoint files — otherwise
    * a long-running cluster leaks one checkpoint dir per round per
    * invocation (the final generation is the caller's to keep; Spark's
    * `spark.cleaner.referenceTracking.cleanCheckpoints` only collects
    * it after GC drops the last reference).
    */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
        // None for localCheckpoint (block-manager only); Some(dir) for
        // reliable checkpoints, whose files nothing else ever deletes
        r.rdd.getCheckpointFile.foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
      case _ => ()
    }

  /** LEAKAGE-SAFE train/val/test split — the assignment every training
    * pipeline needs BEFORE it can trust an eval number: a near-duplicate
    * of a training document in the eval set inflates the score, so the
    * split key is the near-dup CLUSTER (the shared component-label
    * artifact), not the document — every member of a verified cluster
    * lands in the same split by construction. Singletons (docs in no
    * verified pair) key by their own id. The bucket is the
    * `sample_hash` cross-engine discipline: first 8 hex chars of
    * md5(key) as an integer, mod 20 → 5% val, 5% test, 90% train —
    * deterministic on any cluster, reproducible forever, no RNG state.
    *
    * Scale shape: one equi-join of the corpus ids against the (≤ corpus)
    * label artifact — co-partitionable on doc_id — then pure map-side
    * hashing; nothing global, nothing driver-side.
    */
  private val splitAssign: Q = (s, d) => {
    val docs = T(s, d, "documents").select(col("doc_id"))
    val keyed = docs.join(componentLabels(s, d), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("split_group"))
    keyed
      .withColumn("bucket",
        conv(substring(md5(col("split_group").cast("string")
          .cast("binary")), 1, 8), 16, 10).cast("long") % 20)
      .select(col("doc_id"), col("split_group"),
        when(col("bucket") === 0, "val")
          .when(col("bucket") === 1, "test")
          .otherwise("train").as("split"))
  }

  /** LSH RECALL REPORT — the banding parameters' quality number as a
    * hash-checked registry row (the DedupSimilaritySpec property,
    * promoted to the oracle gate): every ground-truth near-dup pair
    * (exact n-gram jaccard ≥ 0.9 on the jaccard query's own sampled
    * block) tagged with whether the minhash banding surfaced it. A
    * banding regression (fewer bands, wider rows, a broken hash) flips
    * `captured` booleans and fails the gate — recall is a correctness
    * invariant here, not a dashboard. The 0.9 cut is applied to the
    * ROUNDED jaccard both engines already hash-agree on.
    */
  private val lshRecall: Q = (s, d) => {
    val truth = ngramJaccard(s, d).filter(col("jaccard") >= 0.9)
      .select(col("a_id"), col("b_id"))
    val cand = minhashLsh(s, d)
      .select(col("a_id"), col("b_id"), lit(true).as("c"))
    truth.join(cand, Seq("a_id", "b_id"), "left")
      .select(col("a_id"), col("b_id"),
        coalesce(col("c"), lit(false)).as("captured"))
  }

  /** (bands × rows-per-band) configurations swept by [[bandSweep]] —
    * every way to band the [[NumHashes]]-hash signature. */
  private val BandConfigs = Seq((8, 1), (4, 2), (2, 4), (1, 8))

  /** THE LSH S-CURVE AS A GATE — `sim_ann_tradeoff`'s dedup twin: the
    * banding (b bands × r rows) trade every MinHash deployment tunes
    * (Broder/LSH theory: capture probability 1 − (1 − j^r)^b, so more
    * bands of fewer rows catch lower-jaccard pairs at the price of
    * more candidates to verify). One report row per configuration of
    * the SAME 8-hash shared signatures: the candidate-pair count (the
    * verification bill) and recall against the sampled ≥0.9-jaccard
    * truth (the quality). The 4×2 row is the production configuration
    * and must reproduce `dedup_minhash_lsh`'s pair count and
    * `dedup_lsh_recall`'s capture exactly (spec-pinned cross-check).
    *
    * Scale shape: all configurations band in ONE explode over the
    * shared signature table (13 key rows per doc), pairs form by
    * (config, band, key) equi-join — never all-pairs; the 8×1 rows
    * price the known cost of single-hash bands (big buckets) — that
    * visibility is the point of the sweep.
    */
  private val bandSweep: Q = (s, d) => {
    val sig = sharedTables(s, d)._2
    val keyStructs = for {
      (b, r) <- BandConfigs
      band <- 0 until b
    } yield struct(
      lit(s"${b}x$r").as("config"), lit(band.toLong).as("band"),
      md5(concat((0 until r).map(j => col(s"h${band * r + j}")): _*)
        .cast("binary")).as("key"))
    val keys = materialize(sig.select(col("doc_id"),
        explode(array(keyStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.config").as("config"),
        col("bk.band").as("band"), col("bk.key").as("key")))
    val a = keys.select(col("config"), col("band"), col("key"),
      col("doc_id").as("a_id"))
    val b = keys.select(col("config"), col("band"), col("key"),
      col("doc_id").as("b_id"))
    val cand = a.join(b, Seq("config", "band", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("config"), col("a_id"), col("b_id")).distinct()
    val counts = cand.groupBy(col("config"))
      .agg(count(lit(1)).as("n_candidates"))
    val truth = ngramJaccard(s, d).filter(col("jaccard") >= 0.9)
      .select(col("a_id"), col("b_id"))
      .withColumn("config", explode(array(
        BandConfigs.map { case (bb, r) => lit(s"${bb}x$r") }: _*)))
    val capped = truth
      .join(cand.withColumn("c", lit(1L)),
        Seq("config", "a_id", "b_id"), "left")
      .groupBy(col("config"))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("c"), lit(0L))).as("n_captured"))
    counts.join(capped, Seq("config"))
      .withColumn("recall_bp", expr("n_captured * 10000 div n_truth"))
      .select(col("config"), col("n_candidates"), col("n_truth"),
        col("n_captured"), col("recall_bp"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_band_sweep" -> bandSweep,
    "dedup_exact" -> exact,
    "dedup_components" -> components,
    "dedup_split_assign" -> splitAssign,
    "dedup_lsh_recall" -> lshRecall,
    "dedup_keep_best" -> keepBest,
    "dedup_minhash_verified" -> minhashVerified,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_minhash_est" -> minhashEst,
    "dedup_decontam_lsh" -> decontamLsh,
    "dedup_incremental" -> minhashIncremental,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_simhash" -> simhash,
    "dedup_embedding_cosine" -> embeddingCosine,
    "dedup_threshold_sweep" -> thresholdSweep,
    "dedup_containment" -> containmentQ,
    "dedup_substring" -> substringDup,
    "dedup_substring_pairs" -> substringPairs,
    "dedup_substring_rewrite" -> substringRewrite,
    "dedup_source_matrix" -> sourceMatrix,
    "dedup_cluster_hist" -> componentSizeHist,
  )

  // ---- DuckDB oracles -----------------------------------------------------

  /** Whitespace regex rendered as a plain `\s+` for SQL embedding (the
    * s-interpolator would reject the bare backslash escape).
    */
  private val WsRe = "\\s+"

  private val shingleCte =
    """w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      |      FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      |       FROM w, unnest(generate_series(1, len(ws) - 2)) t(i))""".stripMargin

  /** `private[operators]`: [[GraphOps]] embeds this as its pair CTE. */
  private[operators] val minhashOracle: String = {
    val mins = (0 until NumHashes)
      .map(i => s"min(substr(md5('${i / 4}:' || shingle), ${(i % 4) * 8 + 1}, 8)) AS h$i")
      .mkString(", ")
    val bandRows = (0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS key FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bands AS ($bandRows)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_bands
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |GROUP BY 1, 2""".stripMargin
  }

  /** [[bandSweep]]'s oracle: the minhash sig CTE verbatim, every
    * configuration's band keys generated from the SAME Scala config
    * list as the face, pairs by (config, band, key) equi-join.
    */
  private def bandSweepOracle: String = {
    val mins = (0 until NumHashes)
      .map(i => s"min(substr(md5('${i / 4}:' || shingle), ${(i % 4) * 8 + 1}, 8)) AS h$i")
      .mkString(", ")
    val keyRows = (for {
      (b, r) <- BandConfigs
      band <- 0 until b
    } yield {
      val cat = (0 until r).map(j => s"h${band * r + j}").mkString(" || ")
      s"SELECT doc_id, '${b}x$r' AS config, CAST($band AS BIGINT) AS band, md5($cat) AS key FROM sig"
    }).mkString(" UNION ALL ")
    val cfgList = BandConfigs.map { case (b, r) => s"'${b}x$r'" }
      .mkString(", ")
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |keys AS ($keyRows),
       |cand AS (
       |  SELECT DISTINCT a.config, a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM keys a JOIN keys b
       |    ON a.config = b.config AND a.band = b.band AND a.key = b.key
       |   AND a.doc_id < b.doc_id),
       |counts AS (
       |  SELECT config, count(*) AS n_candidates FROM cand GROUP BY 1),
       |truth AS (
       |  SELECT c.config, t.a_id, t.b_id
       |  FROM (SELECT a_id, b_id FROM ($jaccardOracle)
       |        WHERE jaccard >= 0.9) t
       |  CROSS JOIN (SELECT unnest([$cfgList]) AS config) c),
       |capd AS (
       |  SELECT t.config, count(*) AS n_truth,
       |    CAST(count(c.a_id) AS BIGINT) AS n_captured
       |  FROM truth t LEFT JOIN cand c
       |    ON c.config = t.config AND c.a_id = t.a_id AND c.b_id = t.b_id
       |  GROUP BY 1)
       |SELECT counts.config, n_candidates, n_truth, n_captured,
       |  n_captured * 10000 // n_truth AS recall_bp
       |FROM counts JOIN capd ON capd.config = counts.config""".stripMargin
  }

  private val jaccardOracle: String =
    s"""WITH sk AS (SELECT DISTINCT md5(substr(trim(text), 1, 32)) AS kk
       |            FROM documents ORDER BY kk LIMIT $JaccardSampleKeys),
       |samp AS (SELECT doc_id, text FROM documents
       |         WHERE md5(substr(trim(text), 1, 32)) IN (SELECT kk FROM sk)),
       |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '$WsRe') AS ws
       |           FROM samp),
       |sh AS (SELECT DISTINCT doc_id,
       |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |       FROM w, unnest(generate_series(1, len(ws) - 2)) t(i)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
       |          FROM sh a JOIN sh b
       |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT a_id, b_id,
       |  round(i * 1.0 / (x.n + y.n - i), 4) AS jaccard
       |FROM inter JOIN sz x ON a_id = x.doc_id JOIN sz y ON b_id = y.doc_id
       |WHERE i * 1.0 / (x.n + y.n - i) >= 0.5""".stripMargin

  private val simhashOracle: String = {
    val sums = (0 until SimBits).map { b =>
      s"sum(CASE WHEN (h32 // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(", ")
    val hash = (0 until SimBits)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    val bandRows = (0 until SimBands)
      .map(b => s"SELECT doc_id, simhash, $b AS band, (simhash // ${1L << (8 * b)}) % 256 AS key FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH tok AS (
       |  SELECT doc_id, ('0x' || substr(md5(t.w), 1, 8))::BIGINT AS h32
       |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '$WsRe')) AS w
       |        FROM documents) t),
       |sums AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($hash AS BIGINT) AS simhash FROM sums),
       |bands AS ($bandRows)
       |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
  }

  private val minhashVerifiedOracle: String = {
    val mins = (0 until NumHashes)
      .map(i => s"min(substr(md5('${i / 4}:' || shingle), ${(i % 4) * 8 + 1}, 8)) AS h$i")
      .mkString(", ")
    val bandRows = (0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS key FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bands AS ($bandRows),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.a_id, c.b_id, count(*) AS i
       |          FROM cand c
       |          JOIN sh x ON x.doc_id = c.a_id
       |          JOIN sh y ON y.doc_id = c.b_id AND y.shingle = x.shingle
       |          GROUP BY 1, 2)
       |SELECT a_id, b_id, round(i * 1.0 / (x.n + y.n - i), 4) AS jaccard
       |FROM inter JOIN sz x ON a_id = x.doc_id JOIN sz y ON b_id = y.doc_id
       |WHERE i * 1.0 / (x.n + y.n - i) >= 0.8""".stripMargin
  }

  /** Transitive closure over the verified-pair graph via recursive CTE;
    * component = min reachable node (including self). Factored as a CTE
    * body so [[keepBestOracle]] composes on the same closure.
    */
  private[operators] val componentsCte: String =
    s"""vp AS (${minhashVerifiedOracle}),
       |edges AS (SELECT a_id AS u, b_id AS v FROM vp
       |          UNION ALL SELECT b_id, a_id FROM vp),
       |reach(u, v) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
       |comp AS (SELECT u AS doc_id, min(v) AS component
       |         FROM reach GROUP BY u)""".stripMargin

  private val componentsOracle: String =
    s"WITH RECURSIVE $componentsCte SELECT doc_id, component FROM comp"

  /** [[componentsOracle]] restricted to a filtered document set — the
    * takedown face's rebuild-without oracle (the maintained-store
    * deletion in [[StreamingQueries]] must relabel exactly like a
    * from-scratch clustering of the survivors). The closure CTE reads
    * `documents` exactly once (the shingle CTE), so the filter
    * substitutes at that single read and the rest of the pipeline is
    * verbatim [[componentsCte]].
    */
  private[operators] def componentsOracleFor(where: String): String =
    s"""WITH RECURSIVE ${componentsCte.replace("FROM documents",
        s"FROM (SELECT * FROM documents$where) documents")}
       |SELECT doc_id, component FROM comp""".stripMargin

  private val clusterHistOracle: String =
    s"""WITH RECURSIVE $componentsCte,
       |sz AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1)
       |SELECT CAST(length(bin(sz)) - 1 AS BIGINT) AS bucket,
       |  count(*) AS n_clusters, CAST(sum(sz) AS BIGINT) AS n_docs,
       |  min(sz) AS min_sz, max(sz) AS max_sz
       |FROM sz GROUP BY 1""".stripMargin

  /** Per-component argmax in deterministic two-step form (max, then min
    * doc_id among the maximal) — engine `arg_max` tie order is not
    * portable.
    */
  private val keepBestOracle: String =
    s"""WITH RECURSIVE $componentsCte,
       |q AS (SELECT doc_id,
       |        len(regexp_split_to_array(trim(text), '$WsRe')) AS n_words
       |      FROM documents),
       |j AS (SELECT c.component, c.doc_id, q.n_words
       |      FROM comp c JOIN q USING (doc_id)),
       |m AS (SELECT component, max(n_words) AS best_words,
       |        count(*) AS n_members
       |      FROM j GROUP BY component)
       |SELECT m.component, min(j.doc_id) AS keep_id,
       |  m.best_words, m.n_members
       |FROM j JOIN m ON j.component = m.component
       |  AND j.n_words = m.best_words
       |GROUP BY m.component, m.best_words, m.n_members""".stripMargin

  /** The same cluster-keyed assignment: components CTE + the
    * `sample_hash` md5-prefix bucket, singletons keyed by doc_id.
    */
  private val splitAssignOracle: String =
    s"""WITH RECURSIVE $componentsCte,
       |grp AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_group
       |        FROM documents d LEFT JOIN comp c USING (doc_id))
       |SELECT doc_id, split_group,
       |  CASE (('0x' || substr(md5(split_group::VARCHAR), 1, 8))::BIGINT % 20)
       |    WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train'
       |  END AS split
       |FROM grp""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_minhash_verified" -> minhashVerifiedOracle,
    "dedup_components" -> componentsOracle,
    "dedup_split_assign" -> splitAssignOracle,
    "dedup_lsh_recall" ->
      s"""SELECT t.a_id, t.b_id, (c.a_id IS NOT NULL) AS captured
         |FROM (SELECT a_id, b_id FROM ($jaccardOracle)
         |      WHERE jaccard >= 0.9) t
         |LEFT JOIN (SELECT DISTINCT a_id, b_id FROM ($minhashOracle)) c
         |  ON c.a_id = t.a_id AND c.b_id = t.b_id""".stripMargin,
    "dedup_keep_best" -> keepBestOracle,
    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "dedup_minhash_lsh" -> minhashOracle,
    // the same sig/band CTEs with the two sides split by the eval
    // modulus; candidates keep their band-match count, verification is
    // the exact-intersection probe, jac in integer basis points
    "dedup_decontam_lsh" -> {
      val mins = (0 until NumHashes)
        .map(i => s"min(substr(md5('${i / 4}:' || shingle), " +
          s"${(i % 4) * 8 + 1}, 8)) AS h$i")
        .mkString(", ")
      val bandRows = (0 until Bands)
        .map(b => s"SELECT doc_id, $b AS band, " +
          s"md5(h${2 * b} || h${2 * b + 1}) AS key FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
         |bands AS ($bandRows),
         |cand AS (SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
         |    CAST(count(*) AS BIGINT) AS n_bands
         |  FROM bands e JOIN bands t
         |    ON e.band = t.band AND e.key = t.key
         |   AND e.doc_id % $DecontamEvalMod = $DecontamEvalRem
         |   AND t.doc_id % $DecontamEvalMod <> $DecontamEvalRem
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.eval_id, c.train_id, count(*) AS i
         |          FROM cand c
         |          JOIN sh x ON x.doc_id = c.eval_id
         |          JOIN sh y ON y.doc_id = c.train_id
         |                  AND y.shingle = x.shingle
         |          GROUP BY 1, 2)
         |SELECT iv.eval_id, iv.train_id, c.n_bands,
         |  CAST(iv.i * 10000 // (x.n + y.n - iv.i) AS BIGINT) AS jac_bp
         |FROM inter iv
         |JOIN cand c ON c.eval_id = iv.eval_id AND c.train_id = iv.train_id
         |JOIN sz x ON iv.eval_id = x.doc_id
         |JOIN sz y ON iv.train_id = y.doc_id
         |WHERE iv.i * 10000 // (x.n + y.n - iv.i) >= $DecontamFloorBp"""
        .stripMargin
    },
    // same sigs, same candidates; agreement count vs the exact
    // multiset jaccard, all integer basis points
    "dedup_minhash_est" -> {
      val mins = (0 until NumHashes)
        .map(i => s"min(substr(md5('${i / 4}:' || shingle), " +
          s"${(i % 4) * 8 + 1}, 8)) AS h$i")
        .mkString(", ")
      val bandRows = (0 until Bands)
        .map(b => s"SELECT doc_id, $b AS band, " +
          s"md5(h${2 * b} || h${2 * b + 1}) AS key FROM sig")
        .mkString(" UNION ALL ")
      val m = (0 until NumHashes)
        .map(i => s"(CASE WHEN x.h$i = y.h$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
         |bands AS ($bandRows),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.key = b.key
         |          AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.a_id, c.b_id, count(*) AS i
         |          FROM cand c
         |          JOIN sh x ON x.doc_id = c.a_id
         |          JOIN sh y ON y.doc_id = c.b_id AND y.shingle = x.shingle
         |          GROUP BY 1, 2),
         |est AS (
         |  SELECT c.a_id, c.b_id,
         |    CAST(($m) * 10000 // $NumHashes AS BIGINT) AS est_bp
         |  FROM cand c JOIN sig x ON x.doc_id = c.a_id
         |  JOIN sig y ON y.doc_id = c.b_id),
         |jac AS (
         |  SELECT e.a_id, e.b_id, e.est_bp,
         |    CAST(coalesce(i.i, 0) * 10000
         |      // (sa.n + sb.n - coalesce(i.i, 0)) AS BIGINT) AS jac_bp
         |  FROM est e
         |  LEFT JOIN inter i ON i.a_id = e.a_id AND i.b_id = e.b_id
         |  JOIN sz sa ON sa.doc_id = e.a_id
         |  JOIN sz sb ON sb.doc_id = e.b_id)
         |SELECT a_id, b_id, est_bp, jac_bp,
         |  abs(est_bp - jac_bp) AS err_bp
         |FROM jac""".stripMargin
    },
    "dedup_cluster_hist" -> clusterHistOracle,
    // the full LSH pair SQL restricted to pairs with an arriving endpoint
    "dedup_incremental" -> (s"SELECT a_id, b_id, n_bands FROM (\n" +
      s"$minhashOracle\n) WHERE a_id % 10 = 7 OR b_id % 10 = 7"),
    "dedup_ngram_jaccard" -> jaccardOracle,
    "dedup_band_sweep" -> bandSweepOracle,
    "dedup_simhash" -> simhashOracle,
    "dedup_embedding_cosine" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4""".stripMargin,
    "dedup_threshold_sweep" ->
      """WITH p AS (
        |  SELECT list_cosine_similarity(a.embedding::DOUBLE[],
        |                                b.embedding::DOUBLE[]) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |h AS (SELECT CAST(floor(sim * 20) AS BIGINT) AS bucket_5pct,
        |        count(*) AS n_pairs
        |      FROM p GROUP BY 1)
        |SELECT bucket_5pct, n_pairs,
        |  CAST(sum(n_pairs) OVER (ORDER BY bucket_5pct DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_at_or_above
        |FROM h""".stripMargin,
    "dedup_containment" ->
      s"""WITH $shingleCte,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a_id, b_id FROM ($minhashOracle)),
         |common AS (
         |  SELECT p.a_id, p.b_id, count(*) AS n_common
         |  FROM pairs p
         |  JOIN sh sa ON sa.doc_id = p.a_id
         |  JOIN sh sb ON sb.doc_id = p.b_id AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2)
         |SELECT p.a_id, p.b_id, za.n_sh AS n_a, zb.n_sh AS n_b,
         |  coalesce(c.n_common, 0) AS n_common
         |FROM pairs p
         |JOIN sizes za ON za.doc_id = p.a_id
         |JOIN sizes zb ON zb.doc_id = p.b_id
         |LEFT JOIN common c ON c.a_id = p.a_id AND c.b_id = p.b_id""".stripMargin,
    "dedup_source_matrix" ->
      s"""WITH pairs AS (SELECT a_id, b_id FROM ($minhashOracle))
         |SELECT least(da.source, db.source) AS source_a,
         |  greatest(da.source, db.source) AS source_b,
         |  count(*) AS n_pairs
         |FROM pairs p
         |JOIN documents da ON da.doc_id = p.a_id
         |JOIN documents db ON db.doc_id = p.b_id
         |GROUP BY 1, 2""".stripMargin,
    "dedup_substring" ->
      s"""WITH g AS (
         |  ${substringGramSql("")}),
         |dup AS (SELECT gram FROM g GROUP BY gram
         |        HAVING count(DISTINCT doc_id) >= 2)
         |SELECT g.doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_dup,
         |  CAST((sum(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END)
         |        * 10000) // count(*) AS BIGINT) AS dup_bp
         |FROM g LEFT JOIN dup d ON d.gram = g.gram
         |GROUP BY g.doc_id""".stripMargin,
    "dedup_substring_pairs" -> substringPairsOracle,
    "dedup_substring_rewrite" -> substringRewriteOracle,
  )

  /** `dedup_substring_pairs`' oracle: the distinct (gram, doc) set,
    * the 2..[[SubBoilerMax]] carrier-count keep, the a<b self-join.
    */
  // lazy: declared after the `oracles` map that embeds it — a strict
  // val would still be null when the map initializes
  private lazy val substringPairsOracle: String =
    s"""WITH g AS (
       |  ${substringGramSql("")}),
       |gd AS (SELECT DISTINCT doc_id, gram FROM g),
       |kept AS (
       |  SELECT gram, doc_id FROM (
       |    SELECT gram, doc_id,
       |      count(*) OVER (PARTITION BY gram) AS nd FROM gd)
       |  WHERE nd BETWEEN 2 AND $SubBoilerMax)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
       |FROM kept a JOIN kept b
       |  ON a.gram = b.gram AND a.doc_id < b.doc_id
       |GROUP BY 1, 2""".stripMargin

  /** `dedup_substring_rewrite`'s oracle: the position-carrying window
    * rows, the ≥2-distinct-doc dup set, the gaps-and-islands interval
    * union (an island starts when a start clears the running max end),
    * and the kept-segment concatenation (middle pieces between
    * consecutive merged intervals, plus head via the lag default 1 and
    * tail via the NULL-capped last piece).
    */
  private lazy val substringRewriteOracle: String =
    s"""WITH gp AS (
       |  SELECT doc_id, i AS pos, substring(text, i, $SubL) AS gram
       |  FROM documents,
       |    unnest(generate_series(1, length(text) - ${SubL - 1})) t(i)
       |  WHERE length(text) >= $SubL
       |    AND (i = 1 OR substring(text, i - 1, 1) = ' ')),
       |dup AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM gp)
       |        GROUP BY gram HAVING count(*) >= 2),
       |ivg AS (
       |  SELECT doc_id, pos, pos + $SubL AS e,
       |    sum(CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM (
       |    SELECT doc_id, pos,
       |      max(pos + $SubL) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |    FROM gp JOIN dup USING (gram))),
       |merged AS (
       |  SELECT doc_id, grp, min(pos) AS s, max(e) AS e
       |  FROM ivg GROUP BY 1, 2),
       |pieces AS (
       |  SELECT doc_id,
       |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS f,
       |    s AS t
       |  FROM merged
       |  UNION ALL
       |  SELECT doc_id, max(e) AS f, NULL AS t FROM merged GROUP BY doc_id),
       |kept AS (
       |  SELECT p.doc_id,
       |    string_agg(CASE WHEN p.t IS NULL THEN substring(d.text, p.f)
       |      ELSE substring(d.text, p.f, p.t - p.f) END, ''
       |      ORDER BY p.f) AS kt
       |  FROM pieces p JOIN documents d USING (doc_id)
       |  GROUP BY p.doc_id),
       |st AS (
       |  SELECT doc_id, count(*) AS n_spans,
       |    CAST(sum(e - s) AS BIGINT) AS n_removed
       |  FROM merged GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(st.n_spans, 0) AS n_spans,
       |  coalesce(st.n_removed, 0) AS n_removed,
       |  coalesce(k.kt, d.text) AS kept_text
       |FROM documents d
       |LEFT JOIN st USING (doc_id)
       |LEFT JOIN kept k USING (doc_id)""".stripMargin

  /** The word-anchored window rows in SQL, with an optional extra
    * predicate — shared by the batch substring oracle and the
    * ingest-time gate's.
    */
  private def substringGramSql(extraWhere: String): String =
    s"""SELECT doc_id, substring(text, i, $SubL) AS gram
       |  FROM documents,
       |    unnest(generate_series(1, length(text) - ${SubL - 1})) t(i)
       |  WHERE length(text) >= $SubL
       |    AND (i = 1 OR substring(text, i - 1, 1) = ' ')$extraWhere""".stripMargin

  /** Modulus split of the ingest-time substring gate: residents are
    * `doc_id % SubResMod ≠ SubArrRem`, arrivals the rest.
    */
  private[operators] val SubResMod = 4L
  private[operators] val SubArrRem = 3L

  /** `stream_substring_rewrite`'s batch restatement: every ARRIVING
    * doc rewritten against the frozen RESIDENT gram set — the same
    * interval-union carve as `dedup_substring_rewrite`, with the dup
    * criterion swapped for the gate's one-direction membership probe
    * (an arrival's window is removed iff the identical string exists
    * in the resident corpus).
    */
  private[operators] lazy val substringRewriteGateOracle: String =
    s"""WITH gp AS (
       |  SELECT doc_id, i AS pos, substring(text, i, $SubL) AS gram
       |  FROM documents,
       |    unnest(generate_series(1, length(text) - ${SubL - 1})) t(i)
       |  WHERE length(text) >= $SubL
       |    AND (i = 1 OR substring(text, i - 1, 1) = ' ')
       |    AND doc_id % $SubResMod = $SubArrRem),
       |res AS (SELECT DISTINCT gram FROM (
       |  ${substringGramSql(s" AND doc_id % $SubResMod <> $SubArrRem")})),
       |ivg AS (
       |  SELECT doc_id, pos, pos + $SubL AS e,
       |    sum(CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM (
       |    SELECT doc_id, pos,
       |      max(pos + $SubL) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |    FROM gp JOIN res USING (gram))),
       |merged AS (
       |  SELECT doc_id, grp, min(pos) AS s, max(e) AS e
       |  FROM ivg GROUP BY 1, 2),
       |pieces AS (
       |  SELECT doc_id,
       |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS f,
       |    s AS t
       |  FROM merged
       |  UNION ALL
       |  SELECT doc_id, max(e) AS f, NULL AS t FROM merged GROUP BY doc_id),
       |kept AS (
       |  SELECT p.doc_id,
       |    string_agg(CASE WHEN p.t IS NULL THEN substring(d.text, p.f)
       |      ELSE substring(d.text, p.f, p.t - p.f) END, ''
       |      ORDER BY p.f) AS kt
       |  FROM pieces p JOIN documents d USING (doc_id)
       |  GROUP BY p.doc_id),
       |st AS (
       |  SELECT doc_id, count(*) AS n_spans,
       |    CAST(sum(e - s) AS BIGINT) AS n_removed
       |  FROM merged GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(st.n_spans, 0) AS n_spans,
       |  coalesce(st.n_removed, 0) AS n_removed,
       |  coalesce(k.kt, d.text) AS kept_text
       |FROM documents d
       |LEFT JOIN st USING (doc_id)
       |LEFT JOIN kept k USING (doc_id)
       |WHERE d.doc_id % $SubResMod = $SubArrRem""".stripMargin

  /** `stream_substring_gate`'s batch restatement: each ARRIVING doc's
    * window counters against the frozen RESIDENT gram set (one
    * direction only — the door probe never compares arrivals to each
    * other; cross-arrival dups surface in the nightly
    * `dedup_substring` sweep).
    */
  private[operators] val substringGateOracle: String =
    s"""WITH g AS (
       |  ${substringGramSql(s" AND doc_id % $SubResMod = $SubArrRem")}),
       |res AS (SELECT DISTINCT gram FROM (
       |  ${substringGramSql(s" AND doc_id % $SubResMod <> $SubArrRem")}))
       |SELECT g.doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN r.gram IS NOT NULL THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_dup,
       |  CAST((sum(CASE WHEN r.gram IS NOT NULL THEN 1 ELSE 0 END)
       |        * 10000) // count(*) AS BIGINT) AS dup_bp
       |FROM g LEFT JOIN res r ON r.gram = g.gram
       |GROUP BY g.doc_id""".stripMargin
}
