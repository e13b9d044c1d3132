package graft.operators

import graft.Tables
import graft.expressions.VectorFunctions.{centroidArgmax, vecCosine, vecCosinePre, vecDot, vecNorm}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** LLM-training-data pipeline operators over `documents.parquet` and
  * `embeddings.parquet`: deduplication (exact, MinHash+LSH, SimHash),
  * similarity search (brute-force and IVF cosine top-k, LSH embedding
  * near-dup), and text analysis (stats, language-ID, quality scoring,
  * fingerprinting).
  *
  * Scale posture (100 TB):
  *  - Signatures (MinHash, SimHash, fingerprints, LSH buckets) are
  *    computed as array expressions over each row — fully map-side, no
  *    explode, no shuffle until the group/join on the signature itself.
  *  - Near-dup candidate generation is ALWAYS per-bucket (LSH band
  *    buckets / hash buckets), never an all-pairs cross join.
  *  - Exact dedup is a hash-groupBy on the content digest — partial
  *    aggregation reduces each partition to one row per digest before
  *    the shuffle.
  *  - Brute-force top-k broadcasts the (small) query set and uses a
  *    salted two-level top-k so no single task sorts a whole query's
  *    candidate set; IVF prunes candidates to one cluster first.
  *  - All hashes derive from md5 (engine-portable); every query has an
  *    exact DuckDB twin in [[Pipeline.Sql]].
  *
  * The dedup/near-dup queries run over a corpus that deterministically
  * re-inserts a subset of documents (exact copies resp. perturbed
  * copies) so the operators demonstrably find duplicates — the raw
  * synthetic table is collision-free by construction.
  */
object Pipeline {

  /** Storage level for the WIDE persisted intermediates in this file —
    * relations carrying 64-dim vectors or per-row hash arrays (q24/q40
    * shingle hashes, the SRP signature stage, the IVF membership, the
    * quantized index, q51/q61's members and base). Cached as
    * deserialized batches these put millions of array objects on the
    * old-gen heap; under suite-wide pressure their GC cost showed up
    * as 2-3x wall-time swings on unchanged plans (driver bench r10:
    * q51 2.09→6.41 s). One serialized buffer per block keeps the cache
    * GC-cheap at the cost of a per-use deserialize — the right trade
    * for relations written once and scanned 2-3 times, and the posture
    * an executor on a real cluster wants at 100 TB (cache bytes, not
    * object graphs). */
  private val CacheLevel =
    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

  /** Storage level for the NARROW persisted intermediates (fixed-width
    * columns only: q49's gram hashes, q50's edge pairs, the coarse
    * assignment, q57-q59's token stats, q53's ≤64-row centroids).
    * These stay DESERIALIZED: their columnar batches are already
    * compact primitives with no per-row object population, so the
    * serialized level would only add a serialize+deserialize layer on
    * every one of their (multi-round, in q50's case) reads — measured
    * ~25% on q49/q50 wall time for zero GC relief. */
  private val NarrowCacheLevel =
    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private val NumMinhash = 16
  private val NumBands = 4
  private val RowsPerBand = 4

  /** The q131 sweep's banding configurations of the 16-hash signature:
    * (bands, rows_per_band) with bands·rows = 16, from maximally
    * recall-biased (16,1) to maximally precision-biased (2,8); (4,4)
    * is q24's production point. */
  private[operators] val BandingConfigs =
    Seq((16, 1), (8, 2), (4, 4), (2, 8))
  private val ShingleK = 3
  private val JaccardThreshold = 0.5
  /** q40's threshold: prefix-filter candidate volume scales with
    * (1-t)² — at 0.5 this corpus (small shared vocabulary, so even
    * "rare" grams recur across docs) generated 9.4M candidates; 0.8 is
    * the realistic near-dup bar and cuts prefixes to ~20% of grams. */
  private val NgramJaccardThreshold = 0.8
  private val CosineDupThreshold = 0.99
  private val TopK = 5
  private val NumQueries = 10
  private val EmbDims = 64
  /** SRP bucket-space sizing (q30): the number of hyperplane bits is
    * DERIVED FROM THE CORPUS SIZE so expected bucket occupancy stays
    * O(1) as rows grow — a fixed bit count means occupancy (and
    * per-bucket pair generation, which is quadratic) grows linearly
    * with the corpus. `bits = min b in [MinSrpBits, MaxHyperplanes]
    * with SrpTargetOccupancy * 2^b >= n` — all quantities exact in
    * IEEE doubles (b ≤ 32, n < 2^53), so the Spark plan and the DuckDB
    * twin derive the identical count from the identical n. */
  private val MaxHyperplanes = 32
  private val MinSrpBits = 8
  private val SrpTargetOccupancy = 4
  /** Target expected occupancy of a FINE cluster in
    * [[corpusScaledClusters]] — the knob that bounds the per-cluster
    * quadratic work in q51 and the per-query candidate list in q31. */
  private[operators] val ClusterTargetOccupancy = 32
  /** Bucket count of the index-at-rest membership table (q85): matches
    * the session's shuffle parallelism so a bucketed scan feeds every
    * core; at a real deployment size to cluster-count / file-size
    * targets, not to cores. */
  private val IvfIndexBuckets = 32

  /** Occupancy-driven bit derivation, the library's one scale knob
    * shape: the smallest `b` in [minBits, MaxHyperplanes] with
    * `targetOcc * 2^b >= n`, so expected bucket occupancy stays ≤
    * targetOcc as n grows. All quantities exact in IEEE doubles
    * (b ≤ 32, n < 2^53): the Spark plan and the DuckDB twins derive
    * the identical count from the identical n. */
  private[operators] def occBitsCol(n: Column, minBits: Int, targetOcc: Int): Column =
    coalesce(
      array_min(filter(sequence(lit(minBits), lit(MaxHyperplanes)),
        b => lit(targetOcc.toDouble) * pow(lit(2.0), b) >= n.cast("double"))),
      lit(MaxHyperplanes))

  /** The in-plan form of q30's bits derivation (shared with the DuckDB
    * twin's generate_series scan); `n` is the corpus row count. */
  private[operators] def srpBitsCol(n: Column): Column =
    occBitsCol(n, MinSrpBits, SrpTargetOccupancy)

  /** Sign-random-projection hyperplanes for q30: 32 × 64 ±1 entries
    * derived from md5 so both engines share the exact matrix (a plain
    * arithmetic parity formula turned out to have hidden periodicity —
    * entries repeating with period 256 made hyperplanes 4..7 copies of
    * 0..3 and collapsed the bucket space). Generated once at object
    * init; the DuckDB twin embeds the same values as a literal. Only
    * the first `bits` planes participate at a given corpus size (the
    * bucket mask, [[srpBitsCol]]); 32 covers target occupancy
    * [[SrpTargetOccupancy]] up to ~2^34 vectors. */
  private[operators] val hyperSigns: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until MaxHyperplanes).map { h =>
      (0 until EmbDims).map { i =>
        val b = md.digest(s"$h:$i".getBytes("UTF-8"))(0)
        if ((b & 1) == 1) 1.0 else -1.0
      }
    }
  }

  // ---------------------------------------------------------------- corpora

  /** Documents spread across partitions (see [[Tables.spread]]) —
    * every downstream query does per-row hash work. */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))

  /** Documents with exact duplicates re-inserted (doc_id % 7 == 0 →
    * second copy under doc_id + 1000000). */
  private def dupDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** Documents with NEAR duplicates re-inserted (doc_id % 11 == 0 → a
    * copy with three extra tokens appended, doc_id + 1000000). */
  private def nearDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    d.unionByName(
      d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" extra token tail")).as("text")))
  }

  /** Embeddings (as double arrays) with near-duplicate vectors
    * re-inserted: vec_id % 9 == 0 → a slightly perturbed copy
    * (per-dimension relative scale ±0.2%) under vec_id + 1000000. */
  private def dupEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(spark, dir))
    val base = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    // Two-step select: Spark's lateral column alias resolution would
    // otherwise bind the lambda's vec_id to the re-keyed alias
    // (vec_id + 1000000), silently phase-shifting the perturbation
    // (1000000 % 3 == 1) away from the DuckDB twin.
    val pert = e.filter(col("vec_id") % 9 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") * (lit(1.0) + lit(0.002) * ((col("vec_id") + i) % 3 - 1))).as("e"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("e"))
    base.unionByName(pert)
  }

  // ---------------------------------------------------------------- queries

  /** L1 — exact deduplication: group by content digest (md5), keep the
    * smallest doc_id per digest, report per-language kept/removed. The
    * digest groupBy partial-aggregates map-side; no sort, no window. */
  def q23ExactDedup(spark: SparkSession, dir: String): DataFrame =
    dupDocs(spark, dir)
      .select(col("lang"), md5(col("text").cast("binary")).as("h"), col("doc_id"))
      .groupBy(col("lang"), col("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .groupBy(col("lang"))
      .agg(sum(col("n_copies")).as("n_docs_in"),
        count(lit(1)).as("n_docs_kept"),
        (sum(col("n_copies")) - count(lit(1))).as("n_dups_removed"))
      .orderBy(col("lang"))

  /** L2 — MinHash + LSH near-duplicate detection: word-3-shingles →
    * 16-hash MinHash signature → 4 bands of 4 → candidate pairs ONLY
    * within equal (band, band-signature) buckets → exact Jaccard
    * verification ≥ 0.5 on the candidates.
    *
    * The signature is computed as explode + 16 `min` aggregates — a
    * fully codegen'd hash aggregation with map-side partial combine —
    * NOT as nested array lambdas: higher-order functions evaluate
    * interpreted, and nesting them re-evaluates the inner array (here:
    * every shingle hash) once per outer element — 16× the md5 work per
    * document (measured 50× slower end-to-end). min over the exploded
    * multiset equals min over the distinct set, so the oracle's
    * list_min form is unchanged. */
  def q24NearDupMinhash(spark: SparkSession, dir: String): DataFrame =
    verifiedNearDupPairs(nearDocs(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  /** The MinHash+LSH near-dup pipeline over any `(doc_id, text)`
    * corpus, returning verified pairs `(doc_a, doc_b, jaccard ≥ 0.5)`.
    * Shared by [[q24NearDupMinhash]] (pair listing) and
    * [[q50DedupClusters]] (edge set for connected components).
    *
    * The hash-set relation is referenced three times (signature
    * computation + both sides of candidate verification); without
    * materialization Spark re-derives the full md5/shingle pipeline at
    * each reference. One serialized cached copy replaces two full
    * re-derivations — the in-session analog of materializing the
    * signature stage as a table (Layout.writeBucketed) in a production
    * pipeline, where this stage would be persisted storage anyway.
    * What persists is the SORTED DISTINCT HASH array, not the shingle
    * strings: 8 bytes per gram instead of a ~20-char string, and
    * verification becomes the codegen'd two-pointer intersect over
    * sorted longs (same construction as q40; the DuckDB twin hashes
    * identically, so parity is exact). The single-level `transform`
    * evaluates md5 once per element — safe; only NESTED lambdas
    * re-evaluate inner arrays (the 50× trap in the scaladoc above). */
  /** Sorted distinct word-3-shingle hash sets `(doc_id, hs)` — the
    * base relation the whole MinHash family derives from
    * (q24/q50/q102/q124 via [[verifiedNearDupPairs]]; q131 directly).
    * Returned UNPERSISTED: each consumer owns its residency. */
  private def shingleHashSets(corpus: DataFrame): DataFrame =
    // r21: ONE native compiled pass per row (ShingleHashSorted) — the
    // zip_with shingle fold + per-shingle interpreted md5 transform +
    // distinct + sort chain was the dedup family's dominant map-side
    // cost (guide §4); hashes are bit-identical (spec-pinned) and the
    // n < k empty-array / size filter semantics are unchanged
    corpus
      .withColumn("hs", graft.expressions.DedupFunctions
        .shingleHashSetSorted(split(col("text"), " "), ShingleK))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), col("hs"))

  /** 16-hash MinHash signatures `(doc_id, msig)` over the hash-set
    * relation: explode + 16 codegen'd `min` aggregates with map-side
    * partial combine (see the q24 scaladoc for why NOT nested array
    * lambdas — the 50× interpreted-re-evaluation trap). */
  private def minhashSigs(base: DataFrame): DataFrame =
    // r21: map-side native signature (MinhashSigNative) — the explode +
    // 16-min aggregation paid a full exchange of the exploded multiset
    // per sweep; the compiled per-row pass removes that Exchange
    // outright (guide §2.4) and computes the identical mins
    base.select(col("doc_id"), graft.expressions.DedupFunctions
      .minhashSigNative(col("hs"), NumMinhash).as("msig"))

  private[graft] def verifiedNearDupPairs(corpus: DataFrame): DataFrame = {
    val base = shingleHashSets(corpus).persist(CacheLevel)
    val sigs = minhashSigs(base)
    val bands = sigs.select(col("doc_id"),
      posexplode(lshBands(col("msig"), NumBands, RowsPerBand)).as(Seq("b", "bsig")))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = base.select(col("doc_id").as("doc_a"),
      col("hs").as("ha"), size(col("hs")).as("na"))
    val sb = base.select(col("doc_id").as("doc_b"),
      col("hs").as("hb"), size(col("hs")).as("nb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter",
        graft.expressions.VectorFunctions.sortedIntersectSize(
          col("ha"), col("hb")).cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** L3 — brute-force cosine top-k: the query set (vec_id < 10) is
    * broadcast against all vectors; ranking is the bounded top-k
    * AGGREGATOR (`functions.TopK`) — each scan partition reduces to a
    * k-element buffer map-side and only #partitions × k rows reach the
    * shuffle. No window, no sort of any candidate list anywhere
    * (replaces the earlier salted two-level `row_number`, which still
    * paid two shuffle+sort stages); ordering (cosine desc, vec_id asc)
    * is identical, asserted interchangeable in TopKSpec. */
  def q25SimilarityTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"), vecNorm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(vecDot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(TopK, col("vec_id"), col("cosine")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("vec_id"), col("s.score").as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** L4 — per-language text statistics: token counts (whitespace and a
    * BPE-ish ≤4-char-chunk regex), type-token ratio, stopword ratio,
    * punctuation ratio, and a composite quality score. Pure scan →
    * map-side projections → partial-aggregated rollup. */
  def q26TextStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val ttr = size(array_distinct(toks)) / nTok
    val stopRatio = size(filter(toks, t => t === "the" || t === "a")) / nTok
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val punctRatio = punct / length(col("text"))
    val bpe = size(regexp_extract_all(col("text"), lit("[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9 ]"), lit(0)))
    val quality = least(lit(1.0), nTok / 200.0) * 0.5 + ttr * 0.3 +
      (lit(1.0) - least(lit(1.0), punctRatio * 5)) * 0.2
    docs(spark, dir)
      .select(col("lang"), length(col("text")).as("n_chars_txt"),
        nTok.as("n_tokens"), ttr.as("ttr"), stopRatio.as("stop_ratio"),
        punctRatio.as("punct_ratio"), bpe.as("bpe_tokens"), quality.as("quality"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars_txt")), 2).as("avg_chars"),
        round(avg(col("n_tokens")), 2).as("avg_tokens"),
        round(avg(col("bpe_tokens")), 2).as("avg_bpe_tokens"),
        round(avg(col("ttr")), 4).as("avg_ttr"),
        round(avg(col("stop_ratio")), 4).as("avg_stop_ratio"),
        round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy(col("lang"))
  }

  /** L4 — marker-word language identification: score each language by
    * its stopword hits, argmax with a fixed precedence order, emit the
    * (actual, predicted) confusion matrix. (The synthetic corpus draws
    * all languages from one English-ish vocabulary, so the classifier
    * legitimately predicts 'en' — the oracle checks the mechanism.) */
  def q27LangId(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    def score(words: String*): Column =
      size(filter(toks, t => words.map(w => t === w).reduce(_ || _)))
    val sEn = score("the", "a", "of")
    val sDe = score("der", "und", "das")
    val sEs = score("el", "la", "los")
    val sFr = score("le", "les", "une")
    val predicted =
      when(sEn > 0 && sEn >= sDe && sEn >= sEs && sEn >= sFr, "en")
        .when(sDe > 0 && sDe >= sEs && sDe >= sFr, "de")
        .when(sEs > 0 && sEs >= sFr, "es")
        .when(sFr > 0, "fr")
        .otherwise("und")
    docs(spark, dir)
      .select(col("lang"), predicted.as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** L2 — 16-bit SimHash signature per document (frequency-weighted ±1
    * bit votes over token hashes). Map-side only; equal signatures mark
    * near-dup clusters at scale via a signature groupBy. */
  def q28Simhash(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("hs", transform(split(col("text"), " "), t => portableHashMod(t)))
      .select(col("doc_id"), simhash16(col("hs")).as("simhash"))
      .orderBy(col("doc_id"))

  /** L4 — position-weighted rolling-hash fingerprint per document:
    * order-sensitive content identity for shard-level change detection. */
  def q29Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), fingerprint(split(col("text"), " ")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** L2 — embedding near-duplicate detection via sign-random-projection
    * LSH: deterministic ±1 hyperplanes (md5-derived matrix, see
    * [[hyperSigns]]) → a `bits`-bit bucket per vector → candidate pairs
    * only within a bucket → cosine ≥ 0.99 verification. Runs over the
    * corpus with perturbed near-copies re-inserted. The bucket space
    * SCALES WITH THE CORPUS ([[srpBitsCol]]): expected occupancy stays
    * ≤ [[SrpTargetOccupancy]], so per-bucket pair generation stays O(1)
    * per row at any scale instead of growing linearly with n. The bit
    * count is derived in-plan from a broadcast one-row count relation —
    * no driver-side action, and the counting scan column-prunes to
    * vec_id alone (the dup-branch filter needs it). */
  /** The 32-bit sign-random-projection signature of a double-array
    * column: one codegen'd native dot per hyperplane against a literal
    * plane vector — not a transform-over-planes HOF, whose nested
    * lambdas would evaluate interpreted and re-dispatch per element.
    * Masking the result to its low b bits IS bucketing on the first b
    * hyperplanes (the consumers each derive their own b). */
  private[operators] def srpSignature(e: Column): Column =
    (0 until MaxHyperplanes).map { h =>
      when(vecDot(e, typedlit(hyperSigns(h))) > 0, lit(1L << h)).otherwise(0L)
    }.reduce(_ + _)

  /** The SRP bucket signature masked to a FIXED `bits` hyperplanes —
    * the public form of [[srpSignature]] for consumers that cannot
    * corpus-scale the bit count in-plan. The streaming dedup twin
    * ([[graft.streaming.Dedup.dedupEmbedding]]) is the canonical user:
    * an unbounded stream has no corpus count to derive bits from, so
    * bits is its capacity knob, sized to the expected in-horizon
    * volume. Same hyperplane matrix as every batch consumer, so batch
    * and stream agree bucket-for-bucket at equal bits. */
  def srpBucket(e: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= MaxHyperplanes,
      s"bits must be in [1, $MaxHyperplanes], got $bits")
    srpSignature(e).bitwiseAND(lit((1L << bits) - 1))
  }

  def q30EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = dupEmbeddings(spark, dir)
    val maskRel = emb.agg(count(lit(1)).as("n"))
      .select((pow(lit(2.0), srpBitsCol(col("n"))).cast("long") - 1L).as("mask"))
    // persisted: the signature stage (32 plane dots per row + the
    // corpus count) feeds BOTH sides of the bucket self-join — one
    // serialized cached copy replaces a full second derivation (same
    // rationale as q24's persisted hash arrays / q31's assignment)
    val bucketed = emb.crossJoin(broadcast(maskRel))
      .withColumn("cluster", srpSignature(col("e")).bitwiseAND(col("mask")))
      // r22: the norm rides the cache (one loop per vector at fill
      // time) so the verification filter below runs one dot per pair
      // instead of three (vecCosinePre)
      .select(col("vec_id"), col("e"), vecNorm(col("e")).as("en"),
        col("cluster"), col("mask"))
      .persist(CacheLevel)
    // one side is Hamming-1 MULTI-PROBED (hammingProbes): as the bit
    // count scales with the corpus, the chance a true dup pair is split
    // by one hyperplane grows with it — probing the one-bit flips keeps
    // recall flat for an O(bits) expansion of one join side (the same
    // trade as q51's dominance side)
    val x = hammingProbes(bucketed)
      .select(col("vec_id").as("vec_a"), col("e").as("ea"),
        col("en").as("na"), col("cluster"))
    val y = bucketed.select(col("vec_id").as("vec_b"), col("e").as("eb"),
      col("en").as("nb"), col("cluster"))
    // no distinct needed: with only the x side probed, an ordered pair
    // meets at most once — a's probe buckets are pairwise-distinct and
    // b occupies exactly one of them; the mirror meeting (b's probe
    // into a's bucket) is the (b, a) ordering, dropped by the < filter
    x.join(y, Seq("cluster")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        round(vecCosinePre(col("ea"), col("na"), col("eb"), col("nb")), 4))
      .filter(col("cosine") >= CosineDupThreshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Per-label mean vectors of the base embeddings table — the coarse
    * centroid relation shared by [[q31IvfAnn]] (IVF index) and
    * [[q51SemanticDedup]] (cluster scoping). */
  private[operators] def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, dir))
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("v").cast("double")), 6).as("cavg"))
      .groupBy(col("label"))
      .agg(collect_list(struct(col("pos"), col("cavg"))).as("tmp"))
      .select(col("label"),
        transform(array_sort(col("tmp")), s => s.getField("cavg")).as("cvec"))

  /** Nearest-centroid assignment of `(vec_id, e)` rows: broadcast
    * crossJoin + portable argmax, returning `(vec_id, cluster)`.
    * Tie-break key: cos6 has 1e-6 granularity, so the 1e12 multiplier
    * keeps one cosine step worth 1e6 in the key — label ids up to 1e6
    * can never outweigh a genuine cosine difference (exact in doubles:
    * |key| < 1e12 + 1e6 << 2^53); the DuckDB twins embed the identical
    * formula. */
  private def assignToCentroids(e: DataFrame, cent: DataFrame): DataFrame =
    // r22: norms hoisted below the corpus × centroids cross join
    // (vecCosinePre — the vector norm ran once per CENTROID, the
    // centroid norm once per corpus row; now once each)
    e.withColumn("ne", vecNorm(col("e")))
      .crossJoin(broadcast(cent.withColumn("nc", vecNorm(col("cvec")))))
      .withColumn("cos6",
        round(vecCosinePre(col("e"), col("ne"), col("cvec"), col("nc")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("label"), col("cos6") * 1000000000000.0 + col("label")).as("cluster"))

  /** CORPUS-SCALED fine clustering for the embedding dedup/ANN family
    * (q31/q51): nearest-centroid coarse assignment subdivided per
    * cluster by sign-random-projection bits, with each cluster's bit
    * count derived from its OWN occupancy ([[occBitsCol]]: smallest b
    * with `targetOcc * 2^b >= n_c`). The effective cluster count is
    * `Σ_c 2^(b_c)` — it grows with the corpus so expected fine-cluster
    * occupancy stays ≤ targetOcc at any scale, and it adapts to skew
    * (an oversized coarse cluster gets more hyperplane bisections, a
    * small one none).
    *
    * Why subdivision instead of re-deriving k ∝ n centroids (k-means):
    * nearest-centroid assignment is O(n·k·d) work against a broadcast
    * relation of k vectors — with k ∝ n that is quadratic total work
    * and an unbroadcastable centroid set at the 100 TB design point.
    * Hyperplane subdivision reaches the same bounded occupancy with
    * O(n·d) map-side work per row, a constant 10-row broadcast, and
    * one 10-row occupancy aggregate — nothing in the plan grows with
    * the corpus except the data itself. The recall trade is explicit
    * and small: two cosine-θ neighbours stay together per bisection
    * w.p. 1 − θ/π (≥ 0.9985 per bit at the 0.99 dup threshold).
    *
    * Returns `(vec_id, e, cluster, mask)` with `cluster = coarse · 2^32
    * + subbucket` (exact in longs; coarse labels are small ints) and
    * `mask` = the cluster's active sub-bucket bits (for
    * [[hammingProbes]]). Both DuckDB twins derive the identical ids. */
  def corpusScaledClusters(e: DataFrame, cent: DataFrame, targetOcc: Int): DataFrame =
    corpusScaledClustersWithRelease(e, cent, targetOcc)._1

  /** As [[corpusScaledClusters]], plus the release for the internal
    * assignment cache. The (vec_id, coarse) assignment is the expensive
    * stage (centroid crossJoin + argmax) and feeds BOTH the occupancy
    * aggregate and the member join, so it persists (narrow 16-byte
    * pairs, not vectors — q31's persisted-IVF-index rationale). Within
    * one registered query (q31/q51) the cache is session-scoped like
    * every other persisted stage here — the bench's clearCache reclaims
    * it; callers that build MANY clusterings in one session (tests,
    * tuning sweeps) should invoke the release once their derived
    * relation is materialized, or the caches accumulate. */
  def corpusScaledClustersWithRelease(e: DataFrame, cent: DataFrame,
      targetOcc: Int): (DataFrame, () => Unit) = {
    val asg = assignToCentroids(e, cent)
      .persist(NarrowCacheLevel)
    val occ = asg.groupBy(col("cluster")).agg(count(lit(1)).as("n_c"))
    // `mask` (the cluster's active sub-bucket bits) rides along so
    // consumers can MULTI-PROBE: enumerate Hamming-neighbour sub-buckets
    // without re-deriving the per-cluster bit count
    val fine = e.join(asg, "vec_id").join(broadcast(occ), "cluster")
      .withColumn("mask",
        pow(lit(2.0), occBitsCol(col("n_c"), 0, targetOcc)).cast("long") - 1L)
      .select(col("vec_id"), col("e"),
        (col("cluster").cast("long") * lit(4294967296L) +
          srpSignature(col("e")).bitwiseAND(col("mask"))).as("cluster"),
        col("mask"))
    (fine, () => { asg.unpersist(blocking = false); () })
  }

  /** [[corpusScaledClusters]] as PURE MAP STAGES over `base` — zero
    * joins, zero exchanges, nothing resident. `base` is scanned twice
    * (the occupancy pass here, plus the caller materializing the
    * result); callers that read the returned membership repeatedly
    * persist IT, the one copy worth keeping (q51/q61).
    * The centroid relation is collected (a bounded
    * snapshot: k is corpus-scaled but capped at 64 — the same
    * bounded-by-construction discipline as q60's 3-row sketch) into
    * the [[graft.expressions.CentroidArgmax]] native expression, so
    * the coarse argmax runs per-row as two codegen'd Java loops; the
    * per-coarse occupancy (≤ 64 rows, one partial-aggregated pass over
    * `base`) re-enters the plan as a map literal for the per-cluster
    * sub-bucket mask.
    *
    * Why this exists (VERDICT r11 §next-1): q51/q61 used to persist
    * the fine membership AS WELL AS the base embeddings — two resident
    * wide copies that evicted each other under the driver bench's heap
    * pressure (q61 samples 6.96/8.47/11.29 s on identical code, flat
    * GC). The join-based assignment forced that double residency: its
    * crossJoin + argmax aggregate + corpus join-back re-ran the whole
    * pipeline on every read unless both stages were cached. As two map
    * stages the membership derivation costs ~100 codegen'd dot
    * products per row on top of a parquet scan, so only the RESULT is
    * worth keeping resident — at 100 TB the difference between caching
    * the corpus once and caching it twice.
    *
    * Semantics are IDENTICAL to [[corpusScaledClusters]]: same
    * cos6·1e12+label argmax key (the key embeds the label, so ties
    * resolve to the larger label exactly like max_by's tie-break
    * column — parity asserted in VectorExpressionsSpec), same
    * occupancy-derived bit counts, same composite cluster id; the
    * DuckDB twins are untouched. */
  private[operators] def mapSideFineClusters(base: DataFrame, cent: DataFrame,
      targetOcc: Int): DataFrame =
    mapSideFineClustersWithRouting(base, cent, targetOcc)._1

  /** As [[mapSideFineClusters]], also returning the bounded ROUTING
    * relation `(label, cvec, mask)` — one row per coarse centroid with
    * its sub-bucket mask — which is exactly what a persisted index
    * needs to assign EXTERNAL query vectors at serve time
    * ([[graft.operators.Layout.writeIvfIndex]]). */
  private[operators] def mapSideFineClustersWithRouting(base: DataFrame,
      cent: DataFrame, targetOcc: Int): (DataFrame, DataFrame) = {
    val spark = base.sparkSession
    import spark.implicits._
    val cents = cent
      .select(col("label").cast("long").as("label"),
        col("cvec").cast("array<double>").as("cvec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    require(cents.nonEmpty, "empty centroid relation")
    // the argmax is ONE native expression (two nested Java loops over
    // reference objects), not a k-literal array_max — at k = 64 the
    // literal form blew the JIT method limit and ran uncompiled
    val coarse = centroidArgmax(col("e"), cents)
    // one bounded aggregate pass over (the caller's cached) base: the
    // coarse occupancy that sizes each cluster's sub-bucket bit count
    val occ = base.select(coarse.as("coarse"))
      .groupBy(col("coarse")).agg(count(lit(1)).as("n_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side twin of [[occBitsCol]](n, 0, targetOcc): smallest b
    // with targetOcc·2^b ≥ n_c — identical double comparison, so the
    // literal masks match the in-plan derivation bit for bit
    def occBits(n: Long): Int =
      (0 to MaxHyperplanes).find(b =>
        targetOcc.toDouble * math.pow(2.0, b) >= n.toDouble)
        .getOrElse(MaxHyperplanes)
    val masks: Map[Long, Long] =
      occ.map { case (c, n) => (c, (1L << occBits(n)) - 1L) }.toMap
    val maskCol = element_at(typedlit(masks), coarse)
    val members = base.select(col("vec_id"), col("e"),
      (coarse * lit(4294967296L) +
        srpSignature(col("e")).bitwiseAND(maskCol)).as("cluster"),
      maskCol.as("mask"))
    // a centroid that attracted no member subdivides nothing: mask 0
    // (= occBits(0)), same as the in-plan derivation would produce
    val routing = cents
      .map { case (l, v) => (l, v, masks.getOrElse(l, 0L)) }
      .toDF("label", "cvec", "mask")
    (members, routing)
  }

  /** Hamming-1 MULTI-PROBE expansion of a fine-cluster relation: each
    * row is emitted under its own cluster AND under every cluster that
    * differs in exactly one active sub-bucket bit. The recall
    * counterpart of the occupancy bound: at the 100 TB design point the
    * per-cluster bit count b_c grows to ~30, so a true cosine-0.99 pair
    * lands in different sub-buckets with probability ~1−(1−θ/π)^b ≈ 4% —
    * probing the b_c one-bit flips recovers every single-plane split
    * (residual misses need ≥2 flipped planes, ~0.1%) for an O(b_c) row
    * expansion, the classic multi-probe LSH trade. XOR on the composite
    * id flips only sub-bucket bits (the coarse label lives above bit
    * 32; probe bits are masked to the active sub-bits).
    *
    * The probe rows CARRY the vector deliberately: verification needs
    * both vectors per candidate, and candidates outnumber probe rows by
    * the expected bucket occupancy — fetching vectors per candidate via
    * a join-back would shuffle strictly more bytes than carrying them
    * per probe whenever occupancy ≥ 1 (it always is; the targets are 4
    * and 32). Carrying `e` keeps the cosine inside the cluster-join
    * stage with zero post-join exchanges. */
  private[operators] def hammingProbes(rel: DataFrame): DataFrame = {
    val flips = filter(
      transform(sequence(lit(0), lit(MaxHyperplanes - 1)),
        j => when(col("mask").bitwiseAND(pow(lit(2.0), j).cast("long")) =!= 0L,
          col("cluster").bitwiseXOR(pow(lit(2.0), j).cast("long")))),
      x => x.isNotNull)
    // carry columns (r22): anything beyond the consumed cluster/mask —
    // e.g. a caller-hoisted norm column — rides through the expansion
    rel.select(rel.columns.filter(c => c != "cluster" && c != "mask")
      .map(col) :+ explode(concat(array(col("cluster")), flips)).as("cluster"): _*)
  }

  /** QUERY-side multi-probe expansion — the serve-time nprobe knob.
    * Each input row (any carry columns + `cluster` + `mask`) is emitted
    * once per probe cluster: its home sub-bucket plus every sub-bucket
    * within Hamming distance `radius` over the ACTIVE bits (`mask`).
    * Radius 0 is the identity (no Generate node — q31/q85's plans are
    * untouched); radius 1 adds the ≤ b_c one-bit flips (the
    * configuration q114 measured at 4.3× recall for 3.7× candidates);
    * radius 2 adds the b_c·(b_c−1)/2 two-bit flips. All probe ids are
    * pairwise DISTINCT (XOR of distinct bit subsets), and a member
    * lives in exactly one cluster, so the candidate join never
    * duplicates a (query, member) pair — no post-join dedup.
    *
    * Scale posture (100 TB): the expansion multiplies only the QUERY
    * side — O(1 + b + b²/2) rows per query, b ≤ 32 — which stays
    * broadcast at any corpus size; candidates stay
    * O(occupancy × probes) per query (occupancy ≤ the build target by
    * construction). `mask` is dropped so the expanded relation is
    * exactly what the candidate join broadcasts. */
  private[operators] def probeExpand(qrel: DataFrame, radius: Int): DataFrame = {
    require(radius >= 0 && radius <= 2, s"probe radius 0..2, got $radius")
    if (radius == 0) return qrel.drop("mask")
    def bit(j: Column): Column = pow(lit(2.0), j).cast("long")
    def active(j: Column): Column = col("mask").bitwiseAND(bit(j)) =!= 0L
    val one = filter(
      transform(sequence(lit(0), lit(MaxHyperplanes - 1)),
        j => when(active(j), col("cluster").bitwiseXOR(bit(j)))),
      x => x.isNotNull)
    val probes =
      if (radius == 1) concat(array(col("cluster")), one)
      else {
        // j strictly below k, so j tops out at MaxHyperplanes−2 and the
        // inner sequence is never descending
        val two = filter(
          flatten(transform(sequence(lit(0), lit(MaxHyperplanes - 2)), j =>
            transform(sequence(j + lit(1), lit(MaxHyperplanes - 1)), k =>
              when(active(j) && active(k),
                col("cluster").bitwiseXOR(bit(j)).bitwiseXOR(bit(k)))))),
          x => x.isNotNull)
        concat(array(col("cluster")), one, two)
      }
    qrel.withColumn("cluster", explode(probes)).drop("mask")
  }

  /** L3 — IVF approximate nearest neighbour with a CORPUS-SCALED list
    * count: the inverted lists are [[corpusScaledClusters]]'s fine
    * clusters (label centroids subdivided to ≤ 32 expected occupancy),
    * so the effective nlist grows with the corpus and each query's
    * nprobe=1 candidate list stays O(1) rows at any scale — a fixed
    * nlist would let candidate lists grow as n/nlist. Ranking is the
    * bounded [[graft.functions.TopK]] Aggregator (the q25 swap, proven
    * interchangeable in TopKSpec): each partition reduces to a
    * k-element buffer map-side — no WindowExec, no per-query sort of
    * the whole candidate list through one task. */
  def q31IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    // The fine-cluster membership is the IVF index: it feeds both the
    // query-set lookup and the member lists. Real IVF systems persist
    // the index by construction; one cached copy is its in-session
    // analog — the cross-session form is q85's [[Layout.writeIvfIndex]].
    // Built by pure map stages (the q51/q61 single-persist shape): the
    // ONE resident relation is the membership itself.
    val members = mapSideFineClusters(e,
      labelCentroids(spark, dir), ClusterTargetOccupancy)
      .persist(CacheLevel)
    // eager internal-row materialization (count, not foreach: foreach
    // would deserialize every row to an external Row — ADVICE r7)
    members.count()
    annServe(members)
  }

  /** The IVF serve path shared by q31 (in-session index), q85 (index
    * at rest) and q118 (multi-probe): candidate lists via the
    * corpus-query cluster join, ranked by the bounded
    * [[graft.functions.TopK]] Aggregator — one query_id exchange over
    * O(occupancy × probes)-per-query candidate rows plus the
    * ≤ queries·k result sort, regardless of corpus size. `probeRadius`
    * is the serve-time nprobe knob ([[probeExpand]]): the INDEX is
    * untouched, only the broadcast query relation widens, so a
    * deployment retunes recall without rebuilding anything. */
  private[operators] def annServe(members: DataFrame, probeRadius: Int = 0): DataFrame = {
    val q = probeExpand(
      members.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("e").as("qe"),
          col("cluster"), col("mask"))
        // r22: norms hoisted below the candidate join (vecCosinePre —
        // one norm loop per row instead of per candidate pair)
        .withColumn("nq", vecNorm(col("qe"))),
      probeRadius)
    val scored = members.withColumn("ne", vecNorm(col("e")))
      .join(broadcast(q), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(vecCosinePre(col("qe"), col("nq"), col("e"), col("ne")), 4))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(TopK, col("vec_id"), col("cosine")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("vec_id"), col("s.score").as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Session-stable table name for the persisted IVF index of one
    * data directory (the sf dirs produce distinct names, so a test at
    * sf0.001 can never serve a stale sf0.01 index). */
  private[graft] def ivfIndexTable(dir: String): String =
    "graft_ivf_" + dir.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** L3 — ANN served from the index AT REST (VERDICT r11 §next-2):
    * build-if-absent, then serve every query from the persisted
    * cluster-bucketed membership with ZERO re-clustering — no centroid
    * pass, no assignment pass, no persist; the serve plan's members
    * side is a plain bucketed scan, exchange-free on `cluster`
    * (LayoutSpec proves the property on the read path). Result is
    * row-identical to q31 (same build pipeline, same serve) — the
    * oracle twin IS q31's.
    *
    * The production split this encodes: index construction is INGEST
    * work, paid once per corpus version by `Layout.writeIvfIndex`;
    * queries pay only lookup + rank. Within one session the build runs
    * at most once (`tableExists`); across sessions the files persist
    * but the default in-memory catalog forgets them, so a fresh
    * session rebuilds — on a real deployment the metastore carries the
    * metadata and the rebuild disappears entirely. */
  def q85IndexedAnn(spark: SparkSession, dir: String): DataFrame =
    annServe(spark.table(ensureIvfIndex(spark, dir)))

  /** Largest prime below 2^63 — the modulus of the fingerprint's sum
    * accumulator (see [[corpusFingerprint]]). */
  private val FpSumPrime = new java.math.BigDecimal("9223372036854775783")

  /** Order-independent CONTENT fingerprint of a corpus relation:
    * `(row count, XOR of per-row xxhash64 over every column cast to
    * string, SUM of the same hashes in decimal(38,0) mod the largest
    * prime < 2^63)` — the rebuild-on-mismatch guard behind every
    * banked artifact (ADVICE r15: an index/codebook keyed only by
    * directory NAME silently serves stale state after the corpus is
    * regenerated in place). XOR and modular sum are both
    * commutative/associative (partitioning cannot move them) and
    * never overflow (the sum is lifted to decimal(38,0) before the
    * reduction — the q122 checksum discipline); the SUM accumulator
    * exists because XOR alone cancels duplicate rows pairwise (ADVICE
    * r17: an all-even-multiplicity corpus XORs to 0, and swapping one
    * duplicated pair for another preserves count and XOR — the sum
    * counts multiplicity, so neither slips past). The string cast is
    * Spark's deterministic rendering, covering nested arrays. Cost:
    * one map + partial-agg scan of the corpus per (session, artifact)
    * — cheap beside any build, and paid ONCE per session per artifact
    * ([[ensureCurrent]]'s memo); a production deployment replaces the
    * scan with a catalog-carried corpus VERSION (O(1)); the content
    * hash is the stand-in for sources without one. */
  private[graft] def corpusFingerprint(rel: DataFrame): (Long, Long, Long) = {
    val h = xxhash64(
      rel.columns.toIndexedSeq.map(c => col(c).cast("string")): _*)
    val r = rel.agg(count(lit(1)).as("n"),
      coalesce(bit_xor(h), lit(0L)).as("h"),
      coalesce(pmod(sum(h.cast(DecimalType(38, 0))), lit(FpSumPrime)),
        lit(java.math.BigDecimal.ZERO)).cast("long").as("s")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Presence tables [[ensureCurrent]] has already verified, per
    * session — the memo that keeps the fingerprint scan out of serve
    * loops (ADVICE r17: `Retrieve.hybridServeAtRest` binds the ensure
    * per micro-batch, so an unmemoized ensure paid two corpus scans
    * per request batch). Weak keys: a closed session's entries
    * GC away with it. The trade is explicit: an in-session
    * regenerate-in-place of the CORPUS is no longer auto-detected —
    * call [[invalidateEnsured]] after one (the analog of bumping a
    * catalog corpus version; cross-session staleness detection is
    * unchanged, because a fresh session starts with an empty memo). */
  private val ensuredMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.Set[String]]())

  /** Per-presence-table build locks: two threads ensuring the SAME
    * artifact serialize (a concurrent dropManagedTable + saveAsTable
    * race would corrupt it — review r18), while ensures of different
    * artifacts never block each other. Keyed globally by table name;
    * cross-session contention on one name is harmless
    * serialization. */
  private val ensureLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Forget this session's ensure memo: the next ensure per artifact
    * re-runs the fingerprint compare (and rebuild on mismatch). Specs
    * that regenerate a corpus in place call this where a production
    * deployment would bump the catalog corpus version. */
  private[graft] def invalidateEnsured(spark: SparkSession): Unit = {
    ensuredMemo.remove(spark); ()
  }

  /** Build-if-absent-or-STALE: run `build` unless the `presence` table
    * exists AND its stored corpus fingerprint equals `fp`; record `fp`
    * beside the artifact after every build. Memoized per (session,
    * presence): the first call per session pays the fingerprint scan
    * (and possibly the build), every later call — including every
    * micro-batch of a streaming serve — returns immediately. `fp` is
    * by-name so a memo hit never computes it. The shared ensure
    * discipline of the IVF index (q85/q118), the PQ index
    * (q101/q103/q107), the residual codebook (q109), and the inverted
    * index (q86). */
  private def ensureCurrent(spark: SparkSession, presence: String,
      fp: => (Long, Long, Long))(build: => Unit): Unit = {
    // concurrent set per session; double-checked under a per-presence
    // lock so concurrent ensures of one artifact (a streaming serve's
    // micro-batch racing a batch query — the memo's own use case)
    // build at most once, and ensures of DIFFERENT artifacts never
    // serialize (review r18)
    val seen = ensuredMemo.synchronized {
      ensuredMemo.computeIfAbsent(spark,
        _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    }
    if (!seen.contains(presence)) {
      val lock = ensureLocks.computeIfAbsent(presence, _ => new Object)
      lock.synchronized {
        if (!seen.contains(presence)) {
          val f = fp
          if (!spark.catalog.tableExists(presence) ||
              !Layout.readFingerprint(spark, presence).contains(f)) {
            build
            Layout.writeFingerprint(spark, presence, f)
          }
          seen.add(presence)
          ()
        }
      }
    }
  }

  /** Build-if-absent-or-stale for the persisted IVF index of `dir` —
    * the shared ingest stage of q85 and q118 (whichever runs first in
    * a session pays the build; the build is deterministic, so order is
    * immaterial). Returns the members table name. */
  private def ensureIvfIndex(spark: SparkSession, dir: String): String = {
    val idx = ivfIndexTable(dir)
    val e = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    ensureCurrent(spark, idx, corpusFingerprint(e)) {
      val (members, routing) = mapSideFineClustersWithRouting(e,
        labelCentroids(spark, dir), ClusterTargetOccupancy)
      Layout.writeIvfIndex(members, routing, idx, IvfIndexBuckets)
    }
    idx
  }

  /** L3 — MULTI-PROBE ANN serving (VERDICT r15 §next-1): the SAME
    * persisted IVF index q85 serves, with the serve-time knob turned
    * to probe radius 1 — each query scans its home fine cluster PLUS
    * every one-bit sub-bucket neighbour ([[probeExpand]]), the exact
    * configuration q114's sweep measured at ~4.3× the recall for
    * ~3.7× the candidates. This closes the knob-table-without-a-knob
    * gap: q114 publishes recall-per-candidate per radius, and this is
    * the serve path a deployment points production queries at after
    * reading it. Radius-1 candidates are a strict superset of
    * radius-0's (the home cluster is always probed), so per-rank
    * scores dominate q85's — asserted in the spec.
    *
    * Scale posture (100 TB): identical to q85 except the broadcast
    * query relation is ≤ (1 + b_c) rows per query (b_c ≤ 32 active
    * bits); the members side stays a bucketed exchange-free scan, and
    * per-query candidates stay O(occupancy × probes) — at the 32-target
    * occupancy and b_c ≈ 30, ~10³ candidate rows per query at ANY
    * corpus size. The index is NOT rebuilt: nprobe is a query-time
    * decision, as in any production IVF deployment. */
  def q118MultiProbeAnn(spark: SparkSession, dir: String): DataFrame =
    annServe(spark.table(ensureIvfIndex(spark, dir)), probeRadius = 1)

  /** L3 — the TRAINED-COARSE multi-probe serve: q119's sweep
    * configuration made SERVABLE. The coarse router is
    * [[kMeansCentroids]]' Lloyd-trained, corpus-derived centroids (the
    * router a label-free production corpus actually trains — q119's
    * spec measured it strictly beating pure-SRP routing at a smaller
    * candidate budget), subdivided to the same target occupancy, served
    * through the SAME [[annServe]]/[[probeExpand]] path as q31/q85/q118
    * at probe radius 1. With q118 (label-centroid router, index at
    * rest) and this (trained router), BOTH router choices the sweep
    * family measures (q114 vs q119) now exist as serve paths — the
    * knob tables and the serving surface are in 1:1 correspondence.
    *
    * Scale posture: q118's serve bounds verbatim (broadcast query side
    * ≤ (1 + b_c) rows per query, candidates O(occupancy × probes)).
    * The trained index is BANKED ([[ensureTrainedIvfIndex]], VERDICT
    * r18 §next-2 — the Lloyd pass + membership, 0.42 of this query's
    * cost, used to be re-paid every serve): warm serves read the
    * cluster-bucketed membership like q85/q118, and the kMeans
    * training runs once per (session, corpus version). */
  def q130TrainedCoarseAnn(spark: SparkSession, dir: String): DataFrame =
    annServe(spark.table(ensureTrainedIvfIndex(spark, dir)),
      probeRadius = 1)

  /** RRF rank constant (Cormack et al. 2009's k = 60, the de-facto
    * standard), per-leg candidate depth, and fused result depth for
    * [[q133HybridRrf]]. */
  private val RrfK = 60
  private val HybridLegK = 20
  private val HybridTopK = 10

  /** Pipeline — HYBRID RETRIEVAL via reciprocal-rank fusion: the
    * two-leg serving stack every retrieval deployment runs — a SPARSE
    * leg (per-query BM25 over the document corpus, query = the query
    * document's distinct tokens, i.e. more-like-this) and a DENSE leg
    * (cosine ranking over the aligned embedding corpus), fused by
    * RRF: `score = Σ_legs 1/(k + rank)` with k = 60. RRF fuses RANKS,
    * not scores, so the two legs' incomparable score scales never
    * touch — which is also what makes it oracle-exact: the fused
    * score is `10^6 div (60 + rank)` summed in int64.
    *
    * Determinism: the sparse leg sums per-(doc, term) BM25 weights in
    * integer micro-units (round-6-free: round(w·10^6) per term, int64
    * sums in any order — the micro-unit discipline applied to BM25,
    * where q57's 3-term float sum tolerated partition order only by
    * its tiny addend count); the dense leg ranks on round-6 cosine
    * (the q31 discipline); every rank ties to the smaller doc_id.
    *
    * Scale posture (100 TB): the sparse leg restricts corpus postings
    * to the query vocabulary BEFORE its one (doc, term) exchange (at
    * rest this is q86's inverted index — the serve filters postings
    * by term); the dense leg here is the EXACT scorer over a
    * broadcast ≤10-row query side — a deployment swaps q118/q130's
    * IVF serve into the same (query_id, doc_id, rank) interface; the
    * fusion join carries ≤ 2·legK rows per query. */
  def q133HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val q = docs(spark, dir).filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(pqVectors(spark, dir).select(col("vec_id"), col("e")),
        col("query_id") === col("vec_id"))
      .select(col("query_id"), col("text"), col("e").as("qe"))
    hybridRrfServe(spark, dir, q)
  }

  /** The query-parameterized hybrid serve behind [[q133HybridRrf]]
    * and the streaming face ([[graft.streaming.Retrieve]]): rank
    * `queries(query_id, text, qe)` against the `dir` corpus — sparse
    * BM25 leg over the documents table, dense cosine leg over the
    * embeddings table, integer RRF fusion. Any query relation works
    * (q133 draws its queries FROM the corpus; a streaming micro-batch
    * arrives from outside); self-matches are excluded by id. */
  /** `ws`/`wd` are the SERVE-TIME fusion weights (quarters or any
    * positive ints — only the ratio matters): q136 measures the grid,
    * this serves the chosen point, the q114→q118 measurement→serve
    * symmetry applied to the fusion stage. Defaults are q133's plain
    * RRF. `coverage = true` swaps the fusion stage for the
    * coverage-aware rule ([[rrfFuseCoverage]], graded by q140; `ws`/
    * `wd` are then unused — the rule derives its weights from dense
    * corpus membership) — the fusion knob's third position, serve-time
    * like the other two. */
  private[graft] def hybridRrfServe(spark: SparkSession, dir: String,
      queries: DataFrame, ws: Int = 1, wd: Int = 1,
      coverage: Boolean = false): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    // r21: the two legs are independent collect pipelines — overlap
    // them (guide §2.6); both return bounded local snapshots
    val (sparse, dense) = par2(
      sparseLeg(queries, d),
      denseLeg(queries, pqVectors(spark, dir)))
    if (coverage)
      rrfFuseCoverage(sparse, dense, pqVectors(spark, dir).select(col("vec_id")))
    else rrfFuseWeighted(sparse, dense, ws, wd)
  }

  /** Per-query distinct-token relation `(query_id, t)` — persisted;
    * [[bm25MicroLeg]] releases it. */
  private def queryTerms(queries: DataFrame): DataFrame =
    queries
      .select(col("query_id"),
        explode(array_distinct(split(col("text"), " "))).as("t"))
      .persist(NarrowCacheLevel)

  /** The sparse (per-query BM25) leg over a tokenized corpus
    * `d(doc_id, toks, dl)`: `(query_id, doc_id, srk ≤ HybridLegK)`.
    * Per-term weights round to integer micro-units BEFORE the per-doc
    * sum (order-free across partitions). */
  private def sparseLeg(queries: DataFrame, d: DataFrame): DataFrame = {
    val qterms = queryTerms(queries)
    val qvocab = qterms.select(col("t")).distinct()
    // r22 (guide §2.4): the corpus is referenced twice — postings (tf)
    // and corpus stats — and each reference re-ran the scan + split
    // tokenization (the profile's duplicate 26 task-seconds stage on
    // every eval query). Tokenize ONCE: the serialized persist fills
    // during tf's materialization scan and the stats aggregate reads
    // the cache; released before return (no cross-query state).
    val dTok = d.persist(CacheLevel)
    val tf = dTok.select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
      .join(broadcast(qvocab), "t")
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist(NarrowCacheLevel)
    tf.count()
    val stats = dTok.agg(count(lit(1)).cast("double").as("nn"),
      avg(col("dl")).as("avgdl"))
    val out = bm25MicroLeg(qterms, tf, stats)
    dTok.unpersist(blocking = false)
    out
  }

  /** The sparse leg served from an inverted index AT REST (q86's
    * posture applied to the per-query leg): postings filter to the
    * query vocabulary — a pushed-down predicate on the sorted
    * bucketed term key — and corpus stats ride the one-row sidecar;
    * no tokenization, no corpus scan. Postings hold the complete
    * per-term lists, so document frequency computed from the FILTERED
    * relation equals the corpus df and the leg is row-identical to
    * [[sparseLeg]] over the same corpus. */
  private[operators] def sparseLegFromPostings(queries: DataFrame,
      postings: DataFrame, stats: DataFrame): DataFrame = {
    val qterms = queryTerms(queries)
    val qvocab = qterms.select(col("t")).distinct()
    val tf = postings.join(broadcast(qvocab), "t")
      .select(col("doc_id"), col("dl"), col("t"), col("tf"))
      .persist(NarrowCacheLevel)
    tf.count()
    bm25MicroLeg(qterms, tf, stats)
  }

  /** The sparse leg's serve-time plan knob — an HONEST NEGATIVE
    * VERDICT (the q144 discipline applied to VERDICT r19 §next-5):
    * max-score pruning is implemented, exact (θ-bound certificate),
    * and parity-spec'd including degenerate panels, but a quiet-window
    * A/B at THREE scales (PLANS §r20: 270 k / 2.7 M / 27 M corpus
    * tokens — 1× / 10× / 100×) shows the unpruned plan winning at
    * every measured size for q138's panel shape (warm serve 3.96 vs
    * 7.20 s, 5.10 vs 11.95 s, 25.8 vs 42.1 s): the query-vocabulary
    * pushdown already bounds the unpruned leg's growth (6.5× at 100×
    * data — the weight scan, not the per-(query, doc) exchange, is
    * the cost), while max-score pays 2 extra passes over the same
    * weight relation plus two driver round-trips to cut an exchange
    * that wasn't dominant. An earlier loaded-window A/B showed the
    * opposite at 10× and briefly set a 2 M-token cost-based floor;
    * the three-point quiet measurement supersedes it. So the DEFAULT
    * is the unpruned plan at every size, and max-score stays as an
    * explicit opt-in for the shape that CAN invert the trade — panels
    * wide enough (thousands of simultaneous queries) that the
    * (query × posting) fan-out, which grows multiplicatively with
    * panel width while the weight scan does not, dominates the serve.
    * Callers flipping it on owe their own A/B at their panel shape;
    * both branches are row-identical for the top-k, so the knob can
    * never change an answer — only a growth curve. */
  private[operators] def sparseLegAdaptive(queries: DataFrame,
      postings: DataFrame, stats: DataFrame,
      maxScorePrune: Boolean = false): DataFrame =
    if (maxScorePrune)
      sparseLegFromPostingsMaxScore(queries, postings, stats)
    else sparseLegFromPostings(queries, postings, stats)

  /** Per-(doc, term) BM25 weights in integer micro-units over a
    * query-vocabulary tf relation — the one scoring derivation behind
    * [[bm25MicroLeg]] and the max-score serve: df from the COMPLETE
    * per-term lists (the filtered relation holds them whole, so df is
    * the corpus df), k1 = 1.2 / b = 0.75, each weight rounded to
    * int64 micro BEFORE any cross-partition sum. */
  private def bm25WMicro(tf: DataFrame, stats: DataFrame): DataFrame = {
    // (r21 note: a window-form df — count over partitionBy(t) — was
    // A/B'd and REVERTED: it wins ~1 s on 10-query panels but loses
    // ~1.5 s on the 64-query eval panels, whose larger query-vocab tf
    // makes the full sort+window costlier than this slim groupBy +
    // broadcast join-back.)
    val df_ = tf.groupBy(col("t")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df_), "t").crossJoin(broadcast(stats))
      .withColumn("w",
        log(lit(1.0) + (col("nn") - col("df") + 0.5) / (col("df") + 0.5))
          * col("tf") * (lit(1.2) + 1.0)
          / (col("tf") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl"))))
      .select(col("doc_id"), col("t"),
        round(col("w") * 1000000).cast("long").as("w_micro"))
  }

  /** The sparse at-rest leg with MAX-SCORE pruning (VERDICT r19
    * §next-5 — q138's warm serve was the one bounded-family row
    * trending > 2× at 10× data, because every query-vocabulary
    * posting row reached the (query × term) multiplication and the
    * per-(query, doc) exchange). Two-phase, EXACT for the top-k by
    * construction — the pruning needs no banked artifact and no
    * freshness contract: term upper bounds derive at serve time from
    * the same weights the ranking uses (`ub_t = max_doc w_micro(t,
    * doc)` — the inverted-index family's no-frozen-state virtue).
    *
    *  1. ESSENTIAL terms per query: terms sorted by (ub desc, t); the
    *     shortest prefix carrying ≥ half the query's total ub mass
    *     (idf-skewed vocabularies put that mass on a few RARE terms —
    *     exactly the short posting lists). Partial scores over only
    *     those postings give θ_q = the k-th best partial — a LOWER
    *     bound on the true k-th best full score (full ≥ partial per
    *     doc).
    *  2. The MaxScore set: E2_q = the shortest ub-desc prefix whose
    *     REMAINDER sums strictly below θ_q (θ_q = 0 → all terms — the
    *     unpruned plan, graceful degradation). Any document with no
    *     E2 term scores ≤ Σ_{t∉E2} ub < θ_q ≤ s_k — strictly below
    *     the k-th, so it cannot even tie into the top-k: candidates
    *     (docs with ≥ 1 E2 term) are a SUPERSET of the true top-k,
    *     and exact scores over candidates alone reproduce the
    *     unpruned leg row-for-row (q138's oracle hash is the
    *     certificate; the spec asserts parity directly).
    *
    * What 10× data now costs: the posting scan and the map-side
    * weight math stay linear (columnar, term-pushed-down — the cheap
    * part), but the rows that reach the (query × term) multiplication
    * and the per-(query, doc) aggregation exchange are cut to
    * candidate documents FIRST (a broadcast semi-join on doc_id
    * before the multiplication, then the exact (query, doc) semi) —
    * frequent terms' long posting lists no longer fan out per query.
    * Driver-side state is bounded by the query panel: (term, ub)
    * snapshots and θ per query — the HybridLegK panel discipline. */
  private[operators] def sparseLegFromPostingsMaxScore(queries: DataFrame,
      postings: DataFrame, stats: DataFrame): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qterms = queryTerms(queries)
    val qvocab = qterms.select(col("t")).distinct()
    val tf = postings.join(broadcast(qvocab), "t")
      .select(col("doc_id"), col("dl"), col("t"), col("tf"))
      .persist(NarrowCacheLevel)
    tf.count()
    // weights once, shared by both phases (phase A reads the rare
    // slice, phase B the candidate-filtered whole)
    val wmicro = bm25WMicro(tf, stats).persist(NarrowCacheLevel)
    wmicro.count()
    // per-query (term, ub) — a bounded driver snapshot (panel × query
    // vocabulary); terms absent from the corpus drop here exactly as
    // the unpruned inner join drops them
    val ub = wmicro.groupBy(col("t")).agg(max(col("w_micro")).as("ub"))
    val qtu = qterms.join(ub, "t")
      .select(col("query_id"), col("t"), col("ub")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(t => (-t._2, t._1)).toSeq)
      .toMap
    // phase 1: the ≥-half-ub-mass prefix per query
    val e1 = qtu.toSeq.flatMap { case (q, ts) =>
      val total = ts.map(_._2).sum
      val prefix = ts.scanLeft(0L)(_ + _._2).tail
      val cut = prefix.indexWhere(_ * 2 >= total) + 1
      ts.take(math.max(cut, 1)).map { case (t, _) => (q, t) }
    }.toDF("query_id", "t")
    val byQ = Window.partitionBy(col("query_id"))
    val thetas: Map[Long, Long] = wmicro
      .join(broadcast(e1), "t")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_micro")).as("s"))
      .withColumn("rk", row_number().over(
        byQ.orderBy(col("s").desc, col("doc_id"))))
      .filter(col("rk") === HybridLegK)
      .select(col("query_id"), col("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // phase 2: E2 = shortest prefix whose remainder sums < θ (θ
    // absent/0 → all terms: the unpruned candidate universe)
    val e2 = qtu.toSeq.flatMap { case (q, ts) =>
      val theta = thetas.getOrElse(q, 0L)
      val suffix = ts.map(_._2).scanRight(0L)(_ + _).tail // Σ after i
      val cut0 = suffix.indexWhere(_ < theta)
      val cut = if (theta <= 0L || cut0 < 0) ts.length else cut0 + 1
      ts.take(cut).map { case (t, _) => (q, t) }
    }.toDF("query_id", "t")
    val cand = wmicro.join(broadcast(e2), "t")
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id")).distinct()
      .persist(NarrowCacheLevel)
    cand.count()
    val docAny = cand.select(col("doc_id")).distinct()
    // exact scores, candidates only: the doc_id semi cuts posting
    // rows BEFORE the per-query fan-out, the (query, doc) semi right
    // after it — only candidate rows reach the aggregation exchange
    val leg = wmicro
      .join(broadcast(docAny), Seq("doc_id"), "left_semi")
      .join(broadcast(qterms), "t")
      .join(broadcast(cand), Seq("query_id", "doc_id"), "left_semi")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_micro")).as("s_micro"))
      .withColumn("srk", row_number().over(
        byQ.orderBy(col("s_micro").desc, col("doc_id"))))
      .filter(col("srk") <= HybridLegK)
      .select(col("query_id"), col("doc_id"), col("srk"))
    val out = snapshotAndFree(leg, qterms, tf, wmicro)
    cand.unpersist(blocking = false)
    out
  }

  /** Shared BM25 scoring behind [[sparseLeg]] and
    * [[sparseLegFromPostings]]: micro-unit per-term weights, integer
    * per-(query, doc) sums, top-[[HybridLegK]] per query; releases the
    * callers' `qterms`/`tf` residents via [[snapshotAndFree]]. */
  private def bm25MicroLeg(qterms: DataFrame, tf: DataFrame,
      stats: DataFrame): DataFrame = {
    // the ONE weight derivation (bm25WMicro) — the max-score serve's
    // exactness certificate is row-for-row parity with this leg, so
    // the formula must not fork (review r20)
    val wmicro = bm25WMicro(tf, stats)
    val leg = wmicro.join(broadcast(qterms), "t")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_micro")).as("s_micro"))
      .withColumn("srk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("s_micro").desc, col("doc_id"))))
      .filter(col("srk") <= HybridLegK)
      .select(col("query_id"), col("doc_id"), col("srk"))
    // snapshot-and-release (the annRecallSweep discipline): the leg is
    // ≤ legK rows per query — a bounded local relation — so the
    // corpus-sized qterms/tf residents free HERE instead of lingering
    // for the session (a leaked persist reads as GC pressure on every
    // LATER query in a shared session, not on this one)
    snapshotAndFree(leg, qterms, tf)
  }

  /** The dense (exact round-6 cosine) leg over `e(vec_id, e)`:
    * `(query_id, doc_id, drk ≤ HybridLegK)` — returned as a bounded
    * LOCAL relation (snapshot), so q136's five re-fusions re-rank it
    * for free instead of re-scanning the corpus per grid row. */
  private def denseLeg(queries: DataFrame, e: DataFrame): DataFrame = {
    // r22: norms hoisted below the cross join (vecCosinePre — each
    // side's norm loop runs once per ROW instead of once per PAIR;
    // bit-identical scores)
    val q = queries.select(col("query_id"),
      transform(col("qe"), x => x.cast("double")).as("qe"))
      .withColumn("nq", vecNorm(col("qe")))
    val leg = e.withColumn("ne", vecNorm(col("e"))).crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        round(vecCosinePre(col("qe"), col("nq"), col("e"), col("ne")), 6)
          .as("c6"))
      .withColumn("drk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("c6").desc, col("doc_id"))))
      .filter(col("drk") <= HybridLegK)
      .select(col("query_id"), col("doc_id"), col("drk"))
    snapshotAndFree(leg)
  }

  /** Run two INDEPENDENT derivations concurrently (guide §2.6:
    * actions are only sequential because the driver calls them
    * sequentially — a second in-flight job back-fills executors the
    * first job's stage tails leave idle). Results and all Spark state
    * are unaffected: the thunks share no relation except persisted
    * ones, whose concurrent materialization the block manager
    * serializes per block. Exceptions from either side propagate. */
  private def par2[A, B](fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val f = Future(fa)
    val b = fb
    (Await.result(f, Duration.Inf), b)
  }

  /** Collect a BOUNDED relation into a local snapshot, release the
    * given resident relations, and return the snapshot as a
    * LocalRelation DataFrame — the annRecallSweep discipline as a
    * helper. Callers must only pass relations whose row count is
    * bounded by construction (legK·|queries|, ≤|lang| reports…). */
  private def snapshotAndFree(bounded: DataFrame,
      residents: DataFrame*): DataFrame = {
    val snapshot = bounded.collect()
    residents.foreach(_.unpersist(blocking = false))
    bounded.sparkSession.createDataFrame(
      java.util.Arrays.asList(snapshot: _*), bounded.schema)
  }

  /** The dense leg served from the persisted IVF INDEX (q85/q118's
    * members relation) at a probe radius: candidates from the
    * cluster-bucketed join — O(occupancy × probes) per query, never a
    * corpus scan — ranked by round-6 cosine to `(query_id, doc_id,
    * drk ≤ HybridLegK)`. The q133 exact leg's production form: the
    * candidate set is IVF-pruned, so a true neighbour outside the
    * probed clusters is invisible — exactly the recall q114/q128
    * price. */
  private def denseLegFromIndex(members: DataFrame, routing: DataFrame,
      queries: DataFrame, probeRadius: Int): DataFrame = {
    // stored-routing assignment: EXTERNAL query vectors land exactly
    // where the build would have put them (routeThroughIndex is the
    // shared lookup/append assignment), so a corpus vector re-queried
    // under a novel id probes its own home cluster
    val routed = probeExpand(
      routeThroughIndex(routing,
        queries.select(col("query_id"),
          transform(col("qe"), x => x.cast("double")).as("qe")), "qe")
        // r22: query norm hoisted once per query, below the candidate
        // join (vecCosinePre — bit-identical scores)
        .withColumn("nq", vecNorm(col("qe"))),
      probeRadius)
    val leg = members.withColumn("ne", vecNorm(col("e")))
      .join(broadcast(routed), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        round(vecCosinePre(col("qe"), col("nq"), col("e"), col("ne")), 6)
          .as("c6"))
      .withColumn("drk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("c6").desc, col("doc_id"))))
      .filter(col("drk") <= HybridLegK)
      .select(col("query_id"), col("doc_id"), col("drk"))
    snapshotAndFree(leg)
  }

  /** The at-rest hybrid serve for ANY query relation `(query_id,
    * text, qe)` — both legs from banked indexes, both knobs
    * serve-time: the entry point a production retrieval deployment
    * binds per request batch ([[graft.streaming.Retrieve]]'s at-rest
    * face; q138 is this applied to the benchmark panel). */
  private[graft] def hybridServeAtRest(spark: SparkSession, dir: String,
      queries: DataFrame, ws: Int = 1, wd: Int = 1,
      probeRadius: Int = 1, coverage: Boolean = false,
      maxScorePrune: Boolean = false): DataFrame = {
    val idx = ensureIvfIndex(spark, dir)
    val inv = invIndexTable(dir)
    val corpus = docs(spark, dir)
    ensureCurrent(spark, inv, corpusFingerprint(corpus))(
      buildInvIndex(spark, inv, corpus))
    // the sparse-leg plan knob defaults to the unpruned plan — see
    // sparseLegAdaptive's honest negative verdict on max-score at
    // every measured scale (PLANS §r20); either setting is
    // row-identical for the top-k, so no oracle row depends on it
    // r21: overlap the two independent leg pipelines (guide §2.6)
    val (sparse, dense) = par2(
      sparseLegAdaptive(queries, spark.table(inv),
        spark.table(inv + "_stats"), maxScorePrune),
      denseLegFromIndex(spark.table(idx),
        spark.table(idx + "_routing"), queries, probeRadius))
    // the at-rest dense corpus membership IS the index member list
    if (coverage)
      rrfFuseCoverage(sparse, dense, spark.table(idx).select(col("vec_id")))
    else rrfFuseWeighted(sparse, dense, ws, wd)
  }

  /** L3/L4 — the PRODUCTION hybrid: both legs served from indexes AT
    * REST — BM25 from the persisted inverted index (postings filtered
    * on the bucketed term key, stats sidecar; row-identical to the
    * in-session leg) and the dense leg from the persisted IVF index at
    * probe radius 1 (bounded candidates, the q114-priced recall trade)
    * — fused by plain integer RRF. q133 is this query's exact-dense
    * reference; the deltas between the two outputs are precisely what
    * IVF pruning costs the fused ranking, and both serve knobs (nprobe
    * via [[probeExpand]], fusion weights via [[rrfFuseWeighted]]) turn
    * WITHOUT touching either index. Build-if-absent with corpus
    * fingerprints (the q85/q86 discipline): a serve pays lookups, not
    * builds. */
  def q138HybridAtRest(spark: SparkSession, dir: String): DataFrame = {
    val queries = docs(spark, dir).filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(pqVectors(spark, dir)
        .select(col("vec_id").as("query_id"), col("e").as("qe")), "query_id")
    hybridServeAtRest(spark, dir, queries)
  }

  /** Integer RRF fusion of the two leg rankings: full outer on
    * (query, doc), `Σ 10^6 div (RrfK + rank)` per present leg, fused
    * top-[[HybridTopK]]. */
  private def rrfFuse(sparse: DataFrame, dense: DataFrame): DataFrame =
    rrfFuseWeighted(sparse, dense, 1, 1)

  /** Weighted RRF: `rrf_micro = ws·(10^6 div (k+srk)) + wd·(10^6 div
    * (k+drk))` — ws = wd = 1 is q133's plain fusion; any positive
    * scaling of (ws, wd) yields the identical ranking. */
  private def rrfFuseWeighted(sparse: DataFrame, dense: DataFrame,
      ws: Int, wd: Int): DataFrame = {
    val byQ = Window.partitionBy(col("query_id"))
    sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("srk"), lit(0)).as("sparse_rank"),
        coalesce(col("drk"), lit(0)).as("dense_rank"))
      .withColumn("rrf_micro",
        (when(col("sparse_rank") > 0,
          expr(s"$ws * (1000000 DIV ($RrfK + sparse_rank))")).otherwise(lit(0))
          + when(col("dense_rank") > 0,
            expr(s"$wd * (1000000 DIV ($RrfK + dense_rank))")).otherwise(lit(0)))
          .cast("long"))
      .withColumn("rk",
        row_number().over(byQ.orderBy(col("rrf_micro").desc, col("doc_id"))))
      .filter(col("rk") <= HybridTopK)
      .select(col("query_id"), col("rk"), col("doc_id"), col("rrf_micro"),
        col("sparse_rank"), col("dense_rank"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Weight a leg's evidence carries for a document the OTHER leg's
    * corpus cannot rank, and the dense leg's own weight, in
    * [[rrfFuseCoverage]]. 128 makes the dominance PROVABLE at the
    * serve constants (RrfK = 60, legK = 20): reciprocal values
    * `10^6 div (60+r)` for r ≤ 20 are ≥ 158 apart, so a discounted
    * baseline contribution (≤ 16393 + the tie tip) can never cross a
    * 128-weighted rank gap (128·158 = 20224 > 16394) — the
    * covered-doc sparse baseline orders only exact leg-rank ties,
    * never reorders distinct ones. */
  private val CoverageShiftWeight = 128

  /** COVERAGE-AWARE RRF (VERDICT r17 §next-3 — q135 measured plain
    * RRF's hits@1 collapse under modality-coverage asymmetry; q136's
    * static grid could recover one axis only by surrendering the
    * other): fuse ranks with each leg's weight conditioned on whether
    * the doc is IN the dense leg's corpus at all —
    *
    *  - dense evidence: full weight W (+1 integer tie tip — between
    *    equal-rank witnesses, the leg that actually covers the doc
    *    wins the tie);
    *  - sparse evidence for a doc the dense corpus CANNOT rank (never
    *    embedded): full weight W — the absent leg's weight shifts to
    *    the only possible witness, so single-modality docs compete at
    *    rank parity instead of half mass;
    *  - sparse evidence for a doc the dense corpus COVERS but did not
    *    rank: baseline weight 1 — a covering leg's silence is
    *    negative evidence, so mere presence in both legs no longer
    *    outscores a confident single-leg rank-1 (the exact mechanism
    *    of q135's collapse: under plain RRF the WEAKEST both-legs doc,
    *    2·f(20) = 28168, outscored every single-leg rank-1, f(1) =
    *    16393).
    *
    * All integer (micro-reciprocals × int weights + a +1 tip), so the
    * DuckDB twin hash-matches. Measured on the q135 fixture (q140):
    * found/hits@1/MRR dominate plain RRF at ALL THREE gate SFs, and
    * at sf0.1 (27 found, 21 hits@1) it beats every q136 static point
    * on one axis without losing the other — the brief's acceptance
    * bar. `denseCorpusIds(vec_id)` is the dense corpus membership
    * (the embeddings relation at serve time; the index members at
    * rest); the flag needs only membership, so the corpus-wide
    * `.distinct()` this stage used to pay per fusion call (the q140
    * sf1 driver, VERDICT r18 §next-5) is GONE — dedup happens after
    * the semi-join, on the ≤2·legK·|queries| candidate-bounded
    * output, which also keeps the flag correct when the membership
    * relation carries duplicate ids (the banked index's documented
    * replay window leaves exactly that state until rebuild — review
    * r19). The coverage flag costs ONE semi-join of the corpus ids
    * against the bounded candidate set (broadcast probe side); the
    * fused relation itself stays ≤ 2·legK rows per query. */
  private def rrfFuseCoverage(sparse: DataFrame, dense: DataFrame,
      denseCorpusIds: DataFrame): DataFrame = {
    val w = CoverageShiftWeight
    val byQ = Window.partitionBy(col("query_id"))
    val fused = sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("srk"), lit(0)).as("sparse_rank"),
        coalesce(col("drk"), lit(0)).as("dense_rank"))
    // coverage flag: corpus ids semi-joined against the BOUNDED
    // candidate id set (broadcast probe), then broadcast back — the
    // corpus is scanned once (ids only, column-pruned) and only
    // candidate ids return; the distinct runs on the candidate-
    // bounded OUTPUT (never the corpus), so duplicate membership ids
    // — the maintained index's replay state — can't double fused rows
    val covered = denseCorpusIds.select(col("vec_id").as("doc_id"))
      .join(broadcast(fused.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .distinct()
      .withColumn("dense_covered", lit(true))
    fused.join(broadcast(covered), Seq("doc_id"), "left")
      .withColumn("rrf_micro",
        (when(col("sparse_rank") > 0,
          when(coalesce(col("dense_covered"), lit(false)), lit(1))
            .otherwise(lit(w)).cast("long")
            * expr(s"1000000 DIV ($RrfK + sparse_rank)")).otherwise(lit(0L))
          + when(col("dense_rank") > 0,
            expr(s"$w * (1000000 DIV ($RrfK + dense_rank)) + 1"))
            .otherwise(lit(0L)))
          .cast("long"))
      .withColumn("rk",
        row_number().over(byQ.orderBy(col("rrf_micro").desc, col("doc_id"))))
      .filter(col("rk") <= HybridTopK)
      .select(col("query_id"), col("rk"), col("doc_id"), col("rrf_micro"),
        col("sparse_rank"), col("dense_rank"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** L3/L4 — KNOWN-ITEM RETRIEVAL EVALUATION: the q114 honest-audit
    * pattern applied to the q133 serving stack. The corpus plants
    * twins with DELIBERATELY asymMETRIC modality coverage — every
    * `%33` document gets a text twin (3 appended tokens) at id+10^6,
    * but only the `%99` subset also gets an embedding twin (the q51
    * ±0.2% perturbation) — and each `%33` base document queries for
    * its own twin. Per method (sparse BM25 leg / dense cosine leg /
    * RRF hybrid): queries, twins found within the method's serve
    * depth, hits@1, and MRR in integer micro-units. The asymmetry is
    * the point: the dense leg CANNOT find a twin that was never
    * embedded, the sparse leg can — and the fused ranking keeps the
    * union without giving up rank-1s, which is the measured argument
    * for running two legs at all (the table a deployment reads before
    * paying for the second leg). All metrics are exact integers
    * (rank arithmetic, `10^6 div rank` reciprocals, floor-div mean);
    * the legs and fusion are byte-for-byte the q133 serve
    * ([[sparseLeg]]/[[denseLeg]]/[[rrfFuse]] shared).
    *
    * Scale posture: q133's serve bounds; the eval adds one ≤|queries|
    * twin-lookup join per method and three 1-row aggregates. Like
    * q114's exact top-5, the planted-twin audit is the OFFLINE
    * harness — run on a seeded sample against the production index. */
  def q135RetrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val (queries, dPlant, ePlant) = retrievalEvalFixture(spark, dir)
    // the legs come back as bounded local snapshots (legK·|panel|);
    // r21: they are independent pipelines — overlap them (guide §2.6)
    val (sparse, dense) = par2(
      sparseLeg(queries, dPlant), denseLeg(queries, ePlant))
    val fused = rrfFuse(sparse, dense)
    def evalMethod(rel: DataFrame, rankName: String, method: String,
        depth: Int): DataFrame =
      twinEval(queries, rel, rankName)
        .select(lit(method).as("method"), lit(depth).cast("int").as("depth"),
          col("n_queries"), col("n_found"), col("hits_at_1"), col("mrr_micro"))
    val out = evalMethod(sparse, "srk", "sparse", HybridLegK)
      .unionByName(evalMethod(dense, "drk", "dense", HybridLegK))
      .unionByName(evalMethod(fused, "rk", "hybrid", HybridTopK))
      .orderBy(col("method"))
    // 3-row report: snapshot, release the fixture's query panel
    snapshotAndFree(out, queries)
  }

  /** The evaluation QUERY PANEL is bounded: the first
    * [[EvalPanelCap]] %33 ids (`doc_id < 33·cap`). An audit whose
    * panel grew WITH the corpus would make the exact dense leg
    * O(n²/33) — the sf1 probe measured exactly that (15.6× at 10×
    * data) before the cap; a bounded panel makes the audit cost
    * O(panel × serve), corpus-size-independent beyond the legs' own
    * scans. At the three gate SFs the cap exceeds the whole stratum,
    * so it binds only beyond them. */
  private val EvalPanelCap = 64L

  /** The q135/q136 evaluation fixture: `(queries, dPlant, ePlant)` —
    * queries = the bounded panel of documents ∩ embeddings at %33 (a
    * query needs BOTH modalities), text twins planted at %33 under
    * id+10^6, embedding twins (the q51 ±0.2% perturbation) only at
    * the %99 subset — the deliberate modality-coverage asymmetry the
    * eval measures. */
  private def retrievalEvalFixture(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val d0 = docs(spark, dir).select(col("doc_id"), col("text"))
    val dPlant = d0
      .unionByName(d0.filter(col("doc_id") % 33 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" extra token tail")).as("text")))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val e0 = Tables.spread(Tables.embeddings(spark, dir))
    val base = e0.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    // the q51/dupEmbeddings perturbation, planted only at %99 (the
    // two-step select keeps the lambda's vec_id bound to the ORIGINAL
    // id — the lateral-alias phase-shift hazard documented there)
    val pert = e0.filter(col("vec_id") % 99 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") * (lit(1.0) + lit(0.002) * ((col("vec_id") + i) % 3 - 1))).as("e"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("e"))
    val ePlant = base.unionByName(pert)
    val queries = d0
      .filter(col("doc_id") % 33 === 0 && col("doc_id") < 33L * EvalPanelCap)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(base.select(col("vec_id").as("query_id"), col("e").as("qe")),
        "query_id")
      .persist(NarrowCacheLevel)
    // r22: materialize the panel BEFORE the callers' par2 legs — a
    // lazily-persisted relation referenced by two concurrent jobs runs
    // its docs∩embeddings build twice (the block manager keeps one
    // copy but both jobs pay the scan)
    queries.count()
    (queries, dPlant, ePlant)
  }

  /** L3/L4 — the known-item eval UNDER IVF PRUNING: q135's planted
    * fixture served the way production serves the dense leg —
    * fine-cluster candidate pruning at probe radius 1 over the PLANTED
    * embedding corpus (the index such a deployment would build; the
    * planted twins are index members like any other ingest), sparse
    * leg unchanged. Read beside q135: the dense/hybrid row deltas are
    * what candidate pruning costs known-item recall and MRR — the
    * EVAL-side complement of q114's recall-per-candidate table (q114
    * prices pruning against the exact top-5; this prices it against a
    * task: find the planted twin). */
  def q139PrunedEval(spark: SparkSession, dir: String): DataFrame = {
    val (queries, dPlant, ePlant) = retrievalEvalFixture(spark, dir)
    // r21: the sparse leg and the IVF-pruned dense pipeline (members
    // build + leg snapshot) are independent — overlap them (§2.6)
    val (sparse, denseP) = par2(sparseLeg(queries, dPlant), {
      val members = mapSideFineClusters(ePlant,
        labelCentroids(spark, dir), ClusterTargetOccupancy)
        .persist(CacheLevel)
      members.count()
      val q = probeExpand(
        members.join(queries.select(col("query_id")),
            col("vec_id") === col("query_id"))
          .select(col("vec_id").as("query_id"), col("e").as("qe"),
            col("cluster"), col("mask"))
          // r22: norms hoisted below the candidate join (vecCosinePre)
          .withColumn("nq", vecNorm(col("qe"))),
        1)
      val leg = members.withColumn("ne", vecNorm(col("e")))
        .join(broadcast(q), Seq("cluster"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("doc_id"),
          round(vecCosinePre(col("qe"), col("nq"), col("e"), col("ne")), 6)
            .as("c6"))
        .withColumn("drk", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("c6").desc, col("doc_id"))))
        .filter(col("drk") <= HybridLegK)
        .select(col("query_id"), col("doc_id"), col("drk"))
      snapshotAndFree(leg, members)
    })
    val fused = rrfFuse(sparse, denseP)
    def evalMethod(rel: DataFrame, rankName: String, method: String,
        depth: Int): DataFrame =
      twinEval(queries, rel, rankName)
        .select(lit(method).as("method"), lit(depth).cast("int").as("depth"),
          col("n_queries"), col("n_found"), col("hits_at_1"), col("mrr_micro"))
    val out = evalMethod(denseP, "drk", "dense_ivf", HybridLegK)
      .unionByName(evalMethod(fused, "rk", "hybrid_ivf", HybridTopK))
      .orderBy(col("method"))
    snapshotAndFree(out, queries)
  }

  /** One-row twin-retrieval metrics of a ranked relation
    * `(query_id, doc_id, <rankCol>)` against the planted id+10^6
    * truth: `(n_queries, n_found, hits_at_1, mrr_micro)`, all exact
    * integers (`10^6 div rank` reciprocals, floor-div mean). */
  private def twinEval(queries: DataFrame, rel: DataFrame,
      rankCol: String): DataFrame =
    queries.select(col("query_id"))
      .join(rel.filter(col("doc_id") === col("query_id") + 1000000L)
        .select(col("query_id"), col(rankCol).as("trk")),
        Seq("query_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        count(col("trk")).as("n_found"),
        sum(when(col("trk") === 1, 1L).otherwise(0L)).as("hits_at_1"),
        sum(when(col("trk").isNotNull, expr("1000000 DIV trk"))
          .otherwise(0L)).as("rr_sum"))
      .select(col("n_queries"), col("n_found"), col("hits_at_1"),
        expr("rr_sum DIV n_queries").as("mrr_micro"))

  /** The q136 fusion-weight grid, in quarters `(w_sparse, w_dense)`:
    * the two pure legs, plain RRF (2,2 — a positive scaling of q133's
    * 1+1, so the RANKING is identical), and the two asymmetric
    * blends. */
  private[operators] val FusionWeights =
    Seq((4, 0), (3, 1), (2, 2), (1, 3), (0, 4))

  /** L3/L4 — the FUSION-WEIGHT knob table: q135 measured plain RRF
    * demoting single-leg rank-1s under modality-coverage asymmetry
    * (a doc at rank ~2 in BOTH legs outscores a dense-only rank-1);
    * the standard production answer is WEIGHTED RRF —
    * `score = w_s·10^6 div (60+srk) + w_d·10^6 div (60+drk)` — and
    * this table measures the whole weight grid on q135's planted
    * known-item fixture, the q114/q131 knob-table pattern applied to
    * the fusion stage. Weights are integer QUARTERS, so every score
    * stays exact int64 and (2,2) provably reproduces plain RRF's
    * ranking (positive scaling). The legs compute ONCE; each grid row
    * re-ranks the same ≤ 2·legK-per-query fused relation — the knob
    * costs |grid| bounded re-ranks, not |grid| serves.
    *
    * Per row: the weight pair, queries, twins found in the fused
    * top-10, hits@1, and integer micro-MRR — a deployment reads where
    * MRR peaks and fixes its weights there, exactly as q114 fixes
    * nprobe and q131 fixes the banding. */
  def q136FusionWeights(spark: SparkSession, dir: String): DataFrame = {
    val (queries, dPlant, ePlant) = retrievalEvalFixture(spark, dir)
    // legs are bounded local snapshots: the five grid rows re-rank
    // them for free — the knob costs |grid| re-ranks, not serves;
    // r21: the legs overlap (guide §2.6)
    val (sparse, dense) = par2(
      sparseLeg(queries, dPlant), denseLeg(queries, ePlant))
    val rows = FusionWeights.map { case (ws, wd) =>
      twinEval(queries, rrfFuseWeighted(sparse, dense, ws, wd), "rk")
        .select(lit(ws).cast("int").as("w_sparse_q"),
          lit(wd).cast("int").as("w_dense_q"),
          col("n_queries"), col("n_found"), col("hits_at_1"),
          col("mrr_micro"))
    }
    val out = rows.reduce(_ unionByName _).orderBy(col("w_sparse_q").desc)
    snapshotAndFree(out, queries)
  }

  /** L3/L4 — COVERAGE-AWARE fusion graded by the known-item harness
    * (VERDICT r17 §next-3): q135 measured plain RRF demoting
    * single-leg rank-1s under modality-coverage asymmetry, q136's
    * static grid showed every fixed weight trades one axis for the
    * other (hits@1 back only by surrendering found-in-depth); this
    * query grades the DERIVED fix — [[rrfFuseCoverage]], where the
    * weight of a leg that cannot rank a doc shifts to the leg that
    * can — beside plain RRF on the SAME fixture, legs computed once.
    * Two rows (`hybrid_rrf` = q135's hybrid row verbatim,
    * `hybrid_coverage`), same exact-integer metric columns. Measured:
    * coverage dominates plain on found, hits@1 AND MRR at all three
    * gate SFs (sf0.1: 27/21/377322 vs 27/3/222950), and beats every
    * q136 grid point on at least one axis without losing the other —
    * asserted relationally in PipelineSpec. Scale posture: q135's
    * (bounded panel, snapshot legs, one extra corpus-ids semi-join
    * for the coverage flag). */
  def q140CoverageFusion(spark: SparkSession, dir: String): DataFrame = {
    val (queries, dPlant, ePlant) = retrievalEvalFixture(spark, dir)
    // r21: the legs overlap (guide §2.6)
    val (sparse, dense) = par2(
      sparseLeg(queries, dPlant), denseLeg(queries, ePlant))
    val plain = rrfFuse(sparse, dense)
    val cov = rrfFuseCoverage(sparse, dense, ePlant.select(col("vec_id")))
    def evalMethod(rel: DataFrame, method: String): DataFrame =
      twinEval(queries, rel, "rk")
        .select(lit(method).as("method"),
          lit(HybridTopK).cast("int").as("depth"),
          col("n_queries"), col("n_found"), col("hits_at_1"),
          col("mrr_micro"))
    val out = evalMethod(cov, "hybrid_coverage")
      .unionByName(evalMethod(plain, "hybrid_rrf"))
      .orderBy(col("method"))
    snapshotAndFree(out, queries)
  }

  /** Pipeline — duplicate-aware SOFT dedup weights: instead of
    * dropping duplicates, weight every document by 1/|its near-dup
    * component|, so each duplicated content unit contributes ONE
    * document's worth of training mass in total — the soft alternative
    * to hard removal (down-weighting keeps benign repetition's
    * diversity while killing the over-representation that hard dedup
    * targets; the near-dup components are q50/q111's own). Per
    * language: document count, documents actually down-weighted
    * (component size > 1), raw whitespace-token mass, effective
    * (weighted) token mass, and the retention ratio.
    *
    * Determinism: the weighted mass is EXACT INTEGER micro-tokens —
    * each document contributes `(n_tok·10^6) div size` (floor division
    * in both engines), summed as int64 in any order — no per-doc float
    * ever crosses an exchange; the one division-to-double happens per
    * ≤|lang| report row, rounded to 6. Scale posture (100 TB): the
    * component labels are the dedup family's own banded-LSH + star-CC
    * derivation (never all-pairs); sizes join back to labels on the
    * bounded label relation; the corpus-side join is one hash exchange
    * on doc_id and the rollup partial-aggregates map-side. */
  def q132SoftDedupWeights(spark: SparkSession, dir: String): DataFrame =
    softWeightedDocs(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("csize") > 1, 1L).otherwise(0L)).as("n_weighted_down"),
        sum(col("n_tok")).as("raw_tokens"),
        sum(col("eff_micro")).as("eff_tokens_micro"))
      .select(col("lang"), col("n_docs"), col("n_weighted_down"),
        col("raw_tokens"), col("eff_tokens_micro"),
        round(col("eff_tokens_micro").cast("double") /
          (col("raw_tokens") * lit(1000000L)), 6).as("retention"))
      .orderBy(col("lang"))

  /** Per-document soft-dedup weight relation over the q50/q111
    * reinsertion corpus: `(doc_id, lang, n_tok, csize, eff_micro)`
    * with `eff_micro = (n_tok·10^6) div csize` — the ONE derivation
    * behind q132 (per-language mass report) and q134 (weighted budget
    * mix), so the report and the mix can never disagree about a
    * document's weight. */
  private def softWeightedDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("lang"), col("text"))
    val corpus = d
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"), col("text")))
      .unionByName(d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"),
          concat(col("text"), lit(" extra token tail")).as("text")))
    val edges = verifiedNearDupPairs(corpus.select(col("doc_id"), col("text")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = Graph.connectedComponentsStar(edges)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("csize"))
    val nodeSize = labels.join(sizes, "label")
      .select(col("node"), col("csize"))
    corpus
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .join(nodeSize, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), col("lang"), col("n_tok"),
        coalesce(col("csize"), lit(1L)).as("csize"))
      .withColumn("eff_micro", expr("n_tok * 1000000 DIV csize"))
  }

  /** Pipeline — soft-dedup-WEIGHTED token-budget mix: q126's B-token
    * α = 1/2 mix with every language's mass measured in q132's
    * effective (duplicate-discounted) micro-tokens instead of raw
    * tokens. Raw-mass mixing double-pays duplicated content twice
    * over — the duplicated language's inflated total buys it a larger
    * sqrt share AND its kept sample re-contains the duplicates; the
    * weighted mix sizes every language by content it actually
    * contributes. Same consistent-sampling `temp:` draw as q123/q126
    * (membership is id-deterministic); budget B = 7/8 of the TOTAL
    * EFFECTIVE mass, shares ∝ √(effective mass) in the q126
    * integer-micro discipline (sqrt is IEEE-correctly-rounded in both
    * engines; each share rounds to micro-units BEFORE the integer
    * denominator sum). Report per language: docs, raw and effective
    * mass, the mix rate, and kept docs/effective mass.
    *
    * Scale posture: [[softWeightedDocs]]' dedup-family shapes plus
    * q126's one broadcast-rate scan — the ≤|lang| totals collect
    * nothing; the only additions over q132 are two bounded
    * aggregates and the rate join. */
  def q134WeightedBudgetMix(spark: SparkSession, dir: String): DataFrame = {
    val w = softWeightedDocs(spark, dir).persist(NarrowCacheLevel)
    w.count()
    val totals = w.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_l"), sum(col("n_tok")).as("raw_l"),
        sum(col("eff_micro")).as("eff_l"))
      .withColumn("sqrt_micro",
        round(round(sqrt(col("eff_l").cast("double") / 1e6), 6) * 1e6, 0)
          .cast("long"))
    val global = totals.agg(sum(col("sqrt_micro")).as("denom"),
      sum(col("eff_l")).as("eff_total"))
    val rates = totals.crossJoin(broadcast(global))
      .withColumn("b_micro", expr("(eff_total * 7) div 8"))
      .withColumn("rate_micro",
        round(round(least(lit(1.0),
          (col("b_micro").cast("double") / col("eff_l")) *
            (col("sqrt_micro").cast("double") / col("denom"))), 6) * 1e6, 0)
          .cast("long"))
      .select(col("lang"), col("n_docs_l"), col("raw_l"), col("eff_l"),
        col("rate_micro"))
    val out = w.join(broadcast(rates), "lang")
      .withColumn("keep", mixKey(col("doc_id")) < col("rate_micro"))
      .groupBy(col("lang"))
      .agg(max(col("n_docs_l")).as("n_docs"),
        max(col("raw_l")).as("raw_tokens"),
        max(col("eff_l")).as("eff_tokens_micro"),
        max(col("rate_micro")).as("rate_micro"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("eff_micro")).otherwise(0L)).as("eff_kept_micro"))
      .orderBy(col("lang"))
    // ≤|lang| report: snapshot, release the per-doc weight resident
    snapshotAndFree(out, w)
  }

  /** L2 — the LSH BANDING knob table: the q114/q128 recall/efficiency
    * sweep pattern applied to the MinHash dedup family. For each
    * banding of the 16-hash signature — (16,1) / (8,2) / (4,4, q24's
    * production config) / (2,8) — the table reports candidate volume
    * and recall against the EXACT ≥ 0.5-Jaccard ground truth, so a
    * deployment reads the S-curve trade (more bands of fewer rows =
    * higher recall, more candidates) as measured numbers on its own
    * corpus before fixing the banding, exactly as q114 fixes nprobe.
    *
    * The ground truth is NOT all-pairs: it is the q40 prefix-filter
    * construction at t = 1/2 (prefix p = ⌊n/2⌋+1 under the corpus
    * df-order, PPJoin positional filter 3·bound ≥ n_a+n_b, exact by
    * the prefix theorem under ANY shared global order) — i.e. the
    * truth harness itself scales as a production exact-join audit, not
    * a quadratic scan. Bands are md5-band-hashed (portable, any row
    * count) rather than base-31-combined (exact only to r = 4, and
    * 31^7 overflows int64 at r = 8); candidate sets therefore NEST
    * across configs by construction — an r-row band match implies both
    * r/2-row half-band matches — so candidates and recall are monotone
    * in the banding, asserted in the spec.
    *
    * Scale posture (100 TB): every stage is the dedup family's own
    * (digest-before-exchange signatures, per-bucket candidate joins,
    * never all-pairs); the sweep costs |configs| bucket joins plus one
    * prefix-filter truth join, all bounded by bucket/prefix occupancy.
    * Like q114's exact top-5, the truth join is the OFFLINE audit a
    * deployment runs (on a sampled stratum at extreme scale); the
    * banding it selects then serves the full corpus. */
  def q131BandingSweep(spark: SparkSession, dir: String): DataFrame =
    bandingSweep(nearDocs(spark, dir))

  /** The SAMPLED-STRATUM form of [[bandingSweep]]'s truth harness
    * (VERDICT r17 §next-5 — the scaladoc promised "a sampled stratum
    * at extreme scale"; this is that harness as code): restrict the
    * audit to a deterministic hash-drawn document stratum
    * (`md5("stratum:"‖doc_id) mod stratumMod = 0`) and run the
    * UNCHANGED sweep over it. This measures the full sweep's recall
    * correctly because every per-pair quantity is corpus-independent:
    * a pair's exact jaccard, its MinHash signature, and its band
    * collisions depend only on the two documents (df-ordering affects
    * prefix EFFICIENCY, never the verified set), so the stratum's
    * truth pairs are an unbiased ~1/mod² sample of the full truth and
    * band hits are sampled with them — recall_stratum estimates
    * recall_full with binomial error sqrt(r(1−r)/n_truth_stratum)
    * (PipelineSpec pins the estimate inside a 99% CI of the exact
    * recall; PLANS.md §r18 documents when each form applies). At
    * 100 TB the full prefix-filter truth join is the cost ceiling of
    * the audit — the stratum cuts BOTH its explode and its verify by
    * mod², while the gate oracle (q131) retains the exact full-corpus
    * form at the gate SFs. */
  private[graft] def bandingSweepSampled(corpus: DataFrame,
      stratumMod: Int): DataFrame = {
    require(stratumMod >= 1, "positive stratum modulus")
    bandingSweep(corpus.filter(
      pmod(portableHash(concat(lit("stratum:"), col("doc_id").cast("string"))),
        lit(stratumMod.toLong)) === 0))
  }

  /** [[bandingSweepSampled]] over q131's own corpus — the sweep a
    * deployment actually runs at extreme scale, spec-pinned against
    * the exact form. */
  private[graft] def q131SampledSweep(spark: SparkSession, dir: String,
      stratumMod: Int): DataFrame =
    bandingSweepSampled(nearDocs(spark, dir), stratumMod)

  /** Corpus-parameterized harness behind [[q131BandingSweep]] (the
    * spec drives it with a constructed fixture). */
  private[operators] def bandingSweep(corpus: DataFrame): DataFrame =
    bandingSweepOver(corpus, BandingConfigs)

  /** [[bandingSweep]] with an explicit (bands, rowsPerBand) grid —
    * the shared truth harness behind q131 (full-signature bandings)
    * and q147 (the VERIFIED GATE's prefix-band configs, which use
    * only the first bands·r hashes). */
  /** Exact ≥ 1/2-Jaccard ground-truth pairs over a `(doc_id, hs)`
    * shingle-hash relation, via prefix filtering (q40's idiom at
    * t = 1/2): df-ordered prefixes (rare grams block, frequent grams
    * sort to the suffix), p = n − ⌈n/2⌉ + 1 = ⌊n/2⌋ + 1, positional
    * overlap bound 1 + min(n_a−i−1, n_b−j−1) ≥ ⌈(n_a+n_b)/3⌉ in
    * integer arithmetic, then the EXACT integer verify
    * 3·inter ≥ na+nb — no rounding, so the verified set is precisely
    * the set the prefix length and positional filter were derived
    * for (ADVICE r17). Shared by the q131/q147 banding sweeps and
    * the q149 cap sweep — one truth join, never all-pairs. */
  private def exactHalfJaccardTruth(base: DataFrame): DataFrame = {
    val withDf = base.select(col("doc_id"), explode(col("hs")).as("h"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
    val ordered = withDf.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
      .select(col("doc_id"), transform(col("ord"), s => s.getField("h")).as("po"))
    val pj = ordered.join(base, "doc_id")
      .select(col("doc_id"), col("po"), size(col("hs")).as("n"))
    val pref = pj.select(col("doc_id"), col("n"),
      posexplode(slice(col("po"), lit(1),
        (floor(col("n").cast("double") / 2.0) + 1).cast("int")))
        .as(Seq("pos", "key")))
    val tcand = pref.as("x").join(pref.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id") &&
          (lit(1) + least(col("x.n") - col("x.pos") - 1,
            col("y.n") - col("y.pos") - 1)) * 3 >= (col("x.n") + col("y.n")))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = base.select(col("doc_id").as("doc_a"),
      col("hs").as("ha"), size(col("hs")).as("na"))
    val sb = base.select(col("doc_id").as("doc_b"),
      col("hs").as("hb"), size(col("hs")).as("nb"))
    tcand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter",
        graft.expressions.VectorFunctions.sortedIntersectSize(
          col("ha"), col("hb")))
      .filter(col("inter") * 3 >= col("na") + col("nb"))
      .select(col("doc_a"), col("doc_b"))
  }

  /** The (cfg, b, bsig) band-bucket relation of EVERY config in one
    * projection (r21, guide §2.4/§2.6): per config the identical
    * md5-band-hash over the signature's first bands·r hashes the
    * per-config loop used to derive — concatenated with a config
    * index so all configs share one candidate self-join and one
    * report aggregation instead of 2 jobs per config. */
  private def allConfigBands(sigs: DataFrame,
      configs: Seq[(Int, Int)]): DataFrame = {
    val perCfg = configs.zipWithIndex.map { case ((bC, r), ci) =>
      transform(sequence(lit(0), lit(bC - 1)), b =>
        struct(lit(ci).as("cfg"), b.cast("int").as("b"),
          portableHashMod(array_join(
            transform(slice(col("msig"), b * lit(r) + lit(1), lit(r)),
              x => x.cast("string")), ",")).as("bsig")))
    }
    sigs.select(col("doc_id"), explode(concat(perCfg: _*)).as("e"))
      .select(col("doc_id"), col("e.cfg").as("cfg"), col("e.b").as("b"),
        col("e.bsig").as("bsig"))
  }

  private[operators] def bandingSweepOver(corpus: DataFrame,
      configs: Seq[(Int, Int)]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = shingleHashSets(corpus).persist(CacheLevel)
    base.count()
    val sigs = minhashSigs(base).persist(NarrowCacheLevel)
    sigs.count()
    val truth = exactHalfJaccardTruth(base).persist(NarrowCacheLevel)
    val nTruth = truth.count()
    // ALL configs in one pass (r21): md5-band-hashed buckets → distinct
    // candidate pairs per config → hits = candidates ∩ truth (truth is
    // exact, so the membership probe IS ≥ t verification; truth rows
    // are unique, so the left join is multiplicity-1 and count(hit)
    // equals the former per-config semi-join count). One self-join +
    // one aggregation replaces 2 jobs × |configs|; per-config bucket
    // relations, candidate sets, and counts are unchanged.
    val bands = allConfigBands(sigs, configs)
    val candAgg = bands.as("x").join(bands.as("y"),
        col("x.cfg") === col("y.cfg") && col("x.b") === col("y.b") &&
          col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.cfg").as("cfg"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .distinct()
      .join(truth.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"), "left")
      .groupBy(col("cfg"))
      .agg(count(lit(1)).as("n_cand"), count(col("hit")).as("n_hits"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = configs.zipWithIndex.map { case ((bC, r), ci) =>
      val (nCand, nHits) = candAgg.getOrElse(ci, (0L, 0L))
      (bC, r, nTruth, nCand, nHits)
    }
    base.unpersist(blocking = false)
    sigs.unpersist(blocking = false)
    truth.unpersist(blocking = false)
    rows.toDF("bands", "rows_per_band", "n_truth", "n_candidates", "n_hits")
      .select(col("bands").cast("int").as("bands"),
        col("rows_per_band").cast("int").as("rows_per_band"),
        col("n_truth"), col("n_candidates"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_truth"), 6).as("recall"),
        when(col("n_candidates") === 0, lit(0.0))
          .otherwise(round(col("n_hits").cast("double") / col("n_candidates"), 6))
          .as("candidate_precision"))
      .orderBy(col("bands").desc, col("rows_per_band"))
  }

  /** The (bands, rowsPerBand) grid [[q147VerifiedGateSweep]] prices —
    * the VERIFIED gate's own configs ([[graft.streaming.Dedup.nearVerifiedVerdicts]]
    * uses the FIRST bands·r hashes, unlike q131's full-signature
    * bandings): (1,4) is the gate default, (4,4) uses the whole
    * signature and therefore IS q131's (4,4) row — the reconciliation
    * anchor the spec pins. */
  private[graft] val GateVerifiedConfigs =
    Seq((1, 2), (2, 2), (1, 4), (2, 4), (4, 4))

  /** L2 — the VERIFIED GATE's knob table (q147): the
    * measurement→knob→serve arc completed for
    * [[graft.streaming.Dedup.nearVerifiedVerdicts]]. The gate's
    * precision is exact by construction (every drop is verified), so
    * the ONLY thing to price is candidate RECALL per (bands,
    * rowsPerBand) — and since the gate's buckets are q131's
    * md5-band-hash over the signature's first bands·r hashes, the
    * q131 truth harness measures it directly: per config, exact
    * ≥ 1/2-Jaccard truth pairs, band-bucket candidate pairs, hits,
    * recall, and candidate precision (the gate's verify workload per
    * candidate). Candidates NEST three ways, all spec-asserted:
    * across bands at fixed r (more bands ⊇ fewer), across r at fixed
    * bands (an r-row band match implies its prefix's), and (4,4) —
    * the full signature — reconciles bit-for-bit with q131's (4,4)
    * row. A deployment reads recall at its (bands, rowsPerBand),
    * sizes `bucketCap` from candidate volume per bucket, and the gate
    * serves exactly that config. Same plan shape and cost as q131
    * (shared [[bandingSweepOver]] harness — one prefix-filter truth
    * join, |configs| bucket joins, never all-pairs). */
  def q147VerifiedGateSweep(spark: SparkSession, dir: String): DataFrame =
    bandingSweepOver(nearDocs(spark, dir), GateVerifiedConfigs)

  /** The (bands, rowsPerBand) configs and cap points q149 prices —
    * the gate default (1,4) and the full-signature (4,4) anchor, at
    * caps from starvation to effectively-unbounded (Int.MaxValue ≡ ∞:
    * every `min_dist ≤ cap` and `rn > occ − cap` predicate is then
    * vacuous, so that row MUST reconcile with q147's hit counts —
    * spec-asserted). */
  private[graft] val GateCapConfigs = Seq((1, 4), (4, 4))
  private[graft] val GateCaps = Seq(1, 4, 16, Int.MaxValue)

  /** L2 — the VERIFIED GATE's `bucketCap` knob table (q149, VERDICT
    * r19 §next-3: q147 prices band configs but the FIFO cap was
    * unpriced — an overflowing bucket silently forgets its oldest
    * keeper, and on a corpus that concentrates (the q142 lesson)
    * buckets DO skew). Per (bands, rowsPerBand, cap): the exact-truth
    * pairs ([[exactHalfJaccardTruth]], the q147 harness), the band-
    * bucket candidate hits, and how many of those hits a cap-`cap`
    * FIFO can still SERVE — a truth pair (a, b) is servable iff some
    * shared bucket has at most cap−1 arrivals strictly between them
    * (arrival order = doc_id, the corpus-as-stream convention every
    * batch/stream parity spec uses), i.e. `min_dist ≤ cap` over the
    * pair's shared buckets. Plus the columns a deployment sizes
    * memory from: `state_entries` = Σ_buckets min(occupancy, cap)
    * keeper slots and `state_bytes` = 8 bytes × the hash-set lengths
    * of exactly those resident keepers (the last `cap` arrivals per
    * bucket) — the steady-state worst case at a full horizon.
    *
    * Model stated honestly: the audit assumes EVERY arrival registers
    * (real gates drop verified dups without registering), so both the
    * eviction pressure and the state size are UPPER bounds — recall
    * loss at a given cap can only be smaller in production, which is
    * the safe direction to size from. Cost: the shared truth join +
    * one row_number exchange per config over the band relation;
    * per-cap work is filters over the hit-bounded distance relation —
    * never all-pairs, |configs|·|caps| fixed report rows. */
  def q149VerifiedCapSweep(spark: SparkSession, dir: String): DataFrame =
    bucketCapSweepOver(nearDocs(spark, dir), GateCapConfigs, GateCaps)

  /** One duplicate-audit row over a banked index relation — the q146
    * `ids_unique` discipline applied to the maintained indexes
    * (VERDICT r19 §next-4): total rows, distinct KEYS (the unit an
    * append may never legitimately re-add: `vec_id` for members and
    * codes, the `(t, doc_id)` posting pair), duplicate-row count, and
    * the flag. The documented IndexMaintain replay window — a crash
    * between the table append and the deliverOnce marker re-appends
    * that batch — leaves exactly `n_dup_rows > 0`, which the drift
    * reports see only inferentially (as occupancy/qerr noise); this
    * makes the rebuild trigger EXACT. Cost: one aggregate over the
    * bucketed scan, one report row — schedulable between appends like
    * [[Layout.reconcileShards]]. A rebuild
    * ([[Layout.writeIvfIndex]] / [[buildPqIndex]] / [[buildInvIndex]],
    * all Overwrite) returns the flag to true (IndexMaintainSpec
    * closes the loop). */
  def indexDuplicateAudit(spark: SparkSession, name: String,
      keyCols: Seq[String], family: String): DataFrame = {
    val ks = keyCols.map(col)
    spark.table(name)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(ks.head, ks.tail: _*).as("n_distinct_keys"))
      .select(lit(family).as("index_family"), col("n_rows"),
        col("n_distinct_keys"),
        (col("n_rows") - col("n_distinct_keys")).as("n_dup_rows"),
        (col("n_rows") === col("n_distinct_keys")).as("keys_unique"))
  }

  /** L3/L4 — the banked-index duplicate audit's oracle face (q150,
    * the q146 pattern applied to the three MAINTAINED index families):
    * build a real IVF membership, PQ code relation, and inverted
    * index at unique temp tables from the corpus, plant the streaming
    * maintainer's replay window — the `%17` batch appends AGAIN
    * through the exact production appends ([[indexAppend]] /
    * [[pqIndexAppend]] / [[invIndexAppend]]), the
    * crash-after-append-before-marker shape — and run
    * [[indexDuplicateAudit]] over each. The DuckDB twin derives every
    * count from `embeddings`/`documents` alone (member and code rows
    * per vector, one posting per distinct token per document), so a
    * hash match proves the builds, the appends, and the audit's
    * recomputation all agree with the declared membership algebra —
    * and that the audit flags EXACTLY the planted families. Tables
    * drop after the bounded snapshot; the audit itself is three
    * single-exchange aggregates. */
  def q150IndexReconcile(spark: SparkSession, dir: String): DataFrame = {
    val suf = java.util.UUID.randomUUID().toString.replace("-", "")
    val (ivf, pq, inv) = (s"graft_q150_ivf_$suf", s"graft_q150_pq_$suf",
      s"graft_q150_inv_$suf")
    try {
      val e = pqVectors(spark, dir)
      // r21 (guide §2.6): the three families are INDEPENDENT
      // build-then-append pipelines over different tables — run them
      // concurrently so each family's stage tails back-fill the
      // others' idle executors; within a family the append still
      // strictly follows its build. Same tables, same planted
      // replay, same audit rows.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val delta = e.filter(col("vec_id") % 17 === 0)
      val families = Seq(
        Future {
          val (members, routing) = mapSideFineClustersWithRouting(e,
            labelCentroids(spark, dir), ClusterTargetOccupancy)
          Layout.writeIvfIndex(members, routing, ivf, IvfIndexBuckets)
          indexAppend(spark, ivf, delta)
        },
        Future {
          buildPqIndex(e, pq)
          pqIndexAppend(spark, pq, delta)
        },
        Future {
          buildInvIndex(spark, inv, docs(spark, dir))
          invIndexAppend(spark, inv,
            docs(spark, dir).filter(col("doc_id") % 17 === 0))
        })
      families.foreach(Await.result(_, Duration.Inf))
      val audit = indexDuplicateAudit(spark, ivf, Seq("vec_id"),
          "ivf_members")
        .unionByName(indexDuplicateAudit(spark, pq, Seq("vec_id"),
          "pq_codes"))
        .unionByName(indexDuplicateAudit(spark, inv, Seq("t", "doc_id"),
          "inv_postings"))
        .orderBy(col("index_family"))
      val snap = audit.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(snap: _*), audit.schema)
    } finally {
      Seq(ivf, ivf + "_routing", pq, pq + "_codebook", pq + "_stats",
          inv, inv + "_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  /** Corpus/grid-parameterized harness behind [[q149VerifiedCapSweep]]
    * (the spec drives it with a constructed fixture and reconciles
    * the ∞-cap rows against [[bandingSweepOver]]). */
  private[operators] def bucketCapSweepOver(corpus: DataFrame,
      configs: Seq[(Int, Int)], caps: Seq[Int]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = shingleHashSets(corpus).persist(CacheLevel)
    base.count()
    val sigs = minhashSigs(base).persist(NarrowCacheLevel)
    sigs.count()
    val truth = exactHalfJaccardTruth(base).persist(NarrowCacheLevel)
    val nTruth = truth.count()
    val lens = base.select(col("doc_id"), size(col("hs")).as("n_hs"))
    // ALL configs in one band relation (r21, the bandingSweepOver
    // merge): `cfg` joins the window partition keys, so rn/occ per
    // (config, bucket) are the per-config loop's values exactly; the
    // caps collapse into conditional aggregates — 2 report jobs total
    // instead of (2 + 2·|caps|) per config. Values are unchanged: the
    // filter-then-count and filter-then-agg forms become count/sum of
    // the same predicates.
    val bands = allConfigBands(sigs, configs)
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("cfg"), col("b"), col("bsig"))
        .orderBy(col("doc_id"))))
      .withColumn("occ", count(lit(1)).over(Window
        .partitionBy(col("cfg"), col("b"), col("bsig"))))
      .persist(NarrowCacheLevel)
    bands.count()
    // per candidate pair: the MINIMUM arrival distance over its
    // shared buckets (any-band serve, exactly the gate's OR)
    val pairDist = bands.as("x").join(bands.as("y"),
        col("x.cfg") === col("y.cfg") && col("x.b") === col("y.b") &&
          col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.cfg").as("cfg"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"),
        (col("y.rn") - col("x.rn")).as("dist"))
      .groupBy(col("cfg"), col("doc_a"), col("doc_b"))
      .agg(min(col("dist")).as("min_dist"))
    val servAggs = count(lit(1)).as("n_hits") +: caps.zipWithIndex.map {
      case (cap, i) =>
        sum(when(col("min_dist") <= cap, 1L).otherwise(0L)).as(s"serv$i")
    }
    val hitRows = pairDist.join(truth, Seq("doc_a", "doc_b"))
      .groupBy(col("cfg")).agg(servAggs.head, servAggs.tail: _*)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), caps.indices.map(i => r.getLong(2 + i)))).toMap
    val stateAggs = caps.zipWithIndex.flatMap { case (cap, i) =>
      val resident = col("rn") > col("occ") - cap.toLong
      Seq(sum(when(resident, 1L).otherwise(0L)).as(s"entries$i"),
        (sum(when(resident, col("n_hs")).otherwise(0L)) * 8L).as(s"bytes$i"))
    }
    val stateRows = bands.join(lens, "doc_id")
      .groupBy(col("cfg")).agg(stateAggs.head, stateAggs.tail: _*)
      .collect().map(r => r.getInt(0) ->
        caps.indices.map(i => (r.getLong(1 + 2 * i), r.getLong(2 + 2 * i))))
      .toMap
    val rows = configs.zipWithIndex.flatMap { case ((bC, r), ci) =>
      val (nHits, servs) =
        hitRows.getOrElse(ci, (0L, caps.indices.map(_ => 0L)))
      val states =
        stateRows.getOrElse(ci, caps.indices.map(_ => (0L, 0L)))
      caps.zipWithIndex.map { case (cap, i) =>
        val nServable = servs(i)
        val (entries, bytes) = states(i)
        (bC, r, cap, nTruth, nHits, nServable, nHits - nServable,
          entries, bytes)
      }
    }
    bands.unpersist(blocking = false)
    base.unpersist(blocking = false)
    sigs.unpersist(blocking = false)
    truth.unpersist(blocking = false)
    rows.toDF("bands", "rows_per_band", "cap", "n_truth", "n_hits",
        "n_servable", "n_cap_lost", "state_entries", "state_bytes")
      .select(col("bands").cast("int").as("bands"),
        col("rows_per_band").cast("int").as("rows_per_band"),
        col("cap").cast("int").as("cap"),
        col("n_truth"), col("n_hits"), col("n_servable"),
        col("n_cap_lost"),
        round(col("n_servable").cast("double") / col("n_truth"), 6)
          .as("recall_at_cap"),
        col("state_entries"), col("state_bytes"))
      .orderBy(col("bands"), col("rows_per_band"), col("cap"))
  }

  /** Serve EXTERNAL query vectors `(query_id, qe)` from a persisted
    * IVF index — the production similarity-search entry point. Query
    * routing reuses the index's own stored decisions: nearest coarse
    * centroid by the exact build-time argmax key (the collected
    * routing relation is ≤ 64 rows by construction), then that
    * centroid's stored sub-bucket mask over the query's SRP bits. The
    * members side stays a bucketed scan joined to a BROADCAST of the
    * routed queries — no corpus exchange at any query-set size that
    * broadcasts. */
  def indexLookup(members: DataFrame, routing: DataFrame,
      queries: DataFrame, k: Int = TopK): DataFrame = {
    val routed = routeThroughIndex(routing,
      queries.select(col("query_id"), col("qe")), "qe").drop("mask")
      // r22: norms hoisted below the candidate join (vecCosinePre)
      .withColumn("nq", vecNorm(col("qe")))
    val scored = members.withColumn("ne", vecNorm(col("e")))
      .join(broadcast(routed), Seq("cluster"))
      .withColumn("cosine",
        round(vecCosinePre(col("qe"), col("nq"), col("e"), col("ne")), 4))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(k, col("vec_id"), col("cosine")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("vec_id"), col("s.score").as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Assign rows a `cluster` by the index's STORED routing decisions:
    * nearest stored centroid via the exact build-time argmax key, that
    * centroid's stored mask over the row's SRP bits. The shared
    * assignment of [[indexLookup]] (queries) and [[indexAppend]] (new
    * corpus vectors) — both must land where the build would have
    * landed them. */
  private def routeThroughIndex(routing: DataFrame, rows: DataFrame,
      vecCol: String): DataFrame = {
    val route = routing
      .select(col("label").cast("long"), col("cvec").cast("array<double>"),
        col("mask").cast("long"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
    require(route.nonEmpty, "empty routing relation")
    val coarse = centroidArgmax(col(vecCol),
      route.map { case (l, v, _) => (l, v) }.toSeq)
    val maskCol = element_at(
      typedlit(route.map { case (l, _, m) => (l, m) }.toMap), coarse)
    rows.withColumn("cluster",
        coarse * lit(4294967296L) +
          srpSignature(col(vecCol)).bitwiseAND(maskCol))
      .withColumn("mask", maskCol)
  }

  /** Incremental index maintenance: append NEW vectors `(vec_id, e)`
    * to a persisted IVF index with ZERO re-clustering — each vector is
    * routed through the stored centroids/masks (exactly where the
    * original build would have put it) and bucket-appended, so serve
    * queries find old and new vectors in the same bucketed scan.
    *
    * The trade this encodes: centroids and masks are FROZEN at build
    * time, so appended data drifts cluster occupancy upward and never
    * reshapes the partition — the classic IVF maintenance posture
    * (append cheaply between rebuilds; rebuild when occupancy drift
    * erodes the per-query candidate bound). Spark validates the bucket
    * spec on append, so the layout invariant the serve path relies on
    * cannot silently degrade. */
  def indexAppend(spark: SparkSession, name: String,
      vectors: DataFrame): Unit =
    routeThroughIndex(spark.table(name + "_routing"),
        vectors.select(col("vec_id"),
          col("e").cast("array<double>").as("e")), "e")
      .select(col("vec_id"), col("e"), col("cluster"), col("mask"))
      // r21: cluster the batch by the bucket hash first (the
      // writeBucketed discipline) — ≤ numBuckets files per append
      // instead of tasks × buckets
      .repartition(IvfIndexBuckets, col("cluster"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(IvfIndexBuckets, "cluster").sortBy("cluster")
      .saveAsTable(name)

  /** Occupancy-drift report for a persisted IVF index — the REBUILD
    * trigger [[indexAppend]]'s frozen routing makes necessary: per
    * coarse centroid, member count, sub-cluster count (mask + 1), and
    * average fine-cluster occupancy vs the build target. Appends land
    * in a partition shaped for the BUILD-time corpus, so average
    * occupancy — and with it the per-query candidate list — drifts up
    * as data arrives; `needs_rebuild` flags a centroid whose average
    * crossed 2× the target, the point where re-running
    * [[Layout.writeIvfIndex]] restores the serve bound. One bounded
    * aggregate over the bucketed scan (≤ 64 result rows); the narrow
    * projection reads only the two key columns. */
  def indexOccupancyReport(spark: SparkSession, name: String,
      targetOcc: Int = ClusterTargetOccupancy): DataFrame =
    spark.table(name)
      .groupBy(expr("cluster div 4294967296").as("label"), col("mask"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("label"), col("n_members"),
        (col("mask") + 1).as("n_subclusters"),
        round(col("n_members").cast("double") / (col("mask") + 1), 2)
          .as("avg_occupancy"),
        (col("n_members").cast("double") / (col("mask") + 1) >
          targetOcc * 2.0).as("needs_rebuild"))
      .orderBy(col("label"))

  /** L2 — n-gram Jaccard near-duplicate detection via PREFIX FILTERING
    * (the PPJoin-family blocking): under a global total order on gram
    * hashes, two sets with `Jaccard >= t` must share at least one of
    * their `p = |S| - ceil(t·|S|) + 1` first elements — so candidate
    * pairs come from an equi-join on prefix membership, never
    * all-pairs. The complementary scale path to q24's MinHash-LSH:
    * exact recall at the threshold (no probabilistic bands) at the cost
    * of O(p) blocking keys per doc; blocking keys are plain longs, and
    * verification intersects the distinct hash arrays — both engines
    * share the md5-derived hash, so parity is exact.
    *
    * The global order is (document frequency ASC, hash) — the part of
    * PPJoin that makes or breaks it: prefixes then hold each doc's
    * RAREST grams, so a gram shared by thousands of documents almost
    * never blocks (it sorts to the suffix), and candidate volume tracks
    * true near-dups instead of stopword statistics. A raw hash order
    * (random) put frequent grams in prefixes and measured 10× slower
    * on this corpus from candidate blow-up alone. */
  def q40NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // distinct (doc, gram-hash) pairs — r22 (guide §4 + §2.4): the
    // native ShingleHashSorted pass (bit-identical hashes, spec-pinned)
    // replaces the interpreted zip_with gram fold + per-gram md5
    // transform, and because its output is ALREADY distinct per doc the
    // groupBy-as-distinct exchange the old explode→hash form needed is
    // gone outright (the within-doc distinct happens map-side, inside
    // the compiled pass)
    val pairs = nearDocs(spark, dir)
      .select(col("doc_id"), explode(graft.expressions.DedupFunctions
        .shingleHashSetSorted(split(col("text"), " "), 2)).as("h"))
    // corpus document frequency per gram — defines the global order.
    // Computed as a WINDOW over the distinct pairs (one exchange+sort
    // by h) instead of a separate groupBy + re-join (two exchanges and
    // a join build over the same rows): 4 shuffles → 3 for the whole
    // prefix build.
    val withDf = pairs.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("h"))))
    // per doc: hashes ordered (df asc, h asc); array_sort on the struct
    // sorts lexicographically by field position = that exact order
    val hashed = withDf
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
      // hs: df-ordered (prefix semantics); hs_sorted: value-sorted for
      // the codegen'd two-pointer intersection in verification
      .select(col("doc_id"),
        transform(col("ord"), s => s.getField("h")).as("hs"))
      .withColumn("hs_sorted", array_sort(col("hs")))
      // referenced three times (prefix explode + both verification
      // sides) — same materialization rationale as q24's shingles,
      // but as an EAGER lineage-truncating localCheckpoint rather
      // than a lazy persist: a persisted block that falls out of
      // storage silently degrades to recomputing the whole
      // gram→df→sort pipeline ONCE PER READ (the r11 driver's
      // 13.7 s trailing sample on this exact relation, 3.7× its
      // median); checkpoint blocks at MEMORY_AND_DISK_SER spill to
      // disk instead of degrading, so the three reads pay at most a
      // local disk read under any heap pressure (VERDICT r12 brief
      // #1b)
      .localCheckpoint(true, CacheLevel)
    // prefix size p = |S| - ceil(t·|S|) + 1 with t = 0.8, in INTEGER
    // arithmetic (ceil(0.8s) = (4s+4) div 5): float ceil(0.8*s) rounds
    // up on ulp noise and silently shrinks the prefix — a recall bug,
    // not just an oracle-parity one
    val s = size(col("hs"))
    val p = (s - floor((s * 4 + 4) / 5) + 1).cast("int")
    val pref = hashed.select(col("doc_id"), size(col("hs")).as("n"),
      posexplode(slice(col("hs"), lit(1), p)).as(Seq("pos", "key")))
    // PPJoin positional filter: a key match at (0-based) positions
    // (i, j) bounds the overlap by 1 + min(n_a−i−1, n_b−j−1); the pair
    // can reach Jaccard t only if that bound ≥ α = ceil(t/(1+t)·(n_a+n_b))
    // (= ceil(4(n_a+n_b)/9) at t = 0.8, integer-exact). Applied inside
    // the join it prunes candidates whose shared prefix keys all sit
    // too deep — correctness-preserving (never drops a pair that could
    // clear t), so the oracle needs no twin: both engines verify with
    // exact Jaccard and produce identical survivors.
    val alpha = (col("x.n") + col("y.n")) * 4
    val cand = pref.as("x")
      .join(pref.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id") &&
          (lit(1) + least(col("x.n") - col("x.pos") - 1, col("y.n") - col("y.pos") - 1)) * 9
            >= alpha)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verification: codegen'd two-pointer |A∩B| over the value-sorted
    // arrays (array_intersect would build a hash set per pair on the
    // interpreted path — at millions of candidates that WAS the query)
    val ha = hashed.select(col("doc_id").as("doc_a"),
      col("hs_sorted").as("sa"), size(col("hs_sorted")).as("na"))
    val hb = hashed.select(col("doc_id").as("doc_b"),
      col("hs_sorted").as("sb"), size(col("hs_sorted")).as("nb"))
    cand.join(ha, "doc_a").join(hb, "doc_b")
      .withColumn("inter",
        graft.expressions.VectorFunctions.sortedIntersectSize(
          col("sa"), col("sb")).cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= NgramJaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Pipeline — deterministic stratified corpus split (train/val/test
    * 80/10/10): every document is assigned by a portable md5-derived
    * hash of its id — stable across engines, machines, partitionings,
    * and reruns, so a 100 TB corpus splits identically no matter how
    * the job is laid out. Summarized per (lang, split) to verify the
    * strata. Pure map-side projection + partial-aggregated rollup. */
  def q41StratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(portableHash(concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
    val split = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    docs(spark, dir)
      .select(col("lang"), split.as("split"), length(col("text")).as("n_chars"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("lang"), col("split"))
  }

  /** The quality-gate verdict as a pure column expression over a text
    * column (the C4/Gopher-style rule cascade): `keep` or the FIRST
    * failing rule in a fixed order (too_short → too_long →
    * low_diversity → repetitive), mirroring the reference's first-error
    * validation cascade (`src/transmitter/main.cpp:151-210`) applied to
    * corpus curation. A NULL/missing text is `too_short` — without the
    * guard every rule predicate is null and the cascade would fall
    * through to `keep`, passing malformed records (moot for the
    * null-free batch corpus, real on a near-line ingest stream). Pure
    * map-side logic, so the IDENTICAL definition runs in batch (q46)
    * and over an unbounded stream ([[graft.streaming.Curation]]) —
    * batch/stream agreement asserted row-for-row in DedupSpec. */
  def qualityVerdict(text: Column): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    val ttr = size(array_distinct(toks)).cast("double") / n
    // duplicate-bigram fraction: 1 − distinct bigrams / total bigrams
    val rep = when(n >= 2,
      lit(1.0) - size(wordShingles(toks, 2)).cast("double") / (n - 1))
      .otherwise(lit(0.0))
    when(text.isNull, "too_short")
      .when(n < 20, "too_short")
      .when(n > 90, "too_long")
      .when(ttr < 0.35, "low_diversity")
      .when(rep > 0.08, "repetitive")
      .otherwise("keep")
  }

  /** The PII patterns and redaction, shared by batch q48 and
    * [[graft.streaming.Curation.piiScrub]] — ONE definition, so
    * tightening a pattern cannot leave the streaming ingest path
    * scrubbing with stale regexes. */
  private[graft] val PiiEmailRe = "[a-z0-9._]+@[a-z0-9.]+"
  private[graft] val PiiUrlRe = "https?://[a-z0-9./]+"
  private[graft] def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, PiiEmailRe, "<EMAIL>"),
      PiiUrlRe, "<URL>")
  private[graft] def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PiiEmailRe), lit(0))) +
      size(regexp_extract_all(text, lit(PiiUrlRe), lit(0)))

  /** Pipeline — quality-filter gate: [[qualityVerdict]] per document,
    * rolled up per (lang, verdict). The whole verdict is map-side; the
    * only shuffle is the final rollup. Thresholds are
    * corpus-calibrated so every rule demonstrably fires
    * (keep/too_short/too_long/low_diversity/repetitive all non-empty
    * on the synthetic corpus). */
  def q46QualityFilter(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), qualityVerdict(col("text")).as("verdict"),
        size(split(col("text"), " ")).as("n_toks"))
      .groupBy(col("lang"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("n_toks")), 2).as("avg_toks"))
      .orderBy(col("lang"), col("verdict"))

  /** Pipeline — corpus vocabulary top-k: the 20 globally most frequent
    * tokens with total occurrences and document frequency. Explode →
    * hash-agg (both counts partial-aggregate map-side; doc frequency
    * via count(DISTINCT doc_id) expands once in the same exchange) →
    * global top-k as TakeOrdered (k rows per partition, then a k-merge
    * on the driver — never a full global sort). */
  def q47VocabTopk(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(20)

  /** L4 — heavy hitters with BOUNDED memory (the 100 TB twin of
    * [[q47VocabTopk]]): q47's full `groupBy(token)` exchanges one row
    * per distinct token and holds the whole vocabulary in aggregation
    * state — fine for this corpus, unbounded for a web-scale one.
    * This form never materializes the vocabulary: pass 1 runs the
    * Misra–Gries sketch ([[graft.functions.HeavyHitters]], ≤ m
    * counters per partial, associative merges, every token with count
    * > N/(m+1) guaranteed to survive), pass 2 recounts EXACTLY but
    * only over the ≤ m broadcast candidates (LEFT SEMI prunes the
    * explode output map-side, so the second exchange carries ≤ m
    * distinct keys no matter the vocabulary size). Output is
    * bit-identical to q47 whenever the top-k all clear the N/(m+1)
    * bar — m = 4096 puts that bar at 0.024% token frequency, far
    * below any stopword — so the oracle is q47's EXACT sql, not a
    * weakened contract: the hash match proves the sketch candidates
    * covered the true top-20. */
  def q64HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val m = 4096
    val toks = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val cands = toks
      .agg(graft.functions.HeavyHitters.candidates(m, col("token")).as("c"))
      .select(explode(col("c")).as("token"))
    toks.join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(20)
  }

  /** Pipeline — deterministic per-stratum uniform sample: the k
    * documents with the smallest portable hash of `sample:doc_id` per
    * language — "show me k random docs per stratum" with an answer
    * that is stable across engines, partitionings, and reruns (the
    * audit/eyeball primitive every curation pipeline needs; same
    * hash-membership idiom as q41/q54). Ranking runs through the
    * bounded [[graft.functions.TopK]] Aggregator on the NEGATED hash —
    * each partition reduces to k rows map-side, so there is no
    * per-stratum window sort and no skew funnel: the shuffle carries
    * ≤ partitions × k rows per language at any corpus size. */
  def q66DeterministicSample(spark: SparkSession, dir: String): DataFrame = {
    val h = pmod(portableHash(concat(lit("sample:"), col("doc_id").cast("string"))),
      lit(1000000L))
    docs(spark, dir)
      .select(col("lang"), col("doc_id"), h.as("h"))
      .groupBy(col("lang"))
      // TopK keeps the LARGEST scores (desc, id asc on ties): negating
      // the hash yields hash ASC with the same deterministic tie-break
      .agg(graft.functions.TopK.topK(5, col("doc_id"), -col("h").cast("double")).as("topk"))
      .select(col("lang"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("doc_id"), (-col("s.score")).cast("long").as("h"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Pipeline — intra-document repetition detection: the Gopher-style
    * duplicated-n-gram quality rule (Rae et al. 2021 drop documents
    * whose duplicated 3-gram fraction is high — the boilerplate /
    * template-spam signal that per-corpus dedup can't see because the
    * repetition is INSIDE one document). Per document: the full 3-gram
    * multiset ([[graft.functions.TextFunctions.wordShingleMultiset]]),
    * `g` occurrences, `d` distinct — duplicated fraction `(g-d)/g`.
    * The corpus deterministically appends each (doc_id % 17 == 0)
    * document's own first 12 tokens twice — injected boilerplate, the
    * same reinsertion idiom as the dedup corpora — so the rule
    * demonstrably fires.
    *
    * Scale posture: pure map-side array math per row (the zip_with
    * shingle fold + array_distinct — no explode, no shuffle before
    * the per-language rollup, which partial-aggregates to |lang|
    * rows). The flag threshold compares in INTEGERS
    * (`(g-d)*100 >= 15*g` ⟺ dup fraction ≥ 0.15) so the cut is
    * engine-portable with no float boundary, and the corpus-level
    * `rep_pct` is a single division of two exactly-summed longs. */
  /** The ONE shared repetition definition behind q68 and the streaming
    * twin ([[graft.streaming.Curation.withRepetitionVerdict]]):
    * per-document 3-gram occurrence count, duplicated-occurrence
    * count, and the flag — `g > 0 && dup·100 ≥ 15·g` (integer-exact:
    * no float boundary between engines; the `g > 0` guard keeps
    * sub-3-token documents unflagged). All map-side array math. */
  def repetitionColumns(textCol: Column): (Column, Column, Column) = {
    val grams = wordShingleMultiset(split(textCol, " "), 3)
    val g = size(grams).cast("long")
    val dup = (g - size(array_distinct(grams)).cast("long"))
    (g, dup, g > 0L && dup * 100L >= g * 15L)
  }

  def q68RepetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    // two-step select: the lateral-alias guard (see dupEmbeddings) —
    // the boilerplate append must bind to the SPLIT array once
    val prefix12 = array_join(slice(split(col("text"), " "), 1, 12), " ")
    val aug = docs(spark, dir)
      .select(col("lang"), col("doc_id"), col("text"), prefix12.as("p12"))
      .select(col("lang"),
        when(col("doc_id") % 17 === 0,
          concat_ws(" ", col("text"), col("p12"), col("p12")))
          .otherwise(col("text")).as("text"))
    val (g, dup, flag) = repetitionColumns(col("text"))
    aug.select(col("lang"), g.as("g"), dup.as("dup"), flag.as("flagged"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("g")).as("n_grams"),
        sum(col("dup")).as("n_dup_grams"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"))
      .withColumn("rep_pct",
        round(col("n_dup_grams").cast("double") / col("n_grams"), 6))
      .select(col("lang"), col("n_docs"), col("n_grams"),
        col("n_dup_grams"), col("n_flagged"), col("rep_pct"))
      .orderBy(col("lang"))
  }

  /** Pipeline — PII detection + scrub accounting: emails and URLs are
    * extracted (regexp, codegen'd) and redacted to `<EMAIL>`/`<URL>`
    * placeholders; the rollup reports per-language how many documents
    * carried PII, how many of each kind, and the total bytes removed.
    * The corpus deterministically injects contact strings on
    * doc_id % 13 == 0 (same reinsertion idiom as the dedup corpora) so
    * the scrubber demonstrably fires. Pure map-side projection +
    * rollup — at 100 TB this is a single scan. */
  def q48PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val corpus = docs(spark, dir).select(col("lang"),
      when(col("doc_id") % 13 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example or http://site"), col("doc_id").cast("string"),
          lit(".example/page")))
        .otherwise(col("text")).as("text"))
    corpus
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit(PiiEmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PiiUrlRe), lit(0))).as("n_urls"),
        (length(col("text")) - length(piiRedact(col("text")))).as("len_delta"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") + col("n_urls") > 0, 1L).otherwise(0L)).as("n_docs_with_pii"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_urls")).as("n_urls"),
        sum(col("len_delta")).as("total_len_delta"))
      .orderBy(col("lang"))
  }

  /** Pipeline — train/test contamination check (decontamination): over
    * the exact-dup corpus split by [[q41StratifiedSplit]]'s portable
    * hash, count test-split documents sharing at least one word-8-gram
    * with ANY train-split document. Grams join on their md5-derived
    * hash (8 bytes over the wire, identical in DuckDB), the membership
    * test is a LEFT SEMI join — hash-partitioned on the gram, never
    * all-pairs, and the semi join short-circuits per gram. A broadcast
    * Bloom filter over the test-set grams prunes the (corpus-sized)
    * train side map-side BEFORE its exchange — see
    * [[contaminationReport]] for the scale rationale. The
    * injected exact duplicates make contamination real: a copy whose
    * hash lands across the split boundary shares every gram with its
    * train-side original. */
  def q49Contamination(spark: SparkSession, dir: String): DataFrame =
    contaminationReport(spark, dir, DecontamBloomBits)

  /** Default Bloom size for [[q49Contamination]]: 2^20 bits (a 256 KiB
    * word array in the plan). Sized to the TEST-SET gram count, which
    * is fixed by the eval benchmarks — it does not grow with the
    * corpus, so neither does the filter. At ~24k test grams (sf0.1)
    * the single-hash FP rate is ~2%: the corpus-side exchange carries
    * ~2% of corpus grams instead of 100%. */
  private val DecontamBloomBits = 20

  /** Build a broadcast single-hash Bloom filter over `keys` (a
    * one-LONG-column relation — already-hashed values) and return the
    * membership PREDICATE as a reusable Column function. The shared
    * primitive behind [[q49Contamination]] and [[q71IncrementalDedup]]
    * — the candidates-then-exact asymmetry: whenever an exact
    * (semi/anti) join pairs a SMALL keyed relation against a
    * CORPUS-sized one, a Bloom of the small side prunes the corpus
    * side map-side BEFORE its exchange. No false negatives, so the
    * exact join downstream keeps exactness; FPs only pass extra rows.
    *
    * Construction is distributed and bounded: bit position = `key mod
    * 2^bits`, OR-ed into 32-bit words by a partial-aggregated groupBy;
    * only the word relation (≤ 2^bits/32 rows — bounded by the filter
    * WIDTH, not the data) is collected. The membership test compiles
    * to codegen'd `element_at`/`pmod`/`pow` over one array literal
    * (bit = pow(2, pos&31): exponent ≤ 31, exact in doubles) — no UDF.
    * Size `bits` to the SMALL side's cardinality; the small side of
    * this asymmetry (eval sets, daily crawl batches) does not grow
    * with the corpus, so neither does the filter.
    *
    * The width is capped at 2^24 bits (a 2 MB long-array literal):
    * the filter rides the PLAN as one literal array, serialized into
    * every task binary — at 2^24 that is 2 MB (fine, the broadcast-
    * threshold class); at the old 2^30 cap it would be a 256 MB
    * literal in every serialized task, three orders of magnitude past
    * where the plan-literal technique is sane. A small side needing
    * more than ~16M distinct bits has stopped being the small side of
    * the asymmetry — use a real broadcast-hash semi-join instead
    * (VERDICT r11 §wrong-2). */
  private[operators] def bloomMightContain(keys: DataFrame,
      bloomBits: Int): Column => Column = {
    require(bloomBits >= 5 && bloomBits <= 24,
      "bloomBits in [5, 24]: the filter is a plan-literal array " +
        "(2^bits/8 bytes in every task binary); past 2 MB use a " +
        "broadcast join, not a wider literal")
    val m = 1L << bloomBits
    val keyCol = col(keys.columns.head)
    val pos = pmod(keyCol, lit(m))
    val words = keys
      .select((pos / 32).cast("int").as("w"),
        pow(lit(2.0), pos.cast("int") % 32).cast("long").as("bit"))
      .groupBy(col("w")).agg(bit_or(col("bit")).as("bits"))
      .collect()
    val bloom = new Array[Long]((m / 32).toInt)
    words.foreach(r => bloom(r.getInt(0)) = r.getLong(1))
    (key: Column) => {
      val p = pmod(key, lit(m))
      element_at(lit(bloom), (p / 32).cast("int") + 1)
        .bitwiseAND(pow(lit(2.0), p.cast("int") % 32).cast("long")) =!= 0L
    }
  }

  /** The distinct word-`n`-gram hash set of a document relation — THE
    * shared eval-set derivation of the decontamination family: batch
    * q113 stage 4 builds its Bloom + semi-join side from it, and
    * [[contaminationPredicate]] compiles it into the streaming ingest
    * gate's map-side verdict. One definition, so the nightly batch
    * artifact and the near-line gate can never disagree on what "a
    * gram of the eval set" means. Output: one `h` long column
    * ([[graft.functions.TextFunctions.portableHashMod]] over
    * [[graft.functions.TextFunctions.wordShingles]]), distinct. */
  def wordGramHashes(rel: DataFrame, textCol: String, n: Int = 8): DataFrame =
    rel.select(explode(wordShingles(split(col(textCol), " "), n)).as("gram"))
      .select(portableHashMod(col("gram")).as("h")).distinct()

  /** The decontamination verdict as ONE map-side Column predicate —
    * the STREAMING face of q49 / q113-stage-4 (VERDICT r15 §next-3):
    * TRUE iff the text shares at least one word-`n`-gram hash with
    * `evalGrams` (a one-long-column relation, the [[wordGramHashes]]
    * artifact a nightly batch persists). EXACT, not approximate: the
    * broadcast Bloom ([[bloomMightContain]] — no false negatives)
    * prunes per gram, then a codegen'd binary search over the SORTED
    * eval hash set ([[graft.expressions.AnySortedSetMember]]) confirms
    * — a Bloom false positive costs ~15 long compares, never a flipped
    * verdict. Gram-hash equality semantics are identical to the batch
    * semi-join's, so batch/stream verdicts agree row for row (asserted
    * in DedupSpec).
    *
    * Both artifacts ride the PLAN as literals — the bounded-eval-set
    * rationale of [[DecontamBloomBits]]: eval benchmarks are fixed by
    * the benchmarks, not the corpus, so neither literal grows with
    * ingest volume. Capped at 2^18 grams (a 2 MB long-array literal,
    * the [[bloomMightContain]] cap class); a "small side" past that
    * has stopped being small — run the batch semi-join instead.
    *
    * ZERO state, zero stream-side exchanges, no per-micro-batch join:
    * this is what lets the composed ingest gate add decontamination
    * while keeping exactly ONE stateful operator. A null text has no
    * grams and is never contaminated (matches the batch semi-join,
    * where a null produces no gram rows). */
  def contaminationPredicate(evalGrams: DataFrame,
      bloomBits: Int = DecontamBloomBits, n: Int = 8): Column => Column = {
    val hs = evalGrams
      .select(col(evalGrams.columns.head).cast("long").as("h"))
      .distinct().collect().map(_.getLong(0)).sorted
    require(hs.nonEmpty, "empty eval gram set")
    require(hs.length <= (1 << 18),
      s"eval gram set has ${hs.length} > 2^18 entries: past the plan-" +
        "literal class — decontaminate with the batch semi-join instead")
    val spark = evalGrams.sparkSession
    import spark.implicits._
    val mightContain = bloomMightContain(hs.toSeq.toDF("h"), bloomBits)
    (text: Column) => coalesce(
      graft.expressions.VectorFunctions.anySortedSetMember(
        filter(transform(wordShingles(split(text, " "), n),
          g => portableHashMod(g)), h => mightContain(h)),
        hs),
      lit(false))
  }

  /** [[q49Contamination]] with the Bloom width exposed: PipelineSpec
    * drives `bloomBits` down to a deliberately saturated filter to
    * prove false positives cannot change the answer. */
  private[operators] def contaminationReport(spark: SparkSession, dir: String,
      bloomBits: Int): DataFrame = {
    require(bloomBits >= 5 && bloomBits <= 24, "bloomBits in [5, 24]")
    val bucket = pmod(portableHash(concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
    // Persisted: the explode + md5 stage feeds both the train-gram set
    // and the test relation; one serialized copy replaces a second
    // full re-derivation of the map-heavy stage (same rationale as the
    // persisted hash arrays in verifiedNearDupPairs / q40).
    val grams = dupDocs(spark, dir)
      .withColumn("b", bucket)
      // the val split [80,90) feeds neither consumer — drop it BEFORE
      // the explode+hash and the persist, not after
      .filter(col("b") < 80 || col("b") >= 90)
      .select(col("doc_id"), col("lang"), col("b"),
        explode(wordShingles(split(col("text"), " "), 8)).as("gram"))
      .select(col("doc_id"), col("lang"), col("b"), portableHashMod(col("gram")).as("h"))
      .persist(NarrowCacheLevel)
    val test = grams.filter(col("b") >= 90)
    // ---- broadcast Bloom pre-filter (VERDICT r10 §missing-1) --------
    // The LEFT SEMI below is exact but hash-partitions BOTH sides; at
    // 100 TB the corpus/train gram relation dwarfs the test set by
    // orders of magnitude, and shuffling it in full is the one
    // scale-killer exchange this file had left. The fix is the same
    // candidates-then-exact discipline as q64/q55: a Bloom filter
    // built over the SMALL side (test grams), applied map-side to the
    // train side BEFORE its exchange. Bloom false negatives don't
    // exist, so no true match is lost; false positives only let extra
    // train grams through to the semi-join, which stays exact.
    //
    // Construction is distributed and bounded: one bit per test gram
    // (single-hash Bloom — position = h mod 2^bloomBits), OR-ed into
    // 32-bit words by a partial-aggregated groupBy, and ONLY the word
    // relation (≤ 2^bloomBits/32 rows, bounded by the filter width
    // regardless of data volume) is collected — the same
    // bounded-by-construction driver snapshot as q60's 3-row sketch.
    // The membership test compiles to codegen'd element_at/pmod/pow
    // over an array literal (bit = pow(2, pos&31): exponent ≤ 31, so
    // the double is exact) — no UDF in the hot path.
    // The build pass reads the test grams through the persisted gram
    // cache: the fill is paid exactly once either way (the main
    // query's train side scans the same cache), so routing the build
    // through it adds no corpus work — it only moves the one fill
    // into the build job.
    val mightContain = bloomMightContain(test.select(col("h")), bloomBits)
    val trainGrams = grams.filter(col("b") < 80)
      .filter(mightContain(col("h")))
      .select(col("h")).distinct()
    val contaminated = test.join(trainGrams, Seq("h"), "left_semi")
      .select(col("doc_id"), col("lang")).distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("c"))
    val totals = test.select(col("doc_id"), col("lang")).distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("n_test"))
    totals.join(contaminated, Seq("lang"), "left")
      .select(col("lang"), col("n_test"),
        coalesce(col("c"), lit(0L)).as("n_contaminated"))
      .orderBy(col("lang"))
  }

  /** Pipeline — duplicate-cluster assignment: connected components over
    * the verified MinHash near-dup pair graph, reported as a cluster-
    * size histogram. The corpus unions BOTH reinsertion families
    * (exact copies at +1M, perturbed copies at +2M) so components
    * genuinely chain (original ↔ exact copy ↔ near copy → size-3
    * clusters; LSH-similar unrelated docs extend some to 4).
    *
    * The algorithm is iterative min-label propagation: each round,
    * every node adopts the smallest label among itself and its
    * neighbours (one hash-shuffle join + one partial-aggregated
    * groupBy per round), terminating when an aggregate-only
    * convergence probe reports zero changed labels. Rounds are bounded
    * by the component diameter (≈3 here); only O(1) aggregates ever
    * reach the driver — no collect of graph data. The plain form is
    * kept here because near-dup graphs are shallow by construction;
    * for deep or path-shaped graphs the library ships
    * [[Graph.connectedComponentsStar]] (alternating large-star /
    * small-star, Kiveris et al., O(log² n) rounds regardless of
    * diameter — equivalence with union-find asserted in GraphSpec). */
  def q50DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    val corpus = d
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" extra token tail")).as("text")))
    // Symmetrize with a single explode rather than edges.union(edges.swap):
    // the union form evaluates the expensive LSH-candidate + intersect
    // verification once per branch (the shingle-hash base is persisted,
    // the candidate/verify stage is not). One explode = one evaluation.
    // Persisted PRE-PARTITIONED on the join key: the static edge side
    // feeds every propagation round's join, and an unpartitioned cache
    // would re-exchange the full symmetric edge set each round. Cached
    // as hash(src) the rounds' joins reuse that partitioning and
    // exchange only the (much smaller per round) labels side — one
    // edge exchange TOTAL, paid at cache fill.
    val sym = verifiedNearDupPairs(corpus)
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .persist(NarrowCacheLevel)
    // Each round: one hash-shuffle join + one partial-aggregated
    // groupBy. The node's OWN previous label rides through the union
    // (tagged), so the convergence probe is a filter over the round's
    // aggregate — no second join. Rounds end in an eager localCheckpoint
    // (persist() truncates recompute but not the logical plan, which
    // otherwise grows per round and OOMs analysis) with deterministic
    // release of the superseded round's blocks (GC-dependent cleanup
    // would pin O(rounds) label copies); the CheckpointScope's finally
    // frees whatever is still live if a round throws.
    val scope = new Graph.CheckpointScope
    try {
      var (labels, freeLabels) = scope.checkpoint(
        sym.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("label")))
      var changed = 1L
      var rounds = 0
      // near-dup graphs are shallow (original ↔ copies, diameter ~3);
      // 20 rounds is gross headroom, and NON-convergence must throw —
      // emitting the partial labels would silently fuse/split clusters
      val maxRounds = 20
      while (changed > 0 && rounds < maxRounds) {
        val (prop, freeProp) = scope.checkpoint(
          sym.join(labels, col("src") === col("node"))
            .select(col("dst").as("node"), col("label"), lit(false).as("own"))
            .union(labels.select(col("node"), col("label"), lit(true).as("own")))
            .groupBy(col("node"))
            .agg(min(col("label")).as("label"),
              min(when(col("own"), col("label"))).as("prev")))
        changed = prop.filter(col("label") =!= col("prev")).count()
        freeLabels()
        labels = prop.select(col("node"), col("label"))
        freeLabels = freeProp
        rounds += 1
      }
      if (changed > 0)
        throw new IllegalStateException(
          s"q50 label propagation did not converge in $maxRounds rounds " +
            "(diameter exceeds the shallow near-dup assumption) — use " +
            "Graph.connectedComponentsStar for deep graphs")
      // materialize the (tiny) histogram and DETACH it so the final
      // labels round and the edge cache can be released before
      // returning — checkpoint blocks bypass the CacheManager, so
      // nothing else would ever reclaim them
      val (out, keep) = scope.checkpoint(labels
        .groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size")).as("n_docs"))
        .orderBy(col("cluster_size")))
      scope.detach(keep)
      out
    } finally {
      scope.releaseAll()
      sym.unpersist(blocking = false)
    }
  }

  /** Shortlist size for [[q55QuantizedAnn]]'s approximate first pass —
    * the recall knob: quantization error can reorder near-ties, so the
    * exact re-rank sees 4× the final k. */
  private val QuantShortlist = 20

  /** L3 — quantization-accelerated re-rank ANN: the MEMORY side of ANN
    * at 100 TB. The scan-side index is the int8-quantized vector (64
    * bytes + one scale vs 512 bytes of doubles — 4× less to hold
    * resident than the raw embeddings), the first pass scores every
    * vector with the cheap quantized dot and keeps a
    * [[QuantShortlist]]-deep shortlist per query (bounded TopK
    * aggregator, map-side), and ONLY the shortlist rows fetch their
    * exact vectors for the final cosine re-rank. Quantization is
    * symmetric per-vector (`scale = max|x|/127`, half-up rounding —
    * identical in DuckDB), so both engines build the identical index;
    * shortlist ties break (approx desc, vec_id) in both. Complements
    * q31: IVF prunes by PARTITIONING the corpus, quantization prunes
    * the BYTES per candidate — production systems stack both. */
  def q55QuantizedAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    // the quantized index: persisted like q31's assignment — it IS the
    // structure a production system keeps resident
    val quant = e
      .withColumn("scale",
        greatest(array_max(transform(col("e"), x => abs(x))) / 127.0, lit(1e-12)))
      .select(col("vec_id"),
        transform(col("e"), x => round(x / col("scale")).cast("int")).as("qv"),
        col("scale"))
      .persist(CacheLevel)
    val q = quant.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"), col("scale").as("qs"))
    // pass 1: quantized dot over the whole index, bounded shortlist
    // adot is ROUNDED before the shortlist cut (like every other
    // cross-engine ranking cut here — cos/score round before rank).
    // Here the rounding is defensive parity hygiene, not a fix for an
    // observed divergence: the quantized dot is a sum of int products,
    // exact in doubles, so the raw value is already engine-identical —
    // the round just keeps this cut on the same convention as the rest
    val approx = quant.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("adot",
        round(vecDot(transform(col("qv"), x => x.cast("double")),
          transform(col("qq"), x => x.cast("double"))) * col("scale") * col("qs"), 6))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(QuantShortlist, col("vec_id"), col("adot")).as("short"))
      .select(col("query_id"), explode(col("short")).as("s"))
      .select(col("query_id"), col("s.id").as("vec_id"))
    // pass 2: exact re-rank of the shortlist only
    val qe = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qvec"))
    val exact = approx.join(e, "vec_id").join(broadcast(qe), "query_id")
      .withColumn("cosine", round(vecCosine(col("qvec"), col("e")), 4))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    exact.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(TopK, col("vec_id"), col("cosine")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("vec_id"), col("s.score").as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** L1 — PASSAGE-level exact dedup: non-overlapping 16-token chunks
    * hashed and deduplicated across the whole corpus — the granularity
    * that catches partially-copied documents a whole-document digest
    * (q23) misses (boilerplate headers, quoted passages, template
    * bodies). Runs over the exact-dup corpus so cross-document chunk
    * duplication demonstrably exists. Per language: chunk instances,
    * distinct chunks, and removable instances under a keep-first
    * policy. Scale shape: explode to one row per chunk, codegen'd md5,
    * partial-aggregated counts — one shuffle on the chunk hash. */
  def q56PassageDedup(spark: SparkSession, dir: String): DataFrame = {
    val chunkTokens = 16
    // toks MUST be projected to an attribute before entering the
    // transform lambda: a raw split(...) expression would be COPIED
    // into the lambda body and re-tokenize the whole document once per
    // chunk (the nested-HOF recompute trap, measured 50-150× on
    // q24 — see TextFunctions' scaladoc)
    val tk = dupDocs(spark, dir)
      .select(col("lang"), split(col("text"), " ").as("toks"))
      // filter BEFORE sequence: Spark's sequence(1, 0) DESCENDS
      // ([1, 0]), it does not return empty — short docs must not
      // reach it
      .filter(size(col("toks")) >= chunkTokens)
    val chunks = tk
      .select(col("lang"), posexplode(transform(
        sequence(lit(1), (size(col("toks")) / chunkTokens).cast("int")),
        i => array_join(
          slice(col("toks"), (i - 1) * chunkTokens + 1, lit(chunkTokens)), " ")))
        .as(Seq("pos", "chunk")))
      .select(col("lang"), portableHashMod(col("chunk")).as("h"))
    chunks
      .groupBy(col("lang"), col("h")).agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_uniq_chunks"),
        (sum(col("n")) - count(lit(1))).as("n_dup_chunks"))
      .orderBy(col("lang"))
  }

  /** L1 — CONTENT-DEFINED passage dedup: the alignment-robust upgrade
    * of q56. Fixed 16-token chunking (q56) misses a copied passage the
    * moment ANYTHING shifts its token offsets — a 3-token prefix, an
    * inserted sentence — because every chunk boundary moves. Here the
    * boundaries come from the CONTENT (a chunk ends after any token
    * whose portable hash ≡ 0 mod D — the rsync/LBFS rolling-cut idea
    * at token granularity): insert a prefix and the interior
    * boundaries stay glued to the same tokens, so the interior chunks
    * still collide. The corpus re-inserts PREFIX-SHIFTED copies
    * (doc_id % 13 == 0, three extra lead tokens) — exactly the copies
    * fixed chunking cannot see; PipelineSpec asserts the fixed-grid
    * variant finds ~none of them while this finds them all.
    *
    * Scale posture = q56's: chunking is per-row array math (the
    * bounds/toks attributes are projected BEFORE the lambdas — the
    * nested-HOF recompute guard), one shuffle on the chunk hash,
    * map-side partial aggregation. Expected chunk length is D tokens
    * (D = 8), a knob, not a guess. */
  /** Explode `textCol` into content-defined chunks: all input columns
    * plus `(chunk_idx, chunk)`. The ONE shared chunk derivation behind
    * [[q72CdcPassageDedup]] and the streaming twin
    * ([[graft.streaming.Dedup.dedupPassagesCdc]]) — boundaries after
    * any token whose portable hash ≡ 0 mod `cutMod`, so chunk edges
    * follow the CONTENT and survive offset shifts. The `_toks` /
    * `_bounds` intermediates are projected to attributes before
    * entering the lambdas (the nested-HOF recompute guard). Null-text
    * rows produce no chunks (the null propagates to the exploded
    * array). Stream-safe: pure map-side array math + posexplode. */
  def cdcChunkExplode(df: DataFrame, textCol: String,
      cutMod: Int = 8): DataFrame = {
    require(cutMod >= 2, "cutMod must be >= 2")
    val tk = df.withColumn("_toks", split(col(textCol), " "))
    val bd = tk.withColumn("_bounds",
      concat(array(lit(0)),
        filter(sequence(lit(1), size(col("_toks"))),
          i => pmod(portableHashMod(element_at(col("_toks"), i)), lit(cutMod)) === 0),
        array(size(col("_toks")))))
    bd.select(col("*"), posexplode(
        filter(transform(sequence(lit(1), size(col("_bounds")) - 1),
          j => when(
            element_at(col("_bounds"), j + 1) > element_at(col("_bounds"), j),
            array_join(slice(col("_toks"),
              element_at(col("_bounds"), j) + 1,
              element_at(col("_bounds"), j + 1) - element_at(col("_bounds"), j)),
              " "))),
          c => c.isNotNull)).as(Seq("chunk_idx", "chunk")))
      .drop("_toks", "_bounds")
  }

  def q72CdcPassageDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("lang"), col("doc_id"), col("text"))
    val corpus = d.select(col("lang"), col("text"))
      .unionByName(d.filter(col("doc_id") % 13 === 0)
        .select(col("lang"),
          concat(lit("shifted copy lead "), col("text")).as("text")))
    val chunks = cdcChunkExplode(corpus, "text")
      .select(col("lang"), portableHashMod(col("chunk")).as("h"))
    chunks.groupBy(col("lang"), col("h")).agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_uniq_chunks"),
        (sum(col("n")) - count(lit(1))).as("n_dup_chunks"))
      .orderBy(col("lang"))
  }

  /** L4 — BM25 retrieval over the corpus (Robertson/Spärck Jones,
    * k1 = 1.2, b = 0.75): the ranked-search primitive of a curation
    * pipeline (audit queries, decontamination probes, targeted
    * sampling). Everything data-dependent derives IN-PLAN: document
    * frequency per query term, corpus size, and average document
    * length ride one broadcast one-row relation — no driver-side
    * constants. The per-doc accumulation is a partial-aggregated
    * groupBy and the final top-10 is the bounded TopK aggregator;
    * ranking uses the ROUNDED score (ties by doc_id) so both engines
    * cut the identical list. */
  def q57Bm25(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = d.agg(count(lit(1)).cast("double").as("nn"),
      avg(col("dl")).as("avgdl"))
    // persisted: tf (≤ |terms| rows per matching doc — tiny) feeds both
    // the document-frequency aggregate and the scoring join; without it
    // the full-corpus explode+filter runs once per consumer
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
      .filter(col("t").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist(NarrowCacheLevel)
    bm25Rank(tf, stats)
  }

  /** The BM25 query terms shared by q57 and q86. */
  private val Bm25Terms = Seq("spark", "join", "window")

  /** The BM25 scoring + top-10 shared by q57 (in-session tokenize) and
    * q86 (postings read from the index at rest): `tf` carries one row
    * per (matching doc, query term) with the doc length, `stats` is
    * the one-row (corpus size, average doc length) relation. Document
    * frequency derives from `tf` itself; both callers therefore score
    * with the IDENTICAL expressions and cut the identical rounded-score
    * top-10 — the property that lets q86 reuse q57's oracle. */
  private def bm25Rank(tf: DataFrame, stats: DataFrame): DataFrame = {
    val df_ = tf.groupBy(col("t")).agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(broadcast(df_), "t").crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("nn") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * col("tf") * (lit(1.2) + 1.0)
        / (col("tf") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id")).agg(round(sum(col("w")), 4).as("score"))
    scored
      .agg(graft.functions.TopK.topK(10, col("doc_id"), col("score")).as("topk"))
      .select(posexplode(col("topk")).as(Seq("pos", "s")))
      .select((col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("doc_id"), col("s.score").as("score"))
      .orderBy(col("rk"))
  }

  /** Session-stable table name for the persisted inverted index of one
    * data directory (distinct per sf dir, like [[ivfIndexTable]]). */
  private[operators] def invIndexTable(dir: String): String =
    "graft_inv_" + dir.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** L4 — BM25 served from the inverted index AT REST: q85's
    * index-at-rest posture applied to text retrieval. Build-if-absent
    * writes the FULL postings relation `(t, doc_id, dl, tf)` bucketed
    * and sorted on the term plus the one-row corpus stats
    * ([[Layout.writeInvertedIndex]]); serve filters the postings to
    * the query terms — a pushed-down predicate on the sorted bucketed
    * column, so row groups without the terms never leave disk — and
    * ranks with the same [[bm25Rank]] as q57. No tokenization, no
    * corpus scan, no full-width exchange at serve time: document
    * frequency aggregates per term with ZERO exchange (bucketed key,
    * proven in LayoutSpec) and the only shuffles left are the
    * matching-docs accumulation and the 10-row result sort. Result is
    * row-identical to q57, so the oracle twin IS q57's — the hash
    * match proves the postings round-trip loses nothing. */
  def q86IndexedBm25(spark: SparkSession, dir: String): DataFrame = {
    val idx = invIndexTable(dir)
    val corpus = docs(spark, dir)
    ensureCurrent(spark, idx, corpusFingerprint(corpus))(
      buildInvIndex(spark, idx, corpus))
    invIndexBm25(spark, idx)
  }

  /** Build the inverted index at rest over `corpus` (doc_id, text). */
  def buildInvIndex(spark: SparkSession, name: String,
      corpus: DataFrame): Unit = {
    val d = tokenizedDocs(corpus)
    Layout.writeInvertedIndex(bm25Postings(d), bm25Stats(d), name,
      IvfIndexBuckets)
  }

  /** Serve the standing BM25 query set from a persisted inverted
    * index — build-free: postings filter on the sorted bucketed term
    * key (row groups without the terms never leave disk), stats ride
    * the one-row sidecar. */
  def invIndexBm25(spark: SparkSession, name: String): DataFrame = {
    val tf = spark.table(name).filter(col("t").isin(Bm25Terms: _*))
      .select(col("doc_id"), col("dl"), col("t"), col("tf"))
    bm25Rank(tf, spark.table(name + "_stats"))
  }

  /** The ONE tokenization all inverted-index writers share — build and
    * append must produce identical postings for identical text or the
    * appended index diverges from a rebuild. */
  private def tokenizedDocs(d: DataFrame): DataFrame = d
    .select(col("doc_id"), split(col("text"), " ").as("toks"))
    .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))

  private def bm25Postings(d: DataFrame): DataFrame = d
    .select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
    .groupBy(col("doc_id"), col("dl"), col("t"))
    .agg(count(lit(1)).cast("double").as("tf"))

  private def bm25Stats(d: DataFrame): DataFrame =
    d.agg(count(lit(1)).cast("double").as("nn"), avg(col("dl")).as("avgdl"))

  /** Incremental postings maintenance — [[indexAppend]]'s posture
    * applied to the text index: NEW documents tokenize through the
    * build's exact pipeline ([[tokenizedDocs]]) and bucket-append on
    * the term key (Spark validates the bucket spec, so the serve
    * path's pushdown invariant cannot silently degrade), and the
    * one-row corpus stats update INCREMENTALLY from the stored values
    * plus the batch's own aggregate — the existing corpus is never
    * re-read, let alone re-tokenized.
    *
    * Unlike the IVF index there is NO frozen-routing drift: document
    * frequency and corpus stats are derived at serve time from the
    * postings and stats relations themselves, so a serve over the
    * appended index is EXACTLY a serve over a full rebuild
    * (spec-proven: build on half the corpus, append the rest, scores
    * equal q57's full-corpus ranking row for row). The rebuild trigger
    * the IVF index needs has no text-index analog. */
  def invIndexAppend(spark: SparkSession, name: String,
      newDocs: DataFrame): Unit = {
    val d = tokenizedDocs(newDocs)
    // stats BEFORE postings, and short-circuit an empty batch: count=0
    // makes avgdl NULL (getDouble would NPE) and would merge a 0/0 NaN
    // into the stored average — an empty append must be a no-op.
    val batch = bm25Stats(d).collect().head
    if (batch.getDouble(0) == 0.0) return
    val (n2, avg2) = (batch.getDouble(0), batch.getDouble(1))
    bm25Postings(d)
      // r21: cluster by the bucket hash first (the writeBucketed
      // discipline) — ≤ numBuckets files per append
      .repartition(IvfIndexBuckets, col("t"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(IvfIndexBuckets, "t").sortBy("t")
      .saveAsTable(name)
    val old = spark.table(name + "_stats")
      .collect().headOption.map(r => (r.getDouble(0), r.getDouble(1)))
      .getOrElse((0.0, 0.0))
    val nn = old._1 + n2
    val merged = Seq((nn, (old._1 * old._2 + n2 * avg2) / nn))
    import spark.implicits._
    Layout.replaceStats(merged.toDF("nn", "avgdl"), name + "_stats")
  }

  /** L2 — blocked FUZZY JOIN by edit distance (entity resolution, the
    * record-linkage primitive none of the set-similarity family covers:
    * MinHash/SimHash/PPJoin see token sets, Levenshtein sees character
    * edits — "large widge" matches nothing as a shingle set but is one
    * edit from its source). A dirty feed derived deterministically from
    * `part` (one third drop their last character, one third gain a
    * trailing 'x', one third pass through clean — the q71
    * derived-corruption idiom) is matched against the DISTINCT clean
    * name vocabulary within edit distance 1.
    *
    * Scale posture (100 TB): the match dimension is the distinct-name
    * VOCABULARY — bounded by the name universe, not the row count — and
    * broadcasts; `levenshtein` is a codegen'd built-in evaluated
    * map-side, so the only exchange in the plan is the final
    * ≤|vocabulary|·2-row aggregate.
    *
    * Blocking is TRIPLE-KEY and exact for every d ≤ 1 edit except a
    * substitution BETWEEN a space and a non-space character (single-key
    * blocking is not even token-exact: one edit in the first token —
    * "cold rod" → "old rod" — escapes a first-token block, PipelineSpec
    * proved the loss): both sides emit under their first token, second
    * token, AND space-stripped whole string. An edit inside a token
    * changes at most that token (the other token block survives); a
    * space insert/delete (token merge/split — "cold rod" → "coldrod")
    * preserves the stripped string, so that block survives. The one
    * residual: "cold rod" → "coldxrod" (space SUBSTITUTED by a letter)
    * changes the token structure and the stripped string at once — no
    * equality block can bridge it, and the limitation is documented
    * here rather than papered over. Pairs sharing several blocks are
    * emitted once via a row-wise block-priority rule (see
    * [[fuzzyMatchDual]]): exactness with zero dedup exchange. */
  def q87FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val dirty = Tables.part(spark, dir)
      .select(
        when(col("p_partkey") % 3 === 0,
          expr("substring(p_name, 1, length(p_name) - 1)"))
          .when(col("p_partkey") % 3 === 1, concat(col("p_name"), lit("x")))
          .otherwise(col("p_name")).as("dirty"))
    fuzzyMatchDual(dirty, "dirty", Tables.part(spark, dir), "p_name")
      .groupBy(col("cand"), col("d"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("cand"), col("d"))
  }

  /** THE dual-token-blocked edit-distance matcher behind q87 and the
    * streaming resolution gate ([[graft.streaming.Resolve]]) — one
    * derivation, two faces (the `cdcChunkExplode` discipline). Returns
    * `records`' rows joined to every vocabulary entry within edit
    * distance 1 of `recordCol`, as (records.*, cand, d). Exactness and
    * the d=0 single-emission rule are as documented on [[q87FuzzyJoin]];
    * the vocabulary side is DISTINCT names exploded under both tokens
    * and broadcast, so the matcher is map-side against any record
    * volume — batch or per-micro-batch. */
  private[graft] def fuzzyMatchDual(records: DataFrame, recordCol: String,
      vocab: DataFrame, vocabCol: String): DataFrame = {
    // get(), not getItem(): a single-token string has no second token,
    // and under ANSI semantics getItem(1) on a 1-element array THROWS —
    // get() yields the NULL the blocking logic expects
    def tok(c: Column, i: Int) = get(split(c, " "), lit(i))
    def strip(c: Column) = regexp_replace(c, " ", "")
    // each side emits under THREE block keys: first token, second
    // token, and the space-stripped whole string (the third covers
    // token merge/split edits — "cold rod" -> "coldrod" is d = 1 but
    // shares no token; both strip to "coldrod"). The vocabulary rows
    // carry their full block set so the matcher can pick ONE canonical
    // shared block per pair map-side (see the keep rule below).
    val cb = vocab.select(col(vocabCol).as("cand")).distinct()
      // array_compact: a single-token candidate has a NULL second
      // token, and array_contains over an array holding NULL returns
      // NULL (not false) for absent values — which would null out the
      // keep rule below and silently drop matches
      .withColumn("__cblocks", array_compact(array_distinct(
        array(tok(col("cand"), 0), tok(col("cand"), 1),
          strip(col("cand"))))))
      .select(col("cand"), col("__cblocks"),
        explode(col("__cblocks")).as("__block"))
    val d1 = records.withColumn("__b1", tok(col(recordCol), 0))
      .withColumn("__b2", tok(col(recordCol), 1))
      .withColumn("__b3", strip(col(recordCol)))
    val dx = d1.withColumn("__block", col("__b1"))
      .unionByName(d1.filter(col("__b2") =!= col("__b1"))
        .withColumn("__block", col("__b2")))
      .unionByName(d1.filter(col("__b3") =!= col("__b1") &&
          (col("__b2").isNull || col("__b3") =!= col("__b2")))
        .withColumn("__block", col("__b3")))
    // exactly-once emission for EVERY pair (not just d = 0): a pair
    // may now share several blocks (both tokens, or a token plus the
    // stripped string), so keep only the copy joined under the
    // record's highest-priority block (b1 > b2 > stripped) that the
    // candidate also emits — computable row-wise from __cblocks, so
    // dedup costs no exchange.
    def cHas(b: Column) = array_contains(col("__cblocks"), b)
    dx.join(broadcast(cb), "__block")
      .withColumn("d", levenshtein(col(recordCol), col("cand")))
      .filter(col("d") <= 1 && (
        (col("__block") === col("__b1")) ||
        (col("__block") === col("__b2") && !cHas(col("__b1"))) ||
        (col("__block") === col("__b3") && !cHas(col("__b1")) &&
          (col("__b2").isNull || !cHas(col("__b2"))))))
      .drop("__block", "__cblocks", "__b1", "__b2", "__b3")
  }

  /** L1 — canonicalize-then-dedup (the normalization pass that runs
    * BEFORE every exact-dedup stage in a real corpus pipeline: case,
    * punctuation, and whitespace variants of the same content must
    * collapse to one digest or the digest groupBy can't see them):
    * lowercase → non-alphanumerics to spaces → runs of spaces to one →
    * trim, then the q23 digest-groupBy discipline on the CANONICAL
    * text. Reported per language: documents in, distinct canonical
    * forms, and how many documents the canonicalization collapsed ON
    * TOP of byte-exact dedup (raw-distinct minus canonical-distinct —
    * the pass's own contribution, not exact-dup recount).
    *
    * Scale shape: identical to q23 — the canonical form reduces to a
    * 16-byte md5 before the exchange, so the groupBy shuffles digests,
    * never document text; both distinct counts partial-aggregate
    * map-side in one pass (count_distinct over two digest columns).
    *
    * The corpus is [[dupDocs]] (byte-exact copies, which
    * canonicalization must NOT count as its own) plus a derived
    * formatting-variant feed (doc_id % 13 == 0 → the same content
    * upper-cased with doubled spaces and trailing punctuation under
    * doc_id + 2000000 — invisible to byte-exact dedup, collapsed by
    * the canonical digest). */
  def q91NormalizedDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = dupDocs(spark, dir).select(col("doc_id"), col("lang"), col("text"))
    val variants = docs(spark, dir)
      .filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"),
        concat(regexp_replace(upper(col("text")), " ", "  "), lit(" !!"))
          .as("text"))
    base.unionByName(variants)
      .select(col("lang"),
        md5(col("text").cast("binary")).as("raw_h"),
        md5(graft.functions.TextFunctions.canonicalText(col("text"))
          .cast("binary")).as("canon_h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("raw_h")).as("n_raw_distinct"),
        count_distinct(col("canon_h")).as("n_canonical"),
        (count_distinct(col("raw_h")) - count_distinct(col("canon_h")))
          .as("n_collapsed_by_norm"))
      .orderBy(col("lang"))
  }

  /** L4 — unigram-LM quality scoring (the CCNet/Gopher perplexity-proxy
    * signal with the LM DERIVED IN-PLAN): token unigram probabilities
    * come from the corpus's own counts, every document is scored by its
    * mean token log-probability, and documents more than two standard
    * deviations below the corpus mean are flagged as outliers
    * (gibberish / vocabulary-atypical text scores low under the
    * corpus's own distribution). Threshold, mean, and deviation are all
    * corpus-derived broadcast one-row relations — no tuned constants.
    * Scale shape: one token-count aggregate (the LM), one hash join of
    * token instances against it, one per-doc aggregate, one rollup;
    * flagging compares 6-decimal-rounded scores so both engines make
    * the identical cut. */
  def q58UnigramQuality(spark: SparkSession, dir: String): DataFrame = {
    val inst = docs(spark, dir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("t"))
    // the unigram LM: p(t) = count(t) / total — derived once, reused
    // via the join below (token vocabulary shuffles once)
    val lm = inst.groupBy(col("t")).agg(count(lit(1)).as("ct"))
    val tot = lm.agg(sum(col("ct")).cast("double").as("tot"))
    // perDoc (one row per document) is persisted — it feeds the bounds
    // aggregate AND the final rollup, and re-deriving it would repeat
    // the corpus-wide explode + LM join. The token-INSTANCE relation
    // itself is deliberately NOT persisted: at 100 TB it is larger than
    // the corpus, and recomputing a scan+split beats spilling it.
    val perDoc = inst.join(lm, "t").crossJoin(broadcast(tot))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(avg(log(col("ct").cast("double") / col("tot"))), 6).as("alp"))
      .persist(NarrowCacheLevel)
    val bounds = perDoc.agg(
      (avg(col("alp")) - lit(2.0) * stddev_samp(col("alp"))).as("lo"))
    perDoc.crossJoin(broadcast(bounds))
      .withColumn("flagged", col("alp") < round(col("lo"), 6))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("alp")), 4).as("avg_logprob"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy(col("lang"))
  }

  /** Bloom width for [[q71IncrementalDedup]] — sized to the BATCH
    * (a daily crawl's digest count), which is fixed by ingest cadence,
    * not by the accumulated corpus. */
  private val IncrementalBloomBits = 20

  /** Pipeline — INCREMENTAL corpus dedup (the production shape of L1:
    * dedup today's crawl against everything already ingested, not the
    * corpus against itself): a batch of arriving documents — fresh
    * content plus verbatim re-crawls, both derived deterministically
    * from the documents table — is ANTI-joined on the md5 content
    * digest against the reference corpus; the report counts, per
    * language, how much of the batch survived.
    *
    * Scale posture — the q49 asymmetry, reversed join: the REFERENCE
    * side is corpus-sized (at 100 TB it dwarfs any daily batch by
    * orders of magnitude) and an unguarded anti-join exchanges all of
    * it. [[bloomMightContain]] over the BATCH digests prunes the
    * reference map-side before its exchange: a reference doc whose
    * digest can't be in the batch can't affect the anti-join (no
    * false negatives), so the exchange carries ~|batch| + FP rows at
    * any corpus size. The exact join key stays the full md5 (the
    * 31-bit portable hash is only the Bloom's bit-position hash —
    * a collision there is just an FP, never a wrong drop). */
  def q71IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val ref = docs(spark, dir)
    // the batch's NARROW key projection is persisted: (lang, md5,
    // bloom-key) feeds THREE consumers (the Bloom build, the batch
    // totals, the anti-join) and at 100 TB each re-derivation would
    // re-scan and re-digest the crawl text — cache digests, not text
    val batch = ref.filter(col("doc_id") % 10 === 3)
      .select(col("lang"),
        concat(col("text"), lit(" fresh"), col("doc_id").cast("string")).as("text"))
      .unionByName(ref.filter(col("doc_id") % 23 === 0)
        .select(col("lang"), col("text")))
      .select(col("lang"), md5(col("text").cast("binary")).as("h"),
        portableHashMod(col("text")).as("k"))
      .persist(NarrowCacheLevel)
    val might = bloomMightContain(batch.select(col("k")), IncrementalBloomBits)
    val refDigests = ref
      .filter(might(portableHashMod(col("text"))))
      .select(md5(col("text").cast("binary")).as("h")).distinct()
    val kept = batch.join(refDigests, Seq("h"), "left_anti")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    batch.groupBy(col("lang")).agg(count(lit(1)).as("n_batch"))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_batch"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_batch") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
      .orderBy(col("lang"))
  }

  /** Pipeline — bigram-LM quality scoring: the CONDITIONAL upgrade of
    * q58's unigram model (the CCNet recipe scores documents with an
    * n-gram LM precisely because unigram frequency can't see broken
    * word ORDER — "the of and a" is unigram-perfect and bigram-garbage).
    * The LM is add-one smoothed `p(w2|w1) = (c(w1 w2) + 1) /
    * (c(w1·) + V)`, derived from the corpus itself in-plan; each
    * document scores the mean log-probability of its bigrams, and the
    * outlier threshold is the same in-plan mean − 2σ contract as q58.
    *
    * Scale posture (q58's, one level up): the bigram-instance relation
    * is derived TWICE (LM counts, scoring join) and deliberately never
    * persisted — at 100 TB it is larger than the corpus and
    * recomputing a scan+split beats spilling it. The LM and context
    * tables are vocabulary-bounded, not corpus-bounded, and both joins
    * hash-partition on their key (no broadcast assumption: a web-scale
    * bigram table does not fit an executor). Only V (a scalar) and the
    * 1-row bounds relation broadcast. Per-doc scores round to 6 before
    * any comparison — the shared cross-engine log discipline. */
  /** Derive the add-one-smoothed bigram LM from a corpus: one row per
    * observed bigram with its `ln((c(w1 w2)+1)/(c(w1·)+V))`
    * log-probability — the artifact [[q70BigramQuality]] scores
    * against in-plan and a nightly batch job would persist for the
    * streaming scorer
    * ([[graft.streaming.Curation.scoreBigramsAgainstLm]]). The
    * context join runs LM-table ⋈ context-table — BOTH
    * vocabulary-bounded — so the corpus-sized instance relation never
    * re-shuffles on `w1` (the first q70 draft paid exactly that). */
  def bigramLm(corpus: DataFrame, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val inst = corpus.select(explode(wordShingleMultiset(toks, 2)).as("bg"))
    val lm = inst.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val ctx = inst
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("cu"))
    val vocab = corpus.select(explode(toks).as("t"))
      .agg(countDistinct(col("t")).cast("double").as("v"))
    lm.join(ctx, substring_index(col("bg"), " ", 1) === col("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("bg"),
        log((col("cb") + 1L).cast("double") / (col("cu") + col("v"))).as("logp"))
  }

  def q70BigramQuality(spark: SparkSession, dir: String): DataFrame = {
    val corpus = docs(spark, dir)
    val inst = corpus
      .select(col("doc_id"), col("lang"),
        explode(wordShingleMultiset(split(col("text"), " "), 2)).as("bg"))
    // perDoc persisted (narrow): feeds the bounds aggregate AND the
    // final rollup — q58's exact rationale. The instance relation
    // joins the DERIVED (bg, logp) LM once, on bg only.
    val perDoc = inst
      .join(bigramLm(corpus, "text"), "bg")
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(avg(col("logp")), 6).as("alp"))
      .persist(NarrowCacheLevel)
    val bounds = perDoc.agg(
      (avg(col("alp")) - lit(2.0) * stddev_samp(col("alp"))).as("lo"))
    perDoc.crossJoin(broadcast(bounds))
      .withColumn("flagged", col("alp") < round(col("lo"), 6))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("alp")), 4).as("avg_bigram_logprob"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy(col("lang"))
  }

  /** Pipeline — training-sequence packing (the GPT-style concat-and-
    * chunk step): documents concatenate in deterministic doc_id order
    * and split into fixed 512-token training sequences; the report
    * counts, per language, the documents whose tokens straddle a
    * sequence boundary (the packing property loss functions care
    * about).
    *
    * The token positions need a GLOBAL prefix sum in doc order — the
    * naive `Window.orderBy` with no partition key funnels the whole
    * corpus through ONE sort task. Here it is the distributed
    * TWO-LEVEL scan: bucket-local cumulative sums run in parallel
    * (window partitioned by bucket), and each bucket's carry-in offset
    * comes from a window over the tiny bucket-summary relation
    * (corpus/100 rows — the same carry-in shape as
    * [[Joins]]' bucketed as-of fill), broadcast back. Both engines
    * compute identical integer token offsets, so the boundary
    * arithmetic is exact. */
  def q59SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the narrow tokenized relation feeds the corpus count,
    // the bucket-summary aggregation AND the offset join — without it
    // the corpus scan + split runs once per branch
    val d0 = docs(spark, dir).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).as("n_tok"))
      .persist(NarrowCacheLevel)
    // r22 (VERDICT r20 §next-5 carried): the packing width is
    // CORPUS-SCALED, not the fixed 100 — a fixed width makes the
    // level-2 summary relation grow as corpus/100 rows, and its
    // single-partition window (the documented funnel) eventually IS a
    // data-volume funnel. Deriving width from the materialized count
    // caps the summary at ~2^16 rows at any corpus size; the report is
    // WIDTH-INVARIANT by construction (the two-level scan computes the
    // same global prefix sums for every width — PipelineSpec proves
    // output equality across widths), so the derived width can never
    // change an answer. At the gate SFs the floor of 100 binds,
    // keeping the executed plan identical to the historical one.
    val n = d0.count()
    val docsPerBucket = math.max(100L, n / 65536L + 1L)
    packingReport(d0, docsPerBucket)
  }

  /** The two-level packing scan behind [[q59SequencePacking]], width
    * exposed so the spec can assert the report is identical across
    * bucket widths (the invariance that licenses corpus-scaling it).
    * `d` carries `(doc_id, lang, n_tok)`. */
  private[operators] def packingReport(d: DataFrame,
      docsPerBucket: Long): DataFrame = {
    val seqTokens = 512
    val db = d.withColumn("b", (col("doc_id") / docsPerBucket).cast("long"))
    // level 1: per-bucket token totals; level 2: exclusive prefix over
    // the SMALL summary relation (single-partition window over
    // corpus/docsPerBucket rows — bounded by the width derivation
    // above, not a data-volume funnel)
    val offsets = db.groupBy(col("b")).agg(sum(col("n_tok")).as("bt"))
      .withColumn("off", coalesce(
        sum(col("bt")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("off"))
    db.join(broadcast(offsets), "b")
      .withColumn("fin", col("off") +
        sum(col("n_tok")).over(Window.partitionBy(col("b")).orderBy(col("doc_id"))))
      .withColumn("crosses",
        expr(s"(fin - n_tok) div $seqTokens") =!= expr(s"(fin - 1) div $seqTokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("crosses"), 1L).otherwise(0L)).as("n_crossing"))
      .orderBy(col("lang"))
  }

  /** Derived-centroid clustering — the "choose k for the corpus" half
    * of the SemDeDup recipe (the label column borrowed by
    * [[labelCentroids]] is a stand-in a real corpus doesn't have):
    * deterministic distributed k-means with
    *
    *  - k DERIVED IN-PLAN from the corpus count (`least(64,
    *    ceil(n/32))`, integer-exact both engines) — no driver action;
    *  - EXPECTED-k THRESHOLD SEEDING: a vector seeds iff its portable
    *    hash of `seed:vec_id` falls under `k·10^6 div n` — the
    *    scale-safe alternative to a global sort-limit (no single-task
    *    top-k over the corpus, and the seed SET is identical in both
    *    engines because the hash is);
    *  - `iters` Lloyd refinements: broadcast-centroid argmax assignment
    *    (the [[assignToCentroids]] tie-break, exact for labels < 10^6)
    *    then a per-dimension partial-aggregated mean, rounded to 6
    *    decimals so both engines carry identical centroids.
    *
    * Each iteration is O(n·k·d) map-side work against a ≤64-row
    * broadcast — k-means derives SEMANTIC centroids at bounded cost;
    * occupancy bounding at scale stays [[corpusScaledClusters]]'s job,
    * and the two compose: `corpusScaledClusters(e, kMeansCentroids(e),
    * occ)` is the full derived-centroid SemDeDup pipeline (composition
    * asserted in PipelineSpec). Returns `(label, cvec)` with label =
    * the seed's vec_id. */
  def kMeansCentroids(e: DataFrame, iters: Int = 1): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val nRel = e.agg(count(lit(1)).as("n"))
    val hashed = e.withColumn("sh",
      pmod(portableHash(concat(lit("seed:"), col("vec_id").cast("string"))),
        lit(1000000L)))
    // ≥1-seed floor: threshold sampling is binomial, and on a tiny
    // corpus (expected k ≈ 1) the no-seed outcome has real probability —
    // an empty centroid relation would make every consumer silently
    // return empty. The vector holding the global MINIMUM hash always
    // seeds (a broadcast one-row aggregate, deterministic both engines).
    val minRel = hashed.agg(min(col("sh")).as("sh_min"))
    // the seed set is BOUNDED by construction (≤ 64 + the floor row) —
    // collected so Lloyd refinement runs as the native map-side argmax
    // ([[graft.expressions.CentroidArgmax]]) over one corpus scan per
    // iteration, instead of a centroid crossJoin + max_by aggregate +
    // corpus join-back (two corpus-wide exchanges per iteration that
    // existed only to carry the assignment back to the vectors)
    var cents: Seq[(Long, Seq[Double])] = hashed
      .crossJoin(broadcast(nRel)).crossJoin(broadcast(minRel))
      .withColumn("thr", expr("least(64, (n + 31) div 32) * 1000000 div n"))
      .filter(col("sh") < col("thr") || col("sh") === col("sh_min"))
      .select(col("vec_id").cast("long").as("label"),
        col("e").cast("array<double>").as("cvec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    for (_ <- 1 to iters)
      // per-dimension partial-aggregated mean, rounded to 6 decimals so
      // both engines carry identical centroids (the Lloyd step); the
      // ≤ 64·dims aggregate result is bounded, so the collect is too
      cents = e.select(centroidArgmax(col("e"), cents).as("label"),
          posexplode(col("e").cast("array<double>")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos")).agg(round(avg(col("v")), 6).as("cavg"))
        .groupBy(col("label")).agg(collect_list(struct(col("pos"), col("cavg"))).as("tmp"))
        .select(col("label"),
          transform(array_sort(col("tmp")), s => s.getField("cavg")).as("cvec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    cents.toDF("label", "cvec")
  }

  /** L2/L3 — corpus-derived k-means clustering report: the
    * [[kMeansCentroids]] centroids (k scaled to the corpus), final
    * assignment, and per-cluster membership + centroid norm. */
  def q53KmeansClusters(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    // the centroid relation feeds the final assignment AND the report
    // join; it is tiny (≤64 rows) — persist beats re-running Lloyd
    val cent = kMeansCentroids(e)
      .persist(NarrowCacheLevel)
    assignToCentroids(e, cent)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
      .join(cent.select(col("label").as("cluster"),
        round(vecNorm(col("cvec")), 4).as("centroid_norm")), "cluster")
      .select(col("cluster"), col("n_members"), col("centroid_norm"))
      .orderBy(col("cluster"))
  }

  /** Pipeline — corpus mixing: deterministically downsample every
    * language stratum to the SMALLEST stratum's size (uniform target
    * mix), the data-mixing step every multi-source training corpus
    * needs. The acceptance threshold per stratum is derived IN-PLAN
    * from the corpus counts (broadcast relations, integer-exact both
    * engines: `n_min·10^6 div n_lang`), and membership is the portable
    * md5 hash of `mix:doc_id` — stable across engines, partitionings,
    * and reruns, exactly like [[q41StratifiedSplit]]. Map-side verdict
    * + partial-aggregated rollup: one scan at 100 TB. */
  def q54CorpusMix(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir).groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val minRel = counts.agg(min(col("n_lang")).as("n_min"))
    docs(spark, dir)
      .join(broadcast(counts), "lang").crossJoin(broadcast(minRel))
      .withColumn("thr", expr("n_min * 1000000 div n_lang"))
      .withColumn("keep",
        pmod(portableHash(concat(lit("mix:"), col("doc_id").cast("string"))),
          lit(1000000L)) < col("thr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  /** L2 — semantic deduplication (the SemDeDup shape, Abbas et al.
    * 2023, arXiv:2303.09540): cluster embeddings around the label
    * centroids (the same assignment stage as [[q31IvfAnn]]'s IVF
    * index), then inside each cluster mark every vector DOMINATED by a
    * smaller-id cluster-mate with cosine ≥ 0.99; report per-cluster
    * kept/removed. Complements [[q30EmbeddingNearDup]]: LSH buckets
    * trade recall for speed, centroid clusters give the
    * semantic-neighborhood scoping the SemDeDup recipe prescribes.
    *
    * Scale shape: the quadratic step is CLUSTER-SCOPED — pair
    * generation is bounded by cluster occupancy, never all-pairs — and
    * the clusters are [[corpusScaledClusters]]'s CORPUS-SCALED fine
    * clusters: expected occupancy ≤ 32 at any corpus size, so the
    * per-cluster pair volume is O(1) per row at 100 TB exactly as
    * q30's scaled SRP bucket space (a fixed cluster count would make
    * occupancy — and the quadratic step — grow linearly with n). The
    * dominance test is a cluster-bucketed self-join (one hash
    * shuffle), and the verdict aggregation is map-side partial. */
  def q51SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    // ONE resident relation (r11 brief #1a, adjudicated by measurement
    // in PLANS.md §single-persist): the fine MEMBERSHIP is the copy
    // worth keeping — it feeds all three dominance-report reads — and
    // the base embeddings are never persisted at all: with the
    // assignment now pure map stages ([[mapSideFineClusters]]), base
    // is scanned a bounded number of times at construction (occupancy
    // + fill here; + seed/Lloyd in q61) and each scan is a plain
    // parquet read, cheaper than a second resident wide copy evicting
    // this one under suite heap pressure (the r11 driver ramp).
    val members = mapSideFineClusters(dupEmbeddings(spark, dir),
      labelCentroids(spark, dir), ClusterTargetOccupancy)
      .persist(CacheLevel)
    members.count()
    dominanceReport(members)
  }

  /** The SemDeDup dominance step + per-cluster rollup shared by q51
    * (given centroids) and q61 (derived centroids): mark every vector
    * dominated by a smaller-id cluster-mate with cosine ≥ 0.99, report
    * (cluster, n_docs, n_removed, n_kept).
    *
    * The dominating side is MULTI-PROBED ([[hammingProbes]]): a dup
    * pair split by one hyperplane still meets in the flipped bucket,
    * so recall doesn't decay with the (corpus-scaled) bit count.
    *
    * The rollup is AGGREGATE-THEN-JOIN, not join-back: cluster is
    * functionally dependent on vec_id, so the removed set keeps its
    * cluster from the dominance join and both report inputs reduce to
    * ≤ |clusters| rows BEFORE they meet — the old form joined the
    * full membership against the removed set on vec_id, one more
    * corpus-wide exchange for the same answer. */
  private def dominanceReport(members: DataFrame): DataFrame = {
    // r22: norms hoisted below the quadratic cluster-mate join
    // (vecCosinePre — the dominance filter ran three dot-length loops
    // per PAIR; now one, with each side's norm computed per row)
    val m = members.withColumn("ne", vecNorm(col("e")))
    val smaller = hammingProbes(m).select(col("cluster"),
      col("vec_id").as("smaller_id"), col("e").as("se"),
      col("ne").as("sne"))
    val removed = m.join(smaller, "cluster")
      .filter(col("smaller_id") < col("vec_id") &&
        round(vecCosinePre(col("e"), col("ne"), col("se"), col("sne")), 4)
          >= CosineDupThreshold)
      .select(col("cluster"), col("vec_id")).distinct()
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_removed"))
    members.groupBy(col("cluster")).agg(count(lit(1)).as("n_docs"))
      .join(removed, Seq("cluster"), "left")
      .select(col("cluster"), col("n_docs"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (col("n_docs") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
      .orderBy(col("cluster"))
  }

  /** L2 — the FULL derived-centroid SemDeDup pipeline, label-free end
    * to end: [[kMeansCentroids]] derives the coarse centroids from the
    * corpus itself (k scaled to n, hash-threshold seeding),
    * [[corpusScaledClusters]] subdivides them to bounded occupancy, and
    * the q51 dominance step dedups inside each fine cluster. q51 keeps
    * the label-centroid variant (the SemDeDup paper's "given clusters"
    * form); this is the form a production corpus — which has no labels
    * — actually runs. Composition mechanics (occupancy invariant under
    * derived centroids) are additionally asserted in PipelineSpec.
    *
    * Scale posture is the sum of its parts, all corpus-scaled: Lloyd
    * iterations are O(n·k·d) map-side against a ≤64-row broadcast,
    * subdivision bounds expected fine occupancy ≤ 32 at any n, the
    * quadratic dominance step is fine-cluster-scoped, multi-probe
    * protects recall, and the base relation is persisted once (it
    * feeds seeding, two assignment passes, and the dominance join). */
  def q61DerivedSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    // ONE resident relation — the fine membership (q51's rationale).
    // Construction scans the unpersisted base four times (seeding,
    // one Lloyd pass, occupancy, membership fill), each a plain
    // parquet scan + map-side math: with [[kMeansCentroids]] and
    // [[mapSideFineClusters]] both driver-iterated over the native
    // argmax, no corpus-wide exchange exists anywhere before the
    // dominance join itself.
    val base = dupEmbeddings(spark, dir)
    val members = mapSideFineClusters(base,
      kMeansCentroids(base), ClusterTargetOccupancy)
      .persist(CacheLevel)
    members.count()
    dominanceReport(members)
  }

  /** Count-Min sketch geometry: depth 4 hash rows × width 1024
    * buckets. The whole sketch is d·w = 4096 counters — the
    * aggregation key space, so map-side partial aggregation bounds the
    * sketch exchange at partitions × 4096 rows at ANY corpus size. */
  private val CmsDepth = 4
  private val CmsWidth = 1024L

  /** L4 — Count-Min sketch frequency estimation (Cormode–Muthukrishnan
    * 2005): answer "how often does token X occur?" for an arbitrary
    * probe set WITHOUT ever shuffling the vocabulary. The third member
    * of the bounded-memory family: q64's Misra–Gries finds the top
    * keys, q60's GK sketch summarizes a numeric distribution, CMS
    * estimates ANY key's frequency from d·w = 4096 counters. Each
    * token instance increments one bucket per hash row; a probe's
    * estimate is the MIN of its d buckets — never an undercount
    * (every occurrence of the probe hashed into all d of its buckets),
    * overcounts only from bucket collisions, bounded by N·e/w with
    * probability 1 − e^−d.
    *
    * The probe set (distinct tokens of every doc_id ≡ 1 mod 29
    * document) stands in for the operational "watchlist" a curation
    * pipeline probes — bounded, broadcast. The exact recount joins the
    * corpus LEFT SEMI against the broadcast probes first (the q64
    * candidates-then-exact discipline), so its exchange carries only
    * probe-matching keys; the hash-exact oracle proves both the sketch
    * arithmetic and the ≥-exact guarantee. Scale posture: the sketch
    * exchange is partitions × 4096 rows regardless of corpus size —
    * the full-vocabulary `groupBy(token)` this replaces exchanges one
    * row per DISTINCT TOKEN, unbounded on a web corpus. */
  /** The reusable CMS core behind [[q73CmsFrequency]]: `instances`
    * carries one row per token OCCURRENCE, `probes` one row per
    * distinct probed token (both in a `token` column); `width`
    * overrides the sketch width (the spec shrinks it to force
    * collisions — this corpus's 31-token vocabulary never collides at
    * 1024). Output: (token, n_est, n_exact, overcount ≥ 0). */
  /** The d cells a token occurrence increments: `(j, b)` with
    * `b = portable_hash("cms<j>:" ‖ token) mod width` — ONE hash-family
    * definition shared by the batch sketch and the streaming windowed
    * twin ([[graft.streaming.Curation.windowedCmsSketch]]), so their
    * sketches agree cell-for-cell. */
  def cmsCells(token: Column, width: Long = CmsWidth): Column =
    array((0 until CmsDepth).map { j =>
      struct(lit(j).as("j"),
        pmod(portableHash(concat(lit(s"cms$j:"), token)), lit(width)).as("b"))
    }: _*)

  def cmsFrequency(instances: DataFrame, probes: DataFrame,
      width: Long = CmsWidth): DataFrame = {
    def cells(token: Column) = cmsCells(token, width)
    val sketch = instances
      .select(explode(cells(col("token"))).as("c"))
      .groupBy(col("c.j").as("j"), col("c.b").as("b"))
      .agg(count(lit(1)).as("n"))
    // the exact recount (probe-bounded, q64 discipline) doubles as the
    // probe relation for the estimate side: every probed token that
    // occurs in the corpus has an exact row, so deriving the cells
    // from it skips a second probe computation AND the est⋈exact
    // join-back (a probe absent from the corpus is omitted — both
    // sides would have dropped it anyway). The estimate groupBy adds
    // NO exchange: the recount output is already hash-partitioned on
    // token, which satisfies the (token, n_exact) clustering.
    val exact = instances.join(broadcast(probes), Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
    exact
      .select(col("token"), col("n_exact"), explode(cells(col("token"))).as("c"))
      .select(col("token"), col("n_exact"), col("c.j").as("j"), col("c.b").as("b"))
      .join(broadcast(sketch), Seq("j", "b"))
      .groupBy(col("token"), col("n_exact")).agg(min(col("n")).as("n_est"))
      .select(col("token"), col("n_est"), col("n_exact"),
        (col("n_est") - col("n_exact")).as("overcount"))
      .orderBy(col("token"))
  }

  def q73CmsFrequency(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    val probes = docs(spark, dir).filter(col("doc_id") % 29 === 1)
      .select(explode(split(col("text"), " ")).as("token")).distinct()
    cmsFrequency(toks, probes)
  }

  /** L4 — priority sampling (Duffield–Lund–Thorup 2004): a
    * weight-proportional k-sample per stratum with an UNBIASED
    * subset-sum estimator — the principled form of "sample long
    * documents more often" (weight = n_chars here; bytes, cost, or
    * quality score in production). Each item draws uniform
    * u = (h+1)/2⁶⁰ from the portable hash and gets priority
    * q = w/u; the k largest priorities are the sample, the (k+1)-th
    * priority is the threshold τ, and ŵ = max(w, τ) estimates any
    * subset sum over the originals without bias.
    *
    * Engine portability is DESIGNED, not hoped for: the priority is
    * computed as the single expression `w·2⁶⁰ / (h+1)` — the product
    * is exact in binary64 (n_chars < 2¹⁰ carries ≤ 10 significant
    * bits; ·2⁶⁰ only shifts the exponent) and int→double conversion
    * and division are both correctly rounded under IEEE 754, so Spark
    * and DuckDB produce bit-identical priorities and identical ranks.
    * The textbook exponential/log-key form of weighted sampling
    * (Efraimidis–Spirakis u^(1/w)) would ride on libm `pow`/`ln`,
    * which IEEE does NOT pin down across engines — priority sampling
    * gives the same PPS-like guarantees from division alone.
    *
    * Scale posture: q66's shape — the bounded [[graft.functions.TopK]]
    * Aggregator reduces each partition to k+1 rows map-side (no
    * per-stratum window sort, shuffle carries ≤ partitions × (k+1)
    * rows per stratum), and the weight rides back via a broadcast of
    * the ≤ |lang|·k sample rows, so the corpus side never shuffles. */
  def q74PrioritySample(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val d = docs(spark, dir)
    val h = portableHash(concat(lit("prio:"), col("doc_id").cast("string")))
    val pri = col("n_chars").cast("double") * lit(1152921504606846976L).cast("double") /
      (h + lit(1L)).cast("double")
    val top = d.select(col("lang"), col("doc_id"), pri.as("pri"))
      .groupBy(col("lang"))
      .agg(graft.functions.TopK.topK(k + 1, col("doc_id"), col("pri")).as("topk"))
    // τ = the (k+1)-th priority; 0 when the stratum holds ≤ k docs
    // (then every member is sampled and ŵ = w exactly). `get` is the
    // OOB-null element accessor — ANSI element_at would throw.
    val sample = top
      .select(col("lang"),
        coalesce(get(col("topk"), lit(k)).getField("score"), lit(0.0)).as("tau"),
        posexplode(col("topk")).as(Seq("pos", "s")))
      .filter(col("pos") < k)
      .select(col("lang"), (col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("doc_id"), col("tau"))
    d.select(col("doc_id"), col("n_chars"))
      .join(broadcast(sample), "doc_id")
      .select(col("lang"), col("rk"), col("doc_id"),
        col("n_chars").as("weight"),
        round(greatest(col("n_chars").cast("double"), col("tau")), 2).as("est_weight"),
        round(col("tau"), 2).as("tau"))
      .orderBy(col("lang"), col("rk"))
  }

  // --------------------------------------------- q75: hashed-LM classifier

  /** Feature-space size of q75's hashing-trick classifier: 2^12 buckets.
    * Collisions between rare features are the trick's accepted loss
    * (Weinberger et al., "Feature Hashing for Large Scale Multitask
    * Learning", ICML'09): the model stays O(buckets) regardless of
    * vocabulary, so it rides the plan as one literal array instead of a
    * vocabulary-sized dimension join. */
  private val ClassifierBuckets = 4096

  /** q75's weight vector — the stand-in for a trained fastText-style
    * quality model: weight(b) = (h60("w:" + b) mod 201) − 100 ∈
    * [−100, 100], derived from md5 so the DuckDB twin recomputes the
    * IDENTICAL model inline (same derivation [[TextFunctions.portableHash]]
    * uses in-plan). Integer weights keep every document score an exact
    * int64 — sums are order-independent, so no float-summation
    * discipline is needed anywhere in the query. */
  private[graft] val classifierWeights: Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until ClassifierBuckets).map { b =>
      val hex = md.digest(s"w:$b".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 201 - 100
    }
  }

  /** The classifier's feature derivation — unigrams ++ bigrams in one
    * array column. Shared by q75 and the streaming gate
    * ([[graft.streaming.Curation.withClassifierScore]]): ONE feature
    * definition, two execution modes. Bind the result in its own
    * select/withColumn before scoring (the lateral-alias guard, see
    * q68). */
  def classifierFeatures(toks: Column): Column =
    concat(toks, wordShingleMultiset(toks, 2))

  /** Score a bound feature array against [[classifierWeights]]: each
    * feature hashes into its bucket, the document score is the exact
    * int64 sum of the bucket weights. Map-side, codegen'd
    * (`transform` + `element_at` + `aggregate`) — no explode, no join,
    * no per-token shuffle; null features score null. */
  def classifierScore(featsCol: Column): Column = {
    val w = typedlit(classifierWeights)
    val bucket = (t: Column) =>
      pmod(portableHash(concat(lit("f:"), t)), lit(ClassifierBuckets.toLong))
    aggregate(transform(featsCol,
        t => element_at(w, bucket(t).cast("int") + 1)),
      lit(0L), (a, v) => a + v)
  }

  /** Pipeline — model-based quality filtering with the hashing trick:
    * the fastText-shaped classifier gate real curation pipelines (CCNet,
    * DCLM) run after the heuristic filters. Every unigram AND bigram
    * hashes into one of [[ClassifierBuckets]] feature buckets; a
    * document's score is the sum of its buckets' weights
    * ([[classifierWeights]]); score < 0 drops the document. The report
    * rolls up keep counts and score mass per language.
    *
    * Scale posture (100 TB): the model is a PLAN LITERAL — O(buckets)
    * and vocabulary-independent, which is the hashing trick's whole
    * point — so scoring is one map-side array fold per row (`transform`
    * + `element_at` + `aggregate`, all codegen'd; no explode, no join,
    * no per-token shuffle). The only exchange is the ≤|lang|-row
    * rollup: the classifier costs exactly one corpus scan at any size.
    * Swapping in genuinely trained weights changes the literal, not the
    * plan. */
  def q75ClassifierFilter(spark: SparkSession, dir: String): DataFrame = {
    // two-step select: bind the feature array once (lateral-alias guard,
    // see q68)
    val withFeats = docs(spark, dir).select(col("lang"),
      classifierFeatures(split(col("text"), " ")).as("feats"))
    val scored = withFeats.select(col("lang"),
      size(col("feats")).cast("long").as("n_feats"),
      classifierScore(col("feats")).as("score"))
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") >= 0, 1L).otherwise(0L)).as("n_kept"),
        sum(col("score")).as("sum_score"),
        round(sum(col("score")).cast("double") / sum(col("n_feats")), 6)
          .as("avg_feat_score"))
      .orderBy(col("lang"))
  }

  // ----------------------------------------- q81: fixed-point PageRank

  /** Pipeline — PageRank centrality over the customer–supplier order
    * graph: nodes are customers (even ids, `2·custkey`) and suppliers
    * (odd, `2·suppkey + 1`), with a symmetric edge wherever a
    * customer's order contains a supplier's line item — "which
    * suppliers sit at the center of order flow" is the link-analysis
    * question the connected-components family (q50) cannot answer.
    *
    * Arithmetic is FIXED-POINT INTEGER by design: ranks start at 10^6,
    * each iteration is `r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div
    * deg(u))) div 100` — every operation an int64 division or sum, so
    * all six iterations are bit-exact in any evaluation order and the
    * DuckDB twin (six unrolled CTEs) hash-matches with no float
    * tolerance. Floors leak a little probability mass (documented
    * deviation from the textbook 1/N form); ordering — the thing
    * PageRank is used for — is preserved and deterministic.
    *
    * Scale posture (100 TB, reworked r14 — VERDICT r13 §next-2): the
    * rank relation is |nodes| rows — orders of magnitude smaller than
    * the |edges| relation every iteration consumes — so each
    * iteration BROADCASTS the per-node contribution (`r div d`,
    * computed on the tiny side BEFORE the join) against the edge
    * cache, which is persisted NARROW and pre-partitioned on `dst`.
    * The broadcast join preserves the edge partitioning, so the
    * contribution aggregation onto `dst` is already clustered and
    * pays NO exchange either: an iteration moves zero shuffle bytes
    * (plan-asserted in the spec), versus the two |E|-row exchanges of
    * the r13 shuffle form. The broadcast is valid while the rank
    * vector fits executor memory (~16 B/node → 100M nodes ≈ 1.6 GB);
    * past that, drop the `broadcast()` hint and the same plan
    * degrades gracefully to the shuffle form. No adjacency lists are
    * ever collected; the final top-20 is TakeOrdered over the cached
    * rank relation, never a global sort.
    *
    * LINEAGE IS TRUNCATED at one iteration (VERDICT r12 §next-1a,
    * tightened): every iteration eagerly local-checkpoints its tiny
    * |nodes|-row rank relation ([[Graph.checkpointRound]], the q50
    * discipline), so the next iteration's logical plan starts from a
    * `LogicalRDD` leaf. This matters doubly here because each
    * iteration references the rank relation TWICE (the contribution
    * broadcast and the d/r0 re-attach) — under plain `persist` the
    * LOGICAL tree doubles per iteration and analysis alone grows
    * 2^iterations (measured: iter1 0.3 s → iter6 5.2 s on identical
    * 16k-row data, pure driver-side planning). EARLY EXIT is
    * integer-exact: ranks are int64 fixed-point, so when an iteration
    * reproduces the previous ranks EXACTLY (max |Δr| = 0), every
    * further iteration is the identity — skipping the remaining no-op
    * rounds is bit-identical to running them, and the DuckDB twin's
    * six unrolled CTEs keep hash-matching with no lockstep edit. (A
    * nonzero epsilon would NOT have this property, which is why the
    * exit threshold is the literal 0.) */
  def q81PageRank(spark: SparkSession, dir: String): DataFrame = {
    val (top, _, release) = pageRankReport(spark, dir)
    // 20 rows: snapshot and release the edge cache (q60/q76 discipline)
    val snapshot = top.collect()
    release()
    spark.createDataFrame(
      java.util.Arrays.asList(snapshot: _*), top.schema)
  }

  /** The live q81 plan plus its cache release — split out so the spec
    * can count the iteration exchanges (the [[duplicateSpansReport]]
    * shape). The middle element is the PRE-checkpoint per-iteration
    * plans (one per EXECUTED iteration — fewer than 6 when the
    * integer fixed point lands early), exposed so the spec can verify
    * the zero-exchange budget of every executed segment. They stay
    * re-runnable until the release: each reads only the edge cache
    * and the previous round's checkpoint. */
  private[graft] def pageRankReport(spark: SparkSession, dir: String)
      : (DataFrame, Seq[DataFrame], () => Unit) = {
    val iterations = 6
    val pairs = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b")).distinct()
    // both directions in ONE pass over the distinct pairs (explode,
    // not a self-union — a union would run the distinct twice)
    val sym = pairs.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // dst-partitioned: the one cache layout that makes every
    // iteration's groupBy(dst) exchange-free (see scaladoc above)
    val edges = sym.repartition(col("dst")).persist(NarrowCacheLevel)
    edges.count()
    val scope = new Graph.CheckpointScope
    // SYMMETRIC graph ⇒ out-degree = in-degree, so the degree rollup
    // groups by dst and rides the cache partitioning — no exchange
    val deg = edges.groupBy(col("dst")).agg(count(lit(1)).as("d"))
    // the rank relation carries its degree: (node, d, r) — so each
    // iteration's contribution is computed on |nodes| rows before the
    // broadcast, and the re-attach of d is one more tiny broadcast
    var (cur, _) = scope.checkpoint(
      deg.select(col("dst").as("node"), col("d"))
        .withColumn("r", lit(1000000L)))
    val mids = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      it += 1
      val contrib = cur.select(col("node").as("src"),
        expr("r div d").as("contrib"))
      val next = edges.join(broadcast(contrib), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * s) div 100")).as("r"))
        .join(broadcast(cur.select(col("node"), col("d"),
          col("r").as("r0"))), Seq("node"))
      mids += next
      // eager checkpoint: materializes the round AND truncates its
      // logical lineage to a LogicalRDD leaf (scaladoc above)
      val (cp, _) = scope.checkpoint(next)
      val probe = cp.agg(max(abs(col("r") - col("r0")))).collect()(0)
      converged = probe.isNullAt(0) || probe.getLong(0) == 0L
      cur = cp
    }
    val top = cur
      .orderBy(col("r").desc, col("node"))
      .limit(20)
      .withColumn("is_supplier", (col("node") % 2 === 1))
      .select(col("node"), col("r"), col("is_supplier"))
    (top, mids.toSeq, () => {
      edges.unpersist(blocking = false)
      scope.releaseAll()
      ()
    })
  }

  // --------------------------------------- q80: random-projection JL map

  /** q80's projection matrix: 16 rows of 64 Rademacher signs (±1),
    * derived from md5 (`sign(i,j) = +1 iff h60("rp:i:j") even`) so the
    * DuckDB twin re-derives the IDENTICAL matrix inline — the same
    * plan-literal-model discipline as [[classifierWeights]]. */
  private[graft] val rpSigns: Seq[Seq[Double]] = {
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    (0 until 16).map(j => (0 until 64).map(i =>
      if (h60(s"rp:$i:$j") % 2 == 0) 1.0 else -1.0))
  }

  /** Pipeline — embedding dimensionality reduction by sparse random
    * projection (Achlioptas'03 / Johnson–Lindenstrauss): 64-dim
    * vectors map to 16 dims through a ±1 sign matrix scaled by 1/√16 —
    * the cheap, data-independent reduction pipelines run before
    * clustering/ANN when the embedding dim is larger than the task
    * needs. The report certifies the JL property per label: the
    * norm-distortion ratio ‖y‖²/‖x‖² has mean ≈ 1 (the projection is
    * an expected isometry) with spread bounded by the in-band count.
    *
    * Engine-exactness: each projected coordinate is one [[vecDot]]
    * against a literal sign row — the native expression's SEQUENTIAL
    * accumulation is bit-identical to DuckDB's `list_sum ∘
    * list_transform` (VectorExpressionsSpec's parity), the ±1 products
    * and the 1/√16 = 0.25 scale are exact in doubles, so every
    * per-ROW ratio matches bit-for-bit and the in-band counts are
    * integer-exact; only the per-GROUP averages see merge-order ulps,
    * absorbed by round-6 (the q65 convention).
    *
    * Scale posture (100 TB): the matrix is a plan literal (16×64
    * doubles), projection is a map-side codegen'd fold per row — no
    * join, no shuffle before the ≤|label|-row rollup; the q75
    * single-scan shape on the embeddings table. */
  def q80RandomProjection(spark: SparkSession, dir: String): DataFrame = {
    val R = typedlit(rpSigns)
    val x = col("embedding")
    val y = transform(sequence(lit(0), lit(15)),
      j => vecDot(x, element_at(R, j + 1)) * lit(0.25))
    val perVec = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("label"), vecDot(x, x).as("xn2"), y.as("y"))
      .select(col("label"), col("xn2"), vecDot(col("y"), col("y")).as("yn2"))
      .filter(col("xn2") > 0)
      .select(col("label"), (col("yn2") / col("xn2")).as("ratio"))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("ratio")), 6).as("avg_distortion"),
        round(min(col("ratio")), 6).as("min_distortion"),
        round(max(col("ratio")), 6).as("max_distortion"),
        sum(when(col("ratio").between(0.5, 1.5), 1L).otherwise(0L))
          .as("n_in_band"))
      .orderBy(col("label"))
  }

  // ------------------------------------------- q79: per-source quota cap

  /** Pipeline — per-source quota sampling: cap every source (domain)
    * at the k highest-quality documents, the anti-domination step
    * web-scale curation runs so no single domain floods the training
    * mix (RefinedWeb/C4 cap pages per domain; this is that cap with a
    * model-based keep order). Quality order is q75's hashed-feature
    * classifier score ([[classifierScore]] — one shared model across
    * the gate, the stream, and the cap), ties broken by doc_id.
    *
    * Scale posture (100 TB): scoring is the q75 map-side fold (plan-
    * literal model, no join), and the per-source selection is the
    * bounded [[graft.functions.TopK]] aggregator — each partition
    * reduces to a k-element buffer map-side, so the source exchange
    * carries ≤ partitions × k rows per source and NO WindowExec ever
    * sorts a source's full document list (the q31/q55 discipline).
    * Output is |source| × k rows — bounded by the domain count. */
  def q79SourceQuota(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val withFeats = docs(spark, dir).select(col("source"), col("doc_id"),
      classifierFeatures(split(col("text"), " ")).as("feats"))
    val scored = withFeats.select(col("source"), col("doc_id"),
      classifierScore(col("feats")).as("score"))
    scored.groupBy(col("source"))
      .agg(graft.functions.TopK.topK(k, col("doc_id"),
        col("score").cast("double")).as("topk"))
      .select(col("source"), posexplode(col("topk")).as(Seq("i", "s")))
      .select(col("source"), (col("i") + 1).cast("long").as("rk"),
        col("s.id").as("doc_id"),
        // integer-exact round trip: scores are |·| ≤ feats·100 ≪ 2^53
        col("s.score").cast("long").as("score"))
      .orderBy(col("source"), col("rk"))
  }

  // ------------------------------------------- q76: duplicate-span dedup

  /** q76's boilerplate sentence (12 tokens — wider than the 8-token
    * gram, so it contains gram-internal repeats) appended to every
    * fifth document: the deterministic stand-in for the shared web
    * boilerplate (footers, license blocks, navigation chrome)
    * substring-level dedup exists to find. */
  private val BoilerSpan =
    "all rights reserved see our terms of service and privacy policy today"

  /** Pipeline — substring-level duplicate-span measurement: finds the
    * maximal token spans that occur more than once ACROSS the corpus
    * and reports per-language coverage (the operator behind "remove
    * repeated substrings" curation à la Lee et al., "Deduplicating
    * Training Data Makes Language Models Better" — their suffix array
    * is a single-machine structure; the distributed analog is
    * gram-position marking + per-document interval union). Every
    * 8-token gram carries its document position; grams whose digest
    * occurs ≥ 2 times corpus-wide mark their [pos, pos+8) interval,
    * and the union of a document's marked intervals (gaps-and-islands
    * over the sorted positions: a running max of interval ends
    * measures each gram's NOVEL token contribution) gives its
    * duplicated-span count and token coverage. Whole-document copies
    * (doc_id % 13, re-inserted) surface as one span covering the
    * document; boilerplate tails (doc_id % 5, [[BoilerSpan]]) as one
    * 12-token span.
    *
    * Scale posture (100 TB): no all-pairs, no suffix array — two
    * corpus-volume hash exchanges (the gram-digest count partition and
    * the AQE-reusable join of positions against the >1 digests) plus
    * the per-document island sort, each streaming through
    * hash-partitioned groups. The gram relation is persisted NARROW
    * (three longs + lang per gram) so the count branch and the mark
    * branch pay the shingle+md5 map stage once. Positions never leave
    * their document partition after the mark join, and every rollup
    * above doc level is ≤ |lang| rows. Unlike q49's decontamination
    * there is no small side to Bloom — self-dedup is inherently
    * corpus × corpus — so the honest plan bounds bytes (digests, not
    * grams) rather than rows. */
  def q76DuplicateSpans(spark: SparkSession, dir: String): DataFrame = {
    val (out, release) = duplicateSpansReport(spark, dir)
    // ≤ |lang| rows: snapshot into a local relation and release the
    // narrow gram cache before returning (q60's bounded-collect
    // discipline — no persisted relation outlives the query)
    val materialized = out.collect()
    release()
    spark.createDataFrame(
      java.util.Arrays.asList(materialized: _*), out.schema)
  }

  /** The live q76 plan plus its cache release — split out so the spec
    * can count the plan's exchanges before the snapshot collapses it
    * to a local relation (the [[corpusScaledClustersWithRelease]]
    * shape). */
  private[graft] def duplicateSpansReport(
      spark: SparkSession, dir: String): (DataFrame, () => Unit) = {
    val k = 8
    val base = docs(spark, dir).select(col("doc_id"), col("lang"),
      when(col("doc_id") % 5 === 0, concat_ws(" ", col("text"), lit(BoilerSpan)))
        .otherwise(col("text")).as("text"))
    val corpus = base.unionByName(
      base.filter(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + 2000000L))
    val positions = corpus
      .select(col("doc_id"), col("lang"),
        posexplode(wordShingleMultiset(split(col("text"), " "), k))
          .as(Seq("pos", "gram")))
      // full 60-bit digest, NOT the 31-bit mod-P form: a false hash
      // collision marks a span duplicated that isn't, and in a 2^31
      // space the birthday bound makes that routine from ~50k distinct
      // corpus grams (the streaming-dedup lesson); at 60 bits the
      // spurious-mark rate stays ~1e-6 per gram even at 10^13 grams
      .select(col("doc_id"), col("lang"), col("pos").cast("long").as("pos"),
        portableHash(col("gram")).as("h"))
      .persist(NarrowCacheLevel)
    val dupGrams = positions.groupBy(col("h"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).select(col("h"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = positions.join(dupGrams, Seq("h"))
      .withColumn("prev_max", max(col("pos") + k)
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
    val perDoc = marked
      // novel tokens this gram adds to the union of marked intervals;
      // ends are pos+k with pos strictly increasing, so prev_max <
      // pos+k always and the contribution is ≥ 1
      .select(col("doc_id"), col("lang"),
        (col("pos") + k - greatest(col("pos"),
          coalesce(col("prev_max"), col("pos")))).as("novel"),
        when(col("prev_max").isNull || col("prev_max") <= col("pos"), 1L)
          .otherwise(0L).as("is_new_span"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("novel")).as("dup_tokens"), sum(col("is_new_span")).as("n_spans"))
    val perLang = perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_dup_docs"),
        sum(col("n_spans")).as("n_spans"), sum(col("dup_tokens")).as("dup_tokens"))
    val totals = corpus.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val out = totals.join(perLang, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        col("n_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 6).as("dup_token_pct"))
      .orderBy(col("lang"))
    (out, () => { positions.unpersist(blocking = false); () })
  }

  // --------------------------------------- q100: BPE merge learning

  /** Number of merge rounds [[q100BpeMerges]] learns. Three rounds keep
    * the oracle's unrolled CTE chain readable; production tokenizers
    * run thousands — see the scale note on [[q100BpeMerges]]. */
  private[graft] val BpeMergeRounds = 3

  /** One greedy left-to-right BPE merge pass over a token array: every
    * non-overlapping adjacent occurrence of (`lhs`, `rhs`) collapses
    * into the single token `lhs + " " + rhs`. Overlap resolution is the
    * standard BPE rule — a token consumed by a merge cannot start
    * another, so a run of k equal tokens under a self-pair merge yields
    * floor(k/2) merges, left-aligned.
    *
    * Implemented as a single-level array fold (`aggregate` over
    * one-element seeds) — map-side, no explode, no shuffle; the merged
    * pair arrives as plan literals. The fold is sequential by
    * construction, which is exactly what greedy left-to-right needs;
    * DuckDB's `list_reduce` twin folds the identical order, so the two
    * engines agree token-for-token with no tolerance. */
  def bpeMergePass(toks: Column, lhs: String, rhs: String): Column = {
    val merged = lhs + " " + rhs
    // contains-guard: a document with no `lhs` element cannot merge, so
    // it skips the fold — `array_contains` is a codegen'd flat scan
    // where the fold is an interpreted HOF building array concats; on
    // a 10x-decorrelated corpus (growing vocabulary → most merges
    // touch few documents) this is the difference between scanning and
    // rewriting the corpus each round
    when(size(toks) < 2 || !array_contains(toks, lhs), toks).otherwise(
      aggregate(
        slice(toks, lit(2), size(toks) - lit(1)),
        slice(toks, 1, 1),
        (acc, x) =>
          when(element_at(acc, -1) === lit(lhs) && x === lit(rhs),
            concat(slice(acc, lit(1), size(acc) - lit(1)), array(lit(merged))))
            .otherwise(concat(acc, array(x)))))
  }

  /** The adjacent-pair relation of a tokenized corpus: one row per
    * (left, right) neighbour occurrence. `arrays_zip` over two shifted
    * slices — codegen'd, no HOF; the explode feeds straight into a
    * hash aggregation that partial-combines map-side, so each
    * partition ships at most its distinct pair set. */
  private def adjacentPairs(toks: DataFrame): DataFrame =
    toks.filter(size(col("toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - lit(1)),
        slice(col("toks"), lit(2), size(col("toks")) - lit(1)))).as("p"))
      .select(col("p").getField("0").as("lhs"), col("p").getField("1").as("rhs"))

  /** Pipeline — BPE-style tokenizer merge learning: the vocabulary-
    * induction step every LLM data pipeline runs before training.
    * Starting from whitespace tokens, each round (a) counts all
    * adjacent token pairs corpus-wide, (b) picks the most frequent
    * (ties broken lexicographically on the pair — deterministic), and
    * (c) rewrites every document with [[bpeMergePass]]'s greedy
    * left-to-right merge. Output: one row per learned merge with its
    * selection-time pair count and the corpus token total after
    * applying it. Note `tokens_before − tokens_after` ≤ `pair_count`:
    * overlapping occurrences ("a a a" counts two (a,a) pairs) merge
    * only once — the standard BPE application rule, asserted in
    * PipelineSpec.
    *
    * Scale posture (100 TB): pair counting is a hash aggregation with
    * map-side partial combine (each partition ships its distinct pair
    * set, not its token stream); the winning merge is a ONE-row
    * bounded snapshot (the q81-threshold discipline) inlined as plan
    * literals, so the rewrite is pure map-side with no join or
    * broadcast; each round's rewrite persists (wide cache level) and
    * releases its predecessor, so lineage stays one fold deep — the
    * q81 bounded-lineage rule. m merges cost m corpus passes;
    * production vocabularies (30k+ merges) batch the top-m pairwise-
    * DISJOINT pairs per pass (merges whose tokens don't overlap
    * commute, so a disjoint batch is order-equivalent to m sequential
    * passes) — the documented scale path; the per-pass machinery here
    * is unchanged by batching.
    *
    * The merge table is BANKED at rest ([[ensureBpeMerges]] — the
    * codebook/index fingerprint discipline): the first caller per
    * (session, corpus version) pays the training passes; every later
    * q100/q104/streaming-tokenizer consumer reads the ≤m-row stored
    * table. */
  def q100BpeMerges(spark: SparkSession, dir: String): DataFrame =
    spark.table(ensureBpeMerges(spark, dir)).orderBy(col("it"))

  /** Managed-table name of the banked BPE merge table for `dir`. */
  private[graft] def bpeMergesTable(dir: String): String =
    "graft_bpe_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build-if-absent-or-stale for the banked BPE merge table of `dir`
    * (VERDICT r17 §next-2: PQ codebooks, IVF memberships, and the
    * inverted index already bank with fingerprints; the tokenizer was
    * the last trained artifact re-learned per session). The learner is
    * [[bpeLearnRounds]] verbatim, so the stored rows equal a retrain
    * bit-exactly (LayoutSpec) and q100's oracle is unchanged; q104 and
    * the streaming tokenizer ([[graft.streaming.Tokenize]]) replay the
    * stored table instead of re-learning — at 100 TB that's the
    * difference between m training passes per consumer and ONE ≤m-row
    * table read. Returns the table name. */
  private[graft] def ensureBpeMerges(spark: SparkSession,
      dir: String): String = {
    val tbl = bpeMergesTable(dir)
    val corpus = docs(spark, dir)
    ensureCurrent(spark, tbl, corpusFingerprint(corpus)) {
      val (rounds, _, release) = bpeLearnRounds(
        corpus.select(col("doc_id"), split(col("text"), " ").as("toks")))
      release()
      Layout.writeMerges(spark, rounds, tbl)
    }
    tbl
  }

  /** Greedy pairwise-DISJOINT prefix filter over a ranked
    * merge-candidate list — the admission rule that makes a merge
    * batch order-commutative: a candidate is admitted only if neither
    * of its tokens, nor its merged output, touches any earlier
    * admission (as input token OR output). Two disjoint merges cannot
    * create, destroy, or overlap each other's adjacencies, so applying
    * an admitted batch in ANY order — including all-at-once in one
    * rewrite pass — rewrites every document identically to applying
    * them as sequential corpus rounds (asserted in PipelineSpec).
    * Conflicting candidates are SKIPPED, not dropped: they re-enter at
    * the next batch boundary with fresh counts. */
  private[graft] def bpeDisjointPrefix(
      ranked: Seq[(String, String, Long)]): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.HashSet.empty[String]
    val out = Seq.newBuilder[(String, String, Long)]
    ranked.foreach { case c @ (l, r, _) =>
      val m = l + " " + r
      if (!used(l) && !used(r) && !used(m)) {
        used += l; used += r; used += m
        out += c
      }
    }
    out.result()
  }

  /** Apply a merge SEQUENCE in one rewrite projection — since r18 the
    * native codegen'd expression
    * ([[graft.expressions.BpeExpressions]]: one compiled greedy pass
    * per merge over an in-place token buffer, O(tokens) per merge,
    * bit-identical to nesting [[bpeMergePass]] folds left-to-right —
    * scalacheck-pinned in BpeExpressionsSpec). The HOF fold rebuilt
    * its accumulator array per token (O(tokens²) interpreted
    * allocation per merge), which q104's sf1 probe measured as the
    * apply path's whole cost; the merge table now rides as three
    * reference objects, so a 30k-merge production vocabulary is three
    * arrays, not 30k expression nodes — the batch-size note on
    * [[bpeLearnBatchedRounds]] about expression-tree growth no longer
    * constrains the apply side. */
  def bpeApplyMerges(toks: Column, merges: Seq[(String, String)]): Column =
    graft.expressions.BpeFunctions.bpeApplyAll(toks, merges)

  /** BATCHED BPE learning — the production-vocabulary form of
    * [[q100BpeMerges]]'s loop (VERDICT r15 §next-6): each round counts
    * adjacent pairs ONCE, admits the top-ranked pairwise-disjoint
    * candidates ([[bpeDisjointPrefix]], count DESC then lexicographic —
    * the q100 ordering), and applies the whole batch in ONE rewrite
    * pass ([[bpeApplyMerges]]). A 30k-merge vocabulary at batch 256
    * costs ~118 count scans + 118 rewrite passes instead of 30k of
    * each — the scans-per-vocabulary arithmetic is what makes BPE
    * training feasible at 100 TB, where each corpus pass is the
    * dominant cost.
    *
    * Selection semantics: admitted merges use BATCH-START counts.
    * Disjoint admission guarantees those counts are still exact at
    * apply time (a disjoint merge cannot change another's adjacency
    * count), and `batchSize = 1` reproduces the sequential learner
    * row-for-row (asserted in PipelineSpec). The one divergence from
    * strictly-sequential BPE is deliberate and standard in batched
    * trainers: a pair CREATED by an admitted merge (one containing its
    * output token) cannot be selected until the next batch boundary —
    * within a batch, candidates never reference other admissions'
    * outputs by construction of the disjoint filter.
    *
    * Returns (merge table rows `(idx, lhs, rhs, pair_count,
    * tokens_after)` — `tokens_after` is the corpus total after the
    * row's BATCH applies — the final token relation, and its release).
    * q100's 3-round oracle is untouched: this is the scale path beside
    * it, sharing [[adjacentPairs]] and [[bpeMergePass]] verbatim. */
  private[graft] def bpeLearnBatchedRounds(base: DataFrame,
      vocabMerges: Int, batchSize: Int)
      : (Seq[(Int, String, String, Long, Long)], DataFrame, () => Unit) = {
    require(vocabMerges >= 1 && batchSize >= 1, "positive vocab and batch")
    var cur = base.persist(CacheLevel)
    cur.count()
    val rows = Seq.newBuilder[(Int, String, String, Long, Long)]
    var learned = 0
    var exhausted = false
    while (learned < vocabMerges && !exhausted) {
      val want = math.min(batchSize, vocabMerges - learned)
      // one pair-count scan per BATCH: rank enough candidates to fill
      // the batch after disjoint filtering (3x headroom — a shortfall
      // only defers admissions to the next scan, never loses them)
      val ranked = adjacentPairs(cur)
        .groupBy(col("lhs"), col("rhs")).agg(count(lit(1)).as("pair_count"))
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(want * 3 + 8).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val batch = bpeDisjointPrefix(ranked).take(want)
      if (batch.isEmpty) exhausted = true
      else {
        val next = cur.select(col("doc_id"),
          bpeApplyMerges(col("toks"), batch.map(b => (b._1, b._2))).as("toks"))
          .persist(CacheLevel)
        val after = next.agg(sum(size(col("toks")).cast("long")))
          .collect()(0).getLong(0)
        cur.unpersist(blocking = false)
        cur = next
        batch.foreach { case (l, r, n) =>
          learned += 1
          rows += ((learned, l, r, n, after))
        }
      }
    }
    val last = cur
    (rows.result(), last, () => { last.unpersist(blocking = false); () })
  }

  /** The q100 learn loop over a `(doc_id, toks)` relation: returns the
    * per-round merge table, the FINAL rewritten token relation (still
    * persisted — callers aggregate it, then call the release), and the
    * release. Shared by [[q100BpeMerges]] (the merge table) and
    * [[q104TokenizerFertility]] (the final corpus). */
  private[graft] def bpeLearnRounds(base: DataFrame)
      : (Seq[(Int, String, String, Long, Long)], DataFrame, () => Unit) = {
    var cur = base.persist(CacheLevel)
    cur.count()
    val rows = Seq.newBuilder[(Int, String, String, Long, Long)]
    var exhausted = false
    for (it <- 1 to BpeMergeRounds if !exhausted) {
      // one-row snapshot: the argmax pair (count DESC, then pair ASC);
      // an empty/all-singleton corpus has no pairs — the learn loop
      // ends early with the merges found so far rather than throwing
      // (the q88 headOption discipline)
      adjacentPairs(cur)
        .groupBy(col("lhs"), col("rhs")).agg(count(lit(1)).as("pair_count"))
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1).collect().headOption match {
        case None => exhausted = true
        case Some(top) =>
          val (l, r, n) = (top.getString(0), top.getString(1), top.getLong(2))
          val next = cur
            .select(col("doc_id"),
              bpeApplyMerges(col("toks"), Seq((l, r))).as("toks"))
            .persist(CacheLevel)
          val after =
            next.agg(sum(size(col("toks")).cast("long"))).collect()(0).getLong(0)
          cur.unpersist(blocking = false)
          cur = next
          rows += ((it, l, r, n, after))
      }
    }
    val last = cur
    (rows.result(), last, () => { last.unpersist(blocking = false); () })
  }

  /** L4 — per-language tokenizer fertility: how well the q100-learned
    * merge vocabulary compresses each language — `tokens_before /
    * tokens_after ≥ 1` after the full merge table applies. Fertility
    * asymmetry across languages is a real mixing input (a tokenizer
    * that compresses one language 2× worse silently halves its
    * effective share of a token budget), which is why this rollup sits
    * beside q54's mixing quotas.
    *
    * Reads the BANKED merge table ([[ensureBpeMerges]] — the learner
    * runs at most once per corpus version) and replays it in learned
    * order through the shared greedy fold ([[bpeMergePass]]) in ONE
    * map-side projection: sequential replay of the stored merges
    * rewrites every document exactly as the learn loop's per-round
    * rewrites did (each round WAS one [[bpeMergePass]] of its chosen
    * pair), so the rollup is unchanged while the per-round pair-count
    * scans, argmax snapshots, and intermediate persists disappear from
    * this query — before/after token totals come from a single
    * ≤|lang|-row aggregate over one corpus scan. */
  def q104TokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val merges = Layout.readMerges(spark, ensureBpeMerges(spark, dir))
      .map(m => (m._2, m._3))
    val out = docs(spark, dir)
      .select(col("lang"), split(col("text"), " ").as("toks"))
      .select(col("lang"), size(col("toks")).cast("long").as("nb"),
        size(bpeApplyMerges(col("toks"), merges)).cast("long").as("na"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nb")).as("tokens_before"),
        sum(col("na")).as("tokens_after"))
      .select(col("lang"), col("n_docs"), col("tokens_before"),
        col("tokens_after"),
        round(col("tokens_before").cast("double") / col("tokens_after"), 6)
          .as("compression"))
      .orderBy(col("lang"))
    // ≤|lang| rows: snapshot (keeps the report a LocalRelation, the
    // composed-consumer discipline every bounded report follows)
    val snapshot = out.collect()
    spark.createDataFrame(
      java.util.Arrays.asList(snapshot: _*), out.schema)
  }

  // ------------------------------------ q101: product-quantized ANN

  /** Subspace count for [[q101PqAnn]] (64 dims → 4 × 16-dim blocks). */
  private[graft] val PqSubspaces = 4
  private val PqSubDim = EmbDims / PqSubspaces

  /** Rounded squared-L2 between two equal-length double arrays —
    * sequential left fold (`zip_with` then `aggregate`), so DuckDB's
    * `list_sum ∘ list_transform` twin accumulates bit-identically (the
    * q80 discipline). */
  private def l2sq6(a: Column, b: Column): Column =
    round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v), 6)

  /** Pipeline — product-quantization ANN with asymmetric distance
    * computation (ADC), the memory-compression serving path brute-force
    * cosine (q25) and IVF (q31/q85) don't cover: each 64-dim vector is
    * stored as [[PqSubspaces]] small codeword indexes (4 bytes vs 512
    * bytes of raw doubles — a 128× shrink), and queries rank the whole
    * corpus WITHOUT touching raw vectors — per query, a 64-entry
    * lookup table of subspace distances is built once against the
    * codebook, and every corpus vector's approximate distance is the
    * sum of its 4 table entries (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search").
    *
    * Codebooks are hash-threshold seeded (the [[kMeansCentroids]]
    * discipline, salt `pq:`, ≤16 codewords + the min-hash floor row):
    * seed vec `l`'s dims `[16s, 16s+16)` are subspace `s`'s codeword
    * for label `l`. Encoding picks per subspace the argmin of
    * `round(L2², 6) · 10^12 + label` — the q53 score form, so the
    * winner is engine-deterministic with no float tolerance. ADC sums
    * are integer MICRO-units (`round(d6 · 10^6)` as int64), so the
    * 4-term sums are exact in any order. Each reported neighbour
    * carries `in_exact_top5` — whether the exact rounded-L2 top-5
    * agrees — so recall is read off the result, not asserted blindly.
    *
    * Scale posture (100 TB): the codebook is a bounded collect (≤16
    * rows, the centroid-snapshot discipline) inlined as plan literals;
    * encoding is one map-side fold per row — no join, no shuffle, one
    * corpus scan, and the emitted code column is 4 ints (the compressed
    * index an executor would cache instead of 512-byte vectors).
    * Serving cross-joins the BROADCAST query set (each query carrying
    * its 64-long table) against codes and folds 4 `element_at` lookups
    * per pair — no per-pair distance arithmetic, partial top-k per
    * partition via the window's per-query partition, never a global
    * sort. Production composes this with the IVF coarse stage
    * (q31/q85): route to a cluster, then ADC-rank only its inverted
    * list — IVF-PQ; the per-list machinery here is unchanged. */
  def q101PqAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = pqVectors(spark, dir)
    val seeds = trainedPqSeeds(spark, dir)
    pqFlaggedServe(pqCodes(e, seeds), e, seeds)
  }

  /** The trained raw-vector codebook for a corpus, built ONCE and
    * served from rest thereafter (VERDICT r14 §next-1): the first
    * caller in a session pays [[buildPqIndex]] (hash seeding +
    * [[PqLloydRounds]] Lloyd scans, persisted with the code relation
    * and stats sidecar); every later caller — q101's in-session
    * encode, q103's serve-from-rest, q107's IVF-PQ composition, and
    * every bench repeat — reads the ≤17-row stored codebook. Training
    * is deterministic for a given corpus, so the stored codewords
    * equal the oracle's inline derivation and the round-trip changes
    * no result row (parquet doubles are exact). At 100 TB this is the
    * difference between 3 extra full-corpus scans per ad-hoc ANN query
    * and a 17-row table read. */
  private[graft] def trainedPqSeeds(spark: SparkSession,
      dir: String): Seq[(Long, Seq[Double])] =
    storedPqSeeds(spark, ensurePqIndex(spark, dir))

  /** Build-if-absent-or-stale for the persisted PQ index of `dir`
    * (the [[ensureCurrent]] discipline): the first caller per (session,
    * corpus version) pays the build; a REGENERATED corpus fails the
    * fingerprint compare and retrains instead of silently serving
    * stale codes (ADVICE r15). Returns the code-relation table name. */
  private[graft] def ensurePqIndex(spark: SparkSession,
      dir: String): String = {
    val idx = pqIndexTable(dir)
    ensureCurrent(spark, idx, corpusFingerprint(pqVectors(spark, dir)))(
      buildPqIndex(pqVectors(spark, dir), idx))
    idx
  }

  /** The embeddings relation in PQ shape: `(vec_id, e: array<double>)`. */
  private def pqVectors(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))

  /** Lloyd refinement rounds applied to the PQ codebook after
    * hash-threshold seeding (VERDICT r13 §next-3). Untrained seeded
    * codebooks measurably wasted the residual IVF-PQ composition
    * (q109 recall ≤ q107's); training each subspace against the data
    * it quantizes is what makes the production IVFADC stack earn its
    * keep. Both engines iterate in lockstep — see [[pqSeeds]]. */
  private[graft] val PqLloydRounds = 3

  /** Bounded codebook snapshot (≤16 + floor, the [[kMeansCentroids]]
    * seed discipline, salt `pq:`), ascending-label order, then
    * [[PqLloydRounds]] per-SUBSPACE Lloyd refinements: assign every
    * vector's subvector to its argmin codeword (the
    * [[pqCodeColumns]] score, so assignment IS the encode), then move
    * each codeword to the per-dimension mean of its assignees,
    * `round(·, 6)` (the [[kMeansCentroids]] discipline, so the DuckDB
    * twin carries identical codebooks). An empty codeword keeps its
    * previous position — labels and index order never change, which is
    * what lets the trained codebook flow through every downstream
    * consumer (q101/q103/q107/q109, the index at rest, the streaming
    * encoder) unchanged. Seed vec `l`'s dims `[16s, 16s+16)` are
    * subspace `s`'s initial codeword; after training the
    * concatenation layout is preserved but each block is the trained
    * codeword. One corpus scan per round, ≤4·16·16-row bounded
    * aggregate collected (the centroid-snapshot discipline). */
  private[graft] def pqSeeds(e: DataFrame): Seq[(Long, Seq[Double])] = {
    var seeds = pqHashSeeds(e)
    for (_ <- 1 to PqLloydRounds) seeds = pqLloydRound(e, seeds)
    seeds
  }

  /** The untrained hash-threshold seed snapshot (split from
    * [[pqSeeds]] so the spec can assert training reduces error). */
  private[graft] def pqHashSeeds(e: DataFrame): Seq[(Long, Seq[Double])] = {
    val nRel = e.agg(count(lit(1)).as("n"))
    val hashed = e.withColumn("sh",
      pmod(portableHash(concat(lit("pq:"), col("vec_id").cast("string"))),
        lit(1000000L)))
    val minRel = hashed.agg(min(col("sh")).as("sh_min"))
    val seeds = hashed
      .crossJoin(broadcast(nRel)).crossJoin(broadcast(minRel))
      .withColumn("thr", expr("least(16, (n + 31) div 32) * 1000000 div n"))
      .filter(col("sh") < col("thr") || col("sh") === col("sh_min"))
      .select(col("vec_id").cast("long"), col("e"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    // the min-hash floor guarantees ≥1 seed on any NON-empty corpus;
    // an empty one must fail here, not as a null code downstream
    require(seeds.nonEmpty, "PQ codebook from an empty vector corpus")
    seeds
  }

  /** One per-subspace Lloyd round (see [[pqSeeds]]): returns the seeds
    * with every subspace codeword moved to the rounded mean of its
    * assigned subvectors (unmoved where no vector assigned). */
  private[graft] def pqLloydRound(e: DataFrame,
      seeds: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] = {
    val (codes, _) = pqCodeColumns(seeds)
    // one scan: explode the 4 SUBSPACES, not the 64 dims (VERDICT r14
    // §next-2 — 16× fewer rows through the exchange for identical
    // means), key each subvector by (subspace, assigned codeword) and
    // aggregate the 16 dimension means as COLUMNS of the same row —
    // partial-aggregated, ≤4·16 rows collected
    val dimAggs = (0 until PqSubDim).map(i =>
      round(avg(element_at(col("sub"), i + 1)), 6).as(s"c$i"))
    val stats = e.select(codes.as("codes"),
        posexplode(array((0 until PqSubspaces)
          .map(s => pqSubvec(col("e"), s)): _*)))
      .select(col("pos").cast("int").as("s"),
        element_at(col("codes"), col("pos").cast("int") + 1).as("code"),
        col("col").as("sub"))
      .groupBy(col("s"), col("code"))
      .agg(dimAggs.head, dimAggs.tail: _*)
      .collect()
    val moved = scala.collection.mutable.HashMap
      .empty[(Int, Int), Array[Double]]
    stats.foreach { r =>
      val key = (r.getInt(0), r.getInt(1)) // (subspace, codeword idx)
      moved(key) = Array.tabulate(PqSubDim)(i => r.getDouble(2 + i))
    }
    seeds.zipWithIndex.map { case ((label, cvec), idx) =>
      val nv = (0 until PqSubspaces).flatMap { s =>
        moved.get((s, idx)) match {
          case Some(arr) => arr.toSeq
          case None => cvec.slice(s * PqSubDim, (s + 1) * PqSubDim)
        }
      }
      (label, nv)
    }
  }

  private def pqSubvec(v: Column, s: Int): Column =
    slice(v, lit(s * PqSubDim + 1), lit(PqSubDim))

  private def pqCodebookCols(seeds: Seq[(Long, Seq[Double])]): Seq[Column] =
    (0 until PqSubspaces).map(s =>
      typedlit(seeds.map(_._2.slice(s * PqSubDim, (s + 1) * PqSubDim))))

  /** Encode `(vec_id, e)` against a codebook: per subspace the 0-based
    * index of the argmin codeword (score = d6·10^12 + label — unique,
    * so argmin is the FIRST min), plus the summed encode-time
    * quantization error in integer micro-units (the staleness signal
    * [[pqIndexDriftReport]] reads). Pure map-side fold per row. */
  private[graft] def pqCodes(e: DataFrame,
      seeds: Seq[(Long, Seq[Double])]): DataFrame = {
    val (codes, qerr) = pqCodeColumns(seeds)
    e.select(col("vec_id"), codes.as("codes"), qerr.as("qerr_micro"))
  }

  /** The (codes, qerr_micro) column pair over a vector column `e` —
    * the map-side encode [[pqCodes]] projects and [[q107IvfPqAnn]]
    * grafts onto the IVF membership (keeping its `cluster`). */
  private[graft] def pqCodeColumns(
      seeds: Seq[(Long, Seq[Double])]): (Column, Column) = {
    // r21: ONE native compiled encode per row (PqEncode) — the HOF
    // form evaluated ~2·subspaces·k interpreted rounded-L2 folds per
    // row (each re-slicing the vector), the hottest per-row cost in
    // the PQ family (guide §4). codes/qerr are the identical argmin/
    // min-distance derivation (spec-pinned, oracle twins untouched);
    // the two getFields share one encode via content-based equality.
    val enc = graft.expressions.DedupFunctions
      .pqEncodeStruct(col("e"), seeds, PqSubspaces, PqSubDim)
    (enc.getField("codes"), enc.getField("qerr_micro"))
  }

  /** A query relation `(qid, qe)` annotated with its ADC lookup table:
    * 4·k int64 micro-distances, s-major, codeword order = the codes'
    * index order. */
  private[graft] def pqQueryRel(queries: DataFrame,
      seeds: Seq[(Long, Seq[Double])]): DataFrame =
    queries.select(col("qid"), col("qe"), pqQueryTableCol(seeds).as("tq"))

  /** The ADC lookup-table column over a query-vector column `qe`. */
  private def pqQueryTableCol(seeds: Seq[(Long, Seq[Double])]): Column = {
    val cbs = pqCodebookCols(seeds)
    concat((0 until PqSubspaces).map(s =>
      transform(cbs(s), c =>
        round(l2sq6(pqSubvec(col("qe"), s), c) * lit(1.0e6), 0).cast("long"))): _*)
  }

  /** ADC top-k: broadcast the table-annotated queries against the code
    * relation, fold 4 `element_at` lookups per pair (exact int64 in
    * any order), rank per query. */
  private[graft] def pqAdcTop(codes: DataFrame, queryRel: DataFrame,
      k: Int): DataFrame = {
    val adc = codes.join(broadcast(queryRel), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (0 until PqSubspaces).map(s =>
            element_at(col("tq"), col("codes")(s) + lit(s * k) + 1))
          .reduce(_ + _).as("adc_micro"))
    adc.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adc_micro"), col("vec_id"))))
      .filter(col("rk") <= TopK)
  }

  /** The q101/q103 serve tail: ADC top-5 per `%97` corpus query, each
    * row flagged against the exact rounded-L2 top-5 (the q25
    * brute-force shape). `codes` may come from an in-session encode
    * (q101) or the index at rest (q103) — rows are identical. */
  private def pqFlaggedServe(codes: DataFrame, e: DataFrame,
      seeds: Seq[(Long, Seq[Double])]): DataFrame = {
    val queries = pqQueryRel(
      e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("qid"), col("e").as("qe")), seeds)
    val top = pqAdcTop(codes.select(col("vec_id"), col("codes")),
      queries, seeds.length)
    val byQ = Window.partitionBy(col("qid"))
    val exact = e.join(broadcast(queries.select(col("qid"), col("qe"))),
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), l2sq6(col("e"), col("qe")).as("d6"))
      .withColumn("xr", row_number().over(byQ.orderBy(col("d6"), col("vec_id"))))
      .filter(col("xr") <= TopK)
      .select(col("qid"), col("vec_id"), lit(true).as("in_exact_top5"))
    top.join(exact, Seq("qid", "vec_id"), "left")
      .select(col("qid"), col("rk").cast("int").as("rk"), col("vec_id"),
        col("adc_micro"),
        coalesce(col("in_exact_top5"), lit(false)).as("in_exact_top5"))
      .orderBy(col("qid"), col("rk"))
  }

  // -------------------------------------- q103: PQ index AT REST

  /** Managed-table name for the q103 PQ index, keyed by corpus dir. */
  private[graft] def pqIndexTable(dir: String): String =
    "graft_pq_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build a PQ index AT REST from `(vec_id, e)` vectors: hash-seeded
    * codebook, map-side encode, then [[Layout.writePqIndex]]. The
    * stats sidecar freezes the BUILD-time quantization-error average
    * (`build_n`, `build_sum_qerr_micro`) alongside the running totals
    * so [[pqIndexDriftReport]] can compare appended data against it. */
  def buildPqIndex(e: DataFrame, name: String): Unit = {
    val spark = e.sparkSession
    import spark.implicits._
    val seeds = pqSeeds(e)
    val codes = pqCodes(e, seeds)
    val s = codes.agg(count(lit(1)).as("n"),
      sum(col("qerr_micro")).as("serr")).collect()(0)
    val stats = Seq((s.getLong(0), s.getLong(0), s.getLong(1), s.getLong(1)))
      .toDF("n", "build_n", "sum_qerr_micro", "build_sum_qerr_micro")
    Layout.writePqIndex(codes, seeds.toDF("label", "cvec"), stats, name)
  }

  /** The stored codebook restored to [[pqSeeds]]' collected form
    * (ascending label — the order every code index was minted in). */
  private[graft] def storedPqSeeds(spark: SparkSession,
      name: String): Seq[(Long, Seq[Double])] =
    spark.table(name + "_codebook")
      .select(col("label").cast("long"), col("cvec").cast("array<double>"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  /** Incremental index maintenance: append NEW vectors `(vec_id, e)`
    * to a persisted PQ index with the codebook FROZEN at build time —
    * each vector encodes through the stored codewords (exactly the
    * map-side fold the build ran) and appends to the code relation;
    * the stats sidecar accumulates the appended quantization error.
    *
    * The trade this encodes: a frozen codebook quantizes drifting data
    * ever more coarsely — appends are cheap between rebuilds, and
    * [[pqIndexDriftReport]] flags when the appended error average says
    * the codebook no longer fits the corpus (the PQ analog of IVF's
    * occupancy drift). */
  def pqIndexAppend(spark: SparkSession, name: String,
      vectors: DataFrame): Unit = {
    val seeds = storedPqSeeds(spark, name)
    val fresh = pqCodes(vectors.select(col("vec_id"),
      col("e").cast("array<double>").as("e")), seeds)
    val add = fresh.agg(count(lit(1)).as("nb"),
      coalesce(sum(col("qerr_micro")), lit(0L)).as("sb")).collect()(0)
    if (add.getLong(0) > 0L) {
      fresh.write.mode(org.apache.spark.sql.SaveMode.Append)
        .saveAsTable(name)
      Layout.replaceStats(spark.table(name + "_stats")
        .select((col("n") + add.getLong(0)).as("n"), col("build_n"),
          (col("sum_qerr_micro") + add.getLong(1)).as("sum_qerr_micro"),
          col("build_sum_qerr_micro")), name + "_stats")
    }
  }

  /** Codebook-staleness report for a persisted PQ index — the REBUILD
    * trigger [[pqIndexAppend]]'s frozen codebook makes necessary: one
    * row comparing the appended data's average quantization error
    * against the build-time average; `needs_rebuild` flags a 2×
    * degradation (data has drifted past what the stored codewords
    * describe — re-running [[buildPqIndex]] refits them). Reads only
    * the one-row stats sidecar. */
  def pqIndexDriftReport(spark: SparkSession, name: String): DataFrame =
    spark.table(name + "_stats")
      .select(col("n"), col("build_n"),
        round(col("build_sum_qerr_micro") / 1.0e6 / col("build_n"), 6)
          .as("build_avg_qerr"),
        when(col("n") > col("build_n"),
          round((col("sum_qerr_micro") - col("build_sum_qerr_micro")) / 1.0e6 /
            (col("n") - col("build_n")), 6)).as("appended_avg_qerr"))
      .withColumn("needs_rebuild",
        coalesce(col("appended_avg_qerr") >
          col("build_avg_qerr") * 2.0, lit(false)))

  /** L3 — PQ ANN served from the index AT REST: build-if-absent, then
    * serve every query from the persisted code relation and stored
    * codebook with ZERO re-encoding — the serve scan reads 4-int codes
    * (128× smaller than raw vectors), queries route through the stored
    * codewords, and the result is row-identical to q101 (same seeds,
    * same encode fold, same ADC) — the oracle twin IS q101's, so the
    * hash match proves the index round-trip loses nothing. The q85
    * production split, applied to PQ: encoding is ingest work, paid
    * once per corpus version; queries pay table lookups. */
  def q103IndexedPqAnn(spark: SparkSession, dir: String): DataFrame = {
    val idx = ensurePqIndex(spark, dir)
    pqFlaggedServe(spark.table(idx), pqVectors(spark, dir),
      storedPqSeeds(spark, idx))
  }

  // ---------------------------------------- q107: IVF-PQ composed

  /** Managed-table name for the COMPOSED IVF-PQ index of a corpus dir
    * (VERDICT r18 §next-2): fine-cluster membership + raw vectors +
    * 4-int PQ codes as ONE cluster-bucketed relation, routing sidecar
    * at `<name>_routing` (the [[Layout.writeIvfIndex]] layout with a
    * `codes` column). */
  private[graft] def ivfPqIndexTable(dir: String): String =
    "graft_ivfpq_" + dir.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** Build-if-absent-or-stale for the COMPOSED IVF-PQ index (VERDICT
    * r18 §next-2 — q107/q120/q121 used to re-derive membership AND
    * codes in-session on every serve, re-paying ~0.4 of the build per
    * query): ONE banked artifact carrying everything the composed
    * serves need — `(vec_id, e, cluster, mask, codes)` bucketed on
    * `cluster` (serve joins exchange-free on the bucketed key, the
    * q85 property) plus the `_routing` sidecar (≤64 rows — external
    * queries assign through it, [[q145IvfPqRouted]]). The PQ codebook
    * banks through its own ensure ([[trainedPqSeeds]]), so codes here
    * and every query lookup table share the identical trained
    * codewords. Build = the q107 in-session derivation verbatim
    * (deterministic per corpus, so banking changes no oracle row —
    * the q103 precedent); fingerprinted against the embeddings corpus
    * like every banked artifact. */
  private[graft] def ensureIvfPqIndex(spark: SparkSession,
      dir: String): String = {
    val idx = ivfPqIndexTable(dir)
    ensureCurrent(spark, idx, corpusFingerprint(pqVectors(spark, dir))) {
      val e = pqVectors(spark, dir)
      val seeds = trainedPqSeeds(spark, dir)
      val (codesCol, _) = pqCodeColumns(seeds)
      val (members, routing) = mapSideFineClustersWithRouting(e,
        labelCentroids(spark, dir), ClusterTargetOccupancy)
      Layout.writeIvfIndex(members.withColumn("codes", codesCol),
        routing, idx, IvfIndexBuckets)
    }
    idx
  }

  /** Managed-table name for the TRAINED-COARSE IVF index (q130's
    * router at rest). */
  private[graft] def trainedIvfIndexTable(dir: String): String =
    "graft_tcivf_" + dir.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** Build-if-absent-or-stale for the TRAINED-COARSE IVF index
    * (VERDICT r18 §next-2's q130 half: the Lloyd-trained membership —
    * 0.42 of the query's cost — was re-derived every serve): the
    * label-free [[kMeansCentroids]] router subdivided to the same
    * target occupancy, banked through the identical
    * [[Layout.writeIvfIndex]] layout (the helpers are
    * centroid-agnostic by design — this ensure is the "deployment
    * banks the trained index exactly as q85 banks the label one" the
    * q130 scaladoc promised). */
  private[graft] def ensureTrainedIvfIndex(spark: SparkSession,
      dir: String): String = {
    val idx = trainedIvfIndexTable(dir)
    ensureCurrent(spark, idx, corpusFingerprint(pqVectors(spark, dir))) {
      val e = pqVectors(spark, dir)
      val (members, routing) = mapSideFineClustersWithRouting(e,
        kMeansCentroids(e), ClusterTargetOccupancy)
      Layout.writeIvfIndex(members, routing, idx, IvfIndexBuckets)
    }
    idx
  }

  /** L3 — IVF-PQ, the two pruning axes COMPOSED: the q31 coarse stage
    * prunes CANDIDATES (each query ranks only its fine cluster's
    * inverted list — O(1) rows at any corpus size), and the q101 PQ
    * stage prunes BYTES (candidates are ranked from 4-int codes via
    * the ADC lookup table — no raw vector is touched at serve time).
    * This is the architecture production ANN systems actually run
    * (FAISS `IVFx,PQy`): at 100 TB neither axis suffices alone — a
    * flat PQ scan still reads every code, and IVF over raw vectors
    * still reads 512-byte rows — and their costs multiply when
    * stacked. Candidate semantics are EXACTLY q31's (same membership,
    * same nprobe=1 cluster join, same `vec_id < 10` query set);
    * ranking is exactly q101's integer ADC; each row carries
    * `in_exact_top5` against the exact rounded-L2 top-5 of the SAME
    * candidate list, so the PQ-induced rank error is read off the
    * result.
    *
    * Scale posture (100 TB): the composed index is BANKED
    * ([[ensureIvfPqIndex]], VERDICT r18 §next-2 — membership and codes
    * used to be re-derived in-session per serve): the serve reads the
    * cluster-bucketed members relation (codes, raw vectors, and masks
    * in one exchange-free scan) and the ≤17-row stored codebook; the
    * ADC join is cluster-equi with a BROADCAST query side — never a
    * corpus exchange; both rankings window per query over O(1)
    * candidate rows. Warm serve pays table lookups, never a build
    * (ServeSplit measures the split). */
  def q107IvfPqAnn(spark: SparkSession, dir: String): DataFrame = {
    val members = spark.table(ensureIvfPqIndex(spark, dir))
    val seeds = trainedPqSeeds(spark, dir)
    ivfPqServe(members.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("cluster"),
          pqQueryTableCol(seeds).as("tq")),
      members, seeds.length)
  }

  /** The composed IVF-PQ serve tail shared by q107 (member queries),
    * q120 (probe-expanded queries), and q145 (routing-assigned
    * external queries): ADC-rank the banked codes of each query's
    * probed cluster(s) against its broadcast lookup table, flag
    * against the exact rounded-L2 top-5 of the SAME candidate set.
    * `queries` carries `(qid, qe, cluster, tq)` — one row per (query,
    * probe); `members` is the banked `(vec_id, e, cluster, codes)`
    * relation. */
  private def ivfPqServe(queries: DataFrame, members: DataFrame,
      k: Int): DataFrame = {
    val byQ = Window.partitionBy(col("qid"))
    val top = members.select(col("vec_id"), col("cluster"), col("codes"))
      .join(broadcast(queries.select(col("qid"), col("tq"), col("cluster"))),
        Seq("cluster"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (0 until PqSubspaces).map(s =>
            element_at(col("tq"), col("codes")(s) + lit(s * k) + 1))
          .reduce(_ + _).as("adc_micro"))
      .withColumn("rk", row_number().over(
        byQ.orderBy(col("adc_micro"), col("vec_id"))))
      .filter(col("rk") <= TopK)
    val exact = members.select(col("vec_id"), col("e"), col("cluster"))
      .join(broadcast(queries.select(col("qid"), col("qe"), col("cluster"))),
        Seq("cluster"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), l2sq6(col("e"), col("qe")).as("d6"))
      .withColumn("xr", row_number().over(byQ.orderBy(col("d6"), col("vec_id"))))
      .filter(col("xr") <= TopK)
      .select(col("qid"), col("vec_id"), lit(true).as("in_exact_top5"))
    top.join(exact, Seq("qid", "vec_id"), "left")
      .select(col("qid"), col("rk").cast("int").as("rk"), col("vec_id"),
        col("adc_micro"),
        coalesce(col("in_exact_top5"), lit(false)).as("in_exact_top5"))
      .orderBy(col("qid"), col("rk"))
  }

  /** L3 — the composed index serving EXTERNAL queries (q145): q107's
    * query vectors assigned through the banked ROUTING sidecar
    * ([[routeThroughIndex]] — nearest stored centroid + stored mask)
    * instead of looked up in the membership, which is how a production
    * deployment serves vectors that are NOT corpus members. For member
    * vectors the routing assignment equals the build assignment (the
    * denseLegFromIndex contract), so the result is row-identical to
    * q107 and the oracle twin IS q107's — the hash match certifies the
    * whole banked round-trip (membership + codes + codebook + routing)
    * end to end. Serve cost: one ≤64-row routing collect + q107's
    * bounded serve tail; zero corpus passes outside the bucketed
    * candidate scan. */
  def q145IvfPqRouted(spark: SparkSession, dir: String): DataFrame =
    ivfPqRoutedServe(spark, dir,
      spark.table(ensureIvfPqIndex(spark, dir))
        .filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("e").as("qe")))

  /** The query-parameterized serve behind [[q145IvfPqRouted]],
    * [[q148RoutedMultiProbe]] and the streaming face
    * ([[graft.streaming.Retrieve.ivfPqServeAtRest]]): ANY `(query_id,
    * qe)` relation — corpus members or genuinely external vectors —
    * assigned through the banked routing sidecar and ADC-ranked
    * against the banked codes. A query's own PQ codes are its
    * per-subspace argmin codewords, so a corpus vector re-presented
    * under a novel id scores the GLOBAL-minimum ADC against itself
    * (ties only with code-identical vectors) — the find-yourself
    * property the streaming spec pins.
    *
    * `probeRadius` is the serve-time nprobe knob (VERDICT r19
    * §next-2 — the external-query face served nprobe = 1 only, while
    * q118/q120 proved probes are the recall lever): the routed
    * (cluster, mask) expands through [[probeExpand]] exactly as
    * q120's member queries do — the coarse cell and the one ADC
    * lookup table are probe-invariant (radius-1/2 probes flip only
    * sub-bucket bits), so the expansion is a Generate over the query
    * side only, computed AFTER the table. Radius 0 (default) is the
    * identity — q145's oracle row is untouched. Serve cost per query
    * batch: one ≤64-row routing collect (memoized ensures) + the
    * bounded ADC tail over O(occupancy × probes) candidates — zero
    * corpus passes at any radius. */
  private[graft] def ivfPqRoutedServe(spark: SparkSession, dir: String,
      queries: DataFrame, probeRadius: Int = 0): DataFrame = {
    val idx = ensureIvfPqIndex(spark, dir)
    val members = spark.table(idx)
    val seeds = trainedPqSeeds(spark, dir)
    // the ADC table derives from the RAW query vector — once per
    // query, before the expansion, then carried per probe row (the
    // q120 discipline; the q107 codebook quantizes raw vectors, one
    // global basis, so the table is valid across ANY probed cluster)
    val routed = routeThroughIndex(spark.table(idx + "_routing"),
        queries.select(col("query_id").as("qid"),
          transform(col("qe"), x => x.cast("double")).as("qe")), "qe")
      .select(col("qid"), col("qe"), col("cluster"), col("mask"),
        pqQueryTableCol(seeds).as("tq"))
    ivfPqServe(probeExpand(routed, probeRadius), members, seeds.length)
  }

  /** L3 — the composed index serving external queries at nprobe > 1
    * (q148): [[q145IvfPqRouted]]'s routed-external round-trip with
    * the q120 multi-probe knob turned — q107's query vectors assigned
    * through the banked routing sidecar, then each probing its home
    * fine cluster PLUS every radius-1 sub-bucket neighbour. For
    * member vectors the routing assignment (cluster AND mask) equals
    * the build assignment, so the result is row-identical to q120 and
    * the oracle twin IS q120's — the hash match certifies that the
    * full production configuration (banked membership + codes +
    * codebook + routing + multi-probe) serves external traffic
    * exactly as it serves members, partition-boundary recall
    * included. */
  def q148RoutedMultiProbe(spark: SparkSession, dir: String): DataFrame =
    ivfPqRoutedServe(spark, dir,
      spark.table(ensureIvfPqIndex(spark, dir))
        .filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("e").as("qe")),
      probeRadius = 1)

  // ---------------------- q120: multi-probe IVF-PQ (the full stack)

  /** L3 — MULTI-PROBE IVF-PQ: q107's two composed pruning axes with
    * the q118 serve-time knob turned — each query ADC-ranks the
    * 4-int codes of its home fine cluster PLUS every radius-1
    * sub-bucket neighbour ([[probeExpand]]). This is the full
    * production configuration (FAISS `IVFx,PQy` at nprobe > 1): IVF
    * prunes candidates, PQ prunes bytes, multi-probe buys back the
    * recall the partition boundary costs. The q107 codebook quantizes
    * RAW vectors (one global basis), so the ADC lookup table is valid
    * across ANY probed cluster; computed ONCE on the home row and
    * carried through the probe expansion, the widened broadcast ships
    * ~33 (cluster, table) rows per query, all
    * corpus-size-independent. (The residual form also multi-probes
    * with one table here — see [[q121MultiProbeResidual]]: radius-1
    * probes flip only sub-bucket bits, so the coarse cell and its
    * residual basis never change; per-probe LUTs only become
    * necessary when probing crosses COARSE cells, the classic FAISS
    * IVFADC nprobe geometry.)
    *
    * The `in_exact_top5` flag grades ADC against the exact rounded-L2
    * top-5 of the SAME probed candidate set — both rankings see
    * identical candidates, so the flag isolates quantization error
    * from partition recall exactly as q107's does.
    *
    * Scale posture: q107's — the BANKED composed index
    * ([[ensureIvfPqIndex]]), candidate lists O(occupancy × probes) per
    * query, queries broadcast, the ≤ queries·k result sort — plus
    * nothing: the probe expansion is a Generate on ≤10 rows. */
  def q120MultiProbeIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val members = spark.table(ensureIvfPqIndex(spark, dir))
    val seeds = trainedPqSeeds(spark, dir)
    // the ADC table derives from the RAW query vector — once per
    // query, before the expansion, then carried per probe row
    val probed = probeExpand(
      members.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          pqQueryTableCol(seeds).as("tq"), col("cluster"), col("mask")),
      1)
    ivfPqServe(probed, members, seeds.length)
  }

  // ------------------------------- q109: residual IVF-PQ composed

  /** Managed-table base name for the q109 residual codebook (the
    * codebook lands at `<base>_codebook`, the [[storedPqSeeds]]
    * contract). */
  private[graft] def pqResidualCodebookTable(dir: String): String =
    "graft_pqres_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** The trained RESIDUAL codebook for a corpus — [[trainedPqSeeds]]'
    * train-once discipline for q109's basis: residuals depend on the
    * coarse centroids, so the raw-vector codebook cannot be shared,
    * but the residual relation is just as deterministic per corpus
    * and its trained codewords persist the same way. Only the ≤17-row
    * codebook goes to rest (residual CODES are per-cell
    * basis-dependent and a cheap map-side fold over the already-
    * persisted membership — the expensive artifact is the Lloyd
    * training, paid once). `residuals` is by-name so the training
    * input is only evaluated on a build. */
  private[graft] def trainedResidualPqSeeds(spark: SparkSession,
      dir: String, residuals: => DataFrame): Seq[(Long, Seq[Double])] = {
    val base = pqResidualCodebookTable(dir)
    // the staleness key is the SOURCE corpus: residuals derive
    // deterministically from it (embeddings → centroids → r), so a
    // matching source fingerprint proves the banked codewords current
    // without forcing the residual lineage on a served path
    ensureCurrent(spark, base + "_codebook",
        corpusFingerprint(pqVectors(spark, dir))) {
      import spark.implicits._
      Layout.writeCodebook(pqSeeds(residuals).toDF("label", "cvec"),
        base + "_codebook")
    }
    storedPqSeeds(spark, base)
  }

  /** L3 — IVF-PQ with RESIDUAL encoding, the textbook refinement over
    * q107 (Jégou et al. §IVFADC; FAISS's default): vectors inside one
    * coarse cell share that cell's centroid, so quantizing the
    * RESIDUAL `r = v − centroid(cell)` spends the whole codebook on
    * the within-cell variation instead of re-describing the cell
    * position — finer effective resolution from the same 4-int codes.
    * The residual basis is per-cell, which is exactly why it composes
    * with IVF and not with the flat scan: a query ranks only
    * candidates in ITS cell, so query and candidate residuals subtract
    * the SAME centroid and the ADC geometry is consistent (the exact
    * distance is basis-invariant — `‖v−q‖ = ‖r_v−r_q‖` — so the flag
    * ranks raw vectors and means the same thing as q107's).
    *
    * Everything else is deliberately q107: same membership (one
    * persist), same hash-threshold seeds (selection hashes only
    * `vec_id`, so the SAME documents seed — their residuals become the
    * codewords), same integer ADC, same oracle skeleton with the
    * encode CTEs pointed at the residual relation.
    *
    * Scale posture: q107's banked-index serve plus one broadcast join
    * against the ≤64-row routing sidecar to form residuals — map-side,
    * over the bucketed scan. */
  def q109IvfPqResidual(spark: SparkSession, dir: String): DataFrame = {
    val (coded, queries, k) = residualServeRelations(spark, dir)
    ivfPqServe(queries.drop("mask"), coded, k)
  }

  /** The residual serve's two relations, derived from the BANKED
    * composed index (VERDICT r18 §next-2 — membership and centroids
    * come from rest; only the cheap map-side residual encode runs
    * in-plan, against the banked residual codebook): `coded` =
    * `(vec_id, e RAW, cluster, codes RESIDUAL)` — ADC ranks residual
    * codes, the exact flag ranks raw vectors (basis-invariant within
    * a cell: ‖v−q‖ = ‖r_v−r_q‖) — and `queries` = `(qid, qe RAW,
    * cluster, mask, tq RESIDUAL)` for the ≤10-query panel. The
    * centroid relation is the index's own `_routing` sidecar (the
    * collected [[labelCentroids]] rows at rest — no recompute). */
  private def residualServeRelations(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, Int) = {
    val idx = ensureIvfPqIndex(spark, dir)
    val members = spark.table(idx)
    val cents = spark.table(idx + "_routing")
      .select(col("label").cast("long").as("label"),
        col("cvec").cast("array<double>").as("cvec"))
    val withRes = members
      .withColumn("label", expr("cluster div 4294967296"))
      .join(broadcast(cents), "label")
      .withColumn("r", zip_with(col("e"), col("cvec"), (a, b) => a - b))
    val seeds = trainedResidualPqSeeds(spark, dir,
      withRes.select(col("vec_id"), col("r").as("e")))
    val (codesCol, _) = pqCodeColumns(seeds)
    // the rename dance binds the encode/table expressions (which read
    // `e`/`qe`) to the RESIDUAL while the output keeps the raw vector
    // under the serve tail's expected name
    val coded = withRes
      .select(col("vec_id"), col("cluster"), col("e").as("raw"),
        col("r").as("e"))
      .withColumn("codes", codesCol)
      .select(col("vec_id"), col("cluster"), col("raw").as("e"), col("codes"))
    val queries = withRes.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("e").as("rawq"),
        col("r").as("qe"), col("cluster"), col("mask"))
      .withColumn("tq", pqQueryTableCol(seeds))
      .select(col("qid"), col("rawq").as("qe"), col("cluster"),
        col("mask"), col("tq"))
    (coded, queries, seeds.length)
  }

  /** L3 — MULTI-PROBE RESIDUAL IVF-PQ (q109 at nprobe > 1): the
    * refinement and the recall knob COMPOSED. The subtlety a reader
    * expects here is absent BY THE PROBE GEOMETRY: radius-1 probes
    * flip only SUB-BUCKET bits ([[probeExpand]] masks to the active
    * low bits), so every probed cluster shares the query's coarse
    * cell — same centroid, same residual basis — and ONE ADC table
    * per query (computed from the query's residual on its home row)
    * is exact across the whole probe set. Per-probe lookup tables,
    * the cost the FAISS IVFADC literature pays for multi-probe, only
    * arise when probing crosses COARSE cells; the corpus-scaled
    * design probes within the cell, so the residual refinement
    * multi-probes for free. The `in_exact_top5` flag stays on RAW
    * vectors over the probed candidate set (basis-invariant within
    * the shared cell: `‖v−q‖ = ‖r_v−r_q‖`).
    *
    * Scale posture: q109's banked-index serve plus the Generate on
    * ≤10 query rows; candidates stay O(occupancy × probes). ONE
    * residual ADC table per query, computed BEFORE the probe
    * expansion — valid across every probed sub-bucket (same coarse
    * cell). */
  def q121MultiProbeResidual(spark: SparkSession, dir: String): DataFrame = {
    val (coded, queries, k) = residualServeRelations(spark, dir)
    ivfPqServe(probeExpand(queries, 1), coded, k)
  }

  // ------------------------------------ q106: corpus snapshot diff

  /** Pipeline — corpus version diff: what changed between two crawls
    * of the same corpus, the bookkeeping every recurring ingestion
    * runs before deciding what to re-process (unchanged documents keep
    * their derived artifacts — embeddings, signatures, index rows —
    * changed ones invalidate them). Version 2 is a deterministic
    * mutation of the base corpus: `%13` documents dropped, `%7`
    * documents revised (content change under the same id), `%11`
    * documents re-keyed in as additions. A full-outer join on `doc_id`
    * classifies every id as added / removed / modified (digest
    * mismatch) / unchanged, rolled up per language.
    *
    * Scale posture (100 TB): each side reduces to `(doc_id, lang,
    * digest)` BEFORE the exchange — text never shuffles (the q91
    * discipline); the diff is one hash full-outer join on the id and a
    * partial-aggregated ≤|lang|-row rollup. Re-processing then scans
    * only `added ∪ modified` — the incremental-pipeline contract. */
  def q106SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
    val v1 = base.select(col("doc_id"), col("lang"),
      md5(col("text").cast("binary")).as("h1"))
    val v2full = base.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionByName(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("lang"),
          col("text")))
    val v2 = v2full.select(col("doc_id"), col("lang").as("lang2"),
      md5(col("text").cast("binary")).as("h2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(coalesce(col("lang"), col("lang2")).as("lang"),
        col("h1"), col("h2"))
      .groupBy(col("lang"))
      .agg(
        sum(when(col("h1").isNotNull, 1L).otherwise(0L)).as("n_v1"),
        sum(when(col("h2").isNotNull, 1L).otherwise(0L)).as("n_v2"),
        sum(when(col("h1").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("h2").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("h1").isNotNull && col("h2").isNotNull &&
          col("h1") =!= col("h2"), 1L).otherwise(0L)).as("n_modified"),
        sum(when(col("h1") === col("h2"), 1L).otherwise(0L)).as("n_unchanged"))
      .orderBy(col("lang"))
  }

  // -------------------------------- q111: quality-aware keepers

  /** Pipeline — quality-aware keeper selection inside duplicate
    * clusters: exact and min-id dedup keep the FIRST copy; real
    * curation keeps the BEST one (longest, highest-quality — the copy
    * with the appended tail often beats a truncated original). Over
    * the q50 near-dup graph, each connected component reports its
    * size, its keeper (max length, ties to the smaller id — the exact
    * `len·10^9 − id` integer key, engine-deterministic), and the
    * keeper's length.
    *
    * Scale posture (100 TB): components via
    * [[Graph.connectedComponentsStar]] (O(log² n) rounds, per-round
    * lineage truncation — the deep-graph-safe form); the score join is
    * id-equi against the digest-thin corpus projection; the keeper
    * argmax is a partial-aggregated `max_by` — one exchange on the
    * component label, ≤|clusters| result rows. */
  def q111ClusterKeepers(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    val corpus = d
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" extra token tail")).as("text")))
    val edges = verifiedNearDupPairs(corpus)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = Graph.connectedComponentsStar(edges)
    val scored = corpus.select(col("doc_id").as("node"),
      length(col("text")).cast("long").as("len"))
    labels.join(scored, "node")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"),
        max_by(col("node"),
          col("len") * lit(1000000000L) - col("node")).as("keep_id"),
        max(col("len")).as("keep_len"))
      .orderBy(col("label"))
  }

  // ------------------------------------- q110: dedup yield curve

  /** Number of ordered crawl batches [[q110DedupYield]] splits the
    * corpus into. */
  private val YieldBatches = 5

  /** Pipeline — dedup yield curve: how much NEW content each
    * successive crawl batch contributes, the saturation signal a crawl
    * scheduler watches (a source whose yield decays to zero is
    * re-crawling itself — stop paying for it). The re-crawled corpus
    * (the q23 `%7` copies) splits into [[YieldBatches]] ordered
    * batches by id; a batch's yield is the share of its documents
    * whose digest first occurs IN that batch. Per batch: document
    * count, first-occurrence digest count, duplicate-document count
    * (in-batch extra copies AND cross-batch repeats both count —
    * they're both wasted crawl), and the yield ratio.
    *
    * Scale posture (100 TB): text reduces to a digest before any
    * exchange (the q91 discipline); first-occurrence is one
    * `min(batch)` hash aggregation on the digest (map-side partials);
    * the rollup is ≤ [[YieldBatches]] rows joined from two bounded
    * aggregates. One corpus scan, one digest exchange. */
  def q110DedupYield(spark: SparkSession, dir: String): DataFrame = {
    val d = dupDocs(spark, dir)
      .select((col("doc_id") % YieldBatches).cast("int").as("batch"),
        md5(col("text").cast("binary")).as("h"))
    val perBatch = d.groupBy(col("batch")).agg(count(lit(1)).as("n_docs"))
    val firsts = d.groupBy(col("h")).agg(min(col("batch")).as("batch"))
      .groupBy(col("batch")).agg(count(lit(1)).as("n_new_digests"))
    perBatch.join(firsts, Seq("batch"), "left")
      .select(col("batch"), col("n_docs"),
        coalesce(col("n_new_digests"), lit(0L)).as("n_new_digests"))
      .withColumn("n_dup_docs", col("n_docs") - col("n_new_digests"))
      .withColumn("yield_pct",
        round(col("n_new_digests").cast("double") / col("n_docs"), 6))
      .orderBy(col("batch"))
  }

  // ------------------------------ q102: cross-source duplicate matrix

  /** Pipeline — cross-source near-duplicate contamination matrix: how
    * much each source pair shares, the question a corpus curator asks
    * before weighting sources (a feed that mirrors another shouldn't
    * count twice in the mix, and q54's mixing quotas assume sources
    * are distinct populations). The corpus deterministically re-crawls
    * `doc_id % 7 = 0` under the SAME source (the diagonal) and
    * `doc_id % 19 = 0` under the NEXT source in rank order (the
    * off-diagonal "mirrored feed"); the MinHash-LSH pair machinery is
    * [[q24NearDupMinhash]]'s, verbatim — one derivation, then a
    * source-pair rollup with the pair key ordered (least, greatest) so
    * the matrix is upper-triangular.
    *
    * Jaccard mass per cell is accumulated in E4 INTEGER units
    * (`round(jaccard·10^4)` as int64) so the sum is exact in any
    * partition order; the cell average divides once at the end —
    * engine-deterministic with no float tolerance.
    *
    * Scale posture (100 TB): everything q24 already holds (banded
    * candidates only, sorted-hash-array verify, never all-pairs), plus
    * a ≤|sources|-row broadcast for the rotation and a ≤|sources|²-row
    * rollup; the doc→source side tables join the pair relation on its
    * natural keys — broadcastable whenever the near-dup pair relation
    * isn't tiny anyway. */
  def q102SourceDupMatrix(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"), col("source"))
    // bounded source-rotation relation (≤|sources| rows, broadcast)
    val byName = Window.orderBy(col("source"))
    val srcs = d.select(col("source")).distinct()
      .withColumn("rk", row_number().over(byName) - 1)
    val nRel = srcs.agg(count(lit(1)).as("ns"))
    val rot = srcs.crossJoin(broadcast(nRel))
      .withColumn("nrk", (col("rk") + 1) % col("ns"))
      .join(srcs.select(col("source").as("next_source"), col("rk").as("nrk")), "nrk")
      .select(col("source"), col("next_source"))
    val corpus = d
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      .unionByName(d.filter(col("doc_id") % 19 === 0)
        .join(broadcast(rot), "source")
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"),
          col("next_source").as("source")))
    val pairs = verifiedNearDupPairs(corpus.select(col("doc_id"), col("text")))
    // narrow (doc_id, source) map persisted ONCE and referenced by both
    // pair sides — without it each side re-derives the corpus union
    // (two more full text scans at 100 TB for two fixed-width columns)
    val side = corpus.select(col("doc_id"), col("source"))
      .persist(NarrowCacheLevel)
    val out = pairs
      .join(side.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(side.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"),
        round(col("jaccard") * 10000, 0).cast("long").as("j4"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("j4")).as("sum_jaccard_e4"))
      .withColumn("avg_jaccard",
        round(col("sum_jaccard_e4") / 10000.0 / col("n_pairs"), 6))
      .orderBy(col("source_a"), col("source_b"))
    // ≤|src|²-row result: snapshot, then release the side map
    val snapshot = out.collect()
    side.unpersist(blocking = false)
    spark.createDataFrame(
      java.util.Arrays.asList(snapshot: _*), out.schema)
  }

  // ------------------------------------------------------------ oracle SQL

  /** DuckDB twins. Fragments mirror [[graft.functions.TextFunctions]]
    * exactly; DuckDB list lambdas index 1-based where Spark's are
    * 0-based — every index formula below accounts for that. */
  // --------------------- q112: markup / boilerplate extraction

  /** Deterministic HTML-ish page fixture over the documents corpus
    * (the q102/q106/q110 in-SQL fixture discipline — the oracle
    * re-derives identical pages inline): a 3-link nav bar, a heading,
    * the document text split into two `<p>` paragraphs, a menu item,
    * and a copyright footer, newline-separated. Every boilerplate
    * line is constructed to trip a DIFFERENT drop rule (link density,
    * short line, nav token, boilerplate token), so the fixture
    * exercises the whole cascade. */
  private[graft] def markupPages(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("lang"),
      concat(
        // nav carries attribute'd block tags plus case/whitespace
        // anchor variants (`<A HREF`, `<a\thref`) — the VERDICT r14
        // realism ask; the second <p> line nests inline tags
        lit("<nav class=\"top\"><a href=\"/\">home</a> " +
          "<A HREF=\"/a\">about</A> <a\thref=\"/b\">contact</a></nav>" +
          "\n<h1 id=\"t\">Document "),
        col("doc_id").cast("string"),
        lit("</h1>\n<p class=\"lead\">"),
        expr("substring(text, 1, length(text) div 2)"),
        lit("</p>\n<li>menu</li>\n<p>"),
        expr("substring(text, length(text) div 2 + 1, length(text))"),
        lit(" <em>ends <b>here</b></em></p>" +
          "\n<footer>copyright 2026 all rights reserved</footer>"))
        .as("html"))

  /** Tag-strip for one markup line: remove every `<…>` span, trim.
    * ONE definition for the batch report (q112) and the streaming
    * gate ([[graft.streaming.Curation.markupExtract]]) — the
    * [[qualityVerdict]] discipline. */
  private[graft] def markupLineClean(line: Column): Column =
    trim(regexp_replace(line, "<[^>]*>", ""))

  /** Anchor-tag count per line: case-insensitive `<a` openers followed
    * by whitespace or `>` — tolerant of `<A HREF`, `<a\thref`, and
    * bare `<a>` (the VERDICT r14 hardening over the literal `"<a "`
    * marker, which undercounted every variant). Same RE2-compatible
    * pattern both engines. */
  private[graft] def markupLineLinks(line: Column): Column =
    size(regexp_extract_all(line, lit("(?i)<a[ \\t>]"), lit(0)))
      .cast("int")

  /** The line-level keep rule — the RefinedWeb shape (q79 cites the
    * same lineage): a line survives extraction unless it is (a) short
    * after tag-stripping (< 25 chars — headings, menu items, stray
    * markup), (b) link-dense (≥ 2 anchors — nav bars, link farms), or
    * (c) boilerplate-marked (a copyright notice). Pure map-side
    * column logic, stream-safe. */
  private[graft] def markupLineKeep(line: Column): Column = {
    val clean = markupLineClean(line)
    (length(clean) >= 25) && (markupLineLinks(line) < 2) &&
      !lower(clean).contains("copyright")
  }

  /** Whole-document extraction: kept lines tag-stripped and re-joined
    * with single spaces — the map-side column the streaming gate
    * emits per arriving page. */
  private[graft] def markupCleanDoc(html: Column): Column =
    array_join(
      transform(
        filter(split(html, "\n"), l => markupLineKeep(l)),
        l => markupLineClean(l)),
      " ")

  /** L4 — markup/boilerplate extraction report (VERDICT r13 §next-4):
    * the ingest stage every crawl→corpus pipeline runs FIRST — real
    * corpora start from HTML, not clean text, and every quality op
    * downstream (q46 gate, q58/q70 LMs, q79 quota) assumes extraction
    * already happened. Per language: document count, raw vs extracted
    * character totals, line counts, and the extracted-char /
    * dropped-line shares.
    *
    * Scale posture (100 TB): tag-strip and the rule cascade are pure
    * map-side string ops on each line; lines of a document explode in
    * place (no shuffle), so the doc-level rollup partial-aggregates to
    * ~1 row per document map-side before its exchange, and the
    * language rollup is ≤|lang| rows. Two exchanges total, both
    * carrying fixed-width aggregates — the payload text never
    * shuffles. */
  def q112MarkupExtract(spark: SparkSession, dir: String): DataFrame = {
    val lines = markupPages(docs(spark, dir))
      .select(col("doc_id"), col("lang"),
        length(col("html")).as("raw_chars"),
        explode(split(col("html"), "\n")).as("line"))
    val perDoc = lines
      .select(col("doc_id"), col("lang"), col("raw_chars"),
        markupLineKeep(col("line")).as("keep"),
        length(markupLineClean(col("line"))).cast("long").as("clean_len"))
      .groupBy(col("doc_id"), col("lang"), col("raw_chars"))
      .agg(
        sum(when(col("keep"), col("clean_len")).otherwise(lit(0L)))
          .as("extracted_chars"),
        count(lit(1)).as("n_lines"),
        sum(when(col("keep"), lit(0L)).otherwise(lit(1L))).as("n_dropped"))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw_chars")).as("raw_chars"),
        sum(col("extracted_chars")).as("extracted_chars"),
        sum(col("n_lines")).as("n_lines"),
        sum(col("n_dropped")).as("n_dropped_lines"))
      .withColumn("extracted_share",
        round(col("extracted_chars").cast("double") / col("raw_chars"), 6))
      .withColumn("dropped_line_share",
        round(col("n_dropped_lines").cast("double") / col("n_lines"), 6))
      .orderBy(col("lang"))
  }

  // --------------------- q113: end-to-end curation funnel

  /** Eval-benchmark membership for the funnel's decontamination
    * stage: base documents with `doc_id % 17 = 0` play the held-out
    * eval set. */
  private val FunnelEvalMod = 17

  /** L4 — the composed corpus-curation funnel (VERDICT r13 §next-5):
    * ONE query runs the whole production chain — quality gate (q46's
    * verdict) → canonical exact dedup (q91's digest, keep the minimum
    * id) → near-dup cluster keepers (q50's LSH+CC chain, q111's
    * `len·10^9 − id` keeper) → eval decontamination (q49's 8-gram
    * semi-join against the `%17` benchmark docs) → language mixing
    * quota (q54's hash threshold, recomputed on the SURVIVOR counts) —
    * and reports per-stage, per-language survivor counts: the
    * one-number-per-stage report every real corpus build publishes,
    * and the proof the stages COMPOSE without per-stage
    * materialization cliffs.
    *
    * Every stage reuses the proven shared derivation of its standalone
    * query ([[qualityVerdict]], `canonicalText`,
    * [[verifiedNearDupPairs]] + [[Graph.connectedComponentsStar]],
    * [[wordShingles]] + [[bloomMightContain]], the q54 threshold) —
    * one definition per rule, so the funnel cannot drift from the
    * per-stage reports.
    *
    * Scale posture (100 TB): two resident relations only — the
    * reinsertion corpus and the stage-2 survivor set (each stage's
    * DROP lists are near-dup cluster members / contaminated ids /
    * quota losers: tiny, broadcastable anti-join sides, so stages 3-5
    * re-scan the s2 cache with stacked broadcast anti-joins instead of
    * materializing each survivor set). Text reduces to digests /
    * shingle hashes / gram hashes before every exchange; the eval gram
    * side is Bloom-pruned map-side before the decontam semi-join (the
    * q49 discipline); the final report is six ≤|lang|-row aggregates
    * unioned. */
  def q113CurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("lang"), col("text"))
    val corpus = d
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          col("text")))
      .unionByName(d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"),
          concat(col("text"), lit(" extra token tail")).as("text")))
      .persist(CacheLevel)
    corpus.count()
    // stage 1 — quality gate (map-side verdict, no exchange)
    val s1 = corpus.filter(qualityVerdict(col("text")) === "keep")
    // stage 2 — canonical exact dedup: keep the smallest id per
    // canonical digest (one exchange on the digest)
    val byDigest = Window.partitionBy(
      md5(graft.functions.TextFunctions.canonicalText(col("text"))
        .cast("binary")))
    val s2 = s1.withColumn("min_id", min(col("doc_id")).over(byDigest))
      .filter(col("doc_id") === col("min_id")).drop("min_id")
      .persist(CacheLevel)
    s2.count()
    // stage 3 — near-dup cluster keepers over the s2 survivors: drop
    // every cluster member except the q111 keeper. r21 (guide §2.6):
    // the LSH+CC chain and the decontam eval side (8-gram hashes +
    // Bloom build) share nothing — overlap them.
    def dupDropsOf(): DataFrame = {
      val edges = verifiedNearDupPairs(s2.select(col("doc_id"), col("text")))
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val labels = Graph.connectedComponentsStar(edges)
      val keepers = labels
        .join(s2.select(col("doc_id").as("node"),
          length(col("text")).cast("long").as("len")), "node")
        .groupBy(col("label"))
        .agg(max_by(col("node"),
          col("len") * lit(1000000000L) - col("node")).as("keep_id"))
      // the drop lists are REUSED by every later stage's derivation AND
      // rollup (s3 feeds s4 feeds s5; each rollup re-executes its
      // lineage) — persist the two expensive ones so the LSH+CC chain
      // and the 8-gram semi-join run exactly once per funnel execution
      val dd = labels.join(keepers, "label")
        .filter(col("node") =!= col("keep_id"))
        .select(col("node").as("doc_id"))
        .persist(NarrowCacheLevel)
      dd.count()
      dd
    }
    // the eval side is the SHARED [[wordGramHashes]] derivation — the
    // same artifact the streaming decontamGate compiles into its
    // map-side verdict, so batch funnel and ingest gate agree
    val evalGrams = wordGramHashes(
      d.filter(col("doc_id") % FunnelEvalMod === 0), "text")
      .persist(NarrowCacheLevel)
    val (dupDrops, mightContain) = par2(dupDropsOf(),
      bloomMightContain(evalGrams, DecontamBloomBits))
    val s3 = s2.join(dupDrops, Seq("doc_id"), "left_anti")
    // stage 4 — decontamination: drop survivors sharing any word-8-gram
    // with the eval benchmark (Bloom-pruned exact semi-join)
    def gramsOf(rel: DataFrame): DataFrame = rel
      .select(col("doc_id"),
        explode(wordShingles(split(col("text"), " "), 8)).as("gram"))
      .select(col("doc_id"), portableHashMod(col("gram")).as("h"))
    val contaminated = gramsOf(s3)
      .filter(mightContain(col("h")))
      .join(evalGrams, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
      .persist(NarrowCacheLevel)
    contaminated.count()
    val s4 = s3.join(contaminated, Seq("doc_id"), "left_anti")
    // stage 5 — mixing quota recomputed on the survivor counts
    val counts = s4.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val minRel = counts.agg(min(col("n_lang")).as("n_min"))
    val s5 = s4.join(broadcast(counts), "lang").crossJoin(broadcast(minRel))
      .filter(pmod(portableHash(concat(lit("mix:"),
        col("doc_id").cast("string"))), lit(1000000L))
        < expr("n_min * 1000000 div n_lang"))
    def stageCount(df: DataFrame, stage: Int, name: String): DataFrame =
      df.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).cast("int").as("stage"),
          lit(name).as("stage_name"), col("lang"), col("n_docs"))
    val out = stageCount(corpus, 0, "ingest")
      .unionByName(stageCount(s1, 1, "quality_gate"))
      .unionByName(stageCount(s2, 2, "canonical_dedup"))
      .unionByName(stageCount(s3, 3, "near_dup_keeper"))
      .unionByName(stageCount(s4, 4, "decontam"))
      .unionByName(stageCount(s5, 5, "mixing_quota"))
      .orderBy(col("stage"), col("lang"))
    // ≤ 6·|lang| rows: snapshot, then release the residents
    val snapshot = out.collect()
    corpus.unpersist(blocking = false)
    s2.unpersist(blocking = false)
    evalGrams.unpersist(blocking = false)
    dupDrops.unpersist(blocking = false)
    contaminated.unpersist(blocking = false)
    spark.createDataFrame(
      java.util.Arrays.asList(snapshot: _*), out.schema)
  }

  // -------------- q115: crawl-over-crawl token-distribution drift

  /** L4 — token-distribution DRIFT between two crawl snapshots: the
    * corpus-maintenance signal complementing q106's doc-level diff
    * (same mutation rules, so the two reports describe the SAME crawl
    * pair): per language, token totals and vocabulary sizes of both
    * versions, new/lost token-type counts, and the TOTAL-VARIATION
    * distance between the two token distributions — the number a
    * corpus maintainer thresholds to decide whether downstream
    * artifacts (tokenizer merges q100, LM snapshots q58/q70, mixing
    * weights q54) need a refit after a re-crawl.
    *
    * TV is computed ENGINE-EXACTLY: `TV = Σ|p_i − q_i| / 2 =
    * Σ|n1_i·T2 − n2_i·T1| / (2·T1·T2)` — the numerator is a pure
    * INTEGER sum in `decimal(38,0)` ([[tvNumeratorTerm]]: exact in
    * any order, the micro-unit discipline, and overflow-proof for ANY
    * int64 counts — each cross product of two int64s is < 2^126 <
    * 10^38, so the term never overflows where a raw int64 product
    * fails past T ≈ 10^13 tokens per language, VERDICT r15
    * §wrong), and the single division + `round(·,6)` happens once per
    * language at the very end. No per-token float ever crosses an
    * exchange.
    *
    * Scale posture (100 TB): token counts partial-aggregate map-side
    * before the one (lang, token) exchange; the version join is
    * equi on (lang, token) over count-thin relations (no text); the
    * ≤|lang|-row totals broadcast back; the result is ≤|lang| rows.
    * The decimal terms are exact to the full int64 count range; the
    * summed numerator is bounded by 2·T1·T2, which stays inside
    * decimal(38,0) unless BOTH totals exceed ~7·10^18 — the int64
    * counts themselves overflow first. */
  /** One token's total-variation numerator term `|n1·t2 − n2·t1|`,
    * computed in `decimal(38,0)` so it is EXACT for any int64 inputs:
    * each factor lifts to `decimal(19,0)` (lossless for int64), the
    * product is `decimal(38,0)` (exact — |int64·int64| < 2^126 <
    * 10^38), and the difference of two such products whose true value
    * is bounded by max(n1·t2, n2·t1) < 10^38 cannot overflow the
    * 38-digit carrier. A raw int64 expression here fails past
    * T ≈ 10^13 tokens per language — an ANSI-mode runtime throw (or a
    * silent wrap with ANSI off) where DuckDB promotes to HUGEINT
    * (ADVICE r15). Split out so the spec can drive counts near 2^63
    * through the exact path. */
  private[graft] def tvNumeratorTerm(n1: Column, n2: Column,
      t1: Column, t2: Column): Column = {
    def d(c: Column) = c.cast("decimal(19,0)")
    abs(d(n1) * d(t2) - d(n2) * d(t1))
  }

  def q115TokenDrift(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
    val v1 = base.select(col("lang"), col("text"))
    // the q106 crawl-2 mutation rules, verbatim: %13 dropped, %7
    // revised (" rev2" appended), %11 re-crawled as an exact copy
    val v2 = base.filter(col("doc_id") % 13 =!= 0)
      .select(col("lang"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionByName(base.filter(col("doc_id") % 11 === 0)
        .select(col("lang"), col("text")))
    def tokCounts(v: DataFrame, n: String): DataFrame =
      v.select(col("lang"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("lang"), col("token")).agg(count(lit(1)).as(n))
    // the count-pair relation feeds BOTH rollups (totals and the TV
    // numerator) — persist it or the token counting runs once per
    // consumer (the plan showed 3 full-outer count joins unpersisted)
    val j = tokCounts(v1, "c1").join(tokCounts(v2, "c2"),
        Seq("lang", "token"), "full_outer")
      .select(col("lang"), coalesce(col("c1"), lit(0L)).as("n1"),
        coalesce(col("c2"), lit(0L)).as("n2"))
      .persist(NarrowCacheLevel)
    j.count()
    val totals = j.groupBy(col("lang"))
      .agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"),
        sum(when(col("n1") > 0, 1L).otherwise(0L)).as("vocab_v1"),
        sum(when(col("n2") > 0, 1L).otherwise(0L)).as("vocab_v2"),
        sum(when(col("n1") === 0, 1L).otherwise(0L)).as("n_new_tokens"),
        sum(when(col("n2") === 0, 1L).otherwise(0L)).as("n_lost_tokens"))
    val num = j.join(broadcast(totals.select(col("lang"), col("t1"), col("t2"))),
        "lang")
      .groupBy(col("lang"))
      .agg(sum(tvNumeratorTerm(col("n1"), col("n2"), col("t1"), col("t2")))
        .as("num"))
    val out = totals.join(num, "lang")
      .select(col("lang"), col("t1").as("n_tokens_v1"),
        col("t2").as("n_tokens_v2"), col("vocab_v1"), col("vocab_v2"),
        col("n_new_tokens"), col("n_lost_tokens"),
        round(col("num").cast("double") /
          (col("t1").cast("double") * col("t2").cast("double") * 2.0), 6)
          .as("tv_distance"))
      .orderBy(col("lang"))
    // ≤|lang| rows: snapshot, then release the count relation
    val snapshot = out.collect()
    j.unpersist(blocking = false)
    spark.createDataFrame(
      java.util.Arrays.asList(snapshot: _*), out.schema)
  }

  // ----------- q116: crawl-over-crawl length-distribution drift

  /** L4 — document-LENGTH distribution drift between the same two
    * crawl snapshots as q106/q115: the STRUCTURAL drift axis. A
    * truncating extractor, boilerplate creep, or a changed chunker
    * shifts the length deciles before it moves token-level TV (the
    * vocabulary can stay identical while every document halves), so
    * corpus maintainers watch both. Per (lang, decile 1..9): both
    * versions' corpus sizes, the decile lengths, and the shift.
    *
    * Deciles are LOWER empirical quantiles — `vs[(n−1)·k div 10 + 1]`
    * over the sorted length array — so the whole report is INTEGER
    * arithmetic end to end: no interpolation, no doubles, nothing to
    * round; the cross-engine hash match is exact by construction
    * (the q42 exact-percentile family, minus even its explicit
    * interpolation tree). Like q42, the exact operator holds each
    * group's sorted multiset (one `collect_list` per lang); at 100 TB
    * the same report runs on the GK/t-digest sketch path (q60) —
    * the exact form carries the correctness row. ≤9·|lang| rows. */
  /** The two `(lang, len)` crawl-version relations q116 compares —
    * shared by the exact path ([[q116LengthDrift]], the correctness
    * row) and the sketch path ([[lengthDriftSketch]], the 100 TB
    * form). The q106/q115 crawl-2 mutation rules, verbatim. */
  private def lengthDriftVersions(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val base = docs(spark, dir)
    val v1 = base.select(col("lang"), length(col("text")).cast("long").as("len"))
    val v2 = base.filter(col("doc_id") % 13 =!= 0)
      .select(col("lang"),
        length(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).cast("long").as("len"))
      .unionByName(base.filter(col("doc_id") % 11 === 0)
        .select(col("lang"), length(col("text")).cast("long").as("len")))
    (v1, v2)
  }

  def q116LengthDrift(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = lengthDriftVersions(spark, dir)
    def deciles(v: DataFrame, nName: String, lName: String): DataFrame =
      v.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sort_array(collect_list(col("len"))).as("vs"))
        .select(col("lang"), col("n"), col("vs"),
          explode(typedlit((1 to 9).toList)).as("decile"))
        .select(col("lang"), col("decile").cast("int").as("decile"),
          col("n").as(nName),
          element_at(col("vs"),
            ((col("n") - 1) * col("decile") / 10).cast("long").cast("int") + 1)
            .as(lName))
    deciles(v1, "n_v1", "len_v1")
      .join(deciles(v2, "n_v2", "len_v2"), Seq("lang", "decile"))
      .select(col("lang"), col("decile"), col("n_v1"), col("n_v2"),
        col("len_v1"), col("len_v2"),
        (col("len_v2") - col("len_v1")).as("shift"))
      .orderBy(col("lang"), col("decile"))
  }

  /** The SKETCH-path form of [[q116LengthDrift]] (VERDICT r15
    * §next-7): same report shape — per (lang, decile 1..9) both
    * versions' sizes, decile lengths, and shift — but deciles come
    * from `percentile_approx`'s Greenwald–Khanna sketch instead of a
    * per-language sorted multiset. State per (lang, version) is
    * O(accuracy·log(ε·n)) sketch entries REGARDLESS of corpus size,
    * where the exact form's `collect_list` holds every length of the
    * language in one aggregation buffer — at 100 TB per-language
    * collect is the one non-bounded state this report family had
    * left, and this is its production form.
    *
    * Contract: GK guarantees each reported decile's RANK is within
    * `ε·n` of the target rank, `ε = 1/accuracy` — asserted in
    * PipelineSpec by a broadcast join-back of the ≤9·|lang| report
    * rows against the length relation (counting elements strictly
    * below / at-or-below each reported value). WHEN EACH PATH
    * APPLIES: the exact form carries the oracle correctness row and
    * any corpus whose largest language fits one aggregation buffer;
    * the sketch form is the drift monitor a 100 TB deployment
    * actually schedules, trading ≤ ε rank error for bounded state.
    * Lengths are integers, so the sketch returns genuine corpus
    * lengths (no interpolation) — the report stays integer-exact in
    * VALUE, approximate only in rank. */
  def lengthDriftSketch(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val (v1, v2) = lengthDriftVersions(spark, dir)
    def deciles(v: DataFrame, nName: String, lName: String): DataFrame =
      v.groupBy(col("lang"))
        .agg(count(lit(1)).as(nName),
          percentile_approx(col("len"),
            typedlit((1 to 9).map(_ / 10.0)), lit(accuracy)).as("qs"))
        .select(col("lang"), col(nName),
          posexplode(col("qs")).as(Seq("pos", lName)))
        .select(col("lang"), (col("pos") + 1).cast("int").as("decile"),
          col(nName), col(lName).cast("long").as(lName))
    deciles(v1, "n_v1", "len_v1")
      .join(deciles(v2, "n_v2", "len_v2"), Seq("lang", "decile"))
      .select(col("lang"), col("decile"), col("n_v1"), col("n_v2"),
        col("len_v1"), col("len_v2"),
        (col("len_v2") - col("len_v1")).as("shift"))
      .orderBy(col("lang"), col("decile"))
  }

  // ----------- q117: embedding-centroid drift between re-embeddings

  /** L3/L4 — EMBEDDING-space drift between two corpus versions: the
    * corpus-level index-staleness signal that complements the
    * per-index rebuild triggers ([[pqIndexDriftReport]], IVF
    * occupancy): when a re-crawl re-embeds part of the corpus (model
    * upgrade, re-encode) and deprecates another part, how far did
    * each label's REGION move? Per label: both versions' vector
    * counts, the cosine between the per-label mean vectors, and their
    * norm ratio — a centroid cosine dropping from 1.0 is the "rebuild
    * the coarse index" tripwire BEFORE serving recall degrades.
    *
    * Version-2 derivation (deterministic): `%13` vectors deprecated
    * (the q106 drop rule), `%9` re-embedded through the q51
    * perturbation (the established ±0.2% per-dimension model-shift
    * fixture), everything else unchanged.
    *
    * Cross-engine: means are per-dim `round(avg, 6)` (the
    * [[labelCentroids]] discipline), the cosine/norms are sequential
    * folds over the ≤64-dim ROUNDED mean vectors (the q80
    * discipline), and the two final ratios round once — same shapes
    * the green q31/q51 oracles already prove. Scale posture: two
    * corpus scans partial-aggregating to ≤|label|·64 rows each;
    * everything after is ≤|label|-row arithmetic. */
  def q117EmbeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val v2 = base.filter(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"), col("label"),
        when(col("vec_id") % 9 === 0,
          transform(col("e"), (x, i) =>
            x * (lit(1.0) + lit(0.002) * ((col("vec_id") + i) % 3 - 1))))
          .otherwise(col("e")).as("e"))
    // one scan per version: the vector count per label IS the row
    // count of any single dimension slot in the same exploded
    // aggregate — no second counting pass over the corpus
    def cents(v: DataFrame, nName: String, cName: String): DataFrame =
      v.select(col("label"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("x")), 6).as("cavg"), count(lit(1)).as("cnt"))
        .groupBy(col("label"))
        .agg(collect_list(struct(col("pos"), col("cavg"))).as("tmp"),
          max(when(col("pos") === 0, col("cnt"))).as(nName))
        .select(col("label"), col(nName),
          transform(array_sort(col("tmp")), s => s.getField("cavg")).as(cName))
    cents(base, "n_v1", "c1").join(cents(v2, "n_v2", "c2"), "label")
      .select(col("label").cast("long").as("label"), col("n_v1"), col("n_v2"),
        round(vecCosine(col("c1"), col("c2")), 6).as("centroid_cos"),
        round(graft.functions.TextFunctions.l2Norm(col("c2")) /
          graft.functions.TextFunctions.l2Norm(col("c1")), 6).as("norm_ratio"))
      .orderBy(col("label"))
  }

  // ------------- q114: ANN recall/efficiency sweep (multi-probe knob)

  /** L3 — the IVF TUNING report: recall@5 versus candidates-scanned at
    * probe radius 0 (q31's nprobe=1 home fine cluster) and radius 1
    * (the q51 Hamming-1 multi-probe trade), each measured against the
    * exact full-corpus top-5. This is the knob table a production ANN
    * deployment publishes before fixing nprobe: each probe radius
    * multiplies the candidate list by ~the active bit count while
    * recovering the single-plane SRP splits (a true neighbour lands
    * across one hyperplane with probability ~θ/π per plane), so the
    * deployment reads recall-per-candidate directly instead of
    * guessing. Radius 1 probes strictly contain radius 0's home
    * cluster, so recall is non-decreasing in radius BY CONSTRUCTION —
    * asserted in the spec, visible in the report.
    *
    * Scale posture (100 TB): ONE persisted membership feeds the query
    * set, both candidate joins, and the exact harness; candidate
    * lists stay O(occupancy × probes) per query at ANY corpus size
    * (the corpus-scaled nlist bound — occupancy ≤ 32, probes ≤ 33);
    * the query side is always BROADCAST (≤10 rows, ≤330 probe rows).
    * The exact top-5 is the measurement harness, not the serve path —
    * one corpus scan against the broadcast query set, the offline
    * audit a deployment runs on SAMPLED queries per corpus version.
    * The report is two fixed-width rows. */
  def q114AnnRecallSweep(spark: SparkSession, dir: String): DataFrame =
    annRecallSweep(pqVectors(spark, dir), labelCentroids(spark, dir))

  /** The recall/efficiency sweep HARNESS q114 and q119 share: given a
    * `(vec_id, e)` corpus and a coarse centroid relation, measure
    * recall@5 vs candidates-scanned at probe radius 0 and 1 against
    * the exact full-corpus top-5. Parameterizing the centroid relation
    * is what lets the same harness grade DIFFERENT coarse quantizers —
    * label centroids (q114), Lloyd-trained corpus-derived centroids
    * (q119), or a degenerate single centroid (the pure-SRP baseline
    * the spec uses) — on identical queries and an identical exact
    * answer set. */
  private[operators] def annRecallSweep(e: DataFrame,
      cent: DataFrame, radii: Seq[Int] = Seq(0, 1)): DataFrame = {
    val spark = e.sparkSession
    val members = mapSideFineClusters(e, cent, ClusterTargetOccupancy)
      .persist(CacheLevel)
    members.count()
    val queries = members.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("cluster"), col("mask"))
      // r22: query norm hoisted once, below every scoring join here
      // (the exact corpus scan AND each radius's candidate join)
      .withColumn("nq", vecNorm(col("qe")))
    val byQ = Window.partitionBy(col("qid"))
    // exact full-corpus top-5 per query: the q31 ranking discipline
    // (round-4 cosine desc, vec_id tiebreak — unique, both engines
    // pick one winner)
    val exact = e.withColumn("ne", vecNorm(col("e")))
      .join(broadcast(queries.select(col("qid"), col("qe"), col("nq"))),
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(vecCosinePre(col("qe"), col("nq"), col("e"), col("ne")), 4)
          .as("c4"))
      .withColumn("xr",
        row_number().over(byQ.orderBy(col("c4").desc, col("vec_id"))))
      .filter(col("xr") <= TopK)
      .select(col("qid"), col("vec_id"))
      // EVERY radius scores against it — persist the ≤ queries·k rows
      // or the harness corpus scan runs once per sweep branch
      .persist(NarrowCacheLevel)
    exact.count()
    // probe clusters via the SHARED [[probeExpand]] serve expansion,
    // so this sweep measures byte-for-byte the candidate sets the
    // q118/q120/q121 serve paths scan at each radius. r21: ALL radii
    // ride one tagged query relation through ONE candidate join, one
    // (radius, qid) window, and one aggregation — the per-radius
    // union used to recompute the candidate join twice per radius
    // (n_candidates + top-k branches) inside a single wide job.
    // Per-radius candidate sets, ranks, and counts are unchanged
    // (exact is unique per (qid, vec_id), so the left join is
    // multiplicity-1 and the conditional count equals the former
    // top-k semi-join count).
    val nQueries = queries.count()
    val tagged = radii.map(r => probeExpand(queries, r)
      .select(lit(r).cast("int").as("radius"), col("qid"), col("qe"),
        col("nq"), col("cluster"))).reduce(_ unionByName _)
    val byRQ = Window.partitionBy(col("radius"), col("qid"))
    val agg = members.select(col("vec_id"), col("e"),
        vecNorm(col("e")).as("ne"), col("cluster"))
      .join(broadcast(tagged), Seq("cluster"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("radius"), col("qid"), col("vec_id"),
        round(vecCosinePre(col("qe"), col("nq"), col("e"), col("ne")), 4)
          .as("c4"))
      .withColumn("rk",
        row_number().over(byRQ.orderBy(col("c4").desc, col("vec_id"))))
      .join(exact.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
      .groupBy(col("radius"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("rk") <= TopK && col("hit").isNotNull, 1L)
          .otherwise(0L)).as("n_hits"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    import spark.implicits._
    val out = radii.map { r =>
      val (nCand, nHits) = agg.getOrElse(r, (0L, 0L))
      (r, nQueries, nCand, nHits)
    }.toDF("radius", "n_queries", "n_candidates", "n_hits")
      .select(col("radius").cast("int").as("radius"),
        col("n_queries"), col("n_candidates"),
        round(col("n_candidates").cast("double") / col("n_queries"), 6)
          .as("avg_candidates"),
        col("n_hits"),
        round(col("n_hits").cast("double") / (col("n_queries") * TopK), 6)
          .as("recall_at_5"))
      .orderBy(col("radius"))
    // |radii| fixed-width rows: snapshot, then release the residents
    val snapshot = out.collect()
    members.unpersist(blocking = false)
    exact.unpersist(blocking = false)
    spark.createDataFrame(
      java.util.Arrays.asList(snapshot: _*), out.schema)
  }

  /** L3 — the TRAINED-COARSE recall sweep (VERDICT r15 §next-9):
    * q114's harness with the coarse quantizer swapped from label
    * centroids to [[kMeansCentroids]]' Lloyd-trained, corpus-DERIVED
    * centroids — the form a real deployment runs, because production
    * corpora have no label column (the q61 argument applied to the
    * tuning report). Same exact-top-5 harness, same [[probeExpand]]
    * radii, same report shape, so the two tables read side by side:
    * a deployment compares supervised-proxy routing (q114) against
    * its actual trained router (this) at equal candidate budget —
    * both subdivide to the same target occupancy, so the budget
    * equality is by construction. The spec additionally grades the
    * trained coarse stage against a degenerate single-centroid
    * (pure-SRP) baseline on a clustered fixture: training must buy
    * recall at equal occupancy. Scale posture: q114's, plus
    * kMeansCentroids' bounded O(n·k·d) map-side Lloyd pass (≤64-row
    * broadcast, one corpus scan per iteration). */
  def q119TrainedCoarseSweep(spark: SparkSession, dir: String): DataFrame = {
    val e = pqVectors(spark, dir)
    annRecallSweep(e, kMeansCentroids(e))
  }

  /** L3 — the COMPLETE knob table: q114's recall/efficiency sweep
    * extended to probe radius 2, every radius [[probeExpand]] (and
    * therefore every serve path) supports. The radius-2 row adds the
    * b·(b−1)/2 two-bit flips — the diminishing-returns end of the
    * multi-probe trade (the [[hammingProbes]] scaladoc's ~0.1%
    * residual two-plane splits are exactly what it buys), so the
    * table now brackets the knob from both sides: a deployment reads
    * where recall-per-candidate flattens and stops probing there.
    * Same exact-top-5 harness, centroids, and report shape as q114 —
    * the rows read side by side, and radii 0/1 reproduce q114's rows
    * identically (same persisted harness, same expansion). Candidate
    * bound stays O(occupancy × probes) = O(32 · (1 + b + b²/2)) per
    * query at any corpus size, query side always broadcast. */
  def q128RecallSweepR2(spark: SparkSession, dir: String): DataFrame = {
    val e = pqVectors(spark, dir)
    annRecallSweep(e, labelCentroids(spark, dir), Seq(0, 1, 2))
  }

  /** Number of output shards for the q122 export manifest. Bench-sized
    * here; a production export scales the count to a target shard SIZE
    * (e.g. ~1 GB of packed tokens), which keeps per-shard row counts
    * bounded — the plan shape below is shard-count-agnostic. */
  private val NumShards = 8L

  /** Pipeline — deterministic global shuffle + shard-export manifest:
    * the LAST stage of a training-data pipeline. Every document gets a
    * portable md5-derived shuffle key (`shard:doc_id` — stable across
    * engines, machines, partitionings, and reruns); shard = key mod
    * [[NumShards]], within-shard order = (key, doc_id). That IS the
    * industry-standard distributed shuffle for training order: a
    * pseudo-random permutation computed as one hash exchange + one
    * in-partition sort, no global sort, no driver state — the exact
    * plan a 100 TB export runs, just with a scaled shard count.
    *
    * The manifest row per shard carries what a downstream trainer (or
    * a re-run audit) needs: document count, total whitespace tokens
    * (shards are token-balanced in expectation by hash uniformity —
    * law of large numbers, no bin-packing pass needed), the head
    * document, and an ORDER-SENSITIVE checksum
    * `Σ pos·(key mod P) mod P` — any permutation of the shard's
    * within-order changes it, so two exports can be compared for
    * byte-order equality from their manifests alone. The checksum term
    * stays exact for pos < 2^32 (2^31·2^32 < 2^63) — production shard
    * sizing keeps per-shard rows far below that — and the SUM is
    * carried in decimal(38,0) (the q115 discipline), overflow-free for
    * any shard size. */
  /** The export shuffle key: portable md5 hash of `shard:doc_id` —
    * THE one derivation shared by batch q122/q125 and the streaming
    * shard router ([[graft.streaming.Export]]), so a stream-ingested
    * shard and a batch re-shard of the same corpus route every
    * document identically. */
  def shardKey(idCol: Column): Column = shardKey(idCol, 0)

  /** Seeded export shuffle key — one independent deterministic
    * permutation (and shard assignment) per training EPOCH: seed 0 is
    * the historical `shard:doc_id` derivation bit-for-bit (q122/q125,
    * the streaming router, and shards at rest all stay unchanged);
    * seed s > 0 keys on `shard<s>:doc_id`, giving a fresh md5-
    * independent draw. Same portability contract as every hash here. */
  def shardKey(idCol: Column, seed: Int): Column =
    portableHash(concat(
      lit(if (seed == 0) "shard:" else s"shard$seed:"),
      idCol.cast("string")))

  /** The temperature-mix membership draw: portable md5 hash of
    * `temp:doc_id` reduced to micro-units — THE one derivation shared
    * by batch q123 and the streaming mix gate
    * ([[graft.streaming.Curation.mixGate]]), so an ingest-time mix
    * decision and a batch re-mix of the same corpus agree per
    * document. */
  def mixKey(idCol: Column): Column =
    pmod(portableHash(concat(lit("temp:"), idCol.cast("string"))),
      lit(1000000L))

  def q122ShardManifest(spark: SparkSession, dir: String): DataFrame =
    shardManifestOf(docs(spark, dir), "doc_id", "text", NumShards.toInt)

  /** The corpus-parameterized q122 manifest derivation — ONE
    * definition shared by the oracle query, [[Layout.writeShards]]'
    * manifest sidecar, and [[Layout.appendShards]]' reconcile spec,
    * so an export's stored manifest can never drift from the audit
    * query's. Positions are the (key, id) within-shard order; the
    * checksum is the order-sensitive `Σ pos·(key mod P) mod P` carried
    * in decimal(38,0). */
  private[graft] def shardManifestOf(d0: DataFrame, idCol: String,
      textCol: String, numShards: Int): DataFrame = {
    val d = d0.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("n_toks"),
      shardKey(col(idCol)).as("sk"))
    val assigned = d
      .withColumn("shard", pmod(col("sk"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("sk"), col("doc_id"))))
    assigned
      .withColumn("term", pmod(col("pos") * pmod(col("sk"), lit(P)), lit(P)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        (sum(col("term").cast("decimal(38,0)")) % lit(P)).cast("long")
          .as("order_checksum"),
        max(when(col("pos") === 1, col("doc_id"))).as("head_doc_id"))
      .orderBy(col("shard"))
  }

  /** L2/L4 — NEAR-DUP GATE CAPACITY AUDIT (q142): the streaming
    * ingest gate's near-dup stage collapses on a 16-bit SimHash
    * ([[graft.streaming.Dedup.nearDupSignature]] — THE shared
    * derivation, so this audit measures exactly the key the gate
    * keys), and its scaladoc documents the 2^16 signature space as
    * the capacity knob; this query turns that caveat into MEASURED
    * numbers a deployment sizes the horizon from. Per signature
    * occupancy class (distinct CANONICAL digests per signature —
    * same-digest docs are the exact stage's rightful drops, so the
    * near stage's error unit is the digest): signature count, doc
    * count, and `n_false_drops` = Σ (digests − 1) — the distinct
    * documents a keep-first gate would WRONGLY collapse if the whole
    * corpus shared one horizon. The audit's honest finding on the
    * driver corpus: collisions are STRUCTURAL, not birthday — the
    * synthetic documents draw from a shared token distribution, so
    * bit votes concentrate and occupancy reaches 60+ digests per
    * signature at sf0.1 (~60% of distinct docs would collapse under
    * a full-corpus horizon, vs the ~2% a 5k²/2·2^16 birthday bound
    * predicts). That gap is exactly why a deployment runs THIS audit
    * on its own corpus instead of trusting the birthday arithmetic:
    * the gate is safe only when the HORIZON keeps in-horizon distinct
    * documents small relative to the measured (not theoretical)
    * collision curve — or when the signature widens / the gate is
    * reserved for streams with genuine near-dup density (where
    * collapse is the point). One hash exchange on the signature +
    * a ≤|classes|-row rollup. */
  def q142GateCapacity(spark: SparkSession, dir: String): DataFrame = {
    val c = docs(spark, dir).select(
      md5(graft.functions.TextFunctions.canonicalText(col("text"))
        .cast("binary")).as("digest"),
      graft.streaming.Dedup.nearDupSignature(col("text")).as("sig"))
    c.groupBy(col("sig"))
      .agg(count_distinct(col("digest")).as("nd"), count(lit(1)).as("ndocs"))
      .groupBy(col("nd"))
      .agg(count(lit(1)).as("n_signatures"),
        sum(col("ndocs")).as("n_docs"),
        sum(col("nd") - 1).as("n_false_drops"))
      .select(col("nd").cast("int").as("digests_per_sig"),
        col("n_signatures"), col("n_docs"), col("n_false_drops"))
      .orderBy(col("digests_per_sig"))
  }

  /** The signature widths [[q143WidthSweep]] prices (16 = the gate's
    * q28-aligned default; 31 = the portableHashMod ceiling). */
  private[graft] val GateWidths = Seq(16, 20, 24, 31)

  /** L2/L4 — the gate signature WIDTH knob table (q143): q142
    * measured the 16-bit key's false-collapse curve and found it
    * structural (far above birthday on vocabulary-concentrated
    * corpora); this table prices the fix — widening the signature
    * ([[graft.streaming.Dedup.nearDupSignatureAt]]'s `bits`) — on the
    * two axes the gate trades: per width, the distinct canonical
    * documents that would still FALSELY collapse under a full-corpus
    * horizon (q142's metric at that width) against the share of
    * PLANTED lightly-edited copies (the q50/q111 "+ extra token tail"
    * mutation on the %11 stratum) the gate still catches. The
    * q114/q131/q136 knob-table pattern applied to the gate: a
    * deployment reads where false collapse dies while edited-copy
    * recall survives, fixes `nearDupBits` there, and the same
    * [[graft.expressions.SimhashBits]] vote fold serves it. All
    * counts exact integers (a digest determines its signature, so
    * Σ distinct-digests-per-signature IS the distinct digest total);
    * the two shares are per-row round-6 of integer ratios. Planted
    * collapse needs NO join: twin text is a derivation of the base
    * row, so the pair compares inside one projection. Per width: one
    * signature-keyed exchange + two bounded aggregates. */
  def q143WidthSweep(spark: SparkSession, dir: String): DataFrame = {
    // the width-w signature is the LOW w BITS of the widest one
    // (per-bit votes don't see the width — the property the spec
    // asserts), so the expensive canonical-split-hash-vote fold runs
    // ONCE at the 31-bit ceiling and every narrower width is a mask
    // over the persisted per-doc relation — one corpus scan for the
    // false-collapse side and one for the planted side, instead of
    // two per width (review r18: 6 avoided corpus scans here, the
    // difference between 8 and 2 at the 100 TB posture this section
    // advertises)
    val widest = GateWidths.max
    def maskOf(bits: Int) = lit((1L << bits) - 1)
    val base = docs(spark, dir).select(col("doc_id"), col("text"))
    val c = base.select(
      md5(graft.functions.TextFunctions.canonicalText(col("text"))
        .cast("binary")).as("digest"),
      graft.streaming.Dedup.nearDupSignatureAt(col("text"), widest)
        .as("sig")).persist(NarrowCacheLevel)
    c.count()
    val planted = base.filter(col("doc_id") % 11 === 0)
      .select(
        graft.streaming.Dedup.nearDupSignatureAt(col("text"), widest)
          .as("sa"),
        graft.streaming.Dedup.nearDupSignatureAt(
          concat(col("text"), lit(" extra token tail")), widest).as("sb"))
      .persist(NarrowCacheLevel)
    planted.count()
    // r22 (the q144 merge, VERDICT r21 §next-5): every width's masked
    // signature rides ONE exploded (bits, msig) relation through a
    // single groupBy chain — one exchange of |widths|·|c| thin rows
    // instead of |widths| separate aggregation jobs over the cache —
    // and the planted side is ONE aggregate with a conditional column
    // per width (the q144 plantedAggs shape). Per-width keys,
    // distinct-digest counts, and the derived shares are unchanged.
    val widthRel = c.select(col("digest"),
      explode(array(GateWidths.map(bits =>
        struct(lit(bits).as("bits"),
          col("sig").bitwiseAND(maskOf(bits)).as("msig"))): _*)).as("w"))
      .select(col("digest"), col("w.bits").as("bits"), col("w.msig").as("msig"))
    val falseRows = widthRel.groupBy(col("bits"), col("msig"))
      .agg(count_distinct(col("digest")).as("nd"))
      .groupBy(col("bits"))
      .agg(sum(col("nd")).as("n_base_digests"),
        sum(col("nd") - 1).as("n_false_drops"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plantedAggs = count(lit(1)).as("n_planted") +:
      GateWidths.map { bits =>
        sum((col("sa").bitwiseAND(maskOf(bits))
          === col("sb").bitwiseAND(maskOf(bits)))
          .cast("long")).as(s"pw$bits")
      }
    val plantedRow = planted.agg(plantedAggs.head, plantedAggs.tail: _*).head()
    val nPlanted = plantedRow.getLong(0)
    import spark.implicits._
    val out = GateWidths.zipWithIndex.map { case (bits, wi) =>
      val (nBase, nFalse) = falseRows.getOrElse(bits, (0L, 0L))
      (bits, nBase, nFalse, nPlanted, plantedRow.getLong(1 + wi))
    }.toDF("bits0", "n_base_digests", "n_false_drops", "n_planted",
        "n_planted_collapsed")
      .select(col("bits0").cast("int").as("bits"),
        col("n_base_digests"), col("n_false_drops"),
        col("n_planted"), col("n_planted_collapsed"),
        round(col("n_false_drops").cast("double") / col("n_base_digests"), 6)
          .as("false_drop_share"),
        round(col("n_planted_collapsed").cast("double") / col("n_planted"), 6)
          .as("planted_recall"))
      .orderBy(col("bits"))
    // 4 report rows: snapshot, release the two per-doc residents
    snapshotAndFree(out, c, planted)
  }

  /** The (bands, bandBits) configurations [[q144BandedGateSweep]]
    * prices. (1, 16) is the single-signature gate's default width —
    * the row that reconciles with q143's bits = 16 row (spec-pinned);
    * (2, 8) splits the SAME 16 bits into the OR-banding form; (2, 15)
    * is [[graft.streaming.Dedup.dedupNearBanded]]'s default; (3, 10)
    * and (4, 7) walk the recall-vs-collapse trade further. Every
    * config fits the portableHashMod 31-bit ceiling. */
  private[graft] val GateBandConfigs =
    Seq((1, 16), (2, 8), (2, 15), (3, 10), (4, 7))

  /** L2/L4 — the BANDED gate knob table (q144, VERDICT r18 §next-1):
    * q143 proved the single-signature ingest gate is a low-recall
    * instrument at EVERY width (planted edited-copy recall ≤ 0.5 on
    * the driver corpus), and [[graft.streaming.Dedup.dedupNearBanded]]
    * is the recall lever — OR-banding, drop when ANY `bandBits`-bit
    * band was seen. This table prices its (bands, bandBits) points on
    * the same two axes as q143, so the lever ships WITH its audit
    * (the q142→q143→knob discipline): per config,
    *
    *  - false collapse at a full-corpus horizon, by the ORDER-FREE
    *    one-hop rule: a distinct canonical digest collapses when ANY
    *    of its bands is shared with a SMALLER digest. Exact for
    *    bands = 1 (every non-minimum digest of a signature group has
    *    a smaller sharer — reconciles with q143's Σ(nd−1), asserted
    *    in the spec); for bands > 1 an upper bound on keep-first
    *    drops (a doc dropped at one band never registers its other
    *    bands, so some one-hop collisions never materialize — the
    *    honest direction for a capacity audit to err);
    *  - planted edited-copy recall: the q143 "+ extra token tail"
    *    mutation on the %11 stratum collapses iff ANY band survives
    *    the edit (pairwise, order-free, exact).
    *
    * A deployment reads where recall rises faster than false collapse
    * (the OR-banding S-curve), fixes `(nearDupBands, nearDupBits)`
    * there, and [[graft.streaming.Curation.ingestGate]] serves exactly
    * that config with one state operator per band and a per-band
    * history bootstrap ([[graft.streaming.Dedup.historicalNearBandKeys]]).
    *
    * Plan shape: the per-bit votes don't see the width (q143's
    * masking property), so the expensive canonical-split-hash-vote
    * fold runs ONCE at the 31-bit ceiling per side — every config's
    * band keys are shift/mask column math over the two persisted
    * per-doc relations; per config one (b, key) exchange + a bounded
    * digest rollup. Never all-pairs, never a join wider than the
    * band-group relation. */
  def q144BandedGateSweep(spark: SparkSession, dir: String): DataFrame = {
    val widest = 31
    val base = docs(spark, dir).select(col("doc_id"), col("text"))
    // one row per DISTINCT canonical digest (the gate's error unit —
    // same-digest copies are the exact stage's rightful drops); the
    // signature is digest-determined, so the pair-distinct is a
    // digest-distinct
    val c = base.select(
        md5(graft.functions.TextFunctions.canonicalText(col("text"))
          .cast("binary")).as("digest"),
        graft.streaming.Dedup.nearDupSignatureAt(col("text"), widest)
          .as("sig"))
      .distinct().persist(NarrowCacheLevel)
    c.count()
    val planted = base.filter(col("doc_id") % 11 === 0)
      .select(
        graft.streaming.Dedup.nearDupSignatureAt(col("text"), widest)
          .as("sa"),
        graft.streaming.Dedup.nearDupSignatureAt(
          concat(col("text"), lit(" extra token tail")), widest).as("sb"))
      .persist(NarrowCacheLevel)
    planted.count()
    // r21 (the bandingSweepOver merge): every config's shift/mask band
    // keys ride ONE (cfg, b, k) relation through one groupBy-join
    // chain, and the planted-recall side is one aggregate with a
    // conditional column per config — 2 report jobs instead of the
    // 5-branch union's per-config exchanges. Per-config keys, group
    // minima, and counts are unchanged.
    def bandKeyOf(sig: Column, b: Int, bits: Int): Column =
      shiftright(sig, b * bits).bitwiseAND(lit((1L << bits) - 1))
    val perCfg = GateBandConfigs.zipWithIndex.map { case ((bands, bits), ci) =>
      array((0 until bands).map(b =>
        struct(lit(ci).as("cfg"), lit(b).as("b"),
          bandKeyOf(col("sig"), b, bits).as("k"))): _*)
    }
    val bandRel = c.select(col("digest"), explode(concat(perCfg: _*)).as("e"))
      .select(col("digest"), col("e.cfg").as("cfg"), col("e.b").as("b"),
        col("e.k").as("k"))
    val grpMin = bandRel.groupBy(col("cfg"), col("b"), col("k"))
      .agg(min(col("digest")).as("mn"))
    val falseRows = bandRel.join(grpMin, Seq("cfg", "b", "k"))
      .groupBy(col("cfg"), col("digest"))
      .agg(max(when(col("mn") < col("digest"), 1L).otherwise(0L)).as("coll"))
      .groupBy(col("cfg"))
      .agg(count(lit(1)).as("n_base_digests"),
        sum(col("coll")).as("n_false_collapsed"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plantedAggs = count(lit(1)).as("n_planted") +:
      GateBandConfigs.zipWithIndex.map { case ((bands, bits), ci) =>
        sum(when((0 until bands)
            .map(b => bandKeyOf(col("sa"), b, bits) === bandKeyOf(col("sb"), b, bits))
            .reduce(_ || _), 1L).otherwise(0L)).as(s"pc$ci")
      }
    val plantedRow = planted.agg(plantedAggs.head, plantedAggs.tail: _*).head()
    val nPlanted = plantedRow.getLong(0)
    import spark.implicits._
    val out = GateBandConfigs.zipWithIndex.map { case ((bands, bits), ci) =>
      val (nBase, nFalse) = falseRows.getOrElse(ci, (0L, 0L))
      (bands, bits, nBase, nFalse, nPlanted, plantedRow.getLong(1 + ci))
    }.toDF("bands0", "band_bits0", "n_base_digests", "n_false_collapsed",
        "n_planted", "n_planted_collapsed")
      .select(col("bands0").cast("int").as("bands"),
        col("band_bits0").cast("int").as("band_bits"),
        col("n_base_digests"), col("n_false_collapsed"),
        round(col("n_false_collapsed").cast("double")
          / col("n_base_digests"), 6).as("false_collapse_share"),
        col("n_planted"), col("n_planted_collapsed"),
        round(col("n_planted_collapsed").cast("double")
          / col("n_planted"), 6).as("planted_recall"))
      .orderBy(col("bands"), col("band_bits"))
    // 5 report rows: snapshot, release the two per-doc residents
    snapshotAndFree(out, c, planted)
  }

  /** L5 — INCREMENTAL-EXPORT manifest algebra (q141, the oracle face
    * of [[Layout.appendShards]]): split the corpus into two ingest
    * waves (`doc_id % 2` — "yesterday's export" and "today's
    * append"), and report per shard BOTH manifests a deployment
    * compares — the APPENDED order's (wave ASC, then the (key, id)
    * within-wave order, positions continuing across the wave
    * boundary: exactly the bytes appendShards lays down and the
    * arithmetic its sidecar merge computes) and the FULL re-export's
    * (q122's (key, id) order). The row certifies cross-engine the
    * whole append contract: membership columns (n_docs, n_tokens) are
    * wave-split-invariant — hash routing doesn't care when a document
    * arrived — the head document is the first wave's, and the two
    * order-sensitive checksums differ precisely because an append
    * preserves resident bytes instead of re-shuffling them
    * (`order_equal` makes the comparison a column). ExportSpec ties
    * the implementation to this oracle: appendShards' merged sidecar
    * on the same half-then-half split equals this query's appended
    * checksums bit-for-bit. Same ONE hash exchange as q122, two
    * in-partition sorts. */
  def q141AppendManifest(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"),
        shardKey(col("doc_id")).as("sk"))
      .withColumn("wave", (col("doc_id") % 2).cast("int"))
      .withColumn("shard", pmod(col("sk"), lit(NumShards)).cast("int"))
    val byShard = Window.partitionBy(col("shard"))
    val both = d
      .withColumn("pos_a", row_number().over(
        byShard.orderBy(col("wave"), col("sk"), col("doc_id"))))
      .withColumn("pos_f", row_number().over(
        byShard.orderBy(col("sk"), col("doc_id"))))
    both
      .withColumn("term_a", pmod(col("pos_a") * pmod(col("sk"), lit(P)), lit(P)))
      .withColumn("term_f", pmod(col("pos_f") * pmod(col("sk"), lit(P)), lit(P)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        (sum(col("term_a").cast("decimal(38,0)")) % lit(P)).cast("long")
          .as("checksum_appended"),
        (sum(col("term_f").cast("decimal(38,0)")) % lit(P)).cast("long")
          .as("checksum_full"),
        max(when(col("pos_a") === 1, col("doc_id"))).as("head_appended"),
        max(when(col("pos_f") === 1, col("doc_id"))).as("head_full"))
      .withColumn("order_equal",
        col("checksum_appended") === col("checksum_full"))
      .orderBy(col("shard"))
  }

  /** L5 — the STANDING manifest-reconcile audit's oracle face (q146,
    * VERDICT r18 §next-4): materialize a real export at rest from the
    * corpus (writeShards + its manifest sidecar), plant the streaming
    * writer's SECOND replay window — the `%17` batch appends AGAIN
    * into BOTH bytes and manifest, the crash-after-manifest-before-
    * marker shape whose counts and checksums reconcile CLEANLY — and
    * run [[Layout.reconcileShards]] over the bytes. The returned
    * audit rows certify cross-engine the whole detection story:
    * `counts_equal` and `checksum_equal` are TRUE everywhere (the
    * consistent window is invisible to them, exactly as the Export
    * scaladoc documents), and `ids_unique` is FALSE on precisely the
    * shards holding a replayed document — the duplicate-aware column
    * is the only catch, and [[Layout.compactShards]] is the repair
    * (ExportSpec closes that loop). The DuckDB twin derives every
    * column from `documents` alone through the q141 position algebra
    * (replayed copies as a second wave, positions continuing), so a
    * hash match proves the bytes at rest, the merged sidecar, AND the
    * audit's recomputation all agree with the declared algebra.
    *
    * Cost: the export materialization is two writeShards-shaped
    * writes (corpus + the %17 delta) paid per call — the audit itself
    * is ONE read of the export + one shard exchange, the price a
    * deployment schedules between appends and trainer reads. */
  def q146ExportReconcile(spark: SparkSession, dir: String): DataFrame = {
    // a UNIQUE path per call (review r19: a fixed per-dir path let an
    // overlapping gate + bench run interleave deletes mid-reconcile,
    // and left a corpus copy in /tmp per sf) — the audit result is a
    // bounded LocalRelation snapshot, so the export deletes after
    val path = java.nio.file.Files
      .createTempDirectory("graft_reconcile_").toString + "/exp"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val d = docs(spark, dir).select(col("doc_id"), col("text"))
      Layout.writeShards(d, "doc_id", path, NumShards.toInt, Some("text"))
      // the planted replay: window (b) — one batch appended into BOTH
      // bytes and manifest (consistent, so only distinct-ids can see it)
      Layout.appendShards(d.filter(col("doc_id") % 17 === 0),
        "doc_id", "text", path, NumShards.toInt)
      Layout.reconcileShards(spark, path, "doc_id", "text")
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(path)
        .getParent, true)
      ()
    }
  }

  /** Pipeline — CURRICULUM shard ordering: q122's deterministic
    * export with a curriculum stage — within each shard, documents
    * order by (length tier ASC, shuffle key, id), the
    * shortest-first curriculum a staged training schedule reads
    * (length is the classic difficulty proxy; any integer tier column
    * substitutes without a plan change). Shard ASSIGNMENT is
    * untouched — q122's hash membership, so shards stay
    * token-balanced in expectation and a curriculum re-export moves
    * zero bytes between shards; only the within-shard ORDER changes,
    * which the order-sensitive checksum (q122's
    * `Σ pos·(key mod P) mod P` in decimal(38,0)) certifies. Manifest
    * per shard adds the tier span (`n_tiers`, `first_tier`,
    * `last_tier`): a trainer validates "easy first" from the manifest
    * alone. Same ONE hash exchange + in-partition sort as q122 — the
    * curriculum costs one extra leading sort key, nothing else. */
  def q137CurriculumManifest(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"),
      shardKey(col("doc_id")).as("sk"))
      .withColumn("tier",
        least(lit(9L), expr("n_toks DIV 64")).cast("int"))
    val assigned = d
      .withColumn("shard", pmod(col("sk"), lit(NumShards)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("tier"), col("sk"), col("doc_id"))))
    assigned
      .withColumn("term", pmod(col("pos") * pmod(col("sk"), lit(P)), lit(P)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col("tier")).as("n_tiers"),
        min(col("tier")).as("first_tier"),
        max(col("tier")).as("last_tier"),
        (sum(col("term").cast("decimal(38,0)")) % lit(P)).cast("long")
          .as("order_checksum"))
      .orderBy(col("shard"))
  }

  /** Pipeline — EPOCH orderings: the q122 manifest for training epochs
    * 0 and 1 side by side, each from its own seeded shuffle key
    * ([[shardKey]](id, seed)) — the multi-epoch training contract: a
    * trainer re-reading the corpus must see an INDEPENDENT
    * deterministic permutation per epoch, reproducible from the seed
    * alone (no stored permutation, no driver state — re-deriving
    * epoch k's order anywhere yields the same bytes). Epoch 0 is
    * bit-for-bit q122's manifest (the shared derivation — asserted in
    * the spec); epoch 1 re-draws both assignment and order. The spec
    * pins the independence evidence: global doc/token totals match
    * across epochs while per-shard membership and checksums move.
    * Same one-exchange-per-epoch plan as q122. */
  def q129EpochOrders(spark: SparkSession, dir: String): DataFrame = {
    def manifest(seed: Int): DataFrame = {
      val d = docs(spark, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"),
        shardKey(col("doc_id"), seed).as("sk"))
      d.withColumn("shard", pmod(col("sk"), lit(NumShards)).cast("int"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("sk"), col("doc_id"))))
        .withColumn("term", pmod(col("pos") * pmod(col("sk"), lit(P)), lit(P)))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          (sum(col("term").cast("decimal(38,0)")) % lit(P)).cast("long")
            .as("order_checksum"))
        .select(lit(seed).as("epoch"), col("shard"), col("n_docs"),
          col("n_tokens"), col("order_checksum"))
    }
    manifest(0).unionByName(manifest(1))
      .orderBy(col("epoch"), col("shard"))
  }

  /** Pipeline — sequence packing WITHIN export shards: [[q59SequencePacking]]'s
    * concat-and-chunk accounting composed with [[q122ShardManifest]]'s
    * deterministic shuffle — documents concatenate in each shard's
    * shuffled (key, id) order and chunk into fixed 512-token training
    * sequences, which is the order a trainer actually reads. Per-shard
    * report: docs, tokens, sequence count `ceil(tokens/512)`,
    * boundary-crossing docs, and utilization (tokens over sequence
    * capacity — the tail sequence is the only padding under
    * concat-and-chunk).
    *
    * Scale note vs q59: q59's GLOBAL doc-id order needs the two-level
    * prefix scan to avoid a single-task window; here the prefix sum is
    * per-shard (`Window.partitionBy(shard)`) and the SHARD is the
    * distributed unit — production sizing bounds each shard (~1 GB),
    * and the shard count grows with the corpus, so per-shard cumsum
    * tasks stay bounded and parallelism scales with data. Same single
    * hash exchange as q122. */
  def q125PackedShards(spark: SparkSession, dir: String): DataFrame = {
    val seqTokens = 512L
    val d = docs(spark, dir).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"),
      shardKey(col("doc_id")).as("sk"))
      .withColumn("shard", pmod(col("sk"), lit(NumShards)).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("sk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("fin", sum(col("n_toks")).over(w))
      .withColumn("crosses",
        expr(s"(fin - n_toks) div $seqTokens") =!= expr(s"(fin - 1) div $seqTokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        expr(s"(max(fin) + ${seqTokens - 1}) div $seqTokens").as("n_seqs"),
        sum(when(col("crosses"), 1L).otherwise(0L)).as("n_crossing"),
        round(sum(col("n_toks")).cast("double") /
          (expr(s"(max(fin) + ${seqTokens - 1}) div $seqTokens") * seqTokens),
          6).as("utilization"))
      .orderBy(col("shard"))
  }

  /** Pipeline — temperature-based corpus mixing (the multilingual
    * α-sampling of XLM-R / mT5: sample language l with probability
    * ∝ p_l^α): per-language keep rate `(n_min/n_l)^(1−α)`, which
    * yields kept counts ∝ n_l^α — α = 1 keeps the natural
    * distribution, α = 0 is [[q54CorpusMix]]'s uniform-to-min mix,
    * and the α = 1/2 exposed here is the balanced middle. α = 1/2 is
    * the one oracle-checkable temperature: its rate is a single
    * `sqrt`, which IEEE 754 REQUIRES correctly rounded (identical
    * doubles in Spark and DuckDB), where a general `pow` carries no
    * such guarantee and a last-ulp divergence could flip a
    * micro-threshold compare. The rate converts to integer micro-units
    * (round-6 → ×10^6, the established cross-engine idiom) and
    * membership is the portable md5 hash of `temp:doc_id` — map-side
    * verdict + partial-aggregated rollup, one scan at 100 TB, exactly
    * q54's shape with the knob added. */
  def q123TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
    val minRel = counts.agg(min(col("n_lang")).as("n_min"))
    docs(spark, dir)
      .join(broadcast(counts), "lang").crossJoin(broadcast(minRel))
      .withColumn("thr", round(round(
        sqrt(col("n_min").cast("double") / col("n_lang")), 6) * 1e6, 0)
        .cast("long"))
      .withColumn("keep", mixKey(col("doc_id")) < col("thr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        max(col("thr")).as("keep_rate_micro"))
      .orderBy(col("lang"))
  }

  /** Pipeline — token-BUDGET temperature mixing: the production form
    * of the mixing ask — "a B-token training mix at temperature α
    * from this corpus" — where q123 fixes only the SHAPE. Per
    * language: token total T_l, a sqrt-temperature share
    * q_l ∝ √T_l (α = 1/2, the oracle-exact temperature — see q123),
    * and keep rate `min(1, B·q_l/T_l)` for a budget B = 7/8 of total
    * tokens (large enough that a low-resource stratum saturates — the
    * cap protects it — while the oversampled head is genuinely cut), converted to round-6 micro-units. Engine-exactness: each
    * √T_l rounds to an INTEGER micro value first and the share
    * denominator is the integer sum of those — no float sum over
    * languages (whose order IEEE does not fix) ever forms; the two
    * remaining divisions are single correctly-rounded IEEE ops in an
    * identical expression shape both engines. The membership draw is
    * [[mixKey]] — the SAME per-document draw as q123, so mixes are
    * NESTED (consistent sampling): raising any language's rate can
    * only grow its kept set, a mix re-run at a new budget reuses
    * every previously-kept document it can, and the q123/q126 kept
    * sets relate by rate order per language (asserted in the spec).
    * A saturated stratum (rate capped at 1) leaves its unused budget
    * unredistributed — single-shot semantics; the waterfilling
    * variant iterates this report's ≤|lang| rows driver-side, the
    * bounded-collect discipline of [[kMeansCentroids]].
    *
    * Scale shape: q54/q123's — one rollup to ≤|lang| rows, broadcast
    * rates join-back, map-side verdict, partial-aggregated report. */
  def q126TokenBudgetMix(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("lang"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
    val totals = d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_l"), sum(col("n_toks")).as("t_lang"))
      .withColumn("sqrt_micro",
        round(round(sqrt(col("t_lang").cast("double")), 6) * 1e6, 0).cast("long"))
    val global = totals.agg(sum(col("sqrt_micro")).as("denom"),
      sum(col("t_lang")).as("t_total"))
    val rates = totals.crossJoin(broadcast(global))
      .withColumn("b_total", expr("(t_total * 7) div 8"))
      .withColumn("rate_micro",
        round(round(least(lit(1.0),
          (col("b_total").cast("double") / col("t_lang")) *
            (col("sqrt_micro").cast("double") / col("denom"))), 6) * 1e6, 0)
          .cast("long"))
      .select(col("lang"), col("n_docs_l"), col("t_lang"), col("rate_micro"))
    d.join(broadcast(rates), "lang")
      .withColumn("keep", mixKey(col("doc_id")) < col("rate_micro"))
      .groupBy(col("lang"))
      .agg(max(col("n_docs_l")).as("n_docs"),
        max(col("t_lang")).as("n_tokens"),
        max(col("rate_micro")).as("rate_micro"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_toks")).otherwise(0L)).as("tokens_kept"))
      .orderBy(col("lang"))
  }

  /** Chunk width for the q127 report. Bench-sized (the corpus' docs
    * run 10–90 tokens); a production context window (2048/4096/8192)
    * substitutes without changing the plan. */
  private val ChunkTokens = 64L

  /** Pipeline — long-document CHUNKING: cut every document longer than
    * the training context into `ceil(n/64)` fixed-width chunks — the
    * complement of packing ([[q59SequencePacking]]/[[q125PackedShards]]
    * concatenate SHORT docs; chunking cuts LONG ones; together they
    * fit any corpus to fixed training sequences). Chunk rows
    * materialize via a map-side `explode(sequence(...))` — Generate
    * over per-row arithmetic, no join, no shuffle before the
    * ≤|lang|-row rollup. Report per language: docs, split docs, chunk
    * counts, full (width-exact) chunks, tokens, and mean chunk fill —
    * the tail-waste metric that decides whether chunk boundaries
    * should instead ride the packing stage at a given context width. */
  def q127DocChunking(spark: SparkSession, dir: String): DataFrame = {
    docs(spark, dir).select(col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("nc", expr(s"(n_toks + ${ChunkTokens - 1}) div $ChunkTokens"))
      .withColumn("ci", explode(sequence(lit(0L), col("nc") - 1)))
      .withColumn("c_toks",
        least(lit(ChunkTokens), col("n_toks") - col("ci") * ChunkTokens))
      .groupBy(col("lang"))
      .agg(sum(when(col("ci") === 0, 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("ci") === 0 && col("nc") > 1, 1L).otherwise(0L))
          .as("n_split_docs"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("c_toks") === ChunkTokens, 1L).otherwise(0L))
          .as("n_full_chunks"),
        sum(col("c_toks")).as("n_tokens"),
        round(sum(col("c_toks")).cast("double") /
          (count(lit(1)) * ChunkTokens), 6).as("chunk_fill"))
      .orderBy(col("lang"))
  }

  /** Waterfilled budget rates — the redistribution [[q126TokenBudgetMix]]'s
    * single-shot cap leaves on the table: when a stratum saturates
    * (its whole token mass fits its budget share), its UNUSED budget
    * re-splits among the unsaturated strata ∝ their weights, repeated
    * until no new stratum saturates (≤ |strata| iterations — each pass
    * saturates at least one or terminates). Pure driver-side
    * arithmetic over the ≤|lang| report rows, the bounded-collect
    * discipline of [[kMeansCentroids]]; the result feeds
    * [[graft.streaming.Curation.mixGate]] (or a batch re-mix) as the
    * per-language micro-rate map. When the budget is feasible
    * (≤ total tokens), the waterfilled expectation consumes it
    * EXACTLY: Σ rate_l·T_l = budget up to round-6 quantization —
    * the property the single-shot form only approximates. */
  def waterfillRates(tokens: Map[String, Long],
      weightMicro: Map[String, Long], budget: Long): Map[String, Long] = {
    require(tokens.keySet == weightMicro.keySet, "strata must align")
    var saturated = Set.empty[String]
    var open = Map.empty[String, Double]
    var done = false
    while (!done) {
      val rest = tokens.keySet -- saturated
      val bRem = budget - saturated.toSeq.map(tokens).sum
      val wRem = rest.toSeq.map(weightMicro).sum
      val tentative = rest.map { l =>
        l -> (if (wRem == 0L) 0.0
              else bRem.toDouble * weightMicro(l) / wRem / tokens(l))
      }.toMap
      val newSat = tentative.filter(_._2 >= 1.0).keySet
      if (newSat.isEmpty) { open = tentative; done = true }
      else saturated ++= newSat
    }
    saturated.map(_ -> 1000000L).toMap ++ open.map { case (l, r) =>
      l -> (BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLong
    }
  }

  /** Pipeline — NEAR-duplicate split decontamination: q49 guards the
    * training corpus against EXACT eval n-gram overlap; this guards
    * the train/eval boundary of [[q41StratifiedSplit]]'s own split
    * against NEAR duplicates — the leakage mode the exact-gram gate
    * misses (an eval document's lightly-edited twin landing in train
    * still leaks the answer; Lee et al. 2022, arXiv:2107.06499 §6
    * measure exactly this). Same deterministic `split:doc_id` buckets
    * as q41 (train < 80, eval otherwise, so the guard composes with
    * the split users already run), the corpus-scaled MinHash-LSH
    * pipeline ([[verifiedNearDupPairs]] — banded candidates, never
    * all-pairs) over the near-dup corpus, and any TRAIN doc verified
    * ≥ 0.5 Jaccard against an EVAL doc is dropped. Per-language
    * report: split sizes, leaked count, surviving train count.
    *
    * Scale shape: split assignment is a map-side projection riding the
    * LSH scan; the leaked set is ≤ the verified-pair count (already
    * corpus-scaled); flagging is one hash join on doc_id; the rollup
    * is partial-aggregated. */
  def q124SplitDecontam(spark: SparkSession, dir: String): DataFrame = {
    val corpus = nearDocs(spark, dir)
    val bucket = pmod(portableHash(
      concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
    val assign = corpus.select(col("doc_id"),
      when(bucket < 80, "train").otherwise("eval").as("split"))
    val pairs = verifiedNearDupPairs(corpus)
    val leaked = pairs
      .join(assign.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(assign.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(when(col("split_a") === "train", col("doc_a"))
        .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
      .withColumn("is_leaked", lit(true))
    // language of an inserted near-copy = its source's language
    val base = docs(spark, dir)
    val langRel = base.select(col("doc_id"), col("lang"))
      .unionByName(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang")))
    langRel.join(assign, "doc_id")
      .join(leaked, Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "eval", 1L).otherwise(0L)).as("n_eval"),
        sum(when(col("is_leaked").isNotNull, 1L).otherwise(0L)).as("n_leaked"),
        sum(when(col("split") === "train" && col("is_leaked").isNull, 1L)
          .otherwise(0L)).as("n_train_kept"))
      .orderBy(col("lang"))
  }

  object Sql {
    private val P = "2147483647"
    private def ph(x: String) = s"('0x' || substr(md5($x), 1, 15))::BIGINT"
    private def phm(x: String) = s"(${ph(x)} % $P)"
    private def dot(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"
    private def nrm(a: String) =
      s"sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE)))"
    private def cos(a: String, b: String) =
      s"(${dot(a, b)} / (${nrm(a)} * ${nrm(b)}))"

    val q23 =
      """WITH corpus AS (
        |  SELECT lang, text, doc_id FROM documents
        |  UNION ALL
        |  SELECT lang, text, doc_id + 1000000 FROM documents WHERE doc_id % 7 = 0),
        |per_hash AS (
        |  SELECT lang, md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |  FROM corpus GROUP BY lang, h)
        |SELECT lang, CAST(sum(n_copies) AS BIGINT) AS n_docs_in,
        |  count(*) AS n_docs_kept,
        |  CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dups_removed
        |FROM per_hash GROUP BY lang ORDER BY lang""".stripMargin

    // q87 — the CASE derivation and dual-token blocking mirror
    // q87FuzzyJoin exactly (incl. the d=0 keep-first-token-copy dedup
    // rule); DuckDB's levenshtein is the same classic unit-cost edit
    // distance as Spark's
    val q87 =
      """WITH names AS (SELECT DISTINCT p_name AS cand FROM part),
        |cb AS (
        |  SELECT cand, split_part(cand, ' ', 1) AS block FROM names
        |  UNION
        |  SELECT cand, split_part(cand, ' ', 2) AS block FROM names),
        |dirty AS (
        |  SELECT CASE WHEN p_partkey % 3 = 0
        |           THEN substring(p_name, 1, length(p_name) - 1)
        |         WHEN p_partkey % 3 = 1 THEN p_name || 'x'
        |         ELSE p_name END AS dirty
        |  FROM part),
        |db AS (SELECT dirty, split_part(dirty, ' ', 1) AS b1,
        |         split_part(dirty, ' ', 2) AS b2 FROM dirty),
        |dx AS (
        |  SELECT dirty, b1, b1 AS block FROM db
        |  UNION ALL
        |  SELECT dirty, b1, b2 AS block FROM db WHERE b2 <> b1),
        |j AS (
        |  SELECT cb.cand, levenshtein(dx.dirty, cb.cand) AS d,
        |    dx.block = dx.b1 AS is_b1
        |  FROM dx JOIN cb ON dx.block = cb.block)
        |SELECT cand, CAST(d AS INT) AS d, count(*) AS n_pairs
        |FROM j WHERE d <= 1 AND (d > 0 OR is_b1)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

    // q91 — corpus = dupDocs ∪ the formatting-variant feed; canonical
    // digest lower-cases first, so the upper-cased variant collapses
    val q91 =
      """WITH corpus AS (
        |  SELECT lang, text FROM documents
        |  UNION ALL
        |  SELECT lang, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT lang, regexp_replace(upper(text), ' ', '  ', 'g') || ' !!'
        |  FROM documents WHERE doc_id % 13 = 0),
        |h AS (SELECT lang, md5(text) AS raw_h,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS canon_h
        |  FROM corpus)
        |SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT raw_h) AS n_raw_distinct,
        |  count(DISTINCT canon_h) AS n_canonical,
        |  count(DISTINCT raw_h) - count(DISTINCT canon_h) AS n_collapsed_by_norm
        |FROM h GROUP BY lang ORDER BY lang""".stripMargin

    /** The MinHash+LSH pair CTE chain over a `corpus(doc_id, text, …)`
      * CTE — shared verbatim by q24 (pair listing) and q102 (source
      * matrix rollup), mirroring the engine's single
      * `verifiedNearDupPairs` derivation. Ends at `j(doc_a, doc_b,
      * jaccard)`, unfiltered — consumers apply the ≥ 0.5 cut. */
    private val minhashSigCtes =
      s"""sh AS (
         |  SELECT doc_id, CASE WHEN len(toks) >= 3
         |    THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
         |      i -> array_to_string(toks[i:i+2], ' ')))
         |    ELSE []::VARCHAR[] END AS shingles
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
         |sig AS (
         |  SELECT doc_id, list_sort(list_distinct(hashes)) AS hs,
         |    list_transform(generate_series(0, 15), h ->
         |      list_min(list_transform(hashes, x -> ((2*h+1)*x + 12289*h) % $P))) AS msig
         |  FROM (SELECT doc_id,
         |      list_transform(shingles, s -> ${phm("s")}) AS hashes
         |    FROM sh WHERE len(shingles) > 0))""".stripMargin

    private val minhashPairCtes =
      s"""$minhashSigCtes,
         |bands AS (
         |  SELECT doc_id, b,
         |    msig[4*b+1] + msig[4*b+2]*31 + msig[4*b+3]*961 + msig[4*b+4]*29791 AS bsig
         |  FROM sig, generate_series(0, 3) t(b)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
         |j AS (
         |  -- verification over the same sorted distinct hash sets the
         |  -- engine intersects (identical md5-derived values both sides)
         |  SELECT doc_a, doc_b,
         |    round(len(list_intersect(sa.hs, sb.hs))
         |      / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))), 4) AS jaccard
         |  FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b)""".stripMargin

    val q24 =
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' extra token tail' FROM documents WHERE doc_id % 11 = 0),
         |$minhashPairCtes
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin

    /** q102 — the SAME pair CTE chain over the re-crawled corpus (same-
      * source copies at %7, next-source mirrors at %19), rolled up to
      * the (least, greatest) source-pair matrix; jaccard mass sums in
      * E4 integer units so the only division happens once per cell. */
    val q102 =
      s"""WITH srcs AS (
         |  SELECT source, row_number() OVER (ORDER BY source) - 1 AS rk
         |  FROM (SELECT DISTINCT source FROM documents)),
         |ns AS (SELECT count(*) AS ns FROM srcs),
         |rot AS (
         |  SELECT a.source, b.source AS next_source
         |  FROM srcs a, ns, srcs b WHERE b.rk = (a.rk + 1) % ns.ns),
         |corpus AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT d.doc_id + 3000000, d.text, rot.next_source
         |  FROM documents d JOIN rot ON d.source = rot.source
         |  WHERE d.doc_id % 19 = 0),
         |$minhashPairCtes,
         |pp AS (
         |  SELECT least(sa.source, sb.source) AS source_a,
         |    greatest(sa.source, sb.source) AS source_b,
         |    CAST(round(jaccard * 10000, 0) AS BIGINT) AS j4
         |  FROM j
         |  JOIN corpus sa ON sa.doc_id = j.doc_a
         |  JOIN corpus sb ON sb.doc_id = j.doc_b
         |  WHERE jaccard >= 0.5)
         |SELECT source_a, source_b, count(*) AS n_pairs,
         |  CAST(sum(j4) AS BIGINT) AS sum_jaccard_e4,
         |  round(sum(j4) / 10000.0 / count(*), 6) AS avg_jaccard
         |FROM pp GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin

    val q25 =
      s"""WITH e AS (SELECT vec_id, embedding, ${nrm("embedding")} AS nrm FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT query_id, vec_id, round(${dot("qe", "embedding")} / (qn * nrm), 4) AS cosine
         |  FROM q JOIN e ON vec_id <> query_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT query_id, rk, vec_id, cosine FROM ranked WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin

    val q26 =
      """WITH d AS (
        |  SELECT lang, length(text) AS n_chars_txt,
        |    len(toks) AS n_tokens,
        |    len(list_distinct(toks)) / len(toks) AS ttr,
        |    len(list_filter(toks, t -> t IN ('the', 'a'))) / len(toks) AS stop_ratio,
        |    (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / length(text) AS punct_ratio,
        |    len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9 ]')) AS bpe_tokens
        |  FROM (SELECT lang, text, string_split(text, ' ') AS toks FROM documents)),
        |scored AS (
        |  SELECT *, least(1.0, n_tokens / 200.0) * 0.5 + ttr * 0.3
        |    + (1.0 - least(1.0, punct_ratio * 5)) * 0.2 AS quality
        |  FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(n_chars_txt), 2) AS avg_chars,
        |  round(avg(n_tokens), 2) AS avg_tokens,
        |  round(avg(bpe_tokens), 2) AS avg_bpe_tokens,
        |  round(avg(ttr), 4) AS avg_ttr,
        |  round(avg(stop_ratio), 4) AS avg_stop_ratio,
        |  round(avg(quality), 4) AS avg_quality
        |FROM scored GROUP BY lang ORDER BY lang""".stripMargin

    val q27 =
      """WITH s AS (
        |  SELECT lang,
        |    len(list_filter(toks, t -> t IN ('the', 'a', 'of'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('der', 'und', 'das'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('el', 'la', 'los'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le', 'les', 'une'))) AS s_fr
        |  FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)),
        |p AS (
        |  SELECT lang, CASE
        |    WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |    WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
        |    WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
        |    WHEN s_fr > 0 THEN 'fr'
        |    ELSE 'und' END AS predicted
        |  FROM s)
        |SELECT lang, predicted, count(*) AS n FROM p
        |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin

    val q28 =
      s"""WITH hs AS (
         |  SELECT doc_id, list_transform(string_split(text, ' '), t -> ${phm("t")}) AS hs
         |  FROM documents)
         |SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 15), b ->
         |    CASE WHEN list_sum(list_transform(hs, x ->
         |        CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |    THEN CAST(2**b AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM hs ORDER BY doc_id""".stripMargin

    val q29 =
      s"""SELECT doc_id,
         |  CAST(list_sum(list_transform(string_split(text, ' '),
         |    (t, i) -> (i * ${phm("t")}) % $P)) AS BIGINT) % $P AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin

    /** The hyperplane matrix as a DuckDB literal — same values as
      * [[Pipeline.hyperSigns]] (md5-derived at object init). */
    private val signsLit: String =
      hyperSigns.map(_.map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]"))
        .mkString("[", ",", "]")

    /** The [[Pipeline.corpusScaledClusters]] twin: CTE block deriving
      * fine clusters for the `(vec_id, e)` relation `rel` against the
      * `cent` CTE — ends with `m` = (vec_id, e, cluster) where cluster
      * is the composite coarse·2^32 + masked-SRP-subbucket id. Bits per
      * coarse cluster derive from its occupancy exactly as the Spark
      * plan ([[Pipeline.occBitsCol]], integer/double-exact both
      * engines); the hyperplane matrix is the shared md5-derived
      * literal. A `def`, not a `val`: it must not capture `signsLit`
      * before object init reaches it. */
    private def fineClusterCtes(rel: String): String =
      s"""asg AS (
         |  SELECT vec_id, arg_max(label, cos6 * 1000000000000 + label) AS cluster FROM (
         |    SELECT vec_id, label, round(${cos("e", "cvec")}, 6) AS cos6
         |    FROM $rel CROSS JOIN cent)
         |  GROUP BY vec_id),
         |occ AS (SELECT cluster, count(*) AS n_c FROM asg GROUP BY cluster),
         |bits AS (SELECT cluster, coalesce((SELECT min(b)
         |    FROM generate_series(0, 32) t(b)
         |    WHERE ${ClusterTargetOccupancy}.0 * power(2.0, b) >= n_c), 32) AS bb
         |  FROM occ),
         |s AS (SELECT $signsLit::DOUBLE[][] AS sm),
         |m AS (
         |  SELECT vec_id, e, CAST(cluster AS BIGINT) * 4294967296 +
         |    (CAST(list_sum(list_transform(generate_series(1, 32), h ->
         |        CASE WHEN list_sum(list_transform(e, (x, i) -> x * sm[h][i])) > 0
         |        THEN CAST(2**(h-1) AS BIGINT) ELSE 0 END)) AS BIGINT)
         |      & (CAST(power(2.0, bb) AS BIGINT) - 1)) AS cluster,
         |    CAST(power(2.0, bb) AS BIGINT) - 1 AS mask
         |  FROM $rel JOIN asg USING (vec_id) JOIN bits USING (cluster), s)""".stripMargin

    val q30 =
      s"""WITH base AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_transform(embedding, (x, i) ->
         |      x::DOUBLE * (1.0 + 0.002 * ((vec_id + i - 1) % 3 - 1)))
         |  FROM embeddings WHERE vec_id % 9 = 0),
         |s AS (SELECT $signsLit::DOUBLE[][] AS sm),
         |-- bucket bits scale with corpus size: min b in [8,32] with
         |-- 4 * 2^b >= n (exact in doubles; mirrors the Spark plan)
         |nn AS (SELECT count(*) AS n FROM base),
         |mask AS (SELECT CAST(power(2.0, coalesce(
         |    (SELECT min(b) FROM generate_series(8, 32) t(b), nn
         |     WHERE 4.0 * power(2.0, b) >= n), 32)) AS BIGINT) - 1 AS mask),
         |b AS (
         |  SELECT vec_id, e, CAST(list_sum(list_transform(generate_series(1, 32), h ->
         |      CASE WHEN list_sum(list_transform(e, (x, i) -> x * sm[h][i])) > 0
         |      THEN CAST(2**(h-1) AS BIGINT) ELSE 0 END)) AS BIGINT) & mask AS bucket,
         |    mask
         |  FROM base, s, mask),
         |pr AS (
         |  SELECT vec_id, e, unnest(list_prepend(bucket, list_transform(
         |    list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |    j -> xor(bucket, CAST(2**j AS BIGINT))))) AS bucket
         |  FROM b),
         |scored AS (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |    round(${cos("x.e", "y.e")}, 4) AS cosine
         |  FROM pr x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.99
         |ORDER BY vec_a, vec_b""".stripMargin

    val q31 =
      s"""WITH cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${fineClusterCtes("e")},
         |q AS (SELECT vec_id AS query_id, e AS qe, cluster FROM m WHERE vec_id < 10),
         |scored AS (
         |  SELECT query_id, vec_id, round(${cos("qe", "m.e")}, 4) AS cosine
         |  FROM m JOIN q USING (cluster) WHERE vec_id <> query_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT query_id, rk, vec_id, cosine FROM ranked WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin

    val q40 =
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' extra token tail' FROM documents WHERE doc_id % 11 = 0),
         |g AS (
         |  SELECT doc_id, CASE WHEN len(toks) >= 2
         |    THEN list_transform(generate_series(1, len(toks) - 1),
         |      i -> array_to_string(toks[i:i+1], ' '))
         |    ELSE []::VARCHAR[] END AS grams
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
         |pairs AS (
         |  SELECT DISTINCT doc_id, h FROM (
         |    SELECT doc_id, unnest(list_transform(grams, s -> ${phm("s")})) AS h
         |    FROM g WHERE len(grams) > 0)),
         |gdf AS (SELECT h, count(*) AS df FROM pairs GROUP BY h),
         |h AS (
         |  SELECT doc_id, list(h ORDER BY df, h) AS hs
         |  FROM pairs JOIN gdf USING (h) GROUP BY doc_id),
         |pref AS (
         |  SELECT doc_id, unnest(hs[1 : len(hs) - (len(hs) * 4 + 4) // 5 + 1]) AS key FROM h),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM pref x JOIN pref y ON x.key = y.key AND x.doc_id < y.doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |    round(len(list_intersect(ha.hs, hb.hs))
         |      / (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))), 4) AS jaccard
         |  FROM cand JOIN h ha ON ha.doc_id = doc_a JOIN h hb ON hb.doc_id = doc_b)
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin

    val q41 =
      s"""SELECT lang, split, count(*) AS n_docs,
         |  round(avg(n_chars), 2) AS avg_chars
         |FROM (
         |  SELECT lang, length(text) AS n_chars,
         |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT lang, text,
         |    ${ph("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS b
         |    FROM documents))
         |GROUP BY lang, split ORDER BY lang, split""".stripMargin

    val q46 =
      """WITH m AS (
        |  SELECT lang, len(toks) AS n,
        |    len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
        |    CASE WHEN len(toks) >= 2
        |      THEN 1.0 - len(list_distinct(list_transform(
        |        generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])))
        |        * 1.0 / (len(toks) - 1)
        |      ELSE 0.0 END AS rep
        |  FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents))
        |SELECT lang,
        |  CASE WHEN n < 20 THEN 'too_short' WHEN n > 90 THEN 'too_long'
        |    WHEN ttr < 0.35 THEN 'low_diversity' WHEN rep > 0.08 THEN 'repetitive'
        |    ELSE 'keep' END AS verdict,
        |  count(*) AS n_docs, round(avg(n), 2) AS avg_toks
        |FROM m GROUP BY lang, verdict ORDER BY lang, verdict""".stripMargin

    val q47 =
      """SELECT token, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n_occurrences DESC, token LIMIT 20""".stripMargin

    val q48 =
      """WITH corpus AS (
        |  SELECT lang, CASE WHEN doc_id % 13 = 0
        |    THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |      '@mail.example or http://site' || CAST(doc_id AS VARCHAR) || '.example/page'
        |    ELSE text END AS text
        |  FROM documents),
        |m AS (SELECT lang,
        |    len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+')) AS n_emails,
        |    len(regexp_extract_all(text, 'https?://[a-z0-9./]+')) AS n_urls,
        |    length(text) - length(regexp_replace(regexp_replace(text,
        |      '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |      'https?://[a-z0-9./]+', '<URL>', 'g')) AS len_delta
        |  FROM corpus)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN n_emails + n_urls > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
        |  CAST(sum(n_emails) AS BIGINT) AS n_emails,
        |  CAST(sum(n_urls) AS BIGINT) AS n_urls,
        |  CAST(sum(len_delta) AS BIGINT) AS total_len_delta
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin

    val q49 =
      s"""WITH corpus AS (
         |  SELECT doc_id, lang, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id % 7 = 0),
         |d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks,
         |    ${ph("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS b
         |  FROM corpus),
         |g AS (SELECT doc_id, lang, b, ${phm("gram")} AS h
         |  FROM (SELECT doc_id, lang, b,
         |      unnest(list_transform(generate_series(1, len(toks) - 7),
         |        i -> array_to_string(toks[i:i+7], ' '))) AS gram
         |    FROM d WHERE len(toks) >= 8)),
         |tr AS (SELECT DISTINCT h FROM g WHERE b < 80),
         |te AS (SELECT doc_id, lang, h FROM g WHERE b >= 90)
         |SELECT lang, count(DISTINCT doc_id) AS n_test,
         |  count(DISTINCT CASE WHEN h IN (SELECT h FROM tr) THEN doc_id END) AS n_contaminated
         |FROM te GROUP BY lang ORDER BY lang""".stripMargin

    /** The q50 near-dup corpus → verified edges → recursive
      * connected-components chain, ending at `reach(node, label)` —
      * shared verbatim by q50 (size histogram) and q111 (keeper
      * selection), mirroring the engine's single edge derivation. */
    /** The LSH→verify→CC chain parameterized over its input relation
      * (must expose `doc_id, text`), ending at `reach(node, label)` —
      * q50/q111 run it over the reinsertion corpus, q113 over its
      * stage-2 survivors. */
    private def nearDupCcChain(rel: String) =
      s"""sh AS (
         |  SELECT doc_id, CASE WHEN len(toks) >= 3
         |    THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
         |      i -> array_to_string(toks[i:i+2], ' ')))
         |    ELSE []::VARCHAR[] END AS shingles
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $rel)),
         |sig AS (
         |  SELECT doc_id, list_sort(list_distinct(hashes)) AS hs,
         |    list_transform(generate_series(0, 15), h ->
         |      list_min(list_transform(hashes, x -> ((2*h+1)*x + 12289*h) % $P))) AS msig
         |  FROM (SELECT doc_id, list_transform(shingles, s -> ${phm("s")}) AS hashes
         |    FROM sh WHERE len(shingles) > 0)),
         |bands AS (
         |  SELECT doc_id, b,
         |    msig[4*b+1] + msig[4*b+2]*31 + msig[4*b+3]*961 + msig[4*b+4]*29791 AS bsig
         |  FROM sig, generate_series(0, 3) t(b)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
         |edges AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT doc_a, doc_b,
         |      len(list_intersect(sa.hs, sb.hs)) * 1.0
         |        / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS j
         |    FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b)
         |  WHERE round(j, 4) >= 0.5),
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
         |  UNION ALL SELECT doc_b, doc_a FROM edges),
         |nodes AS (SELECT DISTINCT a AS node FROM sym),
         |reach AS (
         |  WITH RECURSIVE r(node, lab) AS (
         |    SELECT node, node FROM nodes
         |    UNION
         |    SELECT e.b, r.lab FROM r JOIN sym e ON e.a = r.node)
         |  SELECT node, min(lab) AS label FROM r GROUP BY node)""".stripMargin

    /** The q50/q111 reinsertion corpus + the shared chain over it. */
    private val nearDupCcCtes =
      s"""corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, text || ' extra token tail' FROM documents WHERE doc_id % 11 = 0),
         |${nearDupCcChain("corpus")}""".stripMargin

    val q50 =
      s"""WITH $nearDupCcCtes,
         |cl AS (SELECT label, count(*) AS cluster_size FROM reach GROUP BY label)
         |SELECT cluster_size, count(*) AS n_clusters,
         |  CAST(sum(cluster_size) AS BIGINT) AS n_docs
         |FROM cl GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

    /** q111 — the shared chain's components joined back to document
      * lengths; keeper via the exact `len·10^9 − id` integer argmax. */
    val q111 =
      s"""WITH $nearDupCcCtes,
         |sc AS (SELECT doc_id AS node, CAST(length(text) AS BIGINT) AS len FROM corpus)
         |SELECT r.label, count(*) AS cluster_size,
         |  arg_max(r.node, sc.len * 1000000000 - r.node) AS keep_id,
         |  CAST(max(sc.len) AS BIGINT) AS keep_len
         |FROM reach r JOIN sc ON sc.node = r.node
         |GROUP BY r.label ORDER BY r.label""".stripMargin

    val q51 =
      s"""WITH base AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_transform(embedding, (x, i) ->
         |      x::DOUBLE * (1.0 + 0.002 * ((vec_id + i - 1) % 3 - 1)))
         |  FROM embeddings WHERE vec_id % 9 = 0),
         |cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |${fineClusterCtes("base")},
         |probes AS (
         |  SELECT vec_id AS smaller_id, e AS se,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM m),
         |rem AS (
         |  SELECT DISTINCT x.vec_id FROM m x JOIN probes y
         |    ON x.cluster = y.cluster AND y.smaller_id < x.vec_id
         |  WHERE round(${cos("x.e", "y.se")}, 4) >= 0.99)
         |SELECT cluster, count(*) AS n_docs,
         |  CAST(count(r.vec_id) AS BIGINT) AS n_removed,
         |  CAST(count(*) - count(r.vec_id) AS BIGINT) AS n_kept
         |FROM m LEFT JOIN rem r ON m.vec_id = r.vec_id
         |GROUP BY cluster ORDER BY cluster""".stripMargin

    val q53 =
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |nn AS (SELECT count(*) AS n FROM e),
         |hs AS (SELECT vec_id, e,
         |    ${ph("'seed:' || CAST(vec_id AS VARCHAR)")} % 1000000 AS sh FROM e),
         |mn AS (SELECT min(sh) AS sh_min FROM hs),
         |seeds AS (
         |  SELECT vec_id AS label, e AS cvec FROM hs, nn, mn
         |  WHERE sh < (least(64, (n + 31) // 32) * 1000000) // n
         |    OR sh = sh_min),
         |asg0 AS (
         |  SELECT vec_id, arg_max(label, cos6 * 1000000000000 + label) AS cluster FROM (
         |    SELECT vec_id, label, round(${cos("e", "cvec")}, 6) AS cos6
         |    FROM e CROSS JOIN seeds)
         |  GROUP BY vec_id),
         |cent1 AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT cluster AS label, i AS pos, round(avg(e[i]), 6) AS cavg
         |    FROM e JOIN asg0 USING (vec_id), generate_series(1, 64) t(i)
         |    GROUP BY cluster, i)
         |  GROUP BY label),
         |asg1 AS (
         |  SELECT vec_id, arg_max(label, cos6 * 1000000000000 + label) AS cluster FROM (
         |    SELECT vec_id, label, round(${cos("e", "cvec")}, 6) AS cos6
         |    FROM e CROSS JOIN cent1)
         |  GROUP BY vec_id),
         |norms AS (SELECT label AS cluster, round(${nrm("cvec")}, 4) AS centroid_norm FROM cent1)
         |SELECT cluster, count(*) AS n_members, centroid_norm
         |FROM asg1 JOIN norms USING (cluster)
         |GROUP BY cluster, centroid_norm ORDER BY cluster""".stripMargin

    val q66 =
      s"""WITH s AS (
         |  SELECT lang, doc_id,
         |    ${ph("'sample:' || CAST(doc_id AS VARCHAR)")} % 1000000 AS h
         |  FROM documents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
         |  FROM s)
         |SELECT lang, CAST(rk AS INT) AS rk, doc_id, h FROM r WHERE rk <= 5
         |ORDER BY lang, rk""".stripMargin

    /** q68 — duplicated-3-gram repetition: DuckDB's 1-based
      * `toks[i:i+2]` slice = Spark's zip_with fold; the injected
      * boilerplate (`doc_id % 17`) appends the doc's own first 12
      * tokens twice on both sides; flag cut in integers. */
    val q68 =
      """WITH base AS (
        |  SELECT lang, doc_id, string_split(text, ' ') AS t0 FROM documents),
        |aug AS (
        |  SELECT lang, CASE WHEN doc_id % 17 = 0
        |    THEN list_concat(list_concat(t0, t0[1:12]), t0[1:12])
        |    ELSE t0 END AS toks
        |  FROM base),
        |pd AS (
        |  SELECT lang,
        |    CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END AS g,
        |    CASE WHEN len(toks) >= 3 THEN len(list_distinct(list_transform(
        |      generate_series(1, len(toks) - 2),
        |      i -> array_to_string(toks[i:i+2], ' ')))) ELSE 0 END AS d
        |  FROM aug)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(g) AS BIGINT) AS n_grams,
        |  CAST(sum(g - d) AS BIGINT) AS n_dup_grams,
        |  CAST(sum(CASE WHEN g > 0 AND (g - d) * 100 >= g * 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  round(sum(g - d)::DOUBLE / sum(g), 6) AS rep_pct
        |FROM pd GROUP BY lang ORDER BY lang""".stripMargin

    /** q70 — the bigram twin of q58's CTE chain: bigram instances via
      * the 1-based `t[i:i+1]` slice (= Spark's zip_with fold at k=2),
      * add-one smoothing over the in-plan vocabulary size, identical
      * round-6-before-compare log discipline. */
    val q70 =
      """WITH tk AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |inst AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+1], ' '))) AS bg
        |  FROM tk WHERE len(t) >= 2),
        |lm AS (SELECT bg, count(*) AS cb FROM inst GROUP BY bg),
        |ctx AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS cu
        |  FROM inst GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT t)::DOUBLE AS v FROM
        |  (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
        |pd AS (
        |  SELECT doc_id, lang,
        |    round(avg(ln((cb + 1)::DOUBLE / (cu + v))), 6) AS alp
        |  FROM inst
        |  JOIN lm USING (bg)
        |  JOIN ctx ON split_part(inst.bg, ' ', 1) = ctx.w1, vocab
        |  GROUP BY doc_id, lang),
        |b AS (SELECT avg(alp) - 2.0 * stddev_samp(alp) AS lo FROM pd)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(alp), 4) AS avg_bigram_logprob,
        |  CAST(sum(CASE WHEN alp < round(lo, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM pd, b GROUP BY lang ORDER BY lang""".stripMargin

    /** q72 — content-defined chunking: DuckDB's inclusive 1-based
      * `toks[a:b]` slice = Spark's (start, length) slice; the
      * filter-then-transform order differs from Spark's
      * transform-then-filter but yields the identical chunk multiset. */
    val q72 =
      s"""WITH corpus AS (
         |  SELECT lang, text FROM documents
         |  UNION ALL
         |  SELECT lang, 'shifted copy lead ' || text FROM documents WHERE doc_id % 13 = 0),
         |tk AS (SELECT lang, string_split(text, ' ') AS toks FROM corpus),
         |bd AS (SELECT lang, toks,
         |  list_concat(list_concat([0], list_filter(generate_series(1, len(toks)),
         |    i -> ${phm("toks[i]")} % 8 = 0)), [len(toks)]) AS bounds
         |  FROM tk),
         |ch AS (
         |  SELECT lang, unnest(list_transform(
         |    list_filter(generate_series(1, len(bounds) - 1),
         |      j -> bounds[j + 1] > bounds[j]),
         |    j -> ${phm("array_to_string(toks[bounds[j] + 1 : bounds[j + 1]], ' ')")})) AS h
         |  FROM bd),
         |g AS (SELECT lang, h, count(*) AS n FROM ch GROUP BY lang, h)
         |SELECT lang, CAST(sum(n) AS BIGINT) AS n_chunks,
         |  count(*) AS n_uniq_chunks,
         |  CAST(sum(n) - count(*) AS BIGINT) AS n_dup_chunks
         |FROM g GROUP BY lang ORDER BY lang""".stripMargin

    /** q71 — incremental dedup: batch (fresh + re-crawls) anti-joined
      * against the reference digests. The Bloom pre-filter never
      * appears here — it cannot change the result. */
    val q71 =
      """WITH batch AS (
        |  SELECT lang, text || ' fresh' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents WHERE doc_id % 10 = 3
        |  UNION ALL
        |  SELECT lang, text FROM documents WHERE doc_id % 23 = 0),
        |refd AS (SELECT DISTINCT md5(text) AS h FROM documents),
        |b AS (SELECT lang, md5(text) AS h FROM batch),
        |k AS (SELECT lang, count(*) AS n_kept FROM b
        |  WHERE h NOT IN (SELECT h FROM refd) GROUP BY lang),
        |t AS (SELECT lang, count(*) AS n_batch FROM b GROUP BY lang)
        |SELECT t.lang, n_batch,
        |  coalesce(n_kept, 0) AS n_kept,
        |  n_batch - coalesce(n_kept, 0) AS n_dropped
        |FROM t LEFT JOIN k USING (lang) ORDER BY t.lang""".stripMargin

    /** The [[Pipeline.kMeansCentroids]] twin (iters = 1): CTE block
      * deriving Lloyd-trained corpus centroids for the `(vec_id, e)`
      * relation `rel` — expected-k hash-threshold seeding with the
      * min-hash floor, one argmax assignment, one rounded per-dim mean
      * — ending with `cent`, the name [[fineClusterCtes]] expects.
      * Shared by q61 and q119 (single-sourced r17). */
    private def derivedCentCtes(rel: String): String =
      s"""nn AS (SELECT count(*) AS n FROM $rel),
         |hs AS (SELECT vec_id, e,
         |    ${ph("'seed:' || CAST(vec_id AS VARCHAR)")} % 1000000 AS sh FROM $rel),
         |mn AS (SELECT min(sh) AS sh_min FROM hs),
         |seeds AS (
         |  SELECT vec_id AS label, e AS cvec FROM hs, nn, mn
         |  WHERE sh < (least(64, (n + 31) // 32) * 1000000) // n
         |    OR sh = sh_min),
         |asg0 AS (
         |  SELECT vec_id, arg_max(label, cos6 * 1000000000000 + label) AS cluster FROM (
         |    SELECT vec_id, label, round(${cos("e", "cvec")}, 6) AS cos6
         |    FROM $rel CROSS JOIN seeds)
         |  GROUP BY vec_id),
         |cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT cluster AS label, i AS pos, round(avg(e[i]), 6) AS cavg
         |    FROM $rel JOIN asg0 USING (vec_id), generate_series(1, 64) t(i)
         |    GROUP BY cluster, i)
         |  GROUP BY label)""".stripMargin

    /** q61 — q53's derived k-means (seed threshold + one Lloyd pass)
      * over the DUP'D base corpus, its refined centroids feeding the
      * shared [[fineClusterCtes]] block (which expects the `cent`
      * name), then q51's multi-probed dominance step verbatim. */
    val q61 =
      s"""WITH base AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_transform(embedding, (x, i) ->
         |      x::DOUBLE * (1.0 + 0.002 * ((vec_id + i - 1) % 3 - 1)))
         |  FROM embeddings WHERE vec_id % 9 = 0),
         |${derivedCentCtes("base")},
         |${fineClusterCtes("base")},
         |probes AS (
         |  SELECT vec_id AS smaller_id, e AS se,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM m),
         |rem AS (
         |  SELECT DISTINCT x.vec_id FROM m x JOIN probes y
         |    ON x.cluster = y.cluster AND y.smaller_id < x.vec_id
         |  WHERE round(${cos("x.e", "y.se")}, 4) >= 0.99)
         |SELECT cluster, count(*) AS n_docs,
         |  CAST(count(r.vec_id) AS BIGINT) AS n_removed,
         |  CAST(count(*) - count(r.vec_id) AS BIGINT) AS n_kept
         |FROM m LEFT JOIN rem r ON m.vec_id = r.vec_id
         |GROUP BY cluster ORDER BY cluster""".stripMargin

    val q59 =
      """WITH d AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tok,
        |    sum(n_tok) OVER (ORDER BY doc_id) AS fin
        |  FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN (fin - n_tok) // 512 != (fin - 1) // 512
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin

    val q58 =
      s"""WITH inst AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t FROM documents),
         |lm AS (SELECT t, count(*) AS ct FROM inst GROUP BY t),
         |tot AS (SELECT sum(ct)::DOUBLE AS tot FROM lm),
         |pd AS (
         |  SELECT doc_id, lang, round(avg(ln(ct::DOUBLE / tot)), 6) AS alp
         |  FROM inst JOIN lm USING (t), tot GROUP BY doc_id, lang),
         |b AS (SELECT avg(alp) - 2.0 * stddev_samp(alp) AS lo FROM pd)
         |SELECT lang, count(*) AS n_docs, round(avg(alp), 4) AS avg_logprob,
         |  CAST(sum(CASE WHEN alp < round(lo, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM pd, b GROUP BY lang ORDER BY lang""".stripMargin

    val q56 =
      s"""WITH corpus AS (
         |  SELECT lang, text FROM documents
         |  UNION ALL
         |  SELECT lang, text FROM documents WHERE doc_id % 7 = 0),
         |tk AS (SELECT lang, string_split(text, ' ') AS toks FROM corpus),
         |ch AS (
         |  SELECT lang, unnest(list_transform(generate_series(1, len(toks) // 16),
         |    i -> ${phm("array_to_string(toks[(i-1)*16+1 : (i-1)*16+16], ' ')")})) AS h
         |  FROM tk WHERE len(toks) >= 16),
         |g AS (SELECT lang, h, count(*) AS n FROM ch GROUP BY lang, h)
         |SELECT lang, CAST(sum(n) AS BIGINT) AS n_chunks,
         |  count(*) AS n_uniq_chunks,
         |  CAST(sum(n) - count(*) AS BIGINT) AS n_dup_chunks
         |FROM g GROUP BY lang ORDER BY lang""".stripMargin

    val q57 =
      s"""WITH dd AS (
         |  SELECT doc_id, len(toks) AS dl, toks
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |st AS (SELECT count(*)::DOUBLE AS nn, avg(dl) AS avgdl FROM dd),
         |tf AS (
         |  SELECT doc_id, dl, t, count(*)::DOUBLE AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS t FROM dd) u
         |  WHERE t IN ('spark', 'join', 'window')
         |  GROUP BY doc_id, dl, t),
         |dfr AS (SELECT t, count(*)::DOUBLE AS df FROM tf GROUP BY t),
         |sc AS (
         |  SELECT doc_id, round(sum(
         |    ln(1.0 + (nn - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
         |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
         |  FROM tf JOIN dfr USING (t), st GROUP BY doc_id),
         |ranked AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM sc)
         |SELECT CAST(rk AS INT) AS rk, doc_id, score FROM ranked WHERE rk <= 10
         |ORDER BY rk""".stripMargin

    val q55 =
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |qt AS (
         |  SELECT vec_id, list_transform(e, x -> CAST(round(x / scale) AS INT)) AS qv, scale
         |  FROM (SELECT vec_id, e,
         |      greatest(list_max(list_transform(e, x -> abs(x))) / 127.0, 1e-12) AS scale
         |    FROM e)),
         |q AS (SELECT vec_id AS query_id, qv AS qq, scale AS qs FROM qt WHERE vec_id < 10),
         |ap AS (
         |  SELECT query_id, vec_id, round(${dot("qv", "qq")} * scale * qs, 6) AS adot
         |  FROM qt JOIN q ON vec_id <> query_id),
         |short AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY adot DESC, vec_id) AS srk FROM ap)
         |  WHERE srk <= 20),
         |qe AS (SELECT vec_id AS query_id, e AS qvec FROM e WHERE vec_id < 10),
         |ex AS (
         |  SELECT s.query_id, s.vec_id, round(${cos("qvec", "e.e")}, 4) AS cosine
         |  FROM short s JOIN e ON e.vec_id = s.vec_id JOIN qe ON qe.query_id = s.query_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, vec_id) AS rk FROM ex)
         |SELECT query_id, rk, vec_id, cosine FROM ranked WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin

    val q54 =
      s"""WITH counts AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
         |mn AS (SELECT min(n_lang) AS n_min FROM counts),
         |v AS (
         |  SELECT d.lang,
         |    ${ph("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000
         |      < (n_min * 1000000) // n_lang AS keep
         |  FROM documents d JOIN counts USING (lang), mn)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM v GROUP BY lang ORDER BY lang""".stripMargin

    /** q73 — CMS twin: identical keyed-hash bucket arithmetic
      * (`ph('cms<j>:'‖token) % 1024`, j from generate_series 0..3);
      * `min(n)` over the probe's 4 buckets = the CMS estimate; the
      * exact side recounts only probe tokens. The hash match proves
      * est ≥ exact row for row. */
    val q73 =
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |cells AS (
         |  SELECT j, ${ph("'cms' || CAST(j AS VARCHAR) || ':' || token")} % 1024 AS b,
         |    count(*) AS n
         |  FROM toks CROSS JOIN generate_series(0, 3) t(j)
         |  GROUP BY j, b),
         |probes AS (
         |  SELECT DISTINCT unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE doc_id % 29 = 1),
         |pc AS (
         |  SELECT token, j, ${ph("'cms' || CAST(j AS VARCHAR) || ':' || token")} % 1024 AS b
         |  FROM probes CROSS JOIN generate_series(0, 3) t(j)),
         |es AS (
         |  SELECT token, min(n) AS n_est FROM pc JOIN cells USING (j, b) GROUP BY token),
         |ex AS (
         |  SELECT token, count(*) AS n_exact FROM toks
         |  WHERE token IN (SELECT token FROM probes) GROUP BY token)
         |SELECT token, n_est, n_exact, n_est - n_exact AS overcount
         |FROM es JOIN ex USING (token) ORDER BY token""".stripMargin

    /** q74 — priority-sampling twin: the priority is the SAME single
      * IEEE expression `w·2⁶⁰/(h+1)` (exact product, correctly-rounded
      * conversion + division — bit-identical across engines); rank 6's
      * priority is τ (0 for strata with ≤ 5 docs via max over the
      * guarded CASE). */
    val q74 =
      s"""WITH s AS (
         |  SELECT lang, doc_id, n_chars,
         |    CAST(n_chars AS DOUBLE) * 1152921504606846976 /
         |      (${ph("'prio:' || CAST(doc_id AS VARCHAR)")} + 1) AS pri
         |  FROM documents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY pri DESC, doc_id) AS rk
         |  FROM s),
         |t AS (SELECT lang, max(CASE WHEN rk = 6 THEN pri ELSE 0 END) AS tau
         |  FROM r GROUP BY lang)
         |SELECT r.lang, CAST(rk AS INT) AS rk, doc_id, n_chars AS weight,
         |  round(greatest(CAST(n_chars AS DOUBLE), tau), 2) AS est_weight,
         |  round(tau, 2) AS tau
         |FROM r JOIN t ON r.lang = t.lang WHERE rk <= 5
         |ORDER BY r.lang, rk""".stripMargin

    /** q75 — the classifier twin recomputes the weight vector INLINE
      * (weight(b) = h60("w:"||b) % 201 − 100): what Spark carries as a
      * plan-literal array, SQL derives per feature — same md5, same
      * model, and the integer score sums are order-independent so the
      * hash match needs no float discipline. */
    val q75 =
      s"""WITH tk AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
         |ft AS (
         |  SELECT doc_id, lang,
         |    unnest(list_concat(t, list_transform(generate_series(1, len(t) - 1),
         |      i -> array_to_string(t[i:i+1], ' ')))) AS f
         |  FROM tk),
         |sc AS (
         |  SELECT doc_id, lang,
         |    sum((${ph(s"'w:' || CAST(${ph("'f:' || f")} % 4096 AS VARCHAR)")} % 201) - 100) AS score,
         |    count(*) AS n_feats
         |  FROM ft GROUP BY doc_id, lang)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(score) AS BIGINT) AS sum_score,
         |  round(sum(score)::DOUBLE / sum(n_feats), 6) AS avg_feat_score
         |FROM sc GROUP BY lang ORDER BY lang""".stripMargin

    /** q76 — the twin rebuilds the boilerplate/copy augmentation, the
      * positioned 8-gram digests (1-based list slicing vs Spark's
      * 0-based posexplode — the island arithmetic uses only position
      * DIFFERENCES within a document, so the uniform shift cancels),
      * the >1-count mark, and the same running-max interval union. */
    val q76 =
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN doc_id % 5 = 0
         |      THEN text || ' all rights reserved see our terms of service and privacy policy today'
         |      ELSE text END AS text
         |  FROM documents),
         |corpus AS (
         |  SELECT doc_id, lang, text FROM base
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, lang, text FROM base WHERE doc_id % 13 = 0),
         |tk AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM corpus),
         |pos0 AS (
         |  SELECT doc_id, lang, t, unnest(generate_series(1, len(t) - 7)) AS i
         |  FROM tk WHERE len(t) >= 8),
         |pos AS (
         |  SELECT doc_id, lang, i,
         |    ${ph("array_to_string(t[i:i+7], ' ')")} AS h
         |  FROM pos0),
         |dup AS (SELECT h FROM pos GROUP BY h HAVING count(*) > 1),
         |m AS (SELECT p.doc_id, p.lang, p.i FROM pos p JOIN dup USING (h)),
         |isl AS (SELECT doc_id, lang, i,
         |  max(i + 8) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
         |  FROM m),
         |perdoc AS (
         |  SELECT doc_id, lang,
         |    sum(i + 8 - greatest(i, coalesce(prev_max, i))) AS dup_tokens,
         |    sum(CASE WHEN prev_max IS NULL OR prev_max <= i THEN 1 ELSE 0 END) AS n_spans
         |  FROM isl GROUP BY doc_id, lang),
         |perlang AS (
         |  SELECT lang, count(*) AS n_dup_docs,
         |    sum(n_spans) AS n_spans, sum(dup_tokens) AS dup_tokens
         |  FROM perdoc GROUP BY lang),
         |tot AS (SELECT lang, count(*) AS n_docs,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |  FROM corpus GROUP BY lang)
         |SELECT t.lang, t.n_docs,
         |  CAST(coalesce(p.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
         |  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  t.n_tokens,
         |  round(coalesce(p.dup_tokens, 0)::DOUBLE / t.n_tokens, 6) AS dup_token_pct
         |FROM tot t LEFT JOIN perlang p ON t.lang = p.lang
         |ORDER BY t.lang""".stripMargin

    /** q79 — the quota twin re-derives q75's inline model and ranks
      * with `row_number` (score DESC, doc_id ASC) — the window form
      * the bounded TopK aggregator is proven interchangeable with
      * (TopKSpec). */
    val q79 =
      s"""WITH tk AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
         |ft AS (
         |  SELECT doc_id, source,
         |    unnest(list_concat(t, list_transform(generate_series(1, len(t) - 1),
         |      i -> array_to_string(t[i:i+1], ' ')))) AS f
         |  FROM tk),
         |sc AS (
         |  SELECT doc_id, source,
         |    sum((${ph(s"'w:' || CAST(${ph("'f:' || f")} % 4096 AS VARCHAR)")} % 201) - 100) AS score
         |  FROM ft GROUP BY doc_id, source),
         |r AS (
         |  SELECT source, doc_id, score,
         |    row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rk
         |  FROM sc)
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id,
         |  CAST(score AS BIGINT) AS score
         |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin

    /** q80 — the twin re-derives the sign matrix inline and projects
      * with nested list lambdas; `list_sum ∘ list_transform` matches
      * [[graft.expressions]] `vecDot`'s sequential accumulation
      * bit-for-bit, so per-row ratios and in-band counts are exact and
      * only the group averages lean on round-6. */
    val q80 =
      s"""WITH per AS (
         |  SELECT label,
         |    list_sum(list_transform(embedding, v -> v::DOUBLE * v::DOUBLE)) AS xn2,
         |    list_transform(generate_series(0, 15), j ->
         |      0.25 * list_sum(list_transform(generate_series(1, 64), i ->
         |        embedding[i]::DOUBLE *
         |        (CASE WHEN ${ph("'rp:' || (i - 1) || ':' || j")} % 2 = 0
         |          THEN 1.0 ELSE -1.0 END)))) AS y
         |  FROM embeddings),
         |r AS (
         |  SELECT label,
         |    list_sum(list_transform(y, v -> v * v)) / xn2 AS ratio
         |  FROM per WHERE xn2 > 0)
         |SELECT label, count(*) AS n_vecs,
         |  round(avg(ratio), 6) AS avg_distortion,
         |  round(min(ratio), 6) AS min_distortion,
         |  round(max(ratio), 6) AS max_distortion,
         |  CAST(sum(CASE WHEN ratio BETWEEN 0.5 AND 1.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band
         |FROM r GROUP BY label ORDER BY label""".stripMargin

    /** q81 — six unrolled fixed-point iterations; every operation is
      * an int64 sum or floor-division, so the hash match needs no
      * float tolerance across six rounds of accumulation. */
    val q81 = {
      def iter(prev: String, cur: String) =
        s"""$cur AS (SELECT ed.dst AS node,
           |  150000 + (85 * sum($prev.r // ed.d)) // 100 AS r
           |  FROM ed JOIN $prev ON ed.src = $prev.node GROUP BY ed.dst)"""
          .stripMargin
      val its = (1 to 6).map(i => iter(if (i == 1) "r0" else s"i${i - 1}", s"i$i"))
        .mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (SELECT a AS src, b AS dst FROM pairs
         |          UNION ALL SELECT b AS src, a AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         |ed AS (SELECT e.src, e.dst, dg.d FROM edges e JOIN deg dg ON e.src = dg.src),
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
         |$its
         |SELECT node, CAST(r AS BIGINT) AS r, (node % 2 = 1) AS is_supplier
         |FROM i6 ORDER BY r DESC, node LIMIT 20""".stripMargin
    }

    /** q100 — three unrolled learn rounds. The `list_reduce` twin folds
      * the IDENTICAL greedy left-to-right order as [[bpeMergePass]]'s
      * `aggregate` (both seed with the first token and scan once), so
      * rewritten token lists agree token-for-token and every reported
      * stat is an integer — no tolerance anywhere. */
    /** One unrolled q100 learn round over `prev` — shared by q100 (the
      * merge table) and q104 (the final corpus rollup). A pair-free
      * round (empty `m$i`) keeps `prev` unchanged via the LEFT JOIN +
      * `ml IS NULL` guard — the twin of the engine loop's early exit,
      * so q100/q104 stay cross-engine-defined even on degenerate
      * (all-singleton) corpora where fewer than [[BpeMergeRounds]]
      * merges are learnable. */
    private def bpeRound(prev: String, i: Int) =
      s"""pr$i AS (
         |  SELECT toks[j] AS lhs, toks[j + 1] AS rhs FROM (
         |    SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS j
         |    FROM $prev WHERE len(toks) >= 2)),
         |m$i AS (
         |  SELECT lhs AS ml, rhs AS mr, count(*) AS pair_count FROM pr$i
         |  GROUP BY lhs, rhs ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
         |t$i AS (
         |  SELECT doc_id, CASE WHEN ml IS NULL OR len(toks) < 2 THEN toks ELSE
         |    list_reduce(list_transform(toks, x -> [x]),
         |      (acc, x) -> CASE WHEN acc[-1] = ml AND x[1] = mr
         |        THEN list_concat(acc[1:len(acc) - 1], [acc[-1] || ' ' || x[1]])
         |        ELSE list_concat(acc, x) END) END AS toks
         |  FROM $prev LEFT JOIN m$i ON true),
         |s$i AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS tokens_after FROM t$i)"""
        .stripMargin

    val q100 = {
      def round(prev: String, i: Int) = bpeRound(prev, i)
      s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |${round("t0", 1)},
         |${round("t1", 2)},
         |${round("t2", 3)}
         |SELECT * FROM (
         |  SELECT 1 AS it, ml AS lhs, mr AS rhs, pair_count, tokens_after FROM m1, s1
         |  UNION ALL
         |  SELECT 2, ml, mr, pair_count, tokens_after FROM m2, s2
         |  UNION ALL
         |  SELECT 3, ml, mr, pair_count, tokens_after FROM m3, s3)
         |ORDER BY it""".stripMargin
    }

    /** q104 — the q100 rounds verbatim, then per-language before/after
      * token totals off `t3`; the only division is the final
      * per-language compression ratio. */
    val q104 =
      s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |${bpeRound("t0", 1)},
         |${bpeRound("t1", 2)},
         |${bpeRound("t2", 3)},
         |b AS (
         |  SELECT lang, count(*) AS n_docs,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_before
         |  FROM documents GROUP BY lang),
         |a AS (
         |  SELECT d.lang, CAST(sum(len(t.toks)) AS BIGINT) AS tokens_after
         |  FROM t3 t JOIN documents d USING (doc_id) GROUP BY d.lang)
         |SELECT b.lang, n_docs, tokens_before, tokens_after,
         |  round(tokens_before::DOUBLE / tokens_after, 6) AS compression
         |FROM b JOIN a USING (lang) ORDER BY b.lang""".stripMargin

    /** q106 — both versions reduce to digests, full-outer join on the
      * id, integer classification sums. */
    val q106 =
      """WITH v1 AS (SELECT doc_id, lang, md5(text) AS h1 FROM documents),
        |v2 AS (
        |  SELECT doc_id, lang,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 13 != 0
        |  UNION ALL
        |  SELECT doc_id + 5000000, lang, md5(text) FROM documents WHERE doc_id % 11 = 0),
        |j AS (
        |  SELECT coalesce(v1.lang, v2.lang) AS lang, h1, h2
        |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        |SELECT lang,
        |  CAST(sum(CASE WHEN h1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
        |  CAST(sum(CASE WHEN h2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v2,
        |  CAST(sum(CASE WHEN h1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |  CAST(sum(CASE WHEN h2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  CAST(sum(CASE WHEN h1 IS NOT NULL AND h2 IS NOT NULL AND h1 != h2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_modified,
        |  CAST(sum(CASE WHEN h1 = h2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin

    /** q110 — digests, min-batch first occurrence, two bounded
      * aggregates joined; integers plus one final ratio. */
    val q110 =
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
        |d AS (SELECT CAST(doc_id % 5 AS INT) AS batch, md5(text) AS h FROM corpus),
        |pb AS (SELECT batch, count(*) AS n_docs FROM d GROUP BY batch),
        |fo AS (SELECT batch, count(*) AS n_new_digests FROM (
        |  SELECT h, min(batch) AS batch FROM d GROUP BY h) GROUP BY batch)
        |SELECT pb.batch, n_docs,
        |  coalesce(n_new_digests, 0) AS n_new_digests,
        |  n_docs - coalesce(n_new_digests, 0) AS n_dup_docs,
        |  round(coalesce(n_new_digests, 0)::DOUBLE / n_docs, 6) AS yield_pct
        |FROM pb LEFT JOIN fo USING (batch)
        |ORDER BY pb.batch""".stripMargin

    /** q101 — the PQ twin: hash-threshold seeds (q53's CTE shape, salt
      * `pq:`), codewords as 1-based list slices, encode via
      * `arg_min(idx, d6·10^12 + label)` (the unique q53 score form),
      * ADC as a BIGINT micro-unit sum over the (s, code) join — exact
      * in any order, so no tolerance anywhere; subspace distances fold
      * `list_sum ∘ list_transform` sequentially (the q80 discipline). */
    /** Rounded subspace L2² between a 64-dim vector `v` and a 16-dim
      * codeword `first` at the row's subspace `s` — the q101/q107 PQ
      * distance fragment. */
    private def pqSub(v: String, first: String) =
      s"list_sum(list_transform(generate_series(1, 16), i -> " +
        s"($v[s * 16 + i] - $first[i]) * ($v[s * 16 + i] - $first[i])))"

    /** One per-subspace Lloyd refinement round over `cb${k-1}` →
      * `cb$k` (VERDICT r13 §next-3): assign every vector's subvector
      * to its argmin codeword (the `enc` score — assignment IS the
      * encode), then move each codeword to the per-dimension
      * `round(avg, 6)` of its assignees; an empty codeword keeps its
      * previous position via the LEFT JOIN + coalesce. The exact
      * lockstep twin of the engine's `pqLloydRound`. */
    private def pqLloydCtes(rel: String, k: Int) =
      s"""la$k AS (
         |  SELECT vec_id, s, arg_min(idx, d6 * 1000000000000 + label) AS code FROM (
         |    SELECT v.vec_id, c.s, c.label, c.idx,
         |      round(${pqSub("v.e", "c.cw")}, 6) AS d6
         |    FROM $rel v CROSS JOIN cb${k - 1} c)
         |  GROUP BY vec_id, s),
         |lm$k AS (
         |  SELECT a.s, a.code, i AS pos, round(avg(v.e[a.s * 16 + i]), 6) AS cavg
         |  FROM la$k a JOIN $rel v USING (vec_id), generate_series(1, 16) t(i)
         |  GROUP BY a.s, a.code, i),
         |lw$k AS (SELECT s, code, list(cavg ORDER BY pos) AS cw FROM lm$k GROUP BY s, code),
         |cb$k AS (
         |  SELECT c.s, c.label, c.idx, coalesce(w.cw, c.cw) AS cw
         |  FROM cb${k - 1} c LEFT JOIN lw$k w ON w.s = c.s AND w.code = c.idx)"""
        .stripMargin

    /** The PQ codebook + encode CTE chain over a `(vec_id, …, e)` CTE
      * named `rel` — `seeds`/`cb0`/Lloyd rounds/`cb`/`enc` — shared
      * verbatim by q101 (flat ADC over raw vectors), q107 (IVF-PQ) and
      * q109 (residual IVF-PQ, where `rel` carries residuals),
      * mirroring the engine's single `pqSeeds` (seed + train) +
      * `pqCodeColumns` derivation. */
    private def pqEncodeCtes(rel: String = "e") =
      s"""nn AS (SELECT count(*) AS n FROM $rel),
         |hs AS (SELECT vec_id, e,
         |    ${ph("'pq:' || CAST(vec_id AS VARCHAR)")} % 1000000 AS sh FROM $rel),
         |mn AS (SELECT min(sh) AS sh_min FROM hs),
         |seeds AS (
         |  SELECT vec_id AS label, e AS cvec FROM hs, nn, mn
         |  WHERE sh < (least(16, (n + 31) // 32) * 1000000) // n
         |    OR sh = sh_min),
         |cb0 AS (
         |  SELECT s, label, cvec[s * 16 + 1 : s * 16 + 16] AS cw,
         |    CAST(row_number() OVER (PARTITION BY s ORDER BY label) - 1 AS INT) AS idx
         |  FROM seeds, (SELECT unnest(generate_series(0, 3)) AS s)),
         |${(1 to Pipeline.PqLloydRounds).map(k => pqLloydCtes(rel, k)).mkString(",\n")},
         |cb AS (SELECT s, label, idx, cw FROM cb${Pipeline.PqLloydRounds}),
         |enc AS (
         |  SELECT vec_id, s, arg_min(idx, d6 * 1000000000000 + label) AS code FROM (
         |    SELECT v.vec_id, cb.s, cb.label, cb.idx,
         |      round(${pqSub("v.e", "cb.cw")}, 6) AS d6
         |    FROM $rel v CROSS JOIN cb)
         |  GROUP BY vec_id, s)""".stripMargin

    val q101 = {
      def sub(v: String, first: String) = pqSub(v, first)
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${pqEncodeCtes()},
         |q AS (SELECT vec_id AS qid, e AS qe FROM e WHERE vec_id % 97 = 0),
         |tab AS (
         |  SELECT qid, s, idx,
         |    CAST(round(round(${sub("qe", "cw")}, 6) * 1000000, 0) AS BIGINT) AS t6
         |  FROM q CROSS JOIN cb),
         |adc AS (
         |  SELECT qid, vec_id, sum(t6) AS adc_micro
         |  FROM enc JOIN tab ON enc.s = tab.s AND enc.code = tab.idx
         |  WHERE vec_id != qid GROUP BY qid, vec_id),
         |rk AS (SELECT qid, vec_id, CAST(adc_micro AS BIGINT) AS adc_micro,
         |  row_number() OVER (PARTITION BY qid ORDER BY adc_micro, vec_id) AS rk
         |  FROM adc),
         |ex AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT q.qid, v.vec_id,
         |      row_number() OVER (PARTITION BY q.qid ORDER BY
         |        round(list_sum(list_transform(generate_series(1, 64),
         |          i -> (v.e[i] - q.qe[i]) * (v.e[i] - q.qe[i]))), 6),
         |        v.vec_id) AS xr
         |    FROM q CROSS JOIN e v WHERE v.vec_id != q.qid)
         |  WHERE xr <= 5)
         |SELECT r.qid, CAST(r.rk AS INT) AS rk, r.vec_id, r.adc_micro,
         |  (ex.vec_id IS NOT NULL) AS in_exact_top5
         |FROM rk r LEFT JOIN ex ON r.qid = ex.qid AND r.vec_id = ex.vec_id
         |WHERE r.rk <= 5
         |ORDER BY r.qid, r.rk""".stripMargin
    }

    /** q107 — IVF-PQ composed: q31's `cent` + fine-cluster membership
      * CTEs give the candidate lists, [[pqEncodeCtes]] gives the codes,
      * the ADC join is restricted to the query's cluster, and the
      * exact-flag ranks the SAME candidate list by rounded L2. */
    val q107 =
      s"""WITH cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${fineClusterCtes("e")},
         |${pqEncodeCtes()},
         |q AS (SELECT vec_id AS qid, e AS qe, cluster FROM m WHERE vec_id < 10),
         |tab AS (
         |  SELECT qid, s, idx,
         |    CAST(round(round(${pqSub("qe", "cw")}, 6) * 1000000, 0) AS BIGINT) AS t6
         |  FROM q CROSS JOIN cb),
         |cand AS (
         |  SELECT mv.cluster, enc.vec_id, enc.s, enc.code
         |  FROM enc JOIN m mv USING (vec_id)),
         |adc AS (
         |  SELECT q.qid, c.vec_id, sum(t6) AS adc_micro
         |  FROM cand c
         |  JOIN q ON c.cluster = q.cluster AND c.vec_id != q.qid
         |  JOIN tab ON tab.qid = q.qid AND tab.s = c.s AND tab.idx = c.code
         |  GROUP BY q.qid, c.vec_id),
         |rk AS (SELECT qid, vec_id, CAST(adc_micro AS BIGINT) AS adc_micro,
         |  row_number() OVER (PARTITION BY qid ORDER BY adc_micro, vec_id) AS rk
         |  FROM adc),
         |ex AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT q.qid, m.vec_id,
         |      row_number() OVER (PARTITION BY q.qid ORDER BY
         |        round(list_sum(list_transform(generate_series(1, 64),
         |          i -> (m.e[i] - q.qe[i]) * (m.e[i] - q.qe[i]))), 6),
         |        m.vec_id) AS xr
         |    FROM m JOIN q USING (cluster) WHERE m.vec_id != q.qid)
         |  WHERE xr <= 5)
         |SELECT r.qid, CAST(r.rk AS INT) AS rk, r.vec_id, r.adc_micro,
         |  (ex.vec_id IS NOT NULL) AS in_exact_top5
         |FROM rk r LEFT JOIN ex ON r.qid = ex.qid AND r.vec_id = ex.vec_id
         |WHERE r.rk <= 5
         |ORDER BY r.qid, r.rk""".stripMargin

    /** q120 — q107's skeleton with the q114/q118 radius-1 probe
      * expansion on the query side: the ADC table derives once per
      * query (raw-basis codebook, valid across probed clusters), the
      * candidate and exact-flag joins both run over the probed
      * cluster set. */
    val q120 =
      s"""WITH cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${fineClusterCtes("e")},
         |${pqEncodeCtes()},
         |q0 AS (SELECT vec_id AS qid, e AS qe, cluster, mask FROM m WHERE vec_id < 10),
         |p1 AS (
         |  SELECT qid, qe,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM q0),
         |tab AS (
         |  SELECT qid, s, idx,
         |    CAST(round(round(${pqSub("qe", "cw")}, 6) * 1000000, 0) AS BIGINT) AS t6
         |  FROM q0 CROSS JOIN cb),
         |cand AS (
         |  SELECT mv.cluster, enc.vec_id, enc.s, enc.code
         |  FROM enc JOIN m mv USING (vec_id)),
         |adc AS (
         |  SELECT p.qid, c.vec_id, sum(t6) AS adc_micro
         |  FROM cand c
         |  JOIN p1 p ON c.cluster = p.cluster AND c.vec_id != p.qid
         |  JOIN tab ON tab.qid = p.qid AND tab.s = c.s AND tab.idx = c.code
         |  GROUP BY p.qid, c.vec_id),
         |rk AS (SELECT qid, vec_id, CAST(adc_micro AS BIGINT) AS adc_micro,
         |  row_number() OVER (PARTITION BY qid ORDER BY adc_micro, vec_id) AS rk
         |  FROM adc),
         |ex AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT p.qid, m.vec_id,
         |      row_number() OVER (PARTITION BY p.qid ORDER BY
         |        round(list_sum(list_transform(generate_series(1, 64),
         |          i -> (m.e[i] - p.qe[i]) * (m.e[i] - p.qe[i]))), 6),
         |        m.vec_id) AS xr
         |    FROM m JOIN p1 p USING (cluster) WHERE m.vec_id != p.qid)
         |  WHERE xr <= 5)
         |SELECT r.qid, CAST(r.rk AS INT) AS rk, r.vec_id, r.adc_micro,
         |  (ex.vec_id IS NOT NULL) AS in_exact_top5
         |FROM rk r LEFT JOIN ex ON r.qid = ex.qid AND r.vec_id = ex.vec_id
         |WHERE r.rk <= 5
         |ORDER BY r.qid, r.rk""".stripMargin

    /** q109 — q107's skeleton with the encode CTEs pointed at the
      * per-cell RESIDUAL relation; the exact flag stays on raw
      * vectors (basis-invariant within a cell). */
    val q109 =
      s"""WITH cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${fineClusterCtes("e")},
         |res AS (
         |  SELECT m.vec_id, m.cluster,
         |    list_transform(generate_series(1, 64), i -> m.e[i] - c.cvec[i]) AS e
         |  FROM m JOIN cent c ON c.label = m.cluster // 4294967296),
         |${pqEncodeCtes("res")},
         |q AS (SELECT vec_id AS qid, e AS qe, cluster FROM res WHERE vec_id < 10),
         |tab AS (
         |  SELECT qid, s, idx,
         |    CAST(round(round(${pqSub("qe", "cw")}, 6) * 1000000, 0) AS BIGINT) AS t6
         |  FROM q CROSS JOIN cb),
         |cand AS (
         |  SELECT r2.cluster, enc.vec_id, enc.s, enc.code
         |  FROM enc JOIN res r2 USING (vec_id)),
         |adc AS (
         |  SELECT q.qid, c.vec_id, sum(t6) AS adc_micro
         |  FROM cand c
         |  JOIN q ON c.cluster = q.cluster AND c.vec_id != q.qid
         |  JOIN tab ON tab.qid = q.qid AND tab.s = c.s AND tab.idx = c.code
         |  GROUP BY q.qid, c.vec_id),
         |rk AS (SELECT qid, vec_id, CAST(adc_micro AS BIGINT) AS adc_micro,
         |  row_number() OVER (PARTITION BY qid ORDER BY adc_micro, vec_id) AS rk
         |  FROM adc),
         |ex AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT q.qid, m.vec_id,
         |      row_number() OVER (PARTITION BY q.qid ORDER BY
         |        round(list_sum(list_transform(generate_series(1, 64),
         |          i -> (m.e[i] - q2.qe[i]) * (m.e[i] - q2.qe[i]))), 6),
         |        m.vec_id) AS xr
         |    FROM m
         |    JOIN q USING (cluster)
         |    JOIN (SELECT vec_id AS qid, e AS qe FROM e) q2 USING (qid)
         |    WHERE m.vec_id != q.qid)
         |  WHERE xr <= 5)
         |SELECT r.qid, CAST(r.rk AS INT) AS rk, r.vec_id, r.adc_micro,
         |  (ex.vec_id IS NOT NULL) AS in_exact_top5
         |FROM rk r LEFT JOIN ex ON r.qid = ex.qid AND r.vec_id = ex.vec_id
         |WHERE r.rk <= 5
         |ORDER BY r.qid, r.rk""".stripMargin

    /** q121 — q109's skeleton with the radius-1 probe expansion on
      * the query side: one residual ADC table per query (the probes
      * share the coarse cell, hence the basis), candidate and exact
      * joins over the probed cluster set, exact flag on raw
      * vectors. */
    val q121 =
      s"""WITH cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${fineClusterCtes("e")},
         |res AS (
         |  SELECT m.vec_id, m.cluster,
         |    list_transform(generate_series(1, 64), i -> m.e[i] - c.cvec[i]) AS e
         |  FROM m JOIN cent c ON c.label = m.cluster // 4294967296),
         |${pqEncodeCtes("res")},
         |q0 AS (
         |  SELECT m.vec_id AS qid, r2.e AS qe, m.cluster, m.mask
         |  FROM m JOIN res r2 USING (vec_id) WHERE m.vec_id < 10),
         |p1 AS (
         |  SELECT qid,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM q0),
         |tab AS (
         |  SELECT qid, s, idx,
         |    CAST(round(round(${pqSub("qe", "cw")}, 6) * 1000000, 0) AS BIGINT) AS t6
         |  FROM q0 CROSS JOIN cb),
         |cand AS (
         |  SELECT r2.cluster, enc.vec_id, enc.s, enc.code
         |  FROM enc JOIN res r2 USING (vec_id)),
         |adc AS (
         |  SELECT p.qid, c.vec_id, sum(t6) AS adc_micro
         |  FROM cand c
         |  JOIN p1 p ON c.cluster = p.cluster AND c.vec_id != p.qid
         |  JOIN tab ON tab.qid = p.qid AND tab.s = c.s AND tab.idx = c.code
         |  GROUP BY p.qid, c.vec_id),
         |rk AS (SELECT qid, vec_id, CAST(adc_micro AS BIGINT) AS adc_micro,
         |  row_number() OVER (PARTITION BY qid ORDER BY adc_micro, vec_id) AS rk
         |  FROM adc),
         |ex AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT p.qid, m.vec_id,
         |      row_number() OVER (PARTITION BY p.qid ORDER BY
         |        round(list_sum(list_transform(generate_series(1, 64),
         |          i -> (m.e[i] - q2.qe[i]) * (m.e[i] - q2.qe[i]))), 6),
         |        m.vec_id) AS xr
         |    FROM m
         |    JOIN p1 p USING (cluster)
         |    JOIN (SELECT vec_id AS qid, e AS qe FROM e) q2 ON q2.qid = p.qid
         |    WHERE m.vec_id != p.qid)
         |  WHERE xr <= 5)
         |SELECT r.qid, CAST(r.rk AS INT) AS rk, r.vec_id, r.adc_micro,
         |  (ex.vec_id IS NOT NULL) AS in_exact_top5
         |FROM rk r LEFT JOIN ex ON r.qid = ex.qid AND r.vec_id = ex.vec_id
         |WHERE r.rk <= 5
         |ORDER BY r.qid, r.rk""".stripMargin

    /** q122 — identical shuffle-key derivation (`ph('shard:'‖id)`),
      * shard = key mod 8, within-shard position by (key, id); the
      * order checksum folds in HUGEINT (Spark carries decimal(38,0))
      * and every per-term product stays below 2^63. */
    val q122 =
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    ${ph("'shard:' || CAST(doc_id AS VARCHAR)")} AS sk
         |  FROM documents),
         |a AS (
         |  SELECT doc_id, n_toks, sk, CAST(sk % 8 AS INT) AS shard,
         |    row_number() OVER (PARTITION BY sk % 8 ORDER BY sk, doc_id) AS pos
         |  FROM d)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(CAST(sum((pos * (sk % $P)) % $P) AS HUGEINT) % $P AS BIGINT)
         |    AS order_checksum,
         |  CAST(max(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS head_doc_id
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin

    /** q141 — the append-manifest twin: q122's key/shard derivation,
      * one position per ordering (appended = wave-then-(key,id), full
      * = (key,id)), both order-sensitive checksums in one rollup. */
    val q141 =
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    ${ph("'shard:' || CAST(doc_id AS VARCHAR)")} AS sk,
         |    CAST(doc_id % 2 AS INT) AS wave
         |  FROM documents),
         |a AS (
         |  SELECT doc_id, n_toks, sk, CAST(sk % 8 AS INT) AS shard,
         |    row_number() OVER (PARTITION BY sk % 8 ORDER BY wave, sk, doc_id) AS pos_a,
         |    row_number() OVER (PARTITION BY sk % 8 ORDER BY sk, doc_id) AS pos_f
         |  FROM d)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(CAST(sum((pos_a * (sk % $P)) % $P) AS HUGEINT) % $P AS BIGINT)
         |    AS checksum_appended,
         |  CAST(CAST(sum((pos_f * (sk % $P)) % $P) AS HUGEINT) % $P AS BIGINT)
         |    AS checksum_full,
         |  CAST(max(CASE WHEN pos_a = 1 THEN doc_id END) AS BIGINT) AS head_appended,
         |  CAST(max(CASE WHEN pos_f = 1 THEN doc_id END) AS BIGINT) AS head_full,
         |  (CAST(CAST(sum((pos_a * (sk % $P)) % $P) AS HUGEINT) % $P AS BIGINT)
         |    = CAST(CAST(sum((pos_f * (sk % $P)) % $P) AS HUGEINT) % $P AS BIGINT))
         |    AS order_equal
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin

    /** q146 — the reconcile-audit twin: the export's rows ARE the
      * corpus plus the `%17` replayed wave; positions by (wave, key,
      * id) per shard (the q141 algebra with the replay as wave 1), so
      * the manifest and bytes checksums coincide BY CONSTRUCTION
      * (counts_equal / checksum_equal TRUE — the consistent replay
      * window), and only the distinct-id column flags the touched
      * shards. */
    val q146 =
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    ${ph("'shard:' || CAST(doc_id AS VARCHAR)")} AS sk, 0 AS wave
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    ${ph("'shard:' || CAST(doc_id AS VARCHAR)")} AS sk, 1 AS wave
         |  FROM documents WHERE doc_id % 17 = 0),
         |a AS (
         |  SELECT doc_id, n_toks, sk, CAST(sk % 8 AS INT) AS shard,
         |    row_number() OVER (PARTITION BY sk % 8 ORDER BY wave, sk, doc_id) AS pos
         |  FROM d)
         |SELECT shard,
         |  count(*) AS n_docs_manifest,
         |  count(*) AS n_docs_bytes,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_ids,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens_manifest,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens_bytes,
         |  CAST(CAST(sum((pos * (sk % $P)) % $P) AS HUGEINT) % $P AS BIGINT)
         |    AS checksum_manifest,
         |  CAST(CAST(sum((pos * (sk % $P)) % $P) AS HUGEINT) % $P AS BIGINT)
         |    AS checksum_bytes,
         |  TRUE AS counts_equal,
         |  TRUE AS checksum_equal,
         |  (count(DISTINCT doc_id) = count(*)) AS ids_unique
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin

    /** q142 — the gate-capacity twin: canonical digest + the gate's
      * canonical-token simhash per doc (q91's canonical chain + q28's
      * simhash fold), signature occupancy by DISTINCT digest, then
      * the occupancy histogram. */
    val q142 = {
      val canon =
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      s"""WITH c AS (
         |  SELECT md5($canon) AS digest,
         |    CAST(list_sum(list_transform(generate_series(0, 15), b ->
         |      CASE WHEN list_sum(list_transform(
         |          list_transform(string_split($canon, ' '), t -> ${phm("t")}),
         |          x -> CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |      THEN CAST(2**b AS BIGINT) ELSE 0 END)) AS BIGINT) AS sig
         |  FROM documents),
         |s AS (
         |  SELECT sig, count(DISTINCT digest) AS nd, count(*) AS ndocs
         |  FROM c GROUP BY sig)
         |SELECT CAST(nd AS INT) AS digests_per_sig,
         |  count(*) AS n_signatures,
         |  CAST(sum(ndocs) AS BIGINT) AS n_docs,
         |  CAST(sum(nd - 1) AS BIGINT) AS n_false_drops
         |FROM s GROUP BY nd ORDER BY nd""".stripMargin
    }

    /** q143 — the width-sweep twin: the q142 canonical-simhash fold
      * at parameterized width, one false-collapse + one
      * planted-recall aggregate per width, unioned. */
    val q143 = {
      val canonOf = (e: String) =>
        s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      def sim(e: String, bits: Int) =
        s"""CAST(list_sum(list_transform(generate_series(0, ${bits - 1}), b ->
           |      CASE WHEN list_sum(list_transform(
           |          list_transform(string_split(${canonOf(e)}, ' '), t -> ${phm("t")}),
           |          x -> CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
           |      THEN CAST(2**b AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin
      val widths = Seq(16, 20, 24, 31)
      val ctes = widths.map { w =>
        s"""c_$w AS (
           |  SELECT md5(${canonOf("text")}) AS digest, ${sim("text", w)} AS sig
           |  FROM documents),
           |f_$w AS (
           |  SELECT CAST(sum(nd) AS BIGINT) AS n_base_digests,
           |    CAST(sum(nd - 1) AS BIGINT) AS n_false_drops
           |  FROM (SELECT sig, count(DISTINCT digest) AS nd FROM c_$w GROUP BY sig)),
           |p_$w AS (
           |  SELECT count(*) AS n_planted,
           |    CAST(sum(CASE WHEN ${sim("text", w)} =
           |      ${sim("text || ' extra token tail'", w)} THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_planted_collapsed
           |  FROM documents WHERE doc_id % 11 = 0),
           |row_$w AS (
           |  SELECT $w AS bits, n_base_digests, n_false_drops, n_planted,
           |    n_planted_collapsed,
           |    round(n_false_drops::DOUBLE / n_base_digests, 6) AS false_drop_share,
           |    round(n_planted_collapsed::DOUBLE / n_planted, 6) AS planted_recall
           |  FROM f_$w, p_$w)""".stripMargin
      }.mkString(",\n")
      val unions = widths.map(w => s"SELECT * FROM row_$w").mkString(" UNION ALL ")
      s"""WITH $ctes
         |SELECT CAST(bits AS INT) AS bits, n_base_digests, n_false_drops,
         |  n_planted, n_planted_collapsed, false_drop_share, planted_recall
         |FROM ($unions)
         |ORDER BY bits""".stripMargin
    }

    /** q144 — the banded-gate knob twin: the q143 canonical-simhash
      * fold ONCE at the 31-bit ceiling per side, then per (bands,
      * bandBits) config pure shift/mask band keys, the one-hop
      * smaller-digest collapse rule, and the any-band planted
      * collapse, unioned. */
    val q144 = {
      val canonOf = (e: String) =>
        s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      def sim(e: String) =
        s"""CAST(list_sum(list_transform(generate_series(0, 30), b ->
           |      CASE WHEN list_sum(list_transform(
           |          list_transform(string_split(${canonOf(e)}, ' '), t -> ${phm("t")}),
           |          x -> CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
           |      THEN CAST(2**b AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin
      val configs = Seq((1, 16), (2, 8), (2, 15), (3, 10), (4, 7))
      val ctes = configs.zipWithIndex.map { case ((bands, bits), i) =>
        val mask = (1L << bits) - 1
        val anyBand = (0 until bands).map(b =>
          s"((sa >> ${b * bits}) & $mask) = ((sb >> ${b * bits}) & $mask)")
          .mkString(" OR ")
        s"""bk_$i AS (
           |  SELECT digest, b, (sig >> (b * $bits)) & $mask AS k
           |  FROM c, generate_series(0, ${bands - 1}) t(b)),
           |mn_$i AS (SELECT b, k, min(digest) AS mn FROM bk_$i GROUP BY b, k),
           |fc_$i AS (
           |  SELECT count(*) AS n_base_digests,
           |    CAST(sum(coll) AS BIGINT) AS n_false_collapsed
           |  FROM (SELECT digest, max(CASE WHEN mn < digest THEN 1 ELSE 0 END) AS coll
           |        FROM bk_$i JOIN mn_$i USING (b, k) GROUP BY digest)),
           |p_$i AS (
           |  SELECT count(*) AS n_planted,
           |    CAST(sum(CASE WHEN $anyBand THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_planted_collapsed
           |  FROM pl),
           |row_$i AS (
           |  SELECT $bands AS bands, $bits AS band_bits, n_base_digests,
           |    n_false_collapsed,
           |    round(n_false_collapsed::DOUBLE / n_base_digests, 6)
           |      AS false_collapse_share,
           |    n_planted, n_planted_collapsed,
           |    round(n_planted_collapsed::DOUBLE / n_planted, 6)
           |      AS planted_recall
           |  FROM fc_$i, p_$i)""".stripMargin
      }.mkString(",\n")
      val unions = configs.indices.map(i => s"SELECT * FROM row_$i")
        .mkString(" UNION ALL ")
      s"""WITH c AS (
         |  SELECT DISTINCT md5(${canonOf("text")}) AS digest,
         |    ${sim("text")} AS sig
         |  FROM documents),
         |pl AS (
         |  SELECT ${sim("text")} AS sa,
         |    ${sim("text || ' extra token tail'")} AS sb
         |  FROM documents WHERE doc_id % 11 = 0),
         |$ctes
         |SELECT CAST(bands AS INT) AS bands, CAST(band_bits AS INT) AS band_bits,
         |  n_base_digests, n_false_collapsed, false_collapse_share,
         |  n_planted, n_planted_collapsed, planted_recall
         |FROM ($unions)
         |ORDER BY bands, band_bits""".stripMargin
    }

    /** q137 — q122's manifest with the curriculum tier as the leading
      * within-shard sort key and the tier span in the rollup. */
    val q137 =
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    ${ph("'shard:' || CAST(doc_id AS VARCHAR)")} AS sk
         |  FROM documents),
         |t AS (SELECT *, CAST(least(9, n_toks // 64) AS INT) AS tier FROM d),
         |a AS (
         |  SELECT doc_id, n_toks, sk, tier, CAST(sk % 8 AS INT) AS shard,
         |    row_number() OVER (PARTITION BY sk % 8 ORDER BY tier, sk, doc_id) AS pos
         |  FROM t)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT tier) AS BIGINT) AS n_tiers,
         |  CAST(min(tier) AS INT) AS first_tier,
         |  CAST(max(tier) AS INT) AS last_tier,
         |  CAST(CAST(sum((pos * (sk % $P)) % $P) AS HUGEINT) % $P AS BIGINT)
         |    AS order_checksum
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin

    /** q129 — the q122 manifest body instantiated per epoch prefix
      * (`shard:` / `shard1:`), unioned. */
    val q129 = {
      def epoch(seed: Int): String = {
        val prefix = if (seed == 0) "'shard:'" else s"'shard$seed:'"
        s"""SELECT $seed AS epoch, shard, count(*) AS n_docs,
           |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           |  CAST(CAST(sum((pos * (sk % $P)) % $P) AS HUGEINT) % $P AS BIGINT)
           |    AS order_checksum
           |FROM (
           |  SELECT n_toks, sk, CAST(sk % 8 AS INT) AS shard,
           |    row_number() OVER (PARTITION BY sk % 8 ORDER BY sk, doc_id) AS pos
           |  FROM (
           |    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
           |      ${ph(s"$prefix || CAST(doc_id AS VARCHAR)")} AS sk
           |    FROM documents))
           |GROUP BY shard""".stripMargin
      }
      s"""SELECT CAST(epoch AS INT) AS epoch, shard, n_docs, n_tokens, order_checksum
         |FROM (${epoch(0)} UNION ALL ${epoch(1)})
         |ORDER BY epoch, shard""".stripMargin
    }

    /** q123 — q54's verdict shape with the α = 1/2 temperature rate:
      * sqrt is correctly rounded in both engines (IEEE 754), so the
      * round-6 micro-threshold is bit-identical. */
    val q123 =
      s"""WITH counts AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
         |mn AS (SELECT min(n_lang) AS n_min FROM counts),
         |v AS (
         |  SELECT d.lang,
         |    CAST(round(round(sqrt(n_min::DOUBLE / n_lang), 6) * 1000000, 0) AS BIGINT) AS thr,
         |    ${ph("'temp:' || CAST(doc_id AS VARCHAR)")} % 1000000 AS h
         |  FROM documents d JOIN counts USING (lang), mn)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  max(thr) AS keep_rate_micro
         |FROM v GROUP BY lang ORDER BY lang""".stripMargin

    /** q125 — q122's shard/key derivation, per-shard running token
      * positions in (key, id) order (ROWS frame; unique ordering makes
      * RANGE/ROWS identical, stated explicitly anyway), q59's
      * boundary-crossing arithmetic, ceil sequences, round-6
      * utilization. */
    val q125 =
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    ${ph("'shard:' || CAST(doc_id AS VARCHAR)")} AS sk
         |  FROM documents),
         |c AS (
         |  SELECT CAST(sk % 8 AS INT) AS shard, n_toks,
         |    sum(n_toks) OVER (PARTITION BY sk % 8 ORDER BY sk, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fin
         |  FROM d)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  CAST((max(fin) + 511) // 512 AS BIGINT) AS n_seqs,
         |  CAST(sum(CASE WHEN (fin - n_toks) // 512 != (fin - 1) // 512
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
         |  round(sum(n_toks)::DOUBLE / (((max(fin) + 511) // 512) * 512), 6)
         |    AS utilization
         |FROM c GROUP BY shard ORDER BY shard""".stripMargin

    /** q127 — identical ceil-div chunk arithmetic, chunk rows from
      * generate_series, least() tail width. */
    val q127 =
      s"""WITH d AS (
         |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents),
         |c AS (
         |  SELECT lang, n_toks, (n_toks + 63) // 64 AS nc,
         |    t.ci AS ci,
         |    least(64, n_toks - t.ci * 64) AS c_toks
         |  FROM d, LATERAL (SELECT unnest(generate_series(0, (n_toks + 63) // 64 - 1)) AS ci) t)
         |SELECT lang,
         |  CAST(sum(CASE WHEN ci = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN ci = 0 AND nc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
         |  count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN c_toks = 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_full_chunks,
         |  CAST(sum(c_toks) AS BIGINT) AS n_tokens,
         |  round(sum(c_toks)::DOUBLE / (count(*) * 64), 6) AS chunk_fill
         |FROM c GROUP BY lang ORDER BY lang""".stripMargin

    /** q126 — integer micro-sqrt per language summed as integers (no
      * order-sensitive float sum), identical least/div/round chain,
      * the q123 `temp:` membership draw. */
    val q126 =
      s"""WITH d AS (
         |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents),
         |tot AS (
         |  SELECT lang, count(*) AS n_docs_l, sum(n_toks) AS t_lang,
         |    CAST(round(round(sqrt(sum(n_toks)::DOUBLE), 6) * 1000000, 0) AS BIGINT) AS sqrt_micro
         |  FROM d GROUP BY lang),
         |g AS (SELECT sum(sqrt_micro) AS denom, sum(t_lang) AS t_total FROM tot),
         |r AS (
         |  SELECT lang, n_docs_l, t_lang,
         |    CAST(round(round(least(1.0,
         |      (((t_total * 7) // 8)::DOUBLE / t_lang) * (sqrt_micro::DOUBLE / denom)),
         |      6) * 1000000, 0) AS BIGINT) AS rate_micro
         |  FROM tot, g)
         |SELECT r.lang, CAST(max(n_docs_l) AS BIGINT) AS n_docs,
         |  CAST(max(t_lang) AS BIGINT) AS n_tokens,
         |  max(rate_micro) AS rate_micro,
         |  CAST(sum(CASE WHEN ${ph("'temp:' || CAST(doc_id AS VARCHAR)")} % 1000000
         |    < rate_micro THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN ${ph("'temp:' || CAST(doc_id AS VARCHAR)")} % 1000000
         |    < rate_micro THEN n_toks ELSE 0 END) AS BIGINT) AS tokens_kept
         |FROM r JOIN d USING (lang) GROUP BY r.lang ORDER BY r.lang""".stripMargin

    /** q124 — q24's corpus + pair CTE chain, q41's split buckets
      * (train < 80), leaked = the train side of any cross-split
      * verified pair; per-language rollup through the same
      * copy-inherits-source-language relation the engine builds. */
    val q124 =
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' extra token tail' FROM documents WHERE doc_id % 11 = 0),
         |$minhashPairCtes,
         |assign AS (
         |  SELECT doc_id, CASE WHEN ${ph("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 80
         |    THEN 'train' ELSE 'eval' END AS split FROM corpus),
         |leaked AS (
         |  SELECT DISTINCT CASE WHEN aa.split = 'train' THEN j.doc_a ELSE j.doc_b END AS doc_id
         |  FROM j
         |  JOIN assign aa ON aa.doc_id = j.doc_a
         |  JOIN assign ab ON ab.doc_id = j.doc_b
         |  WHERE j.jaccard >= 0.5 AND aa.split <> ab.split),
         |langrel AS (
         |  SELECT doc_id, lang FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang FROM documents WHERE doc_id % 11 = 0)
         |SELECT l.lang,
         |  CAST(sum(CASE WHEN a.split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |  CAST(sum(CASE WHEN a.split = 'eval' THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
         |  CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
         |  CAST(sum(CASE WHEN a.split = 'train' AND k.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_train_kept
         |FROM langrel l
         |JOIN assign a USING (doc_id)
         |LEFT JOIN leaked k USING (doc_id)
         |GROUP BY l.lang ORDER BY l.lang""".stripMargin

    /** q112 — the page fixture re-derived inline (the q106/q110
      * discipline), the identical tag-strip + line-rule cascade, and
      * the same doc-then-language rollup; every count is an integer
      * and the two shares divide once at the end. */
    private val q112 =
      """WITH pages AS (
        |  SELECT doc_id, lang,
        |    '<nav class="top"><a href="/">home</a> <A HREF="/a">about</A> <a' || chr(9) || 'href="/b">contact</a></nav>' || chr(10) ||
        |    '<h1 id="t">Document ' || CAST(doc_id AS VARCHAR) || '</h1>' || chr(10) ||
        |    '<p class="lead">' || substr(text, 1, length(text) // 2) || '</p>' || chr(10) ||
        |    '<li>menu</li>' || chr(10) ||
        |    '<p>' || substr(text, length(text) // 2 + 1) || ' <em>ends <b>here</b></em></p>' || chr(10) ||
        |    '<footer>copyright 2026 all rights reserved</footer>' AS html
        |  FROM documents),
        |ln AS (
        |  SELECT doc_id, lang, length(html) AS raw_chars,
        |    unnest(string_split(html, chr(10))) AS line
        |  FROM pages),
        |sc AS (
        |  SELECT doc_id, lang, raw_chars,
        |    length(trim(regexp_replace(line, '<[^>]*>', '', 'g'))) AS clean_len,
        |    len(regexp_extract_all(line, '(?i)<a[ \t>]')) AS n_links,
        |    contains(lower(trim(regexp_replace(line, '<[^>]*>', '', 'g'))),
        |      'copyright') AS has_copy
        |  FROM ln),
        |pd AS (
        |  SELECT doc_id, lang, raw_chars,
        |    sum(CASE WHEN clean_len >= 25 AND n_links < 2 AND NOT has_copy
        |      THEN clean_len ELSE 0 END) AS extracted_chars,
        |    count(*) AS n_lines,
        |    sum(CASE WHEN clean_len >= 25 AND n_links < 2 AND NOT has_copy
        |      THEN 0 ELSE 1 END) AS n_dropped
        |  FROM sc GROUP BY doc_id, lang, raw_chars)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(raw_chars) AS BIGINT) AS raw_chars,
        |  CAST(sum(extracted_chars) AS BIGINT) AS extracted_chars,
        |  CAST(sum(n_lines) AS BIGINT) AS n_lines,
        |  CAST(sum(n_dropped) AS BIGINT) AS n_dropped_lines,
        |  round(sum(extracted_chars)::DOUBLE / sum(raw_chars), 6) AS extracted_share,
        |  round(sum(n_dropped)::DOUBLE / sum(n_lines), 6) AS dropped_line_share
        |FROM pd GROUP BY lang ORDER BY lang""".stripMargin

    /** q113 — the end-to-end curation funnel twin: the corpus CTE is
      * q50/q111's reinsertion corpus WITH lang; every stage reuses the
      * standalone query's exact fragment (q46's verdict CASE, q91's
      * canonical digest, the shared [[nearDupCcChain]] over the
      * stage-2 survivors, q49's 8-gram shape, q54's hash quota
      * recomputed on the stage-4 counts); the report is six
      * per-language rollups unioned — the hash match proves the
      * COMPOSITION drops exactly the documents the standalone stages
      * drop. */
    val q113 =
      s"""WITH corpus AS (
         |  SELECT doc_id, lang, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, lang, text || ' extra token tail' FROM documents WHERE doc_id % 11 = 0),
         |qv AS (
         |  SELECT doc_id, lang, text,
         |    CASE WHEN n < 20 THEN 'too_short' WHEN n > 90 THEN 'too_long'
         |      WHEN ttr < 0.35 THEN 'low_diversity' WHEN rep > 0.08 THEN 'repetitive'
         |      ELSE 'keep' END AS verdict
         |  FROM (
         |    SELECT doc_id, lang, text, len(toks) AS n,
         |      len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
         |      CASE WHEN len(toks) >= 2
         |        THEN 1.0 - len(list_distinct(list_transform(
         |          generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])))
         |          * 1.0 / (len(toks) - 1)
         |        ELSE 0.0 END AS rep
         |    FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM corpus))),
         |s1 AS (SELECT doc_id, lang, text FROM qv WHERE verdict = 'keep'),
         |s2 AS (
         |  SELECT doc_id, lang, text FROM (
         |    SELECT doc_id, lang, text, min(doc_id) OVER (PARTITION BY md5(
         |      trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         |        ' +', ' ', 'g')))) AS min_id
         |    FROM s1)
         |  WHERE doc_id = min_id),
         |${nearDupCcChain("s2")},
         |sl AS (SELECT doc_id AS node, CAST(length(text) AS BIGINT) AS len FROM s2),
         |keepers AS (
         |  SELECT r.label, arg_max(r.node, sl.len * 1000000000 - r.node) AS keep_id
         |  FROM reach r JOIN sl ON sl.node = r.node GROUP BY r.label),
         |dd AS (
         |  SELECT r.node AS doc_id FROM reach r JOIN keepers k ON r.label = k.label
         |  WHERE r.node != k.keep_id),
         |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM dd)),
         |eg AS (
         |  SELECT DISTINCT ${phm("gram")} AS h FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(toks) - 7),
         |      i -> array_to_string(toks[i:i+7], ' '))) AS gram
         |    FROM (SELECT string_split(text, ' ') AS toks FROM documents
         |          WHERE doc_id % 17 = 0)
         |    WHERE len(toks) >= 8)),
         |cont AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_id, ${phm("gram")} AS h FROM (
         |      SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 7),
         |        i -> array_to_string(toks[i:i+7], ' '))) AS gram
         |      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM s3)
         |      WHERE len(toks) >= 8))
         |  WHERE h IN (SELECT h FROM eg)),
         |s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
         |cn AS (SELECT lang, count(*) AS n_lang FROM s4 GROUP BY lang),
         |mn AS (SELECT min(n_lang) AS n_min FROM cn),
         |s5 AS (
         |  SELECT s4.doc_id, s4.lang FROM s4 JOIN cn USING (lang), mn
         |  WHERE ${ph("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000
         |    < (n_min * 1000000) // n_lang),
         |f AS (
         |  SELECT 0 AS stage, 'ingest' AS stage_name, lang, count(*) AS n_docs FROM corpus GROUP BY lang
         |  UNION ALL SELECT 1, 'quality_gate', lang, count(*) FROM s1 GROUP BY lang
         |  UNION ALL SELECT 2, 'canonical_dedup', lang, count(*) FROM s2 GROUP BY lang
         |  UNION ALL SELECT 3, 'near_dup_keeper', lang, count(*) FROM s3 GROUP BY lang
         |  UNION ALL SELECT 4, 'decontam', lang, count(*) FROM s4 GROUP BY lang
         |  UNION ALL SELECT 5, 'mixing_quota', lang, count(*) FROM s5 GROUP BY lang)
         |SELECT CAST(stage AS INT) AS stage, stage_name, lang, n_docs
         |FROM f ORDER BY stage, lang""".stripMargin

    /** q115 — the drift twin: the q106 crawl-2 mutation CTE verbatim,
      * (lang, token) counts full-outer joined, the TV numerator as a
      * HUGEINT-exact `sum(abs(n1·t2 − n2·t1))`, one division +
      * round(6) per language at the end. */
    val q115 =
      """WITH v1 AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |v2src AS (
        |  SELECT lang, CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 != 0
        |  UNION ALL
        |  SELECT lang, text FROM documents WHERE doc_id % 11 = 0),
        |v2 AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM v2src),
        |c1 AS (SELECT lang, token, count(*) AS n1 FROM v1 GROUP BY lang, token),
        |c2 AS (SELECT lang, token, count(*) AS n2 FROM v2 GROUP BY lang, token),
        |j AS (
        |  SELECT lang, coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2
        |  FROM c1 FULL OUTER JOIN c2 USING (lang, token)),
        |t AS (
        |  SELECT lang, sum(n1) AS t1, sum(n2) AS t2,
        |    sum(CASE WHEN n1 > 0 THEN 1 ELSE 0 END) AS vocab_v1,
        |    sum(CASE WHEN n2 > 0 THEN 1 ELSE 0 END) AS vocab_v2,
        |    sum(CASE WHEN n1 = 0 THEN 1 ELSE 0 END) AS n_new_tokens,
        |    sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS n_lost_tokens
        |  FROM j GROUP BY lang),
        |d AS (
        |  SELECT j.lang, sum(abs(n1 * t2 - n2 * t1)) AS num
        |  FROM j JOIN t USING (lang) GROUP BY j.lang)
        |SELECT t.lang, CAST(t1 AS BIGINT) AS n_tokens_v1,
        |  CAST(t2 AS BIGINT) AS n_tokens_v2,
        |  CAST(vocab_v1 AS BIGINT) AS vocab_v1,
        |  CAST(vocab_v2 AS BIGINT) AS vocab_v2,
        |  CAST(n_new_tokens AS BIGINT) AS n_new_tokens,
        |  CAST(n_lost_tokens AS BIGINT) AS n_lost_tokens,
        |  round(num::DOUBLE / (t1::DOUBLE * t2::DOUBLE * 2.0), 6) AS tv_distance
        |FROM t JOIN d USING (lang) ORDER BY t.lang""".stripMargin

    /** q116 — the length-drift twin: the same mutation CTE, lower
      * deciles as pure integer positions into the sorted length list —
      * no interpolation, no doubles, nothing rounded. */
    val q116 =
      """WITH v1 AS (
        |  SELECT lang, CAST(length(text) AS BIGINT) AS len FROM documents),
        |v2 AS (
        |  SELECT lang, CAST(length(CASE WHEN doc_id % 7 = 0
        |      THEN text || ' rev2' ELSE text END) AS BIGINT) AS len
        |  FROM documents WHERE doc_id % 13 != 0
        |  UNION ALL
        |  SELECT lang, CAST(length(text) AS BIGINT) FROM documents WHERE doc_id % 11 = 0),
        |g1 AS (SELECT lang, count(*) AS n, list_sort(list(len)) AS vs FROM v1 GROUP BY lang),
        |g2 AS (SELECT lang, count(*) AS n, list_sort(list(len)) AS vs FROM v2 GROUP BY lang),
        |d1 AS (
        |  SELECT lang, k AS decile, n AS n_v1, vs[(n - 1) * k // 10 + 1] AS len_v1
        |  FROM g1, generate_series(1, 9) t(k)),
        |d2 AS (
        |  SELECT lang, k AS decile, n AS n_v2, vs[(n - 1) * k // 10 + 1] AS len_v2
        |  FROM g2, generate_series(1, 9) t(k))
        |SELECT d1.lang, CAST(d1.decile AS INT) AS decile, n_v1, n_v2,
        |  len_v1, len_v2, len_v2 - len_v1 AS shift
        |FROM d1 JOIN d2 ON d1.lang = d2.lang AND d1.decile = d2.decile
        |ORDER BY d1.lang, decile""".stripMargin

    /** q117 — the embedding-drift twin: q51's perturbation fixture for
      * the re-embedded subset, the `cent` per-dim rounded means for
      * both versions, sequential-fold cosine/norms over the rounded
      * ≤64-dim mean vectors, two final round(6) ratios. */
    val q117 =
      s"""WITH e AS (
         |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |v2 AS (
         |  SELECT vec_id, label,
         |    CASE WHEN vec_id % 9 = 0
         |      THEN list_transform(e, (x, i) -> x * (1.0 + 0.002 * ((vec_id + i - 1) % 3 - 1)))
         |      ELSE e END AS e
         |  FROM e WHERE vec_id % 13 != 0),
         |c1 AS (
         |  SELECT label, list(cavg ORDER BY pos) AS c FROM (
         |    SELECT label, i AS pos, round(avg(e[i]), 6) AS cavg
         |    FROM e, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |c2 AS (
         |  SELECT label, list(cavg ORDER BY pos) AS c FROM (
         |    SELECT label, i AS pos, round(avg(e[i]), 6) AS cavg
         |    FROM v2, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |n1 AS (SELECT label, count(*) AS n_v1 FROM e GROUP BY label),
         |n2 AS (SELECT label, count(*) AS n_v2 FROM v2 GROUP BY label)
         |SELECT CAST(c1.label AS BIGINT) AS label, n_v1, n_v2,
         |  round(${cos("c1.c", "c2.c")}, 6) AS centroid_cos,
         |  round(${nrm("c2.c")} / ${nrm("c1.c")}, 6) AS norm_ratio
         |FROM c1 JOIN c2 USING (label) JOIN n1 USING (label) JOIN n2 USING (label)
         |ORDER BY label""".stripMargin

    /** q114 — the sweep twin: q31's `cent` + [[fineClusterCtes]] give
      * the membership, q51's probe-expansion idiom gives the radius-1
      * clusters, both radii rank by the q31 discipline (round-4
      * cosine desc, id tiebreak) and score against the exact
      * full-corpus top-5; every count is an integer, the two ratios
      * divide once at the end. */
    val q114 =
      s"""WITH cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${fineClusterCtes("e")},
         |q AS (SELECT vec_id AS qid, e AS qe, cluster, mask FROM m WHERE vec_id < 10),
         |ex AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT q.qid, v.vec_id,
         |      row_number() OVER (PARTITION BY q.qid ORDER BY
         |        round(${cos("q.qe", "v.e")}, 4) DESC, v.vec_id) AS xr
         |    FROM q CROSS JOIN e v WHERE v.vec_id != q.qid)
         |  WHERE xr <= 5),
         |p1 AS (
         |  SELECT qid, qe,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM q),
         |c0 AS (
         |  SELECT q.qid, m.vec_id, round(${cos("q.qe", "m.e")}, 4) AS c4
         |  FROM m JOIN q USING (cluster) WHERE m.vec_id != q.qid),
         |c1 AS (
         |  SELECT p.qid, m.vec_id, round(${cos("p.qe", "m.e")}, 4) AS c4
         |  FROM m JOIN p1 p USING (cluster) WHERE m.vec_id != p.qid),
         |t0 AS (
         |  SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY c4 DESC, vec_id) AS rk
         |    FROM c0) WHERE rk <= 5),
         |t1 AS (
         |  SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY c4 DESC, vec_id) AS rk
         |    FROM c1) WHERE rk <= 5),
         |r0 AS (
         |  SELECT 0 AS radius, (SELECT count(*) FROM q) AS n_queries,
         |    (SELECT count(*) FROM c0) AS n_candidates,
         |    (SELECT count(*) FROM t0 JOIN ex USING (qid, vec_id)) AS n_hits),
         |r1 AS (
         |  SELECT 1 AS radius, (SELECT count(*) FROM q) AS n_queries,
         |    (SELECT count(*) FROM c1) AS n_candidates,
         |    (SELECT count(*) FROM t1 JOIN ex USING (qid, vec_id)) AS n_hits)
         |SELECT CAST(radius AS INT) AS radius, n_queries, n_candidates,
         |  round(n_candidates::DOUBLE / n_queries, 6) AS avg_candidates,
         |  n_hits, round(n_hits::DOUBLE / (n_queries * 5), 6) AS recall_at_5
         |FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r1)
         |ORDER BY radius""".stripMargin

    /** q128 — q114's skeleton with the radius-2 CTE added: actives
      * once per query, one-flip and ordered two-flip lists prepended
      * to the home cluster (all XORs of distinct bit subsets —
      * pairwise distinct, no candidate dedup), c2/t2/r2 mirroring
      * c1/t1/r1. */
    val q128 =
      s"""WITH cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${fineClusterCtes("e")},
         |q AS (SELECT vec_id AS qid, e AS qe, cluster, mask,
         |  list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0) AS actives
         |  FROM m WHERE vec_id < 10),
         |ex AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT q.qid, v.vec_id,
         |      row_number() OVER (PARTITION BY q.qid ORDER BY
         |        round(${cos("q.qe", "v.e")}, 4) DESC, v.vec_id) AS xr
         |    FROM q CROSS JOIN e v WHERE v.vec_id != q.qid)
         |  WHERE xr <= 5),
         |p1 AS (
         |  SELECT qid, qe, unnest(list_prepend(cluster,
         |    list_transform(actives, j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM q),
         |p2 AS (
         |  SELECT qid, qe, unnest(list_prepend(cluster, list_concat(
         |    list_transform(actives, j -> xor(cluster, CAST(2**j AS BIGINT))),
         |    flatten(list_transform(actives, j ->
         |      list_transform(list_filter(actives, k -> k > j),
         |        k -> xor(xor(cluster, CAST(2**j AS BIGINT)), CAST(2**k AS BIGINT)))))))) AS cluster
         |  FROM q),
         |c0 AS (
         |  SELECT q.qid, m.vec_id, round(${cos("q.qe", "m.e")}, 4) AS c4
         |  FROM m JOIN q USING (cluster) WHERE m.vec_id != q.qid),
         |c1 AS (
         |  SELECT p.qid, m.vec_id, round(${cos("p.qe", "m.e")}, 4) AS c4
         |  FROM m JOIN p1 p USING (cluster) WHERE m.vec_id != p.qid),
         |c2 AS (
         |  SELECT p.qid, m.vec_id, round(${cos("p.qe", "m.e")}, 4) AS c4
         |  FROM m JOIN p2 p USING (cluster) WHERE m.vec_id != p.qid),
         |t0 AS (
         |  SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY c4 DESC, vec_id) AS rk
         |    FROM c0) WHERE rk <= 5),
         |t1 AS (
         |  SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY c4 DESC, vec_id) AS rk
         |    FROM c1) WHERE rk <= 5),
         |t2 AS (
         |  SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY c4 DESC, vec_id) AS rk
         |    FROM c2) WHERE rk <= 5),
         |r0 AS (
         |  SELECT 0 AS radius, (SELECT count(*) FROM q) AS n_queries,
         |    (SELECT count(*) FROM c0) AS n_candidates,
         |    (SELECT count(*) FROM t0 JOIN ex USING (qid, vec_id)) AS n_hits),
         |r1 AS (
         |  SELECT 1 AS radius, (SELECT count(*) FROM q) AS n_queries,
         |    (SELECT count(*) FROM c1) AS n_candidates,
         |    (SELECT count(*) FROM t1 JOIN ex USING (qid, vec_id)) AS n_hits),
         |r2 AS (
         |  SELECT 2 AS radius, (SELECT count(*) FROM q) AS n_queries,
         |    (SELECT count(*) FROM c2) AS n_candidates,
         |    (SELECT count(*) FROM t2 JOIN ex USING (qid, vec_id)) AS n_hits)
         |SELECT CAST(radius AS INT) AS radius, n_queries, n_candidates,
         |  round(n_candidates::DOUBLE / n_queries, 6) AS avg_candidates,
         |  n_hits, round(n_hits::DOUBLE / (n_queries * 5), 6) AS recall_at_5
         |FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL SELECT * FROM r2)
         |ORDER BY radius""".stripMargin

    /** q118 — the multi-probe SERVE twin: q31's `cent` +
      * [[fineClusterCtes]] membership, q114's radius-1 probe-expansion
      * idiom on the query side (home sub-bucket prepended to every
      * active-bit flip — all ids distinct, so no candidate dedup), then
      * exactly the q31 ranking discipline (round-4 cosine desc, vec_id
      * tiebreak). */
    val q118 =
      s"""WITH cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${fineClusterCtes("e")},
         |q0 AS (SELECT vec_id AS query_id, e AS qe, cluster, mask
         |  FROM m WHERE vec_id < 10),
         |q AS (
         |  SELECT query_id, qe,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM q0),
         |scored AS (
         |  SELECT query_id, vec_id, round(${cos("qe", "m.e")}, 4) AS cosine
         |  FROM m JOIN q USING (cluster) WHERE vec_id <> query_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT query_id, rk, vec_id, cosine FROM ranked WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin

    /** q130 — the trained-coarse SERVE twin: q118's skeleton with the
      * label-centroid `cent` CTE swapped for [[derivedCentCtes]]
      * (q61/q119's Lloyd chain verbatim), same radius-1 probe
      * expansion, same q31 ranking discipline. */
    val q130 =
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${derivedCentCtes("e")},
         |${fineClusterCtes("e")},
         |q0 AS (SELECT vec_id AS query_id, e AS qe, cluster, mask
         |  FROM m WHERE vec_id < 10),
         |q AS (
         |  SELECT query_id, qe,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM q0),
         |scored AS (
         |  SELECT query_id, vec_id, round(${cos("qe", "m.e")}, 4) AS cosine
         |  FROM m JOIN q USING (cluster) WHERE vec_id <> query_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT query_id, rk, vec_id, cosine FROM ranked WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin

    /** q132 — soft-dedup twin: the q50/q111 corpus (with lang carried
      * through the reinsertions) + the shared [[nearDupCcChain]]
      * components; effective mass in exact integer micro-tokens via
      * floor division, one round-6 division per report row. */
    /** The q132/q134 per-document soft-weight CTE block — the
      * reinsertion corpus (lang carried), the shared CC chain, and
      * `w(doc_id, lang, n_tok, csize, eff_micro)`. */
    private val softDocCtes =
      s"""corpus AS (
         |  SELECT doc_id, lang, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, lang, text || ' extra token tail' FROM documents WHERE doc_id % 11 = 0),
         |${nearDupCcChain("corpus")},
         |cs AS (SELECT label, count(*) AS csize FROM reach GROUP BY label),
         |ns AS (SELECT node, csize FROM reach JOIN cs USING (label)),
         |w AS (
         |  SELECT c.doc_id, c.lang,
         |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tok,
         |    coalesce(ns.csize, 1) AS csize,
         |    (CAST(len(string_split(c.text, ' ')) AS BIGINT) * 1000000)
         |      // coalesce(ns.csize, 1) AS eff_micro
         |  FROM corpus c LEFT JOIN ns ON ns.node = c.doc_id)""".stripMargin

    val q132 =
      s"""WITH $softDocCtes
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_weighted_down,
         |  CAST(sum(n_tok) AS BIGINT) AS raw_tokens,
         |  CAST(sum(eff_micro) AS BIGINT) AS eff_tokens_micro,
         |  round(CAST(sum(eff_micro) AS DOUBLE)
         |    / (CAST(sum(n_tok) AS DOUBLE) * 1000000), 6) AS retention
         |FROM w GROUP BY lang ORDER BY lang""".stripMargin

    /** q134 — q126's rate/membership arithmetic verbatim with the
      * language masses swapped to [[softDocCtes]]' effective
      * micro-tokens; the same `temp:` draw keeps membership consistent
      * with q123/q126. */
    val q134 =
      s"""WITH $softDocCtes,
         |tot AS (
         |  SELECT lang, count(*) AS n_docs_l, CAST(sum(n_tok) AS BIGINT) AS raw_l,
         |    CAST(sum(eff_micro) AS BIGINT) AS eff_l
         |  FROM w GROUP BY lang),
         |t2 AS (SELECT *, CAST(round(round(sqrt(eff_l / 1000000.0), 6) * 1000000, 0) AS BIGINT) AS sqrt_micro FROM tot),
         |g AS (SELECT CAST(sum(sqrt_micro) AS BIGINT) AS denom,
         |  CAST(sum(eff_l) AS BIGINT) AS eff_total FROM t2),
         |r AS (
         |  SELECT lang, n_docs_l, raw_l, eff_l,
         |    CAST(round(round(least(1.0,
         |      (((eff_total * 7) // 8)::DOUBLE / eff_l) * (sqrt_micro::DOUBLE / denom)),
         |      6) * 1000000, 0) AS BIGINT) AS rate_micro
         |  FROM t2, g)
         |SELECT r.lang, CAST(max(n_docs_l) AS BIGINT) AS n_docs,
         |  max(raw_l) AS raw_tokens, max(eff_l) AS eff_tokens_micro,
         |  max(rate_micro) AS rate_micro,
         |  CAST(sum(CASE WHEN ${ph("'temp:' || CAST(w.doc_id AS VARCHAR)")} % 1000000
         |    < rate_micro THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN ${ph("'temp:' || CAST(w.doc_id AS VARCHAR)")} % 1000000
         |    < rate_micro THEN w.eff_micro ELSE 0 END) AS BIGINT) AS eff_kept_micro
         |FROM r JOIN w USING (lang) GROUP BY r.lang ORDER BY r.lang""".stripMargin

    /** q133 — hybrid-RRF twin: q57's BM25 expression per query (terms
      * = the query doc's distinct tokens) with per-term weights
      * rounded to integer micro-units BEFORE the sum, the q31 cosine
      * discipline on the dense leg, integer RRF fusion. */
    val q133 =
      s"""WITH dd AS (
         |  SELECT doc_id, len(toks) AS dl, toks
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |qt AS (
         |  SELECT doc_id AS query_id, unnest(list_distinct(toks)) AS t
         |  FROM dd WHERE doc_id < 10),
         |qv AS (SELECT DISTINCT t FROM qt),
         |st AS (SELECT count(*)::DOUBLE AS nn, avg(dl) AS avgdl FROM dd),
         |tf AS (
         |  SELECT doc_id, dl, t, count(*)::DOUBLE AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS t FROM dd) u
         |  WHERE t IN (SELECT t FROM qv)
         |  GROUP BY doc_id, dl, t),
         |dfr AS (SELECT t, count(*)::DOUBLE AS df FROM tf GROUP BY t),
         |wm AS (
         |  SELECT doc_id, t, CAST(round(
         |    ln(1.0 + (nn - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
         |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1000000) AS BIGINT) AS w_micro
         |  FROM tf JOIN dfr USING (t), st),
         |sp0 AS (
         |  SELECT q.query_id, w.doc_id, CAST(sum(w.w_micro) AS BIGINT) AS s_micro
         |  FROM wm w JOIN qt q USING (t) WHERE w.doc_id <> q.query_id
         |  GROUP BY q.query_id, w.doc_id),
         |sp AS (SELECT query_id, doc_id, srk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY s_micro DESC, doc_id) AS srk FROM sp0)
         |  WHERE srk <= 20),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |q2 AS (SELECT vec_id AS query_id, e AS qe FROM e WHERE vec_id < 10),
         |dn0 AS (
         |  SELECT query_id, v.vec_id AS doc_id, round(${cos("q2.qe", "v.e")}, 6) AS c6
         |  FROM e v JOIN q2 ON v.vec_id <> q2.query_id),
         |dn AS (SELECT query_id, doc_id, drk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY c6 DESC, doc_id) AS drk FROM dn0)
         |  WHERE drk <= 20),
         |fused AS (
         |  SELECT coalesce(sp.query_id, dn.query_id) AS query_id,
         |    coalesce(sp.doc_id, dn.doc_id) AS doc_id,
         |    coalesce(srk, 0) AS sparse_rank, coalesce(drk, 0) AS dense_rank
         |  FROM sp FULL OUTER JOIN dn
         |    ON sp.query_id = dn.query_id AND sp.doc_id = dn.doc_id),
         |sc AS (
         |  SELECT query_id, doc_id, sparse_rank, dense_rank,
         |    CAST(CASE WHEN sparse_rank > 0 THEN 1000000 // (60 + sparse_rank) ELSE 0 END
         |      + CASE WHEN dense_rank > 0 THEN 1000000 // (60 + dense_rank) ELSE 0 END
         |      AS BIGINT) AS rrf_micro
         |  FROM fused),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_micro DESC, doc_id) AS rk FROM sc)
         |SELECT query_id, CAST(rk AS INT) AS rk, doc_id, rrf_micro,
         |  CAST(sparse_rank AS INT) AS sparse_rank,
         |  CAST(dense_rank AS INT) AS dense_rank
         |FROM ranked WHERE rk <= 10
         |ORDER BY query_id, rk""".stripMargin

    /** q138 — the at-rest hybrid twin: q133's sparse CTEs verbatim
      * (index-served postings are row-identical to tokenization — the
      * q86==q57 property), the dense leg swapped to IVF radius-1
      * candidates (q118's `cent` + [[fineClusterCtes]] + probe
      * expansion), same integer RRF fusion and output shape. */
    val q138 =
      s"""WITH dd AS (
         |  SELECT doc_id, len(toks) AS dl, toks
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |qt AS (
         |  SELECT doc_id AS query_id, unnest(list_distinct(toks)) AS t
         |  FROM dd WHERE doc_id < 10),
         |qv AS (SELECT DISTINCT t FROM qt),
         |st AS (SELECT count(*)::DOUBLE AS nn, avg(dl) AS avgdl FROM dd),
         |tfp AS (
         |  SELECT doc_id, dl, t, count(*)::DOUBLE AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS t FROM dd) u
         |  WHERE t IN (SELECT t FROM qv)
         |  GROUP BY doc_id, dl, t),
         |dfr AS (SELECT t, count(*)::DOUBLE AS df FROM tfp GROUP BY t),
         |wmm AS (
         |  SELECT doc_id, t, CAST(round(
         |    ln(1.0 + (nn - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
         |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1000000) AS BIGINT) AS w_micro
         |  FROM tfp JOIN dfr USING (t), st),
         |sp0 AS (
         |  SELECT q.query_id, w.doc_id, CAST(sum(w.w_micro) AS BIGINT) AS s_micro
         |  FROM wmm w JOIN qt q USING (t) WHERE w.doc_id <> q.query_id
         |  GROUP BY q.query_id, w.doc_id),
         |sp AS (SELECT query_id, doc_id, srk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY s_micro DESC, doc_id) AS srk FROM sp0)
         |  WHERE srk <= 20),
         |cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${fineClusterCtes("e")},
         |q0 AS (SELECT vec_id AS query_id, e AS qe, cluster, mask
         |  FROM m WHERE vec_id < 10),
         |qp AS (
         |  SELECT query_id, qe,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM q0),
         |dn0 AS (
         |  SELECT query_id, m.vec_id AS doc_id, round(${cos("qe", "m.e")}, 6) AS c6
         |  FROM m JOIN qp USING (cluster) WHERE m.vec_id <> query_id),
         |dn AS (SELECT query_id, doc_id, drk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY c6 DESC, doc_id) AS drk FROM dn0)
         |  WHERE drk <= 20),
         |fused AS (
         |  SELECT coalesce(sp.query_id, dn.query_id) AS query_id,
         |    coalesce(sp.doc_id, dn.doc_id) AS doc_id,
         |    coalesce(srk, 0) AS sparse_rank, coalesce(drk, 0) AS dense_rank
         |  FROM sp FULL OUTER JOIN dn
         |    ON sp.query_id = dn.query_id AND sp.doc_id = dn.doc_id),
         |scf AS (
         |  SELECT query_id, doc_id, sparse_rank, dense_rank,
         |    CAST(CASE WHEN sparse_rank > 0 THEN 1000000 // (60 + sparse_rank) ELSE 0 END
         |      + CASE WHEN dense_rank > 0 THEN 1000000 // (60 + dense_rank) ELSE 0 END
         |      AS BIGINT) AS rrf_micro
         |  FROM fused),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_micro DESC, doc_id) AS rk FROM scf)
         |SELECT query_id, CAST(rk AS INT) AS rk, doc_id, rrf_micro,
         |  CAST(sparse_rank AS INT) AS sparse_rank,
         |  CAST(dense_rank AS INT) AS dense_rank
         |FROM ranked WHERE rk <= 10
         |ORDER BY query_id, rk""".stripMargin

    /** The shared q135/q136 leg CTE block: planted corpora (text
      * twins %33, embedding twins %99), both-modality query universe,
      * sparse/dense leg rankings `sp`/`dn` and the unfused outer-join
      * `fused(query_id, doc_id, sparse_rank, dense_rank)`. */
    private val retrievalEvalCtes =
      s"""dd0 AS (SELECT doc_id, text FROM documents),
         |dpl AS (
         |  SELECT doc_id, text FROM dd0
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' extra token tail' FROM dd0 WHERE doc_id % 33 = 0),
         |dd AS (
         |  SELECT doc_id, len(toks) AS dl, toks
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM dpl)),
         |qids AS (
         |  -- a query needs BOTH modalities (text + embedding); at some
         |  -- SFs the embeddings table is smaller than documents, so the
         |  -- intersection is the query universe (the engine's join).
         |  -- The panel is BOUNDED (first 64 %33 ids) so the audit cost
         |  -- never grows with the corpus (the engine's EvalPanelCap)
         |  SELECT doc_id AS query_id FROM dd0
         |  JOIN embeddings ON doc_id = vec_id
         |  WHERE doc_id % 33 = 0 AND doc_id < 2112),
         |qt AS (
         |  SELECT d.doc_id AS query_id, unnest(list_distinct(d.toks)) AS t
         |  FROM dd d JOIN qids ON d.doc_id = qids.query_id),
         |qv AS (SELECT DISTINCT t FROM qt),
         |st AS (SELECT count(*)::DOUBLE AS nn, avg(dl) AS avgdl FROM dd),
         |tf AS (
         |  SELECT doc_id, dl, t, count(*)::DOUBLE AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS t FROM dd) u
         |  WHERE t IN (SELECT t FROM qv)
         |  GROUP BY doc_id, dl, t),
         |dfr AS (SELECT t, count(*)::DOUBLE AS df FROM tf GROUP BY t),
         |wm AS (
         |  SELECT doc_id, t, CAST(round(
         |    ln(1.0 + (nn - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
         |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1000000) AS BIGINT) AS w_micro
         |  FROM tf JOIN dfr USING (t), st),
         |sp0 AS (
         |  SELECT q.query_id, w.doc_id, CAST(sum(w.w_micro) AS BIGINT) AS s_micro
         |  FROM wm w JOIN qt q USING (t) WHERE w.doc_id <> q.query_id
         |  GROUP BY q.query_id, w.doc_id),
         |sp AS (SELECT query_id, doc_id, srk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY s_micro DESC, doc_id) AS srk FROM sp0)
         |  WHERE srk <= 20),
         |e0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |epl AS (
         |  SELECT vec_id, e FROM e0
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_transform(embedding, (x, i) ->
         |      x::DOUBLE * (1.0 + 0.002 * ((vec_id + i - 1) % 3 - 1)))
         |  FROM embeddings WHERE vec_id % 99 = 0),
         |q2 AS (SELECT e0.vec_id AS query_id, e0.e AS qe
         |  FROM e0 JOIN qids ON e0.vec_id = qids.query_id),
         |dn0 AS (
         |  SELECT query_id, v.vec_id AS doc_id, round(${cos("q2.qe", "v.e")}, 6) AS c6
         |  FROM epl v JOIN q2 ON v.vec_id <> q2.query_id),
         |dn AS (SELECT query_id, doc_id, drk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY c6 DESC, doc_id) AS drk FROM dn0)
         |  WHERE drk <= 20),
         |fused AS (
         |  SELECT coalesce(sp.query_id, dn.query_id) AS query_id,
         |    coalesce(sp.doc_id, dn.doc_id) AS doc_id,
         |    coalesce(srk, 0) AS sparse_rank, coalesce(drk, 0) AS dense_rank
         |  FROM sp FULL OUTER JOIN dn
         |    ON sp.query_id = dn.query_id AND sp.doc_id = dn.doc_id)""".stripMargin

    /** q136 — the fusion-weight grid twin: the shared leg CTEs, one
      * weighted re-rank + twin rollup per (w_sparse, w_dense) pair. */
    val q136 = {
      val cfg = Seq((4, 0), (3, 1), (2, 2), (1, 3), (0, 4)).map { case (ws, wd) =>
        s"""sc_${ws}_$wd AS (
           |  SELECT query_id, doc_id,
           |    ($ws * (CASE WHEN sparse_rank > 0 THEN 1000000 // (60 + sparse_rank) ELSE 0 END)
           |      + $wd * (CASE WHEN dense_rank > 0 THEN 1000000 // (60 + dense_rank) ELSE 0 END)) AS rrf_micro
           |  FROM fused),
           |hy_${ws}_$wd AS (SELECT query_id, doc_id, rk FROM (
           |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
           |      ORDER BY rrf_micro DESC, doc_id) AS rk FROM sc_${ws}_$wd)
           |  WHERE rk <= 10),
           |tw_${ws}_$wd AS (SELECT q.query_id, h.rk AS trk FROM qids q
           |  LEFT JOIN hy_${ws}_$wd h ON h.query_id = q.query_id AND h.doc_id = q.query_id + 1000000),
           |m_${ws}_$wd AS (SELECT $ws AS w_sparse_q, $wd AS w_dense_q,
           |  count(*) AS n_queries, count(trk) AS n_found,
           |  CAST(sum(CASE WHEN trk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
           |  CAST(sum(CASE WHEN trk IS NOT NULL THEN 1000000 // trk ELSE 0 END)
           |    // count(*) AS BIGINT) AS mrr_micro FROM tw_${ws}_$wd)""".stripMargin
      }.mkString(",\n")
      val unions = Seq((4, 0), (3, 1), (2, 2), (1, 3), (0, 4))
        .map { case (ws, wd) => s"SELECT * FROM m_${ws}_$wd" }
        .mkString(" UNION ALL ")
      s"""WITH $retrievalEvalCtes,
         |$cfg
         |SELECT CAST(w_sparse_q AS INT) AS w_sparse_q,
         |  CAST(w_dense_q AS INT) AS w_dense_q,
         |  n_queries, n_found, hits_at_1, mrr_micro
         |FROM ($unions)
         |ORDER BY w_sparse_q DESC""".stripMargin
    }

    /** q140 — the coverage-aware fusion twin: the shared leg CTEs, a
      * dense-corpus membership flag on the fused relation, then the
      * plain and coverage scores ranked and rolled up by the q135
      * twin-metric shape. The coverage rule mirrors
      * [[rrfFuseCoverage]] exactly: weight 128 on dense evidence
      * (+1 tie tip) and on sparse evidence for docs OUTSIDE the
      * embedded corpus, baseline 1 for covered docs the dense leg
      * declined to rank. */
    val q140 = {
      def ranked(src: String, name: String) =
        s"""hy_$name AS (SELECT query_id, doc_id, rk FROM (
           |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
           |      ORDER BY rrf_micro DESC, doc_id) AS rk FROM $src)
           |  WHERE rk <= 10),
           |tw_$name AS (SELECT q.query_id, h.rk AS trk FROM qids q
           |  LEFT JOIN hy_$name h ON h.query_id = q.query_id AND h.doc_id = q.query_id + 1000000),
           |m_$name AS (SELECT '$name' AS method, 10 AS depth,
           |  count(*) AS n_queries, count(trk) AS n_found,
           |  CAST(sum(CASE WHEN trk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
           |  CAST(sum(CASE WHEN trk IS NOT NULL THEN 1000000 // trk ELSE 0 END)
           |    // count(*) AS BIGINT) AS mrr_micro FROM tw_$name)""".stripMargin
      s"""WITH $retrievalEvalCtes,
         |fcov AS (
         |  SELECT f.*, (f.doc_id IN (SELECT vec_id FROM epl)) AS dense_covered
         |  FROM fused f),
         |sc_plain AS (
         |  SELECT query_id, doc_id,
         |    CAST(CASE WHEN sparse_rank > 0 THEN 1000000 // (60 + sparse_rank) ELSE 0 END
         |      + CASE WHEN dense_rank > 0 THEN 1000000 // (60 + dense_rank) ELSE 0 END
         |      AS BIGINT) AS rrf_micro
         |  FROM fused),
         |sc_cov AS (
         |  SELECT query_id, doc_id,
         |    CAST(CASE WHEN sparse_rank > 0 THEN
         |        (CASE WHEN dense_covered THEN 1 ELSE 128 END) * (1000000 // (60 + sparse_rank)) ELSE 0 END
         |      + CASE WHEN dense_rank > 0 THEN 128 * (1000000 // (60 + dense_rank)) + 1 ELSE 0 END
         |      AS BIGINT) AS rrf_micro
         |  FROM fcov),
         |${ranked("sc_plain", "hybrid_rrf")},
         |${ranked("sc_cov", "hybrid_coverage")}
         |SELECT method, CAST(depth AS INT) AS depth,
         |  n_queries, n_found, hits_at_1, mrr_micro
         |FROM (SELECT * FROM m_hybrid_coverage UNION ALL SELECT * FROM m_hybrid_rrf)
         |ORDER BY method""".stripMargin
    }

    /** q139 — the pruned-eval twin: the shared leg CTEs, the dense
      * side re-derived over the PLANTED corpus via `cent` +
      * [[fineClusterCtes]]("epl") + the radius-1 probe expansion, then
      * the q135 twin rollups for the two pruned methods. */
    val q139 =
      s"""WITH $retrievalEvalCtes,
         |cent AS (
         |  SELECT label, list(cavg ORDER BY pos) AS cvec FROM (
         |    SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS cavg
         |    FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i)
         |  GROUP BY label),
         |${fineClusterCtes("epl")},
         |q0 AS (SELECT m.vec_id AS query_id, m.e AS qe, m.cluster, m.mask
         |  FROM m JOIN qids ON m.vec_id = qids.query_id),
         |qp AS (
         |  SELECT query_id, qe,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM q0),
         |dnp0 AS (
         |  SELECT query_id, m.vec_id AS doc_id, round(${cos("qe", "m.e")}, 6) AS c6
         |  FROM m JOIN qp USING (cluster) WHERE m.vec_id <> query_id),
         |dnp AS (SELECT query_id, doc_id, drk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY c6 DESC, doc_id) AS drk FROM dnp0)
         |  WHERE drk <= 20),
         |fusedp AS (
         |  SELECT coalesce(sp.query_id, dnp.query_id) AS query_id,
         |    coalesce(sp.doc_id, dnp.doc_id) AS doc_id,
         |    coalesce(srk, 0) AS sparse_rank, coalesce(drk, 0) AS dense_rank
         |  FROM sp FULL OUTER JOIN dnp
         |    ON sp.query_id = dnp.query_id AND sp.doc_id = dnp.doc_id),
         |scp AS (
         |  SELECT query_id, doc_id,
         |    (CASE WHEN sparse_rank > 0 THEN 1000000 // (60 + sparse_rank) ELSE 0 END
         |      + CASE WHEN dense_rank > 0 THEN 1000000 // (60 + dense_rank) ELSE 0 END) AS rrf_micro
         |  FROM fusedp),
         |hyp AS (SELECT query_id, doc_id, rk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf_micro DESC, doc_id) AS rk FROM scp)
         |  WHERE rk <= 10),
         |tw_dp AS (SELECT q.query_id, dnp.drk AS trk FROM qids q
         |  LEFT JOIN dnp ON dnp.query_id = q.query_id AND dnp.doc_id = q.query_id + 1000000),
         |tw_hp AS (SELECT q.query_id, hyp.rk AS trk FROM qids q
         |  LEFT JOIN hyp ON hyp.query_id = q.query_id AND hyp.doc_id = q.query_id + 1000000),
         |m_dp AS (SELECT 'dense_ivf' AS method, 20 AS depth, count(*) AS n_queries,
         |  count(trk) AS n_found,
         |  CAST(sum(CASE WHEN trk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
         |  CAST(sum(CASE WHEN trk IS NOT NULL THEN 1000000 // trk ELSE 0 END)
         |    // count(*) AS BIGINT) AS mrr_micro FROM tw_dp),
         |m_hp AS (SELECT 'hybrid_ivf' AS method, 10 AS depth, count(*) AS n_queries,
         |  count(trk) AS n_found,
         |  CAST(sum(CASE WHEN trk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
         |  CAST(sum(CASE WHEN trk IS NOT NULL THEN 1000000 // trk ELSE 0 END)
         |    // count(*) AS BIGINT) AS mrr_micro FROM tw_hp)
         |SELECT method, CAST(depth AS INT) AS depth, n_queries, n_found,
         |  hits_at_1, mrr_micro
         |FROM (SELECT * FROM m_dp UNION ALL SELECT * FROM m_hp)
         |ORDER BY method""".stripMargin

    /** q135 — known-item eval twin: q133's leg CTEs over the planted
      * corpora (text twins at %33, embedding twins only at %99 — the
      * q51 perturbation, 1-based lambda index), twin-rank lookups per
      * method, integer MRR/hit rollups. */
    val q135 =
      s"""WITH $retrievalEvalCtes,
         |scf AS (
         |  SELECT query_id, doc_id,
         |    (CASE WHEN sparse_rank > 0 THEN 1000000 // (60 + sparse_rank) ELSE 0 END
         |      + CASE WHEN dense_rank > 0 THEN 1000000 // (60 + dense_rank) ELSE 0 END) AS rrf_micro
         |  FROM fused),
         |hy AS (SELECT query_id, doc_id, rk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf_micro DESC, doc_id) AS rk FROM scf)
         |  WHERE rk <= 10),
         |tw_s AS (SELECT q.query_id, sp.srk AS trk FROM qids q
         |  LEFT JOIN sp ON sp.query_id = q.query_id AND sp.doc_id = q.query_id + 1000000),
         |tw_d AS (SELECT q.query_id, dn.drk AS trk FROM qids q
         |  LEFT JOIN dn ON dn.query_id = q.query_id AND dn.doc_id = q.query_id + 1000000),
         |tw_h AS (SELECT q.query_id, hy.rk AS trk FROM qids q
         |  LEFT JOIN hy ON hy.query_id = q.query_id AND hy.doc_id = q.query_id + 1000000),
         |m_s AS (SELECT 'sparse' AS method, 20 AS depth, count(*) AS n_queries,
         |  count(trk) AS n_found,
         |  CAST(sum(CASE WHEN trk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
         |  CAST(sum(CASE WHEN trk IS NOT NULL THEN 1000000 // trk ELSE 0 END)
         |    // count(*) AS BIGINT) AS mrr_micro FROM tw_s),
         |m_d AS (SELECT 'dense' AS method, 20 AS depth, count(*) AS n_queries,
         |  count(trk) AS n_found,
         |  CAST(sum(CASE WHEN trk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
         |  CAST(sum(CASE WHEN trk IS NOT NULL THEN 1000000 // trk ELSE 0 END)
         |    // count(*) AS BIGINT) AS mrr_micro FROM tw_d),
         |m_h AS (SELECT 'hybrid' AS method, 10 AS depth, count(*) AS n_queries,
         |  count(trk) AS n_found,
         |  CAST(sum(CASE WHEN trk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
         |  CAST(sum(CASE WHEN trk IS NOT NULL THEN 1000000 // trk ELSE 0 END)
         |    // count(*) AS BIGINT) AS mrr_micro FROM tw_h)
         |SELECT method, CAST(depth AS INT) AS depth, n_queries, n_found,
         |  hits_at_1, mrr_micro
         |FROM (SELECT * FROM m_s UNION ALL SELECT * FROM m_d UNION ALL SELECT * FROM m_h)
         |ORDER BY method""".stripMargin

    /** The banding-sweep twin, parameterized by the (bands, rows)
      * grid: the shared [[minhashSigCtes]] signatures, exact ground
      * truth via VALUE-ordered prefix filtering at t = 1/2 (the prefix
      * theorem holds under any shared global order, so the engine's
      * df-ordered prefixes and this value-ordered form verify the SAME
      * truth set), md5-band-hashed candidate buckets per config, hits
      * = candidates ∩ truth. Behind q131 (full-signature bandings) and
      * q147 (the verified gate's prefix-band configs). */
    private def bandingSweepSql(configs: Seq[(Int, Int)]): String = {
      val cfgCtes = configs.zipWithIndex.map { case ((b, r), i) =>
        s"""bands_$i AS (
           |  SELECT doc_id, b, ${phm(s"array_to_string(list_transform(msig[$r*b+1 : $r*b+$r], x -> CAST(x AS VARCHAR)), ',')")} AS bsig
           |  FROM sig, generate_series(0, ${b - 1}) t(b)),
           |cand_$i AS (
           |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |  FROM bands_$i x JOIN bands_$i y
           |    ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
           |row_$i AS (
           |  SELECT $b AS bands, $r AS rows_per_band,
           |    (SELECT count(*) FROM truth) AS n_truth,
           |    (SELECT count(*) FROM cand_$i) AS n_candidates,
           |    (SELECT count(*) FROM (SELECT * FROM cand_$i INTERSECT SELECT * FROM truth)) AS n_hits)""".stripMargin
      }.mkString(",\n")
      val unions = configs.indices
        .map(i => s"SELECT * FROM row_$i").mkString(" UNION ALL ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' extra token tail' FROM documents WHERE doc_id % 11 = 0),
         |$minhashSigCtes,
         |pref AS (
         |  SELECT doc_id, len(hs) AS n, unnest(hs[1 : len(hs)//2 + 1]) AS key
         |  FROM sig),
         |tcand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM pref x JOIN pref y ON x.key = y.key AND x.doc_id < y.doc_id),
         |truth AS (
         |  SELECT doc_a, doc_b FROM tcand
         |  JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
         |  WHERE 3 * len(list_intersect(sa.hs, sb.hs)) >= len(sa.hs) + len(sb.hs)),
         |$cfgCtes
         |SELECT CAST(bands AS INT) AS bands,
         |  CAST(rows_per_band AS INT) AS rows_per_band,
         |  n_truth, n_candidates, n_hits,
         |  round(n_hits::DOUBLE / n_truth, 6) AS recall,
         |  CASE WHEN n_candidates = 0 THEN 0.0
         |    ELSE round(n_hits::DOUBLE / n_candidates, 6) END AS candidate_precision
         |FROM ($unions)
         |ORDER BY bands DESC, rows_per_band""".stripMargin
    }

    val q131 = bandingSweepSql(Seq((16, 1), (8, 2), (4, 4), (2, 8)))

    /** q147 — the verified gate's knob-table twin: the SAME harness
      * over the gate's prefix-band configs; (4,4) is q131's (4,4). */
    val q147 = bandingSweepSql(Seq((1, 2), (2, 2), (1, 4), (2, 4), (4, 4)))

    /** The bucketCap-sweep twin (q149): the banding harness' corpus,
      * signatures, and exact truth, plus per-bucket arrival ranks
      * (row_number by doc_id — the corpus-as-stream order) — a truth
      * pair survives cap c iff its MINIMUM shared-bucket rank gap is
      * ≤ c; state columns count/measure the last min(occ, cap)
      * arrivals per bucket, the FIFO's residents. */
    private def capSweepSql(configs: Seq[(Int, Int)],
        caps: Seq[Int]): String = {
      val cfgCtes = configs.zipWithIndex.map { case ((b, r), i) =>
        s"""bands_$i AS (
           |  SELECT doc_id, b, ${phm(s"array_to_string(list_transform(msig[$r*b+1 : $r*b+$r], x -> CAST(x AS VARCHAR)), ',')")} AS bsig
           |  FROM sig, generate_series(0, ${b - 1}) t(b)),
           |rn_$i AS (
           |  SELECT doc_id, b, bsig,
           |    row_number() OVER (PARTITION BY b, bsig ORDER BY doc_id) AS rn,
           |    count(*) OVER (PARTITION BY b, bsig) AS occ
           |  FROM bands_$i),
           |td_$i AS (
           |  SELECT pd.min_dist FROM (
           |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           |      min(y.rn - x.rn) AS min_dist
           |    FROM rn_$i x JOIN rn_$i y
           |      ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id
           |    GROUP BY 1, 2) pd
           |  JOIN truth t ON pd.doc_a = t.doc_a AND pd.doc_b = t.doc_b)"""
          .stripMargin
      }.mkString(",\n")
      val rows = configs.zipWithIndex.flatMap { case ((b, r), i) =>
        caps.map { cap =>
          s"""SELECT $b AS bands, $r AS rows_per_band, $cap AS cap,
             |  (SELECT count(*) FROM truth) AS n_truth,
             |  (SELECT count(*) FROM td_$i) AS n_hits,
             |  (SELECT count(*) FROM td_$i WHERE min_dist <= $cap) AS n_servable,
             |  (SELECT count(*) FROM rn_$i WHERE rn > occ - $cap) AS state_entries,
             |  (SELECT 8 * sum(len(s.hs)) FROM rn_$i n JOIN sig s USING (doc_id)
             |    WHERE n.rn > n.occ - $cap) AS state_bytes"""
            .stripMargin
        }
      }.mkString("\nUNION ALL\n")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' extra token tail' FROM documents WHERE doc_id % 11 = 0),
         |$minhashSigCtes,
         |pref AS (
         |  SELECT doc_id, len(hs) AS n, unnest(hs[1 : len(hs)//2 + 1]) AS key
         |  FROM sig),
         |tcand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM pref x JOIN pref y ON x.key = y.key AND x.doc_id < y.doc_id),
         |truth AS (
         |  SELECT doc_a, doc_b FROM tcand
         |  JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
         |  WHERE 3 * len(list_intersect(sa.hs, sb.hs)) >= len(sa.hs) + len(sb.hs)),
         |$cfgCtes
         |SELECT CAST(bands AS INT) AS bands,
         |  CAST(rows_per_band AS INT) AS rows_per_band,
         |  CAST(cap AS INT) AS cap, n_truth, n_hits, n_servable,
         |  n_hits - n_servable AS n_cap_lost,
         |  round(n_servable::DOUBLE / n_truth, 6) AS recall_at_cap,
         |  state_entries, CAST(state_bytes AS BIGINT) AS state_bytes
         |FROM ($rows)
         |ORDER BY bands, rows_per_band, cap""".stripMargin
    }

    /** q149 — the verified gate's bucketCap twin: gate default (1,4)
      * and full-signature (4,4) at caps 1/4/16/∞. */
    val q149 = capSweepSql(Seq((1, 4), (4, 4)),
      Seq(1, 4, 16, Int.MaxValue))

    /** q150 — the banked-index duplicate audit's twin: expected
      * membership algebra from the raw tables alone — every embedding
      * contributes one member and one code row (plus its %17 replay),
      * every document one posting per DISTINCT token (plus its %17
      * replay); the audit's counts over the real banked tables must
      * equal these or a build/append/audit step lost or invented
      * rows. */
    val q150 =
      """WITH ev AS (SELECT vec_id FROM embeddings),
        |dv AS (SELECT doc_id,
        |    len(list_distinct(string_split(text, ' '))) AS ndt
        |  FROM documents),
        |fam AS (
        |  SELECT 'ivf_members' AS index_family,
        |    (SELECT count(*) FROM ev)
        |      + (SELECT count(*) FROM ev WHERE vec_id % 17 = 0) AS n_rows,
        |    (SELECT count(*) FROM ev) AS n_distinct_keys
        |  UNION ALL
        |  SELECT 'pq_codes',
        |    (SELECT count(*) FROM ev)
        |      + (SELECT count(*) FROM ev WHERE vec_id % 17 = 0),
        |    (SELECT count(*) FROM ev)
        |  UNION ALL
        |  SELECT 'inv_postings',
        |    (SELECT CAST(sum(ndt) AS BIGINT) FROM dv)
        |      + (SELECT CAST(sum(ndt) AS BIGINT) FROM dv WHERE doc_id % 17 = 0),
        |    (SELECT CAST(sum(ndt) AS BIGINT) FROM dv))
        |SELECT index_family, n_rows, n_distinct_keys,
        |  n_rows - n_distinct_keys AS n_dup_rows,
        |  n_rows = n_distinct_keys AS keys_unique
        |FROM fam
        |ORDER BY index_family""".stripMargin

    /** q119 — q114's sweep twin with the coarse stage swapped to the
      * DERIVED Lloyd-trained centroids ([[derivedCentCtes]], q61's
      * chain verbatim): same exact harness, same probe expansion, same
      * integer counts and two final ratios. */
    val q119 =
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |${derivedCentCtes("e")},
         |${fineClusterCtes("e")},
         |q AS (SELECT vec_id AS qid, e AS qe, cluster, mask FROM m WHERE vec_id < 10),
         |ex AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT q.qid, v.vec_id,
         |      row_number() OVER (PARTITION BY q.qid ORDER BY
         |        round(${cos("q.qe", "v.e")}, 4) DESC, v.vec_id) AS xr
         |    FROM q CROSS JOIN e v WHERE v.vec_id != q.qid)
         |  WHERE xr <= 5),
         |p1 AS (
         |  SELECT qid, qe,
         |    unnest(list_prepend(cluster, list_transform(
         |      list_filter(generate_series(0, 31), j -> (mask & CAST(2**j AS BIGINT)) != 0),
         |      j -> xor(cluster, CAST(2**j AS BIGINT))))) AS cluster
         |  FROM q),
         |c0 AS (
         |  SELECT q.qid, m.vec_id, round(${cos("q.qe", "m.e")}, 4) AS c4
         |  FROM m JOIN q USING (cluster) WHERE m.vec_id != q.qid),
         |c1 AS (
         |  SELECT p.qid, m.vec_id, round(${cos("p.qe", "m.e")}, 4) AS c4
         |  FROM m JOIN p1 p USING (cluster) WHERE m.vec_id != p.qid),
         |t0 AS (
         |  SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY c4 DESC, vec_id) AS rk
         |    FROM c0) WHERE rk <= 5),
         |t1 AS (
         |  SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY c4 DESC, vec_id) AS rk
         |    FROM c1) WHERE rk <= 5),
         |r0 AS (
         |  SELECT 0 AS radius, (SELECT count(*) FROM q) AS n_queries,
         |    (SELECT count(*) FROM c0) AS n_candidates,
         |    (SELECT count(*) FROM t0 JOIN ex USING (qid, vec_id)) AS n_hits),
         |r1 AS (
         |  SELECT 1 AS radius, (SELECT count(*) FROM q) AS n_queries,
         |    (SELECT count(*) FROM c1) AS n_candidates,
         |    (SELECT count(*) FROM t1 JOIN ex USING (qid, vec_id)) AS n_hits)
         |SELECT CAST(radius AS INT) AS radius, n_queries, n_candidates,
         |  round(n_candidates::DOUBLE / n_queries, 6) AS avg_candidates,
         |  n_hits, round(n_hits::DOUBLE / (n_queries * 5), 6) AS recall_at_5
         |FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r1)
         |ORDER BY radius""".stripMargin

    val all: Map[String, String] = Map(
      "q118_multi_probe_ann" -> q118,
      "q119_trained_coarse_sweep" -> q119,
      "q130_trained_coarse_ann" -> q130,
      "q131_banding_sweep" -> q131,
      "q132_soft_dedup_weights" -> q132,
      "q133_hybrid_rrf" -> q133,
      "q134_weighted_budget_mix" -> q134,
      "q135_retrieval_eval" -> q135,
      "q136_fusion_weights" -> q136,
      "q137_curriculum_manifest" -> q137,
      "q138_hybrid_at_rest" -> q138,
      "q139_pruned_eval" -> q139,
      "q140_coverage_fusion" -> q140,
      "q141_append_manifest" -> q141,
      "q142_gate_capacity" -> q142,
      "q143_gate_width_sweep" -> q143,
      "q144_banded_gate_sweep" -> q144,
      "q146_export_reconcile" -> q146,
      "q147_verified_gate_sweep" -> q147,
      "q149_verified_cap_sweep" -> q149,
      "q150_index_reconcile" -> q150,
      "q120_multi_probe_ivf_pq" -> q120,
      "q121_multi_probe_residual" -> q121,
      "q122_shard_manifest" -> q122,
      "q123_temperature_mix" -> q123,
      "q124_split_decontam" -> q124,
      "q125_packed_shards" -> q125,
      "q126_token_budget_mix" -> q126,
      "q127_doc_chunking" -> q127,
      "q128_recall_sweep_r2" -> q128,
      "q129_epoch_orders" -> q129,
      "q23_exact_dedup" -> q23,
      "q87_fuzzy_join" -> q87,
      "q91_normalized_dedup" -> q91,
      "q24_near_dup_minhash" -> q24,
      "q25_similarity_topk" -> q25,
      "q26_text_stats" -> q26,
      "q27_lang_id" -> q27,
      "q28_simhash" -> q28,
      "q29_fingerprint" -> q29,
      "q30_embedding_near_dup" -> q30,
      "q31_ivf_ann" -> q31,
      // q85 serves from the PERSISTED index built by the identical
      // pipeline — row-identical to q31, so the oracle is q31's: the
      // hash match proves the index round-trip loses nothing
      "q85_indexed_ann" -> q31,
      "q40_ngram_jaccard" -> q40,
      "q41_stratified_split" -> q41,
      "q46_quality_filter" -> q46,
      "q47_vocab_topk" -> q47,
      "q48_pii_scrub" -> q48,
      "q49_contamination" -> q49,
      "q50_dedup_clusters" -> q50,
      "q51_semantic_dedup" -> q51,
      "q53_kmeans_clusters" -> q53,
      "q54_corpus_mix" -> q54,
      "q55_quantized_ann" -> q55,
      "q56_passage_dedup" -> q56,
      "q57_bm25" -> q57,
      // q86 serves from the PERSISTED inverted index built by the
      // identical tokenize+count pipeline — row-identical to q57, so
      // the oracle is q57's: the hash match proves the postings
      // round-trip loses nothing
      "q86_indexed_bm25" -> q57,
      "q58_unigram_quality" -> q58,
      "q59_sequence_packing" -> q59,
      "q61_derived_semantic_dedup" -> q61,
      // q64's bounded-memory path must reproduce q47's exact answer —
      // same oracle, the hash match proves candidate coverage
      "q64_heavy_hitters" -> q47,
      "q66_deterministic_sample" -> q66,
      "q68_repetition_filter" -> q68,
      "q70_bigram_quality" -> q70,
      "q71_incremental_dedup" -> q71,
      "q72_cdc_passage_dedup" -> q72,
      "q73_cms_frequency" -> q73,
      "q74_priority_sample" -> q74,
      "q75_classifier_filter" -> q75,
      "q76_duplicate_spans" -> q76,
      "q79_source_quota" -> q79,
      "q80_random_projection" -> q80,
      "q81_pagerank" -> q81,
      "q100_bpe_merges" -> q100,
      "q104_tokenizer_fertility" -> q104,
      "q101_pq_ann" -> q101,
      // q103 serves from the PERSISTED PQ index built by the identical
      // seed + encode pipeline — row-identical to q101, so the oracle
      // is q101's: the hash match proves the code/codebook round-trip
      // loses nothing
      "q103_indexed_pq_ann" -> q101,
      "q102_source_dup_matrix" -> q102,
      "q106_snapshot_diff" -> q106,
      "q107_ivf_pq_ann" -> q107,
      // q145 serves q107's queries from the BANKED composed index via
      // the routing sidecar — row-identical to q107 (member vectors
      // route to their build cluster), so the oracle is q107's: the
      // hash match certifies membership + codes + codebook + routing
      // round-trip end to end
      "q145_ivfpq_routed" -> q107,
      // q148 turns the q120 multi-probe knob on the ROUTED external
      // face — row-identical to q120 (member routing equals the build
      // assignment, probes expand the same stored mask), so the
      // oracle is q120's: the hash match certifies nprobe > 1 over
      // the banked round-trip
      "q148_routed_multiprobe" -> q120,
      "q109_ivf_pq_residual" -> q109,
      "q110_dedup_yield" -> q110,
      "q111_cluster_keepers" -> q111,
      "q112_markup_extract" -> q112,
      "q113_curation_funnel" -> q113,
      "q114_ann_recall_sweep" -> q114,
      "q115_token_drift" -> q115,
      "q116_length_drift" -> q116,
      "q117_embedding_drift" -> q117,
    )
  }
}
