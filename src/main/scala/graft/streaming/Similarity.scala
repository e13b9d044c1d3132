package graft.streaming

import graft.expressions.VectorFunctions.{vecCosine, vecCosinePre, vecNorm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming similarity matching — the streaming face of the L3 batch
  * family (q25/q31/q55): score every ARRIVING embedding against a
  * small static query/centroid relation and emit the matches. The
  * routing primitive of an ingest pipeline (send a document to the
  * dedup shard / topic bucket / safety queue whose centroid it is
  * closest to), and the same posture as the reference's point-lookup
  * join against its in-memory registry
  * (`/root/reference/lib/TargetManager/TargetManager.h:66-135`): a
  * tiny keyed relation consulted per arriving record.
  *
  * Scale posture: stream-static BROADCAST join — the query relation
  * ships to every executor once, scoring is map-side per micro-batch
  * (codegen'd `vec_dot`), and there is NO state and NO shuffle: the
  * operator composes with any downstream stateful stage without adding
  * exchanges. Full corpus-vs-corpus search stays the batch operators'
  * job; a stream can only ever score against what fits in a broadcast,
  * which is exactly the IVF-centroid / routing-table use case.
  */
object Similarity {

  /** Emit one row per (arriving row, query) pair with cosine ≥
    * `threshold`: all input columns plus `query_id` and `cosine`
    * (rounded to 4 decimals, the batch family's convention).
    *
    * @param stream   streaming DataFrame with an array-typed
    *                 embedding column `embCol`
    * @param queries  SMALL static relation (broadcast wholesale) with
    *                 `queryIdCol` and an array-typed `queryVecCol`
    */
  def streamingMatch(stream: DataFrame, embCol: String, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, threshold: Double): DataFrame = {
    // r22: norms hoisted below the stream-static cross join
    // (vecCosinePre — one norm loop per row/query instead of per pair)
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"),
      transform(col(queryVecCol), x => x.cast("double")).as("qvec"))
      .withColumn("nqv", vecNorm(col("qvec"))))
    stream
      .withColumn("e", transform(col(embCol), x => x.cast("double")))
      .withColumn("nse", vecNorm(col("e")))
      .crossJoin(q)
      .withColumn("cosine",
        round(vecCosinePre(col("e"), col("nse"), col("qvec"), col("nqv")), 4))
      .filter(col("cosine") >= threshold)
      .drop("e", "nse", "qvec", "nqv")
  }

  /** Route each arriving embedding to its NEAREST query (the streaming
    * analog of the batch nearest-centroid assignment). Output schema is
    * `(keyCol, query_id, cosine)` — ONLY the key survives; callers
    * needing other input columns join back on the key. Ties break to
    * the larger query id via the identical portable tie-break key as
    * `Pipeline.assignToCentroids` (`cos6·10^12 + id`), so a batch
    * re-run of the assignment agrees row-for-row. Contract: query ids
    * must be `< 10^6` — rounded cosines are 10^6 apart in the key
    * space, so a larger id would outvote a genuinely larger cosine
    * (the batch assignment's existing convention, made explicit here).
    *
    * STREAMING form: run in `update` output mode (asserted runnable in
    * SimilaritySpec over a MemoryStream). The `groupBy` on the
    * stream's own key is a stateful aggregation — one small state row
    * per distinct in-flight key, re-emitted (upserted) if a key
    * recurs; there is no watermark because the key space of a routing
    * stream (one row per arriving document id) does not recur beyond
    * its micro-batch in practice. For key spaces that DO grow without
    * bound, compose the same expression tree with
    * `groupBy(window(eventTime, ...), key)` plus a watermark so state
    * evicts — the scoring side (broadcast crossJoin, map-side argmax
    * input) is unchanged. Append-mode sinks need that windowed form;
    * the un-windowed form is update/complete-only. */
  def nearestQuery(stream: DataFrame, keyCol: String, embCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String): DataFrame = {
    // r22: the same norm hoist as [[streamingMatch]]
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"),
      transform(col(queryVecCol), x => x.cast("double")).as("qvec"))
      .withColumn("nqv", vecNorm(col("qvec"))))
    stream
      .withColumn("e", transform(col(embCol), x => x.cast("double")))
      .withColumn("nse", vecNorm(col("e")))
      .crossJoin(q)
      .withColumn("cos6",
        round(vecCosinePre(col("e"), col("nse"), col("qvec"), col("nqv")), 6))
      .groupBy(col(keyCol))
      .agg(max_by(struct(col("query_id"), col("cos6")),
        col("cos6") * 1000000000000.0 + col("query_id")).as("best"))
      .select(col(keyCol), col("best.query_id").as("query_id"),
        col("best.cos6").as("cosine"))
  }
}
