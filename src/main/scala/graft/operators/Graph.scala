package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components for duplicate-cluster assignment
  * at 100 TB scale.
  *
  * [[Pipeline.q50DedupClusters]] uses plain min-label propagation —
  * rounds bounded by the component DIAMETER, the right tool for
  * near-dup graphs, which are shallow by construction (original ↔
  * copies). This object supplies the complement for deep or
  * path-shaped graphs (diameter ~ n in the worst case): the
  * alternating large-star / small-star algorithm of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond" (SoCC'14), which
  * converges in O(log² n) rounds regardless of diameter. Every round
  * is a groupBy + join on the (shrinking) edge relation — no
  * neighborhood materialized as an array, no driver-side graph state;
  * the convergence probe is an aggregate-only anti-join emptiness
  * check.
  *
  * Both operators label every node with its component's MINIMUM node
  * id, so their outputs are directly comparable (GraphSpec asserts
  * equality against an independent union-find oracle).
  */
object Graph {

  /** Eager localCheckpoint that also hands back a DETERMINISTIC release
    * for the blocks it created. `localCheckpoint` alone frees its
    * storage only when the driver GCs the RDD reference and the
    * ContextCleaner runs — in an iterative loop that pins O(rounds)
    * superseded copies in the block manager, evicting other persisted
    * stages. The created-RDD ids are captured by diffing the persistent
    * set around the checkpoint call; releasing a block that some other
    * query still reads is safe (worst case it recomputes). */
  private[operators] def checkpointRound(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val cp = df.localCheckpoint(true)
    val created = sc.getPersistentRDDs.keySet.toSet -- before
    (cp, () => created.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))))
  }

  /** Connected components by alternating star contractions.
    *
    * @param edges undirected edge relation with two long columns
    *              `src`, `dst` (self-loops and duplicates tolerated)
    * @return one row per node appearing in `edges`: (node, label)
    *         where label = min node id of its component
    */
  def connectedComponentsStar(edges: DataFrame): DataFrame = {
    // canonical directed form: every edge points big -> small, one row
    // per undirected pair. Each round ends in an EAGER localCheckpoint:
    // the round's plan references the previous round's relation several
    // times (sym's two branches, both star joins, the convergence
    // diff), so without lineage truncation the logical plan grows
    // exponentially in the round count — analysis alone OOMs around
    // round ~15. Checkpointing bounds every round's plan to one round's
    // operators (the same idiom GraphX/ALS use for iterative lineage).
    var (e, freeE) = checkpointRound(edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var eCount = e.count()
    val isolated = edges.filter(col("src") === col("dst"))
      .select(col("src").as("node")).distinct()

    var converged = false
    var rounds = 0
    // O(log² n) worst-case round bound (Kiveris et al. Thm 1); 60
    // covers any realistic corpus, and non-convergence THROWS below —
    // a partially-contracted edge set would silently mislabel nodes
    val maxRounds = 60
    while (!converged && rounds < maxRounds) {
      // LARGE-STAR over symmetric neighborhoods: every node u links its
      // strictly-larger neighbors to m = min(Γ(u) ∪ {u}).
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mLarge = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val (large, freeLarge) = checkpointRound(sym.join(mLarge, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct())
      // SMALL-STAR on the canonical (big -> small) form: every node u
      // links its smaller neighbors and itself to their minimum.
      val mSmall = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val (next, freeNext) = checkpointRound(large.join(mSmall, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mSmall.select(col("u"), col("m").as("v")))
        .distinct())
      // fixpoint = identical canonical edge sets (counts + empty diff)
      val nextCount = next.count()
      converged = nextCount == eCount && next.except(e).isEmpty
      freeLarge()
      freeE()
      e = next
      freeE = freeNext
      eCount = nextCount
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxRounds rounds " +
          s"($eCount canonical edges remain) — labels would be partial")
    // at the fixpoint every edge is (member -> component min): centers
    // label themselves, members take their star center
    val labels = e.select(col("u").as("node"), col("v").as("label"))
      .union(e.select(col("v").as("node"), col("v").as("label")))
      .union(isolated.select(col("node"), col("node").as("label")))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
    labels
  }
}
