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
    var e = edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var eCount = e.count()
    val isolated = edges.filter(col("src") === col("dst"))
      .select(col("src").as("node")).distinct()

    var converged = false
    var rounds = 0
    // O(log² n) bound; 40 rounds covers any corpus this engine will see
    while (!converged && rounds < 40) {
      // LARGE-STAR over symmetric neighborhoods: every node u links its
      // strictly-larger neighbors to m = min(Γ(u) ∪ {u}).
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mLarge = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = sym.join(mLarge, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint(true)
      // SMALL-STAR on the canonical (big -> small) form: every node u
      // links its smaller neighbors and itself to their minimum.
      val mSmall = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = large.join(mSmall, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mSmall.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true)
      // fixpoint = identical canonical edge sets (counts + empty diff)
      val nextCount = next.count()
      converged = nextCount == eCount && next.except(e).isEmpty
      e = next
      eCount = nextCount
      rounds += 1
    }
    // at the fixpoint every edge is (member -> component min): centers
    // label themselves, members take their star center
    val labels = e.select(col("u").as("node"), col("v").as("label"))
      .union(e.select(col("v").as("node"), col("v").as("label")))
      .union(isolated.select(col("node"), col("node").as("label")))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
    labels
  }
}
