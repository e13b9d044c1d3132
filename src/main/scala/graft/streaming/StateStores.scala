package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store sizing for the stateful engine at scale.
  *
  * The default HDFS-backed provider keeps EVERY key's state in
  * executor heap — fine for the reference's 8 targets, a hard wall
  * when the same keyed-TTL pattern runs over millions of keys (the
  * 100 TB posture: per-user/per-session/per-document state). RocksDB
  * keeps the working set on executor-local disk with an in-memory
  * block cache, so state capacity scales with disk, not heap, and
  * changelog checkpointing ships per-batch deltas instead of
  * re-uploading full snapshots.
  *
  * Spark reads the provider from the session conf AT QUERY START (each
  * query pins a conf snapshot), so wrapping only the `.start()` calls
  * is sufficient and concurrent queries on the same session are
  * unaffected.
  */
object StateStores {
  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Start queries inside `body` with RocksDB-backed state and
    * changelog checkpointing; the session conf is restored after. */
  def withRocksDB[A](spark: SparkSession)(body: => A): A = {
    val prev = Seq(ProviderKey, ChangelogKey)
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set(ProviderKey, RocksDBProvider)
    spark.conf.set(ChangelogKey, "true")
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
