package graft
import org.apache.spark.sql.SparkSession

/** Dev aid: print the formatted physical plan of registered queries.
  * Usage: runMain graft.Explain <sfDir> <queryPrefix>[,<prefix>...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val prefixes = if (args.length > 1) args(1).split(",").toSeq else Seq("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
