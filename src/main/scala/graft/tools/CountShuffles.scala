package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan-audit sibling of [[BenchOne]] (r20): print the measured
  * non-range shuffle count for one or more query ids — the number the
  * bench artifact's shuffle block and PlanInvariantsSpec's tail
  * ceilings record. Collecting first lets AQE settle the final stages,
  * matching the bench audit exactly.
  *
  * Usage: graft.tools.CountShuffles <sfDir> <query> [query ...]
  */
object CountShuffles {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Portable.silenceKRowWindowWarnings()
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"SHUFFLES $name ${graft.plans.PlanAudit.nonRangeShuffles(df)}")
    }
    spark.stop()
  }
}
