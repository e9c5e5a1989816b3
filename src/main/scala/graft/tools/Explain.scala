package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/timing inspector: runs named SparkEntry queries and prints the
  * formatted physical plan plus cold/warm wall times.
  *
  * Usage: graft.tools.Explain <sfDir> <query> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      println(s"========== $name ==========")
      val df = fn(spark, sfDir)
      if (sys.env.get("GRAFT_EXPLAIN").forall(_ == "1")) df.explain("formatted")
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"  run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      if (sys.env.get("GRAFT_EXPLAIN_FINAL").contains("1")) {
        // the post-execution adaptive plan — shows runtime ReusedExchange.
        // collect() (not count()) so THIS frame's queryExecution runs.
        df.collect()
        println(df.queryExecution.executedPlan.toString.take(8000))
      }
      if (sys.env.get("GRAFT_EXPLAIN_SHUFFLES").contains("1")) {
        df.collect()
        println(s"  non-range shuffles: ${graft.plans.PlanAudit.nonRangeShuffles(df)}")
      }
    }
    spark.stop()
  }
}
