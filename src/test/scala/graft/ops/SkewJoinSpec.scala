package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Evidence for the AQE half of the skew playbook (see saltedJoin's
  * when-to-use-which note): a planted hot key whose shuffle partition
  * exceeds the skew threshold is SPLIT by AQE's OptimizeSkewedJoin —
  * visible as `isSkewJoin` on the executed sort-merge join — with results
  * identical to the unskewed logical answer. saltedJoin remains the
  * explicit escalation when a single key outgrows what post-shuffle
  * splitting can balance.
  */
class SkewJoinSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        flatten(s.plan)
      case _ => Seq.empty
    }
    (p +: p.children.flatMap(flatten)) ++ inner
  }

  test("AQE splits the hot key's shuffle partition in a sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    // shrink the skew thresholds so a ~1 MB hot partition counts as skewed
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    try {
      val s = spark
      import s.implicits._
      // key 0 carries 20k rows; the pad must be row-unique (shuffle sizes
      // are COMPRESSED bytes — a constant pad deflates below any threshold)
      val pad = sha2(concat(col("id").cast("string"), lit("pad")), 256)
      val left = spark.range(0, 20000).select(lit(0L).as("k"), pad.as("pad"))
        .unionAll(spark.range(1, 41).select(col("id").as("k"), pad.as("pad")))
      val right = spark.range(0, 41).select(col("id").as("k"), (col("id") * 10).as("v"))
      val joined = left.join(right, Seq("k"))
      // execute THIS QueryExecution (count() would build a different one
      // and leave joined's adaptive plan un-finalized)
      assert(joined.collect().length === 20000 + 40)
      val smjs = flatten(joined.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected a sort-merge join")
      assert(smjs.exists(_.isSkewJoin),
        s"expected AQE to mark the join skew-split; plan:\n${joined.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("runtime bloom filter from a selective dim filter prunes the fact side") {
    // the third join optimization in the 100 TB kit (next to bucketing and
    // skew splitting): a selective filter on one join side injects a bloom
    // filter into the OTHER side's scan, dropping non-matching fact rows
    // before the shuffle. Thresholds are lowered so the tiny test tables
    // qualify; broadcast is disabled so the join actually shuffles.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    try {
      val dir = "/root/testdata/sf0.001"
      val li = graft.Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      val ord = graft.Tables.load(spark, dir, "orders")
        .where(col("o_totalprice") > 150000.0) // selective creation side
        .select("o_orderkey", "o_totalprice")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloomfilter"),
        s"expected a runtime bloom filter in the optimized plan:\n${optimized.take(4000)}")
      // and the filtered result is still exactly the plain join
      assert(joined.count() ===
        li.join(ord.hint("broadcast"), col("l_orderkey") === col("o_orderkey")).count())
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
