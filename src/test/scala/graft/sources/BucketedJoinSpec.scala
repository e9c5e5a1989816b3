package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan

case class Fact(k: Long, v: Double)

/** Proves the co-located-join claim: joining two tables bucketed on the
  * join key plans NO shuffle exchange, while the plain-parquet join
  * shuffles both sides.
  */
class BucketedJoinSpec extends SparkSpec {

  private def countShuffles(plan: SparkPlan): Int = {
    var n = 0
    plan.foreach { case _: ShuffleExchangeExec => n += 1; case _ => }
    n
  }

  test("bucketed-bucketed equi join runs with zero shuffle exchanges") {
    val left = df((1 to 1000).map(i => Fact(i.toLong % 100, i.toDouble)))
    val right = df((1 to 500).map(i => Fact(i.toLong % 100, -i.toDouble)))
    BucketedTables.writeBucketed(left, "b_left", Seq("k"), 8)
    BucketedTables.writeBucketed(right, "b_right", Seq("k"), 8)
    try {
      val bl = BucketedTables.readBucketed(spark, "b_left")
      val br = BucketedTables.readBucketed(spark, "b_right").withColumnRenamed("v", "v2")
      val joined = bl.join(br, Seq("k"))
        .withColumn("s", col("v") + col("v2"))
      assert(joined.count() === 1000 * 5) // 100 keys × 10 left × 5 right per key
      val shuffles = countShuffles(joined.queryExecution.executedPlan)
      assert(shuffles === 0, s"expected no shuffle, got $shuffles")

      // groupBy on the bucket key is also shuffle-free
      val agg = bl.groupBy("k").agg(sum("v"))
      agg.count()
      assert(countShuffles(agg.queryExecution.executedPlan) === 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
