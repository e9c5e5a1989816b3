package graft.plans

import graft.SparkSpec
import graft.ops.VectorOps
import org.apache.spark.sql.functions._

class FuseFloatDotProductSpec extends SparkSpec {

  // parquet-backed (a LocalRelation input would be constant-folded into a
  // precomputed result before user-provided optimizer rules ever run)
  private def vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuseFloatDotProduct
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == FuseFloatDotProduct)
  }

  test("the declarative fold is rewritten to the native expression") {
    withRule {
      val q = vecs.select(VectorOps.dot(col("embedding"), col("embedding")).as("d"))
      val fused = q.queryExecution.optimizedPlan.expressions.exists(_.exists {
        case _: graft.functions.FloatDotProduct => true
        case _ => false
      })
      assert(fused, "optimizer did not fuse the aggregate(zip_with(...)) fold")
    }
  }

  test("fused results are bit-identical to the unfused fold") {
    val plain = vecs.select(VectorOps.dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    val fused = withRule {
      vecs.select(VectorOps.dot(col("embedding"), col("embedding")).as("d"))
        .collect().map(_.getDouble(0))
    }
    plain.zip(fused).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) === java.lang.Double.doubleToLongBits(b))
    }
  }

  test("non-matching aggregates pass through untouched") {
    withRule {
      // different zero, different merge — must stay a higher-order fold
      val q = vecs.select(
        aggregate(col("embedding"), lit(1.0),
          (acc, x) => acc * x.cast("double")).as("prod"))
      val fused = q.queryExecution.optimizedPlan.expressions.exists(_.exists {
        case _: graft.functions.FloatDotProduct => true
        case _ => false
      })
      assert(!fused)
      assert(q.count() > 0)
    }
  }
}
