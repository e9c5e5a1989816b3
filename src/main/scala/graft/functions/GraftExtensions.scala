package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing the graft custom expressions to
  * SQL text (`spark.sql("SELECT float_dot(a, b) ...")`), so `spark.sql`
  * users get the same fused codegen operators as the Column API.
  *
  * Cluster use: `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * For an already-running session (tests, notebooks) use
  * [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.FuseFloatDotProduct)
  }
}

/** Register the graft SQL functions on an already-running session. */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.FunctionRegistrar.register(spark)
}

object GraftExtensions {
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_dot",
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (es: Seq[Expression]) => FloatDotProduct(es(0), es(1))),
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("md5_hash64",
      new ExpressionInfo(classOf[Md5Hash64].getName, "md5_hash64"),
      (es: Seq[Expression]) => Md5Hash64(es(0))),
    ("ws_tokens",
      new ExpressionInfo(classOf[WhitespaceTokens].getName, "ws_tokens"),
      (es: Seq[Expression]) => WhitespaceTokens(es(0))))
}
