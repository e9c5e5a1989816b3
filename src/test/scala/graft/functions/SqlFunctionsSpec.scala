package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom expressions must be reachable from SQL text, not just the
  * Column API — GraftFunctions.register wires them into the session's
  * function registry (GraftExtensions does the same at session startup
  * via spark.sql.extensions).
  */
class SqlFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API bit-for-bit") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  float_dot(array(1f, 2f, 3f), array(4f, 5f, 6f)) AS d,
        |  cosine_sim(array(1f, 0f), array(1f, 0f)) AS c,
        |  md5_hash64('0|hello') AS h
        |""".stripMargin).head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 1.0)
    val viaColumn = spark.range(1).select(
      Md5Hash64.hash64(lit("0|hello")).as("h")).head().getSeq[Long](0)
    assert(r.getSeq[Long](2) === viaColumn)
  }

  test("WhitespaceTokens is bit-identical to the regex split + filter reference") {
    import org.apache.spark.sql.functions._
    val fixtures = Seq(
      "hello world", "  leading", "trailing  ", "  both  ", "", "   ",
      "one", "a\tb\nc\rd\fe", "ab", "x  y   z", "tab\t\ttab",
      "nbsp is not whitespace", "mixed \t\n sep", "日本語 テスト text",
      "a", " ", "\n", "multi  \r\n  line  input")
    val df = spark.createDataFrame(fixtures.zipWithIndex.map { case (s, i) => (i, s) })
      .toDF("id", "text")
    val both = df.select(
      graft.ops.TextOps.tokens(col("text")).as("native"),
      graft.ops.TextOps.tokensReference(col("text")).as("ref"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
    // corpus-wide: every document tokenizes identically
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
        graft.ops.TextOps.tokens(col("text")).as("native"),
        graft.ops.TextOps.tokensReference(col("text")).as("ref"))
      .where(not(col("native") === col("ref")))
    assert(diff.count() === 0)
  }

  test("SQL function null/type semantics follow the expressions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT float_dot(CAST(NULL AS ARRAY<FLOAT>), array(1f)) AS d").head()
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT float_dot(array(1), array(2))").head()
    }
    assert(err.getMessage.contains("float_dot") || err.getMessage.toLowerCase.contains("type"))
  }
}
