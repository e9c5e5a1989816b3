package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CharNgrams must be bit-identical to the reference sliding-window form
  * `transform(sequence(1, length(t) - (n-1)), i => substr(t, i, n))` on
  * every input with >= n codepoints — the q_langid trigram recipe the
  * DuckDB oracle replays. Below n codepoints the native form returns an
  * empty array (the reference form is undefined there: Spark's
  * sequence(1, m) with m < 1 counts DOWN); the production caller filters
  * `length >= n` upstream.
  */
class CharNgramsSpec extends SparkSpec {

  private val fixtures = Seq(
    "abc", "abcd", "hello world", "aaa", "ab ab ab",
    "日本語のテキスト", "mixïng ünïcödé and ascii", "emoji 😀😀 run",
    "x" * 500, "tab\tand\nnewline", "a b", "ñññ")

  test("char_ngrams(3) equals the transform+substr reference on >=3-codepoint inputs") {
    val df = spark.createDataFrame(fixtures.zipWithIndex.map { case (s, i) => (i, s) })
      .toDF("id", "t")
      .where(length(col("t")) >= 3)
    val both = df.select(col("t"),
      CharNgrams.ngrams(col("t"), 3).as("native"),
      transform(sequence(lit(1), length(col("t")) - 2),
        i => col("t").substr(i, lit(3))).as("ref"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"char_ngrams mismatch for '${r.getString(0).take(30)}'")
    }
  }

  test("short inputs yield an empty array; n=1 yields the codepoints") {
    val df = spark.createDataFrame(Seq((0, "ab"), (1, ""), (2, "é"))).toDF("id", "t")
    assert(df.select(CharNgrams.ngrams(col("t"), 3).as("g"))
      .collect().forall(_.getSeq[String](0).isEmpty))
    val cp = spark.createDataFrame(Seq((0, "aé日"))).toDF("id", "t")
      .select(CharNgrams.ngrams(col("t"), 1).as("g")).head().getSeq[String](0)
    assert(cp === Seq("a", "é", "日"))
  }
}
