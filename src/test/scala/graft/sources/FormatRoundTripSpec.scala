package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Source/sink breadth: JSON-lines and ORC round-trips with explicit
  * schemas (the remaining built-in formats a reference user might bring).
  */
class FormatRoundTripSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("JSON lines round-trip with explicit schema") {
    val out = Files.createTempDirectory("graft_json").toString
    val s = spark
    import s.implicits._
    val in = Seq((1L, "a", 1.5), (2L, "b", -2.25), (3L, null, 0.0))
      .toDF("id", "name", "score")
    in.write.json(s"$out/j")
    val back = spark.read.schema(schema).json(s"$out/j")
    assert(back.count() === 3)
    assert(back.schema === schema)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ===
           in.orderBy("id").collect().map(_.toSeq).toSeq)
    // corrupt JSON line lands as nulls under PERMISSIVE with schema
    Files.writeString(java.nio.file.Paths.get(s"$out/j/zz_bad.json"), "{not json\n")
    val withBad = spark.read.schema(schema).json(s"$out/j")
    assert(withBad.count() === 4)
  }

  test("ORC round-trip preserves schema and values") {
    val out = Files.createTempDirectory("graft_orc").toString
    val s = spark
    import s.implicits._
    val in = Seq((1L, "x", 9.75), (2L, "y", 0.5)).toDF("id", "name", "score")
    in.write.orc(s"$out/o")
    val back = spark.read.orc(s"$out/o")
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ===
           in.orderBy("id").collect().map(_.toSeq).toSeq)
    // predicate pushdown reaches the ORC scan
    val filtered = back.where(col("id") === 2)
    assert(filtered.count() === 1)
    assert(filtered.queryExecution.executedPlan.toString.contains("PushedFilters"))
  }
}
