package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SamplingSchemaSpec extends SparkSpec {

  test("hashSample is deterministic and partitioning-independent") {
    val in = df((1 to 10000).map(i => Kv(i.toString, i.toLong)))
    val a = Relational.hashSample(in, "k", 0.1).collect().map(_.getString(0)).sorted
    val b = Relational.hashSample(in.repartition(17), "k", 0.1)
      .collect().map(_.getString(0)).sorted
    assert(a.toSeq === b.toSeq)                  // same rows regardless of layout
    assert(math.abs(a.length - 1000) < 150)      // ≈10% of 10k
    // disjointness with the complement rate band is NOT claimed; but
    // a subset relation holds when the rate grows
    val wider = Relational.hashSample(in, "k", 0.2).collect().map(_.getString(0)).toSet
    assert(a.forall(wider.contains))             // monotone in rate
  }

  test("hashSampleBy applies per-stratum rates") {
    val in = df((1 to 10000).map(i => Kv(if (i % 2 == 0) "even" else "odd", i.toLong)))
      .withColumn("id", col("v").cast("string"))
    val out = Relational.hashSampleBy(in, "id", "k", Map("even" -> 0.2, "odd" -> 0.02))
    val byStratum = out.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("even") - 1000) < 150)   // 20% of 5000
    assert(math.abs(byStratum.getOrElse("odd", 0L) - 100) < 50) // 2% of 5000
  }

  test("parquet schema evolution: mergeSchema unions batch schemas") {
    val out = Files.createTempDirectory("graft_evolve").toString
    val s = spark
    import s.implicits._
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$out/b=1")
    Seq((2L, 3.5)).toDF("id", "v2").write.parquet(s"$out/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet === Set("id", "v1", "v2", "b"))
    assert(merged.count() === 2)
    val r1 = merged.where(col("id") === 1).head()
    assert(r1.getAs[String]("v1") === "a")
    assert(r1.isNullAt(r1.fieldIndex("v2")))     // missing column → null
  }
}
