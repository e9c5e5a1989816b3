package graft.sources

import graft.SparkSpec
import graft.schemas.Schemas
import org.apache.spark.sql.execution.FileSourceScanLike
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CsvQualitySpec extends SparkSpec {

  test("corrupt rows are quarantined, clean rows parse fully") {
    val dir = Files.createTempDirectory("graft_csvq")
    val csv = dir.resolve("bars.csv")
    Files.writeString(csv,
      """ISIN,Mnemonic,SecurityDesc,SecurityType,Currency,SecurityID,Date,Time,StartPrice,MaxPrice,MinPrice,EndPrice,TradedVolume,NumberOfTrades
        |AT0000A0E9W5,SANT,DESC,Common stock,EUR,2504159,2020-11-24,08:00,18.94,18.94,18.87,18.87,1183,3
        |BADROW,only,three
        |DE000A0DJ6J9,S92,DESC2,Common stock,EUR,2504287,2020-11-24,08:00,47.96,48.02,47.96,48.02,2081,not_a_number
        |""".stripMargin)
    val df = CsvQuality.readWithCorruptCapture(spark, csv.toString, Schemas.xetra).cache()
    try {
      val corrupt = CsvQuality.corruptRows(df).collect().map(_.getString(0))
      assert(corrupt.length === 2)
      assert(corrupt.exists(_.startsWith("BADROW")))
      assert(corrupt.exists(_.endsWith("not_a_number")))
      val clean = CsvQuality.cleanRows(df)
      assert(clean.count() === 1)
      assert(clean.head().getAs[String]("isin") === "AT0000A0E9W5")
      assert(!clean.columns.contains(CsvQuality.CorruptCol))
    } finally df.unpersist()
  }

  test("partitioned parquet sink prunes partitions on read (A3 at scale)") {
    val out = Files.createTempDirectory("graft_prune").toString
    val s = spark
    import s.implicits._
    val data = Seq(("a", "2020-11-24"), ("b", "2020-11-25"), ("c", "2020-11-26"))
      .toDF("v", "trading_date")
    data.write.partitionBy("trading_date").parquet(s"$out/t")
    val read = spark.read.parquet(s"$out/t").where(col("trading_date") === "2020-11-25")
    assert(read.count() === 1)
    val scans = read.queryExecution.executedPlan.collect {
      case f: FileSourceScanLike => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "partition filter must reach the scan (no full-table read)")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val out = Files.createTempDirectory("graft_dpp").toString
    val s = spark
    import s.implicits._
    (1 to 300).map(i => (i, s"d${i % 3}")).toDF("v", "part_key")
      .write.partitionBy("part_key").parquet(s"$out/fact")
    Seq(("d1", "keep")).toDF("part_key", "tag")
      .write.parquet(s"$out/dim")
    val fact = spark.read.parquet(s"$out/fact")
    val dim = spark.read.parquet(s"$out/dim").where(col("tag") === "keep")
    val joined = fact.join(dim, Seq("part_key"))
    assert(joined.count() === 100)
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanLike] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          unwrap(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => unwrap(q.plan)
        case f: FileSourceScanLike => Seq(f)
      }.flatten
    val scans = unwrap(joined.queryExecution.executedPlan)
    val factScan = scans.find(_.relation.location.rootPaths.exists(_.toString.contains("fact")))
    assert(factScan.nonEmpty, s"no fact scan found among ${scans.size} scans")
    assert(factScan.get.partitionFilters.exists(_.toString.toLowerCase.contains("dynamicpruning")),
      s"expected a dynamicpruning partition filter, got: ${factScan.get.partitionFilters}")
  }
}
