package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, DateType, LongType, DoubleType}
import org.apache.spark.sql.execution.FileSourceScanLike
import java.nio.file.Files

/** Golden pipeline-fidelity tests against the reference's own sample data
  * (read-only at /root/reference): row counts, positional rename, derived
  * columns, join enrichment, quality checks, partitioned sink layout.
  * Expected values follow /root/reference/dags/spark/etl.py semantics with
  * the typed-column decisions D1/D5 (SURVEY.md §7.5).
  */
class PipelineGoldenSpec extends SparkSpec {

  private val xetraCsv = "/root/reference/sample-data/2020-11-24_BINS_XETR08.csv"
  private val eurexCsv = "/root/reference/sample-data/2020-11-24_BINS_XEUR08.csv"
  private val dimCsv = "/root/reference/dags/dimension_data/eurex_product_specification.csv"

  test("xetra read: positional rename binds 15,057 data rows") {
    val df = XetraPipeline.read(spark, xetraCsv)
    assert(df.count() === 15057)
    assert(df.columns.head === "isin")
    assert(df.schema("trading_date").dataType === DateType)
    assert(df.schema("traded_volume").dataType === LongType)
    // quoted SecurityDesc with embedded commas must not shift columns
    val r = df.where(col("isin") === "AT0000A0E9W5" && col("trading_time") === "08:00")
      .select("mnemonic", "start_price", "traded_volume").head()
    assert(r.getString(0) === "SANT")
    assert(r.getDouble(1) === 18.94)
    assert(r.getLong(2) === 1183L)
  }

  test("xetra read: glob pattern binds the same rows (A2)") {
    val df = XetraPipeline.read(spark, "/root/reference/sample-data/*XETR*.csv")
    assert(df.count() === 15057)
  }

  test("xetra derive: trading_ts is a typed timestamp at minute resolution") {
    val df = XetraPipeline.derive(XetraPipeline.read(spark, xetraCsv))
    assert(df.schema("trading_ts").dataType === TimestampType)
    val ts = df.where(col("isin") === "AT0000A0E9W5" && col("trading_time") === "08:00")
      .select(date_format(col("trading_ts"), "yyyy-MM-dd HH:mm:ss")).head().getString(0)
    assert(ts === "2020-11-24 08:00:00")
  }

  test("eurex read + derive: 3,546 rows, maturity derivations, FUT nulls") {
    val df = EurexPipeline.derive(EurexPipeline.read(spark, eurexCsv))
    assert(df.count() === 3546)
    assert(df.schema("maturity_date").dataType === DateType)
    assert(df.schema("maturity_days").dataType === LongType)
    assert(df.schema("maturity_months").dataType === DoubleType)
    // OPT row: OESX put, maturity 2020-12-18, trading 2020-11-24 → 24 days
    val opt = df.where(col("isin") === "DE000P0YX7V7").head()
    assert(opt.getAs[Long]("maturity_days") === 24L)
    assert(math.abs(opt.getAs[Double]("maturity_months") - 24 / 30.5) < 1e-12)
    // FUT rows carry null strike/put_or_call/generation (nullability D2)
    val fut = df.where(col("security_type") === "FUT" && col("strike_price").isNull)
    assert(fut.count() > 0)
  }

  test("eurex enrich: broadcast left join adds 4 dim columns, preserves rows") {
    val facts = EurexPipeline.derive(EurexPipeline.read(spark, eurexCsv))
    val dim = EurexPipeline.readDimension(spark, dimCsv)
    assert(dim.count() === 2729) // header + 2,729 data rows (file lacks trailing \n)
    val enriched = EurexPipeline.enrich(facts, dim)
    assert(enriched.count() === 3546) // left join: no row loss/dup (dim key unique)
    val oesx = enriched.where(col("market_segment") === "OESX")
      .select("product_name", "underlying_name").head()
    assert(oesx.getString(0) !== null)
    // join key deduped by USING semantics
    assert(enriched.columns.count(_ == "market_segment") === 1)
  }

  test("full run: three partitioned parquet sinks with hive layout") {
    val out = Files.createTempDirectory("graft_eurex_golden").toString
    EurexPipeline.run(spark, eurexCsv, dimCsv, out)
    val facts = spark.read.parquet(s"$out/data/eurex")
    assert(facts.count() === 3546)
    assert(new java.io.File(s"$out/data/eurex/trading_date=2020-11-24").isDirectory)
    val mi = spark.read.parquet(s"$out/quality_check/missing_isin")
    val mu = spark.read.parquet(s"$out/quality_check/missing_underlying")
    // quality checks: distinct (market_segment, mleg) pairs with null keys
    assert(mi.columns.sorted === Array("market_segment", "mleg"))
    assert(mi.count() === mi.dropDuplicates().count())
    // sample data: FUT/MLEG rows with empty underlying exist
    assert(mu.count() > 0)

    val xout = Files.createTempDirectory("graft_xetra_golden").toString
    XetraPipeline.run(spark, xetraCsv, xout)
    assert(spark.read.parquet(s"$xout/data/xetra").count() === 15057)
  }

  test("stringTs mode reproduces the reference's parquet schema byte-for-byte (etl.py:56-59,102-119)") {
    import org.apache.spark.sql.types.{StringType, IntegerType}
    // Xetra: trading_ts becomes the reference's formatted string — same
    // values the D1 typed test asserts, STRING-typed at the schema
    val x = XetraPipeline.derive(XetraPipeline.read(spark, xetraCsv), stringTs = true)
    assert(x.schema("trading_ts").dataType === StringType)
    val xts = x.where(col("isin") === "AT0000A0E9W5" && col("trading_time") === "08:00")
      .select("trading_ts").head().getString(0)
    assert(xts === "2020-11-24 08:00:00")

    // Eurex: trading_ts and maturity_date strings, maturity_days the
    // reference's plain INT — values identical to the typed mode
    val e = EurexPipeline.derive(EurexPipeline.read(spark, eurexCsv), stringTs = true)
    assert(e.schema("trading_ts").dataType === StringType)
    assert(e.schema("maturity_date").dataType === StringType)
    assert(e.schema("maturity_days").dataType === IntegerType)
    assert(e.schema("maturity_months").dataType === DoubleType)
    val opt = e.where(col("isin") === "DE000P0YX7V7").head()
    assert(opt.getAs[String]("maturity_date") === "2020-12-18")
    assert(opt.getAs[Int]("maturity_days") === 24)
    assert(math.abs(opt.getAs[Double]("maturity_months") - 24 / 30.5) < 1e-12)

    // end-to-end: the stringTs sink round-trips the string schema
    val sout = Files.createTempDirectory("graft_eurex_stringts").toString
    EurexPipeline.run(spark, eurexCsv, dimCsv, sout, stringTs = true)
    val facts = spark.read.parquet(s"$sout/data/eurex")
    assert(facts.count() === 3546)
    assert(facts.schema("trading_ts").dataType === StringType)
    assert(facts.schema("maturity_date").dataType === StringType)
  }

  test("partition pruning on the pipelines' OWN output (etl.py:62,171 intent)") {
    // The reference's design intent is that downstream `WHERE
    // trading_date=` scans read one partition, not the table. Prove it on
    // the pipeline's real output, not a synthetic frame: build a two-day
    // corpus (the sample day plus a date-rewritten copy), run the full
    // pipeline, and pin the partition filter at the scan.
    val dir = Files.createTempDirectory("graft_xetra_2day")
    val sample = Files.readString(java.nio.file.Path.of(xetraCsv))
    Files.writeString(dir.resolve("day1.csv"), sample)
    Files.writeString(dir.resolve("day2.csv"), sample.replace("2020-11-24", "2020-11-25"))
    val out = Files.createTempDirectory("graft_xetra_2day_out").toString
    XetraPipeline.run(spark, s"$dir/*.csv", out)

    def scansOf(df: org.apache.spark.sql.DataFrame) = {
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanLike] =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            unwrap(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => unwrap(q.plan)
          case f: FileSourceScanLike => Seq(f)
        }.flatten
      unwrap(df.queryExecution.executedPlan)
    }

    val pruned = spark.read.parquet(s"$out/data/xetra")
      .where(col("trading_date") === "2020-11-25")
    assert(pruned.count() === 15057, "exactly the rewritten day's rows")
    val scan = scansOf(pruned).head
    assert(scan.partitionFilters.nonEmpty,
      "trading_date predicate must reach the scan as a partition filter")
    assert(new java.io.File(s"$out/data/xetra/trading_date=2020-11-24").isDirectory &&
      new java.io.File(s"$out/data/xetra/trading_date=2020-11-25").isDirectory,
      "both hive partitions must exist, so a full read would see 2x rows")

    // same proof for the Eurex quality sink's market_segment layout (A4)
    val eout = Files.createTempDirectory("graft_eurex_prune_out").toString
    EurexPipeline.run(spark, eurexCsv, dimCsv, eout)
    val mu = spark.read.parquet(s"$eout/quality_check/missing_underlying")
    val seg = mu.select("market_segment").head.getString(0)
    val muPruned = mu.where(col("market_segment") === seg)
    assert(muPruned.count() > 0)
    assert(scansOf(muPruned).head.partitionFilters.nonEmpty,
      "market_segment predicate must reach the quality-sink scan")
  }

  test("ingestion-time quality capture: malformed rows are quarantined, clean rows flow") {
    // the reference's sample data plus two planted bad rows: a truncated
    // line and a row with a non-numeric volume — both must land in the
    // quarantine sink as raw lines while every clean row reaches the fact
    // sink (capture-at-ingest upgrade over etl.py:166-175's post-hoc checks)
    val dir = Files.createTempDirectory("graft_xetra_dirty")
    val dirty = dir.resolve("bars.csv")
    val sample = Files.readString(java.nio.file.Path.of(xetraCsv))
    Files.writeString(dirty, sample.stripTrailing() +
      "\nBADROW,truncated,line\n" +
      "DE000TEST001,TST,DESC,Common stock,EUR,1,2020-11-24,08:00,1.0,1.0,1.0,1.0,not_a_number,1\n")
    val out = Files.createTempDirectory("graft_xetra_dirty_out").toString
    XetraPipeline.run(spark, dirty.toString, out)
    val quarantined = spark.read.parquet(s"$out/quality_check/corrupt_rows")
      .collect().map(_.getString(0))
    assert(quarantined.length === 2)
    assert(quarantined.exists(_.startsWith("BADROW")))
    assert(quarantined.exists(_.startsWith("DE000TEST001")))
    val facts = spark.read.parquet(s"$out/data/xetra")
    assert(facts.count() === 15057)
    assert(!facts.columns.contains(graft.sources.CsvQuality.CorruptCol))

    // the clean reference file quarantines nothing but still writes the sink
    val cleanOut = Files.createTempDirectory("graft_eurex_clean_out").toString
    EurexPipeline.run(spark, eurexCsv, dimCsv, cleanOut)
    assert(spark.read.parquet(s"$cleanOut/quality_check/corrupt_rows").count() === 0)
    assert(spark.read.parquet(s"$cleanOut/data/eurex").count() === 3546)
  }
}
