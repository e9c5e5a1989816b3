package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

case class Cell(id: Long, a: Long, b: Long)

/** Z-order layout: Morton-code correctness and the data-skipping claim —
  * a z-ordered layout bounds the data read for rectangle predicates on
  * EITHER clustered dimension, where a 1-D sort serves only its own
  * column. Skipping is measured from the per-file min/max ranges (what
  * parquet row-group pruning and file-level skipping both key on).
  */
class ZOrderSpec extends SparkSpec {

  test("mortonCode interleaves bits (hand-checked)") {
    // a=3 (11), b=1 (01), 2 bits: a0<<1 | b0<<0 | a1<<3 | b1<<2 = 0b1011
    val out = df(Seq(Cell(0, 3, 1)))
      .select(ZOrder.mortonCode(col("a"), col("b"), 2).as("z")).head().getLong(0)
    assert(out === 11L)
    // order relation: (2,2) and (3,3) are both in the top-right quadrant,
    // (0,3) in the top-left; curve keeps quadrants contiguous
    val codes = df(Seq(Cell(0, 2, 2), Cell(1, 3, 3), Cell(2, 0, 3)))
      .select(ZOrder.mortonCode(col("a"), col("b"), 2).as("z"))
      .collect().map(_.getLong(0))
    assert(codes(0) === 12L && codes(1) === 15L && codes(2) === 5L)
  }

  private def rowsScannable(path: String, pred: (Long, Long, Long, Long) => Boolean): Long = {
    // rows living in files whose (a, b) min/max rectangle intersects the
    // predicate rectangle — what a stats-based reader cannot skip
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("alo"), max("a").as("ahi"),
        min("b").as("blo"), max("b").as("bhi"), count(lit(1)).as("n"))
      .collect()
      .filter(r => pred(r.getAs[Long]("alo"), r.getAs[Long]("ahi"),
        r.getAs[Long]("blo"), r.getAs[Long]("bhi")))
      .map(_.getAs[Long]("n")).sum
  }

  test("z-order bounds data read for rectangles on either dimension; 1-D sort does not") {
    val grid = df(for { a <- 0L until 128L; b <- 0L until 128L }
      yield Cell(a * 128 + b, a, b))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val zPath = s"$tmp/z"
    val aPath = s"$tmp/a"
    ZOrder.writeZOrdered(grid.toDF(), "a", "b", 16, zPath, bits = 7)
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(aPath) // the 1-D baseline layout
    val total = 128L * 128L

    // predicate on b alone: b in [32, 47]. File boundaries come from
    // repartitionByRange's SAMPLED range split, which shifts with the
    // input partition layout (suite vs standalone), so the skip bounds
    // carry a file-alignment margin; the no-skip claim is exact.
    val bPred = (alo: Long, ahi: Long, blo: Long, bhi: Long) => bhi >= 32 && blo <= 47
    val zB = rowsScannable(zPath, bPred)
    val aB = rowsScannable(aPath, bPred)
    assert(aB === total, "1-D a-sorted layout cannot skip anything for a b-predicate")
    assert(zB <= total * 3 / 4, s"z-order must bound the b-rectangle read (read $zB of $total)")

    // predicate on a alone: the z-layout still prunes (coarser than a pure
    // a-sort, but bounded)
    val aPred = (alo: Long, ahi: Long, blo: Long, bhi: Long) => ahi >= 32 && alo <= 47
    assert(rowsScannable(zPath, aPred) <= total * 3 / 4)
    assert(rowsScannable(aPath, aPred) <= total / 2) // its own column: strong pruning

    // correctness: layout changes nothing about the data
    val zRows = spark.read.parquet(zPath).where(col("b").between(32, 47))
      .select("id").collect().map(_.getLong(0)).sorted
    val want = grid.where(col("b").between(32, 47))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(zRows.toSeq === want.toSeq)
  }

  // Executed-plan scan metrics for `df.collect()`: rows the parquet
  // reader actually materialized (after row-group stats skipping +
  // pushed filters) and files listed. AQE wrappers are unwrapped or the
  // metrics read the adaptive root (vacuous — PlanInvariantsSpec lesson).
  private def scanMetrics(dfq: DataFrame): (Long, Long) = {
    dfq.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flatten(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          flatten(s.plan)
        case _ => Seq.empty
      }
      (p +: p.children.flatMap(flatten)) ++ inner
    }
    val scans = flatten(dfq.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a parquet FileSourceScanExec in the executed plan")
    (scans.map(_.metrics("numOutputRows").value).sum,
     scans.map(_.metrics("numFiles").value).sum)
  }

  test("declared rectangle on the real events artifact: z-order scan reads a bounded fraction") {
    // VERDICT r6 item 5 — measure the READ PATH of the exact q_zorder_scan
    // rectangle (user_id 2-9 × minute 600-780) on the real sf0.001 events
    // artifact, from executed-plan metrics rather than synthetic file
    // stats. Each file of the 32-file layout is one row group, so
    // row-group stats skipping ≈ file skipping; the baseline is the same
    // table written WITHOUT any clustering (insertion order: ts-ish, so
    // (user, minute) rectangles touch every file).
    val dir = "/root/testdata/sf0.001"
    val zPath = ZOrder.ensureZOrderedEvents(spark, dir)
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        (hour(col("ts")) * 60 + minute(col("ts"))).cast("long").as("minute_of_day"),
        col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zplain").toString
    ev.repartition(32).write.mode("overwrite").parquet(tmp) // unclustered baseline
    val total = ev.count()

    def rect(df: DataFrame) = df
      .where(col("user_id").between(2, 9) && col("minute_of_day").between(600, 780))
    val (zRows, zFiles) = scanMetrics(rect(spark.read.parquet(zPath)))
    val (pRows, pFiles) = scanMetrics(rect(spark.read.parquet(tmp)))
    info(s"z-ordered: $zRows of $total rows materialized across $zFiles files")
    info(s"plain:     $pRows of $total rows materialized across $pFiles files")
    // the plain layout's row-group stats cover the full (user, minute)
    // domain per file — nothing skippable; z-order must cut the read
    assert(pRows === total, "unclustered layout cannot skip any row group for the rectangle")
    assert(zRows <= total / 2,
      s"z-ordered layout must materialize < 50% of rows for the declared rectangle (read $zRows/$total)")
    // answers identical regardless of layout
    assert(rect(spark.read.parquet(zPath)).agg(sum("event_id")).head().getLong(0) ===
      rect(spark.read.parquet(tmp)).agg(sum("event_id")).head().getLong(0))
  }

  test("ensureZOrderedEvents is write-once and preserves the table") {
    val p1 = ZOrder.ensureZOrderedEvents(spark, "/root/testdata/sf0.001", nFiles = 8)
    val p2 = ZOrder.ensureZOrderedEvents(spark, "/root/testdata/sf0.001", nFiles = 8)
    assert(p1 === p2)
    val z = spark.read.parquet(p1)
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(z.count() === src.count())
    assert(z.agg(sum("event_id")).head().getLong(0) ===
      src.agg(sum("event_id")).head().getLong(0))
  }
}
