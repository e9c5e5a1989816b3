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
