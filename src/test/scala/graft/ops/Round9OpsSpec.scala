package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 operators: the scale-safe (sketch-derived) per-domain quality
  * floor and its error bound against the exact floor.
  */
class Round9OpsSpec extends SparkSpec {

  test("qualityFloorByDomainSketch: floor within one bin width of the exact floor") {
    // The C122 fix's contract: the sketch floor (mergeable (domain, bin)
    // state) must land within one bin width (hi−lo)/nBins of the exact
    // floor. At 25 docs/domain the count-based target ceil(q·n) = 7 and
    // quantile_cont's interpolation position (n−1)·q = 6 pick the SAME
    // order statistic, so the exact-percentile floor and the sketch's
    // count-based guarantee are directly comparable here. (On sparser
    // domains quantile_cont interpolates between order statistics that
    // can sit bins apart — a definition difference, not sketch error; see
    // Profiling.histogramQuantiles.)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val nBins = 128
    val exact = TextOps.qualityFloorByDomain(docs, "doc_id", "text", "source", 0.25)
    val sketch = TextOps.qualityFloorByDomainSketch(docs, "doc_id", "text", "source", 0.25, nBins)

    val exactFloors = exact.select("source", "domain_floor").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sketchFloors = sketch.select("source", "domain_floor").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sketchFloors.keySet === exactFloors.keySet)
    assert(sketchFloors.nonEmpty)

    val ext = TextOps.qualityScore(docs, "text")
      .groupBy("source")
      .agg(min("quality_score").as("lo"), max("quality_score").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    sketchFloors.foreach { case (domain, sf) =>
      val (lo, hi) = ext(domain)
      val binW = (hi - lo) / nBins
      val ef = exactFloors(domain)
      assert(math.abs(sf - ef) <= binW + 1e-9,
        s"$domain: sketch floor $sf must be within one bin width ($binW) of exact floor $ef")
    }

    // and both keep a plausible fraction: the floor is a 25th percentile,
    // so roughly three quarters of each domain survives either way
    val n = docs.count().toDouble
    val keptSketch = sketch.where(col("kept") === 1).count().toDouble / n
    assert(keptSketch > 0.6 && keptSketch < 0.9, s"kept fraction $keptSketch")
  }
}
