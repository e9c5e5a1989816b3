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

  test("sketch parameter sweep: HLL error tracks 1.04/sqrt(m) across m in {16, 64, 256}") {
    // Measured evidence for the m = 64 default (VERDICT r8 item 6 — the
    // residual-PQ measure-don't-guess standard applied to the sketches):
    // realized relative error per register count against the exact
    // distinct, asserted within 3 standard errors of the HLL bound.
    val events = graft.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val exact = events.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Seq(16, 64, 256).map { m =>
      val est = Profiling.hllDistinct(events, Seq("event_type"), "user_id", m)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
      val relErrs = exact.map { case (k, n) => math.abs(est(k) - n) / n.toDouble }
      val maxErr = relErrs.max
      val bound = 1.04 / math.sqrt(m.toDouble)
      assert(maxErr <= 3 * bound,
        s"m=$m: max relative error $maxErr exceeds 3x the HLL standard error $bound")
      (m, maxErr, bound)
    }
    info("HLL sweep (m, observed max rel error, 1.04/sqrt(m)):")
    rows.foreach { case (m, e, b) => info(f"  m=$m%3d  err=$e%.4f  bound=$b%.4f") }
    // more registers must not make things worse across the sweep's span
    assert(rows.last._2 <= rows.head._2 + 0.02,
      "error at m=256 should not exceed error at m=16")
  }

  test("sketch parameter sweep: histogram quantile error stays within one bin width across nBins") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val qs = Seq(0.5, 0.9, 0.99)
    val grouped = events.select(col("event_type"), col("value").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = Seq(32, 128, 512).map { nBins =>
      val est = Profiling.histogramQuantiles(events, Seq("event_type"), "value", nBins, qs)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val errs = grouped.toSeq.flatMap { case (k, vs) =>
        val binW = (vs.last - vs.head) / nBins
        qs.map { q =>
          val orderStat = vs(math.min(vs.length - 1, math.ceil(q * vs.length).toInt - 1))
          val e = math.abs(est((k, q)) - orderStat)
          assert(e <= binW + 1e-9,
            s"nBins=$nBins ($k, $q): error $e exceeds one bin width $binW")
          e / binW
        }
      }
      (nBins, errs.max)
    }
    info("histogram sweep (nBins, observed max error in bin widths — bound is 1.0):")
    rows.foreach { case (b, e) => info(f"  nBins=$b%3d  err=$e%.3f binW") }
  }

  test("imageDims JPEG marker walk: SOF0/SOF2 behind skip segments, malformed variants rejected") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val app0 = "FFE0" + "0010" + "4A46494600010100000100010000"
    val com = "FFFE" + "0007" + "706C616E74"
    // baseline SOF0, 1024x768 (h=0x0300, w=0x0400) behind APP0 + COM
    val sof0 = hexBytes("FFD8" + app0 + com +
      "FFC0" + "0011" + "08" + "0300" + "0400" + "03012200021101031101")
    // progressive SOF2 with FF fill bytes before the marker and an RST
    // standalone marker in the walk, 17x4097 (h=0x0011, w=0x1001)
    val sof2 = hexBytes("FFD8" + app0 + "FFD0" + "FF" +
      "FFC2" + "0011" + "08" + "0011" + "1001" + "03012200021101031101")
    // malformed: APP0 length runs past the payload end
    val truncated = hexBytes("FFD8FFE00010")
    // malformed: entropy-coded scan (SOS) before any SOF
    val sosFirst = hexBytes("FFD8" + app0 + "FFDA" + "000C" + "03010002110311003F00")
    // malformed: zero-length segment (length field < 2)
    val zeroLen = hexBytes("FFD8" + "FFE0" + "0001" + "00")
    val packed = spark.createDataFrame(Seq(
        (1L, sof0), (2L, sof2), (3L, truncated), (4L, sosFirst), (5L, zeroLen)))
      .toDF("id", "payload")
    val out = MultimodalOps.imageDims(packed).collect()
      .map(d => d.id -> ((d.format, d.width, d.height))).toMap
    assert(out(1L) === (("jpeg", 1024L, 768L)))
    assert(out(2L) === (("jpeg", 4097L, 17L)))
    assert(out(3L) === (("unknown", -1L, -1L)))
    assert(out(4L) === (("unknown", -1L, -1L)))
    assert(out(5L) === (("unknown", -1L, -1L)))
  }
}
