package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Doc8(doc_id: Long, text: String)

/** Round-8 operators: BPE encode (apply a trained merge table), the
  * per-round-checkpointed training loop, and their exact accounting
  * identity (support at round i == merges applied by encode's i-th fold).
  */
class Round8OpsSpec extends SparkSpec {

  private def docs = df(Seq(
    Doc8(1, "a b a b c d"),
    Doc8(2, "a b c d c d"),
    Doc8(3, "x y x y x y"),
    Doc8(4, "a a a a a"),
    Doc8(5, "solo")))

  test("bpeEncode: applies merges in order with the greedy overlap rule") {
    val out = TextOps.bpeEncode(docs, "doc_id", "text", Seq(("a", "b"), ("c", "d")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 6L, 3L, "ab ab cd")))
    assert(out(1) === ((2L, 6L, 3L, "ab cd cd")))
    assert(out(2) === ((3L, 6L, 6L, "x y x y x y")))
    // "a a a a a" under (a,a)-free table: untouched
    assert(out(3) === ((4L, 5L, 5L, "a a a a a")))
    assert(out(4) === ((5L, 1L, 1L, "solo")))
  }

  test("bpeEncode: overlap rule matches training ('a a a a a' under (a,a) -> [aa, aa, a])") {
    val out = TextOps.bpeEncode(docs.where(col("doc_id") === 4), "doc_id", "text",
        Seq(("a", "a")))
      .collect().head
    assert(out.getLong(2) === 3L)
    assert(out.getString(3) === "aa aa a")
  }

  test("bpeEncode: chained merges consume earlier merge outputs") {
    val d = df(Seq(Doc8(1, "a b c a b c")))
    val out = TextOps.bpeEncode(d, "doc_id", "text", Seq(("a", "b"), ("ab", "c")))
      .collect().head
    assert(out.getString(3) === "abc abc")
    assert(out.getLong(2) === 2L)
  }

  test("bpeTrainMerges support bounds the token-count drop; exact for distinct pairs") {
    // Support is the raw adjacent-pair count at that round. For a ≠ b the
    // pair's occurrences are disjoint (an overlap would need a == b), so
    // greedy encode applies exactly `support` merges; for a == b a run of
    // L tokens counts L−1 pairs but merges ⌊L/2⌋ times — support is an
    // upper bound. docs(4) = "a a a a a" makes (a,a) the first merge, so
    // both branches are exercised here.
    val merges = TextOps.bpeTrainMerges(docs, "text", 4)
    assert(merges.nonEmpty)
    assert(merges.head._2 === "a" && merges.head._3 === "a",
      "the fixture must adopt the self-pair (a,a) first (support 4)")
    val raw = docs.select(sum(size(TextOps.tokens(col("text"))))).collect().head.getLong(0)
    var prev = raw
    merges.zipWithIndex.foreach { case ((_, a, b, support), i) =>
      val prefix = merges.take(i + 1).map { case (_, x, y, _) => (x, y) }
      val total = TextOps.bpeEncode(docs, "doc_id", "text", prefix)
        .agg(sum("n_tokens_bpe")).collect().head.getLong(0)
      val drop = prev - total
      assert(drop > 0 && drop <= support,
        s"merge ${i + 1} ($a,$b): drop $drop must be in (0, support=$support]")
      if (a != b) assert(drop === support,
        s"merge ${i + 1} ($a,$b): distinct-pair drop must equal support")
      prev = total
    }
  }

  test("bpeTrainMerges: token counts drop monotonically per merge (8 rounds at sf0.001)") {
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val merges = TextOps.bpeTrainMerges(corpus, "text", 8)
    assert(merges.length === 8)
    assert(merges.forall(_._4 > 0))
    val raw = corpus.select(sum(size(TextOps.tokens(col("text"))))).collect().head.getLong(0)
    val totals = (1 to merges.length).map { i =>
      TextOps.bpeEncode(corpus, "doc_id", "text",
          merges.take(i).map { case (_, a, b, _) => (a, b) })
        .agg(sum("n_tokens_bpe")).collect().head.getLong(0)
    }
    assert((raw +: totals).sliding(2).forall { case Seq(prev, cur) => cur < prev },
      s"corpus token count must drop strictly every merge: raw=$raw totals=$totals")
    // Supports bound the drops (exact when no merge is a self-pair).
    assert(totals.last >= raw - merges.map(_._4).sum)
  }

  // ── dedupSpanStride ───────────────────────────────────────────────────

  // 20 distinct tokens of boilerplate, planted at an OFF-boundary offset.
  private val boiler = (1 to 20).map(i => s"boil$i").mkString(" ")

  test("dedupSpanStride catches off-boundary boilerplate that aligned spans provably miss") {
    val corpus = df(Seq(
      Doc8(1, boiler),                                        // first occurrence
      Doc8(2, s"p1 p2 p3 p4 p5 $boiler t1 t2 t3 t4 t5"),      // offset 5: stride-aligned, span-misaligned
      Doc8(3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")))             // unrelated
    // Aligned spans (span=20): every span of doc 2 straddles the
    // boilerplate boundary, so NO cross-doc span duplicate exists.
    val aligned = TextOps.dedupParagraphs(corpus, "doc_id", "text", span = 20)
    assert(aligned.where(col("doc_id") === 2 && col("kept") === 0).count() === 0,
      "aligned spans must miss the offset-5 boilerplate (the blind spot)")
    // Stride windows (stride=5): doc 2's window at token offset 5 equals
    // doc 1's first window, so segments 1-4 of doc 2 are removed.
    val strided = TextOps.dedupSpanStride(corpus, "doc_id", "text", span = 20, stride = 5)
      .orderBy("doc_id", "seg_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val removed = strided.filter(_._3 == 0L).map(t => (t._1, t._2))
    assert(removed.toSet === Set((2L, 1), (2L, 2), (2L, 3), (2L, 4)),
      s"exactly doc 2 segments 1-4 must be removed, got ${removed.mkString(",")}")
    // Docs 1 and 3 fully kept (first occurrence / unrelated).
    assert(strided.filter(t => t._1 != 2L).forall(_._3 == 1L))
  }

  // ── tokenBudgetSelect ─────────────────────────────────────────────────

  test("tokenBudgetSelect equals the single-global-window reference, without one") {
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = TextOps.tokenBudgetSelect(corpus, "doc_id", "text", budget = 15000L)
    // reference: the straightforward corpus-wide running sum
    val q = TextOps.qualityScore(corpus, "text")
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val refW = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality_score").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = q.withColumn("cum_tokens", sum("n_tokens").over(refW))
      .withColumn("kept", (col("cum_tokens") <= 15000L).cast("int").cast("long"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_tokens", "quality_score", "cum_tokens", "kept")
      .orderBy("doc_id").collect().toSeq
    assert(rows(out) === rows(ref))
    // the budget actually cuts: both kept and dropped docs exist
    val kept = out.where(col("kept") === 1).count()
    assert(kept > 0 && kept < corpus.count())
    // scale shape: the corpus-side running sum must be a PARTITIONED
    // window — the only unpartitioned window allowed is the k-row bucket
    // offset (≤ nBuckets+1 rows by construction). Inspect the logical
    // plan (the physical one hides inside the AQE wrapper).
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
    }
    assert(windows.exists(_.nonEmpty), "corpus running sum must be bucket-partitioned")
  }

  // ── shingleNovelty ────────────────────────────────────────────────────

  test("shingleNovelty: shared fraction counts shingles present in other docs") {
    val docs = df(Seq(
      Doc8(1, "a b c d e"),        // shingles: abc bcd cde
      Doc8(2, "a b c x y"),        // shares abc with doc 1
      Doc8(3, "p q r s t")))       // fully novel
    val sh = TextOps.shingles(docs, "doc_id", "text", 3)
    val out = TextOps.shingleNovelty(sh, "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((1L, 3L, 1L, 0.333333)))
    assert(out(1) === ((2L, 3L, 1L, 0.333333)))
    assert(out(2) === ((3L, 3L, 0L, 0.0)))
  }

  test("shingleNovelty: within-doc repeats do not count as shared") {
    // "a b c a b c" has distinct shingles {abc, bca, cab} — repeats inside
    // one doc collapse (shingles are distinct per doc), so df stays 1.
    val docs = df(Seq(Doc8(1, "a b c a b c"), Doc8(2, "x y z w v")))
    val out = TextOps.shingleNovelty(
        TextOps.shingles(docs, "doc_id", "text", 3), "doc_id")
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(2) == 0L), "no cross-doc sharing exists here")
  }

  // ── qualityFloorByDomain ──────────────────────────────────────────────

  test("qualityFloorByDomain: floors are per-domain, kept iff at or above own floor") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = TextOps.qualityFloorByDomain(docs, "doc_id", "text", "source", 0.25)
    val rows = out.collect()
    assert(rows.length === docs.count())
    val byDomain = rows.groupBy(_.getString(1))
    assert(byDomain.size > 1, "fixture must have several source domains")
    byDomain.foreach { case (dom, rs) =>
      val floor = rs.head.getDouble(3)
      assert(rs.forall(_.getDouble(3) === floor), s"one floor per domain $dom")
      rs.foreach { r =>
        assert((r.getLong(4) == 1L) === (r.getDouble(2) >= floor))
      }
      // roughly the top 75% survive (exact fraction depends on ties)
      val kept = rs.count(_.getLong(4) == 1L).toDouble / rs.length
      assert(kept >= 0.6 && kept <= 1.0, s"$dom kept fraction $kept")
    }
    // floors genuinely differ across domains (adaptive, not global)
    assert(byDomain.values.map(_.head.getDouble(3)).toSet.size > 1)
  }

  // ── tokenizeToIds ─────────────────────────────────────────────────────

  test("tokenizeToIds: frequency-ranked ids, OOV as 0, position order preserved") {
    val docs = df(Seq(
      Doc8(1, "b a b c b a"),   // freqs: b=3(+1 below =4? no, per-corpus) ...
      Doc8(2, "a a z")))
    // corpus freqs: a=4, b=3, c=1, z=1 → vocab(3): a=1, b=2, c=3; z OOV
    val out = TextOps.tokenizeToIds(docs, "doc_id", "text", vocabSize = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    assert(out(0) === ((1L, 6L, 0L, "2 1 2 3 2 1")))
    assert(out(1) === ((2L, 3L, 1L, "1 1 0")))
  }

  // ── hllDistinct ───────────────────────────────────────────────────────

  test("hllDistinct: estimates within HLL error bounds of the exact distinct count") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val est = Profiling.hllDistinct(events, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, d) =>
      val relErr = math.abs(est(k) - d) / d.toDouble
      info(f"$k: exact=$d est=${est(k)}%.1f relErr=$relErr%.3f")
      // raw m=64 estimator: 1.04/sqrt(64) = 13% std error; 3 sigma ≈ 0.4
      assert(relErr < 0.4, s"$k: estimate ${est(k)} vs exact $d")
    }
  }

  test("hllDistinct: shard sketches merge by register max into the whole-corpus sketch") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "event_type", "user_id")
    // Rebuild the register tables for two disjoint shards and max-merge
    // them; the merged state must reproduce the whole-corpus sketch
    // EXACTLY (max is the HLL merge monoid — same claim as count-min's
    // element-wise sum, proven on the register representation).
    def registers(df: org.apache.spark.sql.DataFrame) =
      Profiling.hllRegisters(df, Seq("event_type"), "user_id")
    val a = registers(events.where(pmod(col("event_id"), lit(2)) === 0))
    val b = registers(events.where(pmod(col("event_id"), lit(2)) === 1))
    val merged = a.unionByName(b).groupBy("event_type", "_idx").agg(max("_r").as("_r"))
    val whole = registers(events)
    assert(merged.except(whole).count() === 0 && whole.except(merged).count() === 0,
      "max-merged shard registers must equal the whole-corpus registers")
  }

  // ── histogramQuantiles ────────────────────────────────────────────────

  test("histogramQuantiles: estimates within one bin width of the q*n-th order statistic") {
    // The sketch's guarantee is on the COUNT-BASED quantile: the estimate
    // lands in the bin of the ceil(q*n)-th order statistic. (Interpolated
    // quantile_cont can sit between order statistics bins apart on a
    // sparse tail — that's a definition difference, not sketch error.)
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val qs = Seq(0.5, 0.9, 0.99)
    val est = Profiling.histogramQuantiles(events, Seq("event_type"), "value",
        nBins = 128, qs = qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val grouped = events.select(col("event_type"), col("value").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(est.keySet === grouped.keySet.flatMap(k => qs.map(k -> _)))
    grouped.foreach { case (k, vs) =>
      val binW = (vs.last - vs.head) / 128.0
      qs.foreach { q =>
        val orderStat = vs(math.min(vs.length - 1, math.ceil(q * vs.length).toInt - 1))
        val e = est((k, q))
        assert(math.abs(e - orderStat) <= binW + 1e-9,
          s"($k, $q): estimate $e must be within one bin width ($binW) of order statistic $orderStat")
      }
    }
  }

  test("histogramQuantiles: shard histograms with shared edges sum into the whole") {
    // The mergeable-state claim: bin counts from disjoint shards (same
    // [lo, hi] edges) sum element-wise into the whole-corpus histogram.
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("event_type"), col("value").cast("double").as("v"))
    val ext = events.groupBy("event_type").agg(min("v").as("lo"), max("v").as("hi"))
    def hist(df: org.apache.spark.sql.DataFrame) = df.join(broadcast(ext), Seq("event_type"))
      .select(col("event_type"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / 128)),
            lit(127L))).cast("long").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))
    val a = hist(events.where(pmod(col("event_id"), lit(2)) === 0))
    val b = hist(events.where(pmod(col("event_id"), lit(2)) === 1))
    val merged = a.unionByName(b).groupBy("event_type", "bin").agg(sum("cnt").as("cnt"))
    val whole = hist(events)
    assert(merged.except(whole).count() === 0 && whole.except(merged).count() === 0)
  }

  // ── imageDims ─────────────────────────────────────────────────────────

  test("imageDims parses PNG (BE u32) and GIF (LE u16) headers, rejects junk") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // PNG 640x480: sig + IHDR len + "IHDR" + w + h + depth/color/padding
    val png = hexBytes("89504E470D0A1A0A0000000D49484452" +
      "00000280" + "000001E0" + "0806000000")
    // GIF89a 320x200 little-endian: 40 01 / C8 00
    val gif = hexBytes("474946383961" + "4001" + "C800" + "000000")
    // Truncated PNG (signature only) and plain text
    val junk1 = hexBytes("89504E470D0A1A0A")
    val junk2 = "just some text bytes".getBytes("UTF-8")
    val packed = spark.createDataFrame(Seq(
        (1L, png), (2L, gif), (3L, junk1), (4L, junk2)))
      .toDF("id", "payload")
      .withColumn("meta", struct(lit("image/*").as("mime"),
        length(col("payload")).cast("long").as("byte_len"), lit("t").as("source")))
    val out = MultimodalOps.imageDims(packed).collect()
      .map(d => d.id -> ((d.format, d.width, d.height))).toMap
    assert(out(1L) === (("png", 640L, 480L)))
    assert(out(2L) === (("gif", 320L, 200L)))
    assert(out(3L) === (("unknown", -1L, -1L)))
    assert(out(4L) === (("unknown", -1L, -1L)))
  }

  // ── SessionMemo ───────────────────────────────────────────────────────

  test("session memo releases the previous corpus's checkpoint blocks on re-key") {
    def checkpointRddId(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
        case other => fail(s"expected a checkpointed LogicalRDD plan, got $other")
      }
    val docsA = df(Seq(Doc8(1, "alpha beta gamma delta"), Doc8(2, "epsilon zeta eta")))
    val docsB = df(Seq(Doc8(3, "one two three"), Doc8(4, "four five six")))
    val a = TextOps.qualityScoreCached(docsA, "text", spark, "memo-spec-A")
    val idA = checkpointRddId(a)
    assert(spark.sparkContext.getPersistentRDDs.contains(idA),
      "the memoized frame must be checkpoint-pinned while live")
    // same key → same cached frame, no re-materialization
    assert(TextOps.qualityScoreCached(docsA, "text", spark, "memo-spec-A") eq a)
    // re-key → the old entry's blocks are RELEASED (VERDICT r7 item 8)
    val b = TextOps.qualityScoreCached(docsB, "text", spark, "memo-spec-B")
    assert(!spark.sparkContext.getPersistentRDDs.contains(idA),
      "re-keying must unpersist the previous corpus's checkpoint")
    assert(spark.sparkContext.getPersistentRDDs.contains(checkpointRddId(b)))
    assert(b.count() === 2)
  }

  test("dedupSpanStride with stride == span degenerates to the aligned policy") {
    val corpus = df(Seq(
      Doc8(1, boiler),
      Doc8(2, s"$boiler x1 x2 x3 x4 x5")))
    val out = TextOps.dedupSpanStride(corpus, "doc_id", "text", span = 20, stride = 20)
      .orderBy("doc_id", "seg_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // doc 2 seg 0 duplicates doc 1 seg 0; its tail segment survives.
    assert(out.toSeq === Seq((1L, 0, 1L), (2L, 0, 0L), (2L, 1, 1L)))
  }
}
