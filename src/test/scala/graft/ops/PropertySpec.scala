package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY.md §5.2.4) over ScalaCheck-generated
  * series with fixed seeds (deterministic CI): forward-fill idempotence,
  * lag-returns price-path reconstruction, resample volume conservation.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default.withSize(12), Seed(i.toLong)))

  private def t(i: Int) = new java.sql.Timestamp(1704067200000L + i * 60000L)

  test("forwardFill is idempotent") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 2L), Gen.option(Gen.choose(1.0, 100.0))))
    samples(gen, 5).foreach { rows =>
      val in = spark.createDataFrame(
        rows.zipWithIndex.map { case ((k, v), i) =>
          (k, i.toLong, v.map(Double.box).orNull.asInstanceOf[java.lang.Double]) })
        .toDF("k", "seq", "v")
      val once = TimeSeries.forwardFill(in, "k", "seq", "v")
        .select(col("k"), col("seq"), col("filled_value").as("v"))
      val twice = TimeSeries.forwardFill(once, "k", "seq", "v")
        .select(col("k"), col("seq"), col("filled_value").as("v"))
      assert(once.orderBy("k", "seq").collect().toSeq ===
             twice.orderBy("k", "seq").collect().toSeq)
    }
  }

  test("lagReturns reconstructs the price path: p_i = p_{i-1} * (1 + ret_i)") {
    val gen = Gen.nonEmptyListOf(Gen.choose(1.0, 1000.0))
    samples(gen, 5).foreach { prices =>
      val in = spark.createDataFrame(prices.zipWithIndex.map { case (p, i) => (1L, i.toLong, p) })
        .toDF("k", "seq", "p")
      val rets = TimeSeries.lagReturns(in, "k", "seq", "p")
        .orderBy("seq").select("p", "prev_value", "ret").collect()
      rets.drop(1).foreach { r =>
        val (p, prev, ret) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        assert(math.abs(prev * (1.0 + ret) - p) < 1e-9 * math.max(1.0, p))
      }
    }
  }

  test("chunkDocuments covers every token exactly; adjacent chunks overlap as declared") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val gen = Gen.nonEmptyListOf(word)
    samples(gen, 5).foreach { words =>
      val text = words.mkString(" ")
      val in = spark.createDataFrame(Seq((0L, text))).toDF("doc_id", "text")
      val chunks = TextOps.chunkDocuments(in, "doc_id", "text", chunkSize = 4, overlap = 2)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getLong(1), r.getString(2).split(" ").toSeq, r.getLong(3)))
      // chunk_idx is dense from 0; window starts advance by chunkSize - overlap
      assert(chunks.map(_._1).toSeq === chunks.indices.map(_.toLong))
      // reassembling from starts reproduces the token sequence exactly
      val step = 2
      chunks.foreach { case (idx, toks, n) =>
        val start = idx.toInt * step
        assert(toks === words.slice(start, start + 4), s"chunk $idx")
        assert(n === toks.length.toLong)
      }
      // full coverage: the last chunk reaches the final token
      val (lastIdx, lastToks, _) = chunks.last
      assert(lastIdx.toInt * step + lastToks.length === words.length)
    }
  }

  test("packSequences: packs are contiguous per shard and never exceed the budget start") {
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 9L))
    samples(gen, 5).foreach { counts =>
      val in = spark.createDataFrame(counts.zipWithIndex.map { case (n, i) => (i.toLong, n) })
        .toDF("doc_id", "n_tokens")
      val out = TextOps.packSequences(in, "doc_id", "n_tokens", budget = 10L, shards = 3)
        .orderBy("shard", "doc_id").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(out.length === counts.length) // every doc is packed exactly once
      out.groupBy(_._1).foreach { case (_, rows) =>
        // offsets are the exclusive running sum within the shard
        var running = 0L
        rows.foreach { case (_, packId, offset, n) =>
          assert(packId === running / 10L)
          assert(offset === running % 10L)
          running += n
        }
      }
    }
  }

  test("resampleOhlc conserves volume and rows; OHLC bounds hold") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 500), Gen.choose(1L, 100L)))
    samples(gen, 5).foreach { obs =>
      val in = spark.createDataFrame(
        obs.zipWithIndex.map { case ((minOff, vol), i) =>
          (1L, i.toLong, t(minOff), minOff.toDouble, vol) })
        .toDF("k", "seq", "ts", "px", "vol")
      val out = TimeSeries.resampleOhlc(in, "k", "ts", "seq", "px", "vol", "hour")
      val agg = out.agg(sum("volume"), sum("n_trades")).head()
      assert(agg.getLong(0) === obs.map(_._2).sum)
      assert(agg.getLong(1) === obs.size.toLong)
      val bad = out.where(col("high") < col("low") ||
        col("open") > col("high") || col("open") < col("low") ||
        col("close") > col("high") || col("close") < col("low")).count()
      assert(bad === 0)
    }
  }

  test("ewma stays within the running min/max of its inputs (convexity)") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-50.0, 50.0))
    samples(gen, 5).foreach { xs =>
      val in = spark.createDataFrame(xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) })
        .toDF("k", "seq", "v")
      val out = TimeSeries.ewma(in, "k", "seq", "v", 0.4)
        .orderBy("seq").select("ewma").collect().map(_.getDouble(0))
      var lo = Double.MaxValue
      var hi = Double.MinValue
      xs.zip(out).foreach { case (x, y) =>
        lo = math.min(lo, x); hi = math.max(hi, x)
        assert(y >= lo - 1e-9 && y <= hi + 1e-9,
          s"ewma $y escaped running input range [$lo, $hi]")
      }
    }
  }

  test("simHashNearDup pairs are ordered, within the Hamming bound, and self-free") {
    val word = Gen.oneOf("spark", "scala", "query", "table", "joins", "batch")
    val gen = Gen.nonEmptyListOf(Gen.listOfN(6, word).map(_.mkString(" ")))
    samples(gen, 3).foreach { texts =>
      val in = spark.createDataFrame(texts.zipWithIndex.map { case (txt, i) => (i.toLong, txt) })
        .toDF("doc_id", "text")
      val pairs = TextOps.simHashNearDup(in, "doc_id", "text", 3).collect()
      pairs.foreach { r =>
        assert(r.getLong(0) < r.getLong(1))
        assert(r.getAs[Long]("hamming") <= 3)
      }
      // exactly-once: no duplicate pairs even when several bands agree
      assert(pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length === pairs.length)
    }
  }

  test("connectedComponents reps are component-consistent for random edge sets") {
    val gen = Gen.listOf(Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    samples(gen, 5).foreach { rawEdges =>
      val edges = rawEdges.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val nodes = spark.createDataFrame((0L until 20L).map(Tuple1(_))).toDF("id")
      val edgeDf = spark.createDataFrame(
        if (edges.isEmpty) Seq((-1L, -2L)) else edges).toDF("a", "b")
      val reps = Graph.connectedComponents(nodes, "id", edgeDf, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every edge endpoint pair shares a rep; every rep maps to itself
      edges.foreach { case (a, b) => assert(reps(a) === reps(b)) }
      reps.values.filter(reps.contains).foreach(rep => assert(reps(rep) === rep))
      reps.foreach { case (id, rep) => assert(rep <= id) }
    }
  }

  test("dedupExact output has unique fingerprints for any corpus") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val gen = Gen.nonEmptyListOf(Gen.listOfN(4, word).map(_.mkString(" ")))
    samples(gen, 5).foreach { texts =>
      val in = spark.createDataFrame(texts.zipWithIndex.map { case (txt, i) => (i.toLong, txt) })
        .toDF("doc_id", "text")
      val out = TextOps.dedupExact(in, "doc_id", "text")
      assert(out.count() === out.select("fingerprint").distinct().count())
      assert(out.count() === in.select(lower(col("text"))).distinct().count())
    }
  }

  test("basketPairs emits exactly the unordered distinct-item pairs of every basket") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 9L)))
    samples(gen, 5).foreach { rows =>
      val in = spark.createDataFrame(rows).toDF("b", "i")
      val got = Relational.basketPairs(in, "b", "i")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // reference: per basket, all a < b pairs of the DISTINCT items,
      // multiset-concatenated across baskets
      val want = rows.groupBy(_._1).values.flatMap { basket =>
        val its = basket.map(_._2).distinct.sorted
        for (a <- its; b <- its if a < b) yield (a, b)
      }.toSeq.sorted
      assert(got === want)
      got.foreach { case (a, b) => assert(a < b) }
    }
  }

  test("basketTriples emits exactly the ordered distinct-item triples of every basket") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 9L)))
    samples(gen, 5).foreach { rows =>
      val in = spark.createDataFrame(rows).toDF("b", "i")
      val got = Relational.basketTriples(in, "b", "i")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val want = rows.groupBy(_._1).values.flatMap { basket =>
        val its = basket.map(_._2).distinct.sorted
        for (a <- its; b <- its if a < b; c <- its if b < c) yield (a, b, c)
      }.toSeq.sorted
      assert(got === want)
      got.foreach { case (a, b, c) => assert(a < b && b < c) }
    }
  }

  test("mergeBasketPairSupports equals the full rebuild for any split") {
    // The C45/C113 delta-merge identity, property-tested over random
    // fact tables and random base/delta row splits — including splits
    // where baskets span both sides and where one side is empty.
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 7L))),
      Gen.choose(0, 100))
    samples(gen, 5).foreach { case (rows, splitPct) =>
      val tagged = rows.zipWithIndex
      val (baseRows, deltaRows) = tagged.partition { case (_, i) => i * 100 < splitPct * rows.size }
      def frame(rs: Seq[((Long, Long), Int)]) =
        spark.createDataFrame(rs.map(_._1) :+ ((-1L, -1L))).toDF("b", "i")
          .where(col("b") >= 0) // keep the schema when the side is empty
      def support(df: org.apache.spark.sql.DataFrame) = Relational
        .basketPairs(df, "b", "i")
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
      val base = frame(baseRows)
      val delta = frame(deltaRows)
      val merged = Relational.mergeBasketPairSupports(support(base), base, delta, "b", "i")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val full = support(frame(tagged))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(merged === full)
    }
  }

  test("countMinSketch merges by element-wise addition across corpus shards") {
    // The shard-merge (monoid) property CmSketchState runs continuously:
    // sketch(A ++ B) = sketch(A) + sketch(B) cell-wise, for ANY split.
    val word = Gen.oneOf("a", "bb", "ccc", "dd", "e", "fff")
    val gen = Gen.nonEmptyListOf(Gen.listOfN(6, word).map(_.mkString(" ")))
    samples(gen, 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (txt, i) => (i.toLong, txt) }
      def sketch(rows: Seq[(Long, String)]): Map[(Int, Long), Long] =
        if (rows.isEmpty) Map.empty
        else TextOps.countMinSketch(
            spark.createDataFrame(rows).toDF("doc_id", "text"), "text", 4, 32)
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val (l, r) = docs.partition(_._1 % 2 == 0)
      val whole = sketch(docs)
      val merged = (sketch(l).toSeq ++ sketch(r).toSeq)
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      assert(merged === whole)
    }
  }

  // ── PassJoin segment blocking (C142) ──────────────────────────────────

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistSelfJoin is lossless for any corpus at tau in {1, 2}") {
    // Small alphabet + short strings maximize near-miss density — the
    // regime where a broken segment/shift window actually drops pairs.
    val strGen = for {
      n <- Gen.choose(3, 9)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpusGen = Gen.nonEmptyListOf(strGen)
    for (tau <- Seq(1, 2)) {
      samples(corpusGen, 6).foreach { strs =>
        val rows = strs.distinct.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        val in = spark.createDataFrame(rows).toDF("id", "name")
        val got = Linkage.editDistSelfJoin(in, "id", "name", tau)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val want = (for {
          a <- rows; b <- rows if a._1 < b._1
          d = levRef(a._2, b._2) if d <= tau
        } yield (a._1, b._1, d.toLong)).toSet
        assert(got === want, s"tau=$tau corpus=${strs.distinct}")
      }
    }
  }
}
