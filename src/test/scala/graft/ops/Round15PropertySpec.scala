package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Seeded property tests for the round-15 operators: each generated
  * input is judged by a plain-Scala referee, never the operator's own
  * formulation.
  */
class Round15PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default.withSize(16), Seed(i.toLong)))

  test("skyline2D equals brute-force dominance for random point sets") {
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 8L), Gen.choose(0L, 8L)))
    samples(gen, 8).foreach { pts =>
      val rows = pts.zipWithIndex.map { case ((g, x, y), i) => (i.toLong, g, x, y) }
      val in = spark.createDataFrame(rows).toDF("id", "g", "x", "y")
      val got = Relational.skyline2D(in, "g", "x", "y")
        .collect().map(_.getLong(0)).toSet
      val want = rows.filterNot { case (_, g, x, y) =>
        rows.exists { case (_, g2, x2, y2) =>
          g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
      }.map(_._1).toSet
      assert(got === want, s"points: $rows")
    }
  }

  test("skyline2D is idempotent: skyline(skyline(S)) = skyline(S)") {
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 6L)))
    samples(gen, 5).foreach { pts =>
      val rows = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, "g", x, y) }
      val in = spark.createDataFrame(rows).toDF("id", "g", "x", "y")
      val once = Relational.skyline2D(in, "g", "x", "y")
      val twice = Relational.skyline2D(once, "g", "x", "y")
      assert(once.collect().map(_.getLong(0)).toSet ===
        twice.collect().map(_.getLong(0)).toSet)
    }
  }

  test("acf matches the plain-Scala Pearson referee for random series") {
    val gen = Gen.listOfN(12, Gen.choose(-50.0, 50.0))
    samples(gen, 6).foreach { vals =>
      val rows = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      val in = spark.createDataFrame(rows).toDF("k", "seq", "v")
      val out = TimeSeries.acf(in, "k", "seq", "v", 3)
        .collect().map(r => r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      (1 to 3).foreach { l =>
        val x = vals.drop(l); val y = vals.dropRight(l)
        val n = x.size.toDouble
        val varX = n * x.map(v => v * v).sum - x.sum * x.sum
        val varY = n * y.map(v => v * v).sum - y.sum * y.sum
        out.get(l.toLong).foreach { got =>
          if (varX > 1e-9 && varY > 1e-9 && x.size >= 2) {
            val want = (n * x.zip(y).map(p => p._1 * p._2).sum - x.sum * y.sum) /
              (math.sqrt(varX) * math.sqrt(varY))
            assert(got.isDefined && math.abs(got.get - want) < 1e-4, s"lag $l of $vals")
            assert(got.get >= -1.0 - 1e-9 && got.get <= 1.0 + 1e-9)
          }
        }
      }
    }
  }

  test("adamicAdarBipartite matches the referee for random affiliation graphs") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 6L), Gen.choose(101L, 105L)))
    samples(gen, 8).foreach { raw =>
      val edges = raw.distinct
      val in = spark.createDataFrame(edges).toDF("c", "s")
      val out = Graph.adamicAdarBipartite(in, "c", "s", topK = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      val deg = edges.groupBy(_._2).view.mapValues(_.size).toMap
      val want = edges.flatMap { case (c1, s) =>
        edges.collect { case (c2, `s`) if c1 < c2 => ((c1, c2), s) }
      }.groupBy(_._1).map { case (pair, shared) =>
        val supps = shared.map(_._2)
        pair -> ((supps.size.toLong,
          math.rint(supps.map(s => 1.0 / math.log(deg(s))).sum * 1e6) / 1e6))
      }
      assert(out.keySet === want.keySet, s"edges: $edges")
      want.foreach { case (pair, (n, score)) =>
        assert(out(pair)._1 === n)
        assert(math.abs(out(pair)._2 - score) < 1e-6, s"pair $pair of $edges")
      }
    }
  }

  test("cdcChunks reassembles every text exactly and chunks deterministically") {
    val gen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    samples(gen, 6).foreach { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val in = spark.createDataFrame(rows).toDF("id", "text")
      val chunks = TextOps.cdcChunks(in, "id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      // partition property: per doc, chunk lengths sum to the text length
      // and chunk numbers are 1..n contiguous
      rows.foreach { case (id, t) =>
        val mine = chunks.filter(_._1 == id).sortBy(_._2)
        assert(mine.map(_._4).sum === t.length.toLong, s"doc $id len")
        assert(mine.map(_._2).toSeq === (1L to mine.length).toSeq)
      }
      // identical texts chunk identically (content-defined = content-keyed)
      val byText = rows.groupBy(_._2)
      byText.values.filter(_.size >= 2).foreach { same =>
        val fps = same.map(r => chunks.filter(_._1 == r._1).sortBy(_._2).map(_._3).toSeq)
        assert(fps.distinct.size === 1)
      }
    }
  }

  test("naiveBayesConfusion row counts conserve docs for random corpora") {
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("A", "B", "C"),
      Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" "))))
    samples(gen, 6).foreach { docs =>
      val rows = docs.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
      val in = spark.createDataFrame(rows).toDF("doc_id", "lang", "text")
      val m = TextOps.naiveBayesConfusion(in, "lang", "text", "doc_id")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // every doc lands in exactly one confusion cell; true-label
      // marginals match the corpus label counts
      assert(m.map(_._3).sum === rows.size.toLong)
      val trueCounts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      m.groupBy(_._1).foreach { case (t, cells) =>
        assert(cells.map(_._3).sum === trueCounts(t), s"marginal for $t")
      }
      // predictions only ever name labels that exist in the corpus
      assert(m.map(_._2).toSet.subsetOf(trueCounts.keySet))
    }
  }

  test("retrievalMetrics invariants: p_at_k*k and r_at_k*n_rel are the same integer") {
    val gen = Gen.zip(
      Gen.choose(3, 12),                        // ranked depth
      Gen.nonEmptyListOf(Gen.choose(1L, 15L)))  // relevant ids (dups ok)
    samples(gen, 8).foreach { case (depth, rels) =>
      val ranked = spark.createDataFrame(
        (1 to depth).map(i => (i.toLong * 3L % 16L, i.toLong))).toDF("doc_id", "rank")
      val relDf = spark.createDataFrame(rels.map(Tuple1(_))).toDF("doc_id")
      val k = 4
      val r = Relational.retrievalMetrics(ranked, relDf, "doc_id", "rank", k)
        .collect().head
      val nRel = r.getLong(1)
      assert(nRel === rels.distinct.size.toLong)
      val hits = math.rint(r.getDouble(3) * k)
      if (nRel > 0) {
        assert(math.abs(r.getDouble(4) * nRel - hits) < 1e-3,
          s"p@k and r@k must count the same hit set (depth=$depth rels=$rels)")
        assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0 + 1e-9)
      }
      if (!r.isNullAt(2)) assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
  }
}
