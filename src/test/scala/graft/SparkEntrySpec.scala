package graft

import org.apache.spark.sql.functions._

/** Contract smoke test: every declared query runs at sf0.001, every oracle
  * key maps to a declared query, and the flagship entry returns rows —
  * the same invariants the driver checks, caught at test time.
  */
class SparkEntrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every declared query executes and is non-degenerate at sf0.001") {
    val empties = Seq("q_minhash_lsh", "q_embed_neardup_lsh") // legitimately sparse
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      withClue(s"$name: ") {
        assert(n >= 0)
        if (!empties.contains(name)) assert(n > 0, s"$name returned 0 rows")
      }
    }
  }

  test("q_approx_distinct HLL estimate is within 5% of the exact count at sf0.1") {
    // The one declared query with neither an oracle (HLL sketches are
    // engine-specific) nor, until now, a quantitative check. Compare the
    // estimate against q_count_distinct's exact answer per group at the
    // bench scale factor and assert the relative error is inside the
    // sketch's design bound (default rsd = 5%).
    val dir = "/root/testdata/sf0.1"
    val approx = SparkEntry.queries("q_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("q_count_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, ex) =>
      val err = math.abs(approx(flag) - ex).toDouble / ex
      info(f"$flag: exact=$ex approx=${approx(flag)} relative error=${err * 100}%.2f%%")
      assert(err <= 0.05, f"$flag: HLL error ${err * 100}%.2f%% exceeds 5%%")
    }
  }

  test("declared queries have deterministic output across reruns") {
    // re-run a representative mix twice and compare full collected output
    Seq("q_groupby_agg", "q_topk", "q_dedup_exact", "q_cosine_topk", "q_sessionize")
      .foreach { name =>
        val a = SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq
        val b = SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq
        withClue(s"$name: ")(assert(a === b))
      }
  }
}
