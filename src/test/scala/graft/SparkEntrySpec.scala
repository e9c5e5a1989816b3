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
    // The query itself now ships the oracle-checkable within_bounds flag
    // (|approx−exact|/exact ≤ 0.15); this test pins the TIGHT design
    // bound (default rsd = 5%) on the raw estimate at the bench scale.
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, col}
    val dir = "/root/testdata/sf0.1"
    val rows = graft.Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
           countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (flag, ap, ex) = (r.getString(0), r.getLong(1), r.getLong(2))
      val err = math.abs(ap - ex).toDouble / ex
      info(f"$flag: exact=$ex approx=$ap relative error=${err * 100}%.2f%%")
      assert(err <= 0.05, f"$flag: HLL error ${err * 100}%.2f%% exceeds 5%%")
    }
    // and the shipped flags must all be TRUE
    val flags = SparkEntry.queries("q_approx_distinct")(spark, dir).collect()
    assert(flags.forall(r => r.getBoolean(r.fieldIndex("within_bounds"))))
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

  test("the queries and oracleSql map literals declare no duplicate keys") {
    // Scala Map literals keep the LAST duplicate key, so a reused query
    // name silently SHADOWS the original on both the query and oracle
    // sides — consistently, so every downstream validation stays green
    // while a declared operator stops being exercised (the r18 q_rbo
    // near-miss: the new projected-ranking RBO almost replaced the r12
    // BM25-vs-LM ranker overlap). Textual gate: each `"q_..." ->` key
    // must appear exactly once per map literal.
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala"))
    val qStart = src.indexOf("lazy val queries")
    val oStart = src.indexOf("def oracleSql")
    assert(qStart >= 0 && oStart > qStart)
    // only TOP-LEVEL map-literal entries (4-space indent) — deeper
    // indents are nested helper Maps (dynamic oracle variants), which
    // reuse the name deliberately
    def keys(section: String): Seq[String] =
      "(?m)^    \"(q_[a-z0-9_]+)\" ->".r.findAllMatchIn(section).map(_.group(1)).toSeq
    def dupes(ks: Seq[String]): Seq[String] =
      ks.groupBy(identity).collect { case (k, v) if v.size > 1 => k }.toSeq.sorted
    val qKeys = keys(src.substring(qStart, oStart))
    val oKeys = keys(src.substring(oStart))
    // the regex is indentation-sensitive by design; a reformat that
    // changes the entry indent would silently blind the guard (ADVICE
    // r18 item 3), so the match count must stay plausible vs the
    // RUNTIME map sizes — fewer textual keys than live entries means
    // the pattern stopped seeing them, and the test fails loudly
    assert(qKeys.size >= SparkEntry.queries.size,
      s"queries guard regex found ${qKeys.size} textual keys but the map has " +
        s"${SparkEntry.queries.size} entries — formatting drift disabled the guard")
    // compare the oracle side against the STATIC map, not the runtime
    // one: the IVF/PQ/BPE-family dynamic oracles join oracleSql only
    // once their model artifacts exist, so the runtime size moves with
    // test-suite ordering while the textual count cannot
    assert(oKeys.size >= SparkEntry.staticOracles.size,
      s"oracleSql guard regex found ${oKeys.size} textual keys but the static map " +
        s"has ${SparkEntry.staticOracles.size} entries — formatting drift disabled the guard")
    val qDupes = dupes(qKeys)
    val oDupes = dupes(oKeys)
    assert(qDupes.isEmpty, s"duplicate keys in queries: ${qDupes.mkString(", ")}")
    assert(oDupes.isEmpty, s"duplicate keys in oracleSql: ${oDupes.mkString(", ")}")
    // every static oracle names a declared query (the reverse doesn't
    // hold here: the IVF/PQ-family oracles are DYNAMIC — they join the
    // map only once their model artifacts exist for the target sfDir)
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
