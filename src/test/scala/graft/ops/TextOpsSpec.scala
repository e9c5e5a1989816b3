package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Doc(doc_id: Long, text: String)

class TextOpsSpec extends SparkSpec {

  private def docs = df(Seq(
    Doc(0, "the quick brown fox jumps over the lazy dog"),
    Doc(1, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    Doc(2, "THE  quick   brown fox jumps over the lazy dog"), // dup modulo case/ws
    Doc(3, "the quick brown fox leaps over the lazy dog"),    // near-dup (1 token)
    Doc(4, "completely different content about spark engines"),
    Doc(5, "")))

  test("tokens: whitespace runs collapse, empty text yields no tokens") {
    val r = TextOps.tokenStats(docs, "text").orderBy("doc_id")
      .select("n_tokens").collect().map(_.getLong(0))
    assert(r(0) === 9)
    assert(r(2) === 9)     // double spaces don't create phantom tokens
    assert(r(5) === 0)     // empty doc
  }

  test("wordCount aggregates across corpus") {
    val wc = TextOps.wordCount(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc("the") === 7)   // 2 per doc in 0,1,3; doc 2's first is "THE" (case-sensitive)
    assert(wc("fox") === 4)
    assert(!wc.contains(""))
  }

  test("qualityScore guards empty docs") {
    val r = TextOps.qualityScore(docs, "text").where(col("doc_id") === 5).head()
    assert(r.getAs[Double]("avg_token_len") === 0.0)
    assert(r.getAs[Double]("stopword_ratio") === 0.0)
    assert(r.getAs[Double]("quality_score") === 0.0)
  }

  test("dedupExact: keeps min-id row per normalized fingerprint") {
    val kept = TextOps.dedupExact(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // 0,1,2 share a fingerprint (case/whitespace normalized) → keep 0
    assert(kept.toSeq === Seq(0L, 3L, 4L, 5L))
  }

  test("dedupExact is idempotent (property)") {
    val once = TextOps.dedupExact(docs, "doc_id", "text")
    val twice = TextOps.dedupExact(once, "doc_id", "text")
    assert(once.count() === twice.count())
  }

  test("minHashLsh surfaces the near-dup pair, skips unrelated docs") {
    val cands = TextOps.minHashLshCandidates(docs, "doc_id", "text", n = 3, k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = cands.map(c => (c._1, c._2)).toSet
    assert(pairs.contains((0L, 1L)))   // exact dups always collide
    // doc 4 shares no shingles with 0 → never a candidate
    assert(!pairs.exists(p => p._2 == 4L && p._1 <= 3L))
    // estimated jaccard of identical docs is 1.0
    assert(cands.find(c => c._1 == 0L && c._2 == 1L).get._3 === 1.0)
  }

  test("ngramJaccardPairs: exact jaccard on shingle sets") {
    val r = TextOps.ngramJaccardPairs(docs, "doc_id", "text", 3)
      .where(col("id_a") === 0 && col("id_b") === 1).head()
    assert(r.getAs[Double]("jaccard") === 1.0)
    val near = TextOps.ngramJaccardPairs(docs, "doc_id", "text", 3)
      .where(col("id_a") === 0 && col("id_b") === 3).head()
    // 9 tokens → 7 shingles each; "jumps"→"leaps" perturbs 3 → 4 common, 10 union
    assert(math.abs(near.getAs[Double]("jaccard") - 0.4) < 1e-12)
  }

  test("simHash: identical docs agree, unrelated docs differ") {
    val h = TextOps.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    assert(h(0) === h(1))
    assert(h(0) !== h(4))
    def popcount(x: Long) = java.lang.Long.bitCount(x)
    // near-dup differs in few bits; unrelated in many
    assert(popcount(h(0) ^ h(3)) < popcount(h(0) ^ h(4)))
  }

  test("repetitionSignals: dup-token and top-bigram fractions on known docs") {
    val corpus = df(Seq(
      Doc(0, "spam spam spam spam"),          // 4 tokens, 1 uniq; bigram "spam spam" x3 of 3
      Doc(1, "all tokens here are unique"),   // 5 tokens, 5 uniq; every bigram count 1 of 4
      Doc(2, "one"),                          // single token: no bigrams
      Doc(3, "")))                            // empty: everything 0
    val out = TextOps.repetitionSignals(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0L) === ((4L, 1L, 0.75, 1.0)))
    assert(out(1L) === ((5L, 5L, 0.0, 0.25)))
    assert(out(2L) === ((1L, 1L, 0.0, 0.0)))
    assert(out(3L) === ((0L, 0L, 0.0, 0.0)))
  }

  test("redactPii replaces emails and phone numbers and counts them") {
    val corpus = df(Seq(
      Doc(0, "reach me at jane.doe+x@corp.example.org or +1-555-0123 thanks"),
      Doc(1, "no pii here at all"),
      Doc(2, "two mails a@b.io c@d.net and digits 12345678")))
    val out = TextOps.redactPii(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(0L) === ((2L, "reach me at <EMAIL> or <PHONE> thanks")))
    assert(out(1L) === ((0L, "no pii here at all")))
    assert(out(2L) === ((3L, "two mails <EMAIL> <EMAIL> and digits <PHONE>")))
  }

  test("chunkDocuments slides a token window with overlap; empty docs emit nothing") {
    // doc 0 has 9 tokens; size=4, overlap=1 → step 3 → starts 0,3,6
    val chunks = TextOps.chunkDocuments(docs.where(col("doc_id").isin(0L, 5L)),
        "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
    assert(chunks.length === 3) // doc 5 (empty) contributes none
    assert(chunks.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L))
    assert(chunks(0).getString(2) === "the quick brown fox")
    assert(chunks(1).getString(2) === "fox jumps over the")
    assert(chunks(2).getString(2) === "the lazy dog") // final short window
    assert(chunks.map(_.getLong(3)).toSeq === Seq(4L, 4L, 3L))
  }

  test("packSequences fills shards to the token budget deterministically") {
    val counts = TextOps.tokenStats(docs, "text").select("doc_id", "n_tokens")
    val packed = TextOps.packSequences(counts, "doc_id", "n_tokens",
        budget = 10L, shards = 1) // one shard → global id-ordered fill
      .orderBy("doc_id").collect()
    // doc token counts: 9,9,9,9,6,0 → exclusive prefix: 0,9,18,27,36,42
    assert(packed.map(_.getLong(2)).toSeq === Seq(0L, 0L, 1L, 2L, 3L, 4L))
    assert(packed.map(_.getLong(3)).toSeq === Seq(0L, 9L, 8L, 7L, 6L, 2L))
    // sharded variant is a partition of the same rows with shard-local fill
    val sharded = TextOps.packSequences(counts, "doc_id", "n_tokens", 10L, 4)
    assert(sharded.count() === 6)
    assert(sharded.where(col("pack_offset") >= 10L).count() === 0)
  }

  test("phone pattern requires 7-15 digits and tolerates real separators") {
    val corpus = df(Seq(
      Doc(0, "call (555) 123-4567 now"),   // parens + space + hyphens
      Doc(1, "dotted 555.123.4567 form"),  // dot separators
      Doc(2, "id 123456 is too short"),    // 6 digits: below the minimum
      Doc(3, "zip 12345 and year 2024")))  // short digit runs untouched
    val out = TextOps.redactPii(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(0L) === ((1L, "call <PHONE> now")))
    assert(out(1L) === ((1L, "dotted <PHONE> form")))
    assert(out(2L) === ((0L, "id 123456 is too short")))
    assert(out(3L) === ((0L, "zip 12345 and year 2024")))
  }

  test("rowSimHash equals the wide-aggregation simHash on the real documents table") {
    // the streaming-safe row-local form must be bit-identical to the batch
    // shuffle form — same token hash, same occurrence-weighted vote rule
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val batch = TextOps.simHash(real, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rowLocal = real.select(col("doc_id"), TextOps.rowSimHash(col("text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty)
    // batch simHash has no row for token-less docs (no exploded rows);
    // rowSimHash yields 0 for them — compare on the batch key set
    assert(batch.keySet.subsetOf(rowLocal.keySet))
    batch.foreach { case (id, v) => assert(rowLocal(id) === v, s"doc $id") }
  }

  test("pruneFrequentShingles drops hot-key shingles so a skewed corpus completes flat") {
    // Every doc shares one boilerplate trigram (a hot join key that would
    // fan out 200x200); the rest of each doc is unique.
    val skewed = df((0L until 200L).map(i => Doc(i, s"common boiler plate u${i}a u${i}b u${i}c")))
    val sh = TextOps.shingles(skewed, "doc_id", "text", 3)
    val pruned = TextOps.pruneFrequentShingles(sh, "doc_id", 0.5)
    // exactly the ubiquitous shingle is dropped (df=200 of 200; all others df=1)
    assert(pruned.count() === sh.count() - 200)
    assert(pruned.where(col("shingle") === "common boiler plate").count() === 0)
    // with the guard the join has no hot key and no phantom matches survive
    val pairs = TextOps.ngramJaccardPairs(skewed, "doc_id", "text", 3, maxDocFreqRatio = 0.5)
    assert(pairs.count() === 0)
    // guard off => the boilerplate shingle alone creates all-pairs matches
    val unguarded = TextOps.ngramJaccardPairs(skewed.where(col("doc_id") < 20), "doc_id", "text", 3)
    assert(unguarded.count() === 20L * 19 / 2)
  }

  test("contaminationFlags counts benchmark shingle overlap per corpus doc") {
    val bench = df(Seq(Doc(100, "the quick brown fox jumps")))
    // doc 0 shares the benchmark's trigrams; doc 4 shares none
    val flags = TextOps.contaminationFlags(docs, bench, "doc_id", "text", 3, minCommon = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(flags(0)._1 === 3 && flags(0)._2)       // 3 shared trigrams
    assert(flags(4)._1 === 0 && !flags(4)._2)
    assert(flags(3)._2)                            // near-dup of 0 still overlaps
    assert(flags.size === docs.count())
  }

  test("Md5Hash64 matches the portable conv(substring(md5)) recipe bit-for-bit") {
    val samples = docs.select(explode(TextOps.tokens(col("text"))).as("s"))
      .union(df(Seq(Doc(0, "edge"))).select(lit("").as("s")))
      .union(df(Seq(Doc(0, "edge"))).select(lit("héllo wörld 🎛").as("s")))
    val both = samples.select(
      graft.functions.Md5Hash64.hash64(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("lo"),
      conv(substring(md5(col("s")), 9, 8), 16, 10).cast("long").as("hi"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val native = r.getSeq[Long](0)
      assert(native(0) === r.getLong(1) && native(1) === r.getLong(2))
    }
  }

  test("langIdByProfile recovers the label on a separable corpus") {
    val labeled = spark.createDataFrame(Seq(
      (0L, "aaa bbb ccc ddd", "x"), (1L, "aaa bbb ccc eee", "x"),
      (2L, "zzz yyy xxx www", "y"), (3L, "zzz yyy xxx vvv", "y")))
      .toDF("doc_id", "text", "lang")
    val pred = TextOps.langIdByProfile(labeled, "doc_id", "text", "lang", 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(0) === "x" && pred(1) === "x" && pred(2) === "y" && pred(3) === "y")
  }
}
