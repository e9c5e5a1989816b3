package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operators must degrade to empty output (not throw) on empty inputs —
  * the behavior a scheduled pipeline hits on a day with no data.
  */
class EmptyInputSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)
  private def emptyBars = df(Seq.empty[Bar])
  private def emptyDocs = df(Seq.empty[Doc])

  test("time-series ops on empty input") {
    assert(TimeSeries.lagReturns(emptyBars, "isin", "seq", "price").count() === 0)
    assert(TimeSeries.rollingVol(emptyBars, "isin", "seq", "price", 5).count() === 0)
    assert(TimeSeries.forwardFill(emptyBars, "isin", "seq", "price").count() === 0)
    assert(TimeSeries.densifyAndFill(
      emptyBars.select("isin", "ts", "price"), "isin", "ts", "price", 60L).count() === 0)
    assert(TimeSeries.resampleOhlc(emptyBars, "isin", "ts", "seq", "price", "vol", "hour").count() === 0)
    assert(TimeSeries.weightedIndex(emptyBars, col("isin"), col("price"), col("vol")).count() === 0)
  }

  test("asOfJoin with empty left keeps right rows with null asof columns") {
    val right = df(Seq(Bar("A", 1, t("2024-01-01 00:00:00"), 1.0, 1)))
    val out = TimeSeries.asOfJoin(emptyBars.select("isin", "ts", "price"),
      right.toDF(), "isin", "ts", Seq("price"))
    assert(out.count() === 1)
    assert(out.head().isNullAt(out.columns.indexOf("asof_price")))
  }

  test("text ops on empty corpus") {
    assert(TextOps.wordCount(emptyDocs, "text").count() === 0)
    assert(TextOps.dedupExact(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextOps.dedupLines(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextOps.winnowFingerprints(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextOps.gopherRules(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextOps.minHashLshCandidates(emptyDocs, "doc_id", "text", 3, 16, 4).count() === 0)
    assert(TextOps.simHash(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextOps.langIdByProfile(
      emptyDocs.withColumn("lang", lit("x")), "doc_id", "text", "lang", 5).count() === 0)
  }

  test("vector ops on empty corpus") {
    val emptyVecs = df(Seq.empty[Vec])
    assert(VectorOps.selfDot(emptyVecs, "vec_id", "embedding").count() === 0)
    assert(VectorOps.cosineTopK(emptyVecs, emptyVecs, "vec_id", "embedding", 5).count() === 0)
    assert(VectorOps.nearDupPairsLsh(emptyVecs, "vec_id", "embedding", 0.5, 2, 2, 8).count() === 0)
    assert(VectorOps.kMeansCentroids(emptyVecs, "vec_id", "embedding", 4, 2).isEmpty)
    assert(VectorOps.subKMeans(emptyVecs, "vec_id", "embedding", 4, 2).isEmpty)
    assert(VectorOps.pqTopK(emptyVecs, emptyVecs, "vec_id", "embedding", 5,
      Array.fill(4)(Array.fill(2)(Array.fill(16)(0.1f))), rerank = 10).count() === 0)
    assert(VectorOps.quantizeInt8(emptyVecs, "vec_id", "embedding").count() === 0)
  }

  test("iterative ops on empty inputs") {
    val emptyNodes = df(Seq.empty[Node])
    val emptyEdges = df(Seq.empty[Edge])
    assert(Graph.connectedComponents(emptyNodes, "id", emptyEdges, "id_a", "id_b").count() === 0)
    assert(TimeSeries.ewma(df(Seq.empty[Bar]).select("isin", "seq", "price"),
      "isin", "seq", "price", 0.5).count() === 0)
  }

  test("round-12 graph ops on empty inputs") {
    val emptyDir = df(Seq.empty[DirEdge])
    val emptyW = df(Seq.empty[WEdge])
    val emptyEdges = df(Seq.empty[Edge])
    assert(Graph.hits(emptyDir, "src", "dst", 2).count() === 0)
    assert(Graph.labelPropagation(emptyDir, "src", "dst", 2).count() === 0)
    assert(Graph.ssspWithinHops(emptyW, "a", "b", "w",
      df(Seq.empty[Node]), "id", 2).count() === 0)
    // both peel paths: the local finish (default) and the pure loop
    assert(Graph.kCore(emptyEdges, "id_a", "id_b", 2).count() === 0)
    assert(Graph.kCore(emptyEdges, "id_a", "id_b", 2, localFinishEdges = 0L).count() === 0)
  }

  test("round-12 text ops on empty corpus") {
    assert(TextOps.pmiCollocations(emptyDocs, "text", 2).count() === 0)
    assert(TextOps.domainDivergence(
      emptyDocs.withColumn("source", lit("x")), "source", "text").count() === 0)
    assert(TextOps.dsirWeights(emptyDocs.withColumn("source", lit("x")),
      "doc_id", "text", "source", "x", 16).count() === 0)
    assert(TextOps.textRank(emptyDocs, "text", 2).count() === 0)
  }

  test("round-4 ops on empty inputs") {
    assert(TextOps.repetitionSignals(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextOps.redactPii(emptyDocs, "doc_id", "text").count() === 0)
    assert(Profiling.zScore(emptyBars, Seq("isin"), "price").count() === 0)
    val emptyKv = df(Seq.empty[Kv]).withColumn("version", lit(1L))
    assert(Relational.upsertLatest(emptyKv, emptyKv, Seq("k"), "version").count() === 0)
    assert(Relational.snapshotDiff(
      df(Seq.empty[Kv]), df(Seq.empty[Kv]), Seq("k"), Seq("v")).count() === 0)
    // empty updates: upsert must be the identity on the base snapshot
    val base = df(Seq(Kv("a", 1))).withColumn("version", lit(1L))
    assert(Relational.upsertLatest(base, emptyKv, Seq("k"), "version").count() === 1)
  }

  test("round-5 ops on empty inputs") {
    assert(TextOps.tfIdfTopTerms(emptyDocs, "doc_id", "text", 5).count() === 0)
    assert(TextOps.chunkDocuments(emptyDocs, "doc_id", "text", 64, 16).count() === 0)
    assert(TextOps.packSequences(
      emptyDocs.withColumn("n_tokens", lit(1L)), "doc_id", "n_tokens", 2048L, 8).count() === 0)
    assert(MultimodalOps.decodeByteFeatures(MultimodalOps.packBinary(
      emptyDocs.withColumnRenamed("doc_id", "id"), "id", "text", "text/plain")).count() === 0)
  }

  test("round-7 ops on empty inputs") {
    val emptyVecs = df(Seq.empty[Vec])
    val cents = Array(Array(1f, 0f), Array(0f, 1f))
    assert(VectorOps.semanticDedup(emptyVecs, "vec_id", "embedding", cents, 0.9).count() === 0)
    val emptyNames = emptyDocs.select(col("doc_id").as("id"), col("text").as("name"))
    assert(Linkage.fuzzySelfJoinLev1(emptyNames, "id", "name").count() === 0)
    assert(Linkage.linkLev1(emptyNames, emptyNames, "id", "name").count() === 0)
    assert(TextOps.heavyHitters(emptyDocs, "text", 0.1).count() === 0)
  }

  test("round-7 late-batch ops on empty inputs") {
    val emptyEdges = df(Seq.empty[Kv]).select(col("k").as("a"), col("v").as("b"))
    assert(Graph.triangleCounts(emptyEdges, "a", "b").count() === 0)
    assert(TextOps.tokenEntropy(emptyDocs, "doc_id", "text").count() === 0)
    val emptyW = emptyDocs.select(col("doc_id"), lit("g").as("grp"), lit(1.0).as("w"))
    assert(Relational.weightedSample(emptyW, "doc_id", "grp", "w", 5).count() === 0)
    val emptyVecs = df(Seq.empty[Vec])
    assert(VectorOps.matryoshka(emptyVecs, "vec_id", "embedding", 8).count() === 0)
  }

  test("round-8 ops on empty and degenerate inputs") {
    // empty corpus
    assert(TextOps.dedupSpanStride(emptyDocs, "doc_id", "text", 20, 5).count() === 0)
    assert(TextOps.bpeEncode(emptyDocs, "doc_id", "text", Seq(("a", "b"))).count() === 0)
    assert(TextOps.bpeTrainMerges(emptyDocs, "text", 4).isEmpty)
    assert(TextOps.shingleNovelty(
      TextOps.shingles(emptyDocs, "doc_id", "text", 3), "doc_id").count() === 0)
    assert(TextOps.qualityFloorByDomain(
      emptyDocs.withColumn("source", lit("x")), "doc_id", "text", "source", 0.25).count() === 0)
    assert(TextOps.tokenBudgetSelect(emptyDocs, "doc_id", "text", 1000L).count() === 0)
    // empty merge table: encode must be the identity tokenization
    val one = df(Seq(Doc(1, "a b c")))
    val enc = TextOps.bpeEncode(one, "doc_id", "text", Seq.empty).collect().head
    assert(enc.getLong(1) === 3L && enc.getLong(2) === 3L && enc.getString(3) === "a b c")
    // 1-token docs: no window shorter than a doc, nothing throws
    val tiny = df(Seq(Doc(1, "solo"), Doc(2, "solo")))
    val spans = TextOps.dedupSpanStride(tiny, "doc_id", "text", 20, 5)
      .orderBy("doc_id").collect()
    assert(spans.map(r => (r.getLong(0), r.getLong(2))).toSeq === Seq((1L, 1L), (2L, 0L)),
      "identical 1-token docs still dedup (doc 2's only window duplicates doc 1's)")
    // zero-token budget keeps nothing but still emits every doc's verdict
    val zb = TextOps.tokenBudgetSelect(one, "doc_id", "text", 0L).collect()
    assert(zb.length === 1 && zb.head.getLong(4) === 0L)
  }

  test("round-12 basket ops on empty and degenerate inputs") {
    val emptyFacts = df(Seq.empty[Kv7g]).select(col("k").as("b"), col("v").as("i"))
    assert(Relational.basketTriples(emptyFacts, "b", "i").count() === 0)
    assert(Relational.frequentTriples(emptyFacts, "b", "i", 5).count() === 0)
    // pair-only baskets produce zero triples, not an error
    val pairsOnly = df(Seq(Kv7g(1L, 10L), Kv7g(1L, 20L)))
      .select(col("k").as("b"), col("v").as("i"))
    assert(Relational.basketTriples(pairsOnly, "b", "i").count() === 0)
    // empty delta merge is the identity; empty base adopts the delta
    val basePairs = Relational.basketPairs(pairsOnly, "b", "i")
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
    val mergedId = Relational.mergeBasketPairSupports(
      basePairs, pairsOnly, emptyFacts, "b", "i")
    assert(mergedId.collect().toSeq === basePairs.collect().toSeq)
    val emptyPairs = basePairs.where(lit(false))
    val adopted = Relational.mergeBasketPairSupports(
      emptyPairs, emptyFacts, pairsOnly, "b", "i")
    assert(adopted.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((10L, 20L, 1L)))
    // assocRules on an empty pair table emits no rules
    val emptyItems = df(Seq.empty[Kv7g]).select(col("k").as("item"),
      col("v").as("basket_cnt"), lit(0L).as("n_baskets"))
    assert(Relational.assocRules(emptyPairs, emptyItems, 5).count() === 0)
  }

  test("profiling on empty frame reports zero rows per column") {
    val p = Profiling.profile(emptyBars.toDF(), Seq("isin", "price")).collect()
    assert(p.length === 2)
    p.foreach { r =>
      assert(r.getAs[Long]("n_rows") === 0L)
      assert(r.getAs[Long]("n_distinct") === 0L)
    }
  }

  test("round-12 third-wave operators on empty inputs") {
    val emptyEvents = df(Seq.empty[Ev12]).select(col("user_id"), col("event_id"),
      col("ts"), col("event_type"), col("value"))
    val emptyNames = df(Seq.empty[Nm12])
    assert(Linkage.editDistSelfJoin(emptyNames, "id", "name", tau = 2).count() === 0)
    assert(EventOps.burstiness(emptyEvents, "user_id", "ts", "event_id").count() === 0)
    assert(EventOps.rfmSegments(emptyEvents, "user_id", "ts", "value").count() === 0)
    assert(EventOps.touchAttribution(emptyEvents, "user_id", "ts", "event_id",
      "event_type", "purchase").count() === 0)
    assert(Profiling.benfordProfile(emptyEvents, col("value")).count() === 0)
    assert(Profiling.quantileNormalize(emptyEvents, "event_id", "event_type",
      "value").count() === 0)
    assert(Profiling.hllOverlap(emptyEvents, "event_type", "user_id").count() === 0)
    val srcDocs = emptyDocs.withColumn("source", lit("x"))
    assert(TextOps.simpsonDiversity(srcDocs, "source", "text").count() === 0)
    assert(TextOps.giniConcentration(emptyDocs, "text").count() === 1,
      "gini emits its single summary row (null-valued) even on empty input")
    assert(TextOps.zipfSlope(emptyDocs, "text", 10).count() === 1)
    assert(TextOps.domainTokenMI(srcDocs, "source", "text").count() === 1)
    assert(TextOps.domainVocabOverlap(srcDocs, "source", "text").count() === 0)
    val emptyEdges = df(Seq.empty[Ed12])
    assert(Graph.clusteringCoefficients(emptyEdges, "a", "b").count() === 0)
    assert(Graph.degreeAssortativity(emptyEdges, "a", "b").count() === 1,
      "assortativity is a one-row scalar frame; NULL value on no edges")
  }

  test("round-15 operators on empty inputs") {
    val emptyRanked = df(Seq.empty[Rk15])
    val emptyRels = df(Seq.empty[Rl15])
    val m = Relational.retrievalMetrics(emptyRanked, emptyRels, "doc_id", "rank", 5)
      .collect()
    assert(m.length === 1, "metrics are a one-row scalar frame even on empty input")
    assert(m.head.getLong(1) === 0L && m.head.isNullAt(2))
    val emptyPts = df(Seq.empty[Pt15])
    assert(Relational.skyline2D(emptyPts, "source", "x", "y").count() === 0)
    val emptySeries = df(Seq.empty[AcfRow])
    assert(TimeSeries.acf(emptySeries, "user_id", "event_id", "value", 3).count() === 0)
    val emptyAffil = df(Seq.empty[Affil])
    assert(Graph.adamicAdarBipartite(emptyAffil, "cust", "supp", 10).count() === 0)
    val emptyVecs = df(Seq.empty[LVec])
    assert(VectorOps.hardNegatives(emptyVecs, emptyVecs,
      "vec_id", "embedding", "label", 5).count() === 0)
    assert(Graph.deterministicWalks(emptyAffil, "cust", "supp",
      df(Seq.empty[SeedId15]), "id", 3).count() === 0)
    assert(TextOps.negativeSamplingTable(emptyDocs, "text", 10).count() === 0)
    assert(VectorOps.mmrSelect(emptyVecs, emptyVecs,
      "vec_id", "embedding", 5, 0.7, 50).count() === 0)
    val langDocs = emptyDocs.withColumn("lang", lit("en"))
    assert(TextOps.naiveBayesConfusion(langDocs, "lang", "text", "doc_id").count() === 0)
    val noChunks = TextOps.cdcChunks(emptyDocs, "doc_id", "text")
    assert(noChunks.count() === 0)
    assert(TextOps.cdcDupStats(noChunks, "doc_id").count() === 0)
  }

  test("round-15 second-wave operators on empty inputs") {
    val emptyScored = df(Seq.empty[ScoredDoc])
    assert(Profiling.rocAuc(emptyScored, "source", col("score"), col("pos")).count() === 0)
    val emptyBins = df(Seq.empty[BinVal])
    assert(Profiling.psiReport(emptyBins, col("ref"), col("n_chars")).count() === 0)
    val emptyKs = df(Seq.empty[KsRow])
    assert(Profiling.ksByGroup(emptyKs, "g", col("v")).count() === 0)
    val emptyEdges = df(Seq.empty[ModEdge])
    val emptyLabels = df(Seq.empty[ModLabel])
    assert(Graph.modularity(emptyEdges, "a", "b", emptyLabels, "id", "c").count() === 0)
    assert(Graph.kTruss(emptyEdges, "a", "b", k = 4).count() === 0)
    val emptyMk = df(Seq.empty[MkRow])
    assert(TimeSeries.mannKendall(emptyMk, "user_id", "event_id", "value").count() === 0)
    assert(TimeSeries.senSlope(emptyMk, "user_id", "event_id", "value").count() === 0)
    assert(TimeSeries.holt(emptyMk, "user_id", "event_id", "value", 0.5, 0.25).count() === 0)
    assert(Profiling.calibrationReport(
      df(Seq.empty[ScoredDoc]), col("score"), col("pos"), 10).count() === 0)
    assert(VectorOps.clusterSilhouette(df(Seq.empty[LVec]), "vec_id", "embedding",
      Array(Array(1f, 0f), Array(0f, 1f))).count() === 0)
    assert(Profiling.spearman(df(Seq.empty[BinVal]).withColumnRenamed("doc_id", "g"),
      "g", col("n_chars"), col("ref")).count() === 0)
    assert(Profiling.chiSquare(
      df(Seq.empty[KsRow]).toDF("a", "b"), "a", "b").count() === 0)
    assert(TimeSeries.cusum(df(Seq.empty[MkRow]), "user_id", "event_id", "value")
      .count() === 0)
    assert(EventOps.sequencePatterns(df(Seq.empty[SeqEv]), "user_id", "event_id",
      "event_type", 10).count() === 0)
    assert(EventOps.markovEntropyRate(df(Seq.empty[MkTypedEv]), "user_id", "ts",
      "event_id", "event_type").count() === 0)
    // one-row scalar frames come back with NULL stats, never throw
    val kEmpty = Profiling.cohensKappa(df(Seq.empty[ConfCell]), "t", "p", "n").collect()
    assert(kEmpty.length === 1 && kEmpty.head.isNullAt(0))
    val eEmpty = Profiling.labelEntropies(
      df(Seq.empty[KsRow]).toDF("a", "b"), "a", "b").collect()
    assert(eEmpty.length === 1 && eEmpty.head.getLong(0) === 0L)
    val bEmpty = Profiling.blockBootstrapSe(df(Seq.empty[BinVal]),
      col("doc_id"), col("n_chars"), 8).count()
    assert(bEmpty === 0L)
    assert(Profiling.thresholdPick(df(Seq.empty[GainsRow]), "g", col("score"),
      col("pos"), 3, 4).count() === 0)
    assert(Profiling.classificationReport(df(Seq.empty[ConfCell]), "t", "p", "n")
      .count() === 0)
    val dEmpty = VectorOps.embeddingDrift(df(Seq.empty[LVec]), col("label") === 1,
      "embedding").collect()
    assert(dEmpty.length === 1 && dEmpty.head.isNullAt(0),
      "drift is a one-row scalar frame with NULL stats on empty input")
    assert(TextOps.nbLabelSuspects(df(Seq.empty[LDoc]), "lang", "text",
      "doc_id", 10).count() === 0)
    assert(Profiling.gainsTable(df(Seq.empty[GainsRow]), "g", col("score"),
      col("pos"), col("doc_id"), 10).count() === 0)
  }

  test("round-16 operators on empty inputs") {
    val emptyCohort = df(Seq.empty[CohortVal])
    assert(Profiling.welchTTest(emptyCohort, "source", col("train"), col("v"))
      .count() === 0)
    val emptyKmv = df(Seq.empty[KmvRow])
    assert(Profiling.kmvDistinct(emptyKmv, "lang", col("token"), 16).count() === 0)
    assert(Profiling.kmvMergeProof(emptyKmv, "lang", col("token"), 16)
      .count() === 0, "merge proof degrades to an empty frame")
    val emptyGrow = df(Seq.empty[GrowDoc])
    assert(TextOps.heapsLaw(emptyGrow, "doc_id", "text").head.getLong(0) === 0L)
    assert(TextOps.spanCorrupt(emptyGrow, "doc_id", "text").count() === 0)
    assert(TextOps.mattr(emptyGrow, "doc_id", "text", 25).count() === 0)
    assert(TextOps.fimSplit(emptyGrow, "doc_id", "text").count() === 0)
    val emptyDay = df(Seq.empty[DayVal])
    assert(TimeSeries.seasonalDecompose(emptyDay, "k", "ts", "v", 7).count() === 0)
    assert(Profiling.fdViolations(df(Seq.empty[FdRow]), Seq("a" -> "b"))
      .head.getLong(2) === 0L) // zero groups, never a throw
    val f2 = Profiling.amsF2(df(Seq.empty[KeyRow]), col("k")).collect()
    assert(f2.length === 1 && f2.head.isNullAt(3), "NULL estimate, no throw")
    val emptyVecs = df(Seq.empty[VecRow])
    assert(VectorOps.jlDistortion(emptyVecs, "vec_id", "embedding", 8, 4, 10)
      .count() === 0)
    assert(VectorOps.int8Recall(emptyVecs, "vec_id", "embedding", 5, 10)
      .count() === 0)
    val emptyEv = df(Seq.empty[TyEv])
    assert(EventOps.multiTouchAttribution(emptyEv, "user_id", "ts",
      "event_id", "event_type", "purchase").count() === 0)
    assert(EventOps.kaplanMeier(emptyEv, "user_id", "ts", 5, 1).count() === 0)
    assert(Profiling.weightedMedian(df(Seq.empty[WRow]), "g", col("v"), col("w"))
      .count() === 0)
    val ka = Profiling.kAnonymity(df(Seq.empty[QiRow]), Seq("qa", "qb"),
      col("s"), 3).collect()
    assert(ka.length === 1 && ka.head.getLong(1) === 0L)
  }

  test("round-16b operators on empty inputs") {
    val emptySeries = df(Seq.empty[Series16])
    assert(TimeSeries.macd(emptySeries, "key", "t", "v").count() === 0)
    assert(TimeSeries.rsi(emptySeries, "key", "t", "v").count() === 0)
    assert(TimeSeries.bollinger(emptySeries, "key", "t", "v").count() === 0)
    val emptyDocs16 = df(Seq.empty[Doc16])
    assert(TextOps.tfidfCosineTopK(emptyDocs16, "doc_id", "text",
      lit(true), 5, 100).count() === 0)
    val emptyTsU = df(Seq.empty[TsUser16])
    assert(Profiling.kmvSlidingDistinct(emptyTsU, "ts", col("user_id")).count() === 0)
    val emptyPairs = df(Seq.empty[Pair16])
    val emptyItems = df(Seq.empty[Item16])
    assert(Relational.itemNeighbors(emptyPairs, "support",
      emptyItems, "item", "basket_cnt", 3).count() === 0)
    val emptyCohort16 = df(Seq.empty[Cohort16])
    assert(Profiling.mannWhitneyU(emptyCohort16, "grp", col("in1"), col("v"))
      .count() === 0)
    assert(Profiling.oddsRatio2x2(df(Seq.empty[TwoByTwo16]), "grp",
      col("e"), col("o")).count() === 0)
    assert(Profiling.noisyCounts(df(Seq.empty[Doc16]).withColumnRenamed("text", "lang"),
      "lang", 0.5, "s").count() === 0)
    assert(TimeSeries.holtWinters(df(Seq.empty[Series16]), "key", "t", "v",
      7, 0.5, 0.25, 0.25).count() === 0)
    assert(EventOps.decayedLeaderboard(df(Seq.empty[TsUser16])
      .withColumnRenamed("user_id", "k2"), "ts", "k2", 10).count() === 0)
    val noVals = df(Seq.empty[Doc16]).withColumnRenamed("text", "v")
    // empty members: zero bits set, every probe a clean miss
    val bloom = Profiling.bloomFprAudit(noVals,
      df(Seq(Doc16(1L, "p"))).withColumnRenamed("text", "v"), col("v"), 64L, 3).head()
    assert(bloom.getLong(3) === 0L && bloom.getLong(6) === 0L)
    assert(Graph.harmonicCentrality(df(Seq.empty[Pair16])
      .select(col("item_a").as("a"), col("item_b").as("b")), "a", "b").count() === 0)
    assert(Graph.truncatedBetweenness(df(Seq.empty[Pair16])
      .select(col("item_a").as("a"), col("item_b").as("b")), "a", "b").count() === 0)
    assert(TimeSeries.binSegChangepoint(df(Seq.empty[Series16]), "key", "t", "v")
      .count() === 0)
    assert(Profiling.qqDrift(df(Seq.empty[Cohort16]), col("in1"), col("v"),
      Seq(0.5)).count() === 0)
    assert(Profiling.kmvJaccard(df(Seq.empty[KmvRow]), "lang", col("token"), 16)
      .count() === 0)
    assert(TimeSeries.crossCorrelation(df(Seq.empty[TyEv]), "ts", "event_type",
      "user_id", "a", "b", 2).where(col("n_days") > 0).count() === 0)
    assert(TimeSeries.forecastAccuracy(df(Seq.empty[Series16]), "key", "t", "v",
      0.5, 0.25).count() === 0)
    assert(Profiling.lorenzCurve(df(Seq.empty[Series16]), col("v"), 10)
      .where(col("value_share").isNotNull).count() === 0)
  }

  test("round-17 operators on empty inputs") {
    val emptyEv = df(Seq.empty[R17Ev])
    // cuped: one summary row, n_units = 0, every statistic NULL
    val cu = Profiling.cuped(emptyEv, "user_id", "ts", col("value"), 16).head()
    assert(cu.getLong(0) === 0L && cu.isNullAt(1) && cu.isNullAt(2) &&
      cu.isNullAt(3) && cu.isNullAt(4))
    // hashUniformity: the full bucket catalog survives, n = 0, NULL chi2
    val hu = Profiling.hashUniformity(df(Seq.empty[R17Key]), col("k"), 16, 24.996).head()
    assert(hu.getLong(0) === 0L && hu.getLong(1) === 16L &&
      hu.getLong(2) === 0L && hu.getLong(3) === 0L && hu.isNullAt(4) && hu.isNullAt(5))
    // gumbelTail: one row per requested period, zero blocks, NULL fit
    val gt = Profiling.gumbelTail(emptyEv, "ts", col("value"), Seq(10, 100)).collect()
    assert(gt.length === 2 && gt.forall(r =>
      r.getLong(1) === 0L && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)))
    // jsDivergence: no labels -> no pairs
    assert(TextOps.jsDivergence(df(Seq.empty[R17Cnt]), "lab", "tok", "c")
      .count() === 0)
    // permutationTest: one summary row of NULL statistics
    val pt = Profiling.permutationTest(emptyEv, "user_id", col("value"), 8).head()
    assert(pt.getLong(0) === 0L && pt.isNullAt(3) && pt.isNullAt(4) && pt.isNullAt(5))
    // jamesStein: no groups, no rows
    assert(Profiling.jamesStein(df(Seq.empty[R17Cnt]), "lab", col("c")).count() === 0)
    // conformalInterval: one summary row, zero counts, NULL band
    val ci = Profiling.conformalInterval(df(Seq.empty[R17Ev2]), "user_id",
      "event_id", "ts", col("value"), 16, 0.1).head()
    assert(ci.getLong(0) === 0L && ci.getLong(1) === 0L &&
      ci.isNullAt(2) && ci.isNullAt(3))
    // chao1: one row, zero types, NULL-propagated estimator
    val ch = TextOps.chao1(df(Seq.empty[R17Cnt]), col("c")).head()
    assert(ch.getLong(0) === 0L && ch.isNullAt(1) && ch.isNullAt(4) && ch.isNullAt(5))
    // bradleyTerry: no comparisons, no players
    assert(Relational.bradleyTerry(df(Seq.empty[R17Comp]), "winner", "loser", 3)
      .count() === 0)
    // clusterNmi: one row, zero rows counted, NULL statistics
    val nm = Profiling.clusterNmi(df(Seq.empty[R17Pair]), col("a"), col("b")).head()
    assert(nm.getLong(0) === 0L && nm.isNullAt(1) && nm.isNullAt(3) && nm.isNullAt(4))
    // hillTail: one row, zero observations, NULL threshold and index
    val ht = Profiling.hillTail(df(Seq.empty[R17Key]), col("k"), 5).head()
    assert(ht.getLong(0) === 0L && ht.isNullAt(2) && ht.isNullAt(3))
    // jackknifeInfluence: no groups, no rows
    assert(Profiling.jackknifeInfluence(df(Seq.empty[R17Cnt]), "lab", col("c"))
      .count() === 0)
    // simpsonsParadox / sprt: no groups / no days, no rows
    assert(Profiling.simpsonsParadox(df(Seq.empty[R17Xy]), "g", col("x"), col("y"))
      .count() === 0)
    assert(EventOps.sprt(df(Seq.empty[R17Hit]), "ts", col("et") === "purchase",
      0.2, 0.8, 0.05, 0.05).count() === 0)
  }

  test("round-18 operators on empty inputs") {
    val emptyEv = df(Seq.empty[R18Ev])
    // eProcess: no days, no rows
    assert(EventOps.eProcess(emptyEv, "ts", col("event_type") === "hit",
      0.2, 0.8, 0.05).count() === 0)
    // stratified permutation: one summary row of NULL statistics
    val ps = Profiling.permutationTestStratified(emptyEv, "user_id",
      col("value"), 8).head()
    assert(ps.getLong(0) === 0L && ps.isNullAt(4) && ps.isNullAt(5) && ps.isNullAt(6))
    // kendallTau: no days, no series rows
    assert(Profiling.kendallTau(emptyEv, "event_type", "ts", col("value"))
      .count() === 0)
    // kruskalWallis: one row, zero groups, NULL H
    val kw = Profiling.kruskalWallis(df(Seq.empty[R18Gv]), "g", col("v")).head()
    assert(kw.getLong(1) === 0L && kw.isNullAt(3) && kw.isNullAt(4))
    // cochranArmitage: one row, zero days, NULL statistics
    val ca = Profiling.cochranArmitage(emptyEv, "ts",
      col("event_type") === "hit").head()
    assert(ca.getLong(0) === 0L && ca.isNullAt(4))
    // mantelHaenszel: one row, zero strata, NULL OR
    val mh = Profiling.mantelHaenszel(df(Seq.empty[R18Cell]), col("s"),
      col("expo"), col("hit")).head()
    assert(mh.getLong(0) === 0L && mh.isNullAt(4))
    // langIdTrigram: no docs, no confusion rows
    assert(TextOps.langIdTrigram(df(Seq.empty[R18Doc]), "doc_id", "lang",
      "text", 8).count() === 0)
    // bhAdjust / per-group permutation / cvm / friedman: empty groups,
    // empty or NULL-statistic outputs — never a throw
    assert(Profiling.bhAdjust(df(Seq.empty[BhP]), "g", "p", 0.1).count() === 0)
    assert(Profiling.permutationTestPerGroup(emptyEv, "event_type", "user_id",
      col("value"), 4).count() === 0)
    assert(Profiling.cvmDrift(emptyEv, "event_type", "user_id", col("value"))
      .count() === 0)
    val fr = Profiling.friedman(emptyEv, "ts", "event_type", col("value")).head()
    assert(fr.getLong(0) === 0L && fr.isNullAt(3))
    // mcnemar: one row of zero cells, NULL chi2
    val mc = Profiling.mcnemar(emptyEv, "user_id", "ts",
      col("event_type") === "purchase", 16).head()
    assert(mc.getLong(0) === 0L && mc.isNullAt(5))
  }

  test("round-18b operators on empty inputs") {
    // anovaF: one row, zero groups, NULL sums and statistics
    val av = Profiling.anovaF(df(Seq.empty[R18bGv]), "g", col("v")).head()
    assert(av.getLong(0) === 0L && av.isNullAt(6) && av.isNullAt(7))
    // brownForsythe: no groups, no rows
    assert(Profiling.brownForsythe(df(Seq.empty[R18bGv]), "g", col("v"))
      .count() === 0)
    // mdePower: one row of NULL cohort counts and statistics
    val md = EventOps.mdePower(df(Seq.empty[R18bUv]), "u",
      u => pmod(u, lit(2L)) === 0, col("v")).head()
    assert(md.isNullAt(0) && md.isNullAt(4) && md.isNullAt(6))
    // logRank: one row, NULL O/E/V/z
    val lr = EventOps.logRank(df(Seq.empty[R18bOrd]), "o_custkey",
      "o_orderdate", u => pmod(u, lit(2L)) === 0, 0, 1).head()
    assert(lr.isNullAt(2) && lr.isNullAt(5))
    // nelsonAalen: no lifetimes, no rows
    assert(EventOps.nelsonAalen(df(Seq.empty[R18bOrd]), "o_custkey",
      "o_orderdate", 0, 1).count() === 0)
    // theilIndex / fanoDispersion / decisionStump: no groups, no rows
    assert(Profiling.theilIndex(df(Seq.empty[R18bGv]), "g", col("v"))
      .count() === 0)
    assert(TimeSeries.fanoDispersion(df(Seq.empty[R18Ev]), "event_type",
      "ts", 5.0).count() === 0)
    assert(Profiling.decisionStump(df(Seq.empty[R18cSy]), col("s"), col("y"))
      .count() === 0)
    // brierDecomposition: one row of NULL statistics
    val br = Profiling.brierDecomposition(df(Seq.empty[R18cSy]),
      col("s"), col("y"), 10).head()
    assert(br.getLong(0) === 0L && br.isNullAt(2) && br.isNullAt(6))
    // posthoc / readability: no groups, no rows
    assert(Profiling.posthocPairwise(df(Seq.empty[R18cGv]), "g", col("v"), 1.0)
      .count() === 0)
    assert(TextOps.readability(df(Seq.empty[R18eDoc]), "source", col("text"))
      .count() === 0)
    // hhi: one row of NULL k/HHI
    val hh = Profiling.hhiConcentration(df(Seq.empty[R18cGv]), "g", col("v")).head()
    assert(hh.isNullAt(1) && hh.isNullAt(2))
    // packingAudit: one row per context of zero docs and NULL ratios
    val pk = TextOps.packingAudit(df(Seq.empty[R18fDoc]), "doc_id",
      col("text"), Seq(4)).head()
    assert(pk.getLong(1) === 0L && pk.isNullAt(5))
    // rboProjection / covariateBalance: no probes / no units, no rows
    assert(VectorOps.rboProjection(df(Seq.empty[Vec]), "vec_id", "embedding",
      64, 16, 20, 10).count() === 0)
    assert(EventOps.covariateBalance(df(Seq.empty[R18fEv]), "user_id",
      u => pmod(u, lit(2L)) === 0,
      Seq("n_events" -> count(lit(1)))).count() === 0)
    // dunn / cliffsDelta: no groups, no rows
    assert(Profiling.dunnPosthoc(df(Seq.empty[R18cGv]), "g", col("v"), 1.0)
      .count() === 0)
    assert(Profiling.cliffsDelta(df(Seq.empty[R18gSv]), "g", col("in1"), col("v"))
      .count() === 0)
    // cochranQ: one row, zero treatments, NULL Q
    val cq = EventOps.cochranQ(df(Seq.empty[R18gUt]), "user_id", "event_type").head()
    assert(cq.getLong(1) === 0L && cq.isNullAt(3))
    // secondMomentDrift: one row of NULL moments (empty cell join)
    val md0 = VectorOps.secondMomentDrift(df(Seq.empty[Vec]),
      pmod(col("vec_id"), lit(2L)) === 0, "embedding").head()
    assert(md0.isNullAt(4) && md0.isNullAt(5))
    // sourceCentroidSimilarity: no sources, no pairs
    assert(VectorOps.sourceCentroidSimilarity(df(Seq.empty[Vec]),
      df(Seq.empty[R18hDoc]), "vec_id", "embedding", "doc_id", "source")
      .count() === 0)
  }

  test("r20 ops on empty inputs") {
    val emptyLab = df(Seq.empty[Lab20])
    // logistic regression: no docs, no buckets, no model — empty read-out
    assert(Classify.logisticRegression(df(Seq.empty[Doc16]), "doc_id",
      "text", lit(true)).count() === 0)
    // html extraction / url filter: empty corpus, empty report
    assert(TextOps.htmlExtract(df(Seq.empty[Doc16]), "doc_id", "text")
      .count() === 0)
    assert(TextOps.urlCategoryFilter(df(Seq.empty[Doc16]), "doc_id", "text",
      Seq("example.com" -> "ads")).count() === 0)
    // calibration pair: no scores, no groups
    assert(Profiling.isotonicCalibration(emptyLab, "grp", col("score"),
      col("y") === 1).count() === 0)
    assert(Profiling.isotonicFit(emptyLab, "grp", col("score"),
      col("y") === 1).count() === 0)
    assert(Profiling.plattScaling(emptyLab, "grp", col("score"),
      col("y") === 1).count() === 0)
    // two-covariate Cox: the one-row read-out degrades to the frozen
    // θ = 1 / NULL-se shape (the coxPh zero-event convention)
    val cm = EventOps.coxPhMulti(df(Seq.empty[Ord20]), "o_custkey",
      "o_orderdate", u => pmod(u, lit(2L)) === 0,
      df(Seq.empty[Seg20]), "custkey", "seg", v => v === "H",
      censorDays = 0, unitDays = 1).head()
    assert(cm.getLong(3) === 0L, "no events")
    assert(cm.getDouble(4) === 1.0 && cm.getDouble(8) === 1.0,
      "both hazard ratios frozen at the seed")
    assert(cm.isNullAt(6) && cm.isNullAt(10), "se NULL at zero information")
  }
}

case class Lab20(grp: String, score: Double, y: Long)
case class Seg20(custkey: Long, seg: String)
case class Ord20(o_custkey: Long, o_orderdate: java.sql.Date)

case class Series16(key: String, t: Long, v: Double)
case class Doc16(doc_id: Long, text: String)
case class TsUser16(ts: java.sql.Timestamp, user_id: Long)
case class Pair16(item_a: Long, item_b: Long, support: Long)
case class Item16(item: Long, basket_cnt: Long)
case class Cohort16(grp: String, in1: Boolean, v: Double)
case class TwoByTwo16(grp: String, e: Boolean, o: Boolean)

case class Rk15(doc_id: String, rank: Long)
case class Rl15(doc_id: String)
case class Pt15(doc_id: Long, source: String, x: Long, y: Long)

case class Ev12(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                event_type: String, value: Double)
case class Nm12(id: Long, name: String)
case class Ed12(a: Long, b: Long)
