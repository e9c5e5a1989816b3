package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Standing scale-safety invariants over every declared query's physical
  * plan: no Cartesian products (the one scale-killer VERDICT.md round 1
  * warned about — similarity/near-dup joins must go through buckets or
  * bounded broadcasts, never all-pairs).
  */
class PlanInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // descends through AQE wrappers (AdaptiveSparkPlanExec / query stages) —
  // without this the invariants only ever saw the adaptive root node.
  // Shared with the bench artifact's shuffle audit (r17): one flattener,
  // so the test-time and bench-time counts can never disagree.
  private def flatten(p: SparkPlan): Seq[SparkPlan] = graft.plans.PlanAudit.flatten(p)

  test("no declared query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      if (flatten(plan).exists(_.isInstanceOf[CartesianProductExec])) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("star-join queries broadcast their dimension sides (no shuffled dim join)") {
    // the 100 TB plan contract for q_join_star / q_join_q5: every
    // dimension join is a BroadcastHashJoin; only fact×fact joins and the
    // aggregation may shuffle
    Seq("q_join_star" -> 1, "q_join_q5" -> 2).foreach { case (name, minBroadcasts) =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      val nodes = flatten(plan)
      val nBroadcast = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
      withClue(s"$name: ") {
        assert(nBroadcast >= minBroadcasts,
          s"expected >= $minBroadcasts broadcast joins, saw $nBroadcast")
      }
    }
  }

  test("documents scans prune to exactly the needed columns") {
    // regression guard for column pruning reaching the parquet reader: a
    // text query that drags the unused `lang`/`source` columns through its
    // scan would multiply 100 TB scan volume for nothing
    // (q_pipeline_prep is excluded: its documents scan runs inside the
    // eager dedup-stage checkpoint, so the returned plan reads the
    // materialized RDD, not parquet)
    val pruned = Seq(
      "q_text_tokens" -> Set("doc_id", "text"),
      "q_wordcount" -> Set("doc_id", "text"),
      "q_dedup_exact" -> Set("doc_id", "text"),
      "q_simhash" -> Set("doc_id", "text"),
      "q_contamination" -> Set("doc_id", "text"),
      // r12 distribution diagnostics: token-only queries must not drag
      // doc_id/lang/n_chars through the scan; domain queries add source
      "q_gini" -> Set("text"),
      "q_zipf_slope" -> Set("text"),
      "q_simpson" -> Set("source", "text"),
      "q_domain_mi" -> Set("source", "text"),
      "q_domain_overlap" -> Set("source", "text"))
    pruned.foreach { case (name, allowed) =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      val scans = flatten(plan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.inputFiles.exists(_.contains("documents")) => s
      }
      assert(scans.nonEmpty, s"$name: no documents scan found")
      scans.foreach { s =>
        val read = s.requiredSchema.fieldNames.toSet
        withClue(s"$name reads ${read.mkString(",")}: ") {
          assert(read.subsetOf(allowed))
        }
      }
    }
  }

  test("hot-path queries keep a WholeStageCodegen span") {
    // regression guard against accidentally dropping the hot path out of
    // codegen (e.g. introducing a CodegenFallback expression into the
    // scan→agg pipeline)
    val hot = Seq("q_scan", "q_groupby_agg", "q_cosine_topk_native", "q_simhash", "q_wordcount")
    hot.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // AQE only applies codegen as stages materialize — run first
      val hasSpan = flatten(df.queryExecution.executedPlan)
        .exists(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
      withClue(s"$name: ")(assert(hasSpan, "expected a WholeStageCodegen span"))
    }
  }

  test("twice-referenced aggregates execute their shared exchange once (ReusedExchange)") {
    // the Q15/Q11 contract: the revenue view consumed by both the
    // threshold branch and the filter branch must share one physical
    // exchange — a second FileSourceScan of the fact table would double
    // the 100 TB scan cost the comments claim to avoid
    Seq("q_max_of_agg", "q_scalar_subquery").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // AQE finalizes reuse as stages materialize
      val nodes = flatten(df.queryExecution.executedPlan)
      val reused = nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec])
      val factScans = nodes.count {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.exists(_.contains("lineitem"))
        case _ => false
      }
      withClue(s"$name (reused=$reused, lineitem scans=$factScans): ") {
        assert(reused || factScans <= 1,
          "expected a ReusedExchange or a single fact scan")
      }
    }
  }

  test("q_join_bucketed joins and aggregates with zero hash-shuffle exchanges") {
    // the co-located-join contract: with both tables bucketed on the join
    // key, the join AND the per-key aggregation need no hash repartition —
    // the only exchange in the whole plan is the final ORDER BY's range
    // partitioning. Broadcast is disabled so the invariant can't pass
    // trivially via a broadcast join at this tiny scale factor.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q_join_bucketed")(spark, sfDir)
      df.collect() // materialize so AQE settles the final stages
      val hashShuffles = flatten(df.queryExecution.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
      }
      assert(hashShuffles.isEmpty,
        s"expected zero hash shuffles, saw ${hashShuffles.size}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_disjunctive pushes per-side OR-factored predicates into both parquet scans") {
    // the Q19 contract: Catalyst extracts the quantity disjunction for the
    // lineitem scan and the brand∧size disjunction for the part scan — a
    // plan that evaluates the OR only post-join reads both tables in full
    val plan = SparkEntry.queries("q_disjunctive")(spark, sfDir)
      .queryExecution.executedPlan
    val scans = flatten(plan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        (s.relation.location.inputFiles.headOption.getOrElse(""),
          s.metadata.getOrElse("PushedFilters", ""))
    }
    val li = scans.find(_._1.contains("lineitem")).map(_._2).getOrElse("")
    val pt = scans.find(_._1.contains("part")).map(_._2).getOrElse("")
    withClue(s"lineitem=[$li] part=[$pt]: ") {
      assert(li.contains("Or(") && li.contains("l_quantity"),
        "lineitem scan missing the pushed quantity disjunction")
      assert(pt.contains("Or(") && pt.contains("p_brand") && pt.contains("p_size"),
        "part scan missing the pushed brand/size disjunction")
    }
  }

  test("q_ivf_topk's clustered scan is dynamically partition-pruned by the probe join") {
    // the r17 IvfClusterStore contract's runtime half: the layout test
    // (IvfClusterStoreSpec) proves cells are hive partitions; THIS pins
    // that the broadcast probe join actually injects a dynamic-pruning
    // subquery into the scan — i.e. un-probed cells' files are never
    // read, which is the entire point of storing an IVF corpus clustered
    val df = SparkEntry.queries("q_ivf_topk")(spark, sfDir)
    df.collect()
    val scans = flatten(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("graft_ivfcluster")) => s
    }
    assert(scans.nonEmpty, "expected a clustered-store scan")
    assert(scans.forall(_.partitionFilters.map(_.toString.toLowerCase)
        .exists(_.contains("dynamicpruning"))),
      "the probe restriction must reach the clustered scan as dynamic partition pruning")
  }

  test("q_triangles closes wedges via broadcast and ranks top-k without a global sort") {
    // the triangle contract at THIS scale: the edge list is far below the
    // broadcast threshold, so the size-switch (r16, VERDICT r15 item 2)
    // must pick the broadcast plan — the Θ(m^1.5)-worst-case wedge stream
    // probes a broadcast of the edge list — and the final rank must be a
    // TakeOrderedAndProject over per-node counts, not a one-partition
    // window over them
    val df = SparkEntry.queries("q_triangles")(spark, sfDir)
    df.collect() // AQE settles the final stages
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "expected the closing edge join to broadcast")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "expected TakeOrderedAndProject for the top-20 rank")
  }

  test("triangleCounts size-switch: an over-cap edge list shuffles the closing join") {
    // the 100×-scale half of the contract: when the closing side must
    // not broadcast (the auto cap is 128 MB of MEASURED rows for a
    // session on the default threshold, or the explicit threshold if the
    // session moved it — GB-scale edge lists exceed either; -1 disables
    // broadcast outright), the strategy falls back to a shuffled hash
    // join with identical results. -1 is the forcing mechanism here:
    // a spec-sized fixture cannot exceed the 128 MB floor, and the floor
    // itself exists because the r16 bench measured the 10 MB default
    // flipping sf0.1's 19 MB edge list to shuffle for a 1.7× slowdown.
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val big = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = graft.ops.Graph.triangleCounts(edges, "a", "b")
      val rows = d.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(rows === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
      d
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val bigNodes = flatten(big.queryExecution.executedPlan)
    assert(!bigNodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "over-threshold edge list must not broadcast the closing side")
    assert(bigNodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "expected the closing join to fall back to a shuffled hash join")
    // and the under-threshold auto pick still broadcasts (both plans, one fixture)
    val small = graft.ops.Graph.triangleCounts(edges, "a", "b")
    small.collect()
    assert(flatten(small.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "under-threshold edge list must broadcast the closing side")
    // a threshold the session EXPLICITLY lowered below the 128 MB default
    // cap is honored, not silently overridden back up (ADVICE r16): at a
    // 1-byte threshold even this 5-edge list must shuffle
    val lowered = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val d = graft.ops.Graph.triangleCounts(edges, "a", "b")
      d.collect()
      d
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(!flatten(lowered.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "an explicitly lowered threshold must be honored by the size switch")
  }

  test("round-8 queries keep their scale-plan contracts") {
    // q_quality_floor / q_tokenize_ids: the small side (per-domain floor
    // table / top-k vocab) must broadcast — the corpus never shuffles on
    // a join key for these
    Seq("q_quality_floor", "q_tokenize_ids").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      withClue(s"$name: ") {
        assert(nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
          "expected the bounded side to broadcast")
      }
    }
    // q_novelty reads the persisted shingle artifact, not a re-explode
    val nov = SparkEntry.queries("q_novelty")(spark, sfDir)
    assert(nov.queryExecution.executedPlan.toString.contains("graft_shingles_v2_n3"),
      "q_novelty must scan the ShingleStore artifact")
  }

  test("round-11 queries keep their scale-plan contracts") {
    // The co-occurrence support table comes off the write-once PairStore
    // artifact (late r11 — the basketPairs single fact scan is paid at
    // the artifact write): the per-run q_cooccur plan must scan the
    // committed pair parquet and must NOT touch the fact table at all.
    // q_triangles shares the artifact but materializes its edge list
    // through an eager localCheckpoint, which truncates its final plan
    // before the scan (parity proven in PairStoreSpec instead).
    Seq("q_cooccur").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val factScans = flatten(df.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.inputFiles.exists(_.contains("lineitem")) => s
      }
      withClue(s"$name: ") {
        assert(factScans.isEmpty,
          s"q_cooccur must read the pair artifact, found ${factScans.size} lineitem scans")
        assert(df.queryExecution.executedPlan.toString.contains("graft_pairs_v1"),
          "q_cooccur must scan the persisted pair artifact")
      }
    }
    // q_jaccard_prefix: verification must intersect per-doc arrays, not
    // re-join the exploded artifact (the candidate-sized-vs-corpus-sized
    // exchange distinction at scale); the only aggregate over the
    // artifact is the single doc-granularity fold + the candidate distinct
    val jp = SparkEntry.queries("q_jaccard_prefix")(spark, sfDir)
    jp.collect()
    val jpPlan = jp.queryExecution.executedPlan.toString
    assert(jpPlan.contains("array_intersect"),
      "q_jaccard_prefix must verify candidates via array_intersect")
    assert(jpPlan.contains("graft_shingles_v2_n3"),
      "q_jaccard_prefix must read the persisted shingle artifact")
  }

  test("clustering coefficient and assortativity ride the pair artifact, never the fact table") {
    // Both r12 graph diagnostics read the committed co-occurrence pair
    // parquet: assortativity's whole plan is artifact-fed; clustering's
    // degree branch scans the artifact while its triangle branch enters
    // as the kernel's eager localCheckpoint (LogicalRDD) — either way
    // lineitem must appear in NEITHER executed plan.
    Seq("q_clustering_coef", "q_assortativity").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val factScans = flatten(df.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.inputFiles.exists(_.contains("lineitem")) => s
      }
      withClue(s"$name: ") {
        assert(factScans.isEmpty,
          s"$name must read the pair artifact, found ${factScans.size} lineitem scans")
        assert(df.queryExecution.executedPlan.toString.contains("graft_pairs_v1"),
          s"$name must scan the persisted pair artifact")
      }
    }
  }

  test("round-14 queries keep their scale-plan contracts") {
    // q_label_prop: rides the pair artifact, never the fact table
    val lp = SparkEntry.queries("q_label_prop")(spark, sfDir)
    lp.collect()
    val lpFact = flatten(lp.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.inputFiles.exists(_.contains("lineitem")) => s
    }
    assert(lpFact.isEmpty, "q_label_prop must iterate off the pair artifact")

    // q_gopher_rules: row-local — no shuffle before the presentation
    // sort, and the documents scan prunes to exactly (doc_id, text)
    val gr = SparkEntry.queries("q_gopher_rules")(spark, sfDir)
    val grScan = flatten(gr.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(grScan.schema.fieldNames.sorted.toSeq === Seq("doc_id", "text"),
      s"gopher scan must prune to (doc_id, text), read ${grScan.schema.fieldNames.mkString(",")}")
    val grShuffles = flatten(gr.queryExecution.executedPlan).count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]
      case _ => false
    }
    assert(grShuffles === 0,
      "gopher rules are row-local; only the presentation range-sort may exchange")

    // q_ndcg: the judgment side enters the system join as a broadcast
    val nd = SparkEntry.queries("q_ndcg")(spark, sfDir)
    nd.collect()
    assert(flatten(nd.queryExecution.executedPlan).exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case _ => false
    }, "q_ndcg must broadcast the eval-set-sized judgment frame")
  }

  test("round-15 queries keep their scale-plan contracts") {
    def shuffles(p: SparkPlan) = flatten(p).count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]
      case _ => false
    }
    def hasBroadcastJoin(p: SparkPlan) = flatten(p).exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case _ => false
    }

    // q_skyline: both dominance windows ride ONE source-hash exchange
    // (hash(source) satisfies the (source, x) clustering of the tie
    // window), and the documents scan prunes to (doc_id, source, text)
    val sky = SparkEntry.queries("q_skyline")(spark, sfDir)
    sky.collect()
    val skyScan = flatten(sky.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(skyScan.schema.fieldNames.sorted.toSeq === Seq("doc_id", "source", "text"),
      s"skyline scan must prune to (doc_id, source, text), read ${skyScan.schema.fieldNames.mkString(",")}")
    assert(shuffles(sky.queryExecution.executedPlan) === 1,
      "skyline dominance is two windows on one group exchange")

    // q_acf: the lag fan is row-local; one user exchange serves both the
    // lag window and the (user, lag) moment aggregation
    val acf = SparkEntry.queries("q_acf")(spark, sfDir)
    acf.collect()
    assert(shuffles(acf.queryExecution.executedPlan) === 1,
      "acf must reuse the user-hash exchange for window and aggregate")

    // q_adamic_adar: iterates off the memoized repeat-trade edge frame,
    // never re-scanning the fact table at query time
    val aa = SparkEntry.queries("q_adamic_adar")(spark, sfDir)
    aa.collect()
    val aaFact = flatten(aa.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.inputFiles.exists(_.contains("lineitem")) => s
    }
    assert(aaFact.isEmpty, "q_adamic_adar must ride the memoized edge frame")

    // q_walks: the seed-sized frontier broadcasts into the pair-artifact
    // edge list each hop; the fact table is never re-scanned. Since r21
    // the per-step frontier is LAZILY checkpointed (the final union used
    // to re-execute the whole 1..t join chain per branch — measured 47 s
    // of summed task time vs 12 s with the cache), so the per-hop
    // broadcast joins live inside the checkpointed RDD lineage, not the
    // visible final plan: the plan contract is now "no fact scan and at
    // most the single union-side exchange" (the bench shuffle audit
    // pins 4 → 1); the frontier-broadcast shape is structural — the
    // join is constructed with an explicit broadcast() hint in
    // Graph.deterministicWalks.
    val wk = SparkEntry.queries("q_walks")(spark, sfDir)
    wk.collect()
    val wkNodes = flatten(wk.queryExecution.executedPlan)
    assert(wkNodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.inputFiles.exists(_.contains("lineitem")) => s
    }.isEmpty, "q_walks must ride the pair artifact")
    assert(shuffles(wk.queryExecution.executedPlan) <= 1,
      "q_walks final plan carries at most the union-side exchange")

    // q_retrieval_metrics / q_hard_negatives: the bounded side broadcasts
    val rm = SparkEntry.queries("q_retrieval_metrics")(spark, sfDir)
    rm.collect()
    assert(hasBroadcastJoin(rm.queryExecution.executedPlan),
      "q_retrieval_metrics must broadcast the judgment set")
    val hn = SparkEntry.queries("q_hard_negatives")(spark, sfDir)
    hn.collect()
    assert(hasBroadcastJoin(hn.queryExecution.executedPlan),
      "q_hard_negatives must broadcast the probe set")
  }

  test("round-15 second-wave queries keep their scale-plan contracts") {
    def nonRangeShuffles(p: SparkPlan) = flatten(p).count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]
      case _ => false
    }
    def windowsAllKeyed(p: SparkPlan): Boolean = flatten(p).forall {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.nonEmpty
      case _ => true
    }
    def scanColumns(p: SparkPlan, table: String): Seq[Set[String]] =
      flatten(p).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.inputFiles.exists(_.contains(table)) =>
          s.schema.fieldNames.toSet
      }

    // q_auc: ONE hash exchange on source serves the distinct-score agg,
    // the rank window, and the per-source rollup (the presentation sort
    // is the only other exchange); no partition-less window; the scan
    // prunes to the three used columns
    val auc = SparkEntry.queries("q_auc")(spark, sfDir)
    auc.collect()
    val aucPlan = auc.queryExecution.executedPlan
    assert(nonRangeShuffles(aucPlan) === 1,
      "q_auc must ride one source-hash exchange end to end")
    assert(windowsAllKeyed(aucPlan), "q_auc rank window must be keyed")
    assert(scanColumns(aucPlan, "documents").forall(_ === Set("text", "lang", "source")),
      "q_auc scan must prune to (text, lang, source)")

    // q_ks_drift: both ECDF cumsums run inside the per-group window —
    // no global partition-less window; scans prune to source / n_chars
    val ks = SparkEntry.queries("q_ks_drift")(spark, sfDir)
    ks.collect()
    val ksPlan = ks.queryExecution.executedPlan
    assert(windowsAllKeyed(ksPlan), "q_ks_drift ECDF windows must be keyed")
    assert(scanColumns(ksPlan, "documents")
        .forall(_.subsetOf(Set("source", "n_chars"))),
      "q_ks_drift scans must prune to source/n_chars")

    // q_psi: bins collapse before anything crosses a shuffle; the scan
    // prunes to the split key + value
    val psi = SparkEntry.queries("q_psi")(spark, sfDir)
    psi.collect()
    assert(scanColumns(psi.queryExecution.executedPlan, "documents")
        .forall(_ === Set("doc_id", "n_chars")),
      "q_psi scan must prune to (doc_id, n_chars)")

    // q_modularity: rides the memoized SimHash pair relation — document
    // scans fetch only the (doc_id, lang) label columns, never text
    val mod = SparkEntry.queries("q_modularity")(spark, sfDir)
    mod.collect()
    assert(scanColumns(mod.queryExecution.executedPlan, "documents")
        .forall(_ === Set("doc_id", "lang")),
      "q_modularity must ride the memoized pair artifact (label-only doc scans)")

    // q_mann_kendall: the pair join is an equi-join on the series key
    // (no cartesian — globally asserted); scans prune to the three cols
    val mk = SparkEntry.queries("q_mann_kendall")(spark, sfDir)
    mk.collect()
    assert(scanColumns(mk.queryExecution.executedPlan, "events")
        .forall(_.subsetOf(Set("user_id", "event_id", "value"))),
      "q_mann_kendall scans must prune to (user_id, event_id, value)")

    // q_spearman: all four rank windows keyed on source, scan pruned
    val sp = SparkEntry.queries("q_spearman")(spark, sfDir)
    sp.collect()
    val spPlan = sp.queryExecution.executedPlan
    assert(windowsAllKeyed(spPlan), "q_spearman rank windows must be keyed")
    assert(scanColumns(spPlan, "documents")
        .forall(_ === Set("source", "n_chars", "text")),
      "q_spearman scan must prune to (source, n_chars, text)")

    // q_gains: tile + cumulative windows keyed on source
    val gn = SparkEntry.queries("q_gains")(spark, sfDir)
    gn.collect()
    assert(windowsAllKeyed(gn.queryExecution.executedPlan),
      "q_gains windows must be keyed")

    // q_holt / q_cusum: recurrence inputs prune to the three used cols
    for (name <- Seq("q_holt", "q_cusum")) {
      val r = SparkEntry.queries(name)(spark, sfDir)
      r.collect()
      assert(scanColumns(r.queryExecution.executedPlan, "events")
          .forall(_.subsetOf(Set("user_id", "event_id", "value"))),
        s"$name scans must prune to (user_id, event_id, value)")
    }

    // q_seq_patterns: top-k via TakeOrderedAndProject (never a global
    // sort), scan pruned to the three used columns
    val sq = SparkEntry.queries("q_seq_patterns")(spark, sfDir)
    sq.collect()
    val sqPlan = sq.queryExecution.executedPlan
    assert(flatten(sqPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "q_seq_patterns top-k must be TakeOrderedAndProject")
    assert(scanColumns(sqPlan, "events")
        .forall(_.subsetOf(Set("user_id", "event_id", "event_type"))),
      "q_seq_patterns scans must prune to (user_id, event_id, event_type)")
  }

  test("q_assoc_rules reads both PairStore artifacts and never the fact table") {
    // the association-rule contract (r12): confidence/lift are computed
    // from the committed pair-support and item-count artifacts alone —
    // the corpus-sized fact scan was paid at the artifact writes. The
    // 100-row rule side must BROADCAST into the catalog-sized item table
    // (the item catalog at corpus scale is not broadcastable; the top-k
    // rule set always is).
    val df = SparkEntry.queries("q_assoc_rules")(spark, sfDir)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    val factScans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.inputFiles.exists(_.contains("lineitem")) => s
    }
    assert(factScans.isEmpty,
      s"q_assoc_rules must read only the artifacts, found ${factScans.size} lineitem scans")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_pairs_v1"),
      "q_assoc_rules must scan the persisted pair artifact")
    assert(plan.contains("graft_items_v1"),
      "q_assoc_rules must scan the persisted item-count artifact")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "expected the rule side to broadcast into the item-count joins")
  }

  test("TPC-H completion queries keep their scale-plan contracts") {
    // q_forecast_revenue (Q6 shape): the whole query IS the scan — every
    // predicate reaches the parquet reader and only the 4 referenced
    // columns are decoded; any join or wide read here multiplies 100 TB
    // scan volume for nothing
    val fr = SparkEntry.queries("q_forecast_revenue")(spark, sfDir)
    fr.collect()
    val frScans = flatten(fr.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(frScans.size === 1, "Q6 shape must read exactly one table")
    val pushed = frScans.head.metadata("PushedFilters")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(pushed.contains(c), s"predicate on $c not pushed: $pushed")
    }
    assert(frScans.head.schema.fieldNames.sorted.toSeq ===
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_shipdate"),
      s"Q6 scan must decode exactly 4 columns, read ${frScans.head.schema.fieldNames.mkString(",")}")
    assert(flatten(fr.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]) === 0)

    // q_min_cost_supplier (Q2 shape): ONE fact scan — the window-min
    // formulation; a second lineitem scan means the groupBy-join-back
    // regression came back
    val mc = SparkEntry.queries("q_min_cost_supplier")(spark, sfDir)
    mc.collect()
    val mcFactScans = flatten(mc.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.inputFiles.exists(_.contains("lineitem")) => s
    }
    assert(mcFactScans.size === 1,
      s"Q2 shape must scan lineitem exactly once, saw ${mcFactScans.size}")

    // q_returned_topk (Q10 shape): the top-20 cut is
    // TakeOrderedAndProject (never a global sort of the aggregate)
    val rt = SparkEntry.queries("q_returned_topk")(spark, sfDir)
    rt.collect()
    assert(flatten(rt.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "Q10 shape must cut via TakeOrderedAndProject")
  }

  test("every lineitem row-level query orders by the full unique key") {
    // regression guard for the non-unique (l_orderkey, l_linenumber) trap:
    // queries whose FIRST sort column is l_orderkey must also sort by
    // l_partkey and l_suppkey (directly or via earlier unique columns)
    val rowLevel = Seq("q_scan", "q_hash", "q_datediff", "q_arith", "q_ntile", "q_rank_dist")
    rowLevel.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.optimizedPlan
      val sortStr = plan.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.order.map(_.sql).mkString(",")
      }.headOption.getOrElse("")
      withClue(s"$name sort=[$sortStr]: ") {
        assert(sortStr.contains("l_partkey") && sortStr.contains("l_suppkey"))
      }
    }
  }

  test("round-16 queries keep their scale-plan contracts") {
    def nonRangeShuffles(p: SparkPlan) = flatten(p).count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]
      case _ => false
    }
    def scanColumns(p: SparkPlan, table: String): Seq[Set[String]] =
      flatten(p).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.inputFiles.exists(_.contains(table)) =>
          s.schema.fieldNames.toSet
      }
    def run(name: String) = {
      val q = SparkEntry.queries(name)(spark, sfDir)
      q.collect(); q.queryExecution.executedPlan
    }

    // q_mattr / q_fim: entirely row-local — the presentation range sort
    // is the ONLY exchange, and the scan prunes to (doc_id, text)
    for (name <- Seq("q_mattr", "q_fim")) {
      val p = run(name)
      withClue(s"$name: ") {
        assert(nonRangeShuffles(p) === 0, "must be row-local")
        assert(scanColumns(p, "documents").forall(_ === Set("doc_id", "text")),
          "scan must prune to (doc_id, text)")
      }
    }

    // q_welch_t: ONE conditional hash aggregate — one source exchange,
    // no join; scan prunes to the three used columns
    val wt = run("q_welch_t")
    assert(nonRangeShuffles(wt) === 1,
      "q_welch_t is one conditional hash aggregate")
    assert(scanColumns(wt, "documents")
        .forall(_ === Set("doc_id", "source", "n_chars")),
      "q_welch_t scan must prune to (doc_id, source, n_chars)")

    // q_span_corrupt: run-detection windows and the rebuild aggregate all
    // ride ONE doc-keyed exchange
    assert(nonRangeShuffles(run("q_span_corrupt")) === 1,
      "q_span_corrupt must ride one doc-hash exchange")

    // q_kmv_distinct: the distinct-(lang, hash) agg plus the rank window /
    // final agg exchange — two total; nothing corpus-keyed after the first
    assert(nonRangeShuffles(run("q_kmv_distinct")) <= 2,
      "q_kmv_distinct is two exchanges: distinct agg + rank window")

    // q_seasonal_decomp: daily agg, key window/phase agg — the phase
    // means must come back as a BROADCAST join, never a shuffled one
    val sd = run("q_seasonal_decomp")
    assert(flatten(sd).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "q_seasonal_decomp must broadcast the phase means")
    assert(scanColumns(sd, "events")
        .forall(_ === Set("event_type", "ts", "value")),
      "q_seasonal_decomp scan must prune to (event_type, ts, value)")

    // q_ams_f2: the ×80 seed explode runs over the vocabulary-sized count
    // frame, NEVER the corpus — the explode's child aggregate keys on the
    // value, so the exchange count stays fixed (count agg, seed agg,
    // group agg, two singleton rollups)
    assert(nonRangeShuffles(run("q_ams_f2")) <= 5,
      "q_ams_f2 exchanges must stay sketch-sized and fixed")

    // q_jl_distortion: probe pairing is a broadcast nested-loop on the
    // row-limited frame; the projection itself adds no exchange
    val jl = run("q_jl_distortion")
    assert(nonRangeShuffles(jl) === 0,
      "q_jl_distortion must not shuffle (row-local projection + broadcast pairing)")
    assert(flatten(jl).exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _ => false
    }, "q_jl_distortion must broadcast the probe frame")

    // q_fd_profile: exact integer profile — per candidate the (lhs, rhs)
    // agg, the lhs agg and a singleton rollup; the union of 3 candidates
    // stays within 9 exchanges and every documents scan prunes to the
    // candidate's two columns (or fewer)
    val fd = run("q_fd_profile")
    assert(nonRangeShuffles(fd) <= 9, "q_fd_profile exchanges must stay fixed")
    assert(scanColumns(fd, "documents")
        .forall(_.subsetOf(Set("doc_id", "source", "lang"))),
      "q_fd_profile scans must prune to candidate columns")
  }

  test("round-16 second-wave queries keep their scale-plan contracts") {
    def nonRangeShuffles(p: SparkPlan) = flatten(p).count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]
      case _ => false
    }
    def hasBroadcastJoin(p: SparkPlan) = flatten(p).exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case _ => false
    }
    def scanColumns(p: SparkPlan, table: String): Seq[Set[String]] =
      flatten(p).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.inputFiles.exists(_.contains(table)) =>
          s.schema.fieldNames.toSet
      }
    def run(name: String) = {
      val q = SparkEntry.queries(name)(spark, sfDir)
      q.collect(); q.queryExecution.executedPlan
    }

    // q_weighted_median: the tie pre-aggregate and the cumulative window
    // share the lang prefix — two exchanges total, scan pruned to the
    // three used columns
    val wm = run("q_weighted_median")
    assert(nonRangeShuffles(wm) <= 2,
      "q_weighted_median is the tie agg + the cumulative window")
    assert(scanColumns(wm, "documents")
        .forall(_ === Set("lang", "n_chars", "text")),
      "q_weighted_median scan must prune to (lang, n_chars, text)")

    // q_k_anonymity: QI-keyed aggregates + singleton rollup, nothing
    // row-sized after; scan pruned to QI + sensitive
    val ka = run("q_k_anonymity")
    assert(nonRangeShuffles(ka) <= 3, "q_k_anonymity exchanges must stay fixed")
    assert(scanColumns(ka, "customer")
        .forall(_ === Set("c_nationkey", "c_mktsegment", "c_acctbal")),
      "q_k_anonymity scan must prune to QI + sensitive columns")

    // q_attribution_multi: everything user-keyed — the conversion window,
    // the user-local segment join and the position windows share the
    // user-hash prefix; only the final touch-type rollup re-keys
    assert(nonRangeShuffles(run("q_attribution_multi")) <= 4,
      "q_attribution_multi must stay user-keyed until the rollup")

    // q_km_survival: per-user agg → lifetime agg → one collected row;
    // the corpus max broadcasts; scan prunes to (o_custkey, o_orderdate)
    val km = run("q_km_survival")
    assert(hasBroadcastJoin(km), "q_km_survival must broadcast the corpus max")
    assert(scanColumns(km, "orders")
        .forall(_ === Set("o_custkey", "o_orderdate")),
      "q_km_survival scan must prune to (o_custkey, o_orderdate)")

    // q_int8_recall: the probe frame broadcasts into the corpus scan;
    // both top-k windows ride probe-hash exchanges
    assert(hasBroadcastJoin(run("q_int8_recall")),
      "q_int8_recall must broadcast the probe frame")

    // q_user_growth: two aggregates collapse the corpus before the
    // day-catalog join/window; the events scan prunes to (user_id, ts)
    val ug = run("q_user_growth")
    assert(scanColumns(ug, "events").forall(_ === Set("user_id", "ts")),
      "q_user_growth scan must prune to (user_id, ts)")

    // q_ab_test: one user aggregate then singleton rollups — exchanges
    // stay fixed and the scan prunes to the three used columns
    val ab = run("q_ab_test")
    assert(nonRangeShuffles(ab) <= 2, "q_ab_test is user agg + rollup")
    assert(scanColumns(ab, "events")
        .forall(_ === Set("user_id", "event_type")),
      "q_ab_test scan must prune to (user_id, event_type)")

    // q_ess: ONE map-side-combinable aggregate
    assert(nonRangeShuffles(run("q_ess")) === 1,
      "q_ess is one group-keyed aggregate")

    // q_lsh_cost_plan: signature pass is row-local; only the (band, key)
    // count and the band rollup exchange — the forecast never touches a
    // candidate pair (no join at all)
    val cp = run("q_lsh_cost_plan")
    assert(flatten(cp).count {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _ => false
    } === 0, "q_lsh_cost_plan must forecast without any join")

    // q_join_size_est: all exchanges are vocabulary/sketch-keyed — the
    // fact scans prune to the single join-key column each
    val js = run("q_join_size_est")
    assert(scanColumns(js, "orders").forall(_ === Set("o_custkey")),
      "q_join_size_est orders scan must prune to the key")
    assert(scanColumns(js, "customer").forall(_ === Set("c_custkey")),
      "q_join_size_est customer scan must prune to the key")
  }

  test("round-16b queries keep their scale-plan contracts") {
    def nodesOf(name: String) = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      flatten(df.queryExecution.executedPlan)
    }
    def nonRangeShuffles(nodes: Seq[SparkPlan]) = nodes.count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]
      case _ => false
    }
    def smjCount(nodes: Seq[SparkPlan]) = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
    def scanCols(nodes: Seq[SparkPlan], table: String): Seq[Set[String]] =
      nodes.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.inputFiles.exists(_.contains(table)) =>
          s.schema.fieldNames.toSet
      }

    // the recurrence family: ONE series-key exchange each, scan pruned
    // to (event_id, user_id, value)
    for (name <- Seq("q_macd", "q_rsi", "q_bollinger", "q_holt_winters", "q_changepoint")) {
      val n = nodesOf(name)
      withClue(s"$name: ") {
        assert(nonRangeShuffles(n) === 1, "one series-key exchange serves everything")
        assert(scanCols(n, "events").forall(_ === Set("event_id", "user_id", "value")),
          "scan must prune to the three used columns")
      }
    }

    // the one-aggregate stats family: one group exchange, pruned scans
    for ((name, cols) <- Seq(
      "q_mann_whitney" -> Set("doc_id", "source", "n_chars"),
      "q_noisy_counts" -> Set("lang"))) {
      val n = nodesOf(name)
      withClue(s"$name: ") {
        assert(nonRangeShuffles(n) === 1)
        assert(scanCols(n, "documents").forall(_ === cols))
      }
    }
    val or = nodesOf("q_odds_ratio")
    assert(nonRangeShuffles(or) === 1, "q_odds_ratio is one conditional aggregate")
    assert(scanCols(or, "customer")
      .forall(_ === Set("c_nationkey", "c_acctbal", "c_mktsegment")))

    // q_tfidf_sim: the inverted-index join must stay SMJ-free (the token
    // join is hinted SHUFFLE_HASH — per-key build bounded by the DF cap)
    // and the documents scans prune to (doc_id, text)
    val tf = nodesOf("q_tfidf_sim")
    assert(smjCount(tf) === 0, "the token join must not regress to sort-merge")
    assert(scanCols(tf, "documents").forall(_.subsetOf(Set("doc_id", "text"))))

    // q_item_neighbors reads ONLY the pair/item artifacts — lineitem and
    // orders are never rescanned (the q_assoc_rules contract)
    val in16 = nodesOf("q_item_neighbors")
    assert(scanCols(in16, "lineitem").isEmpty && scanCols(in16, "orders").isEmpty,
      "the CF ranking must ride the artifacts, not the fact tables")

    // q_sliding_mau / q_decayed_topk / q_ccf: events scans prune to the
    // used columns; everything after the first aggregate is catalog-sized
    assert(scanCols(nodesOf("q_sliding_mau"), "events").forall(_ === Set("ts", "user_id")))
    assert(scanCols(nodesOf("q_decayed_topk"), "events")
      .forall(_.subsetOf(Set("ts", "event_type"))))
    assert(scanCols(nodesOf("q_ccf"), "events")
      .forall(_.subsetOf(Set("ts", "event_type", "value"))))

    // graph pair: both ride checkpointed edge frames, SMJ-free
    for (name <- Seq("q_harmonic", "q_betweenness")) {
      withClue(s"$name: ") { assert(smjCount(nodesOf(name)) === 0) }
    }

    // q_kmv_jaccard: rides the persisted shingle artifact (never
    // re-exploding text — the r16b KMV routing) with the doc→lang label
    // as a broadcast; the hash frame is checkpointed once for its four
    // consumers; everything downstream is sketch/vocabulary-keyed
    // (the artifact + label-join scans live UPSTREAM of the hash frame's
    // eager checkpoint, so the final plan reads the materialized RDD —
    // the PairStore lesson; what the contract CAN pin is that no
    // documents-text re-scan ever appears downstream)
    val kj = nodesOf("q_kmv_jaccard")
    assert(nonRangeShuffles(kj) <= 7 && smjCount(kj) === 0,
      "q_kmv_jaccard must stay sketch-keyed and hash-joined")
    assert(scanCols(kj, "documents").forall(!_.contains("text")),
      "the corpus text must never be re-scanned past the hash checkpoint")
  }

  test("bench heavy tail (every query >= 1.5 s) keeps its exchange budget and stays SMJ-free") {
    // VERDICT r15 item 7: the heavy tail is exactly where silent plan
    // drift costs the most at 100×, so every BENCH_LAST query at or above
    // 1.5 s carries a contract. Two invariants per query, both measured
    // at the current plans (r16): (a) the non-range shuffle count stays
    // at or under its recorded ceiling — exchange-count creep is the
    // usual drift signature (a broadcast silently becoming a shuffle, a
    // reused exchange splitting in two); (b) no SortMergeJoin appears —
    // every join in this tail is a broadcast or shuffled-hash join today,
    // and an SMJ regression would add two full sorts to the hottest
    // queries. Queries already under a dedicated contract elsewhere in
    // this spec (q_triangles, q_jaccard_prefix, q_label_prop, q_walks,
    // q_pipeline_prep, q_min_cost_supplier, q_kmv_jaccard) are not
    // repeated.
    val dedicated = Set("q_triangles", "q_jaccard_prefix", "q_label_prop",
      "q_walks", "q_pipeline_prep", "q_min_cost_supplier", "q_kmv_jaccard")
    val shuffleCeilings = Map(
      "q_kmv_merge" -> 6, "q_embed_cov" -> 2, "q_ppr" -> 8,
      // r22: fused recall-curve read-out (one running-count window + one
      // broadcast join + one aggregate serve every budget) — measured 3
      // cold; +1 headroom for the warm-session reused-exchange split the
      // r17 note below records for the IVF curves
      "q_sen_slope" -> 4, "q_pq_recall_curve" -> 4, "q_freq_spectrum" -> 3,
      "q_sssp" -> 2, "q_nb_confusion" -> 2, "q_pipeline_curate" -> 12,
      "q_containment" -> 1, "q_pagerank" -> 5, "q_bfs_2hop" -> 2,
      "q_embed_neardup_lsh_r8" -> 1, "q_sole_return_supplier" -> 3,
      "q_itemsets3" -> 1, "q_join_salted" -> 1,
      // r21: +1 = the adaptive small-scan spread (Portable.spreadSmallScan
      // round-robins the single-row-group bench file across cores; absent
      // on real multi-split inputs) in q_cdc_chunks; q_sen_slope carries
      // +2 — its spread exchange materializes separately under EACH side
      // of the self-join (2 real + 2 spread measured at sf0.1 and in the
      // committed bench audit)
      "q_cdc_chunks" -> 4,
      // r21: label_suspects single-pass conditional agg (10 -> 8 measured),
      // dup_rate_curve one corpus pass for all four sizes (8 -> 3 measured)
      "q_label_suspects" -> 9, "q_heaps_law" -> 6, "q_dup_rate_curve" -> 4,
      "q_record_linkage" -> 2, "q_tfidf" -> 7, "q_topk_pergroup" -> 2,
      "q_dominant_supplier" -> 2,
      // r17: the PQ serving family — tail-resident in r16 without
      // contracts (VERDICT r16 item 2). r18 (VERDICT r17 item 2): the
      // fetch stage checkpoints the rerank·|queries|-row candidate frame
      // (the ADC rank exchange executes once, inside the checkpoint job)
      // and broadcasts candidate ids/vectors both ways, so the serving
      // plan keeps exactly ONE exchange — the final cut's, whose traffic
      // is the candidate frame itself (see rerankFetchScored's scaladoc)
      "q_pq_topk" -> 1, "q_ivfpq_topk" -> 1, "q_ivfpq_res_topk" -> 1,
      // r17: first catches of the self-updating coverage below — three
      // steal-window tail entrants, ceilings measured same-day (q_hits:
      // 4 power-iteration rounds × hub/auth join-aggs; q_degree_dist:
      // edge build + degree agg + histogram agg; q_bigram_logprob:
      // token explode → bigram agg → unigram join + smoothing)
      "q_hits" -> 12, "q_degree_dist" -> 3, "q_bigram_logprob" -> 5,
      // r17b: the second steal-window's entrants plus the promoted
      // k=64 IVF family (assignment now reads the clustered store; the
      // recall curves pay one probe exchange per budget)
      "q_editdist_join" -> 1, "q_rfm" -> 5, "q_sliding_mau" -> 7,
      "q_kn_logprob" -> 8, "q_clustering_coef" -> 4, "q_tfidf_sim" -> 11,
      "q_ivf_topk" -> 1,
      // r22: fused read-out (see q_pq_recall_curve above) — 9 -> 3
      // measured cold; +1 for the warm-session reused-exchange split
      "q_ivf_recall_curve" -> 4, "q_ivf_recall_sqrtn" -> 4,
      // r17c: Bradley–Terry joins the tail on arrival (winner window +
      // pair agg ride one order-key exchange; the 5 MM rounds run off
      // checkpointed catalog-sized state — no per-round exchange).
      // r21: the MM loop moved driver-side (local-relation broadcast π);
      // the read-out plan is the players checkpoint + one broadcast join
      "q_bradley_terry" -> 1,
      // r18 (VERDICT r17 item 7): q_sprt sits one steal gust under the
      // 1.5 s line — ceiling measured proactively rather than waiting
      // for the self-updating gate to trip mid-round (day-count agg +
      // walk window share one day exchange; the referee agg adds one)
      "q_sprt" -> 2,
      // r18: the trigram language router joins the tail on arrival
      // (char fan → (lang,gram) agg → profile window → distinct types →
      // overlap agg → argmax window → confusion agg: 7 exchanges, all
      // type-keyed after the fan)
      "q_langid" -> 7,
      // r18: q_bh_fdr measures 1.2 s — one steal gust from the line, so
      // pinned proactively like q_sprt (unit agg → per-(group, replica)
      // agg → extreme join → the catalog-window step-up). r18b: the two
      // catalog joins are broadcast-HINTED now — the estimate-blind
      // frames planned SMJ in some session states — and one group-hash
      // exchange the SMJ's shared sort previously covered materializes
      // separately: 7 exchanges measured, unit-table-sized at most
      "q_bh_fdr" -> 7,
      // r18b→r19: the representation audits serve from the persisted
      // MomentStore partials now (VERDICT r18 item 1) — no corpus fan
      // at read time; the 3 exchanges are the two 80-row mean aggs
      // (broadcast sides) + the 1-row roll-up, all store-sized
      "q_effective_rank" -> 3, "q_cka" -> 3,
      // r19: q_embed_cov's sibling read over the same store (two mean
      // aggs; cells flow exchange-free into the per-cell projection),
      // and the C309 centroid matrix off the per-(source, dim) partials
      // (two catalog mean aggs + the pair-fan group agg)
      "q_source_sim" -> 3,
      // r18b: the k=64 silhouette health report drifted over the line in
      // a clean window (1.7 s — the honest k=64 promotion cost the r17
      // notes documented); ONE cell exchange serves the per-cell moment
      // aggregate, everything after is 64-row catalog work (r21: +1 =
      // the adaptive small-scan spread, absent on real inputs)
      "q_silhouette" -> 2,
      // r18d→r19: the two-cohort second-moment sweep serves from the
      // MomentStore's cohort cell columns (VERDICT r18 item 1: 2 → 1
      // store-side) — the single exchange is the 1-row roll-up over the
      // 2,080 xx-block rows; the corpus fan lives in the artifact build
      "q_moment_drift" -> 1,
      // r19: the Cox pair hovers at the 1.5 s line in steal windows —
      // pinned proactively (the q_sprt precedent). q_cox_ph: user agg +
      // lifetime agg + risk window + the checkpointed stats' 1-row
      // Newton/read-out aggs (4); q_cox_strat adds the stratum-keyed
      // risk exchange (5). Iterations run off the checkpointed
      // catalog-sized stats — no per-round corpus exchange.
      "q_cox_ph" -> 4, "q_cox_strat" -> 5,
      // r19: q_join_star crossed 1.5 s ONLY inside a 21 s steal window
      // (isolated-warm 0.81–0.91 s, BENCHONE in NOTES_r19) — ceiling
      // recorded at its measured plan: one shuffle for the fact-side
      // agg; dims broadcast
      "q_join_star" -> 1,
      // r19: q_textrank likewise a steal-window entrant (1.66 s at
      // 117 s storm steal; isolated-warm 1.00–1.23 s at steal 0.21,
      // BENCHONE in NOTES_r19) — ceiling at its measured plan: token
      // fan → co-occurrence agg + the two string-keyed PageRank
      // join-agg rounds
      "q_textrank" -> 3,
      // r19: q_dsir_weights, same storm (1.55 s at 68 s steal;
      // isolated-warm 1.00–1.24 s at steal 0.07) — hash fan → in/out
      // unigram aggs + the per-doc log-ratio join-aggs, all
      // vocabulary-keyed
      "q_dsir_weights" -> 6,
      // r19: q_cosine_topk_lsh, same storm (1.66 s at 68 s steal;
      // isolated-warm 1.03–1.36 s at steal 0.48) — the banded
      // candidate join rides one (band, sig) exchange; queries
      // broadcast, exact re-score row-local
      "q_cosine_topk_lsh" -> 1,
      // r19: q_profile, same storm epoch (1.56 s; isolated-warm
      // 1.09–1.28 s at steal 0.24) — one column-stats aggregate + the
      // 5-row summary roll-up
      "q_profile" -> 2,
      // r20: the in-engine logreg trainer is tail-resident on arrival
      // (5.5 s in a 177 s storm window): the checkpointed feature
      // frame's build carries the corpus exchanges (tok fan → (doc,
      // bucket) agg → doc-length agg); every training iteration runs
      // z/gradient aggs AGAINST the checkpoint, so iterations add no
      // corpus exchange and the audited plan (the final read-out) keeps
      // 3 — the z agg + the AUC distinct-score agg + its rank window's
      // single-partition exchange
      "q_logreg" -> 3,
      // r20: the two-covariate Cox joins its siblings at the 1.5 s
      // line (2.2 s in the same storm; q_cox_ph/q_cox_strat precedent):
      // user agg + lifetime agg + risk window + the checkpointed stats'
      // read-out agg — iterations off the checkpoint, no per-round
      // corpus exchange
      "q_cox_multi" -> 4,
      // r20 proactive pins (the q_sprt precedent — measured on arrival
      // rather than waiting for a steal gust to trip the gate):
      // q_isotonic 1.24 s in the storm window — ONE corpus-derived
      // exchange (the (source, score) catalog agg); everything after
      // (per-group array, PAV read-back, two ECE binnings, summary,
      // blocks, final joins) is catalog-sized
      "q_isotonic" -> 10,
      // q_url_filter 1.15 s in the storm window — domain distinct +
      // suffix-hit verdict agg + the per-doc left join + category
      // roll-up; the rule side broadcasts
      "q_url_filter" -> 5,
      // r20: Platt scaling enters the clean-window tail on arrival
      // (1.93 s at steal 0.38): iterations run against the
      // checkpointed score catalog (driver-side (a,b) model, no
      // per-round corpus exchange); the audited read-out carries the
      // summary agg, the fitted-frame join, and the two ECE binning
      // agg+roll-up pairs — all catalog-sized after the one
      // (source, score) catalog agg
      "q_platt" -> 9)
    // Self-updating coverage (VERDICT r16 item 2): the covered set
    // derives from the COMMITTED bench artifact, not a hardcoded list —
    // a query that newly enters the ≥ 1.5 s tail FAILS this suite until
    // its plan is measured and a ceiling recorded (r16 proved the
    // hardcoded list drifts within one round).
    val benchTail: Set[String] =
      try {
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get("BENCH_LAST.json"))
        val qBlock = txt.substring(txt.indexOf("\"queries\":{") + 11)
        """"([A-Za-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(qBlock.takeWhile(_ != '}'))
          .collect { case m if m.group(2).toDouble >= 1.5 => m.group(1) }.toSet
      } catch { case _: Throwable => Set.empty }
    val uncovered = (benchTail -- dedicated -- shuffleCeilings.keySet)
      .filter(SparkEntry.queries.contains)
    assert(uncovered.isEmpty,
      s"bench-tail queries without a plan contract: ${uncovered.toSeq.sorted.mkString(", ")}" +
        " — measure their non-range shuffle counts and record ceilings here")
    shuffleCeilings.toSeq.sortBy(_._1).foreach { case (name, ceiling) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // AQE settles the final stages
      val nodes = flatten(df.queryExecution.executedPlan)
      val shuffles = graft.plans.PlanAudit.nonRangeShuffles(df)
      withClue(s"$name: ") {
        assert(shuffles <= ceiling,
          s"non-range shuffle count $shuffles exceeds the recorded ceiling $ceiling")
        assert(!nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
          "a SortMergeJoin appeared in a heavy-tail plan (was broadcast/SHJ)")
      }
    }
  }
}
