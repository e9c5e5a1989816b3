package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operators: projections, filters, joins, aggregations,
  * set ops, top-k. Mirrors the reference surface (SURVEY.md §2.2, §2.4,
  * §2.5, §2.7, §2.8):
  *   - column-pruning select  — /root/reference/dags/spark/etl.py:161
  *   - IS NULL filter         — etl.py:167-168
  *   - select+filter+distinct — etl.py:167-168 (quality-check shape)
  *   - left equi join fact×dim — etl.py:160-164
  *   - composite-key inner join — /root/reference/README.md:175-176
  *
  * Scale posture (100 TB): dimension sides are `broadcast()` hinted; big
  * joins are plain equi-joins so Catalyst plans shuffled hash / sort-merge
  * with AQE skew handling; aggregations are partial+final hash aggregates;
  * top-k is `orderBy().limit()` which Spark plans as TakeOrderedAndProject
  * (per-partition heap, no global sort).
  */
object Relational {

  /** Pruned scan: reads only the requested columns (column pruning reaches
    * the parquet reader — check `ReadSchema` in explain).
    */
  def scanProject(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** Quality-check shape (etl.py:167-168): project → predicate → distinct. */
  def qualityCheck(df: DataFrame, cols: Seq[String], predicate: String): DataFrame =
    df.select(cols.map(col): _*).where(predicate).dropDuplicates()

  /** Fact × small-dimension left join with an explicit broadcast hint, the
    * 100 TB-safe plan for bounded dims (etl.py:160-164 joins a 2,728-row
    * dimension; Catalyst would auto-broadcast but the hint is deterministic).
    */
  def factDimLeftJoin(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key), "left")

  /** Composite-key inner join (README.md:175-176 derivative↔underlying).
    * Both sides large at scale → sort-merge join on the composite key.
    */
  def compositeInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "inner")

  /** Left semi join: `WHERE key IN (SELECT ...)` without duplication. */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** Left anti join: the scalable form of the reference's quality checks
    * ("facts whose segment is missing from the spec", SURVEY.md §2.4).
    */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Deterministic hash-based sampling: keep a row iff
    * md5(key) mod 10000 < rate·10000. Unlike `sample()`/`sampleBy()`
    * (rand(seed) per row — result depends on partitioning and row order),
    * this is a pure function of the key: reproducible on any cluster
    * layout, stable across reruns, and expressible in any engine — the
    * correct way to carve out a held-out split of a 100 TB corpus.
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    val bucket = Portable.hash32(col(keyCol)) % 10000
    // math.round: truncation would put e.g. 0.29*10000 = 2899.999... one
    // bucket under the documented rate*10000 threshold
    df.where(bucket < math.round(rate * 10000))
  }

  /** Stratified deterministic sample: per-stratum rates, same hash rule. */
  def hashSampleBy(df: DataFrame, keyCol: String, strataCol: String,
                   rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val bucket = Portable.hash32(col(keyCol)) % 10000
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 10000))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(math.round(rate * 10000))).otherwise(acc)
    }
    df.where(bucket < threshold)
  }

  /** Deterministic train/val/test split assignment over the SAME md5
    * bucket rule as hashSample — stateless, reproducible across runs and
    * engines, and stable under corpus growth (a document's split never
    * changes when other documents arrive, unlike randomSplit). Fractions
    * are (name, fraction) in order; buckets partition [0, 10000) by the
    * cumulative cuts, remainder falls to the last split.
    */
  def splitAssign(df: DataFrame, keyCol: String,
                  fractions: Seq[(String, Double)]): DataFrame = {
    val bucket = Portable.hash32(col(keyCol)) % 10000
    val cuts = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000)
    }.tail
    val assign = fractions.zip(cuts).reverse
      .foldLeft(lit(fractions.last._1): org.apache.spark.sql.Column) {
        case (acc, ((name, _), cut)) => when(bucket < cut, lit(name)).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Weighted sample of k rows per stratum WITHOUT replacement, by
    * deterministic priority (Efraimidis–Spirakis A-ES): each row draws a
    * uniform u from the SAME md5-bucket rule as hashSample (a pure
    * function of its key — reproducible on any cluster layout) and gets
    * priority −ln(u)/w; the k smallest priorities per stratum win. This
    * is exactly weighted sampling without replacement — a row of weight w
    * has priority distributed Exp(w), and taking the k minima of
    * independent exponentials reproduces sequential weighted draws — but
    * runs as a stateless per-row expression + per-group top-k, no
    * sequential pass, no rejection loop, no driver state: the correct way
    * to pull a quality-weighted subsample from a 100 TB corpus.
    *
    * Scale shape: row-local priority, then the standard two-phase
    * per-group top-k (partial sort inside partitions via the window rank,
    * only k rows per (partition, stratum) reach the shuffle when AQE's
    * partial windowing applies; worst case one shuffle on the stratum
    * key). Weights must be strictly positive.
    */
  def weightedSample(df: DataFrame, keyCol: String, strataCol: String,
                     weightCol: String, k: Int): DataFrame = {
    // u in (0, 1): (bucket + 0.5) / 2^32 over the first 8 md5 hex digits —
    // never 0 or 1, so the log is finite; same digest both engines.
    val u = (Portable.hash32(col(keyCol)).cast("double") + 0.5) / 4294967296.0
    val rank = row_number().over(
      Window.partitionBy(col(strataCol))
        .orderBy(col("_priority").asc, col(keyCol).asc))
    df.withColumn("_priority", -log(u) / col(weightCol).cast("double"))
      .withColumn("sample_rank", rank)
      .where(col("sample_rank") <= k)
      .withColumn("priority", round(col("_priority"), 9))
      .drop("_priority")
  }

  /** Skew-salted inner equi join for hot keys: the (large, skewed) left
    * side gets a deterministic salt from its full row hash, the right side
    * is replicated `nSalts` ways, and the join runs on (keys :+ salt) so a
    * hot key's rows spread over `nSalts` tasks instead of one straggler.
    * Results are identical to the plain join. Right-side replication costs
    * nSalts× its size — keep the right side the smaller input.
    *
    * WHEN TO USE WHICH skew remedy (fed by the `keySkew` diagnostic /
    * q_skew_profile):
    *  - AQE skew-join (default-on, zero code): splits an oversized SHUFFLE
    *    PARTITION into advisory-sized reads post-shuffle. Handles the
    *    common case — several warm keys hashing into one partition, or one
    *    hot key whose rows AQE can fan across sub-reads (the matching
    *    right side is duplicated per split). Proven in SkewJoinSpec.
    *  - saltedJoin (explicit rewrite): when one KEY alone exceeds what a
    *    single task should hold even after AQE's split granularity, or
    *    when the engine must guarantee the spread at plan time (AQE only
    *    reacts to observed map statistics at runtime). Costs the salt
    *    column + right-side replication, so it's the escalation, not the
    *    default.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], nSalts: Int): DataFrame = {
    val salted = left.withColumn(
      "_salt", pmod(hash(left.columns.map(col): _*), lit(nSalts)))
    val replicated = right.withColumn(
      "_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Snapshot upsert (merge-into-latest): union the base snapshot with an
    * update batch and keep, per key, the row with the highest version —
    * the periodic "refresh the entity table from the landing zone" op of
    * a 100 TB pipeline. One shuffle on the key; `versionCol` must totally
    * order rows within a key (ingest timestamp, batch id) for the result
    * to be deterministic.
    */
  def upsertLatest(base: DataFrame, updates: DataFrame,
                   keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    base.unionByName(updates)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Partial-aggregate state for incremental (materialized-view style)
    * aggregation maintenance: per-key count + exact decimal sum. Partials
    * are re-mergeable — `mergePartialAggs(Seq(partial(base),
    * partial(delta)))` equals `partial(base ∪ delta)` exactly, because
    * count and decimal-sum are associative/commutative monoids (a double
    * sum would NOT be: IEEE addition order changes the result, so partials
    * would drift from the full recompute).
    *
    * This is the pattern that makes a 100 TB rolling aggregate affordable:
    * aggregate each new partition/day once, keep the tiny partial table,
    * and merge — never rescan history. Derived values (double total, avg)
    * are computed only at merge time, from the exact state.
    */
  def partialAggs(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast("decimal(28,4)")).as("_dec_total"))

  /** Merge partial-aggregate states (see `partialAggs`) and finalize:
    * n, double total, and mean — bit-identical to aggregating the union of
    * the underlying rows in one pass.
    */
  def mergePartialAggs(parts: Seq[DataFrame], keys: Seq[String]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("_dec_total").as("_t"))
      .select(keys.map(col) ++ Seq(
        col("n"),
        col("_t").cast("double").as("total"),
        (col("_t").cast("double") / col("n").cast("double")).as("avg_value")): _*)

  /** Reciprocal-rank fusion (Cormack et al. 2009) of retrieval
    * shortlists: each input carries (idCol, rank); a document's fused
    * score is Σ_lists 1/(kConst + rank), absent-from-a-list contributing
    * nothing — the standard way to combine lexical (BM25) and semantic
    * (embedding) retrieval without score calibration, since only RANKS
    * enter. Inputs are top-N shortlists, not full corpus rankings: that
    * is both what production fusion does and what keeps this
    * scale-clean — the union is |lists|·N rows, the aggregate and final
    * top-k are a toy regardless of corpus size. Contributions are
    * decimal-summed (order-independent across lists); ties broken by id.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
              kConst: Int, topK: Int): DataFrame = {
    val contribs = rankings.map(_.select(col(idCol),
        (lit(1.0) / (lit(kConst.toDouble) + col("rank").cast("double"))).as("_c")))
      .reduce(_ unionByName _)
    contribs.groupBy(idCol)
      .agg(round(Portable.decSum(col("_c"), 12), 9).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol).asc).limit(topK)
      .withColumn("rank", row_number().over(
        Portable.kRowWindow(col("rrf").desc, col(idCol).asc)).cast("long"))
      .select(col("rank"), col(idCol), col("rrf"), col("n_lists"))
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel 2010) of two top-`depth`
    * rankings — the top-weighted similarity between two rankers that C116's
    * RRF fusion presumes are worth fusing: two rankers with RBO ≈ 1 are
    * redundant, RBO ≈ 0 orthogonal. Persistence parameter `p` weights
    * prefix k by p^(k−1), so early agreement dominates (the property plain
    * set-overlap-at-k lacks).
    *
    *   RBO_d = (1−p)·Σ_{k=1..d} p^(k−1)·X_k/k + p^d·X_d/d
    *
    * where X_k = |A_{1..k} ∩ B_{1..k}|. A shared doc enters every prefix
    * from k₀ = max(rank_A, rank_B) onward, so X_k is one cumulative sum
    * over the d-row depth frame — the window is a kRowWindow over exactly
    * `depth` rows (bounded by construction, never corpus-sized), and the
    * per-k terms decimal-sum so the score is order-independent. Output is
    * ONE row: (depth, overlap_at_depth, rbo).
    */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
                        p: Double, depth: Int): DataFrame = {
    val entry = a.select(col(idCol), col(rankCol).cast("long").as("_ra"))
      .join(b.select(col(idCol), col(rankCol).cast("long").as("_rb")), Seq(idCol))
      .select(greatest(col("_ra"), col("_rb")).as("_k0"))
      .where(col("_k0") <= depth)
      .groupBy("_k0").agg(count(lit(1)).as("_c"))
    val ks = a.sparkSession.range(1, depth + 1).toDF("k")
    val xk = ks.join(broadcast(entry), col("k") === col("_k0"), "left")
      .select(col("k"), coalesce(col("_c"), lit(0L)).as("_c"))
      .withColumn("_x", sum("_c").over(Portable.kRowWindow(col("k").asc)
        .rowsBetween(Window.unboundedPreceding, 0)))
    val term = pow(lit(p), col("k").cast("double") - 1.0) *
      (col("_x").cast("double") / col("k").cast("double"))
    xk.agg(
        max(when(col("k") === depth, col("_x"))).as("_xd"),
        Portable.decSum(term, 12).as("_s"))
      .select(lit(depth).cast("long").as("depth"),
        col("_xd").as("overlap_at_depth"),
        round(lit(1.0 - p) * col("_s") +
          pow(lit(p), lit(depth.toDouble)) * (col("_xd").cast("double") / lit(depth.toDouble)),
          6).as("rbo"))
  }

  /** nDCG@k (Järvelin & Kekäläinen 2002) of a system ranking against
    * graded relevance judgments — the standard position-discounted IR
    * quality metric completing the retrieval-eval family (C116 RRF
    * fuses rankers, C140 RBO compares two rankers symmetrically; nDCG
    * grades ONE ranker against judgments):
    *
    *   DCG@k  = Σ_{pos ≤ k} (2^rel − 1) / log2(pos + 1)   (rel 0 if unjudged)
    *   iDCG@k = the same sum over the k highest grades in the judgment set
    *   nDCG@k = DCG / iDCG                                 (NULL when iDCG = 0)
    *
    * Determinism: grades are integers, so 2^rel is exact; the discount
    * is expressed as (2^rel − 1)·ln(2)/ln(pos+1) — the ln-only shape
    * whose cross-engine bit-parity every logprob oracle already relies
    * on (log2 implementations differ in ulps between engines; ln does
    * not). Tied grades in the ideal ordering occupy a contiguous
    * position block, and permuting equal grades within it leaves the
    * sum unchanged — the ideal value is deterministic; the (grade desc,
    * id asc) sort just makes the PLAN deterministic too. Terms
    * decimal-sum (order-independent), one row out: (k, dcg, idcg, ndcg).
    *
    * Scale shape: the system side is a rank-filtered k-row frame joined
    * left against the judgment set (broadcastable — judgments are
    * eval-set-sized, never corpus-sized); the ideal side is a top-k over
    * the judgments (TakeOrderedAndProject). Nothing corpus-sized moves.
    */
  def ndcgAtK(ranked: DataFrame, relsRaw: DataFrame, idCol: String,
              rankCol: String, relCol: String, k: Int): DataFrame = {
    // One judgment per id: a duplicated doc_id would fan out the system-side
    // left join AND occupy two ideal positions, double-counting both sums.
    // Max-grade dedup makes the metric well-defined for any input (a no-op
    // shuffle on an eval-set-sized frame when judgments are already unique).
    val rels = relsRaw.groupBy(col(idCol)).agg(max(col(relCol)).as(relCol))
    val lnTwo = log(lit(2.0))
    val sysTerm = (pow(lit(2.0), coalesce(col("_rel"), lit(0L)).cast("double")) - lit(1.0)) *
      lnTwo / log(col(rankCol).cast("double") + lit(1.0))
    val dcg = ranked.where(col(rankCol) <= k)
      .join(broadcast(rels.select(col(idCol), col(relCol).as("_rel"))), Seq(idCol), "left")
      .agg(Portable.decSum(sysTerm, 12).cast("double").as("_dcg"))
    val idealTerm = (pow(lit(2.0), col(relCol).cast("double")) - lit(1.0)) *
      lnTwo / log(col("_pos").cast("double") + lit(1.0))
    val ideal = rels
      .orderBy(col(relCol).desc, col(idCol).asc).limit(k)
      .withColumn("_pos", row_number().over(
        Portable.kRowWindow(col(relCol).desc, col(idCol).asc)))
      .agg(Portable.decSum(idealTerm, 12).cast("double").as("_idcg"))
    dcg.crossJoin(ideal).select(
      lit(k).cast("long").as("k"),
      Portable.pround(col("_dcg"), 6).as("dcg"),
      Portable.pround(col("_idcg"), 6).as("idcg"),
      when(col("_idcg") > 0, Portable.pround(col("_dcg") / col("_idcg"), 6)).as("ndcg"))
  }

  /** Incremental equi-join maintenance — the join twin of `partialAggs`'
    * never-rescan-history pattern. With both inputs split into an already-
    * joined base and a newly-arrived delta, the distributivity identity
    *
    *   L_full ⋈ R_full = (L_base ⋈ R_base) ∪ (ΔL ⋈ R_full) ∪ (L_base ⋈ ΔR)
    *
    * says the stored base-join materialization only ever needs the two
    * delta joins APPENDED — the ΔL⋈ΔR cross term is inside ΔL⋈R_full, and
    * the three parts are disjoint (each output row's (L-part, R-part)
    * provenance differs), so the append is a plain union, no dedup. Daily
    * cost is O(|Δ| ⋈-matched), not O(|history|): ΔL streams against
    * R_full and ΔR against L_base, both ordinary (broadcastable when the
    * delta is small) equi-joins; the base join result is never recomputed
    * or rescanned. Returns the INCREMENT only; callers union it with
    * their stored base-join table.
    */
  /** Binary-relevance retrieval metrics — MRR, Precision@k, Recall@k and
    * AP@k of one ranked list against a relevant-id set, completing the
    * retrieval-eval family's graded-judgment member (C167 nDCG) with the
    * binary-judgment classics every eval harness reports:
    *
    *   MRR  = 1 / rank of the FIRST relevant result (NULL if none)
    *   P@k  = |rel ∩ top-k| / k
    *   R@k  = |rel ∩ top-k| / |rel|
    *   AP@k = Σ_{r ≤ k, rel(r)} P@r / min(|rel|, k)
    *
    * Every numerator/denominator is an exact integer (positions and
    * cumulative relevant counts), so the only IEEE arithmetic is the
    * final fixed-shape divisions; AP's per-position precision terms
    * decimal-sum (order-independent). Duplicate ids in `relsRaw` are
    * deduped (the ndcgAtK precondition, enforced the same way).
    *
    * Scale shape: the ranked list is depth-bounded by construction
    * (a top-k shortlist, never corpus-sized), the relevant set is
    * eval-set-sized and broadcast; the cumulative-relevant window is a
    * kRowWindow over the shortlist. One row out.
    */
  def retrievalMetrics(ranked: DataFrame, relsRaw: DataFrame, idCol: String,
                       rankCol: String, k: Int): DataFrame = {
    val rels = relsRaw.select(col(idCol)).distinct()
    val ann = ranked
      .join(broadcast(rels.withColumn("_r", lit(1L))), Seq(idCol), "left")
      .select(col(rankCol).cast("long").as("_rank"),
        coalesce(col("_r"), lit(0L)).as("_rel"))
      .withColumn("_cum", sum("_rel").over(
        Portable.kRowWindow(col("_rank").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sys = ann.agg(
      min(when(col("_rel") === 1L, col("_rank"))).as("_first"),
      max(when(col("_rank") <= k, col("_cum"))).as("_relk"),
      Portable.decSum(when(col("_rel") === 1L && col("_rank") <= k,
        col("_cum").cast("double") / col("_rank").cast("double")), 12).as("_psum"))
    val nRel = rels.agg(count(lit(1)).as("_nrel"))
    sys.crossJoin(nRel).select(
      lit(k).cast("long").as("k"),
      col("_nrel").as("n_rel"),
      when(col("_first").isNotNull,
        Portable.pround(lit(1.0) / col("_first").cast("double"), 6)).as("mrr"),
      Portable.pround(coalesce(col("_relk"), lit(0L)).cast("double") / lit(k.toDouble), 6)
        .as("p_at_k"),
      when(col("_nrel") > 0,
        Portable.pround(coalesce(col("_relk"), lit(0L)).cast("double") /
          col("_nrel").cast("double"), 6)).as("r_at_k"),
      when(col("_nrel") > 0,
        Portable.pround(coalesce(col("_psum"), lit(0.0)) /
          least(col("_nrel"), lit(k.toLong)).cast("double"), 6)).as("ap_at_k"))
  }

  /** Per-group 2-D skyline (Pareto frontier, maximize both axes): keep a
    * point iff no other point in its group is ≥ on both coordinates and
    * > on at least one (Börzsönyi et al. 2001's dominance). The classic
    * multi-criteria curation cut — "no doc strictly better on both
    * length AND vocabulary" — without collapsing the two signals into
    * one weighted score first.
    *
    * Window formulation (integer coordinates): within a group ordered by
    * x DESC, a range frame ending 1 PRECEDING sees exactly the points
    * with strictly larger x, so
    *
    *   dominated ⇔ max(y | x' > x) ≥ y  ∨  max(y | x' = x) > y
    *
    * (the second term catches same-x points with strictly better y;
    * coincident duplicates survive together — neither dominates). Both
    * windows need only the group hash partitioning — ONE shuffle, two
    * sorts, no self-join, no per-group O(n²). Exact integer compares
    * throughout; engine-portable by construction.
    */
  def skyline2D(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    // The rangeBetween(…, -1) frame means "strictly larger x" ONLY for
    // integer x: a fractional dominator with x < x' < x+1 would silently
    // escape the frame and dominated points would survive (ADVICE r15).
    // Enforce the precondition instead of documenting it away.
    require(df.schema(xCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"skyline2D requires an integral x column; '$xCol' is " +
      s"${df.schema(xCol).dataType.simpleString} — floor/scale it to an integer grid first")
    val strictlyAbove = Window.partitionBy(groupCol).orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameX = Window.partitionBy(groupCol, xCol)
    df.withColumn("_mx_gt", max(col(yCol)).over(strictlyAbove))
      .withColumn("_mx_eq", max(col(yCol)).over(sameX))
      .where((col("_mx_gt").isNull || col("_mx_gt") < col(yCol)) &&
        col(yCol) === col("_mx_eq"))
      .drop("_mx_gt", "_mx_eq")
  }

  /** Item-item cosine neighbors from co-occurrence counts — the
    * collaborative-filtering "customers also bought" primitive over the
    * SAME persisted pair/item artifacts the market-basket family owns
    * (C82/C128): cos(a, b) = cooc(a,b) / (√n_a·√n_b) on basket-presence
    * vectors, exact integers into two correctly-rounded sqrts and one
    * division (the bit-portable pow-free shape), per-item top-k with
    * deterministic ties.
    *
    * `pairs` must be the canonical unordered co-occurrence table
    * (item_a < item_b, one row per pair, a support count); `items` the
    * per-item basket counts. The pair table is symmetrized so every item
    * ranks its neighbors; everything is pair-artifact-sized — the fact
    * table is never touched.
    */
  def itemNeighbors(pairs: DataFrame, supportCol: String,
                    items: DataFrame, itemCol: String, cntCol: String,
                    k: Int): DataFrame = {
    val sym = pairs.select(col("item_a").as("item"), col("item_b").as("neighbor"),
        col(supportCol).as("_sup"))
      .unionByName(pairs.select(col("item_b").as("item"), col("item_a").as("neighbor"),
        col(supportCol).as("_sup")))
    val ni = items.select(col(itemCol).as("item"), col(cntCol).as("_na"))
    val nn = items.select(col(itemCol).as("neighbor"), col(cntCol).as("_nb"))
    val w = Window.partitionBy("item")
      .orderBy(col("cosine").desc, col("neighbor").asc)
    sym.join(ni, Seq("item")).join(nn, Seq("neighbor"))
      .select(col("item"), col("neighbor"), col("_sup").as("support"),
        Portable.pround(col("_sup").cast("double") /
          (sqrt(col("_na").cast("double")) * sqrt(col("_nb").cast("double"))), 6)
          .as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  def incrementalJoinDelta(baseL: DataFrame, deltaL: DataFrame,
                           baseR: DataFrame, deltaR: DataFrame,
                           leftKey: String, rightKey: String): DataFrame =
    deltaL.join(baseR.unionByName(deltaR), col(leftKey) === col(rightKey))
      .unionByName(baseL.join(deltaR, col(leftKey) === col(rightKey)))

  /** Snapshot diff: compare two snapshots by key and emit added / removed /
    * changed rows (unchanged rows are dropped — at scale the diff is tiny
    * relative to the snapshots). One full-outer shuffle join on the key;
    * presence markers (not null checks on data columns) decide
    * added/removed so null-valued columns never masquerade as absence.
    * Output: keys, status, and old_/new_ prefixed compare columns.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .toDF(keys ++ compareCols.map("old_" + _): _*)
      .withColumn("_in_old", lit(true))
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .toDF(keys ++ compareCols.map("new_" + _): _*)
      .withColumn("_in_new", lit(true))
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("status") =!= "unchanged")
      .drop("_in_old", "_in_new")
  }

  /** Global top-k: planned as TakeOrderedAndProject (per-partition heap +
    * single reduce), NOT a global sort — O(k) memory per partition.
    */
  def topK(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column], k: Int): DataFrame =
    df.orderBy(orderCols: _*).limit(k)

  /** Per-group top-k via row_number window (SURVEY.md C9).
    *
    * `fanout > 1` enables the salted two-phase plan for LOW-CARDINALITY
    * groups: a row_number window partitioned by G groups sorts the whole
    * input in G tasks — with 3 groups at 100 TB that is 3 straggler tasks
    * sorting everything. Phase 1 ranks within (group, salt) — G·fanout
    * buckets, each sorting 1/fanout of its group — and keeps k rows per
    * bucket; phase 2 re-ranks the ≤ G·fanout·k survivors. The global
    * top-k per group is contained in the union of per-salt top-ks, and
    * the salt is a deterministic row hash, so the result is identical to
    * the single-phase plan whenever `orderCols` is a total order (the
    * same determinism requirement the single-phase form already has).
    */
  def topKPerGroup(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      k: Int,
      fanout: Int = 1): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
    if (fanout <= 1)
      df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
    else {
      val salted = df.withColumn("_salt", pmod(hash(df.columns.map(col): _*), lit(fanout)))
      val w1 = Window.partitionBy((partCols :+ "_salt").map(col): _*).orderBy(orderCols: _*)
      salted.withColumn("_rn1", row_number().over(w1)).where(col("_rn1") <= k)
        .drop("_salt", "_rn1")
        .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
    }
  }

  /** Slowly-changing-dimension Type 2 build from two full snapshots — the
    * warehouse-dimension history pattern (companion to `upsertLatest`
    * (Type 1) and `snapshotDiff`). Rows are compared by a fingerprint of
    * `tracked` attributes:
    *   - unchanged keys   → one open row   (valid_from = asOfOld, valid_to null)
    *   - changed keys     → closed old row (valid_to = asOfNew) + open new row
    *   - inserted keys    → open row       (valid_from = asOfNew)
    *   - deleted keys     → closed old row (valid_to = asOfNew), no successor
    *
    * Scale posture: one full-outer shuffle join on the key — the minimal
    * plan for snapshot comparison; fingerprints are computed map-side so
    * the comparison never widens the shuffle beyond the carried attribute
    * columns. At 100 TB the dimension is small next to facts; the expensive
    * variant (fact-table SCD) would swap this to an incremental
    * `snapshotDiff` feed, which this output format is closed under.
    */
  def scdType2(oldSnap: DataFrame, newSnap: DataFrame, key: String,
               tracked: Seq[String], asOfOld: String, asOfNew: String): DataFrame = {
    val fp: DataFrame => DataFrame = df =>
      df.withColumn("_fp", Portable.rowFingerprint(tracked.map(col): _*))
    val o = fp(oldSnap).select(col(key) +: col("_fp").as("_fp_o") +:
      tracked.map(c => col(c).as(s"${c}_o")): _*)
    val n = fp(newSnap).select(col(key) +: col("_fp").as("_fp_n") +:
      tracked.map(c => col(c).as(s"${c}_n")): _*)
    val j = o.join(n, Seq(key), "full_outer")

    // one row per (key, version): version 0 = the old snapshot's row when it
    // existed, version 1 = the new snapshot's row when it differs or is new
    val oldRows = j.where(col("_fp_o").isNotNull)
      .select(col(key) +:
        tracked.map(c => col(s"${c}_o").as(c)) :+
        lit(asOfOld).as("valid_from") :+
        when(col("_fp_n").isNull || col("_fp_n") =!= col("_fp_o"), lit(asOfNew))
          .otherwise(lit(null).cast("string")).as("valid_to"): _*)
    val newRows = j.where(col("_fp_n").isNotNull &&
        (col("_fp_o").isNull || col("_fp_o") =!= col("_fp_n")))
      .select(col(key) +:
        tracked.map(c => col(s"${c}_n").as(c)) :+
        lit(asOfNew).as("valid_from") :+
        lit(null).cast("string").as("valid_to"): _*)
    oldRows.unionByName(newRows)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** One-hot encoding of a categorical column against an EXPLICIT category
    * vocabulary — the feature-engineering staple. The vocabulary is a
    * caller-supplied constant (never inferred per-batch: inference would
    * make the output schema data-dependent, which breaks both streaming
    * and train/serve skew guarantees). Row-local, zero-shuffle.
    */
  def oneHot(df: DataFrame, keyCol: String, catCol: String,
             categories: Seq[String]): DataFrame =
    df.select(col(keyCol) +: categories.map(c =>
      (col(catCol) === c).cast("long").as(s"is_${c.toLowerCase}")): _*)

  /** CDC op priority for (key, version) ties: a delete beats an update
    * beats an insert at the same version. Shared by the batch kernel
    * below and the streaming CdcApplyState so both resolve ties with one
    * total order (the q_cdc_apply oracle encodes the same CASE).
    */
  def cdcOpPriority(opCol: String): Column =
    when(col(opCol) === "D", 3).when(col(opCol) === "U", 2).otherwise(1)

  /** Apply a CDC changelog (op ∈ I/U/D + monotonically increasing version)
    * to a base snapshot — the MERGE INTO / CDC-compaction kernel. The
    * latest change per key wins (row_number over version desc); a final
    * D suppresses the key, a final I/U replaces (or inserts) the payload,
    * untouched base rows pass through via anti-join. Two shuffles total
    * (change ranking + base anti-join), both on the key — the plan a
    * lakehouse MERGE executes.
    */
  def cdcApply(base: DataFrame, changes: DataFrame, key: String,
               opCol: String, versionCol: String, payload: Seq[String]): DataFrame = {
    // Explicit op-priority tie-break on equal versions (D > U > I):
    // version alone leaves row_number nondeterministic on duplicate
    // (key, version) pairs. The priority is spelled out as a CASE rather
    // than ordering on the op string (whose descending collation is
    // U > I > D — the OPPOSITE policy), and it is the same total order
    // the streaming twin (CdcApplyState) and the DuckDB oracle use.
    val w = Window.partitionBy(key)
      .orderBy(col(versionCol).desc, cdcOpPriority(opCol).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
    val upserts = latest.where(col(opCol) =!= "D")
      .select(col(key) +: payload.map(col): _*)
    base.join(latest.select(key), Seq(key), "left_anti")
      .select(col(key) +: payload.map(col): _*)
      .unionByName(upserts)
  }

  /** Unordered distinct within-basket item pairs: one row (item_a <
    * item_b) per basket containing both. ONE scan of the fact table and
    * ONE shuffle (the basket groupBy; collect_set dedups in the agg) —
    * the equi-self-join formulation reads the fact table twice and pays a
    * distinct-shuffle before the join, which at 100 TB means an extra
    * full-corpus scan and exchange for the same pair stream. Per-basket
    * fan-out is C(k, 2) either way and baskets are small by domain
    * construction (TPC-H orders carry ≤ 7 lines); the basket item set is
    * held in one aggregation buffer, fine at catalog-bounded basket
    * sizes (a million-item basket would blow up ANY pairwise expansion).
    */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String): DataFrame =
    df.groupBy(col(basketCol))
      .agg(sort_array(collect_set(col(itemCol))).as("_its"))
      .where(size(col("_its")) > 1)
      .select(explode(flatten(transform(col("_its"), (x, i) =>
        transform(slice(col("_its"), i + lit(2), size(col("_its")) - i - lit(1)),
          y => struct(x.as("item_a"), y.as("item_b")))))).as("_p"))
      .select(col("_p.item_a").as("item_a"), col("_p.item_b").as("item_b"))

  /** Unordered distinct within-basket item TRIPLES — the next level of
    * the A-priori lattice over the same single-scan basket expansion as
    * [[basketPairs]] (item_a < item_b < item_c from the sorted distinct
    * item array; three nested tail-slices, flattened). Per-basket
    * fan-out is C(k, 3) — bounded by the same catalog-bounded basket
    * sizes that bound the pair kernel (TPC-H orders carry ≤ 7 lines →
    * ≤ 35 triple rows per basket); ONE fact scan, ONE shuffle.
    */
  def basketTriples(df: DataFrame, basketCol: String, itemCol: String): DataFrame =
    triplesFromBaskets(
      df.groupBy(col(basketCol))
        .agg(sort_array(collect_set(col(itemCol))).as("_its")), "_its")

  /** [[basketTriples]]' expansion over a PRE-AGGREGATED basket item-array
    * frame (sorted distinct items per basket — the
    * [[graft.sources.PairStore.ensureBaskets]] artifact schema): the
    * corpus-sized fact scan + set aggregation was paid at the artifact
    * write, so lattice consumers explode a basket-count-sized table.
    */
  def triplesFromBaskets(baskets: DataFrame, itemsCol: String): DataFrame =
    baskets
      .where(size(col(itemsCol)) > 2)
      .select(explode(flatten(flatten(transform(col(itemsCol), (x, i) =>
        transform(slice(col(itemsCol), i + lit(2), size(col(itemsCol)) - i - lit(1)), (y, jj) =>
          transform(slice(col(itemsCol), i + jj + lit(3), size(col(itemsCol)) - i - jj - lit(2)),
            z => struct(x.as("item_a"), y.as("item_b"), z.as("item_c")))))))).as("_t"))
      .select(col("_t.item_a").as("item_a"), col("_t.item_b").as("item_b"),
        col("_t.item_c").as("item_c"))

  /** Top-k frequent 3-itemsets: triple support counted across baskets,
    * ranked like [[coOccurrence]] (TakeOrderedAndProject heap, rank
    * window only over the k survivors). Completes the market-basket
    * suite: pairs (C82) → rules (C128) → triples; anti-monotonicity
    * against the pair supports is spec-proven (every frequent triple's
    * three constituent pairs support ≥ the triple's).
    */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String, k: Int): DataFrame =
    rankTriples(basketTriples(df, basketCol, itemCol), k)

  /** [[frequentTriples]] over the persisted basket artifact — zero fact
    * scans per run (the q_cooccur/PairStore lifecycle applied one lattice
    * level up).
    */
  def frequentTriplesFromBaskets(baskets: DataFrame, itemsCol: String, k: Int): DataFrame =
    rankTriples(triplesFromBaskets(baskets, itemsCol), k)

  private def rankTriples(triples: DataFrame, k: Int): DataFrame = {
    val w = Portable.kRowWindow(col("support").desc,
      col("item_a").asc, col("item_b").asc, col("item_c").asc)
    triples
      .groupBy("item_a", "item_b", "item_c").agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc,
        col("item_a").asc, col("item_b").asc, col("item_c").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "item_a", "item_b", "item_c", "support")
  }

  /** Market-basket co-occurrence: pairs of items appearing in the same
    * basket, support counted across baskets, top `k` pairs. Pair
    * generation is the single-scan basket expansion of [[basketPairs]];
    * support counting is one hash aggregate on the pair key; the final
    * rank window runs over the aggregated pair table (|distinct pairs|,
    * not |baskets|).
    */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String, k: Int): DataFrame = {
    // TakeOrderedAndProject keeps the top k (per-partition heap + merge,
    // no global sort); the rank window then orders only the k survivors —
    // never rank the full pair table through a one-partition window.
    val w = Portable.kRowWindow(col("support").desc, col("item_a").asc, col("item_b").asc)
    basketPairs(df, basketCol, itemCol)
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("item_a").asc, col("item_b").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "item_a", "item_b", "support")
  }

  /** Incremental maintenance of the basket-pair support table — the
    * C45/C113 delta-merge pattern applied to [[graft.sources.PairStore]]
    * (r12; the artifact was write-once-per-corpus before, so any fact
    * growth forced a FULL rebuild: a whole-corpus scan + basket explode
    * for a delta that touched a sliver of baskets).
    *
    * Append-only delta semantics: `deltaFacts` holds newly-arrived fact
    * rows; a basket spanning base and delta cannot have its new pairs
    * derived from the delta alone (pairs mix old and new items), so the
    * kernel re-derives pairs for TOUCHED baskets only, from the union of
    * that basket's base and delta rows, and merges signed support deltas
    * into the base table:
    *
    *   pairs_full = pairs_base − pairs(base rows of touched baskets)
    *                           + pairs(all rows of touched baskets)
    *
    * Per-basket the old pair set is contained in the new one (items only
    * accrue), so no support ever goes negative; the >0 guard is defense
    * for callers feeding corrections. Cost at 100 TB: the touched-basket
    * restriction is a semi-join on the basket key (broadcastable for a
    * daily delta; partition-prunable when facts are clustered by basket
    * ranges), the pair re-derivation explodes only touched baskets, and
    * the final merge is one sum-groupBy over base-pairs ∪ signed-deltas
    * — the corpus-sized fact scan the full rebuild pays never happens.
    * Merge ≡ full-rebuild equality is spec-proven (Round10OpsSpec-style
    * hash identity in PairStoreSpec).
    */
  def mergeBasketPairSupports(basePairs: DataFrame, baseFacts: DataFrame,
                              deltaFacts: DataFrame,
                              basketCol: String, itemCol: String): DataFrame = {
    val touched = deltaFacts.select(col(basketCol)).distinct()
    val baseTouched = baseFacts.select(col(basketCol), col(itemCol))
      .join(touched, Seq(basketCol), "left_semi")
    val removed = basketPairs(baseTouched, basketCol, itemCol)
      .groupBy("item_a", "item_b").agg((-count(lit(1))).as("support"))
    val added = basketPairs(
        baseTouched.unionByName(deltaFacts.select(col(basketCol), col(itemCol))),
        basketCol, itemCol)
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
    basePairs.unionByName(removed).unionByName(added)
      .groupBy("item_a", "item_b").agg(sum("support").as("support"))
      .where(col("support") > 0)
  }

  /** Association rules from the persisted pair-support and item-count
    * artifacts ([[graft.sources.PairStore]]): for the top `k` supported
    * unordered pairs, both directed rules antecedent→consequent with
    *   confidence = support / cnt(antecedent)
    *   lift       = N · support / (cnt(antecedent) · cnt(consequent))
    * (N = total baskets). Standard Agrawal-Srikant rule metrics restated
    * over pre-aggregated supports — at 100 TB the corpus-sized work
    * (fact scan, basket explode, pair agg, item counts) was paid ONCE at
    * the artifact writes; the per-run plan is a TakeOrderedAndProject
    * heap over the pair table plus two joins that BROADCAST the 2k-row
    * rule side into streamed scans of the catalog-sized item table —
    * never the reverse (an item catalog at corpus scale is not
    * broadcastable; 2k rules always are). The count product is computed
    * in double (counts can reach corpus cardinality; a long·long product
    * would overflow before the division rescales it).
    *
    * `pairs` is (item_a, item_b, support); `itemCounts` is (item,
    * basket_cnt, n_baskets). Output: rank, antecedent, consequent,
    * support, confidence, lift — ordered by (support desc, antecedent,
    * consequent), a total order since each unordered pair contributes
    * two distinct directed rules.
    */
  def assocRules(pairs: DataFrame, itemCounts: DataFrame, k: Int): DataFrame = {
    val top = pairs
      .orderBy(col("support").desc, col("item_a").asc, col("item_b").asc).limit(k)
    // Both directions explode out of ONE top-k pass: a union of two
    // selects over `top` would plan TWO scans of the pair artifact and
    // TWO TakeOrderedAndProject heaps — at corpus scale that doubles
    // the dominant cost of the whole query (observed in the r12 plan
    // audit before this rework).
    val rules = top.select(col("support"), explode(array(
        struct(col("item_a").as("antecedent"), col("item_b").as("consequent")),
        struct(col("item_b").as("antecedent"), col("item_a").as("consequent")))).as("r"))
      .select(col("r.antecedent").as("antecedent"),
        col("r.consequent").as("consequent"), col("support"))
    val withA = itemCounts
      .select(col("item").as("antecedent"), col("basket_cnt").as("cnt_a"), col("n_baskets"))
      .join(broadcast(rules), Seq("antecedent"))
    val withAB = itemCounts
      .select(col("item").as("consequent"), col("basket_cnt").as("cnt_b"))
      .join(broadcast(withA), Seq("consequent"))
    val w = Portable.kRowWindow(col("support").desc, col("antecedent").asc, col("consequent").asc)
    withAB
      .withColumn("confidence", round(col("support").cast("double") / col("cnt_a"), 9))
      .withColumn("lift", round(
        col("support").cast("double") * col("n_baskets") /
          (col("cnt_a").cast("double") * col("cnt_b")), 9))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "antecedent", "consequent", "support", "confidence", "lift")
  }

  /** Block-hash reconciliation — snapshotDiff's cross-datacenter twin.
    *
    * Comparing two 100 TB replicas row-by-row means shipping one of them
    * over the wire; the anti-entropy pattern (Dynamo/Cassandra Merkle
    * repair, rsync) first exchanges O(nBlocks) per-block digests, then
    * diffs ONLY the rows whose block digests disagree. Each side computes
    * (count, sum, xor) of a portable row hash per key-hash block — one
    * map-side-combined aggregate, a few KB of digest rows to move — and
    * the full-fidelity diff runs on the semi-joined mismatched blocks
    * alone. A differing row can only escape if count AND sum AND xor all
    * collide simultaneously; the oracle for q_block_diff is the
    * brute-force FULL diff, so losslessness on the test corpus is
    * hash-proven end to end.
    *
    * Output schema matches snapshotDiff plus the owning `block` id.
    */
  def blockDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                compareCols: Seq[String], nBlocks: Int): DataFrame = {
    def keyed(df: DataFrame): DataFrame =
      df.select((keys ++ compareCols).map(col): _*)
        .withColumn("block",
          pmod(Portable.hash32(concat_ws("|", keys.map(col): _*)), lit(nBlocks.toLong)))
        .withColumn("_rowhash", Portable.hash32(concat(
          (keys ++ compareCols).map { c =>
            // Length-prefixed, null-tagged encoding: concat_ws would skip
            // NULLs and let values containing the delimiter alias across
            // columns ((null,'x') vs ('x',null), 'a|b' vs 'a','b' —
            // ADVICE r7), making digest collisions structural rather than
            // 1-in-2^32. "len:value|" (with NULL as "N|") decodes
            // unambiguously, so distinct rows produce distinct encodings.
            val s = col(c).cast("string")
            when(s.isNull, lit("N|"))
              .otherwise(concat(length(s).cast("string"), lit(":"), s, lit("|")))
          }: _*)))
    def digest(df: DataFrame, tag: String): DataFrame =
      df.groupBy("block").agg(
        count(lit(1)).as(s"${tag}_rows"),
        sum("_rowhash").as(s"${tag}_sum"),
        expr("bit_xor(_rowhash)").as(s"${tag}_xor"))
    val o = keyed(oldDf)
    val n = keyed(newDf)
    val bad = digest(o, "o").join(digest(n, "n"), Seq("block"), "full_outer")
      .where(!(col("o_rows") <=> col("n_rows")) ||
             !(col("o_sum") <=> col("n_sum")) ||
             !(col("o_xor") <=> col("n_xor")))
      .select("block")
    snapshotDiff(
        o.join(bad, Seq("block"), "left_semi").drop("_rowhash"),
        n.join(bad, Seq("block"), "left_semi").drop("_rowhash"),
        keys :+ "block", compareCols)
  }

  /** Bradley–Terry preference-strength fit by Hunter's MM iterations
    * (Hunter 2004) — the pairwise-preference model modern data pipelines
    * fit constantly (reward-model data curation, ranker comparison,
    * vendor/supplier quality): from a (winner, loser) comparison log,
    * strength π with P(i beats j) = π_i/(π_i + π_j), via the fixed-point
    * update π_i ← W_i / Σ_j m_ij/(π_i + π_j) (m_ij = comparisons between
    * i and j, W_i = i's wins), normalized to Σπ = 1 each round. A FIXED
    * iteration count keeps the fit deterministic and oracle-expressible
    * as unrolled CTE rounds (the q_label_prop convention; MM converges
    * monotonically, so a fixed budget is a principled truncation).
    *
    * Every round is one decimal-sum aggregate over the pair matrix with
    * the π catalog attached through two driver-built broadcast
    * relations (r21): the comparison matrix is catalog²-bounded and
    * stays distributed; the π state is PLAYER-CATALOG-sized and lives
    * in a driver map between rounds (the C135/C317 sanctioned
    * model-sized read — one (p, den) collect per round). Per-term
    * divisions and the normalization run on bit-identical doubles,
    * partials decimal-summed (the driver normalizer replays
    * Portable.decSum via [[Portable.decSum12Local]]) — every row
    * hash-checks. Players with zero wins land at strength 0 (the BT
    * MLE's boundary case — documented, not hidden); losses = total
    * comparisons − wins off the same matrix.
    */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String, loserCol: String,
                   iters: Int): DataFrame =
    bradleyTerryFromPairs(
      comparisons.groupBy(col(winnerCol).as("i"), col(loserCol).as("j"))
        .agg(count(lit(1)).as("n")),
      "i", "j", iters)

  /** The MM fit over a PRE-AGGREGATED (winner, loser, n) win-count
    * table — the production entry point: the comparison log is
    * corpus-static, so its rollup persists once
    * ([[graft.sources.PairStore.ensureBtWins]]) and the fit reads a
    * catalog²-bounded parquet instead of re-scanning the fact table.
    */
  def bradleyTerryFromPairs(pairCounts: DataFrame, winnerCol: String,
                            loserCol: String, iters: Int): DataFrame = {
    require(iters > 0, "need at least one MM iteration")
    val pairs = pairCounts
      .select(col(winnerCol).as("i"), col(loserCol).as("j"), col("n"))
      .localCheckpoint(true)
    val sym = pairs.select(col("i"), col("j"), col("n"))
      .unionByName(pairs.select(col("j").as("i"), col("i").as("j"), col("n")))
      .groupBy("i", "j").agg(sum("n").as("m"))
      .localCheckpoint(true)
    val wins = pairs.groupBy(col("i").as("p")).agg(sum("n").as("_w"))
    val totals = sym.groupBy(col("i").as("p")).agg(sum("m").as("_tot"))
    val players = totals.select(col("p"), col("_tot"))
      .join(wins.hint("SHUFFLE_HASH"), Seq("p"), "left")
      .select(col("p"), coalesce(col("_w"), lit(0L)).as("_w"), col("_tot"))
      .localCheckpoint(true)
    // r21 optimization (guide §2.4 / the C317 literal-map convention):
    // π is PLAYER-CATALOG-sized and changes every round — exactly the
    // shape whose per-round broadcast-join + eager-checkpoint loop paid
    // 2 broadcasts, 2 joins and a materialization job per iteration for
    // values two driver-built broadcast relations attach in place. The
    // state now lives in a driver map (the C135/C317 catalog-bounded
    // read: one (p, den) collect per round, ≤ |players| doubles); each
    // round is ONE job — the sym → groupBy(i) decimal aggregate with
    // both π sides broadcast from LOCAL relations (no build job, no
    // lineage chain, no checkpoint). Update arithmetic is replayed
    // EXACTLY: w/den and π/norm are the same double divisions, and the
    // normalizer replicates Portable.decSum(_, 12) term for term —
    // java BigDecimal.valueOf(x).setScale(12, HALF_UP) is the same
    // snapshot Spark's double→decimal(28,12) cast performs, summed
    // exactly (the plattScaling round6 replication precedent); non-
    // finite terms drop, as the cast's null does. π_i values are
    // bit-identical round for round, so the committed hashes stand.
    // Player keys keep their ORIGINAL type (long supplier keys here,
    // strings in the referee spec): driver state is keyed on the raw
    // row value, and the π frames are LocalRelations built with the
    // players frame's own key DataType, so no cast ever touches the
    // join keys or the output schema.
    val pType = players.schema.fields(0).dataType
    val playerRows = players.collect()
      .map(r => (r.get(0),
        r.get(1).asInstanceOf[Number].longValue,
        r.get(2).asInstanceOf[Number].longValue))
    var pi: Map[Any, Double] = playerRows.map { case (p, _, _) => (p, 1.0d) }.toMap
    val piOrder = playerRows.map(_._1) // stable driver-side order
    val spark0 = pairCounts.sparkSession
    def piFrameOf(m: Map[Any, Double], key: String, v: String): DataFrame =
      spark0.createDataFrame(
        java.util.Arrays.asList(piOrder.filter(m.contains).map(p =>
          org.apache.spark.sql.Row(p, m(p))): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(key, pType),
          org.apache.spark.sql.types.StructField(v,
            org.apache.spark.sql.types.DoubleType))))
    for (_ <- 1 to iters) {
      // π attaches through two BROADCAST joins of driver-built local
      // relations (no Spark job to build them — LocalTableScan
      // broadcasts assemble on the driver thread) with hash-map lookup
      // per row; a literal-map element_at was measured 4× more task
      // time here (GetMapValue linear-scans its 1000 entries per row)
      val den = sym
        .join(broadcast(piFrameOf(pi, "i", "_pa")), Seq("i"))
        .join(broadcast(piFrameOf(pi, "j", "_pb")), Seq("j"))
        .groupBy(col("i").as("p"))
        .agg(graft.ops.Portable.decSum(
          col("m").cast("double") / (col("_pa") + col("_pb")), 12)
          .as("_den"))
        // a NULL den (all of a player's terms non-finite — unreachable
        // while π starts at 1, but the old join degraded gracefully
        // there, so the collect must too, not throw on getDouble(null))
        .collect().filter(!_.isNullAt(1))
        .map(r => (r.get(0), r.getDouble(1))).toMap
      val u = playerRows.flatMap { case (p, w, _) =>
        den.get(p).map(d => (p, w.toDouble / d))
      }
      // the shared decSum(_, 12) replica (Portable.decSum12Local);
      // empty ⇔ the engine aggregate's NULL — keep π unchanged then.
      // (ADVICE r21 item 6, adjudicated r22: the pre-r21 in-engine plan
      // null-poisoned every strength when norm was NULL; keeping the
      // previous π is the deliberate divergence — the case is provably
      // unreachable (π starts at 1 and stays positive-finite, so every
      // u-term is finite), and IF a future input ever hit it, frozen
      // strengths degrade gracefully where null-poisoning destroyed the
      // whole read-out. The oracle replays the same guarded fold, so
      // parity holds on every reachable input.)
      val norm = graft.ops.Portable.decSum12Local(u.iterator.map(_._2))
      pi = norm.fold(pi)(n => u.map { case (p, v) => (p, v / n) }.toMap)
    }
    players.join(broadcast(piFrameOf(pi, "p", "_pi")), Seq("p"))
      .select(col("p"), col("_w").as("wins"),
        (col("_tot") - col("_w")).as("losses"),
        graft.ops.Portable.pround(col("_pi"), 6).as("strength"))
  }
}
