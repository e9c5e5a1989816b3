package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is declared here as a named query over
  * the driver test tables (TESTDATA.md), each with a deterministic final
  * ORDER BY on a unique key, and (where SQL-expressible) a DuckDB oracle in
  * `oracleSql` computing the identical result — identical column names,
  * identical null/rounding/division semantics (see graft.ops.Portable).
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape, SURVEY.md C5) on sf=0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_groupby_agg")(spark, "/root/testdata/sf0.001")

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Stopword-ratio score frame shared by the calibration-family queries
    * (q_auc / q_calibration / q_brier / q_stump): one deterministic
    * [0,1] score per doc — an exact ratio of integer counts, so the
    * value catalog is identical in both engines — plus the requested
    * label columns.
    */
  private def stopwordScored(s: SparkSession, dir: String, cols: Column*): DataFrame = {
    val t = TextOps.tokens(col("text"))
    T(s, dir, "documents")
      .select(cols :+
        (size(filter(t, x => x.isin(TextOps.Stopwords: _*))).cast("double")
          / size(t).cast("double")).as("_score"): _*)
      .where(size(t) > 0)
  }

  /** Query-term set for q_bm25 — shared by the Spark query and its oracle. */
  private val Bm25Terms = Seq("spark", "window", "merge")

  /** Shared boilerplate preamble planted on every document for
    * q_cdc_chunks (the q_dedup_lines planting convention — corpus texts
    * carry no natural cross-doc byte-identical regions, so the classic
    * license-header case is constructed and oracle-replicated).
    */
  private val CdcHeader =
    "SHARED-LICENSE-HEADER every document in this corpus carries this exact " +
    "boilerplate preamble before its own body text begins here. "

  /** Probe tokens for q_cm_estimate — shared by the Spark query and its
    * oracle; the last one is absent from any corpus (never-seen path).
    */
  private val CmProbes = Seq("data", "quality", "the", "zz_absent_probe")

  /** CmProbes rendered as a SQL VALUES list — interpolated into the
    * q_cm_estimate oracle so ONE definition drives both engines.
    */
  private val CmProbesSqlValues = CmProbes.map(t => s"('$t')").mkString(", ")

  /** Planted HTML chrome for q_html_extract — corpus texts carry no
    * markup, so the classic crawl page (head+script, nav bar, article
    * body, share bar, footer) is constructed around each text and
    * oracle-replicated (the C123 PNG-planting convention). ONE
    * definition drives both engines.
    */
  private val HtmlHead = "<html><head><title>Doc "
  private val HtmlHeadTail = "</title><script type=\"text/javascript\">" +
    "var track = 1; emit(track);</script></head>"
  private val HtmlNav = "<nav><a href=\"/\">Home</a> | " +
    "<a href=\"/about\">About</a> | <a href=\"/contact\">Contact</a></nav>"
  private val HtmlShare = "<div class=\"share\"><a href=\"#s\">Share</a> " +
    "<a href=\"#t\">Tweet</a> <a href=\"#l\">Like</a></div>"
  private val HtmlFooter =
    "<footer>Copyright 2020 Example Inc All Rights Reserved</footer>"

  /** q_url_filter planting: one URL per doc from a 5-domain rotation
    * (keyed doc_id % 5) + a 3-rule category blocklist. The rotation
    * exercises: a subdomain hitting a registrable-suffix rule
    * (ads.example.com → example.com), a second category
    * (cdn.tracker.net → tracker.net), a clean domain, the
    * embedded-substring NEGATIVE case (example.com.evil.io contains
    * "example.com" but no dot-suffix equals it → clean), and a rule
    * that matches nothing. ONE definition drives both engines.
    */
  private val UrlPlantDomains = Seq("ads.example.com", "cdn.tracker.net",
    "news.site.io", "example.com.evil.io", "docs.python.org")
  private val UrlBlocklist = Seq("example.com" -> "ads",
    "tracker.net" -> "tracking", "badsite.org" -> "malware")
  private val UrlPlantSqlList =
    UrlPlantDomains.map(d => s"'$d'").mkString("[", ", ", "]")
  private val UrlBlocklistSqlValues =
    UrlBlocklist.map { case (s, c) => s"('$s', '$c')" }.mkString(", ")

  /** Exactly 20 tokens — one full span for q_dedup_paragraph's planted
    * boilerplate (span = 20), shared verbatim by query and oracle.
    */
  private val ParaBoiler =
    "terms of service all rights reserved this content is provided as is without warranty of any kind please read carefully"

  // Insertion-ordered (SeqMap): the bench and Verify iterate this map, so
  // a stable declaration order makes per-query timings comparable across
  // rounds and guarantees that session-memoized artifacts (the SimHash
  // near-dup edge stage, the IVF centroids) are paid for by the query that
  // owns them — q_simhash_neardup runs before its two consumers.
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = scala.collection.immutable.SeqMap(
    // ── scans / projections / filters (SURVEY §2.1-2.2) ────────────────
    // NOTE: (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    // (l_orderkey, l_linenumber, l_partkey, l_suppkey) is. Row-level
    // lineitem queries order (and where needed project) the full unique key
    // so results are deterministic at any parallelism.
    "q_scan" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    "q_project" -> ((s, dir) =>
      Relational.scanProject(T(s, dir, "orders"), Seq("o_orderkey", "o_totalprice"))
        .orderBy("o_orderkey")),

    "q_filter_null" -> ((s, dir) => {
      // quality-check analog of etl.py:167: nulls introduced by a left join
      val dim = T(s, dir, "customer").where(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      Relational.factDimLeftJoin(T(s, dir, "orders"), dim, "o_custkey")
        .where(col("c_name").isNull)
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    }),

    "q_hash_sample" -> ((s, dir) =>
      Relational.hashSample(
          T(s, dir, "orders").select("o_orderkey", "o_totalprice"), "o_orderkey", 0.1)
        .orderBy("o_orderkey")),

    // Stratified deterministic sample: per-status rates over the same
    // md5-bucket rule — the "oversample rare strata" split recipe.
    "q_hash_sample_by" -> ((s, dir) =>
      Relational.hashSampleBy(
          T(s, dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice"),
          "o_orderkey", "o_orderstatus",
          Map("O" -> 0.05, "F" -> 0.2, "P" -> 0.5))
        .orderBy("o_orderkey")),

    // Deterministic stratum-free train/val/test assignment on the same
    // md5-bucket rule as q_hash_sample: a document's split is a pure
    // function of its key — reproducible and stable under corpus growth.
    "q_split_assign" -> ((s, dir) =>
      Relational.splitAssign(
          T(s, dir, "documents").select("doc_id", "source"),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")),

    "q_quality_check" -> ((s, dir) =>
      Relational.qualityCheck(T(s, dir, "orders"),
          Seq("o_orderstatus", "o_orderpriority"), "o_orderstatus <> 'O'")
        .orderBy("o_orderstatus", "o_orderpriority")),

    "q_distinct" -> ((s, dir) =>
      T(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // ── set ops (SURVEY §2.8) ──────────────────────────────────────────
    "q_union" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_name").as("name"), lit("customer").as("src"))
      val p = T(s, dir, "supplier").select(col("s_name").as("name"), lit("supplier").as("src"))
      c.unionByName(p).orderBy("name", "src")
    }),

    "q_except" -> ((s, dir) =>
      T(s, dir, "nation").select("n_nationkey")
        .except(T(s, dir, "supplier").select(col("s_nationkey").as("n_nationkey")))
        .orderBy("n_nationkey")),

    "q_intersect" -> ((s, dir) =>
      T(s, dir, "customer").select("c_nationkey")
        .intersect(T(s, dir, "supplier").select(col("s_nationkey").as("c_nationkey")))
        .orderBy("c_nationkey")),

    // ── joins (SURVEY §2.4) ────────────────────────────────────────────
    "q_join_left" -> ((s, dir) =>
      Relational.factDimLeftJoin(
          T(s, dir, "orders").withColumnRenamed("o_custkey", "c_custkey"),
          T(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment"),
          "c_custkey")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")),

    "q_join_inner2" -> ((s, dir) => {
      val big = T(s, dir, "lineitem")
        .where(col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      Relational.compositeInnerJoin(
          T(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"),
          big, Seq("l_orderkey", "l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    }),

    // Skew-salted join: results must be IDENTICAL to the plain equi-join —
    // the oracle is the plain join, so the equivalence is hash-checked.
    "q_join_salted" -> ((s, dir) =>
      Relational.saltedJoin(
          T(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"),
          T(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
          Seq("l_orderkey"), nSalts = 8)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // 3-table star join (TPC-H Q3 shape): the reference's own analytical
    // contract (README.md:175-176 derivative ↔ underlying ↔ product-spec)
    // is a 3-way star. Filtered customer (≈1/5 of a small dim) broadcasts
    // into orders; the orders×lineitem join shuffles on the orderkey; the
    // revenue agg reuses that partitioning (groupBy key starts with
    // l_orderkey — no extra exchange); top-10 is TakeOrderedAndProject.
    "q_join_star" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = T(s, dir, "orders")
        .where(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      T(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1997-07-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(Portable.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // 5-table join (TPC-H Q5 shape): revenue per nation for ASIA customers
    // served by a same-nation supplier. The three dimension tables
    // (region→nation, supplier) broadcast; the two fact joins
    // (lineitem⋈orders, ⋈customer) shuffle. Exercises multi-join ordering
    // with mixed broadcast/shuffle strategies under AQE.
    "q_join_q5" -> ((s, dir) => {
      val nat = T(s, dir, "nation")
        .join(broadcast(T(s, dir, "region").where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = T(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
      val ord = T(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      T(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(Portable.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
        .orderBy("n_name")
    }),

    // Bucketed co-located join (the highest-value repeated-join
    // optimization at 100 TB): lineitem and orders are materialized ONCE
    // as tables bucketed (and sorted) on the order key, then the join AND
    // the per-order aggregation both run with zero hash-partition
    // exchanges — Spark pairs matching buckets directly and the groupBy
    // reuses the same clustering. Results must be IDENTICAL to the plain
    // join, so the oracle is the plain join (the q_join_salted trick) and
    // the zero-shuffle claim is asserted in PlanInvariantsSpec.
    "q_join_bucketed" -> ((s, dir) => {
      val li = sources.BucketedTables.ensureBucketed(s, dir, "lineitem",
        Seq("l_orderkey"), 8, Seq("l_orderkey", "l_quantity", "l_extendedprice"))
      val ord = sources.BucketedTables.ensureBucketed(s, dir, "orders",
        Seq("o_orderkey"), 8, Seq("o_orderkey", "o_totalprice"))
      sources.BucketedTables.readBucketed(s, li)
        .join(sources.BucketedTables.readBucketed(s, ord),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
          count(lit(1)).as("n_items"),
          Portable.decSum(col("l_quantity")).as("sum_qty"),
          Portable.decSum(col("l_extendedprice")).as("sum_price"),
          max(col("o_totalprice")).as("o_totalprice"))
        .orderBy("l_orderkey")
    }),

    "q_join_semi" -> ((s, dir) =>
      Relational.semiJoin(
          T(s, dir, "orders").select("o_orderkey", "o_totalprice"),
          T(s, dir, "lineitem").where(col("l_quantity") > 45)
            .select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"))
        .orderBy("o_orderkey")),

    "q_join_anti" -> ((s, dir) =>
      Relational.antiJoin(
          T(s, dir, "orders").select("o_orderkey", "o_totalprice"),
          T(s, dir, "lineitem").where(col("l_quantity") > 45)
            .select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"))
        .orderBy("o_orderkey")),

    // Scalar-subquery threshold (TPC-H Q11 shape): per-part revenue kept
    // only when above the average per-part share of the GLOBAL revenue —
    // relative, so the predicate stays selective at every scale factor (a
    // fixed fraction goes empty as the part count grows). The global
    // total is a 1-row aggregate broadcast back over the per-part rows —
    // the canonical two-level aggregate that never re-scans the fact
    // table. Both levels sum in exact decimal so the threshold comparison
    // is bit-identical on both engines.
    "q_scalar_subquery" -> ((s, dir) => {
      val rev = T(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(Portable.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("part_value"))
      val tot = rev.agg(Portable.decSum(col("part_value"), 6).as("total"),
        count(lit(1)).as("n_parts"))
      rev.crossJoin(broadcast(tot))
        .where(col("part_value") > col("total") / col("n_parts"))
        .select(col("l_partkey"), col("part_value"))
        .orderBy("l_partkey")
    }),

    // Correlated EXISTS (TPC-H Q4 shape): orders with at least one line
    // item shipped after the order date, counted by priority. The
    // non-equi correlation rides on the equi-key semi join, so the plan
    // stays a hash join with an extra residual predicate.
    "q_exists_join" -> ((s, dir) =>
      T(s, dir, "orders")
        .join(T(s, dir, "lineitem").select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    // Scalar subquery + NOT EXISTS (TPC-H Q22 shape): lapsed high-balance
    // customers — richer than the average positive balance, no order since
    // 2000 — rolled up per nation. Average is exact-decimal-sum / count
    // (order-free), the anti join carries only the key column of the
    // date-filtered orders.
    "q_not_exists" -> ((s, dir) => {
      val avgBal = T(s, dir, "customer").where(col("c_acctbal") > 0.0)
        .agg(Portable.decAvg(col("c_acctbal"), 4).as("avg_bal"))
      T(s, dir, "customer")
        .crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(T(s, dir, "orders")
            .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), Portable.decSum(col("c_acctbal"), 4).as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // Two-level distribution (TPC-H Q13 shape): orders-per-customer via
    // LEFT join (zero-order customers count with c_count = 0), then the
    // distribution of those counts — an aggregate OF an aggregate, the
    // shape that forces two shuffles and nothing more.
    "q_cust_dist" -> ((s, dir) => {
      val perCust = T(s, dir, "customer").select("c_custkey")
        .join(T(s, dir, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_custkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Join + NOT IN + HAVING on a distinct count (TPC-H Q16 shape):
    // distinct suppliers per brand over non-PROMO parts, excluding
    // "complaint" suppliers (negative balance) via an anti join on the
    // broadcastable exclusion list.
    "q_group_having" -> ((s, dir) =>
      T(s, dir, "part").where(col("p_type") =!= "PROMO")
        .select("p_partkey", "p_brand")
        .join(T(s, dir, "lineitem").select("l_partkey", "l_suppkey"),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(T(s, dir, "supplier").where(col("s_acctbal") < 0.0)
          .select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .where(col("supplier_cnt") >= 2)
        .orderBy(col("supplier_cnt").desc, col("p_brand"))),

    // Correlated-min supplier selection (TPC-H Q2 shape, adapted: the
    // test schema has no partsupp, so the part-supplier offer relation is
    // lineitem and the cost is the effective unit price
    // l_extendedprice / l_quantity — one IEEE division, bit-identical in
    // both engines, safe to compare and join on). ALL suppliers achieving
    // the per-part minimum survive (ties included — the defining Q2
    // semantics, not an argmin cut); presentation is richest-supplier
    // first. Scale shape: the per-part min is ONE hash aggregate over the
    // projected fact columns joined back on (partkey, price-equality) —
    // the min frame is part-sized, so the join broadcasts; dims broadcast.
    "q_min_cost_supplier" -> ((s, dir) => {
      val offers = T(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      offers
        .withColumn("min_price",
          min(col("unit_price")).over(Window.partitionBy(col("l_partkey"))))
        .where(col("unit_price") === col("min_price"))
        .dropDuplicates("l_partkey", "l_suppkey")
        .join(broadcast(T(s, dir, "part")
          .where(col("p_type") === "LARGE").select("p_partkey", "p_name")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(T(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("min_price").as("unit_price"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"), col("s_suppkey"))
        .limit(100)
    }),

    // Pure scan-aggregate (TPC-H Q6 shape): the forecast-revenue-change
    // query — a one-row answer whose entire cost is the scan, so the
    // plan IS the efficiency statement: every predicate (year range,
    // discount band, quantity cap) pushes to the parquet reader and only
    // two columns are decoded. Sum in exact decimal (order-free).
    "q_forecast_revenue" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
        .agg(Portable.decSum(col("l_extendedprice") * col("l_discount"), 6)
          .as("revenue"),
          count(lit(1)).as("n_lines"))),

    // Product-profit rollup (TPC-H Q9 shape, adapted: no partsupp, so
    // supply cost is modeled as 60% of the part's retail price — a fixed
    // literal both engines multiply identically). LIKE-filtered part dim,
    // supplier→nation for the grouping country, order year from the
    // orders join: the 5-table profit cube grouped by (nation, year).
    // Dims broadcast; the fact shuffles ONCE for the final aggregate.
    "q_product_profit" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .join(broadcast(T(s, dir, "part").where(col("p_name").like("%widget%"))
          .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(T(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(T(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(Portable.decSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            lit(0.6) * col("p_retailprice") * col("l_quantity"), 6).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)),

    // Returned-item top customers (TPC-H Q10 shape): revenue lost to
    // returns in one quarter, per customer, top 20. The fact side is
    // filter-pruned before its single shuffle; customer and nation
    // broadcast; the cut is TakeOrderedAndProject, never a global sort.
    "q_returned_topk" -> ((s, dir) =>
      T(s, dir, "lineitem").where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(T(s, dir, "orders")
          .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(T(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(Portable.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)),

    // Late-shipment priority split (TPC-H Q12 shape, adapted: the test
    // schema has no l_shipmode, so the grouping column is l_linestatus
    // and "late" means shipped after the order date + 60 days). The
    // CASE-counted high/low priority split rides the join — one
    // conditional aggregate, no second pass.
    "q_shipmode_priority" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")),

    // Promotion-revenue share (TPC-H Q14 shape): the fraction of one
    // month's revenue that came from PROMO parts — a conditional ratio
    // aggregate over the part join. Both sums exact decimal; the single
    // division and scale-up are the only float steps (unsigned — bare
    // round per the Portable contract).
    "q_promo_share" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(broadcast(T(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          Portable.decSum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(lit(0.0)), 6).as("_promo"),
          Portable.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("_total"))
        .select(
          round(lit(100.0) * col("_promo") / col("_total"), 9).as("promo_share_pct"),
          round(col("_promo"), 4).as("promo_revenue"),
          round(col("_total"), 4).as("total_revenue"))),

    // Levenshtein<=1 fuzzy self-join via lossless deletion-neighborhood
    // blocking (ops/Linkage.scala) — candidate generation is an equi-join
    // on |s|+1 keys per record, never an all-pairs cross join; the oracle
    // is the brute-force definition, so losslessness is hash-proven.
    "q_fuzzy_join" -> ((s, dir) =>
      Linkage.fuzzySelfJoinLev1(
          T(s, dir, "customer").where(col("c_custkey") < 500)
            .select(col("c_custkey").as("id"), col("c_name").as("name")),
          "id", "name")
        .orderBy("id_a", "id_b")),

    // Record linkage: deterministically planted dirty records (one digit
    // deleted from the customer name, replicated in the oracle) resolved
    // back to their best clean match — min edit distance, ties to the
    // lowest clean id. The ambiguity is real: a deleted digit can often
    // be reinserted to form several existing names.
    "q_record_linkage" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      val pos = (col("c_custkey") % 9 + 10).cast("int")
      val dirty = cust.where(col("c_custkey") % 7 === 3)
        .select((col("c_custkey") + 1000000L).as("id"),
          concat(col("c_name").substr(lit(1), pos - 1),
            col("c_name").substr(pos + 1, length(col("c_name")))).as("name"))
      Linkage.linkLev1(
          cust.select(col("c_custkey").as("id"), col("c_name").as("name")),
          dirty, "id", "name")
        .orderBy("dirty_id")
    }),

    // Snapshot upsert: merge an update batch (every 10th order, doubled
    // price, version 2) into the base snapshot (version 1), keeping the
    // highest version per key.
    "q_upsert" -> ((s, dir) => {
      val base = T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), lit(1L).as("version"))
      val updates = T(s, dir, "orders").where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2.0).as("o_totalprice"),
          lit(2L).as("version"))
      Relational.upsertLatest(base, updates, Seq("o_orderkey"), "version")
        .orderBy("o_orderkey")
    }),

    // Snapshot diff: old = orders; new = orders minus every 7th key, every
    // 5th surviving key's price raised 1.5x, plus 100 synthetic additions.
    // Emits added/removed/changed rows only.
    "q_snapshot_diff" -> ((s, dir) => {
      val old = T(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val newSnap = old.where(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 1.5)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
        .unionByName(old.where(col("o_orderkey") < 100)
          .select((col("o_orderkey") + 1000000L).as("o_orderkey"), col("o_totalprice")))
      Relational.snapshotDiff(old, newSnap, Seq("o_orderkey"), Seq("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Incremental aggregation maintenance: base (event_id % 10 != 0) and a
    // delta batch (the rest) are aggregated to per-(type, day) partials
    // independently, then MERGED — the materialized-view pattern that
    // avoids rescanning 100 TB of history per refresh. The oracle is the
    // full one-pass recompute over all events: hash equality IS the claim
    // that merge(partial(base), partial(delta)) = aggregate(base ∪ delta),
    // exact because the partial state is (count, decimal sum).
    "q_incr_agg" -> ((s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value"))
      val keys = Seq("event_type", "day")
      val base = Relational.partialAggs(ev.where(col("event_id") % 10 =!= 0), keys, "value")
      val delta = Relational.partialAggs(ev.where(col("event_id") % 10 === 0), keys, "value")
      Relational.mergePartialAggs(Seq(base, delta), keys)
        .withColumn("avg_value", round(col("avg_value"), 9))
        .orderBy("event_type", "day")
    }),

    // Incremental JOIN maintenance (C45's join twin): orders and customer
    // each split into an already-joined base + a newly-arrived delta; the
    // stored base join plus Relational.incrementalJoinDelta's two delta
    // joins must reproduce the full-recompute join EXACTLY — the oracle
    // is the plain full join, so the distributivity identity is
    // hash-proven, not asserted.
    "q_incr_join" -> ((s, dir) => {
      val o = T(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val c = T(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val (oB, oD) = (o.where(col("o_orderkey") % 7 =!= 0),
        o.where(col("o_orderkey") % 7 === 0))
      val (cB, cD) = (c.where(col("c_custkey") % 5 =!= 0),
        c.where(col("c_custkey") % 5 === 0))
      val baseJoin = oB.join(cB, col("o_custkey") === col("c_custkey"))
      baseJoin.unionByName(
          Relational.incrementalJoinDelta(oB, oD, cB, cD, "o_custkey", "c_custkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
        .orderBy("o_orderkey")
    }),

    // ── aggregations (SURVEY §2.5) ─────────────────────────────────────
    "q_groupby_agg" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Portable.decSum(col("l_quantity")).as("sum_qty"),
          Portable.decSum(col("l_extendedprice")).as("sum_base_price"),
          Portable.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
          (Portable.decSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (Portable.decSum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_count_distinct" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("cnt_part"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    "q_rollup" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), Portable.decSum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_cube" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), Portable.decSum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // Explicit GROUPING SETS (the general form rollup/cube specialize):
    // per-(flag,status) detail plus per-flag and grand totals in one pass,
    // disambiguated by grouping_id. One shuffle; Spark expands the sets
    // map-side.
    "q_grouping_sets" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("cnt"),
          Portable.decSum(col("l_quantity")).as("sum_qty"))
        .select("gid", "l_returnflag", "l_linestatus", "cnt", "sum_qty")
        .orderBy(col("gid").asc, col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    "q_pivot" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    "q_percentile" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_extendedprice, array(0.25, 0.75))").getItem(0).as("p25_price"),
          expr("percentile(l_extendedprice, array(0.25, 0.75))").getItem(1).as("p75_price"))
        .orderBy("l_returnflag")),

    "q_corr" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(Portable.decCorr(col("l_quantity"), col("l_extendedprice")), 9).as("corr_qty_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    "q_profile" -> ((s, dir) =>
      Profiling.profile(T(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
        .orderBy("col_name")),

    // Key-skew diagnostic: heaviest join keys with row share — run before
    // choosing plain vs salted join.
    "q_skew_profile" -> ((s, dir) =>
      Profiling.keySkew(T(s, dir, "lineitem"), "l_orderkey", 20)),

    "q_conditional_agg" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(when(col("l_quantity") > 25, 1)).as("n_bulk"),
          Portable.decSum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(lit(0.0))).as("disc_rev"),
          count(when(col("l_tax") === 0, 1)).as("n_taxfree"))
        .orderBy("l_returnflag")),

    "q_histogram" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .select((floor(col("l_extendedprice") / 5000) * 5000).cast("long").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bin")),

    "q_rank_dist" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag").orderBy(
        col("l_extendedprice").asc, col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_partkey").asc, col("l_suppkey").asc)
      T(s, dir, "lineitem")
        .where(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          round(percent_rank().over(w), 9).as("pct_rank"),
          round(cume_dist().over(w), 9).as("cume"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // HLL sketch variant — engine-specific estimate, no oracle (rows-only).
    // HLL++ sketch state is engine-private (no portable oracle for the
    // raw estimate — that's C125 q_hll_distinct's job), so the
    // oracle-checkable surface is the exact count plus a deterministic
    // bounded-relative-error flag: |approx − exact| / exact ≤ 3·rsd
    // (rsd = 0.05 default). The oracle asserts the flag is TRUE — Spark's
    // HLL++ is deterministic for fixed data, and a regeneration that
    // pushed the sketch past 3 standard errors would rightly go red.
    "q_approx_distinct" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("_approx"),
          countDistinct(col("l_partkey")).as("exact_part"))
        .select(col("l_returnflag"), col("exact_part"),
          (abs(col("_approx").cast("double") - col("exact_part").cast("double"))
            / col("exact_part").cast("double") <= lit(0.15)).as("within_bounds"))
        .orderBy("l_returnflag")),

    // ── sorts / top-k / ranking (SURVEY §2.7) ──────────────────────────
    "q_topk" -> ((s, dir) =>
      Relational.topK(
        T(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"),
        Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc,
            col("l_partkey").asc, col("l_suppkey").asc), 100)),

    // fanout=32: l_returnflag has 3 values, so a single-phase window would
    // sort the whole table in 3 tasks; the salted two-phase plan sorts 96
    // buckets and re-ranks 480 survivors — same rows, same oracle
    "q_topk_pergroup" -> ((s, dir) =>
      Relational.topKPerGroup(
          T(s, dir, "lineitem").select("l_returnflag", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"),
          Seq("l_returnflag"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc,
              col("l_partkey").asc, col("l_suppkey").asc), 5, fanout = 32)
        .withColumn("rn", col("rn").cast("long"))
        .orderBy("l_returnflag", "rn")),

    "q_row_number" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).cast("long").as("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // ── scalar functions (SURVEY §2.3) ─────────────────────────────────
    "q_hash" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          Portable.rowFingerprint(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")).as("row_hash"))
        .withColumn("hash32", Portable.hash32(col("row_hash")))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    "q_ts_derive" -> ((s, dir) => {
      // reference ts derivation (etl.py:56-59): concat(date, time) → parse
      val d = date_format(col("ts"), "yyyy-MM-dd")
      val t = date_format(col("ts"), "HH:mm")
      val ts2 = to_timestamp(concat(d, t), "yyyy-MM-ddHH:mm")
      T(s, dir, "events")
        .select(col("event_id"), date_format(ts2, "yyyy-MM-dd HH:mm:ss").as("trading_ts"))
        .orderBy("event_id")
    }),

    "q_date_parse" -> ((s, dir) =>
      // maturity-date parse analog (etl.py:110): yyyyMMdd string → date
      T(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(to_date(date_format(col("o_orderdate"), "yyyyMMdd"), "yyyyMMdd"),
            "yyyy-MM-dd").as("parsed_date"))
        .orderBy("o_orderkey")),

    "q_datediff" -> ((s, dir) =>
      T(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate")
        .join(T(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("ship_days"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    "q_arith" -> ((s, dir) =>
      // maturity_months analog (etl.py:122-126): days / 30.5
      T(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate")
        .join(T(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          (datediff(col("l_shipdate"), col("o_orderdate")).cast("double") / lit(30.5)).as("ship_months"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    "q_date_parts" -> ((s, dir) =>
      T(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd").as("plus2m"))
        .orderBy("o_orderkey")),

    "q_string_funcs" -> ((s, dir) =>
      T(s, dir, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
          lpad(col("p_brand"), 12, "_").as("pad"),
          substring(col("p_type"), 2, 5).as("sub"),
          upper(col("p_name")).as("up"))
        .orderBy("p_partkey")),

    "q_json_extract" -> ((s, dir) =>
      EventOps.jsonField(T(s, dir, "events"), "props", "$.k", "long")
        .select(col("event_id"), col("json_value").as("k"))
        .orderBy("event_id")),

    // ── time-series (SURVEY §2.6, Tier B) ──────────────────────────────
    "q_lag_returns" -> ((s, dir) =>
      TimeSeries.lagReturns(T(s, dir, "events"), "user_id", "event_id", "value")
        .select("event_id", "user_id", "value", "prev_value", "ret")
        .orderBy("event_id")),

    // EWMA: the recursion y_t = α·x_t + (1−α)·y_{t−1} is inexpressible as
    // a window function — the sanctioned mapPartitions case. The oracle's
    // list_reduce prefix folds apply the identical double ops in the same
    // order, so values are bit-equal.
    "q_ewma" -> ((s, dir) =>
      TimeSeries.ewma(T(s, dir, "events"), "user_id", "event_id", "value", 0.2)
        .select("event_id", "user_id", "value", "ewma")
        .orderBy("event_id")),

    "q_rolling_vol" -> ((s, dir) =>
      TimeSeries.rollingVol(T(s, dir, "events"), "user_id", "event_id", "value", 10)
        .select("event_id", "user_id", "roll_vol")
        .orderBy("event_id")),

    "q_range_window" -> ((s, dir) =>
      TimeSeries.trailingTimeWindow(T(s, dir, "events"), "user_id", "ts", "value", 3600L)
        .select("event_id", "trail_sum", "trail_cnt")
        .orderBy("event_id")),

    "q_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag").orderBy(
        col("l_extendedprice").asc, col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_partkey").asc, col("l_suppkey").asc)
      T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_returnflag"), ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // Navigation window functions (lead / first_value / nth_value /
    // last_value) — the forward-looking complements of q_lag_returns.
    "q_window_nav" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val grow = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          lead(col("value"), 1).over(w).as("next_value"),
          first(col("value")).over(grow).as("first_value"),
          nth_value(col("value"), 2).over(grow).as("second_value"),
          last(col("value")).over(full).as("last_value"))
        .orderBy("event_id")
    }),

    // Per-group z-score normalization (feature scaling before similarity
    // search / model input) — exact-decimal mean/std so the oracle is
    // bit-identical.
    "q_zscore" -> ((s, dir) =>
      Profiling.zScore(T(s, dir, "events"), Seq("user_id"), "value")
        .select("event_id", "user_id", "value", "zscore")
        .orderBy("event_id")),

    // MAD (median-absolute-deviation) robust outlier score per group —
    // the heavy-tail-safe twin of q_zscore (mean/stddev break under the
    // very outliers being hunted). Median and MAD via exact interpolated
    // percentile (DuckDB quantile_cont parity, as q_outliers).
    // mad_score rounds through a 12-scale decimal snapshot on BOTH
    // engines: the median interpolation formulas differ in final ulps,
    // and a raw double round(…, 6) flips at a 5e-7 tie boundary (2 rows
    // at sf0.1 after the r11 data regen). Snapshotting at 12 decimals
    // first erases the ulp noise before the visible rounding.
    "q_mad_outliers" -> ((s, dir) =>
      Profiling.madScore(T(s, dir, "events"), Seq("user_id"), "value")
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("med"), 9).as("med"), round(col("mad"), 9).as("mad"),
          round(col("mad_score").cast("decimal(28,12)"), 6).cast("double").as("mad_score"))
        .orderBy("event_id")),

    "q_ffill" -> ((s, dir) =>
      TimeSeries.forwardFill(
          T(s, dir, "events")
            .withColumn("pval", when(col("event_type") === "purchase", col("value"))),
          "user_id", "event_id", "pval")
        .select("event_id", "user_id", "filled_value")
        .orderBy("event_id")),

    "q_densify_ffill" -> ((s, dir) =>
      TimeSeries.densifyAndFill(
          T(s, dir, "events").select("user_id", "ts", "value"),
          "user_id", "ts", "value", 600L)
        .select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_bucket"),
          col("filled_value"))
        .orderBy("user_id", "ts_bucket")),

    "q_resample_ohlc" -> ((s, dir) =>
      TimeSeries.resampleOhlc(
          EventOps.jsonField(T(s, dir, "events"), "props", "$.k", "long")
            .withColumnRenamed("json_value", "k"),
          "user_id", "ts", "event_id", "value", "k", "hour")
        .select(col("user_id"),
          date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
          col("open"), col("high"), col("low"), col("close"), col("volume"), col("n_trades"))
        .orderBy("user_id", "bucket")),

    "q_index_agg" -> ((s, dir) =>
      TimeSeries.weightedIndex(
          T(s, dir, "events"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"),
          col("value"),
          (col("user_id") % 10 + 1).cast("double"))
        .orderBy("bucket")),

    "q_asof_join" -> ((s, dir) => {
      // last purchase value at-or-before each event, per user — the
      // derivative↔underlying-state join shape (README.md:175-177)
      val ev = T(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      TimeSeries.asOfJoin(purchases, ev.select("event_id", "user_id", "ts", "value"),
          "user_id", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"), col("value"),
          date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_ts"),
          col("asof_value"))
        .orderBy("event_id")
    }),

    // Forward as-of: the NEXT purchase at-or-after each event — the
    // mirror of q_asof_join (same union + one-window shape, frame
    // flipped); deterministic because (user_id, ts) is unique.
    "q_asof_forward" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      TimeSeries.asOfJoinForward(purchases, ev.select("event_id", "user_id", "ts", "value"),
          "user_id", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"), col("value"),
          date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_ts"),
          col("asof_value"))
        .orderBy("event_id")
    }),

    // As-of join with staleness tolerance: the carried purchase value is
    // nulled when older than 2 hours at the event's time.
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      TimeSeries.asOfJoinTolerance(purchases, ev.select("event_id", "user_id", "ts", "value"),
          "user_id", "ts", Seq("value"), toleranceSeconds = 7200L)
        .select(col("event_id"), col("user_id"), col("value"),
          date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_ts"),
          col("asof_value"))
        .orderBy("event_id")
    }),

    // Linear gap interpolation: every 5th event's value is nulled (the
    // planted gap, replicated in the oracle) and repaired by the
    // time-weighted line between its non-null neighbors.
    "q_interpolate" -> ((s, dir) => {
      val ev = T(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_id") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("value"))
      TimeSeries.interpolateLinear(ev, "user_id", "ts", "event_id", "value")
        .select(col("event_id"), col("user_id"),
          round(col("filled_value"), 6).as("filled_value"))
        .orderBy("event_id")
    }),

    // Tukey-fence outlier screen: events outside [Q1-1.5·IQR, Q3+1.5·IQR]
    // of their user's value distribution.
    // Winsorization: cap each event's value at its type's exact p05/p95 —
    // outlier treatment (vs q_outliers' detection); percentile parity
    // with DuckDB quantile_cont is the C59 recipe.
    "q_winsorize" -> ((s, dir) =>
      Profiling.winsorize(
          T(s, dir, "events").select("event_id", "event_type", "value"),
          Seq("event_type"), "value", 0.05, 0.95)
        .select("event_id", "event_type", "value", "value_w")
        .orderBy("event_id")),

    "q_outliers" -> ((s, dir) =>
      Profiling.iqrOutliers(T(s, dir, "events"), Seq("user_id"), "value")
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("fence_lo"), 9).as("fence_lo"), round(col("fence_hi"), 9).as("fence_hi"))
        .orderBy("event_id")),

    // ── events: windows + sessionization (SURVEY C14) ──────────────────
    "q_event_windows" -> ((s, dir) =>
      EventOps.tumblingWindowStats(T(s, dir, "events"), "user_id", "ts", "value", "10 minutes")
        .orderBy("user_id", "win_start")),

    // Hopping windows: 10-minute windows every 5 minutes — every event in
    // exactly 2 overlapping windows; the oracle replicates the expansion
    // with a 2-element start-offset unnest.
    "q_hopping_window" -> ((s, dir) =>
      EventOps.hoppingWindowStats(T(s, dir, "events"), "user_id", "ts", "value",
          "10 minutes", "5 minutes")
        .orderBy("user_id", "win_start")),

    "q_sessionize" -> ((s, dir) =>
      EventOps.sessionize(T(s, dir, "events"), "user_id", "event_id", "ts", 1800L)
        .select("event_id", "user_id", "session_seq")
        .orderBy("event_id")),

    // Spark's native session_window aggregation — the batch twin of the
    // streaming sessionizer. Sessions merge while consecutive gaps are
    // STRICTLY under the gap duration; the oracle replicates that with a
    // microsecond-exact lag/cumsum.
    "q_session_window" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), Portable.decSum(col("value")).as("sum_value"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")),

    // Weekly cohort retention matrix: users by first-seen week ×
    // week-offset distinct actives — the product-analytics staple.
    "q_cohort_retention" -> ((s, dir) =>
      EventOps.cohortRetention(T(s, dir, "events"), "user_id", "ts")
        .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_users"))
        .orderBy("cohort_week", "week_offset")),

    // Per-user event-type profile with a portable array-agg: the sorted
    // distinct set serialized deterministically (CSV) so the grouped
    // collection itself is hash-checked across engines.
    "q_collect_types" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy("user_id")
        .agg(
          concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy("user_id")),

    // Declarative data-quality report (Deequ/dbt-tests shape) over a
    // deterministically corrupted copy of the inputs (CASE-planted
    // violations, replicated in the oracle) — null checks, FK orphans,
    // range rules, one (rule, violations) row each; passing rules report
    // zero rather than vanishing.
    "q_dq_checks" -> ((s, dir) => {
      val ord = T(s, dir, "orders")
      val cust = T(s, dir, "customer")
      val ordD = ord
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 500 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderdate",
          when(col("o_orderkey") % 700 === 0, lit(null).cast("timestamp"))
            .otherwise(col("o_orderdate")))
      val liD = T(s, dir, "lineitem")
        .withColumn("l_orderkey",
          when(col("l_orderkey") % 1000 === 0, col("l_orderkey") + lit(20000000L))
            .otherwise(col("l_orderkey")))
      Profiling.dqReport(Seq(
        "customer_null_acctbal" -> cust.where(col("c_acctbal").isNull),
        "lineitem_orphan_orderkey" -> liD.join(ord.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti"),
        "lineitem_quantity_range" -> liD.where(col("l_quantity") <= 0 || col("l_quantity") > 50),
        "orders_nonpositive_price" -> ordD.where(col("o_totalprice") <= 0.0),
        "orders_null_date" -> ordD.where(col("o_orderdate").isNull)
      )).orderBy("rule")
    }),

    // Mergeable-sketch percentiles (approx_percentile / t-digest-style):
    // the 100 TB path the exact-percentile ops document as their scale
    // fallback. The raw sketch output is engine-private (no portable
    // oracle), so the oracle-checkable surface is the group size plus
    // deterministic rank-error flags: the sketch guarantees rank error
    // ≤ 1/accuracy = 0.001, and the flag checks the approx value lands
    // inside the EXACT percentile band at p ± 0.01 (10× the guarantee).
    // The oracle asserts both flags TRUE; Round7cOpsSpec pins the tight
    // bound directly.
    "q_approx_percentile" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(col("value")).as("n"),
          expr("approx_percentile(value, array(0.5D, 0.95D), 1000)").as("_p"),
          expr("percentile(value, array(0.49D, 0.51D, 0.94D, 0.96D))").as("_b"))
        .select(col("event_type"), col("n"),
          (element_at(col("_p"), 1) >= element_at(col("_b"), 1) &&
           element_at(col("_p"), 1) <= element_at(col("_b"), 2)).as("p50_within"),
          (element_at(col("_p"), 2) >= element_at(col("_b"), 3) &&
           element_at(col("_p"), 2) <= element_at(col("_b"), 4)).as("p95_within"))
        .orderBy("event_type")),

    // Windowed dedup: keep the FIRST event per (user, type) within each
    // 1-hour tumbling window — the batch twin of the streaming
    // dropDuplicatesWithinWatermark path (bounded-state dedup: at 100 TB
    // the state is one row per key per open window, never the corpus).
    "q_window_dedup" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"),
          date_trunc("hour", col("ts")))
        .orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("value"))
        .orderBy("event_id")
    }),

    // Sequential funnel: earliest view → click-after-view →
    // purchase-after-click per user, with steps-reached count.
    "q_funnel" -> ((s, dir) =>
      EventOps.funnel(T(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .select(col("user_id"),
          date_format(col("step_ts_0"), "yyyy-MM-dd HH:mm:ss").as("t_view"),
          date_format(col("step_ts_1"), "yyyy-MM-dd HH:mm:ss").as("t_click"),
          date_format(col("step_ts_2"), "yyyy-MM-dd HH:mm:ss").as("t_purchase"),
          col("reached"))
        .orderBy("user_id")),

    // Interval join via bucketing: every event matched to the 5-minute
    // windows (anchored at every 500th event) containing it — the rewrite
    // that turns a nested-loop range join into an ordinary equi-join (see
    // EventOps.intervalJoinBucketed). Left join back to the window list so
    // empty windows surface with zero counts.
    "q_interval_join" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val windows = ev.where(col("event_id") % 500 === 0)
        .select(col("event_id").as("window_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 300 SECONDS")).as("w_end"))
      val matched = EventOps.intervalJoinBucketed(
          ev.select(col("event_id"), col("ts"), col("value")), "ts",
          windows, "w_start", "w_end", bucketSeconds = 300L)
        .groupBy("window_id")
        .agg(count(lit(1)).as("n_events"), Portable.decSum(col("value")).as("sum_value"))
      windows.join(matched, Seq("window_id"), "left")
        .select(col("window_id"),
          date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("window_id")
    }),

    // Rectangle scan over the z-ordered events layout (who × when): the
    // multi-dimensional data-skipping artifact — see sources.ZOrder. The
    // oracle is the identical predicate over the plain table: same rows ⇒
    // the layout changes the read cost, never the answer. ZOrderSpec
    // proves the skipping bound; this gates the lifecycle end-to-end.
    "q_zorder_scan" -> ((s, dir) =>
      s.read.parquet(sources.ZOrder.ensureZOrderedEvents(s, dir))
        .where(col("user_id").between(2, 9) && col("minute_of_day").between(600, 780))
        .select("event_id", "user_id", "minute_of_day", "value")
        .orderBy("event_id")),

    // ── text analysis (SURVEY C3, C10, C12; north star) ────────────────
    "q_text_tokens" -> ((s, dir) =>
      TextOps.tokenStats(T(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "text_len")
        .orderBy("doc_id")),

    "q_token_counts" -> ((s, dir) =>
      TextOps.tokenCounts(T(s, dir, "documents"), "text")
        .select("doc_id", "ws_tokens", "re_tokens")
        .orderBy("doc_id")),

    "q_wordcount" -> ((s, dir) =>
      TextOps.wordCount(T(s, dir, "documents"), "text")
        .orderBy("token")),

    // Exact heavy hitters (count > 2% of all tokens) through the
    // Misra-Gries candidate pass + exact recount — O(1/phi) executor
    // state; the oracle is the plain GROUP BY ... HAVING definition, so
    // the sketch phase is hash-proven to lose nothing.
    "q_heavy_hitters" -> ((s, dir) =>
      TextOps.heavyHitters(T(s, dir, "documents"), "text", phi = 0.02)
        .orderBy("token")),

    "q_quality_score" -> ((s, dir) =>
      TextOps.qualityScoreCached(T(s, dir, "documents"), "text", s, dir)
        .select("doc_id", "n_tokens", "avg_token_len", "stopword_ratio", "quality_score")
        .orderBy("doc_id")),

    // Gopher rule-set filter (Rae et al. 2021 App. A1.1) with the
    // corpus-adapted stopword list (the paper's function words barely
    // occur in the synthetic corpus; the rule structure is what's under
    // test and the oracle replays the same list).
    "q_gopher_rules" -> ((s, dir) =>
      TextOps.gopherRules(T(s, dir, "documents"), "doc_id", "text",
          stopwords = TextOps.Stopwords)
        .orderBy("doc_id")),

    // Token-budget selection: keep the highest-quality docs whose running
    // token total fits a 15k-token budget (the "best N-trillion tokens"
    // cut). The running sum is the two-level distributed prefix sum —
    // quality-bucket offsets (k-row window) + within-bucket partitioned
    // windows — never a corpus-wide global window; a spec proves equality
    // with the single-window reference the oracle runs.
    "q_token_budget" -> ((s, dir) =>
      TextOps.tokenBudgetSelect(T(s, dir, "documents"), "doc_id", "text",
          budget = 15000L)
        .orderBy("doc_id")),

    // Shingle novelty: fraction of each doc's distinct 3-gram shingles
    // shared with at least one other document — the templated-content
    // signal between exact dedup and span dedup. Third consumer of the
    // persisted ShingleStore artifact (after prefix-Jaccard and
    // decontamination). The artifact carries df since r9, so this is ONE
    // per-doc aggregate over committed files — no df re-derivation.
    "q_novelty" -> ((s, dir) =>
      TextOps.shingleNoveltyAnnotated(
          graft.sources.ShingleStore.ensureShingles(s, dir, 3), "doc_id")
        .orderBy("doc_id")),

    // Portable histogram-quantile sketch (128 bins): the mergeable
    // approximate-percentile state built from exact bin counts + linear
    // interpolation — no engine-private sketch, so unlike
    // q_approx_percentile (rows-only by design) the estimates
    // HASH-CHECK; error bounded by one bin width by construction.
    "q_hist_quantiles" -> ((s, dir) =>
      Profiling.histogramQuantiles(T(s, dir, "events"), Seq("event_type"), "value",
          nBins = 128, qs = Seq(0.5, 0.9, 0.99))
        .orderBy("event_type", "q")),

    // Portable per-group HLL sketch (m=64): register state and estimate
    // are built from md5 halves + bin()-length ranks + exact dyadic sums,
    // so unlike approx_count_distinct's engine-private HLL++ this sketch
    // HASH-CHECKS against the oracle (the C6/C73 rows-only gap, closed
    // for the mergeable-register formulation).
    "q_hll_distinct" -> ((s, dir) =>
      Profiling.hllDistinct(T(s, dir, "events"), Seq("event_type"), "user_id")
        .orderBy("event_type")),

    // Vocabulary-id encoding: map every doc to top-20 vocab ids (by
    // corpus frequency, ties token-asc; 0 = OOV) with per-doc OOV rate —
    // the encode step between vocab training and packing. The id
    // sequence reassembles order-deterministically via sorted (pos, id)
    // structs, never a bare collect_list.
    "q_tokenize_ids" -> ((s, dir) =>
      TextOps.tokenizeToIds(T(s, dir, "documents"), "doc_id", "text",
          vocabSize = 20)
        .orderBy("doc_id")),

    // Per-domain adaptive quality floor: keep docs at or above their own
    // source-domain's 25th-percentile quality — a corpus-wide threshold
    // over-prunes clean domains and under-prunes noisy ones. Exact
    // percentile (quantile_cont parity), broadcast floor table.
    "q_quality_floor" -> ((s, dir) =>
      TextOps.qualityFloorByDomain(T(s, dir, "documents"), "doc_id", "text",
          "source", q = 0.25)
        .orderBy("doc_id")),

    // The scale-safe floor (clears C122): same contract, floor from the
    // mergeable histogram-quantile sketch — (domain, bin) state instead
    // of buffering a whole domain's values on one task. Hash-checked
    // against an oracle that replays the sketch estimate bit-for-bit.
    "q_quality_floor_sketch" -> ((s, dir) =>
      TextOps.qualityFloorByDomainSketch(T(s, dir, "documents"), "doc_id", "text",
          "source", q = 0.25, nBins = 128)
        .orderBy("doc_id")),

    "q_rolling_hash" -> ((s, dir) =>
      TextOps.rollingHash(T(s, dir, "documents"), "text")
        .select("doc_id", "rolling_hash")
        .orderBy("doc_id")),

    "q_dedup_exact" -> ((s, dir) =>
      TextOps.dedupExact(T(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")),

    // URL-category blocklist filter (r20): registrable-suffix rule
    // matching over extracted domains — subdomains hit their parent
    // rules via exploded dot-suffix keys against the broadcast rule
    // catalog, the embedded-substring case stays clean, verdicts take
    // the most specific match; per-category doc counts + exact shares
    // (the Gopher rule-accounting shape).
    "q_url_filter" -> ((s, dir) => {
      val domArr = array(UrlPlantDomains.map(lit): _*)
      val wu = T(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" visit https://"),
          element_at(domArr, (pmod(col("doc_id"), lit(5)) + 1).cast("int")),
          lit("/p"), col("doc_id").cast("string")).as("text"))
      TextOps.urlCategoryFilter(wu, "doc_id", "text", UrlBlocklist)
        .orderBy("category")
    }),

    // HTML boilerplate extraction (r20, jusText shape): deterministic
    // page chrome (head+script, nav, share bar, footer) planted around
    // each corpus text, oracle-replicated; script blocks strip whole,
    // lines classify by link-density (counted pre-strip) and stopword
    // density (integer cross-multiplied), the article body survives on
    // length regardless of language and every chrome line dies.
    "q_html_extract" -> ((s, dir) => {
      val html = T(s, dir, "documents").select(col("doc_id"),
        concat(lit(HtmlHead), col("doc_id").cast("string"),
          lit(HtmlHeadTail + "\n<body>\n" + HtmlNav + "\n<p>"),
          col("text"),
          lit("</p>\n" + HtmlShare + "\n" + HtmlFooter + "\n</body></html>"))
          .as("html"))
      TextOps.htmlExtract(html, "doc_id", "html").orderBy("doc_id")
    }),

    // Line-level dedup (CCNet granularity): the corpus texts carry no
    // newlines, so line-structured docs are DERIVED deterministically —
    // doc_id % 100 buckets, each bucket's texts joined with '\n' in
    // doc_id order — and the classic boilerplate motivation is planted
    // (replicated in the oracle, q_dedup_paragraph pattern): every
    // derived doc gets the same license-header line prepended and the
    // same footer line appended. dedupLines keeps both only in ldoc 0
    // and strips them from the other 99 docs; content lines are unique
    // and survive everywhere.
    "q_dedup_lines" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
        .select((col("doc_id") % 100).as("ldoc"), col("doc_id"), col("text"))
      val ldocs = docs.groupBy("ldoc").agg(
        concat(
          lit("shared license header line\n"),
          array_join(
            transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text")),
            "\n"),
          lit("\nshared footer line")).as("text"))
      TextOps.dedupLines(ldocs, "ldoc", "text").orderBy("ldoc")
    }),

    // Paragraph(span)-level dedup: repeated boilerplate *within*
    // otherwise-distinct documents. The corpus has no natural repeated
    // spans (and no paragraph breaks), so three docs carrying a shared
    // 20-token boilerplate block are planted in-query (replicated in the
    // oracle, q_redact pattern) — doc 9000 keeps the first occurrence,
    // 9001's copy and BOTH of 9002's (one is a within-doc repeat) are
    // marked removed. Span unit = 20 whitespace tokens, C41's chunk shape.
    "q_dedup_paragraph" -> ((s, dir) => {
      import s.implicits._
      val base = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = Seq(
        (9000L, s"$ParaBoiler alpha ending words here"),
        (9001L, s"$ParaBoiler beta different tail tokens"),
        (9002L, s"$ParaBoiler $ParaBoiler gamma tail")
      ).toDF("doc_id", "text")
      TextOps.dedupParagraphs(base.unionByName(planted), "doc_id", "text", span = 20)
        .select(col("doc_id"), col("span_idx").cast("long").as("span_idx"),
          col("span_fp"), col("kept"))
        .orderBy("doc_id", "span_idx")
    }),

    // Overlapping-span dedup (stride 5 < span 20): catches boilerplate at
    // OFF-boundary offsets that q_dedup_paragraph's aligned spans provably
    // miss — doc 9101 carries the shared 20-token block after a 5-token
    // lead-in (offset 5: a stride multiple, NOT a span multiple), so no
    // aligned span of 9101 equals any span of 9100, but the stride window
    // starting at token 5 reproduces 9100's first window exactly. The
    // stride segments it covers are marked removed (containment policy —
    // over-removal is the safe failure mode).
    "q_dedup_span_stride" -> ((s, dir) => {
      import s.implicits._
      val base = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = Seq(
        (9100L, ParaBoiler),
        (9101L, s"lead in tokens here now $ParaBoiler closing trailer words finish end")
      ).toDF("doc_id", "text")
      TextOps.dedupSpanStride(base.unionByName(planted), "doc_id", "text",
          span = 20, stride = 5)
        .select(col("doc_id"), col("seg_idx").cast("long").as("seg_idx"), col("kept"))
        .orderBy("doc_id", "seg_idx")
    }),

    // Exact duplicated-substring cut (stride-1 windows — the Lee-et-al
    // ExactSubstr modality the stride machinery can't reach): doc 9201
    // carries the 20-token boilerplate after a SEVEN-token lead-in — an
    // offset no stride grid hits — and its merged dup span must be
    // exactly those 20 tokens; doc 9202 carries TWO copies separated by
    // filler, exercising within-doc duplication and the island merge
    // (two disjoint maximal spans, 40 dup tokens).
    "q_substring_dedup" -> ((s, dir) => {
      import s.implicits._
      val base = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = Seq(
        (9200L, ParaBoiler),
        (9201L, s"seven lead tokens come before the block $ParaBoiler trailing words end"),
        (9202L, s"self repeat case $ParaBoiler middle filler words between copies $ParaBoiler done")
      ).toDF("doc_id", "text")
      TextOps.dedupExactSubstring(base.unionByName(planted), "doc_id", "text",
          minLen = 15)
        .orderBy("doc_id")
    }),

    "q_ngram_jaccard" -> ((s, dir) =>
      TextOps.ngramJaccardPairs(
          T(s, dir, "documents").where(col("doc_id") < 100), "doc_id", "text", 3,
          shingleSource = Some(graft.sources.ShingleStore.ensureShingles(s, dir, 3)
            .where(col("doc_id") < 100)))
        .orderBy("id_a", "id_b")),

    // Same jaccard with the hot-shingle skew guard active: shingles in
    // more than 3% of documents are dropped before the equi-join — they
    // match everything (no dedup signal) and fan out quadratically.
    "q_ngram_jaccard_df" -> ((s, dir) =>
      TextOps.ngramJaccardPairs(
          T(s, dir, "documents").where(col("doc_id") < 100), "doc_id", "text", 3,
          maxDocFreqRatio = 0.03,
          shingleSource = Some(graft.sources.ShingleStore.ensureShingles(s, dir, 3)
            .where(col("doc_id") < 100)))
        .orderBy("id_a", "id_b")),

    "q_simhash" -> ((s, dir) =>
      TextOps.simHash(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q_simhash_neardup" -> ((s, dir) =>
      TextOps.simHashNearDupCached(T(s, dir, "documents"), "doc_id", "text", 3, s, dir)
        .orderBy("id_a", "id_b")),

    // Cross-source duplication-flow matrix: SimHash near-dup pairs
    // rolled up to unordered (source, source) counts — WHICH crawls
    // copy from WHICH (mirror detection, license-laundering, template
    // farms); the provenance report every dedup pass should end with.
    // Rides the memoized near-dup relation; the (doc_id, source) dim
    // joins are plain equi-joins on the pair-sized frame.
    "q_dup_matrix" -> ((s, dir) => {
      val pairs = TextOps.simHashNearDupCached(T(s, dir, "documents"), "doc_id", "text", 3, s, dir)
        .select("id_a", "id_b")
      val src = T(s, dir, "documents").select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("_sa")), Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("_sb")), Seq("id_b"))
        .select(least(col("_sa"), col("_sb")).as("source_a"),
          greatest(col("_sa"), col("_sb")).as("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    }),

    // Repetition-based quality signals (Gopher-style): duplicate-token and
    // top-bigram fractions — the "filter boilerplate/spam before training"
    // scores, over the same shuffle shape as q_wordcount.
    "q_repetition" -> ((s, dir) =>
      TextOps.repetitionSignals(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // PII redaction: the synthetic corpus carries no PII, so the query
    // plants a deterministic email + phone per document (replicated in the
    // oracle) and the scrub is hash-checked on both the redacted text and
    // the redaction counts.
    "q_redact" -> ((s, dir) => {
      val withPii = T(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or +1-555-"),
          lpad(col("doc_id").cast("string"), 4, "0")).as("text"))
      TextOps.redactPii(withPii, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q_lang_id" -> ((s, dir) =>
      TextOps.langIdByProfile(T(s, dir, "documents"), "doc_id", "text", "lang", 20)
        .orderBy("doc_id")),

    // TF-IDF top-5 terms per document — keyword extraction over the whole
    // corpus. Ranks on the ROUNDED score so rank order is engine-exact.
    "q_tfidf" -> ((s, dir) =>
      // TokenStore fast path (r16b): tokenize once at ingest
      TextOps.tfIdfTopTermsFromCounts(
        graft.sources.TokenStore.ensureTokens(s, dir)
          .select(col("doc_id"), col("token"), col("tf").as("_cnt")),
        T(s, dir, "documents").select("doc_id").distinct()
          .agg(count(lit(1)).as("_n")),
        "doc_id", 5)
        .orderBy("doc_id", "rank")),

    // Corpus-unigram LM quality score (perplexity proxy): mean add-one
    // log-probability of each document's tokens under the corpus's own
    // unigram model — the gibberish/OOV filter of a curation pipeline.
    "q_unigram_logprob" -> ((s, dir) =>
      TextOps.unigramLogProbCached(T(s, dir, "documents"), "doc_id", "text", s, dir)
        .orderBy("doc_id")),

    // BM25 relevance of every document against a fixed query-term set —
    // the retrieval primitive behind corpus search / quality-weighted
    // selection.
    // Order-2 LM extension of q_unigram_logprob: add-1-smoothed bigram
    // score — the sharper perplexity-style quality filter.
    "q_bigram_logprob" -> ((s, dir) =>
      TextOps.bigramLogProb(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // Global top-50 bigrams (cnt desc, ties lexicographic) — the n-gram
    // frequency table that feeds boilerplate and collocation analysis;
    // runs as TakeOrderedAndProject, not a global sort.
    "q_top_bigrams" -> ((s, dir) =>
      TextOps.topBigrams(T(s, dir, "documents"), "text", 50)
        .orderBy("rank")),

    "q_bm25" -> ((s, dir) =>
      TextOps.bm25ScoresCached(T(s, dir, "documents"), "doc_id", "text", Bm25Terms, s, dir)
        .orderBy("doc_id")),

    // Temperature-weighted domain rebalancing (α = 0.5 over `lang`):
    // skewed strata are flattened toward √-share weights, selection by
    // deterministic md5 bucket — the "domain mixture" step before
    // training-data assembly.
    "q_domain_mix" -> ((s, dir) =>
      TextOps.temperatureSample(T(s, dir, "documents"), "doc_id", "lang",
          targetFrac = 0.5)
        .select("doc_id", "lang", "keep_rate")
        .orderBy("doc_id")),

    // Sliding-window chunking: 64-token windows every 48 tokens — the
    // long-document splitter feeding a fixed-context trainer.
    "q_chunk" -> ((s, dir) =>
      TextOps.chunkDocuments(T(s, dir, "documents"), "doc_id", "text", chunkSize = 64, overlap = 16)
        .orderBy("doc_id", "chunk_idx")),

    // Greedy sequence packing to a 2048-token budget across 8 md5 shards —
    // deterministic batch assembly (shard + id order fix the layout at any
    // parallelism).
    "q_pack" -> ((s, dir) =>
      TextOps.packSequences(
          TextOps.tokenStats(T(s, dir, "documents"), "text")
            .select("doc_id", "n_tokens"),
          "doc_id", "n_tokens", budget = 2048L, shards = 8)
        .orderBy("doc_id")),

    // Domain-level corpus stats: the synthetic corpus carries no URLs, so
    // the query plants two per document (replicated in the oracle) and the
    // extraction + rollup is hash-checked.
    "q_domains" -> ((s, dir) => {
      val withUrls = T(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" see https://site"), pmod(col("doc_id"), lit(7)),
          lit(".example.com/page"), col("doc_id"),
          lit(" and http://ref.example.org/x")).as("text"))
      TextOps.domainStats(withUrls, "doc_id", "text")
        .orderBy("domain")
    }),

    // Decontamination: docs >= 100 checked for 3-gram overlap against a
    // pretend benchmark set (docs < 100) — the eval-leakage hygiene pass.
    "q_contamination" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val sh = graft.sources.ShingleStore.ensureShingles(s, dir, 3)
      TextOps.contaminationFlagsFromShingles(
          docs.where(col("doc_id") >= 100).select("doc_id"),
          sh.where(col("doc_id") >= 100), sh.where(col("doc_id") < 100),
          "doc_id", minCommon = 2L)
        .orderBy("doc_id")
    }),

    // Dedup groups: connected components over SimHash near-dup pairs —
    // every doc labeled with its group's minimum id ("keep rows where
    // doc_id = group_rep" is then the representative filter). Oracle:
    // recursive-CTE transitive closure over the identical pair set.
    "q_dedup_groups" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Graph.connectedComponents(
          docs.select("doc_id"), "doc_id",
          TextOps.simHashNearDupCached(docs, "doc_id", "text", 3, s, dir), "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Canonical-representative selection: within each near-dup group keep
    // the HIGHEST-quality document (not the lowest id) — the curation
    // policy a real pipeline wants. Composes the memoized near-dup edge
    // stage + connected components + the quality score; ranking is on the
    // ROUNDED score (engine-exact), ties to the lowest id.
    "q_dedup_keep_best" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val groups = Graph.connectedComponents(
          docs.select("doc_id"), "doc_id",
          TextOps.simHashNearDupCached(docs, "doc_id", "text", 3, s, dir), "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
      val quality = TextOps.qualityScoreCached(docs, "text", s, dir)
        .select("doc_id", "quality_score")
      val w = Window.partitionBy("group_rep")
        .orderBy(col("quality_score").desc, col("doc_id").asc)
      groups.join(quality, Seq("doc_id"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("group_rep", "doc_id", "quality_score")
        .orderBy("group_rep")
    }),

    // Incremental ingest dedup: the delta batch (doc_id >= 400) is checked
    // against the base corpus's fingerprints and then first-wins deduped
    // within itself — daily cost O(delta), not O(corpus).
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      TextOps.dedupIncremental(
          docs.where(col("doc_id") < 400), docs.where(col("doc_id") >= 400),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // MinHash-LSH near-dup candidates — banded bucket join. The md5-seeded
    // hash family is engine-portable, so the full banding (signatures,
    // band keys, estimated Jaccard) is replicated in the DuckDB oracle.
    "q_minhash_lsh" -> ((s, dir) =>
      TextOps.minHashLshCandidates(
          T(s, dir, "documents").where(col("doc_id") < 200), "doc_id", "text",
          n = 3, k = 16, bands = 8)
        .orderBy("id_a", "id_b")),

    // Flagship composition — the whole training-data prep pipeline in one
    // declarative plan: quality floor → exact dedup (keep-first) →
    // near-dup clustering (keep each group's representative) →
    // deterministic hash split. Every stage is an operator declared above;
    // the oracle recomputes the identical pipeline in SQL (including the
    // recursive-CTE near-dup closure).
    // CURATION pipeline v2 (r8 capstone): chain the round's operators the
    // way a training-data pass actually runs them — per-domain adaptive
    // quality floor (keep docs at/above their source's q25), novelty
    // screen (drop docs whose shingles are >50% shared — templated
    // content), then the token-budget cut over survivors (best remaining
    // docs under 8k tokens). Novelty reads the persisted ShingleStore
    // artifact; the budget's running sum is the distributed prefix sum.
    // Every doc emits its verdict trail (floor_kept, shared_frac,
    // budget verdict) so the cut is auditable, not just applied.
    // The floor stage is the SKETCH variant (r9): the capstone is the
    // 100 TB curation path, so its floor must come from mergeable
    // (domain, bin) state, not an exact percentile that buffers a whole
    // domain on one task (the C122 boundary, now cleared).
    "q_pipeline_curate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val floored = TextOps.qualityFloorByDomainSketch(docs, "doc_id", "text", "source", 0.25)
        .select(col("doc_id"), col("quality_score"), col("kept").as("floor_kept"))
      val novelty = TextOps.shingleNoveltyAnnotated(
          graft.sources.ShingleStore.ensureShingles(s, dir, 3), "doc_id")
        .select(col("doc_id"), col("shared_frac"))
      val survivors = docs
        .join(floored.where(col("floor_kept") === 1).select("doc_id"), Seq("doc_id"), "left_semi")
        .join(novelty.where(col("shared_frac") <= 0.5).select("doc_id"), Seq("doc_id"), "left_semi")
      val budget = TextOps.tokenBudgetSelect(survivors, "doc_id", "text", budget = 8000L)
        .select(col("doc_id"), col("n_tokens"), col("cum_tokens"), col("kept"))
      floored
        .join(novelty, Seq("doc_id"), "left")
        .join(budget, Seq("doc_id"), "left")
        .select(col("doc_id"), col("quality_score"), col("floor_kept"),
          col("shared_frac"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("cum_tokens"), lit(0L)).as("cum_tokens"),
          coalesce(col("kept"), lit(0L)).as("kept"))
        .orderBy("doc_id")
    }),

    "q_pipeline_prep" -> ((s, dir) => {
      val quality = TextOps.qualityScoreCached(T(s, dir, "documents"), "text", s, dir)
        .where(col("n_tokens") >= 10)
      // materialization point between pipeline stages: three consumers
      // (near-dup edges, component nodes, final join) would otherwise
      // each re-evaluate the quality+dedup stage from the scan
      val deduped = TextOps.dedupExact(quality, "doc_id", "text").localCheckpoint(true)
      // Near-dup edges over the deduped survivors = the full-corpus edge
      // set restricted to pairs with BOTH endpoints surviving (SimHash
      // fingerprints are per-document — see simHashNearDupCached's
      // soundness note), so the expensive signature stage is shared with
      // q_simhash_neardup / q_dedup_groups instead of recomputed here.
      val survivors = deduped.select(col("doc_id"))
      val edges = TextOps.simHashNearDupCached(
          T(s, dir, "documents"), "doc_id", "text", 3, s, dir)
        .join(survivors.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
        .join(survivors.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
      val groups = Graph.connectedComponents(
        deduped.select("doc_id"), "doc_id", edges, "id_a", "id_b")
      val reps = deduped.join(
        groups.where(col("id") === col("group_rep")).select(col("id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      val bucket = Portable.hash32(col("doc_id")) % 10000
      reps
        .withColumn("split", when(bucket < 8000, lit("train")).otherwise(lit("eval")))
        .select("doc_id", "n_tokens", "quality_score", "split")
        .orderBy("doc_id")
    }),

    // The injected SQL-function surface (GraftExtensions) under the
    // driver's gate: the same fused codegen expressions the Column API
    // uses, reached through spark.sql text — float_dot / cosine_sim /
    // md5_hash64 over a registered view. reverse() makes the pair
    // non-trivial (and exposes the norm fold order, which the oracle
    // replicates exactly).
    "q_sql_funcs" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      T(s, dir, "embeddings").createOrReplaceTempView("graft_sql_emb")
      s.sql("""SELECT vec_id,
                 round(float_dot(embedding, reverse(embedding)), 6) AS rev_dot,
                 round(cosine_sim(embedding, reverse(embedding)), 9) AS rev_cos,
                 md5_hash64(CAST(vec_id AS STRING))[0] AS h_lo,
                 md5_hash64(CAST(vec_id AS STRING))[1] AS h_hi,
                 size(ws_tokens(concat('x  ', CAST(vec_id AS STRING), ' y'))) AS n_tok,
                 element_at(ws_tokens(concat('x  ', CAST(vec_id AS STRING), ' y')), 2) AS tok_mid
               FROM graft_sql_emb""")
        .orderBy("vec_id")
    }),

    // ── vectors / similarity search (SURVEY C4, C11; north star) ───────
    "q_array_dot" -> ((s, dir) =>
      VectorOps.selfDot(T(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id")),

    // Int8 symmetric quantization — the embedding storage path. The
    // quantized vector is emitted as a CSV string so the hash compare is
    // representation-stable across engines.
    "q_quantize_int8" -> ((s, dir) =>
      VectorOps.quantizeInt8(T(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), round(col("scale"), 9).as("scale"),
          concat_ws(",", col("q")).as("q_csv"))
        .orderBy("vec_id")),

    "q_cosine_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      VectorOps.cosineTopK(emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", 5)
        .select(col("query_id"), col("corpus_id"), col("score"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // ── multimodal columns (north star): binary payload + metadata →
    // partition-local byte-level decode (nibble histogram + entropy over
    // the actual payload bytes) → feature stats ──────────────────────────
    "q_multimodal" -> ((s, dir) => {
      val packed = MultimodalOps.packBinary(
        T(s, dir, "documents").withColumnRenamed("doc_id", "id"), "id", "text", "text/plain")
      MultimodalOps.featureStats(MultimodalOps.decodeByteFeatures(packed))
        .withColumn("mean_f", round(col("mean_f"), 6))
        .orderBy("mime", "dim")
    }),

    // Frame sampling over video-like payloads: every stride-th frame index
    // up to byte_len/bytesPerFrame, generator-side (no payload fanout).
    "q_frame_sample" -> ((s, dir) => {
      val packed = MultimodalOps.packBinary(
        T(s, dir, "documents").withColumnRenamed("doc_id", "id"), "id", "text", "text/plain")
      MultimodalOps.sampleFrames(packed, bytesPerFrame = 16L, stride = 3)
        .select(col("id"), col("frame_idx"))
        .orderBy("id", "frame_idx")
    }),

    // Image-container header parse — REAL byte-level format decoding:
    // planted PNGs (big-endian u32 dims in the IHDR chunk), GIFs
    // (little-endian u16 logical-screen dims), and JPEGs whose SOF0
    // frame header sits behind APP0 + COM segments the marker walk must
    // skip by their big-endian lengths (r9 — the format a real
    // multimodal corpus mostly contains). Every third doc's payload is
    // the raw text (an unparseable header), and doc_ids ending in 5
    // carry a TRUNCATED jpeg (APP0 length pointing past the payload end)
    // — both malformed-media cases must emit ('unknown', -1, -1) as
    // data. The payloads are built in-query from doc_id arithmetic, the
    // parser reads actual bytes at the container offsets, and the oracle
    // checks the parse recovers exactly the planted dimensions (the
    // q_redact planted-fixture pattern applied to binary).
    "q_image_dims" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val w = (col("doc_id") % 256 + 64).cast("int")
      val h = (col("doc_id") % 128 + 32).cast("int")
      val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0806000000"))
      val gifHex = concat(lit("474946383961"),
        lpad(hex(w % 256), 2, "0"), lpad(hex(w / 256), 2, "0"),
        lpad(hex(h % 256), 2, "0"), lpad(hex(h / 256), 2, "0"), lit("000000"))
      // SOI + APP0(JFIF, len 16) + COM(len 7) + SOFn(len 17: precision,
      // height BE u16, width BE u16, 3 components). The frame marker
      // varies: progressive SOF2 and arithmetic-coded SOF9 are planted
      // alongside baseline SOF0 (r10) — all three share the identical
      // frame-header layout, and a walk that only recognized SOF0/1/2
      // would emit ('unknown',-1,-1) for the SOF9 rows and hash-fail.
      val sofMarker = when(col("doc_id") % 20 === 0, lit("FFC2"))
        .when(col("doc_id") % 20 === 10, lit("FFC9"))
        .otherwise(lit("FFC0"))
      val jpegHex = concat(
        lit("FFD8" + "FFE0" + "0010" + "4A46494600010100000100010000" +
          "FFFE" + "0007" + "706C616E74"),
        sofMarker,
        lit("0011" + "08"),
        lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"), lit("03012200021101031101"))
      val payload = when(col("doc_id") % 3 === 0, col("text").cast("binary"))
        .when(col("doc_id") % 10 === 5, unhex(lit("FFD8FFE00010")))
        .when(col("doc_id") % 5 === 0, unhex(jpegHex))
        .when(col("doc_id") % 2 === 0, unhex(pngHex))
        .otherwise(unhex(gifHex))
      val packed = docs.select(col("doc_id").as("id"), payload.as("payload"),
        struct(lit("image/*").as("mime"), length(payload).cast("long").as("byte_len"),
          lit("planted").as("source")).as("meta"))
      MultimodalOps.imageDims(packed).toDF()
        .orderBy("id")
    }),

    // Embedding-cosine near-dup: exact within a bounded range (oracle-
    // checked); the LSH-bucketed variant below is the 100 TB path.
    "q_embed_neardup" -> ((s, dir) =>
      VectorOps.nearDupPairsExact(
          T(s, dir, "embeddings").where(col("vec_id") < 200), "vec_id", "embedding", 0.2)
        .withColumn("cos_sim", round(col("cos_sim"), 9))
        .orderBy("id_a", "id_b")),

    // Banded (AND/OR-amplified) LSH: 8 bands × 2 planes — expected recall
    // 1−(1−p²)⁸ ≈ 0.95 at the cos=0.2 boundary. Bounded to the same
    // verification subset as the exact twin (at a low threshold on random
    // vectors r=2 banding is a recall demo, not a pruning regime — the
    // high-r pruning regime is measured in LshRecallSpec). Hyperplanes are
    // deterministic, so the full banding is replicated in the DuckDB
    // oracle (plane constants embedded as literals — see lshBandSigSql).
    "q_embed_neardup_lsh" -> ((s, dir) =>
      VectorOps.nearDupPairsLsh(
          T(s, dir, "embeddings").where(col("vec_id") < 500), "vec_id", "embedding", 0.2,
          bands = 8, planesPerBand = 2, dim = 64)
        .withColumn("cos_sim", round(col("cos_sim"), 9))
        .orderBy("id_a", "id_b")),

    // PRUNING-regime banded LSH (8 bands × 8 planes — 256 buckets per
    // band): the configuration near-dup detection actually runs at scale,
    // where random pairs almost never collide and candidates stay
    // near-linear (VERDICT r3 item 2; candidate-fraction measured in
    // LshRecallSpec). The corpus gets planted near-duplicates built
    // in-query — a deterministic double-arithmetic perturbation of each
    // vec_id < 50, rounded back to float, so the oracle replicates the
    // planting bit-for-bit and the result (~the 50 planted twin pairs at
    // cos ≥ 0.9) is hash-checked end to end.
    "q_embed_neardup_lsh_r8" -> ((s, dir) => {
      val base = T(s, dir, "embeddings").where(col("vec_id") < 500)
        .select("vec_id", "embedding")
      // perturb FIRST, re-key SECOND: in one select the lambda's
      // col("vec_id") would lateral-resolve to the new alias (vec_id +
      // 100000) and perturb with the wrong offsets
      val planted = base.where(col("vec_id") < 50)
        .select(col("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x.cast("double") +
              ((col("vec_id") * 64 + i) % 7 - 3).cast("double") * lit(0.001)).cast("float"))
            .as("embedding"))
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      VectorOps.nearDupPairsLsh(base.unionByName(planted), "vec_id", "embedding", 0.9,
          bands = 8, planesPerBand = 8, dim = 64)
        .withColumn("cos_sim", round(col("cos_sim"), 9))
        .orderBy("id_a", "id_b")
    }),

    // Same computation through the custom codegen'd FloatDotProduct
    // expression — bit-identical scores, same oracle, fused loop.
    "q_cosine_topk_native" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      VectorOps.cosineTopK(emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", 5,
          nativeDot = true)
        .select(col("query_id"), col("corpus_id"), col("score"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // IVF probe-limited ANN: spherical k-means centroids (deterministic —
    // seeded init + decimal-exact means), corpus bucketed by nearest cell,
    // queries probe their 16 nearest of the PRODUCTION k=64 cells (the r17
    // promotion, VERDICT r16 item 3: the √N quantizer strictly dominates
    // at matched scan fraction — same ¼-corpus scan the old 4-of-16
    // configuration paid, recall 0.77 vs 0.60 at sf0.1). The centroids are
    // an INDEX ARTIFACT (IvfIndex): trained once per dataset, persisted,
    // and loaded at query time — the real ANN lifecycle, not per-query
    // training. Because the loaded artifact pre-exists SQL generation, the
    // oracle embeds the centroid values as literals (ivfTopKSql) and this
    // query is fully hash-checked; recall vs the brute-force baseline is
    // measured separately in LshRecallSpec.
    // The corpus side is the CELL-PARTITIONED at-rest layout
    // (IvfClusterStore, r17): cells are assigned once at ingest, stored
    // as hive partitions, and the probe restriction prunes the scan —
    // the pre-r17 shape re-ran the k-centroid assignment per query.
    "q_ivf_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val centroids = prodCentroids(s, dir)
      val clustered = graft.sources.IvfClusterStore.ensureClustered(s, dir,
        centroids, IvfK2, IvfIters)
      VectorOps.ivfTopKClustered(clustered, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", 5, centroids, nProbe = IvfNProbe)
        .select(col("query_id"), col("corpus_id"), col("score"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // Per-cell simplified silhouette of the committed IVF partition —
    // the index-health report after (re)training a quantizer: tight
    // cells ≈ 1, smeared ≈ 0, mis-partitioned < 0. Row-local against the
    // literal centroids + one k-cell hash agg; the O(n·k) stand-in for
    // the O(n²) pairwise silhouette. Oracle is generated from the same
    // persisted centroid artifact (the q_ivf_topk contract) — since r17
    // the PRODUCTION k=64 index, so the health report describes the
    // quantizer the serving queries actually probe.
    "q_silhouette" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      VectorOps.clusterSilhouette(emb, "vec_id", "embedding", prodCentroids(s, dir))
    }),

    // Product-quantization ADC top-k with exact re-rank: each corpus
    // vector compresses to 16 sub-space codes (8 bytes/vector — one
    // packed long at 4 bits/code, the scan payload of a 100 TB ANN
    // sweep), queries rank by the ADC lookup-table sum, and the top-20
    // candidates fetch their exact vectors back (broadcast id join) for
    // the exact-cosine re-score.
    // Codebooks are a persisted artifact (PqIndex) whose literals the
    // oracle embeds, and the CODES are a persisted artifact too
    // (PqCodeStore, r17 — VERDICT r16 item 1: encode runs once at ingest,
    // never per query) — fully hash-checked either way, since the codes
    // are deterministic given the books (PqCodeStoreSpec proves parity).
    "q_pq_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val books = rawPqBooks(s, dir)
      val codes = graft.sources.PqCodeStore.ensureRawCodes(s, dir, books, PqM, PqK, PqIters)
      VectorOps.pqTopKCoded(codes, emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", 5, books, rerank = 20)
        .select(col("query_id"), col("corpus_id"), col("score"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // IVF-PQ composed ANN (VERDICT r6 item 2): the coarse quantizer bounds
    // WHICH rows a query touches (16 of the production 64 cells probed —
    // the r17 promotion, same ¼-corpus scan fraction as the old 4-of-16;
    // the COMPOSED configuration measures 0.55 top-5 recall vs the old
    // composition's 0.45 at sf0.1, LshRecallSpec "composed production
    // config"), PQ bounds the BYTES per touched row (one packed 8-byte
    // code word,
    // ADC lookup table), and only the top-20 ADC candidates fetch their
    // exact vectors for the re-score. All three models are the SAME
    // persisted artifacts q_ivf_topk / q_pq_topk own, and the encoded
    // corpus itself is a persisted PqCodeStore artifact (r17 — encode at
    // ingest, never per query).
    // RAW-vector codes by MEASURED choice (r7 item 5 adjudicated in
    // LshRecallSpec): on this corpus's quasi-random unit embeddings the
    // within-cell cosine is low, so residuals are LONGER than the
    // vectors and residual codes lose recall; the residual path ships as
    // q_ivfpq_res_topk below.
    "q_ivfpq_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val centroids = prodCentroids(s, dir)
      val books = rawPqBooks(s, dir)
      val codes = graft.sources.PqCodeStore.ensureIvfCodes(s, dir, centroids, IvfK2,
        IvfIters, books, PqM, PqK, PqIters, residual = false)
      VectorOps.ivfPqTopKCoded(codes, emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", 5, centroids, nProbe = IvfNProbe, books, rerank = 20)
        .select(col("query_id"), col("corpus_id"), col("score"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // IVF-PQ with FAISS-style RESIDUAL encoding (VERDICT r7 item 5):
    // codes quantize v − centroid(cell), the ADC approximation is
    // q·centroid(cell) (exact scalar per probed cell) + Σ LUT[code] —
    // the decomposition where the coarse term carries no quantization
    // error. The win materializes on clustered corpora (tight cells,
    // ‖v−c‖ ≪ ‖v‖ — the production regime); on this corpus it measures
    // slightly behind raw codes (see q_ivfpq_topk note), which is why
    // both encodings ship, each oracle-checked with its own codebook and
    // code-table artifacts (residual books + codes key the k=64 quantizer
    // they residualize against).
    "q_ivfpq_res_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val centroids = prodCentroids(s, dir)
      val books = resPqBooks(s, dir)
      val codes = graft.sources.PqCodeStore.ensureIvfCodes(s, dir, centroids, IvfK2,
        IvfIters, books, PqM, PqK, PqIters, residual = true)
      VectorOps.ivfPqTopKCoded(codes, emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", 5, centroids, nProbe = IvfNProbe, books, rerank = 20,
          residualEncoding = true)
        .select(col("query_id"), col("corpus_id"), col("score"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // SemDeDup-style semantic dedup: coarse k-means cells (the SAME
    // persisted IVF artifact the ANN queries own) bound the pairwise
    // cosine work to within-cluster members; lower-id-wins keep policy.
    // Near-identical vectors are planted in-query (the r8 perturbation,
    // replicated bit-for-bit in the oracle) so the dedup has real
    // positives to find — random corpus pairs top out at cos≈0.51.
    // Since r18 the CORPUS side reads its cell from the at-rest
    // IvfClusterStore layout (the k=64 assignment — 64 full-dim dots/row
    // — is corpus-static, so recomputing it per run was pure waste);
    // only the planted delta is assigned on the fly, which is exactly
    // the production shape: new-ingest rows dedup-checked against the
    // clustered corpus.
    "q_semantic_dedup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val centroids = prodCentroids(s, dir)
      val base = emb.select("vec_id", "embedding")
      val clustered = graft.sources.IvfClusterStore.ensureClustered(s, dir,
        centroids, IvfK2, IvfIters)
      // perturb FIRST, re-key SECOND (see q_embed_neardup_lsh_r8)
      val planted = base.where(col("vec_id") < 50)
        .select(col("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x.cast("double") +
              ((col("vec_id") * 64 + i) % 7 - 3).cast("double") * lit(0.001)).cast("float"))
            .as("embedding"))
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      VectorOps.semanticDedupClustered(clustered, planted, "vec_id", "embedding",
          centroids, threshold = 0.9)
        .orderBy("vec_id")
    }),

    // Approximate banded sign-LSH top-k — deterministic hyperplanes make
    // the bucketing engine-portable, so this too is oracle-checked (plus a
    // measured-recall ScalaTest against the brute-force baseline).
    "q_cosine_topk_lsh" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      VectorOps.cosineTopKLsh(emb, emb.where(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, bands = 8, planesPerBand = 2, dim = 64)
        .select(col("query_id"), col("corpus_id"), col("score"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // ── round 7d: relational surface + graph + series extensions ────────
    // Full outer join of two partially-overlapping per-customer aggregates
    // (orderkey %2 vs %3 slices): genuine null rows on BOTH sides, key
    // coalesced by the USING-style join.
    "q_join_full" -> ((s, dir) => {
      val ord = T(s, dir, "orders")
      val even = ord.where(col("o_orderkey") % 2 === 0).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_even"), Portable.decSum(col("o_totalprice")).as("spend_even"))
      val third = ord.where(col("o_orderkey") % 3 === 0).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_third"), Portable.decSum(col("o_totalprice")).as("spend_third"))
      even.join(third, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_even"), lit(0L)).as("n_even"),
          coalesce(col("n_third"), lit(0L)).as("n_third"),
          round(coalesce(col("spend_even"), lit(0.0)) + coalesce(col("spend_third"), lit(0.0)), 4)
            .as("spend_both"))
        .orderBy("o_custkey")
    }),

    // Null-safe equi join (<=> / IS NOT DISTINCT FROM): planted-null
    // nation keys match a planted null-keyed UNKNOWN dimension row — the
    // idiom for joining through nullable FKs without dropping rows.
    "q_join_nullsafe" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_custkey") % 50 === 0, lit(null).cast("int"))
            .otherwise(col("c_nationkey")).as("nk"))
      val nat = T(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("nk"), col("n_name"))
        .unionByName(s.range(1).select(lit(null).cast("int").as("nk"), lit("UNKNOWN").as("n_name")))
      cust.join(broadcast(nat), cust("nk") <=> nat("nk"))
        .select(cust("c_custkey"), cust("nk").as("nk"), nat("n_name"))
        .orderBy("c_custkey")
    }),

    // Wide→long unpivot (melt) of the part metrics — the reshape dual of
    // q_pivot; Spark's native `unpivot` keeps this a zero-shuffle
    // generator-style expansion.
    "q_unpivot" -> ((s, dir) =>
      T(s, dir, "part")
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size").cast("double").as("p_size"), col("p_retailprice")),
          "metric", "value")
        .orderBy("p_partkey", "metric")),

    // SCD Type 2 dimension history from two snapshots with planted segment
    // changes (%10), balance changes (%7), deletes (%97) and inserts
    // (%101 re-keyed) — unchanged keys stay open, changes close the old
    // row and open a new one, deletes close without a successor.
    "q_scd2" -> ((s, dir) => {
      val cur = T(s, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
      val nxt = cur.where(col("c_custkey") % 97 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 10 === 0, lit("ARCHIVE"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
            .otherwise(col("c_acctbal")).as("c_acctbal"))
        .unionByName(cur.where(col("c_custkey") % 101 === 0)
          .select((col("c_custkey") + 900000L).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal")))
      Relational.scdType2(cur, nxt, "c_custkey", Seq("c_mktsegment", "c_acctbal"),
          "2024-01-01", "2024-02-01")
        .orderBy("c_custkey", "valid_from")
    }),

    // Hourly VWAP per event type: exact-decimal weighted mean with a
    // deterministic synthetic volume (event_id-derived, replicated in the
    // oracle).
    "q_vwap" -> ((s, dir) =>
      TimeSeries.vwap(T(s, dir, "events"), "event_type",
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"),
          col("value"), (col("event_id") % 10 + 1).cast("double"))
        .select(col("event_type"), col("bucket"), round(col("vwap"), 9).as("vwap"),
          col("total_vol"), col("n_trades"))
        .orderBy("event_type", "bucket")),

    // Running peak-to-trough drawdown per user over the cumulative value
    // curve — exact-decimal prefix sums make the curve reproducible at any
    // partition count.
    "q_drawdown" -> ((s, dir) =>
      TimeSeries.drawdown(T(s, dir, "events"), "user_id", "ts", "event_id", "value")
        .select(col("event_id"), col("user_id"), col("equity"), col("peak"),
          round(col("drawdown"), 4).as("drawdown"))
        .orderBy("event_id")),

    // Consecutive-day activity streaks per user — the gaps-and-islands
    // idiom (longest streak, streak count, total active days).
    "q_streaks" -> ((s, dir) =>
      EventOps.activityStreaks(T(s, dir, "events"), "user_id", "ts")
        .orderBy("user_id")),

    // Frequency-ranked vocabulary with cumulative corpus coverage — the
    // tokenizer-budget diagnostic (top-100 types + share of all tokens).
    "q_vocab_coverage" -> ((s, dir) =>
      TextOps.vocabCoverage(T(s, dir, "documents"), "text", 100)
        .orderBy("rank")),

    // Market-basket co-occurrence: top part pairs ordered together —
    // bounded within-basket fan-out, never an all-pairs join. Support
    // counts come off the write-once PairStore artifact (r11 — the
    // ShingleStore lifecycle on the pair-support table: the fact scan +
    // basket explode is paid at the artifact write, and every
    // co-occurrence consumer reads the committed parquet); the
    // per-run plan is TakeOrderedAndProject + rank over the k survivors.
    "q_cooccur" -> ((s, dir) => {
      val w = Portable.kRowWindow(col("support").desc, col("item_a").asc, col("item_b").asc)
      graft.sources.PairStore.ensurePairs(s, dir)
        .orderBy(col("support").desc, col("item_a").asc, col("item_b").asc).limit(50)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select("rank", "item_a", "item_b", "support")
        .orderBy("rank")
    }),

    // Frequent 3-itemsets (r12): the next A-priori lattice level —
    // C(k,3) fan-out bounded by basket size, heap-ranked top-25. Reads
    // the persisted per-basket item-array artifact (the PairStore
    // lifecycle one lattice level up): the fact scan + set aggregation
    // was paid at the artifact write, the per-run plan explodes a
    // basket-count-sized parquet and touches lineitem ZERO times.
    "q_itemsets3" -> ((s, dir) =>
      Relational.frequentTriplesFromBaskets(
          graft.sources.PairStore.ensureBaskets(s, dir), "items", 25)
        .orderBy("rank")),

    // Association rules (r12): confidence and lift for both directed
    // rules of the top-50 supported pairs — computed ENTIRELY from the
    // two committed PairStore artifacts (pair supports + per-item basket
    // counts with the denormalized basket total). Zero lineitem scans
    // per run (plan-invariant-asserted); the 100-row rule side is
    // broadcast into the catalog-sized item table, never the reverse.
    "q_assoc_rules" -> ((s, dir) =>
      Relational.assocRules(
        graft.sources.PairStore.ensurePairs(s, dir),
        graft.sources.PairStore.ensureItems(s, dir), 50)
        .orderBy("rank")),

    // Two-iteration PageRank over the symmetrized customer↔supplier trade
    // graph (supplier ids offset to a disjoint space; symmetry removes
    // dangling mass) — exact-decimal contribution sums make the fixed
    // iteration oracle-checkable.
    "q_pagerank" -> ((s, dir) => {
      Graph.pageRank(tradeEdges(s, dir).toDF("src", "dst")
          .unionByName(tradeEdges(s, dir).select(col("supp").as("src"), col("cust").as("dst"))),
        "src", "dst", iters = 2, damping = 0.85)
        .select(col("id").as("node_id"), round(col("rank"), 9).as("rank"))
        .orderBy("node_id")
    }),

    // Two-iteration HITS over the DIRECTED customer→supplier trade graph
    // (r12) — the bipartite link-analysis complement to q_pagerank:
    // authority concentrates on the supplier side, hub on the customer
    // side, L1-normalized with exact-decimal sums so the fixed iteration
    // is oracle-checkable by unrolled CTEs.
    "q_hits" -> ((s, dir) =>
      Graph.hits(tradeEdges(s, dir), "cust", "supp", iters = 2)
        .select(col("id").as("node_id"), round(col("auth"), 9).as("auth"),
          round(col("hub"), 9).as("hub"))
        .orderBy("node_id")),

    // Bounded-hop weighted shortest paths (r12): Bellman-Ford relaxation
    // over the trade graph with integer edge costs (line-item count per
    // customer–supplier pair), 3 rounds from the low-key seed customers —
    // the C91 BFS generalized to additive weights; integer path sums keep
    // every min() engine-exact.
    "q_sssp" -> ((s, dir) => {
      val we = weightedTradeEdges(s, dir)
      val seeds = we.select("cust").where(col("cust") < 10).distinct()
      Graph.ssspWithinHops(we, "cust", "supp", "w", seeds, "cust", 3)
        .orderBy("id")
    }),

    // 3-core of the repeat-trade graph (r12): edges are customer–supplier
    // pairs trading in ≥ 2 line items — sparse enough that peeling
    // CASCADES (23 rounds at sf0.1), exercising the data-dependent loop;
    // the oracle unrolls 40 peel rounds (idempotent past the fixpoint).
    "q_kcore" -> ((s, dir) => {
      val repeat = weightedTradeEdges(s, dir).where(col("w") >= 2)
      Graph.kCore(repeat, "cust", "supp", k = 3)
        .select(col("id").as("node_id"), col("deg"))
        .orderBy("node_id")
    }),

    // PMI collocations (r12): every bigram with corpus count ≥ 20 scored
    // ln(p(ab)/(p(a)p(b))) — association strength, not raw frequency
    // (C67's complement). The floor keeps the output a deterministic SET;
    // the PMI double is one fixed-shape expression both engines evaluate
    // identically.
    "q_pmi" -> ((s, dir) =>
      TextOps.pmiCollocations(T(s, dir, "documents"), "text", minCount = 20)
        .orderBy("bigram")),

    // Per-domain KL divergence from the corpus unigram distribution
    // (r12): the mixture-drift diagnostic, absent-token mass folded in
    // closed form so no domain×vocabulary expansion ever materializes.
    "q_domain_kl" -> ((s, dir) =>
      TextOps.domainDivergence(T(s, dir, "documents"), "source", "text")
        .orderBy("domain")),

    // DSIR importance weights (r12): per-document hashed-unigram
    // log-likelihood ratio, target domain src0 vs the whole corpus —
    // the importance-resampling score that tilts a raw crawl toward a
    // target distribution (Xie et al. 2023).
    "q_dsir_weights" -> ((s, dir) =>
      TextOps.dsirWeights(T(s, dir, "documents"), "doc_id", "text",
          "source", "src0", nBuckets = 256)
        .orderBy("doc_id")),

    // Personalized PageRank (r12): teleport mass concentrated on the
    // low-key seed customers — rank decays with distance from the seed
    // set (nodes beyond 2 hops hold exactly 0 at 2 iterations), the
    // seed-expansion / related-item primitive.
    "q_ppr" -> ((s, dir) => {
      val sym = tradeEdges(s, dir).toDF("src", "dst")
        .unionByName(tradeEdges(s, dir).select(col("supp").as("src"), col("cust").as("dst")))
      val seeds = tradeEdges(s, dir).select("cust").where(col("cust") < 10).distinct()
      Graph.personalizedPageRank(sym, "src", "dst", seeds, "cust", iters = 2)
        .select(col("id").as("node_id"), round(col("rank"), 9).as("rank"))
        .orderBy("node_id")
    }),

    // TextRank keyword scores (r12): two PageRank iterations over the
    // word co-occurrence graph, string-keyed (no vocabulary-wide id
    // window) — structural keywording beyond raw frequency.
    "q_textrank" -> ((s, dir) =>
      TextOps.textRank(T(s, dir, "documents"), "text", iters = 2)
        .select(col("token"), round(col("rank"), 9).as("rank"))
        .orderBy("token")),

    // Embedding covariance matrix (r12): the d(d+1)/2 upper-triangular
    // entries that feed PCA/whitening — served from the persisted
    // MomentStore partials since r19 (decimal partial sums merge
    // exactly, so the derived matrix is bit-identical to the direct
    // row-local fan and the oracle is unchanged; at 100 TB the corpus
    // is never re-scanned per audit).
    "q_embed_cov" -> ((s, dir) => {
      val m = graft.sources.MomentStore.ensure(s, dir)
      VectorOps.covarianceFromMoments(m.cells, m.dims, graft.sources.MomentStore.Dim)
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("n"), col("cov"))
        .orderBy("i", "j")
    }),

    // ── round 7e: feature engineering + graph profile + CDC ─────────────
    // Rolling 20-row autocorrelation (value vs lag-value) per user: five
    // exact-decimal window sums → bit-stable Pearson coefficient;
    // degenerate frames yield null.
    "q_rolling_corr" -> ((s, dir) => {
      val ev = T(s, dir, "events")
        .withColumn("value_lag", lag(col("value"), 1).over(
          Window.partitionBy("user_id").orderBy(col("event_id").asc)))
        .where(col("value_lag").isNotNull)
      TimeSeries.rollingCorr(ev, "user_id", "event_id", "value", "value_lag", 20)
        .select(col("event_id"), col("user_id"), round(col("roll_corr"), 6).as("roll_corr"))
        .orderBy("event_id")
    }),

    // Per-type min-max feature scaling — broadcast extrema, null on
    // degenerate groups.
    "q_minmax_scale" -> ((s, dir) =>
      Profiling.minMaxScale(T(s, dir, "events").select("event_id", "event_type", "value"),
          Seq("event_type"), "value")
        .select("event_id", "event_type", "value", "scaled")
        .orderBy("event_id")),

    // One-hot encoding against the fixed segment vocabulary (explicit, not
    // inferred — schema stability under batch/stream reuse).
    "q_onehot" -> ((s, dir) =>
      Relational.oneHot(T(s, dir, "customer"), "c_custkey", "c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .orderBy("c_custkey")),

    // Feature hashing (hashing trick): md5-bucketed term frequencies,
    // sparse vector serialized deterministically — stateless, no
    // vocabulary fit.
    "q_feature_hash" -> ((s, dir) =>
      TextOps.featureHash(T(s, dir, "documents"), "doc_id", "text", 256)
        .orderBy("doc_id")),

    // Degree distribution of the trade graph — the hub/skew profile.
    "q_degree_dist" -> ((s, dir) =>
      Graph.degreeDistribution(tradeEdges(s, dir), "cust", "supp")
        .orderBy("degree")),

    // CDC changelog application (MERGE INTO kernel): planted updates (%5,
    // version 2), deletes (%11, version 3 — beats the %55 overlap's
    // update) and inserts (%13 re-keyed, version 1); latest version per
    // key wins, D suppresses. Even %11 keys ALSO carry an update at the
    // SAME version 3 — an exact (key, version) tie the explicit D > U > I
    // op priority must resolve toward the delete (were the tie broken by
    // the op string's own descending collation, U > D, those keys would
    // resurrect with the +999 payload and the hash check would catch it).
    "q_cdc_apply" -> ((s, dir) => {
      val cust = T(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      val upd = cust.where(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"), lit("U").as("op"), lit(2L).as("version"),
          col("c_name"), (col("c_acctbal") + lit(50.0)).as("c_acctbal"))
      val del = cust.where(col("c_custkey") % 11 === 0)
        .select(col("c_custkey"), lit("D").as("op"), lit(3L).as("version"),
          col("c_name"), col("c_acctbal"))
      val updTie = cust.where(col("c_custkey") % 11 === 0 && col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), lit("U").as("op"), lit(3L).as("version"),
          col("c_name"), (col("c_acctbal") + lit(999.0)).as("c_acctbal"))
      val ins = cust.where(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + 500000L).as("c_custkey"), lit("I").as("op"),
          lit(1L).as("version"), concat(col("c_name"), lit("_new")).as("c_name"),
          col("c_acctbal"))
      Relational.cdcApply(cust, upd.unionByName(del).unionByName(updTie).unionByName(ins),
          "c_custkey", "op", "version", Seq("c_name", "c_acctbal"))
        .orderBy("c_custkey")
    }),

    // Month-over-month revenue change per order priority — lag-window
    // period deltas over exact-decimal monthly sums.
    "q_pop_change" -> ((s, dir) =>
      TimeSeries.periodChange(T(s, dir, "orders"), "o_orderpriority",
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd"),
          col("o_totalprice"))
        .select(col("o_orderpriority"), col("period"), col("revenue"),
          col("prev_revenue"), round(col("abs_change"), 4).as("abs_change"),
          col("pct_change"))
        .orderBy("o_orderpriority", "period")),

    // Two-hop BFS reachability from low-key seed customers over the trade
    // graph, labeled with minimum hop distance.
    "q_bfs_2hop" -> ((s, dir) => {
      val e0 = tradeEdges(s, dir)
      val seeds = e0.select("cust").where(col("cust") < 10).distinct()
      Graph.bfsWithinHops(e0, "cust", "supp", seeds, "cust", 2)
        .orderBy("id")
    }),

    // ── TPC-H subquery shapes, batch 2 (SURVEY C92–C95) ────────────────

    // Max-of-aggregate (TPC-H Q15 shape): top supplier(s) by quarterly
    // revenue. The per-supplier aggregate is computed once; the global max
    // is a 1-row aggregate OF that result broadcast back — Q15's "view
    // referenced twice" never rescans the fact table.
    "q_max_of_agg" -> ((s, dir) => {
      val rev = T(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(Portable.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("_mx"))
      rev.crossJoin(broadcast(mx))
        .where(col("total_revenue") === col("_mx"))
        .select(col("l_suppkey"), col("total_revenue"))
        .orderBy("l_suppkey")
    }),

    // Correlated scalar average (TPC-H Q17 shape): revenue locked in
    // small-lot orders — lines under 20 % of their part's average
    // quantity. The correlated subquery decorrelates to a per-part
    // aggregate joined back on the key; the threshold side carries two
    // columns only, so at 100 TB the join ships |parts| rows, not lines.
    "q_correlated_avg" -> ((s, dir) => {
      val avgQty = T(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(Portable.decAvg(col("l_quantity"), 4).as("avg_qty"))
      T(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(avgQty, Seq("l_partkey"))
        .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(Portable.decSum(col("l_extendedprice"), 4).as("small_lot_revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // IN-subquery with HAVING (TPC-H Q18 shape): large-volume orders —
    // the grouped-HAVING subquery reduces to a pre-aggregated inner join
    // carrying (orderkey, total_qty), so the "IN" never materializes a
    // list; customer attaches afterwards on the already-filtered orders.
    "q_semi_having" -> ((s, dir) => {
      val big = T(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(Portable.decSum(col("l_quantity"), 2).as("total_qty"))
        .where(col("total_qty") > 300.0)
      T(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(T(s, dir, "customer").select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy("o_orderkey")
    }),

    // Nested aggregate share predicate (TPC-H Q20 shape, adapted to the
    // schema at hand): suppliers shipping more than 3× their fair share
    // of a part's volume. Two-level aggregate — (part, supplier) rollup,
    // then part totals from THAT result — followed by a share predicate
    // kept multiplicative (sq·n > 3·total) so no division enters the
    // hash-checked columns.
    "q_dominant_supplier" -> ((s, dir) => {
      val ps = T(s, dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(Portable.decSum(col("l_quantity"), 2).as("supp_qty"))
      // r21 (guide §2.4): the per-part totals ride a WINDOW over the
      // (part, supp) rollup instead of a second aggregate joined back —
      // same two exchanges, but the self-join (and its SMJ sorts over
      // the rollup) disappears; the window's decimal sum adds the same
      // supp_qty terms the joined aggregate summed, so part_qty is
      // bit-identical
      val wPart = Window.partitionBy("l_partkey")
      ps.withColumn("part_qty",
          sum(col("supp_qty").cast("decimal(28,2)")).over(wPart).cast("double"))
        .withColumn("n_supps", count(lit(1)).over(wPart))
        .where(col("n_supps") >= 2 &&
               col("supp_qty") * col("n_supps") > col("part_qty") * lit(3.0))
        .select(col("l_partkey"), col("l_suppkey"), col("supp_qty"),
          col("part_qty"), col("n_supps"))
        .orderBy("l_partkey", "l_suppkey")
    }),

    // EXISTS + NOT-EXISTS combination (TPC-H Q21 shape, adapted —
    // returnflag stands in for the missing receipt/commit dates):
    // suppliers who were the SOLE returns-flagged supplier on orders
    // served by several suppliers. Both correlated subqueries collapse
    // into one per-(order, supplier) rollup consumed twice: counting two
    // DISTINCTs directly would expand every row ×3 (Spark's multi-distinct
    // rewrite — benched 8.3 s); aggregating the deduped rollup instead
    // runs the same two order-key shuffles at 1/3 the rows (2.6 s).
    "q_sole_return_supplier" -> ((s, dir) => {
      val perSupp = T(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("has_r"))
      val stats = perSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum(col("has_r")).as("n_r_supp"))
      perSupp.where(col("has_r") === 1L)
        .select("l_orderkey", "l_suppkey")
        .join(stats.where(col("n_supp") >= 2 && col("n_r_supp") === 1),
          Seq("l_orderkey"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey"))
    }),

    // ── reconciliation + sequence modeling + model fit (C96–C98) ───────

    // Block-hash reconciliation (anti-entropy): the diff between the base
    // customer snapshot and a drifted replica (planted deletes/updates/
    // inserts), computed by exchanging 64 per-block digests and diffing
    // ONLY mismatched blocks. The oracle is the brute-force full diff —
    // hash equality proves the digest pruning lost nothing.
    "q_block_diff" -> ((s, dir) => {
      val base = T(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      val replica = base.where(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 6 === 0, col("c_acctbal") + 10.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
        .unionByName(base.where(col("c_custkey") < 50)
          .select((col("c_custkey") + 2000000L).as("c_custkey"), col("c_name"),
            col("c_acctbal")))
      Relational.blockDiff(base, replica, Seq("c_custkey"),
          Seq("c_name", "c_acctbal"), nBlocks = 64)
        .orderBy("c_custkey")
    }),

    // First-order Markov transitions over per-user event sequences: the
    // session-modeling primitive. One lead() window on the (user, time)
    // sort Spark already needs for sessionization, then a hash aggregate
    // on the (from, to) pair — the from-state total rides a window over
    // the 25-row aggregated transition matrix, not the event stream.
    "q_markov_chain" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .where(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("transitions"))
        .withColumn("from_total",
          sum(col("transitions")).over(Window.partitionBy("event_type")))
        .orderBy("event_type", "next_type")
    }),

    // Per-group OLS trend fit: value-vs-time slope and intercept per
    // event type from one pass of exact-decimal sufficient statistics
    // (ops/Profiling.groupOls) — x is hours since the corpus epoch so the
    // normal equations stay well-conditioned in double.
    "q_group_ols" -> ((s, dir) =>
      Profiling.groupOls(T(s, dir, "events"), Seq("event_type"),
          floor(unix_timestamp(col("ts")) / 3600L) - lit(473352L),
          col("value"))
        .orderBy("event_type")),

    // First 8 BPE tokenizer-training merges over the document corpus —
    // per-round corpus-wide pair count + greedy row-local rewrite, the
    // loop state localCheckpoint'ed per round so round r never re-folds
    // the corpus through rounds 1..r-1 (ops/TextOps.bpeTrainMerges).
    // Fully oracle-checked since r12: bpeMergesSql replays the 8
    // training rounds as chained DuckDB CTEs (per-round pair-count
    // argmax under the cnt-desc-then-lexicographic tie rule + the greedy
    // rewrite as replace() over the '|'-delimited state q_bpe_encode's
    // oracle already proved sound). Trains once per JVM and persists the
    // 8-row model (ops/BpeModel — the IvfIndex artifact lifecycle).
    "q_bpe_merges" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      BpeModel.mergesFor(dir, BpeN) {
          TextOps.bpeTrainMerges(T(s, dir, "documents"), "text", BpeN)
        }
        .map { case (i, a, b, cnt) => (i, a, b, cnt, a + b) }
        .toDF("iteration", "pair_a", "pair_b", "support", "merged")
        .orderBy("iteration")
    }),

    // BPE ENCODE: apply the trained 8-merge table (same artifact as
    // q_bpe_merges) to tokenize every document — the step a training
    // pipeline actually runs over the corpus. Pure projection (row-local
    // folds, zero shuffle). Fully oracle-checked: the greedy
    // left-to-right non-overlapping merge fold is replayed in DuckDB as
    // nested replace() over a '|'-delimited token string (replace scans
    // left-to-right, continues AFTER each replacement, and the corpus
    // has no '|' in any token — engine-identical semantics incl. the
    // "a a a" overlap rule), with the merge pairs embedded as literals
    // the way the PQ oracle embeds codebooks.
    "q_bpe_encode" -> ((s, dir) => {
      val merges = BpeModel.mergesFor(dir, BpeN) {
        TextOps.bpeTrainMerges(T(s, dir, "documents"), "text", BpeN)
      }
      TextOps.bpeEncode(T(s, dir, "documents"), "doc_id", "text",
          merges.map { case (_, a, b, _) => (a, b) })
        .orderBy("doc_id")
    }),

    // Tokenizer fertility by language: chars-per-BPE-token and
    // raw-to-BPE compression under the committed merge table — the
    // diagnostic that shows WHICH languages a tokenizer punishes
    // (under-merged languages pay more tokens per char, i.e. more
    // compute per byte of training signal). Encode is row-local; one
    // lang hash agg of exact integer sums; the two ratios are the only
    // floating steps.
    "q_bpe_fertility" -> ((s, dir) => {
      val merges = BpeModel.mergesFor(dir, BpeN) {
        TextOps.bpeTrainMerges(T(s, dir, "documents"), "text", BpeN)
      }
      val docs = T(s, dir, "documents")
      TextOps.bpeEncode(docs, "doc_id", "text", merges.map { case (_, a, b, _) => (a, b) })
        .join(docs.select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("_chars")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("_chars").as("n_chars"),
          sum("n_tokens_raw").as("n_raw"),
          sum("n_tokens_bpe").as("n_bpe"))
        .select(col("lang"), col("n_docs"), col("n_chars"), col("n_raw"), col("n_bpe"),
          when(col("n_bpe") > 0,
            round(col("n_chars").cast("double") / col("n_bpe").cast("double"), 6))
            .as("chars_per_token"),
          when(col("n_bpe") > 0,
            round(col("n_raw").cast("double") / col("n_bpe").cast("double"), 6))
            .as("compression"))
        .orderBy("lang")
    }),

    // Segment market share per year (TPC-H Q8 shape): ratio of a
    // conditional revenue sum to the total revenue within each group —
    // numerator and denominator fall out of ONE aggregate pass (a CASE
    // inside the sum), so the share needs no self-join; both sums are
    // exact decimal and the ratio is the only floating step (identical
    // IEEE division in both engines, rounded for stability).
    "q_market_share" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
        .join(T(s, dir, "orders").select("o_orderkey", "o_custkey",
          "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          Portable.decSum(when(col("c_mktsegment") === "BUILDING", col("volume"))
            .otherwise(lit(0.0)), 6).as("building_rev"),
          Portable.decSum(col("volume"), 6).as("total_rev"))
        .withColumn("mkt_share",
          round(col("building_rev") / col("total_rev"), 9))
        .orderBy("o_year")),

    // Disjunctive multi-predicate scan (TPC-H Q19 shape): an OR of three
    // (brand, size-range, quantity-range) conjunct groups. The point is
    // the PLAN, not the arithmetic: Catalyst extracts the common
    // l_quantity bounds and p_brand IN (...) from the disjunction and
    // pushes them into both parquet scans, so the join sees a fraction of
    // each table and the full OR evaluates only as the post-join residual
    // — the shape naive engines evaluate row-by-row over the whole join.
    "q_disjunctive" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(T(s, dir, "part").select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity") >= 25))
        .agg(
          Portable.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("revenue"),
          count(lit(1)).as("n_rows"))),

    // Per-node triangle participation over the part co-occurrence graph
    // (parts sharing an order = an edge) — the clustering/community
    // primitive. Degree-ordered orientation bounds the wedge fan-out by
    // O(√m) per apex independent of hub skew; see Graph.triangleCounts.
    // Top-20 nodes by triangle count (ties by id).
    "q_triangles" -> ((s, dir) => {
      // the co-occurrence edge set is the PairStore artifact's key set —
      // distinct by construction (one row per unordered pair)
      val edges = graft.sources.PairStore.ensurePairs(s, dir)
        .select(col("item_a").as("pa"), col("item_b").as("pb"))
      Graph.triangleCounts(edges, "pa", "pb")
        .orderBy(col("triangles").desc, col("node_id").asc).limit(20)
        .withColumn("rank", row_number().over(
          Portable.kRowWindow(col("triangles").desc, col("node_id").asc)).cast("long"))
        .select("rank", "node_id", "triangles")
    }),

    // Per-node clustering coefficient on the co-occurrence item graph —
    // the closed-wedge fraction over the SAME pair-artifact edge set as
    // q_triangles (community-embedded items vs pure connectors); exact
    // counts, one fixed-shape division per node.
    "q_clustering_coef" -> ((s, dir) => {
      val edges = graft.sources.PairStore.ensurePairs(s, dir)
        .select(col("item_a").as("pa"), col("item_b").as("pb"))
      Graph.clusteringCoefficients(edges, "pa", "pb")
        .orderBy("node_id")
    }),

    // Degree assortativity of the co-occurrence graph — Newman's r over
    // the directed double cover; hubs-link-hubs vs hubs-link-leaves in
    // one exact-moment scalar.
    "q_assortativity" -> ((s, dir) => {
      val edges = graft.sources.PairStore.ensurePairs(s, dir)
        .select(col("item_a").as("pa"), col("item_b").as("pb"))
      Graph.degreeAssortativity(edges, "pa", "pb")
    }),

    // Rich-club coefficient ladder: edge density among nodes of degree
    // > k — do the hubs form their own clique?
    "q_rich_club" -> ((s, dir) => {
      val edges = graft.sources.PairStore.ensurePairs(s, dir)
        .select(col("item_a").as("pa"), col("item_b").as("pb"))
      Graph.richClub(edges, "pa", "pb", Seq(64, 128, 160, 192))
        .orderBy("k")
    }),

    // Synchronous label-propagation communities, 3 fixed rounds
    // (most-frequent neighbor label, ties to the smallest — exact
    // integers, deterministic in any engine).
    "q_label_prop" -> ((s, dir) => {
      val edges = graft.sources.PairStore.ensurePairs(s, dir)
        .select(col("item_a").as("pa"), col("item_b").as("pb"))
      // edgesDistinct: PairStore pairs are a unique a<b set — the
      // symmetrized double cover needs no dedup shuffle
      Graph.labelPropagation(edges, "pa", "pb", iters = 3, edgesDistinct = true)
        .orderBy("id")
    }),

    // Deterministic DeepWalk corpus: one 3-hop walk per seed (nodes
    // < 50), next hop = neighbor minimizing the portable hash of
    // (seed, step, neighbor) — a seeded PRNG made engine-portable, so
    // the walk corpus is reproducible AND oracle-checkable hop by hop;
    // the seed-sized frontier broadcasts into the loop-invariant edge
    // list (scanned, never shuffled).
    "q_walks" -> ((s, dir) => {
      val edges = graft.sources.PairStore.ensurePairs(s, dir)
        .select(col("item_a").as("pa"), col("item_b").as("pb"))
      val seeds = edges.select(col("pa").as("id"))
        .union(edges.select(col("pb").as("id")))
        .where(col("id") < 50).distinct()
      Graph.deterministicWalks(edges, "pa", "pb", seeds, "id", steps = 3,
          edgesDistinct = true)
        .orderBy("seed", "step")
    }),

    // Exact threshold-Jaccard self-join via prefix filtering (AllPairs/
    // PPJoin): candidates only from each document's rarest
    // (|d| − ⌈t·|d|⌉ + 1) shingles under one global rarity order — the
    // hot shingles that blow up the naive shared-shingle join never
    // enter the candidate join, LOSSLESSLY (vs the DF guard's lossy
    // drop). Corpus-wide (no id-range cap); brute-force oracle proves no
    // pair is missed. df + rarity rank come pre-annotated off the
    // artifact (r9): the per-run plan starts at the prefix filter.
    "q_jaccard_prefix" -> ((s, dir) =>
      TextOps.jaccardPrefixJoinAnnotated(
          graft.sources.ShingleStore.ensureShingles(s, dir, 3), "doc_id", 0.5)
        .orderBy("id_a", "id_b")),

    // Asymmetric containment near-dup join (r12): ≥ 4/5 of A's shingles
    // inside B — the sub-document duplication signal Jaccard misses;
    // contained-side prefix filter over the annotated ShingleStore,
    // exact-rational threshold (integer cross-multiplication, no float
    // tie on the keep/drop boundary).
    "q_containment" -> ((s, dir) =>
      TextOps.containmentJoinFromShingles(
          graft.sources.ShingleStore.ensureShingles(s, dir, 3), "doc_id", num = 4, den = 5)
        .orderBy("id_a", "id_b")),

    // Reciprocal-rank fusion of two retrieval shortlists — lexical BM25
    // and the unigram-LM quality ranking, each a top-100 list (ties on
    // the rounded score broken by doc_id, so both ranks are
    // engine-deterministic); fused score Σ 1/(60 + rank), top-20 out.
    "q_rrf_fuse" -> ((s, dir) =>
      Relational.rrfFuse(Seq(bm25Rank(s, dir), lmRank(s, dir)), "doc_id", 60, 20)),

    // Rank-biased overlap (r12) between the same two top-100 retrieval
    // lists q_rrf_fuse fuses — the top-weighted ranker-similarity
    // diagnostic (RBO ≈ 1 ⇒ redundant rankers, ≈ 0 ⇒ orthogonal);
    // p = 0.9 weights prefix k by p^(k−1), both rank lists are
    // engine-deterministic (ties on the rounded score break by doc_id).
    "q_rbo" -> ((s, dir) =>
      Relational.rankBiasedOverlap(bm25Rank(s, dir), lmRank(s, dir),
        "doc_id", "rank", p = 0.9, depth = 100)),

    // nDCG@50 of the BM25 ranking judged by LM-derived pseudo-relevance
    // (grades 5..1 by 20-rank LM buckets — the q_rbo ranking pair recast
    // as system-vs-judgments).
    "q_ndcg" -> ((s, dir) => {
      val rels = lmRank(s, dir).select(col("doc_id"),
        (lit(5L) - floor((col("rank") - 1).cast("double") / 20.0).cast("long")).as("rel"))
      Relational.ndcgAtK(bm25Rank(s, dir), rels, "doc_id", "rank", "rel", k = 50)
    }),

    // Binary-relevance retrieval metrics (MRR / P@20 / R@20 / AP@20) of
    // the BM25 top-100. Relevant = even-id documents containing >= 2
    // distinct query terms: the term floor ties relevance to the query,
    // the id-parity cut stands in for an external labeler who marked
    // only half the matching docs — so the top-20 mixes hits and misses
    // and every metric path (first-hit, cum-precision, miss) is
    // exercised at corpus scale. Memoized BM25 ranking; judgments
    // broadcast; the term filter lands before the explode's aggregation
    // so the shuffle carries query-term tokens only.
    "q_retrieval_metrics" -> ((s, dir) => {
      val rels = T(s, dir, "documents")
        .where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .where(col("token").isin(Bm25Terms: _*))
        .groupBy("doc_id").agg(count_distinct(col("token")).as("_nt"))
        .where(col("_nt") >= 2).select("doc_id")
      Relational.retrievalMetrics(bm25Rank(s, dir), rels, "doc_id", "rank", k = 20)
    }),

    // Per-source 2-D skyline over (token count, distinct-token count) —
    // the Pareto curation cut: keep a document iff no same-source doc is
    // at least as long AND at least as lexically rich (strictly better
    // on one). Both coordinates row-local integers off the pruned
    // (doc_id, source, text) scan; dominance is two windows on ONE
    // source-hash exchange (no self-join).
    "q_skyline" -> ((s, dir) => {
      val profiled = T(s, dir, "documents").select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(TextOps.tokens(col("text")))).cast("long").as("n_distinct"))
      Relational.skyline2D(profiled, "source", "n_tokens", "n_distinct")
        .orderBy(col("source"), col("n_tokens").desc, col("doc_id"))
    }),

    // Per-user autocorrelation of event values at lags 1..3 — the
    // periodicity profile of a behavior stream (flat-high ACF = scripted
    // traffic; the temporal cousin of q_burstiness). One user exchange,
    // lags fanned row-locally, exact decimal moments.
    "q_acf" -> ((s, dir) =>
      TimeSeries.acf(T(s, dir, "events"), "user_id", "event_id", "value", maxLag = 3)
        .orderBy("user_id", "lag")),

    // Adamic-Adar link prediction over the repeat-trade affiliation
    // graph: customer pairs scored by shared repeat-suppliers, each
    // weighted 1/ln(degree) — rare shared affiliations dominate. The
    // w >= 2 projection bounds per-supplier degree (the q_kcore
    // derivation, session-memoized), keeping the wedge join linear-ish.
    "q_adamic_adar" -> ((s, dir) =>
      Graph.adamicAdarBipartite(
        weightedTradeEdges(s, dir).where(col("w") >= 2), "cust", "supp", topK = 50)),

    // Content-defined chunking + cross-doc dup rollup: boundaries fall
    // where the 8-gram hash mod 64 = 0 (content decides the cut, not the
    // offset — the insertion-robust storage-dedup granularity the fixed
    // stride grids lack); every doc carries the planted license header,
    // whose interior chunks must dedup corpus-wide.
    "q_cdc_chunks" -> ((s, dir) => {
      val planted = T(s, dir, "documents").select(col("doc_id"),
        concat(lit(CdcHeader), col("text")).as("text"))
      TextOps.cdcDupStats(TextOps.cdcChunks(planted, "doc_id", "text"), "doc_id")
        .orderBy("doc_id")
    }),

    // In-sample Naive Bayes language-ID confusion matrix — the
    // classifier-shape sanity floor (which labels can the token
    // distributions already separate?): add-1 multinomial NB trained and
    // scored on the corpus, argmax ties to the smaller label; label²
    // rows out.
    "q_nb_confusion" -> ((s, dir) =>
      TextOps.naiveBayesConfusionCached(T(s, dir, "documents"), "lang", "text",
          "doc_id", s, dir)
        .orderBy("true_label", "pred_label")),

    // In-engine trained logistic-regression quality classifier (r20) —
    // the DISCRIMINATIVE member of the classifier family (q_nb_confusion
    // is the closed-form generative floor): English-vs-rest over C87's
    // hashed token features + intercept, 8 diagonal-Newton iterations in
    // the C311 decimal-snapshot discipline (exact z, one rounded
    // sigmoid per doc-iteration, 9-dp weight rounds), oracle-replayed
    // as unrolled CTE rounds. Read-out: the 65-weight catalog with the
    // in-sample Mann-Whitney AUC of the exact linear score and the
    // z>0 accuracy repeated.
    "q_logreg" -> ((s, dir) =>
      Classify.logisticRegression(T(s, dir, "documents"), "doc_id",
          "text", col("lang") === "en", nBuckets = 64, iters = 8,
          lambda = 0.1)
        .orderBy("bucket")),

    // Cohen's kappa of the NB language-ID against the true labels —
    // chance-corrected agreement (accuracy rewards majority-class
    // guessing; kappa subtracts the margin-product chance rate). Rides
    // the same confusion matrix; all counts exact, po/pe/kappa the only
    // floating steps.
    "q_cohens_kappa" -> ((s, dir) =>
      Profiling.cohensKappa(
        TextOps.naiveBayesConfusionCached(T(s, dir, "documents"), "lang", "text",
          "doc_id", s, dir),
        "true_label", "pred_label", "n_docs")),

    // Entropy rate of the event-type Markov chain: H = Σ_i π_i H(row i)
    // — how predictable is the behavior stream per step (the scalar
    // q_markov_acc's top-1 accuracy reads pointwise). Rides the
    // q_markov_chain transition shape; −p·ln p terms decimal-summed.
    "q_markov_entropy" -> ((s, dir) =>
      EventOps.markovEntropyRate(T(s, dir, "events"), "user_id", "ts",
        "event_id", "event_type")),

    // Entropy decomposition of lang × source: H(A), H(B), H(A,B),
    // H(A|B), and mutual information — the information-theoretic
    // companion of q_chi2 (chi2 says the association is real; MI says
    // how much it carries).
    "q_cond_entropy" -> ((s, dir) =>
      Profiling.labelEntropies(T(s, dir, "documents"), "lang", "source")),

    // Hash-block bootstrap SE of the mean doc length: 32 deterministic
    // md5 blocks, block-mean spread / sqrt(B) — the cluster-robust
    // uncertainty a pipeline attaches to any headline average, RNG-free.
    "q_bootstrap_se" -> ((s, dir) =>
      Profiling.blockBootstrapSe(T(s, dir, "documents"), col("doc_id"),
        col("n_chars"), b = 32)),

    // Per-source ROC AUC of the stopword-ratio quality score as an
    // English detector — the threshold-free "does this score separate
    // the classes" evaluation run before picking a filter cutoff.
    // Mann-Whitney rank form, all-integer until ONE final division
    // (engine-exact, unrounded); one source exchange serves both the
    // distinct-score agg and the cumulative window.
    "q_auc" -> ((s, dir) =>
      Profiling.rocAuc(stopwordScored(s, dir, col("source"), col("lang")),
          "source", col("_score"), col("lang") === "en")
        .orderBy("source")),

    // PSI drift gate between the deterministic train split and the rest
    // of the corpus over doc-length bins — did the md5-bucket split
    // preserve the length distribution? Binning is symbolic (bit-length
    // of n_chars: no transcendental on the keying path); add-1 smoothed
    // shares, (p−q)·ln(p/q) contributions decimal-summed.
    "q_psi" -> ((s, dir) => {
      val split = Relational.splitAssign(
        T(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      Profiling.psiReport(split, col("split") === "train", col("n_chars"))
    }),

    // Per-source two-sample Kolmogorov-Smirnov distance against the rest
    // of the corpus on doc length — which crawl's size distribution
    // drifted. The sup gap is found over integer cross-products (no
    // per-step division) with ONE division at the end: engine-exact,
    // unrounded; both ECDFs run inside the per-source window over the
    // distinct-value grid (no global window).
    "q_ks_drift" -> ((s, dir) =>
      Profiling.ksByGroup(T(s, dir, "documents"), "source", col("n_chars"))
        .orderBy("source")),

    // Embedding-space drift between the md5 train split and the rest:
    // cosine + L2 of the per-cohort mean vectors — the representation-
    // level counterpart of q_psi's scalar drift gate (a feature can
    // hold still while the embedding space rotates under it).
    "q_embed_drift" -> ((s, dir) => {
      val ref = Portable.hash32(col("vec_id")) % 10000 < 8000
      VectorOps.embeddingDrift(T(s, dir, "embeddings"), ref, "embedding")
    }),

    // Per-source centroid similarity matrix — WHICH sources are
    // semantically close (the mixing map read before merging
    // near-duplicate domains): embeddings joined to their documents,
    // per-source decimal centroid, k x k pairwise cosine + L2 over the
    // source catalog.
    // Served from the MomentStore per-(source, dim) first-moment
    // partials since r19 — same bits, zero corpus work at read time.
    "q_source_sim" -> ((s, dir) =>
      VectorOps.sourceCentroidSimilarityFromMoments(
          graft.sources.MomentStore.ensure(s, dir).dims,
          graft.sources.MomentStore.Dim)
        .orderBy("g_a", "g_b")),

    // Second-moment drift between the same md5 cohorts — the
    // SHAPE-sensitive companion of q_embed_drift (centroid comparison
    // is blind to a variance expansion around an unchanged mean):
    // Frobenius distance/cosine of the uncentered E[xx^T] matrices,
    // exactly the quadratic-kernel MMD².
    // Served from the MomentStore cohort cell partials since r19: the
    // md5-cohort conditional decimal sums ARE the store's columns, so
    // the read is one roll-up over 2,080 xx-block rows.
    "q_moment_drift" -> ((s, dir) =>
      VectorOps.secondMomentDriftFromMoments(
        graft.sources.MomentStore.ensure(s, dir).cells,
        graft.sources.MomentStore.Dim)),

    // Label-error candidates (confident-learning instinct): docs whose
    // NB score under some OTHER language beats their own label's,
    // ranked by margin — the "audit these labels first" queue; rides
    // the shared NB scores core.
    "q_label_suspects" -> ((s, dir) =>
      TextOps.nbLabelSuspects(T(s, dir, "documents"), "lang", "text", "doc_id",
        topK = 20)),

    // Newman modularity of LANGUAGE labels over the SimHash near-dup
    // graph (memoized: the banded candidate join is paid once per
    // session) — does duplication stay inside a language or cross it?
    // Q_c from exact integer counts; two divisions + one multiply are
    // the only floating steps.
    "q_modularity" -> ((s, dir) => {
      val pairs = TextOps.simHashNearDupCached(
        T(s, dir, "documents"), "doc_id", "text", 3, s, dir).select("id_a", "id_b")
      // near-dup pairs are unique with id_a < id_b by construction —
      // the dedup shuffle is provably redundant here
      Graph.modularity(pairs, "id_a", "id_b",
        T(s, dir, "documents"), "doc_id", "lang", edgesDistinct = true)
    }),

    // Length-3 sequential-pattern mining (PrefixSpan instinct): which
    // event-type subsequences (gaps allowed) are frequent across users —
    // the mining complement of q_funnel's given-pattern count. The
    // subsequence test collapses to "a b-event strictly between first-a
    // and last-c" via one (user, type) span aggregate.
    "q_seq_patterns" -> ((s, dir) =>
      EventOps.sequencePatterns(T(s, dir, "events"), "user_id", "event_id",
        "event_type", topK = 20)),

    // Two-sided CUSUM changepoint statistics per user (Page 1954) — the
    // sequential drift detector: clamp-at-0 excess above/below the
    // series' own mu +/- 0.5 sigma band, alarm past 5 sigma. The
    // mapPartitions recurrence (q_ewma/q_holt shape); the oracle
    // replays it with the prepend-0 list fold.
    "q_cusum" -> ((s, dir) =>
      TimeSeries.cusum(T(s, dir, "events"), "user_id", "event_id", "value",
          k = 0.5, h = 5.0)
        .orderBy("event_id")),

    // Cumulative-gains / lift table per source of the stopword-ratio
    // score vs the English label — "how much of the good stuff sits in
    // the top decile": ntile over a unique (score desc, doc_id) order,
    // exact counts, fixed-shape capture/lift divisions.
    "q_gains" -> ((s, dir) => {
      val t = TextOps.tokens(col("text"))
      val scored = T(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("lang"),
          size(filter(t, x => x.isin(TextOps.Stopwords: _*))).cast("double")
            ./(size(t).cast("double")).as("_score"))
        .where(size(t) > 0)
      Profiling.gainsTable(scored, "source", col("_score"),
        col("lang") === "en", col("doc_id"), 10)
    }),

    // Precision-constrained cutoff per source: the deepest stopword-
    // ratio threshold keeping cumulative precision >= 3/5 on the
    // English label — the actionable "where to cut" end of the eval
    // family; the test is an exact integer cross-multiplication.
    "q_threshold_pick" -> ((s, dir) => {
      val t = TextOps.tokens(col("text"))
      val scored = T(s, dir, "documents")
        .select(col("source"), col("lang"),
          size(filter(t, x => x.isin(TextOps.Stopwords: _*))).cast("double")
            ./(size(t).cast("double")).as("_score"))
        .where(size(t) > 0)
      Profiling.thresholdPick(scored, "source", col("_score"),
          col("lang") === "en", pNum = 3, pDen = 5)
        .orderBy("source")
    }),

    // Per-label precision/recall/F1 + macro-F1 of the NB language-ID —
    // which labels does the classifier trade away (kappa is the one-
    // number summary; this is the breakdown); rides the memoized
    // confusion matrix.
    "q_nb_f1" -> ((s, dir) =>
      Profiling.classificationReport(
        TextOps.naiveBayesConfusionCached(T(s, dir, "documents"), "lang", "text",
          "doc_id", s, dir),
        "true_label", "pred_label", "n_docs")),

    // Per-source Spearman rank correlation between doc length and token
    // count — the monotone-association screen (Pearson on average
    // ranks); doubled ranks keep ties integer-exact, one source
    // exchange serves all four rank windows + the moment agg.
    "q_spearman" -> ((s, dir) =>
      Profiling.spearman(
        T(s, dir, "documents")
          .select(col("source"), col("n_chars"),
            size(TextOps.tokens(col("text"))).cast("long").as("_nt")),
        "source", col("n_chars"), col("_nt"))
        .orderBy("source")),

    // Chi-square independence + Cramér's V of lang × source — "are the
    // label margins associated at all, and how strongly": full
    // contingency grid (zero cells included), expected counts from
    // integer margin products, contributions decimal-summed.
    "q_chi2" -> ((s, dir) =>
      Profiling.chiSquare(T(s, dir, "documents"), "lang", "source")),

    // Mann-Kendall trend test per user over event values: S = pairwise
    // sign sum in event order, tau-a = 2S/(n(n−1)) — the nonparametric
    // drift screen (only signs enter; outliers don't). Quadratic in the
    // bounded per-user series length only; integer S, one final
    // division, engine-exact unrounded.
    "q_mann_kendall" -> ((s, dir) =>
      TimeSeries.mannKendall(T(s, dir, "events"), "user_id", "event_id", "value")
        .orderBy("user_id")),

    // Sen's slope per user — the robust trend MAGNITUDE that accompanies
    // q_mann_kendall's trend TEST: median of all pairwise slopes, taken
    // by deterministic middle-rank picking (never percentile
    // interpolation — the r11 ulp lesson sidestepped).
    "q_sen_slope" -> ((s, dir) =>
      TimeSeries.senSlope(T(s, dir, "events"), "user_id", "event_id", "value")
        .orderBy("user_id")),

    // Holt double exponential smoothing per user (level + trend) — the
    // drift-tracking EWMA; mapPartitions recurrence (the q_ewma shape),
    // replayed bit-for-bit by the oracle's struct-accumulator
    // list_reduce. α=0.5, γ=0.25 so the (1−α)/(1−γ) literals are exact.
    "q_holt" -> ((s, dir) =>
      TimeSeries.holt(T(s, dir, "events"), "user_id", "event_id", "value",
          alpha = 0.5, gamma = 0.25)
        .orderBy("event_id")),

    // ── round 16b: market-indicator family (the reference's domain) ────
    // MACD per user series: fast/slow EWMAs + signal EWMA over the macd
    // stream — THREE chained recurrences in one mapPartitions pass (the
    // q_ewma shape); the signal fold seeds at macd₁ = 0 exactly, so the
    // oracle replays it as one list_reduce over the macd prefix.
    "q_macd" -> ((s, dir) =>
      TimeSeries.macd(T(s, dir, "events"), "user_id", "event_id", "value")
        .select("event_id", "user_id", "value", "macd", "signal", "hist")
        .orderBy("event_id")),

    // Wilder RSI (EWMA-smoothed variant, α=1/n seeded at the first
    // delta — the reproducible warm-up; deviation from the n-bar
    // arithmetic seed documented on the operator): gain/loss split of
    // each delta, two smoothing recurrences, the 100 − 100/(1+RS) map
    // with pinned degenerate states (flat → 50, lossless → 100,
    // first row → NULL).
    "q_rsi" -> ((s, dir) =>
      TimeSeries.rsi(T(s, dir, "events"), "user_id", "event_id", "value", n = 14)
        .select("event_id", "user_id", "value", "rsi")
        .orderBy("event_id")),

    // Bollinger bands + %B: trailing-20 mean ± 2σ off the exact-decimal
    // window sums (the q_rolling_vol recipe — variance from decimal Σx,
    // Σx², so bits survive any engine's stddev algorithm), and the
    // normalized band position that feeds mean-reversion screens.
    "q_bollinger" -> ((s, dir) =>
      TimeSeries.bollinger(T(s, dir, "events"), "user_id", "event_id", "value",
          n = 20, k = 2.0)
        .select("event_id", "user_id", "bb_mid", "bb_upper", "bb_lower", "pct_b")
        .orderBy("event_id")),

    // TF-IDF document-similarity top-5: lexical retrieval through an
    // inverted-index join (pairs exist only where a term is shared) with
    // the DF-cap defining the vector space; weights round(·,9) BEFORE
    // any product so ln's final-ulp engine differences never reach a
    // multiplication (the r16b literal-ulp lesson applied to ln).
    "q_tfidf_sim" -> ((s, dir) =>
      // TokenStore fast path (r16b): the per-doc term counts are the
      // persisted tokenize-once artifact; N comes from the doc catalog
      // (the artifact cannot see zero-token docs)
      TextOps.tfidfCosineTopKFromCounts(
        graft.sources.TokenStore.ensureTokens(s, dir)
          .select(col("doc_id"), col("token"), col("tf").as("_cnt")),
        T(s, dir, "documents").select("doc_id").distinct()
          .agg(count(lit(1)).as("_n")),
        "doc_id", col("doc_id") < 20, k = 5, maxDf = 500)
        .select("query_id", "corpus_id", "score", "rank")
        .orderBy("query_id", "rank")),

    // Sliding 7-day distinct users per day via MERGED per-day KMV
    // sketches — trailing MAU where each output row merges k·7 longs,
    // never re-scanning the window's raw rows; the exact column and
    // rel_err grade the sketch in the same row (the C225/C226 audit
    // discipline applied to the sliding-window shape).
    "q_sliding_mau" -> ((s, dir) =>
      Profiling.kmvSlidingDistinct(T(s, dir, "events"), "ts", col("user_id"),
          k = 64, windowDays = 7)
        .orderBy("day")),

    // Item-item cosine neighbors ("customers also bought") over the
    // persisted pair/item artifacts — the CF primitive: exact cooc and
    // basket counts into two sqrts and a division, top-3 per item,
    // fact table untouched.
    "q_item_neighbors" -> ((s, dir) => {
      // support >= 3 floor BEFORE ranking (cooc 1-2 is tie noise at this
      // scale); ranks are dense among qualified neighbors
      val pairs = graft.sources.PairStore.ensurePairs(s, dir)
        .where(col("support") >= 3)
      val items = graft.sources.PairStore.ensureItems(s, dir)
      Relational.itemNeighbors(pairs, "support", items, "item", "basket_cnt", k = 3)
        .select("item", "rank", "neighbor", "support", "cosine")
        .orderBy("item", "rank")
    }),

    // Calibration/reliability bins + ECE of the stopword-ratio score as
    // an English-probability estimate — q_auc's complement: AUC checks
    // the ranking, this checks the score VALUES (the gate before using
    // a quality score as a probability threshold).
    // Isotonic calibration (r20): PAV over the stopword score's
    // distinct-value catalog per source — the nonparametric
    // recalibration step after q_calibration's diagnosis: fit the best
    // monotone score → P(en) map (exact-integer pool merges, executor-
    // side stack fold) and report ECE before/after on the same bins.
    "q_isotonic" -> ((s, dir) =>
      Profiling.isotonicCalibration(
          stopwordScored(s, dir, col("source"), col("lang")),
          "source", col("_score"), col("lang") === "en")
        .orderBy("source")),

    // Platt scaling (r20): the PARAMETRIC member of the same shelf —
    // per-source two-parameter sigmoid p = σ(a·s + b) fitted by
    // λ-ridged 2×2 Newton over the same distinct-score catalog
    // (6-dp parameter rounds, one 7-dp sigmoid per value-iteration),
    // ECE before/after directly comparable with q_isotonic's rows.
    "q_platt" -> ((s, dir) =>
      Profiling.plattScaling(
          stopwordScored(s, dir, col("source"), col("lang")),
          "source", col("_score"), col("lang") === "en")
        .orderBy("source")),

    "q_calibration" -> ((s, dir) =>
      Profiling.calibrationReport(stopwordScored(s, dir, col("lang")),
        col("_score"), col("lang") === "en", 10)),

    // Word2vec negative-sampling table: top-30 types with count^0.75
    // sampling weights — the exponent computed as sqrt(c·sqrt(c)), the
    // bit-portable shape (libm pow is not ulp-identical across engines;
    // two correctly-rounded sqrts and a multiply are); normalizer
    // decimal-summed over the whole vocabulary.
    "q_neg_sampling" -> ((s, dir) =>
      TextOps.negativeSamplingTable(T(s, dir, "documents"), "text", topK = 30)),

    // MMR diversified top-5: rerank the top-50 cosine pool for probe 0
    // so no near-dup cluster monopolizes the result page — greedy
    // lambda*rel − (1−lambda)*max-sim-to-selected, the retrieval-side
    // complement of SemDeDup's corpus-side cut; pool + pool×pool sims
    // engine-computed (portable fold doubles), selection loop unrolled
    // in the oracle as 5 argmax CTEs.
    "q_mmr" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      VectorOps.mmrSelect(emb, emb.where(col("vec_id") === 0), "vec_id", "embedding",
          k = 5, lambda = 0.7, poolSize = 50)
        .orderBy("rank")
    }),

    // Hard-negative mining: for each probe embedding, the top-5 most
    // cosine-similar vectors with a DIFFERENT class label — contrastive
    // training's near-miss negatives (random negatives are easy; the
    // gradient lives at the top of the cross-label ranking). Broadcast
    // probes, label predicate fused into the join, codegen'd native dot.
    "q_hard_negatives" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      VectorOps.hardNegatives(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", "label", k = 5)
        .select(col("query_id"), col("query_label").cast("long").as("query_label"),
          col("corpus_id"), col("corpus_label").cast("long").as("corpus_label"),
          col("score"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // Bounded edit-distance self-join at tau=2 via PassJoin segment
    // blocking — the entity-resolution step up from C61's lev<=1 (FastSS
    // deletion keys blow up quadratically at tau=2; segments stay
    // linear). Corpus: customer names under 500 (the q_fuzzy_join bound:
    // the digit template makes the two non-varying segments corpus-
    // constant join keys, so candidate volume grows n^2-ish on THIS
    // corpus — see the operator scaladoc's skew note) with a
    // deterministic deletion planted on every 11th key, so the candidate
    // join must cross LENGTHS (17 vs 18 chars), not just substitute
    // digits; the oracle brute-forces the full pair space.
    "q_editdist_join" -> ((s, dir) => {
      val pos = (col("c_custkey") % 9 + 10).cast("int")
      val mutated = T(s, dir, "customer").where(col("c_custkey") < 500)
        .select(col("c_custkey").as("id"),
          when(col("c_custkey") % 11 === 5,
            concat(col("c_name").substr(lit(1), pos - 1),
              col("c_name").substr(pos + 1, length(col("c_name")))))
            .otherwise(col("c_name")).as("name"))
      Linkage.editDistSelfJoin(mutated, "id", "name", tau = 2)
        .orderBy("id_a", "id_b")
    }),

    // Per-user burstiness of inter-event gaps (Goh-Barabasi
    // B = (sigma - mu)/(sigma + mu) over exact microsecond gaps) — the
    // bot-vs-human temporal signature; moment sums are exact integers,
    // the final combination fixed-shape IEEE.
    "q_burstiness" -> ((s, dir) =>
      EventOps.burstiness(T(s, dir, "events"), "user_id", "ts", "event_id")
        .orderBy("user_id")),

    // Benford leading-digit screen on extended price — digit extracted
    // symbolically (floor -> bigint -> first char), never via log10,
    // so the keying path is engine-exact.
    "q_benford" -> ((s, dir) =>
      Profiling.benfordProfile(T(s, dir, "lineitem"), col("l_extendedprice"))
        .orderBy("digit")),

    // Per-domain Simpson concentration over token counts — the
    // repeated-draw boilerplate signal complementing entropy.
    "q_simpson" -> ((s, dir) =>
      TextOps.simpsonDiversity(T(s, dir, "documents"), "source", "text")
        .orderBy("domain")),

    // Corpus Gini coefficient of type frequencies — ranks aggregated by
    // frequency VALUE (at most sqrt(2N) distinct), never a
    // vocabulary-wide sort.
    "q_gini" -> ((s, dir) =>
      TextOps.giniConcentration(T(s, dir, "documents"), "text")),

    // Zipf rank-frequency OLS slope over the top-200 types — the
    // one-parameter naturalness fit; C99's OLS shapes on C81's
    // deterministic ranks.
    "q_zipf_slope" -> ((s, dir) =>
      TextOps.zipfSlope(T(s, dir, "documents"), "text", 200)),

    // Per-domain quantile normalization of document length — percent_rank
    // within each source, the cross-domain-fair calibration step.
    "q_quantile_norm" -> ((s, dir) =>
      Profiling.quantileNormalize(T(s, dir, "documents"), "doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // Domain-token mutual information — how much the source predicts the
    // language, in one exact-moment scalar (the aggregate counterpart of
    // q_domain_kl).
    "q_domain_mi" -> ((s, dir) =>
      TextOps.domainTokenMI(T(s, dir, "documents"), "source", "text")),

    // Pairwise domain vocabulary overlap via the basketPairs kernel
    // transposed onto text (basket = token, items = domains).
    "q_domain_overlap" -> ((s, dir) =>
      TextOps.domainVocabOverlap(T(s, dir, "documents"), "source", "text")
        .orderBy("domain_a", "domain_b")),

    // HLL set algebra: per event-type-pair union and intersection
    // estimates of user sets from max-merged registers — sketch-state
    // arithmetic only, finalized through the same estimator as
    // q_hll_distinct.
    "q_hll_overlap" -> ((s, dir) =>
      Profiling.hllOverlap(T(s, dir, "events"), "event_type", "user_id")
        .orderBy("group_a", "group_b")),

    // RFM segmentation — recency/frequency/monetary quintile scores with
    // boundaries off the C126 portable histogram sketch (never an ntile
    // global sort over the user catalog).
    "q_rfm" -> ((s, dir) =>
      EventOps.rfmSegments(T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // First/last-touch attribution: each purchase credited to the first
    // and most recent preceding non-purchase event type of its user.
    "q_attribution" -> ((s, dir) =>
      EventOps.touchAttribution(T(s, dir, "events"), "user_id", "ts",
          "event_id", "event_type", "purchase")
        .orderBy("event_id")),

    // Interpolated Kneser-Ney bigram scoring — the production LM quality
    // filter: absolute discounting + continuation probabilities, every
    // count exact, distribution sums to 1 per context (spec-proven).
    "q_kn_logprob" -> ((s, dir) =>
      TextOps.knBigramLogProb(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // Winnowing (MOSS) fingerprints: per-window rightmost-minimum char
    // k-gram hashes — position-robust local overlap detection with the
    // w-gap density guarantee.
    "q_winnow" -> ((s, dir) =>
      TextOps.winnowFingerprints(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "sel_pos")),

    // Distribution-shape moments per event type — skewness/excess
    // kurtosis from exact decimal power sums in one fixed double shape
    // (never the engine-private skew/kurt aggregates).
    "q_moments" -> ((s, dir) =>
      Profiling.momentsProfile(T(s, dir, "events"), "event_type", "value")
        .orderBy("event_type")),

    // Top-1 Markov baseline accuracy — the in-sample argmax-transition
    // sanity floor over q_markov_chain's matrix; deterministic tie rule
    // (count desc, type asc).
    "q_markov_acc" -> ((s, dir) =>
      EventOps.markovTopPredAccuracy(T(s, dir, "events"), "user_id", "ts",
          "event_id", "event_type")
        .orderBy("prev_type")),

    // Count-min sketch matrix (4×256, portable seeded-md5 hash rows) —
    // the mergeable approximate-count state for unbounded vocabularies;
    // counters are sums, so shard sketches merge by element-wise
    // addition (spec-proven), and the matrix itself is engine-exact.
    "q_cm_sketch" -> ((s, dir) =>
      TextOps.countMinSketch(T(s, dir, "documents"), "text", 4, 256)
        .select(col("j").cast("long").as("j"), col("bucket"), col("cnt"))
        .orderBy("j", "bucket")),

    // Point-query estimates off the count-min matrix: est(t) =
    // min_j counter[j][h_j(t)], an upper bound on the true count; the
    // absent probe proves the never-seen path (0 everywhere only if all
    // its cells are empty). The oracle replays sketch AND probe hashing.
    "q_cm_estimate" -> ((s, dir) =>
      TextOps.countMinEstimate(
          TextOps.countMinSketch(T(s, dir, "documents"), "text", 4, 256),
          CmProbes, 4, 256)
        .orderBy("token")),

    // Per-document token-distribution Shannon entropy (nats) — the
    // diversity quality signal complementing q_repetition's ratio
    // signals; near-zero entropy = repeated-token spam.
    "q_token_entropy" -> ((s, dir) =>
      TextOps.tokenEntropy(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // Weighted sample without replacement (Efraimidis–Spirakis A-ES
    // priorities over the deterministic md5 uniform), 20 docs per lang
    // weighted by n_chars — the quality-weighted subsample primitive; a
    // stateless per-row expression + per-group top-k, no sequential pass.
    "q_weighted_sample" -> ((s, dir) =>
      Relational.weightedSample(
          T(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "doc_id", "lang", "n_chars", 20)
        .select(col("lang"), col("sample_rank").cast("long").as("sample_rank"),
          col("doc_id"), col("n_chars"), col("priority"))
        .orderBy("lang", "sample_rank")),

    // Matryoshka truncation: first 8 dims, L2-renormalized — the nested-
    // representation ANN cost cut; exploded (vec_id, dim, value) output.
    "q_matryoshka" -> ((s, dir) =>
      VectorOps.matryoshka(T(s, dir, "embeddings"), "vec_id", "embedding", 8)
        .orderBy("vec_id", "dim")),

    // Point-in-time (Kimball Type-2) lookup — the CONSUMER of C77's SCD2
    // history: each fact row joins the dimension version whose
    // [valid_from, valid_to) interval covers the fact date. The non-equi
    // validity predicate rides the c_custkey equi join as a residual, so
    // the plan is a plain hash join; intervals are disjoint per key, so
    // every fact matches at most one version (facts dated past a deleted
    // customer's closed interval surface with null attributes — the
    // left-join absence signal). ISO date strings compare lexicographically
    // identically in both engines.
    "q_pit_join" -> ((s, dir) => {
      val cur = T(s, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
      val nxt = cur.where(col("c_custkey") % 97 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 10 === 0, lit("ARCHIVE"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
            .otherwise(col("c_acctbal")).as("c_acctbal"))
        .unionByName(cur.where(col("c_custkey") % 101 === 0)
          .select((col("c_custkey") + 900000L).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal")))
      val hist = Relational.scdType2(cur, nxt, "c_custkey",
        Seq("c_mktsegment", "c_acctbal"), "1995-01-01", "1998-01-01")
      T(s, dir, "orders").where(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .join(hist,
          col("o_custkey") === col("c_custkey") &&
            col("valid_from") <= col("o_date") &&
            (col("valid_to").isNull || col("o_date") < col("valid_to")),
          "left_outer")
        .select(col("o_orderkey"), col("o_custkey"), col("o_date"),
          col("c_mktsegment"), col("c_acctbal"), col("valid_from"))
        .orderBy("o_orderkey")
    }),

    // Chunk→document embedding pooling: mean vector per group of 10
    // embeddings (ops/VectorOps.meanPool) — exact-decimal per-dimension
    // means, serialized dimension-ordered in integral micro-units so the
    // pooled vectors hash-compare across engines.
    "q_embed_pool" -> ((s, dir) =>
      VectorOps.meanPool(T(s, dir, "embeddings"),
          col("vec_id") % 50, "embedding")
        .orderBy("group_id")),

    // Cross-nation trade volume (TPC-H Q7 shape): the one join shape the
    // suite lacked — the SAME dimension (nation) joined twice under two
    // aliases, once through the supplier FK and once through the customer
    // FK. Both nation sides and supplier broadcast (tiny dims); orders and
    // customer attach by shuffle on their keys; revenue per (supplier
    // nation, customer nation, year) in exact decimal.
    "q_nation_volume" -> ((s, dir) => {
      val n = T(s, dir, "nation").select("n_nationkey", "n_name")
      T(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
          year(col("l_shipdate")).as("l_year"))
        .join(T(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n.toDF("_snk", "supp_nation")), col("s_nationkey") === col("_snk"))
        .join(broadcast(n.toDF("_cnk", "cust_nation")), col("c_nationkey") === col("_cnk"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(Portable.decSum(col("volume"), 6).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Entry-path mining: the top 20 first-three-event journeys across
    // users — funnel analysis without a prescribed funnel. The ordered
    // prefix is pinned with one ranked window, the path assembled from
    // three conditional-max pivots (no order-dependent collect_list),
    // and the final top-k is a TakeOrderedAndProject over the tiny
    // aggregated path table. concat_ws drops NULLs identically in both
    // engines, so sub-3-event users contribute their shorter path.
    "q_user_paths" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .groupBy("user_id")
        .agg(concat_ws(">",
          max(when(col("rn") === 1, col("event_type"))),
          max(when(col("rn") === 2, col("event_type"))),
          max(when(col("rn") === 3, col("event_type")))).as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    }),

    // Welch's unequal-variance t-test per source: does the md5
    // train-split's mean doc length differ from the rest's? The
    // inferential gate on split bias (q_bootstrap_se attaches
    // uncertainty to ONE mean; this compares two), with the SMD
    // covariate-balance column off the same single-aggregate moments.
    "q_welch_t" -> ((s, dir) =>
      Profiling.welchTTest(
        T(s, dir, "documents")
          .select(col("source"),
            (Portable.hash32(col("doc_id")) % 10000 < 8000).as("_train"),
            col("n_chars")),
        "source", col("_train"), col("n_chars"))
        .orderBy("source")),

    // Mann-Whitney U on the SAME split/covariate as q_welch_t — the
    // rank-based, distribution-free companion: Welch asks "do the means
    // differ", this asks "does one sample stochastically dominate",
    // immune to the outliers and skew a length column actually has.
    // Doubled rank sums keep everything integer until three fixed
    // double ops (the exactness contract on the operator).
    "q_mann_whitney" -> ((s, dir) =>
      Profiling.mannWhitneyU(
        T(s, dir, "documents")
          .select(col("source"),
            (Portable.hash32(col("doc_id")) % 10000 < 8000).as("_train"),
            col("n_chars")),
        "source", col("_train"), col("n_chars"))
        .orderBy("source")),

    // 2x2 odds ratio with the Wald CI per nation: BUILDING-segment
    // membership (exposure) vs positive account balance (outcome) —
    // C230's z tests a rate DIFFERENCE, this quantifies association
    // STRENGTH with the Haldane-Anscombe zero-cell correction.
    "q_odds_ratio" -> ((s, dir) =>
      Profiling.oddsRatio2x2(T(s, dir, "customer"), "c_nationkey",
          col("c_mktsegment") === "BUILDING", col("c_acctbal") > 0)
        .orderBy("c_nationkey")),

    // Holt-Winters additive triple smoothing, season m=7 on the per-user
    // event-id cycle: C186's Holt plus a seasonal ring — level seeds at
    // the first value, seasonals at zero (cycle one degrades exactly to
    // Holt; deterministic by design). α/γ/δ are exact binary literals.
    "q_holt_winters" -> ((s, dir) =>
      TimeSeries.holtWinters(T(s, dir, "events"), "user_id", "event_id", "value",
          m = 7, alpha = 0.5, gamma = 0.25, delta = 0.25)
        .orderBy("event_id")),

    // Exponentially decayed event-type leaderboard (half-life = 1 day):
    // per-day exact counts weighted 2^(−age) — the dyadic base makes
    // every weight an exactly-representable double (NO pow/exp ulp
    // hazard), so "what's trending" is hash-checkable end to end.
    "q_decayed_topk" -> ((s, dir) =>
      EventOps.decayedLeaderboard(T(s, dir, "events"), "ts", "event_type", k = 10)
        .orderBy("rank")),

    // Seeded Laplace-noise count release per language — the DP mechanism
    // SHAPE (sensitivity-1 count + Laplace(1/ε)) with hash-seeded noise:
    // reproducible and oracle-checkable, which is right for testing the
    // pipeline and explicitly wrong for a real release (the operator's
    // scaladoc carries the warning; swap the RNG to deploy).
    "q_noisy_counts" -> ((s, dir) =>
      Profiling.noisyCounts(T(s, dir, "documents"), "lang",
          epsilon = 0.5, salt = "graft-r16b")
        .orderBy("lang")),

    // Bloom-filter false-positive audit: build an m=4096-bit, k=3-hash
    // filter from the BUILDING-segment customer keys, probe with every
    // OTHER customer, report the measured FPR — the parameter check
    // C43's runtime bloom-pruned join deserves BEFORE those m/k ship.
    // Exact integers + one division; the analytic curve lives in the
    // spec, not the data path.
    "q_bloom_fpr" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      Profiling.bloomFprAudit(
        cust.where(col("c_mktsegment") === "BUILDING"),
        cust.where(col("c_mktsegment") =!= "BUILDING"),
        col("c_custkey"), m = 4096L, k = 3)
    }),

    // One-step forecast accuracy of the Holt smoother (same α/γ as
    // q_holt): MAE / SMAPE / MASE per user — the scorecard that turns
    // the smoother from a prior into a forecast; MASE answers "better
    // than persistence?" per series.
    "q_forecast_acc" -> ((s, dir) =>
      TimeSeries.forecastAccuracy(T(s, dir, "events"), "user_id", "event_id",
          "value", alpha = 0.5, gamma = 0.25)
        .orderBy("user_id")),

    // Cross-correlation of the view vs purchase daily value series at
    // lags -3..+3: does browsing LEAD buying — the lead/lag discovery
    // ACF (C170) cannot see; dense day grid (quiet days are zeros, not
    // dropped rows), exact decimal daily sums, decCorr per lag.
    "q_ccf" -> ((s, dir) =>
      TimeSeries.crossCorrelation(T(s, dir, "events"), "ts", "event_type",
          "value", "view", "purchase", maxLag = 3)
        .orderBy("lag")),

    // Lorenz curve of characters over documents: the inequality CURVE
    // behind the C146 Gini scalar — "the bottom k/10 of docs hold what
    // share of the corpus chars"; value-catalog windows only, exact
    // tie-class correction per point.
    "q_lorenz" -> ((s, dir) =>
      Profiling.lorenzCurve(T(s, dir, "documents"), col("n_chars"), 10)
        .orderBy("point")),

    // QQ drift table between the md5 train split and the rest on
    // n_chars: KS (C182) compresses distribution mismatch to one
    // statistic, this says WHERE the cohorts diverge (tails vs body) —
    // the audit read before trusting a covariate split. Rank-pick
    // quantiles, no interpolation (the repo's percentile discipline).
    "q_qq_drift" -> ((s, dir) =>
      Profiling.qqDrift(
        T(s, dir, "documents")
          .select((Portable.hash32(col("doc_id")) % 10000 < 8000).as("_train"),
            col("n_chars")),
        col("_train"), col("n_chars"), Seq(0.1, 0.25, 0.5, 0.75, 0.9))
        .orderBy("q")),

    // Binary-segmentation change-point per user series: the split
    // minimizing SSE_left + SSE_right off exact decimal prefix sums —
    // C191's CUSUM says "a drift exists", this says WHERE the level
    // shifted, with the variance explained (gain_ratio) as effect size.
    "q_changepoint" -> ((s, dir) =>
      TimeSeries.binSegChangepoint(T(s, dir, "events"), "user_id", "event_id", "value")
        .orderBy("user_id")),

    // CUPED variance reduction: adjust each user's second-half-of-month
    // metric by their first-half covariate — how much experiment
    // sensitivity the pre-period buys (the C230 A/B test's power
    // multiplier). One-row report: theta, raw vs adjusted variance,
    // reduction %.
    "q_cuped" -> ((s, dir) =>
      Profiling.cuped(T(s, dir, "events"), "user_id", "ts", col("value"),
        splitDay = 16)),

    // χ² uniformity audit of the portable md5 bucketing over 16 buckets
    // of customer keys — the guardrail under every hash-keyed split this
    // engine ships (sampling, bootstrap blocks, A/B cohorts, salting).
    // crit = χ²(0.05, 15).
    "q_hash_uniformity" -> ((s, dir) =>
      Profiling.hashUniformity(T(s, dir, "customer"), col("c_custkey"),
        buckets = 16, crit = 24.996)),

    // Gumbel block-maxima tail fit over daily event-value maxima with
    // 10/100/1000-day return levels — the capacity-planning threshold
    // ("the largest value to expect once per T days").
    "q_gumbel_tail" -> ((s, dir) =>
      Profiling.gumbelTail(T(s, dir, "events"), "ts", col("value"),
          Seq(10, 100, 1000))
        .orderBy("return_period")),

    // Pairwise Jensen–Shannon divergence between source unigram
    // distributions — the corpus-mixing distance (symmetric, bounded,
    // finite where KL explodes). Counts ride the persisted TokenStore
    // rollup + a broadcast doc→source label join; only shared tokens
    // join, one-sided mass folds in analytically.
    "q_jsd" -> ((s, dir) => {
      val counts = graft.sources.TokenStore.ensureTokens(s, dir)
        .join(broadcast(T(s, dir, "documents").select(col("doc_id"), col("source"))),
          Seq("doc_id"))
        .groupBy("source", "token").agg(sum("tf").as("tf"))
      TextOps.jsDivergence(counts, "source", "token", "tf")
        .orderBy("label_a", "label_b")
    }),

    // md5-randomization permutation test for the A/B mean difference —
    // the assumption-free p-value behind q_ab_test/q_cuped: 64
    // deterministic hash-relabelings of the per-user metric, p =
    // (1 + #extreme) / 65.
    "q_perm_test" -> ((s, dir) =>
      Profiling.permutationTest(T(s, dir, "events"), "user_id", col("value"),
        replicas = 64)),

    // James–Stein positive-part shrinkage of per-source mean doc length
    // — the winner's-curse repair before ranking/filtering domains on
    // small-sample means.
    "q_james_stein" -> ((s, dir) =>
      Profiling.jamesStein(T(s, dir, "documents"), "source", col("n_chars"))
        .orderBy("source")),

    // Split-conformal interval for the persistence forecast: q̂ from
    // first-half-of-month residuals at α = 0.1, coverage graded on the
    // held-out half — the distribution-free monitoring band.
    "q_conformal" -> ((s, dir) =>
      Profiling.conformalInterval(T(s, dir, "events"), "user_id", "event_id",
        "ts", col("value"), splitDay = 16, alpha = 0.1)),

    // Chao1 asymptotic vocabulary richness + Good–Turing coverage off
    // the TokenStore corpus frequencies — "how many token types has this
    // corpus NOT shown us yet" (the vocab/dedup-memory sizing pair).
    "q_chao1" -> ((s, dir) =>
      TextOps.chao1(
        graft.sources.TokenStore.ensureTokens(s, dir)
          .groupBy("token").agg(sum("tf").as("c")),
        col("c"))),

    // NMI between the k=16 and production k=64 IVF assignments — the
    // quantizer-migration audit (how much information do the old cells
    // carry about the new ones). The k=64 side reads the clustered
    // store's at-rest cell; the k=16 side is the cheap 16-dot argmax.
    "q_cluster_nmi" -> ((s, dir) => {
      val c16 = centroidsOf(s, dir, IvfK)
      val clustered = graft.sources.IvfClusterStore.ensureClustered(s, dir,
        prodCentroids(s, dir), IvfK2, IvfIters)
      Profiling.clusterNmi(
        clustered.select(col("vec_id"),
          VectorOps.nearestCell(col("embedding"), c16).as("_c16"),
          col("cell").as("_c64")),
        col("_c16"), col("_c64"))
    }),

    // Hill tail index over the 100 largest doc lengths — the heavy-tail
    // companion of q_gumbel_tail (small α̂ = power-law territory where a
    // Gumbel quota is meaningless).
    "q_hill_tail" -> ((s, dir) =>
      Profiling.hillTail(T(s, dir, "documents"), col("n_chars"), k = 100)),

    // Jackknife influence of each source on the corpus mean doc length —
    // "which domain is moving the headline number" (the responsibility
    // audit next to q_bootstrap_se's uncertainty).
    "q_source_influence" -> ((s, dir) =>
      Profiling.jackknifeInfluence(T(s, dir, "documents"), "source", col("n_chars"))
        .orderBy("source")),

    // Simpson's-paradox screen: per-event-type slope of value on
    // day-of-month vs the pooled slope — flags groups whose trend sign
    // the pooled aggregate reverses (the aggregation-bias audit).
    "q_simpsons_paradox" -> ((s, dir) =>
      Profiling.simpsonsParadox(
        T(s, dir, "events")
          .select(col("event_type"), dayofmonth(col("ts")).as("d"), col("value")),
        "event_type", col("d"), col("value"))
        .orderBy("event_type")),

    // Wald SPRT over the daily purchase-rate stream (H0 p=0.10 vs H1
    // p=0.15, α=β=0.05): the sequential monitor that says WHEN enough
    // evidence arrived to stop — per day, the LLR walk and the first
    // boundary decision.
    "q_sprt" -> ((s, dir) =>
      EventOps.sprt(T(s, dir, "events"), "ts",
          col("event_type") === "purchase",
          p0 = 0.10, p1 = 0.15, alpha = 0.05, beta = 0.05)
        .orderBy("day")),

    // ── round 18: the anytime-valid / stratified-inference wave ────────
    // Likelihood-ratio e-process with anytime-valid p over the same daily
    // purchase stream as q_sprt (same H0/H1): log E_t IS the LLR walk,
    // log p_t = min(0, −max log E), rejection gate at ln(1/α) — the
    // modern sequential monitor that may be read at ANY time without
    // alpha-spending (Ville's inequality). All in log space: no exp, no
    // ulp hazard.
    "q_evalue" -> ((s, dir) =>
      EventOps.eProcess(T(s, dir, "events"), "ts",
          col("event_type") === "purchase", p0 = 0.10, p1 = 0.15, alpha = 0.05)
        .orderBy("day")),

    // Stratified md5-randomization permutation test: C268's null
    // distribution, but each replica permutes labels WITHIN activity
    // strata (⌊log2 events/unit⌋ + 1 = length(bin(n))), preserving the
    // observed per-stratum cohort sizes — the correct null when
    // assignment was balanced on activity.
    "q_perm_test_strat" -> ((s, dir) =>
      Profiling.permutationTestStratified(T(s, dir, "events"), "user_id",
        col("value"), replicas = 64)),

    // Kendall τ-b per event type between the daily count and the daily
    // value sum — the tie-corrected concordance read (C189's Spearman
    // correlates ranks; τ counts pair inversions, sturdier at month-long
    // series). Integer concordance counts over the bounded day catalog.
    "q_kendall" -> ((s, dir) =>
      Profiling.kendallTau(T(s, dir, "events"), "event_type", "ts", col("value"))
        .orderBy("event_type")),

    // Kruskal–Wallis across sources on document length: "do the sources
    // draw lengths from one distribution" without normality — the
    // k-group member of the C250 rank family, tie-corrected, ranks via
    // the integer doubled-midrank catalog.
    "q_kruskal" -> ((s, dir) =>
      Profiling.kruskalWallis(T(s, dir, "documents"), "source", col("n_chars"))),

    // Cochran–Armitage trend: is the daily purchase RATE trending with
    // the day-of-month index (C184 reads a continuous series; this reads
    // proportions with binomial variance).
    "q_trend_test" -> ((s, dir) =>
      Profiling.cochranArmitage(T(s, dir, "events"),
        "ts", col("event_type") === "purchase")),

    // Mantel–Haenszel day-stratified pooled odds ratio for the C230
    // cohorts (md5-even users) on purchase outcome — the within-stratum
    // association a Simpson-reversed marginal table cannot fake.
    "q_mh_odds" -> ((s, dir) =>
      Profiling.mantelHaenszel(T(s, dir, "events"), to_date(col("ts")),
        pmod(Portable.hash32(col("user_id")), lit(2L)) === 0,
        col("event_type") === "purchase")),

    // Character-trigram language ID (Cavnar–Trenkle profiles, integer
    // overlap scoring): train on even doc_ids, classify the held-out
    // half, report the router's confusion matrix.
    "q_langid" -> ((s, dir) =>
      TextOps.langIdTrigram(T(s, dir, "documents"), "doc_id", "lang", "text", k = 64)
        .orderBy("lang", "predicted")),

    // Benjamini–Hochberg FDR over per-event-type permutation p-values
    // (32 md5 relabelings per segment, exact add-one rationals): the
    // multiple-testing control a per-segment experiment readout needs —
    // at k segments and α=0.1 some "significant" p is EXPECTED under the
    // global null; BH caps the false-discovery share instead.
    "q_bh_fdr" -> ((s, dir) =>
      Profiling.bhAdjust(
          Profiling.permutationTestPerGroup(T(s, dir, "events"), "event_type",
            "user_id", col("value"), replicas = 32),
          "event_type", "p_value", alpha = 0.10)
        .orderBy("event_type")),

    // Two-sample Cramér–von Mises per event type between the md5
    // cohorts: the L2 drift read that integrates the SQUARED ECDF gap
    // over the pooled sample (C182's KS sees only the single largest
    // gap; distributed small shifts register here first).
    "q_cvm_drift" -> ((s, dir) =>
      Profiling.cvmDrift(T(s, dir, "events"), "event_type", "user_id", col("value"))
        .orderBy("event_type")),

    // Friedman blocked rank test: do event types differ in daily mean
    // value once the DAY effect is removed — complete blocks only,
    // midranks within day, the general tied form of Q.
    "q_friedman" -> ((s, dir) =>
      Profiling.friedman(T(s, dir, "events"), "ts", "event_type", col("value"))),

    // McNemar's paired test: did the SAME users change purchase behavior
    // between month halves — only the discordant cells carry information
    // (the paired completion of C230's marginal z-test).
    "q_mcnemar" -> ((s, dir) =>
      Profiling.mcnemar(T(s, dir, "events"), "user_id", "ts",
        col("event_type") === "purchase", splitDay = 16)),

    // One-way ANOVA F across sources on document length — the
    // parametric companion of q_kruskal (means vs whole distributions),
    // with η² effect size alongside: at corpus scale everything is
    // "significant"; η² says how much variance the source label
    // actually explains.
    "q_anova" -> ((s, dir) =>
      Profiling.anovaF(T(s, dir, "documents"), "source", col("n_chars"))),

    // Brown–Forsythe variance homogeneity across sources on document
    // length — the assumption check UNDER q_anova and every pooled-
    // variance step: per-source spread around the group MEDIAN (robust
    // Levene), W statistic alongside the per-group rows.
    "q_levene" -> ((s, dir) =>
      Profiling.brownForsythe(T(s, dir, "documents"), "source", col("n_chars"))
        .orderBy("source")),

    // Minimum detectable effect + Cohen's d for the md5 A/B cohorts on
    // per-user value sums — the experiment-PLANNING read: the smallest
    // true lift this sample could flag at α=0.05 / power 0.8, next to
    // the standardized effect actually observed.
    "q_mde" -> ((s, dir) =>
      EventOps.mdePower(T(s, dir, "events"), "user_id",
        u => pmod(Portable.hash32(u), lit(2L)) === 0, col("value"))),

    // Log-rank test: do the md5-even and md5-odd customer cohorts churn
    // at the same rate — the hypothesis test over q_km_survival's
    // curves (same 30-day lifetimes, same 180-day censor rule), O−E
    // hypergeometric machinery over the lifetime catalog.
    "q_logrank" -> ((s, dir) =>
      EventOps.logRank(T(s, dir, "orders"), "o_custkey", "o_orderdate",
        u => pmod(Portable.hash32(u), lit(2L)) === 0,
        censorDays = 180, unitDays = 30)),

    // Nelson-Aalen cumulative hazard over the same lifetimes as
    // q_km_survival — the survival shelf's additive form: the slope of
    // H(t) is the churn INTENSITY per lifetime bucket, the quantity a
    // retention intervention targets.
    "q_na_hazard" -> ((s, dir) =>
      EventOps.nelsonAalen(T(s, dir, "orders"), "o_custkey", "o_orderdate",
        censorDays = 180, unitDays = 30)),

    // Cox proportional hazards over the same lifetimes, md5-cohort
    // covariate (r19) — the survival shelf's regression closer: the
    // log-rank test says WHETHER the cohorts' churn differs, this says
    // BY HOW MUCH (hazard ratio + SE + Wald z). Newton in θ = e^β
    // space: every iteration is rational over the checkpointed
    // event-time stats; ln happens once at read-out.
    "q_cox_ph" -> ((s, dir) =>
      EventOps.coxPh(T(s, dir, "orders"), "o_custkey", "o_orderdate",
        u => pmod(Portable.hash32(u), lit(2L)) === 0,
        censorDays = 180, unitDays = 30)),

    // Difference-in-differences (r19): the pre/post x cohort panel
    // estimator — per-user engagement totals on the dense
    // user x {pre, post} panel (silent periods are true zeros), period
    // split at the observed date-range midpoint, cohorts by md5. The
    // effect read when assignment is not randomized but both cohorts
    // share the time trend.
    "q_did" -> ((s, dir) =>
      EventOps.didEstimate(T(s, dir, "events"), "user_id", "ts", col("value"),
        u => pmod(Portable.hash32(u), lit(2L)) === 0)),

    // Restricted mean survival time per md5 cohort at tau = 12 units
    // (r19): E[min(lifetime, tau)] from the KM curve — the
    // decision-grade effect size of the survival shelf ("how much
    // retained lifetime within the first year is the cohort worth"),
    // valid even where proportional hazards fails. One KM-style fold
    // per cohort computes curve and integral together.
    "q_rmst" -> ((s, dir) =>
      EventOps.rmstByCohort(T(s, dir, "orders"), "o_custkey", "o_orderdate",
          u => pmod(Portable.hash32(u), lit(2L)) === 0,
          censorDays = 180, unitDays = 30, tauUnits = 12)
        .orderBy("cohort")),

    // Stratified Cox (r19): the same cohort effect with the baseline
    // hazard freed per market segment — the survival analogue of the
    // Mantel–Haenszel stratified pooling (q_mh_odds): "does the cohort
    // churn faster than its own segment's baseline", immune to
    // confounding by the segment mix.
    "q_cox_strat" -> ((s, dir) =>
      EventOps.coxPhStratified(T(s, dir, "orders"), "o_custkey", "o_orderdate",
        T(s, dir, "customer"), "c_custkey", "c_mktsegment",
        u => pmod(Portable.hash32(u), lit(2L)) === 0,
        censorDays = 180, unitDays = 30)),

    // Two-covariate Cox (r20): the md5 cohort effect fitted JOINTLY
    // with a second binary covariate (high-value market segment) — the
    // regression answer to confounding that q_cox_strat reaches by
    // stratification: risk sets partition into the four covariate
    // cells, every Newton iteration stays rational in (θ1, θ2) through
    // the explicit 2×2 determinant solve, both read-out lns land once
    // on 9-dp-rounded arguments.
    "q_cox_multi" -> ((s, dir) =>
      EventOps.coxPhMulti(T(s, dir, "orders"), "o_custkey", "o_orderdate",
        u => pmod(Portable.hash32(u), lit(2L)) === 0,
        T(s, dir, "customer"), "c_custkey", "c_mktsegment",
        v => v.isin("BUILDING", "AUTOMOBILE"),
        censorDays = 180, unitDays = 30)),

    // Theil T inequality with between/within decomposition by source on
    // document lengths — the DECOMPOSABLE member of the inequality
    // family (q_gini is the scalar, q_lorenz the curve): is corpus
    // inequality a mixing-weight problem (between sources) or a
    // per-source cleanup (within)?
    "q_theil" -> ((s, dir) =>
      Profiling.theilIndex(T(s, dir, "documents"), "source", col("n_chars"))
        .orderBy("source")),

    // Fano factor / index of dispersion of daily event arrivals per
    // type over the dense day grid (quiet days are true zeros):
    // burstiness vs the Poisson floor, with D = (n−1)·Fano compared to
    // the caller's chi2_{0.99,29} literal (the ~30-day grid's df).
    "q_fano" -> ((s, dir) =>
      TimeSeries.fanoDispersion(T(s, dir, "events"), "event_type", "ts",
          chi2Crit = 49.588)
        .orderBy("event_type")),

    // Murphy decomposition of the Brier score for the stopword-ratio
    // score as an English-probability estimate — q_calibration's
    // accounting: reliability (honesty) vs resolution (informativeness)
    // vs uncertainty (the base-rate floor no forecaster beats).
    "q_brier" -> ((s, dir) =>
      Profiling.brierDecomposition(stopwordScored(s, dir, col("lang")),
        col("_score"), col("lang") === "en", 10)),

    // Decision-stump threshold: the single best "stopword-ratio <= t"
    // cut of the English label by information gain — the SUPERVISED way
    // to pick a quality-filter cutoff (q_quality_cut picks by rank,
    // q_auc checks the ranking; this says where to cut and how much
    // label entropy the cut removes).
    "q_stump" -> ((s, dir) =>
      Profiling.decisionStump(stopwordScored(s, dir, col("lang")),
        col("_score"), col("lang") === "en")),

    // Participation ratio / effective rank of the embedding covariance:
    // how many dimensions the embeddings actually use — trace(C)²/|C|²_F
    // off q_embed_cov's entries, eigen-free. The one-number
    // justification for JL compression and the anisotropy warning for
    // cosine-ANN recall.
    // Served from the MomentStore since r19 (the covariance derivation
    // is shared with q_embed_cov — same bits, no corpus scan).
    "q_effective_rank" -> ((s, dir) => {
      val m = graft.sources.MomentStore.ensure(s, dir)
      VectorOps.participationRatioFromMoments(m.cells, m.dims,
        graft.sources.MomentStore.Dim)
    }),

    // Linear CKA between the raw 64-dim embeddings and their 16-dim JL
    // projection: did the compression preserve the representational
    // GEOMETRY (q_jl_distortion checks probe-pair distances; this is the
    // whole-corpus single-number promotion gate for serving ANN from
    // compressed vectors).
    // Served from the MomentStore since r19: the persisted cells ARE
    // the [x‖y] fan's aggregate, so the read is block bookkeeping over
    // 3,240 rows instead of a corpus scan.
    "q_cka" -> ((s, dir) => {
      val m = graft.sources.MomentStore.ensure(s, dir)
      VectorOps.ckaFromMoments(m.cells, m.dims,
        graft.sources.MomentStore.Dim, graft.sources.MomentStore.K)
    }),

    // Post-hoc pairwise Welch comparisons across sources on doc length —
    // WHICH sources differ, the follow-up q_anova/q_kruskal demand;
    // flags vs the Bonferroni-adjusted critical literal z_{1−.05/(2·190)}
    // ≈ 3.651 for the 20-source catalog's 190 pairs.
    "q_posthoc" -> ((s, dir) =>
      Profiling.posthocPairwise(T(s, dir, "documents"), "source",
          col("n_chars"), zCrit = 3.651)
        .orderBy("g_a", "g_b")),

    // Herfindahl–Hirschman concentration of corpus characters across
    // sources + the effective number of sources (1/HHI) — the
    // concentration closer of the balance family (Gini/Lorenz/Theil):
    // the diversity read a mixing plan starts from.
    "q_hhi" -> ((s, dir) =>
      Profiling.hhiConcentration(T(s, dir, "documents"), "source",
        col("n_chars"))),

    // Flesch–Kincaid readability grade per source (vowel-group syllable
    // estimator, sentences clamped >= 1) — the classic surface-form
    // difficulty read of the quality-scoring family; per-source
    // comparison is the signal, the absolute grade is a convention.
    "q_readability" -> ((s, dir) =>
      TextOps.readability(T(s, dir, "documents"), "source", col("text"))
        .orderBy("source")),

    // Context-window packing audit at 512/1024/2048/4096: what
    // concatenate-and-cut pretraining packing does to this corpus —
    // split fraction, docs per window, tail waste; the numbers that
    // pick a context length before a training run. Distributed
    // two-phase prefix sum, never a single-partition corpus window.
    "q_packing" -> ((s, dir) =>
      TextOps.packingAudit(T(s, dir, "documents"), "doc_id", col("text"),
          contexts = Seq(512, 1024, 2048, 4096))
        .orderBy("context")),

    // Rank-biased overlap between the true-cosine and JL-projected
    // cosine top-10 per probe: does the compressed index return the
    // same TOP answers, weighted toward rank 1 (q_jl_distortion checks
    // distances, q_cka the global geometry; this checks what serving
    // returns).
    "q_rbo_compress" -> ((s, dir) =>
      VectorOps.rboProjection(T(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, kProj = 16, probeLimit = 20, depth = 10)
        .orderBy("query_id")),

    // Covariate balance (standardized mean differences) between the md5
    // cohorts on pre-existing per-user characteristics — the audit
    // UNDER every A/B readout: a significant outcome difference on
    // imbalanced cohorts is a covariate effect in a costume.
    "q_smd" -> ((s, dir) =>
      EventOps.covariateBalance(T(s, dir, "events"), "user_id",
          u => pmod(Portable.hash32(u), lit(2L)) === 0,
          Seq(
            "n_events" -> count(lit(1)),
            "total_value" -> sum(col("value").cast("decimal(28,6)")).cast("double"),
            "active_days" -> countDistinct(to_date(col("ts")))))
        .orderBy("covariate")),

    // Dunn's post-hoc pairwise rank comparisons across sources on doc
    // length — WHICH sources differ by RANKS, the nonparametric
    // follow-up to q_kruskal exactly as q_posthoc follows q_anova; same
    // Bonferroni literal for the 190 source pairs.
    "q_dunn" -> ((s, dir) =>
      Profiling.dunnPosthoc(T(s, dir, "documents"), "source",
          col("n_chars"), zCrit = 3.651)
        .orderBy("g_a", "g_b")),

    // Cliff's delta per source between the md5 train split and the
    // holdout on doc length — the effect size under q_mann_whitney: at
    // corpus n every U test "rejects"; delta says whether anyone
    // should care (with the Vargha-Delaney probability alongside).
    "q_cliffs_delta" -> ((s, dir) =>
      Profiling.cliffsDelta(
          T(s, dir, "documents")
            .select(col("source"),
              (Portable.hash32(col("doc_id")) % 10000 < 8000).as("_train"),
              col("n_chars")),
          "source", col("_train"), col("n_chars"))
        .orderBy("source")),

    // Cochran's Q: do the event types reach DIFFERENT user bases once
    // each user is their own control — the k-treatment completion of
    // q_mcnemar (k=2 reduces to it), blocks = users, binary outcome =
    // "did the user perform this type".
    "q_cochran_q" -> ((s, dir) =>
      EventOps.cochranQ(T(s, dir, "events"), "user_id", "event_type")),

    // Bradley–Terry preference strengths over per-order supplier
    // head-to-heads (the max-value lineitem's supplier beats each other
    // suppliers in the order) — Hunter's MM, 5 fixed rounds, π catalog
    // broadcast per round (the pageRank shape). The win-count matrix is
    // corpus-static and rides the persisted PairStore artifact; the
    // oracle recomputes it from lineitem (identical by construction —
    // PairStoreSpec parity).
    "q_bradley_terry" -> ((s, dir) =>
      Relational.bradleyTerryFromPairs(
          graft.sources.PairStore.ensureBtWins(s, dir), "winner", "loser", iters = 5)
        .select(col("p").as("s_suppkey"), col("wins"), col("losses"), col("strength"))
        .orderBy("s_suppkey")),

    // Bounded-hop harmonic centrality over the SimHash near-dup doc
    // graph: Σ 1/d within 3 hops — which duplicates sit at the CENTER of
    // a near-dup cluster (canonical-pick tiebreak evidence C53 can use).
    // The lcm numerator keeps the score one exact division.
    "q_harmonic" -> ((s, dir) => {
      val pairs = TextOps.simHashNearDupCached(
        T(s, dir, "documents"), "doc_id", "text", 3, s, dir).select("id_a", "id_b")
      Graph.harmonicCentrality(pairs, "id_a", "id_b", maxHops = 3)
        .orderBy("node_id")
    }),

    // Truncated betweenness (path length ≤ 3) on the REPEAT-trade graph
    // (w ≥ 3 — the q_kcore family's bipartite cust↔supp edges, a tier
    // stricter so path structure stays rich at every SF): Brandes' pair
    // dependency restricted to short paths — which customers/suppliers
    // BROKER between market halves (q_harmonic finds centers; this finds
    // connectors). Exact integer path counts; one fixed division per
    // (pair, vertex).
    "q_betweenness" -> ((s, dir) => {
      val repeat = weightedTradeEdges(s, dir).where(col("w") >= 3)
      Graph.truncatedBetweenness(repeat, "cust", "supp")
        .orderBy("node_id")
    }),

    // K-minimum-values distinct sketch per language over the trigram
    // shingle vocabulary (the dedup keying unit — and, unlike the
    // 31-type unigram vocab of this corpus, large enough to exercise
    // the estimator path at every SF) — the third portable sketch
    // family member (C125 HLL, C126 histogram quantiles): tunable-k,
    // mergeable by keep-smallest-k, intersection-capable, and — because
    // the hash is the deterministic md5 rule — fully oracle-replicable.
    // Exact distinct + estimate + error bound flag in one result.
    // Pairwise Jaccard of language shingle vocabularies from the SAME
    // persisted-recipe KMV sketches (Beyer et al.): the union sketch's
    // smallest hashes vote on membership in both sides — the
    // direct-Jaccard sibling of C153's HLL inclusion-exclusion; exact
    // Jaccard + abs error ride along as the audit columns.
    "q_kmv_jaccard" -> ((s, dir) =>
      Profiling.kmvJaccard(labeledShingles(s, dir, "lang"),
        "lang", col("shingle"), 64)
        .orderBy("ga", "gb")),

    "q_kmv_distinct" -> ((s, dir) =>
      Profiling.kmvDistinct(labeledShingles(s, dir, "lang"),
        "lang", col("shingle"), 64)
        .orderBy("lang")),

    // Heaps'-law vocabulary-growth exponent: V(n) ~ K·n^beta fitted over
    // power-of-two doc-id checkpoints — the scaling input for tokenizer
    // vocab and dedup-memory budgets (beta near 1 = unbounded novel
    // types: OCR noise / boilerplate IDs).
    "q_heaps_law" -> ((s, dir) =>
      // artifact fast path (r21): token totals and first-doc-per-shingle
      // roll up from the persisted Token/Shingle stores (same recipes) —
      // zero corpus explodes at read time
      TextOps.heapsLaw(T(s, dir, "documents"), "doc_id", "text",
        perDocTokens = Some(graft.sources.TokenStore.ensureTokens(s, dir)),
        docShingles = Some(graft.sources.ShingleStore.ensureShingles(s, dir, 3)
          .select("doc_id", "shingle")))),

    // Deterministic T5 span corruption: 3-token blocks masked by the
    // portable hash rule, contiguous runs collapsed to numbered
    // <extra_id_k> sentinels, target = sentinels + their spans — the
    // denoising-pretraining pair generator, reproducible run over run.
    "q_span_corrupt" -> ((s, dir) =>
      TextOps.spanCorrupt(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // Classical additive seasonal decomposition of the daily value
    // series per event type: centered 7-day MA trend, zero-centered
    // epoch-day-phase seasonal, residual — the drift/seasonality
    // separator that tells q_cusum's alarms from Friday effects.
    "q_seasonal_decomp" -> ((s, dir) =>
      TimeSeries.seasonalDecompose(T(s, dir, "events"),
          "event_type", "ts", "value", 7)
        .orderBy("event_type", "day")),

    // Approximate-FD profile (g3 error): is doc_id a real key for
    // source, and how far are source→lang / lang→source from
    // functional — the schema-discovery gate before trusting a column
    // pair for dedup keys, joins, or SCD identity.
    "q_fd_profile" -> ((s, dir) =>
      Profiling.fdViolations(T(s, dir, "documents"),
        Seq("doc_id" -> "source", "source" -> "lang", "lang" -> "source"))
        .orderBy("lhs", "rhs")),

    // AMS F2 sketch of events.user_id with the exact self-join size
    // alongside — the join-planner's "how big would an equi-join on
    // this key be" number, median of 5 means of 16 deterministic
    // ±1-hash estimators (exact integers end to end).
    "q_ams_f2" -> ((s, dir) =>
      Profiling.amsF2(T(s, dir, "events"), col("user_id"))),

    // Johnson-Lindenstrauss distortion audit: 64-dim embeddings
    // projected to 16 dims through the deterministic ±1 md5 sign
    // matrix; every probe pair reports true vs projected squared
    // distance and the ratio — the measured evidence for using the
    // projection as an ANN pre-filter.
    "q_jl_distortion" -> ((s, dir) =>
      VectorOps.jlDistortion(T(s, dir, "embeddings"),
        "vec_id", "embedding", 64, 16, 20)),

    // Moving-average TTR (MATTR): length-fair lexical diversity per
    // doc — low MATTR at normal length = boilerplate/repetition; the
    // fixed 25-token window makes thresholds transfer across length
    // buckets (raw TTR collapses by Heaps' law).
    "q_mattr" -> ((s, dir) =>
      TextOps.mattr(T(s, dir, "documents"), "doc_id", "text", 25)
        .orderBy("doc_id")),

    // Deterministic fill-in-the-middle: hash-drawn cut points split
    // each doc into prefix/middle/suffix + the assembled PSM training
    // string — the infilling-pretraining pair generator (q_span_corrupt
    // is the denoising sibling).
    "q_fim" -> ((s, dir) =>
      TextOps.fimSplit(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // KMV mergeability, proven as a hash-checked query: the corpus-wide
    // trigram-vocabulary sketch computed directly vs merged from the
    // per-source sketches — the property that lets each of 1000
    // executors ship k longs instead of a vocabulary (q_kmv_distinct's
    // scale story, made falsifiable).
    "q_kmv_merge" -> ((s, dir) =>
      Profiling.kmvMergeProof(labeledShingles(s, dir, "source"),
        "source", col("shingle"), 64)),

    // Multi-touch attribution: linear and U-shaped (40/20/40) fractional
    // credit per conversion segment, rolled up per touch type — the
    // budget-allocation companion of q_attribution's first/last picks.
    "q_attribution_multi" -> ((s, dir) =>
      EventOps.multiTouchAttribution(T(s, dir, "events"), "user_id", "ts",
          "event_id", "event_type", "purchase")
        .orderBy("touch_type")),

    // Kaplan-Meier customer-lifetime survival (30-day units) with
    // right-censoring (last order within 180 days of corpus end = still
    // active): the churn curve that does not pretend active customers
    // already died.
    "q_km_survival" -> ((s, dir) =>
      EventOps.kaplanMeier(T(s, dir, "orders"), "o_custkey", "o_orderdate",
          180, 30)
        .orderBy("life")),

    // Quantized-retrieval recall: per probe, top-10 by exact float dot
    // vs by the int8 estimate — the measured cost of serving retrieval
    // from 4x-smaller vectors (q_quantize_int8's accuracy audit).
    "q_int8_recall" -> ((s, dir) =>
      VectorOps.int8Recall(T(s, dir, "embeddings"), "vec_id", "embedding",
          10, 20)
        .orderBy("probe_id")),

    // One-bit sign-quantization recall (r19): the 64x-compression end
    // of the storage/recall ladder (float -> int8 4x -> JL 4x-dims ->
    // sign 64x) — top-10 by exact float dot vs by sign-agreement count
    // (the Hamming cosine estimator); integer agreements + id
    // tie-breaks keep the ranking bit-stable cross-engine.
    "q_sign_recall" -> ((s, dir) =>
      VectorOps.signRecall(T(s, dir, "embeddings"), "vec_id", "embedding",
          10, 20)
        .orderBy("probe_id")),

    // Token-weighted median doc length per language: each doc weighted
    // by what it contributes to a training run (the unweighted median
    // over-counts short docs); the cut is the exact 2*cumw >= totw
    // integer cross-multiplication, never percentile interpolation.
    "q_weighted_median" -> ((s, dir) =>
      Profiling.weightedMedian(T(s, dir, "documents"), "lang",
          col("n_chars"), size(TextOps.tokens(col("text"))))
        .orderBy("lang")),

    // k-anonymity / l-diversity audit over (nation, market segment):
    // the governance gate before shipping a "de-identified" extract —
    // q_pii_redact removes direct identifiers, THIS measures whether
    // the quasi-identifiers still single customers out.
    "q_k_anonymity" -> ((s, dir) =>
      Profiling.kAnonymity(T(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), col("c_acctbal"), 5)),

    // IVF probe-budget recall curve: top-5 recall vs brute force at
    // nProbe 1/2/4/8 over the persisted index — THE tuning curve for the
    // latency/recall trade a 100 TB ANN deployment actually dials
    // (q_lsh_recall_eval's sibling for the clustered index path).
    // (Kept on the ORIGINAL k=16 quantizer after the r17 promotion — this
    // curve is the documented "before" of the k=64 switch; the "after" is
    // q_ivf_recall_sqrtn directly below.)
    "q_ivf_recall_curve" -> ((s, dir) =>
      ivfRecallCurve(T(s, dir, "embeddings"), centroidsOf(s, dir, IvfK), Seq(1, 2, 4, 8))),

    // The same curve over a √N-sized coarse quantizer (k=64 ≈ √2000 at
    // sf0.1; VERDICT r15 item 4): more, smaller cells sharpen the
    // cell-boundary geometry, so at a MATCHED scan fraction (k=64 probing
    // 4·p cells touches the same corpus share as k=16 probing p) recall
    // should rise — this query measures whether it actually does on this
    // corpus, or whether quasi-random unit vectors put a ceiling on any
    // partition-based index (the honest-negative answer the C236 row
    // documents either way).
    "q_ivf_recall_sqrtn" -> ((s, dir) => {
      val centroids = prodCentroids(s, dir)
      ivfRecallCurve(T(s, dir, "embeddings"), centroids, Seq(4, 8, 16, 32),
        clustered = Some(graft.sources.IvfClusterStore.ensureClustered(s, dir,
          centroids, IvfK2, IvfIters)))
    }),

    // PQ rerank-budget recall curve: top-5 recall vs brute force with
    // exact re-scoring of the ADC top-5/10/20 — how much exact-rescore
    // budget buys back the quantization loss (q_ivf_recall_curve's
    // sibling for the code-compressed path).
    "q_pq_recall_curve" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val books = rawPqBooks(s, dir)
      val codes = graft.sources.PqCodeStore.ensureRawCodes(s, dir, books, PqM, PqK, PqIters)
      val queries = emb.where(col("vec_id") < 20)
      // r22: single-read frames — the r21 checkpoints (then shared by 3
      // per-budget branches) are extra jobs once the read-out is fused
      val brute = VectorOps.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("corpus_id"))
      // ONE ADC ranking AND one exact-vector fetch + rescore serve every
      // rerank budget (r16/r17: the LUT ranking is the expensive part and
      // the exact scores don't depend on the budget; re-cutting is free)
      val scored = VectorOps.rerankFetchScored(
          VectorOps.pqAdcRankedCoded(codes, queries, "vec_id", "embedding", books)
            .where(col("_rn") <= 20),
          emb, "vec_id", "embedding")
      // r22 (guide §2.4): ONE window + join + aggregate for all budgets —
      // `_rn <= r` eligibility reproduces cutTopK(r) exactly
      VectorOps.recallCurveFused(brute, scored, Seq(5, 10, 20),
        r => col("_rn") <= r, "rerank", k = 5)
    }),

    // Good-Turing frequency spectrum over trigram-shingle document
    // frequencies: how many dedup keys live in exactly c docs + the
    // smoothed c* head — N_1/N is the unseen-mass estimate that says
    // whether the dedup index has seen enough corpus; the tail-shape
    // companion of q_vocab_coverage and q_heaps_law.
    "q_freq_spectrum" -> ((s, dir) =>
      // artifact fast path (r16b): the ShingleStore already carries each
      // shingle's document frequency — read vocabulary-sized (shingle,
      // df) pairs instead of re-exploding the corpus text
      TextOps.freqSpectrumFromCounts(
        graft.sources.ShingleStore.ensureShingles(s, dir, 3)
          .select("shingle", "df").distinct()
          .select(col("df").as("_c")), 10)
        .orderBy("c")),

    // Dedup-granularity tuning curve: duplication rate at n-gram sizes
    // 1/2/3/5 — the measurement that justifies the n=3 dedup-key
    // convention instead of assuming it.
    "q_dup_rate_curve" -> ((s, dir) =>
      TextOps.dupRateCurve(T(s, dir, "documents"), "doc_id", "text",
          Seq(1, 2, 3, 5))
        .orderBy("n")),

    // The actionable end of q_fd_profile: the violating source groups
    // of source->lang ranked by rows-to-repair, with each group's
    // dominant label — g3 says how far the dependency is from holding,
    // THIS says where to look first.
    "q_fd_repair" -> ((s, dir) =>
      Profiling.fdViolationDetail(T(s, dir, "documents"),
        "source", "lang", 20)),

    // Seasonally-adjusted anomaly screen — the composition that makes
    // q_seasonal_decomp actionable: MAD over the DECOMPOSITION RESIDUAL
    // per event type, so a Friday spike that is merely the weekly
    // pattern no longer trips the screen that raw q_mad_outliers runs
    // on values. Residuals enter rounded(6) on BOTH engines, the score
    // rides the q_mad_outliers 12-scale decimal snapshot, and the 3.5
    // flag is the standard robust cutoff.
    "q_seasonal_outliers" -> ((s, dir) => {
      val resid = TimeSeries.seasonalDecompose(T(s, dir, "events"),
          "event_type", "ts", "value", 7)
        .where(col("residual").isNotNull)
        .select(col("event_type"), col("day"), col("residual"))
      Profiling.madScore(resid, Seq("event_type"), "residual")
        .select(col("event_type"), col("day"), col("residual"),
          Portable.pround(col("med"), 9).as("med"),
          round(col("mad"), 9).as("mad"),
          Portable.canonZero(round(col("mad_score").cast("decimal(28,12)"), 6)
            .cast("double")).as("mad_score"))
        .withColumn("is_outlier",
          when(col("mad_score").isNotNull, abs(col("mad_score")) > 3.5))
        .orderBy("event_type", "day")
    }),

    // Daily user growth: active / new / returning / cumulative users
    // per day — the acquisition-vs-retention decomposition of the event
    // stream (q_cohort_retention's daily, catalog-sized cousin).
    "q_user_growth" -> ((s, dir) =>
      EventOps.userGrowth(T(s, dir, "events"), "user_id", "ts")
        .orderBy("day")),

    // Two-proportion z-test: purchase conversion of the md5 cohort A
    // vs B — the A/B primitive for RATES (q_welch_t is the means
    // sibling); pooled variance, exact integer counts.
    "q_ab_test" -> ((s, dir) =>
      EventOps.abProportionTest(T(s, dir, "events"), "user_id",
        Portable.hash32(col("user_id")) % 2 === 0,
        col("event_type") === "purchase")),

    // Effective sample size of token-weighted doc sampling per language
    // (Kish): how many uniform draws the weighting is worth — near 1/n
    // means one heavy doc dominates every epoch.
    "q_ess" -> ((s, dir) =>
      Profiling.effectiveSampleSize(T(s, dir, "documents"), "lang",
          size(TextOps.tokens(col("text"))))
        .orderBy("lang")),

    // AMS inner-product join-size estimate: |orders x customer on
    // custkey| forecast from two catalog-sized +-1 sketches (same seeds
    // as q_ams_f2 — one sketch pass per table prices every pairwise
    // join among them), exact value alongside. The 100 TB planner
    // question "how many rows come out of this shuffle" answered
    // without a dry run.
    "q_join_size_est" -> ((s, dir) =>
      Profiling.amsJoinSize(
        T(s, dir, "orders"), col("o_custkey"),
        T(s, dir, "customer"), col("c_custkey"))),

    // LSH join-cost forecast: per SimHash band, bucket count, exact
    // candidate-pair fan-out and the largest bucket — prices the
    // near-dup shuffle (and names its straggler) BEFORE running it.
    "q_lsh_cost_plan" -> ((s, dir) =>
      TextOps.lshCostPlan(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("band")),

    // MinHash ESTIMATE accuracy, oracle-checked: on the LSH candidate
    // pairs, the 16-row signature's estimated Jaccard vs the exact
    // shingle Jaccard — mean/max absolute error and the share inside
    // the 0.25 (~2 sigma at k=16) band. The q_lsh_recall_eval sibling
    // answers "did banding find the pairs"; THIS answers "can you trust
    // the signature's similarity value without re-reading the docs".
    "q_minhash_est_eval" -> ((s, dir) => {
      val docs = T(s, dir, "documents").where(col("doc_id") < 200)
      val cand = TextOps.minHashLshCandidates(docs, "doc_id", "text",
        n = 3, k = 16, bands = 8)
      val exact = TextOps.ngramJaccardPairs(docs, "doc_id", "text", 3)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      val err = abs(col("est_jaccard") - col("jaccard"))
      cand.join(exact, Seq("id_a", "id_b"))
        .agg(count(lit(1)).as("n_pairs"),
          round(Portable.decSum(err, 12) / count(lit(1)), 6).as("mean_abs_err"),
          round(max(err), 6).as("max_abs_err"),
          sum(when(err <= 0.25, 1L).otherwise(0L)).as("n_within_band"))
    }),

    // Banded-LSH recall, measured as an oracle-checked query (not just a
    // spec): exact >=0.2 pairs vs the 8x2 LSH candidates on the SAME
    // verification subset — TP / misses / the recall ratio. The number a
    // curation run quotes when it swaps the brute-force near-dup pass
    // for the banded one.
    "q_lsh_recall_eval" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").where(col("vec_id") < 200)
      val exact = VectorOps.nearDupPairsExact(emb, "vec_id", "embedding", 0.2)
        .select(col("id_a"), col("id_b"))
      val lsh = VectorOps.nearDupPairsLsh(emb, "vec_id", "embedding", 0.2,
          bands = 8, planesPerBand = 2, dim = 64)
        .select(col("id_a"), col("id_b"), lit(1L).as("_hit"))
      exact.join(lsh, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("_hit"), lit(0L))).as("n_found"))
        .select(col("n_exact"), col("n_found"),
          (col("n_exact") - col("n_found")).as("n_missed"),
          when(col("n_exact") > 0,
            round(col("n_found").cast("double") /
              col("n_exact").cast("double"), 6)).as("recall"))
    }),

    // Multi-probe sign-LSH recall ladder (r19): the same exact >=0.2
    // truth set vs the 8x2 banded candidates at probe level 0 (exact
    // buckets — q_lsh_recall_eval's regime) and level 1 (each band's
    // Hamming-1 neighbor buckets probed too, Lv et al. 2007) — the
    // standard recall-at-fixed-memory lever, measured as an
    // oracle-checked query: what a curation run buys by probing 3x the
    // buckets instead of re-hashing with more bands.
    "q_lsh_multiprobe" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").where(col("vec_id") < 200)
      val exact = VectorOps.nearDupPairsExact(emb, "vec_id", "embedding", 0.2)
        .select(col("id_a"), col("id_b"))
      def recallRow(level: Int, cand: org.apache.spark.sql.DataFrame) =
        exact.join(cand.select(col("id_a"), col("id_b"), lit(1L).as("_hit")),
            Seq("id_a", "id_b"), "left")
          .agg(count(lit(1)).as("n_exact"),
            sum(coalesce(col("_hit"), lit(0L))).as("n_found"))
          .select(lit(level).as("probe_level"), col("n_exact"), col("n_found"),
            (col("n_exact") - col("n_found")).as("n_missed"),
            when(col("n_exact") > 0,
              round(col("n_found").cast("double") /
                col("n_exact").cast("double"), 6)).as("recall"))
      recallRow(0, VectorOps.nearDupPairsLsh(emb, "vec_id", "embedding", 0.2,
          bands = 8, planesPerBand = 2, dim = 64))
        .unionByName(recallRow(1, VectorOps.nearDupPairsLshMultiprobe(emb,
          "vec_id", "embedding", 0.2, bands = 8, planesPerBand = 2, dim = 64)))
        .orderBy("probe_level")
    })
  )

  /** Customer↔supplier trade edge list (supplier ids offset into a
    * disjoint space) shared by the graph queries and their oracles.
    */
  private val tradeEdgeCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Session-memoized (the qualityScoreCached pattern): four graph
    * queries (PageRank, BFS, degree distribution, dedup-adjacent shapes)
    * consume the same distinct customer↔supplier edge list; the
    * join+distinct is paid once per (session, sfDir) and reused as a
    * materialized localCheckpoint — at 100 TB the edge projection is the
    * expensive stage, the graph algorithms run on its compact output.
    */
  /** Shared top-100 BM25 ranking for the retrieval-eval family (q_rbo /
    * q_rrf_fuse / q_ndcg): the score frame is session-memoized
    * (TextOps.bm25ScoresCached), so the corpus-wide scoring runs once
    * per (application, corpus) and each consumer pays only the top-100
    * cut. Ties on the rounded score break by doc_id — engine-
    * deterministic ranks.
    */
  private def bm25Rank(s: SparkSession, dir: String): DataFrame =
    TextOps.bm25ScoresCached(T(s, dir, "documents"), "doc_id", "text", Bm25Terms, s, dir)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(100)
      .withColumn("rank", row_number().over(
        Portable.kRowWindow(col("bm25").desc, col("doc_id").asc)))
      .select("doc_id", "rank")

  /** Shared top-100 unigram-LM ranking (same memoization rationale). */
  private def lmRank(s: SparkSession, dir: String): DataFrame =
    TextOps.unigramLogProbCached(T(s, dir, "documents"), "doc_id", "text", s, dir)
      .orderBy(col("logprob").desc, col("doc_id").asc).limit(100)
      .withColumn("rank", row_number().over(
        Portable.kRowWindow(col("logprob").desc, col("doc_id").asc)))
      .select("doc_id", "rank")

  private def tradeEdges(s: SparkSession, dir: String): DataFrame =
    graft.ops.SessionMemo.memoize(tradeEdgeCache, (s.sparkContext.applicationId, dir)) {
      T(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(T(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), (col("l_suppkey") + 1000000L).as("supp"))
        .distinct()
        .localCheckpoint(true)
    }

  /** WEIGHTED trade edges — (cust, supp, w = line-item count per pair) —
    * the r12 graph queries' shared derivation: q_sssp reads it twice
    * (edges + seeds) and q_kcore filters it to the repeat-trade graph
    * (w ≥ 2), so without memoization the fact aggregate would run three
    * times per bench pass. Same lifecycle as [[tradeEdges]].
    */
  private val weightedTradeEdgeCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def weightedTradeEdges(s: SparkSession, dir: String): DataFrame =
    graft.ops.SessionMemo.memoize(weightedTradeEdgeCache, (s.sparkContext.applicationId, dir)) {
      T(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(T(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("cust"), (col("l_suppkey") + 1000000L).as("supp"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint(true)
    }


  /** Shingle rows re-labeled by a documents column — the persisted
    * ShingleStore artifact joined doc_id → label instead of re-exploding
    * text per query (r16b: the explode+distinct dominated every KMV
    * query's cost; the artifact already holds the identical per-doc
    * distinct trigrams, and the label join is a broadcast against the
    * doc catalog). Downstream KMV hashing distincts per (label, hash),
    * so the multiset framing is irrelevant — only the SET matters.
    */
  private def labeledShingles(s: SparkSession, dir: String, labelCol: String): DataFrame =
    graft.sources.ShingleStore.ensureShingles(s, dir, 3)
      .select("doc_id", "shingle")
      .join(broadcast(T(s, dir, "documents").select(col("doc_id"), col(labelCol))),
        Seq("doc_id"))

  /** IVF hyperparameters shared by the queries and their oracle generators.
    * IvfK = 16 is the ORIGINAL coarse quantizer, retained for
    * q_ivf_recall_curve as the documented before/after of the r17
    * promotion; IvfK2 = 64 (√N-sized: √2000 ≈ 45 → 64 at sf0.1) is the
    * PRODUCTION quantizer since r17 (VERDICT r16 item 3) — C238 measured
    * strict dominance at matched scan fraction (0.77 vs 0.60 at ¼ corpus,
    * 0.92 vs 0.79 at ½), so the serving queries (q_ivf_topk, q_ivfpq_topk,
    * q_ivfpq_res_topk, q_semantic_dedup, q_silhouette) key the k=64
    * artifact. IvfNProbe = 16 keeps the SAME ¼-corpus scan fraction the
    * old k=16/nProbe=4 configuration paid — the promotion buys recall at
    * equal cost, not cost at equal recall.
    */
  private val IvfK = 16
  private val IvfIters = 4
  private val IvfK2 = 64
  private val IvfNProbe = 16

  /** Train-or-load the persisted coarse quantizer for (dir, k) — one
    * definition so a parameter change cannot fork the artifact key
    * (VERDICT r16 item 8; previously repeated verbatim in five queries).
    */
  private def centroidsOf(s: SparkSession, dir: String, k: Int): Array[Array[Float]] =
    IvfIndex.centroidsFor(dir, k, IvfIters) {
      VectorOps.kMeansCentroids(T(s, dir, "embeddings"), "vec_id", "embedding",
        k = k, iters = IvfIters)
    }

  /** The production (k=64) quantizer. */
  private def prodCentroids(s: SparkSession, dir: String): Array[Array[Float]] =
    centroidsOf(s, dir, IvfK2)

  /** Train-or-load the raw-vector PQ codebooks (one definition — r16
    * item 8).
    */
  private def rawPqBooks(s: SparkSession, dir: String): Array[Array[Array[Float]]] =
    PqIndex.codebooksFor(dir, PqM, PqK, PqIters) {
      val emb = T(s, dir, "embeddings")
      (0 until PqM).map { m =>
        VectorOps.subKMeans(
          emb.select(col("vec_id"), slice(col("embedding"), m * PqSubDim + 1, PqSubDim).as("sub")),
          "vec_id", "sub", PqK, PqIters)
      }.toArray
    }

  /** Train-or-load the IVF-residual PQ codebooks against the production
    * quantizer (tagged by its (k, iters) — see PqResTag).
    */
  private def resPqBooks(s: SparkSession, dir: String): Array[Array[Array[Float]]] =
    PqIndex.codebooksFor(dir, PqM, PqK, PqIters, PqResTag) {
      VectorOps.trainResidualBooks(T(s, dir, "embeddings"), "vec_id", "embedding",
        prodCentroids(s, dir), PqM, PqSubDim, PqK, PqIters)
    }

  /** Shared recall-curve body of q_ivf_recall_curve / q_ivf_recall_sqrtn:
    * top-5 recall vs the brute-force cosine baseline at each probe budget.
    */
  private def ivfRecallCurve(emb: DataFrame, centroids: Array[Array[Float]],
                             nProbes: Seq[Int],
                             clustered: Option[DataFrame] = None): DataFrame = {
    // r21 (the q_pq_recall_curve sharing move, guide §1.2): ONE brute
    // ranking and ONE probe-annotated IVF scoring pass serve every probe
    // budget — the per-budget branches used to each re-scan the corpus
    // (4 brute passes + 4 IVF joins for a 4-point curve). Candidate sets
    // and ranks per budget are reproduced exactly by the `_probe < np`
    // prefix cut (ordered probe lists; scores budget-independent).
    val queries = emb.where(col("vec_id") < 20)
    // r22: the brute/scored frames are each read ONCE by the fused
    // read-out below, so their r21 eager checkpoints (needed when 3–4
    // per-budget branches re-joined them) became pure extra jobs — gone.
    val brute = VectorOps.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("corpus_id"))
    val corpusWithCell = clustered.fold(
        emb.select(col("vec_id").as("corpus_id"), col("embedding").as("c_vec"),
          VectorOps.nearestCell(col("embedding"), centroids).as("cell")))(
        cl => cl.select(col("vec_id").as("corpus_id"), col("embedding").as("c_vec"),
          col("cell")))
    val scored = VectorOps.ivfScoredWithProbeRank(corpusWithCell, queries,
        "vec_id", "embedding", centroids, nProbes.max)
    // r22 (guide §2.4): ONE window + join + aggregate for all budgets —
    // `_probe < np` eligibility reproduces ivfCutTopK(np) exactly
    VectorOps.recallCurveFused(brute, scored, nProbes,
      np => col("_probe") < np, "n_probe", k = 5)
  }

  /** PQ codebook shape. Re-dimensioned 4×16 → 16×16 in r16 (VERDICT r15
    * item 1): the 4-sub-space × 16-code books over 64-dim vectors were
    * measured too coarse for candidate generation (q_pq_recall_curve
    * top-5 recall 0.08/0.11/0.15 at rerank 5/10/20, sf0.1). Isotropic
    * quantization MSE scales ~k^(−2/d) per sub-space, so SHRINKING the
    * sub-space (d 16→4) beats adding codes: the measured curve is
    * 0.31/0.46/0.61 at 16×4-dim (vs 0.12/0.16/0.28 for the 8×8-dim
    * midpoint) — top-20 recall clears the 0.5 bar. Codes stay 4-bit
    * (16 codes = 8 B packed per vector, FAISS PQ16x4 shape — still a
    * 32× scan-payload compression).
    */
  private val PqM = 16     // sub-spaces
  private val PqSubDim = 4 // 64-dim embeddings / 16
  private val PqK = 16     // codes per sub-space
  private val PqIters = 4

  /** Artifact tag for the IVF-residual PQ codebooks (PqIndex.artifactPath
    * `tag`): residual books depend on the coarse quantizer they
    * residualize against, so its (k, iters) key them. Since the r17
    * promotion the residual path keys the PRODUCTION k=64 quantizer.
    */
  private val PqResTag = s"res${IvfK2}x$IvfIters"

  /** DuckDB oracle for q_sprt, generated with the SAME 9-dp rounded
    * constants the operator embeds (one r9 rule, two callers).
    */
  private def sprtSql(p0: Double, p1: Double, alpha: Double, beta: Double): String = {
    def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val aInc = r9(math.log(p1 / p0))
    val bInc = r9(math.log((1.0 - p1) / (1.0 - p0)))
    val upper = r9(math.log((1.0 - beta) / alpha))
    val lower = r9(math.log(beta / (1.0 - alpha)))
    raw"""WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_hit
           FROM events
           WHERE (event_type = 'purchase') IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         walk AS (
           SELECT day, n, n_hit,
             sum(CAST(n_hit::DOUBLE * ($aInc) + (n - n_hit)::DOUBLE * ($bInc)
               AS DECIMAL(28,12))) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE AS llr
           FROM daily),
         dec AS (
           SELECT day, n, n_hit, llr,
             min(CASE WHEN llr >= ($upper) THEN day END) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hiday,
             min(CASE WHEN llr <= ($lower) THEN day END) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS loday
           FROM walk)
         SELECT day, n, n_hit, round(llr, 6) + 0 AS llr,
           CASE WHEN hiday IS NOT NULL AND (loday IS NULL OR hiday <= loday)
                THEN 'accept_h1'
                WHEN loday IS NOT NULL THEN 'accept_h0'
                ELSE 'continue' END AS decision
         FROM dec ORDER BY day"""
  }

  /** DuckDB oracle for q_evalue, generated with the SAME 9-dp rounded
    * constants the operator embeds (one r9 rule, two callers — the
    * sprtSql convention; the walk is the SPRT's LLR read in log-e-value
    * space, gated at ln(1/α)).
    */
  private def eProcessSql(p0: Double, p1: Double, alpha: Double): String = {
    def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val aInc = r9(math.log(p1 / p0))
    val bInc = r9(math.log((1.0 - p1) / (1.0 - p0)))
    val thr = r9(math.log(1.0 / alpha))
    raw"""WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_hit
           FROM events
           WHERE (event_type = 'purchase') IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         walk AS (
           SELECT day, n, n_hit,
             sum(CAST(n_hit::DOUBLE * ($aInc) + (n - n_hit)::DOUBLE * ($bInc)
               AS DECIMAL(28,12))) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE AS loge
           FROM daily),
         m AS (
           SELECT day, n, n_hit, loge,
             max(loge) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxe
           FROM walk)
         SELECT day, n, n_hit, round(loge, 6) + 0 AS log_e,
           round(least(0.0, -maxe), 6) + 0 AS log_avp,
           CASE WHEN maxe >= ($thr) THEN 'reject_h0' ELSE 'continue' END AS decision
         FROM m ORDER BY day"""
  }

  /** DuckDB oracle for q_cluster_nmi, generated from BOTH persisted
    * centroid artifacts: each side's assignment is the same dot-argmax
    * (left-fold dots, dot DESC / cell ASC tiebreak) the silhouette
    * oracle uses; the agreement statistics reduce to entropies of
    * integer counts in the C110 shape, combined by MI = Hₐ + H_b − Hₐ_b.
    */
  private def clusterNmiSql(ca: Array[Array[Float]],
                            cb: Array[Array[Float]]): String = {
    def centsVals(cs: Array[Array[Float]]) = cs.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.map(_.toDouble).mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n             ")
    raw"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ca(cell, c) AS (VALUES
             ${centsVals(ca)}),
         cbm(cell, c) AS (VALUES
             ${centsVals(cb)}),
         da AS (
           SELECT vec_id, cell,
             list_reduce(list_transform(range(1, 65), i -> e[i]*c[i]), (x, y) -> x + y) AS dot
           FROM v CROSS JOIN ca),
         asga AS (
           SELECT vec_id, cell AS a FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell ASC) AS rn
             FROM da) WHERE rn = 1),
         db AS (
           SELECT vec_id, cell,
             list_reduce(list_transform(range(1, 65), i -> e[i]*c[i]), (x, y) -> x + y) AS dot
           FROM v CROSS JOIN cbm),
         asgb AS (
           SELECT vec_id, cell AS b FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell ASC) AS rn
             FROM db) WHERE rn = 1),
         j AS (SELECT a, b, count(*)::BIGINT AS nij
               FROM asga JOIN asgb USING (vec_id) GROUP BY 1, 2),
         t AS (SELECT coalesce(sum(nij), 0)::BIGINT AS n FROM j),
         sab AS (SELECT sum(CAST(nij::DOUBLE * ln(nij::DOUBLE) AS DECIMAL(28,12)))::DOUBLE AS sab FROM j),
         sa AS (SELECT sum(CAST(ni::DOUBLE * ln(ni::DOUBLE) AS DECIMAL(28,12)))::DOUBLE AS sa
                FROM (SELECT sum(nij)::BIGINT AS ni FROM j GROUP BY a)),
         sb AS (SELECT sum(CAST(nj::DOUBLE * ln(nj::DOUBLE) AS DECIMAL(28,12)))::DOUBLE AS sb
                FROM (SELECT sum(nij)::BIGINT AS nj FROM j GROUP BY b)),
         f AS (
           SELECT t.n,
             CASE WHEN t.n > 0 THEN ln(t.n::DOUBLE) - sa.sa/t.n::DOUBLE END AS ha,
             CASE WHEN t.n > 0 THEN ln(t.n::DOUBLE) - sb.sb/t.n::DOUBLE END AS hb,
             CASE WHEN t.n > 0 THEN ln(t.n::DOUBLE) - sab.sab/t.n::DOUBLE END AS hab
           FROM t CROSS JOIN sab CROSS JOIN sa CROSS JOIN sb)
         SELECT n, round(ha, 6) + 0 AS h_a, round(hb, 6) + 0 AS h_b,
           round(ha + hb - hab, 6) + 0 AS mi_nats,
           CASE WHEN ha > 0 AND hb > 0
                THEN round((ha + hb - hab)/sqrt(ha*hb), 6) + 0 END AS nmi
         FROM f"""
  }

  /** DuckDB oracle for q_bradley_terry: the winner-per-order window, the
    * symmetric comparison matrix, then `iters` unrolled MM rounds — each
    * round one decimal-summed denominator aggregate against the previous
    * round's π, then a normalization. MATERIALIZED on sym/players/p{r}:
    * each is referenced 2-3× by the next stage (the q_kcore lesson —
    * inlining would grow the plan 3^rounds).
    */
  private def bradleyTerrySql(iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      val prev = s"p${r - 1}"
      s"""d$r AS (
           SELECT s.i AS p, sum(CAST(s.m::DOUBLE/(pa.pi + pb.pi) AS DECIMAL(28,12)))::DOUBLE AS den
           FROM sym s JOIN $prev pa ON pa.p = s.i JOIN $prev pb ON pb.p = s.j
           GROUP BY s.i),
         u$r AS (
           SELECT pl.p, pl.w::DOUBLE / d$r.den AS pi2
           FROM players pl JOIN d$r ON d$r.p = pl.p),
         n$r AS (SELECT sum(CAST(pi2 AS DECIMAL(28,12)))::DOUBLE AS s FROM u$r),
         p$r AS MATERIALIZED (SELECT u$r.p, u$r.pi2/n$r.s AS pi FROM u$r CROSS JOIN n$r)"""
    }.mkString(",\n         ")
    raw"""WITH win AS (
           SELECT l_orderkey, l_suppkey AS winner FROM (
             SELECT l_orderkey, l_suppkey,
               row_number() OVER (PARTITION BY l_orderkey
                 ORDER BY l_extendedprice DESC, l_suppkey ASC) AS rn
             FROM lineitem) WHERE rn = 1),
         oth AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         comp AS (
           SELECT w.winner, o.l_suppkey AS loser
           FROM win w JOIN oth o USING (l_orderkey)
           WHERE o.l_suppkey <> w.winner),
         pairs AS (SELECT winner AS i, loser AS j, count(*)::BIGINT AS n
                   FROM comp GROUP BY 1, 2),
         sym AS MATERIALIZED (
           SELECT i, j, sum(n)::BIGINT AS m FROM (
             SELECT i, j, n FROM pairs UNION ALL SELECT j AS i, i AS j, n FROM pairs)
           GROUP BY 1, 2),
         wins AS (SELECT i AS p, sum(n)::BIGINT AS w FROM pairs GROUP BY 1),
         totals AS (SELECT i AS p, sum(m)::BIGINT AS tot FROM sym GROUP BY 1),
         players AS MATERIALIZED (
           SELECT t.p, coalesce(wn.w, 0)::BIGINT AS w, t.tot
           FROM totals t LEFT JOIN wins wn ON wn.p = t.p),
         p0 AS (SELECT p, 1.0::DOUBLE AS pi FROM players),
         $rounds
         SELECT pl.p AS s_suppkey, pl.w AS wins, (pl.tot - pl.w)::BIGINT AS losses,
           round(pf.pi, 6) + 0 AS strength
         FROM players pl JOIN p$iters pf ON pf.p = pl.p
         ORDER BY s_suppkey"""
  }

  /** DuckDB oracle for q_gumbel_tail, generated with the SAME 9-dp
    * rounded constants the operator embeds (one r9 rule, two callers —
    * the constants cannot fork).
    */
  private def gumbelTailSql(returnPeriods: Seq[Int]): String = {
    def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val b9 = r9(math.sqrt(6.0) / math.Pi)
    val g9 = r9(0.57721566490153286)
    val rows = returnPeriods
      .map(t => s"($t, ${r9(-math.log(-math.log(1.0 - 1.0 / t)))})").mkString(", ")
    raw"""WITH blocks AS (
           SELECT CAST(ts AS DATE) AS d, max(value) AS m
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         a AS (
           SELECT count(*)::BIGINT AS n_blocks,
             sum(CAST(m AS DECIMAL(28,6)))::DOUBLE AS s,
             sum(CAST(m*m AS DECIMAL(28,6)))::DOUBLE AS q
           FROM blocks),
         f AS (
           SELECT n_blocks,
             CASE WHEN n_blocks > 0 THEN s/n_blocks::DOUBLE END AS mean,
             CASE WHEN n_blocks > 1 THEN
               sqrt((q - n_blocks::DOUBLE*(s/n_blocks::DOUBLE)*(s/n_blocks::DOUBLE))
                    /(n_blocks::DOUBLE - 1)) END AS sd
           FROM a),
         g AS (
           SELECT n_blocks, mean - $g9*(sd*$b9) AS mu, sd*$b9 AS beta FROM f)
         SELECT pr.t::BIGINT AS return_period, n_blocks,
           round(mu, 6) + 0 AS mu, round(beta, 6) + 0 AS beta,
           round(mu + beta*pr.c::DOUBLE, 6) + 0 AS return_level
         FROM g CROSS JOIN (VALUES $rows) AS pr(t, c)
         ORDER BY return_period"""
  }

  /** BPE merge-table size shared by q_bpe_merges / q_bpe_encode and the
    * encode oracle generator.
    */
  private val BpeN = 8

  /** DuckDB oracle for q_bpe_encode, generated from the trained merge
    * table: each document's tokens are joined into a '|'-delimited string
    * ("|t1||t2||...||tk|" — every token wrapped in its own bars, so a
    * pair (a, b) is the unambiguous substring "|a||b|"), and the greedy
    * left-to-right non-overlapping merge pass of TextOps.bpeMergeStep is
    * exactly replace()'s contract: scan left to right, replace, continue
    * AFTER the replacement (so "a a a" under (a,a) yields [aa, a] in both
    * engines). Merges nest in training order, innermost first. Sound
    * because no corpus token contains '|' (verified per sf; tokens are
    * \s+-split so they contain no whitespace either).
    */
  private def bpeEncodeSql(merges: Seq[(String, String)]): String = {
    def q(s: String) = s.replace("'", "''")
    val chain = merges.foldLeft("s0") { case (expr, (a, b)) =>
      s"replace($expr, '|${q(a)}||${q(b)}|', '|${q(a + b)}|')"
    }
    s"""WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, len(toks)::BIGINT AS n_tokens_raw,
                  '|' || array_to_string(toks, '||') || '|' AS s0
           FROM t),
         e AS (SELECT doc_id, n_tokens_raw, replace(trim($chain, '|'), '||', ' ') AS encoded
               FROM s)
       SELECT doc_id, n_tokens_raw,
              -- empty-doc guard (ADVICE r8): string_split('', ' ') is ['']
              -- in DuckDB (count 1) where Spark's size(empty array) is 0
              (CASE WHEN encoded = '' THEN 0
                    ELSE len(string_split(encoded, ' ')) END)::BIGINT AS n_tokens_bpe,
              encoded
       FROM e ORDER BY doc_id"""
  }

  /** DuckDB oracle for q_bpe_merges — the training loop ITSELF replayed
    * in SQL (r12; drops the rows-only trio to the two approx-sketch
    * members that are rows-only by stated design). Each of the `n`
    * rounds is three chained CTEs over the '|'-delimited corpus state
    * bpeEncodeSql already proved sound: adjacent-pair counts (the
    * range/list_transform bigram idiom of q_top_bigrams), the argmax
    * under the exact training tie rule (cnt desc, then pair
    * lexicographic — binary collation in both engines), and the greedy
    * left-to-right non-overlapping corpus rewrite as one replace() per
    * round. Early-stop parity holds for free: an exhausted corpus makes
    * m{r} empty, the cross-joined rewrite empties the state, and every
    * later round contributes zero rows — exactly the Scala loop's break.
    * Spark's per-round `size >= 2` re-filter needs no replica: a
    * one-token document yields no pairs in either engine.
    */
  private def bpeMergesSql(n: Int): String = {
    val rounds = (1 to n).map { r =>
      val count =
        s"""c$r AS (
           SELECT p.pa AS a, p.pb AS b, count(*) AS cnt FROM (
             SELECT unnest(list_transform(range(1, len(toks)),
               i -> {'pa': toks[i], 'pb': toks[i+1]})) AS p
             FROM (SELECT string_split(trim(s, '|'), '||') AS toks FROM s${r - 1}))
           GROUP BY a, b),
         m$r AS (SELECT $r AS iteration, a, b, cnt FROM c$r
                 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"""
      val rewrite =
        if (r == n) ""
        else s""",
         s$r AS (SELECT replace(p.s, '|'||m.a||'||'||m.b||'|', '|'||m.a||m.b||'|') AS s
                 FROM s${r - 1} p CROSS JOIN m$r m)"""
      count + rewrite
    }.mkString(",\n         ")
    s"""WITH s0 AS (
           SELECT '|' || array_to_string(toks, '||') || '|' AS s
           FROM (SELECT list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
                 FROM documents)
           WHERE len(toks) >= 2),
         $rounds
       SELECT iteration, a AS pair_a, b AS pair_b, cnt AS support, a || b AS merged
       FROM (${(1 to n).map(r => s"SELECT * FROM m$r").mkString(" UNION ALL ")})
       ORDER BY iteration"""
  }

  /** The q_bpe_encode oracle entry — same contract as pqOracleEntry:
    * present only when the merge table for the last-queried dataset is
    * obtainable (persisted artifact, or trained on the spot if a session
    * is live); the driver falls back to rows-only otherwise.
    */
  private def bpeOracleEntry: Map[String, String] = BpeModel.lastSfDir match {
    case None => Map.empty
    case Some(dir) =>
      val mOpt = BpeModel.loadIfPresent(dir, BpeN).orElse {
        SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).map { s =>
          BpeModel.mergesFor(dir, BpeN) {
            TextOps.bpeTrainMerges(Tables.load(s, dir, "documents"), "text", BpeN)
          }
        }
      }
      mOpt.filter(_.nonEmpty)
        .map { m =>
          val enc = bpeEncodeSql(m.map { case (_, a, b, _) => (a, b) })
          Map("q_bpe_encode" -> enc,
            "q_bpe_fertility" ->
              s"""WITH enc AS ($enc),
                 j AS (SELECT d.lang, length(d.text)::BIGINT AS chars,
                         e.n_tokens_raw, e.n_tokens_bpe
                       FROM enc e JOIN documents d ON e.doc_id = d.doc_id)
                 SELECT lang, count(*) AS n_docs,
                   sum(chars)::BIGINT AS n_chars,
                   sum(n_tokens_raw)::BIGINT AS n_raw,
                   sum(n_tokens_bpe)::BIGINT AS n_bpe,
                   CASE WHEN sum(n_tokens_bpe) > 0
                     THEN round(sum(chars)::DOUBLE / sum(n_tokens_bpe)::DOUBLE, 6) + 0 END AS chars_per_token,
                   CASE WHEN sum(n_tokens_bpe) > 0
                     THEN round(sum(n_tokens_raw)::DOUBLE / sum(n_tokens_bpe)::DOUBLE, 6) + 0 END AS compression
                 FROM j GROUP BY lang ORDER BY lang""")
        }
        .getOrElse(Map.empty)
  }

  /** DuckDB oracle for q_ivf_topk, generated from the persisted IVF index
    * artifact: the centroid floats are embedded as double literals (exact —
    * float widening is lossless), the per-vector nearest cell / per-query
    * probe cells replicate nearestCell/topCells (max dot, ties to the
    * lowest cell id), and the re-score is the same cosine as q_cosine_topk.
    */
  private def ivfTopKSql(centroids: Array[Array[Float]], nProbe: Int): String = {
    val cents = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.map(_.toDouble).mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n             ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         cents(cell, c) AS (VALUES
             $cents),
         cell_dots AS (
           SELECT vec_id, cell,
             list_reduce(list_transform(range(1, 65), i -> e[i] * c[i]), (x, y) -> x + y) AS d
           FROM v CROSS JOIN cents),
         corpus_cell AS (
           SELECT vec_id, cell FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rn
             FROM cell_dots)
           WHERE rn = 1),
         query_cells AS (
           SELECT vec_id, cell FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rn
             FROM cell_dots WHERE vec_id < 8)
           WHERE rn <= $nProbe),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         cand AS (
           SELECT q.vec_id AS query_id, c.vec_id AS corpus_id
           FROM query_cells q JOIN corpus_cell c ON q.cell = c.cell AND q.vec_id <> c.vec_id),
         scored AS (
           SELECT query_id, corpus_id,
             list_reduce(list_transform(range(1, 65), i -> nq.e[i]*nc.e[i]), (x, y) -> x + y)
               / (nq.nrm * nc.nrm) AS score
           FROM cand
           JOIN n nq ON nq.vec_id = query_id
           JOIN n nc ON nc.vec_id = corpus_id)
         SELECT query_id, corpus_id, score, rank FROM (
           SELECT query_id, corpus_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** DuckDB oracle for q_ivf_recall_curve: the ivfTopKSql cell
    * machinery (same persisted centroids, same argmax/probe rules)
    * replayed at every probe budget in `nProbes`, each budget's top-k
    * joined against the brute-force cosine top-k of the same query set
    * — recall is one exact integer ratio per budget.
    */
  private def ivfRecallCurveSql(centroids: Array[Array[Float]],
                                nProbes: Seq[Int], k: Int,
                                probeLimit: Int): String = {
    val cents = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.map(_.toDouble).mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n             ")
    val perNp = nProbes.map { np =>
      s"""top_$np AS (
           SELECT query_id, corpus_id, 1 AS hit FROM (
             SELECT s.query_id, s.corpus_id,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY s.score DESC, s.corpus_id ASC) AS rank
             FROM (
               SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
                 list_reduce(list_transform(range(1, 65), i -> nq.e[i]*nc.e[i]), (x, y) -> x + y)
                   / (nq.nrm * nc.nrm) AS score
               FROM query_cells q
               JOIN corpus_cell c ON q.cell = c.cell AND q.vec_id <> c.vec_id
               JOIN n nq ON nq.vec_id = q.vec_id
               JOIN n nc ON nc.vec_id = c.vec_id
               WHERE q.rn <= $np) s)
           WHERE rank <= $k)"""
    }.mkString(",\n         ")
    val unions = nProbes.map { np =>
      s"""SELECT $np::BIGINT AS n_probe, count(*)::BIGINT AS n_pairs,
           sum(coalesce(hit, 0))::BIGINT AS n_found,
           round(sum(coalesce(hit, 0))::DOUBLE / count(*), 6) + 0 AS recall
         FROM brute b LEFT JOIN top_$np t
           ON b.query_id = t.query_id AND b.corpus_id = t.corpus_id"""
    }.mkString("\n         UNION ALL ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         cents(cell, c) AS (VALUES
             $cents),
         cell_dots AS (
           SELECT vec_id, cell,
             list_reduce(list_transform(range(1, 65), i -> e[i] * c[i]), (x, y) -> x + y) AS d
           FROM v CROSS JOIN cents),
         corpus_cell AS (
           SELECT vec_id, cell FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rn
             FROM cell_dots)
           WHERE rn = 1),
         query_cells AS (
           SELECT vec_id, cell, rn FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rn
             FROM cell_dots WHERE vec_id < $probeLimit)
           WHERE rn <= ${nProbes.max}),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         brute AS (
           SELECT query_id, corpus_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_reduce(list_transform(range(1, 65), i -> q.e[i]*c.e[i]), (x, y) -> x + y)
                   / (q.nrm * c.nrm) DESC, c.vec_id ASC) AS rank
             FROM n q JOIN n c ON q.vec_id <> c.vec_id
             WHERE q.vec_id < $probeLimit)
           WHERE rank <= $k),
         $perNp
         SELECT n_probe, n_pairs, n_found, recall FROM (
         $unions)
         ORDER BY n_probe"""
  }

  /** DuckDB oracle for q_pq_topk, generated from the persisted PQ
    * codebooks: sub-space codes replicate VectorOps.nearestCode (argmax of
    * dot − ½‖c‖², both the centroid floats and the precomputed ½‖c‖²
    * embedded as exact double literals), the ADC ranking is the decimal
    * sum of the per-sub-space 16-element left-fold dots (order-free on
    * both engines), and the re-rank is the exact cosine.
    */
  private def pqTopKSql(books: Array[Array[Array[Float]]], rerank: Int): String = {
    val d = books(0)(0).length
    val dim = books.length * d
    val cents = books.zipWithIndex.flatMap { case (book, m) =>
      book.zipWithIndex.map { case (c, j) =>
        s"($m, $j, ${c.map(_.toDouble).mkString("[", ", ", "]")}::DOUBLE[], ${VectorOps.halfNorm2(c)})"
      }
    }.mkString(",\n             ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         cents(m, j, c, h) AS (VALUES
             $cents),
         sub_scores AS (
           SELECT v.vec_id, cents.m, cents.j,
             list_reduce(list_transform(range(1, ${d + 1}), i -> e[cents.m * $d + i] * c[i]), (x, y) -> x + y)
               - cents.h AS s
           FROM v CROSS JOIN cents),
         codes AS (
           SELECT vec_id, m, j FROM (
             SELECT vec_id, m, j,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY s DESC, j ASC) AS rn
             FROM sub_scores)
           WHERE rn = 1),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 8),
         tm AS (
           SELECT q.vec_id AS query_id, codes.vec_id AS corpus_id,
             CAST(list_reduce(list_transform(range(1, ${d + 1}),
                 x -> q.e[cents.m * $d + x] * cents.c[x]), (a, b) -> a + b)
               AS DECIMAL(28,12)) AS t
           FROM q
           CROSS JOIN codes
           JOIN cents ON cents.m = codes.m AND cents.j = codes.j
           WHERE q.vec_id <> codes.vec_id),
         approx AS (
           SELECT query_id, corpus_id, sum(t)::DOUBLE AS ad
           FROM tm GROUP BY query_id, corpus_id),
         cand AS (
           SELECT query_id, corpus_id FROM (
             SELECT query_id, corpus_id,
               row_number() OVER (PARTITION BY query_id ORDER BY ad DESC, corpus_id ASC) AS rn
             FROM approx)
           WHERE rn <= $rerank),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, ${dim + 1}), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         scored AS (
           SELECT query_id, corpus_id,
             list_reduce(list_transform(range(1, ${dim + 1}), i -> nq.e[i]*nc.e[i]), (x, y) -> x + y)
               / (nq.nrm * nc.nrm) AS score
           FROM cand
           JOIN n nq ON nq.vec_id = query_id
           JOIN n nc ON nc.vec_id = corpus_id)
         SELECT query_id, corpus_id, score, rank FROM (
           SELECT query_id, corpus_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** DuckDB oracle for q_pq_recall_curve: the pqTopKSql code/ADC
    * machinery replayed once, then re-ranked at every rerank budget in
    * `reranks`, each budget's exact-rescored top-k joined against the
    * brute-force cosine top-k — recall is one exact integer ratio per
    * budget.
    */
  private def pqRecallCurveSql(books: Array[Array[Array[Float]]],
                               reranks: Seq[Int], k: Int,
                               probeLimit: Int): String = {
    val d = books(0)(0).length
    val dim = books.length * d
    val cents = books.zipWithIndex.flatMap { case (book, m) =>
      book.zipWithIndex.map { case (c, j) =>
        s"($m, $j, ${c.map(_.toDouble).mkString("[", ", ", "]")}::DOUBLE[], ${VectorOps.halfNorm2(c)})"
      }
    }.mkString(",\n             ")
    val perR = reranks.map { r =>
      s"""top_$r AS (
           SELECT query_id, corpus_id, 1 AS hit FROM (
             SELECT s.query_id, s.corpus_id,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY s.score DESC, s.corpus_id ASC) AS rank
             FROM (
               SELECT a.query_id, a.corpus_id,
                 list_reduce(list_transform(range(1, ${dim + 1}), i -> nq.e[i]*nc.e[i]), (x, y) -> x + y)
                   / (nq.nrm * nc.nrm) AS score
               FROM ranked a
               JOIN n nq ON nq.vec_id = a.query_id
               JOIN n nc ON nc.vec_id = a.corpus_id
               WHERE a.rn <= $r) s)
           WHERE rank <= $k)"""
    }.mkString(",\n         ")
    val unions = reranks.map { r =>
      s"""SELECT $r::BIGINT AS rerank, count(*)::BIGINT AS n_pairs,
           sum(coalesce(hit, 0))::BIGINT AS n_found,
           round(sum(coalesce(hit, 0))::DOUBLE / count(*), 6) + 0 AS recall
         FROM brute b LEFT JOIN top_$r t
           ON b.query_id = t.query_id AND b.corpus_id = t.corpus_id"""
    }.mkString("\n         UNION ALL ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         cents(m, j, c, h) AS (VALUES
             $cents),
         sub_scores AS (
           SELECT v.vec_id, cents.m, cents.j,
             list_reduce(list_transform(range(1, ${d + 1}), i -> e[cents.m * $d + i] * c[i]), (x, y) -> x + y)
               - cents.h AS s
           FROM v CROSS JOIN cents),
         codes AS (
           SELECT vec_id, m, j FROM (
             SELECT vec_id, m, j,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY s DESC, j ASC) AS rn
             FROM sub_scores)
           WHERE rn = 1),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < $probeLimit),
         tm AS (
           SELECT q.vec_id AS query_id, codes.vec_id AS corpus_id,
             CAST(list_reduce(list_transform(range(1, ${d + 1}),
                 x -> q.e[cents.m * $d + x] * cents.c[x]), (a, b) -> a + b)
               AS DECIMAL(28,12)) AS t
           FROM q
           CROSS JOIN codes
           JOIN cents ON cents.m = codes.m AND cents.j = codes.j
           WHERE q.vec_id <> codes.vec_id),
         ranked AS (
           SELECT query_id, corpus_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sum(t)::DOUBLE DESC, corpus_id ASC) AS rn
           FROM tm GROUP BY query_id, corpus_id),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, ${dim + 1}), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         brute AS (
           SELECT query_id, corpus_id FROM (
             SELECT q2.vec_id AS query_id, c2.vec_id AS corpus_id,
               row_number() OVER (PARTITION BY q2.vec_id
                 ORDER BY list_reduce(list_transform(range(1, ${dim + 1}), i -> q2.e[i]*c2.e[i]), (x, y) -> x + y)
                   / (q2.nrm * c2.nrm) DESC, c2.vec_id ASC) AS rank
             FROM n q2 JOIN n c2 ON q2.vec_id <> c2.vec_id
             WHERE q2.vec_id < $probeLimit)
           WHERE rank <= $k),
         $perR
         SELECT rerank, n_pairs, n_found, recall FROM (
         $unions)
         ORDER BY rerank"""
  }

  /** DuckDB oracle for q_ivfpq_topk / q_ivfpq_res_topk: the IVF half
    * (corpus cell = argmax centroid dot, query probes its nProbe best
    * cells — identical CTEs to ivfTopKSql) gates the candidate pairs; the
    * PQ half (positional codes via argmax of dot − ½‖c‖², ADC = decimal
    * sum of per-sub-space LUT dots — identical CTEs to pqTopKSql) ranks
    * them; top `rerank` re-score with the exact cosine.
    *
    * With `residual = true` (r7 item 5) the code input is each corpus
    * vector's residual v − centroid(cell), computed in single-precision
    * FLOAT (bit-identical to Spark's float zip_with — both engines
    * subtract FLOAT from FLOAT), and the ADC approximation additionally
    * carries q·centroid(cell) (exact — the query's own cell_dots entry)
    * as a decimal addend. Both artifacts' floats embed as exact double
    * literals (float→double is lossless); the centroid additionally
    * embeds as a FLOAT[] literal for the residual subtraction.
    */
  private def ivfPqTopKSql(centroids: Array[Array[Float]], nProbe: Int,
                           books: Array[Array[Array[Float]]], rerank: Int,
                           residual: Boolean = false): String = {
    val d = books(0)(0).length
    val dim = books.length * d
    val icents = centroids.zipWithIndex.map { case (c, i) =>
      val lit = c.map(_.toDouble).mkString("[", ", ", "]")
      s"($i, $lit::DOUBLE[], $lit::FLOAT[])"
    }.mkString(",\n             ")
    val pcents = books.zipWithIndex.flatMap { case (book, m) =>
      book.zipWithIndex.map { case (c, j) =>
        s"($m, $j, ${c.map(_.toDouble).mkString("[", ", ", "]")}::DOUBLE[], ${VectorOps.halfNorm2(c)})"
      }
    }.mkString(",\n             ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         icents(cell, c, cf) AS (VALUES
             $icents),
         cell_dots AS (
           SELECT vec_id, cell,
             list_reduce(list_transform(range(1, ${dim + 1}), i -> e[i] * c[i]), (x, y) -> x + y) AS d
           FROM v CROSS JOIN icents),
         corpus_cell AS (
           SELECT vec_id, cell FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rn
             FROM cell_dots)
           WHERE rn = 1),
         query_cells AS (
           SELECT vec_id, cell FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rn
             FROM cell_dots WHERE vec_id < 8)
           WHERE rn <= $nProbe),
         enc AS (
           SELECT emb.vec_id,
             ${if (residual)
               s"list_transform(range(1, ${dim + 1}), i -> ((emb.embedding[i] - icents.cf[i]))::DOUBLE)"
             else "emb.embedding::DOUBLE[]"} AS r
           FROM embeddings emb
           JOIN corpus_cell cc ON cc.vec_id = emb.vec_id
           JOIN icents ON icents.cell = cc.cell),
         pcents(m, j, c, h) AS (VALUES
             $pcents),
         sub_scores AS (
           SELECT enc.vec_id, pcents.m, pcents.j,
             list_reduce(list_transform(range(1, ${d + 1}), i -> r[pcents.m * $d + i] * c[i]), (x, y) -> x + y)
               - pcents.h AS s
           FROM enc CROSS JOIN pcents),
         codes AS (
           SELECT vec_id, m, j FROM (
             SELECT vec_id, m, j,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY s DESC, j ASC) AS rn
             FROM sub_scores)
           WHERE rn = 1),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 8),
         cand0 AS (
           SELECT qc.vec_id AS query_id, cc.vec_id AS corpus_id, qc.cell
           FROM query_cells qc JOIN corpus_cell cc ON qc.cell = cc.cell AND qc.vec_id <> cc.vec_id),
         tm AS (
           SELECT cand0.query_id, cand0.corpus_id,
             CAST(list_reduce(list_transform(range(1, ${d + 1}),
                 x -> q.e[pcents.m * $d + x] * pcents.c[x]), (a, b) -> a + b)
               AS DECIMAL(28,12)) AS t
           FROM cand0
           JOIN q ON q.vec_id = cand0.query_id
           JOIN codes ON codes.vec_id = cand0.corpus_id
           JOIN pcents ON pcents.m = codes.m AND pcents.j = codes.j),
         qcent AS (
           SELECT cand0.query_id, cand0.corpus_id,
             CAST(cd.d AS DECIMAL(28,12)) AS qc
           FROM cand0
           JOIN cell_dots cd ON cd.vec_id = cand0.query_id AND cd.cell = cand0.cell),
         approx AS (
           SELECT tm.query_id, tm.corpus_id,
             ${if (residual) "(sum(t) + any_value(qc))::DOUBLE" else "sum(t)::DOUBLE"} AS ad
           FROM tm
           JOIN qcent ON qcent.query_id = tm.query_id AND qcent.corpus_id = tm.corpus_id
           GROUP BY tm.query_id, tm.corpus_id),
         cand AS (
           SELECT query_id, corpus_id FROM (
             SELECT query_id, corpus_id,
               row_number() OVER (PARTITION BY query_id ORDER BY ad DESC, corpus_id ASC) AS rn
             FROM approx)
           WHERE rn <= $rerank),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, ${dim + 1}), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         scored AS (
           SELECT query_id, corpus_id,
             list_reduce(list_transform(range(1, ${dim + 1}), i -> nq.e[i]*nc.e[i]), (x, y) -> x + y)
               / (nq.nrm * nc.nrm) AS score
           FROM cand
           JOIN n nq ON nq.vec_id = query_id
           JOIN n nc ON nc.vec_id = corpus_id)
         SELECT query_id, corpus_id, score, rank FROM (
           SELECT query_id, corpus_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** DuckDB oracle for q_semantic_dedup: replicates the in-query twin
    * planting (identical CTE to q_embed_neardup_lsh_r8), assigns cells
    * from the SAME persisted centroid literals as ivfTopKSql, and marks a
    * vector removed iff a lower-id same-cell neighbor clears the cosine
    * threshold.
    */
  private def semanticDedupSql(centroids: Array[Array[Float]], threshold: Double): String = {
    val cents = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.map(_.toDouble).mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n             ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         planted AS (
           SELECT vec_id + 100000 AS vec_id, pe AS e FROM (
             SELECT vec_id,
               list_transform(range(1, 65),
                 i -> ((e[i] + ((vec_id * 64 + (i - 1)) % 7 - 3) * 0.001)::FLOAT)::DOUBLE) AS pe
             FROM base WHERE vec_id < 50)),
         v AS (SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM planted),
         cents(cell, c) AS (VALUES
             $cents),
         cell_dots AS (
           SELECT vec_id, cell,
             list_reduce(list_transform(range(1, 65), i -> e[i] * c[i]), (x, y) -> x + y) AS d
           FROM v CROSS JOIN cents),
         asg AS (
           SELECT vec_id, cell FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rn
             FROM cell_dots)
           WHERE rn = 1),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         dups AS (
           SELECT DISTINCT bb.vec_id
           FROM asg aa JOIN asg bb ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
           JOIN n na ON na.vec_id = aa.vec_id
           JOIN n nb ON nb.vec_id = bb.vec_id
           WHERE list_reduce(list_transform(range(1, 65), i -> na.e[i]*nb.e[i]), (x, y) -> x + y)
               / (na.nrm * nb.nrm) >= $threshold)
         SELECT asg.vec_id, asg.cell::BIGINT AS cell,
           (asg.vec_id NOT IN (SELECT vec_id FROM dups)) AS kept
         FROM asg ORDER BY asg.vec_id"""
  }

  /** The q_semantic_dedup oracle entry — same artifact contract as
    * ivfOracleEntry (it consumes the same persisted centroids).
    */
  private def semanticDedupOracleEntry: Map[String, String] = IvfIndex.lastSfDir match {
    case None => Map.empty
    case Some(dir) =>
      val cOpt = IvfIndex.loadIfPresent(dir, IvfK2, IvfIters).orElse {
        SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
          .map(s => prodCentroids(s, dir))
      }
      cOpt.filter(_.nonEmpty)
        .map(c => Map("q_semantic_dedup" -> semanticDedupSql(c, threshold = 0.9)))
        .getOrElse(Map.empty)
  }

  /** The q_ivfpq_topk oracle entry — present only when BOTH artifacts for
    * the last-queried dataset are obtainable (same contract as
    * ivfOracleEntry / pqOracleEntry; the driver falls back to rows-only
    * otherwise).
    */
  private def ivfPqOracleEntry: Map[String, String] =
    IvfIndex.lastSfDir.orElse(PqIndex.lastSfDir) match {
      case Some(dir) =>
        val cOpt = IvfIndex.loadIfPresent(dir, IvfK2, IvfIters)
        def valid(b: Array[Array[Array[Float]]]) = b.nonEmpty && b.forall(_.nonEmpty)
        val raw = for {
          c <- cOpt if c.nonEmpty
          b <- PqIndex.loadIfPresent(dir, PqM, PqK, PqIters) if valid(b)
        } yield Map("q_ivfpq_topk" -> ivfPqTopKSql(c, nProbe = IvfNProbe, b, rerank = 20))
        // Residual books: load the tagged artifact, else train on the spot
        // if a session is live (same contract as pqOracleEntry).
        val res = for {
          c <- cOpt if c.nonEmpty
          b <- PqIndex.loadIfPresent(dir, PqM, PqK, PqIters, PqResTag).orElse {
            SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
              .map(s => resPqBooks(s, dir))
          } if valid(b)
        } yield Map("q_ivfpq_res_topk" ->
          ivfPqTopKSql(c, nProbe = IvfNProbe, b, rerank = 20, residual = true))
        raw.getOrElse(Map.empty) ++ res.getOrElse(Map.empty)
      case None => Map.empty
    }

  /** The q_pq_topk oracle entry — same contract as ivfOracleEntry: present
    * only when the codebooks for the dataset the queries last ran against
    * are obtainable; otherwise the driver falls back to rows-only.
    */
  private def pqOracleEntry: Map[String, String] = PqIndex.lastSfDir match {
    case None => Map.empty
    case Some(dir) =>
      val bOpt = PqIndex.loadIfPresent(dir, PqM, PqK, PqIters).orElse {
        SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
          .map(s => rawPqBooks(s, dir))
      }
      bOpt.filter(b => b.nonEmpty && b.forall(_.nonEmpty))
        .map(b => Map(
          "q_pq_topk" -> pqTopKSql(b, rerank = 20),
          "q_pq_recall_curve" -> pqRecallCurveSql(b, Seq(5, 10, 20), 5, 20)))
        .getOrElse(Map.empty)
  }

  /** The q_ivf_topk oracle entry, present whenever the index artifact for
    * the dataset the queries last ran against is obtainable: loaded from
    * the persisted artifact (the normal path — Verify runs the query, which
    * trains-or-loads, before dumping oracles), else trained on the spot if
    * a session is live. Absent only when neither holds — the driver then
    * falls back to the rows-only check, same as before the artifact existed.
    */
  private def ivfOracleEntry: Map[String, String] = IvfIndex.lastSfDir match {
    // No query has run in this JVM: we don't know which dataset the oracle
    // dump targets, and guessing one would silently embed the WRONG
    // centroids (ADVICE r4). Omitting the entry keeps q_ivf_topk on the
    // driver's rows-only fallback instead.
    case None => Map.empty
    case Some(dir) =>
    // The legacy k=16 quantizer keys ONLY the before/after curve and the
    // migration-audit NMI now; the serving queries (q_ivf_topk,
    // q_silhouette, the recall_sqrtn curve) key the production k=64
    // artifact (r17 promotion).
    val c16 = IvfIndex.loadIfPresent(dir, IvfK, IvfIters).orElse {
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .map(s => centroidsOf(s, dir, IvfK))
    }.filter(_.nonEmpty)
    val c64 = IvfIndex.loadIfPresent(dir, IvfK2, IvfIters).orElse {
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .map(s => prodCentroids(s, dir))
    }.filter(_.nonEmpty)
    val legacy = c16
      .map(c => Map("q_ivf_recall_curve" -> ivfRecallCurveSql(c, Seq(1, 2, 4, 8), 5, 20)))
      .getOrElse(Map.empty)
    val prod = c64
      .map(c => Map(
        "q_ivf_topk" -> ivfTopKSql(c, nProbe = IvfNProbe),
        "q_ivf_recall_sqrtn" -> ivfRecallCurveSql(c, Seq(4, 8, 16, 32), 5, 20),
        "q_silhouette" -> silhouetteSql(c)))
      .getOrElse(Map.empty)
    val nmi = (for { a <- c16; b <- c64 }
      yield Map("q_cluster_nmi" -> clusterNmiSql(a, b))).getOrElse(Map.empty)
    legacy ++ prod ++ nmi
  }

  /** The Naive-Bayes prediction CTE shared by q_nb_confusion and
    * q_cohens_kappa (the bpeEncodeSql reuse pattern): everything through
    * `pred(doc_id, true_lang, pred_lang)`.
    */
  private val NbPredCte: String =
    raw"""WITH tok AS (
           SELECT doc_id, lang, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tf AS (SELECT doc_id, lang AS true_lang, token, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
         cnt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY 1, 2),
         ltot AS (SELECT lang, count(*) AS tot FROM tok GROUP BY 1),
         vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
         prior AS (SELECT lang, count(*) AS nd FROM documents GROUP BY 1),
         n AS (SELECT count(*) AS nn FROM documents),
         labels AS (SELECT lang, nd, tot, v, nn
                    FROM prior JOIN ltot USING (lang) CROSS JOIN vocab CROSS JOIN n),
         scored AS (
           SELECT t.doc_id, t.true_lang, l.lang AS cand,
             ln(l.nd::DOUBLE / l.nn::DOUBLE) +
             sum(CAST(t.tf::DOUBLE * ln((coalesce(c.c, 0)::DOUBLE + 1.0)
                   / (l.tot + l.v)::DOUBLE) AS DECIMAL(28,12)))::DOUBLE AS score
           FROM tf t CROSS JOIN labels l
           LEFT JOIN cnt c ON c.lang = l.lang AND c.token = t.token
           GROUP BY t.doc_id, t.true_lang, l.lang, l.nd, l.nn),
         pred AS (SELECT doc_id, true_lang, (min({'ns': -score, 'l': cand})).l AS pred_lang
                  FROM scored GROUP BY doc_id, true_lang)"""

  /** DuckDB oracle for q_silhouette, generated from the persisted IVF
    * centroids (same contract as ivfTopKSql): cosine distances via the
    * identical left-fold dots, assignment via the same dot-DESC/cell-ASC
    * argmax, the per-cell mean snapshotted at DECIMAL(28,12) before the
    * signed-portable round.
    */
  private def silhouetteSql(centroids: Array[Array[Float]]): String = {
    val cents = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.map(_.toDouble).mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n             ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         cents(cell, c) AS (VALUES
             $cents),
         cd AS (
           SELECT vec_id, cell,
             list_reduce(list_transform(range(1, 65), i -> e[i] * c[i]), (x, y) -> x + y) AS dot,
             sqrt(list_reduce(list_transform(range(1, 65), i -> e[i] * e[i]), (x, y) -> x + y)) AS vn,
             sqrt(list_reduce(list_transform(range(1, 65), i -> c[i] * c[i]), (x, y) -> x + y)) AS cn
           FROM v CROSS JOIN cents),
         d AS (SELECT vec_id, cell, dot, 1.0::DOUBLE - dot / (vn * cn) AS dist FROM cd),
         own AS (
           SELECT vec_id, cell AS own_cell FROM (
             SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell ASC) AS rn
             FROM d)
           WHERE rn = 1),
         ab AS (
           SELECT d.vec_id, max(o.own_cell) AS own_cell,
             min(CASE WHEN d.cell = o.own_cell THEN d.dist END) AS a,
             min(CASE WHEN d.cell <> o.own_cell THEN d.dist END) AS b
           FROM d JOIN own o ON d.vec_id = o.vec_id GROUP BY d.vec_id),
         s AS (
           SELECT own_cell AS cell,
             CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b) END AS sil
           FROM ab)
         SELECT cell, count(*)::BIGINT AS n,
           round(sum(CAST(sil AS DECIMAL(28,12)))::DOUBLE / count(sil), 9) + 0 AS mean_sil
         FROM s GROUP BY cell ORDER BY cell"""
  }

  /** DuckDB text of the banded sign-LSH signature array (one BIGINT per
    * band, `planesPerBand` sign bits each). The hyperplane constants are
    * deterministic (VectorOps.hyperplanes, fixed seed), so they are
    * embedded as double literals; the dot product is the same left fold
    * the Spark side uses, making bucket assignment engine-identical.
    * Expects a vector column `e` of type DOUBLE[].
    */
  /** The q_cox_ph oracle: q_logrank's lifetime/risk-set CTEs feed the
    * event-time stats table, then `iters` Newton steps in θ = e^β space
    * unroll as CTE pairs (an aggregate computing the decimal-snapshotted
    * U and J sums at the current θ, then the clamped 12-dp θ update —
    * mirroring EventOps.coxPh's driver-side loop bit for bit), and the
    * read-out applies the single ln. Generated because the iteration
    * count parameterizes the chain (the bpeMergesSql precedent).
    *
    * Degenerate zero-event corpus (ADVICE r19 item 1): with `st` empty,
    * every `min(i.th)` aggregates over an empty CROSS JOIN and returns
    * NULL — which would poison θ through the whole chain while the
    * Scala side freezes θ at 1.0 (coxNewtonTheta skips the update when
    * J is NULL/non-positive). Each carried θ is therefore
    * `coalesce(min(i.th), 1.0)`: a no-op on any non-degenerate corpus
    * (the aggregate always sees ≥ 1 row), and exactly the frozen
    * θ = 1.0 / hazard_ratio = 1.0 / beta = 0.0 / NULL se,z read-out the
    * Scala side emits when there are no uncensored events.
    */
  private def coxPhSql(iters: Int, stratified: Boolean = false): String = {
    def uj(prev: String, tag: String) =
      s"""j$tag AS (SELECT coalesce(min(i.th), 1.0) AS th,
           sum(CAST(s.d1 - s.d * s.n1 * i.th / (s.n0 + s.n1 * i.th)
             AS DECIMAL(28,12)))::DOUBLE AS uu,
           sum(CAST(s.d * s.n0 * s.n1 /
             ((s.n0 + s.n1 * i.th) * (s.n0 + s.n1 * i.th))
             AS DECIMAL(28,12)))::DOUBLE AS jj
         FROM $prev i CROSS JOIN st s),
         i$tag AS (SELECT round(greatest(th +
             (CASE WHEN jj > 0 THEN uu / jj ELSE 0.0 END),
             0.000000000001), 12) + 0 AS th FROM j$tag)"""
    val chain = (1 to iters)
      .map(k => uj(if (k == 1) "i0" else s"i${k - 1}", k.toString))
      .mkString(",\n         ")
    val lf =
      if (stratified)
        """lf AS (SELECT c.c_mktsegment AS strat, (l - f) // 30 AS life,
           CASE WHEN l < gmax - 180 THEN 1 ELSE 0 END AS churn,
           (('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS a
         FROM u JOIN customer c ON u.o_custkey = c.c_custkey, g)"""
      else
        """lf AS (SELECT (l - f) // 30 AS life,
           CASE WHEN l < gmax - 180 THEN 1 ELSE 0 END AS churn,
           (('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS a
         FROM u, g)"""
    val plKey = if (stratified) "strat, life" else "life"
    val riskPart = if (stratified) "PARTITION BY strat " else ""
    val riskSel = if (stratified) "strat, life" else "life"
    val stratTot =
      if (stratified) ",\n           count(DISTINCT strat)::BIGINT AS n_strata" else ""
    val stratOut = if (stratified) ", tot.n_strata" else ""
    s"""WITH u AS (SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS f,
           CAST(max(o_orderdate) AS DATE) AS l
         FROM orders GROUP BY o_custkey),
       g AS (SELECT max(l) AS gmax FROM u),
       $lf,
       pl AS (SELECT $plKey,
           sum(CASE WHEN churn = 1 AND a THEN 1 ELSE 0 END)::BIGINT AS d1,
           sum(churn)::BIGINT AS d,
           sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS t1,
           count(*)::BIGINT AS t
         FROM lf GROUP BY $plKey),
       risk AS (SELECT $riskSel, d1, d,
           sum(t1) OVER (${riskPart}ORDER BY life DESC) AS n1,
           sum(t) OVER (${riskPart}ORDER BY life DESC) AS n
         FROM pl),
       st AS (SELECT d1::DOUBLE AS d1, d::DOUBLE AS d, n1::DOUBLE AS n1,
           (n - n1)::DOUBLE AS n0, d AS dl
         FROM risk WHERE d > 0),
       i0 AS (SELECT 1.0::DOUBLE AS th),
       $chain,
       jf AS (SELECT coalesce(min(i.th), 1.0) AS th,
           coalesce(sum(s.dl), 0)::BIGINT AS n_events,
           sum(CAST(s.d * s.n0 * s.n1 /
             ((s.n0 + s.n1 * i.th) * (s.n0 + s.n1 * i.th))
             AS DECIMAL(28,12)))::DOUBLE AS jj
         FROM i$iters i CROSS JOIN st s),
       tot AS (SELECT
           sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
           sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS n_b$stratTot
         FROM lf)
       SELECT tot.n_a, tot.n_b$stratOut, jf.n_events,
         round(jf.th, 6) + 0 AS hazard_ratio,
         round(ln(jf.th), 6) + 0 AS beta,
         CASE WHEN jf.th * jf.jj > 0
              THEN round(1.0 / sqrt(jf.th * jf.jj), 6) + 0 END AS se_beta,
         CASE WHEN jf.th * jf.jj > 0
              THEN round(ln(jf.th) * sqrt(jf.th * jf.jj), 6) + 0 END AS z_stat
       FROM tot CROSS JOIN jf"""
  }

  /** The q_logreg oracle: C87's hashed-feature CTE (+ the intercept
    * pseudo-feature) feeds `iters` unrolled diagonal-Newton rounds —
    * each a (z, p, g/h, w) CTE quadruple mirroring
    * Classify.logisticRegression's driver-side loop bit for bit: z sums
    * CAST(tf·w AS DECIMAL(28,12)) (exact, order-free), p is the one
    * 7-dp-rounded sigmoid, g/h decimal-snapshot per bucket, w re-rounds
    * at 9 dp (+0 canon). Read-out: the final weight catalog with the
    * exact-z Mann-Whitney AUC (the q_auc rank CTE, one logical group)
    * and z>0 accuracy repeated. Weight rounds at 9 dp (12 dp sits at
    * mantissa digit ~13 for O(0.1) weights, where Spark's string-based
    * and DuckDB's binary rounding measurably disagree). Generated
    * because the iteration count parameterizes the chain (the
    * coxPhSql precedent).
    */
  private def logregSql(nBuckets: Int, iters: Int, lambda: String): String = {
    // Every w$k is referenced twice (by z${k+1} and w${k+1}) — without
    // forced materialization DuckDB may inline the reference and the
    // plan tree doubles per round (2^iters blow-up; measured: the
    // 8-round chain ran minutes instead of milliseconds).
    val rounds = (1 to iters).map { k =>
      val prev = s"w${k - 1}"
      raw"""z$k AS (SELECT f.doc_id, sum(CAST(f.x * w.w AS DECIMAL(28,12)))::DOUBLE AS z
           FROM feat f JOIN $prev w USING (b) GROUP BY f.doc_id),
         p$k AS (SELECT d.doc_id, d.y, round(1.0/(1.0 + exp(-z.z)), 7) + 0 AS p
           FROM docs d JOIN z$k z USING (doc_id)),
         g$k AS (SELECT f.b,
             sum(CAST(f.x * (p.y - p.p) AS DECIMAL(28,12)))::DOUBLE AS g
           FROM feat f JOIN p$k p USING (doc_id) GROUP BY f.b),
         w$k AS MATERIALIZED (SELECT w.b, round(w.w + (g.g - $lambda * w.w)/(h.hh + $lambda), 9) + 0 AS w
           FROM $prev w JOIN g$k g USING (b) JOIN hb h USING (b))"""
    }.mkString(",\n         ")
    raw"""WITH docs AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
         tok AS (SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
           FROM documents),
         cnts AS (
           SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT % $nBuckets AS b,
             count(*)::BIGINT AS cnt
           FROM tok GROUP BY 1, 2),
         dl AS (SELECT doc_id, sum(cnt) AS len FROM cnts GROUP BY 1),
         feat AS MATERIALIZED (
           SELECT c.doc_id, c.b, c.cnt::DOUBLE / d.len::DOUBLE AS x
           FROM cnts c JOIN dl d USING (doc_id)
           UNION ALL
           SELECT doc_id, -1 AS b, 1.0::DOUBLE AS x FROM documents),
         hb AS MATERIALIZED (SELECT b, sum(CAST(x AS DECIMAL(28,12)))::DOUBLE * 0.5 AS hh
           FROM feat GROUP BY b),
         w0 AS MATERIALIZED (SELECT DISTINCT b, 0.0::DOUBLE AS w FROM feat),
         $rounds,
         zlast AS (SELECT f.doc_id, sum(CAST(f.x * w.w AS DECIMAL(28,12)))::DOUBLE AS z
           FROM feat f JOIN w$iters w USING (b) GROUP BY f.doc_id),
         zf AS (SELECT d.doc_id, d.y, z.z FROM docs d JOIN zlast z USING (doc_id)),
         ag AS (SELECT z, count(*)::BIGINT AS cnt, sum(y)::BIGINT AS pos
           FROM zf GROUP BY z),
         ac AS (SELECT z, cnt, pos,
             coalesce(sum(cnt) OVER (ORDER BY z
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
           FROM ag),
         ev AS (SELECT sum(pos * (cumb * 2 + cnt + 1)) AS r2,
             sum(cnt)::BIGINT AS n, sum(pos)::BIGINT AS n_pos
           FROM ac),
         eval AS (SELECT n, n_pos,
             CASE WHEN n_pos > 0 AND n_pos < n
               THEN (r2 - n_pos * (n_pos + 1))::DOUBLE
                 / ((n_pos * (n - n_pos))::DOUBLE * 2.0)
             END AS auc
           FROM ev),
         accr AS (SELECT
             sum(CASE WHEN (z > 0) = (y = 1) THEN 1 ELSE 0 END)::DOUBLE
               / count(*)::DOUBLE AS acc
           FROM zf)
         SELECT w.b AS bucket, w.w AS weight, e.n, e.n_pos, e.auc, a.acc
         FROM w$iters w CROSS JOIN eval e CROSS JOIN accr a
         ORDER BY bucket"""
  }

  /** The q_cox_multi oracle: coxPhSql's lifetime CTEs with the risk set
    * partitioned into the four covariate cells, then `iters` rational
    * Newton rounds in (θ₁, θ₂) unrolled as (cell-ratio, score/info,
    * update) CTE triples — the update solves the 2×2 system through the
    * explicit determinant, freezes on det ≤ 0 (NULL propagates to
    * false), clamps at the 1e-9 grid point and rounds at 9 dp, exactly
    * mirroring EventOps.coxPhMulti's driver loop. Each i$k is
    * referenced once (linear chain — no materialization needed, unlike
    * logregSql's twice-referenced weights).
    */
  private def coxPhMultiSql(iters: Int): String = {
    val s0 = "(s.n0 + s.n1*i.th1 + s.n2*i.th2 + s.n3*i.th1*i.th2)"
    def detE(p: String) = s"(${p}i11*${p}i22 - ${p}i12*${p}i12)"
    def roundRow(k: Int) = {
      val det = detE("")
      s"""i$k AS (SELECT
           round(greatest(th1 * (1 + (CASE WHEN $det > 0
               THEN (i22*u1 - i12*u2)/$det ELSE 0.0 END)), 0.000000001), 9) + 0 AS th1,
           round(greatest(th2 * (1 + (CASE WHEN $det > 0
               THEN (i11*u2 - i12*u1)/$det ELSE 0.0 END)), 0.000000001), 9) + 0 AS th2
         FROM j$k)"""
    }
    def statRow(k: Int, prev: String) =
      s"""s$k AS (SELECT s.d, s.d1, s.d2, s.dl, i.th1, i.th2,
           (s.n1*i.th1 + s.n3*i.th1*i.th2) / $s0 AS r1,
           (s.n2*i.th2 + s.n3*i.th1*i.th2) / $s0 AS r2,
           (s.n3*i.th1*i.th2) / $s0 AS r12
         FROM $prev i CROSS JOIN st s)"""
    def sumRow(k: Int) =
      s"""j$k AS (SELECT coalesce(min(th1), 1.0) AS th1,
           coalesce(min(th2), 1.0) AS th2,
           sum(CAST(d1 - d * r1 AS DECIMAL(28,12)))::DOUBLE AS u1,
           sum(CAST(d2 - d * r2 AS DECIMAL(28,12)))::DOUBLE AS u2,
           sum(CAST(d * (r1 - r1 * r1) AS DECIMAL(28,12)))::DOUBLE AS i11,
           sum(CAST(d * (r2 - r2 * r2) AS DECIMAL(28,12)))::DOUBLE AS i22,
           sum(CAST(d * (r12 - r1 * r2) AS DECIMAL(28,12)))::DOUBLE AS i12
         FROM s$k)"""
    val chain = (1 to iters).map { k =>
      Seq(statRow(k, if (k == 1) "i0" else s"i${k - 1}"), sumRow(k),
        roundRow(k)).mkString(",\n       ")
    }.mkString(",\n       ")
    val detF = "(jf.i11*jf.i22 - jf.i12*jf.i12)"
    s"""WITH u AS (SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS f,
           CAST(max(o_orderdate) AS DATE) AS l
         FROM orders GROUP BY o_custkey),
       g AS (SELECT max(l) AS gmax FROM u),
       lf AS (SELECT (l - f) // 30 AS life,
           CASE WHEN l < gmax - 180 THEN 1 ELSE 0 END AS churn,
           (('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS a,
           (c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')) AS b2
         FROM u JOIN customer c ON u.o_custkey = c.c_custkey, g),
       pl AS (SELECT life,
           sum(CASE WHEN NOT a AND NOT b2 THEN 1 ELSE 0 END)::BIGINT AS t0,
           sum(CASE WHEN NOT a AND NOT b2 AND churn = 1 THEN 1 ELSE 0 END)::BIGINT AS e0,
           sum(CASE WHEN a AND NOT b2 THEN 1 ELSE 0 END)::BIGINT AS t1,
           sum(CASE WHEN a AND NOT b2 AND churn = 1 THEN 1 ELSE 0 END)::BIGINT AS e1,
           sum(CASE WHEN NOT a AND b2 THEN 1 ELSE 0 END)::BIGINT AS t2,
           sum(CASE WHEN NOT a AND b2 AND churn = 1 THEN 1 ELSE 0 END)::BIGINT AS e2,
           sum(CASE WHEN a AND b2 THEN 1 ELSE 0 END)::BIGINT AS t3,
           sum(CASE WHEN a AND b2 AND churn = 1 THEN 1 ELSE 0 END)::BIGINT AS e3
         FROM lf GROUP BY life),
       risk AS (SELECT life, e0, e1, e2, e3,
           sum(t0) OVER w AS n0, sum(t1) OVER w AS n1,
           sum(t2) OVER w AS n2, sum(t3) OVER w AS n3
         FROM pl WINDOW w AS (ORDER BY life DESC)),
       st AS (SELECT (e0+e1+e2+e3)::DOUBLE AS d,
           (e1+e3)::DOUBLE AS d1, (e2+e3)::DOUBLE AS d2,
           n0::DOUBLE AS n0, n1::DOUBLE AS n1,
           n2::DOUBLE AS n2, n3::DOUBLE AS n3,
           (e0+e1+e2+e3) AS dl
         FROM risk WHERE e0+e1+e2+e3 > 0),
       i0 AS (SELECT 1.0::DOUBLE AS th1, 1.0::DOUBLE AS th2),
       $chain,
       ${statRow(iters + 1, s"i$iters")},
       jf AS (SELECT coalesce(min(th1), 1.0) AS th1,
           coalesce(min(th2), 1.0) AS th2,
           coalesce(sum(dl), 0)::BIGINT AS n_events,
           sum(CAST(d * (r1 - r1 * r1) AS DECIMAL(28,12)))::DOUBLE AS i11,
           sum(CAST(d * (r2 - r2 * r2) AS DECIMAL(28,12)))::DOUBLE AS i22,
           sum(CAST(d * (r12 - r1 * r2) AS DECIMAL(28,12)))::DOUBLE AS i12
         FROM s${iters + 1}),
       tot AS (SELECT
           sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
           sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS n_b,
           sum(CASE WHEN b2 THEN 1 ELSE 0 END)::BIGINT AS n_x2
         FROM lf)
       SELECT tot.n_a, tot.n_b, tot.n_x2, jf.n_events,
         round(jf.th1, 6) + 0 AS hazard_ratio_1,
         round(ln(jf.th1), 6) + 0 AS beta_1,
         CASE WHEN $detF > 0
              THEN round(sqrt(jf.i22 / $detF), 6) + 0 END AS se_1,
         CASE WHEN $detF > 0
              THEN round(ln(jf.th1) / sqrt(jf.i22 / $detF), 6) + 0 END AS z_1,
         round(jf.th2, 6) + 0 AS hazard_ratio_2,
         round(ln(jf.th2), 6) + 0 AS beta_2,
         CASE WHEN $detF > 0
              THEN round(sqrt(jf.i11 / $detF), 6) + 0 END AS se_2,
         CASE WHEN $detF > 0
              THEN round(ln(jf.th2) / sqrt(jf.i11 / $detF), 6) + 0 END AS z_2
       FROM tot CROSS JOIN jf"""
  }

  /** The q_platt oracle: the q_isotonic score-catalog CTEs feed `iters`
    * unrolled per-source 2×2 Newton rounds — each a (sigmoid,
    * gradient/information, update) CTE triple mirroring
    * Profiling.plattScaling's driver loop bit for bit (7-dp sigmoid,
    * 12-dp decimal snapshots, determinant-guarded solve, 6-dp parameter
    * rounds — plattScaling.round6's C317-lesson choice; ADVICE r20).
    * Linear chain (each i$k referenced once; the final
    * fitted frame carries a/b forward so i$iters is not re-referenced).
    */
  private def plattSql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "i0" else s"i${k - 1}"
      raw"""p$k AS (SELECT c.source, c.s, c.w, c.p, i.a, i.b,
           round(1.0/(1.0 + exp(-(i.a * c.s + i.b))), 7) + 0 AS pp
         FROM cat c JOIN $prev i USING (source)),
       g$k AS (SELECT source, min(a) AS a, min(b) AS b,
           sum(CAST((p - w * pp) * s AS DECIMAL(28,12)))::DOUBLE AS ga,
           sum(CAST(p - w * pp AS DECIMAL(28,12)))::DOUBLE AS gb,
           sum(CAST(w * (pp * (1.0 - pp)) * s * s AS DECIMAL(28,12)))::DOUBLE AS haa,
           sum(CAST(w * (pp * (1.0 - pp)) * s AS DECIMAL(28,12)))::DOUBLE AS hab,
           sum(CAST(w * (pp * (1.0 - pp)) AS DECIMAL(28,12)))::DOUBLE AS hbb
         FROM p$k GROUP BY source),
       i$k AS (SELECT source,
           round(a + (CASE WHEN (haa + 0.1) * (hbb + 0.1) - hab * hab > 0
               THEN ((hbb + 0.1) * (ga - 0.1 * a) - hab * (gb - 0.1 * b))
                 / ((haa + 0.1) * (hbb + 0.1) - hab * hab)
               ELSE 0.0 END), 6) + 0 AS a,
           round(b + (CASE WHEN (haa + 0.1) * (hbb + 0.1) - hab * hab > 0
               THEN ((haa + 0.1) * (gb - 0.1 * b) - hab * (ga - 0.1 * a))
                 / ((haa + 0.1) * (hbb + 0.1) - hab * hab)
               ELSE 0.0 END), 6) + 0 AS b
         FROM g$k)"""
    }.mkString(",\n         ")
    raw"""WITH t AS (SELECT source, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         sc AS (SELECT source,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE
               / len(toks)::DOUBLE AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM t WHERE len(toks) > 0),
         cat AS (SELECT source, s, count(*)::BIGINT AS w, sum(y)::BIGINT AS p
           FROM sc GROUP BY 1, 2),
         i0 AS (SELECT DISTINCT source, 0.0::DOUBLE AS a, 0.0::DOUBLE AS b
           FROM cat),
         $rounds,
         pf AS (SELECT c.source, c.s, c.w, c.p, i.a, i.b,
             round(1.0/(1.0 + exp(-(i.a * c.s + i.b))), 7) + 0 AS pp
           FROM cat c JOIN i$iters i USING (source)),
         ab AS (SELECT source, min(a) AS a, min(b) AS b FROM pf
           GROUP BY source),
         ebb AS (SELECT source, least(floor(s * 10), 9)::BIGINT AS bin, w, p,
             s * w::DOUBLE AS pw FROM cat),
         eb1 AS (SELECT source, bin, sum(w)::BIGINT AS n, sum(p)::BIGINT AS np,
             sum(CAST(pw AS DECIMAL(28,12)))::DOUBLE AS scs,
             sum(sum(w)) OVER (PARTITION BY source) AS nn
           FROM ebb GROUP BY source, bin),
         eb AS (SELECT source, round(sum(CAST((n::DOUBLE / nn::DOUBLE) *
               abs(np::DOUBLE / n::DOUBLE - (round(scs / n::DOUBLE, 9) + 0))
               AS DECIMAL(28,12)))::DOUBLE, 9) + 0 AS ece_before
           FROM eb1 GROUP BY source),
         eab AS (SELECT source, least(floor(pp * 10), 9)::BIGINT AS bin, w, p,
             pp * w::DOUBLE AS pw FROM pf),
         ea1 AS (SELECT source, bin, sum(w)::BIGINT AS n, sum(p)::BIGINT AS np,
             sum(CAST(pw AS DECIMAL(28,12)))::DOUBLE AS scs,
             sum(sum(w)) OVER (PARTITION BY source) AS nn
           FROM eab GROUP BY source, bin),
         ea AS (SELECT source, round(sum(CAST((n::DOUBLE / nn::DOUBLE) *
               abs(np::DOUBLE / n::DOUBLE - (round(scs / n::DOUBLE, 9) + 0))
               AS DECIMAL(28,12)))::DOUBLE, 9) + 0 AS ece_after
           FROM ea1 GROUP BY source),
         summ AS (SELECT source, sum(w)::BIGINT AS n,
             count(*)::BIGINT AS n_values, sum(p)::BIGINT AS n_pos
           FROM cat GROUP BY source)
         SELECT summ.source, ab.a, ab.b, summ.n, summ.n_values, summ.n_pos,
           eb.ece_before, ea.ece_after
         FROM summ JOIN ab USING (source) JOIN eb USING (source)
           JOIN ea USING (source)
         ORDER BY source"""
  }

  private def lshBandSigSql(bands: Int, planesPerBand: Int, dim: Int): String = {
    val planes = VectorOps.hyperplanes(bands * planesPerBand, dim)
    (0 until bands).map { bnd =>
      (0 until planesPerBand).map { p =>
        // float-rounded, matching bandedSignatures' array<float> plane
        // literals: both engines multiply the same doubles
        val planeLit = planes(bnd * planesPerBand + p)
          .map(_.toFloat.toDouble).mkString("[", ", ", "]")
        s"(CASE WHEN list_reduce(list_transform(range(1, ${dim + 1}), i -> e[i] * ($planeLit)[i]), (x, y) -> x + y) > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
    }.mkString("[", ",\n            ", "]")
  }

  /** DuckDB oracles: same tables, same column names, same semantics.
    * Tokenization, decimal-exact sums, null-on-zero division, and rounding
    * are kept in lockstep with the Spark expressions (see graft.ops.Portable).
    * The q_ivf_topk oracle is generated from the persisted IVF index
    * artifact (ivfOracleEntry), so it joins the map only once that
    * artifact is obtainable.
    */
  def oracleSql: Map[String, String] =
    staticOracles ++ ivfOracleEntry ++ pqOracleEntry ++ ivfPqOracleEntry ++
      semanticDedupOracleEntry ++ bpeOracleEntry

  private[graft] def staticOracles: Map[String, String] = Map(
    "q_bpe_merges" -> bpeMergesSql(BpeN),

    "q_scan" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_returnflag
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",

    "q_project" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey",

    "q_filter_null" ->
      """SELECT o_orderkey, o_custkey
         FROM orders o LEFT JOIN (
           SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
         ) c ON o.o_custkey = c.c_custkey
         WHERE c.c_name IS NULL ORDER BY o_orderkey""",

    "q_hash_sample" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 10000 < 1000
         ORDER BY o_orderkey""",

    "q_hash_sample_by" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 10000 <
           CASE o_orderstatus WHEN 'O' THEN 500 WHEN 'F' THEN 2000 WHEN 'P' THEN 5000 ELSE 0 END
         ORDER BY o_orderkey""",

    "q_join_star" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
           sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-07-01'
           AND l_shipdate > TIMESTAMP '1997-07-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    // Two-level decimal sums make the scalar threshold exact on both
    // engines; the comparison itself is then plain IEEE double math.
    "q_scalar_subquery" ->
      """WITH rev AS (
           SELECT l_partkey,
             sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE AS part_value
           FROM lineitem GROUP BY l_partkey),
         tot AS (SELECT sum(CAST(part_value AS DECIMAL(28,6)))::DOUBLE AS total,
                        count(*) AS n_parts FROM rev)
         SELECT l_partkey, part_value FROM rev, tot
         WHERE part_value > total / n_parts
         ORDER BY l_partkey""",

    "q_exists_join" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_not_exists" ->
      """WITH avg_bal AS (
           SELECT sum(CAST(c_acctbal AS DECIMAL(28,4)))::DOUBLE / count(c_acctbal) AS avg_bal
           FROM customer WHERE c_acctbal > 0.0)
         SELECT c_nationkey, count(*) AS numcust,
           sum(CAST(c_acctbal AS DECIMAL(28,4)))::DOUBLE AS totacctbal
         FROM customer, avg_bal
         WHERE c_acctbal > avg_bal
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY c_nationkey ORDER BY c_nationkey""",

    "q_cust_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_custkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    "q_group_having" ->
      """SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM part JOIN lineitem ON p_partkey = l_partkey
         WHERE p_type <> 'PROMO'
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         GROUP BY p_brand
         HAVING count(DISTINCT l_suppkey) >= 2
         ORDER BY supplier_cnt DESC, p_brand""",

    // The per-part min price is one IEEE division on both sides; the
    // equality join back keeps every tied supplier (Q2 semantics).
    "q_min_cost_supplier" ->
      """WITH offers AS (
           SELECT DISTINCT l_partkey, l_suppkey,
             l_extendedprice / l_quantity AS unit_price
           FROM lineitem),
         mn AS (SELECT l_partkey, min(unit_price) AS min_price
                FROM offers GROUP BY l_partkey)
         SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey,
           min_price AS unit_price
         FROM offers
         JOIN mn ON offers.l_partkey = mn.l_partkey
                AND offers.unit_price = mn.min_price
         JOIN part ON offers.l_partkey = p_partkey AND p_type = 'LARGE'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
         LIMIT 100""",

    "q_forecast_revenue" ->
      """SELECT sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))::DOUBLE AS revenue,
           count(*) AS n_lines
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24.0""",

    "q_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
           sum(CAST(l_extendedprice * (1.0 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS DECIMAL(28,6)))::DOUBLE
             AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name, year(o_orderdate)
         ORDER BY nation, o_year DESC""",

    "q_returned_topk" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
           sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE
             AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-07-01'
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q_shipmode_priority" ->
      """SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END)::BIGINT AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
         GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q_promo_share" ->
      """WITH s AS (
           SELECT
             sum(CAST(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
                 AS DECIMAL(28,6)))::DOUBLE AS promo,
             sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE
               AS total
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-03-01'
             AND l_shipdate < TIMESTAMP '1997-04-01')
         SELECT round(100.0 * promo / total, 9) + 0 AS promo_share_pct,
           round(promo, 4) + 0 AS promo_revenue,
           round(total, 4) + 0 AS total_revenue
         FROM s""",

    // Brute-force definition of the lev<=1 join — the blocked Spark plan
    // must reproduce it exactly (losslessness proof by hash).
    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           levenshtein(a.c_name, b.c_name)::BIGINT AS dist
         FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         WHERE a.c_custkey < 500 AND b.c_custkey < 500
           AND levenshtein(a.c_name, b.c_name) <= 1
         ORDER BY id_a, id_b""",

    "q_record_linkage" ->
      """WITH dirty AS (
           SELECT c_custkey + 1000000 AS id,
             substr(c_name, 1, (10 + c_custkey % 9) - 1)
               || substr(c_name, (10 + c_custkey % 9) + 1, length(c_name)) AS name
           FROM customer WHERE c_custkey % 7 = 3),
         cand AS (
           SELECT d.id AS dirty_id, d.name AS dirty_name,
             c.c_custkey AS clean_id, c.c_name AS clean_name,
             levenshtein(d.name, c.c_name)::BIGINT AS dist
           FROM dirty d JOIN customer c ON levenshtein(d.name, c.c_name) <= 1)
         SELECT dirty_id, dirty_name, clean_id, clean_name, dist FROM (
           SELECT *, row_number() OVER (PARTITION BY dirty_id
             ORDER BY dist ASC, clean_id ASC) AS rn
           FROM cand)
         WHERE rn = 1 ORDER BY dirty_id""",

    "q_window_dedup" ->
      """SELECT event_id, user_id, event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start, value
         FROM (
           SELECT event_id, user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn
           FROM events)
         WHERE rn = 1 ORDER BY event_id""",

    "q_quality_check" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
         WHERE o_orderstatus <> 'O' ORDER BY o_orderstatus, o_orderpriority""",

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",

    "q_union" ->
      """SELECT name, src FROM (
           SELECT c_name AS name, 'customer' AS src FROM customer
           UNION ALL
           SELECT s_name AS name, 'supplier' AS src FROM supplier
         ) ORDER BY name, src""",

    "q_except" ->
      """SELECT n_nationkey FROM nation
         EXCEPT SELECT s_nationkey AS n_nationkey FROM supplier
         ORDER BY n_nationkey""",

    "q_intersect" ->
      """SELECT c_nationkey FROM customer
         INTERSECT SELECT s_nationkey AS c_nationkey FROM supplier
         ORDER BY c_nationkey""",

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           sum(CAST(l_quantity AS DECIMAL(28,4)))::DOUBLE AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q_grouping_sets" ->
      """SELECT GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
           l_returnflag, l_linestatus, count(*) AS cnt,
           sum(CAST(l_quantity AS DECIMAL(28,4)))::DOUBLE AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q_incr_agg" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
           sum(CAST(value AS DECIMAL(28,4)))::DOUBLE AS total,
           round(sum(CAST(value AS DECIMAL(28,4)))::DOUBLE / count(*)::DOUBLE, 9) + 0 AS avg_value
         FROM events GROUP BY 1, 2
         ORDER BY event_type, day""",

    "q_window_nav" ->
      """SELECT event_id, user_id, value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER wg AS first_value,
           nth_value(value, 2) OVER wg AS second_value,
           last_value(value) OVER wf AS last_value
         FROM events
         WINDOW
           w AS (PARTITION BY user_id ORDER BY event_id),
           wg AS (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY event_id""",

    "q_join_left" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",

    "q_join_inner2" ->
      """SELECT a.l_orderkey, a.l_linenumber, a.l_partkey, a.l_suppkey, a.l_extendedprice, b.l_quantity
         FROM lineitem a
         JOIN (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 30) b
           ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
         ORDER BY a.l_orderkey, a.l_linenumber, a.l_partkey, a.l_suppkey, b.l_quantity""",

    "q_join_salted" ->
      """SELECT l.l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, o_totalprice
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         ORDER BY l.l_orderkey, l_linenumber, l_partkey, l_suppkey""",

    "q_join_q5" ->
      """SELECT n_name,
           sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY n_name""",

    // The bucketed co-located join must equal the PLAIN join — the oracle
    // is the plain join+agg, so bucketing is hash-checked as a pure
    // physical-layout optimization (the q_join_salted equivalence trick).
    "q_join_bucketed" ->
      """SELECT l_orderkey, count(*) AS n_items,
           sum(CAST(l_quantity AS DECIMAL(28,4)))::DOUBLE AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(28,4)))::DOUBLE AS sum_price,
           max(o_totalprice) AS o_totalprice
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY l_orderkey ORDER BY l_orderkey""",

    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
         ORDER BY o_orderkey""",

    "q_join_anti" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE NOT EXISTS (
           SELECT 1 FROM lineitem l WHERE l.l_quantity > 45 AND l.l_orderkey = o.o_orderkey)
         ORDER BY o_orderkey""",

    "q_upsert" ->
      """SELECT o_orderkey, o_totalprice, version FROM (
           SELECT o_orderkey, o_totalprice, version,
             row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
           FROM (
             SELECT o_orderkey, o_totalprice, 1::BIGINT AS version FROM orders
             UNION ALL
             SELECT o_orderkey, o_totalprice * 2.0, 2::BIGINT FROM orders WHERE o_orderkey % 10 = 0))
         WHERE rn = 1 ORDER BY o_orderkey""",

    "q_snapshot_diff" ->
      """WITH old AS (SELECT o_orderkey, o_totalprice FROM orders),
         new AS (
           SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.5 ELSE o_totalprice END AS o_totalprice
           FROM old WHERE o_orderkey % 7 <> 0
           UNION ALL
           SELECT o_orderkey + 1000000, o_totalprice FROM old WHERE o_orderkey < 100)
         SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.o_totalprice AS old_o_totalprice,
           n.o_totalprice AS new_o_totalprice
         FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
         WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
                ELSE 'unchanged' END <> 'unchanged'
         ORDER BY o_orderkey""",

    "q_zscore" ->
      """SELECT event_id, user_id, value,
           CASE WHEN cnt > 1 AND std > 0 THEN round((value - s1/cnt) / std, 6) + 0 END AS zscore
         FROM (
           SELECT event_id, user_id, value,
             count(value) OVER w::DOUBLE AS cnt,
             sum(CAST(value AS DECIMAL(28,6))) OVER w::DOUBLE AS s1,
             sqrt(greatest(
               (sum(CAST(value*value AS DECIMAL(28,6))) OVER w::DOUBLE
                 - (sum(CAST(value AS DECIMAL(28,6))) OVER w::DOUBLE)
                   * (sum(CAST(value AS DECIMAL(28,6))) OVER w::DOUBLE)
                   / count(value) OVER w::DOUBLE)
               / (count(value) OVER w::DOUBLE - 1.0), 0.0)) AS std
           FROM events
           WINDOW w AS (PARTITION BY user_id))
         ORDER BY event_id""",

    "q_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(28,4)))::DOUBLE AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(28,4)))::DOUBLE AS sum_base_price,
           sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE AS sum_disc_price,
           sum(CAST(l_quantity AS DECIMAL(28,4)))::DOUBLE / count(*) AS avg_qty,
           sum(CAST(l_extendedprice AS DECIMAL(28,4)))::DOUBLE / count(*) AS avg_price,
           count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS cnt_part, count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // The sketch estimate itself is engine-private; the oracle checks the
    // exact count and asserts the engine's |approx−exact|/exact ≤ 0.15
    // flag came out TRUE (Spark HLL++ is deterministic for fixed data).
    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_part,
           true AS within_bounds
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Same pattern for the percentile sketch: group size exact, rank-error
    // flags asserted TRUE (approx inside the exact p ± 0.01 band).
    "q_approx_percentile" ->
      """SELECT event_type, count(value) AS n,
           true AS p50_within, true AS p95_within
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_profile" ->
      """SELECT col_name, n_rows, n_nulls, n_distinct FROM (
           SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
             count(*) - count(o_orderkey) AS n_nulls, count(DISTINCT o_orderkey) AS n_distinct FROM orders
           UNION ALL SELECT 'o_custkey', count(*), count(*) - count(o_custkey), count(DISTINCT o_custkey) FROM orders
           UNION ALL SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus) FROM orders
           UNION ALL SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice), count(DISTINCT o_totalprice) FROM orders
           UNION ALL SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority) FROM orders)
         ORDER BY col_name""",

    "q_skew_profile" ->
      """SELECT l_orderkey, cnt, round(cnt::DOUBLE / total::DOUBLE, 9) + 0 AS share
         FROM (
           SELECT l_orderkey, count(*) AS cnt, sum(count(*)) OVER () AS total
           FROM lineitem GROUP BY l_orderkey)
         ORDER BY cnt DESC, l_orderkey ASC LIMIT 20""",

    "q_conditional_agg" ->
      """SELECT l_returnflag,
           count(*) FILTER (l_quantity > 25) AS n_bulk,
           sum(CAST(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END AS DECIMAL(28,4)))::DOUBLE AS disc_rev,
           count(*) FILTER (l_tax = 0) AS n_taxfree
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_histogram" ->
      """SELECT (floor(l_extendedprice / 5000) * 5000)::BIGINT AS bin, count(*) AS cnt
         FROM lineitem GROUP BY bin ORDER BY bin""",

    "q_rank_dist" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           round(percent_rank() OVER w, 9) + 0 AS pct_rank,
           round(cume_dist() OVER w, 9) + 0 AS cume
         FROM lineitem WHERE l_orderkey < 1000
         WINDOW w AS (PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber, l_partkey, l_suppkey)
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           sum(CAST(l_quantity AS DECIMAL(28,4)))::DOUBLE AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q_pivot" ->
      """SELECT user_id,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'error') AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup') AS signup,
           count(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q_percentile" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_corr" ->
      """SELECT l_returnflag,
           round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) + 0 AS corr_qty_price,
           cnt
         FROM (
           SELECT l_returnflag,
             count(*) AS cnt,
             count(l_quantity)::DOUBLE AS n,
             sum(CAST(l_quantity AS DECIMAL(28,6)))::DOUBLE AS sx,
             sum(CAST(l_extendedprice AS DECIMAL(28,6)))::DOUBLE AS sy,
             sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))::DOUBLE AS sxx,
             sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6)))::DOUBLE AS syy,
             sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6)))::DOUBLE AS sxy
           FROM lineitem GROUP BY l_returnflag)
         ORDER BY l_returnflag""",

    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 100""",

    "q_topk_pergroup" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, rn FROM (
           SELECT l_returnflag, l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn
           FROM lineitem)
         WHERE rn <= 5 ORDER BY l_returnflag, rn""",

    "q_row_number" ->
      """SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders ORDER BY o_custkey, rn""",

    "q_hash" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey)) AS row_hash,
           ('0x' || substr(md5(md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey))), 1, 8))::BIGINT AS hash32
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",

    "q_ts_derive" ->
      """SELECT event_id,
           strftime(strptime(strftime(ts, '%Y-%m-%d') || strftime(ts, '%H:%M'),
             '%Y-%m-%d%H:%M'), '%Y-%m-%d %H:%M:%S') AS trading_ts
         FROM events ORDER BY event_id""",

    "q_date_parse" ->
      """SELECT o_orderkey,
           strftime(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d'), '%Y-%m-%d') AS parsed_date
         FROM orders ORDER BY o_orderkey""",

    "q_datediff" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           date_diff('day', o_orderdate::DATE, l_shipdate::DATE) AS ship_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",

    "q_arith" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           date_diff('day', o_orderdate::DATE, l_shipdate::DATE)::DOUBLE / 30.5 AS ship_months
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",

    "q_string_funcs" ->
      """SELECT p_partkey,
           levenshtein(p_brand, p_type)::BIGINT AS lev,
           translate(p_name, 'aeiou', 'AEIOU') AS tr,
           lpad(p_brand, 12, '_') AS pad,
           substring(p_type, 2, 5) AS sub,
           upper(p_name) AS up
         FROM part ORDER BY p_partkey""",

    "q_json_extract" ->
      """SELECT event_id, regexp_extract(props, '"k": *(-?\d+)', 1)::BIGINT AS k
         FROM events ORDER BY event_id""",

    "q_lag_returns" ->
      """SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           value / nullif(lag(value) OVER w, 0.0) - 1.0 AS ret
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         ORDER BY event_id""",

    "q_ewma" ->
      """WITH ord AS (
           SELECT user_id,
             list(event_id ORDER BY event_id) AS ids,
             list(value ORDER BY event_id) AS vs
           FROM events GROUP BY user_id),
         exploded AS (
           SELECT user_id,
             unnest(ids) AS event_id,
             unnest(vs) AS value,
             unnest(list_transform(range(1, len(vs) + 1),
               i -> list_reduce(vs[1:i],
                 (acc, x) -> 0.2::DOUBLE * x + (1.0::DOUBLE - 0.2::DOUBLE) * acc))) AS ewma
           FROM ord)
         SELECT event_id, user_id, value, ewma FROM exploded ORDER BY event_id""",

    "q_frame_sample" ->
      """SELECT doc_id AS id,
           unnest(range(0, greatest(length(text) // 16, 1), 3)) AS frame_idx
         FROM documents ORDER BY id, frame_idx""",

    "q_rolling_vol" ->
      """SELECT event_id, user_id,
           CASE WHEN cnt > 1 THEN round(sqrt(greatest((s2 - s1*s1/cnt)/(cnt-1.0), 0.0)), 6) + 0 END AS roll_vol
         FROM (
           SELECT event_id, user_id,
             count(value) OVER w::DOUBLE AS cnt,
             sum(CAST(value AS DECIMAL(28,6))) OVER w::DOUBLE AS s1,
             sum(CAST(value*value AS DECIMAL(28,6))) OVER w::DOUBLE AS s2
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
         ORDER BY event_id""",

    "q_range_window" ->
      """SELECT event_id,
           sum(CAST(value AS DECIMAL(28,6))) OVER w::DOUBLE AS trail_sum,
           count(value) OVER w AS trail_cnt
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q_ntile" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag,
           ntile(4) OVER (PARTITION BY l_returnflag
             ORDER BY l_extendedprice, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS quartile
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",

    "q_ffill" ->
      """SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
         FROM events ORDER BY event_id""",

    "q_densify_ffill" ->
      """WITH snapped AS (
           SELECT user_id, CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS b,
                  arg_max(value, ts) AS value
           FROM events GROUP BY 1, 2),
         bounds AS (SELECT user_id, min(b) AS t0, max(b) AS t1 FROM snapped GROUP BY 1),
         grid AS (SELECT user_id, unnest(generate_series(t0, t1, 600)) AS b FROM bounds)
         SELECT g.user_id,
           strftime(make_timestamp(g.b*1000000), '%Y-%m-%d %H:%M:%S') AS ts_bucket,
           last_value(s.value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
         FROM grid g LEFT JOIN snapped s ON g.user_id = s.user_id AND g.b = s.b
         ORDER BY g.user_id, ts_bucket""",

    "q_resample_ohlc" ->
      """SELECT user_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           arg_min(value, event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, event_id) AS close,
           sum(regexp_extract(props, '"k": *(-?\d+)', 1)::BIGINT)::BIGINT AS volume,
           count(*) AS n_trades
         FROM events GROUP BY user_id, bucket ORDER BY user_id, bucket""",

    "q_index_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           sum(CAST(value * (user_id % 10 + 1)::DOUBLE AS DECIMAL(28,8)))::DOUBLE /
             sum(CAST((user_id % 10 + 1)::DOUBLE AS DECIMAL(28,8)))::DOUBLE AS index_value,
           count(*) AS n_assets
         FROM events GROUP BY bucket ORDER BY bucket""",

    "q_asof_join" ->
      """SELECT e.event_id, e.user_id, e.value,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
           p.value AS asof_value
         FROM events e ASOF LEFT JOIN (
           SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
         ) p ON e.user_id = p.user_id AND e.ts >= p.ts
         ORDER BY e.event_id""",

    "q_hopping_window" ->
      """SELECT user_id,
           strftime(make_timestamp((CAST(floor(epoch(ts)/300)*300 AS BIGINT) - off.o)*1000000),
             '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n_events,
           sum(CAST(value AS DECIMAL(28,4)))::DOUBLE AS sum_value
         FROM events CROSS JOIN (SELECT unnest([0, 300]) AS o) off
         GROUP BY user_id, win_start ORDER BY user_id, win_start""",

    "q_asof_tolerance" ->
      """SELECT e.event_id, e.user_id, e.value,
           CASE WHEN floor(epoch(e.ts))::BIGINT - floor(epoch(p.ts))::BIGINT <= 7200
                THEN strftime(p.ts, '%Y-%m-%d %H:%M:%S') END AS asof_ts,
           CASE WHEN floor(epoch(e.ts))::BIGINT - floor(epoch(p.ts))::BIGINT <= 7200
                THEN p.value END AS asof_value
         FROM events e ASOF LEFT JOIN (
           SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
         ) p ON e.user_id = p.user_id AND e.ts >= p.ts
         ORDER BY e.event_id""",

    "q_mad_outliers" ->
      """WITH med AS (
           SELECT user_id, quantile_cont(value, 0.5) AS med FROM events GROUP BY user_id),
         mad AS (
           SELECT e.user_id, max(m.med) AS med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
           FROM events e JOIN med m ON e.user_id = m.user_id GROUP BY e.user_id)
         SELECT event_id, e.user_id, value,
           round(mad.med, 9) + 0 AS med, round(mad.mad, 9) + 0 AS mad,
           CASE WHEN mad.mad > 0
             THEN round(((value - mad.med) / mad.mad)::DECIMAL(28,12), 6)::DOUBLE
           END AS mad_score
         FROM events e JOIN mad ON e.user_id = mad.user_id
         ORDER BY event_id""",

    "q_outliers" ->
      """WITH fences AS (
           SELECT user_id,
             quantile_cont(value, 0.25) - (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) * 1.5 AS fence_lo,
             quantile_cont(value, 0.75) + (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) * 1.5 AS fence_hi
           FROM events GROUP BY user_id)
         SELECT event_id, e.user_id, value,
           round(fence_lo, 9) + 0 AS fence_lo, round(fence_hi, 9) + 0 AS fence_hi
         FROM events e JOIN fences f ON e.user_id = f.user_id
         WHERE value < fence_lo OR value > fence_hi
         ORDER BY event_id""",

    "q_event_windows" ->
      """SELECT user_id,
           strftime(make_timestamp(CAST(floor(epoch(ts)/600)*600 AS BIGINT)*1000000),
             '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n_events,
           sum(CAST(value AS DECIMAL(28,4)))::DOUBLE AS sum_value
         FROM events GROUP BY user_id, win_start ORDER BY user_id, win_start""",

    "q_sessionize" ->
      """SELECT event_id, user_id,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
         FROM (
           SELECT event_id, user_id, ts,
             CASE WHEN lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                  THEN 1 ELSE 0 END AS is_new
           FROM events)
         ORDER BY event_id""",

    "q_session_window" ->
      """WITH marked AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         numbered AS (
           SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked)
         SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 1800 SECOND, '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           sum(CAST(value AS DECIMAL(28,4)))::DOUBLE AS sum_value
         FROM numbered GROUP BY user_id, sid
         ORDER BY user_id, session_start""",

    "q_funnel" ->
      """WITH s0 AS (
           SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY user_id),
         s1 AS (
           SELECT e.user_id, min(e.ts) AS t1
           FROM events e JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'click' AND e.ts >= s0.t0 GROUP BY e.user_id),
         s2 AS (
           SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= s1.t1 GROUP BY e.user_id)
         SELECT s0.user_id,
           strftime(t0, '%Y-%m-%d %H:%M:%S') AS t_view,
           strftime(t1, '%Y-%m-%d %H:%M:%S') AS t_click,
           strftime(t2, '%Y-%m-%d %H:%M:%S') AS t_purchase,
           (1 + (t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT)::BIGINT AS reached
         FROM s0
         LEFT JOIN s1 ON s1.user_id = s0.user_id
         LEFT JOIN s2 ON s2.user_id = s0.user_id
         ORDER BY s0.user_id""",

    "q_interval_join" ->
      """WITH w AS (
           SELECT event_id AS window_id, ts AS w_start,
             ts + INTERVAL 300 SECOND AS w_end
           FROM events WHERE event_id % 500 = 0)
         SELECT w.window_id,
           strftime(w.w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
           count(e.event_id) AS n_events,
           coalesce(sum(CAST(e.value AS DECIMAL(28,4)))::DOUBLE, 0.0) AS sum_value
         FROM w LEFT JOIN events e ON e.ts >= w.w_start AND e.ts <= w.w_end
         GROUP BY w.window_id, w.w_start
         ORDER BY w.window_id""",

    "q_interpolate" ->
      """WITH g AS (
           SELECT event_id, user_id, ts, epoch_us(ts) AS t,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value
           FROM events),
         w AS (
           SELECT event_id, user_id, t, value,
             last_value(CASE WHEN value IS NOT NULL THEN struct_pack(t := t, v := value) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
             first_value(CASE WHEN value IS NOT NULL THEN struct_pack(t := t, v := value) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next
           FROM g)
         SELECT event_id, user_id,
           round(CASE
             WHEN value IS NOT NULL THEN value
             WHEN prev IS NULL AND next IS NULL THEN NULL
             WHEN prev IS NULL THEN next.v
             WHEN next IS NULL THEN prev.v
             ELSE prev.v + (next.v - prev.v) * ((t - prev.t)::DOUBLE / (next.t - prev.t)::DOUBLE)
           END, 6) + 0 AS filled_value
         FROM w
         ORDER BY event_id""",

    "q_sql_funcs" ->
      """SELECT vec_id,
           round(list_reduce(list_transform(range(1, 65), i -> e[i] * e[65 - i]), (a, b) -> a + b), 6) + 0 AS rev_dot,
           round(list_reduce(list_transform(range(1, 65), i -> e[i] * e[65 - i]), (a, b) -> a + b)
             / (sqrt(list_reduce(list_transform(range(1, 65), i -> e[i] * e[i]), (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(range(1, 65), i -> e[65 - i] * e[65 - i]), (a, b) -> a + b))), 9) + 0 AS rev_cos,
           ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT AS h_lo,
           ('0x' || substr(md5(vec_id::VARCHAR), 9, 8))::BIGINT AS h_hi,
           3 AS n_tok,
           vec_id::VARCHAR AS tok_mid
         FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
         ORDER BY vec_id""",

    "q_zorder_scan" ->
      """SELECT event_id, user_id,
           (extract(hour FROM ts) * 60 + extract(minute FROM ts))::BIGINT AS minute_of_day,
           value
         FROM events
         WHERE user_id BETWEEN 2 AND 9
           AND (extract(hour FROM ts) * 60 + extract(minute FROM ts)) BETWEEN 600 AND 780
         ORDER BY event_id""",

    "q_date_parts" ->
      """SELECT o_orderkey,
           year(o_orderdate)::BIGINT AS y,
           quarter(o_orderdate)::BIGINT AS q,
           month(o_orderdate)::BIGINT AS m,
           dayofmonth(o_orderdate)::BIGINT AS dom,
           dayofyear(o_orderdate)::BIGINT AS doy,
           (dayofweek(o_orderdate) + 1)::BIGINT AS dow,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m
         FROM orders ORDER BY o_orderkey""",

    "q_text_tokens" ->
      """SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS n_tokens,
           length(text)::BIGINT AS text_len
         FROM documents ORDER BY doc_id""",

    "q_token_counts" ->
      """SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS re_tokens
         FROM documents ORDER BY doc_id""",

    "q_wordcount" ->
      """SELECT token, count(*) AS cnt FROM (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents)
         GROUP BY token ORDER BY token""",

    // Plain GROUP BY ... HAVING definition of the 2% heavy hitters; the
    // threshold multiplies in double on both engines (n::DOUBLE here,
    // lit(0.02) * long→double in Spark) so the comparison is bit-equal.
    "q_heavy_hitters" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tot AS (SELECT count(*) AS n FROM tok)
         SELECT token, count(*) AS cnt, round(count(*) / n::DOUBLE, 9) + 0 AS frac
         FROM tok, tot
         GROUP BY token, n
         HAVING count(*) > 0.02 * n::DOUBLE
         ORDER BY token""",

    "q_quality_score" ->
      """SELECT doc_id, n_tokens,
           round(avg_tok_len, 6) + 0 AS avg_token_len,
           round(stop_ratio, 6) + 0 AS stopword_ratio,
           round(stop_ratio * 0.5 + least(avg_tok_len / 10.0, 1.0) * 0.5, 6) + 0 AS quality_score
         FROM (
           SELECT doc_id,
             len(toks)::BIGINT AS n_tokens,
             CASE WHEN len(toks) > 0
               THEN list_reduce(list_transform(toks, x -> length(x)::BIGINT), (a, b) -> a + b)::DOUBLE / len(toks)
               ELSE 0.0 END AS avg_tok_len,
             CASE WHEN len(toks) > 0
               THEN len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE / len(toks)
               ELSE 0.0 END AS stop_ratio
           FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
                 FROM documents))
         ORDER BY doc_id""",

    // Raw (unrounded) ratios drive the keep thresholds, mirroring the
    // engine exactly; every displayed double is rounded with the + 0
    // canonicalizer.
    "q_gopher_rules" ->
      """WITH t AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
             string_split(text, chr(10)) AS lines
           FROM documents),
         m AS (
           SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             list_reduce(list_transform(toks, x -> len(x)::BIGINT), (a, b) -> a + b)::DOUBLE
               / len(toks)::DOUBLE AS mean_len,
             len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
               / len(toks)::DOUBLE AS frac_alpha,
             len(list_intersect(toks,
               ['the','a','of','and','to','in','is','it']))::BIGINT AS n_stop,
             (len(text) - len(replace(text, '#', '')))::DOUBLE
               / len(toks)::DOUBLE AS hash_ratio,
             ((len(text) - len(replace(text, '...', ''))) / 3)
               / len(toks)::DOUBLE AS ell_ratio,
             len(list_filter(lines, l -> substr(l, 1, 1) IN ('•','-','*')))::DOUBLE
               / len(lines)::DOUBLE AS bullet_frac,
             len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…'))::DOUBLE
               / len(lines)::DOUBLE AS ell_line_frac,
             (len(lines) - len(list_distinct(lines)))::DOUBLE
               / len(lines)::DOUBLE AS dup_line_frac
           FROM t WHERE len(toks) > 0)
         SELECT doc_id, n_words,
           round(mean_len, 6) + 0 AS mean_word_len,
           round(frac_alpha, 6) + 0 AS frac_alpha,
           n_stop,
           round(hash_ratio, 6) + 0 AS hash_ratio,
           round(ell_ratio, 6) + 0 AS ellipsis_ratio,
           round(bullet_frac, 6) + 0 AS bullet_frac,
           round(ell_line_frac, 6) + 0 AS ellipsis_line_frac,
           round(dup_line_frac, 6) + 0 AS dup_line_frac,
           (n_words >= 50 AND n_words <= 100000
             AND mean_len >= 3.0 AND mean_len <= 10.0
             AND hash_ratio < 0.1 AND ell_ratio < 0.1
             AND bullet_frac < 0.9 AND ell_line_frac < 0.3
             AND frac_alpha >= 0.8 AND n_stop >= 2
             AND dup_line_frac <= 0.3) AS keep
         FROM m ORDER BY doc_id""",

    "q_token_budget" ->
      """WITH q AS (
           SELECT doc_id, n_tokens,
             round(stop_ratio * 0.5 + least(avg_tok_len / 10.0, 1.0) * 0.5, 6) + 0 AS quality_score
           FROM (
             SELECT doc_id,
               len(toks)::BIGINT AS n_tokens,
               CASE WHEN len(toks) > 0
                 THEN list_reduce(list_transform(toks, x -> length(x)::BIGINT), (a, b) -> a + b)::DOUBLE / len(toks)
                 ELSE 0.0 END AS avg_tok_len,
               CASE WHEN len(toks) > 0
                 THEN len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE / len(toks)
                 ELSE 0.0 END AS stop_ratio
             FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
                   FROM documents))),
         c AS (
           SELECT doc_id, n_tokens, quality_score,
             sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
           FROM q)
         SELECT doc_id, n_tokens, quality_score, cum_tokens::BIGINT AS cum_tokens,
           (CASE WHEN cum_tokens <= 15000 THEN 1 ELSE 0 END)::BIGINT AS kept
         FROM c ORDER BY doc_id""",

    "q_image_dims" ->
      """SELECT doc_id AS id,
           CASE WHEN doc_id % 3 = 0 OR doc_id % 10 = 5 THEN 'unknown'
                WHEN doc_id % 5 = 0 THEN 'jpeg'
                WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS format,
           (CASE WHEN doc_id % 3 = 0 OR doc_id % 10 = 5 THEN -1
                 ELSE doc_id % 256 + 64 END)::BIGINT AS width,
           (CASE WHEN doc_id % 3 = 0 OR doc_id % 10 = 5 THEN -1
                 ELSE doc_id % 128 + 32 END)::BIGINT AS height
         FROM documents ORDER BY id""",

    "q_pipeline_curate" ->
      """WITH toks AS (
           SELECT doc_id, source, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         q AS (
           SELECT doc_id, source, n_tokens,
             round(stop_ratio * 0.5 + least(avg_tok_len / 10.0, 1.0) * 0.5, 6) + 0 AS quality_score
           FROM (
             SELECT doc_id, source, len(t)::BIGINT AS n_tokens,
               CASE WHEN len(t) > 0
                 THEN list_reduce(list_transform(t, x -> length(x)::BIGINT), (a, b) -> a + b)::DOUBLE / len(t)
                 ELSE 0.0 END AS avg_tok_len,
               CASE WHEN len(t) > 0
                 THEN len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE / len(t)
                 ELSE 0.0 END AS stop_ratio
             FROM toks)),
         ext AS (
           SELECT source, min(quality_score) AS lo, max(quality_score) AS hi, count(*) AS n
           FROM q GROUP BY source),
         hb AS (
           SELECT q.source,
             (CASE WHEN hi = lo THEN 0
                   ELSE least(floor((quality_score - lo) / ((hi - lo) / 128)), 127) END)::BIGINT AS bin
           FROM q JOIN ext USING (source)),
         hc AS (SELECT source, bin, count(*) AS cnt FROM hb GROUP BY source, bin),
         hcc AS (
           SELECT source, bin, cnt,
             sum(cnt) OVER (PARTITION BY source ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM hc),
         pick AS (
           SELECT hcc.source, bin, cnt, cum, lo, hi, n,
             row_number() OVER (PARTITION BY hcc.source ORDER BY bin) AS rn
           FROM hcc JOIN ext USING (source)
           WHERE cum::DOUBLE >= 0.25 * n::DOUBLE),
         f AS (
           SELECT source,
             -- VARCHAR::DECIMAL replays Spark's round(): shortest decimal repr, then HALF_UP
             round((lo + bin::DOUBLE * ((hi - lo) / 128)
               + ((0.25 * n::DOUBLE - (cum - cnt)::DOUBLE) / cnt::DOUBLE) * ((hi - lo) / 128)
               )::VARCHAR::DECIMAL(38,18), 6)::DOUBLE AS fl
           FROM pick WHERE rn = 1),
         fk AS (
           SELECT doc_id, quality_score,
             (CASE WHEN quality_score >= fl THEN 1 ELSE 0 END)::BIGINT AS floor_kept
           FROM q JOIN f USING (source)),
         sh AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM toks),
         dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
         nov AS (
           SELECT doc_id,
             round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6) + 0 AS shared_frac
           FROM sh JOIN dfreq USING (shingle) GROUP BY doc_id),
         surv AS (
           SELECT q.doc_id, q.n_tokens, q.quality_score
           FROM q
           JOIN fk USING (doc_id)
           JOIN nov USING (doc_id)
           WHERE fk.floor_kept = 1 AND nov.shared_frac <= 0.5),
         b AS (
           SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM surv)
         SELECT fk.doc_id, fk.quality_score, fk.floor_kept, nov.shared_frac,
           coalesce(b.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(b.cum, 0)::BIGINT AS cum_tokens,
           coalesce(CASE WHEN b.cum <= 8000 THEN 1 ELSE 0 END, 0)::BIGINT AS kept
         FROM fk
         JOIN nov USING (doc_id)
         LEFT JOIN b USING (doc_id)
         ORDER BY doc_id""",

    "q_novelty" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM toks),
         dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
         SELECT doc_id, count(*)::BIGINT AS n_shingles,
           sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
           round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6) + 0 AS shared_frac
         FROM sh JOIN dfreq USING (shingle)
         GROUP BY doc_id ORDER BY doc_id""",

    "q_hist_quantiles" ->
      """WITH ext AS (
           SELECT event_type, min(value::DOUBLE) AS lo, max(value::DOUBLE) AS hi, count(*) AS n
           FROM events GROUP BY event_type),
         b AS (
           SELECT e.event_type,
             (CASE WHEN hi = lo THEN 0
                   ELSE least(floor((value::DOUBLE - lo) / ((hi - lo) / 128)), 127) END)::BIGINT AS bin
           FROM events e JOIN ext USING (event_type)),
         c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY event_type, bin),
         cc AS (
           SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM c),
         qq AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q),
         pick AS (
           SELECT cc.event_type, q, bin, cnt, cum, lo, hi, n,
             row_number() OVER (PARTITION BY cc.event_type, q ORDER BY bin) AS rn
           FROM cc JOIN ext USING (event_type) CROSS JOIN qq
           WHERE cum::DOUBLE >= q * n::DOUBLE)
         SELECT event_type, q,
           round((lo + bin::DOUBLE * ((hi - lo) / 128)
             + ((q * n::DOUBLE - (cum - cnt)::DOUBLE) / cnt::DOUBLE) * ((hi - lo) / 128)
             )::VARCHAR::DECIMAL(38,18), 6)::DOUBLE AS est
         FROM pick WHERE rn = 1 ORDER BY event_type, q""",

    "q_hll_distinct" ->
      """WITH h AS (
           SELECT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 64 AS idx,
             ('0x' || substr(md5(user_id::VARCHAR), 9, 8))::BIGINT AS hi
           FROM events),
         r AS (
           SELECT event_type, idx,
             max(CASE WHEN hi = 0 THEN 33 ELSE 33 - length(bin(hi)) END) AS rho
           FROM h GROUP BY event_type, idx),
         s AS (
           SELECT event_type, count(*) AS n_registers_set,
             sum(power(0.5, rho)) + (64 - count(*)) AS s
           FROM r GROUP BY event_type)
         SELECT event_type, n_registers_set::BIGINT AS n_registers_set,
           (s * 8589934592.0)::BIGINT AS s_scaled,
           round(CASE WHEN (64 - n_registers_set) > 0
                       AND 0.7213 / (1 + 1.079 / 64.0) * 4096.0 / s <= 160.0
                  THEN 64.0 * ln(64.0 / (64 - n_registers_set))
                  ELSE 0.7213 / (1 + 1.079 / 64.0) * 4096.0 / s END, 4) + 0 AS est_distinct
         FROM s ORDER BY event_type""",

    "q_tokenize_ids" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         vocab AS (
           SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) AS token_id
           FROM (SELECT token, count(*) AS cnt
                 FROM (SELECT unnest(t) AS token FROM toks)
                 GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20)),
         tok AS (
           SELECT doc_id, u.i AS pos, t[u.i] AS token
           FROM toks CROSS JOIN LATERAL unnest(range(1, len(t) + 1)) AS u(i)),
         mapped AS (
           SELECT doc_id, pos, coalesce(token_id, 0) AS tid,
             CASE WHEN token_id IS NULL THEN 1 ELSE 0 END AS oov
           FROM tok LEFT JOIN vocab USING (token))
         SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(oov)::BIGINT AS n_oov,
           round(sum(oov)::DOUBLE / count(*)::DOUBLE, 6) + 0 AS oov_rate,
           string_agg(tid::VARCHAR, ' ' ORDER BY pos) AS ids
         FROM mapped GROUP BY doc_id ORDER BY doc_id""",

    "q_quality_floor" ->
      """WITH q AS (
           SELECT doc_id, source,
             round(stop_ratio * 0.5 + least(avg_tok_len / 10.0, 1.0) * 0.5, 6) + 0 AS quality_score
           FROM (
             SELECT doc_id, source,
               CASE WHEN len(toks) > 0
                 THEN list_reduce(list_transform(toks, x -> length(x)::BIGINT), (a, b) -> a + b)::DOUBLE / len(toks)
                 ELSE 0.0 END AS avg_tok_len,
               CASE WHEN len(toks) > 0
                 THEN len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE / len(toks)
                 ELSE 0.0 END AS stop_ratio
             FROM (SELECT doc_id, source, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
                   FROM documents))),
         f AS (SELECT source, quantile_cont(quality_score, 0.25) AS fl
               FROM q GROUP BY source)
         SELECT doc_id, source, quality_score, round(fl, 9) + 0 AS domain_floor,
           (CASE WHEN quality_score >= fl THEN 1 ELSE 0 END)::BIGINT AS kept
         FROM q JOIN f USING (source) ORDER BY doc_id""",

    "q_quality_floor_sketch" ->
      """WITH q AS (
           SELECT doc_id, source,
             round(stop_ratio * 0.5 + least(avg_tok_len / 10.0, 1.0) * 0.5, 6) + 0 AS quality_score
           FROM (
             SELECT doc_id, source,
               CASE WHEN len(toks) > 0
                 THEN list_reduce(list_transform(toks, x -> length(x)::BIGINT), (a, b) -> a + b)::DOUBLE / len(toks)
                 ELSE 0.0 END AS avg_tok_len,
               CASE WHEN len(toks) > 0
                 THEN len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE / len(toks)
                 ELSE 0.0 END AS stop_ratio
             FROM (SELECT doc_id, source, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
                   FROM documents))),
         ext AS (
           SELECT source, min(quality_score) AS lo, max(quality_score) AS hi, count(*) AS n
           FROM q GROUP BY source),
         b AS (
           SELECT q.source,
             (CASE WHEN hi = lo THEN 0
                   ELSE least(floor((quality_score - lo) / ((hi - lo) / 128)), 127) END)::BIGINT AS bin
           FROM q JOIN ext USING (source)),
         c AS (SELECT source, bin, count(*) AS cnt FROM b GROUP BY source, bin),
         cc AS (
           SELECT source, bin, cnt,
             sum(cnt) OVER (PARTITION BY source ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM c),
         pick AS (
           SELECT cc.source, bin, cnt, cum, lo, hi, n,
             row_number() OVER (PARTITION BY cc.source ORDER BY bin) AS rn
           FROM cc JOIN ext USING (source)
           WHERE cum::DOUBLE >= 0.25 * n::DOUBLE),
         f AS (
           SELECT source,
             -- VARCHAR::DECIMAL replays Spark's round(): shortest decimal repr, then HALF_UP
             round((lo + bin::DOUBLE * ((hi - lo) / 128)
               + ((0.25 * n::DOUBLE - (cum - cnt)::DOUBLE) / cnt::DOUBLE) * ((hi - lo) / 128)
               )::VARCHAR::DECIMAL(38,18), 6)::DOUBLE AS fl
           FROM pick WHERE rn = 1)
         SELECT doc_id, source, quality_score, round(fl, 9) + 0 AS domain_floor,
           (CASE WHEN quality_score >= fl THEN 1 ELSE 0 END)::BIGINT AS kept
         FROM q JOIN f USING (source) ORDER BY doc_id""",

    "q_rolling_hash" ->
      """SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
                 t -> ('0x' || substr(md5('0|' || t), 1, 8))::BIGINT)),
             (a, b) -> (a * 31 + b) % 2147483647) AS rolling_hash
         FROM documents ORDER BY doc_id""",

    "q_dedup_exact" ->
      """SELECT doc_id, fingerprint FROM (
           SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
             row_number() OVER (PARTITION BY md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
               ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn = 1 ORDER BY doc_id""",

    // URL blocklist filter (r20): same rotation, same suffix keys, same
    // struct-min verdict, same exact share.
    "q_url_filter" ->
      raw"""WITH wu AS (SELECT doc_id,
             text || ' visit https://' ||
               ($UrlPlantSqlList)[(doc_id % 5 + 1)] ||
               '/p' || doc_id AS text
           FROM documents),
         dom AS (SELECT DISTINCT doc_id, dom FROM (
           SELECT doc_id,
             unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS dom
           FROM wu)),
         sfx AS (SELECT d.doc_id, array_to_string(d.ls[u.i + 1:], '.') AS sfx
           FROM (SELECT doc_id, string_split(dom, '.') AS ls FROM dom) d
           CROSS JOIN LATERAL unnest(range(0, len(d.ls) - 1)) AS u(i)),
         rules(sfx, category) AS (VALUES $UrlBlocklistSqlValues),
         hits AS (SELECT s.doc_id, len(string_split(s.sfx, '.')) AS slab,
             r.category
           FROM sfx s JOIN rules r ON s.sfx = r.sfx),
         verd AS (SELECT doc_id, (min({'ns': -slab, 'c': category})).c AS vc
           FROM hits GROUP BY doc_id),
         per AS (SELECT coalesce(v.vc, 'clean') AS category
           FROM (SELECT DISTINCT doc_id FROM documents) d
           LEFT JOIN verd v USING (doc_id)),
         tot AS (SELECT count(*)::BIGINT AS n FROM per)
         SELECT category, count(*)::BIGINT AS n_docs,
           round(count(*)::DOUBLE / t.n::DOUBLE, 9) + 0 AS share
         FROM per CROSS JOIN tot t GROUP BY category, t.n
         ORDER BY category""",

    // HTML extraction (r20): same planted chrome, same pre-strip link
    // count, same integer keep rule, same '\n' rebuild.
    "q_html_extract" ->
      raw"""WITH h AS (SELECT doc_id,
             '$HtmlHead' || doc_id || '$HtmlHeadTail' || chr(10) ||
             '<body>' || chr(10) || '$HtmlNav' || chr(10) ||
             '<p>' || text || '</p>' || chr(10) ||
             '$HtmlShare' || chr(10) || '$HtmlFooter' || chr(10) ||
             '</body></html>' AS html
           FROM documents),
         ns AS (SELECT doc_id, regexp_replace(regexp_replace(html,
             '<script[^>]*>[^<]*</script>', ' ', 'g'),
             '<style[^>]*>[^<]*</style>', ' ', 'g') AS html FROM h),
         ls AS (SELECT doc_id, string_split(html, chr(10)) AS arr FROM ns),
         ln AS (SELECT doc_id, u.i AS line_no, arr[u.i + 1] AS raw
           FROM ls CROSS JOIN LATERAL unnest(range(0, len(arr))) AS u(i)),
         ft AS (SELECT doc_id, line_no,
             len(string_split(raw, '<a ')) - 1 AS links,
             list_filter(string_split_regex(
               regexp_replace(raw, '<[^>]*>', ' ', 'g'), '\s+'),
               x -> x <> '') AS toks
           FROM ln),
         cl AS (SELECT doc_id, line_no, links, len(toks) AS nt,
             len(list_filter(toks,
               x -> x IN ('the','a','of','and','to','in','is','it'))) AS nst,
             array_to_string(toks, ' ') AS txt
           FROM ft),
         kp AS (SELECT doc_id, line_no, links, txt,
             (links = 0 AND nt > 0 AND (nt >= 10 OR nst * 10 >= nt * 3)) AS keep
           FROM cl)
         SELECT doc_id, count(*)::BIGINT AS n_lines,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN NOT keep AND links > 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_link_lines_removed,
           CASE WHEN sum(CASE WHEN keep THEN 1 ELSE 0 END) > 0
                THEN string_agg(CASE WHEN keep THEN txt END, chr(10)
                  ORDER BY line_no)
           END AS extracted_text
         FROM kp GROUP BY doc_id ORDER BY doc_id""",

    // Line numbering mirrors the engine's derived doc exactly: header at
    // line 0, content lines at 1..cnt in doc_id order, footer at cnt+1.
    "q_dedup_lines" ->
      """WITH content AS (
           SELECT doc_id % 100 AS ldoc,
             row_number() OVER (PARTITION BY doc_id % 100 ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY doc_id % 100) AS cnt,
             text
           FROM documents),
         lines AS (
           SELECT ldoc, rn AS line_no, text AS line FROM content
           UNION ALL
           SELECT DISTINCT ldoc, 0 AS line_no, 'shared license header line' FROM content
           UNION ALL
           SELECT ldoc, cnt + 1 AS line_no, 'shared footer line'
           FROM (SELECT DISTINCT ldoc, cnt FROM content)),
         flagged AS (
           SELECT ldoc, line_no, line,
             row_number() OVER (PARTITION BY md5(line)
               ORDER BY ldoc, line_no) = 1 AS kept
           FROM lines)
         SELECT ldoc, count(*)::BIGINT AS n_lines,
           sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           CASE WHEN sum(CASE WHEN kept THEN 1 ELSE 0 END) > 0
                THEN string_agg(CASE WHEN kept THEN line END, chr(10) ORDER BY line_no)
           END AS text_dedup
         FROM flagged GROUP BY ldoc ORDER BY ldoc""",

    "q_dedup_paragraph" ->
      s"""WITH docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9000, '$ParaBoiler alpha ending words here'),
             (9001, '$ParaBoiler beta different tail tokens'),
             (9002, '$ParaBoiler $ParaBoiler gamma tail')) AS t(doc_id, text)),
         toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
           FROM docs),
         spans AS (
           SELECT doc_id, u.i AS span_idx,
             md5(array_to_string(t[u.i*20+1 : u.i*20+20], ' ')) AS span_fp
           FROM toks CROSS JOIN LATERAL unnest(range(0, CAST(ceil(len(t)/20.0) AS BIGINT))) AS u(i)
           WHERE len(t) > 0)
         SELECT doc_id, span_idx, span_fp,
           (CASE WHEN row_number() OVER (PARTITION BY span_fp ORDER BY doc_id, span_idx) = 1
             THEN 1 ELSE 0 END)::BIGINT AS kept
         FROM spans ORDER BY doc_id, span_idx""",

    "q_dedup_span_stride" ->
      s"""WITH docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9100, '$ParaBoiler'),
             (9101, 'lead in tokens here now $ParaBoiler closing trailer words finish end')
           ) AS t(doc_id, text)),
         toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
           FROM docs),
         d AS (
           SELECT doc_id, t, CAST(ceil(len(t)/5.0) AS BIGINT) AS n_segs
           FROM toks WHERE len(t) > 0),
         wins AS (
           SELECT doc_id, n_segs, u.i AS win_idx,
             md5(array_to_string(t[u.i*5+1 : u.i*5+20], ' ')) AS win_fp
           FROM d CROSS JOIN LATERAL unnest(range(0, n_segs)) AS u(i)),
         flagged AS (
           SELECT doc_id, win_idx, n_segs,
             CASE WHEN row_number() OVER (PARTITION BY win_fp ORDER BY doc_id, win_idx) > 1
               THEN 1 ELSE 0 END AS is_dup
           FROM wins),
         segs AS (
           SELECT doc_id, u.s AS seg_idx, is_dup
           FROM flagged
           CROSS JOIN LATERAL unnest(range(win_idx, least(win_idx + 4, n_segs))) AS u(s))
         SELECT doc_id, seg_idx::BIGINT AS seg_idx, (1 - max(is_dup))::BIGINT AS kept
         FROM segs GROUP BY doc_id, seg_idx ORDER BY doc_id, seg_idx""",

    "q_substring_dedup" ->
      s"""WITH docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9200, '$ParaBoiler'),
             (9201, 'seven lead tokens come before the block $ParaBoiler trailing words end'),
             (9202, 'self repeat case $ParaBoiler middle filler words between copies $ParaBoiler done')
           ) AS t(doc_id, text)),
         toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
           FROM docs),
         d AS (SELECT doc_id, t, len(t)::BIGINT AS n_tokens FROM toks WHERE len(t) > 0),
         wins AS (
           SELECT doc_id, u.i AS pos,
             md5(array_to_string(t[u.i+1 : u.i+15], ' ')) AS fp
           FROM d CROSS JOIN LATERAL unnest(range(0, n_tokens - 14)) AS u(i)
           WHERE n_tokens >= 15),
         flagged AS (
           SELECT doc_id, pos,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
           FROM wins),
         ranges AS (
           SELECT doc_id, pos AS s, pos + 15 AS e FROM flagged WHERE rn > 1),
         marked AS (
           SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_span
           FROM ranges),
         islands AS (
           SELECT doc_id, s, e,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
           FROM marked),
         spans AS (
           SELECT doc_id, span_id, min(s) AS s, max(e) AS e
           FROM islands GROUP BY 1, 2),
         per_doc AS (
           SELECT doc_id, count(*) AS n_dup_spans, sum(e - s) AS dup_tokens
           FROM spans GROUP BY 1)
         SELECT d.doc_id, d.n_tokens,
           COALESCE(p.n_dup_spans, 0)::BIGINT AS n_dup_spans,
           COALESCE(p.dup_tokens, 0)::BIGINT AS dup_tokens,
           round(COALESCE(p.dup_tokens, 0)::DOUBLE / d.n_tokens::DOUBLE, 6) + 0 AS dup_frac
         FROM d LEFT JOIN per_doc p USING (doc_id)
         ORDER BY d.doc_id""",

    "q_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents WHERE doc_id < 100),
         sh AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM toks),
         counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_b, id_a, n_common,
           n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common)::DOUBLE AS jaccard
         FROM inter
         JOIN counts ca ON ca.doc_id = id_a
         JOIN counts cb ON cb.doc_id = id_b
         ORDER BY id_a, id_b""",

    "q_ngram_jaccard_df" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents WHERE doc_id < 100),
         sh_all AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM toks),
         nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM sh_all),
         hot AS (
           SELECT shingle FROM sh_all CROSS JOIN nd
           GROUP BY shingle, n_docs HAVING count(*) > n_docs * 0.03),
         sh AS (SELECT * FROM sh_all WHERE shingle NOT IN (SELECT shingle FROM hot)),
         counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_b, id_a, n_common,
           n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common)::DOUBLE AS jaccard
         FROM inter
         JOIN counts ca ON ca.doc_id = id_a
         JOIN counts cb ON cb.doc_id = id_b
         ORDER BY id_a, id_b""",

    "q_simhash" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         h AS (SELECT doc_id,
             ('0x' || substr(md5('0|' || token), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5('0|' || token), 9, 8))::BIGINT AS h_hi
           FROM tok),
         bits AS (
           SELECT doc_id, b.bit,
             CASE WHEN (CASE WHEN b.bit < 32 THEN h_lo >> b.bit ELSE h_hi >> (b.bit - 32) END) & 1 = 1
               THEN 1 ELSE -1 END AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b),
         votes AS (SELECT doc_id, bit, sum(vote) AS vote_sum FROM bits GROUP BY 1, 2)
         SELECT doc_id,
           sum(CASE WHEN vote_sum > 0
                 THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << bit END
                 ELSE 0 END)::BIGINT AS simhash
         FROM votes GROUP BY doc_id ORDER BY doc_id""",

    "q_simhash_neardup" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         h AS (SELECT doc_id,
             ('0x' || substr(md5('0|' || token), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5('0|' || token), 9, 8))::BIGINT AS h_hi
           FROM tok),
         bits AS (
           SELECT doc_id, b.bit,
             CASE WHEN (CASE WHEN b.bit < 32 THEN h_lo >> b.bit ELSE h_hi >> (b.bit - 32) END) & 1 = 1
               THEN 1 ELSE -1 END AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b),
         votes AS (SELECT doc_id, bit, sum(vote) AS vote_sum FROM bits GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
             sum(CASE WHEN vote_sum > 0
                   THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << bit END
                   ELSE 0 END)::BIGINT AS simhash
           FROM votes GROUP BY doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         ORDER BY id_a, id_b""",

    // q_simhash_neardup's pair CTEs rolled up to unordered source pairs
    // (least/greatest are plain binary string compares in both engines).
    "q_dup_matrix" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         h AS (SELECT doc_id,
             ('0x' || substr(md5('0|' || token), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5('0|' || token), 9, 8))::BIGINT AS h_hi
           FROM tok),
         bits AS (
           SELECT doc_id, b.bit,
             CASE WHEN (CASE WHEN b.bit < 32 THEN h_lo >> b.bit ELSE h_hi >> (b.bit - 32) END) & 1 = 1
               THEN 1 ELSE -1 END AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b),
         votes AS (SELECT doc_id, bit, sum(vote) AS vote_sum FROM bits GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
             sum(CASE WHEN vote_sum > 0
                   THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << bit END
                   ELSE 0 END)::BIGINT AS simhash
           FROM votes GROUP BY doc_id),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
               FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         m AS (SELECT least(da.source, db.source) AS source_a,
                 greatest(da.source, db.source) AS source_b
               FROM p JOIN documents da ON p.id_a = da.doc_id
                      JOIN documents db ON p.id_b = db.doc_id)
         SELECT source_a, source_b, count(*) AS n_pairs
         FROM m GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_pipeline_prep" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, text, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         q AS (
           SELECT doc_id, text,
             len(t)::BIGINT AS n_tokens,
             CASE WHEN len(t) > 0
               THEN list_reduce(list_transform(t, x -> length(x)::BIGINT), (a, b) -> a + b)::DOUBLE / len(t)
               ELSE 0.0 END AS avg_tok_len,
             CASE WHEN len(t) > 0
               THEN len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE / len(t)
               ELSE 0.0 END AS stop_ratio
           FROM toks WHERE len(t) >= 10),
         dd AS (
           SELECT doc_id, text, n_tokens,
             round(stop_ratio * 0.5 + least(avg_tok_len / 10.0, 1.0) * 0.5, 6) + 0 AS quality_score
           FROM (
             SELECT q.*, row_number() OVER (
               PARTITION BY md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
               ORDER BY doc_id) AS rn
             FROM q)
           WHERE rn = 1),
         tok2 AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM dd),
         h AS (SELECT doc_id,
             ('0x' || substr(md5('0|' || token), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5('0|' || token), 9, 8))::BIGINT AS h_hi
           FROM tok2),
         bits AS (
           SELECT doc_id, b.bit,
             CASE WHEN (CASE WHEN b.bit < 32 THEN h_lo >> b.bit ELSE h_hi >> (b.bit - 32) END) & 1 = 1
               THEN 1 ELSE -1 END AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b),
         votes AS (SELECT doc_id, bit, sum(vote) AS vote_sum FROM bits GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
             sum(CASE WHEN vote_sum > 0
                   THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << bit END
                   ELSE 0 END)::BIGINT AS simhash
           FROM votes GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         sym AS (SELECT id_a AS s, id_b AS d FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT s, d FROM sym
           UNION
           SELECT r.s, e.d FROM reach r JOIN sym e ON r.d = e.s)
         SELECT dd.doc_id, n_tokens, quality_score,
           CASE WHEN ('0x' || substr(md5(dd.doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000
                THEN 'train' ELSE 'eval' END AS split
         FROM dd
         LEFT JOIN (SELECT s, min(d) AS mn FROM reach GROUP BY s) m ON m.s = dd.doc_id
         WHERE least(dd.doc_id, coalesce(m.mn, dd.doc_id)) = dd.doc_id
         ORDER BY dd.doc_id""",

    "q_contamination" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM toks),
         bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 100),
         overlap AS (
           SELECT s.doc_id, count(*) AS n_common_shingles
           FROM sh s JOIN bench b ON s.shingle = b.shingle
           WHERE s.doc_id >= 100
           GROUP BY s.doc_id)
         SELECT d.doc_id,
           coalesce(o.n_common_shingles, 0) AS n_common_shingles,
           coalesce(o.n_common_shingles, 0) >= 2 AS contaminated
         FROM (SELECT doc_id FROM documents WHERE doc_id >= 100) d
         LEFT JOIN overlap o ON o.doc_id = d.doc_id
         ORDER BY d.doc_id""",

    "q_dedup_groups" ->
      """WITH RECURSIVE tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         h AS (SELECT doc_id,
             ('0x' || substr(md5('0|' || token), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5('0|' || token), 9, 8))::BIGINT AS h_hi
           FROM tok),
         bits AS (
           SELECT doc_id, b.bit,
             CASE WHEN (CASE WHEN b.bit < 32 THEN h_lo >> b.bit ELSE h_hi >> (b.bit - 32) END) & 1 = 1
               THEN 1 ELSE -1 END AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b),
         votes AS (SELECT doc_id, bit, sum(vote) AS vote_sum FROM bits GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
             sum(CASE WHEN vote_sum > 0
                   THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << bit END
                   ELSE 0 END)::BIGINT AS simhash
           FROM votes GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         sym AS (SELECT id_a AS s, id_b AS d FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT s, d FROM sym
           UNION
           SELECT r.s, e.d FROM reach r JOIN sym e ON r.d = e.s)
         SELECT doc_id, least(doc_id, coalesce(m.mn, doc_id)) AS group_rep
         FROM documents
         LEFT JOIN (SELECT s, min(d) AS mn FROM reach GROUP BY s) m ON m.s = doc_id
         ORDER BY doc_id""",

    // Same transitive closure as q_dedup_groups, then keep the highest-
    // quality member per group (rounded score, ties to lowest id).
    "q_dedup_keep_best" ->
      """WITH RECURSIVE tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         h AS (SELECT doc_id,
             ('0x' || substr(md5('0|' || token), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5('0|' || token), 9, 8))::BIGINT AS h_hi
           FROM tok),
         bits AS (
           SELECT doc_id, b.bit,
             CASE WHEN (CASE WHEN b.bit < 32 THEN h_lo >> b.bit ELSE h_hi >> (b.bit - 32) END) & 1 = 1
               THEN 1 ELSE -1 END AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b),
         votes AS (SELECT doc_id, bit, sum(vote) AS vote_sum FROM bits GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
             sum(CASE WHEN vote_sum > 0
                   THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << bit END
                   ELSE 0 END)::BIGINT AS simhash
           FROM votes GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         sym AS (SELECT id_a AS s, id_b AS d FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT s, d FROM sym
           UNION
           SELECT r.s, e.d FROM reach r JOIN sym e ON r.d = e.s),
         groups AS (
           SELECT doc_id, least(doc_id, coalesce(m.mn, doc_id)) AS group_rep
           FROM documents
           LEFT JOIN (SELECT s, min(d) AS mn FROM reach GROUP BY s) m ON m.s = doc_id),
         q AS (
           SELECT doc_id,
             round(stop_ratio * 0.5 + least(avg_tok_len / 10.0, 1.0) * 0.5, 6) + 0 AS quality_score
           FROM (
             SELECT doc_id,
               CASE WHEN len(toks) > 0
                 THEN list_reduce(list_transform(toks, x -> length(x)::BIGINT), (a, b) -> a + b)::DOUBLE / len(toks)
                 ELSE 0.0 END AS avg_tok_len,
               CASE WHEN len(toks) > 0
                 THEN len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE / len(toks)
                 ELSE 0.0 END AS stop_ratio
             FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
                   FROM documents)))
         SELECT group_rep, doc_id, quality_score FROM (
           SELECT g.group_rep, g.doc_id, q.quality_score,
             row_number() OVER (PARTITION BY g.group_rep
               ORDER BY q.quality_score DESC, g.doc_id ASC) AS rn
           FROM groups g JOIN q ON q.doc_id = g.doc_id)
         WHERE rn = 1
         ORDER BY group_rep""",

    "q_dedup_incremental" ->
      """WITH f AS (
           SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
           FROM documents),
         base AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id < 400),
         delta AS (SELECT doc_id, fingerprint FROM f WHERE doc_id >= 400)
         SELECT doc_id, fingerprint FROM (
           SELECT doc_id, fingerprint,
             row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
           FROM delta
           WHERE fingerprint NOT IN (SELECT fingerprint FROM base))
         WHERE rn = 1
         ORDER BY doc_id""",

    "q_minhash_lsh" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents WHERE doc_id < 200),
         sh AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM toks),
         hashes AS (
           SELECT doc_id, s.seed,
             min(('0x' || substr(md5(s.seed::VARCHAR || '|' || shingle), 1, 8))::BIGINT) AS mh
           FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed) s
           GROUP BY doc_id, s.seed),
         sigs AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM hashes GROUP BY doc_id),
         banded AS (
           SELECT doc_id, sig, b.band,
             md5(b.band::VARCHAR || '|' || array_to_string(sig[b.band*2+1 : b.band*2+2], ',')) AS band_key
           FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band) b)
         SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
           len(list_filter(range(1, 17), i -> a.sig[i] = b2.sig[i]))::DOUBLE / 16.0 AS est_jaccard
         FROM banded a JOIN banded b2
           ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id
         ORDER BY id_a, id_b""",

    "q_repetition" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         stats AS (
           SELECT doc_id, len(t)::BIGINT AS n_tokens,
             len(list_distinct(t))::BIGINT AS uniq_tokens, t
           FROM toks),
         bg AS (
           SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM stats),
         bgc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
         bgs AS (SELECT doc_id, max(c) AS top, sum(c) AS total FROM bgc GROUP BY doc_id)
         SELECT s.doc_id, n_tokens, uniq_tokens,
           round(CASE WHEN n_tokens > 0
             THEN 1.0 - uniq_tokens::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END, 6) + 0 AS dup_token_frac,
           round(coalesce(top::DOUBLE / total::DOUBLE, 0.0), 6) + 0 AS top_bigram_frac
         FROM stats s LEFT JOIN bgs ON bgs.doc_id = s.doc_id
         ORDER BY s.doc_id""",

    "q_redact" ->
      """WITH withpii AS (
           SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-' ||
               lpad(doc_id::VARCHAR, 4, '0') AS text
           FROM documents)
         SELECT doc_id,
           (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) +
            len(regexp_extract_all(text, '[+]?[(]?[0-9]([-.() ]{0,2}[0-9]){6,14}')))::BIGINT AS n_redactions,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[+]?[(]?[0-9]([-.() ]{0,2}[0-9]){6,14}', '<PHONE>', 'g') AS redacted
         FROM withpii ORDER BY doc_id""",

    "q_tfidf" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         perdoc AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
         dlen AS (SELECT doc_id, sum(cnt) AS len FROM perdoc GROUP BY 1),
         dfreq AS (SELECT token, count(*) AS df FROM perdoc GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
         scored AS (
           SELECT p.doc_id, p.token,
             round((p.cnt::DOUBLE / l.len::DOUBLE)
               * (ln((n.n::DOUBLE + 1.0) / (f.df::DOUBLE + 1.0)) + 1.0), 6) + 0 AS score
           FROM perdoc p
           JOIN dlen l ON p.doc_id = l.doc_id
           JOIN dfreq f ON p.token = f.token
           CROSS JOIN n)
         SELECT doc_id, token, score, rank FROM (
           SELECT doc_id, token, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
           FROM scored)
         WHERE rank <= 5
         ORDER BY doc_id, rank""",

    // Brute-force definition of the forward as-of: min-future-ts match
    // per event via a windowed range join (fine at oracle scale; the
    // Spark plan is the single-window union form).
    "q_asof_forward" ->
      """WITH p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
         e AS (SELECT event_id, user_id, ts, value FROM events),
         nxt AS (
           SELECT e.event_id, p.ts AS asof_ts, p.value AS asof_value,
             row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts ASC) AS rn
           FROM e JOIN p ON e.user_id = p.user_id AND p.ts >= e.ts)
         SELECT e.event_id, e.user_id, e.value,
           strftime(n.asof_ts, '%Y-%m-%d %H:%M:%S') AS asof_ts, n.asof_value
         FROM e LEFT JOIN (SELECT * FROM nxt WHERE rn = 1) n USING (event_id)
         ORDER BY event_id""",

    "q_cohort_retention" ->
      """WITH weekly AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
         c AS (SELECT user_id, min(w) AS cw FROM weekly GROUP BY user_id)
         SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           floor(date_diff('day', cw, w) / 7)::BIGINT AS week_offset,
           count(DISTINCT weekly.user_id) AS n_users
         FROM weekly JOIN c USING (user_id)
         GROUP BY cw, week_offset
         ORDER BY cohort_week, week_offset""",

    "q_collect_types" ->
      """SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
           count(DISTINCT event_type) AS n_types
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q_dq_checks" ->
      """WITH ord AS (
           SELECT o_orderkey,
             CASE WHEN o_orderkey % 500 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 700 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate
           FROM orders),
         li AS (
           SELECT CASE WHEN l_orderkey % 1000 = 0 THEN l_orderkey + 20000000 ELSE l_orderkey END AS l_orderkey,
             l_quantity
           FROM lineitem)
         SELECT 'customer_null_acctbal' AS rule, count(*) AS violations
           FROM customer WHERE c_acctbal IS NULL
         UNION ALL SELECT 'lineitem_orphan_orderkey', count(*)
           FROM li WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)
         UNION ALL SELECT 'lineitem_quantity_range', count(*)
           FROM li WHERE l_quantity <= 0 OR l_quantity > 50
         UNION ALL SELECT 'orders_nonpositive_price', count(*)
           FROM ord WHERE o_totalprice <= 0.0
         UNION ALL SELECT 'orders_null_date', count(*)
           FROM ord WHERE o_orderdate IS NULL
         ORDER BY rule""",

    "q_winsorize" ->
      """WITH q AS (
           SELECT event_type, quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
           FROM events GROUP BY event_type)
         SELECT event_id, e.event_type, value,
           round(least(greatest(value, lo), hi), 9) + 0 AS value_w
         FROM events e JOIN q USING (event_type)
         ORDER BY event_id""",

    "q_split_assign" ->
      """SELECT doc_id, source,
           CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000 THEN 'train'
                WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 9000 THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",

    "q_top_bigrams" ->
      """WITH bg AS (
           SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM (SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                 FROM documents)),
         c AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram)
         SELECT bigram, cnt, rank FROM (
           SELECT bigram, cnt, row_number() OVER (ORDER BY cnt DESC, bigram ASC) AS rank
           FROM c)
         WHERE rank <= 50 ORDER BY rank""",

    "q_bigram_logprob" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         bg AS (
           SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM t),
         model AS (SELECT bigram, count(*) AS cbg FROM bg GROUP BY bigram),
         uni AS (SELECT token, count(*) AS cu FROM (
             SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
             FROM documents)
           GROUP BY token),
         tot AS (SELECT count(*) AS vocab FROM uni)
         SELECT b.doc_id, count(*) AS n_bigrams,
           round(sum(CAST(ln((m.cbg::DOUBLE + 1.0) / (u.cu + tot.vocab)::DOUBLE)
                 AS DECIMAL(28,12)))::DOUBLE / count(*), 6) + 0 AS logprob
         FROM bg b
         JOIN model m USING (bigram)
         JOIN uni u ON u.token = split_part(b.bigram, ' ', 1)
         CROSS JOIN tot
         GROUP BY b.doc_id
         ORDER BY doc_id""",

    "q_unigram_logprob" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         model AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
         tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM model)
         SELECT t.doc_id, count(*) AS n_tokens,
           round(sum(CAST(ln((m.c::DOUBLE + 1.0) / (tot.total + tot.vocab)::DOUBLE)
                 AS DECIMAL(28,12)))::DOUBLE / count(*), 6) + 0 AS logprob
         FROM tok t JOIN model m ON t.token = m.token CROSS JOIN tot
         GROUP BY t.doc_id
         ORDER BY doc_id""",

    // Constants interpolated from the SAME Scala doubles the query uses
    // (Double.toString round-trips exactly), so literal parsing can never
    // diverge between engines.
    "q_bm25" -> {
      val (k1, b) = (1.2, 0.75)
      val terms = Bm25Terms.map("'" + _ + "'").mkString(", ")
      raw"""WITH dl AS (
           SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS dl
           FROM documents),
         tot AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
         tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
                WHERE token IN ($terms) GROUP BY 1, 2),
         dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
         SELECT t.doc_id, count(*) AS n_terms,
           round(sum(CAST(
             ln(1.0 + (tot.n::DOUBLE - f.df::DOUBLE + 0.5) / (f.df::DOUBLE + 0.5))
               * ((t.tf::DOUBLE * ${k1 + 1.0}) /
                  (t.tf::DOUBLE + $k1 * (1.0 - $b + $b * (d.dl::DOUBLE / (tot.sumdl::DOUBLE / tot.n::DOUBLE)))))
             AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS bm25
         FROM tf t
         JOIN dfreq f ON t.token = f.token
         JOIN dl d ON t.doc_id = d.doc_id
         CROSS JOIN tot
         GROUP BY t.doc_id
         ORDER BY t.doc_id"""
    },

    "q_domain_mix" ->
      """WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
         norm AS (SELECT sum(CAST(sqrt(c::DOUBLE) AS DECIMAL(28,12)))::DOUBLE AS sum_w,
                         sum(c) AS n FROM c),
         rates AS (
           SELECT c.lang,
             round(least(1.0,
               (sqrt(c.c::DOUBLE) / norm.sum_w) * (0.5 * norm.n::DOUBLE) / c.c::DOUBLE), 6) + 0 AS keep_rate
           FROM c CROSS JOIN norm)
         SELECT d.doc_id, d.lang, r.keep_rate
         FROM documents d JOIN rates r ON d.lang = r.lang
         WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 10000
               < round(r.keep_rate * 10000)
         ORDER BY d.doc_id""",

    "q_chunk" ->
      """WITH d AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         s AS (
           SELECT doc_id, t, unnest(range(0, len(t), 48)) AS start
           FROM d WHERE len(t) > 0)
         SELECT doc_id, (start // 48)::BIGINT AS chunk_idx,
           array_to_string(t[start+1 : start+64], ' ') AS chunk_text,
           least(len(t) - start, 64)::BIGINT AS n_chunk_tokens
         FROM s ORDER BY doc_id, chunk_idx""",

    "q_pack" ->
      """WITH d AS (
           SELECT doc_id,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS n_tokens,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard
           FROM documents),
         p AS (
           SELECT doc_id, n_tokens, shard,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           FROM d)
         SELECT doc_id, shard, (before // 2048)::BIGINT AS pack_id,
           (before % 2048)::BIGINT AS pack_offset, n_tokens
         FROM p ORDER BY doc_id""",

    "q_domains" ->
      """WITH withurls AS (
           SELECT doc_id,
             text || ' see https://site' || (doc_id % 7) || '.example.com/page' || doc_id ||
               ' and http://ref.example.org/x' AS text
           FROM documents),
         dom AS (
           SELECT doc_id, unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
           FROM withurls)
         SELECT domain, count(*) AS n_refs, count(DISTINCT doc_id) AS n_docs
         FROM dom GROUP BY domain ORDER BY domain""",

    "q_lang_id" ->
      """WITH tok AS (
           SELECT lang, unnest(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS token
           FROM documents),
         freq AS (SELECT lang, token, count(*) AS f FROM tok GROUP BY 1, 2),
         profile AS (
           SELECT lang AS profile_lang, token FROM (
             SELECT lang, token,
               row_number() OVER (PARTITION BY lang ORDER BY f DESC, token ASC) AS rn
             FROM freq)
           WHERE rn <= 20),
         doctok AS (
           SELECT doc_id, unnest(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS token
           FROM documents),
         overlap AS (
           SELECT doc_id, profile_lang, count(*) AS overlap
           FROM doctok JOIN profile USING (token)
           GROUP BY 1, 2)
         SELECT doc_id, profile_lang AS lang_pred, overlap FROM (
           SELECT doc_id, profile_lang, overlap,
             row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, profile_lang ASC) AS rn
           FROM overlap)
         WHERE rn = 1 ORDER BY doc_id""",

    // Replicates decodeByteFeatures: nibble counts = hex-digit counts of
    // the payload's hex encoding; frequencies divide by 2·byte_len; the
    // entropy dim uses the same -Σ p·ln(p) / ln(2) form as the Scala loop.
    // Every per-doc feature is cast to FLOAT exactly like the Spark side,
    // and mean_f is rounded to 6 dp so ULP-level log/ordering differences
    // can't surface.
    "q_multimodal" ->
      """WITH d AS (
           SELECT doc_id, length(text) AS chars, hex(encode(text)) AS h,
             2 * octet_length(encode(text)) AS tot
           FROM documents),
         nib AS (
           SELECT doc_id, tot, b.dim,
             length(h) - length(replace(h, substr('0123456789ABCDEF', b.dim + 1, 1), '')) AS cnt
           FROM d CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS dim) b),
         freq AS (
           SELECT doc_id, dim,
             (CASE WHEN tot > 0 THEN cnt::DOUBLE / tot ELSE 0.0 END)::FLOAT AS f
           FROM nib),
         ent AS (
           SELECT doc_id, 16 AS dim,
             (CASE WHEN any_value(tot) > 0 THEN
               sum(CASE WHEN cnt > 0 THEN -(cnt::DOUBLE / tot) * ln(cnt::DOUBLE / tot) ELSE 0.0 END) / ln(2.0)
              ELSE 0.0 END)::FLOAT AS f
           FROM nib GROUP BY doc_id),
         feats AS (SELECT * FROM freq UNION ALL SELECT * FROM ent)
         SELECT 'text/plain' AS mime, dim::BIGINT AS dim, count(*) AS n,
           round(avg(f::DOUBLE), 6) + 0 AS mean_f,
           sum(CAST(chars::DOUBLE AS DECIMAL(28,4)))::DOUBLE AS total_bytes
         FROM feats JOIN d USING (doc_id)
         GROUP BY dim ORDER BY mime, dim""",

    "q_quantize_int8" ->
      """SELECT vec_id, round(s, 9) + 0 AS scale,
           array_to_string(list_transform(e,
             x -> CASE WHEN s > 0 THEN floor(x * 127.0 / s + 0.5)::TINYINT
                       ELSE 0::TINYINT END), ',') AS q_csv
         FROM (
           SELECT vec_id, embedding::DOUBLE[] AS e,
             list_reduce(list_transform(embedding::DOUBLE[], x -> abs(x)),
               (a, b) -> greatest(a, b)) AS s
           FROM embeddings)
         ORDER BY vec_id""",

    "q_array_dot" ->
      """SELECT vec_id,
           list_reduce(list_transform(range(1, 65),
             i -> (embedding::DOUBLE[])[i] * (embedding::DOUBLE[])[i]), (x, y) -> x + y) AS dot
         FROM embeddings ORDER BY vec_id""",

    "q_cosine_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             list_reduce(list_transform(range(1, 65), i -> q.e[i]*c.e[i]), (x, y) -> x + y)
               / (q.nrm * c.nrm) AS score
           FROM n q JOIN n c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 8)
         SELECT query_id, corpus_id, score, rank FROM (
           SELECT query_id, corpus_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_embed_neardup" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 200),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_reduce(list_transform(range(1, 65), i -> a.e[i]*b.e[i]), (x, y) -> x + y)
             / (a.nrm * b.nrm), 9) + 0 AS cos_sim
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE list_reduce(list_transform(range(1, 65), i -> a.e[i]*b.e[i]), (x, y) -> x + y)
             / (a.nrm * b.nrm) >= 0.2
         ORDER BY id_a, id_b""",

    "q_embed_neardup_lsh" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 500),
         sigged AS (SELECT vec_id, e,
           ${lshBandSigSql(bands = 8, planesPerBand = 2, dim = 64)} AS sigs
           FROM v),
         banded AS (
           SELECT vec_id, ub.i - 1 AS band, sigs[ub.i] AS band_sig
           FROM sigged CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ub),
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.band_sig = b.band_sig AND a.vec_id < b.vec_id),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v)
         SELECT id_a, id_b,
           round(list_reduce(list_transform(range(1, 65), i -> na.e[i]*nb.e[i]), (x, y) -> x + y)
             / (na.nrm * nb.nrm), 9) + 0 AS cos_sim
         FROM cand
         JOIN n na ON na.vec_id = id_a
         JOIN n nb ON nb.vec_id = id_b
         WHERE list_reduce(list_transform(range(1, 65), i -> na.e[i]*nb.e[i]), (x, y) -> x + y)
             / (na.nrm * nb.nrm) >= 0.2
         ORDER BY id_a, id_b""",

    "q_embed_neardup_lsh_r8" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 500),
         planted AS (
           SELECT vec_id + 100000 AS vec_id, pe AS e FROM (
             SELECT vec_id,
               list_transform(range(1, 65),
                 i -> ((e[i] + ((vec_id * 64 + (i - 1)) % 7 - 3) * 0.001)::FLOAT)::DOUBLE) AS pe
             FROM base WHERE vec_id < 50)),
         v AS (SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM planted),
         sigged AS (SELECT vec_id, e,
           ${lshBandSigSql(bands = 8, planesPerBand = 8, dim = 64)} AS sigs
           FROM v),
         banded AS (
           SELECT vec_id, ub.i - 1 AS band, sigs[ub.i] AS band_sig
           FROM sigged CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ub),
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.band_sig = b.band_sig AND a.vec_id < b.vec_id),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v)
         SELECT id_a, id_b,
           round(list_reduce(list_transform(range(1, 65), i -> na.e[i]*nb.e[i]), (x, y) -> x + y)
             / (na.nrm * nb.nrm), 9) + 0 AS cos_sim
         FROM cand
         JOIN n na ON na.vec_id = id_a
         JOIN n nb ON nb.vec_id = id_b
         WHERE list_reduce(list_transform(range(1, 65), i -> na.e[i]*nb.e[i]), (x, y) -> x + y)
             / (na.nrm * nb.nrm) >= 0.9
         ORDER BY id_a, id_b""",

    "q_cosine_topk_lsh" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         sigged AS (SELECT vec_id, e,
           ${lshBandSigSql(bands = 8, planesPerBand = 2, dim = 64)} AS sigs
           FROM v),
         banded AS (
           SELECT vec_id, ub.i - 1 AS band, sigs[ub.i] AS band_sig
           FROM sigged CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ub),
         cand AS (
           SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
           FROM banded c JOIN banded q
             ON c.band = q.band AND c.band_sig = q.band_sig AND q.vec_id <> c.vec_id
           WHERE q.vec_id < 8),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         scored AS (
           SELECT query_id, corpus_id,
             list_reduce(list_transform(range(1, 65), i -> nq.e[i]*nc.e[i]), (x, y) -> x + y)
               / (nq.nrm * nc.nrm) AS score
           FROM cand
           JOIN n nq ON nq.vec_id = query_id
           JOIN n nc ON nc.vec_id = corpus_id)
         SELECT query_id, corpus_id, score, rank FROM (
           SELECT query_id, corpus_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_cosine_topk_native" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             list_reduce(list_transform(range(1, 65), i -> q.e[i]*c.e[i]), (x, y) -> x + y)
               / (q.nrm * c.nrm) AS score
           FROM n q JOIN n c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 8)
         SELECT query_id, corpus_id, score, rank FROM (
           SELECT query_id, corpus_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // ── round 7d ────────────────────────────────────────────────────────
    "q_join_full" ->
      """WITH even AS (
           SELECT o_custkey, count(*) AS n_even,
             sum(CAST(o_totalprice AS DECIMAL(28,4)))::DOUBLE AS spend_even
           FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_custkey),
         third AS (
           SELECT o_custkey, count(*) AS n_third,
             sum(CAST(o_totalprice AS DECIMAL(28,4)))::DOUBLE AS spend_third
           FROM orders WHERE o_orderkey % 3 = 0 GROUP BY o_custkey)
         SELECT o_custkey,
           coalesce(n_even, 0) AS n_even,
           coalesce(n_third, 0) AS n_third,
           round(coalesce(spend_even, 0.0) + coalesce(spend_third, 0.0), 4) + 0 AS spend_both
         FROM even FULL OUTER JOIN third USING (o_custkey)
         ORDER BY o_custkey""",

    "q_join_nullsafe" ->
      """WITH cust AS (
           SELECT c_custkey,
             CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_nationkey END AS nk
           FROM customer),
         nat AS (
           SELECT n_nationkey AS nk, n_name FROM nation
           UNION ALL SELECT NULL, 'UNKNOWN')
         SELECT c_custkey, cust.nk AS nk, n_name
         FROM cust JOIN nat ON cust.nk IS NOT DISTINCT FROM nat.nk
         ORDER BY c_custkey""",

    "q_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric, p_size::DOUBLE AS value FROM part
         UNION ALL
         SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
         ORDER BY p_partkey, metric""",

    "q_scd2" ->
      """WITH cur AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
         nxt AS (
           SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN 'ARCHIVE' ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
           FROM customer WHERE c_custkey % 97 <> 0
           UNION ALL
           SELECT c_custkey + 900000, c_mktsegment, c_acctbal
           FROM customer WHERE c_custkey % 101 = 0),
         j AS (
           SELECT coalesce(o.c_custkey, n.c_custkey) AS k,
             o.c_custkey IS NOT NULL AS in_o, n.c_custkey IS NOT NULL AS in_n,
             o.c_mktsegment AS seg_o, o.c_acctbal AS bal_o,
             n.c_mktsegment AS seg_n, n.c_acctbal AS bal_n,
             (o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
               AND o.c_mktsegment = n.c_mktsegment AND o.c_acctbal = n.c_acctbal) AS same
           FROM cur o FULL OUTER JOIN nxt n ON o.c_custkey = n.c_custkey)
         SELECT k AS c_custkey, seg_o AS c_mktsegment, bal_o AS c_acctbal,
           '2024-01-01' AS valid_from,
           CASE WHEN same THEN NULL ELSE '2024-02-01' END AS valid_to,
           same AS is_current
         FROM j WHERE in_o
         UNION ALL
         SELECT k, seg_n, bal_n, '2024-02-01', NULL, true
         FROM j WHERE in_n AND NOT coalesce(same, false)
         ORDER BY c_custkey, valid_from""",

    "q_vwap" ->
      """SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           round(sum(CAST(value * (event_id % 10 + 1) AS DECIMAL(28,8)))::DOUBLE /
                 sum(CAST((event_id % 10 + 1) AS DECIMAL(28,8)))::DOUBLE, 9) + 0 AS vwap,
           sum(CAST((event_id % 10 + 1) AS DECIMAL(28,4)))::DOUBLE AS total_vol,
           count(*) AS n_trades
         FROM events GROUP BY event_type, bucket
         ORDER BY event_type, bucket""",

    "q_drawdown" ->
      """WITH c AS (
           SELECT event_id, user_id, ts,
             sum(CAST(value AS DECIMAL(28,4))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE AS equity
           FROM events),
         p AS (
           SELECT event_id, user_id, equity,
             max(equity) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           FROM c)
         SELECT event_id, user_id, equity, peak,
           round(peak - equity, 4) + 0 AS drawdown
         FROM p ORDER BY event_id""",

    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
         isl AS (
           SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS island
           FROM days),
         g AS (SELECT user_id, island, count(*) AS len FROM isl GROUP BY user_id, island)
         SELECT user_id, max(len) AS longest_streak, count(*) AS n_streaks,
           sum(len)::BIGINT AS active_days
         FROM g GROUP BY user_id ORDER BY user_id""",

    "q_vocab_coverage" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
         tot AS (SELECT sum(cnt)::BIGINT AS total FROM c),
         r AS (
           SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank,
             sum(cnt) OVER (ORDER BY cnt DESC, token ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
           FROM c)
         SELECT rank, token, cnt,
           round(cum::DOUBLE / total::DOUBLE, 9) + 0 AS cum_share
         FROM r CROSS JOIN tot WHERE rank <= 100 ORDER BY rank""",

    "q_cooccur" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         pairs AS (
           SELECT l.i AS item_a, r.i AS item_b
           FROM items l JOIN items r ON l.b = r.b AND l.i < r.i),
         sup AS (SELECT item_a, item_b, count(*) AS support FROM pairs GROUP BY item_a, item_b)
         SELECT rank, item_a, item_b, support FROM (
           SELECT item_a, item_b, support,
             row_number() OVER (ORDER BY support DESC, item_a ASC, item_b ASC) AS rank
           FROM sup)
         WHERE rank <= 50 ORDER BY rank""",

    "q_itemsets3" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         t AS (
           SELECT x.i AS item_a, y.i AS item_b, z.i AS item_c
           FROM items x
           JOIN items y ON x.b = y.b AND x.i < y.i
           JOIN items z ON y.b = z.b AND y.i < z.i),
         sup AS (SELECT item_a, item_b, item_c, count(*) AS support
                 FROM t GROUP BY item_a, item_b, item_c)
         SELECT rank, item_a, item_b, item_c, support FROM (
           SELECT item_a, item_b, item_c, support,
             row_number() OVER (ORDER BY support DESC, item_a ASC, item_b ASC, item_c ASC) AS rank
           FROM sup)
         WHERE rank <= 25 ORDER BY rank""",

    "q_assoc_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM lineitem),
         cnt AS (SELECT i AS item, count(*) AS basket_cnt FROM items GROUP BY i),
         pairs AS (
           SELECT l.i AS item_a, r.i AS item_b
           FROM items l JOIN items r ON l.b = r.b AND l.i < r.i),
         sup AS (SELECT item_a, item_b, count(*) AS support FROM pairs GROUP BY item_a, item_b),
         top AS (SELECT item_a, item_b, support FROM (
           SELECT item_a, item_b, support,
             row_number() OVER (ORDER BY support DESC, item_a ASC, item_b ASC) AS prank
           FROM sup) WHERE prank <= 50),
         rules AS (
           SELECT item_a AS antecedent, item_b AS consequent, support FROM top
           UNION ALL
           SELECT item_b AS antecedent, item_a AS consequent, support FROM top),
         j AS (
           SELECT r.antecedent, r.consequent, r.support,
             ca.basket_cnt AS cnt_a, cb.basket_cnt AS cnt_b, n.n_baskets
           FROM rules r
           JOIN cnt ca ON r.antecedent = ca.item
           JOIN cnt cb ON r.consequent = cb.item
           CROSS JOIN n)
         SELECT
           row_number() OVER (ORDER BY support DESC, antecedent ASC, consequent ASC) AS rank,
           antecedent, consequent, support,
           round(support::DOUBLE / cnt_a, 9) + 0 AS confidence,
           round(support::DOUBLE * n_baskets / (cnt_a::DOUBLE * cnt_b), 9) + 0 AS lift
         FROM j ORDER BY rank""",

    "q_pagerank" ->
      """WITH e0 AS (
           SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT cust AS src, supp AS dst FROM e0
               UNION ALL SELECT supp, cust FROM e0),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         deg AS (SELECT src AS id, count(*) AS d FROM e GROUP BY src),
         r0 AS (SELECT id, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
         s1 AS (
           SELECT e.dst AS id,
             sum(CAST(r0.rank / deg.d AS DECIMAL(28,12)))::DOUBLE AS inr
           FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.id
           GROUP BY e.dst),
         r1 AS (
           SELECT nodes.id, (1.0 - 0.85) / n + 0.85 * coalesce(s1.inr, 0.0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN s1 ON nodes.id = s1.id),
         s2 AS (
           SELECT e.dst AS id,
             sum(CAST(r1.rank / deg.d AS DECIMAL(28,12)))::DOUBLE AS inr
           FROM e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.id
           GROUP BY e.dst),
         r2 AS (
           SELECT nodes.id, (1.0 - 0.85) / n + 0.85 * coalesce(s2.inr, 0.0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN s2 ON nodes.id = s2.id)
         SELECT id AS node_id, round(rank, 9) + 0 AS rank
         FROM r2 ORDER BY node_id""",

    // Two HITS iterations unrolled (the q_pagerank recipe): every
    // contribution and normalization sum is decimal-exact, so each CTE
    // mirrors one Spark join+aggregate bit-for-bit.
    "q_hits" ->
      """WITH e0 AS (
           SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT cust AS src, supp AS dst FROM e0),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         h0 AS (SELECT id, 1.0 AS hub FROM nodes),
         a1r AS (SELECT e.dst AS id, sum(CAST(h0.hub AS DECIMAL(28,12)))::DOUBLE AS auth
                 FROM e JOIN h0 ON e.src = h0.id GROUP BY e.dst),
         a1f AS (SELECT nodes.id, coalesce(a1r.auth, 0.0) AS auth
                 FROM nodes LEFT JOIN a1r ON nodes.id = a1r.id),
         a1t AS (SELECT sum(CAST(auth AS DECIMAL(28,12)))::DOUBLE AS tot FROM a1f),
         a1 AS (SELECT id, auth / tot AS auth FROM a1f CROSS JOIN a1t),
         h1r AS (SELECT e.src AS id, sum(CAST(a1.auth AS DECIMAL(28,12)))::DOUBLE AS hub
                 FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src),
         h1f AS (SELECT nodes.id, coalesce(h1r.hub, 0.0) AS hub
                 FROM nodes LEFT JOIN h1r ON nodes.id = h1r.id),
         h1t AS (SELECT sum(CAST(hub AS DECIMAL(28,12)))::DOUBLE AS tot FROM h1f),
         h1 AS (SELECT id, hub / tot AS hub FROM h1f CROSS JOIN h1t),
         a2r AS (SELECT e.dst AS id, sum(CAST(h1.hub AS DECIMAL(28,12)))::DOUBLE AS auth
                 FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst),
         a2f AS (SELECT nodes.id, coalesce(a2r.auth, 0.0) AS auth
                 FROM nodes LEFT JOIN a2r ON nodes.id = a2r.id),
         a2t AS (SELECT sum(CAST(auth AS DECIMAL(28,12)))::DOUBLE AS tot FROM a2f),
         a2 AS (SELECT id, auth / tot AS auth FROM a2f CROSS JOIN a2t),
         h2r AS (SELECT e.src AS id, sum(CAST(a2.auth AS DECIMAL(28,12)))::DOUBLE AS hub
                 FROM e JOIN a2 ON e.dst = a2.id GROUP BY e.src),
         h2f AS (SELECT nodes.id, coalesce(h2r.hub, 0.0) AS hub
                 FROM nodes LEFT JOIN h2r ON nodes.id = h2r.id),
         h2t AS (SELECT sum(CAST(hub AS DECIMAL(28,12)))::DOUBLE AS tot FROM h2f),
         h2 AS (SELECT id, hub / tot AS hub FROM h2f CROSS JOIN h2t)
         SELECT nodes.id AS node_id, round(a2.auth, 9) + 0 AS auth, round(h2.hub, 9) + 0 AS hub
         FROM nodes JOIN a2 ON nodes.id = a2.id JOIN h2 ON nodes.id = h2.id
         ORDER BY node_id""",

    // Three Bellman-Ford rounds unrolled; integer path costs make every
    // min() exact, so no decimal discipline is needed.
    "q_sssp" ->
      """WITH we AS (
           SELECT o_custkey AS cust, l_suppkey + 1000000 AS supp, count(*) AS w
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
         sym0 AS (SELECT cust AS u, supp AS v, w FROM we
                  UNION ALL SELECT supp, cust, w FROM we),
         sym AS (SELECT u, v, min(w) AS w FROM sym0 GROUP BY u, v),
         d0 AS (SELECT DISTINCT cust AS id, 0::BIGINT AS dist FROM we WHERE cust < 10),
         r1 AS (SELECT id, min(dist) AS dist FROM (
                  SELECT id, dist FROM d0
                  UNION ALL
                  SELECT sym.v, d0.dist + sym.w FROM sym JOIN d0 ON sym.u = d0.id)
                GROUP BY id),
         r2 AS (SELECT id, min(dist) AS dist FROM (
                  SELECT id, dist FROM r1
                  UNION ALL
                  SELECT sym.v, r1.dist + sym.w FROM sym JOIN r1 ON sym.u = r1.id)
                GROUP BY id),
         r3 AS (SELECT id, min(dist) AS dist FROM (
                  SELECT id, dist FROM r2
                  UNION ALL
                  SELECT sym.v, r2.dist + sym.w FROM sym JOIN r2 ON sym.u = r2.id)
                GROUP BY id)
         SELECT id, dist FROM r3 ORDER BY id""",

    // k-core peel unrolled to 40 rounds (generated; the deepest observed
    // fixpoint on this graph family is 23 rounds at sf0.1, and rounds
    // past the fixpoint are idempotent, so the margin is pure safety —
    // KCoreSpec pins a brute-force referee on top).
    "q_kcore" -> {
      val rounds = 40
      // MATERIALIZED is load-bearing: each round references the previous
      // one three times, and CTE inlining would make the plan (and the
      // parquet scan count) grow 3^rounds.
      val head =
        """WITH e0 AS MATERIALIZED (
           SELECT o_custkey AS cust, l_suppkey + 1000000 AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         s0 AS MATERIALIZED (SELECT cust AS u, supp AS v FROM e0 UNION SELECT supp, cust FROM e0)"""
      val body = (1 to rounds).map { i =>
        s""",
         k$i AS MATERIALIZED (SELECT u FROM s${i - 1} GROUP BY u HAVING count(*) >= 3),
         s$i AS MATERIALIZED (SELECT s.u, s.v FROM s${i - 1} s
                 JOIN k$i a ON s.u = a.u JOIN k$i b ON s.v = b.u)"""
      }.mkString
      head + body +
        s"""
         SELECT u AS node_id, count(*) AS deg FROM s$rounds
         GROUP BY u HAVING count(*) >= 3 ORDER BY node_id"""
    },

    "q_pmi" ->
      """WITH bg AS (
           SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM (SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                 FROM documents)),
         c AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram),
         uni AS (SELECT token, count(*) AS uc FROM (
             SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
             FROM documents)
           GROUP BY token),
         btot AS (SELECT sum(cnt)::BIGINT AS btot FROM c),
         utot AS (SELECT sum(uc)::BIGINT AS utot FROM uni),
         f AS (SELECT bigram, cnt,
                 string_split(bigram, ' ')[1] AS w1,
                 string_split(bigram, ' ')[2] AS w2
               FROM c WHERE cnt >= 20)
         SELECT f.bigram, f.cnt,
           round(ln((f.cnt::DOUBLE / btot.btot::DOUBLE) *
                    (utot.utot::DOUBLE / u1.uc::DOUBLE) *
                    (utot.utot::DOUBLE / u2.uc::DOUBLE)), 6) + 0 AS pmi
         FROM f JOIN uni u1 ON f.w1 = u1.token JOIN uni u2 ON f.w2 = u2.token
         CROSS JOIN btot CROSS JOIN utot
         ORDER BY bigram""",

    // Closed-form absent-token mass (see TextOps.domainDivergence): the
    // oracle mirrors the per-term double shapes and the decimal sums, so
    // the whole KL hash-checks despite transcendentals.
    "q_domain_kl" ->
      """WITH tok AS (
           SELECT source AS domain,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         uni AS (SELECT token, count(*) AS ct FROM tok GROUP BY token),
         corpus AS (SELECT sum(ct)::BIGINT AS n, count(*) AS v FROM uni),
         lcall AS (
           SELECT sum(CAST(ln((ct::DOUBLE + 1.0) / (n + v)::DOUBLE)
             AS DECIMAL(28,12)))::DOUBLE AS lc_all
           FROM uni CROSS JOIN corpus),
         dom AS (SELECT domain, token, count(*) AS cdt FROM tok GROUP BY domain, token),
         domtot AS (SELECT domain, sum(cdt)::BIGINT AS nd, count(*) AS vd
                    FROM dom GROUP BY domain),
         present AS (
           SELECT d.domain, dt.nd, dt.vd,
             sum(CAST(((d.cdt::DOUBLE + 1.0) / (dt.nd + c.v)::DOUBLE) *
                ln(((d.cdt::DOUBLE + 1.0) / (dt.nd + c.v)::DOUBLE) /
                   ((u.ct::DOUBLE + 1.0) / (c.n + c.v)::DOUBLE))
               AS DECIMAL(28,12)))::DOUBLE AS s1,
             sum(CAST(ln((u.ct::DOUBLE + 1.0) / (c.n + c.v)::DOUBLE)
               AS DECIMAL(28,12)))::DOUBLE AS lcd
           FROM dom d JOIN uni u ON d.token = u.token
           JOIN domtot dt ON d.domain = dt.domain
           CROSS JOIN corpus c
           GROUP BY d.domain, dt.nd, dt.vd)
         SELECT p.domain, p.nd AS n_tokens, p.vd AS vocab_seen,
           round(p.s1 + (1.0 / (p.nd + c.v)::DOUBLE) *
             ((c.v - p.vd)::DOUBLE * ln(1.0 / (p.nd + c.v)::DOUBLE) -
              (l.lc_all - p.lcd)), 6) + 0 AS kl
         FROM present p CROSS JOIN corpus c CROSS JOIN lcall l
         ORDER BY domain""",

    "q_dsir_weights" ->
      """WITH tok AS (
           SELECT doc_id, source,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tb AS (SELECT doc_id, source,
                  ('0x' || substr(md5(token), 1, 8))::BIGINT % 256 AS b
                FROM tok),
         raw AS (SELECT b, count(*) AS craw FROM tb GROUP BY b),
         tgt AS (SELECT b, count(*) AS ctgt FROM tb WHERE source = 'src0' GROUP BY b),
         model AS (SELECT raw.b, raw.craw, coalesce(tgt.ctgt, 0) AS ctgt
                   FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
         totals AS (SELECT sum(craw)::BIGINT AS nraw, sum(ctgt)::BIGINT AS ntgt FROM model),
         perdoc AS (SELECT doc_id, b, count(*) AS cnt FROM tb GROUP BY doc_id, b)
         SELECT p.doc_id, sum(p.cnt)::BIGINT AS n_tokens,
           round(sum(CAST(p.cnt::DOUBLE *
             (ln((m.ctgt::DOUBLE + 1.0) / (t.ntgt + 256)::DOUBLE) -
              ln((m.craw::DOUBLE + 1.0) / (t.nraw + 256)::DOUBLE))
             AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS weight
         FROM perdoc p JOIN model m ON p.b = m.b CROSS JOIN totals t
         GROUP BY p.doc_id ORDER BY doc_id""",

    "q_ppr" ->
      """WITH e0 AS (
           SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT cust AS src, supp AS dst FROM e0
               UNION ALL SELECT supp, cust FROM e0),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         seeds AS (SELECT DISTINCT cust AS id FROM e0 WHERE cust < 10),
         ns AS (SELECT count(*)::DOUBLE AS s FROM seeds),
         deg AS (SELECT src AS id, count(*) AS d FROM e GROUP BY src),
         p AS (SELECT nodes.id,
                 CASE WHEN seeds.id IS NOT NULL THEN 1.0 / ns.s ELSE 0.0 END AS p
               FROM nodes LEFT JOIN seeds ON nodes.id = seeds.id CROSS JOIN ns),
         r0 AS (SELECT id, p AS rank FROM p),
         s1 AS (
           SELECT e.dst AS id,
             sum(CAST(r0.rank / deg.d AS DECIMAL(28,12)))::DOUBLE AS inr
           FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.id
           GROUP BY e.dst),
         r1 AS (SELECT p.id, (1.0 - 0.85) * p.p + 0.85 * coalesce(s1.inr, 0.0) AS rank
                FROM p LEFT JOIN s1 ON p.id = s1.id),
         s2 AS (
           SELECT e.dst AS id,
             sum(CAST(r1.rank / deg.d AS DECIMAL(28,12)))::DOUBLE AS inr
           FROM e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.id
           GROUP BY e.dst),
         r2 AS (SELECT p.id, (1.0 - 0.85) * p.p + 0.85 * coalesce(s2.inr, 0.0) AS rank
                FROM p LEFT JOIN s2 ON p.id = s2.id)
         SELECT id AS node_id, round(rank, 9) + 0 AS rank
         FROM r2 ORDER BY node_id""",

    "q_textrank" ->
      """WITH bg AS (
           SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM (SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                 FROM documents)),
         bp AS (SELECT string_split(bigram, ' ')[1] AS w1,
                       string_split(bigram, ' ')[2] AS w2
                FROM bg
                WHERE string_split(bigram, ' ')[1] <> string_split(bigram, ' ')[2]),
         e AS (SELECT DISTINCT w1, w2 FROM
                 (SELECT w1, w2 FROM bp UNION ALL SELECT w2, w1 FROM bp)),
         nodes AS (SELECT DISTINCT w1 AS token FROM e),
         nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         deg AS (SELECT w1, count(*) AS d FROM e GROUP BY w1),
         r0 AS (SELECT token, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
         s1 AS (
           SELECT e.w2 AS token,
             sum(CAST(r0.rank / deg.d AS DECIMAL(28,12)))::DOUBLE AS inr
           FROM e JOIN r0 ON e.w1 = r0.token JOIN deg ON e.w1 = deg.w1
           GROUP BY e.w2),
         r1 AS (SELECT nodes.token, (1.0 - 0.85) / n + 0.85 * coalesce(s1.inr, 0.0) AS rank
                FROM nodes CROSS JOIN nn LEFT JOIN s1 ON nodes.token = s1.token),
         s2 AS (
           SELECT e.w2 AS token,
             sum(CAST(r1.rank / deg.d AS DECIMAL(28,12)))::DOUBLE AS inr
           FROM e JOIN r1 ON e.w1 = r1.token JOIN deg ON e.w1 = deg.w1
           GROUP BY e.w2),
         r2 AS (SELECT nodes.token, (1.0 - 0.85) / n + 0.85 * coalesce(s2.inr, 0.0) AS rank
                FROM nodes CROSS JOIN nn LEFT JOIN s2 ON nodes.token = s2.token)
         SELECT token, round(rank, 9) + 0 AS rank FROM r2 ORDER BY token""",

    "q_embed_cov" ->
      """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         p AS (SELECT unnest(flatten(list_transform(range(0, len(v)), i ->
                 list_transform(range(i, len(v)), j ->
                   {'i': i, 'j': j, 'xy': v[i+1]::DOUBLE * v[j+1]::DOUBLE})))) AS s
               FROM e),
         agg AS (SELECT s.i AS i, s.j AS j,
                   sum(CAST(s.xy AS DECIMAL(28,12)))::DOUBLE AS sxy, count(*) AS n
                 FROM p GROUP BY 1, 2),
         m AS (SELECT u.i AS i, sum(CAST(u.x AS DECIMAL(28,12)))::DOUBLE AS sx FROM
                 (SELECT unnest(list_transform(range(0, len(v)), i ->
                    {'i': i, 'x': v[i+1]::DOUBLE})) AS u FROM e) t
               GROUP BY 1)
         SELECT a.i::BIGINT AS i, a.j::BIGINT AS j, a.n,
           round(a.sxy / a.n - (mi.sx / a.n) * (mj.sx / a.n), 6) + 0 AS cov
         FROM agg a JOIN m mi ON a.i = mi.i JOIN m mj ON a.j = mj.i
         ORDER BY i, j""",

    // ── round 7e ────────────────────────────────────────────────────────
    "q_rolling_corr" ->
      """WITH l AS (
           SELECT event_id, user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS value_lag
           FROM events),
         f AS (SELECT * FROM l WHERE value_lag IS NOT NULL),
         r AS (
           SELECT event_id, user_id,
             count(*) OVER w AS cnt,
             sum(CAST(value AS DECIMAL(28,6))) OVER w AS sx,
             sum(CAST(value_lag AS DECIMAL(28,6))) OVER w AS sy,
             sum(CAST(value * value AS DECIMAL(28,6))) OVER w AS sxx,
             sum(CAST(value_lag * value_lag AS DECIMAL(28,6))) OVER w AS syy,
             sum(CAST(value * value_lag AS DECIMAL(28,6))) OVER w AS sxy
           FROM f
           WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
         d AS (
           SELECT event_id, user_id, cnt::DOUBLE AS c,
             sx::DOUBLE AS sx, sy::DOUBLE AS sy, sxx::DOUBLE AS sxx,
             syy::DOUBLE AS syy, sxy::DOUBLE AS sxy
           FROM r)
         SELECT event_id, user_id,
           CASE WHEN c >= 2 AND c * sxx - sx * sx > 0 AND c * syy - sy * sy > 0
             THEN round((c * sxy - sx * sy) /
               (sqrt(c * sxx - sx * sx) * sqrt(c * syy - sy * sy)), 6) + 0
           END AS roll_corr
         FROM d ORDER BY event_id""",

    "q_minmax_scale" ->
      """WITH ext AS (
           SELECT event_type, min(value) AS mn, max(value) AS mx
           FROM events GROUP BY event_type)
         SELECT event_id, e.event_type, value,
           CASE WHEN mx <> mn THEN round((value - mn) / (mx - mn), 9) + 0 END AS scaled
         FROM events e JOIN ext USING (event_type)
         ORDER BY event_id""",

    "q_onehot" ->
      """SELECT c_custkey,
           (c_mktsegment = 'AUTOMOBILE')::BIGINT AS is_automobile,
           (c_mktsegment = 'BUILDING')::BIGINT AS is_building,
           (c_mktsegment = 'FURNITURE')::BIGINT AS is_furniture,
           (c_mktsegment = 'HOUSEHOLD')::BIGINT AS is_household,
           (c_mktsegment = 'MACHINERY')::BIGINT AS is_machinery
         FROM customer ORDER BY c_custkey""",

    "q_feature_hash" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         b AS (
           SELECT doc_id,
             ('0x' || substr(md5(token), 1, 8))::BIGINT % 256 AS bucket
           FROM tok),
         c AS (SELECT doc_id, bucket, count(*) AS cnt FROM b GROUP BY doc_id, bucket)
         SELECT doc_id,
           string_agg(lpad(bucket::VARCHAR, 4, '0') || ':' || cnt, ' '
             ORDER BY lpad(bucket::VARCHAR, 4, '0') || ':' || cnt) AS features,
           count(DISTINCT bucket) AS n_buckets
         FROM c GROUP BY doc_id ORDER BY doc_id""",

    "q_degree_dist" ->
      """WITH e0 AS (
           SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         sym AS (SELECT cust AS u, supp AS v FROM e0
                 UNION SELECT supp, cust FROM e0),
         d AS (SELECT u, count(*) AS degree FROM sym WHERE u <> v GROUP BY u)
         SELECT degree, count(*) AS n_nodes FROM d
         GROUP BY degree ORDER BY degree""",

    "q_cdc_apply" ->
      """WITH cust AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
         changes AS (
           SELECT c_custkey, 'U' AS op, 2 AS version, c_name,
             c_acctbal + 50.0 AS c_acctbal
           FROM cust WHERE c_custkey % 5 = 0
           UNION ALL
           SELECT c_custkey, 'D', 3, c_name, c_acctbal
           FROM cust WHERE c_custkey % 11 = 0
           UNION ALL
           SELECT c_custkey, 'U', 3, c_name, c_acctbal + 999.0
           FROM cust WHERE c_custkey % 11 = 0 AND c_custkey % 2 = 0
           UNION ALL
           SELECT c_custkey + 500000, 'I', 1, c_name || '_new', c_acctbal
           FROM cust WHERE c_custkey % 13 = 0),
         latest AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY c_custkey
               ORDER BY version DESC,
                 CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 ELSE 1 END DESC) AS rn
             FROM changes)
           WHERE rn = 1)
         SELECT c_custkey, c_name, c_acctbal FROM cust
         WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
         UNION ALL
         SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op <> 'D'
         ORDER BY c_custkey""",

    "q_pop_change" ->
      """WITH m AS (
           SELECT o_orderpriority,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS period,
             sum(CAST(o_totalprice AS DECIMAL(28,4)))::DOUBLE AS revenue
           FROM orders GROUP BY o_orderpriority, period),
         l AS (
           SELECT *, lag(revenue) OVER (PARTITION BY o_orderpriority ORDER BY period) AS prev_revenue
           FROM m)
         SELECT o_orderpriority, period, revenue, prev_revenue,
           round(revenue - prev_revenue, 4) + 0 AS abs_change,
           CASE WHEN prev_revenue <> 0 THEN round((revenue - prev_revenue) / prev_revenue, 9) + 0 END AS pct_change
         FROM l ORDER BY o_orderpriority, period""",

    "q_bfs_2hop" ->
      """WITH e0 AS (
           SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         sym AS (SELECT cust AS u, supp AS v FROM e0
                 UNION SELECT supp, cust FROM e0),
         h0 AS (SELECT DISTINCT cust AS id FROM e0 WHERE cust < 10),
         h1 AS (SELECT DISTINCT v AS id FROM sym JOIN h0 ON u = h0.id),
         h2 AS (SELECT DISTINCT v AS id FROM sym JOIN h1 ON u = h1.id),
         allh AS (
           SELECT id, 0 AS hop FROM h0
           UNION ALL SELECT id, 1 FROM h1
           UNION ALL SELECT id, 2 FROM h2)
         SELECT id, min(hop) AS hop FROM allh GROUP BY id ORDER BY id""",

    "q_max_of_agg" ->
      """WITH rev AS (
           SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY l_suppkey)
         SELECT l_suppkey, total_revenue FROM rev
         WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         ORDER BY l_suppkey""",

    "q_correlated_avg" ->
      """WITH a AS (
           SELECT l_partkey,
             sum(CAST(l_quantity AS DECIMAL(28,4)))::DOUBLE / count(l_quantity) AS avg_qty
           FROM lineitem GROUP BY l_partkey)
         SELECT sum(CAST(l_extendedprice AS DECIMAL(28,4)))::DOUBLE AS small_lot_revenue,
           count(*) AS n_lines
         FROM lineitem l JOIN a USING (l_partkey)
         WHERE l_quantity < 0.2 * avg_qty""",

    "q_semi_having" ->
      """WITH big AS (
           SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(28,2)))::DOUBLE AS total_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING sum(CAST(l_quantity AS DECIMAL(28,2)))::DOUBLE > 300.0)
         SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_totalprice, total_qty
         FROM orders JOIN big ON o_orderkey = l_orderkey
           JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",

    "q_dominant_supplier" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(28,2)))::DOUBLE AS supp_qty
           FROM lineitem GROUP BY l_partkey, l_suppkey),
         pt AS (
           SELECT l_partkey, sum(CAST(supp_qty AS DECIMAL(28,2)))::DOUBLE AS part_qty,
             count(*) AS n_supps
           FROM ps GROUP BY l_partkey)
         SELECT l_partkey, l_suppkey, supp_qty, part_qty, n_supps
         FROM ps JOIN pt USING (l_partkey)
         WHERE n_supps >= 2 AND supp_qty * n_supps > part_qty * 3.0
         ORDER BY l_partkey, l_suppkey""",

    "q_sole_return_supplier" ->
      """WITH st AS (
           SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp
           FROM lineitem GROUP BY l_orderkey),
         r AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
         SELECT l_suppkey, count(*) AS numwait
         FROM r JOIN st USING (l_orderkey)
         WHERE n_supp >= 2 AND n_r_supp = 1
         GROUP BY l_suppkey
         ORDER BY numwait DESC, l_suppkey""",

    // Brute-force FULL diff — the blocked plan must reproduce it exactly
    // (digest-pruning losslessness proof by hash, the q_fuzzy_join pattern).
    "q_block_diff" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
         repl AS (
           SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 6 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END AS c_acctbal
           FROM base WHERE c_custkey % 11 <> 0
           UNION ALL
           SELECT c_custkey + 2000000, c_name, c_acctbal FROM base WHERE c_custkey < 50)
         SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
           ('0x' || substr(md5(coalesce(o.c_custkey, n.c_custkey)::VARCHAR), 1, 8))::BIGINT % 64 AS block,
           CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           o.c_name AS old_c_name, o.c_acctbal AS old_c_acctbal,
           n.c_name AS new_c_name, n.c_acctbal AS new_c_acctbal
         FROM base o FULL OUTER JOIN repl n ON o.c_custkey = n.c_custkey
         WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
            OR o.c_name IS DISTINCT FROM n.c_name
            OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
         ORDER BY c_custkey""",

    "q_markov_chain" ->
      """WITH seq AS (
           SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
           FROM events),
         tr AS (
           SELECT event_type, next_type, count(*) AS transitions
           FROM seq WHERE next_type IS NOT NULL
           GROUP BY event_type, next_type)
         SELECT event_type, next_type, transitions,
           (sum(transitions) OVER (PARTITION BY event_type))::BIGINT AS from_total
         FROM tr ORDER BY event_type, next_type""",

    "q_group_ols" ->
      """WITH pts AS (
           SELECT event_type, value,
             (CAST(floor(epoch(ts) / 3600) AS BIGINT) - 473352)::DOUBLE AS x
           FROM events),
         st AS (
           SELECT event_type, count(*)::DOUBLE AS n,
             sum(CAST(x AS DECIMAL(28,6)))::DOUBLE AS sx,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS sy,
             sum(CAST(x * value AS DECIMAL(28,6)))::DOUBLE AS sxy,
             sum(CAST(x * x AS DECIMAL(28,6)))::DOUBLE AS sxx
           FROM pts GROUP BY event_type)
         SELECT event_type, n::BIGINT AS n,
           CASE WHEN n >= 2 AND (n*sxx - sx*sx) <> 0
                THEN round((n*sxy - sx*sy) / (n*sxx - sx*sx), 9) + 0 END AS slope,
           CASE WHEN n >= 2 AND (n*sxx - sx*sx) <> 0
                THEN round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) + 0 END AS intercept
         FROM st ORDER BY event_type""",

    "q_user_paths" ->
      """WITH r AS (
           SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         p AS (
           SELECT user_id, concat_ws('>',
             max(CASE WHEN rn = 1 THEN event_type END),
             max(CASE WHEN rn = 2 THEN event_type END),
             max(CASE WHEN rn = 3 THEN event_type END)) AS path
           FROM r WHERE rn <= 3 GROUP BY user_id)
         SELECT path, count(*) AS n_users FROM p
         GROUP BY path ORDER BY n_users DESC, path LIMIT 20""",

    "q_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           AND sn.n_name <> cn.n_name
         GROUP BY supp_nation, cust_nation, l_year
         ORDER BY supp_nation, cust_nation, l_year""",

    "q_embed_pool" ->
      """WITH x AS (
           SELECT vec_id % 50 AS group_id, dim, (embedding::DOUBLE[])[dim] AS v
           FROM embeddings CROSS JOIN range(1, 65) r(dim)),
         a AS (
           SELECT group_id, dim,
             sum(CAST(v AS DECIMAL(28,8)))::DOUBLE / count(v) AS avg_v,
             count(v) AS cnt
           FROM x GROUP BY group_id, dim)
         SELECT group_id, max(cnt)::BIGINT AS n_vectors,
           string_agg(lpad(dim::VARCHAR, 4, '0') || ':' ||
             CAST(round(avg_v * 1e6) AS BIGINT)::VARCHAR, ' ' ORDER BY dim) AS pooled_micro
         FROM a GROUP BY group_id ORDER BY group_id""",

    "q_pit_join" ->
      """WITH cur AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
         nxt AS (
           SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN 'ARCHIVE' ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
           FROM customer WHERE c_custkey % 97 <> 0
           UNION ALL
           SELECT c_custkey + 900000, c_mktsegment, c_acctbal
           FROM customer WHERE c_custkey % 101 = 0),
         j AS (
           SELECT coalesce(o.c_custkey, n.c_custkey) AS k,
             o.c_custkey IS NOT NULL AS in_o, n.c_custkey IS NOT NULL AS in_n,
             o.c_mktsegment AS seg_o, o.c_acctbal AS bal_o,
             n.c_mktsegment AS seg_n, n.c_acctbal AS bal_n,
             (o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
               AND o.c_mktsegment = n.c_mktsegment AND o.c_acctbal = n.c_acctbal) AS same
           FROM cur o FULL OUTER JOIN nxt n ON o.c_custkey = n.c_custkey),
         hist AS (
           SELECT k AS c_custkey, seg_o AS c_mktsegment, bal_o AS c_acctbal,
             '1995-01-01' AS valid_from,
             CASE WHEN same THEN NULL ELSE '1998-01-01' END AS valid_to
           FROM j WHERE in_o
           UNION ALL
           SELECT k, seg_n, bal_n, '1998-01-01', NULL
           FROM j WHERE in_n AND NOT coalesce(same, false)),
         facts AS (
           SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
           FROM orders WHERE o_orderkey % 100 = 0)
         SELECT f.o_orderkey, f.o_custkey, f.o_date,
           h.c_mktsegment, h.c_acctbal, h.valid_from
         FROM facts f LEFT JOIN hist h ON f.o_custkey = h.c_custkey
           AND h.valid_from <= f.o_date
           AND (h.valid_to IS NULL OR f.o_date < h.valid_to)
         ORDER BY o_orderkey""",

    "q_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
           sum(CAST(CASE WHEN c_mktsegment = 'BUILDING'
                 THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
               AS DECIMAL(28,6)))::DOUBLE AS building_rev,
           sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE AS total_rev,
           round(sum(CAST(CASE WHEN c_mktsegment = 'BUILDING'
                 THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
               AS DECIMAL(28,6)))::DOUBLE
             / sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE,
             9) + 0 AS mkt_share
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY o_year ORDER BY o_year""",

    "q_disjunctive" ->
      """SELECT sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))::DOUBLE AS revenue,
           count(*) AS n_rows
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
            OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 25)""",

    // Brute-force id-ordered triple join: counts each triangle once at its
    // minimum-id corner; the Spark side orients by degree instead, but the
    // triangle SET (and hence every per-node count) is identical.
    "q_triangles" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         e AS (SELECT DISTINCT l.i AS a, r.i AS b2
               FROM items l JOIN items r ON l.b = r.b AND l.i < r.i),
         tri AS (
           SELECT e1.a AS x, e1.b2 AS y, e2.b2 AS z
           FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b2 < e2.b2
           JOIN e e3 ON e3.a = e1.b2 AND e3.b2 = e2.b2),
         pernode AS (
           SELECT node_id, count(*) AS triangles
           FROM (SELECT unnest([x, y, z]) AS node_id FROM tri)
           GROUP BY node_id)
         SELECT rank, node_id, triangles FROM (
           SELECT node_id, triangles,
             row_number() OVER (ORDER BY triangles DESC, node_id ASC) AS rank
           FROM pernode)
         WHERE rank <= 20 ORDER BY rank""",

    // Same brute-force triangle CTEs as q_triangles, extended with the
    // degree table; coefficient is one double division on exact counts.
    "q_clustering_coef" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         e AS (SELECT DISTINCT l.i AS a, r.i AS b2
               FROM items l JOIN items r ON l.b = r.b AND l.i < r.i),
         deg AS (SELECT id, count(*) AS degree FROM (
             SELECT a AS id FROM e UNION ALL SELECT b2 AS id FROM e)
           GROUP BY id),
         tri AS (
           SELECT e1.a AS x, e1.b2 AS y, e2.b2 AS z
           FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b2 < e2.b2
           JOIN e e3 ON e3.a = e1.b2 AND e3.b2 = e2.b2),
         pernode AS (
           SELECT node_id, count(*) AS triangles
           FROM (SELECT unnest([x, y, z]) AS node_id FROM tri)
           GROUP BY node_id)
         SELECT d.id AS node_id, d.degree,
           coalesce(p.triangles, 0)::BIGINT AS triangles,
           round((2 * coalesce(p.triangles, 0))::DOUBLE /
                 (d.degree * (d.degree - 1))::DOUBLE, 6) + 0 AS clustering
         FROM deg d LEFT JOIN pernode p ON d.id = p.node_id
         WHERE d.degree >= 2 ORDER BY node_id""",

    "q_assortativity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         e AS (SELECT DISTINCT l.i AS a, r.i AS b2
               FROM items l JOIN items r ON l.b = r.b AND l.i < r.i),
         deg AS (SELECT id, count(*) AS degree FROM (
             SELECT a AS id FROM e UNION ALL SELECT b2 AS id FROM e)
           GROUP BY id),
         dir AS (SELECT a AS u, b2 AS v FROM e UNION ALL SELECT b2 AS u, a AS v FROM e),
         j AS (SELECT du.degree AS x, dv.degree AS y
               FROM dir JOIN deg du ON dir.u = du.id JOIN deg dv ON dir.v = dv.id),
         a AS (SELECT count(*) AS n, sum(x)::HUGEINT AS sx,
                 sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
               FROM j)
         SELECT (n // 2)::BIGINT AS n_edges,
           CASE WHEN n::HUGEINT * sxx - sx * sx <> 0 THEN
             round((n::HUGEINT * sxy - sx * sx)::DOUBLE /
                   (n::HUGEINT * sxx - sx * sx)::DOUBLE, 6) + 0
           END AS assortativity
         FROM a""",

    "q_rich_club" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         e AS (SELECT DISTINCT l.i AS a, r.i AS b2
               FROM items l JOIN items r ON l.b = r.b AND l.i < r.i),
         deg AS (SELECT id, count(*) AS degree FROM (
             SELECT a AS id FROM e UNION ALL SELECT b2 AS id FROM e)
           GROUP BY id),
         ks AS (SELECT unnest([64, 128, 160, 192])::BIGINT AS k),
         nk AS (SELECT k, count(*) AS n_nodes FROM deg CROSS JOIN ks
                WHERE degree > k GROUP BY k),
         ek AS (SELECT k, count(*) AS n_edges
                FROM e JOIN deg da ON e.a = da.id JOIN deg db ON e.b2 = db.id
                CROSS JOIN ks
                WHERE least(da.degree, db.degree) > k GROUP BY k)
         SELECT ks.k, coalesce(nk.n_nodes, 0)::BIGINT AS n_nodes,
           coalesce(ek.n_edges, 0)::BIGINT AS n_edges,
           CASE WHEN coalesce(nk.n_nodes, 0) >= 2 THEN
             round((2 * coalesce(ek.n_edges, 0))::DOUBLE /
               (coalesce(nk.n_nodes, 0) * (coalesce(nk.n_nodes, 0) - 1))::DOUBLE, 6) + 0
           END AS phi
         FROM ks LEFT JOIN nk ON ks.k = nk.k LEFT JOIN ek ON ks.k = ek.k
         ORDER BY ks.k""",

    // 3 unrolled LPA rounds; sym MATERIALIZED (referenced every round —
    // plain inlining re-derives the basket self-join per reference, the
    // q_kcore lesson).
    "q_label_prop" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         e0 AS (SELECT DISTINCT l.i AS a, r.i AS b2
                FROM items l JOIN items r ON l.b = r.b AND l.i < r.i),
         sym AS MATERIALIZED (
           SELECT a AS s, b2 AS d FROM e0 UNION SELECT b2, a FROM e0),
         l0 AS (SELECT DISTINCT s AS id, s AS lbl FROM sym),
         c1 AS (SELECT sym.s AS id, l0.lbl AS nl, count(*) AS c
                FROM sym JOIN l0 ON sym.d = l0.id GROUP BY 1, 2),
         l1 AS (SELECT id, (min({'nc': -c, 'l': nl})).l AS lbl
                FROM c1 GROUP BY id),
         c2 AS (SELECT sym.s AS id, l1.lbl AS nl, count(*) AS c
                FROM sym JOIN l1 ON sym.d = l1.id GROUP BY 1, 2),
         l2 AS (SELECT id, (min({'nc': -c, 'l': nl})).l AS lbl
                FROM c2 GROUP BY id),
         c3 AS (SELECT sym.s AS id, l2.lbl AS nl, count(*) AS c
                FROM sym JOIN l2 ON sym.d = l2.id GROUP BY 1, 2),
         l3 AS (SELECT id, (min({'nc': -c, 'l': nl})).l AS lbl
                FROM c3 GROUP BY id)
         SELECT id, lbl AS community FROM l3 ORDER BY id""",

    // Hash parity: Spark's Portable.hash32 = first 8 md5 hex chars as a
    // 32-bit unsigned value; '_<step>_'-delimited key strings format
    // identically for BIGINTs in both engines. 3 unrolled hops; sym
    // MATERIALIZED (the q_label_prop convention).
    "q_walks" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         e0 AS (SELECT DISTINCT l.i AS a, r.i AS b2
                FROM items l JOIN items r ON l.b = r.b AND l.i < r.i),
         sym AS MATERIALIZED (
           SELECT a AS s, b2 AS d FROM e0 UNION SELECT b2, a FROM e0),
         s0 AS (SELECT DISTINCT s AS seed FROM sym WHERE s < 50),
         w1 AS (SELECT s0.seed,
             (min({'h': ('0x' || substr(md5(s0.seed::VARCHAR || '_1_' || sym.d::VARCHAR), 1, 8))::BIGINT,
                   'v': sym.d})).v AS node
           FROM sym JOIN s0 ON sym.s = s0.seed GROUP BY s0.seed),
         w2 AS (SELECT w1.seed,
             (min({'h': ('0x' || substr(md5(w1.seed::VARCHAR || '_2_' || sym.d::VARCHAR), 1, 8))::BIGINT,
                   'v': sym.d})).v AS node
           FROM sym JOIN w1 ON sym.s = w1.node GROUP BY w1.seed),
         w3 AS (SELECT w2.seed,
             (min({'h': ('0x' || substr(md5(w2.seed::VARCHAR || '_3_' || sym.d::VARCHAR), 1, 8))::BIGINT,
                   'v': sym.d})).v AS node
           FROM sym JOIN w2 ON sym.s = w2.node GROUP BY w2.seed)
         SELECT seed, 0::BIGINT AS step, seed AS node FROM s0
         UNION ALL SELECT seed, 1, node FROM w1
         UNION ALL SELECT seed, 2, node FROM w2
         UNION ALL SELECT seed, 3, node FROM w3
         ORDER BY seed, step""",

    "q_token_entropy" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
         agg AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
             sum(CAST(c::DOUBLE * ln(c::DOUBLE) AS DECIMAL(28,12)))::DOUBLE AS clogc
           FROM cnt GROUP BY doc_id)
         SELECT doc_id, n_tokens, n_distinct,
           round(ln(n_tokens::DOUBLE) - clogc / n_tokens::DOUBLE, 6) + 0 AS entropy
         FROM agg ORDER BY doc_id""",

    "q_weighted_sample" ->
      """WITH w AS (
           SELECT doc_id, lang, n_chars,
             -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE + 0.5)
                 / 4294967296.0) / n_chars::DOUBLE AS p
           FROM documents),
         r AS (SELECT doc_id, lang, n_chars, p,
             row_number() OVER (PARTITION BY lang ORDER BY p ASC, doc_id ASC) AS sample_rank
           FROM w)
         SELECT lang, sample_rank, doc_id, n_chars, round(p, 9) + 0 AS priority
         FROM r WHERE sample_rank <= 20 ORDER BY lang, sample_rank""",

    "q_matryoshka" ->
      """WITH comp AS (
           SELECT vec_id, dim::BIGINT AS dim, (embedding::DOUBLE[])[dim] AS v
           FROM embeddings CROSS JOIN range(1, 9) r(dim)),
         n AS (SELECT vec_id, sqrt(sum(CAST(v * v AS DECIMAL(28,12)))::DOUBLE) AS nrm
               FROM comp GROUP BY vec_id)
         SELECT c.vec_id, c.dim, round(c.v / n.nrm, 6) + 0 AS value
         FROM comp c JOIN n ON c.vec_id = n.vec_id
         ORDER BY c.vec_id, c.dim""",

    // BM25 and unigram-LM CTEs are verbatim copies of their own oracles
    // (q_bm25 / q_unigram_logprob — both independently hash-checked), so
    // any fusion mismatch isolates to the RRF arithmetic itself.
    "q_rrf_fuse" -> {
      val (k1, b) = (1.2, 0.75)
      val terms = Bm25Terms.map("'" + _ + "'").mkString(", ")
      raw"""WITH dl AS (
           SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS dl
           FROM documents),
         tot AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
         tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
                WHERE token IN ($terms) GROUP BY 1, 2),
         dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         bm AS (
           SELECT t.doc_id,
             round(sum(CAST(
               ln(1.0 + (tot.n::DOUBLE - f.df::DOUBLE + 0.5) / (f.df::DOUBLE + 0.5))
                 * ((t.tf::DOUBLE * ${k1 + 1.0}) /
                    (t.tf::DOUBLE + $k1 * (1.0 - $b + $b * (d.dl::DOUBLE / (tot.sumdl::DOUBLE / tot.n::DOUBLE)))))
               AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS bm25
           FROM tf t
           JOIN dfreq f ON t.token = f.token
           JOIN dl d ON t.doc_id = d.doc_id
           CROSS JOIN tot
           GROUP BY t.doc_id),
         bmr AS (SELECT doc_id, rank FROM (
             SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
             FROM bm) WHERE rank <= 100),
         model AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
         tot2 AS (SELECT sum(c) AS total, count(*) AS vocab FROM model),
         lm AS (
           SELECT t.doc_id,
             round(sum(CAST(ln((m.c::DOUBLE + 1.0) / (tot2.total + tot2.vocab)::DOUBLE)
                   AS DECIMAL(28,12)))::DOUBLE / count(*), 6) + 0 AS logprob
           FROM tok t JOIN model m ON t.token = m.token CROSS JOIN tot2
           GROUP BY t.doc_id),
         lmr AS (SELECT doc_id, rank FROM (
             SELECT doc_id, row_number() OVER (ORDER BY logprob DESC, doc_id ASC) AS rank
             FROM lm) WHERE rank <= 100),
         contrib AS (
           SELECT doc_id, 1.0 / (60 + rank) AS c FROM bmr
           UNION ALL
           SELECT doc_id, 1.0 / (60 + rank) FROM lmr),
         fused AS (
           SELECT doc_id, round(sum(CAST(c AS DECIMAL(28,12)))::DOUBLE, 9) + 0 AS rrf,
             count(*) AS n_lists
           FROM contrib GROUP BY 1)
         SELECT row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank,
           doc_id, rrf, n_lists
         FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 20"""
    },

    // Same bmr/lmr list derivations as q_rrf_fuse; p and 1−p are
    // interpolated from the SAME Scala doubles the query uses
    // (Double.toString round-trips exactly — the q_bm25 constant rule).
    "q_rbo" -> {
      val (k1, b, p, depth) = (1.2, 0.75, 0.9, 100)
      val terms = Bm25Terms.map("'" + _ + "'").mkString(", ")
      raw"""WITH dl AS (
           SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS dl
           FROM documents),
         tot AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
         tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
                WHERE token IN ($terms) GROUP BY 1, 2),
         dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         bm AS (
           SELECT t.doc_id,
             round(sum(CAST(
               ln(1.0 + (tot.n::DOUBLE - f.df::DOUBLE + 0.5) / (f.df::DOUBLE + 0.5))
                 * ((t.tf::DOUBLE * ${k1 + 1.0}) /
                    (t.tf::DOUBLE + $k1 * (1.0 - $b + $b * (d.dl::DOUBLE / (tot.sumdl::DOUBLE / tot.n::DOUBLE)))))
               AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS bm25
           FROM tf t
           JOIN dfreq f ON t.token = f.token
           JOIN dl d ON t.doc_id = d.doc_id
           CROSS JOIN tot
           GROUP BY t.doc_id),
         bmr AS (SELECT doc_id, rank FROM (
             SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
             FROM bm) WHERE rank <= $depth),
         model AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
         tot2 AS (SELECT sum(c) AS total, count(*) AS vocab FROM model),
         lm AS (
           SELECT t.doc_id,
             round(sum(CAST(ln((m.c::DOUBLE + 1.0) / (tot2.total + tot2.vocab)::DOUBLE)
                   AS DECIMAL(28,12)))::DOUBLE / count(*), 6) + 0 AS logprob
           FROM tok t JOIN model m ON t.token = m.token CROSS JOIN tot2
           GROUP BY t.doc_id),
         lmr AS (SELECT doc_id, rank FROM (
             SELECT doc_id, row_number() OVER (ORDER BY logprob DESC, doc_id ASC) AS rank
             FROM lm) WHERE rank <= $depth),
         ks AS (SELECT unnest(range(1, ${depth + 1})) AS k),
         ent AS (SELECT greatest(br.rank, lr.rank) AS k0
                 FROM bmr br JOIN lmr lr ON br.doc_id = lr.doc_id
                 WHERE greatest(br.rank, lr.rank) <= $depth),
         cnt AS (SELECT k0, count(*) AS c FROM ent GROUP BY 1),
         xk AS (SELECT k, sum(coalesce(cnt.c, 0)) OVER (ORDER BY k) AS x
                FROM ks LEFT JOIN cnt ON ks.k = cnt.k0)
         SELECT $depth::BIGINT AS depth,
           max(CASE WHEN k = $depth THEN x END)::BIGINT AS overlap_at_depth,
           round(${1.0 - p} * sum(CAST(power($p, k::DOUBLE - 1.0) * (x::DOUBLE / k::DOUBLE)
               AS DECIMAL(28,12)))::DOUBLE
             + power($p, ${depth.toDouble}) *
               (max(CASE WHEN k = $depth THEN x END)::DOUBLE / ${depth.toDouble}), 6) + 0 AS rbo
         FROM xk"""
    },

    // Shared ranking CTEs with q_rbo; ln-only discount shape (log2
    // differs in ulps across engines, ln does not).
    "q_ndcg" -> {
      val (k1, b, k, depth) = (1.2, 0.75, 50, 100)
      val terms = Bm25Terms.map("'" + _ + "'").mkString(", ")
      raw"""WITH dl AS (
           SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS dl
           FROM documents),
         tot AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
         tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
                WHERE token IN ($terms) GROUP BY 1, 2),
         dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         bm AS (
           SELECT t.doc_id,
             round(sum(CAST(
               ln(1.0 + (tot.n::DOUBLE - f.df::DOUBLE + 0.5) / (f.df::DOUBLE + 0.5))
                 * ((t.tf::DOUBLE * ${k1 + 1.0}) /
                    (t.tf::DOUBLE + $k1 * (1.0 - $b + $b * (d.dl::DOUBLE / (tot.sumdl::DOUBLE / tot.n::DOUBLE)))))
               AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS bm25
           FROM tf t
           JOIN dfreq f ON t.token = f.token
           JOIN dl d ON t.doc_id = d.doc_id
           CROSS JOIN tot
           GROUP BY t.doc_id),
         bmr AS (SELECT doc_id, rank FROM (
             SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
             FROM bm) WHERE rank <= $depth),
         model AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
         tot2 AS (SELECT sum(c) AS total, count(*) AS vocab FROM model),
         lm AS (
           SELECT t.doc_id,
             round(sum(CAST(ln((m.c::DOUBLE + 1.0) / (tot2.total + tot2.vocab)::DOUBLE)
                   AS DECIMAL(28,12)))::DOUBLE / count(*), 6) + 0 AS logprob
           FROM tok t JOIN model m ON t.token = m.token CROSS JOIN tot2
           GROUP BY t.doc_id),
         rels AS (SELECT doc_id, 5 - (rank - 1) // 20 AS rel FROM (
             SELECT doc_id, row_number() OVER (ORDER BY logprob DESC, doc_id ASC) AS rank
             FROM lm) WHERE rank <= $depth),
         sys AS (SELECT br.rank, coalesce(r.rel, 0) AS rel
                 FROM bmr br LEFT JOIN rels r ON br.doc_id = r.doc_id
                 WHERE br.rank <= $k),
         d AS (SELECT sum(CAST((power(2.0, rel::DOUBLE) - 1.0) * ln(2.0)
                 / ln(rank::DOUBLE + 1.0) AS DECIMAL(28,12)))::DOUBLE AS dcg FROM sys),
         ip AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id ASC) AS pos
                FROM rels QUALIFY pos <= $k),
         i AS (SELECT sum(CAST((power(2.0, rel::DOUBLE) - 1.0) * ln(2.0)
                 / ln(pos::DOUBLE + 1.0) AS DECIMAL(28,12)))::DOUBLE AS idcg FROM ip)
         SELECT $k::BIGINT AS k,
           round(dcg, 6) + 0 AS dcg,
           round(idcg, 6) + 0 AS idcg,
           CASE WHEN idcg > 0 THEN round(dcg / idcg, 6) + 0 END AS ndcg
         FROM d CROSS JOIN i"""
    },

    // Shared bm CTE with q_bm25's own oracle; relevance re-derived from
    // the same tf table (>= 2 distinct terms, even ids); all metric
    // numerators/denominators exact integers, AP terms decimal-summed.
    "q_retrieval_metrics" -> {
      val (k1, b, k, depth) = (1.2, 0.75, 20, 100)
      val terms = Bm25Terms.map("'" + _ + "'").mkString(", ")
      raw"""WITH dl AS (
           SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS dl
           FROM documents),
         tot AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
         tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
                WHERE token IN ($terms) GROUP BY 1, 2),
         dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         bm AS (
           SELECT t.doc_id,
             round(sum(CAST(
               ln(1.0 + (tot.n::DOUBLE - f.df::DOUBLE + 0.5) / (f.df::DOUBLE + 0.5))
                 * ((t.tf::DOUBLE * ${k1 + 1.0}) /
                    (t.tf::DOUBLE + $k1 * (1.0 - $b + $b * (d.dl::DOUBLE / (tot.sumdl::DOUBLE / tot.n::DOUBLE)))))
               AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS bm25
           FROM tf t
           JOIN dfreq f ON t.token = f.token
           JOIN dl d ON t.doc_id = d.doc_id
           CROSS JOIN tot
           GROUP BY t.doc_id),
         bmr AS (SELECT doc_id, rank FROM (
             SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
             FROM bm) WHERE rank <= $depth),
         rels AS (SELECT doc_id FROM tf WHERE doc_id % 2 = 0
                  GROUP BY doc_id HAVING count(*) >= 2),
         ann AS (SELECT br.rank, CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
                 FROM bmr br LEFT JOIN rels r ON br.doc_id = r.doc_id),
         cum AS (SELECT rank, rel, sum(rel) OVER (ORDER BY rank) AS cum FROM ann),
         sys AS (SELECT min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
                   max(CASE WHEN rank <= $k THEN cum END) AS relk,
                   sum(CASE WHEN rel = 1 AND rank <= $k
                     THEN CAST(cum::DOUBLE / rank::DOUBLE AS DECIMAL(28,12)) END)::DOUBLE AS psum
                 FROM cum),
         nr AS (SELECT count(*) AS nrel FROM rels)
         SELECT $k::BIGINT AS k, nrel AS n_rel,
           CASE WHEN first_rel IS NOT NULL THEN round(1.0 / first_rel::DOUBLE, 6) + 0 END AS mrr,
           round(coalesce(relk, 0)::DOUBLE / ${k.toDouble}, 6) + 0 AS p_at_k,
           CASE WHEN nrel > 0 THEN round(coalesce(relk, 0)::DOUBLE / nrel::DOUBLE, 6) + 0 END AS r_at_k,
           CASE WHEN nrel > 0
             THEN round(coalesce(psum, 0.0) / least(nrel, $k)::DOUBLE, 6) + 0 END AS ap_at_k
         FROM sys CROSS JOIN nr"""
    },

    // Window replication of the dominance rule (integer compares only);
    // a NOT EXISTS brute-force of the same predicate was verified equal
    // during development — the windows ARE the skyline.
    "q_skyline" ->
      raw"""WITH p AS (
           SELECT doc_id, source,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS n_tokens,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> '')))::BIGINT AS n_distinct
           FROM documents),
         w AS (
           SELECT doc_id, source, n_tokens, n_distinct,
             max(n_distinct) OVER (PARTITION BY source ORDER BY n_tokens DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_gt,
             max(n_distinct) OVER (PARTITION BY source, n_tokens) AS mx_eq
           FROM p)
         SELECT doc_id, source, n_tokens, n_distinct FROM w
         WHERE (mx_gt IS NULL OR mx_gt < n_distinct) AND n_distinct = mx_eq
         ORDER BY source, n_tokens DESC, doc_id""",

    // Same exact-decimal moment shape as q_rolling_corr's oracle; the
    // three lag fans are a window pass + UNION ALL.
    "q_acf" ->
      """WITH l AS (
           SELECT user_id, value,
             lag(value, 1) OVER w AS l1,
             lag(value, 2) OVER w AS l2,
             lag(value, 3) OVER w AS l3
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         p AS (
           SELECT user_id, 1::BIGINT AS lag, value AS x, l1 AS y FROM l WHERE l1 IS NOT NULL
           UNION ALL SELECT user_id, 2, value, l2 FROM l WHERE l2 IS NOT NULL
           UNION ALL SELECT user_id, 3, value, l3 FROM l WHERE l3 IS NOT NULL),
         m AS (SELECT user_id, lag, count(*) AS n,
             sum(CAST(x AS DECIMAL(28,6)))::DOUBLE AS sx,
             sum(CAST(y AS DECIMAL(28,6)))::DOUBLE AS sy,
             sum(CAST(x*x AS DECIMAL(28,6)))::DOUBLE AS sxx,
             sum(CAST(y*y AS DECIMAL(28,6)))::DOUBLE AS syy,
             sum(CAST(x*y AS DECIMAL(28,6)))::DOUBLE AS sxy
           FROM p GROUP BY 1, 2)
         SELECT user_id, lag, n,
           CASE WHEN n >= 2 AND n::DOUBLE*sxx - sx*sx > 0 AND n::DOUBLE*syy - sy*sy > 0
             THEN round((n::DOUBLE*sxy - sx*sy) /
               (sqrt(n::DOUBLE*sxx - sx*sx) * sqrt(n::DOUBLE*syy - sy*sy)), 6) + 0
           END AS acf
         FROM m ORDER BY user_id, lag""",

    // Same repeat-trade projection as q_kcore's e0; raw (unrounded)
    // decimal-summed score orders the top-k so the cut is exact in both
    // engines; supplier-key offset omitted (suppliers are not output).
    "q_adamic_adar" ->
      """WITH e AS (
           SELECT o_custkey AS cust, l_suppkey AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         deg AS (SELECT supp, count(*) AS d FROM e GROUP BY 1),
         w AS (SELECT a.cust AS id_a, b.cust AS id_b, deg.d
               FROM e a JOIN e b ON a.supp = b.supp AND a.cust < b.cust
               JOIN deg ON deg.supp = a.supp),
         sc AS (SELECT id_a, id_b, count(*) AS n_common,
                 sum(CAST(1.0 / ln(d::DOUBLE) AS DECIMAL(28,12)))::DOUBLE AS raw
                FROM w GROUP BY 1, 2)
         SELECT id_a, id_b, n_common, round(raw, 6) + 0 AS score
         FROM sc ORDER BY raw DESC, id_a, id_b LIMIT 50""",

    // Same per-position gram-hash SQL as q_winnow's oracle; boundary =
    // hash mod 64 = 0 after the gram's last char; spans via lag over the
    // cut list; the end-of-doc cut UNION-dedups when a content cut
    // already lands there (mirrored by the Scala pass).
    "q_cdc_chunks" ->
      raw"""WITH d AS (SELECT doc_id, '$CdcHeader' || text AS t FROM documents),
         cuts AS (
           SELECT doc_id, u.p + 7 AS cut
           FROM d CROSS JOIN LATERAL unnest(range(1, len(t) - 6)) AS u(p)
           WHERE ('0x' || substr(md5(substr(t, u.p, 8)), 1, 8))::BIGINT % 64 = 0),
         b AS (SELECT doc_id, cut FROM cuts UNION SELECT doc_id, len(t) FROM d),
         spans AS (
           SELECT doc_id,
             coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) + 1 AS s,
             cut AS e
           FROM b),
         chunks AS (
           SELECT sp.doc_id, md5(substr(d.t, sp.s, sp.e - sp.s + 1)) AS fp,
             sp.e - sp.s + 1 AS clen
           FROM spans sp JOIN d ON sp.doc_id = d.doc_id WHERE sp.e >= sp.s),
         dp AS (SELECT fp, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY fp)
         SELECT c.doc_id, count(*) AS n_chunks,
           sum(CASE WHEN dp.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
           sum(CASE WHEN dp.nd >= 2 THEN c.clen ELSE 0 END)::BIGINT AS dup_chars
         FROM chunks c JOIN dp ON c.fp = dp.fp
         GROUP BY c.doc_id ORDER BY c.doc_id""",

    // Same add-1 NB shapes: integer counts, ln-only terms decimal-summed,
    // argmax via the negated-score struct min (exact sign-bit flip).
    "q_nb_confusion" ->
      s"""$NbPredCte
         SELECT true_lang AS true_label, pred_lang AS pred_label, count(*) AS n_docs
         FROM pred GROUP BY 1, 2 ORDER BY 1, 2""",

    // Logistic regression (r20): the unrolled diagonal-Newton chain —
    // generated, see logregSql.
    "q_logreg" -> logregSql(64, 8, "0.1"),

    // Cohen's kappa over the SAME NB prediction CTE: agreement trace /
    // margin products, fixed-shape kappa.
    "q_cohens_kappa" ->
      s"""$NbPredCte,
         conf AS (SELECT true_lang, pred_lang, count(*)::BIGINT AS c
                  FROM pred GROUP BY 1, 2),
         agg AS (SELECT sum(c)::BIGINT AS n,
                   sum(CASE WHEN true_lang = pred_lang THEN c ELSE 0 END)::BIGINT AS agree
                 FROM conf),
         rt AS (SELECT true_lang AS lbl, sum(c)::BIGINT AS rt FROM conf GROUP BY 1),
         ct AS (SELECT pred_lang AS lbl, sum(c)::BIGINT AS ct FROM conf GROUP BY 1),
         pe2 AS (SELECT sum(rt.rt::DECIMAL(38,0) * ct.ct) AS p
                 FROM rt JOIN ct USING (lbl)),
         k AS (SELECT n, agree::DOUBLE / n::DOUBLE AS po,
                 p::DOUBLE / (n::DECIMAL(38,0) * n)::DOUBLE AS pe
               FROM agg CROSS JOIN pe2)
         SELECT n AS n_docs, round(po, 9) + 0 AS po, round(pe, 9) + 0 AS pe,
           CASE WHEN 1.0::DOUBLE - pe > 0 THEN round((po - pe) / (1.0::DOUBLE - pe), 9) + 0 END AS kappa
         FROM k""",

    // Mann-Whitney rank form: distinct-score groups, average ranks via
    // the cumulative-count window, all integers until the one final
    // division — engine-exact, no rounding on either side.
    "q_auc" ->
      raw"""WITH t AS (
           SELECT source, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT source,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE
               / len(toks)::DOUBLE AS sc,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM t WHERE len(toks) > 0),
         g AS (SELECT source, sc, count(*)::BIGINT AS cnt, sum(y)::BIGINT AS pos
               FROM s GROUP BY 1, 2),
         c AS (SELECT source, sc, cnt, pos,
                 coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY sc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
               FROM g),
         a AS (SELECT source,
                 sum(pos * (cumb * 2 + cnt + 1)) AS r2,
                 sum(cnt)::BIGINT AS n, sum(pos)::BIGINT AS n_pos
               FROM c GROUP BY source)
         SELECT source, n, n_pos,
           CASE WHEN n_pos > 0 AND n_pos < n
             THEN (r2 - n_pos * (n_pos + 1))::DOUBLE / ((n_pos * (n - n_pos))::DOUBLE * 2.0)
           END AS auc
         FROM a ORDER BY source""",

    // Same md5-bucket split rule as q_split_assign; symbolic bit-length
    // bins; add-1 shares; contributions decimal-summed.
    "q_psi" ->
      """WITH b AS (
           SELECT (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000) AS ref,
             CASE WHEN n_chars > 0 THEN length(bin(n_chars)) ELSE 0 END AS bin
           FROM documents),
         c AS (SELECT bin,
                 sum(CASE WHEN ref THEN 1 ELSE 0 END)::BIGINT AS ca,
                 sum(CASE WHEN NOT ref THEN 1 ELSE 0 END)::BIGINT AS cb
               FROM b GROUP BY bin),
         t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb, count(*)::BIGINT AS bins FROM c),
         sh AS (SELECT bin, ca AS n_ref, cb AS n_cur,
                  (ca + 1)::DOUBLE / (na + bins)::DOUBLE AS p,
                  (cb + 1)::DOUBLE / (nb + bins)::DOUBLE AS q
                FROM c CROSS JOIN t),
         co AS (SELECT bin, n_ref, n_cur, p, q, (p - q) * ln(p / q) AS contrib FROM sh),
         tot AS (SELECT sum(CAST(contrib AS DECIMAL(28,9)))::DOUBLE AS psi FROM co)
         SELECT bin, n_ref, n_cur,
           round(p, 9) + 0 AS p_ref, round(q, 9) + 0 AS p_cur,
           round(contrib, 9) + 0 AS contrib, round(psi, 9) + 0 AS psi
         FROM co CROSS JOIN tot ORDER BY bin""",

    // The sup gap compared as integer cross-products (decimal: O(N²)
    // magnitudes), divided ONCE at the end — engine-exact, unrounded.
    "q_ks_drift" ->
      """WITH base AS (SELECT source AS g, n_chars AS v FROM documents),
         cnts AS (SELECT g, v, count(*)::BIGINT AS cnt FROM base GROUP BY 1, 2),
         pv AS (SELECT v, count(*)::BIGINT AS tot FROM base GROUP BY 1),
         gt AS (SELECT g, count(*)::BIGINT AS ng FROM base GROUP BY 1),
         nn AS (SELECT count(*)::BIGINT AS n FROM base),
         grid AS (
           SELECT gt.g, gt.ng, pv.v, pv.tot, coalesce(c.cnt, 0) AS cnt
           FROM gt CROSS JOIN pv
           LEFT JOIN cnts c ON c.g = gt.g AND c.v = pv.v),
         cum AS (
           SELECT g, ng,
             sum(cnt) OVER (PARTITION BY g ORDER BY v)::BIGINT AS cg,
             sum(tot) OVER (PARTITION BY g ORDER BY v)::BIGINT AS call
           FROM grid),
         d AS (SELECT g, ng, n,
                 max(abs(cg::DECIMAL(38,0) * (n - ng) - (call - cg)::DECIMAL(38,0) * ng)) AS dnum
               FROM cum CROSS JOIN nn GROUP BY g, ng, n)
         SELECT g AS source, ng AS n,
           CASE WHEN ng > 0 AND ng < n
             THEN dnum::DOUBLE / (ng::DECIMAL(38,0) * (n - ng))::DOUBLE
           END AS ks_d
         FROM d ORDER BY source""",

    // The q_dup_matrix SimHash pair CTE + the Newman Q_c rollup: exact
    // integer counts, two divisions + one multiply as the only floating
    // steps, signed-portable round.
    "q_modularity" ->
      raw"""WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         h AS (SELECT doc_id,
             ('0x' || substr(md5('0|' || token), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5('0|' || token), 9, 8))::BIGINT AS h_hi
           FROM tok),
         bits AS (
           SELECT doc_id, b.bit,
             CASE WHEN (CASE WHEN b.bit < 32 THEN h_lo >> b.bit ELSE h_hi >> (b.bit - 32) END) & 1 = 1
               THEN 1 ELSE -1 END AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b),
         votes AS (SELECT doc_id, bit, sum(vote) AS vote_sum FROM bits GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
             sum(CASE WHEN vote_sum > 0
                   THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << bit END
                   ELSE 0 END)::BIGINT AS simhash
           FROM votes GROUP BY doc_id),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
               FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         lab AS (SELECT doc_id, lang FROM documents WHERE lang IS NOT NULL),
         tg AS (SELECT la.lang AS ca, lb.lang AS cb
                FROM p JOIN lab la ON p.id_a = la.doc_id
                       JOIN lab lb ON p.id_b = lb.doc_id),
         m AS (SELECT count(*)::BIGINT AS me FROM tg),
         degs AS (SELECT community, count(*)::BIGINT AS deg_sum
                  FROM (SELECT ca AS community FROM tg
                        UNION ALL SELECT cb FROM tg)
                  GROUP BY 1),
         intra AS (SELECT ca AS community, count(*)::BIGINT AS e_in
                   FROM tg WHERE ca = cb GROUP BY 1)
         SELECT d.community, coalesce(i.e_in, 0)::BIGINT AS e_in, d.deg_sum, m.me AS m_edges,
           round(coalesce(i.e_in, 0)::DOUBLE / me::DOUBLE
                 - (deg_sum::DOUBLE / (me * 2)::DOUBLE) * (deg_sum::DOUBLE / (me * 2)::DOUBLE),
             9) + 0 AS q_c
         FROM degs d LEFT JOIN intra i USING (community) CROSS JOIN m
         ORDER BY community""",

    // Same transition shape as q_markov_chain; −p·ln p decimal-summed
    // per row-state, rate = Σ pi·h decimal-summed.
    "q_markov_entropy" ->
      """WITH seq AS (
           SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
           FROM events),
         tr AS (SELECT event_type, next_type, count(*)::BIGINT AS t
                FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
         ft AS (SELECT event_type, t,
                  sum(t) OVER (PARTITION BY event_type)::BIGINT AS ftot
                FROM tr),
         hs AS (SELECT event_type, max(ftot)::BIGINT AS n_from,
                  sum(CAST(-(t::DOUBLE / ftot::DOUBLE) * ln(t::DOUBLE / ftot::DOUBLE)
                        AS DECIMAL(28,12)))::DOUBLE AS h
                FROM ft GROUP BY event_type),
         tot AS (SELECT sum(n_from)::BIGINT AS tot FROM hs),
         wp AS (SELECT event_type, n_from, n_from::DOUBLE / tot::DOUBLE AS pi, h
                FROM hs CROSS JOIN tot),
         rt AS (SELECT sum(CAST(pi * h AS DECIMAL(28,12)))::DOUBLE AS rate FROM wp)
         SELECT event_type, n_from, round(pi, 9) + 0 AS pi,
           round(h, 9) + 0 AS h_state, round(rate, 9) + 0 AS entropy_rate
         FROM wp CROSS JOIN rt ORDER BY event_type""",

    // Three −p·ln p sums over the label catalogs; fixed-shape
    // combinations (MI canonicalized — independence lands at ±1e−17).
    "q_cond_entropy" ->
      """WITH base AS (
           SELECT lang AS a, source AS b FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL),
         n AS (SELECT count(*)::BIGINT AS n FROM base),
         ha AS (SELECT sum(CAST(-(c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE)
                          AS DECIMAL(28,12)))::DOUBLE AS h
                FROM (SELECT a, count(*)::BIGINT AS c FROM base GROUP BY a) CROSS JOIN n),
         hb AS (SELECT sum(CAST(-(c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE)
                          AS DECIMAL(28,12)))::DOUBLE AS h
                FROM (SELECT b, count(*)::BIGINT AS c FROM base GROUP BY b) CROSS JOIN n),
         hj AS (SELECT sum(CAST(-(c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE)
                          AS DECIMAL(28,12)))::DOUBLE AS h
                FROM (SELECT a, b, count(*)::BIGINT AS c FROM base GROUP BY a, b) CROSS JOIN n)
         SELECT n.n AS n_rows,
           round(ha.h, 9) + 0 AS h_a, round(hb.h, 9) + 0 AS h_b,
           round(hj.h, 9) + 0 AS h_joint,
           round(hj.h - hb.h, 9) + 0 AS h_a_given_b,
           round(ha.h + hb.h - hj.h, 9) + 0 AS mutual_info
         FROM n CROSS JOIN ha CROSS JOIN hb CROSS JOIN hj""",

    // The q_split_assign md5-block rule; block means and deviations
    // decimal-snapshotted; one row out.
    "q_bootstrap_se" ->
      """WITH b AS (
           SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 32 AS blk, n_chars
           FROM documents),
         m AS (SELECT blk, sum(CAST(n_chars AS DECIMAL(28,6)))::DOUBLE / count(*) AS m
               FROM b GROUP BY blk),
         c AS (SELECT count(*)::BIGINT AS nb,
                 sum(CAST(m AS DECIMAL(28,12)))::DOUBLE / count(*) AS mbar
               FROM m),
         s AS (SELECT nb, mbar,
                 sum(CAST((m - mbar) * (m - mbar) AS DECIMAL(28,12)))::DOUBLE AS ss
               FROM m CROSS JOIN c GROUP BY nb, mbar)
         SELECT nb AS n_blocks, round(mbar, 9) + 0 AS grand_mean,
           CASE WHEN nb > 1
             THEN round(sqrt(ss / (nb - 1)::DOUBLE) / sqrt(nb::DOUBLE), 9) + 0
           END AS se
         FROM s""",

    // Span-collapse subsequence test: b strictly between first-a and
    // last-c; distinct per (user, pattern); exact integer supports.
    "q_seq_patterns" ->
      """WITH e AS (SELECT user_id AS u, event_id AS t, event_type AS y FROM events),
         sp AS (SELECT u, y, min(t) AS mn, max(t) AS mx FROM e GROUP BY 1, 2),
         cand AS (
           SELECT DISTINCT e.u, a.y AS type_a, e.y AS type_b, c.y AS type_c
           FROM e JOIN sp a ON a.u = e.u AND a.mn < e.t
                  JOIN sp c ON c.u = e.u AND c.mx > e.t),
         s AS (SELECT type_a, type_b, type_c, count(*)::BIGINT AS support
               FROM cand GROUP BY 1, 2, 3)
         SELECT type_a, type_b, type_c, support FROM (
           SELECT s.*, row_number() OVER (
             ORDER BY support DESC, type_a ASC, type_b ASC, type_c ASC) AS rn
           FROM s)
         WHERE rn <= 20
         ORDER BY support DESC, type_a, type_b, type_c""",

    // Prepend-0 list fold replays the clamp recurrence bit-for-bit
    // (greatest is exact IEEE on identical doubles); mu/sigma from the
    // same decimal population moments the engine joins back.
    "q_cusum" ->
      """WITH st AS (
           SELECT user_id, count(*)::BIGINT AS n,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS s1,
             sum(CAST(value * value AS DECIMAL(28,6)))::DOUBLE AS s2
           FROM events GROUP BY user_id),
         m AS (SELECT user_id, s1 / n AS mu,
                 sqrt(greatest((s2 - s1 * s1 / n) / n, 0.0)) AS sigma
               FROM st),
         ord AS (
           SELECT e.user_id,
             list(e.event_id ORDER BY e.event_id) AS ids,
             list(e.value ORDER BY e.event_id) AS vs,
             max(m.mu) AS mu, max(m.sigma) AS sigma
           FROM events e JOIN m ON e.user_id = m.user_id
           GROUP BY e.user_id),
         ex AS (
           SELECT user_id, mu, sigma,
             unnest(ids) AS event_id,
             unnest(vs) AS value,
             unnest(list_transform(range(1, len(vs) + 1), i ->
               list_reduce(
                 list_prepend(0.0::DOUBLE,
                   list_transform(vs[1:i], x -> x::DOUBLE - (mu + 0.5::DOUBLE * sigma))),
                 (acc, e) -> greatest(0.0::DOUBLE, acc + e)))) AS cpos,
             unnest(list_transform(range(1, len(vs) + 1), i ->
               list_reduce(
                 list_prepend(0.0::DOUBLE,
                   list_transform(vs[1:i], x -> (mu - 0.5::DOUBLE * sigma) - x::DOUBLE)),
                 (acc, e) -> greatest(0.0::DOUBLE, acc + e)))) AS cneg
           FROM ord)
         SELECT event_id, user_id, value, cpos AS cusum_pos, cneg AS cusum_neg,
           (cpos > 5.0::DOUBLE * sigma OR cneg > 5.0::DOUBLE * sigma) AS alarm
         FROM ex ORDER BY event_id""",

    // ntile over the unique (score desc, doc_id asc) order; exact
    // counts; capture/lift as fixed-shape integer divisions.
    "q_gains" ->
      raw"""WITH t AS (
           SELECT source, doc_id, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT source, doc_id,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE
               / len(toks)::DOUBLE AS sc,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM t WHERE len(toks) > 0),
         tiles AS (
           SELECT source,
             ntile(10) OVER (PARTITION BY source ORDER BY sc DESC, doc_id ASC) AS decile,
             y
           FROM s),
         g AS (SELECT source, decile::BIGINT AS decile,
                 count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
               FROM tiles GROUP BY 1, 2),
         c AS (SELECT source, decile, n, n_pos,
                 sum(n) OVER w::BIGINT AS cum_n,
                 sum(n_pos) OVER w::BIGINT AS cum_pos,
                 sum(n) OVER (PARTITION BY source)::BIGINT AS tot_n,
                 sum(n_pos) OVER (PARTITION BY source)::BIGINT AS tot_pos
               FROM g
               WINDOW w AS (PARTITION BY source ORDER BY decile
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT source, decile, n, n_pos, cum_pos,
           CASE WHEN tot_pos > 0 THEN cum_pos::DOUBLE / tot_pos::DOUBLE END AS capture,
           CASE WHEN tot_pos > 0
             THEN (cum_pos::DOUBLE / cum_n::DOUBLE) / (tot_pos::DOUBLE / tot_n::DOUBLE)
           END AS lift
         FROM c ORDER BY source, decile""",

    // Exact integer precision test (cump·5 >= cumn·3) over the
    // distinct-score cumulative frame; deepest qualifying cut unique
    // because cumn strictly increases.
    "q_threshold_pick" ->
      raw"""WITH t AS (
           SELECT source, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT source,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE
               / len(toks)::DOUBLE AS sc,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM t WHERE len(toks) > 0),
         g AS (SELECT source, sc, count(*)::BIGINT AS cnt, sum(y)::BIGINT AS pos
               FROM s GROUP BY 1, 2),
         c AS (SELECT source, sc,
                 sum(cnt) OVER w::BIGINT AS cumn,
                 sum(pos) OVER w::BIGINT AS cump,
                 sum(pos) OVER (PARTITION BY source)::BIGINT AS totp
               FROM g
               WINDOW w AS (PARTITION BY source ORDER BY sc DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         q AS (SELECT * FROM c WHERE cump * 5 >= cumn * 3),
         r AS (SELECT source, sc, cumn, cump, totp,
                 row_number() OVER (PARTITION BY source ORDER BY cumn DESC) AS rn
               FROM q)
         SELECT source, sc AS threshold, cumn AS n_kept, cump AS n_pos_kept,
           cump::DOUBLE / cumn::DOUBLE AS precision,
           CASE WHEN totp > 0 THEN cump::DOUBLE / totp::DOUBLE END AS recall
         FROM r WHERE rn = 1 ORDER BY source""",

    // Margins via full outer label join (absent counts exact zeros);
    // F1 from UNROUNDED p/r; macro decimal-averages the raw F1s
    // (absent -> 0) before its own round.
    "q_nb_f1" ->
      s"""$NbPredCte,
         conf AS (SELECT true_lang, pred_lang, count(*)::BIGINT AS c
                  FROM pred GROUP BY 1, 2),
         tp AS (SELECT true_lang AS label, sum(CASE WHEN true_lang = pred_lang THEN c ELSE 0 END)::BIGINT AS tp
                FROM conf GROUP BY 1),
         rt AS (SELECT true_lang AS label, sum(c)::BIGINT AS rt FROM conf GROUP BY 1),
         ct AS (SELECT pred_lang AS label, sum(c)::BIGINT AS ct FROM conf GROUP BY 1),
         base AS (
           SELECT coalesce(rt.label, ct.label) AS label,
             coalesce(tp.tp, 0) AS tp, coalesce(rt.rt, 0) AS n_true, coalesce(ct.ct, 0) AS n_pred
           FROM rt FULL JOIN ct ON rt.label = ct.label
           LEFT JOIN tp ON coalesce(rt.label, ct.label) = tp.label),
         pr AS (
           SELECT label, tp, n_true, n_pred,
             CASE WHEN n_pred > 0 THEN tp::DOUBLE / n_pred::DOUBLE END AS p,
             CASE WHEN n_true > 0 THEN tp::DOUBLE / n_true::DOUBLE END AS r
           FROM base),
         f AS (
           SELECT label, tp, n_true, n_pred, p, r,
             CASE WHEN p IS NOT NULL AND r IS NOT NULL AND (p + r) > 0
               THEN 2.0::DOUBLE * p * r / (p + r) END AS f1
           FROM pr),
         m AS (SELECT sum(CAST(coalesce(f1, 0.0) AS DECIMAL(28,12)))::DOUBLE / count(*) AS macro FROM f)
         SELECT label, tp, n_true, n_pred,
           round(p, 9) + 0 AS precision, round(r, 9) + 0 AS recall,
           round(f1, 9) + 0 AS f1, round(macro, 9) + 0 AS macro_f1
         FROM f CROSS JOIN m ORDER BY label""",

    // Doubled average ranks (asc rank + complement of desc rank) keep
    // ties integer; HUGEINT moment sums mirror decimal(38,0); the rho
    // formula is the only floating step.
    "q_spearman" ->
      raw"""WITH t AS (
           SELECT source, n_chars,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS nt
           FROM documents),
         r AS (
           SELECT source,
             (rank() OVER (PARTITION BY source ORDER BY n_chars ASC)
              + (count(*) OVER (PARTITION BY source)
                 - rank() OVER (PARTITION BY source ORDER BY n_chars DESC) + 1))::HUGEINT AS rx,
             (rank() OVER (PARTITION BY source ORDER BY nt ASC)
              + (count(*) OVER (PARTITION BY source)
                 - rank() OVER (PARTITION BY source ORDER BY nt DESC) + 1))::HUGEINT AS ry
           FROM t),
         a AS (
           SELECT source, count(*)::BIGINT AS n,
             sum(rx) AS sx, sum(ry) AS sy,
             sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
           FROM r GROUP BY source)
         SELECT source, n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
             THEN round((n * sxy - sx * sy)::DOUBLE
                    / (sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE)),
                  6) + 0
           END AS spearman_rho
         FROM a ORDER BY source""",

    // Full grid including zero cells; expected = decimal margin product
    // divided once; contributions decimal-summed into chi2.
    "q_chi2" ->
      """WITH base AS (
           SELECT lang AS a, source AS b FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL),
         cells AS (SELECT a, b, count(*)::BIGINT AS o FROM base GROUP BY 1, 2),
         rt AS (SELECT a, count(*)::BIGINT AS rt FROM base GROUP BY 1),
         ct AS (SELECT b, count(*)::BIGINT AS ct FROM base GROUP BY 1),
         nt AS (SELECT count(*)::BIGINT AS n,
                  count(DISTINCT a)::BIGINT AS ra, count(DISTINCT b)::BIGINT AS rb
                FROM base),
         grid AS (
           SELECT rt.a, ct.b, rt.rt, ct.ct, coalesce(c.o, 0) AS o, n, ra, rb
           FROM rt CROSS JOIN ct
           LEFT JOIN cells c ON c.a = rt.a AND c.b = ct.b
           CROSS JOIN nt),
         s AS (SELECT a, b, o, n, ra, rb,
                 (rt::DECIMAL(38,0) * ct)::DOUBLE / n::DOUBLE AS e
               FROM grid),
         s2 AS (SELECT a, b, o, n, ra, rb, e,
                  (o::DOUBLE - e) * (o::DOUBLE - e) / e AS c
                FROM s),
         tot AS (SELECT sum(CAST(c AS DECIMAL(28,9)))::DOUBLE AS chi2 FROM s2)
         SELECT a AS lang, b AS source, o AS observed,
           round(e, 6) + 0 AS expected, round(c, 6) + 0 AS contrib,
           round(chi2, 6) + 0 AS chi2,
           CASE WHEN least(ra, rb) > 1
             THEN round(sqrt(chi2 / (n::DOUBLE * (least(ra, rb) - 1)::DOUBLE)), 6) + 0
           END AS cramers_v
         FROM s2 CROSS JOIN tot ORDER BY lang, source""",

    // The q_split_assign md5 rule on vec_id; per-dim decimal means; the
    // two scalars from decimal cross-moments over 64 dims.
    "q_embed_drift" ->
      """WITH e AS (
           SELECT (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000) AS ref,
             embedding
           FROM embeddings),
         fan AS (
           SELECT ref, p.pos, embedding[p.pos]::DOUBLE AS v
           FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) p),
         m AS (SELECT ref, pos,
                 sum(CAST(v AS DECIMAL(28,12)))::DOUBLE / count(*) AS m,
                 count(*)::BIGINT AS n
               FROM fan GROUP BY 1, 2),
         j AS (SELECT a.pos, a.m AS ma, b.m AS mb, a.n AS na, b.n AS nb
               FROM m a JOIN m b ON a.pos = b.pos AND a.ref AND NOT b.ref),
         agg AS (SELECT max(na)::BIGINT AS n_ref, max(nb)::BIGINT AS n_cur,
                   sum(CAST(ma * mb AS DECIMAL(28,12)))::DOUBLE AS dot,
                   sum(CAST(ma * ma AS DECIMAL(28,12)))::DOUBLE AS aa,
                   sum(CAST(mb * mb AS DECIMAL(28,12)))::DOUBLE AS bb,
                   sum(CAST((ma - mb) * (ma - mb) AS DECIMAL(28,12)))::DOUBLE AS d2
                 FROM j)
         SELECT n_ref, n_cur,
           CASE WHEN aa > 0 AND bb > 0
             THEN round(dot / (sqrt(aa) * sqrt(bb)), 9) + 0 END AS mean_cos,
           round(sqrt(d2), 9) + 0 AS l2_dist
         FROM agg""",

    // Source centroids: the q_embed_drift decimal-mean shape per
    // (source, dim), identical pair moments over the dimension join.
    "q_source_sim" ->
      """WITH j AS (
           SELECT d.source AS g, e.embedding AS v
           FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
           WHERE d.source IS NOT NULL),
         fan AS (
           SELECT g, p.pos AS p, v[p.pos]::DOUBLE AS x
           FROM j CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) p),
         m AS (SELECT g, p,
                 sum(CAST(x AS DECIMAL(28,12)))::DOUBLE / count(*) AS m,
                 count(*)::BIGINT AS n
               FROM fan GROUP BY 1, 2),
         pairs AS (
           SELECT a.g AS g_a, b.g AS g_b,
             max(a.n)::BIGINT AS n_a, max(b.n)::BIGINT AS n_b,
             sum(CAST(a.m * b.m AS DECIMAL(28,12)))::DOUBLE AS dot,
             sum(CAST(a.m * a.m AS DECIMAL(28,12)))::DOUBLE AS aa,
             sum(CAST(b.m * b.m AS DECIMAL(28,12)))::DOUBLE AS bb,
             sum(CAST((a.m - b.m) * (a.m - b.m) AS DECIMAL(28,12)))::DOUBLE AS d2
           FROM m a JOIN m b ON a.p = b.p AND a.g < b.g
           GROUP BY 1, 2)
         SELECT g_a, g_b, n_a, n_b,
           CASE WHEN aa > 0 AND bb > 0
             THEN round(dot / (sqrt(aa) * sqrt(bb)), 6) + 0 END AS centroid_cos,
           round(sqrt(d2), 9) + 0 AS centroid_l2
         FROM pairs ORDER BY g_a, g_b""",

    // Second-moment drift: the q_embed_cov upper-triangular fan per
    // cohort, the q_embed_drift decimal-mean/cell shape, off-diagonals
    // weighted x2 for the full symmetric matrix.
    "q_moment_drift" ->
      """WITH e AS (
           SELECT (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000) AS ref,
             embedding AS v
           FROM embeddings),
         p AS (SELECT ref, unnest(flatten(list_transform(range(0, len(v)), i ->
                 list_transform(range(i, len(v)), j ->
                   {'i': i, 'j': j, 'xy': v[i+1]::DOUBLE * v[j+1]::DOUBLE})))) AS s
               FROM e),
         cells AS (SELECT ref, s.i AS i, s.j AS j,
                     sum(CAST(s.xy AS DECIMAL(28,12)))::DOUBLE / count(*) AS m,
                     count(*)::BIGINT AS n
                   FROM p GROUP BY 1, 2, 3),
         j AS (SELECT a.i, a.j, a.m AS ma, b.m AS mb, a.n AS na, b.n AS nb,
                 CASE WHEN a.i = a.j THEN 1.0 ELSE 2.0 END AS w
               FROM cells a JOIN cells b
                 ON a.i = b.i AND a.j = b.j AND a.ref AND NOT b.ref),
         agg AS (SELECT max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
                   sum(CAST(w * ma * mb AS DECIMAL(28,12)))::DOUBLE AS dot,
                   sum(CAST(w * ma * ma AS DECIMAL(28,12)))::DOUBLE AS aa,
                   sum(CAST(w * mb * mb AS DECIMAL(28,12)))::DOUBLE AS bb,
                   sum(CAST(w * (ma - mb) * (ma - mb) AS DECIMAL(28,12)))::DOUBLE AS d2
                 FROM j)
         SELECT n_a, n_b,
           round(sqrt(aa), 9) + 0 AS frob_a, round(sqrt(bb), 9) + 0 AS frob_b,
           round(sqrt(d2), 9) + 0 AS moment_dist,
           CASE WHEN aa > 0 AND bb > 0
             THEN round(dot / (sqrt(aa) * sqrt(bb)), 6) + 0 END AS moment_cos
         FROM agg""",

    // The shared NB scored CTE; best-other via the negated-score struct
    // min; ordering on the RAW margin with a doc-id tiebreak.
    "q_label_suspects" ->
      s"""$NbPredCte,
         ts AS (SELECT doc_id, score AS tsc FROM scored WHERE cand = true_lang),
         bo AS (SELECT doc_id, true_lang,
                  (min({'ns': -score, 'l': cand})).l AS suspect_label,
                  -((min({'ns': -score, 'l': cand})).ns) AS bs
                FROM scored WHERE cand <> true_lang GROUP BY doc_id, true_lang)
         SELECT doc_id, true_lang AS true_label, suspect_label,
           round(bs - tsc, 6) + 0 AS margin
         FROM bo JOIN ts USING (doc_id)
         WHERE bs > tsc
         ORDER BY (bs - tsc) DESC, doc_id ASC LIMIT 20""",

    // Pairwise sign sum via the bounded per-user self-join; integer S,
    // one final division — engine-exact, unrounded.
    "q_mann_kendall" ->
      """WITH e AS (SELECT user_id, event_id, value FROM events),
         p AS (SELECT a.user_id, sign(b.value - a.value)::BIGINT AS sgn
               FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id),
         n AS (SELECT user_id, count(*)::BIGINT AS n FROM e GROUP BY 1),
         s AS (SELECT user_id, sum(sgn)::BIGINT AS s FROM p GROUP BY 1)
         SELECT n.user_id, n.n, coalesce(s.s, 0)::BIGINT AS s,
           CASE WHEN n.n >= 2
             THEN (coalesce(s.s, 0) * 2)::DOUBLE / (n.n * (n.n - 1))::DOUBLE
           END AS tau
         FROM n LEFT JOIN s USING (user_id) ORDER BY user_id""",

    // Median by deterministic middle-rank picking: ranks (np+1)/2 and
    // (np+2)/2 under floor (exact: integers/2 are exact doubles), the
    // 1-2 picked slopes averaged — no percentile interpolation.
    "q_sen_slope" ->
      """WITH e AS (SELECT user_id, event_id::DOUBLE AS o, value FROM events),
         p AS (SELECT a.user_id, (b.value - a.value) / (b.o - a.o) AS slope
               FROM e a JOIN e b ON a.user_id = b.user_id AND a.o < b.o),
         r AS (SELECT user_id, slope,
                 count(*) OVER (PARTITION BY user_id) AS np,
                 row_number() OVER (PARTITION BY user_id ORDER BY slope) AS rn
               FROM p)
         SELECT user_id, max(np)::BIGINT AS n_pairs,
           sum(slope) / count(*) + 0 AS sen_slope
         FROM r
         WHERE rn = floor((np + 1) / 2.0) OR rn = floor((np + 2) / 2.0)
         GROUP BY user_id ORDER BY user_id""",

    // The q_ewma per-prefix fold pattern with a 2-element LIST
    // accumulator [level, trend], seeded from the first element [x0, 0]:
    // list construction evaluates BOTH expressions against the old
    // accumulator (a STRUCT accumulator would not — DuckDB overwrites
    // struct fields sequentially, so the trend expression would read the
    // already-updated level); 0.5/0.75 literals are the exact
    // complements of alpha=0.5, gamma=0.25.
    "q_holt" ->
      """WITH ord AS (
           SELECT user_id,
             list(event_id ORDER BY event_id) AS ids,
             list(value ORDER BY event_id) AS vs
           FROM events GROUP BY user_id),
         ex AS (
           SELECT user_id,
             unnest(ids) AS event_id,
             unnest(vs) AS value,
             unnest(list_transform(range(1, len(vs) + 1), i ->
               list_reduce(
                 list_transform(vs[1:i], x -> [x::DOUBLE, 0.0::DOUBLE]),
                 (acc, e) -> [0.5::DOUBLE * e[1] + 0.5::DOUBLE * (acc[1] + acc[2]),
                              0.25::DOUBLE * ((0.5::DOUBLE * e[1] + 0.5::DOUBLE * (acc[1] + acc[2])) - acc[1])
                                + 0.75::DOUBLE * acc[2]]))) AS st
           FROM ord)
         SELECT event_id, user_id, value, st[1] AS level, st[2] AS trend
         FROM ex ORDER BY event_id""",

    // MACD: fast/slow EWMA prefix folds (the q_ewma idiom), macd as the
    // per-index difference, signal as ONE fold over the macd prefix —
    // sound because macd₁ = x−x = 0.0 exactly, which IS the signal seed.
    // α literals interpolated from the Scala constants so both engines
    // fold the identical doubles.
    // (α spelled as the DIVISION 2/(n+1) in SQL, not its decimal literal:
    // DuckDB parses a 17-digit literal through DECIMAL and lands one ulp
    // off Scala's double — IEEE division is correctly rounded in BOTH
    // engines, so shipping the division keeps the folds bit-identical.)
    "q_macd" -> {
      s"""WITH ord AS (
           SELECT user_id,
             list(event_id ORDER BY event_id) AS ids,
             list(value ORDER BY event_id) AS vs
           FROM events WHERE value IS NOT NULL GROUP BY user_id),
         f AS (
           SELECT user_id, ids, vs,
             list_transform(range(1, len(vs) + 1), i ->
               list_reduce(vs[1:i], (acc, x) -> (2.0::DOUBLE / 13.0::DOUBLE) * x + (1.0::DOUBLE - 2.0::DOUBLE / 13.0::DOUBLE) * acc)) AS fast,
             list_transform(range(1, len(vs) + 1), i ->
               list_reduce(vs[1:i], (acc, x) -> (2.0::DOUBLE / 27.0::DOUBLE) * x + (1.0::DOUBLE - 2.0::DOUBLE / 27.0::DOUBLE) * acc)) AS slow
           FROM ord),
         m AS (
           SELECT user_id, ids, vs,
             list_transform(range(1, len(vs) + 1), i -> fast[i] - slow[i]) AS macds
           FROM f),
         e AS (
           SELECT user_id,
             unnest(ids) AS event_id, unnest(vs) AS value, unnest(macds) AS macd,
             unnest(list_transform(range(1, len(macds) + 1), i ->
               list_reduce(macds[1:i], (acc, x) -> (2.0::DOUBLE / 10.0::DOUBLE) * x + (1.0::DOUBLE - 2.0::DOUBLE / 10.0::DOUBLE) * acc))) AS signal
           FROM m)
         SELECT event_id, user_id, value, macd, signal, macd - signal AS hist
         FROM e ORDER BY event_id""" },

    // RSI: delta list → gain/loss split → two α=1/14 folds seeded at the
    // first delta (list_reduce's no-init seed IS the Scala seeding), the
    // 100 − 100/(1+RS) map with the same pinned degenerate cases, and a
    // NULL prepended so row 1 (no delta) aligns.
    "q_rsi" -> {
      s"""WITH ord AS (
           SELECT user_id,
             list(event_id ORDER BY event_id) AS ids,
             list(value ORDER BY event_id) AS vs
           FROM events WHERE value IS NOT NULL GROUP BY user_id),
         d AS (
           SELECT user_id, ids, vs,
             list_transform(range(1, len(vs)), i -> vs[i + 1] - vs[i]) AS ds
           FROM ord),
         g AS (
           SELECT user_id, ids, vs,
             list_transform(ds, x -> CASE WHEN x > 0 THEN x ELSE 0.0::DOUBLE END) AS gs,
             list_transform(ds, x -> CASE WHEN x < 0 THEN -x ELSE 0.0::DOUBLE END) AS ls
           FROM d),
         r AS (
           SELECT user_id, ids, vs,
             list_transform(range(1, len(gs) + 1), i ->
               list_reduce(gs[1:i], (acc, x) -> (1.0::DOUBLE / 14.0::DOUBLE) * x + (1.0::DOUBLE - 1.0::DOUBLE / 14.0::DOUBLE) * acc)) AS ags,
             list_transform(range(1, len(ls) + 1), i ->
               list_reduce(ls[1:i], (acc, x) -> (1.0::DOUBLE / 14.0::DOUBLE) * x + (1.0::DOUBLE - 1.0::DOUBLE / 14.0::DOUBLE) * acc)) AS als
           FROM g),
         e AS (
           SELECT user_id,
             unnest(ids) AS event_id, unnest(vs) AS value,
             unnest(list_prepend(NULL::DOUBLE,
               list_transform(range(1, len(ags) + 1), i ->
                 CASE WHEN als[i] = 0.0 AND ags[i] = 0.0 THEN 50.0::DOUBLE
                      WHEN als[i] = 0.0 THEN 100.0::DOUBLE
                      ELSE 100.0::DOUBLE - 100.0::DOUBLE / (1.0::DOUBLE + ags[i] / als[i]) END))) AS rsi
           FROM r)
         SELECT event_id, user_id, value, rsi FROM e ORDER BY event_id""" },

    // Bollinger: the q_rolling_vol decimal-window-sum recipe, band
    // arithmetic in the IDENTICAL double-op order as the Spark
    // expressions (mid, sd, mid ± 2·sd, (x−lower)/(upper−lower)).
    "q_bollinger" ->
      """SELECT event_id, user_id,
           CASE WHEN cnt > 1 THEN round(s1 / cnt, 6) + 0 END AS bb_mid,
           CASE WHEN cnt > 1 THEN round(s1 / cnt + 2.0 * sqrt(greatest((s2 - s1*s1/cnt)/(cnt-1.0), 0.0)), 6) + 0 END AS bb_upper,
           CASE WHEN cnt > 1 THEN round(s1 / cnt - 2.0 * sqrt(greatest((s2 - s1*s1/cnt)/(cnt-1.0), 0.0)), 6) + 0 END AS bb_lower,
           CASE WHEN cnt > 1 AND (s1 / cnt + 2.0 * sqrt(greatest((s2 - s1*s1/cnt)/(cnt-1.0), 0.0)))
                              - (s1 / cnt - 2.0 * sqrt(greatest((s2 - s1*s1/cnt)/(cnt-1.0), 0.0))) > 0
             THEN round((value - (s1 / cnt - 2.0 * sqrt(greatest((s2 - s1*s1/cnt)/(cnt-1.0), 0.0))))
                        / ((s1 / cnt + 2.0 * sqrt(greatest((s2 - s1*s1/cnt)/(cnt-1.0), 0.0)))
                           - (s1 / cnt - 2.0 * sqrt(greatest((s2 - s1*s1/cnt)/(cnt-1.0), 0.0)))), 6) + 0 END AS pct_b
         FROM (
           SELECT event_id, user_id, value,
             count(value) OVER w::DOUBLE AS cnt,
             sum(CAST(value AS DECIMAL(28,6))) OVER w::DOUBLE AS s1,
             sum(CAST(value*value AS DECIMAL(28,6))) OVER w::DOUBLE AS s2
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         ORDER BY event_id""",

    // TF-IDF cosine: the q_tfidf weight recipe with the df <= 500 cap
    // folded into the vector space, weights rounded(9) before products,
    // decimal dots/norm sums, visible score rounded(6) — every CTE the
    // mirror of TextOps.tfidfCosineTopK.
    "q_tfidf_sim" ->
      raw"""WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         perdoc AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
         dlen AS (SELECT doc_id, sum(cnt) AS len FROM perdoc GROUP BY 1),
         dfreq AS (SELECT token, count(*) AS df FROM perdoc GROUP BY 1 HAVING count(*) <= 500),
         n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
         w AS (
           SELECT p.doc_id, p.token,
             round((p.cnt::DOUBLE / l.len::DOUBLE)
               * (ln((n.n::DOUBLE + 1.0) / (f.df::DOUBLE + 1.0)) + 1.0), 9) + 0 AS w
           FROM perdoc p
           JOIN dfreq f ON p.token = f.token
           JOIN dlen l ON p.doc_id = l.doc_id
           CROSS JOIN n),
         nrm AS (SELECT doc_id, sqrt(sum(CAST(w*w AS DECIMAL(28,12)))::DOUBLE) AS nrm
                 FROM w GROUP BY doc_id),
         dots AS (
           SELECT q.doc_id AS query_id, c.doc_id AS corpus_id,
             sum(CAST(q.w * c.w AS DECIMAL(28,12)))::DOUBLE AS dot
           FROM w q JOIN w c ON q.token = c.token AND q.doc_id <> c.doc_id
           WHERE q.doc_id < 20
           GROUP BY 1, 2),
         scored AS (
           SELECT query_id, corpus_id,
             round(dot / (nq.nrm * nc.nrm), 6) + 0 AS score
           FROM dots
           JOIN nrm nq ON nq.doc_id = query_id
           JOIN nrm nc ON nc.doc_id = corpus_id)
         SELECT query_id, corpus_id, score, rank FROM (
           SELECT query_id, corpus_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // Sliding MAU: per-day KMV sketches (the q_kmv_distinct hash rule)
    // merged over the trailing 7-day window; the exact column re-scans
    // the window; estimate arithmetic mirrors kmvEstimateFromSketch
    // including the r16 mx > 0 guard.
    "q_sliding_mau" ->
      """WITH d AS (SELECT ts::DATE AS day, user_id FROM events),
         h AS (SELECT DISTINCT day, ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS h
               FROM d),
         pd AS (SELECT day, h FROM (
                  SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
                  FROM h) WHERE rn <= 64),
         cat AS (SELECT DISTINCT day FROM pd),
         m AS (SELECT DISTINCT cat.day AS day, pd.h
               FROM cat JOIN pd ON pd.day <= cat.day AND pd.day > cat.day - 7),
         nd AS (SELECT cat.day AS day, count(DISTINCT pd.day)::BIGINT AS n_days_merged
                FROM cat JOIN pd ON pd.day <= cat.day AND pd.day > cat.day - 7
                GROUP BY 1),
         sk AS (SELECT day, h FROM (
                  SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
                  FROM m) WHERE rn <= 64),
         est AS (SELECT day, count(*)::BIGINT AS nn, max(h) AS mx FROM sk GROUP BY day),
         e2 AS (SELECT day,
                  CASE WHEN nn = 64 AND mx > 0
                    THEN round(63.0 / (mx::DOUBLE / 4294967296.0), 6) + 0
                    ELSE nn::DOUBLE END AS kmv_estimate
                FROM est),
         ex AS (SELECT cat.day AS day, count(DISTINCT d.user_id)::BIGINT AS exact_distinct
                FROM cat JOIN d ON d.day <= cat.day AND d.day > cat.day - 7
                GROUP BY 1)
         SELECT e2.day, nd.n_days_merged, e2.kmv_estimate, ex.exact_distinct,
           round(abs(e2.kmv_estimate - ex.exact_distinct::DOUBLE)
                 / ex.exact_distinct::DOUBLE, 6) + 0 AS rel_err
         FROM e2 JOIN nd ON nd.day = e2.day JOIN ex ON ex.day = e2.day
         ORDER BY e2.day""",

    // Item-item cosine: the q_cooccur pair derivation with the
    // support >= 3 floor, per-item basket counts, symmetrized, ranked by
    // the ROUNDED cosine (ties to the lower neighbor id).
    "q_item_neighbors" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         sup AS (
           SELECT l.i AS item_a, r.i AS item_b, count(*) AS support
           FROM items l JOIN items r ON l.b = r.b AND l.i < r.i
           GROUP BY 1, 2 HAVING count(*) >= 3),
         cnt AS (SELECT i AS item, count(*) AS n FROM items GROUP BY 1),
         sym AS (
           SELECT item_a AS item, item_b AS neighbor, support FROM sup
           UNION ALL
           SELECT item_b AS item, item_a AS neighbor, support FROM sup),
         scored AS (
           SELECT s.item, s.neighbor, s.support::BIGINT AS support,
             round(s.support::DOUBLE / (sqrt(a.n::DOUBLE) * sqrt(b.n::DOUBLE)), 6) + 0 AS cosine
           FROM sym s
           JOIN cnt a ON a.item = s.item
           JOIN cnt b ON b.item = s.neighbor)
         SELECT item, rank, neighbor, support, cosine FROM (
           SELECT item, neighbor, support, cosine,
             row_number() OVER (PARTITION BY item ORDER BY cosine DESC, neighbor ASC) AS rank
           FROM scored)
         WHERE rank <= 3 ORDER BY item, rank""",

    // Fixed-width floor bins; conf = decimal-snapshotted mean rounded
    // BEFORE the ECE terms; acc = one exact integer division.
    // Platt scaling (r20): per-source 2x2 Newton rounds unrolled —
    // generated, see plattSql.
    "q_platt" -> plattSql(8),

    // Isotonic calibration (r20): the PAV fixpoint reached by iterated
    // run-pooling in a recursive CTE (each pass pools maximal
    // non-increasing runs of block means — integer cross-multiplied
    // comparisons, so the block structure is engine-exact), then the
    // same binned ECE shape before/after.
    "q_isotonic" ->
      raw"""WITH RECURSIVE
         t AS (SELECT source, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         sc AS (SELECT source,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE
               / len(toks)::DOUBLE AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM t WHERE len(toks) > 0),
         cat AS (SELECT source, s, count(*)::BIGINT AS w, sum(y)::BIGINT AS p
           FROM sc GROUP BY 1, 2),
         base AS (SELECT source,
             row_number() OVER (PARTITION BY source ORDER BY s) AS seq,
             s, w, p
           FROM cat),
         pav AS (
           SELECT 0 AS pass, source, seq, seq AS seqlo, seq AS seqhi, w, p
           FROM base
           UNION ALL
           SELECT pass, source, run AS seq, seqlo, seqhi, w, p FROM (
             SELECT pass, source, run, min(seqlo) AS seqlo, max(seqhi) AS seqhi,
               sum(w) AS w, sum(p) AS p, max(cin) AS cin,
               count(*) OVER (PARTITION BY pass, source) AS cout
             FROM (
               SELECT pass + 1 AS pass, source, seq, seqlo, seqhi, w, p,
                 count(*) OVER (PARTITION BY source) AS cin,
                 sum(CASE WHEN strt THEN 1 ELSE 0 END)
                   OVER (PARTITION BY source ORDER BY seq) AS run
               FROM (
                 SELECT pass, source, seq, seqlo, seqhi, w, p,
                   (lag(p) OVER (PARTITION BY source ORDER BY seq) IS NULL
                    OR lag(p) OVER (PARTITION BY source ORDER BY seq)::HUGEINT * w
                       < p::HUGEINT * lag(w) OVER (PARTITION BY source ORDER BY seq))
                     AS strt
                 FROM pav
               )
             ) GROUP BY pass, source, run
           ) WHERE cout < cin
         ),
         fin AS (SELECT source, max(pass) AS mp FROM pav GROUP BY source),
         blocks AS (SELECT p.source, p.seqlo, p.seqhi, p.w, p.p FROM pav p
           JOIN fin f ON p.source = f.source AND p.pass = f.mp),
         fitted AS (SELECT b.source, v.s, v.w, v.p,
             b.p::DOUBLE / b.w::DOUBLE AS f
           FROM blocks b JOIN base v
             ON v.source = b.source AND v.seq BETWEEN b.seqlo AND b.seqhi),
         ebb AS (SELECT source, least(floor(s * 10), 9)::BIGINT AS bin, w, p,
             s * w::DOUBLE AS pw FROM cat),
         eb1 AS (SELECT source, bin, sum(w)::BIGINT AS n, sum(p)::BIGINT AS np,
             sum(CAST(pw AS DECIMAL(28,12)))::DOUBLE AS scs,
             sum(sum(w)) OVER (PARTITION BY source) AS nn
           FROM ebb GROUP BY source, bin),
         eb AS (SELECT source, round(sum(CAST((n::DOUBLE / nn::DOUBLE) *
               abs(np::DOUBLE / n::DOUBLE - (round(scs / n::DOUBLE, 9) + 0))
               AS DECIMAL(28,12)))::DOUBLE, 9) + 0 AS ece_before
           FROM eb1 GROUP BY source),
         eab AS (SELECT source, least(floor(f * 10), 9)::BIGINT AS bin, w, p,
             f * w::DOUBLE AS pw FROM fitted),
         ea1 AS (SELECT source, bin, sum(w)::BIGINT AS n, sum(p)::BIGINT AS np,
             sum(CAST(pw AS DECIMAL(28,12)))::DOUBLE AS scs,
             sum(sum(w)) OVER (PARTITION BY source) AS nn
           FROM eab GROUP BY source, bin),
         ea AS (SELECT source, round(sum(CAST((n::DOUBLE / nn::DOUBLE) *
               abs(np::DOUBLE / n::DOUBLE - (round(scs / n::DOUBLE, 9) + 0))
               AS DECIMAL(28,12)))::DOUBLE, 9) + 0 AS ece_after
           FROM ea1 GROUP BY source),
         summ AS (SELECT source, sum(w)::BIGINT AS n, count(*)::BIGINT AS n_values
           FROM cat GROUP BY source),
         nb AS (SELECT source, count(*)::BIGINT AS n_blocks FROM blocks
           GROUP BY source)
         SELECT summ.source, summ.n, summ.n_values, nb.n_blocks,
           eb.ece_before, ea.ece_after
         FROM summ JOIN nb USING (source) JOIN eb USING (source)
           JOIN ea USING (source)
         ORDER BY source""",

    "q_calibration" ->
      raw"""WITH t AS (
           SELECT lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE
               / len(toks)::DOUBLE AS sc,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM t WHERE len(toks) > 0),
         b AS (SELECT least(floor(sc * 10), 9)::BIGINT AS bin, y, sc FROM s),
         g AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
                 sum(CAST(sc AS DECIMAL(28,12)))::DOUBLE AS ss
               FROM b GROUP BY bin),
         tot AS (SELECT sum(n)::BIGINT AS nn FROM g),
         r AS (SELECT bin, n, n_pos,
                 round(ss / n, 9) + 0 AS conf,
                 n_pos::DOUBLE / n::DOUBLE AS acc,
                 (n::DOUBLE / nn::DOUBLE)
                   * abs(n_pos::DOUBLE / n::DOUBLE - (round(ss / n, 9) + 0)) AS c
               FROM g CROSS JOIN tot),
         e AS (SELECT sum(CAST(c AS DECIMAL(28,12)))::DOUBLE AS ece FROM r)
         SELECT bin, n, n_pos, conf, acc, round(ece, 9) + 0 AS ece
         FROM r CROSS JOIN e ORDER BY bin""",

    // count^0.75 spelled sqrt(c*sqrt(c)) on BOTH sides — the
    // bit-portable pow-free shape; normalizer decimal-summed.
    "q_neg_sampling" ->
      raw"""WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
         t AS (SELECT sum(CAST(sqrt(cnt::DOUBLE * sqrt(cnt::DOUBLE)) AS DECIMAL(28,12)))::DOUBLE AS tot
               FROM c)
         SELECT token, cnt,
           round(sqrt(cnt::DOUBLE * sqrt(cnt::DOUBLE)), 6) + 0 AS weight,
           round(sqrt(cnt::DOUBLE * sqrt(cnt::DOUBLE)) / tot, 9) + 0 AS prob
         FROM c CROSS JOIN t
         ORDER BY cnt DESC, token ASC LIMIT 30""",

    // 5 unrolled greedy argmax rounds over the engine-computed pool and
    // pool-pair similarity matrix (the q_label_prop unrolling pattern);
    // the (1 - lambda) literal is interpolated from the SAME Scala
    // double the query's loop uses (1.0 - 0.7 != 0.3 in IEEE — the
    // q_bm25 constant rule).
    "q_mmr" -> {
      val (lambda, k, pool) = (0.7, 5, 50)
      val oneMinus = 1.0 - lambda // 0.30000000000000004, NOT 0.3
      def selSet(r: Int) =
        (1 until r).map(i => s"SELECT vec_id FROM sel$i").mkString(" UNION ALL ")
      val rounds = (2 to k).map { r =>
        s""",
         c$r AS (SELECT p.vec_id, p.rel,
             $lambda * p.rel - $oneMinus * (SELECT max(s.sim) FROM sims s
               WHERE s.ia = p.vec_id AND s.ib IN (${selSet(r)})) AS mmr
           FROM p0 p WHERE p.vec_id NOT IN (${selSet(r)})),
         sel$r AS (SELECT vec_id, rel, mmr FROM (
             SELECT vec_id, rel, mmr,
               row_number() OVER (ORDER BY mmr DESC, vec_id ASC) AS rn
             FROM c$r) WHERE rn = 1)"""
      }.mkString
      val unions = (1 to k).map(r =>
        s"SELECT $r::BIGINT AS rank, vec_id, rel, mmr FROM sel$r")
        .mkString("\n         UNION ALL ")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         q AS (SELECT e, nrm FROM n WHERE vec_id = 0),
         pool AS MATERIALIZED (
           SELECT c.vec_id, c.e, c.nrm,
             list_reduce(list_transform(range(1, 65), i -> q.e[i]*c.e[i]), (x, y) -> x + y)
               / (q.nrm * c.nrm) AS rel
           FROM n c CROSS JOIN q WHERE c.vec_id <> 0
           ORDER BY rel DESC, c.vec_id ASC LIMIT $pool),
         sims AS MATERIALIZED (
           SELECT a.vec_id AS ia, b.vec_id AS ib,
             list_reduce(list_transform(range(1, 65), i -> a.e[i]*b.e[i]), (x, y) -> x + y)
               / (a.nrm * b.nrm) AS sim
           FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
         p0 AS MATERIALIZED (SELECT vec_id, rel FROM pool),
         sel1 AS (SELECT vec_id, rel, $lambda * rel AS mmr FROM (
             SELECT vec_id, rel,
               row_number() OVER (ORDER BY $lambda * rel DESC, vec_id ASC) AS rn
             FROM p0) WHERE rn = 1)$rounds
         SELECT rank, vec_id, round(rel, 6) + 0 AS rel, round(mmr, 6) + 0 AS mmr
         FROM ($unions)
         ORDER BY rank"""
    },

    // q_cosine_topk's oracle with the label-mismatch predicate fused into
    // the candidate join — same raw left-to-right fold score shape.
    "q_hard_negatives" ->
      """WITH v AS (SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS e FROM embeddings),
         n AS (SELECT vec_id, label, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         scored AS (
           SELECT q.vec_id AS query_id, q.label AS query_label,
                  c.vec_id AS corpus_id, c.label AS corpus_label,
             list_reduce(list_transform(range(1, 65), i -> q.e[i]*c.e[i]), (x, y) -> x + y)
               / (q.nrm * c.nrm) AS score
           FROM n q JOIN n c ON q.vec_id <> c.vec_id AND q.label <> c.label
           WHERE q.vec_id < 8)
         SELECT query_id, query_label, corpus_id, corpus_label, score, rank FROM (
           SELECT query_id, query_label, corpus_id, corpus_label, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // Brute force over the (bounded) mutated corpus — the blocking-
    // losslessness check is the whole point of oracling this one.
    "q_editdist_join" ->
      raw"""WITH m AS (
           SELECT c_custkey AS id,
             CASE WHEN c_custkey % 11 = 5 THEN
               substr(c_name, 1, (10 + c_custkey % 9) - 1)
                 || substr(c_name, (10 + c_custkey % 9) + 1, length(c_name))
             ELSE c_name END AS name
           FROM customer WHERE c_custkey < 500)
         SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.name, b.name)::BIGINT AS dist
         FROM m a JOIN m b ON a.id < b.id
         WHERE levenshtein(a.name, b.name) <= 2
         ORDER BY id_a, id_b""",

    "q_burstiness" ->
      raw"""WITH g AS (
           SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS g
           FROM events),
         a AS (
           SELECT user_id, count(*) AS n_gaps, sum(g)::BIGINT AS sg,
             sum(g::HUGEINT * g) AS sg2
           FROM g WHERE g IS NOT NULL GROUP BY user_id)
         SELECT user_id, n_gaps,
           round(sg::DOUBLE / n_gaps::DOUBLE, 3) + 0 AS mean_gap_us,
           -- sigma + mu = 0 guard (all gaps zero): emit NULL, matching the
           -- engine's when(sigma + mu > 0, ...) instead of IEEE 0/0 NaN
           CASE WHEN (sqrt(greatest(sg2::DOUBLE / n_gaps::DOUBLE
                  - (sg::DOUBLE / n_gaps::DOUBLE) * (sg::DOUBLE / n_gaps::DOUBLE), 0.0))
                + sg::DOUBLE / n_gaps::DOUBLE) > 0 THEN
           round(
             (sqrt(greatest(sg2::DOUBLE / n_gaps::DOUBLE
                - (sg::DOUBLE / n_gaps::DOUBLE) * (sg::DOUBLE / n_gaps::DOUBLE), 0.0))
              - sg::DOUBLE / n_gaps::DOUBLE) /
             (sqrt(greatest(sg2::DOUBLE / n_gaps::DOUBLE
                - (sg::DOUBLE / n_gaps::DOUBLE) * (sg::DOUBLE / n_gaps::DOUBLE), 0.0))
              + sg::DOUBLE / n_gaps::DOUBLE), 6) + 0 END AS burstiness
         FROM a WHERE n_gaps >= 2 ORDER BY user_id""",

    "q_benford" ->
      """WITH d AS (
           SELECT substr(floor(l_extendedprice)::BIGINT::VARCHAR, 1, 1)::INT AS digit
           FROM lineitem WHERE l_extendedprice >= 1.0),
         c AS (SELECT digit, count(*) AS cnt FROM d GROUP BY digit),
         t AS (SELECT sum(cnt)::BIGINT AS total FROM c)
         SELECT digit, cnt,
           round(cnt::DOUBLE / t.total::DOUBLE, 6) + 0 AS obs_share,
           round(ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0), 6) + 0 AS benford_share
         FROM c CROSS JOIN t ORDER BY digit""",

    "q_simpson" ->
      raw"""WITH tok AS (
           SELECT source AS domain,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         c AS (SELECT domain, token, count(*) AS c FROM tok GROUP BY 1, 2),
         a AS (SELECT domain, sum(c)::BIGINT AS n_tokens, count(*) AS n_types,
                 sum(c::HUGEINT * (c - 1)) AS rep
               FROM c GROUP BY domain)
         SELECT domain, n_tokens, n_types,
           round(rep::DOUBLE / (n_tokens::DOUBLE * (n_tokens - 1)::DOUBLE), 6) + 0 AS simpson
         FROM a ORDER BY domain""",

    // Mirrors the grouped-by-frequency rank-sum form (see
    // TextOps.giniConcentration): exact hugeint rank-weighted sums, ONE
    // double division at the end.
    "q_gini" ->
      raw"""WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         c AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
         byf AS (SELECT c AS f, count(*) AS m FROM c GROUP BY c),
         r AS (SELECT f, m,
             coalesce(sum(m) OVER (ORDER BY f
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rprev
           FROM byf),
         a AS (SELECT
             sum((m::HUGEINT * rprev + (m::HUGEINT * (m + 1)) // 2) * f) AS s,
             sum(f::HUGEINT * m) AS t, sum(m)::BIGINT AS n
           FROM r)
         SELECT n AS n_types, t::BIGINT AS n_tokens,
           round((2 * s - (n + 1)::HUGEINT * t)::DOUBLE /
                 (n::HUGEINT * t)::DOUBLE, 6) + 0 AS gini
         FROM a""",

    "q_zipf_slope" ->
      raw"""WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
         top AS (SELECT cnt, r FROM (
             SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS r
             FROM c) WHERE r <= 200),
         v AS (SELECT ln(r::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM top),
         a AS (SELECT count(*)::DOUBLE AS n,
             sum(CAST(x AS DECIMAL(28,12)))::DOUBLE AS sx,
             sum(CAST(y AS DECIMAL(28,12)))::DOUBLE AS sy,
             sum(CAST(x * y AS DECIMAL(28,12)))::DOUBLE AS sxy,
             sum(CAST(x * x AS DECIMAL(28,12)))::DOUBLE AS sxx
           FROM v)
         SELECT n::BIGINT AS n_types,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) + 0 AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) + 0 AS intercept
         FROM a""",

    "q_quantile_norm" ->
      """SELECT doc_id, source, n_chars,
           round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars ASC), 9) + 0 AS qnorm
         FROM documents ORDER BY doc_id""",

    // Same fixed per-term shape as TextOps.domainTokenMI:
    // (c_dt/N)·ln((c_dt/c_d)·(N/c_t)), decimal-summed.
    "q_domain_mi" ->
      raw"""WITH tok AS (
           SELECT source AS d,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t
           FROM documents),
         joint AS (SELECT d, t, count(*) AS cdt FROM tok GROUP BY 1, 2),
         dtot AS (SELECT d, sum(cdt)::BIGINT AS cd FROM joint GROUP BY d),
         ttot AS (SELECT t, sum(cdt)::BIGINT AS ct FROM joint GROUP BY t),
         tot AS (SELECT sum(cd)::BIGINT AS n, count(*) AS n_domains FROM dtot),
         ty AS (SELECT count(*) AS n_types FROM ttot),
         s AS (
           SELECT max(tot.n) AS n_tokens, max(tot.n_domains) AS n_domains,
             sum(CAST((j.cdt::DOUBLE / tot.n::DOUBLE) *
               ln((j.cdt::DOUBLE / dt.cd::DOUBLE) * (tot.n::DOUBLE / tt.ct::DOUBLE))
               AS DECIMAL(28,12)))::DOUBLE AS mi
           FROM joint j JOIN dtot dt ON j.d = dt.d JOIN ttot tt ON j.t = tt.t
           CROSS JOIN tot)
         SELECT n_tokens, n_domains, ty.n_types, round(mi, 6) + 0 AS mi
         FROM s CROSS JOIN ty""",

    "q_domain_overlap" ->
      raw"""WITH dt AS (
           SELECT DISTINCT source AS d,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         v AS (SELECT d, count(*) AS vsz FROM dt GROUP BY d),
         c AS (SELECT a.d AS domain_a, b.d AS domain_b, count(*) AS n_common
               FROM dt a JOIN dt b ON a.token = b.token AND a.d < b.d
               GROUP BY 1, 2)
         SELECT domain_a, domain_b, va.vsz AS vocab_a, vb.vsz AS vocab_b, n_common,
           round(n_common::DOUBLE / (va.vsz + vb.vsz - n_common)::DOUBLE, 6) + 0 AS jaccard
         FROM c JOIN v va ON va.d = c.domain_a JOIN v vb ON vb.d = c.domain_b
         ORDER BY domain_a, domain_b""",

    // Registers and the estimator are the q_hll_distinct oracle's own
    // CTEs; union registers are the per-pair max-merge, intersection is
    // inclusion-exclusion on the ROUNDED estimates (mirrored in Scala).
    "q_hll_overlap" ->
      """WITH h AS (
           SELECT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 64 AS idx,
             ('0x' || substr(md5(user_id::VARCHAR), 9, 8))::BIGINT AS hi
           FROM events),
         r AS (
           SELECT event_type, idx,
             max(CASE WHEN hi = 0 THEN 33 ELSE 33 - length(bin(hi)) END) AS rho
           FROM h GROUP BY event_type, idx),
         s AS (
           SELECT event_type, count(*) AS nrs,
             sum(power(0.5, rho)) + (64 - count(*)) AS s
           FROM r GROUP BY event_type),
         est AS (
           SELECT event_type,
             round(CASE WHEN (64 - nrs) > 0
                         AND 0.7213 / (1 + 1.079 / 64.0) * 4096.0 / s <= 160.0
                    THEN 64.0 * ln(64.0 / (64 - nrs))
                    ELSE 0.7213 / (1 + 1.079 / 64.0) * 4096.0 / s END, 4) + 0 AS est
           FROM s),
         pairs AS (
           SELECT a.event_type AS ga, b.event_type AS gb
           FROM (SELECT DISTINCT event_type FROM r) a
           JOIN (SELECT DISTINCT event_type FROM r) b ON a.event_type < b.event_type),
         ur AS (
           SELECT ga, gb, idx, max(rho) AS rho FROM (
             SELECT p.ga, p.gb, r.idx, r.rho FROM pairs p JOIN r ON r.event_type = p.ga
             UNION ALL
             SELECT p.ga, p.gb, r.idx, r.rho FROM pairs p JOIN r ON r.event_type = p.gb)
           GROUP BY ga, gb, idx),
         us AS (
           SELECT ga, gb, count(*) AS nrs,
             sum(power(0.5, rho)) + (64 - count(*)) AS s
           FROM ur GROUP BY ga, gb),
         uest AS (
           SELECT ga, gb,
             round(CASE WHEN (64 - nrs) > 0
                         AND 0.7213 / (1 + 1.079 / 64.0) * 4096.0 / s <= 160.0
                    THEN 64.0 * ln(64.0 / (64 - nrs))
                    ELSE 0.7213 / (1 + 1.079 / 64.0) * 4096.0 / s END, 4) + 0 AS est_union
           FROM us)
         SELECT u.ga AS group_a, u.gb AS group_b,
           ea.est AS est_a, eb.est AS est_b, u.est_union,
           round(ea.est + eb.est - u.est_union, 4) + 0 AS est_intersect
         FROM uest u JOIN est ea ON ea.event_type = u.ga
         JOIN est eb ON eb.event_type = u.gb
         ORDER BY group_a, group_b""",

    // Quintile boundaries replay the q_hist_quantiles sketch CTEs
    // (UNROUNDED interpolation — the comparisons need the raw double);
    // one histogram block per metric.
    "q_rfm" -> {
      def hb(metric: String, p: String): String =
        s"""${p}ext AS (SELECT min($metric::DOUBLE) AS lo, max($metric::DOUBLE) AS hi,
               count(*) AS n FROM per),
         ${p}b AS (SELECT (CASE WHEN hi = lo THEN 0
               ELSE least(floor(($metric::DOUBLE - lo) / ((hi - lo) / 128)), 127)
             END)::BIGINT AS bin
           FROM per CROSS JOIN ${p}ext),
         ${p}c AS (SELECT bin, count(*) AS cnt FROM ${p}b GROUP BY bin),
         ${p}cc AS (SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM ${p}c),
         ${p}pick AS (
           SELECT q, lo + bin::DOUBLE * ((hi - lo) / 128)
               + ((q * n::DOUBLE - (cum - cnt)::DOUBLE) / cnt::DOUBLE) * ((hi - lo) / 128) AS est,
             row_number() OVER (PARTITION BY q ORDER BY bin) AS rn
           FROM ${p}cc CROSS JOIN ${p}ext CROSS JOIN qq
           WHERE cum::DOUBLE >= q * n::DOUBLE),
         ${p}bnd AS (SELECT
             max(CASE WHEN q = 0.2 THEN est END) AS b20,
             max(CASE WHEN q = 0.4 THEN est END) AS b40,
             max(CASE WHEN q = 0.6 THEN est END) AS b60,
             max(CASE WHEN q = 0.8 THEN est END) AS b80
           FROM ${p}pick WHERE rn = 1)"""
      s"""WITH ref AS (SELECT max(ts::DATE) AS ref FROM events),
         per AS (
           SELECT user_id,
             date_diff('day', max(ts::DATE), ref.ref)::BIGINT AS recency_days,
             count(*) AS frequency,
             sum(CAST(value AS DECIMAL(28,4)))::DOUBLE AS monetary
           FROM events CROSS JOIN ref GROUP BY user_id, ref.ref),
         qq AS (SELECT unnest([0.2::DOUBLE, 0.4::DOUBLE, 0.6::DOUBLE, 0.8::DOUBLE]) AS q),
         ${hb("recency_days", "r")},
         ${hb("frequency", "f")},
         ${hb("monetary", "m")}
         SELECT p.user_id, p.recency_days, p.frequency, p.monetary,
           (1 + CASE WHEN p.recency_days::DOUBLE > rb.b20 THEN 1 ELSE 0 END
              + CASE WHEN p.recency_days::DOUBLE > rb.b40 THEN 1 ELSE 0 END
              + CASE WHEN p.recency_days::DOUBLE > rb.b60 THEN 1 ELSE 0 END
              + CASE WHEN p.recency_days::DOUBLE > rb.b80 THEN 1 ELSE 0 END) AS r_score,
           (1 + CASE WHEN p.frequency::DOUBLE > fb.b20 THEN 1 ELSE 0 END
              + CASE WHEN p.frequency::DOUBLE > fb.b40 THEN 1 ELSE 0 END
              + CASE WHEN p.frequency::DOUBLE > fb.b60 THEN 1 ELSE 0 END
              + CASE WHEN p.frequency::DOUBLE > fb.b80 THEN 1 ELSE 0 END) AS f_score,
           (1 + CASE WHEN p.monetary > mb.b20 THEN 1 ELSE 0 END
              + CASE WHEN p.monetary > mb.b40 THEN 1 ELSE 0 END
              + CASE WHEN p.monetary > mb.b60 THEN 1 ELSE 0 END
              + CASE WHEN p.monetary > mb.b80 THEN 1 ELSE 0 END) AS m_score,
           ((1 + CASE WHEN p.recency_days::DOUBLE > rb.b20 THEN 1 ELSE 0 END
               + CASE WHEN p.recency_days::DOUBLE > rb.b40 THEN 1 ELSE 0 END
               + CASE WHEN p.recency_days::DOUBLE > rb.b60 THEN 1 ELSE 0 END
               + CASE WHEN p.recency_days::DOUBLE > rb.b80 THEN 1 ELSE 0 END) * 100
            + (1 + CASE WHEN p.frequency::DOUBLE > fb.b20 THEN 1 ELSE 0 END
                 + CASE WHEN p.frequency::DOUBLE > fb.b40 THEN 1 ELSE 0 END
                 + CASE WHEN p.frequency::DOUBLE > fb.b60 THEN 1 ELSE 0 END
                 + CASE WHEN p.frequency::DOUBLE > fb.b80 THEN 1 ELSE 0 END) * 10
            + (1 + CASE WHEN p.monetary > mb.b20 THEN 1 ELSE 0 END
                 + CASE WHEN p.monetary > mb.b40 THEN 1 ELSE 0 END
                 + CASE WHEN p.monetary > mb.b60 THEN 1 ELSE 0 END
                 + CASE WHEN p.monetary > mb.b80 THEN 1 ELSE 0 END))::BIGINT AS segment
         FROM per p CROSS JOIN rbnd rb CROSS JOIN fbnd fb CROSS JOIN mbnd mb
         ORDER BY user_id"""
    },

    "q_attribution" ->
      """SELECT event_id, user_id, first_touch, last_touch FROM (
           SELECT event_id, user_id, event_type,
             first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
           FROM events)
         WHERE event_type = 'purchase' ORDER BY event_id""",

    // Mirrors TextOps.knBigramLogProb's fixed shapes exactly:
    // p = (max(cbg−D,0) + (D·n1f)·(n1p/B)) / cu, D = 0.75.
    "q_kn_logprob" ->
      raw"""WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         bg AS (
           SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM t),
         model AS (SELECT bigram, count(*) AS cbg FROM bg GROUP BY bigram),
         m2 AS (SELECT bigram, cbg, split_part(bigram, ' ', 1) AS w1,
                  split_part(bigram, ' ', 2) AS w2 FROM model),
         ctx AS (SELECT w1, sum(cbg)::BIGINT AS cu, count(*) AS n1f FROM m2 GROUP BY w1),
         cont AS (SELECT w2, count(*) AS n1p FROM m2 GROUP BY w2),
         bt AS (SELECT count(*) AS btypes FROM model)
         SELECT b.doc_id, count(*) AS n_bigrams,
           round(sum(CAST(ln(
               (greatest(m.cbg::DOUBLE - 0.75, 0.0) +
                (0.75 * c.n1f::DOUBLE) * (p.n1p::DOUBLE / bt.btypes::DOUBLE))
               / c.cu::DOUBLE)
             AS DECIMAL(28,12)))::DOUBLE / count(*), 6) + 0 AS kn_logprob
         FROM bg b JOIN model m USING (bigram)
         JOIN ctx c ON c.w1 = split_part(b.bigram, ' ', 1)
         JOIN cont p ON p.w2 = split_part(b.bigram, ' ', 2)
         CROSS JOIN bt
         GROUP BY b.doc_id ORDER BY b.doc_id""",

    // Rightmost-tie window minimum via the struct-ordered min the Scala
    // side uses: (hash asc, -pos asc) — lexicographic in both engines.
    "q_winnow" ->
      raw"""WITH n AS (
           SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t
           FROM documents),
         g AS (
           SELECT doc_id, u.p AS pos,
             ('0x' || substr(md5(substr(t, u.p, 8)), 1, 8))::BIGINT AS h
           FROM n CROSS JOIN LATERAL unnest(range(1, len(t) - 6)) AS u(p)
           WHERE len(t) >= 23 AND len(t) < 1048576),
         w AS (
           SELECT a.doc_id, a.pos AS wend,
             min({'h': b.h, 'np': -b.pos}) AS sel
           FROM g a JOIN g b ON a.doc_id = b.doc_id
             AND b.pos BETWEEN a.pos - 15 AND a.pos
           WHERE a.pos >= 16
           GROUP BY a.doc_id, a.pos)
         SELECT DISTINCT doc_id, -(sel.np)::BIGINT AS sel_pos, sel.h AS fingerprint
         FROM w ORDER BY doc_id, sel_pos""",

    "q_moments" ->
      """WITH a AS (
           SELECT event_type, count(*) AS n,
             sum(CAST(value::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS s1,
             sum(CAST(value::DOUBLE * value::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS s2,
             sum(CAST(value::DOUBLE * value::DOUBLE * value::DOUBLE
               AS DECIMAL(28,6)))::DOUBLE AS s3,
             sum(CAST(value::DOUBLE * value::DOUBLE * value::DOUBLE * value::DOUBLE
               AS DECIMAL(28,6)))::DOUBLE AS s4
           FROM events GROUP BY event_type)
         SELECT event_type, n,
           round(s1 / n::DOUBLE, 6) + 0 AS mean,
           round(sqrt(greatest(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE), 0.0)), 6) + 0 AS stddev,
           -- variance = 0 guard (constant-valued group): emit NULL, matching
           -- the engine's when(variance > 0, ...) instead of IEEE NaN/Inf
           CASE WHEN greatest(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE), 0.0) > 0 THEN
           round((s3 / n::DOUBLE - 3.0 * (s1 / n::DOUBLE) * (s2 / n::DOUBLE)
               + 2.0 * ((s1 / n::DOUBLE) * (s1 / n::DOUBLE) * (s1 / n::DOUBLE)))
             / (sqrt(greatest(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE), 0.0))
                * sqrt(greatest(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE), 0.0))
                * sqrt(greatest(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE), 0.0))), 6) + 0 END AS skewness,
           CASE WHEN greatest(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE), 0.0) > 0 THEN
           round((s4 / n::DOUBLE - 4.0 * (s1 / n::DOUBLE) * (s3 / n::DOUBLE)
               + 6.0 * ((s1 / n::DOUBLE) * (s1 / n::DOUBLE)) * (s2 / n::DOUBLE)
               - 3.0 * ((s1 / n::DOUBLE) * (s1 / n::DOUBLE) * (s1 / n::DOUBLE) * (s1 / n::DOUBLE)))
             / (greatest(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE), 0.0)
                * greatest(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE), 0.0)) - 3.0, 6) + 0 END AS kurtosis
         FROM a ORDER BY event_type""",

    "q_markov_acc" ->
      """WITH seq AS (
           SELECT event_type AS prev,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next
           FROM events),
         tr AS (SELECT prev, next FROM seq WHERE next IS NOT NULL),
         c AS (SELECT prev, next, count(*) AS c FROM tr GROUP BY prev, next),
         pred AS (
           SELECT prev, next AS predicted_next FROM (
             SELECT prev, next,
               row_number() OVER (PARTITION BY prev ORDER BY c DESC, next ASC) AS rn
             FROM c) WHERE rn = 1)
         SELECT t.prev AS prev_type, p.predicted_next,
           count(*) AS n_transitions,
           sum(CASE WHEN t.next = p.predicted_next THEN 1 ELSE 0 END)::BIGINT AS n_correct,
           round(sum(CASE WHEN t.next = p.predicted_next THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) + 0 AS accuracy
         FROM tr t JOIN pred p ON t.prev = p.prev
         GROUP BY t.prev, p.predicted_next
         ORDER BY prev_type""",

    "q_cm_sketch" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tc AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
         cells AS (
           SELECT j, ('0x' || substr(md5(j::VARCHAR || '|' || token), 1, 8))::BIGINT % 256 AS bucket, c
           FROM tc CROSS JOIN range(0, 4) r(j))
         SELECT j, bucket, sum(c)::BIGINT AS cnt
         FROM cells GROUP BY 1, 2 ORDER BY j, bucket""",

    "q_cm_estimate" ->
      raw"""WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tc AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
         cells AS (
           SELECT j, ('0x' || substr(md5(j::VARCHAR || '|' || token), 1, 8))::BIGINT % 256 AS bucket, c
           FROM tc CROSS JOIN range(0, 4) r(j)),
         sketch AS (SELECT j, bucket, sum(c)::BIGINT AS cnt FROM cells GROUP BY 1, 2),
         probes AS (SELECT * FROM (VALUES $CmProbesSqlValues) p(token)),
         pb AS (
           SELECT token, j, ('0x' || substr(md5(j::VARCHAR || '|' || token), 1, 8))::BIGINT % 256 AS bucket
           FROM probes CROSS JOIN range(0, 4) r(j))
         SELECT token, min(coalesce(cnt, 0))::BIGINT AS est
         FROM pb LEFT JOIN sketch USING (j, bucket)
         GROUP BY token ORDER BY token""",

    // Brute-force shared-shingle join with NO prefix pruning: hash
    // equality proves the prefix filter loses no qualifying pair.
    "q_jaccard_prefix" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM toks),
         counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, n_common,
           n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common)::DOUBLE AS jaccard
         FROM inter
         JOIN counts ca ON ca.doc_id = id_a
         JOIN counts cb ON cb.doc_id = id_b
         WHERE n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common)::DOUBLE >= 0.5
         ORDER BY id_a, id_b""",

    // Directional containment: the exploded formulation over the same
    // shingle derivation; the threshold is integer cross-multiplication
    // (n_common·5 ≥ n_a·4) on both engines — tie-exact by construction.
    "q_containment" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM toks),
         counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         ov AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, n_common,
           round(n_common::DOUBLE / ca.n_sh::DOUBLE, 6) + 0 AS containment
         FROM ov JOIN counts ca ON ca.doc_id = id_a
         WHERE n_common * 5 >= ca.n_sh * 4
         ORDER BY id_a, id_b""",

    // The full-recompute join: hash equality against the base+delta
    // assembly proves the incremental-maintenance identity.
    "q_incr_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",

    // Both cohorts' moments accumulate in one conditional decimal
    // aggregate; t / Welch-df / SMD are then the same fixed IEEE chain
    // on identical doubles in both engines.
    "q_welch_t" ->
      raw"""WITH b AS (
           SELECT source,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000 AS f,
             n_chars::DOUBLE AS v
           FROM documents),
         a AS (
           SELECT source,
             sum(CASE WHEN f THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN NOT f THEN 1 ELSE 0 END)::BIGINT AS n2,
             sum(CAST(CASE WHEN f THEN v END AS DECIMAL(28,6)))::DOUBLE AS s1,
             sum(CAST(CASE WHEN NOT f THEN v END AS DECIMAL(28,6)))::DOUBLE AS s2,
             sum(CAST(CASE WHEN f THEN v * v END AS DECIMAL(28,6)))::DOUBLE AS q1,
             sum(CAST(CASE WHEN NOT f THEN v * v END AS DECIMAL(28,6)))::DOUBLE AS q2
           FROM b GROUP BY source),
         m AS (
           -- guards mirror the engine: 0-row cohort has no mean, 1-row
           -- cohort has no variance — NULL, never a divide error
           SELECT source, n1, n2,
             CASE WHEN n1 > 0 THEN s1 / n1 END AS m1,
             CASE WHEN n2 > 0 THEN s2 / n2 END AS m2,
             CASE WHEN n1 > 1
               THEN (q1 - n1 * (s1 / n1) * (s1 / n1)) / (n1 - 1) END AS var1,
             CASE WHEN n2 > 1
               THEN (q2 - n2 * (s2 / n2) * (s2 / n2)) / (n2 - 1) END AS var2
           FROM a),
         e AS (
           SELECT source, n1, n2, m1, m2, var1, var2,
             var1 / n1 + var2 / n2 AS se2,
             coalesce(n1 > 1 AND n2 > 1
               AND var1 / n1 + var2 / n2 > 0, false) AS ok
           FROM m)
         SELECT source, n1 AS n_cohort, n2 AS n_rest,
           round(m1 - m2, 9) + 0 AS mean_diff,
           CASE WHEN ok THEN round((m1 - m2) / sqrt(se2), 6) + 0 END AS t_stat,
           CASE WHEN ok THEN round(se2 * se2 /
             ((var1 / n1) * (var1 / n1) / (n1 - 1)
              + (var2 / n2) * (var2 / n2) / (n2 - 1)), 6) + 0 END AS welch_df,
           CASE WHEN ok AND var1 + var2 > 0
             THEN round((m1 - m2) / sqrt((var1 + var2) / 2), 6) + 0 END AS smd
         FROM e ORDER BY source""",

    // The md5 hash rule makes the whole KMV sketch replicable: distinct
    // Bloom FPR: the same md5 position family (v || '#' || j mod m),
    // distinct member positions, k-row probe checkdown, exact ratio.
    "q_bloom_fpr" ->
      """WITH mem AS (SELECT DISTINCT c_custkey::VARCHAR AS v FROM customer
                      WHERE c_mktsegment = 'BUILDING'),
         prb AS (SELECT DISTINCT c_custkey::VARCHAR AS v FROM customer
                 WHERE c_mktsegment <> 'BUILDING'),
         js AS (SELECT unnest([1, 2, 3]) AS j),
         mpos AS (SELECT DISTINCT ('0x' || substr(md5(v || '#' || j), 1, 8))::BIGINT % 4096 AS pos
                  FROM mem CROSS JOIN js),
         ppos AS (SELECT v, ('0x' || substr(md5(v || '#' || j), 1, 8))::BIGINT % 4096 AS pos
                  FROM prb CROSS JOIN js),
         hits AS (SELECT p.v,
                    sum(CASE WHEN m.pos IS NOT NULL THEN 1 ELSE 0 END) AS nh
                  FROM ppos p LEFT JOIN mpos m ON m.pos = p.pos
                  GROUP BY p.v),
         agg AS (SELECT count(*)::BIGINT AS n_probes,
                   sum(CASE WHEN nh = 3 THEN 1 ELSE 0 END)::BIGINT AS n_false_pos
                 FROM hits),
         bs AS (SELECT count(*)::BIGINT AS bits_set FROM mpos),
         nm AS (SELECT count(*)::BIGINT AS n_members FROM mem)
         SELECT n_members, 4096::BIGINT AS m_bits, 3::BIGINT AS k_hashes, bits_set,
           round(bits_set::DOUBLE / 4096.0, 6) + 0 AS fill,
           n_probes, n_false_pos,
           round(n_false_pos::DOUBLE / n_probes::DOUBLE, 6) + 0 AS fpr
         FROM agg CROSS JOIN bs CROSS JOIN nm""",

    // Harmonic centrality <= 3 hops on the SimHash near-dup graph: the
    // q_modularity pair CTE, layered BFS via EXCEPT-excluded joins, and
    // the lcm(1..3) = 6 numerator so the score is one exact division.
    "q_harmonic" ->
      raw"""WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         h AS (SELECT doc_id,
             ('0x' || substr(md5('0|' || token), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5('0|' || token), 9, 8))::BIGINT AS h_hi
           FROM tok),
         bits AS (
           SELECT doc_id, b.bit,
             CASE WHEN (CASE WHEN b.bit < 32 THEN h_lo >> b.bit ELSE h_hi >> (b.bit - 32) END) & 1 = 1
               THEN 1 ELSE -1 END AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b),
         votes AS (SELECT doc_id, bit, sum(vote) AS vote_sum FROM bits GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
             sum(CASE WHEN vote_sum > 0
                   THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << bit END
                   ELSE 0 END)::BIGINT AS simhash
           FROM votes GROUP BY doc_id),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
               FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         e AS (SELECT id_a AS u, id_b AS v FROM p
               UNION SELECT id_b, id_a FROM p),
         d1 AS (SELECT DISTINCT u AS src, v AS node FROM e),
         d2 AS (SELECT DISTINCT a.src, e2.v AS node
                FROM d1 a JOIN e e2 ON e2.u = a.node
                WHERE e2.v <> a.src
                EXCEPT SELECT src, node FROM d1),
         d3 AS (SELECT DISTINCT a.src, e2.v AS node
                FROM d2 a JOIN e e2 ON e2.u = a.node
                WHERE e2.v <> a.src
                EXCEPT (SELECT src, node FROM d1 UNION ALL SELECT src, node FROM d2)),
         allv AS (SELECT src, 1 AS dist FROM d1
                  UNION ALL SELECT src, 2 FROM d2
                  UNION ALL SELECT src, 3 FROM d3)
         SELECT src AS node_id, count(*)::BIGINT AS n_reached,
           round(sum(CASE dist WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END)::DOUBLE / 6.0, 6) + 0 AS harmonic
         FROM allv GROUP BY src ORDER BY node_id""",

    // Forecast accuracy: the q_holt struct fold re-used; per-i error /
    // smape-denominator / naive lists unnest in parallel; metric
    // arithmetic mirrors the operator's division order exactly.
    "q_forecast_acc" ->
      """WITH ord AS (
           SELECT user_id,
             list(event_id ORDER BY event_id) AS ids,
             list(value ORDER BY event_id) AS vs
           FROM events WHERE value IS NOT NULL GROUP BY user_id),
         st AS (
           SELECT user_id, vs,
             list_transform(range(1, len(vs) + 1), i ->
               list_reduce(
                 list_transform(vs[1:i], x -> [x::DOUBLE, 0.0::DOUBLE]),
                 (acc, e) -> [0.5::DOUBLE * e[1] + 0.5::DOUBLE * (acc[1] + acc[2]),
                              0.25::DOUBLE * ((0.5::DOUBLE * e[1] + 0.5::DOUBLE * (acc[1] + acc[2])) - acc[1])
                                + 0.75::DOUBLE * acc[2]])) AS sts
           FROM ord),
         ex AS (
           SELECT user_id,
             unnest(list_transform(range(2, len(vs) + 1),
               i -> vs[i] - (sts[i-1][1] + sts[i-1][2]))) AS e,
             unnest(list_transform(range(2, len(vs) + 1),
               i -> abs(vs[i]) + abs(sts[i-1][1] + sts[i-1][2]))) AS ds,
             unnest(list_transform(range(2, len(vs) + 1),
               i -> abs(vs[i] - vs[i-1]))) AS nv
           FROM st),
         a AS (
           SELECT user_id, count(*)::BIGINT AS n_forecasts,
             sum(CAST(abs(e) AS DECIMAL(28,12)))::DOUBLE AS sae,
             sum(CAST(CASE WHEN ds > 0 THEN 2.0::DOUBLE * abs(e) / ds
                           ELSE 0.0::DOUBLE END AS DECIMAL(28,12)))::DOUBLE AS ssm,
             sum(CAST(nv AS DECIMAL(28,12)))::DOUBLE AS snv
           FROM ex GROUP BY user_id)
         SELECT user_id, n_forecasts,
           round(sae / n_forecasts::DOUBLE, 6) + 0 AS mae,
           round(ssm / n_forecasts::DOUBLE, 6) + 0 AS smape,
           CASE WHEN snv > 0
             THEN round((sae / n_forecasts::DOUBLE) / (snv / n_forecasts::DOUBLE), 6) + 0
           END AS mase
         FROM a ORDER BY user_id""",

    // CCF: dense generate_series day grid, zero-filled decimal daily
    // sums, the decCorr formula per lag — identical op order.
    "q_ccf" ->
      """WITH daily AS (
           SELECT ts::DATE AS day, event_type AS t,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS s
           FROM events WHERE event_type IN ('view', 'purchase')
           GROUP BY 1, 2),
         b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
         grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM b),
         va AS (SELECT g.day, coalesce(d.s, 0.0::DOUBLE) AS v
                FROM grid g LEFT JOIN daily d ON d.day = g.day AND d.t = 'view'),
         vb AS (SELECT g.day, coalesce(d.s, 0.0::DOUBLE) AS v
                FROM grid g LEFT JOIN daily d ON d.day = g.day AND d.t = 'purchase'),
         lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag),
         j AS (
           SELECT lags.lag, va.v AS x, vb.v AS y
           FROM lags
           JOIN va ON true
           JOIN vb ON vb.day = va.day + to_days(lags.lag::INTEGER)),
         a AS (
           SELECT lag, count(*)::BIGINT AS n_days,
             count(x)::DOUBLE AS n,
             sum(CAST(x AS DECIMAL(28,6)))::DOUBLE AS sx,
             sum(CAST(y AS DECIMAL(28,6)))::DOUBLE AS sy,
             sum(CAST(x*x AS DECIMAL(28,6)))::DOUBLE AS sxx,
             sum(CAST(y*y AS DECIMAL(28,6)))::DOUBLE AS syy,
             sum(CAST(x*y AS DECIMAL(28,6)))::DOUBLE AS sxy
           FROM j GROUP BY lag)
         SELECT lag::BIGINT AS lag, n_days,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) + 0 AS ccf
         FROM a ORDER BY lag""",

    // Lorenz: the same value-catalog cumulative windows, straddling tie
    // class per point with the exact excess-member correction.
    "q_lorenz" ->
      """WITH b AS (SELECT n_chars::DOUBLE AS v FROM documents WHERE n_chars IS NOT NULL),
         g AS (SELECT v, count(*)::BIGINT AS c FROM b GROUP BY v),
         cum AS (
           SELECT v, c,
             sum(c) OVER w AS ccnt,
             sum(CAST(v * c::DOUBLE AS DECIMAL(28,6))) OVER w::DOUBLE AS csum
           FROM g WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t AS (SELECT sum(c)::BIGINT AS n,
                 sum(CAST(v * c::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS tt
               FROM g),
         pts AS (
           SELECT p, n, tt, (p * n // 10)::BIGINT AS idx
           FROM t CROSS JOIN (SELECT unnest(range(1, 11)) AS p))
         SELECT p::BIGINT AS point,
           round(idx::DOUBLE / n::DOUBLE, 6) + 0 AS pop_share,
           CASE WHEN tt > 0
             THEN round(coalesce(csum - (ccnt - idx)::DOUBLE * v, 0.0) / tt, 6) + 0
           END AS value_share
         FROM pts
         LEFT JOIN cum ON ccnt >= idx AND ccnt - c < idx
         ORDER BY point""",

    // QQ drift: the same rank-pick rule (rn = 1 + floor(q(n-1))) per
    // cohort, pivoted per quantile.
    "q_qq_drift" ->
      """WITH b AS (
           SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000 AS a,
             n_chars::DOUBLE AS v
           FROM documents WHERE n_chars IS NOT NULL),
         r AS (
           SELECT a, v,
             row_number() OVER (PARTITION BY a ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY a) AS n
           FROM b),
         qs AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]::DOUBLE[]) AS q),
         p AS (
           SELECT r.a, r.v, qs.q
           FROM r CROSS JOIN qs
           WHERE r.rn = 1 + floor(qs.q * (r.n - 1)::DOUBLE)::BIGINT)
         SELECT q,
           max(CASE WHEN a THEN v END) AS v_a,
           max(CASE WHEN NOT a THEN v END) AS v_b,
           round(max(CASE WHEN NOT a THEN v END) - max(CASE WHEN a THEN v END), 6) + 0 AS diff
         FROM p GROUP BY q ORDER BY q""",

    // Changepoint: the same prefix-sum windows, candidate costs, and
    // the argmin via (cost, k)-ordered row_number — identical doubles
    // both sides, ties to the smallest split.
    "q_changepoint" ->
      """WITH b AS (
           SELECT user_id, event_id, value::DOUBLE AS v,
             row_number() OVER w AS k,
             sum(CAST(value AS DECIMAL(28,6))) OVER w::DOUBLE AS s1,
             sum(CAST(value*value AS DECIMAL(28,6))) OVER w::DOUBLE AS s2,
             count(*) OVER wa AS n,
             sum(CAST(value AS DECIMAL(28,6))) OVER wa::DOUBLE AS t1,
             sum(CAST(value*value AS DECIMAL(28,6))) OVER wa::DOUBLE AS t2
           FROM events
           WHERE value IS NOT NULL
           WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  wa AS (PARTITION BY user_id)),
         c AS (
           SELECT user_id, event_id, k, n, t1, t2,
             (s2 - s1*s1/k::DOUBLE)
               + ((t2 - s2) - (t1 - s1)*(t1 - s1)/(n - k)::DOUBLE) AS cost,
             t2 - t1*t1/n::DOUBLE AS total
           FROM b WHERE k < n),
         r AS (
           SELECT user_id, k, event_id, cost, total, n,
             row_number() OVER (PARTITION BY user_id ORDER BY cost ASC, k ASC) AS rn
           FROM c)
         SELECT user_id, n::BIGINT AS n, k::BIGINT AS split_k,
           event_id AS split_order,
           round(cost, 6) + 0 AS sse_split,
           round(total, 6) + 0 AS sse_total,
           CASE WHEN total > 0 THEN round((total - cost) / total, 6) + 0 END AS gain_ratio
         FROM r WHERE rn = 1 ORDER BY user_id""",

    // CUPED: the same conditional decimal pre/post sums per user, one
    // moment aggregate, the identical fixed IEEE theta/variance shapes.
    "q_cuped" ->
      """WITH per AS (
           SELECT user_id,
             sum(CAST(CASE WHEN date_part('day', ts) < 16 THEN value ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS x,
             sum(CAST(CASE WHEN NOT (date_part('day', ts) < 16) THEN value ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS y
           FROM events WHERE value IS NOT NULL GROUP BY user_id),
         m AS (
           SELECT count(*)::BIGINT AS n,
             sum(CAST(x AS DECIMAL(28,6)))::DOUBLE AS sx,
             sum(CAST(y AS DECIMAL(28,6)))::DOUBLE AS sy,
             sum(CAST(x*x AS DECIMAL(28,6)))::DOUBLE AS sxx,
             sum(CAST(y*y AS DECIMAL(28,6)))::DOUBLE AS syy,
             sum(CAST(x*y AS DECIMAL(28,6)))::DOUBLE AS sxy
           FROM per),
         v AS (
           SELECT n,
             CASE WHEN n > 1 THEN (sxx - sx*sx/n::DOUBLE)/n::DOUBLE END AS varx,
             CASE WHEN n > 1 THEN (syy - sy*sy/n::DOUBLE)/n::DOUBLE END AS vary,
             CASE WHEN n > 1 THEN (sxy - sx*sy/n::DOUBLE)/n::DOUBLE END AS covxy
           FROM m)
         SELECT n AS n_units,
           CASE WHEN n > 1 AND varx > 0 THEN round(covxy/varx, 6) + 0 END AS theta,
           round(vary, 6) + 0 AS var_raw,
           CASE WHEN n > 1 AND varx > 0
                THEN round(vary - covxy*covxy/varx, 6) + 0 END AS var_adj,
           CASE WHEN n > 1 AND varx > 0 AND vary > 0
                THEN round(100.0*(covxy*covxy/varx)/vary, 6) + 0 END AS var_reduction_pct
         FROM v""",

    // Hash-uniformity: the same md5-prefix bucketing, the empty-bucket
    // catalog left join, and the exact integer (B·n_b − n)² numerator.
    "q_hash_uniformity" ->
      """WITH b AS (
           SELECT ('0x' || substr(md5(c_custkey::VARCHAR), 1, 8))::BIGINT % 16 AS bkt,
             count(*)::BIGINT AS c
           FROM customer WHERE c_custkey IS NOT NULL GROUP BY 1),
         f AS (
           SELECT r.range AS bkt, coalesce(bb.c, 0)::BIGINT AS c
           FROM range(0, 16) r LEFT JOIN b bb ON bb.bkt = r.range),
         t AS (SELECT sum(c)::BIGINT AS n FROM f),
         s AS (
           SELECT t.n AS n, min(f.c) AS min_bucket, max(f.c) AS max_bucket,
             sum(CAST((16*f.c - t.n)*(16*f.c - t.n) AS DECIMAL(38,0))) AS num
           FROM f CROSS JOIN t GROUP BY t.n)
         SELECT n, 16::BIGINT AS n_buckets, min_bucket, max_bucket,
           CASE WHEN n > 0 THEN round(num::DOUBLE/(16.0*n::DOUBLE), 6) + 0 END AS chi2,
           CASE WHEN n > 0 THEN num::DOUBLE/(16.0*n::DOUBLE) < 24.996 END AS uniform_ok
         FROM s""",

    // Gumbel tail: identical daily-max blocks, decimal moments, and the
    // same 9-dp rounded constant literals (ln/π differ in final ulps
    // across engines; a ≤15-digit decimal literal does not).
    "q_gumbel_tail" -> gumbelTailSql(Seq(10, 100, 1000)),

    // JSD: per-source token counts from the standard tokenization (the
    // TokenStore recipe), shared-token inner join, 9-dp-rounded ln
    // outputs before the count products, ln 2 as the 9-dp literal.
    "q_jsd" ->
      raw"""WITH tok AS (
           SELECT d.source,
             unnest(list_filter(string_split_regex(d.text, '\s+'), x -> x <> '')) AS token
           FROM documents d),
         cnt AS (SELECT source, token, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
         tot AS (SELECT source, sum(c)::BIGINT AS n FROM cnt GROUP BY 1),
         sh AS (
           SELECT a.source AS label_a, b.source AS label_b,
             sum(a.c)::BIGINT AS sa, sum(b.c)::BIGINT AS sb,
             sum(CAST(a.c::DOUBLE * (round(ln(2.0*(a.c::DOUBLE*nb.n::DOUBLE)
                   /(a.c::DOUBLE*nb.n::DOUBLE + b.c::DOUBLE*na.n::DOUBLE)), 9) + 0)
                 AS DECIMAL(28,12)))::DOUBLE AS ta,
             sum(CAST(b.c::DOUBLE * (round(ln(2.0*(b.c::DOUBLE*na.n::DOUBLE)
                   /(a.c::DOUBLE*nb.n::DOUBLE + b.c::DOUBLE*na.n::DOUBLE)), 9) + 0)
                 AS DECIMAL(28,12)))::DOUBLE AS tb
           FROM cnt a JOIN cnt b ON a.token = b.token AND a.source < b.source
           JOIN tot na ON na.source = a.source
           JOIN tot nb ON nb.source = b.source
           GROUP BY 1, 2),
         pairs AS (
           SELECT na.source AS label_a, nb.source AS label_b, na.n AS na, nb.n AS nb
           FROM tot na JOIN tot nb ON na.source < nb.source)
         SELECT p.label_a, p.label_b, p.na AS n_tokens_a, p.nb AS n_tokens_b,
           round(0.5*(coalesce(ta, 0.0)/p.na::DOUBLE + coalesce(tb, 0.0)/p.nb::DOUBLE
             + (1.0 - coalesce(sa, 0)::DOUBLE/p.na::DOUBLE)*0.693147181
             + (1.0 - coalesce(sb, 0)::DOUBLE/p.nb::DOUBLE)*0.693147181), 6) + 0 AS jsd_nats,
           round((0.5*(coalesce(ta, 0.0)/p.na::DOUBLE + coalesce(tb, 0.0)/p.nb::DOUBLE
             + (1.0 - coalesce(sa, 0)::DOUBLE/p.na::DOUBLE)*0.693147181
             + (1.0 - coalesce(sb, 0)::DOUBLE/p.nb::DOUBLE)*0.693147181))/0.693147181, 6) + 0 AS jsd_norm
         FROM pairs p LEFT JOIN sh ON sh.label_a = p.label_a AND sh.label_b = p.label_b
         ORDER BY p.label_a, p.label_b""",

    // Permutation test: the same md5-parity observed split, 64
    // hash32(unit#r) relabelings over the per-unit decimal sums,
    // identical fixed-shape means, add-one p.
    "q_perm_test" ->
      """WITH u AS (
           SELECT user_id AS uu,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS x,
             (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS obsa
           FROM events WHERE value IS NOT NULL GROUP BY user_id),
         obs AS (
           SELECT count(*)::BIGINT AS n_units,
             sum(CASE WHEN obsa THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN NOT obsa THEN 1 ELSE 0 END)::BIGINT AS n_b,
             CASE WHEN sum(CASE WHEN obsa THEN 1 ELSE 0 END) > 0
                   AND sum(CASE WHEN NOT obsa THEN 1 ELSE 0 END) > 0 THEN
               sum(CAST(CASE WHEN obsa THEN x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN obsa THEN 1 ELSE 0 END)::DOUBLE
               - sum(CAST(CASE WHEN NOT obsa THEN x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN NOT obsa THEN 1 ELSE 0 END)::DOUBLE
             END AS dobs
           FROM u),
         reps AS (
           SELECT s.r AS r,
             CASE WHEN sum(CASE WHEN s.perma THEN 1 ELSE 0 END) > 0
                   AND sum(CASE WHEN NOT s.perma THEN 1 ELSE 0 END) > 0 THEN
               sum(CAST(CASE WHEN s.perma THEN s.x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN s.perma THEN 1 ELSE 0 END)::DOUBLE
               - sum(CAST(CASE WHEN NOT s.perma THEN s.x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN NOT s.perma THEN 1 ELSE 0 END)::DOUBLE
             END AS dr
           FROM (
             SELECT u.x AS x, r.range AS r,
               (('0x' || substr(md5(u.uu::VARCHAR || '#' || r.range::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS perma
             FROM u CROSS JOIN range(1, 65) r) s
           GROUP BY s.r),
         e AS (
           SELECT sum(CASE WHEN abs(r.dr) >= abs(o.dobs) THEN 1 ELSE 0 END)::BIGINT AS k
           FROM reps r CROSS JOIN obs o)
         SELECT o.n_units, o.n_a, o.n_b,
           round(o.dobs, 6) + 0 AS obs_diff,
           CASE WHEN o.dobs IS NOT NULL THEN e.k END AS n_extreme,
           CASE WHEN o.dobs IS NOT NULL
                THEN round((e.k + 1)::DOUBLE / 65.0, 6) + 0 END AS p_value
         FROM obs o CROSS JOIN e""",

    // James–Stein: identical decimal group moments, the same fixed
    // IEEE m̄/S/pooled-variance/shrinkage shapes, broadcast back.
    "q_james_stein" ->
      """WITH g AS (
           SELECT source, count(*)::BIGINT AS n,
             sum(CAST(n_chars::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS s,
             sum(CAST(n_chars::DOUBLE * n_chars::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS q
           FROM documents WHERE n_chars IS NOT NULL GROUP BY source),
         g2 AS (SELECT source, n, s, q, s/n::DOUBLE AS m FROM g),
         t AS (
           SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS ntot,
             sum(CAST(m AS DECIMAL(28,12)))::DOUBLE AS sm,
             sum(CAST(m*m AS DECIMAL(28,12)))::DOUBLE AS smm,
             sum(CAST(q AS DECIMAL(28,6)))::DOUBLE AS qtot,
             sum(CAST(n::DOUBLE*m*m AS DECIMAL(28,6)))::DOUBLE AS expl
           FROM g2),
         t2 AS (
           SELECT k, ntot, sm/k::DOUBLE AS mbar,
             smm - k::DOUBLE*(sm/k::DOUBLE)*(sm/k::DOUBLE) AS bigs,
             CASE WHEN ntot > k THEN (qtot - expl)/(ntot - k)::DOUBLE END AS pooledvar
           FROM t),
         t3 AS (
           SELECT k, mbar, bigs, pooledvar/(ntot::DOUBLE/k::DOUBLE) AS vhat FROM t2),
         t4 AS (
           SELECT mbar,
             CASE WHEN k <= 3 THEN NULL
                  WHEN bigs > 0 THEN greatest(0.0, 1.0 - (k - 3)::DOUBLE*vhat/bigs)
                  ELSE 0.0 END AS c
           FROM t3)
         SELECT g2.source, g2.n AS n,
           round(g2.m, 6) + 0 AS mean_raw,
           round(t4.c, 6) + 0 AS shrink_c,
           round(t4.mbar + t4.c*(g2.m - t4.mbar), 6) + 0 AS mean_shrunk
         FROM g2 CROSS JOIN t4 ORDER BY g2.source""",

    // Conformal: the same per-unit lag residuals rounded at definition,
    // the value-catalog cumulative quantile pick, identical ceil index.
    "q_conformal" ->
      """WITH s0 AS (
           SELECT user_id, event_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
           FROM events WHERE value IS NOT NULL),
         sc AS (
           SELECT (date_part('day', ts) < 16) AS cal,
             round(abs(value - prev), 6) + 0 AS score
           FROM s0 WHERE prev IS NOT NULL),
         ncal AS (SELECT count(*)::BIGINT AS n_cal FROM sc WHERE cal),
         cum AS (
           SELECT score, count(*)::BIGINT AS c,
             sum(count(*)) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS ccnt
           FROM sc WHERE cal GROUP BY score),
         pick AS (
           SELECT cum.score AS qhat
           FROM cum CROSS JOIN ncal
           WHERE ccnt >= least(ceil(0.9*(n_cal + 1)::DOUBLE)::BIGINT, n_cal)
             AND ccnt - c < least(ceil(0.9*(n_cal + 1)::DOUBLE)::BIGINT, n_cal)),
         qq AS (SELECT ncal.n_cal, pick.qhat FROM ncal LEFT JOIN pick ON TRUE),
         ev AS (
           SELECT count(*)::BIGINT AS n_eval,
             sum(CASE WHEN sc.score <= qq.qhat THEN 1 ELSE 0 END)::BIGINT AS cov
           FROM sc CROSS JOIN qq WHERE NOT sc.cal)
         SELECT qq.n_cal, ev.n_eval, round(qq.qhat, 6) + 0 AS q_hat,
           CASE WHEN ev.n_eval > 0 AND qq.qhat IS NOT NULL
                THEN round(ev.cov::DOUBLE / ev.n_eval::DOUBLE, 6) + 0 END AS coverage,
           0.9::DOUBLE AS target
         FROM qq CROSS JOIN ev""",

    // Simpson's screen: identical decimal moments per group and pooled
    // (both from the row level), the same cov/varX slope shape, sign
    // comparisons on the unrounded doubles.
    "q_simpsons_paradox" ->
      """WITH b AS (
           SELECT event_type, date_part('day', ts)::DOUBLE AS x, value AS y
           FROM events
           WHERE date_part('day', ts) IS NOT NULL AND value IS NOT NULL),
         g AS (
           SELECT event_type, count(*)::BIGINT AS n,
             sum(CAST(x AS DECIMAL(28,6)))::DOUBLE AS sx,
             sum(CAST(y AS DECIMAL(28,6)))::DOUBLE AS sy,
             sum(CAST(x*y AS DECIMAL(28,6)))::DOUBLE AS sxy,
             sum(CAST(x*x AS DECIMAL(28,6)))::DOUBLE AS sxx
           FROM b GROUP BY 1),
         g2 AS (
           SELECT event_type, n,
             CASE WHEN n > 1 AND (sxx - sx*sx/n::DOUBLE) > 0
                  THEN (sxy - sx*sy/n::DOUBLE)/(sxx - sx*sx/n::DOUBLE) END AS sg
           FROM g),
         p AS (
           SELECT count(*)::BIGINT AS n,
             sum(CAST(x AS DECIMAL(28,6)))::DOUBLE AS sx,
             sum(CAST(y AS DECIMAL(28,6)))::DOUBLE AS sy,
             sum(CAST(x*y AS DECIMAL(28,6)))::DOUBLE AS sxy,
             sum(CAST(x*x AS DECIMAL(28,6)))::DOUBLE AS sxx
           FROM b),
         ps AS (
           SELECT CASE WHEN n > 1 AND (sxx - sx*sx/n::DOUBLE) > 0
                  THEN (sxy - sx*sy/n::DOUBLE)/(sxx - sx*sx/n::DOUBLE) END AS sa
           FROM p)
         SELECT g2.event_type, g2.n AS n,
           round(g2.sg, 6) + 0 AS slope_group,
           round(ps.sa, 6) + 0 AS slope_pooled,
           CASE WHEN g2.sg IS NOT NULL AND ps.sa IS NOT NULL
                THEN (g2.sg > 0 AND ps.sa < 0) OR (g2.sg < 0 AND ps.sa > 0)
           END AS reversed
         FROM g2 CROSS JOIN ps ORDER BY g2.event_type""",

    // SPRT: the same daily integer hit/miss counts, 9-dp literal
    // increments and boundaries, decimal-summed catalog walk, and
    // first-crossing-day decision.
    "q_sprt" -> sprtSql(p0 = 0.10, p1 = 0.15, alpha = 0.05, beta = 0.05),

    // e-process: the same walk in log space, cumulative max, literal
    // ln(1/α) gate — generated with the shared 9-dp constants.
    "q_evalue" -> eProcessSql(p0 = 0.10, p1 = 0.15, alpha = 0.05),

    // Stratified permutation: identical unit moments, length(bin(n))
    // strata, per-(stratum, replica) hash-order rank labeling preserving
    // observed stratum cohort sizes, exact add-one rational p.
    "q_perm_test_strat" ->
      """WITH u AS (
           SELECT user_id AS uu,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS x,
             length(bin(count(*)::BIGINT))::INT AS stratum,
             (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS obsa
           FROM events WHERE value IS NOT NULL GROUP BY user_id),
         sc AS (
           SELECT stratum, sum(CASE WHEN obsa THEN 1 ELSE 0 END)::BIGINT AS nas
           FROM u GROUP BY stratum),
         obs AS (
           SELECT count(*)::BIGINT AS n_units,
             count(DISTINCT stratum)::BIGINT AS n_strata,
             sum(CASE WHEN obsa THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN NOT obsa THEN 1 ELSE 0 END)::BIGINT AS n_b,
             CASE WHEN sum(CASE WHEN obsa THEN 1 ELSE 0 END) > 0
                   AND sum(CASE WHEN NOT obsa THEN 1 ELSE 0 END) > 0 THEN
               sum(CAST(CASE WHEN obsa THEN x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN obsa THEN 1 ELSE 0 END)::DOUBLE
               - sum(CAST(CASE WHEN NOT obsa THEN x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN NOT obsa THEN 1 ELSE 0 END)::DOUBLE
             END AS dobs
           FROM u),
         fan AS (
           SELECT u.uu, u.x, u.stratum, r.range AS r,
             ('0x' || substr(md5(u.uu::VARCHAR || '#' || r.range::VARCHAR), 1, 8))::BIGINT AS h
           FROM u CROSS JOIN range(1, 65) r),
         ranked AS (
           SELECT stratum, r, x,
             row_number() OVER (PARTITION BY stratum, r ORDER BY h ASC, uu ASC) AS rn
           FROM fan),
         labeled AS (
           SELECT ranked.r AS r, ranked.x AS x, (ranked.rn <= sc.nas) AS perma
           FROM ranked JOIN sc USING (stratum)),
         reps AS (
           SELECT r,
             CASE WHEN sum(CASE WHEN perma THEN 1 ELSE 0 END) > 0
                   AND sum(CASE WHEN NOT perma THEN 1 ELSE 0 END) > 0 THEN
               sum(CAST(CASE WHEN perma THEN x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN perma THEN 1 ELSE 0 END)::DOUBLE
               - sum(CAST(CASE WHEN NOT perma THEN x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN NOT perma THEN 1 ELSE 0 END)::DOUBLE
             END AS dr
           FROM labeled GROUP BY r),
         e AS (
           SELECT sum(CASE WHEN abs(r.dr) >= abs(o.dobs) THEN 1 ELSE 0 END)::BIGINT AS k
           FROM reps r CROSS JOIN obs o)
         SELECT o.n_units, o.n_strata, o.n_a, o.n_b,
           round(o.dobs, 6) + 0 AS obs_diff,
           CASE WHEN o.dobs IS NOT NULL THEN e.k END AS n_extreme,
           CASE WHEN o.dobs IS NOT NULL
                THEN round((e.k + 1)::DOUBLE / 65.0, 6) + 0 END AS p_value
         FROM obs o CROSS JOIN e""",

    // Kendall τ-b: identical daily (count, decimal sum) rollups, exact
    // integer concordance classification, one √ at the end.
    "q_kendall" ->
      """WITH daily AS (
           SELECT event_type AS k, CAST(ts AS DATE) AS day, count(*)::BIGINT AS x,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS y
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
         pairs AS (
           SELECT a.k AS k,
             (CASE WHEN a.x < b.x THEN 1 WHEN a.x > b.x THEN -1 ELSE 0 END) AS sx,
             (CASE WHEN a.y < b.y THEN 1 WHEN a.y > b.y THEN -1 ELSE 0 END) AS sy
           FROM daily a JOIN daily b ON a.k = b.k AND a.day < b.day),
         agg AS (
           SELECT k, count(*)::BIGINT AS n_pairs,
             sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END)::BIGINT AS concordant,
             sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END)::BIGINT AS discordant,
             sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END)::BIGINT AS tx,
             sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END)::BIGINT AS ty
           FROM pairs GROUP BY k)
         SELECT k AS event_type, n_pairs, concordant, discordant,
           CASE WHEN sqrt((n_pairs - tx)::DOUBLE * (n_pairs - ty)::DOUBLE) > 0
                THEN round((concordant - discordant)::DOUBLE /
                  sqrt((n_pairs - tx)::DOUBLE * (n_pairs - ty)::DOUBLE), 6) + 0
           END AS tau_b
         FROM agg ORDER BY event_type""",

    // Kruskal–Wallis: the same value catalog, integer doubled-midrank
    // rank sums, decimal(38,0) tie term, identical H/correction shapes.
    "q_kruskal" ->
      """WITH b AS (
           SELECT source AS g, n_chars AS v FROM documents WHERE n_chars IS NOT NULL),
         cat AS (SELECT v, count(*)::BIGINT AS t FROM b GROUP BY v),
         cum AS (
           SELECT v, t, sum(t) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS ccnt
           FROM cat),
         gv AS (SELECT g, v, count(*)::BIGINT AS ngv FROM b GROUP BY g, v),
         r AS (
           SELECT g, sum(ngv)::BIGINT AS ng,
             sum(CAST(ngv AS DECIMAL(38,0)) * (2 * ccnt - t + 1))
               ::DECIMAL(38,0) AS r2
           FROM gv JOIN cum USING (v) GROUP BY g),
         pg AS (
           SELECT count(*)::BIGINT AS n_groups, sum(ng)::BIGINT AS n,
             sum(CAST(r2::DOUBLE * r2::DOUBLE / (4.0 * ng::DOUBLE)
               AS DECIMAL(28,6)))::DOUBLE AS sr
           FROM r),
         tie AS (
           SELECT coalesce(sum(CAST(t AS DECIMAL(38,0)) * t * t - t),
             0::DECIMAL(38,0)) AS tieterm
           FROM cat)
         SELECT n, n_groups, (n_groups - 1)::BIGINT AS df,
           CASE WHEN n > 1 AND n_groups > 1
                THEN round(12.0 / (n::DOUBLE * (n::DOUBLE + 1.0)) * sr
                  - 3.0 * (n::DOUBLE + 1.0), 6) + 0 END AS h,
           CASE WHEN n > 1 AND n_groups > 1 AND
                  (1.0 - tieterm::DOUBLE / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)) > 0
                THEN round((12.0 / (n::DOUBLE * (n::DOUBLE + 1.0)) * sr
                    - 3.0 * (n::DOUBLE + 1.0)) /
                  (1.0 - tieterm::DOUBLE / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)),
                  6) + 0 END AS h_adj
         FROM pg CROSS JOIN tie""",

    // Cochran–Armitage: exact integer score sums, the same p̄/variance
    // shapes, one √.
    "q_trend_test" ->
      """WITH daily AS (
           SELECT date_part('day', ts)::BIGINT AS s, count(*)::BIGINT AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS h
           FROM events
           WHERE (event_type = 'purchase') IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         agg AS (
           SELECT count(*)::BIGINT AS n_days, sum(n)::BIGINT AS n,
             sum(h)::BIGINT AS n_hit,
             sum(s * h)::BIGINT AS sh, sum(s * n)::BIGINT AS sn,
             sum(s * s * n)::BIGINT AS ssn
           FROM daily)
         SELECT n_days, n, n_hit,
           round(sh::DOUBLE - (n_hit::DOUBLE / n::DOUBLE) * sn::DOUBLE, 6) + 0
             AS trend_stat,
           CASE WHEN n > 0 AND
                  (n_hit::DOUBLE / n::DOUBLE) * (1.0 - n_hit::DOUBLE / n::DOUBLE) *
                    (ssn::DOUBLE - sn::DOUBLE * sn::DOUBLE / n::DOUBLE) > 0
                THEN round((sh::DOUBLE - (n_hit::DOUBLE / n::DOUBLE) * sn::DOUBLE) /
                  sqrt((n_hit::DOUBLE / n::DOUBLE) * (1.0 - n_hit::DOUBLE / n::DOUBLE) *
                    (ssn::DOUBLE - sn::DOUBLE * sn::DOUBLE / n::DOUBLE)), 6) + 0
           END AS z
         FROM agg""",

    // Mantel–Haenszel: identical per-day 2×2 integer cells, per-stratum
    // double divisions decimal-snapshotted at 9, one final division.
    "q_mh_odds" ->
      """WITH e AS (
           SELECT CAST(ts AS DATE) AS s,
             (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS expo,
             (event_type = 'purchase') AS hit
           FROM events),
         cells AS (
           SELECT s,
             sum(CASE WHEN expo AND hit THEN 1 ELSE 0 END)::BIGINT AS a,
             sum(CASE WHEN expo AND NOT hit THEN 1 ELSE 0 END)::BIGINT AS b,
             sum(CASE WHEN NOT expo AND hit THEN 1 ELSE 0 END)::BIGINT AS c,
             sum(CASE WHEN NOT expo AND NOT hit THEN 1 ELSE 0 END)::BIGINT AS d
           FROM e WHERE expo IS NOT NULL AND hit IS NOT NULL GROUP BY s),
         agg AS (
           SELECT count(*)::BIGINT AS n_strata,
             sum(a + b + c + d)::BIGINT AS n,
             sum(CAST(a::DOUBLE * d::DOUBLE / (a + b + c + d)::DOUBLE
               AS DECIMAL(28,9)))::DOUBLE AS num,
             sum(CAST(b::DOUBLE * c::DOUBLE / (a + b + c + d)::DOUBLE
               AS DECIMAL(28,9)))::DOUBLE AS den
           FROM cells)
         SELECT n_strata, n,
           round(num, 6) + 0 AS sum_ad_over_n,
           round(den, 6) + 0 AS sum_bc_over_n,
           CASE WHEN den > 0 THEN round(num / den, 6) + 0 END AS or_mh
         FROM agg""",

    // BH FDR: the same per-group unit moments and md5 relabelings as
    // q_perm_test (32 replicas per segment), exact rational p per group,
    // then the identical step-up machinery — ascending rank window,
    // reversed cumulative-min adjusted p, max-passing-rank cut.
    "q_bh_fdr" ->
      """WITH u AS (
           SELECT event_type AS g, user_id AS uu,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS x,
             (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS obsa
           FROM events WHERE value IS NOT NULL GROUP BY event_type, user_id),
         obs AS (
           SELECT g, count(*)::BIGINT AS n_units,
             CASE WHEN sum(CASE WHEN obsa THEN 1 ELSE 0 END) > 0
                   AND sum(CASE WHEN NOT obsa THEN 1 ELSE 0 END) > 0 THEN
               sum(CAST(CASE WHEN obsa THEN x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN obsa THEN 1 ELSE 0 END)::DOUBLE
               - sum(CAST(CASE WHEN NOT obsa THEN x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN NOT obsa THEN 1 ELSE 0 END)::DOUBLE
             END AS dobs
           FROM u GROUP BY g),
         reps AS (
           SELECT s.g AS g, s.r AS r,
             CASE WHEN sum(CASE WHEN s.perma THEN 1 ELSE 0 END) > 0
                   AND sum(CASE WHEN NOT s.perma THEN 1 ELSE 0 END) > 0 THEN
               sum(CAST(CASE WHEN s.perma THEN s.x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN s.perma THEN 1 ELSE 0 END)::DOUBLE
               - sum(CAST(CASE WHEN NOT s.perma THEN s.x ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE
                 / sum(CASE WHEN NOT s.perma THEN 1 ELSE 0 END)::DOUBLE
             END AS dr
           FROM (
             SELECT u.g AS g, u.x AS x, r.range AS r,
               (('0x' || substr(md5(u.uu::VARCHAR || '#' || r.range::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS perma
             FROM u CROSS JOIN range(1, 33) r) s
           GROUP BY s.g, s.r),
         e AS (
           SELECT r.g AS g,
             sum(CASE WHEN abs(r.dr) >= abs(o.dobs) THEN 1 ELSE 0 END)::BIGINT AS k2
           FROM reps r JOIN obs o USING (g) GROUP BY r.g),
         p AS (
           SELECT o.g AS g,
             CASE WHEN o.dobs IS NOT NULL
                  THEN round((e.k2 + 1)::DOUBLE / 33.0, 6) + 0 END AS p
           FROM obs o LEFT JOIN e USING (g)),
         ranked AS (
           SELECT g, p, row_number() OVER (ORDER BY p ASC, g ASC) AS i,
             count(*) OVER () AS m
           FROM p WHERE p IS NOT NULL),
         adj AS (
           SELECT g, p, i, m,
             least(1.0, min(p * m::DOUBLE / i::DOUBLE) OVER (ORDER BY p DESC, g DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS padj,
             CASE WHEN p <= i::DOUBLE * 0.1 / m::DOUBLE THEN i END AS passes
           FROM ranked),
         cut AS (SELECT max(passes) AS cut FROM adj)
         SELECT g AS event_type, p AS p_value, i AS p_rank,
           round(padj, 6) + 0 AS p_adj,
           coalesce(i <= cut.cut, false) AS significant
         FROM adj CROSS JOIN cut ORDER BY event_type""",

    // CvM: identical per-(group, value) cohort counts, cumulative ECDFs
    // over the value catalog, squared-gap terms decimal-snapshotted.
    "q_cvm_drift" ->
      """WITH b AS (
           SELECT event_type AS g, value AS v,
             (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS ina
           FROM events WHERE value IS NOT NULL),
         cat AS (
           SELECT g, v,
             sum(CASE WHEN ina THEN 1 ELSE 0 END)::BIGINT AS ca,
             sum(CASE WHEN NOT ina THEN 1 ELSE 0 END)::BIGINT AS cb
           FROM b GROUP BY g, v),
         cum AS (
           SELECT g, v, ca, cb,
             sum(ca) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS fa,
             sum(cb) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS fb,
             sum(ca) OVER (PARTITION BY g)::BIGINT AS n,
             sum(cb) OVER (PARTITION BY g)::BIGINT AS m
           FROM cat),
         agg AS (
           SELECT g, max(n)::BIGINT AS n_a, max(m)::BIGINT AS n_b,
             sum(CAST((ca + cb)::DOUBLE *
               (CASE WHEN n > 0 AND m > 0
                     THEN fa::DOUBLE / n::DOUBLE - fb::DOUBLE / m::DOUBLE
                     ELSE 0.0 END) *
               (CASE WHEN n > 0 AND m > 0
                     THEN fa::DOUBLE / n::DOUBLE - fb::DOUBLE / m::DOUBLE
                     ELSE 0.0 END) AS DECIMAL(28,9)))::DOUBLE AS s
           FROM cum GROUP BY g)
         SELECT g AS event_type, n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN round(n_a::DOUBLE * n_b::DOUBLE /
                  ((n_a + n_b)::DOUBLE * (n_a + n_b)::DOUBLE) * s, 6) + 0
           END AS cvm_stat
         FROM agg ORDER BY event_type""",

    // Friedman: identical complete-block daily means, in-block doubled
    // midranks, the same general-ties Q shapes.
    "q_friedman" ->
      """WITH cells AS (
           SELECT CAST(ts AS DATE) AS d, event_type AS g,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)::DOUBLE AS v
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
         kk AS (SELECT count(DISTINCT g)::BIGINT AS k FROM cells),
         complete AS (
           SELECT c.d, c.g, c.v
           FROM cells c
           JOIN (SELECT d, count(*)::BIGINT AS kd FROM cells GROUP BY d) cd
             ON c.d = cd.d
           CROSS JOIN kk WHERE cd.kd = kk.k),
         r2 AS (
           SELECT d, g,
             (2 * rank() OVER (PARTITION BY d ORDER BY v)
               + count(*) OVER (PARTITION BY d, v) - 1)::BIGINT AS r2
           FROM complete),
         pt AS (SELECT g, sum(r2)::BIGINT AS sr2 FROM r2 GROUP BY g),
         tot AS (
           SELECT count(DISTINCT d)::BIGINT AS n_blocks,
             sum(CAST(r2::DOUBLE * r2::DOUBLE / 4.0 AS DECIMAL(28,6)))::DOUBLE AS a
           FROM r2),
         sd AS (
           SELECT sum(CAST(
             (pt.sr2::DOUBLE / 2.0 - tot.n_blocks::DOUBLE * (kk.k::DOUBLE + 1.0) / 2.0) *
             (pt.sr2::DOUBLE / 2.0 - tot.n_blocks::DOUBLE * (kk.k::DOUBLE + 1.0) / 2.0)
             AS DECIMAL(28,6)))::DOUBLE AS sd
           FROM pt CROSS JOIN tot CROSS JOIN kk)
         SELECT tot.n_blocks, kk.k AS k, (kk.k - 1)::BIGINT AS df,
           CASE WHEN tot.n_blocks > 0 AND kk.k > 1 AND
                  (tot.a - tot.n_blocks::DOUBLE * kk.k::DOUBLE *
                    (kk.k::DOUBLE + 1.0) * (kk.k::DOUBLE + 1.0) / 4.0) > 0
                THEN round((kk.k::DOUBLE - 1.0) * sd.sd /
                  (tot.a - tot.n_blocks::DOUBLE * kk.k::DOUBLE *
                    (kk.k::DOUBLE + 1.0) * (kk.k::DOUBLE + 1.0) / 4.0), 6) + 0
           END AS q_stat
         FROM tot CROSS JOIN kk CROSS JOIN sd""",

    // McNemar: identical per-user period flags, integer cells, one
    // division on the discordant pair.
    "q_mcnemar" ->
      """WITH per AS (
           SELECT user_id,
             max(CASE WHEN date_part('day', ts) < 16 AND event_type = 'purchase'
               THEN 1 ELSE 0 END)::BIGINT AS p1,
             max(CASE WHEN date_part('day', ts) >= 16 AND event_type = 'purchase'
               THEN 1 ELSE 0 END)::BIGINT AS p2
           FROM events
           WHERE (event_type = 'purchase') IS NOT NULL AND ts IS NOT NULL
           GROUP BY user_id),
         agg AS (
           SELECT count(*)::BIGINT AS n_units,
             sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_both,
             sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)::BIGINT AS first_only,
             sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)::BIGINT AS second_only,
             sum(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_neither
           FROM per)
         SELECT n_units, n_both, first_only, second_only, n_neither,
           CASE WHEN first_only + second_only > 0
                THEN round((first_only::DOUBLE - second_only::DOUBLE) *
                  (first_only::DOUBLE - second_only::DOUBLE) /
                  (first_only::DOUBLE + second_only::DOUBLE), 6) + 0
           END AS chi2
         FROM agg""",

    // ANOVA: identical per-group decimal moments, the same decimal-
    // snapshotted between-group sum, fixed F/η² shapes.
    "q_anova" ->
      """WITH per AS (
           SELECT source AS g, count(*)::BIGINT AS n,
             sum(CAST(n_chars::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS s,
             sum(CAST(n_chars::DOUBLE * n_chars::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS q
           FROM documents WHERE n_chars IS NOT NULL GROUP BY source),
         agg AS (
           SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n,
             sum(CAST(s AS DECIMAL(28,6)))::DOUBLE AS st,
             sum(CAST(q AS DECIMAL(28,6)))::DOUBLE AS qt,
             sum(CAST(s * s / n::DOUBLE AS DECIMAL(28,12)))::DOUBLE AS sb
           FROM per)
         SELECT k, n,
           CASE WHEN n > 0 THEN round(sb - st * st / n::DOUBLE, 6) + 0 END
             AS ss_between,
           CASE WHEN n > 0 THEN round(qt - sb, 6) + 0 END AS ss_within,
           CASE WHEN k > 0 THEN k - 1 END AS df1,
           CASE WHEN n > k THEN n - k END AS df2,
           CASE WHEN k > 1 AND n > k AND qt - sb > 0
                THEN round(((sb - st * st / n::DOUBLE) / (k::DOUBLE - 1.0)) /
                  ((qt - sb) / (n::DOUBLE - k::DOUBLE)), 6) + 0
           END AS f_stat,
           CASE WHEN n > 0 AND (sb - st * st / n::DOUBLE) + (qt - sb) > 0
                THEN round((sb - st * st / n::DOUBLE) /
                  ((sb - st * st / n::DOUBLE) + (qt - sb)), 6) + 0
           END AS eta_sq
         FROM agg""",

    // Brown–Forsythe: identical lower-median catalog pick, exact
    // deviations, the same ANOVA roll-up on |dev|.
    "q_levene" ->
      """WITH base AS (
           SELECT source AS g, n_chars::DOUBLE AS v
           FROM documents WHERE n_chars IS NOT NULL),
         cat AS (SELECT g, v, count(*)::BIGINT AS c FROM base GROUP BY g, v),
         cum AS (
           SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v) AS cc,
             sum(c) OVER (PARTITION BY g) AS n
           FROM cat),
         med AS (
           SELECT g, v AS med FROM cum
           WHERE cc >= CAST(floor((n + 1)::DOUBLE / 2.0) AS BIGINT)
             AND cc - c < CAST(floor((n + 1)::DOUBLE / 2.0) AS BIGINT)),
         per AS (
           SELECT b.g AS g, count(*)::BIGINT AS n, max(m.med) AS median,
             sum(CAST(abs(b.v - m.med) AS DECIMAL(28,6)))::DOUBLE AS s,
             sum(CAST(abs(b.v - m.med) * abs(b.v - m.med) AS DECIMAL(28,6)))::DOUBLE AS q
           FROM base b JOIN med m ON b.g = m.g GROUP BY b.g),
         agg AS (
           SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
             sum(CAST(s AS DECIMAL(28,6)))::DOUBLE AS st,
             sum(CAST(q AS DECIMAL(28,6)))::DOUBLE AS qt,
             sum(CAST(s * s / n::DOUBLE AS DECIMAL(28,12)))::DOUBLE AS sb
           FROM per)
         SELECT per.g AS source, per.n, round(per.median, 6) + 0 AS median,
           round(per.s / per.n::DOUBLE, 9) + 0 AS mean_absdev,
           CASE WHEN agg.k > 1 AND agg.nn > agg.k AND agg.qt - agg.sb > 0
                THEN round(((agg.sb - agg.st * agg.st / agg.nn::DOUBLE) /
                    (agg.k::DOUBLE - 1.0)) /
                  ((agg.qt - agg.sb) / (agg.nn::DOUBLE - agg.k::DOUBLE)), 6) + 0
           END AS w_stat
         FROM per CROSS JOIN agg ORDER BY source""",

    // MDE/power: identical per-unit decimal sums, cohort moments, 9-dp
    // z literals, fixed IEEE shapes for d/se/MDE.
    "q_mde" ->
      """WITH per AS (
           SELECT (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS a,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS m
           FROM events WHERE value IS NOT NULL GROUP BY user_id),
         agg AS (
           SELECT
             sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS n_b,
             sum(CAST(CASE WHEN a THEN m ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS sa,
             sum(CAST(CASE WHEN NOT a THEN m ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS sb,
             sum(CAST(CASE WHEN a THEN m * m ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS qa,
             sum(CAST(CASE WHEN NOT a THEN m * m ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS qb
           FROM per),
         e AS (SELECT *,
             sa / n_a::DOUBLE AS mean_a, sb / n_b::DOUBLE AS mean_b,
             (qa - sa * sa / n_a::DOUBLE) / (n_a::DOUBLE - 1.0) AS va,
             (qb - sb * sb / n_b::DOUBLE) / (n_b::DOUBLE - 1.0) AS vb
           FROM agg),
         f AS (SELECT *,
             va / n_a::DOUBLE + vb / n_b::DOUBLE AS se2,
             ((n_a::DOUBLE - 1.0) * va + (n_b::DOUBLE - 1.0) * vb) /
               (n_a::DOUBLE + n_b::DOUBLE - 2.0) AS sp2,
             (sa + sb) / (n_a::DOUBLE + n_b::DOUBLE) AS mean_all
           FROM e)
         SELECT n_a, n_b,
           CASE WHEN n_a > 0 THEN round(mean_a, 9) + 0 END AS mean_a,
           CASE WHEN n_b > 0 THEN round(mean_b, 9) + 0 END AS mean_b,
           CASE WHEN n_a > 1 AND n_b > 1 AND sp2 > 0
                THEN round((mean_a - mean_b) / sqrt(sp2), 6) + 0 END AS cohens_d,
           CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0
                THEN round(sqrt(se2), 9) + 0 END AS se_diff,
           CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0
                THEN round((1.959963985 + 0.841621234) * sqrt(se2), 6) + 0 END AS mde_abs,
           CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0 AND mean_all <> 0.0
                THEN round((1.959963985 + 0.841621234) * sqrt(se2) / mean_all, 6) + 0
           END AS mde_rel
         FROM f""",

    // Log-rank: identical lifetime/censor construction as q_km_survival,
    // integer risk sets off the descending cumulative, fixed E/V shapes.
    "q_logrank" ->
      """WITH u AS (SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS f,
                      CAST(max(o_orderdate) AS DATE) AS l
                    FROM orders GROUP BY o_custkey),
         g AS (SELECT max(l) AS gmax FROM u),
         lf AS (SELECT (l - f) // 30 AS life,
                  CASE WHEN l < gmax - 180 THEN 1 ELSE 0 END AS churn,
                  (('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS a
                FROM u, g),
         pl AS (SELECT life,
                  sum(CASE WHEN churn = 1 AND a THEN 1 ELSE 0 END)::BIGINT AS d1,
                  sum(churn)::BIGINT AS d,
                  sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS t1,
                  count(*)::BIGINT AS t
                FROM lf GROUP BY life),
         risk AS (SELECT life, d1, d,
                    sum(t1) OVER (ORDER BY life DESC) AS n1,
                    sum(t) OVER (ORDER BY life DESC) AS n
                  FROM pl),
         terms AS (SELECT d1,
                     d::DOUBLE * n1::DOUBLE / n::DOUBLE AS e,
                     CASE WHEN n > 1
                          THEN d::DOUBLE * (n1::DOUBLE / n::DOUBLE) *
                            (1.0 - n1::DOUBLE / n::DOUBLE) *
                            (n::DOUBLE - d::DOUBLE) / (n::DOUBLE - 1.0)
                          ELSE 0.0 END AS v
                   FROM risk WHERE d > 0),
         tot AS (SELECT
                   sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
                   sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS n_b
                 FROM lf),
         agg AS (SELECT sum(d1)::BIGINT AS o_a,
                   sum(CAST(e AS DECIMAL(28,12)))::DOUBLE AS ea,
                   sum(CAST(v AS DECIMAL(28,12)))::DOUBLE AS vv
                 FROM terms)
         SELECT tot.n_a, tot.n_b, agg.o_a,
           round(agg.ea, 9) + 0 AS e_a, round(agg.vv, 9) + 0 AS var_lr,
           CASE WHEN agg.vv > 0
                THEN round((agg.o_a::DOUBLE - agg.ea) / sqrt(agg.vv), 6) + 0
           END AS z_stat
         FROM tot CROSS JOIN agg""",

    // Nelson-Aalen: the q_km_survival lifetime construction, descending
    // cumulative risk sets, fixed hazard divisions, decimal-snapshotted
    // cumulative sum.
    "q_na_hazard" ->
      """WITH u AS (SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS f,
                      CAST(max(o_orderdate) AS DATE) AS l
                    FROM orders GROUP BY o_custkey),
         g AS (SELECT max(l) AS gmax FROM u),
         lf AS (SELECT (l - f) // 30 AS life,
                  CASE WHEN l < gmax - 180 THEN 1 ELSE 0 END AS churn
                FROM u, g),
         pl AS (SELECT life, sum(churn)::BIGINT AS d,
                  sum(1 - churn)::BIGINT AS c
                FROM lf GROUP BY life),
         r AS (SELECT life, d, c,
                 sum(d + c) OVER (ORDER BY life DESC)::BIGINT AS n
               FROM pl),
         h AS (SELECT life, n, d, c, d::DOUBLE / n::DOUBLE AS hz FROM r)
         SELECT life, n AS n_risk, d AS n_churned, c AS n_censored,
           round(hz, 9) + 0 AS hazard,
           round(sum(CAST(hz AS DECIMAL(28,12)))
             OVER (ORDER BY life ASC)::DOUBLE, 9) + 0 AS cum_hazard
         FROM h ORDER BY life""",

    // Cox PH: identical lifetime/risk-set CTEs as q_logrank, then the
    // θ-space Newton iteration unrolled as CTE pairs (decimal-snapshot
    // U/J sums, greatest-clamped 12-dp θ re-round per step — the exact
    // driver-side update EventOps.coxPh applies), ln once at read-out.
    "q_cox_ph" -> coxPhSql(12),

    // Stratified Cox: the same generated chain with the lifetime table
    // joined to its market segment and risk sets partitioned by it.
    "q_cox_strat" -> coxPhSql(12, stratified = true),

    // Two-covariate Cox (r20): four-cell risk sets, rational 2x2
    // Newton rounds unrolled — generated, see coxPhMultiSql.
    "q_cox_multi" -> coxPhMultiSql(12),

    // DiD: midpoint split from the observed range, per-user decimal
    // period totals, dense panel via the user catalog x [false, true],
    // 10 conditional cell sums, Welch-shape guarded variances.
    "q_did" ->
      """WITH sp AS (SELECT CAST(min(ts) AS DATE) AS mn, CAST(max(ts) AS DATE) AS mx
                     FROM events),
         s2 AS (SELECT mn, mx, mn + (((mx - mn) // 2)::INTEGER) AS split FROM sp),
         pu AS (SELECT user_id AS u, (CAST(ts AS DATE) >= split) AS post,
                  sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS y
                FROM events, s2 GROUP BY u, post),
         us AS (SELECT DISTINCT user_id AS u FROM events),
         panel AS (SELECT
                     (('0x' || substr(md5(u.u::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS a,
                     p.post, coalesce(pu.y, 0.0) AS y
                   FROM us u CROSS JOIN (SELECT unnest([false, true]) AS post) p
                   LEFT JOIN pu ON pu.u = u.u AND pu.post = p.post),
         c AS (SELECT
                 sum(CASE WHEN a AND NOT post THEN 1 ELSE 0 END)::BIGINT AS na,
                 sum(CAST(CASE WHEN a AND NOT post THEN y END AS DECIMAL(28,6)))::DOUBLE AS sa0,
                 sum(CAST(CASE WHEN a AND NOT post THEN y*y END AS DECIMAL(28,6)))::DOUBLE AS qa0,
                 sum(CAST(CASE WHEN a AND post THEN y END AS DECIMAL(28,6)))::DOUBLE AS sa1,
                 sum(CAST(CASE WHEN a AND post THEN y*y END AS DECIMAL(28,6)))::DOUBLE AS qa1,
                 sum(CASE WHEN (NOT a) AND NOT post THEN 1 ELSE 0 END)::BIGINT AS nb,
                 sum(CAST(CASE WHEN (NOT a) AND NOT post THEN y END AS DECIMAL(28,6)))::DOUBLE AS sb0,
                 sum(CAST(CASE WHEN (NOT a) AND NOT post THEN y*y END AS DECIMAL(28,6)))::DOUBLE AS qb0,
                 sum(CAST(CASE WHEN (NOT a) AND post THEN y END AS DECIMAL(28,6)))::DOUBLE AS sb1,
                 sum(CAST(CASE WHEN (NOT a) AND post THEN y*y END AS DECIMAL(28,6)))::DOUBLE AS qb1
               FROM panel),
         r AS (SELECT na, nb,
                 ((sa1/na - sa0/na) - (sb1/nb - sb0/nb)) AS did,
                 (CASE WHEN na > 1 THEN ((qa0 - na*(sa0/na)*(sa0/na)) / (na - 1)) END / na +
                  CASE WHEN na > 1 THEN ((qa1 - na*(sa1/na)*(sa1/na)) / (na - 1)) END / na +
                  CASE WHEN nb > 1 THEN ((qb0 - nb*(sb0/nb)*(sb0/nb)) / (nb - 1)) END / nb +
                  CASE WHEN nb > 1 THEN ((qb1 - nb*(sb1/nb)*(sb1/nb)) / (nb - 1)) END / nb) AS se2
               FROM c)
         SELECT strftime(s2.split, '%Y-%m-%d') AS split_date,
           r.na AS n_a, r.nb AS n_b,
           round(r.did, 9) + 0 AS did,
           CASE WHEN r.na > 1 AND r.nb > 1 AND r.se2 > 0
                THEN round(sqrt(r.se2), 9) + 0 END AS se,
           CASE WHEN r.na > 1 AND r.nb > 1 AND r.se2 > 0
                THEN round(r.did / sqrt(r.se2), 6) + 0 END AS z_stat
         FROM r CROSS JOIN s2""",

    // RMST: the q_km_survival lifetime CTEs split by cohort, then ONE
    // list fold per cohort carrying [at_risk, survival, prev_mark,
    // rmst_acc] — identical left-fold shape to Spark's aggregate, the
    // tail interval closed at the final survival.
    "q_rmst" ->
      """WITH u AS (SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS f,
                      CAST(max(o_orderdate) AS DATE) AS l
                    FROM orders GROUP BY o_custkey),
         g AS (SELECT max(l) AS gmax FROM u),
         lf AS (SELECT CASE WHEN (('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT % 2 = 0)
                  THEN 'A' ELSE 'B' END AS cohort,
                  (l - f) // 30 AS life,
                  CASE WHEN l < gmax - 180 THEN 1 ELSE 0 END AS churn
                FROM u, g),
         pl AS (SELECT cohort, life, sum(churn)::BIGINT AS d,
                  sum(1 - churn)::BIGINT AS c
                FROM lf GROUP BY cohort, life),
         arr AS (SELECT cohort,
                  list([life::DOUBLE, d::DOUBLE, c::DOUBLE] ORDER BY life) AS a,
                  sum(d + c)::DOUBLE AS total
                 FROM pl GROUP BY cohort),
         f AS (SELECT cohort, total,
                 list_reduce(
                   list_prepend([total, 1.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE], a),
                   (acc, e) -> [acc[1] - e[2] - e[3],
                                acc[2] * (acc[1] - e[2]) / acc[1],
                                e[1],
                                acc[4] + acc[2] *
                                  greatest(0.0, least(e[1], 12.0) - acc[3])]) AS st
               FROM arr)
         SELECT cohort, total::BIGINT AS n_units, 12::BIGINT AS tau_units,
           round(st[4] + st[2] * greatest(0.0, 12.0 - st[3]), 6) + 0 AS rmst
         FROM f ORDER BY cohort""",

    // Theil: identical value-catalog ratios, 9-dp-rounded ln before the
    // count products, decimal-snapshotted term sums.
    "q_theil" ->
      """WITH base AS (
           SELECT source AS g, n_chars::DOUBLE AS v FROM documents
           WHERE n_chars IS NOT NULL AND n_chars > 0),
         cat AS (SELECT g, v, count(*)::BIGINT AS c FROM base GROUP BY g, v),
         per AS (SELECT g, sum(c)::BIGINT AS ng,
                   sum(CAST(v * c::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS sg
                 FROM cat GROUP BY g),
         tot AS (SELECT sum(ng)::BIGINT AS n,
                   sum(CAST(sg AS DECIMAL(28,6)))::DOUBLE AS s FROM per),
         w AS (SELECT cat.g AS g,
                 sum(CAST(cat.c::DOUBLE * (cat.v * per.ng::DOUBLE / per.sg) *
                   round(ln(cat.v * per.ng::DOUBLE / per.sg), 9) + 0
                   AS DECIMAL(28,12)))::DOUBLE AS tw
               FROM cat JOIN per ON cat.g = per.g GROUP BY cat.g),
         ttl AS (SELECT
                 sum(CAST(c::DOUBLE * (v * tot.n::DOUBLE / tot.s) *
                   round(ln(v * tot.n::DOUBLE / tot.s), 9) + 0
                   AS DECIMAL(28,12)))::DOUBLE AS tt
               FROM cat CROSS JOIN tot),
         btw AS (SELECT
                 sum(CAST((per.sg / tot.s) *
                   round(ln(per.sg * tot.n::DOUBLE / (tot.s * per.ng::DOUBLE)), 9) + 0
                   AS DECIMAL(28,12)))::DOUBLE AS tb
               FROM per CROSS JOIN tot)
         SELECT per.g AS source, per.ng AS n,
           round(per.sg / per.ng::DOUBLE, 9) + 0 AS mean_value,
           round(per.sg / tot.s, 9) + 0 AS share,
           CASE WHEN per.ng > 0
                THEN round(w.tw / per.ng::DOUBLE, 6) + 0 END AS theil_within,
           round(btw.tb, 6) + 0 AS theil_between,
           CASE WHEN tot.n > 0
                THEN round(ttl.tt / tot.n::DOUBLE, 6) + 0 END AS theil_total
         FROM per JOIN w ON per.g = w.g
         CROSS JOIN tot CROSS JOIN ttl CROSS JOIN btw
         ORDER BY source""",

    // Fano: identical dense day grid (quiet days true zeros), exact
    // integer moments, fixed variance/ratio shapes.
    "q_fano" ->
      """WITH daily AS (
           SELECT event_type AS k, ts::DATE AS day, count(*)::BIGINT AS c
           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
         b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
         keys AS (SELECT DISTINCT k FROM daily),
         grid AS (SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
                  FROM keys CROSS JOIN b),
         dense AS (SELECT g.k, coalesce(d.c, 0)::BIGINT AS c
                   FROM grid g LEFT JOIN daily d ON d.k = g.k AND d.day = g.day),
         per AS (SELECT k, count(*)::BIGINT AS n_days, sum(c)::BIGINT AS n_events,
                   sum(CAST(c * c AS DECIMAL(38,0)))::DOUBLE AS q
                 FROM dense GROUP BY k),
         e AS (SELECT *,
             n_events::DOUBLE / n_days::DOUBLE AS mean,
             CASE WHEN n_days > 1
                  THEN (q - n_events::DOUBLE * n_events::DOUBLE / n_days::DOUBLE) /
                    (n_days::DOUBLE - 1.0) END AS var
           FROM per),
         f AS (SELECT *,
             CASE WHEN n_events > 0 THEN var / mean END AS fano FROM e)
         SELECT k AS event_type, n_days, n_events,
           round(mean, 9) + 0 AS mean_daily,
           round(fano, 6) + 0 AS fano,
           round((n_days::DOUBLE - 1.0) * fano, 6) + 0 AS dispersion_chi2,
           ((n_days::DOUBLE - 1.0) * fano > 49.588) AS overdispersed
         FROM f ORDER BY event_type""",

    // Brier/Murphy: the q_calibration binning, 9-dp bin confidence
    // before the squared terms, exact accuracy ratios.
    "q_brier" ->
      raw"""WITH t AS (
           SELECT lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE
               / len(toks)::DOUBLE AS sc,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM t WHERE len(toks) > 0),
         bb AS (SELECT least(floor(sc * 10), 9)::BIGINT AS bin, y, sc FROM s),
         raw AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
                   sum(CAST((sc - y::DOUBLE) * (sc - y::DOUBLE)
                     AS DECIMAL(28,12)))::DOUBLE AS sq
                 FROM bb),
         g AS (SELECT bin, count(*)::BIGINT AS nb, sum(y)::BIGINT AS pb,
                 sum(CAST(sc AS DECIMAL(28,12)))::DOUBLE AS ss
               FROM bb GROUP BY bin),
         terms AS (SELECT
             sum(CAST(g.nb::DOUBLE *
               (round(g.ss / g.nb, 9) + 0 - g.pb::DOUBLE / g.nb::DOUBLE) *
               (round(g.ss / g.nb, 9) + 0 - g.pb::DOUBLE / g.nb::DOUBLE)
               AS DECIMAL(28,12)))::DOUBLE AS rel,
             sum(CAST(g.nb::DOUBLE *
               (g.pb::DOUBLE / g.nb::DOUBLE - raw.n_pos::DOUBLE / raw.n::DOUBLE) *
               (g.pb::DOUBLE / g.nb::DOUBLE - raw.n_pos::DOUBLE / raw.n::DOUBLE)
               AS DECIMAL(28,12)))::DOUBLE AS res
           FROM g CROSS JOIN raw)
         SELECT raw.n, raw.n_pos,
           CASE WHEN raw.n > 0 THEN round(raw.sq / raw.n::DOUBLE, 9) + 0 END AS brier,
           CASE WHEN raw.n > 0
                THEN round(terms.rel / raw.n::DOUBLE, 9) + 0 END AS reliability,
           CASE WHEN raw.n > 0
                THEN round(terms.res / raw.n::DOUBLE, 9) + 0 END AS resolution,
           CASE WHEN raw.n > 0
                THEN round((raw.n_pos::DOUBLE / raw.n::DOUBLE) *
                  (1.0 - raw.n_pos::DOUBLE / raw.n::DOUBLE), 9) + 0 END AS uncertainty,
           CASE WHEN raw.n > 0
                THEN round(terms.rel / raw.n::DOUBLE - terms.res / raw.n::DOUBLE +
                  (raw.n_pos::DOUBLE / raw.n::DOUBLE) *
                  (1.0 - raw.n_pos::DOUBLE / raw.n::DOUBLE), 9) + 0
           END AS brier_binned
         FROM raw CROSS JOIN terms""",

    // Stump: identical score catalog, integer-count entropies with
    // 0·ln0 = 0, rounded-gain argmax with smallest-threshold ties.
    "q_stump" ->
      raw"""WITH t AS (
           SELECT lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))::DOUBLE
               / len(toks)::DOUBLE AS v,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM t WHERE len(toks) > 0),
         cat AS (SELECT v, count(*)::BIGINT AS c, sum(y)::BIGINT AS p
                 FROM s GROUP BY v),
         tot AS (SELECT sum(c)::BIGINT AS n, sum(p)::BIGINT AS n_pos FROM cat),
         cum AS (SELECT v, sum(c) OVER (ORDER BY v)::BIGINT AS nl,
                   sum(p) OVER (ORDER BY v)::BIGINT AS pl
                 FROM cat),
         cand AS (SELECT cum.v, cum.nl, cum.pl, tot.n, tot.n_pos
                  FROM cum CROSS JOIN tot WHERE cum.nl < tot.n),
         scored AS (SELECT n, n_pos,
             round(CASE WHEN n > 0 THEN ln(n::DOUBLE) -
               ((CASE WHEN n_pos > 0 THEN n_pos::DOUBLE * ln(n_pos::DOUBLE) ELSE 0.0 END) +
                (CASE WHEN n - n_pos > 0 THEN (n - n_pos)::DOUBLE * ln((n - n_pos)::DOUBLE) ELSE 0.0 END))
               / n::DOUBLE ELSE 0.0 END, 6) + 0 AS h_parent,
             v AS threshold, nl AS n_left, pl AS pos_left,
             round(
               (CASE WHEN n > 0 THEN ln(n::DOUBLE) -
                 ((CASE WHEN n_pos > 0 THEN n_pos::DOUBLE * ln(n_pos::DOUBLE) ELSE 0.0 END) +
                  (CASE WHEN n - n_pos > 0 THEN (n - n_pos)::DOUBLE * ln((n - n_pos)::DOUBLE) ELSE 0.0 END))
                 / n::DOUBLE ELSE 0.0 END) -
               (nl::DOUBLE / n::DOUBLE *
                 (CASE WHEN nl > 0 THEN ln(nl::DOUBLE) -
                   ((CASE WHEN pl > 0 THEN pl::DOUBLE * ln(pl::DOUBLE) ELSE 0.0 END) +
                    (CASE WHEN nl - pl > 0 THEN (nl - pl)::DOUBLE * ln((nl - pl)::DOUBLE) ELSE 0.0 END))
                   / nl::DOUBLE ELSE 0.0 END) +
                (n - nl)::DOUBLE / n::DOUBLE *
                 (CASE WHEN n - nl > 0 THEN ln((n - nl)::DOUBLE) -
                   ((CASE WHEN n_pos - pl > 0 THEN (n_pos - pl)::DOUBLE * ln((n_pos - pl)::DOUBLE) ELSE 0.0 END) +
                    (CASE WHEN (n - nl) - (n_pos - pl) > 0 THEN ((n - nl) - (n_pos - pl))::DOUBLE * ln(((n - nl) - (n_pos - pl))::DOUBLE) ELSE 0.0 END))
                   / (n - nl)::DOUBLE ELSE 0.0 END)), 6) + 0 AS info_gain
           FROM cand)
         SELECT n, n_pos, h_parent, threshold, n_left, pos_left, info_gain
         FROM scored
         QUALIFY row_number() OVER (ORDER BY info_gain DESC, threshold ASC) = 1""",

    // Participation ratio: the q_embed_cov covariance (6-dp contract)
    // rolled to trace²/frobenius² — identical entry rounding, decimal-
    // snapshotted sums, one fixed division chain.
    "q_effective_rank" ->
      """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         p AS (SELECT unnest(flatten(list_transform(range(0, len(v)), i ->
                 list_transform(range(i, len(v)), j ->
                   {'i': i, 'j': j, 'xy': v[i+1]::DOUBLE * v[j+1]::DOUBLE})))) AS s
               FROM e),
         agg AS (SELECT s.i AS i, s.j AS j,
                   sum(CAST(s.xy AS DECIMAL(28,12)))::DOUBLE AS sxy, count(*) AS n
                 FROM p GROUP BY 1, 2),
         m AS (SELECT u.i AS i, sum(CAST(u.x AS DECIMAL(28,12)))::DOUBLE AS sx FROM
                 (SELECT unnest(list_transform(range(0, len(v)), i ->
                    {'i': i, 'x': v[i+1]::DOUBLE})) AS u FROM e) t
               GROUP BY 1),
         cov AS (SELECT a.i, a.j,
                   round(a.sxy / a.n - (mi.sx / a.n) * (mj.sx / a.n), 6) + 0 AS cov
                 FROM agg a JOIN m mi ON a.i = mi.i JOIN m mj ON a.j = mj.i),
         r AS (SELECT sum(CASE WHEN i = j THEN 1 ELSE 0 END)::BIGINT AS d,
                 sum(CAST(CASE WHEN i = j THEN cov ELSE 0.0 END
                   AS DECIMAL(28,12)))::DOUBLE AS tr,
                 sum(CAST(CASE WHEN i = j THEN cov * cov ELSE 2.0 * cov * cov END
                   AS DECIMAL(28,12)))::DOUBLE AS fr
               FROM cov)
         SELECT d, round(tr, 9) + 0 AS trace, round(fr, 9) + 0 AS frob_sq,
           CASE WHEN fr > 0
                THEN round(tr * tr / fr, 6) + 0 END AS participation_ratio,
           CASE WHEN fr > 0 AND d > 0
                THEN round(tr * tr / fr / d::DOUBLE, 6) + 0 END AS pr_fraction
         FROM r""",

    // CKA: identical md5 sign projection (the q_jl_distortion replay),
    // the three C138-shaped moment fans with 6-dp entries, fixed
    // Frobenius/ratio shapes.
    "q_cka" ->
      """WITH e AS (SELECT vec_id, embedding AS x FROM embeddings),
         signs AS (
           SELECT j,
             list(CASE WHEN ('0x' || substr(md5('rp:' || j::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT % 2 = 0
                    THEN 1.0 ELSE -1.0 END ORDER BY d) AS srow
           FROM (SELECT unnest(range(16)) AS j),
                (SELECT unnest(range(1, 65)) AS d)
           GROUP BY j),
         proj AS (
           SELECT e.vec_id,
             list(list_reduce(
               list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(e.x) + 1),
                   i -> e.x[i]::DOUBLE * s.srow[i])),
               (a, b) -> a + b) / sqrt(16.0) ORDER BY s.j) AS y
           FROM e, signs s GROUP BY e.vec_id),
         base AS (SELECT e.x AS x, proj.y AS y FROM e JOIN proj USING (vec_id)),
         xxp AS (SELECT unnest(flatten(list_transform(range(0, len(x)), i ->
                   list_transform(range(i, len(x)), j ->
                     {'i': i, 'j': j, 'xy': x[i+1]::DOUBLE * x[j+1]::DOUBLE})))) AS s
                 FROM base),
         xxa AS (SELECT s.i AS i, s.j AS j,
                   sum(CAST(s.xy AS DECIMAL(28,12)))::DOUBLE AS sxy, count(*) AS n
                 FROM xxp GROUP BY 1, 2),
         xm AS (SELECT u.i AS i, sum(CAST(u.x AS DECIMAL(28,12)))::DOUBLE AS sx FROM
                  (SELECT unnest(list_transform(range(0, len(x)), i ->
                     {'i': i, 'x': x[i+1]::DOUBLE})) AS u FROM base) t
                GROUP BY 1),
         xxf AS (SELECT sum(CAST(CASE WHEN c.i = c.j THEN c.cov * c.cov
                     ELSE 2.0 * c.cov * c.cov END AS DECIMAL(28,12)))::DOUBLE AS f
                 FROM (SELECT a.i, a.j,
                         round(a.sxy / a.n - (mi.sx / a.n) * (mj.sx / a.n), 6) + 0 AS cov
                       FROM xxa a JOIN xm mi ON a.i = mi.i JOIN xm mj ON a.j = mj.i) c),
         yyp AS (SELECT unnest(flatten(list_transform(range(0, len(y)), i ->
                   list_transform(range(i, len(y)), j ->
                     {'i': i, 'j': j, 'xy': y[i+1] * y[j+1]})))) AS s
                 FROM base),
         yya AS (SELECT s.i AS i, s.j AS j,
                   sum(CAST(s.xy AS DECIMAL(28,12)))::DOUBLE AS sxy, count(*) AS n
                 FROM yyp GROUP BY 1, 2),
         ym AS (SELECT u.i AS i, sum(CAST(u.x AS DECIMAL(28,12)))::DOUBLE AS sx FROM
                  (SELECT unnest(list_transform(range(0, len(y)), i ->
                     {'i': i, 'x': y[i+1]})) AS u FROM base) t
                GROUP BY 1),
         yyf AS (SELECT sum(CAST(CASE WHEN c.i = c.j THEN c.cov * c.cov
                     ELSE 2.0 * c.cov * c.cov END AS DECIMAL(28,12)))::DOUBLE AS f
                 FROM (SELECT a.i, a.j,
                         round(a.sxy / a.n - (mi.sx / a.n) * (mj.sx / a.n), 6) + 0 AS cov
                       FROM yya a JOIN ym mi ON a.i = mi.i JOIN ym mj ON a.j = mj.i) c),
         xyp AS (SELECT unnest(flatten(list_transform(range(0, len(x)), i ->
                   list_transform(range(0, len(y)), j ->
                     {'i': i, 'j': j, 'xy': x[i+1]::DOUBLE * y[j+1]})))) AS s
                 FROM base),
         xya AS (SELECT s.i AS i, s.j AS j,
                   sum(CAST(s.xy AS DECIMAL(28,12)))::DOUBLE AS sxy, count(*) AS n
                 FROM xyp GROUP BY 1, 2),
         xyf AS (SELECT sum(CAST(c.cov * c.cov AS DECIMAL(28,12)))::DOUBLE AS f,
                   max(c.n) AS n
                 FROM (SELECT a.i, a.j, a.n,
                         round(a.sxy / a.n - (mi.sx / a.n) * (mj.sx / a.n), 6) + 0 AS cov
                       FROM xya a JOIN xm mi ON a.i = mi.i JOIN ym mj ON a.j = mj.i) c)
         SELECT xyf.n, 64::BIGINT AS d, 16::BIGINT AS k,
           round(xyf.f, 9) + 0 AS cross_frob_sq,
           round(xxf.f, 9) + 0 AS x_frob_sq,
           round(yyf.f, 9) + 0 AS y_frob_sq,
           CASE WHEN xxf.f > 0 AND yyf.f > 0
                THEN round(xyf.f / (sqrt(xxf.f) * sqrt(yyf.f)), 6) + 0 END AS cka
         FROM xyf CROSS JOIN xxf CROSS JOIN yyf""",

    // Post-hoc: identical group moments, fixed Welch shapes per pair,
    // the same Bonferroni critical literal.
    "q_posthoc" ->
      """WITH per AS (
           SELECT source AS g, count(*)::BIGINT AS n,
             sum(CAST(n_chars::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS s,
             sum(CAST(n_chars::DOUBLE * n_chars::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS q
           FROM documents WHERE n_chars IS NOT NULL GROUP BY source),
         pairs AS (
           SELECT a.g AS g_a, b.g AS g_b, a.n AS n_a, b.n AS n_b,
             a.s / a.n::DOUBLE AS mean_a, b.s / b.n::DOUBLE AS mean_b,
             CASE WHEN a.n > 1
                  THEN (a.q - a.s * a.s / a.n::DOUBLE) / (a.n::DOUBLE - 1.0) END AS va,
             CASE WHEN b.n > 1
                  THEN (b.q - b.s * b.s / b.n::DOUBLE) / (b.n::DOUBLE - 1.0) END AS vb
           FROM per a JOIN per b ON a.g < b.g),
         e AS (SELECT *, va / n_a::DOUBLE + vb / n_b::DOUBLE AS se2 FROM pairs)
         SELECT g_a, g_b, n_a, n_b,
           round(mean_a, 9) + 0 AS mean_a, round(mean_b, 9) + 0 AS mean_b,
           CASE WHEN se2 > 0
                THEN round((mean_a - mean_b) / sqrt(se2), 6) + 0 END AS z_stat,
           CASE WHEN se2 > 0
                THEN abs((mean_a - mean_b) / sqrt(se2)) > 3.651 END AS significant
         FROM e ORDER BY g_a, g_b""",

    // HHI: exact decimal group sums, one share division, decimal-
    // snapshotted squares, one reciprocal.
    "q_hhi" ->
      """WITH per AS (
           SELECT source AS g, sum(CAST(n_chars::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS s
           FROM documents WHERE n_chars IS NOT NULL GROUP BY source),
         tot AS (SELECT count(*)::BIGINT AS k,
                   sum(CAST(s AS DECIMAL(28,6)))::DOUBLE AS t FROM per),
         agg AS (SELECT max(tot.k) AS k,
                   sum(CAST((per.s / tot.t) * (per.s / tot.t)
                     AS DECIMAL(28,12)))::DOUBLE AS hhi
                 FROM per CROSS JOIN tot)
         SELECT k, round(hhi, 9) + 0 AS hhi,
           CASE WHEN hhi > 0 THEN round(1.0 / hhi, 6) + 0 END AS effective_sources
         FROM agg""",

    // Readability: the same three integer regex counts, fixed per-doc
    // grade shape, decimal-snapshotted group mean.
    "q_readability" ->
      raw"""WITH d AS (
           SELECT source,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS w,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS sn,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS sy
           FROM documents WHERE text IS NOT NULL),
         f AS (SELECT source, w, sn, sy,
             0.39 * (w::DOUBLE / sn::DOUBLE) + 11.8 * (sy::DOUBLE / w::DOUBLE) - 15.59 AS grade
           FROM d WHERE w > 0)
         SELECT source, count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS n_words,
           round(sum(w)::DOUBLE / sum(sn)::DOUBLE, 9) + 0 AS words_per_sentence,
           round(sum(sy)::DOUBLE / sum(w)::DOUBLE, 9) + 0 AS syllables_per_word,
           round(sum(CAST(grade AS DECIMAL(28,12)))::DOUBLE / count(*)::DOUBLE, 6) + 0
             AS mean_grade
         FROM f GROUP BY source ORDER BY source""",

    // Packing: identical two-phase prefix sum (in-bucket window +
    // cumulative bucket offsets), identical floor-div window indices.
    "q_packing" ->
      raw"""WITH d AS (
           SELECT doc_id AS id,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS w
           FROM documents WHERE text IS NOT NULL),
         base AS (SELECT id, w, (id // 1024)::BIGINT AS b FROM d WHERE w > 0),
         inb AS (SELECT id, w, b,
                   (sum(w) OVER (PARTITION BY b ORDER BY id) - w)::BIGINT AS pre
                 FROM base),
         boff AS (SELECT b, coalesce(sum(bw) OVER (ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
                  FROM (SELECT b, sum(w)::BIGINT AS bw FROM base GROUP BY b)),
         placed AS (SELECT i.w, bo.off + i.pre AS start
                    FROM inb i JOIN boff bo ON i.b = bo.b),
         ctx AS (SELECT unnest([512, 1024, 2048, 4096])::BIGINT AS c),
         per AS (SELECT c, count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS total_tokens,
                   sum(CASE WHEN (floor((start + w - 1)::DOUBLE / c::DOUBLE)
                       - floor(start::DOUBLE / c::DOUBLE))::BIGINT + 1 > 1
                     THEN 1 ELSE 0 END)::BIGINT AS docs_split,
                   sum((floor((start + w - 1)::DOUBLE / c::DOUBLE)
                       - floor(start::DOUBLE / c::DOUBLE))::BIGINT + 1)::BIGINT AS inc
                 FROM placed CROSS JOIN ctx GROUP BY c),
         e AS (SELECT *,
             CAST(floor((total_tokens + c - 1)::DOUBLE / c::DOUBLE) AS BIGINT) AS n_windows
           FROM per)
         SELECT c AS context, n_docs, total_tokens, n_windows, docs_split,
           CASE WHEN n_docs > 0
                THEN round(docs_split::DOUBLE / n_docs::DOUBLE, 9) + 0 END AS split_frac,
           CASE WHEN n_windows > 0
                THEN round(inc::DOUBLE / n_windows::DOUBLE, 9) + 0 END AS docs_per_window,
           (n_windows * c - total_tokens)::BIGINT AS tail_waste
         FROM e ORDER BY context""",

    // RBO: the q_cka sign projection, the q_cosine_topk fold cosines,
    // identical rank tie-breaks, 12-dp tail-weight literals shared with
    // the Spark side.
    "q_rbo_compress" -> {
      val tails = graft.ops.VectorOps.rboTails(10).mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
         signs AS (
           SELECT j,
             list(CASE WHEN ('0x' || substr(md5('rp:' || j::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT % 2 = 0
                    THEN 1.0 ELSE -1.0 END ORDER BY d) AS srow
           FROM (SELECT unnest(range(16)) AS j),
                (SELECT unnest(range(1, 65)) AS d)
           GROUP BY j),
         proj AS (
           SELECT e.vec_id,
             list(list_reduce(
               list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(e.x) + 1),
                   i -> e.x[i] * s.srow[i])),
               (a, b) -> a + b) / sqrt(16.0) ORDER BY s.j) AS p
           FROM e, signs s GROUP BY e.vec_id),
         v AS (SELECT e.vec_id AS id, e.x, proj.p,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e.x[i]*e.x[i]),
                   (a, b) -> a + b)) AS nx,
                 sqrt(list_reduce(list_transform(range(1, 17), i -> proj.p[i]*proj.p[i]),
                   (a, b) -> a + b)) AS np
               FROM e JOIN proj USING (vec_id)),
         q AS (SELECT * FROM v WHERE id < 20),
         scored AS (
           SELECT q.id AS query_id, c.id AS corpus_id,
             list_reduce(list_transform(range(1, 65), i -> q.x[i]*c.x[i]),
               (a, b) -> a + b) / (q.nx * c.nx) AS st,
             list_reduce(list_transform(range(1, 17), i -> q.p[i]*c.p[i]),
               (a, b) -> a + b) / (q.np * c.np) AS sp
           FROM v c JOIN q ON q.id <> c.id),
         ranked AS (
           SELECT query_id, corpus_id,
             row_number() OVER (PARTITION BY query_id ORDER BY st DESC, corpus_id ASC) AS ra,
             row_number() OVER (PARTITION BY query_id ORDER BY sp DESC, corpus_id ASC) AS rb
           FROM scored),
         hit AS (SELECT query_id, ra, rb FROM ranked WHERE ra <= 10 AND rb <= 10),
         agg AS (SELECT query_id, count(*)::BIGINT AS ov,
                   sum(CAST(list_value($tails)[greatest(ra, rb)]
                     AS DECIMAL(28,12)))::DOUBLE AS rbo
                 FROM hit GROUP BY query_id)
         SELECT q.id AS query_id,
           coalesce(agg.ov, 0)::BIGINT AS overlap_at_k,
           round(coalesce(agg.rbo, 0.0), 9) + 0 AS rbo_min
         FROM q LEFT JOIN agg ON q.id = agg.query_id ORDER BY query_id"""
    },

    // SMD: identical per-unit covariate aggregates, struct-list unpivot,
    // the mdePower moment shapes, the (vA+vB)/2 pooled denominator.
    "q_smd" ->
      """WITH per AS (
           SELECT user_id,
             (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS a,
             count(*)::DOUBLE AS n_events,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS total_value,
             count(DISTINCT CAST(ts AS DATE))::DOUBLE AS active_days
           FROM events GROUP BY user_id),
         unp AS (SELECT a, u.c AS c, u.v AS v
                 FROM per CROSS JOIN LATERAL unnest([
                   {'c': 'n_events', 'v': n_events},
                   {'c': 'total_value', 'v': total_value},
                   {'c': 'active_days', 'v': active_days}]) AS t(u)
                 WHERE u.v IS NOT NULL),
         agg AS (SELECT c,
             sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS n_b,
             sum(CAST(CASE WHEN a THEN v ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS sa,
             sum(CAST(CASE WHEN NOT a THEN v ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS sb,
             sum(CAST(CASE WHEN a THEN v * v ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS qa,
             sum(CAST(CASE WHEN NOT a THEN v * v ELSE 0.0 END AS DECIMAL(28,6)))::DOUBLE AS qb
           FROM unp GROUP BY c),
         e AS (SELECT *,
             sa / n_a::DOUBLE AS mean_a, sb / n_b::DOUBLE AS mean_b,
             CASE WHEN n_a > 1
                  THEN (qa - sa * sa / n_a::DOUBLE) / (n_a::DOUBLE - 1.0) END AS va,
             CASE WHEN n_b > 1
                  THEN (qb - sb * sb / n_b::DOUBLE) / (n_b::DOUBLE - 1.0) END AS vb
           FROM agg),
         f AS (SELECT *, (va + vb) / 2.0 AS pooled FROM e)
         SELECT c AS covariate, n_a, n_b,
           CASE WHEN n_a > 0 THEN round(mean_a, 9) + 0 END AS mean_a,
           CASE WHEN n_b > 0 THEN round(mean_b, 9) + 0 END AS mean_b,
           CASE WHEN pooled > 0
                THEN round((mean_a - mean_b) / sqrt(pooled), 6) + 0 END AS smd,
           CASE WHEN pooled > 0
                THEN abs((mean_a - mean_b) / sqrt(pooled)) < 0.1 END AS balanced
         FROM f ORDER BY covariate""",

    // Dunn: the q_kruskal doubled-midrank catalog identity, identical
    // tie term, fixed z shapes per pair, the shared Bonferroni literal.
    "q_dunn" ->
      """WITH base AS (
           SELECT source AS g, n_chars AS v FROM documents
           WHERE n_chars IS NOT NULL),
         cat AS (SELECT v, count(*)::BIGINT AS t FROM base GROUP BY v),
         cum AS (SELECT v, t, sum(t) OVER (ORDER BY v)::BIGINT AS ccnt FROM cat),
         gv AS (SELECT g, v, count(*)::BIGINT AS ngv FROM base GROUP BY g, v),
         perg AS (SELECT gv.g AS g, sum(gv.ngv)::BIGINT AS ng,
                    sum(CAST(gv.ngv AS DECIMAL(38,0)) * (2 * cum.ccnt - cum.t + 1))
                      ::DECIMAL(38,0) AS r2
                  FROM gv JOIN cum ON gv.v = cum.v GROUP BY gv.g),
         tot AS (SELECT coalesce(sum(t), 0)::BIGINT AS n,
                   coalesce(sum(CAST(t AS DECIMAL(38,0)) * t * t - t), 0)
                     ::DECIMAL(38,0) AS tie
                 FROM cat),
         pairs AS (
           SELECT a.g AS g_a, b.g AS g_b, a.ng AS n_a, b.ng AS n_b,
             a.r2::DOUBLE / (2.0 * a.ng::DOUBLE) AS ra,
             b.r2::DOUBLE / (2.0 * b.ng::DOUBLE) AS rb,
             (tot.n::DOUBLE * (tot.n::DOUBLE + 1.0) / 12.0 -
               CASE WHEN tot.n > 1
                    THEN tot.tie::DOUBLE / (12.0 * (tot.n::DOUBLE - 1.0)) END) *
               (1.0 / a.ng::DOUBLE + 1.0 / b.ng::DOUBLE) AS se2
           FROM perg a JOIN perg b ON a.g < b.g CROSS JOIN tot)
         SELECT g_a, g_b, n_a, n_b,
           round(ra, 9) + 0 AS mean_rank_a, round(rb, 9) + 0 AS mean_rank_b,
           CASE WHEN se2 > 0
                THEN round((ra - rb) / sqrt(se2), 6) + 0 END AS z_stat,
           CASE WHEN se2 > 0
                THEN abs((ra - rb) / sqrt(se2)) > 3.651 END AS significant
         FROM pairs ORDER BY g_a, g_b""",

    // Cliff's delta: identical per-side value catalogs, one cumulative
    // window for the below-count, exact integer pair counts.
    "q_cliffs_delta" ->
      """WITH base AS (
           SELECT source AS g,
             (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000) AS in1,
             n_chars AS v
           FROM documents WHERE n_chars IS NOT NULL),
         cat AS (SELECT g, v,
                   sum(CASE WHEN in1 THEN 1 ELSE 0 END)::BIGINT AS c1,
                   sum(CASE WHEN NOT in1 THEN 1 ELSE 0 END)::BIGINT AS c2
                 FROM base GROUP BY g, v),
         cum AS (SELECT g, v, c1, c2,
                   (sum(c2) OVER (PARTITION BY g ORDER BY v) - c2)::BIGINT AS lt2,
                   sum(c2) OVER (PARTITION BY g)::BIGINT AS n2
                 FROM cat),
         agg AS (SELECT g, sum(c1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
                   sum(c1 * lt2)::BIGINT AS n_concordant,
                   sum(c1 * (n2 - lt2 - c2))::BIGINT AS n_discordant,
                   sum(c1 * c2)::BIGINT AS n_ties
                 FROM cum GROUP BY g)
         SELECT g AS source, n1, n2, n_concordant, n_discordant, n_ties,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN round((n_concordant - n_discordant)::DOUBLE /
                  (n1 * n2)::DOUBLE, 9) + 0 END AS cliffs_delta,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN round(((n_concordant - n_discordant)::DOUBLE /
                  (n1 * n2)::DOUBLE + 1.0) / 2.0, 9) + 0 END AS vd_a
         FROM agg ORDER BY source""",

    // Cochran's Q: identical distinct (unit, type) cells, integer
    // totals, one division.
    "q_cochran_q" ->
      """WITH cells AS (
           SELECT DISTINCT user_id AS u, event_type AS t FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         k AS (SELECT count(DISTINCT t)::BIGINT AS k FROM cells),
         bt AS (SELECT coalesce(sum(tj), 0)::BIGINT AS tt,
                  coalesce(sum(tj * tj), 0)::BIGINT AS tj2
                FROM (SELECT t, count(*)::BIGINT AS tj FROM cells GROUP BY t)),
         bu AS (SELECT count(*)::BIGINT AS n_units,
                  coalesce(sum(ui), 0)::BIGINT AS us,
                  coalesce(sum(ui * ui), 0)::BIGINT AS u2
                FROM (SELECT u, count(*)::BIGINT AS ui FROM cells GROUP BY u))
         SELECT bu.n_units, k.k,
           CASE WHEN k.k > 1 THEN k.k - 1 END AS df,
           CASE WHEN k.k > 1 AND
                  k.k::DOUBLE * bu.us::DOUBLE - bu.u2::DOUBLE > 0
                THEN round((k.k::DOUBLE - 1.0) *
                  (k.k::DOUBLE * bt.tj2::DOUBLE - bt.tt::DOUBLE * bt.tt::DOUBLE) /
                  (k.k::DOUBLE * bu.us::DOUBLE - bu.u2::DOUBLE), 6) + 0
           END AS q_stat
         FROM bu CROSS JOIN k CROSS JOIN bt""",

    // Language ID: the same normalized trigram fan, top-64 profiles
    // (count desc, trigram asc), integer overlap argmax, 'unknown'
    // fallback — integer end to end.
    "q_langid" ->
      raw"""WITH b AS (
           SELECT doc_id AS id, lang,
             regexp_replace(lower(text), '\s+', ' ', 'g') AS t,
             (doc_id % 2 = 0) AS train
           FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
         b2 AS (SELECT * FROM b WHERE length(t) >= 3),
         grams AS (
           SELECT id, lang, train, substr(t, u.i::INT, 3) AS g
           FROM b2 CROSS JOIN LATERAL unnest(range(1, length(t) - 1)) AS u(i)),
         prof AS (
           SELECT plang, g FROM (
             SELECT lang AS plang, g, count(*)::BIGINT AS c,
               row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, g ASC) AS rn
             FROM grams WHERE train GROUP BY lang, g)
           WHERE rn <= 64),
         types AS (SELECT DISTINCT id, g FROM grams WHERE NOT train),
         best AS (
           SELECT id, plang FROM (
             SELECT t.id AS id, p.plang AS plang, count(*)::BIGINT AS overlap,
               row_number() OVER (PARTITION BY t.id
                 ORDER BY count(*) DESC, p.plang ASC) AS rn
             FROM types t JOIN prof p USING (g) GROUP BY t.id, p.plang)
           WHERE rn = 1)
         SELECT b2.lang AS lang, coalesce(best.plang, 'unknown') AS predicted,
           count(*)::BIGINT AS n_docs
         FROM b2 LEFT JOIN best ON b2.id = best.id
         WHERE NOT b2.train
         GROUP BY 1, 2 ORDER BY lang, predicted""",

    // Jackknife influence: identical decimal group/total sums, the same
    // fixed leave-out division shapes.
    "q_source_influence" ->
      """WITH g AS (
           SELECT source, count(*)::BIGINT AS n,
             sum(CAST(n_chars::DOUBLE AS DECIMAL(28,6)))::DOUBLE AS s
           FROM documents WHERE n_chars IS NOT NULL GROUP BY source),
         t AS (SELECT sum(n)::BIGINT AS nall,
                 sum(CAST(s AS DECIMAL(28,6)))::DOUBLE AS sall FROM g)
         SELECT g.source, g.n AS n,
           round(g.n::DOUBLE / t.nall::DOUBLE, 6) + 0 AS row_share,
           round(g.s / g.n::DOUBLE, 6) + 0 AS mean_group,
           round(t.sall / t.nall::DOUBLE, 6) + 0 AS mean_all,
           round(t.sall / t.nall::DOUBLE -
             CASE WHEN t.nall > g.n
                  THEN (t.sall - g.s) / (t.nall - g.n)::DOUBLE END, 6) + 0 AS influence
         FROM g CROSS JOIN t ORDER BY g.source""",

    // Hill tail index: the same positive-value catalog, descending
    // cumulative order statistics, 9-dp-rounded ln ratios.
    "q_hill_tail" ->
      """WITH cat AS (
           SELECT n_chars::BIGINT AS v, count(*)::BIGINT AS c
           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0 GROUP BY 1),
         cum AS (
           SELECT v, c, sum(c) OVER (ORDER BY v DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS ccnt
           FROM cat),
         nr AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cat),
         xk1 AS (SELECT v AS xk1 FROM cum WHERE ccnt >= 101 AND ccnt - c < 101),
         q AS (SELECT nr.n, xk1.xk1 FROM nr LEFT JOIN xk1 ON TRUE),
         top AS (
           SELECT v, least(c, 100 - (ccnt - c))::BIGINT AS w
           FROM cum WHERE ccnt - c < 100),
         s AS (
           SELECT sum(CAST(w::DOUBLE * (round(ln(v::DOUBLE / q.xk1::DOUBLE), 9) + 0)
             AS DECIMAL(28,12)))::DOUBLE AS s
           FROM top CROSS JOIN q)
         SELECT q.n, 100::BIGINT AS k, q.xk1 AS x_k1,
           CASE WHEN s.s > 0 THEN round(100.0/s.s, 6) + 0 END AS hill_alpha
         FROM q CROSS JOIN s""",

    // Chao1: the same corpus-frequency spectrum off the standard
    // tokenization, exact integer moments, two fixed divisions.
    "q_chao1" ->
      raw"""WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         cnt AS (SELECT token, count(*)::BIGINT AS c FROM tok GROUP BY 1),
         a AS (
           SELECT count(*)::BIGINT AS v_obs, sum(c)::BIGINT AS n_tokens,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS n2
           FROM cnt)
         SELECT v_obs, n_tokens, n1, n2,
           round(v_obs::DOUBLE + (n1*(n1 - 1))::DOUBLE/(2*(n2 + 1))::DOUBLE, 6) + 0 AS chao1,
           CASE WHEN n_tokens > 0
                THEN round(1.0 - n1::DOUBLE/n_tokens::DOUBLE, 6) + 0 END AS coverage_gt
         FROM a""",

    // Bradley–Terry: the identical winner-per-order window, the same
    // symmetric pair matrix, and 5 unrolled MM rounds (MATERIALIZED —
    // each round's state is referenced twice by the next).
    "q_bradley_terry" -> bradleyTerrySql(iters = 5),

    // Truncated betweenness: 2-/3-path enumeration over the same pair
    // CTE, shortest-only via NOT-EXISTS exclusions, per-pair 1/sigma
    // dependencies decimal-summed per vertex.
    "q_betweenness" ->
      """WITH e0 AS (
           SELECT o_custkey AS cust, l_suppkey + 1000000 AS supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2 HAVING count(*) >= 3),
         e AS (SELECT cust AS u, supp AS v FROM e0 UNION SELECT supp, cust FROM e0),
         p1 AS (SELECT u AS s, v AS t FROM e WHERE u < v),
         paths2 AS MATERIALIZED (
           SELECT a.u AS s, a.v AS mid, b.v AS t
           FROM e a JOIN e b ON a.v = b.u
           WHERE a.u < b.v
             AND NOT EXISTS (SELECT 1 FROM p1 WHERE p1.s = a.u AND p1.t = b.v)),
         sigma2 AS MATERIALIZED (SELECT s, t, count(*)::BIGINT AS sg FROM paths2 GROUP BY 1, 2),
         paths3 AS MATERIALIZED (
           SELECT a.u AS s, a.v AS v1, b.v AS v2, c.v AS t
           FROM e a JOIN e b ON a.v = b.u JOIN e c ON b.v = c.u
           WHERE b.v <> a.u AND a.u < c.v AND a.v <> c.v
             AND NOT EXISTS (SELECT 1 FROM p1 WHERE p1.s = a.u AND p1.t = c.v)
             AND NOT EXISTS (SELECT 1 FROM sigma2 WHERE sigma2.s = a.u AND sigma2.t = c.v)),
         sigma3 AS (SELECT s, t, count(*)::BIGINT AS sg FROM paths3 GROUP BY 1, 2),
         dep AS (
           SELECT mid AS node_id, 1.0::DOUBLE / sg::DOUBLE AS d
           FROM paths2 JOIN sigma2 USING (s, t)
           UNION ALL
           SELECT v1, 1.0::DOUBLE / sg::DOUBLE FROM paths3 JOIN sigma3 USING (s, t)
           UNION ALL
           SELECT v2, 1.0::DOUBLE / sg::DOUBLE FROM paths3 JOIN sigma3 USING (s, t))
         SELECT node_id, round(sum(CAST(d AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS betweenness,
           count(*)::BIGINT AS n_path_slots
         FROM dep GROUP BY node_id ORDER BY node_id""",


    // MWU: rank()/count() windows reproduce min-rank + tie size; doubled
    // rank sums stay integer; sigma2 and z mirror the operator's fixed
    // double-op order exactly.
    "q_mann_whitney" ->
      raw"""WITH b AS (
           SELECT source,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000 AS f,
             n_chars AS v
           FROM documents WHERE n_chars IS NOT NULL),
         r AS (
           SELECT source, f,
             rank() OVER (PARTITION BY source ORDER BY v) AS minrank,
             count(*) OVER (PARTITION BY source, v) AS t
           FROM b),
         a AS (
           SELECT source,
             sum(CASE WHEN f THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN NOT f THEN 1 ELSE 0 END)::BIGINT AS n2,
             sum(CASE WHEN f THEN 2 * minrank + t - 1 END)::BIGINT AS r1x2,
             sum(t * t - 1)::BIGINT AS tie
           FROM r GROUP BY source),
         s AS (
           SELECT source, n1, n2, r1x2,
             (n1 * n2)::DOUBLE / 12.0 *
               ((n1 + n2 + 1)::DOUBLE
                 - tie::DOUBLE / ((n1 + n2) * (n1 + n2 - 1))::DOUBLE) AS sigma2
           FROM a)
         SELECT source, n1, n2,
           (r1x2 - n1 * (n1 + 1))::DOUBLE / 2.0 AS u1,
           CASE WHEN n1 > 0 AND n2 > 0 AND sigma2 > 0
             THEN round(((r1x2 - n1 * (n1 + 1) - n1 * n2)::DOUBLE / 2.0)
                        / sqrt(sigma2), 6) + 0 END AS z
         FROM s ORDER BY source""",

    // Odds ratio: conditional counts, the all-cells +0.5 correction on
    // any zero, ln rounded(9) before the CI arithmetic - every double op
    // in the operator's order.
    "q_odds_ratio" ->
      """WITH a AS (
           SELECT c_nationkey,
             sum(CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal > 0 THEN 1 ELSE 0 END)::BIGINT AS a,
             sum(CASE WHEN c_mktsegment = 'BUILDING' AND NOT c_acctbal > 0 THEN 1 ELSE 0 END)::BIGINT AS b,
             sum(CASE WHEN c_mktsegment <> 'BUILDING' AND c_acctbal > 0 THEN 1 ELSE 0 END)::BIGINT AS c,
             sum(CASE WHEN c_mktsegment <> 'BUILDING' AND NOT c_acctbal > 0 THEN 1 ELSE 0 END)::BIGINT AS d
           FROM customer GROUP BY c_nationkey),
         cc AS (
           SELECT c_nationkey, a, b, c, d,
             CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN a::DOUBLE + 0.5 ELSE a::DOUBLE END AS ca,
             CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN b::DOUBLE + 0.5 ELSE b::DOUBLE END AS cb,
             CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN c::DOUBLE + 0.5 ELSE c::DOUBLE END AS cx,
             CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN d::DOUBLE + 0.5 ELSE d::DOUBLE END AS cd
           FROM a),
         e AS (
           SELECT c_nationkey, a, b, c, d,
             (ca * cd) / (cb * cx) AS orr,
             round(ln((ca * cd) / (cb * cx)), 9) + 0 AS logor,
             sqrt(1.0::DOUBLE / ca + 1.0::DOUBLE / cb + 1.0::DOUBLE / cx + 1.0::DOUBLE / cd) AS se
           FROM cc)
         SELECT c_nationkey, a, b, c, d,
           round(orr, 6) + 0 AS odds_ratio,
           round(logor - 1.96 * se, 6) + 0 AS ci_lo,
           round(logor + 1.96 * se, 6) + 0 AS ci_hi
         FROM e ORDER BY c_nationkey""",

    // Holt-Winters m=7: the q_holt struct-accumulator fold widened to
    // (m+2)-element arrays - [level, trend, ring...]; the ring shifts by
    // slicing acc[4:9] and appending the new seasonal. Alpha/gamma/delta
    // literals (0.5/0.25/0.25 and complements) are exact binary fractions.
    "q_holt_winters" ->
      """WITH ord AS (
           SELECT user_id,
             list(event_id ORDER BY event_id) AS ids,
             list(value ORDER BY event_id) AS vs
           FROM events WHERE value IS NOT NULL GROUP BY user_id),
         ex AS (
           SELECT user_id,
             unnest(ids) AS event_id,
             unnest(vs) AS value,
             unnest(list_transform(range(1, len(vs) + 1), i ->
               list_reduce(
                 list_transform(vs[1:i], x -> [x::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
                                               0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE]),
                 (acc, e) -> list_concat(list_concat(
                   [0.5::DOUBLE * (e[1] - acc[3]) + 0.5::DOUBLE * (acc[1] + acc[2]),
                    0.25::DOUBLE * ((0.5::DOUBLE * (e[1] - acc[3]) + 0.5::DOUBLE * (acc[1] + acc[2])) - acc[1])
                      + 0.75::DOUBLE * acc[2]],
                   acc[4:9]),
                   [0.25::DOUBLE * (e[1] - (0.5::DOUBLE * (e[1] - acc[3]) + 0.5::DOUBLE * (acc[1] + acc[2])))
                      + 0.75::DOUBLE * acc[3]])))) AS st
           FROM ord)
         SELECT event_id, user_id, value,
           st[1] AS level, st[2] AS trend, st[9] AS seasonal
         FROM ex ORDER BY event_id""",

    // Decayed leaderboard: per-day exact counts x power(1/2, age) - both
    // engines' pow returns the exactly-representable 2^(-age); decimal
    // sum; ranked on the ROUNDED score.
    "q_decayed_topk" ->
      """WITH daily AS (
           SELECT event_type AS key, ts::DATE AS day, count(*)::BIGINT AS cnt
           FROM events GROUP BY 1, 2),
         mx AS (SELECT max(day) AS maxd FROM daily),
         sc AS (
           SELECT key, sum(cnt)::BIGINT AS raw_count,
             round(sum(CAST(cnt * power(0.5::DOUBLE, date_diff('day', day, maxd))
                            AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS score
           FROM daily CROSS JOIN mx GROUP BY key)
         SELECT rank, key, raw_count, score FROM (
           SELECT key, raw_count, score,
             row_number() OVER (ORDER BY score DESC, key ASC) AS rank
           FROM sc)
         WHERE rank <= 10 ORDER BY rank""",

    // Noisy counts: the md5 inverse-CDF draw, noise rounded(9) before
    // the add (the ln ulp rule), release rounded(6).
    "q_noisy_counts" ->
      """WITH g AS (SELECT lang, count(*)::BIGINT AS true_count FROM documents GROUP BY lang),
         n AS (
           SELECT lang, true_count,
             ((('0x' || substr(md5(lang || 'graft-r16b'), 1, 8))::BIGINT::DOUBLE + 0.5)
               / 4294967296.0) - 0.5 AS ctr
           FROM g),
         z AS (
           SELECT lang, true_count,
             round((CASE WHEN ctr >= 0 THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END)
                   * ln(1.0::DOUBLE - 2.0::DOUBLE * abs(ctr)) / 0.5::DOUBLE, 9) + 0 AS noise
           FROM n)
         SELECT lang, true_count, 0.5::DOUBLE AS epsilon, noise,
           round(true_count::DOUBLE + noise, 6) + 0 AS noisy_count
         FROM z ORDER BY lang""",

    // hash values, the k-th smallest via the same rank window, the same
    // (k-1)/u_k estimator.
    // KMV Jaccard: the q_kmv_distinct shingle/hash CTEs, per-pair union
    // sketch via the same rank window, membership votes via left joins,
    // exact Jaccard over the hashed universe as audit.
    "q_kmv_jaccard" ->
      raw"""WITH t AS (
           SELECT lang, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         tok AS (
           SELECT lang, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS tok
           FROM t),
         h AS (SELECT DISTINCT lang,
                 ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
               FROM tok),
         r AS (SELECT lang, h,
                 row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
               FROM h),
         sk AS (SELECT lang, h FROM r WHERE rn <= 64),
         langs AS (SELECT DISTINCT lang FROM sk),
         pr AS (SELECT a.lang AS ga, b.lang AS gb
                FROM langs a JOIN langs b ON a.lang < b.lang),
         uu AS (SELECT DISTINCT pr.ga, pr.gb, sk.h
                FROM pr JOIN sk ON sk.lang = pr.ga OR sk.lang = pr.gb),
         ur AS (SELECT ga, gb, h,
                  row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
                FROM uu),
         u AS (SELECT ga, gb, h FROM ur WHERE rn <= 64),
         m AS (
           SELECT u.ga, u.gb, count(*)::BIGINT AS nu,
             sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS mt
           FROM u
           LEFT JOIN sk a ON a.lang = u.ga AND a.h = u.h
           LEFT JOIN sk b ON b.lang = u.gb AND b.h = u.h
           GROUP BY 1, 2),
         ex AS (SELECT x.lang AS ga, y.lang AS gb, count(*)::BIGINT AS inter
                FROM h x JOIN h y ON x.h = y.h AND x.lang < y.lang GROUP BY 1, 2),
         sz AS (SELECT lang, count(*)::BIGINT AS sz FROM h GROUP BY lang)
         SELECT m.ga, m.gb,
           round(mt::DOUBLE / nu::DOUBLE, 6) + 0 AS jaccard_est,
           round(coalesce(ex.inter, 0)::DOUBLE
                 / (sa.sz + sb.sz - coalesce(ex.inter, 0))::DOUBLE, 6) + 0 AS jaccard_exact,
           round(abs((round(mt::DOUBLE / nu::DOUBLE, 6) + 0)
                 - coalesce(ex.inter, 0)::DOUBLE
                   / (sa.sz + sb.sz - coalesce(ex.inter, 0))::DOUBLE), 6) + 0 AS abs_err
         FROM m
         LEFT JOIN ex ON ex.ga = m.ga AND ex.gb = m.gb
         JOIN sz sa ON sa.lang = m.ga
         JOIN sz sb ON sb.lang = m.gb
         ORDER BY m.ga, m.gb""",

    "q_kmv_distinct" ->
      raw"""WITH t AS (
           SELECT lang, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         tok AS (
           SELECT lang, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS tok
           FROM t),
         h AS (SELECT DISTINCT lang,
                 ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
               FROM tok),
         r AS (SELECT lang, h,
                 row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
               FROM h),
         a AS (SELECT lang, count(*)::BIGINT AS n_distinct_hashed,
                 max(CASE WHEN rn = 64 THEN h END) AS hk
               FROM r GROUP BY lang)
         SELECT lang, n_distinct_hashed,
           CASE WHEN hk IS NOT NULL AND hk > 0
             THEN round(63.0 / (hk::DOUBLE / 4294967296.0), 6) + 0
             ELSE n_distinct_hashed::DOUBLE END AS kmv_estimate,
           CASE WHEN hk IS NOT NULL AND hk > 0
             THEN round(abs(63.0 / (hk::DOUBLE / 4294967296.0)
                    - n_distinct_hashed::DOUBLE)
                  / n_distinct_hashed::DOUBLE, 6) + 0
             ELSE 0.0 END AS rel_err,
           (CASE WHEN hk IS NOT NULL AND hk > 0
              THEN abs(63.0 / (hk::DOUBLE / 4294967296.0)
                     - n_distinct_hashed::DOUBLE)
                   / n_distinct_hashed::DOUBLE
              ELSE 0.0 END) <= 0.5 AS within_bounds
         FROM a ORDER BY lang""",

    // Power-of-two checkpoints replicated with the same shift; ln on
    // identical doubles, decimal-summed moments, one closed-form OLS.
    "q_heaps_law" ->
      raw"""WITH toks AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
           FROM documents),
         hi AS (SELECT length(bin(max(doc_id))) AS hiexp FROM documents),
         perdoc AS (SELECT doc_id, count(*)::BIGINT AS ntok FROM toks GROUP BY doc_id),
         tl AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
         sh AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3
                  THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  ELSE [array_to_string(t, ' ')] END) AS tok
                FROM tl),
         firstdoc AS (SELECT tok, min(doc_id) AS fid FROM sh GROUP BY tok),
         es AS (SELECT unnest(generate_series(4, hiexp)) AS e FROM hi),
         tc AS (SELECT e, sum(ntok)::BIGINT AS ntoks
                FROM perdoc, es WHERE doc_id < (1::BIGINT << e) GROUP BY e),
         vc AS (SELECT e, count(*)::BIGINT AS ntypes
                FROM firstdoc, es WHERE fid < (1::BIGINT << e) GROUP BY e),
         pts AS (SELECT ln(ntoks::DOUBLE) AS x, ln(ntypes::DOUBLE) AS y
                 FROM tc JOIN vc USING (e)
                 WHERE ntoks > 0 AND ntypes > 0),
         a AS (SELECT count(*)::BIGINT AS n,
                 sum(CAST(x AS DECIMAL(28,12)))::DOUBLE AS sx,
                 sum(CAST(y AS DECIMAL(28,12)))::DOUBLE AS sy,
                 sum(CAST(x * x AS DECIMAL(28,12)))::DOUBLE AS sxx,
                 sum(CAST(x * y AS DECIMAL(28,12)))::DOUBLE AS sxy
               FROM pts)
         SELECT n AS n_points,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0
             THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0
           END AS beta,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0
             THEN round((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n,
                    6) + 0
           END AS ln_k
         FROM a""",

    // The mask is a pure function of (doc_id, block): the same md5
    // arithmetic, run starts via lag, sentinel ids via the running sum,
    // both sequences rebuilt with an ordered string_agg.
    "q_span_corrupt" ->
      raw"""WITH t AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         tok AS (
           SELECT doc_id,
             unnest(range(len(toks))) AS p,
             unnest(toks) AS tok
           FROM t),
         f AS (
           SELECT doc_id, p, tok,
             ('0x' || substr(md5(doc_id::VARCHAR || ':' || (p // 3)::VARCHAR), 1, 8))::BIGINT
               % 5 = 0 AS m
           FROM tok),
         rs AS (
           SELECT doc_id, p, tok, m,
             m AND NOT coalesce(
               lag(m) OVER (PARTITION BY doc_id ORDER BY p), false) AS run_start
           FROM f),
         sid AS (
           SELECT doc_id, p, tok, m, run_start,
             sum(CASE WHEN run_start THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY p
                     ROWS UNBOUNDED PRECEDING) - 1 AS k
           FROM rs)
         SELECT doc_id,
           coalesce(string_agg(
             CASE WHEN NOT m THEN tok
                  WHEN run_start THEN '<extra_id_' || k::VARCHAR || '>' END,
             ' ' ORDER BY p), '') AS corrupted,
           coalesce(string_agg(
             CASE WHEN m AND run_start
                    THEN '<extra_id_' || k::VARCHAR || '>' || ' ' || tok
                  WHEN m THEN tok END,
             ' ' ORDER BY p), '') AS target,
           sum(CASE WHEN m THEN 1 ELSE 0 END)::BIGINT AS n_masked,
           count(*)::BIGINT AS n_tokens
         FROM sid GROUP BY doc_id ORDER BY doc_id""",

    // Daily decimal sums; trend = exact decimal 7-row window sum, ONE
    // double division; phase = epoch-day mod 7 (day-of-week builtins
    // disagree on week start between engines, epoch arithmetic doesn't).
    "q_seasonal_decomp" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS value
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         ph AS (
           SELECT event_type, day, value,
             (day - DATE '1970-01-01') % 7 AS phase
           FROM daily),
         tr AS (
           SELECT event_type, day, value, phase,
             CASE WHEN count(*) OVER w = 7 THEN
               (sum(CAST(value AS DECIMAL(28,12))) OVER w)::DOUBLE / 7
             END AS trend
           FROM ph
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         se AS (
           SELECT event_type, phase,
             sum(CAST(value - trend AS DECIMAL(28,12)))::DOUBLE / count(*) AS praw
           FROM tr WHERE trend IS NOT NULL GROUP BY event_type, phase),
         ce AS (
           SELECT event_type, phase,
             praw - (sum(CAST(praw AS DECIMAL(28,12))) OVER (PARTITION BY event_type))::DOUBLE
                      / count(*) OVER (PARTITION BY event_type) AS seasonal
           FROM se)
         SELECT t.event_type, t.day,
           round(t.value, 6) + 0 AS value,
           round(t.trend, 6) + 0 AS trend,
           round(c.seasonal, 6) + 0 AS seasonal,
           round(t.value - t.trend - c.seasonal, 6) + 0 AS residual
         FROM tr t LEFT JOIN ce c
           ON t.event_type = c.event_type AND t.phase = c.phase
         ORDER BY t.event_type, t.day""",

    // Exact integer counts end to end; the g3 rate is the one division.
    "q_fd_profile" ->
      """WITH p1 AS (SELECT doc_id AS l, source AS r, count(*) AS n
                     FROM documents GROUP BY 1, 2),
         g1 AS (SELECT l, sum(n) AS tot, max(n) AS top FROM p1 GROUP BY l),
         a1 AS (SELECT count(*)::BIGINT AS n_groups,
                  sum(CASE WHEN tot > top THEN 1 ELSE 0 END)::BIGINT AS violating_groups,
                  sum(tot - top)::BIGINT AS g3_rows,
                  sum(tot)::BIGINT AS n_rows FROM g1),
         p2 AS (SELECT source AS l, lang AS r, count(*) AS n
                FROM documents GROUP BY 1, 2),
         g2 AS (SELECT l, sum(n) AS tot, max(n) AS top FROM p2 GROUP BY l),
         a2 AS (SELECT count(*)::BIGINT AS n_groups,
                  sum(CASE WHEN tot > top THEN 1 ELSE 0 END)::BIGINT AS violating_groups,
                  sum(tot - top)::BIGINT AS g3_rows,
                  sum(tot)::BIGINT AS n_rows FROM g2),
         p3 AS (SELECT lang AS l, source AS r, count(*) AS n
                FROM documents GROUP BY 1, 2),
         g3 AS (SELECT l, sum(n) AS tot, max(n) AS top FROM p3 GROUP BY l),
         a3 AS (SELECT count(*)::BIGINT AS n_groups,
                  sum(CASE WHEN tot > top THEN 1 ELSE 0 END)::BIGINT AS violating_groups,
                  sum(tot - top)::BIGINT AS g3_rows,
                  sum(tot)::BIGINT AS n_rows FROM g3)
         SELECT lhs, rhs, n_groups, violating_groups, g3_rows,
           round(g3_rows::DOUBLE / n_rows::DOUBLE, 9) + 0 AS g3_rate
         FROM (
           SELECT 'doc_id' AS lhs, 'source' AS rhs, * FROM a1
           UNION ALL SELECT 'source', 'lang', * FROM a2
           UNION ALL SELECT 'lang', 'source', * FROM a3)
         ORDER BY lhs, rhs""",

    // The ±1 stream signs come from bit 0 of the seeded md5 rule, so
    // every estimator is the same exact integer in both engines; the
    // median-of-means chain is then fixed double arithmetic.
    "q_ams_f2" ->
      """WITH c AS (SELECT user_id AS v, count(*)::BIGINT AS c
                    FROM events GROUP BY user_id),
         s AS (SELECT seed,
                 sum(CASE WHEN ('0x' || substr(md5(seed::VARCHAR || ':' || v::VARCHAR), 1, 8))::BIGINT % 2 = 0
                       THEN c ELSE -c END)::BIGINT AS z
               FROM c, (SELECT unnest(range(80)) AS seed) GROUP BY seed),
         mm AS (SELECT seed % 5 AS grp, sum(z * z)::DOUBLE / 16 AS mean
                FROM s GROUP BY seed % 5),
         med AS (SELECT list_sort(list(mean)) AS ms FROM mm),
         e AS (SELECT sum(c)::BIGINT AS n_rows, count(*)::BIGINT AS n_distinct,
                 sum(c * c)::BIGINT AS exact_f2 FROM c)
         SELECT n_rows, n_distinct, exact_f2,
           round((ms[3] + ms[3]) / 2, 6) + 0 AS ams_estimate,
           round(abs((ms[3] + ms[3]) / 2 - exact_f2::DOUBLE) / exact_f2::DOUBLE, 6) + 0 AS rel_err
         FROM e, med""",

    // Signs replicated from the same 'rp:j:d' md5 rule; every sum is the
    // same left-to-right fold (list_reduce = Spark aggregate, both
    // sequential in array order); sqrt(16) is exact in both engines.
    "q_jl_distortion" ->
      """WITH probes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
         signs AS (
           SELECT j,
             list(CASE WHEN ('0x' || substr(md5('rp:' || j::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT % 2 = 0
                    THEN 1.0 ELSE -1.0 END ORDER BY d) AS srow
           FROM (SELECT unnest(range(16)) AS j),
                (SELECT unnest(range(1, 65)) AS d)
           GROUP BY j),
         proj AS (
           SELECT p.vec_id,
             list(list_reduce(
               list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(p.embedding) + 1),
                   i -> p.embedding[i]::DOUBLE * s.srow[i])),
               (a, b) -> a + b) / sqrt(16.0) ORDER BY s.j) AS pv
           FROM probes p, signs s GROUP BY p.vec_id),
         pairs AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(range(1, len(a.embedding) + 1),
                 i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
                    * (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE))),
               (x, y) -> x + y) AS d2t,
             list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(range(1, len(pa.pv) + 1),
                 i -> (pa.pv[i] - pb.pv[i]) * (pa.pv[i] - pb.pv[i]))),
               (x, y) -> x + y) AS d2p
           FROM probes a JOIN probes b ON a.vec_id < b.vec_id
             JOIN proj pa ON pa.vec_id = a.vec_id
             JOIN proj pb ON pb.vec_id = b.vec_id)
         SELECT id_a, id_b,
           round(d2t, 6) + 0 AS d2_true,
           round(d2p, 6) + 0 AS d2_proj,
           CASE WHEN d2t > 0 THEN round(d2p / d2t, 6) + 0 END AS distortion
         FROM pairs ORDER BY id_a, id_b""",

    // Window distinct counts accumulate as ONE exact integer sum
    // (mean of d_i/w = sum d_i / (w*m)); the fold is the same
    // left-to-right list_reduce as Spark's aggregate.
    "q_mattr" ->
      raw"""WITH t AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         f AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0)
         SELECT doc_id, n::BIGINT AS n_tokens,
           round(len(list_distinct(toks))::DOUBLE / n, 6) + 0 AS ttr,
           CASE WHEN n >= 25 THEN
             round(list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(range(1, n - 25 + 2),
                   i -> len(list_distinct(toks[i:i+24]))::BIGINT)),
               (a, b) -> a + b)::DOUBLE / (25 * (n - 25 + 1)), 6) + 0
           ELSE round(len(list_distinct(toks))::DOUBLE / n, 6) + 0
           END AS mattr
         FROM f ORDER BY doc_id""",

    // The cut points are the same seeded md5 rule mod (n+1); slices are
    // 1-based inclusive in both engines' conventions.
    "q_fim" ->
      raw"""WITH t AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         c AS (SELECT doc_id, toks, len(toks) AS n,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':fim1'), 1, 8))::BIGINT % (len(toks) + 1) AS h1,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':fim2'), 1, 8))::BIGINT % (len(toks) + 1) AS h2
               FROM t),
         s AS (SELECT doc_id, toks, n,
                 least(h1, h2) AS lo, greatest(h1, h2) AS hi FROM c)
         SELECT doc_id, n::BIGINT AS n_tokens,
           lo::BIGINT AS cut1, hi::BIGINT AS cut2,
           -- DuckDB renders some empty slices as NULL; Spark's slice is
           -- always a (possibly empty) list — coalesce to ''
           coalesce(array_to_string(toks[1:lo], ' '), '') AS prefix,
           coalesce(array_to_string(toks[lo+1:hi], ' '), '') AS middle,
           coalesce(array_to_string(toks[hi+1:n], ' '), '') AS suffix,
           '<fim_prefix> ' || coalesce(array_to_string(toks[1:lo], ' '), '')
             || ' <fim_suffix> ' || coalesce(array_to_string(toks[hi+1:n], ' '), '')
             || ' <fim_middle> ' || coalesce(array_to_string(toks[lo+1:hi], ' '), '') AS psm
         FROM s ORDER BY doc_id""",

    // Both sketch paths replayed: k smallest of all distinct hashes vs
    // k smallest of the unioned per-source k-smallest lists — same
    // estimator arithmetic, equality surfaced as a hash-checked boolean.
    "q_kmv_merge" ->
      raw"""WITH t AS (
           SELECT source, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         tok AS (
           SELECT source, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS tok
           FROM t),
         h AS (SELECT DISTINCT source,
                 ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
               FROM tok),
         gl AS (SELECT DISTINCT h FROM h),
         dr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM gl),
         dsk AS (SELECT count(*) AS n, max(h) AS mx FROM dr WHERE rn <= 64),
         de AS (SELECT CASE WHEN n = 64 AND mx > 0
                  THEN round(63.0 / (mx::DOUBLE / 4294967296.0), 6) + 0
                  ELSE n::DOUBLE END AS direct_estimate FROM dsk),
         pr AS (SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
                FROM h),
         mu AS (SELECT DISTINCT h FROM pr WHERE rn <= 64),
         mr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM mu),
         msk AS (SELECT count(*) AS n, max(h) AS mx FROM mr WHERE rn <= 64),
         me AS (SELECT CASE WHEN n = 64 AND mx > 0
                  THEN round(63.0 / (mx::DOUBLE / 4294967296.0), 6) + 0
                  ELSE n::DOUBLE END AS merged_estimate FROM msk),
         np AS (SELECT count(DISTINCT source)::BIGINT AS n_parts FROM documents)
         SELECT n_parts, direct_estimate, merged_estimate,
           direct_estimate = merged_estimate AS merge_exact
         FROM np, de, me""",

    // Each credit is one double division on exact integer segment
    // counts, decimal-summed; segment membership rides the shared
    // (ts, event_id) order.
    "q_attribution_multi" ->
      """WITH b AS (
           SELECT user_id, ts, event_id, event_type,
             event_type = 'purchase' AS conv
           FROM events),
         c AS (
           SELECT *, sum(CASE WHEN conv THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS cum
           FROM b),
         t AS (SELECT user_id, cum + 1 AS cid, ts, event_id, event_type
               FROM c WHERE NOT conv),
         v AS (SELECT user_id, cum AS cid FROM c WHERE conv),
         s AS (SELECT t.* FROM t JOIN v USING (user_id, cid)),
         p AS (SELECT *,
                 row_number() OVER (PARTITION BY user_id, cid
                                    ORDER BY ts, event_id) AS pos,
                 count(*) OVER (PARTITION BY user_id, cid) AS n
               FROM s)
         SELECT event_type AS touch_type, count(*)::BIGINT AS n_touches,
           round(sum(CAST(1.0 / n AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS linear_credit,
           round(sum(CAST(CASE WHEN n = 1 THEN 1.0
                               WHEN n = 2 THEN 0.5
                               WHEN pos = 1 OR pos = n THEN 0.4
                               ELSE 0.2 / (n - 2) END AS DECIMAL(28,12)))::DOUBLE, 6) + 0 AS u_credit
         FROM p GROUP BY event_type ORDER BY touch_type""",

    // The running survival product folds left-to-right over the sorted
    // per-lifetime rows with the q_holt LIST-accumulator pattern —
    // never exp/ln, never a windowed product an engine may tree-shape.
    "q_km_survival" ->
      """WITH u AS (SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS f,
                      CAST(max(o_orderdate) AS DATE) AS l
                    FROM orders GROUP BY o_custkey),
         g AS (SELECT max(l) AS gmax FROM u),
         lf AS (SELECT (l - f) // 30 AS life,
                  CASE WHEN l < gmax - 180 THEN 1 ELSE 0 END AS churn
                FROM u, g),
         pl AS (SELECT life, sum(churn)::BIGINT AS d,
                  sum(1 - churn)::BIGINT AS c
                FROM lf GROUP BY life),
         arr AS (SELECT list([life::DOUBLE, d::DOUBLE, c::DOUBLE]
                    ORDER BY life) AS a,
                  sum(d + c)::DOUBLE AS total FROM pl),
         ex AS (SELECT unnest(range(1, len(a) + 1)) AS i, a, total FROM arr)
         SELECT a[i][1]::BIGINT AS life,
           (total - list_reduce(
              list_prepend(0.0::DOUBLE,
                list_transform(a[1:i-1], e -> e[2] + e[3])),
              (x, y) -> x + y))::BIGINT AS n_risk,
           a[i][2]::BIGINT AS n_churned,
           a[i][3]::BIGINT AS n_censored,
           round(list_reduce(
             list_prepend([total, 1.0::DOUBLE], a[1:i]),
             (acc, e) -> [acc[1] - e[2] - e[3],
                          acc[2] * (acc[1] - e[2]) / acc[1]])[2], 9) + 0 AS km_survival
         FROM ex ORDER BY life""",

    // The int8 dot is exact integer arithmetic in any engine; both
    // rankings tie-break on corpus id, so the overlap is deterministic.
    "q_int8_recall" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         qn AS (SELECT vec_id, e,
                  list_max(list_transform(e, x -> abs(x))) AS s FROM v),
         qq AS (SELECT vec_id, e, s,
                  list_transform(e, x -> CASE WHEN s > 0
                    THEN floor(x * 127.0 / s + 0.5)::BIGINT
                    ELSE 0 END) AS q
                FROM qn),
         pairs AS (
           SELECT p.vec_id AS pid, c.vec_id AS cid,
             list_reduce(list_transform(range(1, 65), i -> p.e[i] * c.e[i]),
               (x, y) -> x + y) AS fs,
             p.s * c.s * (list_reduce(
               list_transform(range(1, 65), i -> p.q[i] * c.q[i]),
               (x, y) -> x + y))::DOUBLE / 16129.0 AS qs
           FROM qq p JOIN qq c ON p.vec_id <> c.vec_id
           WHERE p.vec_id < 20),
         tf AS (SELECT pid, cid FROM (
                  SELECT pid, cid, row_number() OVER
                    (PARTITION BY pid ORDER BY fs DESC, cid) AS rn
                  FROM pairs) WHERE rn <= 10),
         tq AS (SELECT pid, cid, 1 AS hit FROM (
                  SELECT pid, cid, row_number() OVER
                    (PARTITION BY pid ORDER BY qs DESC, cid) AS rn
                  FROM pairs) WHERE rn <= 10)
         SELECT tf.pid AS probe_id,
           sum(coalesce(hit, 0))::BIGINT AS n_overlap,
           round(sum(coalesce(hit, 0))::DOUBLE / 10, 6) + 0 AS recall
         FROM tf LEFT JOIN tq ON tf.pid = tq.pid AND tf.cid = tq.cid
         GROUP BY tf.pid ORDER BY probe_id""",

    // Sign recall: identical pair fan and float ranking as
    // q_int8_recall; the estimate side ranks by the integer
    // sign-agreement count (no float ties possible).
    "q_sign_recall" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         pairs AS (
           SELECT p.vec_id AS pid, c.vec_id AS cid,
             list_reduce(list_transform(range(1, 65), i -> p.e[i] * c.e[i]),
               (x, y) -> x + y) AS fs,
             len(list_filter(range(1, 65),
               i -> (p.e[i] > 0) = (c.e[i] > 0)))::BIGINT AS hs
           FROM v p JOIN v c ON p.vec_id <> c.vec_id
           WHERE p.vec_id < 20),
         tf AS (SELECT pid, cid FROM (
                  SELECT pid, cid, row_number() OVER
                    (PARTITION BY pid ORDER BY fs DESC, cid) AS rn
                  FROM pairs) WHERE rn <= 10),
         th AS (SELECT pid, cid, 1 AS hit FROM (
                  SELECT pid, cid, row_number() OVER
                    (PARTITION BY pid ORDER BY hs DESC, cid) AS rn
                  FROM pairs) WHERE rn <= 10)
         SELECT tf.pid AS probe_id,
           sum(coalesce(hit, 0))::BIGINT AS n_overlap,
           round(sum(coalesce(hit, 0))::DOUBLE / 10, 6) + 0 AS recall
         FROM tf LEFT JOIN th ON tf.pid = th.pid AND tf.cid = th.cid
         GROUP BY tf.pid ORDER BY probe_id""",

    // Integer weights, exact cross-multiplication cut — both engines
    // agree on every boundary; ties collapsed by the (lang, value)
    // pre-aggregate.
    "q_weighted_median" ->
      raw"""WITH t AS (
           SELECT lang, n_chars AS v,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS w
           FROM documents),
         pv AS (SELECT lang, v, sum(w)::BIGINT AS w FROM t GROUP BY lang, v),
         cw AS (SELECT lang, v,
                  sum(w) OVER (PARTITION BY lang ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(w) OVER (PARTITION BY lang) AS tot
                FROM pv)
         SELECT lang, min(v)::BIGINT AS weighted_median,
           max(tot)::BIGINT AS total_weight
         FROM cw WHERE cum * 2 >= tot
         GROUP BY lang ORDER BY lang""",

    // Exact integer counts; the risk share is the one division.
    "q_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
                      count(DISTINCT c_acctbal)::BIGINT AS l
                    FROM customer GROUP BY c_nationkey, c_mktsegment)
         SELECT 5::BIGINT AS k, count(*)::BIGINT AS n_groups,
           sum(n)::BIGINT AS n_rows,
           sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS rows_below_k,
           sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT AS groups_below_k,
           min(n)::BIGINT AS min_group_size,
           min(l)::BIGINT AS min_l_diversity,
           round(sum(CASE WHEN n < 5 THEN n ELSE 0 END)::DOUBLE
             / sum(n)::DOUBLE, 9) + 0 AS reident_risk_share
         FROM g""",

    // Both sides replayed: the brute-force >=0.2 pair set and the same
    // md5-hyperplane banded candidates the q_embed_neardup_lsh oracle
    // uses; recall is one exact integer ratio.
    "q_lsh_recall_eval" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 200),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         exact AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM n a JOIN n b ON a.vec_id < b.vec_id
           WHERE list_reduce(list_transform(range(1, 65), i -> a.e[i]*b.e[i]), (x, y) -> x + y)
               / (a.nrm * b.nrm) >= 0.2),
         sigged AS (SELECT vec_id, e,
           ${lshBandSigSql(bands = 8, planesPerBand = 2, dim = 64)} AS sigs
           FROM v),
         banded AS (
           SELECT vec_id, ub.i - 1 AS band, sigs[ub.i] AS band_sig
           FROM sigged CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ub),
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.band_sig = b.band_sig AND a.vec_id < b.vec_id),
         lsh AS (
           SELECT c.id_a, c.id_b, 1 AS hit
           FROM cand c JOIN n na ON na.vec_id = c.id_a
                       JOIN n nb ON nb.vec_id = c.id_b
           WHERE list_reduce(list_transform(range(1, 65), i -> na.e[i]*nb.e[i]), (x, y) -> x + y)
               / (na.nrm * nb.nrm) >= 0.2)
         SELECT count(*)::BIGINT AS n_exact,
           sum(coalesce(hit, 0))::BIGINT AS n_found,
           (count(*) - sum(coalesce(hit, 0)))::BIGINT AS n_missed,
           CASE WHEN count(*) > 0
             THEN round(sum(coalesce(hit, 0))::DOUBLE / count(*)::DOUBLE, 6) + 0
           END AS recall
         FROM exact LEFT JOIN lsh USING (id_a, id_b)""",

    // Multi-probe ladder: the q_lsh_recall_eval CTEs for level 0, plus
    // the Hamming-<=1 band predicate (xor + bit_count over the same
    // integer signatures) for level 1; identical re-score threshold.
    "q_lsh_multiprobe" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 200),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(range(1, 65), i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
               FROM v),
         exact AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM n a JOIN n b ON a.vec_id < b.vec_id
           WHERE list_reduce(list_transform(range(1, 65), i -> a.e[i]*b.e[i]), (x, y) -> x + y)
               / (a.nrm * b.nrm) >= 0.2),
         sigged AS (SELECT vec_id, e,
           ${lshBandSigSql(bands = 8, planesPerBand = 2, dim = 64)} AS sigs
           FROM v),
         banded AS (
           SELECT vec_id, ub.i - 1 AS band, sigs[ub.i] AS band_sig
           FROM sigged CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ub),
         cand0 AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.band_sig = b.band_sig AND a.vec_id < b.vec_id),
         lsh0 AS (
           SELECT c.id_a, c.id_b, 1 AS hit
           FROM cand0 c JOIN n na ON na.vec_id = c.id_a
                        JOIN n nb ON nb.vec_id = c.id_b
           WHERE list_reduce(list_transform(range(1, 65), i -> na.e[i]*nb.e[i]), (x, y) -> x + y)
               / (na.nrm * nb.nrm) >= 0.2),
         cand1 AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM sigged a JOIN sigged b ON a.vec_id < b.vec_id
           WHERE len(list_filter(range(1, 9),
             i -> bit_count(xor(a.sigs[i]::BIGINT, b.sigs[i]::BIGINT)) <= 1)) > 0),
         lsh1 AS (
           SELECT c.id_a, c.id_b, 1 AS hit
           FROM cand1 c JOIN n na ON na.vec_id = c.id_a
                        JOIN n nb ON nb.vec_id = c.id_b
           WHERE list_reduce(list_transform(range(1, 65), i -> na.e[i]*nb.e[i]), (x, y) -> x + y)
               / (na.nrm * nb.nrm) >= 0.2),
         r0 AS (SELECT 0 AS probe_level, count(*)::BIGINT AS n_exact,
                  sum(coalesce(hit, 0))::BIGINT AS n_found
                FROM exact LEFT JOIN lsh0 USING (id_a, id_b)),
         r1 AS (SELECT 1 AS probe_level, count(*)::BIGINT AS n_exact,
                  sum(coalesce(hit, 0))::BIGINT AS n_found
                FROM exact LEFT JOIN lsh1 USING (id_a, id_b)),
         u AS (SELECT * FROM r0 UNION ALL SELECT * FROM r1)
         SELECT probe_level, n_exact, n_found,
           (n_exact - n_found)::BIGINT AS n_missed,
           CASE WHEN n_exact > 0
             THEN round(n_found::DOUBLE / n_exact::DOUBLE, 6) + 0 END AS recall
         FROM u ORDER BY probe_level""",

    // The same 16-seed signature CTEs as q_minhash_lsh, joined to the
    // exact shingle-intersection Jaccard; the error chain is abs/mean/max
    // over identical doubles.
    "q_minhash_est_eval" ->
      raw"""WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents WHERE doc_id < 200),
         sh AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM toks),
         hashes AS (
           SELECT doc_id, s.seed,
             min(('0x' || substr(md5(s.seed::VARCHAR || '|' || shingle), 1, 8))::BIGINT) AS mh
           FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed) s
           GROUP BY doc_id, s.seed),
         sigs AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM hashes GROUP BY doc_id),
         banded AS (
           SELECT doc_id, sig, b.band,
             md5(b.band::VARCHAR || '|' || array_to_string(sig[b.band*2+1 : b.band*2+2], ',')) AS band_key
           FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band) b),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
             len(list_filter(range(1, 17), i -> a.sig[i] = b2.sig[i]))::DOUBLE / 16.0 AS est_jaccard
           FROM banded a JOIN banded b2
             ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_common
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         cnt AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id),
         j AS (
           SELECT c.id_a, c.id_b,
             abs(c.est_jaccard - i.n_common::DOUBLE
               / (ca.n_sh + cb.n_sh - i.n_common)::DOUBLE) AS err
           FROM cand c JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
             JOIN cnt ca ON ca.doc_id = c.id_a
             JOIN cnt cb ON cb.doc_id = c.id_b)
         SELECT count(*)::BIGINT AS n_pairs,
           round(sum(CAST(err AS DECIMAL(28,12)))::DOUBLE / count(*), 6) + 0 AS mean_abs_err,
           round(max(err), 6) + 0 AS max_abs_err,
           sum(CASE WHEN err <= 0.25 THEN 1 ELSE 0 END)::BIGINT AS n_within_band
         FROM j""",

    // Two signed-count sketches with the q_ams_f2 seed rule; the inner
    // product chain is exact integers, the exact size comes from the
    // vocab-sized count-frame equi-join.
    "q_join_size_est" ->
      """WITH ca AS (SELECT o_custkey AS v, count(*)::BIGINT AS c
                     FROM orders GROUP BY o_custkey),
         cb AS (SELECT c_custkey AS v, count(*)::BIGINT AS c
                FROM customer GROUP BY c_custkey),
         za AS (SELECT seed,
                  sum(CASE WHEN ('0x' || substr(md5(seed::VARCHAR || ':' || v::VARCHAR), 1, 8))::BIGINT % 2 = 0
                        THEN c ELSE -c END)::BIGINT AS z
                FROM ca, (SELECT unnest(range(160)) AS seed) GROUP BY seed),
         zb AS (SELECT seed,
                  sum(CASE WHEN ('0x' || substr(md5(seed::VARCHAR || ':' || v::VARCHAR), 1, 8))::BIGINT % 2 = 0
                        THEN c ELSE -c END)::BIGINT AS z
                FROM cb, (SELECT unnest(range(160)) AS seed) GROUP BY seed),
         mm AS (SELECT za.seed % 5 AS grp,
                  sum(za.z * zb.z)::DOUBLE / 32 AS mean
                FROM za JOIN zb ON za.seed = zb.seed GROUP BY za.seed % 5),
         med AS (SELECT list_sort(list(mean)) AS ms FROM mm),
         e AS (SELECT coalesce(sum(ca.c * cb.c), 0)::BIGINT AS exact_join_size
               FROM ca JOIN cb ON ca.v = cb.v)
         SELECT exact_join_size,
           round((ms[3] + ms[3]) / 2, 6) + 0 AS est_join_size,
           CASE WHEN exact_join_size > 0
             THEN round(abs((ms[3] + ms[3]) / 2 - exact_join_size::DOUBLE)
                    / exact_join_size::DOUBLE, 6) + 0
           END AS rel_err
         FROM e, med""",

    // The same simhash signature CTEs as q_simhash, banded into 16-bit
    // keys; every forecast number is an exact integer.
    "q_lsh_cost_plan" ->
      raw"""WITH tok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         h AS (SELECT doc_id,
             ('0x' || substr(md5('0|' || token), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5('0|' || token), 9, 8))::BIGINT AS h_hi
           FROM tok),
         bits AS (
           SELECT doc_id, b.bit,
             CASE WHEN (CASE WHEN b.bit < 32 THEN h_lo >> b.bit ELSE h_hi >> (b.bit - 32) END) & 1 = 1
               THEN 1 ELSE -1 END AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b),
         votes AS (SELECT doc_id, bit, sum(vote) AS vote_sum FROM bits GROUP BY 1, 2),
         sig AS (
           SELECT doc_id,
             sum(CASE WHEN vote_sum > 0
                   THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE 1::BIGINT << bit END
                   ELSE 0 END)::BIGINT AS simhash
           FROM votes GROUP BY doc_id),
         banded AS (
           SELECT b.band, (simhash >> (b.band * 16)) & 65535 AS key
           FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
         buckets AS (SELECT band, key, count(*)::BIGINT AS c
                     FROM banded GROUP BY band, key)
         SELECT band::BIGINT AS band, sum(c)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_buckets,
           (sum(c * (c - 1)) // 2)::BIGINT AS candidate_pairs,
           max(c)::BIGINT AS max_bucket
         FROM buckets GROUP BY band ORDER BY band""",

    // Counts-of-counts exact; c* is one double division per head row.
    "q_freq_spectrum" ->
      raw"""WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         tok AS (
           SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS sh
           FROM t),
         c AS (SELECT sh, count(*)::BIGINT AS c FROM tok GROUP BY sh),
         sp AS (SELECT c, count(*)::BIGINT AS n_types FROM c GROUP BY c),
         led AS (SELECT c, n_types,
                   CASE WHEN lead(c) OVER (ORDER BY c) = c + 1
                     THEN lead(n_types) OVER (ORDER BY c) END AS n_next
                 FROM sp)
         SELECT c, n_types,
           CASE WHEN n_next IS NOT NULL
             THEN round((c + 1)::DOUBLE * n_next / n_types, 6) + 0
           END AS gt_adjusted_count
         FROM led WHERE c <= 10 ORDER BY c""",

    // Per n: one distinct-per-doc shingle count aggregate; the rate is
    // one division on exact integers.
    "q_dup_rate_curve" ->
      raw"""WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         sh AS (
           SELECT n.n, doc_id,
             unnest(CASE WHEN len(t) >= n.n
               THEN list_distinct(list_transform(range(1, len(t) - n.n + 2),
                 i -> array_to_string(t[i:i+n.n-1], ' ')))
               ELSE [array_to_string(t, ' ')] END) AS shingle
           FROM t CROSS JOIN (SELECT unnest([1, 2, 3, 5]) AS n) n),
         g AS (SELECT n, shingle, count(*)::BIGINT AS c
               FROM sh GROUP BY n, shingle)
         SELECT n::BIGINT AS n, sum(c)::BIGINT AS n_instances,
           count(*)::BIGINT AS n_distinct,
           round(1.0 - count(*)::DOUBLE / sum(c)::DOUBLE, 6) + 0 AS dup_rate
         FROM g GROUP BY n ORDER BY n""",

    // Dominant-rhs ties break on the rhs value; every count exact.
    "q_fd_repair" ->
      """WITH p AS (SELECT source AS lhs_value, lang AS r, count(*)::BIGINT AS n
                    FROM documents GROUP BY source, lang),
         w AS (SELECT lhs_value, r, n,
                 row_number() OVER (PARTITION BY lhs_value
                                    ORDER BY n DESC, r ASC) AS rk,
                 sum(n) OVER (PARTITION BY lhs_value) AS tot,
                 count(*) OVER (PARTITION BY lhs_value) AS nr
               FROM p)
         SELECT lhs_value, tot::BIGINT AS n_rows, nr::BIGINT AS n_distinct_rhs,
           r AS dominant_rhs, n AS dominant_count,
           (tot - n)::BIGINT AS rows_to_repair
         FROM w WHERE rk = 1 AND nr > 1
         ORDER BY rows_to_repair DESC, lhs_value ASC LIMIT 20""",

    // The decompose CTEs feed quantile_cont over the SAME rounded(6)
    // residual doubles; the score snapshots at DECIMAL(28,12) before the
    // visible round (the q_mad_outliers ulp discipline).
    "q_seasonal_outliers" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS value
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         ph AS (
           SELECT event_type, day, value,
             (day - DATE '1970-01-01') % 7 AS phase
           FROM daily),
         tr AS (
           SELECT event_type, day, value, phase,
             CASE WHEN count(*) OVER w = 7 THEN
               (sum(CAST(value AS DECIMAL(28,12))) OVER w)::DOUBLE / 7
             END AS trend
           FROM ph
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         se AS (
           SELECT event_type, phase,
             sum(CAST(value - trend AS DECIMAL(28,12)))::DOUBLE / count(*) AS praw
           FROM tr WHERE trend IS NOT NULL GROUP BY event_type, phase),
         ce AS (
           SELECT event_type, phase,
             praw - (sum(CAST(praw AS DECIMAL(28,12))) OVER (PARTITION BY event_type))::DOUBLE
                      / count(*) OVER (PARTITION BY event_type) AS seasonal
           FROM se),
         resid AS (
           SELECT t.event_type, t.day,
             round(t.value - t.trend - c.seasonal, 6) + 0 AS residual
           FROM tr t JOIN ce c
             ON t.event_type = c.event_type AND t.phase = c.phase
           WHERE t.trend IS NOT NULL),
         med AS (SELECT event_type, quantile_cont(residual, 0.5) AS med
                 FROM resid GROUP BY event_type),
         mad AS (SELECT r.event_type, max(m.med) AS med,
                   quantile_cont(abs(r.residual - m.med), 0.5) AS mad
                 FROM resid r JOIN med m ON r.event_type = m.event_type
                 GROUP BY r.event_type)
         SELECT r.event_type, r.day, r.residual,
           round(a.med, 9) + 0 AS med, round(a.mad, 9) + 0 AS mad,
           CASE WHEN a.mad > 0
             THEN round(((r.residual - a.med) / a.mad)::DECIMAL(28,12), 6)::DOUBLE + 0
           END AS mad_score,
           CASE WHEN a.mad > 0
             THEN abs(round(((r.residual - a.med) / a.mad)::DECIMAL(28,12), 6)::DOUBLE) > 3.5
           END AS is_outlier
         FROM resid r JOIN mad a ON r.event_type = a.event_type
         ORDER BY r.event_type, r.day""",

    // Day-catalog frames only; the cumulative window is bounded by the
    // calendar, not the row count.
    "q_user_growth" ->
      """WITH fd AS (SELECT user_id, CAST(min(ts) AS DATE) AS day
                     FROM events GROUP BY user_id),
         nw AS (SELECT day, count(*)::BIGINT AS n_new FROM fd GROUP BY day),
         ac AS (SELECT day, count(*)::BIGINT AS n_active FROM (
                  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
                GROUP BY day)
         SELECT ac.day, n_active,
           coalesce(n_new, 0)::BIGINT AS n_new,
           (n_active - coalesce(n_new, 0))::BIGINT AS n_returning,
           sum(coalesce(n_new, 0)) OVER (ORDER BY ac.day
             ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
         FROM ac LEFT JOIN nw ON ac.day = nw.day
         ORDER BY ac.day""",

    // Pooled-variance z on exact integer per-user flags; the md5 cohort
    // rule is the shared hash convention.
    "q_ab_test" ->
      """WITH u AS (
           SELECT user_id,
             max(('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 = 0) AS a,
             max(event_type = 'purchase') AS conv
           FROM events GROUP BY user_id),
         s AS (SELECT
             sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN a AND conv THEN 1 ELSE 0 END)::BIGINT AS conv_a,
             sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS n_b,
             sum(CASE WHEN NOT a AND conv THEN 1 ELSE 0 END)::BIGINT AS conv_b
           FROM u),
         e AS (SELECT *,
             conv_a::DOUBLE / n_a AS pa, conv_b::DOUBLE / n_b AS pb,
             (conv_a + conv_b)::DOUBLE / (n_a + n_b) AS pool
           FROM s)
         SELECT n_a, conv_a, n_b, conv_b,
           CASE WHEN n_a > 0 THEN round(pa, 9) + 0 END AS rate_a,
           CASE WHEN n_b > 0 THEN round(pb, 9) + 0 END AS rate_b,
           CASE WHEN n_a > 0 AND n_b > 0
                 AND pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b) > 0
             THEN round((pa - pb) /
               sqrt(pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b)), 6) + 0
           END AS z_stat
         FROM e""",

    // Exact integer weight moments; ESS and its ratio are the two fixed
    // divisions.
    "q_ess" ->
      raw"""WITH t AS (
           SELECT lang,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS w
           FROM documents),
         a AS (SELECT lang, count(*)::BIGINT AS n_items,
                 sum(w)::BIGINT AS sum_w, sum(w * w)::BIGINT AS sum_w2
               FROM t GROUP BY lang)
         SELECT lang, n_items, sum_w,
           CASE WHEN sum_w2 > 0
             THEN round((sum_w * sum_w)::DOUBLE / sum_w2::DOUBLE, 6) + 0 END AS ess,
           CASE WHEN sum_w2 > 0 AND n_items > 0
             THEN round((sum_w * sum_w)::DOUBLE / sum_w2::DOUBLE / n_items, 6) + 0
           END AS ess_ratio
         FROM a ORDER BY lang"""
  )
}
