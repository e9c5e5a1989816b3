package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Loaders for the driver-generated test tables (/root/repo/TESTDATA.md).
  *
  * One parquet file per table. All query entry points take `(spark, sfDir)`
  * and resolve tables through here so the same code runs at any scale
  * factor — and, on a real cluster, against any warehouse path.
  */
object Tables {
  /** Plan-level memo of loaded base tables, keyed per (session, dir, name).
    *
    * `spark.read.parquet(path)` pays a driver-side file listing plus a
    * parquet footer read to infer the schema on EVERY call; a 369-query
    * bench re-pays that for every table of every query (guide §6: listing
    * and planning are driver-side, single-threaded costs). Memoizing the
    * resolved DataFrame reuses the relation's FileIndex and schema across
    * queries while changing NOTHING about execution: each action still
    * scans the parquet files — no data is cached, so every bench/oracle
    * invocation computes from the inputs (the no-result-caching rule is
    * untouched; this is the same class of reuse as a shared Hive catalog
    * entry). Keyed on the session so a new SparkSession (fresh Bench /
    * Verify process, or a test harness with its own session) never sees
    * another session's plans. Retention is honest about its bound
    * (r21 review): the memoized DataFrames strongly reference their
    * session, so weak keys could never evict — instead only the MOST
    * RECENT session's memo is kept; a session switch (multi-session
    * test JVMs) drops the previous session's entries outright.
    */
  private var memoSession: SparkSession = null
  private var memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** STATIC-INPUT ASSUMPTION (r22, ADVICE r21 item 3): the memo
    * snapshots each table's FileIndex at first load, so files added to
    * or removed from a base-table directory MID-SESSION are invisible
    * until a new SparkSession. That is the contract every caller
    * already lives by — the driver's test tables never change inside a
    * run, and the artifact stores write to their OWN directories (never
    * into a base table's) and manage their own re-listing. Any future
    * path that rewrites a base table in-session must call
    * [[invalidate]] (or use a fresh session) or it will silently read
    * the stale listing.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = synchronized {
      if (memoSession ne spark) {
        memoSession = spark
        memo = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
      }
      memo
    }
    perSession.computeIfAbsent((dir, name), _ => loadUncached(spark, dir, name))
  }

  /** Drop the memoized plan for one table (or every table of `dir` when
    * `name` is null) — the escape hatch for a caller that rewrites a
    * base-table directory mid-session (none exists today; see the
    * static-input note on [[load]]).
    */
  def invalidate(dir: String, name: String = null): Unit = synchronized {
    if (name != null) memo.remove((dir, name))
    else memo.keySet.removeIf(_._1 == dir)
  }

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped in two physical layouts across testdata
      // generations: INT64 TIMESTAMP(NANOS) (which Spark 4 refuses to map
      // to TimestampType — read as nanos-since-epoch long under the
      // scoped legacy flag and convert; integer `div`, a double roundtrip
      // would lose precision above 2^53 ns) and plain TIMESTAMP(MICROS)
      // with isAdjustedToUTC=false (inferred as TIMESTAMP_NTZ — cast to
      // the session-zoned TimestampType every consumer was built against;
      // the session zone is UTC everywhere, so wall-clock values are
      // unchanged). Adapt on the OBSERVED schema so either generation
      // loads identically. The legacy flag is scoped to this read:
      // restored afterwards so other parquet reads in the session still
      // fail loudly on nanos columns instead of silently yielding longs.
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val raw = spark.read.parquet(s"$dir/$name.parquet")
        val read = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case org.apache.spark.sql.types.TimestampNTZType =>
            raw.withColumn("ts", col("ts").cast("timestamp"))
          case _ => raw
        }
        // force schema resolution while the flag is set; execution re-reads
        // the footer, so the plan itself must carry the resolved schema
        read.schema
        read
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    } else
      spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
