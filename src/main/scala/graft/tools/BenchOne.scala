package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated-warm adjudicator (r19, VERDICT r18 item 6): re-time one or
  * more query ids against the fully-warmed artifact set and report
  * per-query min/median over N runs, with the steal delta alongside —
  * the one-command version of the by-hand protocol the round notes use
  * to adjudicate bench `top_deltas` (a microVM steal gust lands on
  * whatever happens to be executing; the committed BENCH number is only
  * trustworthy when an isolated re-time at low steal reproduces it).
  *
  * Differences from [[Explain]]: Bench's FULL artifact warm-up runs
  * first (bucketed/z-order layouts, IVF/PQ models, shingle/token/pair
  * stores, the moment store), so the measured number is the steady
  * state the bench suite sees, not a first-consumer build; output is
  * one machine-greppable line per query, pasted into NOTES verbatim.
  *
  * Usage: graft.tools.BenchOne <sfDir> <runs> <query> [query ...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    require(runs >= 1, "need at least one run")
    val names = args.drop(2)
    require(names.nonEmpty, "name at least one query id")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000") // match Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Portable.silenceKRowWindowWarnings()

    def stealTicks(): Long =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/stat"))
        .linesIterator.next().trim.split("\\s+")(8).toLong
      catch { case _: Throwable => -1L }

    // Bench's exact warm-up set: codegen paths + every persisted artifact
    Seq("q_groupby_agg", "q_row_number",
        "q_join_bucketed", "q_zorder_scan", "q_ivf_topk", "q_pq_topk",
        "q_ivfpq_topk", "q_ivfpq_res_topk").foreach { name =>
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    def warm(what: String)(build: => Long): Unit =
      try build
      catch { case t: Throwable =>
        System.err.println(s"[benchone] $what artifact warm-up FAILED: $t")
      }
    warm("shingle")(graft.sources.ShingleStore.ensureShingles(spark, sfDir, 3).count())
    warm("token")(graft.sources.TokenStore.ensureTokens(spark, sfDir).count())
    warm("pair")(graft.sources.PairStore.ensurePairs(spark, sfDir).count())
    warm("item-count")(graft.sources.PairStore.ensureItems(spark, sfDir).count())
    warm("basket")(graft.sources.PairStore.ensureBaskets(spark, sfDir).count())
    warm("bt-wins")(graft.sources.PairStore.ensureBtWins(spark, sfDir).count())
    warm("moments")(graft.sources.MomentStore.ensure(spark, sfDir).cells.count())

    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[benchone] unknown query: $name")
        case Some(fn) =>
          // one untimed run absorbs this query's own lazy session state
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
          val s0 = stealTicks()
          // A failed run must not masquerade as a timing (ADVICE r19
          // item 2: an instantly-throwing query would report a bogus
          // fast min/median — exactly the number that gets pasted into
          // NOTES as an adjudication). Failures are excluded from the
          // stats and reported as runs_failed=N; all-failed prints a
          // FAILED line with no stats at all.
          val timed = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            val ok = try { fn(spark, sfDir).count(); true }
              catch { case t: Throwable =>
                System.err.println(s"[benchone] $name run FAILED: $t"); false }
            ((System.nanoTime() - t0) / 1e9, ok)
          }
          val stealSec = if (s0 >= 0) (stealTicks() - s0) / 100.0 else -1.0
          val failed = timed.count(!_._2)
          val times = timed.collect { case (t, true) => t }.sorted
          if (times.isEmpty)
            println(f"BENCHONE $name sf=$sfDir runs=$runs runs_failed=$failed " +
              f"FAILED steal_sec=$stealSec%.2f")
          else {
            val median = times(times.size / 2)
            println(f"BENCHONE $name sf=$sfDir runs=$runs runs_failed=$failed " +
              f"min=${times.head}%.3f median=$median%.3f max=${times.last}%.3f " +
              f"steal_sec=$stealSec%.2f")
          }
      }
    }
    spark.stop()
  }
}
