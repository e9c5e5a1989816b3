package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Deterministic cost profile per query: Spark jobs, stages, tasks and
  * summed executor task time — the noise-free complements of wall-clock
  * bench seconds on a steal-prone microVM (r21). Job/stage/task counts
  * are a pure function of the plan + data, so a before/after diff of
  * this tool's output is trustworthy evidence where a single wall-time
  * sample is not (guide §1: decide where time goes before optimizing).
  *
  * Usage: graft.tools.JobCount <sfDir> <query> [query ...]
  * Emits one line per query:
  *   JOBCOUNT <name> jobs=J stages=S tasks=T taskTimeSec=X wallSec=W
  *
  * The query runs once untimed (memoized artifacts, codegen) before the
  * counted run, mirroring BenchOne's warm discipline.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    require(names.nonEmpty, "name at least one query id")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Portable.silenceKRowWindowWarnings()

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    @volatile var counting = false
    val jobDetail = sys.env.get("GRAFT_JOB_DETAIL").contains("1")
    @volatile var lastEventNs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (counting) {
          jobs.incrementAndGet()
          val now = System.nanoTime()
          if (jobDetail && lastEventNs > 0)
            System.err.println(f"[jobgap] ${(now - lastEventNs) / 1e9}%.3f s before job ${j.jobId}")
          lastEventNs = now
        }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (counting) {
          val now = System.nanoTime()
          if (jobDetail && lastEventNs > 0)
            System.err.println(f"[jobrun] ${(now - lastEventNs) / 1e9}%.3f s in job ${e.jobId}")
          lastEventNs = now
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (counting) stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (counting) { tasks.incrementAndGet(); taskTimeMs.addAndGet(t.taskInfo.duration) }
    })

    // the bench's artifact warm-up set, so steady-state costs are measured
    // (r22, ADVICE r21: NonFatal only — swallowing OutOfMemoryError or
    // InterruptedException here would mask broken artifacts and produce
    // misleading steady-state numbers downstream)
    Seq("q_groupby_agg", "q_row_number",
        "q_join_bucketed", "q_zorder_scan", "q_ivf_topk", "q_pq_topk",
        "q_ivfpq_topk", "q_ivfpq_res_topk").foreach { name =>
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(t) =>
        System.err.println(s"[jobcount] warm-up $name failed: $t") }
    }
    def warm(what: String)(build: => Long): Unit =
      try build catch { case scala.util.control.NonFatal(t) =>
        System.err.println(s"[jobcount] $what artifact warm-up FAILED: $t") }
    warm("shingle")(graft.sources.ShingleStore.ensureShingles(spark, sfDir, 3).count())
    warm("token")(graft.sources.TokenStore.ensureTokens(spark, sfDir).count())
    warm("pair")(graft.sources.PairStore.ensurePairs(spark, sfDir).count())
    warm("item-count")(graft.sources.PairStore.ensureItems(spark, sfDir).count())
    warm("basket")(graft.sources.PairStore.ensureBaskets(spark, sfDir).count())
    warm("bt-wins")(graft.sources.PairStore.ensureBtWins(spark, sfDir).count())
    warm("moments")(graft.sources.MomentStore.ensure(spark, sfDir).cells.count())

    def stealTicks(): Long =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/stat"))
        .linesIterator.next().trim.split("\\s+")(8).toLong
      catch { case _: Throwable => -1L }
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[jobcount] unknown query: $name")
        case Some(fn) =>
          try fn(spark, sfDir).count()
          catch { case scala.util.control.NonFatal(t) =>
            System.err.println(s"[jobcount] warm run $name failed: $t") }
          // drain the warm run's async listener events BEFORE resetting
          // the counters, or its stragglers land in the measured window
          Thread.sleep(300)
          jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0L)
          counting = true
          val s0 = stealTicks()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case scala.util.control.NonFatal(t) =>
              System.err.println(s"[jobcount] $name FAILED: $t"); false }
          val wall = (System.nanoTime() - t0) / 1e9
          val steal = (stealTicks() - s0) / 100.0
          // drain listener-bus stragglers before reading the counters
          // (listenerBus is spark-private; a short sleep is enough for a
          // builder-side diagnostic)
          Thread.sleep(300)
          counting = false
          if (ok) println(f"JOBCOUNT $name jobs=${jobs.get} stages=${stages.get} " +
            f"tasks=${tasks.get} taskTimeSec=${taskTimeMs.get / 1000.0}%.2f " +
            f"wallSec=$wall%.3f stealSec=$steal%.2f")
      }
    }
    spark.stop()
  }
}
