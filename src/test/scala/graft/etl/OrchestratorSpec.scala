package graft.etl

import graft.SparkSpec
import graft.etl.Orchestrator._
import java.nio.file.Files

/** Scheduler-semantics spec for the local control plane (the dag.py
  * counterpart): topology + XCom, retries, sensor poll/timeout, failure
  * propagation vs TriggerRule.AllDone, cycle rejection, @once re-entry —
  * then the full reference topology end-to-end on the sample data.
  */
class OrchestratorSpec extends SparkSpec {

  test("topological execution with deterministic ready order and XCom handoff") {
    val dag = new LocalDag("t1")
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val a = dag.task("a") { _ => seen += "a"; 7 }
    val c = dag.task("c") { _ => seen += "c"; () } // declared before b on purpose
    val b = dag.task("b") { _ => seen += "b"; () }
    val d = dag.task("d") { xcom => seen += "d"; xcom.pull[Int]("a") * 2 }
    a >> b >> d
    a >> c >> d
    val run = dag.run()
    assert(run.succeeded)
    // a first; b and c both ready after a → id order; d last
    assert(seen.toSeq === Seq("a", "b", "c", "d"))
    assert(run.runs("d").value === Some(14))
  }

  test("xcom.pull of an unknown task fails loudly, pullOpt returns None") {
    val dag = new LocalDag("t2")
    val a = dag.task("a") { xcom =>
      assert(xcom.pullOpt[Int]("ghost").isEmpty)
      intercept[NoSuchElementException] { xcom.pull[Int]("ghost") }
      "ok"
    }
    assert(dag.run().succeeded)
  }

  test("retries: a flaky body succeeds on the second attempt; attempts reported") {
    val dag = new LocalDag("t3", retries = 1, retryDelayMs = 1)
    var calls = 0
    dag.task("flaky") { _ =>
      calls += 1
      if (calls == 1) throw new RuntimeException("transient")
      "recovered"
    }
    val run = dag.run()
    assert(run.succeeded)
    assert(run.runs("flaky").attempts === 2)
    assert(run.runs("flaky").value === Some("recovered"))
  }

  test("retries exhausted: task fails with the attempt count, error recorded") {
    val dag = new LocalDag("t4", retries = 1, retryDelayMs = 1)
    dag.task("doomed") { _ => throw new IllegalStateException("permanent") }
    val run = dag.run()
    assert(run.state("doomed") === TaskState.Failed)
    assert(run.runs("doomed").attempts === 2)
    assert(run.runs("doomed").error.exists(_.contains("permanent")))
  }

  test("sensor pokes until true; sensor timeout is a task failure") {
    val dag = new LocalDag("t5")
    var pokes = 0
    dag.sensor("ready", pollMs = 1, timeoutMs = 5000) { _ => pokes += 1; pokes >= 3 }
    val run = dag.run()
    assert(run.succeeded)
    assert(run.runs("ready").value === Some(3))

    val dag2 = new LocalDag("t5b")
    dag2.sensor("never", pollMs = 1, timeoutMs = 30) { _ => false }
    val run2 = dag2.run()
    assert(run2.state("never") === TaskState.Failed)
    assert(run2.runs("never").error.exists(_.contains("timed out")))
  }

  test("failure skips AllSuccess downstream but AllDone cleanup still runs") {
    val dag = new LocalDag("t6")
    val a = dag.task("a") { _ => throw new RuntimeException("boom") }
    val b = dag.task("b") { _ => "unreachable" }
    var cleaned = false
    val c = dag.task("cleanup", TriggerRule.AllDone) { _ => cleaned = true; "done" }
    a >> b >> c
    val run = dag.run()
    assert(run.state("a") === TaskState.Failed)
    assert(run.state("b") === TaskState.Skipped)
    assert(run.runs("b").error.exists(_.contains("upstream failed: a")))
    assert(run.state("cleanup") === TaskState.Success)
    assert(cleaned)
  }

  test("cycles and undeclared-task edges are rejected at build/run time") {
    val dag = new LocalDag("t7")
    val a = dag.task("a")(_ => ())
    val b = dag.task("b")(_ => ())
    a >> b
    b >> a
    intercept[IllegalArgumentException] { dag.run() }

    val dag2 = new LocalDag("t7b")
    val x = dag2.task("x")(_ => ())
    intercept[IllegalArgumentException] { x >> new LocalDag("other").task("y")(_ => ()) }
    val dag3 = new LocalDag("t7c")
    dag3.task("z")(_ => ())
    intercept[IllegalArgumentException] { dag3.task("z")(_ => ()) } // duplicate id
  }

  test("@once: a completed run id re-enters as all-Skipped; a new run id executes") {
    val marker = Files.createTempDirectory("graft_dag_marker")
    def build(): LocalDag = {
      val dag = new LocalDag("t8", onceMarkerDir = Some(marker))
      dag.task("work") { _ => "did it" }
      dag
    }
    val first = build().run("2020-10-17")
    assert(first.succeeded && !first.alreadyRan)
    val again = build().run("2020-10-17")
    assert(again.alreadyRan)
    assert(again.state("work") === TaskState.Skipped)
    val other = build().run("2020-10-18")
    assert(other.succeeded && !other.alreadyRan)
  }

  test("@once: a FAILED run does not write the marker, so the retry re-executes") {
    val marker = Files.createTempDirectory("graft_dag_marker2")
    var attempt = 0
    def build(): LocalDag = {
      val dag = new LocalDag("t9", onceMarkerDir = Some(marker))
      dag.task("work") { _ =>
        attempt += 1
        if (attempt == 1) throw new RuntimeException("first run dies")
        "second run lands"
      }
      dag
    }
    assert(build().run("d1").state("work") === TaskState.Failed)
    val second = build().run("d1")
    assert(!second.alreadyRan && second.succeeded)
  }

  test("depends_on_past skips a task whose previous instance failed, until repaired") {
    // the incremental-load contract (VERDICT r17 item 6): a
    // depends_on_past increment must not apply over a hole — and the
    // hole PROPAGATES until the failed day is repaired
    var dayOneBroken = true
    def build(): LocalDag = {
      val dag = new LocalDag("dp1")
      val extract = dag.task("extract") { _ => "rows" }
      val load = dag.task("load", dependsOnPast = true) { _ =>
        if (dayOneBroken) throw new RuntimeException("day-1 load dies")
        "loaded"
      }
      val report = dag.task("report") { _ => "ok" }
      extract >> load >> report
      dag
    }
    val r1 = build().run("d1")
    assert(r1.state("load") === TaskState.Failed)
    // day 2: its own body would succeed, but the past instance failed
    dayOneBroken = false
    val r2 = build().run("d2", past = Some(r1))
    assert(r2.state("extract") === TaskState.Success)
    assert(r2.state("load") === TaskState.Skipped)
    assert(r2.runs("load").error.exists(_.contains("depends_on_past")))
    assert(r2.state("report") === TaskState.Skipped,
      "downstream of a depends_on_past skip must skip too")
    // the hole propagates: day 3 after day 2's skip also skips
    val r3 = build().run("d3", past = Some(r2))
    assert(r3.state("load") === TaskState.Skipped)
    // repair day 1, then the chain unblocks
    val r1fixed = build().run("d1")
    assert(r1fixed.succeeded)
    val r2fixed = build().run("d2", past = Some(r1fixed))
    assert(r2fixed.succeeded)
  }

  test("backfill runs an ordered window, honoring depends_on_past and @once markers") {
    val marker = Files.createTempDirectory("graft_dag_backfill")
    var failOn: Set[String] = Set.empty
    def build(): LocalDag = {
      val dag = new LocalDag("bf1", onceMarkerDir = Some(marker))
      val ingest = dag.task("ingest") { _ => "in" }
      val inc = dag.task("inc", dependsOnPast = true) { x =>
        if (failOn.contains("inc")) throw new RuntimeException("boom")
        x.pull[String]("ingest") + "+inc"
      }
      ingest >> inc
      dag
    }
    val window = Seq("2020-11-01", "2020-11-02", "2020-11-03")
    val runs = build().backfill(window)
    assert(runs.map(_.runId) === window)
    assert(runs.forall(_.succeeded))
    // re-backfilling the same window is a full no-op (@once markers per
    // run id), and marker-skipped runs count as an all-success past
    val again = build().backfill(window ++ Seq("2020-11-04"))
    assert(again.take(3).forall(_.alreadyRan))
    assert(!again.last.alreadyRan && again.last.succeeded,
      "the new day must run with the marker-skipped window as its past")
    // duplicate / empty windows are build errors
    intercept[IllegalArgumentException](build().backfill(Seq("d", "d")))
    intercept[IllegalArgumentException](build().backfill(Seq.empty))
  }

  test("reference topology end-to-end: six-task lifecycle over the sample data") {
    val xetraCsv = "/root/reference/sample-data/2020-11-24_BINS_XETR08.csv"
    val eurexCsv = "/root/reference/sample-data/2020-11-24_BINS_XEUR08.csv"
    val dimCsv = "/root/reference/dags/dimension_data/eurex_product_specification.csv"
    val staging = Files.createTempDirectory("graft_dag_staging")
    val out = Files.createTempDirectory("graft_dag_out").toString
    val marker = Files.createTempDirectory("graft_dag_once")

    val dag = ReferenceDag.build(spark, xetraCsv, eurexCsv, dimCsv,
      staging, out, markerDir = Some(marker))
    val run = dag.run("2020-10-17")
    withClue(run.runs.values.map(r => s"${r.task}=${r.state}${r.error.fold("")(" " + _)}").mkString("; ")) {
      assert(run.succeeded)
    }
    // XCom flow: launch pushed the app id, add_steps pushed the out dir
    assert(run.runs("launch_cluster").value === Some(spark.sparkContext.applicationId))
    assert(run.runs("add_steps").value === Some(out))
    // the staged dimension table actually fed the join: sinks are real
    assert(spark.read.parquet(s"$out/data/xetra").count() === 15057)
    assert(spark.read.parquet(s"$out/data/eurex").count() === 3546)
    assert(spark.read.parquet(s"$out/quality_check/missing_underlying").count() > 0)
    // the sensor observed the _SUCCESS markers (>= 1 poke)
    assert(run.runs("watch_step").value.exists(_.asInstanceOf[Int] >= 1))
    // @once: re-entry of the same logical date is a no-op
    val again = ReferenceDag.build(spark, xetraCsv, eurexCsv, dimCsv,
      staging, out, markerDir = Some(marker)).run("2020-10-17")
    assert(again.alreadyRan)
  }
}
