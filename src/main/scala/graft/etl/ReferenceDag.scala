package graft.etl

import java.nio.file.{Files, Path, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import Orchestrator._

/** The reference DAG's exact topology, assembled on the local
  * [[Orchestrator]] runtime (/root/reference/dags/dag.py:176-180):
  *
  * {{{
  * start_pipeline >> stage_script          >> launch_cluster
  * start_pipeline >> stage_dimension_table >> launch_cluster
  * launch_cluster >> add_steps >> watch_step >> terminate_cluster >> end_pipeline
  * }}}
  *
  * Task-for-task mapping (same ids, local semantics):
  *  - `stage_script` / `stage_dimension_table` (dag.py:51-71, the two
  *    parallel S3 uploads): copy the job inputs into a staging dir —
  *    the handoff point a real deployment mounts remotely; each returns
  *    its staged path via XCom.
  *  - `launch_cluster` (dag.py:117-123): bind the SparkSession — the
  *    local stand-in for the job-flow id, returned via XCom exactly as
  *    EmrCreateJobFlowOperator pushes its cluster id (consumed by three
  *    downstream tasks via xcom_pull, dag.py:147/160/168).
  *  - `add_steps` (dag.py:144-153): submit the data-plane work — BOTH
  *    pipelines against the staged inputs — and return the output URI
  *    (the step-id analog).
  *  - `watch_step` (dag.py:157-163, EmrStepSensor): poll the sinks'
  *    `_SUCCESS` markers until all three land or the timeout fires.
  *  - `terminate_cluster` (dag.py:166-171): TriggerRule.AllDone — the
  *    cleanup runs whether the step succeeded or not, the semantic the
  *    EMR terminate needs in production to not leak clusters (here it
  *    releases the session reference; stopping a shared session is the
  *    caller's call via `stopSparkOnTerminate`).
  *
  * Retries follow default_args (retries=1, dag.py:24) with a local delay;
  * `@once` (dag.py:31) is the marker-dir contract — a completed run id
  * re-enters as all-Skipped.
  */
object ReferenceDag {

  /** All sinks the watch_step sensor gates on (the three parquet sinks of
    * the Eurex pipeline plus the Xetra fact sink).
    */
  private def successMarkers(outDir: String): Seq[Path] = Seq(
    Path.of(outDir, "data", "xetra", "_SUCCESS"),
    Path.of(outDir, "data", "eurex", "_SUCCESS"),
    Path.of(outDir, "quality_check", "missing_isin", "_SUCCESS"),
    Path.of(outDir, "quality_check", "missing_underlying", "_SUCCESS"))

  def build(spark: SparkSession, xetraCsv: String, eurexCsv: String, dimCsv: String,
            stagingDir: Path, outDir: String, markerDir: Option[Path] = None,
            stopSparkOnTerminate: Boolean = false,
            sensorPollMs: Long = 200, sensorTimeoutMs: Long = 120000): LocalDag = {
    val dag = new LocalDag("deutsche_boerse_spark_job",
      retries = 1, retryDelayMs = 100, onceMarkerDir = markerDir)

    val start = dag.dummy("start_pipeline")

    def stage(name: String, src: String): TaskRef = dag.task(name) { _ =>
      val dst = stagingDir.resolve(Path.of(src).getFileName)
      Files.createDirectories(stagingDir)
      Files.copy(Path.of(src), dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toString
    }
    // dag.py stages the etl script; the data-plane here is compiled in,
    // so the script-analog staged artifact is the Xetra input itself
    val stageScript = stage("stage_script", xetraCsv)
    val stageDim = stage("stage_dimension_table", dimCsv)

    val launch = dag.task("launch_cluster") { _ => spark.sparkContext.applicationId }

    val addSteps = dag.task("add_steps") { xcom =>
      // consume the upstream XComs exactly as dag.py:147 pulls the
      // job-flow id and 160-162 the step id
      val appId = xcom.pull[String]("launch_cluster")
      require(appId == spark.sparkContext.applicationId, "stale cluster handle")
      val stagedXetra = xcom.pull[String]("stage_script")
      val stagedDim = xcom.pull[String]("stage_dimension_table")
      XetraPipeline.run(spark, stagedXetra, outDir)
      EurexPipeline.run(spark, eurexCsv, stagedDim, outDir)
      outDir
    }

    val watch = dag.sensor("watch_step", sensorPollMs, sensorTimeoutMs) { xcom =>
      successMarkers(xcom.pull[String]("add_steps")).forall(Files.exists(_))
    }

    val terminate = dag.task("terminate_cluster", TriggerRule.AllDone) { _ =>
      if (stopSparkOnTerminate) spark.stop()
      "released"
    }

    val end = dag.dummy("end_pipeline")

    start >> stageScript >> launch
    start >> stageDim >> launch
    launch >> addSteps >> watch >> terminate >> end
    dag
  }
}
