package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal pipeline runner — the engine-side analog of the reference's
  * Airflow DAG runs (goes_satellite_etl.py task chain: download →
  * extract → metrics): named stages execute in declaration order,
  * each stage's output feeds observability (row count, wall time,
  * success) into a metrics table like the reference's task-status
  * monitoring (README.md:219-228).
  *
  * Stages stay lazy DataFrames; `run` times a full noop-sink
  * materialization (a `count()` would let Catalyst prune projected
  * columns and understate the stage) and records the row count
  * separately, untimed.
  */
object Pipeline {

  final case class StageResult(
      stage: String, rows: Long, seconds: Double, ok: Boolean,
      attempts: Int, error: String)

  /** @param maxAttempts total tries (1 = no retry) — the Airflow
    *                    `retries` analog (database_etl.py:259-284
    *                    default_args retries/retry_delay)
    */
  final case class Stage(name: String, build: SparkSession => DataFrame,
                         maxAttempts: Int = 1)

  def stage(name: String, maxAttempts: Int = 1)
           (build: SparkSession => DataFrame): Stage =
    Stage(name, build, maxAttempts)

  /** Execute stages in order; a failed stage retries up to its
    * `maxAttempts` (driver-level re-submission — Spark already retries
    * tasks/stages internally, this covers whole-job failures like a
    * source appearing late), then is recorded and the run continues
    * (the reference DAG's per-task retry/failure isolation).
    */
  def run(spark: SparkSession, stages: Seq[Stage]): DataFrame = {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    val results = stages.map { s =>
      val t0 = System.nanoTime()
      def attempt(n: Int): StageResult =
        try {
          val df = s.build(spark)
          df.write.format("noop").mode("overwrite").save()
          val seconds = (System.nanoTime() - t0) / 1e9
          StageResult(s.name, df.count(), seconds, ok = true, n, "")
        } catch {
          case e: Exception if n < s.maxAttempts => attempt(n + 1)
          case e: Exception =>
            StageResult(s.name, -1L, (System.nanoTime() - t0) / 1e9,
              ok = false, n, String.valueOf(e.getMessage))
        }
      attempt(1)
    }
    results.toDF()
  }
}
