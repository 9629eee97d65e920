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

  /** Fixed-interval schedule with data-interval semantics (the model
    * behind the reference DAGs' `schedule_interval` + `catchup`,
    * database_etl.py:259-284): the run with logical date T covers the
    * interval [T, T+every) and becomes due once that interval has
    * fully elapsed. Times are epoch micros, matching the engine's
    * event-time unit.
    */
  final case class Schedule(startUs: Long, everyUs: Long) {
    require(everyUs > 0, "schedule interval must be positive")
  }

  /** Logical dates due at `nowUs`. With `catchup` every complete
    * interval since `lastRunUs` (exclusive; schedule start if none)
    * is returned oldest-first — the backfill a re-enabled pipeline
    * owes. Without `catchup` only the LATEST complete interval runs
    * and the backlog is skipped. Pure function: callers persist
    * `lastRunUs` however they persist offsets.
    */
  def dueRuns(s: Schedule, nowUs: Long, lastRunUs: Option[Long] = None,
              catchup: Boolean = true): Seq[Long] = {
    val from = lastRunUs.map(_ + s.everyUs).getOrElse(s.startUs)
    val due = Iterator.iterate(from)(_ + s.everyUs)
      .takeWhile(t => t + s.everyUs <= nowUs).toSeq
    if (catchup || due.isEmpty) due else Seq(due.last)
  }

  /** Execute every due logical date through [[run]], tagging each
    * stage result with its logical date — `stagesFor` builds the
    * interval-parameterized stages (the execution-date templating of
    * a DAG run). Failure isolation and retries are per stage per run,
    * and a failing interval does not block later intervals (the
    * max-active-runs=∞ catch-up shape).
    */
  def runScheduled(spark: SparkSession, s: Schedule, nowUs: Long,
                   lastRunUs: Option[Long] = None, catchup: Boolean = true)
                  (stagesFor: Long => Seq[Stage]): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val frames = dueRuns(s, nowUs, lastRunUs, catchup).map { t =>
      run(spark, stagesFor(t)).withColumn("logical_us", lit(t))
    }
    frames.reduceOption(_.unionByName(_)).getOrElse(
      run(spark, Seq.empty).withColumn("logical_us", lit(0L)).filter(lit(false)))
  }
}
