package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.Pipeline.{Schedule, backlogSize, drainPlan, dueRuns}

/** Property-based specs for the pure scheduling arithmetic — the
  * closed-form interval math in [[Pipeline]] replaced a
  * generate-and-scan loop that wrapped negative near Long.MaxValue,
  * so these run the laws over randomized schedules INCLUDING the
  * extreme-epoch regime instead of a handful of pinned examples.
  *
  * Generators bound the owed backlog (≤ ~5k intervals) so the laws
  * stay cheap, while start epochs range over ±2⁶⁰ and intervals over
  * nine orders of magnitude.
  */
object PipelineProps extends Properties("Pipeline") {

  private val genCase: Gen[(Schedule, Long, Option[Long], Int)] = for {
    everyUs <- Gen.chooseNum(1L, 1000000000000L) // 1 µs .. ~11.6 days
    startUs <- Gen.chooseNum(-(1L << 60), (1L << 60))
    n <- Gen.chooseNum(0L, 5000L)  // complete intervals elapsed
    frac <- Gen.chooseNum(0L, everyUs - 1)  // inside the open interval
    nowUs = startUs + n * everyUs + frac
    last <- Gen.oneOf(
      Gen.const(None),
      Gen.chooseNum(0L, n).map(k => Some(startUs + k * everyUs)))
    maxRuns <- Gen.chooseNum(1, 50)
  } yield (Schedule(startUs, everyUs), nowUs, last, maxRuns)

  property("drainPlan flattens to the full backlog, chunked at maxRuns") =
    forAll(genCase) { case (s, now, last, maxRuns) =>
      val chunks = drainPlan(s, now, last, maxRuns)
      val flat = chunks.flatten
      val owed = backlogSize(s, now, last)
      (flat.length.toLong == owed) :| s"flat=${flat.length} owed=$owed" &&
        Prop(chunks.dropRight(1).forall(_.length == maxRuns)) :|
          "non-final chunk not full" &&
        Prop(chunks.lastOption.forall(c => c.nonEmpty && c.length <= maxRuns)) :|
          "final chunk empty or oversized"
    }

  property("due dates are complete intervals, evenly spaced, oldest-first") =
    forAll(genCase) { case (s, now, last, maxRuns) =>
      val flat = drainPlan(s, now, last, maxRuns).flatten
      val from = last.map(_ + s.everyUs).getOrElse(s.startUs)
      Prop(flat.forall(t => t <= now - s.everyUs)) :| "open interval emitted" &&
        Prop(flat.zipWithIndex.forall { case (t, i) =>
          t == from + i * s.everyUs }) :| "dates not contiguous from `from`" &&
        Prop(flat.isEmpty || flat.last > now - 2 * s.everyUs) :|
          "backlog stopped before the latest closed interval"
    }

  property("no-catchup runs exactly the latest closed interval") =
    forAll(genCase) { case (s, now, last, _) =>
      val all = dueRuns(s, now, last, catchup = true, maxRuns = 6000)
      val latest = dueRuns(s, now, last, catchup = false)
      if (all.isEmpty) Prop(latest.isEmpty) :| "latest nonempty on empty backlog"
      else (latest == Seq(all.last)) :| s"latest=$latest all.last=${all.last}"
    }

  property("dueRuns truncation signal: length==maxRuns iff backlog continues") =
    forAll(genCase) { case (s, now, last, maxRuns) =>
      val got = dueRuns(s, now, last, catchup = true, maxRuns)
      val owed = backlogSize(s, now, last)
      (got.length.toLong == math.min(owed, maxRuns.toLong)) :|
        s"got=${got.length} owed=$owed maxRuns=$maxRuns"
    }

  // the documented regression regime: logical dates adjacent to
  // Long.MaxValue must terminate and stay exact (the pre-fix scan
  // wrapped negative and never did)
  property("extreme-epoch schedules near Long.MaxValue stay exact") =
    forAll(Gen.chooseNum(1L, 1000000L), Gen.chooseNum(0L, 100L)) {
      (everyUs, n) =>
        val now = Long.MaxValue - 1
        val start = now - n * everyUs
        val s = Schedule(start, everyUs)
        val due = dueRuns(s, now, None, catchup = true, maxRuns = 200)
        (due.length.toLong == backlogSize(s, now, None)) :|
          s"len=${due.length} owed=${backlogSize(s, now, None)}" &&
          Prop(due.forall(t => t <= now - everyUs)) :| "open interval emitted"
    }
}
