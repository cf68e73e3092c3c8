package graft.core

import java.time.LocalDate

/** Data-cube timeline generation (SURVEY §2.5 C12).
  *
  * Re-expresses the semantics of the reference's timeline mounting
  * (`cube_builder/utils/timeline.py:76-205`): regular composite periods
  * over a requested date range, in three flavors:
  *
  *  - '''Continuous''': periods of `step` `unit`s starting exactly at
  *    `start`, running until the range is covered (last period may extend
  *    past `end`).
  *  - '''Cyclic''': periods restart at each cycle boundary (e.g. yearly
  *    cycle of 16-day periods ⇒ every Jan 1 starts a fresh period and the
  *    final period of each year is truncated to Dec 31).
  *  - '''Interval (seasonal)''': explicit `MM-dd_MM-dd` windows repeated
  *    per year (optionally inside a cycle).
  *
  * Dates use `java.time.LocalDate`; all arithmetic is ISO-proleptic, same
  * as Python's `datetime.date` + `relativedelta` for the operations used.
  */
object Timeline {

  final case class Period(start: LocalDate, end: LocalDate)

  /** `MM-dd_MM-dd` seasonal windows, e.g. `List("12-21_03-20", "03-21_06-20")`. */
  final case class Intervals(specs: List[String]) {
    require(specs.nonEmpty, "intervals must be non-empty")

    private def split(spec: String): (Int, Int, Int, Int) = {
      val Array(s, e) = spec.split('_')
      val Array(sm, sd) = s.split('-').map(_.toInt)
      val Array(em, ed) = e.split('-').map(_.toInt)
      (sm, sd, em, ed)
    }

    /** Index of the interval whose start equals `ref`'s month-day; 0 otherwise. */
    def indexOf(ref: LocalDate): Int = {
      val key = f"${ref.getMonthValue}%02d-${ref.getDayOfMonth}%02d"
      val i = specs.indexWhere(_.split('_')(0) == key)
      if (i >= 0 && i < specs.length) i else 0
    }

    /** (startMonth, startDay, endMonth, endDay) of interval `i` (wrapping). */
    def element(i: Int): (Int, Int, Int, Int) =
      split(specs(if (i < specs.length) i else 0))

    /** Resolve a month-day element to a concrete date near `ref`.
      *
      * Mirrors the reference's year-adjustment rules: with `sumYear`, an
      * element month earlier than `ref`'s month rolls to next year; without
      * it, an element month later than `ref`'s rolls to the previous year;
      * `next` forces next year in the no-adjustment case.
      */
    def resolve(ref: LocalDate, month: Int, day: Int, sumYear: Boolean = true, next: Boolean = false): LocalDate =
      if (sumYear && ref.getMonthValue > month) LocalDate.of(ref.getYear + 1, month, day)
      else if (!sumYear && ref.getMonthValue < month) LocalDate.of(ref.getYear - 1, month, day)
      else if (next) LocalDate.of(ref.getYear + 1, month, day)
      else LocalDate.of(ref.getYear, month, day)
  }

  /** Mount the timeline.
    *
    * @param schema     "Continuous" | "Cyclic" (case-insensitive)
    * @param start      requested range start
    * @param end        requested range end (inclusive)
    * @param unit       "day" | "month" | "year"
    * @param step       period length in `unit`s
    * @param cycleUnit  cyclic only: cycle unit ("year" | "month")
    * @param cycleStep  cyclic only: cycle length
    * @param cycleIntervals seasonal windows attached to the cycle
    * @param intervals  continuous only: seasonal windows
    */
  def mount(schema: String,
            start: LocalDate,
            end: LocalDate,
            unit: String,
            step: Int,
            cycleUnit: Option[String] = None,
            cycleStep: Int = 1,
            cycleIntervals: Option[Intervals] = None,
            intervals: Option[Intervals] = None): List[Period] = {
    require(!start.isAfter(end),
      s"""The End date "$end" must not be lower than Start Date "$start"""")

    if (schema.equalsIgnoreCase("cyclic")) {
      val cu = cycleUnit.getOrElse("year")
      decodeCyclic(start, end, unit, step, cu, cycleStep, cycleIntervals)
    } else {
      val adjustedStart = intervals match {
        case Some(iv) =>
          val (sm, sd, _, _) = iv.element(0)
          iv.resolve(start, sm, sd, sumYear = false)
        case None => start
      }
      val (cutS, cutE) =
        if (intervals.isEmpty) (Some(adjustedStart), Some(end)) else (None, None)
      decodeContinuous(adjustedStart, end, unit, step, cutS, cutE, intervals)
    }
  }

  private def firstDayOfCycle(ref: LocalDate, cycleUnit: String): LocalDate = {
    val month = if (cycleUnit == "year") 1 else ref.getMonthValue
    LocalDate.of(ref.getYear, month, 1)
  }

  private def nextStep(last: LocalDate, step: Int, unit: String,
                       intervals: Option[Intervals], next: Boolean): LocalDate =
    intervals match {
      case Some(iv) =>
        val (sm, sd, _, _) = iv.element(iv.indexOf(last) + 1)
        iv.resolve(last, sm, sd, sumYear = true, next = next)
      case None =>
        unit match {
          case "day"   => last.plusDays(step.toLong)
          case "month" => last.plusMonths(step.toLong).withDayOfMonth(1)
          case "year"  => last.plusYears(step.toLong).withDayOfYear(1)
          case u       => throw new IllegalArgumentException(s"unsupported unit: $u")
        }
    }

  private def lastDayOfPeriod(start: LocalDate, step: Int, unit: String,
                              intervals: Option[Intervals], next: Boolean = false): LocalDate =
    intervals match {
      case None => nextStep(start, step, unit, None, next = false).minusDays(1)
      case Some(iv) =>
        val (_, _, em, ed) = iv.element(iv.indexOf(start))
        iv.resolve(start, em, ed, sumYear = true, next = next)
    }

  private def decodeContinuous(start: LocalDate, end: LocalDate, unit: String, step: Int,
                               cutStart: Option[LocalDate], cutEnd: Option[LocalDate],
                               intervals: Option[Intervals],
                               fullPeriod: Boolean = true,
                               relative: Boolean = false): List[Period] = {
    val buf = scala.collection.mutable.ListBuffer.empty[Period]
    var s = start
    var e = lastDayOfPeriod(s, step, unit, intervals)
    buf += Period(s, e)

    var done = false
    while (!done) {
      s = nextStep(s, step, unit, intervals, next = relative)
      e = lastDayOfPeriod(s, step, unit, intervals)
      if (!start.isAfter(s) && !end.isBefore(e)) {
        buf += Period(s, e)
      } else if (!start.isAfter(s) && end.isBefore(e) && !s.isAfter(end)) {
        // partial trailing period: truncate unless seasonal/full-period mode
        if (intervals.isEmpty && !fullPeriod) buf += Period(s, end)
        else buf += Period(s, e)
      }
      if (e.isAfter(end)) done = true
    }

    val cut = (cutStart, cutEnd) match {
      case (Some(cs), Some(ce)) =>
        buf.toList.filter(p => !p.start.isBefore(cs) && !p.start.isAfter(ce))
      case _ => buf.toList
    }
    // empty cut falls back to the cut range itself (reference behavior: the
    // requested seasonal window becomes the period)
    (cut, cutStart, cutEnd) match {
      case (Nil, Some(cs), Some(ce)) => List(Period(cs, ce))
      case _                         => cut
    }
  }

  private def decodeCyclic(start: LocalDate, end: LocalDate, unit: String, step: Int,
                           cycleUnit: String, cycleStep: Int,
                           cycleIntervals: Option[Intervals]): List[Period] = {
    val cycles = decodeContinuous(
      firstDayOfCycle(start, cycleUnit), end, cycleUnit, cycleStep,
      None, None, cycleIntervals, relative = true)

    cycles.flatMap { cyc =>
      cycleIntervals match {
        case Some(iv) =>
          iv.specs.flatMap { spec =>
            val Array(sSpec, eSpec) = spec.split('_')
            val cutS = LocalDate.parse(s"${cyc.start.getYear}-$sSpec")
            val cutE = LocalDate.parse(s"${cyc.end.getYear}-$eSpec")
            decodeContinuous(start, end, unit, step, Some(cutS), Some(cutE),
              Some(iv), relative = true)
          }
        case None =>
          decodeContinuous(cyc.start, cyc.end, unit, step,
            Some(start), Some(end), None, fullPeriod = false)
      }
    }
  }

  /** Temporal priority ordering (SURVEY §2.4 T1 reference-day weighting;
    * reference `timeline.py:208-249`): sort dates by proximity to
    * `dayOfPeriod` counted from the first date; ties break toward the
    * earlier date.
    */
  def temporalPriority(dayOfPeriod: Int, timeline: Seq[LocalDate]): Seq[LocalDate] = {
    if (timeline.isEmpty) return Nil
    val sorted = timeline.sorted(Ordering.by((d: LocalDate) => d.toEpochDay))
    val ref = sorted.head.plusDays((dayOfPeriod - 1).toLong)
    sorted.sortBy(d => (math.abs(d.toEpochDay - ref.toEpochDay), d.toEpochDay))
  }
}
