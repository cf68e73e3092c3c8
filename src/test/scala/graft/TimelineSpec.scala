package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Timeline
import graft.core.Timeline.{Intervals, Period}

/** Golden cases from the reference's `tests/test_timeline.py` plus
  * property checks (periods tile the range without overlap).
  */
class TimelineSpec extends AnyFunSuite {
  private val start2020 = LocalDate.of(2020, 1, 1)
  private val end2020 = LocalDate.of(2020, 12, 31)
  private def d(s: String) = LocalDate.parse(s)

  test("continuous monthly over 2020 = 12 calendar months") {
    val tl = Timeline.mount("Continuous", start2020, end2020, "month", 1)
    assert(tl.length == 12)
    tl.zipWithIndex.foreach { case (Period(s, e), i) =>
      assert(s == start2020.plusMonths(i.toLong))
      assert(e == start2020.plusMonths(i.toLong + 1).minusDays(1))
    }
  }

  test("continuous 16-day over 2020: 23 periods, last spills into 2021") {
    val tl = Timeline.mount("Continuous", start2020, end2020, "day", 16)
    assert(tl.length == 23)
    var ref = start2020
    tl.foreach { case Period(s, e) =>
      assert(s == ref); ref = ref.plusDays(16); assert(e == ref.minusDays(1))
    }
    assert(tl.last.end.getYear == 2021)
  }

  test("continuous 16-day starting mid-year starts exactly at start_date") {
    val s0 = d("2020-06-12")
    val tl = Timeline.mount("Continuous", s0, end2020, "day", 16)
    assert(tl.length == 13)
    assert(tl.head.start == s0)
    assert(tl.last.end.getYear == 2021)
  }

  test("cyclic yearly 16-day: truncated last period ends Dec 31") {
    val tl = Timeline.mount("Cyclic", start2020, end2020, "day", 16,
      cycleUnit = Some("year"), cycleStep = 1)
    assert(tl.length == 23)
    assert(tl.last.end == end2020)
    var ref = start2020
    tl.init.foreach { case Period(s, e) =>
      assert(s == ref); ref = ref.plusDays(16); assert(e == ref.minusDays(1))
    }
    assert(tl.last.end.toEpochDay - tl.last.start.toEpochDay < 16)
  }

  test("cyclic yearly 16-day starting mid-year snaps to cycle phase") {
    val tl = Timeline.mount("Cyclic", d("2020-06-15"), end2020, "day", 16,
      cycleUnit = Some("year"), cycleStep = 1)
    assert(tl.length == 12)
    var exp = d("2020-06-25")
    tl.init.foreach { case Period(s, e) =>
      assert(s == exp); exp = exp.plusDays(16); assert(e == exp.minusDays(1))
    }
    assert(tl.last.end == end2020)
    assert(tl.last.end.toEpochDay - tl.last.start.toEpochDay < 16)
  }

  test("cyclic yearly 3-month = 4 quarters") {
    val tl = Timeline.mount("Cyclic", start2020, end2020, "month", 3,
      cycleUnit = Some("year"), cycleStep = 1)
    assert(tl.length == 4)
    var ref = start2020
    tl.foreach { case Period(s, e) =>
      assert(s == ref); ref = ref.plusMonths(3); assert(e == ref.minusDays(1))
    }
  }

  test("cyclic with seasonal interval 08-01_10-31 over 3 years") {
    val tl = Timeline.mount("Cyclic", d("2000-01-01"), d("2002-12-31"), "month", 3,
      cycleUnit = Some("year"), cycleStep = 1,
      cycleIntervals = Some(Intervals(List("08-01_10-31"))))
    assert(tl.length == 3)
    tl.foreach { case Period(s, e) =>
      assert(s == LocalDate.of(s.getYear, 8, 1))
      assert(e == s.plusMonths(3).minusDays(1))
    }
    assert(tl.map(_.start.getYear) == List(2000, 2001, 2002))
  }

  test("continuous seasonal intervals wrap year boundaries") {
    val tl = Timeline.mount("Continuous", start2020, end2020, "month", 3,
      intervals = Some(Intervals(List(
        "12-21_03-20", "03-21_06-20", "06-21_09-21", "09-22_12-20"))))
    assert(tl.length == 5)
    assert(tl.head.start == d("2019-12-21"))
    assert(tl.last.end == d("2021-03-20"))
  }

  test("end before start throws") {
    val e = intercept[IllegalArgumentException] {
      Timeline.mount("Continuous", d("2021-09-30"), d("2020-10-15"), "month", 1)
    }
    assert(e.getMessage.contains(" must not be lower than Start Date "))
  }

  // --- temporal priority (reference test_timeline.py:204-291) ---

  test("temporal priority, day 15 of month") {
    val tl = Seq("2020-01-01", "2020-01-07", "2020-01-12", "2020-01-15",
      "2020-01-18", "2020-01-23", "2020-01-28", "2020-02-01").map(d)
    val got = Timeline.temporalPriority(15, tl)
    val exp = Seq("2020-01-15", "2020-01-12", "2020-01-18", "2020-01-07",
      "2020-01-23", "2020-01-28", "2020-01-01", "2020-02-01").map(d)
    assert(got == exp)
  }

  test("temporal priority, day 31 = descending by date") {
    val tl = Seq("2020-12-12", "2020-12-15", "2020-12-01", "2020-12-07",
      "2020-12-18", "2020-12-28", "2020-12-23", "2021-01-01").map(d)
    assert(Timeline.temporalPriority(31, tl) == tl.map(_.toEpochDay).sorted.reverse.map(LocalDate.ofEpochDay))
  }

  test("temporal priority, day 42 of a quarter") {
    val tl = Seq("2019-04-01", "2019-04-18", "2019-04-25", "2019-05-03",
      "2019-05-31", "2019-06-13").map(d)
    val exp = Seq("2019-05-03", "2019-04-25", "2019-05-31", "2019-04-18",
      "2019-06-13", "2019-04-01").map(d)
    assert(Timeline.temporalPriority(42, tl) == exp)
  }

  test("temporal priority, tie breaks toward earlier date") {
    val tl = Seq("2019-12-19", "2019-12-20", "2019-12-25", "2019-12-26").map(d)
    val exp = Seq("2019-12-20", "2019-12-19", "2019-12-25", "2019-12-26").map(d)
    assert(Timeline.temporalPriority(2, tl) == exp)
  }
}

/** Property-style checks over a seeded parameter sweep: continuous
  * timelines tile the range exactly; cyclic periods respect cycles.
  */
class TimelinePropertySpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("continuous day-step periods are contiguous, uniform, cover the range") {
    (1 to 200).foreach { _ =>
      val step = 1 + rnd.nextInt(60)
      val start = LocalDate.of(2015, 1, 1).plusDays(rnd.nextInt(3000).toLong)
      val end = start.plusDays(1 + rnd.nextInt(1200).toLong)
      val tl = Timeline.mount("Continuous", start, end, "day", step)
      assert(tl.head.start == start)
      assert(!tl.last.end.isBefore(end))
      tl.sliding(2).foreach {
        case Seq(a, b) => assert(b.start == a.end.plusDays(1))
        case _ =>
      }
      tl.foreach(p => assert(p.end.toEpochDay - p.start.toEpochDay == step - 1))
    }
  }

  test("cyclic yearly periods never cross a year boundary") {
    (1 to 200).foreach { _ =>
      val step = 1 + rnd.nextInt(45)
      val start = LocalDate.of(2018, 1, 1).plusDays(rnd.nextInt(360).toLong)
      val end = start.plusDays(30 + rnd.nextInt(1000).toLong)
      val tl = Timeline.mount("Cyclic", start, end, "day", step,
        cycleUnit = Some("year"), cycleStep = 1)
      tl.foreach { p =>
        // The reference's empty-cut fallback emits the raw requested range,
        // which may cross years; all regular periods stay inside one year.
        val isFallback = p.start == start && p.end == end
        assert(isFallback || p.start.getYear == p.end.getYear)
        assert(!p.start.isAfter(p.end))
      }
    }
  }
}
