package graft

import java.nio.file.Files
import java.time.{Instant, LocalDateTime}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Cron, CronExpr, EventFlow, Triggers}

/** Cron front-end (deva when.py add_job(trigger='cron')) and the
  * condition-trigger combinator (when.py:316 EventTrigger).
  */
class CronTriggerSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  private def ldt(s: String) = LocalDateTime.parse(s)

  test("CronExpr parses ranges/steps/names and matches like cron") {
    val weekdays = CronExpr.parse("30 9 * * mon-fri")
    assert(weekdays.matches(ldt("2026-08-10T09:30"))) // Monday
    assert(!weekdays.matches(ldt("2026-08-08T09:30"))) // Saturday
    assert(!weekdays.matches(ldt("2026-08-10T09:31")))
    val everyTwo = CronExpr.parse("0 */2 * * *")
    assert(everyTwo.next(ldt("2026-08-10T01:05")) == ldt("2026-08-10T02:00"))
    assert(CronExpr.parse("0 0 * jan *").matches(ldt("2026-01-05T00:00")))
    assert(CronExpr.daily(9).matches(ldt("2026-08-10T09:00")))
    // dow 7 is Sunday, like 0 — including as a RANGE BOUND ("5-7"
    // must expand before folding 7→0, not become the inverted 5-0)
    assert(CronExpr.parse("0 0 * * 7").matches(ldt("2026-08-09T00:00")))
    val weekend = CronExpr.parse("0 0 * * 5-7")
    assert(weekend.matches(ldt("2026-08-07T00:00"))) // Friday
    assert(weekend.matches(ldt("2026-08-09T00:00"))) // Sunday
    assert(!weekend.matches(ldt("2026-08-10T00:00"))) // Monday
    intercept[IllegalArgumentException](CronExpr.parse("0 0 * *"))
    intercept[IllegalArgumentException](CronExpr.parse("61 0 * * *"))
  }

  test("vixie dom/dow OR rule; impossible expressions fail loudly") {
    // both restricted → fires on the 13th AND on every Friday
    val e = CronExpr.parse("0 0 13 * fri")
    assert(e.matches(ldt("2026-08-13T00:00"))) // a Thursday, but dom=13
    assert(e.matches(ldt("2026-08-07T00:00"))) // a Friday, dom=7
    assert(!e.matches(ldt("2026-08-08T00:00"))) // Saturday the 8th
    intercept[IllegalArgumentException](
      CronExpr.parse("0 0 30 2 *").next(ldt("2026-01-01T00:00")))
  }

  test("runDue catches up missed ticks exactly once; idle tick is a no-op") {
    val state = Files.createTempDirectory("graft_cron").toString + "/job.last"
    val hourly = CronExpr.parse("0 * * * *")
    var fired = Vector.empty[Instant]
    // first call initializes the watermark — no retroactive backfill
    assert(Cron.runDue(state, hourly, Instant.parse("2026-08-10T09:30:00Z")) { t => fired :+= t } == 0)
    assert(fired.isEmpty)
    // three hours pass unobserved → exactly the 3 missed ticks fire, in order
    assert(Cron.runDue(state, hourly, Instant.parse("2026-08-10T12:30:00Z")) { t => fired :+= t } == 3)
    assert(fired.map(_.toString) == Vector(
      "2026-08-10T10:00:00Z", "2026-08-10T11:00:00Z", "2026-08-10T12:00:00Z"))
    // idle: no tick due yet
    assert(Cron.runDue(state, hourly, Instant.parse("2026-08-10T12:45:00Z")) { t => fired :+= t } == 0)
    assert(fired.size == 3)
  }

  test("runDue crash mid-catch-up refires only the unfinished tick") {
    val state = Files.createTempDirectory("graft_cron2").toString + "/job.last"
    val hourly = CronExpr.parse("0 * * * *")
    Cron.runDue(state, hourly, Instant.parse("2026-08-10T09:00:30Z"))(_ => ())
    var fired = Vector.empty[Instant]
    // the action dies on the second due tick — the first tick's
    // watermark advance must survive
    intercept[RuntimeException](
      Cron.runDue(state, hourly, Instant.parse("2026-08-10T12:30:00Z")) { t =>
        if (fired.size == 1) throw new RuntimeException("crash")
        fired :+= t
      })
    assert(fired.map(_.toString) == Vector("2026-08-10T10:00:00Z"))
    // retry: tick 10:00 does NOT refire; 11:00 and 12:00 complete
    assert(Cron.runDue(state, hourly, Instant.parse("2026-08-10T12:30:00Z")) { t => fired :+= t } == 2)
    assert(fired.map(_.toString) == Vector(
      "2026-08-10T10:00:00Z", "2026-08-10T11:00:00Z", "2026-08-10T12:00:00Z"))
  }

  test("Triggers.when(cond).thenRun fires once per matching micro-batch, never on misses") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_trig").toString
    val src = s"$base/src"; val ckpt = s"$base/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = Seq((1L, 1.0)).toDF("id", "value").schema
    var fires = Vector.empty[(Long, Long)] // (batchId, matching rows)
    def runOnce(): Unit = {
      val q = Triggers.when(EventFlow.fromParquet(spark, src, schema), col("value") >= 10)
        .thenRun(ckpt) { (hits, id) => fires :+= (id, hits.count()) }
      q.awaitTermination()
    }
    // batch 1: no matching rows → no fire
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "value").write.mode("append").parquet(src)
    runOnce()
    assert(fires.isEmpty, "condition not met — must not fire")
    // batch 2: two matching rows → exactly one fire with exactly those
    Seq((3L, 15.0), (4L, 3.0), (5L, 30.0)).toDF("id", "value").write.mode("append").parquet(src)
    runOnce()
    assert(fires.map(_._2) == Vector(2L), s"one fire with 2 hits, got $fires")
    // re-run with nothing new: checkpoint dedupes — still one fire
    runOnce()
    assert(fires.size == 1)
  }
}
