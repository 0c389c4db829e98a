package graft.streaming

import java.time.{Instant, LocalDateTime, ZoneId, ZoneOffset}

/** Parsed 5-field cron expression: minute, hour, day-of-month, month,
  * day-of-week (0=Sunday, 7 accepted as Sunday). Supports `*`, lists
  * (`a,b`), ranges (`a-b`), steps (`*／n`, `a-b/n`) and month/day
  * names — the subset the reference schedules everything with
  * (deva/core/when.py:40 `trigger='cron', hour=9`, :141 `add_job`).
  *
  * Day-of-month vs day-of-week follows vixie-cron: when BOTH are
  * restricted a time matches if EITHER does; otherwise both must.
  */
final case class CronExpr(minutes: Set[Int], hours: Set[Int], dom: Set[Int],
    months: Set[Int], dow: Set[Int], domStar: Boolean, dowStar: Boolean) {

  def matches(t: LocalDateTime): Boolean = {
    val domOk = dom.contains(t.getDayOfMonth)
    // java.time: Mon=1..Sun=7 → cron Sun=0..Sat=6
    val dowOk = dow.contains(t.getDayOfWeek.getValue % 7)
    minutes.contains(t.getMinute) && hours.contains(t.getHour) &&
      months.contains(t.getMonthValue) &&
      (if (!domStar && !dowStar) domOk || dowOk else domOk && dowOk)
  }

  /** First fire time strictly after `after` (minute resolution).
    * Walks minutes with an impossible-expression guard (e.g. Feb 30).
    */
  def next(after: LocalDateTime): LocalDateTime = {
    var t = after.withSecond(0).withNano(0).plusMinutes(1)
    val limit = after.plusYears(5)
    while (!matches(t)) {
      // skip whole non-matching hours/days to keep the walk cheap
      t =
        if (!months.contains(t.getMonthValue))
          t.plusDays(1).withHour(0).withMinute(0)
        else if (!hours.contains(t.getHour)) t.plusHours(1).withMinute(0)
        else t.plusMinutes(1)
      if (t.isAfter(limit))
        throw new IllegalArgumentException(s"cron expression never fires (within 5 years): $this")
    }
    t
  }
}

object CronExpr {

  private val monthNames = Seq("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec").zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
  private val dowNames = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    .zipWithIndex.toMap

  def parse(s: String): CronExpr = {
    val f = s.trim.toLowerCase.split("\\s+")
    require(f.length == 5, s"cron needs 5 fields (min hour dom month dow), got '$s'")
    // `normalize` runs AFTER range expansion (not on the bounds): the
    // dow field accepts 7-as-Sunday, and folding it to 0 before
    // building "5-7" would invert the range — 5..7 must expand first,
    // then fold to {5,6,0}
    def field(spec: String, lo: Int, hi: Int, names: Map[String, Int],
        normalize: Int => Int = identity): Set[Int] = {
      def value(v: String): Int = {
        val n = names.getOrElse(v, try v.toInt catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"bad cron field value '$v' in '$s'")
        })
        require(n >= lo && n <= hi, s"cron value $v out of [$lo,$hi] in '$s'")
        n
      }
      spec.split(",").toIndexedSeq.flatMap { part =>
        val (range, step) = part.split("/") match {
          case Array(r) => (r, 1)
          case Array(r, st) => (r, st.toInt)
          case _ => throw new IllegalArgumentException(s"bad cron step in '$part'")
        }
        require(step >= 1, s"cron step must be >= 1 in '$part'")
        val (a, b) = range match {
          case "*" => (lo, hi)
          case r if r.contains("-") =>
            val Array(x, y) = r.split("-"); (value(x), value(y))
          // "5/15" = start at 5, every 15 (vixie extension)
          case r => val v = value(r); if (step == 1) (v, v) else (v, hi)
        }
        require(a <= b, s"cron range $a-$b inverted in '$s'")
        (a to b by step).map(normalize)
      }.toSet
    }
    CronExpr(
      minutes = field(f(0), 0, 59, Map.empty),
      hours = field(f(1), 0, 23, Map.empty),
      dom = field(f(2), 1, 31, Map.empty),
      months = field(f(3), 1, 12, monthNames),
      dow = field(f(4), 0, 7, dowNames, n => if (n == 7) 0 else n),
      domStar = f(2) == "*",
      dowStar = f(4) == "*")
  }

  /** deva's keyword form: `add_job(trigger='cron', hour=9)`. */
  def daily(hour: Int, minute: Int = 0): CronExpr = parse(s"$minute $hour * * *")
}

/** Durable cron-driven ticking over [[Schedule]] (deva/core/when.py:74
  * `scheduler`, :141 `add_job`): a persisted last-fire watermark plus
  * a due-tick computation turn "every day at 9am" into catch-up-exact
  * invocations of an incremental action.
  *
  * Division of labor: THIS layer decides *how many times* the action
  * should have fired and fires each missed tick exactly once per
  * watermark state; the action itself (typically [[Schedule.runOnce]]
  * or a [[graft.operators.SearchIndex.updateTick]]) is checkpointed,
  * so a tick replayed after a crash between action and watermark
  * persist is a data-level no-op. Together: exactly-once effects.
  */
object Cron {

  /** All fire instants in (after, until], oldest first. */
  def dueTicks(expr: CronExpr, after: Instant, until: Instant,
      zone: ZoneId = ZoneOffset.UTC): Seq[Instant] = {
    val out = Seq.newBuilder[Instant]
    var t = LocalDateTime.ofInstant(after, zone)
    val end = LocalDateTime.ofInstant(until, zone)
    var guard = 0
    while ({ t = expr.next(t); !t.isAfter(end) }) {
      out += t.atZone(zone).toInstant
      guard += 1
      require(guard <= 100000, s"cron catch-up > 100k ticks between $after and $until — refusing")
    }
    out.result()
  }

  /** Fire `action` once per due tick since the persisted watermark,
    * advancing the watermark AFTER each tick (a crash mid-catch-up
    * re-fires only the unfinished tick). First call with no state
    * file starts the schedule at `now` — no retroactive backfill.
    * Returns the number of ticks fired.
    */
  def runDue(stateFile: String, expr: CronExpr, now: Instant,
      zone: ZoneId = ZoneOffset.UTC)(action: Instant => Unit): Int = {
    val p = java.nio.file.Paths.get(stateFile)
    if (!java.nio.file.Files.exists(p)) {
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      persist(p, now)
      return 0
    }
    val last = Instant.parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim)
    val due = dueTicks(expr, last, now, zone)
    due.foreach { tick =>
      action(tick)
      persist(p, tick)
    }
    due.size
  }

  private def persist(p: java.nio.file.Path, t: Instant): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, t.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
