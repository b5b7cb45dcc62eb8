package graft.operators

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // user 1: full conversion; user 2: clicks but never purchases in time;
  // user 3: click BEFORE signup only (must not count); user 4: ties —
  // click at exactly the signup instant (strictly-after excludes it),
  // then a later valid one
  private def events: DataFrame = Seq(
    (1L, 100L, "signup"), (1L, 200L, "click"), (1L, 150L, "click"), (1L, 300L, "purchase"),
    (2L, 100L, "signup"), (2L, 500L, "click"), (2L, 500000L, "purchase"),
    (3L, 400L, "signup"), (3L, 300L, "click"),
    (4L, 100L, "signup"), (4L, 100L, "click"), (4L, 900L, "click"))
    .map { case (u, t, s) => (u, ts(t), s) }
    .toDF("user_id", "ts", "event_type")

  private def run(maxGap: Option[Long] = None): Map[Long, (Option[Long], Option[Long], Option[Long])] =
    Funnel.funnel(events, col("user_id"), col("ts"), col("event_type"),
      Seq("signup", "click", "purchase"), maxGap)
      .select(col("user_id"),
        col("ts_signup").cast("long"), col("ts_click").cast("long"),
        col("ts_purchase").cast("long"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("earliest strictly-after chain, stalls carry nulls forward") {
    val out = run()
    assert(out(1L) == ((Some(100L), Some(150L), Some(300L))))
    // user 2 purchases eventually (no gap limit)
    assert(out(2L) == ((Some(100L), Some(500L), Some(500000L))))
    // user 3's click precedes signup: stalled at click, purchase null too
    assert(out(3L) == ((Some(400L), None, None)))
    // user 4: the t=100 click ties the signup timestamp — strictly-after
    // skips it; the t=900 click counts
    assert(out(4L) == ((Some(100L), Some(900L), None)))
  }

  test("per-hop max gap cuts late conversions") {
    val out = run(maxGap = Some(1000L))
    assert(out(1L) == ((Some(100L), Some(150L), Some(300L))))
    // user 2's purchase lands 499500 s after the click — outside the gap
    assert(out(2L) == ((Some(100L), Some(500L), None)))
  }

  test("users without the first step never appear") {
    val plus = events.union(Seq((9L, ts(50L), "click")).toDF("user_id", "ts", "event_type"))
    val out = Funnel.funnel(plus, col("user_id"), col("ts"), col("event_type"),
      Seq("signup", "click", "purchase"))
    assert(!out.select("user_id").as[Long].collect().contains(9L))
  }

  test("rejects duplicate steps") {
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, col("user_id"), col("ts"), col("event_type"),
        Seq("signup", "signup"))
    }
  }

  test("step names with dots resolve (quoted output columns)") {
    val dotted = Seq(
      (1L, ts(100L), "page.view"), (1L, ts(200L), "add.cart"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(dotted, col("user_id"), col("ts"), col("event_type"),
      Seq("page.view", "add.cart"), Some(1000L))
      .select(col("user_id"), col("`ts_page.view`").cast("long"),
        col("`ts_add.cart`").cast("long"))
      .as[(Long, Option[Long], Option[Long])].collect()
    assert(out.toSeq == Seq((1L, Some(100L), Some(200L))))
  }

  test("strict-after and gap compare at exact microseconds") {
    def tsUs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    // all inside ONE millisecond: signup at 100µs, clicks at 100µs (tie —
    // excluded) and 900µs (counts)
    val fine = Seq(
      (1L, tsUs(100L), "signup"), (1L, tsUs(100L), "click"), (1L, tsUs(900L), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(fine, col("user_id"), col("ts"), col("event_type"),
      Seq("signup", "click"), Some(1L))
      .select(unix_micros(col("ts_signup")), unix_micros(col("ts_click")))
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((100L, 900L)))
  }
}
