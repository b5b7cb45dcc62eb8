package graft.streaming

import graft.TestSpark
import graft.streaming.EventStreams.{Event, Session}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed counts: batch and streaming produce identical results") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0),
      Event(4, ts(70), 2, "click", 4.0))

    val batchOut = EventStreams.windowedTypeCounts(events.toDF())
      .orderBy("window_start", "event_type")
      .select("event_type", "n", "sum_value").as[(String, Long, Double)]
      .collect().toSeq

    val stream = MemoryStream[Event]
    val q = EventStreams.windowedTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val streamOut = spark.table("win_counts")
        .orderBy("window_start", "event_type")
        .select("event_type", "n", "sum_value").as[(String, Long, Double)]
        .collect().toSeq
      assert(streamOut == batchOut)
      assert(batchOut == Seq(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("stateful sessionize closes sessions via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val sessions = EventStreams.sessionize(
      stream.toDS().withWatermark("ts", "10 minutes").as[Event],
      gapSeconds = 1800)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session A: user 1 at 00:00 and 00:10
      stream.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "view", 2.0))
      q.processAllAvailable()
      // far-future event advances the watermark beyond A's gap window…
      stream.addData(Event(3, ts(600), 1, "click", 5.0))
      q.processAllAvailable()
      // …and a second trigger lets the timeout fire
      stream.addData(Event(4, ts(610), 2, "view", 7.0))
      q.processAllAvailable()

      val got = spark.table("sessions").as[Session].collect()
      assert(got.exists(s =>
        s.user_id == 1 && s.n_events == 2 && s.sum_value == 3.0 &&
          s.session_start == ts(0) && s.session_end == ts(10)),
        s"closed session A missing from ${got.mkString(", ")}")
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.dedupStream(stream.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // duplicate id in same batch
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      stream.addData(Event(2, ts(3), 1, "view", 2.0)) // duplicate across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sessionize places a cross-batch late event in its own earlier session (batch parity)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val sessions = EventStreams.sessionize(
      stream.toDS().withWatermark("ts", "3 hours").as[Event],
      gapSeconds = 1800)
    val q = sessions.writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 1 at 02:00; batch 2 delivers a LATE event at 00:00
      // (within the 3h watermark delay) — batch semantics place it in its
      // own session, not merged into the 02:00 one
      stream.addData(Event(1, ts(120), 1, "click", 1.0))
      q.processAllAvailable()
      stream.addData(Event(2, ts(0), 1, "view", 2.0))
      q.processAllAvailable()
      // advance watermark far enough to seal both sessions, then trigger
      stream.addData(Event(3, ts(600), 2, "view", 9.0))
      q.processAllAvailable()
      stream.addData(Event(4, ts(660), 2, "view", 9.0))
      q.processAllAvailable()
      val got = spark.table("late_sessions").as[Session].collect()
        .filter(_.user_id == 1).sortBy(_.session_start.getTime)
      assert(got.length == 2, s"expected two separate sessions, got ${got.mkString(", ")}")
      assert(got(0).session_start == ts(0) && got(0).n_events == 1)
      assert(got(1).session_start == ts(120) && got(1).n_events == 1)
    } finally q.stop()
  }

  test("streaming funnel matches the batch operator under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val steps = Seq("signup", "click", "purchase")
    val out = EventStreams.funnelStream(
      stream.toDS().withWatermark("ts", "10 minutes").as[Event],
      steps, gapSeconds = 3600)
    val q = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // user 1 converts; the CLICK arrives one batch before the signup
      // (out of order) — sealing by watermark must still find the chain.
      // user 2 signs up, clicks, never purchases (stall at 2 steps).
      stream.addData(Event(1, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      stream.addData(
        Event(2, ts(5), 1, "signup", 1.0),
        Event(3, ts(30), 1, "purchase", 1.0),
        Event(4, ts(5), 2, "signup", 1.0),
        Event(5, ts(40), 2, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("funnel_out").isEmpty, "nothing seals before the watermark")
      // advance the watermark past both chains' deadlines (t0 + 2*gap =
      // 00:05 + 2h; +10min delay) and let the event-time timeout fire.
      // Must be STEP-typed events: the step filter sits below the
      // watermark node after pushdown, so other types don't advance it.
      stream.addData(Event(6, ts(300), 9, "click", 0.0))
      q.processAllAvailable()
      stream.addData(Event(7, ts(310), 9, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("funnel_out").as[EventStreams.FunnelOutcome]
        .collect().map(o => o.user_id -> o).toMap
      assert(got(1L).steps_completed == 3 && got(1L).ts_converted.contains(ts(30)))
      assert(got(1L).ts_start == ts(5))
      assert(got(2L).steps_completed == 2 && got(2L).ts_converted.isEmpty)
      assert(!got.contains(9L), "clicks without a first step emit nothing")

      // batch parity on the identical event set
      val batchDf = Seq(
        Event(1, ts(10), 1, "click", 1.0), Event(2, ts(5), 1, "signup", 1.0),
        Event(3, ts(30), 1, "purchase", 1.0), Event(4, ts(5), 2, "signup", 1.0),
        Event(5, ts(40), 2, "click", 1.0), Event(6, ts(300), 9, "click", 0.0),
        Event(7, ts(310), 9, "click", 0.0)).toDF()
      val batch = graft.operators.Funnel.funnel(batchDf, col("user_id"), col("ts"),
        col("event_type"), steps, Some(3600L))
        .select(col("user_id"), col("ts_signup"), col("ts_click"), col("ts_purchase"))
        .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Timestamp], Option[java.sql.Timestamp])]
        .collect().map(r => r._1 -> r).toMap
      assert(batch(1L)._4.contains(ts(30)) && batch(2L)._4.isEmpty && !batch.contains(9L))
      assert(batch(1L)._2.contains(got(1L).ts_start))
    } finally q.stop()
  }

  test("streaming as-of join seals by watermark and matches the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val out = EventStreams.asOfStream(
      stream.toDS().withWatermark("ts", "10 minutes").as[Event],
      leftType = "click", rightType = "view")
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // u1: click@20 arrives BEFORE the view@15 that should win for it
      stream.addData(Event(100, ts(0), 1, "view", 1.5), Event(200, ts(20), 1, "click", 0.0))
      q.processAllAvailable()
      assert(spark.table("asof_out").isEmpty,
        "click@20 must not emit while a better view can still arrive")
      stream.addData(
        Event(101, ts(15), 1, "view", 2.5),    // on-time, beats view@0
        Event(400, ts(30), 3, "view", 7.0),    // same-ts tie with the click below
        Event(500, ts(30), 3, "click", 0.0),
        Event(300, ts(25), 2, "click", 0.0))   // u2 has no view at all
      q.processAllAvailable()
      // advance the watermark past every left event, then let timeouts fire
      stream.addData(Event(900, ts(120), 9, "view", 0.0))
      q.processAllAvailable()
      stream.addData(Event(901, ts(130), 9, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_out").as[EventStreams.AsOfRow].collect()
        .map(r => r.event_id -> r).toMap
      assert(got(200L).view_id.contains(101L) && got(200L).view_value.contains(2.5),
        s"click@20 must pick the late-arriving view@15: ${got.get(200L)}")
      assert(got(500L).view_id.contains(400L), "same-timestamp view qualifies (<=)")
      assert(got(300L).view_id.isEmpty && got(300L).view_value.isEmpty)

      // batch parity on the identical event set
      val batchDf = Seq(
        Event(100, ts(0), 1, "view", 1.5), Event(200, ts(20), 1, "click", 0.0),
        Event(101, ts(15), 1, "view", 2.5), Event(400, ts(30), 3, "view", 7.0),
        Event(500, ts(30), 3, "click", 0.0), Event(300, ts(25), 2, "click", 0.0),
        Event(900, ts(120), 9, "view", 0.0), Event(901, ts(130), 9, "view", 0.0)).toDF()
      val batch = graft.operators.AsOfJoin.asOf(
        left = batchDf.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id")),
        right = batchDf.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
            col("value").as("view_value")),
        keys = Seq("user_id"), ts = "ts", leftId = "event_id",
        payload = Seq("view_id", "view_value"), tieBreak = "view_id")
        .select(col("event_id"), col("view_id"), col("view_value"))
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      got.foreach { case (id, r) =>
        assert(batch(id) == ((r.view_id, r.view_value)),
          s"stream/batch divergence for click $id: ${batch(id)} vs $r")
      }
    } finally q.stop()
  }

  test("in-session events extend rather than split (unit, via batch path)") {
    // direct check of gap semantics through the batch-equivalent SQL shape
    val df = Seq(
      Event(1, ts(0), 7, "a", 1.0), Event(2, ts(20), 7, "a", 1.0),
      Event(3, ts(60), 7, "a", 1.0)).toDF()
    // gaps: 20min (same session), 40min (new session)
    val sec = col("ts").cast("double")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = df
      .withColumn("is_new", when(lag(sec, 1).over(w).isNull || sec - lag(sec, 1).over(w) > 1800.0, 1L).otherwise(0L))
      .withColumn("sid", sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid").count()
    assert(sessions.select("count").as[Long].collect().toSeq.sorted == Seq(1L, 2L))
  }

  test("streaming interval join matches the batch bucketed operator under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // purchases at 10 and 40, each with a 30-min window; clicks at
    // 9 (before any window), 10 (edge: == start, included), 39
    // (in the first window, arrives LATE in a later micro-batch),
    // 40 (first window's exclusive end AND second's inclusive start), 75
    val all = Seq(
      Event(1, ts(10), 1, "purchase", 0.0),
      Event(2, ts(40), 1, "purchase", 0.0),
      Event(10, ts(9), 1, "click", 0.0),
      Event(11, ts(10), 1, "click", 0.0),
      Event(12, ts(39), 1, "click", 0.0),
      Event(13, ts(40), 1, "click", 0.0),
      Event(14, ts(75), 1, "click", 0.0))
    val out = EventStreams.intervalStream(
      stream.toDS(), "purchase", "click", windowSeconds = 1800)
    val q = out.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      stream.addData(all(0), all(2), all(3), all(6)) // click@39 held back
      q.processAllAvailable()
      stream.addData(all(1), all(4), all(5)) // late click@39 + purchase@40
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .select("interval_id", "point_id").as[(Long, Long)].collect().toSet
      // batch truth via the bucketed operator on identical data
      val batch = all.toDF()
      val want = graft.operators.IntervalJoin.bucketed(
        batch.filter(col("event_type") === "click")
          .select(col("event_id").as("point_id"), unix_micros(col("ts")).as("p")),
        batch.filter(col("event_type") === "purchase")
          .select(col("event_id").as("interval_id"), unix_micros(col("ts")).as("s"),
            (unix_micros(col("ts")) + 1800000000L).as("e")),
        "p", "s", "e", 1800000000L)
        .select("interval_id", "point_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"stream=$got batch=$want")
      assert(got == Set((1L, 11L), (1L, 12L), (2L, 13L)),
        "edges: start inclusive, end exclusive, adjacent windows disjoint")
    } finally q.stop()
  }

  test("attributionJoin: two-stream inner join matches the batch run under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    // user 1: click@10 → purchase@25 (in 30-min window) and purchase@50
    //   (outside); click@45 → purchase@50 (in window)
    // user 2: click@12, purchase@55 (outside its window) → no attribution
    val clickRows = Seq(
      Event(10, ts(10), 1, "click", 0.0),
      Event(11, ts(45), 1, "click", 0.0),
      Event(12, ts(12), 2, "click", 0.0))
    val purchaseRows = Seq(
      Event(20, ts(25), 1, "purchase", 0.0),
      Event(21, ts(50), 1, "purchase", 0.0),
      Event(22, ts(55), 2, "purchase", 0.0))
    val out = EventStreams.attributionJoin(
      clicks.toDF(), purchases.toDF(), windowSeconds = 1800)
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // purchases arrive BEFORE their clicks; one click arrives late
      purchases.addData(purchaseRows(0), purchaseRows(2))
      clicks.addData(clickRows(0), clickRows(2))
      q.processAllAvailable()
      purchases.addData(purchaseRows(1))
      clicks.addData(clickRows(1)) // late click@45
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      // batch truth: the same function over static frames
      val want = EventStreams.attributionJoin(
        clickRows.toDF(), purchaseRows.toDF(), windowSeconds = 1800)
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"stream=$got batch=$want")
      assert(got == Set((10L, 20L), (11L, 21L)),
        "window edges: purchase within [click, click+30min) attributes")
    } finally q.stop()
  }

  test("attributionJoin rejects a non-positive window loudly") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    intercept[IllegalArgumentException] {
      EventStreams.attributionJoin(
        clicks.toDF().toDF("event_id", "user_id", "ts"),
        clicks.toDF().toDF("event_id", "user_id", "ts"), windowSeconds = 0)
    }
  }

  test("attributionJoin left_outer: unmatched clicks emit null purchase only after the watermark seals them") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val out = EventStreams.attributionJoin(
      clicks.toDF(), purchases.toDF(), windowSeconds = 1800,
      watermarkDelay = "10 minutes", joinType = "left_outer")
    val q = out.writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").start()
    try {
      clicks.addData(Event(10, ts(10), 1, "click", 0.0))   // will stay unmatched
      clicks.addData(Event(11, ts(20), 2, "click", 0.0))   // will match
      purchases.addData(Event(20, ts(30), 2, "purchase", 0.0))
      q.processAllAvailable()
      val early = spark.table("attr_outer")
        .select("click_id", "purchase_id").as[(Long, Option[Long])].collect().toSet
      assert(early == Set((11L, Some(20L))),
        s"unmatched click must NOT emit before its window is sealed: $early")
      // advance both watermarks far past click@10's window + delay —
      // the join state for it can no longer match, so the outer row emits
      clicks.addData(Event(12, ts(600), 3, "click", 0.0))
      purchases.addData(Event(21, ts(600), 3, "purchase", 0.0))
      q.processAllAvailable()
      // one more batch: outer emission happens when the NEXT batch runs
      // after the watermark update (micro-batch watermark semantics)
      clicks.addData(Event(13, ts(660), 4, "click", 0.0))
      purchases.addData(Event(22, ts(660), 4, "purchase", 0.0))
      q.processAllAvailable()
      val late = spark.table("attr_outer")
        .select("click_id", "purchase_id").as[(Long, Option[Long])].collect().toSet
      assert(late.contains((10L, None)),
        s"sealed unmatched click must emit with null purchase: $late")
    } finally q.stop()
  }

  test("ingestDedupStream: per-batch dedup vs a growing persisted store") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = java.nio.file.Files.createTempDirectory("graft_ingest").toFile
    val storePath = new java.io.File(storeDir, "sig_store.parquet").getAbsolutePath
    val decisions = scala.collection.mutable.Map[Long, Map[Long, Option[Long]]]()
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.ingestDedupStream(
      stream.toDF().toDF("doc_id", "text"), storePath,
      (df, id) => decisions(id) = df.collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap)
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
        (3L, "some wholly different text that matches nothing anywhere else"))
      q.processAllAvailable()
      // batch 0: 1 admitted, 2 dups to 1 in-batch, 3 admitted
      assert(decisions(0L) == Map(1L -> None, 2L -> Some(1L), 3L -> None))
      val store1 = spark.read.parquet(storePath)
      assert(store1.count() == 2, "only survivors' signatures are admitted")
      stream.addData(
        (4L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1 (via store)
        (5L, "some wholly different text that matches nothing anywhere else"), // dup of 3 (via store)
        (6L, "and one more genuinely novel doc arriving in the second batch"))
      q.processAllAvailable()
      assert(decisions(1L) == Map(4L -> Some(1L), 5L -> Some(3L), 6L -> None))
      assert(spark.read.parquet(storePath).count() == 3, "store grew by batch 2's one survivor")
      // replay safety: re-running batch 2's docs against the updated store
      // (their own ids now admitted) must not mark survivors as self-dups
      val replay = graft.operators.Dedup.incrementalDedup(
        Seq((6L, "and one more genuinely novel doc arriving in the second batch"))
          .toDF("doc_id", "text"),
        spark.read.parquet(storePath), col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
      assert(replay == Map(6L -> true), "replayed survivor must not match itself")
      graft.operators.Dedup.unpersistIntermediates()
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(storeDir)
    }
  }

  test("lmScoreStream: per-batch scores equal the batch scorer against the same model") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toFile
    val modelPath = new java.io.File(dir, "lm_model.parquet").getAbsolutePath
    val lmDocs = Seq("the quick brown fox", "the quick dog").map(Tuple1(_)).toDF("text")
    graft.operators.NgramLm.bigramModel(lmDocs, col("text"))
      .write.parquet(modelPath)
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Option[Long])]]()
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.lmScoreStream(
      stream.toDF().toDF("doc_id", "text"), modelPath,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet)
    try {
      val b0 = Seq((1L, "the quick brown fox"), (2L, "zq wv"))
      val b1 = Seq((3L, "the quick"), (4L, "x"))
      stream.addData(b0: _*)
      q.processAllAvailable()
      stream.addData(b1: _*)
      q.processAllAvailable()
      def batchScores(docs: Seq[(Long, String)]) =
        graft.operators.NgramLm.scoreWith(
          spark.read.parquet(modelPath),
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(got(0L) == batchScores(b0), "batch 0 parity")
      assert(got(1L) == batchScores(b1), "batch 1 parity")
      assert(got(1L).exists { case (id, n, _) => id == 4L && n == 0L },
        "a sub-2-token doc still surfaces, with 0 pairs")
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("curation gates are stream-transparent: blocklist verdicts on a stream equal the batch run") {
    // blocklistFilter is a pure narrow projection, so the SAME operator
    // call plans on a streaming DataFrame with no streaming-specific
    // code — the shared batch/stream transform contract the windowed
    // operators spec-pin, extended to the curation tier
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val stream = MemoryStream[(Long, String)]
    val cats = Map("x" -> Seq("bad"), "y" -> Seq("word"))
    val gated = graft.operators.Corpus.blocklistFilter(
      stream.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"),
      cats, maxHitsPpm = 200000L)
    assert(gated.isStreaming, "the gate must compose onto the stream as-is")
    val q = gated.writeStream.format("memory").queryName("blocklist_gate")
      .outputMode("append").start()
    try {
      val docs = Seq((1L, "clean text"), (2L, "bad word bad word"), (3L, "one bad of five tokens"))
      stream.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("blocklist_gate")
        .select("doc_id", "hits_total", "keep")
        .as[(Long, Long, Boolean)].collect().toSet
      val batch = graft.operators.Corpus.blocklistFilter(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        cats, maxHitsPpm = 200000L)
        .select("doc_id", "hits_total", "keep")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set((1L, 0L, true), (2L, 4L, false), (3L, 1L, true)))
    } finally q.stop()
  }
}
