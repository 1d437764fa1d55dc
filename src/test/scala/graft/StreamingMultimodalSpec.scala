package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.multimodal.Multimodal
import graft.streaming.EventStream

class StreamingMultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch plan over static input") {
    val stream = EventStream.readStream(spark, dir)
    val got = EventStream.runToMemory(
      EventStream.windowedAgg(stream, width = "1 hour"),
      "win_counts", OutputMode.Complete())

    val batch = EventStream.eventsBatch(spark, dir)
    val want = batch.groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      .select($"w.start".as("w_start"), $"event_type", $"n", $"sv")

    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("sliding windows: each event lands in width/slide windows") {
    val stream = EventStream.readStream(spark, dir)
    val got = EventStream.runToMemory(
      EventStream.windowedAgg(stream, width = "2 hours",
        slide = Some("1 hour")),
      "win_sliding", OutputMode.Complete())
    val total = EventStream.eventsBatch(spark, dir).count()
    // width/slide = 2 -> every event counted in exactly 2 windows
    assert(got.agg(sum($"n")).head().getLong(0) == 2 * total)
  }

  test("streaming dedup emits one row per key") {
    val stream = EventStream.readStream(spark, dir)
    val got = EventStream.runToMemory(
      EventStream.dedupStream(stream, Seq("user_id", "event_type")),
      "dedup_stream", OutputMode.Append())
    val want = EventStream.eventsBatch(spark, dir)
      .select($"user_id", $"event_type").distinct().count()
    assert(got.count() == want)
    assert(got.select($"user_id", $"event_type").distinct().count() == want)
  }

  test("stream-static enrichment join equals the batch join") {
    val batch = EventStream.eventsBatch(spark, dir)
    val dim = batch.groupBy($"event_type")
      .agg(avg($"value").as("type_avg"))
    val stream = EventStream.readStream(spark, dir)
    val got = EventStream.runToMemory(
      EventStream.enrich(stream, dim, "event_type")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(when($"value" > $"type_avg", 1L).otherwise(0L)).as("n_above")),
      "enrich_stream", OutputMode.Complete())
    val want = batch.join(dim, Seq("event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"value" > $"type_avg", 1L).otherwise(0L)).as("n_above"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    // the dim side broadcasts: no shuffle on the stream path
    val plan = EventStream.enrich(batch, dim, "event_type")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast:\n$plan")
  }

  test("stream-static screen equals the batch anti join, null-safe") {
    val batch = EventStream.eventsBatch(spark, dir)
    val seen = batch.filter($"event_id" % 3 === 0).select($"event_id")
    val stream = EventStream.readStream(spark, dir)
    val got = EventStream.runToMemory(
      EventStream.screenAgainst(stream, seen, Seq("event_id"))
        .groupBy($"event_type").agg(count(lit(1)).as("n")),
      "screen_stream", OutputMode.Complete())
    val want = batch.join(seen, Seq("event_id"), "left_anti")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).count() == 0)
    // null-safety: a null stream key collides with a null corpus key
    val s2 = Seq((Some(1L), "a"), (None: Option[Long], "b"), (Some(2L), "c"))
      .toDF("k", "v")
    val c2 = Seq(Some(1L), None: Option[Long]).toDF("k")
    assert(EventStream.screenAgainst(s2, c2, Seq("k"))
      .collect().map(_.getString(1)).toSeq == Seq("c"))
    // the corpus key set broadcasts; the anti join is stateless, so
    // nothing shuffles on the stream path
    val plan = EventStream.screenAgainst(batch, seen, Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"corpus keys not broadcast:\n$plan")
  }

  test("bloom screen: never under-removes, subset of the exact screen") {
    val batch = EventStream.eventsBatch(spark, dir)
    val seen = batch.filter($"event_id" % 3 === 0).select($"event_id")
    val stream = EventStream.readStream(spark, dir)
    val got = EventStream.runToMemory(
      EventStream.screenAgainstBloom(stream, seen, "event_id")
        .select($"event_id"),
      "bloom_stream", OutputMode.Append())
      .collect().map(_.getLong(0)).toSet
    val exact = batch.join(seen, Seq("event_id"), "left_anti")
      .select($"event_id").collect().map(_.getLong(0)).toSet
    // over-removal only: every survivor is genuinely unseen, and the
    // survivor set can only shrink relative to the exact screen
    assert(got.subsetOf(exact))
    assert(got.intersect(
      seen.collect().map(_.getLong(0)).toSet).isEmpty)
    // at fpp=0.01 on this cardinality the loss stays a sliver
    assert(got.size >= (exact.size * 0.9).toInt, s"${got.size}/${exact.size}")
    // plan pin: the probe is the NATIVE might_contain expression
    // (codegen'd, pushdown-transparent), not a Scala closure UDF
    val plan = EventStream.screenAgainstBloom(
        batch, seen, "event_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"native probe missing:\n$plan")
    assert(!plan.contains("UDF"), s"closure UDF on the stream path:\n$plan")
    // exact-confirm mode: Bloom decides which rows pay the join
    // probe, never the answer — row-for-row equal to the exact screen
    val confirmed = EventStream.runToMemory(
      EventStream.screenAgainstBloomExact(stream, seen, "event_id")
        .select($"event_id"),
      "bloom_exact_stream", OutputMode.Append())
      .collect().map(_.getLong(0)).toSet
    assert(confirmed == exact)
  }

  test("persisted bloom digest: append == rebuild bytes; screens match") {
    import graft.operators.BloomDigest
    val batch = EventStream.eventsBatch(spark, dir)
    val seen = batch.filter($"event_id" % 3 === 0).select($"event_id")
      .cache()
    val n = seen.count()
    val half1 = seen.filter($"event_id" % 2 === 0)
    val half2 = seen.filter($"event_id" % 2 =!= 0)
    val base = java.nio.file.Files
      .createTempDirectory("graft_bloom_digest").toString
    // full build vs half build + append, SAME capacity → a bloom bit
    // array is a union of hash positions, so the bytes are IDENTICAL
    BloomDigest.save(seen, "event_id", 0.01, s"$base/full", capacity = n)
    BloomDigest.save(half1, "event_id", 0.01, s"$base/inc", capacity = n)
    BloomDigest.append(spark, s"$base/inc", half2, "event_id")
    def bytes(p: String): Seq[Byte] = spark.read.parquet(p)
      .select($"bytes").head().getAs[Array[Byte]](0).toSeq
    assert(bytes(s"$base/full") == bytes(s"$base/inc"),
      "append != rebuild byte identity")
    // the indexed screen equals the inline digest screen row for row
    // (same bytes → same verdicts), and the exact-confirm face equals
    // the exact screen
    val inline = EventStream.screenAgainstBloom(batch, seen, "event_id")
      .select($"event_id").collect().map(_.getLong(0)).toSet
    val indexed = EventStream
      .screenAgainstBloomIndexed(batch, s"$base/inc", "event_id")
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(indexed == inline)
    val exact = batch.join(seen, Seq("event_id"), "left_anti")
      .select($"event_id").collect().map(_.getLong(0)).toSet
    val confirmed = EventStream
      .screenAgainstBloomIndexedExact(batch, seen, s"$base/inc",
        "event_id")
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(confirmed == exact)
    // overfull append fails LOUD (capacity is the fpp contract)...
    val e = intercept[IllegalStateException] {
      BloomDigest.append(spark, s"$base/inc",
        batch.select(($"event_id" + 1000000L).as("event_id")), "event_id")
    }
    assert(e.getMessage.contains("sized for"))
    // ...and a foreign table never probes as a digest
    seen.write.mode("overwrite").parquet(s"$base/foreign")
    intercept[Exception] {
      BloomDigest.loadPredicate(spark, s"$base/foreign", $"event_id")
    }
    seen.unpersist()
  }

  test("stream-stream interval join equals the batch interval join") {
    def sides(df: org.apache.spark.sql.DataFrame) = {
      val l = df.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("l_id"))
      val r = df.filter($"event_type" === "purchase")
        .select($"user_id".as("user_id"), $"ts".as("ts_r"),
          $"event_id".as("r_id"))
      (l, r)
    }
    val stream = EventStream.readStream(spark, dir)
    val (sl, sr) = sides(stream)
    val got = EventStream.runToMemory(
      EventStream.intervalJoin(sl, sr, "user_id",
        before = "30 minutes", after = "30 minutes"),
      "interval_join", OutputMode.Append())

    val batch = EventStream.eventsBatch(spark, dir)
    val (bl, br) = sides(batch)
    val want = bl.join(br,
      bl("user_id") === br("user_id") &&
        br("ts_r") >= bl("ts") - expr("INTERVAL 30 minutes") &&
        br("ts_r") <= bl("ts") + expr("INTERVAL 30 minutes"))
      .select(bl("l_id"), br("r_id"))
    val gotPairs = got.select($"l_id", $"r_id")
    assert(gotPairs.count() == want.count() && want.count() > 0)
    assert(gotPairs.exceptAll(want).count() == 0)
    assert(want.exceptAll(gotPairs).count() == 0)
  }

  test("stream-stream LEFT OUTER interval join flushes unmatched rows") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // outer results only emit once the watermark PROVES no match can
    // arrive; on finite input that needs the watermark pushed past
    // the last real event, so the source gets sentinel rows (one per
    // side's event_type filter) a year in the future, excluded from
    // the comparison by user_id < 0.
    val base = Files.createTempDirectory("graft_louter").toString
    val src = s"$base/src"; val sink = s"$base/sink"; val chk = s"$base/chk"
    Files.createDirectories(Paths.get(src))
    Files.copy(new java.io.File(s"$dir/events.parquet").toPath,
      Paths.get(s"$src/events_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val srcLayout = EventStream.probeTsLayout(spark, s"$src/events_a.parquet")
    val maxUs = EventStream.eventsRawMicros(spark, dir)
      .agg(org.apache.spark.sql.functions.max($"ts")).head().getLong(0)
    val farUs = maxUs + 365L * 24 * 3600 * 1000000L

    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("l_id")),
      df.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("ts_r"), $"event_id".as("r_id")))
    def drain(): Unit = {
      val (sl, sr) = sides(EventStream.readStream(spark, src))
      EventStream.runToParquet(
        EventStream.intervalJoin(sl, sr, "user_id",
          before = "30 minutes", after = "30 minutes",
          joinType = "leftOuter"),
        sink, chk)
    }
    // drain 1: real data only — watermark still trails it, so
    // unmatched rows stay buffered. drain 2: a far-future sentinel
    // per side raises the max seen event time (watermark updates
    // AFTER a batch, so this drain doesn't flush yet). drain 3: a
    // further sentinel runs one more batch UNDER the advanced
    // watermark — state eviction emits every buffered outer row. The
    // checkpoint carries join state and watermark across restarts.
    def sentinel(name: String, us: Long): Unit = {
      // the file source needs a FILE matching the glob, not the
      // directory a DataFrame write produces — write aside and copy
      // the part file in. Rendered in the SAME ts layout as the real
      // source file: one streaming query, one schema.
      val scratch = s"$base/scratch_$name"
      EventStream.renderTs(
          Seq((-1L, us, -1L, "click", 0.0, ""),
            (-2L, us, -1L, "purchase", 0.0, ""))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
          srcLayout)
        .select($"event_id", $"ts", $"user_id", $"event_type",
          $"value", $"props")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/$name"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    drain()
    sentinel("events_z1.parquet", farUs)
    drain()
    sentinel("events_z2.parquet", farUs + 86400L * 1000000L)
    drain()
    val got = spark.read.parquet(sink)
      .filter($"user_id" >= 0).select($"l_id", $"r_id")

    val batch = EventStream.eventsBatch(spark, dir)
    val (bl, br) = sides(batch)
    val want = bl.join(br,
        bl("user_id") === br("user_id") &&
          br("ts_r") >= bl("ts") - expr("INTERVAL 30 minutes") &&
          br("ts_r") <= bl("ts") + expr("INTERVAL 30 minutes"),
        "leftOuter")
      .select(bl("l_id"), br("r_id"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    // outer rows really are present (unmatched clicks emit with nulls)
    assert(got.filter($"r_id".isNull).count() ==
      want.filter(br("r_id").isNull).count())
    assert(got.filter($"r_id".isNull).count() > 0)
  }

  test("interval join rightOuter keeps the key on unmatched right rows") {
    // batch run of the same definition (withWatermark is a no-op on
    // batch) — pins the key-coalesce: before the fix, unmatched right
    // rows surfaced with a NULL key because only the renamed __rkey
    // was populated and it was dropped
    val batch = EventStream.eventsBatch(spark, dir)
    val l = batch.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("l_id"))
    val r = batch.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("ts_r"), $"event_id".as("r_id"))
    val got = EventStream.intervalJoin(l, r, "user_id",
      before = "30 minutes", after = "30 minutes", joinType = "rightOuter")
    val unmatched = got.filter($"l_id".isNull)
    assert(unmatched.count() > 0, "fixture has no unmatched purchases")
    assert(unmatched.filter($"user_id".isNull).count() == 0,
      "unmatched right rows lost their key")
    // full equivalence against a hand-built rightOuter interval join
    // (right key renamed to dodge self-join lineage ambiguity)
    val r2 = r.withColumnRenamed("user_id", "u_r")
    val want = l.join(r2,
        l("user_id") === r2("u_r") &&
          r2("ts_r") >= l("ts") - expr("INTERVAL 30 minutes") &&
          r2("ts_r") <= l("ts") + expr("INTERVAL 30 minutes"),
        "rightOuter")
      .select(coalesce(l("user_id"), r2("u_r")).as("user_id"),
        $"l_id", $"r_id")
    val gotKeyed = got.select($"user_id", $"l_id", $"r_id")
    assert(gotKeyed.count() == want.count())
    assert(gotKeyed.exceptAll(want).count() == 0)
    assert(want.exceptAll(gotKeyed).count() == 0)
  }

  test("interval join fullOuter keeps the key on both unmatched sides") {
    val batch = EventStream.eventsBatch(spark, dir)
    val l = batch.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("l_id"))
    val r = batch.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("ts_r"), $"event_id".as("r_id"))
    val got = EventStream.intervalJoin(l, r, "user_id",
      before = "30 minutes", after = "30 minutes", joinType = "fullOuter")
    assert(got.filter($"l_id".isNull).count() > 0)
    assert(got.filter($"r_id".isNull).count() > 0)
    assert(got.filter($"user_id".isNull).count() == 0,
      "an unmatched row lost its key")
    // row accounting: matches + unmatched-left + unmatched-right
    val matches = got.filter($"l_id".isNotNull && $"r_id".isNotNull).count()
    assert(got.count() ==
      matches + got.filter($"l_id".isNull).count() +
        got.filter($"r_id".isNull).count())
  }

  test("session windows: stream equals batch (same definition)") {
    val stream = EventStream.readStream(spark, dir)
    val got = EventStream.runToMemory(
      EventStream.sessionWindowAgg(stream, "user_id", "30 minutes"),
      "session_win", OutputMode.Complete())
    val batch = EventStream.eventsBatch(spark, dir)
    val want = EventStream.sessionWindowAgg(batch, "user_id", "30 minutes")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming CUSUM equals the batch operator under in-order input") {
    val ev = EventStream.eventsBatchNtz(spark, dir)
      .filter($"value".isNotNull)
    // stream side deliberately UNfiltered: cusumStream must skip
    // null-value events itself (nullable schema + primitive encoder
    // crashed pre-guard); batch side filters because the Window sum
    // would emit carried-cusum rows for null events the stream skips
    val got = EventStream.runToMemory(
      EventStream.cusumStream(
        EventStream.readStream(spark, dir),
        target = 50.0, slack = 5.0, h = 200.0).toDF(),
      "cusum_stream", OutputMode.Append())
    val want = graft.operators.TimeSeries.cusum(ev, Seq("user_id"),
        Seq("ts", "event_id"), "value", 50.0, 5.0, 200.0)
      .select($"user_id", $"event_id",
        $"cusum".cast("double").as("cusum"), $"alarm")
    // compare rounded (the stream folds sequentially per key, the
    // batch identity sums in window order — same order here, but
    // double addition association can differ at the last ulp)
    def r(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"event_id", round($"cusum", 6).as("c"),
        $"alarm")
    assert(want.count() == got.count() && got.count() > 0)
    assert(r(got.toDF()).exceptAll(r(want)).count() == 0)
    assert(r(want).exceptAll(r(got.toDF())).count() == 0)
    // state carries ACROSS micro-batches: replaying the same files as
    // two separate availability waves must continue, not restart —
    // covered by the exactly-once sink spec's machinery; here pin
    // that at least one alarm fired so the gate is not vacuous
    assert(got.filter($"alarm").count() > 0)
  }

  test("cusumLedger: at-least-once replay is a provable no-op at read") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_cusum_ledger").toString
    val ledger = s"$base/ledger"
    EventStream.cusumLedger(EventStream.readStream(spark, dir),
      target = 50.0, slack = 5.0, h = 200.0,
      path = ledger, checkpoint = s"$base/ckpt")
    val clean = EventStream.readCusumLedger(spark, ledger)
      .collect().toSet
    assert(clean.nonEmpty, "ledger must have rows")
    // replay-free run: the ledger (modulo batch stamps) must equal
    // the memory-sink stream output — state carried identically
    val direct = EventStream.runToMemory(
      EventStream.cusumStream(EventStream.readStream(spark, dir),
        target = 50.0, slack = 5.0, h = 200.0).toDF(),
      "cusum_ledger_direct", OutputMode.Append())
    val a = spark.read.parquet(ledger)
      .select($"user_id", $"event_id", $"cusum", $"alarm")
    assert(a.exceptAll(direct).count() == 0 &&
      direct.exceptAll(a).count() == 0,
      "ledger diverged from the replay-free stream output")
    // FORCED REPLAY: re-append one batch's rows under its original
    // batch id — the at-least-once failure mode (batch committed to
    // the sink, checkpoint commit lost, batch re-runs). Replayed rows
    // are identical by the determinism argument in the scaladoc, so
    // the raw ledger grows but the dedup read must not move.
    val raw0 = spark.read.parquet(ledger).count()
    val lastId = spark.read.parquet(ledger)
      .agg(max($"batch_id")).head().getLong(0)
    val replayRows = spark.read.parquet(ledger)
      .filter($"batch_id" === lastId)
      .select($"user_id", $"event_id", $"cusum", $"alarm")
      .as[EventStream.CusumRow]
    EventStream.appendCusumBatch(replayRows, lastId, ledger)
    assert(spark.read.parquet(ledger).count() > raw0,
      "forced replay must append raw rows")
    val afterReplay = EventStream.readCusumLedger(spark, ledger)
      .collect().toSet
    assert(afterReplay == clean,
      "dedup read must be identical before and after the replay")
  }

  test("expectStream: per-batch census ledger + quarantine hook") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import graft.operators.Expect
    val base = Files.createTempDirectory("graft_stream_exp").toString
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    val rawFile = new java.io.File(s"$dir/events.parquet").toPath
    Files.copy(rawFile, Paths.get(s"$src/a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val exps = Seq(Expect.NotNull("event_id"),
      // deliberately failing: value has a wide range
      Expect.InRange("value", 0.0, 1.0))
    var quarantined = 0L
    EventStream.expectStream(
      EventStream.readStreamGlob(spark, s"$src/*.parquet"),
      exps, s"$base/ledger", s"$base/chk",
      onViolation = b => quarantined += b.count())
    val ledger1 = spark.read.parquet(s"$base/ledger")
    assert(ledger1.count() == 2) // one batch x two constraints
    assert(ledger1.filter($"constraint" === "not_null(event_id)")
      .head().getBoolean(3))
    assert(!ledger1.filter($"constraint".startsWith("in_range"))
      .head().getBoolean(3))
    assert(quarantined > 0) // the failing batch was diverted
    // second wave appends a second census under a new batch id;
    // the first file is not re-censused (checkpointed source)
    Files.copy(rawFile, Paths.get(s"$src/b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    EventStream.expectStream(
      EventStream.readStreamGlob(spark, s"$src/*.parquet"),
      exps, s"$base/ledger", s"$base/chk")
    val ledger2 = spark.read.parquet(s"$base/ledger")
    assert(ledger2.count() == 4)
    assert(ledger2.select($"batch_id").distinct().count() == 2)
  }

  test("parquet sink + checkpoint: restart resumes exactly-once") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_stream_eo").toString
    val src = s"$base/src"; val sink = s"$base/sink"; val chk = s"$base/chk"
    Files.createDirectories(Paths.get(src))
    val rawFile = new java.io.File(s"$dir/events.parquet").toPath
    val n = EventStream.eventsBatch(spark, dir).count()

    def drain(): Unit = EventStream.runToParquet(
      EventStream.readStreamGlob(spark, s"$src/*.parquet")
        .select($"event_id", $"user_id", $"value"),
      sink, chk)

    Files.copy(rawFile, Paths.get(s"$src/a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    drain()
    assert(spark.read.parquet(sink).count() == n)
    // restart with one NEW source file: only the new file is
    // processed - the checkpoint prevents reprocessing a.parquet
    Files.copy(rawFile, Paths.get(s"$src/b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    drain()
    assert(spark.read.parquet(sink).count() == 2 * n)
    // and a restart with nothing new appends nothing
    drain()
    assert(spark.read.parquet(sink).count() == 2 * n)
  }

  test("checkpoint pins state partitions: restart ignores new setting") {
    // THE state-partition sizing trap (runToMemory's statePartitions
    // knob, EventStream.scala): a stateful query writes
    // spark.sql.shuffle.partitions into the checkpoint's offset
    // metadata at FIRST start; every restart from that checkpoint
    // reuses the checkpointed value and silently IGNORES the session
    // setting — resizing state partitions requires a new checkpoint.
    // This spec pins that outcome so the documented contract tracks
    // Spark's actual behavior.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_stream_sp").toString
    val src = s"$base/src"; val sink = s"$base/sink"; val chk = s"$base/chk"
    Files.createDirectories(Paths.get(src))
    val rawFile = new java.io.File(s"$dir/events.parquet").toPath
    def drain(): Unit = EventStream.runToParquet(
      EventStream.dedupStream(
        EventStream.readStreamGlob(spark, s"$src/*.parquet"),
        Seq("event_id")),
      sink, chk)
    def statePartitionDirs: Int = {
      // one numeric dir per state partition (plus non-numeric
      // bookkeeping entries like _metadata — excluded)
      val d = new java.io.File(s"$chk/state/0")
      if (d.exists)
        d.listFiles.count(f => f.isDirectory && f.getName.forall(_.isDigit))
      else -1
    }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      Files.copy(rawFile, Paths.get(s"$src/a.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      drain()
      assert(statePartitionDirs == 4,
        s"first start should create 4 state partitions, got $statePartitionDirs")
      // restart with a DIFFERENT session setting and new input: the
      // query runs fine but keeps the checkpointed 4 — no rescale
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      Files.copy(rawFile, Paths.get(s"$src/b.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      drain()
      assert(statePartitionDirs == 4,
        s"restart must keep the checkpointed state partitions, got $statePartitionDirs")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("stateful sessionize totals match batch aggregation") {
    val events = EventStream.eventsBatch(spark, dir)
    val sessions = EventStream.sessionize(events).collect()
      .map(s => s.userId -> ((s.nEvents, s.total))).toMap
    val want = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("t")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(sessions.keySet == want.keySet)
    want.foreach { case (u, (n, t)) =>
      assert(sessions(u)._1 == n)
      assert(math.abs(sessions(u)._2 - t) < 1e-6)
    }
  }

  test("text pipeline (quality/redact/chunk) is streaming-safe") {
    import graft.functions.{TextFunctions => TF}
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    def xform(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"lang",
        TF.qualityScore($"text").as("q"),
        TF.redactPii($"text").as("red"),
        explode(TF.chunkTokens($"text", 32, 8)).as("chunk"))
    // stateless column transforms run identically under the streaming
    // engine — the whole text-analysis family applies to streams as-is
    val stream = spark.readStream.schema(schema)
      .parquet(s"$dir/documents*.parquet")
    val got = EventStream.runToMemory(xform(stream), "text_pipe",
      OutputMode.Append())
    val want = xform(spark.read.parquet(s"$dir/documents.parquet"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("multimodal: binary schema, batched decode, deterministic features") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val media = Multimodal.fromText(docs, "doc_id", "text").cache()
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)

    val decoded = Multimodal.decodeImages(media).cache()
    assert(decoded.count() == docs.count())
    assert(decoded.filter($"width" < 1 || $"width" > 1920).count() == 0)
    // deterministic: same run twice, same values
    val again = Multimodal.decodeImages(media)
    assert(decoded.exceptAll(again).count() == 0)

    val feats = Multimodal.extractFeatures(media, dim = 16).cache()
    assert(feats.filter(size($"embedding") =!= 16).count() == 0)
    // identical payloads get identical embeddings
    val dup = Multimodal.fromText(
      docs.select($"doc_id", $"text")
        .union(docs.select($"doc_id" + 10000, $"text")), "doc_id", "text")
    val f2 = Multimodal.extractFeatures(dup, dim = 16)
    val clash = f2.select($"media_id" % 10000, $"embedding")
      .groupBy("(media_id % 10000)").agg(countDistinct($"embedding").as("n"))
      .filter($"n" > 1)
    assert(clash.count() == 0)
  }

  test("multimodal: REAL JDK decode of PNG images and WAV audio") {
    // a real 37x23 PNG with a white left half, black right half
    val img = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 37; y <- 0 until 23)
      img.setRGB(x, y, if (x < 18) 0xffffff else 0x000000)
    val pngOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngOut)
    val png = pngOut.toByteArray

    // a real 1-second 8 kHz mono WAV of silence
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](16000)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, 8000),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)
    val wav = wavOut.toByteArray

    val rows = Seq((1L, "image", png), (2L, "audio", wav),
      (3L, "image", "not an image".getBytes("UTF-8")))
    val media = rows.toDF("media_id", "kind", "content")

    // image decode: true dimensions for the PNG, fallback for garbage
    val dec = Multimodal.decodeImages(media).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(dec(1L) == ((37, 23)), s"got ${dec(1L)}")

    // content embedding: white-half vs black-half separates along
    // the grid; a real luminance vector, not a hash
    val emb = Multimodal.extractFeatures(
      media.filter($"media_id" === 1), dim = 16).head().getSeq[Float](1)
    assert(emb.length == 16)
    assert(emb.take(2).forall(_ > 0.5) && emb.slice(2, 4).forall(_ < -0.5),
      s"left of grid should be bright, right dark: $emb")

    // audio decode: exact rate/channels/duration for the WAV; the
    // png and garbage rows are dropped (not audio)
    val au = Multimodal.decodeAudio(media).collect()
    assert(au.length == 1 && au.head.getLong(0) == 2L)
    assert(au.head.getFloat(1) == 8000f && au.head.getInt(2) == 1)
    assert(math.abs(au.head.getDouble(4) - 1.0) < 1e-6)

    // REAL resize: 37x23 at maxSide 20 -> 20x12, and the re-encoded
    // payload decodes back to exactly those dimensions
    val rs = Multimodal.resizeImages(media.filter($"media_id" === 1),
      maxSide = 20).head()
    assert(rs.getInt(2) == 20 && rs.getInt(3) == 12, s"got $rs")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rs.getAs[Array[Byte]](1)))
    assert(back.getWidth == 20 && back.getHeight == 12)
    // within-bounds image passes through byte-identical
    val keep = Multimodal.resizeImages(media.filter($"media_id" === 1),
      maxSide = 100).head()
    assert(java.util.Arrays.equals(keep.getAs[Array[Byte]](1), png))
  }

  test("multimodal: frame sampling and resize metadata") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val media = Multimodal.fromText(docs, "doc_id", "text", kind = "video")
    val frames = Multimodal.sampleFrames(media, stride = 2)
    assert(frames.count() > 0)
    assert(frames.filter($"frame_no" % 2 =!= 0).count() == 0)

    val resized = Multimodal.withResizeMeta(
      Multimodal.decodeImages(media), maxSide = 256)
    assert(resized.filter($"out_width" > 256 || $"out_height" > 256)
      .count() == 0)
    assert(resized.filter($"out_width" < 1 || $"out_height" < 1).count() == 0)
  }
}
