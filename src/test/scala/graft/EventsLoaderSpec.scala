package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.streaming.EventStream.TsLayout

/** The events `ts` layout has changed under the repo once
  * (TIMESTAMP(NANOS) → timestamp[us]); this spec pins the loader's
  * output IDENTICAL across every layout the generator could ship, so
  * the next change is absorbed instead of erring 15 queries.
  *
  * The NanosLong fixture is written as a plain int64 column — Spark
  * cannot author the TIMESTAMP(NANOS) annotation, but under
  * `spark.sql.legacy.parquet.nanosAsLong` an annotated-nanos file
  * surfaces as the SAME LongType a plain column does, so the loader
  * branch exercised is identical to the real thing. */
class EventsLoaderSpec extends SparkTestBase {
  import spark.implicits._

  private val layouts =
    Seq(TsLayout.NanosLong, TsLayout.MicrosNtz, TsLayout.MicrosTz)

  /** tiny events table, ts as epoch-micros long */
  private def microsDf = Seq(
    (1L, 1700000000000000L, 10L, "click", 1.5, "{}"),
    (2L, 1700000000500000L, 10L, "purchase", 2.5, "{}"),
    (3L, 1700003600000000L, 11L, "click", 3.5, "{}"),
    (4L, 1700007200250000L, 12L, "signup", 0.0, "{}"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  /** one temp dir per layout, each holding events.parquet in that
    * physical shape */
  private lazy val dirs: Map[TsLayout, String] = layouts.map { l =>
    val d = Files.createTempDirectory(s"graft_evt_$l").toString
    // a single FILE named events.parquet, the real testdata's shape
    // (write aside, copy the part file in)
    EventStream.renderTs(microsDf, l)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/scratch")
    val part = new java.io.File(s"$d/scratch").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$d/events.parquet"))
    l -> d
  }.toMap

  test("probeTsLayout classifies each written layout correctly") {
    assert(EventStream.probeTsLayout(spark, s"${dirs(TsLayout.NanosLong)}/events.parquet")
      == TsLayout.NanosLong)
    assert(EventStream.probeTsLayout(spark, s"${dirs(TsLayout.MicrosNtz)}/events.parquet")
      == TsLayout.MicrosNtz)
    assert(EventStream.probeTsLayout(spark, s"${dirs(TsLayout.MicrosTz)}/events.parquet")
      == TsLayout.MicrosTz)
    // the REAL testdata is classified, whatever shape it currently has
    val real = EventStream.probeTsLayout(spark,
      "/root/testdata/sf0.001/events.parquet")
    assert(layouts.contains(real))
  }

  test("eventsBatch: identical rows and TimestampType ts on every layout") {
    val got = layouts.map(l =>
      l -> EventStream.eventsBatch(spark, dirs(l)))
    got.foreach { case (l, df) =>
      assert(df.schema("ts").dataType == TimestampType, s"$l")
    }
    val collected = got.map { case (l, df) =>
      l -> df.orderBy($"event_id")
        .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
          $"event_type", $"value", $"props")
        .collect().map(_.toSeq).toSeq
    }
    val want = microsDf.orderBy($"event_id")
      .select($"event_id", $"ts".as("us"), $"user_id", $"event_type",
        $"value", $"props")
      .collect().map(_.toSeq).toSeq
    collected.foreach { case (l, rows) => assert(rows == want, s"$l") }
  }

  test("eventsBatchNtz and eventsRawMicros agree across layouts") {
    layouts.foreach { l =>
      val ntz = EventStream.eventsBatchNtz(spark, dirs(l))
      assert(ntz.schema("ts").dataType == TimestampNTZType, s"$l")
      val raw = EventStream.eventsRawMicros(spark, dirs(l))
      assert(raw.schema("ts").dataType == LongType, s"$l")
      val us = raw.orderBy($"event_id").select($"ts")
        .collect().map(_.getLong(0)).toSeq
      assert(us == microsDf.orderBy($"event_id").select($"ts")
        .collect().map(_.getLong(0)).toSeq, s"$l")
    }
  }

  test("plain int64 ts is unit-sniffed by magnitude (the r8 failure class)") {
    // whole-second instants so every unit renders losslessly
    val secsDf = Seq(
      (1L, 1700000000000000L, 10L, "click", 1.5, "{}"),
      (2L, 1700000123000000L, 10L, "purchase", 2.5, "{}"),
      (3L, 1700003600000000L, 11L, "click", 3.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val longLayouts = Seq(TsLayout.NanosLong, TsLayout.MicrosLong,
      TsLayout.MillisLong, TsLayout.SecondsLong)
    val got = longLayouts.map { l =>
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_evt_unit_$l").toString
      EventStream.renderTs(secsDf, l)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/scratch")
      val part = new java.io.File(s"$d/scratch").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$d/events.parquet"))
      // the probe re-derives the unit from magnitude alone
      assert(EventStream.probeTsLayout(spark, s"$d/events.parquet") == l)
      l -> EventStream.eventsBatch(spark, d)
        .orderBy($"event_id")
        .select($"event_id", unix_micros($"ts").as("us"))
        .collect().map(_.toSeq).toSeq
    }
    val want = secsDf.orderBy($"event_id")
      .select($"event_id", $"ts").collect().map(_.toSeq).toSeq
    got.foreach { case (l, rows) => assert(rows == want, s"$l") }
  }

  test("int64 ts below the modern-era floor fails loud, not scaled") {
    // a finer unit whose data predates ~1973 would land in a coarser
    // band and silently scale by 1000x — the probe must throw instead
    val d = java.nio.file.Files.createTempDirectory("graft_evt_low").toString
    Seq((1L, 5000000L, 10L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/scratch")
    val part = new java.io.File(s"$d/scratch").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$d/events.parquet"))
    val e = intercept[IllegalArgumentException] {
      EventStream.probeTsLayout(spark, s"$d/events.parquet")
    }
    assert(e.getMessage.contains("cannot be sniffed"))
  }

  test("int64 ts with a far-future sentinel fails loud, not rescaled") {
    // ADVICE r9: a max-only sniff would classify this micros file as
    // nanos off the single Long.MaxValue sentinel and silently rescale
    // every real timestamp 1000x; min/max band agreement throws instead
    val d = java.nio.file.Files
      .createTempDirectory("graft_evt_sentinel").toString
    Seq((1L, 1700000000000000L, 10L, "click", 1.5, "{}"),
        (2L, Long.MaxValue, 10L, "purchase", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/scratch")
    val part = new java.io.File(s"$d/scratch").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$d/events.parquet"))
    val e = intercept[IllegalArgumentException] {
      EventStream.probeTsLayout(spark, s"$d/events.parquet")
    }
    assert(e.getMessage.contains("single unit band"))
  }

  test("annotated TIMESTAMP(NANOS) classifies; conf flips only for it") {
    // Spark cannot author the NANOS annotation — write the footer
    // directly with parquet-mr (on the classpath) so the probe's
    // fallback branch runs against the real thing
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(true,
        LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType())
        .named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType())
        .named("props")
      .named("events")
    val d = java.nio.file.Files
      .createTempDirectory("graft_evt_nanosann").toString
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$d/events.parquet"))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    microsDf.orderBy($"event_id").collect().foreach { r =>
      w.write(f.newGroup()
        .append("event_id", r.getLong(0))
        .append("ts", r.getLong(1) * 1000L) // micros -> nanos
        .append("user_id", r.getLong(2))
        .append("event_type", r.getString(3))
        .append("value", r.getDouble(4))
        .append("props", r.getString(5)))
    }
    w.close()
    // probing NON-nanos layouts must leave the session conf untouched
    // (ADVICE r9: the old probe set it unconditionally); fresh paths
    // dodge the probe memo
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val mdir = java.nio.file.Files
      .createTempDirectory("graft_evt_confcheck").toString
    EventStream.renderTs(microsDf, TsLayout.MicrosNtz)
      .coalesce(1).write.mode("overwrite").parquet(s"$mdir/scratch")
    val mpart = new java.io.File(s"$mdir/scratch").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(mpart.toPath,
      java.nio.file.Paths.get(s"$mdir/events.parquet"))
    assert(EventStream.probeTsLayout(spark, s"$mdir/events.parquet")
      == TsLayout.MicrosNtz)
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .forall(_ != "true"), "probe of a non-nanos file flipped the conf")
    // the annotated file classifies as NanosLong (via the legacy-conf
    // fallback), and only THEN is the conf set — it must stay set so
    // later reads of the same file keep resolving
    assert(EventStream.probeTsLayout(spark, s"$d/events.parquet")
      == TsLayout.NanosLong)
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
      == "true")
    // the full loader reads the annotated file identically to micros
    val got = EventStream.eventsBatch(spark, d)
      .orderBy($"event_id")
      .select($"event_id", unix_micros($"ts").as("us"))
      .collect().map(_.toSeq).toSeq
    val want = microsDf.orderBy($"event_id")
      .select($"event_id", $"ts").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("readStream drains the same normalized rows on every layout") {
    val results = layouts.map { l =>
      val got = EventStream.runToMemory(
        EventStream.readStream(spark, dirs(l))
          .select($"event_id", unix_micros($"ts").as("us")),
        s"evt_loader_$l".replaceAll("[^A-Za-z0-9_]", "_"),
        OutputMode.Append())
      l -> got.orderBy($"event_id").collect().map(_.toSeq).toSeq
    }
    val want = microsDf.orderBy($"event_id")
      .select($"event_id", $"ts").collect().map(_.toSeq).toSeq
    results.foreach { case (l, rows) => assert(rows == want, s"$l") }
  }
}
