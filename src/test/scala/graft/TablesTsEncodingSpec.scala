package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression pin for the events.ts physical-encoding drift that broke
  * 11 driver lanes in round 5: the testdata generator switched `ts`
  * from INT64 TIMESTAMP(NANOS) to INT64 TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (= TIMESTAMP_NTZ to Spark), and both the
  * batch loader and the hand-declared streaming schemas assumed nanos.
  * This suite writes the same instants under each encoding Spark can
  * produce and asserts `Tables.events` / `EventsStream.eventsRawStream`
  * normalize every one of them to identical session-TZ TimestampType
  * values, so a future driver re-encoding fails here instead of in the
  * correctness gate. */
class TablesTsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // Three users, instants chosen so micros precision matters.
  private val rows = Seq(
    (1L, 1609459200000001L, 10L, "view", 1.5, "{}"),
    (2L, 1609459200500000L, 10L, "purchase", 2.5, "{}"),
    (3L, 1612137600123456L, 11L, "view", 3.0, "{}"))

  private def base = rows.toDF(
    "event_id", "ts_us", "user_id", "event_type", "value", "props")

  /** The driver ships events.parquet as a single FILE (not a directory);
    * the streaming source's pathGlobFilter relies on that, so stage the
    * write then move the lone part file into place. */
  private def writeDir(suffix: String)(ts: org.apache.spark.sql.Column)
      : String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory(s"graft_tsenc_$suffix").toString
    base.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = Files.list(Paths.get(s"$dir/_stage")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(s"$dir/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  // Spark cannot write parquet TIMESTAMP(NANOS); a plain INT64 column
  // exercises the same LongType branch the nanosAsLong reader produces.
  private lazy val dirLongNanos =
    writeDir("long")(col("ts_us") * 1000L)
  private lazy val dirNtzMicros =
    writeDir("ntz")(timestamp_micros(col("ts_us")).cast(TimestampNTZType))
  private lazy val dirLtzMicros =
    writeDir("ltz")(timestamp_micros(col("ts_us")))
  // Bare INT64 of OTHER epoch units — no logical type tells the reader
  // the scale, so only the magnitude disambiguation
  // (Tables.epochLongToMicros) keeps these from being misread as nanos
  // and collapsing every event to 1970 (the r5 failure mode: stream
  // lanes red with 10/0/150 rows vs oracle). Millis/seconds round the
  // fixture instants down to their unit, so expectations truncate too.
  private lazy val dirLongMicros =
    writeDir("lus")(col("ts_us"))
  private lazy val dirLongMillis =
    writeDir("lms")(expr("ts_us div 1000"))
  private lazy val dirLongSeconds =
    writeDir("lsec")(expr("ts_us div 1000000"))

  private val allDirs =
    Seq("long-nanos" -> dirLongNanos, "ntz-micros" -> dirNtzMicros,
      "ltz-micros" -> dirLtzMicros)

  private def truncUs(label: String, us: Long): Long = label match {
    case "long-millis" => us / 1000L * 1000L
    case "long-seconds" => us / 1000000L * 1000000L
    case _ => us
  }

  private val bareLongDirs =
    Seq("long-micros" -> dirLongMicros, "long-millis" -> dirLongMillis,
      "long-seconds" -> dirLongSeconds)

  // not-yet-shipped encodings a generator plausibly flips to next:
  // INT32 epoch seconds, DOUBLE fractional seconds (µs survive — a
  // double near 1.6e9 s resolves ~0.24 µs, under the 0.5 µs round
  // threshold), and an ISO-8601 string with fractional seconds
  private lazy val dirIntSeconds =
    writeDir("i32")(expr("ts_us div 1000000").cast(IntegerType))
  private lazy val dirDoubleSeconds =
    writeDir("dbl")(col("ts_us").cast(DoubleType) / 1000000.0)
  private lazy val dirIsoString =
    writeDir("str")(date_format(timestamp_micros(col("ts_us")),
      "yyyy-MM-dd HH:mm:ss.SSSSSS"))

  private val insuranceDirs =
    Seq("int-seconds" -> dirIntSeconds,
      "double-seconds" -> dirDoubleSeconds,
      "iso-string" -> dirIsoString)

  test("insurance encodings (int32/double/string) normalize exactly") {
    for ((label, dir) <- insuranceDirs) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$label: expected TimestampType, got ${ev.schema("ts").dataType}")
      val got = ev.select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val want = rows.map(r => (r._1,
        if (label == "int-seconds") r._2 / 1000000L * 1000000L else r._2))
      assert(got == want, s"$label: instants drifted: $got vs $want")
      val st = graft.streaming.EventsStream.eventsRawStream(spark, dir)
      val name = s"tsenc_${label.replace('-', '_')}"
      val q = st.select(col("event_id"), col("ts"))
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      val gotSt = spark.table(name)
        .select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(gotSt == want, s"$label: streamed instants drifted: $gotSt")
    }
  }

  test("bare INT64 ts of any epoch unit is disambiguated by magnitude") {
    for ((label, dir) <- bareLongDirs) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$label: expected TimestampType, got ${ev.schema("ts").dataType}")
      val got = ev.select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val want = rows.map(r => (r._1, truncUs(label, r._2)))
      assert(got == want, s"$label: instants drifted: $got vs $want")
      // streaming twin reads the identical instants
      val st = graft.streaming.EventsStream.eventsRawStream(spark, dir)
      val name = s"tsenc_${label.replace('-', '_')}"
      val q = st.select(col("event_id"), col("ts"))
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      val gotSt = spark.table(name)
        .select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(gotSt == want, s"$label: streamed instants drifted: $gotSt")
    }
  }

  test("batch loader normalizes every ts encoding to TimestampType") {
    for ((label, dir) <- allDirs) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$label: expected TimestampType, got ${ev.schema("ts").dataType}")
      val got = ev.select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == rows.map(r => (r._1, r._2)),
        s"$label: instants drifted: $got")
    }
  }

  test("streaming source normalizes every ts encoding identically") {
    for ((label, dir) <- allDirs) {
      val st = graft.streaming.EventsStream.eventsRawStream(spark, dir)
      assert(st.isStreaming, s"$label: expected a streaming DataFrame")
      assert(st.schema("ts").dataType == TimestampType,
        s"$label: expected TimestampType, got ${st.schema("ts").dataType}")
      val name = s"tsenc_${label.replace('-', '_')}"
      val q = st.select(col("event_id"), col("ts"))
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      val got = spark.table(name)
        .select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == rows.map(r => (r._1, r._2)),
        s"$label: streamed instants drifted: $got")
    }
  }
}
