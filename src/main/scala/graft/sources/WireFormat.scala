package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The reference's wire formats and Kafka endpoints (O1–O4, O20).
  *
  * Data tuples travel as headerless CSV `"ID,Val1,...,Vald"`
  * (`java/org.main/ServiceTuple.java:82-104`); malformed rows (fewer than 2
  * fields, or any unparseable number) become null and are dropped
  * (`FlinkSkyline.java:102-104`). Triggers travel as `"QueryID,Required
  * RecordCount"`, where a missing comma means requiredCount = 0 (D5).
  *
  * Parsing is pure column expressions (`split` + `try_cast` + higher-order
  * functions), so the malformed-row drop is a codegen'd filter the optimizer
  * can push around — the Spark-native equivalent of the reference's
  * map-then-filter chain.
  */
object WireFormat {

  // Regex-guarded casts: ANSI mode (the Spark 4 default) makes a bare
  // string→number cast of a malformed token throw; the guard reproduces the
  // reference's parse-failure→null→drop semantics instead.
  private val LongPat = "^-?\\d+$"

  // Whole-row guard, equivalent to the per-field rules (id is `-?\d+`,
  // each of the ≥1 values is `-?\d+(\.\d*)?`) but evaluated as ONE regex
  // pass per line instead of one per field — the parse is the hot loop of
  // the ingest path, and the per-field variant paid ~4 regex evaluations
  // per record.
  private val RowPat = "^-?\\d+(,-?\\d+(\\.\\d*)?)+$"

  /** Parse the point wire format from a string column. Output: (id long,
    * values array<double>) with the reference's drop semantics. */
  def parsePoints(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    val w = split(col(valueCol), ",")
    raw
      .filter(col(valueCol).rlike(RowPat))
      // try_cast, not cast: a digit string longer than Long.MaxValue passes
      // the regex guard but overflows — under ANSI mode a plain cast would
      // throw (the stream-killing crash class this parse exists to prevent);
      // try_cast yields null → the row is dropped like any other malformed
      // one. Values can only overflow to ±Infinity (double), never throw.
      .select(get(w, lit(0)).try_cast("long").as("id"),
        transform(slice(w, lit(2), size(w) - 1),
          v => v.try_cast("double")).as("values"))
      .filter(col("id").isNotNull)
  }

  /** Parse the trigger wire format: payload plus its barrier
    * (requiredCount; 0 when no comma — divergence D5). */
  def parseTriggers(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    val w = split(col(valueCol), ",")
    raw.select(
      col(valueCol).as("payload"),
      coalesce(
        // try_cast: overflow-length digit strings fall through to 0 instead
        // of throwing under ANSI mode (same rule as requiredCountOf).
        when(get(w, lit(1)).rlike(LongPat), get(w, lit(1)).try_cast("long")),
        lit(0L)).as("required_count"))
  }

  /** Scala-side twin of [[parseTriggers]]' required_count rule — the ONE
    * trigger-barrier parse used by both the column path and the streaming
    * state machine: field 2 parses as a long, anything else (missing comma —
    * D5 — or a malformed number) is 0. Divergence note: the reference's
    * `Long.parseLong` crashes the whole job on a payload like "q1,abc"
    * (`java/org.main/FlinkSkyline.java:300`); the regex-guarded 0 fallback
    * extends D5's "no comma → 0" to "unparseable → 0" so one malformed
    * control message cannot kill the stream. Try, not a regex guard: a
    * digit string longer than Long.MaxValue matches `-?\d+` yet overflows
    * `toLong` — the Try catches that residual crash class too. */
  def requiredCountOf(payload: String): Long = {
    val parts = payload.split(",")
    if (parts.length > 1) scala.util.Try(parts(1).toLong).getOrElse(0L)
    else 0L
  }

  // ------------------------------------------------------------- Kafka (thin)
  // The exact reference endpoints (FlinkSkyline.java:84-97, 177-183). These
  // compile against Spark's pluggable source API; running them requires the
  // spark-sql-kafka connector jar on the cluster classpath (not shipped in
  // this offline dev image — exercised there via the memory-source tests'
  // identical downstream plan instead).

  /** O1: data topic, earliest offsets (`FlinkSkyline.java:84-89`). */
  def readPointsStream(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    parsePoints(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(value AS STRING) AS value"))

  /** O2: control topic, latest offsets (`FlinkSkyline.java:92-97`). */
  def readTriggersStream(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    parseTriggers(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "latest")
        .load()
        .selectExpr("CAST(value AS STRING) AS value"))

  /** O20: result sink with the reference's 10 MB max request size
    * (`FlinkSkyline.java:177-183`). */
  def writeResultsKafka(results: Dataset[String], bootstrap: String,
                        topic: String): DataStreamWriter[String] =
    results.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("kafka.max.request.size", "10485760")
}
