package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Table loaders for the driver-generated testdata (TESTDATA.md) and the
  * reference point CSVs (/root/reference/data*.csv, schema in FIXTURES.md).
  *
  * All reads are schema-explicit parquet/CSV scans so Catalyst can prune
  * columns and push filters down to the scan (`PushedFilters` in explain).
  */
object Tables {

  /** Load one testdata table: `lineitem`, `orders`, `customer`, ...
    *
    * `events.ts` has shipped in two physical shapes across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark 4 refuses to read
    * as a timestamp, so sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * (see [[configure]]) and it arrives as nano-epoch Long — and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false, which arrives as
    * TIMESTAMP_NTZ. Both are normalized here to session-zone (UTC)
    * micro-precision TimestampType so every downstream window/session/asof
    * operator sees one type. The Long branch uses integer `div` — exactly
    * DuckDB's truncating ns→us conversion, keeping oracle parity; the NTZ
    * branch is a wall-clock reinterpretation, value-identical under the
    * UTC session zone every entrypoint pins.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        // integer `div`, NOT `/`: nano epochs exceed double's 53-bit mantissa
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else df
  }

  /** Session settings every graft entrypoint needs. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")

  val lineitem = "lineitem"
  val orders = "orders"
  val customer = "customer"
  val supplier = "supplier"
  val part = "part"
  val nation = "nation"
  val region = "region"
  val events = "events"
  val documents = "documents"
  val embeddings = "embeddings"

  /** Schema of the reference point CSVs: `dimension` int quasi-identifier
    * columns plus one preserved label column (DBSCAN.py:53, FIXTURES.md §1).
    * Header-less; `int()` cast semantics → IntegerType, non-nullable data.
    */
  def pointCsvSchema(dimension: Int): StructType =
    StructType(
      (0 until dimension).map(i => StructField(s"x$i", IntegerType)) :+
        StructField("label", IntegerType))

  /** Read a reference-style points CSV (DBSCAN.py:53: split + int cast,
    * cached by the caller when reused across a sweep).
    */
  def readPointsCsv(spark: SparkSession, path: String, dimension: Int): DataFrame =
    spark.read.schema(pointCsvSchema(dimension)).csv(path)
}
