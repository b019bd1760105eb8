package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema
  * (TESTDATA.md). Every query takes the scale-factor directory as a
  * parameter, so the same plan runs at sf0.001 → 100 TB unchanged —
  * only the number of input splits grows.
  *
  * Scale note: `spark.read.parquet` yields a columnar `FileScan` whose
  * partitioning follows `spark.sql.files.maxPartitionBytes`; filters
  * and projections from downstream operators are pushed into the scan
  * by Catalyst (visible as PushedFilters/ReadSchema in explain), so no
  * query here ever reads more bytes than it needs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which the
    * vectorized parquet reader rejects; read nanos as long and convert
    * with integer division (a double division would lose precision:
    * nanos-since-2024 ≈ 1.7e18 > 2^53). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    t(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
