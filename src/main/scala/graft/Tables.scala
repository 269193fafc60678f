package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (TESTDATA.md). All engine queries read through here so
  * path handling and any read-level options live in one place.
  *
  * Scale design: these are plain parquet scans — Catalyst handles column
  * pruning and predicate pushdown below the scan, and on a real cluster the
  * same code picks up splittable files / partitioned layouts with no change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read nanos as LONG (legacy conf) and truncate to
    * microseconds — exactly what DuckDB does on read, so oracle values align.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** A named engine query: the Spark plan plus (when SQL-expressible) the exact
  * DuckDB oracle the driver replays at sf0.01. Column names/types must agree
  * between the two — see SparkEntry's contract.
  */
final case class Q(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

/** Canonical money-sum egress, bit-identical across engines at ANY magnitude.
  *
  * A decimal sum surfaced as `CAST(dec AS DOUBLE)` is only engine-stable
  * while the unscaled value stays under 2^53: past that, Spark's single
  * correctly-rounded BigDecimal conversion and DuckDB's convert-then-divide
  * can differ by 1 ulp, and the driver's hash gate fails. Instead both
  * engines surface sums through the SAME two IEEE operations:
  *
  *   round(sum, 2) --exact--> cents BIGINT --(int64->double, /100.0)--> DOUBLE
  *
  * int64->double conversion and double division are correctly rounded in
  * both engines, so identical inputs give bit-identical outputs up to the
  * int64 cents ceiling (9.2e16 money units ~ per-group sums beyond a
  * 1000 TB TPC-H). The half-up rounding to cents agrees too: Spark's
  * round() is HALF_UP (away from zero) and DuckDB's ROUND on decimals
  * rounds halves away from zero (probed: 2.345->2.35, -2.345->-2.35).
  * Mirror of the SQL in [[MoneyOut.sql]].
  */
object MoneyOut {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{round, lit}

  /** Spark side: decimal sum -> engine-stable DOUBLE. */
  def col(c: Column): Column =
    (round(c, 2) * lit(100)).cast("bigint").cast("double") / lit(100.0)

  /** Oracle side: the same two IEEE ops spelled in DuckDB SQL. */
  def sql(e: String): String =
    s"(CAST(CAST(ROUND($e, 2) * 100 AS BIGINT) AS DOUBLE) / 100.0)"
}
