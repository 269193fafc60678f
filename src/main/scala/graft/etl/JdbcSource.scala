package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read side of the database round-trip ([[JdbcUpsert]] is the write side):
  * a PARTITIONED `spark.read.jdbc` — N executors each pull one range-slice
  * of the key space concurrently, instead of the single-connection scan the
  * plain reader does. The reference's DB reads (resume-state lookups,
  * `database_loader`) are single-cursor; this is their 100 TB shape: range
  * predicates push into the database, so each task's query is
  * `WHERE key >= lo AND key < hi` and the DB's own index does the pruning.
  *
  * Bounds discovery costs one `SELECT min(key), max(key)` on the driver —
  * bounded metadata, never row data.
  */
object JdbcSource {

  /** Reads `table` split into `numPartitions` range slices of the numeric
    * `partitionCol`. `driver` forces registration when the JDBC jar doesn't
    * self-register; `connProps` carries credentials (user/password —
    * [[GraftConfig.connProps]]) for both the bounds probe and the per-slice
    * reads (same contract as [[JdbcUpsert.upsert]]). */
  def read(spark: SparkSession, url: String, table: String,
      partitionCol: String, numPartitions: Int,
      driver: Option[String] = None,
      connProps: Properties = new Properties()): DataFrame = {
    driver.foreach(Class.forName)
    val (lo, hi) = {
      val conn = java.sql.DriverManager.getConnection(url, connProps)
      try {
        val rs = conn.createStatement().executeQuery(
          s"SELECT MIN($partitionCol), MAX($partitionCol) FROM $table")
        rs.next()
        (rs.getLong(1), rs.getLong(2))
      } finally conn.close()
    }
    val props = new Properties()
    connProps.stringPropertyNames().forEach(k =>
      props.setProperty(k, connProps.getProperty(k)))
    driver.foreach(props.setProperty("driver", _))
    // upperBound is exclusive-ish in Spark's stride math; +1 keeps the max
    // row in the last slice instead of lumping it with a boundary predicate
    spark.read.jdbc(url, table, partitionCol, lo, hi + 1,
      math.max(1, numPartitions), props)
  }
}
