package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in graft.queries.* modules as [[Q]] values; this object
  * just assembles the registry the driver consumes.
  */
object SparkEntry {

  /** Full inventory: name → query (Spark plan + optional DuckDB oracle). */
  def registry: Map[String, Q] = {
    val modules = Seq(
      graft.queries.Relational.qs,
      graft.queries.Functions.qs,
      graft.queries.Events.qs,
      graft.queries.TextOps.qs,
      graft.queries.Vectors.qs,
      graft.queries.Mining.qs,
      graft.queries.EtlOps.qs,
      graft.streaming.StreamOps.qs,
      graft.multimodal.MultimodalOps.qs)
    val all = modules.reduce(_ ++ _)
    // a duplicate name across modules would silently last-win and one query
    // would VANISH from the suite (no Verify row, no bench row, no driver
    // anomaly) — fail fast instead, naming the collision
    require(all.size == modules.map(_.size).sum, {
      val dups = modules.flatMap(_.keys)
        .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
      s"duplicate query names across modules: ${dups.mkString(", ")}"
    })
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q01_pricing_summary").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql), _)) => name -> sql.stripMargin.trim }
}
