package graft.etl

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Renders the one-row upsert statement for a target database. Implementors
  * are serializable: the dialect ships to executors inside the
  * `foreachPartition` closure. Array columns must be pre-serialized to
  * atomic types by the caller (the reference stores phones as a joined
  * string too). */
trait UpsertDialect extends Serializable {
  def upsertSql(table: String, schema: StructType, keys: Seq[String]): String

  /** Row column index feeding each `?` of [[upsertSql]], in bind order.
    * Index -1 is the NOW sentinel: the writer binds the current timestamp
    * instead of a row value (for dialects whose SQL can't evaluate
    * CURRENT_TIMESTAMP in the needed position). */
  def bindOrder(cols: Seq[String], keys: Seq[String]): Seq[Int]

  /** DB-side audit column stamped `CURRENT_TIMESTAMP` on UPDATE only (the
    * reference's `updated_at = CURRENT_TIMESTAMP`, manual_scraper.py:289;
    * inserts take the column's DDL default). Not a dataframe column. */
  def touch: Option[String] = None
}

/** The reference's own target syntax (manual_scraper.py:241-295:
  * `execute_values ... ON CONFLICT (url) DO UPDATE SET c = EXCLUDED.c`).
  * Render-only here — no Postgres server or driver jar in the sandbox; the
  * Derby dialect proves the sink end-to-end on an embedded database. */
final case class PostgresUpsertDialect(override val touch: Option[String] = None)
    extends UpsertDialect {
  def upsertSql(table: String, schema: StructType, keys: Seq[String]): String = {
    val cols = schema.fieldNames.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val sets = nonKeys.map(c => s"$c = EXCLUDED.$c") ++
      touch.map(t => s"$t = CURRENT_TIMESTAMP")
    val updates =
      if (sets.isEmpty) "DO NOTHING" else "DO UPDATE SET " + sets.mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keys.mkString(", ")}) $updates"
  }

  def bindOrder(cols: Seq[String], keys: Seq[String]): Seq[Int] = cols.indices
}

/** Derby 10.16 (on the Spark classpath) speaks `MERGE INTO` but only from a
  * base table or table function — the SYSIBM.SYSDUMMY1 one-row-source idiom
  * — and its parameters are untyped in ON/SET/VALUES positions, hence the
  * explicit CASTs. */
final case class DerbyUpsertDialect(override val touch: Option[String] = None)
    extends UpsertDialect {
  private def ddl(dt: DataType): String = dt match {
    case StringType => "VARCHAR(32672)"
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"DerbyUpsertDialect: unsupported column type $other (pre-serialize it)")
  }

  def upsertSql(table: String, schema: StructType, keys: Seq[String]): String = {
    val typeOf = schema.fields.map(f => f.name -> ddl(f.dataType)).toMap
    val cols = schema.fieldNames.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val on = keys.map(k => s"t.$k = CAST(? AS ${typeOf(k)})").mkString(" AND ")
    // Derby can't compile CURRENT_TIMESTAMP anywhere a MERGE evaluates it —
    // not in UPDATE SET, not as a subquery, not even a DDL column DEFAULT
    // reached through the INSERT branch (NPE in CurrentDatetimeOperatorNode,
    // probed on 10.16). So the stamp arrives as a bound parameter (the NOW
    // sentinel) on BOTH branches. Client clock vs server clock is a no-op
    // for embedded Derby (same JVM).
    val sets = nonKeys.map(c => s"$c = CAST(? AS ${typeOf(c)})") ++
      touch.map(t => s"$t = CAST(? AS TIMESTAMP)")
    val update =
      if (sets.isEmpty) ""
      else "WHEN MATCHED THEN UPDATE SET " + sets.mkString(", ") + " "
    val insertCols = cols ++ touch
    val insertVals = cols.map(c => s"CAST(? AS ${typeOf(c)})") ++
      touch.map(_ => "CAST(? AS TIMESTAMP)")
    val insert = s"WHEN NOT MATCHED THEN INSERT (${insertCols.mkString(", ")}) " +
      s"VALUES (${insertVals.mkString(", ")})"
    s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON ($on) $update$insert"
  }

  def bindOrder(cols: Seq[String], keys: Seq[String]): Seq[Int] = {
    val idx = cols.zipWithIndex.toMap
    keys.map(idx) ++ cols.filterNot(keys.contains).map(idx) ++
      touch.map(_ => -1) ++ cols.indices ++ touch.map(_ => -1)
  }
}

/** K4 upsert against a REAL database (reference
  * manual_scraper.py:241-295): per-partition batched JDBC MERGE via
  * `foreachPartition` — the write path a user pointing the pipeline at an
  * actual Postgres/Derby target needs, complementing the parquet-merge form
  * (`LeadPipeline.upsert*`).
  *
  * Scale shape: every partition opens ONE connection and flushes
  * `batchSize`-row batches (the JDBC analog of `execute_values`' page_size)
  * — N tasks stream in parallel, nothing is collected to the driver, and
  * per-row round-trips are amortized batchSize×. Upstream should dedup by
  * key first (J4, as the reference does): two concurrent partitions
  * upserting the SAME key otherwise race on row locks. */
object JdbcUpsert {

  private def sqlType(dt: DataType): Int = dt match {
    case StringType => java.sql.Types.VARCHAR
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case BooleanType => java.sql.Types.BOOLEAN
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case _ => java.sql.Types.OTHER
  }

  /** A batch failure worth retrying on a fresh connection: lock-conflict
    * SQLStates (40xxx — deadlock/serialization, the classic concurrent-
    * upsert casualty) and engine-internal "Java exception" wrappers (Derby
    * XJ001 — embedded Derby occasionally NPEs internally under concurrent
    * batch MERGE into one table). Walks the cause/next chain: Derby
    * surfaces the real state on a nested SQLException. Constraint/syntax
    * states stay non-transient and propagate on first failure. */
  private[graft] def isTransient(e: Throwable, depth: Int = 0): Boolean = e match {
    case _ if depth > 8 => false
    case se: java.sql.SQLException =>
      val st = Option(se.getSQLState).getOrElse("")
      // 40xxx: transaction rollback (deadlock/serialization) — retry wins.
      // 08xxx: connection exception (DB briefly unreachable) — the most
      // common real transient; always retried on a FRESH connection, and
      // safe for the same reason as 40xxx (key-addressed MERGE idempotence).
      // XJ001: Derby's internal wrapper around both.
      st.startsWith("40") || st.startsWith("08") || st == "XJ001" ||
        Option(se.getNextException).exists(isTransient(_, depth + 1)) ||
        Option(se.getCause).exists(isTransient(_, depth + 1))
    case _ => Option(e.getCause).exists(isTransient(_, depth + 1))
  }

  /** Upserts `df` into `table` keyed on `keys`. `driver` forces
    * `Class.forName` registration on the executor when the JDBC jar doesn't
    * self-register via ServiceLoader. `connProps` carries credentials
    * (user/password — [[GraftConfig.connProps]]); they ship inside the task
    * closure, never in the url.
    *
    * Failure posture (E2's in-task retry, applied to the sink): each batch
    * is retried up to `retries` times on [[isTransient]] failures, each
    * attempt on a FRESH connection — an engine-internal error can poison
    * the session it happened on, so reusing it converts one transient blip
    * into a dead partition. The retry is safe because the statement is a
    * key-addressed MERGE: re-applying a batch that partially landed
    * converges to the same rows (per-row idempotence), and the failed
    * attempt's transaction is rolled back with the connection teardown. */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
      dialect: UpsertDialect, batchSize: Int = 500,
      driver: Option[String] = None,
      connProps: java.util.Properties = new java.util.Properties(),
      retries: Int = 2): Unit = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val schema = df.schema
    val sql = dialect.upsertSql(table, schema, keys)
    val binds = dialect.bindOrder(schema.fieldNames.toSeq, keys)
    val types = schema.fields.map(f => sqlType(f.dataType))
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        driver.foreach(Class.forName)
        writePartition(rows, () => DriverManager.getConnection(url, connProps),
          sql, binds, types, batchSize, retries)
      }
    }
  }

  /** One partition's batched write loop — factored out so the retry
    * machinery is unit-testable with an injected (flaky) connection
    * factory, without a registered JDBC driver crossing sbt's main/test
    * classloader boundary. */
  private[graft] def writePartition(rows: Iterator[org.apache.spark.sql.Row],
      connect: () => Connection, sql: String, binds: Seq[Int],
      types: Array[Int], batchSize: Int, retries: Int): Unit = {
    var conn: Connection = null
    var ps: PreparedStatement = null
    def open(): Unit = {
      conn = connect()
      conn.setAutoCommit(false)
      ps = conn.prepareStatement(sql)
    }
    def close(): Unit = {
      if (ps != null) { try ps.close() catch { case _: Exception => () }; ps = null }
      if (conn != null) {
        // rolls back whatever an aborted attempt left uncommitted; a no-op
        // after a clean commit
        try conn.rollback() catch { case _: Exception => () }
        try conn.close() catch { case _: Exception => () }
        conn = null
      }
    }
    // bounded re-bind buffer (≤ batchSize rows): a failed executeBatch
    // leaves the JDBC batch in an unspecified state, so retry re-binds
    // from these rows on the fresh statement
    val buf = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](batchSize)
    def flush(): Unit = if (buf.nonEmpty) {
      var attempt = 0
      var done = false
      while (!done) {
        try {
          // (re)open lazily INSIDE the guarded try: a transiently-failing
          // connect/prepareStatement (DB briefly unreachable — the most
          // common real transient) is classified by isTransient and
          // consumes retry budget like a failed executeBatch, instead of
          // escaping the loop unretried (advice r17)
          if (conn == null) open()
          buf.foreach { row =>
            var pi = 1
            binds.foreach { ci =>
              if (ci == -1) ps.setTimestamp(pi,
                new java.sql.Timestamp(System.currentTimeMillis()))
              else if (row.isNullAt(ci)) ps.setNull(pi, types(ci))
              else ps.setObject(pi, row.get(ci))
              pi += 1
            }
            ps.addBatch()
          }
          ps.executeBatch(); conn.commit(); done = true
        } catch {
          case e: Throwable if attempt < retries && isTransient(e) =>
            attempt += 1
            close()
            Thread.sleep(50L * attempt)
        }
      }
      buf.clear()
    }
    try {
      rows.foreach { row =>
        buf += row
        if (buf.size >= batchSize) flush()
      }
      flush()
    } finally close()
  }
}
