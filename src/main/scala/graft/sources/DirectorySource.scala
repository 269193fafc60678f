package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's discovery crawl as a
  * TABLE (SURVEY §2.1 S4/S5, §4): the business directory is a deterministic
  * function of the listing id, and the site's advanced-search form — rubro /
  * localidad dropdowns and the "Tiene Mail" checkbox, which filter
  * SERVER-side before anything is fetched
  * (reference src/extractors/sequential_collector.py:243-412) — becomes
  * `SupportsPushDownFilters`: equality predicates on rubro/localidad/
  * has_email are consumed by the scan and never materialize a row, id-range
  * predicates narrow the generated range itself (partition pruning), and
  * `SupportsPushDownRequiredColumns` prunes generation to the projected
  * columns. The id range splits into fixed-size chunks — the reference's
  * worker chunking (S2, bulk_collector.py:46-58) as `InputPartition`s.
  *
  * At 100 TB the same shape holds: a scan that accepts its filters serves
  * them before I/O, so the worklist never exists unpruned anywhere.
  */
class DirectorySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DirectorySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new DirectoryTable
}

object DirectorySource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("nombre", StringType, nullable = false),
    StructField("rubro", StringType, nullable = false),
    StructField("localidad", StringType, nullable = false),
    StructField("has_email", BooleanType, nullable = false),
    StructField("url", StringType, nullable = false)))

  val rubros: IndexedSeq[String] = Vector("Comercio", "Salud", "Gastronomia",
    "Construccion", "Educacion", "Transporte", "Agro", "Servicios")
  val localidades: IndexedSeq[String] = Vector("Santa Fe", "Rosario",
    "Rafaela", "Venado Tuerto", "Reconquista", "Esperanza")

  // floorMod: a wrap-around negative product (id > Long.MaxValue/13) must
  // index deterministically, never throw IndexOutOfBounds from a signed %
  def rubroOf(id: Long): String =
    rubros(java.lang.Math.floorMod(id * 7, 8L).toInt)
  def localidadOf(id: Long): String =
    localidades(java.lang.Math.floorMod(id * 13, 6L).toInt)
  def hasEmailOf(id: Long): Boolean = id % 3 == 0

  def valueOf(field: String, id: Long): Any = field match {
    case "id" => id
    case "nombre" => UTF8String.fromString(s"Negocio $id")
    case "rubro" => UTF8String.fromString(rubroOf(id))
    case "localidad" => UTF8String.fromString(localidadOf(id))
    case "has_email" => hasEmailOf(id)
    case "url" => UTF8String.fromString(
      s"https://directory.example/detail?id=$id")
  }

  // constant-string values pre-encoded ONCE (a scan must not re-encode the
  // same 14 UTF8Strings per row)
  private val rubroU8: Array[UTF8String] =
    rubros.map(UTF8String.fromString).toArray
  private val localidadU8: Array[UTF8String] =
    localidades.map(UTF8String.fromString).toArray

  /** Field generator resolved ONCE per reader — the per-row path does no
    * string matching and no constant re-encoding (same values as
    * [[valueOf]], which stays the readable law). */
  private[sources] def generator(field: String): Long => Any = field match {
    case "id" => (i: Long) => i
    case "nombre" => (i: Long) => UTF8String.fromString(s"Negocio $i")
    case "rubro" => (i: Long) => rubroU8(java.lang.Math.floorMod(i * 7, 8L).toInt)
    case "localidad" => (i: Long) => localidadU8(java.lang.Math.floorMod(i * 13, 6L).toInt)
    case "has_email" => (i: Long) => hasEmailOf(i)
    case "url" => (i: Long) =>
      UTF8String.fromString(s"https://directory.example/detail?id=$i")
  }
}

private class DirectoryTable extends Table with SupportsRead {
  override def name(): String = "guia_directory"
  override def schema(): StructType = DirectorySource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val start = options.getLong("start_id", 1L)
    val end = options.getLong("end_id", 5000L)
    val chunk = options.getLong("chunk_size", 1000L)
    // loud option contract: chunk_size <= 0 would either crash the Range
    // constructor (0) or return a silently EMPTY scan (negative); a
    // negative start breaks the overflow-safe chunking arithmetic
    require(chunk > 0, s"chunk_size must be positive, got $chunk")
    require(start >= 0, s"start_id must be non-negative, got $start")
    new DirectoryScanBuilder(start, end, chunk)
  }
}

private class DirectoryScanBuilder(var startId: Long, var endId: Long,
    chunkSize: Long) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = DirectorySource.schema
  private var accepted: Array[Filter] = Array.empty

  private def longOf(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

  /** The "search form" contract: equality on rubro/localidad/has_email is
    * served during generation; comparisons on id narrow the range itself.
    * Everything else stays a residual for Spark to evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case EqualTo(a, _) if a == "rubro" || a == "localidad" || a == "has_email" =>
        false
      case f @ (_: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
                _: LessThan | _: LessThanOrEqual) =>
        val consumed = f match {
          case EqualTo("id", v) => longOf(v).map(l => { startId = startId.max(l); endId = endId.min(l) })
          // strict bounds at the Long extremes are UNSATISFIABLE, not a
          // wrapping l±1: GreaterThan(MaxValue) would compute MinValue and
          // the consumed filter would then be enforced NOWHERE — a silent
          // wrong result (the scan keeps the filter, Spark gets no residual)
          case GreaterThan("id", v) => longOf(v).map(l =>
            if (l == Long.MaxValue) { startId = 1L; endId = 0L }
            else startId = startId.max(l + 1))
          case GreaterThanOrEqual("id", v) => longOf(v).map(l => startId = startId.max(l))
          case LessThan("id", v) => longOf(v).map(l =>
            if (l == Long.MinValue) { startId = 1L; endId = 0L }
            else endId = endId.min(l - 1))
          case LessThanOrEqual("id", v) => longOf(v).map(l => endId = endId.min(l))
          case _ => None
        }
        consumed.isEmpty
      case _ => true
    }
    accepted = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new DirectoryScan(startId, endId, chunkSize, required, accepted)
}

private class DirectoryScan(startId: Long, endId: Long, chunkSize: Long,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GuiaDirectory[$startId..$endId] " +
      s"ReadSchema: ${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    if (endId < startId) Array.empty
    else (startId to endId by chunkSize)
      // overflow-safe hi: lo + chunkSize - 1 can wrap negative when endId
      // sits near Long.MaxValue; the subtraction form never overflows
      // (0 <= lo <= endId by the builder's start_id >= 0 contract)
      .map(lo => IdChunk(lo,
        if (endId - lo >= chunkSize) lo + chunkSize - 1 else endId): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DirectoryReaderFactory(required.fieldNames, pushed)
}

private case class IdChunk(lo: Long, hi: Long) extends InputPartition

private class DirectoryReaderFactory(fields: Array[String],
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val chunk = p.asInstanceOf[IdChunk]
    new PartitionReader[InternalRow] {
      private var id = chunk.lo - 1
      // per-field generators resolved ONCE per reader: the old per-row
      // fromSeq over a fresh string-matched IndexedSeq re-encoded the same
      // constant strings on every row — pure per-row garbage at scale
      private val gens: Array[Long => Any] =
        fields.map(DirectorySource.generator)

      private def matches(i: Long): Boolean = pushed.forall {
        case EqualTo("rubro", v) => DirectorySource.rubroOf(i) == v
        case EqualTo("localidad", v) => DirectorySource.localidadOf(i) == v
        case EqualTo("has_email", v: Boolean) => DirectorySource.hasEmailOf(i) == v
        case _ => true // id-range filters are already baked into the bounds
      }

      override def next(): Boolean = {
        id += 1
        while (id <= chunk.hi && !matches(id)) id += 1
        id <= chunk.hi
      }
      override def get(): InternalRow = {
        val vals = new Array[Any](gens.length)
        var i = 0
        while (i < gens.length) { vals(i) = gens(i)(id); i += 1 }
        InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
      override def close(): Unit = ()
    }
  }
}
