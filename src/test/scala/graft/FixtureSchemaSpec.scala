package graft

import org.apache.spark.sql.types._

/** Pin the fixture schemas the query surface was written against.
  *
  * The driver CAN regenerate /root/testdata between rounds — round 9
  * reissued every table and silently changed events.ts from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, ntz), which broke every
  * events-based query deep inside analysis ("ts div 1000" on
  * TIMESTAMP_NTZ) while `sbt test` at HEAD stayed green until a query
  * actually ran. This spec makes fixture drift fail LOUDLY and FIRST,
  * naming the table/column, so the next regeneration costs minutes, not a
  * debugging session.
  *
  * Types are asserted post-normalization (through [[Tables]], the only
  * read path queries use): a new physical encoding that Tables absorbs —
  * the events.ts case — is correct and passes; drift the loaders DON'T
  * absorb is exactly what must fail.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts asserted at the NORMALIZED type (session-TZ timestamp) — the
    // loader's contract with every events query and oracle
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
    test(s"fixture schemas at $dir match the contract the queries assume") {
      expected.foreach { case (table, cols) =>
        val df = table match {
          case "events" => Tables.events(spark, dir)
          case t => Tables.load(spark, dir, t)
        }
        val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
        cols.foreach { case (name, dt) =>
          assert(actual.contains(name),
            s"$table at $dir lost column '$name' — fixture regenerated with " +
              s"a new shape? actual: ${df.schema.simpleString}")
          // containsNull/nullable variance is absorbed by comparing
          // element types loosely for arrays
          val ok = (actual(name), dt) match {
            case (ArrayType(a, _), ArrayType(b, _)) => a == b
            case (a, b) => a == b
          }
          assert(ok,
            s"$table.$name at $dir is ${actual(name)} but queries assume $dt " +
              "— fixture regenerated with a new encoding; extend the Tables " +
              "loader to normalize it (see Tables.events for the pattern)")
        }
      }
    }
  }
}
