package graft

import org.apache.spark.sql.types._

/** Canonical logical schemas of the driver-generated test tables, as seen
  * through [[Tables.load]].
  *
  * The testdata can be REGENERATED between rounds with physical-schema
  * drift (r11: events.ts INT64-nanos → TIMESTAMP_NTZ micros). Every
  * operator and every oracle in the library is built against the logical
  * schemas below, so drift that `Tables.load` does not absorb must fail
  * HERE, naming the exact column and type, instead of surfacing as dozens
  * of unrelated query failures.
  */
class TablesSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def logical(name: String): Map[String, DataType] =
    Tables.load(spark, sfDir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertSchema(table: String, expected: (String, DataType)*): Unit = {
    val got = logical(table)
    assert(got.keySet === expected.map(_._1).toSet,
      s"$table column set drifted: got ${got.keySet.toSeq.sorted}")
    expected.foreach { case (c, t) =>
      assert(got(c) === t, s"$table.$c drifted: got ${got(c)}, library expects $t")
    }
  }

  test("events loads with a session-zoned timestamp whatever the physical layout") {
    assertSchema("events",
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
  }

  test("TPC-H-ish tables keep their canonical logical schemas") {
    assertSchema("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertSchema("nation", "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    assertSchema("customer", "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertSchema("supplier", "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    assertSchema("part", "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
    assertSchema("orders", "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
    assertSchema("lineitem", "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
  }

  test("document and embedding tables keep their canonical logical schemas") {
    assertSchema("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    assertSchema("embeddings", "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true), "label" -> IntegerType)
  }
}
