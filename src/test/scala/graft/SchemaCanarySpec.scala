package graft

import org.apache.spark.sql.types._
import graft.engine.Tables

/** Schema-drift canary: the driver regenerates /root/testdata between
  * rounds and has already changed `events.ts` parquet encoding twice
  * (nanos-int64 → µs-without-timezone). Every events query reads through
  * the `Tables.events` seam, which must normalize whatever the file says
  * into a plain microsecond TimestampType. This spec fails in CI the
  * moment a regeneration produces a type the seam doesn't normalize —
  * instead of failing downstream in the driver's correctness gate.
  */
class SchemaCanarySpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).exists())

  test("events.ts normalizes to TimestampType in every sf dir") {
    assert(sfDirs.nonEmpty, "no testdata dirs found")
    sfDirs.foreach { dir =>
      val schema = Tables.events(spark, dir).schema
      assert(schema("ts").dataType == TimestampType,
        s"$dir: ts is ${schema("ts").dataType}, seam must normalize to TimestampType")
    }
  }

  test("events columns keep their expected types") {
    val expected = Map(
      "event_id" -> LongType,
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType,
      "props" -> StringType)
    sfDirs.foreach { dir =>
      val schema = Tables.events(spark, dir).schema
      expected.foreach { case (name, dt) =>
        assert(schema.fieldNames.contains(name), s"$dir: missing column $name")
        assert(schema(name).dataType == dt,
          s"$dir: $name is ${schema(name).dataType}, expected $dt")
      }
    }
  }

  test("core table schemas hold the columns the operators key on") {
    // Minimal column/type contract per table — the subset the query
    // library actually joins, filters, or aggregates on.
    val contracts: Map[String, Map[String, DataType]] = Map(
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_returnflag" -> StringType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType),
      "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType)))
    sfDirs.foreach { dir =>
      contracts.foreach { case (table, cols) =>
        val schema = Tables(spark, dir, table).schema
        cols.foreach { case (name, dt) =>
          assert(schema.fieldNames.contains(name), s"$dir/$table: missing $name")
          // simpleString comparison ignores nullability flags, which vary
          // with the writer's parquet metadata and are irrelevant here.
          assert(schema(name).dataType.simpleString == dt.simpleString,
            s"$dir/$table: $name is ${schema(name).dataType}, expected $dt")
        }
      }
    }
  }
}
