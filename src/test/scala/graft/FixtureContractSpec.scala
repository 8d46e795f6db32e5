package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.types._

import graft.tsne.SparkTestBase

/** Pins the driver-fixture schema contract every query assumes, at all
  * three scale factors. The fixture generator has changed encodings
  * mid-build three times (events.ts: TIMESTAMP(NANOS) → timestamp[us]
  * adjusted-to-UTC → timestamp[us] naive/NTZ), and each flip broke queries
  * one round LATE — this spec makes any regeneration drift fail the suite
  * the same round it ships.
  *
  * Columns with a single pinned type are ones the queries read raw (a
  * type flip would silently change oracle hashes, e.g. the r6 sf1eq
  * BIGINT-vs-DOUBLE l_quantity mismatch). Timestamp columns accept the
  * encodings the code actually handles: `events.ts` anything
  * `Events.normalizeTs` normalizes, date-like columns either timestamp
  * flavor (only consumed via `year(...)`, identical under the pinned UTC
  * session timezone).
  */
class FixtureContractSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val anyTimestamp: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val normalizableTs: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  // table -> (column -> accepted types)
  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> anyTimestamp, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> anyTimestamp),
    "documents" -> Seq(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set(LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType)),
    "events" -> Seq(
      "event_id" -> Set(LongType), "ts" -> normalizableTs,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)))

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    s"driver fixture $sf" should "match the schema contract the queries assume" in {
      val s = spark
      // events may need the nanos escape hatch to be readable at all
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      try contract.foreach { case (table, cols) =>
        val schema = s.read.parquet(s"/root/testdata/$sf/$table.parquet").schema
        cols.foreach { case (name, accepted) =>
          withClue(s"$table.$name @ $sf (contract drift — fix the reading " +
            "seam THIS round, not next): ") {
            accepted should contain(schema(name).dataType)
          }
        }
      } finally s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  "events normalization" should "yield TimestampType at every scale factor" in {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"))
      withClue(s"readEvents @ $sf: ") {
        streaming.Events.readEvents(spark, s"/root/testdata/$sf")
          .schema("ts").dataType shouldBe TimestampType
      }
  }
}
