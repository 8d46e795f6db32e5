package graft.tsne

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources and sinks (ref: `Tsne.scala:138-159` — CSV COO scans — and
  * `Tsne.scala:86` — CSV embedding sink).
  *
  * The rebuild adds a parquet source for the driver's `embeddings` table
  * (`vec_id BIGINT, embedding ARRAY<FLOAT>, label INT`), which is the
  * natural modern input format: columnar, prunable, splittable at 100 TB.
  */
object IO {

  val cooSchema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  /** O3 — CSV COO scan, pass-through (precomputed sparse distance matrix,
    * ref `Tsne.scala:155-159`). Schema is declared up front so the CSV
    * reader never infers (one pass, prunable columns). */
  def readCoo(spark: SparkSession, path: String): Dataset[CooEntry] = {
    import spark.implicits._
    spark.read.schema(cooSchema).csv(path).as[CooEntry]
  }

  /** O2 — CSV COO scan → dense vectors: group by point id, scatter
    * `(j, v)` pairs into an `Array[Double]` of length `dimension`
    * (ref `Tsne.scala:138-153`, VectorBuilder per group).
    *
    * Spark-first shape: a single hash-shuffle on `i` with `collect_list`
    * (partial aggregation applies), then one codegen-friendly assembly map.
    * Missing dimensions are zero, like VectorBuilder.toDenseVector. */
  def cooToPoints(coo: Dataset[CooEntry], dimension: Int): Dataset[Point] = {
    val spark = coo.sparkSession
    import spark.implicits._
    coo.groupByKey(_.i)
      .mapGroups { (id, rows) =>
        val vec = new Array[Double](dimension)
        rows.foreach(e => vec(e.j) = e.v)
        Point(id, vec)
      }
  }

  def readInput(spark: SparkSession, path: String, dimension: Int): Dataset[Point] =
    cooToPoints(readCoo(spark, path), dimension)

  /** Parquet `embeddings` source → `(id, vec)` with the float array cast to
    * double once at the scan (so all downstream math is double, matching
    * the reference's Double-everywhere data model). */
  def readEmbeddings(spark: SparkSession, sfDir: String): Dataset[Point] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(
        col("vec_id").as("id"),
        col("embedding").cast(ArrayType(DoubleType)).as("vec"))
      .as[Point]
  }

  /** Points as a DataFrame keeping the relational columns (id, vec) —
    * convenient for Column-expression pipelines. */
  def embeddingsDf(spark: SparkSession, sfDir: String): DataFrame =
    readEmbeddings(spark, sfDir).toDF()

  /** O1 sink — final embedding `(id, y0, y1)` as CSV, overwrite mode
    * (ref `Tsne.scala:86`). */
  def writeEmbeddingCsv(embedding: Dataset[Point], path: String): Unit =
    embedding
      .select(col("id"), col("vec")(0).as("y0"), col("vec")(1).as("y1"))
      .write.mode("overwrite").csv(path)
}
