package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins.
  *
  * At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle.
  * Writing both tables bucketed (and sorted) by the join key fixes their
  * partitioning *on disk*: Spark's scan reports the bucket layout as the
  * output partitioning, EnsureRequirements sees the join's distribution
  * requirement already satisfied, and the sort-merge join runs with **no
  * Exchange and no Sort on either side** — every bucket pair joins
  * map-side. The write costs one shuffle once; every subsequent join of
  * the two tables on that key is exchange-free.
  *
  * `BucketingSpec` pins the plan shape: bucketed join → zero exchanges.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table registered
    * in the session catalog. Joins between tables bucketed with the same
    * `buckets` count on the same key are co-located.
    *
    * Idempotent across sessions: a managed-table location left behind by a
    * previous session (whose in-memory catalog is gone) would make
    * `saveAsTable` fail with LOCATION_ALREADY_EXISTS — drop the catalog
    * entry AND the orphaned location first. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the orphaned location must be removed through the warehouse's OWN
    // filesystem (it may be HDFS/S3, not the driver's local disk), at the
    // catalog's casing (managed-table identifiers are stored lowercased)
    val location = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = location.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(location)) fs.delete(location, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Co-located equi-join of two tables previously written with
    * [[writeBucketed]] on `key` with equal bucket counts. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
