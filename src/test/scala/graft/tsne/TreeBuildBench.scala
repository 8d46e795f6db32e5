package graft.tsne

import org.apache.spark.sql.SparkSession

/** One-off measurement for the SCALE.md driver-vs-executor quadtree-build
  * crossover (the `distTreeMinPoints` threshold):
  * `sbt 'Test/runMain graft.tsne.TreeBuildBench'` */
object TreeBuildBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("tree-build-bench")
      .master("local[*]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try for (n <- Seq(100_000, 500_000, 2_000_000)) {
      val rdd = spark.sparkContext.parallelize(0 until 32, 32).flatMap { p =>
        val rng = new scala.util.Random(1234L + p)
        Iterator.fill(n / 32)((rng.nextGaussian() * 30, rng.nextGaussian() * 30))
      }.cache()
      rdd.count()
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      // driver path: collect (what the superstep already pays) + build
      val (arr, tCollect) = time(rdd.map { case (x, y) => Array(x, y) }.collect())
      val (dt, tDriver) = time(BhTree.build(arr.toIndexedSeq))
      val (rt, tRdd) = time(BhTree.buildRdd(rdd))
      require(dt.size == rt.size && dt.size == n / 32 * 32)
      println(f"TREEBENCH n=$n driver_build=$tDriver%.2f (collect=$tCollect%.2f) rdd_build=$tRdd%.2f")
      rdd.unpersist()
    } finally spark.stop()
  }
}
