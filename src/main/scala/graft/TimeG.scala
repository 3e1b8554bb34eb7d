package graft

/** Ad-hoc isolated-timing harness (dev tool, not a driver surface):
  * `sbt "runMain graft.TimeG <query> [query ...]"` runs the named
  * SparkEntry queries at sf0.1 with Bench's teardown between them and
  * prints one TIME line each — for attributing a single query's cost
  * without the full 250+-query loop. */
object TimeG {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "time-g")
    val dir = "/root/testdata/sf0.1"
    for (q <- args) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIME $q ${(System.nanoTime - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
