package graft
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
