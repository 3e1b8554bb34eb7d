package graft

import java.nio.file.{Files, Paths}

/** Per-query `explain("formatted")` dumps for the optimization-round
  * evidence files (`plans/rN/<query>_<suffix>.txt`): unlike
  * [[Plans]] (one markdown for the whole registry) this writes one
  * file per named query so before/after pairs diff cleanly.
  *
  * Usage: `runMain graft.PlansFor <outDir> <suffix> <query> [query...]`
  * with `SPARK_GRAFT_SF_DIR` selecting the data (defaults to sf0.1 —
  * the scale the bench measures, so plan shapes match the claims). */
object PlansFor {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlansFor <outDir> <suffix> <query>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(4), "graft-plansfor")
    names.foreach { name =>
      val plan =
        try {
          val bos = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(bos)) {
            SparkEntry.queries(name)(spark, sfDir).explain("formatted")
          }
          bos.toString
        } catch { case e: Throwable => s"(failed to plan: ${e.getMessage})" }
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plansfor] $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
