package graft

import org.apache.spark.sql.SparkSession

/** One shared SparkSession for the whole test run (forked JVM). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
