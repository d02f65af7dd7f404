package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for the spec suite (sf0.001 fixtures). */
object TestSpark {
  val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = Session.builder("local[4]", "4")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
