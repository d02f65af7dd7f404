package graft

/** Dev helper: print the formatted physical plan of named queries
  * (args: sfDir name...). The audit loop the build plan calls for —
  * after a query goes green, read its plan and iterate until it is the
  * plan you'd want at 100 TB. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Session.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
