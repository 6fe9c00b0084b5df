package graft

import org.apache.spark.sql.SparkSession

/** Plan audit helper: print the formatted physical plan of one (or all)
  * SparkEntry queries. Usage:
  *   sbt "runMain graft.ExplainQuery <queryName|all> [sfDir]"
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "all"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (name == "all") SparkEntry.queries.keys.toSeq.sorted else Seq(name)
    names.foreach { n =>
      println(s"==== $n ====")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
