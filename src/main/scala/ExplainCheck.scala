import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q1_agg", "q2_join_broadcast", "q3_window_topk", "doc_vocab")) {
      println(s"=== $q ===")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      println(plan.split("\n").filter(l =>
        l.contains("Scan") || l.contains("Exchange") || l.contains("Broadcast") ||
        l.contains("WholeStageCodegen") || l.contains("PushedFilters") ||
        l.contains("HashAggregate")).take(14).mkString("\n"))
    }
    spark.stop()
  }
}
