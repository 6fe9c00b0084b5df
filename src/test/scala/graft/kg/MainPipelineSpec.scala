package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Full-pipeline plumbing: the pages source is consumed exactly ONCE
  * (lineage input_rows comes from an accumulator inside the extract job,
  * not a second pages.count() pass — at 100 TB an extra generation/scan
  * pass per run is a full corpus read).
  */
class MainPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pages are generated in one pass; lineage still records input_rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_main_once").toString
    val nDocs = 60L
    val consumed = spark.sparkContext.longAccumulator("pages_consumed")
    val base = graft.corpus.SyntheticCorpus.pages(spark, nDocs, numPartitions = 4)
    val instrumented = base.mapPartitions(_.map { p => consumed.add(1); p })

    val edges = Main.runPages(spark, instrumented, None,
      Some(graft.corpus.SyntheticCorpus.targetNamesFn()), dir,
      tagger = "gold", stMinCount = 2L)
    assert(edges.count() > 0)

    // one pass: every page consumed exactly once across the whole
    // pipeline (the old code counted pages a second time for lineage)
    assert(consumed.value == nDocs,
      s"pages consumed ${consumed.value} times, expected $nDocs (one pass)")

    // lineage still records the true input size for the extract stage
    val lin = new Stages(spark, dir).lineage()
    val sentIn = lin.filter(col("stage") === "sentences")
      .select(max(col("input_rows"))).head().getLong(0)
    assert(sentIn == nDocs, s"lineage input_rows $sentIn != $nDocs")

    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec)
      p.delete()
    }
    deleteRec(new java.io.File(dir))
  }
}
