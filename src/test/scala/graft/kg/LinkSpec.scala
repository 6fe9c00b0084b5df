package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Entity linking + canonicalization: LSH blocking recall/precision on
  * crafted variants, salted hot-entity aggregation, alias-dictionary
  * scoring, and checkpoint resume (FIXTURES.md §8).
  */
class LinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def namesDf(names: (String, Long)*) = {
    import spark.implicits._
    names.toDF("name", "support")
  }

  test("LSH candidate pairs cluster near-duplicate names, not strangers") {
    val names = namesDf(
      ("Jose Garcia", 10L), ("José García", 3L), ("Jose  Garcia", 1L),
      ("John Smith", 5L), ("John Smith Jr", 2L),
      ("Wolfgang Pauli", 4L), ("Xinyi Zhang", 4L))
    val pairs = Linker.candidatePairs(spark, names, maxDistance = 0.4)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("Jose Garcia", "José García")) ||
           pairs.contains(("José García", "Jose Garcia")))
    assert(pairs.exists(p => p._1.contains("Smith") && p._2.contains("Smith")))
    assert(!pairs.exists(p => p._1.contains("Pauli") && p._2.contains("Zhang")))
    assert(!pairs.exists(p => p._1.contains("Garcia") && p._2.contains("Smith")))
  }

  test("connected components + canonical election merge variant clusters") {
    val names = namesDf(
      ("Jose Garcia", 10L), ("José García", 3L), ("Garcia, Jose", 1L),
      ("John Smith", 5L), ("Xinyi Zhang", 4L))
    val pairs = namesDf().sparkSession.createDataFrame(Seq(
      ("Jose Garcia", "José García", 0.1),
      ("Garcia, Jose", "Jose Garcia", 0.2))).toDF("name_a", "name_b", "dist")
    val membership = Canonicalize.components(spark, pairs)
    val nodes = Canonicalize.entities(spark, names, membership)
    val rows = nodes.collect()
    assert(rows.length == 3) // garcia cluster + 2 singletons
    val garcia = rows.find(_.getAs[scala.collection.Seq[String]]("aliases").length == 3).get
    assert(garcia.getAs[String]("canonical_name") == "Jose Garcia") // top support
    assert(garcia.getAs[Long]("support") == 14L)
  }

  test("hot-entity skew: salted aggregation handles a 20% hot alias") {
    import spark.implicits._
    // one hot name with very high support + 500 cold names, all linked
    // to the hot one (a pathological single component)
    val cold = (1 to 500).map(i => (f"Cold Name $i%03d", 1L))
    val names = namesDf((("Hot Wang", 100000L) +: cold): _*)
    val pairs = cold.map { case (n, _) => ("Hot Wang", n, 0.1) }
      .toDF("name_a", "name_b", "dist")
      .select(least(col("name_a"), col("name_b")).as("name_a"),
        greatest(col("name_a"), col("name_b")).as("name_b"), col("dist"))
    val membership = Canonicalize.components(spark, pairs)
    val nodes = Canonicalize.entities(spark, names, membership, saltBuckets = 16)
    val rows = nodes.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("canonical_name") == "Hot Wang")
    assert(rows.head.getAs[scala.collection.Seq[String]]("aliases").length == 501)
    assert(rows.head.getAs[Long]("support") == 100500L)
  }

  test("alias dictionary links resolve through the broadcast map") {
    val names = namesDf(("Bill Gates", 5L), ("William Gates", 2L), ("Ada L", 1L))
    val dict = spark.sparkContext.broadcast(Map(
      Linker.normalize("William Gates") -> "Bill Gates"))
    val links = Linker.aliasLinks(spark, names, dict).collect()
    assert(links.length == 1)
    assert(links.head.getString(0) == "Bill Gates")
    assert(links.head.getString(1) == "William Gates")
  }

  test("pipeline stages resume from checkpoint with identical output") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_kg_test").toString
    val ids = Seq(7, 10, 19) // three small test docs
    val spark2 = spark
    import spark2.implicits._

    // monkey-run a mini pipeline via Stages directly
    val stages = new Stages(spark, dir)
    val df1 = stages.stage("s1") { Seq((1, "a"), (2, "b")).toDF("id", "v") }
    val df2 = stages.stage("s2", df1.count()) {
      df1.withColumn("v2", concat(col("v"), lit("!")))
    }
    val firstRun = df2.collect().map(_.toString).sorted.toSeq

    // delete s2; rerun must recompute s2 from the s1 checkpoint
    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec)
      p.delete()
    }
    deleteRec(new java.io.File(s"$dir/s2"))
    val stagesB = new Stages(spark, dir)
    var s1Recomputed = false
    val df1b = stagesB.stage("s1") { s1Recomputed = true; Seq.empty[(Int, String)].toDF("id", "v") }
    val df2b = stagesB.stage("s2", df1b.count()) {
      df1b.withColumn("v2", concat(col("v"), lit("!")))
    }
    assert(!s1Recomputed, "s1 should have been resumed from checkpoint")
    assert(df2b.collect().map(_.toString).sorted.toSeq == firstRun)

    // lineage recorded per stage
    val lin = stagesB.lineage()
    assert(lin.select("stage").distinct().count() == 2)
    deleteRec(new java.io.File(dir))
  }
}
