package graft.kg

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lineage schema evolution: a resumed outDir written before the
  * `skipped_rows` column mixes 5- and 6-column parquet files in
  * `_lineage`; `lineage()` must read both deterministically (plain
  * `spark.read.parquet` samples ONE footer for the schema) and
  * null-fill old rows with 0.
  */
class StagesLineageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("lineage() merges pre-skipped_rows files with current-format appends") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stages_lineage").toString
    val st = new Stages(spark, base)
    // simulate a lineage file appended by the pre-upgrade engine
    spark.range(1).select(
      lit("old_stage").as("stage"), lit(0).as("partition_id"),
      lit(10L).as("input_rows"), lit(10L).as("output_rows"),
      lit(5L).as("wall_ms"))
      .write.mode("append").parquet(st.lineagePath)
    // resume: a new stage appends the 6-column format
    st.stage("s_new", inputRows = 3L, skippedRows = 1L) {
      Seq((1, "a"), (2, "b")).toDF("id", "v")
    }
    val l = st.lineage()
    assert(l.columns.contains("skipped_rows"))
    val byStage = l.select(col("stage"), col("skipped_rows"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage("old_stage") == 0L) // null-filled, not NPE
    assert(byStage("s_new") == 1L)
  }
}
