package graft.kg

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint-resumable stage runner with per-partition lineage
  * (north rule: "resumable from checkpoint with per-partition lineage +
  * metrics").
  *
  * Each stage materializes to `<base>/<name>` (Parquet + `_SUCCESS`);
  * re-running the pipeline skips every stage whose output already
  * exists, so a killed job resumes from the last completed stage. A
  * lineage row per output partition (stage, partition_id, input_rows,
  * output_rows, wall_ms) appends to `<base>/_lineage`.
  */
final class Stages(spark: SparkSession, base: String) {

  private def successExists(dir: String): Boolean = {
    // Hadoop FS so hdfs://, s3a:// etc. resume correctly
    val p = new Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def lineagePath: String = s"$base/_lineage"

  def lineage(): DataFrame = {
    // mergeSchema: a resumed pre-skipped_rows outDir mixes 5- and
    // 6-column lineage files; plain read samples ONE footer for the
    // schema, so the column set would be nondeterministic. Old rows
    // read as null skipped_rows -> 0 (nothing was skipped back then).
    val raw = spark.read.option("mergeSchema", "true").parquet(lineagePath)
    if (raw.columns.contains("skipped_rows"))
      raw.withColumn("skipped_rows",
        coalesce(col("skipped_rows"), lit(0L)))
    else raw.withColumn("skipped_rows", lit(0L))
  }

  /** Run (or resume) one stage. `inputRows`/`skippedRows` are recorded
    * in lineage (evaluated AFTER the stage materializes, so accumulator
    * values are populated); pass -1 when unknown.
    */
  def stage(name: String, inputRows: => Long = -1L,
      skippedRows: => Long = -1L)(compute: => DataFrame): DataFrame = {
    val dir = s"$base/$name"
    if (successExists(dir)) {
      spark.read.parquet(dir)
    } else {
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(dir)
      val wallMs = (System.nanoTime() - t0) / 1000000L
      val out = spark.read.parquet(dir)
      val inRows = inputRows
      val skipRows = skippedRows
      val perPartition = out
        .groupBy(spark_partition_id().as("partition_id"))
        .agg(count(lit(1)).as("output_rows"))
        .select(
          lit(name).as("stage"),
          col("partition_id"),
          lit(inRows).as("input_rows"),
          lit(skipRows).as("skipped_rows"),
          col("output_rows"),
          lit(wallMs).as("wall_ms"))
      perPartition.write.mode("append").parquet(lineagePath)
      out
    }
  }
}
