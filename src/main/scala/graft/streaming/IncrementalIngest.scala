package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.spark.{ExtractStage, Page}
import graft.kg.Triples

/** Incremental crawl ingest (SURVEY §2.8): the same extract→tag→triples
  * stages running under Structured Streaming. New page files appearing
  * under `pagesDir` are picked up per micro-batch; `foreachBatch` reuses
  * the exact batch kernel (fused mention path), appends triples to the
  * sink, and checkpoints offsets — so incremental ingest composes with
  * the batch pipeline instead of forking it.
  */
object IncrementalIngest {

  def start(
      spark: SparkSession,
      pagesDir: String,
      triplesDir: String,
      checkpointDir: String,
      targetNamesFn: Option[String => Seq[String]] = None,
      model: Option[graft.tag.HmmModel] = None): StreamingQuery = {
    import spark.implicits._

    val pageSchema = implicitly[org.apache.spark.sql.Encoder[Page]].schema
    val stream = spark.readStream
      .schema(pageSchema)
      .parquet(pagesDir)

    val bModel = model.map(m => spark.sparkContext.broadcast(m))

    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pages = batch.as[Page]
        val mentions = ExtractStage.mentions(spark, pages,
          targetNamesFn = targetNamesFn, model = bModel,
          dedupePerPage = true)
        // idempotent under foreachBatch's at-least-once replay: each
        // micro-batch overwrites its own batch_id partition, so a retry
        // after a partial write cannot duplicate triples. Re-crawled
        // urls across batches are deduped downstream (the batch
        // pipeline's global dropDuplicates over the sink).
        Triples.fromMentions(spark, mentions, alreadyDeduped = true)
          .write.mode("overwrite")
          .parquet(s"$triplesDir/batch_id=$batchId")
        ()
      }
      .start()
  }
}
