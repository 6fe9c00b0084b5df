package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.metrics.SpanMetrics
import graft.spark.{Mention, SentenceRow, Triple}
import graft.tag.Hmm

/** Mention detection + triple projection (the reference's prediction
  * output generalized to (subj, pred, obj) per the north star): every
  * person-name span becomes `(url, "mentionsPerson", name)` carrying
  * page metadata — a narrow projection, no shuffle (SURVEY §2.3 J5).
  */
object Triples {
  val MentionsPerson = "mentionsPerson"

  def mentionsFromTags(s: SentenceRow, tags: Seq[String],
      confidence: Double): Iterator[Mention] =
    SpanMetrics.namedEntities(tags).iterator.map { case (start, end, _) =>
      Mention(s.url, s.warc_ts, s.lang, s.sent_id, start, end,
        s.tkns.slice(start, end + 1).mkString(" "), confidence)
    }

  /** Mentions from gold labels carried by the sentences (dataset
    * construction path).
    */
  def goldMentions(spark: SparkSession,
      sents: Dataset[SentenceRow]): Dataset[Mention] = {
    import spark.implicits._
    sents.flatMap(s => mentionsFromTags(s, s.bio, 1.0))
  }

  /** Mentions from HMM decode (inference path): broadcast weights,
    * narrow.
    */
  def taggedMentions(spark: SparkSession, model: graft.tag.HmmModel,
      sents: Dataset[SentenceRow]): Dataset[Mention] = {
    import spark.implicits._
    val b = spark.sparkContext.broadcast(model)
    sents.mapPartitions { it =>
      val m = b.value
      it.flatMap { s =>
        val tags = Hmm.decode(m, s.feats).map(Hmm.Labels(_)).toSeq
        mentionsFromTags(s, tags, 0.9)
      }
    }
  }

  /** Project mentions to deduplicated triples. The dropDuplicates is a
    * hash-shuffle on (subj,pred,obj,url) — the only shuffle in the
    * triple path.
    */
  def fromMentions(spark: SparkSession,
      mentions: Dataset[Mention],
      alreadyDeduped: Boolean = false): Dataset[Triple] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // relational projection (not a closure) so Catalyst can prune/fold
    val t = mentions.select(
      col("url").as("subj"),
      lit(MentionsPerson).as("pred"),
      col("name").as("obj"),
      col("url"),
      col("warc_ts"),
      col("confidence")).as[Triple]
    // when the producer deduped page-locally (urls unique), the
    // (subj,pred,obj,url) key is already distinct — skip the shuffle
    if (alreadyDeduped) t
    else t.dropDuplicates("subj", "pred", "obj", "url")
  }
}
