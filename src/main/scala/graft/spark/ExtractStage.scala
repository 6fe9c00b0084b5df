package graft.spark

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.LongAccumulator
import graft.dom.Bs4Config
import graft.extract.{Extractor, Gazetteers, Py}

/** pages → sentences/tokens extraction stage.
  *
  * Narrow (`mapPartitions`) over the pages scan: the kernel parses each
  * page's HTML with the parity DOM, emits whole sentences, and never
  * shuffles. Labels (target names) and gazetteers ride in as broadcast
  * maps — the relational equivalent is a broadcast join (SURVEY.md §2.3
  * J1-J3).
  *
  * Scale guards: pages larger than `maxHtmlBytes` are skipped (counted in
  * the skipped accumulator + lineage); the DOM is bounded per page and
  * freed between pages.
  */
object ExtractStage {

  final case class Config(
      bs4: Bs4Config = Bs4Config(),
      maxHtmlBytes: Int = 8 * 1024 * 1024,
      annotateGazetteer: Boolean = false,
      emitBPer: Boolean = false)

  def sentences(
      spark: SparkSession,
      pages: Dataset[Page],
      targetNames: Option[Broadcast[Map[String, Seq[String]]]] = None,
      gaz: Option[Broadcast[Gazetteers]] = None,
      targetNamesFn: Option[String => Seq[String]] = None,
      config: Config = Config(),
      skipped: Option[LongAccumulator] = None,
      inputPages: Option[LongAccumulator] = None): Dataset[SentenceRow] = {
    import spark.implicits._
    val cfg = config
    pages.mapPartitions { it =>
      val emptyGaz = Gazetteers()
      it.flatMap { p =>
        inputPages.foreach(_.add(1))
        if (p.html == null || p.html.length > cfg.maxHtmlBytes) {
          skipped.foreach(_.add(1))
          Iterator.empty
        } else {
          val html = Py.universalNewlines(
            new String(p.html, StandardCharsets.UTF_8))
          val names = targetNames.map(_.value.getOrElse(p.url, Nil))
            .orElse(targetNamesFn.map(_(p.url))).getOrElse(Nil)
          val g = gaz.map(_.value).getOrElse(emptyGaz)
          try {
            val sents = Extractor.tokenize(html, names, g, cfg.bs4,
              annotateGazetteer = cfg.annotateGazetteer)
            sents.iterator.zipWithIndex.map { case (s, si) =>
              SentenceRow(
                url = p.url, warc_ts = p.warc_ts, lang = p.lang, sent_id = si,
                tkns = s.map(_.tkn),
                feats = s.map(_.features.toSeq),
                bio = s.map(_.bio))
            }
          } catch {
            case _: Throwable =>
              skipped.foreach(_.add(1))
              Iterator.empty
          }
        }
      }
    }
  }

  /** Fused extract -> label/decode -> mentions kernel: sentences (and
    * their 13-feature vectors) never leave the partition, so nothing
    * pays the nested-array encoder. This is the at-scale mention path —
    * Catalyst cannot prune through an opaque kernel, so the kernel only
    * emits what downstream needs. Tagging is either carried gold labels
    * or an in-kernel Viterbi decode with broadcast weights.
    */
  def mentions(
      spark: SparkSession,
      pages: Dataset[Page],
      targetNames: Option[Broadcast[Map[String, Seq[String]]]] = None,
      targetNamesFn: Option[String => Seq[String]] = None,
      gaz: Option[Broadcast[Gazetteers]] = None,
      model: Option[Broadcast[graft.tag.HmmModel]] = None,
      config: Config = Config(),
      skipped: Option[LongAccumulator] = None,
      dedupePerPage: Boolean = false): Dataset[graft.spark.Mention] = {
    import spark.implicits._
    val cfg = config
    pages.mapPartitions { it =>
      val emptyGaz = Gazetteers()
      it.flatMap { p =>
        if (p.html == null || p.html.length > cfg.maxHtmlBytes) {
          skipped.foreach(_.add(1))
          Iterator.empty
        } else {
          val html = Py.universalNewlines(
            new String(p.html, StandardCharsets.UTF_8))
          val names = targetNames.map(_.value.getOrElse(p.url, Nil))
            .orElse(targetNamesFn.map(_(p.url))).getOrElse(Nil)
          val g = gaz.map(_.value).getOrElse(emptyGaz)
          try {
            val sents = Extractor.tokenize(html, names, g, cfg.bs4,
              annotateGazetteer = cfg.annotateGazetteer)
            sents.iterator.zipWithIndex.flatMap { case (sent, si) =>
              val tags: Seq[String] = model match {
                case Some(m) =>
                  graft.tag.Hmm.decode(m.value, sent.map(_.features.toSeq))
                    .map(graft.tag.Hmm.Labels(_)).toSeq
                case None => sent.map(_.bio)
              }
              val conf = if (model.isDefined) 0.9 else 1.0
              graft.metrics.SpanMetrics.namedEntities(tags).iterator.map {
                case (start, end, _) =>
                  graft.spark.Mention(p.url, p.warc_ts, p.lang, si, start, end,
                    sent.slice(start, end + 1).map(_.tkn).mkString(" "), conf)
              }
            } match {
              case ms if !dedupePerPage => ms
              case ms =>
                // the triple dedup key (subj,pred,obj,url) is page-local
                // when urls are unique, so dedup here instead of a shuffle
                val seen = scala.collection.mutable.HashSet[String]()
                ms.filter(m => seen.add(m.name))
            }
          } catch {
            case _: Throwable =>
              skipped.foreach(_.add(1))
              Iterator.empty
          }
        }
      }
    }
  }

  /** Exploded relational token view (narrow; Catalyst prunes columns). */
  def tokens(spark: SparkSession, sents: Dataset[SentenceRow]): Dataset[TokenRow] = {
    import spark.implicits._
    sents.flatMap { s =>
      s.tkns.indices.iterator.map { i =>
        val f = s.feats(i)
        TokenRow(s.url, s.sent_id, i, s.tkns(i), s.bio(i),
          f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7), f(8), f(9), f(10),
          f(11), f(12))
      }
    }
  }
}
