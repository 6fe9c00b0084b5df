package graft

/** Single-thread kernel throughput probe (run with
  * `-XX:StartFlightRecording=...` for a JFR profile): synthesize +
  * parse + extract `n` synthetic pages in a tight loop, no Spark.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val cfg = graft.dom.Bs4Config()
    // warmup
    var i = 0
    while (i < 3000) {
      val html = graft.corpus.SyntheticCorpus.htmlOf(i, 25, 42L, 5)
      graft.extract.Extractor.tokenize(html, config = cfg)
      i += 1
    }
    val t0 = System.nanoTime()
    i = 0
    var toks = 0L
    while (i < n) {
      val html = graft.corpus.SyntheticCorpus.htmlOf(i, 25, 42L, 5)
      val sents = graft.extract.Extractor.tokenize(html, config = cfg)
      toks += sents.map(_.length).sum
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"PROF pages=$n toks=$toks sec=$dt%.3f pages/s=${n / dt}%.0f")
  }
}
