package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The SQL surface: extract_tokens as a LATERAL VIEW generator must
  * reproduce the kernel's token stream from plain SQL.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extract_tokens generator matches the kernel over SQL") {
    import spark.implicits._
    GraftExtensions.register(spark)
    graft.corpus.RefCorpus.pages(spark, Seq(7, 10)).createOrReplaceTempView("pages_v")

    val viaSql = spark.sql(
      """SELECT url, t.sent_id, t.tok_id, t.tkn, t.html_ctx
        |FROM pages_v
        |LATERAL VIEW extract_tokens(html) t
        |""".stripMargin).collect()

    val kernel = graft.spark.ExtractStage.tokens(spark,
      graft.spark.ExtractStage.sentences(spark,
        graft.corpus.RefCorpus.pages(spark, Seq(7, 10)),
        config = graft.spark.ExtractStage.Config(
          bs4 = graft.dom.Bs4Config()))).collect()

    assert(viaSql.length == kernel.length)
    val sqlSet = viaSql.map(r => (r.getString(0), r.getInt(1), r.getInt(2),
      r.getString(3), r.getString(4))).toSet
    val kSet = kernel.map(t => (t.url, t.sent_id, t.tok_id, t.tkn, t.html_ctx)).toSet
    assert(sqlSet == kSet)
  }

  test("fnv1a64 is usable from SQL and matches the scala impl") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT fnv1a64('graft')").collect().head.getLong(0)
    assert(got == Fnv1a64.hashString("graft"))
  }
}
