package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.queries.TextQueries

class TextSpec extends SparkSpec {

  test("tokens lowercases, splits, drops empties") {
    import spark.implicits._
    val df = Seq("  Hello   WORLD  ", "").toDF("text")
    val out = df.select(TextOps.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("hello", "world"))
    assert(out(1) === Seq.empty)
  }

  test("wordNgrams guards short docs; charNgrams slides correctly") {
    import spark.implicits._
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(
      TextOps.wordNgrams(TextOps.tokens(col("text")), 3).as("w3"),
      TextOps.charNgrams(col("text"), 3).as("c3")).collect()
    assert(out(0).getSeq[String](0) === Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](0) === Seq.empty)
    assert(out(1).getSeq[String](1) === Seq("a b")) // "a b" is 3 chars: one 3-gram
  }

  test("fingerprint is deterministic and whitespace-normalized") {
    import spark.implicits._
    val df = Seq("Hello  World", "hello world", "hello worlds").toDF("text")
    val fp = df.select(TextOps.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
    assert(fp.forall(v => v >= 0 && v < 1000000007L))
  }

  test("langPredict breaks ties by language code") {
    import spark.implicits._
    // no markers at all -> all scores 0 -> first lang code wins ("de")
    val df = Seq("xyzzy plugh").toDF("text")
    val out = df.select(TextOps.langPredict(TextOps.tokens(col("text")))).head()
    assert(out.getString(0) === "de")
  }

  test("langid beats chance on the labeled corpus") {
    val cm = TextQueries.textLangid(spark, sf).collect()
    val total = cm.map(_.getLong(2)).sum
    val correct = cm.filter(r => r.getString(0) === r.getString(1)).map(_.getLong(2)).sum
    assert(total === 500L)
    assert(correct.toDouble / total > 0.2, s"accuracy ${correct.toDouble / total}")
  }

  test("quality score stays in [0,1] and penalizes stopword soup") {
    import spark.implicits._
    val df = Seq("the a of and to the a of", "informative dense technical prose here")
      .toDF("text")
    val s = df.select(TextOps.qualityScore(TextOps.tokens(col("text"))))
      .collect().map(_.getDouble(0))
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s(1) > s(0))
  }

  test("corpus queries return full coverage") {
    assert(TextQueries.textTokens(spark, sf).count() === 500L)
    assert(TextQueries.textFingerprint(spark, sf).count() === 500L)
    assert(TextQueries.textNgrams(spark, sf).count() === 30L)
  }
}
