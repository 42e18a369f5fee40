package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Text primitive semantics (shingles, minhash portability, markers). */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("3-shingles slide over words; short docs yield none") {
    val df = Seq("a b c d e", "a b").toDF("text")
      .select(T.shingles3(T.words(col("text"))).as("sh"))
    val r = df.collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("a b c", "b c d", "c d e"))
    assert(r(1).isEmpty)
  }

  test("minhash signature equals universal-hash min over md5 base hashes") {
    val df = Seq("a b c d").toDF("text")
      .select(T.minhashSig(
        transform(T.shingles3(T.words(col("text"))), T.minhashBase _), 3).as("sig"))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val (a, b) = T.minhashPerms(3)
    val expected = Seq("a b c", "b c d").map { s =>
      md.reset()
      val h = java.lang.Long.parseLong(md5hex(s).take(13), 16) % T.minhashP
      (a * h + b) % T.minhashP
    }.min
    assert(df.collect().head.getLong(0) == expected)
  }

  test("marker count and word-length sum") {
    val df = Seq("the cat in the hat").toDF("text").select(
      T.markerCount(T.words(col("text")), Seq("the", "in")).as("m"),
      T.sumWordLen(T.words(col("text"))).as("s"))
    val r = df.collect().head
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 14)
  }
}
