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

  test("minhash signature equals min md5 of perm-prefixed shingles") {
    val df = Seq("a b c d").toDF("text")
      .select(T.minhashSig(T.shingles3(T.words(col("text"))), 3).as("sig"))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expected = Seq("3|a b c", "3|b c d").map { s => md.reset(); md5hex(s) }.min
    assert(df.collect().head.getString(0) == expected)
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
