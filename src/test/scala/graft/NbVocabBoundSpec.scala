package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** A46 vocabulary bound (the r9 weak-point fix): the NB fit collects
  * ≤ maxFeatures·|classes| rows at ANY corpus size — corpus vocabulary
  * is not structurally bounded (Heaps' law, C44), the MODEL vocabulary
  * is, via CountVectorizer max_features semantics (top-K words by the
  * (count DESC, word) total order; OOV words drop from the document
  * representation entirely). Adversarial fixture: vocabulary ≫ K.
  */
class NbVocabBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 classes; 6 high-frequency "signal" words (2 per class, count 40
  // each) + 200 singleton noise words — vocabulary 206 ≫ K = 8
  private lazy val docs = {
    val signal = for {
      ((cls, words), c) <- Seq("alpha" -> Seq("aa", "ab"),
                               "beta"  -> Seq("ba", "bb"),
                               "gamma" -> Seq("ga", "gb")).zipWithIndex
      i <- 0 until 20
    } yield (c * 100L + i, words.mkString(" ") + " " + words.mkString(" "), cls)
    val noise = (0 until 100).map { i =>
      (10000000L + i, s"noise${2 * i} noise${2 * i + 1}", if (i % 2 == 0) "alpha" else "beta")
    }
    (signal ++ noise).toDF("doc_id", "text", "source")
  }

  test("fit collects at most maxFeatures vocabulary rows") {
    val m = TextOps.nbFitFrom(docs, maxFeatures = 8)
    assert(m.delta.size <= 8, s"vocab ${m.delta.size} exceeds the bound")
    // the kept words are exactly the top-K of the (count DESC, word)
    // total order: the 6 count-40 signal words, then the first 2
    // singleton noise words alphabetically
    assert(m.delta.keySet == Set("aa", "ab", "ba", "bb", "ga", "gb",
      "noise0", "noise1"))
  }

  test("OOV words drop from the representation; in-vocab words classify") {
    val m = TextOps.nbFitFrom(docs, maxFeatures = 8)
    // a document of pure signal words scores its class
    assert(m.predict(Iterator("ga", "gb", "ga")) == "gamma")
    // a document of ONLY out-of-vocabulary words carries no evidence:
    // score = prior only → the max-prior class (alpha: 70 docs of 160)
    assert(m.predict(Iterator("noise7", "noise9", "unseen")) == "alpha")
    // OOV words must not dilute an in-vocab signal (they contribute
    // neither counts nor default-smoothing mass)
    assert(m.predict(Iterator("ba", "noise7", "noise9", "noise11")) == "beta")
  }

  test("the gate fixture's vocabulary sits under the production bound") {
    // K = 65536 is inert at gate scale by construction — assert it, so
    // a fixture change that silently crosses the bound fails loudly
    val v = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(countDistinct(col("w"))).as[Long].head()
    assert(v < TextOps.nbMaxFeatures, s"fixture vocab $v >= bound")
  }
}
