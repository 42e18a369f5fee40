package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.FeatureFrame
import graft.estimators.KNeighborsClassifier
import graft.functions.dec4
import graft.operators.{Similarity, TextOps}

/** Round-16 optimization parity: every operator whose internals were
  * rewritten for performance is checked against its PRE-r16
  * implementation, kept here as the test reference (the r15 spec's
  * discipline).
  *
  *  - q_multinomial_nb: the driver-solved fit + single-aggregate
  *    vectorized scoring must publish a confusion matrix IDENTICAL to
  *    the previous pipeline (distributed classBase/weights via the
  *    shared e6 formula texts, docs×classes explode, min_by argmax).
  *  - q_kmeans: the fused assignment+partial-sum Lloyd kernel must
  *    equal the previous two-pass rounds (broadcast-kNN assignment,
  *    corpus join + posexplode centroid aggregate).
  */
class R16OptimizationParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) ===
           b.schema.map(f => (f.name, f.dataType)))
    assert(rowsOf(a) === rowsOf(b))
  }

  // ---- pre-r16 reference implementations ----

  // the shared e6 formula texts exactly as the pre-r16 pipeline (and
  // the DuckDB oracle) spell them — frozen here as the reference
  private val refNbLnSql =
    "ROUND(ln((CAST(nwc AS DOUBLE) + 1.0) / " +
      "(CAST(nc AS DOUBLE) + CAST(vv AS DOUBLE))) * 1000000.0, 0)"
  private val refNbDfltSql =
    "ROUND(ln(1.0 / (CAST(nc AS DOUBLE) + CAST(vv AS DOUBLE))) * 1000000.0, 0)"
  private val refNbPriorSql =
    "ROUND(ln(CAST(ndc AS DOUBLE) / CAST(nd AS DOUBLE)) * 1000000.0, 0)"

  /** The pre-r16 q_multinomial_nb: distributed fit artifacts rebuilt
    * per action, docs×classes exploded scoring, min_by argmax. */
  private def multinomialNbExploded(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables.documents
    val docs = documents(s, dir).select(col("doc_id"), col("source"))
    val raw = documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val rawPinned = graft.core.Materialize.pin(raw)
    val vocabWords = rawPinned.groupBy(col("word"))
      .agg(sum(col("cnt")).as("wn"))
      .orderBy(col("wn").desc, col("word")).limit(TextOps.nbMaxFeatures)
      .select(col("word"))
    val toksPinned = rawPinned.join(broadcast(vocabWords), "word")
    val docTot = toksPinned.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("toks"))
    val labeled = toksPinned.join(broadcast(docs), "doc_id")
    val nwc = labeled.groupBy(col("source"), col("word"))
      .agg(sum(col("cnt")).as("nwc"))
    val perClass = nwc.groupBy(col("source")).agg(sum(col("nwc")).as("nc"))
    val vocab = vocabWords.agg(count(lit(1)).as("vv"))
    val priors = docs.groupBy(col("source")).agg(count(lit(1)).as("ndc"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("nd"))))
    val classBase = perClass.crossJoin(broadcast(vocab))
      .join(broadcast(priors), "source")
      .select(col("source"), col("nc"), col("vv"),
        expr(s"CAST($refNbDfltSql AS BIGINT)").as("dflt_e6"),
        expr(s"CAST($refNbPriorSql AS BIGINT)").as("prior_e6"))
    val weights = nwc.join(broadcast(classBase), "source")
      .select(col("source"), col("word"),
        (expr(s"CAST($refNbLnSql AS BIGINT)") - col("dflt_e6")).as("delta_e6"))
    val seenPart = toksPinned.join(broadcast(weights), "word")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("cnt") * col("delta_e6")).as("seen_e6"))
    val scores = docTot
      .crossJoin(broadcast(classBase.select(col("source"), col("dflt_e6"),
        col("prior_e6"))))
      .join(seenPart, Seq("doc_id", "source"), "left_outer")
      .select(col("doc_id"), col("source"),
        (col("prior_e6") + col("toks") * col("dflt_e6") +
         coalesce(col("seen_e6"), lit(0L))).as("score_e6"))
    val pred = scores
      .groupBy(col("doc_id"))
      .agg(min_by(col("source"),
        struct((-col("score_e6")).as("ns"), col("source"))).as("predicted"))
    val out = graft.core.Materialize.pin(
      docs.join(pred, "doc_id")
        .groupBy(col("source").as("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("actual"), col("predicted")))
    graft.core.Materialize.release(rawPinned)
    out
  }

  /** The pre-r16 q_kmeans: per round, one broadcast-kNN assignment pass
    * plus a corpus vec_id join + posexplode centroid aggregate. */
  private def kmeansTwoPass(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables.embeddings
    val kC = 8
    val dim = 64
    val e = embeddings(s, dir).select(
      col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val initIds = (0 until kC).map(_ * 60L)

    def widen(cent: DataFrame): DataFrame = cent
      .groupBy(col("cluster"))
      .pivot("pos", (0 until dim).map(i => i: Any))
      .agg(first(col("c")))
      .toDF("cluster" +: (0 until dim).map(i => s"f$i"): _*)

    def assign(centWide: DataFrame): DataFrame = {
      val model = KNeighborsClassifier(k = 1, orderBy = Seq("cluster"))
        .fit(centWide, (0 until dim).map(i => s"f$i"), Seq("cluster"))
      val input = e.select(
        col("vec_id") +: (0 until dim).map(i => element_at(col("v"), i + 1).as(s"f$i")): _*)
      model.predict(FeatureFrame(input, Seq("vec_id"), (0 until dim).map(i => s"f$i")))
        .select(col("vec_id"), col("prediction").cast("long").as("cluster"))
    }

    val init = e.filter(col("vec_id").isInCollection(initIds))
      .select(col("vec_id").as("seed"), posexplode(col("v")))
      .select(((col("seed") / 60L).cast("long")).as("cluster"), col("pos"), col("col").as("c"))
    val a1 = assign(widen(init))
    val cent1 = e.join(a1, "vec_id")
      .select(col("cluster"), posexplode(col("v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(graft.functions.dec6(avg(col("col"))).as("c"))
    val a2 = graft.core.Materialize.pin(assign(widen(cent1)))
    val cent2 = e.join(a2, "vec_id")
      .select(col("cluster"), posexplode(col("v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(avg(col("col")).as("c"))
    val c01 = cent2.filter(col("pos") < 2)
      .groupBy(col("cluster"))
      .pivot("pos", Seq(0, 1))
      .agg(first(col("c")))
      .select(col("cluster"), dec4(col("0")).as("c0"), dec4(col("1")).as("c1"))
    val out = graft.core.Materialize.pin(
      a2.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
        .join(c01, "cluster")
        .orderBy(col("cluster")))
    graft.core.Materialize.release(a2)
    out
  }

  /** The pre-r16 q_lm_score: two separate HOF bigram explodes (fit +
    * score) — lmFit/lmScoreOn are still live for the F16 stream gate,
    * so the reference IS the old composition. */
  private def lmScoreTwoPass(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables.documents
    val docs = documents(s, dir).select(col("doc_id"), col("text"))
    val (uni, c2) = TextOps.lmFit(docs)
    TextOps.lmScoreOn(docs, uni, c2).orderBy(col("doc_id"))
  }

  // ---- pre-r16 BPE sentinel-state kernels (frozen references) ----

  private def bpeWordTypesRef(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables.documents
    documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]{2,}$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
  }

  private def bpeStateRef(words: DataFrame): DataFrame =
    words.select(regexp_replace(col("w"), "(.)", "|$1|").as("st"), col("cnt"))

  private val bpeTokensRef =
    split(expr("trim(BOTH '|' FROM st)"), "\\|\\|")

  private def bpeBestRef(st: DataFrame): DataFrame = st
    .select(col("cnt"), bpeTokensRef.as("t"))
    .filter(size(col("t")) >= 2)
    .select(col("cnt"), explode(transform(
      sequence(lit(1), size(col("t")) - 1),
      i => struct(element_at(col("t"), i).as("a"),
                  element_at(col("t"), i + 1).as("b")))).as("p"))
    .groupBy(col("p.a").as("a"), col("p.b").as("b"))
    .agg(sum(col("cnt")).as("n"))
    .orderBy(col("n").desc, col("a"), col("b")).limit(1)

  private def bpeApplyRef(st: DataFrame, best: DataFrame): DataFrame =
    st.crossJoin(broadcast(best.select(col("a"), col("b"))))
      .select(expr(
        "replace(st, '|' || a || '||' || b || '|', '|' || a || b || '|')")
        .as("st"), col("cnt"))

  /** The pre-r16 q_bpe_train: 3 distributed merge rounds, each a
    * broadcast build re-deriving the corpus word-type aggregate. */
  private def bpeTrainDistributed(s: SparkSession, dir: String): DataFrame = {
    var st = bpeStateRef(
      bpeWordTypesRef(s, dir).orderBy(col("cnt").desc, col("w")).limit(60))
    val merges = (1 to 3).map { r =>
      val best = bpeBestRef(st)
      st = bpeApplyRef(st, best)
      best.select(lit(r).as("round"), col("a").as("t1"), col("b").as("t2"),
        concat(col("a"), col("b")).as("merged"), col("n").as("support"))
    }
    merges.reduce(_ union _).orderBy(col("round"))
  }

  /** The pre-r16 q_bpe_encode: per-round census branches each
    * re-deriving the word-type aggregate and the merge chain. */
  private def bpeEncodeDistributed(s: SparkSession, dir: String): DataFrame = {
    val types = bpeWordTypesRef(s, dir)
    var trainSt = bpeStateRef(types.orderBy(col("cnt").desc, col("w")).limit(60))
    var allSt = bpeStateRef(types)
    def census: DataFrame =
      allSt.agg(sum(col("cnt") * size(bpeTokensRef)).as("n_tokens"))
    val round0 = census
      .select(lit(0).as("round"), lit("").as("merged"), col("n_tokens"))
    val curve = Seq(round0) ++ (1 to 3).map { r =>
      val best = bpeBestRef(trainSt)
      trainSt = bpeApplyRef(trainSt, best)
      allSt = bpeApplyRef(allSt, best)
      census
        .crossJoin(broadcast(best.select(
          concat(col("a"), col("b")).as("merged"))))
        .select(lit(r).as("round"), col("merged"), col("n_tokens"))
    }
    val rounds = curve.reduce(_ union _)
    val base = rounds.filter(col("round") === 0)
      .select(col("n_tokens").as("n0"))
    rounds.crossJoin(broadcast(base))
      .select(col("round"), col("merged"), col("n_tokens"),
        expr("(n0 - n_tokens) * 1000 div n0").as("saved_permille"))
      .orderBy(col("round"))
  }

  // ---- parity assertions ----

  test("q_multinomial_nb: driver-solved fit + vectorized scoring == " +
       "the exploded docs×classes pipeline") {
    assertSame(TextOps.qMultinomialNb(spark, dir),
               multinomialNbExploded(spark, dir))
  }

  test("q_kmeans: fused assignment+partial-sum kernel == " +
       "the two-pass assign/aggregate rounds") {
    assertSame(Similarity.qKmeans(spark, dir), kmeansTwoPass(spark, dir))
  }

  test("q_lm_score: compiled single bigram pass == the two-explode " +
       "lmFit/lmScoreOn composition") {
    assertSame(TextOps.qLmScore(spark, dir), lmScoreTwoPass(spark, dir))
  }

  test("q_bpe_train: driver merge loop == the distributed " +
       "sentinel-state rounds") {
    assertSame(TextOps.qBpeTrain(spark, dir), bpeTrainDistributed(spark, dir))
  }

  test("q_bpe_encode: one-pass census over driver merges == the " +
       "per-round distributed census union") {
    assertSame(TextOps.qBpeEncode(spark, dir), bpeEncodeDistributed(spark, dir))
  }
}
