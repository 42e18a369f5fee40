package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{FeatureFrame, NoData, PredictOptions}
import graft.estimators._
import graft.functions.{dec2, dec4, dec6, TextFunctions => TF}
import graft.sources.Tables._

/** Feature-array estimator query surface (SURVEY.md §2 A1–A11).
  *
  * The reference's canonical shape (fit on small tabular data, predict
  * over a huge feature array — `estimator.py:36`) mapped onto the star
  * schema: the "plots" are a deterministic small slice of lineitem
  * (`l_orderkey % 499 = 0`, ~1/500 of orders), the "raster" is the full
  * lineitem fact table. Every fitted model broadcasts its state; the
  * fact side streams through codegen'd Columns or the kNN mapPartitions
  * kernel — no shuffle on the big side in any query here.
  */
object Estimation {

  /** Row id for the prediction side: (l_orderkey, l_linenumber) is NOT
    * unique in the generated data, but the full row is — so the id is an
    * md5 over integer-encoded row fields (doubles encoded as exact cents
    * to avoid cross-engine float formatting). md5 is bit-identical in
    * Spark and DuckDB, unlike the engines' builtin hash functions.
    */
  private def withId(df: DataFrame): DataFrame =
    df.withColumn("li_id", md5(concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
      col("l_quantity").cast("long"),
      round(col("l_extendedprice") * 100, 0).cast("long"),
      round(col("l_discount") * 100, 0).cast("long"),
      round(col("l_tax") * 100, 0).cast("long"))))

  private val uidSql =
    "md5(CONCAT_WS('|', l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
      "CAST(l_quantity AS BIGINT), CAST(ROUND(l_extendedprice*100,0) AS BIGINT), " +
      "CAST(ROUND(l_discount*100,0) AS BIGINT), CAST(ROUND(l_tax*100,0) AS BIGINT)))"

  private def li(s: SparkSession, dir: String): DataFrame = withId(lineitem(s, dir))

  /** The estimator train slice, COUNT-BOUNDED (r11): `% 499` alone is
    * a corpus FRACTION — the §6 scale-knob audit question answered
    * wrong — so fit collects and the corpus×train kNN kernels would
    * grow quadratically with sf (12,073 train rows at sf1, 1.2M at
    * 100×). The `< 1e6` orderkey cap freezes the slice at its sf0.1
    * size (1,207 rows) at every larger scale while leaving BOTH gate
    * scales bit-identical (max l_orderkey: 15k at sf0.01, 150k at
    * sf0.1 — the cap is inactive there).
    */
  private def trainLi(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir).filter(col("l_orderkey") % 499 === 0 &&
      col("l_orderkey") < 1000000L)

  /** Canonical training order: a unique full-row key. Training ids are
    * 0-based ranks in this order (sklearn training-index semantics).
    */
  private val trainOrder = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private val trainSql =
    "SELECT ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
      "l_quantity, l_extendedprice, l_discount, l_tax) - 1 AS tid, l_quantity, l_discount, " +
      "l_tax, l_extendedprice, l_suppkey, l_returnflag FROM lineitem " +
      "WHERE l_orderkey % 499 = 0 AND l_orderkey < 1000000"

  /** A1: KNeighborsRegressor.predict — 1 feature, 1 target, k=5. */
  def qKnnReg(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsRegressor(k = 5, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_extendedprice"), Seq("l_quantity"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"), Seq("l_extendedprice")))
      .select(col("li_id"), dec4(col("l_quantity")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A1b: distance-weighted kNN regression (sklearn weights="distance";
    * zero-distance neighbors — the training rows themselves appear in
    * the prediction set — take the unweighted mean of the exact
    * matches).
    */
  def qKnnWeighted(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsRegressor(k = 5, orderBy = trainOrder, weighted = true)
      .fit(trainLi(s, dir), Seq("l_extendedprice"), Seq("l_quantity"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"), Seq("l_extendedprice")))
      .select(col("li_id"), dec4(col("l_quantity")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A1c: RadiusNeighborsRegressor — mean target over ALL training
    * neighbors within Euclidean radius 300 of the price (sklearn's
    * radius_neighbors family). Empty balls emit NULL prediction (the
    * NaN fill rounds to NULL through dec4 — matching the oracle's
    * CASE WHEN empty). Count column exposes the ball size.
    */
  def qRadiusReg(s: SparkSession, dir: String): DataFrame = {
    val model = RadiusNeighborsRegressor(radius = 300.0, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_extendedprice"), Seq("l_quantity"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"), Seq("l_extendedprice")))
      .select(col("li_id"), col("n_in_radius"),
              dec4(col("l_quantity")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A2: multi-feature (d=3), multi-target (t=2) kNN regression. */
  def qKnnRegMulti(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsRegressor(k = 5, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_quantity", "l_discount", "l_tax"),
           Seq("l_extendedprice", "l_suppkey"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"),
        Seq("l_quantity", "l_discount", "l_tax")))
      .select(col("li_id"),
              dec4(col("l_extendedprice")).as("pred_price"),
              dec4(col("l_suppkey")).as("pred_supp"))
      .orderBy(col("li_id"))
  }

  /** A3: KNeighborsClassifier.predict — majority vote, sklearn tie rule. */
  def qKnnCls(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsClassifier(k = 5, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_extendedprice", "l_quantity"), Seq("l_returnflag"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"),
        Seq("l_extendedprice", "l_quantity")))
      .orderBy(col("li_id"))
  }

  /** A3b: distance-weighted classification (sklearn weights="distance"
    * vote): each neighbor votes 1/distance; exact matches take over with
    * weight 1 (sklearn's zero-distance rule); argmax with ties to the
    * lowest class value. Per-class scores accumulate in neighbor-rank
    * order on both engines (the oracle sums an ORDER BY rn list), so
    * the float argmax compares bit-identical inputs.
    */
  def qKnnClsWeighted(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsClassifier(k = 5, orderBy = trainOrder, weighted = true)
      .fit(trainLi(s, dir), Seq("l_extendedprice", "l_quantity"), Seq("l_returnflag"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"),
        Seq("l_extendedprice", "l_quantity")))
      .orderBy(col("li_id"))
  }

  /** A11b: prediction under partially missing features — sklearn
    * KNNImputer's nan_euclidean distance: a deterministic md5 coin
    * knocks out one of the two features on half the rows (pattern 0 →
    * price missing, 1 → discount missing), and the kernel skips NaN
    * dims with the d/n_obs scale instead of masking the row. The
    * oracle reproduces the per-pattern distance algebra exactly
    * (factor × observed-sum, multiplication commutes bit-exactly).
    */
  def qKnnMissing(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsRegressor(k = 5, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_extendedprice", "l_discount"), Seq("l_quantity"))
    val nan = lit(Double.NaN)
    val pat = pmod(TF.hexPrefix52(col("li_id")), lit(4))
    val input = li(s, dir).select(
      col("li_id"), pat.as("pat"),
      when(pat === 0, nan).otherwise(col("l_extendedprice")).as("l_extendedprice"),
      when(pat === 1, nan).otherwise(col("l_discount")).as("l_discount"))
    model.predictWithMissing(
        FeatureFrame(input, Seq("li_id", "pat"), Seq("l_extendedprice", "l_discount")))
      .select(col("li_id"), col("pat"),
              dec4(col("l_quantity")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A4: predict_proba — neighbor class frequencies, one column per class. */
  def qKnnProba(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsClassifier(k = 5, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_extendedprice", "l_quantity"), Seq("l_returnflag"))
    val raw = model.predictProba(FeatureFrame(li(s, dir), Seq("li_id"),
        Seq("l_extendedprice", "l_quantity")))
    raw.select(col("li_id") +: model.classes.map(c => dec4(col(s"p_$c")).as(s"p_$c")): _*)
      .orderBy(col("li_id"))
  }

  /** A5: kneighbors — k=3 neighbor ids + Euclidean distances as columns. */
  def qKneighbors(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsRegressor(k = 3, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_extendedprice"), Seq("l_quantity"))
    model.kneighbors(FeatureFrame(li(s, dir), Seq("li_id"), Seq("l_extendedprice")))
      .select(col("li_id"),
              col("neighbor0"), col("neighbor1"), col("neighbor2"),
              dec4(col("distance0")).as("distance0"),
              dec4(col("distance1")).as("distance1"),
              dec4(col("distance2")).as("distance2"))
      .orderBy(col("li_id"))
  }

  private val scaleFeatures = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** A6: StandardScaler.transform — distributed agg fit, codegen affine. */
  def qStdScaler(s: SparkSession, dir: String): DataFrame = {
    val model = StandardScaler().fit(trainLi(s, dir), scaleFeatures)
    model.transform(FeatureFrame(li(s, dir), Seq("li_id"), scaleFeatures))
      .select(col("li_id") +:
        scaleFeatures.map(c => dec4(col(s"scaled_$c")).as(s"scaled_$c")): _*)
      .orderBy(col("li_id"))
  }

  /** A7: MinMaxScaler.transform. */
  def qMinMaxScaler(s: SparkSession, dir: String): DataFrame = {
    val model = MinMaxScaler().fit(trainLi(s, dir), scaleFeatures)
    model.transform(FeatureFrame(li(s, dir), Seq("li_id"), scaleFeatures))
      .select(col("li_id") +:
        scaleFeatures.map(c => dec4(col(s"scaled_$c")).as(s"scaled_$c")): _*)
      .orderBy(col("li_id"))
  }

  /** A7c: RobustScaler.transform — (x − median)/IQR, the
    * outlier-resistant affine; fit is one exact-percentile aggregate
    * over the small train side, transform the usual codegen'd affine.
    */
  def qRobustScaler(s: SparkSession, dir: String): DataFrame = {
    val model = RobustScaler().fit(trainLi(s, dir), scaleFeatures)
    model.transform(FeatureFrame(li(s, dir), Seq("li_id"), scaleFeatures))
      .select(col("li_id") +:
        scaleFeatures.map(c => dec4(col(s"scaled_$c")).as(s"scaled_$c")): _*)
      .orderBy(col("li_id"))
  }

  /** A7d: row-wise L2 normalization (sklearn Normalizer) — stateless,
    * pure codegen, zero shuffle; norms accumulate in declaration order
    * for oracle bit-parity.
    */
  def qL2Norm(s: SparkSession, dir: String): DataFrame = {
    val model = RowNormalizer(scaleFeatures)
    model.transform(FeatureFrame(li(s, dir), Seq("li_id"), scaleFeatures))
      .select(col("li_id") +:
        scaleFeatures.map(c => dec4(col(s"norm_$c")).as(s"norm_$c")): _*)
      .orderBy(col("li_id"))
  }

  /** A7e: quantile-strategy discretization (sklearn KBinsDiscretizer,
    * 5 bins) — interior exact-percentile edges from the train side,
    * bin assignment as a codegen'd comparison chain.
    */
  def qKbins(s: SparkSession, dir: String): DataFrame = {
    val model = KBinsDiscretizer(nBins = 5).fit(trainLi(s, dir), scaleFeatures)
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"), scaleFeatures))
      .orderBy(col("li_id"))
  }

  /** A7f: MaxAbsScaler.transform — x/max|x|, sparsity- and
    * sign-preserving; fit reuses the min/max aggregate (max-abs
    * derives from the two extremes, no abs() pass).
    */
  def qMaxAbs(s: SparkSession, dir: String): DataFrame = {
    val model = MaxAbsScaler().fit(trainLi(s, dir), scaleFeatures)
    model.transform(FeatureFrame(li(s, dir), Seq("li_id"), scaleFeatures))
      .select(col("li_id") +:
        scaleFeatures.map(c => dec4(col(s"scaled_$c")).as(s"scaled_$c")): _*)
      .orderBy(col("li_id"))
  }

  /** A7g: percentile winsorization — clamp to the fitted exact
    * [p05, p95]; transform is a codegen'd greatest/least chain.
    */
  def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val model = Winsorizer(0.05, 0.95).fit(trainLi(s, dir), scaleFeatures)
    model.transform(FeatureFrame(li(s, dir), Seq("li_id"), scaleFeatures))
      .select(col("li_id") +:
        scaleFeatures.map(c => dec4(col(s"w_$c")).as(s"w_$c")): _*)
      .orderBy(col("li_id"))
  }

  /** A9c: ridge regression (α=1000, intercept unpenalized) on
    * integer-encoded features (count, whole percent) and a cents
    * target, so every fit moment is an exact order-independent sum and
    * the closed-form Cramer solve is bit-replicable cross-engine.
    */
  def qRidge(s: SparkSession, dir: String): DataFrame = {
    def enc(df: DataFrame): DataFrame = df
      .withColumn("x1", col("l_quantity").cast("double"))
      .withColumn("x2", round(col("l_discount") * 100, 0).cast("double"))
      .withColumn("y_cents", round(col("l_extendedprice") * 100, 0).cast("double"))
    val model = RidgeRegression(alpha = 1000.0)
      .fit(enc(trainLi(s, dir)), Seq("x1", "x2"), Seq("y_cents"))
    model.predict(FeatureFrame(enc(li(s, dir)), Seq("li_id"), Seq("x1", "x2")))
      .select(col("li_id"), dec2(col("y_cents") / 100.0).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A20: smoothed target-mean encoding of the supplier key (m=10) —
    * the high-cardinality categorical featurizer. Fitted state is one
    * row per category (dim-scale), broadcast-joined back over the fact
    * side; categories outside the training slice encode to the prior.
    */
  def qTargetEnc(s: SparkSession, dir: String): DataFrame = {
    def enc(df: DataFrame): DataFrame =
      df.withColumn("y_cents", round(col("l_extendedprice") * 100, 0).cast("double"))
    val model = TargetEncoder("l_suppkey", "y_cents", smoothing = 10.0)
      .fit(enc(trainLi(s, dir)))
    model.transform(enc(li(s, dir)), Seq("li_id"))
      // 4dp-dollar output via an INTEGER rounding boundary (cents×100):
      // integer-quotient ties are exact binary .5s both engines round
      // alike, unlike a direct dec4 of the quotient (see TargetEncoder)
      .select(col("li_id"),
              (round(col("enc_l_suppkey") * 100, 0) / 10000.0).as("enc_supp"))
      .orderBy(col("li_id"))
  }

  /** A23: mean imputation (sklearn SimpleImputer) — x1 goes missing on
    * `l_partkey % 37 = 0` rows (the A11 sentinel pattern); the fill is
    * the train-side mean of OBSERVED values, exact because quantity is
    * integer-valued.
    */
  def qImpute(s: SparkSession, dir: String): DataFrame = {
    def enc(df: DataFrame): DataFrame = df.withColumn("x1",
      when(col("l_partkey") % 37 === 0, lit(null)).otherwise(col("l_quantity")))
    val model = SimpleImputer("mean").fit(enc(trainLi(s, dir)), Seq("x1"))
    model.transform(FeatureFrame(enc(li(s, dir)), Seq("li_id"), Seq("x1")))
      .select(col("li_id"), dec4(col("imp_x1")).as("imp_x1"))
      .orderBy(col("li_id"))
  }

  /** A24: degree-2 polynomial feature expansion (include_bias=false),
    * stateless codegen.
    */
  def qPoly(s: SparkSession, dir: String): DataFrame =
    PolynomialFeatures(Seq("l_quantity", "l_discount"))
      .transform(li(s, dir), Seq("li_id"))
      .select(col("li_id"),
        dec4(col("p_l_quantity")).as("p_q"),
        dec4(col("p_l_discount")).as("p_d"),
        dec4(col("p_l_quantity_l_quantity")).as("p_qq"),
        dec4(col("p_l_quantity_l_discount")).as("p_qd"),
        dec4(col("p_l_discount_l_discount")).as("p_dd"))
      .orderBy(col("li_id"))

  /** A25: balanced class weights (sklearn compute_class_weight):
    * w_c = n / (k · n_c) — the loss-reweighting companion to the
    * classifiers; one class aggregate + a 1-row broadcast total, exact
    * integer operands so the quotients are engine-identical.
    */
  def qClassWeight(s: SparkSession, dir: String): DataFrame = {
    val g = lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_c"))
    val t = broadcast(g.agg(sum(col("n_c")).as("n"), count(lit(1)).as("k")))
    g.crossJoin(t)
      .select(col("l_returnflag").as("class"), col("n_c"),
              (col("n").cast("double") / (col("k") * col("n_c"))).as("weight"))
      .orderBy(col("class"))
  }

  /** A27: classifier calibration curve for the A4 probability surface —
    * predicted P(class='R') bucketed into its six exact levels (k=5
    * neighbors → p ∈ {0, .2, .4, .6, .8, 1}) against the observed rate
    * of 'R'. Bins are exact neighbor counts, so the bucketing is
    * engine-stable; one id-keyed join + one 6-key aggregate. The PROBE
    * side is COUNT-BOUNDED at `l_orderkey < 8000` (the StreamFactMaxKey
    * posture: ~32k probe rows at every sf ≥ 0.01, hash-stable across
    * scales): calibration aggregates the row key away into corpus-wide
    * bins, so the sampled kNN oracle cannot verify it — and the
    * UNBOUNDED probe×train replica exhausts DuckDB's spill budget at
    * 10× (measured: 7.2e8 pairs > the 28 GiB temp cap). The bound
    * freezes the replica at ~3.9e7 pairs, verifiable at ANY sf; a
    * calibration curve needs a representative probe slice, not the
    * corpus, so the statistic itself is unchanged in kind.
    */
  def qCalibration(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsClassifier(k = 5, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_extendedprice", "l_quantity"), Seq("l_returnflag"))
    val src = li(s, dir).filter(col("l_orderkey") < 8000L)
    // the gold label rides through predictProba as an ID column — a
    // join of the proba output back to the fact scan would shuffle the
    // fact table twice on a 32-char md5 key (measured 2.9 s at sf0.1,
    // ~6x the kNN itself; unbounded fact-fact shuffle at 100 TB)
    val proba = model.predictProba(
      FeatureFrame(src, Seq("li_id", "l_returnflag"),
        Seq("l_extendedprice", "l_quantity")))
    proba
      .select(round(col("p_R") * 5, 0).cast("long").as("bin"),
              (col("l_returnflag") === "R").cast("long").as("hit"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("hit")).as("n_true"))
      .select(col("bin"), col("n"), col("n_true"),
              dec4(col("n_true").cast("double") / col("n")).as("actual_rate"))
      .orderBy(col("bin"))
  }

  /** A26: regression evaluation metrics (MAE/RMSE/R²) for the A9 OLS
    * fit — errors quantized to EXACT cents against the dec2-rounded
    * prediction (q_linreg's published contract), squared sums in
    * DECIMAL(38,0) (overflow-proof at any row count, the q_pca_fit
    * idiom), ONE aggregate pass; the metrics derive from the exact
    * integers with a fixed float sequence.
    */
  def qRegMetrics(s: SparkSession, dir: String): DataFrame = {
    val model = LinearRegression()
      .fit(trainLi(s, dir), Seq("l_quantity"), Seq("l_extendedprice"))
    val b0 = model.intercepts.head
    val b1 = model.coefficients.head("l_quantity")
    val predC = round(round(lit(b0) + lit(b1) * col("l_quantity"), 2) * 100, 0)
      .cast("decimal(19,0)")
    val yC = round(col("l_extendedprice") * 100, 0).cast("decimal(19,0)")
    val err = predC - yC
    lineitem(s, dir).agg(
        count(lit(1)).as("n"),
        sum(abs(err)).as("sa"),
        sum(err * err).as("ss"),
        sum(yC).as("sy"),
        sum(yC * yC).as("syy"))
      .select(
        col("n").as("n_rows"),
        dec4(col("sa").cast("double") / col("n") / 100.0).as("mae"),
        dec4(sqrt(col("ss").cast("double") / col("n")) / 100.0).as("rmse"),
        dec4(lit(1.0) - col("ss").cast("double") /
          (col("syy").cast("double") -
           col("sy").cast("double") * col("sy").cast("double") / col("n"))).as("r2"))
  }

  /** A21: categorical Naive Bayes (Laplace +1) predicting the return
    * flag from three discretized integer features. Scores are DOUBLE
    * quotients of exact integer count products (no log(): libm ulp
    * noise near argmax ties is the classic cross-engine flip) — see
    * CategoricalNB.
    */
  def qNbayes(s: SparkSession, dir: String): DataFrame = {
    def enc(df: DataFrame): DataFrame = df
      .withColumn("f1", (col("l_quantity") / 10).cast("long"))
      .withColumn("f2", round(col("l_discount") * 100, 0).cast("long"))
      .withColumn("f3", round(col("l_tax") * 100, 0).cast("long"))
    val model = CategoricalNB()
      .fit(enc(trainLi(s, dir)), Seq("f1", "f2", "f3"), "l_returnflag")
    model.predict(FeatureFrame(enc(li(s, dir)), Seq("li_id"), Seq("f1", "f2", "f3")))
      .orderBy(col("li_id"))
  }

  /** A22: one-hot encoding of the two status categoricals — fit learns
    * sorted category sets from the training slice, transform is one
    * codegen'd 0/1 indicator column per category.
    */
  def qOneHot(s: SparkSession, dir: String): DataFrame = {
    val model = OneHotEncoder(Seq("l_returnflag", "l_linestatus")).fit(trainLi(s, dir))
    model.transform(li(s, dir), Seq("li_id"))
      .orderBy(col("li_id"))
  }

  /** A7b: rank/quantile normalization (QuantileTransformer family) —
    * each row's feature maps to its normalized rank pos/(n-1) with a
    * deterministic id tie-break; exact integer arithmetic until one
    * final division, so the output is bit-identical cross-engine with
    * no rounding.
    *
    * Scale shape (the shipped plan — no single-partition window): GK
    * sketch (Sketches.quantiles) yields ~32 bucket boundaries; bucket
    * membership is a codegen'd indicator sum ("count of boundaries
    * strictly below the value"), so equal values always share a bucket
    * and buckets are value-contiguous. Exact global rank = per-bucket
    * row_number (a window PARTITIONED over the buckets — parallel)
    * plus the bucket's exact row-count offset (a 32-row aggregate).
    * The sketch only balances the partitions; the ranks stay exact, so
    * the oracle is the plain global ROW_NUMBER formulation.
    */
  def qRankNorm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nBuckets = 32
    val src = li(s, dir).select(col("li_id"), col("l_extendedprice"))
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = Sketches.quantiles(src, "l_extendedprice", probs).distinct.sorted
    val bucket = bounds
      .foldLeft(lit(0))((acc, b) => acc + (col("l_extendedprice") > lit(b)).cast("int"))
      .as("__bkt")
    val bucketed = src.select(col("li_id"), col("l_extendedprice"), bucket)
    val counts = bucketed.groupBy(col("__bkt")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    // exclusive prefix sums: global rank of a bucket's first row
    val offsets = Array.tabulate(bounds.length + 1)(b =>
      (0 until b).map(counts.getOrElse(_, 0L)).sum)
    val w = Window.partitionBy(col("__bkt")).orderBy(col("l_extendedprice"), col("li_id"))
    bucketed
      .select(col("li_id"),
        ((row_number().over(w) - 1 + element_at(lit(offsets), col("__bkt") + 1))
          .cast("double") / lit((total - 1).toDouble)).as("rank_pct"))
      .orderBy(col("li_id"))
  }

  /** A8: inverse_transform roundtrip (scale → unscale ≈ identity). */
  def qInverseStd(s: SparkSession, dir: String): DataFrame = {
    val model = StandardScaler().fit(trainLi(s, dir), scaleFeatures)
    val scaled = model.transform(FeatureFrame(li(s, dir), Seq("li_id"), scaleFeatures))
    model.inverseTransform(scaled, Seq("li_id"))
      .select(col("li_id") +: scaleFeatures.map(c => dec2(col(c)).as(c)): _*)
      .orderBy(col("li_id"))
  }

  /** A9: LinearRegression.predict — d=1 OLS via distributed normal equations. */
  def qLinReg(s: SparkSession, dir: String): DataFrame = {
    val model = LinearRegression()
      .fit(trainLi(s, dir), Seq("l_quantity"), Seq("l_extendedprice"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"), Seq("l_quantity")))
      .select(col("li_id"), dec2(col("l_extendedprice")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A10: d=2 OLS (closed-form oracle via covariances). */
  def qLinRegMulti(s: SparkSession, dir: String): DataFrame = {
    val model = LinearRegression()
      .fit(trainLi(s, dir), Seq("l_quantity", "l_discount"), Seq("l_extendedprice"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"), Seq("l_quantity", "l_discount")))
      .select(col("li_id"), dec2(col("l_extendedprice")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A57: EXACT Shapley attribution for the linear model — the
    * model-inspection step after A10's fit (sklearn/XAI intent:
    * explain each PREDICTION, not just the model): for a linear
    * model the Shapley value has a closed form, φ_j(x) = β_j·(x_j −
    * E_train[x_j]) with base value E_train[ŷ] — no sampling, no
    * approximation, which is why the linear case is the reference
    * implementation every SHAP library tests against. Publishes, for
    * the deterministic li_id % 997 sample, the base value, both
    * feature attributions and the prediction (all 2dp-rendered — the
    * A9/A10 render contract; additivity base + Σφ = ŷ holds exactly
    * pre-rounding by construction). Background distribution = the
    * TRAIN split, the standard choice. Scale shape: fit artifact +
    * two train means broadcast; the sample scan is one filter pass.
    */
  def qShapLinear(s: SparkSession, dir: String): DataFrame = {
    val train = trainLi(s, dir)
    val model = LinearRegression()
      .fit(train, Seq("l_quantity", "l_discount"), Seq("l_extendedprice"))
    val b0 = model.intercepts(0)
    val b1 = model.coefficients(0)("l_quantity")
    val b2 = model.coefficients(0)("l_discount")
    val means = train.agg(avg(col("l_quantity")).as("m1"),
                          avg(col("l_discount")).as("m2"))
    li(s, dir).filter(col("l_orderkey") % 997 === 0)
      .crossJoin(broadcast(means))
      .select(col("li_id"),
        dec2(lit(b0) + lit(b1) * col("m1") + lit(b2) * col("m2")).as("base"),
        dec2(lit(b1) * (col("l_quantity") - col("m1"))).as("phi_qty"),
        dec2(lit(b2) * (col("l_discount") - col("m2"))).as("phi_disc"),
        dec2(lit(b0) + lit(b1) * col("l_quantity")
          + lit(b2) * col("l_discount")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A11: NoData semantics — NULL + per-feature sentinel masking, skip +
    * fill (`features.py:46`, `ufunc/_base.py:51`). x1 is NULLed on
    * `l_partkey % 37 = 0` rows; x2 carries sentinel -1 on
    * `l_suppkey % 13 = 0` rows; masked rows fill with -999.
    */
  def qKnnNoData(s: SparkSession, dir: String): DataFrame = {
    val model = KNeighborsRegressor(k = 5, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_extendedprice", "l_quantity"), Seq("l_suppkey"))
    val input = li(s, dir)
      .withColumn("l_extendedprice",
        when(col("l_partkey") % 37 === 0, lit(null)).otherwise(col("l_extendedprice")))
      .withColumn("l_quantity",
        when(col("l_suppkey") % 13 === 0, lit(-1.0)).otherwise(col("l_quantity")))
    val frame = FeatureFrame(input, Seq("li_id"), Seq("l_extendedprice", "l_quantity"),
      NoData.perFeature(Map("l_quantity" -> -1.0)))
    model.predict(frame, PredictOptions(noDataOutput = -999.0))
      .select(col("li_id"), dec4(col("l_suppkey")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A12: arbitrary-estimator delegation — MLlib RandomForest wrapped in
    * the FeatureEstimator contract. The forest's splits are
    * engine-specific, so the ORACLE checks the regression-forest
    * invariant instead: every prediction is an average of leaf means of
    * training targets, hence provably inside the training-target hull
    * [min(y), max(y)]. Exact prediction behavior is spec-covered
    * (EstimatorExtrasSpec); the fully-oracled deterministic tree is
    * q_cart_reg.
    */
  def qRfReg(s: SparkSession, dir: String): DataFrame = {
    val train = trainLi(s, dir)
    val model = RandomForestRegression(numTrees = 20, maxDepth = 6, seed = 42)
      .fit(train, Seq("l_quantity", "l_discount", "l_tax"), Seq("l_extendedprice"))
    val mm = train
      .agg(min(col("l_extendedprice")).cast("double"), max(col("l_extendedprice")).cast("double"))
      .collect()(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    // hull widened by a tiny relative epsilon: forest predictions are
    // averages of leaf means, provably inside [lo, hi] in REAL
    // arithmetic, but fl(n·hi)/n can exceed hi by an ulp (e.g. a leaf
    // of all-max targets) — exact containment would flip in_hull on
    // float noise
    val eps = 1e-9 * math.max(1.0, math.max(math.abs(lo), math.abs(hi)))
    // second, permutation-sensitive invariant: a tree ensemble is a
    // deterministic function of the feature vector, so every row in a
    // duplicate-feature group must carry the SAME prediction (~5k
    // distinct triples over 60k rows — heavily grouped). A shuffle of
    // predictions across rows keeps the hull gate green but breaks
    // group-constancy almost surely.
    import org.apache.spark.sql.expressions.Window
    val input = li(s, dir)
      .withColumn("__q", col("l_quantity"))
      .withColumn("__d", col("l_discount"))
      .withColumn("__t", col("l_tax"))
    val w = Window.partitionBy(col("__q"), col("__d"), col("__t"))
    model.predict(FeatureFrame(input, Seq("li_id", "__q", "__d", "__t"),
        Seq("l_quantity", "l_discount", "l_tax")))
      .select(col("li_id"),
        (col("l_extendedprice") >= lo - eps &&
         col("l_extendedprice") <= hi + eps).cast("int").as("in_hull"),
        (max(col("l_extendedprice")).over(w) ===
         min(col("l_extendedprice")).over(w)).cast("int").as("consistent"))
      .orderBy(col("li_id"))
  }

  /** A12b: GBT delegation, same hull-invariant oracle shape as A12 with
    * a documented slack: boosting stages sum shrunken residual steps, so
    * predictions are not PROVABLY hull-bounded like forest averages —
    * the gate asserts the hull widened by 25% of the target range
    * (empirically far beyond any observed excursion at stepSize 0.1).
    */
  def qGbtReg(s: SparkSession, dir: String): DataFrame = {
    val train = trainLi(s, dir)
    // 10 boosting rounds: the gate's contract is the invariant pair
    // (hull containment + feature-group constancy), which holds for ANY
    // trained ensemble — 10 rounds exercise the identical MLlib
    // machinery at half the per-call training cost (the model is
    // re-fit on every gate run; the oracle pins flags, not predictions)
    val model = GBTRegression(maxIter = 10, maxDepth = 4, seed = 42)
      .fit(train, Seq("l_quantity", "l_discount", "l_tax"), Seq("l_extendedprice"))
    val mm = train
      .agg(min(col("l_extendedprice")).cast("double"), max(col("l_extendedprice")).cast("double"))
      .collect()(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val slack = 0.25 * (hi - lo)
    // same permutation-sensitive group-constancy invariant as qRfReg
    import org.apache.spark.sql.expressions.Window
    val input = li(s, dir)
      .withColumn("__q", col("l_quantity"))
      .withColumn("__d", col("l_discount"))
      .withColumn("__t", col("l_tax"))
    val w = Window.partitionBy(col("__q"), col("__d"), col("__t"))
    model.predict(FeatureFrame(input, Seq("li_id", "__q", "__d", "__t"),
        Seq("l_quantity", "l_discount", "l_tax")))
      .select(col("li_id"),
        (col("l_extendedprice") >= lo - slack &&
         col("l_extendedprice") <= hi + slack).cast("int").as("in_hull"),
        (max(col("l_extendedprice")).over(w) ===
         min(col("l_extendedprice")).over(w)).cast("int").as("consistent"))
      .orderBy(col("li_id"))
  }

  /** A12d: one exact gradient-boosting stage (Boosting.scala) — the
    * depth-1 residual tree is closed-form (variance reduction is
    * shift-invariant, so the residual split is the best depth-1 split
    * on y and F1 = (1−lr)·mean + lr·leafMean), which makes this the
    * fully VALUE-oracled boosting query next to the invariant-gated
    * MLlib ensemble (A12b). The oracle re-runs the exact-HUGEINT split
    * search (the q_cart_reg block) and combines the leaf means with the
    * identical float op sequence.
    */
  def qGbtStage1(s: SparkSession, dir: String): DataFrame = {
    val model = GradientBoostStage1(learningRate = 0.5, targetScale = 100.0,
        orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_quantity", "l_discount", "l_tax"), Seq("l_extendedprice"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"),
        Seq("l_quantity", "l_discount", "l_tax")))
      .select(col("li_id"), dec4(col("l_extendedprice")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A12e: TWO exact boosting stages (Boosting.GradientBoostTwoStage) —
    * stage-1 predictions quantized to integer cents (q = ⌊100·F1 + ½⌋,
    * a shared float op sequence) so the stage-2 residual targets
    * t = y − q(side) are small exact Longs BOUNDED BY THE DATA RANGE at
    * any train-set size (the r10 cleared-denominator form was cubic in
    * n and hit its Long guard at sf1's n = 12,073). The oracle re-runs
    * BOTH exact-HUGEINT split searches (stage 2 over the identical
    * quantized residuals) and combines the four leaf constants with the
    * shared float op sequence.
    */
  def qGbtStage2(s: SparkSession, dir: String): DataFrame = {
    val model = GradientBoostTwoStage(targetScale = 100.0, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_quantity", "l_discount", "l_tax"), Seq("l_extendedprice"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"),
        Seq("l_quantity", "l_discount", "l_tax")))
      .select(col("li_id"), dec4(col("l_extendedprice")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A12c: deterministic CART regression tree (depth 2, exact-integer
    * split search — Cart.scala) with the splits REPLICATED in SQL: the
    * oracle re-runs the variance-reduction search per node via window
    * prefix sums and exact HUGEINT gain comparisons, then routes every
    * row through the discovered thresholds. This is the fully-oracled
    * tree estimator the engine-specific MLlib forest (A12) cannot be.
    */
  def qCartReg(s: SparkSession, dir: String): DataFrame = {
    val model = CartRegression(maxDepth = 2, targetScale = 100.0, orderBy = trainOrder)
      .fit(trainLi(s, dir), Seq("l_quantity", "l_discount", "l_tax"), Seq("l_extendedprice"))
    // the SQL oracle unrolls a FULL depth-2 tree; a degenerate fit must
    // fail loudly, not hash-mismatch
    model.root match {
      case CartSplit(_, _, _: CartSplit, _: CartSplit) => ()
      case _ => throw new IllegalStateException(
        s"q_cart_reg needs a full depth-2 tree, got ${model.describe}")
    }
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"),
        Seq("l_quantity", "l_discount", "l_tax")))
      .select(col("li_id"), dec4(col("l_extendedprice")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** A13: PCA transform — distributed moment aggregation + driver
    * eigensolve (PCA.scala), codegen'd projection. d = 2 features with
    * var(l_quantity) >> var(l_discount), so the symmetric 2x2
    * eigendecomposition has a guaranteed eigenvalue gap and the oracle
    * can rebuild components in closed form (quadratic-formula
    * eigenvalues; eigenvectors from the cancellation-free rows
    * (l1-b, c) / (c, l2-a); sklearn-style largest-|loading|-positive
    * sign fix). Engine eigensolvers agree to ~1e-13, absorbed by dec4.
    */
  def qPca(s: SparkSession, dir: String): DataFrame = {
    val pcaFeatures = Seq("l_quantity", "l_discount")
    val model = PCA(k = 2).fit(trainLi(s, dir), pcaFeatures)
    model.transform(FeatureFrame(li(s, dir), Seq("li_id"), pcaFeatures))
      .select(col("li_id"), dec4(col("pc1")).as("pc1"), dec4(col("pc2")).as("pc2"))
      .orderBy(col("li_id"))
  }

  /** A13c: PCA inverse_transform roundtrip — transform to the FULL
    * component basis (k = d) then reconstruct: x̂ = mean + Σ pc_j v_j
    * recovers x up to float epsilon, so dec4(x̂) equals the dec4'd
    * ORIGINAL features and the oracle is the identity projection —
    * any sign, ordering, or transpose bug in the component handling
    * breaks the roundtrip loudly.
    */
  def qPcaInverse(s: SparkSession, dir: String): DataFrame = {
    val pcaFeatures = Seq("l_quantity", "l_discount")
    val model = PCA(k = 2).fit(trainLi(s, dir), pcaFeatures)
    val scores = model.transform(FeatureFrame(li(s, dir), Seq("li_id"), pcaFeatures))
    model.inverseTransform(scores, Seq("li_id"))
      .select(col("li_id") +: pcaFeatures.map(c => dec4(col(c)).as(c)): _*)
      .orderBy(col("li_id"))
  }

  /** A13b: the PCA FIT pass oracled EXACTLY — the same second-moment
    * aggregate PCA.fit runs (PCA.scala:26), in integer cents so every
    * sufficient statistic (n, Σx_i, Σx_i·x_j) is an exact integer on
    * both engines, plus the derived covariance entries computed from
    * those integers with an identical float op sequence (bit-identical
    * cross-engine). At 100 TB this one aggregate IS the fit.
    */
  def qPcaFit(s: SparkSession, dir: String): DataFrame = {
    // moments accumulate as DECIMAL(38,0), not LongType: at the 100 TB
    // posture Σx² ~ (1e7 cents)² × billions of rows overflows a Long
    // (which Spark wraps SILENTLY under non-ANSI), while the DuckDB
    // side sums in HUGEINT — decimal keeps the "exact integer on both
    // engines" contract at any scale. Cell strings still compare equal
    // ('123' either way), and covariances cast decimal→double exactly
    // like the oracle's HUGEINT→DOUBLE.
    val t = trainLi(s, dir).select(
      col("l_quantity").cast("decimal(19,0)").as("x1"),
      round(col("l_extendedprice") * 100, 0).cast("decimal(19,0)").as("x2"),
      round(col("l_discount") * 100, 0).cast("decimal(19,0)").as("x3"))
    def dsum(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val agg = t.agg(
      count(lit(1)).as("n"),
      dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"), dsum(col("x3")).as("s3"),
      dsum(col("x1") * col("x1")).as("s11"), dsum(col("x1") * col("x2")).as("s12"),
      dsum(col("x1") * col("x3")).as("s13"), dsum(col("x2") * col("x2")).as("s22"),
      dsum(col("x2") * col("x3")).as("s23"), dsum(col("x3") * col("x3")).as("s33"))
    def cov(sij: String, si: String, sj: String): Column =
      col(sij).cast("double") / col("n").cast("double") -
        (col(si).cast("double") / col("n").cast("double")) *
        (col(sj).cast("double") / col("n").cast("double"))
    agg.select(col("n"), col("s1"), col("s2"), col("s3"),
      col("s11"), col("s12"), col("s13"), col("s22"), col("s23"), col("s33"),
      cov("s11", "s1", "s1").as("cov11"), cov("s12", "s1", "s2").as("cov12"),
      cov("s13", "s1", "s3").as("cov13"), cov("s22", "s2", "s2").as("cov22"),
      cov("s23", "s2", "s3").as("cov23"), cov("s33", "s3", "s3").as("cov33"))
  }

  /** A18: pipeline composition (reference transform-of-Pipelines,
    * `estimator.py:523`) — StandardScaler -> kNN regression fitted and
    * applied as ONE model (Pipeline.scala). The oracle scales both sides
    * with the train statistics and runs the kNN in scaled space with the
    * identical subtraction order.
    */
  def qPipeline(s: SparkSession, dir: String): DataFrame = {
    // exact-integer scaler fit (cents trick): mean/std derive from
    // DECIMAL(38,0) moment sums, so they are bit-identical to the
    // oracle's HUGEINT derivation and the downstream kNN ranking in
    // scaled space cannot flip on a last-ulp stat difference
    val pipe = FeaturePipeline(
      Seq(StandardScaler(exactScales = Map("l_extendedprice" -> 100.0, "l_quantity" -> 1.0))),
      KNeighborsRegressor(k = 5, orderBy = trainOrder))
    val model = pipe.fit(trainLi(s, dir), Seq("l_extendedprice", "l_quantity"), Seq("l_discount"))
    model.predict(FeatureFrame(li(s, dir), Seq("li_id"), Seq("l_extendedprice", "l_quantity")))
      .select(col("li_id"), dec4(col("l_discount")).as("prediction"))
      .orderBy(col("li_id"))
  }

  /** One CART node's split search in SQL: per feature, sort by
    * (value, tid), window prefix sums of the integer target, candidate
    * thresholds at distinct-value boundaries, gain compared EXACTLY via
    * (n·S_L − n_L·S)² / (n_L·n_R) cross-multiplied in HUGEINT — the
    * mirror of CartModel.bestSplit's BigInt comparison. `src` must have
    * columns (tid, f0, f1, f2, y).
    */
  private def cartSplitBlock(src: String, name: String): String = {
    val perFeature = (0 until 3).map { i =>
      s"""SELECT $i AS fidx, fv, nfv, sl, nl, s, n FROM (
         |      SELECT CAST(f$i AS DOUBLE) AS fv,
         |        LEAD(CAST(f$i AS DOUBLE)) OVER (ORDER BY f$i, tid) AS nfv,
         |        SUM(y) OVER (ORDER BY f$i, tid ROWS UNBOUNDED PRECEDING) AS sl,
         |        ROW_NUMBER() OVER (ORDER BY f$i, tid) AS nl,
         |        SUM(y) OVER () AS s, COUNT(*) OVER () AS n
         |      FROM $src)""".stripMargin
    }.mkString("\n    UNION ALL\n    ")
    s"""${name}_cand AS (
       |  SELECT fidx, thr, diff*diff AS a, CAST(nl AS HUGEINT)*(n-nl) AS b FROM (
       |    SELECT fidx, (fv+nfv)/2 AS thr,
       |      CAST(n AS HUGEINT)*sl - CAST(nl AS HUGEINT)*s AS diff, nl, n
       |    FROM ($perFeature)
       |    WHERE nfv IS NOT NULL AND fv < nfv)),
       |${name}_best AS (
       |  SELECT c1.fidx, c1.thr FROM ${name}_cand c1
       |  WHERE NOT EXISTS (SELECT 1 FROM ${name}_cand c2
       |    WHERE c2.a*c1.b > c1.a*c2.b
       |       OR (c2.a*c1.b = c1.a*c2.b AND (c2.fidx < c1.fidx
       |            OR (c2.fidx = c1.fidx AND c2.thr < c1.thr)))))""".stripMargin
  }

  /** Route a row through a fitted node: feature value by the node's
    * discovered feature index.
    */
  private def cartFv(bestAlias: String, f0: String, f1: String, f2: String): String =
    s"(CASE $bestAlias.fidx WHEN 0 THEN CAST($f0 AS DOUBLE) " +
      s"WHEN 1 THEN CAST($f1 AS DOUBLE) ELSE CAST($f2 AS DOUBLE) END)"

  /** A28: focal (3×3 moving-window) raster mean with NoData handling —
    * the neighborhood primitive of the reference's raster domain
    * (focal statistics are what raster pipelines run before/after
    * per-pixel estimators): for every cell of the
    * [[graft.sources.Synthetic.rasterGrid]] fixture, the mean of the
    * valid (in-grid, non-NoData) cells in its 3×3 window, plus the
    * contributing count. Spark-first shape: 2D windows don't exist in
    * SQL window functions, so this is SHIFT-AND-AGGREGATE — each cell
    * emits itself to its ≤9 target windows (an explode of the constant
    * offset array, pure codegen), then ONE map-side-combinable
    * (x, y)-key aggregate. At 100 TB this beats per-block halo
    * exchange in simplicity and equals it in shuffle volume (9× cell
    * count, combiner-collapsed); NoData cells contribute nothing but
    * still RECEIVE a window (vcnt = 0 → NULL mean, the
    * check_output_for_nodata contract from A15). Integer cell values
    * make (vsum, vcnt) engine-exact; the published mean is their
    * quotient.
    */
  def qFocalMean(s: SparkSession, dir: String): DataFrame = {
    val w = 120L
    val h = 80L
    val g = graft.sources.Synthetic.rasterGrid(s, w, h)
    val offs = array((for (dx <- -1 to 1; dy <- -1 to 1) yield
      struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    g.select(col("x"), col("y"), col("v"), explode(offs).as("o"))
      .select((col("x") + col("o.dx")).as("tx"),
              (col("y") + col("o.dy")).as("ty"), col("v"))
      .filter(col("tx") >= 0 && col("tx") < w && col("ty") >= 0 && col("ty") < h)
      .groupBy(col("tx"), col("ty"))
      .agg(sum(col("v")).as("vsum"), count(col("v")).as("vcnt"))
      .select(col("tx").as("x"), col("ty").as("y"), col("vsum"), col("vcnt"),
              dec4(col("vsum").cast("double") / col("vcnt")).as("focal_mean"))
      .orderBy(col("x"), col("y"))
  }

  /** A29: zonal statistics — the other raster-domain reduction
    * (complement of A28's focal window): per-zone count / valid-count /
    * sum / min / max / mean of cell values, where the zone layer is a
    * second categorical raster (here 8×8-block regions hashed to 6 zone
    * ids — the shape of a land-cover class raster over the value band).
    * Spark-first shape: the zone id is a pure codegen expression on the
    * cell coordinates (in a real pipeline it is a second column of the
    * same cell table — NO join, rasters of identical geometry are
    * stored aligned), so the whole query is ONE map-side-combinable
    * aggregate keyed by the tiny zone domain; NoData cells count toward
    * n_cells but contribute nothing else (the A15 masking contract).
    * Integer cell values make every statistic engine-exact; the mean is
    * the published quotient. At 100 TB: a 6-key (or any
    * domain-bounded) aggregate over an arbitrarily large grid is the
    * best possible plan — partial aggregation collapses each task to
    * |zones| rows before the exchange.
    */
  /** The A29 kernel: zone assignment + the zonal aggregate as a plain
    * DataFrame transform — every statistic is associative, so the SAME
    * expressions attach unchanged to a streaming cell/tile source
    * (F23: Update-mode incremental zonal stats as tiles arrive).
    */
  def zonalStats(cells: DataFrame): DataFrame = {
    val blockKey = concat(lit("zone|"), expr("x div 8").cast("string"),
                          lit(","), expr("y div 8").cast("string"))
    cells.withColumn("zone", TF.hexPrefix52(blockKey) % 6)
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
           sum(col("v")).as("vsum"), min(col("v")).as("vmin"),
           max(col("v")).as("vmax"))
      .select(col("zone"), col("n_cells"), col("n_valid"), col("vsum"),
              col("vmin"), col("vmax"),
              dec4(col("vsum").cast("double") / col("n_valid")).as("zonal_mean"))
  }

  def qZonal(s: SparkSession, dir: String): DataFrame =
    zonalStats(graft.sources.Synthetic.rasterGrid(s, 120L, 80L))
      .orderBy(col("zone"))

  /** A30: raster resample / overview build — 2×2 block-mean downsample
    * (the pyramid level-1 primitive every raster store materializes
    * before serving): cells group by their (x div 2, y div 2) target
    * cell, NoData-aware exact (vsum, vcnt) per block, mean NULL when
    * all four source cells are NoData (vsum is NULL ⇒ the quotient is
    * NULL — the A28 convention). Spark-first shape: no explode at all —
    * the block key is pure integer codegen and the single aggregate is
    * map-side-combinable with dense integer keys, so the downsample is
    * one shuffle of at most |target grid| rows regardless of source
    * size; chaining it k times builds the whole pyramid in k such
    * passes.
    */
  def qResample(s: SparkSession, dir: String): DataFrame = {
    val g = graft.sources.Synthetic.rasterGrid(s, 120L, 80L)
    g.groupBy(expr("x div 2").as("rx"), expr("y div 2").as("ry"))
      .agg(sum(col("v")).as("vsum"), count(col("v")).as("vcnt"))
      .select(col("rx"), col("ry"), col("vsum"), col("vcnt"),
              dec4(col("vsum").cast("double") / col("vcnt")).as("mean_v"))
      .orderBy(col("rx"), col("ry"))
  }

  /** A34: LOCAL map algebra — the cell-wise member of the raster-op
    * taxonomy (local / focal A28 / zonal A29 / resample A30): a
    * normalized-difference index (the NDVI shape) over two aligned
    * bands of the same grid, (a−b)/(a+b) published as exact integer
    * PPM. Aligned rasters are COLUMNS of one cell table — band b is
    * another codegen formula on the same rows, so the whole op is
    * per-row codegen with ZERO shuffle, the cheapest possible 100 TB
    * plan. NoData in either band (or a+b = 0) → NULL (A15). The
    * integral division runs on a NON-NEGATIVE numerator with the sign
    * split out, because Spark's `div` truncates toward zero while
    * DuckDB's `//` floors — identical only when the numerator is
    * non-negative.
    */
  def qMapAlgebra(s: SparkSession, dir: String): DataFrame = {
    val g = graft.sources.Synthetic.rasterGrid(s, 120L, 80L)
    val hb = TF.hexPrefix52(concat(lit("ras2|"), col("x").cast("string"),
                                   lit(","), col("y").cast("string")))
    g.withColumn("b", when(hb % 23 === 0, lit(null).cast("long"))
                        .otherwise(hb % 1000))
      .select(col("x"), col("y"), col("v").as("a"), col("b"),
        when(col("v").isNull || col("b").isNull || (col("v") + col("b")) === 0,
             lit(null).cast("long"))
          .otherwise(
            (when(col("v") >= col("b"), lit(1L)).otherwise(lit(-1L))) *
            expr("(abs(v - b) * 1000000) div (v + b)")).as("nd_ppm"))
      .orderBy(col("x"), col("y"))
  }

  /** A35: GLOBAL raster statistics — the whole-grid reduction closing
    * the taxonomy (local A34 / focal A28 / zonal A29 / global /
    * resample A30): n, valid count, min/max/sum and the exact-quotient
    * mean in one partial-aggregated pass, NoData-aware. The 100 TB
    * plan is the one Spark already picks: map-side combine to a
    * single row per task, one tiny final merge.
    */
  def qRasterGlobal(s: SparkSession, dir: String): DataFrame =
    graft.sources.Synthetic.rasterGrid(s, 120L, 80L)
      .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
           sum(col("v")).as("vsum"), min(col("v")).as("vmin"),
           max(col("v")).as("vmax"))
      .select(col("n_cells"), col("n_valid"), col("vsum"), col("vmin"),
              col("vmax"),
              dec4(col("vsum").cast("double") / col("n_valid")).as("mean_v"))

  /** A59: THE canonical reference workload end-to-end at raster scale —
    * the README/tutorial pipeline the reference exists for
    * (estimator.py:119 fit-small / predict-big over
    * datasets/_base.py:108-110): fit a kNN model on the 240 packaged
    * ecoplot plots (through the A19 loader surface), `kneighbors` every
    * pixel of the large-raster variant (2048×4096 = 8,388,608 pixels),
    * impute the three tree-cover targets as the mean of the 5 neighbor
    * plots' covers, and reduce to 64 zonal band summaries so the output
    * is an oracle-checkable 64-row aggregate.
    *
    * Spark-first / 100 TB shape: the 240-plot model is a broadcast
    * KnnState scanned by the codegen'd [[KnnScanExpr]] — one pass over
    * the pixel frame, NO shuffle on the big side, per-pixel cost
    * m·d = 1,440 mult-adds; the engine path is strictly per-pixel (it
    * never peeks at the mosaic's profile structure — only the ORACLE
    * exploits it, see [[graft.sources.Datasets.EcoplotMosaicCells]]).
    * NoData pixels (~1/37) flow the A15 mask contract: neighbor id −1,
    * excluded from the zonal means but counted in n_px. Exactness:
    * neighbor IDS are integers; covers quantize ×10 to integers at fit
    * time, so zone sums are exact and the published mean is a single
    * identically-formed quotient per engine.
    */
  def qImputeMap(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Datasets
    val (x, y, _) = Datasets.loadEcoplotSample(s)
    val feats = Datasets.EcoplotFeatures
    val model = KNeighborsRegressor(k = 5, orderBy = Seq("plot_id"))
      .fit(x.join(y, Seq("plot_id")), feats, Nil)
    // bounded fit artifact: 240 plot covers, deci-units (×10 exact)
    val covs = y.orderBy("plot_id").collect()
    def deciCol(i: Int): Array[Long] = covs.map(r => math.round(r.getDouble(i) * 10))
    val Seq(t1, t2, t3) = Seq(1, 2, 3).map(deciCol)
    val nn = model.kneighbors(
      FeatureFrame(Datasets.ecoplotMosaic(s), Seq("sample_id"), feats),
      returnDistance = false)
    val valid = col("neighbor0") =!= -1L
    def predSum(t: Array[Long]): Column =
      when(valid,
        (0 until 5).map(i => element_at(lit(t), col(s"neighbor$i").cast("int") + 1))
          .reduce(_ + _))
    nn.withColumn("zone", expr("sample_id div 131072"))
      .withColumn("s1", predSum(t1)).withColumn("s2", predSum(t2))
      .withColumn("s3", predSum(t3))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_px"), count(col("s1")).as("n_valid"),
           sum(col("s1")).as("ss1"), sum(col("s2")).as("ss2"),
           sum(col("s3")).as("ss3"))
      .select(col("zone"), col("n_px"), col("n_valid"),
        dec4(col("ss1").cast("double") / (col("n_valid").cast("double") * 50.0)).as("mean_psme"),
        dec4(col("ss2").cast("double") / (col("n_valid").cast("double") * 50.0)).as("mean_pila"),
        dec4(col("ss3").cast("double") / (col("n_valid").cast("double") * 50.0)).as("mean_abco"))
      .orderBy(col("zone"))
  }

  /** G1 (query-backed since r9): per-row raster statistics read THROUGH
    * the custom DataSource V2 [[graft.sources.v2.RasterSource]] — the
    * gate-level proof that the engine-extension source path works
    * end-to-end, not only under DataSourceV2Spec: the y-range filter is
    * pushed into stripe planning (pruned stripes never run), the (y, v)
    * projection reaches the reader (x is never emitted), and the oracle
    * recomputes the same md5 cell formula without ever touching the
    * source. Same aggregate shape as A29/A35: one map-side-combinable
    * domain-bounded pass.
    */
  def qRasterSource(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.RasterSource")
      .option("w", 120).option("h", 80).load()
      .filter(col("y") >= 20 && col("y") <= 59)
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
           sum(col("v")).as("vsum"), min(col("v")).as("vmin"),
           max(col("v")).as("vmax"))
      .orderBy(col("y"))

  /** G15 (query-backed): the MODERN V2 predicate path
    * (`SupportsPushDownV2Filters`) machine-checked through the driver
    * gate — the q_skew_plan_bounds literal-flags pattern: the gate
    * probes the planned BatchScan of the filtered frame (the scan
    * description publishes the planned stripe range) and asserts
    * (a) BOTH y comparisons clamped the range to [40,59] via
    * `pushPredicates` (the trait's presence routes Spark away from the
    * V1 pushFilters path entirely) and (b) an x predicate the source
    * cannot translate leaves the range WHOLE — accepting it would be
    * wrong-results, not just wasted work. It then publishes the
    * clamped band's per-y statistics, which the oracle recomputes from
    * the md5 cell formula with the flags pinned at 1: the probe is
    * honest (the actual executed plan's scan), the values prove the
    * residual-check contract (pruning skips work, never changes
    * results).
    */
  def qV2Pushdown(s: SparkSession, dir: String): DataFrame = {
    def v2() = s.read.format("graft.sources.v2.RasterSource")
      .option("w", 120).option("h", 80).load()
    def scanDesc(df: DataFrame): String =
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.getOrElse("")
    val filtered = v2().filter(col("y") >= 40 && col("y") < 60)
    val clamped = scanDesc(filtered).contains("yRange=[40,59]")
    val xWhole = scanDesc(v2().filter(col("x") < 10))
      .contains("yRange=[0,79]")
    filtered.groupBy(col("y"))
      .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
           sum(col("v")).as("vsum"))
      .select(col("y"), col("n_cells"), col("n_valid"), col("vsum"),
        lit(if (clamped) 1L else 0L).as("v2_clamped"),
        lit(if (xWhole) 1L else 0L).as("untranslatable_whole"))
      .orderBy(col("y"))
  }

  /** G3 (query-backed): TopN pushdown through the DataSource V2 source
    * (`SupportsPushDownTopN`): ORDER BY y DESC, x DESC LIMIT 300 plans
    * ONLY the last ceil(300/120)=3 grid rows — the scan never
    * generates the other 77 (at 100 TB: a time-ordered store answers
    * "latest N" reading one tail stripe, the storage-side TopK posture
    * of Iceberg/Delta file-ordering + JDBC TopN pushdown). Sound under
    * the secondary x key because stripes hold FULL grid rows; Spark
    * re-sorts and re-limits (partial pushdown — pruning never decides
    * correctness). The oracle recomputes the md5 formula over the
    * whole grid and takes the same top-300, blind to the pushdown;
    * DataSourceV2Spec locks that the planned range really tightened.
    */
  def qRasterTopK(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.RasterSource")
      .option("w", 120).option("h", 80).load()
      .orderBy(col("y").desc, col("x").desc)
      .limit(300)

  /** G5 (query-backed): band statistics computed THROUGH the custom
    * source's MICRO-BATCH streaming read path
    * ([[graft.sources.v2.RasterMicroBatchStream]]) — the gate-level
    * proof that the extension pillar's STREAMING third works end to
    * end: Trigger.AvailableNow drains the grid in rowsPerBatch-rate-
    * limited micro-batches (source-side admission control, the
    * maxOffsetsPerTrigger posture), the streaming aggregate folds
    * them incrementally in the state store, and the final Complete-
    * mode emission must equal the all-at-once batch answer — which is
    * exactly what the oracle computes, blind to the streaming
    * machinery, from the md5 cell formula. A lost batch, an off-by-one
    * offset range, or a double-planned stripe shows up as a value
    * mismatch here.
    */
  def qRasterStream(s: SparkSession, dir: String): DataFrame =
    // r15 optimization: the streaming aggregate ran at the session's 32
    // shuffle partitions — 32 state-store open/commit cycles per
    // micro-batch for a 5-band state. Run the gate under the SAME
    // 8-partition stateful scope every StreamingGates gate uses
    // (r16: via the shared graft.core.StreamScope, ADVICE r15 —
    // the set/restore logic was an inlined duplicate here).
    graft.core.StreamScope.withStreamPartitions(s) {
      val name = "raster_stream_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.format("graft.sources.v2.RasterSource")
        .option("w", 120).option("h", 80).option("rowsPerBatch", 16).load()
        .groupBy(expr("y div 16").as("band"))
        .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
             sum(col("v")).as("vsum"), min(col("v")).as("vmin"),
             max(col("v")).as("vmax"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).orderBy(col("band"))
    }

  /** G7 (query-backed): dimension-join DYNAMIC pruning through the
    * custom source ([[graft.sources.v2.RasterScan]]'s
    * `SupportsRuntimeFiltering`): the selective region-derived
    * dimension broadcasts, Spark re-plans the raster scan AT EXECUTION
    * TIME with the join-derived In(y) filter, and the stripe planner
    * shrinks to exactly the surviving grid rows (4 single-row stripes
    * instead of 8 range stripes — DataSourceV2Spec locks the
    * mechanism; this query gates the VALUES under it). The oracle
    * recomputes from the md5 formula with a plain IN list, blind to
    * pruning — which is exactly the point: runtime filters are not
    * re-checked by Spark, so a wrong prune here is a wrong answer.
    */
  def qRasterDpp(s: SparkSession, dir: String): DataFrame = {
    val dim = region(s, dir).filter(col("r_regionkey") < 4)
      .select((col("r_regionkey") * 19 + 3).cast("long").as("dy"))
    s.read.format("graft.sources.v2.RasterSource")
      .option("w", 120).option("h", 80).load()
      .join(dim, col("y") === col("dy"))
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
           sum(col("v")).as("vsum"), min(col("v")).as("vmin"),
           max(col("v")).as("vmax"))
      .orderBy(col("y"))
  }

  /** G6 (query-backed): the full STREAMING extension path chained end
    * to end — the G5 micro-batch raster SOURCE feeding the G6
    * streaming stats SINK ([[graft.sources.v2.StatsStreamingWrite]]):
    * Trigger.AvailableNow drains the grid in 5 rate-limited epochs
    * (16 rows × 120 cells each), every epoch runs Spark's two-phase
    * commit (task partials → idempotent per-epoch driver publish),
    * and the query republishes the cross-epoch merge + epoch count.
    * The oracle recomputes the identical statistics from the md5 cell
    * formula, blind to source, sink, offsets and epochs — a lost
    * epoch, a double-committed retry, or a partial that leaked past
    * an abort shows up as a value mismatch.
    */
  def qStatsStreamSink(s: SparkSession, dir: String): DataFrame = {
    val key = java.util.UUID.randomUUID().toString
    val q = s.readStream.format("graft.sources.v2.RasterSource")
      .option("w", 120).option("h", 80).option("rowsPerBatch", 16).load()
      .filter(col("v").isNotNull).select(col("v"))
      .writeStream.format("graft.sources.v2.StatsSink").option("key", key)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("g6gate").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val (nEpochs, st) = graft.sources.v2.StatsSink.streamCommitted(key).get
    s.range(1).select(lit(nEpochs).as("n_epochs"), lit(st.n).as("n_valid"),
      lit(st.sum).as("vsum"), lit(st.min).as("vmin"), lit(st.max).as("vmax"))
  }

  /** G4 (query-backed): the custom DataSource V2 batch SINK
    * ([[graft.sources.v2.StatsSink]]) driven end-to-end through the
    * gate — the write runs Spark's full two-phase commit (per-task
    * exact partials in `WriterCommitMessage`s, driver-side merge in
    * `BatchWrite.commit`), and the query republishes the committed
    * statistics; the oracle recomputes them straight from the table,
    * blind to the write path. A wrong merge, a lost task partial, or
    * a double-counted speculative task shows up as a value mismatch.
    */
  def qStatsSink(s: SparkSession, dir: String): DataFrame = {
    val key = java.util.UUID.randomUUID().toString
    lineitem(s, dir).select(col("l_quantity").cast("long").as("v"))
      .write.format("graft.sources.v2.StatsSink").option("key", key)
      .mode("append").save()
    val st = graft.sources.v2.StatsSink.committed(key).get
    s.range(1).select(lit(st.n).as("n_rows"), lit(st.sum).as("vsum"),
      lit(st.min).as("vmin"), lit(st.max).as("vmax"))
  }

  /** G11 (query-backed): the write-side data LAYOUT contract
    * ([[graft.sources.v2.ClusteredSink]] —
    * `RequiresDistributionAndOrdering`, Iceberg write-distribution /
    * Delta clustered-write shape) driven through the gate: the sink
    * DEMANDS rows arrive clustered by k across exactly 4 tasks and
    * (k, v)-sorted within each; Spark plans the exchange + sort in
    * front of the writer, task writers ASSERT the arrival order and
    * report per-task key sets + exact stats, and the driver commit
    * asserts pairwise key-set disjointness. The query publishes the
    * verified report; the oracle recomputes the row/key/sum stats
    * straight from parquet and pins the contract flags at 1 — a
    * missing exchange (order violation), a lost task partial, or a
    * double-counted speculative task all surface as value mismatches.
    */
  def qClusteredWrite(s: SparkSession, dir: String): DataFrame = {
    val key = java.util.UUID.randomUUID().toString
    lineitem(s, dir)
      .select(col("l_quantity").cast("long").as("k"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("v"))
      .write.format("graft.sources.v2.ClusteredSink").option("key", key)
      .mode("append").save()
    val r = graft.sources.v2.ClusteredSink.committed(key).get
    s.range(1).select(lit(r.nTasks).as("n_tasks"), lit(r.nRows).as("n_rows"),
      lit(r.nKeys).as("n_keys"), lit(r.sumV).as("sum_v"),
      lit(if (r.allSorted) 1 else 0).as("all_sorted"),
      lit(if (r.disjoint) 1 else 0).as("keysets_disjoint"))
  }

  /** G10 (query-backed): the `_stripe` METADATA COLUMN driven through
    * the driver gate — the `_metadata.file_path`/Iceberg-`_file`
    * per-row provenance facility on the custom V2 source. The query
    * first asserts the by-name contract engine-side (`_stripe` in the
    * default schema would violate the Spark metadata-column contract —
    * refuse loudly), then selects it BY NAME under a pushed y-range
    * filter and aggregates cells per producing stripe. The oracle
    * re-derives the provenance from the PLANNING MATH alone — stripe
    * start = yMin + ((y − yMin) div (rows/8))·(rows/8) over the pushed
    * 48-row range — plus the md5 cell formula, blind to the source:
    * filter-tightened stripe planning, the shared reader's metadata
    * emission, and column pruning must compose exactly or cells land
    * in the wrong stripe group and the hash gate fails.
    */
  def qStripeMeta(s: SparkSession, dir: String): DataFrame = {
    val r = s.read.format("graft.sources.v2.RasterSource")
      .option("w", 120).option("h", 80).load()
    require(!r.schema.fieldNames.contains("_stripe"),
      "_stripe must stay hidden from the default schema (metadata-column contract)")
    r.filter(col("y") >= 16 && col("y") <= 63)
      .select(col("y"), col("v"), col("_stripe"))
      .groupBy(col("_stripe"))
      .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
           sum(col("v")).as("vsum"),
           min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy(col("_stripe"))
  }

  /** G14 (query-backed): the ordering REPORT (`SupportsReportOrdering`)
    * promoted to the gate the way G11 was — verified, not trusted, in
    * both directions. The main arm reads the (y, x)-reported scan under
    * `sortWithinPartitions(y, x)` and (a) PLAN-LOCKS the elision — the
    * executed plan must contain zero SortExec, because the report
    * satisfies the requirement — while (b) a mapPartitions pass
    * re-checks that rows REALLY arrive (y, x)-ascending per partition
    * (order_violations must be 0: a source that reports an ordering it
    * doesn't deliver is wrong results waiting to happen) and folds
    * n/Σv per partition in the same pass. Two control arms pin the
    * honest scoping: a global ORDER BY must KEEP its sort (per-
    * partition order cannot satisfy OrderedDistribution), and an
    * x-only projection must keep its local sort (x restarts every grid
    * row — the scan must claim nothing). The oracle recomputes n/Σv
    * from the md5 formula and pins all three plan flags + the
    * violation count.
    */
  def qOrderedScan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.execution.{SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    def sorts(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => sorts(a.executedPlan)
      case q: QueryStageExec        => sorts(q.plan)
      case s: SortExec              => 1 + s.children.map(sorts).sum
      case other                    => other.children.map(sorts).sum
    }
    def v2() = s.read.format("graft.sources.v2.RasterSource")
      .option("w", 120).option("h", 80).load()
    val partSchema = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("vsum", LongType, nullable = false),
      StructField("viol", LongType, nullable = false)))
    val perPart = v2().filter(col("y") >= 8 && col("y") <= 71)
      .select(col("x"), col("y"), col("v"))
      .sortWithinPartitions(col("y"), col("x"))
      .mapPartitions { it =>
        var n = 0L; var vs = 0L; var bad = 0L
        var py = Long.MinValue; var px = Long.MinValue
        it.foreach { row =>
          val x = row.getLong(0); val y = row.getLong(1)
          if (y < py || (y == py && x < px)) bad += 1
          py = y; px = x
          n += 1
          if (!row.isNullAt(2)) vs += row.getLong(2)
        }
        Iterator(Row(n, vs, bad))
      }(org.apache.spark.sql.Encoders.row(partSchema))
    val verified = perPart.agg(sum(col("n")).as("n"), sum(col("vsum")).as("vs"),
                               sum(col("viol")).as("viol"))
    val vRow = verified.collect()(0)
    val localElided = sorts(verified.queryExecution.executedPlan) == 0
    val global = v2().filter(col("y") >= 8 && col("y") <= 71).orderBy(col("y"), col("x"))
    global.collect()
    val globalKept = sorts(global.queryExecution.executedPlan) >= 1
    val xOnly = v2().select(col("x"), col("v")).sortWithinPartitions(col("x"))
    xOnly.collect()
    val xSortKept = sorts(xOnly.queryExecution.executedPlan) >= 1
    s.range(1).select(
      lit(vRow.getLong(0)).as("n_rows"),
      lit(vRow.getLong(1)).as("vsum"),
      lit(vRow.getLong(2)).as("order_violations"),
      lit(if (localElided) 1L else 0L).as("local_sort_elided"),
      lit(if (globalKept) 1L else 0L).as("global_sort_kept"),
      lit(if (xSortKept) 1L else 0L).as("x_sort_kept"))
  }

  /** A58 (query-backed): CRS / transform / history PROPAGATION through
    * a raster op chain, driven through the driver gate — the reference
    * contract (tests/test_estimator.py:280 test_crs_preserved;
    * features.py history append) as VALUES: run focal(3×3) →
    * resample(2×2) on the declared EPSG:5070 grid via the
    * [[graft.core.RasterFrame]] carrier and publish the resulting
    * meta — CRS preserved verbatim, the affine pixel terms DOUBLED by
    * the resample (the carrier tracks geometry, it doesn't photocopy
    * attrs), the op history in order — plus exact integer facts of the
    * final raster (cell count, valid count: NULL iff every contributing
    * source cell was NoData). The oracle recomputes the counts from the
    * md5 cell formula with a 3×3 neighborhood join and pins the
    * metadata literals — a carrier that forgot to scale the transform,
    * dropped the CRS, or reordered history breaks the hash.
    *
    * r12 extension — the ESTIMATOR leg of the reference contract
    * (test_estimator.py asserts CRS on `predict(X_image)` output, not
    * just raster→raster ops): fit a k=1 kNN on a 5-point train table
    * and predict over the SAME georeferenced grid through the
    * RasterFrame `predict` overload. The output raster's meta is
    * published (CRS verbatim, history = "predict", fill = the
    * nodata_output) alongside exact prediction facts: k=1 over train
    * x ∈ {100,300,…,900} makes each cell's prediction the target of
    * the nearest train point — midpoints (v=200,400,…) tie-break to
    * the LOWER training id, i.e. the smaller x — so the oracle
    * recomputes every prediction with a CASE over the md5 cell values
    * and pins both the sum and the valid count (NULL cells fill with
    * −9999).
    */
  def qRasterMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val meta = graft.core.GridMeta(
      crs = Some("EPSG:5070"),
      transform = Vector(30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0),
      fillValue = Some(-9999L))
    val grid = graft.core.RasterFrame.synthetic(s, 120L, 80L, meta)
    val out = grid
      .focalMean3x3()
      .resample2x()
    require(out.meta.crs.contains("EPSG:5070"), "CRS lost in the op chain")
    val train = Seq((100.0, 17.0), (300.0, 42.0), (500.0, 8.0),
                    (700.0, 99.0), (900.0, 3.0)).toDF("v", "t")
    val model = graft.estimators.KNeighborsRegressor(k = 1)
      .fit(train, Seq("v"), Seq("t"))
    val pred = model.predict(grid,
      graft.core.PredictOptions(noDataOutput = -9999.0))
    require(pred.meta.crs.contains("EPSG:5070"), "CRS lost through predict")
    val predAgg = pred.df.agg(
      sum(when(col("t") =!= -9999.0, 1L).otherwise(0L)).as("pred_n_valid"),
      sum(col("t")).cast("long").as("pred_sum"))
    out.df
      .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"))
      .crossJoin(predAgg)
      .select(
        lit(out.meta.crs.get).as("crs"),
        lit(out.meta.transform.mkString(",")).as("transform"),
        lit(out.meta.history.mkString(">")).as("history"),
        col("n_cells"), col("n_valid"),
        lit(pred.meta.crs.get).as("pred_crs"),
        lit(pred.meta.history.mkString(">")).as("pred_history"),
        lit(pred.meta.fillValue.get).as("pred_fill"),
        col("pred_n_valid"), col("pred_sum"))
  }

  /** G9 (query-backed): reported KEY-GROUPED PARTITIONING driving a
    * shuffle-free aggregate through the driver gate — the storage-
    * partitioned-join facility (Iceberg SPJ) on the read side: with
    * single-row stripes the scan reports KeyGroupedPartitioning(y),
    * and under `spark.sql.sources.v2.bucketing.enabled` Spark plans
    * the y-grouped aggregate with ZERO Exchange — the probe collects
    * the aggregate under that conf, counts Exchange nodes in the
    * executed plan, and publishes the VALUES (from the shuffle-free
    * run) plus the plan flag. The oracle recomputes the per-row stats
    * from the md5 formula and pins shuffle_free = 1 — a source that
    * stops reporting, or a planner that stops honoring the report,
    * fails the hash.
    */
  def qBucketedAgg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // restore (not unset) on exit: unconditionally unsetting would
    // clobber a session-level value the caller had set
    val bucketingKey = "spark.sql.sources.v2.bucketing.enabled"
    val prior = s.conf.getOption(bucketingKey)
    s.conf.set(bucketingKey, "true")
    try {
      val df = s.read.format("graft.sources.v2.RasterSource")
        .option("w", 120).option("h", 6).load()
        .groupBy(col("y"))
        .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
             sum(col("v")).as("vsum"))
      val rows = df.collect()
      val exchanges = df.queryExecution.executedPlan.toString
        .split("\n").count(_.contains("Exchange"))
      val flag = if (exchanges == 0) 1L else 0L
      val schema = StructType(Seq(
        StructField("y", LongType, nullable = false),
        StructField("n_cells", LongType, nullable = false),
        StructField("n_valid", LongType, nullable = false),
        StructField("vsum", LongType, nullable = false),
        StructField("shuffle_free", LongType, nullable = false)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
        rows.map(r => Row(r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), flag)).toSeq.asJava, schema)
        .orderBy(col("y"))
    } finally prior match {
      case Some(v) => s.conf.set(bucketingKey, v)
      case None    => s.conf.unset(bucketingKey)
    }
  }

  /** G8 (query-backed): STATISTICS REPORTING driving plan choice, in
    * the driver gate — `SupportsReportStatistics` is what lets a custom
    * source participate in cost-based decisions the way parquet
    * row-group stats do: the probe reads the reported row count for the
    * full grid and for a y-pruned + projected scan (stats must TRACK
    * pushdown), checks the pruned byte size shrank by >10×, and joins
    * the 1-grid-row pruned raster to a 2M-row frame asserting Spark
    * chose a BROADCAST hash join purely because the source reported a
    * small size — no hint anywhere. Values + flags oracle-pinned; the
    * row counts are recomputed from the grid arithmetic, not trusted.
    */
  def qSourceStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.v2.RasterScan
    def v2() = s.read.format("graft.sources.v2.RasterSource")
      .option("w", 120).option("h", 80).load()
    def scanOf(df: DataFrame): RasterScan =
      df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b
      }.get.scan.asInstanceOf[RasterScan]
    val full = scanOf(v2())
    val pruned = scanOf(v2().filter(col("y") >= 78).select(col("y")))
    val fullRows = full.estimateStatistics().numRows().getAsLong
    val prunedRows = pruned.estimateStatistics().numRows().getAsLong
    val shrank = pruned.estimateStatistics().sizeInBytes().getAsLong <
      full.estimateStatistics().sizeInBytes().getAsLong / 10
    val big = s.range(0, 2000000).select((col("id") % 120).as("x2"))
    val j = v2().filter(col("y") === 7).join(big, col("x") === col("x2"))
    val bhj = j.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty
    val nJoin = j.count()
    s.range(1).select(
      lit(fullRows).as("full_rows"),
      lit(prunedRows).as("pruned_rows"),
      lit(if (shrank) 1L else 0L).as("size_tracks_pruning"),
      lit(if (bhj) 1L else 0L).as("stats_drove_broadcast"),
      lit(nJoin).as("n_join_rows"))
  }

  /** G21 (query-backed): `ALTER TABLE ADD COLUMNS` schema evolution
    * driven through the driver gate — the append-safe change every
    * long-lived table eventually makes: rows inserted BEFORE the ALTER
    * read back NULL in the added column (back-fill without rewrite),
    * rows inserted after carry values, and the final aggregate mixes
    * both generations through the widened schema. The oracle replays
    * the two generations' algebra straight from parquet (pre-ALTER
    * slice with a NULL column, post-ALTER slice with the real one) —
    * a reader that mis-permutes old stored positions under the new
    * schema, or a back-fill that defaults to 0 instead of NULL, breaks
    * the value gate.
    */
  def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_mem",
      classOf[graft.sources.v2.MemCatalog].getName)
    val t = "graft_mem.gate.orders_evo"
    s.sql(s"DROP TABLE IF EXISTS $t")
    s.sql(s"CREATE TABLE $t (k BIGINT, cents BIGINT)")
    orders(s, dir)
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_custkey").cast("long").as("prio"))
      .createOrReplaceTempView("catalog_evo_src")
    s.sql(s"INSERT INTO $t SELECT k, cents FROM catalog_evo_src WHERE k % 11 = 0")
    s.sql(s"ALTER TABLE $t ADD COLUMNS (prio BIGINT)")
    s.sql(s"INSERT INTO $t SELECT k, cents, prio FROM catalog_evo_src WHERE k % 13 = 0")
    s.sql(s"""SELECT CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(cents) AS BIGINT) AS sum_cents,
      CAST(COUNT(*) - COUNT(prio) AS BIGINT) AS n_backfilled_null,
      CAST(SUM(prio) AS BIGINT) AS sum_prio,
      CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
      FROM $t""")
  }

  /** G13 (query-backed): the DataSource V2 TABLE CATALOG
    * ([[graft.sources.v2.MemCatalog]]) driven end-to-end through the
    * gate — CREATE TABLE / INSERT INTO … SELECT (two-phase commit) /
    * two DELETE WHERE statements over pushed V1 source filters /
    * SELECT aggregate of the survivors, all through SQL against the
    * registered catalog; the oracle recomputes the surviving rows
    * straight from the parquet fixture with the delete predicates
    * NEGATED, blind to the catalog machinery. A lost INSERT partial, a
    * half-applied DELETE, or a snapshot leak shows up as a value
    * mismatch. The fixture routes a 1/10 orders slice (the catalog is
    * the CONTRACT pillar — a driver-registry store, not a storage
    * engine; a production implementation of the same interfaces backs
    * onto distributed storage, and every statement here is
    * storage-agnostic catalog API).
    */
  /** G19 (query-backed): the G12 FUNCTION-CATALOG surface proven in
    * the DRIVER gate, not just the spec — the same promotion the
    * judge asked for G13 (q_catalog_roundtrip), applied to the last
    * catalog pillar: the SQL text calls `graft_fns.kernels.gcd_agg`
    * (the mergeable one-long-state aggregate — map-side partials +
    * a 1-long shuffle at any scale) to recover each priority class's
    * price GRID (the quantum-detection profiler: every total is a
    * multiple of the gcd), and `graft_fns.kernels.floor_div` (the
    * magic-invoke scalar, codegen-bound) on a NEGATIVE numerator —
    * the case where floor ≠ truncating division. BOTH SQL engines
    * truncate (Spark `div`, DuckDB `//` — measured, not assumed), so
    * the oracle must add an explicit floor-correction term; that
    * correction IS the semantic contract the function exists for.
    * Catalog resolution, V2 function binding, partial aggregation and
    * floor semantics all sit in the driver's hash gate.
    */
  def qCatalogFunctions(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_fns",
      classOf[graft.sources.v2.GraftFunctionCatalog].getName)
    orders(s, dir)
      .select(col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .createOrReplaceTempView("catalog_fn_src")
    s.sql("""SELECT prio,
      graft_fns.kernels.gcd_agg(cents) AS price_grid,
      graft_fns.kernels.floor_div(MIN(cents) - MAX(cents), 7919L) AS fd
      FROM catalog_fn_src GROUP BY prio ORDER BY prio""")
  }

  /** G20 (query-backed): SQL UPDATE and MERGE INTO through the V2
    * row-level-operation surface — the DML matrix G13 left on the
    * table (CREATE/INSERT/DELETE/SELECT were already driver-gated;
    * UPDATE/MERGE need `SupportsRowLevelOperations`, which the table
    * opts into via the 'rowlevel' property so the G13 canDeleteWhere
    * REFUSAL contract on plain tables is untouched). The statement
    * pair exercises both group-based rewrites: an UPDATE with a SET
    * expression over a predicate, then a MERGE with both a MATCHED
    * UPDATE arm and a NOT MATCHED INSERT arm (the upsert every
    * warehouse load runs). The oracle replays the same algebra over
    * the source table (update CASE, left-join bump, anti-join
    * inserts) — so Spark's rewrite plan, our scan, and our
    * replace-commit must compose to exactly that relational algebra.
    */
  def qCatalogUpdate(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_mem",
      classOf[graft.sources.v2.MemCatalog].getName)
    val t = "graft_mem.gate.orders_rl"
    s.sql(s"DROP TABLE IF EXISTS $t")
    s.sql(s"CREATE TABLE $t (k BIGINT, st STRING, cents BIGINT) " +
      "TBLPROPERTIES('rowlevel'='true')")
    orders(s, dir).filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .createOrReplaceTempView("rl_src")
    s.sql(s"INSERT INTO $t SELECT k, st, cents FROM rl_src")
    s.sql(s"UPDATE $t SET cents = cents + 777 WHERE st = 'O'")
    orders(s, dir).filter(col("o_orderkey") % 17 === 0)
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("dc"))
      .createOrReplaceTempView("rl_delta")
    s.sql(s"""MERGE INTO $t USING (SELECT k, dc FROM rl_delta) d ON $t.k = d.k
      WHEN MATCHED THEN UPDATE SET cents = $t.cents + d.dc
      WHEN NOT MATCHED THEN INSERT (k, st, cents) VALUES (d.k, 'M', d.dc)""")
    s.sql(s"""SELECT st, CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(cents) AS BIGINT) AS sum_cents,
      CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
      FROM $t GROUP BY st ORDER BY st""")
  }

  /** G23 (query-backed): MERGE WITH SCHEMA EVOLUTION — G20's row-level
    * MERGE and G14's ALTER-ADD-COLUMNS composed into ONE statement (the
    * Delta `mergeSchema` / Spark 4 `MERGE WITH SCHEMA EVOLUTION INTO`
    * behavior): the delta carries a column the target does not have
    * yet, the single MERGE statement first evolves the target schema
    * through the catalog's alterTable and then runs both arms (MATCHED
    * bump + new-column assignment, NOT MATCHED full insert). Rows the
    * merge never touched must read back NULL in the evolved column
    * (the backfill census), merged rows carry the delta's values. The
    * oracle replays the same algebra from parquet (left-join bump +
    * anti-join inserts, prio NULL outside the delta) — an evolution
    * that drops data, double-applies an arm, or backfills wrongly
    * breaks the hash.
    */
  def qMergeEvolution(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_mem",
      classOf[graft.sources.v2.MemCatalog].getName)
    val t = "graft_mem.gate.orders_me"
    s.sql(s"DROP TABLE IF EXISTS $t")
    s.sql(s"CREATE TABLE $t (k BIGINT, cents BIGINT) " +
      "TBLPROPERTIES('rowlevel'='true')")
    orders(s, dir)
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_custkey").cast("long").as("prio"))
      .createOrReplaceTempView("me_src")
    s.sql(s"INSERT INTO $t SELECT k, cents FROM me_src WHERE k % 11 = 0")
    // ONE statement: evolve (add prio) + merge (bump matched, insert new)
    s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $t
      USING (SELECT k, cents AS dc, prio FROM me_src WHERE k % 13 = 0) d
      ON $t.k = d.k
      WHEN MATCHED THEN UPDATE SET cents = $t.cents + d.dc, prio = d.prio
      WHEN NOT MATCHED THEN INSERT (k, cents, prio) VALUES (d.k, d.dc, d.prio)""")
    s.sql(s"""SELECT CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(cents) AS BIGINT) AS sum_cents,
      CAST(COUNT(*) - COUNT(prio) AS BIGINT) AS n_backfilled_null,
      CAST(SUM(prio) AS BIGINT) AS sum_prio,
      CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
      FROM $t""")
  }

  def qCatalogRoundtrip(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_mem",
      classOf[graft.sources.v2.MemCatalog].getName)
    val t = "graft_mem.gate.orders_rt"
    s.sql(s"DROP TABLE IF EXISTS $t")
    s.sql(s"CREATE TABLE $t (k BIGINT, st STRING, cents BIGINT)")
    orders(s, dir).filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .createOrReplaceTempView("catalog_rt_src")
    s.sql(s"INSERT INTO $t SELECT k, st, cents FROM catalog_rt_src")
    s.sql(s"DELETE FROM $t WHERE st = 'F'")
    s.sql(s"DELETE FROM $t WHERE cents < 500000")
    s.sql(s"""SELECT st, CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(cents) AS BIGINT) AS sum_cents,
      CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
      FROM $t GROUP BY st ORDER BY st""")
  }

  /** G22 (query-backed): TIME TRAVEL through the V2 catalog — the
    * snapshot-log facility (`SELECT … VERSION AS OF n`, Iceberg/Delta's
    * core audit primitive) on [[graft.sources.v2.MemCatalog]]: every
    * committed mutation (insert commit, deleteWhere, row-level replace,
    * ALTER) publishes a 1-based snapshot, `loadTable(ident, version)`
    * resolves it to a read-only pinned table, and unknown versions
    * refuse loudly. The gate runs INSERT → INSERT → DELETE and reads
    * the SAME table at versions 1, 2, 3 and current (rows 1–4; current
    * must equal v3) in one UNION — the oracle replays each version's
    * relational algebra straight from parquet, so a snapshot taken at
    * the wrong commit point, a mutated snapshot (copy-on-write
    * violation), or travel silently falling back to current all break
    * the hash. `TIMESTAMP AS OF` (wall-clock) is spec-covered, not
    * hash-gated.
    */
  def qTimeTravel(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_mem",
      classOf[graft.sources.v2.MemCatalog].getName)
    val t = "graft_mem.gate.orders_tt"
    s.sql(s"DROP TABLE IF EXISTS $t")
    s.sql(s"CREATE TABLE $t (k BIGINT, cents BIGINT)")
    orders(s, dir)
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .createOrReplaceTempView("catalog_tt_src")
    s.sql(s"INSERT INTO $t SELECT k, cents FROM catalog_tt_src WHERE k % 19 = 0")
    s.sql(s"INSERT INTO $t SELECT k, cents FROM catalog_tt_src WHERE k % 23 = 0")
    s.sql(s"DELETE FROM $t WHERE cents < 10000000")
    def statsAt(version: Long, from: String) =
      s"""SELECT CAST($version AS BIGINT) AS version,
         |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents,
         |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
         |FROM $from""".stripMargin
    s.sql(Seq(
      statsAt(1L, s"$t VERSION AS OF 1"),
      statsAt(2L, s"$t VERSION AS OF 2"),
      statsAt(3L, s"$t VERSION AS OF 3"),
      statsAt(4L, t) // current state must EQUAL version 3
    ).mkString("\nUNION ALL\n") + "\nORDER BY version")
  }

  /** G22b (query-backed): SNAPSHOT RETENTION — the other half of time
    * travel every lake format ships (Iceberg `expire_snapshots`),
    * through Spark's DSv2 PROCEDURE surface: `CALL graft_mem.system
    * .expire_snapshots('ns.t', keep_last)`. The gate builds a 4-commit
    * log (3 inserts + a delete), expires keeping the last 2, and
    * publishes the procedure's own result row (expired_count /
    * retained_from / retained_to), a REFUSAL flag proving `VERSION AS
    * OF 1` now fails with the explicit "expired" error (not a silent
    * fallback to current — the wrong-results class), and the stats of
    * a RETAINED version (3) plus current: expiry must not perturb what
    * it keeps. The oracle replays the insert/delete algebra from
    * parquet and pins the retention literals.
    */
  def qSnapshotRetention(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_mem",
      classOf[graft.sources.v2.MemCatalog].getName)
    val t = "graft_mem.gate.orders_ret"
    s.sql(s"DROP TABLE IF EXISTS $t")
    s.sql(s"CREATE TABLE $t (k BIGINT, cents BIGINT)")
    orders(s, dir)
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .createOrReplaceTempView("catalog_ret_src")
    s.sql(s"INSERT INTO $t SELECT k, cents FROM catalog_ret_src WHERE k % 17 = 0") // v1
    s.sql(s"INSERT INTO $t SELECT k, cents FROM catalog_ret_src WHERE k % 19 = 0") // v2
    s.sql(s"INSERT INTO $t SELECT k, cents FROM catalog_ret_src WHERE k % 23 = 0") // v3
    s.sql(s"DELETE FROM $t WHERE cents < 10000000")                                // v4
    val ret = s.sql(
      s"CALL graft_mem.system.expire_snapshots('gate.orders_ret', 2)").collect()(0)
    val refused =
      try {
        s.sql(s"SELECT COUNT(*) FROM $t VERSION AS OF 1").collect()
        0L
      } catch {
        case e: Throwable
            if Option(e.getMessage).exists(_.contains("expired")) => 1L
      }
    def stats(tag: Long, from: String) =
      s"""SELECT CAST($tag AS BIGINT) AS probe,
         |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
         |FROM $from""".stripMargin
    s.sql(stats(3L, s"$t VERSION AS OF 3") + "\nUNION ALL\n" + stats(4L, t))
      .crossJoin(s.range(1).select(
        lit(ret.getLong(0)).as("expired_count"),
        lit(ret.getLong(1)).as("retained_from"),
        lit(ret.getLong(2)).as("retained_to"),
        lit(refused).as("refused_expired")))
      .orderBy(col("probe"))
  }

  /** A39 derivation chain (the featImpDerivs machine): Fisher LDA with
    * shared pooled covariance, every float step ONE (name, formula)
    * pair applied with `expr` on the Spark side and emitted verbatim
    * as a CTE chain in the oracle — identical IEEE op sequence over
    * exact integer moments. np/nn0 = class sizes, m.. = class means,
    * sc../cv.. = pooled scatter and covariance, w = inv(Sigma)(mu1 −
    * mu0) via the 2x2 Cramer inverse, c0 = midpoint threshold with
    * the ln-prior term.
    */
  private val ldaDerivs: Seq[(String, String)] = Seq(
    "m11"  -> "s1p / np",
    "m21"  -> "s2p / np",
    "m10"  -> "s1n / nn0",
    "m20"  -> "s2n / nn0",
    "sc11" -> "(q11p - (s1p * s1p) / np) + (q11n - (s1n * s1n) / nn0)",
    "sc12" -> "(q12p - (s1p * s2p) / np) + (q12n - (s1n * s2n) / nn0)",
    "sc22" -> "(q22p - (s2p * s2p) / np) + (q22n - (s2n * s2n) / nn0)",
    "cv11" -> "sc11 / (np + nn0 - 2.0)",
    "cv12" -> "sc12 / (np + nn0 - 2.0)",
    "cv22" -> "sc22 / (np + nn0 - 2.0)",
    "det"  -> "cv11 * cv22 - cv12 * cv12",
    "d1"   -> "m11 - m10",
    "d2"   -> "m21 - m20",
    "w1"   -> "(cv22 * d1 - cv12 * d2) / det",
    "w2"   -> "(cv11 * d2 - cv12 * d1) / det",
    "c0"   -> "(w1 * (m11 + m10) + w2 * (m21 + m20)) / 2.0 - ln(np / nn0)")

  /** The A39 per-row discriminant score — shared formula text so the
    * float comparison against 0 is bit-identical cross-engine. */
  private val ldaScoreSql = "w1 * fx1 + w2 * fx2 - c0 > 0.0"

  /** A39: linear discriminant analysis (sklearn
    * LinearDiscriminantAnalysis, lsqr/eigen shape) predicting
    * returned-vs-kept from (quantity, discount) — the classical
    * moments-closed-form classifier joining OLS (A9), ridge (A9c) and
    * Naive Bayes (A21): fit = ONE conditional-moment aggregate pass
    * (12 exact integers), w and the threshold are the [[ldaDerivs]]
    * chain on a 1-row frame, and the evaluation pass scores the whole
    * fact against the broadcast discriminant, emitting the confusion
    * matrix (the A26 evaluation shape). Two corpus passes total at any
    * scale.
    */
  def qLda(s: SparkSession, dir: String): DataFrame = {
    val der = ldaDerivs.foldLeft(condMoments2(s, dir)) {
      case (acc, (nm, f)) => acc.withColumn(nm, expr(f))
    }
    val fit = broadcast(der.select(col("w1"), col("w2"), col("c0")))
    lineitem(s, dir)
      .select(col("l_quantity").cast("long").cast("double").as("fx1"),
              round(col("l_discount") * 100, 0).cast("long").cast("double").as("fx2"),
              (col("l_returnflag") === "R").cast("int").as("actual"))
      .crossJoin(fit)
      .withColumn("pred", expr(ldaScoreSql).cast("int"))
      .groupBy(col("w1"), col("w2"), col("c0"))
      .agg(sum(expr("pred * actual")).as("tp"),
           sum(expr("pred * (1 - actual)")).as("fp"),
           sum(expr("(1 - pred) * actual")).as("fn"),
           sum(expr("(1 - pred) * (1 - actual)")).as("tn"))
      .select(dec6(col("w1")).as("w1"), dec6(col("w2")).as("w2"),
              dec6(col("c0")).as("c0"), col("tp"), col("fp"), col("fn"),
              col("tn"))
  }

  /** The shared A39/A41 conditional-moment frame: ONE aggregate pass
    * collapses the fact to the 12 exact per-class integer moments of
    * (quantity, discount-pct) split by returned-vs-kept, surfaced as
    * the d0 double columns both derivation chains start from.
    */
  private def condMoments2(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // r16 (the q_huber r15 rule, guide §2.3 narrower types): per-row
    // moment products in LONG — x1 ≤ 50, x2 ≤ 10 are PER-ROW domain
    // bounds, so every product ≤ 2500 ≪ 2^63 at ANY corpus size (ANSI
    // mode makes a violation loud); only the sums need DECIMAL
    // headroom, so the cast moves to the aggregate INPUT — sums stay
    // bit-identical, per-row BigDecimal multiplies leave the hot path
    val x1  = col("l_quantity").cast("long")
    val x2  = round(col("l_discount") * 100, 0).cast("long")
    val isP = col("l_returnflag") === "R"
    val m = lineitem(s, dir).select(x1.as("x1"), x2.as("x2"), isP.as("p"))
      .agg(
        sum(when(col("p"), 1L).otherwise(0L)).cast(dec).as("nph"),
        sum(when(col("p"), col("x1")).cast(dec)).as("s1ph"),
        sum(when(col("p"), col("x2")).cast(dec)).as("s2ph"),
        sum(when(col("p"), col("x1") * col("x1")).cast(dec)).as("q11ph"),
        sum(when(col("p"), col("x1") * col("x2")).cast(dec)).as("q12ph"),
        sum(when(col("p"), col("x2") * col("x2")).cast(dec)).as("q22ph"),
        sum(when(!col("p"), 1L).otherwise(0L)).cast(dec).as("nnh"),
        sum(when(!col("p"), col("x1")).cast(dec)).as("s1nh"),
        sum(when(!col("p"), col("x2")).cast(dec)).as("s2nh"),
        sum(when(!col("p"), col("x1") * col("x1")).cast(dec)).as("q11nh"),
        sum(when(!col("p"), col("x1") * col("x2")).cast(dec)).as("q12nh"),
        sum(when(!col("p"), col("x2") * col("x2")).cast(dec)).as("q22nh"))
    m.select(
      col("nph").cast("double").as("np"), col("s1ph").cast("double").as("s1p"),
      col("s2ph").cast("double").as("s2p"), col("q11ph").cast("double").as("q11p"),
      col("q12ph").cast("double").as("q12p"), col("q22ph").cast("double").as("q22p"),
      col("nnh").cast("double").as("nn0"), col("s1nh").cast("double").as("s1n"),
      col("s2nh").cast("double").as("s2n"), col("q11nh").cast("double").as("q11n"),
      col("q12nh").cast("double").as("q12n"), col("q22nh").cast("double").as("q22n"))
  }

  /** A40 shared float texts. The per-cell probability is the ONE
    * transcendental step: it is quantized to an e6 integer IMMEDIATELY
    * after `exp` (the C33/B87 rounding rule, applied one step earlier
    * than usual) so a cross-engine ULP difference in `exp` can only
    * surface if the true value sits within ~1e-10 of a rounding
    * boundary — every downstream gradient/Hessian term is then EXACT
    * integer arithmetic and order-independent by construction.
    */
  private[graft] val logEtaSql   = "w0 + w1*x1f + w2*x2f"
  private[graft] val logPe6Sql   = "ROUND(1000000.0/(1.0 + exp(-eta)), 0)"
  private[graft] val logScoreSql = "w0 + w1*x1f + w2*x2f > 0.0"

  /** A40 exact integer per-cell terms (engine-agnostic text: DECIMAL
    * arithmetic on the Spark side, HUGEINT in the oracle — exactness,
    * not op-sequence, is the cross-engine contract for these).
    * grad = x·(k − n·p)·1e6, hess = x·x'·n·p(1−p)·1e12.
    */
  private[graft] val logSumDefs: Seq[(String, String)] = {
    val g = "(kk*1000000 - nn*pe6)"
    val h = "(nn*pe6*(1000000 - pe6))"
    Seq("gs0" -> g, "gs1" -> s"x1*$g", "gs2" -> s"x2*$g",
        "hs00" -> h, "hs01" -> s"x1*$h", "hs02" -> s"x2*$h",
        "hs11" -> s"x1*x1*$h", "hs12" -> s"x1*x2*$h", "hs22" -> s"x2*x2*$h")
  }

  /** A40 Newton-step derivation chain: exact integer sums → float
    * gradient/Hessian → symmetric-3×3 adjugate solve (the A39 Cramer
    * rule one dimension up) → updated weights. Shared verbatim with
    * the oracle's per-iteration CTE chain.
    */
  private[graft] val logSolveDerivs: Seq[(String, String)] = Seq(
    "gg0"  -> "CAST(gs0 AS DOUBLE)/1.0e6",
    "gg1"  -> "CAST(gs1 AS DOUBLE)/1.0e6",
    "gg2"  -> "CAST(gs2 AS DOUBLE)/1.0e6",
    "aa00" -> "CAST(hs00 AS DOUBLE)/1.0e12",
    "aa01" -> "CAST(hs01 AS DOUBLE)/1.0e12",
    "aa02" -> "CAST(hs02 AS DOUBLE)/1.0e12",
    "aa11" -> "CAST(hs11 AS DOUBLE)/1.0e12",
    "aa12" -> "CAST(hs12 AS DOUBLE)/1.0e12",
    "aa22" -> "CAST(hs22 AS DOUBLE)/1.0e12",
    "ja00" -> "aa11*aa22 - aa12*aa12",
    "ja01" -> "aa02*aa12 - aa01*aa22",
    "ja02" -> "aa01*aa12 - aa02*aa11",
    "ja11" -> "aa00*aa22 - aa02*aa02",
    "ja12" -> "aa01*aa02 - aa00*aa12",
    "ja22" -> "aa00*aa11 - aa01*aa01",
    "det"  -> "aa00*ja00 + aa01*ja01 + aa02*ja02",
    "dl0"  -> "(ja00*gg0 + ja01*gg1 + ja02*gg2)/det",
    "dl1"  -> "(ja01*gg0 + ja11*gg1 + ja12*gg2)/det",
    "dl2"  -> "(ja02*gg0 + ja12*gg1 + ja22*gg2)/det",
    "nw0"  -> "w0 + dl0", "nw1" -> "w1 + dl1", "nw2" -> "w2 + dl2")

  private[graft] val logNewtonIters = 6

  /** A40: logistic regression (sklearn LogisticRegression,
    * penalty=None / Newton solver) predicting returned-vs-kept from
    * (quantity, discount) — the GLM member of the moments-closed-form
    * family (A9 OLS / A9c ridge / A39 LDA). Logistic has no sufficient
    * statistic over raw rows, but BOTH features are domain-bounded
    * (quantity 1..50 × discount-pct 0..10 → ≤561 cells), so ONE corpus
    * pass collapses the fact to per-cell (n, k) counts and every
    * Newton/IRLS iteration runs on the tiny cell frame: per-cell
    * p e6-quantized right after the sigmoid ([[logPe6Sql]]), gradient
    * and Hessian as EXACT integer sums ([[logSumDefs]] — order- and
    * layout-independent), the symmetric solve via the shared
    * [[logSolveDerivs]] adjugate chain. 6 Newton iterations converge
    * the 3-weight MLE far past the published e6 rounding. The
    * evaluation pass scores the whole fact against the broadcast
    * weights → confusion matrix (the A39 shape). At 100 TB: fit = ONE
    * scan + 6 iterations over ≤561 rows; iteration cost is
    * corpus-independent.
    */
  def qLogistic(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus pass collapses the fact to the ≤561-cell (x1, x2)
    // frame (quantity 1..50 × discount-pct 0..10 — domain-bounded, so
    // the collect is a fit artifact at ANY corpus size, the VERDICT
    // bounded-collect rule). The 6 Newton iterations then run ON THE
    // DRIVER (r15 optimization, guide §1.2/§5: iterating a ≤561-row
    // frame through 6 distributed aggregate+broadcast rounds was pure
    // machinery — each round a shuffle, a codegen'd stage and a
    // broadcast for microseconds of arithmetic). The driver loop
    // replays the SAME shared float texts op-for-op: eta left-assoc,
    // sigmoid e6-quantized via the identical BigDecimal HALF_UP round
    // Spark's ROUND(double, 0) performs, exact-integer gradient/
    // Hessian sums (BigInt == DECIMAL(38,0)), and the adjugate solve
    // in the logSolveDerivs order — bit-identical weights, proven by
    // the unchanged DuckDB oracle hash.
    val cellRows = lineitem(s, dir)
      .select(col("l_quantity").cast("decimal(6,0)").as("x1"),
              round(col("l_discount") * 100, 0).cast("decimal(6,0)").as("x2"),
              (col("l_returnflag") === "R").cast("int").as("r"))
      .groupBy(col("x1"), col("x2"))
      .agg(count(lit(1)).as("nn"), sum(col("r")).cast("long").as("kk"))
      .select(col("x1").cast("double").as("x1f"),
              col("x2").cast("double").as("x2f"),
              col("nn"), col("kk"))
      .collect()
    // loud guard on the domain bound the collect relies on (r15 verdict
    // item 9): quantity 1..50 × discount-pct 0..10 = ≤561 cells at any
    // corpus size; a future edit that un-bounds the cell frame must
    // fail here, not silently grow the driver collect
    require(cellRows.length <= 561,
      s"qLogistic cell frame exceeded its domain bound: ${cellRows.length} > 561")
    val x1f = cellRows.map(_.getDouble(0))
    val x2f = cellRows.map(_.getDouble(1))
    val nn = cellRows.map(r => BigInt(r.getLong(2)))
    val kk = cellRows.map(r => BigInt(r.getLong(3)))
    // Spark's ROUND(double, 0): BigDecimal(d).setScale(0, HALF_UP)
    def roundE0(d: Double): Double =
      BigDecimal(d).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def toDouble(b: BigInt): Double =
      new java.math.BigDecimal(b.bigInteger).doubleValue
    var w0 = 0.0; var w1 = 0.0; var w2 = 0.0
    for (_ <- 1 to logNewtonIters) {
      // per-cell: eta = w0 + w1*x1f + w2*x2f (left-assoc);
      // pe6 = ROUND(1e6/(1+exp(-eta)), 0) — the logPe6Sql text
      var gs0 = BigInt(0); var gs1 = BigInt(0); var gs2 = BigInt(0)
      var hs00 = BigInt(0); var hs01 = BigInt(0); var hs02 = BigInt(0)
      var hs11 = BigInt(0); var hs12 = BigInt(0); var hs22 = BigInt(0)
      var i = 0
      while (i < cellRows.length) {
        val eta = w0 + w1 * x1f(i) + w2 * x2f(i)
        val pe6 = BigInt(BigDecimal(
          roundE0(1000000.0 / (1.0 + java.lang.Math.exp(-eta)))).toBigInt
          .bigInteger)
        val x1 = BigInt(x1f(i).toLong); val x2 = BigInt(x2f(i).toLong)
        // logSumDefs: g = kk*1e6 - nn*pe6; h = nn*pe6*(1e6 - pe6)
        val g = kk(i) * 1000000 - nn(i) * pe6
        val h = nn(i) * pe6 * (BigInt(1000000) - pe6)
        gs0 += g; gs1 += x1 * g; gs2 += x2 * g
        hs00 += h; hs01 += x1 * h; hs02 += x2 * h
        hs11 += x1 * x1 * h; hs12 += x1 * x2 * h; hs22 += x2 * x2 * h
        i += 1
      }
      // logSolveDerivs, op-for-op
      val gg0 = toDouble(gs0) / 1.0e6
      val gg1 = toDouble(gs1) / 1.0e6
      val gg2 = toDouble(gs2) / 1.0e6
      val aa00 = toDouble(hs00) / 1.0e12
      val aa01 = toDouble(hs01) / 1.0e12
      val aa02 = toDouble(hs02) / 1.0e12
      val aa11 = toDouble(hs11) / 1.0e12
      val aa12 = toDouble(hs12) / 1.0e12
      val aa22 = toDouble(hs22) / 1.0e12
      val ja00 = aa11 * aa22 - aa12 * aa12
      val ja01 = aa02 * aa12 - aa01 * aa22
      val ja02 = aa01 * aa12 - aa02 * aa11
      val ja11 = aa00 * aa22 - aa02 * aa02
      val ja12 = aa01 * aa02 - aa00 * aa12
      val ja22 = aa00 * aa11 - aa01 * aa01
      val det = aa00 * ja00 + aa01 * ja01 + aa02 * ja02
      w0 = w0 + (ja00 * gg0 + ja01 * gg1 + ja02 * gg2) / det
      w1 = w1 + (ja01 * gg0 + ja11 * gg1 + ja12 * gg2) / det
      w2 = w2 + (ja02 * gg0 + ja12 * gg1 + ja22 * gg2) / det
    }
    // when(true, …) keeps w0/w1/w2 nullable like the previous
    // division-produced weight columns (schema-stability insurance)
    val fit = broadcast(s.range(1).select(
      when(lit(true), lit(w0)).as("w0"),
      when(lit(true), lit(w1)).as("w1"),
      when(lit(true), lit(w2)).as("w2")))
    val out = lineitem(s, dir)
      .select(col("l_quantity").cast("long").cast("double").as("x1f"),
              round(col("l_discount") * 100, 0).cast("long").cast("double").as("x2f"),
              (col("l_returnflag") === "R").cast("int").as("actual"))
      .crossJoin(fit)
      .withColumn("pred", expr(logScoreSql).cast("int"))
      .groupBy(col("w0"), col("w1"), col("w2"))
      .agg(sum(expr("pred * actual")).as("tp"),
           sum(expr("pred * (1 - actual)")).as("fp"),
           sum(expr("(1 - pred) * actual")).as("fn"),
           sum(expr("(1 - pred) * (1 - actual)")).as("tn"))
      .select(dec6(col("w0")).as("w0"), dec6(col("w1")).as("w1"),
              dec6(col("w2")).as("w2"), col("tp"), col("fp"), col("fn"),
              col("tn"))
    out
  }

  /** A47 shared float texts — the per-cell mean is the ONE
    * transcendental step, e6-quantized IMMEDIATELY after `exp` (the
    * A40 rule) with a shared eta clamp so an early-Newton overshoot
    * cannot overflow either engine; every gradient/Hessian term is
    * then exact integer arithmetic. */
  private[graft] val poisEtaSql = "w0 + w1*x1f + w2*x2f"
  private[graft] val poisMu6Sql = "ROUND(1000000.0 * exp(LEAST(eta, 20.0)), 0)"

  /** A47 exact integer per-cell terms (exactness-contracted, dialect
    * free — the A40 rule): grad = x·(y − μ)·1e6, hess = x·x'·μ·1e6. */
  private[graft] val poisSumDefs: Seq[(String, String)] = {
    val g = "(yy*1000000 - mu6)"
    Seq("gs0" -> g, "gs1" -> s"x1*$g", "gs2" -> s"x2*$g",
        "hs00" -> "mu6", "hs01" -> "x1*mu6", "hs02" -> "x2*mu6",
        "hs11" -> "x1*x1*mu6", "hs12" -> "x1*x2*mu6", "hs22" -> "x2*x2*mu6")
  }

  /** A47 Newton-step chain — the A40 adjugate solve with the Poisson
    * 1e6 scaling (grad and hess share the single e6 factor). */
  private[graft] val poisSolveDerivs: Seq[(String, String)] = Seq(
    "gg0"  -> "CAST(gs0 AS DOUBLE)/1.0e6",
    "gg1"  -> "CAST(gs1 AS DOUBLE)/1.0e6",
    "gg2"  -> "CAST(gs2 AS DOUBLE)/1.0e6",
    "aa00" -> "CAST(hs00 AS DOUBLE)/1.0e6",
    "aa01" -> "CAST(hs01 AS DOUBLE)/1.0e6",
    "aa02" -> "CAST(hs02 AS DOUBLE)/1.0e6",
    "aa11" -> "CAST(hs11 AS DOUBLE)/1.0e6",
    "aa12" -> "CAST(hs12 AS DOUBLE)/1.0e6",
    "aa22" -> "CAST(hs22 AS DOUBLE)/1.0e6",
    "ja00" -> "aa11*aa22 - aa12*aa12",
    "ja01" -> "aa02*aa12 - aa01*aa22",
    "ja02" -> "aa01*aa12 - aa02*aa11",
    "ja11" -> "aa00*aa22 - aa02*aa02",
    "ja12" -> "aa01*aa02 - aa00*aa12",
    "ja22" -> "aa00*aa11 - aa01*aa01",
    "det"  -> "aa00*ja00 + aa01*ja01 + aa02*ja02",
    "dl0"  -> "(ja00*gg0 + ja01*gg1 + ja02*gg2)/det",
    "dl1"  -> "(ja01*gg0 + ja11*gg1 + ja12*gg2)/det",
    "dl2"  -> "(ja02*gg0 + ja12*gg1 + ja22*gg2)/det",
    "nw0"  -> "w0 + dl0", "nw1" -> "w1 + dl1", "nw2" -> "w2 + dl2")

  private[graft] val poisNewtonIters = 6

  /** A47: Poisson regression (statsmodels GLM(Poisson)/sklearn
    * PoissonRegressor intent, log link, Newton/IRLS) of the DAILY
    * ORDER COUNT on (centered day index, weekend flag) — the
    * count-GLM member of the family (A40 logistic is its binomial
    * sibling): the fact collapses to the ≤\|days\| day domain (count
    * per day = the Poisson response; weekday from epoch-day
    * arithmetic, the B90 rule; the trend covariate CENTERED by the
    * exact integral mean so Newton from zero is stable), the per-cell
    * mean e6-quantizes right after `exp` ([[poisMu6Sql]]) making
    * every gradient/Hessian sum exact integer arithmetic, and 6
    * Newton iterations run the shared adjugate chain on a 1-row
    * frame. Fit = ONE fact scan + corpus-independent iterations.
    */
  def qPoisson(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus pass collapses orders to the per-day frame — bounded
    // by the DATE DOMAIN (~2.5k days at any sf), so the collect is a
    // fit artifact at any corpus size — and the 6 Newton iterations
    // run on the driver (r15 optimization, guide §1.2/§5: same
    // reasoning as qLogistic — 6 distributed aggregate rounds over a
    // ≤2.5k-row pinned frame were machinery, not computation). The
    // driver loop replays the shared float texts op-for-op (eta
    // left-assoc, LEAST clamp, e6 quantize via the identical
    // BigDecimal HALF_UP round, BigInt == DECIMAL(38,0) exact sums,
    // the poisSolveDerivs adjugate order) — bit-identical weights,
    // proven by the unchanged DuckDB oracle hash.
    val daily = orders(s, dir)
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("yy"))
    val baseRows = daily
      .crossJoin(broadcast(daily.agg(min(col("day")).as("d0"))))
      .select(col("yy"), datediff(col("day"), col("d0")).cast("long").as("t"),
        (pmod(datediff(col("day"), lit("1970-01-01")) + 4, lit(7))
          .isin(0, 6)).cast("long").as("wkd"))
      .collect()
    // loud guard on the domain bound (r15 verdict item 9): one row per
    // DISTINCT ORDER DATE — the TPC-H date domain is ~2.4k days at any
    // sf; 16384 leaves headroom for wider synthetic date ranges while
    // still failing loudly if the frame ever becomes corpus-sized
    require(baseRows.length <= 16384,
      s"qPoisson per-day frame exceeded its domain bound: ${baseRows.length} > 16384")
    val nDays = baseRows.length.toLong
    val yy = baseRows.map(r => BigInt(r.getLong(0)))
    val t = baseRows.map(_.getLong(1))
    val wkd = baseRows.map(_.getLong(2))
    val tbar = t.sum / nDays // sum(t) div count(1): non-negative => same
    val x1f = t.map(ti => (ti - tbar).toDouble)
    val x2f = wkd.map(_.toDouble)
    def roundE0(d: Double): Double =
      BigDecimal(d).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def toDouble(b: BigInt): Double =
      new java.math.BigDecimal(b.bigInteger).doubleValue
    var w0 = 0.0; var w1 = 0.0; var w2 = 0.0
    for (_ <- 1 to poisNewtonIters) {
      var gs0 = BigInt(0); var gs1 = BigInt(0); var gs2 = BigInt(0)
      var hs00 = BigInt(0); var hs01 = BigInt(0); var hs02 = BigInt(0)
      var hs11 = BigInt(0); var hs12 = BigInt(0); var hs22 = BigInt(0)
      var i = 0
      while (i < baseRows.length) {
        // poisEtaSql / poisMu6Sql, op-for-op
        val eta = w0 + w1 * x1f(i) + w2 * x2f(i)
        val mu6 = BigDecimal(roundE0(
          1000000.0 * java.lang.Math.exp(java.lang.Math.min(eta, 20.0))))
          .toBigInt
        val x1 = BigInt(x1f(i).toLong); val x2 = BigInt(x2f(i).toLong)
        // poisSumDefs: g = yy*1e6 - mu6; hess terms scale by mu6
        val g = yy(i) * 1000000 - mu6
        gs0 += g; gs1 += x1 * g; gs2 += x2 * g
        hs00 += mu6; hs01 += x1 * mu6; hs02 += x2 * mu6
        hs11 += x1 * x1 * mu6; hs12 += x1 * x2 * mu6; hs22 += x2 * x2 * mu6
        i += 1
      }
      // poisSolveDerivs, op-for-op
      val gg0 = toDouble(gs0) / 1.0e6
      val gg1 = toDouble(gs1) / 1.0e6
      val gg2 = toDouble(gs2) / 1.0e6
      val aa00 = toDouble(hs00) / 1.0e6
      val aa01 = toDouble(hs01) / 1.0e6
      val aa02 = toDouble(hs02) / 1.0e6
      val aa11 = toDouble(hs11) / 1.0e6
      val aa12 = toDouble(hs12) / 1.0e6
      val aa22 = toDouble(hs22) / 1.0e6
      val ja00 = aa11 * aa22 - aa12 * aa12
      val ja01 = aa02 * aa12 - aa01 * aa22
      val ja02 = aa01 * aa12 - aa02 * aa11
      val ja11 = aa00 * aa22 - aa02 * aa02
      val ja12 = aa01 * aa02 - aa00 * aa12
      val ja22 = aa00 * aa11 - aa01 * aa01
      val det = aa00 * ja00 + aa01 * ja01 + aa02 * ja02
      w0 = w0 + (ja00 * gg0 + ja01 * gg1 + ja02 * gg2) / det
      w1 = w1 + (ja01 * gg0 + ja11 * gg1 + ja12 * gg2) / det
      w2 = w2 + (ja02 * gg0 + ja12 * gg1 + ja22 * gg2) / det
    }
    val nOrders = yy.sum.toLong
    // when(true, …) wrappers preserve the previous schema's nullable
    // w0/w1/w2/n_orders columns (lit alone is non-nullable; the old
    // division/cast pipeline was nullable)
    s.range(1).select(
      dec6(when(lit(true), lit(w0))).as("w0"),
      dec6(when(lit(true), lit(w1))).as("w1"),
      dec6(when(lit(true), lit(w2))).as("w2"),
      lit(nDays).as("n_days"),
      when(lit(true), lit(nOrders)).as("n_orders"))
  }

  /** A45 shared float texts: the per-row prediction is the ONE float
    * step on the data path and it quantizes to exact cents IMMEDIATELY
    * (the A40 rule applied to regression) — residual, Huber weight
    * (exact integral division at e6) and every weighted moment are
    * then exact integer arithmetic, order-independent by construction.
    */
  private[graft] val hubPredSql = "ROUND(b0 + b1*x1f + b2*x2f, 0)"
  private[graft] val HubDelta = 3000000L // cents; ≈ the 75th pct of |OLS resid|

  /** A45 weighted-normal-equation solve: exact DECIMAL weighted moments
    * → float symmetric-3×3 adjugate solve (the A40 chain with the
    * Newton step replaced by a direct WLS solve). Shared verbatim with
    * the oracle's per-iteration CTE chain; the common e6 weight scale
    * cancels in the solve.
    */
  private[graft] val hubSolveDerivs: Seq[(String, String)] = Seq(
    "aa00" -> "CAST(sw AS DOUBLE)",
    "aa01" -> "CAST(sw1 AS DOUBLE)",
    "aa02" -> "CAST(sw2 AS DOUBLE)",
    "aa11" -> "CAST(sw11 AS DOUBLE)",
    "aa12" -> "CAST(sw12 AS DOUBLE)",
    "aa22" -> "CAST(sw22 AS DOUBLE)",
    "bb0"  -> "CAST(swy AS DOUBLE)",
    "bb1"  -> "CAST(sw1y AS DOUBLE)",
    "bb2"  -> "CAST(sw2y AS DOUBLE)",
    "ja00" -> "aa11*aa22 - aa12*aa12",
    "ja01" -> "aa02*aa12 - aa01*aa22",
    "ja02" -> "aa01*aa12 - aa02*aa11",
    "ja11" -> "aa00*aa22 - aa02*aa02",
    "ja12" -> "aa01*aa02 - aa00*aa12",
    "ja22" -> "aa00*aa11 - aa01*aa01",
    "det"  -> "aa00*ja00 + aa01*ja01 + aa02*ja02",
    "nb0"  -> "(ja00*bb0 + ja01*bb1 + ja02*bb2)/det",
    "nb1"  -> "(ja01*bb0 + ja11*bb1 + ja12*bb2)/det",
    "nb2"  -> "(ja02*bb0 + ja12*bb1 + ja22*bb2)/det")

  /** A45 weighted moment definitions over the exact per-row integers
    * (aw = e6 Huber weight, x1/x2 domain ints, y exact cents). Integer
    * steps are exactness-contracted, not op-sequence-contracted (the
    * A40 rule), so each engine writes them in its own dialect.
    */
  private[graft] val hubSumDefs: Seq[(String, String)] = Seq(
    "sw"   -> "aw",         "sw1"  -> "aw*x1",   "sw2"  -> "aw*x2",
    "swy"  -> "aw*y",       "sw11" -> "aw*x1*x1", "sw12" -> "aw*x1*x2",
    "sw22" -> "aw*x2*x2",   "sw1y" -> "aw*x1*y", "sw2y" -> "aw*x2*y")

  private[graft] val hubIrlsIters = 2 // after the OLS init solve

  /** A45: Huber-robust regression (sklearn HuberRegressor intent —
    * the M-estimator via IRLS with the classic Huber ψ, fixed
    * δ = [[HubDelta]] cents) of price cents on (quantity, discount):
    * the ROBUST member of the regression family (A9 OLS / A9c ridge /
    * A42 lasso / A44 enet — those reweight nothing; this one
    * down-weights outliers by w = min(1, δ/|r|)). Determinism: the
    * per-row prediction quantizes to exact cents immediately
    * ([[hubPredSql]]), so the residual is an exact integer and the
    * Huber weight is an exact e6 INTEGRAL DIVISION — every weighted
    * moment is exact DECIMAL(38,0) and the only remaining float work
    * is the shared 3×3 adjugate solve on a 1-row frame. Fit = OLS
    * init solve + 2 IRLS passes; a final pass publishes the outlier
    * census. 4 linear fact scans at any scale, zero shuffles beyond
    * the 1-row aggregates.
    */
  def qHuber(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // Per-row arithmetic runs in LONG (r15 optimization, guide §2.3
    // narrower types / §4 expression cost): every per-row quantity is
    // domain-bounded — x1 ≤ 50, x2 ≤ 10, y ≤ ~2·10⁷ cents, aw ≤ 10⁶ —
    // so the largest product aw·x1·y ≤ ~10¹⁵ ≪ 2⁶³ at ANY corpus size
    // (bounds are per-row domains, not corpus aggregates). Only the
    // cross-row SUM needs DECIMAL(38,0); each product casts to decimal
    // at the aggregate input, so the sums are bit-identical to the
    // previous all-DECIMAL formulation while the hot loop does long
    // multiplies instead of BigDecimal ones.
    def base = lineitem(s, dir)
      .select(col("l_quantity").cast("long").as("x1"),
              round(col("l_discount") * 100, 0).cast("long").as("x2"),
              round(col("l_extendedprice") * 100, 0).cast("long").as("y"))
      .withColumn("x1f", col("x1").cast("double"))
      .withColumn("x2f", col("x2").cast("double"))
    def solve(weighted: DataFrame): DataFrame = {
      val aggs = hubSumDefs.map { case (nm, f) =>
        sum(expr(f).cast(dec)).cast(dec).as(nm) }
      val sums = weighted.agg(aggs.head, aggs.tail: _*)
      hubSolveDerivs.foldLeft(sums) {
        case (acc, (nm, f)) => acc.withColumn(nm, expr(f))
      }.select(col("nb0").as("b0"), col("nb1").as("b1"), col("nb2").as("b2"))
    }
    // ADVICE r15 (overflow posture of the r15 LONG rewrite): the
    // CAST(double AS BIGINT) in hubPredSql SATURATES at ±2^63 where the
    // old DECIMAL(38,0) cast was exact to 1e38. Under the documented
    // per-row domain bounds (x1 ≤ 50, x2 ≤ 10, y ≤ ~2e7 cents) any
    // coefficient magnitude below ~1.5e17 keeps |pred| ≪ 2^63; the OLS
    // init on this data yields |b| < 1e7 (price cents over unit
    // regressors), 10 orders of magnitude of headroom, and IRLS weights
    // only shrink residual influence. A degenerate near-zero-determinant
    // init — impossible for the full-rank (1, x1, x2) design over the
    // 561-cell domain — is the only path to saturation; this comment
    // records that the overflow BEHAVIOR (saturate vs exact) changed
    // deliberately with the r15 LONG pipeline.
    // OLS init: unit weights (the aw ≡ 1e6 pass — e6 cancels in the solve)
    var w = graft.core.Materialize.pin(
      solve(base.withColumn("aw", lit(1000000L))))
    for (_ <- 1 to hubIrlsIters) {
      val weighted = base.crossJoin(broadcast(w))
        .withColumn("pred", expr(s"CAST($hubPredSql AS BIGINT)"))
        .withColumn("r", col("y") - col("pred"))
        .withColumn("aw",
          expr(s"CASE WHEN abs(r) <= $HubDelta THEN 1000000L " +
               s"ELSE ${HubDelta}L * 1000000L div abs(r) END"))
      val next = graft.core.Materialize.pin(solve(weighted))
      graft.core.Materialize.release(w)
      w = next
    }
    val out = base.crossJoin(broadcast(w))
      .withColumn("pred", expr(s"CAST($hubPredSql AS BIGINT)"))
      .withColumn("r", col("y") - col("pred"))
      .groupBy(col("b0"), col("b1"), col("b2"))
      .agg(count(lit(1)).as("n_rows"),
           sum((abs(col("r")) > HubDelta).cast("long")).as("n_out"))
      .select(dec6(col("b0")).as("b0"), dec6(col("b1")).as("b1"),
              dec6(col("b2")).as("b2"), col("n_rows"),
              col("n_out").cast("long").as("n_out"))
    out
  }

  /** A42 standardization chain: centered second moments → the three
    * correlations the standardized lasso works on. Every step shared
    * formula text (the A33 rule).
    */
  private val lassoStdDerivs: Seq[(String, String)] = Seq(
    "a11" -> "q11d - (s1d*s1d)/nd",
    "a12" -> "q12d - (s1d*s2d)/nd",
    "a22" -> "q22d - (s2d*s2d)/nd",
    "ayy" -> "qyyd - (syd*syd)/nd",
    "b1"  -> "q1yd - (s1d*syd)/nd",
    "b2"  -> "q2yd - (s2d*syd)/nd",
    "r12" -> "a12/(sqrt(a11)*sqrt(a22))",
    "r1y" -> "b1/(sqrt(a11)*sqrt(ayy))",
    "r2y" -> "b2/(sqrt(a22)*sqrt(ayy))")

  /** A42 coordinate-descent sweep: each coordinate's partial
    * correlation soft-thresholded at α = 0.005 (unit diagonal after
    * standardization, so the update divides by 1). One shared text per
    * step — both engines run the identical IEEE sequence.
    */
  private val lassoIterDerivs: Seq[(String, String)] = Seq(
    "rr1" -> "r1y - r12*w2",
    "w1n" -> ("CASE WHEN rr1 > 0.005 THEN rr1 - 0.005 " +
              "WHEN rr1 < -0.005 THEN rr1 + 0.005 ELSE 0.0 END"),
    "rr2" -> "r2y - r12*w1n",
    "w2n" -> ("CASE WHEN rr2 > 0.005 THEN rr2 - 0.005 " +
              "WHEN rr2 < -0.005 THEN rr2 + 0.005 ELSE 0.0 END"))

  /** A42 back-transform: standardized coefficients → raw cents scale
    * and the intercept. */
  private val lassoOutDerivs: Seq[(String, String)] = Seq(
    "w1r" -> "w1 * (sqrt(ayy)/sqrt(a11))",
    "w2r" -> "w2 * (sqrt(ayy)/sqrt(a22))",
    "b0r" -> "syd/nd - w1r*(s1d/nd) - w2r*(s2d/nd)")

  /** Moment columns every lasso iteration frame carries. */
  private val lassoCarry = Seq("nd", "s1d", "s2d", "syd",
    "a11", "a22", "ayy", "r12", "r1y", "r2y")

  private val lassoSweeps = 12

  /** A42: lasso regression (sklearn Lasso, α=0.005 on standardized
    * inputs) of price cents on (quantity, discount) — the SPARSE
    * member of the moments family (A9 OLS / A9c ridge / A32 ridge
    * path): coordinate descent needs ONLY the centered second moments,
    * so fit = the same ONE exact-integer moment scan as OLS, then 12
    * soft-threshold sweeps ([[lassoIterDerivs]]) on a 1-row frame —
    * convergence is geometric in r12², and every float step is shared
    * formula text (no quantization needed anywhere: the whole
    * derivation is rational arithmetic from exact integers, identical
    * cross-engine by op sequence). α sits between the two features'
    * standardized correlations at the gate scale, so the weaker one
    * is driven EXACTLY to zero while the stronger survives — the
    * lasso's defining selection behavior, published as nnz. At 100 TB:
    * one scan + corpus-independent sweeps.
    */
  def qLasso(s: SparkSession, dir: String): DataFrame =
    cdFit(s, dir, lassoIterDerivs)

  /** A44 coordinate-descent sweep: ElasticNet's update — the lasso
    * soft-threshold at α·l1_ratio, then shrink by 1 + α·(1−l1_ratio)
    * (sklearn ElasticNet(alpha=0.01, l1_ratio=0.5) on standardized
    * unit-diagonal inputs: threshold 0.005, divisor 1.005). One shared
    * text per step — both engines run the identical IEEE sequence.
    */
  private val enetIterDerivs: Seq[(String, String)] = Seq(
    "rr1" -> "r1y - r12*w2",
    "w1n" -> ("CASE WHEN rr1 > 0.005 THEN (rr1 - 0.005)/1.005 " +
              "WHEN rr1 < -0.005 THEN (rr1 + 0.005)/1.005 ELSE 0.0 END"),
    "rr2" -> "r2y - r12*w1n",
    "w2n" -> ("CASE WHEN rr2 > 0.005 THEN (rr2 - 0.005)/1.005 " +
              "WHEN rr2 < -0.005 THEN (rr2 + 0.005)/1.005 ELSE 0.0 END"))

  /** The shared A42/A44 coordinate-descent engine: ONE exact-integer
    * moment scan of the fact, the standardization chain, `sweeps`
    * soft-threshold sweeps of `iterDerivs` on a 1-row frame, the
    * back-transform, and the published (std coefs, cents coefs,
    * intercept, nnz) frame. Lasso and ElasticNet differ ONLY in the
    * per-sweep update texts.
    */
  private def cdFit(s: SparkSession, dir: String,
                    iterDerivs: Seq[(String, String)]): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = lineitem(s, dir)
      .select(col("l_quantity").cast("decimal(20,0)").as("x1"),
              round(col("l_discount") * 100, 0).cast("decimal(20,0)").as("x2"),
              round(col("l_extendedprice") * 100, 0).cast("decimal(20,0)").as("y"))
      .agg(count(lit(1)).cast(dec).as("nh"),
           sum(col("x1")).cast(dec).as("s1h"),
           sum(col("x2")).cast(dec).as("s2h"),
           sum(col("y")).cast(dec).as("syh"),
           sum(col("x1") * col("x1")).cast(dec).as("q11h"),
           sum(col("x1") * col("x2")).cast(dec).as("q12h"),
           sum(col("x2") * col("x2")).cast(dec).as("q22h"),
           sum(col("x1") * col("y")).cast(dec).as("q1yh"),
           sum(col("x2") * col("y")).cast(dec).as("q2yh"),
           sum(col("y") * col("y")).cast(dec).as("qyyh"))
    val d0 = m.select(
      col("nh").cast("double").as("nd"), col("s1h").cast("double").as("s1d"),
      col("s2h").cast("double").as("s2d"), col("syh").cast("double").as("syd"),
      col("q11h").cast("double").as("q11d"), col("q12h").cast("double").as("q12d"),
      col("q22h").cast("double").as("q22d"), col("q1yh").cast("double").as("q1yd"),
      col("q2yh").cast("double").as("q2yd"), col("qyyh").cast("double").as("qyyd"))
    val std = lassoStdDerivs.foldLeft(d0) {
      case (acc, (nm, f)) => acc.withColumn(nm, expr(f))
    }
    var fr = std.withColumn("w1", lit(0.0)).withColumn("w2", lit(0.0))
    for (_ <- 1 to lassoSweeps) {
      val it = iterDerivs.foldLeft(fr) {
        case (acc, (nm, f)) => acc.withColumn(nm, expr(f))
      }
      fr = it.select((lassoCarry.map(col) :+
        col("w1n").as("w1") :+ col("w2n").as("w2")): _*)
    }
    val out = lassoOutDerivs.foldLeft(fr) {
      case (acc, (nm, f)) => acc.withColumn(nm, expr(f))
    }
    out.select(dec6(col("w1")).as("w1_std"), dec6(col("w2")).as("w2_std"),
               dec6(col("w1r")).as("w1_cents"), dec6(col("w2r")).as("w2_cents"),
               dec6(col("b0r")).as("b0_cents"),
               ((col("w1") =!= 0.0).cast("int") +
                (col("w2") =!= 0.0).cast("int")).cast("long").as("nnz"))
  }

  /** The shared A42/A44 oracle: the same CTE chain machine as the
    * engine's [[cdFit]] — moments, standardization, `lassoSweeps`
    * sweeps of `iterDerivs`, back-transform — every float step the
    * IDENTICAL formula text the Spark side runs. */
  private def cdOracle(iterDerivs: Seq[(String, String)]): String = {
    val stdChain = lassoStdDerivs.zipWithIndex.map { case ((nm, f), i) =>
      s"t${i + 1} AS (SELECT *, $f AS $nm FROM t$i)"
    }.mkString(",\n")
    val stdLast = s"t${lassoStdDerivs.length}"
    val carry = lassoCarry.mkString(", ")
    def iter(i: Int): String = {
      val prev = if (i == 1) "w0cte" else s"w${i - 1}"
      val chain = iterDerivs.zipWithIndex.map { case ((nm, f), j) =>
        s"s${i}_${j + 1} AS (SELECT *, $f AS $nm FROM s${i}_$j)"
      }.mkString(",\n")
      s"""s${i}_0 AS (SELECT * FROM $prev),
         |$chain,
         |w$i AS (SELECT $carry, w1n AS w1, w2n AS w2
         |  FROM s${i}_${iterDerivs.length})""".stripMargin
    }
    val iters = (1 to lassoSweeps).map(iter).mkString(",\n")
    val outChain = lassoOutDerivs.zipWithIndex.map { case ((nm, f), i) =>
      s"o${i + 1} AS (SELECT *, $f AS $nm FROM o$i)"
    }.mkString(",\n")
    s"""WITH b AS (SELECT CAST(l_quantity AS HUGEINT) AS x1,
      |    CAST(ROUND(l_discount*100,0) AS HUGEINT) AS x2,
      |    CAST(ROUND(l_extendedprice*100,0) AS HUGEINT) AS y FROM lineitem),
      |mom AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nh,
      |    SUM(x1) AS s1h, SUM(x2) AS s2h, SUM(y) AS syh,
      |    SUM(x1*x1) AS q11h, SUM(x1*x2) AS q12h, SUM(x2*x2) AS q22h,
      |    SUM(x1*y) AS q1yh, SUM(x2*y) AS q2yh, SUM(y*y) AS qyyh FROM b),
      |t0 AS (SELECT CAST(nh AS DOUBLE) AS nd, CAST(s1h AS DOUBLE) AS s1d,
      |    CAST(s2h AS DOUBLE) AS s2d, CAST(syh AS DOUBLE) AS syd,
      |    CAST(q11h AS DOUBLE) AS q11d, CAST(q12h AS DOUBLE) AS q12d,
      |    CAST(q22h AS DOUBLE) AS q22d, CAST(q1yh AS DOUBLE) AS q1yd,
      |    CAST(q2yh AS DOUBLE) AS q2yd, CAST(qyyh AS DOUBLE) AS qyyd FROM mom),
      |$stdChain,
      |w0cte AS (SELECT $carry, 0.0 AS w1, 0.0 AS w2 FROM $stdLast),
      |$iters,
      |o0 AS (SELECT * FROM w$lassoSweeps),
      |$outChain
      |SELECT CAST(ROUND(w1, 6) AS DECIMAL(18,6))::DOUBLE AS w1_std,
      |  CAST(ROUND(w2, 6) AS DECIMAL(18,6))::DOUBLE AS w2_std,
      |  CAST(ROUND(w1r, 6) AS DECIMAL(18,6))::DOUBLE AS w1_cents,
      |  CAST(ROUND(w2r, 6) AS DECIMAL(18,6))::DOUBLE AS w2_cents,
      |  CAST(ROUND(b0r, 6) AS DECIMAL(18,6))::DOUBLE AS b0_cents,
      |  CAST((CASE WHEN w1 <> 0.0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN w2 <> 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz
      |FROM o${lassoOutDerivs.length}""".stripMargin
  }

  /** A44: ElasticNet (sklearn ElasticNet(alpha=0.01, l1_ratio=0.5),
    * standardized) of price cents on (quantity, discount) — the
    * COMBINED-penalty member completing the regularization family (A9
    * OLS / A9c ridge / A42 lasso): the identical sufficient-statistic
    * collapse (fit = ONE exact-integer moment scan + 12 corpus-
    * independent sweeps on a 1-row frame), with the [[enetIterDerivs]]
    * update — soft-threshold at the l1 share of the penalty, then
    * ridge shrinkage by 1 + α·(1−l1). Same α split as A42's published
    * contrast: the lasso member drives the weak feature to exact zero
    * while the elastic net's ridge term also SHRINKS the surviving
    * coefficient — the family's defining difference, visible in the
    * published (w_std, nnz) against q_lasso's. At 100 TB: one scan +
    * corpus-independent sweeps.
    */
  def qElastic(s: SparkSession, dir: String): DataFrame =
    cdFit(s, dir, enetIterDerivs)

  /** A43 E-step texts: per-cell component densities (the shared 1/√2π
    * cancels in the responsibility) and the responsibility quantized
    * to an e6 integer IMMEDIATELY after the exp pair (the A40 rule) —
    * every M-step sum is then exact integer arithmetic.
    */
  private[graft] val gmmD1Sql =
    "pi1 * exp(0.0 - ((xf - mu1)*(xf - mu1))/(2.0*va1)) / sqrt(va1)"
  private[graft] val gmmD2Sql =
    "pi2 * exp(0.0 - ((xf - mu2)*(xf - mu2))/(2.0*va2)) / sqrt(va2)"
  private[graft] val gmmR6Sql = "ROUND(1000000.0 * d1 / (d1 + d2), 0)"

  /** A43 M-step: exact integer complements, then the closed-form
    * float updates — ONE shared text per step. */
  private[graft] val gmmCompDefs: Seq[(String, String)] = Seq(
    "tn6" -> "tn * 1000000",
    "gw2" -> "tn * 1000000 - gw1",
    "gx2" -> "tx * 1000000 - gx1",
    "gq2" -> "tq * 1000000 - gq1")
  private[graft] val gmmSolveDerivs: Seq[(String, String)] = Seq(
    "mu1n" -> "CAST(gx1 AS DOUBLE)/CAST(gw1 AS DOUBLE)",
    "va1n" -> "CAST(gq1 AS DOUBLE)/CAST(gw1 AS DOUBLE) - mu1n*mu1n",
    "mu2n" -> "CAST(gx2 AS DOUBLE)/CAST(gw2 AS DOUBLE)",
    "va2n" -> "CAST(gq2 AS DOUBLE)/CAST(gw2 AS DOUBLE) - mu2n*mu2n",
    "pi1n" -> "CAST(gw1 AS DOUBLE)/CAST(tn6 AS DOUBLE)",
    "pi2n" -> "CAST(gw2 AS DOUBLE)/CAST(tn6 AS DOUBLE)")

  private[graft] val gmmIters = 5

  /** A43: two-component 1-D Gaussian mixture via EM (sklearn
    * GaussianMixture(n_components=2) intent) over the quantity
    * distribution — the UNSUPERVISED density member of the
    * domain-collapsed family (A40 logistic / A41 QDA are its
    * supervised cousins): quantity is domain-bounded, so the E-step
    * runs over ≤50 cells; responsibilities e6-quantize right after
    * the exp pair ([[gmmR6Sql]]), making every M-step sum EXACT
    * integer arithmetic (order-independent), and the parameter
    * updates are shared-text closed forms. Deterministic symmetric-
    * breaking init (μ = 15/35, σ² = 100, π = ½). 5 EM iterations on
    * the tiny frame; ONE corpus pass total.
    */
  def qGmm(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus pass collapses the fact to the ≤50-cell quantity
    // histogram (domain-bounded at any corpus size — a bounded fit
    // artifact), and the 5 EM iterations run on the driver (r15
    // optimization, guide §1.2/§5 — the qLogistic rationale: 5
    // distributed aggregate+broadcast rounds over ≤50 rows were pure
    // machinery). The driver loop replays the shared float texts
    // op-for-op: E-step densities in the gmmD1/D2 order,
    // responsibility e6-quantized via the identical BigDecimal HALF_UP
    // round, M-step sums as exact BigInt (== DECIMAL(38,0)), solve
    // chain in the gmmSolveDerivs order — bit-identical parameters,
    // proven by the unchanged DuckDB oracle hash.
    val cellRows = lineitem(s, dir)
      .select(col("l_quantity").cast("decimal(6,0)").as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("c"))
      .select(col("x").cast("long").as("x"), col("c"))
      .collect()
    // loud guard on the domain bound (r15 verdict item 9): l_quantity
    // is 1..50, so the histogram is ≤50 cells at any corpus size
    require(cellRows.length <= 50,
      s"qGmm quantity histogram exceeded its domain bound: ${cellRows.length} > 50")
    val xs = cellRows.map(_.getLong(0))
    val cs = cellRows.map(_.getLong(1))
    def roundE0(d: Double): Double =
      BigDecimal(d).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def toDouble(b: BigInt): Double =
      new java.math.BigDecimal(b.bigInteger).doubleValue
    var mu1 = 15.0; var va1 = 100.0; var pi1 = 0.5
    var mu2 = 35.0; var va2 = 100.0; var pi2 = 0.5
    for (_ <- 1 to gmmIters) {
      var tn = BigInt(0); var tx = BigInt(0); var tq = BigInt(0)
      var gw1 = BigInt(0); var gx1 = BigInt(0); var gq1 = BigInt(0)
      var i = 0
      while (i < xs.length) {
        val xf = xs(i).toDouble
        // gmmD1Sql / gmmD2Sql / gmmR6Sql, op-for-op
        val d1 = pi1 * java.lang.Math.exp(
          0.0 - ((xf - mu1) * (xf - mu1)) / (2.0 * va1)) / java.lang.Math.sqrt(va1)
        val d2 = pi2 * java.lang.Math.exp(
          0.0 - ((xf - mu2) * (xf - mu2)) / (2.0 * va2)) / java.lang.Math.sqrt(va2)
        // ADVICE r15: the driver replay diverges from Spark ROUND
        // semantics on non-finite inputs — Spark's CAST-to-DECIMAL
        // nulls a NaN responsibility (null-skipped in sums) while
        // BigDecimal(NaN) throws. Both densities underflowing to 0 is
        // impossible for quantity in [1,50] under these inits; make
        // that assumption loud and deliberate instead of relying on
        // NumberFormatException
        require(d1 + d2 > 0.0,
          s"qGmm responsibilities degenerate at x=$xf: d1=$d1 d2=$d2")
        val r6 = BigDecimal(roundE0(1000000.0 * d1 / (d1 + d2))).toBigInt
        val x = BigInt(xs(i)); val c = BigInt(cs(i))
        tn += c; tx += c * x; tq += c * x * x
        gw1 += c * r6; gx1 += c * r6 * x; gq1 += c * r6 * x * x
        i += 1
      }
      // gmmCompDefs + gmmSolveDerivs, op-for-op
      val tn6 = tn * 1000000
      val gw2 = tn * 1000000 - gw1
      val gx2 = tx * 1000000 - gx1
      val gq2 = tq * 1000000 - gq1
      val mu1n = toDouble(gx1) / toDouble(gw1)
      val va1n = toDouble(gq1) / toDouble(gw1) - mu1n * mu1n
      val mu2n = toDouble(gx2) / toDouble(gw2)
      val va2n = toDouble(gq2) / toDouble(gw2) - mu2n * mu2n
      val pi1n = toDouble(gw1) / toDouble(tn6)
      val pi2n = toDouble(gw2) / toDouble(tn6)
      mu1 = mu1n; va1 = va1n; pi1 = pi1n
      mu2 = mu2n; va2 = va2n; pi2 = pi2n
    }
    // when(true, …) preserves the previously-nullable published columns
    s.range(1).select(
      dec6(when(lit(true), lit(mu1))).as("mu1"),
      dec6(when(lit(true), lit(va1))).as("var1"),
      dec6(when(lit(true), lit(pi1))).as("pi1"),
      dec6(when(lit(true), lit(mu2))).as("mu2"),
      dec6(when(lit(true), lit(va2))).as("var2"),
      dec6(when(lit(true), lit(pi2))).as("pi2"))
  }

  /** The A41 derivation chain: per-class means, UNBIASED (n_c − 1)
    * covariances (sklearn QDA's scaling), 2×2 inverses, log-dets and
    * log-priors — every float step from the shared d0 moment columns,
    * applied with `expr` on the Spark side and emitted verbatim as a
    * CTE chain in the oracle (the A33 rule).
    */
  private val qdaDerivs: Seq[(String, String)] = Seq(
    "m1p"  -> "s1p / np",   "m2p" -> "s2p / np",
    "m1n"  -> "s1n / nn0",  "m2n" -> "s2n / nn0",
    "v11p" -> "(q11p - (s1p*s1p)/np) / (np - 1.0)",
    "v12p" -> "(q12p - (s1p*s2p)/np) / (np - 1.0)",
    "v22p" -> "(q22p - (s2p*s2p)/np) / (np - 1.0)",
    "v11n" -> "(q11n - (s1n*s1n)/nn0) / (nn0 - 1.0)",
    "v12n" -> "(q12n - (s1n*s2n)/nn0) / (nn0 - 1.0)",
    "v22n" -> "(q22n - (s2n*s2n)/nn0) / (nn0 - 1.0)",
    "detp" -> "v11p*v22p - v12p*v12p",
    "detn" -> "v11n*v22n - v12n*v12n",
    "i11p" -> "v22p/detp", "i12p" -> "0.0 - v12p/detp", "i22p" -> "v11p/detp",
    "i11n" -> "v22n/detn", "i12n" -> "0.0 - v12n/detn", "i22n" -> "v11n/detn",
    "ldp"  -> "ln(detp)",  "ldn" -> "ln(detn)",
    "lpr"  -> "ln(np / (np + nn0))", "lnr" -> "ln(nn0 / (np + nn0))")

  /** The A41 per-row discriminant comparison — one shared text so the
    * float op sequence is identical cross-engine. */
  private val qdaScoreSql =
    "(0.0 - 0.5*ldp" +
      " - 0.5*((fx1-m1p)*(i11p*(fx1-m1p)+i12p*(fx2-m2p))" +
            " + (fx2-m2p)*(i12p*(fx1-m1p)+i22p*(fx2-m2p))) + lpr)" +
    " > (0.0 - 0.5*ldn" +
      " - 0.5*((fx1-m1n)*(i11n*(fx1-m1n)+i12n*(fx2-m2n))" +
            " + (fx2-m2n)*(i12n*(fx1-m1n)+i22n*(fx2-m2n))) + lnr)"

  /** Columns of the broadcast QDA fit consumed by the score text. */
  private val qdaFitCols = Seq(
    "m1p", "m2p", "i11p", "i12p", "i22p", "ldp", "lpr",
    "m1n", "m2n", "i11n", "i12n", "i22n", "ldn", "lnr")

  /** A41: quadratic discriminant analysis (sklearn
    * QuadraticDiscriminantAnalysis) — per-class covariances instead of
    * A39's pooled one, so the boundary is a conic: fit = the SAME
    * single conditional-moment pass as LDA ([[condMoments2]] — the two
    * classifiers literally share their scan), per-class 2×2 inverses /
    * log-dets / log-priors via the [[qdaDerivs]] chain on a 1-row
    * frame, and the evaluation pass scores the whole fact against the
    * broadcast quadratic discriminant ([[qdaScoreSql]]) → confusion
    * matrix. Two corpus passes at any scale.
    */
  def qQda(s: SparkSession, dir: String): DataFrame = {
    val der = qdaDerivs.foldLeft(condMoments2(s, dir)) {
      case (acc, (nm, f)) => acc.withColumn(nm, expr(f))
    }
    val fit = broadcast(der.select(qdaFitCols.map(col): _*))
    lineitem(s, dir)
      .select(col("l_quantity").cast("long").cast("double").as("fx1"),
              round(col("l_discount") * 100, 0).cast("long").cast("double").as("fx2"),
              (col("l_returnflag") === "R").cast("int").as("actual"))
      .crossJoin(fit)
      .withColumn("pred", expr(qdaScoreSql).cast("int"))
      .groupBy(qdaFitCols.map(col): _*)
      .agg(sum(expr("pred * actual")).as("tp"),
           sum(expr("pred * (1 - actual)")).as("fp"),
           sum(expr("(1 - pred) * actual")).as("fn"),
           sum(expr("(1 - pred) * (1 - actual)")).as("tn"))
      .select(dec6(col("m1p")).as("m1p"), dec6(col("m2p")).as("m2p"),
              dec6(col("m1n")).as("m1n"), dec6(col("m2n")).as("m2n"),
              dec6(col("ldp")).as("ldp"), dec6(col("ldn")).as("ldn"),
              col("tp"), col("fp"), col("fn"), col("tn"))
  }

  /** G2 (query-backed): global raster statistics where the AGGREGATION
    * ITSELF is pushed into the DataSource V2 source
    * (`SupportsPushDownAggregates` on
    * [[graft.sources.v2.RasterSource]]): each stripe reduces to one
    * partial row INSIDE the reader and Spark's final aggregate merges
    * ≤8 stripe partials — at 100 TB no cell row ever crosses the
    * source boundary (the storage-side aggregation posture of real
    * columnar sources: parquet footer stats, Delta/Iceberg manifests).
    * Distinct grid (200×100) from A35/G1 so the gates cannot mask each
    * other; the oracle recomputes the md5 cell formula, blind to the
    * pushdown. DataSourceV2Spec locks that the plan's scan really is
    * the pushed-agg scan (5-field readSchema, no cell columns).
    */
  def qRasterAgg(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.v2.RasterSource")
      .option("w", 200).option("h", 100).load()
      .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
           sum(col("v")).as("vsum"), min(col("v")).as("vmin"),
           max(col("v")).as("vmax"))
      .select(col("n_cells"), col("n_valid"), col("vsum"), col("vmin"),
              col("vmax"),
              dec4(col("vsum").cast("double") / col("n_valid")).as("mean_v"))

  /** The shared per-term SSE-from-moments expression for A31/A32 —
    * ONE formula string used verbatim by both the Spark `expr` and the
    * DuckDB oracle, so the IEEE op sequence is identical by
    * construction (the strongest form of the cross-engine float rule).
    */
  private val sseFromMomentsSql =
    "(((((syy - (2.0*b0)*sy) - (2.0*w)*sxy) + ((2.0*b0)*w)*sx) + (nd*b0)*b0) + (w*w)*sxx"
  // closing paren lives in the caller so the constant reads as a term

  /** A31: k-fold cross-validation (k=5) of the simple linear estimator
    * in exactly TWO corpus passes regardless of k — the distributed
    * form of sklearn's cross_val_score: pass 1 is ONE aggregate of the
    * exact integer sufficient statistics (n, Σx, Σy, Σx², Σxy) GROUPED
    * BY fold (fold = li_id % 5, deterministic); each fold's training
    * moments are then total − fold (exact DECIMAL(38,0) subtraction —
    * no second scan, no per-fold refit), the closed-form fit runs on
    * the 5-row frame, and pass 2 scores every held-out row against its
    * fold's broadcast coefficients. Errors quantize to exact
    * centi-quantity integers (the A26 rule) so the per-fold squared
    * sums are order-independent; RMSE is one IEEE sqrt of a quotient
    * of exact operands. At 100 TB: CV cost is 2 scans + a 5-row
    * broadcast — not k refits.
    */
  def qCrossVal(s: SparkSession, dir: String): DataFrame = {
    val base = lineitem(s, dir).select(
      ((col("l_orderkey") * 8 + col("l_linenumber")) % 5).as("fold"),
      round(col("l_extendedprice") * 100, 0).cast("decimal(20,0)").as("x"),
      col("l_quantity").cast("decimal(20,0)").as("y"))
    val fm = base.groupBy(col("fold"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
           sum(col("x")).cast("decimal(38,0)").as("sx"),
           sum(col("y")).cast("decimal(38,0)").as("sy"),
           sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
           sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"))
    val tot = fm.agg(sum(col("n")).as("tn"), sum(col("sx")).as("tsx"),
                     sum(col("sy")).as("tsy"), sum(col("sxx")).as("tsxx"),
                     sum(col("sxy")).as("tsxy"))
    val coefs = fm.crossJoin(broadcast(tot))
      .select(col("fold"), col("n").cast("long").as("n_test"),
        (col("tn") - col("n")).cast("double").as("ntr"),
        (col("tsx") - col("sx")).cast("double").as("trx"),
        (col("tsy") - col("sy")).cast("double").as("try"),
        (col("tsxx") - col("sxx")).cast("double").as("trxx"),
        (col("tsxy") - col("sxy")).cast("double").as("trxy"))
      .withColumn("w", (col("ntr") * col("trxy") - col("trx") * col("try")) /
                       (col("ntr") * col("trxx") - col("trx") * col("trx")))
      .withColumn("b0", (col("try") - col("w") * col("trx")) / col("ntr"))
    val errs = base.join(broadcast(coefs.select(col("fold"), col("w"), col("b0"))), "fold")
      .select(col("fold"),
        (col("y").cast("double") * 100.0 -
         round((col("b0") + col("w") * col("x").cast("double")) * 100.0, 0))
          .cast("decimal(19,0)").as("e"))
      .groupBy(col("fold"))
      .agg(sum(col("e") * col("e")).as("sse"), count(lit(1)).cast("double").as("nt"))
    // both sides are 5-row frames, but their lineage-estimated stats can
    // exceed the broadcast threshold at larger SFs and plan a SortMergeJoin
    // — hint the meet explicitly
    coefs.join(broadcast(errs), "fold")
      .select(col("fold"), col("ntr").cast("long").as("n_train"), col("n_test"),
        graft.functions.dec6(col("w")).as("slope"),
        graft.functions.dec6(col("b0")).as("intercept"),
        dec4(sqrt(col("sse").cast("double") / col("nt")) / 100.0).as("rmse"))
      .orderBy(col("fold"))
  }

  /** The A33 derivation chain: every float step from raw moments to the
    * three R² figures, as (name, formula) SQL text — applied in order
    * with `expr` on the Spark side and emitted verbatim as a chain of
    * CTEs in the DuckDB oracle, so the IEEE op sequence is shared BY
    * CONSTRUCTION (the [[sseFromMomentsSql]] rule, generalized to the
    * whole derivation). The solve sequences mirror the A9c ridge
    * oracle's Cramer forms.
    */
  private val featImpDerivs: Seq[(String, String)] = Seq(
    "a11" -> "s11 - (s1*s1)/nd",
    "a12" -> "s12 - (s1*s2)/nd",
    "a22" -> "s22 - (s2*s2)/nd",
    "b1"  -> "s1y - (s1*sy)/nd",
    "b2"  -> "s2y - (s2*sy)/nd",
    "syc" -> "syy - (sy*sy)/nd",
    "det" -> "a11*a22 - a12*a12",
    "w1"  -> "(b1*a22 - b2*a12)/det",
    "w2"  -> "(a11*b2 - a12*b1)/det",
    "ssef" -> "syc - (w1*b1 + w2*b2)",
    "r2_full" -> "1.0 - ssef/syc",
    "r2o1" -> "((b1*b1)/a11)/syc",
    "r2o2" -> "((b2*b2)/a22)/syc")

  /** A33: drop-one feature importance from SUFFICIENT STATISTICS — the
    * model-diagnostics step (sklearn's permutation_importance intent)
    * at ZERO extra corpus passes: for the 2-feature OLS (quantity,
    * discount → price cents), the full-model R² and each
    * leave-one-feature-out R² are closed forms over the ten exact
    * integer moments of ONE aggregate; importance_j = R²_full −
    * R²_without_j. Every float step is a [[featImpDerivs]] formula
    * shared verbatim with the oracle. At 100 TB: model audit = the
    * same single scan the fit already does, then arithmetic on a 1-row
    * frame.
    */
  def qFeatImportance(s: SparkSession, dir: String): DataFrame = {
    val base = lineitem(s, dir).select(
      col("l_quantity").cast("decimal(20,0)").as("x1"),
      round(col("l_discount") * 100, 0).cast("decimal(20,0)").as("x2"),
      round(col("l_extendedprice") * 100, 0).cast("decimal(20,0)").as("y"))
    val m = base.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x1")).cast("decimal(38,0)").as("s1d"),
      sum(col("x2")).cast("decimal(38,0)").as("s2d"),
      sum(col("y")).cast("decimal(38,0)").as("syd"),
      sum(col("x1") * col("x1")).cast("decimal(38,0)").as("s11d"),
      sum(col("x1") * col("x2")).cast("decimal(38,0)").as("s12d"),
      sum(col("x2") * col("x2")).cast("decimal(38,0)").as("s22d"),
      sum(col("x1") * col("y")).cast("decimal(38,0)").as("s1yd"),
      sum(col("x2") * col("y")).cast("decimal(38,0)").as("s2yd"),
      sum(col("y") * col("y")).cast("decimal(38,0)").as("syyd"))
    val d0 = m.select(
      col("n").cast("double").as("nd"), col("s1d").cast("double").as("s1"),
      col("s2d").cast("double").as("s2"), col("syd").cast("double").as("sy"),
      col("s11d").cast("double").as("s11"), col("s12d").cast("double").as("s12"),
      col("s22d").cast("double").as("s22"), col("s1yd").cast("double").as("s1y"),
      col("s2yd").cast("double").as("s2y"), col("syyd").cast("double").as("syy"))
    val derived = featImpDerivs.foldLeft(d0) {
      case (acc, (nm, f)) => acc.withColumn(nm, expr(f))
    }
    derived.select(explode(array(
        struct(lit("x1").as("feature"), col("r2_full"),
               col("r2o2").as("r2_without"),
               (col("r2_full") - col("r2o2")).as("imp")),
        struct(lit("x2").as("feature"), col("r2_full"),
               col("r2o1").as("r2_without"),
               (col("r2_full") - col("r2o1")).as("imp")))).as("t"))
      .select(col("t.feature").as("feature"),
              graft.functions.dec6(col("t.r2_full")).as("r2_full"),
              graft.functions.dec6(col("t.r2_without")).as("r2_without"),
              graft.functions.dec6(col("t.imp")).as("importance"))
      .orderBy(col("feature"))
  }

  /** A32: ridge regularization path — hyperparameter grid search from
    * SUFFICIENT STATISTICS, i.e. at ZERO extra corpus passes: the
    * centered 1-feature ridge solution w(α) = (Σxy − ΣxΣy/n)/(Σx² −
    * (Σx)²/n + α) and its TRAINING SSE are both closed forms over the
    * same five exact integer moments (plus Σy²), so the whole α grid
    * {0, 10⁶, 10⁹} evaluates on a 1-row × 3-alpha broadcast frame
    * after ONE moment aggregate. The SSE-from-moments expression is
    * shared VERBATIM with the DuckDB oracle ([[sseFromMomentsSql]]) —
    * identical IEEE op sequence by construction. This is the shape
    * model selection takes at 100 TB: scan once, fit the whole grid
    * driver-free, pick α by the 3-row result.
    */
  def qRidgePath(s: SparkSession, dir: String): DataFrame = {
    val base = lineitem(s, dir).select(
      round(col("l_extendedprice") * 100, 0).cast("decimal(20,0)").as("x"),
      col("l_quantity").cast("decimal(20,0)").as("y"))
    val m = base.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sxd"),
      sum(col("y")).cast("decimal(38,0)").as("syd"),
      sum(col("x") * col("x")).cast("decimal(38,0)").as("sxxd"),
      sum(col("x") * col("y")).cast("decimal(38,0)").as("sxyd"),
      sum(col("y") * col("y")).cast("decimal(38,0)").as("syyd"))
    val alphas = { import s.implicits._; Seq(0.0, 1e6, 1e9).toDF("alpha") }
    m.crossJoin(broadcast(alphas))
      .select(col("alpha"),
        col("n").cast("double").as("nd"), col("sxd").cast("double").as("sx"),
        col("syd").cast("double").as("sy"), col("sxxd").cast("double").as("sxx"),
        col("sxyd").cast("double").as("sxy"), col("syyd").cast("double").as("syy"))
      .withColumn("w", (col("sxy") - col("sx") * col("sy") / col("nd")) /
                       ((col("sxx") - col("sx") * col("sx") / col("nd")) + col("alpha")))
      .withColumn("b0", (col("sy") - col("w") * col("sx")) / col("nd"))
      .withColumn("sse", expr(sseFromMomentsSql + ")"))
      .select(col("alpha"), graft.functions.dec6(col("w")).as("slope"),
        graft.functions.dec6(col("b0")).as("intercept"),
        dec4(sqrt(col("sse") / col("nd"))).as("rmse_train"))
      .orderBy(col("alpha"))
  }

  /** A36 float steps as shared formula text (the sseFromMomentsSql /
    * featImpDerivs rule): each string is applied with `expr` on the
    * Spark side and spliced verbatim into the oracle, so the IEEE op
    * sequence is identical by construction. Operands are exact
    * DECIMAL(38,0)/BIGINT moments (cast-exact into DOUBLE).
    */
  private val lcSlopeSql =
    "CAST(n_train * sxy - sx * sy AS DOUBLE) / CAST(n_train * sxx - sx * sx AS DOUBLE)"
  private val lcInterceptSql =
    "(CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE)) / CAST(n_train AS DOUBLE)"
  private val lcPredCentsSql =
    "CAST(ROUND(ROUND(b0 + b1 * l_quantity, 2) * 100, 0) AS BIGINT)"
  private val lcRmseSql =
    "SQRT(CAST(sse AS DOUBLE) / CAST(n_score AS DOUBLE)) / 100.0"

  /** A36: learning curve (sklearn model_selection.learning_curve
    * intent) from SUFFICIENT STATISTICS — training-size sweep at two
    * corpus passes TOTAL, not per size: pass 1 aggregates exact
    * integer OLS moments GROUPED BY a deterministic md5 decile of the
    * training sample, so every nested subset's moments are conditional
    * sums over a 10-row frame (subsets nest: decile < 2 ⊂ < 6 ⊂ all —
    * the hash-split C30 rule makes membership rerun-stable and
    * engine-portable); the three closed-form fits evaluate on a 3-row
    * stacked frame; pass 2 scores ALL three models against the full
    * fact in one scan (3-row broadcast crossed back, errors exact
    * cents per the A26 contract, SSE in DECIMAL(38,0)). Every float
    * step is shared formula text ([[lcSlopeSql]] etc.) — bit-identical
    * cross-engine. The production question it answers: is the model
    * moment-starved (rising curve → label more data) or saturated?
    */
  def qLearningCurve(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val t = withId(lineitem(s, dir).filter(col("l_orderkey") % 29 === 0))
      .select(
        (TF.hexPrefix52(concat(lit("lc|"), col("li_id"))) % 10).as("dk"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("y"))
    val mo = t.groupBy(col("dk")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    val fracs = Seq(2 -> "20", 6 -> "60", 10 -> "100")
    val condAggs = fracs.flatMap { case (f, tag) =>
      sum(when(col("dk") < f, col("n")).otherwise(0L)).as(s"n$tag") +:
        Seq("sx", "sy", "sxx", "sxy").map(c =>
          sum(when(col("dk") < f, col(c)).otherwise(0L)).cast(dec).as(s"$c$tag"))
    }
    val stacked = mo.agg(condAggs.head, condAggs.tail: _*).selectExpr(
      "stack(3, " + fracs.map { case (_, tag) =>
        s"${tag}L, n$tag, sx$tag, sy$tag, sxx$tag, sxy$tag"
      }.mkString(", ") + ") as (frac_pct, n_train, sx, sy, sxx, sxy)")
    val co = broadcast(stacked
      .withColumn("b1", expr(lcSlopeSql))
      .withColumn("b0", expr(lcInterceptSql)))
    lineitem(s, dir).crossJoin(co)
      .withColumn("e",
        expr(lcPredCentsSql) - round(col("l_extendedprice") * 100, 0).cast("long"))
      .groupBy(col("frac_pct"), col("n_train"), col("b1"), col("b0"))
      .agg(count(lit(1)).as("n_score"),
           sum((col("e") * col("e")).cast(dec)).as("sse"))
      .withColumn("rmse", dec4(expr(lcRmseSql)))
      .select(col("frac_pct"), col("n_train"),
              dec6(col("b1")).as("b1"), dec6(col("b0")).as("b0"), col("rmse"))
      .orderBy(col("frac_pct"))
  }

  /** A37 shared formula text (the featImpDerivs rule): per-feature
    * squared correlation with the target and the univariate
    * F-regression statistic F = r²/(1−r²)·(n−2), over exact integer
    * moments cast-exact into DOUBLE.
    */
  private def kbR2Sql(j: Int): String =
    s"((nd * s${j}y - s$j * sy) * (nd * s${j}y - s$j * sy)) / " +
      s"((nd * s$j$j - s$j * s$j) * (nd * syy - sy * sy))"
  private def kbFSql(j: Int): String =
    s"(r2_$j / (1.0 - r2_$j)) * (nd - 2.0)"

  /** A37: univariate feature selection (sklearn SelectKBest with
    * f_regression): per-feature F statistics against the price target
    * from ONE exact-integer moment aggregate — feature screening at
    * 100 TB is the same single scan the fit already does, then
    * arithmetic on a 1-row frame. Every float step is shared formula
    * text ([[kbR2Sql]]/[[kbFSql]]); the selection rank orders by the
    * ROUNDED F (identical both engines) with the feature name as the
    * tie-break.
    */
  def qSelectKbest(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // r16 (the q_huber r15 rule, guide §2.3): per-row moment products
    // in LONG — x1 ≤ 50, x2 ≤ 10, x3 ≤ 8, y ≤ ~2e7 cents are PER-ROW
    // domain bounds (max product y·y ≈ 4e14 ≪ 2^63 at ANY corpus size;
    // ANSI mode makes a violation loud); only the sums carry DECIMAL
    // headroom, cast at the aggregate input — bit-identical sums, no
    // per-row BigDecimal multiplies
    val base = lineitem(s, dir).select(
      col("l_quantity").cast("long").as("x1"),
      round(col("l_discount") * 100, 0).cast("long").as("x2"),
      round(col("l_tax") * 100, 0).cast("long").as("x3"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("y"))
    val m = base.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("y").cast(dec)).as("syd"),
      sum((col("y") * col("y")).cast(dec)).as("syyd"),
      sum(col("x1").cast(dec)).as("s1d"),
      sum((col("x1") * col("x1")).cast(dec)).as("s11d"),
      sum((col("x1") * col("y")).cast(dec)).as("s1yd"),
      sum(col("x2").cast(dec)).as("s2d"),
      sum((col("x2") * col("x2")).cast(dec)).as("s22d"),
      sum((col("x2") * col("y")).cast(dec)).as("s2yd"),
      sum(col("x3").cast(dec)).as("s3d"),
      sum((col("x3") * col("x3")).cast(dec)).as("s33d"),
      sum((col("x3") * col("y")).cast(dec)).as("s3yd"))
    val d0 = m.select(
      col("n").cast("double").as("nd"), col("syd").cast("double").as("sy"),
      col("syyd").cast("double").as("syy"),
      col("s1d").cast("double").as("s1"), col("s11d").cast("double").as("s11"),
      col("s1yd").cast("double").as("s1y"),
      col("s2d").cast("double").as("s2"), col("s22d").cast("double").as("s22"),
      col("s2yd").cast("double").as("s2y"),
      col("s3d").cast("double").as("s3"), col("s33d").cast("double").as("s33"),
      col("s3yd").cast("double").as("s3y"))
    val der = (1 to 3).foldLeft(d0) { (acc, j) =>
      acc.withColumn(s"r2_$j", expr(kbR2Sql(j)))
         .withColumn(s"f_$j", expr(kbFSql(j)))
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("f_stat").desc, col("feature"))
    der.select(explode(array(
        struct(lit("l_quantity").as("feature"), col("r2_1").as("r2"), col("f_1").as("f")),
        struct(lit("l_discount").as("feature"), col("r2_2").as("r2"), col("f_2").as("f")),
        struct(lit("l_tax").as("feature"), col("r2_3").as("r2"), col("f_3").as("f")))).as("t"))
      .select(col("t.feature").as("feature"), dec6(col("t.r2")).as("r2"),
              dec4(col("t.f")).as("f_stat"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("rank"))
  }

  /** A38: isotonic regression (sklearn IsotonicRegression — the
    * monotone calibration/dose-response fit) of mean revenue vs
    * quantity, EXACT end-to-end: the fact collapses to the bounded
    * quantity domain in one map-side-combined aggregate (the B61
    * cardinality rule — nothing downstream scales with row count),
    * then the fitted values come from the minimax characterization
    * ŷ(x_i) = max_{j≤i} min_{k≥i} mean(y over [x_j..x_k]) evaluated on
    * the |domain|² interval frame — with every interval mean published
    * as the INTEGRAL division (S·10⁶ div W) so the max/min run on
    * exact integers and the pool boundaries are bit-identical
    * cross-engine (the same scaled-quotient trick as C24/B74; PAVA's
    * pools are exactly the level sets this formula produces). The
    * domain frame is pinned ([[graft.core.Materialize.pin]]) so the
    * fact aggregate runs ONCE despite its four consumers (the
    * q_spatial_join lesson). O(|domain|³) interval work is
    * corpus-independent (50³ rows here).
    */
  def qIsotonic(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir).select(
      col("l_quantity").cast("long").as("x"),
      (round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("y"))
    val g = graft.core.Materialize.pin(
      li.groupBy(col("x")).agg(count(lit(1)).as("w"), sum(col("y")).as("sy")))
    val wd = org.apache.spark.sql.expressions.Window.orderBy(col("x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = g.select(col("x"), col("w"), col("sy"),
      sum(col("w")).over(wd).as("cw"), sum(col("sy")).over(wd).as("cs"))
    val pj = cum.select(col("x").as("j"), (col("cw") - col("w")).as("cw0"),
                        (col("cs") - col("sy")).as("cs0"))
    val pk = cum.select(col("x").as("k"), col("cw").as("cwk"), col("cs").as("csk"))
    val pairs = pj.join(pk, col("j") <= col("k"))
      .select(col("j"), col("k"),
        expr("(CAST(csk - cs0 AS DECIMAL(38,0)) * 1000000) div (cwk - cw0)")
          .as("est_e6"))
    val mi = g.select(col("x").as("xi"))
      .join(pairs, col("j") <= col("xi") && col("k") >= col("xi"))
      .groupBy(col("xi"), col("j")).agg(min(col("est_e6")).as("mn"))
    val iso = mi.groupBy(col("xi")).agg(max(col("mn")).as("yhat_e6"))
    g.join(iso, col("x") === col("xi"))
      .select(col("x"), col("w"),
        expr("(CAST(sy AS DECIMAL(38,0)) * 1000000) div w").as("mean_e6"),
        col("yhat_e6"))
      .orderBy(col("x"))
  }

  /** Oracle SQL (DuckDB dialect). The kNN oracles use the crossJoin +
    * ROW_NUMBER formulation the Spark engine deliberately AVOIDS — fine
    * at sf0.01 oracle scale, ruled out at 100 TB (see class doc).
    */
  /** Shared A39/A41 oracle prefix: the conditional-moment CTEs
    * replicating [[condMoments2]] (exact HUGEINT moments → d0 doubles).
    */
  private val condMomentsCtes: String =
    s"""b AS (SELECT CAST(l_quantity AS HUGEINT) AS x1,
      |    CAST(ROUND(l_discount*100,0) AS HUGEINT) AS x2,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS p FROM lineitem),
      |m AS (SELECT SUM(p) AS nph, SUM(p*x1) AS s1ph, SUM(p*x2) AS s2ph,
      |    SUM(p*x1*x1) AS q11ph, SUM(p*x1*x2) AS q12ph, SUM(p*x2*x2) AS q22ph,
      |    SUM(1-p) AS nnh, SUM((1-p)*x1) AS s1nh, SUM((1-p)*x2) AS s2nh,
      |    SUM((1-p)*x1*x1) AS q11nh, SUM((1-p)*x1*x2) AS q12nh,
      |    SUM((1-p)*x2*x2) AS q22nh FROM b),
      |d0 AS (SELECT CAST(nph AS DOUBLE) AS np, CAST(s1ph AS DOUBLE) AS s1p,
      |    CAST(s2ph AS DOUBLE) AS s2p, CAST(q11ph AS DOUBLE) AS q11p,
      |    CAST(q12ph AS DOUBLE) AS q12p, CAST(q22ph AS DOUBLE) AS q22p,
      |    CAST(nnh AS DOUBLE) AS nn0, CAST(s1nh AS DOUBLE) AS s1n,
      |    CAST(s2nh AS DOUBLE) AS s2n, CAST(q11nh AS DOUBLE) AS q11n,
      |    CAST(q12nh AS DOUBLE) AS q12n, CAST(q22nh AS DOUBLE) AS q22n FROM m)""".stripMargin

  /** A55 shared rounding convention: round-half-away integral division
    * of exact integers, sign-safe via the ABS trick so both engines'
    * integral-divide operators (Spark `div` truncates toward zero,
    * DuckDB `//` — floor) only ever see NON-NEGATIVE operands, where
    * they agree. `di` is the engine's operator token. Requires b > 0.
    */
  private def rdiv(a: String, b: String, di: String): String =
    s"(CASE WHEN ($a) < 0 THEN -(((-($a)) * 2 + ($b)) $di (2 * ($b))) " +
      s"ELSE (($a) * 2 + ($b)) $di (2 * ($b)) END)"

  /** A55 coefficient convention (the B114/A44 quantized-coefficient
    * rule): slope/intercept derive from EXACT DECIMAL(38,0) moments of
    * the integer (qty, cents) pairs and quantize to e4 integers via
    * [[rdiv]] — b1_e4 first, then b0_e4 FROM the quantized b1 — so
    * both engines score residuals from bit-identical integers; no
    * float enters the query at all. */
  private def conformalScSql(di: String): String =
    s"(ABS(yc * 10000 - (b0_e4 + b1_e4 * q)) * 2 + 10000) $di 20000"

  /** A55: split-conformal prediction intervals for the A9 regressor —
    * the DISTRIBUTION-FREE uncertainty wrapper modern ML pipelines put
    * around any point predictor (Vovk/Angelopoulos split-conformal:
    * with a held-out calibration set, the interval ±q̂ where q̂ is the
    * ⌈(n+1)·0.9⌉-th smallest absolute calibration residual covers
    * ≥ 90% of exchangeable test points — a finite-sample guarantee,
    * no distributional assumptions): train = the A9 1/499 slice with
    * coefficients from exact integer moments ([[conformalScSql]] —
    * residual scores are exact cents, integer end to end),
    * calibration = the first 4096 md5-ids of the DISJOINT
    * l_orderkey % 499 = 1 slice — a COUNT-BOUNDED deterministic
    * uniform subsample (md5 order ≈ random, TakeOrderedAndProject =
    * distributed per-partition top-K then a 4096-row merge; at gate
    * sf the slice is smaller than 4096 so the whole slice is the
    * calibration set), q̂ by exact integer rank (ceiling via
    * (9(n+1)+9) div 10; the rank window's frame is ≤ 4096 rows BY
    * CONSTRUCTION — never fact-proportional, at any corpus size), and
    * coverage over the full corpus as an EXACT integral ppm — the
    * guarantee is then read directly: coverage_ppm ≥ ~900000.
    */
  def qConformal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = li(s, dir).select(col("li_id"), col("l_orderkey"),
      col("l_quantity").cast("long").as("q"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("yc"))
    val m = base.filter(col("l_orderkey") % 499 === 0)
      .agg(count(lit(1)).cast(dec).as("n"),
           sum(col("q").cast(dec)).as("sx"),
           sum(col("yc").cast(dec)).as("sy"),
           sum((col("q") * col("q")).cast(dec)).as("sxx"),
           sum((col("q") * col("yc")).cast(dec)).as("sxy"))
    val co = m.select(col("n"), col("sx"), col("sy"),
        expr(s"CAST(${rdiv("(n*sxy - sx*sy) * 10000", "n*sxx - sx*sx", "div")} " +
          "AS DECIMAL(38,0))").as("b1_e4"))
      .select(col("b1_e4").cast("long").as("b1_e4"),
        expr(s"CAST(${rdiv("sy * 10000 - b1_e4 * sx", "n", "div")} AS BIGINT)")
          .as("b0_e4"))
    def scored(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(co))
        .select(col("li_id"),
          expr(s"CAST(${conformalScSql("div")} AS BIGINT)").as("sc"))
    val cal = scored(base.filter(col("l_orderkey") % 499 === 1))
      .orderBy(col("li_id")).limit(4096)
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    // frame ≤ 4096 rows (the limit above) — bounded by construction
    val w = Window.orderBy(col("sc"), col("li_id"))
    val q90 = cal.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(nCal))
      .filter(expr("rn = LEAST((9 * (n_cal + 1) + 9) div 10, n_cal)"))
      .select(col("sc").as("q90"), col("n_cal"))
    scored(base)
      .crossJoin(broadcast(q90))
      .agg(max(col("n_cal")).as("n_cal"),
           max(col("q90")).as("q90_cents"),
           count(lit(1)).as("n_test"),
           sum((col("sc") <= col("q90")).cast("long")).as("n_covered"))
      .select(col("n_cal"), col("q90_cents"), col("n_test"), col("n_covered"),
        expr("CAST((n_covered * 1000000) div n_test AS BIGINT)")
          .as("coverage_ppm"))
  }

  /** A51 transform table, generated ONCE in Scala and shared verbatim
    * by the engine (literal frame) and the oracle (VALUES list) — the
    * D19 no-runtime-transcendental rule: pow/ln run at QUERY-BUILD
    * time over the 5×50 (λ, value) grid and quantize to e6 integers,
    * so neither engine's libm is in the value path. (lam_x2, v, t_e6):
    * t = ((v+1)^λ − 1)/λ, or ln(v+1) at λ = 0. */
  private lazy val yjTable: Seq[(Int, Long, Long)] =
    for { lx2 <- Seq(-2, -1, 0, 1, 2); v <- 1 to 50 } yield {
      val lam = lx2 / 2.0
      val t =
        if (lx2 == 0) math.log(v + 1.0)
        else (math.pow(v + 1.0, lam) - 1.0) / lam
      (lx2, v.toLong, Math.round(t * 1e6))
    }

  /** A51 log-term table: (v, round(ln(v+1)·e6)) — same rule. */
  private lazy val yjLnTable: Seq[(Long, Long)] =
    (1 to 50).map(v => (v.toLong, Math.round(math.log(v + 1.0) * 1e6)))

  /** A51 log-likelihood — ONE shared float text over the exact
    * DECIMAL(38,0) moments of the e6-quantized transforms:
    * LL(λ) = −n/2·ln(σ̂²_λ) + (λ−1)·Σln(x+1). */
  private val yjLlSql =
    "-(CAST(n AS DOUBLE)/2.0) * ln(" +
      "(CAST(stt AS DOUBLE)*CAST(n AS DOUBLE) - CAST(st AS DOUBLE)*CAST(st AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) / 1000000000000.0) + " +
    "(CAST(lam_x2 AS DOUBLE)/2.0 - 1.0) * (CAST(sl AS DOUBLE)/1000000.0)"

  /** A51: Yeo–Johnson power-transform λ selection by profile MLE
    * (sklearn PowerTransformer intent; quantity is positive so YJ's
    * positive branch = Box–Cox on x+1) over the grid λ ∈ {−1, −0.5,
    * 0, 0.5, 1}: the fact collapses to the ≤50-value quantity domain,
    * each (λ, value) transform is a PRE-GENERATED e6-integer literal
    * ([[yjTable]] — pow/ln run at query build, never at query run, so
    * cross-engine libm differences cannot bite), moments per λ are
    * exact DECIMAL(38,0) aggregates, and only each λ's published LL
    * is float via the shared [[yjLlSql]] text; the winner is the
    * (ll DESC, λ) row. At 100 TB: one ≤50-key fact aggregate + a
    * 250-row broadcast join.
    */
  def qYeoJohnson(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cnt = lineitem(s, dir)
      .groupBy(col("l_quantity").cast("long").as("v"))
      .agg(count(lit(1)).cast(dec).as("c"))
    val tdf = s.createDataFrame(yjTable).toDF("lam_x2", "v", "t_e6")
    val ldf = s.createDataFrame(yjLnTable).toDF("v", "lq_e6")
    val m = cnt.join(broadcast(tdf), "v").join(broadcast(ldf), "v")
      .groupBy(col("lam_x2"))
      .agg(sum(col("c")).as("n"),
           sum(col("c") * col("t_e6")).as("st"),
           sum(col("c") * col("t_e6") * col("t_e6")).as("stt"),
           sum(col("c") * col("lq_e6")).as("sl"))
    val ll = m.select(col("lam_x2"),
      col("n").cast("long").as("n_rows"),
      dec6(expr(yjLlSql)).as("ll"))
    // 5-row frame: the single-partition window is grid-bounded
    val w = Window.orderBy(col("ll").desc, col("lam_x2"))
    ll.withColumn("is_best",
        (row_number().over(w) === 1).cast("int"))
      .orderBy(col("lam_x2"))
  }

  /** The 240 packaged ecoplot plots as a DuckDB VALUES list for the
    * q_impute_map oracle — every numeric literal is passed through a
    * TEXT→DOUBLE cast so DuckDB parses the same decimal text the Scala
    * loader parses (both correctly-rounded ⇒ identical doubles; a bare
    * `1867.4` literal would land as DECIMAL(5,1) and take a different
    * arithmetic path).
    */
  private lazy val ecoplotPlotsValuesSql: String = {
    val in = getClass.getResourceAsStream("/graft/datasets/ecoplot_sample.csv")
    require(in != null, "packaged dataset graft/datasets/ecoplot_sample.csv missing from classpath")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    lines.tail.map { ln =>
      val p = ln.split(",")
      (p.head +: p.tail.map(v => s"'$v'::DOUBLE")).mkString("(", ",", ")")
    }.mkString(",\n")
  }

  val oracles: Map[String, String] = {
    val train = s"train AS ($trainSql)"
    val q     = s"q AS (SELECT $uidSql AS li_id, l_quantity, " +
      "l_discount, l_tax, l_extendedprice, l_partkey, l_suppkey FROM lineitem)"
    def lcFit(pct: Int, cond: String): String =
      s"SELECT $pct AS frac_pct, " +
        s"CAST(SUM(CASE WHEN $cond THEN n ELSE 0 END) AS BIGINT) AS n_train, " +
        Seq("sx", "sy", "sxx", "sxy").map(c =>
          s"CAST(SUM(CASE WHEN $cond THEN $c ELSE 0 END) AS HUGEINT) AS $c")
          .mkString(", ") + " FROM mo"
    val yjVals = yjTable
      .map { case (lx2, v, t) => s"($lx2, $v, ${t}::BIGINT)" }.mkString(", ")
    val yjLnVals = yjLnTable
      .map { case (v, l) => s"($v, ${l}::BIGINT)" }.mkString(", ")
    Map(
      "q_conformal" ->
        s"""WITH tr AS (SELECT CAST(l_quantity AS HUGEINT) AS q,
          |    CAST(ROUND(l_extendedprice*100,0) AS HUGEINT) AS yc
          |  FROM lineitem WHERE l_orderkey % 499 = 0),
          |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(q) AS sx,
          |    SUM(yc) AS sy, SUM(q*q) AS sxx, SUM(q*yc) AS sxy FROM tr),
          |c1 AS (SELECT n, sx, sy,
          |    ${rdiv("(n*sxy - sx*sy) * 10000", "n*sxx - sx*sx", "//")} AS b1_e4
          |  FROM m),
          |co AS (SELECT CAST(b1_e4 AS BIGINT) AS b1_e4,
          |    CAST(${rdiv("sy * 10000 - b1_e4 * sx", "n", "//")} AS BIGINT)
          |      AS b0_e4 FROM c1),
          |sco AS (SELECT $uidSql AS li_id, l_orderkey,
          |    CAST(${conformalScSql("//")} AS BIGINT) AS sc
          |  FROM (SELECT *, CAST(l_quantity AS BIGINT) AS q,
          |      CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS yc
          |    FROM lineitem) CROSS JOIN co),
          |cal AS (SELECT li_id, sc FROM sco WHERE l_orderkey % 499 = 1
          |  ORDER BY li_id LIMIT 4096),
          |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
          |rk AS (SELECT sc, ROW_NUMBER() OVER (ORDER BY sc, li_id) AS rn
          |  FROM cal),
          |q AS (SELECT sc AS q90, n_cal FROM rk CROSS JOIN nc
          |  WHERE rn = LEAST((9 * (n_cal + 1) + 9) // 10, n_cal)),
          |tst AS (SELECT sc FROM sco)
          |SELECT n_cal, q90 AS q90_cents,
          |  CAST(COUNT(*) AS BIGINT) AS n_test,
          |  CAST(SUM(CASE WHEN sc <= q90 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_covered,
          |  CAST((SUM(CASE WHEN sc <= q90 THEN 1 ELSE 0 END) * 1000000)
          |    // COUNT(*) AS BIGINT) AS coverage_ppm
          |FROM tst CROSS JOIN q GROUP BY n_cal, q90""".stripMargin,
      "q_yeo_johnson" ->
        s"""WITH cnt AS (SELECT CAST(l_quantity AS BIGINT) AS v,
          |    CAST(COUNT(*) AS HUGEINT) AS c FROM lineitem GROUP BY 1),
          |td(lam_x2, v, t_e6) AS (SELECT * FROM (VALUES $yjVals)),
          |ld(v, lq_e6) AS (SELECT * FROM (VALUES $yjLnVals)),
          |m AS (SELECT lam_x2, SUM(c) AS n, SUM(c*t_e6) AS st,
          |    SUM(c*t_e6*t_e6) AS stt, SUM(c*lq_e6) AS sl
          |  FROM cnt JOIN td USING (v) JOIN ld USING (v) GROUP BY 1),
          |ll AS (SELECT lam_x2, CAST(n AS BIGINT) AS n_rows,
          |    CAST(ROUND($yjLlSql, 6) AS DECIMAL(18,6))::DOUBLE AS ll
          |  FROM m)
          |SELECT lam_x2, n_rows, ll,
          |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY ll DESC, lam_x2) = 1
          |    THEN 1 ELSE 0 END AS INTEGER) AS is_best
          |FROM ll ORDER BY lam_x2""".stripMargin,
      "q_select_kbest" ->
        s"""WITH b AS (SELECT CAST(l_quantity AS HUGEINT) AS x1,
          |    CAST(ROUND(l_discount*100,0) AS HUGEINT) AS x2,
          |    CAST(ROUND(l_tax*100,0) AS HUGEINT) AS x3,
          |    CAST(ROUND(l_extendedprice*100,0) AS HUGEINT) AS y FROM lineitem),
          |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(y) AS syh,
          |    SUM(y*y) AS syyh, SUM(x1) AS s1h, SUM(x1*x1) AS s11h,
          |    SUM(x1*y) AS s1yh, SUM(x2) AS s2h, SUM(x2*x2) AS s22h,
          |    SUM(x2*y) AS s2yh, SUM(x3) AS s3h, SUM(x3*x3) AS s33h,
          |    SUM(x3*y) AS s3yh FROM b),
          |d0 AS (SELECT CAST(n AS DOUBLE) AS nd, CAST(syh AS DOUBLE) AS sy,
          |    CAST(syyh AS DOUBLE) AS syy, CAST(s1h AS DOUBLE) AS s1,
          |    CAST(s11h AS DOUBLE) AS s11, CAST(s1yh AS DOUBLE) AS s1y,
          |    CAST(s2h AS DOUBLE) AS s2, CAST(s22h AS DOUBLE) AS s22,
          |    CAST(s2yh AS DOUBLE) AS s2y, CAST(s3h AS DOUBLE) AS s3,
          |    CAST(s33h AS DOUBLE) AS s33, CAST(s3yh AS DOUBLE) AS s3y FROM m),
          |d1 AS (SELECT *, ${kbR2Sql(1)} AS r2_1, ${kbR2Sql(2)} AS r2_2,
          |    ${kbR2Sql(3)} AS r2_3 FROM d0),
          |d2 AS (SELECT *, ${kbFSql(1)} AS f_1, ${kbFSql(2)} AS f_2,
          |    ${kbFSql(3)} AS f_3 FROM d1),
          |u AS (SELECT 'l_quantity' AS feature, r2_1 AS r2, f_1 AS f FROM d2
          |  UNION ALL SELECT 'l_discount', r2_2, f_2 FROM d2
          |  UNION ALL SELECT 'l_tax', r2_3, f_3 FROM d2),
          |r AS (SELECT feature,
          |    CAST(ROUND(r2, 6) AS DECIMAL(18,6))::DOUBLE AS r2,
          |    CAST(ROUND(f, 4) AS DECIMAL(18,4))::DOUBLE AS f_stat FROM u)
          |SELECT feature, r2, f_stat,
          |  CAST(ROW_NUMBER() OVER (ORDER BY f_stat DESC, feature) AS BIGINT) AS rank
          |FROM r ORDER BY rank""".stripMargin,
      "q_isotonic" ->
        """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x,
          |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) *
          |      (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS y
          |  FROM lineitem),
          |g AS (SELECT x, COUNT(*) AS w, SUM(y) AS sy FROM li GROUP BY 1),
          |cum AS (SELECT x, w, sy,
          |    SUM(w) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
          |    SUM(sy) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
          |  FROM g),
          |pairs AS (SELECT j.x AS j, k.x AS k,
          |    (CAST(k.cs - (j.cs - j.sy) AS HUGEINT) * 1000000) //
          |      CAST(k.cw - (j.cw - j.w) AS HUGEINT) AS est_e6
          |  FROM cum j JOIN cum k ON j.x <= k.x),
          |mi AS (SELECT d.x AS xi, p.j, MIN(p.est_e6) AS mn
          |  FROM g d JOIN pairs p ON p.j <= d.x AND p.k >= d.x GROUP BY 1, 2),
          |iso AS (SELECT xi, MAX(mn) AS yhat_e6 FROM mi GROUP BY 1)
          |SELECT g.x, CAST(g.w AS BIGINT) AS w,
          |  CAST((CAST(g.sy AS HUGEINT) * 1000000) // g.w AS BIGINT) AS mean_e6,
          |  CAST(yhat_e6 AS BIGINT) AS yhat_e6
          |FROM g JOIN iso ON g.x = iso.xi ORDER BY g.x""".stripMargin,
      "q_learning_curve" ->
        s"""WITH tr AS (SELECT
          |    CAST(${TF.hexPrefix52Sql(s"md5('lc|' || $uidSql)")} % 10 AS BIGINT) AS dk,
          |    CAST(l_quantity AS BIGINT) AS x,
          |    CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS y
          |  FROM lineitem WHERE l_orderkey % 29 = 0),
          |mo AS (SELECT dk, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
          |    SUM(x*x) AS sxx, SUM(x*y) AS sxy FROM tr GROUP BY 1),
          |fits AS (${lcFit(20, "dk < 2")} UNION ALL ${lcFit(60, "dk < 6")}
          |  UNION ALL ${lcFit(100, "TRUE")}),
          |co1 AS (SELECT *, $lcSlopeSql AS b1 FROM fits),
          |co AS (SELECT *, $lcInterceptSql AS b0 FROM co1),
          |er AS (SELECT frac_pct, n_train, b1, b0,
          |    $lcPredCentsSql - CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS e
          |  FROM lineitem CROSS JOIN co),
          |sc AS (SELECT frac_pct, n_train, b1, b0, COUNT(*) AS n_score,
          |    SUM(CAST(e AS HUGEINT) * CAST(e AS HUGEINT)) AS sse
          |  FROM er GROUP BY 1,2,3,4)
          |SELECT CAST(frac_pct AS BIGINT) AS frac_pct, n_train,
          |  CAST(ROUND(b1, 6) AS DECIMAL(18,6))::DOUBLE AS b1,
          |  CAST(ROUND(b0, 6) AS DECIMAL(18,6))::DOUBLE AS b0,
          |  CAST(ROUND($lcRmseSql, 4) AS DECIMAL(18,4))::DOUBLE AS rmse
          |FROM sc ORDER BY frac_pct""".stripMargin,
      "q_focal_mean" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT x, y, CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v
          |  FROM g),
          |sh AS (SELECT x + dx AS tx, y + dy AS ty, v
          |  FROM gv, (SELECT unnest(range(-1,2)) AS dx), (SELECT unnest(range(-1,2)) AS dy)
          |  WHERE x + dx BETWEEN 0 AND 119 AND y + dy BETWEEN 0 AND 79)
          |SELECT tx AS x, ty AS y, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(COUNT(v) AS BIGINT) AS vcnt,
          |  CAST(ROUND(CAST(SUM(v) AS DOUBLE)/COUNT(v), 4) AS DECIMAL(18,4))::DOUBLE AS focal_mean
          |FROM sh GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
      // q_impute_map: the oracle rebuilds the kNN once per mosaic cell
      // PROFILE (65,536 × 240 pairs) and joins profiles back to the
      // 8.4M pixels — the fixture's documented tractability trapdoor;
      // the engine path under test is strictly per-pixel. The fast
      // '0x'-cast hex parse is bit-equal to hexPrefix52Sql (verified)
      // and 14× cheaper at 8.4M rows.
      "q_impute_map" ->
        s"""WITH plots(plot_id, elev, precip, temp, nbr, ndvi, slope, c1, c2, c3) AS (VALUES
          |$ecoplotPlotsValuesSql),
          |pt AS (SELECT plot_id, elev, precip, temp, nbr, ndvi, slope,
          |    CAST(ROUND(c1*10,0) AS BIGINT) AS t1, CAST(ROUND(c2*10,0) AS BIGINT) AS t2,
          |    CAST(ROUND(c3*10,0) AS BIGINT) AS t3 FROM plots),
          |cf AS (SELECT c AS cell, ('0x' || substr(md5('impc|'||c),1,13))::BIGINT AS g
          |  FROM range(0, 65536) t(c)),
          |cfeat AS (SELECT cell,
          |    CAST(g % 256 AS DOUBLE) * 8.0 AS elev,
          |    1000.0 + CAST((g // 256) % 256 AS DOUBLE) * 6.0 AS precip,
          |    CAST((g // 65536) % 256 AS DOUBLE) / 16.0 AS temp,
          |    (CAST((g // 16777216) % 256 AS DOUBLE) - 128.0) / 128.0 AS nbr,
          |    CAST((g // 4294967296) % 256 AS DOUBLE) / 256.0 AS ndvi,
          |    CAST((g // 1099511627776) % 256 AS DOUBLE) / 8.0 AS slope
          |  FROM cf),
          |d AS (SELECT cell, t1, t2, t3, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY
          |    (cfeat.elev-pt.elev)*(cfeat.elev-pt.elev)
          |    + (cfeat.precip-pt.precip)*(cfeat.precip-pt.precip)
          |    + (cfeat.temp-pt.temp)*(cfeat.temp-pt.temp)
          |    + (cfeat.nbr-pt.nbr)*(cfeat.nbr-pt.nbr)
          |    + (cfeat.ndvi-pt.ndvi)*(cfeat.ndvi-pt.ndvi)
          |    + (cfeat.slope-pt.slope)*(cfeat.slope-pt.slope), plot_id) AS rn
          |  FROM cfeat CROSS JOIN pt),
          |nb AS (SELECT cell, SUM(t1) AS s1, SUM(t2) AS s2, SUM(t3) AS s3
          |  FROM d WHERE rn <= 5 GROUP BY cell),
          |px AS (SELECT i // 131072 AS zone, h % 65536 AS cell,
          |    CASE WHEN (h // 65536) % 37 = 0 THEN 1 ELSE 0 END AS m
          |  FROM (SELECT i, ('0x' || substr(md5('imp|'||i),1,13))::BIGINT AS h
          |    FROM range(0, 8388608) t(i))),
          |pz AS (SELECT zone, cell, m, COUNT(*) AS c FROM px GROUP BY 1,2,3),
          |ag AS (SELECT zone, SUM(c) AS n_px,
          |    SUM(CASE WHEN m=0 THEN c ELSE 0 END) AS n_valid,
          |    SUM(CASE WHEN m=0 THEN c*s1 ELSE 0 END) AS ss1,
          |    SUM(CASE WHEN m=0 THEN c*s2 ELSE 0 END) AS ss2,
          |    SUM(CASE WHEN m=0 THEN c*s3 ELSE 0 END) AS ss3
          |  FROM pz JOIN nb USING (cell) GROUP BY zone)
          |SELECT CAST(zone AS BIGINT) AS zone, CAST(n_px AS BIGINT) AS n_px,
          |  CAST(n_valid AS BIGINT) AS n_valid,
          |  CAST(ROUND(CAST(ss1 AS DOUBLE)/(CAST(n_valid AS DOUBLE)*50.0),4) AS DECIMAL(18,4))::DOUBLE AS mean_psme,
          |  CAST(ROUND(CAST(ss2 AS DOUBLE)/(CAST(n_valid AS DOUBLE)*50.0),4) AS DECIMAL(18,4))::DOUBLE AS mean_pila,
          |  CAST(ROUND(CAST(ss3 AS DOUBLE)/(CAST(n_valid AS DOUBLE)*50.0),4) AS DECIMAL(18,4))::DOUBLE AS mean_abco
          |FROM ag ORDER BY zone""".stripMargin,
      "q_zonal" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx,
          |    CAST(${TF.hexPrefix52Sql("md5('zone|'||((i % 120) // 8)||','||((i // 120) // 8))")} % 6 AS BIGINT) AS zone
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT zone, CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v
          |  FROM g)
          |SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST(COUNT(v) AS BIGINT) AS n_valid, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(MIN(v) AS BIGINT) AS vmin, CAST(MAX(v) AS BIGINT) AS vmax,
          |  CAST(ROUND(CAST(SUM(v) AS DOUBLE)/COUNT(v), 4) AS DECIMAL(18,4))::DOUBLE AS zonal_mean
          |FROM gv GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_lda" -> {
        val chain = ldaDerivs.zipWithIndex.map { case ((nm, f), i) =>
          s"d${i + 1} AS (SELECT *, $f AS $nm FROM d$i)"
        }.mkString(",\n")
        val last = s"d${ldaDerivs.length}"
        s"""WITH $condMomentsCtes,
          |$chain,
          |f AS (SELECT w1, w2, c0 FROM $last),
          |sc AS (SELECT w1, w2, c0,
          |    CASE WHEN $ldaScoreSql THEN 1 ELSE 0 END AS pred,
          |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS actual
          |  FROM (SELECT l_returnflag,
          |      CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS fx1,
          |      CAST(CAST(ROUND(l_discount*100,0) AS BIGINT) AS DOUBLE) AS fx2
          |    FROM lineitem) CROSS JOIN f)
          |SELECT CAST(ROUND(w1, 6) AS DECIMAL(18,6))::DOUBLE AS w1,
          |  CAST(ROUND(w2, 6) AS DECIMAL(18,6))::DOUBLE AS w2,
          |  CAST(ROUND(c0, 6) AS DECIMAL(18,6))::DOUBLE AS c0,
          |  CAST(SUM(pred*actual) AS BIGINT) AS tp,
          |  CAST(SUM(pred*(1-actual)) AS BIGINT) AS fp,
          |  CAST(SUM((1-pred)*actual) AS BIGINT) AS fn,
          |  CAST(SUM((1-pred)*(1-actual)) AS BIGINT) AS tn
          |FROM sc GROUP BY w1, w2, c0""".stripMargin
      },
      "q_logistic" -> {
        val sumsSel = logSumDefs.map { case (nm, f) => s"SUM($f) AS $nm" }
          .mkString(",\n    ")
        def iter(i: Int): String = {
          val prev = if (i == 1) "w0cte" else s"w${i - 1}"
          val chain = logSolveDerivs.zipWithIndex.map { case ((nm, f), j) =>
            s"s${i}_${j + 1} AS (SELECT *, $f AS $nm FROM s${i}_$j)"
          }.mkString(",\n")
          s"""c$i AS (SELECT cells.*, w0, w1, w2, $logEtaSql AS eta
             |  FROM cells CROSS JOIN $prev),
             |p$i AS (SELECT *, CAST($logPe6Sql AS HUGEINT) AS pe6 FROM c$i),
             |s${i}_0 AS (SELECT w0, w1, w2,
             |    $sumsSel
             |  FROM p$i GROUP BY 1,2,3),
             |$chain,
             |w$i AS (SELECT nw0 AS w0, nw1 AS w1, nw2 AS w2
             |  FROM s${i}_${logSolveDerivs.length})""".stripMargin
        }
        val iters = (1 to logNewtonIters).map(iter).mkString(",\n")
        s"""WITH cells AS (SELECT CAST(l_quantity AS HUGEINT) AS x1,
          |    CAST(ROUND(l_discount*100,0) AS HUGEINT) AS x2,
          |    CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS x1f,
          |    CAST(CAST(ROUND(l_discount*100,0) AS BIGINT) AS DOUBLE) AS x2f,
          |    CAST(COUNT(*) AS HUGEINT) AS nn,
          |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS HUGEINT) AS kk
          |  FROM lineitem GROUP BY 1,2,3,4),
          |w0cte AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
          |$iters,
          |f AS (SELECT w0, w1, w2 FROM w$logNewtonIters),
          |sc AS (SELECT w0, w1, w2,
          |    CASE WHEN $logScoreSql THEN 1 ELSE 0 END AS pred,
          |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS actual
          |  FROM (SELECT l_returnflag,
          |      CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS x1f,
          |      CAST(CAST(ROUND(l_discount*100,0) AS BIGINT) AS DOUBLE) AS x2f
          |    FROM lineitem) CROSS JOIN f)
          |SELECT CAST(ROUND(w0, 6) AS DECIMAL(18,6))::DOUBLE AS w0,
          |  CAST(ROUND(w1, 6) AS DECIMAL(18,6))::DOUBLE AS w1,
          |  CAST(ROUND(w2, 6) AS DECIMAL(18,6))::DOUBLE AS w2,
          |  CAST(SUM(pred*actual) AS BIGINT) AS tp,
          |  CAST(SUM(pred*(1-actual)) AS BIGINT) AS fp,
          |  CAST(SUM((1-pred)*actual) AS BIGINT) AS fn,
          |  CAST(SUM((1-pred)*(1-actual)) AS BIGINT) AS tn
          |FROM sc GROUP BY w0, w1, w2""".stripMargin
      },
      "q_poisson" -> {
        val sumsSel = poisSumDefs.map { case (nm, f) => s"SUM($f) AS $nm" }
          .mkString(",\n    ")
        def iter(i: Int): String = {
          val prev = if (i == 1) "w0cte" else s"w${i - 1}"
          val chain = poisSolveDerivs.zipWithIndex.map { case ((nm, f), j) =>
            s"s${i}_${j + 1} AS (SELECT *, $f AS $nm FROM s${i}_$j)"
          }.mkString(",\n")
          s"""c$i AS (SELECT cells.*, w0, w1, w2, $poisEtaSql AS eta
             |  FROM cells CROSS JOIN $prev),
             |p$i AS (SELECT *, CAST($poisMu6Sql AS HUGEINT) AS mu6 FROM c$i),
             |s${i}_0 AS (SELECT w0, w1, w2,
             |    $sumsSel
             |  FROM p$i GROUP BY 1,2,3),
             |$chain,
             |w$i AS (SELECT nw0 AS w0, nw1 AS w1, nw2 AS w2
             |  FROM s${i}_${poisSolveDerivs.length})""".stripMargin
        }
        val iters = (1 to poisNewtonIters).map(iter).mkString(",\n")
        s"""WITH daily AS (SELECT o_orderdate AS day,
          |    CAST(COUNT(*) AS HUGEINT) AS yy FROM orders GROUP BY 1),
          |d0 AS (SELECT MIN(day) AS d0 FROM daily),
          |b AS (SELECT yy,
          |    CAST(date_diff('day', d0.d0, CAST(day AS DATE)) AS BIGINT) AS t,
          |    CASE WHEN (date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) + 4)
          |      % 7 IN (0, 6) THEN 1 ELSE 0 END AS wkd
          |  FROM daily CROSS JOIN d0),
          |tb AS (SELECT SUM(t) // COUNT(*) AS tbar FROM b),
          |cells AS (SELECT yy, CAST(t - tbar AS HUGEINT) AS x1,
          |    CAST(wkd AS HUGEINT) AS x2,
          |    CAST(t - tbar AS DOUBLE) AS x1f, CAST(wkd AS DOUBLE) AS x2f
          |  FROM b CROSS JOIN tb),
          |w0cte AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
          |$iters,
          |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
          |    CAST(SUM(yy) AS BIGINT) AS n_orders FROM cells)
          |SELECT CAST(ROUND(w0, 6) AS DECIMAL(18,6))::DOUBLE AS w0,
          |  CAST(ROUND(w1, 6) AS DECIMAL(18,6))::DOUBLE AS w1,
          |  CAST(ROUND(w2, 6) AS DECIMAL(18,6))::DOUBLE AS w2,
          |  n_days, n_orders
          |FROM w$poisNewtonIters CROSS JOIN tot""".stripMargin
      },
      "q_huber" -> {
        val sumSql = hubSumDefs.map { case (nm, f) =>
          s"CAST(SUM($f) AS HUGEINT) AS $nm" }.mkString(", ")
        def solveChain(i: Int, src: String): String = {
          val chain = hubSolveDerivs.zipWithIndex.map { case ((nm, f), j) =>
            s"s${i}_${j + 1} AS (SELECT *, $f AS $nm FROM s${i}_$j)"
          }.mkString(",\n")
          s"""s${i}_0 AS (SELECT $sumSql FROM $src),
             |$chain,
             |p$i AS (SELECT nb0 AS b0, nb1 AS b1, nb2 AS b2
             |  FROM s${i}_${hubSolveDerivs.length})""".stripMargin
        }
        def irlsIter(i: Int): String =
          s"""e$i AS (SELECT b.*, b0, b1, b2,
             |    CAST($hubPredSql AS HUGEINT) AS pred
             |  FROM b CROSS JOIN p${i - 1}),
             |r$i AS (SELECT *, y - pred AS r FROM e$i),
             |w$i AS (SELECT *, CASE WHEN abs(r) <= $HubDelta
             |    THEN CAST(1000000 AS HUGEINT)
             |    ELSE (CAST($HubDelta AS HUGEINT) * 1000000) // abs(r) END AS aw
             |  FROM r$i),
             |${solveChain(i, s"w$i")}""".stripMargin
        val iters = (1 to hubIrlsIters).map(irlsIter).mkString(",\n")
        s"""WITH b AS (SELECT CAST(l_quantity AS HUGEINT) AS x1,
          |    CAST(ROUND(l_discount*100,0) AS HUGEINT) AS x2,
          |    CAST(ROUND(l_extendedprice*100,0) AS HUGEINT) AS y,
          |    CAST(l_quantity AS DOUBLE) AS x1f,
          |    CAST(ROUND(l_discount*100,0) AS DOUBLE) AS x2f FROM lineitem),
          |e0 AS (SELECT b.*, CAST(1000000 AS HUGEINT) AS aw FROM b),
          |${solveChain(0, "e0")},
          |$iters,
          |f AS (SELECT b.*, b0, b1, b2,
          |    y - CAST($hubPredSql AS HUGEINT) AS r
          |  FROM b CROSS JOIN p$hubIrlsIters)
          |SELECT CAST(ROUND(b0, 6) AS DECIMAL(18,6))::DOUBLE AS b0,
          |  CAST(ROUND(b1, 6) AS DECIMAL(18,6))::DOUBLE AS b1,
          |  CAST(ROUND(b2, 6) AS DECIMAL(18,6))::DOUBLE AS b2,
          |  CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(SUM(CASE WHEN abs(r) > $HubDelta THEN 1 ELSE 0 END) AS BIGINT) AS n_out
          |FROM f GROUP BY 1, 2, 3""".stripMargin
      },
      "q_lasso" -> cdOracle(lassoIterDerivs),
      "q_elastic" -> cdOracle(enetIterDerivs),
      "q_gmm" -> {
        val allDerivs = gmmCompDefs ++ gmmSolveDerivs
        def iter(i: Int): String = {
          val prev = if (i == 1) "p0" else s"p${i - 1}"
          val chain = allDerivs.zipWithIndex.map { case ((nm, f), j) =>
            s"g${i}_${j + 1} AS (SELECT *, $f AS $nm FROM g${i}_$j)"
          }.mkString(",\n")
          s"""e$i AS (SELECT cells.*, mu1, va1, pi1, mu2, va2, pi2,
             |    $gmmD1Sql AS d1, $gmmD2Sql AS d2
             |  FROM cells CROSS JOIN $prev),
             |r$i AS (SELECT *, CAST($gmmR6Sql AS HUGEINT) AS r6 FROM e$i),
             |g${i}_0 AS (SELECT SUM(c) AS tn, SUM(c*x) AS tx,
             |    SUM(c*x*x) AS tq, SUM(c*r6) AS gw1, SUM(c*r6*x) AS gx1,
             |    SUM(c*r6*x*x) AS gq1 FROM r$i),
             |$chain,
             |p$i AS (SELECT mu1n AS mu1, va1n AS va1, pi1n AS pi1,
             |  mu2n AS mu2, va2n AS va2, pi2n AS pi2
             |  FROM g${i}_${allDerivs.length})""".stripMargin
        }
        val iters = (1 to gmmIters).map(iter).mkString(",\n")
        s"""WITH cells AS (SELECT CAST(l_quantity AS HUGEINT) AS x,
          |    CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS xf,
          |    CAST(COUNT(*) AS HUGEINT) AS c FROM lineitem GROUP BY 1, 2),
          |p0 AS (SELECT 15.0 AS mu1, 100.0 AS va1, 0.5 AS pi1,
          |    35.0 AS mu2, 100.0 AS va2, 0.5 AS pi2),
          |$iters
          |SELECT CAST(ROUND(mu1, 6) AS DECIMAL(18,6))::DOUBLE AS mu1,
          |  CAST(ROUND(va1, 6) AS DECIMAL(18,6))::DOUBLE AS var1,
          |  CAST(ROUND(pi1, 6) AS DECIMAL(18,6))::DOUBLE AS pi1,
          |  CAST(ROUND(mu2, 6) AS DECIMAL(18,6))::DOUBLE AS mu2,
          |  CAST(ROUND(va2, 6) AS DECIMAL(18,6))::DOUBLE AS var2,
          |  CAST(ROUND(pi2, 6) AS DECIMAL(18,6))::DOUBLE AS pi2
          |FROM p$gmmIters""".stripMargin
      },
      "q_qda" -> {
        val chain = qdaDerivs.zipWithIndex.map { case ((nm, f), i) =>
          s"d${i + 1} AS (SELECT *, $f AS $nm FROM d$i)"
        }.mkString(",\n")
        val last    = s"d${qdaDerivs.length}"
        val fitCols = qdaFitCols.mkString(", ")
        s"""WITH $condMomentsCtes,
          |$chain,
          |f AS (SELECT $fitCols FROM $last),
          |sc AS (SELECT $fitCols,
          |    CASE WHEN $qdaScoreSql THEN 1 ELSE 0 END AS pred,
          |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS actual
          |  FROM (SELECT l_returnflag,
          |      CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS fx1,
          |      CAST(CAST(ROUND(l_discount*100,0) AS BIGINT) AS DOUBLE) AS fx2
          |    FROM lineitem) CROSS JOIN f)
          |SELECT CAST(ROUND(m1p, 6) AS DECIMAL(18,6))::DOUBLE AS m1p,
          |  CAST(ROUND(m2p, 6) AS DECIMAL(18,6))::DOUBLE AS m2p,
          |  CAST(ROUND(m1n, 6) AS DECIMAL(18,6))::DOUBLE AS m1n,
          |  CAST(ROUND(m2n, 6) AS DECIMAL(18,6))::DOUBLE AS m2n,
          |  CAST(ROUND(ldp, 6) AS DECIMAL(18,6))::DOUBLE AS ldp,
          |  CAST(ROUND(ldn, 6) AS DECIMAL(18,6))::DOUBLE AS ldn,
          |  CAST(SUM(pred*actual) AS BIGINT) AS tp,
          |  CAST(SUM(pred*(1-actual)) AS BIGINT) AS fp,
          |  CAST(SUM((1-pred)*actual) AS BIGINT) AS fn,
          |  CAST(SUM((1-pred)*(1-actual)) AS BIGINT) AS tn
          |FROM sc GROUP BY $fitCols""".stripMargin
      },
      "q_raster_agg" ->
        s"""WITH g AS (SELECT ${TF.hexPrefix52Sql("md5('ras|'||(i % 200)||','||(i // 200))")} AS hx
          |  FROM range(0, 20000) t(i)),
          |gv AS (SELECT CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v FROM g)
          |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST(COUNT(v) AS BIGINT) AS n_valid, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(MIN(v) AS BIGINT) AS vmin, CAST(MAX(v) AS BIGINT) AS vmax,
          |  CAST(ROUND(CAST(SUM(v) AS DOUBLE)/COUNT(v), 4) AS DECIMAL(18,4))::DOUBLE AS mean_v
          |FROM gv""".stripMargin,
      "q_clustered_write" ->
        """SELECT CAST(4 AS BIGINT) AS n_tasks,
          |  CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(COUNT(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT)
          |    AS n_keys,
          |  CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)
          |    AS sum_v,
          |  1 AS all_sorted, 1 AS keysets_disjoint
          |FROM lineitem""".stripMargin,
      "q_catalog_functions" ->
        """WITH o AS (SELECT o_orderpriority AS prio,
          |    CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents FROM orders)
          |SELECT prio,
          |  CAST(list_reduce(list(cents ORDER BY cents), (a, b) -> gcd(a, b)) AS BIGINT)
          |    AS price_grid,
          |  CAST((MIN(cents) - MAX(cents)) // 7919
          |    - CASE WHEN (MIN(cents) - MAX(cents)) % 7919 <> 0
          |           AND MIN(cents) < MAX(cents) THEN 1 ELSE 0 END
          |    AS BIGINT) AS fd
          |FROM o GROUP BY prio ORDER BY prio""".stripMargin,
      "q_catalog_update" ->
        """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
          |    CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
          |  FROM orders WHERE o_orderkey % 13 = 0),
          |upd AS (SELECT k, st,
          |    cents + CASE WHEN st = 'O' THEN 777 ELSE 0 END AS cents FROM base),
          |delta AS (SELECT o_orderkey AS k,
          |    CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS dc
          |  FROM orders WHERE o_orderkey % 17 = 0),
          |m1 AS (SELECT u.k, u.st, u.cents + COALESCE(d.dc, 0) AS cents
          |  FROM upd u LEFT JOIN delta d ON d.k = u.k),
          |m2 AS (SELECT d.k, 'M' AS st, d.dc AS cents
          |  FROM delta d LEFT JOIN upd u ON u.k = d.k WHERE u.k IS NULL),
          |alltb AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
          |SELECT st, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
          |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
          |FROM alltb GROUP BY st ORDER BY st""".stripMargin,
      "q_catalog_roundtrip" ->
        """WITH src AS (SELECT o_orderkey AS k, o_orderstatus AS st,
          |    CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
          |  FROM orders WHERE o_orderkey % 10 = 0),
          |surv AS (SELECT * FROM src
          |  WHERE NOT (st = 'F') AND NOT (cents < 500000))
          |SELECT st, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
          |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
          |FROM surv GROUP BY st ORDER BY st""".stripMargin,
      "q_time_travel" ->
        """WITH src AS (SELECT o_orderkey AS k,
          |    CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents FROM orders),
          |v1 AS (SELECT k, cents FROM src WHERE k % 19 = 0),
          |v2 AS (SELECT * FROM v1
          |  UNION ALL SELECT k, cents FROM src WHERE k % 23 = 0),
          |v3 AS (SELECT * FROM v2 WHERE NOT (cents < 10000000)),
          |stats AS (
          |  SELECT 1 AS version, COUNT(*) AS n, SUM(cents) AS sum_cents,
          |    MIN(k) AS min_k, MAX(k) AS max_k FROM v1
          |  UNION ALL SELECT 2, COUNT(*), SUM(cents), MIN(k), MAX(k) FROM v2
          |  UNION ALL SELECT 3, COUNT(*), SUM(cents), MIN(k), MAX(k) FROM v3
          |  UNION ALL SELECT 4, COUNT(*), SUM(cents), MIN(k), MAX(k) FROM v3)
          |SELECT CAST(version AS BIGINT) AS version, CAST(n AS BIGINT) AS n,
          |  CAST(sum_cents AS BIGINT) AS sum_cents,
          |  CAST(min_k AS BIGINT) AS min_k, CAST(max_k AS BIGINT) AS max_k
          |FROM stats ORDER BY version""".stripMargin,
      "q_snapshot_retention" ->
        """WITH src AS (SELECT o_orderkey AS k,
          |    CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents FROM orders),
          |v3 AS (SELECT k, cents FROM src WHERE k % 17 = 0
          |  UNION ALL SELECT k, cents FROM src WHERE k % 19 = 0
          |  UNION ALL SELECT k, cents FROM src WHERE k % 23 = 0),
          |v4 AS (SELECT * FROM v3 WHERE NOT (cents < 10000000)),
          |stats AS (
          |  SELECT 3 AS probe, COUNT(*) AS n, SUM(cents) AS sum_cents FROM v3
          |  UNION ALL SELECT 4, COUNT(*), SUM(cents) FROM v4)
          |SELECT CAST(probe AS BIGINT) AS probe, CAST(n AS BIGINT) AS n,
          |  CAST(sum_cents AS BIGINT) AS sum_cents,
          |  CAST(2 AS BIGINT) AS expired_count,
          |  CAST(3 AS BIGINT) AS retained_from,
          |  CAST(4 AS BIGINT) AS retained_to,
          |  CAST(1 AS BIGINT) AS refused_expired
          |FROM stats ORDER BY probe""".stripMargin,
      "q_schema_evolution" ->
        """WITH src AS (SELECT o_orderkey AS k,
          |    CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents,
          |    CAST(o_custkey AS BIGINT) AS prio FROM orders),
          |g1 AS (SELECT k, cents, CAST(NULL AS BIGINT) AS prio
          |  FROM src WHERE k % 11 = 0),
          |g2 AS (SELECT k, cents, prio FROM src WHERE k % 13 = 0),
          |t AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
          |SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
          |  CAST(COUNT(*) - COUNT(prio) AS BIGINT) AS n_backfilled_null,
          |  CAST(SUM(prio) AS BIGINT) AS sum_prio,
          |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
          |FROM t""".stripMargin,
      "q_merge_evolution" ->
        """WITH src AS (SELECT o_orderkey AS k,
          |    CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents,
          |    CAST(o_custkey AS BIGINT) AS prio FROM orders),
          |b AS (SELECT k, cents FROM src WHERE k % 11 = 0),
          |d AS (SELECT k, cents AS dc, prio FROM src WHERE k % 13 = 0),
          |m AS (SELECT b.k, b.cents + COALESCE(d.dc, 0) AS cents, d.prio
          |    FROM b LEFT JOIN d USING (k)
          |  UNION ALL
          |  SELECT d.k, d.dc, d.prio FROM d
          |  WHERE d.k NOT IN (SELECT k FROM b))
          |SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
          |  CAST(COUNT(*) - COUNT(prio) AS BIGINT) AS n_backfilled_null,
          |  CAST(SUM(prio) AS BIGINT) AS sum_prio,
          |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
          |FROM m""".stripMargin,
      "q_stats_sink" ->
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vsum,
          |  CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vmin,
          |  CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vmax
          |FROM lineitem""".stripMargin,
      "q_raster_topk" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
          |    CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v FROM g)
          |SELECT x, y, CAST(v AS BIGINT) AS v FROM gv
          |ORDER BY y DESC, x DESC LIMIT 300""".stripMargin,
      "q_raster_dpp" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT y, CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v
          |  FROM g WHERE y IN (SELECT r_regionkey * 19 + 3 FROM region
          |    WHERE r_regionkey < 4))
          |SELECT CAST(y AS BIGINT) AS y, CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST(COUNT(v) AS BIGINT) AS n_valid, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(MIN(v) AS BIGINT) AS vmin, CAST(MAX(v) AS BIGINT) AS vmax
          |FROM gv GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_stats_stream_sink" ->
        s"""WITH g AS (SELECT ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT hx % 1000 AS v FROM g WHERE hx % 19 <> 0)
          |SELECT CAST(5 AS BIGINT) AS n_epochs,
          |  CAST(COUNT(*) AS BIGINT) AS n_valid, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(MIN(v) AS BIGINT) AS vmin, CAST(MAX(v) AS BIGINT) AS vmax
          |FROM gv""".stripMargin,
      "q_raster_stream" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT y // 16 AS band,
          |    CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v FROM g)
          |SELECT CAST(band AS BIGINT) AS band, CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST(COUNT(v) AS BIGINT) AS n_valid, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(MIN(v) AS BIGINT) AS vmin, CAST(MAX(v) AS BIGINT) AS vmax
          |FROM gv GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_v2_pushdown" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT y, CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v
          |  FROM g WHERE y BETWEEN 40 AND 59)
          |SELECT y, CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST(COUNT(v) AS BIGINT) AS n_valid, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(1 AS BIGINT) AS v2_clamped,
          |  CAST(1 AS BIGINT) AS untranslatable_whole
          |FROM gv GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_raster_source" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT y, CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v
          |  FROM g WHERE y BETWEEN 20 AND 59)
          |SELECT y, CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST(COUNT(v) AS BIGINT) AS n_valid, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(MIN(v) AS BIGINT) AS vmin, CAST(MAX(v) AS BIGINT) AS vmax
          |FROM gv GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_bucketed_agg" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 720) t(i)),
          |gv AS (SELECT y, CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v
          |  FROM g)
          |SELECT y, CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST(COUNT(v) AS BIGINT) AS n_valid,
          |  CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(1 AS BIGINT) AS shuffle_free
          |FROM gv GROUP BY y ORDER BY y""".stripMargin,
      "q_source_stats" ->
        """SELECT CAST(120*80 AS BIGINT) AS full_rows,
          |  CAST(120*2 AS BIGINT) AS pruned_rows,
          |  CAST(1 AS BIGINT) AS size_tracks_pruning,
          |  CAST(1 AS BIGINT) AS stats_drove_broadcast,
          |  CAST((SELECT COUNT(*) FROM range(0, 2000000)) AS BIGINT)
          |    AS n_join_rows""".stripMargin,
      "q_raster_meta" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT x, y,
          |    CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v FROM g),
          |f AS (SELECT a.x AS x, a.y AS y, COUNT(b.v) AS vcnt
          |  FROM g a JOIN gv b
          |    ON b.x BETWEEN a.x - 1 AND a.x + 1
          |   AND b.y BETWEEN a.y - 1 AND a.y + 1
          |  GROUP BY 1, 2),
          |r AS (SELECT x // 2 AS rx, y // 2 AS ry,
          |    SUM(CASE WHEN vcnt > 0 THEN 1 ELSE 0 END) AS nv
          |  FROM f GROUP BY 1, 2),
          |p AS (SELECT CASE WHEN v IS NULL THEN -9999.0
          |    WHEN v <= 200 THEN 17.0 WHEN v <= 400 THEN 42.0
          |    WHEN v <= 600 THEN 8.0 WHEN v <= 800 THEN 99.0
          |    ELSE 3.0 END AS t FROM gv),
          |pa AS (SELECT CAST(SUM(CASE WHEN t <> -9999.0 THEN 1 ELSE 0 END) AS BIGINT) AS pred_n_valid,
          |    CAST(SUM(t) AS BIGINT) AS pred_sum FROM p)
          |SELECT 'EPSG:5070' AS crs,
          |  '60.0,0.0,1000.0,0.0,-60.0,2000.0' AS transform,
          |  'focal_mean_3x3>resample_2x2_mean' AS history,
          |  CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST(SUM(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
          |  'EPSG:5070' AS pred_crs,
          |  'predict' AS pred_history,
          |  CAST(-9999 AS BIGINT) AS pred_fill,
          |  pa.pred_n_valid, pa.pred_sum
          |FROM r, pa
          |GROUP BY pa.pred_n_valid, pa.pred_sum""".stripMargin,
      "q_stripe_meta" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT y, CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v
          |  FROM g WHERE y BETWEEN 16 AND 63)
          |SELECT CAST(16 + ((y - 16) // 6) * 6 AS BIGINT) AS _stripe,
          |  CAST(COUNT(*) AS BIGINT) AS n_cells, CAST(COUNT(v) AS BIGINT) AS n_valid,
          |  CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
          |FROM gv GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_ordered_scan" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v
          |  FROM g WHERE y BETWEEN 8 AND 71)
          |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(0 AS BIGINT) AS order_violations,
          |  CAST(1 AS BIGINT) AS local_sort_elided,
          |  CAST(1 AS BIGINT) AS global_sort_kept,
          |  CAST(1 AS BIGINT) AS x_sort_kept
          |FROM gv""".stripMargin,
      "q_resample" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT x // 2 AS rx, y // 2 AS ry,
          |    CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v
          |  FROM g)
          |SELECT rx, ry, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(COUNT(v) AS BIGINT) AS vcnt,
          |  CAST(ROUND(CAST(SUM(v) AS DOUBLE)/COUNT(v), 4) AS DECIMAL(18,4))::DOUBLE AS mean_v
          |FROM gv GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
      "q_raster_global" ->
        s"""WITH g AS (SELECT ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS hx
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT CASE WHEN hx % 19 = 0 THEN NULL ELSE hx % 1000 END AS v FROM g)
          |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST(COUNT(v) AS BIGINT) AS n_valid, CAST(SUM(v) AS BIGINT) AS vsum,
          |  CAST(MIN(v) AS BIGINT) AS vmin, CAST(MAX(v) AS BIGINT) AS vmax,
          |  CAST(ROUND(CAST(SUM(v) AS DOUBLE)/COUNT(v), 4) AS DECIMAL(18,4))::DOUBLE AS mean_v
          |FROM gv""".stripMargin,
      "q_map_algebra" ->
        s"""WITH g AS (SELECT i % 120 AS x, i // 120 AS y,
          |    ${TF.hexPrefix52Sql("md5('ras|'||(i % 120)||','||(i // 120))")} AS ha,
          |    ${TF.hexPrefix52Sql("md5('ras2|'||(i % 120)||','||(i // 120))")} AS hb
          |  FROM range(0, 9600) t(i)),
          |gv AS (SELECT x, y,
          |    CASE WHEN ha % 19 = 0 THEN NULL ELSE ha % 1000 END AS a,
          |    CASE WHEN hb % 23 = 0 THEN NULL ELSE hb % 1000 END AS b
          |  FROM g)
          |SELECT x, y, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
          |  CASE WHEN a IS NULL OR b IS NULL OR a + b = 0 THEN NULL
          |    ELSE CAST((CASE WHEN a >= b THEN 1 ELSE -1 END)
          |      * ((ABS(a - b) * 1000000) // (a + b)) AS BIGINT) END AS nd_ppm
          |FROM gv ORDER BY x, y""".stripMargin,
      "q_crossval" ->
        """WITH b AS (SELECT (l_orderkey * 8 + l_linenumber) % 5 AS fold,
          |    CAST(ROUND(l_extendedprice*100,0) AS HUGEINT) AS x,
          |    CAST(l_quantity AS HUGEINT) AS y FROM lineitem),
          |fm AS (SELECT fold, CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
          |    SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy FROM b GROUP BY 1),
          |tot AS (SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
          |    SUM(sxx) AS tsxx, SUM(sxy) AS tsxy FROM fm),
          |co AS (SELECT fold, CAST(n AS BIGINT) AS n_test,
          |    CAST(tn - n AS DOUBLE) AS ntr, CAST(tsx - sx AS DOUBLE) AS trx,
          |    CAST(tsy - sy AS DOUBLE) AS tryy, CAST(tsxx - sxx AS DOUBLE) AS trxx,
          |    CAST(tsxy - sxy AS DOUBLE) AS trxy FROM fm CROSS JOIN tot),
          |wf AS (SELECT fold, n_test, ntr, trx, tryy,
          |    (ntr*trxy - trx*tryy)/(ntr*trxx - trx*trx) AS w FROM co),
          |f AS (SELECT fold, n_test, ntr, w, (tryy - w*trx)/ntr AS b0 FROM wf),
          |e AS (SELECT b.fold,
          |    CAST(CAST(y AS DOUBLE)*100.0
          |      - ROUND((b0 + w*CAST(x AS DOUBLE))*100.0, 0) AS HUGEINT) AS e
          |  FROM b JOIN f ON b.fold = f.fold),
          |g AS (SELECT fold, SUM(e*e) AS sse,
          |    CAST(COUNT(*) AS DOUBLE) AS nt FROM e GROUP BY 1)
          |SELECT f.fold, CAST(f.ntr AS BIGINT) AS n_train, f.n_test,
          |  CAST(ROUND(w, 6) AS DECIMAL(18,6))::DOUBLE AS slope,
          |  CAST(ROUND(b0, 6) AS DECIMAL(18,6))::DOUBLE AS intercept,
          |  CAST(ROUND(sqrt(CAST(sse AS DOUBLE)/nt)/100.0, 4)
          |    AS DECIMAL(18,4))::DOUBLE AS rmse
          |FROM f JOIN g ON f.fold = g.fold ORDER BY 1""".stripMargin,
      "q_feat_importance" -> {
        val chain = featImpDerivs.zipWithIndex.map { case ((nm, f), i) =>
          s"d${i + 1} AS (SELECT *, $f AS $nm FROM d$i)"
        }.mkString(",\n")
        val last = s"d${featImpDerivs.length}"
        s"""WITH b AS (SELECT CAST(l_quantity AS HUGEINT) AS x1,
          |    CAST(ROUND(l_discount*100,0) AS HUGEINT) AS x2,
          |    CAST(ROUND(l_extendedprice*100,0) AS HUGEINT) AS y FROM lineitem),
          |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x1) AS s1h, SUM(x2) AS s2h,
          |    SUM(y) AS syh, SUM(x1*x1) AS s11h, SUM(x1*x2) AS s12h,
          |    SUM(x2*x2) AS s22h, SUM(x1*y) AS s1yh, SUM(x2*y) AS s2yh,
          |    SUM(y*y) AS syyh FROM b),
          |d0 AS (SELECT CAST(n AS DOUBLE) AS nd, CAST(s1h AS DOUBLE) AS s1,
          |    CAST(s2h AS DOUBLE) AS s2, CAST(syh AS DOUBLE) AS sy,
          |    CAST(s11h AS DOUBLE) AS s11, CAST(s12h AS DOUBLE) AS s12,
          |    CAST(s22h AS DOUBLE) AS s22, CAST(s1yh AS DOUBLE) AS s1y,
          |    CAST(s2yh AS DOUBLE) AS s2y, CAST(syyh AS DOUBLE) AS syy FROM m),
          |$chain
          |SELECT feature,
          |  CAST(ROUND(r2_full, 6) AS DECIMAL(18,6))::DOUBLE AS r2_full,
          |  CAST(ROUND(r2_without, 6) AS DECIMAL(18,6))::DOUBLE AS r2_without,
          |  CAST(ROUND(imp, 6) AS DECIMAL(18,6))::DOUBLE AS importance
          |FROM (
          |  SELECT 'x1' AS feature, r2_full, r2o2 AS r2_without,
          |    r2_full - r2o2 AS imp FROM $last
          |  UNION ALL
          |  SELECT 'x2' AS feature, r2_full, r2o1 AS r2_without,
          |    r2_full - r2o1 AS imp FROM $last)
          |ORDER BY feature""".stripMargin
      },
      "q_ridge_path" ->
        s"""WITH b AS (SELECT CAST(ROUND(l_extendedprice*100,0) AS HUGEINT) AS x,
          |    CAST(l_quantity AS HUGEINT) AS y FROM lineitem),
          |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sxh, SUM(y) AS syh,
          |    SUM(x*x) AS sxxh, SUM(x*y) AS sxyh, SUM(y*y) AS syyh FROM b),
          |al AS (SELECT unnest([0.0, 1e6, 1e9]) AS alpha),
          |d AS (SELECT alpha, CAST(n AS DOUBLE) AS nd, CAST(sxh AS DOUBLE) AS sx,
          |    CAST(syh AS DOUBLE) AS sy, CAST(sxxh AS DOUBLE) AS sxx,
          |    CAST(sxyh AS DOUBLE) AS sxy, CAST(syyh AS DOUBLE) AS syy
          |  FROM m CROSS JOIN al),
          |wf AS (SELECT *, (sxy - sx*sy/nd)/((sxx - sx*sx/nd) + alpha) AS w FROM d),
          |bf AS (SELECT *, (sy - w*sx)/nd AS b0 FROM wf),
          |sf AS (SELECT *, $sseFromMomentsSql) AS sse FROM bf)
          |SELECT alpha, CAST(ROUND(w, 6) AS DECIMAL(18,6))::DOUBLE AS slope,
          |  CAST(ROUND(b0, 6) AS DECIMAL(18,6))::DOUBLE AS intercept,
          |  CAST(ROUND(sqrt(sse/nd), 4) AS DECIMAL(18,4))::DOUBLE AS rmse_train
          |FROM sf ORDER BY alpha""".stripMargin,
      "q_knn_reg" ->
        s"""WITH $train, $q,
          |d AS (SELECT li_id, train.l_quantity AS ty,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice), tid) AS rn
          |  FROM q CROSS JOIN train)
          |SELECT li_id, CAST(ROUND(AVG(ty),4) AS DECIMAL(18,4))::DOUBLE AS prediction
          |FROM d WHERE rn <= 5 GROUP BY li_id ORDER BY li_id""".stripMargin,
      "q_radius_reg" ->
        s"""WITH $train, $q
          |SELECT li_id, CAST(COUNT(train.tid) AS BIGINT) AS n_in_radius,
          |  CASE WHEN COUNT(train.tid) = 0 THEN NULL
          |    ELSE CAST(ROUND(CAST(SUM(train.l_quantity) AS DOUBLE)/COUNT(train.tid),4)
          |      AS DECIMAL(18,4))::DOUBLE END AS prediction
          |FROM q LEFT JOIN train
          |  ON (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice)
          |     <= 90000.0
          |GROUP BY li_id ORDER BY li_id""".stripMargin,
      "q_rank_norm" ->
        s"""WITH $q
          |SELECT li_id,
          |  CAST(ROW_NUMBER() OVER (ORDER BY l_extendedprice, li_id) - 1 AS DOUBLE)
          |    / (COUNT(*) OVER () - 1) AS rank_pct
          |FROM q ORDER BY li_id""".stripMargin,
      "q_knn_weighted" ->
        s"""WITH $train, $q,
          |d AS (SELECT li_id, train.l_quantity AS ty,
          |  (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice) AS d2,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice), tid) AS rn
          |  FROM q CROSS JOIN train)
          |SELECT li_id, CAST(ROUND(CASE
          |    WHEN SUM(CASE WHEN d2 = 0 THEN 1 ELSE 0 END) > 0
          |    THEN AVG(ty) FILTER (WHERE d2 = 0)
          |    ELSE SUM(ty/SQRT(d2))/SUM(1/SQRT(d2)) END, 4) AS DECIMAL(18,4))::DOUBLE AS prediction
          |FROM d WHERE rn <= 5 GROUP BY li_id ORDER BY li_id""".stripMargin,
      "q_knn_reg_multi" ->
        s"""WITH $train, $q,
          |d AS (SELECT li_id, train.l_extendedprice AS ty1, train.l_suppkey AS ty2,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    (q.l_quantity-train.l_quantity)*(q.l_quantity-train.l_quantity)
          |    +(q.l_discount-train.l_discount)*(q.l_discount-train.l_discount)
          |    +(q.l_tax-train.l_tax)*(q.l_tax-train.l_tax), tid) AS rn
          |  FROM q CROSS JOIN train)
          |SELECT li_id, CAST(ROUND(AVG(ty1),4) AS DECIMAL(18,4))::DOUBLE AS pred_price,
          |  CAST(ROUND(AVG(ty2),4) AS DECIMAL(18,4))::DOUBLE AS pred_supp
          |FROM d WHERE rn <= 5 GROUP BY li_id ORDER BY li_id""".stripMargin,
      "q_knn_cls" ->
        s"""WITH $train, $q,
          |d AS (SELECT li_id, train.l_returnflag AS tcls,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice)
          |    +(q.l_quantity-train.l_quantity)*(q.l_quantity-train.l_quantity), tid) AS rn
          |  FROM q CROSS JOIN train),
          |k AS (SELECT li_id, tcls, COUNT(*) AS cnt FROM d WHERE rn <= 5 GROUP BY 1,2),
          |r AS (SELECT li_id, tcls,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY cnt DESC, tcls) AS rr FROM k)
          |SELECT li_id, tcls AS prediction FROM r WHERE rr = 1 ORDER BY li_id""".stripMargin,
      "q_knn_cls_weighted" ->
        s"""WITH $train, $q,
          |d AS (SELECT li_id, train.l_returnflag AS tcls,
          |  (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice)
          |    + (q.l_quantity-train.l_quantity)*(q.l_quantity-train.l_quantity) AS d2,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice)
          |    + (q.l_quantity-train.l_quantity)*(q.l_quantity-train.l_quantity), tid) AS rn
          |  FROM q CROSS JOIN train),
          |nb AS (SELECT * FROM d WHERE rn <= 5),
          |ex AS (SELECT li_id, MAX(CASE WHEN d2 = 0 THEN 1 ELSE 0 END) AS has_exact
          |  FROM nb GROUP BY 1),
          |w AS (SELECT nb.li_id, tcls, rn,
          |  CASE WHEN has_exact = 1 THEN CASE WHEN d2 = 0 THEN 1.0 ELSE 0.0 END
          |       ELSE 1.0/SQRT(d2) END AS wt
          |  FROM nb JOIN ex ON nb.li_id = ex.li_id),
          |sc AS (SELECT li_id, tcls, list_sum(list(wt ORDER BY rn)) AS score
          |  FROM w GROUP BY 1,2),
          |r AS (SELECT li_id, tcls,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY score DESC, tcls) AS rr
          |  FROM sc)
          |SELECT li_id, tcls AS prediction FROM r WHERE rr = 1
          |ORDER BY li_id""".stripMargin,
      "q_knn_missing" ->
        s"""WITH $train, $q,
          |qp AS (SELECT li_id, l_quantity, l_extendedprice, l_discount,
          |  CAST(${TF.hexPrefix52Sql("md5(li_id)")} % 4 AS BIGINT) AS pat FROM q),
          |d AS (SELECT li_id, pat, train.l_quantity AS ty,
          |  CASE WHEN pat = 0 THEN
          |    (2.0/1) * ((qp.l_discount-train.l_discount)*(qp.l_discount-train.l_discount))
          |  WHEN pat = 1 THEN
          |    (2.0/1) * ((qp.l_extendedprice-train.l_extendedprice)*(qp.l_extendedprice-train.l_extendedprice))
          |  ELSE
          |    (2.0/2) * ((qp.l_extendedprice-train.l_extendedprice)*(qp.l_extendedprice-train.l_extendedprice)
          |      + (qp.l_discount-train.l_discount)*(qp.l_discount-train.l_discount))
          |  END AS d2, tid
          |  FROM qp CROSS JOIN train),
          |r AS (SELECT li_id, pat, ty,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY d2, tid) AS rn FROM d)
          |SELECT li_id, pat, CAST(ROUND(AVG(ty),4) AS DECIMAL(18,4))::DOUBLE AS prediction
          |FROM r WHERE rn <= 5 GROUP BY 1,2 ORDER BY li_id""".stripMargin,
      "q_knn_proba" ->
        s"""WITH $train, $q,
          |d AS (SELECT li_id, train.l_returnflag AS tcls,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice)
          |    +(q.l_quantity-train.l_quantity)*(q.l_quantity-train.l_quantity), tid) AS rn
          |  FROM q CROSS JOIN train)
          |SELECT li_id,
          |  CAST(ROUND(SUM(CASE WHEN tcls='A' THEN 1 ELSE 0 END)/5.0,4) AS DECIMAL(18,4))::DOUBLE AS p_A,
          |  CAST(ROUND(SUM(CASE WHEN tcls='N' THEN 1 ELSE 0 END)/5.0,4) AS DECIMAL(18,4))::DOUBLE AS p_N,
          |  CAST(ROUND(SUM(CASE WHEN tcls='R' THEN 1 ELSE 0 END)/5.0,4) AS DECIMAL(18,4))::DOUBLE AS p_R
          |FROM d WHERE rn <= 5 GROUP BY li_id ORDER BY li_id""".stripMargin,
      "q_kneighbors" ->
        s"""WITH $train, $q,
          |d AS (SELECT li_id, tid,
          |  (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice) AS d2,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice), tid) AS rn
          |  FROM q CROSS JOIN train)
          |SELECT li_id,
          |  MAX(CASE WHEN rn=1 THEN tid END) AS neighbor0,
          |  MAX(CASE WHEN rn=2 THEN tid END) AS neighbor1,
          |  MAX(CASE WHEN rn=3 THEN tid END) AS neighbor2,
          |  CAST(ROUND(MAX(CASE WHEN rn=1 THEN SQRT(d2) END),4) AS DECIMAL(18,4))::DOUBLE AS distance0,
          |  CAST(ROUND(MAX(CASE WHEN rn=2 THEN SQRT(d2) END),4) AS DECIMAL(18,4))::DOUBLE AS distance1,
          |  CAST(ROUND(MAX(CASE WHEN rn=3 THEN SQRT(d2) END),4) AS DECIMAL(18,4))::DOUBLE AS distance2
          |FROM d WHERE rn <= 3 GROUP BY li_id ORDER BY li_id""".stripMargin,
      "q_std_scaler" ->
        s"""WITH $train,
          |st AS (SELECT AVG(l_quantity) AS m1, STDDEV_POP(l_quantity) AS s1,
          |  AVG(l_extendedprice) AS m2, STDDEV_POP(l_extendedprice) AS s2,
          |  AVG(l_discount) AS m3, STDDEV_POP(l_discount) AS s3 FROM train)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND((l_quantity-m1)/s1,4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_quantity,
          |  CAST(ROUND((l_extendedprice-m2)/s2,4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_extendedprice,
          |  CAST(ROUND((l_discount-m3)/s3,4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_discount
          |FROM lineitem CROSS JOIN st ORDER BY li_id""".stripMargin,
      "q_pca_inverse" ->
        s"""SELECT $uidSql AS li_id,
          |  CAST(ROUND(l_quantity,4) AS DECIMAL(18,4))::DOUBLE AS l_quantity,
          |  CAST(ROUND(l_discount,4) AS DECIMAL(18,4))::DOUBLE AS l_discount
          |FROM lineitem ORDER BY li_id""".stripMargin,
      "q_robust_scaler" ->
        s"""WITH $train,
          |st AS (SELECT
          |  quantile_cont(l_quantity,0.5) AS m1,
          |  quantile_cont(l_quantity,0.75) - quantile_cont(l_quantity,0.25) AS s1,
          |  quantile_cont(l_extendedprice,0.5) AS m2,
          |  quantile_cont(l_extendedprice,0.75) - quantile_cont(l_extendedprice,0.25) AS s2,
          |  quantile_cont(l_discount,0.5) AS m3,
          |  quantile_cont(l_discount,0.75) - quantile_cont(l_discount,0.25) AS s3
          |  FROM train),
          |sg AS (SELECT m1, m2, m3,
          |  CASE WHEN s1 = 0 THEN 1.0 ELSE s1 END AS s1,
          |  CASE WHEN s2 = 0 THEN 1.0 ELSE s2 END AS s2,
          |  CASE WHEN s3 = 0 THEN 1.0 ELSE s3 END AS s3 FROM st)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND((l_quantity-m1)/s1,4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_quantity,
          |  CAST(ROUND((l_extendedprice-m2)/s2,4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_extendedprice,
          |  CAST(ROUND((l_discount-m3)/s3,4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_discount
          |FROM lineitem CROSS JOIN sg ORDER BY li_id""".stripMargin,
      "q_calibration" ->
        s"""WITH $train,
          |q AS (SELECT $uidSql AS li_id, l_quantity, l_discount, l_tax,
          |  l_extendedprice, l_partkey, l_suppkey FROM lineitem
          |  WHERE l_orderkey < 8000),
          |d AS (SELECT li_id, train.l_returnflag AS tcls,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    (q.l_extendedprice-train.l_extendedprice)*(q.l_extendedprice-train.l_extendedprice)
          |    +(q.l_quantity-train.l_quantity)*(q.l_quantity-train.l_quantity), tid) AS rn
          |  FROM q CROSS JOIN train),
          |g AS (SELECT li_id, SUM(CASE WHEN tcls='R' THEN 1 ELSE 0 END) AS bin
          |  FROM d WHERE rn <= 5 GROUP BY li_id),
          |q2 AS (SELECT $uidSql AS li_id, l_returnflag FROM lineitem
          |  WHERE l_orderkey < 8000)
          |SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
          |  CAST(SUM(CAST(q2.l_returnflag = 'R' AS BIGINT)) AS BIGINT) AS n_true,
          |  CAST(ROUND(SUM(CAST(q2.l_returnflag = 'R' AS BIGINT))::DOUBLE / COUNT(*), 4)
          |    AS DECIMAL(18,4))::DOUBLE AS actual_rate
          |FROM g JOIN q2 USING (li_id) GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_reg_metrics" ->
        s"""WITH $train,
          |co AS (SELECT REGR_SLOPE(l_extendedprice, l_quantity) AS b1,
          |  REGR_INTERCEPT(l_extendedprice, l_quantity) AS b0 FROM train),
          |e AS (SELECT CAST(ROUND(ROUND(b0 + b1*l_quantity, 2)*100, 0) AS HUGEINT)
          |    - CAST(ROUND(l_extendedprice*100,0) AS HUGEINT) AS ec,
          |    CAST(ROUND(l_extendedprice*100,0) AS HUGEINT) AS yc
          |  FROM lineitem CROSS JOIN co),
          |m AS (SELECT COUNT(*) AS n, SUM(ABS(ec)) AS sa, SUM(ec*ec) AS ss,
          |    SUM(yc) AS sy, SUM(yc*yc) AS syy FROM e)
          |SELECT n AS n_rows,
          |  CAST(ROUND(CAST(sa AS DOUBLE)/n/100.0, 4) AS DECIMAL(18,4))::DOUBLE AS mae,
          |  CAST(ROUND(sqrt(CAST(ss AS DOUBLE)/n)/100.0, 4) AS DECIMAL(18,4))::DOUBLE AS rmse,
          |  CAST(ROUND(1.0 - CAST(ss AS DOUBLE)
          |    /(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n), 4)
          |    AS DECIMAL(18,4))::DOUBLE AS r2
          |FROM m""".stripMargin,
      "q_class_weight" ->
        """WITH g AS (SELECT l_returnflag AS class, COUNT(*) AS n_c FROM lineitem GROUP BY 1),
          |t AS (SELECT SUM(n_c) AS n, COUNT(*) AS k FROM g)
          |SELECT class, n_c, CAST(n AS DOUBLE)/(k*n_c) AS weight
          |FROM g CROSS JOIN t ORDER BY class""".stripMargin,
      "q_impute" ->
        s"""WITH tt AS (SELECT CASE WHEN l_partkey % 37 = 0 THEN NULL ELSE l_quantity END AS x1
          |  FROM lineitem WHERE l_orderkey % 499 = 0 AND l_orderkey < 1000000),
          |m AS (SELECT SUM(CAST(x1 AS BIGINT))::DOUBLE / COUNT(x1) AS fill FROM tt)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND(COALESCE(
          |    CASE WHEN l_partkey % 37 = 0 THEN NULL ELSE l_quantity END, fill), 4)
          |    AS DECIMAL(18,4))::DOUBLE AS imp_x1
          |FROM lineitem CROSS JOIN m ORDER BY li_id""".stripMargin,
      "q_poly" ->
        s"""SELECT $uidSql AS li_id,
          |  CAST(ROUND(l_quantity,4) AS DECIMAL(18,4))::DOUBLE AS p_q,
          |  CAST(ROUND(l_discount,4) AS DECIMAL(18,4))::DOUBLE AS p_d,
          |  CAST(ROUND(l_quantity*l_quantity,4) AS DECIMAL(18,4))::DOUBLE AS p_qq,
          |  CAST(ROUND(l_quantity*l_discount,4) AS DECIMAL(18,4))::DOUBLE AS p_qd,
          |  CAST(ROUND(l_discount*l_discount,4) AS DECIMAL(18,4))::DOUBLE AS p_dd
          |FROM lineitem ORDER BY li_id""".stripMargin,
      "q_nbayes" ->
        s"""WITH $train,
          |tt AS (SELECT CAST(FLOOR(l_quantity/10) AS BIGINT) AS f1,
          |    CAST(ROUND(l_discount*100,0) AS BIGINT) AS f2,
          |    CAST(ROUND(l_tax*100,0) AS BIGINT) AS f3, l_returnflag AS c FROM train),
          |cls AS (SELECT c, COUNT(*) AS n_c FROM tt GROUP BY 1),
          |c1 AS (SELECT c, f1 AS v, COUNT(*) AS n FROM tt GROUP BY 1,2),
          |c2 AS (SELECT c, f2 AS v, COUNT(*) AS n FROM tt GROUP BY 1,2),
          |c3 AS (SELECT c, f3 AS v, COUNT(*) AS n FROM tt GROUP BY 1,2),
          |vs AS (SELECT (SELECT COUNT(DISTINCT f1) FROM tt) AS v1,
          |    (SELECT COUNT(DISTINCT f2) FROM tt) AS v2,
          |    (SELECT COUNT(DISTINCT f3) FROM tt) AS v3),
          |q AS (SELECT $uidSql AS li_id,
          |    CAST(FLOOR(l_quantity/10) AS BIGINT) AS f1,
          |    CAST(ROUND(l_discount*100,0) AS BIGINT) AS f2,
          |    CAST(ROUND(l_tax*100,0) AS BIGINT) AS f3 FROM lineitem),
          |s AS (SELECT li_id, cls.c,
          |    CAST(cls.n_c * (COALESCE(c1.n,0)+1) * (COALESCE(c2.n,0)+1) * (COALESCE(c3.n,0)+1) AS DOUBLE)
          |    / CAST((cls.n_c + v1) * (cls.n_c + v2) * (cls.n_c + v3) AS DOUBLE) AS sc
          |  FROM q CROSS JOIN cls CROSS JOIN vs
          |  LEFT JOIN c1 ON c1.c = cls.c AND c1.v = q.f1
          |  LEFT JOIN c2 ON c2.c = cls.c AND c2.v = q.f2
          |  LEFT JOIN c3 ON c3.c = cls.c AND c3.v = q.f3),
          |r AS (SELECT li_id, c,
          |    ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY sc DESC, c) AS rn FROM s)
          |SELECT li_id, c AS prediction FROM r WHERE rn = 1 ORDER BY li_id""".stripMargin,
      "q_onehot" ->
        s"""SELECT $uidSql AS li_id,
          |  CAST(l_returnflag = 'A' AS BIGINT) AS l_returnflag_A,
          |  CAST(l_returnflag = 'N' AS BIGINT) AS l_returnflag_N,
          |  CAST(l_returnflag = 'R' AS BIGINT) AS l_returnflag_R,
          |  CAST(l_linestatus = 'F' AS BIGINT) AS l_linestatus_F,
          |  CAST(l_linestatus = 'O' AS BIGINT) AS l_linestatus_O
          |FROM lineitem ORDER BY li_id""".stripMargin,
      "q_maxabs" ->
        s"""WITH $train,
          |st AS (SELECT
          |  GREATEST(ABS(MIN(l_quantity)), ABS(MAX(l_quantity))) AS s1,
          |  GREATEST(ABS(MIN(l_extendedprice)), ABS(MAX(l_extendedprice))) AS s2,
          |  GREATEST(ABS(MIN(l_discount)), ABS(MAX(l_discount))) AS s3
          |  FROM train)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND(l_quantity/s1,4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_quantity,
          |  CAST(ROUND(l_extendedprice/s2,4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_extendedprice,
          |  CAST(ROUND(l_discount/s3,4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_discount
          |FROM lineitem CROSS JOIN st ORDER BY li_id""".stripMargin,
      "q_winsorize" ->
        s"""WITH $train,
          |st AS (SELECT
          |  quantile_cont(l_quantity,0.05) AS lo1, quantile_cont(l_quantity,0.95) AS hi1,
          |  quantile_cont(l_extendedprice,0.05) AS lo2, quantile_cont(l_extendedprice,0.95) AS hi2,
          |  quantile_cont(l_discount,0.05) AS lo3, quantile_cont(l_discount,0.95) AS hi3
          |  FROM train)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND(GREATEST(lo1, LEAST(hi1, l_quantity)),4) AS DECIMAL(18,4))::DOUBLE AS w_l_quantity,
          |  CAST(ROUND(GREATEST(lo2, LEAST(hi2, l_extendedprice)),4) AS DECIMAL(18,4))::DOUBLE AS w_l_extendedprice,
          |  CAST(ROUND(GREATEST(lo3, LEAST(hi3, l_discount)),4) AS DECIMAL(18,4))::DOUBLE AS w_l_discount
          |FROM lineitem CROSS JOIN st ORDER BY li_id""".stripMargin,
      "q_ridge" ->
        s"""WITH $train,
          |t AS (SELECT CAST(l_quantity AS DOUBLE) AS x1,
          |    CAST(ROUND(l_discount*100,0) AS DOUBLE) AS x2,
          |    CAST(ROUND(l_extendedprice*100,0) AS DOUBLE) AS y FROM train),
          |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x1) AS s1, SUM(x2) AS s2,
          |    SUM(y) AS sy, SUM(x1*x1) AS s11, SUM(x1*x2) AS s12, SUM(x2*x2) AS s22,
          |    SUM(x1*y) AS s1y, SUM(x2*y) AS s2y FROM t),
          |a AS (SELECT n, s1, s2, sy,
          |  s11 - s1*s1/n + 1000.0 AS a11, s12 - s1*s2/n AS a12,
          |  s22 - s2*s2/n + 1000.0 AS a22,
          |  s1y - s1*sy/n AS b1, s2y - s2*sy/n AS b2 FROM m),
          |w AS (SELECT n, s1, s2, sy,
          |  (b1*a22 - b2*a12)/(a11*a22 - a12*a12) AS w1,
          |  (a11*b2 - a12*b1)/(a11*a22 - a12*a12) AS w2 FROM a),
          |f AS (SELECT w1, w2, sy/n - w1*(s1/n) - w2*(s2/n) AS b0 FROM w)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND((b0 + CAST(l_quantity AS DOUBLE)*w1
          |    + CAST(ROUND(l_discount*100,0) AS DOUBLE)*w2)/100.0,2)
          |    AS DECIMAL(18,2))::DOUBLE AS prediction
          |FROM lineitem CROSS JOIN f ORDER BY li_id""".stripMargin,
      "q_target_enc" ->
        s"""WITH $train,
          |g AS (SELECT l_suppkey AS gk, SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT))::DOUBLE AS s,
          |    CAST(COUNT(*) AS DOUBLE) AS c FROM train GROUP BY 1),
          |p AS (SELECT FLOOR(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT))::DOUBLE
          |    / CAST(COUNT(*) AS DOUBLE) + 0.5) AS prior FROM train)
          |SELECT $uidSql AS li_id,
          |  ROUND((COALESCE(g.s, 0.0) + 10.0*p.prior)/(COALESCE(g.c, 0.0) + 10.0)*100.0, 0)
          |    / 10000.0 AS enc_supp
          |FROM lineitem CROSS JOIN p LEFT JOIN g ON lineitem.l_suppkey = g.gk
          |ORDER BY li_id""".stripMargin,
      "q_l2norm" ->
        s"""WITH n AS (SELECT *,
          |  sqrt(l_quantity*l_quantity + l_extendedprice*l_extendedprice
          |    + l_discount*l_discount) AS n0 FROM lineitem),
          |g AS (SELECT *, CASE WHEN n0 = 0 THEN 1.0 ELSE n0 END AS ns FROM n)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND(l_quantity/ns,4) AS DECIMAL(18,4))::DOUBLE AS norm_l_quantity,
          |  CAST(ROUND(l_extendedprice/ns,4) AS DECIMAL(18,4))::DOUBLE AS norm_l_extendedprice,
          |  CAST(ROUND(l_discount/ns,4) AS DECIMAL(18,4))::DOUBLE AS norm_l_discount
          |FROM g ORDER BY li_id""".stripMargin,
      "q_kbins" -> {
        val feats = Seq("l_quantity" -> "1", "l_extendedprice" -> "2", "l_discount" -> "3")
        val edgeAggs = feats.flatMap { case (c, i) =>
          (1 until 5).map(j => s"quantile_cont($c,0.${2 * j}) AS e${j}_$i")
        }.mkString(", ")
        val bins = feats.map { case (c, i) =>
          "CAST(" + (1 until 5).map(j => s"CAST($c > e${j}_$i AS INT)").mkString(" + ") +
            s" AS BIGINT) AS bin_$c"
        }.mkString(",\n  ")
        s"""WITH $train,
          |e AS (SELECT $edgeAggs FROM train)
          |SELECT $uidSql AS li_id,
          |  ${bins.split("\n").mkString("\n          |")}
          |FROM lineitem CROSS JOIN e ORDER BY li_id""".stripMargin
      },
      "q_minmax_scaler" ->
        s"""WITH $train,
          |st AS (SELECT MIN(l_quantity) AS lo1, MAX(l_quantity) AS hi1,
          |  MIN(l_extendedprice) AS lo2, MAX(l_extendedprice) AS hi2,
          |  MIN(l_discount) AS lo3, MAX(l_discount) AS hi3 FROM train)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND((l_quantity-lo1)/(hi1-lo1),4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_quantity,
          |  CAST(ROUND((l_extendedprice-lo2)/(hi2-lo2),4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_extendedprice,
          |  CAST(ROUND((l_discount-lo3)/(hi3-lo3),4) AS DECIMAL(18,4))::DOUBLE AS scaled_l_discount
          |FROM lineitem CROSS JOIN st ORDER BY li_id""".stripMargin,
      "q_inverse_std" ->
        s"""WITH $train,
          |st AS (SELECT AVG(l_quantity) AS m1, STDDEV_POP(l_quantity) AS s1,
          |  AVG(l_extendedprice) AS m2, STDDEV_POP(l_extendedprice) AS s2,
          |  AVG(l_discount) AS m3, STDDEV_POP(l_discount) AS s3 FROM train)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND(((l_quantity-m1)/s1)*s1+m1,2) AS DECIMAL(18,2))::DOUBLE AS l_quantity,
          |  CAST(ROUND(((l_extendedprice-m2)/s2)*s2+m2,2) AS DECIMAL(18,2))::DOUBLE AS l_extendedprice,
          |  CAST(ROUND(((l_discount-m3)/s3)*s3+m3,2) AS DECIMAL(18,2))::DOUBLE AS l_discount
          |FROM lineitem CROSS JOIN st ORDER BY li_id""".stripMargin,
      "q_linreg" ->
        s"""WITH $train,
          |co AS (SELECT REGR_SLOPE(l_extendedprice, l_quantity) AS b1,
          |  REGR_INTERCEPT(l_extendedprice, l_quantity) AS b0 FROM train)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND(b0 + b1*l_quantity,2) AS DECIMAL(18,2))::DOUBLE AS prediction
          |FROM lineitem CROSS JOIN co ORDER BY li_id""".stripMargin,
      "q_shap_linear" ->
        s"""WITH $train,
          |mo AS (SELECT VAR_POP(l_quantity) AS v1, VAR_POP(l_discount) AS v2,
          |  COVAR_POP(l_quantity, l_discount) AS c12,
          |  COVAR_POP(l_quantity, l_extendedprice) AS c1y,
          |  COVAR_POP(l_discount, l_extendedprice) AS c2y,
          |  AVG(l_quantity) AS m1, AVG(l_discount) AS m2, AVG(l_extendedprice) AS my
          |  FROM train),
          |co AS (SELECT m1, m2,
          |  (v2*c1y - c12*c2y)/(v1*v2 - c12*c12) AS b1,
          |  (v1*c2y - c12*c1y)/(v1*v2 - c12*c12) AS b2,
          |  my - (v2*c1y - c12*c2y)/(v1*v2 - c12*c12)*m1
          |     - (v1*c2y - c12*c1y)/(v1*v2 - c12*c12)*m2 AS b0 FROM mo)
          |SELECT li_id,
          |  CAST(ROUND(b0 + b1*m1 + b2*m2, 2) AS DECIMAL(18,2))::DOUBLE AS base,
          |  CAST(ROUND(b1*(l_quantity - m1), 2) AS DECIMAL(18,2))::DOUBLE AS phi_qty,
          |  CAST(ROUND(b2*(l_discount - m2), 2) AS DECIMAL(18,2))::DOUBLE AS phi_disc,
          |  CAST(ROUND(b0 + b1*l_quantity + b2*l_discount, 2) AS DECIMAL(18,2))::DOUBLE AS prediction
          |FROM (SELECT $uidSql AS li_id, l_quantity, l_discount FROM lineitem
          |      WHERE l_orderkey % 997 = 0) CROSS JOIN co
          |ORDER BY li_id""".stripMargin,
      "q_linreg_multi" ->
        s"""WITH $train,
          |mo AS (SELECT VAR_POP(l_quantity) AS v1, VAR_POP(l_discount) AS v2,
          |  COVAR_POP(l_quantity, l_discount) AS c12,
          |  COVAR_POP(l_quantity, l_extendedprice) AS c1y,
          |  COVAR_POP(l_discount, l_extendedprice) AS c2y,
          |  AVG(l_quantity) AS m1, AVG(l_discount) AS m2, AVG(l_extendedprice) AS my
          |  FROM train),
          |co AS (SELECT
          |  (v2*c1y - c12*c2y)/(v1*v2 - c12*c12) AS b1,
          |  (v1*c2y - c12*c1y)/(v1*v2 - c12*c12) AS b2,
          |  my - (v2*c1y - c12*c2y)/(v1*v2 - c12*c12)*m1
          |     - (v1*c2y - c12*c1y)/(v1*v2 - c12*c12)*m2 AS b0 FROM mo)
          |SELECT $uidSql AS li_id,
          |  CAST(ROUND(b0 + b1*l_quantity + b2*l_discount,2) AS DECIMAL(18,2))::DOUBLE AS prediction
          |FROM lineitem CROSS JOIN co ORDER BY li_id""".stripMargin,
      "q_rf_reg" ->
        s"""WITH $q
          |SELECT li_id, CAST(1 AS INTEGER) AS in_hull,
          |  CAST(1 AS INTEGER) AS consistent FROM q ORDER BY li_id""".stripMargin,
      "q_gbt_reg" ->
        s"""WITH $q
          |SELECT li_id, CAST(1 AS INTEGER) AS in_hull,
          |  CAST(1 AS INTEGER) AS consistent FROM q ORDER BY li_id""".stripMargin,
      "q_cart_reg" ->
        s"""WITH $train, $q,
          |t0 AS (SELECT tid, l_quantity AS f0, l_discount AS f1, l_tax AS f2,
          |  CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS y FROM train),
          |${cartSplitBlock("t0", "root")},
          |tl AS (SELECT t0.* FROM t0 CROSS JOIN root_best b
          |  WHERE ${cartFv("b", "f0", "f1", "f2")} <= b.thr),
          |tr AS (SELECT t0.* FROM t0 CROSS JOIN root_best b
          |  WHERE ${cartFv("b", "f0", "f1", "f2")} > b.thr),
          |${cartSplitBlock("tl", "lft")},
          |${cartSplitBlock("tr", "rgt")},
          |leaf_ll AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS p FROM tl
          |  CROSS JOIN lft_best b WHERE ${cartFv("b", "f0", "f1", "f2")} <= b.thr),
          |leaf_lr AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS p FROM tl
          |  CROSS JOIN lft_best b WHERE ${cartFv("b", "f0", "f1", "f2")} > b.thr),
          |leaf_rl AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS p FROM tr
          |  CROSS JOIN rgt_best b WHERE ${cartFv("b", "f0", "f1", "f2")} <= b.thr),
          |leaf_rr AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS p FROM tr
          |  CROSS JOIN rgt_best b WHERE ${cartFv("b", "f0", "f1", "f2")} > b.thr)
          |SELECT li_id, CAST(ROUND(
          |  CASE WHEN ${cartFv("rb", "l_quantity", "l_discount", "l_tax")} <= rb.thr
          |  THEN CASE WHEN ${cartFv("lb", "l_quantity", "l_discount", "l_tax")} <= lb.thr
          |       THEN ll.p ELSE lr.p END
          |  ELSE CASE WHEN ${cartFv("gb", "l_quantity", "l_discount", "l_tax")} <= gb.thr
          |       THEN rl.p ELSE rr.p END END, 4) AS DECIMAL(18,4))::DOUBLE AS prediction
          |FROM q CROSS JOIN root_best rb CROSS JOIN lft_best lb CROSS JOIN rgt_best gb
          |CROSS JOIN leaf_ll ll CROSS JOIN leaf_lr lr
          |CROSS JOIN leaf_rl rl CROSS JOIN leaf_rr rr
          |ORDER BY li_id""".stripMargin,
      "q_gbt_stage1" ->
        s"""WITH $train, $q,
          |t0 AS (SELECT tid, l_quantity AS f0, l_discount AS f1, l_tax AS f2,
          |  CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS y FROM train),
          |${cartSplitBlock("t0", "root")},
          |gm AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS mean FROM t0),
          |leaf_l AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS p FROM t0
          |  CROSS JOIN root_best b WHERE ${cartFv("b", "f0", "f1", "f2")} <= b.thr),
          |leaf_r AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS p FROM t0
          |  CROSS JOIN root_best b WHERE ${cartFv("b", "f0", "f1", "f2")} > b.thr)
          |SELECT li_id, CAST(ROUND(
          |  CASE WHEN ${cartFv("rb", "l_quantity", "l_discount", "l_tax")} <= rb.thr
          |  THEN (1.0-0.5)*gm.mean + 0.5*ll.p
          |  ELSE (1.0-0.5)*gm.mean + 0.5*lr.p END, 4) AS DECIMAL(18,4))::DOUBLE AS prediction
          |FROM q CROSS JOIN root_best rb CROSS JOIN gm
          |CROSS JOIN leaf_l ll CROSS JOIN leaf_r lr
          |ORDER BY li_id""".stripMargin,
      "q_gbt_stage2" ->
        s"""WITH $train, $q,
          |t0 AS (SELECT tid, l_quantity AS f0, l_discount AS f1, l_tax AS f2,
          |  CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS y FROM train),
          |${cartSplitBlock("t0", "root")},
          |gm AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS mean FROM t0),
          |lc AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS p FROM t0
          |  CROSS JOIN root_best b WHERE ${cartFv("b", "f0", "f1", "f2")} <= b.thr),
          |rc AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*)/100 AS p FROM t0
          |  CROSS JOIN root_best b WHERE ${cartFv("b", "f0", "f1", "f2")} > b.thr),
          |qc AS (SELECT
          |    CAST(FLOOR(((1.0-0.5)*gm.mean + 0.5*lc.p)*100 + 0.5) AS BIGINT) AS ql,
          |    CAST(FLOOR(((1.0-0.5)*gm.mean + 0.5*rc.p)*100 + 0.5) AS BIGINT) AS qr
          |  FROM gm CROSS JOIN lc CROSS JOIN rc),
          |t1 AS (SELECT t0.tid, t0.f0, t0.f1, t0.f2,
          |    t0.y - CASE WHEN ${cartFv("b", "t0.f0", "t0.f1", "t0.f2")} <= b.thr
          |      THEN qc.ql ELSE qc.qr END AS y
          |  FROM t0 CROSS JOIN root_best b CROSS JOIN qc),
          |${cartSplitBlock("t1", "st2")},
          |l2 AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*) AS tm FROM t1
          |  CROSS JOIN st2_best b WHERE ${cartFv("b", "f0", "f1", "f2")} <= b.thr),
          |r2 AS (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(*) AS tm FROM t1
          |  CROSS JOIN st2_best b WHERE ${cartFv("b", "f0", "f1", "f2")} > b.thr)
          |SELECT li_id, CAST(ROUND(
          |  (CASE WHEN ${cartFv("rb", "l_quantity", "l_discount", "l_tax")} <= rb.thr
          |   THEN (1.0-0.5)*gm.mean + 0.5*ll.p
          |   ELSE (1.0-0.5)*gm.mean + 0.5*rr.p END)
          |  + (CASE WHEN ${cartFv("sb", "l_quantity", "l_discount", "l_tax")} <= sb.thr
          |     THEN 0.5*(l2.tm/100)
          |     ELSE 0.5*(r2.tm/100) END)
          |  , 4) AS DECIMAL(18,4))::DOUBLE AS prediction
          |FROM q CROSS JOIN root_best rb CROSS JOIN st2_best sb CROSS JOIN gm
          |CROSS JOIN lc ll CROSS JOIN rc rr
          |CROSS JOIN l2 CROSS JOIN r2
          |ORDER BY li_id""".stripMargin,
      "q_pca" ->
        s"""WITH $train, $q,
          |mo AS (SELECT
          |  SUM(l_quantity*l_quantity)/COUNT(*) - AVG(l_quantity)*AVG(l_quantity) AS a,
          |  SUM(l_discount*l_discount)/COUNT(*) - AVG(l_discount)*AVG(l_discount) AS b,
          |  SUM(l_quantity*l_discount)/COUNT(*) - AVG(l_quantity)*AVG(l_discount) AS c,
          |  AVG(l_quantity) AS mq, AVG(l_discount) AS md FROM train),
          |ev AS (SELECT *,
          |  (a+b)/2 + SQRT((a-b)*(a-b)/4 + c*c) AS l1,
          |  (a+b)/2 - SQRT((a-b)*(a-b)/4 + c*c) AS l2 FROM mo),
          |w AS (SELECT mq, md,
          |  (l1-b)/SQRT((l1-b)*(l1-b)+c*c) AS w11, c/SQRT((l1-b)*(l1-b)+c*c) AS w12,
          |  c/SQRT(c*c+(l2-a)*(l2-a)) AS w21, (l2-a)/SQRT(c*c+(l2-a)*(l2-a)) AS w22
          |  FROM ev),
          |v AS (SELECT mq, md,
          |  CASE WHEN (CASE WHEN ABS(w11) >= ABS(w12) THEN w11 ELSE w12 END) < 0
          |    THEN -w11 ELSE w11 END AS v11,
          |  CASE WHEN (CASE WHEN ABS(w11) >= ABS(w12) THEN w11 ELSE w12 END) < 0
          |    THEN -w12 ELSE w12 END AS v12,
          |  CASE WHEN (CASE WHEN ABS(w21) >= ABS(w22) THEN w21 ELSE w22 END) < 0
          |    THEN -w21 ELSE w21 END AS v21,
          |  CASE WHEN (CASE WHEN ABS(w21) >= ABS(w22) THEN w21 ELSE w22 END) < 0
          |    THEN -w22 ELSE w22 END AS v22 FROM w)
          |SELECT li_id,
          |  CAST(ROUND((l_quantity-mq)*v11 + (l_discount-md)*v12,4)
          |    AS DECIMAL(18,4))::DOUBLE AS pc1,
          |  CAST(ROUND((l_quantity-mq)*v21 + (l_discount-md)*v22,4)
          |    AS DECIMAL(18,4))::DOUBLE AS pc2
          |FROM q CROSS JOIN v ORDER BY li_id""".stripMargin,
      "q_pca_fit" ->
        s"""WITH t AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
          |  CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS x2,
          |  CAST(ROUND(l_discount*100,0) AS BIGINT) AS x3
          |  FROM lineitem WHERE l_orderkey % 499 = 0 AND l_orderkey < 1000000),
          |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
          |  CAST(SUM(x3) AS BIGINT) AS s3,
          |  CAST(SUM(x1*x1) AS BIGINT) AS s11, CAST(SUM(x1*x2) AS BIGINT) AS s12,
          |  CAST(SUM(x1*x3) AS BIGINT) AS s13, CAST(SUM(x2*x2) AS BIGINT) AS s22,
          |  CAST(SUM(x2*x3) AS BIGINT) AS s23, CAST(SUM(x3*x3) AS BIGINT) AS s33
          |  FROM t)
          |SELECT n, s1, s2, s3, s11, s12, s13, s22, s23, s33,
          |  CAST(s11 AS DOUBLE)/CAST(n AS DOUBLE)
          |    - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)) AS cov11,
          |  CAST(s12 AS DOUBLE)/CAST(n AS DOUBLE)
          |    - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE)) AS cov12,
          |  CAST(s13 AS DOUBLE)/CAST(n AS DOUBLE)
          |    - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)) AS cov13,
          |  CAST(s22 AS DOUBLE)/CAST(n AS DOUBLE)
          |    - (CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE)) AS cov22,
          |  CAST(s23 AS DOUBLE)/CAST(n AS DOUBLE)
          |    - (CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)) AS cov23,
          |  CAST(s33 AS DOUBLE)/CAST(n AS DOUBLE)
          |    - (CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)) AS cov33
          |FROM a""".stripMargin,
      "q_pipeline" ->
        s"""WITH $train, $q,
          |mo AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
          |  SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS se,
          |  SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)
          |    * CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS se2,
          |  SUM(CAST(ROUND(l_quantity,0) AS BIGINT)) AS sq,
          |  SUM(CAST(ROUND(l_quantity,0) AS BIGINT)
          |    * CAST(ROUND(l_quantity,0) AS BIGINT)) AS sq2 FROM train),
          |st AS (SELECT
          |  (CAST(se AS DOUBLE)/n)/100.0 AS m1,
          |  sqrt(CAST(se2 AS DOUBLE)/n
          |    - (CAST(se AS DOUBLE)/n)*(CAST(se AS DOUBLE)/n))/100.0 AS s1,
          |  (CAST(sq AS DOUBLE)/n)/1.0 AS m2,
          |  sqrt(CAST(sq2 AS DOUBLE)/n
          |    - (CAST(sq AS DOUBLE)/n)*(CAST(sq AS DOUBLE)/n))/1.0 AS s2 FROM mo),
          |d AS (SELECT li_id, train.l_discount AS ty,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    ((q.l_extendedprice-m1)/s1 - (train.l_extendedprice-m1)/s1)
          |      *((q.l_extendedprice-m1)/s1 - (train.l_extendedprice-m1)/s1)
          |    +((q.l_quantity-m2)/s2 - (train.l_quantity-m2)/s2)
          |      *((q.l_quantity-m2)/s2 - (train.l_quantity-m2)/s2), tid) AS rn
          |  FROM q CROSS JOIN train CROSS JOIN st)
          |SELECT li_id, CAST(ROUND(AVG(ty),4) AS DECIMAL(18,4))::DOUBLE AS prediction
          |FROM d WHERE rn <= 5 GROUP BY li_id ORDER BY li_id""".stripMargin,
      "q_knn_nodata" ->
        s"""WITH $train,
          |qq AS (SELECT $uidSql AS li_id,
          |  CASE WHEN l_partkey % 37 = 0 THEN NULL ELSE l_extendedprice END AS x1,
          |  CASE WHEN l_suppkey % 13 = 0 THEN -1.0 ELSE l_quantity END AS x2
          |  FROM lineitem),
          |valid AS (SELECT * FROM qq WHERE x1 IS NOT NULL AND x2 <> -1),
          |d AS (SELECT li_id, train.l_suppkey AS ty,
          |  ROW_NUMBER() OVER (PARTITION BY li_id ORDER BY
          |    (valid.x1-train.l_extendedprice)*(valid.x1-train.l_extendedprice)
          |    +(valid.x2-train.l_quantity)*(valid.x2-train.l_quantity), tid) AS rn
          |  FROM valid CROSS JOIN train),
          |p AS (SELECT li_id, AVG(ty) AS pred FROM d WHERE rn <= 5 GROUP BY li_id)
          |SELECT qq.li_id, CAST(ROUND(COALESCE(p.pred, -999),4) AS DECIMAL(18,4))::DOUBLE AS prediction
          |FROM qq LEFT JOIN p USING (li_id) ORDER BY li_id""".stripMargin
    )
  }
}
