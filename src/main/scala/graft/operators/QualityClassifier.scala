package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality-classifier filtering — the DCLM/FineWeb-edu approach:
  * instead of hand-tuned rules (q_text_gopher) or an n-gram LM
  * (q_text_perplexity), fit a logistic-regression classifier that
  * separates a reference "high quality" slice from the raw crawl, then
  * keep documents the classifier scores highly.
  *
  * Features are hashed unigram+bigram buckets (the DSIR featurization —
  * sha256-prefix buckets so any engine reproduces them), normalized to
  * per-document frequencies, with the intercept carried as a constant
  * trailing feature. Training is deterministic full-batch gradient
  * descent — no row sampling, no RNG — so the fit depends only on the
  * corpus (the one caveat is double summation order across partitions,
  * which perturbs the final ulps; consumers compare at round-6, and the
  * correctness oracle embeds the exact fitted weights post-run).
  *
  * 100 TB shape: featurization is ONE gram shuffle producing a slim
  * (doc_id, label, dense-64-vector) frame that is cached and re-read by
  * every GD iteration; each iteration is two scans of that cached frame
  * (gradient via posexplode + B-bucket partial agg; loss/bias via a
  * global agg) and a driver sync of B+2 doubles — the treeAggregate
  * pattern. At real scale you fit on a deterministic hash-sample
  * (trainFraction) and score the full corpus with the broadcast weights;
  * scoring is a single per-row fold, no shuffle at all.
  *
  * The reference has no ML surface (SURVEY.md §0); this is a §2.C
  * extension in the spirit of BASELINE.json's north star.
  */
object QualityClassifier {

  /** Fitted model: `weights(b)` for bucket b, the intercept carried as
    * the trailing weights entry; `lossHistory(i)` = mean log-loss
    * BEFORE iteration i's update (so a decreasing sequence is the
    * convergence evidence).
    */
  final case class Model(weights: Array[Double], lossHistory: Array[Double]) {
    def bias: Double = weights.last
  }

  /** House cross-engine bucket hash: sha256-prefix of the gram mod B. */
  def bucketOf(g: Column, nBuckets: Int): Column =
    conv(substring(sha2(g, 256), 1, 4), 16, 10).cast("bigint") % nBuckets

  /** Unigrams + bigrams of the whitespace-lowercased token array. */
  def gramsOf(ws: Column): Column =
    concat(
      ws,
      when(
        size(ws) >= 2,
        transform(
          sequence(lit(1), size(ws) - 1),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))
        )
      ).otherwise(array().cast("array<string>"))
    )

  /** (doc_id, label, x) with x a dense length-(B+1) double array of
    * bucket frequencies SCALED BY B — mean feature magnitude ~1, so GD
    * steps move every weight at the same rate as the intercept (raw
    * 1/B-scale frequencies make the weight gradients B times smaller
    * than the bias gradient and the fit crawls) — plus the constant 1.0
    * intercept slot. One gram shuffle; the output frame is slim enough
    * to cache for the GD loop (B+1 doubles + key per doc).
    */
  def featurize(
      docs: DataFrame,
      labelCol: Column,
      nBuckets: Int
  ): DataFrame = {
    val tf = docs
      .select(
        col("doc_id"),
        labelCol.cast("double").as("y"),
        explode(gramsOf(TextOps.tokens(col("text")))).as("g")
      )
      .filter(col("g") =!= "")
      .groupBy(col("doc_id"), col("y"), bucketOf(col("g"), nBuckets).as("b"))
      .agg(count(lit(1)).as("n"))
    tf.groupBy(col("doc_id"), col("y"))
      .agg(
        map_from_arrays(collect_list(col("b")), collect_list(col("n")))
          .as("m"),
        sum(col("n")).as("ntot")
      )
      .select(
        col("doc_id"),
        col("y"),
        concat(
          transform(
            sequence(lit(0), lit(nBuckets - 1)),
            i => coalesce(element_at(col("m"), i.cast("bigint")), lit(0L))
              .cast("double") * nBuckets / col("ntot")
          ),
          array(lit(1.0))
        ).as("x")
      )
  }

  /** z = w·x as a sequential left-to-right fold (deterministic per row). */
  def dotW(x: Column, w: Array[Double]): Column =
    aggregate(
      zip_with(x, lit(w), (a, b) => a * b),
      lit(0.0),
      (acc, v) => acc + v
    )

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Full-batch GD fit of P(label=1 | x) on STANDARDIZED features —
    * the bucket frequencies are heavily correlated (they sum to B per
    * doc, exactly collinear with the intercept), so raw-space GD either
    * crawls or diverges; per-coordinate standardization drops the
    * condition number enough that ~20 steps reach the optimum (the same
    * reason MLlib standardizes internally). The returned Model carries
    * the weights FOLDED BACK to raw-feature space
    * (w'_b = w_b/sd_b, bias' = bias - sum w_b*mu_b/sd_b), so scoring —
    * and the correctness oracle — see plain sigma(w'·x_raw).
    *
    * `feat` must be the featurize output and SHOULD be cached by the
    * caller (one stats pass + two scans per iteration). Driver state:
    * B+2 doubles per iteration — model-sized, the same class of sync as
    * IvfIndex's centroid collect.
    */
  def fit(feat: DataFrame, nBuckets: Int, iters: Int, step: Double): Model = {
    val dim = nBuckets + 1
    // per-coordinate corpus mean/std (one pass over the cached frame)
    val mu = new Array[Double](dim)
    val sd = Array.fill(dim)(1.0)
    val statRows = feat.select(posexplode(col("x")).as(Seq("pos", "xv")))
      .groupBy(col("pos"))
      .agg(avg(col("xv")).as("mu"), stddev_pop(col("xv")).as("sd"))
      .collect()
    // an empty training set must fail loudly here, not as an opaque
    // null-aggregate NPE in the first GD iteration
    require(statRows.nonEmpty,
      "QualityClassifier.fit: the featurized frame is empty — every " +
        "input doc had no non-empty grams, or the input itself was empty")
    statRows
      .foreach { r =>
        mu(r.getInt(0)) = r.getDouble(1)
        val s = r.getDouble(2)
        if (s > 0) sd(r.getInt(0)) = s
      }
    // the constant intercept slot must stay 1.0 (its sd is 0 -> guarded)
    mu(dim - 1) = 0.0
    sd(dim - 1) = 1.0
    val featS = feat.select(
      col("doc_id"),
      col("y"),
      transform(
        sequence(lit(0), lit(dim - 1)),
        i => (element_at(col("x"), i + 1) - element_at(lit(mu), i + 1)) /
          element_at(lit(sd), i + 1)
      ).as("x")
    )
    var w = Array.fill(dim)(0.0)
    val losses = Array.newBuilder[Double]
    for (_ <- 0 until iters) {
      val scored = featS.select(
        col("y"),
        col("x"),
        sigmoid(dotW(col("x"), w)).as("p")
      )
      val gRows = scored
        .select(col("y"), posexplode(col("x")).as(Seq("pos", "xv")), col("p"))
        .groupBy(col("pos"))
        .agg(avg((col("p") - col("y")) * col("xv")).as("g"))
        .collect()
      // clamped log-loss: p is strictly inside (0,1) for finite z, but
      // guard the log anyway — a diverged step must surface as a big
      // loss, not NaN
      val loss = scored
        .agg(avg(
          -col("y") * log(greatest(col("p"), lit(1e-12))) -
            (lit(1.0) - col("y")) *
              log(greatest(lit(1.0) - col("p"), lit(1e-12))))
          .as("l"))
        .head().getDouble(0)
      losses += loss
      val g = Array.fill(dim)(0.0)
      gRows.foreach(r => g(r.getInt(0)) = r.getDouble(1))
      w = w.zip(g).map { case (wi, gi) => wi - step * gi }
    }
    // a diverged fit must fail HERE, not as an opaque NaN literal in
    // the dynamic oracle's VALUES list or silent all-0.5 scores
    require(w.forall(java.lang.Double.isFinite),
      s"QualityClassifier.fit diverged: non-finite weight after $iters " +
        s"iterations at step $step — lower the step")
    // fold the standardization into the weights: raw-space scoring
    val raw = Array.tabulate(dim)(i => w(i) / sd(i))
    raw(dim - 1) = w(dim - 1) - (0 until dim - 1)
      .map(i => w(i) * mu(i) / sd(i)).sum
    Model(raw, losses.result())
  }

  /** Score an already-featurized frame under a fitted model:
    * quality = sigma(w·x) as a per-row fold over the LITERAL weights —
    * the model never joins, so scoring adds zero shuffles beyond the
    * featurize pass the caller already paid (and typically cached for
    * the fit).
    */
  def scoreFeaturized(feat: DataFrame, model: Model): DataFrame =
    feat.select(
      col("doc_id"),
      col("y").as("is_target"),
      round(sigmoid(dotW(col("x"), model.weights)), 6).as("quality")
    )
}
