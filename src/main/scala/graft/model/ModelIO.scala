package graft.model

import org.apache.spark.sql.SparkSession

/** S11 — model persistence (the reference saves/loads Keras `.h5`,
  * `src/training/trainer.py:90-102`). Format: a 1-row parquet with the
  * architecture, flat weights, and loss history — readable by any engine.
  */
object ModelIO {

  def save(spark: SparkSession, t: TrainedAutoencoder, path: String): Unit = {
    import spark.implicits._
    Seq((t.model.spec, t.weights.toSeq, t.lossHistory))
      .toDF("spec", "weights", "loss_history")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String, seed: Long = 42L): TrainedAutoencoder = {
    import spark.implicits._
    val (spec, weights, losses) = spark.read.parquet(path)
      .select("spec", "weights", "loss_history")
      .as[(String, Seq[Double], Seq[Double])].head()
    TrainedAutoencoder(modelFromSpec(spec, seed), weights.toArray, losses)
  }

  private def modelFromSpec(spec: String, seed: Long): WindowModel =
    spec.split(":") match {
      case Array("dense", sizes) =>
        new DenseAutoencoder(sizes.split(",").map(_.toInt).toSeq, seed)
      case Array("lstm", p) =>
        val Array(t0, h) = p.split(",").map(_.toInt)
        new LstmAutoencoder(t0, h, seed)
      case other => throw new IllegalArgumentException(s"unknown model spec: ${other.mkString(":")}")
    }

  /** Weights-only JSON export — the migration bridge for reference
    * users: the reference persists Keras `.h5` (TF-specific binary,
    * `src/training/trainer.py:90-102`) and dumps its results as plain
    * JSON files (`src/training/trainer.py:204-211`). The `.h5` WIRE
    * format is a deliberate non-goal; this one-object JSON file
    * (`{"spec": …, "weights": […], "loss_history": […]}`) carries the
    * same information in a layout `json.load` reads directly, so a
    * reference-side script can rebuild its Keras layers from the flat
    * weight vector (the spec names the layer sizes). Doubles are
    * written with `Double.toString`, which round-trips bitwise.
    */
  def saveWeightsJson(t: TrainedAutoencoder, path: String): Unit = {
    require(t.weights.forall(java.lang.Double.isFinite) &&
        t.lossHistory.forall(java.lang.Double.isFinite),
      "JSON has no NaN/Infinity literal — refusing to write non-finite values")
    val json = s"""{"spec":"${t.model.spec}",""" +
      s""""weights":[${t.weights.mkString(",")}],""" +
      s""""loss_history":[${t.lossHistory.mkString(",")}]}"""
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load [[saveWeightsJson]]'s layout (a one-object JSON file is one
    * JSON-lines record, so the engine's own reader parses it).
    */
  def loadWeightsJson(spark: SparkSession, path: String,
                      seed: Long = 42L): TrainedAutoencoder = {
    import spark.implicits._
    val (spec, weights, losses) = spark.read.json(path)
      .select("spec", "weights", "loss_history")
      .as[(String, Seq[Double], Seq[Double])].head()
    TrainedAutoencoder(modelFromSpec(spec, seed), weights.toArray, losses)
  }

  /** The reference's `*_predictions.json` layout
    * (`{"Prediction": [[…]]}`, `src/training/trainer.py:204-211`):
    * per-window reconstructions as one 2D list, windows in id order.
    * The reference is single-node and writes its whole prediction
    * array into one file — this export keeps that contract, so it is a
    * DRIVER-side dump with a hard row cap that fails loudly before
    * collecting corpus-scale data (the streaming size-guard rule); at
    * scale, score to parquet instead.
    */
  def savePredictionsJson(t: TrainedAutoencoder, windows: org.apache.spark.sql.DataFrame,
                          path: String, valuesCol: String = "values",
                          idCol: String = "window_id", maxRows: Int = 100000): Unit = {
    val spark = windows.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bw = spark.sparkContext.broadcast(t.weights)
    val m = t.model
    val rows = windows
      .select(col(idCol).cast("long"), col(valuesCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, vs) => (id, m.reconstruct(vs.toArray, bw.value).toSeq) }
      .orderBy(col("_1")).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"predictions export is a single-file driver dump; got > $maxRows windows — " +
        "raise maxRows deliberately or score to parquet instead")
    val json = rows.iterator.map(_._2.mkString("[", ",", "]"))
      .mkString("""{"Prediction":[""", ",", "]}")
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

/** M9 — hyperparameter search (the reference uses keras-tuner
  * RandomSearch over learning rate × outer layer size × layer depth with
  * a val-loss objective, `src/training/trainer.py:104-146`,
  * `src/models/autoencoder.py:29-34,89-94`). Sequential grid/random
  * evaluation; each candidate's training is itself distributed
  * (treeAggregate), so the driver loop is just coordination.
  */
object Tuning {

  final case class Candidate(lr: Double, hidden: Seq[Int])
  final case class Scored(lr: Double, hidden: Seq[Int], valMse: Double)

  /** The reference's tuning space (`src/models/autoencoder.py:29-34`):
    * categorical choices for lr / outer layer size / depth, fixed
    * bottleneck size.
    */
  final case class SearchSpace(lrChoices: Seq[Double] = Seq(3e-2, 1e-2, 1e-3, 3e-4),
                               outerChoices: Seq[Int] = Seq(32, 64, 128, 256, 512),
                               depthChoices: Seq[Int] = Seq(1, 2, 3, 4),
                               hiddenSize: Int = 8)

  /** The reference's layer-size derivation
    * (`src/models/autoencoder.py:37-38`): geometric interpolation from the
    * bottleneck up to the outer size,
    * `int(hidden · (outer/hidden)^((i+1)/depth))` for i in 0 until depth.
    */
  def layerSizes(outer: Int, hidden: Int, depth: Int): Seq[Int] = {
    val factor = outer.toDouble / hidden
    (0 until depth).map(i => (hidden * math.pow(factor, (i + 1).toDouble / depth)).toInt)
  }

  /** Seeded random search over the space: each trial draws (lr, outer,
    * depth), builds the encoder stack outer→…→bottleneck (the reference
    * stacks its tuned layers largest-first down to the fixed hidden
    * layer), trains, and scores mean val MSE; results sorted best-first.
    * Duplicate draws collapse (keras-tuner skips repeated trials too).
    */
  def randomSearch(train: org.apache.spark.sql.DataFrame,
                   validation: org.apache.spark.sql.DataFrame,
                   valuesCol: String, inputDim: Int, trials: Int, epochs: Int,
                   space: SearchSpace = SearchSpace(),
                   seed: Long = 42L): Seq[Scored] = {
    val rnd = new scala.util.Random(seed)
    val candidates = Seq.fill(trials) {
      val lr = space.lrChoices(rnd.nextInt(space.lrChoices.size))
      val outer = space.outerChoices(rnd.nextInt(space.outerChoices.size))
      val depth = space.depthChoices(rnd.nextInt(space.depthChoices.size))
      Candidate(lr, layerSizes(outer, space.hiddenSize, depth).reverse :+ space.hiddenSize)
    }.distinct
    gridSearch(train, validation, valuesCol, inputDim, candidates, epochs, seed)
  }

  def gridSearch(train: org.apache.spark.sql.DataFrame,
                 validation: org.apache.spark.sql.DataFrame,
                 valuesCol: String, inputDim: Int,
                 candidates: Seq[Candidate], epochs: Int,
                 seed: Long = 42L): Seq[Scored] = {
    // ONE training-set conversion + persist for every candidate — the
    // per-candidate Trainer.fit rebuilt (and re-persisted) the identical
    // window RDD once per trial (r16: 4 redundant passes in the m9 row).
    // Same RDD -> same partitions -> bit-identical per-candidate floats.
    val data = Trainer.toTrainRdd(train, valuesCol)
    try {
      candidates.map { c =>
        val sizes = (inputDim +: c.hidden) ++ c.hidden.reverse.tail :+ inputDim
        val m = new DenseAutoencoder(sizes, seed)
        val t = Trainer.fitData(m, m.initWeights(), data,
          epochs = epochs, lr = c.lr, seed = seed)
        Scored(c.lr, c.hidden, valScore(t, validation, valuesCol))
      }.sortBy(_.valMse)
    } finally data.unpersist(blocking = false)
  }

  /** Mean validation MSE of one candidate — the scoring half of the
    * search loop, shared by [[gridSearch]] and [[selectBest]].
    */
  def valScore(t: TrainedAutoencoder,
               validation: org.apache.spark.sql.DataFrame,
               valuesCol: String): Double = {
    import org.apache.spark.sql.functions._
    t.score(validation.withColumn("window_id", monotonically_increasing_id()),
        valuesCol)
      .agg(avg("mse")).head().getDouble(0)
  }

  /** The SELECTION half of the search, factored out over already-fixed
    * models (pre-trained or literal weights) so the val-loss argmin
    * decision itself is oracle-pinnable (`m9b_model_selection`) without
    * nondeterministic training floats: score each tagged model on the
    * validation set, rank best-first.
    */
  def selectBest(models: Seq[(String, TrainedAutoencoder)],
                 validation: org.apache.spark.sql.DataFrame,
                 valuesCol: String): Seq[(String, Double)] =
    models.map { case (tag, t) => (tag, valScore(t, validation, valuesCol)) }
      .sortBy(_._2)
}
