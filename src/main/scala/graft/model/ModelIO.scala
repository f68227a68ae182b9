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
    val model: WindowModel = spec.split(":") match {
      case Array("dense", sizes) =>
        new DenseAutoencoder(sizes.split(",").map(_.toInt).toSeq, seed)
      case Array("lstm", p) =>
        val Array(t0, h) = p.split(",").map(_.toInt)
        new LstmAutoencoder(t0, h, seed)
      case other => throw new IllegalArgumentException(s"unknown model spec: ${other.mkString(":")}")
    }
    TrainedAutoencoder(model, weights.toArray, losses)
  }
}

/** M9 — hyperparameter search (the reference uses keras-tuner
  * RandomSearch over lr/size/depth with val-loss objective,
  * `src/training/trainer.py:104-146`). Sequential grid/random evaluation;
  * each candidate's training is itself distributed (treeAggregate), so
  * the driver loop is just coordination.
  */
object Tuning {

  final case class Candidate(lr: Double, hidden: Seq[Int])
  final case class Scored(lr: Double, hidden: Seq[Int], valMse: Double)

  def gridSearch(train: org.apache.spark.sql.DataFrame,
                 validation: org.apache.spark.sql.DataFrame,
                 valuesCol: String, inputDim: Int,
                 candidates: Seq[Candidate], epochs: Int,
                 seed: Long = 42L): Seq[Scored] = {
    import org.apache.spark.sql.functions._
    candidates.map { c =>
      val sizes = (inputDim +: c.hidden) ++ c.hidden.reverse.tail :+ inputDim
      val t = Trainer.fit(new DenseAutoencoder(sizes, seed), train, valuesCol,
        epochs = epochs, lr = c.lr)
      val valMse = t.score(validation.withColumn("window_id", monotonically_increasing_id()),
          valuesCol)
        .agg(avg("mse")).head().getDouble(0)
      Scored(c.lr, c.hidden, valMse)
    }.sortBy(_.valMse)
  }
}
