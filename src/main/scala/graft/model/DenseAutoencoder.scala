package graft.model

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** M2/M4–M8 — dense autoencoder on window arrays, Spark-native training.
  *
  * The reference trains Keras autoencoders (dense "FFT" AE:
  * `src/models/autoencoder.py:75-126`; LSTM AE: `:12-72`) with Adam
  * (clipnorm 1.0, clipvalue 0.5, `:40-41,100-101`), MSE loss + L2 1e-7
  * (`:49-51,110-124`) and per-epoch exponential LR decay `lr·(1-0.01)`
  * (`src/training/lr_scheduler.py:5-6`). MLlib has no autoencoder, so this
  * is a from-scratch MLP autoencoder where the *data-parallel* part — the
  * gradient over the dataset — is a `treeAggregate` over executors
  * (synchronous data-parallel SGD: the same shape Spark MLlib itself uses
  * for LogisticRegression/GBT). The LSTM variant is intentionally
  * substituted by this dense AE with an identical scoring interface (see
  * SURVEY.md §7.4.2); the downstream anomaly pipeline consumes only
  * per-window reconstruction error.
  *
  * Weights are one flat Array[Double] (layout: per layer, W row-major then
  * b) — which makes FedAvg averaging and Adam state trivially elementwise.
  *
  * Scale: each `fit` epoch is one `treeAggregate` pass (gradient + loss),
  * weights broadcast per epoch (~KBs for window-100 models); executor-side
  * work is embarrassingly parallel over windows. Mini-batching at 100 TB =
  * `sample(fraction)` per epoch — wired through `batchFraction`.
  */
class DenseAutoencoder(val layerSizes: Seq[Int], seed: Long = 42L)
    extends WindowModel with Serializable {
  require(layerSizes.length >= 3 && layerSizes.head == layerSizes.last,
    "autoencoder: first and last layer sizes must match (reconstruction)")

  /** (rows, cols) per weight matrix: layer l maps sizes(l) → sizes(l+1). */
  private[model] val shapes: Seq[(Int, Int)] =
    layerSizes.sliding(2).map { case Seq(in, out) => (out, in) }.toSeq

  val numWeights: Int = shapes.map { case (r, c) => r * c + r }.sum

  def initWeights(): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val w = new Array[Double](numWeights)
    var off = 0
    shapes.foreach { case (rows, cols) =>
      val scale = math.sqrt(2.0 / (rows + cols)) // Xavier/Glorot
      var i = 0
      while (i < rows * cols) { w(off + i) = (rnd.nextDouble() * 2 - 1) * scale; i += 1 }
      off += rows * cols + rows // biases stay 0
    }
    w
  }

  override def spec: String = "dense:" + layerSizes.mkString(",")

  override def reconstruct(x: Array[Double], w: Array[Double]): Array[Double] =
    forward(x, w).last

  override def accumulateGrad(x: Array[Double], w: Array[Double],
                              grad: Array[Double]): Double =
    backward(forward(x, w), w, grad)

  /** Forward pass returning all layer activations (tanh hidden, linear
    * output). `acts(0)` = input, `acts.last` = reconstruction.
    */
  private[model] def forward(x: Array[Double], w: Array[Double]): Array[Array[Double]] = {
    val acts = new Array[Array[Double]](layerSizes.length)
    acts(0) = x
    var off = 0
    var l = 0
    while (l < shapes.length) {
      val (rows, cols) = shapes(l)
      val in = acts(l)
      val out = new Array[Double](rows)
      var r = 0
      while (r < rows) {
        var s = w(off + rows * cols + r) // bias
        val base = off + r * cols
        var c = 0
        while (c < cols) { s += w(base + c) * in(c); c += 1 }
        out(r) = if (l == shapes.length - 1) s else math.tanh(s)
        r += 1
      }
      acts(l + 1) = out
      off += rows * cols + rows
      l += 1
    }
    acts
  }

  /** Per-example backprop: adds this example's MSE-loss gradient into
    * `gradAcc`, returns the example's squared-error sum.
    */
  private[model] def backward(acts: Array[Array[Double]], w: Array[Double],
                              gradAcc: Array[Double]): Double = {
    val d = layerSizes.head
    val recon = acts.last
    val x = acts(0)
    var delta = new Array[Double](d)
    var sse = 0.0
    var i = 0
    while (i < d) {
      val e = recon(i) - x(i)
      sse += e * e
      delta(i) = 2.0 * e / d // d(mean sq err)/d(recon)
      i += 1
    }
    // offsets of each layer's block
    val offs = shapes.scanLeft(0) { case (o, (r, c)) => o + r * c + r }
    var l = shapes.length - 1
    while (l >= 0) {
      val (rows, cols) = shapes(l)
      val off = offs(l)
      val in = acts(l)
      val nextDelta = new Array[Double](cols)
      var r = 0
      while (r < rows) {
        val dr = delta(r)
        val base = off + r * cols
        var c = 0
        while (c < cols) {
          gradAcc(base + c) += dr * in(c)
          nextDelta(c) += dr * w(base + c)
          c += 1
        }
        gradAcc(off + rows * cols + r) += dr
        r += 1
      }
      if (l > 0) {
        // through tanh: dz = da * (1 - a²)
        var c = 0
        while (c < cols) { nextDelta(c) *= 1.0 - in(c) * in(c); c += 1 }
      }
      delta = nextDelta
      l -= 1
    }
    sse / d
  }
}

/** Training result: final weights + per-epoch loss history (the
  * reference's `results.{loss}` series).
  */
final case class TrainedAutoencoder(model: WindowModel,
                                    weights: Array[Double],
                                    lossHistory: Seq[Double]) {

  /** M7 — reconstruction scoring: per-window MSE, embarrassingly
    * parallel map with broadcast weights.
    */
  def score(windows: DataFrame, valuesCol: String = "values",
            idCol: String = "window_id"): DataFrame = {
    val spark = windows.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast(weights)
    val m = model
    windows.select(col(idCol).cast("long"), col(valuesCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, vs) =>
        val x = vs.toArray
        val recon = m.reconstruct(x, bw.value)
        var sse = 0.0
        var i = 0
        while (i < x.length) { val e = recon(i) - x(i); sse += e * e; i += 1 }
        (id, sse / x.length)
      }
      .toDF(idCol, "mse")
  }
}

object Trainer {

  /** M4/M5/M6 — Adam with the reference's clipping + per-epoch decay,
    * full- or fractional-batch distributed gradients via treeAggregate.
    */
  def fit(model: WindowModel, windows: DataFrame, valuesCol: String,
          epochs: Int, lr: Double = 1e-3, lrDecay: Double = 0.99,
          l2: Double = 1e-7, clipNorm: Double = 1.0, clipValue: Double = 0.5,
          batchFraction: Double = 1.0, seed: Long = 42L): TrainedAutoencoder =
    fitFrom(model, model.initWeights(), windows, valuesCol, epochs, lr, lrDecay,
      l2, clipNorm, clipValue, batchFraction, seed)

  /** Continue training from given weights (the FedAvg per-round entry). */
  def fitFrom(model: WindowModel, init: Array[Double], windows: DataFrame,
              valuesCol: String, epochs: Int, lr: Double = 1e-3,
              lrDecay: Double = 0.99, l2: Double = 1e-7, clipNorm: Double = 1.0,
              clipValue: Double = 0.5, batchFraction: Double = 1.0,
              seed: Long = 42L): TrainedAutoencoder = {
    val data = toTrainRdd(windows, valuesCol)
    try fitCached(model, init, data, epochs, lr, lrDecay, l2, clipNorm, clipValue,
      batchFraction, seed)
    finally data.unpersist(blocking = false) // also on a failed epoch
  }

  /** The training-set RDD an epoch loop iterates: window arrays,
    * persisted with TRUNCATED lineage. A plain `.cache()` here keeps the
    * full SQL plan (scan + standardize + window assembly) inside every
    * task binary, and the epoch jobs' tasks paid ~80 ms EACH just
    * deserializing it — measured r16, task deser was ~90% of every
    * treeAggregate epoch's task time at sf0.1 (the data itself is a few
    * hundred KB). `localCheckpoint` stores the computed partitions and
    * drops the lineage after the first epoch materializes them, so every
    * later epoch ships a closure of just (model, weights broadcast
    * handle). Partition count and intra-partition order are exactly the
    * cached frame's, so gradients are bit-identical (m2b's REAL-epoch
    * oracle row pins this). Caller unpersists when training ends.
    * Availability trade-off and cluster-mode mitigations: DESIGN.md
    * "localCheckpoint availability trade-off".
    */
  private[graft] def toTrainRdd(windows: DataFrame, valuesCol: String)
      : org.apache.spark.rdd.RDD[Array[Double]] = {
    val spark = windows.sparkSession
    import spark.implicits._
    windows.select(col(valuesCol).cast("array<double>")).as[Seq[Double]]
      .rdd.map(_.toArray).localCheckpoint()
  }

  /** [[fitFrom]] over an already-converted training RDD — the search
    * loop's entry ([[Tuning.gridSearch]] converts ONCE and fits many
    * candidates; the per-candidate conversion was 4 redundant
    * build-and-persist passes in the m9 row).
    */
  private[graft] def fitData(model: WindowModel, init: Array[Double],
                             data: org.apache.spark.rdd.RDD[Array[Double]],
                             epochs: Int, lr: Double, seed: Long = 42L): TrainedAutoencoder =
    fitCached(model, init, data, epochs, lr, lrDecay = 0.99, l2 = 1e-7,
      clipNorm = 1.0, clipValue = 0.5, batchFraction = 1.0, seed = seed)

  private def fitCached(model: WindowModel, init: Array[Double],
                        data: org.apache.spark.rdd.RDD[Array[Double]],
                        epochs: Int, lr: Double, lrDecay: Double, l2: Double,
                        clipNorm: Double, clipValue: Double,
                        batchFraction: Double, seed: Long): TrainedAutoencoder = {
    val w = init.clone()
    val mAdam = new Array[Double](w.length)
    val vAdam = new Array[Double](w.length)
    var t = 0
    var lrT = lr
    val losses = Seq.newBuilder[Double]

    (1 to epochs).foreach { epoch =>
      val sampled = if (batchFraction >= 1.0) data
                    else data.sample(withReplacement = false, batchFraction, seed + epoch)
      val (gradMean, meanLoss, _) = gradPass(model, w, sampled)
      t += 1
      applyUpdate(w, mAdam, vAdam, gradMean, t, lrT, l2, clipNorm, clipValue)
      lrT *= lrDecay // reference: lr · (1 − 0.01) per epoch
      losses += meanLoss
    }
    TrainedAutoencoder(model, w, losses.result())
  }

  /** One full-batch gradient pass over `data` at weights `w`: the exact
    * treeAggregate epoch kernel `fit` runs, returning (meanGrad, meanLoss,
    * count) WITHOUT applying the optimizer.
    */
  private def gradPass(model: WindowModel, w: Array[Double],
                       data: org.apache.spark.rdd.RDD[Array[Double]])
      : (Array[Double], Double, Long) = {
    val bw = data.sparkContext.broadcast(w)
    val (gradSum, lossSum, cnt) = data.treeAggregate(
      (new Array[Double](w.length), 0.0, 0L))(
      seqOp = { case ((g, ls, c), x) =>
        val loss = model.accumulateGrad(x, bw.value, g)
        (g, ls + loss, c + 1)
      },
      combOp = { case ((g1, l1, c1), (g2, l2, c2)) =>
        var i = 0
        while (i < g1.length) { g1(i) += g2(i); i += 1 }
        (g1, l1 + l2, c1 + c2)
      })
    bw.destroy()
    val m0 = math.max(cnt, 1L).toDouble
    var i = 0
    while (i < gradSum.length) { gradSum(i) /= m0; i += 1 }
    (gradSum, lossSum / m0, cnt)
  }

  /** The raw mean epoch gradient (pre-L2/clip/Adam) at `weights` — the same
    * distributed pass `fit` runs each epoch, exposed so `m2b_train_epoch`
    * can pin the well-conditioned gradient itself under the DuckDB oracle
    * separately from the (ill-conditioned near g≈0) t=1 Adam ratio.
    */
  def epochGradient(model: WindowModel, weights: Array[Double],
                    windows: DataFrame, valuesCol: String)
      : (Array[Double], Double, Long) = {
    val spark = windows.sparkSession
    import spark.implicits._
    val data = windows.select(col(valuesCol).cast("array<double>")).as[Seq[Double]]
      .rdd.map(_.toArray)
    gradPass(model, weights, data)
  }

  /** M4 — one Adam update, in place, on already-averaged gradients: the
    * reference's optimizer config exactly (clipvalue first, then clipnorm
    * over the clipped vector — `src/models/autoencoder.py:40-41,100-101`),
    * L2 from the CURRENT weights folded into the gradient, then the
    * bias-corrected Adam step at time `t`. Public so the optimizer kernel
    * itself is drivable as a registry row (`m4b_adam_step`) against a
    * closed-form DuckDB oracle — the same code path `fit` runs every epoch.
    */
  def applyUpdate(w: Array[Double], mAdam: Array[Double], vAdam: Array[Double],
                  gradMean: Array[Double], t: Int, lrT: Double, l2: Double,
                  clipNorm: Double, clipValue: Double): Unit = {
    val beta1 = 0.9; val beta2 = 0.999; val eps = 1e-8
    var i = 0
    var sq = 0.0
    while (i < gradMean.length) {
      var g = gradMean(i) + 2 * l2 * w(i)
      if (g > clipValue) g = clipValue else if (g < -clipValue) g = -clipValue
      gradMean(i) = g
      sq += g * g
      i += 1
    }
    val norm = math.sqrt(sq)
    val scale = if (norm > clipNorm) clipNorm / norm else 1.0
    i = 0
    while (i < w.length) {
      val g = gradMean(i) * scale
      mAdam(i) = beta1 * mAdam(i) + (1 - beta1) * g
      vAdam(i) = beta2 * vAdam(i) + (1 - beta2) * g * g
      val mh = mAdam(i) / (1 - math.pow(beta1, t))
      val vh = vAdam(i) / (1 - math.pow(beta2, t))
      w(i) -= lrT * mh / (math.sqrt(vh) + eps)
      i += 1
    }
  }
}
