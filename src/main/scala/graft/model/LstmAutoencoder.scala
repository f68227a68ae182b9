package graft.model

/** M1 — seq2seq LSTM autoencoder, the reference's primary model
  * (`src/models/autoencoder.py:12-72`): LSTM encoder → repeat-vector →
  * LSTM decoder → time-distributed dense head, MSE loss. Hand-rolled
  * forward + backprop-through-time on the JVM (no TF/Keras); gradient
  * correctness is pinned by a finite-difference check in ModelSpec.
  *
  * Single stacked layer per side (the reference's `LAYERS: 1`
  * configuration, `config.yaml:19`), input feature dim 1 (the stacked
  * channel series, reference `NUM_FEATURES=1`).
  *
  * Weight layout (flat, in order):
  *   encoder gates W_[f i o g]: 4 × H × (1 + H), then 4 × H biases
  *   decoder gates W_[f i o g]: 4 × H × (H + H), then 4 × H biases
  *   output dense: H weights + 1 bias
  * Distribution-wise this plugs into the same treeAggregate trainer and
  * FedAvg loop as the dense model ([[WindowModel]]).
  */
class LstmAutoencoder(val timesteps: Int, val hidden: Int, seed: Long = 42L)
    extends WindowModel with Serializable {

  private val H = hidden
  private val encIn = 1 + H   // [x_t ; h_{t-1}]
  private val decIn = H + H   // [z   ; h_{t-1}]
  private val encBlock = 4 * H * encIn
  private val decBlock = 4 * H * decIn
  private val encBias = 4 * H
  private val decBias = 4 * H

  val numWeights: Int = encBlock + encBias + decBlock + decBias + H + 1

  override def spec: String = s"lstm:$timesteps,$hidden"

  // offsets
  private val oEncW = 0
  private val oEncB = oEncW + encBlock
  private val oDecW = oEncB + encBias
  private val oDecB = oDecW + decBlock
  private val oOutW = oDecB + decBias
  private val oOutB = oOutW + H

  def initWeights(): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val w = new Array[Double](numWeights)
    def init(off: Int, n: Int, fanIn: Int): Unit = {
      val s = math.sqrt(1.0 / fanIn)
      var i = 0
      while (i < n) { w(off + i) = (rnd.nextDouble() * 2 - 1) * s; i += 1 }
    }
    init(oEncW, encBlock, encIn)
    init(oDecW, decBlock, decIn)
    init(oOutW, H, H)
    // forget-gate bias 1.0 (standard LSTM practice for gradient flow)
    var h = 0
    while (h < H) { w(oEncB + h) = 1.0; w(oDecB + h) = 1.0; h += 1 }
    w
  }

  @inline private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Caches from one forward pass, reused by BPTT. */
  private final class Cache(T: Int) {
    // per step: gate activations f,i,o,g; cell c; hidden h; tanh(c)
    val f = Array.ofDim[Double](T, H); val ig = Array.ofDim[Double](T, H)
    val o = Array.ofDim[Double](T, H); val g = Array.ofDim[Double](T, H)
    val c = Array.ofDim[Double](T, H); val hh = Array.ofDim[Double](T, H)
    val tc = Array.ofDim[Double](T, H)
  }

  /** One LSTM step. `xs` = input vector (len inDim), gates at `wOff` with
    * layout 4 blocks of H×inDimPlusH, biases at `bOff`.
    */
  private def step(w: Array[Double], wOff: Int, bOff: Int, inDim: Int,
                   xs: Array[Double], hPrev: Array[Double], cPrev: Array[Double],
                   cache: Cache, t: Int): Unit = {
    val full = inDim // xs already includes h_prev portion? no — xs is input only
    val width = inDim + H
    var gate = 0
    while (gate < 4) {
      val base = wOff + gate * H * width
      var r = 0
      while (r < H) {
        var s = w(bOff + gate * H + r)
        val rowBase = base + r * width
        var k = 0
        while (k < inDim) { s += w(rowBase + k) * xs(k); k += 1 }
        k = 0
        while (k < H) { s += w(rowBase + inDim + k) * hPrev(k); k += 1 }
        gate match {
          case 0 => cache.f(t)(r) = sigmoid(s)
          case 1 => cache.ig(t)(r) = sigmoid(s)
          case 2 => cache.o(t)(r) = sigmoid(s)
          case 3 => cache.g(t)(r) = math.tanh(s)
        }
        r += 1
      }
      gate += 1
    }
    var r = 0
    while (r < H) {
      cache.c(t)(r) = cache.f(t)(r) * cPrev(r) + cache.ig(t)(r) * cache.g(t)(r)
      cache.tc(t)(r) = math.tanh(cache.c(t)(r))
      cache.hh(t)(r) = cache.o(t)(r) * cache.tc(t)(r)
      r += 1
    }
  }

  /** Forward pass → (reconstruction, caches). */
  private def forwardFull(x: Array[Double], w: Array[Double]):
      (Array[Double], Cache, Cache, Array[Double]) = {
    val T = x.length
    val enc = new Cache(T); val dec = new Cache(T)
    val zero = new Array[Double](H)
    var t = 0
    while (t < T) {
      val hPrev = if (t == 0) zero else enc.hh(t - 1)
      val cPrev = if (t == 0) zero else enc.c(t - 1)
      step(w, oEncW, oEncB, 1, Array(x(t)), hPrev, cPrev, enc, t)
      t += 1
    }
    val z = enc.hh(T - 1) // the repeated vector
    t = 0
    while (t < T) {
      val hPrev = if (t == 0) zero else dec.hh(t - 1)
      val cPrev = if (t == 0) zero else dec.c(t - 1)
      step(w, oDecW, oDecB, H, z, hPrev, cPrev, dec, t)
      t += 1
    }
    val y = new Array[Double](T)
    t = 0
    while (t < T) {
      var s = w(oOutB)
      var r = 0
      while (r < H) { s += w(oOutW + r) * dec.hh(t)(r); r += 1 }
      y(t) = s
      t += 1
    }
    (y, enc, dec, z)
  }

  def reconstruct(x: Array[Double], w: Array[Double]): Array[Double] =
    forwardFull(x, w)._1

  /** BPTT: adds this example's MSE-loss gradient into `grad`, returns the
    * example loss.
    */
  def accumulateGrad(x: Array[Double], w: Array[Double], grad: Array[Double]): Double = {
    val T = x.length
    val (y, enc, dec, z) = forwardFull(x, w)
    val zero = new Array[Double](H)

    // loss + dL/dy
    var loss = 0.0
    val dy = new Array[Double](T)
    var t = 0
    while (t < T) {
      val e = y(t) - x(t)
      loss += e * e
      dy(t) = 2.0 * e / T
      t += 1
    }
    loss /= T

    // output head grads + dL/dh_dec
    val dhDec = Array.ofDim[Double](T, H)
    t = 0
    while (t < T) {
      grad(oOutB) += dy(t)
      var r = 0
      while (r < H) {
        grad(oOutW + r) += dy(t) * dec.hh(t)(r)
        dhDec(t)(r) += dy(t) * w(oOutW + r)
        r += 1
      }
      t += 1
    }

    // decoder BPTT; collect dL/dz (the repeated input at every step)
    val dz = new Array[Double](H)
    val dcNext = new Array[Double](H)
    val dhNext = new Array[Double](H)
    t = T - 1
    while (t >= 0) {
      val hPrev = if (t == 0) zero else dec.hh(t - 1)
      val cPrev = if (t == 0) zero else dec.c(t - 1)
      bpttStep(w, grad, oDecW, oDecB, H, z, hPrev, cPrev, dec, t,
        dhDec(t), dhNext, dcNext, dz)
      t -= 1
    }

    // encoder BPTT seeded by dz at the last step
    java.util.Arrays.fill(dcNext, 0.0)
    java.util.Arrays.fill(dhNext, 0.0)
    val dxIgnored = new Array[Double](1)
    t = T - 1
    while (t >= 0) {
      val hPrev = if (t == 0) zero else enc.hh(t - 1)
      val cPrev = if (t == 0) zero else enc.c(t - 1)
      val dhHere = if (t == T - 1) dz else new Array[Double](H)
      java.util.Arrays.fill(dxIgnored, 0.0)
      bpttStep(w, grad, oEncW, oEncB, 1, Array(x(t)), hPrev, cPrev, enc, t,
        dhHere, dhNext, dcNext, dxIgnored)
      t -= 1
    }
    loss
  }

  /** One BPTT step. `dhHere` = external gradient into h_t (head or z);
    * `dhNext`/`dcNext` = recurrent gradients flowing from step t+1
    * (mutated in place to become this step's outgoing d h_{t-1}, d c_{t-1});
    * `dxAcc` accumulates gradient w.r.t. the (non-recurrent) input vector.
    */
  private def bpttStep(w: Array[Double], grad: Array[Double], wOff: Int, bOff: Int,
                       inDim: Int, xs: Array[Double],
                       hPrev: Array[Double], cPrev: Array[Double],
                       cache: Cache, t: Int,
                       dhHere: Array[Double], dhNext: Array[Double],
                       dcNext: Array[Double], dxAcc: Array[Double]): Unit = {
    val width = inDim + H
    val dh = new Array[Double](H)
    val dc = new Array[Double](H)
    var r = 0
    while (r < H) {
      dh(r) = dhHere(r) + dhNext(r)
      dc(r) = dcNext(r) + dh(r) * cache.o(t)(r) * (1 - cache.tc(t)(r) * cache.tc(t)(r))
      r += 1
    }
    // gate pre-activation grads
    val dgates = Array.ofDim[Double](4, H)
    r = 0
    while (r < H) {
      val f = cache.f(t)(r); val i = cache.ig(t)(r)
      val o = cache.o(t)(r); val g = cache.g(t)(r)
      dgates(0)(r) = dc(r) * cPrev(r) * f * (1 - f)
      dgates(1)(r) = dc(r) * g * i * (1 - i)
      dgates(2)(r) = dh(r) * cache.tc(t)(r) * o * (1 - o)
      dgates(3)(r) = dc(r) * i * (1 - g * g)
      r += 1
    }
    // weight grads + input/recurrent grads
    java.util.Arrays.fill(dhNext, 0.0)
    var gate = 0
    while (gate < 4) {
      val base = wOff + gate * H * width
      r = 0
      while (r < H) {
        val d = dgates(gate)(r)
        grad(bOff + gate * H + r) += d
        val rowBase = base + r * width
        var k = 0
        while (k < inDim) {
          grad(rowBase + k) += d * xs(k)
          dxAcc(k) += d * w(rowBase + k)
          k += 1
        }
        k = 0
        while (k < H) {
          grad(rowBase + inDim + k) += d * hPrev(k)
          dhNext(k) += d * w(rowBase + inDim + k)
          k += 1
        }
        r += 1
      }
      gate += 1
    }
    // d c_{t-1}
    r = 0
    while (r < H) { dcNext(r) = dc(r) * cache.f(t)(r); r += 1 }
  }
}
