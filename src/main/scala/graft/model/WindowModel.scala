package graft.model

/** Common contract for window-reconstruction models (dense M2, LSTM M1):
  * flat weight vector + per-example loss/gradient — which is exactly what
  * the distributed trainer (treeAggregate) and FedAvg (elementwise mean)
  * need, independent of architecture.
  */
trait WindowModel extends Serializable {
  def numWeights: Int
  def initWeights(): Array[Double]
  def reconstruct(x: Array[Double], w: Array[Double]): Array[Double]

  /** Adds this example's loss gradient into `grad`; returns the loss. */
  def accumulateGrad(x: Array[Double], w: Array[Double], grad: Array[Double]): Double

  /** Persistence tag, parsed by ModelIO. */
  def spec: String
}
