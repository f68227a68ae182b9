package graft.fed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** P8/M11 — config-driven per-client channel selection. The reference
  * maps each federated client to one sensor column (`config.yaml:52-67`,
  * `src/federated_learning/training.py:27-32`); the transfer-learning
  * variant (M11) loads several columns but trains one.
  */
final case class ClientConfig(loadColumns: Map[Int, Seq[String]],
                              trainColumn: Map[Int, String]) {

  def trainChannel(clientId: Int): Column = col(trainColumn(clientId))

  def loadFor(df: DataFrame, clientId: Int, extraCols: Seq[String] = Nil): DataFrame =
    df.select((extraCols ++ loadColumns(clientId)).distinct.map(col): _*)
}

object ClientConfig {
  /** 4-client demo config over derived event channels (client 0 is the
    * transfer-learning shape: loads two, trains the second).
    */
  val demo: ClientConfig = ClientConfig(
    loadColumns = Map(
      0 -> Seq("value", "u"), 1 -> Seq("u"), 2 -> Seq("m"), 3 -> Seq("value")),
    trainColumn = Map(0 -> "u", 1 -> "u", 2 -> "m", 3 -> "value"))

  /** Build the per-client channel selection from a loaded config file:
    * each `CLIENT_<k>` section maps an experiment name to the channel
    * indexes that client loads (reference `config.yaml` CLIENT_* blocks,
    * consumed by `src/federated_learning/training.py:27-32`). The trained
    * column is the FIRST loaded channel (`train_columns=[0]`,
    * `training.py:31`) — only clients in `transferClients` (the M11
    * CLIENT_0 + TRANSFER_LEARNING branch) load several channels and train
    * the LAST.
    */
  def fromConfig(cfg: graft.core.GraftConfig, experiment: String, numClients: Int,
                 colName: Int => String,
                 transferClients: Set[Int] = Set.empty): ClientConfig = {
    val load = (0 until numClients).map { i =>
      i -> cfg.clientChannels(s"CLIENT_$i", experiment).map(colName)
    }.toMap
    ClientConfig(load,
      load.collect { case (i, cols) if cols.nonEmpty =>
        i -> (if (transferClients(i)) cols.last else cols.head)
      })
  }
}
