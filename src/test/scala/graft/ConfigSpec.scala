package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Config
import graft.fed.ClientConfig

/** Config loader parity (reference `src/config/config.py:8-19`):
  * yaml-subset parse, CONFIG_FILE redirect, env-var override of top-level
  * keys, CLIENT_NAME selection, per-client channel maps.
  */
class ConfigSpec extends AnyFunSuite {

  private val yaml =
    """# training
      |EPOCHS: 150
      |BATCH_SIZE: 64
      |LR_DECAY: 0.01
      |
      |LSTM:
      |    LEARNING_RATE: 0.0005
      |    OUTER_LAYER_SIZE: 128
      |    HIDDEN_LAYER_SIZE: 16
      |    LAYER_AMOUNT: 1
      |
      |# data
      |WINDOW_SIZE: 100
      |WINDOW_STEP: 50
      |TRAIN_SPLIT: 0.7
      |EXPERIMENT_NAME: 'bearing_experiment-1'
      |LOAD_COLUMNS: [0, 1, 2, 3] # trailing comment
      |
      |CLIENT_0:
      |    bearing_experiment-1: [ 0 ]
      |    bearing_experiment-2: [ 0, 1 ]
      |CLIENT_1:
      |    bearing_experiment-1: [ 2 ]
      |    bearing_experiment-2: [ 1 ]
      |""".stripMargin

  private def tmpFile(content: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".yaml")
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("parse: scalars, quoted strings, inline lists, sections, comments") {
    val cfg = Config.parse(yaml)
    assert(cfg.int("EPOCHS", -1) == 150)
    assert(cfg.double("TRAIN_SPLIT", -1) == 0.7)
    assert(cfg.string("EXPERIMENT_NAME", "") == "bearing_experiment-1")
    assert(cfg.intList("LOAD_COLUMNS") == Seq(0, 1, 2, 3))
    assert(cfg.sectionDouble("LSTM", "LEARNING_RATE", -1) == 0.0005)
    assert(cfg.sectionInt("LSTM", "OUTER_LAYER_SIZE", -1) == 128)
    assert(cfg.clientChannels("CLIENT_0", "bearing_experiment-2") == Seq(0, 1))
    assert(cfg.clientChannels("CLIENT_1", "bearing_experiment-1") == Seq(2))
    assert(cfg.clientChannels("CLIENT_9", "bearing_experiment-1") == Nil)
  }

  test("load: file + env override of top-level keys (reference os.getenv loop)") {
    val path = tmpFile(yaml)
    val plain = Config.load(path, env = Map.empty)
    assert(plain.int("WINDOW_SIZE", -1) == 100)
    val overridden = Config.load(path,
      env = Map("GRAFT_WINDOW_SIZE" -> "256", "GRAFT_EPOCHS" -> "3"))
    assert(overridden.int("WINDOW_SIZE", -1) == 256)
    assert(overridden.int("EPOCHS", -1) == 3)
    // untouched keys keep file values; env keys not in the file don't appear
    assert(overridden.int("BATCH_SIZE", -1) == 64)
    // bare same-named vars are ignored (ambient USER/HOSTNAME/LANG would
    // otherwise silently override config keys in every environment)
    val bare = Config.load(path,
      env = Map("WINDOW_SIZE" -> "256", "GRAFT_WINDOW_SIZE" -> "512"))
    assert(bare.int("WINDOW_SIZE", -1) == 512)
    assert(Config.load(path, env = Map("WINDOW_SIZE" -> "256"))
      .int("WINDOW_SIZE", -1) == 100)
  }

  test("load: CONFIG_FILE env redirects to another file") {
    val a = tmpFile(yaml)
    val b = tmpFile("EPOCHS: 7\n")
    val cfg = Config.load(a, env = Map("CONFIG_FILE" -> b))
    assert(cfg.int("EPOCHS", -1) == 7)
  }

  test("CLIENT_NAME selection defaults to CLIENT_0") {
    assert(Config.clientName(Map.empty) == "CLIENT_0")
    assert(Config.clientName(Map("CLIENT_NAME" -> "CLIENT_3")) == "CLIENT_3")
  }

  test("ClientConfig.fromConfig: first channel trains; transfer clients train last") {
    val cfg = Config.parse(yaml)
    val cc = ClientConfig.fromConfig(cfg, "bearing_experiment-2", 2, i => s"Vibration-$i",
      transferClients = Set(0))
    assert(cc.loadColumns(0) == Seq("Vibration-0", "Vibration-1"))
    assert(cc.trainColumn(0) == "Vibration-1") // transfer shape: trains the last
    assert(cc.loadColumns(1) == Seq("Vibration-1"))
    assert(cc.trainColumn(1) == "Vibration-1")
    // non-transfer multi-channel client trains the FIRST loaded channel
    // (reference training.py:31 train_columns=[0])
    val plain = ClientConfig.fromConfig(cfg, "bearing_experiment-2", 2, i => s"Vibration-$i")
    assert(plain.trainColumn(0) == "Vibration-0")
  }
}
