package graft.core

/** Experiment configuration: the reference drives every entry point from
  * `configs/config.yaml` + environment overrides
  * (`/root/reference/src/config/config.py:8-19`): `CONFIG_FILE` picks the
  * file, `CLIENT_NAME` picks the per-client section, and any top-level
  * key can be overridden by an environment variable of the same name
  * (the reference's `os.getenv(key, value)` loop).
  *
  * The parser covers the YAML subset the reference's config actually
  * uses — `key: scalar`, inline `[a, b]` lists, one level of nesting via
  * indented blocks (model sections, per-client channel maps), `#`
  * comments, quoted strings — with zero dependencies (no YAML lib on the
  * classpath, and a full YAML engine buys nothing here).
  */
final case class GraftConfig(top: Map[String, String],
                             sections: Map[String, Map[String, String]]) {

  def string(key: String, default: String): String = top.getOrElse(key, default)
  def int(key: String, default: Int): Int = top.get(key).map(_.trim.toInt).getOrElse(default)
  def double(key: String, default: Double): Double =
    top.get(key).map(_.trim.toDouble).getOrElse(default)

  def intList(key: String): Seq[Int] =
    top.get(key).map(GraftConfig.parseList(_).map(_.toInt)).getOrElse(Nil)

  def section(name: String): Map[String, String] = sections.getOrElse(name, Map.empty)

  def sectionInt(sec: String, key: String, default: Int): Int =
    section(sec).get(key).map(_.trim.toInt).getOrElse(default)
  def sectionDouble(sec: String, key: String, default: Double): Double =
    section(sec).get(key).map(_.trim.toDouble).getOrElse(default)

  /** The reference's per-client channel map: section `CLIENT_<k>` maps an
    * experiment name to the list of channel indexes that client loads
    * (`config.yaml` CLIENT_0..CLIENT_3 blocks).
    */
  def clientChannels(clientName: String, experiment: String): Seq[Int] =
    section(clientName).get(experiment)
      .map(GraftConfig.parseList(_).map(_.toInt)).getOrElse(Nil)
}

object GraftConfig {
  /** `[a, b, c]` (or a bare comma list) → trimmed unquoted elements. */
  def parseList(v: String): Seq[String] = {
    val inner = v.trim.stripPrefix("[").stripSuffix("]").trim
    if (inner.isEmpty) Nil
    else inner.split(",").map(s => unquote(s.trim)).toSeq
  }

  def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '\'' && s.last == '\'') ||
      (s.head == '"' && s.last == '"'))) s.substring(1, s.length - 1)
    else s
}

object Config {

  /** Parse the YAML subset. Top-level `key:` with no value opens a
    * section; indented `key: value` lines belong to the open section.
    */
  def parse(text: String): GraftConfig = {
    val top = scala.collection.mutable.LinkedHashMap[String, String]()
    val sections = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.LinkedHashMap[String, String]]()
    var open: Option[String] = None
    text.linesIterator.foreach { raw =>
      // strip comments outside quotes/brackets: the reference's yaml only
      // uses '#' as a trailing comment after a value or on its own line
      val hash = raw.indexOf('#')
      val line = if (hash >= 0 && !raw.take(hash).exists(c => c == '\'' || c == '"')) raw.take(hash) else raw
      if (line.trim.nonEmpty) {
        val indented = line.headOption.exists(c => c == ' ' || c == '\t')
        val idx = line.indexOf(':')
        if (idx > 0) {
          val k = GraftConfig.unquote(line.take(idx).trim)
          val v = line.drop(idx + 1).trim
          if (!indented) {
            if (v.isEmpty) { // section header
              open = Some(k)
              sections.getOrElseUpdate(k, scala.collection.mutable.LinkedHashMap())
            } else { open = None; top(k) = GraftConfig.unquote(v) }
          } else open.foreach { sec =>
            sections.getOrElseUpdate(sec, scala.collection.mutable.LinkedHashMap())(k) =
              GraftConfig.unquote(v)
          }
        }
      }
    }
    GraftConfig(top.toMap, sections.map { case (k, v) => k -> v.toMap }.toMap)
  }

  /** Load `path` (overridable via `CONFIG_FILE`), then overlay top-level
    * keys from the environment. NOTE: in the reference this overlay is
    * evidently-intended but dead code — `config.py` builds `new_config`
    * via an `os.getenv(key, value)` loop, then assigns
    * `SimpleNamespace(**config_data)` with `# config = new_config`
    * commented out — so this implements the intended behavior, not the
    * shipped one. Only `GRAFT_`-prefixed variables (`GRAFT_<KEY>`)
    * participate in the overlay: a bare same-named process variable
    * (`USER`, `HOSTNAME`, `LANG`…) would silently override a config key
    * in every environment, so the bare-name fallback the reference's
    * dead code implies is intentionally NOT honored. `env` is
    * injectable for tests.
    */
  def load(path: String, env: Map[String, String] = sys.env.toMap): GraftConfig = {
    val file = env.getOrElse("CONFIG_FILE", path)
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
      java.nio.charset.StandardCharsets.UTF_8)
    val parsed = parse(text)
    parsed.copy(top = parsed.top.map { case (k, v) =>
      k -> env.getOrElse(s"GRAFT_$k", v)
    })
  }

  /** `CLIENT_NAME` selection (reference default CLIENT_0). */
  def clientName(env: Map[String, String] = sys.env.toMap): String =
    env.getOrElse("CLIENT_NAME", "CLIENT_0")
}
