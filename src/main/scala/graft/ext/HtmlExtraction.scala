package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField}

/** Parser-grade HTML extraction escape hatch — the [[Multimodal]]
  * stub-codec pattern applied to text. [[TextAnalysis.extractHtmlText]]
  * is the codegen-friendly regex kernel for the 80 % case; the
  * Trafilatura-class quality a production crawl pipeline wants needs a
  * real DOM parser, which is library code a Catalyst expression cannot
  * host. This stage declares the parser interface and runs it
  * partition-locally, so swapping the stub for jsoup/Trafilatura-class
  * extraction changes ONE factory and none of the Spark plumbing.
  *
  * Scale shape: a narrow `mapPartitions` over the rows — no shuffle, no
  * state; parallelism and memory are bounded by the input partitioning
  * exactly like [[Multimodal.extractFeatures]]. The parser instantiates
  * once per task, not per row (real DOM parsers are expensive to build
  * and often not thread-safe).
  */
object HtmlExtraction {

  /** The contract a production build plugs a real parser into.
    * `newPartitionParser` is called once per task; the returned function
    * must be pure and deterministic (restarts and speculative tasks
    * re-run it on the same rows), and `null` input must map to `null`.
    */
  trait HtmlExtractor extends Serializable {
    def newPartitionParser(): String => String
  }

  /** Deterministic stand-in for a real DOM parser: the SAME extraction
    * chain as [[TextAnalysis.extractHtmlText]], as precompiled JVM
    * regexes — both run Java regex semantics, so the two paths agree
    * byte-for-byte on every input (pinned in tests), which makes this
    * stub the parity baseline any real parser is diffed against.
    */
  object StubHtmlExtractor extends HtmlExtractor {
    def newPartitionParser(): String => String = {
      import java.util.regex.Pattern
      val script = Pattern.compile("(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>")
      val comment = Pattern.compile("(?s)<!--.*?-->")
      val tag = Pattern.compile("<[^>]*>")
      // entity patterns are literal — String.replace substitutes the same
      // left-to-right non-overlapping occurrences as the regex form at a
      // fraction of the cost (r17, in lockstep with the kernel's
      // StringReplace swap so the pinned byte parity holds trivially)
      val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      val ws = Pattern.compile("\\s+")
      html => {
        if (html == null) null
        else {
          val noMarkup = tag.matcher(
            comment.matcher(
              script.matcher(html).replaceAll(" ")).replaceAll(" "))
            .replaceAll(" ")
          val decoded = entities.foldLeft(noMarkup) { case (s, (e, r)) =>
            s.replace(e, r)
          }
          val collapsed = ws.matcher(decoded).replaceAll(" ")
          // Spark's trim strips ' ' only; Java's String.trim strips every
          // char <= U+0020 — strip spaces by hand so control bytes (which
          // web HTML does carry) round-trip identically to the kernel
          var b = 0
          var e = collapsed.length
          while (b < e && collapsed.charAt(b) == ' ') b += 1
          while (e > b && collapsed.charAt(e - 1) == ' ') e -= 1
          collapsed.substring(b, e)
        }
      }
    }
  }

  /** The extraction stage itself: appends `out` with the parser's plain
    * text for `htmlCol`. Partition-local, zero shuffle; the default
    * [[StubHtmlExtractor]] makes it a drop-in twin of the regex kernel
    * until a real parser is plugged in.
    */
  def extractWithParser(df: DataFrame, htmlCol: String,
                        parser: HtmlExtractor = StubHtmlExtractor,
                        out: String = "text_plain"): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(htmlCol).dataType == StringType,
      s"extractWithParser needs a StringType html column; " +
        s"'$htmlCol' is ${df.schema(htmlCol).dataType.simpleString}")
    require(!df.columns.contains(out),
      s"output column '$out' already exists in the input schema")
    val idx = df.schema.fieldIndex(htmlCol)
    val outSchema = df.schema.add(StructField(out, StringType, nullable = true))
    val rdd = df.rdd.mapPartitions { it =>
      val extract = parser.newPartitionParser()
      it.map { r =>
        val html = r.get(idx) match {
          case s: String => s
          case _ => null
        }
        Row.fromSeq(r.toSeq :+ extract(html))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
