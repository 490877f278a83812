package graft.plans

import scala.xml.{Node, XML}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** XML pipeline ingestion — the reference's native pipeline syntax
  * (src/PipelineReader.cpp: boost-ptree XML with nested
  * Reader/Filter/Writer stages built innermost-first, and `Option`
  * elements that may carry nested child `Options`). Reference users
  * carry .xml pipeline files; this translates them to the engine's
  * JSON spec so `Pipeline.run` executes them unchanged:
  *
  *  - nested stage elements become tagged stages in post-order with
  *    explicit `inputs` (the JSON DAG form);
  *  - `@VAR@` placeholders substitute from a caller map (the fixtures'
  *    CMAKE_SOURCE_DIR convention);
  *  - option values are typed (ints/doubles/bools/strings) and the
  *    era's spellings are normalized: `filename`->`path`, the per-axis
  *    `([x0,x1],[y0,y1],[z0,z1])` bounds string -> the flat
  *    [minx,miny,(minz),maxx,maxy,(maxz)] array, `filters.range`
  *    repeated `dimension` options with min/max/equals children -> the
  *    `limits` array, colorization `dimension` options with band/scale
  *    children -> `bands` entries, `writers.text` -> `writers.csv`,
  *    dimension names lowercased to engine column names;
  *  - unknown options pass through typed (stage accessors ignore
  *    extras), unknown stage types fail in the runner, loudly.
  */
object PipelineXml {

  private def subst(text: String, vars: Map[String, String]): String =
    vars.foldLeft(text) { case (t, (k, v)) => t.replace(s"@$k@", v) }

  private final case class XOpt(name: String, value: String,
                                children: Seq[(String, String)])

  private def isStage(n: Node): Boolean =
    Seq("Reader", "Filter", "Writer", "MultiFilter").contains(n.label)

  /** Direct text of an element, excluding nested elements' text. */
  private def ownText(n: Node): String =
    n.child.collect { case t if t.isAtom => t.text }.mkString.trim

  private def parseOpt(n: Node): XOpt = {
    val children = (n \ "Options" \ "Option").map { c =>
      ((c \@ "name"), ownText(c))
    }
    XOpt(n \@ "name", ownText(n), children.toSeq)
  }

  private val IntRe = "-?\\d+".r
  private val NumRe = "-?\\d*\\.\\d+([eE][+-]?\\d+)?|-?\\d+[eE][+-]?\\d+".r
  private def typed(v: String): JValue = v match {
    case "true"  => JBool(true)
    case "false" => JBool(false)
    case IntRe() => JInt(BigInt(v))
    case s if NumRe.pattern.matcher(s).matches() => JDouble(s.toDouble)
    case s => JString(s)
  }

  private def colName(d: String): String =
    d.trim.toLowerCase.replaceAll("\\s+", "_")

  /** "([x0,x1],[y0,y1](,[z0,z1])?)" -> [minx,miny,(minz),maxx,maxy,(maxz)]. */
  private def boundsArray(s: String): JArray = {
    val pairs = "\\[([^\\]]*)\\]".r.findAllMatchIn(s).map { m =>
      val Array(a, b) = m.group(1).split(",").map(_.trim.toDouble)
      (a, b)
    }.toSeq
    require(pairs.size == 2 || pairs.size == 3,
      s"pipeline-xml: bounds '$s' has ${pairs.size} axis ranges")
    JArray((pairs.map(_._1) ++ pairs.map(_._2)).map(JDouble(_)).toList)
  }

  private def stageJson(typ0: String, opts: Seq[XOpt], tag: String,
                        inputTags: Seq[String]): JObject = {
    val typ = typ0 match {
      case "writers.text" => "writers.csv"
      // the reference's stats filter passes points through with the
      // summary as a metadata side channel — the engine's pass-through
      // twin keeps mid-chain XML pipelines flowing
      case "filters.stats" => "filters.stats_passthrough"
      case t => t
    }
    var fields = List[(String, JValue)]("type" -> JString(typ), "tag" -> JString(tag))
    if (inputTags.nonEmpty) fields :+= ("inputs" -> JArray(
      inputTags.map(JString(_)).toList))

    if (typ == "filters.stats_passthrough") {
      // "readers.las.X, Classification" style qualified dim lists
      def dimList(name: String): Option[(String, JValue)] =
        opts.find(_.name == name).map { o =>
          val cols = o.value.split(",").map(v =>
            colName(v.trim.split("\\.").last)).filter(_.nonEmpty)
          name -> JArray(cols.map(JString(_)).toList)
        }
      dimList("dimensions").foreach(f => fields :+= f)
      opts.find(_.name == "exact_dimensions").foreach { o =>
        fields :+= ("enumerate" -> JArray(o.value.split(",")
          .map(v => JString(colName(v.trim.split("\\.").last))).toList))
      }
    }

    if (typ == "filters.range") {
      val limits = opts.filter(_.name == "dimension").map { o =>
        val kids = o.children.toMap
        val eq = kids.get("equals").map(_.toDouble)
        JObject(List(
          "dimension" -> JString(colName(o.value))) ++
          eq.map(v => List("min" -> JDouble(v), "max" -> JDouble(v)))
            .getOrElse(
              kids.get("min").map(v => "min" -> JDouble(v.toDouble)).toList ++
              kids.get("max").map(v => "max" -> JDouble(v.toDouble)).toList))
      }
      fields :+= ("limits" -> JArray(limits.toList))
    }
    if (typ == "filters.colorization") {
      val bands = opts.filter(_.name == "dimension").map { o =>
        val kids = o.children.toMap
        JString(s"${colName(o.value)}:${kids.getOrElse("band", "1")}:" +
          kids.getOrElse("scale", "1"))
      }
      if (bands.nonEmpty) fields :+= ("bands" -> JArray(bands.toList))
    }
    opts.foreach { o =>
      (typ, o.name) match {
        case (_, "dimension") => // handled per-stage above
        case ("filters.stats_passthrough", "dimensions" | "exact_dimensions") =>
        // p2g's filename is the RASTER file emit (one file per
        // output_type x output_format, like the reference's
        // points2grid finish) — not a table path
        case ("writers.p2g", "filename") => fields :+= ("filename" -> JString(o.value))
        // pclblock's filename is the PCL sub-pipeline JSON, not a data path
        case ("filters.pclblock", "filename") => fields :+= ("filename" -> JString(o.value))
        case (_, "filename") => fields :+= ("path" -> JString(o.value))
        case ("filters.crop", "bounds") => fields :+= ("bounds" -> boundsArray(o.value))
        case ("writers.p2g", "grid_dist_x") => fields :+= ("dx" -> typed(o.value))
        case ("writers.p2g", "grid_dist_y") => fields :+= ("dy" -> typed(o.value))
        // era-only knob with no engine meaning (chunking is Spark's job)
        case ("writers.p2g", "chunk_size") =>
        // output_type is a MULTI-option in the reference
        // (options.getOptions collects all) — gathered below
        case ("writers.p2g", "output_type") =>
        case (_, n) => fields :+= (n -> typed(o.value))
      }
    }
    if (typ == "writers.p2g") {
      val types = opts.filter(_.name == "output_type").map(o => JString(o.value))
      if (types.nonEmpty) fields :+= ("output_type" -> JArray(types.toList))
    }
    // the reference's p2g writer window-fills nodata cells by default
    // (P2gWriter.cpp:62-63: fill_window_size default 3) — reference
    // -native XML pipelines get that default; the engine's JSON API
    // keeps fill opt-in
    if (typ == "writers.p2g" && !opts.exists(_.name == "fill_window_size"))
      fields :+= ("fill_window_size" -> JInt(3))
    // repeated generic options would render duplicate JSON keys — keep
    // the FIRST occurrence, matching the reference's
    // Options::getValueOrDefault (multimap find() returns the
    // first-inserted entry for a repeated name)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val deduped = fields.filter(f => seen.add(f._1))
    JObject(deduped)
  }

  /** Translate a reference XML pipeline document into the engine's JSON
    * spec (runnable via [[Pipeline.run]]). */
  def toJsonSpec(xmlText: String, vars: Map[String, String] = Map.empty,
                 checkpointRoot: Option[String] = None): String = {
    // drop the XML declaration before parsing: the reference's own
    // fixtures carry `<?xml version="2.0"?>` (a typo its boost-ptree
    // parser tolerated; strict parsers reject any version but 1.0)
    val cleaned = xmlText.replaceFirst("(?s)^\\s*<\\?xml[^>]*\\?>", "")
    val root = XML.loadString(subst(cleaned, vars))
    require(root.label == "Pipeline", s"pipeline-xml: root <${root.label}>")
    val terminals = root.child.filter(isStage)
    require(terminals.size == 1,
      s"pipeline-xml: expected one terminal stage, found ${terminals.size}")

    val stages = scala.collection.mutable.ArrayBuffer.empty[JObject]
    var nextTag = 0
    def emit(n: Node): String = {
      val typ = n \@ "type"
      require(typ.nonEmpty, s"pipeline-xml: <${n.label}> without a type attribute")
      val kids = n.child.filter(isStage)
      require(n.label != "Reader" || kids.isEmpty,
        "pipeline-xml: a Reader cannot have stage children (PipelineReader.cpp rejects this)")
      require(!(n.label == "MultiFilter" && kids.isEmpty),
        "pipeline-xml: MultiFilter with no inputs")
      val inputs = kids.map(emit) // post-order: inputs first
      val opts = (n \ "Option").map(parseOpt)
      val tag = s"x$nextTag"; nextTag += 1
      stages += stageJson(typ, opts.toSeq, tag, inputs.toSeq)
      tag
    }
    emit(terminals.head)

    val doc = JObject(List("pipeline" -> JArray(stages.toList)) ++
      checkpointRoot.map(r => "checkpoint_root" -> JString(r)).toList)
    JsonMethods.compact(JsonMethods.render(doc))
  }

  /** Convenience: translate an XML pipeline file and run it. */
  def run(spark: org.apache.spark.sql.SparkSession, path: String,
          vars: Map[String, String] = Map.empty): Pipeline.RunResult = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    Pipeline.run(spark, toJsonSpec(text, vars))
  }
}
