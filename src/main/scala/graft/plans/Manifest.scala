package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Iceberg-style table + lineage layer (no Iceberg jar in this
  * environment, so the manifest/snapshot machinery is built here —
  * which the engine needs anyway for the per-partition lineage records
  * the resume contract requires).
  *
  * Layout per stage:
  * {{{
  *   <root>/<stageId>/data/...          stage output parquet
  *   <root>/<stageId>/manifest.json     lineage snapshot:
  *     { stage, inputs: [stageId...], fingerprint,
  *       partitions: [{key, rows, digest}], totalRows }
  * }}}
  *
  * The per-partition digest is bit_xor(xxhash64(all columns)) — order-
  * independent and mergeable, so a resumed run can be validated cheaply
  * partition-by-partition (the reference's Metadata tree per stage,
  * include/pdal/Metadata.hpp:98-407, generalized to distributed
  * partitions). `fingerprint` covers the stage's config + its inputs'
  * fingerprints, so any upstream change invalidates downstream stages
  * (content-addressed resume).
  */
object Manifest {

  final case class PartitionLineage(key: Long, rows: Long, digest: Long)

  /** Header-level preview stats, stored in the manifest so QuickInfo can
    * be served with ZERO jobs (the reference previews a file from its
    * header alone — LasReader.cpp:122-140 inspect / QuickInfo.hpp:45-60;
    * our "header" is the checkpoint manifest). */
  final case class QuickStats(count: Long, minx: Double, maxx: Double,
                              miny: Double, maxy: Double,
                              minz: Double, maxz: Double)

  final case class StageManifest(stage: String, fingerprint: String,
                                 inputs: Seq[String],
                                 partitions: Seq[PartitionLineage],
                                 info: Option[QuickStats] = None) {
    def totalRows: Long = partitions.map(_.rows).sum
  }

  /** Lineage partition key: the doc's spatial tile when x/y exist, else
    * a stable hash bucket of doc_id. */
  def lineageKey(df: DataFrame, buckets: Int = 64): org.apache.spark.sql.Column = {
    if (df.columns.contains("x") && df.columns.contains("y"))
      graft.functions.SpatialFunctions.cellId(col("x"), col("y"), 3)
    else pmod(xxhash64(col("doc_id")), lit(buckets)).cast(LongType)
  }

  /** Compute per-partition lineage of a DataFrame — ONE aggregate job
    * that also folds in the per-partition bbox/count when the frame has
    * coordinates, rolled up driver-side into the manifest's QuickStats. */
  def lineageOf(df: DataFrame): (Seq[PartitionLineage], Option[QuickStats]) = {
    val spatial = Seq("x", "y", "z").forall(df.columns.contains)
    val baseAggs = Seq(count(lit(1)).as("rows"),
      expr(s"bit_xor(xxhash64(${df.columns.map(c => s"cast(`$c` as string)").mkString(", ")}))")
        .as("digest"))
    val bboxAggs = if (spatial)
      Seq(min("x").as("mnx"), max("x").as("mxx"), min("y").as("mny"),
        max("y").as("mxy"), min("z").as("mnz"), max("z").as("mxz"))
    else Nil
    val aggs = baseAggs ++ bboxAggs
    val rows = df.withColumn("__lk", lineageKey(df))
      .groupBy(col("__lk"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val lineage = rows
      .map(r => PartitionLineage(r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
      .sortBy(_.key).toSeq
    val info =
      if (spatial && rows.nonEmpty)
        Some(QuickStats(rows.map(_.getLong(1)).sum,
          rows.map(_.getDouble(3)).min, rows.map(_.getDouble(4)).max,
          rows.map(_.getDouble(5)).min, rows.map(_.getDouble(6)).max,
          rows.map(_.getDouble(7)).min, rows.map(_.getDouble(8)).max))
      else None
    (lineage, info)
  }

  // ---- JSON (hand-rolled: flat, stable ordering, no extra deps) ----

  // Non-finite bounds (empty-input stages yield Infinity mins) must stay
  // STANDARD JSON — bare Infinity/NaN tokens parse here but are rejected
  // by every off-the-shelf JSON consumer of the manifest file, so they
  // are emitted as quoted strings.
  private def jsonDouble(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "\"" + d.toString + "\""

  def toJson(m: StageManifest): String = {
    val parts = m.partitions.map(p =>
      s"""{"key":${p.key},"rows":${p.rows},"digest":${p.digest}}""").mkString("[", ",", "]")
    val inputs = m.inputs.map(i => "\"" + i + "\"").mkString("[", ",", "]")
    val info = m.info.map(q =>
      s""","info":{"count":${q.count},"minx":${jsonDouble(q.minx)},"maxx":${jsonDouble(q.maxx)},"miny":${jsonDouble(q.miny)},"maxy":${jsonDouble(q.maxy)},"minz":${jsonDouble(q.minz)},"maxz":${jsonDouble(q.maxz)}}""")
      .getOrElse("")
    s"""{"stage":"${m.stage}","fingerprint":"${m.fingerprint}","inputs":$inputs,
       |"totalRows":${m.totalRows}$info,"partitions":$parts}""".stripMargin.replace("\n", "")
  }

  private val KeyRe = """"(stage|fingerprint)":"([^"]*)"""".r
  private val PartRe = """\{"key":(-?\d+),"rows":(\d+),"digest":(-?\d+)\}""".r
  // '-' inside the class too: exponents like 1.0E-7 ("-?" only covers
  // the leading sign); fields are label-delimited so this is unambiguous.
  // Non-finite values arrive as quoted strings (standard-JSON emit).
  // Bare Infinity/NaN alternations kept for READ compatibility with
  // manifests written before the standard-JSON (quoted) emit; we only
  // ever emit the quoted form now.
  private val D = """(-?[\d.eE+-]+|"-?Infinity"|"NaN"|-?Infinity|NaN)"""
  private val InfoRe =
    (""""info":\{"count":(\d+),"minx":""" + D + ""","maxx":""" + D +
      ""","miny":""" + D + ""","maxy":""" + D +
      ""","minz":""" + D + ""","maxz":""" + D + """\}""").r

  def fromJson(s: String): StageManifest = {
    val kv = KeyRe.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap
    val inputs = """"inputs":\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("")
      .split(",").filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\"")).toSeq
    val parts = PartRe.findAllMatchIn(s)
      .map(m => PartitionLineage(m.group(1).toLong, m.group(2).toLong, m.group(3).toLong))
      .toSeq
    def d(t: String): Double = t.stripPrefix("\"").stripSuffix("\"").toDouble
    val info = InfoRe.findFirstMatchIn(s).map(m => QuickStats(m.group(1).toLong,
      d(m.group(2)), d(m.group(3)), d(m.group(4)),
      d(m.group(5)), d(m.group(6)), d(m.group(7))))
    StageManifest(kv.getOrElse("stage", ""), kv.getOrElse("fingerprint", ""), inputs, parts, info)
  }

  def write(root: String, m: StageManifest): Unit = {
    val dir = Paths.get(root, m.stage)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("manifest.json"), toJson(m))
  }

  def read(root: String, stage: String): Option[StageManifest] = {
    val p = Paths.get(root, stage, "manifest.json")
    if (Files.exists(p)) Some(fromJson(Files.readString(p))) else None
  }

  /** Checkpoint a stage: write data (partition-pruned layout: bucketed
    * by lineage key), compute lineage, persist manifest. */
  def checkpoint(root: String, stage: String, fingerprint: String,
                 inputs: Seq[String], df: DataFrame): StageManifest = {
    val dataDir = s"$root/$stage/data"
    df.write.mode("overwrite").parquet(dataDir)
    val (lineage, info) = lineageOf(df.sparkSession.read.parquet(dataDir))
    val m = StageManifest(stage, fingerprint, inputs, lineage, info)
    write(root, m)
    m
  }

  /** A stage is resumable iff its manifest exists with the expected
    * fingerprint (config + upstream content unchanged). */
  def resumable(root: String, stage: String, fingerprint: String): Boolean =
    read(root, stage).exists(_.fingerprint == fingerprint)

  /** Deep validation: recompute the checkpoint data's per-partition
    * lineage and compare against the manifest — catches bit rot or
    * out-of-band edits the fingerprint (config-level) cannot see. One
    * aggregate job over the checkpoint; order-independent digests make
    * the compare partition-by-partition exact. */
  def validate(spark: SparkSession, root: String, stage: String): Boolean =
    read(root, stage).exists { m =>
      try lineageOf(readData(spark, root, stage))._1 == m.partitions
      catch { case _: Exception => false } // unreadable data = invalid
    }

  def readData(spark: SparkSession, root: String, stage: String): DataFrame =
    spark.read.parquet(s"$root/$stage/data")

  /** `pdal info`-style preview served from the manifest alone — NO Spark
    * job touches the data (the reference's header-only inspect,
    * LasReader.cpp:122-140). Returns None when the stage has no manifest
    * or the manifest predates coordinate stats; callers then fall back to
    * the scan path (InfoOps.quickInfo). */
  def quickInfo(spark: SparkSession, root: String, stage: String): Option[DataFrame] =
    read(root, stage).flatMap(_.info).map { q =>
      import spark.implicits._
      Seq((q.count, q.minx, q.maxx, q.miny, q.maxy, q.minz, q.maxz))
        .toDF("count", "minx", "maxx", "miny", "maxy", "minz", "maxz")
    }
}
