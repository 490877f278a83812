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
  final case class StageManifest(stage: String, fingerprint: String,
                                 inputs: Seq[String],
                                 partitions: Seq[PartitionLineage]) {
    def totalRows: Long = partitions.map(_.rows).sum
  }

  /** Lineage partition key: the doc's spatial tile when x/y exist, else
    * a stable hash bucket of doc_id. */
  def lineageKey(df: DataFrame, buckets: Int = 64): org.apache.spark.sql.Column = {
    if (df.columns.contains("x") && df.columns.contains("y"))
      graft.functions.SpatialFunctions.cellId(col("x"), col("y"), 3)
    else pmod(xxhash64(col("doc_id")), lit(buckets)).cast(LongType)
  }

  /** Compute per-partition lineage of a DataFrame: one aggregate job. */
  def lineageOf(df: DataFrame): Seq[PartitionLineage] = {
    val cols = df.columns.map(c => col(c).cast(StringType))
    df.withColumn("__lk", lineageKey(df))
      .groupBy(col("__lk"))
      .agg(count(lit(1)).as("rows"),
        expr(s"bit_xor(xxhash64(${df.columns.map(c => s"cast(`$c` as string)").mkString(", ")}))")
          .as("digest"))
      .collect()
      .map(r => PartitionLineage(r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
      .sortBy(_.key).toSeq
  }

  // ---- JSON (hand-rolled: flat, stable ordering, no extra deps) ----
  def toJson(m: StageManifest): String = {
    val parts = m.partitions.map(p =>
      s"""{"key":${p.key},"rows":${p.rows},"digest":${p.digest}}""").mkString("[", ",", "]")
    val inputs = m.inputs.map(i => "\"" + i + "\"").mkString("[", ",", "]")
    s"""{"stage":"${m.stage}","fingerprint":"${m.fingerprint}","inputs":$inputs,
       |"totalRows":${m.totalRows},"partitions":$parts}""".stripMargin.replace("\n", "")
  }

  private val KeyRe = """"(stage|fingerprint)":"([^"]*)"""".r
  private val PartRe = """\{"key":(-?\d+),"rows":(\d+),"digest":(-?\d+)\}""".r

  def fromJson(s: String): StageManifest = {
    val kv = KeyRe.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap
    val inputs = """"inputs":\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("")
      .split(",").filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\"")).toSeq
    val parts = PartRe.findAllMatchIn(s)
      .map(m => PartitionLineage(m.group(1).toLong, m.group(2).toLong, m.group(3).toLong))
      .toSeq
    StageManifest(kv.getOrElse("stage", ""), kv.getOrElse("fingerprint", ""), inputs, parts)
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
    val lineage = lineageOf(df.sparkSession.read.parquet(dataDir))
    val m = StageManifest(stage, fingerprint, inputs, lineage)
    write(root, m)
    m
  }

  /** A stage is resumable iff its manifest exists with the expected
    * fingerprint (config + upstream content unchanged). */
  def resumable(root: String, stage: String, fingerprint: String): Boolean =
    read(root, stage).exists(_.fingerprint == fingerprint)

  def readData(spark: SparkSession, root: String, stage: String): DataFrame =
    spark.read.parquet(s"$root/$stage/data")
}
