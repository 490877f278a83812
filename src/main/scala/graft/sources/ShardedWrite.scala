package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, NumericType, StructField, StructType}

/** Executor-sharded single-format export harness shared by the PLY and
  * PCD writers (the BPF/LAS writers carry format-specific variants of
  * the same discipline): one output file per distinct value of a shard
  * column, each file built ON THE EXECUTOR from its shard's rows and
  * published two-phase for object-store destinations (task-local temp
  * -> `.inprogress` upload -> rename), so no points ever funnel through
  * the driver. A shard is one tile/chip — the upstream chipper/splitter
  * capacity bounds the per-shard buffer, the discipline the reference's
  * DB block writers prescribe (chip first, then write blocks).
  */
object ShardedWrite {

  /** The column set the PLY/PCD writers serialize: every numeric column
    * except the span ordinal (doc_id is string identity and excluded by
    * type; rename upstream to persist it). */
  def numericCols(schema: StructType): Seq[StructField] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && f.name != "span_idx" => f
    }.toSeq

  /** Publish bytes as `dir/name`; scheme'd destinations go two-phase. */
  def publish(dir: String, hasScheme: Boolean, name: String,
              bytes: Array[Byte]): Unit =
    if (hasScheme) {
      val tmp = java.io.File.createTempFile("graftshard", name)
      java.nio.file.Files.write(tmp.toPath, bytes)
      val destDir = new org.apache.hadoop.fs.Path(dir)
      val fs = destDir.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val tmpDst = new org.apache.hadoop.fs.Path(destDir, name + ".inprogress")
      val dst = new org.apache.hadoop.fs.Path(destDir, name)
      fs.copyFromLocalFile(false, true,
        new org.apache.hadoop.fs.Path(tmp.toURI), tmpDst)
      if (fs.exists(dst)) fs.delete(dst, false)
      require(fs.rename(tmpDst, dst), s"two-phase rename failed for $name")
      tmp.delete(); ()
    } else java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/$name"), bytes)

  /** Run the sharded export: partition by `shardCol`, sort each
    * partition by (shard, doc_id, span_idx) for deterministic record
    * order, group consecutive rows per shard on the executor, and emit
    * `build(colMeta, records)` as `shard_<value>.<ext>`. Returns the
    * shard file names. `build` must be a serializable pure function
    * over boxed column values (one Array[Any] per record, in
    * `numericCols` order). */
  def run(df: DataFrame, dir: String, shardCol: String, ext: String,
          numTasks: Int = 0)
         (build: (Seq[(String, DataType)], IndexedSeq[Array[Any]]) => Array[Byte])
      : Seq[String] = {
    val hasScheme = dir.matches("[a-zA-Z][a-zA-Z0-9+.-]*:/.*")
    if (hasScheme) {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).mkdirs(p)
    } else java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val valueCols = numericCols(df.schema)
    require(valueCols.nonEmpty, s"no numeric columns to write as .$ext")
    val allCols = df.columns
    require(allCols.contains(shardCol),
      s"shard column $shardCol not in ${allCols.mkString(",")}")
    val tasks = if (numTasks > 0) numTasks
                else df.sparkSession.sparkContext.defaultParallelism
    val idCols = Seq("doc_id", "span_idx").filter(allCols.contains)
    val sortKeys = (Seq(shardCol) ++ idCols).map(col)
    val slim = df
      .select((col(shardCol) +: idCols.map(col)) ++
        valueCols.map(f => col(f.name).as(s"__v_${f.name}")): _*)
      .repartition(tasks, col(shardCol))
      .sortWithinPartitions(sortKeys: _*)
    val base = 1 + idCols.size
    val colMeta: Seq[(String, DataType)] =
      valueCols.map(f => (f.name, f.dataType))
    slim.mapPartitions { it =>
      var cur: Any = null
      var buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      var written = List.empty[String]
      def close(): Unit = if (cur != null && buf.nonEmpty) {
        val name = s"shard_$cur.$ext"
        publish(dir, hasScheme, name, build(colMeta, buf.toIndexedSeq))
        written ::= name
        buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      }
      it.foreach { r =>
        val shard = r.get(0)
        // a null shard would alias the initial `cur` sentinel and its
        // run would never close() — rows silently dropped; fail loudly
        // (a null tile/chip id is an upstream bug, not a shard)
        require(shard != null, s"sharded write: null value in shard column $shardCol")
        if (shard != cur) { close(); cur = shard }
        buf += Array.tabulate(colMeta.size)(i => r.get(base + i))
      }
      close()
      written.iterator
    }(Encoders.STRING).collect().toSeq
  }
}
