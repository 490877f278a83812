package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{Pipeline, Manifest}
import graft.model.Model
import graft.sources.DocSynth

/** Pipeline runner: spec parsing, execution, lineage checkpoints, and
  * mid-pipeline resume (the north rule's resumability contract). */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graftpipe").toString

  test("range fixture pipeline end-to-end (F2 via JSON spec)") {
    val spec =
      """{ "pipeline": [
        |  {"type": "readers.faux", "mode": "ramp",
        |   "bounds": [0, 0, 1, 0, 0, 10], "count": 10},
        |  {"type": "filters.range",
        |   "limits": [{"dimension": "z", "min": 4, "max": 6}]}
        |]}""".stripMargin
    val out = Pipeline.run(spark, spec).df
    assert(out.select("z").collect().map(_.getDouble(0)).sorted.toSeq === Seq(4.0, 5.0, 6.0))
  }

  test("checkpointed pipeline resumes without recomputing unchanged stages") {
    val ck = tmp(); val outP = tmp() + "/out"
    def spec(maxZ: Double) =
      s"""{ "pipeline": [
         |  {"type": "readers.faux", "mode": "ramp",
         |   "bounds": [0, 0, 0, 100, 100, 100], "count": 1000},
         |  {"type": "filters.range", "checkpoint": true,
         |   "limits": [{"dimension": "z", "min": 10, "max": $maxZ}]},
         |  {"type": "filters.splitter", "length": 25, "checkpoint": true},
         |  {"type": "writers.parquet", "path": "$outP"}
         |], "checkpoint_root": "$ck" }""".stripMargin

    val first = Pipeline.run(spark, spec(60))
    assert(first.resumedStages.isEmpty && first.ranStages.size === 4)
    val rows1 = first.df.count()

    // identical re-run: checkpointed stages resume, nothing recomputed
    val second = Pipeline.run(spark, spec(60))
    assert(second.resumedStages.size === 3, s"resumed ${second.resumedStages}")
    assert(second.df.count() === rows1)

    // config change invalidates downstream fingerprints -> full re-run
    val third = Pipeline.run(spark, spec(80))
    assert(third.resumedStages.isEmpty)
    assert(third.df.count() > rows1)

    // lineage manifest sanity: per-partition rows sum to the total
    val m = Manifest.read(ck, "001_filters_range").get
    assert(m.partitions.nonEmpty)
    assert(m.totalRows === spark.read.parquet(s"$ck/001_filters_range/data").count())
  }

  test("approx chipper is pipeline-reachable and honors the capacity contract through resume") {
    val ck = tmp()
    val spec =
      s"""{ "pipeline": [
         |  {"type": "readers.faux", "mode": "uniform",
         |   "bounds": [0, 0, 0, 1000, 1000, 50], "count": 20000, "seed": 11},
         |  {"type": "filters.chipper", "method": "approx", "capacity": 1000,
         |   "checkpoint": true}
         |], "checkpoint_root": "$ck" }""".stripMargin
    val first = Pipeline.run(spark, spec)
    val sizes = first.df.groupBy("chip").count()
      .collect().map(_.getLong(1))
    // contract: chips bounded by capacity * (1 + quantile-sketch slack)
    assert(sizes.max <= (1000 * 1.3).toLong,
      s"approx chip ${sizes.max} exceeds capacity + sketch slack")
    assert(sizes.length >= 15, s"only ${sizes.length} chips for 20k pts / 1k capacity")
    // identical re-run resumes from the checkpoint, bit-identical output
    val second = Pipeline.run(spark, spec)
    assert(second.resumedStages.contains("001_filters_chipper"))
    assert(second.df.groupBy("chip").count().collect().map(_.getLong(1)).sorted
      === sizes.sorted)
    // method is part of the stage fingerprint: switching to exact re-runs
    val exactSpec = spec.replace("\"approx\"", "\"exact\"")
    val third = Pipeline.run(spark, exactSpec)
    assert(!third.resumedStages.contains("001_filters_chipper"))
    val exactSizes = third.df.groupBy("chip").count().collect().map(_.getLong(1))
    assert(exactSizes.max <= 1000, "exact chipper must never exceed capacity")
  }

  test("chipper auto mode routes by input size") {
    def run(threshold: Int): Array[Long] = Pipeline.run(spark,
      s"""{ "pipeline": [
         |  {"type": "readers.faux", "mode": "uniform",
         |   "bounds": [0, 0, 0, 500, 500, 10], "count": 4000, "seed": 3},
         |  {"type": "filters.chipper", "method": "auto", "capacity": 500,
         |   "auto_threshold": $threshold}
         |]}""".stripMargin).df
      .select("chip").distinct().collect()
      .map(_.getAs[Number](0).longValue).sorted
    // big threshold -> exact path: chip ids are the contiguous ordinals 0..m-1
    val exactChips = run(1000000)
    assert(exactChips === exactChips.indices.map(_.toLong).toArray,
      s"exact chipper ids not contiguous: ${exactChips.mkString(",")}")
    // tiny threshold -> approx path: chip ids are recursion-tree node ids
    // (never the contiguous 0..m-1 range)
    val approxChips = run(100)
    assert(approxChips !== approxChips.indices.map(_.toLong).toArray,
      "auto did not route to the approx chipper above the threshold")
  }

  test("chipper auto routing adds no scan job when the reader declares its count") {
    // auto must route on the reader's free count (faux count / LAS header
    // point count), not a full count() scan — at 100x scale that extra
    // scan of the whole input just to pick a method is the bug
    def jobsFor(method: String): Int = {
      var jobs = 0
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        Pipeline.run(spark,
          s"""{ "pipeline": [
             |  {"type": "readers.faux", "mode": "uniform",
             |   "bounds": [0, 0, 0, 500, 500, 10], "count": 4000, "seed": 3},
             |  {"type": "filters.chipper", "method": "$method", "capacity": 500,
             |   "auto_threshold": 100}
             |]}""".stripMargin).df.collect()
        Thread.sleep(300) // drain listener-bus events
        jobs
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val direct = jobsFor("approx")
    val routed = jobsFor("auto") // threshold 100 < 4000 -> routes to approx
    assert(routed === direct,
      s"auto ran $routed jobs vs $direct for direct approx — routing must not add a scan")
  }

  test("multi-input DAG: two tagged readers merge n-ary through checkpoint and resume") {
    val ck = tmp(); val outP = tmp() + "/out"
    val spec =
      s"""{ "pipeline": [
         |  {"type": "readers.faux", "mode": "ramp", "tag": "a",
         |   "bounds": [0, 0, 0, 10, 10, 10], "count": 100},
         |  {"type": "readers.faux", "mode": "ramp", "tag": "b",
         |   "bounds": [20, 20, 20, 30, 30, 30], "count": 50},
         |  {"type": "filters.merge", "inputs": ["a", "b"], "checkpoint": true},
         |  {"type": "writers.parquet", "path": "$outP"}
         |], "checkpoint_root": "$ck" }""".stripMargin
    val first = Pipeline.run(spark, spec)
    assert(first.resumedStages.isEmpty)
    assert(first.df.count() === 150)
    // both branches survive the union (distinct coordinate ranges)
    assert(first.df.filter(col("x") <= 10).count() === 100)
    assert(first.df.filter(col("x") >= 20).count() === 50)
    // resume: merge + writer come back from their checkpoints
    val second = Pipeline.run(spark, spec)
    assert(second.resumedStages === Seq("002_filters_merge", "003_writers_parquet"))
    assert(second.df.count() === 150)
    // editing ONE branch invalidates the downstream cone
    val third = Pipeline.run(spark, spec.replace("\"count\": 50", "\"count\": 60"))
    assert(third.resumedStages.isEmpty)
    assert(third.df.count() === 160)
  }

  test("resumed writer re-runs when its destination was deleted") {
    val ck = tmp(); val outP = tmp() + "/out"
    val spec =
      s"""{ "pipeline": [
         |  {"type": "readers.faux", "mode": "ramp",
         |   "bounds": [0, 0, 0, 10, 10, 10], "count": 100},
         |  {"type": "writers.parquet", "path": "$outP"}
         |], "checkpoint_root": "$ck" }""".stripMargin
    Pipeline.run(spark, spec)
    assert(spark.read.parquet(outP).count() === 100)
    // delete the external destination; the checkpoint alone must not
    // count as "done" — the writer re-runs and rematerializes it
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rm)
      java.nio.file.Files.delete(p)
    }
    rm(java.nio.file.Paths.get(outP))
    val again = Pipeline.run(spark, spec)
    assert(again.ranStages.contains("001_writers_parquet"),
      s"writer should re-run, got resumed=${again.resumedStages}")
    assert(spark.read.parquet(outP).count() === 100)
  }

  test("writer destination check resolves file:-URIs through the Hadoop FS") {
    // a file:// destination must be seen as intact on resume — a bare
    // java.nio Files.exists would treat any URI as absent and force a
    // rewrite on every invocation (the round-2 local-FS-only bug)
    val ck = tmp(); val outDir = tmp() + "/out"
    val spec =
      s"""{ "pipeline": [
         |  {"type": "readers.faux", "mode": "ramp",
         |   "bounds": [0, 0, 0, 10, 10, 10], "count": 100},
         |  {"type": "writers.parquet", "path": "file://$outDir"}
         |], "checkpoint_root": "$ck" }""".stripMargin
    Pipeline.run(spark, spec)
    assert(spark.read.parquet(outDir).count() === 100)
    val again = Pipeline.run(spark, spec)
    assert(again.resumedStages.contains("001_writers_parquet"),
      s"file:-URI destination should resume, got ran=${again.ranStages}")
  }

  test("manifest digests detect partition corruption") {
    val ck = tmp()
    val df = sources.Faux.ramp(spark, sources.Faux.Box3(0, 0, 0, 10, 10, 10), 100)
    val m = Manifest.checkpoint(ck, "s0", "fp0", Nil, df)
    val (reread, info) = Manifest.lineageOf(Manifest.readData(spark, ck, "s0"))
    assert(reread === m.partitions)
    assert(info === m.info && info.exists(_.count === 100))
    val json = Manifest.toJson(m)
    assert(Manifest.fromJson(json) === m)
    // negative-exponent doubles (coordinates near zero) survive the
    // hand-rolled JSON round trip
    val tiny = m.copy(info = Some(Manifest.QuickStats(1, -1.5e-7, 2.5e-7,
      -3.25e-9, 4.0e-9, -1.0e300, 1.0e300)))
    assert(Manifest.fromJson(Manifest.toJson(tiny)) === tiny)
    // non-finite bounds (empty-stage degenerate) round-trip AND stay
    // standard JSON (quoted, never a bare Infinity/NaN token)
    val inf = m.copy(info = Some(Manifest.QuickStats(0,
      Double.PositiveInfinity, Double.NegativeInfinity,
      Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN, Double.NaN)))
    val infJson = Manifest.toJson(inf)
    assert(!infJson.matches(""".*[:\[,]\s*-?(Infinity|NaN).*"""),
      s"bare non-finite token in: $infJson")
    val back = Manifest.fromJson(infJson).info.get
    assert(back.minx.isPosInfinity && back.maxx.isNegInfinity && back.minz.isNaN)
  }

  test("validate_resume recomputes a stage whose checkpoint data was tampered with") {
    val ck = tmp()
    val spec =
      s"""{ "pipeline": [
         |  {"type": "readers.faux", "mode": "ramp",
         |   "bounds": [0, 0, 0, 10, 10, 10], "count": 200},
         |  {"type": "filters.splitter", "length": 5,
         |   "checkpoint": true, "validate_resume": true}
         |], "checkpoint_root": "$ck" }""".stripMargin
    val first = Pipeline.run(spark, spec)
    assert(first.df.count() === 200)
    // untouched: digest validation passes, stage resumes
    val second = Pipeline.run(spark, spec)
    assert(second.resumedStages === Seq("001_filters_splitter"))
    // tamper: overwrite the checkpoint data with a DIFFERENT row set but
    // keep the manifest — fingerprint still matches, digests don't
    val dataDir = s"$ck/001_filters_splitter/data"
    spark.read.parquet(dataDir).limit(100)
      .write.mode("overwrite").parquet(dataDir + "_tmp")
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.list(p).forEach(rm)
      java.nio.file.Files.delete(p)
    }
    rm(java.nio.file.Paths.get(dataDir))
    java.nio.file.Files.move(java.nio.file.Paths.get(dataDir + "_tmp"),
      java.nio.file.Paths.get(dataDir))
    val third = Pipeline.run(spark, spec)
    assert(third.ranStages.contains("001_filters_splitter"),
      s"tampered checkpoint was resumed: ${third.resumedStages}")
    assert(third.df.count() === 200)
  }

  test("quickInfo is served from the manifest with zero Spark jobs") {
    val ck = tmp()
    val df = sources.Faux.ramp(spark, sources.Faux.Box3(1, 2, 3, 11, 12, 13), 500)
    Manifest.checkpoint(ck, "qi", "fp0", Nil, df)
    // the scan-path answer, for value comparison
    val scan = operators.InfoOps.quickInfo(Manifest.readData(spark, ck, "qi")).head()
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val qi = Manifest.quickInfo(spark, ck, "qi").get
      val r = qi.head() // local one-row DataFrame — no job expected
      Thread.sleep(200) // let any (unexpected) job-start event arrive
      assert(jobs === 0, s"quickInfo ran $jobs Spark jobs")
      assert(r.getLong(0) === scan.getLong(0))
      assert(r.getDouble(1) === scan.getDouble(1) && r.getDouble(2) === scan.getDouble(2))
      assert(r.getDouble(3) === scan.getDouble(3) && r.getDouble(4) === scan.getDouble(4))
      assert(r.getDouble(5) === scan.getDouble(5) && r.getDouble(6) === scan.getDouble(6))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("translate-style chain exercises the round-2 stages end-to-end") {
    // distributed LAS read -> composed reprojection (LCC ft -> geo ->
    // web mercator through the SRS registry) -> crop -> LAS 1.2 write,
    // all through the declarative spec
    val out = tmp() + "/rt.las"
    val spec =
      s"""{ "pipeline": [
         |  {"type": "readers.las", "path": "${TestSpark.P1065}", "distributed": true},
         |  {"type": "filters.reprojection", "in_srs": "lcc:oregon-ft", "out_srs": "EPSG:3857"},
         |  {"type": "filters.crop",
         |   "bounds": [-1.5E7, 0.0, -1.3E7, 7.0E6]},
         |  {"type": "writers.las", "path": "$out", "format": 1,
         |   "scale": [0.001, 0.001, 0.01], "offset": [-13700000.0, 5500000.0, 0.0]}
         |]}""".stripMargin
    val res = Pipeline.run(spark, spec)
    assert(res.df.count() === 1065) // Autzen fits well inside the crop box
    val (h, rows) = graft.sources.LasDecode.readPoints(out)
    assert(h.pointFormat === 1 && h.pointCount === 1065)
    // quantization at mm-scale: decoded coords within half a step of
    // the reprojected originals
    val want = res.df.orderBy("span_idx").select("x", "y").collect()
    val xi = graft.sources.LasDecode.schema.fieldIndex("x")
    want.zip(rows).foreach { case (w, r) =>
      assert(math.abs(w.getDouble(0) - r.getDouble(xi)) <= 0.0005 + 1e-9)
    }
  }

  test("span-sequence invariant holds through a filtering pipeline") {
    val docs = DocSynth.cachedDocs(spark, "/root/testdata/sf0.001")
    val pts = Model.explodePoints(docs)
    // crop away some points, then implode: surviving docs must preserve
    // the order and content of all non-point spans + surviving points
    val cropped = operators.PointOps.cropBox(
      operators.PointOps.Box3D(0, 0, 0, 600, 600, 1000))(pts)
    val result = Model.implode(docs, cropped)
    val sigs = Model.spanSignature(result)
    // every surviving doc's non-point spans appear in original order
    val orig = Model.spanSignature(docs)
    val joined = sigs.as("a").join(orig.as("b"), "doc_id")
      .select(col("a.sig").as("got"), col("b.sig").as("want"))
      .collect()
    joined.foreach { r =>
      val got = r.getString(0).split('|').toSeq
      val want = r.getString(1).split('|').toSeq
      // got must be a subsequence of want (points removed, order kept)
      var i = 0
      got.foreach { g =>
        val j = want.indexOf(g, i)
        assert(j >= 0, s"span $g out of order or missing")
        i = j + 1
      }
      // all non-point spans survive
      val wantNonPoint = want.filterNot(_.startsWith("point:"))
      val gotNonPoint = got.filterNot(_.startsWith("point:"))
      assert(gotNonPoint === wantNonPoint)
    }
  }
}
